#!/usr/bin/env python3
"""Identify the chip's real matmul peak and pin down the kernel's true
per-call device time (round 5).

Three measurements:
  1. bf16 + int8 matmul peak (scan-differenced): identifies the hardware
     generation (v5e ≈ 197 bf16 TFLOPS / 394 int8 TOPS; v6e ≈ 2.3×) —
     the denominator of every speed-of-light claim in docs/PERF.md.
  2. The Pallas KING kernel timed two ways: python-loop (sync per call)
     and scan-differenced at several lengths.  Disagreement means the
     scan marginal is not the real per-call cost.
  3. The engine sweep per-step time for comparison.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)


def diff_time(fn, k_short, k_long):
    """Scan-differenced marginal seconds per step."""
    _ = fn(k_short)
    _ = fn(k_long)
    t0 = time.perf_counter(); _ = fn(k_short)
    t1 = time.perf_counter(); _ = fn(k_long)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k_long - k_short)


# ---- 1. matmul peak ----
M = 8192
for dtype, acc in ((jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)):
    a = jnp.asarray(np.random.default_rng(0).integers(-3, 3, (M, M)), dtype)

    @partial(jax.jit, static_argnums=(1,))
    def mm_chain(x, k_steps, _acc=acc):
        def step(c, _):
            c = lax.dot_general(c.astype(x.dtype) if c.dtype != x.dtype else c,
                                x, (((1,), (0,)), ((), ())),
                                preferred_element_type=_acc)
            # renormalize to keep values bounded & defeat constant folding
            return (c & 3).astype(_acc) if _acc == jnp.int32 else c % 3.0, None
        c, _ = lax.scan(step, x.astype(_acc), jnp.arange(k_steps))
        return c.sum()

    dt = diff_time(lambda k: jax.block_until_ready(mm_chain(a, k)), 2, 10)
    flops = 2 * M**3
    print(f"matmul peak {dtype.__name__}: {dt*1e3:.2f} ms per {M}^3 -> "
          f"{flops/dt/1e12:.0f} T{'OPS' if acc==jnp.int32 else 'FLOPS'}",
          file=sys.stderr)

# ---- 2. KING kernel: loop vs scan ----
from cuking_tpu.ops.king_pallas import panel_counts_pallas

panel, w = 1024, 3200
rng = np.random.default_rng(0)
planes = jnp.asarray(
    rng.integers(0, 2**32, (2, 8 * panel, w), dtype=np.uint32))


@jax.jit
def one_call(pi, pj):
    c = panel_counts_pallas(pi, pj, site_chunk_words=128)
    return (c.both_het.sum() + c.het_i.sum() + c.het_j.sum()
            + c.opposing_hom.sum() + c.concordant_hom.sum()
            + c.shared_sites.sum())


slabs = [planes[:, k * panel:(k + 1) * panel, :] for k in range(8)]
for s in slabs:
    s.block_until_ready()
_ = int(one_call(slabs[0], slabs[1]))
# python loop, synchronized per call
t0 = time.perf_counter()
for k in range(8):
    _ = int(one_call(slabs[0], slabs[(k % 7) + 1]))
loop_dt = (time.perf_counter() - t0) / 8
# python loop, async dispatch, one final sync (removes per-call RTT)
t0 = time.perf_counter()
outs = [one_call(slabs[0], slabs[(k % 7) + 1]) for k in range(32)]
_ = [int(o) for o in outs]
loop_async_dt = (time.perf_counter() - t0) / 32
print(f"kernel python-loop sync: {loop_dt*1e3:.2f} ms/call; "
      f"async x32: {loop_async_dt*1e3:.2f} ms/call", file=sys.stderr)


@partial(jax.jit, static_argnums=(1,))
def kernel_chain(pl_, k_steps):
    def step(acc, k):
        pj = lax.dynamic_slice(pl_, (0, (k % 8) * panel, 0), (2, panel, w))
        pi = lax.dynamic_slice(pl_, (0, 0, 0), (2, panel, w))
        c = panel_counts_pallas(pi, pj, site_chunk_words=128)
        return acc + (c.both_het.sum() + c.het_i.sum() + c.het_j.sum()
                      + c.opposing_hom.sum() + c.concordant_hom.sum()
                      + c.shared_sites.sum()), None
    acc, _ = lax.scan(step, jnp.int32(0), jnp.arange(k_steps))
    return acc


for k_short, k_long in ((1, 8), (8, 32), (16, 48)):
    dt = diff_time(lambda k: int(kernel_chain(planes, k)), k_short, k_long)
    print(f"kernel scan-diff ({k_short}->{k_long}): {dt*1e3:.2f} ms/step "
          f"({panel*panel/dt/1e6:.0f} M pairs/s)", file=sys.stderr)
print("DONE", file=sys.stderr)
