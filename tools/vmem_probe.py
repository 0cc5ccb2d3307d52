#!/usr/bin/env python3
"""Probe whether raising Mosaic's scoped-VMEM limit
(--xla_tpu_scoped_vmem_limit_kib) unlocks the larger tiles / site chunks
that all failed compile at the default limit (tools/tune_pallas.py round-5
sweeps), and whether any of them beats the deployed (256x256, chunk 128)
point.  Run with the flag in the environment, e.g.:

    XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 python tools/vmem_probe.py
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuking_tpu.ops.king_pallas import panel_counts_pallas

print("backend:", jax.default_backend(),
      "XLA_FLAGS:", os.environ.get("XLA_FLAGS"), file=sys.stderr)
assert jax.default_backend() == "tpu"

panel = 1024
mb = 1 << 20
rng = np.random.default_rng(0)

for sites, w in ((100_000, 3136), (1_000_000, 31296)):
    planes = jnp.asarray(
        rng.integers(0, 2**32, (2, 8 * panel, w), dtype=np.uint32))
    planes.block_until_ready()
    # (site_chunk, tile_i, tile_j, budget)
    configs = [
        (128, 256, 256, 10 * mb),   # deployed default (control)
        (640, 256, 256, 40 * mb),
        (128, 512, 256, 20 * mb),
        (128, 256, 512, 20 * mb),
        (128, 512, 512, 32 * mb),
        (640, 512, 256, 60 * mb),
    ]
    for chunk, ti, tj, budget in configs:
        @partial(jax.jit, static_argnums=(1,))
        def chain(pl_, k_steps, _c=chunk, _ti=ti, _tj=tj, _b=budget):
            def step(acc, k):
                pj = lax.dynamic_slice(pl_, (0, (k % 8) * panel, 0),
                                       (2, panel, w))
                pi = lax.dynamic_slice(pl_, (0, 0, 0), (2, panel, w))
                c = panel_counts_pallas(pi, pj, site_chunk_words=_c,
                                        tile_i=_ti, tile_j=_tj,
                                        vmem_budget=_b)
                return acc + (c.both_het.sum() + c.het_i.sum()
                              + c.het_j.sum() + c.opposing_hom.sum()
                              + c.concordant_hom.sum()
                              + c.shared_sites.sum()), None
            acc, _ = lax.scan(step, jnp.int32(0), jnp.arange(k_steps))
            return acc

        try:
            k_lo, k_hi = (8, 32) if w <= 4000 else (2, 10)
            _ = int(chain(planes, k_lo)); _ = int(chain(planes, k_hi))
            deltas = []
            for _rep in range(3):
                t0 = time.perf_counter(); _ = int(chain(planes, k_lo))
                t1 = time.perf_counter(); _ = int(chain(planes, k_hi))
                t2 = time.perf_counter()
                deltas.append(((t2 - t1) - (t1 - t0)) / (k_hi - k_lo))
            dt = max(float(np.median(deltas)), 1e-9)
            print(f"sites={sites} chunk={chunk:4d} tile={ti}x{tj} "
                  f"budget={budget//mb}M: {dt*1e3:7.2f} ms/pair "
                  f"{panel*panel/dt/1e6:7.1f} M pairs/s")
        except Exception as e:
            print(f"sites={sites} chunk={chunk:4d} tile={ti}x{tj} "
                  f"budget={budget//mb}M: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}")
print("DONE", file=sys.stderr)
