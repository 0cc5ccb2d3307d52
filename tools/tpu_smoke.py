"""Real-TPU smoke test: Pallas kernel vs matmul/popcount paths + timing.

Run from the repo root: ``python tools/tpu_smoke.py``.  (Do NOT use
PYTHONPATH — it breaks this machine's TPU plugin discovery.)
"""
import sys
import time
import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cuking_tpu.ops.bitset import PlaneLayout, pack_genotypes
from cuking_tpu.ops.king_pallas import panel_counts_pallas
from cuking_tpu.ops.king_mm import panel_counts_matmul
from cuking_tpu.ops.oracle import oracle_counts
from cuking_tpu.utils.synthetic import random_genotypes

print("backend:", jax.default_backend(), jax.devices())

# Correctness at modest size
g = random_genotypes(256, 3000, missing_rate=0.1, seed=5, num_related_pairs=3)
layout = PlaneLayout.create(3000, words_multiple=128)
planes = jnp.asarray(pack_genotypes(g, layout))
c = panel_counts_pallas(planes, planes, site_chunk_words=128)
e = oracle_counts(g, g)
ok = all(np.array_equal(np.asarray(a), b) for a, b in zip(c, e))
print("pallas exact vs oracle:", ok)
assert ok

# Timing at production scale: panel=1024 samples, S=100k sites.
# Scan-differencing over DISTINCT panel slices: per-call host timing through
# a TPU runtime carries ~25 ms of round-trip latency, and the runtime caches
# identical (executable, args) executions — a 1-step vs K-step in-device
# chain isolates true device time (same method as bench.py/tune_pallas.py).
S = 100_000
layout = PlaneLayout.create(S, words_multiple=128)
W = layout.words
panel = 1024
print(f"S={S} -> W={W} words, padded sites={layout.padded_sites}")
rng = np.random.default_rng(0)
planes = jnp.asarray(rng.integers(0, 2**32, (2, 16 * panel, W), dtype=np.uint32))

import functools
from jax import lax


def bench(kernel_fn, name):
    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(planes, k_steps):
        def step(acc, k):
            pi = lax.dynamic_slice(planes, (0, 0, 0), (2, panel, W))
            pj = lax.dynamic_slice(planes, (0, k * panel, 0), (2, panel, W))
            c = kernel_fn(pi, pj)
            consumed = (c.both_het + c.het_i + c.het_j + c.opposing_hom
                        + c.concordant_hom + c.shared_sites)
            return acc + consumed.sum(), None

        acc, _ = lax.scan(step, jnp.int32(0), jnp.arange(k_steps))
        return acc

    k_long = 8
    int(chain(planes, 1)); int(chain(planes, k_long))  # compile both
    t0 = time.perf_counter(); int(chain(planes, 1))
    t1 = time.perf_counter(); int(chain(planes, k_long))
    t2 = time.perf_counter()
    dt = max((t2 - t1 - (t1 - t0)) / (k_long - 1), 1e-9)
    print(f"{name}: {dt*1e3:.2f} ms/panel-pair -> {panel*panel/dt/1e6:.1f} "
          f"M pairs/s (at {S} sites)")


bench(lambda a, b: panel_counts_pallas(a, b, site_chunk_words=128), "pallas")
bench(functools.partial(panel_counts_matmul, site_chunk_words=128), "xla-matmul")
