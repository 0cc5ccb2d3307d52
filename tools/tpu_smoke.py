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

# Timing at production scale: panel=1024 samples, S=100k sites
S = 100_000
layout = PlaneLayout.create(S, words_multiple=128)
W = layout.words
print(f"S={S} -> W={W} words, padded sites={layout.padded_sites}")
rng = np.random.default_rng(0)
pl_i = jnp.asarray(rng.integers(0, 2**32, (2, 1024, W), dtype=np.uint32))
pl_j = jnp.asarray(rng.integers(0, 2**32, (2, 1024, W), dtype=np.uint32))

def bench(fn, name, iters=5):
    out = fn(pl_i, pl_j)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(pl_i, pl_j)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    pairs = 1024 * 1024
    print(f"{name}: {dt*1e3:.2f} ms/panel-pair -> {pairs/dt/1e6:.1f} M pairs/s "
          f"(at {S} sites)")
    return dt

bench(lambda a, b: panel_counts_pallas(a, b, site_chunk_words=128), "pallas")
import functools
mm = jax.jit(functools.partial(panel_counts_matmul, site_chunk_words=128))
bench(mm, "xla-matmul")
