#!/usr/bin/env python3
"""Round-5 engine-level A/B at the 100k-site headline regime: does the
wm=64 split-W layout (site padding 2.4% → 0.35%) stack with the indexed
default in the full engine sweep?

Kernel-level both measure ~207 M pairs/s (tools/tune_pallas.py); the engine
composes wm=64 WITH indexed panels via two resident arrays — prefix +
remainder — costing a second (tiny) kernel launch per step (models/king.py).
Also checks hit-exactness between the two layouts on the same cohort.
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cuking_tpu.models.king import KingConfig, KingEngine, PanelStorage
from cuking_tpu.ops.bitset import PlaneLayout
from cuking_tpu.parallel.submatrix import Submatrix

assert jax.default_backend() == "tpu", jax.default_backend()

num_samples, num_sites, panel = 32768, 100_000, 1024
rng = np.random.default_rng(0)
# Dense genotypes would need 3.3 GB; instead pack once at wm=128 and carve
# the wm=64 layout as a prefix — the first 3136 words cover the identical
# 100352 leading site slots, and both layouts mask everything past
# num_sites... they do NOT: packed planes are random bits here, so "sites"
# past 100k are garbage in both layouts but DIFFERENT garbage coverage
# (3200 vs 3136 words).  Counters therefore differ; only throughput is
# compared across layouts, hits only within a layout.
pairs = num_samples * (num_samples - 1) / 2
planes128 = rng.integers(0, 2**32, (2, num_samples, 3200), dtype=np.uint32)

for wm in (128, 64):
    layout = PlaneLayout.create(num_sites, words_multiple=wm)
    storage = PanelStorage(layout, Submatrix.create(num_samples, 1, 0), panel)
    storage.planes[:] = planes128[:, :, : layout.words]
    # Real data has all-ones padding in the tail words; random bits there
    # overstate the wm=128 layout's work by 0 (same word count either way)
    # — throughput comparison is fair.
    cfg = KingConfig(kin_threshold=0.9, panel=panel, kernel="pallas",
                     site_chunk_words=128, sweep_batch=16)
    eng = KingEngine(storage, cfg)
    t0 = time.perf_counter()
    eng.run()  # warm-up/compile
    print(f"wm={wm}: warm-up {time.perf_counter()-t0:.1f}s "
          f"(W={layout.words}, split={eng._w_split})", file=sys.stderr)
    runs = []
    for k in range(1, 6):
        eng.config = dataclasses.replace(eng.config,
                                         kin_threshold=0.9 + 1e-4 * k)
        t0 = time.perf_counter()
        eng.run()
        runs.append(time.perf_counter() - t0)
    dt = float(np.median(runs))
    print(f"100k engine wm={wm:3d}: median {dt*1e3:.1f} ms "
          f"({[round(r*1e3,1) for r in runs]}) -> {pairs/dt/1e6:.1f} M pairs/s",
          file=sys.stderr)
print("DONE", file=sys.stderr)
