#!/usr/bin/env python3
"""Round-5 experiment: where does the 1M-site ENGINE sweep lose ~6% vs its
own kernel?

tools/tune_pallas.py --long measures the indexed kernel at 21.2 M pairs/s
(W=31360); the engine sweep measures 19.9 M (tools/ab_indexed_u16.py).
Structural tri-skip waste on the 8 diagonal panel pairs accounts for ~3%
(the 256-wide tile diagonal), leaving ~3% ≈ 100 ms of host/dispatch time.
This A/Bs the dispatch structure: sweep_batch 16 (3 dispatches) vs 64
(1 dispatch), and a wider lagged-fetch window.
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

num_samples, num_sites, panel = 8192, 1_000_000, 1024
layout = PlaneLayout.create(num_sites, words_multiple=128)
storage = PanelStorage(layout, Submatrix.create(num_samples, 1, 0), panel)
rng = np.random.default_rng(0)
storage.planes[:] = rng.integers(0, 2**32, storage.planes.shape,
                                 dtype=np.uint32)
pairs = num_samples * (num_samples - 1) / 2

for sweep_batch in (16, 36, 64):
    cfg = KingConfig(kin_threshold=0.9, panel=panel, kernel="pallas",
                     site_chunk_words=128, sweep_batch=sweep_batch)
    eng = KingEngine(storage, cfg)
    eng.run()  # warm-up/compile
    runs = []
    for k in range(1, 6):
        eng.config = dataclasses.replace(eng.config,
                                         kin_threshold=0.9 + 1e-4 * k)
        t0 = time.perf_counter()
        eng.run()
        runs.append(time.perf_counter() - t0)
    dt = float(np.median(runs))
    print(f"1M engine sweep_batch={sweep_batch:3d}: median {dt*1e3:.1f} ms "
          f"({[round(r*1e3,1) for r in runs]}) -> {pairs/dt/1e6:.2f} M pairs/s",
          file=sys.stderr)
print("DONE", file=sys.stderr)
