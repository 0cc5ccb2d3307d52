#!/usr/bin/env python3
"""Round-5 engine-level check of the tile_i=512 opt-in (needs
LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536):

1. correctness: hit-bearing engine run, default tiles vs 512x256 —
   identical results (the tile edge must not change any counter);
2. perf: the 100k headline sweep and the 1M-site sweep at 512x256.

Kernel-level both regimes measured +1.5% (tools/vmem_probe.py,
/tmp/idx512 probe); this decides whether bench.py opts in.
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
MB = 1 << 20

# ---------- 1. correctness ----------
rng = np.random.default_rng(0)
layout = PlaneLayout.create(50_000, words_multiple=64)
storage = PanelStorage(layout, Submatrix.create(4096, 1, 0), 1024)
storage.planes[:] = rng.integers(0, 2**32, storage.planes.shape,
                                 dtype=np.uint32)
for fam in range(64):
    src = fam * 8
    for m in range(1, 8):
        storage.planes[:, src + m, :] = storage.planes[:, src, :]
storage.mark_mutated()

results = {}
for tag, kw in (("default", {}),
                ("t512", dict(tile_i=512, vmem_budget=20 * MB))):
    cfg = KingConfig(kin_threshold=0.0884, panel=1024, kernel="pallas",
                     site_chunk_words=128, sweep_batch=16,
                     max_results=10 << 20, **kw)
    rs = KingEngine(storage, cfg).run()
    results[tag] = rs
    print(f"{tag}: {len(rs)} hits", file=sys.stderr)
a, b = results["default"], results["t512"]
assert len(a) == len(b), (len(a), len(b))
for f in ("i_idx", "j_idx", "ibs0", "ibs1", "ibs2"):
    assert np.array_equal(getattr(a, f), getattr(b, f)), f
assert np.array_equal(a.kin.view(np.uint32), b.kin.view(np.uint32))
print(f"CORRECTNESS OK: tile512 == default bit-exact ({len(a)} hits)",
      file=sys.stderr)

# ---------- 2. perf ----------
for n, sites, reps in ((32768, 100_000, 5), (16384, 1_000_000, 3)):
    layout = PlaneLayout.create(sites, words_multiple=64)
    st = PanelStorage(layout, Submatrix.create(n, 1, 0), 1024)
    st.planes[:] = rng.integers(0, 2**32, st.planes.shape, dtype=np.uint32)
    cfg = KingConfig(kin_threshold=0.9, panel=1024, kernel="pallas",
                     site_chunk_words=128, sweep_batch=16,
                     tile_i=512, vmem_budget=20 * MB)
    eng = KingEngine(st, cfg)
    t0 = time.perf_counter()
    eng.run()
    print(f"{n}x{sites}: warm-up {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    runs = []
    for k in range(1, reps + 1):
        eng.config = dataclasses.replace(eng.config,
                                         kin_threshold=0.9 + 1e-4 * k)
        t0 = time.perf_counter()
        eng.run()
        runs.append(time.perf_counter() - t0)
    dt = float(np.median(runs))
    pairs = n * (n - 1) / 2
    print(f"engine tile512 {n}x{sites}: median {dt*1e3:.1f} ms "
          f"({[round(r*1e3,1) for r in runs]}) -> {pairs/dt/1e6:.1f} M pairs/s",
          file=sys.stderr)
print("DONE", file=sys.stderr)
