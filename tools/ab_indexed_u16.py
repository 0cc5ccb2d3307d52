#!/usr/bin/env python3
"""One-off TPU A/B for the round-4 in-flight kernel work.

1. Correctness: engine run indexed_panels=True vs False -> identical hits.
2. Perf: 1M-site engine sweep, indexed vs sliced.
3. u16 unpack: compiled legality + kernel-only speed vs u32.
"""
import dataclasses
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

from cuking_tpu.models.king import KingConfig, KingEngine, PanelStorage
from cuking_tpu.ops.bitset import PlaneLayout
from cuking_tpu.parallel.submatrix import Submatrix

assert jax.default_backend() == "tpu", jax.default_backend()

# ---------- 1. correctness: small hit-bearing engine run, A/B ----------
num_samples, num_sites, panel = 4096, 50_000, 1024
layout = PlaneLayout.create(num_sites, words_multiple=128)
storage = PanelStorage(layout, Submatrix.create(num_samples, 1, 0), panel)
rng = np.random.default_rng(0)
storage.planes[:] = rng.integers(0, 2**32, storage.planes.shape, dtype=np.uint32)
# clone some rows so hits exist
for fam in range(64):
    src = fam * 8
    for m in range(1, 8):
        storage.planes[:, src + m, :] = storage.planes[:, src, :]
storage.mark_mutated()

results = {}
for idx in (False, True):
    cfg = KingConfig(kin_threshold=0.0884, panel=panel, kernel="pallas",
                     site_chunk_words=128, sweep_batch=16,
                     max_results=10 << 20, indexed_panels=idx)
    eng = KingEngine(storage, cfg)
    rs = eng.run()
    results[idx] = rs
    print(f"indexed={idx}: {len(rs)} hits", file=sys.stderr)

a, b = results[False], results[True]
assert len(a) == len(b), (len(a), len(b))
for f in ("i_idx", "j_idx", "ibs0", "ibs1", "ibs2"):
    assert np.array_equal(getattr(a, f), getattr(b, f)), f
assert np.array_equal(a.kin.view(np.uint32), b.kin.view(np.uint32)), "kin bits"
print("CORRECTNESS OK: indexed == sliced bit-exact "
      f"({len(a)} hits)", file=sys.stderr)

# ---------- 2. perf: 1M-site engine sweep A/B ----------
num_samples_1m, num_sites_1m = 8192, 1_000_000
layout_1m = PlaneLayout.create(num_sites_1m, words_multiple=128)
storage_1m = PanelStorage(layout_1m, Submatrix.create(num_samples_1m, 1, 0), panel)
storage_1m.planes[:] = rng.integers(0, 2**32, storage_1m.planes.shape,
                                    dtype=np.uint32)
pairs_1m = num_samples_1m * (num_samples_1m - 1) / 2
for idx in (False, True):
    cfg = KingConfig(kin_threshold=0.9, panel=panel, kernel="pallas",
                     site_chunk_words=128, sweep_batch=16, indexed_panels=idx)
    eng = KingEngine(storage_1m, cfg)
    eng.run()  # warm-up/compile
    runs = []
    for k in range(1, 4):
        eng.config = dataclasses.replace(eng.config, kin_threshold=0.9 + 1e-4 * k)
        t0 = time.perf_counter()
        eng.run()
        runs.append(time.perf_counter() - t0)
    dt = float(np.median(runs))
    print(f"1M-site indexed={idx}: median {dt*1e3:.1f} ms "
          f"({[round(r*1e3,1) for r in runs]}) -> "
          f"{pairs_1m/dt/1e6:.1f} M pairs/s", file=sys.stderr)

# ---------- 3. u16 unpack compiled on TPU ----------
from cuking_tpu.ops.king_pallas import panel_counts_pallas

words = layout.words
planes_dev = jnp.asarray(storage.planes)

for unpack in ("u32", "u16"):
    @partial(jax.jit, static_argnums=(1,))
    def chain(planes, k_steps, _unpack=unpack):
        def step(acc, k):
            pj = lax.dynamic_slice(planes, (0, (k % 4) * panel, 0),
                                   (2, panel, words))
            pi = lax.dynamic_slice(planes, (0, 0, 0), (2, panel, words))
            c = panel_counts_pallas(pi, pj, site_chunk_words=128,
                                    unpack=_unpack)
            consumed = (c.both_het.sum() + c.het_i.sum() + c.het_j.sum()
                        + c.opposing_hom.sum() + c.concordant_hom.sum()
                        + c.shared_sites.sum())
            return acc + consumed, None
        acc, _ = lax.scan(step, jnp.int32(0), jnp.arange(k_steps))
        return acc

    try:
        v1 = int(chain(planes_dev, 1))
        _ = int(chain(planes_dev, 8))
        t0 = time.perf_counter(); _ = int(chain(planes_dev, 1))
        t1 = time.perf_counter(); _ = int(chain(planes_dev, 8))
        t2 = time.perf_counter()
        dt = max((t2 - t1 - (t1 - t0)) / 7, 1e-9)
        print(f"u16-check unpack={unpack}: checksum={v1} "
              f"{dt*1e3:.2f} ms/panel-pair "
              f"({panel*panel/dt/1e6:.0f} M pairs/s)", file=sys.stderr)
    except Exception as e:
        print(f"unpack={unpack}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", file=sys.stderr)
print("DONE", file=sys.stderr)
