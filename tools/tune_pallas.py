#!/usr/bin/env python3
"""Sweep Pallas kernel knobs on the real TPU chip.

Times panel_counts_pallas for combinations of (words_multiple, site_chunk,
tile) at the bench workload (panel=1024, 100k sites) via scan-differencing
(1-step vs K-step in-device scan over distinct j-slices), and reports
effective pairs/s for each.  Run: python tools/tune_pallas.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cuking_tpu.ops.king_pallas import panel_counts_pallas

    num_sites = 100_000
    panel = 1024
    n_rows = 16 * panel
    rng = np.random.default_rng(0)

    configs = [
        # (words_multiple, site_chunk_words, tile, unpack)
        (128, 128, 256, "u32"),   # the deployed default
        (128, 64, 256, "u32"),
        (128, 256, 256, "u32"),
        (128, 128, 128, "u32"),
        (128, 128, 512, "u32"),
        # u8 probes whether the Mosaic toolchain learned i8 vector compares
        # (panel_counts_pallas rejects it on compiled TPU until then).
        (128, 128, 256, "u8"),
    ]
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    for wm, chunk, tile, unpack in configs:
        words = -(-(-(-num_sites // 32)) // wm) * wm
        planes = jnp.asarray(
            rng.integers(0, 2**32, (2, n_rows, words), dtype=np.uint32)
        )

        @partial(jax.jit, static_argnums=(1,))
        def chain(planes, k_steps, _chunk=chunk, _tile=tile, _words=words,
                  _unpack=unpack):
            def step(acc, k):
                pj = lax.dynamic_slice(
                    planes, (0, k * panel, 0), (2, panel, _words)
                )
                pi = lax.dynamic_slice(planes, (0, 0, 0), (2, panel, _words))
                c = panel_counts_pallas(
                    pi, pj, site_chunk_words=_chunk,
                    tile_i=_tile, tile_j=_tile, unpack=_unpack,
                )
                consumed = (
                    c.both_het + c.het_i + c.het_j + c.opposing_hom
                    + c.concordant_hom + c.shared_sites
                )
                return acc + consumed.sum(), None

            acc, _ = lax.scan(step, jnp.int32(0), jnp.arange(k_steps))
            return acc

        try:
            k_long = 8
            _ = int(chain(planes, 1))
            _ = int(chain(planes, k_long))
            t0 = time.perf_counter(); _ = int(chain(planes, 1))
            t1 = time.perf_counter(); _ = int(chain(planes, k_long))
            t2 = time.perf_counter()
            dt = max((t2 - t1 - (t1 - t0)) / (k_long - 1), 1e-9)
            pairs_s = panel * panel / dt
            print(
                f"wm={wm:4d} chunk={chunk:4d} tile={tile:3d} unpack={unpack:4s} W={words:5d}: "
                f"{dt*1e3:7.2f} ms/panel-pair  {pairs_s/1e6:7.1f} M pairs/s"
            )
        except Exception as e:
            print(f"wm={wm} chunk={chunk} tile={tile} unpack={unpack}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
