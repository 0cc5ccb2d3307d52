#!/usr/bin/env python3
"""Sweep Pallas kernel knobs on the real TPU chip.

Times panel_counts_pallas for combinations of (words_multiple, site_chunk,
tile_i, tile_j) at a given site count via scan-differencing (1-step vs
K-step in-device scan over distinct j-slices), and reports effective
pairs/s for each.

Run: python tools/tune_pallas.py [--sites 100000] [--long]
  --sites N   site count for the sweep (default 100k, the headline regime)
  --long      use the 1M-site gnomAD regime (BASELINE.json config 2) —
              the W=31360 long-site tail VERDICT r3 flagged as untuned
"""

import argparse
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=100_000)
    ap.add_argument("--long", action="store_true",
                    help="shorthand for --sites 1000000")
    ap.add_argument("--panel", type=int, default=1024)
    args = ap.parse_args()
    num_sites = 1_000_000 if args.long else args.sites

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cuking_tpu.ops.king_pallas import (
        _select_chunk,
        panel_counts_pallas,
        panel_counts_pallas_indexed,
    )

    panel = args.panel
    # Long sites: fewer resident rows so host gen + upload stay tractable
    # (2 planes × rows × W × 4B; at W=31360, 8·1024 rows ≈ 2 GB).
    n_rows = (8 if num_sites > 400_000 else 16) * panel
    rng = np.random.default_rng(0)

    mb = 1 << 20
    configs = [
        # (words_multiple, site_chunk_words, tile_i, tile_j, unpack,
        #  vmem_budget, mode)   mode: "sliced" | "indexed"
        (128, 128, 256, 256, "u32", 10 * mb, "sliced"),  # deployed default
        # Larger chunks need a raised VMEM budget — at tile 256x256 the
        # 10 MiB default clamps every request back to 128 (VERDICT r3 #1:
        # chunk>128 was never actually measured).  Chunk must also DIVIDE
        # the padded W as a 128-multiple: at wm=128 cohorts (100k → 3200 =
        # 128·25; 1M → 31360 = 128·245) the realizable sizes are 128 and
        # 640 (and 896 at 1M only) — 256/384/512 never divide W.  Fewer
        # accumulator sweeps per output tile at long W.
        (128, 640, 256, 256, "u32", 32 * mb, "sliced"),
        (128, 896, 256, 256, "u32", 48 * mb, "sliced"),
        (128, 640, 128, 256, "u32", 24 * mb, "sliced"),
        (128, 128, 512, 256, "u32", 16 * mb, "sliced"),
        (128, 128, 256, 512, "u32", 16 * mb, "sliced"),
        # u16 unpack: half the shift-AND work per site (2x-packed lanes).
        (128, 128, 256, 256, "u16", 10 * mb, "sliced"),
        (128, 640, 256, 256, "u16", 32 * mb, "sliced"),
        # Scalar-prefetch indexed entry point: no panel slice copies; the
        # engine's default candidate (KingConfig.indexed_panels).
        (128, 128, 256, 256, "u32", 10 * mb, "indexed"),
        (128, 640, 256, 256, "u32", 32 * mb, "indexed"),
        (128, 896, 256, 256, "u32", 48 * mb, "indexed"),
        # u8 probes whether the Mosaic toolchain learned i8 vector compares
        # (panel_counts_pallas rejects it on compiled TPU until then).
        (128, 128, 256, 256, "u8", 10 * mb, "sliced"),
        # words_multiple=64: site padding drops from 2.4% to 0.35% at 100k
        # sites (pure wasted MXU work), paid for by the kernel's site-axis
        # split — a second pallas call covering the <128-word remainder at
        # a full-axis chunk (king_pallas.py).  Also probes whether Mosaic
        # accepts the full-axis (non-128-multiple) trailing block dim the
        # split relies on.
        (64, 128, 256, 256, "u32", 10 * mb, "sliced"),
        (64, 128, 256, 256, "u16", 10 * mb, "sliced"),
    ]
    print(f"backend={jax.default_backend()} sites={num_sites} panel={panel} "
          f"rows={n_rows}", file=sys.stderr)

    # Generate and upload the wm=128 planes ONCE (at W=31360 this is a 2 GB
    # array — per-config regeneration would dominate the sweep on this
    # 1-vCPU box).  wm=64 configs reuse a device-side PREFIX slice: the
    # 64-padded W is always ≤ the 128-padded W, and the content beyond the
    # real sites is padding either way.
    words = -(-(-(-num_sites // 32)) // 128) * 128
    words64 = -(-(-(-num_sites // 32)) // 64) * 64
    planes = jnp.asarray(
        rng.integers(0, 2**32, (2, n_rows, words), dtype=np.uint32)
    )
    planes.block_until_ready()
    planes_by_wm = {128: (planes, words)}
    if words64 != words:
        planes_by_wm[64] = (planes[:, :, :words64], words64)
    else:  # 64- and 128-padding coincide: the wm=64 configs are duplicates
        planes_by_wm[64] = (planes, words)

    seen = set()
    for wm, chunk, tile_i, tile_j, unpack, budget, mode in configs:
        planes_sel, words_sel = planes_by_wm[wm]
        # Replicate the kernel's VMEM-budget clamp so the printed chunk is
        # the EFFECTIVE one (a 256 request at tile 256×256 clamps to 128 —
        # silently measuring a duplicate config otherwise).  A split-W
        # layout's effective chunk is the MAIN (128-aligned prefix) call's.
        w_main = (
            words_sel
            if words_sel <= 128 or words_sel % 128 == 0
            else words_sel - (words_sel % 128)
        )
        per_wc = 3 * 32 * (tile_i + tile_j)
        bound = min(chunk, w_main, max(1, budget // per_wc))
        eff = _select_chunk(w_main, bound, False)
        key = (eff, tile_i, tile_j, unpack, mode, words_sel)
        if key in seen:
            print(f"chunk={chunk:4d} tile={tile_i}x{tile_j} budget="
                  f"{budget // mb}M: clamps to already-measured "
                  f"chunk={eff} — skipped")
            continue
        seen.add(key)
        chunk = eff

        @partial(jax.jit, static_argnums=(1,))
        def chain(planes, k_steps, _chunk=chunk, _ti=tile_i, _tj=tile_j,
                  _words=words_sel, _unpack=unpack, _budget=budget,
                  _mode=mode):
            def step(acc, k):
                j_off = (k % (n_rows // panel)) * panel
                if _mode == "indexed":
                    c = panel_counts_pallas_indexed(
                        planes, jnp.int32(0), j_off.astype(jnp.int32),
                        jnp.int32(0), panel=panel, site_chunk_words=_chunk,
                        tile_i=_ti, tile_j=_tj, unpack=_unpack,
                        vmem_budget=_budget,
                    )
                else:
                    pj = lax.dynamic_slice(
                        planes, (0, j_off, 0), (2, panel, _words)
                    )
                    pi = lax.dynamic_slice(
                        planes, (0, 0, 0), (2, panel, _words)
                    )
                    c = panel_counts_pallas(
                        pi, pj, site_chunk_words=_chunk,
                        tile_i=_ti, tile_j=_tj, unpack=_unpack,
                        vmem_budget=_budget,
                    )
                consumed = (
                    c.both_het + c.het_i + c.het_j + c.opposing_hom
                    + c.concordant_hom + c.shared_sites
                )
                return acc + consumed.sum(), None

            acc, _ = lax.scan(step, jnp.int32(0), jnp.arange(k_steps))
            return acc

        try:
            # Long differencing chains with a median over repeats: the old
            # 1→8 form is dominated by the ~30 ms tunnel RTT on both
            # endpoints and has reported fictitious >speed-of-light rates
            # (tools/chip_probe.py: 1→8 gave 278–375 M pairs/s where 8→32
            # and 16→48 agree at ~203 M).
            k_lo, k_hi = (8, 32) if words <= 4000 else (2, 10)
            _ = int(chain(planes_sel, k_lo))
            _ = int(chain(planes_sel, k_hi))
            deltas = []
            for _rep in range(3):
                t0 = time.perf_counter(); _ = int(chain(planes_sel, k_lo))
                t1 = time.perf_counter(); _ = int(chain(planes_sel, k_hi))
                t2 = time.perf_counter()
                deltas.append(((t2 - t1) - (t1 - t0)) / (k_hi - k_lo))
            dt = max(float(np.median(deltas)), 1e-9)
            pairs_s = panel * panel / dt
            print(
                f"wm={wm:4d} chunk={chunk:4d} tile={tile_i:3d}x{tile_j:3d} "
                f"unpack={unpack:4s} budget={budget // mb:3d}M "
                f"mode={mode:7s} W={words_sel:5d}: "
                f"{dt*1e3:7.2f} ms/panel-pair  {pairs_s/1e6:7.1f} M pairs/s"
            )
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"wm={wm} chunk={chunk} tile={tile_i}x{tile_j} "
                  f"unpack={unpack} budget={budget // mb}M mode={mode}: "
                  f"FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
