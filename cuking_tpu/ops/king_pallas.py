"""Pallas TPU kernel: fused bit-unpack + int8 MXU matmul for KING counts.

This is the TPU replacement for the reference's one-CUDA-block-per-pair
popcount kernel (cuking.cu:191-314).  Instead of VPU popcounts per pair, all
six counters come from one stacked-indicator Gram matmul (see king_mm.py for
the algebra); this kernel keeps the HBM working set at the packed 2
bits/site/sample by unpacking {het, hom-alt, defined} bits to int8 **inside
VMEM**, then feeding the MXU:

grid = (NI/TI, NJ/TJ, W/WC), site-chunk innermost so the int32 Gram
accumulator lives in VMEM scratch across the sweep:

    per step: planes_i tile [2, TI, WC]u32, planes_j tile [2, TJ, WC]u32
      → unpack to X_i [3·TI, 32·WC] i8, X_j [3·TJ, 32·WC] i8   (VPU)
      → G += X_i · X_jᵀ                                        (MXU, i8→i32)
    at last chunk: slice G's 3×3 blocks → six [TI, TJ] i32 counters → HBM

The i-tile stays resident while j sweeps the row (grid order), giving the
panel reuse the reference gets from its per-pair block scheduling.  Counts
are integer-exact: int8 0/1 products accumulated in int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuking_tpu.ops.king_math import KingCounts
from cuking_tpu.utils.status import InvalidArgumentError

# Tile defaults, tuned on v5e (tools/tune_pallas.py): with a 128-word site
# chunk, X tiles are [3·256, 32·128] int8 = 3 MiB each, Gram scratch
# [768, 768] i32 = 2.25 MiB — inside 16 MiB VMEM with double-buffered
# inputs.  256 beats 128 (200 vs 188 M pairs/s): twice the MXU work per
# unpacked byte.
TILE_I = 256
TILE_J = 256

# VMEM spent on the two unpacked int8 tiles per site chunk.  Conservative:
# v5e has 128 MiB VMEM, but Mosaic's scoped-vmem allocator also holds the
# double-buffered input blocks, the Gram scratch, and six output tiles, and
# over-asking fails at compile time (HTTP 500 tpu_compile_helper).  Tunable
# per call (tools/tune_pallas.py sweeps it — the clamp decides the largest
# legal site chunk, which sets the accumulator sweep count at long W).
VMEM_BUDGET = 10 << 20


def _select_chunk(w: int, bound: int, interpret: bool) -> int | None:
    """Largest site-chunk (in uint32 words) ≤ bound that divides W and — on
    the compiled TPU path — satisfies Mosaic's lane rule (the trailing block
    dim must be a 128-multiple, or the full axis)."""
    for c in range(min(bound, w), 0, -1):
        if w % c == 0 and (interpret or c % 128 == 0 or c == w):
            return c
    return None


def _unpack3(
    het: jnp.ndarray, hom: jnp.ndarray, ti: int, wc: int, mode: str = "u32"
) -> jnp.ndarray:
    """[TI, WC]u32 het/hom → [3·TI, 32·WC]i8 stacked H/A/D indicators.

    All six counters are site-permutation-invariant sums, so any fixed site
    order is valid as long as both operands use the same one (bitset.py).

    mode="u32": [TI, WC]u32 refs; 32 lane-wise shift-ANDs per word.
    mode="u16": refs already bitcast to [TI, 2·WC]u16 OUTSIDE the kernel
    (Mosaic can't change bitwidths in-kernel), so 16 shift-ANDs each
    covering 2× the sites per packed vector register — up to a 2× cut in
    unpack work where Mosaic packs 16-bit lanes.
    mode="u8": same idea at [TI, 4·WC]u8 with 8 mask-compares (4× cut).
    NOTE: u8 and u16 only run in interpret mode; the deployed Mosaic can't
    legalize sub-32-bit vector shifts (u8 fails to lower; u16 dies in
    tpu_compile_helper with an internal error — measured 2026-08-19,
    tools/ab_indexed_u16.py).  Kept for future toolchains.  At ~94% MXU
    utilization the u32 unpack is already largely overlapped, so the
    ceiling on any unpack cut is ≤6%; see docs/PERF.md for the measured
    verdict on each mode.
    """
    h = het & ~hom
    a = ~het & hom
    d = ~(het & hom)
    rows = []
    for plane in (h, a, d):
        if mode == "u8":
            # Mosaic has no i8 vector shift; mask-and-compare legalizes.
            bits = [
                (plane & jnp.uint8(1 << b) > 0).astype(jnp.int8)
                for b in range(8)
            ]
        elif mode == "u16":
            bits = [
                ((plane >> jnp.uint16(b)) & jnp.uint16(1)).astype(jnp.int8)
                for b in range(16)
            ]
        else:
            bits = [
                ((plane >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.int8)
                for b in range(32)
            ]
        rows.append(jnp.concatenate(bits, axis=1))  # [TI, 32·WC]
    return jnp.concatenate(rows, axis=0)  # [3·TI, 32·WC]


def _king_body(tri_flag, pi_ref, pj_ref, bh_ref, hi_ref, hj_ref, oh_ref,
               ch_ref, ss_ref, g_acc, *, ti: int, tj: int, wc: int,
               unpack: str = "u32"):
    """Shared kernel body for both entry points (sliced-panel and
    scalar-prefetch-indexed)."""
    s = pl.program_id(2)
    ns = pl.num_programs(2)
    # Triangle skip: when the caller marks this panel pair as diagonal
    # (gi_base == gj_base), tiles strictly below the tile diagonal hold only
    # pairs with global i > j, which the epilogue mask discards anyway
    # (cuking.cu:199 contract) — skip their unpack + matmul entirely.  Their
    # output blocks are left unwritten (garbage), masked downstream.
    active = (tri_flag == 0) | (
        pl.program_id(0) * ti <= pl.program_id(1) * tj + (tj - 1)
    )

    @pl.when(active)
    def _():
        @pl.when(s == 0)
        def _():
            g_acc[:] = jnp.zeros_like(g_acc)

        xi = _unpack3(pi_ref[0], pi_ref[1], ti, wc, unpack)
        xj = _unpack3(pj_ref[0], pj_ref[1], tj, wc, unpack)
        g_acc[:] += lax.dot_general(
            xi,
            xj,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(s == ns - 1)
        def _():
            g = g_acc[:]
            blk = lambda r, c: g[r * ti : (r + 1) * ti, c * tj : (c + 1) * tj]
            HH, HA, HD = blk(0, 0), blk(0, 1), blk(0, 2)
            AH, AA, AD = blk(1, 0), blk(1, 1), blk(1, 2)
            DH, DA, DD = blk(2, 0), blk(2, 1), blk(2, 2)
            bh_ref[:] = HH
            hi_ref[:] = HD
            hj_ref[:] = DH
            ss_ref[:] = DD
            oh_ref[:] = DA + AD - HA - AH - 2 * AA
            ch_ref[:] = DD - DH - DA - HD + HH + HA - AD + AH + 2 * AA


def _king_kernel(tri_ref, pi_ref, pj_ref, *rest, ti: int, tj: int, wc: int,
                 unpack: str = "u32"):
    _king_body(tri_ref[0], pi_ref, pj_ref, *rest, ti=ti, tj=tj, wc=wc,
               unpack=unpack)


def _king_kernel_indexed(offs_ref, pi_ref, pj_ref, *rest, ti: int, tj: int,
                         wc: int, unpack: str = "u32"):
    # offs_ref (scalar prefetch): [3] int32 = (i block base, j block base,
    # tri flag); the block bases are consumed by the BlockSpec index_maps.
    _king_body(offs_ref[2], pi_ref, pj_ref, *rest, ti=ti, tj=tj, wc=wc,
               unpack=unpack)


@functools.partial(
    jax.jit,
    static_argnames=(
        "site_chunk_words", "tile_i", "tile_j", "interpret", "unpack",
        "vmem_budget",
    ),
)
def panel_counts_pallas(
    planes_i: jnp.ndarray,
    planes_j: jnp.ndarray,
    tri: jnp.ndarray | None = None,
    site_chunk_words: int = 128,
    tile_i: int = TILE_I,
    tile_j: int = TILE_J,
    interpret: bool = False,
    unpack: str = "u32",
    vmem_budget: int = VMEM_BUDGET,
) -> KingCounts:
    """Six KING counters for an (i-panel, j-panel) pair via the fused Pallas
    kernel.  planes_*: [2, N, W] uint32; N divisible by the tile size, W by
    the site chunk.

    ``tri``: optional int32 scalar; nonzero marks the panel pair as lying on
    the global diagonal (gi_base == gj_base), enabling the in-kernel
    lower-triangle tile skip.  Counter tiles strictly below the tile diagonal
    are then left unwritten — callers MUST mask with the strict global
    ``i < j`` predicate (they already must, per cuking.cu:199).
    """
    if unpack in ("u8", "u16") and not interpret:
        # The deployed Mosaic can't legalize sub-32-bit vector shifts: u8
        # fails to lower (i8 vector compare), and u16 dies inside
        # tpu_compile_helper with an internal error (measured 2026-08-19,
        # tools/ab_indexed_u16.py).  Fail clearly instead of obscurely.
        raise NotImplementedError(
            f"unpack='{unpack}' only runs in interpret mode on the current "
            "Mosaic toolchain (sub-32-bit vector shifts don't legalize); "
            "use the default unpack='u32' for compiled TPU execution."
        )
    ni, nj = planes_i.shape[1], planes_j.shape[1]
    w = planes_i.shape[2]
    ti, tj = min(tile_i, ni), min(tile_j, nj)
    assert ni % ti == 0 and nj % tj == 0, (ni, nj, ti, tj)
    # Chunk selection: the largest divisor of W that fits both the request
    # and the VMEM budget — the unpacked int8 tiles [3·T, 32·wc] ×2 plus the
    # int32 Gram scratch and double-buffered input blocks must stay inside
    # ~16 MiB, and W's multiple depends on the caller's layout choice, so
    # neither constraint is an assertion (a bad combination must not fail at
    # Mosaic compile time with a scoped-vmem OOM).  On the compiled TPU path
    # Mosaic additionally requires the trailing block dim to be a multiple of
    # 128 lanes (or the whole axis).
    budget = vmem_budget
    per_wc = 3 * 32 * (ti + tj)  # unpacked bytes per word-column
    bound = min(site_chunk_words, w, max(1, budget // per_wc))
    if _select_chunk(w, bound, False) is None and w > 128 and w % 128:
        # No Mosaic-legal chunk for this W (the lane rule admits only
        # 128-multiples or the full axis) — e.g. words_multiple=64 layouts,
        # which cut the pure-MXU-waste site padding at 100k sites from 2.4%
        # to 0.35% (docs/PERF.md).  Run TWO calls: the 128-aligned prefix
        # at the requested chunk plus a <128-word full-axis-chunk
        # remainder.  Every counter is a sum over disjoint site ranges, so
        # the six outputs add; tri-skipped diagonal tiles stay unwritten
        # (garbage) in BOTH halves and are masked by callers as always.
        # The split decision uses the COMPILED legality rule even in
        # interpret mode (where any divisor chunk would be legal) so tests
        # exercise the exact compiled-path structure; a W whose full axis
        # fits the request and budget stays a single call either way.  The
        # slices are cheap: the operands here are already per-panel
        # [2, panel, W] tiles, not the full storage.
        w1 = w - (w % 128)
        kw = dict(tri=tri, tile_i=tile_i, tile_j=tile_j, interpret=interpret,
                  unpack=unpack, vmem_budget=vmem_budget)
        head = panel_counts_pallas(
            planes_i[:, :, :w1], planes_j[:, :, :w1],
            site_chunk_words=site_chunk_words, **kw)
        rest = panel_counts_pallas(
            planes_i[:, :, w1:], planes_j[:, :, w1:],
            site_chunk_words=w - w1, **kw)
        return KingCounts(*(a + b for a, b in zip(head, rest)))
    wc = _select_chunk(w, bound, interpret)
    if wc is None:
        raise InvalidArgumentError(
            f"tile_i={ti}/tile_j={tj} leave no Mosaic-legal site chunk "
            f"within the VMEM budget for W={w}; use smaller tiles."
        )
    grid = (ni // ti, nj // tj, w // wc)
    if tri is None:
        tri = jnp.zeros((1,), jnp.int32)
    else:
        tri = jnp.asarray(tri, jnp.int32).reshape((1,))

    if unpack in ("u8", "u16"):
        # Bitcast to narrower lanes in XLA (free: same HBM bytes); the
        # kernel then unpacks with 8 (u8) / 16 (u16) shift-ANDs instead
        # of 32.  Little-endian lane order within each u32 word — a site
        # permutation both operands share, so counts are unaffected
        # (site-permutation invariance, bitset.py).
        sub = {"u8": jnp.uint8, "u16": jnp.uint16}[unpack]
        ratio = 4 if unpack == "u8" else 2
        planes_i = lax.bitcast_convert_type(planes_i, sub).reshape(
            2, ni, ratio * w
        )
        planes_j = lax.bitcast_convert_type(planes_j, sub).reshape(
            2, nj, ratio * w
        )
        in_wc = ratio * wc
    else:
        in_wc = wc

    out_shape = [jax.ShapeDtypeStruct((ni, nj), jnp.int32)] * 6
    out_spec = pl.BlockSpec((ti, tj), lambda i, j, s: (i, j),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _king_kernel, ti=ti, tj=tj, wc=wc, unpack=unpack
    )
    flops = 2 * (3 * ni) * (3 * nj) * (32 * w)
    # HBM traffic: the j-panel planes re-read once per i-tile, i-tiles once,
    # six dense counter tiles written once.
    bytes_accessed = (
        grid[0] * nj * w * 2 * 4 + ni * w * 2 * 4 + 6 * ni * nj * 4
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, ti, in_wc), lambda i, j, s: (0, i, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tj, in_wc), lambda i, j, s: (0, j, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 6,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((3 * ti, 3 * tj), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0,
        ),
        interpret=interpret,
    )(tri, planes_i, planes_j)
    bh, hi, hj, oh, ch, ss = outs
    return KingCounts(
        both_het=bh, het_i=hi, het_j=hj, opposing_hom=oh,
        concordant_hom=ch, shared_sites=ss,
    )


def panel_counts_pallas_indexed(
    planes: jnp.ndarray,
    i_off: jnp.ndarray,
    j_off: jnp.ndarray,
    tri: jnp.ndarray,
    panel: int,
    site_chunk_words: int = 128,
    tile_i: int = TILE_I,
    tile_j: int = TILE_J,
    interpret: bool = False,
    unpack: str = "u32",
    vmem_budget: int = VMEM_BUDGET,
    planes_j: jnp.ndarray | None = None,
    panel_j: int | None = None,
) -> KingCounts:
    """Unjitted entry: validates what can only be checked OUTSIDE jit —
    static (Python-int) row offsets against the selected tile sizes; under
    jit they become tracers before any isinstance test could see them.
    Full contract on ``_panel_counts_pallas_indexed`` below."""
    pj = panel if panel_j is None else panel_j
    ti, tj = min(tile_i, panel), min(tile_j, pj)
    for off, t, name in ((i_off, ti, "i_off"), (j_off, tj, "j_off")):
        if isinstance(off, int) and off % t:
            raise InvalidArgumentError(
                f"{name}={off} is not a multiple of the selected tile {t}; "
                "the block index would floor to the wrong row window."
            )
    return _panel_counts_pallas_indexed(
        planes, i_off, j_off, tri, panel, site_chunk_words, tile_i, tile_j,
        interpret, unpack, vmem_budget, planes_j, panel_j,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "panel", "site_chunk_words", "tile_i", "tile_j", "interpret",
        "unpack", "vmem_budget", "panel_j",
    ),
)
def _panel_counts_pallas_indexed(
    planes: jnp.ndarray,
    i_off: jnp.ndarray,
    j_off: jnp.ndarray,
    tri: jnp.ndarray,
    panel: int,
    site_chunk_words: int = 128,
    tile_i: int = TILE_I,
    tile_j: int = TILE_J,
    interpret: bool = False,
    unpack: str = "u32",
    vmem_budget: int = VMEM_BUDGET,
    planes_j: jnp.ndarray | None = None,
    panel_j: int | None = None,
) -> KingCounts:
    """Six KING counters for the panel pair at rows [i_off, i_off+panel) x
    [j_off, j_off+panel_j) of the FULL plane storage, via scalar-prefetch
    block indexing.

    Same kernel as ``panel_counts_pallas``, but the pallas_call indexes
    straight into the [2, N, W] storage with the (traced) row offsets fed
    through scalar prefetch, so the caller does NOT materialize per-panel
    slices.  The engine's scan body previously dynamic-sliced both panels
    out of HBM every step — at gnomAD-scale W (1M sites = 125 KiB/row) two
    ~257 MiB copies per panel pair, pure HBM-bandwidth overhead the
    reference never pays (its CUDA kernel reads the bitset in place,
    cuking.cu:218-240).

    ``i_off``/``j_off`` must be multiples of the SELECTED tile sizes
    (``ti = min(tile_i, panel)``, ``tj = min(tile_j, panel_j)``) — the
    block index is ``off // tile``, so a misaligned offset floor-divides
    to the wrong row window silently.  Offsets that are multiples of the
    panel edge always qualify (``panel % ti == 0`` is asserted), which is
    what the engine and the ring pass; static (Python-int) offsets are
    checked here, traced ones are the caller's contract.  ``panel`` a
    multiple of the tile size, W of the site chunk.  ``tri`` as in
    ``panel_counts_pallas``.

    ``planes_j``: optional second storage for the j rows (defaults to
    ``planes``) — lets ring-style callers index the i-panel out of their
    resident block and the j-panel out of the rotating buffer without
    slicing either.

    ``panel_j``: optional j-range row count (defaults to ``panel``) — the
    ring's wrap-split and off-diagonal rectangular sweeps use asymmetric
    sub-tiles (parallel/ring.py), so the two block edges are independent.
    """
    if unpack in ("u8", "u16") and not interpret:
        raise NotImplementedError(
            f"unpack='{unpack}' only runs in interpret mode on the current "
            "Mosaic toolchain (sub-32-bit vector shifts don't legalize); "
            "use the default unpack='u32' for compiled TPU execution."
        )
    if planes_j is None:
        planes_j = planes
    if panel_j is None:
        panel_j = panel
    n, w = planes.shape[1], planes.shape[2]
    assert planes_j.shape[0] == 2 and planes_j.shape[2] == w, planes_j.shape
    nj = planes_j.shape[1]
    ti, tj = min(tile_i, panel), min(tile_j, panel_j)
    assert panel % ti == 0 and panel_j % tj == 0, (panel, panel_j, ti, tj)
    budget = vmem_budget
    per_wc = 3 * 32 * (ti + tj)
    bound = min(site_chunk_words, w, max(1, budget // per_wc))
    if _select_chunk(w, bound, False) is None and w > 128 and w % 128:
        # A W with no Mosaic-legal chunk (lane rule: 128-multiples or the
        # full axis) needs the site-axis split (see panel_counts_pallas) —
        # but splitting HERE would slice the FULL [2, N, W] storage, a
        # whole-bitset copy per step.  Degrade instead to the sliced path:
        # materialize the two panels (exactly the copies indexed mode
        # exists to avoid) and let panel_counts_pallas run its
        # 128-aligned-prefix + remainder split.  The decision uses the
        # COMPILED legality rule even in interpret mode, mirroring
        # panel_counts_pallas.  The engine avoids this fallback entirely
        # for such layouts by keeping prefix + remainder as two resident
        # arrays (models/king.py).
        pi = lax.dynamic_slice(planes, (0, i_off, 0), (2, panel, w))
        pj = lax.dynamic_slice(planes_j, (0, j_off, 0), (2, panel_j, w))
        return panel_counts_pallas(
            pi, pj, tri, site_chunk_words=site_chunk_words, tile_i=tile_i,
            tile_j=tile_j, interpret=interpret, unpack=unpack,
            vmem_budget=vmem_budget,
        )
    wc = _select_chunk(w, bound, interpret)
    if wc is None:
        raise InvalidArgumentError(
            f"tile_i={ti}/tile_j={tj} leave no Mosaic-legal site chunk "
            f"within the VMEM budget for W={w}; use smaller tiles."
        )
    grid = (panel // ti, panel_j // tj, w // wc)

    if unpack in ("u8", "u16"):
        sub = {"u8": jnp.uint8, "u16": jnp.uint16}[unpack]
        ratio = 4 if unpack == "u8" else 2
        planes = lax.bitcast_convert_type(planes, sub).reshape(
            2, n, ratio * w
        )
        planes_j = lax.bitcast_convert_type(planes_j, sub).reshape(
            2, nj, ratio * w
        )
        in_wc = ratio * wc
    else:
        in_wc = wc

    # Scalar-prefetch payload: block-unit row bases + the tri flag.  The
    # index_maps below receive it as their trailing ref argument.
    offs = jnp.stack(
        [
            jnp.asarray(i_off, jnp.int32) // ti,
            jnp.asarray(j_off, jnp.int32) // tj,
            jnp.asarray(tri, jnp.int32).reshape(()),
        ]
    )

    out_shape = [jax.ShapeDtypeStruct((panel, panel_j), jnp.int32)] * 6
    out_spec = pl.BlockSpec((ti, tj), lambda i, j, s, offs: (i, j),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _king_kernel_indexed, ti=ti, tj=tj, wc=wc, unpack=unpack
    )
    flops = 2 * (3 * panel) * (3 * panel_j) * (32 * w)
    bytes_accessed = (
        grid[0] * panel_j * w * 2 * 4 + panel * w * 2 * 4
        + 6 * panel * panel_j * 4
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, ti, in_wc),
                         lambda i, j, s, offs: (0, offs[0] + i, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tj, in_wc),
                         lambda i, j, s, offs: (0, offs[1] + j, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 6,
        scratch_shapes=[pltpu.VMEM((3 * ti, 3 * tj), jnp.int32)],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0,
        ),
        interpret=interpret,
        # In the default planes_j-is-planes case XLA aliases the buffer;
        # the two BlockSpecs just DMA different row windows from it.
    )(offs, planes, planes_j)
    bh, hi, hj, oh, ch, ss = outs
    return KingCounts(
        both_het=bh, het_i=hi, het_j=hj, opposing_hom=oh,
        concordant_hom=ch, shared_sites=ss,
    )
