"""Count-kernel parity: jnp popcount and MXU matmul paths vs the numpy oracle,
and the fp32 kin/IBS epilogue vs the reference expression (cuking.cu:286-307)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuking_tpu.ops.bitset import PlaneLayout, pack_genotypes
from cuking_tpu.ops.king_jnp import panel_counts_popcount
from cuking_tpu.ops.king_math import KingCounts, king_from_counts
from cuking_tpu.ops.king_mm import panel_counts_matmul
from cuking_tpu.ops.oracle import oracle_counts, oracle_king
from cuking_tpu.utils.synthetic import random_genotypes

from cuking_tpu.ops.king_pallas import panel_counts_pallas

KERNELS = {
    "popcount": lambda pi, pj: panel_counts_popcount(jnp.asarray(pi), jnp.asarray(pj)),
    "matmul": lambda pi, pj: panel_counts_matmul(
        jnp.asarray(pi), jnp.asarray(pj), site_chunk_words=16
    ),
    # Interpret mode: validates the kernel logic on CPU; the real-TPU path is
    # exercised by tools/tpu_smoke.py and bench.py.
    "pallas": lambda pi, pj: panel_counts_pallas(
        jnp.asarray(pi), jnp.asarray(pj), site_chunk_words=8, tile_i=8,
        tile_j=8, interpret=True
    ),
    # u8/u16-bitcast unpack variants: different (but consistent) site
    # permutation, identical counts.
    "pallas_u8": lambda pi, pj: panel_counts_pallas(
        jnp.asarray(pi), jnp.asarray(pj), site_chunk_words=8, tile_i=8,
        tile_j=8, interpret=True, unpack="u8"
    ),
    "pallas_u16": lambda pi, pj: panel_counts_pallas(
        jnp.asarray(pi), jnp.asarray(pj), site_chunk_words=8, tile_i=8,
        tile_j=8, interpret=True, unpack="u16"
    ),
}


def _panels(num_i, num_j, num_sites, seed, missing_rate=0.12):
    g = random_genotypes(
        num_i + num_j, num_sites, missing_rate=missing_rate, seed=seed,
        num_related_pairs=2,
    )
    g_i, g_j = g[:num_i], g[num_i:]
    layout = PlaneLayout.create(num_sites, words_multiple=32)
    return g_i, g_j, pack_genotypes(g_i, layout), pack_genotypes(g_j, layout)


@pytest.mark.parametrize("kernel_name", list(KERNELS))
@pytest.mark.parametrize(
    "num_i,num_j,num_sites,seed",
    [(8, 8, 100, 0), (16, 8, 1000, 1), (8, 24, 1023, 2), (32, 32, 2048, 3)],
)
def test_counts_match_oracle(kernel_name, num_i, num_j, num_sites, seed):
    g_i, g_j, pi, pj = _panels(num_i, num_j, num_sites, seed)
    expected = oracle_counts(g_i, g_j)
    got = KERNELS[kernel_name](pi, pj)
    for name, exp, act in zip(KingCounts._fields, expected, got):
        act = np.asarray(act)
        assert act.dtype == np.int32
        assert np.array_equal(act, exp), f"{name} mismatch"


@pytest.mark.parametrize("kernel_name", list(KERNELS))
def test_all_missing_sample(kernel_name):
    """A fully missing sample has zero counts everywhere it appears."""
    g = random_genotypes(6, 256, missing_rate=0.1, seed=7)
    g[3, :] = -1
    layout = PlaneLayout.create(256, words_multiple=16)
    planes = pack_genotypes(g, layout)
    got = KERNELS[kernel_name](planes, planes)
    for name, arr in zip(KingCounts._fields, got):
        arr = np.asarray(arr)
        assert (arr[3, :] == 0).all(), name
        assert (arr[:, 3] == 0).all(), name


def test_chunk_not_dividing_words_is_clamped():
    """site_chunk_words larger than (or coprime to) W must clamp to a
    divisor, not crash — W's multiple is the layout's choice, not the
    kernel caller's (regression: chunk=512 with words_multiple=128)."""
    g = random_genotypes(16, 17_000 // 100, missing_rate=0.1, seed=19)
    # W = 20 words (640 sites at wm=4): chunk requests 512 and 7 both work.
    layout = PlaneLayout.create(g.shape[1], words_multiple=4)
    planes = pack_genotypes(g, layout)
    expected = oracle_counts(g, g)
    for chunk in (512, 7):
        got_mm = panel_counts_matmul(
            jnp.asarray(planes), jnp.asarray(planes), site_chunk_words=chunk
        )
        got_pl = panel_counts_pallas(
            jnp.asarray(planes), jnp.asarray(planes),
            site_chunk_words=chunk, tile_i=8, tile_j=8, interpret=True,
        )
        for exp, a, b in zip(expected, got_mm, got_pl):
            assert np.array_equal(np.asarray(a), exp)
            assert np.array_equal(np.asarray(b), exp)


def test_pallas_triangle_skip_upper_tiles_exact():
    """With tri=1 (diagonal panel pair), tiles on/above the tile diagonal are
    still exact; below-diagonal tiles are unspecified and must be masked by
    the caller's strict i<j predicate (which discards them anyway)."""
    g = random_genotypes(32, 512, missing_rate=0.1, seed=21, num_related_pairs=2)
    layout = PlaneLayout.create(512, words_multiple=16)
    planes = pack_genotypes(g, layout)
    tile = 8
    got = panel_counts_pallas(
        jnp.asarray(planes), jnp.asarray(planes), jnp.int32(1),
        site_chunk_words=8, tile_i=tile, tile_j=tile, interpret=True,
    )
    expected = oracle_counts(g, g)
    for name, exp, act in zip(KingCounts._fields, expected, got):
        act = np.asarray(act)
        for bi in range(32 // tile):
            for bj in range(bi, 32 // tile):  # upper tile triangle only
                sl = np.s_[bi * tile:(bi + 1) * tile, bj * tile:(bj + 1) * tile]
                assert np.array_equal(act[sl], exp[sl]), (name, bi, bj)


def test_epilogue_matches_reference_expression():
    g = random_genotypes(24, 4096, missing_rate=0.08, seed=11, num_related_pairs=4)
    layout = PlaneLayout.create(4096, words_multiple=32)
    planes = pack_genotypes(g, layout)
    counts = panel_counts_popcount(jnp.asarray(planes), jnp.asarray(planes))
    kin, ibs0, ibs1, ibs2 = king_from_counts(counts)
    exp_kin, exp_ibs0, exp_ibs1, exp_ibs2 = oracle_king(g, g)

    kin = np.asarray(kin)
    assert kin.dtype == np.float32
    iu, ju = np.triu_indices(24, k=1)
    # Bit-identical fp32 kinship (counts are exact; expression order matches).
    np.testing.assert_array_equal(kin[iu, ju], exp_kin[iu, ju])
    np.testing.assert_array_equal(np.asarray(ibs0)[iu, ju], exp_ibs0[iu, ju])
    np.testing.assert_array_equal(np.asarray(ibs1)[iu, ju], exp_ibs1[iu, ju])
    np.testing.assert_array_equal(np.asarray(ibs2)[iu, ju], exp_ibs2[iu, ju])
    # Sanity: seeded related pairs actually exceed the default threshold.
    assert kin[20, 21] > 0.0884 and kin[22, 23] > 0.0884


def test_zero_het_pair_produces_ieee_division():
    """min_hets == 0 → NaN (0/0) or ±inf, matching CUDA fp32 (cuking.cu:289-294):
    NaN must fail, +inf must pass a strict > threshold."""
    # Sample 0: only hom-ref; sample 1: only hom-alt → no hets, opposing homs.
    g = np.zeros((2, 64), dtype=np.int8)
    g[1, :] = 2
    layout = PlaneLayout.create(64, words_multiple=2)
    planes = pack_genotypes(g, layout)
    counts = panel_counts_popcount(jnp.asarray(planes), jnp.asarray(planes))
    kin = np.asarray(king_from_counts(counts).kin)
    assert np.isneginf(kin[0, 1])  # (0 - 4*64 - 0 - 0) / 0 = -inf
    assert not (kin[0, 1] > -np.inf)

    # Two identical all-hom-ref samples: numerator 0, denominator 0 → NaN.
    g2 = np.zeros((2, 64), dtype=np.int8)
    planes2 = pack_genotypes(g2, layout)
    counts2 = panel_counts_popcount(jnp.asarray(planes2), jnp.asarray(planes2))
    kin2 = np.asarray(king_from_counts(counts2).kin)
    assert np.isnan(kin2[0, 1])
    assert not (kin2[0, 1] > -np.inf)  # NaN never passes the strict >


def test_indexed_matches_sliced_pallas():
    """panel_counts_pallas_indexed (scalar-prefetch block indexing into the
    full storage — the engine's no-copy fast path) must produce the same
    counters as slicing the panels first.  On diagonal panel pairs only the
    upper-triangle tiles are compared (skipped tiles are garbage by
    contract)."""
    from cuking_tpu.ops.king_pallas import panel_counts_pallas_indexed

    g = random_genotypes(64, 700, missing_rate=0.1, seed=3,
                         num_related_pairs=2)
    layout = PlaneLayout.create(700, words_multiple=8)
    planes = jnp.asarray(pack_genotypes(g, layout))
    panel = 16
    for i_off, j_off, tri in [(0, 32, 0), (16, 16, 1), (48, 0, 0)]:
        pi = planes[:, i_off:i_off + panel]
        pj = planes[:, j_off:j_off + panel]
        a = panel_counts_pallas(pi, pj, jnp.int32(tri), site_chunk_words=8,
                                tile_i=8, tile_j=8, interpret=True)
        b = panel_counts_pallas_indexed(
            planes, jnp.int32(i_off), jnp.int32(j_off), jnp.int32(tri),
            panel=panel, site_chunk_words=8, tile_i=8, tile_j=8,
            interpret=True,
        )
        for name in a._fields:
            x, y = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
            if tri:
                assert np.array_equal(np.triu(x), np.triu(y)), name
            else:
                assert np.array_equal(x, y), name

    # Two-buffer form (ring-style: i from one storage, j from another).
    c = panel_counts_pallas_indexed(
        planes[:, :32], jnp.int32(16), jnp.int32(16), jnp.int32(0),
        panel=panel, site_chunk_words=8, tile_i=8, tile_j=8,
        interpret=True, planes_j=planes[:, 32:],
    )
    ref = panel_counts_pallas(
        planes[:, 16:32], planes[:, 48:64], jnp.int32(0),
        site_chunk_words=8, tile_i=8, tile_j=8, interpret=True,
    )
    for name in ref._fields:
        assert np.array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(c, name))
        ), name


def test_indexed_kernel_rejects_misaligned_static_offsets():
    """Static (Python-int) offsets not aligned to the SELECTED tile must be
    rejected — a misaligned offset floor-divides to the wrong row window
    (round-4 review finding), so the contract is enforced where it can be."""
    import numpy as np

    from cuking_tpu.ops.king_pallas import panel_counts_pallas_indexed
    from cuking_tpu.utils.status import InvalidArgumentError

    planes = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 2**32, (2, 48, 8), dtype=np.uint32
        )
    )
    with pytest.raises(InvalidArgumentError, match="selected tile"):
        panel_counts_pallas_indexed(
            planes, 0, 8, jnp.int32(0), panel=24, panel_j=16, interpret=True,
        )
    # Aligned static offsets are fine (j_off=16 is a tj=16 multiple).
    counts = panel_counts_pallas_indexed(
        planes, 0, 16, jnp.int32(0), panel=24, panel_j=16, interpret=True,
    )
    assert counts.both_het.shape == (24, 16)


def test_split_w_nonmultiple_of_128_matches_oracle():
    """W > 128 that is not a 128-multiple (words_multiple=64 layouts, which
    cut site padding) runs as a 128-aligned prefix + full-axis remainder
    pair of pallas calls (Mosaic lane rule); counts stay bit-exact under
    both the u32 and u16 unpack modes."""
    num_sites = 192 * 32 - 5  # W = 192 at wm=64 → split 128 + 64
    g = random_genotypes(
        16, num_sites, missing_rate=0.1, seed=31, num_related_pairs=2
    )
    layout = PlaneLayout.create(num_sites, words_multiple=64)
    assert layout.words == 192 and layout.words % 128 != 0
    planes = jnp.asarray(pack_genotypes(g, layout))
    expected = oracle_counts(g, g)
    for unpack in ("u32", "u16"):
        got = panel_counts_pallas(
            planes, planes, site_chunk_words=128, tile_i=8, tile_j=8,
            interpret=True, unpack=unpack,
        )
        for name, exp, act in zip(KingCounts._fields, expected, got):
            assert np.array_equal(np.asarray(act), exp), (name, unpack)


def test_split_w_triangle_skip_upper_tiles_exact():
    """The tri skip composes with the site-axis split: both halves skip the
    same below-diagonal tiles (garbage + garbage), and every on/above-
    diagonal tile remains exact."""
    num_sites = 192 * 32
    g = random_genotypes(
        32, num_sites, missing_rate=0.1, seed=33, num_related_pairs=2
    )
    layout = PlaneLayout.create(num_sites, words_multiple=64)
    planes = jnp.asarray(pack_genotypes(g, layout))
    tile = 8
    got = panel_counts_pallas(
        planes, planes, jnp.int32(1), site_chunk_words=128,
        tile_i=tile, tile_j=tile, interpret=True,
    )
    expected = oracle_counts(g, g)
    for name, exp, act in zip(KingCounts._fields, expected, got):
        act = np.asarray(act)
        for bi in range(32 // tile):
            for bj in range(bi, 32 // tile):
                sl = np.s_[
                    bi * tile:(bi + 1) * tile, bj * tile:(bj + 1) * tile
                ]
                assert np.array_equal(act[sl], exp[sl]), (name, bi, bj)


def test_indexed_fallback_for_split_w_matches_oracle():
    """A split-needing W degrades the indexed entry to panel slices + the
    sliced path's split (full-storage slices would copy the whole bitset);
    results must equal the oracle for the addressed row windows."""
    from cuking_tpu.ops.king_pallas import panel_counts_pallas_indexed

    num_sites = 192 * 32
    g = random_genotypes(24, num_sites, missing_rate=0.1, seed=34)
    layout = PlaneLayout.create(num_sites, words_multiple=64)
    assert layout.words == 192
    planes = jnp.asarray(pack_genotypes(g, layout))
    got = panel_counts_pallas_indexed(
        planes, jnp.int32(8), jnp.int32(16), jnp.int32(0), panel=8,
        site_chunk_words=128, tile_i=8, tile_j=8, interpret=True,
    )
    expected = oracle_counts(g[8:16], g[16:24])
    for name, exp, act in zip(KingCounts._fields, expected, got):
        assert np.array_equal(np.asarray(act), exp), name
