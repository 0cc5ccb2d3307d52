"""Bit-plane pack/scatter semantics (reference: cuking.cu:507-524, 674-703)."""

import numpy as np
import pytest

from cuking_tpu.ops.bitset import (
    HET,
    HOM,
    PlaneLayout,
    allocate_planes,
    clear_bits_coo,
    pack_genotypes,
    planes_to_genotypes,
    unpack_plane_np,
)
from cuking_tpu.utils.status import FailedPreconditionError
from cuking_tpu.utils.synthetic import genotypes_to_coo, random_genotypes


def test_layout_rounding():
    layout = PlaneLayout.create(100, words_multiple=512)
    assert layout.words == 512
    assert layout.padded_sites == 512 * 32
    layout = PlaneLayout.create(512 * 32 + 1, words_multiple=512)
    assert layout.words == 1024


def test_pack_roundtrip():
    g = random_genotypes(17, 333, missing_rate=0.2, seed=1)
    layout = PlaneLayout.create(333, words_multiple=16)
    planes = pack_genotypes(g, layout)
    assert planes.shape == (2, 17, layout.words)
    assert np.array_equal(planes_to_genotypes(planes, layout), g)


def test_padding_sites_stay_missing():
    g = random_genotypes(3, 10, missing_rate=0.0, seed=2)
    layout = PlaneLayout.create(10, words_multiple=4)
    planes = pack_genotypes(g, layout)
    het = unpack_plane_np(planes[HET], layout)
    hom = unpack_plane_np(planes[HOM], layout)
    # Sites >= num_sites must have both bits set (missing self-masks,
    # mirroring cuking.cu:497-500, 522-523).
    assert (het[:, 10:] == 1).all()
    assert (hom[:, 10:] == 1).all()


@pytest.mark.parametrize("assume_unique", [True, False])
def test_coo_scatter_matches_dense_pack(assume_unique):
    g = random_genotypes(23, 517, missing_rate=0.15, seed=3)
    layout = PlaneLayout.create(517, words_multiple=32)
    row_idx, col_idx, n_alt = genotypes_to_coo(g, seed=4)

    planes = allocate_planes(23, layout)
    clear_bits_coo(
        planes, layout, col_idx, row_idx, n_alt, assume_unique=assume_unique
    )
    expected = pack_genotypes(g, layout)
    assert np.array_equal(planes, expected)


def test_coo_scatter_handles_duplicates():
    layout = PlaneLayout.create(64, words_multiple=2)
    planes = allocate_planes(1, layout)
    # The same (sample, site) entry twice: idempotent clears, like the
    # reference's AtomicClearBit.
    clear_bits_coo(
        planes,
        layout,
        np.array([0, 0]),
        np.array([5, 5]),
        np.array([0, 0]),
        assume_unique=False,
    )
    g = planes_to_genotypes(planes, layout)
    assert g[0, 5] == 0
    assert (g[0, :5] == -1).all() and (g[0, 6:] == -1).all()


def test_invalid_n_alt_alleles_is_hard_error():
    layout = PlaneLayout.create(64, words_multiple=2)
    planes = allocate_planes(1, layout)
    with pytest.raises(
        FailedPreconditionError, match=r"Invalid value for n_alt_alleles \(3\)"
    ):
        clear_bits_coo(
            planes, layout, np.array([0]), np.array([1]), np.array([3]),
            source="test.parquet",
        )


def test_incremental_scatter_multiple_batches():
    """Ingest happens file-by-file; clears must compose."""
    g = random_genotypes(9, 200, missing_rate=0.1, seed=5)
    layout = PlaneLayout.create(200, words_multiple=8)
    row_idx, col_idx, n_alt = genotypes_to_coo(g, seed=6)
    planes = allocate_planes(9, layout)
    for chunk in np.array_split(np.arange(len(n_alt)), 7):
        clear_bits_coo(planes, layout, col_idx[chunk], row_idx[chunk], n_alt[chunk])
    assert np.array_equal(planes, pack_genotypes(g, layout))
