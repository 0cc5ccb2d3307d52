"""Native C++ packer parity with the numpy scatter path."""

import numpy as np
import pytest

from cuking_tpu.native import packer
from cuking_tpu.ops.bitset import PlaneLayout, allocate_planes, clear_bits_coo, pack_genotypes
from cuking_tpu.utils.status import FailedPreconditionError
from cuking_tpu.utils.synthetic import genotypes_to_coo, random_genotypes

pytestmark = pytest.mark.skipif(
    not packer.available(), reason="native packer unavailable (no g++?)"
)


def test_native_matches_numpy():
    g = random_genotypes(41, 900, missing_rate=0.15, seed=21)
    layout = PlaneLayout.create(900, words_multiple=32)
    row_idx, col_idx, n_alt = genotypes_to_coo(g, seed=22)

    planes = allocate_planes(41, layout)
    packer.clear_bits(planes, layout, col_idx, row_idx, n_alt, num_threads=4)
    assert np.array_equal(planes, pack_genotypes(g, layout))


def test_native_multithreaded_batches():
    """Concurrent batch scatters (the ingest thread-pool pattern) compose."""
    from concurrent.futures import ThreadPoolExecutor

    g = random_genotypes(64, 2000, missing_rate=0.1, seed=23)
    layout = PlaneLayout.create(2000, words_multiple=64)
    row_idx, col_idx, n_alt = genotypes_to_coo(g, seed=24)
    planes = allocate_planes(64, layout)

    chunks = np.array_split(np.arange(len(n_alt)), 13)
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(
            pool.map(
                lambda c: packer.clear_bits(
                    planes, layout, col_idx[c], row_idx[c], n_alt[c], num_threads=2
                ),
                chunks,
            )
        )
    assert np.array_equal(planes, pack_genotypes(g, layout))


def test_native_invalid_n_alt():
    layout = PlaneLayout.create(64, words_multiple=2)
    planes = allocate_planes(2, layout)
    with pytest.raises(FailedPreconditionError, match=r"n_alt_alleles \(5\)"):
        packer.clear_bits(
            planes, layout,
            np.array([0, 1]), np.array([3, 4]), np.array([1, 5]),
            source="x.parquet",
        )


def test_native_duplicates_idempotent():
    layout = PlaneLayout.create(64, words_multiple=2)
    planes = allocate_planes(1, layout)
    packer.clear_bits(
        planes, layout, np.array([0, 0, 0]), np.array([7, 7, 7]),
        np.array([2, 2, 2]),
    )
    from cuking_tpu.ops.bitset import planes_to_genotypes

    assert planes_to_genotypes(planes, layout)[0, 7] == 2
