"""Shard geometry vs brute force (reference semantics: cuking.cu:129-179)."""

import numpy as np
import pytest

from cuking_tpu.parallel.submatrix import Submatrix, num_shards, shard_to_block
from cuking_tpu.utils.status import InvalidArgumentError


def brute_force_blocks(split_factor):
    """All upper-triangular (block_i, block_j) in linear shard order."""
    return [
        (i, j) for i in range(split_factor) for j in range(i, split_factor)
    ]


@pytest.mark.parametrize("split_factor", [1, 2, 3, 4, 7, 16])
def test_shard_to_block_matches_brute_force(split_factor):
    expected = brute_force_blocks(split_factor)
    assert num_shards(split_factor) == len(expected)
    for shard_index, (bi, bj) in enumerate(expected):
        assert shard_to_block(split_factor, shard_index) == (bi, bj)


@pytest.mark.parametrize("num_samples", [1, 5, 16, 100, 1001])
@pytest.mark.parametrize("split_factor", [1, 2, 4, 5])
def test_shards_cover_upper_triangle_exactly_once(num_samples, split_factor):
    """Every strict i<j pair appears in exactly one shard's (row ∈ i-range,
    col ∈ j-range, i<j) set — the reference's kernel pair condition
    (cuking.cu:197-201)."""
    seen = np.zeros((num_samples, num_samples), dtype=np.int32)
    for shard in range(num_shards(split_factor)):
        sm = Submatrix.create(num_samples, split_factor, shard)
        for i in range(sm.i_begin, sm.i_end):
            for j in range(max(sm.j_begin, i + 1), sm.j_end):
                seen[i, j] += 1
    iu, ju = np.triu_indices(num_samples, k=1)
    assert np.all(seen[iu, ju] == 1)
    assert seen.sum() == len(iu)


def test_sample_offset_and_contains():
    sm = Submatrix.create(100, 4, 1)  # block (0, 1): rows 0..25, cols 25..50
    assert (sm.i_begin, sm.i_end, sm.j_begin, sm.j_end) == (0, 25, 25, 50)
    assert not sm.is_diagonal
    assert sm.num_samples == 50
    idx = np.arange(100)
    contained = sm.contains(idx)
    assert contained[:50].all() and not contained[50:].any()
    offs = sm.sample_offset(idx[:50])
    assert np.array_equal(offs, np.arange(50))
    assert np.array_equal(sm.stored_sample_indices(), np.arange(50))


def test_diagonal_block_stores_single_range():
    sm = Submatrix.create(100, 4, 0)  # block (0, 0)
    assert sm.is_diagonal
    assert sm.num_samples == 25
    assert np.array_equal(sm.stored_sample_indices(), np.arange(25))


def test_last_block_is_clamped():
    sm = Submatrix.create(10, 4, num_shards(4) - 1)  # block (3, 3): 9..10
    assert (sm.i_begin, sm.i_end) == (9, 10)
    assert sm.num_rows == 1


def test_validation_matches_reference():
    with pytest.raises(InvalidArgumentError, match="Invalid split factor"):
        Submatrix.create(10, 0, 0)
    with pytest.raises(InvalidArgumentError, match="Invalid shard index"):
        Submatrix.create(10, 4, num_shards(4))
