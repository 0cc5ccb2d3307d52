"""Multi-chip ring sweep on a virtual 8-device CPU mesh (SURVEY.md §4c):
sharded all-pairs results must equal the single-device oracle."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from cuking_tpu.ops.bitset import PlaneLayout, pack_genotypes
from cuking_tpu.ops.king_mm import panel_counts_matmul
from cuking_tpu.parallel.ring import (
    all_pairs_sharded,
    ring_output_local_resultset,
    ring_output_to_resultset,
)
from cuking_tpu.utils.status import ResourceExhaustedError
from cuking_tpu.utils.synthetic import random_genotypes

from tests.test_engine import assert_resultsets_equal, oracle_resultset


def make_mesh(n):
    devices = np.array(jax.devices()[:n])
    return Mesh(devices, axis_names=("samples",))


def kernel(pi, pj, tri=None):
    return panel_counts_matmul(pi, pj, tri, site_chunk_words=16)


@pytest.mark.parametrize("num_devices", [2, 4, 8])
@pytest.mark.parametrize("num_samples", [64, 70])  # divisible and ragged
def test_ring_matches_oracle(num_devices, num_samples):
    g = random_genotypes(
        num_samples, 500, missing_rate=0.1, seed=31, num_related_pairs=4
    )
    layout = PlaneLayout.create(500, words_multiple=16)
    planes = pack_genotypes(g, layout)
    mesh = make_mesh(num_devices)

    out = all_pairs_sharded(
        planes, num_samples, mesh, kernel,
        kin_threshold=0.05, capacity_per_device=4096,
    )
    got = ring_output_to_resultset(out, 4096)
    exp = oracle_resultset(g, 0.05)
    assert len(exp) > 0
    assert_resultsets_equal(got, exp)


def test_ring_keep_all_pairs_exactly_once():
    """threshold=-2 keeps every finite-kin pair; each exactly once."""
    g = random_genotypes(40, 300, missing_rate=0.05, seed=33)
    layout = PlaneLayout.create(300, words_multiple=16)
    planes = pack_genotypes(g, layout)
    mesh = make_mesh(4)
    out = all_pairs_sharded(
        planes, 40, mesh, kernel, kin_threshold=-2.0,
        capacity_per_device=4096,
    )
    got = ring_output_to_resultset(out, 4096)
    exp = oracle_resultset(g, -2.0)
    assert_resultsets_equal(got, exp)
    pairs = set(zip(got.i_idx.tolist(), got.j_idx.tolist()))
    assert len(pairs) == len(got)  # no duplicates


def test_ring_local_resultset_matches_global():
    """In a single process every shard is addressable, so the multi-host
    per-process extraction must reproduce the full gather exactly."""
    g = random_genotypes(50, 400, missing_rate=0.1, seed=35, num_related_pairs=3)
    layout = PlaneLayout.create(400, words_multiple=16)
    planes = pack_genotypes(g, layout)
    mesh = make_mesh(8)
    out = all_pairs_sharded(
        planes, 50, mesh, kernel, kin_threshold=0.05, capacity_per_device=4096,
    )
    local = ring_output_local_resultset(out, 4096)
    full = ring_output_to_resultset(out, 4096)
    assert len(full) > 0
    assert_resultsets_equal(local, full)


def test_ring_local_resultset_overflow():
    g = random_genotypes(32, 200, missing_rate=0.0, seed=36)
    layout = PlaneLayout.create(200, words_multiple=16)
    planes = pack_genotypes(g, layout)
    mesh = make_mesh(4)
    out = all_pairs_sharded(
        planes, 32, mesh, kernel, kin_threshold=-2.0, capacity_per_device=8,
    )
    with pytest.raises(ResourceExhaustedError, match="max_results"):
        ring_output_local_resultset(out, 8)


def test_ring_with_pallas_interpret_kernel():
    """The production TPU combination — Pallas kernel + tri diagonal skip
    inside the shard_map ring — in interpret mode on the CPU mesh."""
    from cuking_tpu.ops.king_pallas import panel_counts_pallas

    g = random_genotypes(32, 256, missing_rate=0.1, seed=37, num_related_pairs=3)
    layout = PlaneLayout.create(256, words_multiple=8)
    planes = pack_genotypes(g, layout)
    mesh = make_mesh(4)

    def pallas_kernel(pi, pj, tri):
        return panel_counts_pallas(
            pi, pj, tri, site_chunk_words=8, tile_i=8, tile_j=8,
            interpret=True,
        )

    out = all_pairs_sharded(
        planes, 32, mesh, pallas_kernel,
        kin_threshold=0.05, capacity_per_device=4096, row_multiple=8,
    )
    got = ring_output_to_resultset(out, 4096)
    exp = oracle_resultset(g, 0.05)
    assert len(exp) > 0
    assert_resultsets_equal(got, exp)


def test_ring_overflow_detection():
    g = random_genotypes(32, 200, missing_rate=0.0, seed=34)
    layout = PlaneLayout.create(200, words_multiple=16)
    planes = pack_genotypes(g, layout)
    mesh = make_mesh(4)
    out = all_pairs_sharded(
        planes, 32, mesh, kernel, kin_threshold=-2.0, capacity_per_device=8,
    )
    with pytest.raises(ResourceExhaustedError, match="max_results"):
        ring_output_to_resultset(out, 8)
