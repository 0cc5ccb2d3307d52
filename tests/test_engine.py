"""End-to-end engine semantics vs the numpy oracle: thresholding, upper
triangle, sharding equivalence, overflow."""

import numpy as np
import pytest

from cuking_tpu.models.king import KingConfig, KingEngine, ResultSet
from cuking_tpu.ops.oracle import oracle_king
from cuking_tpu.parallel.submatrix import Submatrix, num_shards
from cuking_tpu.utils.status import ResourceExhaustedError
from cuking_tpu.utils.synthetic import random_genotypes


def oracle_resultset(g, threshold):
    """All strict-upper-triangle pairs with kin > threshold, sorted (i,j,kin)."""
    kin, ibs0, ibs1, ibs2 = oracle_king(g, g)
    n = g.shape[0]
    iu, ju = np.triu_indices(n, k=1)
    with np.errstate(invalid="ignore"):
        keep = kin[iu, ju] > np.float32(threshold)
    i, j = iu[keep].astype(np.int32), ju[keep].astype(np.int32)
    order = np.lexsort((kin[i, j], j, i))
    return ResultSet(
        i_idx=i[order],
        j_idx=j[order],
        kin=kin[i, j][order],
        ibs0=ibs0[i, j][order].astype(np.int32),
        ibs1=ibs1[i, j][order].astype(np.int32),
        ibs2=ibs2[i, j][order].astype(np.int32),
    )


def assert_resultsets_equal(got: ResultSet, exp: ResultSet):
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got.i_idx, exp.i_idx)
    np.testing.assert_array_equal(got.j_idx, exp.j_idx)
    np.testing.assert_array_equal(got.kin, exp.kin)  # bit-identical fp32
    np.testing.assert_array_equal(got.ibs0, exp.ibs0)
    np.testing.assert_array_equal(got.ibs1, exp.ibs1)
    np.testing.assert_array_equal(got.ibs2, exp.ibs2)


@pytest.mark.parametrize("kernel", ["popcount", "matmul"])
@pytest.mark.parametrize("threshold", [-2.0, 0.0884])
def test_engine_matches_oracle(kernel, threshold):
    # threshold=-2.0 keeps ALL pairs (kin >= -1.5 bounded below by formula
    # only via -inf; -inf pairs still excluded by strict >)... -inf > -2.0 is
    # False is wrong: -inf < -2.0, so -inf pairs are excluded. NaN excluded.
    g = random_genotypes(100, 1500, missing_rate=0.1, seed=42, num_related_pairs=5)
    cfg = KingConfig(
        kin_threshold=threshold, panel=32, kernel=kernel, site_chunk_words=16
    )
    got = KingEngine.from_genotypes(g, cfg).run()
    exp = oracle_resultset(g, threshold)
    assert len(exp) > 0
    assert_resultsets_equal(got, exp)


def test_engine_non_divisible_sizes():
    """Sample count not divisible by panel; panel padding must self-mask."""
    g = random_genotypes(77, 300, missing_rate=0.2, seed=7, num_related_pairs=3)
    cfg = KingConfig(kin_threshold=-2.0, panel=16, kernel="matmul",
                     site_chunk_words=16)
    got = KingEngine.from_genotypes(g, cfg).run()
    assert_resultsets_equal(got, oracle_resultset(g, -2.0))


@pytest.mark.parametrize("split_factor", [2, 4])
def test_sharded_merge_equals_unsharded(split_factor):
    """split_factor=k ⇒ k(k+1)/2 shards; merged == unsharded (README.md:94-102)."""
    g = random_genotypes(90, 400, missing_rate=0.1, seed=13, num_related_pairs=6)
    threshold = 0.05
    cfg = KingConfig(kin_threshold=threshold, panel=16, kernel="matmul",
                     site_chunk_words=16)

    parts = []
    for shard in range(num_shards(split_factor)):
        sm = Submatrix.create(90, split_factor, shard)
        engine = KingEngine.from_genotypes(g, cfg, submatrix=sm)
        parts.append(engine.run())
    merged = ResultSet.concat_and_sort(parts)

    unsharded = KingEngine.from_genotypes(g, cfg).run()
    assert len(unsharded) > 0
    assert_resultsets_equal(merged, unsharded)


def test_max_results_overflow_raises():
    g = random_genotypes(40, 200, missing_rate=0.0, seed=3)
    cfg = KingConfig(kin_threshold=-2.0, max_results=5, panel=16,
                     kernel="matmul", site_chunk_words=16)
    with pytest.raises(ResourceExhaustedError, match="max_results"):
        KingEngine.from_genotypes(g, cfg).run()


def test_no_self_pairs_and_strict_triangle():
    g = random_genotypes(30, 200, missing_rate=0.0, seed=9)
    cfg = KingConfig(kin_threshold=-2.0, panel=8, kernel="matmul",
                     site_chunk_words=16)
    rs = KingEngine.from_genotypes(g, cfg).run()
    assert (rs.i_idx < rs.j_idx).all()
