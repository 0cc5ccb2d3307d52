"""Relatedness pruning: greedy MIS must leave no related pair among kept
samples and keep a maximal set."""

import numpy as np

from cuking_tpu.models.king import KingConfig, KingEngine
from cuking_tpu.prune import maximal_independent_set, related_samples_to_drop
from cuking_tpu.utils.synthetic import random_genotypes


def _is_independent(keep, edges):
    return not any(a in keep and b in keep for a, b in edges)


def test_mis_star_graph():
    # Star: center 0 connected to 1..4 — drop the center, keep the leaves.
    i = np.array([0, 0, 0, 0])
    j = np.array([1, 2, 3, 4])
    keep = maximal_independent_set(i, j)
    assert keep == {1, 2, 3, 4}


def test_mis_chain_and_maximality():
    # Chain 0-1-2-3-4: optimal keeps {0, 2, 4}.
    i = np.array([0, 1, 2, 3])
    j = np.array([1, 2, 3, 4])
    keep = maximal_independent_set(i, j)
    edges = list(zip(i.tolist(), j.tolist()))
    assert _is_independent(keep, edges)
    # Maximal: every removed vertex has a kept neighbor.
    removed = {0, 1, 2, 3, 4} - keep
    adj = {v: set() for v in range(5)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    assert all(adj[v] & keep for v in removed)


def test_mis_random_graphs_independent_and_maximal():
    rng = np.random.default_rng(0)
    for _ in range(10):
        n = int(rng.integers(5, 40))
        m = int(rng.integers(1, 3 * n))
        i = rng.integers(0, n, m)
        j = rng.integers(0, n, m)
        sel = i != j
        i, j = i[sel], j[sel]
        if not len(i):
            continue
        keep = maximal_independent_set(i, j)
        edges = list(zip(i.tolist(), j.tolist()))
        assert _is_independent(keep, edges)
        vertices = set(i.tolist()) | set(j.tolist())
        adj = {v: set() for v in vertices}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        assert all(adj[v] & keep for v in vertices - keep)


def test_related_samples_to_drop_end_to_end():
    g = random_genotypes(40, 600, missing_rate=0.05, seed=17, num_related_pairs=4)
    cfg = KingConfig(kin_threshold=0.2, kernel="matmul", panel=16,
                     site_chunk_words=16)
    results = KingEngine.from_genotypes(g, cfg).run()
    assert len(results) == 4  # the seeded pairs
    drop = related_samples_to_drop(results)
    # Dropping one member per related pair suffices.
    assert len(drop) == 4
    kept_pairs = [
        (a, b) for a, b in zip(results.i_idx, results.j_idx)
        if a not in drop and b not in drop
    ]
    assert not kept_pairs


def test_tie_breaker_orders_equal_degree_removals():
    """Hail tie_breaker semantics: negative return = first node removed
    first.  A 4-cycle 0-1-2-3 has all-equal degrees; preferring to remove
    higher-rank nodes must keep the low-rank pair."""
    import numpy as np

    from cuking_tpu.prune import maximal_independent_set

    i = np.array([0, 1, 2, 3])
    j = np.array([1, 2, 3, 0])
    rank = {0: 0.0, 1: 3.0, 2: 1.0, 3: 2.0}  # higher = worse, drop first

    kept = maximal_independent_set(i, j, tie_breaker=lambda l, r: rank[r] - rank[l])
    # Node 1 (rank 3) goes first, then node 3 (rank 2); 0 and 2 survive.
    assert kept == {0, 2}

    # Opposite preference drops the low-rank nodes instead.
    kept2 = maximal_independent_set(i, j, tie_breaker=lambda l, r: rank[l] - rank[r])
    assert kept2 == {1, 3}

    # Without a tie breaker the default path stays deterministic.
    assert maximal_independent_set(i, j) == maximal_independent_set(i, j)


def test_tie_breaker_through_related_samples_to_drop():
    import numpy as np

    from cuking_tpu.models.king import ResultSet
    from cuking_tpu.prune import related_samples_to_drop

    z = np.zeros(2, np.int32)
    rs = ResultSet(
        i_idx=np.array([5, 5], np.int32), j_idx=np.array([7, 9], np.int32),
        kin=np.full(2, 0.5, np.float32), ibs0=z, ibs1=z.copy(), ibs2=z.copy(),
    )
    # Star around 5: highest degree wins regardless of tie breaker.
    drop = related_samples_to_drop(rs, tie_breaker=lambda l, r: l - r)
    assert drop == {5}
