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
