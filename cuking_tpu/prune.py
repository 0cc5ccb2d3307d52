"""Downstream relatedness pruning: maximal independent set over the pair graph.

The reference's README points users at Hail's ``maximal_independent_set`` to
prune related samples from the thresholded pair table (README.md:104-106).
This is the Hail-free equivalent operating directly on a :class:`ResultSet`
(or the output Parquet), using the same greedy heuristic Hail documents:
repeatedly remove the currently highest-degree vertex until no edges remain
(approximately maximizes the kept set).  Ties break on the smaller sample
index so results are deterministic.

Typical flow::

    results = KingEngine.from_genotypes(g).run()
    drop = related_samples_to_drop(results)      # set of sample indices
    keep = [s for s in range(n) if s not in drop]
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import numpy as np

from cuking_tpu.models.king import ResultSet


def maximal_independent_set(
    i_idx: np.ndarray, j_idx: np.ndarray
) -> set:
    """Greedy approximate maximum independent set of the undirected graph
    given by edge lists; returns the KEPT vertex set.

    Mirrors Hail's algorithm (hail.methods.maximal_independent_set: "greedily
    removing a vertex of highest degree until the graph contains no edges").
    """
    adj: dict = defaultdict(set)
    for a, b in zip(np.asarray(i_idx).tolist(), np.asarray(j_idx).tolist()):
        if a == b:
            continue
        adj[a].add(b)
        adj[b].add(a)

    removed: set = set()
    # Max-heap on degree (negated), tie-break on vertex id for determinism.
    heap = [(-len(nbrs), v) for v, nbrs in adj.items()]
    heapq.heapify(heap)
    while heap:
        neg_deg, v = heapq.heappop(heap)
        if v in removed:
            continue
        cur = len(adj[v])
        if cur == 0:
            continue
        if -neg_deg != cur:  # stale entry: reinsert with current degree
            heapq.heappush(heap, (-cur, v))
            continue
        removed.add(v)
        for u in adj[v]:
            adj[u].discard(v)
            heapq.heappush(heap, (-len(adj[u]), u))
        adj[v] = set()
    return set(adj.keys()) - removed


def related_samples_to_drop(results: ResultSet) -> set:
    """Sample indices to DROP so that no kept pair remains related —
    the complement of the maximal independent set over the result pairs."""
    vertices = set(results.i_idx.tolist()) | set(results.j_idx.tolist())
    keep = maximal_independent_set(results.i_idx, results.j_idx)
    return vertices - keep
