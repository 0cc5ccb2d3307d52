"""Fixed-capacity thresholded result compaction — the SPMD analogue of the
reference's atomic result buffer (cuking.cu:296-313).

The CUDA kernel reserves slots in a global ``KingResult[max_results]`` array
with ``atomicAdd`` and raises an overflow flag past capacity
(cuking.cu:299-312, 747-751).  Under jit/XLA we cannot have dynamic shapes,
so each panel-pair step compacts its hits into a static-capacity buffer via a
masked cumulative-sum scatter; positions past capacity are dropped by the
scatter (``mode='drop'``) and detected by comparing the returned total against
capacity.  Flattening row-major keeps hits ordered by (i, j), which the
reference's final host sort requires anyway (cuking.cu:761-765).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CompactedPanel(NamedTuple):
    total: jnp.ndarray  # int32 scalar: number of pairs passing the mask
    i_idx: jnp.ndarray  # [capacity] int32 global sample i
    j_idx: jnp.ndarray  # [capacity] int32 global sample j
    kin: jnp.ndarray    # [capacity] float32
    ibs0: jnp.ndarray   # [capacity] int32
    ibs1: jnp.ndarray   # [capacity] int32
    ibs2: jnp.ndarray   # [capacity] int32


FIELD_FILLS = (-1, -1, jnp.float32(0), 0, 0, 0)  # i, j, kin, ibs0/1/2


def scatter_hits(mask: jnp.ndarray, fields, capacity: int) -> tuple:
    """The one masked cumsum-scatter primitive shared by the engine and
    compact_panel: fields ``(i, j, kin, ibs0, ibs1, ibs2)`` of any common
    shape are flattened row-major and packed into [capacity] buffers at the
    masked positions; positions past capacity are dropped (``mode='drop'``).
    Positions are unique by construction (a cumsum over the mask)."""
    flat = mask.ravel()
    pos = jnp.cumsum(flat, dtype=jnp.int32) - 1
    # Dropped lanes get DISTINCT out-of-bounds indices: mode='drop' discards
    # them either way, but unique_indices=True documents UNDEFINED behavior
    # for repeated indices, so the promise must hold literally.
    pos = jnp.where(flat, pos, capacity + jnp.arange(flat.size, dtype=jnp.int32))
    return tuple(
        jnp.full((capacity,), fill, f.dtype).at[pos].set(
            f.ravel(), mode="drop", unique_indices=True
        )
        for f, fill in zip(fields, FIELD_FILLS)
    )


def compact_panel(
    mask: jnp.ndarray,
    i_idx: jnp.ndarray,
    j_idx: jnp.ndarray,
    kin: jnp.ndarray,
    ibs0: jnp.ndarray,
    ibs1: jnp.ndarray,
    ibs2: jnp.ndarray,
    capacity: int,
) -> CompactedPanel:
    """Scatter masked [NI, NJ] pair results into [capacity] buffers.

    ``total`` may exceed ``capacity``; callers treat that as overflow
    (ResourceExhausted, mirroring cuking.cu:747-751).  Engine callers use
    ``capacity == NI*NJ`` so per-panel overflow is impossible and only the
    global ``max_results`` check applies.
    """
    total = jnp.sum(mask.ravel(), dtype=jnp.int32)
    bufs = scatter_hits(mask, (i_idx, j_idx, kin, ibs0, ibs1, ibs2), capacity)
    return CompactedPanel(total, *bufs)
