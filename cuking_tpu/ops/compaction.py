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
    flat_mask = mask.ravel()
    total = jnp.sum(flat_mask, dtype=jnp.int32)
    pos = jnp.cumsum(flat_mask, dtype=jnp.int32) - 1
    pos = jnp.where(flat_mask, pos, capacity)  # out-of-bounds → dropped

    def scatter(values: jnp.ndarray, fill) -> jnp.ndarray:
        out = jnp.full((capacity,), fill, values.dtype)
        return out.at[pos].set(values.ravel(), mode="drop")

    return CompactedPanel(
        total=total,
        i_idx=scatter(i_idx, -1),
        j_idx=scatter(j_idx, -1),
        kin=scatter(kin, jnp.float32(0)),
        ibs0=scatter(ibs0, 0),
        ibs1=scatter(ibs1, 0),
        ibs2=scatter(ibs2, 0),
    )
