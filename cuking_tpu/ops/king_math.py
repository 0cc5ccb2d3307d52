"""KING kinship / IBS epilogue — the numerics parity contract.

Implements exactly the reference's fp32 expression tree (cuking.cu:286-307),
which is itself Hail's "between-family" estimator
(https://hail.is/docs/0.2/methods/relatedness.html#hail.methods.king)::

    min_hets = min(num_het_i, num_het_j)
    kin  = 0.5 + (2*num_both_het - 4*num_opposing_hom
                  - num_het_i - num_het_j) / (4*min_hets)
    ibs0 = num_opposing_hom
    ibs2 = num_concordant_hom + num_both_het
    ibs1 = num_shared_sites - ibs0 - ibs2

All counts are exact integers (int32 here, uint32 in the reference), so fp32
parity with the CUDA kernel is deterministic as long as the operation order is
preserved: the numerator folds left-to-right as
``((2f*bh - 4f*oh) - hi) - hj``, and the denominator is materialized as
``4f * min_hets`` before the division.  ``min_hets == 0`` produces IEEE
inf/NaN exactly like the reference (NaN fails the strict ``kin > threshold``
test; +inf passes it)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class KingCounts(NamedTuple):
    """The six per-pair counters accumulated over defined sites
    (cuking.cu:216-240)."""

    both_het: jnp.ndarray        # popcount(het_i & het_j & defined)
    het_i: jnp.ndarray           # popcount(het_i & defined)
    het_j: jnp.ndarray           # popcount(het_j & defined)
    opposing_hom: jnp.ndarray    # popcount(((ref_i&alt_j)|(alt_i&ref_j)) & defined)
    concordant_hom: jnp.ndarray  # popcount(((ref_i&ref_j)|(alt_i&alt_j)) & defined)
    shared_sites: jnp.ndarray    # popcount(defined)


class KingResult(NamedTuple):
    kin: jnp.ndarray   # float32
    ibs0: jnp.ndarray  # int32
    ibs1: jnp.ndarray  # int32
    ibs2: jnp.ndarray  # int32


def king_from_counts(counts: KingCounts) -> KingResult:
    """Counts → (kin, ibs0, ibs1, ibs2) with the reference's exact fp32
    op order (cuking.cu:289-307)."""
    bh = counts.both_het.astype(jnp.float32)
    hi = counts.het_i.astype(jnp.float32)
    hj = counts.het_j.astype(jnp.float32)
    oh = counts.opposing_hom.astype(jnp.float32)

    min_hets = jnp.minimum(hi, hj)
    # ((2*bh - 4*oh) - hi) - hj, left-associative like the C expression.
    numer = jnp.float32(2.0) * bh - jnp.float32(4.0) * oh - hi - hj
    denom = jnp.float32(4.0) * min_hets
    kin = jnp.float32(0.5) + numer / denom

    ibs0 = counts.opposing_hom
    ibs2 = counts.concordant_hom + counts.both_het
    ibs1 = counts.shared_sites - ibs0 - ibs2
    return KingResult(kin=kin, ibs0=ibs0, ibs1=ibs1, ibs2=ibs2)
