"""Multi-chip all-pairs KING: shard_map ring panel exchange over the mesh.

The reference's only multi-device story is share-nothing process sharding via
GCS (SURVEY.md §2 parallelism table; cloud_batch_submit.py fans out
k(k+1)/2 independent GPU jobs).  The TPU-native design instead keeps the
whole cohort on one pod slice: sample bit-plane panels are sharded over the
mesh's sample axis, and a **ring exchange** (``lax.ppermute`` over ICI)
rotates the j-panels so that after D steps every device has compared its
resident i-panel against every panel.  Pair (i, j) with row-block a and
col-block b is computed exactly once globally: on device a at ring step
t = (a - b) mod D, filtered by the strict global ``i < j`` mask — the same
upper-triangle contract as the reference kernel (cuking.cu:199).

Thresholded hits are compacted into fixed per-device buffers (the SPMD
analogue of the reference's atomic result buffer, cuking.cu:296-313) with a
running cumulative-sum offset across ring steps; overflow is detected by
comparing each device's total against capacity.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuking_tpu.models.king import ResultSet
from cuking_tpu.ops.king_math import king_from_counts
from cuking_tpu.utils.status import ResourceExhaustedError

AXIS = "samples"


def default_capacity_per_device(max_results: int, num_devices: int) -> int:
    """Per-device hit-buffer size for a given global ``max_results``: 2× the
    even share (floored at 2¹⁴, capped at the global limit), so row-skewed
    hits — families are usually adjacent in sample order and land in one
    device's row block — don't overflow a device buffer while the GLOBAL
    count (the reference's --max_results semantic, cuking.cu:747-751) is
    still within budget."""
    return min(max_results, max(2 * (-(-max_results // num_devices)), 1 << 14))


class RingOutput(NamedTuple):
    """Per-device compacted results, concatenated on the host."""

    i_idx: jnp.ndarray  # [D * capacity] int32
    j_idx: jnp.ndarray
    kin: jnp.ndarray    # [D * capacity] float32
    ibs0: jnp.ndarray
    ibs1: jnp.ndarray
    ibs2: jnp.ndarray
    counts: jnp.ndarray  # [D] int32 per-device totals (may exceed capacity)


def _ring_fn(
    local_planes: jnp.ndarray,  # [2, nd, W] this device's sample panel
    threshold: jnp.ndarray,     # f32 scalar
    *,
    kernel: Callable,
    num_devices: int,
    num_samples: int,
    capacity: int,
):
    nd = local_planes.shape[1]
    me = lax.axis_index(AXIS)
    gi = me * nd + jnp.arange(nd, dtype=jnp.int32)  # my global row indices

    def body(carry, t):
        buf, out, running = carry
        owner = (me - t) % num_devices
        # t == 0 compares a device's own panel against itself — a diagonal
        # block of the global matrix, eligible for the kernel's
        # lower-triangle tile skip (king_pallas `tri`).
        counts = kernel(local_planes, buf, (t == 0).astype(jnp.int32))
        res = king_from_counts(counts)
        gj = owner * nd + jnp.arange(nd, dtype=jnp.int32)
        # Strict global upper triangle + padding validity + strict threshold.
        mask = (
            (gi[:, None] < gj[None, :])
            & (gi[:, None] < num_samples)
            & (gj[None, :] < num_samples)
            & (res.kin > threshold)
        )
        flat = mask.ravel()
        pos = running + jnp.cumsum(flat, dtype=jnp.int32) - 1
        pos = jnp.where(flat, pos, capacity)

        gi2 = jnp.broadcast_to(gi[:, None], mask.shape)
        gj2 = jnp.broadcast_to(gj[None, :], mask.shape)
        fields = (gi2, gj2, res.kin, res.ibs0, res.ibs1, res.ibs2)
        out = tuple(
            o.at[pos].set(f.ravel(), mode="drop") for o, f in zip(out, fields)
        )
        running = running + jnp.sum(flat, dtype=jnp.int32)
        # Rotate j-panels one hop around the ring (ICI neighbor exchange).
        buf = lax.ppermute(
            buf, AXIS,
            perm=[(d, (d + 1) % num_devices) for d in range(num_devices)],
        )
        return (buf, out, running), None

    out0 = (
        jnp.full((capacity,), -1, jnp.int32),
        jnp.full((capacity,), -1, jnp.int32),
        jnp.zeros((capacity,), jnp.float32),
        jnp.zeros((capacity,), jnp.int32),
        jnp.zeros((capacity,), jnp.int32),
        jnp.zeros((capacity,), jnp.int32),
    )
    (buf, out, running), _ = lax.scan(
        body, (local_planes, out0, jnp.int32(0)),
        jnp.arange(num_devices, dtype=jnp.int32),
    )
    return RingOutput(
        i_idx=out[0], j_idx=out[1], kin=out[2], ibs0=out[3], ibs1=out[4],
        ibs2=out[5], counts=running[None],
    )


def all_pairs_sharded(
    planes: np.ndarray | jnp.ndarray,  # [2, N_stored, W] host or device
    num_samples: int,
    mesh: Mesh,
    kernel: Callable,
    *,
    kin_threshold: float,
    capacity_per_device: int = 1 << 20,
    row_multiple: int = 1,
) -> RingOutput:
    """Runs the ring sweep over the mesh; returns per-device compacted hits.

    ``planes`` is padded (all-ones = missing) up to ``D * ceil(N/D)`` rows and
    placed sharded along the sample axis; padding self-masks via the
    ``num_samples`` validity check.  ``row_multiple`` additionally rounds the
    per-device row count up (e.g. to the Pallas tile size, which requires
    tile-divisible panels).
    """
    num_devices = mesh.devices.size
    n = planes.shape[1]
    # Row count must divide evenly across devices; planes may already carry
    # padding rows beyond num_samples (panel multiples), so pad from
    # whichever is larger.  Padding rows self-mask via the num_samples check.
    nd = -(-max(num_samples, n, 1) // num_devices)
    nd = -(-nd // row_multiple) * row_multiple
    n_pad = nd * num_devices
    if n < n_pad:
        pad = np.full((2, n_pad - n, planes.shape[2]), 0xFFFFFFFF, np.uint32)
        planes = np.concatenate([np.asarray(planes), pad], axis=1)
    sharding = NamedSharding(mesh, P(None, AXIS, None))
    planes_sharded = jax.device_put(np.asarray(planes), sharding)
    return all_pairs_presharded(
        planes_sharded, num_samples, mesh, kernel,
        kin_threshold=kin_threshold, capacity_per_device=capacity_per_device,
    )


def all_pairs_presharded(
    planes_sharded: jnp.ndarray,  # [2, D*nd, W] already sharded P(None, AXIS, None)
    num_samples: int,
    mesh: Mesh,
    kernel: Callable,
    *,
    kin_threshold: float,
    capacity_per_device: int = 1 << 20,
) -> RingOutput:
    """Ring sweep over an ALREADY sample-sharded global plane array.

    Multi-host entry point: each host builds only its devices' row blocks
    (cuking_tpu.parallel.distributed) instead of materializing the whole
    cohort's planes, then calls this.  Padding rows (global index ≥
    num_samples) must be all-ones (missing) — they self-mask.
    """
    num_devices = mesh.devices.size
    fn = jax.shard_map(
        partial(
            _ring_fn,
            kernel=kernel,
            num_devices=num_devices,
            num_samples=num_samples,
            capacity=capacity_per_device,
        ),
        mesh=mesh,
        in_specs=(P(None, AXIS, None), P()),
        out_specs=RingOutput(
            i_idx=P(AXIS), j_idx=P(AXIS), kin=P(AXIS), ibs0=P(AXIS),
            ibs1=P(AXIS), ibs2=P(AXIS), counts=P(AXIS),
        ),
        check_vma=False,
    )
    return jax.jit(fn)(planes_sharded, jnp.float32(kin_threshold))


def ring_output_local_resultset(
    out: RingOutput, capacity_per_device: int, max_results: int | None = None
) -> ResultSet:
    """Multi-host variant: extracts only THIS process's device buffers.

    Each host materializes just its addressable shards and writes them as its
    own output partition — preserving the reference's share-nothing,
    trivially-mergeable output property (README.md:102) across a pod slice.
    Overflow is checked per local device; remote devices are checked by their
    own host (every host raises independently, fail-fast like cuking.cu:
    747-751).
    """
    local_counts = {
        s.index[0].start or 0: int(np.asarray(s.data)[0])
        for s in out.counts.addressable_shards
    }
    if any(c > capacity_per_device for c in local_counts.values()):
        raise ResourceExhaustedError(
            "Could not store all results: try increasing the "
            "--max_results parameter."
        )
    if max_results is not None and sum(local_counts.values()) > max_results:
        raise ResourceExhaustedError(
            "Could not store all results: try increasing the "
            "--max_results parameter."
        )
    buffers = {}
    for name in ("i_idx", "j_idx", "kin", "ibs0", "ibs1", "ibs2"):
        for s in getattr(out, name).addressable_shards:
            start = s.index[0].start or 0
            buffers.setdefault(start // capacity_per_device, {})[name] = (
                np.asarray(s.data)
            )
    parts = []
    for d, count in sorted(local_counts.items()):
        if count == 0:
            continue
        bufs = buffers[d]
        parts.append(
            ResultSet(**{k: v[:count] for k, v in bufs.items()})
        )
    return ResultSet.concat_and_sort(parts)


def ring_output_to_resultset(
    out: RingOutput, capacity_per_device: int, max_results: int | None = None
) -> ResultSet:
    """Host-side gather of per-device buffers → sorted ResultSet; raises on
    overflow like cuking.cu:747-751.

    Two overflow conditions: a device exceeding its physical buffer, and —
    when ``max_results`` is given — the GLOBAL total exceeding it (the
    reference's semantic, which bounds only the global count)."""
    counts = np.asarray(out.counts)
    if (counts > capacity_per_device).any() or (
        max_results is not None and counts.sum() > max_results
    ):
        raise ResourceExhaustedError(
            "Could not store all results: try increasing the "
            "--max_results parameter."
        )
    parts = []
    for d, c in enumerate(counts):
        if c == 0:
            continue
        lo = d * capacity_per_device
        parts.append(
            ResultSet(
                i_idx=np.asarray(out.i_idx[lo : lo + c]),
                j_idx=np.asarray(out.j_idx[lo : lo + c]),
                kin=np.asarray(out.kin[lo : lo + c]),
                ibs0=np.asarray(out.ibs0[lo : lo + c]),
                ibs1=np.asarray(out.ibs1[lo : lo + c]),
                ibs2=np.asarray(out.ibs2[lo : lo + c]),
            )
        )
    return ResultSet.concat_and_sort(parts)
