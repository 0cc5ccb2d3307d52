"""HBM capacity model: fail before an opaque XLA OOM, with a fix in hand.

The reference sizes its allocations against a known 40 GB A100 envelope and
prescribes ``--split_factor`` as the memory-relief mechanism
(cuking.cu:513-517; README.md:96-98).  The TPU engine's equivalent: compute
the device-resident footprint of a shard's sweep UP FRONT — bit planes plus
the bounded in-flight result buffers — compare it against the chip's HBM
limit, and when it doesn't fit, raise InvalidArgument naming the **minimal
split factor that does** instead of letting the whole-shard
``jnp.asarray`` upload die inside XLA.

The limit is queried from ``device.memory_stats()['bytes_limit']`` (real TPU
chips report it; CPU test devices don't — the check is skipped when the
platform can't say).  ``CUKING_HBM_BYTES_LIMIT`` overrides the query for
tests and for operators who want headroom for a colocated process.
"""

from __future__ import annotations

import os

from cuking_tpu.utils.status import InvalidArgumentError

# Fraction of the reported HBM actually usable by one process: XLA reserves
# program/runtime scratch, and the sweep needs transient epilogue buffers
# beyond what the static model counts.
_USABLE_FRACTION = 0.92


def device_bytes_limit(device=None) -> int | None:
    """Usable HBM bytes of the target device, or None when unknowable.

    Env override ``CUKING_HBM_BYTES_LIMIT`` (raw bytes) wins when set."""
    env = os.environ.get("CUKING_HBM_BYTES_LIMIT")
    if env:
        try:
            return int(env)
        except ValueError:
            raise InvalidArgumentError(
                f"CUKING_HBM_BYTES_LIMIT must be a raw byte count, got {env!r}"
            )
    if device is None:
        import jax

        devices = jax.devices()
        if not devices:
            return None
        device = devices[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats or "bytes_limit" not in stats:
        return None
    return int(stats["bytes_limit"] * _USABLE_FRACTION)


def _ceil_to(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def plane_bytes(num_stored_rows: int, words: int, panel: int = 1) -> int:
    """Device bytes for the [2, rows, W] uint32 bit planes, rows padded to a
    panel multiple per range (PanelStorage layout)."""
    return 2 * _ceil_to(max(num_stored_rows, 1), panel) * words * 4


def shard_plane_bytes(
    num_samples: int, split_factor: int, words: int, panel: int
) -> int:
    """Worst-shard plane footprint at a given split factor: an off-diagonal
    shard stores row range + column range, each a full-size block padded to a
    panel multiple (cuking.cu:158-175, 507-517)."""
    block = -(-num_samples // split_factor)
    if split_factor == 1:
        return plane_bytes(num_samples, words, panel)
    return plane_bytes(block, words, panel) + plane_bytes(block, words, panel)


def sweep_buffer_bytes(config) -> int:
    """Device bytes for the engine sweep's result accumulation: ONE
    device-resident six-field hit buffer carried across all batches
    (models/king.py, donated in place — there are no per-batch buffers any
    more) plus the double-buffered per-step counter/epilogue transients.
    Sized at max_results — the worst capacity the pow2-bucketed overflow
    retry can grow the buffer to — so an up-front pass guarantees the retry
    fits too."""
    per_slot = 6 * 4  # i/j idx i32, kin f32, ibs0/1/2 i32
    worst_capacity = max(config.resolved_result_capacity(), config.max_results)
    result_buffer = worst_capacity * per_slot
    transients = 2 * 7 * config.panel * config.panel * 4
    return result_buffer + transients


def engine_plane_bytes(submatrix, words: int, panel: int) -> int:
    """Exact plane footprint of one shard's PanelStorage: the i-range and
    (off-diagonal) j-range are each padded to a panel multiple separately."""
    b = plane_bytes(submatrix.num_rows, words, panel)
    if not submatrix.is_diagonal:
        b += plane_bytes(submatrix.num_cols, words, panel)
    return b


def check_engine_fit(
    num_samples: int,
    words: int,
    submatrix,
    config,
    split_factor: int,
    bytes_limit: int | None = None,
) -> None:
    """Raises InvalidArgument naming the minimal --split_factor that fits
    when this shard's sweep footprint exceeds the device's HBM.

    No-op when the limit is unknowable (CPU test devices)."""
    limit = device_bytes_limit() if bytes_limit is None else bytes_limit
    if limit is None:
        return
    planes_b = engine_plane_bytes(submatrix, words, config.panel)
    need = planes_b + sweep_buffer_bytes(config)
    if need <= limit:
        return
    k = split_factor + 1
    while k < num_samples and (
        shard_plane_bytes(num_samples, k, words, config.panel)
        + sweep_buffer_bytes(config)
        > limit
    ):
        k += 1
    raise InvalidArgumentError(
        f"Shard needs {need >> 20} MiB of device memory "
        f"({planes_b >> 20} MiB bit planes + "
        f"{sweep_buffer_bytes(config) >> 20} MiB sweep buffers) but only "
        f"{limit >> 20} MiB is available; increase --split_factor to at "
        f"least {k}."
    )


def check_ring_fit(
    num_samples: int,
    words: int,
    rows_per_device: int,
    capacity_per_device: int,
    num_devices: int,
    bytes_limit: int | None = None,
) -> None:
    """Mesh-path capacity check: each device holds its resident panel, the
    rotating visitor buffer (double-buffered by the overlapped ppermute), and
    its hit buffers; per-step compute intermediates are bounded by the
    sub-panel tiling (parallel/ring._ring_fn) and covered by the usable-HBM
    margin.  --split_factor can't relieve the mesh path (it requires
    split_factor=1); the fix is a bigger slice or the sharded engine path."""
    limit = device_bytes_limit() if bytes_limit is None else bytes_limit
    if limit is None:
        return
    panel_b = 2 * rows_per_device * words * 4
    hits_b = 6 * 4 * capacity_per_device
    need = 3 * panel_b + hits_b  # resident + visiting + next (in-flight permute)
    if need <= limit:
        return
    raise InvalidArgumentError(
        f"Each of the {num_devices} mesh devices needs {need >> 20} MiB "
        f"({rows_per_device} sample rows x {words} words, x3 ring buffers, "
        f"plus {hits_b >> 20} MiB hit buffers) but only {limit >> 20} MiB is "
        "available; run on a larger slice, or drop --use_mesh and shard with "
        "--split_factor instead."
    )
