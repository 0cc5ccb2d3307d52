"""KingEngine — the flagship model: all-pairs KING over packed planes.

This is the TPU-native equivalent of the reference's host pipeline + kernel
launch (cuking.cu:435-751), redesigned for XLA's compilation model:

* The pair matrix is swept in fixed-size **sample panels** (default 1024).
  One jitted panel-pair step — dynamic-slice panels out of HBM, run a count
  kernel, apply the fp32 epilogue, threshold, compact — is compiled ONCE and
  replayed over every (i-panel, j-panel) with i ≤ j.  Static shapes
  throughout; no data-dependent control flow inside jit.
* Within a panel pair, the count kernel is selectable: ``popcount`` (VPU
  semantics baseline), ``matmul`` (XLA int8 MXU), or ``pallas`` (fused
  unpack+matmul TPU kernel, the fast path).
* Sample storage follows the reference's shard layout: the Submatrix i-range
  stored before the j-range (cuking.cu:171-175), each padded to a panel
  multiple with all-missing samples (padding self-masks: zero counters, NaN
  kin, masked by validity anyway).
* Results: each step emits ≤ panel² hits compacted on device; the host
  accumulates, enforces ``max_results`` globally (ResourceExhausted on
  overflow, cuking.cu:747-751), and finally sorts by (i, j, kin)
  (cuking.cu:761-765).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass
from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from cuking_tpu.ops import bitset
from cuking_tpu.ops.bitset import PlaneLayout
from cuking_tpu.ops.compaction import scatter_hits
from cuking_tpu.ops.king_jnp import panel_counts_popcount
from cuking_tpu.ops.king_math import king_from_counts
from cuking_tpu.ops.king_mm import panel_counts_matmul
from cuking_tpu.parallel.submatrix import Submatrix
from cuking_tpu.utils.status import InvalidArgumentError, ResourceExhaustedError
from cuking_tpu.utils.stopwatch import StageLogger

DEFAULT_KIN_THRESHOLD = 0.0884  # 2nd degree or closer (cuking.cu:43-45)
DEFAULT_MAX_RESULTS = 10 << 20  # cuking.cu:40-41


def _ceil_div(a: int, b: int) -> int:
    return (a + b - 1) // b


def _ceil_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


@dataclass(frozen=True)
class KingConfig:
    """Runtime knobs; defaults mirror the reference's flags (cuking.cu:27-52)."""

    kin_threshold: float = DEFAULT_KIN_THRESHOLD
    max_results: int = DEFAULT_MAX_RESULTS
    panel: int = 1024               # samples per panel (pair tile edge)
    kernel: str = "auto"            # auto | popcount | matmul | pallas
    site_chunk_words: int = 128     # uint32 words per site-chunk in mm/pallas
    popcount_row_block: int = 8     # i-rows per popcount map step
    sweep_batch: int = 64           # panel-pair steps fused into one dispatch
    verbose: bool = False


@dataclass
class ResultSet:
    """Thresholded pairs, globally indexed, sorted by (i, j, kin)."""

    i_idx: np.ndarray   # int32 global sample indices
    j_idx: np.ndarray
    kin: np.ndarray     # float32
    ibs0: np.ndarray    # int32
    ibs1: np.ndarray
    ibs2: np.ndarray

    def __len__(self) -> int:
        return len(self.i_idx)

    @classmethod
    def concat_and_sort(cls, parts: list["ResultSet"]) -> "ResultSet":
        if not parts:
            z = np.zeros(0, np.int32)
            return cls(z, z, np.zeros(0, np.float32), z.copy(), z.copy(), z.copy())
        fields = {
            name: np.concatenate([getattr(p, name) for p in parts])
            for name in ("i_idx", "j_idx", "kin", "ibs0", "ibs1", "ibs2")
        }
        # Sort by (i, j, kin) ascending, like cuking.cu:761-765.
        order = np.lexsort((fields["kin"], fields["j_idx"], fields["i_idx"]))
        return cls(**{k: v[order] for k, v in fields.items()})


@partial(jax.jit, static_argnums=(2,))
def _gather_hits(bufs, rows, n):
    """Gathers hit-step buffers [6][batch, cap] at ``rows`` into one stacked
    [6, len(rows), n] int32 array (kin bitcast) so the host pays a single
    device→host transfer per batch instead of six per hit step."""
    return jnp.stack(
        [
            bufs[0][rows, :n],
            bufs[1][rows, :n],
            lax.bitcast_convert_type(bufs[2][rows, :n], jnp.int32),
            bufs[3][rows, :n],
            bufs[4][rows, :n],
            bufs[5][rows, :n],
        ]
    )


def resolve_kernel_name(config: KingConfig) -> str:
    """'auto' → the fast path for the current backend."""
    if config.kernel == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "matmul"
    return config.kernel


def _resolve_kernel(config: KingConfig) -> Callable:
    name = resolve_kernel_name(config)
    if name == "popcount":
        return partial(panel_counts_popcount, row_block=config.popcount_row_block)
    if name == "matmul":
        return partial(panel_counts_matmul, site_chunk_words=config.site_chunk_words)
    if name == "pallas":
        from cuking_tpu.ops.king_pallas import panel_counts_pallas

        return partial(
            panel_counts_pallas, site_chunk_words=config.site_chunk_words
        )
    raise InvalidArgumentError(f"Unknown kernel: {config.kernel}")


class PanelStorage:
    """Padded on-host plane storage in the reference's shard layout.

    The Submatrix i-range is stored first, then (for off-diagonal shards) the
    j-range (cuking.cu:171-175); each section is padded up to a panel multiple
    with all-missing samples so every jitted panel slice has identical shape.
    """

    def __init__(self, layout: PlaneLayout, submatrix: Submatrix, panel: int):
        self.layout = layout
        self.submatrix = submatrix
        self.panel = panel
        # Bumped by mutators (ingest); lets device-side caches detect stale
        # uploads instead of silently computing on pre-ingest planes.
        self.version = 0
        self.nr = submatrix.num_rows
        self.nc = submatrix.num_cols
        self.nr_pad = max(_ceil_div(self.nr, panel), 1) * panel
        if submatrix.is_diagonal:
            self.nc_pad = self.nr_pad
            self.j_store_base = 0
            total = self.nr_pad
        else:
            self.nc_pad = max(_ceil_div(self.nc, panel), 1) * panel
            self.j_store_base = self.nr_pad
            total = self.nr_pad + self.nc_pad
        self.planes = bitset.allocate_planes(total, layout)

    def mark_mutated(self) -> None:
        """Callers that write into ``planes`` (ingest) record it here so the
        engine re-uploads instead of sweeping a stale device copy."""
        self.version += 1

    def contains(self, global_idx: np.ndarray) -> np.ndarray:
        """True for samples stored in this shard (cuking.cu:675-678); the
        ingest-facing surface shared with HostShardedStorage."""
        return self.submatrix.contains(global_idx)

    def storage_offsets(self, global_idx: np.ndarray) -> np.ndarray:
        """Global sample index → padded storage row; callers must only pass
        indices with ``contains(idx)`` true (cf. cuking.cu:675-678).

        Branch-free arithmetic rather than np.where — at gnomAD ingest scale
        this runs over ~10⁷-element index arrays per Parquet file, and
        np.where is an order of magnitude slower than a fused mask-multiply
        on some hosts."""
        sm = self.submatrix
        global_idx = np.asarray(global_idx)
        in_j = (global_idx >= sm.i_end).astype(global_idx.dtype)
        return (
            global_idx
            - sm.i_begin
            + in_j * (self.j_store_base - sm.j_begin + sm.i_begin)
        )

    @property
    def num_i_panels(self) -> int:
        return self.nr_pad // self.panel

    @property
    def num_j_panels(self) -> int:
        return self.nc_pad // self.panel

    def i_panel(self, k: int) -> tuple[int, int, int]:
        """→ (storage offset, global base index, valid sample count)."""
        off = k * self.panel
        return off, self.submatrix.i_begin + off, max(0, min(self.panel, self.nr - off))

    def j_panel(self, k: int) -> tuple[int, int, int]:
        off = k * self.panel
        return (
            self.j_store_base + off,
            self.submatrix.j_begin + off,
            max(0, min(self.panel, self.nc - off)),
        )


class KingEngine:
    """Single-process KING driver for one shard (whole matrix if
    split_factor=1)."""

    def __init__(
        self,
        storage: PanelStorage,
        config: KingConfig | None = None,
        logger: StageLogger | None = None,
    ):
        self.config = config or KingConfig()
        self.storage = storage
        self.logger = logger or StageLogger(enabled=self.config.verbose)
        self._kernel = _resolve_kernel(self.config)
        self._sweep = self._build_sweep()
        self._planes_dev_cache = None
        self._planes_dev_version = None

    @property
    def planes_dev(self) -> jnp.ndarray:
        """Device-resident planes; uploaded once per storage version
        (host→device transfers of the full bitset are expensive and the
        planes are immutable during a sweep).  Mutators that go through
        ``storage.mark_mutated()`` — ingest does — invalidate the cache
        automatically; direct writes to ``storage.planes`` need an explicit
        ``refresh_planes()``."""
        version = getattr(self.storage, "version", None)
        if self._planes_dev_cache is None or self._planes_dev_version != version:
            self._planes_dev_cache = jnp.asarray(self.storage.planes)
            self._planes_dev_version = version
        return self._planes_dev_cache

    def refresh_planes(self) -> None:
        self._planes_dev_cache = None

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_genotypes(
        cls,
        genotypes: np.ndarray,
        config: KingConfig | None = None,
        submatrix: Submatrix | None = None,
        words_multiple: int | None = None,
    ) -> "KingEngine":
        """Test/synthetic convenience: dense [N, S] genotypes → engine."""
        config = config or KingConfig()
        n, s = genotypes.shape
        submatrix = submatrix or Submatrix.create(n, 1, 0)
        wm = words_multiple or min(bitset.DEFAULT_WORDS_MULTIPLE,
                                   max(16, config.site_chunk_words))
        layout = PlaneLayout.create(s, words_multiple=wm)
        storage = PanelStorage(layout, submatrix, config.panel)
        stored = submatrix.stored_sample_indices()
        offsets = storage.storage_offsets(stored)
        storage.planes[:, offsets, :] = bitset.pack_genotypes(
            genotypes[stored], layout
        )
        return cls(storage, config)

    # -- the jitted batched sweep -------------------------------------------
    #
    # All panel-pair steps of one dispatch are fused into a lax.scan over a
    # device-resident parameter array, so the host pays ONE dispatch + ONE
    # fetch per batch instead of per step (host↔device latency through a TPU
    # runtime is tens of ms; per-step syncs would dominate the ~6 ms kernel).
    # Each step emits a small fixed-capacity hit buffer as a scan output;
    # compaction is cond-gated so panels with zero hits (the overwhelming
    # majority under a sane threshold) skip the scatter and only copy the
    # small zero buffer.  A step whose hits overflow the per-step capacity is
    # re-run through the exact fallback (capacity = panel², no loss) — the
    # per-step totals are always exact, so overflow handling is exact too.

    def _pair_compute(self, planes, row):
        """Shared per-step compute: slice panels → counts → epilogue → mask."""
        panel = self.config.panel
        words = self.storage.layout.words
        i_off, j_off, gi_base, gj_base, ni_valid, nj_valid = (
            row[0], row[1], row[2], row[3], row[4], row[5]
        )
        pi = lax.dynamic_slice(planes, (0, i_off, 0), (2, panel, words))
        pj = lax.dynamic_slice(planes, (0, j_off, 0), (2, panel, words))
        # Diagonal panel pairs (same global base) let the Pallas kernel skip
        # lower-triangle tiles; the i<j mask below discards them regardless.
        tri = (gi_base == gj_base).astype(jnp.int32)
        res = king_from_counts(self._kernel(pi, pj, tri))

        local = jnp.arange(panel, dtype=jnp.int32)
        gi = gi_base + local
        gj = gj_base + local
        valid = (local < ni_valid)[:, None] & (local < nj_valid)[None, :]
        # Strict upper triangle on GLOBAL indices (cuking.cu:199) and strict
        # > threshold (cuking.cu:297); NaN kin never passes.
        mask = valid & (gi[:, None] < gj[None, :]) & (
            res.kin > self._threshold_ref[0]
        )
        gi2 = jnp.broadcast_to(gi[:, None], mask.shape)
        gj2 = jnp.broadcast_to(gj[None, :], mask.shape)
        return mask, (gi2, gj2, res.kin, res.ibs0, res.ibs1, res.ibs2)

    def _build_sweep(self):
        panel = self.config.panel
        cap_step = int(min(panel * panel, 1 << 14))

        def empty(_):
            return (
                jnp.full((cap_step,), -1, jnp.int32),
                jnp.full((cap_step,), -1, jnp.int32),
                jnp.zeros((cap_step,), jnp.float32),
                jnp.zeros((cap_step,), jnp.int32),
                jnp.zeros((cap_step,), jnp.int32),
                jnp.zeros((cap_step,), jnp.int32),
            )

        def body(running, row):
            def compute(_):
                planes = self._planes_dev_ref[0]
                mask, fields = self._pair_compute(planes, row)
                total = jnp.sum(mask, dtype=jnp.int32)

                def compact(_):
                    return scatter_hits(mask, fields, cap_step)

                return total, lax.cond(total > 0, compact, empty, None)

            def skip(_):  # padding rows (ni_valid == 0): no kernel launch
                return jnp.int32(0), empty(None)

            total, bufs = lax.cond(row[4] > 0, compute, skip, None)
            return running + total, (total, bufs)

        def sweep(planes, params, threshold):
            # Closure cells thread loop-invariant operands into the scan body
            # without widening the carry.
            self._planes_dev_ref[0] = planes
            self._threshold_ref[0] = threshold
            running, (totals, bufs) = lax.scan(body, jnp.int32(0), params)
            return running, totals, bufs

        def exact_step(planes, row, threshold):
            """Fallback for a step with > cap_step hits: full capacity."""
            self._planes_dev_ref[0] = planes
            self._threshold_ref[0] = threshold
            mask, fields = self._pair_compute(planes, row)
            return scatter_hits(mask, fields, panel * panel)

        self._planes_dev_ref = [None]
        self._threshold_ref = [None]
        return jax.jit(sweep), jax.jit(exact_step), cap_step

    def _panel_pair_params(self) -> np.ndarray:
        """[num_steps, 6] int32 schedule: (i_off, j_off, gi_base, gj_base,
        ni_valid, nj_valid) for every (i-panel, j-panel) pair with any
        candidate i<j, mirroring the shard's pair set (cuking.cu:196-201)."""
        st = self.storage
        diagonal = st.submatrix.is_diagonal
        rows = []
        for ip in range(st.num_i_panels):
            i_off, gi_base, ni_valid = st.i_panel(ip)
            if ni_valid == 0:
                continue
            jp_start = ip if diagonal else 0
            for jp in range(jp_start, st.num_j_panels):
                j_off, gj_base, nj_valid = st.j_panel(jp)
                if nj_valid == 0:
                    continue
                rows.append((i_off, j_off, gi_base, gj_base, ni_valid, nj_valid))
        return np.asarray(rows, dtype=np.int32).reshape(-1, 6)

    # -- driver --------------------------------------------------------------

    def run(self) -> ResultSet:
        """Sweeps all (i-panel, j-panel) pairs of the shard and returns the
        thresholded, sorted results."""
        cfg = self.config
        st = self.storage
        planes_dev = self.planes_dev
        threshold = jnp.float32(cfg.kin_threshold)
        sweep, exact_step, cap_step = self._sweep

        params = self._panel_pair_params()
        num_steps = len(params)
        batch = cfg.sweep_batch
        parts: list[ResultSet] = []
        total = 0
        self.logger.begin(
            f"Running KING kernel for {st.nr} x {st.nc} matrix"
            f" ({num_steps} panel-pair steps)..."
        )

        def fetch(bufs, count):
            """Single-buffer fetch (exact-fallback path only)."""
            n = min(_ceil_pow2(count), bufs[0].shape[-1])
            return ResultSet(
                i_idx=np.asarray(bufs[0][:n][:count]),
                j_idx=np.asarray(bufs[1][:n][:count]),
                kin=np.asarray(bufs[2][:n][:count]),
                ibs0=np.asarray(bufs[3][:n][:count]),
                ibs1=np.asarray(bufs[4][:n][:count]),
                ibs2=np.asarray(bufs[5][:n][:count]),
            )

        def consume(entry) -> None:
            nonlocal total
            chunk_dev, (running, totals, bufs) = entry
            count = int(running)
            if count == 0:
                return
            total += count
            if total > cfg.max_results:
                # Enforced as soon as the running total crosses the cap —
                # the sweep stops dispatching and host accumulation stays
                # bounded, rather than buffering every hit first (the
                # reference's preallocated buffer caps memory by
                # construction, cuking.cu:713-718, 747-751).
                raise ResourceExhaustedError(
                    "Could not store all results: try increasing the "
                    "--max_results parameter."
                )
            per_step = np.asarray(totals)
            hit_rows = np.nonzero(per_step)[0]
            fast = hit_rows[per_step[hit_rows] <= cap_step]
            if len(fast):
                # One device gather + ONE host transfer for every hit step in
                # the batch: six per-field fetches per step would cost a
                # host↔device round-trip each (~25 ms through a TPU runtime —
                # they dominated hit-bearing sweeps before this batching).
                # The copy is started asynchronously and materialized after
                # the sweep loop, so it overlaps later batches' compute.
                n = min(_ceil_pow2(int(per_step[fast].max())), cap_step)
                k_pad = _ceil_pow2(len(fast))
                rows = np.full(k_pad, fast[0], np.int32)
                rows[: len(fast)] = fast
                arr_dev = _gather_hits(bufs, jnp.asarray(rows), n)
                try:
                    arr_dev.copy_to_host_async()
                except Exception:
                    pass
                deferred.append((arr_dev, fast, per_step))
                # Bound the deferral window: each gathered array is up to
                # ~25 MiB of HBM, and a hit-dense shard can have hundreds of
                # hit batches — unbounded deferral would re-create the
                # memory blowup the dispatch window exists to prevent.
                if len(deferred) > 8:
                    materialize(*deferred.pop(0))
            for k in hit_rows[per_step[hit_rows] > cap_step]:
                # Rare: this step alone exceeded the fast-path buffer —
                # recompute it at full panel² capacity (exact).
                full = exact_step(planes_dev, chunk_dev[int(k)], threshold)
                parts.append(fetch(full, int(per_step[k])))

        def materialize(arr_dev, fast, per_step) -> None:
            arr = np.asarray(arr_dev)
            for idx, k in enumerate(fast):
                c = int(per_step[k])
                parts.append(
                    ResultSet(
                        i_idx=arr[0, idx, :c],
                        j_idx=arr[1, idx, :c],
                        kin=arr[2, idx, :c].view(np.float32),
                        ibs0=arr[3, idx, :c],
                        ibs1=arr[4, idx, :c],
                        ibs2=arr[5, idx, :c],
                    )
                )

        # Dispatch batches asynchronously so host↔device round-trips don't
        # serialize the device work, but bound the in-flight window: each
        # batch's scan outputs hold six [batch, cap_step] device buffers
        # (~25 MiB at defaults), and a large shard has thousands of batches —
        # unbounded dispatch would accumulate all of them in HBM alongside
        # the planes.
        window = 4
        pending: deque = deque()
        deferred: list = []
        for lo in range(0, num_steps, batch):
            chunk = params[lo : lo + batch]
            if len(chunk) < batch:
                # Pad with no-op rows (zero valid samples → skipped on device).
                pad = np.zeros((batch - len(chunk), 6), np.int32)
                chunk = np.concatenate([chunk, pad], axis=0)
            chunk_dev = jnp.asarray(chunk)
            pending.append((chunk_dev, sweep(planes_dev, chunk_dev, threshold)))
            if len(pending) >= window:
                consume(pending.popleft())
        while pending:
            consume(pending.popleft())
        for entry in deferred:
            materialize(*entry)
        self.logger.end("king_kernel")

        self.logger.print(f"Processing {total} results...")
        return ResultSet.concat_and_sort(parts)
