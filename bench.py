#!/usr/bin/env python3
"""Benchmark: sample-pairs/sec/chip at gnomAD-scale sites (BASELINE.json).

Runs the full KingEngine sweep (jitted panel steps: Pallas fused
unpack+int8-MXU kernel, fp32 epilogue, threshold, on-device compaction) on
one chip over synthetic packed planes at S=100k sites, and reports unique
pair throughput.

``vs_baseline``: ratio against the straightforward XLA popcount
implementation on the SAME chip (the direct translation of the reference's
per-pair popcount approach, cuking.cu:216-240) — the reference itself
publishes no numbers (BASELINE.md), so the baseline is the non-MXU path.

Prints exactly one JSON line on stdout; diagnostics go to stderr.

Time budget: the whole run must finish inside the driver's timeout (round 4
was killed at rc=124 with no JSON emitted — cold compiles through the
tunnel took ~4 min alone).  Three defenses, in order:
  1. a persistent compile cache (.jax_cache — verified to work through the
     axon TPU tunnel), so any second run on the same machine is warm;
  2. an internal deadline (BENCH_BUDGET_S, default 500 s): every section
     after the headline measurement is optional and is skipped — with its
     name recorded in diagnostics["skipped"] — when the remaining time
     cannot cover its cold-compile cost;
  3. a SIGTERM handler that prints the JSON assembled so far and exits,
     so even an external `timeout` leaves one valid line on stdout.
"""

import dataclasses
import json
import os
import signal
import sys
import time

import numpy as np

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "500"))


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - T_START)


def log(msg):
    print(f"[{time.monotonic() - T_START:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


# The JSON line under construction; sections fill it in as they complete so
# the SIGTERM handler (and the end-of-main print) always has a valid payload.
RESULT = {
    "metric": "sample-pairs/sec/chip @ 100000 sites (KING kinship+IBS)",
    "value": 0,
    "unit": "pairs/s",
    "vs_baseline": 0.0,
    "backend": "unknown",
    "diagnostics": {"skipped": []},
}
_PRINTED = [False]


def emit():
    if not _PRINTED[0]:
        _PRINTED[0] = True
        print(json.dumps(RESULT), flush=True)


def _on_term(signum, frame):
    RESULT["diagnostics"]["terminated_early"] = True
    emit()
    os._exit(0)


signal.signal(signal.SIGTERM, _on_term)


def _tpu_is_reachable(timeout_s: float = 180.0) -> bool:
    """Probe the TPU runtime in a killable subprocess.

    The tunneled TPU backend hangs indefinitely inside jax.devices() when
    the tunnel is down — an in-process call would wedge the whole bench.
    A subprocess probe can be SIGKILLed on timeout, letting the bench fall
    back to an honest CPU run (still one JSON line) instead of hanging."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.default_backend() == 'tpu'"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax

    if not _tpu_is_reachable():
        log("TPU runtime unreachable (tunnel down?); falling back to CPU "
            "— throughput below is NOT the chip number")
        # The site hook force-registers the TPU plugin and ignores the
        # JAX_PLATFORMS env var; the config update is the reliable switch.
        jax.config.update("jax_platforms", "cpu")

    try:  # persistent compile cache: repeated bench runs skip the slow compile
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from cuking_tpu.models.king import KingConfig, KingEngine, PanelStorage
    from cuking_tpu.ops.bitset import PlaneLayout
    from cuking_tpu.ops.king_jnp import panel_counts_popcount
    from cuking_tpu.parallel.submatrix import Submatrix

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"backend={backend} devices={jax.devices()}")
    RESULT["backend"] = backend
    diag = RESULT["diagnostics"]
    skipped = diag["skipped"]

    # 32k samples: closer to production cohort scale, and the benchmark is
    # fairer to the engine — the diagonal (triangle-skipped) panel fraction
    # halves vs 16k and the fixed per-dispatch host latency amortizes over
    # a 4x longer sweep (16k measures ~189M, 32k ~197M pairs/s on the same
    # code; per-step device time is identical).
    num_samples = 32768 if on_tpu else 192
    num_sites = 100_000 if on_tpu else 2_000
    panel = 1024 if on_tpu else 64
    kernel = "pallas" if on_tpu else "matmul"
    site_chunk = 128 if on_tpu else 16
    # The metric label reflects the ACTUAL measured regime (the CPU
    # fallback runs a 50× smaller site count — mislabeling it as 100k
    # would let a consumer compare it against the chip regime).
    RESULT["metric"] = (
        f"sample-pairs/sec/chip @ {num_sites} sites (KING kinship+IBS)"
        + ("" if on_tpu else " [CPU FALLBACK — not a chip number]")
    )

    # wm=64 layout (TPU): cuts site padding at 100k sites from 2.4% to
    # 0.35%; the Pallas paths cover the non-128-multiple W with the
    # prefix+remainder site-axis split — measured engine-level win on-chip,
    # 203.6 vs 200.2 M pairs/s (tools/engine_wm_ab.py).
    wm = 64 if on_tpu else site_chunk
    layout = PlaneLayout.create(num_sites, words_multiple=wm)
    submatrix = Submatrix.create(num_samples, 1, 0)
    # NOTE tile_i=512 under a raised scoped-VMEM limit measures +1.5%
    # kernel-only but 0% engine-level (tools/engine_tile512_ab.py) — the
    # tuned defaults here ARE the engine-level optimum (docs/PERF.md).
    config = KingConfig(
        kin_threshold=0.9,  # random data ⇒ ~no hits: measures pure compute
        panel=panel, kernel=kernel, site_chunk_words=site_chunk,
        sweep_batch=16,  # shorter scan: much faster first compile
    )
    storage = PanelStorage(layout, submatrix, panel)
    rng = np.random.default_rng(0)
    storage.planes[:] = rng.integers(
        0, 2**32, storage.planes.shape, dtype=np.uint32
    )
    engine = KingEngine(storage, config)

    # ---- headline: engine sweep at 100k sites (required) -------------------
    t0 = time.perf_counter()
    engine.run()  # warm-up: compiles the panel step
    warmup_s = time.perf_counter() - t0
    log(f"warm-up (incl. compile): {warmup_s:.1f}s")
    # Cold-compile sections scale their cost estimates off the warm-up: a
    # warm cache makes everything below cheap.
    cold = warmup_s > 30.0

    # Vary the threshold per run: the TPU runtime may cache identical
    # (executable, args) executions, which would fake the timing.  Per-run
    # times are kept and the MEDIAN is the headline: this host has one vCPU
    # with a documented 10× noisy neighbor, so a single average cannot be
    # told apart from host noise (VERDICT r2 weak #4).
    iters = 5
    sweep_runs = []
    for k in range(1, iters + 1):
        engine.config = dataclasses.replace(
            engine.config, kin_threshold=0.9 + 1e-4 * k
        )
        t0 = time.perf_counter()
        engine.run()
        sweep_runs.append(time.perf_counter() - t0)
    dt = float(np.median(sweep_runs))
    unique_pairs = num_samples * (num_samples - 1) / 2
    pairs_per_sec = unique_pairs / dt
    log(f"engine sweep: median {dt*1e3:.1f} ms over {iters} runs "
        f"(min {min(sweep_runs)*1e3:.1f} / max {max(sweep_runs)*1e3:.1f}) "
        f"for {unique_pairs:.0f} pairs @ {num_sites} sites")

    def ms(runs):
        return [round(r * 1e3, 1) for r in runs]

    RESULT["value"] = round(pairs_per_sec)
    diag["sweep_runs_ms"] = ms(sweep_runs)
    diag["sweep_ms_min_median_max"] = [
        round(min(sweep_runs) * 1e3, 1), round(dt * 1e3, 1),
        round(max(sweep_runs) * 1e3, 1)]
    diag["warmup_compile_s"] = round(warmup_s, 1)

    # ---- popcount baseline (required for vs_baseline) -----------------------
    # Scan-differencing: time a 1-step and a K-step in-device scan (distinct
    # panel slices per step, fetch-forced); the difference isolates pure
    # device time from runtime round-trip latency and result caching.
    from functools import partial as _partial
    from jax import lax

    trivial = jax.jit(lambda x: x + 1)
    _ = int(trivial(jnp.int32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = int(trivial(jnp.int32(0)))
    round_trip = (time.perf_counter() - t0) / 5

    words = layout.words
    planes_dev = engine.planes_dev

    @_partial(jax.jit, static_argnums=(1,))
    def pop_chain(planes, k_steps):
        def step(acc, k):
            pj = lax.dynamic_slice(
                planes, (0, k * panel, 0), (2, panel, words)
            )
            pi = lax.dynamic_slice(planes, (0, 0, 0), (2, panel, words))
            c = panel_counts_popcount(pi, pj, row_block=8)
            # Consume ALL six counters so XLA cannot dead-code-eliminate any
            # of the popcount work (a fair six-counter baseline).
            consumed = (
                c.both_het + c.het_i + c.het_j + c.opposing_hom
                + c.concordant_hom + c.shared_sites
            )
            return acc + consumed.sum(), None
        acc, _ = lax.scan(step, jnp.int32(0), jnp.arange(k_steps))
        return acc

    # 8→32-step differencing, like the kernel-only section below: the 1→8
    # form is RTT-noise-dominated (the baseline drifted 38–52 M pairs/s
    # across sessions on identical code, polluting vs_baseline).
    kb_lo, kb_hi = (8, 32) if on_tpu else (1, 4)
    _ = int(pop_chain(planes_dev, kb_lo))
    _ = int(pop_chain(planes_dev, kb_hi))
    t0 = time.perf_counter(); _ = int(pop_chain(planes_dev, kb_lo))
    t1 = time.perf_counter(); _ = int(pop_chain(planes_dev, kb_hi))
    t2 = time.perf_counter()
    base_dt = max((t2 - t1 - (t1 - t0)) / (kb_hi - kb_lo), 1e-9)
    base_pairs_per_sec = panel * panel / base_dt
    log(f"popcount baseline: {base_dt*1e3:.1f} ms/panel-pair "
        f"({base_pairs_per_sec/1e6:.2f} M pairs/s; round_trip={round_trip*1e3:.0f} ms)")
    RESULT["vs_baseline"] = round(pairs_per_sec / base_pairs_per_sec, 2)
    diag["popcount_baseline_pairs_per_sec"] = round(base_pairs_per_sec)

    # ---- optional sections, most-important first; each guarded by the
    # remaining budget (cold estimates through the tunnel) and try/except so
    # one failure cannot cost the JSON line.  Order: the 1M-site sweep IS
    # the BASELINE metric regime, so it runs before the cheaper
    # diagnostics — compile times through the remote-compile service vary
    # 20–200 s run-to-run (persistent cache hits included), and a
    # trailing 1M section was the one that got skipped. -------------------

    def section(name, cold_cost_s, warm_cost_s, fn):
        cost = cold_cost_s if cold else warm_cost_s
        if remaining() < cost:
            log(f"SKIP {name}: needs ~{cost:.0f}s, {remaining():.0f}s left")
            skipped.append(name)
            return
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — diagnostics must not kill the line
            log(f"FAIL {name}: {type(e).__name__}: {str(e).splitlines()[0][:200]}")
            skipped.append(name + ":failed")

    # (a) 1M-site configuration (gnomAD QC-site scale, BASELINE.json cfg 2).
    # 16k samples (4.1 GB of planes; v5e HBM holds 16 GB): production
    # cohorts at gnomAD scale are ≥32k samples, and the diagonal-panel
    # share — whose 256-wide tile triangle is the one structural waste the
    # kernel can't skip — falls as 2/(n_panels+1): 22% of panel pairs at 8k
    # samples vs 6% at 16k.  Dispatch structure measured irrelevant
    # (sweep_batch 16/36/64 identical; tools/engine_1m_ab.py).
    def sec_1m():
        num_samples_1m = 16384 if on_tpu else 96
        num_sites_1m = 1_000_000 if on_tpu else 10_000
        layout_1m = PlaneLayout.create(num_sites_1m, words_multiple=wm)
        storage_1m = PanelStorage(
            layout_1m, Submatrix.create(num_samples_1m, 1, 0), panel
        )
        # One random panel tiled across the cohort: MXU time is
        # content-independent and the 0.9 threshold suppresses the clone
        # pairs' kin=0.5 hits, so tiling is timing-equivalent to 4.1 GB of
        # fresh random bits at ~1/16th the host-side generation cost
        # (~25 s of 1-vCPU RNG was charged to this section's budget).
        reps = storage_1m.planes.shape[1] // panel
        storage_1m.planes[:] = np.tile(
            rng.integers(0, 2**32, (2, panel, layout_1m.words),
                         dtype=np.uint32),
            (1, reps, 1),
        )
        engine_1m = KingEngine(
            storage_1m,
            dataclasses.replace(config, kin_threshold=0.9),
        )
        engine_1m.run()  # warm-up
        runs_1m = []
        for k in range(1, 4):  # median-of-3: this is the BASELINE metric regime
            engine_1m.config = dataclasses.replace(
                engine_1m.config, kin_threshold=0.9 + 1e-4 * k
            )
            t0 = time.perf_counter()
            engine_1m.run()
            runs_1m.append(time.perf_counter() - t0)
        dt_1m = float(np.median(runs_1m))
        pairs_1m = num_samples_1m * (num_samples_1m - 1) / 2
        pairs_per_sec_1m = pairs_1m / dt_1m
        log(f"1M-site sweep: median {dt_1m*1e3:.1f} ms "
            f"({[round(r*1e3, 1) for r in runs_1m]}) for {pairs_1m:.0f} pairs "
            f"@ {num_sites_1m} sites -> {pairs_per_sec_1m/1e6:.0f} M pairs/s")
        diag["pairs_per_sec_1m_sites"] = round(pairs_per_sec_1m)
        diag["num_sites_1m"] = num_sites_1m
        diag["num_samples_1m"] = num_samples_1m

    section("sweep_1m_sites", 200, 100, sec_1m)

    # (b) hit-bearing sweep: clone rows into 8-sample "families" (kin = 0.5
    # between clones) so ~14k pairs cross the default 0.0884 threshold and
    # the cond-gated scatter + host fetch actually fire.  Cheap: reuses the
    # compiled sweep (same result-buffer capacity bucket).
    def sec_hitful():
        family, members = (512, 8) if on_tpu else (8, 4)
        for fam in range(family):
            src = fam * members
            for m in range(1, members):
                storage.planes[:, src + m, :] = storage.planes[:, src, :]
        storage.mark_mutated()
        n_hits_expected = family * members * (members - 1) // 2
        engine.config = dataclasses.replace(
            engine.config, kin_threshold=0.0884, max_results=10 << 20
        )
        rs = engine.run()  # warm-up (compiles the single result fetch)
        hitful_runs = []
        for k in range(1, iters + 1):
            engine.config = dataclasses.replace(
                engine.config, kin_threshold=0.0884 + 1e-5 * k
            )
            t0 = time.perf_counter()
            rs = engine.run()
            hitful_runs.append(time.perf_counter() - t0)
        hitful_dt = float(np.median(hitful_runs))
        hitful_pairs_per_sec = unique_pairs / hitful_dt
        log(f"hit-bearing sweep: median {hitful_dt*1e3:.1f} ms over {iters} "
            f"runs (min {min(hitful_runs)*1e3:.1f} / max {max(hitful_runs)*1e3:.1f}), "
            f"{len(rs)} hits (expected ~{n_hits_expected}) -> "
            f"{hitful_pairs_per_sec/1e6:.0f} M pairs/s")
        diag["pairs_per_sec_hitful_default_threshold"] = round(hitful_pairs_per_sec)
        diag["hitful_runs_ms"] = ms(hitful_runs)
        diag["hits_emitted"] = len(rs)

    section("hitful", 60, 25, sec_hitful)

    # (b) kernel-only rate (same scan-differencing): the count kernel with
    # all six counters consumed — the speed-of-light reference point the
    # engine number is judged against (docs/PERF.md SoL analysis).
    def sec_kernel_only():
        from cuking_tpu.models.king import _resolve_kernel as _rk

        fast_kernel = _rk(dataclasses.replace(config, indexed_panels=False))

        @_partial(jax.jit, static_argnums=(1,))
        def kernel_chain(planes, k_steps):
            def step(acc, k):
                pj = lax.dynamic_slice(
                    planes, (0, (k % 8) * panel, 0), (2, panel, words)
                )
                pi = lax.dynamic_slice(planes, (0, 0, 0), (2, panel, words))
                c = fast_kernel(pi, pj, jnp.int32(0))
                consumed = (
                    c.both_het.sum() + c.het_i.sum() + c.het_j.sum()
                    + c.opposing_hom.sum() + c.concordant_hom.sum()
                    + c.shared_sites.sum()
                )
                return acc + consumed, None
            acc, _ = lax.scan(step, jnp.int32(0), jnp.arange(k_steps))
            return acc

        # 8→32-step differencing: the 1→8 form is dominated by the ~30 ms
        # tunnel RTT noise on both endpoints and has reported fictitious
        # >SoL rates (278–375 M pairs/s in round 4); longer chains agree
        # with the engine and the xprof to ~1% (tools/chip_probe.py).
        k_lo, k_hi = (8, 32) if on_tpu else (1, 4)
        _ = int(kernel_chain(planes_dev, k_lo))
        _ = int(kernel_chain(planes_dev, k_hi))
        t0 = time.perf_counter(); _ = int(kernel_chain(planes_dev, k_lo))
        t1 = time.perf_counter(); _ = int(kernel_chain(planes_dev, k_hi))
        t2 = time.perf_counter()
        kern_dt = max((t2 - t1 - (t1 - t0)) / (k_hi - k_lo), 1e-9)
        kernel_pairs_per_sec = panel * panel / kern_dt
        log(f"kernel-only ({kernel}): {kern_dt*1e3:.2f} ms/panel-pair "
            f"({kernel_pairs_per_sec/1e6:.0f} M pairs/s)")
        diag["kernel_only_pairs_per_sec"] = round(kernel_pairs_per_sec)

    section("kernel_only", 90, 15, sec_kernel_only)

    # (c) ingest throughput (VERDICT r2 #8): synthetic COO → bit-plane
    # packing, the second-hottest loop (the cuking.cu:547-711 scatter
    # analogue).  Best-of-3 — host timings on this 1-vCPU box are noisy.
    # No TPU involved; cheap.
    def sec_ingest():
        from cuking_tpu.ops.bitset import allocate_planes, clear_bits_coo

        n_ing_samples, n_entries = (2048, 4_000_000) if on_tpu else (64, 100_000)
        ing_planes = allocate_planes(n_ing_samples, layout)
        rng2 = np.random.default_rng(1)
        ing_offs = rng2.integers(0, n_ing_samples, n_entries).astype(np.int64)
        ing_sites = rng2.integers(0, num_sites, n_entries).astype(np.int64)
        ing_nalt = rng2.integers(0, 3, n_entries).astype(np.int32)

        def ingest_rate(fn):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return n_entries / best

        ingest_numpy = ingest_rate(lambda: clear_bits_coo(
            ing_planes, layout, ing_offs, ing_sites, ing_nalt))
        try:
            from cuking_tpu.native import packer as native_packer

            native_ok = native_packer.available()
        except Exception:
            native_ok = False
        ingest_native = ingest_rate(lambda: native_packer.clear_bits(
            ing_planes, layout, ing_offs, ing_sites, ing_nalt)) if native_ok else 0
        log(f"ingest: native {ingest_native/1e6:.1f} M entries/s, "
            f"numpy {ingest_numpy/1e6:.1f} M entries/s ({n_entries} entries)")
        diag["ingest_entries_per_sec"] = round(max(ingest_native, ingest_numpy))
        diag["ingest_entries_per_sec_numpy"] = round(ingest_numpy)
        diag["ingest_entries_per_sec_native"] = round(ingest_native)

    section("ingest", 45, 45, sec_ingest)

    # (e) the mesh ring code path on this one chip (D=1: the sub-tiled
    # local-triangle phase over the whole cohort) — same pair work as the
    # engine sweep, so the ratio exposes any mesh-path-only overhead.
    def sec_ring():
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from cuking_tpu.models.king import _resolve_kernel
        from cuking_tpu.parallel.ring import all_pairs_presharded

        mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("samples",))
        ring_kernel = _resolve_kernel(config)
        # Shard once up front (planes already panel-padded); the timed region
        # then measures the sweep, not the host→device upload.
        planes_sharded = jax.device_put(
            storage.planes, NamedSharding(mesh, P(None, "samples", None))
        )
        ring_args = dict(
            kin_threshold=0.0884, capacity_per_device=1 << 20, sub_panel=panel,
            row_multiple=256 if on_tpu else 1,
        )
        out = all_pairs_presharded(
            planes_sharded, num_samples, mesh, ring_kernel, **ring_args
        )
        jax.block_until_ready(out.counts)  # warm-up
        t0 = time.perf_counter()
        out = all_pairs_presharded(
            planes_sharded, num_samples, mesh, ring_kernel,
            **{**ring_args, "kin_threshold": 0.08841},
        )
        jax.block_until_ready(out.counts)
        ring_dt = time.perf_counter() - t0
        ring_pairs_per_sec = unique_pairs / ring_dt
        log(f"ring path (1 device, sub-tiled triangle): {ring_dt*1e3:.1f} ms, "
            f"{int(np.asarray(out.counts)[0])} hits -> "
            f"{ring_pairs_per_sec/1e6:.0f} M pairs/s")
        diag["pairs_per_sec_ring_path_1dev"] = round(ring_pairs_per_sec)

    section("ring_path", 150, 25, sec_ring)

    emit()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
