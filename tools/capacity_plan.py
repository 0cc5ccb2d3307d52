#!/usr/bin/env python3
"""Pod-slice capacity plan for a gnomAD-scale all-pairs KING run.

BASELINE.json config 5 is "gnomAD-exomes-scale table (100k+ samples)
data-parallel across multi-host pod slice".  This machine has one tunneled
chip, so the literal run is hardware-blocked — this tool makes the plan
*checkable*: it drives the same HBM capacity model the CLI enforces at
runtime (cuking_tpu/utils/hbm.py — the TPU analogue of the reference's
40 GB A100 envelope + --split_factor relief, cuking.cu:513-517,
README.md:94-102) across a whole slice, picks the minimal split factor
whose worst shard fits every chip, and projects wall-clock from the
measured single-chip rate via the MXU roofline (docs/PERF.md).

    python tools/capacity_plan.py --samples 150000 --sites 1000000 \
        --chip v5e --devices 64

Prints a human-readable plan and one final JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from cuking_tpu.ops.bitset import PlaneLayout
from cuking_tpu.parallel.ring import default_capacity_per_device
from cuking_tpu.parallel.submatrix import num_shards
from cuking_tpu.utils.hbm import _USABLE_FRACTION, _worst_ring_shard_bytes

# Per-chip envelopes.  int8 TOPS are the public peak numbers; the measured
# MXU efficiency comes from this repo's bench on the v5e (BENCH_r03:
# ~197M pairs/s at 100k sites = ~0.92 of the 18-flops/site/pair roofline;
# 0.90 here leaves margin).  HBM sizes are the per-chip envelopes minus
# nothing — the model already applies its own usable fraction via the
# explicit bytes_limit we pass.
CHIPS = {
    "v5e": {"int8_tops": 394e12, "hbm_bytes": 16 << 30},
    "v5p": {"int8_tops": 918e12, "hbm_bytes": 95 << 30},
}
MEASURED_MXU_EFFICIENCY = 0.90
FLOPS_PER_SITE_PAIR = 18    # 2 × (3 indicator planes)² / 2… see king_mm.py
SCALING_EFFICIENCY = 0.85   # BASELINE.md multi-host target we hold ourselves to


def padded_words(num_sites: int) -> int:
    """The engine's actual padded word count (PlaneLayout default layout),
    not a re-derivation — so plan sizes track what will really allocate."""
    return PlaneLayout.create(num_sites).words


def pairs_per_sec_per_chip(chip: str, num_sites: int) -> float:
    """MXU-roofline rate at measured efficiency: the kernel is int8-matmul
    bound at 18 flops per (padded) site per pair (docs/PERF.md)."""
    sites_padded = padded_words(num_sites) * 32
    return (
        CHIPS[chip]["int8_tops"] * MEASURED_MXU_EFFICIENCY
        / (FLOPS_PER_SITE_PAIR * sites_padded)
    )


def minimal_split_factor(
    num_samples: int,
    words: int,
    num_devices: int,
    bytes_limit: int,
    *,
    panel: int = 1024,
    row_multiple: int = 256,
    max_results: int = 10 << 20,
) -> int | None:
    """Smallest --split_factor whose WORST shard's ring sweep fits on every
    chip of the slice (the same worst-shard model check_ring_fit prescribes
    from).  None when even maximal splitting cannot fit."""
    capacity = default_capacity_per_device(max_results, num_devices)

    def worst(k: int) -> int:
        return _worst_ring_shard_bytes(
            num_samples, k, words, panel, row_multiple, num_devices,
            capacity, max_results,
        )

    if worst(1) <= bytes_limit:
        return 1
    if worst(num_samples) > bytes_limit:
        return None
    lo, hi = 1, num_samples
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if worst(mid) > bytes_limit:
            lo = mid
        else:
            hi = mid
    return hi


def build_plan(
    num_samples: int,
    num_sites: int,
    chip: str,
    num_devices: int,
    *,
    panel: int = 1024,
    row_multiple: int = 256,
    max_results: int = 10 << 20,
) -> dict:
    words = padded_words(num_sites)
    limit = int(CHIPS[chip]["hbm_bytes"] * _USABLE_FRACTION)
    k = minimal_split_factor(
        num_samples, words, num_devices, limit,
        panel=panel, row_multiple=row_multiple, max_results=max_results,
    )
    plan: dict = {
        "samples": num_samples,
        "sites": num_sites,
        "chip": chip,
        "devices": num_devices,
        "words_per_plane": words,
        "total_plane_gib": round(2 * num_samples * words * 4 / 2**30, 2),
        "split_factor": k,
    }
    if k is None:
        plan["fits"] = False
        return plan

    capacity = default_capacity_per_device(max_results, num_devices)
    worst_b = _worst_ring_shard_bytes(
        num_samples, k, words, panel, row_multiple, num_devices,
        capacity, max_results,
    )
    rate_chip = pairs_per_sec_per_chip(chip, num_sites)
    rate_slice = rate_chip * num_devices * SCALING_EFFICIENCY
    total_pairs = num_samples * (num_samples - 1) // 2
    plan.update(
        fits=True,
        num_shards=num_shards(k),
        worst_shard_gib_per_chip=round(worst_b / 2**30, 2),
        chip_hbm_usable_gib=round(limit / 2**30, 2),
        pairs_total=total_pairs,
        pairs_per_sec_per_chip=round(rate_chip),
        pairs_per_sec_slice=round(rate_slice),
        est_compute_seconds=round(total_pairs / rate_slice, 1),
        assumptions={
            "mxu_efficiency_measured_v5e": MEASURED_MXU_EFFICIENCY,
            "scaling_efficiency_target": SCALING_EFFICIENCY,
            "flops_per_site_pair": FLOPS_PER_SITE_PAIR,
            "v5p_rate_is_extrapolated": chip == "v5p",
        },
    )
    return plan


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--samples", type=int, default=150_000,
                    help="cohort size (config 5 says 100k+)")
    ap.add_argument("--sites", type=int, default=1_000_000,
                    help="QC sites (gnomAD-scale ~1M)")
    ap.add_argument("--chip", choices=sorted(CHIPS), default="v5e")
    ap.add_argument("--devices", type=int, default=64,
                    help="chips in the slice (e.g. v5e-64)")
    ap.add_argument("--max-results", type=int, default=10 << 20)
    args = ap.parse_args(argv)

    plan = build_plan(
        args.samples, args.sites, args.chip, args.devices,
        max_results=args.max_results,
    )
    if not plan["fits"]:
        print(
            f"{args.samples} samples x {args.sites} sites does NOT fit a "
            f"{args.chip}-{args.devices} slice at any split factor; use a "
            "larger slice or chip.",
            file=sys.stderr,
        )
        print(json.dumps(plan))
        return 1

    print(
        f"Plan: {args.samples:,} samples x {args.sites:,} sites on "
        f"{args.chip}-{args.devices}\n"
        f"  bit planes total: {plan['total_plane_gib']} GiB "
        f"({plan['words_per_plane']} u32 words/plane/sample)\n"
        f"  split_factor {plan['split_factor']} -> "
        f"{plan['num_shards']} shard(s); worst shard "
        f"{plan['worst_shard_gib_per_chip']} GiB/chip of "
        f"{plan['chip_hbm_usable_gib']} GiB usable\n"
        f"  {plan['pairs_total']:,} pairs at "
        f"~{plan['pairs_per_sec_slice']:,} pairs/s on the slice "
        f"({plan['pairs_per_sec_per_chip']:,}/chip x {args.devices} x "
        f"{SCALING_EFFICIENCY} scaling)\n"
        f"  estimated kernel wall-clock: {plan['est_compute_seconds']} s "
        "(+ ingest/output, I/O-bound)",
        file=sys.stderr,
    )
    print(json.dumps(plan))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
