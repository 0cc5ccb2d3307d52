"""tools/capacity_plan.py: the pod-slice planner must agree with the
runtime HBM model (utils/hbm.py) it is derived from."""

from __future__ import annotations

import importlib
import json

import pytest

from cuking_tpu.parallel.ring import default_capacity_per_device
from cuking_tpu.utils.hbm import _worst_ring_shard_bytes

cp = importlib.import_module("tools.capacity_plan")


def test_plan_fits_at_scale():
    plan = cp.build_plan(150_000, 1_000_000, "v5e", 64)
    assert plan["fits"] and plan["split_factor"] == 1
    assert plan["worst_shard_gib_per_chip"] < plan["chip_hbm_usable_gib"]
    assert plan["pairs_total"] == 150_000 * 149_999 // 2


def test_minimal_split_factor_is_minimal_and_sufficient():
    """The prescribed k fits the worst shard; k-1 must not."""
    samples, words, devices = 200_000, 31360, 4
    limit = 2 << 30  # artificially tight: forces k > 1
    k = cp.minimal_split_factor(samples, words, devices, limit)
    assert k is not None and k > 1
    capacity = default_capacity_per_device(10 << 20, devices)
    assert _worst_ring_shard_bytes(
        samples, k, words, 1024, 256, devices, capacity, 10 << 20
    ) <= limit
    assert _worst_ring_shard_bytes(
        samples, k - 1, words, 1024, 256, devices, capacity, 10 << 20
    ) > limit


def test_plan_reports_unfittable():
    # Hit buffers alone exceed a 1 MiB "chip": no split factor can help.
    plan = cp.build_plan(100_000, 1_000_000, "v5e", 2)
    assert plan["fits"]
    k = cp.minimal_split_factor(100_000, 31360, 2, 1 << 20)
    assert k is None


def test_rate_model_matches_measured_regimes():
    """The roofline rate at 0.90 efficiency must bracket the measured bench
    numbers (docs/PERF.md: ~197M at 100k sites, ~19M at 1M sites)."""
    r100k = cp.pairs_per_sec_per_chip("v5e", 100_000)
    r1m = cp.pairs_per_sec_per_chip("v5e", 1_000_000)
    assert 170e6 < r100k < 220e6
    assert 17e6 < r1m < 23e6


def test_cli_emits_json_line(capsys):
    rc = cp.main(["--samples", "120000", "--devices", "16"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    plan = json.loads(line)
    assert plan["devices"] == 16 and plan["fits"]


def test_cli_unfittable_exit_code(capsys, monkeypatch):
    monkeypatch.setitem(
        cp.CHIPS, "v5e", {"int8_tops": 394e12, "hbm_bytes": 64 << 20}
    )
    rc = cp.main(["--samples", "500000", "--devices", "2"])
    assert rc == 1
    plan = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert plan["fits"] is False
