"""Hermetic golden-fixture parity (VERDICT r1 missing #4).

The committed fixture (tests/golden/) pins the full pipeline's output — kin
as exact uint32 fp32 bit patterns, IBS counts, row order — against an
independent scalar implementation of Hail's between-family KING estimator
(tools/make_golden.py; the same formula as hl.king and cuking.cu:286-307).
Unlike tests/test_hail_parity.py (live Hail, skipped where Hail is absent)
this runs everywhere."""

import json
import os
import struct

import numpy as np
import pyarrow.parquet as pq
import pytest

from cuking_tpu import cli
from cuking_tpu.io.uri import Storage

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def expected():
    with open(os.path.join(GOLDEN, "expected.json")) as f:
        return json.load(f)


def read_output_rows(output_uri):
    storage = Storage()
    rows = []
    for f in storage.list_parquet_files(output_uri):
        t = pq.read_table(f)
        for k in range(t.num_rows):
            kin = np.float32(t.column("kin")[k].as_py())
            rows.append(
                {
                    "i": t.column("i")[k].as_py(),
                    "j": t.column("j")[k].as_py(),
                    "kin_bits": struct.unpack("<I", struct.pack("<f", kin))[0],
                    "ibs0": t.column("ibs0")[k].as_py(),
                    "ibs1": t.column("ibs1")[k].as_py(),
                    "ibs2": t.column("ibs2")[k].as_py(),
                }
            )
    # Shard partitions are disjoint; global order is (i, j, kin) ascending.
    return sorted(rows, key=lambda r: (r["i"], r["j"]))


@pytest.mark.parametrize("kernel", ["matmul", "popcount"])
@pytest.mark.parametrize("rows_key,threshold", [
    ("rows_default_threshold", 0.0884),
    ("rows_keep_all", -2.0),
])
def test_cli_matches_golden(tmp_path, expected, kernel, rows_key, threshold):
    out = str(tmp_path / f"out-{kernel}-{rows_key}.parquet")
    rc = cli.main([
        "--input_uri", os.path.join(GOLDEN, "input.parquet"),
        "--output_uri", out,
        "--kernel", kernel,
        "--kin_threshold", str(threshold),
        "--quiet",
    ])
    assert rc == 0
    got = read_output_rows(out)
    exp = sorted(expected[rows_key], key=lambda r: (r["i"], r["j"]))
    assert got == exp  # bit-exact kin (uint32 patterns), exact IBS


def test_sharded_cli_matches_golden(tmp_path, expected):
    """split_factor=2 ⇒ 3 independent shards whose merged partitions equal
    the golden rows (README.md:94-102 merge property, pinned hermetically)."""
    out = str(tmp_path / "out-sharded.parquet")
    for shard in range(3):
        rc = cli.main([
            "--input_uri", os.path.join(GOLDEN, "input.parquet"),
            "--output_uri", out,
            "--kernel", "matmul",
            "--kin_threshold", "-2.0",
            "--split_factor", "2", "--shard_index", str(shard),
            "--quiet",
        ])
        assert rc == 0
    got = read_output_rows(out)
    exp = sorted(expected["rows_keep_all"], key=lambda r: (r["i"], r["j"]))
    assert got == exp


def test_golden_fixture_is_self_consistent(expected):
    """The fixture's dense matrix regenerates the expected rows — guards the
    committed files against accidental edits (provenance stays auditable)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.make_golden import expected_rows

    g = np.load(os.path.join(GOLDEN, "genotypes.npy"))
    assert expected_rows(g, -2.0) == expected["rows_keep_all"]
    assert expected_rows(g, 0.0884) == expected["rows_default_threshold"]
