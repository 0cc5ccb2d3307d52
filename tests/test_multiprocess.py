"""True multi-process --distributed coverage: two OS processes, a real
jax.distributed coordinator, cross-process ring collectives, host-sharded
ingest, per-process output partitions (tools/multiprocess_smoke.py).

Everything else in the suite runs the pod-slice code single-process ("all
devices local"); this is the one test where process_index() genuinely
differs between participants."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_cli():
    env = dict(os.environ)
    # The workers manage their own device counts / platform; scrub the
    # test-session forcing so subprocesses start clean.
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiprocess_smoke.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=570,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["multiprocess_smoke"] == "ok"
    assert result["processes"] == 2 and result["devices"] == 8
    assert result["partitions"] == [
        "part-00000.snappy.parquet", "part-00001.snappy.parquet"
    ]
    assert result["pairs"] > 0
