#!/usr/bin/env python3
"""True multi-process smoke for the --distributed path.

Round 1 validated the pod-slice code only in a single process ("all devices
local").  This launches TWO OS processes, each owning 4 virtual CPU devices,
connected through jax.distributed over localhost — the real coordinator
handshake, the real cross-process collectives (ppermute ring, allgather for
skip/overflow decisions), real host-sharded ingest (each process packs only
its devices' row blocks), and one output partition per process — then merges
the partitions and checks them bit-exactly against the numpy oracle.

Usage (from the repo root): ``python tools/multiprocess_smoke.py``
The parent re-execs itself with ``--worker <pid>`` for each process.
"""

import json
import os
import struct
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 4
NUM_SAMPLES, NUM_SITES = 54, 400
THRESHOLD = 0.05


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def worker(process_id: int, workdir: str, port: int) -> int:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Explicit initialization, like an embedder (or a hand-rolled pod) would
    # do; cli.py --distributed detects the already-initialized runtime.  On
    # real TPU pod slices initialize() autodetects from TPU metadata instead.
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=NUM_PROCESSES,
        process_id=process_id,
    )

    from cuking_tpu import cli

    rc = cli.main([
        "--input_uri", os.path.join(workdir, "in.parquet"),
        "--output_uri", os.path.join(workdir, "out.parquet"),
        "--kin_threshold", str(THRESHOLD),
        "--kernel", "matmul", "--panel", "8",
        "--distributed", "--quiet",
    ])
    assert jax.process_count() == NUM_PROCESSES, jax.process_count()
    assert jax.device_count() == NUM_PROCESSES * DEVICES_PER_PROCESS
    return rc


def main() -> int:
    if "--worker" in sys.argv:
        pid = int(sys.argv[sys.argv.index("--worker") + 1])
        return worker(
            pid,
            sys.argv[sys.argv.index("--workdir") + 1],
            int(sys.argv[sys.argv.index("--port") + 1]),
        )

    import numpy as np

    from cuking_tpu.io.synthetic_input import write_synthetic_input
    from cuking_tpu.io.uri import Storage
    from cuking_tpu.utils.synthetic import random_genotypes

    workdir = tempfile.mkdtemp(prefix="cuking_mp_")
    g = random_genotypes(
        NUM_SAMPLES, NUM_SITES, missing_rate=0.1, seed=61, num_related_pairs=4
    )
    storage = Storage()
    os.makedirs(os.path.join(workdir, "in.parquet"))
    write_synthetic_input(storage, os.path.join(workdir, "in.parquet"), g)
    np.save(os.path.join(workdir, "genotypes.npy"), g)

    port = _free_port()  # ephemeral: concurrent runs must not collide
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i),
             "--workdir", workdir, "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(NUM_PROCESSES)
    ]
    outputs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outputs)):
        if p.returncode != 0:
            print(f"--- worker {i} failed (rc={p.returncode}) ---\n{out}")
            return 1

    # Merge the two disjoint partitions and compare with the oracle.
    from cuking_tpu.io.writer import read_results_table
    from cuking_tpu.ops.oracle import oracle_king

    table = read_results_table(storage, os.path.join(workdir, "out.parquet"))
    kin, ibs0, ibs1, ibs2 = oracle_king(g, g)
    iu, ju = np.triu_indices(NUM_SAMPLES, k=1)
    with np.errstate(invalid="ignore"):
        keep = kin[iu, ju] > np.float32(THRESHOLD)
    exp = sorted(
        (f"S{i:06d}", f"S{j:06d}",
         struct.unpack("<I", struct.pack("<f", np.float32(kin[i, j])))[0])
        for i, j in zip(iu[keep], ju[keep])
    )
    got = sorted(
        (table.column("i")[k].as_py(), table.column("j")[k].as_py(),
         struct.unpack(
             "<I", struct.pack("<f", np.float32(table.column("kin")[k].as_py()))
         )[0])
        for k in range(table.num_rows)
    )
    assert got == exp, (len(got), len(exp))
    parts = sorted(
        f for f in os.listdir(os.path.join(workdir, "out.parquet"))
        if f.endswith(".parquet")
    )
    assert len(parts) == NUM_PROCESSES, parts  # one partition per host
    print(json.dumps({
        "multiprocess_smoke": "ok",
        "processes": NUM_PROCESSES,
        "devices": NUM_PROCESSES * DEVICES_PER_PROCESS,
        "pairs": len(got),
        "partitions": parts,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
