#!/usr/bin/env python3
"""Real-TPU mesh smoke: ring sweep + Pallas kernel + tri skip inside
shard_map on however many chips are attached (exact parity vs the oracle).

Run from the repo root: ``python tools/tpu_mesh_smoke.py``.  (No PYTHONPATH —
it breaks this machine's TPU plugin discovery.)
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from cuking_tpu.ops.bitset import PlaneLayout, pack_genotypes  # noqa: E402
from cuking_tpu.ops.king_pallas import panel_counts_pallas  # noqa: E402
from cuking_tpu.ops.oracle import oracle_king  # noqa: E402
from cuking_tpu.parallel.ring import (  # noqa: E402
    all_pairs_sharded,
    ring_output_to_resultset,
)
from cuking_tpu.utils.synthetic import random_genotypes  # noqa: E402


def main() -> int:
    print("backend:", jax.default_backend(), jax.devices())
    n, s = 300, 2000
    g = random_genotypes(n, s, missing_rate=0.1, seed=77, num_related_pairs=4)
    layout = PlaneLayout.create(s)
    planes = pack_genotypes(g, layout)
    mesh = Mesh(np.array(jax.devices()), axis_names=("samples",))
    out = all_pairs_sharded(
        planes, n, mesh,
        lambda pi, pj, tri: panel_counts_pallas(
            pi, pj, tri, site_chunk_words=128
        ),
        kin_threshold=0.0884, capacity_per_device=65536, row_multiple=256,
        sub_panel=256,  # production sub-tiled block processing
    )
    rs = ring_output_to_resultset(out)

    kin, ibs0, ibs1, ibs2 = oracle_king(g, g)
    iu, ju = np.triu_indices(n, k=1)
    mask = kin[iu, ju] > 0.0884
    exp_pairs = set(zip(iu[mask].tolist(), ju[mask].tolist()))
    got_pairs = set(zip(rs.i_idx.tolist(), rs.j_idx.tolist()))
    assert got_pairs == exp_pairs, (len(got_pairs), len(exp_pairs))
    exp_kin = {(i, j): np.float32(kin[i, j]) for i, j in exp_pairs}
    assert all(
        exp_kin[(i, j)] == k
        for i, j, k in zip(rs.i_idx, rs.j_idx, rs.kin)
    )
    print(
        f"ring+pallas on a {mesh.devices.size}-device TPU mesh: "
        f"{len(rs)} pairs, exact parity OK"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
