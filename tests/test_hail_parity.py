"""Optional Hail-backed parity test (SURVEY.md §4d): compares our kinship
directly against ``hl.king`` when Hail is installed; skipped otherwise.

The reference's acceptance criterion is "kinship coefficients identical to
Hail's hl.king" (reference README.md:3).  Without Hail, the same semantics
are enforced by the numpy oracle tests (ops/oracle.py implements the same
between-family estimator); this test closes the loop on real Hail when the
environment provides it (e.g. a Dataproc CI runner).
"""

import numpy as np
import pytest

hl = pytest.importorskip("hail")

from cuking_tpu import king  # noqa: E402
from cuking_tpu.utils.synthetic import random_genotypes  # noqa: E402


def test_king_matches_hl_king():
    hl.init(local="local[1]", default_reference="GRCh37", quiet=True)
    n, s = 24, 500
    g = random_genotypes(n, s, missing_rate=0.1, seed=55, num_related_pairs=3)

    # Build a MatrixTable with the same genotypes.
    rows = []
    for site in range(s):
        for sample in range(n):
            v = int(g[sample, site])
            rows.append(
                {"site": site, "sample": f"S{sample:03d}",
                 "n_alt": None if v < 0 else v}
            )
    ht = hl.Table.parallelize(
        rows,
        hl.tstruct(site=hl.tint32, sample=hl.tstr, n_alt=hl.tint32),
    )
    mt = ht.to_matrix_table(row_key=["site"], col_key=["sample"])
    mt = mt.annotate_entries(
        GT=hl.or_missing(
            hl.is_defined(mt.n_alt),
            hl.unphased_diploid_gt_index_call(mt.n_alt),
        )
    )
    hail_kin = hl.king(mt.GT)
    hail_vals = {
        (r["s_1"], r["s"]): r["phi"]
        for r in hail_kin.entries().collect()
    }

    ours = king(g, site_chunk_words=16)
    kin = np.asarray(ours.kin)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            expect = hail_vals[(f"S{i:03d}", f"S{j:03d}")]
            got = kin[j, i]
            if expect is None or not np.isfinite(got):
                continue
            assert np.float32(expect) == np.float32(got), (i, j, expect, got)
