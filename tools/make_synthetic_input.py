#!/usr/bin/env python3
"""Generates a synthetic cuKING-format input directory for testing/benching.

Same contract as the Hail exporter (cuking_tpu/interop/mt_to_inputs.py):
ZSTD Parquet partitions of (row_idx, col_idx, n_alt_alleles) plus
metadata.json.  Seeded related pairs (the trailing 2·k samples, pairwise)
give the KING sweep something to find.

    python tools/make_synthetic_input.py --out /tmp/in.parquet \
        --samples 1000 --sites 100000 --related-pairs 5
"""

import argparse
import sys

sys.path.insert(0, ".")

from cuking_tpu.io.synthetic_input import write_synthetic_input  # noqa: E402
from cuking_tpu.io.uri import Storage  # noqa: E402
from cuking_tpu.utils.synthetic import random_genotypes  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", required=True, help="Output directory (local or gs://)")
    p.add_argument("--samples", type=int, default=1000)
    p.add_argument("--sites", type=int, default=100_000)
    p.add_argument("--missing-rate", type=float, default=0.05)
    p.add_argument("--related-pairs", type=int, default=5)
    p.add_argument("--partitions", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    g = random_genotypes(
        args.samples, args.sites, missing_rate=args.missing_rate,
        seed=args.seed, num_related_pairs=args.related_pairs,
    )
    storage = Storage()
    if not args.out.startswith("gs://"):
        import os

        os.makedirs(args.out, exist_ok=True)
    meta = write_synthetic_input(
        storage, args.out, g, num_partitions=args.partitions
    )
    print(
        f"Wrote {args.partitions} partitions + metadata.json to {args.out} "
        f"({meta.num_samples} samples x {meta.num_sites} sites)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
