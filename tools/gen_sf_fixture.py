"""Generate a larger deterministic fixture by key-shifted replication.

The shipped testdata (TESTDATA.md, seed=42, read-only) tops out at sf0.1,
where every dimension join broadcasts and the fact-fact joins are at the
broadcast threshold — too small to measure exchange-byte claims. This
tool materializes an "sfN" directory by replicating sf0.1 ``--factor``
times with the same key-shift recipe the measured-scaling harness
(tools/scale_run.py) has used since round 4: fact keys shift by one
stride per key domain so joins resolve within each replica, dimensions
copy through unchanged, and the documents/embeddings corpora are
content-perturbed so duplicate density stays constant. The output is a
pure function of the (driver-generated, deterministic) base directory —
no new randomness enters.

    python tools/gen_sf_fixture.py --factor 10 --out /tmp/sqlmesh_sf1

The result directory is bench.py-compatible: point SPARK_GRAFT_SF_DIR at
it. At factor 10 ("sf1"): lineitem 6M rows, orders 1.5M — orders is past
spark.sql.autoBroadcastJoinThreshold, so the lineitem⋈orders exchanges
the r12 pre-filter rewrites target become real shuffles.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlmesh_spark.session import build_session
from tools.scale_run import _replicate


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sqlmesh_sf1")
    args = ap.parse_args()
    spark = build_session(app_name="sqlmesh_spark_gen_fixture")
    _replicate(spark, args.base, args.out, args.factor, perturb=True)
    print(f"wrote factor-{args.factor} fixture from {args.base} to {args.out}")


if __name__ == "__main__":
    main()
