"""Local mirror of the driver's full verification, as one command:

    python tools/verify_all.py [--sf /root/testdata/sf0.01] [--twice]

Runs entry() smoke, then every registered case against its DuckDB oracle
(row count + column names + order-insensitive value canonicalization,
PLUS a driver-faithful canon check that reproduces the driver's raw-cell
pandas sort_values — so a case whose output the driver cannot hash, e.g.
top-level ARRAY/MAP/STRUCT columns, fails HERE too instead of shipping
red as framework_pg8_features_model did in round 8). --twice re-runs
each case and checks run-vs-run identity (idempotency). Exit code 0 iff
everything matches. Run from anywhere; imports are path-independent.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--twice", action="store_true", help="also check idempotency")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument(
        "--case", action="append", default=None,
        help="run only the named case(s); repeatable; substring match "
             "when the exact name is not registered",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from sqlmesh_spark.parity import canonical_rows, compare_case
    from sqlmesh_spark.registry import load_all
    from sqlmesh_spark.session import build_session

    spark = build_session(cpus=args.cpus)
    assert entrymod.entry(spark).count() > 0, "entry() smoke failed"

    cases = load_all()
    if args.case:
        picked = {}
        for pat in args.case:
            if pat in cases:
                picked[pat] = cases[pat]
            else:
                picked.update(
                    {n: c for n, c in cases.items() if pat in n}
                )
        if not picked:
            print(f"verify_all: no case matches {args.case}")
            return 1
        cases = picked
    failures: list[tuple[str, str]] = []
    for name, case in cases.items():
        try:
            r = compare_case(spark, args.sf, name, case.fn, case.oracle)
            if not r["match"]:
                failures.append((name, r["detail"][:200]))
                continue
            if args.twice:
                again = canonical_rows(case.fn(spark, args.sf).toPandas())
                first = canonical_rows(case.fn(spark, args.sf).toPandas())
                if again != first:
                    failures.append((name, "not idempotent"))
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures.append((name, f"EXC {exc}"[:200]))
    print(f"verify_all: {len(cases)} cases at {args.sf}; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
