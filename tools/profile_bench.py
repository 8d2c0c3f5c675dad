"""Per-query profiling harness for the optimization rounds.

For each bench-tagged case: capture .explain("formatted") to
plans/<tag>/<name>_<suffix>.txt and time N noop-sink materializations
(fresh plan each rep, cache cleared between reps). Prints one JSON line
per query: {"name": ..., "reps": [...], "min": ...}.

Usage: python tools/profile_bench.py <suffix> [reps] [only,names]
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlmesh_spark.registry import load_all
from sqlmesh_spark.session import build_session


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_TAG", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="sqlmesh_spark_profile")
    cases = {n: c for n, c in load_all().items() if "bench" in c.tags}
    if only:
        cases = {n: c for n, c in cases.items() if n in only}
    if not cases:
        sys.exit(f"no matching bench cases for {sorted(only or ())}")
    # Warm JVM once
    next(iter(cases.values())).fn(spark, sf_dir).count()
    spark.catalog.clearCache()
    results = []
    for name, case in cases.items():
        spark.sparkContext.setJobDescription(name)
        buf = io.StringIO()
        df = case.fn(spark, sf_dir)
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        spark.catalog.clearCache()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            d = case.fn(spark, sf_dir)
            d.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        rec = {"name": name, "reps": times, "min": min(times)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    total = round(sum(r["min"] for r in results), 4)
    print(json.dumps({"total_min": total}), flush=True)


if __name__ == "__main__":
    main()
