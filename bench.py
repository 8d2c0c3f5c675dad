"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}. The driver records this per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqlmesh_spark.registry import load_all
from sqlmesh_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="sqlmesh_spark_bench")

    cases = {n: c for n, c in load_all().items() if "bench" in c.tags}

    # Warm the JVM/codegen path once so per-query numbers measure the
    # queries, not session startup.
    next(iter(cases.values())).fn(spark, sf_dir).count()

    # Two passes, report min per query: shared-host noise is one-sided
    # (only ever adds time), so min-of-2 is the stable estimator of the
    # query's true cost while still including plan+codegen for pass 1.
    # The cache is cleared between passes so pass 2 re-executes every
    # query cold: within-query .cache() of a multiply-referenced relation
    # is a legitimate plan optimization (Spark inlines CTEs), but a cached
    # relation surviving into the next pass would make min-of-2 report a
    # warm-memory read instead of query cost.
    #
    # The interpreted-HOF queries (zip_with folds / Arrow batches /
    # multi-stage LSH) have a wider noise band than the codegen'd
    # relational set — observed ±30-60% on this shared host (r6: +61%
    # on ann_topk_bruteforce with zero code change). They get a third
    # pass so their min is drawn from 3 samples.
    HOF_QUERIES = {
        "ann_topk_bruteforce", "dedup_minhash_lsh", "pipeline_training_data",
    }
    timings: dict[str, float] = {}
    for _pass in range(3):
        spark.catalog.clearCache()
        for name, case in cases.items():
            if _pass == 2 and name not in HOF_QUERIES:
                continue
            t0 = time.perf_counter()
            try:
                df = case.fn(spark, sf_dir)
                # Force full materialization of every row, no driver collect.
                df.write.format("noop").mode("overwrite").save()
                elapsed = round(time.perf_counter() - t0, 4)
                timings[name] = min(timings.get(name, elapsed), elapsed)
            except Exception as exc:  # one broken query must not lose the line
                print(f"bench: {name} failed: {exc}", file=sys.stderr)
                timings[name] = -1.0

    total = round(sum(timings.values()), 4)
    # The headline set was widened at round 5 (+scd_type_2_by_time,
    # +mat_merge_by_key, +rolling_range_window — the expensive applies at
    # 100 TB). Report the original 12-query subtotal alongside so the
    # series stays comparable with the BASELINE.md 15.67 s figure.
    legacy_12 = {
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
        "q6_forecast_revenue", "q8_market_share", "q10_returned_items",
        "q21_lone_fault_supplier", "daily_revenue", "topk_per_group",
        "dedup_minhash_lsh", "ann_topk_bruteforce", "pipeline_training_data",
    }
    total_12 = round(sum(v for n, v in timings.items() if n in legacy_12), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "value_legacy_12q": total_12,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
