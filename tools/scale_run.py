"""Measured scaling harness: replicate fact tables N× (key-shifted) into
a scratch dir, run selected bench-tagged registry queries against both
the base and replicated dirs cold, and print one JSON line per query
with the wall-clock ratio.

This makes SCALE.md's "measured scaling" sections reproducible:

    python tools/scale_run.py --factor 10 \
        --queries rolling_range_window dedup_minhash_lsh

Replication is key-shifted, content-identical (the r4 run's recipe):
fact tables get their integer id columns shifted by i*stride per copy so
joins/group-bys see distinct keys; dimension tables copy through
unchanged, so per-dimension fan-in grows N× — the realistic growth
shape for a fact-heavy warehouse.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from sqlmesh_spark.registry import load_all
from sqlmesh_spark.session import build_session

#: fact table → integer key columns shifted per replica (content columns
#: copy through unchanged; foreign keys into DIMENSIONS stay put so the
#: dimensions keep resolving).
_FACT_KEYS = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("id",),
}

_ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _replicate(spark: SparkSession, src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for table in _ALL_TABLES:
        src_path = os.path.join(src, f"{table}.parquet")
        if not os.path.exists(src_path):
            continue
        dst_path = os.path.join(dst, f"{table}.parquet")
        keys = _FACT_KEYS.get(table)
        if not keys:
            shutil.copytree(src_path, dst_path) if os.path.isdir(src_path) \
                else shutil.copy(src_path, dst_path)
            continue
        df = spark.read.parquet(src_path)
        present = [k for k in keys if k in df.columns]
        strides = {
            k: (df.agg(F.max(k)).collect()[0][0] or 0) + 1 for k in present
        }
        parts: list[DataFrame] = []
        for i in range(factor):
            rep = df
            for k in present:
                rep = rep.withColumn(
                    k, (F.col(k) + F.lit(i * strides[k])).cast(df.schema[k].dataType)
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst_path)


def _time_queries(spark: SparkSession, sf_dir: str, names: list[str]) -> dict:
    cases = load_all()
    out: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        cases[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--queries", nargs="+", required=True)
    args = ap.parse_args()

    spark = build_session(app_name="sqlmesh_spark_scale")
    scratch = tempfile.mkdtemp(prefix="sqlmesh_scale_")
    _replicate(spark, args.base, scratch, args.factor)

    # Warm the JVM/codegen path for EVERY query (same rationale as
    # bench.py) so the base-dir pass doesn't absorb session startup or
    # per-query codegen into its numbers.
    _time_queries(spark, args.base, args.queries)
    base_t = _time_queries(spark, args.base, args.queries)
    big_t = _time_queries(spark, scratch, args.queries)
    report = {
        "factor": args.factor,
        "base": base_t,
        "replicated": big_t,
        "ratio": {
            n: (round(big_t[n] / base_t[n], 2) if base_t[n] > 0 else None)
            for n in args.queries
        },
    }
    print(json.dumps(report))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
