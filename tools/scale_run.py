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

#: fact table → (key column, shared key DOMAIN) shifted per replica.
#: Columns in the same domain shift by ONE stride computed over every
#: member (l_orderkey and o_orderkey must move in lockstep or the
#: lineitem→orders join in the replicas silently mismatches). Content
#: columns and ALL foreign keys stay put so joins keep resolving —
#: events.user_id included (skew/streaming cases join it to customer),
#: which means replicas model the same users emitting N× the events.
_FACT_KEYS: dict[str, tuple[tuple[str, str], ...]] = {
    "lineitem": (("l_orderkey", "orderkey"),),
    "orders": (("o_orderkey", "orderkey"),),
    "events": (("event_id", "event_id"),),
    "documents": (("doc_id", "doc_id"),),
    "embeddings": (("vec_id", "embedding_id"),),
}

_ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _perturb(table: str, rep: DataFrame, i: int) -> DataFrame:
    """Make replica i content-DISJOINT from the base for the dedup/ANN
    corpora. Content-identical replication turns every document into an
    N-way duplicate (candidate pairs grow N², duplicate density → 100%)
    — that models a pathological corpus, not a 100× bigger one. Real
    corpora hold duplicate DENSITY roughly constant as they grow, so:

    - documents.text: every word is replaced by the same-LENGTH prefix
      of md5(word || replica_index) (replica 0 is the untouched base).
      Word boundaries, word lengths, and word identity within a replica
      are all preserved, so the char-5-gram shingle structure the dedup
      ladder measures carries over (same doc lengths, same shared-word
      overlaps → within-replica Jaccard ≈ base); across replicas the
      vocabularies are disjoint hex strings → Jaccard ~ 0, and the
      family is unbounded in the factor. Two rejected designs, measured
      at factor 4 (expected ~100 pairs): a per-TOKEN suffix leaves long
      words' interior 5-grams intact (66k cross-replica pairs), and a
      per-CHAR digit interleave collapses each 5-gram to ~2-3 original
      chars, inflating within-replica Jaccard (122k pairs).
    - embeddings.embedding: rotate the vector by i positions and negate
      on every second full rotation cycle (both cosine isometries —
      within-replica structure exact; 2·dim distinct classes, 128 at
      dim 64) so LSH buckets stay balanced instead of stacking N
      identical twins per bucket.
    """
    if i == 0:
        return rep
    if table == "documents" and "text" in rep.columns:
        rep = rep.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.substr(
                        F.md5(F.concat(w, F.lit(str(i)))),
                        F.lit(1),
                        F.length(w),
                    ),
                ),
                " ",
            ),
        )
    if table == "embeddings" and "embedding" in rep.columns:
        d = F.size(F.col("embedding"))
        k = F.lit(i) % d
        sign = F.when((F.lit(i) / d).cast("int") % 2 == 1, F.lit(-1.0)) \
            .otherwise(F.lit(1.0)).cast("float")
        rep = rep.withColumn(
            "embedding",
            F.transform(
                F.concat(
                    F.slice(F.col("embedding"), k + 1, d),
                    F.slice(F.col("embedding"), 1, k),
                ),
                lambda x: (x * sign).cast("float"),
            ),
        )
    return rep


def _replicate(
    spark: SparkSession, src: str, dst: str, factor: int, perturb: bool = False
) -> None:
    os.makedirs(dst, exist_ok=True)
    # one stride per key DOMAIN, maxed over every member column; the
    # DataFrames are kept and reused by the replication loop below (one
    # parquet read per table, not two)
    domain_stride: dict[str, int] = {}
    fact_dfs: dict[str, DataFrame] = {}
    for table, keys in _FACT_KEYS.items():
        src_path = os.path.join(src, f"{table}.parquet")
        if not os.path.exists(src_path):
            continue
        df = spark.read.parquet(src_path)
        fact_dfs[table] = df
        for col, domain in keys:
            if col in df.columns:
                mx = (df.agg(F.max(col)).collect()[0][0] or 0) + 1
                domain_stride[domain] = max(domain_stride.get(domain, 0), mx)
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
        df = fact_dfs[table]
        present = [(c, d) for c, d in keys if c in df.columns]
        parts: list[DataFrame] = []
        for i in range(factor):
            rep = df
            for col, domain in present:
                rep = rep.withColumn(
                    col,
                    (F.col(col) + F.lit(i * domain_stride[domain]))
                    .cast(df.schema[col].dataType),
                )
            if perturb:
                rep = _perturb(table, rep, i)
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst_path)


def _time_queries(
    spark: SparkSession, sf_dir: str, names: list[str],
    metrics: dict | None = None,
) -> dict:
    cases = load_all()
    out: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        mark = _max_stage_id(spark) if metrics is not None else -1
        t0 = time.perf_counter()
        cases[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
        if metrics is not None:
            metrics[name] = _stage_metrics_since(spark, mark)
    return out


def _ui_json(spark: SparkSession, path: str):
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/{path}", timeout=10) as r:
            return json.loads(r.read())
    except Exception:  # noqa: BLE001 - metrics are best-effort
        return None


def _app_id(spark: SparkSession) -> str | None:
    apps = _ui_json(spark, "applications")
    return apps[0]["id"] if apps else None


def _max_stage_id(spark: SparkSession) -> int:
    app = _app_id(spark)
    stages = _ui_json(spark, f"applications/{app}/stages") if app else None
    return max((st["stageId"] for st in stages), default=-1) if stages else -1


def _stage_metrics_since(spark: SparkSession, mark: int) -> dict | None:
    """Summed executor metrics of every COMPLETE stage with stageId >
    mark — the query's own stages when ``mark`` snapshots the max id
    just before it runs. Surfaces the exchange/spill profile SCALE.md
    reasons about (e.g. the minhash verify-join, its largest shuffle).
    Requires spark.ui.enabled (the --metrics flag turns it on)."""
    app = _app_id(spark)
    stages = _ui_json(
        spark, f"applications/{app}/stages?status=complete"
    ) if app else None
    if stages is None:
        return None
    agg = {
        "stages": 0,
        "shuffle_read_bytes": 0,
        "shuffle_write_bytes": 0,
        "memory_spill_bytes": 0,
        "disk_spill_bytes": 0,
        "input_bytes": 0,
        "peak_shuffle_write_stage_bytes": 0,
    }
    for st in stages:
        if st["stageId"] <= mark:
            continue
        agg["stages"] += 1
        agg["shuffle_read_bytes"] += st.get("shuffleReadBytes", 0)
        agg["shuffle_write_bytes"] += st.get("shuffleWriteBytes", 0)
        agg["memory_spill_bytes"] += st.get("memoryBytesSpilled", 0)
        agg["disk_spill_bytes"] += st.get("diskBytesSpilled", 0)
        agg["input_bytes"] += st.get("inputBytes", 0)
        agg["peak_shuffle_write_stage_bytes"] = max(
            agg["peak_shuffle_write_stage_bytes"],
            st.get("shuffleWriteBytes", 0),
        )
    return agg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument(
        "--perturb", action="store_true",
        help="make documents/embeddings replicas content-disjoint "
             "(constant duplicate density — the realistic corpus-growth "
             "shape for dedup/ANN scaling runs)",
    )
    ap.add_argument(
        "--out", default=None,
        help="also write the JSON report to this file (e.g. SCALE_r8.json)",
    )
    ap.add_argument(
        "--metrics", action="store_true",
        help="record per-query stage metrics (shuffle read/write, "
             "spill) for the REPLICATED pass via the UI REST API",
    )
    args = ap.parse_args()

    spark = build_session(
        app_name="sqlmesh_spark_scale",
        extra_conf={"spark.ui.enabled": "true"} if args.metrics else None,
    )
    scratch = tempfile.mkdtemp(prefix="sqlmesh_scale_")
    _replicate(spark, args.base, scratch, args.factor, perturb=args.perturb)

    # Warm the JVM/codegen path for EVERY query (same rationale as
    # bench.py) so the base-dir pass doesn't absorb session startup or
    # per-query codegen into its numbers.
    _time_queries(spark, args.base, args.queries)
    base_t = _time_queries(spark, args.base, args.queries)
    stage_metrics: dict = {}
    big_t = _time_queries(
        spark, scratch, args.queries,
        metrics=stage_metrics if args.metrics else None,
    )
    cases = load_all()
    rows = {
        n: {
            "base": cases[n].fn(spark, args.base).count(),
            "replicated": cases[n].fn(spark, scratch).count(),
        }
        for n in args.queries
    }
    report = {
        "factor": args.factor,
        "perturb": args.perturb,
        "base": base_t,
        "replicated": big_t,
        "ratio": {
            n: (round(big_t[n] / base_t[n], 2) if base_t[n] > 0 else None)
            for n in args.queries
        },
        "result_rows": rows,
    }
    if args.metrics:
        report["replicated_stage_metrics"] = stage_metrics
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
