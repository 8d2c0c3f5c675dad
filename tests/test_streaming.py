"""Structured Streaming incremental backend: availableNow drain + windowed
aggregation with watermark, including incremental pickup of new files."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from sqlmesh_spark.sources.tables import load_table
from sqlmesh_spark.streaming import stream_incremental_aggregate, stream_to_memory_sink


def test_streaming_incremental_aggregate(spark, sf_dir):
    src = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_orderdate").alias("event_ts")
    )
    jan = orders.filter(
        (F.col("event_ts") >= "1995-01-01") & (F.col("event_ts") < "1995-01-08")
    )
    jan.write.mode("overwrite").parquet(os.path.join(src, "batch1"))

    schema = jan.schema
    agg = stream_incremental_aggregate(
        spark,
        source_dir=os.path.join(src, "batch1"),
        schema=schema,
        time_col="event_ts",
        window_duration="1 day",
        watermark="2 days",
        agg_exprs={
            "n_orders": "count(1)",
            "revenue_cents": "sum(cast(round(o_totalprice * 100) as bigint))",
        },
    )
    stream_to_memory_sink(agg, "stream_daily", ckpt)

    got = {
        r.window_start.strftime("%Y-%m-%d"): (r.n_orders, r.revenue_cents)
        for r in spark.sql("SELECT * FROM stream_daily").collect()
    }
    # Append mode emits only watermark-CLOSED windows: end <= max_event - wm.
    import datetime as dt

    max_ts = jan.agg(F.max("event_ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(days=2)
    expected = {
        r.ds: (r.n, r.cents)
        for r in jan.groupBy(F.date_format("event_ts", "yyyy-MM-dd").alias("ds"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
        )
        .collect()
        if dt.datetime.strptime(r.ds, "%Y-%m-%d") + dt.timedelta(days=1) <= cutoff
    }
    assert got == expected and 0 < len(got) < 7


def test_streaming_picks_up_new_files_incrementally(spark, sf_dir):
    """Second availableNow drain over the same checkpoint processes ONLY
    newly-arrived files — the streaming analog of interval bookkeeping."""
    src = tempfile.mkdtemp(prefix="stream_src2_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt2_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").alias("event_ts")
    )
    d1 = orders.filter(
        (F.col("event_ts") >= "1995-02-01") & (F.col("event_ts") < "1995-02-02")
    )
    d1.coalesce(1).write.mode("append").parquet(src)

    out = tempfile.mkdtemp(prefix="stream_out_")
    schema = d1.schema

    def drain():
        # Raw passthrough stream to a parquet sink (memory sinks cannot
        # recover from checkpoints; file sinks can — the production shape).
        stream = (
            spark.readStream.format("parquet").schema(schema).load(src)
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n1 = spark.read.parquet(out).count()

    d2 = orders.filter(
        (F.col("event_ts") >= "1995-02-02") & (F.col("event_ts") < "1995-02-03")
    )
    d2.coalesce(1).write.mode("append").parquet(src)
    drain()
    assert n1 == d1.count()
    # Second drain appended ONLY the new file's rows (checkpointed offsets).
    assert spark.read.parquet(out).count() == d1.count() + d2.count()


def test_stateful_sessionization_across_batches(spark, sf_dir):
    """Cross-batch state: two micro-batches split on time must yield the
    same per-user session totals as one batch pass (state carries
    last_ts/n_sessions/n_events between batches)."""
    from sqlmesh_spark.streaming.stateful import stream_sessionize

    src = tempfile.mkdtemp(prefix="sess_src_")
    ckpt = tempfile.mkdtemp(prefix="sess_ckpt_")

    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select("user_id", "event_id", "ts_ns")
    )
    cut = events.approxQuantile("ts_ns", [0.5], 0.0)[0]
    first = events.filter(F.col("ts_ns") <= cut)
    second = events.filter(F.col("ts_ns") > cut)
    first.coalesce(1).write.mode("overwrite").parquet(src)

    q = (
        stream_sessionize(spark, src, schema=events.schema)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_batches")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        second.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    # Update mode emits one row per user per batch; totals are monotonic,
    # so the per-user MAX is the final state.
    got = {
        r.user_id: (r.ns, r.ne)
        for r in spark.sql(
            "SELECT user_id, MAX(n_sessions) AS ns, MAX(n_events) AS ne "
            "FROM sess_batches GROUP BY user_id"
        ).collect()
    }

    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    prev = F.lag("ts_ns").over(w)
    is_new = F.when(
        prev.isNull() | ((F.col("ts_ns") - prev) > 1_800_000_000_000), 1
    ).otherwise(0)
    want = {
        r.user_id: (r.ns, r.ne)
        for r in events.withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("ns"), F.count(F.lit(1)).alias("ne"))
        .collect()
    }
    assert got == want


import pytest

from sqlmesh_spark.parity import compare_case
from sqlmesh_spark.registry import load_all


def _streaming_cases():
    return [(n, c) for n, c in load_all().items() if "streaming" in c.tags]


@pytest.mark.parametrize(
    "name,case", _streaming_cases(), ids=lambda x: x if isinstance(x, str) else ""
)
def test_streaming_parity(spark, sf_dir, name, case):
    r = compare_case(spark, sf_dir, name, case.fn, case.oracle)
    assert r["match"], r["detail"]
