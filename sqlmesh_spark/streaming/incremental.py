"""Structured Streaming backend for INCREMENTAL_BY_TIME_RANGE (optional).

The reference has no streaming abstraction — batch cron intervals only
(SURVEY §1.1: node.py:28 IntervalUnit, min five minutes) — with
late-arrival handling via `lookback` + restatements. This module is the
Spark-native upgrade path for the same model kind:

- a file-source ``readStream`` over the model's input directory,
- event-time windowed aggregation with ``withWatermark(time_col, lookback)``
  (the watermark IS the lookback, expressed in stream time),
- ``trigger(availableNow=True)`` so a scheduled run drains exactly the
  available data and stops — cron-compatible micro-batching with
  checkpointed exactly-once progress instead of interval bookkeeping.

At scale the win is incremental state: a day's aggregation never rescans
the day on late arrivals; the state store folds late rows in and the
watermark bounds state size.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_incremental_aggregate(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    time_col: str,
    window_duration: str = "1 day",
    watermark: str = "2 days",
    agg_exprs: Optional[dict[str, str]] = None,
) -> DataFrame:
    """readStream → watermark → tumbling-window aggregation.

    ``agg_exprs`` maps output column → SQL aggregate expression over the
    stream (defaults to a row count). Returns the unstarted streaming
    DataFrame; pair with ``stream_to_memory_sink`` or ``writeStream``.
    """
    agg_exprs = agg_exprs or {"n_rows": "count(1)"}
    stream = (
        spark.readStream.format("parquet").schema(schema).load(source_dir)
        # Watermarks require zoned TIMESTAMP; parquet NTZ timestamps cast
        # through (session is pinned UTC so the instant is unchanged).
        .withColumn(time_col, F.col(time_col).cast("timestamp"))
    )
    aggs = [F.expr(expr).alias(name) for name, expr in agg_exprs.items()]
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window_duration).alias("win"))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(name) for name in agg_exprs],
        )
    )


def stream_to_memory_sink(
    df: DataFrame, query_name: str, checkpoint_dir: str
) -> None:
    """Drain all currently-available input into an in-memory table named
    ``query_name`` and stop — the batch-scheduler-compatible trigger
    (availableNow) that makes streaming runs cron-drivable."""
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
