"""Parquet source registry for the synthetic TPC-H-ish test tables.

Reads are plain ``spark.read.parquet`` — the columnar scan with predicate
pushdown and column pruning is the scale path; any filter/projection in a
downstream query reaches the footer-level scan via Catalyst.

Reference parity: SQLMesh models external tables via ``ExternalModel``
(sqlmesh/core/model/definition.py:1969) — named sources with a schema the
planner can read. Here the registry is the external-model catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor: at TPC-H
# geometry region/nation are fixed-size, supplier/part/customer grow with SF
# but stay orders of magnitude below the facts. Only the fixed-size ones are
# safe to force-broadcast at 100 TB; the rest are left to AQE.
BROADCAST_SAFE = ("region", "nation")


# Loaded-DataFrame cache: a DataFrame is a lazy plan, so reusing one across
# cases is safe and skips the per-read footer/schema round-trip — across a
# ~200-case sweep that's the bulk of source-side driver overhead.
# Keyed per-session via WeakKeyDictionary (NOT id(spark): after a session is
# garbage-collected a new object can reuse the same address and would read
# cached DataFrames bound to a dead session); dead sessions' entries vanish
# with the key.
import weakref

_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Timestamp literals and date_format must agree with the UTC-naive
    # parquet timestamps regardless of the host session's zone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        per_session = _DF_CACHE.setdefault(spark, {})
    except TypeError:
        # SparkSession not weak-referenceable on this build — no caching.
        per_session = {}
    key = (sf_dir, name)
    df = per_session.get(key)
    if df is None:
        if name == "events":
            df = _load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        per_session[key] = df
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has shipped with ``ts`` as either parquet
    TIMESTAMP(NANOS) (read as raw int64 via the legacy conf) or
    ``timestamp[us]`` (read as TIMESTAMP_NTZ on Spark >= 4). Branch on the
    dtype Spark actually read and expose BOTH:
    - ``ts``    TIMESTAMP truncated to microseconds (Spark's native precision)
    - ``ts_ns`` BIGINT exact epoch-nanos, for ordering/arithmetic that must
      match nanosecond-precision engines bit-for-bit (DuckDB ``epoch_ns``).
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        # parquet TIMESTAMP(NANOS) surfaced as int64 epoch-nanos. Integer
        # DIV, never float division: epoch-nanos exceed double's 2^53
        # mantissa, so `/ 1000` would round the microsecond.
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    # timestamp[us] -> TIMESTAMP_NTZ (or TIMESTAMP). Session TZ is pinned
    # UTC in load_table, so the NTZ->LTZ cast is the identity mapping and
    # unix_micros*1000 equals DuckDB's epoch_ns on micros-precision data.
    ts = F.col("ts").cast("timestamp")
    return df.withColumn("ts_ns", F.unix_micros(ts) * F.lit(1000)).withColumn("ts", ts)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each parquet table as a temp view for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
