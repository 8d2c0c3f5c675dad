"""As-of and range joins — the temporal join operators Spark lacks natively.

The brief's custom-operator ladder says: compose from existing DataFrame
ops when semantics allow. Both of these do:

- **As-of join** (each left row matches the latest right row at-or-before
  its timestamp, per key): UNION the two sides tagged by origin, one
  window pass carrying the last right-side value forward, filter back to
  left rows. One shuffle on (key, time) — the same cost as a sort-merge
  join, no per-group Python. This is the standard "union + last_value"
  formulation; contrast with ``pd.merge_asof`` per group via
  applyInPandas, which ships every row through Arrow.
- **Range join** (equality key + band predicate): Spark executes the
  equi-key part as a hash join and post-filters the band; for banded
  intervals we add a bucketized join option that turns the band into an
  equi-condition on coarse buckets (the shape AQE cannot derive itself).

DuckDB has native ASOF JOIN — used verbatim as the oracle, so our
composition is checked against a first-party implementation.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_columns: Sequence[str],
    tolerance_seconds: Optional[int] = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right_time <= left_time within the same `on` key (optionally within
    `tolerance_seconds`). Left rows with no prior right row keep NULLs.
    """
    on = list(on)
    lcols = left.columns
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_columns],
        F.lit(None).cast("timestamp").alias("_rt"),
    )
    tagged_right = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_columns],
        F.col(right_time).cast("timestamp").alias("_rt"),
    ).select(*tagged_left.columns)  # align column order

    unioned = tagged_left.unionByName(tagged_right)
    # Right rows sort before left rows at equal timestamps (asof is
    # at-or-before, inclusive), matching DuckDB ASOF >= semantics.
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("_t"),
        F.col("_is_left"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}") for c in value_columns],
        F.last("_rt", ignorenulls=True).over(w).alias("_rts"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        within = (
            F.col("_rts").isNotNull()
            & (F.unix_timestamp("_t") - F.unix_timestamp("_rts") <= tolerance_seconds)
        )
        out = out.select(
            *lcols,
            *[
                F.when(within, F.col(f"_rv_{c}")).otherwise(F.lit(None)).alias(c)
                for c in value_columns
            ],
        )
    else:
        out = out.select(*lcols, *[F.col(f"_rv_{c}").alias(c) for c in value_columns])
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    condition: Column,
) -> DataFrame:
    """Equi-key join + range predicate; Catalyst hash-joins the key and
    post-filters the band — the right plan when keys are selective."""
    return left.join(right, on=list(on)).filter(condition)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Keyless band join at scale: explode each right interval into the
    coarse buckets it spans, equi-join on the left point's bucket, then
    exact-filter. Turns an O(n·m) theta join into a shuffle join whose
    fan-out is interval_span/bucket_width."""
    lb = left.withColumn("_bucket", F.floor(F.col(left_point) / bucket_width).cast("bigint"))
    rb = right.withColumn(
        "_buckets",
        F.sequence(
            F.floor(F.col(right_lo) / bucket_width).cast("bigint"),
            F.floor(F.col(right_hi) / bucket_width).cast("bigint"),
        ),
    ).withColumn("_bucket", F.explode("_buckets")).drop("_buckets")
    joined = lb.join(rb, on="_bucket").filter(
        (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi))
    )
    return joined.drop("_bucket")


# ---------------------------------------------------------------------------
# Registry cases
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from sqlmesh_spark.registry import register  # noqa: E402
from sqlmesh_spark.sources.tables import load_table  # noqa: E402

# As-of: for each order (anchored into the events' January-2024 window so
# matches actually occur — deterministic hour offset from the order key),
# the latest event by the same "user" (custkey % 150 maps orders onto the
# events user space) at or before the anchor. Half the anchors land
# mid-window (real matches), early anchors legitimately have no prior
# event (NULLs) — both paths exercised.
_ANCHOR_DUCK = "TIMESTAMP '2024-01-01 00:00:00' + ((o_orderkey * 7) % 720) * INTERVAL 1 HOUR"
_ANCHOR_SPARK = (
    "timestampadd(HOUR, CAST((o_orderkey * 7) % 720 AS INT), TIMESTAMP'2024-01-01 00:00:00')"
)

ASOF_ORACLE = f"""
SELECT o.o_orderkey, o.uid, e.event_type AS last_event_type, e.value AS last_value
FROM (
  SELECT o_orderkey, o_custkey % 150 AS uid, {_ANCHOR_DUCK} AS anchor_ts
  FROM orders WHERE o_orderkey <= 2000
) o
ASOF LEFT JOIN (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
) e
ON o.uid = e.user_id AND e.ts <= o.anchor_ts
"""


@register("asof_join_orders_events", oracle=ASOF_ORACLE, tags=("relational", "asof"))
def asof_join_orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 150).alias("uid"),
            F.expr(_ANCHOR_SPARK).alias("anchor_ts"),
        )
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"), "ts", "event_type", "value"
    )
    joined = asof_join(
        orders,
        events,
        on=["uid"],
        left_time="anchor_ts",
        right_time="ts",
        value_columns=["event_type", "value"],
    )
    return joined.select(
        "o_orderkey",
        "uid",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


RANGE_ORACLE = """
SELECT p.p_partkey, l.l_orderkey, l.l_linenumber
FROM part p JOIN lineitem l
  ON p.p_partkey = l.l_partkey
 AND l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
WHERE p.p_partkey <= 200
"""


@register("range_join_part_lineitem", oracle=RANGE_ORACLE, tags=("relational", "asof"))
def range_join_part_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    l = load_table(spark, sf_dir, "lineitem")
    joined = range_join(
        p.select("p_partkey", "p_size"),
        l.select(F.col("l_partkey").alias("p_partkey"), "l_orderkey", "l_linenumber", "l_quantity"),
        on=["p_partkey"],
        condition=F.col("l_quantity").between(F.col("p_size") - 2, F.col("p_size") + 2),
    )
    return joined.select("p_partkey", "l_orderkey", "l_linenumber")


BUCKETED_RANGE_ORACLE = """
SELECT e.event_id, b.band_id
FROM (SELECT event_id, value FROM events WHERE event_id < 1000) e
JOIN (
  SELECT CAST(n_nationkey AS BIGINT) AS band_id,
         n_nationkey * 10.0 AS lo, n_nationkey * 10.0 + 25.0 AS hi
  FROM nation
) b ON e.value >= b.lo AND e.value <= b.hi
"""


@register("bucketed_range_join", oracle=BUCKETED_RANGE_ORACLE, tags=("relational", "asof"))
def bucketed_range_join_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless band join: event values against overlapping numeric bands —
    bucketized so it executes as an equi-join."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 1000)
        .select("event_id", "value")
    )
    bands = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("band_id"),
        (F.col("n_nationkey") * 10.0).alias("lo"),
        (F.col("n_nationkey") * 10.0 + 25.0).alias("hi"),
    )
    joined = bucketed_range_join(e, bands, "value", "lo", "hi", bucket_width=10.0)
    return joined.select("event_id", "band_id")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_columns: Sequence[str],
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row with
    right_time >= left_time per key (the 'next event after' direction —
    e.g. first reaction following a release). Same single sorted window
    pass as the backward form, scanned in descending time with
    first-following carry."""
    on = list(on)
    lcols = left.columns
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_columns],
    )
    tagged_right = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_columns],
    ).select(*tagged_left.columns)
    unioned = tagged_left.unionByName(tagged_right)
    # Descending time; right rows first at equal timestamps (at-or-after
    # inclusive). The carry looks "backward" in the sorted order, which is
    # forward in time.
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("_is_left"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}") for c in value_columns],
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *lcols, *[F.col(f"_rv_{c}").alias(c) for c in value_columns]
    )


ASOF_FWD_ORACLE = f"""
SELECT o.o_orderkey, o.uid, e.event_type AS next_event_type, e.value AS next_value
FROM (
  SELECT o_orderkey, o_custkey % 150 AS uid, {_ANCHOR_DUCK} AS anchor_ts
  FROM orders WHERE o_orderkey <= 2000
) o
ASOF LEFT JOIN (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
) e
ON o.uid = e.user_id AND e.ts >= o.anchor_ts
"""


@register("asof_join_forward", oracle=ASOF_FWD_ORACLE, tags=("relational", "asof"))
def asof_join_forward_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of vs DuckDB's native ASOF with a >= condition — the
    'first event after the anchor' direction."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 150).alias("uid"),
            F.expr(_ANCHOR_SPARK).alias("anchor_ts"),
        )
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"), "ts", "event_type", "value"
    )
    joined = asof_join_forward(
        orders,
        events,
        on=["uid"],
        left_time="anchor_ts",
        right_time="ts",
        value_columns=["event_type", "value"],
    )
    return joined.select(
        "o_orderkey",
        "uid",
        F.col("event_type").alias("next_event_type"),
        F.col("value").alias("next_value"),
    )
