"""Skew-mitigation helpers: salting for hot keys.

AQE's skew-join splitting handles most runtime skew, but aggregations on a
pathological key (one user = 30% of events) still funnel one reducer. The
classic fix: two-phase salted aggregation — spread the hot key over N
salts, partially aggregate, then fold the partials. These helpers encode
the pattern so model authors don't hand-roll it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for additive measures: phase 1 groups by
    (keys, salt) — spreading each key across `salt_buckets` reducers —
    phase 2 folds the partials per key. `aggs` maps output name → an
    additive aggregate over the input (SUM/COUNT-shaped; AVG must be
    decomposed by the caller into SUM+COUNT)."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in aggs]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skewed-side salting: the skewed fact gets a random salt, the small
    side is replicated across all salts (explode), and the join key becomes
    (keys, salt) — one hot key now lands on `salt_buckets` reducers."""
    on = list(on)
    salted_fact = skewed.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_fact.join(replicated, on=on + ["_salt"]).drop("_salt")


SALTED_ORACLE = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
"""


def _salted_case(spark, sf_dir):
    from sqlmesh_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    return salted_agg(
        e,
        ["user_id"],
        {
            "n_events": F.count(F.lit(1)),
            "value_cents": F.sum(F.round(F.col("value") * 100).cast("bigint")),
        },
    )


def _register() -> None:
    from sqlmesh_spark.registry import register

    register("skew_salted_agg", oracle=SALTED_ORACLE, tags=("relational", "skew"))(
        _salted_case
    )


_register()


SALTED_JOIN_ORACLE = """
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events JOIN customer ON user_id % 1000 = c_custkey
GROUP BY c_mktsegment
"""


def _salted_join_case(spark, sf_dir):
    """salted_join correctness as a driver case: the skewed fact gets a
    random salt, the dimension replicates across all salt values, and the
    (key, salt) join spreads any hot key over `salt_buckets` reducers.
    The salt routes rows but never changes them, so the aggregated result
    must equal the plain-join oracle exactly — the property that makes
    salting safe to apply mechanically under skew at 100 TB."""
    from sqlmesh_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").withColumn(
        "join_key", F.col("user_id") % 1000
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("join_key"), "c_mktsegment")
    )
    return (
        salted_join(e, c, ["join_key"], salt_buckets=8)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
    )


def _register_join() -> None:
    from sqlmesh_spark.registry import register

    register("skew_salted_join", oracle=SALTED_JOIN_ORACLE, tags=("relational", "skew"))(
        _salted_join_case
    )


_register_join()
