"""WAP, unpartitioned delete-insert fallback, restatements."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from sqlmesh_spark.adapter import SparkAdapter
from sqlmesh_spark import audits


def test_wap_write_audit_publish(spark):
    adapter = SparkAdapter(spark)
    spark.sql("DROP TABLE IF EXISTS default.t_wap")
    adapter.ctas("default.t_wap", spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"))

    staging = adapter.wap_prepare("default.t_wap")
    adapter.insert_append(staging, spark.createDataFrame([(3, "c")], "id int, v string"))
    # Audit the staging branch BEFORE publish; main is untouched meanwhile.
    assert spark.sql(audits.not_null(staging, ["id", "v"])).count() == 0
    assert spark.table("default.t_wap").count() == 2
    adapter.wap_publish("default.t_wap", staging)
    assert spark.table("default.t_wap").count() == 3
    adapter.drop_table("default.t_wap")


def test_wap_abandon_on_audit_failure(spark):
    adapter = SparkAdapter(spark)
    spark.sql("DROP TABLE IF EXISTS default.t_wap2")
    adapter.ctas("default.t_wap2", spark.createDataFrame([(1, "a")], "id int, v string"))
    staging = adapter.wap_prepare("default.t_wap2")
    adapter.insert_append(staging, spark.createDataFrame([(None, "bad")], "id int, v string"))
    assert spark.sql(audits.not_null(staging, ["id"])).count() > 0
    # Don't publish — drop the branch; main unchanged.
    adapter.drop_table(staging)
    assert spark.table("default.t_wap2").count() == 1
    adapter.drop_table("default.t_wap2")


def test_unpartitioned_insert_overwrite_falls_back_to_delete_insert(spark):
    adapter = SparkAdapter(spark)
    spark.sql("DROP TABLE IF EXISTS default.t_di")
    base = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-02 00:00:00"), (3, "2024-01-03 00:00:00")],
        "id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    adapter.ctas("default.t_di", base)  # NOT partitioned

    batch = spark.createDataFrame([(99, "2024-01-02 12:00:00")], "id int, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    adapter.insert_overwrite_by_time_partition(
        "default.t_di", batch, "ts", "2024-01-02 00:00:00", "2024-01-03 00:00:00"
    )
    got = sorted(r.id for r in spark.table("default.t_di").collect())
    # id=2 (inside interval) replaced by 99; 1 and 3 survive.
    assert got == [1, 3, 99]
    adapter.drop_table("default.t_di")


def test_restatement_recomputes_window_and_downstream(spark, sf_dir):
    from sqlmesh_spark.core.context import Context

    orders = f"parquet.`{sf_dir}/orders.parquet`"
    ctx = Context(spark, state_dir=tempfile.mkdtemp())
    ctx.add_model(
        f"""
MODEL (name restate.daily, kind INCREMENTAL_BY_TIME_RANGE (time_column event_ts));
SELECT o_orderdate AS event_ts, o_orderkey, o_totalprice
FROM {orders}
WHERE o_orderdate >= CAST(@start_ts AS TIMESTAMP) AND o_orderdate < CAST(@end_ts AS TIMESTAMP)
"""
    )
    ctx.add_model(
        """
MODEL (name restate.rollup, kind FULL);
SELECT COUNT(*) AS n FROM restate.daily
"""
    )
    r1 = ctx.run(environment="restate_env", start="1995-01-01", end="1995-01-10")
    assert r1["restate.daily"] >= 1
    r2 = ctx.run(environment="restate_env", start="1995-01-01", end="1995-01-10")
    assert r2["restate.daily"] == 0  # fully processed

    r3 = ctx.restate(
        ["restate.daily"], "1995-01-03", "1995-01-05", environment="restate_env"
    )
    # Exactly the cleared window re-executes (one contiguous batch).
    assert r3["restate.daily"] == 1
    n = spark.table("restate_env_views.rollup").collect()[0].n
    expected = spark.sql(
        f"SELECT COUNT(*) AS n FROM {orders} "
        "WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-01-10'"
    ).collect()[0].n
    assert n == expected
