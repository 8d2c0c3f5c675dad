"""Parity tests: every registered relational case vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from sqlmesh_spark.parity import compare_case
from sqlmesh_spark.registry import load_all


def _cases(tag):
    return [(n, c) for n, c in load_all().items() if tag in c.tags]


@pytest.mark.parametrize("name,case", _cases("relational"), ids=lambda x: x if isinstance(x, str) else "")
def test_relational_parity(spark, sf_dir, name, case):
    r = compare_case(spark, sf_dir, name, case.fn, case.oracle)
    assert r["match"], r["detail"]


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)


def test_salted_agg_matches_plain(spark, sf_dir):
    from pyspark.sql import functions as F

    from sqlmesh_spark.operators.skew import salted_agg
    from sqlmesh_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    plain = {
        (r.user_id): (r.n, r.v)
        for r in e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("v"))
        .collect()
    }
    salted = {
        (r.user_id): (r.n, r.v)
        for r in salted_agg(
            e,
            ["user_id"],
            {
                "n": F.count(F.lit(1)),
                "v": F.sum(F.round(F.col("value") * 100).cast("bigint")),
            },
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    from sqlmesh_spark.operators.skew import salted_join
    from sqlmesh_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_custkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name") \
        .withColumnRenamed("n_nationkey", "c_nationkey")
    plain = c.join(n, "c_nationkey").count()
    assert salted_join(c, n, ["c_nationkey"]).count() == plain
