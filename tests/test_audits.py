"""Audit operators: DuckDB parity at sf0.001 + semantic spot checks."""

from __future__ import annotations

import pytest

from sqlmesh_spark import audits
from sqlmesh_spark.parity import compare_case
from sqlmesh_spark.registry import load_all


def _cases():
    return [(n, c) for n, c in load_all().items() if "audit" in c.tags]


@pytest.mark.parametrize("name,case", _cases(), ids=lambda x: x if isinstance(x, str) else "")
def test_audit_parity(spark, sf_dir, name, case):
    r = compare_case(spark, sf_dir, name, case.fn, case.oracle)
    assert r["match"], r["detail"]


def test_audit_semantics_not_null(spark):
    df = spark.createDataFrame([(1, "a"), (2, None), (None, "c")], "id int, v string")
    df.createOrReplaceTempView("t_nn")
    bad = spark.sql(audits.not_null("t_nn", ["id", "v"]))
    assert bad.count() == 2


def test_audit_semantics_unique(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "id int")
    df.createOrReplaceTempView("t_uq")
    bad = spark.sql(audits.unique_values("t_uq", ["id"]))
    rows = bad.collect()
    assert len(rows) == 1 and rows[0].cnt == 2


def test_audit_semantics_mutually_exclusive(spark):
    df = spark.createDataFrame([(0, 10), (5, 15), (20, 30)], "lo int, hi int")
    df.createOrReplaceTempView("t_rng")
    bad = spark.sql(audits.mutually_exclusive_ranges("t_rng", "lo", "hi"))
    assert bad.count() == 1  # [5,15) overlaps [0,10)


def test_row_diff_decimal_normalization(spark):
    from sqlmesh_spark.diff import row_diff_query

    spark.createDataFrame(
        [(1, 10.00001), (2, 5.0)], "id int, price double"
    ).createOrReplaceTempView("rd_s")
    spark.createDataFrame(
        [(1, 10.00002), (2, 6.0)], "id int, price double"
    ).createOrReplaceTempView("rd_t")
    strict = spark.sql(
        row_diff_query("SELECT * FROM rd_s", "SELECT * FROM rd_t", ["id"], ["price"])
    ).collect()[0]
    assert strict.full_match_count == 0
    loose = spark.sql(
        row_diff_query(
            "SELECT * FROM rd_s", "SELECT * FROM rd_t", ["id"], ["price"],
            decimal_columns=["price"], decimal_scale=4,
        )
    ).collect()[0]
    # 10.00001 vs 10.00002 normalize equal at 4 places; 5 vs 6 still differ.
    assert loose.full_match_count == 1 and loose.price_matches == 1
