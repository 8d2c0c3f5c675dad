"""Column-level lineage over parsed models."""

from __future__ import annotations

from sqlmesh_spark.core.lineage import column_lineage, transitive_column_lineage
from sqlmesh_spark.core.model import parse_model_text


def test_column_lineage_qualified():
    m = parse_model_text(
        """
MODEL (name demo.rev, kind FULL);
SELECT o.o_orderkey AS order_id,
       l.l_extendedprice * (1 - l.l_discount) AS revenue
FROM src.orders o JOIN src.lineitem l ON o.o_orderkey = l.l_orderkey
"""
    )
    lin = column_lineage(m)
    assert lin["order_id"] == {("src.orders", "o_orderkey")}
    assert lin["revenue"] == {
        ("src.lineitem", "l_extendedprice"),
        ("src.lineitem", "l_discount"),
    }


def test_column_lineage_single_relation_bare_columns():
    m = parse_model_text(
        "MODEL (name demo.agg, kind FULL);\n"
        "SELECT ds, SUM(revenue_cents) AS revenue_cents FROM demo.daily GROUP BY ds"
    )
    lin = column_lineage(m)
    assert lin["ds"] == {("demo.daily", "ds")}
    assert lin["revenue_cents"] == {("demo.daily", "revenue_cents")}


def test_transitive_lineage_to_sources():
    daily = parse_model_text(
        """
MODEL (name demo.daily, kind FULL);
SELECT o.o_orderdate AS ds, o.o_totalprice AS revenue_cents
FROM ext.orders o
"""
    )
    monthly = parse_model_text(
        "MODEL (name demo.monthly, kind FULL);\n"
        "SELECT ds, SUM(revenue_cents) AS revenue_cents FROM demo.daily GROUP BY ds"
    )
    models = {m.name: m for m in (daily, monthly)}
    srcs = transitive_column_lineage(models, "demo.monthly", "revenue_cents")
    assert srcs == {("ext.orders", "o_totalprice")}
    srcs_ds = transitive_column_lineage(models, "demo.monthly", "ds")
    assert srcs_ds == {("ext.orders", "o_orderdate")}


def test_macro_bearing_model_resolves_structurally(caplog):
    """A query the raw parser rejects (@macro tokens in clauses) must
    resolve through macro-expansion + structural parse, NOT the regex
    fallback — and the regex rung, when truly forced, logs a warning."""
    import logging

    from sqlmesh_spark.core.lineage import column_lineage
    from sqlmesh_spark.core.model import Model, ModelKind

    m = Model(
        name="db.m",
        kind=ModelKind.FULL,
        query=(
            "SELECT o.o_custkey AS cust, @IF(TRUE, o.o_totalprice, 0) AS price "
            "FROM db.orders o WHERE o.o_orderdate >= @start_ts"
        ),
    )
    with caplog.at_level(logging.WARNING, logger="sqlmesh_spark.lineage"):
        lin = column_lineage(m)
    assert lin["cust"] == {("db.orders", "o_custkey")}
    assert ("db.orders", "o_totalprice") in lin["price"]
    assert not caplog.records  # structural path: no fallback warning

    # Genuinely unparseable even after expansion → regex rung, loudly.
    broken = Model(name="db.broken", kind=ModelKind.FULL, query="SELECT FROM WHERE ((")
    with caplog.at_level(logging.WARNING, logger="sqlmesh_spark.lineage"):
        column_lineage(broken)
    assert any("regex resolver" in r.message for r in caplog.records)


def test_lint_undeclared_read_dialect():
    """The dialect-hygiene rule fires only for non-Spark function calls in
    models with NO dialect declaration."""
    from sqlmesh_spark.core.linter import undeclared_read_dialect
    from sqlmesh_spark.core.model import Model, ModelKind

    bad = Model(
        name="d.b", kind=ModelKind.FULL,
        query="SELECT strftime(ts, '%Y') AS y, epoch(ts) AS e FROM d.t",
    )
    msg = undeclared_read_dialect(bad)
    assert msg and "strftime" in msg and "dialect duckdb" in msg

    declared = Model(
        name="d.ok", kind=ModelKind.FULL, dialect="duckdb",
        query="SELECT strftime(ts, '%Y') AS y FROM d.t",
    )
    assert undeclared_read_dialect(declared) is None

    spark_sql = Model(
        name="d.s", kind=ModelKind.FULL,
        query="SELECT date_format(ts, 'yyyy') AS y FROM d.t",
    )
    assert undeclared_read_dialect(spark_sql) is None


def test_lint_dialect_rule_ignores_strings_and_comments():
    from sqlmesh_spark.core.linter import undeclared_read_dialect
    from sqlmesh_spark.core.model import Model, ModelKind

    m = Model(
        name="d.s", kind=ModelKind.FULL,
        query=(
            "SELECT 'call strftime(x) upstream' AS note "
            "-- string_agg(y, z)\nFROM d.t"
        ),
    )
    assert undeclared_read_dialect(m) is None
