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
