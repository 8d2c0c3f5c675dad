"""Driver-visible cases for the tooling surface that was previously
tests-only: column lineage, linter rules, and non-parquet source formats.

Each returns a deterministic DataFrame with a literal-VALUES DuckDB oracle
(lineage/linter: the expected analysis output is a fixed relation; sources:
the round-tripped rows must equal the original parquet), so the driver's
hash gate covers them like any relational case.

Reference parity: column lineage sqlmesh/core/lineage.py:1-114; linter
rules sqlmesh/core/linter/rules/builtin.py (NoSelectStar:31,
NoMissingAudits:111, NoMissingExternalModels:147,
NoAmbiguousProjections:292); CSV seeds sqlmesh/core/model/seed.py:91.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlmesh_spark.registry import register
from sqlmesh_spark.session import scratch_dir
from sqlmesh_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Column lineage as a relation
# --------------------------------------------------------------------------

_LINEAGE_MODELS = {
    "demo.daily": """
MODEL (name demo.daily, kind FULL);
SELECT o.o_orderdate AS ds,
       l.l_extendedprice * (1 - l.l_discount) AS revenue,
       o.o_custkey AS cust
FROM ext.orders o JOIN ext.lineitem l ON o.o_orderkey = l.l_orderkey
""",
    "demo.monthly": """
MODEL (name demo.monthly, kind FULL);
SELECT ds, SUM(revenue) AS revenue FROM demo.daily GROUP BY ds
""",
}

LINEAGE_ORACLE = """
SELECT * FROM (VALUES
  ('demo.monthly', 'ds', 'ext.orders', 'o_orderdate'),
  ('demo.monthly', 'revenue', 'ext.lineitem', 'l_discount'),
  ('demo.monthly', 'revenue', 'ext.lineitem', 'l_extendedprice')
) AS t(model, column_name, source_table, source_column)
"""


@register("lineage_column_graph", oracle=LINEAGE_ORACLE, tags=("tooling",))
def lineage_column_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive column lineage of demo.monthly down to external sources,
    returned as (model, column, source_table, source_column) rows."""
    from sqlmesh_spark.core.lineage import transitive_column_lineage
    from sqlmesh_spark.core.model import parse_model_text

    models = {}
    for text in _LINEAGE_MODELS.values():
        m = parse_model_text(text)
        models[m.name] = m
    rows = []
    for col in ("ds", "revenue"):
        for src_table, src_col in sorted(
            transitive_column_lineage(models, "demo.monthly", col)
        ):
            rows.append(("demo.monthly", col, src_table, src_col))
    return spark.createDataFrame(
        rows, "model string, column_name string, source_table string, source_column string"
    )


# --------------------------------------------------------------------------
# Linter verdicts as a relation
# --------------------------------------------------------------------------

_LINT_MODELS = {
    "bad.star": "MODEL (name bad.star, kind FULL);\nSELECT * FROM ext.orders",
    "bad.noaudit": "MODEL (name bad.noaudit, kind FULL);\nSELECT o_orderkey AS k FROM ext.orders",
    "bad.dep": "MODEL (name bad.dep, kind VIEW);\nSELECT k FROM missing.upstream",
    "good.view": (
        "MODEL (name good.view, kind VIEW);\nSELECT o_orderkey AS k FROM ext.orders"
    ),
}

LINT_ORACLE = """
SELECT * FROM (VALUES
  ('bad.dep', 'no_missing_external_models'),
  ('bad.noaudit', 'no_missing_audits'),
  ('bad.star', 'no_missing_audits'),
  ('bad.star', 'no_select_star')
) AS t(model, rule)
"""


@register("linter_violations", oracle=LINT_ORACLE, tags=("tooling",))
def linter_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builtin lint rules over a fixture project; violations as rows.
    External refs under ext.* are declared known, missing.upstream is not."""
    from sqlmesh_spark.core.linter import lint_models
    from sqlmesh_spark.core.model import parse_model_text

    models = {}
    for text in _LINT_MODELS.values():
        m = parse_model_text(text)
        models[m.name] = m
    # ext.* sources count as known external models for the dependency rule.
    known = dict(models)
    for ext in ("ext.orders", "ext.lineitem"):
        known[ext] = models["good.view"]
    violations = lint_models(known)
    rows = sorted(
        {(v.model, v.rule) for v in violations if v.model in _LINT_MODELS}
    )
    return spark.createDataFrame(rows, "model string, rule string")


# --------------------------------------------------------------------------
# Non-parquet sources: CSV and JSON round-trips vs the parquet oracle
# --------------------------------------------------------------------------

NATION_ORACLE = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """Write nation out in `fmt`, read it back with an explicit schema —
    proving the source connector path (schema projection, header/format
    options) against the parquet truth. Distributed end to end: the write
    and read are Spark jobs, never a driver-side collect. The scratch
    files stay on disk (tmp) because the returned DataFrame is lazy —
    the driver evaluates it after this function returns."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = os.path.join(scratch_dir(f"src_{fmt}"), "nation")
    writer = n.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(out)
        return (
            spark.read.option("header", True)
            .schema("n_nationkey bigint, n_name string, n_regionkey bigint")
            .csv(out)
        )
    writer.json(out)
    return spark.read.schema(
        "n_nationkey bigint, n_name string, n_regionkey bigint"
    ).json(out)


@register("source_csv_roundtrip", oracle=NATION_ORACLE, tags=("tooling", "sources"))
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "csv")


@register("source_json_roundtrip", oracle=NATION_ORACLE, tags=("tooling", "sources"))
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "json")


@register("source_orc_roundtrip", oracle=NATION_ORACLE, tags=("tooling", "sources"))
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source connector (columnar like parquet: predicate pushdown +
    column pruning apply identically; `storage_format orc` is a
    first-class model option in the reference — model/meta.py:95)."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = os.path.join(scratch_dir("src_orc"), "nation")
    n.write.mode("overwrite").orc(out)
    return spark.read.schema(
        "n_nationkey bigint, n_name string, n_regionkey bigint"
    ).orc(out)


BUCKETED_JOIN_ORACLE = """
SELECT o_custkey AS custkey,
       COUNT(*) AS n_orders,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents,
       CAST(ANY_VALUE(c_mktsegment) AS VARCHAR) AS segment
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey
"""


@register("bucketed_join_colocated", oracle=BUCKETED_JOIN_ORACLE, tags=("relational", "materialization"))
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (`clustered_by` / CLUSTERED BY ... INTO
    BUCKETS — model/meta.py:94): both tables are written bucketed+sorted
    on the join key, so the join AND the following same-key aggregation
    plan with ZERO Exchange operators — asserted against the physical
    plan, not just claimed. At 100 TB this is the difference between
    re-shuffling both fact tables on every join and reading co-located
    buckets; the one-time bucketing cost amortizes across every
    subsequent key-aligned join/agg.
    """
    from sqlmesh_spark.operators.materialize_cases import _scratch_db

    db = _scratch_db(spark, "bucketed")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    for name, df, key in (("orders_b", o, "o_custkey"), ("customer_b", c, "c_custkey")):
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .mode("overwrite")
            .saveAsTable(f"{db}.{name}")
        )
    ob, cb = spark.table(f"{db}.orders_b"), spark.table(f"{db}.customer_b")
    # hint("merge") pins sort-merge (at fact×fact scale Catalyst picks it
    # anyway; on this small fixture it would broadcast) so the plan shows
    # the property that matters: bucketed SMJ with NO shuffle exchange on
    # either side, and the same-key aggregation reuses the bucketing too.
    joined = (
        ob.join(cb.hint("merge"), ob.o_custkey == cb.c_custkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("total_cents"),
            F.any_value("c_mktsegment").alias("segment"),
        )
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, (
        f"bucketed join/agg must be shuffle-free:\n{plan[:2000]}"
    )
    assert "SortMergeJoin" in plan
    return joined
