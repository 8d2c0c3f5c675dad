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
