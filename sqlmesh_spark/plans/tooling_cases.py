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
    # Violates invalid_select_star_expansion (star over an unknown schema);
    # bad.star above is the NON-violating control for that rule — its star
    # expands fine because ext.orders' schema is known.
    "bad.starexp": "MODEL (name bad.starexp, kind VIEW);\nSELECT * FROM missing.upstream",
    "good.view": (
        "MODEL (name good.view, kind VIEW);\nSELECT o_orderkey AS k FROM ext.orders"
    ),
}

LINT_ORACLE = """
SELECT * FROM (VALUES
  ('bad.dep', 'no_missing_external_models'),
  ('bad.noaudit', 'no_missing_audits'),
  ('bad.star', 'no_missing_audits'),
  ('bad.star', 'no_select_star'),
  ('bad.starexp', 'invalid_select_star_expansion'),
  ('bad.starexp', 'no_missing_external_models'),
  ('bad.starexp', 'no_select_star')
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
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
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


NESTED_TYPES_ORACLE = """
SELECT o_orderkey,
       o_orderstatus AS status,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
       YEAR(o_orderdate) AS order_year,
       2 AS n_tags,
       'priority:' || o_orderpriority AS tag1
FROM orders WHERE o_orderkey <= 1000
"""


@register("nested_types_roundtrip", oracle=NESTED_TYPES_ORACLE, tags=("tooling", "sources"))
def nested_types_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested types end-to-end (§1.2: ARRAY/MAP/STRUCT map recursively to
    Spark types — reference engine_adapter/spark.py:116-123): build a
    struct+array+map row per order, round-trip through parquet, then
    project nested fields back to scalars. Proves nested schemas survive
    storage and that field access (struct dot, array index, map key)
    prunes to scalar reads — at 100 TB parquet stores nested columns as
    separate leaf streams, so `info.status` reads ONE leaf, not the blob."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
        ).alias("info"),
        F.array(
            F.concat(F.lit("priority:"), F.col("o_orderpriority")),
            F.concat(F.lit("status:"), F.col("o_orderstatus")),
        ).alias("tags"),
        F.create_map(
            F.lit("year"), F.year("o_orderdate").cast("bigint")
        ).alias("attrs"),
    )
    out = os.path.join(scratch_dir("nested_types"), "orders_nested")
    nested.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.select(
        "o_orderkey",
        F.col("info.status").alias("status"),
        F.col("info.price_cents").alias("price_cents"),
        F.col("attrs")["year"].cast("int").alias("order_year"),
        F.size("tags").alias("n_tags"),
        F.element_at("tags", 1).alias("tag1"),
    )


ARRAY_HOF_ORACLE = """
SELECT o_orderkey,
       list_transform(generate_series(1, 5), x -> x * CAST(o_orderkey AS BIGINT))[3] AS third_multiple,
       len(list_filter(generate_series(1, 10), x -> x % 3 = 0)) AS n_div3,
       list_reduce(generate_series(1, 6), (a, b) -> a + b) AS tri6,
       list_sort(list_distinct([CAST(o_orderkey % 5 AS BIGINT), CAST(o_orderkey % 3 AS BIGINT), 1]))[1] AS min_mod
FROM orders WHERE o_orderkey <= 300
"""


@register("array_higher_order", oracle=ARRAY_HOF_ORACLE, tags=("relational", "functions"))
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform / filter / aggregate /
    array_distinct+sort) value-matched against DuckDB's list_* family —
    the in-row compute surface the llm/ operators build on. HOF lambdas
    are interpreted (not codegen'd): fine for bounded per-row arrays,
    which is why the big operators keep arrays bounded by document, never
    by corpus."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        F.element_at(
            F.transform(
                F.sequence(F.lit(1), F.lit(5)),
                lambda x: x.cast("bigint") * F.col("o_orderkey"),
            ),
            3,
        ).alias("third_multiple"),
        F.size(
            F.filter(F.sequence(F.lit(1), F.lit(10)), lambda x: x % 3 == 0)
        ).alias("n_div3"),
        F.aggregate(
            F.sequence(F.lit(1), F.lit(6)),
            F.lit(0).cast("bigint"),
            lambda a, b: a + b.cast("bigint"),
        ).alias("tri6"),
        F.element_at(
            F.array_sort(
                F.array_distinct(
                    F.array(
                        (F.col("o_orderkey") % 5).cast("bigint"),
                        (F.col("o_orderkey") % 3).cast("bigint"),
                        F.lit(1).cast("bigint"),
                    )
                )
            ),
            1,
        ).alias("min_mod"),
    )


PARTITION_PRUNE_ORACLE = """
SELECT strftime(o_orderdate, '%Y-%m-%d') AS ds, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
WHERE strftime(o_orderdate, '%Y-%m') = '1996-06'
GROUP BY strftime(o_orderdate, '%Y-%m-%d')
"""


@register("partition_pruned_scan", oracle=PARTITION_PRUNE_ORACLE, tags=("relational", "materialization"))
def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning end-to-end (`partitioned_by` → PARTITIONED BY →
    pruned scan; reference base.py:2713 builds the DDL, the engine prunes):
    orders written month-partitioned, then a one-month query — the
    physical plan must carry the partition predicate in PartitionFilters
    (asserted), meaning the scan reads 1/84 of the table's files. At
    100 TB this is THE difference between an interval query costing
    O(interval) and O(table)."""
    from sqlmesh_spark.operators.materialize_cases import _scratch_db

    db = _scratch_db(spark, "prune")
    o = load_table(spark, sf_dir, "orders")
    (
        o.withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
        .write.partitionBy("month")
        .mode("overwrite")
        .saveAsTable(f"{db}.orders_bymonth")
    )
    q = (
        spark.table(f"{db}.orders_bymonth")
        .filter(F.col("month") == "1996-06")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("ds"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("total_cents"),
        )
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(month" in plan or "month#" in plan.split(
        "PartitionFilters"
    )[1][:120], f"partition predicate must prune the scan:\n{plan[:1500]}"
    return q


CSV_CORRUPT_ORACLE = """
SELECT * FROM (VALUES
  (1, 'alpha', FALSE),
  (2, 'beta', FALSE),
  (NULL, 'gamma', TRUE),
  (4, NULL, TRUE),
  (5, 'epsilon', TRUE)
) AS t(id, name, is_corrupt)
"""

_CSV_BAD = "id,name\n1,alpha\n2,beta\nxx,gamma\n4\n5,epsilon,extra\n"


@register("source_csv_corrupt_records", oracle=CSV_CORRUPT_ORACLE, tags=("tooling", "sources"))
def source_csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input handling on the CSV source path (PERMISSIVE +
    columnNameOfCorruptRecord): type mismatches, short rows, and
    extra-column rows all surface the raw line in the corrupt column
    instead of killing the job — at 100 TB, quarantine-and-continue is the
    only viable ingest posture; the corrupt column routes bad lines to a
    dead-letter sink while good fields still load."""
    out = os.path.join(scratch_dir("csv_corrupt"), "bad")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "part.csv"), "w") as f:
        f.write(_CSV_BAD)
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema("id int, name string, _corrupt string")
        .csv(out)
    )
    return df.select(
        "id", "name", F.col("_corrupt").isNotNull().alias("is_corrupt")
    )
