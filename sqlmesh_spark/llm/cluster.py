"""Dedup clustering: connected components over near-duplicate pairs.

Pairwise dedup (MinHash/SimHash) yields edges; keeping one doc per
*cluster* needs the transitive closure — A~B, B~C ⇒ {A,B,C} dedupe
together. This is the step most pair-level dedup pipelines bolt on with a
driver-side union-find, which dies at 100 TB; here it is distributed
min-label propagation:

    label(v) ← min(label(v), min over neighbors' labels)

iterated to fixpoint. Each round is one join + one aggregate (both shuffle
on doc id); rounds ≤ cluster diameter, and each iteration localCheckpoints
to truncate lineage (the classic iterative-Spark failure mode is a plan
that doubles every round). At extreme diameters the same loop upgrades to
large-star/small-star (Kiveris et al., "Connected Components in MapReduce
and Beyond") — identical per-round shape, O(log n) rounds.

The DuckDB oracle computes the same components with a recursive CTE, so
even the iterative operator gets a value-level hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlmesh_spark.llm.dedup import minhash_lsh_sql, minhash_lsh_wide_sql
from sqlmesh_spark.registry import register
from sqlmesh_spark.sources.tables import register_views


def connected_components(
    edges: DataFrame, src: str = "d1", dst: str = "d2", max_iter: int = 25
) -> DataFrame:
    """(doc_id, component) with component = min doc id reachable via
    undirected edges. Isolated nodes absent from `edges` are absent here
    (callers union them back if needed)."""
    both = edges.selectExpr(f"{src} AS u", f"{dst} AS v").unionByName(
        edges.selectExpr(f"{dst} AS u", f"{src} AS v")
    )
    both = both.distinct().localCheckpoint()
    labels = (
        both.select("u").distinct().select(F.col("u"), F.col("u").alias("component"))
    )
    for _ in range(max_iter):
        # labels derives from `both`; alias both sides so the self-join
        # columns resolve unambiguously.
        neighbor_min = (
            both.alias("e")
            .join(labels.alias("l"), F.col("e.v") == F.col("l.u"))
            .groupBy(F.col("e.u").alias("u"))
            .agg(F.min("l.component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("component"), F.coalesce("nmin", F.col("component"))
                ).alias("component"),
                (F.coalesce("nmin", F.col("component")) < F.col("component")).alias(
                    "changed"
                ),
            )
        )
        # Truncate lineage each round; one small driver-side count gates
        # convergence (the count is O(1) rows — an agg, not a collect of data).
        new_labels = new_labels.localCheckpoint()
        n_changed = new_labels.filter("changed").count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    return labels.select(F.col("u").alias("doc_id"), "component")


CLUSTER_ORACLE = (
    """
WITH RECURSIVE pairs AS ("""
    + minhash_lsh_sql("documents", dialect="duckdb")
    + """),
edges AS (
  SELECT d1 AS u, d2 AS v FROM pairs
  UNION
  SELECT d2 AS u, d1 AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
)
SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY u
"""
)


@register("dedup_cluster_components", oracle=CLUSTER_ORACLE, tags=("llm", "dedup"))
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Components over the MinHash-LSH near-dup pairs: the full
    shingle→LSH→verify→transitive-closure dedup pipeline as one case."""
    from sqlmesh_spark.llm.dedup import docset_sql, spread_scan

    register_views(spark, sf_dir, ("documents",))
    docs = spread_scan(spark, "documents", "cc_docs")
    n_part = max(spark.sparkContext.defaultParallelism, 8)
    ds = spark.sql(docset_sql(docs, 5)).repartition(n_part, "doc_id")
    ds.cache().createOrReplaceTempView("cc_docsets")
    pairs = spark.sql(minhash_lsh_wide_sql(docs, docsets_relation="cc_docsets"))
    return connected_components(pairs)
