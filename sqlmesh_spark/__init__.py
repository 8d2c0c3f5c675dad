"""sqlmesh_spark — a PySpark-native data-transformation engine.

A from-scratch engine with the query and data-processing capabilities of
SQLMesh (reference: TobikoData/sqlmesh), re-expressed Spark-first:

- Materialization operators (incremental by time / key / partition, full
  refresh, views, seeds, SCD Type 2) execute as Spark SQL / DataFrame
  writes — ``sqlmesh_spark.adapter`` / ``sqlmesh_spark.materializations``.
- Macro operators (@DEDUPLICATE, @DATE_SPINE, @PIVOT, @STAR, ...) emit
  Spark SQL — ``sqlmesh_spark.macros``.
- Data-quality audits run as Spark SQL queries returning violating rows —
  ``sqlmesh_spark.audits``.
- Diff operators (schema diff, row-level table diff) — ``sqlmesh_spark.diff``.
- Semantic-layer metric rewriting — ``sqlmesh_spark.metrics``.
- Orchestration (models, snapshots, intervals, scheduler, plan/apply,
  virtual environments) — ``sqlmesh_spark.core``.
- Large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) — ``sqlmesh_spark.llm``.

Everything here is designed for a multi-executor cluster at 100 TB scale
(broadcast joins for dims, partition-pruned incremental writes, AQE) even
though tests run on local[*].
"""

__version__ = "0.1.0"
