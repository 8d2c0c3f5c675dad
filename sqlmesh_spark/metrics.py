"""Semantic-layer metric operator: METRIC(...) query rewriting.

Reference: metric definitions (sqlmesh/core/metric/definition.py:18,:68)
and the Rewriter (sqlmesh/core/metric/rewriter.py:21-120), which expands
metric references into per-source aggregate subqueries FULL-joined on the
shared dimensions. The same shape here: each source aggregates
independently (map-side partial aggs, one shuffle per source), then the
tiny per-dimension aggregates join — at scale the join inputs are
|dims| rows, not |facts|, so the FULL JOIN is effectively free.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping, Sequence


@dataclass(frozen=True)
class Metric:
    """A measure over a source relation (definition.py:68).

    Base metrics: ``expr`` is an aggregate SQL expression over the source.
    Derived metrics (definition.py derived/expanded metrics): ``source`` is
    None and ``expr`` references OTHER metric names — evaluated in the
    outer select after the per-source aggregates join.
    """

    name: str
    expr: str
    source: str | None = None  # key into the sources mapping; None = derived
    owner: str | None = None


def parse_metric_text(text: str, known_metrics: set[str] | None = None) -> list["Metric"]:
    """Parse METRIC(...) blocks (reference metric DDL,
    definition.py:18 load_metric_ddl; format as in
    examples/sushi/metrics/metrics.sql):

        METRIC (name total_orders, owner jen,
                expression COUNT(sch.orders.id));

    The SOURCE derives from the expression's fully-qualified
    ``schema.table.column`` references: exactly one table → a base metric
    over it (the per-source expr drops the table prefix); zero tables and
    references to other metric names → a derived metric; MULTIPLE tables
    → a composite source key whose join Context.evaluate_metrics derives
    from the models' shared grain (the reference's references/grain join
    graph).
    """
    import re as _re

    from sqlmesh_spark.core.model import _find_close, _parse_props, _unquote

    out: list[Metric] = []
    seen = set(known_metrics or set())
    pos = 0
    pat = _re.compile(r"\bMETRIC\s*\(", _re.IGNORECASE)
    while True:
        m = pat.search(text, pos)
        if not m:
            break
        open_idx = text.index("(", m.start())
        close_idx = _find_close(text, open_idx)
        props = _parse_props(text[open_idx + 1 : close_idx])
        pos = close_idx + 1
        name = _unquote(props["name"]).lower()
        expr = props["expression"].strip()
        # fully-qualified column refs → candidate source tables (string
        # literals stripped first: date_format(x, 'yyyy.MM.dd') must not
        # fabricate a bogus source table 'yyyy.mm')
        expr_no_str = _re.sub(r"'(?:[^']|'')*'", "''", expr)
        tables = {
            mm.group(1).lower()
            for mm in _re.finditer(
                r"\b([A-Za-z_][\w]*\.[A-Za-z_][\w]*)\.[A-Za-z_][\w]*\b", expr_no_str
            )
        }
        if tables:
            # Multi-table metrics carry a composite source key; the caller
            # (Context.evaluate_metrics) derives the join from the models'
            # shared grain — the reference's references/grain join graph
            # (metric/definition.py to_metric + rewriter join synthesis).
            source = "|".join(sorted(tables)) if len(tables) > 1 else next(iter(tables))
            # strip every table prefix so the expr runs inside the
            # (possibly joined) aggregate subquery
            local_expr = expr
            for t in tables:
                local_expr = _re.sub(
                    rf"\b{_re.escape(t)}\.([A-Za-z_][\w]*)\b", r"\1", local_expr,
                    flags=_re.IGNORECASE,
                )
            out.append(Metric(name, local_expr, source, owner=_unquote(props.get("owner", "")) or None))
        else:
            # derived: must reference at least one known metric name
            refs = {t.lower() for t in _re.findall(r"[A-Za-z_][\w]*", expr)}
            if not (refs & seen):
                raise ValueError(
                    f"metric {name!r} has no table references and no known "
                    "metric references — nothing to derive from"
                )
            out.append(Metric(name, expr, None, owner=_unquote(props.get("owner", "")) or None))
        seen.add(name)
    return out


def rewrite(
    metrics: Sequence[Metric],
    dimensions: Sequence[str],
    sources: Mapping[str, str],
) -> str:
    """Generate the joined-aggregates query for the requested metrics
    grouped by the shared dimensions (rewriter.py:21-120).

    Metrics from the same source share one aggregate subquery; subqueries
    are FULL-joined on the dimension tuple and dimension values COALESCEd.
    """
    if not metrics:
        raise ValueError("at least one metric required")
    derived = [m for m in metrics if m.source is None]
    metrics = [m for m in metrics if m.source is not None]
    if not metrics:
        raise ValueError(
            "derived metrics need at least one base (source-bound) metric to build on"
        )
    by_source: dict[str, list[Metric]] = {}
    for m in metrics:
        by_source.setdefault(m.source, []).append(m)

    dims = list(dimensions)
    subqueries = []
    for i, (source, ms) in enumerate(by_source.items()):
        sel = ", ".join(dims + [f"{m.expr} AS {m.name}" for m in ms])
        group = f" GROUP BY {', '.join(dims)}" if dims else ""
        subqueries.append((f"__t{i}", f"(SELECT {sel} FROM ({sources[source]}) src{group})"))

    first_alias = subqueries[0][0]
    from_clause = f"{subqueries[0][1]} AS {first_alias}"
    prev_aliases = [first_alias]
    for alias, sub in subqueries[1:]:
        on = " AND ".join(
            f"COALESCE({prev_aliases[0]}.{d}, {', '.join(f'{p}.{d}' for p in prev_aliases[1:])})"
            f" = {alias}.{d}"
            if len(prev_aliases) > 1
            else f"{prev_aliases[0]}.{d} = {alias}.{d}"
            for d in dims
        ) or "TRUE"
        from_clause += f" FULL OUTER JOIN {sub} AS {alias} ON {on}"
        prev_aliases.append(alias)

    dim_sel = ", ".join(
        f"COALESCE({', '.join(f'{a}.{d}' for a in prev_aliases)}) AS {d}" if len(prev_aliases) > 1
        else f"{prev_aliases[0]}.{d} AS {d}"
        for d in dims
    )
    metric_sel = ", ".join(
        f"{alias}.{m.name} AS {m.name}"
        for (alias, _), src in zip(subqueries, by_source.values())
        for m in src
    )
    select = ", ".join(x for x in (dim_sel, metric_sel) if x)
    inner = f"SELECT {select} FROM {from_clause}"
    if not derived:
        return inner
    # Derived metrics compose base metrics in an outer projection.
    outer_cols = ", ".join(
        [*dims, *(m.name for m in metrics), *(f"{m.expr} AS {m.name}" for m in derived)]
    )
    return f"SELECT {outer_cols} FROM ({inner}) base_metrics"


# ---------------------------------------------------------------------------
# Registry case
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from sqlmesh_spark.registry import register  # noqa: E402
from sqlmesh_spark.sources.tables import register_views  # noqa: E402

_SOURCES = {
    "order_facts": """
        SELECT c_nationkey, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "customer_dim": "SELECT c_nationkey, c_custkey, c_acctbal FROM customer",
}

_METRICS = (
    Metric(
        # Outer CAST: DuckDB SUM(BIGINT) is HUGEINT (-> pandas float64) while
        # Spark's is BIGINT; the driver's value-hash is dtype-sensitive.
        "total_revenue_cents",
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)",
        "order_facts",
    ),
    Metric("n_customers", "COUNT(DISTINCT c_custkey)", "customer_dim"),
    Metric(
        "n_positive_bal",
        "CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)",
        "customer_dim",
    ),
    # Derived: composes the two base metrics above (definition.py derived
    # metrics) — evaluated over the joined aggregates, identical doubles.
    Metric(
        "revenue_cents_per_customer",
        "ROUND(CAST(total_revenue_cents AS DOUBLE) / n_customers, 6)",
    ),
)

_METRIC_SQL = rewrite(_METRICS, ("c_nationkey",), _SOURCES)


@register("metric_rewrite", oracle=_METRIC_SQL, tags=("metric",))
def metric_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three metrics from two sources joined on a shared dimension — the
    generated SQL runs verbatim on both engines."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_METRIC_SQL)


METRIC_GRAIN_JOIN_ORACLE = """
SELECT o.o_orderstatus,
       CAST(SUM(CASE WHEN c.c_acctbal > 0
                     THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS active_revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_orderstatus
"""


@register("metric_grain_join", oracle=METRIC_GRAIN_JOIN_ORACLE, tags=("metric",))
def metric_grain_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A METRIC(...) whose expression spans two models, evaluated through
    Context with the join AUTO-DERIVED from the models' shared grain —
    the reference's references/grain join synthesis, end-to-end from the
    metric DDL text to the grouped result."""
    import tempfile

    from sqlmesh_spark.core.context import Context

    spark.sql("DROP DATABASE IF EXISTS sqlmesh__demo_mgj CASCADE")
    spark.sql("DROP DATABASE IF EXISTS env_mgj_views CASCADE")
    register_views(spark, sf_dir, ("orders", "customer"))
    ctx = Context(spark, state_dir=tempfile.mkdtemp(prefix="sqlmesh_state_"))
    ctx.add_model(
        "MODEL (name demo_mgj.ord, kind FULL, grain o_custkey);\n"
        "SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders"
    )
    ctx.add_model(
        "MODEL (name demo_mgj.cust, kind FULL, grain o_custkey);\n"
        "SELECT c_custkey AS o_custkey, c_acctbal FROM customer"
    )
    ctx.run(environment="env_mgj")
    for metric in parse_metric_text(
        """
METRIC (
  name active_revenue_cents,
  expression CAST(SUM(CASE WHEN demo_mgj.cust.c_acctbal > 0
                           THEN CAST(ROUND(demo_mgj.ord.o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT)
);
"""
    ):
        ctx.metrics[metric.name] = metric
    return ctx.evaluate_metrics(
        ["active_revenue_cents"], dimensions=["o_orderstatus"], environment="env_mgj"
    )
