"""Macro engine: render-level unit tests + DuckDB parity."""

from __future__ import annotations

import pytest

from sqlmesh_spark.macros import (
    Lambda,
    MacroEvaluator,
    render_sql,
    split_top_level,
    temporal_variables,
)
from sqlmesh_spark.parity import compare_case
from sqlmesh_spark.registry import load_all


def _cases():
    return [(n, c) for n, c in load_all().items() if "macro" in c.tags]


@pytest.mark.parametrize("name,case", _cases(), ids=lambda x: x if isinstance(x, str) else "")
def test_macro_parity(spark, sf_dir, name, case):
    r = compare_case(spark, sf_dir, name, case.fn, case.oracle)
    assert r["match"], r["detail"]


def test_split_top_level_respects_nesting():
    assert split_top_level("a, f(b, c), [d, e]") == ["a", "f(b, c)", "[d, e]"]
    assert split_top_level("'a,b', c") == ["'a,b'", "c"]


def test_lambda_word_boundary():
    lam = Lambda.parse("x -> max(x) AS sum_@{x}")
    assert lam.apply("col") == "max(col) AS sum_col"


def test_if_and_vars():
    ev = MacroEvaluator(variables={"flag": 1, "name": "abc"})
    assert ev.render("SELECT @IF(1 > 2, a, b), @name") == "SELECT b, abc"


def test_temporal_variables():
    v = temporal_variables("2024-01-01", "2024-01-31 12:00:00")
    assert v["start_ds"] == "'2024-01-01'"
    assert v["end_ts"] == "'2024-01-31 12:00:00'"
    assert v["start_epoch"] == "1704067200"


def test_render_sql_interval_substitution():
    out = render_sql(
        "SELECT * FROM t WHERE d >= @start_ds AND d < @end_ds",
        start="2024-01-01",
        end="2024-02-01",
    )
    assert out == "SELECT * FROM t WHERE d >= '2024-01-01' AND d < '2024-02-01'"


def test_custom_macro_registration():
    ev = MacroEvaluator()
    ev.register("SHOUT", lambda args, _: f"UPPER({args[0]})")
    assert ev.render("SELECT @SHOUT(name) FROM t") == "SELECT UPPER(name) FROM t"


def test_nested_macros():
    ev = MacroEvaluator()
    out = ev.render("@REDUCE(@FILTER([1,2,3,4,5], x -> x % 2 == 1), (a,b) -> a + b)")
    assert out == "1 + 3 + 5"


def test_render_comment_aware():
    """An apostrophe in a -- comment must not open a phantom string
    literal that swallows macro expansion after it."""
    from sqlmesh_spark.macros import MacroEvaluator

    ev = MacroEvaluator(variables={"start_ds": "'2024-01-01'"})
    out = ev.render("SELECT 1 -- user's note\nFROM t WHERE ds = @start_ds")
    assert "'2024-01-01'" in out
    out2 = ev.render("SELECT 1 /* it's fine */ , @start_ds AS d")
    assert "'2024-01-01'" in out2


def test_each_with_regex_backslash_arg():
    from sqlmesh_spark.macros import MacroEvaluator

    out = MacroEvaluator().render("SELECT @EACH(['^\\d+$'], p -> col RLIKE p) FROM t")
    assert "RLIKE '^\\d+$'" in out


def test_pivot_requotes_embedded_quote():
    from sqlmesh_spark.macros import MacroEvaluator

    out = MacroEvaluator().render("SELECT @PIVOT(n, ['O''Brien']) FROM t")
    assert "= 'O''Brien'" in out
