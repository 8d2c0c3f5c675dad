"""NULL/OOB/empty-edge parity sweep across the read-dialect function maps.

For every mapped function family whose source semantics DuckDB can
express natively, an edge expression is evaluated BOTH ways — DuckDB
running the original dialect text, Spark running the transpiled text —
and the values must agree (the same gate the driver's CORRECTNESS check
applies to whole queries). Reference parity target: the reference
renders any SQLGlot read dialect and executes on the engine
(renderer.py:517); these tests pin the seams where a naive rename would
be silently wrong on Spark 4's ANSI defaults.

Families covered: subscripts/list_extract (NULL OOB + index 0),
division family (/, //, %, mod, fdiv, fmod, divide — NULL on zero
divisor), exponentiation (^ and ** are POWER, not XOR), string edges
(strpos no-match, substr virtual/negative positions, left/right
negative n, split_part OOB, lpad truncation), concat NULL-skipping,
array aggregation NULL-keeping and NULL-on-empty, list_distinct
NULL-dropping, list_concat NULL-skipping, date_part field fixes
(dow/isodow/epoch/second/micro/milliseconds, both date_part and
extract spellings, plus the weekday/dayofweek function spellings),
string predicates, and TRY_CAST.

A final section PINS the documented divergences — places where DuckDB
raises but Spark yields NULL/NaN (log/ln/sqrt of non-positives), or
where the semantics are statically untypeable (CAST rounding modes,
postgres integer `/`) — so any behavior drift is caught. Each is the
reference's own behavior when executing a duckdb-dialect model on
Spark (SQLGlot leaves these constructs unchanged), i.e. divergence
from DuckDB-native, parity with the reference.
"""

from __future__ import annotations

import math

import decimal

import duckdb
import pytest

from sqlmesh_spark.core.transpile import TranspileError, transpile

# (expression, read dialect) — evaluated in DuckDB natively and in Spark
# after transpile; values must match. DuckDB is the oracle for both the
# duckdb and postgres cases below ONLY where the two engines agree on
# the construct (postgres-divergent constructs get their own cases).
EDGES = [
    # --- subscripts & element extraction (NULL out of bounds AND index 0)
    "([1,2,3])[10]",
    "([1,2,3])[0]",
    "([1,2,3])[-1]",
    "list_extract([1,2,3], 10)",
    "list_extract([1,2,3], 0)",
    "array_extract([1,2,3], -1)",
    # --- division family: NULL on zero divisor (Spark ANSI raises bare)
    "1 // 0",
    "7 // 2",
    "-7 // 2",
    "1.0 / 0",
    "7 / 2",
    "7 % 0",
    "-7 % 2",
    "1.5 % 0",
    "mod(7, 0)",
    "mod(-7, 2)",
    "fdiv(7, 2)",
    "fdiv(7, 0)",
    "fmod(7.5, 2)",
    "fmod(7.5, 0)",
    "divide(7, 0)",
    "divide(7, 2)",
    # --- exponentiation: duckdb/postgres ^ is POWER (Spark ^ is XOR)
    "2 ^ 3",
    "2 ^ 3 ^ 2",
    "-2 ^ 2",
    "2 ^ -2",
    "2 ** 3",
    "(1 + 1) ^ 3",
    # --- string edges
    "strpos('abcdef', 'zz')",
    "strpos('', 'a')",
    "substr('hello', 0, 3)",
    "substr('hello', 0, 1)",
    "substr('hello', -2, 3)",
    "substr('hello', -2, 10)",
    "substr('hello', -9, 3)",
    "substr('hello', 2, -1)",
    "substr('hello', 2, 3)",
    "substring('hello', 0, 2)",
    "substr('hello', 0)",
    "substr('hello', -2)",
    "left('hello', -2)",
    "left('hello', -9)",
    "left('hello', 2)",
    "left('hello', 0)",
    "right('hello', -2)",
    "right('hello', -9)",
    "right('hello', 2)",
    "right('hello', 9)",
    "split_part('a|b|c', '|', 5)",
    "split_part('', '|', 1)",
    "lpad('abc', 2, 'x')",
    "rpad('abc', 0, 'x')",
    "repeat('ab', -1)",
    "starts_with('abc', '')",
    "ends_with('abc', 'c')",
    "suffix('abc', 'c')",
    "prefix('abc', 'a')",
    # --- concat: casts args to text and SKIPS NULLs
    "concat('a', NULL)",
    "concat(NULL, NULL)",
    "concat('a', 1, NULL, 'b')",
    "concat_ws(',', 'a', NULL, 'b')",
    # --- arrays
    "list_concat([1], NULL)",
    "list_concat(NULL, [2])",
    "list_concat([1], [2])",
    "array_cat([1], NULL)",
    "list_distinct([3,1,3,NULL])",
    "list_sort([3,1,NULL])",
    "array_position([1,2,3], 9)",
    "list_contains([1,2], NULL)",
    "list_contains([1,2], 2)",
    # --- aggregates (keep NULL elements; NULL, not [], on empty)
    "(SELECT array_agg(v) FROM (VALUES (1),(NULL),(2)) t(v))",
    "(SELECT array_agg(v) FROM (VALUES (1)) t(v) WHERE FALSE)",
    "(SELECT array_agg(DISTINCT v) FROM (VALUES (1),(1),(NULL)) t(v))",
    "(SELECT array_agg(v) FILTER (WHERE v > 99) FROM (VALUES (1)) t(v))",
    "(SELECT list(v) FROM (VALUES (1),(NULL)) t(v))",
    # --- date_part / extract field semantics
    "date_part('dow', DATE '2024-01-07')",
    "date_part('dow', DATE '2024-01-08')",
    "date_part('dow', DATE '2024-01-13')",
    "date_part('weekday', DATE '2024-01-07')",
    "date_part('isodow', DATE '2024-01-07')",
    "date_part('isodow', DATE '2024-01-08')",
    "date_part('epoch', TIMESTAMP '1969-12-31 23:59:59')",
    "date_part('epoch', TIMESTAMP '2024-01-02 03:04:05.25')",
    "date_part('second', TIMESTAMP '2024-01-01 00:00:01.5')",
    "date_part('seconds', TIMESTAMP '2024-01-01 00:00:01.5')",
    "date_part('microseconds', TIMESTAMP '2024-01-01 00:00:01.5')",
    "date_part('milliseconds', TIMESTAMP '2024-01-01 00:00:01.5')",
    "extract(dow FROM DATE '2024-01-07')",
    "extract(isodow FROM DATE '2024-01-08')",
    "extract(epoch FROM DATE '2024-01-02')",
    "weekday(DATE '2024-01-07')",
    "dayofweek(DATE '2024-01-08')",
    "date_part('year', DATE '2024-01-07')",
    # --- interval arithmetic
    "date_add(DATE '2024-01-31', INTERVAL 1 MONTH)",
    "date_add(TIMESTAMP '2024-01-31 01:00:00', INTERVAL 1 MONTH)",
    # --- casts
    "TRY_CAST('abc' AS INT)",
    "TRY_CAST('' AS INT)",
    "CAST('  42  ' AS INT)",
    # --- misc numeric
    "greatest(1, NULL, 3)",
    "least(NULL, NULL)",
    "round(2.5)",
    "round(-2.5)",
    "sign(-0.0)",
    "power(0, -1)",
    "exp(1000)",
    "nullif(1, 1)",
]


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        # duckdb list_distinct/array_agg(DISTINCT) element ORDER is
        # unspecified — compare as multisets
        return sorted(((x is None, x) for x in v), key=repr)
    return v


@pytest.mark.parametrize("expr", EDGES, ids=lambda e: e[:48])
def test_duckdb_edge_value_parity(spark, expr):
    q = f"SELECT {expr} AS v"
    duck_v = duckdb.sql(q).fetchall()[0][0]
    sq = transpile(q, "duckdb")
    # text-level fixpoint: re-transpiling transpiled output is a no-op
    assert transpile(sq, "duckdb") == sq, f"not a fixpoint: {sq}"
    spark_v = spark.sql(sq).collect()[0][0]
    # repr equality catches None-vs-0 etc.; numeric equality admits the
    # benign dtype widenings (Decimal 1.5 vs float 1.5, -0.0 vs 0)
    assert repr(_norm(duck_v)) == repr(_norm(spark_v)) or _norm(duck_v) == _norm(spark_v), (
        f"{expr}: duck={duck_v!r} spark={spark_v!r}\n  transpiled: {sq}"
    )


# postgres-specific: substr keeps negative starts virtual (no
# from-end), zero division RAISES (matching Spark ANSI — no rewrite),
# and like duckdb unary minus binds TIGHTER than ^ (-2 ^ 2 = 4;
# verified live on PostgreSQL 15).
PG_CASES = [
    ("SELECT -2 ^ 2 AS v", 4.0),
    ("SELECT 2 ^ 3 ^ 2 AS v", 64.0),
    ("SELECT substring('hello', -2, 3) AS v", ""),
    ("SELECT substring('hello', 0, 3) AS v", "he"),
    ("SELECT substring('hello', 2, 3) AS v", "ell"),
    ("SELECT left('hello', -2) AS v", "hel"),
    ("SELECT concat('a', NULL) AS v", "a"),
    ("SELECT array_cat(ARRAY[1], NULL) AS v", [1]),
]


@pytest.mark.parametrize("q,expected", PG_CASES, ids=lambda c: str(c)[:40])
def test_postgres_edge_values(spark, q, expected):
    sq = transpile(q, "postgres")
    assert transpile(sq, "postgres") == sq
    assert spark.sql(sq).collect()[0][0] == expected


def test_postgres_division_raises_like_ansi(spark):
    # postgres raises on division by zero — exactly Spark ANSI; the
    # divisor must NOT be nullif-wrapped for postgres reads
    assert transpile("SELECT a / b FROM t", "postgres") == "SELECT a / b FROM t"
    assert transpile("SELECT a % b FROM t", "postgres") == "SELECT a % b FROM t"


def test_unscoped_caret_is_loud():
    # a ^ whose operand shape the rewrite cannot scope must fail loud —
    # letting it through would evaluate XOR
    with pytest.raises(TranspileError, match="exponentiation"):
        transpile("SELECT 2 ^ * FROM t", "duckdb")


def test_array_agg_order_by_maps_round11():
    """In-aggregate ORDER BY maps since round 11 (wave 53, both
    engines live): comparator array_sort over (_k, _v) struct pairs.
    duck's default_null_order is nulls_last for BOTH directions where
    pg flips to NULLS FIRST on DESC — the comparator encodes the
    read's default. Multi-key and DISTINCT+ORDER stay loud."""
    q = transpile("SELECT array_agg(x ORDER BY x) FROM t", "duckdb")
    assert "array_sort" in q and "_l._k" in q
    assert q == transpile(q, "duckdb")
    pg_desc = transpile(
        "SELECT array_agg(x ORDER BY y DESC) FROM t", "postgres")
    duck_desc = transpile(
        "SELECT array_agg(x ORDER BY y DESC) FROM t", "duckdb")
    # pg DESC default NULLS FIRST: NULL key sorts before (-1 left);
    # duck DESC default nulls_last: NULL key sorts after
    assert "WHEN _l._k IS NULL THEN -1" in pg_desc
    assert "WHEN _l._k IS NULL THEN 1" in duck_desc
    with pytest.raises(TranspileError, match="multi-key"):
        transpile("SELECT array_agg(x ORDER BY y, z) FROM t", "duckdb")
    with pytest.raises(TranspileError, match="DISTINCT"):
        transpile(
            "SELECT array_agg(DISTINCT x ORDER BY x) FROM t", "postgres")


def test_gcd_lcm_are_loud():
    for fn in ("gcd", "lcm"):
        with pytest.raises(TranspileError):
            transpile(f"SELECT {fn}(12, 8) FROM t", "duckdb")


# ---------------------------------------------------------------------------
# PINNED DIVERGENCES — reference-matching behavior that differs from
# DuckDB-native execution. The reference transpiles dialect SQL via
# SQLGlot, which leaves these constructs unchanged, so a duckdb-dialect
# model executed on the Spark engine behaves exactly as below. Each is
# either an engine-raises-vs-NULL asymmetry in the LOUDER direction or a
# statically-untypeable cast/operator. Pinned so drift is caught.
# ---------------------------------------------------------------------------

def test_pinned_log_family_null_where_duck_raises(spark):
    # DuckDB raises out-of-range for log/ln/log10(<=0) and sqrt(<0);
    # Spark returns NULL (log family) / NaN (sqrt). Succeeding with
    # NULL where duck would abort the whole query is the documented,
    # reference-matching behavior.
    for expr, expected in [
        ("log(0)", None),
        ("ln(0)", None),
        ("log10(-1)", None),
    ]:
        with pytest.raises(Exception):
            duckdb.sql(f"SELECT {expr}").fetchall()
        assert spark.sql(transpile(f"SELECT {expr} AS v", "duckdb")).collect()[0][0] is expected
    assert math.isnan(
        spark.sql(transpile("SELECT sqrt(-1) AS v", "duckdb")).collect()[0][0]
    )


def test_pinned_cast_rounding_divergence(spark):
    # DuckDB/postgres CAST(fractional AS INT) ROUNDS (decimal: half
    # away from zero; double: half to even); Spark truncates toward
    # zero. CAST and `::` now wrap the castee in round() — Spark round
    # is type-preserving (BIGINT/DECIMAL stay exact, no 2^53 double
    # roundtrip) and half-away-from-zero, matching the source engines'
    # NUMERIC behavior.
    assert duckdb.sql("SELECT CAST(2.7 AS INT)").fetchall()[0][0] == 3
    sq = transpile("SELECT CAST(2.7 AS INT) AS v", "duckdb")
    assert spark.sql(sq).collect()[0][0] == 3
    assert spark.sql(transpile("SELECT (-2.5)::int AS v", "postgres")) \
        .collect()[0][0] == -3
    # (a) TRY_CAST is now FAITHFUL on duckdb reads (round 8): the
    # DECIMAL(38,9) round-trip parses-then-rounds like duckdb
    # (try_cast('3.9' AS INT) = 4, exact for every int64) while
    # keeping NULL-on-garbage; (b) DOUBLE-typed midpoints round
    # half-even in the source engines — STATICALLY float-typed
    # castees (::float8 chains, CAST(... AS DOUBLE), random()) wrap
    # in bround() and are FAITHFUL; only float-typed COLUMNS
    # (statically invisible) keep the half-away round() wrap.
    assert duckdb.sql("SELECT TRY_CAST('abc' AS INT)").fetchall()[0][0] is None
    sq2 = transpile("SELECT TRY_CAST(2.7 AS INT) AS v", "duckdb")
    assert spark.sql(sq2).collect()[0][0] == 3  # faithful: duck gives 3
    assert spark.sql(
        transpile("SELECT TRY_CAST('abc' AS INT) AS v", "duckdb")
    ).collect()[0][0] is None
    assert duckdb.sql("SELECT CAST(CAST(2.5 AS DOUBLE) AS INT)").fetchall()[0][0] == 2
    sq3 = transpile("SELECT CAST(CAST(2.5 AS DOUBLE) AS INT) AS v", "duckdb")
    assert "bround" in sq3
    assert spark.sql(sq3).collect()[0][0] == 2  # faithful: half-even both
    # (c) duckdb DECIMAL scale-reduction TRUNCATES toward zero
    # (123.4567::DECIMAL(18,3) = 123.456, 1.995::DECIMAL(10,2) = 1.99 —
    # verified live) where Spark and pg ROUND half-up. Round 9: decimal
    # LITERAL castees now quantize STATICALLY (ROUND_DOWN) so the
    # provable case is faithful; only decimal-typed COLUMN castees keep
    # the pass-through divergence (statically invisible — SQLGlot and
    # the reference pass those through identically).
    assert duckdb.sql(
        "SELECT 123.4567::DECIMAL(18,3)"
    ).fetchall()[0][0] == decimal.Decimal("123.456")
    sqd = transpile("SELECT 123.4567::DECIMAL(18,3) AS v", "duckdb")
    assert "CAST(123.456 AS DECIMAL(18,3))" in sqd
    assert spark.sql(sqd).collect()[0][0] == decimal.Decimal("123.456")
    # big integers survive the wrap exactly (round is type-preserving)
    sq4 = transpile("SELECT CAST(x AS BIGINT) AS v FROM (SELECT CAST(9007199254740993 AS BIGINT) AS x)", "duckdb")
    assert spark.sql(sq4).collect()[0][0] == 9007199254740993


def test_pinned_date_trunc_date_type_divergence(spark):
    # duck date_trunc('week', DATE) returns DATE; Spark date_trunc
    # always returns TIMESTAMP — same instant, different type. Value
    # parity holds after an explicit CAST (what fixtures do).
    sq = transpile(
        "SELECT CAST(date_trunc('week', DATE '2024-01-07') AS DATE) AS v",
        "duckdb",
    )
    import datetime

    assert spark.sql(sq).collect()[0][0] == datetime.date(2024, 1, 1)
    assert duckdb.sql(
        "SELECT CAST(date_trunc('week', DATE '2024-01-07') AS DATE) AS v"
    ).fetchall()[0][0] == datetime.date(2024, 1, 1)


# MySQL: division/modulo by zero are NULL (non-strict default, the same
# seam as duckdb); the divisor wrap extends there. Values hand-pinned
# from MySQL 8 documented semantics and executed on Spark.
MYSQL_DIV_CASES = [
    ("SELECT 1 / 0 AS v", None),
    ("SELECT 7 % 0 AS v", None),
    ("SELECT MOD(7, 0) AS v", None),
    ("SELECT 7 DIV 0 AS v", None),
    ("SELECT 7 DIV 2 AS v", 3),
    ("SELECT -7 % 2 AS v", -1),
]


@pytest.mark.parametrize("q,expected", MYSQL_DIV_CASES, ids=lambda c: str(c)[:32])
def test_mysql_zero_divisor_null(spark, q, expected):
    sq = transpile(q, "mysql")
    assert transpile(sq, "mysql") == sq
    assert spark.sql(sq).collect()[0][0] == expected


def test_review_r6_findings(spark):
    """Regression pins for the round-6 code-review findings."""
    # 1. postgres negative subscripts are NULL (duckdb counts from end)
    assert spark.sql(
        transpile("SELECT (ARRAY[1,2,3])[-1] AS v", "postgres")
    ).collect()[0][0] is None
    assert spark.sql(
        transpile("SELECT ([1,2,3])[-1] AS v", "duckdb")
    ).collect()[0][0] == 3
    # 2. mixed binary/unary minus before ^: only the unary sign binds
    out = transpile("SELECT 2 - -2 ^ 2 AS v", "duckdb")
    assert spark.sql(out).collect()[0][0] == -2  # duck: 2 - ((-2)^2)
    out_pg = transpile("SELECT 2 - -2 ^ 2 AS v", "postgres")
    assert spark.sql(out_pg).collect()[0][0] == -2  # PG 15 verified: -2
    # 3. postgres seconds family keeps the fraction (duckdb truncates)
    ts = "TIMESTAMP '2024-01-01 00:00:01.5'"
    assert spark.sql(
        transpile(f"SELECT date_part('second', {ts}) AS v", "postgres")
    ).collect()[0][0] == 1.5
    assert spark.sql(
        transpile(f"SELECT date_part('milliseconds', {ts}) AS v", "postgres")
    ).collect()[0][0] == 1500.0
    assert spark.sql(
        transpile(f"SELECT date_part('second', {ts}) AS v", "duckdb")
    ).collect()[0][0] == 1
    # 4. windowed array_agg keeps OVER attached (and keeps NULLs)
    out = transpile(
        "SELECT array_agg(v) OVER (PARTITION BY g) AS a "
        "FROM (VALUES (1, 1), (NULL, 1)) t(v, g)", "duckdb")
    assert transpile(out, "duckdb") == out
    rows = spark.sql(out).collect()
    assert sorted(rows[0].a, key=lambda x: (x is None, x)) == [1, None]
    # 5. keyword-named functions subscript/exponentiate correctly
    out = transpile("SELECT filter([1,2,3], x -> x > 1)[1] AS v", "duckdb")
    assert spark.sql(out).collect()[0][0] == 2
    out = transpile("SELECT range(1, 5)[2] AS v", "duckdb")
    assert "rangetry_element_at" not in out
    # 6. user-written filter() inside list_distinct still NULL-drops
    out = transpile(
        "SELECT list_distinct(filter([1,NULL,1], x -> TRUE)) AS v", "duckdb")
    assert transpile(out, "duckdb") == out
    assert spark.sql(out).collect()[0][0] == [1]
    # 7. nested 3-arg substr grows linearly (struct-bound args)
    q = "substr(substr(substr(s, 0, 9), 0, 8), 0, 7)"
    out = transpile(f"SELECT {q} AS v FROM (SELECT 'hello world' AS s)", "duckdb")
    assert len(out) < 2500, len(out)
    assert spark.sql(out).collect()[0][0] == duckdb.sql(
        f"SELECT {q} AS v FROM (SELECT 'hello world' AS s)").fetchall()[0][0]


def test_review_r6_second_pass_findings(spark):
    """Regression pins for the second code-review pass (verified against
    a live PostgreSQL 15 where postgres semantics were in question)."""
    # NULL start/length poisons 3-arg substr (duck and pg both NULL;
    # Spark greatest/least skip NULLs and would give '')
    for d in ("duckdb", "postgres"):
        out = transpile("SELECT substr('hello', NULL, 3) AS a, "
                        "substr('hello', 2, NULL) AS b", d)
        row = spark.sql(out).collect()[0]
        assert row.a is None and row.b is None, (d, row)
    # windowed array_agg with FILTER or DISTINCT is unexecutable on
    # Spark — loud at render, not doomed SQL at execution
    for q in (
        "SELECT array_agg(v) FILTER (WHERE v > 0) OVER (PARTITION BY g) FROM t",
        "SELECT array_agg(DISTINCT v) OVER (PARTITION BY g) FROM t",
    ):
        with pytest.raises(TranspileError, match="not executable"):
            transpile(q, "duckdb")
    # keyword-named COLUMN followed by a subscript is a subscript, not
    # an array literal (was spliced to lastarray(1))
    out = transpile("SELECT last[1] AS v FROM t", "duckdb")
    assert "try_element_at(last, nullif(1, 0))" in out
    # user lambda named _ld still gets the NULL-drop wrap (exact-tail
    # sentinel), and plain list_distinct(filter-shaped) user SQL that
    # matches our emission gets the rename without double-wrapping
    out = transpile(
        "SELECT list_distinct(filter([1,NULL,1], _ld -> TRUE)) AS v", "duckdb")
    assert transpile(out, "duckdb") == out
    assert spark.sql(out).collect()[0][0] == [1]
    out2 = transpile(
        "SELECT list_distinct(filter(x, _ld -> _ld IS NOT NULL)) FROM t",
        "duckdb")
    assert out2 == "SELECT array_distinct(filter(x, _ld -> _ld IS NOT NULL)) FROM t"


def test_pg_array_position_and_numeric_trunc(spark):
    """Live-PG-verified: pg array_position returns NULL when not found
    (Spark and duckdb return 0), and pg/duckdb trunc() is numeric
    truncation toward zero (Spark's trunc is (date, fmt))."""
    out = transpile(
        "SELECT array_position(ARRAY[1,2,3], 9) AS miss, "
        "array_position(ARRAY[1,2,3], 2) AS hit, "
        "trunc(2.7) AS t1, trunc(-2.7) AS t2 FROM (SELECT 1)", "postgres")
    assert transpile(out, "postgres") == out
    row = spark.sql(out).collect()[0]
    assert row.miss is None and row.hit == 2
    assert row.t1 == 2.0 and row.t2 == -2.0
    # duckdb array_position returns 0 not-found (matches Spark): no wrap
    assert transpile(
        "SELECT array_position([1,2], 9) FROM t", "duckdb"
    ) == "SELECT array_position(array(1,2), 9) FROM t"
    assert spark.sql(
        transpile("SELECT trunc(-2.7) AS v", "duckdb")).collect()[0][0] == -2.0
    with pytest.raises(TranspileError, match="trunc"):
        transpile("SELECT trunc(2.567, 2) FROM t", "postgres")


def test_r12_advice_fixes(spark):
    """Round-12 ADVICE items: tsql FORMAT single-char standard
    specifiers are loud (FORMAT(dt,'d') is the .NET culture short
    date, not day-of-month); duck // keeps integer truncation for
    hex/binary integer literals; a T-SQL unary plus before a string is
    not the concat operator; mysql LIKE BINARY maps to the
    case-SENSITIVE like() function (ILIKE BINARY was invalid Spark AND
    inverted intent)."""
    with pytest.raises(TranspileError, match="FORMAT"):
        transpile("SELECT FORMAT(d, 'd') FROM t", "tsql")
    assert "date_format((d), 'dd')" in transpile(
        "SELECT FORMAT(d, 'dd') FROM t", "tsql")

    # (duckdb 1.0.0 — the live oracle — itself rejects `0xE1 // 2`, so
    # this pins only the static classification: hex stays integer DIV)
    assert "DIV" in transpile("SELECT 0xE1 // 2 AS x", "duckdb")
    assert " / " in transpile("SELECT 7.5 // 2 AS x", "duckdb")

    assert transpile("SELECT +'abc' AS x", "tsql") == "SELECT +'abc' AS x"
    assert transpile("SELECT a + 'abc' FROM t", "tsql") == (
        "SELECT a || 'abc' FROM t")

    out = transpile("SELECT c LIKE BINARY 'A%' AS x FROM t", "mysql")
    assert out == "SELECT like((c), ('A%')) AS x FROM t"
    assert transpile(out, "mysql") == out  # fixpoint: no ILIKE re-upgrade
    neg = transpile("SELECT c NOT LIKE BINARY 'A%' AS x FROM t", "mysql")
    assert neg == "SELECT (NOT like((c), ('A%'))) AS x FROM t"
    row = spark.sql(
        "SELECT like(('ABC'), ('A%')) AS cs, like(('abc'), ('A%')) AS ci"
    ).collect()[0]
    assert row.cs is True and row.ci is False
    # a trailing ESCAPE clause rides Spark's 3-arg like() (the function
    # form cannot take infix ESCAPE — the r12 rewrite emitted
    # unparseable `like(..) ESCAPE '!'` and dropped the escape; ADVICE
    # r12); non-literal escapes are loud
    esc = transpile(
        "SELECT c LIKE BINARY 'A!%' ESCAPE '!' AS x FROM t", "mysql")
    assert esc == "SELECT like((c), ('A!%'), '!') AS x FROM t"
    assert transpile(esc, "mysql") == esc  # fixpoint
    nesc = transpile(
        "SELECT c NOT LIKE BINARY 'A!%' ESCAPE '!' AS x FROM t", "mysql")
    assert nesc == "SELECT (NOT like((c), ('A!%'), '!')) AS x FROM t"
    with pytest.raises(TranspileError, match="non-literal escape"):
        transpile("SELECT c LIKE BINARY 'A%' ESCAPE e FROM t", "mysql")
    erow = spark.sql(
        "SELECT like(('A%'), ('A!%'), '!') AS hit, "
        "like(('AX'), ('A!%'), '!') AS miss"
    ).collect()[0]
    assert erow.hit is True and erow.miss is False
