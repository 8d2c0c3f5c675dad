"""Unit tests for the read-dialect → Spark SQL transpile layer.

Reference capability: sqlmesh renders model SQL written in any SQLGlot
dialect and transpiles to the execution dialect at render time
(sqlmesh/core/renderer.py:517, dialect.py:1040). These tests pin the
mapping table and the span-preserving editing contract.
"""

import pytest

from sqlmesh_spark.core.transpile import (
    TranspileError,
    convert_pg_format,
    convert_sf_format,
    convert_strftime_format,
    transpile,
)


# ---------------------------------------------------------------------------
# format-string conversion
# ---------------------------------------------------------------------------


def test_strftime_format_basic():
    assert convert_strftime_format("%Y-%m-%d") == "yyyy-MM-dd"


def test_strftime_format_literal_letter_quoted():
    assert convert_strftime_format("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss"


def test_strftime_format_percent_escape():
    assert convert_strftime_format("%d%%") == "dd%"


def test_strftime_format_unknown_code_raises():
    with pytest.raises(TranspileError):
        convert_strftime_format("%U")  # week-of-year (Sunday) — no mapping


def test_pg_format():
    assert convert_pg_format("YYYY-MM-DD HH24:MI:SS") == "yyyy-MM-dd HH:mm:ss"


# ---------------------------------------------------------------------------
# transpile: no-op paths
# ---------------------------------------------------------------------------


def test_spark_dialect_is_identity():
    sql = "SELECT strftime(ts, '%Y') FROM t"  # even weird SQL: untouched
    assert transpile(sql, "spark") == sql
    assert transpile(sql, None) == sql
    assert transpile(sql, "") == sql


def test_already_spark_sql_unchanged():
    sql = (
        "SELECT date_format(o_orderdate, 'yyyy-MM') AS ym,\n"
        "       CAST(SUM(o_totalprice) AS DOUBLE) AS rev -- comment\n"
        "FROM orders GROUP BY 1"
    )
    assert transpile(sql, "duckdb") == sql


def test_unknown_dialect_raises():
    with pytest.raises(TranspileError):
        transpile("SELECT 1", "teradata")


# ---------------------------------------------------------------------------
# transpile: function renames
# ---------------------------------------------------------------------------


def test_strftime_call():
    out = transpile("SELECT strftime(ts, '%Y-%m-%d') AS d FROM t", "duckdb")
    assert out == "SELECT date_format(ts, 'yyyy-MM-dd') AS d FROM t"


def test_strptime_call():
    out = transpile("SELECT strptime(s, '%Y/%m/%d') FROM t", "duckdb")
    assert out == "SELECT to_timestamp(s, 'yyyy/MM/dd') FROM t"


def test_epoch_family():
    # epoch() keeps FRACTIONAL seconds since round 11 (duck returns
    # DOUBLE; the unix_timestamp rename truncated — wave 64)
    out = transpile("SELECT epoch(ts), epoch_ms(ts) FROM t", "duckdb")
    assert out == ("SELECT try_divide(unix_micros(CAST((ts) AS "
                   "TIMESTAMP)), 1000000), unix_millis(ts) FROM t")


def test_list_functions():
    out = transpile(
        "SELECT list_contains(tags, 'x'), array_length(tags), "
        "list_extract(tags, 1), array_to_string(tags, ',') FROM t",
        "duckdb",
    )
    assert out == (
        "SELECT array_contains(tags, 'x'), size(tags), "
        "try_element_at(tags, nullif(1, 0)), array_join(tags, ',') FROM t"
    )


def test_column_named_like_function_untouched():
    # `epoch` as a column (no call parens) must not be rewritten
    sql = "SELECT epoch FROM t WHERE epoch > 5"
    assert transpile(sql, "duckdb") == sql


def test_string_in_literal_untouched():
    sql = "SELECT 'strftime(x, %Y)' AS s FROM t"
    assert transpile(sql, "duckdb") == sql


def test_log_arity():
    out = transpile("SELECT log(x), log(2, x) FROM t", "duckdb")
    # 1-arg log is log10 in DuckDB; 2-arg log(base, x) matches Spark
    assert out == "SELECT log10(x), log(2, x) FROM t"


def test_string_agg():
    out = transpile("SELECT string_agg(name, ', ') FROM t", "duckdb")
    assert out == "SELECT listagg(name, ', ') FROM t"


def test_array_agg_and_list_aggregate():
    # duckdb/postgres array_agg KEEPS NULL elements and returns NULL on
    # an empty input set; collect_list drops NULLs and returns [] — the
    # rewrite struct-wraps elements and restores NULL-on-empty.
    out = transpile("SELECT array_agg(x) FROM t", "postgres")
    assert out == (
        "SELECT (CASE WHEN size(array_agg(struct((x) AS _v))) = 0 "
        "THEN NULL ELSE transform(array_agg(struct((x) AS _v)), "
        "_s -> _s._v) END) FROM t"
    )


def test_string_to_array_escapes_regex_separator():
    # doubled backslash: Spark string literals process escapes themselves
    out = transpile("SELECT string_to_array(s, '|') FROM t", "duckdb")
    assert out == "SELECT split(s, '\\\\|') FROM t"


def test_regexp_matches():
    out = transpile("SELECT * FROM t WHERE regexp_matches(s, 'ab+')", "duckdb")
    assert out == "SELECT * FROM t WHERE regexp_like(s, 'ab+')"


def test_no_spark_equivalent_raises():
    with pytest.raises(TranspileError):
        transpile("SELECT entropy(x) FROM t", "duckdb")
    # list_aggr maps since round 11 (duckdb_hofs.py dynamic dispatch)
    assert "aggregate(" in transpile(
        "SELECT list_aggr(x, 'sum') FROM t", "duckdb"
    )


# ---------------------------------------------------------------------------
# transpile: casts, operators, star modifiers
# ---------------------------------------------------------------------------


def test_double_colon_type_rename():
    out = transpile("SELECT x::HUGEINT, y::TEXT, z::REAL FROM t", "duckdb")
    assert out == "SELECT x::DECIMAL(38,0), y::STRING, z::FLOAT FROM t"


def test_cast_as_type_rename():
    out = transpile("SELECT CAST(x AS HUGEINT) FROM t", "duckdb")
    assert out == "SELECT CAST(x AS DECIMAL(38,0)) FROM t"


def test_varchar_with_length_untouched():
    # VARCHAR(10) is valid Spark; only bare VARCHAR maps to STRING
    sql = "SELECT CAST(x AS VARCHAR(10)) FROM t"
    assert transpile(sql, "duckdb") == sql


def test_integer_division():
    # duckdb // is truncating integer division with NULL on a zero
    # divisor (Spark-4 ANSI DIV raises) — nullif-wrapped divisor
    out = transpile("SELECT a // b FROM t", "duckdb")
    assert out == "SELECT a  DIV  nullif(b, 0) FROM t"


def test_star_exclude():
    out = transpile("SELECT * EXCLUDE (a, b) FROM t", "duckdb")
    assert out == "SELECT * EXCEPT (a, b) FROM t"


def test_list_literal_brackets():
    out = transpile("SELECT [1, 2, 3] AS l FROM t", "duckdb")
    assert out == "SELECT array(1, 2, 3) AS l FROM t"


def test_postgres_array_literal():
    out = transpile("SELECT ARRAY[1, 2] FROM t", "postgres")
    assert out == "SELECT array(1, 2) FROM t"


def test_subscript_one_based():
    out = transpile("SELECT tags[1] FROM t", "duckdb")
    assert out == "SELECT try_element_at(tags, nullif(1, 0)) FROM t"


def test_subscript_dotted():
    out = transpile("SELECT t.tags[2] FROM t", "duckdb")
    assert out == "SELECT try_element_at(t.tags, nullif(2, 0)) FROM t"


def test_subscript_chained():
    out = transpile("SELECT x[1][2] FROM t", "duckdb")
    assert out == "SELECT try_element_at(try_element_at(x, nullif(1, 0)), nullif(2, 0)) FROM t"


def test_subscript_on_call_result():
    out = transpile("SELECT split(s, ',')[1] FROM t", "duckdb")
    assert out == "SELECT try_element_at(split(s, ','), nullif(1, 0)) FROM t"


def test_nested_list_literal():
    out = transpile("SELECT [[1], [2]] FROM t", "duckdb")
    assert out == "SELECT array(array(1), array(2)) FROM t"


def test_comments_and_whitespace_preserved():
    sql = "SELECT epoch(ts)  -- keep me\nFROM t"
    out = transpile(sql, "duckdb")
    assert out == ("SELECT try_divide(unix_micros(CAST((ts) AS "
                   "TIMESTAMP)), 1000000)  -- keep me\nFROM t")


# ---------------------------------------------------------------------------
# executed end-to-end: transpiled SQL runs on Spark and matches DuckDB
# ---------------------------------------------------------------------------


def test_transpiled_sql_executes(spark):
    import duckdb

    ddb_sql = (
        "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%Y-%m-%dT%H:%M:%S') AS s, "
        "epoch(TIMESTAMP '2024-03-05 07:08:09') AS e, "
        "list_contains(['a','b'], 'a') AS c, "
        "CAST(7 AS HUGEINT) AS h"
    )
    spark_sql = transpile(ddb_sql, "duckdb")
    got = spark.sql(spark_sql).collect()[0]
    want = duckdb.sql(ddb_sql).fetchone()
    assert got.s == want[0]
    assert got.e == int(want[1])
    assert got.c == want[2]
    assert int(got.h) == int(want[3])


def test_transpiled_expression_parity_matrix(spark):
    """Value parity on a matrix of transpiled scalar expressions: DuckDB
    runs the original, Spark runs the transpile — results must agree."""
    import duckdb

    cases = [
        "SELECT epoch_ms(TIMESTAMP '2024-06-01 12:00:00') AS v",
        "SELECT log(100.0) AS v",                      # 1-arg log = log10
        "SELECT list_extract([10, 20, 30], 2) AS v",   # 1-based
        "SELECT array_length([1, 2, 3]) AS v",
        "SELECT strpos('hello', 'll') AS v",
        "SELECT array_to_string(['a', 'b'], '-') AS v",
        "SELECT string_to_array('a|b|c', '|')[2] AS v",
        "SELECT 17 // 5 AS v",
        "SELECT regexp_matches('abc123', '[0-9]+') AS v",
        "SELECT list_contains([1, 2], 2) AS v",
    ]
    for ddb_sql in cases:
        want = duckdb.sql(ddb_sql).fetchone()[0]
        got = spark.sql(transpile(ddb_sql, "duckdb")).collect()[0][0]
        if isinstance(want, float):
            assert abs(got - want) < 1e-9, (ddb_sql, got, want)
        else:
            assert got == want, (ddb_sql, got, want)


def test_arg_max_min():
    out = transpile("SELECT arg_max(name, score), arg_min(name, score) FROM t", "duckdb")
    # round-10: duck arg_max/max_by SKIP rows whose VALUE is NULL
    # (Spark's keep them) — the key is NULLed for NULL-value rows
    assert out == ("SELECT max_by((name), IF((name) IS NULL, NULL, "
                   "(score))), min_by((name), IF((name) IS NULL, "
                   "NULL, (score))) FROM t")


def test_date_diff_unit_keyword():
    # boundary-crossing semantics: truncate both operands to the unit
    out = transpile("SELECT date_diff('day', a, b) FROM t", "duckdb")
    assert out == (
        "SELECT timestampdiff(DAY, date_trunc('day', a), date_trunc('day', b)) FROM t"
    )
    # plural unit normalizes; unknown unit raises
    out2 = transpile("SELECT date_diff('months', a, b) FROM t", "duckdb")
    assert "timestampdiff(MONTH" in out2
    with pytest.raises(TranspileError):
        transpile("SELECT date_diff('century', a, b) FROM t", "duckdb")
    # Spark's own 2-arg datediff untouched
    sql2 = "SELECT datediff(a, b) FROM t"
    assert transpile(sql2, "duckdb") == sql2


def test_dayname_monthname():
    out = transpile("SELECT dayname(d), monthname(d) FROM t", "duckdb")
    assert out == "SELECT date_format(d, 'EEEE'), date_format(d, 'MMMM') FROM t"


def test_executed_extras_parity(spark):
    import duckdb

    cases = [
        "SELECT date_diff('day', DATE '2024-01-01', DATE '2024-03-05') AS v",
        "SELECT dayname(DATE '2024-01-01') AS v",
        "SELECT monthname(DATE '2024-03-01') AS v",
    ]
    for ddb_sql in cases:
        want = duckdb.sql(ddb_sql).fetchone()[0]
        got = spark.sql(transpile(ddb_sql, "duckdb")).collect()[0][0]
        assert got == want, (ddb_sql, got, want)


def test_transpile_idempotent_on_corpus():
    """transpile(transpile(x)) == transpile(x) for structural rewrites:
    the output is valid Spark SQL a second pass must leave untouched —
    guards against a mapping whose TARGET is itself a mapped name.
    Literals whose content the conversion itself rewrites (regex escapes,
    backslash doubling) are excluded BY DESIGN: transpile's output is
    Spark SQL, and feeding it back as DuckDB re-applies standard-SQL
    literal semantics."""
    corpus = [
        "SELECT strftime(ts, '%Y-%m-%d') AS d, epoch(ts) AS e FROM t",
        "SELECT [1, 2][1] + x // y FROM t WHERE regexp_matches(s, 'a+')",
        "SELECT arg_max(a, b), string_agg(c, ','), log(x) FROM t",
        "SELECT date_diff('day', a, b), dayname(d) FROM t",
        "SELECT list_extract(string_to_array(s, ','), 2)::HUGEINT FROM t",
        "SELECT * EXCLUDE (a) FROM t",
    ]
    for sql in corpus:
        once = transpile(sql, "duckdb")
        assert transpile(once, "duckdb") == once, sql


# ---------------------------------------------------------------------------
# property test: random strftime formats agree across engines
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    # %a/%A/%b/%B excluded only because they are locale-dependent in the
    # JVM; the fixed-format tests above pin them for the default locale.
    _CODES = list("YymdHIMSpj")
    _SEPS = list("-/ :._,")

    _fmt_pieces = st.lists(
        st.one_of(
            st.sampled_from(["%" + c for c in _CODES]),
            st.sampled_from(_SEPS),
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=30, deadline=None)
    @given(pieces=_fmt_pieces)
    def test_strftime_random_formats_agree(spark, pieces):
        import duckdb

        fmt = "".join(pieces)
        ts = "2024-03-05 07:08:09"
        try:
            sql = transpile(
                f"SELECT strftime(TIMESTAMP '{ts}', '{fmt}') AS v", "duckdb"
            )
        except TranspileError:
            return  # loudly-unsupported shape (e.g. adjacent same codes)
        want = duckdb.sql(
            f"SELECT strftime(TIMESTAMP '{ts}', '{fmt}')"
        ).fetchone()[0]
        got = spark.sql(sql).collect()[0][0]
        assert got == want, (fmt, sql, got, want)


def test_alias_named_like_type_untouched():
    """`AS text` as an OUTPUT ALIAS must never be rewritten — the type
    rename applies only inside CAST/TRY_CAST bodies."""
    sql = "SELECT x AS text, y AS real FROM t"
    assert transpile(sql, "duckdb") == sql
    out = transpile("SELECT CAST(x AS TEXT) AS text FROM t", "duckdb")
    assert out == "SELECT CAST(x AS STRING) AS text FROM t"


def test_bare_exclude_gains_parens():
    out = transpile("SELECT * EXCLUDE a FROM t", "duckdb")
    assert out == "SELECT * EXCEPT (a) FROM t"
    out2 = transpile("SELECT t.* EXCLUDE t.a FROM t", "duckdb")
    assert out2 == "SELECT t.* EXCEPT (t.a) FROM t"


def test_numeric_to_char_raises():
    # the digit-class tier maps since round 11 (pg_numeric_tochar_emit);
    # locale/roman/scientific codes stay loud
    assert "format_number" in transpile(
        "SELECT to_char(x, '999.99') FROM t", "postgres"
    )
    with pytest.raises(TranspileError):
        transpile("SELECT to_char(x, 'RN') FROM t", "postgres")


def test_date_diff_boundary_crossing_parity(spark):
    """The cases where naive timestampdiff differs from DuckDB's
    boundary-crossing count: month across Jan-31→Feb-01, day across
    midnight."""
    import duckdb

    cases = [
        "SELECT date_diff('month', DATE '2024-01-31', DATE '2024-02-01') AS v",
        "SELECT date_diff('day', TIMESTAMP '2024-01-01 23:00:00', TIMESTAMP '2024-01-02 01:00:00') AS v",
        "SELECT date_diff('year', DATE '2023-12-31', DATE '2024-01-01') AS v",
        "SELECT date_diff('hour', TIMESTAMP '2024-01-01 10:59:00', TIMESTAMP '2024-01-01 11:01:00') AS v",
    ]
    for ddb_sql in cases:
        want = duckdb.sql(ddb_sql).fetchone()[0]
        got = spark.sql(transpile(ddb_sql, "duckdb")).collect()[0][0]
        assert got == want, (ddb_sql, got, want)


def test_slice_syntax():
    """Literal non-negative slice bounds rewrite (pg and duckdb are both
    1-based inclusive with clamping, verified live); negative and
    expression bounds stay loud — duckdb counts negatives from the end
    while pg clamps, so a shared rewrite would be silently wrong."""
    assert transpile("SELECT x[1:3] FROM t", "duckdb") == \
        "SELECT slice(x, 1, 3) FROM t"
    assert transpile("SELECT x[0:2] FROM t", "postgres") == \
        "SELECT slice(x, 1, 2) FROM t"
    assert transpile("SELECT x[3:2] FROM t", "duckdb") == \
        "SELECT slice(x, 1, 0) FROM t"
    assert "size(_t._sl)" in transpile("SELECT x[2:] FROM t", "postgres")
    with pytest.raises(TranspileError, match="slice"):
        transpile("SELECT x[a:3] FROM t", "duckdb")
    with pytest.raises(TranspileError, match="slice"):
        transpile("SELECT x[-2:] FROM t", "duckdb")


def test_pg_month_pattern_reachable():
    assert convert_pg_format("DD MONTH YYYY") == "dd MMMM yyyy"
    assert convert_pg_format("MON") == "MMM"


def test_pg_to_timestamp_format_converted(spark):
    out = transpile("SELECT to_timestamp(s, 'YYYY-MM-DD') FROM t", "postgres")
    assert out == "SELECT to_timestamp(s, 'yyyy-MM-dd') FROM t"
    out2 = transpile("SELECT to_timestamp(1700000000) AS v", "postgres")
    assert out2 == "SELECT timestamp_seconds(1700000000) AS v"
    # executed: DD must not become day-of-year
    got = spark.sql(
        transpile("SELECT to_date(s, 'MM/DD/YYYY') AS v FROM (SELECT '03/05/2024' AS s)", "postgres")
    ).collect()[0][0]
    assert str(got) == "2024-03-05"


def test_postgres_array_length_dim():
    # pg array_length returns NULL for an EMPTY array (verified live);
    # plain size() would give 0 — nullif on the pg read
    out = transpile("SELECT array_length(a, 1) FROM t", "postgres")
    assert out == "SELECT nullif(size((a)), 0) FROM t"
    with pytest.raises(TranspileError):
        transpile("SELECT array_length(a, 2) FROM t", "postgres")
    # duckdb 1-arg form still renames
    assert transpile("SELECT array_length(a) FROM t", "duckdb") == "SELECT size(a) FROM t"


def test_postgres_regexp_matches_loud():
    with pytest.raises(TranspileError):
        transpile("SELECT regexp_matches(s, 'x') FROM t", "postgres")
    # duckdb form still maps
    out = transpile("SELECT regexp_matches(s, 'x') FROM t", "duckdb")
    assert out == "SELECT regexp_like(s, 'x') FROM t"


def test_backslash_separator_escape(spark):
    import duckdb

    ddb_sql = r"SELECT string_to_array('a\b', '\') AS v"
    want = duckdb.sql(ddb_sql).fetchone()[0]
    got = spark.sql(transpile(ddb_sql, "duckdb")).collect()[0][0]
    assert list(got) == list(want), (got, want)


def test_pg_format_not_reconverted_on_later_passes():
    """A query where pass 1 makes OTHER edits (forcing pass 2) must not
    re-convert the already-converted to_timestamp format — 'HH:mm:ss'
    would corrupt to 'hh:MM:ss' (12-hour, month-as-minute)."""
    out = transpile(
        "SELECT epoch(x), to_timestamp(s, 'YYYY-MM-DD HH24:MI:SS') FROM t",
        "postgres",
    )
    assert "'yyyy-MM-dd HH:mm:ss'" in out, out
    # MON output (MMM) must not re-parse as MM + stray M either
    out2 = transpile("SELECT epoch(x), to_timestamp(s, 'DD MON YYYY') FROM t", "postgres")
    assert "'dd MMM yyyy'" in out2, out2


def test_string_to_array_nonliteral_separator_raises():
    with pytest.raises(TranspileError, match="literal"):
        transpile("SELECT string_to_array(x, sep) FROM t", "postgres")


def test_pg_array_type_cast():
    out = transpile("SELECT x::text[] FROM t", "postgres")
    assert out == "SELECT x::ARRAY<STRING> FROM t"
    out2 = transpile("SELECT CAST(x AS int4[]) FROM t", "postgres")
    assert out2 == "SELECT CAST(x AS ARRAY<INT>) FROM t"


def test_string_literal_subscript_becomes_substr(spark):
    import duckdb

    ddb_sql = "SELECT 'abc'[2] AS v"
    out = transpile(ddb_sql, "duckdb")
    # keyword FROM/FOR spelling since round 11: inert on fixpoint
    # re-reads (the comma form was rewrapped by the duck substring
    # fidelity handler) and index 0 emits '' (duck '' vs Spark's
    # substring(s, 0, 1) = first char)
    assert out == "SELECT substring('abc' FROM 2 FOR 1) AS v"
    assert spark.sql(out).collect()[0][0] == duckdb.sql(ddb_sql).fetchone()[0]
    assert transpile("SELECT 'abc'[0] AS v", "duckdb") == "SELECT '' AS v"


def test_alias_in_subquery_inside_cast_untouched():
    sql = "SELECT CAST((SELECT x AS text FROM t LIMIT 1) AS STRING) AS v"
    assert transpile(sql, "duckdb") == sql


# ---------------------------------------------------------------------------
# same-start edit ordering (round-5 advice: a zero-width insert sharing its
# start with a consuming replacement must not be clobbered)
# ---------------------------------------------------------------------------


def test_renamed_function_inside_date_diff_arg():
    # now() is renamed at the same offset where the date_trunc wrapper is
    # inserted — the replacement must apply first, the insert prepend after.
    out = transpile("SELECT date_diff('day', now(), x)", "duckdb")
    assert out == (
        "SELECT timestampdiff(DAY, date_trunc('day', current_timestamp()), "
        "date_trunc('day', x))"
    )


def test_subscripted_backslash_literal():
    # substr( insert shares its start with the backslash-doubling literal
    # replacement.
    out = transpile(r"SELECT 'a\b'[2]", "duckdb")
    assert out == r"SELECT substring('a\\b' FROM 2 FOR 1)"


def test_renamed_functions_both_date_diff_args(spark):
    out = transpile(
        "SELECT date_diff('month', now(), today()) AS d", "duckdb"
    )
    assert out == (
        "SELECT timestampdiff(MONTH, date_trunc('month', current_timestamp()), "
        "date_trunc('month', current_date())) AS d"
    )
    assert spark.sql(out).collect()[0]["d"] == 0


# ---------------------------------------------------------------------------
# Snowflake read dialect
# ---------------------------------------------------------------------------


def test_snowflake_iff_nvl2_split_part(spark):
    out = transpile(
        "SELECT IFF(1 > 0, 'x', 'y') AS a, NVL2(NULL, 1, 2) AS b, "
        "SPLIT_PART('a-b-c', '-', -1) AS c",
        "snowflake",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c) == ("x", 2, "c")


def test_snowflake_to_varchar_format(spark):
    out = transpile(
        "SELECT TO_VARCHAR(TIMESTAMP '2024-03-05 07:08:09.123', "
        "'YYYY-MM-DD HH24:MI:SS.FF3') AS s",
        "snowflake",
    )
    assert spark.sql(out).collect()[0].s == "2024-03-05 07:08:09.123"


def test_snowflake_to_varchar_1arg_is_cast():
    assert (
        transpile("SELECT TO_VARCHAR(x) FROM t", "snowflake")
        == "SELECT CAST(x AS STRING) FROM t"
    )


def test_snowflake_to_date_format(spark):
    out = transpile("SELECT TO_DATE('05/03/2024', 'DD/MM/YYYY') AS d", "snowflake")
    assert str(spark.sql(out).collect()[0].d) == "2024-03-05"


def test_snowflake_dateadd_bare_unit(spark):
    out = transpile("SELECT DATEADD(day, 5, DATE '2024-01-01') AS d", "snowflake")
    assert out == "SELECT timestampadd(DAY, 5, DATE '2024-01-01') AS d"
    assert str(spark.sql(out).collect()[0].d)[:10] == "2024-01-06"


def test_snowflake_datediff_boundary_crossing(spark):
    # Snowflake DATEDIFF counts boundary crossings: Jan-31 → Feb-01 = 1 month.
    out = transpile(
        "SELECT DATEDIFF(month, DATE '2024-01-31', DATE '2024-02-01') AS m",
        "snowflake",
    )
    assert spark.sql(out).collect()[0].m == 1


def test_snowflake_null_zero_helpers(spark):
    out = transpile(
        "SELECT NULLIFZERO(0) AS a, ZEROIFNULL(NULL) AS b, "
        "DIV0(1, 0) AS c, SQUARE(3) AS d",
        "snowflake",
    )
    row = spark.sql(out).collect()[0]
    assert row.a is None and row.b == 0 and row.c == 0 and row.d == 9.0


def test_snowflake_to_number_precision():
    out = transpile("SELECT TO_NUMBER(s, 10, 2) FROM t", "snowflake")
    assert out == "SELECT CAST(s AS DECIMAL(10,2)) FROM t"


def test_snowflake_regexp_substr(spark):
    out = transpile("SELECT REGEXP_SUBSTR('ab12cd', '[0-9]+') AS m", "snowflake")
    assert spark.sql(out).collect()[0].m == "12"


def test_snowflake_loud_functions():
    for sql in (
        "SELECT RANDOM()",            # int64 gen vs rand() double
        "SELECT HASH(x) FROM t",      # different hash → silent wrong values
        "SELECT OBJECT_CONSTRUCT('a', 1)",
        "SELECT ARRAY_POSITION(1, arr) FROM t",  # 0-based + reversed args
    ):
        with pytest.raises(TranspileError):
            transpile(sql, "snowflake")


def test_snowflake_backslash_literal_not_doubled():
    # Snowflake literals already use backslash escapes like Spark.
    sql = r"SELECT 'a\nb' AS s"
    assert transpile(sql, "snowflake") == sql


# ---------------------------------------------------------------------------
# BigQuery read dialect
# ---------------------------------------------------------------------------


def test_bigquery_safe_family(spark):
    out = transpile(
        "SELECT SAFE_DIVIDE(1, 0) AS a, SAFE_CAST('x' AS INT64) AS b, "
        "SAFE_ADD(1, 2) AS c",
        "bigquery",
    )
    row = spark.sql(out).collect()[0]
    assert row.a is None and row.b is None and row.c == 3


def test_bigquery_timestamp_diff_arg_order(spark):
    # TIMESTAMP_DIFF(later, earlier, unit) — complete elapsed units.
    out = transpile(
        "SELECT TIMESTAMP_DIFF(TIMESTAMP '2024-01-02 03:00:00', "
        "TIMESTAMP '2024-01-01 00:00:00', HOUR) AS h",
        "bigquery",
    )
    assert spark.sql(out).collect()[0].h == 27


def test_bigquery_date_diff_boundary_crossing(spark):
    # DATE_DIFF counts boundary crossings: Jan-31 → Feb-01 = 1 month.
    out = transpile(
        "SELECT DATE_DIFF(DATE '2024-02-01', DATE '2024-01-31', MONTH) AS m",
        "bigquery",
    )
    assert spark.sql(out).collect()[0].m == 1


def test_bigquery_interval_add_sub(spark):
    out = transpile(
        "SELECT DATE_ADD(DATE '2024-01-01', INTERVAL 5 DAY) AS a, "
        "TIMESTAMP_SUB(TIMESTAMP '2024-01-10 00:00:00', INTERVAL 2 HOUR) AS b",
        "bigquery",
    )
    row = spark.sql(out).collect()[0]
    assert str(row.a)[:10] == "2024-01-06" and str(row.b) == "2024-01-09 22:00:00"


def test_bigquery_format_parse_swap(spark):
    out = transpile(
        "SELECT FORMAT_DATE('%Y-%m', DATE '2024-03-05') AS a, "
        "PARSE_DATE('%d/%m/%Y', '05/03/2024') AS b",
        "bigquery",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == "2024-03" and str(row.b) == "2024-03-05"


def test_bigquery_date_trunc_swap(spark):
    out = transpile("SELECT DATE_TRUNC(DATE '2024-03-15', MONTH) AS d", "bigquery")
    assert out == "SELECT CAST(date_trunc('month', DATE '2024-03-15') AS DATE) AS d"
    # Already-Spark form untouched (idempotent shape check).
    spark_form = "SELECT date_trunc('month', d) FROM t"
    assert transpile(spark_form, "bigquery") == spark_form


def test_bigquery_backtick_dotted_path_split():
    out = transpile("SELECT x FROM `proj.ds.tbl`", "bigquery")
    assert out == "SELECT x FROM `proj`.`ds`.`tbl`"
    # Non-dotted backtick identifiers untouched.
    assert transpile("SELECT `a b` FROM t", "bigquery") == "SELECT `a b` FROM t"


def test_bigquery_split_plain_separator(spark):
    out = transpile("SELECT SPLIT('a|b|c', '|') AS a, SPLIT('x,y') AS b", "bigquery")
    row = spark.sql(out).collect()[0]
    assert row.a == ["a", "b", "c"] and row.b == ["x", "y"]


def test_bigquery_offset_ordinal_subscripts(spark):
    out = transpile("SELECT arr[OFFSET(0)] AS a, arr[ORDINAL(2)] AS b "
                    "FROM (SELECT array(10, 20) AS arr)", "bigquery")
    row = spark.sql(out).collect()[0]
    assert row.a == 10 and row.b == 20


def test_bigquery_date_constructor(spark):
    out = transpile("SELECT DATE(2024, 3, 5) AS d", "bigquery")
    assert str(spark.sql(out).collect()[0].d) == "2024-03-05"


def test_bigquery_aggregate_renames(spark):
    out = transpile(
        "SELECT COUNTIF(x > 1) AS a, LOGICAL_AND(x > 0) AS b, "
        "LOGICAL_OR(x > 2) AS c FROM (SELECT 1 AS x UNION ALL SELECT 3)",
        "bigquery",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c) == (1, True, True)


def test_bigquery_loud():
    for sql in (
        "SELECT CAST(x AS BIGNUMERIC) FROM t",   # 76 digits > DECIMAL(38)
        "SELECT DATE_DIFF(a, b, WEEK) FROM t",   # Sunday vs Monday weeks
        "SELECT FARM_FINGERPRINT(s) FROM t",
        "SELECT SHA256(s) FROM t",               # BYTES vs hex string
        "SELECT JSON_EXTRACT(j, '$.a') FROM t",  # returns JSON, not scalar
    ):
        with pytest.raises(TranspileError):
            transpile(sql, "bigquery")


# ---------------------------------------------------------------------------
# Spark-version gate (round-5 directive 3)
# ---------------------------------------------------------------------------


def test_listagg_gated_on_spark3(monkeypatch):
    import sqlmesh_spark.core.transpile_shared as tp

    monkeypatch.setattr(tp, "_spark_version", lambda: (3, 5))
    with pytest.raises(TranspileError, match="requires Spark >= 4.0"):
        transpile("SELECT string_agg(x, ',') FROM t", "duckdb")
    with pytest.raises(TranspileError, match="requires Spark >= 4.0"):
        transpile("SELECT LISTAGG(x, ',') FROM t", "snowflake")
    monkeypatch.setattr(tp, "_spark_version", lambda: (4, 0))
    assert (
        transpile("SELECT string_agg(x, ',') FROM t", "duckdb")
        == "SELECT listagg(x, ',') FROM t"
    )


# ---------------------------------------------------------------------------
# Idempotence / fixpoint property over the registry's own SQL corpus
# (round-5 directive 8)
# ---------------------------------------------------------------------------


def test_transpile_fixpoint_over_registry_corpus():
    """transpile(transpile(x)) == transpile(x) for every oracle text in the
    registry (each written in DuckDB dialect): the output of a transpile
    must be a fixpoint — re-reading it as the same dialect changes
    nothing. Exception, by design: texts whose OUTPUT contains
    backslashes in string literals (escaped regex separators), since
    re-reading a Spark literal as a standard-SQL literal re-doubles them —
    that's dialect re-interpretation, not instability."""
    import re as _re

    from sqlmesh_spark.registry import load_all

    checked = 0
    skipped_loud = 0
    skipped_backslash = 0
    for name, case in load_all().items():
        if case.oracle is None:
            continue
        x = case.oracle
        try:
            y = transpile(x, "duckdb")
        except TranspileError:
            skipped_loud += 1
            continue
        if _re.search(r"'[^']*\\", y):
            skipped_backslash += 1
            continue
        assert transpile(y, "duckdb") == y, f"{name}: transpile is not a fixpoint"
        checked += 1
    assert checked >= 50, (checked, skipped_loud, skipped_backslash)



#: dialects whose unannotated sort items gain the source NULL placement
#: (pg-rule: NULLS LAST asc / FIRST desc; duck-rule: LAST always — both
#: are NULLS LAST for the ASC items in the no-op corpora)
_NULLS_DIALECTS = ("duckdb", "postgres", "snowflake", "trino", "oracle",
                   "redshift", "clickhouse")


def _with_nulls(sql: str, dialect: str) -> str:
    if dialect not in _NULLS_DIALECTS:
        return sql
    return sql.replace(
        "ORDER BY a)", "ORDER BY a NULLS LAST)"
    ).replace("ORDER BY k LIMIT", "ORDER BY k NULLS LAST LIMIT")


def test_transpile_noop_on_plain_spark_sql_corpus():
    """Already-Spark SQL (no dialect-specific constructs) round-trips
    byte-identical through every read dialect — the no-op guarantee the
    module docstring promises."""
    corpus = [
        "SELECT a, SUM(b) AS s FROM t WHERE c >= DATE '2024-01-01' GROUP BY a",
        "SELECT date_format(ts, 'yyyy-MM') AS ym, COUNT(*) AS n FROM t GROUP BY 1",
        "WITH x AS (SELECT 1 AS a) SELECT a, ROW_NUMBER() OVER (ORDER BY a) FROM x",
        # try_element_at, not element_at: element_at is no longer
        # dialect-neutral — on the duckdb read it is the MAP accessor
        # (list-returning, round-10 seam fix), so only the try_ form
        # round-trips everywhere
        "SELECT CAST(x AS DECIMAL(12,2)), try_element_at(arr, 1) FROM t -- note\n",
        "SELECT timestampdiff(DAY, a, b), date_trunc('month', ts) FROM t",
        "SELECT /* block */ concat_ws('-', a, b) AS k FROM t ORDER BY k LIMIT 5",
    ]
    for sql in corpus:
        for dialect in ("duckdb", "postgres", "ansi", "snowflake", "bigquery"):
            assert transpile(sql, dialect) == _with_nulls(sql, dialect), \
                (dialect, sql)


# ---------------------------------------------------------------------------
# QUALIFY rewrite (DuckDB / Snowflake / BigQuery window filter)
# ---------------------------------------------------------------------------


@pytest.fixture()
def qualify_view(spark):
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW q_t AS "
        "SELECT * FROM VALUES (1, 10), (1, 20), (2, 30) AS q_t(a, b)"
    )
    return "q_t"


def test_qualify_alias_reference(spark, qualify_view):
    # The canonical migration pattern: rn defined in the select list,
    # filtered in QUALIFY (resolves via Spark's lateral column aliases).
    out = transpile(
        "SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) AS rn "
        "FROM q_t QUALIFY rn = 1",
        "snowflake",
    )
    rows = sorted((r.a, r.b, r.rn) for r in spark.sql(out).collect())
    assert rows == [(1, 10, 1), (2, 30, 1)]


def test_qualify_window_in_predicate(spark, qualify_view):
    out = transpile(
        "SELECT a, b FROM q_t "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY b DESC) = 1",
        "bigquery",
    )
    rows = sorted((r.a, r.b) for r in spark.sql(out).collect())
    assert rows == [(1, 20), (2, 30)]
    # the synthetic column must NOT leak into the output schema
    assert spark.sql(out).columns == ["a", "b"]


def test_qualify_order_limit_outer_scope(spark, qualify_view):
    out = transpile(
        "SELECT a FROM q_t QUALIFY RANK() OVER (ORDER BY a) <= 3 "
        "ORDER BY a DESC LIMIT 2",
        "duckdb",
    )
    assert [r.a for r in spark.sql(out).collect()] == [2, 1]


def test_qualify_in_subquery(spark, qualify_view):
    out = transpile(
        "SELECT x FROM (SELECT b AS x FROM q_t "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY b) = 1) WHERE x > 0",
        "snowflake",
    )
    assert [r.x for r in spark.sql(out).collect()] == [10]


def test_qualify_union_scope(spark, qualify_view):
    out = transpile(
        "SELECT a FROM q_t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1 "
        "UNION ALL SELECT 99",
        "snowflake",
    )
    assert sorted(r.a for r in spark.sql(out).collect()) == [1, 99]


def test_qualify_distinct_loud():
    with pytest.raises(TranspileError, match="DISTINCT"):
        transpile(
            "SELECT DISTINCT a FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1",
            "snowflake",
        )


def test_qualify_not_rewritten_for_postgres():
    # Postgres has no QUALIFY; the clause passes through (and fails loudly
    # at execution) rather than being silently reinterpreted.
    sql = "SELECT a FROM t QUALIFY rn = 1"
    assert transpile(sql, "postgres") == sql


# ---------------------------------------------------------------------------
# Snowflake LATERAL FLATTEN / BigQuery UNNEST table functions
# ---------------------------------------------------------------------------


@pytest.fixture()
def arr_views(spark):
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW arr_t AS "
        "SELECT 1 AS id, array(10, 20) AS arr "
        "UNION ALL SELECT 2, array(30)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW arr_e AS "
        "SELECT 1 AS id, array(10, 20) AS arr "
        "UNION ALL SELECT 2, CAST(array() AS array<int>)"
    )


def test_snowflake_lateral_flatten(spark, arr_views):
    out = transpile(
        "SELECT id, f.value, f.index FROM arr_t, "
        "LATERAL FLATTEN(input => arr) f",
        "snowflake",
    )
    rows = sorted(tuple(r) for r in spark.sql(out).collect())
    assert rows == [(1, 10, 0), (1, 20, 1), (2, 30, 0)]


def test_snowflake_lateral_flatten_outer(spark, arr_views):
    # outer => true keeps empty-array rows (posexplode_outer).
    out = transpile(
        "SELECT id, f.value FROM arr_e, "
        "LATERAL FLATTEN(input => arr, outer => true) f",
        "snowflake",
    )
    rows = sorted(tuple(r) for r in spark.sql(out).collect())
    assert rows == [(1, 10), (1, 20), (2, None)]


def test_snowflake_flatten_unsupported_args_loud():
    with pytest.raises(TranspileError, match="path"):
        transpile(
            "SELECT f.value FROM t, LATERAL FLATTEN(input => x, path => 'a') f",
            "snowflake",
        )
    # non-LATERAL FLATTEN stays loud via the function map
    with pytest.raises(TranspileError):
        transpile("SELECT FLATTEN(x) FROM t", "snowflake")


def test_bigquery_unnest_comma_form(spark, arr_views):
    out = transpile("SELECT id, e FROM arr_t, UNNEST(arr) AS e", "bigquery")
    rows = sorted(tuple(r) for r in spark.sql(out).collect())
    assert rows == [(1, 10), (1, 20), (2, 30)]


def test_bigquery_unnest_with_offset(spark, arr_views):
    out = transpile(
        "SELECT id, e, o FROM arr_t, UNNEST(arr) AS e WITH OFFSET AS o",
        "bigquery",
    )
    rows = sorted(tuple(r) for r in spark.sql(out).collect())
    assert rows == [(1, 10, 0), (1, 20, 1), (2, 30, 0)]


def test_bigquery_unnest_left_join_on_true(spark, arr_views):
    out = transpile(
        "SELECT id, e FROM arr_e LEFT JOIN UNNEST(arr) AS e ON TRUE",
        "bigquery",
    )
    rows = sorted(tuple(r) for r in spark.sql(out).collect())
    assert rows == [(1, 10), (1, 20), (2, None)]


def test_bigquery_unnest_standalone(spark):
    out = transpile("SELECT e FROM UNNEST(ARRAY[7, 8]) AS e", "bigquery")
    assert sorted(r.e for r in spark.sql(out).collect()) == [7, 8]


def test_bigquery_unnest_without_alias_loud():
    with pytest.raises(TranspileError, match="alias"):
        transpile("SELECT x FROM t, UNNEST(arr)", "bigquery")


# ---------------------------------------------------------------------------
# Round-5 review findings — regression pins
# ---------------------------------------------------------------------------


def test_copied_regions_recursively_transpile(spark):
    """Consumed-region handlers (UNNEST/FLATTEN/QUALIFY/BQ date fns) must
    run the FULL pipeline on copied argument text — first-pass-only
    rewrites included — not defer to gated fixpoint passes."""
    # BQ SPLIT separator escaping inside UNNEST
    out = transpile("SELECT p FROM (SELECT 'a|b' AS s), UNNEST(SPLIT(s, '|')) AS p", "bigquery")
    assert sorted(r.p for r in spark.sql(out).collect()) == ["a", "b"]
    # PARSE_TIMESTAMP nested in TIMESTAMP_DIFF args
    out = transpile(
        "SELECT TIMESTAMP_DIFF(PARSE_TIMESTAMP('%Y-%m-%d', '2024-01-02'), "
        "TIMESTAMP '2024-01-01 00:00:00', HOUR) AS h",
        "bigquery",
    )
    assert spark.sql(out).collect()[0].h == 24
    # duckdb QUALIFY predicate literal doubling
    out = transpile(r"SELECT s FROM (SELECT 'a\b' AS s) t QUALIFY s = 'a\b'", "duckdb")
    assert [r.s for r in spark.sql(out).collect()] == ["a\\b"]


def test_qualify_predicate_with_bracket_subscript(spark):
    out = transpile(
        "SELECT a FROM (SELECT 1 AS a, [1, 2] AS arr) t "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY a) = arr[1]",
        "duckdb",
    )
    assert [r.a for r in spark.sql(out).collect()] == [1]
    # BigQuery OFFSET subscript inside the predicate must not terminate it
    out = transpile(
        "SELECT a FROM (SELECT 1 AS a, ARRAY[1, 9] AS arr) t "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY a) = arr[OFFSET(0)]",
        "bigquery",
    )
    assert out.count("(") == out.count(")")
    assert [r.a for r in spark.sql(out).collect()] == [1]


def test_regexp_substr_null_on_no_match(spark):
    out = transpile(
        "SELECT REGEXP_SUBSTR('abc', '[0-9]+') AS m1, "
        "REGEXP_SUBSTR('ab12', '[0-9]+') AS m2",
        "snowflake",
    )
    row = spark.sql(out).collect()[0]
    assert row.m1 is None and row.m2 == "12"


def test_snowflake_numeric_to_char_loud():
    with pytest.raises(TranspileError, match="numeric"):
        transpile("SELECT TO_CHAR(amount, '$99,999.00') FROM t", "snowflake")
    with pytest.raises(TranspileError, match="numeric"):
        transpile("SELECT TO_VARCHAR(amount, '9999') FROM t", "snowflake")


def test_snowflake_parameterized_number(spark):
    out = transpile("SELECT CAST(x AS NUMBER(10,2)) AS a, x::NUMBER(12,3) AS b "
                    "FROM (SELECT 1.5 AS x)", "snowflake")
    assert "DECIMAL(10,2)" in out and "DECIMAL(12,3)" in out
    row = spark.sql(out).collect()[0]
    assert float(row.a) == 1.5


def test_bigquery_unnest_offset_default_alias_keyword_guard(spark):
    out = transpile(
        "SELECT e FROM (SELECT array(5) AS arr) t, UNNEST(arr) AS e "
        "WITH OFFSET WHERE e > 0",
        "bigquery",
    )
    assert [r.e for r in spark.sql(out).collect()] == [5]


def test_bigquery_datetime_arity(spark):
    out = transpile(
        "SELECT DATETIME(TIMESTAMP '2024-01-01 05:00:00') AS a, "
        "DATETIME(2024, 3, 5, 6, 7, 8) AS b",
        "bigquery",
    )
    row = spark.sql(out).collect()[0]
    assert str(row.a) == "2024-01-01 05:00:00" and str(row.b) == "2024-03-05 06:07:08"
    with pytest.raises(TranspileError):
        transpile("SELECT DATETIME(d, tz) FROM t", "bigquery")


def test_weekly_cron_unknown_dow_raises():
    from sqlmesh_spark.core.scheduler import _weekly_cron_boundary

    with pytest.raises(ValueError, match="day-of-week"):
        _weekly_cron_boundary(0, "L")


# ---------------------------------------------------------------------------
# Round-5 second review pass — regression pins
# ---------------------------------------------------------------------------


def test_sf_bq_bare_subscripts_zero_based(spark):
    """Snowflake/BigQuery bare subscripts are 0-based — Spark's native
    arr[i] semantics — and must NOT route through 1-based element_at."""
    assert transpile("SELECT arr[1] FROM t", "bigquery") == "SELECT arr[1] FROM t"
    assert transpile("SELECT arr[0] FROM t", "snowflake") == "SELECT arr[0] FROM t"
    # duckdb/postgres remain 1-based element_at
    assert (
        transpile("SELECT arr[1] FROM t", "duckdb")
        == "SELECT try_element_at(arr, nullif(1, 0)) FROM t"
    )
    out = transpile(
        "SELECT arr[0] AS a, arr[OFFSET(1)] AS b, arr[ORDINAL(1)] AS c "
        "FROM (SELECT array(10, 20) AS arr)",
        "bigquery",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c) == (10, 20, 10)


def test_snowflake_div0_null_semantics(spark):
    out = transpile(
        "SELECT DIV0(10, 0) AS a, DIV0(NULL, 2) AS b, DIV0(10, NULL) AS c, "
        "DIV0(10, 4) AS d",
        "snowflake",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == 0 and row.b is None and row.c is None and row.d == 2.5


def test_escaped_quote_literals(spark):
    out = transpile(r"SELECT IFF('O\'Brien' = 'O\'Brien', 1, 0) AS x", "snowflake")
    assert spark.sql(out).collect()[0].x == 1


def test_bigquery_double_quoted_strings(spark):
    out = transpile('SELECT SPLIT("a.b", ".") AS parts', "bigquery")
    assert spark.sql(out).collect()[0].parts == ["a", "b"]
    out = transpile('SELECT FORMAT_DATE("%Y-%m", DATE \'2024-03-05\') AS m', "bigquery")
    assert spark.sql(out).collect()[0].m == "2024-03"


def test_multi_token_format_expressions_loud():
    for sql, d in [
        ("SELECT FORMAT_DATE('%Y' || '-%m', d) FROM t", "bigquery"),
        ("SELECT PARSE_DATE('%Y' || '-%m', s) FROM t", "bigquery"),
        ("SELECT TO_VARCHAR(d, 'YYYY' || 'MM') FROM t", "snowflake"),
        ("SELECT TO_DATE(s, 'YYYY' || 'MM') FROM t", "snowflake"),
        ("SELECT strftime(d, '%Y' || '-%m') FROM t", "duckdb"),
        ("SELECT to_char(d, 'YYYY' || 'MM') FROM t", "postgres"),
        ("SELECT to_timestamp(s, 'YYYY' || 'MM') FROM t", "postgres"),
    ]:
        with pytest.raises(TranspileError):
            transpile(sql, d)


def test_bigquery_date_add_keeps_date_type(spark):
    out = transpile("SELECT DATE_ADD(DATE '2024-01-01', INTERVAL 5 DAY) AS d", "bigquery")
    df = spark.sql(out)
    assert dict(df.dtypes)["d"] == "date"
    assert str(df.collect()[0].d) == "2024-01-06"


def test_snowflake_to_timestamp_one_arg_epoch_and_string(spark):
    out = transpile(
        "SELECT TO_TIMESTAMP(1700000000) AS a, "
        "TO_TIMESTAMP('2024-01-02 03:04:05') AS b, "
        "TO_TIMESTAMP('1700000000') AS c",
        "snowflake",
    )
    row = spark.sql(out).collect()[0]
    assert row.a is not None and row.a == row.c
    assert str(row.b) == "2024-01-02 03:04:05"


def test_weekly_cron_step_field_not_weekly():
    # `*/2` fires several days a week — the weekly anchor must not claim
    # it (caller falls back to the interval-unit ladder).
    fields = "0 0 * * */2".split()
    assert fields[4].startswith("*")  # the caller-side guard condition


# ---------------------------------------------------------------------------
# Round-5 third review pass — regression pins
# ---------------------------------------------------------------------------


def test_div0_null_dividend_with_zero_divisor(spark):
    # Snowflake: NULL dividend propagates even when divisor = 0.
    out = transpile("SELECT DIV0(NULL, 0) AS a, DIV0(1, 0) AS b", "snowflake")
    row = spark.sql(out).collect()[0]
    assert row.a is None and row.b == 0


def test_snowflake_to_timestamp_magnitude_autoscale(spark):
    # Snowflake scales numeric epochs by magnitude: s / ms / us / ns.
    out = transpile(
        "SELECT TO_TIMESTAMP(1700000000) AS s, TO_TIMESTAMP(1700000000000) AS ms, "
        "TO_TIMESTAMP(1700000000000000) AS us, "
        "TO_TIMESTAMP(1700000000000000000) AS ns",
        "snowflake",
    )
    row = spark.sql(out).collect()[0]
    assert str(row.s) == str(row.ms) == str(row.us) == str(row.ns)


def test_bigquery_limit_offset_untouched():
    sql = "SELECT x FROM t LIMIT 10 OFFSET (5)"
    assert transpile(sql, "bigquery") == sql


def test_snowflake_sysdate_is_utc(spark):
    out = transpile("SELECT SYSDATE() AS t1", "snowflake")
    assert "to_utc_timestamp" in out
    spark.sql(out).collect()  # executes


def test_snowflake_to_number_two_arg_precision():
    assert (
        transpile("SELECT TO_NUMBER(x, 10) FROM t", "snowflake")
        == "SELECT CAST(x AS DECIMAL(10,0)) FROM t"
    )


def test_sf_pg_format_share_scan_loop():
    # FF only valid for Snowflake; everything else identical.
    assert convert_sf_format("YYYY.FF3") == "yyyy.SSS"
    with pytest.raises(TranspileError):
        convert_pg_format("YYYY.FF3")


# ---------------------------------------------------------------------------
# Round-5 fourth review pass — regression pins
# ---------------------------------------------------------------------------


def test_try_to_date_stays_try(spark):
    # Spark 4.0+ has native try_to_date; renaming to plain to_date would
    # ERROR on malformed input under ANSI mode instead of returning NULL.
    out = transpile("SELECT TRY_TO_DATE('garbage') AS a", "snowflake")
    assert spark.sql(out).collect()[0].a is None


def test_to_timestamp_digit_string_is_epoch(spark):
    # '2023' is epoch-seconds in Snowflake, NOT year 2023 — the epoch
    # branch must win over the string parser for digit-shaped input.
    out = transpile("SELECT TO_TIMESTAMP('2023') AS a, TO_TIMESTAMP(2023) AS b", "snowflake")
    row = spark.sql(out).collect()[0]
    assert str(row.a) == str(row.b) and str(row.a).startswith("1970-01-01")


def test_generate_array_empty_when_start_gt_end(spark):
    out = transpile(
        "SELECT GENERATE_ARRAY(5, 1) AS a, GENERATE_ARRAY(1, 3) AS b, "
        "GENERATE_DATE_ARRAY(DATE '2023-01-05', DATE '2023-01-01') AS c",
        "bigquery",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == [] and row.b == [1, 2, 3] and row.c == []


def test_bigquery_date_trunc_keeps_date_type(spark):
    out = transpile("SELECT DATE_TRUNC(DATE '2024-03-15', MONTH) AS d", "bigquery")
    df = spark.sql(out)
    assert dict(df.dtypes)["d"] == "date"
    assert str(df.collect()[0].d) == "2024-03-01"


def test_bigquery_safe_offset_ordinal(spark):
    out = transpile(
        "SELECT arr[SAFE_OFFSET(5)] AS a, arr[SAFE_OFFSET(0)] AS b, "
        "arr[SAFE_ORDINAL(2)] AS c FROM (SELECT array(10, 20) AS arr)",
        "bigquery",
    )
    row = spark.sql(out).collect()[0]
    assert row.a is None and row.b == 10 and row.c == 20


# ---------------------------------------------------------------------------
# Round-5 fifth review pass — regression pins
# ---------------------------------------------------------------------------


def test_double_quoted_identifiers_become_backticks(spark):
    """Spark's default parser reads "x" as a STRING literal; standard-SQL
    and Snowflake double-quoted IDENTIFIERS must re-quote to backticks."""
    out = transpile('SELECT "MyCol" FROM (SELECT 7 AS `MyCol`)', "snowflake")
    assert out == "SELECT `MyCol` FROM (SELECT 7 AS `MyCol`)"
    assert spark.sql(out).collect()[0][0] == 7
    out = transpile('SELECT "a col" AS c FROM (SELECT 1 AS `a col`)', "duckdb")
    assert spark.sql(out).collect()[0].c == 1
    # dquoted subscript base still recognized as a subscript
    assert (
        transpile('SELECT "My Arr"[1] FROM t', "duckdb")
        == "SELECT try_element_at(`My Arr`, nullif(1, 0)) FROM t"
    )
    # BigQuery double quotes are STRINGS — untouched semantics
    out = transpile('SELECT SPLIT("a.b", ".") AS p', "bigquery")
    assert spark.sql(out).collect()[0].p == ["a", "b"]


def test_to_timestamp_on_timestamp_and_date_columns(spark):
    # TRY_CAST(ts AS BIGINT) fails ANALYSIS — the epoch probe must go
    # through STRING, and timestamp inputs keep sub-second precision.
    out = transpile(
        "SELECT TO_TIMESTAMP(ts) AS a, TO_TIMESTAMP(d) AS b FROM "
        "(SELECT TIMESTAMP '2024-01-01 12:00:00.123' AS ts, "
        "DATE '2024-03-05' AS d)",
        "snowflake",
    )
    row = spark.sql(out).collect()[0]
    assert str(row.a) == "2024-01-01 12:00:00.123000"
    assert str(row.b) == "2024-03-05 00:00:00"


def test_flatten_unnest_quoted_aliases(spark):
    out = transpile(
        'SELECT f.value FROM (SELECT array(1) AS arr) t, '
        'LATERAL FLATTEN(input => arr) "f"',
        "snowflake",
    )
    assert spark.sql(out).collect()[0][0] == 1
    out = transpile(
        "SELECT e FROM (SELECT array(2) AS arr) t, UNNEST(arr) AS `e`",
        "bigquery",
    )
    assert spark.sql(out).collect()[0][0] == 2


def test_snowflake_real_is_double_single_pass():
    # overlay entry, not the accidental two-pass real→FLOAT→DOUBLE chain
    from sqlmesh_spark.core.transpile import _type_map

    assert _type_map("snowflake")["real"] == "DOUBLE"


# ---------------------------------------------------------------------------
# Sixth-pass review regressions
# ---------------------------------------------------------------------------


def test_bigquery_two_arg_log_base_order(spark):
    # BigQuery LOG(x, base) — Spark log() takes (base, expr); the ln-ratio
    # rewrite keeps BigQuery's order AND is idempotent under re-transpile.
    out = transpile("SELECT LOG(100, 10) AS v", "bigquery")
    assert transpile(out, "bigquery") == out
    assert spark.sql(out).collect()[0][0] == 2.0
    # 1-arg LOG is ln in both — untouched.
    assert transpile("SELECT LOG(x) FROM t", "bigquery") == "SELECT LOG(x) FROM t"


def test_snowflake_to_timestamp_fractional_epoch(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        out = transpile(
            "SELECT TO_TIMESTAMP(1687000000.5) AS ts, "
            "TO_TIMESTAMP(1687000000500.25) AS tm",
            "snowflake",
        )
        row = spark.sql(out).collect()[0]
        assert row.ts.microsecond == 500000 and row.ts.year == 2023
        # millis-magnitude fractional epoch keeps sub-milli precision
        assert row.tm.microsecond == 500250
        # DOUBLE column (not just literals) routes through the epoch branch
        spark.sql("SELECT CAST(1687000000.5 AS DOUBLE) AS e").createOrReplaceTempView(
            "_frac_epoch"
        )
        got = spark.sql(
            transpile("SELECT TO_TIMESTAMP(e) AS ts FROM _frac_epoch", "snowflake")
        ).collect()[0]
        assert got.ts.microsecond == 500000
    finally:
        spark.conf.unset("spark.sql.session.timeZone")
        spark.catalog.dropTempView("_frac_epoch")


def test_bigquery_join_unnest_on_true(spark):
    # INNER/bare JOIN UNNEST ... ON TRUE is legal BigQuery — the ON TRUE
    # must be swallowed, not left orphaned after LATERAL VIEW.
    for j in ("JOIN", "INNER JOIN", "CROSS JOIN"):
        out = transpile(
            f"SELECT e FROM (SELECT array(1, 2) AS arr) t {j} UNNEST(arr) AS e ON TRUE"
            if j != "CROSS JOIN"
            else f"SELECT e FROM (SELECT array(1, 2) AS arr) t {j} UNNEST(arr) AS e",
            "bigquery",
        )
        assert "ON" not in out.split("LATERAL")[1].upper().split("AS")[1]
        assert [r[0] for r in spark.sql(out).collect()] == [1, 2]
    for bad in (
        "SELECT e FROM t RIGHT JOIN UNNEST(t.arr) e ON TRUE",
        "SELECT e FROM t FULL OUTER JOIN UNNEST(t.arr) e ON TRUE",
        "SELECT e FROM t JOIN UNNEST(t.arr) e ON e > 1",
    ):
        with pytest.raises(TranspileError):
            transpile(bad, "bigquery")


def test_bigquery_trunc_units_loud_and_extended(spark):
    # Spark-native MILLISECOND/MICROSECOND and Monday-start weeks transpile;
    # Sunday weeks, ISOYEAR, and the timezone form raise at render.
    out = transpile("SELECT TIMESTAMP_TRUNC(ts, MILLISECOND) AS t FROM v", "bigquery")
    assert "date_trunc('millisecond'" in out
    assert "date_trunc('week'" in transpile("SELECT DATE_TRUNC(d, ISOWEEK) FROM v", "bigquery")
    assert "date_trunc('week'" in transpile(
        "SELECT DATE_TRUNC(d, WEEK(MONDAY)) FROM v", "bigquery"
    )
    for bad in (
        "SELECT DATE_TRUNC(d, WEEK) FROM v",
        "SELECT DATE_TRUNC(d, ISOYEAR) FROM v",
        "SELECT DATE_TRUNC(d, WEEK(SUNDAY)) FROM v",
        "SELECT TIMESTAMP_TRUNC(ts, DAY, 'America/New_York') FROM v",
    ):
        with pytest.raises(TranspileError):
            transpile(bad, "bigquery")


def test_snowflake_editdistance_capped(spark):
    out = transpile(
        "SELECT EDITDISTANCE('abc', 'xyz', 2) AS a, "
        "EDITDISTANCE('abc', 'abd', 2) AS b, "
        "EDITDISTANCE('abc', 'xyz', 0) AS c, "
        "EDITDISTANCE('abc', 'abd') AS d",
        "snowflake",
    )
    row = spark.sql(out).collect()[0]
    # Snowflake caps at max_distance; Spark's raw 3-arg form returns -1.
    assert (row.a, row.b, row.c, row.d) == (2, 1, 0, 1)
    with pytest.raises(TranspileError):
        transpile("SELECT EDITDISTANCE(a, b, -2) FROM t", "snowflake")
    with pytest.raises(TranspileError):
        transpile("SELECT EDITDISTANCE(a, b, n) FROM t", "snowflake")


def test_escape_dialect_depends_on_and_lineage():
    # Backslash-escaped literals must lex structurally (not drop to the
    # regex fallback that scans literals/comments for phantom deps).
    from sqlmesh_spark.core.model import extract_depends_on
    from sqlmesh_spark.core.sqlparse import query_lineage

    q = (
        "SELECT name FROM raw.users "
        "WHERE name = 'O\\'Brien' AND note != 'FROM fake.table'"
    )
    for d in ("snowflake", "bigquery"):
        deps = extract_depends_on(q, dialect=d)
        assert deps == frozenset({"raw.users"})
        lin = query_lineage(q, d)
        assert ("raw.users", "name") in lin["name"]
    # bigquery double-quoted STRINGS lex as strings, not identifiers
    deps = extract_depends_on(
        'SELECT x FROM raw.t WHERE y = "FROM phantom.tbl"', dialect="bigquery"
    )
    assert deps == frozenset({"raw.t"})


# ---------------------------------------------------------------------------
# regexp_replace fidelity + dialect breadth batch
# ---------------------------------------------------------------------------


def test_regexp_replace_scope_and_backrefs(spark):
    # duckdb/postgres default to FIRST-only replacement (Spark replaces
    # all): 3-arg raises; the 'g' flag rewrites to Spark's position arg so
    # the output is a fixpoint under re-transpile.
    out = transpile("SELECT regexp_replace('a  b  c', ' +', '_', 'g') AS v", "duckdb")
    assert transpile(out, "duckdb") == out
    assert spark.sql(out).collect()[0][0] == "a_b_c"
    out = transpile(
        r"SELECT regexp_replace('ab', '(a)(b)', '\2\1', 'g') AS v", "postgres"
    )
    assert spark.sql(out).collect()[0][0] == "ba"
    with pytest.raises(TranspileError):
        transpile("SELECT regexp_replace(s, ' +', ' ') FROM t", "duckdb")
    with pytest.raises(TranspileError):
        transpile("SELECT regexp_replace(s, ' +', ' ', 'i') FROM t", "duckdb")
    with pytest.raises(TranspileError):
        transpile("SELECT regexp_replace(s, 'x', col, 'g') FROM t", "duckdb")
    # ansi carries no first-only contract — passthrough
    sql = "SELECT regexp_replace(s, 'a', 'b') FROM t"
    assert transpile(sql, "ansi") == sql


def test_regexp_replace_snowflake_bigquery(spark):
    # snowflake 2-arg strips matches; 3-arg converts \1 backrefs to $1
    out = transpile("SELECT regexp_replace('a1b2', '[0-9]') AS v", "snowflake")
    assert spark.sql(out).collect()[0][0] == "ab"
    out = transpile(
        r"SELECT regexp_replace('cost: 5', '(\\d+)', '\\1 USD') AS v", "snowflake"
    )
    assert spark.sql(out).collect()[0][0] == "cost: 5 USD"
    with pytest.raises(TranspileError):
        transpile("SELECT regexp_replace(s, 'p', 'r', 2) FROM t", "snowflake")
    out = transpile(
        r"SELECT REGEXP_REPLACE('a1.b2.', r'(\d)\.', r'[\1]') AS v", "bigquery"
    )
    assert spark.sql(out).collect()[0][0] == "a[1]b[2]"


def test_bigquery_raw_string_literals(spark):
    out = transpile(r"SELECT REGEXP_CONTAINS('foo bar', r'\bfoo\b') AS v", "bigquery")
    assert spark.sql(out).collect()[0][0] is True
    with pytest.raises(TranspileError):
        transpile(r"SELECT b'\x01' FROM t", "bigquery")


def test_snowflake_split_plain_separator(spark):
    out = transpile("SELECT split('a.b.c', '.') AS v", "snowflake")
    assert spark.sql(out).collect()[0][0] == ["a", "b", "c"]
    with pytest.raises(TranspileError):
        transpile("SELECT split(s, sep_col) FROM t", "snowflake")


def test_snowflake_iso_week_functions(spark):
    out = transpile(
        "SELECT dayofweekiso(DATE'2026-08-14') AS dw, "
        "yearofweekiso(DATE'2021-01-01') AS yw, "
        "WEEKISO(DATE'2021-01-01') AS wk",
        "snowflake",
    )
    row = spark.sql(out).collect()[0]
    assert (row.dw, row.yw, row.wk) == (5, 2020, 53)  # Friday; ISO 2020-W53
    with pytest.raises(TranspileError):
        transpile("SELECT DAYOFWEEK(d) FROM t", "snowflake")
    with pytest.raises(TranspileError):
        transpile("SELECT WEEK(d) FROM t", "snowflake")


def test_snowflake_bit_double_names(spark):
    out = transpile(
        "SELECT BITAND(12, 10) AS a, BITOR(12, 10) AS o, BITXOR(12, 10) AS x, "
        "TO_DOUBLE('1.5') AS d, TRY_TO_DOUBLE('nope') AS n",
        "snowflake",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.o, row.x, row.d, row.n) == (8, 14, 6, 1.5, None)
    # abbreviated day/month names, unlike duckdb's full forms
    out = transpile(
        "SELECT DAYNAME(DATE'2026-08-14') AS d, MONTHNAME(DATE'2026-08-14') AS m",
        "snowflake",
    )
    assert tuple(spark.sql(out).collect()[0]) == ("Fri", "Aug")


def test_bigquery_array_agg(spark):
    out = transpile(
        "SELECT ARRAY_AGG(x) AS xs FROM (SELECT 1 AS x UNION ALL SELECT 2) GROUP BY 'k'",
        "bigquery",
    )
    assert sorted(spark.sql(out).collect()[0][0]) == [1, 2]


def test_dotted_function_calls_not_renamed():
    # schema.fn(...) is a qualified UDF — the builtin maps must not rename
    # its last segment; BigQuery's SAFE. prefix is LOUD.
    sql = "SELECT s.epoch(x) FROM t"
    assert transpile(sql, "duckdb") == sql
    with pytest.raises(TranspileError):
        transpile("SELECT SAFE.LOG(x, 10) FROM t", "bigquery")


# ---------------------------------------------------------------------------
# Seventh-pass review regressions
# ---------------------------------------------------------------------------


def test_editdistance_null_inputs_stay_null(spark):
    out = transpile(
        "SELECT EDITDISTANCE(NULL, 'abc', 5) AS a, "
        "EDITDISTANCE('abc', NULL, 5) AS b, "
        "EDITDISTANCE('abc', 'xyz', 2) AS c",
        "snowflake",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c) == (None, None, 2)


def test_regexp_replace_backslash_pattern_fixpoint():
    # the 'g'→position-1 rewrite must be a true fixpoint even when the
    # pattern contains backslashes (the passthrough arm owns the literals
    # so the doubling pass cannot re-double them)
    out1 = transpile(r"SELECT regexp_replace(s, '\d', 'x', 'g') FROM t", "duckdb")
    assert transpile(out1, "duckdb") == out1
    assert r"'\\d'" in out1


def test_unicode_escapes_decode(spark):
    # \uXXXX and \0 decode in snowflake/bigquery literal content
    out = transpile("SELECT split(s, '\\u002E') FROM t", "snowflake")
    assert spark.sql(
        out.replace("FROM t", "FROM (SELECT 'a.b' AS s)")
    ).collect()[0][0] == ["a", "b"]


def test_fingerprint_lexes_dialect_literals():
    # escaped-quote literals must lex structurally so literal edits
    # produce a DIFFERENT fingerprint (regex fallback lowercases text
    # and would conflate them → stale snapshots that never re-run)
    from sqlmesh_spark.core.snapshot import _normalize_sql

    a = _normalize_sql(r"SELECT 'O\'Brien' AS n FROM t", "snowflake")
    b = _normalize_sql(r"SELECT 'O\'BRIEN' AS n FROM t", "snowflake")
    assert a != b


def test_categorize_dialect_literals():
    # additive projection change on a snowflake model with an escaped
    # literal must still categorize NON_BREAKING via the token path
    from sqlmesh_spark.core.plan import _categorize

    old = r"SELECT a FROM t WHERE n = 'O\'Brien'"
    new = r"SELECT a, b FROM t WHERE n = 'O\'Brien'"
    assert _categorize(old, new, "snowflake") == "NON_BREAKING"


# ---------------------------------------------------------------------------
# Eighth-pass review regressions
# ---------------------------------------------------------------------------


def test_postgres_numeric_fourth_arg_regexp_replace_loud():
    # PG 15's regexp_replace(src, pat, rep, START) is first-match-only —
    # it must NOT ride the duckdb already-Spark passthrough arm (which
    # would also disable backslash doubling in its pattern).
    with pytest.raises(TranspileError):
        transpile(r"SELECT regexp_replace(s, '\d+', 'x', 2) FROM t", "postgres")
    # duckdb keeps the passthrough (its own 'g'→1 output round-trips)
    sql = r"SELECT regexp_replace(s, '\\d+', 'x', 1) FROM t"
    assert transpile(sql, "duckdb") == sql


def test_escape_decoding_per_dialect():
    from sqlmesh_spark.core.transpile import _literal_content

    # bigquery octal is exactly three digits; \011 = TAB, bare \0 is LOUD
    assert _literal_content(r"'a\011b'", "bigquery") == "a\tb"
    with pytest.raises(TranspileError):
        _literal_content(r"'a\0b'", "bigquery")
    # snowflake \0 is NUL, \x41 is 'A'
    assert _literal_content(r"'a\0b'", "snowflake") == "a\0b"
    assert _literal_content(r"'\x41'", "snowflake") == "A"
    # \uXXXX surrogate pairs combine; lone surrogates are LOUD
    assert _literal_content(r"'\ud83d\ude00'", "snowflake") == "\U0001F600"
    with pytest.raises(TranspileError):
        _literal_content(r"'\ud83d'", "snowflake")
    with pytest.raises(TranspileError):
        _literal_content(r"'\ude00x'", "bigquery")


def test_editdistance_single_levenshtein_call():
    out = transpile("SELECT EDITDISTANCE(a, b, 3) FROM t", "snowflake")
    assert out.count("levenshtein") == 1


# ---------------------------------------------------------------------------
# Ninth-pass review regressions
# ---------------------------------------------------------------------------


def test_passthrough_literals_reencode_for_spark(spark):
    # Spark's parser has no \x or \f escape (it drops the backslash) —
    # untouched snowflake/bigquery literals containing backslashes must
    # re-emit in Spark-safe form, not pass through raw.
    out = transpile(r"SELECT '\x41' AS a FROM (SELECT 1)", "snowflake")
    assert spark.sql(out).collect()[0][0] == "A"
    out = transpile(r"SELECT length('\f') AS n FROM (SELECT 1)", "snowflake")
    assert spark.sql(out).collect()[0][0] == 1
    # common regex escapes round-trip byte-identical
    sql = r"SELECT '\\d+' AS r FROM t"
    assert transpile(sql, "snowflake") == sql
    # bigquery octal in a plain (non-handler) literal position
    out = transpile(r"SELECT '\011' AS t FROM (SELECT 1)", "bigquery")
    assert spark.sql(out).collect()[0][0] == "\t"


def test_bigquery_valid_escape_breadth():
    from sqlmesh_spark.core.transpile import _literal_content

    assert _literal_content(r"'\x2c\X41'", "bigquery") == ",A"
    assert _literal_content(r"'\U0001F600'", "bigquery") == "\U0001F600"
    assert _literal_content(r"'\a\v\?'", "bigquery") == "\a\v?"
    # bigquery forbids surrogate code points in \u (snowflake pairs them)
    pair = "'" + chr(92) + "ud83d" + chr(92) + "ude00'"
    assert _literal_content(pair, "snowflake") == "\U0001F600"
    with pytest.raises(TranspileError):
        _literal_content(pair, "bigquery")


def test_bigquery_triple_quoted_strings(spark):
    # triple-quoted literals fold into one token; inside them quote chars
    # are literal (no doubling) and only backslash escapes apply
    out = transpile("SELECT '''a\\nb''' AS v FROM (SELECT 1)", "bigquery")
    assert spark.sql(out).collect()[0][0] == "a\nb"
    out = transpile('SELECT """x\\ty""" AS v FROM (SELECT 1)', "bigquery")
    assert spark.sql(out).collect()[0][0] == "x\ty"


def test_bigquery_triple_quote_embedded_quotes(spark):
    # a lone quote inside a triple-quoted string must lex as ONE token
    # (the doubling fold would split it) and re-encode Spark-safe even
    # without any backslash in the literal
    out = transpile('SELECT """say "hi" ok""" AS v FROM (SELECT 1)', "bigquery")
    assert spark.sql(out).collect()[0][0] == 'say "hi" ok'
    out = transpile("SELECT '''it's fine''' AS v FROM (SELECT 1)", "bigquery")
    assert spark.sql(out).collect()[0][0] == "it's fine"
    # snowflake: '''abc''' is the standard doubling fold — content keeps
    # the quotes
    from sqlmesh_spark.core.transpile import _literal_content

    assert _literal_content("'''abc'''", "snowflake") == "'abc'"


def test_triple_quoted_literals_in_handlers(spark):
    # handlers must decode literal CONTENT via _literal_content/_raw_body,
    # not a one-character [1:-1] slice — triple-quoted tokens otherwise
    # bake stray quotes into separators/formats/replacements
    SQ3 = "'" * 3

    def run(sql):
        return spark.sql(transpile(sql, "bigquery")).collect()[0][0]

    assert run(f"SELECT SPLIT('a,b,c', {SQ3},{SQ3}) AS v") == ["a", "b", "c"]
    assert run(f"SELECT FORMAT_DATE({SQ3}%Y%m%d{SQ3}, DATE '2024-03-05') AS v") == "20240305"
    assert run(f"SELECT REGEXP_CONTAINS('x123', r{SQ3}\\d+{SQ3}) AS v") is True
    assert run(f"SELECT REGEXP_REPLACE('a1', '(\\\\d)', r{SQ3}[\\1]{SQ3}) AS v") == "a[1]"
    assert str(run(f"SELECT PARSE_DATE({SQ3}%Y{SQ3}, '2024') AS v")) == "2024-01-01"
    # escaped separators decode instead of raising
    assert run("SELECT SPLIT('a\\tb', '\\t') AS v") == ["a", "b"]


def test_format_literals_preserve_backslashes(spark):
    # decoded format content must re-emit through the shared Spark
    # emitter — quote-only doubling silently ate literal backslashes
    out = transpile("SELECT FORMAT_DATE('%Y\\\\%m', DATE '2024-03-05') AS v", "bigquery")
    assert spark.sql(out).collect()[0][0] == "2024\\03"
    out = transpile("SELECT PARSE_DATE('%Y\\\\%m', '2024\\\\03') AS v", "bigquery")
    assert str(spark.sql(out).collect()[0][0]) == "2024-03-01"
    out = transpile("SELECT TO_VARCHAR(DATE '2024-03-05', 'YYYY\\\\MM') AS v", "snowflake")
    assert spark.sql(out).collect()[0][0] == "2024\\03"
    # std-literal dialect: single backslash char in the format
    out = transpile(r"SELECT strftime(DATE '2024-03-05', '%Y\%m') AS v", "duckdb")
    assert spark.sql(out).collect()[0][0] == "2024\\03"


def test_quote_leading_literals_relex_per_grammar(spark):
    # emissions must re-lex under the READ grammar on later fixpoint
    # passes: a ''-doubled quote-leading literal would open a bigquery
    # triple-quote span across tokens — esc dialects emit \' instead
    BS, SQ = chr(92), chr(39)
    out = transpile(f"SELECT '{BS}{SQ}a' AS x, '{BS}{SQ}b' AS y", "bigquery")
    assert [tuple(r) for r in spark.sql(out).collect()] == [("'a", "'b")]
    out = transpile(
        "SELECT FORMAT_DATE('T%Y', DATE '2024-03-05') AS a, "
        "FORMAT_DATE('T%m', DATE '2024-03-05') AS b",
        "bigquery",
    )
    assert tuple(spark.sql(out).collect()[0]) == ("T2024", "T03")
    # std grammar keeps '' doubling (it cannot lex backslash-quote)
    out = transpile(
        "SELECT strftime(DATE '2024-03-05', 'T%Y') AS v", "duckdb"
    )
    assert spark.sql(out).collect()[0][0] == "T2024"


def test_raw_string_reemission_per_grammar(spark):
    # the raw-string re-emitter must use the shared per-grammar emitter:
    # '' doubling on quote-leading raw content formed bigquery
    # triple-quote runs on the next fixpoint pass
    BS, SQ = chr(92), chr(39)
    out = transpile(f'SELECT r"{BS}{SQ}a" AS x, r"{BS}{SQ}b" AS y', "bigquery")
    assert [tuple(r) for r in spark.sql(out).collect()] == [("\\'a", "\\'b")]


# ---------------------------------------------------------------------------
# Redshift read dialect (round-5: second-largest warehouse migration source;
# reference renderer.py:517 / dialect.py:1040 accept it like any other)
# ---------------------------------------------------------------------------


def test_redshift_function_renames():
    out = transpile(
        "SELECT LEN(x) AS a, CHARINDEX('q', x) AS b, STRPOS(x, 'q') AS c, "
        "NVL(x, y) AS d FROM t",
        "redshift",
    )
    assert "length(x)" in out
    assert "position('q', x)" in out
    assert "instr(x, 'q')" in out
    assert "NVL(x, y)" in out  # identical in Spark — untouched


def test_redshift_getdate_sysdate_utc(spark):
    out = transpile("SELECT GETDATE() AS g, SYSDATE AS s", "redshift")
    assert out.count("to_utc_timestamp(current_timestamp()") == 2
    row = spark.sql(out).collect()[0]
    assert row.g is not None and row.s is not None


def test_redshift_dateadd_datediff_bare_units(spark):
    out = transpile(
        "SELECT DATEDIFF(month, DATE '2024-01-31', DATE '2024-02-01') AS d, "
        "DATEADD(day, 3, DATE '2024-01-01') AS a",
        "redshift",
    )
    row = spark.sql(out).collect()[0]
    # Redshift datediff counts BOUNDARY CROSSINGS: Jan-31 → Feb-01 is 1
    assert row.d == 1
    assert str(row.a).startswith("2024-01-04")


def test_redshift_to_char_pg_patterns(spark):
    out = transpile(
        "SELECT TO_CHAR(TIMESTAMP '2024-03-05 07:08:09', "
        "'YYYY-MM-DD HH24:MI:SS') AS v",
        "redshift",
    )
    assert spark.sql(out).collect()[0][0] == "2024-03-05 07:08:09"


def test_redshift_convert_to_cast(spark):
    out = transpile(
        "SELECT CONVERT(INTEGER, '42') AS a, CONVERT(DECIMAL(10,2), '1.5') AS b",
        "redshift",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == 42
    assert float(row.b) == 1.5


def test_redshift_json_extract_path_text(spark):
    out = transpile(
        """SELECT JSON_EXTRACT_PATH_TEXT('{"a": {"b": "v"}}', 'a', 'b') AS v""",
        "redshift",
    )
    assert spark.sql(out).collect()[0][0] == "v"
    # trailing null_if_invalid flag is dropped
    out2 = transpile(
        """SELECT JSON_EXTRACT_PATH_TEXT('{"a": 1}', 'a', true) AS v""",
        "redshift",
    )
    assert spark.sql(out2).collect()[0][0] == "1"


def test_redshift_trim_family_arg_order(spark):
    # Redshift/PG (str, chars) vs Spark 2-arg (trimStr, str): must rewrite
    # to keyword TRIM or the wrong operand is trimmed silently.
    out = transpile(
        "SELECT LTRIM('xyhix', 'xy') AS l, RTRIM('hixyx', 'xy') AS r, "
        "BTRIM('xyhixy', 'xy') AS b",
        "redshift",
    )
    row = spark.sql(out).collect()[0]
    assert (row.l, row.r, row.b) == ("hix", "hi", "hi")


def test_duckdb_trim_two_arg_parity(spark):
    # same latent seam existed for duckdb/postgres reads — execution parity
    import duckdb

    sql = "SELECT ltrim('xyhix', 'xy') AS l, trim('xyhixy', 'xy') AS b"
    want = duckdb.sql(sql).fetchone()
    got = tuple(spark.sql(transpile(sql, "duckdb")).collect()[0])
    assert got == want


def test_redshift_escape_literals(spark):
    # octal + hex + unknown-escape-drops-backslash (PG 8.0 rules)
    out = transpile(r"SELECT '\101\x42' AS a, '\d' AS b", "redshift")
    row = spark.sql(out).collect()[0]
    assert row.a == "AB"
    assert row.b == "d"


def test_redshift_qualify(spark):
    out = transpile(
        "SELECT * FROM VALUES (1, 10), (1, 20) AS t(g, v) "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC) = 1",
        "redshift",
    )
    assert [tuple(r) for r in spark.sql(out).collect()] == [(1, 20)]


def test_redshift_loud_surface():
    for sql in (
        "SELECT STRTOL('ff', 16) FROM t",
        "SELECT TRUNC(ts) FROM t",
        "SELECT CAST(x AS SUPER) FROM t",
        "SELECT SYSDATE() FROM t",
    ):
        with pytest.raises(TranspileError):
            transpile(sql, "redshift")


def test_decode_passthrough_snowflake_redshift(spark):
    # Snowflake/Redshift DECODE is the Oracle NULL-safe comparison form —
    # exactly Spark's decode, so it passes through.
    sql = "SELECT DECODE(NULL, NULL, 'null-match', 'other') AS v"
    for d in ("snowflake", "redshift"):
        assert transpile(sql, d) == sql
    assert spark.sql(sql).collect()[0][0] == "null-match"


# ---------------------------------------------------------------------------
# MySQL read dialect (most common OLTP migration source)
# ---------------------------------------------------------------------------


def test_mysql_date_format_codes(spark):
    out = transpile(
        "SELECT DATE_FORMAT(TIMESTAMP '2024-03-05 07:08:09', "
        "'%Y-%m-%d %H:%i:%s') AS v",
        "mysql",
    )
    assert spark.sql(out).collect()[0][0] == "2024-03-05 07:08:09"


def test_mysql_date_format_names_and_12h(spark):
    out = transpile(
        "SELECT DATE_FORMAT(TIMESTAMP '2024-03-05 13:08:09', "
        "'%M %b %W %a %h %p') AS v",
        "mysql",
    )
    assert spark.sql(out).collect()[0][0] == "March Mar Tuesday Tue 01 PM"


def test_mysql_str_to_date_date_vs_datetime(spark):
    out = transpile(
        "SELECT STR_TO_DATE('05,3,2024', '%d,%c,%Y') AS d, "
        "STR_TO_DATE('2024-03-05 07:08', '%Y-%m-%d %H:%i') AS ts",
        "mysql",
    )
    assert "to_date(" in out and "to_timestamp(" in out
    row = spark.sql(out).collect()[0]
    assert str(row.d) == "2024-03-05"
    assert str(row.ts) == "2024-03-05 07:08:00"


def test_mysql_group_concat(spark):
    out = transpile(
        "SELECT g, GROUP_CONCAT(v SEPARATOR '|') AS s "
        "FROM VALUES (1,'a'),(1,'b'),(2,'c') AS t(g, v) GROUP BY g",
        "mysql",
    )
    rows = {r.g: r.s for r in spark.sql(out).collect()}
    assert set(rows[1].split("|")) == {"a", "b"}
    assert rows[2] == "c"
    # default separator is ','
    out2 = transpile(
        "SELECT GROUP_CONCAT(v) AS s FROM VALUES ('a'),('a'),('b') AS t(v)",
        "mysql",
    )
    assert set(spark.sql(out2).collect()[0][0].split(",")) == {"a", "b"}
    # DISTINCT folds duplicates
    out3 = transpile(
        "SELECT GROUP_CONCAT(DISTINCT v) AS s "
        "FROM VALUES ('a'),('a'),('b') AS t(v)",
        "mysql",
    )
    assert sorted(spark.sql(out3).collect()[0][0].split(",")) == ["a", "b"]


def test_mysql_interval_arithmetic(spark):
    out = transpile(
        "SELECT DATE_ADD(DATE '2024-01-01', INTERVAL 2 WEEK) AS a, "
        "DATE_SUB(TIMESTAMP '2024-01-10 00:00:00', INTERVAL 9 DAY) AS s, "
        "ADDDATE(DATE '2024-01-01', 5) AS p",
        "mysql",
    )
    row = spark.sql(out).collect()[0]
    assert str(row.a).startswith("2024-01-15")
    assert str(row.s).startswith("2024-01-01")
    assert str(row.p) == "2024-01-06"


def test_mysql_interval_expression_quantity(spark):
    # MySQL allows expression quantities; Spark INTERVAL literals don't —
    # the timestampadd rewrite must carry the expression through.
    out = transpile(
        "SELECT DATE_ADD(DATE '2024-01-01', INTERVAL n + 1 DAY) AS v "
        "FROM VALUES (1) AS t(n)",
        "mysql",
    )
    assert str(spark.sql(out).collect()[0][0]).startswith("2024-01-03")


def test_mysql_length_is_bytes(spark):
    out = transpile("SELECT LENGTH('héllo') AS b, CHAR_LENGTH('héllo') AS c", "mysql")
    row = spark.sql(out).collect()[0]
    assert (row.b, row.c) == (6, 5)


def test_mysql_pipes_are_or(spark):
    out = transpile(
        "SELECT v FROM VALUES (1),(2),(3) AS t(v) WHERE v = 1 || v = 3",
        "mysql",
    )
    assert sorted(r.v for r in spark.sql(out).collect()) == [1, 3]


def test_mysql_limit_offset_form(spark):
    out = transpile(
        "SELECT v FROM VALUES (1),(2),(3),(4) AS t(v) ORDER BY v LIMIT 1, 2",
        "mysql",
    )
    assert [r.v for r in spark.sql(out).collect()] == [2, 3]


def test_mysql_hash_comments(spark):
    out = transpile(
        "SELECT 1 AS v # trailing\nFROM range(1) # another", "mysql"
    )
    assert "# trailing" not in out and "-- trailing" in out
    assert spark.sql(out).collect()[0][0] == 1
    # '#' inside a literal is NOT a comment
    keep = transpile("SELECT '#tag' AS v", "mysql")
    assert keep == "SELECT '#tag' AS v"


def test_mysql_identifier_and_string_quoting(spark):
    out = transpile('SELECT `v` AS a, "lit" AS b FROM VALUES (7) AS t(v)', "mysql")
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b) == (7, "lit")


def test_mysql_escape_rules():
    # \% and \_ keep the backslash (two-char output); \d drops it; \Z is
    # ctrl-Z; doubled '' still folds
    out = transpile(r"SELECT 'p\%q' AS a, '\d' AS b, 'it''s' AS c", "mysql")
    assert r"'p\\%q'" in out
    assert "'d'" in out
    # no backslash → untouched; ''-doubling is valid Spark as-is
    assert "'it''s'" in out


def test_mysql_cast_targets(spark):
    out = transpile(
        "SELECT CAST('12' AS UNSIGNED) AS u, CAST(3.7 AS CHAR) AS c, "
        "CAST('2024-01-01 01:02:03' AS DATETIME) AS d",
        "mysql",
    )
    row = spark.sql(out).collect()[0]
    assert int(row.u) == 12
    assert row.c == "3.7"
    assert str(row.d) == "2024-01-01 01:02:03"


def test_mysql_misc_passthrough_and_renames(spark):
    out = transpile(
        "SELECT IFNULL(NULL, 'x') AS a, SUBSTRING_INDEX('a.b.c', '.', 2) AS b, "
        "FORMAT(12345.678, 1) AS c, WEEKDAY(DATE '2024-03-05') AS d, "
        "TIMESTAMPDIFF(MONTH, DATE '2024-01-15', DATE '2024-03-14') AS e",
        "mysql",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == "x"
    assert row.b == "a.b"
    assert row.c == "12,345.7"
    assert row.d == 1  # Tuesday, 0=Monday in both engines
    assert row.e == 1  # complete months — MySQL semantics match Spark


def test_mysql_loud_surface():
    for sql in (
        "SELECT a XOR b FROM t",
        "SELECT j->'$.a' FROM t",
        "SELECT WEEK(d) FROM t",
        "SELECT LEAST(a, b) FROM t",          # NULL handling differs
        "SELECT GROUP_CONCAT(v ORDER BY v) FROM t",
        "SELECT DATE_FORMAT(d, '%D') FROM t",  # ordinal-suffix day
        "SELECT DATE_FORMAT(d, 'abc') FROM t",  # no %-codes + letters
        "SELECT CAST(x AS JSON) FROM t",
        "SELECT arr[1] FROM t",
        "SELECT DATE_ADD(d, INTERVAL 1 SECOND_MICROSECOND) FROM t",
    ):
        with pytest.raises(TranspileError):
            transpile(sql, "mysql")


def test_new_dialects_in_noop_corpus():
    # redshift joins the full no-op guarantee; mysql no-ops everything
    # except date_format (that NAME is claimed by MySQL's own %-code
    # semantics, where an already-Java pattern is ambiguous → loud).
    corpus = [
        "SELECT a, SUM(b) AS s FROM t WHERE c >= DATE '2024-01-01' GROUP BY a",
        "WITH x AS (SELECT 1 AS a) SELECT a, ROW_NUMBER() OVER (ORDER BY a) FROM x",
        "SELECT timestampdiff(DAY, a, b), date_trunc('month', ts) FROM t",
        "SELECT /* block */ concat_ws('-', a, b) AS k FROM t ORDER BY k LIMIT 5",
    ]
    for sql in corpus:
        assert transpile(sql, "redshift") == _with_nulls(sql, "redshift"), sql
        assert transpile(sql, "mysql") == sql, sql
    assert (
        transpile("SELECT date_format(ts, 'yyyy-MM') AS ym FROM t", "redshift")
        == "SELECT date_format(ts, 'yyyy-MM') AS ym FROM t"
    )
    with pytest.raises(TranspileError):
        transpile("SELECT date_format(ts, 'yyyy-MM') AS ym FROM t", "mysql")


def test_mysql_from_unixtime_shared_name_rule(spark):
    out = transpile("SELECT FROM_UNIXTIME(86400, '%Y-%m-%d') AS v", "mysql")
    assert spark.sql(out).collect()[0][0] == "1970-01-02"
    # double-transpile of our own Java-pattern output raises, never corrupts
    with pytest.raises(TranspileError):
        transpile(out, "mysql")
    # 1-arg passes through
    assert (
        transpile("SELECT FROM_UNIXTIME(e) FROM t", "mysql")
        == "SELECT FROM_UNIXTIME(e) FROM t"
    )


# ---------------------------------------------------------------------------
# Oracle read dialect (round-5b: classic enterprise migration source)
# ---------------------------------------------------------------------------


def test_oracle_passthrough_and_renames(spark):
    out = transpile(
        "SELECT NVL(NULL, 'x') AS a, DECODE(2, 1, 'one', 2, 'two', 'other') AS b, "
        "DECODE(NULL, NULL, 'null-match', 'other') AS c, "
        "MONTHS_BETWEEN(DATE '2024-03-15', DATE '2024-01-15') AS d, "
        "ADD_MONTHS(DATE '2024-01-31', 1) AS e FROM dual",
        "oracle",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == "x"
    assert row.b == "two"
    assert row.c == "null-match"   # Spark decode IS Oracle's NULL-safe form
    assert float(row.d) == 2.0
    assert str(row.e) == "2024-02-29"


def test_oracle_from_dual_removed(spark):
    out = transpile("SELECT 1 AS v FROM dual", "oracle")
    assert "dual" not in out.lower()
    assert spark.sql(out).collect()[0][0] == 1


def test_oracle_to_char_to_date_formats(spark):
    out = transpile(
        "SELECT TO_CHAR(TIMESTAMP '2024-03-05 07:08:09', 'YYYY-MM-DD HH24:MI') AS a, "
        "TO_DATE('05-03-2024', 'DD-MM-YYYY') AS b FROM dual",
        "oracle",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == "2024-03-05 07:08"
    assert str(row.b) == "2024-03-05"


def test_oracle_trunc_date_format(spark):
    out = transpile(
        "SELECT TRUNC(TIMESTAMP '2024-03-15 13:14:15', 'MM') AS m, "
        "TRUNC(TIMESTAMP '2024-03-15 13:14:15', 'YYYY') AS y FROM dual",
        "oracle",
    )
    row = spark.sql(out).collect()[0]
    assert str(row.m) == "2024-03-01 00:00:00"
    assert str(row.y) == "2024-01-01 00:00:00"


def test_oracle_minus_and_fetch_first(spark):
    out = transpile(
        "SELECT v FROM VALUES (1),(2),(3) AS t(v) "
        "MINUS SELECT v FROM VALUES (2) AS s(v)",
        "oracle",
    )
    assert sorted(r.v for r in spark.sql(out).collect()) == [1, 3]
    out2 = transpile(
        "SELECT v FROM VALUES (3),(1),(2) AS t(v) ORDER BY v "
        "FETCH FIRST 2 ROWS ONLY",
        "oracle",
    )
    assert [r.v for r in spark.sql(out2).collect()] == [1, 2]
    out3 = transpile(
        "SELECT v FROM VALUES (3),(1),(2),(4) AS t(v) ORDER BY v "
        "OFFSET 1 ROWS FETCH NEXT 2 ROWS ONLY",
        "oracle",
    )
    assert [r.v for r in spark.sql(out3).collect()] == [2, 3]


def test_oracle_types():
    out = transpile(
        "SELECT CAST(a AS NUMBER(12,2)), CAST(b AS VARCHAR2(30)), "
        "CAST(c AS BINARY_DOUBLE), CAST(d AS DATE), CAST(e AS TIMESTAMP(6)) "
        "FROM t",
        "oracle",
    )
    assert "DECIMAL(12,2)" in out
    assert "VARCHAR(30)" in out
    assert "DOUBLE" in out
    # Oracle DATE carries time-of-day; TIMESTAMP is zone-less
    assert out.count("TIMESTAMP_NTZ") == 2


def test_oracle_loud_surface():
    for sql in (
        "SELECT ROWNUM FROM t",
        "SELECT a FROM t1, t2 WHERE t1.k = t2.k (+)",
        "SELECT TRUNC(x) FROM t",
        "SELECT TO_NUMBER(s) FROM t",
        "SELECT CAST(x AS NUMBER) FROM t",       # bare NUMBER: unknown scale
        "SELECT LEAST(a, b) FROM t",             # NULL-propagation differs
        "SELECT SYS_GUID() FROM dual",
        "SELECT TO_DATE(s) FROM t",              # session NLS format
    ):
        with pytest.raises(TranspileError):
            transpile(sql, "oracle")


# ---------------------------------------------------------------------------
# T-SQL read dialect (round-5b: SQL Server migration source)
# ---------------------------------------------------------------------------


def test_tsql_bracket_identifiers(spark):
    out = transpile(
        'SELECT [v] AS [col one], [x]] y] FROM VALUES (1, 2) AS t([v], [x]] y])',
        "tsql",
    )
    row = spark.sql(out).collect()[0]
    assert row["col one"] == 1
    assert row["x] y"] == 2


def test_tsql_top_to_limit(spark):
    out = transpile(
        "SELECT TOP 2 v FROM VALUES (3),(1),(2) AS t(v) ORDER BY v", "tsql"
    )
    assert [r.v for r in spark.sql(out).collect()] == [1, 2]


def test_tsql_top_union_branch_parenthesized(spark):
    out = transpile(
        "SELECT v FROM VALUES (9) AS a(v) "
        "UNION ALL SELECT TOP 1 v FROM VALUES (1),(2) AS b(v)",
        "tsql",
    )
    # LIMIT must bind to the branch, not the whole union
    assert len(spark.sql(out).collect()) == 2


def test_tsql_functions(spark):
    out = transpile(
        "SELECT ISNULL(NULL, 'x') AS a, IIF(2 > 1, 'y', 'n') AS b, "
        "LEN('ab  ') AS c, DATALENGTH('héllo') AS d, "
        "REPLICATE('ab', 3) AS e, CHOOSE(2, 'p', 'q') AS f, "
        "SQUARE(3) AS g, EOMONTH(DATE '2024-02-05') AS h",
        "tsql",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == "x"
    assert row.b == "y"
    assert row.c == 2          # LEN ignores trailing spaces
    assert row.d == 6          # byte length
    assert row.e == "ababab"
    assert row.f == "q"
    assert float(row.g) == 9.0
    assert str(row.h) == "2024-02-29"


def test_tsql_date_functions(spark):
    out = transpile(
        "SELECT DATEADD(mm, 1, DATE '2024-01-15') AS a, "
        "DATEDIFF(dd, DATE '2024-01-01', DATE '2024-01-08') AS b, "
        "DATEDIFF(month, TIMESTAMP '2024-01-31 23:00:00', "
        "TIMESTAMP '2024-02-01 01:00:00') AS c, "
        "DATEPART(yy, DATE '2024-03-05') AS d, "
        "DATEPART(iso_week, DATE '2024-01-04') AS e, "
        "DATENAME(weekday, DATE '2024-03-05') AS f",
        "tsql",
    )
    row = spark.sql(out).collect()[0]
    assert str(row.a).startswith("2024-02-15")
    assert row.b == 7
    assert row.c == 1          # T-SQL datediff counts boundary crossings
    assert float(row.d) == 2024
    assert row.e == 1
    assert row.f == "Tuesday"


def test_tsql_convert(spark):
    out = transpile(
        "SELECT CONVERT(INT, '42') AS a, CONVERT(NVARCHAR(5), 123) AS b, "
        "TRY_CONVERT(INT, 'zzz') AS c",
        "tsql",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == 42
    assert row.b == "123"
    assert row.c is None


def test_tsql_types(spark):
    out = transpile(
        "SELECT CAST(200 AS TINYINT) AS a, CAST(1.5 AS MONEY) AS b, "
        "CAST('x' AS NVARCHAR(MAX)) AS c, "
        "CAST('2024-01-02 03:04:05.123' AS DATETIME2(3)) AS d",
        "tsql",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == 200        # T-SQL TINYINT is unsigned → SMALLINT
    assert float(row.b) == 1.5
    assert row.c == "x"
    assert str(row.d).startswith("2024-01-02 03:04:05")


def test_tsql_offset_fetch(spark):
    out = transpile(
        "SELECT v FROM VALUES (3),(1),(2),(4) AS t(v) ORDER BY v "
        "OFFSET 1 ROWS FETCH NEXT 2 ROWS ONLY",
        "tsql",
    )
    assert [r.v for r in spark.sql(out).collect()] == [2, 3]


def test_tsql_loud_surface():
    for sql in (
        "SELECT TOP 5 PERCENT a FROM t",
        "SELECT TOP 5 WITH TIES a FROM t ORDER BY a",
        "SELECT FORMAT(1234.5, 'N2') FROM t",  # .NET numeric tier
        "SELECT CONVERT(VARCHAR(10), d, 120) FROM t",  # style arg
        "SELECT ISNULL(a) FROM t",
        "SELECT DATEPART(dw, d) FROM t",               # DATEFIRST-dependent
        "SELECT DATEPART(week, d) FROM t",
        "SELECT CAST(x AS SQL_VARIANT) FROM t",
        "SELECT RAND(42) FROM t",                      # per-call vs per-row
        "SELECT HASHBYTES('MD5', x) FROM t",
    ):
        with pytest.raises(TranspileError):
            transpile(sql, "tsql")


def test_oracle_tsql_in_noop_corpus():
    corpus = [
        "SELECT a, SUM(b) AS s FROM t WHERE c >= DATE '2024-01-01' GROUP BY a",
        "WITH x AS (SELECT 1 AS a) SELECT a, ROW_NUMBER() OVER (ORDER BY a) FROM x",
        "SELECT /* block */ concat_ws('-', a, b) AS k FROM t ORDER BY k LIMIT 5",
    ]
    for sql in corpus:
        assert transpile(sql, "oracle") == _with_nulls(sql, "oracle"), sql
        assert transpile(sql, "tsql") == sql, sql


def test_tsql_unicode_literal_prefix(spark):
    out = transpile("SELECT N'héllo' AS v, n FROM VALUES (1) AS t(n)", "tsql")
    row = spark.sql(out).collect()[0]
    assert (row.v, row.n) == ("héllo", 1)


# ---------------------------------------------------------------------------
# Trino / Presto / Athena read dialect (ref engine_adapter/trino.py,
# athena.py — Athena engine v3 is Trino) + alias dialects
# ---------------------------------------------------------------------------


def test_trino_renames_execute(spark):
    out = transpile(
        "SELECT approx_distinct(n) AS a, arbitrary(n) AS b, "
        "strpos('hello', 'lo') AS c, codepoint('A') AS d, "
        "starts_with('hello', 'he') AS e, "
        "levenshtein_distance('kitten', 'sitting') AS f, "
        "format('%s=%d', 'n', 5) AS g, to_hex(to_utf8('AB')) AS h, "
        "from_utf8(to_utf8('hé')) AS i, is_nan(nan()) AS j "
        "FROM VALUES (1), (2) AS t(n)",
        "trino",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.c, row.d, row.e, row.f) == (2, 4, 65, True, 3)
    assert (row.g, row.h, row.i, row.j) == ("n=5", "4142", "hé", True)


def test_trino_date_functions(spark):
    out = transpile(
        "SELECT date_add('day', 3, DATE '2024-03-05') AS a, "
        "date_diff('month', DATE '2024-01-31', DATE '2024-02-01') AS b, "
        "date_diff('day', TIMESTAMP '2024-01-01 23:00:00', "
        "TIMESTAMP '2024-01-02 01:00:00') AS c, "
        "day_of_week(DATE '2024-03-05') AS d, "
        "year_of_week(DATE '2021-01-01') AS e, "
        "week(DATE '2024-01-04') AS f, "
        "last_day_of_month(DATE '2024-02-05') AS g",
        "trino",
    )
    row = spark.sql(out).collect()[0]
    assert str(row.a).startswith("2024-03-08")
    # Trino date_diff counts complete elapsed units, NOT boundary
    # crossings: Jan-31→Feb-01 is 0 months, 23:00→01:00 is 0 days.
    assert row.b == 0
    assert row.c == 0
    assert row.d == 2          # ISO: Tuesday = 2
    assert row.e == 2020       # ISO week year of 2021-01-01
    assert row.f == 1
    assert str(row.g) == "2024-02-29"


def test_trino_extract_fields(spark):
    out = transpile(
        "SELECT extract(dow FROM DATE '2024-03-10') AS a, "
        "extract(yow FROM DATE '2021-01-01') AS b, "
        "extract(doy FROM DATE '2024-02-01') AS c",
        "trino",
    )
    assert "DAYOFWEEK_ISO" in out and "YEAROFWEEK" in out
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c) == (7, 2020, 32)  # Sunday = ISO 7


def test_trino_mysql_format_codes(spark):
    out = transpile(
        "SELECT date_format(TIMESTAMP '2024-03-05 10:30:00', '%Y-%m %H:%i') AS a, "
        "date_parse('2024-03-05', '%Y-%m-%d') AS b",
        "trino",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == "2024-03 10:30"
    assert str(row.b).startswith("2024-03-05")
    # already-Java pattern with letters and no %-codes is ambiguous → loud
    with pytest.raises(TranspileError):
        transpile("SELECT date_format(ts, 'yyyy-MM') FROM t", "trino")


def test_trino_unixtime_round_trip(spark):
    out = transpile(
        "SELECT from_unixtime(1700000000.25) AS a, "
        "to_unixtime(TIMESTAMP '2024-03-05 10:30:00') AS b",
        "trino",
    )
    row = spark.sql(out).collect()[0]
    assert row.a.microsecond == 250000   # fractional seconds preserved
    assert isinstance(row.b, float)
    with pytest.raises(TranspileError):
        transpile("SELECT from_unixtime(e, 'UTC') FROM t", "trino")


def test_trino_regexp_and_split(spark):
    out = transpile(
        "SELECT regexp_extract('a12b', '[0-9]+') AS a, "
        "regexp_extract('a12b', '([a-z])([0-9]+)', 2) AS b, "
        "regexp_replace('aaa-bbb', 'a+') AS c, "
        "regexp_replace('ab', '(a)(b)', '$2$1') AS d, "
        "split('x|y|z', '|') AS e, "
        "regexp_split('a1b2', '[0-9]') AS f",
        "trino",
    )
    row = spark.sql(out).collect()[0]
    # 2-arg regexp_extract returns the WHOLE match in Trino (group 0)
    assert (row.a, row.b, row.c, row.d) == ("12", "12", "-bbb", "ba")
    # split's delimiter is a PLAIN string — '|' must not act as a regex
    assert row.e == ["x", "y", "z"]
    assert row.f == ["a", "b", ""]
    with pytest.raises(TranspileError):
        transpile("SELECT regexp_replace(s, 'p', x -> x) FROM t", "trino")
    with pytest.raises(TranspileError):
        transpile("SELECT split(s, d) FROM t", "trino")


def test_trino_array_map_functions(spark):
    out = transpile(
        "SELECT element_at(ARRAY(1, 2), 9) AS a, "
        "contains(ARRAY(1, 2), 2) AS b, "
        "repeat('q', 2) AS c, "
        "reduce(ARRAY(1, 2, 3), 0, (acc, v) -> acc + v) AS d, "
        "any_match(ARRAY(1, 2), v -> v > 1) AS e, "
        "none_match(ARRAY(1, 2), v -> v > 10) AS f, "
        "map(ARRAY('k'), ARRAY(9)) AS g, "
        "cardinality(ARRAY(1, 2)) AS h",
        "trino",
    )
    row = spark.sql(out).collect()[0]
    # Trino element_at returns NULL out of bounds; Spark 4 runs ANSI mode
    # where plain element_at raises — the rename targets try_element_at.
    assert row.a is None
    assert (row.b, row.c, row.d, row.e, row.f) == (True, ["q", "q"], 6, True, True)
    assert row.g == {"k": 9}
    assert row.h == 2


def test_trino_unnest_shapes(spark):
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW trino_un AS "
        "SELECT array(1, 2) AS arr, map('a', 1) AS m"
    )
    for sql, expect in [
        ("SELECT e FROM trino_un CROSS JOIN UNNEST(arr) AS u(e)", [(1,), (2,)]),
        ("SELECT e FROM trino_un, UNNEST(arr) AS u(e)", [(1,), (2,)]),
        ("SELECT k, v FROM trino_un CROSS JOIN UNNEST(m) AS kv(k, v)", [("a", 1)]),
        ("SELECT e FROM trino_un LEFT JOIN UNNEST(arr) AS u(e) ON TRUE", [(1,), (2,)]),
        ("SELECT e FROM UNNEST(sequence(1, 2)) AS u(e)", [(1,), (2,)]),
    ]:
        out = transpile(sql, "trino")
        got = sorted(tuple(r) for r in spark.sql(out).collect())
        assert got == sorted(expect), (sql, out, got)
    for bad in (
        "SELECT x FROM t CROSS JOIN UNNEST(a, b) AS u(x, y)",
        "SELECT e, o FROM t CROSS JOIN UNNEST(a) WITH ORDINALITY AS u(e, o)",
        "SELECT e FROM t LEFT JOIN UNNEST(a) AS u(e)",   # missing ON TRUE
        "SELECT e FROM t CROSS JOIN UNNEST(a) AS u",     # no column list
    ):
        with pytest.raises(TranspileError):
            transpile(bad, "trino")


def test_trino_types(spark):
    out = transpile(
        "SELECT CAST('ab' AS varbinary) AS a, "
        "CAST(TIMESTAMP '2024-01-01 00:00:00' AS timestamp(3)) AS b, "
        "CAST('2024-01-01 00:00:00' AS timestamp) AS c",
        "trino",
    )
    # 3 = the typed literal (zone-less in Trino) + the two cast targets
    assert "BINARY" in out and out.count("TIMESTAMP_NTZ") == 3
    spark.sql(out).collect()
    for bad in ("json", "time", "ipaddress", "hyperloglog", "row(x int)"):
        with pytest.raises(TranspileError):
            transpile(f"SELECT CAST(x AS {bad}) FROM t", "trino")


def test_timestamp_with_time_zone_multiword():
    # trino/postgres/oracle/ansi/duckdb multiword forms, incl. after a
    # precision list
    assert transpile(
        "SELECT CAST(x AS timestamp with time zone) FROM t", "trino"
    ) == "SELECT CAST(x AS TIMESTAMP_LTZ) FROM t"
    assert transpile(
        "SELECT CAST(x AS timestamp(6) without time zone) FROM t", "trino"
    ) == "SELECT CAST(x AS TIMESTAMP_NTZ) FROM t"
    assert transpile(
        "SELECT x::timestamp with time zone FROM t", "postgres"
    ) == "SELECT x::TIMESTAMP_LTZ FROM t"
    with pytest.raises(TranspileError):
        transpile("SELECT CAST(x AS time with time zone) FROM t", "trino")


def test_trino_offset_fetch_and_listagg(spark):
    assert transpile(
        "SELECT n FROM t OFFSET 5 ROWS FETCH FIRST 10 ROWS ONLY", "trino"
    ) == "SELECT n FROM t LIMIT 10 OFFSET 5"
    out = transpile(
        "SELECT listagg(n, '-') WITHIN GROUP (ORDER BY n) AS a "
        "FROM VALUES ('x'), ('y') AS t(n)",
        "trino",
    )
    assert spark.sql(out).collect()[0].a == "x-y"


def test_trino_bitwise(spark):
    out = transpile(
        "SELECT bitwise_and(5, 3) AS a, bitwise_or(5, 3) AS b, "
        "bitwise_xor(5, 3) AS c, bitwise_not(5) AS d, "
        "bitwise_left_shift(1, 3) AS e, bitwise_right_shift(-8, 1) AS f, "
        "bitwise_right_shift_arithmetic(-8, 1) AS g",
        "trino",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e) == (1, 7, 6, -6, 8)
    assert row.f == 2147483644          # logical (zero-fill) shift
    assert row.g == -4                  # arithmetic shift


def test_trino_url_functions(spark):
    out = transpile(
        "SELECT url_extract_host(u) AS a, url_extract_path(u) AS b, "
        "url_extract_protocol(u) AS c, url_extract_query(u) AS d, "
        "url_extract_fragment(u) AS e, url_extract_parameter(u, 'k') AS f "
        "FROM VALUES ('http://h.io/p?k=v&z=2#frag') AS t(u)",
        "trino",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c) == ("h.io", "/p", "http")
    assert (row.d, row.e, row.f) == ("k=v&z=2", "frag", "v")


def test_trino_at_time_zone_loud():
    with pytest.raises(TranspileError):
        transpile("SELECT ts AT TIME ZONE 'UTC' FROM t", "trino")


def test_trino_loud_surface():
    for sql in (
        "SELECT try(1/0) FROM t",
        "SELECT md5(to_utf8(s)) FROM t",          # VARBINARY vs hex STRING
        "SELECT greatest(a, b) FROM t",            # NULL-propagation differs
        "SELECT approx_percentile(x, w, 0.5) FROM t",
        "SELECT strpos(s, 'x', 2) FROM t",
        "SELECT format_datetime(ts, 'yyyy') FROM t",
        "SELECT random(5) FROM t",
        "SELECT array_sort_desc(a) FROM t",
        "SELECT json_parse(j) FROM t",
        "SELECT histogram(x) FROM t",
        "SELECT truncate(x, 1) FROM t",  # DECIMAL scale-preserving 2-arg
        "SELECT split_to_map(s, ';', '=') FROM t",
        "SELECT regexp_position(s, 'p') FROM t",
        "SELECT url_extract_port(u) FROM t",
        "SELECT map(a) FROM t",
        "SELECT hamming_distance(a, b) FROM t",
    ):
        with pytest.raises(TranspileError):
            transpile(sql, "trino")


def test_trino_in_noop_corpus():
    # Already-Spark text round-trips untouched — except the names Trino
    # claims with different semantics (date_format %-codes, plain-string
    # split, whole-match regexp_extract), mirroring the MySQL rule.
    corpus = [
        "SELECT a, SUM(b) AS s FROM t WHERE c >= DATE '2024-01-01' GROUP BY a",
        "WITH x AS (SELECT 1 AS a) SELECT a, ROW_NUMBER() OVER (ORDER BY a) FROM x",
        "SELECT timestampdiff(DAY, a, b), date_trunc('month', ts) FROM t",
        "SELECT /* block */ concat_ws('-', a, b) AS k FROM t ORDER BY k LIMIT 5",
    ]
    for sql in corpus:
        assert transpile(sql, "trino") == _with_nulls(sql, "trino"), sql


def test_dialect_aliases():
    # databricks IS Spark SQL — byte-identical no-op
    weird = "SELECT anything_at_all(x, '\\d') FROM t QUALIFY 1"
    assert transpile(weird, "databricks") == weird
    # presto/athena → trino; risingwave → postgres; fabric → tsql
    assert transpile("SELECT strpos(s, 'x') FROM t", "athena") \
        == "SELECT instr(s, 'x') FROM t"
    assert transpile("SELECT arbitrary(x) FROM t", "presto") \
        == "SELECT any_value(x) FROM t"
    assert transpile("SELECT x::int8 FROM t", "risingwave") \
        == "SELECT round(x)::BIGINT FROM t"  # pg int casts round
    assert transpile("SELECT ISNULL(a, 0) FROM t", "fabric") \
        == "SELECT nvl(a, 0) FROM t"
    # reference connection-type names (connection.py type_ literals)
    assert transpile("SELECT IIF(a > 1, 'y', 'n') FROM t", "mssql") \
        == "SELECT if(a > 1, 'y', 'n') FROM t"
    assert transpile("SELECT LEN('ab ') FROM t", "azuresql") \
        == "SELECT length(rtrim('ab ')) FROM t"
    assert transpile("SELECT strftime(d, '%Y') FROM t", "motherduck") \
        == "SELECT date_format(d, 'yyyy') FROM t"
    assert transpile("SELECT x::int8 FROM t", "gcp_postgres") \
        == "SELECT round(x)::BIGINT FROM t"
    hive_sql = "SELECT a FROM t LATERAL VIEW explode(arr) u AS e DISTRIBUTE BY a"
    assert transpile(hive_sql, "hive") == hive_sql
    with pytest.raises(TranspileError):
        transpile("SELECT 1", "not_a_dialect")


# ---------------------------------------------------------------------------
# ClickHouse read dialect (ref engine_adapter/clickhouse.py — the last
# reference engine dialect)
# ---------------------------------------------------------------------------


def test_clickhouse_cast_functions(spark):
    out = transpile(
        "SELECT toString(5) AS a, toInt64('42') AS b, toInt8(7) AS c, "
        "toUInt32(9) AS d, toFloat64('2.5') AS e, toDate('2024-03-05') AS f, "
        "toBool(1) AS g",
        "clickhouse",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c, row.d) == ("5", 42, 7, 9)
    assert (float(row.e), str(row.f), row.g) == (2.5, "2024-03-05", True)
    with pytest.raises(TranspileError):
        transpile("SELECT toDateTime(x, 'UTC') FROM t", "clickhouse")


def test_clickhouse_date_functions(spark):
    out = transpile(
        "SELECT toYear(DATE '2024-03-05') AS a, "
        "toDayOfWeek(DATE '2024-03-05') AS b, "
        "toMonday(DATE '2024-03-05') AS c, "
        "toStartOfMonth(DATE '2024-03-17') AS d, "
        "toYYYYMM(DATE '2024-03-05') AS e, "
        "toLastDayOfMonth(DATE '2024-02-05') AS f, "
        "dateDiff('month', toDate('2024-01-31'), toDate('2024-02-01')) AS g, "
        "date_add(MONTH, 2, DATE '2024-01-15') AS h, "
        "addDays(DATE '2024-03-05', 3) AS i, "
        "subtractMonths(DATE '2024-03-05', 1) AS j",
        "clickhouse",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b) == (2024, 2)        # ISO Tuesday = 2
    assert (str(row.c), str(row.d)) == ("2024-03-04", "2024-03-01")
    assert (row.e, str(row.f)) == (202403, "2024-02-29")
    assert row.g == 1                          # boundary-crossing months
    assert str(row.h).startswith("2024-03-15")
    assert str(row.i).startswith("2024-03-08")
    assert str(row.j).startswith("2024-02-05")


def test_clickhouse_format_datetime(spark):
    out = transpile(
        "SELECT formatDateTime(TIMESTAMP '2024-03-05 10:30:45', '%Y-%m %H:%i') AS a, "
        "formatDateTime(TIMESTAMP '2024-03-05 10:30:45', '%F %T') AS b",
        "clickhouse",
    )
    row = spark.sql(out).collect()[0]
    assert row.a == "2024-03 10:30"
    assert row.b == "2024-03-05 10:30:45"
    # %M is minute on legacy servers, month name on 23.x+ → ambiguous
    with pytest.raises(TranspileError):
        transpile("SELECT formatDateTime(ts, '%H:%M') FROM t", "clickhouse")


def test_clickhouse_string_regex(spark):
    out = transpile(
        "SELECT position('hello', 'lo') AS a, match('hello', 'l+') AS b, "
        "extract('a12b', '([0-9]+)') AS c, extract('a12b', '[0-9]+') AS d, "
        "splitByChar('|', 'x|y') AS e, splitByRegexp('[0-9]', 'a1b') AS f, "
        "replaceAll('aba', 'a', 'c') AS g, "
        "replaceRegexpAll('ab', '(a)(b)', '\\\\2\\\\1') AS h, "
        "lengthUTF8('héllo') AS i, startsWith('ab', 'a') AS j",
        "clickhouse",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c, row.d) == (4, True, "12", "12")
    assert (row.e, row.f, row.g, row.h) == (["x", "y"], ["a", "b"], "cbc", "ba")
    assert (row.i, row.j) == (5, True)
    # EXTRACT(field FROM x) grammar form passes through untouched
    assert transpile(
        "SELECT extract(YEAR FROM d) FROM t", "clickhouse"
    ) == "SELECT extract(YEAR FROM d) FROM t"


def test_clickhouse_conditionals_and_arith(spark):
    out = transpile(
        "SELECT multiIf(5 > 10, 'big', 5 > 4, 'mid', 'small') AS a, "
        "assumeNotNull(7) AS b, intDiv(7, 2) AS c, modulo(7, 2) AS d, "
        "plus(1, 2) AS e, divide(5, 2) AS f, roundBankers(2.5) AS g",
        "clickhouse",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e) == ("mid", 7, 3, 1, 3)
    assert float(row.f) == 2.5
    assert float(row.g) == 2.0                 # banker's rounding


def test_clickhouse_aggregates(spark):
    out = transpile(
        "SELECT groupArray(n) AS a, uniq(n) AS b, any(n) AS c, "
        "argMax(n, w) AS d, countIf(n > 1) AS e, sumIf(n, n > 1) AS f "
        "FROM VALUES (1, 10), (2, 20) AS t(n, w)",
        "clickhouse",
    )
    row = spark.sql(out).collect()[0]
    assert sorted(row.a) == [1, 2]
    assert (row.b, row.d, row.e, row.f) == (2, 2, 1, 2)
    # CH any() is FIRST-VALUE — must not become Spark's boolean any()
    assert "any_value" in out


def test_clickhouse_array_functions(spark):
    out = transpile(
        "SELECT arrayMap(x -> x * 2, ARRAY(3, 1)) AS a, "
        "arrayFilter(x -> x > 1, ARRAY(3, 1)) AS b, "
        "arrayExists(x -> x > 2, ARRAY(3, 1)) AS c, "
        "arraySort(ARRAY(3, 1)) AS d, has(ARRAY(3, 1), 1) AS e, "
        "indexOf(ARRAY(3, 1), 1) AS f, "
        "arrayStringConcat(ARRAY('a', 'b'), '-') AS g",
        "clickhouse",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c) == ([6, 2], [3], True)
    assert (row.d, row.e, row.f, row.g) == ([1, 3], True, 2, "a-b")
    with pytest.raises(TranspileError):
        transpile("SELECT arraySort(x -> -x, arr) FROM t", "clickhouse")


def test_clickhouse_json(spark):
    out = transpile(
        "SELECT JSONExtractString(j, 'k') AS a, "
        "JSONExtractInt(j, 'k2', 'n') AS b "
        """FROM VALUES ('{"k": "v", "k2": {"n": 7}}') AS t(j)""",
        "clickhouse",
    )
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b) == ("v", 7)  # both return the UNQUOTED string
    with pytest.raises(TranspileError):
        transpile("SELECT JSONExtractString(j, 1) FROM t", "clickhouse")


def test_clickhouse_types(spark):
    out = transpile(
        "SELECT CAST(5 AS Nullable(Int64)) AS a, "
        "CAST('x' AS LowCardinality(String)) AS b, "
        "CAST(ARRAY(1, 2) AS Array(Int64)) AS c, "
        "CAST(7 AS UInt32) AS d, CAST(1 AS Int8) AS e, "
        "CAST(TIMESTAMP '2024-01-01 00:00:00' AS DateTime64(3)) AS f",
        "clickhouse",
    )
    assert "Nullable" not in out and "LowCardinality" not in out
    assert "ARRAY<BIGINT>" in out
    row = spark.sql(out).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e) == (5, "x", [1, 2], 7, 1)
    for bad in (
        "FixedString(8)", "Tuple(Int32, String)", "Enum8('a' = 1)",
        "IPv4", "UInt256",
    ):
        with pytest.raises(TranspileError):
            transpile(f"SELECT CAST(x AS {bad}) FROM t", "clickhouse")
    out2 = transpile(
        "SELECT CAST(m AS Map(String, UInt64)) FROM t", "clickhouse"
    )
    assert "MAP<STRING, DECIMAL(20,0)>" in out2


def test_clickhouse_join_modifiers(spark):
    # SEMI/ANTI LEFT reorder to Spark's LEFT SEMI/ANTI; ALL drops
    assert transpile(
        "SELECT a.x FROM a SEMI LEFT JOIN b ON a.x = b.x", "clickhouse"
    ) == "SELECT a.x FROM a LEFT SEMI JOIN b ON a.x = b.x"
    assert transpile(
        "SELECT a.x FROM a ANTI LEFT JOIN b ON a.x = b.x", "clickhouse"
    ) == "SELECT a.x FROM a LEFT ANTI JOIN b ON a.x = b.x"
    assert transpile(
        "SELECT * FROM a ALL INNER JOIN b ON a.x = b.x", "clickhouse"
    ) == "SELECT * FROM a INNER JOIN b ON a.x = b.x"
    for bad in (
        "SELECT * FROM a ANY LEFT JOIN b USING (x)",
        "SELECT * FROM a ASOF JOIN b ON a.x = b.x",
        "SELECT * FROM a GLOBAL JOIN b USING (x)",
        "SELECT * FROM a SEMI RIGHT JOIN b ON a.x = b.x",
    ):
        with pytest.raises(TranspileError):
            transpile(bad, "clickhouse")


def test_clickhouse_rand_and_unixtime(spark):
    out = transpile(
        "SELECT rand() AS a, randCanonical() AS b, "
        "toUnixTimestamp(TIMESTAMP '2024-01-01 00:00:00') AS c, "
        "fromUnixTimestamp(1700000000) AS d",
        "clickhouse",
    )
    row = spark.sql(out).collect()[0]
    assert isinstance(row.a, int) and 0 <= row.a < 2**32   # UInt32 range
    assert isinstance(row.b, float) and 0.0 <= row.b < 1.0
    assert isinstance(row.c, int)
    assert str(row.d).startswith("2023-11-14")


def test_clickhouse_literal_escapes(spark):
    # backslash escapes incl. \xHH; unknown escapes keep BOTH chars
    # (parseComplexEscapeSequence), which is how \1 backrefs survive
    out = transpile(r"SELECT 'a\tb\x41' AS s, 'it''s' AS q", "clickhouse")
    row = spark.sql(out).collect()[0]
    assert row.s == "a\tbA"
    assert row.q == "it's"


def test_clickhouse_loud_surface():
    for sql in (
        "SELECT length(s) FROM t",             # bytes vs chars vs size
        "SELECT reverse(s) FROM t",            # byte-wise reverse
        "SELECT quantile(0.9)(x) FROM t",      # parameterized combinator
        "SELECT * FROM t FINAL",
        "SELECT * FROM t SAMPLE 0.1",
        "SELECT x FROM t LIMIT 3 BY g",
        "SELECT x FROM t SETTINGS max_threads = 4",
        "SELECT least(a, b) FROM t",           # NULL propagation
        "SELECT md5(s) FROM t",                # binary vs hex string
        "SELECT arrayElement(arr, 9) FROM t",  # type-default out of bounds
        "SELECT locate(a, b) FROM t",          # arg order flips by version
        "SELECT position(s, 'x', 3) FROM t",
        "SELECT splitByChar(d, s) FROM t",     # non-literal separator
        "SELECT rand(7) FROM t",
        "SELECT dateDiff('week', a, b) FROM t",  # non-ISO week anchoring
    ):
        with pytest.raises(TranspileError):
            transpile(sql, "clickhouse")


def test_clickhouse_in_noop_corpus():
    corpus = [
        "SELECT a, SUM(b) AS s FROM t WHERE c >= DATE '2024-01-01' GROUP BY a",
        "WITH x AS (SELECT 1 AS a) SELECT a, ROW_NUMBER() OVER (ORDER BY a) FROM x",
        "SELECT /* block */ concat_ws('-', a, b) AS k FROM t ORDER BY k LIMIT 5",
        "SELECT timestampdiff(DAY, a, b), date_trunc('month', ts) FROM t",
    ]
    for sql in corpus:
        assert transpile(sql, "clickhouse") == _with_nulls(sql, "clickhouse"), sql


def test_directional_join_unnest_flatten_loud():
    """RIGHT/FULL [OUTER] JOIN before UNNEST / LATERAL FLATTEN would leave
    the direction keyword dangling in front of LATERAL VIEW — render-time
    loud, never corrupted SQL (first-pass review finding)."""
    for d, sql in [
        ("trino", "SELECT e FROM t RIGHT JOIN UNNEST(arr) AS u(e) ON TRUE"),
        ("trino", "SELECT e FROM t FULL JOIN UNNEST(arr) AS u(e) ON TRUE"),
        ("trino", "SELECT e FROM t FULL OUTER JOIN UNNEST(arr) AS u(e) ON TRUE"),
        ("snowflake",
         "SELECT f.value FROM t RIGHT JOIN LATERAL FLATTEN(input => arr) f"),
        ("snowflake",
         "SELECT f.value FROM t LEFT JOIN LATERAL FLATTEN(input => arr) f"),
    ]:
        with pytest.raises(TranspileError):
            transpile(sql, d)


def test_clickhouse_prewhere_ternary_global_in(spark):
    assert transpile(
        "SELECT x FROM t PREWHERE a = 1", "clickhouse"
    ) == "SELECT x FROM t WHERE a = 1"
    # PREWHERE + WHERE doubles the keyword → Spark parser rejects (loud)
    out = transpile("SELECT x FROM t PREWHERE a = 1 WHERE b = 2", "clickhouse")
    assert out.count("WHERE") == 2
    for sql in (
        "SELECT a > 1 ? 'y' : 'n' FROM t",
        "SELECT x FROM t WHERE a GLOBAL IN (SELECT a FROM s)",
        "SELECT x FROM t WHERE a GLOBAL NOT IN (SELECT a FROM s)",
    ):
        with pytest.raises(TranspileError):
            transpile(sql, "clickhouse")
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW ch_pw AS SELECT 1 AS a, 2 AS x"
    )
    assert spark.sql(
        transpile("SELECT x FROM ch_pw PREWHERE a = 1", "clickhouse")
    ).collect()[0].x == 2


def test_clickhouse_array_join_clause(spark):
    """CH's idiomatic unnest: [LEFT] ARRAY JOIN → LATERAL VIEW explode —
    Spark would otherwise read `t ARRAY` as a table alias and join a
    RELATION named after the array (silent corruption)."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW ch_aj AS "
        "SELECT array(1, 2) AS arr, 'x,y' AS s"
    )
    out = transpile("SELECT e FROM ch_aj ARRAY JOIN arr AS e", "clickhouse")
    assert sorted(r.e for r in spark.sql(out).collect()) == [1, 2]
    out = transpile(
        "SELECT e FROM ch_aj LEFT ARRAY JOIN splitByChar(',', s) AS e",
        "clickhouse",
    )
    assert sorted(r.e for r in spark.sql(out).collect()) == ["x", "y"]
    for bad in (
        "SELECT x FROM t ARRAY JOIN arr",          # alias-less shadows
        "SELECT x FROM t ARRAY JOIN a AS x, b AS y",  # lockstep multi
    ):
        with pytest.raises(TranspileError):
            transpile(bad, "clickhouse")


def test_trino_split_part_oob_null(spark):
    # Trino returns NULL past the last field; Spark's split_part returns
    # '' — the rewrite is try_element_at over the regex-escaped split
    # (single evaluation of every operand).
    out = transpile(
        "SELECT split_part('a,b', ',', 5) AS x, "
        "split_part('a,,b', ',', 2) AS y, "
        "split_part('a.b', '.', 2) AS z",
        "trino",
    )
    row = spark.sql(out).collect()[0]
    assert row.x is None            # out of range → NULL, not ''
    assert row.y == ""              # genuinely-empty field stays ''
    assert row.z == "b"             # '.' treated as a PLAIN delimiter
    with pytest.raises(TranspileError):
        transpile("SELECT split_part(s, d, 2) FROM t", "trino")


def test_clickhouse_array_string_concat_default_sep(spark):
    out = transpile(
        "SELECT arrayStringConcat(ARRAY('a', 'b')) AS x, "
        "arrayStringConcat(ARRAY('a', 'b'), '-') AS y",
        "clickhouse",
    )
    row = spark.sql(out).collect()[0]
    assert (row.x, row.y) == ("ab", "a-b")


def test_review_fixes_aliases_unnest_prewhere(spark):
    """Second review pass over the round-5 dialect work (alias lexing,
    INNER JOIN UNNEST ON TRUE, PREWHERE position, operand duplication)."""
    from sqlmesh_spark.core.sqlparse import find_tables

    # alias dialects select the right GRAMMAR at the lexing seam, not
    # just inside transpile(): mssql brackets must lex as identifiers
    assert find_tables(
        "SELECT a FROM [db].[tbl] WHERE note = 'from fake.table'", "mssql"
    ) == frozenset({"db.tbl"})
    assert find_tables(
        "SELECT a FROM `sch`.`tbl` AS x", "athena"
    ) == frozenset({"sch.tbl"})

    # Trino requires ON for INNER JOIN — the trivial ON TRUE is consumed
    for sql in (
        "SELECT e FROM t INNER JOIN UNNEST(arr) AS u(e) ON TRUE",
        "SELECT e FROM t JOIN UNNEST(arr) AS u(e) ON TRUE",
    ):
        assert transpile(sql, "trino") \
            == "SELECT e FROM t  LATERAL VIEW explode(arr) u AS e", sql

    # split_part rewrite evaluates the string operand exactly once
    out = transpile("SELECT split_part(s, ',', 2) FROM t", "trino")
    assert out.count("s") - out.count("split") * 0 >= 1
    assert out == "SELECT try_element_at(split(s, ','), 2) FROM t"

    # PREWHERE only rewrites in FROM-target position
    assert transpile(
        "SELECT x FROM db.tbl AS z PREWHERE a = 1", "clickhouse"
    ) == "SELECT x FROM db.tbl AS z WHERE a = 1"
    assert transpile(
        "SELECT x FROM (SELECT 1 AS a) s PREWHERE a = 1", "clickhouse"
    ) == "SELECT x FROM (SELECT 1 AS a) s WHERE a = 1"
    for bad in (
        "SELECT a AS prewhere FROM t",
        "SELECT prewhere FROM t",
        "SELECT a, prewhere FROM t",
    ):
        with pytest.raises(TranspileError):
            transpile(bad, "clickhouse")


def test_trino_timestamp_literal_and_tz_cast(spark):
    """Trino TIMESTAMP '...' literals are zone-less → TIMESTAMP_NTZ (the
    same type both spellings of the type map to); clickhouse
    DateTime('tz') casts raise (the zone changes the parsed instant)."""
    out = transpile("SELECT TIMESTAMP '2024-01-01 10:00:00' AS x", "trino")
    assert out == "SELECT TIMESTAMP_NTZ '2024-01-01 10:00:00' AS x"
    assert "TimestampNTZType" in str(spark.sql(out).schema)
    # to_unixtime over a zone-less operand casts through the session zone
    out2 = transpile(
        "SELECT to_unixtime(TIMESTAMP '2024-03-05 10:30:00') AS x", "trino"
    )
    assert isinstance(spark.sql(out2).collect()[0].x, float)
    for bad in (
        "SELECT CAST(x AS DateTime('Asia/Tokyo')) FROM t",
        "SELECT CAST(x AS DateTime64(3, 'UTC')) FROM t",
    ):
        with pytest.raises(TranspileError):
            transpile(bad, "clickhouse")
    # precision-only parameters still drop fine
    assert transpile(
        "SELECT CAST(x AS DateTime64(3)) FROM t", "clickhouse"
    ) == "SELECT CAST(x AS TIMESTAMP) FROM t"


def test_timestamp_literal_zone_suffix_preserved(spark):
    """Zone-carrying TIMESTAMP literals stay LTZ (Spark honors the zone
    → correct instant); only plain date-time content rewrites to NTZ.
    Oracle shares the rule (its zone-less TIMESTAMP maps to NTZ too)."""
    out = transpile(
        "SELECT TIMESTAMP '2001-08-22 03:04:05 America/Los_Angeles' AS x",
        "trino",
    )
    assert "TIMESTAMP_NTZ" not in out
    saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        assert str(spark.sql(out).collect()[0].x) == "2001-08-22 10:04:05"
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
    assert transpile(
        "SELECT TIMESTAMP '2024-01-01 10:00:00' AS x", "oracle"
    ) == "SELECT TIMESTAMP_NTZ '2024-01-01 10:00:00' AS x"
    assert "TIMESTAMP_NTZ" not in transpile(
        "SELECT TIMESTAMP '2024-01-01 10:00:00+02:00' AS x", "trino"
    )


def test_trino_bracket_vs_element_at_oob(spark):
    """Trino's BRACKET subscript errors out of bounds (→ plain
    element_at, which Spark-4 ANSI also errors on), while element_at()
    returns NULL (→ try_element_at); clickhouse subscripts return the
    element-type default and have no faithful rewrite (loud)."""
    assert transpile("SELECT arr[2] FROM t", "trino") \
        == "SELECT element_at(arr, 2) FROM t"
    assert transpile("SELECT element_at(arr, 2) FROM t", "trino") \
        == "SELECT try_element_at(arr, 2) FROM t"
    with pytest.raises(TranspileError):
        transpile("SELECT arr[1] FROM t", "clickhouse")
    # CH [..] array LITERALS still rewrite
    assert transpile("SELECT [1, 2] AS a FROM t", "clickhouse") \
        == "SELECT array(1, 2) AS a FROM t"
    with pytest.raises(TranspileError):
        transpile("SELECT CAST(x AS Int128) FROM t", "clickhouse")
    with pytest.raises(TranspileError):
        transpile("SELECT toInt128(x) FROM t", "clickhouse")


def test_duckdb_postgres_subscript_oob_and_zero_null(spark):
    """DuckDB/Postgres subscripts (and list_extract/array_extract) return
    NULL out of bounds AND for index 0; Spark-4 ANSI element_at raises on
    both (try_element_at still raises INVALID_INDEX_OF_ZERO). The rewrite
    is try_element_at + nullif(i, 0) — verified NULL-not-error here."""
    out = transpile(
        "SELECT ([1,2,3])[10] AS oob, ([1,2,3])[0] AS zero, "
        "([1,2,3])[-1] AS neg, list_extract([1,2,3], 10) AS f_oob, "
        "array_extract([1,2,3], 0) AS f_zero", "duckdb")
    assert out.startswith("SELECT try_element_at((array(1,2,3)), nullif(10, 0)) AS oob")
    row = spark.sql(out).collect()[0]
    assert row.oob is None and row.zero is None and row.f_oob is None
    assert row.f_zero is None and row.neg == 3
    # postgres bracket subscripts: same NULL semantics
    out_pg = transpile("SELECT (ARRAY[1,2])[9] AS oob FROM (SELECT 1)", "postgres")
    assert spark.sql(out_pg).collect()[0].oob is None
    # dynamic (non-literal) index 0 must also be NULL, not a runtime error
    out_dyn = transpile(
        "SELECT ([10,20])[n - 1] AS v FROM (SELECT 1 AS n)", "duckdb")
    assert spark.sql(out_dyn).collect()[0].v is None


def test_snowflake_colon_paths(spark):
    """Snowflake semi-structured v:a.b[0]."Key"::TYPE → CAST(
    get_json_object(...) AS type); ::STRING of a VARIANT unquotes JSON
    strings exactly like get_json_object. Bare colon paths are loud
    (VARIANT text form quotes string scalars)."""
    q = transpile(
        'SELECT j:a.b::string AS x, j:l[1]::int AS y, '
        "j:s::string AS z, v:\"Key Name\"::int AS k "
        "FROM (SELECT '{\"a\": {\"b\": 2}, \"l\": [10, 20], \"s\": \"hi\"}' AS j, "
        "'{\"Key Name\": 5}' AS v)",
        "snowflake",
    )
    assert transpile(q, "snowflake") == q
    row = spark.sql(q).collect()[0]
    assert (row.x, row.y, row.z, row.k) == ("2", 20, "hi", 5)
    assert (
        transpile("SELECT j:a.b::number(10,2) FROM t", "snowflake")
        == "SELECT CAST(get_json_object(j, '$.a.b') AS DECIMAL(10,2)) FROM t"
    )
    with pytest.raises(TranspileError, match="VARIANT"):
        transpile("SELECT j:a FROM t", "snowflake")


def test_duckdb_json_arrows(spark):
    """duckdb/postgres ->> maps exactly to get_json_object; literal ->
    chains fold into ONE combined JsonPath (navigating the ORIGINAL
    document, so a string-scalar hop yields NULL exactly like the
    source engines); paren-interrupted chains and terminal -> are loud;
    lambdas untouched."""
    q = transpile(
        "SELECT j ->> 's' AS s1, j -> 'a' ->> 'b' AS b1, "
        "j ->> '$.a.b' AS b3 "
        "FROM (SELECT '{\"a\": {\"b\": 2}, \"s\": \"x\"}' AS j)",
        "duckdb",
    )
    assert transpile(q, "duckdb") == q
    # the chain folds to one get_json_object over the original doc
    assert "$[''a''][''b'']" in q and q.count("get_json_object") == 3
    row = spark.sql(q).collect()[0]
    assert (row.s1, row.b1, row.b3) == ("x", "2", "2")
    # string-scalar intermediate hop: duckdb j -> 'a' is a JSON string
    # scalar -> navigating further yields NULL (combined path matches;
    # per-hop nesting would unquote and keep navigating — wrong)
    q2 = transpile(
        "SELECT j -> 'a' ->> 'b' AS v "
        "FROM (SELECT '{\"a\": \"{\\\"b\\\": 1}\"}' AS j)",
        "duckdb",
    )
    assert spark.sql(q2).collect()[0].v is None
    with pytest.raises(TranspileError, match="terminal"):
        transpile("SELECT j -> 'a' FROM t", "duckdb")
    with pytest.raises(TranspileError, match="parenthes"):
        transpile("SELECT (j -> 'a') ->> 'b' FROM t", "duckdb")
    # negative TERMINAL ->> indexes map since round 11 (wave 46):
    # duckdb 1.x has NO from-end semantics (->> -1 is NULL, pinned
    # live) — the static $[-N] path is NULL in Spark too; pg counts
    # from the END — dynamic path over json_array_length
    assert transpile("SELECT j ->> -1 FROM t", "duckdb") == (
        "SELECT get_json_object((j), '$[-1]') FROM t"
    )
    assert "json_array_length((j)) - 2" in transpile(
        "SELECT j ->> -2 FROM t", "postgres"
    )
    with pytest.raises(TranspileError, match="from-end"):
        transpile("SELECT j -> -2 ->> 0 FROM t", "postgres")
    with pytest.raises(TranspileError, match="from-end"):
        transpile("SELECT j -> 'a' ->> -1 FROM t", "duckdb")
    # chaining an arrow onto ->> TEXT output: exact re-parse for duckdb
    # (next-pass nesting), a type error in postgres — loud there
    q3 = transpile("SELECT j ->> 'a' ->> 'b' FROM t", "duckdb")
    assert q3.count("get_json_object") == 2
    with pytest.raises(TranspileError, match="type error"):
        transpile("SELECT j ->> 'a' ->> 'b' FROM t", "postgres")
    # duckdb JSON Pointer digit segments are polymorphic — loud
    with pytest.raises(TranspileError, match="digit"):
        transpile("SELECT j ->> '/a/0' FROM t", "duckdb")
    q4 = transpile("SELECT j ->> '/a/b' FROM t", "duckdb")
    assert "$[''a''][''b'']" in q4
    # lambda arrows with literal bodies are never JSON-rewritten
    assert (
        transpile("SELECT list_filter(l, x -> 1) FROM t", "duckdb")
        == "SELECT filter(l, x -> 1) FROM t"
    )
    assert (
        transpile("SELECT list_transform(l, x -> -1) FROM t", "duckdb")
        == "SELECT transform(l, x -> -1) FROM t"
    )


def test_pg_regex_match_operators(spark):
    """pg ~ / ~* / !~ / !~* / ~~ / !~~ → RLIKE / NOT RLIKE / LIKE with
    inline (?i) for the case-insensitive forms; unary ~ (bitwise NOT)
    stays untouched. Values pinned against live-PG behavior (partial,
    unanchored match)."""
    q = transpile(
        "SELECT 'Hello' ~ 'ell' AS a, 'Hello' ~ 'hel' AS b, "
        "'Hello' ~* 'HEL' AS c, 'Hello' !~ 'z' AS d, "
        "'a%b' ~~ 'a\\%b' AS e, 'axb' !~~ 'a_b' AS f, ~ 5 AS g",
        "postgres",
    )
    # (no fixpoint assert: the LIKE pattern emission contains
    # backslashes — the documented doubling-skip class)
    row = spark.sql(q).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e, row.f, row.g) == (
        True, False, True, True, True, False, -6,
    )
    # non-literal case-insensitive pattern binds via || (not concat —
    # the pg concat handler would re-rewrite it)
    q2 = transpile("SELECT a ~* upper(p) FROM t", "postgres")
    assert "'(?i)' ||" in q2 and transpile(q2, "postgres") == q2


def test_pg_xor_and_jsonb_path_operators(spark):
    """pg # (XOR) → single-eval and/or/not struct binding (Spark's ^ is
    pg POWER — unusable); #>> '{a,b}' → combined-bracket JsonPath; #>
    and digit segments loud."""
    q = transpile("SELECT 5 # 3 AS x, (5 # 3) / 2 AS h FROM t", "postgres")
    assert transpile(q, "postgres") == q
    row = spark.sql(q.replace("FROM t", "")).collect()[0]
    assert (row.x, row.h) == (6, 3.0)
    with pytest.raises(TranspileError, match="binds looser"):
        transpile("SELECT a # b + 1 FROM t", "postgres")
    q2 = transpile(
        "SELECT j #>> '{a,b}' AS v FROM (SELECT '{\"a\": {\"b\": 2}}' AS j)",
        "postgres",
    )
    assert spark.sql(q2).collect()[0].v == "2"
    with pytest.raises(TranspileError, match="#>"):
        transpile("SELECT j #> '{a}' FROM t", "postgres")
    with pytest.raises(TranspileError, match="digit"):
        transpile("SELECT j #>> '{a,0}' FROM t", "postgres")


def test_pg_int_cast_rounding_and_literal_div(spark):
    """pg/duckdb numeric→int casts ROUND half-away (round() wrap; pg
    string literals excluded — both engines raise); literal-int / →
    DIV (pg integer division truncates)."""
    q = transpile(
        "SELECT 3.99::int AS a, (-2.5)::int AS b, 7 / 2 AS c, "
        "-7 / 2 AS d, 7.0 / 2 AS e",
        "postgres",
    )
    assert transpile(q, "postgres") == q
    row = spark.sql(q).collect()[0]
    assert (row.a, row.b, row.c, row.d, float(row.e)) == (4, -3, 3, -3, 3.5)
    # x / 7 / 2: the second division's LHS is (x / 7), not the literal
    assert " DIV " not in transpile("SELECT x / 7 / 2 FROM t", "postgres")
    # jsonb/json types cast to STRING (original text — exact for every
    # get_json_object path); arrow chains fold across the cast
    q2 = transpile(
        "SELECT j::jsonb -> 'a' ->> 'b' AS v "
        "FROM (SELECT '{\"a\": {\"b\": 2}}' AS j)",
        "postgres",
    )
    assert spark.sql(q2).collect()[0].v == "2"
    # bare numeric is LOUD (arbitrary precision); numeric(p,s) maps
    with pytest.raises(TranspileError, match="numeric"):
        transpile("SELECT x::numeric FROM t", "postgres")
    assert transpile("SELECT x::numeric(10,2) FROM t", "postgres") \
        == "SELECT x::DECIMAL(10,2) FROM t"


def test_pg_quantified_and_misc_functions(spark):
    """= ANY → array_contains, = ALL → forall; num_nonnulls/num_nulls
    unfold; format → format_string with ''-for-NULL coalesce;
    array_prepend/array_replace/regexp_split_to_array/substring-from-
    regex/string_agg-ORDER-BY/string_to_array('') pg semantics."""
    q = transpile(
        "SELECT 2 = ANY(ARRAY[1,2]) AS a, 5 = ALL(ARRAY[5,5]) AS b, "
        "num_nonnulls(1, NULL, 3) AS c, num_nulls(1, NULL, 3) AS d, "
        "format('%s-%s', 'a', NULL) AS e, "
        "array_prepend(0, ARRAY[1,2]) AS f, "
        "array_replace(ARRAY[1,2,1], 1, 9) AS g, "
        "regexp_split_to_array('a1b22c', '[0-9]+') AS h, "
        "substring('ab12cd' from 'b([0-9]+)c') AS i2, "
        "substring('ab12cd' from '[0-9]+') AS j, "
        "substring('ab12cd' from 'zz') AS k, "
        "string_to_array('', '.') AS l, "
        "string_to_array('a.b', '.') AS m",
        "postgres",
    )
    # (no fixpoint assert: the regex-escaped separators contain
    # backslashes — the documented doubling-skip class)
    row = spark.sql(q).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e) == (True, True, 2, 1, "a-")
    assert (row.f, row.g, row.h) == ([0, 1, 2], [9, 2, 9], ["a", "b", "c"])
    assert (row.i2, row.j, row.k) == ("12", "12", None)
    assert (row.l, row.m) == ([], ["a", "b"])
    q2 = transpile(
        "SELECT string_agg(s, ',' ORDER BY s) AS v "
        "FROM (VALUES ('b'),('a')) t(s)",
        "postgres",
    )
    assert "WITHIN GROUP" in q2
    assert spark.sql(q2.replace("(VALUES ('b'),('a')) t(s)",
                                "(SELECT 'b' AS s UNION ALL SELECT 'a')")) \
        .collect()[0].v == "a,b"
    # DATE literal subtraction → datediff (pg date - date is int days)
    q3 = transpile(
        "SELECT DATE '2024-03-01' - DATE '2024-01-31' AS v", "postgres"
    )
    assert spark.sql(q3).collect()[0].v == 30
    with pytest.raises(TranspileError, match="COLLATE"):
        transpile("SELECT x COLLATE \"C\" FROM t", "postgres")
    with pytest.raises(TranspileError, match="quote"):
        transpile("SELECT quote_ident(x) FROM t", "postgres")
    with pytest.raises(TranspileError, match="format"):
        transpile("SELECT format('%I', x) FROM t", "postgres")


def test_pg_distinct_on_and_series(spark):
    """pg DISTINCT ON (k) → ROW_NUMBER window rewrite (first row per
    group under the statement ORDER BY; outer order = the ON prefix via
    hidden aliases, so non-selected order columns work);
    generate_series → explode(sequence(...)) rows for pg (a LIST for
    duckdb select-list context); TABLESAMPLE SYSTEM (n) → (n PERCENT);
    SIMILAR TO → anchored RLIKE with % _ . ^ $ converted."""
    spark.sql(
        "SELECT * FROM VALUES (1,'a',10),(1,'b',20),(2,'c',5) AS t(k, v, ts)"
    ).createOrReplaceTempView("don_t")
    out = transpile(
        "SELECT DISTINCT ON (k) k, v FROM don_t ORDER BY k, ts DESC",
        "postgres",
    )
    assert transpile(out, "postgres") == out
    assert [tuple(r) for r in spark.sql(out).collect()] == [(1, "b"), (2, "c")]
    # ON expr not in the select list + DESC prefix + LIMIT
    out2 = transpile(
        "SELECT DISTINCT ON (k) v FROM don_t ORDER BY k DESC, ts DESC "
        "LIMIT 2",
        "postgres",
    )
    assert [r.v for r in spark.sql(out2).collect()] == ["c", "b"]
    with pytest.raises(TranspileError, match="arbitrary row"):
        transpile("SELECT DISTINCT ON (k) k FROM t", "postgres")
    # a trailing ORDER BY after a set operation is UNION-scoped, not
    # the DISTINCT ON select's own — the pick is arbitrary in pg: loud
    with pytest.raises(TranspileError, match="UNION-scoped"):
        transpile(
            "SELECT DISTINCT ON (k) k, v FROM t UNION ALL "
            "SELECT 9, 'x' ORDER BY k",
            "postgres",
        )
    # generate_series: rows for pg, list for duckdb select-list
    out3 = transpile(
        "SELECT sum(i) AS s FROM generate_series(1, 5) AS g(i)", "postgres"
    )
    assert spark.sql(out3).collect()[0].s == 15
    # the empty-range guard: pg/duckdb generate_series(1, 0) is EMPTY
    # (default step +1) while Spark sequence(1, 0) auto-steps -1
    out4 = transpile("SELECT generate_series(1, 3) AS g", "duckdb")
    assert "sequence((1), (3))" in out4 and "CASE WHEN (1) <= (3)" in out4
    assert spark.sql(out4).collect()[0].g == [1, 2, 3]
    out5 = transpile(
        "SELECT count(*) AS c FROM generate_series(1, 0) g(i)", "postgres"
    )
    assert spark.sql(out5).collect()[0].c == 0
    with pytest.raises(TranspileError, match="expression"):
        transpile("SELECT abs(generate_series(1, 3)) FROM t", "postgres")
    assert transpile(
        "SELECT a FROM t TABLESAMPLE SYSTEM (10)", "postgres"
    ) == "SELECT a FROM t TABLESAMPLE (10 PERCENT)"
    with pytest.raises(TranspileError, match="REPEATABLE"):
        transpile(
            "SELECT a FROM t TABLESAMPLE SYSTEM (10) REPEATABLE (42)",
            "postgres",
        )
    q = transpile(
        "SELECT 'abc' SIMILAR TO 'a%' AS a, 'a.c' SIMILAR TO 'a.c' AS b, "
        "'axc' SIMILAR TO 'a.c' AS c, 'aaa' SIMILAR TO 'a+' AS d, "
        "'abc' NOT SIMILAR TO 'z%' AS e",
        "postgres",
    )
    row = spark.sql(q).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e) == (
        True, True, False, True, True,
    )


def test_pg_round_wrap_boolean_and_case_shapes(spark):
    """Round-wrap classification edges (second review pass): CASE..END
    bodies and subquery WHERE comparisons do NOT make the castee
    boolean (those numeric results must still get the round() wrap);
    user round(x, n) is not the handler's own emission; = ANY inside
    an array constructor rewrites; bracket classes / escaped
    backslashes in substring patterns resolve the capture group
    correctly."""
    q = transpile(
        "SELECT (CASE WHEN x > 5 THEN 1.5 ELSE 2.5 END)::int AS v "
        "FROM (SELECT 9 AS x)",
        "postgres",
    )
    assert spark.sql(q).collect()[0].v == 2  # pg rounds 1.5 -> 2
    q2 = transpile("SELECT round(2.504, 2)::int AS v", "postgres")
    assert spark.sql(q2).collect()[0].v == 3  # round(2.50) -> 3
    assert "round(" not in transpile(
        "SELECT (x > 0)::int FROM t", "postgres"
    )
    q3 = transpile("SELECT ARRAY[1 = ANY(arr)] FROM t", "postgres")
    assert "array_contains" in q3
    q4 = transpile("SELECT substring('f(x)', '[(]') AS v", "postgres")
    assert spark.sql(q4).collect()[0].v == "("  # class paren: group 0


def test_pg_to_char_case_padding_and_intervals(spark):
    """pg to_char output fidelity (found by the live-PG harness): name
    tokens print case-FOLLOWING-pattern ('DY'→'SAT') and DAY/MONTH are
    space-padded to 9 chars unless FM — only the capitalized/FM forms
    map; FM also strips numeric leading zeros. extract(epoch from
    day-time INTERVAL) → epoch-double cast; date_bin → origin-aligned
    floor arithmetic over bound operands."""
    q = transpile(
        "SELECT to_char(TIMESTAMP '2024-03-09 15:04:05', 'FMDay') AS a, "
        "to_char(TIMESTAMP '2024-03-09 15:04:05', 'Mon Dy') AS b, "
        "to_char(TIMESTAMP '2024-03-09 15:04:05', 'FMDD HH12') AS c, "
        "extract(epoch from INTERVAL '90 minutes') AS d, "
        "date_bin(INTERVAL '15 minutes', "
        "TIMESTAMP '2024-03-09 15:04:05', "
        "TIMESTAMP '2024-01-01 00:00:00')::text AS e",
        "postgres",
    )
    assert transpile(q, "postgres") == q
    row = spark.sql(q).collect()[0]
    assert (row.a, row.b, row.c) == ("Saturday", "Mar Sat", "9 03")
    assert row.d == 5400.0
    assert row.e == "2024-03-09 15:00:00"
    # round 9: the padded/cased name fields map through ||-joined
    # rpad/upper/lower segments (value-pinned live in
    # tests/test_dialect_fuzz_pg.py); only mixed-case salads stay loud
    assert "rpad(date_format((ts), 'EEEE'), 9, ' ')" in transpile(
        "SELECT to_char(ts, 'Day') FROM t", "postgres")
    assert "upper(date_format((ts), 'EEE'))" in transpile(
        "SELECT to_char(ts, 'DY') FROM t", "postgres")
    assert "lower(date_format((ts), 'a'))" in transpile(
        "SELECT to_char(ts, 'am') FROM t", "postgres")
    with pytest.raises(TranspileError):
        transpile("SELECT to_char(ts, 'DaY') FROM t", "postgres")
    # parsing direction stays tolerant (to_timestamp case mismatch is a
    # loud runtime parse error, not a silent value)
    assert "MMM" in transpile(
        "SELECT to_timestamp(s, 'DD MON YYYY') FROM t", "postgres"
    )
    # epoch of a LITERAL interval with year/month parts now evaluates
    # statically with pg's fixed factors (30-day months, 365.25-day
    # years — verified live); only non-literal year/month interval
    # expressions remain loud
    assert transpile(
        "SELECT extract(epoch from INTERVAL '2 months') FROM t",
        "postgres",
    ) == "SELECT 5184000 FROM t"
    with pytest.raises(TranspileError, match="30-day"):
        transpile(
            "SELECT extract(epoch from INTERVAL '1 month' * n) FROM t",
            "postgres",
        )
    with pytest.raises(TranspileError, match="OVERLAPS"):
        transpile("SELECT (a, b) OVERLAPS (c, d) FROM t", "postgres")


def test_pg_posix_character_classes(spark):
    """POSIX [:class:] bracket elements convert to Java forms in every
    pattern-literal site (~ family, substring-regex, regexp_*
    functions): Java reads [[:digit:]] as the literal char set
    {:, d, i, g, t} — a verified silent semantic flip."""
    q = transpile(
        "SELECT 'ab12' ~ '[[:digit:]]+' AS a, "
        "':' ~ '[[:digit:]]' AS b, "
        "'AB' ~* '[[:lower:]]+$' AS c, "
        "regexp_count('a1b22c', '[[:digit:]]+') AS d, "
        "substring('ab12cd' from '[[:digit:]]+') AS e",
        "postgres",
    )
    row = spark.sql(q).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e) == (
        True, False, True, 2, "12",
    )
    with pytest.raises(TranspileError, match="POSIX"):
        transpile("SELECT s ~ '[[:foo:]]' FROM t", "postgres")


def test_pg_chained_literal_division(spark):
    """Chained literal integer division converts FULLY: `7/2/2` must
    not stabilize half-converted as `7 DIV 2/2` (Spark then evaluates
    (7 DIV 2)/2 = 1.5 where pg gives 1). A preceding DIV can only be
    this handler's own emission (pg has no infix DIV) — a provably
    integer LHS, so the chain rewrites one `/` per fixpoint pass."""
    q = transpile("SELECT 7/2/2 AS a, 100/3/2/2 AS b, 7/2/2.0 AS c",
                  "postgres")
    assert transpile(q, "postgres") == q
    row = spark.sql(q).collect()[0]
    assert (row.a, row.b, float(row.c)) == (1, 8, 1.5)
    # x / 7 / 2 stays untouched: the second `/`'s LHS is (x / 7)
    assert " DIV " not in transpile("SELECT x / 7 / 2 FROM t", "postgres")


def test_pg_param_decimal_chain_round_wrap(spark):
    """x::numeric(10,2)::int must get the round() wrap: the identity
    DECIMAL→DECIMAL rename previously registered as a pending edit
    every pass, deferring the wrap forever (silent truncate-vs-round:
    3.99 → 3 instead of pg's 4)."""
    q = transpile(
        "SELECT 3.99::numeric(10,2)::int AS a, "
        "CAST(2.5::numeric(10,2) AS int) AS b, "
        "(-2.5)::numeric(10,2)::int AS c",
        "postgres",
    )
    assert transpile(q, "postgres") == q
    assert q.count("round(") == 3
    row = spark.sql(q).collect()[0]
    assert (row.a, row.b, row.c) == (4, 3, -3)


def test_pg_two_word_types_and_float_bround(spark):
    """Two-word ANSI type spellings map in :: and CAST AS position
    (`double precision` previously corrupted to `double
    round(precision)`); statically float-typed castees round half-EVEN
    via bround(), matching pg/duckdb rint semantics exactly."""
    q = transpile(
        "SELECT 2.5::double precision::int AS a, "
        "3.5::float8::int AS b, (-2.5)::float4::int AS c, "
        "CAST(2.5::float8 AS int) AS d, "
        "1.5::double precision AS e, "
        "'ab'::character varying(1) AS f, "
        "'ab'::character varying AS g",
        "postgres",
    )
    assert transpile(q, "postgres") == q
    row = spark.sql(q).collect()[0]
    # all four are float→int half-even chains (pg verified live:
    # CAST(2.5::float8 AS int) = 2)
    assert (row.a, row.b, row.c, row.d) == (2, 4, -2, 2)
    assert float(row.e) == 1.5 and row.f == "a" and row.g == "ab"
    # bround only for the statically float-typed chain; unknown stays round
    assert "bround(" in transpile("SELECT x::float8::int FROM t", "postgres")
    assert "bround" not in transpile("SELECT x::int FROM t", "postgres")
    assert "bround(random())" in transpile("SELECT random()::int", "postgres")
    with pytest.raises(TranspileError, match="bit"):
        transpile("SELECT x::bit varying FROM t", "postgres")


def test_order_by_nulls_annotation_nested_window(spark):
    """A NULLS keyword NESTED inside an OVER window must not suppress
    the outer sort item's NULL-placement annotation (only depth-0
    NULLS is an explicit placement); likewise a nested DESC must not
    flip the outer item's direction classification."""
    q = transpile(
        "SELECT a FROM t ORDER BY sum(x) OVER (ORDER BY y NULLS LAST), a",
        "postgres",
    )
    assert q == ("SELECT a FROM t ORDER BY sum(x) OVER "
                 "(ORDER BY y NULLS LAST) NULLS LAST, a NULLS LAST")
    q2 = transpile(
        "SELECT a FROM t ORDER BY sum(x) OVER (ORDER BY y DESC), a",
        "postgres",
    )
    # outer item is ASC (pg appends NULLS LAST) even though a nested
    # DESC appears inside the window
    assert q2.endswith("OVER (ORDER BY y DESC NULLS FIRST) NULLS LAST, "
                       "a NULLS LAST")


def test_pg_interval_field_static_eval():
    """extract/date_part over INTERVAL literals evaluate statically
    with pg's non-normalizing field semantics (Spark's day-time
    intervals would fold 26 hours into 1 day 2 hours); non-literal
    interval operands are loud. Values pinned live on PG 15 (see
    tests/test_dialect_fuzz_pg.py interval-extract group)."""
    t = lambda s: transpile(f"SELECT {s} AS v", "postgres")
    assert t("extract(hour from INTERVAL '26 hours 3 minutes')") == \
        "SELECT 26 AS v"
    assert t("extract(day from INTERVAL '2 days 26 hours')") == \
        "SELECT 2 AS v"
    assert t("extract(minute from INTERVAL '-90 minutes')") == \
        "SELECT -30 AS v"
    assert t("extract(second from INTERVAL '1 min 30.5 sec')") == \
        "SELECT 30.5 AS v"
    assert t("extract(month from INTERVAL '14 months')") == "SELECT 2 AS v"
    assert t("extract(quarter from INTERVAL '-5 months')") == "SELECT 0 AS v"
    assert t("extract(epoch from INTERVAL '1 year 1 day')") == \
        "SELECT 31644000 AS v"
    assert t("extract(hour from INTERVAL 'PT26H3M')") == "SELECT 26 AS v"
    assert t("date_part('hour', INTERVAL '26 hours')") == "SELECT 26 AS v"
    assert t("date_part('epoch', INTERVAL '1 minute')") == "SELECT 60 AS v"
    # duckdb shares pg's interval storage model (verified against the
    # python duckdb module: hour('26 hours 3 min') = 26)
    assert transpile(
        "SELECT extract(hour from INTERVAL '26 hours 3 minutes') AS v",
        "duckdb",
    ) == "SELECT 26 AS v"
    with pytest.raises(TranspileError, match="normalizes"):
        t("extract(hour from INTERVAL '1 day' * 2)")
    with pytest.raises(TranspileError, match="statically"):
        t("extract(hour from INTERVAL 'next week')")
    with pytest.raises(TranspileError, match="interval"):
        t("date_part('hour', INTERVAL '1 hour' + INTERVAL '2 hours')")


def test_pg_quantified_subqueries_and_jsonb_mutation_louds():
    """= ANY(SELECT) → IN and <> ALL(SELECT) → NOT IN (pg-defined
    equivalences); jsonb mutation operators and interval::text louds."""
    assert transpile(
        "SELECT 2 = ANY(SELECT v FROM t) AS v", "postgres"
    ) == "SELECT 2 IN(SELECT v FROM t) AS v"
    assert transpile(
        "SELECT 2 <> ALL(SELECT v FROM t) AS v", "postgres"
    ) == "SELECT 2 NOT IN(SELECT v FROM t) AS v"
    with pytest.raises(TranspileError, match="EXISTS"):
        transpile("SELECT 2 > ANY(SELECT v FROM t)", "postgres")
    with pytest.raises(TranspileError, match="merge"):
        transpile(
            """SELECT '{"a":1}'::jsonb || '{"b":2}'::jsonb""", "postgres"
        )
    with pytest.raises(TranspileError, match="delete"):
        transpile("""SELECT ('{"a":1}'::jsonb) - 'a'""", "postgres")
    # jsonb ? maps since round 11 (wave 46, pinned live across all
    # three document shapes); ?|/?& stay loud
    q_exists = transpile("""SELECT '{"a":1}'::jsonb ? 'a'""", "postgres")
    assert "map_keys(from_json(" in q_exists and "= TRUE)" in q_exists
    assert q_exists == transpile(q_exists, "postgres")
    with pytest.raises(TranspileError, match="any/all keys"):
        transpile("SELECT j ?| array['a','b'] FROM t", "postgres")
    with pytest.raises(TranspileError, match="delete path"):
        transpile("SELECT j #- '{a}' FROM t", "postgres")
    with pytest.raises(TranspileError, match="interval::text"):
        transpile("SELECT (INTERVAL '1 day' * 3)::text", "postgres")
    with pytest.raises(TranspileError, match="interval::text"):
        transpile("SELECT make_interval(1, 2)::text", "postgres")
    # non-interval casts and interval-in-timestamp-arithmetic casts
    # keep working
    assert "STRING" in transpile(
        "SELECT (ts + INTERVAL '1 day')::text FROM t", "postgres"
    )


def test_pg_array_agg_distinct_sorted():
    """array_agg(DISTINCT x) sorts ascending NULL-last on pg (its
    sort-based distinct); the emission adds an explicit comparator."""
    sq = transpile(
        "SELECT array_agg(DISTINCT v) AS v FROM t", "postgres"
    )
    assert "array_sort" in sq and "_l._v IS NULL" in sq
    # plain array_agg keeps encounter order — no sort
    assert "array_sort" not in transpile(
        "SELECT array_agg(v) AS v FROM t", "postgres"
    )


def test_pg_round8_function_batch():
    """encode/decode codecs, to_hex, function-style casts, isfinite,
    get_byte, array helpers, regexp_match, named make_interval —
    round-8 pg call handlers (values pinned live in the fuzz suite)."""
    t = lambda s: transpile(f"SELECT {s} AS v", "postgres")
    assert t("encode(b, 'hex')") == "SELECT lower(hex((b))) AS v"
    assert t("decode(s, 'base64')") == "SELECT unbase64((s)) AS v"
    assert t("to_hex(255)") == "SELECT 'ff' AS v"
    assert "round" in t("int4(x)") and "::INT" not in t("isfinite(x)")
    assert t("isfinite(d)") == "SELECT IF((d) IS NULL, NULL, TRUE) AS v"
    assert "array_repeat((7), 3)" in t("array_fill(7, ARRAY[3])")
    assert "slice" in t("trim_array(a, 1)")
    assert "filter(transform" in t("array_positions(a, 1)")
    assert "nullif(size" in t("array_upper(a, 1)").replace(
        "cardinality", "size")
    assert "make_interval(0, 0, 0, 2, 0, 0, 0)" in \
        t("make_interval(days => 2)")
    with pytest.raises(TranspileError, match="32-bit"):
        t("to_hex(x)")
    with pytest.raises(TranspileError, match="escape"):
        t("encode(b, 'escape')")
    with pytest.raises(TranspileError, match="capture groups"):
        t("regexp_match(s, '(a)(b)')")


def test_pg_round8_operator_and_cast_batch():
    """@>/<@ containment (strict equality, NULL-operand → NULL), unary
    @/|// ||/ prefix ops, 'on'/'off' booleans, ::interval literals,
    '{...}'::type[] array literals, bytea::text hex rendering,
    OFFSET-LIMIT order swap, GROUPS frame loud."""
    t = lambda s: transpile(f"SELECT {s} AS v", "postgres")
    assert "array_contains" in t("ARRAY[1,2] @> ARRAY[2]")
    assert "forall" in t("a <@ b FROM t".replace(" FROM t", ""))
    assert t("@ -5") == "SELECT abs((-5)) AS v"
    assert t("|/ 25") == "SELECT sqrt((25)) AS v"
    assert t("||/ 27") == "SELECT cbrt((27)) AS v"
    assert t("'off'::boolean") == "SELECT FALSE AS v"
    assert t("'tr'::boolean") == "SELECT TRUE AS v"
    assert t("'1 year'::interval") == "SELECT INTERVAL '12' MONTH AS v"
    assert t("'90 minutes'::interval") == \
        "SELECT INTERVAL '5400000000' MICROSECOND AS v"
    assert t("'{1,2,3}'::int[]") == \
        "SELECT CAST(array(1, 2, 3) AS ARRAY<INT>) AS v"
    assert t("'{}'::int[]") == "SELECT CAST(array() AS ARRAY<INT>) AS v"
    assert "lower(hex" in t("'abc'::bytea::text")
    assert transpile(
        "SELECT v FROM t OFFSET 1 LIMIT 2", "postgres"
    ) == "SELECT v FROM t LIMIT 2 OFFSET 1"
    # mixed-family ::interval maps via make_interval since round 11
    # (previously loud), matching the INTERVAL-literal path
    assert "make_interval(0, 12, 0, 1, 0, 0, 0)" in \
        t("'1 year 1 day'::interval")
    with pytest.raises(TranspileError, match="GROUPS"):
        transpile(
            "SELECT sum(v) OVER (ORDER BY v GROUPS BETWEEN 1 "
            "PRECEDING AND CURRENT ROW) FROM t", "postgres")
    # a column named groups is NOT a frame
    assert "GROUPS" not in transpile(
        "SELECT groups BETWEEN 1 AND 2 FROM t", "postgres")
    with pytest.raises(TranspileError):
        t("x::time FROM t".replace(" FROM t", ""))
    assert t("x::uuid") == "SELECT x::STRING AS v"


def test_pg_round8_wave3_seams():
    """Third probe wave: zone-suffixed TIMESTAMP literals (pg ignores
    the suffix), TIMESTAMPTZ literals, exponent literals (pg NUMERIC),
    typed-literal spellings, MATERIALIZED hints, array_remove
    NULL-safety, localtimestamp, float→text / ts−ts→text louds,
    unnest bare aliases."""
    t = lambda s: transpile(f"SELECT {s} AS v", "postgres")
    assert t("TIMESTAMP '2024-01-01 00:00:00+02'") == \
        "SELECT TIMESTAMP '2024-01-01 00:00:00' AS v"
    assert t("TIMESTAMPTZ '2024-01-01 00:00:00+02'") == \
        "SELECT TIMESTAMP_LTZ '2024-01-01 00:00:00+02' AS v"
    # round 9: INTEGRAL exponent expansions keep NUMERIC typing via a
    # DECIMAL(38,0) cast (a bare digit expansion made `1e0 / 3` integer
    # division — 0 instead of pg's 0.333…); scale-0 decimal renders
    # '10000000000' through ::STRING, matching pg's '1e10'::text
    assert t("1e10::text") == \
        "SELECT CAST(10000000000 AS DECIMAL(38,0))::STRING AS v"
    assert "DIV" not in t("1e0 / 3")
    assert t("1.5e-3") == "SELECT 0.0015 AS v"
    assert t("float8 '-0' = 0") == "SELECT ('-0'::DOUBLE) = 0 AS v"
    assert t("bool 't'") == "SELECT ('t'::BOOLEAN) AS v"
    assert "filter" in t("array_remove(a, NULL)")
    assert t("localtimestamp") == "SELECT localtimestamp() AS v"
    assert transpile(
        "WITH c AS MATERIALIZED (SELECT 2 v) SELECT v FROM c", "postgres"
    ).startswith("WITH c AS  (SELECT")
    assert transpile(
        "SELECT * FROM unnest(a) x", "postgres"
    ) == "SELECT * FROM explode(a) x(x)"
    # select-position unnest keeps a plain alias
    assert transpile(
        "SELECT unnest(a) AS u FROM t", "postgres"
    ) == "SELECT explode(a) AS u FROM t"
    with pytest.raises(TranspileError, match="rendering"):
        t("x::float8::text FROM t".replace(" FROM t", ""))
    with pytest.raises(TranspileError, match="interval::text"):
        t("(TIMESTAMP '2024-01-02 00:00:00' - "
          "TIMESTAMP '2024-01-01 00:00:00')::text")
    with pytest.raises(TranspileError, match="TIME literals"):
        t("TIME '14:30:00'")


def test_duckdb_round8_batch():
    """DuckDB probe batch: map(keys, values) construction, try_cast
    rounding, in-aggregate ORDER BY, struct literals, list helpers,
    range() exclusive stop, time_bucket, map-subscript list shape.
    Values pinned against the duckdb module in tests/test_dialect_fuzz.py."""
    t = lambda s: transpile(f"SELECT {s} AS v", "duckdb")
    assert "map_from_arrays" in t("map([1,2],['a','b'])")
    assert "DECIMAL(38,9)" in t("try_cast('3.9' AS INT)")
    assert t("(SELECT sum(x ORDER BY x) FROM t)") == \
        "SELECT (SELECT sum(x) FROM t) AS v"
    assert "max_by" in t("(SELECT first(x ORDER BY k DESC) FROM t)")
    assert "min_by" in t("(SELECT last(x ORDER BY k DESC) FROM t)")
    # NULLS LAST is duckdb's default null order — consumed, same mapping;
    # NULLS FIRST selects a NULL-keyed row (min_by/max_by ignore NULL
    # keys) — loud (round-9 ADVICE: the tail used to leak into
    # min_by((x), (y NULLS LAST)), invalid Spark, and hid the DESC)
    # the identity-IF key wrap is the round-10 marker keeping the
    # max_by NULL-skip handler off this emission (first/last KEEP
    # NULL values, unlike duck max_by)
    assert t("(SELECT first(x ORDER BY k NULLS LAST) FROM t)") == \
        "SELECT (SELECT min_by((x), IF((k) IS NULL, NULL, (k))) FROM t) AS v"
    assert "max_by" in t("(SELECT first(x ORDER BY k DESC NULLS LAST) FROM t)")
    with pytest.raises(TranspileError, match="NULLS FIRST"):
        t("(SELECT first(x ORDER BY k NULLS FIRST) FROM t)")
    with pytest.raises(TranspileError, match="NULLS FIRST"):
        t("(SELECT last(x ORDER BY k DESC NULLS FIRST) FROM t)")
    assert t("struct_pack(a := 1).a") == \
        "SELECT named_struct('a', (1)).a AS v"
    assert "named_struct" in t("{'a': 1, 'b': 2}.b")
    assert t("MAP {'k': 42}") == \
        "SELECT map_from_arrays(array(('k')), array((42))) AS v"
    assert "sort_array" in t("list_reverse_sort(a)")
    assert "array_distinct" in t("list_unique(a)")
    assert "slice" in t("array_pop_back(a)")
    assert t("list_slice(a, 2, 3)") == "SELECT slice((a), 2, 2) AS v"
    assert "sequence((0), (3) - 1)" in t("range(3)")
    assert "2000-01-03" in t("time_bucket(INTERVAL '1 hour', ts)")
    assert "map_contains_key" in t("map([1],[2])[1]")
    assert "conv((255), 10, (16))" in t("to_base(255, 16)")
    assert t("week(d)") == "SELECT weekofyear(d) AS v"
    assert t("editdist3(a, b)") == "SELECT levenshtein(a, b) AS v"
    with pytest.raises(TranspileError, match="struct key"):
        t("(SELECT first(x ORDER BY a, b) FROM t)")
    with pytest.raises(TranspileError):
        t("list_slice(a, -1, 2)")  # mixed-sign bounds
    with pytest.raises(TranspileError, match="offset"):
        t("time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes')")


def test_duckdb_round9_passthrough_tier():
    """Round-9 pass-through eliminations (each previously walked through
    verbatim into a silent wrong value or a confusing Spark error —
    probe-verified): hash() loud (64-bit engine hash vs Spark's 32-bit
    Murmur3), COLUMNS()/statement PIVOT/unnest(recursive :=) loud,
    len(list) → size, regexp_matches flags inline."""
    t = lambda s: transpile(s, "duckdb")
    with pytest.raises(TranspileError, match="Murmur3"):
        t("SELECT hash(42)")
    with pytest.raises(TranspileError, match="list the columns"):
        t("SELECT COLUMNS('l_.*') FROM t")
    with pytest.raises(TranspileError, match="enumerated"):
        t("PIVOT cities ON year USING sum(amount)")
    with pytest.raises(TranspileError, match="enumerated"):
        t("SELECT * FROM (PIVOT c ON y USING sum(a))")
    with pytest.raises(TranspileError, match="enumerated"):
        t("UNPIVOT m ON a, b INTO NAME x VALUE v")
    with pytest.raises(TranspileError, match="one-level"):
        t("SELECT unnest(a, recursive := true) FROM t")
    with pytest.raises(TranspileError, match="no exact Java-regex flag"):
        t("SELECT regexp_matches(s, 'A', 'g') FROM t")
    with pytest.raises(TranspileError, match="typeof"):
        t("SELECT typeof(42)")
    # round-9 window wave: frame EXCLUDE is loud on the duck read too
    # (was pg-only — dispatch-gate mismatch), and aggregate FILTER
    # OVER a window louds at render time for every read (Spark rejects
    # it at RUNTIME with 'not supported yet')
    with pytest.raises(TranspileError, match="EXCLUDE"):
        t("SELECT sum(v) OVER (ORDER BY v ROWS BETWEEN 1 PRECEDING "
          "AND 1 FOLLOWING EXCLUDE CURRENT ROW) FROM t")
    assert "EXCEPT" in t("SELECT * EXCLUDE (b) FROM t")
    for read in ("duckdb", "postgres", "trino"):
        with pytest.raises(TranspileError, match="CASE inside"):
            transpile(
                "SELECT count(*) FILTER (WHERE v > 1) "
                "OVER (ORDER BY v) FROM t", read)
    # plain FILTER (no window) keeps working — Spark supports it
    assert "FILTER" in transpile(
        "SELECT count(*) FILTER (WHERE v > 1) FROM t", "postgres")
    # Spark's own PIVOT clause (paren follows) and plain identifiers
    # named pivot are untouched
    assert "PIVOT (sum(a)" in t("SELECT * FROM t PIVOT (sum(a) FOR y IN (1,2))")
    assert t("SELECT pivot FROM t") == "SELECT pivot FROM t"
    assert t("SELECT unnest(a) FROM t") == "SELECT explode(a) FROM t"
    assert t("SELECT len([1,2])") == "SELECT size((array(1,2)))"
    assert t("SELECT len(s) FROM t") == "SELECT len(s) FROM t"
    assert t("SELECT regexp_matches(s, 'A', 'i') FROM t") == \
        "SELECT regexp_like((s), '(?i)A') FROM t"


def test_pg_round9_json_and_clause_tier():
    """Round-9 pg constructs: JSON constructor scalar forms (text forms
    pinned live on PG 15 — see tests/test_dialect_fuzz_pg.py for the
    value pins), row-lock clause strip, nested-constructor cardinality,
    crosstab loud."""
    t = lambda s: transpile(s, "postgres")
    out = t("SELECT json_agg(x) FROM t")
    assert "array_agg(struct((x) AS _v))" in out and "', '" in out
    assert "CASE WHEN size" in out  # NULL on empty input
    assert t(out) == out  # fixpoint-stable
    assert '\'{"a" : \'' in t("SELECT json_build_object('a', 1)")
    # jsonb sorts keys (byte length then bytewise) and dedups last-wins
    jb = t("SELECT jsonb_build_object('b', 2, 'a', 1)")
    assert jb.index('"a": ') < jb.index('"b": ')
    assert "ignoreNullFields" in t("SELECT row_to_json(t) FROM t")
    # json_agg ORDER BY maps since round 11 (wave 53 comparator)
    ja_o = t("SELECT json_agg(x ORDER BY x) FROM t")
    assert "array_sort" in ja_o and ja_o == t(ja_o)
    with pytest.raises(TranspileError, match="literal string keys"):
        t("SELECT json_build_object(k, 1) FROM t")
    with pytest.raises(TranspileError):
        t("SELECT to_json(x) FROM t")  # bare to_json stays loud
    assert t("SELECT a FROM t FOR UPDATE") == "SELECT a FROM t "
    assert t("SELECT a FROM t FOR NO KEY UPDATE SKIP LOCKED") == \
        "SELECT a FROM t "
    assert t("SELECT cardinality(ARRAY[[1,2],[3,4]])") == \
        "SELECT size(flatten(array(array(1,2),array(3,4))))"
    with pytest.raises(TranspileError, match="3-D"):
        t("SELECT cardinality(ARRAY[[[1]]])")
    with pytest.raises(TranspileError, match="enumerated"):
        t("SELECT crosstab('select 1')")


def test_chr_code_point_snowflake_trino():
    """Snowflake CHR/CHAR and Trino chr() are Unicode-code-point
    functions (per their docs; pg/duckdb pinned live) — Spark chr()
    wraps at 256, so all four reads route through format_string('%c').
    CAST type positions (char(10)) are untouched."""
    assert transpile("SELECT chr(955) AS v", "snowflake") == \
        "SELECT IF((955) IS NULL, NULL, format_string('%c', (955))) AS v"
    assert transpile("SELECT char(955) AS v", "snowflake") == \
        "SELECT IF((955) IS NULL, NULL, format_string('%c', (955))) AS v"
    assert transpile("SELECT chr(955) AS v", "trino") == \
        "SELECT IF((955) IS NULL, NULL, format_string('%c', (955))) AS v"
    assert transpile(
        "SELECT CAST(x AS char(10)) FROM t", "snowflake"
    ) == "SELECT CAST(x AS char(10)) FROM t"
    # mysql CHAR() is a different (variadic, byte-based) function —
    # not rewritten
    assert transpile("SELECT char(65) AS v", "mysql") == \
        "SELECT char(65) AS v"


def test_pg_hypothetical_set_and_json_agg_loud():
    """Hypothetical-set aggregates (rank(x) WITHIN GROUP — 'the rank x
    WOULD have') are loud; window-form rank() keeps working. regr_* /
    covar_* / corr pass through natively (probed value-equal on live
    PG 15). json_agg's scalar form maps faithfully since round 9 (see
    test_pg_round9_json_and_clause_tier); its single-key ORDER BY form
    maps since round 11 (wave 53 comparator); DISTINCT stays loud."""
    with pytest.raises(TranspileError, match="hypothetical"):
        transpile(
            "SELECT rank(2) WITHIN GROUP (ORDER BY v) FROM t", "postgres")
    assert "array_sort" in transpile(
        "SELECT json_agg(v ORDER BY v) FROM t", "postgres")
    with pytest.raises(TranspileError, match="DISTINCT"):
        transpile("SELECT json_agg(DISTINCT v) FROM t", "postgres")
    assert "OVER" in transpile(
        "SELECT rank() OVER (ORDER BY v) FROM t", "postgres")
    assert transpile(
        "SELECT regr_slope(y, x) FROM t", "postgres"
    ) == "SELECT regr_slope(y, x) FROM t"


def test_duck_map_access_seam_round10():
    """Round-9 verdict's silent-wrong: duck element_at(map, k) /
    map_extract(map, k) return a LIST ([v] hit, [] miss/NULL key/NULL
    map — pinned live, duckdb 1.0) where Spark's element_at is the
    SCALAR. Both now rewrite to the entries-filter list form (duck's
    binder rejects non-map bases, so the rewrite is safe for untyped
    columns). map_concat is a last-wins left-fold (duck: first-
    appearance key order, NULL operands as empty unless ALL NULL,
    <2 args rejected — all pinned live). Value parity is pinned by the
    fuzz corpus and tools/probes/duck_map_wave15.txt."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    out = t("SELECT element_at(m, 'a') AS v FROM t")
    assert "filter(map_entries((m)), _me -> _me.key <=> ('a'))" in out
    assert out == t(out)  # fixpoint-stable
    assert t("SELECT map_extract(m, 'a') AS v FROM t") == out.replace(
        "map_extract", "element_at")
    # binding-trick emissions from other handlers stay untouched
    inert = "SELECT element_at(transform(array(1), _x -> _x), 1) AS v"
    assert t(inert) == inert
    with pytest.raises(TranspileError, match="takes \\(map, key\\)"):
        t("SELECT element_at(m, 'a', 'b') FROM t")
    mc = t("SELECT map_concat(m1, m2) AS v FROM t")
    assert "_s0._m1 IS NULL AND _s0._m2 IS NULL" in mc  # all-NULL → NULL
    assert "flatten(array(" in mc          # never concat(): rewrapped
    assert mc == t(mc)
    mc3 = t("SELECT map_concat(m1, m2, m3) AS v FROM t")
    assert "_s1" in mc3 and mc3 == t(mc3)  # left-fold nests
    with pytest.raises(TranspileError, match="2 or more"):
        t("SELECT map_concat(m1) FROM t")
    # duck MAP(K, V) cast types translate (previously passed through)
    assert t("SELECT CAST(NULL AS map(varchar, bigint)) AS v") == \
        "SELECT CAST(NULL AS MAP<STRING, BIGINT>) AS v"
    assert t("SELECT NULL::map(varchar,int) AS v") == \
        "SELECT NULL::MAP<STRING, INT> AS v"


def test_pg_initcap_null_and_to_json_whitelist_round10():
    """Round-10 advice fixes. (1) initcap(NULL) IS NULL in pg (pinned
    live); the per-char rebuild now joins with array_join — a NULL-
    propagating joiner — where concat_ws silently yielded ''. (2) The
    to_json fixpoint consumer keys on the OWN-EMISSION TAG (the
    options-map second argument every _pg_json_text / row_to_json
    emission carries; pg to_json is unary so a 2-arg call can only be
    ours) — user-written to_json(ARRAY[...]) / to_json(struct_expr)
    stays loud instead of silently hitting Spark's encoder with its
    per-type text divergences."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    out = t("SELECT initcap(x) AS v FROM t")
    assert "array_join(" in out and "concat_ws" not in out
    # (no fixpoint assert: the emission carries backslash character-
    # class literals, exempt from re-transpile idempotence by the same
    # policy as the fuzz corpus)
    # own emissions still consumed across fixpoint passes
    ja = t("SELECT json_agg(x) AS v FROM t")
    assert "to_json(array((_s._v)), map('ignoreNullFields', 'false'))" \
        in ja
    assert ja == t(ja)
    rj = t("SELECT row_to_json(t) AS v FROM t")
    assert rj == t(rj)
    # user-written unary to_json over array/struct shapes: LOUD again
    for bad in (
        "SELECT to_json(ARRAY[1,2]) FROM t",
        "SELECT to_json(array_agg(x)) FROM t",
        "SELECT to_json(x) FROM t",
    ):
        with pytest.raises(TranspileError):
            t(bad)


def test_pg_regexp_flag_start_tier_round10():
    """PG-15 regexp_like/count/instr/substr flag+start arguments and
    the regexp_split_to_array flags form (previously SPARK_ERR pass-
    throughs — round-9 verdict item 1). Values pinned live in
    tools/probes/pg_regex_wave16.txt (42 MATCH / 0 WRONG)."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    out = t("SELECT regexp_like(x, 'ab', 'i') AS v FROM t")
    assert out == "SELECT regexp_like((x), '(?i)ab') AS v FROM t"
    assert t(out) == out
    assert t("SELECT regexp_split_to_array(x, 'ab', 'i') FROM t") == \
        "SELECT split((x), '(?i)ab') FROM t"
    assert t("SELECT regexp_count(x, 'ab', 3) AS v FROM t") == \
        "SELECT regexp_count(substring((x) FROM (3)), ('ab')) AS v FROM t"
    assert t("SELECT regexp_count(x, 'ab', 3, 'i') AS v FROM t") == \
        "SELECT regexp_count(substring((x) FROM (3)), '(?i)ab') AS v FROM t"
    assert t("SELECT regexp_substr(x, 'ab', 3) AS v FROM t") == \
        "SELECT regexp_substr(substring((x) FROM (3)), ('ab')) AS v FROM t"
    inst = t("SELECT regexp_instr(x, 'ab', 3) AS v FROM t")
    assert "nullif(regexp_instr(substring(_rt._rs FROM _rt._ri)" in inst
    assert t(inst) == inst
    # N / endoption / subexpr: only literal defaults transpile
    assert "nullif" in t("SELECT regexp_instr(x, 'a', 2, 1, 0) FROM t")
    with pytest.raises(TranspileError, match="occurrence"):
        t("SELECT regexp_instr(x, 'a', 1, 2) FROM t")
    with pytest.raises(TranspileError, match="occurrence"):
        t("SELECT regexp_substr(x, 'a', 1, 3) FROM t")
    with pytest.raises(TranspileError, match="flag string"):
        t("SELECT regexp_like(x, 'a', 'n') FROM t")
    with pytest.raises(TranspileError, match="literal pattern"):
        t("SELECT regexp_like(x, p, 'i') FROM t")
    # regexp_replace extended flags: g+i/c/s inline; bare i stays loud
    assert "'(?i)a'" in t("SELECT regexp_replace(x, 'a', 'y', 'gi') FROM t")
    with pytest.raises(TranspileError):
        t("SELECT regexp_replace(x, 'a', 'y', 'i') FROM t")


def test_convert_regex_literal_are_seams_round10():
    """pg ARE / duck RE2 default-semantics seams vs Java (all pinned
    live, round 10): pg's dot matches newline (Java's doesn't) → (?s)
    prefix; Java's $ also matches before a FINAL newline (pg and RE2
    mean absolute end) → \\z; pg-only/RE2-only flag-group letters are
    loud. Wave: pg_regex_wave16.txt."""
    from sqlmesh_spark.core.transpile_text import convert_regex_literal

    assert convert_regex_literal("a.b", "postgres") == "(?s)a.b"
    assert convert_regex_literal("a.b", "duckdb") == "a.b"
    assert convert_regex_literal("ab$", "postgres") == "ab\\z"
    assert convert_regex_literal("ab$", "duckdb") == "ab\\z"
    assert convert_regex_literal("a$|b$", "postgres") == "a\\z|b\\z"
    # $ inside a class and escaped \$ stay literal; \. is not a dot
    assert convert_regex_literal("a[$.]b", "postgres") == "a[$.]b"
    assert convert_regex_literal("a\\$b", "postgres") == "a\\$b"
    assert convert_regex_literal("a\\.b", "postgres") == "a\\.b"
    # idempotent on its own output
    out = convert_regex_literal("(?i)a.b$", "postgres")
    assert out == "(?s)(?i)a.b\\z"
    assert convert_regex_literal(out, "postgres") == out
    # (?m) keeps $ (line-boundary semantics), duck read
    assert convert_regex_literal("(?m)a$", "duckdb") == "(?m)a$"
    # user-written \z survives
    assert convert_regex_literal("a\\z", "duckdb") == "a\\z"
    with pytest.raises(TranspileError, match="differs"):
        convert_regex_literal("(?n)a.b", "postgres")
    with pytest.raises(TranspileError, match="differs"):
        convert_regex_literal("(?U)a+", "duckdb")
    # the ~ operator and SIMILAR TO pick the seams up end-to-end
    assert transpile("SELECT x ~ 'a.b$' FROM t", "postgres") == \
        "SELECT x  RLIKE  '(?s)a.b\\\\z' FROM t"
    assert transpile("SELECT x SIMILAR TO 'a_b' FROM t", "postgres") == \
        "SELECT x RLIKE '(?s)^(?:a.b)\\\\z' FROM t"


def test_pg_iso_and_mixed_interval_literals_round10():
    """ISO-8601 interval literals (INTERVAL 'P1Y2M3D') and MIXED
    year-month + day-time verbose literals both die in Spark's parser
    (the P-form entirely; mixing with "Cannot mix year-month and
    day-time fields" — pinned live). Decompose via _pg_interval_parts
    and re-emit: single-family as unit spellings, mixed as
    make_interval. Values pinned live in pg_interval_wave17.txt (18
    MATCH). duck rejects the P-form itself (pg-only handler)."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    assert t("SELECT x + INTERVAL 'P1Y2M3D' FROM t") == \
        "SELECT x + make_interval(0, 14, 0, 3, 0, 0, 0) FROM t"
    assert t("SELECT x + INTERVAL 'P2M' FROM t") == \
        "SELECT x + INTERVAL '2 months' FROM t"
    assert t("SELECT x + INTERVAL 'P1DT2H30M5.5S' FROM t") == \
        "SELECT x + INTERVAL '1 days 9005.5 seconds' FROM t"
    assert t("SELECT x + INTERVAL 'PT36H' FROM t") == \
        "SELECT x + INTERVAL '0 days 129600 seconds' FROM t"
    # per-component ISO signs: P-1Y3D = -1 years +3 days (pinned live)
    assert t("SELECT x + INTERVAL 'P-1Y3D' FROM t") == \
        "SELECT x + make_interval(0, -12, 0, 3, 0, 0, 0) FROM t"
    # mixed VERBOSE literal — also unparseable by Spark
    assert t("SELECT x + INTERVAL '1 year 3 days' FROM t") == \
        "SELECT x + make_interval(0, 12, 0, 3, 0, 0, 0) FROM t"
    # single-family verbose literals keep their native spelling
    assert t("SELECT x + INTERVAL '1 year 2 months' FROM t") == \
        "SELECT x + INTERVAL '1 year 2 months' FROM t"
    assert t("SELECT x + INTERVAL '3 days 2 hours' FROM t") == \
        "SELECT x + INTERVAL '3 days 2 hours' FROM t"
    # julian extract field (pg + duck identical, pinned live)
    out = t("SELECT extract(julian from d) AS v FROM t")
    assert "2440588" in out and "CAST(86400000000 AS DOUBLE)" in out
    assert "2440588" in transpile(
        "SELECT date_part('julian', d) FROM t", "duckdb")


def test_duck_string_slicing_round10():
    """duck slices VARCHAR with the same 1-based inclusive clamped
    semantics as lists ('hello'[2:4]='ell', [4:2]='', [2:99]='ello',
    array_slice('hello',-3,-1)='llo' — all pinned live); Spark's
    slice() is array-only, so statically-string bases now emit
    substring (shares the clamp AND negative-start meaning). Values
    pinned by the round-10 fuzz templates."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    assert t("SELECT ('hello')[2:4] AS v") == \
        "SELECT substring(('hello') FROM 2 FOR 3) AS v"
    assert t("SELECT ('hello')[2:] AS v") == \
        "SELECT substring(('hello') FROM 2) AS v"
    assert t("SELECT ('hello')[:3] AS v") == \
        "SELECT substring(('hello') FROM 1 FOR 3) AS v"
    assert t("SELECT ('hello')[4:2] AS v") == \
        "SELECT substring(('hello') FROM 1 FOR 0) AS v"
    assert t("SELECT array_slice('hello', 2, 4) AS v") == \
        "SELECT substring(('hello') FROM 2 FOR 3) AS v"
    assert t("SELECT array_slice('hello', -3, -1) AS v") == \
        "SELECT substring(('hello') FROM -3 FOR 3) AS v"
    # list bases keep the array path
    assert t("SELECT ([1,2,3])[1:2] AS v") == \
        "SELECT slice((array(1,2,3)), 1, 2) AS v"
    assert t("SELECT array_slice(arr, 2, 3) AS v FROM t") == \
        "SELECT slice((arr), 2, 2) AS v FROM t"


def test_duck_comprehensions_zip_asof_round10():
    """duck list comprehensions previously shipped verbatim into Spark
    parse errors (the bracket literal becomes array(expr FOR v IN ...));
    they now map to transform (+ filter for the IF tail — duck filters
    BEFORE mapping, pinned live). list_zip maps to arrays_zip with each
    leg coalesced to array() (duck treats a NULL list as empty-but-
    padded where arrays_zip returns NULL — pinned live); the truncate
    flag and ASOF JOIN are loud. Values pinned in
    tools/probes/duck_comprehension_wave20.txt (14 MATCH)."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    out = t("SELECT [x + 1 FOR x IN [1,2,3]] AS v")
    assert out == \
        "SELECT transform((array(1,2,3)), x -> (x + 1)) AS v"
    assert t(out) == out
    out2 = t("SELECT [x FOR x IN l IF x > 1] AS v FROM t")
    assert out2 == \
        "SELECT transform(filter((l), x -> (x > 1)), x -> (x)) AS v FROM t"
    # nesting resolves one layer per fixpoint pass
    nested = t("SELECT [[y FOR y IN [1,2]] FOR x IN [1,2]] AS v")
    assert nested.count("transform") == 2 and "FOR" not in nested
    zp = t("SELECT list_zip(a, b) AS v FROM t")
    assert zp == ("SELECT arrays_zip(coalesce((a), array()), "
                  "coalesce((b), array())) AS v FROM t")
    with pytest.raises(TranspileError, match="SHORTEST"):
        t("SELECT list_zip(a, b, true) FROM t")
    with pytest.raises(TranspileError, match="ASOF"):
        t("SELECT * FROM t1 ASOF JOIN t2 ON t1.v >= t2.v")
    with pytest.raises(TranspileError, match="ASOF"):
        t("SELECT * FROM t1 ASOF LEFT JOIN t2 ON t1.v >= t2.v")


def test_duck_collision_sweep_round10():
    """Fixes from the round-10 MECHANICAL collision sweep (one probe
    per scalar signature shared by both duck and Spark catalogs —
    tools/probes/duck_collision_wave21.txt, 137 MATCH / 0 WRONG).
    duck to_binary IS bin (number → bit STRING '11'; Spark's
    to_binary(3) is BYTES); bin/to_binary over varchar render UTF-8
    bytes as a bit string (loud); least/greatest accept ONE argument
    in duck; 1-arg make_timestamp takes epoch MICROS; 1-arg
    encode/decode are UTF-8 conversions; length() of a static list is
    its cardinality; interval field functions statically evaluate
    (year(INTERVAL 26 MONTH) = 2); a literal regexp_extract group
    index beyond the pattern's groups returns ''. All pinned live."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    assert t("SELECT to_binary(x) AS v FROM t") == \
        "SELECT bin(x) AS v FROM t"
    with pytest.raises(TranspileError, match="bit string"):
        t("SELECT bin('ab') AS v")
    assert t("SELECT least(x) AS v FROM t") == "SELECT (x) AS v FROM t"
    assert t("SELECT greatest(1 + 2) AS v") == "SELECT (1 + 2) AS v"
    assert t("SELECT make_timestamp(x) AS v FROM t") == \
        "SELECT timestamp_micros((x)) AS v FROM t"
    assert "make_timestamp(2024" in t(
        "SELECT make_timestamp(2024, 1, 2, 3, 4, 5.0) AS v")
    assert t("SELECT encode(s) AS v FROM t") == \
        "SELECT encode((s), 'UTF-8') AS v FROM t"
    assert t("SELECT decode(b) AS v FROM t") == \
        "SELECT decode((b), 'UTF-8') AS v FROM t"
    assert t("SELECT length([1,2,3]) AS v") == \
        "SELECT size((array(1,2,3))) AS v"
    assert t("SELECT length(s) AS v FROM t") == \
        "SELECT length(s) AS v FROM t"
    assert t("SELECT year(INTERVAL 26 MONTH) AS v") == "SELECT 2 AS v"
    assert t("SELECT day(INTERVAL '400 days') AS v") == \
        "SELECT 400 AS v"
    assert t("SELECT year(d) AS v FROM t") == "SELECT year(d) AS v FROM t"
    assert t("SELECT regexp_extract('ab', '(a)(b)', 3) AS v") == \
        "SELECT IF(('ab') IS NULL, NULL, '') AS v"
    assert "regexp_extract('ab', '(a)(b)', 2)" in t(
        "SELECT regexp_extract('ab', '(a)(b)', 2) AS v")
    with pytest.raises(TranspileError, match="BINARY"):
        t("SELECT repeat(x::blob, 3) FROM t")
    with pytest.raises(TranspileError, match="TIME"):
        t("SELECT make_time(1, 2, 3.0)")
    # json_array_length: path miss is NULL (not 0); pointer paths loud
    out = t("SELECT json_array_length(j, '$.a') AS v FROM t")
    assert "IS NULL THEN NULL" in out and "coalesce" in out
    with pytest.raises(TranspileError, match="JSONPath"):
        t("SELECT json_array_length(j, '/a') FROM t")
    # dayofyear passes through natively (previously re-dispatched
    # forever through its own template)
    assert t("SELECT dayofyear(d) AS v FROM t") == \
        "SELECT dayofyear(d) AS v FROM t"


def test_pg_collision_sweep_round10():
    """pg-side mechanical collision sweep fixes
    (tools/probes/pg_collision_wave22.txt — 102 MATCH / 0 WRONG):
    width_bucket's 2-arg thresholds-ARRAY form (Spark has only the
    4-arg numeric form) computes the count of thresholds <= operand
    with a NULL-operand guard (pinned live: (7,[1,5,10])=2,
    (0,..)=0, (10,..)=3, NULL→NULL); bytea trims and
    bit_count(bytea) are loud (Spark coerces binary to STRING /
    rejects binary)."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    out = t("SELECT width_bucket(x, ARRAY[1,5,10]) AS v FROM t")
    assert out == ("SELECT IF((x) IS NULL, NULL, "
                   "size(filter((array(1,5,10)), _wb -> _wb <= (x)))) "
                   "AS v FROM t")
    assert t(out) == out
    # the 4-arg numeric form passes through (Spark-identical)
    assert t("SELECT width_bucket(x, 0, 10, 5) AS v FROM t") == \
        "SELECT width_bucket(x, 0, 10, 5) AS v FROM t"
    with pytest.raises(TranspileError, match="BINARY"):
        t("SELECT btrim(a::bytea, b::bytea) FROM t")
    with pytest.raises(TranspileError, match="integral-only"):
        t("SELECT bit_count(x::bytea) FROM t")
    assert t("SELECT bit_count(7) AS v") == "SELECT bit_count(7) AS v"


def test_null_argument_sweep_round10():
    """Round-10 NULL-argument sweeps (waves 23/24): STRICT-function
    NULL propagation the emissions silently broke. chr(NULL) is NULL
    everywhere (format_string rendered the TEXT 'null'); duck
    right(s, NULL) is NULL (Spark greatest() ignores NULL operands —
    the position fell through to 1); duck isnan(NULL) is NULL (Spark:
    false); duck split(s, NULL) leaves the string unsplit; pg
    regexp_instr is strict (the start-offset emission coalesced NULL
    to 0)."""
    td = lambda s: transpile(s, "duckdb")  # noqa: E731
    out = td("SELECT chr(n) AS v FROM t")
    assert out == \
        "SELECT IF((n) IS NULL, NULL, format_string('%c', (n))) AS v FROM t"
    r = td("SELECT right(s, n) AS v FROM t")
    assert r.startswith("SELECT if((n) IS NULL, NULL, substring(")
    isn = td("SELECT isnan(x) AS v FROM t")
    assert isn == ("SELECT (CASE WHEN (x) IS NULL THEN NULL ELSE "
                   "isnan(CAST((x) AS DOUBLE)) END) AS v FROM t")
    assert td(isn) == isn  # own emission (CAST arg) stays inert
    assert td("SELECT split(s, NULL) AS v FROM t") == \
        "SELECT IF((s) IS NULL, NULL, array((s))) AS v FROM t"
    inst = transpile(
        "SELECT regexp_instr(s, 'a', 2) AS v FROM t", "postgres")
    assert "_rt._rs IS NULL OR _rt._ri IS NULL" in inst


def test_aggregate_sweep_round10():
    """Round-10 aggregate sweep (wave 25): duck/pg avg computes at
    full precision where Spark's decimal avg rounds at scale+4 — the
    input casts to DOUBLE (DISTINCT stays outside; interval/star/CAST
    operands skip); duck max_by-family aggregates SKIP NULL values
    where Spark's keep them. Values pinned live both engines."""
    td = lambda s: transpile(s, "duckdb")  # noqa: E731
    out = td("SELECT avg(v) AS v FROM t")
    assert out == "SELECT avg(CAST((v) AS DOUBLE)) AS v FROM t"
    assert td(out) == out
    assert td("SELECT mean(v) AS v FROM t") == out
    assert td("SELECT avg(DISTINCT v) AS v FROM t") == \
        "SELECT avg(DISTINCT CAST((v) AS DOUBLE)) AS v FROM t"
    assert transpile("SELECT avg(v) AS v FROM t", "postgres") == out
    # pg interval operands skip the cast statically
    assert transpile(
        "SELECT avg(x + INTERVAL '1 day') AS v FROM t", "postgres"
    ).startswith("SELECT avg(CAST((")  # non-INTERVAL-leading: casts
    assert "CAST" not in transpile(
        "SELECT avg(INTERVAL '1 day') AS v FROM t", "postgres")
    mb = td("SELECT max_by(a, b) AS v FROM t")
    assert mb == \
        "SELECT max_by((a), IF((a) IS NULL, NULL, (b))) AS v FROM t"
    assert td(mb) == mb
    with pytest.raises(TranspileError, match="KEEPS NULL"):
        td("SELECT arg_max_null(a, b) FROM t")


def test_duck_date_minus_date_round10():
    """duck DATE - DATE is INTEGER days (68 for Mar 9 - Jan 1, pinned
    live — same as pg); Spark's date subtraction returns an INTERVAL.
    The literal shape rewrites to datediff on the duck read too (the
    pg handler predates this; wave 26)."""
    assert transpile(
        "SELECT DATE '2024-03-09' - DATE '2024-01-01' AS v", "duckdb"
    ) == "SELECT datediff(DATE '2024-03-09' , DATE '2024-01-01') AS v"
    out = transpile("SELECT d1 - d2 AS v FROM t", "duckdb")
    assert out == "SELECT d1 - d2 AS v FROM t"  # columns pass through


def test_duck_query_clauses_round10():
    """Wave 27 (--table, both reads): duck DISTINCT ON shares the pg
    ROW_NUMBER rewrite (duck merely drops pg's ORDER-BY-prefix
    requirement, which the rewrite never used); duck OFFSET-before-
    LIMIT swaps and FETCH FIRST maps — all previously Spark parse
    errors on the duck read (the pg read had every one)."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    out = t("SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v")
    assert "ROW_NUMBER() OVER (PARTITION BY" in out.upper()
    assert t("SELECT v FROM t ORDER BY v OFFSET 1 LIMIT 2") == \
        "SELECT v FROM t ORDER BY v NULLS LAST LIMIT 2 OFFSET 1"
    assert t("SELECT v FROM t ORDER BY v FETCH FIRST 2 ROWS ONLY") == \
        "SELECT v FROM t ORDER BY v NULLS LAST LIMIT 2"


def test_duck_row_struct_round10():
    """Wave 30: bare duck row(1, 'a') constructors rename to struct
    (positional tuple parity); row-vs-row COMPARISONS stay with the
    field-wise 3VL expansion in container_ops (Spark's native struct
    compare treats NULL as smallest — renaming there would be a silent
    divergence); struct_insert is loud; map_from_entries joins the
    statically-visible map constructors for bracket access."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    assert t("SELECT row(1, 'a') AS v") == "SELECT struct(1, 'a') AS v"
    # comparison context: field-wise expansion, NOT the rename
    cmp_out = t("SELECT row(1, NULL) = row(1, 2) AS v")
    assert "struct((1) AS _r0" in cmp_out and "<=>" not in cmp_out[:20]
    with pytest.raises(TranspileError, match="field list"):
        t("SELECT struct_insert(s, b := 2) FROM t")
    mb = t("SELECT map_from_entries([('a', 1)])['a'] AS v")
    assert "map_contains_key" in mb and "try_element_at" in mb


def test_pg_only_name_tier_round10():
    """Wave 32 (pg-only-name sweep — pg_catalog scalars Spark lacks,
    previously unresolved-routine passthroughs): degree trig via
    radians/degrees, array_length/upper as nullif(size(), 0) (pg
    returns NULL for empty arrays), array_lower 1-or-NULL, and loud
    gcd/sequences/clock_timestamp/array_to_json."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    assert t("SELECT sind(x) AS v FROM t") == \
        "SELECT sin(radians((x))) AS v FROM t"
    assert t("SELECT atan2d(y, x) AS v FROM t") == \
        "SELECT degrees(atan2((y), (x))) AS v FROM t"
    assert t("SELECT array_length(a, 1) AS v FROM t") == \
        "SELECT nullif(size((a)), 0) AS v FROM t"
    # (the pg ::int rounding seam wraps the NULL castee in round() —
    # identity for NULL)
    assert t("SELECT array_lower(a, 1) AS v FROM t") == \
        ("SELECT IF(coalesce(size((a)), 0) > 0, 1, "
         "CAST(round(NULL) AS INT)) AS v FROM t")
    with pytest.raises(TranspileError, match="multidim"):
        t("SELECT array_length(a, 2) FROM t")
    for bad in ("gcd(a, b)", "nextval('s')", "clock_timestamp()",
                "array_to_json(a)"):
        with pytest.raises(TranspileError):
            t(f"SELECT {bad} FROM t")


def test_duck_only_name_tier_round10():
    """Wave 33 (duck-only-name sweep): interval constructors map to
    Spark's typed builders; 1-arg add/subtract are identity/negation;
    the add/subtract function forms re-apply the DATE seams their
    paren-wrapped emissions hid; INTERVAL n UNIT joins the date-
    promotion trigger; strptime with a directive-free format is loud
    (duck defaults to 1900-01-01 where Spark uses 1970)."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    assert t("SELECT to_days(n) AS v FROM t") == \
        "SELECT make_dt_interval((n)) AS v FROM t"
    assert t("SELECT to_months(2) AS v") == \
        "SELECT make_ym_interval(0, (2)) AS v"
    assert t("SELECT to_seconds(n) AS v FROM t") == \
        "SELECT make_dt_interval(0, 0, 0, (n)) AS v FROM t"
    assert t("SELECT subtract(3) AS v") == "SELECT (-(3)) AS v"
    assert t("SELECT add(x) AS v FROM t") == "SELECT ((x)) AS v FROM t"
    assert t("SELECT subtract(DATE '2024-03-09', DATE '2024-01-01') AS v") \
        == "SELECT datediff(DATE '2024-03-09', DATE '2024-01-01') AS v"
    out = t("SELECT add(DATE '2024-03-09', INTERVAL 2 DAY) AS v")
    assert "CAST(DATE '2024-03-09' AS TIMESTAMP)" in out
    # infix number-unit spelling promotes too (string form already did)
    assert "CAST(DATE '2024-03-09' AS TIMESTAMP)" in t(
        "SELECT DATE '2024-03-09' + INTERVAL 2 DAY AS v")
    assert t("SELECT year(INTERVAL 26 MONTH) AS v") == "SELECT 2 AS v"
    assert t("SELECT century(INTERVAL 2 DAY) AS v") == "SELECT 0 AS v"
    with pytest.raises(TranspileError, match="1900"):
        t("SELECT strptime(s, 'abc') FROM t")
    assert t("SELECT transaction_timestamp() AS v") == \
        "SELECT current_timestamp() AS v"


def test_duck_indexed_lambda_rebase_round11():
    """Round-10 verdict's silent-wrong: duck's 2-parameter lambda index
    is 1-BASED (pinned live, duckdb 1.0: list_transform([10,20,30],
    (x,i) -> x+i) = [11,22,33]); Spark's transform/filter index is
    0-based. duckdb_hofs.py rebases the index parameter to the _duck1i
    marker with (_duck1i + 1) substituted in the body. Value parity:
    fuzz corpus + tools/probes/duck_lambda_wave34.txt."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    out = t("SELECT list_transform([10,20,30], (x, i) -> x + i) AS v")
    assert "(x, _duck1i) -> x + (_duck1i + 1)" in out
    assert out == t(out)
    out = t("SELECT list_filter(l, (e, idx) -> idx % 2 = 1) AS v FROM t")
    assert out.startswith("SELECT filter((l), (e, _duck1i) ->")
    assert "(_duck1i + 1) %" in out and out == t(out)
    # bare duck `filter` alias shares the seam
    out = t("SELECT filter([1,2,3,4], (x, i) -> i > 2) AS v")
    assert "(x, _duck1i) -> (_duck1i + 1) > 2" in out and out == t(out)
    # 1-param lambdas pass through the plain renames unchanged
    assert t("SELECT list_transform(l, x -> x * 2) AS v FROM t") == \
        "SELECT transform(l, x -> x * 2) AS v FROM t"
    # index var occurrences: qualified x.i and calls i(...) untouched;
    # the index is NOT substituted into nested-lambda bodies that
    # re-bind it — loud instead of wrong
    out = t("SELECT list_transform(l, (x, i) -> x.i + i) AS v FROM t")
    assert "x.i + (_duck1i + 1)" in out
    with pytest.raises(TranspileError, match="re-binds the index"):
        t("SELECT list_transform(l, (x,i) -> list_transform(x, (a,i) -> a)) FROM t")
    # nested lambda with a DIFFERENT parameter substitutes correctly
    out = t("SELECT list_transform(l, (x,i) -> list_transform(x, y -> y + i)) AS v FROM t")
    assert "transform(x, y -> y + (_duck1i + 1))" in out and out == t(out)


def test_duck_list_reduce_and_aggregate_round11():
    """duck list_reduce seeds the fold with the FIRST element and
    RAISES on an empty list (pinned live) — emitted as reduce(slice(l,
    2, ...), element_at(identity-transform, 1), λ); the identity
    transform() wrap is the duck map-seam handler's skip gate.
    list_aggregate dispatches the closed live-pinned aggregate set
    (NULL elements skipped by sum/avg/count/string_agg; first/last
    POSITIONAL; empty/all-NULL → NULL except count=0)."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    out = t("SELECT list_reduce(l, (a, b) -> a + b) AS v FROM t")
    assert "reduce(slice((l), 2, greatest(size((l)) - 1, 0))" in out
    assert "element_at(transform((l), _rh -> _rh), 1)" in out
    assert out == t(out)
    assert t("SELECT reduce(l, (a,b) -> a || b) AS v FROM t") == \
        t("SELECT list_reduce(l, (a,b) -> a || b) AS v FROM t")
    with pytest.raises(TranspileError, match="3-parameter"):
        t("SELECT list_reduce(l, (a, b, i) -> a + b + i) FROM t")
    out = t("SELECT list_aggregate(l, 'sum') AS v FROM t")
    assert "try_element_at(filter((l), _la -> _la IS NOT NULL), 1)" in out
    assert out == t(out)
    out = t("SELECT list_aggregate(l, 'avg') AS v FROM t")
    assert out.startswith("SELECT try_divide(aggregate((l), cast(0 as double)")
    assert t("SELECT list_aggregate(l, 'count') AS v FROM t") == \
        "SELECT size(filter((l), _la -> _la IS NOT NULL)) AS v FROM t"
    assert t("SELECT list_aggregate(l, 'max') AS v FROM t") == \
        "SELECT array_max((l)) AS v FROM t"
    out = t("SELECT list_aggregate(l, 'string_agg', '-') AS v FROM t")
    assert "array_join((l), '-')" in out and "if(exists((l)" in out
    assert t("SELECT list_aggregate(l, 'first') AS v FROM t") == \
        "SELECT try_element_at((l), 1) AS v FROM t"
    assert t("SELECT list_aggregate(l, 'last') AS v FROM t") == \
        "SELECT try_element_at((l), -1) AS v FROM t"
    assert "filter" in t("SELECT list_aggregate(l, 'any_value') AS v FROM t")
    with pytest.raises(TranspileError, match="supported aggregate names"):
        t("SELECT list_aggregate(l, 'median') FROM t")
    with pytest.raises(TranspileError, match="string literal"):
        t("SELECT list_aggregate(l, f) FROM t")
    # Spark's own 3-arg aggregate() HOF passes through untouched
    inert = "SELECT aggregate(l, 0, (a, x) -> a + x) AS v FROM t"
    assert t(inert) == inert
    # list_sum/list_avg are the same folds
    assert t("SELECT list_sum(l) AS v FROM t") == \
        t("SELECT list_aggregate(l, 'sum') AS v FROM t")
    assert t("SELECT list_avg(l) AS v FROM t") == \
        t("SELECT list_aggregate(l, 'avg') AS v FROM t")


def test_duck_list_sort_enum_args_round11():
    """duck list_sort(l, dir, nulls) enum-string args (defaults ASC +
    NULLS LAST, pinned live) — Spark array_sort/sort_array cover three
    combinations natively; DESC + NULLS FIRST emits a comparator
    lambda (pinned live: [3,1,NULL,2] → [NULL,3,2,1])."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    assert t("SELECT list_sort(l, 'ASC') AS v FROM t") == \
        "SELECT array_sort((l)) AS v FROM t"
    assert t("SELECT list_sort(l, 'ASC', 'NULLS LAST') AS v FROM t") == \
        "SELECT array_sort((l)) AS v FROM t"
    assert t("SELECT list_sort(l, 'ASC', 'NULLS FIRST') AS v FROM t") == \
        "SELECT sort_array((l), true) AS v FROM t"
    assert t("SELECT list_sort(l, 'DESC') AS v FROM t") == \
        "SELECT sort_array((l), false) AS v FROM t"
    out = t("SELECT list_sort(l, 'DESC', 'NULLS FIRST') AS v FROM t")
    assert "_sl IS NULL THEN -1" in out and out == t(out)
    assert t("SELECT list_reverse_sort(l, 'NULLS FIRST') AS v FROM t") == out
    assert t("SELECT list_reverse_sort(l, 'NULLS LAST') AS v FROM t") == \
        "SELECT sort_array((l), false) AS v FROM t"
    # 1-arg forms keep their existing paths
    assert t("SELECT list_sort(l) AS v FROM t") == \
        "SELECT array_sort(l) AS v FROM t"
    assert t("SELECT list_reverse_sort(l) AS v FROM t") == \
        "SELECT sort_array((l), false) AS v FROM t"
    with pytest.raises(TranspileError, match="string literals"):
        t("SELECT list_sort(l, d) FROM t")
    with pytest.raises(TranspileError, match="duckdb enum"):
        t("SELECT list_sort(l, 'bogus') FROM t")


def test_duckdb_split_dispatch_gates_round11():
    """The round-11 module split (duckdb_fns 1,834 lines → fns +
    containers + regex + hofs + tokens) must keep every moved handler
    REACHABLE
    from the duckdb read — the round-8 split regression class was a
    dispatch gate narrower than a moved handler's read tuple (it
    silently killed the duckdb string_agg ORDER BY rewrite). One
    behavioral probe per module proves the standard.py gate dispatches
    into it; the len() probe additionally pins containers-BEFORE-fns
    order (the container len handler preceded the fns length/len
    string handler pre-split)."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    # duckdb_hofs: the indexed-lambda rebase fires
    assert "_duck1i" in t("SELECT list_filter(l, (x, i) -> i > 1) FROM t")
    # duckdb_containers: the map-access seam fires (moved handler)
    assert "map_entries" in t("SELECT element_at(m, 'a') FROM t")
    # duckdb_containers: len() on an array keeps its pre-split
    # dispatch position ahead of the duckdb_fns length/len handler
    assert t("SELECT len([1,2]) AS v") == "SELECT size((array(1,2))) AS v"
    # duckdb_regex: the regexp_matches flag-inline handler fires
    assert "regexp_like" in t("SELECT regexp_matches(s, 'a', 'i') FROM t")
    # duckdb_fns keeps its own tier (try_cast rounding stays home)
    assert "round(try_cast" in t("SELECT try_cast('3.9' AS INT) AS v")
    # duckdb_tokens: the token tier fires post-split — struct literal,
    # MAP literal, underscore digit-groups, USING SAMPLE
    assert "named_struct('k', (1))" in t("SELECT {'k': 1} AS v")
    assert "map_from_arrays" in t("SELECT MAP {'a': 1} AS v")
    assert t("SELECT 1_000_000 AS v") == "SELECT 1000000 AS v"
    assert "TABLESAMPLE" in t("SELECT * FROM t USING SAMPLE 10%")
    # and none of the duck-only modules leak into the postgres read
    for sql_ in (
        "SELECT element_at(m, 'a') FROM t",
        "SELECT list_filter(l, (x, i) -> i > 1) FROM t",
    ):
        try:
            out = transpile(sql_, "postgres")
            assert "map_entries" not in out and "_duck1i" not in out
        except TranspileError:
            pass  # loud is fine — just never the duck rewrite


def test_duck_named_group_regexp_extract_round11():
    """duck regexp_extract(s, pat, [names]) returns a STRUCT keyed by
    the names over the FIRST len(names) capture groups (fewer names
    than groups is legal; more is a duck binder error — both pinned
    live). Emitted as an IF-guarded named_struct of indexed
    regexp_extract calls (NULL source → NULL struct, pinned); RE2's
    (?P<n>...) respells to Java's (?<n>...). Dispatches BEFORE the
    shared pattern-literal block — the overlap corrupted the splice
    (the latent regexp_full_match posix-class bug, pinned below)."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    out = t("SELECT regexp_extract(s, '([a-z]+)-([0-9]+)', ['l','r']) FROM t")
    assert "named_struct('l', regexp_extract((s), '([a-z]+)-([0-9]+)', 1), "
    assert "'r', regexp_extract((s), '([a-z]+)-([0-9]+)', 2)" in out
    assert out.startswith("SELECT IF((s) IS NULL, NULL, named_struct(")
    assert out.endswith(" FROM t")
    assert out == t(out)
    out = t("SELECT regexp_extract(s, '(?P<a>x)(?P<b>y)', ['a','b']) FROM t")
    assert "(?<a>x)(?<b>y)" in out       # Java named-group spelling
    assert "posix" not in out
    with pytest.raises(TranspileError, match="more group names"):
        t("SELECT regexp_extract(s, '(a)(b)', ['x','y','z']) FROM t")
    with pytest.raises(TranspileError, match="literal pattern"):
        t("SELECT regexp_extract(s, p, ['x']) FROM t")
    # the latent splice bug: posix-class pattern + whole-call consumer
    out = t("SELECT regexp_full_match(s, '[[:digit:]]+') AS v FROM t")
    assert out == "SELECT ((s) RLIKE '^(?:[0-9]+)\\\\z') AS v FROM t"
    out = t("SELECT regexp_matches(s, '[[:alpha:]]+', 'i') AS v FROM t")
    assert out == "SELECT regexp_like((s), '(?i)[a-zA-Z]+') AS v FROM t"


def test_pg_fractional_interval_and_tz_extract_round11():
    """pg fractional-unit interval literals spill per DecodeInterval
    ('1.5 days' → 1 day 12:00:00, '0.5 years' → 6 mons — pinned live);
    hh:mm[:ss] clock segments and the 'ago' negation are pg-parseable
    shapes Spark's literal parser rejects — all now decompose through
    the round-10 ISO/mixed machinery. extract/date_part of the
    timezone family is session-state with no Spark field → loud."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    assert t("SELECT interval '1.5 days' AS v") == \
        "SELECT INTERVAL '1 days 43200 seconds' AS v"
    assert t("SELECT interval '0.5 years' AS v") == \
        "SELECT INTERVAL '6 months' AS v"
    assert t("SELECT interval '1 day 12:00:00' AS v") == \
        "SELECT INTERVAL '1 days 43200 seconds' AS v"
    assert t("SELECT interval '1 day ago' AS v") == \
        "SELECT INTERVAL '-1 days 0 seconds' AS v"
    out = t("SELECT interval '1.5 days' AS v")
    assert t(out) == out  # re-decomposes to the identical text
    # integer literals keep the pass-through path
    assert t("SELECT interval '2 days' AS v") == \
        "SELECT interval '2 days' AS v"
    for fld in ("timezone", "timezone_hour", "timezone_minute"):
        with pytest.raises(TranspileError, match="session TimeZone"):
            t(f"SELECT extract({fld} from ts) FROM t")
        with pytest.raises(TranspileError, match="session TimeZone"):
            t(f"SELECT date_part('{fld}', ts) FROM t")


def test_pg_substring_similar_round11():
    """pg substring(s SIMILAR p ESCAPE e) — SQL:2003 regex form: the
    two e" markers delimit the capture; none captures the whole match.
    NULL on no match but '' on an EMPTY capture (both pinned live) —
    hence the RLIKE-guarded CASE, not nullif. The escape char
    substitutes for backslash in ARE regex escapes ('#d' IS the digit
    class — pinned live; ARE-only letters like #m are loud). Round 12:
    the PREFIX segment's wildcards emit NON-greedy (pg returns the
    EARLIEST capture — r11 verdict #1, pinned live in pg_wave64);
    capture and suffix stay greedy."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    out = t("SELECT substring(s similar '%#\"cd#\"%' escape '#') FROM t")
    assert out == (
        "SELECT CASE WHEN (s) RLIKE '(?s)^(?:.*?)(cd)(?:.*)\\\\z' THEN "
        "regexp_extract((s), '(?s)^(?:.*?)(cd)(?:.*)\\\\z', 1) "
        "ELSE NULL END FROM t"
    )
    out = t("SELECT substring(s similar '%cd%' escape '#') FROM t")
    assert "((?s)^(.*cd.*)" not in out  # whole-match capture group
    assert "'(?s)^(.*cd.*)\\\\z'" in out
    out = t("SELECT substring(s similar '%#\"#d#\"%' escape '#') FROM t")
    assert "(\\\\d)" in out
    with pytest.raises(TranspileError, match="ARE-specific"):
        t("SELECT substring(s similar '%#\"#m#\"%' escape '#') FROM t")
    with pytest.raises(TranspileError, match="exactly two"):
        t("SELECT substring(s similar '%#\"cd%' escape '#') FROM t")
    with pytest.raises(TranspileError, match="literal pattern"):
        t("SELECT substring(s similar p escape '#') FROM t")
    with pytest.raises(TranspileError, match="one character"):
        t("SELECT substring(s similar '%x%' escape 'ab') FROM t")
    # plain SIMILAR TO: \d is the ARE digit class (pinned live —
    # '7' matches, 'd' does not), same meaning in Java
    out = t("SELECT '7' SIMILAR TO '\\d' AS v")
    assert "\\\\d" in out and "RLIKE" in out
    with pytest.raises(TranspileError, match="ARE-specific"):
        t("SELECT 'ab' SIMILAR TO 'a\\b' AS v")


def test_pg_numeric_tochar_round11():
    """Numeric to_char digit-class tier ([FM][S][9|0|,][.]): pg's
    sign-slot blank padding, zero-run 0-padding, half-up rounding at
    the fraction width, '#' overflow rendering, S explicit sign, and
    the FM strip rules — all live-pinned (49-row wave37 all-MATCH).
    RN/EEEE/V/PR/TH/L/G/D stay on the loud path."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    out = t("SELECT to_char(x, '9,999.99') FROM t")
    assert "format_number(try_cast((x) AS DECIMAL(38,2)), '#,###.00')" in out
    assert "lpad(" in out and ", 9, ' ')" in out
    assert ">= 10000" in out and "'#,###.##'" in out  # overflow arm
    assert out == t(out)
    out = t("SELECT to_char(x, 'FM990.00') FROM t")
    assert "'##0.00'" in out and "lpad" not in out
    out = t("SELECT to_char(x, 'S99.9') FROM t")
    assert "'+' ||" in out
    out = t("SELECT to_char(x, '0009') FROM t")
    assert "'0000'" in out
    out = t("SELECT to_char(x, 'FM9.99') FROM t")
    assert "THEN '0.'" in out and "'#.##'" in out  # pinned FM-zero '0.'
    out = t("SELECT to_char(x, '9999') FROM t")
    assert "'###0'" in out  # int-only patterns render 0 as '0'
    out = t("SELECT to_char(x, '999MI') FROM t")
    assert "format_number(abs(" in out and "IF(" in out and "'-', ' '" in out
    with pytest.raises(TranspileError, match="cannot combine"):
        t("SELECT to_char(x, 'S999MI') FROM t")
    for bad in ("RN", "9.99EEEE", "99V99", "999PR", "99th", "L9,999",
                "999PL", "SG999"):
        with pytest.raises(TranspileError):
            t(f"SELECT to_char(x, '{bad}') FROM t")
    with pytest.raises(TranspileError, match="thousands-grouping"):
        t("SELECT to_char(x, '99,9') FROM t")
    # date formats keep the segment path untouched
    assert t("SELECT to_char(d, 'YYYY-MM') FROM t") == \
        "SELECT date_format(d, 'yyyy-MM') FROM t"


def test_pg_unistr_round11():
    """pg 16 unistr(): \\XXXX / \\+XXXXXX / \\\\ escapes decode
    STATICALLY into a plain Spark literal (pinned live: 'd\\0061t' =
    'dat', '\\+01F600' = the emoji pair); Spark has no unistr, so
    non-literal arguments and malformed escapes are loud."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    out = t("SELECT unistr('d\\0061t\\+000061') AS v")
    assert out == "SELECT 'data' AS v"
    assert t("SELECT unistr('a\\\\b') AS v") == "SELECT 'a\\\\b' AS v"
    with pytest.raises(TranspileError, match="literal argument"):
        t("SELECT unistr(x) FROM t")
    with pytest.raises(TranspileError, match="malformed"):
        t("SELECT unistr('bad\\zz') AS v")


def test_pg_clause_sweep_round11():
    """Round-11 pg clause sweep: array-literal TEXT in quantified
    comparisons decodes statically ('{1,2}' previously reached
    array_contains as a STRING); ORDER BY ... USING louds (the NULLS
    annotation appended onto it, emitting broken SQL); the rest of
    the jsonb_path family plus txid/xml constructors loud instead of
    passing through to unresolved-routine errors. mode() WITHIN GROUP
    passes through — Spark 4's tie rule matches pg's (ASC → lowest,
    pinned live both engines; wave40)."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    assert t("SELECT 1 = ANY('{1,2}') AS v") == \
        "SELECT array_contains((array(1, 2)), (1)) AS v"
    assert t("SELECT x = ANY('{a,b}') FROM t") == \
        "SELECT array_contains((array('a', 'b')), (x)) FROM t"
    assert "array('x y', 'z')" in t("SELECT 'x y' = ANY('{\"x y\",z}') AS v")
    assert "array(1, NULL, 3)" in t("SELECT 3 = ANY('{1,NULL,3}') AS v")
    with pytest.raises(TranspileError, match="nested pg array"):
        t("SELECT 1 = ANY('{{1},{2}}') AS v")
    with pytest.raises(TranspileError, match="not a .* array literal"):
        t("SELECT 1 = ANY('junk') AS v")
    with pytest.raises(TranspileError, match="USING"):
        t("SELECT x FROM t ORDER BY x USING <")
    for fn in ("jsonb_path_query_first(j, '$.a')", "txid_current()",
               "xmlcomment('x')", "xpath('/a', x)"):
        with pytest.raises(TranspileError):
            t(f"SELECT {fn} FROM t")
    inert = "SELECT mode() within group (order by x) FROM t"
    assert t(inert) == inert


def test_duck_from_first_round11():
    """duck FROM-first statements (pinned live: FROM t ≡ SELECT * FROM
    t; FROM t SELECT list [clauses] with clauses only AFTER the list —
    WHERE before SELECT is a duck parse error). Spark rejects the form;
    the whole statement re-emits with transpiled fragments (UNION
    branches stay in the tail; nested FROM-first subqueries recurse)."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    assert t("from t") == "select * from t"
    assert t("from t where a > 1") == "select * from t where a > 1"
    assert t("from t select a") == "select a from t"
    assert t("from t select a where a > 1") == \
        "select a from t where a > 1"
    assert t("from t select sum(a) group by b") == \
        "select sum(a) from t group by b"
    assert t("select * from (from t select a) s") == \
        "select * from (select a from t) s"
    assert t("from (from t select a) q select min(a)") == \
        "select min(a) from (select a from t) q"
    assert t("from t select a union select b from u") == \
        "select a from t union select b from u"
    # duck rewrites inside the moved fragments still apply
    out = t("from t select list_transform([1,2], (x,i) -> x+i)")
    assert out.startswith("select transform((array(1,2))")
    assert out.endswith("from t")
    for s in ("from t select a", "from t"):
        assert t(t(s)) == t(s)


def test_duck_interval_literdi_widening_round11():
    """duck INTERVAL literals/::interval casts ride the pg decompose
    machinery since round 11 (same fraction spilling, pinned live:
    '1.5 months' = 45 days = pg's 1 mon 15 days); ISO P-forms stay
    duck-rejected passthroughs; mixed families emit make_interval
    (calendar months — matches duck date arithmetic); the pg-only
    cast seams (bytea/text rendering, boolean words, '{...}' arrays)
    do NOT fire on the duck read (the from_hex::varchar regression
    the widening briefly introduced, caught by the fuzz corpus)."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    assert "make_interval(0, 12, 0, 3, 0, 0, 0)" in \
        t("SELECT ts + interval '1 year 3 days' FROM t")
    assert "INTERVAL '1 days 43200 seconds'" in \
        t("SELECT ts + interval '1.5 days' FROM t")
    assert "INTERVAL '2' DAY" in t("SELECT ts + '2 days'::interval FROM t")
    assert "make_interval(0, 1, 0, 15, 0, 0, 0)" in \
        t("SELECT ts + '1.5 months'::interval FROM t")
    assert t("SELECT interval 'P1Y' FROM t") == \
        "SELECT interval 'P1Y' FROM t"  # duck rejects ISO — pass through
    assert t("SELECT from_hex('6162')::varchar AS v") == \
        "SELECT unhex('6162')::STRING AS v"
    assert t("SELECT 'on'::boolean AS v") == "SELECT 'on'::boolean AS v"


def test_duck_underscore_literals_and_try_strptime_round11():
    """duck digit-group underscores (1_000_000 — the lexer splits them
    number + _-ident and Spark reads the ident as an unresolved
    column) merge and strip; try_strptime → try_to_timestamp (NULL on
    parse failure in both, pinned live)."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    assert t("SELECT 1_000_000 AS v") == "SELECT 1000000 AS v"
    assert t("SELECT 2_5.5_0 AS v") == "SELECT 25.50 AS v"
    assert t("SELECT _private FROM t") == "SELECT _private FROM t"
    assert t("SELECT try_strptime(s, '%Y-%m-%d') FROM t") == \
        "SELECT try_to_timestamp(s, 'yyyy-MM-dd') FROM t"
    with pytest.raises(TranspileError, match="directives"):
        t("SELECT try_strptime(s, 'abc') FROM t")


def test_duck_using_sample_round11():
    """duck sampling clauses → Spark TABLESAMPLE (pinned live: duck's
    % forms are approximate row/vector sampling; Spark's PERCENT is
    row-level Bernoulli — the faithful map for bernoulli and the
    honest approximation for system). EXACT-n forms (reservoir / n
    [ROWS]) pick RANDOM rows where Spark's (n ROWS) takes the FIRST
    n — loud with the ORDER BY rand() LIMIT rewrite. Seeded forms
    carry into REPEATABLE. Nondeterministic by contract, so pinned
    here (emission text) rather than in the value-differential fuzz."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    assert t("SELECT count(*) FROM t USING SAMPLE 10%") == \
        "SELECT count(*) FROM t TABLESAMPLE (10 PERCENT)"
    assert t("SELECT count(*) FROM t USING SAMPLE bernoulli(10%)") == \
        "SELECT count(*) FROM t TABLESAMPLE (10 PERCENT)"
    assert t("SELECT count(*) FROM t USING SAMPLE 10% (bernoulli, 42)") == \
        "SELECT count(*) FROM t TABLESAMPLE (10 PERCENT) REPEATABLE (42)"
    assert t("SELECT count(*) FROM t TABLESAMPLE system(5 PERCENT)") == \
        "SELECT count(*) FROM t TABLESAMPLE (5 PERCENT)"
    for bad in ("USING SAMPLE reservoir(50)", "USING SAMPLE 50",
                "USING SAMPLE 50 ROWS"):
        with pytest.raises(TranspileError, match="RANDOM rows"):
            t(f"SELECT count(*) FROM t {bad}")
    # JOIN ... USING is untouched
    inert = "SELECT a FROM t JOIN u USING (k)"
    assert t(inert) == inert


def test_duck_in_paren_ignore_nulls_round11():
    """duck window NULL treatment sits INSIDE the call parens
    (last_value(x IGNORE NULLS) OVER ...); Spark's grammar parses it
    only between the call and OVER — the in-paren form was a
    PARSE_SYNTAX_ERROR (pinned live, wave 52 6/6 MATCH via --table)."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    out = t("SELECT last_value(x IGNORE NULLS) OVER (ORDER BY i) FROM t")
    assert ") IGNORE NULLS OVER (" in out and "(x IGNORE" not in out
    assert out == t(out)
    out = t("SELECT lag(x, 1 IGNORE NULLS) OVER (ORDER BY i) FROM t")
    assert ") IGNORE NULLS OVER (" in out
    out = t("SELECT first_value(x RESPECT NULLS) OVER (ORDER BY i) FROM t")
    assert ") RESPECT NULLS OVER (" in out
    # the pg read never reaches the duck token tier
    out = transpile("SELECT ignore FROM t", "postgres")
    assert out == "SELECT ignore FROM t"


def test_pg_json_split_dispatch_gate_round11():
    """The round-11 postgres_calls split (1,293 lines → calls + json)
    must keep the moved json tier REACHABLE on the pg read AND keep
    its no-first-pass-gate property (the to_json own-emission consumer
    fires on later fixpoint passes) — the round-8 split regression
    class."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    out = t("SELECT json_build_object('a', 1) AS v")
    assert "to_json(array(" in out
    # idempotency IS the fixpoint-consumer probe: a re-transpile of
    # the emission must not loud on its own to_json(…, map(...)) tag
    assert out == t(out)
    out = t("SELECT json_object_agg(k, v) AS v FROM t")
    assert "'{ '" in out and "raise_error" in out
    # postgres_calls keeps its own tier (format stays home)
    assert "format_string" in t("SELECT format('%s', 1) AS v")


def test_bq_snowflake_in_paren_ignore_nulls_round11():
    """BQ and snowflake also spell window NULL treatment inside the
    call parens. BQ aggregates DROP the keywords (collect_list already
    ignores NULLs; RESPECT NULLS is loud — plain BQ ARRAY_AGG errors
    on NULL input where collect_list silently drops); window functions
    move them between the call and OVER on both reads."""
    out = transpile("SELECT ARRAY_AGG(x IGNORE NULLS) FROM t", "bigquery")
    assert "collect_list(x )" in out and "IGNORE" not in out
    with pytest.raises(TranspileError, match="RESPECT NULLS"):
        transpile("SELECT ARRAY_AGG(x RESPECT NULLS) FROM t", "bigquery")
    out = transpile(
        "SELECT LAST_VALUE(x IGNORE NULLS) OVER (ORDER BY i) FROM t",
        "bigquery")
    assert ") IGNORE NULLS OVER (" in out
    out = transpile(
        "SELECT LAST_VALUE(x IGNORE NULLS) OVER (ORDER BY i) FROM t",
        "snowflake")
    assert ") IGNORE NULLS OVER (" in out
    assert out == transpile(out, "snowflake")


def test_tsql_plus_string_concat_round11():
    """T-SQL + CONCATENATES strings; Spark + coerces to numbers (NULL
    off-ANSI — silent). Visible non-numeric string-literal operands
    rewrite to ||; numeric-looking string literals are loud (T-SQL
    coerces them by the OTHER operand's type); untyped columns pass
    through (the int-division residual class)."""
    t = lambda s: transpile(s, "tsql")  # noqa: E731
    assert t("SELECT 'a' + 'b' AS v") == "SELECT 'a' || 'b' AS v"
    assert t("SELECT s + ' suffix' FROM t") == \
        "SELECT s || ' suffix' FROM t"
    with pytest.raises(TranspileError, match="numeric-looking"):
        t("SELECT '1' + '2' AS v")
    assert t("SELECT 1 + 2 AS v") == "SELECT 1 + 2 AS v"
    assert t("SELECT a + b FROM t") == "SELECT a + b FROM t"


def test_clickhouse_uniqexact_maps_round11():
    """uniqExact is the EXACT distinct count — count(DISTINCT ...)
    since round 11 (was loud); the parameterized-combinator guard
    still louds uniqExact(p)(x) shapes."""
    q = transpile("SELECT uniqExact(x) FROM t", "clickhouse")
    assert q == "SELECT count(DISTINCT (x)) FROM t"
    assert q == transpile(q, "clickhouse")


def test_duck_stat_aggregate_tier_round11():
    """Round-11 statistical-aggregate tier (duckdb_fns): kurtosis_pop
    IS Spark's population kurtosis (try_divide identity marker keeps
    the duck sample-kurtosis correction off re-reads); sem =
    stddev_pop/sqrt(n) (pinned 1.7678 on [1,2,3,10]); product skips
    NULLs, keeps sign through zeros, NULL on empty; Kahan family =
    sum/avg over DOUBLE; top-N min/max/arg_min forms stay loud."""
    t = lambda s: transpile(s, "duckdb")  # noqa: E731
    out = t("SELECT kurtosis_pop(x) FROM t")
    assert out == "SELECT try_divide(kurtosis((x)), 1.0) FROM t"
    assert t(out) == out  # the marker keeps the correction handler off
    out = t("SELECT sem(x) FROM t")
    assert out == \
        "SELECT try_divide(stddev_pop((x)), sqrt(count((x)))) FROM t"
    out = t("SELECT product(x) FROM t")
    assert "count_if((x) = 0) > 0" in out
    assert "exp(sum(ln(abs(CAST((x) AS DOUBLE)))))" in out
    assert "pmod(count_if((x) < 0), 2)" in out
    assert t(out) == out
    assert t("SELECT fsum(x) FROM t") == \
        "SELECT sum(CAST((x) AS DOUBLE)) FROM t"
    assert t("SELECT kahan_sum(x) FROM t") == \
        "SELECT sum(CAST((x) AS DOUBLE)) FROM t"
    assert t("SELECT sumkahan(x) FROM t") == \
        "SELECT sum(CAST((x) AS DOUBLE)) FROM t"
    assert t("SELECT favg(x) FROM t") == \
        "SELECT avg(CAST((x) AS DOUBLE)) FROM t"
    for q in ("SELECT min(x, 3) FROM t", "SELECT max(x, 2) FROM t",
              "SELECT arg_min(y, x, 2) FROM t",
              "SELECT arg_max(y, x, 2) FROM t"):
        with pytest.raises(TranspileError, match="top-N"):
            t(q)
    # 1-arg min and the 2-arg arg_min NULL-skip rewrite are untouched
    assert t("SELECT min(x) FROM t") == "SELECT min(x) FROM t"
    assert "min_by" in t("SELECT arg_min(y, x) FROM t")


def test_pg_variadic_and_rows_from_round11():
    """pg VARIADIC ARRAY[...] unfolds raw (pre-pass, before call
    handlers paren-wrap argument spans — the wave-57 format()/concat()
    class); ROWS FROM (unnest...) zips via inline(arrays_zip);
    dynamic/SELECT/cast-suffix VARIADIC and non-unnest ROWS FROM
    members are loud."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    assert t("SELECT concat_ws(',', VARIADIC ARRAY['a','b','c'])") == \
        "SELECT concat_ws(',', 'a','b','c')"
    out = t("SELECT format('%s-%s', VARIADIC ARRAY['x','y'])")
    assert "format_string" in out and "VARIADIC" not in out.upper()
    out = t("SELECT * FROM ROWS FROM (unnest(ARRAY[1,2]),"
            " unnest(ARRAY['a','b'])) AS t(n, s)")
    assert "inline(arrays_zip((array(1,2)), (array('a','b'))))" in out
    out = t("SELECT * FROM ROWS FROM (unnest(ARRAY[10,20])) AS t(v)")
    assert "explode((array(10,20)))" in out
    with pytest.raises(TranspileError, match="1-argument unnest"):
        t("SELECT * FROM ROWS FROM (generate_series(1,2),"
          " unnest(ARRAY['a'])) AS t(g, s)")
    with pytest.raises(TranspileError, match="dynamic array"):
        t("SELECT f(VARIADIC arr) FROM t")
    with pytest.raises(TranspileError, match="SELECT"):
        t("SELECT f(VARIADIC ARRAY(SELECT x FROM t))")
    with pytest.raises(TranspileError, match="cast"):
        t("SELECT concat_ws(',', VARIADIC ARRAY[]::text[])")
    # window-frame ROWS keeps its meaning
    out = t("SELECT sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING"
            " AND CURRENT ROW) FROM t")
    assert "ROWS BETWEEN 1 PRECEDING" in out


def test_static_matrix_second_sweep_round11():
    """Second static dialect-matrix sweep (round 11, reviewed against
    published semantics + Spark-side value checks): snowflake
    date_part alias/field tier (dow/week tiers LOUD — the passthrough
    was SILENTLY off-by-one vs Spark's same-named 1-based field),
    INSERT() → overlay, div0null, the booland truthiness family,
    bitshift renames, randstr loud (Spark 4 shares the name with a
    different generator); snowflake/redshift dateadd/datediff unit
    abbreviations (note redshift 'm' = MINUTE where snowflake 'mm' =
    MONTH); trino truncate/from_base/to_base/row; clickhouse
    extractAll group selection, arraySum/arrayCount lambda-first
    forms, toStartOfWeek modes, concatAssumeInjective; tsql STUFF →
    NULL-edge-guarded overlay."""
    t = lambda r, s: transpile(s, r)  # noqa: E731
    # snowflake date_part: ISO/epoch/alias tiers map, dow/week loud
    assert t("snowflake", "SELECT date_part(dayofweekiso, d) FROM t") \
        == "SELECT (weekday((d)) + 1) FROM t"
    assert t("snowflake", "SELECT date_part(yyyy, d) FROM t") == \
        "SELECT date_part('YEAR', (d)) FROM t"
    assert "div 1000000" in t(
        "snowflake", "SELECT date_part(epoch_second, ts) FROM t")
    for fld in ("dayofweek", "'dow'", "week", "woy", "yearofweek"):
        with pytest.raises(TranspileError, match="WEEK_START"):
            t("snowflake", f"SELECT date_part({fld}, d) FROM t")
    assert "timestampadd(WEEK" in t(
        "snowflake", "SELECT dateadd(wk, 1, d) FROM t")
    # redshift 'm' is MINUTE (snowflake/tsql 'm'/'mm' is MONTH)
    assert "MINUTE" in t("redshift", "SELECT dateadd(m, 30, ts) FROM t")
    assert "MONTH" in t("tsql", "SELECT dateadd(m, 3, ts) FROM t")
    assert t("snowflake", "SELECT insert(s, 2, 3, r) FROM t") == \
        "SELECT overlay((s), (r), (2), (3)) FROM t"
    assert t("snowflake", "SELECT booland(a, b) FROM t") == \
        "SELECT (((a) <> 0) AND ((b) <> 0)) FROM t"
    assert "OR (b) IS NULL" in t(
        "snowflake", "SELECT div0null(a, b) FROM t")
    assert "shiftleft" in t("snowflake", "SELECT bitshiftleft(1, 3)")
    assert "bool_or" in t("snowflake", "SELECT boolor_agg(x) FROM t")
    with pytest.raises(TranspileError):
        t("snowflake", "SELECT randstr(5, 42)")
    # trino
    assert t("trino", "SELECT truncate(x) FROM t") == (
        "SELECT CAST(CASE WHEN (x) < 0 THEN ceil((x)) ELSE "
        "floor((x)) END AS DOUBLE) FROM t")
    assert t("trino", "SELECT from_base(s, 16) FROM t") == \
        "SELECT CAST(conv((s), (16), 10) AS BIGINT) FROM t"
    assert t("trino", "SELECT to_base(x, 16) FROM t") == \
        "SELECT lower(conv((x), 10, (16))) FROM t"
    assert t("trino", "SELECT row(1, 'a')") == "SELECT struct(1, 'a')"
    # clickhouse
    assert t("clickhouse", r"SELECT extractAll(s, '=(\d+)') FROM t") \
        == "SELECT regexp_extract_all(s, '=(\\\\d+)', 1) FROM t"
    assert t("clickhouse", r"SELECT extractAll(s, '\d+') FROM t") == \
        "SELECT regexp_extract_all(s, '\\\\d+', 0) FROM t"
    assert "aggregate(" in t("clickhouse", "SELECT arraySum(a) FROM t")
    assert "transform(" in t(
        "clickhouse", "SELECT arraySum(x -> x * 2, a) FROM t")
    assert t("clickhouse", "SELECT arrayCount(x -> x > 1, a) FROM t") \
        == "SELECT size(filter((a), x -> x > 1)) FROM t"
    assert "date_sub" in t("clickhouse", "SELECT toStartOfWeek(d) FROM t")
    assert "date_trunc('week'" in t(
        "clickhouse", "SELECT toStartOfWeek(d, 1) FROM t")
    with pytest.raises(TranspileError):
        t("clickhouse", "SELECT toStartOfWeek(d, 9) FROM t")
    assert t("clickhouse", "SELECT concatAssumeInjective(a, b) FROM t") \
        == "SELECT concat(a, b) FROM t"
    with pytest.raises(TranspileError, match="lambda"):
        t("clickhouse", "SELECT arrayCount(a) FROM t")
    # tsql STUFF: NULL edges guarded
    out = t("tsql", "SELECT stuff(s, 2, 3, r) FROM t")
    assert "overlay((s), (r), (2), (3))" in out and "NULL" in out


def test_pg_like_quantified_and_duck_misc_round11():
    """LIKE/ILIKE ANY|ALL over array-literal pattern lists → Spark's
    bare pattern list (the array(...) emission was a
    DATATYPE_MISMATCH; dynamic arrays loud); IS NORMALIZED loud; duck
    list_count (non-NULL element count), to_timestamp →
    timestamp_seconds (fraction-preserving), ord ≡ unicode.  All
    pinned live (waves 59-60)."""
    t = lambda r, s: transpile(s, r)  # noqa: E731
    out = t("postgres", "SELECT 'abc' LIKE ALL (ARRAY['a%', '%c'])")
    assert out == "SELECT 'abc' LIKE ALL ('a%', '%c')"
    assert t("postgres", out) == out  # bare-list emission stays inert
    assert "ANY ('z%', '%c')" in t(
        "postgres", "SELECT x LIKE ANY (ARRAY['z%', '%c']) FROM t")
    with pytest.raises(TranspileError, match="pattern literals"):
        t("postgres", "SELECT x LIKE ALL (pats) FROM t")
    with pytest.raises(TranspileError, match="NORMALIZED"):
        t("postgres", "SELECT 'e' IS NFC NORMALIZED")
    with pytest.raises(TranspileError, match="NORMALIZED"):
        t("postgres", "SELECT 'e' IS NOT NORMALIZED")
    assert t("duckdb", "SELECT list_count(l) FROM t") == \
        "SELECT size(filter((l), _lc -> _lc IS NOT NULL)) FROM t"
    assert t("duckdb", "SELECT to_timestamp(x) FROM t") == \
        "SELECT timestamp_seconds((x)) FROM t"
    assert t("duckdb", "SELECT ord(s) FROM t") == \
        "SELECT IF((s) = '', -1, ascii((s))) FROM t"
    for loud in ("SELECT current_setting('threads')",
                 "SELECT enum_range(NULL::e)"):
        with pytest.raises(TranspileError):
            t("duckdb", loud)
    with pytest.raises(TranspileError):
        t("postgres", "SELECT pg_sleep(1)")


def test_oracle_null_concat_and_mysql_tier_round11():
    """Oracle || / CONCAT treat NULL as the empty string (VARCHAR2
    ''≡NULL) — each operand coalesces through a STRING cast and the
    chain nullif('')s back; Spark's NULL-propagating || was a
    silent-wrong.  Oracle REGEXP_SUBSTR pos/occ forms offset through
    substring + regexp_extract_all.  MySQL INSERT keeps MySQL's edges
    (original string on out-of-range pos, rest-of-string on negative
    len, CHARACTER positions — char_length, not the byte-counting
    length rename), FIELD → array_position, multi-arg CHAR skips
    NULLs, OCT → conv, TRUNCATE(x, d) toward-zero, QUOTE(NULL) is the
    text 'NULL' (identity-IF marker), JSON_UNQUOTE(JSON_EXTRACT) →
    get_json_object, CONVERT(... USING utf8*) is identity.  All 27
    Spark-side value checks pass (see the round-11 pin script)."""
    t = lambda r, s: transpile(s, r)  # noqa: E731
    out = t("oracle", "SELECT 'a' || b || 'c' FROM t")
    assert out.count("coalesce(CAST((") == 3 and out.startswith(
        "SELECT nullif(")
    assert t("oracle", out) == out  # enclosing-nullif gate holds
    out = t("oracle", "SELECT concat(a, b) FROM t")
    assert "nullif(concat(coalesce" in out
    assert t("oracle", out) == out
    out = t("oracle", "SELECT regexp_substr(s, '[0-9]', 2, 3) FROM t")
    assert ("try_element_at(regexp_extract_all(substring((s), (2)), "
            "('[0-9]'), 0), (3))") in out
    assert t("oracle", "SELECT regexp_substr(s, p) FROM t") == \
        "SELECT regexp_substr(s, p) FROM t"  # 2-arg is native parity
    assert "octet_length" in t("oracle", "SELECT lengthb(s) FROM t")
    with pytest.raises(TranspileError):
        t("oracle", "SELECT standard_hash(x, 'MD5') FROM t")
    # mysql
    out = t("mysql", "SELECT insert(s, 2, 3, r) FROM t")
    assert "char_length" in out and "overlay" in out
    assert t("mysql", "SELECT field(x, a, b) FROM t") == \
        "SELECT coalesce(array_position(array((a), (b)), (x)), 0) FROM t"
    out = t("mysql", "SELECT char(65, 66) FROM t")
    assert out == ("SELECT concat(coalesce(char((65)), ''), "
                   "coalesce(char((66)), '')) FROM t")
    assert t("mysql", "SELECT oct(n) FROM t") == \
        "SELECT conv((n), 10, 8) FROM t"
    assert "ceil" in t("mysql", "SELECT truncate(x, 2) FROM t")
    out = t("mysql", "SELECT quote(s) FROM t")
    assert out == ("SELECT IF((s) IS NULL, 'NULL', "
                   "quote(IF((s) IS NULL, NULL, (s)))) FROM t")
    assert t("mysql", out) == out  # identity-IF marker holds
    assert t("mysql",
             "SELECT json_unquote(json_extract(j, '$.a')) FROM t") == \
        "SELECT get_json_object((j), '$.a') FROM t"
    assert t("mysql", "SELECT convert(s using utf8mb4) FROM t") == \
        "SELECT (s) FROM t"
    for loud in ("SELECT json_unquote(x) FROM t",
                 "SELECT convert(s using latin1) FROM t",
                 "SELECT last_insert_id()"):
        with pytest.raises(TranspileError):
            t("mysql", loud)


def test_pg_quant_split_dispatch_gate_round11():
    """The round-11 postgres_quant.py split (module-size convention):
    every moved branch must still fire through the FULL transpile()
    dispatch — the round-8 split-regression class where a moved
    handler's gate no longer matched the dispatch path."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    # = ANY(array) membership (the original quantified branch)
    assert "array_contains" in t("SELECT 1 = ANY(ARRAY[1,2])")
    # <> ALL over an array → NOT IN-style forall
    assert "forall" in t("SELECT 2 <> ALL(ARRAY[1,3]) ")
    # = ANY(SELECT ...) → IN
    assert " IN(SELECT" in t("SELECT x = ANY(SELECT k FROM t2) FROM t")
    # LIKE-quantified + NORMALIZED (round-11 additions, moved with it)
    assert "LIKE ANY ('a%')" in t("SELECT x LIKE ANY (ARRAY['a%']) FROM t")
    with pytest.raises(TranspileError, match="NORMALIZED"):
        t("SELECT s IS NFC NORMALIZED FROM t")
    # array-literal TEXT decoding inside the quantified branch
    assert "array_contains" in t("SELECT 1 = ANY('{1,2}') ")


def test_bigquery_third_sweep_round11():
    """Third BQ static sweep (round 11, 18/18 Spark value checks):
    is_nan/unicode renames; ieee_divide's IEEE edges (±Infinity via
    a*Infinity sign carry, NaN for 0/0) where ANSI `/` raises; numeric
    TRUNC (Spark's trunc is the date form); approx_quantiles(x, n) →
    approx_percentile over the unfolded fraction array;
    to_json_string → to_json; EXTRACT(ISOWEEK) → week / ISOYEAR →
    yearofweek / WEEK loud (BQ weeks are Sunday-anchored 0-53);
    string_agg/array_agg in-paren ORDER BY → listagg WITHIN GROUP /
    comparator array_sort (BQ defaults NULLS FIRST ascending);
    TO_HEX(MD5|SHA1(x)) → md5/sha1 with the identity-IF marker (the
    blanket hex rename produced hex-of-the-hex-string — silent wrong;
    bare md5/sha1 are BYTES in BQ → loud); [SAFE_OFFSET(n)] now fires
    after call-shaped primaries (a no-op split-delimiter edit
    permanently deferred it)."""
    t = lambda s: transpile(s, "bigquery")  # noqa: E731
    assert t("SELECT is_nan(x) FROM t") == "SELECT isnan(x) FROM t"
    assert t("SELECT unicode(s) FROM t") == "SELECT ascii(s) FROM t"
    assert "* CAST('Infinity' AS DOUBLE)" in t(
        "SELECT ieee_divide(a, b) FROM t")
    assert "floor((x))" in t("SELECT trunc(x) FROM t")
    assert "power(10, (2))" in t("SELECT trunc(x, 2) FROM t")
    assert t("SELECT approx_quantiles(x, 2) FROM t") == \
        "SELECT approx_percentile((x), array(0, 0.5, 1)) FROM t"
    assert t("SELECT to_json_string(s) FROM t") == \
        "SELECT to_json(s) FROM t"
    assert t("SELECT extract(isoweek FROM d) FROM t") == \
        "SELECT extract(week FROM d) FROM t"
    assert t("SELECT extract(isoyear FROM d) FROM t") == \
        "SELECT extract(yearofweek FROM d) FROM t"
    with pytest.raises(TranspileError, match="Sunday-anchored"):
        t("SELECT extract(week FROM d) FROM t")
    out = t("SELECT string_agg(s, ';' ORDER BY s DESC) FROM t")
    assert "listagg((s), ';') WITHIN GROUP (ORDER BY s DESC)" in out
    out = t("SELECT array_agg(x ORDER BY k) FROM t")
    assert "array_sort(collect_list(struct((k) AS _k, (x) AS _v))" in out
    assert t(out) == out
    out = t("SELECT to_hex(md5(s)) FROM t")
    assert out == "SELECT md5(IF((s) IS NULL, NULL, (s))) FROM t"
    assert t(out) == out  # identity-IF marker holds
    assert "sha2((s), 256)" in t("SELECT to_hex(sha256(s)) FROM t")
    with pytest.raises(TranspileError, match="BYTES"):
        t("SELECT md5(s) FROM t")
    assert t("SELECT split(s, ',')[safe_offset(2)] FROM t") == \
        "SELECT try_element_at(split(s, ','), (2) + 1) FROM t"
    with pytest.raises(TranspileError):
        t("SELECT array_agg(x LIMIT 5) FROM t")
    with pytest.raises(TranspileError):
        t("SELECT session_user()")


def test_redshift_tsql_fourth_sweep_round11():
    """Fourth static sweep — redshift/tsql (Spark value-checked):
    redshift DATE_PART/DATEPART/EXTRACT bare-keyword fields through
    the pg template tier (redshift is pg-derived: dow is FIXED
    0=Sunday — the bare passthrough was silently 1-based under
    Spark's field — week is ISO, epoch seconds; yr/mon/w aliases),
    CONVERT_TIMEZONE → from_utc_timestamp/to_utc_timestamp,
    REGEXP_SUBSTR returns '' on no match (regexp_extract's exact
    contract — Oracle/Spark return NULL), 2-arg REGEXP_REPLACE
    deletes, REPLICATE → repeat, JSON_EXTRACT_ARRAY_ELEMENT_TEXT →
    $[i] paths, RATIO_TO_REPORT(x) OVER w → x / SUM(x) OVER w;
    tsql DATEFROMPARTS → make_date, DATETIMEFROMPARTS → make_timestamp
    (ms folded into seconds), TIMEFROMPARTS loud (no TIME type),
    STDEV/STDEVP/VAR/VARP renames, FORMAT's .NET date-pattern tier
    (letters where .NET and Java agree; numeric specifiers loud)."""
    t = lambda r, s: transpile(s, r)  # noqa: E731
    assert "pmod(weekday((d)) + 1, 7)" in t(
        "redshift", "SELECT date_part(dow, d) FROM t")
    assert t("redshift", "SELECT datepart(yr, d) FROM t") == \
        "SELECT date_part('YEAR', (d)) FROM t"
    assert "unix_micros" in t(
        "redshift", "SELECT date_part(epoch, ts) FROM t")
    assert "pmod(weekday((d)) + 1, 7)" in t(
        "redshift", "SELECT extract(dow FROM d) FROM t")
    assert t("redshift", "SELECT extract(yr FROM d) FROM t") == \
        "SELECT extract(year FROM d) FROM t"
    out = t("redshift", "SELECT convert_timezone('UTC', tz, ts) FROM t")
    assert "from_utc_timestamp(to_utc_timestamp((ts), ('UTC')), (tz))" \
        in out
    assert t("redshift", "SELECT regexp_substr(s, p) FROM t") == \
        "SELECT regexp_extract((s), (p), 0) FROM t"
    assert "coalesce(try_element_at(regexp_extract_all" in t(
        "redshift", "SELECT regexp_substr(s, p, 2, 3) FROM t")
    assert t("redshift", "SELECT regexp_replace(s, p) FROM t") == \
        "SELECT regexp_replace(s, p, '') FROM t"
    assert "repeat" in t("redshift", "SELECT replicate(s, 2) FROM t")
    assert "'$[1]'" in t(
        "redshift",
        "SELECT json_extract_array_element_text(j, 1) FROM t")
    out = t("redshift",
            "SELECT ratio_to_report(x) OVER (PARTITION BY g) FROM t")
    assert "/ sum((x)) OVER (PARTITION BY g)" in out
    # tsql
    assert t("tsql", "SELECT datefromparts(2024, 1, 15)") == \
        "SELECT make_date(2024, 1, 15)"
    assert "(5) + (250) / 1000.0" in t(
        "tsql", "SELECT datetimefromparts(2024, 1, 15, 10, 30, 5, 250)")
    assert t("tsql", "SELECT stdev(x), varp(x) FROM t") == \
        "SELECT stddev_samp(x), var_pop(x) FROM t"
    assert t("tsql", "SELECT format(d, 'MM/dd/yyyy') FROM t") == \
        "SELECT date_format((d), 'MM/dd/yyyy') FROM t"
    for loud in ("SELECT format(x, 'N2') FROM t",
                 "SELECT timefromparts(1, 2, 3, 0, 0)"):
        with pytest.raises(TranspileError):
            t("tsql", loud)


def test_clickhouse_residual_sweep_round11():
    """CH residual sweep (27/27 Spark value checks): anyIf →
    any_value(if(...), true); countDistinct ≡ uniqExact; bitShift
    renames + bitTest; exp2/exp10 → power; intDivOrZero/moduloOrZero
    zero guards; range's END-EXCLUSIVE sequence (3-arg step loud);
    numeric trunc/truncate; hasAll/hasAny via NULL-element-safe <=>
    exists/forall; arrayFirstIndex → array_position over the
    transformed bools (0 on miss both sides); arrayFirst loud (element
    type's default on miss); arrayUniq → size∘array_distinct;
    arrayReverseSort → sort_array(x, false) (NULLs LAST both);
    arrayEnumerate via the slice(sequence(0, n)) drop (greatest() is
    None-mapped on this read); toRelativeDayNum → epoch datediff;
    age → timestampdiff (complete units, no truncation); sumArray →
    sum over the per-row fold."""
    t = lambda s: transpile(s, "clickhouse")  # noqa: E731
    assert t("SELECT anyIf(x, c) FROM t") == \
        "SELECT any_value(if((c), (x), NULL), true) FROM t"
    assert t("SELECT countDistinct(x) FROM t") == \
        "SELECT count(DISTINCT (x)) FROM t"
    assert "shiftleft" in t("SELECT bitShiftLeft(1, 3)")
    assert t("SELECT bitTest(n, 2) FROM t") == \
        "SELECT (shiftright(CAST((n) AS BIGINT), (2)) & 1) FROM t"
    assert t("SELECT exp2(x) FROM t") == "SELECT power(2, (x)) FROM t"
    assert "IF((b) = 0, 0, ((a) DIV (b)))" in t(
        "SELECT intDivOrZero(a, b) FROM t")
    assert "sequence((0), (n) - 1)" in t("SELECT range(n) FROM t")
    with pytest.raises(TranspileError):
        t("SELECT range(1, 9, 2)")
    assert "floor((x))" in t("SELECT trunc(x) FROM t")
    assert t("SELECT hasAll(a, b) FROM t") == \
        "SELECT forall((b), _y -> exists((a), _x -> _x <=> _y)) FROM t"
    assert "exists((b)" in t("SELECT hasAny(a, b) FROM t")
    assert t("SELECT arrayFirstIndex(x -> x > 1, a) FROM t") == \
        ("SELECT coalesce(array_position(transform((a), x -> x > 1), "
         "true), 0) FROM t")
    with pytest.raises(TranspileError, match="DEFAULT"):
        t("SELECT arrayFirst(x -> x > 1, a) FROM t")
    assert "size(array_distinct((a)))" in t(
        "SELECT arrayUniq(a) FROM t")
    assert t("SELECT arrayReverseSort(a) FROM t") == \
        "SELECT sort_array((a), false) FROM t"
    assert "slice(sequence(0, size((a))), 2, size((a)))" in t(
        "SELECT arrayEnumerate(a) FROM t")
    assert "DATE '1970-01-01'" in t(
        "SELECT toRelativeDayNum(d) FROM t")
    assert "timestampdiff(MONTH" in t(
        "SELECT age('month', a, b) FROM t")
    assert "sum(aggregate((a)" in t("SELECT sumArray(a) FROM t")


def test_pg_convert_charset_bridge_round11():
    """convert_from(bytea, 'UTF8') / convert_to(text, 'UTF8') are
    plain BINARY↔STRING casts (Spark strings are UTF-8; pinned live,
    wave 62 6/6); other encodings loud — Spark's own encode/decode
    names collide with pg's binary-codec forms handled above them."""
    t = lambda s: transpile(s, "postgres")  # noqa: E731
    assert t("SELECT convert_from(b, 'UTF8') FROM t") == \
        "SELECT CAST((b) AS STRING) FROM t"
    assert t("SELECT convert_to(s, 'utf-8') FROM t") == \
        "SELECT CAST((s) AS BINARY) FROM t"
    for loud in ("SELECT convert_from(b, 'LATIN1') FROM t",
                 "SELECT convert_to(s, enc) FROM t",
                 "SELECT to_ascii(s) FROM t"):
        with pytest.raises(TranspileError):
            t(loud)
    with pytest.raises(TranspileError):
        transpile("SELECT era(d) FROM t", "duckdb")


def test_range_and_union_type_louds_round11():
    """pg RANGE-type constructors/predicates and duck UNION-type
    functions loud (no Spark range or tagged-union type — previously
    unresolved-routine passthroughs); plain lower()/upper() string
    functions are untouched."""
    for q in ("SELECT int4range(1, 5)", "SELECT tsrange(a, b) FROM t",
              "SELECT isempty(r) FROM t", "SELECT daterange(a, b) FROM t"):
        with pytest.raises(TranspileError):
            transpile(q, "postgres")
    for q in ("SELECT union_value(k := 1)", "SELECT union_tag(u) FROM t"):
        with pytest.raises(TranspileError):
            transpile(q, "duckdb")
    assert transpile("SELECT lower(s), upper(s) FROM t", "postgres") == \
        "SELECT lower(s), upper(s) FROM t"


def test_r13_split_dispatch_gates():
    """The round-13 module split (standard.py 1,321 → standard +
    datetime_calls; standard_edges.py 1,334 → standard_edges +
    interval_promote) must keep every moved handler REACHABLE — the
    round-8 split regression class was a dispatch gate narrower than a
    moved handler's read tuple. One behavioral probe per moved handler
    proves the dispatch path (standard.call_handlers → datetime_calls;
    duckdb_tokens/postgres_ops token tier → interval_promote) fires."""
    # datetime_calls: to_char (pg/redshift/oracle gate)
    assert transpile("SELECT to_char(ts, 'YYYY-MM-DD') FROM t", "postgres") \
        == "SELECT date_format(ts, 'yyyy-MM-dd') FROM t"
    # datetime_calls: string_to_array empty-separator seam fires
    assert "split" in transpile(
        "SELECT string_to_array(s, ',') FROM t", "postgres")
    # datetime_calls: dateadd family (snowflake/redshift/tsql gate)
    assert transpile("SELECT dateadd(day, 3, d) FROM t", "snowflake") \
        == "SELECT timestampadd(DAY, 3, d) FROM t"
    # datetime_calls: date_diff family incl. boundary-crossing trunc
    assert transpile("SELECT datediff(day, a, b) FROM t", "snowflake") == (
        "SELECT timestampdiff(DAY, date_trunc('day', a), "
        "date_trunc('day', b)) FROM t"
    )
    # interval_promote: date ± INTERVAL promotes on BOTH reads
    for read in ("duckdb", "postgres"):
        assert transpile(
            "SELECT DATE '2024-01-31' + INTERVAL '1 month' AS v", read
        ) == "SELECT CAST(DATE '2024-01-31' AS TIMESTAMP) + " \
             "INTERVAL '1 month' AS v"
    # interval_promote: the make_interval composition partner (additive
    # edit, token stays visible for the pg named-arg rewrite)
    assert transpile(
        "SELECT make_date(2024,1,31) + make_interval(months => 1) AS v",
        "postgres",
    ) == ("SELECT CAST(make_date(2024,1,31) AS TIMESTAMP) + "
          "make_interval(0, 1, 0, 0, 0, 0, 0) AS v")
    # and the moved handlers do NOT leak into non-gated reads
    assert transpile("SELECT to_char(ts, 'x') FROM t", "duckdb") != \
        "SELECT date_format(ts, 'x') FROM t"
