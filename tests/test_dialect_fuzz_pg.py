"""Live-PostgreSQL differential enumeration: composed postgres
expressions evaluated natively on a local PostgreSQL server and through
transpile(read='postgres') on Spark — the postgres twin of
tests/test_dialect_fuzz.py (which uses in-process DuckDB).

The server is the sandbox's own PostgreSQL 15 (no network): see
tools/pg_sandbox.sh for the two-command bootstrap (initdb refuses root,
so it runs under a throwaway user with a /tmp socket dir). When no
server is reachable the module SKIPS — the enumeration is a
development/judging net, not a runtime dependency.

Methodology mirrors the duckdb harness: a fixed deterministic corpus;
expressions PostgreSQL itself rejects are skipped (Spark may be loud
there too, in any form); TranspileError is always acceptable (loud);
everything else must VALUE-match. PG values come back as
`to_json(expr)::text` so floats/arrays/booleans parse losslessly;
templates avoid raw timestamp outputs (to_char/extract instead), since
JSON timestamp text forms differ from Spark's collected datetimes.
"""

from __future__ import annotations

import json
import math
import os
import re
import subprocess

import pytest

from sqlmesh_spark.core.transpile import TranspileError, transpile

PGHOST = os.environ.get("SPARK_GRAFT_PGHOST", "/tmp/pgv")


def _psql(script: str) -> str | None:
    try:
        r = subprocess.run(
            ["psql", "-h", PGHOST, "-U", "postgres", "-X", "-q",
             "-v", "ON_ERROR_STOP=0"],
            input=script, capture_output=True, text=True, timeout=180,
        )
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return None
    return r.stdout if r.returncode in (0, 3) else None


def _pg_available() -> bool:
    out = _psql("SELECT 41 + 1;")
    return out is not None and "42" in out


pytestmark = pytest.mark.skipif(
    not _pg_available(),
    reason="no live PostgreSQL at $SPARK_GRAFT_PGHOST (default /tmp/pgv) "
           "— bootstrap with tools/pg_sandbox.sh",
)


# ---------------------------------------------------------------------------
# Corpus
# ---------------------------------------------------------------------------

TEMPLATES: list[str] = []

# arithmetic: pg integer `/` truncates toward zero (literal-int shapes
# rewrite to DIV; non-literal shapes are a pinned documented divergence
# below), `^` is POWER with unary minus binding TIGHTER, `%` int mod,
# `#` XOR, & | bitwise, zero divisors raise on BOTH engines (pg-reject
# → skipped)
TEMPLATES += [
    "7 / 2", "-7 / 2", "7 / -2", "1 / 3", "100 / 7 + 1", "9 / 3 = 3",
    "7.0 / 2", "7 / 2.0", "2 ^ 10", "2 ^ -2", "-2 ^ 2", "2 ^ 0.5",
    "7 % 3", "-7 % 3", "7 % -3", "5 # 3", "5 # -1", "(1 + 4) # (2 * 3)",
    "5 & 3", "5 | 3", "~ 5", "mod(9, 4)",
    "round(2.5)", "round(-2.5)", "round(2.345, 2)", "trunc(2.7)",
    "ceil(2.1)", "floor(-2.1)", "sign(-3)", "power(2, 10)",
    "sqrt(16)", "exp(0)", "ln(1)", "log(100)", "pi() > 3",
    "div(9, 4)", "gcd(12, 18)", "lcm(4, 6)", "factorial(5)",
]

# numeric → int casts ROUND half-away-from-zero in pg (round() wrap);
# bigints survive exactly (round is type-preserving)
TEMPLATES += [
    "3.99::int", "(-3.99)::int", "2.5::int", "(-2.5)::int",
    "3.99::bigint", "3.99::smallint", "2.5::numeric::int",
    "CAST(2.7 AS INT)", "CAST(-2.7 AS BIGINT)",
    "9007199254740993::bigint", "CAST(9007199254740993 AS BIGINT)",
    "'42'::int", "1::bool", "0::bool", "'true'::bool",
    "2.5::float8::text = '2.5'", "123.45::numeric(10,1)",
]

# chained literal division (each `/` rewrites to DIV across fixpoint
# passes; `7 DIV 2/2` half-conversions were a silent 1.5-vs-1), chained
# parameterized-decimal casts (the identity DECIMAL→DECIMAL edit
# previously deferred the round() wrap forever), and statically
# FLOAT-typed castees (pg float→int is half-EVEN → bround())
TEMPLATES += [
    "7 / 2 / 2", "100 / 3 / 2 / 2", "7 / 2 / 2.0", "1 + 7 / 2 / 2",
    "3.99::numeric(10,2)::int", "2.5::numeric(10,2)::int",
    "CAST(3.99::numeric(10,2) AS int)", "(-2.5)::numeric(10,2)::int",
    "2.5::float8::int", "3.5::float8::int", "(-2.5)::float8::int",
    "(-3.5)::float4::int", "2.5::real::int", "0.5::float8::int",
    "CAST(2.5::float8 AS int)", "CAST(CAST(3.5 AS float8) AS int)",
    "(2.5::float8)::int", "2.5::double precision::int",
    "1.5::double precision", "'ab'::character varying(1)",
    "'ab'::character varying", "random()::int < 2",
    "3.99::float8::bigint", "2.5::numeric(10,1)::float8::int",
]

# explicit varchar(n) casts TRUNCATE in pg ('abc'::varchar(2) = 'ab');
# char(n) blank-padding is loud
TEMPLATES += [
    "'abc'::varchar(2)", "'abc'::character varying(2)",
    "CAST('abcdef' AS varchar(3))", "123.45::varchar(4)",
    "'ab'::varchar(9)", "NULL::varchar(2) IS NULL",
]

# E'...' escape-string literals: C-style escape set (octal, hex,
# \uXXXX, simple escapes, unknown → bare char, '' doubling inside)
TEMPLATES += [
    r"E'a\nb' = 'a' || chr(10) || 'b'", r"length(E'a\tb')",
    r"E'\101\x42c'", r"E'it\'s'", r"e'x''y'", r"E'\q'",
    r"E'A'", r"E'\\' = chr(92)", r"upper(E'a\nb') = E'A\nB'",
    r"E'a\015b' = 'a' || chr(13) || 'b'", r"strpos(E'a\tb', E'\t')",
]

# quantified comparisons beyond `=`: exists/forall rewrites with exact
# three-valued NULL semantics (verified: Spark exists/forall match pg's
# ANY/ALL on NULL elements, empty arrays, NULL arrays)
TEMPLATES += [
    "3 <> ANY(ARRAY[1,2])", "2 <> ANY(ARRAY[2])", "1 <> ALL(ARRAY[2,3])",
    "1 > ANY(ARRAY[0, 2])", "1 > ANY(ARRAY[2, 3])",
    "1 > ANY(ARRAY[2, NULL])", "1 > ANY(ARRAY[0, NULL])",
    "1 < ALL(ARRAY[2, NULL])", "1 < ALL(ARRAY[0, NULL])",
    "1 > ANY(ARRAY[]::int[])", "1 < ALL(ARRAY[]::int[])",
    "1 >= SOME(ARRAY[1,5])", "5 <= ALL(ARRAY[5,6])",
    "2 != ANY(ARRAY[1,2])", "0 = ANY(ARRAY[1,NULL])",
    "1 = ALL(ARRAY[1,NULL])",
]

# array-element ||: number literal prepends/appends (statically
# provable shapes only; arr || arr stays concat)
TEMPLATES += [
    "1 || ARRAY[2,3]", "ARRAY[1,2] || 3", "ARRAY[1] || ARRAY[2,3]",
    "0 || ARRAY[]::int[]", "ARRAY[1,2] || 3 = ARRAY[1,2,3]",
]

# row-constructor comparisons: field-wise three-valued logic (Spark's
# STRUCT comparison treats NULL as a smallest VALUE — (1,NULL) < (1,0)
# is true there, NULL in pg/duckdb — so they expand to the standard
# AND/OR / lexicographic form with struct-bound elements)
TEMPLATES += [
    "(1,2) < (1,3)", "(1,2) >= (1,2)", "(2,0) > (1,9)",
    "(1,NULL) = (1,2)", "(1,NULL) < (2,0)", "(NULL,1) = (NULL,1)",
    "(1,NULL) < (1,0)", "(1,2) <> (1,3)", "(1,NULL) <> (1,2)",
    "(1,NULL) <> (2,2)", "(1,2,3) < (1,2,4)", "(1,2,3) <= (1,2,3)",
    "ROW(1,2) = ROW(1,2)", "(2,0) <= (1,9)", "(1,0) != (1,0)",
    "(1+1, 2*2) = (2, 4)",
    "(1,2) IN ((1,2),(3,4))", "(1,5) IN ((1,2),(3,4))",
    "(1,NULL) IN ((1,2))", "(1,NULL) NOT IN ((1,2))",
    "(1,2) NOT IN ((3,4))", "(1,NULL) IN ((2,3))",
    "(1,NULL) IN ((1,NULL))", "(1,2) IN (ROW(1,2))",
]

# ^@ starts-with operator (pg 11+) → startswith; BETWEEN SYMMETRIC is
# loud-with-guidance (its bound spans end at parser-precedence
# boundaries a token walk cannot see)
TEMPLATES += [
    "'abc' ^@ 'ab'", "'abc' ^@ 'bc'", "'abc' ^@ ''",
    "upper('ab') ^@ 'A'", "NOT ('abc' ^@ 'b')",
    "2 BETWEEN SYMMETRIC 3 AND 1",
]

# round 11 (wave 57/58): VARIADIC ARRAY[...] unfolds to a plain
# argument list in a raw pre-pass (before call handlers paren-wrap
# argument spans); ROWS FROM (unnest, ...) zips with NULL padding →
# inline(arrays_zip(...)); row-tuple COUNT DISTINCT counts
# NULL-containing tuples in BOTH engines (Spark's named_struct
# distinct ≡ pg row distinct — verified-native, pinned here)
TEMPLATES += [
    "concat_ws(',', VARIADIC ARRAY['a','b','c'])",
    "concat_ws('-', 'x', VARIADIC ARRAY['y','z'])",
    "format('%s-%s', VARIADIC ARRAY['x','y'])",
    "concat(VARIADIC ARRAY[1, 2, 3])",
    "concat_ws(',', VARIADIC ARRAY[upper('a'), lower('B')])",
    "(SELECT count(*) FROM ROWS FROM (unnest(ARRAY[1,2]),"
    " unnest(ARRAY['a','b','c'])))",
    "(SELECT count(distinct (a, b)) FROM"
    " (VALUES (1,2),(1,2),(3,4),(NULL,2),(NULL,2)) t(a,b))",
    "(SELECT sum(v) FROM ROWS FROM (unnest(ARRAY[10,20,30])) s(v))",
    # LIKE/ILIKE ANY|ALL over array-literal pattern lists → Spark's
    # bare pattern list (wave 59); date_bin → the time_bucket
    # machinery; IS NORMALIZED is loud (tested elsewhere)
    "'abc' LIKE ALL (ARRAY['a%', '%c'])",
    "'abc' LIKE ANY (ARRAY['z%', '%z'])",
    "'abc' NOT LIKE ALL (ARRAY['z%'])",
    "'ABC' ILIKE ANY (ARRAY['a%'])",
    "date_bin(INTERVAL '15 minutes', TIMESTAMP '2024-01-01 10:37:22',"
    " TIMESTAMP '2024-01-01 00:00:00')",
    "num_nulls(1, NULL, 3)",
]

# round 11: fractional/clock/'ago' interval literals decompose via
# pg's DecodeInterval spilling ('1.5 days' → 1 day 12:00:00, pinned
# live) — Spark's literal parser rejects all three shapes; pinned in
# scalar contexts (timestamp arithmetic / epoch). substring(s SIMILAR
# p ESCAPE e) → RLIKE-guarded regexp_extract (NULL on no match, ''
# on an empty capture — both pinned live). SIMILAR TO escapes are ARE
# regex escapes ('\d' IS the digit class — '7' matches, 'd' does not,
# pinned live; ARE-only letters like \m are loud).
TEMPLATES += [
    "extract(epoch from interval '1.5 days')",
    "extract(epoch from interval '1.75 minutes')",
    "timestamp '2024-03-10 08:00:00' + interval '1.5 days'",
    "timestamp '2024-03-10 08:00:00' - interval '2.5 hours'",
    "timestamp '2024-01-01 00:00:00' + interval '1 day 12:00:00'",
    "timestamp '2024-01-01 00:00:00' + interval '1 day ago'",
    "timestamp '2024-06-01 00:00:00' + interval '0.5 years'",
    "substring('abcdef' similar '%#\"cd#\"%' escape '#')",
    "substring('abcdef' similar '%#\"zz#\"%' escape '#')",
    "substring('abcdef' similar 'ab#\"x*#\"%' escape '#')",
    "substring('one2three' similar '[a-z]+#\"[0-9]+#\"[a-z]+' escape '#')",
    "substring('abcdef' similar '%cd%' escape '#')",
    "'d' SIMILAR TO '\\d'",
    "'7' SIMILAR TO '\\d'",
    # numeric to_char digit-class tier (round 11; wave37 49/49 MATCH):
    # sign-slot padding, zero-runs, half-up rounding, '#' overflow,
    # S explicit sign, FM strip + the pinned '0.' zero
    "to_char(1234.5, '9,999.99')",
    "to_char(-1234.5, '9,999.99')",
    "to_char(0.5, '9.99')",
    "to_char(12.34, 'FM990.00')",
    "to_char(12, 'S9.9')",
    "to_char(12345, '999')",
    "to_char(12, '0009')",
    "to_char(2.675, '9.99')",
    "to_char(0, 'FM9.99')",
    "to_char(99.96, '99.9')",
    "to_char(0.5, 'FM9.99')",
    "to_char(-5, 'S999')",
    # array-literal TEXT quantified comparisons + the mode() tie rule
    # (Spark 4 WITHIN GROUP matches pg: ASC → lowest of the tied)
    "1 = ANY('{1,2}')",
    "'b' = ANY('{a,b}')",
    "3 = ANY('{1,NULL,3}')",
    "2 <> ALL('{1,3}')",
    "(select mode() within group (order by x) from (values (2),(2),(1),(1)) t(x))",
    "(select mode() within group (order by x desc) from (values (2),(2),(1),(1)) t(x))",
]

# array slices [a:b]: 1-based inclusive with clamping; literal
# non-negative bounds rewrite to slice() (open upper bound via the
# size-bound struct form); negative/expression bounds stay loud
TEMPLATES += [
    "(ARRAY[1,2,3])[1:2]", "(ARRAY[1,2,3])[0:2]", "(ARRAY[1,2,3])[2:9]",
    "(ARRAY[1,2,3])[3:2]", "(ARRAY[1,2,3])[2:]", "(ARRAY[1,2,3])[:2]",
    "(ARRAY[1,2,3])[5:]", "(ARRAY[1,2,3])[:9]", "(ARRAY[1,2,3])[2:2]",
]

# OVER-window ORDER BY NULL placement interacting with frame clauses:
# the annotation must land INSIDE the window (first_value over an
# unannotated ASC sort reads pg's NULLS-LAST first row, not Spark's
# NULLS-FIRST one)
TEMPLATES += [
    "(SELECT max(fv) FROM (SELECT first_value(v) OVER (ORDER BY v "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv "
    "FROM (VALUES (1),(NULL),(2)) t(v)) s)",
    "(SELECT count(fv) FROM (SELECT last_value(v) OVER (ORDER BY v "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fv "
    "FROM (VALUES (1),(NULL),(2)) t(v)) s)",
    "(SELECT max(m) FROM (SELECT sum(v) OVER (ORDER BY v DESC "
    "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS m "
    "FROM (VALUES (1),(NULL),(3)) t(v)) s)",
    "(SELECT string_agg(r::text, ',') FROM (SELECT rank() OVER "
    "(ORDER BY v) AS r FROM (VALUES (2),(NULL),(1)) t(v) "
    "ORDER BY r) s)",
]

# strings: pg substr handles start<=0 by consuming, left/right accept
# negatives (drop from the other end), split_part returns '' OOB,
# position/strpos, lpad truncates, || coerces non-text
LIT = ["'ab|cd'", "''", "'It''s'", "'a.b.c'", "'10%'"]
for s in LIT:
    TEMPLATES += [
        f"substr({s}, 0, 3)", f"substr({s}, 2, 2)", f"substr({s}, -1, 3)",
        f"left({s}, 2)", f"left({s}, -1)", f"right({s}, 2)",
        f"right({s}, -1)", f"length({s})", f"upper({s})",
        f"reverse({s})", f"strpos({s}, 'b')", f"md5({s})",
        f"split_part({s}, '|', 1)", f"split_part({s}, '|', 9)",
        f"{s} || '!'", f"replace({s}, 'a', '_')",
    ]
TEMPLATES += [
    "lpad('ab', 5, '*')", "lpad('abcdef', 3)", "rpad('ab', 4, 'xy')",
    "repeat('ab', 3)", "initcap('hello world')", "ascii('A')", "chr(66)",
    "btrim('xxhixx', 'x')", "ltrim('  hi')", "rtrim('hi  ')",
    "translate('abc', 'ac', '13')", "starts_with('hello', 'he')",
    "position('b' in 'abc')", "overlay('hello' placing 'XX' from 2 for 3)",
    "concat('a', NULL, 1)", "concat_ws('-', 'a', NULL, 'b')",
    "'a' || NULL IS NULL", "format('%s-%s', 'a', 1)",
    "quote_ident('x y')", "'abc' LIKE 'a%'", "'a_c' LIKE 'a\\_c'",
    "'ABC' ILIKE 'ab%'", "upper('x') COLLATE \"C\" = 'X'",
]

# regex family: ~ is a PARTIAL match (unanchored), ~* case-insensitive,
# !~ negated, ~~ is LIKE; 3-arg regexp_replace replaces FIRST match
# only ('g' replaces all); substring(s from re) returns group 1 if
# present else the whole match; regexp_split_to_array
TEMPLATES += [
    "'Hello' ~ 'ell'", "'Hello' ~ 'hel'", "'Hello' ~* 'HEL'",
    "'Hello' !~ 'z'", "'Hello' !~* 'hel'", "'a.b' ~ '[.]'",
    "'a%b' ~~ 'a\\%b'", "'axb' !~~ 'a_b'",
    "regexp_replace('aaa', 'a', 'b')", "regexp_replace('aaa', 'a', 'b', 'g')",
    "regexp_replace('a1b2', '[0-9]', 'x', 'g')",
    "substring('ab12cd' from '[0-9]+')",
    "substring('ab12cd' from 'b([0-9]+)c')",
    "regexp_split_to_array('a1b22c', '[0-9]+')",
    "regexp_count('a1b22c', '[0-9]+')",
    "'2024-01-02' ~ '^[0-9]{4}'",
    "'ab12' ~ '[[:digit:]]+'", "'abcd' ~ '[[:digit:]]'",
    "':' ~ '[[:digit:]]'", "'a b' ~ '[[:space:]]'",
    "'AB' ~* '[[:lower:]]+$'", "'ab' ~ '[[:alpha:]][[:alnum:]]'",
    "regexp_count('a1b22c', '[[:digit:]]+')",
    "regexp_replace('a b  c', '[[:space:]]+', '-', 'g')",
    "substring('ab12cd' from '[[:digit:]]+')",
    "regexp_split_to_array('a1b22c', '[[:digit:]]+')",
]

# arrays: 1-based, OOB → NULL, array_length/cardinality, literals and
# constructors, string_to_array/array_to_string round trips
TEMPLATES += [
    "(ARRAY[1,2,3])[1]", "(ARRAY[1,2,3])[0]", "(ARRAY[1,2,3])[9]",
    "(ARRAY[1,2,3])[-1]", "array_length(ARRAY[1,2,3], 1)",
    "cardinality(ARRAY[1,2,3])", "array_append(ARRAY[1,2], 3)",
    "array_prepend(0, ARRAY[1,2])", "array_cat(ARRAY[1], ARRAY[2,3])",
    "array_position(ARRAY['a','b'], 'b')",
    "array_remove(ARRAY[1,2,1], 1)", "array_replace(ARRAY[1,2,1], 1, 9)",
    "string_to_array('a.b.c', '.')", "string_to_array('', '.')",
    "string_to_array('a|b', NULL)",
    "array_to_string(ARRAY[1,NULL,3], ',')",
    "array_to_string(ARRAY[1,NULL,3], ',', '?')",
    "ARRAY[1,2] || ARRAY[3]", "ARRAY[1,2] @> ARRAY[2]",
    "2 = ANY(ARRAY[1,2])", "5 = ALL(ARRAY[5,5])",
    "(SELECT array_agg(v) FROM (VALUES (1),(NULL),(2)) t(v))",
    "(SELECT array_agg(v ORDER BY v) FROM (VALUES (2),(1)) t(v))",
    "(SELECT unnest(ARRAY[7]))",
    # NULL placement: pg sorts NULL as LARGEST (last on ASC, first on
    # DESC) where Spark's default is the opposite on ASC
    "(SELECT v FROM (VALUES (1),(NULL),(2)) t(v) ORDER BY v LIMIT 1)",
    "(SELECT v FROM (VALUES (1),(NULL),(2)) t(v) ORDER BY v DESC LIMIT 1) IS NULL",
    "(SELECT v FROM (VALUES (1),(NULL),(2)) t(v) ORDER BY v NULLS FIRST LIMIT 1) IS NULL",
    "(SELECT count(*) FROM (SELECT v, row_number() OVER (ORDER BY v) rn FROM (VALUES (1),(NULL)) t(v)) q WHERE rn = 1 AND v = 1)",
]

# aggregates as scalar subqueries: keep-NULL array_agg, string_agg,
# percentile_cont/disc WITHIN GROUP, sample/population stats, FILTER
V = "FROM (VALUES (1),(NULL),(2),(2)) t(v)"
TEMPLATES += [
    f"(SELECT sum(v) {V})", f"(SELECT avg(v) {V})",
    f"(SELECT count(v) {V})", f"(SELECT count(*) {V})",
    f"(SELECT count(DISTINCT v) {V})", f"(SELECT max(v) {V})",
    f"(SELECT bool_and(v > 0) {V})", f"(SELECT bool_or(v > 1) {V})",
    f"(SELECT every(v > 0) {V})",
    f"(SELECT bit_and(v) {V})", f"(SELECT bit_or(v) {V})",
    f"(SELECT sum(v) FILTER (WHERE v > 1) {V})",
    f"(SELECT var_samp(v) {V})", f"(SELECT stddev_pop(v) {V})",
    f"(SELECT round(stddev(v), 6) {V})",
    "(SELECT string_agg(s, ',') FROM (VALUES ('b'),(NULL),('a')) t(s))",
    "(SELECT string_agg(s, ',' ORDER BY s) FROM (VALUES ('b'),('a')) t(s))",
    "(SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY v) FROM (VALUES (1),(2),(3),(4)) t(v))",
    "(SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY v) FROM (VALUES (1),(2),(3),(4)) t(v))",
    "(SELECT mode() WITHIN GROUP (ORDER BY v) FROM (VALUES (1),(2),(2)) t(v))",
    "(SELECT round(corr(a, b)::numeric(20,10), 6) FROM (VALUES (1,2),(3,4),(5,7)) t(a, b))",
    "(SELECT sum(v) FROM (VALUES (1)) t(v) WHERE FALSE)",
]

# dates/times: extract fields (pg date_part returns float8 — value
# equality is what matters), date arithmetic (date + int), interval
# month arithmetic clamps month ends on both engines, to_char patterns,
# date_trunc (compared via to_char), make_date/make_timestamp
TS = "TIMESTAMP '2024-03-09 15:04:05.25'"
TEMPLATES += [
    *(f"extract({f} from {TS})" for f in (
        "year", "month", "day", "hour", "minute", "dow", "isodow",
        "doy", "week", "quarter", "isoyear", "decade", "century",
        "second", "epoch")),
    f"date_part('day', {TS})",
    "(DATE '2024-01-31' + 1)::text",
    "(DATE '2024-03-01' - DATE '2024-01-31')",
    "to_char(DATE '2024-01-31' + INTERVAL '1 month', 'YYYY-MM-DD')",
    "to_char(TIMESTAMP '2024-01-31 10:30:00' + INTERVAL '2 hours', 'YYYY-MM-DD HH24:MI:SS')",
    f"to_char({TS}, 'YYYY-MM-DD HH24:MI:SS')",
    f"to_char({TS}, 'YYYY \"Q\"Q')",
    f"to_char(date_trunc('week', {TS}), 'YYYY-MM-DD')",
    f"to_char(date_trunc('month', {TS}), 'YYYY-MM-DD')",
    "to_char(make_date(2024, 2, 29), 'YYYY-MM-DD')",
    "make_date(2024, 2, 29) = DATE '2024-02-29'",
    "(DATE '2024-02-29' = DATE '2024-02-29')",
    "floor(1.5)",
    "to_date('2024-02-29', 'YYYY-MM-DD')::text",
]

# JSON (jsonb operators and functions; digit path segments are loud)
J = """'{"a": {"b": 2}, "s": "x", "l": [10, 20]}'"""
TEMPLATES += [
    f"{J}::jsonb ->> 's'", f"{J}::jsonb ->> 'zz'",
    f"{J}::jsonb -> 'a' ->> 'b'", f"({J}::jsonb) #>> '{{a,b}}'",
    f"({J}::jsonb) #>> '{{zz,b}}'",
    f"jsonb_array_length(({J}::jsonb) -> 'l')",
    f"({J}::json) ->> 's'",
]

# NULL / boolean edges and conditionals
TEMPLATES += [
    "coalesce(NULL, 2)", "nullif(3, 3)", "nullif(3, 4)",
    "greatest(1, NULL, 3)", "least(NULL, 2)",
    "NULL IS DISTINCT FROM 1", "1 IS NOT DISTINCT FROM 1",
    "CASE WHEN NULL::boolean THEN 'y' ELSE 'n' END",
    "(NULL OR TRUE)", "(NULL AND FALSE)", "NOT NULL IS NULL",
    "num_nonnulls(1, NULL, 3)", "num_nulls(1, NULL, 3)",
]

# to_char pattern edges, date_trunc fields, interval arithmetic
TEMPLATES += [
    f"to_char({TS}, 'Mon DY')",
    f"to_char({TS}, 'Day')",
    f"to_char({TS}, 'FMDay')",
    f"to_char({TS}, 'HH12:MI AM')",
    f"to_char({TS}, 'IW DDD Q')",
    f"to_char({TS}, 'YYYY-MM-DD\"T\"HH24:MI')",
    f"to_char({TS}, 'SS.MS')",
    f"to_char(date_trunc('quarter', {TS}), 'YYYY-MM-DD')",
    f"to_char(date_trunc('hour', {TS}), 'HH24:MI:SS')",
    f"to_char({TS} + INTERVAL '90 minutes', 'HH24:MI')",
    f"to_char({TS} - INTERVAL '1 week', 'YYYY-MM-DD')",
    f"to_char({TS} + INTERVAL '2 years 3 months', 'YYYY-MM')",
    "to_char(TIMESTAMP '2024-02-29 00:00:00' + INTERVAL '1 year', 'YYYY-MM-DD')",
    "to_char(123.456, '999.99')",
    "extract(epoch from INTERVAL '90 minutes')",
    "(TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00') OVERLAPS (TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-03-01 00:00:00')",
    "date_bin(INTERVAL '15 minutes', TIMESTAMP '2024-03-09 15:04:05', TIMESTAMP '2024-01-01 00:00:00')::text",
]

# pg idioms: DISTINCT ON, generate_series, SIMILAR TO
TEMPLATES += [
    "(SELECT v FROM (SELECT DISTINCT ON (k) k, v FROM (VALUES (1,'a'),(1,'b'),(2,'c')) t(k,v) ORDER BY k, v DESC) q WHERE k = 1)",
    "(SELECT count(*) FROM (SELECT DISTINCT ON (k % 2) k FROM (VALUES (1),(2),(3),(4)) t(k) ORDER BY k % 2, k DESC) q)",
    "(SELECT sum(i) FROM generate_series(1, 5) AS g(i))",
    "(SELECT count(*) FROM generate_series(1, 10, 3) AS g(i))",
    "'abc' SIMILAR TO 'a%'", "'abc' SIMILAR TO '(a|z)_c'",
    "'a.c' SIMILAR TO 'a.c'", "'axc' SIMILAR TO 'a.c'",
    "'abc' NOT SIMILAR TO 'z%'", "'aaa' SIMILAR TO 'a+'",
    "'ab' SIMILAR TO 'a[bc]'",
    "'ABC' ~~* 'ab%'", "'ABC' !~~* 'xy%'",
    "round(2.504, 2)::int",
    "(1 > 0)::int", "CAST(2 < 1 AS INT)", "(TRUE)::int",
    "string_to_array('a.b.a', '.', 'a')",
    "substring('ab12cd', 'b([0-9]+)c')",
    "substring('ab12cd', '[0-9]+')",
]

# interval field extraction: pg/duckdb fields do NOT normalize across
# components (hour of '26 hours 3 min' is 26) while Spark's day-time
# intervals auto-normalize — INTERVAL-literal operands evaluate
# STATICALLY via _pg_interval_parts/_pg_interval_field; non-literal
# interval operands are loud. epoch covers year/month statically too
# (365.25 d/yr, 30 d/mon — pinned live).
TEMPLATES += [
    "extract(hour from INTERVAL '26 hours 3 minutes')",
    "extract(day from INTERVAL '2 days 26 hours')",
    "extract(minute from INTERVAL '-90 minutes')",
    "extract(second from INTERVAL '1 min 30.5 sec')",
    "extract(microseconds from INTERVAL '1 min 30.5 sec')",
    "extract(milliseconds from INTERVAL '30.5 sec')",
    "extract(month from INTERVAL '14 months')",
    "extract(year from INTERVAL '-14 months')",
    "extract(quarter from INTERVAL '5 months')",
    "extract(quarter from INTERVAL '-5 months')",
    "extract(decade from INTERVAL '25 years')",
    "extract(epoch from INTERVAL '1 year 1 day')",
    "extract(epoch from INTERVAL '1 month')",
    "extract(hour from INTERVAL '1.5 days')",
    "extract(day from INTERVAL '1 week 1 day')",
    "extract(hour from INTERVAL '01:02:03')",
    "extract(month from INTERVAL 'P1Y2M3D')",
    "extract(hour from INTERVAL 'PT26H3M')",
    "date_part('hour', INTERVAL '26 hours')",
    "date_part('epoch', INTERVAL '1 minute')",
    "extract(hour from INTERVAL '1 day' * 2)",  # loud (non-literal)
]

# quantified subqueries: = ANY ↔ IN, <> ALL ↔ NOT IN (pg defines them
# as equivalent, three-valued semantics included); other operators
# over subqueries are loud. array_agg(DISTINCT) sorts ascending
# NULL-last in pg (sort-based distinct — implementation artifact but
# de facto stable) — matched via an explicit struct comparator.
TEMPLATES += [
    "2 = ANY(SELECT v FROM (VALUES (1),(2)) t(v))",
    "3 = ANY(SELECT v FROM (VALUES (1),(2)) t(v))",
    "2 <> ALL(SELECT v FROM (VALUES (1),(3)) t(v))",
    "2 <> ALL(SELECT v FROM (VALUES (2),(3)) t(v))",
    # NULL-in-subquery + no match in PROJECTION context: Spark IN
    # collapses NULL→false — pinned in test_pg_pinned_divergences
    # (WHERE-context behavior is identical on both engines)
    "(SELECT count(*) FROM (VALUES (1)) q(k) "
    "WHERE 3 = ANY(SELECT v FROM (VALUES (1),(NULL)) t(v)))",
    "(SELECT count(*) FROM (VALUES (1)) q(k) "
    "WHERE 2 <> ALL(SELECT v FROM (VALUES (1),(NULL)) t(v)))",
    "2 > ANY(SELECT v FROM (VALUES (1),(3)) t(v))",  # loud
    "(SELECT array_agg(DISTINCT v) FROM (VALUES (2),(1),(2)) t(v))",
    "(SELECT array_agg(DISTINCT v) FROM (VALUES (2),(NULL),(1),(2)) t(v))",
    "(SELECT array_agg(DISTINCT s) FROM (VALUES ('b'),('a'),('b')) t(s))",
]

# jsonb mutation/existence operators and interval-to-text casts: all
# loud (the || shape would otherwise silently STRING-concatenate two
# jsonb casts where pg merges objects; interval::text renders
# '3 days' vs Spark's 'INTERVAL ...' form)
TEMPLATES += [
    """'{"a":1}'::jsonb || '{"b":2}'::jsonb""",
    """('{"a":1,"b":2}'::jsonb) - 'a'""",
    """'{"a":1}'::jsonb ? 'a'""",
    """('{"a":1}'::jsonb) #- '{a}'""",
    "(INTERVAL '1 day' * 3)::text",
    "(INTERVAL '1 hour' / 2)::text",
    "make_interval(1, 2)::text",
]

# round-8 function batch (encode/decode codecs, to_hex, function-style
# casts, isfinite, get_byte, array helpers, regexp_match, named
# make_interval) and operator batch (@> <@ containment, unary @ abs,
# |/ sqrt, ||/ cbrt — pinned live: ARRAY[NULL] @> ARRAY[NULL] is
# FALSE, NULL operand → NULL), plus literal-castee seams ('on'/'off'
# booleans, '...'::interval, '{...}'::type[] array literals,
# bytea::text hex rendering) and clause seams (OFFSET-then-LIMIT)
TEMPLATES += [
    "encode('abc'::bytea, 'hex')", "encode('ab'::bytea, 'base64')",
    "decode('616263', 'hex') = 'abc'::bytea",
    "decode('YWJj', 'base64') = 'abc'::bytea",
    "to_hex(255)", "to_hex(4294967295)", "to_hex(0)",
    "int4(2.7)", "int4(-2.7)", "int8(3.2)", "int2(1.5)",
    "float8(1) = 1.0", "float4(2.5) = 2.5",
    "isfinite(DATE '2024-01-01')", "isfinite(TIMESTAMP '2024-01-01 00:00:00')",
    "get_byte('abc'::bytea, 0)", "get_byte('abc'::bytea, 2)",
    "array_upper(ARRAY[1,2,3], 1)", "array_upper(ARRAY[]::int[], 1)",
    "array_lower(ARRAY[1,2,3], 1)", "array_lower(ARRAY[]::int[], 1)",
    "array_fill(7, ARRAY[3])", "array_fill('x'::text, ARRAY[2])",
    "array_positions(ARRAY[1,2,1], 1)",
    "array_positions(ARRAY[1,NULL,1], NULL)",
    "array_positions(ARRAY[1,2], 9)",
    "trim_array(ARRAY[1,2,3], 1)", "trim_array(ARRAY[1,2], 0)",
    "regexp_match('ab12', '[0-9]+')", "regexp_match('ab', '[0-9]+') IS NULL",
    "regexp_match('ab12cd', 'b([0-9]+)c')",
    "regexp_match('AB12', '[a-z]+', 'i')",
    # (equality against INTERVAL literals is a Spark type mismatch —
    # make_interval returns Spark's CalendarIntervalType — so compare
    # through timestamp arithmetic instead)
    "(TIMESTAMP '2024-01-01 00:00:00' + make_interval(days => 2))::date::text",
    "to_char(TIMESTAMP '2024-01-01 00:00:00' + make_interval(hours => 26), 'YYYY-MM-DD HH24:MI')",
    "jsonb_extract_path_text('{\"a\":{\"b\":\"x\"}}'::jsonb, 'a', 'b')",
    "jsonb_array_length('[1,2,3]'::jsonb)",
    "ARRAY[1,2,3] @> ARRAY[2]", "ARRAY[1,2] @> ARRAY[]::int[]",
    "ARRAY[1,NULL] @> ARRAY[1]", "ARRAY[1] @> ARRAY[1,1]",
    "ARRAY[2] <@ ARRAY[1,2]", "ARRAY[3] <@ ARRAY[1,2]",
    "(NULL::int[] @> ARRAY[1]) IS NULL",
    "@ -5", "@ (3 - 10)", "|/ 25", "||/ 27", "2 + @ -3",
    "'off'::boolean", "'on'::boolean", "'tr'::boolean", "'fal'::bool",
    "'yes'::boolean", "'t'::boolean",
    "'90 minutes'::interval = INTERVAL '1 hour 30 minutes'",
    "(TIMESTAMP '2024-01-01 00:00:00' + '1 year'::interval)::date::text",
    "'{1,2,3}'::int[]", "('{a,b}'::text[])[1]", "'{}'::int[]",
    "'{1,NULL}'::bigint[]", "('{\"x y\",z}'::text[])[1]",
    "'{true,false}'::boolean[]", "'{1.5,2.5}'::float8[]",
    "'abc'::bytea::text", "''::bytea::text",
    "(SELECT v FROM (VALUES (3),(1),(2)) t(v) ORDER BY v OFFSET 1 LIMIT 1)",
]

# second probe wave: bytea literal/rendering seams (hex input form,
# binary-returning calls cast to text render pg's '\x<hex>'),
# FROM-less substring, loud bit-strings/ORDINALITY/OPERATOR()/
# timestamp(p)
TEMPLATES += [
    r"'\x6162'::bytea::text", r"'\x6162'::bytea = 'ab'::bytea",
    "decode('YWJj', 'base64')::text", "decode('616263', 'hex')::text",
    "encode(decode('616263', 'hex'), 'base64')",
    "substring('hello' for 2)", "substring('hello' from 3)",
    "substring('hello' from 2 for 3)",
    "B'101'::int", "X'1F'::int",  # loud (bit strings)
    "TIMESTAMP '2024-01-01 10:30:45.678'::timestamp(0)::text",  # loud
    "ARRAY['a','b'] @> ARRAY['a']", "ARRAY['a'] <@ ARRAY['a','b']",
    "'  off  '::boolean", "'{1 , 2}'::int[]",
    "('{a b, c}'::text[])[1]",
    "(SELECT count(*) FROM unnest(ARRAY[1,2]) WITH ORDINALITY u(v,o))",
]

# multibyte / encoding-sensitive (requires the UTF8 sandbox —
# tools/pg_sandbox.sh initdb -E UTF8; under SQL_ASCII pg returns
# bytes, not code points, and chr(>127) rejects)
TEMPLATES += [
    "ascii('λ')", "chr(955)", "chr(128512)", "length('λx')",
    "reverse('λx')", "substr('aλb', 2, 1)", "strpos('aλb', 'λ')",
    "chr(65) || chr(955)", "left('λλx', 2)", "octet_length('λ')",
    # upper('straße') is deliberately ABSENT: non-ASCII case mapping
    # is locale-dependent (glibc keeps ß; Spark's ICU full mapping
    # gives SS) — pinned in test_pg_pinned_divergences
]

# third probe wave: exponent literals (pg types them NUMERIC — the
# static expansion keeps text forms exact), empty-range
# generate_series (Spark sequence auto-steps -1 — guarded), pg
# array_remove/array_length NULL edges, zone-suffixed TIMESTAMP
# literals (pg IGNORES the suffix), typed-literal spellings,
# MATERIALIZED CTE hints, unnest bare aliases, catalog containment
# functions, localtimestamp
TEMPLATES += [
    "1e10::text", "1.5e-3::text", "1e10 = 10000000000", "2e-2 + 1",
    "(SELECT count(*) FROM generate_series(1, 0) g(i))",
    "(SELECT count(*) FROM generate_series(5, 1) g(i))",
    "(SELECT sum(i) FROM generate_series(5, 1, -2) g(i))",
    "(SELECT count(*) FROM generate_series(1, 5, -1) g(i))",
    "(SELECT count(*) FROM generate_series(TIMESTAMP '2024-01-03 00:00:00', TIMESTAMP '2024-01-01 00:00:00', INTERVAL '1 day') g)",
    "array_remove(ARRAY[1,NULL,2], NULL)",
    "array_remove(ARRAY[1,NULL,1], 1)",
    "array_length(ARRAY[]::int[], 1)", "array_length(ARRAY[1,2], 1)",
    "EXTRACT(EPOCH FROM TIMESTAMP '2024-01-01 00:00:00 +02')",
    "TIMESTAMP '2024-01-01 00:00:00+02' = TIMESTAMP '2024-01-01 00:00:00'",
    "TIMESTAMPTZ '2023-12-31 22:00:00+00' = TIMESTAMPTZ '2024-01-01 00:00:00+02'",
    "float8 '-0' = 0", "int4 '42'", "bool 't'", "int8 '-7'",
    "(WITH c AS MATERIALIZED (SELECT 2 v) SELECT v FROM c)",
    "(WITH c AS NOT MATERIALIZED (SELECT 2 v) SELECT v FROM c)",
    "(SELECT max(x) FROM unnest(ARRAY[3,1,2]) x)",
    "(SELECT count(*) FROM unnest(ARRAY[3,1,2]) AS u(v) WHERE v > 1)",
    "arraycontains(ARRAY[1,2], ARRAY[1])",
    "arraycontained(ARRAY[1], ARRAY[1,2])",
    "arrayoverlap(ARRAY[1,2], ARRAY[2,3])",
    "arrayoverlap(ARRAY[1], ARRAY[2,NULL])",
    "localtimestamp >= TIMESTAMP '2020-01-01 00:00:00'",
]

# fifth probe wave (tools/probe_dialect.py): interval-typed RANGE
# frames, LIKE/ILIKE ESCAPE, date+int arithmetic both orders,
# epoch of TIMESTAMP subtraction (statically interval-typed paren),
# lateral joins, set-op counts; EXCLUDE frames are loud
TEMPLATES += [
    "(SELECT sum(s) FROM (SELECT sum(v) OVER (ORDER BY ts RANGE BETWEEN "
    "INTERVAL '1 day' PRECEDING AND CURRENT ROW) s FROM (VALUES "
    "(TIMESTAMP '2024-01-01 00:00:00', 1),"
    "(TIMESTAMP '2024-01-02 00:00:00', 2)) t(ts, v)) q)",
    r"'a%b' LIKE 'a\%b' ESCAPE '\'",
    "'a_b' LIKE 'aXXb' ESCAPE 'X'",
    "'aXc' ILIKE 'AX_' ESCAPE 'Z'",
    "(DATE '2024-01-01' + 30)::text", "(30 + DATE '2024-01-01')::text",
    "(DATE '2024-03-01' - 30)::text",
    "extract(epoch from (TIMESTAMP '2024-01-02 03:00:00' - "
    "TIMESTAMP '2024-01-01 00:00:00'))",
    "(SELECT count(*) FROM (VALUES (1),(2)) a(x) FULL OUTER JOIN "
    "(VALUES (2),(3)) b(y) ON x = y)",
    "(SELECT count(*) FROM (VALUES (1),(2)) a(x) LEFT JOIN LATERAL "
    "(SELECT x + 1 AS y) b ON true WHERE y = 2)",
    "(SELECT count(*) FROM (SELECT 1 INTERSECT SELECT 1) q)",
    "(SELECT sum(s) FROM (SELECT sum(v) OVER (ORDER BY v ROWS BETWEEN "
    "1 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) s FROM "
    "(VALUES (1),(2)) t(v)) q)",  # loud (EXCLUDE frame)
    "1 BETWEEN 0 AND 2", "2 NOT BETWEEN 3 AND 4",
    "(NULL BETWEEN 1 AND 2) IS NULL",
]

# sixth probe wave (to_char datetime codes): TZ is loud (pg renders
# '' for zone-less timestamps where Java zzz prints the session zone)
# and adjacent identical codes (SSSS = pg seconds-past-midnight) are
# loud instead of silently merging into one padded Java field
TEMPLATES += [
    "to_char(TIMESTAMP '2024-03-09 15:04:05.678', 'DDD')",
    "to_char(TIMESTAMP '2024-03-09 15:04:05', 'YY')",
    "to_char(DATE '2024-03-09', 'YYYYMMDD')",
    "to_char(TIMESTAMP '2024-03-09 15:04:05', 'HH')",
    "to_char(TIMESTAMP '2024-03-09 15:04:05', 'am')",
    "to_char(TIMESTAMP '2024-03-09 15:04:05', 'MI \"minutes past\" HH12')",
    "to_char(TIMESTAMP '2024-03-09 15:04:05', 'TZ')",    # loud
    "to_char(TIMESTAMP '2024-03-09 15:04:05', 'SSSS')",  # loud (merge)
]

# compositions across families
TEMPLATES += [
    "length(substr('hello', 0, 4)) % 3",
    "(ARRAY[10,20,30])[1 + 1] / 10",
    "abs((ARRAY[1,2])[9]) IS NULL",
    "round((2 ^ -2)::numeric(10,4), 2)",
    "left(md5('x'), 4) ~ '^[0-9a-f]+$'",
    "coalesce((ARRAY[1,2])[9], -1)",
    "split_part('a|b|c', '|', 2) || '!'",
    "(5 # 3) / 2",
    "('x' ~~ 'x') AND ('y' !~ 'z')",
    "substr('hello', 2, 3) = ANY(ARRAY['ell', 'x'])",
    "3.99::int / 2",
    "to_char(DATE '2024-01-15' + 30, 'YYYY-MM-DD')",
]

# round-9 JSON constructors (scalar forms — spacing, key order, NULL
# elements and NULL-on-empty pinned live; ::text so both sides compare
# as document STRINGS), row-lock clause strips, nested cardinality
TEMPLATES += [
    "(SELECT json_agg(x)::text FROM (VALUES (1),(2),(3)) t(x))",
    "(SELECT json_agg(x)::text FROM (VALUES ('a'),('b,c')) t(x))",
    "(SELECT json_agg(x)::text FROM (VALUES (1.50),(2.25)) t(x))",
    "(SELECT json_agg(x)::text FROM (VALUES (NULL::int),(2)) t(x))",
    "(SELECT json_agg(x)::text FROM (SELECT 1 AS x WHERE false) t)",
    "(SELECT jsonb_agg(x)::text FROM (VALUES (true),(false)) t(x))",
    "json_build_object('b', 2, 'a', 'txt')::text",
    "jsonb_build_object('b', 2, 'a', 1)::text",
    "jsonb_build_object('a', 1, 'a', 9)::text",
    "jsonb_build_object('longer', 1, 'ab', 2)::text",
    "json_build_object('a', NULL)::text",
    "json_build_object('k', 'he said \"hi\"')::text",
    "json_build_array(1, 'a', NULL)::text",
    "jsonb_build_array(1.50)::text",
    "(SELECT row_to_json(t)::text FROM (SELECT 1 AS a, NULL::int AS b) t)",
    "row_to_json(ROW(1, 'x'))::text",
    "(SELECT a + 1 FROM (SELECT 2 AS a) s FOR UPDATE)",
    "(SELECT a FROM (SELECT 3 AS a) s FOR NO KEY UPDATE SKIP LOCKED)",
    "(SELECT a FROM (SELECT 4 AS a) s FOR SHARE NOWAIT)",
    "cardinality(ARRAY[[1,2],[3,4]])",
    "cardinality(ARRAY[ARRAY[1,2],ARRAY[3,4],ARRAY[5,6]])",
    "cardinality(ARRAY[1,2,3])",
    "crosstab('select 1')",              # loud
    "regexp_match('abc', 'a(x)?')",      # loud (optional group)
    "extract(week from INTERVAL '15 days')",  # pg-rejected
]

# round-11 wave-46 tier: jsonb ? containment (object/array/scalar
# shapes, number elements never match), terminal negative ->> indexes
# (pg from-end, out-of-range NULL), positional format() directives,
# json_object_agg (space-padded braces, insertion order, dup keys,
# key text-coercion, NULL on empty)
TEMPLATES += [
    "('{\"a\": 1, \"b\": 2}'::jsonb ? 'a')::int",
    "('{\"a\": 1}'::jsonb ? 'z')::int",
    "('[\"a\",\"b\"]'::jsonb ? 'a')::int",
    "('[1,2]'::jsonb ? '1')::int",
    "('\"a\"'::jsonb ? 'a')::int",
    "('123'::jsonb ? '123')::int",
    "(NULL::jsonb ? 'a')::int",
    "('{\"a\": 1}'::jsonb ? NULL)::int",
    "('[\"x1\", \"1\"]'::jsonb ? '1')::int",
    "'[10,20,30]'::json ->> -1",
    "'[10,20,30]'::json ->> -4",
    "'{\"a\": 5}'::json ->> -1",
    "format('%2$s-%1$s', 'x', 'y')",
    "format('%1$s/%1$s', 'a')",
    "format('%1$s %s', 'a', 'b')",       # loud (mixed indexing)
    "(SELECT json_object_agg(k, v)::text"
    " FROM (VALUES ('b',1),('a',2),('a',3)) t(k, v))",
    "(SELECT json_object_agg(k, v)::text FROM (VALUES (1,'x')) t(k, v))",
    "(SELECT json_object_agg(k, v)::text"
    " FROM (VALUES ('n',NULL::int)) t(k, v))",
    "(SELECT json_object_agg(k, v)::text"
    " FROM (VALUES ('q','he \"quoted\"')) t(k, v))",
    "(SELECT json_object_agg(k, v)"
    " FROM (VALUES ('x',1)) t(k, v) WHERE false)",
    "((1 > 2))::int",                    # double-paren boolean castee
    "((true))::int",
]

# round-11 wave-51 tier: ARRAY(SELECT ...) subquery constructor
# (struct-wrapped array_agg keeps NULL elements, [] on empty,
# ORDER BY the selected expr absorbed as array_sort inside the
# subquery — Spark rejects subqueries nested in HOF arguments),
# to_number native parity, bitwise operator tier
TEMPLATES += [
    "ARRAY(SELECT x FROM (VALUES (3),(1),(2)) t(x) ORDER BY x)",
    "ARRAY(SELECT x FROM (VALUES (3),(1),(2)) t(x) ORDER BY x DESC)",
    "ARRAY(SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x)",
    "ARRAY(SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x DESC)",
    "ARRAY(SELECT DISTINCT x FROM (VALUES (2),(1),(2)) t(x) ORDER BY x)",
    "ARRAY(SELECT x FROM (SELECT 1 AS x WHERE false) t)",
    "ARRAY(SELECT x * 10 FROM (VALUES (2),(1)) t(x) ORDER BY x * 10)",
    "ARRAY(SELECT x FROM (VALUES (1),(2),(3)) t(x)"
    " WHERE x > 1 ORDER BY x)",
    "ARRAY(SELECT x FROM (VALUES (1),(2)) t(x) ORDER BY x LIMIT 1)",  # loud
    "ARRAY(SELECT x, x FROM (VALUES (1)) t(x))",   # loud (two columns)
    "to_number('1,234.56', '9,999.99')",
    "to_number('-123', 'S999')",
    "5 & 3", "5 | 3", "~5", "5 << 2", "64 >> 3",
]

# round-11 wave-53 tier: in-aggregate ORDER BY on array_agg —
# comparator array_sort over (_k, _v) pairs, pg defaults (ASC NULLs
# last, DESC NULLs first), FILTER composing, NULL on empty
TEMPLATES += [
    "(SELECT array_agg(x ORDER BY y)"
    " FROM (VALUES (10, 3),(20, 1),(30, 2)) t(x, y))",
    "(SELECT array_agg(x ORDER BY y DESC)"
    " FROM (VALUES (10, 3),(20, NULL),(30, 2)) t(x, y))",
    "(SELECT array_agg(x ORDER BY y NULLS FIRST)"
    " FROM (VALUES (10, 3),(20, NULL)) t(x, y))",
    "(SELECT array_agg(x ORDER BY y) FILTER (WHERE x > 10)"
    " FROM (VALUES (10, 3),(20, 1),(30, 2)) t(x, y))",
    "(SELECT array_agg(x ORDER BY y)"
    " FROM (SELECT 1 AS x, 1 AS y WHERE false) t)",
    "(SELECT array_agg(x ORDER BY y, x) FROM (VALUES (1, 2)) t(x, y))",  # loud
    "(SELECT json_agg(x ORDER BY y)::text"
    " FROM (VALUES (10, 3),(20, 1),(30, 2)) t(x, y))",
    "(SELECT json_agg(x ORDER BY y DESC)::text"
    " FROM (VALUES (10, 3),(20, NULL),(30, 2)) t(x, y))",
    # wave 54: ARRAY-of-fractions percentiles
    "(SELECT percentile_cont(ARRAY[0.25, 0.5])"
    " WITHIN GROUP (ORDER BY v::float8)"
    " FROM (VALUES (1.0),(2.0),(3.0),(4.0)) t(v))",
    "(SELECT percentile_disc(ARRAY[0.5, 0.9])"
    " WITHIN GROUP (ORDER BY v) FROM (VALUES (1),(2),(3),(4)) t(v))",
]

# round-9 date wave: date ± INTERVAL promotes to TIMESTAMP in pg
# (statically date-typed operands get CAST(.. AS TIMESTAMP)); Spark
# date_trunc silently NULLs on pg's unit spellings outside its list and
# lacks decade/century/millennium (pg epochs: centuries start at xx01)
TEMPLATES += [
    "(DATE '2024-01-31' + INTERVAL '1 month')::text",
    "(DATE '2024-12-31' - INTERVAL '1 day')::text",
    "(INTERVAL '1 day' + DATE '2024-12-31')::text",
    "(DATE '2024-01-01' + INTERVAL '90 minutes')::text",
    "(make_date(2024, 1, 31) + INTERVAL '1 month')::text",
    "to_char(date_trunc('decade', DATE '2024-03-15'), 'YYYY-MM-DD')",
    "to_char(date_trunc('decade', DATE '2009-06-01'), 'YYYY-MM-DD')",
    "to_char(date_trunc('century', DATE '2000-06-01'), 'YYYY-MM-DD')",
    "to_char(date_trunc('century', DATE '2024-03-15'), 'YYYY-MM-DD')",
    "to_char(date_trunc('millennium', DATE '2000-06-01'), 'YYYY-MM-DD')",
    "to_char(date_trunc('days', TIMESTAMP '2024-01-02 03:04:05'), 'YYYY-MM-DD HH24:MI')",
    "to_char(date_trunc('w', TIMESTAMP '2024-01-02 03:04:05'), 'YYYY-MM-DD')",
    "date_trunc('bogus', DATE '2024-01-01')",  # pg-rejected AND loud
]

# round-9 to_char name-field segments: pg space-pads DAY/MONTH to 9
# chars and prints every name token case-following-pattern — Java
# patterns can't express either, so the converter emits ||-joined
# rpad/upper/lower wraps around single-field date_format calls
TEMPLATES += [
    f"to_char({TS}, 'DAY')",
    f"to_char({TS}, 'Day')",
    f"to_char({TS}, 'day')",
    f"to_char({TS}, 'MONTH')",
    f"to_char({TS}, 'month')",
    f"to_char({TS}, 'dy mon')",
    f"to_char({TS}, 'DY MON')",
    f"to_char({TS}, 'HH12:MI am')",
    "to_char(TIMESTAMP '2024-03-09 05:04:05', 'am AM')",
    f"to_char({TS}, 'Day, DD Month YYYY')",
    f"to_char({TS}, 'FMDAY FMmonth')",
    f"to_char({TS}, 'FMday FMMONTH')",
]

# round-9 numeric wave: integral exponent literals stay NUMERIC-typed
# (1e0 / 3 was integer division), round(float8) is half-EVEN in pg,
# int-cast operands make `/` provably integer division
TEMPLATES += [
    "1e0 / 3",
    "1e10::text",
    "(1e1 + 1)::text",
    "round(2.5::float8)",
    "round(3.5::float8)",
    "round(-2.5::float8)",
    "round(2.5)",  # NUMERIC overload: half-away, unchanged
    "(SELECT v::bigint / 2 FROM (VALUES (7)) t(v))",
    "(SELECT v::int / w::int FROM (VALUES (9, 2)) t(v, w))",
    "9223372036854775807::bigint / -1",
]

# round-9 string wave: initcap's any-non-alnum word boundaries, the
# && overlap operator, IS-NOT-DISTINCT array_position (finds NULLs,
# 3-arg start), NULL-separator string_to_array (per-char split)
TEMPLATES += [
    "initcap('hello wORLD-foo')",
    "initcap('a.b c''d')",
    "initcap('x1y 2ab')",
    "initcap('éa bé')",
    "initcap('_foo(bar)baz')",
    "(ARRAY[1,2] && ARRAY[2,3])",
    "(ARRAY[1,2] && ARRAY[3,4])",
    "(ARRAY[1,NULL] && ARRAY[NULL,2])",
    "(NULL::int[] && ARRAY[1])",
    "array_position(ARRAY[1,NULL,1], NULL)",
    "array_position(ARRAY[1,2,1], 1, 2)",
    "array_position(ARRAY[1,2,1], 9, 2)",
    "array_position(ARRAY[1,2,1], 1, 9)",
    "array_position(ARRAY[1,2], 9)",
    "string_to_array('abc', NULL)",
    "string_to_array('abc', NULL, 'b')",
    "string_to_array('', NULL)",
    "overlay('hello' placing 'XX' from 2 for 3)",
]

# round-10: pg-15 regexp flag/start tier + the ARE-default seams
# ((?s) dot-newline prefix, $ → \z end-anchor; initcap NULL propagation)
TEMPLATES += [
    "initcap(NULL::text)",
    "initcap('')",
    "regexp_like('Hello', 'hello', 'i')",
    "regexp_like('Hello', 'hello', 'c')",
    "regexp_count('ABabAB', 'ab', 2, 'i')",
    "regexp_count('ababab', 'ab', 3)",
    "regexp_count('ababab', 'ab', 7)",
    "regexp_split_to_array('aXbXc', 'x', 'i')",
    "regexp_substr('A1b2', '[a-z][0-9]', 1, 1, 'i')",
    "regexp_substr('foo123bar456', '[0-9]+', 7)",
    "coalesce(regexp_substr('foobar', '[0-9]+', 2), '<null>')",
    "regexp_instr('ababab', 'b', 3)",
    "regexp_instr('ababab', 'zz', 2)",
    "regexp_instr('Hello World', 'world', 1, 1, 0, 'i')",
    "regexp_replace('ABAB', 'a', 'x', 'gi')",
    "E'a\\nb' ~ 'a.b'",
    "regexp_like(E'a\\nb', 'a.b')",
    "regexp_count(E'a\\na\\na', 'a.')",
    "substring(E'a\\nb' from 'a(.)b')",
    "substring(E'a\\nb' for 2) = E'a\\n'",
    "E'a\\n' ~ 'a$'",
    "'a' ~ 'a$'",
    "E'ab\\n' ~ 'b$'",
    "regexp_count(E'a\\na', 'a$')",
    "'ab' ~ 'a$|ab'",
    "E'ab\\n' SIMILAR TO 'ab'",
    "'ab' SIMILAR TO 'ab'",
    "'a$b' ~ 'a[$]b'",
    "regexp_like('HELLO', '(?i)hello')",
    "regexp_like(E'A\\nB', 'a.b', 'i')",
]

# round-10: ISO-8601 / mixed-family interval literals, make_interval,
# julian extract field
TEMPLATES += [
    "DATE '2024-01-01' + INTERVAL 'P1Y2M3D'",
    "TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 'P1DT2H30M5.5S'",
    "DATE '2024-06-15' + INTERVAL 'PT36H'",
    "DATE '2024-06-15' + INTERVAL 'P2M'",
    "DATE '2024-06-15' + INTERVAL 'P-1Y3D'",
    "DATE '2024-06-15' + INTERVAL 'P1.5D'",
    "TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1 year 3 days'",
    "TIMESTAMP '2024-01-01 00:00:00' - INTERVAL '2 months 12 hours'",
    "TIMESTAMP '2024-01-01 00:00:00' + make_interval(1, 2)",
    "TIMESTAMP '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,5.5)",
    "TIMESTAMP '2024-01-01 00:00:00' + make_interval(years => 1, days => 3)",
    "extract(julian from DATE '2024-01-01')",
    "extract(julian from TIMESTAMP '2024-01-01 06:00:00')",
    "date_part('julian', DATE '2000-02-29')",
]


# ---------------------------------------------------------------------------
# Runner
# ---------------------------------------------------------------------------


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return round(v, 6)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:  # pragma: no cover
        pass
    if isinstance(v, int):
        return round(float(v), 6) if abs(v) < 2**52 else v
    if isinstance(v, bool):
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)  # pg arrays are ordered
    # round-10 (interval templates): pg date/timestamp values arrive as
    # ISO JSON text, Spark returns datetime objects — same canon rule
    # as tools/probe_dialect.py
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        s = v.isoformat(sep="T")
        return s.rstrip("0").rstrip(".") if "." in s else s
    if isinstance(v, _dt.date):
        return v.isoformat() + "T00:00:00"
    if isinstance(v, str) and re.match(
        r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}:\d{2}(\.\d+)?)?$", v
    ):
        s = v.replace(" ", "T")
        if len(s) == 10:
            s += "T00:00:00"
        return s.rstrip("0").rstrip(".") if "." in s else s
    return v


def _pg_values(exprs: list[str]) -> list:
    """One value (or the _PG_ERR sentinel) per expression, evaluated on
    the live server in a single psql session; each statement is its own
    transaction, so one bad expression can't poison the rest."""
    script = ["\\pset tuples_only on", "\\pset format unaligned"]
    for k, e in enumerate(exprs):
        script.append(f"\\echo ###{k}")
        script.append(f"SELECT coalesce(to_json({e})::text, 'null');")
    script.append("\\echo ###END")
    out = _psql("\n".join(script))
    assert out is not None, "psql session died"
    sections: dict[int, str] = {}
    cur = None
    buf: list[str] = []
    for line in out.splitlines():
        if line.startswith("###"):
            if cur is not None:
                sections[cur] = "\n".join(buf).strip()
            buf = []
            cur = None if line == "###END" else int(line[3:])
        else:
            buf.append(line)
    vals = []
    for k in range(len(exprs)):
        txt = sections.get(k, "")
        if not txt:
            vals.append(_PG_ERR)
            continue
        try:
            vals.append(json.loads(txt))
        except ValueError:
            vals.append(txt)
    return vals


_PG_ERR = object()


# round 12 (pg_wave64): SIMILAR-substring greediness — the prefix
# segment's wildcards are NON-greedy (pg returns the EARLIEST capture:
# 'abc123def' ~ '%#"[0-9]+#"%' is '123', not the '3' a greedy Java
# prefix eats to — r11 verdict #1), capture and suffix stay greedy.
# Plus the pg side of the make_interval/date-promotion composition.
TEMPLATES += [
    """substring('abc123def' similar '%#"[0-9]+#"%' escape '#')""",
    """substring('a1b22c' similar '%#"[0-9]+#"%' escape '#')""",
    """substring('a1b22c333d' similar '%#"[0-9]+#"%' escape '#')""",
    """substring('abc123def' similar '_#"[a-z0-9]+#"_' escape '#')""",
    """substring('abc123def' similar '%c#"[0-9]+#"d%' escape '#')""",
    """substring('123abc' similar '#"[0-9]+#"%' escape '#')""",
    """substring('abc123' similar '%#"[0-9]+#"' escape '#')""",
    """substring('aXbXc' similar '%#"X#"%' escape '#')""",
    """substring('abc123def456' similar '%#"[0-9]+#"%[a-z]%' escape '#')""",
    """substring('hello world' similar '%#"w[a-z]*#"%' escape '#')""",
    """substring('ab12cd34' similar '%#"[0-9]{2}#"%' escape '#')""",
    """substring('abcabc' similar '%b#"c%#"' escape '#')""",
    """substring('foo.bar.baz' similar '%.#"[a-z]+#"' escape '#')""",
    """substring('abc123def' similar '%[0-9]+%' escape '#')""",
    "CAST(DATE '2020-01-29' + INTERVAL '1 month 3 days' AS TEXT)",
    "CAST(INTERVAL '1 month 3 days' + DATE '2020-01-29' AS TEXT)",
    "CAST(DATE '2020-01-29' + INTERVAL '1 month 2 hours' AS TEXT)",
    "CAST(make_interval(years => 1, days => 2) + DATE '2020-01-01' AS TEXT)",
    "CAST(DATE '2020-01-01' + make_interval(months => 1) AS TEXT)",
]


def test_pg_differential_enumeration(spark):
    pg_vals = _pg_values(TEMPLATES)
    corpus = []  # (expr, pg_value, spark_fragment)
    loud = 0
    rejected = 0
    for expr, pv in zip(TEMPLATES, pg_vals):
        if pv is _PG_ERR:
            rejected += 1
            continue  # postgres itself rejects it — nothing to compare
        try:
            sq = transpile(f"SELECT {expr} AS v", "postgres")
        except TranspileError:
            loud += 1  # loud is always acceptable
            continue
        if "\\" not in sq:
            try:
                assert transpile(sq, "postgres") == sq, \
                    f"not a fixpoint: {expr}"
            except TranspileError:
                # loud-on-reread class (same policy as the backslash
                # skip): the pg 'g'→3-arg regexp_replace emission is
                # text-identical to pg's first-only 3-arg form, so a
                # FRESH transpile of the output raises rather than
                # silently re-reading it. Runtime never re-transpiles
                # outputs; loud is the contract.
                assert "regexp_replace" in sq.lower(), \
                    f"unexpected loud-on-reread: {expr} -> {sq}"
        corpus.append((expr, pv, sq[len("SELECT ") : -len(" AS v")]))
    assert len(corpus) > 120, (len(corpus), loud, rejected)

    failures = []
    BATCH = 40
    for off in range(0, len(corpus), BATCH):
        chunk = corpus[off : off + BATCH]
        sel = ", ".join(f"({sp}) AS c{k}" for k, (_, _, sp) in enumerate(chunk))
        try:
            row = spark.sql(f"SELECT {sel}").collect()[0]
        except Exception:
            for expr, pv, sp in chunk:
                try:
                    sv = spark.sql(f"SELECT {sp} AS v").collect()[0][0]
                except Exception as exc:  # noqa: BLE001
                    failures.append((expr, pv, f"SPARK_ERR {str(exc)[:90]}"))
                    continue
                if _norm(sv) != _norm(pv):
                    failures.append((expr, pv, sv))
            continue
        for k, (expr, pv, _) in enumerate(chunk):
            sv = row[k]
            if _norm(sv) != _norm(pv):
                failures.append((expr, pv, sv))
    assert not failures, "\n".join(
        f"{e!r}: pg={p!r} spark={s!r}" for e, p, s in failures[:25]
    )


def test_pg_pinned_divergences(spark):
    """Documented, reference-matching divergences the corpus excludes."""
    # Non-literal integer division: pg truncates (count(*) / 2 on 7 rows
    # = 3), Spark divides as DOUBLE (3.5). The operand types are
    # statically unknowable to a textual transpiler; SQLGlot (and
    # therefore the reference) passes `/` through identically. Only the
    # literal-int / literal-int shape rewrites to DIV.
    row = _pg_values(["(SELECT count(*) / 2 FROM generate_series(1, 7))"])
    assert row[0] == 3
    sq = transpile(
        "SELECT (SELECT count(*) / 2 FROM r) AS v", "postgres"
    )
    assert " DIV " not in sq  # pass-through, pinned
    # TRY-style tolerance has no pg spelling; pg '3.9'::int raises while
    # Spark ANSI CAST('3.9' AS INT) raises too — faithful pass-through
    # (the round() wrap deliberately skips pg string literals).
    assert _pg_values(["'3.9'::int"])[0] is _PG_ERR
    sq2 = transpile("SELECT '3.9'::int AS v", "postgres")
    with pytest.raises(Exception):
        spark.sql(sq2).collect()
    # pg double-precision → int rounds half-EVEN (rint) — statically
    # FLOAT-TYPED castee chains (::float8/::float4/CAST AS DOUBLE/
    # random()) now wrap in bround() (Spark's half-even) and are
    # FAITHFUL; the residual divergence is float-typed COLUMNS, which
    # are statically invisible and keep the half-away round() wrap.
    assert _pg_values(["2.5::float8::int"])[0] == 2
    sq3 = transpile("SELECT 2.5::float8::int AS v", "postgres")
    assert "bround" in sq3
    assert spark.sql(sq3).collect()[0][0] == 2
    # string_agg(DISTINCT s, sep) / any aggregate WITHOUT an ORDER BY:
    # output order is UNSPECIFIED on BOTH engines (pg's DISTINCT sort
    # is an implementation detail that happens to sort ascending; Spark
    # listagg DISTINCT follows encounter order) — NOT a bug, but it
    # WILL flip value hashes for users who relied on pg's accidental
    # ordering. The fix is an explicit ORDER BY, which the transpiler
    # maps to listagg(...) WITHIN GROUP (ORDER BY ...) exactly.
    pg_v = _pg_values(
        ["(SELECT string_agg(DISTINCT s, ',') FROM "
         "(VALUES ('b'),('a'),('b')) t(s))"]
    )[0]
    assert sorted(pg_v.split(",")) == ["a", "b"]  # content-equal only
    sq4 = transpile(
        "SELECT string_agg(DISTINCT s, ',') AS v FROM "
        "(SELECT 'b' AS s UNION ALL SELECT 'a' UNION ALL SELECT 'b')",
        "postgres",
    )
    sv = spark.sql(sq4).collect()[0][0]
    assert sorted(sv.split(",")) == ["a", "b"]  # order pinned as free
    # WITH an explicit ORDER BY both engines agree exactly:
    pg_o = _pg_values(
        ["(SELECT string_agg(DISTINCT s, ',' ORDER BY s) FROM "
         "(VALUES ('b'),('a'),('b')) t(s))"]
    )[0]
    sq5 = transpile(
        "SELECT string_agg(DISTINCT s, ',' ORDER BY s) AS v FROM "
        "(SELECT 'b' AS s UNION ALL SELECT 'a' UNION ALL SELECT 'b')",
        "postgres",
    )
    assert spark.sql(sq5).collect()[0][0] == pg_o == "a,b"
    # IN (SELECT ...) with a NULL in the subquery and no match:
    # pg yields NULL, Spark yields false — IN PROJECTION CONTEXT ONLY
    # (in WHERE both filter the row identically, covered by corpus
    # templates). This is Spark's own IN-subquery behavior, hit
    # equally by pass-through `x IN (SELECT ...)` and by the
    # `= ANY(SELECT ...)` → IN rewrite, so the rewrite adds no new
    # divergence; a faithful NULL would need restructuring the
    # subquery, which a textual transpiler can't do safely.
    assert _pg_values(
        ["3 = ANY(SELECT v FROM (VALUES (1),(NULL)) t(v))"]
    )[0] is None
    sq6 = transpile(
        "SELECT 3 = ANY(SELECT v FROM (VALUES (1),(NULL)) t(v)) AS v",
        "postgres",
    )
    assert " IN" in sq6
    assert spark.sql(sq6).collect()[0][0] is False  # pinned: pg NULL
    # Non-ASCII case mapping is LOCALE-dependent: glibc (pg's default
    # provider) uppercases ß to itself; Spark's ICU full case mapping
    # expands it to SS. Neither is wrong — pg with an ICU collation
    # gives SS too — so the divergence is pinned, not rewritten.
    assert _pg_values(["upper('straße')"])[0] == "STRAßE"
    sq7 = transpile("SELECT upper('straße') AS v", "postgres")
    assert spark.sql(sq7).collect()[0][0] == "STRASSE"  # pinned
    # initcap word boundaries: pg capitalizes after ANY non-alnum
    # ("o'neil-x" → "O'Neil-X"); Spark splits on whitespace only.
    # Round 9: the handler rebuilds per-char (uppercase where the
    # predecessor is not \p{L}\p{Nd}), so this is now FAITHFUL —
    # previously a pinned divergence.
    assert _pg_values(["initcap('o''neil ab')"])[0] == "O'Neil Ab"
    sq8 = transpile("SELECT initcap('o''neil ab') AS v", "postgres")
    assert spark.sql(sq8).collect()[0][0] == "O'Neil Ab"
    # to_timestamp(text, fmt) returns TIMESTAMPTZ in pg, whose ::text
    # rendering carries the session-zone offset ('...00+00'); Spark's
    # zone-less text form drops it. The INSTANT is identical (every
    # comparison/arithmetic template agrees); only the terminal text
    # form differs — pinned (zone rendering is session-config, not
    # value, state).
    pg_tt = _pg_values(
        ["to_timestamp('2024-02-29 10:30', 'YYYY-MM-DD HH24:MI')::text"]
    )[0]
    assert pg_tt.startswith("2024-02-29 10:30:00")
    sq9 = transpile(
        "SELECT to_timestamp('2024-02-29 10:30', "
        "'YYYY-MM-DD HH24:MI')::text AS v", "postgres")
    assert spark.sql(sq9).collect()[0][0] == "2024-02-29 10:30:00"
