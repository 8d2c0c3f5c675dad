"""Deterministic differential enumeration: composed duckdb expressions
evaluated natively in DuckDB and through transpile() on Spark.

Where tests/test_dialect_edges.py pins hand-picked edges, this module
ENUMERATES compositions — operators nested inside other operators'
operands — to catch interaction bugs between the rewrites (divisor
nullif wraps around subscripts, power() over substr results, list
handlers inside arithmetic, ...). The corpus is a fixed cross-product
(no randomness — failures reproduce byte-identically), filtered to
expressions DuckDB itself accepts; expressions where DuckDB raises are
skipped (Spark may be loud there too, in any form).

Comparison matches the driver's canonicalization spirit: NULL-equality,
float tolerance, arrays as multisets. Expressions are batched ~40 per
SELECT so the whole module is a handful of Spark round-trips.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from sqlmesh_spark.core.transpile import TranspileError, transpile

# atoms by type
INTS = ["3", "0", "-2"]
FLOATS = ["2.5", "-0.5"]
STRINGS = ["'ab|cd'", "''"]
LISTS = ["[1,2,3]", "[1,NULL]"]
ANY_NUM = INTS + FLOATS + ["NULL"]

TEMPLATES: list[str] = []

# numeric operator lattice: each operator with every numeric atom pair,
# including one nested level
NUM_OPS = ["{a} / {b}", "{a} % {b}", "{a} // {b}", "{a} ^ {b}", "{a} + {b}"]
for op in NUM_OPS:
    for a in ANY_NUM:
        for b in ANY_NUM:
            if "//" in op and (a in FLOATS or b in FLOATS):
                # duckdb float // is plain float division; the emitted
                # DIV is the reference-matching (SQLGlot IntDiv) mapping
                # — pinned as a documented divergence below, excluded
                # from the value-parity corpus
                continue
            TEMPLATES.append(op.format(a=a, b=b))
# nested: op over op (fixed inner pair to bound the count). // is
# excluded from nesting: ^ and / produce DOUBLE operands, where duckdb
# // degrades to plain float division and the emitted DIV is loud
# (BIGINT-only) — pinned below.
NESTABLE = [op for op in NUM_OPS if "//" not in op]
for outer in NESTABLE:
    for inner in NESTABLE:
        TEMPLATES.append(outer.format(a=f"({inner.format(a='3', b='-2')})", b="2"))
        TEMPLATES.append(outer.format(a="2", b=f"({inner.format(a='7', b='2')})"))

# string/list functions with edge atoms and one nesting level
for s in STRINGS:
    for i in INTS:
        TEMPLATES += [
            f"substr({s}, {i}, 2)",
            f"left({s}, {i})",
            f"right({s}, {i})",
            f"split_part({s}, '|', {i if i != '0' else '1'})",
        ]
for lst in LISTS:
    for i in INTS + ["9"]:
        TEMPLATES += [
            f"({lst})[{i}]",
            f"list_extract({lst}, {i})",
        ]
    TEMPLATES += [
        f"list_distinct({lst})",
        f"array_to_string({lst}, ',')",
        f"array_length({lst})",
        f"list_sort({lst})",
        f"list_concat({lst}, NULL)",
    ]
# literal seams: backslashes, doubled quotes, regex-special separator
# characters — exercised through the literal-doubling pass, the
# regex-escape path (string_to_array/split_part), and plain passthrough
LIT_STRINGS = [
    r"'a\b'",          # backslash (standard literal: ordinary char)
    "'it''s'",          # doubled single quote
    "'a.b.c'",          # regex-special '.' as data
    "'10%'",            # percent (LIKE-special)
    "'x|y|z'",
    "'[br]acket'",
]
for lit in LIT_STRINGS:
    TEMPLATES += [
        f"length({lit})",
        f"upper({lit})",
        f"reverse({lit})",
        f"{lit} || '!'",
        f"replace({lit}, 'a', '_')",
        f"strpos({lit}, 'b')",
        f"substr({lit}, 2, 3)",
        f"left({lit}, 3)",
        f"contains({lit}, '.')",
    ]
for sep in ["'.'", "'|'", "'%'", r"'\'"]:
    TEMPLATES += [
        f"string_to_array('a.b|c%d', {sep})",
        f"split_part('a.b|c%d', {sep}, 2)",
        f"array_to_string(['x','y'], {sep})",
    ]
TEMPLATES += [
    r"split_part('a\b\c', '\', 2)",
    "string_to_array('', '.')",
    "regexp_replace('aaa', 'a', 'b', 'g')",
    "regexp_replace('a.a', '[.]', 'x', 'g')",
    "regexp_extract('ab12cd', '[0-9]+')",
    "regexp_matches('hello', 'ell')",
    "regexp_matches('a.b', '[.]')",
    "regexp_matches('ab12', '[[:digit:]]+')",
    "regexp_extract('ab12', '[[:digit:]]+')",
    "regexp_matches(':', '[[:digit:]]')",
    "regexp_replace('a b  c', '[[:space:]]+', '-', 'g')",
    "'10%' LIKE '10!%' ESCAPE '!'",
    "'abc' LIKE 'a%'",
    r"'a_c' LIKE 'a\_c'",
    "md5('it''s')",
    r"concat('a''b', '\', NULL)",
]

# row-constructor comparisons / IN: duckdb matches pg's field-wise
# three-valued logic ((1,NULL) = (1,2) is NULL) where Spark's STRUCT
# comparison treats NULL as a smallest value — expanded to the
# standard AND/OR / lexicographic forms with struct-bound elements
TEMPLATES += [
    "(1,2) < (1,3)", "(1,2) >= (1,2)", "(2,0) > (1,9)",
    "(1,NULL) = (1,2)", "(1,NULL) < (2,0)", "(NULL,1) = (NULL,1)",
    "(1,NULL) < (1,0)", "(1,2) <> (1,3)", "(1,NULL) <> (2,2)",
    "(1,2,3) < (1,2,4)", "(1,2) IN ((1,2),(3,4))",
    "(1,NULL) IN ((1,2))", "(1,NULL) NOT IN ((1,2))",
    "(1,2) NOT IN ((3,4))",
]

# aggregates as scalar subqueries (NULL handling, sample-vs-population
# statistics, quantiles, keep-NULL list aggs)
V = "FROM (VALUES (1),(NULL),(2),(2)) t(v)"
TEMPLATES += [
    f"(SELECT sum(v) {V})",
    f"(SELECT avg(v) {V})",
    f"(SELECT count(v) {V})",
    f"(SELECT count(*) {V})",
    f"(SELECT count(DISTINCT v) {V})",
    f"(SELECT bool_and(v > 0) {V})",
    f"(SELECT bool_or(v > 1) {V})",
    f"(SELECT bit_xor(v) {V})",
    f"(SELECT median(v) {V})",
    f"(SELECT mode(v) {V})",
    f"(SELECT var_samp(v) {V})",
    f"(SELECT stddev_pop(v) {V})",
    f"(SELECT arbitrary(v) FROM (VALUES (7)) t(v))",
    f"(SELECT any_value(v) FROM (VALUES (7)) t(v))",
    f"(SELECT string_agg(s, ',') FROM (VALUES ('b'),(NULL),('a')) t(s))",
    f"(SELECT quantile_cont(v, 0.25) FROM (VALUES (1),(2),(3),(4)) t(v))",
    f"(SELECT quantile_disc(v, 0.5) FROM (VALUES (1),(2),(3),(4)) t(v))",
    f"(SELECT quantile(v, 0.25) FROM (VALUES (1),(2),(3),(4)) t(v))",
    f"(SELECT skewness(v) FROM (VALUES (1),(2),(5),(9),(3),(0)) t(v))",
    f"(SELECT kurtosis(v) FROM (VALUES (1),(2),(5),(9),(3),(0)) t(v))",
    f"(SELECT skewness(v) FROM (VALUES (1),(2)) t(v))",
    f"(SELECT kurtosis(v) FROM (VALUES (1),(2),(5)) t(v))",
    f"(SELECT sum(v) FILTER (WHERE v > 1) {V})",
    f"(SELECT sum(v) FROM (VALUES (1)) t(v) WHERE FALSE)",
    f"(SELECT max_by(s, v) FROM (VALUES (1, 'a'),(2, 'b')) t(v, s))",
    f"(SELECT arg_max(s, v) FROM (VALUES (1, 'a'),(2, 'b')) t(v, s))",
    f"(SELECT corr(a, b) FROM (VALUES (1,2),(3,4),(5,7)) t(a, b))",
    f"(SELECT fsum(v) FROM (VALUES (1.5),(2.5)) t(v))",
    # round-11 statistical-aggregate tier (duckdb_fns): kurtosis_pop
    # IS Spark's population kurtosis; sem = stddev_pop/sqrt(n);
    # product skips NULLs, keeps the sign through zeros, NULL on
    # empty; the Kahan family is plain sum/avg over DOUBLE
    f"(SELECT kurtosis_pop(v) FROM (VALUES (1),(2),(5),(9),(3),(0)) t(v))",
    f"(SELECT sem(v) FROM (VALUES (1.0),(2.0),(3.0),(10.0)) t(v))",
    f"(SELECT sem(v) FROM (VALUES (5),(NULL),(3)) t(v))",
    f"(SELECT sem(v) FROM (VALUES (3.0)) t(v))",
    f"(SELECT product(v) FROM (VALUES (2),(3),(4)) t(v))",
    f"(SELECT product(v) FROM (VALUES (2.5),(-3.0),(4.0)) t(v))",
    f"(SELECT product(v) FROM (VALUES (2.5),(0.0),(-4.0)) t(v))",
    f"(SELECT product(v) FROM (VALUES (2.5),(NULL)) t(v))",
    f"(SELECT product(v) FROM (VALUES (NULL::int)) t(v))",
    f"(SELECT kahan_sum(v) FROM (VALUES (1.5),(2.25),(NULL)) t(v))",
    f"(SELECT sumkahan(v) FROM (VALUES (1),(2)) t(v))",
    f"(SELECT favg(v) FROM (VALUES (1.5),(2.25)) t(v))",
    # wave 60: list_count non-NULL counting, to_timestamp epoch
    # seconds (fraction kept), ord ≡ unicode (empty → -1)
    "list_count([1, NULL, 3])",
    "list_count([])",
    # to_timestamp returns TIMESTAMPTZ in duck (the local _norm keeps
    # tzinfo, unlike the probe harness) — compare the INSTANT
    "to_timestamp(1700000000) = timestamp '2023-11-14 22:13:20'",
    "to_timestamp(1700000000.25) - to_timestamp(1700000000) = interval '250 milliseconds'",
    "ord('A')",
    "ord('€')",
    "ord('')",
    "ord(NULL)",
    # wave 64 compositions: epoch keeps FRACTIONAL seconds; the stat
    # tier absorbs FILTER via the IF-NULL argument fold
    "epoch(to_timestamp(1700000000.25)) = 1700000000.25",
    "epoch(timestamp '2024-01-01 00:00:00.5') = 1704067200.5",
    "(SELECT product(v) FILTER (WHERE v > 0) FROM (VALUES (2.0),(-3.0),(4.0)) t(v))",
    "(SELECT sem(v) FILTER (WHERE v < 9) FROM (VALUES (1.0),(2.0),(99.0)) t(v))",
    "(SELECT kurtosis_pop(v) FILTER (WHERE v < 90) FROM (VALUES (1),(2),(5),(9),(3),(0),(99)) t(v))",
    "(SELECT fsum(v) FILTER (WHERE v > 1) FROM (VALUES (1),(2),(3)) t(v))",
    f"(SELECT skewness(v) FILTER (WHERE v < 9) FROM (VALUES (1),(2),(5),(9)) t(v))",
    f"(SELECT kurtosis(v) FILTER (WHERE v < 99) FROM (VALUES (1),(2),(5),(9)) t(v))",
    # duckdb default NULL placement is LAST in BOTH directions
    "(SELECT v FROM (VALUES (1),(NULL),(2)) t(v) ORDER BY v LIMIT 1)",
    "(SELECT v FROM (VALUES (1),(NULL),(2)) t(v) ORDER BY v DESC LIMIT 1)",
    "(SELECT date_part('decade', make_date(-4, 1, 1)))",
    "(SELECT date_part('century', make_date(-4, 1, 1)))",
    "(SELECT date_part('millennium', make_date(-4, 1, 1)))",
]

# date/time fields, complete-vs-boundary diffs, strftime conversions
TS = "TIMESTAMP '2024-03-09 15:04:05.25'"
TEMPLATES += [
    *(f"date_part('{f}', {TS})" for f in (
        "year", "month", "day", "hour", "minute", "week", "quarter",
        "doy", "dow", "isodow", "isoyear", "decade", "century",
        "millennium", "yearweek", "dayofmonth", "dayofyear",
        "second", "milliseconds", "microseconds", "epoch")),
    f"date_diff('month', DATE '2024-01-31', DATE '2024-02-01')",
    f"date_diff('year', DATE '2023-12-31', DATE '2024-01-01')",
    f"date_diff('week', DATE '2024-01-01', DATE '2024-01-08')",
    # month-family date_sub is LOUD (duckdb clamps month ends; no
    # faithful Spark rewrite) — fixed-width units are exact:
    f"date_sub('day', DATE '2024-01-31', DATE '2024-03-01')",
    f"date_sub('week', DATE '2024-01-01', DATE '2024-01-15')",
    f"datesub('hour', TIMESTAMP '2024-01-01 10:59:00', TIMESTAMP '2024-01-01 11:59:00')",
    f"strftime({TS}, '%d/%m/%Y %H:%M:%S')",
    f"strftime({TS}, '%y-%j %I %p')",
    f"strftime({TS}, '%A %B %a %b')",
    f"strftime({TS}, '%-d/%-m')",
    f"strftime({TS}, '%x %X')",
    f"strftime({TS}, '%f %g')",
    "epoch_ms(1500)",
    "epoch_us(1500000)",
    f"epoch_ms({TS})",
    "make_date(2024, 2, 29)",
    "CAST(last_day(DATE '2024-02-05') AS STRING)",
    f"monthname(DATE '2024-01-31')",
    f"dayname(DATE '2024-01-31')",
]

# JSON extraction (->> maps exactly to get_json_object; -> only
# mid-chain; lambdas must never be touched)
_J = """'{"a": {"b": 2}, "s": "x", "l": [10, 20]}'"""
TEMPLATES += [
    f"{_J} ->> 'a'",
    f"{_J} ->> '$.a.b'",
    f"{_J} ->> 's'",
    f"{_J} ->> 'missing'",
    f"{_J} -> 'a' ->> 'b'",
    f"({_J} -> 'a') ->> 'b'",
    "('[10,20]') ->> 1",
    "('[10,20]') ->> 9",
    # round 11 (wave 46): duck 1.x has NO from-end negative index
    # (->> -1 is NULL, pinned live) — static $[-N] is NULL in Spark
    "('[10,20]') ->> -1",
    f"{_J} ->> -2",
    # round 11 (wave 47): json_keys ([] off-objects, bare-key paths),
    # json_valid via the get_json_object('$') echo, to_json/json_quote
    # over scalars through the one-element-array wrap
    "json_keys('{\"a\":1,\"b\":2}')",
    "json_keys('{\"a\": {\"b\": 1}}', '$.a')",
    "json_keys('{\"a\": {\"b\": 1}}', 'a')",
    "json_keys('[1,2]')",
    "json_keys(NULL)",
    "json_valid('{\"a\":}')",
    "json_valid('null')",
    "json_valid('  [1, 2] ')",
    "json_valid(NULL)",
    "to_json('s')",
    "to_json([1,2,3])",
    "to_json({'a': NULL})",
    "to_json(NULL)",
    "json_quote('he said \"hi\"')",
    "json_merge_patch('{\"a\":1}', '{\"b\":2}')",   # loud
    "json_type('{\"a\":1}')",                      # loud
    "from_json('{\"a\":1}', '{\"a\":\"INTEGER\"}')",  # loud (duck schema)
    # round 11 (wave 50): duck fmt-'{}' format() → printf rewrite
    # (0-based positional reorder, {{}} escapes, {:Ns} left-align,
    # %-literal escaping), printf %f decimal→DOUBLE cast, %g loud
    # (C shortest-form vs Java precision digits), unicode() → ascii
    # with the empty-string -1 seam
    "format('{} and {}', 1, 'a')",
    "format('{:.2f}', 3.14159)",
    "format('{0}/{1}/{0}', 'a', 'b')",
    "format('{{literal}} {}', 9)",
    "format('100%: {}', 1)",
    "format('[{:10d}]', 42)",
    "format('[{:10s}]', 'x')",
    "format('{}', NULL)",
    "format('{}', 1.50)",        # loud (float-literal rendering seam)
    "format('{:>10}', 'x')",     # loud (fill/align)
    "printf('%5.2f', 3.14159)",
    "printf('%.3e', 12345.678)",
    "printf('%g', 0.00001)",     # loud (C vs Java %g)
    "unicode('λ')",
    "unicode('')",
    "unicode(NULL)",
    # round 11 (wave 55): duck match operators — binary ~ is regexp
    # FULL match (NOT pg's partial), ~~/!~~ LIKE aliases, ~~~/GLOB
    # case-sensitive glob (%/_ literal, [!..] negation), SIMILAR TO
    # takes a PLAIN regex; unary bitwise ~ untouched
    "('abc' ~ 'b')::int",
    "('abc' ~ 'a.*')::int",
    "('abc' !~ 'b')::int",
    "('abc' ~~ 'a%')::int",
    "('abc' ~~~ 'a*')::int",
    "('a.c' GLOB 'a?c')::int",
    "('ab' GLOB 'a[!x]')::int",
    "('a%c' GLOB 'a%c')::int",
    "('abc' GLOB 'a%')::int",
    "('abc' SIMILAR TO 'a%')::int",
    "('a%' SIMILAR TO 'a%')::int",
    "('abc' NOT SIMILAR TO 'x.*')::int",
    "~5",
    "5 & ~3",
    # duck // is PLAIN division for any non-integer operand (pinned:
    # 8.0 // 3 = 2.667, no flooring — the blanket DIV was silently
    # integral); postfix ! factorial
    "7 // 2", "-7 // 2", "7.9 // 2", "8.0 // 3", "7 // 2.0",
    "5!", "(3 + 2)!",
    # the duck @ family (standard grammar rejected the char outright):
    # @>/<@ list containment with NULL-ELEMENT matching (<=> — unlike
    # pg's strict array @>), ^@ starts-with, unary @ abs; ~~*/!~~*
    # ILIKE aliases
    "('ABC' ~~* 'a%')::int",
    "('ABC' !~~* 'a%')::int",
    "([1,2,3] @> [2])::int",
    "([1,NULL] @> [NULL])::int",
    "([1,2] @> [])::int",
    "([1] @> [1,9])::int",
    "([2] <@ [1,2,3])::int",
    "('abc' ^@ 'ab')::int",
    "('abc' ^@ 'bc')::int",
    "@ -5.5",
    "@(-5)",
    # round 11 (wave 49): histogram() — key-sorted value→count MAP,
    # NULLs skipped, NULL on empty, duck-name-safe emission spellings
    "(SELECT histogram(x) FROM (VALUES (2),(1),(1),(NULL)) t(x))",
    "(SELECT histogram(x) FROM (VALUES ('b'),('a'),('a')) t(x))",
    "(SELECT histogram(x) FROM (SELECT 1 AS x WHERE false) t)",
    "(SELECT histogram(x % 3) FROM (VALUES (1),(2),(3),(4),(5),(6)) t(x))",
    f"json_extract_string({_J}, '$.a.b')",
    f"json_extract_path_text({_J}, 'a')",
    f"json_array_length({_J}, '$.l')",
    "json_array_length('[1,2]')",
    f"list_transform([1,2], x -> x + 1)",
    f"list_filter([1,2,3], x -> x > 1)",
    # round 11 lambda tier (duckdb_hofs.py): duck's 2-param lambda
    # index is 1-BASED (Spark 0-based) — the round-10 silent-wrong;
    # list_reduce seeds with the first element; list_aggregate
    # dispatches NULL-skipping aggregates ('first'/'last' POSITIONAL);
    # list_sort direction/null-order enum strings
    "list_transform([10,20,30], (x, i) -> x + i)",
    "list_filter([1,2,3,4], (x, i) -> i > 2)",
    "filter([1,2,3,4], (x, i) -> i > 2)",
    "list_transform([5,6], (v, n) -> v * n)",
    "list_filter([5,6,7,8], (e, idx) -> idx % 2 = 1)",
    "list_transform([[1,2],[3]], (x,i) -> list_transform(x, y -> y + i))",
    "list_reduce([1,2,3,4], (a, b) -> a + b)",
    "list_reduce([7], (a, b) -> a + b)",
    "reduce([1,2,6], (a,b) -> a * b)",
    "list_aggregate([1,2,NULL], 'sum')",
    "list_aggregate([1,2], 'avg')",
    "list_aggregate([1,NULL,2], 'count')",
    "list_aggregate(['a',NULL,'b'], 'string_agg')",
    "list_aggregate(['a','b'], 'string_agg', '-')",
    "list_aggregate([NULL, 3], 'first')",
    "list_aggregate([2, NULL], 'last')",
    "list_sum([1,2,NULL])",
    "list_avg([1,2])",
    "list_sort([3,1,NULL,2], 'DESC', 'NULLS FIRST')",
    # round 11: underscore digit-group literals, try_strptime,
    # FROM-first scalar subqueries, interval-literal widening
    "1_000_000", "2_5.5_0",
    "try_strptime('junk', '%Y-%m-%d')",
    "try_strptime('2024-01-15', '%Y-%m-%d')",
    "(from (values (1),(2),(3)) t(a) select max(a))",
    "timestamp '2024-01-01 00:00:00' + interval '1 year 3 days'",
    "timestamp '2024-01-01 00:00:00' + '1.5 days'::interval",
    "date '2024-01-31' + interval '1 month'",
    "list_sort([3,1,NULL], 'ASC', 'NULLS FIRST')",
    "list_sort([3,1,NULL,2], 'DESC')",
    "list_reverse_sort([3,1,NULL], 'NULLS FIRST')",
    # dotted keys are LITERAL in arrows (bracket-form JsonPath);
    # '/'-rooted JSON Pointers; non-array json_array_length returns 0
    "('{\"a.b\": 1, \"a\": {\"b\": 2}}') ->> 'a.b'",
    "('{\"a\": {\"b\": 2}}') ->> '/a/b'",
    "json_extract_string('{\"a.b\": 1}', 'a.b')",
    "json_array_length('{\"s\":\"x\"}', '$.s')",
    "json_array_length('{\"s\":1}')",
]

# composed JSON block (round-7): nested arrows over objects / arrays /
# string-scalar hops / NULL, pointer-with-digit-segment over arrays
# (the round-6 silent-wrong: duckdb '/l/0' indexes the array where
# Spark's $['l']['0'] is key-only — now loud, but pre-fix this entry
# value-diverged and would have caught it), number-index chains,
# ->>-onto-text re-parse chains, and json functions inside scalar
# compositions. The string-scalar doc: hopping INTO a scalar must stop
# with NULL (per-hop nesting would unquote the scalar and keep going).
_JS = """'{"a": "{\\"b\\": 1}", "n": 7}'"""  # a is a JSON STRING scalar
_JD = """'{"a":{"b":{"c":[5,6]}}, "l":[{"k":1},{"k":2}]}'"""
TEMPLATES += [
    f"{_J} ->> '/l/0'",          # pointer digit segment (loud post-fix)
    f"{_J} ->> '/a/b'",
    f"{_J} ->> '/missing/x'",
    f"{_J} -> 'l' ->> 0",        # chain ending in a number index
    f"{_J} -> 'l' ->> 9",        # OOB index through a chain
    f"{_JD} -> 'a' -> 'b' ->> 'c'",   # 3-hop literal chain
    f"{_JD} -> 'l' -> 1 ->> 'k'",     # object/array/index mix
    f"{_JS} -> 'a' ->> 'b'",     # string-scalar hop: NULL, not re-parse
    f"{_JS} ->> 'a' ->> 'b'",    # text output re-parsed (duckdb cast)
    f"{_JS} ->> 'n' ->> 'x'",    # re-parse of a non-object scalar
    f"{_J} ->> 'a' ->> 'b'",     # object text re-parsed
    f"{_J} -> 'missing' ->> 'b'",
    f"(NULL::VARCHAR) ->> 'a'",
    "('not json') ->> 'a'",
    "('[[1,2],[3]]') -> 0 ->> 1",
    f"json_extract_string({_JD}, '$.a.b.c[1]')",
    f"json_extract_string({_JD}, '/a/b')",
    f"json_array_length({_JD}, '$.a.b.c')",
    f"json_array_length(({_JD}) ->> 'l')",
    f"length({_J} ->> 's')",
    f"coalesce({_J} ->> 'missing', 'dflt')",
    f"({_J} ->> '$.a.b') + 1",
    f"CAST({_J} ->> '$.l[1]' AS INT) % 3",
    f"concat({_J} ->> 's', {_JS} ->> 'n')",
]

# numeric→int casts (round 7): duckdb CAST/:: of fractional numerics
# ROUNDS half-away (DECIMAL source) where Spark truncates — the
# round() wrap; boolean/int identities stay unwrapped; TRY_CAST is the
# pinned tolerant divergence (see test_pinned_cast_rounding_divergence)
TEMPLATES += [
    "3.99::int", "(-3.99)::int", "2.5::int", "(-2.5)::int", "1.5::int",
    "CAST(2.7 AS INT)", "CAST(-2.7 AS BIGINT)", "'3.9'::int",
    "3.99::bigint", "9007199254740993::bigint",
    "(1 > 0)::int", "CAST(2 < 1 AS INT)", "(TRUE)::int",
    "round(2.504, 2)::int",
    "(CASE WHEN 1 > 0 THEN 1.5 ELSE 2.5 END)::int",
    "3.99::decimal::int",
]

# chr is the Unicode CODE POINT in duckdb (and pg); Spark chr wraps at
# 256 — rewritten to format_string('%c', n). duckdb to_hex is
# uppercase 64-bit = exactly Spark hex().
TEMPLATES += [
    "chr(955)", "chr(65)", "chr(128512)", "ascii(chr(955))",
    "chr(65) || chr(955)",
    "to_hex(255)", "to_hex(-1)", "to_hex(0)",
]

# round-8 duckdb probe batch: map(keys, values) construction (Spark's
# map() is variadic — the 2-list call silently builds a one-entry
# map), try_cast string→int rounding, in-aggregate ORDER BY,
# struct_pack / {'k': v} / MAP {k: v} literals, list helpers,
# range() exclusive stop, time_bucket, isinf/isfinite, xor, to_base,
# epoch_ns, yearweek, regexp_full_match, renames
TEMPLATES += [
    "map([1,2],['a','b'])[2]", "map(['k'],[7])['k']",
    "map_keys(map([1,2],['a','b']))",
    "try_cast('3.9' AS INT)", "try_cast('2.5' AS INT)",
    "try_cast('-2.5' AS INT)", "try_cast('x' AS INT)",
    "try_cast('9007199254740993' AS BIGINT)",
    "try_cast(2.5 AS INT)", "try_cast('12' AS INT)",
    "(SELECT sum(v ORDER BY v) FROM (VALUES (1),(2)) t(v))",
    "(SELECT count(v ORDER BY v DESC) FROM (VALUES (1),(2)) t(v))",
    "(SELECT first(v ORDER BY v) FROM (VALUES (2),(1),(3)) t(v))",
    "(SELECT first(v ORDER BY v DESC) FROM (VALUES (2),(1),(3)) t(v))",
    "(SELECT last(v ORDER BY v) FROM (VALUES (2),(1),(3)) t(v))",
    "(SELECT last(v ORDER BY v DESC) FROM (VALUES (2),(3),(1)) t(v))",
    "(SELECT first(v ORDER BY v NULLS LAST) FROM (VALUES (2),(1),(3)) t(v))",
    "(SELECT first(v ORDER BY v DESC NULLS LAST) FROM (VALUES (2),(1),(3)) t(v))",
    "(SELECT last(v ORDER BY v NULLS LAST) FROM (VALUES (2),(1),(3)) t(v))",
    "(SELECT string_agg(v, ',' ORDER BY v) FROM (VALUES ('b'),('a')) t(v))",
    "struct_pack(a := 1, b := 'x').a", "struct_pack(a := 1, b := 'x').b",
    "{'a': 1, 'b': 2}.b", "{'a': {'c': 7}}.a.c",
    "struct_extract({'a': 7}, 'a')",
    "MAP {1: 'a', 2: 'b'}[2]", "MAP {'k': 42}['k']",
    "list_reverse_sort([1,3,NULL,2])",
    "list_unique([1,2,2,NULL])", "list_any_value([NULL, 2, 3])",
    "array_pop_back([1,2,3])", "array_pop_front([1,2,3])",
    "list_slice([1,2,3,4], 2, 3)", "list_slice([1,2,3,4], -2, -1)",
    "list_slice([1,2,3,4], 2, 99)",
    "list_max([1,9,2])", "list_min([1,9,2])", "array_reverse([1,2,3])",
    "range(3)", "range(1, 4)", "range(5, 1, -2)", "range(1, 0)",
    "(SELECT count(*) FROM range(3) t(i))",
    "time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-03-09 15:04:05')::text",
    "time_bucket(INTERVAL '1 hour', TIMESTAMP '2024-03-09 15:04:05', TIMESTAMP '2024-01-01 00:30:00')::text",
    "isinf('inf'::double)", "isinf(1.5)", "isfinite(1.5)",
    "isfinite('nan'::double)", "isfinite(NULL::double) IS NULL",
    "xor(5, 3)", "to_base(255, 16)", "to_base(7, 2, 8)",
    "epoch_ns(TIMESTAMP '2024-01-01 00:00:01')",
    "week(DATE '2024-01-04')", "yearweek(DATE '2024-01-04')",
    "regexp_full_match('ab', '[a-z]+')", "regexp_full_match('ab', '[a-z]')",
    # round 11: the whole-call duck regexp tier dispatches BEFORE the
    # shared pattern-literal block (overlapping edits corrupted the
    # splice — regexp_full_match('[[:digit:]]+') ate the trailing
    # clause); named-group regexp_extract → named_struct; string
    # single-subscript → guarded substring FROM/FOR
    "regexp_full_match('12', '[[:digit:]]+')",
    "regexp_matches('Ab', '[[:alpha:]]b', 'i')",
    "regexp_extract('ab-12', '([a-z]+)-([0-9]+)', ['l', 'r'])",
    "regexp_extract('ab', '(a)(b)', ['x'])",
    "regexp_extract(NULL::varchar, '(a)(b)', ['x', 'y'])",
    "('hello')[2]", "('hello')[-1]", "('hello')[0]", "('hello')[99]",
    "'hello'[2]", "'hello'[0]", "'hello'[1+1]",
    "add(2, 3)", "subtract(5, 2)", "multiply(3, 4)",
    "editdist3('kitten', 'sitting')",
    "from_base64('YWJj') = 'abc'::blob", "to_base64('abc'::blob)",
    "current_localtimestamp() >= TIMESTAMP '2020-01-01 00:00:00'",
    "get_current_timestamp() IS NOT NULL",
    # duck probe wave 2: list vector folds (zip_with + aggregate),
    # has_any/has_all NULL semantics (NULL elements never match;
    # has_all ignores NULL needles), resize/select/where, field
    # functions, intersect (order UNSPECIFIED on both — compared
    # through list_sort)
    "list_dot_product([1.0,2.0],[3.0,4.0])",
    "list_inner_product([1.0,2.0],[3.0,4.0])",
    "list_distance([0.0,0.0],[3.0,4.0])",
    "list_cosine_similarity([1.0,0.0],[1.0,1.0])",
    "list_has_any([1,2],[2,9])", "list_has_any([1,NULL],[NULL])",
    "list_has_all([1,2,3],[2,3])", "list_has_all([1,2,3],[2,NULL])",
    # (a bare [] literal is an UNTYPED array — Spark rejects the
    # lambda's array_contains at analysis; typed empties work)
    "list_has_all([1,2], []::int[])", "list_has_any([1],[2,NULL])",
    "list_resize([1,2],4)", "list_resize([1,2,3],2)",
    "list_select([10,20,30],[1,3])", "list_select([10],[5])",
    "list_where([10,20,30],[true,false,true])",
    # UNSORTED on purpose: duckdb returns second-arg first-occurrence
    # order ([3,1]∩[1,3] = [1,3]), which the handler reproduces — the
    # old list_sort wrap masked a rename's order divergence
    "list_intersect([1,2,3],[2,3,4])",
    "list_intersect([3,1],[1,3])",
    "list_intersect([1,1,2],[2,2,1,1])",
    "list_intersect([1,NULL],[NULL,2])",
    "list_intersect([1,2], NULL::int[])",
    "list_intersect(NULL::int[], [1,2])",
    "array_intersect([3,1],[1,3])",
    # len() is list-length AND string-length in duckdb; statically-list
    # args rewrite to size()
    "len([1,2,3])", "len([[1,2],[3,4]])", "len('abc')",
    "len(string_split('a,b,c', ','))",
    "len(list_filter([1,2,3], x -> x > 1))",
    # regexp_matches options: 'i'/'s' inline as Java flags, 'c' is the
    # default; others are loud
    "regexp_matches('abc', 'A', 'i')",
    "regexp_matches('abc', 'A', 'c')",
    "regexp_matches('a' || chr(10) || 'b', 'a.b', 's')",
    "regexp_matches('a' || chr(10) || 'b', 'a.b', '')",
    # date ± INTERVAL promotes to TIMESTAMP in duckdb; date_trunc's
    # duck-only unit spellings normalize and decade/century/millennium
    # floor at the round number returning DATE (vs pg's xx01 epochs)
    "DATE '2024-01-31' + INTERVAL '1 month'",
    "DATE '2024-12-31' - INTERVAL '1 day'",
    "date_trunc('decade', DATE '2024-03-15')",
    "date_trunc('century', DATE '1999-03-15')",
    "date_trunc('century', DATE '2000-01-01')",
    "date_trunc('millennium', DATE '2024-03-15')",
    "date_trunc('days', DATE '2024-03-09')::date",
    "date_trunc('weeks', DATE '2024-03-09')::date",
    "date_trunc('yr', DATE '2024-03-09')::date",
    # printf NULL-propagation (duck: ANY NULL arg → NULL result);
    # from_hex → unhex
    "printf('%d-%s', 7, 'x')",
    "printf('%s-%s', 'a', NULL::varchar)",
    "printf('%s', coalesce(NULL::varchar, 'y'))",
    "from_hex('6162')::varchar",
    # duck decimal-literal rescale truncates toward zero (static
    # quantize); 0x/0b string-literal int casts fold; typed-literal
    # spellings re-spell to :: casts
    "1.25::numeric(5,1)",
    "(-1.29)::numeric(5,1)",
    "1.99::decimal(5,1)",
    "123.4567::decimal(18,3)",
    "'0x1A'::int",
    "'0b101'::bigint",
    "numeric '12.34'",
    "int4 '7' / int4 '2'",
    "bool 't'",
    # && list overlap (two adjacent & tokens), empty-separator
    # split_part (per-CHAR in duck), FOR-only keyword substring
    "[1,2] && [2,3]",
    "[1,2] && [3,4]",
    "[1,NULL] && [NULL,2]",
    "NULL::int[] && [1]",
    "5 & 3",
    "split_part('a|b|c', '', 2)",
    "split_part('abc', '', 9)",
    "substring('hello' for 2)",
    # duck JSON constructors render COMPACT (= Spark's to_json); NULL
    # elements kept, NULL on empty input, insertion order + duplicate
    # keys preserved
    "(SELECT json_group_array(x) FROM (VALUES (1),(2)) t(x))",
    "(SELECT json_group_array(x) FROM (VALUES ('a'),(NULL)) t(x))",
    "(SELECT json_group_array(x) FROM (SELECT 1 AS x WHERE false) t)",
    "(SELECT json_group_object(k, w) FROM (VALUES ('a',1),('b',2)) t(k,w))",
    "json_object('b', 2, 'a', 1)",
    "json_object('a', NULL)",
    "json_object()",
    "json_array(1, 'x', NULL)",
    "json_array()",
    "century(DATE '2001-01-01')", "decade(DATE '2024-01-01')",
    "apply([1,2], x -> x + 1)",
    # modern duck idioms: GROUP BY ALL / ORDER BY ALL are native
    # Spark 4 (the NULLS LAST annotation matches duck's default NULL
    # order); * REPLACE and BY NAME set-ops are loud
    "(SELECT sum(s) FROM (SELECT v % 2 AS k, sum(v) AS s FROM "
    "(VALUES (1),(2),(3)) t(v) GROUP BY ALL) q)",
    "(SELECT v FROM (VALUES (2),(NULL),(1)) t(v) ORDER BY ALL LIMIT 1)",
    "(SELECT count(*) FROM (SELECT * EXCLUDE (b) FROM "
    "(VALUES (1, 2)) t(a, b)) q)",
]

# compositions across families
TEMPLATES += [
    "substr('hello', 1 // 0, 3)",
    "substr('hello', 2 ^ 1, 2)",
    "left('hello', ([1,2])[5])",
    "([10,20,30])[1 + 1] / ([1,0])[2]",
    "([10,20,30])[2] ^ 2",
    "length(substr('hello', 0, 4)) % 3",
    "strpos(substr('ab|cd', 0, 4), '|') ^ 2",
    "list_extract([1,2,3], strpos('ab', 'b')) // 2",
    "concat(substr('abc', 0, 2), NULL, 1 // 0)",
    "coalesce(([1,2])[9], ([1,2])[0], ([1,2])[-1])",
    "trunc(7.5 / -2)",
    "abs(-7 // 2)",
    "round(2 ^ -2, 1)",
    "nullif(5 % 3, 2 // 1)",
    "greatest(1 // 0, 2, NULL)",
    "substr(concat('a', NULL, 'bc'), -2, 5)",
    "list_distinct([1, NULL, 1])[1]",
    "('x' || NULL) IS NULL",
    "length(array_to_string(list_sort([3,1,NULL]), '-'))",
]

# round-10: the duck MAP-access seam (round-9 verdict's one silent
# WRONG — duck element_at/map_extract return a LIST where Spark's
# element_at is scalar) and the map_concat last-wins/key-order/NULL
# contract; comparable now that _norm rebuilds duck's {'key': [...],
# 'value': [...]} client rendering
TEMPLATES += [
    "element_at(map {'a':1,'b':2}, 'a')",
    "element_at(map {'a':1}, 'z')",
    "element_at(map {'a':1}, NULL)",
    "element_at(NULL::map(varchar,int), 'a')",
    "map_extract(map {'a':1,'b':2}, 'b')",
    "map_extract(map([1,2],[1.5,2.5]), 2)",
    "map_concat(map {'a':1}, map {'a':2})",
    "map_concat(map {'a':1}, map {'b':2}, map {'a':9,'c':3})",
    "map_concat(map {'a':1}, NULL::map(varchar,int))",
    "map_concat(NULL::map(varchar,int), NULL::map(varchar,int))",
    "map_concat(map {'a':1}, map(['b'],[NULL::int]))",
    "cardinality(map_concat(map {'a':1}, map {'b':2}))",
    "map_keys(map_concat(map {'a':1}, map {'b':2}, map {'a':9,'c':3}))",
    "map_values(map_concat(map {'a':1}, map {'a':7}))",
    "CAST(NULL AS map(varchar, bigint)) IS NULL",
]

# round-10: duck VARCHAR slicing (bracket + function forms) — 1-based
# inclusive clamped, same as list slices; previously emitted
# array-only slice() / passed array_slice through (Spark type errors)
TEMPLATES += [
    "('hello')[2:4]",
    "('hello')[2:]",
    "('hello')[:3]",
    "('hello')[2:99]",
    "('hello')[4:2]",
    "('hello')[0:2]",
    "array_slice('hello', 2, 4)",
    "array_slice('hello', -3, -1)",
    "array_slice([1,2,3,4], -3, -2)",
    "list_slice('abcdef', 2, 3)",
]

# round-10: list comprehensions (transform/filter), list_zip
# (arrays_zip with coalesced legs)
TEMPLATES += [
    "[x + 1 FOR x IN [1,2,3]]",
    "[x * 2 FOR x IN [1,NULL,3]]",
    "[x FOR x IN [1,2,3] IF x > 1]",
    "[upper(s) FOR s IN ['a','b']]",
    "[x FOR x IN [] IF x > 1]",
    "[[y FOR y IN [1,2]] FOR x IN [1,2]]",
    "list_contains([x FOR x IN [1,2,3] IF x > 1], 3)",
    "cardinality(list_zip([1,2,3],[4]))",
    "cardinality(list_zip(NULL::int[], [1]))",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return round(v, 9)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:  # pragma: no cover
        pass
    if isinstance(v, int):
        return round(float(v), 9)
    if isinstance(v, list):
        return tuple(sorted((_repr_el(x) for x in v)))
    if hasattr(v, "asDict"):
        # pyspark Row (STRUCT cell) vs duck's plain-dict rendering
        # (round 11: the named-group regexp_extract struct form)
        return tuple(
            sorted((str(k), _repr_el(x)) for k, x in v.asDict().items())
        )
    if isinstance(v, dict):
        # duck's client renders MAP as {'key': [...], 'value': [...]};
        # Spark returns a plain dict — rebuild, then compare unordered
        if (
            set(v) == {"key", "value"}
            and isinstance(v.get("key"), list)
            and isinstance(v.get("value"), list)
            and len(v["key"]) == len(v["value"])
        ):
            v = dict(zip(v["key"], v["value"]))
        return tuple(sorted((str(k), _repr_el(x)) for k, x in v.items()))
    return v


# round 12 (wave 65): duck fmod is FLOORED (sign of divisor) computed
# as x - y*floor(x/y) in IEEE doubles — the try_mod rename was silently
# wrong on mixed signs (r11 verdict #2); bit-level cases included where
# the adjust-style (truncated-mod + y) emission rounds differently.
# Plus the make_interval/date-promotion composition (verdict #3): mixed
# intervals decomposed to make_interval(...) must still promote the
# DATE operand to TIMESTAMP, both operand orders.
TEMPLATES += [
    "fmod(-7.0, 2.0)", "fmod(7.0, -2.0)", "fmod(-7.5, 2.0)",
    "fmod(-7.0, -2.0)", "fmod(7, 3)", "fmod(-5.3, 2.0)",
    "fmod(7.0, 0.0)", "fmod(NULL, 2.0)",
    "fmod(89882.96120643326, -10158.190743229283)",
    "fmod(-8065672463330720.0, -31208.85550420578)",
    "fmod(1e18, 7.3)",
    "CAST(DATE '2020-01-29' + INTERVAL '1 month 3 days' AS VARCHAR)",
    "CAST(INTERVAL '1 month 3 days' + DATE '2020-01-29' AS VARCHAR)",
    "CAST(DATE '2020-01-29' - INTERVAL '1 month 3 days' AS VARCHAR)",
    "CAST(DATE '2020-01-29' + INTERVAL '1 month 2 hours' AS VARCHAR)",
    "CAST(DATE '2024-01-31' + INTERVAL '1 month' AS VARCHAR)",
]


def _repr_el(x):
    return (x is None, repr(_norm(x)))


def _duck_accepts(expr: str):
    try:
        return duckdb.sql(f"SELECT {expr} AS v").fetchall()[0][0], True
    except Exception:
        return None, False


def test_differential_enumeration(spark):
    corpus = []  # (expr, duck_value)
    loud = 0
    for expr in TEMPLATES:
        dv, ok = _duck_accepts(expr)
        if not ok:
            continue  # duckdb itself rejects it — nothing to compare
        try:
            sq = transpile(f"SELECT {expr} AS v", "duckdb")
        except TranspileError:
            loud += 1  # loud is always acceptable
            continue
        if "\\" not in sq:
            # backslash-literal outputs are deliberately not re-transpile
            # idempotent (doubling can't distinguish already-doubled —
            # same skip policy as the registry fixpoint corpus test);
            # nothing re-transpiles transpiled output at runtime
            assert transpile(sq, "duckdb") == sq, f"not a fixpoint: {expr}"
        corpus.append((expr, dv, sq[len("SELECT ") : -len(" AS v")]))
    assert len(corpus) > 150, (len(corpus), loud)

    failures = []
    BATCH = 40
    for off in range(0, len(corpus), BATCH):
        chunk = corpus[off : off + BATCH]
        sel = ", ".join(f"({sp}) AS c{k}" for k, (_, _, sp) in enumerate(chunk))
        try:
            row = spark.sql(f"SELECT {sel}").collect()[0]
        except Exception:
            # one bad apple: fall back to per-expression to report it
            for expr, dv, sp in chunk:
                try:
                    sv = spark.sql(f"SELECT {sp} AS v").collect()[0][0]
                except Exception as exc:  # noqa: BLE001
                    failures.append((expr, dv, f"SPARK_ERR {str(exc)[:80]}"))
                    continue
                if _norm(sv) != _norm(dv):
                    failures.append((expr, dv, sv))
            continue
        for k, (expr, dv, _) in enumerate(chunk):
            sv = row[k]
            if _norm(sv) != _norm(dv):
                failures.append((expr, dv, sv))
    assert not failures, "\n".join(
        f"{e!r}: duck={d!r} spark={s!r}" for e, d, s in failures[:25]
    )


def test_pinned_fuzz_divergences(spark):
    """Documented, reference-matching divergences the corpus excludes."""
    # duckdb float // is plain float division (3 // 2.5 = 1.2); SQLGlot
    # (and therefore the reference) maps duckdb // to IntDiv -> Spark
    # DIV, which casts to long. Round 11: statically VISIBLE float
    # literals now emit plain `/` — more faithful than the reference
    # toolchain (the to_char precedent); float COLUMNS stay on DIV,
    # the documented reference-matching residual.
    assert duckdb.sql("SELECT 3 // 2.5 AS v").fetchall()[0][0] == 1.2
    out = transpile("SELECT 3 // 2.5 AS v", "duckdb")
    assert float(spark.sql(out).collect()[0][0]) == 1.2
    out_col = transpile("SELECT a // b AS v FROM t", "duckdb")
    assert "DIV" in out_col
    # duckdb len()/length() accept LISTS; statically-list args now
    # rewrite to size() (round 9 — previously a loud analysis error)
    out = transpile("SELECT len([1,2,3]) AS v", "duckdb")
    assert spark.sql(out).collect()[0][0] == 3
    # // over a DOUBLE-typed operand (duck: plain float division) is a
    # loud Spark analysis error (DIV is BIGINT-only), never silent
    out = transpile("SELECT 2 // (7 ^ 2) AS v", "duckdb")
    with pytest.raises(Exception):
        spark.sql(out).collect()
