"""Read-dialect → Spark SQL transpilation.

The reference renders model SQL written in ANY SQLGlot dialect and
transpiles it to the target engine's dialect at render time
(sqlmesh/core/renderer.py:517 ``render`` normalizes through the model's
``dialect``; sqlmesh/core/dialect.py:1040 ``extend_sqlglot`` registers the
dialect surface). sqlglot is not available in this sandbox, so this module
implements the same *capability* directly on the tokenizer from
``core/sqlparse.py``: a span-preserving token rewrite from a read dialect
(DuckDB / Postgres / ANSI / Snowflake / BigQuery / Redshift / MySQL /
Oracle / T-SQL) to Spark SQL.

Design rules:

- **Surgical edits, never re-rendering.** Tokens carry source offsets;
  rewrites are (start, end, replacement) edits applied right-to-left, so
  untouched SQL — whitespace, comments, quoting, macro tokens — survives
  byte-identical. A transpile of already-Spark SQL is a no-op.
- **Only rewrite what differs.** Functions with identical names and
  semantics in both dialects (coalesce, round, date_trunc, concat, ...)
  pass through. The maps below cover names that exist only in the read
  dialect (strftime, epoch, list_*) or exist in both with DIFFERENT
  semantics (single-arg ``log`` is log10 in DuckDB/Postgres but ln in
  Spark).
- **Format strings convert with their functions.** ``strftime``/
  ``strptime`` carry C-style ``%Y-%m-%d`` patterns; Spark's
  ``date_format``/``to_timestamp`` take Java-style ``yyyy-MM-dd``. The
  literal second argument is converted, including quoting literal letter
  runs (``%H:%M:%ST%z`` → ``HH:mm:ss'T'xx``-style). Unknown ``%`` codes
  raise ``TranspileError`` — silently passing one through would produce a
  query that runs and returns wrong strings.
- **Loud failure.** Anything this layer cannot express in Spark raises
  ``TranspileError`` at render time instead of shipping broken SQL to the
  cluster.

Scale note: transpilation is a driver-side string pass over model text
(microseconds per model); it runs inside the render cache keyed by
snapshot version, so a 5,000-model DAG transpiles each model once.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.sqlparse import _EXPR_KEYWORDS, _TOKEN_RE


class TranspileError(ValueError):
    pass


SPARK = "spark"

#: read dialects accepted by ``transpile``; "" / None / "spark" are no-ops.
READ_DIALECTS = (
    "duckdb", "postgres", "ansi", "snowflake", "bigquery", "redshift",
    "mysql", "oracle", "tsql", "trino", "clickhouse",
)

#: alias dialects (presto/athena → trino, mssql/fabric/azuresql → tsql,
#: risingwave/gcp_postgres → postgres, motherduck → duckdb, databricks →
#: spark no-op) live in core/sqlparse.py — the LEXING seam — so that
#: depends_on / lineage / fingerprints / the formatter select the right
#: grammar too, not just this module's tables. Re-exported here for the
#: public transpile API.
from sqlmesh_spark.core.sqlparse import DIALECT_ALIASES  # noqa: E402

#: dialects whose string literals are standard SQL (backslash is an
#: ordinary character) and need backslash-doubling for Spark's C-style
#: escape parser. Snowflake/BigQuery/Redshift/MySQL literals already treat
#: backslash as an escape character, matching Spark — no doubling
#: (Redshift's standard_conforming_strings defaults to off, inherited
#: from its PostgreSQL 8.0 base; models written against a cluster with it
#: flipped on should declare dialect postgres instead). Oracle, T-SQL and
#: Trino literals are standard '' doubling.
_STD_LITERAL_DIALECTS = ("duckdb", "postgres", "ansi", "oracle", "tsql", "trino")

# ---------------------------------------------------------------------------
# Function maps: read-dialect function name → Spark function name, applied
# only in call position (identifier immediately followed by '(') so column
# names are never rewritten. Arg order/shape must match in both engines —
# anything needing restructuring gets a special handler instead.
# ---------------------------------------------------------------------------

_COMMON_FN = {
    # temporal
    "epoch": "unix_timestamp",          # seconds since epoch
    "epoch_ms": "unix_millis",
    "epoch_us": "unix_micros",
    "now": "current_timestamp",
    "today": "current_date",
    "datepart": "date_part",
    "datetrunc": "date_trunc",
    # string
    "strpos": "instr",                  # both 1-based, 0 when absent
    "string_agg": "listagg",            # Spark 4.0+ listagg(expr, delim)
    # arrays (DuckDB list_* / Postgres array_*)
    "list_value": "array",
    "list_pack": "array",
    "list_contains": "array_contains",
    "list_has": "array_contains",
    "array_has": "array_contains",
    # list_distinct: handler below (duckdb drops NULL elements)
    "list_sort": "array_sort",
    "list_append": "array_append",
    # list_concat / list_cat / array_cat: handler below (NULL args are
    # SKIPPED in duckdb/postgres; Spark concat returns NULL)
    # list_extract / array_extract: handler below (both 1-based, but
    # DuckDB/Postgres return NULL out of bounds AND for index 0 where
    # Spark-4 ANSI element_at raises → try_element_at + nullif(i, 0)).
    "list_position": "array_position",
    "list_indexof": "array_position",
    "list_transform": "transform",
    "list_filter": "filter",
    "list_reduce": None,                # Spark reduce() needs an init arg → loud
    "list_reverse": "reverse",
    # array_length/list_length route through a special handler (Postgres
    # passes a dimension arg that size() lacks); cardinality is 1-arg.
    "cardinality": "size",
    "array_to_string": "array_join",
    "list_aggr": None,                  # needs lambda restructure → loud
    # array_agg / list: handler below (these engines KEEP NULL elements
    # and return NULL on empty; collect_list drops/returns [])
    "unnest": "explode",
    "string_split_regex": "split",      # second arg already a regex
    # aggregates
    "arg_max": "max_by",
    "arg_min": "min_by",
    "list_sum": None,                   # Spark aggregate() needs init+lambda → loud
    "list_avg": None,
    # string predicates (same 2-arg shape and ''-needle semantics)
    "starts_with": "startswith",
    "ends_with": "endswith",
    # no Spark equivalent
    "gcd": None,
    "lcm": None,
}

# Snowflake renames (ref dialect.py:1040 — the reference accepts every
# SQLGlot dialect; Snowflake is the most common migration source). Names
# with IDENTICAL Spark semantics pass through unmapped (nvl2, split_part —
# both plain-string delimiter + 1-based + negative-from-end, ifnull,
# regexp_count, arrays_overlap). None = loud failure.
_SNOWFLAKE_FN: dict[str, str | None] = {
    "iff": "if",
    "len": "length",
    # editdistance has an arity-dependent handler: the 2-arg form renames
    # to levenshtein, but the 3-arg capped form diverges (Spark returns -1
    # above the threshold, Snowflake returns the cap).
    "charindex": "position",            # both (substr, str[, start]), 1-based
    "array_construct": "array",
    "array_size": "size",
    "array_cat": "concat",
    "array_position": None,             # 0-based AND (elem, arr) order → loud
    "arrayagg": "collect_list",
    "array_agg": "collect_list",
    "getdate": "current_timestamp",
    # sysdate/systimestamp return UTC wall-clock — handled below with a
    # to_utc_timestamp rewrite, not a bare rename
    "uuid_string": "uuid",
    "weekiso": "weekofyear",            # both ISO week-of-year
    # dayofweek/week depend on the session's WEEK_START parameter (and the
    # common default disagrees with Spark's 1=Sunday) — silent off-by-one,
    # so LOUD; the ISO variants have exact rewrites (handlers below).
    "dayofweek": None,
    "week": None,
    "random": None,                     # 64-bit int gen vs Spark rand() double
    "seq1": None, "seq2": None, "seq4": None, "seq8": None,
    "object_construct": None,
    "object_construct_keep_null": None,
    "get": None, "get_path": None, "flatten": None,
    # decode passes through: Snowflake DECODE is the Oracle NULL-safe
    # comparison form, which Spark's decode implements exactly
    # (verified on 4.1: decode(NULL, NULL, 'm', 'z') = 'm')
    "timediff": None,
    "hash": None,                       # different hash function → silent wrong
    "to_variant": None,
    "strtok": None,                     # 1-based tokenizer w/ charset delim
}

# BigQuery renames. Identical-semantics pass-throughs: regexp_extract_all,
# last_day, unix_date, date_from_unix_date, timestamp_seconds/millis/micros,
# unix_seconds/millis/micros, string(), net-new EXCEPT DISTINCT and
# `SELECT * EXCEPT (...)` are native Spark syntax already.
_BIGQUERY_FN: dict[str, str | None] = {
    "safe_cast": "try_cast",
    "safe_divide": "try_divide",
    "safe_add": "try_add",
    "safe_subtract": "try_subtract",
    "safe_multiply": "try_multiply",
    "countif": "count_if",
    "logical_and": "bool_and",
    "logical_or": "bool_or",
    "starts_with": "startswith",
    "ends_with": "endswith",
    "format": "format_string",          # both printf-style
    "generate_uuid": "uuid",
    "regexp_contains": "regexp_like",
    "array_concat": "concat",
    "array_to_string": "array_join",
    "array_reverse": "reverse",
    # collect_list drops NULLs = BigQuery's IGNORE NULLS arm; plain BQ
    # ARRAY_AGG over a NULL element would have ERRORED, so no silent value
    # divergence is possible. ORDER BY/LIMIT modifiers inside the call
    # fail Spark's parser loudly at execution.
    "array_agg": "collect_list",
    "strpos": "instr",                  # both 1-based, 0 when absent
    "byte_length": "octet_length",
    "to_hex": "hex",
    "from_hex": "unhex",
    "sha256": None,                     # returns BYTES; Spark sha2 returns hex
    "sha512": None,
    "farm_fingerprint": None,           # different hash → silent wrong values
    # generate_array / generate_date_array have a handler below: BigQuery
    # returns [] when start > end with the default step; Spark sequence
    # returns a DESCENDING array.
    "current_datetime": "localtimestamp",
    # "datetime" has an arity-dependent handler (6-arg constructor vs
    # 1-arg conversion vs 2-arg tz/date+time forms)
    "json_extract_scalar": "get_json_object",
    "json_value": "get_json_object",
    "json_extract": None,               # returns JSON (not scalar) → loud
    "json_query": None,
    "parse_json": None,                 # BQ JSON type vs Spark VARIANT → loud
    "safe_negate": None,
    "time": None, "time_diff": None, "time_add": None, "time_sub": None,
}

# Redshift renames (PostgreSQL-8.0-derived; ref dialect.py:1040 — second
# most common warehouse migration source after Snowflake). Identical-
# semantics pass-throughs: nvl, nvl2, split_part (1-based), btrim/initcap,
# md5, sha2, date_trunc, date_part, extract, regexp_substr/regexp_instr/
# regexp_count (POSIX-enough for the common cases), median,
# percentile_cont, listagg (render-time Spark>=4 gate below), greatest/
# least (both ignore NULLs). DATEADD/DATEDIFF (boundary-crossing, bare
# unit keywords) and TO_CHAR/TO_DATE/TO_TIMESTAMP (postgres-style format
# patterns) route through the shared handlers below. None = loud failure.
_REDSHIFT_FN: dict[str, str | None] = {
    "getdate": None,                    # UTC wall-clock — handler below
    "len": "length",                    # both character counts
    "charindex": "position",            # both (substr, str), 1-based
    "strpos": "instr",                  # both 1-based, 0 when absent
    "random": "rand",                   # both uniform [0,1) doubles
    "array": None,                      # builds SUPER array → no faithful type
    "strtol": None,                     # arbitrary-base parse → loud
    "to_number": None,                  # numeric format language differs
    "trunc": None,                      # type-overloaded (ts→date / numeric
                                        # scale) vs Spark's (date, fmt) →
                                        # use CAST(x AS DATE) or floor
    "sysdate": None,                    # bare-keyword form handled above;
                                        # a parenthesized call is not
                                        # Redshift syntax → loud
    "text_to_int_alt": None,
    "text_to_numeric_alt": None,
    # decode passes through (Oracle NULL-safe form = Spark's decode)
    "json_parse": None,                 # SUPER type has no Spark analog
    "json_serialize": None,
    "is_valid_json": None,
    "json_array_length": None,
    # APPROXIMATE COUNT(DISTINCT ...) is a keyword prefix, not a call —
    # it reaches Spark's parser unchanged and fails loudly there.
    "dexp": "exp",
    "dlog1": "ln",
    "dlog10": "log10",
    "checksum": None,                   # different hash → silent wrong values
    "func_sha1": "sha1",
    "crc32": None,                      # Redshift returns hex string; Spark bigint
    "timeofday": None,
    "getutcdate": None,                 # handler below (UTC wall-clock)
    "interval_cmp": None,
    "date_cmp": None, "date_cmp_timestamp": None, "timestamp_cmp": None,
}

# MySQL renames (ref dialect.py:1040; the most common OLTP-source dialect
# for replicated reporting models). Identical-semantics pass-throughs:
# ifnull, nullif, if, concat/concat_ws (NULL-propagating in both... concat
# of NULL is NULL in MySQL; Spark concat also returns NULL on any NULL
# arg), locate, instr, substring_index, lpad/rpad, repeat, reverse, space,
# elt, conv, bin, hex, unhex, crc32, md5, sha/sha1, sha2, last_day,
# datediff (both count whole days), dayofweek (both 1=Sunday), weekofyear
# (both ISO), dayofyear, quarter, timestampdiff (both count COMPLETE
# elapsed units — verified against Spark 4.1), rand, pow/power, truncate
# handled loud, DIV passes natively. None = loud failure.
_MYSQL_FN: dict[str, str | None] = {
    "length": "octet_length",           # MySQL LENGTH() counts BYTES
    "curdate": "current_date",
    "curtime": None,                    # TIME type has no Spark analog
    "now": "current_timestamp",
    "sysdate": "current_timestamp",     # per-call vs per-statement clock:
                                        # sub-statement skew accepted
    "localtime": "localtimestamp",
    "utc_timestamp": None,              # handler below (UTC wall-clock)
    "utc_date": None,
    "utc_time": None,
    "format": "format_number",          # both add thousands separators
    "field": None,                      # no Spark equivalent
    # find_in_set passes through (Spark's matches MySQL's 1-based index)
    "make_set": None,
    "export_set": None,
    # weekday passes through (0=Monday..6 in both MySQL and Spark)
    "week": None,                       # mode-dependent numbering → loud
    "yearweek": None,
    "to_days": None, "from_days": None,
    "time_to_sec": None, "sec_to_time": None,
    "timediff": None, "maketime": None, "makedate": None,
    # date_format is handled below (format conversion; same name in Spark,
    # so NOT mapped None here — the fixpoint's later passes must leave the
    # handler's own Spark-ready output untouched)
    "str_to_date": None,                # handler below
    "get_format": None,
    "group_concat": None,               # handler below (SEPARATOR syntax)
    "json_extract": None, "json_unquote": None, "json_object": None,
    "json_arrayagg": None, "json_objectagg": None,
    "convert_tz": None,
    "truncate": None,                   # numeric truncate → loud
    "least": None,                      # MySQL returns NULL on any NULL arg;
    "greatest": None,                   # Spark ignores NULLs → silent wrong
    "password": None, "encrypt": None, "aes_encrypt": None,
    "aes_decrypt": None, "compress": None, "uncompress": None,
    "uuid_short": None,
    "connection_id": None, "database": None, "schema": None, "user": None,
    "session_user": None, "system_user": None, "version": None,
    "benchmark": None, "sleep": None, "get_lock": None, "release_lock": None,
}

# Oracle renames (ref dialect.py:1040; the classic enterprise migration
# source). Huge identical-semantics overlap with Spark — these pass
# through: nvl, nvl2, decode (Spark's decode IS Oracle's NULL-safe
# comparison form, verified on 4.1), months_between (same 31-day-month
# formula), add_months, last_day, next_day, instr (2-arg), substr
# (negative-from-end), lpad/rpad, translate, initcap, greatest/least
# (Oracle propagates NULL... see map), ceil/floor/round/trunc-numeric
# handled loud, listagg (Spark>=4 gate), sign, power, mod, chr, ascii,
# soundex, concat (2-arg), coalesce, abs. TO_CHAR/TO_DATE/TO_TIMESTAMP
# route through the shared Postgres-pattern handler (Oracle is that
# pattern language's origin). Known documented divergence with no static
# rewrite: Oracle '' IS NULL — Spark treats '' as a value.
_ORACLE_FN: dict[str, str | None] = {
    "sysdate": None,                    # bare-keyword handler below
    "systimestamp": None,
    "to_number": None,                  # unknown target scale → loud; use
                                        # CAST(x AS DECIMAL(p,s))
    "rownum": None,                     # pseudo-column guard (ident form
                                        # handled below) — use ROW_NUMBER()
    "rowid": None, "rowidtochar": None,
    "least": None,                      # Oracle returns NULL on any NULL
    "greatest": None,                   # arg; Spark ignores NULLs
    "lnnvl": None,
    "sys_guid": None,                   # RAW(16) vs uuid() string
    "userenv": None, "sys_context": None, "ora_hash": None,
    "empty_clob": None, "empty_blob": None,
    "xmlelement": None, "xmlagg": None,
    "regexp_instr": None,               # Spark regexp_instr exists but
                                        # Oracle's pos/occ/return_opt args
                                        # diverge → loud beats silent-wrong
    "ratio_to_report": None,
    "wm_concat": None,                  # use LISTAGG
    "dbms_random": None,
    "nanvl": None,
    "remainder": None,                  # IEEE remainder ≠ Spark mod
    "bitand": None,                     # handler shared w/ snowflake below
}

# T-SQL / SQL Server renames. Identical pass-throughs: substring, left,
# right, ltrim/rtrim (1-arg), upper/lower, abs, ceiling, floor, round,
# sign, exp, log (T-SQL 1-arg LOG is ln = Spark), log10, power, sqrt,
# ascii, concat, concat_ws, year/month/day, string_agg (→ listagg via
# common map semantics, Spark>=4 gate), count_big→count handled in map.
# Known documented divergence with no static rewrite: `+` is string
# concat when both operands are strings (T-SQL) but numeric addition in
# Spark — rewrite to CONCAT() before migrating.
_TSQL_FN: dict[str, str | None] = {
    "iif": "if",
    "getdate": "current_timestamp",     # server-local clock = session tz
    "sysdatetime": "current_timestamp",
    "getutcdate": None,                 # UTC handler below
    "sysutcdatetime": None,
    "sysdatetimeoffset": None,
    "charindex": "position",            # (substr, str[, start]), 1-based
    "len": None,                        # handler: length(rtrim(x)) —
                                        # T-SQL LEN ignores trailing spaces
    "datalength": "octet_length",
    "replicate": "repeat",
    "str": None,                        # numeric→padded string w/ style
    "stuff": None,
    "patindex": None,                   # %-wildcard pattern lang
    "format": None,                     # .NET format strings
    "isnull": None,                     # handler: 2-arg → nvl (Spark's
                                        # 1-arg isnull is a boolean test!)
    "isnumeric": None, "isdate": None,
    "count_big": "count",
    "square": None,                     # handler shared w/ snowflake
    "string_agg": "listagg",
    "string_split": None,               # returns a TABLE, not an array
    "newid": "uuid",
    "scope_identity": None, "ident_current": None,
    "datename": None,                   # month/weekday NAMES — handler
    "datepart": None,                   # handler (bare unit keyword)
    "day": "day", "month": "month", "year": "year",
    "eomonth": None,                    # handler: last_day(+offset loud)
    "dateadd": None,                    # handler (shared, alias units)
    "datediff": None,                   # handler (shared, alias units)
    "datediff_big": None,
    "switchoffset": None, "todatetimeoffset": None,
    "convert": None,                    # handler (type-first + style arg)
    "try_convert": None,
    "choose": "elt",                    # both 1-based, NULL out of range
    "nchar": "chr",
    "unicode": "ascii",
    "quotename": None,
    "host_name": None, "db_name": None, "user_name": None,
    "suser_sname": None, "object_id": None,
    "rand": None,                       # RAND(seed) repeats per seed per
                                        # CALL in T-SQL; Spark rand(seed)
                                        # is per-row — silent divergence
    "checksum": None, "binary_checksum": None, "hashbytes": None,
}

# Trino / Presto / Athena renames (ref engine_adapter/trino.py,
# athena.py — Athena engine v3 is Trino). Identical pass-throughs (same
# name, arg shape, semantics in Spark): if, nullif, coalesce, try_cast,
# abs, cbrt, ceil/ceiling, exp, floor, ln, log2, log10, log(b, x) (both
# base-first 2-arg), mod, pi, e, pow/power, radians, degrees, round,
# sign, sqrt, chr, concat, concat_ws, length, lower/upper, lpad/rpad
# (both pad AND truncate), ltrim/rtrim/trim, replace (2-arg strips),
# reverse, soundex (split_part is a HANDLER: NULL out-of-range), substr/
# substring, translate, position grammar, luhn_check, url_encode/
# url_decode, crc32 (via to_utf8→encode), date/day/month/year/quarter/
# hour/minute/second, date_trunc (unit-string-first, Monday weeks),
# last_day via rename, extract (field names mapped below), uuid,
# width_bucket (4-arg), regexp_like/regexp_count, lambda syntax x -> e,
# filter/transform/zip_with/array_sort comparator/map_filter/
# transform_keys/transform_values/map_zip_with/map_concat/map_keys/
# map_values/map_entries/map_from_entries, array_distinct/except/
# intersect/union/join/max/min/position/remove, arrays_overlap, flatten,
# sequence, shuffle, slice, count_if, bool_and/bool_or/every, max_by/
# min_by (2-arg), approx_percentile (2-arg), corr/covar/stddev/var
# family, kurtosis/skewness, json_array_length. None = loud failure.
_TRINO_FN: dict[str, str | None] = {
    # temporal
    "now": "current_timestamp",
    "last_day_of_month": "last_day",
    "day_of_month": "dayofmonth",
    "day_of_year": "dayofyear",
    "doy": "dayofyear",
    "week": "weekofyear",               # ISO weeks in both
    "week_of_year": "weekofyear",
    "millisecond": None,                # no Spark scalar
    "timezone_hour": None, "timezone_minute": None,
    "from_iso8601_timestamp": "to_timestamp",
    "from_iso8601_date": "to_date",
    "to_iso8601": None,                 # output shape depends on arg type
    "parse_datetime": None,             # Joda patterns → loud
    "format_datetime": None,            # Joda patterns → loud; use
                                        # date_format's MySQL %-codes
    "date_parse": None,                 # handler below (MySQL %-codes)
    "with_timezone": None, "at_timezone": None,
    "from_unixtime_nanos": None,
    "to_milliseconds": None, "parse_duration": None,
    "human_readable_seconds": None,
    "current_time": None, "localtime": None,  # TIME type has no analog
    # date_format / from_unixtime / to_unixtime / date_add / date_diff /
    # day_of_week / dow / year_of_week / yow are handlers below.
    # string
    "codepoint": "ascii",
    "levenshtein_distance": "levenshtein",
    "hamming_distance": None,
    "starts_with": "startswith",
    "strpos": "instr",                  # 2-arg, same order + 1-based;
                                        # 3-arg instance form is louded by
                                        # a handler below
    "format": "format_string",          # both java.lang.String.format
    "split_to_map": None,               # Spark str_to_map splits on REGEX
    "split_to_multimap": None,
    "word_stem": None, "normalize": None,
    "to_utf8": None,                    # handler: encode(x, 'UTF-8')
    "from_utf8": None,                  # handler: decode(x, 'UTF-8')
    # binary / hash
    "to_hex": "hex",                    # both emit uppercase
    "from_hex": "unhex",
    "to_base64": "base64",
    "from_base64": "unbase64",
    "to_base64url": None, "from_base64url": None,
    "to_big_endian_64": None, "from_big_endian_64": None,
    "to_big_endian_32": None, "from_big_endian_32": None,
    "md5": None,                        # Trino md5 returns VARBINARY;
                                        # Spark's returns a hex STRING —
    "sha1": None, "sha256": None,       # silent type+value divergence
    "sha512": None, "xxhash64": None,
    "spooky_hash_v2_32": None, "spooky_hash_v2_64": None,
    "murmur3": None,
    # conditional / misc
    "try": None,                        # NULL-on-error wrapper; use the
                                        # try_-prefixed Spark function
    "typeof": None,
    "random": None,                     # handler (0-arg → rand(); the
    "rand": None,                       # bounded int forms have no analog)
    "infinity": None, "nan": None,      # handlers (CAST literals)
    "is_nan": "isnan",
    "is_finite": None, "is_infinite": None,
    "greatest": None, "least": None,    # Trino NULL-propagates; Spark
                                        # ignores NULLs → silent wrong
    "cosine_similarity": None,          # sparse-map vectors
    "truncate": None,                   # toward-zero numeric truncation
    "bit_count": None,                  # Trino 2-arg (value, bits)
    "bitwise_left_shift": "shiftleft",
    "bitwise_right_shift": "shiftrightunsigned",   # logical shift
    "bitwise_right_shift_arithmetic": "shiftright",
    "bitwise_and": None, "bitwise_or": None,       # handlers → (a & b)
    "bitwise_xor": None, "bitwise_not": None,
    # json
    "json_extract_scalar": "get_json_object",      # same $.path language;
                                        # caveat (shared with the bigquery
                                        # mapping): a NON-scalar path
                                        # returns NULL in Trino but the
                                        # serialized JSON here
    "json_extract": None,               # returns JSON type
    "json_parse": None, "json_format": None,
    "json_size": None, "json_array_contains": None,
    "json_array_get": None, "is_json_scalar": None,
    # arrays / maps
    "contains": "array_contains",
    # element_at: first_pass handler below (Trino's element_at() returns
    # NULL out of bounds → try_element_at, but the BRACKET subscript
    # arr[i] ERRORS out of bounds in Trino — its element_at emission from
    # the subscript rewrite must stay plain so Spark's ANSI error
    # preserves that semantic)
    "repeat": "array_repeat",           # Trino repeat builds an ARRAY
    "zip": "arrays_zip",
    "any_match": "exists",
    "all_match": "forall",
    "none_match": None,                 # handler: (NOT exists(...))
    "reduce": "aggregate",              # same (arr, init, merge[, finish])
    # array_agg: shared keep-NULLs handler (Trino keeps NULL elements
    # and returns NULL on empty; collect_list drops/returns [])
    "trim_array": None, "ngrams": None, "combinations": None,
    "array_sort_desc": None,
    "map": None,                        # handler (2 array args →
                                        # map_from_arrays; 0-arg empty map)
    "map_agg": None, "multimap_agg": None, "map_union": None,
    "multimap_from_entries": None,
    "histogram": None, "numeric_histogram": None,
    # aggregates
    "approx_distinct": "approx_count_distinct",
    "arbitrary": "any_value",
    "geometric_mean": None, "checksum": None,
    "approx_set": None, "merge": None,
    "qdigest_agg": None, "tdigest_agg": None,
    "approx_most_frequent": None,
    "bitwise_and_agg": "bit_and",
    "bitwise_or_agg": "bit_or",
    "reduce_agg": None,
    # regexp
    "regexp_split": "split",            # both split on a Java regex
    "regexp_position": None,            # -1 vs 0 when absent
    # url
    "url_extract_port": None,           # parse_url has no PORT part
    # url_extract_host/path/protocol/query/fragment/parameter: handlers
}

# ClickHouse renames (ref engine_adapter/clickhouse.py — the reference's
# last remaining engine dialect). ClickHouse function names are
# case-sensitive camelCase; lookup is lowercased, which accepts any
# spelling (a harmless relaxation). Identical pass-throughs: if, ifnull,
# nullif, coalesce, isnull/isnotnull (1-arg boolean in both), concat,
# substring (1-based, negative-from-end), lower/upper, abs, exp, ln,
# log (1-arg = ln in both), log2, log10, sqrt, cbrt, pow/power, e, pi,
# floor, ceil/ceiling, sign, isnan, hex/unhex (both uppercase hex of the
# UTF-8 bytes), startswith/endswith, repeat (string), format_string via
# map below, map(k1, v1, ...) variadic literal, round (caveat: ClickHouse
# rounds Float32/64 banker's-style on exact .5 — Spark rounds half-up;
# documented, no static rewrite). None = loud failure; functions whose
# name does not exist in Spark at all are left to fail at analysis
# (already loud) unless a faithful rewrite exists.
_CLICKHOUSE_FN: dict[str, str | None] = {
    # temporal
    "now": "current_timestamp",
    "today": "current_date",
    "yesterday": None,                  # handler: date_sub(current_date(), 1)
    "toyear": "year", "tomonth": "month",
    "todayofmonth": "dayofmonth", "todayofyear": "dayofyear",
    "tohour": "hour", "tominute": "minute", "tosecond": "second",
    "toquarter": "quarter",
    "todayofweek": None,                # handler: ISO Monday=1
    "tomonday": None,                   # handler
    "tolastdayofmonth": "last_day",
    "tounixtimestamp": "unix_timestamp",
    "fromunixtimestamp": None,          # handler → timestamp_seconds
    "formatdatetime": None,             # handler (%-codes, CH table)
    "parsedatetime": None,              # MySQL-syntax but %M differs by
                                        # server version → loud
    "parsedatetimebesteffort": None,
    "tostartofweek": None,              # mode-dependent (default SUNDAY
                                        # weeks) — date_trunc is Monday
    "totimezone": None,
    # toStartOf{Year,Quarter,Month,Day,Hour,Minute} / toYYYYMM[DD] /
    # date_add / dateDiff / addDays family: handlers below.
    # string
    # length and reverse are LOUD via first_pass handlers below (their
    # Spark-named rewrites length()/reverse() must survive later fixpoint
    # passes): CH length is BYTES for strings / size for arrays; CH
    # reverse is byte-wise (garbled UTF-8). Use lengthUTF8 / reverseUTF8.
    "lengthutf8": "length",
    "lowerutf8": "lower", "upperutf8": "upper",
    "trimleft": "ltrim", "trimright": "rtrim", "trimboth": "trim",
    "reverseutf8": "reverse",
    "replaceall": "replace",
    "replaceone": None,                 # first-only; Spark replaces all
    "replaceregexpall": None,           # handler (\1 backrefs → $1)
    "replaceregexpone": None,           # first-only
    "match": "regexp_like",             # RE2 partial match = rlike search
    "position": None,                   # handler: CH is (haystack,
                                        # needle) — Spark position() is
                                        # REVERSED; instr matches CH
    "positioncaseinsensitive": None,
    "locate": None,                     # arg order flipped across CH
                                        # versions (24.x) → loud
    # extract: handler below (comma form is a regex fragment match; the
    # EXTRACT(field FROM x) grammar form passes through)
    "splitbychar": None,                # handler (arg swap + regex escape)
    "splitbystring": None,              # handler
    "splitbyregexp": None,              # handler (arg swap, regex kept)
    "concatws": "concat_ws",
    "leftpad": "lpad", "rightpad": "rpad",
    "base64encode": "base64", "base64decode": "unbase64",
    "trybase64decode": None,
    "md5": None,                        # returns FixedString(16) BINARY;
    "sha1": None, "sha224": None,       # Spark returns hex STRING
    "sha256": None, "sha512": None,
    "empty": None, "notempty": None,    # strings AND arrays → ambiguous
    # conditional / misc
    "multiif": None,                    # handler → CASE
    "assumenotnull": None,              # handler: unwrap to the arg
    "tonullable": None,                 # handler: unwrap
    "tolowcardinality": None,           # handler: unwrap
    "any": "any_value",                 # CH any() is first-value — NOT
                                        # Spark's bool_or-style any()!
    "anylast": "any_value",
    "anyheavy": None,
    # rand is a first_pass handler below (CH rand() is a random UInt32,
    # not a [0,1) float; the rewrite's own inner rand() must survive
    # later passes)
    "rand64": None, "randcanonical": "rand",
    "least": None, "greatest": None,    # NULL-propagation differs
    "intdiv": None,                     # handler → (a DIV b)
    "intdivorzero": None,
    "modulo": "mod",
    "moduloorzero": None,
    "plus": None, "minus": None,        # handlers → operators
    "multiply": None, "divide": None,
    "roundbankers": "bround",
    "todecimal32": None, "todecimal64": None, "todecimal128": None,
    "toint128": None, "toint256": None,  # exceed DECIMAL(38,0)'s range
    "touint128": None, "touint256": None,
    "tofixedstring": None,
    "uniqexact": None,                  # use COUNT(DISTINCT ...)
    "tuple": "struct",
    "tupleelement": None,               # 1-based positional field access
    "arrayelement": None,               # returns the TYPE DEFAULT (0, '')
                                        # out of bounds, not NULL
    # aggregates
    "uniq": "approx_count_distinct",
    "uniqcombined": None, "uniqhll12": None, "uniqtheta": None,
    "grouparray": "collect_list",
    "groupuniqarray": "collect_set",
    "argmax": "max_by", "argmin": "min_by",
    "countif": "count_if",
    "sumif": None, "avgif": None,       # handlers → agg(if(cond, x, NULL))
    "minif": None, "maxif": None,
    "quantile": None, "quantileexact": None,   # parameterized-combinator
    "median": "median",                 # gate-free: Spark median (3.4+)
    "corrstable": "corr", "covarpopstable": "covar_pop",
    "covarsampstable": "covar_samp",
    "stddevpop": "stddev_pop", "stddevsamp": "stddev_samp",
    "varpop": "var_pop", "varsamp": "var_samp",
    # arrays (CH higher-order functions take the LAMBDA FIRST)
    "arrayjoin": "explode",
    "has": "array_contains",
    "indexof": "array_position",
    "arraydistinct": "array_distinct",
    "arrayconcat": "concat",
    "arrayslice": "slice",
    "arrayreverse": "reverse",
    "arrayflatten": "flatten",
    "arraycompact": None,
    "arrayzip": "arrays_zip",
    "arraymap": None, "arrayfilter": None,      # handlers (lambda swap)
    "arrayexists": None, "arrayall": None,      # handlers
    "arraysort": None,                          # handler (1-arg ok)
    "arraysum": None, "arrayavg": None,
    "arraymin": "array_min", "arraymax": "array_max",
    "arraystringconcat": "array_join",
    "arrayenumerate": None,
    "emptyarraystring": None, "emptyarrayint64": None,
    # json
    "jsonextractstring": None,          # handler → get_json_object
    "jsonextractint": None, "jsonextractfloat": None,   # handlers (+CAST)
    "jsonextractbool": None,
    "jsonextractraw": None, "jsonextractarrayraw": None,
    "jsonhas": None, "jsonlength": None,
    "visitparamextractstring": None, "visitparamextractraw": None,
    # type conversions: handlers (toString/toDate/toInt.../toFloat...)
}

#: ClickHouse to<Type>(x) conversion functions → Spark CAST target.
#: Unsigned types widen to stay representable (same rule as the MySQL
#: UNSIGNED and T-SQL TINYINT mappings).
_CH_CAST_FN = {
    "tostring": "STRING",
    "todate": "DATE", "todate32": "DATE",
    "todatetime": "TIMESTAMP", "todatetime64": "TIMESTAMP",
    "toint8": "TINYINT", "toint16": "SMALLINT",
    "toint32": "INT", "toint64": "BIGINT",
    # toInt128 absent on purpose: Int128's range exceeds DECIMAL(38,0)
    "touint8": "SMALLINT", "touint16": "INT",
    "touint32": "BIGINT", "touint64": "DECIMAL(20,0)",
    "tofloat32": "FLOAT", "tofloat64": "DOUBLE",
    "tobool": "BOOLEAN",
}

#: ClickHouse addDays/subtractDays family → timestampadd unit (+negation).
#: Arg order flips: addDays(date, n) → timestampadd(DAY, n, date).
#: Type caveat (documented, not statically fixable — same as the
#: snowflake/tsql DATEADD handler): the source returns its operand's
#: type (Date in → Date out) while timestampadd always returns
#: TIMESTAMP; values are correct, a Date operand gains 00:00:00.
_CH_ADD_FN = {
    "addyears": ("YEAR", False), "addquarters": ("QUARTER", False),
    "addmonths": ("MONTH", False), "addweeks": ("WEEK", False),
    "adddays": ("DAY", False), "addhours": ("HOUR", False),
    "addminutes": ("MINUTE", False), "addseconds": ("SECOND", False),
    "subtractyears": ("YEAR", True), "subtractquarters": ("QUARTER", True),
    "subtractmonths": ("MONTH", True), "subtractweeks": ("WEEK", True),
    "subtractdays": ("DAY", True), "subtracthours": ("HOUR", True),
    "subtractminutes": ("MINUTE", True), "subtractseconds": ("SECOND", True),
}

#: ClickHouse toStartOf<unit> → date_trunc unit; the date-valued ones
#: re-wrap in a DATE cast (CH returns Date, date_trunc a timestamp).
_CH_TRUNC_FN = {
    "tostartofyear": ("year", True),
    "tostartofquarter": ("quarter", True),
    "tostartofmonth": ("month", True),
    "tomonday": ("week", True),         # ISO Monday weeks in both
    "tostartofday": ("day", False),
    "tostartofhour": ("hour", False),
    "tostartofminute": ("minute", False),
}

#: Trino url_extract_* → Spark parse_url(url, PART) part keyword.
_TRINO_URL_PARTS = {
    "url_extract_host": "HOST",
    "url_extract_path": "PATH",
    "url_extract_protocol": "PROTOCOL",
    "url_extract_query": "QUERY",
    "url_extract_fragment": "REF",
}

#: date_part/extract fields whose VALUE differs between duckdb/postgres
#: and Spark (see tests/test_dialect_edges.py): dow is Sunday=0..6
#: (Spark DOW: Sunday=1..7), isodow is Monday=1..Sunday=7 (Spark:
#: DAYOFWEEK_ISO), second truncates to the integer second (Spark SECOND
#: carries the fraction), epoch is fractional seconds as DOUBLE (no
#: Spark field), and micro/milliseconds include the seconds component.
#: Values are CAST to the BIGINT these engines return (driver hash is
#: dtype-sensitive).
#: Every template is FIXPOINT-STABLE: the emitted spelling re-lexes
#: under the same read grammar without re-triggering any handler
#: (pmod/weekday guarded by the pmod-parent sentinel, second() and
#: date_format() have no duckdb/postgres handlers, try_divide avoids
#: the `/` divisor wrap).
_DOW_TEMPLATE = "CAST(pmod(weekday({x}) + 1, 7) AS BIGINT)"
_DP_FIELD_TEMPLATES = {
    "dow": _DOW_TEMPLATE,
    "dayofweek": _DOW_TEMPLATE,
    "weekday": _DOW_TEMPLATE,
    "isodow": "CAST(date_part('DAYOFWEEK_ISO', {x}) AS BIGINT)",
    "epoch": "try_divide(unix_micros(CAST({x} AS TIMESTAMP)), 1000000)",
    "second": "CAST(second({x}) AS BIGINT)",
    "seconds": "CAST(second({x}) AS BIGINT)",
    "microseconds": "CAST(date_format({x}, 'ssSSSSSS') AS BIGINT)",
    "microsecond": "CAST(date_format({x}, 'ssSSSSSS') AS BIGINT)",
    "milliseconds": "CAST(date_format({x}, 'ssSSS') AS BIGINT)",
    "millisecond": "CAST(date_format({x}, 'ssSSS') AS BIGINT)",
}

_DIALECT_FN: dict[str, dict[str, str | None]] = {
    # regexp_matches is boolean partial-match in DuckDB only; in Postgres
    # it returns SETOF text[] (captured groups), so the rename is correct
    # for duckdb and LOUD for postgres.
    "duckdb": {
        **_COMMON_FN,
        "regexp_matches": "regexp_like",
        "suffix": "endswith",
        "prefix": "startswith",
        # zero-divisor → NULL in duckdb (Spark-4 ANSI mod/div raise);
        # sign semantics are C-style in both. divide() is duckdb's
        # TRUNCATING integer division (divide(7,2)=3) — handler below.
        "mod": "try_mod",
        "fmod": "try_mod",
    },
    "postgres": {**_COMMON_FN, "regexp_matches": None},
    "ansi": {},                         # ANSI names that differ are below
    "snowflake": _SNOWFLAKE_FN,
    "bigquery": _BIGQUERY_FN,
    "redshift": _REDSHIFT_FN,
    "mysql": _MYSQL_FN,
    "oracle": _ORACLE_FN,
    "tsql": _TSQL_FN,
    "trino": _TRINO_FN,
    "clickhouse": _CLICKHOUSE_FN,
}

# Type names (CAST targets and `::` casts) that differ from Spark's.
_TYPE_MAP = {
    "hugeint": "DECIMAL(38,0)",
    "int128": "DECIMAL(38,0)",
    "ubigint": "DECIMAL(20,0)",
    "uinteger": "BIGINT",
    "usmallint": "INT",
    "utinyint": "SMALLINT",
    "int1": "TINYINT",
    "int2": "SMALLINT",
    "int4": "INT",
    "int8": "BIGINT",
    "signed": "BIGINT",
    "text": "STRING",
    "varchar": "STRING",                # bare VARCHAR (no length) → STRING
    "bpchar": "STRING",
    "blob": "BINARY",
    "bytea": "BINARY",
    "real": "FLOAT",
    "float4": "FLOAT",
    "float8": "DOUBLE",
    "timestamptz": "TIMESTAMP",
    "timestamp_s": "TIMESTAMP",
    "timestamp_ms": "TIMESTAMP",
    "logical": "BOOLEAN",
    "bool": "BOOLEAN",
}

# Per-dialect overlays on _TYPE_MAP. A value of None is LOUD — the type
# has no faithful Spark representation (silently narrowing BIGNUMERIC's
# 76 digits to DECIMAL(38) would corrupt data, not transpile it).
_DIALECT_TYPES: dict[str, dict[str, str | None]] = {
    "snowflake": {
        "number": "DECIMAL(38,0)",      # bare NUMBER; NUMBER(p,s) passes through
        "float": "DOUBLE",              # Snowflake FLOAT/FLOAT4/FLOAT8/REAL are all fp64
        "float4": "DOUBLE",
        "real": "DOUBLE",
        "timestamp_ltz": "TIMESTAMP",
        "timestamp_tz": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP_NTZ",
        "byteint": "DECIMAL(38,0)",     # byteint is NUMBER(38,0) in Snowflake
        "geography": None,
        "geometry": None,
    },
    "bigquery": {
        "int64": "BIGINT",
        "float64": "DOUBLE",
        "bytes": "BINARY",
        "numeric": "DECIMAL(38,9)",
        "bignumeric": None,             # 76.76 digits exceed Spark DECIMAL(38)
        "datetime": "TIMESTAMP_NTZ",
        "geography": None,
        "json": None,                   # BQ JSON type vs Spark VARIANT → loud
    },
    "redshift": {
        "super": None,                  # semi-structured SUPER → no analog
        "varbyte": "BINARY",
        "geometry": None,
        "geography": None,
        "hllsketch": None,
        "timetz": None,                 # TIME types have no Spark analog
        "time": None,
    },
    "oracle": {
        "varchar2": "STRING",           # bare; VARCHAR2(n) via _PARAM_TYPES
        "nvarchar2": "STRING",
        "clob": "STRING",
        "nclob": "STRING",
        "long": None,                   # deprecated 2GB text → migrate first
        "raw": "BINARY",
        "long_raw": None,
        "blob": "BINARY",
        "number": None,                 # bare NUMBER has arbitrary scale
                                        # (fractions allowed) — DECIMAL(38,0)
                                        # would truncate; NUMBER(p,s) maps
        "binary_float": "FLOAT",
        "binary_double": "DOUBLE",
        "float": "DOUBLE",              # Oracle FLOAT is NUMBER-backed fp
        # Oracle DATE carries TIME-OF-DAY (second precision) — mapping to
        # Spark DATE would silently drop it.
        "date": "TIMESTAMP_NTZ",
        "timestamp": "TIMESTAMP_NTZ",   # Oracle TIMESTAMP is zone-less
        "rowid": None, "urowid": None,
        "xmltype": None,
        "sdo_geometry": None,
    },
    "tsql": {
        "datetime": "TIMESTAMP_NTZ",
        "datetime2": "TIMESTAMP_NTZ",
        "smalldatetime": "TIMESTAMP_NTZ",
        "datetimeoffset": "TIMESTAMP",
        "bit": "BOOLEAN",
        "uniqueidentifier": "STRING",
        "nvarchar": "STRING",           # bare; NVARCHAR(n) via _PARAM_TYPES
        "nchar": "STRING",
        "ntext": "STRING",
        "text": "STRING",
        "image": "BINARY",
        "varbinary": "BINARY",
        "binary": "BINARY",
        "money": "DECIMAL(19,4)",
        "smallmoney": "DECIMAL(10,4)",
        # T-SQL TINYINT is UNSIGNED 0..255; Spark's is signed -128..127 —
        # widen to keep values representable.
        "tinyint": "SMALLINT",
        "float": "DOUBLE",              # bare FLOAT defaults to fp64
        "real": "FLOAT",
        "time": None,
        "sql_variant": None,
        "xml": None,
        "geography": None, "geometry": None, "hierarchyid": None,
    },
    "clickhouse": {
        # CH Int8 is 8 BITS (TINYINT) — the base map's int8→BIGINT is the
        # Postgres/DuckDB byte-width spelling, overridden here.
        "int8": "TINYINT", "int16": "SMALLINT",
        "int32": "INT", "int64": "BIGINT",
        # Int128 max (~1.7e38) exceeds DECIMAL(38,0)'s 10^38-1 — a
        # narrowing cast would break data-dependently → loud like int256
        "int128": None, "int256": None,
        "uint8": "SMALLINT", "uint16": "INT",
        "uint32": "BIGINT", "uint64": "DECIMAL(20,0)",
        "uint128": None, "uint256": None,
        "float32": "FLOAT", "float64": "DOUBLE",
        "string": "STRING",
        "date32": "DATE",
        "datetime": "TIMESTAMP",        # epoch-stored, session-zone shown
        "datetime64": "TIMESTAMP",
        "uuid": "STRING",
        "ipv4": None, "ipv6": None,
        "json": None, "object": None,
        "enum8": None, "enum16": None, "enum": None,
        "fixedstring": None,            # value-padded equality semantics
        "tuple": None,                  # rewrite as STRUCT<...>
        "aggregatefunction": None, "simpleaggregatefunction": None,
        "point": None, "ring": None, "polygon": None, "multipolygon": None,
    },
    "trino": {
        "varbinary": "BINARY",
        # Trino TIMESTAMP is zone-less; TIMESTAMP WITH TIME ZONE (the
        # multiword form, handled in _type_token_edits) maps to the
        # fixpoint-stable TIMESTAMP_LTZ spelling.
        "timestamp": "TIMESTAMP_NTZ",
        "json": None,                   # JSON type vs Spark VARIANT → loud
        "time": None, "timetz": None,
        "uuid": "STRING",               # canonical-text round-trip
        "ipaddress": None, "ipprefix": None,
        "hyperloglog": None, "p4hyperloglog": None,
        "qdigest": None, "tdigest": None,
        "geometry": None, "sphericalgeography": None,
        "row": None,                    # ROW(...) → rewrite as STRUCT<...>
    },
    "mysql": {
        "datetime": "TIMESTAMP_NTZ",    # wall-clock, no zone
        "unsigned": "DECIMAL(20,0)",    # CAST(x AS UNSIGNED)
        "char": "STRING",               # CAST(x AS CHAR) = string conversion
        "nchar": "STRING",
        "mediumint": "INT",
        "real": "DOUBLE",               # MySQL REAL is fp64 (REAL_AS_FLOAT off)
        "tinytext": "STRING",
        "mediumtext": "STRING",
        "longtext": "STRING",
        "tinyblob": "BINARY",
        "mediumblob": "BINARY",
        "longblob": "BINARY",
        "json": None,                   # MySQL JSON type → loud
        "enum": None,
        "set": None,
        "year": None,                   # YEAR type (1901-2155) → loud
        "time": None,
        "bit": None,                    # BIT(n) bitfield → loud
        "geometry": None,
        "point": None, "linestring": None, "polygon": None,
    },
}


# Parameterized type names: the base word renames, the (p[,s]) argument
# list is preserved (CAST(x AS NUMBER(10,2)) → CAST(x AS DECIMAL(10,2))).
# Spark has no NUMBER; bare NUMBER is handled by _DIALECT_TYPES.
_PARAM_TYPES: dict[str, dict[str, str]] = {
    "snowflake": {"number": "DECIMAL"},
    "oracle": {
        "number": "DECIMAL",
        "varchar2": "VARCHAR",
        "nvarchar2": "VARCHAR",
        "raw": "BINARY",                # RAW(n) → length dropped by Spark
    },
    "tsql": {
        "nvarchar": "VARCHAR",
        "nchar": "CHAR",
        "varbinary": "BINARY",
        "binary": "BINARY",
    },
}

# Parameterized types whose precision argument has no Spark form — the
# whole ``name(args)`` span is replaced, args DROPPED (TIMESTAMP_NTZ(3)
# would not parse). Widening precision is lossless in every entry.
_PARAM_DROP_TYPES: dict[str, dict[str, str]] = {
    "tsql": {
        "datetime2": "TIMESTAMP_NTZ",
        "datetimeoffset": "TIMESTAMP",
        "float": "DOUBLE",              # FLOAT(n): n≤24 is fp32 — widened
    },
    "oracle": {
        "timestamp": "TIMESTAMP_NTZ",   # TIMESTAMP(6) fractional precision
        "float": "DOUBLE",              # FLOAT(binary_precision)
    },
    "trino": {
        "timestamp": "TIMESTAMP_NTZ",   # TIMESTAMP(3) fractional precision
    },
    "clickhouse": {
        "datetime": "TIMESTAMP",        # precision-only args drop; a
                                        # STRING (timezone) argument
                                        # RAISES in _type_token_edits —
                                        # the zone changes which instant
                                        # a string operand parses to
        "datetime64": "TIMESTAMP",      # DateTime64(3)
    },
}


import functools


@functools.lru_cache(maxsize=None)
def _type_map(read: str):
    """Merged base+overlay type map, built once per dialect — this sits on
    the per-token render hot path (every :: and CAST)."""
    base: dict[str, str | None] = dict(_TYPE_MAP)
    base.update(_DIALECT_TYPES.get(read, {}))
    return base


_LOUD_TYPE = object()  # sentinel distinguishing "no rewrite" from "loud"


def _lookup_type(read: str, tname: str) -> str | None:
    """Spark rename for ``tname`` in ``read`` dialect; None when the name
    needs no rewrite. Raises for types with no faithful Spark form."""
    mapped = _type_map(read).get(tname, _LOUD_TYPE)
    if mapped is _LOUD_TYPE:
        return None
    if mapped is None:
        raise TranspileError(
            f"type {tname!r} has no faithful Spark representation"
        )
    return mapped

# date_diff units both timestampdiff and date_trunc accept (DuckDB also
# takes plurals; anything else raises).
_DIFF_UNITS = {
    u: u.upper()
    for u in ("year", "quarter", "month", "week", "day", "hour", "minute", "second")
}
_DIFF_UNITS.update({u + "s": u.upper() for u in list(_DIFF_UNITS)})

# T-SQL DATEADD/DATEDIFF/DATEPART unit abbreviations → canonical unit.
# dayofyear/dy/y are ABSENT on purpose: DATEADD treats them as day but
# DATEPART returns day-of-year — context-dependent, so loud beats a
# guess. millisecond/microsecond work for dateadd via Spark units.
_TSQL_UNIT_ALIASES = {
    "yy": "year", "yyyy": "year",
    "qq": "quarter", "q": "quarter",
    "mm": "month", "m": "month",
    "dd": "day", "d": "day",
    "wk": "week", "ww": "week",
    "hh": "hour",
    "mi": "minute", "n": "minute",
    "ss": "second", "s": "second",
    "ms": "millisecond", "mcs": "microsecond",
    "millisecond": "millisecond", "microsecond": "microsecond",
}


def _resolve_unit(read: str, raw_unit: str) -> str | None:
    """Canonical UPPER unit for dateadd/datediff/datepart keywords, with
    T-SQL abbreviation folding. Returns None when unmapped."""
    if read == "tsql":
        raw_unit = _TSQL_UNIT_ALIASES.get(raw_unit, raw_unit)
        if raw_unit in ("millisecond", "microsecond"):
            return raw_unit.upper()
    return _DIFF_UNITS.get(raw_unit)

# C-style (strftime/strptime) → Spark datetime pattern letters. %G (ISO
# week year) and %V (ISO week) are deliberately ABSENT: Spark 3+ rejects
# the Y/w week patterns (DATETIME_PATTERN_RECOGNITION), so those codes
# raise TranspileError instead of emitting SQL that fails at run time.
_C_FMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "H": "HH", "I": "hh",
    "M": "mm", "S": "ss", "f": "SSSSSS", "g": "SSS", "p": "a", "j": "DDD",
    "a": "EEE", "A": "EEEE", "b": "MMM", "B": "MMMM", "Z": "zzz",
    "z": "xx", "%": "%",
}

# Postgres to_char/to_timestamp patterns → Spark. Sorted longest-first at
# use time so MONTH wins over its prefix MON (a literal-order list had
# made the MONTH mapping unreachable).
_PG_FMT = sorted(
    [
        ("YYYY", "yyyy"), ("YY", "yy"), ("MON", "MMM"), ("MONTH", "MMMM"),
        ("MM", "MM"), ("DDD", "DDD"), ("DD", "dd"), ("DY", "EEE"),
        ("DAY", "EEEE"), ("HH24", "HH"), ("HH12", "hh"), ("HH", "hh"),
        ("MI", "mm"), ("SS", "ss"), ("MS", "SSS"), ("US", "SSSSSS"),
        ("AM", "a"), ("PM", "a"), ("TZ", "zzz"),
    ],
    key=lambda p: -len(p[0]),
)


# ClickHouse formatDateTime %-codes → Spark datetime patterns. %M is
# deliberately ABSENT: legacy servers read it as MINUTE, 23.x+ (with
# formatdatetime_format_without_leading_zeros defaults) as MONTH NAME —
# version-ambiguous, so it raises; %i is the unambiguous minute.
_CH_FMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "H": "HH", "I": "hh",
    "i": "mm", "S": "ss", "p": "a", "j": "DDD", "a": "EEE", "W": "EEEE",
    "b": "MMM", "f": "SSSSSS", "Q": "Q",
    "F": "yyyy-MM-dd", "T": "HH:mm:ss", "R": "HH:mm", "r": "hh:mm:ss a",
    "n": "\n", "t": "\t", "%": "%",
}


def _convert_pct_format(fmt: str, table: dict[str, str], what: str) -> str:
    """Shared %-code → Spark datetime pattern conversion, quoting literal
    letter runs. Raises on a code absent from ``table``."""
    out: list[str] = []
    literal: list[str] = []

    def flush() -> None:
        if not literal:
            return
        run = "".join(literal)
        # Java patterns treat a-zA-Z as pattern letters: quote runs that
        # contain any; pure punctuation passes through unquoted.
        if re.search(r"[A-Za-z']", run):
            out.append("'" + run.replace("'", "''") + "'")
        else:
            out.append(run)
        literal.clear()

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            if i + 1 >= len(fmt):
                raise TranspileError(f"dangling % in format {fmt!r}")
            code = fmt[i + 1]
            if code not in table:
                extra = (
                    " (legacy minute vs 23.x month name — use %i for "
                    "minutes or the MMMM Spark pattern directly)"
                    if what == "clickhouse formatDateTime" and code == "M"
                    else ""
                )
                raise TranspileError(
                    f"{what} code %{code} has no Spark datetime "
                    f"pattern{extra}"
                )
            flush()
            rep = table[code]
            # Two adjacent identical codes (%Y%Y) would merge into one
            # longer Java field (yyyyyyyy = one 8-padded year, not two
            # years) — inexpressible without a separator, so refuse.
            if rep != "%" and out and out[-1] and out[-1][-1] == rep[0]:
                raise TranspileError(
                    f"adjacent %{code} codes merge in Spark datetime "
                    f"patterns; separate them in format {fmt!r}"
                )
            out.append(rep)
            i += 2
        else:
            literal.append(c)
            i += 1
    flush()
    return "".join(out)


def convert_strftime_format(fmt: str) -> str:
    """C-style → Spark datetime pattern, quoting literal letter runs.

    ``%Y-%m-%dT%H:%M:%S`` → ``yyyy-MM-dd'T'HH:mm:ss``. Raises on a ``%``
    code with no Spark equivalent (e.g. ``%U`` week-of-year-Sunday).
    """
    return _convert_pct_format(fmt, _C_FMT, "strftime")


def convert_ch_format(fmt: str) -> str:
    """ClickHouse formatDateTime %-codes → Spark datetime pattern."""
    return _convert_pct_format(fmt, _CH_FMT, "clickhouse formatDateTime")


def _convert_pg_like_format(fmt: str, allow_ff: bool) -> str:
    """Shared Postgres-style pattern scan (longest-first _PG_FMT table,
    numeric-pattern guard, loud on unmapped alpha). ``allow_ff`` adds
    Snowflake's ``FF[0-9]`` fractional-seconds prefix case — the ONLY
    difference between the two dialects' pattern languages."""
    if not any(c.isalpha() for c in fmt):
        raise TranspileError(
            f"format {fmt!r} looks numeric; only datetime "
            "patterns transpile to date_format"
        )
    out: list[str] = []
    i = 0
    n = len(fmt)
    while i < n:
        if allow_ff and fmt[i : i + 2].upper() == "FF":
            digits = 9
            skip = 2
            if i + 2 < n and fmt[i + 2].isdigit():
                digits = int(fmt[i + 2])
                skip = 3
            if digits == 0:
                raise TranspileError("FF0 fractional seconds is not a pattern")
            out.append("S" * digits)
            i += skip
            continue
        for pat, rep in _PG_FMT:
            if fmt[i : i + len(pat)].upper() == pat:
                out.append(rep)
                i += len(pat)
                break
        else:
            c = fmt[i]
            if c.isalpha():
                raise TranspileError(
                    f"format fragment {fmt[i:]!r} has no Spark mapping"
                )
            out.append(c)
            i += 1
    return "".join(out)


def convert_pg_format(fmt: str) -> str:
    """Postgres TO_CHAR pattern → Spark datetime pattern. Numeric
    to_char patterns ('999D99', 'FM...') have no Spark date_format
    equivalent — they raise rather than converting to a wrong literal."""
    return _convert_pg_like_format(fmt, allow_ff=False)


def convert_sf_format(fmt: str) -> str:
    """Snowflake TO_CHAR/TO_VARCHAR/TO_DATE/TO_TIMESTAMP pattern → Spark.
    Snowflake's pattern language is Postgres-like plus ``FF[0-9]``
    fractional seconds (bare FF = 9 digits). Numeric patterns
    ('$99,999.00') have no date_format equivalent — loud, same rule as
    convert_pg_format."""
    return _convert_pg_like_format(fmt, allow_ff=True)


# MySQL DATE_FORMAT/STR_TO_DATE %-codes → Spark datetime pattern letters.
# The code SET differs from C strftime (%i is minutes, %M is the month
# NAME, %s/%S both seconds); week-based codes (%U %u %V %v %X %x) and
# day-of-week-number (%w) are deliberately ABSENT — Spark 3+ rejects the
# week patterns, and there is no numeric-day letter — so they raise.
# %D (1st/2nd ordinal suffix) has no Spark form either.
_MYSQL_FMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "c": "M", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "h": "hh", "I": "hh", "l": "h",
    "i": "mm", "s": "ss", "S": "ss", "f": "SSSSSS", "p": "a",
    "M": "MMMM", "b": "MMM", "a": "EEE", "W": "EEEE", "j": "DDD",
    "r": "hh:mm:ss a", "T": "HH:mm:ss", "%": "%",
}

#: %-codes that indicate a TIME component — used by the STR_TO_DATE
#: handler to pick to_timestamp vs to_date (MySQL returns a DATETIME when
#: the format has time parts, a DATE otherwise).
_MYSQL_TIME_CODES = frozenset("HkhIlisSfprT")


def convert_mysql_format(fmt: str) -> str:
    """MySQL %-code pattern → Spark datetime pattern, quoting literal
    letter runs (same emitter rules as convert_strftime_format). Raises
    on codes with no Spark equivalent (%U week, %w weekday number, %D
    ordinal-suffix day).

    A format with NO %-codes never reaches here (the callers pass it
    through / reject it) — date_format shares its NAME with Spark, so the
    fixpoint's later passes re-read our own emitted Java pattern; blindly
    quoting its letters would corrupt it."""
    out: list[str] = []
    literal: list[str] = []

    def flush() -> None:
        if not literal:
            return
        run = "".join(literal)
        if re.search(r"[A-Za-z']", run):
            out.append("'" + run.replace("'", "''") + "'")
        else:
            out.append(run)
        literal.clear()

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            if i + 1 >= len(fmt):
                raise TranspileError(f"dangling % in format {fmt!r}")
            code = fmt[i + 1]
            if code not in _MYSQL_FMT:
                raise TranspileError(
                    f"mysql date format code %{code} has no Spark "
                    "datetime pattern"
                )
            flush()
            rep = _MYSQL_FMT[code]
            if rep != "%" and out and out[-1] and out[-1][-1] == rep[0]:
                raise TranspileError(
                    f"adjacent %{code} codes merge in Spark datetime "
                    f"patterns; separate them in format {fmt!r}"
                )
            out.append(rep)
            i += 2
        else:
            literal.append(c)
            i += 1
    flush()
    return "".join(out)


def _mysql_fmt_has_time(fmt: str) -> bool:
    """True when the MySQL format string carries any time-of-day code."""
    return any(
        fmt[i] == "%" and i + 1 < len(fmt) and fmt[i + 1] in _MYSQL_TIME_CODES
        for i in range(len(fmt))
    )


# ---------------------------------------------------------------------------
# Spark-version gating: rename targets that only exist on Spark >= 4.0 must
# fail at RENDER time on older sessions (loud-failure contract), not at
# execution on the cluster.
# ---------------------------------------------------------------------------

_SPARK4_TARGETS = frozenset({"listagg", "try_to_date"})


def _spark_version() -> tuple[int, int]:
    """(major, minor) of the active session if any, else the pyspark lib."""
    v = None
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            v = s.version
    except Exception:  # pragma: no cover - session probing is best-effort
        v = None
    if v is None:
        import pyspark

        v = pyspark.__version__
    parts = v.split(".")
    return int(parts[0]), int(parts[1])


def _require_spark4(fn_name: str, target: str) -> None:
    if target in _SPARK4_TARGETS and _spark_version() < (4, 0):
        major, minor = _spark_version()
        raise TranspileError(
            f"{fn_name}() transpiles to {target}(), which requires Spark >= "
            f"4.0 (session is {major}.{minor}); rewrite as "
            "concat_ws(delim, collect_list(expr)) or upgrade Spark"
        )


# ---------------------------------------------------------------------------
# Tokenization with source spans
# ---------------------------------------------------------------------------


# Escape-aware token grammar for Snowflake/BigQuery: their string
# literals use backslash escapes ('O\'Brien'), which the standard-SQL
# grammar would mis-lex (literal ends at the escaped quote). BigQuery
# additionally uses double quotes for STRINGS, not identifiers. The
# grammar itself lives in core/sqlparse.py so depends_on / lineage /
# linter lexing of the same dialect text shares one derivation.
from sqlmesh_spark.core.sqlparse import _token_re_for, ESCAPE_LITERAL_DIALECTS


def _tokenize_spans(sql: str, read: str = "") -> list[tuple[str, str, int, int]]:
    """(kind, text, start, end) per token, comments/ws skipped but their
    bytes preserved by span-based editing. For escape-literal dialects the
    grammar understands backslash-escaped quotes; BigQuery double-quoted
    tokens are re-kinded as strings (Spark's default parser also treats
    them as string literals, so they pass through valid)."""
    token_re = _token_re_for(read)
    out: list[tuple[str, str, int, int]] = []
    pos = 0
    n = len(sql)
    while pos < n:
        m = token_re.match(sql, pos)
        if not m:
            raise TranspileError(f"unexpected character {sql[pos]!r} at offset {pos}")
        kind = m.lastgroup or ""
        if kind == "dquote" and read in ("bigquery", "mysql"):
            kind = "string"
        if kind not in ("ws", "line_comment", "block_comment"):
            out.append((kind, m.group(), m.start(), m.end()))
        pos = m.end()
    return out


def _emit_infix_call(
    edits: list, toks: list, start: int, close: int, spans: list,
    op_: str, arg_text, fname: str,
) -> None:
    """Replace ``fname(a, b)`` with ``((a) op (b))`` — the ONE 2-arg
    function→infix-operator emitter (snowflake bitand family, clickhouse
    plus/minus/multiply/divide/intDiv, trino bitwise_*)."""
    if len(spans) != 2:
        raise TranspileError(f"{fname} takes 2 args")
    a = arg_text(spans[0])
    b = arg_text(spans[1])
    edits.append((start, toks[close][3], f"(({a}) {op_} ({b}))"))


def _emit_iso_dow(edits: list, start: int, end: int, close_end: int) -> None:
    """Emit ``(weekday(x) + 1)`` — the ISO Monday=1 day-of-week rewrite
    shared by trino day_of_week/dow and clickhouse toDayOfWeek."""
    edits.append((start, end, "(weekday"))
    edits.append((close_end, close_end, " + 1)"))


def _regex_escape_content(inner: str) -> str:
    """Escape regex metachars in plain text destined for a Spark string
    literal used as a regex. A literal backslash needs FOUR backslashes
    (regex ``\\\\`` with each ``\\`` doubled for the SQL literal); other
    metachars need the doubled escape + themselves. Shared by every
    plain-separator→regex rewrite so the metachar table lives once."""
    return re.sub(
        r"([.^$*+?()\[\]{}|\\])",
        lambda m: "\\\\\\\\" if m.group(1) == "\\" else "\\\\" + m.group(1),
        inner,
    )


def _regex_literal(content: str, read: str) -> str:
    """Spark literal whose CONTENT is the regex-escaped plain text — the
    ONE emitter for every plain-separator→regex rewrite."""
    return (
        "'"
        + _regex_escape_content(content).replace("'", _quote_escape(read))
        + "'"
    )


#: escapes shared by snowflake AND bigquery string grammars.
_SIMPLE_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    "\\": "\\", "'": "'", '"': '"', "`": "`",
}

#: bigquery-only escapes (GoogleSQL); snowflake reads these as the bare
#: character via its unknown-escape rule.
_BQ_EXTRA_ESCAPES = {"a": "\a", "v": "\v", "?": "?"}


def _decode_u_escape(body: str, i: int, read: str) -> tuple[str, int] | None:
    """Decode ``\\uXXXX`` (and bigquery ``\\Uhhhhhhhh``) at body[i:].
    Snowflake writes non-BMP chars as UTF-16 surrogate PAIRS of \\u
    escapes — combined here (a lone surrogate would make the output
    unencodable, crashing far from the source). BigQuery FORBIDS
    surrogate code points in \\u (non-BMP uses \\U) — LOUD, matching the
    source dialect's own rejection."""
    esc = body[i + 1 : i + 2]
    if read == "bigquery" and esc == "U":
        if not re.fullmatch(r"[0-9a-fA-F]{8}", body[i + 2 : i + 10]):
            raise TranspileError(r"\U escape needs exactly eight hex digits")
        cp = int(body[i + 2 : i + 10], 16)
        if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            raise TranspileError(f"\\U{cp:08x} is not a valid code point")
        return chr(cp), i + 10
    if not (esc == "u" and re.fullmatch(r"[0-9a-fA-F]{4}", body[i + 2 : i + 6])):
        return None
    cp = int(body[i + 2 : i + 6], 16)
    if 0xD800 <= cp <= 0xDBFF:
        if read == "snowflake" and (
            body[i + 6 : i + 8] == "\\u"
            and re.fullmatch(r"[0-9a-fA-F]{4}", body[i + 8 : i + 12])
        ):
            lo = int(body[i + 8 : i + 12], 16)
            if 0xDC00 <= lo <= 0xDFFF:
                cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                return chr(cp), i + 12
        raise TranspileError(
            f"surrogate \\u{cp:04x} in string literal"
            + (r" (bigquery non-BMP uses \U........)" if read == "bigquery" else "")
        )
    if 0xDC00 <= cp <= 0xDFFF:
        raise TranspileError(
            f"lone UTF-16 low surrogate \\u{cp:04x} in string literal"
        )
    return chr(cp), i + 6


#: character → Spark-literal escape for re-emitting decoded content. Raw
#: chars pass through (py4j ships any unicode); only chars Spark's parser
#: would misread unescaped, plus common controls for readability, map.
_SPARK_EMIT = {
    "\\": "\\\\", "\n": "\\n", "\t": "\\t",
    "\r": "\\r", "\b": "\\b",
}


def _quote_escape(read: str) -> str:
    """How an embedded quote re-emits, per READ grammar (later fixpoint
    passes re-lex our own output): doubled for std grammars (they cannot
    lex a backslash-quote), backslash-quote for snowflake/bigquery — a
    doubled-quote literal whose content STARTS with a quote would open
    with a triple-quote run that the bigquery grammar reads as a
    triple-quoted string, mis-spanning across tokens. Both forms are
    valid Spark."""
    return "\\'" if read in ESCAPE_LITERAL_DIALECTS else "''"


def _spark_string_literal(content: str, read: str) -> str:
    """Render character content as a single-quoted Spark SQL literal,
    re-lexable under the READ dialect grammar."""
    qe = _quote_escape(read)
    return (
        "'"
        + "".join(qe if c == "'" else _SPARK_EMIT.get(c, c) for c in content)
        + "'"
    )


def _raw_body(lit: str) -> str:
    """Body of a BigQuery RAW string token (after the r prefix) - no
    escape processing, but triple-quoted raw forms strip three quotes."""
    return lit[3:-3] if lit[:3] in ("'''", '"""') else lit[1:-1]

def _literal_content(lit: str, read: str) -> str:
    """Decode a string literal token's body to its character content per
    the read dialect's escape rules: '' doubling everywhere; backslash
    escapes additionally in snowflake/bigquery — ``\\uXXXX`` unicode
    (snowflake surrogate pairs combined), snowflake ``\\0``/``\\xhh``,
    bigquery ``\\ooo`` octal / ``\\[xX]hh`` hex / ``\\Uhhhhhhhh`` /
    ``\\a``/``\\v``/``\\?``. Snowflake reads any other unknown escape as
    the bare character; bigquery rejects it — LOUD here rather than
    guessing."""
    body = lit[1:-1]
    if read in _STD_LITERAL_DIALECTS:
        return body.replace("''", "'")
    q = lit[0]  # quote-doubling collapses the literal's OWN quote char
    # BigQuery triple-quoted strings ('''...''' / \"\"\"...\"\"\") lex as one
    # token (dedicated _BQ_TOKEN_RE alternatives); inside them quote chars
    # are LITERAL (no doubling rule), only backslash escapes apply.
    # BIGQUERY ONLY: snowflake has no triple form — there '''abc''' is the
    # standard doubling fold with content 'abc' INCLUDING the quotes.
    if (
        read == "bigquery"
        and len(lit) >= 6
        and lit[:3] == q * 3
        and lit[-3:] == q * 3
    ):
        body = lit[3:-3]
        q = ""  # disables the doubling branch below
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            # \uXXXX decoding is a snowflake/bigquery feature; redshift
            # (PG-8.0 escape strings) and mysql read \u as a bare 'u'.
            u = (
                _decode_u_escape(body, i, read)
                if read in ("snowflake", "bigquery")
                else None
            )
            if u is not None:
                out.append(u[0])
                i = u[1]
                continue
            if read == "mysql":
                # MySQL's fixed escape set: \0 NUL, \Z ctrl-Z, \b \n \r
                # \t, quotes, backslash; \% and \_ keep their backslash
                # (two-character output, per the manual); anything else
                # drops the backslash.
                if nxt == "0":
                    out.append("\0")
                elif nxt == "Z":
                    out.append("\x1a")
                elif nxt in ("%", "_"):
                    out.append("\\" + nxt)
                elif nxt in ("'", '"', "\\", "b", "n", "r", "t"):
                    out.append(_SIMPLE_ESCAPES[nxt])
                else:
                    out.append(nxt)
                i += 2
                continue
            if read == "redshift" and nxt in "01234567":
                m_oct = re.match(r"[0-7]{1,3}", body[i + 1 : i + 4])
                out.append(chr(int(m_oct.group(), 8)))
                i += 1 + len(m_oct.group())
                continue
            if read == "redshift" and nxt == "x":
                m_hex = re.match(r"[0-9a-fA-F]{1,2}", body[i + 2 : i + 4])
                if m_hex:
                    out.append(chr(int(m_hex.group(), 16)))
                    i += 2 + len(m_hex.group())
                    continue
                # \x with no hex digit → bare 'x' (PG unknown-escape rule)
            if read == "bigquery" and nxt in "01234567":
                # bigquery octal is EXACTLY three digits (\ooo); there is
                # no bare \0 escape
                if re.fullmatch(r"[0-7]{3}", body[i + 1 : i + 4]):
                    out.append(chr(int(body[i + 1 : i + 4], 8)))
                    i += 4
                    continue
                raise TranspileError(
                    f"bigquery octal escape in {lit!r} needs exactly "
                    "three digits (\\ooo)"
                )
            if read == "snowflake" and nxt == "0":
                out.append("\0")
                i += 2
                continue
            if read == "clickhouse":
                # ClickHouse's documented set: C escapes + \0, \xHH and
                # the \/ \= \` forms; anything else is LOUD rather than
                # guessed (the server itself warns on unknown escapes).
                if nxt == "0":
                    out.append("\0")
                    i += 2
                    continue
                if nxt in ("/", "="):
                    out.append(nxt)
                    i += 2
                    continue
                if nxt in ("a", "v"):
                    out.append(_BQ_EXTRA_ESCAPES[nxt])
                    i += 2
                    continue
                if nxt == "x" and re.fullmatch(
                    r"[0-9a-fA-F]{2}", body[i + 2 : i + 4]
                ):
                    out.append(chr(int(body[i + 2 : i + 4], 16)))
                    i += 4
                    continue
                if nxt in _SIMPLE_ESCAPES:
                    out.append(_SIMPLE_ESCAPES[nxt])
                    i += 2
                    continue
                # unknown escape: ClickHouse keeps BOTH characters
                # (parseComplexEscapeSequence) — how \1 regex backrefs
                # survive in replaceRegexpAll replacements
                out.append("\\" + nxt)
                i += 2
                continue
            if (
                nxt in ("x", "X")
                and (read == "bigquery" or (read == "snowflake" and nxt == "x"))
                and re.fullmatch(r"[0-9a-fA-F]{2}", body[i + 2 : i + 4])
            ):
                out.append(chr(int(body[i + 2 : i + 4], 16)))
                i += 4
                continue
            if nxt in _SIMPLE_ESCAPES:
                out.append(_SIMPLE_ESCAPES[nxt])
            elif read == "bigquery" and nxt in _BQ_EXTRA_ESCAPES:
                out.append(_BQ_EXTRA_ESCAPES[nxt])
            elif read in ("snowflake", "redshift"):
                # unknown escape → the bare character (both dialects'
                # documented rule; redshift inherits PG 8.0's)
                out.append(nxt)
            else:
                raise TranspileError(
                    f"escape sequence \\{nxt} in {lit!r} has no decoder"
                )
            i += 2
        elif c == q and i + 1 < len(body) and body[i + 1] == q:
            out.append(q)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _regex_replacement_to_spark(content: str) -> str:
    """Convert a read-dialect regex REPLACEMENT string (backrefs ``\\1`` …
    ``\\9``, ``\\\\`` literal backslash, ``$`` ordinary) to Java/Spark
    replacement syntax (``$1`` backrefs, ``\\$`` literal dollar). Passing
    a read-dialect replacement through unconverted silently rewrites
    every backreference as literal text — this is the fidelity seam."""
    out: list[str] = []
    i = 0
    n = len(content)
    while i < n:
        c = content[i]
        if c == "\\":
            if i + 1 >= n:
                raise TranspileError(
                    "regexp_replace replacement ends with a lone backslash"
                )
            nxt = content[i + 1]
            if nxt.isdigit():
                out.append("$" + nxt)
            elif nxt == "\\":
                out.append("\\\\")
            else:
                raise TranspileError(
                    f"replacement escape \\{nxt} has no Spark rewrite"
                )
            i += 2
        elif c == "$":
            out.append("\\$")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)



#: token kinds that can act as an identifier/name in expression position.
#: ("qident" is kept for compatibility; the span tokenizer emits
#: "bquote"/"dquote" for quoted names.)
_NAME_KINDS = ("ident", "qident", "bquote", "dquote", "brident")


def _ident_text(tok_kind: str, tok_text: str) -> str:
    """Identifier token text normalized for Spark: double-quoted and
    T-SQL bracket-quoted names become backtick-quoted (Spark reads "x"
    as a string literal and [x] as a subscript)."""
    if tok_kind == "dquote":
        inner = tok_text[1:-1].replace('""', '"')
        return "`" + inner.replace("`", "``") + "`"
    if tok_kind == "brident":
        inner = tok_text[1:-1].replace("]]", "]")
        return "`" + inner.replace("`", "``") + "`"
    return tok_text


def _match_bracket(toks: list, open_idx: int) -> int:
    """Index of the ']' matching the '[' at open_idx."""
    depth = 0
    for j in range(open_idx, len(toks)):
        kind, text, _, _ = toks[j]
        if kind == "op" and text == "[":
            depth += 1
        elif kind == "op" and text == "]":
            depth -= 1
            if depth == 0:
                return j
    raise TranspileError("unbalanced [ ] brackets")


def _backtrack_primary(toks: list, close_idx: int):
    """For a postfix subscript after ')' — `f(x)[1]`, `(a)[1]` — return the
    token index where the subscripted primary starts, or None to defer the
    rewrite to the next fixpoint pass (chained `][`)."""
    kind, text, _, _ = toks[close_idx]
    if text == "]":
        return None  # resolves next pass, after the inner subscript rewrites
    depth = 0
    for j in range(close_idx, -1, -1):
        k, t, _, _ = toks[j]
        if k == "op" and t == ")":
            depth += 1
        elif k == "op" and t == "(":
            depth -= 1
            if depth == 0:
                if (
                    j > 0
                    and toks[j - 1][0] in _NAME_KINDS
                    and (
                        toks[j - 1][1].upper() not in _EXPR_KEYWORDS
                        # keywords that ARE call-like heads whose result
                        # can be subscripted (SELECT/WHERE/AND/… are not)
                        or toks[j - 1][1].upper()
                        in ("CAST", "TRY_CAST", "ARRAY", "MAP", "STRUCT")
                    )
                ):
                    # function call: include the (possibly dotted) name
                    i = j - 1
                    while (
                        i >= 2
                        and toks[i - 1][0] == "op" and toks[i - 1][1] == "."
                        and toks[i - 2][0] in _NAME_KINDS
                    ):
                        i -= 2
                    return i
                return j
    return None


#: literal keywords that form a primary expression on their own
_PRIMARY_KEYWORDS = ("NULL", "TRUE", "FALSE")

#: keywords that can head a call-like primary — `CAST(x AS T)[1]`,
#: `ARRAY(1,2) ^ 2` — unlike clause keywords (SELECT/WHERE/AND/…)
_CALLABLE_KEYWORDS = ("CAST", "TRY_CAST", "ARRAY", "MAP", "STRUCT")


def _forward_primary(toks: list, idx: int):
    """(first, last) token-index span of the primary expression starting
    at idx — optional unary +/-/~ chain, then a literal, (possibly
    dotted) identifier with optional call parens, parenthesized
    expression, or CASE..END — plus trailing `[..]` subscript and
    `::type` cast postfixes. Returns None when the shape isn't
    recognized; callers leave the SQL untouched (loud downstream rather
    than a mis-scoped rewrite)."""
    n = len(toks)
    j = idx
    while j < n and toks[j][0] == "op" and toks[j][1] in ("+", "-", "~"):
        j += 1
    if j >= n:
        return None
    kind, text = toks[j][0], toks[j][1]
    if kind == "op" and text == "(":
        last = _call_arg_spans(toks, j)[1]
    elif kind in ("number", "string"):
        last = j
    elif kind in _NAME_KINDS:
        up = text.upper()
        if up == "CASE":
            depth = 1
            last = None
            for k in range(j + 1, n):
                tu = toks[k][1].upper() if toks[k][0] in _NAME_KINDS else ""
                if tu == "CASE":
                    depth += 1
                elif tu == "END":
                    depth -= 1
                    if depth == 0:
                        last = k
                        break
            if last is None:
                return None
        elif up in _EXPR_KEYWORDS and up not in _PRIMARY_KEYWORDS + _CALLABLE_KEYWORDS:
            return None
        else:
            last = j
            while (
                last + 2 < n
                and toks[last + 1][0] == "op" and toks[last + 1][1] == "."
                and toks[last + 2][0] in _NAME_KINDS
            ):
                last += 2
            if (
                last + 1 < n
                and toks[last + 1][0] == "op" and toks[last + 1][1] == "("
            ):
                last = _call_arg_spans(toks, last + 1)[1]
    else:
        return None
    # postfixes: subscripts and :: casts (both bind tighter than any
    # infix operator)
    while last + 1 < n and toks[last + 1][0] == "op":
        t1 = toks[last + 1][1]
        if t1 == "[":
            last = _match_bracket(toks, last + 1)
        elif t1 == "::" and last + 2 < n and toks[last + 2][0] in _NAME_KINDS:
            last += 2
            if (
                last + 1 < n
                and toks[last + 1][0] == "op" and toks[last + 1][1] == "("
            ):
                last = _call_arg_spans(toks, last + 1)[1]
        else:
            break
    return (idx, last)


def _backward_primary(toks: list, idx: int, include_unary: bool):
    """First token index of the primary expression ENDING at idx —
    mirror of _forward_primary for infix left operands (the `a` of
    `a ^ b`). include_unary pulls a leading unary +/- into the primary
    (DuckDB binds unary minus tighter than ^; Postgres does not).
    Returns None when unrecognized or when the primary ends in `]`
    (defer to the next fixpoint pass, after subscripts rewrite)."""
    kind, text = toks[idx][0], toks[idx][1]
    if kind == "op" and text in ("]", "::"):
        return None  # subscript/cast tail — resolves next pass
    if kind == "op" and text == ")":
        first = _backtrack_primary(toks, idx)
    elif kind in ("number", "string"):
        first = idx
    elif kind in _NAME_KINDS:
        up = text.upper()
        if up == "END":
            depth = 1
            first = None
            for k in range(idx - 1, -1, -1):
                tu = toks[k][1].upper() if toks[k][0] in _NAME_KINDS else ""
                if tu == "END":
                    depth += 1
                elif tu == "CASE":
                    depth -= 1
                    if depth == 0:
                        first = k
                        break
            if first is None:
                return None
        elif up in _EXPR_KEYWORDS and up not in _PRIMARY_KEYWORDS:
            return None
        else:
            first = idx
            while (
                first >= 2
                and toks[first - 1][0] == "op" and toks[first - 1][1] == "."
                and toks[first - 2][0] in _NAME_KINDS
            ):
                first -= 2
    else:
        return None
    if first is None:
        return None
    if include_unary and first > 0:
        k = first
        while k > 0 and toks[k - 1][0] == "op" and toks[k - 1][1] in ("+", "-", "~"):
            k -= 1
        if k < first:
            # the sign chain is unary only if what precedes it cannot end
            # an expression (operator other than )/], or a clause keyword)
            p = toks[k - 1] if k > 0 else None
            if p is None or (
                (p[0] == "op" and p[1] not in (")", "]"))
                or (p[0] in _NAME_KINDS and p[1].upper() in _EXPR_KEYWORDS
                    and p[1].upper() not in _PRIMARY_KEYWORDS)
            ):
                first = k
    return first


def _call_args(toks: list, open_idx: int) -> list[int]:
    """Indices of top-level argument-start tokens for the call whose '('
    is at open_idx; also returns close paren index via sentinel last item."""
    spans, close = _call_arg_spans(toks, open_idx)
    return [s for s, _ in spans] + [close]


def _call_arg_spans(toks: list, open_idx: int):
    """(first_token, last_token) index pair per top-level argument of the
    call whose '(' is at open_idx, plus the close-paren index."""
    spans: list[tuple[int, int]] = []
    depth = 0
    bdepth = 0  # bracket nesting — commas inside [1, 2] are not arg splits
    first = None
    last = None
    i = open_idx
    while i < len(toks):
        kind, text, _, _ = toks[i]
        if kind == "op" and text == "(":
            depth += 1
            if depth == 1:
                i += 1
                continue
        elif kind == "op" and text == ")":
            depth -= 1
            if depth == 0:
                if first is not None:
                    spans.append((first, last))
                return spans, i
        elif kind == "op" and text == "[":
            bdepth += 1
        elif kind == "op" and text == "]":
            bdepth -= 1
        elif depth == 1 and bdepth == 0 and kind == "op" and text == ",":
            spans.append((first, last))
            first = None
            i += 1
            continue
        if depth >= 1:
            if first is None:
                first = i
            last = i
        i += 1
    raise TranspileError("unbalanced parens in function call")


def transpile(sql: str, read: str | None = "duckdb") -> str:
    """Rewrite ``sql`` written in ``read`` dialect into Spark SQL.

    ``read`` of ``None``/``""``/``"spark"``/``"databricks"`` returns
    ``sql`` unchanged. Alias dialects (presto/athena → trino, risingwave
    → postgres, fabric → tsql) normalize before table lookup. Unknown
    dialects raise (loud, per module contract). Runs the edit pass to a
    fixpoint (bounded) so chained constructs — ``x[1][2]``, nested list
    literals — resolve one layer per pass.
    """
    if read:
        read = DIALECT_ALIASES.get(read, read)
    if not read or read == SPARK:
        return sql
    if read not in READ_DIALECTS:
        raise TranspileError(
            f"unknown read dialect {read!r}; supported: "
            f"{READ_DIALECTS + tuple(DIALECT_ALIASES)}"
        )
    out = sql
    for pass_no in range(8):
        nxt = _transpile_once(out, read, first_pass=(pass_no == 0))
        if nxt == out:
            if read in ("duckdb", "postgres"):
                # `^` is POWER in these dialects but XOR in Spark; any
                # occurrence the power() rewrite could not scope must
                # fail loud, never pass through as XOR.
                for k, t, _, _ in _tokenize_spans(nxt, read):
                    if k == "op" and t == "^":
                        raise TranspileError(
                            f"{read} ^ is exponentiation (Spark ^ is "
                            "XOR) and this operand shape has no scoped "
                            "rewrite; use power(a, b) explicitly"
                        )
            return nxt
        out = nxt
    raise TranspileError("transpile did not converge (pathological nesting)")


def _cast_as_indices(toks: list) -> set[int]:
    """Token indices of the TYPE-introducing ``AS`` of each
    CAST(...)/TRY_CAST(...) — the LAST depth-1 AS before the close paren.
    Only these positions may have their following type name renamed: an
    output alias named `text`, even inside a subquery nested in a CAST
    body, must never be rewritten."""
    out: set[int] = set()
    for i, (kind, text, _, _) in enumerate(toks):
        if (
            kind == "ident"
            and text.lower() in ("cast", "try_cast", "safe_cast")
            and i + 1 < len(toks)
            and toks[i + 1][0] == "op"
            and toks[i + 1][1] == "("
        ):
            depth = 0
            last_as = None
            for j in range(i + 1, len(toks)):
                k, t_, _, _ = toks[j]
                if k == "op" and t_ == "(":
                    depth += 1
                elif k == "op" and t_ == ")":
                    depth -= 1
                    if depth == 0:
                        if last_as is not None:
                            out.add(last_as)
                        break
                elif depth == 1 and k == "ident" and t_.upper() == "AS":
                    last_as = j
    return out


def _type_token_edits(toks, i: int, read: str, is_op) -> tuple[list, int]:
    """Shared type-rewrite decision tree for the token FOLLOWING ``::`` or
    a CAST's type-introducing AS (both syntaxes must stay in lockstep).
    Returns (edits, tokens_consumed_after_i)."""
    tname = toks[i + 1][1].lower()
    if read == "clickhouse" and is_op(i + 2, "("):
        if tname in ("nullable", "lowcardinality"):
            # Unwrap: CAST(x AS Nullable(Int64)) → CAST(x AS Int64) —
            # every Spark type is nullable and LowCardinality is a
            # storage hint. The inner type (possibly itself
            # parameterized) is rewritten on the next fixpoint pass.
            depth = 0
            close_j = None
            for j in range(i + 2, len(toks)):
                if toks[j][0] == "op" and toks[j][1] == "(":
                    depth += 1
                elif toks[j][0] == "op" and toks[j][1] == ")":
                    depth -= 1
                    if depth == 0:
                        close_j = j
                        break
            if close_j is not None:
                return (
                    [
                        (toks[i + 1][2], toks[i + 2][3], ""),
                        (toks[close_j][2], toks[close_j][3], ""),
                    ],
                    2,
                )
        if tname in ("array", "map"):
            # Array(T) → ARRAY<T>, Map(K, V) → MAP<K, V> for plain
            # single-ident element types; nested element shapes have no
            # single-pass rewrite → LOUD.
            arg_spans, close_j = _call_arg_spans(toks, i + 2)
            elems: list[str] = []
            for s_, e_ in arg_spans:
                if s_ != e_ or toks[s_][0] != "ident":
                    raise TranspileError(
                        f"clickhouse {toks[i + 1][1]}(...) with a nested "
                        "element type has no one-pass Spark rewrite; "
                        "write the Spark ARRAY<...>/MAP<...> form"
                    )
                elems.append(
                    _lookup_type(read, toks[s_][1].lower())
                    or toks[s_][1].upper()
                )
            if tname == "array" and len(elems) == 1:
                return (
                    [(toks[i + 1][2], toks[close_j][3], f"ARRAY<{elems[0]}>")],
                    close_j + 1 - i,
                )
            if tname == "map" and len(elems) == 2:
                return (
                    [(toks[i + 1][2], toks[close_j][3],
                      f"MAP<{elems[0]}, {elems[1]}>")],
                    close_j + 1 - i,
                )
            raise TranspileError(
                f"clickhouse {toks[i + 1][1]} type takes "
                f"{'1 element' if tname == 'array' else '2 elements'}"
            )
    if tname in ("timestamp", "time") and read in (
        "trino", "postgres", "oracle", "ansi", "duckdb"
    ):
        # Multiword WITH[OUT] TIME ZONE forms, optionally after a
        # precision list: TIMESTAMP(3) WITH TIME ZONE → TIMESTAMP;
        # TIMESTAMP WITHOUT TIME ZONE → TIMESTAMP_NTZ. The single-word
        # names fall through to the per-dialect tables below.
        j = i + 2
        if is_op(j, "("):
            depth = 0
            while j < len(toks):
                if toks[j][0] == "op" and toks[j][1] == "(":
                    depth += 1
                elif toks[j][0] == "op" and toks[j][1] == ")":
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                j += 1
        if (
            j + 2 < len(toks)
            and all(toks[k][0] == "ident" for k in (j, j + 1, j + 2))
            and toks[j][1].upper() in ("WITH", "WITHOUT")
            and toks[j + 1][1].upper() == "TIME"
            and toks[j + 2][1].upper() == "ZONE"
        ):
            if tname == "time":
                raise TranspileError(
                    "TIME types have no Spark analog; store as STRING or "
                    "seconds-since-midnight"
                )
            # TIMESTAMP_LTZ, not bare TIMESTAMP: for trino the bare name
            # means zone-LESS, so a later fixpoint pass would re-read an
            # emitted TIMESTAMP and map it to TIMESTAMP_NTZ. The _LTZ
            # spelling is the same Spark type and is fixpoint-stable.
            mapped_tz = (
                "TIMESTAMP_LTZ" if toks[j][1].upper() == "WITH"
                else "TIMESTAMP_NTZ"
            )
            return [(toks[i + 1][2], toks[j + 2][3], mapped_tz)], j + 3 - i
    if (
        read == "mysql"
        and tname in ("signed", "unsigned")
        and i + 2 < len(toks)
        and toks[i + 2][0] == "ident"
        and toks[i + 2][1].lower() == "integer"
    ):
        # MySQL's two-word CAST targets: SIGNED [INTEGER] / UNSIGNED
        # [INTEGER] — consume the optional INTEGER into the rewrite.
        mapped2 = _lookup_type(read, tname) or toks[i + 1][1].upper()
        return [(toks[i + 1][2], toks[i + 2][3], mapped2)], 3
    if is_op(i + 2, "[") and is_op(i + 3, "]"):
        elem = _lookup_type(read, tname) or toks[i + 1][1].upper()
        return [(toks[i + 1][2], toks[i + 3][3], f"ARRAY<{elem}>")], 4
    if is_op(i + 2, "("):
        # find the matching close paren of the type-arg list
        depth = 0
        close_j = None
        for j in range(i + 2, len(toks)):
            if toks[j][0] == "op" and toks[j][1] == "(":
                depth += 1
            elif toks[j][0] == "op" and toks[j][1] == ")":
                depth -= 1
                if depth == 0:
                    close_j = j
                    break
        dtype = _PARAM_DROP_TYPES.get(read, {}).get(tname)
        if dtype is not None and close_j is not None:
            # ClickHouse DateTime('Asia/Tokyo') / DateTime64(3, 'tz'): a
            # STRING argument is a parse/display timezone that changes
            # which INSTANT a string operand parses to — dropping it
            # silently would shift values (the toDateTime(x, 'tz')
            # function form raises for the same reason).
            if read == "clickhouse" and any(
                toks[k][0] == "string" for k in range(i + 2, close_j)
            ):
                raise TranspileError(
                    f"clickhouse {toks[i + 1][1]}(...) with a timezone "
                    "argument has no faithful Spark CAST (the zone "
                    "changes the parsed instant); convert explicitly "
                    "with to_utc_timestamp/from_utc_timestamp"
                )
            return [(toks[i + 1][2], toks[close_j][3], dtype)], close_j + 1 - i
        # T-SQL (MAX) length specifier — no Spark form; drop to the
        # unbounded base type (VARCHAR(MAX)→STRING, VARBINARY(MAX)→BINARY)
        if (
            read == "tsql"
            and close_j == i + 4
            and toks[i + 3][0] == "ident"
            and toks[i + 3][1].lower() == "max"
        ):
            base_u = "BINARY" if "binary" in tname else "STRING"
            return [(toks[i + 1][2], toks[close_j][3], base_u)], close_j + 1 - i
        ptype = _PARAM_TYPES.get(read, {}).get(tname)
        if ptype is not None:
            return [(toks[i + 1][2], toks[i + 1][3], ptype)], 2
        # a type that is LOUD in bare form (mapped None) is just as
        # unrepresentable with parameters: ROW(x int), TIME(3), BIT(3)
        if _type_map(read).get(tname, _LOUD_TYPE) is None:
            raise TranspileError(
                f"type {tname!r} has no faithful Spark representation"
            )
        return [], 2
    mapped = _lookup_type(read, tname)
    if mapped is not None:
        return [(toks[i + 1][2], toks[i + 1][3], mapped)], 2
    return [], 2


def _transpile_once(sql: str, read: str, first_pass: bool = True) -> str:
    fn_map = _DIALECT_FN[read]
    toks = _tokenize_spans(sql, read)
    cast_as_idx = _cast_as_indices(toks)
    edits: list[tuple[int, int, str]] = []  # (start, end, replacement)

    if read in ("mysql", "clickhouse") and first_pass:
        # MySQL/ClickHouse `# ...` line comments: comments normally pass
        # through byte-identical (they're skipped, not tokens), but
        # Spark's parser rejects `#` — re-lex including comment matches
        # and rewrite the marker to `--`. The lexer guarantees a `#`
        # inside a string or backtick span never matches as a comment.
        token_re = _token_re_for(read)
        pos = 0
        while pos < len(sql):
            m = token_re.match(sql, pos)
            if not m:
                break  # main loop raises the proper error
            if m.lastgroup == "line_comment" and m.group().startswith("#"):
                edits.append((m.start(), m.start() + 1, "--"))
            pos = m.end()

    def is_op(i: int, val: str) -> bool:
        return 0 <= i < len(toks) and toks[i][0] == "op" and toks[i][1] == val

    i = 0
    n = len(toks)
    while i < n:
        kind, text, start, end = toks[i]

        # `//` integer division → DIV (adjacent '/' '/' spans). For
        # duckdb the next pass wraps DIV's divisor in nullif (below).
        if kind == "op" and text == "/" and is_op(i + 1, "/") and toks[i + 1][2] == end:
            edits.append((start, toks[i + 1][3], " DIV "))
            i += 2
            continue

        # DuckDB `/`, `%` and `//`(→DIV above) return NULL on a zero
        # divisor; Spark 4 (ANSI on) raises DIVIDE_BY_ZERO — wrap the
        # divisor in nullif(d, 0) (x / NULL is NULL in both engines).
        # Runs every pass: pending rewrites inside the divisor (subscripts,
        # :: casts) defer it to the next pass, and the nullif(…, 0) guard
        # keeps the fixpoint convergent. Postgres raises on zero division
        # like ANSI — no rewrite. Unrecognized divisor shapes stay
        # untouched (ANSI raise: loud, never silent-wrong).
        if (
            read == "duckdb"
            and (
                (kind == "op" and text in ("/", "%") and not is_op(i + 1, "/"))
                or (kind in _NAME_KINDS and text.upper() == "DIV")
            )
        ):
            span = _forward_primary(toks, i + 1)
            if span is not None:
                ps = toks[span[0]][2]
                pe = toks[span[1]][3]
                k0 = span[0]
                while toks[k0][0] == "op" and toks[k0][1] in ("+", "-", "~"):
                    k0 += 1
                already = False
                if (
                    toks[k0][0] in _NAME_KINDS
                    and toks[k0][1].lower() == "nullif"
                    and is_op(k0 + 1, "(")
                ):
                    nspans, _nc = _call_arg_spans(toks, k0 + 1)
                    if (
                        len(nspans) == 2
                        and nspans[1][0] == nspans[1][1]
                        and toks[nspans[1][0]][0] == "number"
                        and toks[nspans[1][0]][1] == "0"
                    ):
                        already = True
                if not already and not any(
                    e[1] >= ps and e[0] <= pe for e in edits
                ):
                    edits.append((ps, ps, "nullif("))
                    edits.append((pe, pe, ", 0)"))
            i += 1
            continue

        # DuckDB/Postgres `^` (and DuckDB `**`) are POWER; Spark's `^` is
        # bitwise XOR — passing it through would be silently wrong
        # (2 ^ 3 = 1). Rewrite a ^ b → power(a, b); left-associative
        # chains resolve over fixpoint passes (both engines' ^ is
        # left-assoc). DuckDB binds unary minus tighter than ^
        # (-2 ^ 2 = 4); Postgres does not (-2 ^ 2 = -4) — include_unary
        # per dialect. A `^` whose operands never resolve is caught by
        # the post-fixpoint guard in transpile() (loud, never XOR).
        if (
            read in ("duckdb", "postgres")
            and kind == "op"
            and (
                text == "^"
                or (
                    read == "duckdb"
                    and text == "*"
                    and is_op(i + 1, "*")
                    and toks[i + 1][2] == end
                )
            )
        ):
            two_star = text == "*"
            op_end = toks[i + 1][3] if two_star else end
            right_idx = i + 2 if two_star else i + 1
            lfirst = (
                _backward_primary(toks, i - 1, include_unary=(read == "duckdb"))
                if i > 0 else None
            )
            rspan = _forward_primary(toks, right_idx)
            if lfirst is not None and rspan is not None:
                ls = toks[lfirst][2]
                re_ = toks[rspan[1]][3]
                if not any(e[1] >= ls and e[0] <= re_ for e in edits):
                    edits.append((ls, ls, "power("))
                    edits.append((start, op_end, ", "))
                    edits.append((re_, re_, ")"))
                    # keep scanning INSIDE the right operand so its own
                    # first-pass handlers still run this pass
                    i = right_idx
                    continue
            i += 1
            continue

        # Redshift SYSDATE is a bare keyword (no parens) returning the UTC
        # transaction timestamp.
        if (
            read == "redshift"
            and kind == "ident"
            and text.lower() == "sysdate"
            and not is_op(i + 1, "(")
        ):
            edits.append(
                (start, end,
                 "to_utc_timestamp(current_timestamp(), current_timezone())")
            )
            i += 1
            continue

        # Trino/Oracle TIMESTAMP '...' typed literals are zone-LESS (the
        # same type CAST(x AS timestamp) maps to TIMESTAMP_NTZ); Spark's
        # bare TIMESTAMP literal is session-zone LTZ — emit the NTZ
        # spelling so both spellings of the type agree. ONLY for plain
        # date-time content: a literal carrying a zone/offset suffix
        # ('... America/Los_Angeles', '... +02:00') is a WITH TIME ZONE
        # literal whose instant Spark's LTZ literal already honors —
        # left untouched (an NTZ rewrite would silently drop the zone).
        if (
            read in ("trino", "oracle")
            and kind == "ident"
            and text.upper() == "TIMESTAMP"
            and i + 1 < n
            and toks[i + 1][0] == "string"
        ):
            lit_content = _literal_content(toks[i + 1][1], read)
            if re.fullmatch(
                r"\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?",
                lit_content.strip(),
            ):
                edits.append((start, end, "TIMESTAMP_NTZ"))
            i += 2
            continue

        # Trino AT TIME ZONE: changes the display zone of the same
        # instant — Spark timestamps are session-zone-normalized with no
        # per-value zone, so there is no faithful rewrite. LOUD.
        if (
            read == "trino"
            and kind == "ident"
            and text.upper() == "AT"
            and i + 2 < n
            and toks[i + 1][0] == "ident"
            and toks[i + 1][1].upper() == "TIME"
            and toks[i + 2][0] == "ident"
            and toks[i + 2][1].upper() == "ZONE"
        ):
            raise TranspileError(
                "AT TIME ZONE has no faithful Spark rewrite (Spark "
                "timestamps carry no per-value zone); rewrite with "
                "to_utc_timestamp/from_utc_timestamp explicitly"
            )

        # ClickHouse ternary `cond ? a : b` — rewriting needs expression
        # boundaries the token pass doesn't model; Spark would misparse.
        if read == "clickhouse" and kind == "op" and text == "?":
            raise TranspileError(
                "clickhouse ternary `cond ? a : b` has no token-level "
                "Spark rewrite; use if(cond, a, b)"
            )

        if read == "clickhouse" and kind == "ident":
            up_ = text.upper()
            # PREWHERE is WHERE plus a storage-level early-filter hint;
            # Spark would read the keyword as a table alias. Rewrite to
            # WHERE — but ONLY in FROM-target position (walk back over
            # `[AS] alias` + a dotted path / subquery close to FROM), so
            # a column or alias named prewhere never corrupts; those and
            # post-join placements raise with guidance instead. If the
            # query also has its own WHERE, the doubled keyword fails
            # Spark's parser (loud, never silent).
            if up_ == "PREWHERE":
                j = i - 1
                pw_ok = False
                for _hop in range(10):
                    if j < 0:
                        break
                    tk_, tv_ = toks[j][0], toks[j][1]
                    if tk_ == "op" and tv_ == ")":
                        pw_ok = True  # subquery close in FROM
                        break
                    if tk_ == "ident" and tv_.upper() == "FROM":
                        pw_ok = True
                        break
                    if tk_ == "ident" and tv_.upper() == "AS":
                        j -= 1
                        continue
                    if tk_ in _NAME_KINDS and tv_.upper() not in _EXPR_KEYWORDS:
                        j -= 1
                        if j >= 0 and toks[j][0] == "op" and toks[j][1] == ".":
                            j -= 1
                        continue
                    break
                if not pw_ok:
                    raise TranspileError(
                        "PREWHERE outside FROM-target position has no "
                        "safe rewrite; move the condition into WHERE, or "
                        "quote the identifier if a column is named "
                        "prewhere"
                    )
                edits.append((start, end, "WHERE"))
                i += 1
                continue
            # FROM t FINAL forces merge-time dedup; Spark would silently
            # read FINAL as a table alias, dropping the semantic. A column
            # genuinely named final can be backtick/double-quoted.
            if up_ == "FINAL" and not is_op(i + 1, "("):
                raise TranspileError(
                    "clickhouse FINAL has no Spark rewrite (deduplicate "
                    "explicitly, e.g. ROW_NUMBER() = 1); quote the "
                    "identifier if a column is named final"
                )
            # SAMPLE 0.1 / SAMPLE 10000 — approximate sampling clause
            if (
                up_ == "SAMPLE"
                and i + 1 < n
                and toks[i + 1][0] == "number"
            ):
                raise TranspileError(
                    "clickhouse SAMPLE has no direct Spark rewrite; use "
                    "TABLESAMPLE explicitly"
                )
            # trailing SETTINGS name = value
            if (
                up_ == "SETTINGS"
                and i + 2 < n
                and toks[i + 1][0] == "ident"
                and is_op(i + 2, "=")
            ):
                raise TranspileError(
                    "clickhouse SETTINGS clause has no Spark equivalent; "
                    "move session settings to the gateway config"
                )
            # LIMIT n BY cols — per-group limit
            if (
                up_ == "LIMIT"
                and i + 2 < n
                and toks[i + 1][0] == "number"
                and toks[i + 2][0] == "ident"
                and toks[i + 2][1].upper() == "BY"
            ):
                raise TranspileError(
                    "clickhouse LIMIT n BY has no Spark clause; rewrite "
                    "with ROW_NUMBER() OVER (PARTITION BY ...) <= n"
                )
            # [LEFT] ARRAY JOIN — ClickHouse's unnest clause. Spark would
            # read `t ARRAY` as a table alias and join a RELATION named
            # after the array — silent corruption, so rewrite:
            #   t [LEFT] ARRAY JOIN expr AS e
            #   → t LATERAL VIEW explode[_outer](expr) e_lv AS e
            if (
                up_ == "ARRAY"
                and i + 1 < n
                and toks[i + 1][0] == "ident"
                and toks[i + 1][1].upper() == "JOIN"
            ):
                aj_outer = (
                    i > 0
                    and toks[i - 1][0] == "ident"
                    and toks[i - 1][1].upper() == "LEFT"
                )
                region_start_tok = i - 1 if aj_outer else i
                j = i + 2
                if not (
                    j < n
                    and toks[j][0] in _NAME_KINDS
                    and toks[j][1].upper() not in _EXPR_KEYWORDS
                ):
                    raise TranspileError(
                        "ARRAY JOIN operand must be a column or call "
                        "to transpile"
                    )
                k_ = j
                while (
                    k_ + 2 < n
                    and toks[k_ + 1][0] == "op" and toks[k_ + 1][1] == "."
                    and toks[k_ + 2][0] in _NAME_KINDS
                ):
                    k_ += 2
                if is_op(k_ + 1, "("):
                    _aj_spans, k_ = _call_arg_spans(toks, k_ + 1)
                aj_expr = transpile(sql[toks[j][2] : toks[k_][3]], read)
                j = k_ + 1
                if j < n and toks[j][0] == "ident" and toks[j][1].upper() == "AS":
                    j += 1
                if not (
                    j < n
                    and toks[j][0] in _NAME_KINDS
                    and toks[j][1].upper() not in _EXPR_KEYWORDS
                ):
                    raise TranspileError(
                        "ARRAY JOIN without an element alias SHADOWS the "
                        "source column in ClickHouse — no Spark rewrite; "
                        "add `AS alias`"
                    )
                aj_alias = _ident_text(toks[j][0], toks[j][1])
                region_end_tok = j
                if is_op(j + 1, ","):
                    raise TranspileError(
                        "multi-array ARRAY JOIN iterates arrays in "
                        "LOCKSTEP; zip them with arrays_zip and unnest "
                        "the single zipped array"
                    )
                fn_ = "explode_outer" if aj_outer else "explode"
                edits.append(
                    (toks[region_start_tok][2], toks[region_end_tok][3],
                     f" LATERAL VIEW {fn_}({aj_expr}) {aj_alias}_lv "
                     f"AS {aj_alias}")
                )
                i = region_end_tok + 1
                continue

            # Join strictness/locality modifiers precede the direction in
            # ClickHouse: [GLOBAL] [ANY|ALL|ASOF|SEMI|ANTI] LEFT|... JOIN.
            # SEMI/ANTI LEFT reorder to Spark's LEFT SEMI/ANTI; ALL is the
            # standard-SQL default and drops; ANY (row-dedup), ASOF and
            # GLOBAL (distributed locality) have no Spark semantic.
            _JOIN_DIRS = ("JOIN", "LEFT", "RIGHT", "INNER", "FULL", "CROSS")
            if i + 1 < n and toks[i + 1][0] == "ident" and (
                toks[i + 1][1].upper() in _JOIN_DIRS
                or toks[i + 1][1].upper() in ("ANY", "ALL", "SEMI", "ANTI")
            ):
                nxt_up = toks[i + 1][1].upper()
                if up_ in ("GLOBAL", "ASOF", "ANY") and (
                    nxt_up in _JOIN_DIRS or nxt_up in ("ANY", "ALL", "SEMI", "ANTI")
                ):
                    raise TranspileError(
                        f"clickhouse {up_} join modifier has no Spark rewrite"
                    )
                if up_ in ("ALL", "SEMI", "ANTI") and nxt_up in _JOIN_DIRS:
                    if up_ == "ALL":
                        # standard join semantics — drop the keyword
                        edits.append((start, toks[i + 1][2], ""))
                        i += 1
                        continue
                    if nxt_up == "LEFT":
                        # SEMI LEFT JOIN → LEFT SEMI JOIN
                        edits.append((start, toks[i + 1][3], f"LEFT {up_}"))
                        i += 2
                        continue
                    if nxt_up == "JOIN" and i > 0 and \
                            toks[i - 1][0] == "ident" and \
                            toks[i - 1][1].upper() == "LEFT":
                        # LEFT SEMI JOIN — already Spark's order (our own
                        # rewrite output on a later fixpoint pass)
                        i += 1
                        continue
                    raise TranspileError(
                        f"clickhouse {up_} {nxt_up} JOIN has no Spark "
                        "rewrite (Spark supports LEFT SEMI/ANTI only)"
                    )
            # GLOBAL IN / GLOBAL NOT IN — distributed-locality subquery
            if up_ == "GLOBAL" and i + 1 < n and toks[i + 1][0] == "ident" \
                    and toks[i + 1][1].upper() in ("IN", "NOT"):
                raise TranspileError(
                    "clickhouse GLOBAL IN has no Spark rewrite (Spark "
                    "subqueries are already cluster-wide); drop GLOBAL"
                )

        if read == "oracle" and kind == "ident":
            low = text.lower()
            # SYSDATE / SYSTIMESTAMP bare keywords: DB-server wall clock →
            # session clock (documented equivalence; Oracle has no session
            # TZ notion for SYSDATE).
            if low in ("sysdate", "systimestamp") and not is_op(i + 1, "("):
                edits.append((start, end, "current_timestamp()"))
                i += 1
                continue
            # FROM dual → remove (Spark SELECT needs no FROM clause).
            if (
                low == "dual"
                and i > 0
                and toks[i - 1][0] == "ident"
                and toks[i - 1][1].upper() == "FROM"
            ):
                edits.append((toks[i - 1][2], end, ""))
                i += 1
                continue
            # MINUS set operator → EXCEPT (reserved in Oracle, so a bare
            # ident is always the operator).
            if low == "minus":
                edits.append((start, end, "EXCEPT"))
                i += 1
                continue
            if low == "rownum":
                raise TranspileError(
                    "oracle ROWNUM has no Spark rewrite; use ROW_NUMBER() "
                    "OVER (...) or LIMIT"
                )
            # q'[...]' alternative quoting mis-lexes under the standard
            # grammar — loud before it can corrupt.
            if (
                low in ("q", "nq")
                and i + 1 < n
                and toks[i + 1][0] == "string"
                and toks[i + 1][2] == end
            ):
                raise TranspileError(
                    "oracle q'...' alternative quoting is not supported; "
                    "rewrite as a standard quoted literal"
                )

        # Oracle (+) outer-join marker — no Spark rewrite.
        if (
            read == "oracle"
            and kind == "op" and text == "("
            and is_op(i + 1, "+") and is_op(i + 2, ")")
        ):
            raise TranspileError(
                "oracle (+) outer-join syntax has no Spark rewrite; use "
                "ANSI LEFT/RIGHT JOIN"
            )

        # ANSI/Oracle/Postgres row-limiting clauses Spark lacks:
        #   OFFSET m ROWS [FETCH FIRST|NEXT n ROWS|ROW ONLY] → LIMIT n OFFSET m
        #   FETCH FIRST|NEXT n ROWS|ROW ONLY → LIMIT n
        # (T-SQL's OFFSET..FETCH is the same grammar.)
        if (
            read in ("oracle", "ansi", "postgres", "tsql", "trino")
            and kind == "ident"
            and text.upper() in ("OFFSET", "FETCH")
        ):
            j = i
            off_txt = None
            if toks[j][1].upper() == "OFFSET":
                if (
                    j + 2 < n
                    and toks[j + 1][0] == "number"
                    and toks[j + 2][0] == "ident"
                    and toks[j + 2][1].upper() in ("ROW", "ROWS")
                ):
                    off_txt = toks[j + 1][1]
                    j += 3
                else:
                    i += 1  # plain OFFSET n (already Spark) — untouched
                    continue
            cnt_txt = None
            if (
                j < n
                and toks[j][0] == "ident"
                and toks[j][1].upper() == "FETCH"
                and j + 1 < n
                and toks[j + 1][0] == "ident"
                and toks[j + 1][1].upper() in ("FIRST", "NEXT")
            ):
                k_ = j + 2
                if k_ < n and toks[k_][0] == "number":
                    cnt_txt = toks[k_][1]
                    k_ += 1
                else:
                    cnt_txt = "1"
                if not (
                    k_ + 1 < n
                    and toks[k_][0] == "ident"
                    and toks[k_][1].upper() in ("ROW", "ROWS")
                    and toks[k_ + 1][0] == "ident"
                    and toks[k_ + 1][1].upper() == "ONLY"
                ):
                    raise TranspileError(
                        "FETCH FIRST ... requires ROWS ONLY (WITH TIES / "
                        "PERCENT have no Spark rewrite)"
                    )
                j = k_ + 2
            elif off_txt is None:
                i += 1  # bare FETCH ident (not the clause) — untouched
                continue
            parts = []
            if cnt_txt is not None:
                parts.append(f"LIMIT {cnt_txt}")
            if off_txt is not None:
                parts.append(f"OFFSET {off_txt}")
            edits.append((start, toks[j - 1][3], " ".join(parts)))
            i = j
            continue

        # T-SQL N'...' unicode literal prefix: Spark strings are already
        # unicode — drop the N (adjacency = no whitespace, so a column
        # named n is never touched).
        if (
            read == "tsql"
            and kind == "ident"
            and text.lower() == "n"
            and i + 1 < n
            and toks[i + 1][0] == "string"
            and toks[i + 1][2] == end
        ):
            edits.append((start, end, ""))
            i += 1
            continue

        # T-SQL SELECT TOP n [select-list...] → LIMIT n at the scope end.
        if (
            read == "tsql"
            and kind == "ident"
            and text.upper() == "TOP"
            and i > 0
            and toks[i - 1][0] == "ident"
            and toks[i - 1][1].upper() in ("SELECT", "DISTINCT")
            and i + 1 < n
            and toks[i + 1][0] == "number"
        ):
            n_txt = toks[i + 1][1]
            after = i + 2
            if (
                after < n
                and toks[after][0] == "ident"
                and toks[after][1].upper() in ("PERCENT", "WITH")
            ):
                raise TranspileError(
                    "TOP n PERCENT / WITH TIES has no Spark rewrite"
                )
            # find this SELECT's scope end: depth-0 ')' or set-op keyword
            # or end of text
            depth = 0
            end_pos = len(sql)
            setop_after = False
            for j in range(i + 2, n):
                k_, t_, s_, _e = toks[j]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                    if depth < 0:
                        end_pos = s_
                        break
                elif (
                    depth == 0
                    and k_ == "ident"
                    and t_.upper() in ("UNION", "INTERSECT", "EXCEPT", "MINUS")
                ):
                    end_pos = s_
                    setop_after = True
                    break
            # a set-op BEFORE this SELECT at the same depth means we're a
            # non-first union branch
            setop_before = False
            sel_idx = i - 1 if toks[i - 1][1].upper() == "SELECT" else i - 2
            depth = 0
            for j in range(sel_idx - 1, -1, -1):
                k_, t_, _s, _e = toks[j]
                if k_ == "op" and t_ == ")":
                    depth += 1
                elif k_ == "op" and t_ == "(":
                    depth -= 1
                    if depth < 0:
                        break
                elif (
                    depth == 0
                    and k_ == "ident"
                    and t_.upper() in ("UNION", "INTERSECT", "EXCEPT", "MINUS")
                ):
                    setop_before = True
                    break
            # drop "TOP n" and attach LIMIT at the scope end. A trailing
            # LIMIT in a set operation binds to the WHOLE union in Spark,
            # so a union branch gets parenthesized: (SELECT ... LIMIT n).
            edits.append((start, toks[i + 1][3], ""))
            if setop_after or setop_before:
                edits.append((toks[sel_idx][2], toks[sel_idx][2], "("))
                edits.append((end_pos, end_pos, f" LIMIT {n_txt}) "))
            else:
                edits.append((end_pos, end_pos, f" LIMIT {n_txt} "))
            i += 2
            continue

        if read == "mysql":
            # MySQL `||` is logical OR (PIPES_AS_CONCAT off, the default);
            # Spark reads it as string concat — silent wrong values.
            if kind == "op" and text == "||":
                edits.append((start, end, " OR "))
                i += 1
                continue
            # JSON column->path / column->>path operators — loud (the
            # MySQL JSON type itself is unmapped).
            if kind == "op" and text == "->":
                raise TranspileError(
                    "mysql JSON -> / ->> operators have no Spark rewrite"
                )
            # XOR is a reserved MySQL boolean operator Spark lacks.
            if kind == "ident" and text.upper() == "XOR":
                raise TranspileError(
                    "mysql XOR operator has no Spark equivalent; rewrite "
                    "as (a OR b) AND NOT (a AND b)"
                )
            # LIMIT offset, count → LIMIT count OFFSET offset. LIMIT is
            # reserved in MySQL, so a bare ident here is the clause (a
            # column of that name would be backtick-quoted).
            if (
                kind == "ident"
                and text.upper() == "LIMIT"
                and i + 3 < n
                and toks[i + 1][0] == "number"
                and is_op(i + 2, ",")
                and toks[i + 3][0] == "number"
            ):
                off_txt = toks[i + 1][1]
                cnt_txt = toks[i + 3][1]
                edits.append(
                    (toks[i + 1][2], toks[i + 3][3],
                     f"{cnt_txt} OFFSET {off_txt}")
                )
                i += 4
                continue

        # BigQuery raw/bytes string prefixes: r'...' keeps backslashes
        # literal (ubiquitous for regex patterns) — re-emit as a Spark
        # literal with the backslashes escaped; b'...'/rb'...' BYTES
        # literals have no Spark string form — LOUD. The prefix lexes as
        # a separate ident, so adjacency (no whitespace) is the signature.
        if (
            read == "bigquery"
            and kind == "ident"
            and text.lower() in ("r", "b", "rb", "br")
            and i + 1 < n
            and toks[i + 1][0] == "string"
            and toks[i + 1][2] == end
            and not any(e_start <= start < e_end for e_start, e_end, _ in edits)
        ):
            if "b" in text.lower():
                raise TranspileError(
                    "BigQuery bytes literals (b'...') have no Spark string "
                    "rewrite; use an explicit CAST or unhex"
                )
            body = _raw_body(toks[i + 1][1])
            lit = _spark_string_literal(body, read)
            edits.append((start, toks[i + 1][3], lit))
            i += 2
            continue

        # Bracket syntax: list literals → array(...), subscripts (1-based
        # in DuckDB/Postgres, matching element_at) → element_at(...).
        # Snowflake/BigQuery bare subscripts are 0-BASED — exactly Spark's
        # native arr[i] semantics — so for those reads subscripts pass
        # through untouched (rewriting via 1-based element_at would be a
        # silent off-by-one); only the bracket LITERAL forms rewrite.
        if kind == "op" and text == "[":
            if read == "mysql":
                raise TranspileError(
                    "mysql has no array/bracket expression syntax; "
                    "brackets in mysql-dialect model SQL are not "
                    "transpilable"
                )
            close = _match_bracket(toks, i)
            # DuckDB slice syntax x[1:3] has no element_at analog — LOUD.
            bdepth = 0
            for j in range(i + 1, close):
                k_, t_, _, _ = toks[j]
                if k_ == "op" and t_ in ("(", "["):
                    bdepth += 1
                elif k_ == "op" and t_ in (")", "]"):
                    bdepth -= 1
                elif bdepth == 0 and k_ == "op" and t_ == ":":
                    raise TranspileError(
                        "array slice syntax [a:b] has no Spark rewrite; "
                        "use slice(arr, start, length) explicitly"
                    )
            prev = toks[i - 1] if i > 0 else None
            # Redshift SUPER-array subscripts are 0-based too (pass-through
            # = Spark's native semantics).
            zero_based = read in ("snowflake", "bigquery", "redshift")
            # DuckDB string subscript: 'abc'[2] is 1-based single-char
            # extraction → substr(lit, idx, 1).
            if prev is not None and prev[0] == "string" and not zero_based:
                edits.append((prev[2], prev[2], "substr("))
                edits.append((start, end, ", "))
                edits.append((toks[close][2], toks[close][3], ", 1)"))
                i += 1
                continue
            # Postgres/DuckDB ARRAY[...] literal
            if prev is not None and prev[0] == "ident" and prev[1].lower() == "array":
                edits.append((prev[2], end, "array("))
                edits.append((toks[close][2], toks[close][3], ")"))
                i += 1
                continue
            is_subscript = (
                prev is not None
                and (
                    (prev[0] in _NAME_KINDS and prev[1].upper() not in _EXPR_KEYWORDS)
                    or (prev[0] == "op" and prev[1] in (")", "]"))
                )
            )
            if not is_subscript:
                edits.append((start, end, "array("))
                edits.append((toks[close][2], toks[close][3], ")"))
                i += 1
                continue
            if read == "clickhouse":
                # CH subscripts return the element type's DEFAULT (0, '')
                # out of bounds / for a missing map key — the common
                # arr[indexOf(keys, k)] idiom RELIES on arr[0] being the
                # default. element_at raises for index 0 and (under
                # Spark 4 ANSI) out of bounds — same loud stance as the
                # arrayElement() function spelling.
                raise TranspileError(
                    "clickhouse [..] subscripts return the element "
                    "type's default out of bounds; no faithful Spark "
                    "rewrite — use try_element_at + coalesce explicitly"
                )
            if prev[0] == "op":
                j = _backtrack_primary(toks, i - 1)
            else:
                j = i - 1
                while (
                    j >= 2
                    and toks[j - 1][0] == "op" and toks[j - 1][1] == "."
                    and toks[j - 2][0] in _NAME_KINDS
                ):
                    j -= 2
            if zero_based:
                # BigQuery arr[SAFE_OFFSET(i)] / arr[SAFE_ORDINAL(i)]
                # return NULL out of bounds (plain subscripts error under
                # ANSI) → try_element_at, compensating its 1-based index.
                if (
                    read == "bigquery"
                    and j is not None
                    and toks[i + 1][0] == "ident"
                    and toks[i + 1][1].lower() in ("safe_offset", "safe_ordinal")
                    and is_op(i + 2, "(")
                    and not any(e[0] >= toks[j][2] for e in edits)
                ):
                    fn_close = _call_args(toks, i + 2)[-1]
                    if fn_close == close - 1:
                        safe_name = toks[i + 1][1].lower()
                        edits.append((toks[j][2], toks[j][2], "try_element_at("))
                        # `[ SAFE_OFFSET (` → `, (`
                        edits.append((start, toks[i + 2][3], ", ("))
                        if safe_name == "safe_offset":
                            # 0-based → 1-based
                            edits.append(
                                (toks[fn_close][2], toks[close][3], ") + 1)")
                            )
                        else:
                            edits.append(
                                (toks[fn_close][2], toks[close][3], "))")
                            )
                        i += 1
                        continue
                # Otherwise Spark's arr[i] is 0-based like
                # Snowflake/BigQuery — pass the subscript through
                # (OFFSET/ORDINAL wrappers are compensated by their own
                # handlers).
                i += 1
                continue
            if j is None or any(e[0] >= toks[j][2] for e in edits):
                i += 1  # defer the bracket to the next fixpoint pass
                continue
            if read in ("duckdb", "postgres"):
                # DuckDB/Postgres subscripts return NULL out of bounds
                # AND for index 0 (verified: ([1,2,3])[10] → NULL,
                # ([1,2,3])[0] → NULL); Spark-4 ANSI element_at raises
                # on both (try_element_at still raises for index 0) →
                # try_element_at + nullif(i, 0). Negative indexes count
                # from the end in both engines. Trino/ANSI keep plain
                # element_at below: their bracket subscripts ERROR out
                # of bounds, which ANSI element_at matches.
                edits.append((toks[j][2], toks[j][2], "try_element_at("))
                edits.append((start, end, ", nullif("))
                edits.append((toks[close][2], toks[close][3], ", 0))"))
                i += 1
                continue
            edits.append((toks[j][2], toks[j][2], "element_at("))
            edits.append((start, end, ", "))
            edits.append((toks[close][2], toks[close][3], ")"))
            i += 1  # keep scanning inside the subscript expression
            continue

        # `* EXCLUDE (...)` → `* EXCEPT (...)` (DuckDB star modifier).
        # DuckDB also allows a bare single column (`* EXCLUDE a`); Spark
        # EXCEPT requires parens, so the bare form gains them.
        if (
            kind == "ident"
            and text.upper() == "EXCLUDE"
            and i > 0
            and is_op(i - 1, "*")
        ):
            edits.append((start, end, "EXCEPT"))
            if not is_op(i + 1, "(") and i + 1 < n and toks[i + 1][0] in _NAME_KINDS:
                j = i + 1
                while (
                    j + 2 < n
                    and toks[j + 1][0] == "op" and toks[j + 1][1] == "."
                    and toks[j + 2][0] in _NAME_KINDS
                ):
                    j += 2
                edits.append((toks[i + 1][2], toks[i + 1][2], "("))
                edits.append((toks[j][3], toks[j][3], ")"))
            i += 1
            continue

        # `::type` cast target rename; `::type[]` (Postgres array-type
        # cast) becomes `::ARRAY<type>`.
        if kind == "op" and text == "::" and i + 1 < n and toks[i + 1][0] == "ident":
            type_edits, consumed = _type_token_edits(toks, i, read, is_op)
            edits.extend(type_edits)
            i += consumed
            continue

        # CAST(x AS type): rename — ONLY the type-introducing AS of a
        # CAST/TRY_CAST (the last depth-1 AS); aliases named like types,
        # even inside subqueries nested in a CAST body, stay untouched.
        if (
            kind == "ident"
            and text.upper() == "AS"
            and i in cast_as_idx
            and i + 1 < n
            and toks[i + 1][0] == "ident"
        ):
            type_edits, consumed = _type_token_edits(toks, i, read, is_op)
            edits.extend(type_edits)
            i += consumed
            continue

        # QUALIFY (DuckDB/Snowflake/BigQuery window filter; Spark has no
        # equivalent clause). Rewrite the SELECT block:
        #   SELECT <list> FROM ... QUALIFY <pred> [ORDER BY ...]
        # →
        #   SELECT * EXCEPT (__sqlmesh_qualify__) FROM (
        #     SELECT <list>, (<pred>) AS __sqlmesh_qualify__ FROM ...
        #   ) WHERE __sqlmesh_qualify__ [ORDER BY ...]
        # The predicate (window exprs included — they're legal in a select
        # list) evaluates inside; the outer WHERE filters on the boolean
        # and `* EXCEPT` drops the synthetic column. ORDER BY / LIMIT
        # after QUALIFY land in the OUTER query, preserving their scope.
        if (
            kind == "ident"
            and text.upper() == "QUALIFY"
            and read in ("duckdb", "snowflake", "bigquery", "redshift")
        ):
            # locate the owning SELECT (nearest, scanning back at depth 0)
            depth = 0
            sel_idx = None
            for j in range(i - 1, -1, -1):
                k_, t_, _, _ = toks[j]
                if k_ == "op" and t_ == ")":
                    depth += 1
                elif k_ == "op" and t_ == "(":
                    depth -= 1
                    if depth < 0:
                        break
                elif depth == 0 and k_ == "ident" and t_.upper() == "SELECT":
                    sel_idx = j
                    break
            if sel_idx is None:
                raise TranspileError("QUALIFY without an owning SELECT")
            if toks[sel_idx + 1][0] == "ident" and toks[sel_idx + 1][1].upper() == "DISTINCT":
                # Snowflake applies QUALIFY BEFORE DISTINCT; injecting the
                # predicate column would change the distinct key set.
                raise TranspileError(
                    "QUALIFY with SELECT DISTINCT has no faithful Spark "
                    "rewrite; deduplicate in an outer query instead"
                )
            # matching FROM of that SELECT (forward, same depth)
            depth = 0
            from_idx = None
            for j in range(sel_idx + 1, i):
                k_, t_, _, _ = toks[j]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                elif depth == 0 and k_ == "ident" and t_.upper() == "FROM":
                    from_idx = j
                    break
            if from_idx is None:
                raise TranspileError("QUALIFY in a SELECT without FROM")
            # predicate span: from after QUALIFY to the next same-depth
            # terminator (ORDER/LIMIT/OFFSET/FETCH/WINDOW/set-op/;/close)
            terminators = {
                "ORDER", "LIMIT", "OFFSET", "FETCH", "WINDOW",
                "UNION", "EXCEPT", "INTERSECT", "MINUS",
            }
            depth = 0
            bdepth = 0  # [...] nesting — OFFSET/ORDER-class idents inside
            # a subscript are not clause terminators
            pred_end_tok = len(toks)
            for j in range(i + 1, len(toks)):
                k_, t_, _, _ = toks[j]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                    if depth < 0:
                        pred_end_tok = j
                        break
                elif k_ == "op" and t_ == "[":
                    bdepth += 1
                elif k_ == "op" and t_ == "]":
                    bdepth -= 1
                elif depth == 0 and bdepth == 0 and (
                    (k_ == "ident" and t_.upper() in terminators)
                    or (k_ == "op" and t_ == ";")
                ):
                    pred_end_tok = j
                    break
            if pred_end_tok == i + 1:
                raise TranspileError("QUALIFY with an empty predicate")
            pred_text = transpile(
                sql[toks[i + 1][2] : toks[pred_end_tok - 1][3]], read
            )
            q_col = "__sqlmesh_qualify__"
            edits.append(
                (toks[sel_idx][2], toks[sel_idx][2],
                 f"SELECT * EXCEPT ({q_col}) FROM (")
            )
            edits.append(
                (toks[from_idx][2], toks[from_idx][2],
                 f", ({pred_text}) AS {q_col} ")
            )
            pred_span_end = toks[pred_end_tok - 1][3]
            edits.append((start, pred_span_end, f") WHERE {q_col}"))
            # Skip the consumed predicate tokens — their spans are inside
            # the replacement; the COPY in the select list transpiles on
            # later fixpoint passes (plain renames; first-pass-only
            # literal handlers inside a QUALIFY predicate fail loudly at
            # execution rather than silently).
            i = pred_end_tok
            continue

        if kind == "ident" and is_op(i + 1, "("):
            name = text.lower()

            # Dotted call: `schema.fn(...)` is a qualified UDF whose LAST
            # segment must not be renamed by the builtin maps (renaming
            # s.epoch() to s.unix_timestamp() would corrupt a user UDF
            # reference). BigQuery's SAFE. prefix (NULL-on-error calls) is
            # a semantic wrapper with no Spark rewrite — LOUD.
            if i > 0 and is_op(i - 1, "."):
                if (
                    read == "bigquery"
                    and i >= 2
                    and toks[i - 2][0] == "ident"
                    and toks[i - 2][1].lower() == "safe"
                ):
                    raise TranspileError(
                        f"SAFE.{text}() has no Spark rewrite; use the "
                        "try_-prefixed function if one exists"
                    )
                i += 1
                continue

            def _arg_text(span: tuple[int, int]) -> str:
                # Recursively transpile copied argument text: the tokens of
                # a consumed region are SKIPPED by the outer scan, and
                # later fixpoint passes run with first_pass handlers off —
                # a plain copy would silently ship untranspiled literals
                # (e.g. a SPLIT separator inside UNNEST). The fragment is a
                # balanced expression, so the full pipeline (including
                # literal doubling for standard-literal dialects) applies.
                return transpile(sql[toks[span[0]][2] : toks[span[1]][3]], read)

            # listagg (snowflake native, or any dialect passing it through)
            # only exists on Spark >= 4.0 — gate at render time.
            if name == "listagg":
                _require_spark4(name, "listagg")

            # ---- Snowflake-specific handlers
            if read == "snowflake":
                if name in ("to_varchar", "to_char") and first_pass:
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 1:
                        edits.append((start, end, "CAST"))
                        edits.append((toks[close][2], toks[close][2], " AS STRING"))
                    elif (
                        len(spans) == 2
                        and toks[spans[1][0]][0] == "string"
                        and spans[1][0] == spans[1][1]
                    ):
                        fmt_tok = toks[spans[1][0]]
                        converted = convert_sf_format(
                            _literal_content(fmt_tok[1], read)
                        )
                        edits.append((start, end, "date_format"))
                        edits.append(
                            (fmt_tok[2], fmt_tok[3],
                             _spark_string_literal(converted, read))
                        )
                    else:
                        raise TranspileError(
                            f"{name} needs a literal format to transpile from snowflake"
                        )
                    i += 1
                    continue

                if name in (
                    "to_date", "to_timestamp", "to_timestamp_ntz",
                    "to_timestamp_ltz", "to_timestamp_tz", "try_to_timestamp",
                    "try_to_date",
                ) and first_pass:
                    spans, _close = _call_arg_spans(toks, i + 1)
                    target = {
                        "to_date": "to_date",
                        "try_to_date": "try_to_date",  # native on Spark 4.0+
                        "try_to_timestamp": "try_to_timestamp",
                    }.get(name, "to_timestamp")
                    _require_spark4(name, target)
                    if len(spans) == 2:
                        if toks[spans[1][0]][0] != "string" or spans[1][0] != spans[1][1]:
                            raise TranspileError(
                                f"{name} needs a single literal format to "
                                "transpile from snowflake (2nd arg may be a "
                                "scale or an expression, which Spark's "
                                "to_timestamp cannot express)"
                            )
                        fmt_tok = toks[spans[1][0]]
                        converted = convert_sf_format(
                            _literal_content(fmt_tok[1], read)
                        )
                        edits.append(
                            (fmt_tok[2], fmt_tok[3],
                             _spark_string_literal(converted, read))
                        )
                    elif len(spans) == 1 and target in ("to_timestamp", "try_to_timestamp"):
                        # Snowflake 1-arg TO_TIMESTAMP accepts BOTH
                        # timestamp strings AND epoch seconds (numbers or
                        # numeric strings) — a bare Spark to_timestamp
                        # NULLs/errors on epochs. Try the string parse
                        # first, fall back to epoch-seconds; exactly one
                        # branch is non-NULL for any given value.
                        arg = _arg_text(spans[0])
                        close_tok = _close
                        # Snowflake treats numeric values AND integer-
                        # shaped strings as epochs, auto-scaled by
                        # magnitude: seconds < 31536000000 <= millis <
                        # 31536000000000 <= micros < 31536000000000000 <=
                        # nanos. The epoch branch must be FIRST: '2023'
                        # is epoch-seconds in Snowflake, but a string
                        # parser would read it as year 2023. The probe
                        # goes THROUGH STRING (TRY_CAST(ts AS BIGINT)
                        # fails ANALYSIS for timestamp/date columns, and
                        # a timestamp rendered to string is not digit-
                        # shaped, so such columns correctly fall to the
                        # parse branch with full sub-second precision).
                        # Divergence, documented: unparseable garbage
                        # yields NULL here where Snowflake's non-TRY
                        # form errors. (The argument repeats in the
                        # rendered SQL — Spark dedups common
                        # subexpressions; accepted for fidelity.)
                        # Fractional numeric epochs (DOUBLE/DECIMAL columns,
                        # '1.5e9' strings) fail the BIGINT probe but are
                        # still epochs in Snowflake — a second DOUBLE probe
                        # catches them (same magnitude ladder, fraction
                        # preserved to micros). Timestamp/date columns fail
                        # both probes (their string forms contain dashes)
                        # and correctly fall to the parse branch.
                        v = f"TRY_CAST(CAST({arg} AS STRING) AS BIGINT)"
                        d = f"TRY_CAST(CAST({arg} AS STRING) AS DOUBLE)"
                        repl = (
                            f"CASE "
                            f"WHEN {v} IS NOT NULL AND abs({v}) < 31536000000 THEN timestamp_seconds({v}) "
                            f"WHEN {v} IS NOT NULL AND abs({v}) < 31536000000000 THEN timestamp_millis({v}) "
                            f"WHEN {v} IS NOT NULL AND abs({v}) < 31536000000000000 THEN timestamp_micros({v}) "
                            f"WHEN {v} IS NOT NULL THEN timestamp_micros({v} DIV 1000) "
                            f"WHEN {d} IS NOT NULL AND abs({d}) < 31536000000 THEN timestamp_micros(CAST({d} * 1000000 AS BIGINT)) "
                            f"WHEN {d} IS NOT NULL AND abs({d}) < 31536000000000 THEN timestamp_micros(CAST({d} * 1000 AS BIGINT)) "
                            f"WHEN {d} IS NOT NULL AND abs({d}) < 31536000000000000 THEN timestamp_micros(CAST({d} AS BIGINT)) "
                            f"WHEN {d} IS NOT NULL THEN timestamp_micros(CAST({d} / 1000 AS BIGINT)) "
                            f"ELSE try_to_timestamp(CAST({arg} AS STRING)) END"
                        )
                        edits.append((start, toks[close_tok][3], repl))
                        i = close_tok + 1
                        continue
                    elif len(spans) != 1:
                        raise TranspileError(f"{name} takes 1 or 2 args")
                    if name != target:
                        edits.append((start, end, target))
                    i += 1
                    continue

                if name in ("sysdate", "systimestamp"):
                    # UTC wall-clock, regardless of session timezone.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if spans:
                        raise TranspileError(f"{name} takes no arguments")
                    edits.append(
                        (start, toks[close][3],
                         "to_utc_timestamp(current_timestamp(), current_timezone())")
                    )
                    i = close + 1
                    continue

                if name == "split" and first_pass:
                    # Snowflake SPLIT separates on a PLAIN string; Spark
                    # split()'s separator is a regex — escape metachars.
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2:
                        raise TranspileError("snowflake split takes 2 args")
                    sep = toks[spans[1][0]]
                    if sep[0] != "string" or spans[1][0] != spans[1][1]:
                        raise TranspileError(
                            "snowflake split separator must be a literal to "
                            "transpile (Spark split() treats it as a regex)"
                        )
                    content = _literal_content(sep[1], read)
                    edits.append((sep[2], sep[3], _regex_literal(content, read)))
                    i += 1
                    continue

                if name == "dayofweekiso":
                    # 1=Monday..7=Sunday — Spark weekday() is 0=Monday..6.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError("dayofweekiso takes 1 arg")
                    edits.append(
                        (start, toks[close][3],
                         f"(weekday({_arg_text(spans[0])}) + 1)")
                    )
                    i = close + 1
                    continue

                if name == "yearofweekiso":
                    # ISO week-numbering year — Spark extract(YEAROFWEEK).
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError("yearofweekiso takes 1 arg")
                    edits.append(
                        (start, toks[close][3],
                         f"extract(YEAROFWEEK FROM {_arg_text(spans[0])})")
                    )
                    i = close + 1
                    continue

                if name in ("to_double", "try_to_double"):
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError(
                            f"{name} with a format argument has no Spark "
                            "CAST rewrite"
                        )
                    cast_fn = "TRY_CAST" if name.startswith("try_") else "CAST"
                    edits.append((start, end, cast_fn))
                    edits.append((toks[close][2], toks[close][2], " AS DOUBLE"))
                    i += 1
                    continue

                if name in ("bitand", "bitor", "bitxor"):
                    spans, close = _call_arg_spans(toks, i + 1)
                    op = {"bitand": "&", "bitor": "|", "bitxor": "^"}[name]
                    _emit_infix_call(
                        edits, toks, start, close, spans, op, _arg_text, name
                    )
                    i = close + 1
                    continue

                if name == "editdistance":
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 2:
                        edits.append((start, end, "levenshtein"))
                        i += 1
                        continue
                    if len(spans) == 3:
                        # Spark's 3-arg levenshtein returns -1 when the
                        # distance exceeds the threshold; Snowflake returns
                        # the capped max_distance. Distance is never
                        # negative, so nullif(-1) is unambiguous. Literal
                        # non-negative max only — a negative max's Snowflake
                        # behavior is undocumented, so it stays LOUD.
                        m_tok = toks[spans[2][0]]
                        if not (spans[2][0] == spans[2][1] and m_tok[0] == "number"):
                            raise TranspileError(
                                "editdistance max_distance must be a literal "
                                "non-negative number to transpile"
                            )
                        a = _arg_text(spans[0])
                        b = _arg_text(spans[1])
                        m_text = m_tok[1]
                        # -1 means over-threshold (→ cap); NULL inputs must
                        # stay NULL, so the coalesce is guarded by cheap IS
                        # NULL checks rather than repeating the expensive
                        # levenshtein in both CASE arms (Spark does not
                        # guarantee common-subexpression elimination).
                        edits.append(
                            (start, toks[close][3],
                             f"CASE WHEN ({a}) IS NULL OR ({b}) IS NULL "
                             f"THEN NULL ELSE coalesce(nullif("
                             f"levenshtein({a}, {b}, {m_text}), -1), "
                             f"{m_text}) END")
                        )
                        i = close + 1
                        continue
                    raise TranspileError("editdistance takes 2 or 3 args")

                if name == "nullifzero":
                    _spans, close = _call_arg_spans(toks, i + 1)
                    edits.append((start, end, "nullif"))
                    edits.append((toks[close][2], toks[close][2], ", 0"))
                    i += 1
                    continue
                if name == "zeroifnull":
                    _spans, close = _call_arg_spans(toks, i + 1)
                    edits.append((start, end, "coalesce"))
                    edits.append((toks[close][2], toks[close][2], ", 0"))
                    i += 1
                    continue
                if name == "square":
                    _spans, close = _call_arg_spans(toks, i + 1)
                    edits.append((start, end, "power"))
                    edits.append((toks[close][2], toks[close][2], ", 2"))
                    i += 1
                    continue
                if name == "div0":
                    # DIV0(a, b): 0 when b = 0, but NULL inputs stay NULL —
                    # coalesce(try_divide(a,b), 0) would turn NULL inputs
                    # into 0. IF(b = 0, 0, a / b) preserves both: b NULL
                    # makes the condition NULL→false→NULL result.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2:
                        raise TranspileError("div0 expects 2 args")
                    a_text = _arg_text(spans[0])
                    b_text = _arg_text(spans[1])
                    # NULL dividend propagates even when the divisor is 0
                    # (Snowflake only substitutes 0 where division would
                    # otherwise error on a real dividend).
                    repl = (
                        f"if(({b_text}) = 0 AND ({a_text}) IS NOT NULL, 0, "
                        f"({a_text}) / ({b_text}))"
                    )
                    edits.append((start, toks[close][3], repl))
                    i = close + 1
                    continue
                if name == "regexp_substr":
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2:
                        raise TranspileError(
                            "regexp_substr with position/occurrence/parameter "
                            "args has no direct Spark rewrite"
                        )
                    # Whole-match extraction. Snowflake returns NULL on no
                    # match; Spark regexp_extract returns '' — wrap in
                    # nullif so IS NULL filters / COALESCE defaults keep
                    # their Snowflake behavior.
                    edits.append((start, end, "nullif(regexp_extract"))
                    edits.append((toks[close][2], toks[close][2], ", 0"))
                    edits.append((toks[close][3], toks[close][3], ", '')"))
                    i += 1
                    continue
                if name in ("to_number", "to_decimal", "to_numeric",
                            "try_to_number", "try_to_decimal", "try_to_numeric"):
                    spans, close = _call_arg_spans(toks, i + 1)
                    cast_fn = "TRY_CAST" if name.startswith("try_") else "CAST"
                    if len(spans) == 1:
                        edits.append((start, end, cast_fn))
                        edits.append(
                            (toks[close][2], toks[close][2], " AS DECIMAL(38,0)")
                        )
                    elif (
                        len(spans) in (2, 3)
                        and all(
                            sp[0] == sp[1] and toks[sp[0]][0] == "number"
                            for sp in spans[1:]
                        )
                    ):
                        p = toks[spans[1][0]][1]
                        s_ = toks[spans[2][0]][1] if len(spans) == 3 else "0"
                        edits.append((start, end, cast_fn))
                        edits.append(
                            (toks[spans[0][1]][3], toks[close][2],
                             f" AS DECIMAL({p},{s_})")
                        )
                    else:
                        raise TranspileError(
                            f"{name} with a format string has no Spark CAST rewrite"
                        )
                    i += 1
                    continue
                if name == "flatten" and i > 0 and toks[i - 1][0] == "ident" \
                        and toks[i - 1][1].upper() == "LATERAL":
                    # LATERAL FLATTEN(input => arr) f  →
                    #   LATERAL VIEW posexplode(arr) f AS index, value
                    # Snowflake's f.value / f.index references resolve
                    # against the generated column list (both 0-based).
                    spans, close = _call_arg_spans(toks, i + 1)
                    expr_text = None
                    outer = False
                    for a_first, a_last in spans:
                        if (
                            toks[a_first][0] == "ident"
                            and a_first + 2 <= a_last
                            and is_op(a_first + 1, "=")
                            and is_op(a_first + 2, ">")
                        ):
                            key = toks[a_first][1].lower()
                            val_text = sql[toks[a_first + 3][2] : toks[a_last][3]]
                            if key == "input":
                                expr_text = transpile(val_text, read)
                            elif key == "outer":
                                outer = val_text.strip().lower() == "true"
                            else:
                                raise TranspileError(
                                    f"FLATTEN({key} => ...) has no Spark rewrite "
                                    "(only input/outer transpile)"
                                )
                        elif expr_text is None:
                            expr_text = transpile(
                                sql[toks[a_first][2] : toks[a_last][3]], read
                            )
                        else:
                            raise TranspileError(
                                "FLATTEN with multiple positional args has no "
                                "Spark rewrite"
                            )
                    if expr_text is None:
                        raise TranspileError("FLATTEN needs an input argument")
                    # optional [AS] alias after the close paren
                    j = close + 1
                    if j < n and toks[j][0] == "ident" and toks[j][1].upper() == "AS":
                        j += 1
                    if j < n and toks[j][0] in _NAME_KINDS and \
                            toks[j][1].upper() not in _EXPR_KEYWORDS:
                        alias = _ident_text(toks[j][0], toks[j][1])
                        region_end_tok = j
                    else:
                        alias = "_flattened"
                        region_end_tok = close
                    # swallow a preceding comma / CROSS|INNER JOIN connector
                    lat_idx = i - 1
                    region_start_tok = lat_idx
                    p = lat_idx - 1
                    if p >= 0 and is_op(p, ","):
                        region_start_tok = p
                    elif p >= 0 and toks[p][0] == "ident" and toks[p][1].upper() == "JOIN":
                        region_start_tok = p
                        if p - 1 >= 0 and toks[p - 1][0] == "ident" and \
                                toks[p - 1][1].upper() in ("CROSS", "INNER"):
                            region_start_tok = p - 1
                        elif p - 1 >= 0 and toks[p - 1][0] == "ident" and \
                                toks[p - 1][1].upper() in (
                                    "LEFT", "RIGHT", "FULL", "OUTER"
                                ):
                            # outer-ness comes from FLATTEN's outer =>
                            # TRUE param; a directional JOIN would leave
                            # its keyword dangling before LATERAL VIEW
                            raise TranspileError(
                                f"{toks[p - 1][1].upper()} JOIN LATERAL "
                                "FLATTEN has no Spark rewrite; use "
                                "FLATTEN(..., outer => TRUE) with a "
                                "CROSS JOIN"
                            )
                    fn = "posexplode_outer" if outer else "posexplode"
                    repl = f" LATERAL VIEW {fn}({expr_text}) {alias} AS index, value"
                    edits.append(
                        (toks[region_start_tok][2], toks[region_end_tok][3], repl)
                    )
                    i = region_end_tok + 1
                    continue

            # ---- BigQuery-specific handlers
            if read == "bigquery":
                if name == "unnest":
                    # FROM-clause UNNEST — four shapes:
                    #   t, UNNEST(x) AS e [WITH OFFSET [AS] o]
                    #   t CROSS|INNER JOIN UNNEST(x) e ...
                    #   t LEFT [OUTER] JOIN UNNEST(x) e ON TRUE  (outer)
                    #   FROM UNNEST(x) AS e                      (standalone)
                    # → LATERAL VIEW [pos]explode[_outer](x) _u AS [o,] e
                    # (standalone → FROM (SELECT explode(x) AS e)).
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError("UNNEST takes exactly one array arg")
                    expr_text = transpile(
                        sql[toks[spans[0][0]][2] : toks[spans[0][1]][3]], read
                    )
                    # alias
                    j = close + 1
                    if j < n and toks[j][0] == "ident" and toks[j][1].upper() == "AS":
                        j += 1
                    if j < n and toks[j][0] in _NAME_KINDS and \
                            toks[j][1].upper() not in _EXPR_KEYWORDS and \
                            toks[j][1].upper() not in ("WITH", "ON"):
                        alias = _ident_text(toks[j][0], toks[j][1])
                        region_end_tok = j
                        j += 1
                    else:
                        raise TranspileError(
                            "UNNEST without an alias cannot be referenced "
                            "after transpile; add `AS name`"
                        )
                    # WITH OFFSET [AS] o
                    offset_alias = None
                    if (
                        j + 1 < n
                        and toks[j][0] == "ident" and toks[j][1].upper() == "WITH"
                        and toks[j + 1][0] == "ident"
                        and toks[j + 1][1].upper() == "OFFSET"
                    ):
                        j += 2
                        region_end_tok = j - 1  # ...WITH OFFSET consumed
                        had_as = False
                        if j < n and toks[j][0] == "ident" and toks[j][1].upper() == "AS":
                            j += 1
                            had_as = True
                        # Same keyword guard as the element alias: a bare
                        # WHERE/GROUP/ORDER after `WITH OFFSET` is the next
                        # clause, not the alias.
                        if j < n and toks[j][0] in _NAME_KINDS and (
                            had_as
                            or (
                                toks[j][1].upper() not in _EXPR_KEYWORDS
                                and toks[j][1].upper() not in ("WITH", "ON")
                            )
                        ):
                            offset_alias = _ident_text(toks[j][0], toks[j][1])
                            region_end_tok = j
                            j += 1
                        else:
                            offset_alias = "offset"
                    # preceding connector
                    p = i - 1
                    outer = False
                    is_join = False
                    standalone = False
                    region_start_tok = i
                    if p >= 0 and is_op(p, ","):
                        region_start_tok = p
                    elif p >= 0 and toks[p][0] == "ident" and toks[p][1].upper() == "JOIN":
                        region_start_tok = p
                        is_join = True
                        q = p - 1
                        if q >= 0 and toks[q][0] == "ident" and toks[q][1].upper() == "OUTER":
                            q -= 1
                        if q >= 0 and toks[q][0] == "ident" and \
                                toks[q][1].upper() in ("RIGHT", "FULL"):
                            raise TranspileError(
                                f"{toks[q][1].upper()} JOIN UNNEST has no "
                                "LATERAL VIEW rewrite"
                            )
                        if q >= 0 and toks[q][0] == "ident" and \
                                toks[q][1].upper() in ("CROSS", "INNER", "LEFT"):
                            region_start_tok = q
                            outer = toks[q][1].upper() == "LEFT"
                    elif p >= 0 and toks[p][0] == "ident" and toks[p][1].upper() == "FROM":
                        standalone = True
                    # Join forms may carry ON TRUE (mandatory for LEFT,
                    # legal for [INNER] JOIN) — swallow it; any other ON
                    # condition (or a missing one on LEFT) is LOUD rather
                    # than leaving an orphaned ON clause in the output.
                    if is_join or outer:
                        if (
                            j + 1 < n
                            and toks[j][0] == "ident" and toks[j][1].upper() == "ON"
                            and toks[j + 1][0] == "ident"
                            and toks[j + 1][1].upper() == "TRUE"
                        ):
                            region_end_tok = j + 1
                        elif outer:
                            raise TranspileError(
                                "LEFT JOIN UNNEST with a non-TRUE ON condition "
                                "has no LATERAL VIEW rewrite"
                            )
                        elif j < n and toks[j][0] == "ident" and \
                                toks[j][1].upper() == "ON":
                            raise TranspileError(
                                "JOIN UNNEST with a non-TRUE ON condition "
                                "has no LATERAL VIEW rewrite"
                            )
                    if standalone:
                        if offset_alias is not None:
                            repl = (
                                f"(SELECT posexplode({expr_text}) "
                                f"AS ({offset_alias}, {alias}))"
                            )
                        else:
                            repl = f"(SELECT explode({expr_text}) AS {alias})"
                    else:
                        suffix = "_outer" if outer else ""
                        # the generated VIEW name must be a plain
                        # identifier even when the alias is quoted
                        view = "_u_" + re.sub(r"\W+", "", alias)
                        if offset_alias is not None:
                            repl = (
                                f" LATERAL VIEW posexplode{suffix}({expr_text}) "
                                f"{view} AS {offset_alias}, {alias}"
                            )
                        else:
                            repl = (
                                f" LATERAL VIEW explode{suffix}({expr_text}) "
                                f"{view} AS {alias}"
                            )
                    edits.append(
                        (toks[region_start_tok][2], toks[region_end_tok][3], repl)
                    )
                    i = region_end_tok + 1
                    continue

                if name in ("timestamp_diff", "date_diff", "datetime_diff") and first_pass:
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 3:
                        raise TranspileError(f"bigquery {name} expects 3 args")
                    u_tok = toks[spans[2][0]]
                    if u_tok[0] != "ident" or spans[2][0] != spans[2][1]:
                        raise TranspileError(f"{name} unit must be a bare keyword")
                    raw_unit = u_tok[1].lower()
                    unit = _DIFF_UNITS.get(raw_unit)
                    if unit is None or raw_unit.startswith("week"):
                        # BigQuery WEEK boundaries start Sunday; Spark
                        # date_trunc weeks start Monday → silent off-by-one.
                        raise TranspileError(
                            f"{name} unit {raw_unit!r} has no faithful Spark rewrite"
                        )
                    later = _arg_text(spans[0])
                    earlier = _arg_text(spans[1])
                    if name == "timestamp_diff":
                        # complete elapsed units (truncation toward zero)
                        repl = f"timestampdiff({unit}, {earlier}, {later})"
                    else:
                        # DATE_DIFF/DATETIME_DIFF count boundary crossings
                        u = unit.lower()
                        repl = (
                            f"timestampdiff({unit}, date_trunc('{u}', {earlier}), "
                            f"date_trunc('{u}', {later}))"
                        )
                    edits.append((start, toks[close][3], repl))
                    i = close + 1
                    continue

                if name in (
                    "timestamp_add", "timestamp_sub", "date_add", "date_sub",
                    "datetime_add", "datetime_sub",
                ) and first_pass:
                    spans, close = _call_arg_spans(toks, i + 1)
                    # Spark's own date_add(d, n) / date_sub(d, n) share these
                    # names — only the INTERVAL form is BigQuery syntax.
                    if (
                        len(spans) == 2
                        and toks[spans[1][0]][0] == "ident"
                        and toks[spans[1][0]][1].upper() == "INTERVAL"
                    ):
                        unit_tok = toks[spans[1][1]]
                        raw_unit = unit_tok[1].lower() if unit_tok[0] == "ident" else ""
                        unit = _DIFF_UNITS.get(raw_unit)
                        if unit is None:
                            raise TranspileError(
                                f"{name} interval unit {raw_unit!r} has no "
                                "Spark timestampadd equivalent"
                            )
                        n_text = transpile(
                            sql[
                                toks[spans[1][0] + 1][2] : toks[spans[1][1] - 1][3]
                            ].strip(),
                            read,
                        )
                        if not n_text:
                            raise TranspileError(f"{name} interval missing count")
                        if name.endswith("_sub"):
                            n_text = f"-({n_text})"
                        base = _arg_text(spans[0])
                        repl = f"timestampadd({unit}, {n_text}, {base})"
                        # BigQuery's DATE_ADD/DATE_SUB return DATE and the
                        # DATETIME variants return DATETIME; timestampadd
                        # yields TIMESTAMP — cast back so the materialized
                        # schema and string renderings don't silently
                        # change type.
                        if name.startswith("date_"):
                            repl = f"CAST({repl} AS DATE)"
                        elif name.startswith("datetime_"):
                            repl = f"CAST({repl} AS TIMESTAMP_NTZ)"
                        edits.append((start, toks[close][3], repl))
                        i = close + 1
                        continue

                if name in ("format_date", "format_timestamp", "format_datetime") and first_pass:
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2 or toks[spans[0][0]][0] != "string" \
                            or spans[0][0] != spans[0][1]:
                        raise TranspileError(
                            f"{name} needs (literal_format, expr) to transpile"
                        )
                    fmt = _literal_content(toks[spans[0][0]][1], read)
                    converted = convert_strftime_format(fmt)
                    repl = (
                        f"date_format({_arg_text(spans[1])}, "
                        f"{_spark_string_literal(converted, read)})"
                    )
                    edits.append((start, toks[close][3], repl))
                    i = close + 1
                    continue

                if name in ("parse_date", "parse_timestamp", "parse_datetime") and first_pass:
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2 or toks[spans[0][0]][0] != "string" \
                            or spans[0][0] != spans[0][1]:
                        raise TranspileError(
                            f"{name} needs (literal_format, expr) to transpile"
                        )
                    fmt = _literal_content(toks[spans[0][0]][1], read)
                    converted = convert_strftime_format(fmt)
                    target = "to_date" if name == "parse_date" else "to_timestamp"
                    repl = (
                        f"{target}({_arg_text(spans[1])}, "
                        f"{_spark_string_literal(converted, read)})"
                    )
                    edits.append((start, toks[close][3], repl))
                    i = close + 1
                    continue

                if name in ("date_trunc", "timestamp_trunc", "datetime_trunc"):
                    spans, close = _call_arg_spans(toks, i + 1)
                    # BigQuery puts the unit LAST as a bare keyword; the
                    # already-Spark form (unit first, as a string) does not
                    # match this shape, so the rewrite is naturally
                    # idempotent. A 3-arg TIMESTAMP_TRUNC(ts, unit, tz)
                    # timezone form has no Spark rewrite — LOUD.
                    if len(spans) == 3 and toks[spans[0][0]][0] != "string":
                        raise TranspileError(
                            f"{name} with a timezone argument has no Spark "
                            "date_trunc rewrite"
                        )
                    unit_tok_ok = (
                        len(spans) == 2
                        and toks[spans[1][0]][0] == "ident"
                        and toks[spans[0][0]][0] != "string"
                    )
                    if unit_tok_ok:
                        # WEEK(MONDAY) is call-shaped: ident '(' ident ')'.
                        if (
                            spans[1][0] + 3 == spans[1][1]
                            and toks[spans[1][0]][1].lower() == "week"
                            and is_op(spans[1][0] + 1, "(")
                            and toks[spans[1][0] + 2][0] == "ident"
                            and is_op(spans[1][0] + 3, ")")
                        ):
                            if toks[spans[1][0] + 2][1].lower() != "monday":
                                raise TranspileError(
                                    f"bigquery WEEK({toks[spans[1][0] + 2][1].upper()}) "
                                    "truncation has no Spark rewrite (Spark "
                                    "weeks start Monday)"
                                )
                            raw_unit = "isoweek"  # Monday-start, = Spark week
                        elif spans[1][0] != spans[1][1]:
                            raise TranspileError(
                                f"bigquery {name} unit must be a bare date "
                                "part keyword"
                            )
                        else:
                            raw_unit = toks[spans[1][0]][1].lower()
                        if raw_unit.startswith("week"):
                            raise TranspileError(
                                "bigquery WEEK truncation starts Sunday; Spark "
                                "weeks start Monday — no faithful rewrite "
                                "(WEEK(MONDAY)/ISOWEEK do transpile)"
                            )
                        # Spark date_trunc accepts MILLISECOND/MICROSECOND
                        # beyond the timestampdiff unit set; ISOWEEK and
                        # Spark WEEK both truncate to the Monday on-or-
                        # before. ISOYEAR (ISO year start) has no Spark
                        # equivalent.
                        _TRUNC_EXTRA = {
                            "millisecond": "MILLISECOND",
                            "microsecond": "MICROSECOND",
                            "isoweek": "WEEK",
                        }
                        u_mapped = _DIFF_UNITS.get(raw_unit) or _TRUNC_EXTRA.get(raw_unit)
                        if u_mapped is None:
                            raise TranspileError(
                                f"bigquery {name} unit {raw_unit!r} has no "
                                "Spark date_trunc equivalent"
                            )
                        u = u_mapped.lower()
                        repl = f"date_trunc('{u}', {_arg_text(spans[0])})"
                        # BigQuery DATE_TRUNC returns DATE, DATETIME_TRUNC
                        # returns DATETIME; Spark date_trunc returns
                        # TIMESTAMP — cast back (same rule as DATE_ADD).
                        if name == "date_trunc":
                            repl = f"CAST({repl} AS DATE)"
                        elif name == "datetime_trunc":
                            repl = f"CAST({repl} AS TIMESTAMP_NTZ)"
                        edits.append((start, toks[close][3], repl))
                        i = close + 1
                        continue

                if name == "log":
                    # BigQuery LOG(x, base) vs Spark log(base, expr) —
                    # REVERSED arg order, silent wrong values if passed
                    # through. Rewrite as an ln ratio (what Spark's own
                    # Logarithm lowers to), which is also idempotent under
                    # re-transpile (a bare arg swap would flip every pass).
                    # 1-arg LOG is ln in both — untouched.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 2:
                        x = _arg_text(spans[0])
                        b = _arg_text(spans[1])
                        edits.append(
                            (start, toks[close][3], f"(ln({x}) / ln({b}))")
                        )
                        i = close + 1
                        continue
                    i += 1
                    continue

                if name == "date":
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 3:
                        edits.append((start, end, "make_date"))
                    elif len(spans) == 1:
                        edits.append((start, end, "to_date"))
                    else:
                        raise TranspileError(
                            "DATE(ts, tz) timezone form has no direct Spark rewrite"
                        )
                    i += 1
                    continue

                if name in ("generate_array", "generate_date_array"):
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 2:
                        # BigQuery returns [] when start > end with the
                        # default (positive) step; Spark sequence returns a
                        # DESCENDING array. slice(single-elem, 1, 0) makes
                        # a correctly-TYPED empty array (bare array() is
                        # array<string> and breaks the conditional's type).
                        a = _arg_text(spans[0])
                        b = _arg_text(spans[1])
                        repl = (
                            f"if(({a}) <= ({b}), sequence(({a}), ({b})), "
                            f"slice(sequence(({a}), ({a})), 1, 0))"
                        )
                        edits.append((start, toks[close][3], repl))
                        i = close + 1
                        continue
                    # explicit-step form: Spark sequence errors loudly when
                    # the step sign disagrees with the bound order, which
                    # surfaces the (rare) divergence instead of hiding it.
                    edits.append((start, end, "sequence"))
                    i += 1
                    continue

                if name == "datetime":
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 6:
                        # DATETIME(y, m, d, h, mi, s) constructor
                        edits.append((start, end, "make_timestamp_ntz"))
                    elif len(spans) == 1:
                        # DATETIME(date_or_ts) → wall-clock conversion
                        edits.append((start, end, "CAST"))
                        edits.append(
                            (toks[close][2], toks[close][2], " AS TIMESTAMP_NTZ")
                        )
                    else:
                        raise TranspileError(
                            "DATETIME(date, time) / DATETIME(ts, tz) forms "
                            "have no direct Spark rewrite"
                        )
                    i += 1
                    continue

                if name == "split" and first_pass:
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 1:
                        edits.append((toks[close][2], toks[close][2], ", ','"))
                    elif len(spans) == 2:
                        sep = toks[spans[1][0]]
                        if sep[0] != "string" or spans[1][0] != spans[1][1]:
                            raise TranspileError(
                                "bigquery split separator must be a literal to "
                                "transpile (Spark split() treats it as a regex)"
                            )
                        inner = _literal_content(sep[1], read)
                        edits.append((sep[2], sep[3], _regex_literal(inner, read)))
                    i += 1
                    continue

                if name in ("offset", "ordinal") and i > 0 and is_op(i - 1, "["):
                    # Only in subscript position: arr[OFFSET(i)] — bare
                    # subscripts pass through for bigquery and Spark's
                    # arr[i] is 0-based like OFFSET, so strip the wrapper
                    # (ORDINAL is 1-based → subtract 1). The `[` guard
                    # keeps `LIMIT 10 OFFSET (5)` untouched.
                    _spans, close = _call_arg_spans(toks, i + 1)
                    edits.append((start, end, ""))
                    if name == "ordinal":
                        edits.append((toks[close][3], toks[close][3], " - 1"))
                    i += 1
                    continue

            # ---- Redshift-specific handlers
            if read == "redshift":
                if name in ("getdate", "getutcdate"):
                    # Both return UTC wall-clock regardless of session TZ
                    # (Redshift stores timestamps normalized to UTC).
                    spans, close = _call_arg_spans(toks, i + 1)
                    if spans:
                        raise TranspileError(f"{name} takes no arguments")
                    edits.append(
                        (start, toks[close][3],
                         "to_utc_timestamp(current_timestamp(), current_timezone())")
                    )
                    i = close + 1
                    continue

                if name == "json_extract_path_text" and first_pass:
                    # json_extract_path_text(j, 'a', 'b'[, null_if_invalid])
                    # → get_json_object(j, '$.a.b'). Literal path elements
                    # only ($-path assembly needs them at render time).
                    # Divergence, documented: on malformed JSON Spark
                    # returns NULL where Redshift without null_if_invalid
                    # errors — NULL-on-garbage accepted for fidelity of the
                    # well-formed path.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) < 2:
                        raise TranspileError(
                            "json_extract_path_text needs at least one path "
                            "element"
                        )
                    path_spans = spans[1:]
                    if (
                        path_spans
                        and toks[path_spans[-1][0]][0] == "ident"
                        and toks[path_spans[-1][0]][1].lower() in ("true", "false")
                    ):
                        path_spans = path_spans[:-1]
                    parts = []
                    for p_first, p_last in path_spans:
                        p_tok = toks[p_first]
                        if p_first != p_last or p_tok[0] != "string":
                            raise TranspileError(
                                "json_extract_path_text path elements must "
                                "be string literals to transpile"
                            )
                        elem = _literal_content(p_tok[1], read)
                        if "'" in elem or "." in elem or "[" in elem:
                            raise TranspileError(
                                f"json path element {elem!r} cannot be "
                                "embedded in a $.a.b path"
                            )
                        parts.append(elem)
                    j_text = _arg_text(spans[0])
                    path = "$." + ".".join(parts)
                    edits.append(
                        (start, toks[close][3],
                         f"get_json_object({j_text}, '{path}')")
                    )
                    i = close + 1
                    continue

            # ---- MySQL-specific handlers
            if read == "mysql":
                if name == "utc_timestamp":
                    spans, close = _call_arg_spans(toks, i + 1)
                    if spans:
                        raise TranspileError("utc_timestamp takes no arguments")
                    edits.append(
                        (start, toks[close][3],
                         "to_utc_timestamp(current_timestamp(), current_timezone())")
                    )
                    i = close + 1
                    continue

                if name == "date_format" and first_pass:
                    # Same name + arg order as Spark, but MySQL %-codes.
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2 or toks[spans[1][0]][0] != "string" \
                            or spans[1][0] != spans[1][1]:
                        raise TranspileError(
                            "mysql date_format needs a literal format to "
                            "transpile"
                        )
                    fmt_tok = toks[spans[1][0]]
                    raw_fmt = _literal_content(fmt_tok[1], read)
                    if "%" not in raw_fmt:
                        # No %-codes: either our OWN already-converted Java
                        # pattern re-read on a later logical pass (must
                        # stay untouched for idempotence) or a pure-literal
                        # MySQL format. Letters are ambiguous between the
                        # two readings — loud; letterless formats mean the
                        # same in both.
                        if re.search(r"[A-Za-z]", raw_fmt):
                            raise TranspileError(
                                f"date_format pattern {raw_fmt!r} has no "
                                "%-codes; cannot tell a literal MySQL "
                                "format from an already-Spark pattern"
                            )
                        i += 1
                        continue
                    converted = convert_mysql_format(raw_fmt)
                    edits.append((start, end, "date_format"))
                    edits.append(
                        (fmt_tok[2], fmt_tok[3],
                         _spark_string_literal(converted, read))
                    )
                    i += 1
                    continue

                if name == "str_to_date" and first_pass:
                    # → to_timestamp when the format has time codes, else
                    # to_date (MySQL returns DATETIME vs DATE on the same
                    # rule).
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2 or toks[spans[1][0]][0] != "string" \
                            or spans[1][0] != spans[1][1]:
                        raise TranspileError(
                            "str_to_date needs a literal format to transpile"
                        )
                    fmt_tok = toks[spans[1][0]]
                    raw_fmt = _literal_content(fmt_tok[1], read)
                    converted = convert_mysql_format(raw_fmt)
                    target = (
                        "to_timestamp" if _mysql_fmt_has_time(raw_fmt)
                        else "to_date"
                    )
                    edits.append((start, end, target))
                    edits.append(
                        (fmt_tok[2], fmt_tok[3],
                         _spark_string_literal(converted, read))
                    )
                    i += 1
                    continue

                if name == "from_unixtime" and first_pass:
                    # 1-arg matches Spark; 2-arg format is MySQL %-codes
                    # (Spark's is a Java pattern). Same shared-name
                    # ambiguity rule as date_format: a no-% format with
                    # letters cannot be told apart from our own emitted
                    # Java pattern — loud; letterless means the same.
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 2:
                        fmt_tok = toks[spans[1][0]]
                        if toks[spans[1][0]][0] != "string" \
                                or spans[1][0] != spans[1][1]:
                            raise TranspileError(
                                "from_unixtime format must be a literal to "
                                "transpile"
                            )
                        raw_fmt = _literal_content(fmt_tok[1], read)
                        if "%" not in raw_fmt:
                            if re.search(r"[A-Za-z]", raw_fmt):
                                raise TranspileError(
                                    f"from_unixtime pattern {raw_fmt!r} has "
                                    "no %-codes; cannot tell a literal MySQL "
                                    "format from an already-Spark pattern"
                                )
                            i += 1
                            continue
                        converted = convert_mysql_format(raw_fmt)
                        edits.append((start, end, "from_unixtime"))
                        edits.append(
                            (fmt_tok[2], fmt_tok[3],
                             _spark_string_literal(converted, read))
                        )
                    i += 1
                    continue

                if name == "group_concat" and first_pass:
                    # GROUP_CONCAT([DISTINCT] expr [SEPARATOR 'sep']) →
                    # listagg([DISTINCT] expr, sep), default separator ','.
                    # ORDER BY inside the call has no pre-4.0 rewrite and
                    # WITHIN GROUP placement differs — LOUD.
                    _require_spark4(name, "listagg")
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError(
                            "group_concat with multiple exprs has no "
                            "direct Spark rewrite (concatenate explicitly)"
                        )
                    s_first, s_last = spans[0]
                    sep_lit = "','"
                    arg_end = toks[s_last][3]
                    # scan the single arg span for ORDER BY / SEPARATOR
                    # at bracket depth 0
                    depth_ = 0
                    sep_at = None
                    for j in range(s_first, s_last + 1):
                        k_, t_, _, _ = toks[j]
                        if k_ == "op" and t_ in ("(", "["):
                            depth_ += 1
                        elif k_ == "op" and t_ in (")", "]"):
                            depth_ -= 1
                        elif depth_ == 0 and k_ == "ident":
                            up = t_.upper()
                            if up == "ORDER":
                                raise TranspileError(
                                    "group_concat ORDER BY has no Spark "
                                    "rewrite (listagg WITHIN GROUP differs "
                                    "in placement); order in an outer query"
                                )
                            if up == "SEPARATOR":
                                sep_at = j
                    if sep_at is not None:
                        if sep_at == s_first:
                            raise TranspileError(
                                "group_concat needs an expression before "
                                "SEPARATOR"
                            )
                        if (
                            sep_at + 1 > s_last
                            or toks[sep_at + 1][0] != "string"
                            or sep_at + 1 != s_last
                        ):
                            raise TranspileError(
                                "group_concat SEPARATOR must be a trailing "
                                "string literal"
                            )
                        sep_lit = _spark_string_literal(
                            _literal_content(toks[sep_at + 1][1], read), read
                        )
                        # expr ends just before SEPARATOR
                        arg_end = toks[sep_at - 1][3]
                        # drop "SEPARATOR 'sep'"
                        edits.append((arg_end, toks[s_last][3], ""))
                    edits.append((start, end, "listagg"))
                    edits.append((arg_end, arg_end, f", {sep_lit}"))
                    i += 1
                    continue

                if name in ("date_add", "date_sub", "adddate", "subdate") \
                        and first_pass:
                    # INTERVAL form → timestampadd(UNIT, [-]expr, date) —
                    # Spark INTERVAL literals need constant quantities, but
                    # MySQL allows expressions, so timestampadd is the
                    # general rewrite (type caveat as dateadd: result is
                    # TIMESTAMP). adddate(d, n) day-shorthand matches
                    # Spark's own date_add(d, n).
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2:
                        raise TranspileError(f"{name} takes 2 args")
                    s2_first, s2_last = spans[1]
                    neg = name in ("date_sub", "subdate")
                    if (
                        toks[s2_first][0] == "ident"
                        and toks[s2_first][1].upper() == "INTERVAL"
                    ):
                        if s2_last < s2_first + 2:
                            raise TranspileError(
                                f"{name} INTERVAL needs a quantity and unit"
                            )
                        u_tok = toks[s2_last]
                        if u_tok[0] != "ident":
                            raise TranspileError(
                                f"{name} INTERVAL unit must be a keyword"
                            )
                        unit = _DIFF_UNITS.get(u_tok[1].lower())
                        if unit is None and u_tok[1].lower() == "microsecond":
                            unit = "MICROSECOND"
                        if unit is None:
                            raise TranspileError(
                                f"{name} unit {u_tok[1]!r} has no Spark "
                                "timestampadd equivalent (composite units "
                                "like SECOND_MICROSECOND are unsupported)"
                            )
                        qty = transpile(
                            sql[toks[s2_first + 1][2] : toks[s2_last - 1][3]],
                            read,
                        )
                        date_text = _arg_text(spans[0])
                        qty_text = f"-({qty})" if neg else qty
                        edits.append(
                            (start, toks[close][3],
                             f"timestampadd({unit}, {qty_text}, {date_text})")
                        )
                        i = close + 1
                        continue
                    if name in ("adddate", "subdate"):
                        # integer-days shorthand
                        if neg:
                            d_text = _arg_text(spans[0])
                            n_text = _arg_text(spans[1])
                            edits.append(
                                (start, toks[close][3],
                                 f"date_sub({d_text}, {n_text})")
                            )
                            i = close + 1
                        else:
                            edits.append((start, end, "date_add"))
                            i += 1
                        continue
                    raise TranspileError(
                        f"mysql {name} needs an INTERVAL second argument"
                    )

            # ---- Oracle-specific handlers
            if read == "oracle":
                if name == "trunc" and first_pass:
                    # TRUNC(d, 'fmt') with a literal DATE format is the
                    # unambiguous form → date_trunc. 1-arg TRUNC(x) is
                    # type-overloaded (date-to-midnight vs numeric) and
                    # TRUNC(x, n) is numeric — both LOUD.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if (
                        len(spans) == 2
                        and spans[1][0] == spans[1][1]
                        and toks[spans[1][0]][0] == "string"
                    ):
                        fmt_ = _literal_content(
                            toks[spans[1][0]][1], read
                        ).upper()
                        unit = {
                            "MM": "MONTH", "MON": "MONTH", "MONTH": "MONTH",
                            "RM": "MONTH",
                            "YYYY": "YEAR", "SYYYY": "YEAR", "YEAR": "YEAR",
                            "YYY": "YEAR", "YY": "YEAR", "Y": "YEAR",
                            "DD": "DAY", "DDD": "DAY", "J": "DAY",
                            "HH": "HOUR", "HH12": "HOUR", "HH24": "HOUR",
                            "MI": "MINUTE",
                            "Q": "QUARTER",
                            "IW": "WEEK",   # ISO week = Spark WEEK (Monday)
                        }.get(fmt_)
                        if unit is None:
                            raise TranspileError(
                                f"oracle TRUNC format {fmt_!r} has no Spark "
                                "date_trunc unit (W/WW/DAY are NLS- or "
                                "month-anchored weeks)"
                            )
                        arg = _arg_text(spans[0])
                        edits.append(
                            (start, toks[close][3],
                             f"date_trunc('{unit}', {arg})")
                        )
                        i = close + 1
                        continue
                    raise TranspileError(
                        "oracle TRUNC is type-overloaded; only the "
                        "TRUNC(date, 'fmt') literal-format form "
                        "transpiles — use floor()/CAST for numerics"
                    )

            # ---- T-SQL-specific handlers
            if read == "tsql":
                if name in ("getutcdate", "sysutcdatetime"):
                    spans, close = _call_arg_spans(toks, i + 1)
                    if spans:
                        raise TranspileError(f"{name} takes no arguments")
                    edits.append(
                        (start, toks[close][3],
                         "to_utc_timestamp(current_timestamp(), current_timezone())")
                    )
                    i = close + 1
                    continue

                if name == "isnull":
                    # T-SQL ISNULL(a, b) = nvl. Spark's own 1-arg isnull()
                    # is a boolean test — arity disambiguates; a 1-arg call
                    # in T-SQL text is invalid T-SQL, loud.
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2:
                        raise TranspileError("tsql isnull takes 2 args")
                    edits.append((start, end, "nvl"))
                    i += 1
                    continue

                if name == "len" and first_pass:
                    # T-SQL LEN ignores trailing spaces.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError("len takes 1 arg")
                    arg = _arg_text(spans[0])
                    edits.append(
                        (start, toks[close][3], f"length(rtrim({arg}))")
                    )
                    i = close + 1
                    continue

                if name == "square" and first_pass:
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError("square takes 1 arg")
                    arg = _arg_text(spans[0])
                    edits.append(
                        (start, toks[close][3], f"power(({arg}), 2)")
                    )
                    i = close + 1
                    continue

                if name == "eomonth" and first_pass:
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 1:
                        arg = _arg_text(spans[0])
                        edits.append(
                            (start, toks[close][3], f"last_day({arg})")
                        )
                    elif len(spans) == 2:
                        arg = _arg_text(spans[0])
                        off_ = _arg_text(spans[1])
                        edits.append(
                            (start, toks[close][3],
                             f"last_day(add_months({arg}, {off_}))")
                        )
                    else:
                        raise TranspileError("eomonth takes 1 or 2 args")
                    i = close + 1
                    continue

                if name == "datepart" and first_pass:
                    # DATEPART(unit, d) → date_part('UNIT', d). WEEK and
                    # WEEKDAY depend on SET DATEFIRST — loud; ISO_WEEK is
                    # exact.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2 or spans[0][0] != spans[0][1] \
                            or toks[spans[0][0]][0] != "ident":
                        raise TranspileError(
                            "datepart needs a bare unit keyword"
                        )
                    raw_u = toks[spans[0][0]][1].lower()
                    d_arg = _arg_text(spans[1])
                    if raw_u in ("iso_week", "isowk", "isoww"):
                        edits.append(
                            (start, toks[close][3], f"weekofyear({d_arg})")
                        )
                        i = close + 1
                        continue
                    if raw_u in ("wk", "ww", "week", "dw", "weekday", "dy",
                                 "y", "dayofyear", "tzoffset", "tz",
                                 "ms", "mcs", "millisecond", "microsecond",
                                 "ns", "nanosecond"):
                        raise TranspileError(
                            f"datepart unit {raw_u!r} is SET-DATEFIRST/"
                            "context dependent or unmapped; no Spark "
                            "rewrite (use iso_week / dayofweek explicitly)"
                        )
                    unit = _resolve_unit(read, raw_u)
                    if unit is None:
                        raise TranspileError(
                            f"datepart unit {raw_u!r} has no Spark "
                            "date_part equivalent"
                        )
                    edits.append(
                        (start, toks[close][3],
                         f"date_part('{unit}', {d_arg})")
                    )
                    i = close + 1
                    continue

                if name == "datename" and first_pass:
                    # month/weekday NAMES; everything else is DATEPART
                    # territory (T-SQL returns digits-as-strings — an
                    # implicit-cast seam, loud).
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2 or spans[0][0] != spans[0][1] \
                            or toks[spans[0][0]][0] != "ident":
                        raise TranspileError(
                            "datename needs a bare unit keyword"
                        )
                    raw_u = toks[spans[0][0]][1].lower()
                    fmt_ = {"month": "MMMM", "mm": "MMMM", "m": "MMMM",
                            "weekday": "EEEE", "dw": "EEEE"}.get(raw_u)
                    if fmt_ is None:
                        raise TranspileError(
                            f"datename unit {raw_u!r} has no Spark rewrite "
                            "(numeric units return strings in T-SQL — use "
                            "datepart + CAST explicitly)"
                        )
                    d_arg = _arg_text(spans[1])
                    edits.append(
                        (start, toks[close][3],
                         f"date_format({d_arg}, '{fmt_}')")
                    )
                    i = close + 1
                    continue

            # ---- special handlers (arg restructuring / literal rewrites)
            if name in ("convert", "try_convert") and read in (
                "redshift", "tsql"
            ) and first_pass:
                # Redshift/T-SQL CONVERT(type, expr[, style]) — type first.
                # Rewrite to CAST(expr AS TYPE) with the type name run
                # through the dialect maps (drop-arg types and (MAX)
                # included). A T-SQL style argument selects locale-specific
                # datetime/number FORMATS — no Spark rewrite, loud.
                if name == "try_convert":
                    _require_spark4(name, "try_cast")
                spans, close = _call_arg_spans(toks, i + 1)
                if len(spans) == 3:
                    raise TranspileError(
                        f"{name} with a style argument has no Spark rewrite"
                        " (locale datetime formats); use date_format"
                    )
                if len(spans) != 2:
                    raise TranspileError(f"{name} takes (type, expression)")
                t_first, t_last = spans[0]
                t_tok = toks[t_first]
                if t_tok[0] != "ident":
                    raise TranspileError(
                        f"{name} type must be a plain type name"
                    )
                tname = t_tok[1].lower()
                if t_first == t_last:
                    type_text = _lookup_type(read, tname) or t_tok[1].upper()
                elif (
                    toks[t_first + 1][0] == "op"
                    and toks[t_first + 1][1] == "("
                ):
                    dtype = _PARAM_DROP_TYPES.get(read, {}).get(tname)
                    if dtype is not None:
                        type_text = dtype
                    elif (
                        read == "tsql"
                        and t_last == t_first + 3
                        and toks[t_first + 2][0] == "ident"
                        and toks[t_first + 2][1].lower() == "max"
                    ):
                        type_text = "BINARY" if "binary" in tname else "STRING"
                    else:
                        base_ = _PARAM_TYPES.get(read, {}).get(
                            tname, _lookup_type(read, tname) or t_tok[1].upper()
                        )
                        type_text = base_ + sql[
                            toks[t_first + 1][2] : toks[t_last][3]
                        ]
                else:
                    raise TranspileError(
                        f"{name} type must be a plain type name"
                    )
                expr_text = _arg_text(spans[1])
                cast_fn = "TRY_CAST" if name == "try_convert" else "CAST"
                edits.append(
                    (start, toks[close][3],
                     f"{cast_fn}({expr_text} AS {type_text})")
                )
                i = close + 1
                continue

            if name in ("strftime", "strptime") and read in ("duckdb", "postgres") and first_pass:
                spans_, _close_ = _call_arg_spans(toks, i + 1)
                if len(spans_) != 2:
                    raise TranspileError(f"{name} expects 2 args")
                fmt_idx = spans_[1][0]
                if toks[fmt_idx][0] != "string" or spans_[1][0] != spans_[1][1]:
                    raise TranspileError(f"{name} format must be a single literal to transpile")
                fmt_lit = toks[fmt_idx][1]
                converted = convert_strftime_format(fmt_lit[1:-1].replace("''", "'"))
                new_fn = "date_format" if name == "strftime" else "to_timestamp"
                edits.append((start, end, new_fn))
                edits.append(
                    (toks[fmt_idx][2], toks[fmt_idx][3],
                     _spark_string_literal(converted, read))
                )
                i += 1
                continue

            # ---- DuckDB/Postgres NULL-and-edge fidelity handlers.
            # These engines return NULL / '' / keep NULLs on edges where
            # Spark's builtins raise (ANSI), drop NULLs, or compute a
            # different value. Each rewrite is pinned value-by-value
            # against the DuckDB oracle in tests/test_dialect_edges.py.

            if (
                (
                    name == "array_agg"
                    or (name == "list" and read == "duckdb")
                )
                and read in ("duckdb", "postgres", "trino")
                and first_pass
            ):
                # These engines' array_agg KEEPS NULL elements and returns
                # NULL (not []) for an empty input set; Spark's
                # array_agg/collect_list drops NULLs and returns [].
                # struct-wrap preserves NULLs (a struct row is never
                # null); the CASE restores NULL-on-empty. Catalyst
                # deduplicates the two identical aggregate expressions.
                spans, close = _call_arg_spans(toks, i + 1)
                if len(spans) != 1:
                    raise TranspileError("array_agg takes 1 argument")
                depth_ = 0
                for j_ in range(spans[0][0], spans[0][1] + 1):
                    k_, t_, _, _ = toks[j_]
                    if k_ == "op" and t_ in ("(", "["):
                        depth_ += 1
                    elif k_ == "op" and t_ in (")", "]"):
                        depth_ -= 1
                    elif (
                        depth_ == 0 and k_ in _NAME_KINDS
                        and t_.upper() == "ORDER"
                    ):
                        raise TranspileError(
                            "array_agg(x ORDER BY ...) has no Spark "
                            "rewrite (Spark aggregates reject inline "
                            "ORDER BY); aggregate then array_sort/"
                            "sort_array explicitly"
                        )
                dist = ""
                a0, a1 = spans[0]
                if toks[a0][0] in _NAME_KINDS and toks[a0][1].upper() == "DISTINCT":
                    dist = "DISTINCT "
                    a0 += 1
                if (
                    toks[a0][0] in _NAME_KINDS
                    and toks[a0][1].lower() == "struct"
                    and is_op(a0 + 1, "(")
                ):
                    # already our emitted struct((x) AS _v) wrap (a
                    # re-transpile of transpiled output; none of these
                    # dialects has a struct() function) — struct rows are
                    # never NULL, so the native agg is faithful
                    i += 1
                    continue
                expr_text = _arg_text((a0, a1))
                fend = close
                ftext = ""
                if (
                    close + 2 < len(toks)
                    and toks[close + 1][0] in _NAME_KINDS
                    and toks[close + 1][1].upper() == "FILTER"
                    and is_op(close + 2, "(")
                ):
                    fend = _call_arg_spans(toks, close + 2)[1]
                    ftext = " " + transpile(
                        sql[toks[close + 1][2]: toks[fend][3]], read
                    )
                agg = f"array_agg({dist}struct(({expr_text}) AS _v)){ftext}"
                edits.append(
                    (start, toks[fend][3],
                     f"(CASE WHEN size({agg}) = 0 THEN NULL "
                     f"ELSE transform({agg}, _s -> _s._v) END)")
                )
                i = fend + 1
                continue

            if name == "concat" and read in ("duckdb", "postgres") and first_pass:
                # duckdb/postgres concat casts every argument to text and
                # SKIPS NULLs (concat('a', NULL) = 'a', concat(NULL, NULL)
                # = ''); Spark concat returns NULL if any input is NULL.
                # Wrap each argument; keep scanning inside them.
                spans, _close = _call_arg_spans(toks, i + 1)
                if all(
                    toks[sp[0]][0] in _NAME_KINDS
                    and toks[sp[0]][1].lower() == "coalesce"
                    and toks[sp[0] + 1][1] == "("
                    and toks[sp[0] + 2][1].upper() in ("CAST", "TRY_CAST")
                    for sp in spans
                ):
                    i += 1  # already-wrapped re-transpile of our output
                    continue
                for sp in spans:
                    edits.append((toks[sp[0]][2], toks[sp[0]][2], "coalesce(CAST("))
                    edits.append((toks[sp[1]][3], toks[sp[1]][3], " AS STRING), '')"))
                i += 1
                continue

            if (
                name in ("list_concat", "list_cat", "array_cat")
                and read in ("duckdb", "postgres")
                and first_pass
            ):
                # NULL list arguments are SKIPPED (list_concat([1], NULL)
                # = [1]) and all-NULL yields NULL; Spark concat(a, NULL)
                # is NULL. (The emitted concat is the ARRAY concat — the
                # string-concat handler above is first-pass-only.)
                spans, close = _call_arg_spans(toks, i + 1)
                if len(spans) != 2:
                    raise TranspileError(f"{name} takes 2 args")
                a_ = _arg_text(spans[0])
                b_ = _arg_text(spans[1])
                edits.append(
                    (start, toks[close][3],
                     f"(CASE WHEN ({a_}) IS NULL AND ({b_}) IS NULL THEN NULL "
                     f"ELSE coalesce(({a_}), array()) || "
                     f"coalesce(({b_}), array()) END)")
                )
                i = close + 1
                continue

            if (
                name in ("list_distinct", "array_distinct")
                and read == "duckdb"
                and first_pass
            ):
                # duckdb list_distinct/array_distinct REMOVE NULL
                # elements; Spark array_distinct keeps one. (Result order
                # is unspecified in duckdb — element SET parity is what's
                # contracted.)
                spans, close = _call_arg_spans(toks, i + 1)
                if len(spans) != 1:
                    raise TranspileError(f"{name} takes 1 arg")
                if (
                    toks[spans[0][0]][0] in _NAME_KINDS
                    and toks[spans[0][0]][1].lower() == "filter"
                ):
                    i += 1  # already our filter(...) wrap — re-transpile
                    continue
                a_ = _arg_text(spans[0])
                edits.append(
                    (start, toks[close][3],
                     f"array_distinct(filter(({a_}), _ld -> _ld IS NOT NULL))")
                )
                i = close + 1
                continue

            if (
                name in ("substr", "substring")
                and read in ("duckdb", "postgres")
                and first_pass
            ):
                # 3-arg substr edge semantics (verified against duckdb):
                # both engines treat positions VIRTUALLY — substr('hello',
                # 0, 3) = 'he' (the span [0,3) clipped to [1,..]), and
                # duckdb additionally resolves a NEGATIVE start from the
                # end (p = len+b+1) and allows negative LENGTH (span
                # walked backwards: substr('hello', 2, -1) = 'h');
                # postgres keeps negative starts virtual. Spark's substr
                # treats 0 as 1 and keeps the full length. The emitted
                # span arithmetic reproduces each engine exactly; 2-arg
                # forms agree natively and pass through.
                spans, close = _call_arg_spans(toks, i + 1)
                if len(spans) == 3:
                    s_ = _arg_text(spans[0])
                    b_ = _arg_text(spans[1])
                    n_ = _arg_text(spans[2])
                    if read == "duckdb":
                        p = (f"(CASE WHEN ({b_}) < 0 "
                             f"THEN length(({s_})) + ({b_}) + 1 "
                             f"ELSE ({b_}) END)")
                        lo = f"least({p}, {p} + ({n_}))"
                        hi = f"greatest({p}, {p} + ({n_}))"
                    else:
                        lo = f"({b_})"
                        hi = f"(({b_}) + ({n_}))"
                    st = f"greatest({lo}, 1)"
                    # keyword form: no top-level commas, so the emitted
                    # call has a single arg span and re-reads untouched
                    edits.append(
                        (start, toks[close][3],
                         f"substring(({s_}) FROM {st} "
                         f"FOR greatest({hi} - {st}, 0))")
                    )
                    i = close + 1
                    continue

            if (
                name in ("left", "right")
                and read in ("duckdb", "postgres")
                and first_pass
            ):
                # Negative n means "all but the last/first |n| chars" in
                # duckdb/postgres; Spark returns ''. (first-pass only:
                # the emitted call contains its own trigger name.)
                spans, close = _call_arg_spans(toks, i + 1)
                if len(spans) == 2:
                    s_ = _arg_text(spans[0])
                    n_ = _arg_text(spans[1])
                    if name == "left":
                        repl = (
                            f"substring(({s_}) FROM 1 FOR "
                            f"if(({n_}) < 0, length(({s_})) + ({n_}), ({n_})))"
                        )
                    else:
                        repl = (
                            f"substring(({s_}) FROM if(({n_}) < 0, 1 - ({n_}), "
                            f"greatest(length(({s_})) + 1 - ({n_}), 1)))"
                        )
                    edits.append((start, toks[close][3], repl))
                    i = close + 1
                    continue

            if (
                name in ("date_part", "datepart")
                and read in ("duckdb", "postgres")
                and first_pass
            ):
                spans, close = _call_arg_spans(toks, i + 1)
                if (
                    len(spans) == 2
                    and toks[spans[0][0]][0] == "string"
                    and spans[0][0] == spans[0][1]
                ):
                    field = _literal_content(toks[spans[0][0]][1], read).lower()
                    tmpl = _DP_FIELD_TEMPLATES.get(field)
                    if tmpl is not None:
                        x_ = _arg_text(spans[1])
                        edits.append(
                            (start, toks[close][3], tmpl.format(x=f"({x_})"))
                        )
                        i = close + 1
                        continue

            if name == "extract" and read in ("duckdb", "postgres") and first_pass:
                # extract(FIELD FROM x) spelling of the same field fixes
                if (
                    i + 4 < len(toks)
                    and toks[i + 2][0] in _NAME_KINDS
                    and toks[i + 3][0] in _NAME_KINDS
                    and toks[i + 3][1].upper() == "FROM"
                ):
                    field = toks[i + 2][1].lower()
                    tmpl = _DP_FIELD_TEMPLATES.get(field)
                    if tmpl is not None:
                        close = _call_arg_spans(toks, i + 1)[1]
                        x_ = transpile(
                            sql[toks[i + 4][2]: toks[close - 1][3]], read
                        )
                        edits.append(
                            (start, toks[close][3], tmpl.format(x=f"({x_})"))
                        )
                        i = close + 1
                        continue

            if name == "date_add" and read == "duckdb" and first_pass:
                # duckdb date_add(x, INTERVAL) returns TIMESTAMP (even for
                # DATE input); Spark's date_add is (date, int-days) and
                # rejects intervals. `+` carries interval arithmetic.
                spans, close = _call_arg_spans(toks, i + 1)
                if len(spans) == 2:
                    a_ = _arg_text(spans[0])
                    b_ = _arg_text(spans[1])
                    edits.append(
                        (start, toks[close][3],
                         f"CAST(({a_}) + ({b_}) AS TIMESTAMP)")
                    )
                    i = close + 1
                    continue

            if (
                name in ("weekday", "dayofweek")
                and read == "duckdb"
                and first_pass
                and not (
                    i >= 2
                    and is_op(i - 1, "(")
                    and toks[i - 2][0] in _NAME_KINDS
                    and toks[i - 2][1].lower() == "pmod"
                )
            ):
                # duckdb weekday()/dayofweek() are Sunday=0..Saturday=6;
                # Spark weekday() is Monday=0 and dayofweek() Sunday=1.
                # Same rewrite as the date_part('dow') field; the
                # pmod-parent check skips our own emission on re-reads.
                spans, close = _call_arg_spans(toks, i + 1)
                if len(spans) == 1:
                    x_ = _arg_text(spans[0])
                    edits.append(
                        (start, toks[close][3],
                         _DOW_TEMPLATE.format(x=f"({x_})"))
                    )
                    i = close + 1
                    continue

            if name in ("fdiv", "divide") and read == "duckdb" and first_pass:
                # fdiv = floor division as DOUBLE; divide() = TRUNCATING
                # integer division (the // function form). Both NULL on a
                # zero divisor. (The emitted DIV's divisor is already
                # nullif-wrapped — the infix wrap's guard accepts it.)
                spans, close = _call_arg_spans(toks, i + 1)
                if len(spans) != 2:
                    raise TranspileError(f"{name} takes 2 args")
                a_ = _arg_text(spans[0])
                b_ = _arg_text(spans[1])
                if name == "fdiv":
                    repl = f"CAST(floor(try_divide(({a_}), ({b_}))) AS DOUBLE)"
                else:
                    repl = f"(({a_}) DIV nullif(({b_}), 0))"
                edits.append((start, toks[close][3], repl))
                i = close + 1
                continue

            if (
                name in ("list_contains", "list_has", "array_has", "array_contains")
                and read in ("duckdb", "postgres")
                and first_pass
            ):
                # a literal NULL needle is NULL in duckdb; Spark's
                # array_contains rejects the untyped NULL literal at
                # analysis. (Typed null expressions agree — NULL both.)
                spans, close = _call_arg_spans(toks, i + 1)
                if (
                    len(spans) == 2
                    and spans[1][0] == spans[1][1]
                    and toks[spans[1][0]][1].upper() == "NULL"
                ):
                    edits.append(
                        (start, toks[close][3], "CAST(NULL AS BOOLEAN)")
                    )
                    i = close + 1
                    continue
                # else: fall through to the array_contains rename

            if name in ("ltrim", "rtrim", "btrim", "trim") and read in (
                "duckdb", "postgres", "redshift"
            ) and first_pass:
                # These dialects' 2-arg forms are (str, chars); Spark's
                # 2-arg ltrim/rtrim are the REVERSED (trimStr, str) —
                # passing through silently trims the wrong operand. Rewrite
                # to the unambiguous keyword syntax
                # TRIM(LEADING|TRAILING|BOTH chars FROM str); both engines
                # treat chars as a SET. 1-arg forms match Spark — untouched.
                # (TRIM(BOTH x FROM y) keyword syntax has no top-level
                # comma → single span → also untouched.)
                spans, close = _call_arg_spans(toks, i + 1)
                if len(spans) == 2:
                    side = {
                        "ltrim": "LEADING", "rtrim": "TRAILING",
                        "btrim": "BOTH", "trim": "BOTH",
                    }[name]
                    s_text = _arg_text(spans[0])
                    c_text = _arg_text(spans[1])
                    edits.append(
                        (start, toks[close][3],
                         f"TRIM({side} {c_text} FROM {s_text})")
                    )
                    i = close + 1
                    continue
                elif len(spans) > 2:
                    raise TranspileError(f"{name} takes at most 2 args")
                i += 1
                continue

            if name in ("to_char",) and read in (
                "postgres", "redshift", "oracle"
            ) and first_pass:
                spans_, _close_ = _call_arg_spans(toks, i + 1)
                args = [sp[0] for sp in spans_]
                if len(args) == 2 and toks[args[1]][0] == "string" \
                        and spans_[1][0] == spans_[1][1]:
                    fmt_lit = toks[args[1]][1]
                    converted = convert_pg_format(fmt_lit[1:-1].replace("''", "'"))
                    edits.append((start, end, "date_format"))
                    edits.append(
                        (toks[args[1]][2], toks[args[1]][3],
                         _spark_string_literal(converted, read))
                    )
                    i += 1
                    continue
                raise TranspileError("to_char needs a literal format to transpile")

            if name in ("string_to_array", "str_split", "string_split") and read in (
                "duckdb",
                "postgres",
            ) and first_pass:
                # Spark split()'s separator is a REGEX; escape literal seps.
                args = _call_args(toks, i + 1)
                if len(args) - 1 >= 2 and toks[args[1]][0] != "string":
                    raise TranspileError(
                        f"{name} separator must be a literal to transpile "
                        "(Spark split() treats it as a regex)"
                    )
                edits.append((start, end, "split"))
                if len(args) - 1 >= 2:
                    edits.append(
                        (toks[args[1]][2], toks[args[1]][3],
                         _regex_literal(_literal_content(toks[args[1]][1], read), read))
                    )
                i += 1
                continue

            if name in ("dateadd", "timeadd", "timestampadd") and read in (
                "snowflake", "redshift", "tsql"
            ) and first_pass:
                # Snowflake + Redshift + T-SQL DATEADD(unit, n, expr) —
                # same shape, same bare-or-quoted unit keyword (T-SQL adds
                # yy/qq/mm/... abbreviations). Type caveat (documented,
                # not fixable statically): all return their input's type,
                # but the operand type is unknowable at render time, so the
                # result is always TIMESTAMP. Values are correct; a
                # DATE-typed operand gains a 00:00:00 time part.
                spans, _close = _call_arg_spans(toks, i + 1)
                if len(spans) != 3:
                    raise TranspileError(f"{name} expects 3 args")
                u_tok = toks[spans[0][0]]
                if u_tok[0] == "string":
                    raw_unit = _literal_content(u_tok[1], read).lower()
                elif u_tok[0] == "ident" and spans[0][0] == spans[0][1]:
                    raw_unit = u_tok[1].lower()
                else:
                    raise TranspileError(f"{name} unit must be a literal")
                unit = _resolve_unit(read, raw_unit)
                if unit is None:
                    raise TranspileError(
                        f"{name} unit {raw_unit!r} has no Spark "
                        "timestampadd equivalent"
                    )
                edits.append((start, end, "timestampadd"))
                edits.append((u_tok[2], toks[spans[0][1]][3], unit))
                i += 1
                continue

            if name in ("date_diff", "datediff") and read in (
                "duckdb", "postgres", "snowflake", "redshift", "tsql",
                "trino", "clickhouse",
            ):
                # DuckDB date_diff counts UNIT-BOUNDARY CROSSINGS while
                # Spark timestampdiff counts complete elapsed units
                # (date_diff('month', Jan-31, Feb-01) is 1 in DuckDB, 0 as
                # a naive timestampdiff). Truncating both operands to the
                # unit makes complete-units == boundary-crossings:
                #   timestampdiff(U, date_trunc('u', s), date_trunc('u', e))
                # Trino's date_diff counts complete elapsed units already
                # (java.time between semantics) — timestampdiff directly,
                # NO truncation.
                # 2-arg datediff matches Spark's own datediff — untouched.
                spans, _close = _call_arg_spans(toks, i + 1)
                if len(spans) == 3:
                    u_tok = toks[spans[0][0]]
                    if u_tok[0] == "string":
                        raw_unit = _literal_content(u_tok[1], read).lower()
                    elif (
                        read in ("snowflake", "redshift", "tsql")
                        and u_tok[0] == "ident"
                        and spans[0][0] == spans[0][1]
                    ):
                        # Snowflake/Redshift/T-SQL allow a bare unit
                        # keyword: datediff(day, a, b)
                        raw_unit = u_tok[1].lower()
                    else:
                        raise TranspileError(
                            f"{name} unit must be a literal to transpile"
                        )
                    unit = _resolve_unit(read, raw_unit)
                    if unit is None:
                        raise TranspileError(
                            f"{name} unit {raw_unit!r} has no Spark "
                            "timestampdiff/date_trunc equivalent"
                        )
                    if read == "clickhouse" and unit == "WEEK":
                        # CH week boundaries follow toRelativeWeekNum's
                        # epoch anchoring, not date_trunc's ISO Monday —
                        # a silent off-by-one risk. LOUD.
                        raise TranspileError(
                            "clickhouse dateDiff('week', ...) boundary "
                            "anchoring differs from ISO weeks; use "
                            "intDiv(dateDiff('day', ...), 7) semantics "
                            "explicitly"
                        )
                    edits.append((start, end, "timestampdiff"))
                    edits.append(
                        (toks[spans[0][0]][2], toks[spans[0][0]][3], unit.upper())
                    )
                    if read != "trino":
                        for s_idx, e_idx in spans[1:]:
                            edits.append(
                                (toks[s_idx][2], toks[s_idx][2],
                                 f"date_trunc('{unit.lower()}', ")
                            )
                            edits.append((toks[e_idx][3], toks[e_idx][3], ")"))
                i += 1
                continue

            if name == "regexp_replace" and first_pass:
                # Two fidelity seams: replacement BACKREF syntax differs
                # (\1 in every read dialect vs Java's $1), and duckdb/
                # postgres default to FIRST-match-only replacement while
                # Spark replaces all. Snowflake (occurrence 0 = all) and
                # BigQuery (always all) already match Spark's scope.
                spans, close = _call_arg_spans(toks, i + 1)
                nargs = len(spans)

                def _convert_replacement(span) -> None:
                    tok_ = toks[span[0]]
                    # r'...' raw replacement: ident prefix + adjacent string
                    if (
                        read == "bigquery"
                        and span[0] + 1 == span[1]
                        and tok_[0] == "ident"
                        and tok_[1].lower() == "r"
                        and toks[span[1]][0] == "string"
                        and toks[span[1]][2] == tok_[3]
                    ):
                        content = _raw_body(toks[span[1]][1])  # raw: no unescaping
                    elif span[0] == span[1] and tok_[0] == "string":
                        content = _literal_content(tok_[1], read)
                    else:
                        raise TranspileError(
                            "regexp_replace replacement must be a string "
                            "literal to transpile (backreference syntax "
                            "\\1 vs $1 cannot be checked on expressions)"
                        )
                    converted = _regex_replacement_to_spark(content)
                    lit = _spark_string_literal(converted, read)
                    # emit even when unchanged: marks the literal handler-
                    # owned so the std-dialect doubling pass skips it
                    edits.append((tok_[2], toks[span[1]][3], lit))

                # ansi falls through every branch untouched: generic
                # standard SQL carries no first-only/backref contract here.
                if read in ("duckdb", "postgres"):
                    if nargs == 4 and toks[spans[3][0]][0] == "number":
                        if read == "postgres":
                            # PG 15's regexp_replace(src, pat, rep, START)
                            # is a REAL dialect form — numeric 4th arg,
                            # first-match-only from that position. Not
                            # Spark's replace-all-from-position. LOUD.
                            raise TranspileError(
                                "postgres regexp_replace(source, pattern, "
                                "replacement, start) is first-match-only; "
                                "no Spark rewrite — use the 'g' flag form"
                            )
                        # duckdb has no numeric 4th arg, so this is
                        # already-Spark text (our own 'g'→position-1
                        # output included). Mark its string-literal args
                        # handler-owned (identity edits) so the doubling
                        # pass skips them: this is what makes the rewrite
                        # a true fixpoint for backslash patterns.
                        for a_first, a_last in spans[:3]:
                            t_ = toks[a_first]
                            if a_first == a_last and t_[0] == "string":
                                edits.append((t_[2], t_[3], t_[1]))
                    elif nargs == 4:
                        f_tok = toks[spans[3][0]]
                        if not (
                            spans[3][0] == spans[3][1]
                            and f_tok[0] == "string"
                            and _literal_content(f_tok[1], read) == "g"
                        ):
                            raise TranspileError(
                                "regexp_replace options other than 'g' have "
                                "no Spark rewrite"
                            )
                        _convert_replacement(spans[2])
                        # 'g' (global) IS Spark's scope; rewrite the flag to
                        # Spark's position arg 1 (the default) so the output
                        # is not re-readable as a first-only 3-arg form
                        edits.append((f_tok[2], toks[spans[3][1]][3], "1"))
                    elif nargs == 3:
                        raise TranspileError(
                            f"{read} regexp_replace replaces only the FIRST "
                            "match; Spark replaces all occurrences — add "
                            "the 'g' option if global replacement is "
                            "intended"
                        )
                    else:
                        raise TranspileError("regexp_replace takes 3 or 4 args")
                elif read == "snowflake":
                    if nargs == 2:
                        # 2-arg form strips matches (replacement = '')
                        edits.append((toks[close][2], toks[close][2], ", ''"))
                    elif nargs == 3:
                        _convert_replacement(spans[2])
                    else:
                        raise TranspileError(
                            "regexp_replace with position/occurrence/"
                            "parameters args has no direct Spark rewrite"
                        )
                elif read == "bigquery":
                    if nargs != 3:
                        raise TranspileError("bigquery regexp_replace takes 3 args")
                    _convert_replacement(spans[2])
                elif read == "trino":
                    # Trino replaces ALL matches and already uses Java's
                    # $-backreference syntax (escaped literal $ is \$,
                    # same as Java) — only the 2-arg strip form rewrites;
                    # the lambda form has no Spark analog.
                    if nargs == 2:
                        edits.append((toks[close][2], toks[close][2], ", ''"))
                    elif nargs == 3:
                        s_, e_ = spans[2]
                        if any(
                            toks[k_][0] == "op" and toks[k_][1] == "->"
                            for k_ in range(s_, e_ + 1)
                        ):
                            raise TranspileError(
                                "regexp_replace with a lambda replacement "
                                "has no Spark rewrite"
                            )
                    else:
                        raise TranspileError(
                            "trino regexp_replace takes 2 or 3 args"
                        )
                i += 1
                continue

            if name in ("array_length", "list_length") and is_op(i + 1, "("):
                # Postgres array_length(arr, dim) is always 2-arg; Spark
                # size() takes one. dim=1 drops; any other dim is LOUD.
                spans, close = _call_arg_spans(toks, i + 1)
                edits.append((start, end, "size"))
                if len(spans) == 2:
                    d_first, d_last = spans[1]
                    if (
                        d_first == d_last
                        and toks[d_first][0] == "number"
                        and toks[d_first][1] == "1"
                    ):
                        # drop ", 1" — from the end of arg 1 to end of arg 2
                        edits.append((toks[spans[0][1]][3], toks[d_last][3], ""))
                    else:
                        raise TranspileError(
                            "array_length with a dimension other than 1 has "
                            "no Spark equivalent (arrays are 1-D)"
                        )
                elif len(spans) > 2:
                    raise TranspileError("array_length takes at most 2 args")
                i += 1
                continue

            if name in ("to_timestamp", "to_date") and read in (
                "postgres", "redshift", "oracle"
            ) and first_pass:
                # Postgres/Redshift/Oracle to_timestamp(s, fmt)/to_date(s,
                # fmt) carry Oracle-heritage patterns; Spark reuses the
                # same function names with DIFFERENT pattern letters (DD =
                # day-of-year), so passing them through silently would
                # parse wrong dates — convert the literal format. 1-arg
                # postgres to_timestamp(epoch) becomes timestamp_seconds;
                # Oracle's 1-arg form parses the SESSION NLS format — not
                # knowable at render time, LOUD.
                spans, _close = _call_arg_spans(toks, i + 1)
                if len(spans) == 1 and read == "oracle":
                    raise TranspileError(
                        f"oracle 1-arg {name} depends on the session NLS "
                        "format; pass an explicit format to transpile"
                    )
                if len(spans) == 1 and name == "to_timestamp":
                    edits.append((start, end, "timestamp_seconds"))
                elif len(spans) == 2 and toks[spans[1][0]][0] == "string" \
                        and spans[1][0] == spans[1][1]:
                    fmt_tok = toks[spans[1][0]]
                    converted = convert_pg_format(fmt_tok[1][1:-1].replace("''", "'"))
                    edits.append(
                        (fmt_tok[2], fmt_tok[3],
                         _spark_string_literal(converted, read))
                    )
                else:
                    raise TranspileError(
                        f"{name} needs a literal format to transpile from postgres"
                    )
                i += 1
                continue

            if name in ("dayname", "monthname") and read in (
                "duckdb", "postgres", "snowflake", "mysql"
            ):
                # dayname(x) → date_format(x, 'EEEE'); monthname → 'MMMM'
                # (MySQL also returns full names). Snowflake returns the
                # ABBREVIATED names ('Mon'/'Jan') — 'EEE'/'MMM'.
                args = _call_args(toks, i + 1)
                close = args[-1]
                if read == "snowflake":
                    fmt = "'EEE'" if name == "dayname" else "'MMM'"
                else:
                    fmt = "'EEEE'" if name == "dayname" else "'MMMM'"
                edits.append((start, end, "date_format"))
                edits.append((toks[close][2], toks[close][2], f", {fmt}"))
                i += 1
                continue

            # ---- ClickHouse-specific handlers
            if read == "clickhouse":
                # quantile(0.9)(x)-style parameterized aggregate
                # combinators: the second argument list is CH-only
                # grammar with no Spark analog — LOUD before it can lex
                # into nonsense.
                # computed ONCE here and reused by every handler in
                # this block (the guard needs only the close index,
                # but handlers need the spans anyway)
                _spans0, _close0 = _call_arg_spans(toks, i + 1)
                if is_op(_close0 + 1, "("):
                    raise TranspileError(
                        f"clickhouse parameterized combinator "
                        f"{text}(...)(...) has no Spark rewrite"
                    )

                if name in _CH_CAST_FN:
                    spans, close = _spans0, _close0
                    if len(spans) != 1:
                        raise TranspileError(
                            f"{text} with a timezone/precision argument "
                            "has no Spark CAST rewrite"
                        )
                    edits.append((start, end, "CAST"))
                    edits.append(
                        (toks[close][2], toks[close][2],
                         f" AS {_CH_CAST_FN[name]}")
                    )
                    i += 1
                    continue

                if name in _CH_TRUNC_FN:
                    unit_, as_date = _CH_TRUNC_FN[name]
                    spans, close = _spans0, _close0
                    if len(spans) != 1:
                        raise TranspileError(
                            f"{text} with a timezone argument has no "
                            "Spark rewrite"
                        )
                    if as_date:
                        # CH returns Date; date_trunc a timestamp
                        edits.append(
                            (start, toks[i + 1][3],
                             f"CAST(date_trunc('{unit_}', ")
                        )
                        edits.append(
                            (toks[close][2], toks[close][3], ") AS DATE)")
                        )
                    else:
                        edits.append(
                            (start, toks[i + 1][3], f"date_trunc('{unit_}', ")
                        )
                    i += 1
                    continue

                if name in ("toyyyymm", "toyyyymmdd"):
                    spans, close = _spans0, _close0
                    if len(spans) != 1:
                        raise TranspileError(f"{text} takes 1 arg")
                    fmt_ = "yyyyMM" if name == "toyyyymm" else "yyyyMMdd"
                    edits.append((start, toks[i + 1][3], "CAST(date_format("))
                    edits.append(
                        (toks[close][2], toks[close][3],
                         f", '{fmt_}') AS INT)")
                    )
                    i += 1
                    continue

                if name == "yesterday":
                    spans, close = _spans0, _close0
                    if spans:
                        raise TranspileError("yesterday takes no args")
                    edits.append(
                        (start, toks[close][3], "date_sub(current_date(), 1)")
                    )
                    i = close + 1
                    continue

                if name == "todayofweek":
                    # default mode 0: ISO Monday=1 — same as weekday()+1;
                    # any explicit mode argument is LOUD.
                    spans, close = _spans0, _close0
                    if len(spans) != 1:
                        raise TranspileError(
                            "toDayOfWeek with a mode/timezone argument "
                            "has no Spark rewrite"
                        )
                    _emit_iso_dow(edits, start, end, toks[close][3])
                    i += 1
                    continue

                if name == "fromunixtimestamp":
                    spans, _close = _spans0, _close0
                    if len(spans) != 1:
                        raise TranspileError(
                            "fromUnixTimestamp with a format/timezone "
                            "argument has no Spark rewrite"
                        )
                    edits.append((start, end, "timestamp_seconds"))
                    i += 1
                    continue

                if name == "formatdatetime" and first_pass:
                    spans, _close = _spans0, _close0
                    if len(spans) != 2 or toks[spans[1][0]][0] != "string" \
                            or spans[1][0] != spans[1][1]:
                        raise TranspileError(
                            "formatDateTime needs a literal format (and "
                            "no timezone arg) to transpile"
                        )
                    fmt_tok = toks[spans[1][0]]
                    converted = convert_ch_format(
                        _literal_content(fmt_tok[1], read)
                    )
                    edits.append((start, end, "date_format"))
                    edits.append(
                        (fmt_tok[2], fmt_tok[3],
                         _spark_string_literal(converted, read))
                    )
                    i += 1
                    continue

                if name in ("date_add", "dateadd") and first_pass:
                    # date_add(unit, n, date) — bare keyword or quoted
                    # unit. 2-arg date_add(date, n) matches Spark.
                    spans, _close = _spans0, _close0
                    if len(spans) == 3:
                        u_tok = toks[spans[0][0]]
                        if u_tok[0] == "string":
                            raw_unit = _literal_content(u_tok[1], read).lower()
                        elif u_tok[0] == "ident" and spans[0][0] == spans[0][1]:
                            raw_unit = u_tok[1].lower()
                        else:
                            raise TranspileError(
                                f"{text} unit must be a literal"
                            )
                        unit = _resolve_unit(read, raw_unit)
                        if unit is None:
                            raise TranspileError(
                                f"{text} unit {raw_unit!r} has no Spark "
                                "timestampadd equivalent"
                            )
                        edits.append((start, end, "timestampadd"))
                        edits.append(
                            (u_tok[2], toks[spans[0][1]][3], unit)
                        )
                    i += 1
                    continue

                if name in _CH_ADD_FN:
                    unit_, neg = _CH_ADD_FN[name]
                    spans, close = _spans0, _close0
                    if len(spans) != 2:
                        raise TranspileError(f"{text} takes 2 args")
                    d_text = _arg_text(spans[0])
                    n_text = _arg_text(spans[1])
                    qty = f"-({n_text})" if neg else n_text
                    edits.append(
                        (start, toks[close][3],
                         f"timestampadd({unit_}, {qty}, {d_text})")
                    )
                    i = close + 1
                    continue

                if name == "position":
                    # CH position(haystack, needle[, start]) — REVERSED
                    # from Spark's position(substr, str); instr matches
                    # the CH order. The grammar form position(x IN y)
                    # already means the same in both.
                    spans, _close = _spans0, _close0
                    if len(spans) == 1:
                        i += 1  # position(x IN y) — Spark grammar form
                        continue
                    if len(spans) == 2:
                        edits.append((start, end, "instr"))
                        i += 1
                        continue
                    raise TranspileError(
                        "position with a start offset has no Spark "
                        "rewrite in the ClickHouse argument order"
                    )

                if name in ("length", "reverse") and first_pass:
                    # CH length is BYTES for strings and size for arrays;
                    # CH reverse is byte-wise on strings (garbled UTF-8).
                    # The operand type is unknowable at render — LOUD.
                    # first_pass only: length()/reverse() in later passes
                    # are our own lengthUTF8/reverseUTF8 rewrites.
                    raise TranspileError(
                        f"clickhouse {name}() is byte/array-ambiguous; "
                        f"use {name}UTF8 for strings"
                        + (" or cardinality-style size for arrays"
                           if name == "length" else "")
                    )

                if name == "extract":
                    # comma form extract(haystack, pattern) is a regex
                    # fragment match: group 1 when the pattern has a
                    # capture group, else the whole match. The EXTRACT
                    # (field FROM x) grammar form passes through.
                    spans, close = _spans0, _close0
                    if len(spans) == 1:
                        i += 1
                        continue
                    if len(spans) != 2:
                        raise TranspileError("extract takes 2 args")
                    p_tok = toks[spans[1][0]]
                    if not (
                        p_tok[0] == "string" and spans[1][0] == spans[1][1]
                    ):
                        raise TranspileError(
                            "clickhouse extract(haystack, pattern) needs "
                            "a literal pattern (group selection depends "
                            "on its capture groups)"
                        )
                    pat = _literal_content(p_tok[1], read)
                    group = 1 if re.search(r"(?<!\\)\((?!\?)", pat) else 0
                    edits.append((start, end, "regexp_extract"))
                    edits.append(
                        (toks[close][2], toks[close][2], f", {group}")
                    )
                    i += 1
                    continue

                if name in ("splitbychar", "splitbystring", "splitbyregexp"):
                    # separator FIRST in CH; plain-string separators are
                    # regex-escaped for Spark's regex split.
                    spans, close = _spans0, _close0
                    if len(spans) != 2:
                        raise TranspileError(
                            f"{text} with a max_substrings argument has "
                            "no Spark rewrite (Spark's limit keeps the "
                            "remainder; ClickHouse discards it)"
                        )
                    sep_tok = toks[spans[0][0]]
                    s_text = _arg_text(spans[1])
                    if name == "splitbyregexp":
                        sep_text = _arg_text(spans[0])
                    else:
                        if not (
                            sep_tok[0] == "string"
                            and spans[0][0] == spans[0][1]
                        ):
                            raise TranspileError(
                                f"{text} separator must be a string "
                                "literal to transpile (plain string vs "
                                "Spark regex)"
                            )
                        sep_text = _regex_literal(
                            _literal_content(sep_tok[1], read), read
                        )
                    edits.append(
                        (start, toks[close][3],
                         f"split({s_text}, {sep_text})")
                    )
                    i = close + 1
                    continue

                if name == "multiif":
                    spans, close = _spans0, _close0
                    if len(spans) < 3 or len(spans) % 2 == 0:
                        raise TranspileError(
                            "multiIf takes cond/value pairs plus an else"
                        )
                    parts = ["CASE"]
                    for k_ in range(0, len(spans) - 1, 2):
                        parts.append(
                            f"WHEN ({_arg_text(spans[k_])}) "
                            f"THEN ({_arg_text(spans[k_ + 1])})"
                        )
                    parts.append(f"ELSE ({_arg_text(spans[-1])}) END")
                    edits.append((start, toks[close][3], " ".join(parts)))
                    i = close + 1
                    continue

                if name in ("assumenotnull", "tonullable", "tolowcardinality"):
                    # nullability/storage wrappers — unwrap to the arg
                    spans, close = _spans0, _close0
                    if len(spans) != 1:
                        raise TranspileError(f"{text} takes 1 arg")
                    edits.append(
                        (start, toks[close][3], f"({_arg_text(spans[0])})")
                    )
                    i = close + 1
                    continue

                if name == "rand" and first_pass:
                    # CH rand() is a uniform UInt32, not a [0,1) float.
                    # first_pass only: the rewrite contains rand() itself.
                    spans, close = _spans0, _close0
                    if spans:
                        raise TranspileError(
                            "rand(expr) has no Spark rewrite; use "
                            "randCanonical for a [0,1) float"
                        )
                    edits.append(
                        (start, toks[close][3],
                         "CAST(floor(rand() * 4294967296) AS BIGINT)")
                    )
                    i = close + 1
                    continue

                if name == "intdiv":
                    spans, close = _spans0, _close0
                    _emit_infix_call(
                        edits, toks, start, close, spans, "DIV", _arg_text, name
                    )
                    i = close + 1
                    continue

                if name in ("plus", "minus", "multiply", "divide"):
                    spans, close = _spans0, _close0
                    op_ = {
                        "plus": "+", "minus": "-",
                        "multiply": "*", "divide": "/",
                    }[name]
                    _emit_infix_call(
                        edits, toks, start, close, spans, op_, _arg_text, text
                    )
                    i = close + 1
                    continue

                if name in ("sumif", "avgif", "minif", "maxif"):
                    # aggIf(x, cond) → agg(if(cond, x, NULL)) — the agg
                    # ignores NULL, matching the CH row filter
                    spans, close = _spans0, _close0
                    if len(spans) != 2:
                        raise TranspileError(f"{text} takes 2 args")
                    agg = name[:-2]
                    x = _arg_text(spans[0])
                    c = _arg_text(spans[1])
                    edits.append(
                        (start, toks[close][3],
                         f"{agg}(if(({c}), ({x}), NULL))")
                    )
                    i = close + 1
                    continue

                if name in ("arraymap", "arrayfilter", "arrayexists", "arrayall"):
                    # CH higher-order functions take the LAMBDA FIRST
                    spans, close = _spans0, _close0
                    if len(spans) != 2:
                        raise TranspileError(
                            f"{text} over multiple arrays has no direct "
                            "Spark rewrite (zip the arrays first)"
                        )
                    target_ = {
                        "arraymap": "transform", "arrayfilter": "filter",
                        "arrayexists": "exists", "arrayall": "forall",
                    }[name]
                    lam = _arg_text(spans[0])
                    arr = _arg_text(spans[1])
                    edits.append(
                        (start, toks[close][3],
                         f"{target_}(({arr}), {lam})")
                    )
                    i = close + 1
                    continue

                if name == "arraystringconcat":
                    # 1-arg form joins with the empty-string default that
                    # Spark's 2-arg array_join has no default for
                    spans, close = _spans0, _close0
                    if len(spans) == 1:
                        edits.append((start, end, "array_join"))
                        edits.append((toks[close][2], toks[close][2], ", ''"))
                        i += 1
                        continue
                    # 2-arg falls through to the array_join rename

                if name == "arraysort":
                    spans, _close = _spans0, _close0
                    if len(spans) == 1:
                        edits.append((start, end, "array_sort"))
                        i += 1
                        continue
                    raise TranspileError(
                        "arraySort with a key-extractor lambda has no "
                        "Spark rewrite (Spark's comparator takes 2 args)"
                    )

                if name in (
                    "jsonextractstring", "jsonextractint",
                    "jsonextractfloat", "jsonextractbool",
                ):
                    spans, close = _spans0, _close0
                    if len(spans) < 2:
                        raise TranspileError(f"{text} needs a key path")
                    keys: list[str] = []
                    for s_, e_ in spans[1:]:
                        t_ = toks[s_]
                        if not (s_ == e_ and t_[0] == "string"):
                            raise TranspileError(
                                f"{text} keys must be string literals "
                                "(numeric indices are 1-based in "
                                "ClickHouse, 0-based in JSONPath)"
                            )
                        key = _literal_content(t_[1], read)
                        if re.search(r"[.\[\]'\"$\\]", key):
                            raise TranspileError(
                                f"{text} key {key!r} needs JSONPath "
                                "quoting; rewrite with get_json_object"
                            )
                        keys.append(key)
                    path = "$." + ".".join(keys)
                    j_text = _arg_text(spans[0])
                    inner = f"get_json_object({j_text}, '{path}')"
                    cast_t = {
                        "jsonextractstring": None,
                        "jsonextractint": "BIGINT",
                        "jsonextractfloat": "DOUBLE",
                        "jsonextractbool": "BOOLEAN",
                    }[name]
                    if cast_t:
                        inner = f"CAST({inner} AS {cast_t})"
                    edits.append((start, toks[close][3], inner))
                    i = close + 1
                    continue

                if name == "replaceregexpall":
                    spans, close = _spans0, _close0
                    if len(spans) != 3:
                        raise TranspileError("replaceRegexpAll takes 3 args")
                    r_first, r_last = spans[2]
                    r_tok = toks[r_first]
                    if not (r_first == r_last and r_tok[0] == "string"):
                        raise TranspileError(
                            "replaceRegexpAll replacement must be a "
                            "string literal to transpile (backreference "
                            "syntax \\1 vs $1)"
                        )
                    converted = _regex_replacement_to_spark(
                        _literal_content(r_tok[1], read)
                    )
                    edits.append((start, end, "regexp_replace"))
                    edits.append(
                        (r_tok[2], toks[r_last][3],
                         _spark_string_literal(converted, read))
                    )
                    i += 1
                    continue

            # ---- Trino-specific handlers
            if read == "trino":
                if name == "unnest":
                    # FROM-clause UNNEST. Shapes:
                    #   t CROSS|INNER JOIN UNNEST(x) AS u(e) | t, UNNEST(x) AS u(e)
                    #   t LEFT [OUTER] JOIN UNNEST(x) AS u(e) ON TRUE
                    #   FROM UNNEST(x) AS u(e)               (standalone)
                    # → LATERAL VIEW [OUTER] explode[_outer](x) u AS e.
                    # A 2-column alias unnests a MAP (explode yields key,
                    # value). WITH ORDINALITY is 1-based with a TRAILING
                    # ordinal; posexplode is 0-based and LEADS — no
                    # faithful alias-only rewrite, so LOUD.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError(
                            "UNNEST of multiple arrays zips them; no Spark "
                            "rewrite — arrays_zip + a single UNNEST instead"
                        )
                    expr_text = _arg_text(spans[0])
                    j = close + 1
                    if (
                        j + 1 < n
                        and toks[j][0] == "ident"
                        and toks[j][1].upper() == "WITH"
                        and toks[j + 1][0] == "ident"
                        and toks[j + 1][1].upper() == "ORDINALITY"
                    ):
                        raise TranspileError(
                            "UNNEST ... WITH ORDINALITY is 1-based with a "
                            "trailing ordinal column; rewrite with Spark "
                            "posexplode and pos + 1 explicitly"
                        )
                    if j < n and toks[j][0] == "ident" and toks[j][1].upper() == "AS":
                        j += 1
                    if not (
                        j < n
                        and toks[j][0] in _NAME_KINDS
                        and toks[j][1].upper() not in _EXPR_KEYWORDS
                    ):
                        raise TranspileError(
                            "UNNEST needs `AS alias(column[, column])` to "
                            "be referenceable after transpile"
                        )
                    tbl_alias = _ident_text(toks[j][0], toks[j][1])
                    j += 1
                    if not is_op(j, "("):
                        raise TranspileError(
                            "trino UNNEST alias needs a column list: "
                            "AS alias(column[, column])"
                        )
                    col_spans, col_close = _call_arg_spans(toks, j)
                    cols: list[str] = []
                    for s_, e_ in col_spans:
                        if s_ != e_ or toks[s_][0] not in _NAME_KINDS:
                            raise TranspileError(
                                "UNNEST column alias list must be plain names"
                            )
                        cols.append(_ident_text(toks[s_][0], toks[s_][1]))
                    if not cols or len(cols) > 2:
                        raise TranspileError(
                            "UNNEST alias takes 1 column (array) or 2 (map)"
                        )
                    region_end_tok = col_close
                    outer = False
                    standalone = False
                    p = i - 1
                    region_start_tok = i
                    if p >= 0 and is_op(p, ","):
                        region_start_tok = p
                    elif (
                        p >= 0
                        and toks[p][0] == "ident"
                        and toks[p][1].upper() == "JOIN"
                    ):
                        region_start_tok = p
                        q = p - 1
                        if q >= 0 and toks[q][0] == "ident" and \
                                toks[q][1].upper() in ("RIGHT", "FULL"):
                            raise TranspileError(
                                f"{toks[q][1].upper()} JOIN UNNEST has no "
                                "Spark rewrite (LATERAL VIEW is left-"
                                "anchored); use LEFT JOIN ... ON TRUE"
                            )
                        is_inner = True  # bare JOIN = INNER in Trino
                        if q >= 0 and toks[q][0] == "ident" and \
                                toks[q][1].upper() in ("CROSS", "INNER"):
                            region_start_tok = q
                            is_inner = toks[q][1].upper() == "INNER"
                        elif q >= 0 and toks[q][0] == "ident" and \
                                toks[q][1].upper() in ("LEFT", "OUTER"):
                            outer = True
                            region_start_tok = q
                            if toks[q][1].upper() == "OUTER":
                                if not (
                                    q - 1 >= 0
                                    and toks[q - 1][0] == "ident"
                                    and toks[q - 1][1].upper() == "LEFT"
                                ):
                                    raise TranspileError(
                                        "only LEFT [OUTER] JOIN UNNEST "
                                        "has a Spark rewrite (LATERAL "
                                        "VIEW is left-anchored)"
                                    )
                                region_start_tok = q - 1
                            # consume the mandatory ON TRUE
                            if (
                                region_end_tok + 2 < n
                                and toks[region_end_tok + 1][0] == "ident"
                                and toks[region_end_tok + 1][1].upper() == "ON"
                                and toks[region_end_tok + 2][0] == "ident"
                                and toks[region_end_tok + 2][1].upper() == "TRUE"
                            ):
                                region_end_tok += 2
                            else:
                                raise TranspileError(
                                    "LEFT JOIN UNNEST requires ON TRUE"
                                )
                            is_inner = False
                        # Trino requires ON for INNER JOIN, so
                        # `[INNER] JOIN UNNEST(..) u(e) ON TRUE` is a
                        # standard spelling — consume the trivial ON
                        if (
                            is_inner
                            and region_end_tok + 2 < n
                            and toks[region_end_tok + 1][0] == "ident"
                            and toks[region_end_tok + 1][1].upper() == "ON"
                            and toks[region_end_tok + 2][0] == "ident"
                            and toks[region_end_tok + 2][1].upper() == "TRUE"
                        ):
                            region_end_tok += 2
                    elif (
                        p >= 0
                        and toks[p][0] == "ident"
                        and toks[p][1].upper() == "FROM"
                    ):
                        standalone = True
                    else:
                        raise TranspileError(
                            "UNNEST must follow FROM, a comma, or a "
                            "CROSS/INNER/LEFT JOIN"
                        )
                    col_list = ", ".join(cols)
                    if standalone:
                        repl = (
                            f"(SELECT explode({expr_text}) AS ({col_list})) "
                            f"AS {tbl_alias}"
                        )
                        edits.append((toks[i][2], toks[region_end_tok][3], repl))
                    else:
                        fn_ = "explode_outer" if outer else "explode"
                        lv = "LATERAL VIEW OUTER" if outer else "LATERAL VIEW"
                        repl = (
                            f" {lv} {fn_}({expr_text}) {tbl_alias} "
                            f"AS {col_list}"
                        )
                        edits.append(
                            (toks[region_start_tok][2],
                             toks[region_end_tok][3], repl)
                        )
                    i = region_end_tok + 1
                    continue

                if name == "extract":
                    # Trino DOW is ISO (1=Mon..7=Sun; Spark's bare DOW is
                    # 0=Sun) and YOW is the ISO week year — map the field
                    # names to Spark's ISO spellings. Other fields match.
                    if i + 2 < n and toks[i + 2][0] == "ident":
                        f_tok = toks[i + 2]
                        mapped_f = {
                            "dow": "DAYOFWEEK_ISO",
                            "day_of_week": "DAYOFWEEK_ISO",
                            "yow": "YEAROFWEEK",
                            "year_of_week": "YEAROFWEEK",
                            "doy": "DOY",
                            "day_of_year": "DOY",
                        }.get(f_tok[1].lower())
                        if mapped_f and mapped_f != f_tok[1].upper():
                            edits.append((f_tok[2], f_tok[3], mapped_f))
                    i += 1
                    continue

                if name == "date_format" and first_pass:
                    # Same name + arg order as Spark, but Trino uses MySQL
                    # %-codes (trino.io/docs: "MySQL date functions").
                    # Same shared-name ambiguity rule as the MySQL handler.
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2 or toks[spans[1][0]][0] != "string" \
                            or spans[1][0] != spans[1][1]:
                        raise TranspileError(
                            "trino date_format needs a literal format to "
                            "transpile"
                        )
                    fmt_tok = toks[spans[1][0]]
                    raw_fmt = _literal_content(fmt_tok[1], read)
                    if "%" not in raw_fmt:
                        if re.search(r"[A-Za-z]", raw_fmt):
                            raise TranspileError(
                                f"date_format pattern {raw_fmt!r} has no "
                                "%-codes; cannot tell a literal Trino "
                                "format from an already-Spark pattern"
                            )
                        i += 1
                        continue
                    converted = convert_mysql_format(raw_fmt)
                    edits.append((start, end, "date_format"))
                    edits.append(
                        (fmt_tok[2], fmt_tok[3],
                         _spark_string_literal(converted, read))
                    )
                    i += 1
                    continue

                if name == "date_parse" and first_pass:
                    # date_parse(s, '%Y-%m-%d') always returns TIMESTAMP.
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2 or toks[spans[1][0]][0] != "string" \
                            or spans[1][0] != spans[1][1]:
                        raise TranspileError(
                            "date_parse needs a literal format to transpile"
                        )
                    fmt_tok = toks[spans[1][0]]
                    converted = convert_mysql_format(
                        _literal_content(fmt_tok[1], read)
                    )
                    edits.append((start, end, "to_timestamp"))
                    edits.append(
                        (fmt_tok[2], fmt_tok[3],
                         _spark_string_literal(converted, read))
                    )
                    i += 1
                    continue

                if name == "from_unixtime":
                    # Trino returns TIMESTAMP (Spark's from_unixtime
                    # returns a formatted STRING) → timestamp_seconds,
                    # which also keeps Trino's fractional seconds.
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError(
                            "trino from_unixtime with a zone/offset has no "
                            "Spark rewrite"
                        )
                    edits.append((start, end, "timestamp_seconds"))
                    i += 1
                    continue

                if name == "to_unixtime":
                    # Returns DOUBLE epoch seconds with fraction —
                    # unix_timestamp() would truncate to BIGINT. The CAST
                    # interprets zone-less operands (Trino's plain
                    # timestamp → our TIMESTAMP_NTZ) in the session zone,
                    # exactly Trino's rule; LTZ operands pass unchanged.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError("to_unixtime takes 1 arg")
                    # TIMESTAMP_LTZ spelling: bare TIMESTAMP would be
                    # re-read as trino's zone-less type on the next
                    # fixpoint pass and remapped to NTZ
                    edits.append((start, end, "(unix_micros(CAST"))
                    edits.append(
                        (toks[close][2], toks[close][2], " AS TIMESTAMP_LTZ")
                    )
                    edits.append((toks[close][3], toks[close][3], ") / 1e6)"))
                    i += 1
                    continue

                if name == "date_add" and first_pass:
                    # date_add('unit', n, x) → timestampadd(UNIT, n, x).
                    # The 2-arg form is already-Spark text — untouched.
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 3:
                        u_tok = toks[spans[0][0]]
                        if not (
                            u_tok[0] == "string" and spans[0][0] == spans[0][1]
                        ):
                            raise TranspileError(
                                "date_add unit must be a string literal"
                            )
                        raw_unit = _literal_content(u_tok[1], read).lower()
                        unit = _resolve_unit(read, raw_unit)
                        if unit is None:
                            raise TranspileError(
                                f"date_add unit {raw_unit!r} has no Spark "
                                "timestampadd equivalent"
                            )
                        edits.append((start, end, "timestampadd"))
                        edits.append((u_tok[2], u_tok[3], unit))
                    i += 1
                    continue

                if name in ("day_of_week", "dow"):
                    # ISO 1=Monday..7=Sunday; Spark weekday is 0=Monday.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError(f"{name} takes 1 arg")
                    _emit_iso_dow(edits, start, end, toks[close][3])
                    i += 1
                    continue

                if name in ("year_of_week", "yow"):
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError(f"{name} takes 1 arg")
                    edits.append(
                        (start, toks[i + 1][3], "extract(YEAROFWEEK FROM ")
                    )
                    i += 1
                    continue

                if name in ("regexp_extract", "regexp_extract_all"):
                    # Trino's 2-arg form returns the WHOLE match; Spark
                    # defaults to group 1 — pin group 0. 3-arg matches.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 2:
                        edits.append((toks[close][2], toks[close][2], ", 0"))
                    i += 1
                    continue

                if name == "split" and first_pass:
                    # Trino splits on a PLAIN string; Spark's split is a
                    # regex — regex-escape a literal delimiter.
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) not in (2, 3):
                        raise TranspileError("split takes 2 or 3 args")
                    d_tok = toks[spans[1][0]]
                    if not (
                        d_tok[0] == "string" and spans[1][0] == spans[1][1]
                    ):
                        raise TranspileError(
                            "trino split delimiter must be a string "
                            "literal to transpile (plain string vs Spark "
                            "regex)"
                        )
                    edits.append(
                        (d_tok[2], d_tok[3],
                         _regex_literal(_literal_content(d_tok[1], read), read))
                    )
                    i += 1
                    continue

                if name == "element_at" and first_pass:
                    # Trino element_at() is NULL out of bounds / missing
                    # key; Spark 4 (ANSI on) raises without try_. FIRST
                    # PASS only: the element_at the subscript rewrite
                    # emits for arr[i] must stay plain — Trino brackets
                    # ERROR out of bounds, which ANSI element_at matches.
                    edits.append((start, end, "try_element_at"))
                    i += 1
                    continue

                if name == "strpos":
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 3:
                        raise TranspileError(
                            "strpos(string, substring, instance) has no "
                            "Spark equivalent"
                        )
                    # 2-arg falls through to the instr rename below

                if name == "split_part" and first_pass:
                    # Same shape (plain delimiter, 1-based), but Trino
                    # returns NULL for an out-of-range index where
                    # Spark's split_part returns '' — a silent IS NULL
                    # filter hazard. try_element_at over the regex-escaped
                    # split carries Trino's exact semantics (NULL out of
                    # range, '' for genuinely-empty fields) and evaluates
                    # each operand ONCE. Needs a literal delimiter for
                    # the regex escape.
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 3:
                        raise TranspileError("split_part takes 3 args")
                    d_tok = toks[spans[1][0]]
                    if not (
                        d_tok[0] == "string" and spans[1][0] == spans[1][1]
                    ):
                        raise TranspileError(
                            "trino split_part delimiter must be a string "
                            "literal to transpile (plain string vs Spark "
                            "regex)"
                        )
                    s_text = _arg_text(spans[0])
                    n_text = _arg_text(spans[2])
                    d_re = _regex_literal(
                        _literal_content(d_tok[1], read), read
                    )
                    edits.append(
                        (start, toks[close][3],
                         f"try_element_at(split({s_text}, {d_re}), "
                         f"{n_text})")
                    )
                    i = close + 1
                    continue

                if name == "approx_percentile":
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if len(spans) >= 3:
                        raise TranspileError(
                            "approx_percentile with a weight arg has no "
                            "Spark form (Spark's 3rd arg is accuracy)"
                        )
                    # 2-arg matches Spark — untouched

                if name == "map":
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) == 2:
                        # map(keys_array, values_array)
                        edits.append((start, end, "map_from_arrays"))
                        i += 1
                        continue
                    if len(spans) == 0:
                        i += 1  # map() is the empty map in both
                        continue
                    raise TranspileError(
                        "trino map() takes 0 args or 2 array args"
                    )

                if name in _TRINO_URL_PARTS:
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError(f"{name} takes 1 arg")
                    edits.append((start, end, "parse_url"))
                    edits.append(
                        (toks[close][2], toks[close][2],
                         f", '{_TRINO_URL_PARTS[name]}'")
                    )
                    i += 1
                    continue

                if name == "url_extract_parameter":
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2:
                        raise TranspileError("url_extract_parameter takes 2 args")
                    edits.append((start, end, "parse_url"))
                    edits.append(
                        (toks[spans[0][1]][3], toks[spans[0][1]][3], ", 'QUERY'")
                    )
                    i += 1
                    continue

                if name == "to_utf8":
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError("to_utf8 takes 1 arg")
                    edits.append((start, end, "encode"))
                    edits.append((toks[close][2], toks[close][2], ", 'UTF-8'"))
                    i += 1
                    continue

                if name == "from_utf8":
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError(
                            "from_utf8 with a replacement arg has no Spark "
                            "equivalent" if len(spans) == 2
                            else "from_utf8 takes 1 arg"
                        )
                    edits.append((start, end, "decode"))
                    edits.append((toks[close][2], toks[close][2], ", 'UTF-8'"))
                    i += 1
                    continue

                if name == "none_match":
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 2:
                        raise TranspileError("none_match takes 2 args")
                    edits.append((start, end, "(NOT exists"))
                    edits.append((toks[close][3], toks[close][3], ")"))
                    i += 1
                    continue

                if name in ("infinity", "nan"):
                    spans, close = _call_arg_spans(toks, i + 1)
                    if spans:
                        raise TranspileError(f"{name} takes no args")
                    lit = "Infinity" if name == "infinity" else "NaN"
                    edits.append(
                        (start, toks[close][3], f"CAST('{lit}' AS DOUBLE)")
                    )
                    i = close + 1
                    continue

                if name in ("random", "rand"):
                    spans, _close = _call_arg_spans(toks, i + 1)
                    if spans:
                        raise TranspileError(
                            f"{name}(n) returns a bounded INTEGER in "
                            "Trino; use floor(rand() * n)"
                        )
                    if name == "random":
                        edits.append((start, end, "rand"))
                    i += 1
                    continue

                if name in ("bitwise_and", "bitwise_or", "bitwise_xor"):
                    spans, close = _call_arg_spans(toks, i + 1)
                    op_ = {
                        "bitwise_and": "&", "bitwise_or": "|",
                        "bitwise_xor": "^",
                    }[name]
                    _emit_infix_call(
                        edits, toks, start, close, spans, op_, _arg_text, name
                    )
                    i = close + 1
                    continue

                if name == "bitwise_not":
                    spans, close = _call_arg_spans(toks, i + 1)
                    if len(spans) != 1:
                        raise TranspileError("bitwise_not takes 1 arg")
                    a = _arg_text(spans[0])
                    edits.append((start, toks[close][3], f"(~({a}))"))
                    i = close + 1
                    continue

            if (
                name in ("list_extract", "array_extract")
                and read in ("duckdb", "postgres")
            ):
                # DuckDB list_extract/array_extract return NULL out of
                # bounds and for index 0 (verified: list_extract([1,2,3],
                # 0) → NULL); Spark-4 ANSI element_at RAISES on both, and
                # try_element_at still raises INVALID_INDEX_OF_ZERO for
                # index 0. nullif(i, 0) maps 0 → NULL, and
                # try_element_at(arr, NULL) is NULL — exact parity
                # (negative indexes count from the end in both engines).
                spans, _close = _call_arg_spans(toks, i + 1)
                if len(spans) != 2:
                    raise TranspileError(f"{name} takes 2 args")
                edits.append((start, end, "try_element_at"))
                i2_start = toks[spans[1][0]][2]
                i2_end = toks[spans[1][1]][3]
                edits.append((i2_start, i2_start, "nullif("))
                edits.append((i2_end, i2_end, ", 0)"))
                i += 1  # keep scanning inside the args
                continue

            if name == "log" and read in ("duckdb", "postgres"):
                # 1-arg log is log10 in DuckDB/Postgres, ln in Spark.
                args = _call_args(toks, i + 1)
                if len(args) - 1 == 1:
                    edits.append((start, end, "log10"))
                i += 1
                continue

            # ---- plain renames
            if name in fn_map:
                target = fn_map[name]
                if target is None:
                    raise TranspileError(
                        f"function {name}() has no direct Spark equivalent"
                    )
                _require_spark4(name, target)
                edits.append((start, end, target))
            i += 1
            continue

        # Double-quoted IDENTIFIERS (standard SQL + Snowflake): Spark's
        # default parser reads "MyCol" as a STRING LITERAL, silently
        # substituting the constant for the column — rewrite to backticks.
        # (BigQuery never reaches here: its dquote tokens are re-kinded
        # to strings by the tokenizer, which matches Spark's reading.)
        if kind == "dquote":
            inner = text[1:-1].replace('""', '"')
            edits.append((start, end, "`" + inner.replace("`", "``") + "`"))
            i += 1
            continue

        # T-SQL [Name] bracket identifiers → backticks (Spark would read
        # a subscript expression).
        if kind == "brident":
            inner = text[1:-1].replace("]]", "]")
            edits.append((start, end, "`" + inner.replace("`", "``") + "`"))
            i += 1
            continue

        # BigQuery quotes whole dotted paths in ONE backtick span
        # (`project.dataset.table`); Spark would read that as a single
        # identifier whose name contains dots. Split into per-part quoting.
        if kind == "bquote" and read == "bigquery" and "." in text:
            inner = text[1:-1]
            if "`" not in inner.replace("``", ""):
                parts = inner.split(".")
                edits.append(
                    (start, end, ".".join(f"`{p}`" for p in parts))
                )
            i += 1
            continue

        i += 1

    # Literal-semantics pass: DuckDB/Postgres string literals are standard
    # SQL (backslash is an ordinary character); Spark's default parser
    # processes C-style escapes ('a\b' is 'a'+backspace). Double every
    # backslash in untouched literals so content survives byte-identical.
    # Literals a special handler already rewrote (regex separators,
    # converted formats) are skipped — those were emitted Spark-ready.
    # FIRST PASS ONLY: all literal-deriving handlers complete in pass 1;
    # later fixpoint passes (deferred subscripts) must not re-double.
    if first_pass and read in _STD_LITERAL_DIALECTS:
        for kind, text, start, end in toks:
            if (
                kind == "string"
                and "\\" in text
                and not any(e_start < end and start < e_end for e_start, e_end, _ in edits)
            ):
                edits.append((start, end, text.replace("\\", "\\\\")))

    # Snowflake/BigQuery literals also use backslash escapes, but the
    # escape TABLES differ from Spark's (\f, \xhh, \a, \v, \ooo... have no
    # Spark decoding — Spark drops the backslash, silently yielding 'x41'
    # from '\x41'). Untouched literals containing a backslash are decoded
    # per the READ dialect and re-emitted in Spark-safe form; common regex
    # escapes (\\d) round-trip byte-identical. Invalid bigquery escapes
    # raise here — faithful, since BigQuery itself rejects them.
    if first_pass and read in ESCAPE_LITERAL_DIALECTS:
        for kind, text, start, end in toks:
            # Triple-quoted bigquery literals re-encode even WITHOUT a
            # backslash — Spark has no triple-quoted form at all (it
            # would parse the trailing '' as an adjacent empty literal /
            # alias, silently corrupting results).
            needs_reencode = "\\" in text or (
                read == "bigquery" and text[:3] in ("'''", '"""')
            ) or (
                # mysql double-quoted STRINGS re-emit single-quoted: Spark
                # reads "..." as a literal too, but its handling of the
                # mysql ("")-doubling differs — re-encoding removes the
                # ambiguity entirely.
                read == "mysql" and text[0] == '"'
            )
            if (
                kind == "string"
                and needs_reencode
                and not any(e_start < end and start < e_end for e_start, e_end, _ in edits)
            ):
                lit = _spark_string_literal(_literal_content(text, read), read)
                if lit != text:
                    edits.append((start, end, lit))

    if not edits:
        return sql
    out = sql
    # Right-to-left by start; at EQUAL start the consuming replacement
    # (larger end) must apply before a zero-width insert, else the insert's
    # text lands inside the span the replacement then deletes (e.g. the
    # date_trunc wrapper inserted at now()'s start, or substr( prefixed to
    # a backslash literal that the doubling pass also replaces).
    for start, end, rep in sorted(edits, key=lambda e: (-e[0], -e[1])):
        out = out[:start] + rep + out[end:]
    return out
