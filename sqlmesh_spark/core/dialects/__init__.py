"""Dialect handler registry: function-map assembly and handler dispatch tables.

Split out of core/transpile.py (round 6): the walker in
core/transpile.py dispatches into this module's handler functions; see
TokenCtx in core/transpile_shared.py for the contract. Handler bodies
are the pre-split code verbatim (continue -> return i), so every
file:line reference in docstrings and VERDICT history still applies.
"""

from sqlmesh_spark.core.dialects import (
    bigquery,
    clickhouse,
    mysql,
    oracle,
    redshift,
    snowflake,
    standard,
    trino,
    tsql,
)
from sqlmesh_spark.core.dialects.standard import _COMMON_FN
from sqlmesh_spark.core.dialects.snowflake import _SNOWFLAKE_FN
from sqlmesh_spark.core.dialects.bigquery import _BIGQUERY_FN
from sqlmesh_spark.core.dialects.redshift import _REDSHIFT_FN
from sqlmesh_spark.core.dialects.mysql import _MYSQL_FN
from sqlmesh_spark.core.dialects.oracle import _ORACLE_FN
from sqlmesh_spark.core.dialects.tsql import _TSQL_FN
from sqlmesh_spark.core.dialects.trino import _TRINO_FN
from sqlmesh_spark.core.dialects.clickhouse import _CLICKHOUSE_FN

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
        # fmod: FLOORED remainder — handler in standard.py (the
        # try_mod rename was silently wrong on mixed signs, r11 verdict)
        "arbitrary": "any_value",
        # round-9 same-name collision sweep (tools/probes/duck_wave9):
        # typeof renders duckdb's type NAMES ('INTEGER'/'VARCHAR') where
        # Spark's same-named function renders its own ('int'/'string')
        # — silent text divergence; stats/setseed are engine
        # introspection/state with no Spark form
        "typeof": None, "stats": None, "setseed": None,
        "from_hex": "unhex",
        # hash(): loud handler in duckdb_fns.py (64-bit engine hash vs
        # Spark's 32-bit Murmur3 — same name, different algorithm)
        "quantile_cont": "percentile",  # same linear interpolation;
                                        # the array-of-quantiles form
                                        # maps shape-identically
        # quantile_disc / quantile / skewness / kurtosis: handlers in
        # dialects/standard.py (WITHIN GROUP restructure; duckdb's
        # sample-vs-Spark's population statistics)
        # fsum/favg/kahan_sum/sumkahan/product/sem/kurtosis_pop:
        # round-11 statistical-aggregate tier in dialects/duckdb_fns.py
        "geomean": None,                # exp/avg/ln breaks on
                                        # zero/negatives
        "entropy": None,
        # JSON-typed extraction: the text form differs from
        # get_json_object for string scalars ('"x"' vs 'x') — loud;
        # json_extract_string / ->> are the faithful text forms
        "json_extract": None,
        "json_extract_path": None,
        # duckdb to_hex is UPPERCASE and 64-bit for negatives —
        # exactly Spark's hex() (pg's lowercase 32-bit form is the
        # postgres_calls handler)
        "to_hex": "hex",
        # round 8 (adversarial duckdb-module probes; handlers with
        # restructuring live in core/dialects/duckdb_fns.py)
        "list_max": "array_max",
        "list_min": "array_min",
        "array_reverse": "reverse",
        "editdist3": "levenshtein",
        "from_base64": "unbase64",
        "to_base64": "base64",
        "current_localtimestamp": "localtimestamp",
        "get_current_timestamp": "current_timestamp",
        "gen_random_uuid": "uuid",
        "week": "weekofyear",           # both ISO week-of-year
        "weekofyear": "weekofyear",
        # no Spark analog — loud with the standard guidance
        "greatest_common_divisor": None, "least_common_multiple": None,
        "gamma": None, "lgamma": None, "even": None, "nextafter": None,
        "signbit": None, "hamming": None, "mismatches": None,
        "jaccard": None, "jaro_similarity": None,
        "jaro_winkler_similarity": None, "damerau_levenshtein": None,
        "nfc_normalize": None, "strip_accents": None, "bar": None,
        "md5_number_lower": None, "md5_number_upper": None,
        "md5_number": None, "mad": None, "list_grade_up": None,
        # round-10 duck-only-name sweep: grade_up aliases, internal
        # helpers, TIME/tz constructors, sequences
        "array_grade_up": None, "grade_up": None,
        "constant_or_null": None, "alias": None, "vector_type": None,
        "unpivot_list": None, "formatreadablesize": None,
        "make_timestamptz": None, "get_current_time": None,
        "txid_current": None, "json_serialize_plan": None,
        "json_serialize_sql": None, "json_deserialize_sql": None,
        # grapheme-cluster string functions (no Spark analog)
        "length_grapheme": None, "substring_grapheme": None,
        "left_grapheme": None, "right_grapheme": None,
        "transaction_timestamp": "current_timestamp",
        # list_zip: handler in duckdb_fns.py since round 10
        # (arrays_zip with coalesced legs; positional-struct parity);
        # this None is the fallback for arity < 2
        "list_zip": None,
        "list_aggregate": None,         # dynamic aggregate dispatch
        # format: fmt-'{}' handler in duckdb_fns.py since round 11
        # (rewrites into printf, which NULL-guards and float-casts)
        "timezone_hour": None, "timezone_minute": None,
        # duck probe wave 2
        # list_intersect/array_intersect: handler in duckdb_fns.py —
        # duckdb orders the result by SECOND-arg first occurrence
        # (verified: list_intersect([3,1],[1,3]) = [1,3]) while Spark's
        # array_intersect keeps first-arg order; a rename was a silent
        # element-order divergence (round-9 ADVICE)
        "apply": "transform",
        "list_apply": "transform",
        "array_transform": "transform",
        "array_filter": "filter",
        # list_dot_product / list_cosine_similarity / list_distance:
        # handlers in duckdb_fns.py (zip_with + aggregate folds; Spark
        # has no list vector functions)
        # engine config / enum-type introspection (round 11)
        "current_setting": None, "enum_range": None,
        "era": None,                    # Julian-era field
        # duck UNION type family (round 11): no Spark tagged-union
        # type — loud (model as a struct of nullable fields)
        "union_value": None, "union_extract": None, "union_tag": None,
        "enum_first": None, "enum_last": None, "enum_code": None,
        "enum_range_boundary": None,
        "regexp_escape": None, "parse_filename": None,
        "parse_dirname": None, "parse_path": None,
        "format_bytes": None, "formatreadabledecimalsize": None,
        "timezone": None,               # tz conversion is session-
                                        # config-dependent; loud
    },
    "postgres": {
        **_COMMON_FN,
        "regexp_matches": None,
        # symbolic month/day INTERVAL normalization — no Spark analog
        "justify_days": None,
        "justify_hours": None,
        "justify_interval": None,
        "current_setting": None,        # server config introspection
        "timezone": None,               # the function form of AT TIME
                                        # ZONE — same session-config-
                                        # dependent loud (round 10)
        # round 8 (adversarial live-PG probes): construction/SETOF/
        # introspection functions with no faithful Spark form.
        # round 9: json_agg/jsonb_agg, json(b)_build_object,
        # json(b)_build_array and row_to_json moved to faithful
        # scalar-form handlers (postgres_calls._pg_json_calls —
        # spacing/key-order/NULL-on-empty pinned live on PG 15);
        # bare to_json/to_jsonb stay loud for USER input (per-type
        # text forms diverge) — the handler whitelists only our own
        # emissions so fixpoint re-reads pass.
        "to_json": None, "to_jsonb": None,
        "json_object": None, "jsonb_object": None,
        "jsonb_set": None, "jsonb_insert": None,
        "json_strip_nulls": None, "jsonb_strip_nulls": None,
        "jsonb_pretty": None, "json_typeof": None, "jsonb_typeof": None,
        # SETOF-returning (row-generating) — Spark needs LATERAL VIEW
        # explode/posexplode, a FROM-clause restructure
        "json_each": None, "jsonb_each": None,
        "json_each_text": None, "jsonb_each_text": None,
        "json_array_elements": None, "jsonb_array_elements": None,
        "json_array_elements_text": None,
        "jsonb_array_elements_text": None,
        "json_object_keys": None, "jsonb_object_keys": None,
        "jsonb_path_query": None, "jsonb_path_exists": None,
        "jsonb_path_match": None,
        # round 11: the rest of the SQL/JSON-path family previously
        # PASSED THROUGH to an unresolved-routine error while its
        # siblings were loud — the path language (filters, methods,
        # lax/strict modes) has no get_json_object form
        "jsonb_path_query_first": None, "jsonb_path_query_array": None,
        "jsonb_path_exists_tz": None, "jsonb_path_match_tz": None,
        "jsonb_path_query_tz": None, "jsonb_path_query_first_tz": None,
        "jsonb_path_query_array_tz": None,
        # transaction ids / xml constructors: engine state and a type
        # Spark lacks (same passthrough gap, round-11 sweep)
        "txid_current": None, "pg_current_xact_id": None,
        "pg_sleep": None, "set_config": None,
        "xmlcomment": None, "xmlelement": None, "xmlforest": None,
        "xmlagg": None, "xmlconcat": None, "xpath": None,
        "xpath_exists": None, "xmlparse": None, "xmlserialize": None,
        "regexp_split_to_table": None, "generate_subscripts": None,
        # full-text search — no Spark analog
        "to_tsvector": None, "to_tsquery": None,
        "plainto_tsquery": None, "phraseto_tsquery": None,
        "websearch_to_tsquery": None, "ts_rank": None,
        "ts_headline": None,
        # numeric/type introspection with no Spark form
        "pg_typeof": None, "setseed": None, "scale": None,
        "to_ascii": None,               # LATIN-only conversion (errors
                                        # on UTF8 databases)
        # range types (round 11): pg's RANGE type family has no Spark
        # type — constructors and predicates loud (model as explicit
        # lo/hi column pairs instead)
        "int4range": None, "int8range": None, "numrange": None,
        "tsrange": None, "tstzrange": None, "daterange": None,
        "int4multirange": None, "int8multirange": None,
        "nummultirange": None, "tsmultirange": None,
        "tstzmultirange": None, "datemultirange": None,
        "isempty": None, "lower_inc": None, "upper_inc": None,
        "lower_inf": None, "upper_inf": None, "range_merge": None,
        "min_scale": None, "trim_scale": None,
        "array_ndims": None,            # needs nested-array type info
        "array_dims": None,             # renders pg's '[1:3]' text form
        "parse_ident": None,
        "set_byte": None, "set_bit": None, "get_bit": None,
        # length counts ARRAY elements in pg (json_array_length is the
        # Spark name; pg jsonb_array_length errors on non-arrays where
        # Spark returns NULL — a pg-rejected shape, not a value seam)
        "jsonb_array_length": "json_array_length",
        # json_agg/jsonb_agg/json_object_agg: faithful handlers
        # (rounds 9/11, see above); jsonb_object_agg normalizes at
        # RUNTIME (last-wins + length-then-bytes key sort over
        # aggregated keys) — no static Spark document form
        "jsonb_object_agg": None,
        "gen_random_uuid": "uuid",
        "make_time": None,              # Spark has no TIME type
        "make_timestamptz": None,       # SESSION-zone timestamptz
        "timeofday": None,              # wall-clock TEXT, re-evaluated
                                        # per call — no Spark analog
    },
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

#: per-read-dialect call handlers that run BEFORE the shared standard
#: handlers (dispatch order preserved from the pre-split monolith)
PRE_CALL_HANDLERS = {
    "snowflake": snowflake.call_handlers,
    "bigquery": bigquery.call_handlers,
    "redshift": redshift.call_handlers,
    "mysql": mysql.call_handlers,
    "oracle": oracle.call_handlers,
    "tsql": tsql.call_handlers,
}

#: call handlers that run AFTER the shared standard handlers
POST_CALL_HANDLERS = {
    "clickhouse": clickhouse.call_handlers,
    "trino": trino.call_handlers,
}
