"""Trino read-dialect function map and call handlers.

Split out of core/transpile.py (round 6): the walker in
core/transpile.py dispatches into this module's handler functions; see
TokenCtx in core/transpile_shared.py for the contract. Handler bodies
are the pre-split code verbatim (continue -> return i), so every
file:line reference in docstrings and VERDICT history still applies.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _emit_infix_call,
    _emit_iso_dow,
    _NAME_KINDS,
    _ident_text,
    _call_arg_spans,
    _EXPR_KEYWORDS,
)
from sqlmesh_spark.core.transpile_text import (
    _resolve_unit,
    convert_mysql_format,
    _regex_literal,
    _spark_string_literal,
    _literal_content,
)

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


def call_handlers(ctx) -> "int | None":
    """Trino read-dialect function map and call handlers (pre-split code, verbatim)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, first_pass, is_op, _arg_text, transpile, n)
    if name == "truncate" and first_pass:
        # trino truncate(x) — toward-zero truncation, the pg trunc()
        # shape (round 11; was loud).  The DECIMAL-typed 2-arg
        # truncate(x, d) keeps the input's scale — no faithful Spark
        # decimal-scale rewrite, stays loud with guidance.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"CAST(CASE WHEN ({x_}) < 0 THEN ceil(({x_})) "
                 f"ELSE floor(({x_})) END AS DOUBLE)")
            )
            return close + 1
        raise TranspileError(
            "trino truncate(x, d) truncates a DECIMAL in place "
            "(scale-preserving); use floor/ceil arithmetic over "
            "power(10, d) explicitly"
        )
    if name in ("from_base", "to_base") and first_pass:
        # radix conversions → Spark conv() (round 11; unresolved
        # passthroughs).  from_base returns BIGINT; to_base renders
        # lowercase where conv is uppercase.  Caveat (documented):
        # Trino ERRORS on malformed digits, Spark's conv returns 0.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, r_ = _arg_text(spans[0]), _arg_text(spans[1])
            if name == "from_base":
                repl = f"CAST(conv(({a_}), ({r_}), 10) AS BIGINT)"
            else:
                repl = f"lower(conv(({a_}), 10, ({r_})))"
            edits.append((start, toks[close][3], repl))
            return close + 1
    if name == "row" and first_pass:
        # row(a, b, ...) anonymous-row constructor → struct(...)
        # (field names become col1..colN, matching Trino's unnamed
        # fields; round 11 — was an unresolved passthrough)
        edits.append((start, end, "struct"))
        return i + 1
    if name == "if" and first_pass:
        # trino 2-arg if(cond, v) returns NULL on false; Spark's if
        # requires 3 args (the passthrough was an arg-count error,
        # round 11) — append the NULL arm
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            edits.append((toks[close][2], toks[close][2], ", NULL"))
            return close + 1
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
        return i

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
        return i

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
            return i
        converted = convert_mysql_format(raw_fmt)
        edits.append((start, end, "date_format"))
        edits.append(
            (fmt_tok[2], fmt_tok[3],
             _spark_string_literal(converted, read))
        )
        i += 1
        return i

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
        return i

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
        return i

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
        return i

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
        return i

    if name in ("day_of_week", "dow"):
        # ISO 1=Monday..7=Sunday; Spark weekday is 0=Monday.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 1:
            raise TranspileError(f"{name} takes 1 arg")
        _emit_iso_dow(edits, start, end, toks[close][3])
        i += 1
        return i

    if name in ("year_of_week", "yow"):
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 1:
            raise TranspileError(f"{name} takes 1 arg")
        edits.append(
            (start, toks[i + 1][3], "extract(YEAROFWEEK FROM ")
        )
        i += 1
        return i

    # 2-arg regexp_extract[_all] group-0 pinning is shared with duckdb
    # in dialects/standard.py (which runs before this block)

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
        return i

    if name == "element_at" and first_pass:
        # Trino element_at() is NULL out of bounds / missing
        # key; Spark 4 (ANSI on) raises without try_. FIRST
        # PASS only: the element_at the subscript rewrite
        # emits for arr[i] must stay plain — Trino brackets
        # ERROR out of bounds, which ANSI element_at matches.
        edits.append((start, end, "try_element_at"))
        i += 1
        return i

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
        return i

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
            return i
        if len(spans) == 0:
            i += 1  # map() is the empty map in both
            return i
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
        return i

    if name == "url_extract_parameter":
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 2:
            raise TranspileError("url_extract_parameter takes 2 args")
        edits.append((start, end, "parse_url"))
        edits.append(
            (toks[spans[0][1]][3], toks[spans[0][1]][3], ", 'QUERY'")
        )
        i += 1
        return i

    if name == "to_utf8":
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 1:
            raise TranspileError("to_utf8 takes 1 arg")
        edits.append((start, end, "encode"))
        edits.append((toks[close][2], toks[close][2], ", 'UTF-8'"))
        i += 1
        return i

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
        return i

    if name == "none_match":
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 2:
            raise TranspileError("none_match takes 2 args")
        edits.append((start, end, "(NOT exists"))
        edits.append((toks[close][3], toks[close][3], ")"))
        i += 1
        return i

    if name in ("infinity", "nan"):
        spans, close = _call_arg_spans(toks, i + 1)
        if spans:
            raise TranspileError(f"{name} takes no args")
        lit = "Infinity" if name == "infinity" else "NaN"
        edits.append(
            (start, toks[close][3], f"CAST('{lit}' AS DOUBLE)")
        )
        i = close + 1
        return i

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
        return i

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
        return i

    if name == "bitwise_not":
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 1:
            raise TranspileError("bitwise_not takes 1 arg")
        a = _arg_text(spans[0])
        edits.append((start, toks[close][3], f"(~({a}))"))
        i = close + 1
        return i

    return None
