"""BigQuery read-dialect function map and call handlers.

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
    _NAME_KINDS,
    _ident_text,
    _call_arg_spans,
    _parse_inagg_order,
    _EXPR_KEYWORDS,
)
from sqlmesh_spark.core.transpile_text import (
    _DIFF_UNITS,
    convert_strftime_format,
    _regex_literal,
    _spark_string_literal,
    _literal_content,
)

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
    # BQ hash functions return BYTES where Spark's same-named md5/sha1
    # return hex STRINGS — a silent type+value change; the idiomatic
    # TO_HEX(MD5(x)) composite IS Spark's md5 and rewrites in a
    # handler below; the bare forms loud via an explicit branch (the
    # emission needs the identity-IF skip marker, so not a None map)
    "sha256": None,
    "sha512": None,
    "farm_fingerprint": None,           # different hash → silent wrong values
    # round 11: renames found by the static sweep
    "is_nan": "isnan",
    "unicode": "ascii",                 # BQ UNICODE('') = 0 = Spark ascii
    "code_points_to_string": None,
    "to_code_points": None,
    "session_user": None,               # BQ email vs Spark OS user
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


def call_handlers(ctx) -> "int | None":
    """BigQuery read-dialect function map and call handlers (pre-split code, verbatim)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, first_pass, is_op, _arg_text, transpile, n)
    if name in ("array_agg", "string_agg", "any_value", "first_value",
                "last_value", "lead", "lag", "nth_value"):
        # BQ in-paren NULL treatment (round 11): ARRAY_AGG(x IGNORE
        # NULLS) — Spark parses IGNORE/RESPECT NULLS only between the
        # call and OVER. For the aggregates, IGNORE NULLS simply
        # DROPS (collect_list already ignores NULLs — the map note
        # below); for the window functions it moves outside the
        # close paren like the duck mover. RESPECT NULLS on
        # ARRAY_AGG is loud: plain BQ ARRAY_AGG ERRORS on a NULL
        # input where collect_list silently drops it.
        spans, close = _call_arg_spans(toks, i + 1)
        if spans:
            a1 = spans[-1][1]
            if (
                a1 >= spans[-1][0] + 1
                and toks[a1][0] in _NAME_KINDS
                and toks[a1][1].upper() == "NULLS"
                and toks[a1 - 1][0] in _NAME_KINDS
                and toks[a1 - 1][1].upper() in ("IGNORE", "RESPECT")
            ):
                which = toks[a1 - 1][1].upper()
                if name in ("array_agg", "string_agg", "any_value"):
                    if which == "RESPECT":
                        raise TranspileError(
                            f"bigquery {name}(... RESPECT NULLS) "
                            "errors on NULL input in BQ; Spark's "
                            "collect family silently drops NULLs — "
                            "filter them explicitly"
                        )
                    if not any(
                        e[1] >= toks[a1 - 1][2] and e[0] <= toks[a1][3]
                        for e in edits
                    ):
                        edits.append((toks[a1 - 1][2], toks[a1][3], ""))
                        return close + 1
                else:
                    if not any(
                        e[1] >= toks[a1 - 1][2] and e[0] <= toks[close][3]
                        for e in edits
                    ):
                        edits.append((toks[a1 - 1][2], toks[a1][3], ""))
                        edits.append(
                            (toks[close][3], toks[close][3],
                             f" {which} NULLS")
                        )
                        return close + 1
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
        return i

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
        return i

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
            return i

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
        return i

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
        return i

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
            return i

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
            return i
        i += 1
        return i

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
        return i

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
            return i
        # explicit-step form: Spark sequence errors loudly when
        # the step sign disagrees with the bound order, which
        # surfaces the (rare) divergence instead of hiding it.
        edits.append((start, end, "sequence"))
        i += 1
        return i

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
        return i

    if name == "to_hex" and first_pass:
        # TO_HEX(MD5/SHA1/SHA256/SHA512(x)) — BQ's hash functions
        # return BYTES and the to_hex composite is the idiomatic
        # hex-string form: exactly Spark's md5/sha1/sha2 (lowercase
        # hex both sides; round 11 — the blanket to_hex → hex rename
        # produced hex-of-the-hex-STRING, a silent wrong).  Bare
        # to_hex over other expressions keeps the hex rename.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            s0, s1 = spans[0]
            inner_name = toks[s0][1].lower()
            if (
                toks[s0][0] in _NAME_KINDS
                and inner_name in ("md5", "sha1", "sha256", "sha512")
                and s0 + 1 <= s1
                and toks[s0 + 1][0] == "op" and toks[s0 + 1][1] == "("
            ):
                isp, iclose = _call_arg_spans(toks, s0 + 1)
                if iclose == s1 and len(isp) == 1:
                    x_ = _arg_text(isp[0])
                    if inner_name in ("md5", "sha1"):
                        # identity-IF marker: the bare-md5/sha1 loud
                        # branch below skips IF-leading arguments
                        repl = (f"{inner_name}(IF(({x_}) IS NULL, "
                                f"NULL, ({x_})))")
                    else:
                        bits = inner_name[3:]
                        repl = f"sha2(({x_}), {bits})"
                    edits.append((start, toks[close][3], repl))
                    return close + 1

    if name in ("md5", "sha1"):
        # BYTES-returning hash (Spark's same-named functions return
        # hex STRINGS — silent type+value change); TO_HEX(MD5(x)) is
        # the hex-string idiom and rewrites above, marking its
        # emission with an identity-IF argument this branch skips
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 1
            and toks[spans[0][0]][0] in _NAME_KINDS
            and toks[spans[0][0]][1].upper() == "IF"
        ):
            return close + 1  # our to_hex emission — inert
        raise TranspileError(
            f"bigquery {name}() returns BYTES (Spark's returns a hex "
            "STRING); wrap in TO_HEX(...) for the hex-string form"
        )

    if name == "ieee_divide":
        # IEEE_DIVIDE(a, b): float division with IEEE edges — x/0 is
        # ±Infinity, 0/0 is NaN — where Spark's ANSI `/` raises.
        # a * Infinity carries the sign (and NaN for a = 0);
        # try_divide covers the rest (round 11; was an unresolved
        # passthrough).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, b_ = _arg_text(spans[0]), _arg_text(spans[1])
            repl = (
                f"IF(CAST(({b_}) AS DOUBLE) = 0.0D, "
                f"CAST(({a_}) AS DOUBLE) * CAST('Infinity' AS DOUBLE), "
                f"try_divide(CAST(({a_}) AS DOUBLE), "
                f"CAST(({b_}) AS DOUBLE)))"
            )
            edits.append((start, toks[close][3], repl))
            return close + 1

    if name == "trunc" and first_pass:
        # BQ TRUNC(x[, d]) — toward-zero numeric truncation (BQ has
        # no date overload, unlike Oracle); Spark's trunc is the
        # (date, fmt) function, so the passthrough was an arg-count
        # or type error (round 11).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = _arg_text(spans[0])
            repl = (f"CAST(CASE WHEN ({x_}) < 0 THEN ceil(({x_})) "
                    f"ELSE floor(({x_})) END AS DOUBLE)")
            edits.append((start, toks[close][3], repl))
            return close + 1
        if len(spans) == 2:
            x_, d_ = _arg_text(spans[0]), _arg_text(spans[1])
            p_ = f"power(10, ({d_}))"
            edits.append(
                (start, toks[close][3],
                 f"(CASE WHEN ({x_}) < 0 THEN ceil(({x_}) * {p_}) "
                 f"ELSE floor(({x_}) * {p_}) END / {p_})")
            )
            return close + 1

    if name == "approx_quantiles" and first_pass:
        # APPROX_QUANTILES(x, n) — n+1 quantile boundaries as an
        # array → approx_percentile over the explicit fraction array
        # (literal n only; the documented sketch-tolerance class, like
        # duck approx_quantile).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            n_tok = toks[spans[1][0]]
            if not (spans[1][0] == spans[1][1]
                    and n_tok[0] == "number"
                    and n_tok[1].isdigit() and int(n_tok[1]) >= 1):
                raise TranspileError(
                    "approx_quantiles needs a literal positive "
                    "bucket count to unfold the fraction array"
                )
            nq = int(n_tok[1])
            if nq > 1000:
                raise TranspileError(
                    "approx_quantiles bucket count too large to "
                    "unfold; use approx_percentile directly"
                )
            fracs = ", ".join(
                ("0" if k == 0 else "1" if k == nq
                 else repr(k / nq)) for k in range(nq + 1)
            )
            edits.append(
                (start, toks[close][3],
                 f"approx_percentile(({_arg_text(spans[0])}), "
                 f"array({fracs}))")
            )
            return close + 1

    if name == "to_json_string":
        # 1-arg TO_JSON_STRING IS Spark's to_json; the 2-arg
        # pretty-print form has no Spark analog
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            edits.append((start, end, "to_json"))
            return i + 1
        raise TranspileError(
            "to_json_string(value, pretty) has no Spark "
            "pretty-printing form"
        )

    if name == "extract" and first_pass:
        # extract(field FROM x): ISOWEEK is exactly Spark's WEEK
        # (ISO 8601); BQ's WEEK is SUNDAY-numbered weeks 0-53 (and
        # WEEK(<WEEKDAY>) re-anchors) — both unmappable; ISOYEAR →
        # Spark YEAROFWEEK.  Everything else (DAYOFWEEK 1=Sunday,
        # DAY, DAYOFYEAR, MONTH, QUARTER, YEAR, date parts) passes
        # through with identical semantics.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            s0 = spans[0][0]
            if toks[s0][0] in _NAME_KINDS:
                fld = toks[s0][1].lower()
                if fld == "isoweek":
                    edits.append((toks[s0][2], toks[s0][3], "week"))
                    return i + 1
                if fld == "isoyear":
                    edits.append(
                        (toks[s0][2], toks[s0][3], "yearofweek")
                    )
                    return i + 1
                if fld == "week":
                    raise TranspileError(
                        "bigquery EXTRACT(WEEK ...) numbers "
                        "Sunday-anchored weeks 0-53 (Spark's week is "
                        "ISO); use ISOWEEK or explicit date "
                        "arithmetic"
                    )

    if name in ("string_agg", "array_agg") and first_pass:
        # in-paren ORDER BY (round 11): Spark's parser rejects it —
        # string_agg routes through listagg WITHIN GROUP; array_agg
        # through the (_k, _v) comparator sort (BQ default null order
        # is NULLS FIRST ascending — moot in practice: plain BQ
        # ARRAY_AGG errors on NULL elements).  LIMIT modifiers loud.
        spans, close = _call_arg_spans(toks, i + 1)
        if spans:
            s0, s1 = spans[0], spans[-1]
            order_at = None
            d_ = 0
            for j_ in range(spans[0][0], spans[-1][1] + 1):
                k_, t_ = toks[j_][0], toks[j_][1]
                if k_ == "op" and t_ in ("(", "["):
                    d_ += 1
                elif k_ == "op" and t_ in (")", "]"):
                    d_ -= 1
                elif d_ == 0 and k_ in _NAME_KINDS:
                    if t_.upper() == "ORDER":
                        order_at = j_
                        break
                    if t_.upper() == "LIMIT":
                        raise TranspileError(
                            f"bigquery {name}(... LIMIT n) has no "
                            "Spark aggregate form; slice() the "
                            "result instead"
                        )
            if order_at is not None:
                a1, key_txt, cmp_ = _parse_inagg_order(
                    toks, sql, (spans[0][0], spans[-1][1]),
                    order_at, read
                )
                if name == "string_agg":
                    v0 = spans[0][0]
                    dist_ = ""
                    if (
                        toks[v0][0] in _NAME_KINDS
                        and toks[v0][1].upper() == "DISTINCT"
                    ):
                        dist_ = "DISTINCT "
                        v0 += 1
                    v_ = sql[toks[v0][2]:
                             toks[min(a1, spans[0][1])][3]].strip()
                    sep_ = "','"
                    if len(spans) >= 2:
                        sep_ = sql[toks[spans[1][0]][2]:
                                   toks[min(a1, spans[1][1])][3]].strip()
                    dirn = sql[toks[order_at][2]:
                               toks[spans[-1][1]][3]].strip()
                    edits.append(
                        (start, toks[close][3],
                         f"listagg({dist_}({transpile(v_, read)}), "
                         f"{transpile(sep_, read)}) WITHIN GROUP "
                         f"({dirn})")
                    )
                    return close + 1
                v_ = sql[toks[spans[0][0]][2]:toks[a1][3]].strip()
                edits.append(
                    (start, toks[close][3],
                     f"transform(array_sort(collect_list("
                     f"struct(({transpile(key_txt, read)}) AS _k, "
                     f"({transpile(v_, read)}) AS _v)), {cmp_}), "
                     "_p -> _p._v)")
                )
                return close + 1

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
            esc = _regex_literal(inner, read)
            if esc != sep[1]:
                # skip NO-OP edits: an identical-text edit still
                # registers as "pending" and permanently deferred the
                # downstream [SAFE_OFFSET(n)] subscript rewrite
                # (round 11)
                edits.append((sep[2], sep[3], esc))
        i += 1
        return i

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
        return i

    return None
