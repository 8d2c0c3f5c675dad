"""Shared standard-SQL-family handlers: the DuckDB/Postgres function map and NULL-edge fidelity handlers, plus multi-dialect restructuring handlers (trim/to_char/strftime families shared with redshift/oracle). Runs for EVERY read dialect between the pre- and post-handlers; each handler is read-gated.

Split out of core/transpile.py (round 6): the walker in
core/transpile.py dispatches into this module's handler functions; see
TokenCtx in core/transpile_shared.py for the contract. Handler bodies
are the pre-split code verbatim (continue -> return i), so every
file:line reference in docstrings and VERDICT history still applies.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.dialects import standard_edges as _edges
from sqlmesh_spark.core.dialects import datetime_calls as _dtcalls
from sqlmesh_spark.core.dialects import duckdb_fns as _duckfns
from sqlmesh_spark.core.dialects import duckdb_hofs as _duckhofs
from sqlmesh_spark.core.dialects import duckdb_containers as _duckcontainers
from sqlmesh_spark.core.dialects import duckdb_regex as _duckregex
from sqlmesh_spark.core.dialects import postgres_calls as _postgres
from sqlmesh_spark.core.dialects import postgres_regex as _pgregex
from sqlmesh_spark.core.dialects import postgres_srf as _pgsrf
from sqlmesh_spark.core.dialects import postgres_fns as _pgfns
from sqlmesh_spark.core.transpile_types import (
    _PARAM_TYPES,
    _PARAM_DROP_TYPES,
    _lookup_type,
)
from sqlmesh_spark.core.transpile_shared import (
    _json_key_to_path,
    TranspileError,
    _require_spark4,
    _NAME_KINDS,
    _call_args,
    _call_arg_spans,
)
from sqlmesh_spark.core.transpile_text import (
    _resolve_unit,
    convert_strftime_format,
    convert_pg_format,
    convert_posix_classes,
    convert_regex_literal,
    _regex_literal,
    _spark_string_literal,
    _raw_body,
    _literal_content,
    _pg_interval_parts,
    _regex_replacement_to_spark,
)

_COMMON_FN = {
    # temporal
    # epoch(): handler in duckdb_fns since round 11 — the
    # unix_timestamp rename TRUNCATED fractional seconds (duck epoch
    # returns DOUBLE: epoch(ts.5) = ....5, a composition-wave-64
    # silent wrong); non-duck reads have no epoch() function
    "epoch": None,
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
    "array_indexof": "array_position",
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
    "regexp_split_to_array": "split",   # same: POSIX regex separator
    "age": None,                        # symbolic month/day INTERVAL
                                        # (2 mons 3 days) → no analog
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
def call_handlers(ctx) -> "int | None":
    """Shared standard-SQL-family handlers: the DuckDB/Postgres function map and NULL-edge fidelity handlers, plus multi-dialect restructuring handlers (trim/to_char/strftime families shared with redshift/oracle) (pre-split code, verbatim)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, first_pass, is_op, _arg_text, transpile, n)
    if (
        name in ("first_value", "last_value", "lead", "lag",
                 "nth_value")
        and read in ("oracle", "redshift")
    ):
        # Oracle/Redshift spell window NULL treatment INSIDE the call
        # parens (LAST_VALUE(x IGNORE NULLS) OVER ...); Spark parses
        # it only between the call and OVER — move it (the
        # duck/BQ/snowflake mover class, round 11; duckdb has its own
        # token-tier mover)
        spans_in, close_in = _call_arg_spans(toks, i + 1)
        if spans_in:
            a1 = spans_in[-1][1]
            if (
                a1 >= spans_in[-1][0] + 1
                and toks[a1][0] in _NAME_KINDS
                and toks[a1][1].upper() == "NULLS"
                and toks[a1 - 1][0] in _NAME_KINDS
                and toks[a1 - 1][1].upper() in ("IGNORE", "RESPECT")
                and not any(
                    e[1] >= toks[a1 - 1][2] and e[0] <= toks[close_in][3]
                    for e in edits
                )
            ):
                which = toks[a1 - 1][1].upper()
                edits.append((toks[a1 - 1][2], toks[a1][3], ""))
                edits.append(
                    (toks[close_in][3], toks[close_in][3],
                     f" {which} NULLS")
                )
                return close_in + 1
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
        return i

    if name in ("strftime", "strptime", "try_strptime") and read in ("duckdb", "postgres") and first_pass:
        spans_, _close_ = _call_arg_spans(toks, i + 1)
        if len(spans_) != 2:
            raise TranspileError(f"{name} expects 2 args")
        fmt_idx = spans_[1][0]
        if toks[fmt_idx][0] != "string" or spans_[1][0] != spans_[1][1]:
            raise TranspileError(f"{name} format must be a single literal to transpile")
        fmt_lit = toks[fmt_idx][1]
        if name == "try_strptime" and "%" not in fmt_lit:
            # duck's try form returns NULL for a directive-free format
            # on any non-matching input (pinned live, round 11) — no
            # 1900-default seam, but nothing to parse either
            raise TranspileError(
                "try_strptime format has no % directives; spell the "
                "timestamp directly"
            )
        if name == "strptime" and "%" not in fmt_lit:
            # a directive-free format sets NO fields: duck defaults to
            # 1900-01-01, Spark's to_timestamp to 1970-01-01 — a
            # silent epoch swap on (admittedly weird) literal-only
            # formats (round-10 duck-only sweep)
            raise TranspileError(
                "strptime format has no % directives; duck would "
                "return its 1900-01-01 default — spell the timestamp "
                "directly"
            )
        converted = convert_strftime_format(fmt_lit[1:-1].replace("''", "'"))
        # try_strptime → try_to_timestamp (round 11): NULL on parse
        # failure in both (pinned live); strptime raises in both
        new_fn = (
            "date_format" if name == "strftime"
            else "try_to_timestamp" if name == "try_strptime"
            else "to_timestamp"
        )
        edits.append((start, end, new_fn))
        edits.append(
            (toks[fmt_idx][2], toks[fmt_idx][3],
             _spark_string_literal(converted, read))
        )
        i += 1
        return i

    if (
        (
            name == "generate_series"
            or (name == "range" and read == "duckdb")
        )
        and read in ("postgres", "duckdb")
        and first_pass
    ):
        # Context-sensitive: pg generate_series always produces ROWS
        # (set-returning function); duckdb returns a LIST in a select
        # list but rows as a FROM-clause table function. Both ends
        # INCLUSIVE — exactly Spark sequence(); explode() turns the
        # array into rows (valid in both select-list and FROM-clause
        # positions, `FROM explode(sequence(..)) AS t(i)` included).
        spans, close = _call_arg_spans(toks, i + 1)
        is_range = name == "range"
        if is_range and len(spans) == 1:
            # duckdb range(n) = 0 .. n-1
            spans = [None, spans[0]]
        elif len(spans) not in (2, 3):
            raise TranspileError(
                f"{name} takes (start, stop[, step])"
            )
        ctx_kind = "expr"  # inside a call/paren unless a clause says else
        depth_b = 0
        for j in range(i - 1, -1, -1):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ == ")":
                depth_b += 1
            elif k_ == "op" and t_ == "(":
                depth_b -= 1
                if depth_b < 0:
                    break  # nested inside a call argument / paren group
            elif depth_b == 0 and k_ == "ident":
                up_ = t_.upper()
                if up_ == "SELECT":
                    ctx_kind = "select"
                    break
                if up_ in ("FROM", "JOIN", "LATERAL"):
                    ctx_kind = "table"
                    break
                if up_ in ("WHERE", "GROUP", "HAVING", "ORDER", "ON"):
                    break  # predicate/clause: expression context
        # EMPTY-RANGE guard: pg/duckdb generate_series(1, 0) is EMPTY
        # (step defaults to +1), while Spark sequence(1, 0) AUTO-STEPS
        # -1 and yields [1, 0] — a silent wrong row count. Guard with
        # the step-sign bound check when the sign is statically known
        # (2-arg = +1; literal numeric or INTERVAL-literal 3-arg); an
        # unknowable step sign keeps the bare sequence (a sign/bound
        # mismatch then RAISES in Spark — loud, never silent).
        a_t = "0" if spans[0] is None else _arg_text(spans[0])
        b_t = _arg_text(spans[1])
        if is_range:
            # duckdb range is end-EXCLUSIVE (range(1, 4) = [1, 2, 3],
            # range(1, 0) = []); Spark sequence is inclusive — shift
            # the stop toward the start by one step-sign
            pass
        if len(spans) == 2:
            if is_range:
                seq = f"sequence(({a_t}), ({b_t}) - 1)"
                empty = f"slice(sequence(({a_t}), ({a_t})), 1, 0)"
                guard = f"({a_t}) <= ({b_t}) - 1"
            else:
                seq = f"sequence(({a_t}), ({b_t}))"
                empty = f"slice(sequence(({a_t}), ({a_t})), 1, 0)"
                guard = f"({a_t}) <= ({b_t})"
        else:
            st_t = _arg_text(spans[2])
            s0, s1 = spans[2]
            sign = None
            if s0 == s1 and toks[s0][0] == "number":
                sign = 1
            elif (
                s1 == s0 + 1
                and toks[s0][0] == "op" and toks[s0][1] == "-"
                and toks[s1][0] == "number"
            ):
                sign = -1
            elif (
                s1 == s0 + 1
                and toks[s0][0] in _NAME_KINDS
                and toks[s0][1].upper() == "INTERVAL"
                and toks[s1][0] == "string"
            ):
                parts_iv = _pg_interval_parts(
                    _literal_content(toks[s1][1], read)
                )
                if parts_iv is not None:
                    tot = (
                        parts_iv[0] * 2_592_000_000_000
                        + parts_iv[1] * 86_400_000_000
                        + parts_iv[2]
                    )
                    sign = 1 if tot > 0 else (-1 if tot < 0 else None)
            b_adj = b_t
            if is_range:
                if sign is None:
                    raise TranspileError(
                        "duckdb range(start, stop, step) needs a "
                        "statically signed step (its stop is "
                        "EXCLUSIVE; Spark sequence is inclusive)"
                    )
                b_adj = f"({b_t}) {'-' if sign > 0 else '+'} 1"
            seq = f"sequence(({a_t}), ({b_adj}), ({st_t}))"
            empty = f"slice(sequence(({a_t}), ({a_t}), ({st_t})), 1, 0)"
            guard = (
                None if sign is None
                else f"({a_t}) {'<=' if sign > 0 else '>='} ({b_adj})"
            )
        body = (
            seq if guard is None
            else f"(CASE WHEN {guard} THEN {seq} ELSE {empty} END)"
        )
        if ctx_kind == "table" or (read == "postgres" and ctx_kind == "select"):
            edits.append((start, toks[close][3], f"explode({body})"))
        elif read == "duckdb":
            edits.append((start, toks[close][3], body))  # duckdb: a LIST
        else:
            # pg generate_series nested inside an expression is a
            # set-returning function in a scalar slot — pre-PG10
            # expansion rules, no Spark analog
            raise TranspileError(
                "postgres generate_series inside an expression has no "
                "Spark rewrite; move it to the FROM clause"
            )
        return close + 1

    if read == "postgres":
        # pg regexp flag/start tier (round 10) — dispatched BEFORE the
        # shared pattern-literal block below: a consumed 3+-arg call
        # never reaches that block (its whole-call emission converts
        # the pattern itself), so the two never write overlapping
        # edits; 2-arg forms fall through to the block as before
        nxt = _pgregex.call_handlers(ctx)
        if nxt is not None:
            return nxt
        if first_pass:
            # pg set-returning-function tier (round 10): before the
            # shared block for the same no-overlap reason, and before
            # the unnest → explode rename (multi-arg unnest zips)
            nxt = _pgsrf.call_handlers(ctx)
            if nxt is not None:
                return nxt
        # pg-only-name tier (round 10): degree trig, array dimension
        # functions, sequence/clock/json louds
        nxt = _pgfns.call_handlers(ctx)
        if nxt is not None:
            return nxt

    if read == "duckdb":
        # duck regexp tier (round-11 split) — BEFORE the shared
        # pattern-literal block for the same no-overlap reason as
        # _pgregex: a whole-call consumer (regexp_matches flags,
        # named-group regexp_extract, regexp_full_match) converts the
        # pattern itself; the block's token edit would overlap the
        # whole-call replacement and corrupt the splice (the latent
        # regexp_full_match('[[:digit:]]+') bug, fixed this round)
        nxt = _duckregex.call_handlers(ctx)
        if nxt is not None:
            return nxt

    if (
        read in ("postgres", "duckdb")
        and first_pass
        and name in (
            "regexp_replace", "regexp_count", "regexp_like",
            "regexp_extract", "regexp_extract_all", "regexp_matches",
            "regexp_substr", "regexp_split_to_array", "regexp_instr",
            "regexp_full_match", "string_split_regex",
        )
    ):
        # POSIX [:class:] bracket elements convert to their Java forms
        # in PATTERN literals (Java reads [[:digit:]] as the literal
        # set {:, d, i, g, t} — verified silent flip against BOTH live
        # engines: pg's ARE and duckdb's RE2 support the classes), and
        # convert_regex_literal fixes the default-semantics seams
        # (round 10, pinned live): Java's $ also matches before a
        # final newline where pg/RE2 mean end-of-text ($ → \z), and
        # pg's ARE dot matches newline where Java's doesn't ((?s)
        # prefix); pg-only flag-group letters are loud there. Falls
        # THROUGH to each function's own handler: this edit touches
        # only the pattern literal token, which those handlers never
        # re-edit (regexp_replace touches replacement + flag args).
        spans_px, _c_px = _call_arg_spans(toks, i + 1)
        if len(spans_px) >= 2:
            pf, pl = spans_px[1]
            if pf == pl and toks[pf][0] == "string":
                pat_px = _literal_content(toks[pf][1], read)
                conv_px = convert_regex_literal(
                    convert_posix_classes(pat_px), read
                )
                if conv_px != pat_px:
                    edits.append(
                        (toks[pf][2], toks[pf][3],
                         _spark_string_literal(conv_px, read))
                    )

    if (
        name in ("date_bin", "time_bucket")
        and read in ("postgres", "duckdb")
        and first_pass
    ):
        # date_bin(stride, source, origin) (PG 14) and duckdb's
        # time_bucket(stride, source[, origin]) — origin-aligned
        # tumbling windows; time_bucket's default origin is
        # 2000-01-03 00:00:00 (a Monday, so week buckets align to
        # Mondays — pinned against the duckdb module). The shared
        # emission is in _date_bin_emit; an INTERVAL third
        # time_bucket arg is duckdb's OFFSET variant — loud.
        spans, close = _call_arg_spans(toks, i + 1)
        if name == "date_bin":
            if len(spans) != 3:
                raise TranspileError(
                    "date_bin takes (stride, source, origin)"
                )
            org_ = _arg_text(spans[2])
        else:
            if len(spans) not in (2, 3):
                raise TranspileError(
                    "time_bucket takes (stride, source[, origin])"
                )
            if len(spans) == 3:
                b0 = spans[2][0]
                if (
                    toks[b0][0] in _NAME_KINDS
                    and toks[b0][1].upper() == "INTERVAL"
                ):
                    raise TranspileError(
                        "duckdb time_bucket(..., offset INTERVAL) has "
                        "no Spark rewrite; use an explicit origin "
                        "timestamp instead"
                    )
                org_ = _arg_text(spans[2])
            else:
                org_ = "TIMESTAMP '2000-01-03 00:00:00'"
        stride_text = sql[toks[spans[0][0]][2]: toks[spans[0][1]][3]]
        edits.append(
            (start, toks[close][3],
             _date_bin_emit(name, stride_text, _arg_text(spans[1]), org_))
        )
        return close + 1

    # ---- Postgres-specific call handlers (core/dialects/postgres.py)
    # and the DuckDB/Postgres NULL-and-edge fidelity handlers
    # (core/dialects/standard_edges.py) — moved verbatim in round 8;
    # dispatched here, at the positions the sections occupied, so
    # handler order is unchanged.
    if read in ("postgres", "duckdb"):
        # duckdb included: the string_agg in-args ORDER BY handler
        # inside serves BOTH reads (the round-8 split's postgres-only
        # gate silently skipped the duckdb WITHIN GROUP move — a
        # parse-error regression caught by the duck probe); every
        # handler in the module carries its own read gate.
        nxt = _postgres.call_handlers(ctx)
        if nxt is not None:
            return nxt
    nxt = _edges.call_handlers(ctx)
    if nxt is not None:
        return nxt
    if read == "duckdb":
        # lambda/HOF tier first: the indexed-lambda rebase and
        # list_reduce/list_aggregate restructures must consume their
        # calls before duckdb_fns' loud guards and the plain renames
        nxt = _duckhofs.call_handlers(ctx)
        if nxt is not None:
            return nxt
        # containers BEFORE duckdb_fns: the container tier's len()
        # handler must keep its pre-split position ahead of the
        # length/len string handler remaining in duckdb_fns
        nxt = _duckcontainers.call_handlers(ctx)
        if nxt is not None:
            return nxt
        nxt = _duckfns.call_handlers(ctx)
        if nxt is not None:
            return nxt

    if name in ("quantile_disc", "quantile") and read == "duckdb" and first_pass:
        # lower-discrete quantile — Spark's percentile_disc is WITHIN
        # GROUP syntax. (An array-of-quantiles argument emits an
        # analysis error: loud.) Value-exact; the result dtype is
        # DOUBLE where duckdb returns the element type — statically
        # untypeable, documented seam. Related pinned seam (round-9
        # agg wave): duck percentile_cont/quantile_cont over
        # DECIMAL(p,s) input TRUNCATES the interpolated value to scale
        # s (1.75 → 1.7) where Spark (and pg) interpolate in DOUBLE —
        # also statically untypeable for columns; cast the order key
        # ::double for exact parity.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 2:
            raise TranspileError(f"{name} takes (value, quantile)")
        v_ = _arg_text(spans[0])
        p_ = _arg_text(spans[1])
        edits.append(
            (start, toks[close][3],
             f"percentile_disc(({p_})) WITHIN GROUP (ORDER BY ({v_}))")
        )
        i = close + 1
        return i

    if (
        name in ("skewness", "kurtosis")
        and read == "duckdb"
        and first_pass
        and not (
            i >= 2
            and is_op(i - 1, "(")
            and toks[i - 2][0] in _NAME_KINDS
            and toks[i - 2][1].lower() == "try_divide"
        )
    ):
        # duckdb reports SAMPLE (bias-corrected) statistics; Spark's
        # skewness/kurtosis are POPULATION — silently different values.
        # Corrections (n = non-null count; verified value-exact against
        # the duckdb oracle in tests/test_dialect_fuzz.py):
        #   skew_samp = skew_pop * sqrt(n(n-1)) / (n-2)
        #   kurt_samp = (n-1)/((n-2)(n-3)) * ((n+1) * kurt_pop + 6)
        # Below the minimum n duckdb returns NULL (CASE guard; Spark
        # would give NaN arithmetic). Catalyst deduplicates the
        # repeated aggregate expressions.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 1:
            raise TranspileError(f"{name} takes 1 argument")
        x_ = _arg_text(spans[0])
        fend = close
        ftext = ""
        if (
            close + 2 < len(toks)
            and toks[close + 1][0] in _NAME_KINDS
            and toks[close + 1][1].upper() == "FILTER"
            and is_op(close + 2, "(")
        ):
            # fold the FILTER into every aggregate of the rewrite
            # (including the count guards)
            fend = _call_arg_spans(toks, close + 2)[1]
            ftext = " " + transpile(
                sql[toks[close + 1][2]: toks[fend][3]], read
            )
        if (
            fend + 1 < len(toks)
            and toks[fend + 1][0] in _NAME_KINDS
            and toks[fend + 1][1].upper() == "OVER"
        ):
            raise TranspileError(
                f"{name} OVER a window has no Spark rewrite (the "
                "sample-statistic correction needs a CASE around the "
                "aggregate, which cannot carry OVER)"
            )
        n_ = f"count(({x_})){ftext}"
        # both population aggregates sit as the FIRST argument of a
        # try_divide — the sentinel above recognizes that parent on
        # re-reads (try_divide is not a duckdb function, so user SQL
        # never produces this shape)
        if name == "skewness":
            repl = (
                f"(CASE WHEN {n_} < 3 THEN NULL ELSE "
                f"try_divide(skewness(({x_})){ftext} * sqrt({n_} * ({n_} - 1)), "
                f"{n_} - 2) END)"
            )
        else:
            repl = (
                f"(CASE WHEN {n_} < 4 THEN NULL ELSE "
                f"try_divide(kurtosis(({x_})){ftext} * (({n_} - 1) * ({n_} + 1)), "
                f"({n_} - 2) * ({n_} - 3)) + "
                f"try_divide(6 * ({n_} - 1), "
                f"({n_} - 2) * ({n_} - 3)) END)"
            )
        edits.append((start, toks[fend][3], repl))
        i = fend + 1
        return i

    if (
        name in ("epoch_ms", "epoch_us")
        and read == "duckdb"
        and first_pass
    ):
        # duckdb overloads these BY TYPE: epoch_ms(TIMESTAMP) = millis
        # since epoch (the unix_millis rename), epoch_ms(BIGINT)
        # CONSTRUCTS the timestamp. The integer-LITERAL form is
        # detectable statically; dynamic integer args stay on the
        # rename and fail loudly at analysis.
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 1
            and spans[0][0] == spans[0][1]
            and toks[spans[0][0]][0] == "number"
        ):
            fn = "timestamp_millis" if name == "epoch_ms" else "timestamp_micros"
            edits.append((start, end, fn))
            i += 1
            return i
        # fall through to the unix_millis/unix_micros rename

    if (
        name in ("regexp_extract", "regexp_extract_all")
        and read in ("duckdb", "trino")
    ):
        # duckdb's and trino's 2-arg forms return the WHOLE match; Spark
        # defaults to group 1 (an error when the pattern has no group) —
        # pin group 0. 3-arg group indexes agree in all three engines.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            edits.append((toks[close][2], toks[close][2], ", 0"))
        i += 1
        return i

    if name in ("fdiv", "divide", "fmod") and read == "duckdb" and first_pass:
        # fdiv = floor division as DOUBLE; divide() = TRUNCATING
        # integer division (the // function form). Both NULL on a
        # zero divisor. (The emitted DIV's divisor is already
        # nullif-wrapped — the infix wrap's guard accepts it.)
        # fmod = FLOORED remainder (sign of divisor), computed by duck
        # as x - y*floor(x/y) in IEEE doubles — pinned live at bit
        # level including cases where the adjust-style form
        # (truncated-mod + y) rounds differently (duck_wave65). The
        # earlier fmod→try_mod map was silently wrong on mixed signs
        # (Spark mod is truncated — r11 verdict, the r8 hash() class).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 2:
            raise TranspileError(f"{name} takes 2 args")
        a_ = _arg_text(spans[0])
        b_ = _arg_text(spans[1])
        if name == "fdiv":
            repl = f"CAST(floor(try_divide(({a_}), ({b_}))) AS DOUBLE)"
        elif name == "fmod":
            # Args widen to DOUBLE (duck fmod(7,3) is 1.0 DOUBLE).
            # try_divide → NULL on a ±0 divisor = duck's NULL. The
            # quotient's floor must stay a DOUBLE: Spark FLOOR(double)
            # returns BIGINT, exact below 2^53 but overflowing for
            # huge quotients — above 2^53 every double IS an integer,
            # so the quotient is its own floor (also the NaN/±inf
            # branch, where duck propagates through the same
            # arithmetic: fmod(inf,2)=NaN, fmod(5,inf)=NaN — pinned).
            xd = f"CAST(({a_}) AS DOUBLE)"
            yd = f"CAST(({b_}) AS DOUBLE)"
            q = f"try_divide({xd}, {yd})"
            fl = (
                f"(CASE WHEN isnan({q}) OR abs({q}) >= 9007199254740992D "
                f"THEN {q} ELSE CAST(FLOOR({q}) AS DOUBLE) END)"
            )
            repl = f"({xd} - {yd} * {fl})"
        else:
            repl = f"(({a_}) DIV nullif(({b_}), 0))"
        edits.append((start, toks[close][3], repl))
        i = close + 1
        return i

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
            return i
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
            for sp in spans:
                if sql[toks[sp[0]][2]: toks[sp[1]][3]].lower().endswith(
                    ("::bytea", "::blob", "::binary")
                ):
                    # pg's bytea trims return BYTEA; Spark's TRIM
                    # coerces binary operands to STRING — a silent
                    # type change (round-10 pg collision sweep)
                    raise TranspileError(
                        f"{name} over bytea returns BINARY in "
                        f"{read}; Spark's TRIM coerces to STRING — "
                        "no faithful rewrite"
                    )
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
            return i
        elif len(spans) > 2:
            raise TranspileError(f"{name} takes at most 2 args")
        i += 1
        return i

    # ---- datetime formatting / arithmetic handlers
    # (core/dialects/datetime_calls.py) — moved verbatim in round 13;
    # dispatched here, at the position the section occupied, so
    # handler order is unchanged (to_char / string_to_array /
    # dateadd / date_diff before regexp_replace).
    nxt = _dtcalls.call_handlers(ctx)
    if nxt is not None:
        return nxt


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
                    # (The pg 'g' rewrite below emits the THREE-arg
                    # Spark form, never this one, so a numeric 4th
                    # arg is always user input here.)
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
                flag_txt = (
                    _literal_content(f_tok[1], read)
                    if spans[3][0] == spans[3][1] and f_tok[0] == "string"
                    else None
                )
                if (
                    flag_txt is None
                    or "g" not in flag_txt
                    or not set(flag_txt) <= {"g", "i", "c", "s"}
                    or ("i" in flag_txt and "c" in flag_txt)
                ):
                    raise TranspileError(
                        "regexp_replace options other than 'g' (+ the "
                        "inlinable i/c/s) have no Spark rewrite; the "
                        "flagless form is first-match-only"
                    )
                if set(flag_txt) - {"g", "c"}:
                    # i/s inline into a LITERAL pattern (round 10);
                    # own the pattern token: drop the shared literal
                    # block's same-pass edit (if any) and re-emit with
                    # the flags folded into the converted pattern
                    p_first, p_last = spans[1]
                    if not (p_first == p_last
                            and toks[p_first][0] == "string"):
                        raise TranspileError(
                            "regexp_replace with i/s flags needs a "
                            "literal pattern to inline them"
                        )
                    conv_p = convert_regex_literal(convert_posix_classes(
                        _literal_content(toks[p_first][1], read)
                    ), read)
                    if "i" in flag_txt:
                        conv_p = "(?i)" + conv_p
                    edits[:] = [
                        e for e in edits
                        if not (e[0] == toks[p_first][2]
                                and e[1] == toks[p_first][3])
                    ]
                    edits.append(
                        (toks[p_first][2], toks[p_first][3],
                         _spark_string_literal(conv_p, read))
                    )
                _convert_replacement(spans[2])
                if read == "postgres":
                    # 'g' (global) IS Spark's scope. Spark's numeric
                    # position form regexp_replace(s, p, r, 1) is
                    # text-identical to PG 15's START form (first-
                    # match-only) — a true ambiguity — so for pg the
                    # flag is DROPPED: Spark's 3-arg call replaces
                    # all. The pg 3-arg first-only raise below is
                    # first_pass-gated to keep this a fixpoint
                    # (user input always lexes on pass 1; a 3-arg
                    # call on later passes is this emission).
                    edits.append(
                        (toks[spans[2][1]][3], toks[spans[3][1]][3], "")
                    )
                else:
                    # duckdb has no numeric 4th arg — rewrite the
                    # flag to Spark's position arg 1 (the default)
                    # so the output is not re-readable as a
                    # first-only 3-arg form
                    edits.append((f_tok[2], toks[spans[3][1]][3], "1"))
            elif nargs == 3:
                if read == "postgres" and not first_pass:
                    # our own 'g'→3-arg emission re-read on a later
                    # fixpoint pass — mark its string-literal args
                    # handler-owned so the doubling pass skips them
                    for a_first, a_last in spans[:3]:
                        t_ = toks[a_first]
                        if a_first == a_last and t_[0] == "string":
                            edits.append((t_[2], t_[3], t_[1]))
                else:
                    raise TranspileError(
                        f"{read} regexp_replace replaces only the "
                        "FIRST match; Spark replaces all occurrences "
                        "— add the 'g' option if global replacement "
                        "is intended"
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
        return i

    if name in ("array_length", "list_length") and is_op(i + 1, "("):
        # Postgres array_length(arr, dim) is always 2-arg; Spark
        # size() takes one. dim=1 drops; any other dim is LOUD.
        # Postgres returns NULL for an EMPTY array (duckdb
        # list_length returns 0) — nullif on the pg read.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            d_first, d_last = spans[1]
            if not (
                d_first == d_last
                and toks[d_first][0] == "number"
                and toks[d_first][1] == "1"
            ):
                raise TranspileError(
                    "array_length with a dimension other than 1 has "
                    "no Spark equivalent (arrays are 1-D)"
                )
            if read == "postgres":
                edits.append(
                    (start, toks[close][3],
                     f"nullif(size(({_arg_text(spans[0])})), 0)")
                )
                return close + 1
            edits.append((start, end, "size"))
            # drop ", 1" — from the end of arg 1 to end of arg 2
            edits.append((toks[spans[0][1]][3], toks[d_last][3], ""))
        elif len(spans) > 2:
            raise TranspileError("array_length takes at most 2 args")
        else:
            edits.append((start, end, "size"))
        i += 1
        return i

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
        return i

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
        return i


    if (
        name in ("list_extract", "array_extract", "list_element")
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
        return i

    if name == "log" and read in ("duckdb", "postgres"):
        # 1-arg log is log10 in DuckDB/Postgres, ln in Spark.
        args = _call_args(toks, i + 1)
        if len(args) - 1 == 1:
            edits.append((start, end, "log10"))
        i += 1
        return i

    return None


def _date_bin_emit(name: str, stride_text: str, src_: str, org_: str) -> str:
    """Origin-aligned tumbling-window emission shared by pg date_bin
    and duckdb time_bucket: Spark has no date_bin; for a fixed-width
    INTERVAL-literal stride the bin start is
    origin + floor((ts - origin)/stride)*stride, computed over
    epoch-second DOUBLEs (casts are exact to the microsecond) — source
    and origin bound once via the struct-transform pattern. Month/year
    strides are loud (pg itself rejects them); sub-second strides are
    loud (epoch math here is second-granular)."""
    m = re.match(r"(?is)^\s*INTERVAL\s+'([^']*)'\s*$", stride_text)
    if not m:
        raise TranspileError(
            f"{name} stride must be an INTERVAL literal to transpile"
        )
    total = 0.0
    body = m.group(1).strip()
    if "-" in body:
        raise TranspileError(
            f"{name} stride must be positive (zero or negative "
            "strides are rejected)"
        )
    # explicit unit table — no suffix-stripping: 'ms' would collapse
    # to the minute key and 's' to the empty string
    _BIN_UNITS = {
        "week": 604800, "weeks": 604800, "w": 604800,
        "day": 86400, "days": 86400, "d": 86400,
        "hour": 3600, "hours": 3600, "hr": 3600, "hrs": 3600,
        "h": 3600,
        "minute": 60, "minutes": 60, "min": 60, "mins": 60, "m": 60,
        "second": 1, "seconds": 1, "sec": 1, "secs": 1, "s": 1,
    }
    for num, unit in re.findall(r"([\d.]+)\s*([a-zA-Z]+)", body):
        mult = _BIN_UNITS.get(unit.lower())
        if mult is None:
            raise TranspileError(
                f"{name} stride unit {unit!r} has no fixed "
                "whole-second width (month/year strides don't; "
                "sub-second strides have no Spark rewrite here)"
            )
        total += float(num) * mult
    if total <= 0 or total != int(total):
        raise TranspileError(
            f"{name} stride must be a positive whole number of "
            "seconds to transpile"
        )
    s_ = int(total)
    return (
        f"element_at(transform(array(struct(({src_}) AS _ts, "
        f"({org_}) AS _og)), _t -> _t._og + make_dt_interval(0, 0, "
        f"0, FLOOR((CAST(_t._ts AS DOUBLE) - CAST(_t._og AS "
        f"DOUBLE)) / {s_}) * {s_})), 1)"
    )
