"""DuckDB/Postgres NULL-and-edge fidelity call handlers (pre-split
code, verbatim — moved out of core/dialects/standard.py in round 8,
restoring the round-6 module discipline: every transpile-family module
<= 1,100 lines). Dispatched from standard.call_handlers at the exact
position the section occupied, so handler order is unchanged.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _call_arg_spans,
    _json_key_to_path,
    _parse_inagg_order,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _pg_interval_field,
    _pg_interval_parts,
    _spark_string_literal,
)


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
    # Spark's extract has no isoyear/decade/century/millennium/yearweek
    # fields — raise INVALID_EXTRACT_FIELD; these duckdb/postgres values
    # are simple derivations (YEAROFWEEK is the ISO week-year)
    "isoyear": "CAST(extract(YEAROFWEEK FROM {x}) AS BIGINT)",
    "dayofmonth": "CAST(day({x}) AS BIGINT)",
    "dayofyear": "CAST(dayofyear({x}) AS BIGINT)",
    # decade truncates toward zero; century/millennium count away from
    # zero (year -4 is century -1) — sign-aware so BC years match
    "decade": "CAST(year({x}) DIV nullif(10, 0) AS BIGINT)",
    "century":
        "CAST(sign(year({x})) * ceil(try_divide(abs(year({x})), 100)) AS BIGINT)",
    "millennium":
        "CAST(sign(year({x})) * ceil(try_divide(abs(year({x})), 1000)) AS BIGINT)",
    "yearweek":
        "CAST(extract(YEAROFWEEK FROM {x}) * 100 + weekofyear({x}) AS BIGINT)",
    # Julian Day number (round 10; identical in pg and duck — pinned
    # live: 2024-01-01 = 2460311, 06:00 adds .25): 1970-01-01 is JD
    # 2440588; non-midnight timestamps carry the day fraction
    # divisor spelled CAST(...AS DOUBLE): a bare 86400e6 would be
    # re-typed by the pg exponent-literal NUMERIC handler on re-reads
    "julian":
        "(datediff(CAST({x} AS DATE), DATE '1970-01-01') + 2440588 + "
        "(unix_micros(CAST({x} AS TIMESTAMP)) - "
        "unix_micros(date_trunc('DAY', CAST({x} AS TIMESTAMP)))) / "
        "CAST(86400000000 AS DOUBLE))",
}

#: Postgres overrides: unlike duckdb, Postgres date_part/extract of the
#: seconds family carries the FRACTION (date_part('second',
#: ..01.5) = 1.5, milliseconds = 1500.0) and returns DOUBLE.
_DP_FIELD_TEMPLATES_PG = {
    **_DP_FIELD_TEMPLATES,
    "second": "CAST(date_format({x}, 'ss.SSSSSS') AS DOUBLE)",
    "seconds": "CAST(date_format({x}, 'ss.SSSSSS') AS DOUBLE)",
    "milliseconds": "(CAST(date_format({x}, 'ss.SSSSSS') AS DOUBLE) * 1000)",
    "millisecond": "(CAST(date_format({x}, 'ss.SSSSSS') AS DOUBLE) * 1000)",
    "microseconds": "CAST(date_format({x}, 'ssSSSSSS') AS DOUBLE)",
    "microsecond": "CAST(date_format({x}, 'ssSSSSSS') AS DOUBLE)",
}


def _loud_tz_field(field: str, spelling: str) -> None:
    """pg extract/date_part of timezone[_hour|_minute] reads the
    SESSION TimeZone's UTC offset at that instant — session-dependent
    state with no Spark extract field (Spark raises a confusing
    INVALID_EXTRACT_FIELD at runtime — round-11 loud)."""
    if field in ("timezone", "timezone_hour", "timezone_minute"):
        raise TranspileError(
            f"{spelling}({field} ...) reads the session TimeZone "
            "offset — session-dependent, no Spark extract field; "
            "compute the offset explicitly with to_utc_timestamp "
            "against a named zone"
        )


def call_handlers(ctx) -> "int | None":
    """NULL-and-edge fidelity handlers for the duckdb/postgres family."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, start, end, first_pass, is_op,
               _arg_text, transpile, n)

    if (
        name in ("date_trunc", "datetrunc")
        and read in ("duckdb", "postgres")
        and first_pass
    ):
        # Spark date_trunc returns NULL for ANY unit string it doesn't
        # know — so every pg/duck unit spelling outside Spark's list
        # ('days', 'weeks', 'milliseconds', 'yr', ... all
        # engine-accepted) was a SILENT NULL, and decade/century/
        # millennium don't exist in Spark at all (round-9 probe wave).
        # Literal units normalize to Spark's spelling; the three coarse
        # fields compute from year() with ENGINE-SPECIFIC epochs
        # (pinned live: pg centuries start at xx01 — century(2000-06) =
        # 1901 — while duckdb floors at xx00; pg returns TIMESTAMP,
        # duckdb DATE). Unknown literal units are loud; non-literal
        # unit expressions are loud too (no way to guard the NULL).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 3 and read == "postgres":
            # pg-14 3-arg form truncates in the NAMED zone then
            # converts back — Spark's date_trunc is 2-arg and
            # session-zoned (the passthrough died as an arg-count
            # error; round 11)
            raise TranspileError(
                "postgres date_trunc(unit, ts, timezone) truncates "
                "in the named zone; Spark's date_trunc is 2-arg in "
                "the session zone — set spark.sql.session.timeZone "
                "and drop the argument"
            )
        if len(spans) == 2:
            u0, u1 = spans[0]
            if not (u0 == u1 and toks[u0][0] == "string"):
                raise TranspileError(
                    f"{read} date_trunc with a non-literal unit cannot "
                    "be checked against Spark's unit list (unknown "
                    "units silently return NULL); inline the unit"
                )
            unit = _literal_content(toks[u0][1], read).strip().lower()
            aliases = {
                "us": "microsecond", "usec": "microsecond",
                "usecs": "microsecond", "useconds": "microsecond",
                "microsecond": "microsecond",
                "microseconds": "microsecond",
                "ms": "millisecond", "msec": "millisecond",
                "msecs": "millisecond", "mseconds": "millisecond",
                "millisecond": "millisecond",
                "milliseconds": "millisecond",
                "s": "second", "sec": "second", "secs": "second",
                "second": "second", "seconds": "second",
                "min": "minute", "mins": "minute",
                "minute": "minute", "minutes": "minute",
                "h": "hour", "hr": "hour", "hrs": "hour",
                "hour": "hour", "hours": "hour",
                "d": "day", "day": "day", "days": "day",
                "w": "week", "week": "week", "weeks": "week",
                "mon": "mon", "month": "month", "months": "month",
                "quarter": "quarter", "quarters": "quarter",
                "qtr": "quarter",
                "y": "year", "yr": "year", "yrs": "year",
                "year": "year", "years": "year",
            }
            coarse = {
                "decade": 10, "decades": 10,
                "century": 100, "centuries": 100,
                "millennium": 1000, "millenniums": 1000,
                "millennia": 1000,
            }
            x_ = _arg_text(spans[1])
            if unit in coarse:
                n_yrs = coarse[unit]
                y_ = f"year(({x_}))"
                if read == "postgres":
                    # pg epochs: decade floors at xxx0, century/
                    # millennium start at xx01; result is TIMESTAMP
                    yy = (
                        f"floor({y_} / 10) * 10" if n_yrs == 10
                        else f"floor(({y_} - 1) / {n_yrs}) * {n_yrs} + 1"
                    )
                    body = (
                        f"make_timestamp(CAST({yy} AS INT), 1, 1, 0, 0, 0)"
                    )
                else:
                    # duckdb floors all three at the round number and
                    # returns DATE
                    body = (
                        f"make_date(CAST(floor({y_} / {n_yrs}) "
                        f"* {n_yrs} AS INT), 1, 1)"
                    )
                edits.append((start, toks[close][3], body))
                i = close + 1
                return i
            if unit not in aliases:
                raise TranspileError(
                    f"{read} date_trunc unit {unit!r} has no Spark "
                    "unit (Spark silently returns NULL for unknown "
                    "units); use a standard field name"
                )
            canon = aliases[unit]
            if canon != unit:
                edits.append(
                    (toks[u0][2], toks[u0][3],
                     _spark_string_literal(canon, read))
                )
            # consume only through the unit literal: the second
            # argument still needs this pass's scan (it may hold
            # further pg/duck constructs)
            i = u1 + 1
            return i

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
            # a multi-key in-aggregate ORDER BY splits into spans at
            # its commas — surface the real diagnosis
            d0 = 0
            for j_ in range(spans[0][0], spans[0][1] + 1):
                k_, t_ = toks[j_][0], toks[j_][1]
                if k_ == "op" and t_ in ("(", "["):
                    d0 += 1
                elif k_ == "op" and t_ in (")", "]"):
                    d0 -= 1
                elif d0 == 0 and k_ in _NAME_KINDS and t_.upper() == "ORDER":
                    raise TranspileError(
                        "array_agg(x ORDER BY k1, k2) multi-key "
                        "sorts have no comparator rewrite; sort "
                        "explicitly after aggregating"
                    )
            raise TranspileError("array_agg takes 1 argument")
        depth_ = 0
        order_at = None
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
                order_at = j_
                break
        dist = ""
        a0, a1 = spans[0]
        if toks[a0][0] in _NAME_KINDS and toks[a0][1].upper() == "DISTINCT":
            dist = "DISTINCT "
            a0 += 1
        okey = None   # (key_text, comparator)
        if order_at is not None:
            # array_agg(x ORDER BY k [ASC|DESC] [NULLS FIRST|LAST])
            # (round 11, wave 53): the element rows struct-wrap as
            # (_k, _v) pairs, an explicit comparator sorts by _k
            # (defaults per read — see _parse_inagg_order), and the
            # transform extracts _v — Spark aggregates reject inline
            # ORDER BY. Multi-key and DISTINCT forms stay loud (pg
            # requires the DISTINCT expr as the sort key and already
            # comes back sorted via the dist branch below).
            if dist:
                raise TranspileError(
                    "array_agg(DISTINCT x ORDER BY ...) transpiles "
                    "only without the ORDER BY (pg's DISTINCT "
                    "already returns ascending NULL-last, which the "
                    "rewrite reproduces); drop the ORDER BY or "
                    "sort explicitly"
                )
            a1, key_txt_, cmp_ = _parse_inagg_order(
                toks, sql, spans[0], order_at, read
            )
            okey = (key_txt_, cmp_)
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
            return i
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
        if okey is not None:
            agg = (
                f"array_agg(struct(({okey[0]}) AS _k, "
                f"({expr_text}) AS _v)){ftext}"
            )
        else:
            agg = f"array_agg({dist}struct(({expr_text}) AS _v)){ftext}"
        if (
            fend + 1 < len(toks)
            and toks[fend + 1][0] in _NAME_KINDS
            and toks[fend + 1][1].upper() == "OVER"
        ):
            if okey is not None:
                # pg itself rejects in-aggregate ORDER BY on window
                # calls ("not implemented for window functions")
                raise TranspileError(
                    "array_agg(x ORDER BY k) OVER a window is not "
                    "executable (pg rejects it too); sort the frame "
                    "or aggregate without the window"
                )
            if ftext or dist:
                # Spark rejects windowed aggregates with a FILTER clause
                # ("not supported yet") or DISTINCT
                # (DISTINCT_WINDOW_FUNCTION_UNSUPPORTED) — loud at
                # render time instead of doomed SQL at execution.
                raise TranspileError(
                    "array_agg(DISTINCT ...)/FILTER(...) OVER a window "
                    "is not executable on Spark; aggregate without the "
                    "window or drop the DISTINCT/FILTER"
                )
            # window form: a CASE around the call would detach OVER
            # from its function — wrap transform() AROUND the whole
            # windowed aggregate instead. NULL elements still survive
            # via the struct wrap; the default window frame is never
            # empty, so the NULL-on-empty CASE is not needed (an
            # explicitly empty frame yields [] here vs NULL natively —
            # documented edge).
            if not is_op(fend + 2, "("):
                raise TranspileError(
                    "array_agg(...) OVER window-name has no scoped "
                    "rewrite; inline the window definition"
                )
            over_end = _call_arg_spans(toks, fend + 2)[1]
            over_text = transpile(
                sql[toks[fend + 2][2]: toks[over_end][3]], read
            )
            edits.append(
                (start, toks[over_end][3],
                 f"transform({agg} OVER {over_text}, _s -> _s._v)")
            )
            i = over_end + 1
            return i
        body = agg
        if okey is not None:
            body = f"array_sort({agg}, {okey[1]})"
        if dist and read == "postgres":
            # pg implements DISTINCT-inside-aggregate by SORTING the
            # input, so array_agg(DISTINCT x) comes back ascending
            # with NULL last (an implementation artifact, but de facto
            # stable and user-relied-upon; verified live on PG 15).
            # Spark's hash-distinct order is arbitrary — sort the
            # struct rows with an explicit NULL-last comparator
            # (struct ordering would put a NULL field FIRST).
            body = (
                f"array_sort({agg}, (_l, _r) -> CASE "
                "WHEN _l._v IS NULL AND _r._v IS NULL THEN 0 "
                "WHEN _l._v IS NULL THEN 1 "
                "WHEN _r._v IS NULL THEN -1 "
                "WHEN _l._v < _r._v THEN -1 "
                "WHEN _l._v > _r._v THEN 1 ELSE 0 END)"
            )
        edits.append(
            (start, toks[fend][3],
             f"(CASE WHEN size({agg}) = 0 THEN NULL "
             f"ELSE transform({body}, _s -> _s._v) END)")
        )
        i = fend + 1
        return i

    if name in ("chr", "char") and read in (
        "postgres", "duckdb", "snowflake", "trino"
    ) and first_pass:
        # pg/duckdb/snowflake/trino chr(n) is the Unicode CODE POINT
        # (snowflake CHAR is its alias); Spark chr(n)
        # wraps at 256 (chr(955) = '»', a silent wrong value). Java's
        # %c formats the code point exactly, supplementary planes
        # included (pinned live: format_string('%c', 128512) =
        # pg chr(128512) = '😀'). NULL guard (round-10 NULL sweep):
        # chr(NULL) is NULL in every source engine, but format_string
        # renders a NULL argument as the TEXT 'null'.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"IF(({x_}) IS NULL, NULL, "
                 f"format_string('%c', ({x_})))")
            )
            return close + 1

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
            return i
        for sp in spans:
            edits.append((toks[sp[0]][2], toks[sp[0]][2], "coalesce(CAST("))
            edits.append((toks[sp[1]][3], toks[sp[1]][3], " AS STRING), '')"))
        i += 1
        return i

    if (
        name in ("list_concat", "list_cat", "array_cat", "array_concat")
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
        return i

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
        tail = [
            toks[j_][1].upper()
            for j_ in range(max(spans[0][0], spans[0][1] - 5), spans[0][1] + 1)
        ]
        if (
            toks[spans[0][0]][0] in _NAME_KINDS
            and toks[spans[0][0]][1].lower() == "filter"
            and tail == ["_LD", "->", "_LD", "IS", "NOT", "NULL", ")"][-len(tail):]
        ):
            # exactly our own filter(..., _ld -> _ld IS NOT NULL)
            # emission (or user SQL that is semantically identical to
            # it) on a re-transpile — the NULL-drop is already present;
            # only the list_distinct NAME still needs the rename
            if name == "list_distinct":
                edits.append((start, end, "array_distinct"))
            i += 1
            return i
        a_ = _arg_text(spans[0])
        edits.append(
            (start, toks[close][3],
             f"array_distinct(filter(({a_}), _ld -> _ld IS NOT NULL))")
        )
        i = close + 1
        return i

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
            # Each argument is bound ONCE into a struct and threaded
            # through a one-element transform lambda (nested lambdas
            # may shadow _t), so nested substr calls grow linearly —
            # the naive inline form repeated s/b 6-18x per level. The
            # emitted keyword-form substring has no top-level commas,
            # so it re-reads untouched (fixpoint-stable).
            if read == "duckdb":
                # negative start from the end; negative length walks
                # the span backwards
                p = "CASE WHEN _t._sb < 0 THEN length(_t._ss) + _t._sb + 1 ELSE _t._sb END"
                st = f"greatest({p} + least(_t._sn, 0), 1)"
                hi = f"{p} + greatest(_t._sn, 0)"
            else:
                # postgres: virtual positions only; negative length
                # clips to '' (pg raises natively — benign direction)
                st = "greatest(_t._sb, 1)"
                hi = "_t._sb + _t._sn"
            # NULL start/length must poison the result (duckdb and
            # postgres return NULL); Spark's greatest/least SKIP NULLs,
            # so the bound arithmetic alone would yield '' instead.
            edits.append(
                (start, toks[close][3],
                 f"element_at(transform(array(struct(({s_}) AS _ss, "
                 f"({b_}) AS _sb, ({n_}) AS _sn)), _t -> "
                 f"CASE WHEN _t._sb IS NULL OR _t._sn IS NULL THEN NULL "
                 f"ELSE substring(_t._ss FROM {st} "
                 f"FOR greatest({hi} - {st}, 0)) END), 1)")
            )
            i = close + 1
            return i

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
                # outer NULL guard (round-10 NULL sweep): greatest()
                # IGNORES NULL operands, so a NULL n fell through to
                # position 1 and returned the whole string where
                # duck/pg return NULL (left's FOR NULL propagates
                # naturally — no guard needed there)
                repl = (
                    f"if(({n_}) IS NULL, NULL, "
                    f"substring(({s_}) FROM if(({n_}) < 0, 1 - ({n_}), "
                    f"greatest(length(({s_})) + 1 - ({n_}), 1))))"
                )
            edits.append((start, toks[close][3], repl))
            i = close + 1
            return i

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
            b0, b1 = spans[1]
            if (
                toks[b0][0] in _NAME_KINDS
                and toks[b0][1].upper() == "INTERVAL"
            ):
                # same static interval-field path as extract() below —
                # the templates assume a datetime operand (the epoch
                # one CASTs to TIMESTAMP, a type error on intervals)
                # and Spark's native fields normalize where pg's don't
                if b1 == b0 + 1 and toks[b1][0] == "string":
                    lit = _literal_content(toks[b1][1], read)
                    parts = _pg_interval_parts(lit)
                    val = (
                        _pg_interval_field(field, parts)
                        if parts is not None else None
                    )
                    if val is None:
                        raise TranspileError(
                            f"date_part({field!r}, INTERVAL {lit!r}) "
                            "is not statically evaluable; use day-time "
                            "units or extract(epoch ...)"
                        )
                    edits.append((start, toks[close][3], repr(val)))
                    return close + 1
                raise TranspileError(
                    f"date_part({field!r}, <interval expression>) has "
                    "no faithful Spark form (Spark normalizes interval "
                    "fields; pg does not); use a literal interval"
                )
            _loud_tz_field(field, name)
            tmpl = (
                _DP_FIELD_TEMPLATES_PG if read == "postgres"
                else _DP_FIELD_TEMPLATES
            ).get(field)
            if tmpl is not None:
                x_ = _arg_text(spans[1])
                edits.append(
                    (start, toks[close][3], tmpl.format(x=f"({x_})"))
                )
                i = close + 1
                return i

    if name == "extract" and read in ("duckdb", "postgres") and first_pass:
        # extract(FIELD FROM x) spelling of the same field fixes
        if (
            i + 4 < len(toks)
            and toks[i + 2][0] in _NAME_KINDS
            and toks[i + 3][0] in _NAME_KINDS
            and toks[i + 3][1].upper() == "FROM"
        ):
            field = toks[i + 2][1].lower()
            if (
                toks[i + 4][0] in _NAME_KINDS
                and toks[i + 4][1].upper() == "INTERVAL"
            ):
                close = _call_arg_spans(toks, i + 1)[1]
                if i + 5 == close - 1 and toks[i + 5][0] == "string":
                    # pure INTERVAL literal: interval FIELDS don't
                    # normalize across components in pg/duckdb (hour of
                    # '26 hours 3 min' is 26) while Spark's day-time
                    # intervals auto-normalize (→ 2) — a silent value
                    # divergence, so evaluate the field STATICALLY
                    # (verified live, PG 15 + duckdb: both agree)
                    lit = _literal_content(toks[i + 5][1], read)
                    parts = _pg_interval_parts(lit)
                    val = (
                        _pg_interval_field(field, parts)
                        if parts is not None else None
                    )
                    if val is None:
                        raise TranspileError(
                            f"extract({field} from INTERVAL {lit!r}) "
                            "is not statically evaluable and Spark "
                            "normalizes interval fields differently; "
                            "use day-time units or extract(epoch ...)"
                        )
                    edits.append((start, toks[close][3], repr(val)))
                    return close + 1
                if field != "epoch":
                    # non-literal interval operand (INTERVAL '..' * n
                    # etc.): Spark's normalization makes every field
                    # except epoch silently wrong — loud
                    raise TranspileError(
                        f"extract({field} from <interval expression>) "
                        "has no faithful Spark form (Spark normalizes "
                        "26 hours → 1 day 2 hours; pg keeps hour=26); "
                        "extract from a literal or use epoch"
                    )
            if field == "epoch" and toks[i + 4][0] == "op" \
                    and toks[i + 4][1] == "(":
                # epoch of a parenthesized TIMESTAMP-subtraction —
                # statically interval-typed when every identifier in
                # the operand is TIMESTAMP (>= 2 of them) and a
                # depth-0 '-' separates them; the template's CAST-to-
                # TIMESTAMP would be a type error on intervals, but
                # anchoring the interval at epoch 0 is exact
                close = _call_arg_spans(toks, i + 1)[1]
                inner = toks[i + 5: close - 1]
                idents_ = [t for t in inner if t[0] in _NAME_KINDS]
                if (
                    len(idents_) >= 2
                    and all(t[1].upper() == "TIMESTAMP" for t in idents_)
                    and any(t[0] == "op" and t[1] == "-" for t in inner)
                ):
                    iv_ = sql[toks[i + 4][2]: toks[close - 1][3]]
                    edits.append(
                        (start, toks[close][3],
                         "CAST(CAST('1970-01-01 00:00:00 UTC' AS "
                         f"TIMESTAMP) + ({iv_}) AS DOUBLE)")
                    )
                    return close + 1
            if (
                field == "epoch"
                and toks[i + 4][0] in _NAME_KINDS
                and toks[i + 4][1].upper() == "INTERVAL"
            ):
                # extract(epoch FROM INTERVAL ...) = total seconds of a
                # duration. Spark can't cast an interval to a number,
                # but epoch + interval → timestamp → DOUBLE is exact
                # epoch seconds (fraction included) for DAY-TIME
                # intervals. Year-month parts are LOUD: pg charges a
                # fixed 30-day month into epoch; Spark's calendar
                # shift from 1970-01-01 gives 31-day January months.
                close = _call_arg_spans(toks, i + 1)[1]
                iv_ = sql[toks[i + 4][2]: toks[close - 1][3]]
                if re.search(r"(?i)\b(year|month|mon|yr)s?\b", iv_):
                    raise TranspileError(
                        "extract(epoch from INTERVAL) with year/month "
                        "parts uses pg's fixed 30-day months — no "
                        "faithful Spark form; use day-time units"
                    )
                # zone-suffixed anchor: a bare timestamp string
                # parses in the SESSION timezone, skewing the epoch by
                # the zone offset in any non-UTC session; the UTC
                # suffix pins epoch 0 unconditionally (the outer
                # CAST-to-DOUBLE of a timestamp is zone-independent)
                edits.append(
                    (start, toks[close][3],
                     "CAST(CAST('1970-01-01 00:00:00 UTC' AS TIMESTAMP)"
                     f" + ({iv_}) AS DOUBLE)")
                )
                return close + 1
            _loud_tz_field(field, name)
            tmpl = (
                _DP_FIELD_TEMPLATES_PG if read == "postgres"
                else _DP_FIELD_TEMPLATES
            ).get(field)
            if tmpl is not None:
                close = _call_arg_spans(toks, i + 1)[1]
                x_ = transpile(
                    sql[toks[i + 4][2]: toks[close - 1][3]], read
                )
                edits.append(
                    (start, toks[close][3], tmpl.format(x=f"({x_})"))
                )
                i = close + 1
                return i

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
            return i

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
            return i

    if (
        name == "array_position"
        and read == "postgres"
        and not (
            i >= 2
            and is_op(i - 1, "(")
            and toks[i - 2][0] in _NAME_KINDS
            and toks[i - 2][1].lower() == "nullif"
        )
    ):
        # Postgres array_position returns NULL when the element is not
        # found where Spark (and DuckDB) return 0, AND matches with
        # IS NOT DISTINCT FROM — array_position(ARRAY[1,NULL], NULL)
        # is 2 in pg (round-9 string wave) while Spark's can never find
        # a NULL. Search over the <=> boolean image of the array; the
        # nullif-parent check skips our own emission on re-reads. The
        # 3-arg form starts the search at an index and still reports
        # ORIGINAL positions.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, x_ = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"nullif(array_position(transform(({a_}), "
                 f"_ap -> _ap <=> ({x_})), true), 0)")
            )
            i = close + 1
            return i
        if len(spans) == 3:
            a_, x_, st_ = (
                _arg_text(spans[0]), _arg_text(spans[1]),
                _arg_text(spans[2]),
            )
            edits.append(
                (start, toks[close][3],
                 f"element_at(transform(array(struct(({a_}) AS _a, "
                 f"({st_}) AS _st)), _t -> "
                 f"nullif(array_position(transform(slice(_t._a, _t._st, "
                 f"cardinality(_t._a)), _ap -> _ap <=> ({x_})), true) "
                 f"+ _t._st - 1, _t._st - 1)), 1)")
            )
            i = close + 1
            return i

    if name == "trunc" and read in ("duckdb", "postgres") and first_pass:
        # numeric truncation toward zero (these dialects' trunc is
        # numeric-only; Oracle's date TRUNC has its own handler). Spark
        # trunc() is (date, fmt) — a bare rename would be an analysis
        # error. floor/ceil return BIGINT/DECIMAL; CAST DOUBLE matches
        # duckdb's double-in/double-out (decimal input returns DECIMAL
        # natively — statically untypeable dtype seam, value exact).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"CAST(CASE WHEN ({x_}) < 0 THEN ceil(({x_})) "
                 f"ELSE floor(({x_})) END AS DOUBLE)")
            )
            i = close + 1
            return i
        raise TranspileError(
            "trunc(x, digits) has no Spark rewrite; use "
            "floor/ceil arithmetic explicitly"
        )

    # (fsum moved to the duckdb_fns statistical-aggregate tier in
    # round 11, alongside kahan_sum/sumkahan/favg/sem/product)

    if name == "epoch" and read in ("duckdb", "postgres") and first_pass:
        # duck epoch(ts) returns DOUBLE seconds WITH the fraction
        # (epoch(ts+.5s) = ....5 — the old unix_timestamp rename
        # TRUNCATED it, a wave-64 composition silent wrong); the
        # micros division is the extract-epoch template's emission.
        # pg has no epoch() function but the meaning is its
        # extract(epoch ...), so the same emission serves both reads.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = f"({_arg_text(spans[0])})"
            edits.append(
                (start, toks[close][3],
                 f"try_divide(unix_micros(CAST({x_} AS TIMESTAMP)), "
                 "1000000)")
            )
            return close + 1

    if (
        name in (
            "json_extract_string", "json_extract_path_text",
            "jsonb_extract_path_text",
        )
        and read in ("duckdb", "postgres")
        and first_pass
    ):
        # TEXT-mode JSON extraction — exactly get_json_object (unquoted
        # scalars, compact object text, 0-based array indexes). Postgres
        # json_extract_path_text is VARIADIC key elements; duckdb takes
        # one key or $-path. Non-literal paths have no faithful rewrite
        # (get_json_object needs a foldable path) — loud.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) >= 2 and all(
            toks[sp[0]][0] in ("string", "number") and sp[0] == sp[1]
            for sp in spans[1:]
        ):
            j_ = _arg_text(spans[0])
            parts = []
            for sp in spans[1:]:
                tok_ = toks[sp[0]]
                if tok_[0] == "number":
                    parts.append(f"[{tok_[1]}]")
                else:
                    key = _literal_content(tok_[1], read)
                    if len(spans) == 2:
                        # single path argument: full $-path / JSON
                        # Pointer / key semantics (same as the arrows)
                        parts.append(_json_key_to_path(key, read)[1:])
                    else:
                        # postgres variadic path ELEMENTS are literal
                        # keys — bracket form keeps dots literal
                        if any(c in key for c in "'[]"):
                            raise TranspileError(
                                "JSON keys containing quotes or "
                                "brackets cannot be expressed in "
                                "Spark's JsonPath"
                            )
                        parts.append(f"['{key}']")
            path = "$" + "".join(parts)
            edits.append(
                (start, toks[close][3],
                 f"get_json_object(({j_}), "
                 f"{_spark_string_literal(path, read)})")
            )
            i = close + 1
            return i
        raise TranspileError(
            f"{name} needs literal key/path arguments to transpile "
            "(Spark get_json_object paths are foldable)"
        )

    if name in ("avg", "mean") and read in ("duckdb", "postgres"):
        # Both engines compute avg of exact-numeric inputs at FULL
        # precision (duck avg of DECIMALs returns DOUBLE
        # 2.1666666666666665; pg returns unbounded NUMERIC — both
        # pinned live); Spark's decimal avg keeps DECIMAL(p+4, s+4),
        # ROUNDING at scale+4 (2.16667 for DECIMAL(2,1) inputs — a
        # silent value change; round-10 aggregate sweep). Casting the
        # input to DOUBLE matches both engines to float precision.
        # duck has no interval avg; pg does — statically-visible
        # INTERVAL operands skip the cast (an interval COLUMN would
        # fail the cast loudly, a documented ceiling). CAST-first-
        # token marker keeps re-reads inert; DISTINCT stays outside.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            s0, s1 = spans[0]
            depth0_order = False
            d_ = 0
            for j_ in range(s0, s1 + 1):
                k2, t2 = toks[j_][0], toks[j_][1]
                if k2 == "op" and t2 in ("(", "["):
                    d_ += 1
                elif k2 == "op" and t2 in (")", "]"):
                    d_ -= 1
                elif d_ == 0 and k2 in _NAME_KINDS and \
                        t2.upper() == "ORDER":
                    depth0_order = True
            distinct = (
                toks[s0][0] in _NAME_KINDS
                and toks[s0][1].upper() == "DISTINCT"
            )
            v0 = s0 + 1 if distinct else s0
            skip = (
                depth0_order
                or (toks[v0][0] in _NAME_KINDS
                    and toks[v0][1].upper() in ("CAST", "INTERVAL"))
                or (toks[v0][0] == "op" and toks[v0][1] == "*")
            )
            if not skip:
                x_ = sql[toks[v0][2]: toks[s1][3]]
                edits.append(
                    (start, toks[close][3],
                     f"avg({'DISTINCT ' if distinct else ''}"
                     f"CAST(({x_}) AS DOUBLE))")
                )
                i = close + 1
                return i

    if name == "width_bucket" and read == "postgres" and first_pass:
        # pg's 2-arg ARRAY form buckets by a SORTED thresholds list
        # (width_bucket(7, ARRAY[1,5,10]) = 2 — pinned live; pg leaves
        # unsorted arrays undefined): the bucket index is the count of
        # thresholds <= operand. Spark only has the 4-arg numeric
        # form, which passes through below. NULL operand → NULL (the
        # filter alone would yield 0); NULL thresholds are a pg error.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            x_, a_ = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"IF(({x_}) IS NULL, NULL, "
                 f"size(filter(({a_}), _wb -> _wb <= ({x_}))))")
            )
            i = close + 1
            return i

    if name == "bit_count" and read == "postgres" and first_pass:
        # pg bit_count over BYTEA counts set bits across the bytes
        # (bit_count('\\x6162') = 6 — pinned live); Spark's is
        # integral-only. Statically-bytea args are loud; integral
        # args pass through (identical semantics).
        spans, _c2 = _call_arg_spans(toks, i + 1)
        if len(spans) == 1 and sql[
            toks[spans[0][0]][2]: toks[spans[0][1]][3]
        ].lower().endswith(("::bytea", "::binary")):
            raise TranspileError(
                "postgres bit_count(bytea) counts bits across bytes; "
                "Spark's bit_count is integral-only — no faithful "
                "rewrite"
            )

    if name == "json_array_length" and read == "postgres" and first_pass:
        # postgres json_array_length RAISES on non-array input and has
        # no 2-arg (json, path) form. Spark's native json_array_length
        # (NULL on non-array) is the closest non-erroring behavior —
        # pass the 1-arg form through untouched; the duckdb-only
        # coalesce-0 wrap below would silently return 0 on inputs
        # postgres rejects.
        spans, _close = _call_arg_spans(toks, i + 1)
        if len(spans) != 1:
            raise TranspileError(
                "postgres json_array_length takes a single argument "
                "(the 2-arg path form is duckdb-only)"
            )

    if (
        name == "json_array_length"
        and read == "duckdb"
        and first_pass
        and not (
            i >= 2
            and is_op(i - 1, "(")
            and toks[i - 2][0] in _NAME_KINDS
            and toks[i - 2][1].lower() == "coalesce"
        )
    ):
        # duckdb returns 0 for NON-ARRAY values where Spark's
        # json_array_length is NULL — coalesce restores 0, the NULL-json
        # guard keeps NULL inputs NULL. The 2-arg (json, path) form
        # scopes through get_json_object; a MISSING/INVALID path is
        # NULL in duck, NOT 0 (round-10 collision sweep — the old
        # emission coalesced the path miss to 0), so the path lookup
        # joins the NULL guard. JSONPointer-spelled paths ('/a') are
        # loud: get_json_object silently returns NULL for them. (The
        # coalesce-parent check skips our own emission on re-reads.)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) in (1, 2):
            j_ = _arg_text(spans[0])
            if len(spans) == 2:
                p2s = spans[1]
                if (
                    p2s[0] == p2s[1]
                    and toks[p2s[0]][0] == "string"
                    and not _literal_content(
                        toks[p2s[0]][1], read).startswith("$")
                ):
                    raise TranspileError(
                        "duckdb json_array_length path must be a "
                        "JSONPath ('$...') to transpile; JSONPointer "
                        "('/a') has no get_json_object form"
                    )
                if toks[p2s[0]][0] == "op" and toks[p2s[0]][1] == "[":
                    raise TranspileError(
                        "duckdb json_array_length with a LIST of "
                        "paths returns a list; call it per path"
                    )
                p2 = _arg_text(p2s)
                inner = f"get_json_object(({j_}), ({p2}))"
                edits.append(
                    (start, toks[close][3],
                     f"(CASE WHEN ({j_}) IS NULL OR {inner} IS NULL "
                     f"THEN NULL ELSE "
                     f"coalesce(json_array_length({inner}), 0) END)")
                )
            else:
                edits.append(
                    (start, toks[close][3],
                     f"(CASE WHEN ({j_}) IS NULL THEN NULL ELSE "
                     f"coalesce(json_array_length(({j_})), 0) END)")
                )
            i = close + 1
            return i

    return None
