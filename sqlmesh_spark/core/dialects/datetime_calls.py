"""Datetime formatting / arithmetic call handlers (pre-split code,
verbatim — moved out of core/dialects/standard.py in round 13,
restoring the module discipline: every transpile-family module
<= 1,200 lines). Dispatched from standard.call_handlers at the exact
position the section occupied (between the trim-family and
regexp_replace handlers), so handler order is unchanged: to_char,
string_to_array/str_split, dateadd/timeadd/timestampadd, and
date_diff/datediff/date_sub/datesub.
"""

from __future__ import annotations

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _call_arg_spans,
    _call_args,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _regex_literal,
    _resolve_unit,
    _spark_string_literal,
)


def call_handlers(ctx) -> "int | None":
    """to_char / string-split / date-arith handlers, all reads gated
    per handler exactly as before the split."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, kind, text, end, is_op, transpile, n)

    if name in ("to_char",) and read in (
        "postgres", "redshift", "oracle"
    ) and first_pass:
        spans_, _close_ = _call_arg_spans(toks, i + 1)
        args = [sp[0] for sp in spans_]
        if len(args) == 2 and (
            (toks[args[0]][0] in _NAME_KINDS
             and toks[args[0]][1].lower() in ("interval", "make_interval"))
        ):
            # pg to_char(interval, fmt) formats elapsed-time FIELDS
            # (HH24 of interval '26 hours' is 26); the date_format
            # emission below cannot take an interval — loud for the
            # statically visible literal/constructor shapes (round 11)
            raise TranspileError(
                "postgres to_char over an INTERVAL formats elapsed "
                "time fields; no Spark rewrite — extract the fields "
                "and format_string them explicitly"
            )
        if len(args) == 2 and toks[args[1]][0] == "string" \
                and spans_[1][0] == spans_[1][1]:
            from sqlmesh_spark.core.transpile_text import (
                convert_pg_tochar_segments,
            )

            fmt_lit = toks[args[1]][1]
            from sqlmesh_spark.core.transpile_text import (
                pg_numeric_tochar_emit,
            )

            # numeric digit-class tier first (round 11): a format of
            # only [FM][S][9|0|,][.] slots is a NUMBER pattern (no
            # date code uses those characters), previously loud
            num_emit = pg_numeric_tochar_emit(
                _arg_text(spans_[0]),
                fmt_lit[1:-1].replace("''", "'"),
            )
            if num_emit is not None:
                edits.append((start, toks[_close_][3], num_emit))
                return _close_ + 1
            segs = convert_pg_tochar_segments(
                fmt_lit[1:-1].replace("''", "'")
            )
            if all(kind_ == "pat" for kind_, _ in segs) and len(segs) <= 1:
                converted = segs[0][1] if segs else ""
                edits.append((start, end, "date_format"))
                edits.append(
                    (toks[args[1]][2], toks[args[1]][3],
                     _spark_string_literal(converted, read))
                )
                i += 1
                return i
            # name fields Java patterns can't express (padded DAY/
            # MONTH, lowercase dy/mon/am) — piece the output together
            # with '||' (concat() would be rewrapped by the pg
            # NULL-skip handler on re-read)
            x_ = _arg_text(spans_[0])
            pieces = []
            for kind_, val in segs:
                if kind_ == "pat":
                    pieces.append(
                        f"date_format(({x_}), "
                        f"{_spark_string_literal(val, read)})"
                    )
                else:
                    pieces.append(val.format(x=f"({x_})"))
            edits.append(
                (start, toks[_close_][3],
                 "(" + " || ".join(pieces) + ")")
            )
            return _close_ + 1
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
        return i

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
        return i

    if name in ("date_diff", "datediff", "date_sub", "datesub") and read in (
        "duckdb", "postgres", "snowflake", "redshift", "tsql",
        "trino", "clickhouse",
    ) and not (name in ("date_sub", "datesub") and read != "duckdb"):
        # DuckDB date_diff counts UNIT-BOUNDARY CROSSINGS while
        # Spark timestampdiff counts complete elapsed units
        # (date_diff('month', Jan-31, Feb-01) is 1 in DuckDB, 0 as
        # a naive timestampdiff). Truncating both operands to the
        # unit makes complete-units == boundary-crossings:
        #   timestampdiff(U, date_trunc('u', s), date_trunc('u', e))
        # Trino's date_diff — and duckdb's date_sub/datesub —
        # count complete elapsed units already (java.time between
        # semantics): timestampdiff directly, NO truncation.
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
            if (
                name in ("date_sub", "datesub")
                and unit.upper() in ("MONTH", "QUARTER", "YEAR")
            ):
                # duckdb's complete-unit rule CLAMPS month ends
                # (date_sub('month', Jan-31, Feb-29) = 1); Spark's
                # timestampdiff does not (0) and months_between's
                # both-last-day rule differs in other corners — no
                # faithful rewrite. Fixed-width units are exact.
                raise TranspileError(
                    f"duckdb {name}('{raw_unit}', ...) counts "
                    "clamped complete months; no faithful Spark "
                    "rewrite — use date_diff (boundary crossings) "
                    "or day-based arithmetic"
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
            if read != "trino" and name not in ("date_sub", "datesub"):
                for s_idx, e_idx in spans[1:]:
                    edits.append(
                        (toks[s_idx][2], toks[s_idx][2],
                         f"date_trunc('{unit.lower()}', ")
                    )
                    edits.append((toks[e_idx][3], toks[e_idx][3], ")"))
        i += 1
        return i

    return None

