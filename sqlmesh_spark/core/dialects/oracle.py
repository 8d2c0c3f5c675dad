"""Oracle read-dialect function map, bare-keyword fixes and call handlers.

Split out of core/transpile.py (round 6): the walker in
core/transpile.py dispatches into this module's handler functions; see
TokenCtx in core/transpile_shared.py for the contract. Handler bodies
are the pre-split code verbatim (continue -> return i), so every
file:line reference in docstrings and VERDICT history still applies.
"""

from __future__ import annotations

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _call_arg_spans,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
)

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


def token_handlers(ctx) -> "int | None":
    """Walker-level (non-call) token handlers (pre-split code, verbatim)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, first_pass, is_op, _arg_text, transpile, n)
    if read == "oracle" and kind == "ident":
        low = text.lower()
        # SYSDATE / SYSTIMESTAMP bare keywords: DB-server wall clock →
        # session clock (documented equivalence; Oracle has no session
        # TZ notion for SYSDATE).
        if low in ("sysdate", "systimestamp") and not is_op(i + 1, "("):
            edits.append((start, end, "current_timestamp()"))
            i += 1
            return i
        # FROM dual → remove (Spark SELECT needs no FROM clause).
        if (
            low == "dual"
            and i > 0
            and toks[i - 1][0] == "ident"
            and toks[i - 1][1].upper() == "FROM"
        ):
            edits.append((toks[i - 1][2], end, ""))
            i += 1
            return i
        # MINUS set operator → EXCEPT (reserved in Oracle, so a bare
        # ident is always the operator).
        if low == "minus":
            edits.append((start, end, "EXCEPT"))
            i += 1
            return i
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
    return None


def call_handlers(ctx) -> "int | None":
    """Oracle read-dialect function map, bare-keyword fixes and call handlers (pre-split code, verbatim)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, first_pass, is_op, _arg_text, transpile, n)
    if name == "instr" and first_pass:
        # oracle INSTR(s, sub[, start[, nth]]) — Spark's instr is
        # 2-arg (the 3/4-arg forms died as arg-count errors, round
        # 11). 3-arg positive start → locate(sub, s, start) (same
        # 1-based contract, 0 on miss); negative start searches
        # BACKWARD from the end and nth > 1 counts occurrences —
        # both loud.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 3:
            s0 = spans[2][0]
            if (
                spans[2][0] == spans[2][1]
                and toks[s0][0] == "number"
            ):
                edits.append(
                    (start, toks[close][3],
                     f"locate(({_arg_text(spans[1])}), "
                     f"({_arg_text(spans[0])}), "
                     f"({_arg_text(spans[2])}))")
                )
                return close + 1
            raise TranspileError(
                "oracle INSTR with a non-literal (possibly negative) "
                "start has no Spark rewrite — negative starts search "
                "backward from the end; use a literal positive start"
            )
        if len(spans) == 4:
            raise TranspileError(
                "oracle INSTR(s, sub, start, nth) occurrence "
                "counting has no Spark rewrite; restructure with "
                "regexp_instr or split logic"
            )
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
            return i
        raise TranspileError(
            "oracle TRUNC is type-overloaded; only the "
            "TRUNC(date, 'fmt') literal-format form "
            "transpiles — use floor()/CAST for numerics"
        )

    return None
