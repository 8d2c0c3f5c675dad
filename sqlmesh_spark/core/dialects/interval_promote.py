"""DATE-vs-INTERVAL promotion handlers (pre-split code, verbatim —
moved out of core/dialects/standard_edges.py in round 13, restoring the
module discipline: every transpile-family module <= 1,200 lines). These
are TOKEN-tier handlers, not call handlers: both reads' token handlers
(core/dialects/duckdb_tokens.py, core/dialects/postgres_ops.py) invoke
them directly at the INTERVAL / make_interval token, so there is no
dispatch-order question — the import site moved, nothing else.
"""

from __future__ import annotations

from sqlmesh_spark.core.transpile_shared import _NAME_KINDS


def date_interval_promote(ctx) -> "int | None":
    """pg/duckdb `date ± INTERVAL` yields TIMESTAMP (pinned live on both:
    DATE '2024-01-31' + INTERVAL '1 month' = 2024-02-29 00:00:00
    ::timestamp); Spark keeps DATE for year-month/day intervals — a
    silent TYPE divergence (and a silent VALUE loss the moment a
    sub-day component rides along a month interval, e.g. '1 month
    2 hours').  Statically date-typed operands (DATE literal, ::date /
    CAST(.. AS DATE), make_date(), current_date) wrap in
    CAST(.. AS TIMESTAMP); the wrap is its own inertness marker (the
    re-read's operand is a CAST-to-TIMESTAMP, no longer date-typed).
    Triggered at the INTERVAL ident token from BOTH reads' token
    handlers (round-9 probe wave finding)."""
    toks, edits = ctx.toks, ctx.edits
    i = ctx.i
    n = len(toks)
    if not (
        toks[i][0] in _NAME_KINDS
        and toks[i][1].upper() == "INTERVAL"
        and i + 1 < n
        and (
            toks[i + 1][0] == "string"
            # the INTERVAL 2 DAY number-unit spelling (round-10 duck
            # sweep: the string-only check silently skipped it, so
            # DATE + INTERVAL 2 DAY stayed a DATE on Spark)
            or (
                toks[i + 1][0] == "number"
                and i + 2 < n
                and toks[i + 2][0] in _NAME_KINDS
            )
        )
    ):
        return None

    def _is_date_span(first: int, last: int) -> bool:
        t0 = toks[first]
        if (
            t0[0] in _NAME_KINDS and t0[1].upper() == "DATE"
            and first + 1 == last and toks[last][0] == "string"
        ):
            return True  # DATE 'lit'
        if (
            first == last
            and t0[0] in _NAME_KINDS
            and t0[1].lower() == "current_date"
        ):
            return True
        if (
            t0[0] in _NAME_KINDS
            and t0[1].lower() == "make_date"
            and toks[last][0] == "op" and toks[last][1] == ")"
        ):
            return True
        if (
            toks[last][0] in _NAME_KINDS
            and toks[last][1].lower() == "date"
            and last >= 1
            and toks[last - 1][0] == "op" and toks[last - 1][1] == "::"
        ):
            return True  # x::date
        if (
            t0[0] in _NAME_KINDS and t0[1].upper() in ("CAST", "TRY_CAST")
            and toks[last][0] == "op" and toks[last][1] == ")"
            and last >= 2
            and toks[last - 1][0] in _NAME_KINDS
            and toks[last - 1][1].lower() == "date"
            and toks[last - 2][0] in _NAME_KINDS
            and toks[last - 2][1].upper() == "AS"
        ):
            return True  # CAST(x AS DATE)
        return False

    def _wrap(first: int, last: int) -> None:
        ls, le = toks[first][2], toks[last][3]
        if any(e[1] >= ls and e[0] <= le for e in edits):
            return  # overlapping same-pass edit — defer to next pass
        edits.append((ls, ls, "CAST("))
        edits.append((le, le, " AS TIMESTAMP)"))

    from sqlmesh_spark.core.transpile_shared import (
        _backward_primary,
        _forward_primary,
    )

    # shape A: <date-primary> ± INTERVAL 'lit'
    if (
        i >= 2
        and toks[i - 1][0] == "op" and toks[i - 1][1] in ("+", "-")
    ):
        first = _backward_primary(toks, i - 2, include_unary=False)
        if (
            first is not None
            and toks[first][0] == "string"
            and first >= 1
            and toks[first - 1][0] in _NAME_KINDS
            and toks[first - 1][1].upper() == "DATE"
        ):
            first -= 1  # the primary helpers don't span typed literals
        if first is not None and _is_date_span(first, i - 2):
            _wrap(first, i - 2)
            return i + 2
    # shape B: INTERVAL 'lit' + <date-primary>
    if (
        i + 2 < n
        and toks[i + 2][0] == "op" and toks[i + 2][1] == "+"
    ):
        if (
            i + 4 < n
            and toks[i + 3][0] in _NAME_KINDS
            and toks[i + 3][1].upper() == "DATE"
            and toks[i + 4][0] == "string"
        ):
            span = (i + 3, i + 4)
        else:
            span = _forward_primary(toks, i + 3)
        if span is not None and _is_date_span(span[0], span[1]):
            _wrap(span[0], span[1])
            return i + 2
    return None


def make_interval_date_promote(ctx) -> "int | None":
    """The composition partner of date_interval_promote (r11 verdict
    "What's wrong" #3): mixed-family interval literals are rewritten to
    ``make_interval(...)`` by the decompose path, and on the next pass
    the INTERVAL token — the only promotion trigger — is gone, so
    ``DATE ± make_interval(...)`` silently stayed a DATE on Spark
    (duck/pg yield TIMESTAMP; with a sub-day component Spark even
    errors: INVALID_INTERVAL_WITH_MICROSECONDS_ADDITION). Triggered at
    a ``make_interval`` ident; wraps a statically date-typed other
    operand in CAST(.. AS TIMESTAMP) exactly like the literal handler
    (the wrap is the same inertness marker). Also covers user-written
    pg ``make_interval(..)`` calls in date arithmetic. Pinned live:
    duck_wave65 / pg_wave64.

    ALWAYS returns None: the edit is purely additive on the DATE
    operand's span, and the make_interval token itself must stay
    visible to later handlers in the same scan position (the pg
    named-argument → positional rewrite in postgres_calls fires on the
    same ident — consuming the token here left named args through to
    Spark's NAMED_PARAMETERS_NOT_SUPPORTED error, caught by
    pg_wave64)."""
    toks, edits = ctx.toks, ctx.edits
    i = ctx.i
    n = len(toks)
    if not (
        toks[i][0] in _NAME_KINDS
        and toks[i][1].lower() == "make_interval"
        and i + 1 < n
        and toks[i + 1][0] == "op" and toks[i + 1][1] == "("
    ):
        return None

    from sqlmesh_spark.core.transpile_shared import (
        _backward_primary,
        _forward_primary,
    )

    # same date-span test / wrap as date_interval_promote (its closures
    # capture that handler's own ctx, so they are re-stated here)
    def _is_date_span(first: int, last: int) -> bool:
        t0 = toks[first]
        if (
            t0[0] in _NAME_KINDS and t0[1].upper() == "DATE"
            and first + 1 == last and toks[last][0] == "string"
        ):
            return True
        if (
            first == last
            and t0[0] in _NAME_KINDS
            and t0[1].lower() == "current_date"
        ):
            return True
        if (
            t0[0] in _NAME_KINDS
            and t0[1].lower() == "make_date"
            and toks[last][0] == "op" and toks[last][1] == ")"
        ):
            return True
        if (
            toks[last][0] in _NAME_KINDS
            and toks[last][1].lower() == "date"
            and last >= 1
            and toks[last - 1][0] == "op" and toks[last - 1][1] == "::"
        ):
            return True
        if (
            t0[0] in _NAME_KINDS and t0[1].upper() in ("CAST", "TRY_CAST")
            and toks[last][0] == "op" and toks[last][1] == ")"
            and last >= 2
            and toks[last - 1][0] in _NAME_KINDS
            and toks[last - 1][1].lower() == "date"
            and toks[last - 2][0] in _NAME_KINDS
            and toks[last - 2][1].upper() == "AS"
        ):
            return True
        return False

    def _wrap(first: int, last: int) -> None:
        ls, le = toks[first][2], toks[last][3]
        if any(e[1] >= ls and e[0] <= le for e in edits):
            return
        edits.append((ls, ls, "CAST("))
        edits.append((le, le, " AS TIMESTAMP)"))

    # shape A: <date-primary> ± make_interval(...)
    if (
        i >= 2
        and toks[i - 1][0] == "op" and toks[i - 1][1] in ("+", "-")
    ):
        first = _backward_primary(toks, i - 2, include_unary=False)
        if (
            first is not None
            and toks[first][0] == "string"
            and first >= 1
            and toks[first - 1][0] in _NAME_KINDS
            and toks[first - 1][1].upper() == "DATE"
        ):
            first -= 1
        if first is not None and _is_date_span(first, i - 2):
            _wrap(first, i - 2)
            return None  # additive edit; token stays for later handlers
    # shape B: make_interval(...) + <date-primary>
    depth = 0
    close = None
    for j in range(i + 1, n):
        if toks[j][0] == "op" and toks[j][1] == "(":
            depth += 1
        elif toks[j][0] == "op" and toks[j][1] == ")":
            depth -= 1
            if depth == 0:
                close = j
                break
    if (
        close is not None
        and close + 2 < n
        and toks[close + 1][0] == "op" and toks[close + 1][1] == "+"
    ):
        if (
            close + 3 < n
            and toks[close + 2][0] in _NAME_KINDS
            and toks[close + 2][1].upper() == "DATE"
            and toks[close + 3][0] == "string"
        ):
            span = (close + 2, close + 3)
        else:
            span = _forward_primary(toks, close + 2)
        if span is not None and _is_date_span(span[0], span[1]):
            _wrap(span[0], span[1])
            return None  # additive edit; token stays for later handlers
    return None
