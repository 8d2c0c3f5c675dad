"""Postgres round-8 operator/literal/cast token handlers (pre-split
code, verbatim — moved out of core/dialects/postgres.py to restore the
round-6 module discipline: every transpile-family module <= 1,100
lines). Covers the @-family and root prefix operators, the
literal-castee seams (_pg_cast_seams: boolean words, ::interval,
'{...}'::type[] array literals, bytea hex forms, float/binary-to-text
rendering guards), pg-only typed-literal spellings, MATERIALIZED CTE
hints, unnest bare aliases, exponent-literal expansion, jsonb
mutation-operator louds and GROUPS-frame louds. Dispatched from
postgres.token_handlers at the exact position the section occupied,
so handler order is unchanged. Every rewrite's semantics are pinned
live on PostgreSQL 15 in tests/test_dialect_fuzz_pg.py."""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _NONCALLABLE_KEYWORDS,
    _backward_primary,
    _call_arg_spans,
    _forward_primary,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _pg_interval_parts,
    _spark_string_literal,
)
from sqlmesh_spark.core.transpile_types import _float_typed_castee


def token_handlers(ctx) -> "int | None":
    """Round-8 pg token handlers; returns the next scan index when a
    construct was consumed/edited, None to fall through."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, kind, text = ctx.i, ctx.kind, ctx.text
    start, end = ctx.start, ctx.end
    is_op, _arg_text = ctx.is_op, ctx.arg_text
    n = len(toks)
    _unused = (first_pass, is_op)

    # date ± INTERVAL promotes to TIMESTAMP in pg (shared pg/duck
    # handler — round-9 probe wave)
    if read == "postgres" and kind == "ident" and text.upper() == "INTERVAL":
        from sqlmesh_spark.core.dialects.interval_promote import (
            date_interval_promote,
        )

        nxt = date_interval_promote(ctx)
        if nxt is not None:
            return nxt

    if (
        read == "postgres"
        and kind == "ident"
        and text.lower() == "make_interval"
    ):
        # composition partner of the promote above: decomposed mixed
        # intervals (and user-written pg make_interval calls) in date
        # arithmetic still promote the date side (r11 verdict #3)
        from sqlmesh_spark.core.dialects.interval_promote import (
            make_interval_date_promote,
        )

        nxt = make_interval_date_promote(ctx)
        if nxt is not None:
            return nxt

    # ISO-8601 + mixed-family interval literals (round 10): pg accepts
    # INTERVAL 'P1Y2M3DT4H5M6S' (duck does not — pg-only) and verbose
    # mixed literals like '1 year 3 days'; Spark's parser rejects the
    # P-form entirely AND refuses to mix year-month with day-time
    # units in one literal ("Cannot mix year-month and day-time
    # fields" — pinned live), so both previously died as confusing
    # runtime errors. Decompose via _pg_interval_parts (pg's exact
    # fraction-spilling rules) and re-emit: single-family forms as
    # unit-spelling literals (day-time literals collect; year-month
    # works in arithmetic), MIXED families as make_interval (works in
    # arithmetic, the only place a mixed interval can land).
    if (
        read in ("postgres", "duckdb")
        and kind == "ident"
        and text.upper() == "INTERVAL"
        and i + 1 < n
        and toks[i + 1][0] == "string"
    ):
        # duckdb widened in round 11: duck shares pg's fraction
        # spilling exactly (pinned live: '1.5 months' = 45 days,
        # '0.5 years' = 180 days under duck's 30-day client render =
        # pg's 1 mon 15 days / 6 mons) and Spark rejects the same
        # mixed/fractional/clock shapes. duck REJECTS ISO P-forms
        # (pinned) — those fall through for the duck read.
        content = _literal_content(toks[i + 1][1], read).strip()
        is_iso = content.lstrip("+-")[:1].lower() == "p"
        if is_iso and read == "duckdb":
            return None  # duck itself rejects ISO interval text
        parts = _pg_interval_parts(content)
        mixed = (
            parts is not None
            and parts[0] != 0
            and (parts[1] != 0 or parts[2] != 0)
        )
        # round 11: FRACTIONAL units ('1.5 days' → 1 day 12:00:00,
        # pg's DecodeInterval spilling — pinned live), hh:mm[:ss]
        # clock segments, and the 'ago' negation suffix are all
        # pg-parseable shapes Spark's interval literal parser rejects
        # (previously confusing runtime errors) — same decompose +
        # re-emit path as the ISO/mixed forms. The re-emitted
        # '{d} days {s} seconds' spelling may itself carry a decimal
        # seconds field: it re-decomposes to the identical text, so
        # the fixpoint converges.
        unparseable = parts is not None and (
            "." in content or ":" in content
            or content.rstrip().lower().endswith("ago")
        )
        if is_iso or mixed or unparseable:
            if any(e[1] >= start and e[0] <= toks[i + 1][3]
                   for e in edits):
                return i + 1  # another handler owns this span — defer
            if parts is None:
                raise TranspileError(
                    f"postgres ISO-8601 interval {content!r} did not "
                    "statically decompose; spell the units out"
                )
            months, days, micros = parts
            secs = micros / 1_000_000
            secs_txt = f"{secs:.6f}".rstrip("0").rstrip(".")
            if secs_txt in ("", "-0"):
                secs_txt = "0"
            if mixed:
                repl = (
                    f"make_interval(0, {months}, 0, {days}, 0, 0, "
                    f"{secs_txt})"
                )
            elif months:
                repl = f"INTERVAL '{months} months'"
            else:
                repl = f"INTERVAL '{days} days {secs_txt} seconds'"
            edits.append((start, toks[i + 1][3], repl))
            return i + 2

    # FOR UPDATE / FOR SHARE / FOR NO KEY UPDATE / FOR KEY SHARE row-lock
    # clauses (+ optional OF table-list and NOWAIT / SKIP LOCKED): row
    # locks have no observable effect on a snapshot read's RESULT, so
    # stripping is faithful for a read-only engine (SKIP LOCKED only
    # changes visibility under concurrent writers, which a batch Spark
    # read has none of). Previously passed through into a Spark parse
    # error.
    if read == "postgres" and kind == "ident" and text.upper() == "FOR":
        j = i + 1
        matched = None
        def _kw(ix):
            return (
                toks[ix][1].upper()
                if ix < n and toks[ix][0] in _NAME_KINDS else ""
            )
        if _kw(j) in ("UPDATE", "SHARE"):
            matched = j
        elif _kw(j) == "NO" and _kw(j + 1) == "KEY" and _kw(j + 2) == "UPDATE":
            matched = j + 2
        elif _kw(j) == "KEY" and _kw(j + 1) == "SHARE":
            matched = j + 1
        if matched is not None:
            j = matched + 1
            if _kw(j) == "OF":
                j += 1
                while j < n and toks[j][0] in _NAME_KINDS:
                    j += 1
                    if j < n and toks[j][0] == "op" and toks[j][1] == ",":
                        j += 1
                    else:
                        break
                matched = j - 1
            if _kw(j) == "NOWAIT":
                matched = j
            elif _kw(j) == "SKIP" and _kw(j + 1) == "LOCKED":
                matched = j + 1
            edits.append((start, toks[matched][3], ""))
            return matched + 1

    # Postgres @-family and root prefix operators (round 8; semantics
    # pinned live on PG 15): a @> b / a <@ b array containment —
    # SET-semantics with strict equality (ARRAY[NULL] @> ARRAY[NULL]
    # is FALSE; NULL operand → NULL; empty needle → TRUE), unary
    # @ = abs, |/ = sqrt, ||/ = cbrt (pg computes pow(x, 1/3.0);
    # sub-1e-6 float noise vs Spark's cbrt).
    # `&&` array-overlap lexes as two adjacent `&` tokens (round 9);
    # it shares the @>/<@ operand machinery below. Pinned live: NULL
    # elements never overlap ([1,NULL] && [NULL,2] = f), NULL operand
    # → NULL, empty → f. A lone `&` stays bitwise AND (pass-through).
    amp2 = (
        kind == "op" and text == "&"
        and i + 1 < n
        and toks[i + 1][0] == "op" and toks[i + 1][1] == "&"
        and toks[i + 1][2] == end
    )
    if read == "postgres" and (
        (kind == "op" and text in ("@>", "<@")) or amp2
    ):
        # operands may be ARRAY[...] constructors (which the generic
        # primary scanners don't span), with optional ::type[] / ::type
        # cast suffix chains, or ordinary primaries
        r0 = i + 2 if amp2 else i + 1
        lj = i - 1
        while True:
            if (
                lj >= 3
                and toks[lj][0] == "op" and toks[lj][1] == "]"
                and toks[lj - 1][0] == "op" and toks[lj - 1][1] == "["
                and toks[lj - 2][0] in _NAME_KINDS
                and toks[lj - 3][0] == "op" and toks[lj - 3][1] == "::"
            ):
                lj -= 4  # ...::type[] suffix
                continue
            if toks[lj][0] == "op" and toks[lj][1] == ">":
                # Spark generic type args: ...::ARRAY<INT> (re-read of
                # an already-converted cast on a later pass)
                depth_g = 0
                gj = None
                for j in range(lj, -1, -1):
                    if toks[j][0] == "op" and toks[j][1] == ">":
                        depth_g += 1
                    elif toks[j][0] == "op" and toks[j][1] == "<":
                        depth_g -= 1
                        if depth_g == 0:
                            gj = j
                            break
                if (
                    gj is not None
                    and gj >= 2
                    and toks[gj - 1][0] in _NAME_KINDS
                    and toks[gj - 2][0] == "op"
                    and toks[gj - 2][1] == "::"
                ):
                    lj = gj - 3
                    continue
            if (
                lj >= 2
                and toks[lj][0] in _NAME_KINDS
                and toks[lj - 1][0] == "op" and toks[lj - 1][1] == "::"
            ):
                lj -= 2  # ...::type suffix
                continue
            break
        lfirst = None
        if lj >= 0 and toks[lj][0] == "op" and toks[lj][1] == "]":
            depth = 0
            for j in range(lj, -1, -1):
                if toks[j][0] == "op" and toks[j][1] == "]":
                    depth += 1
                elif toks[j][0] == "op" and toks[j][1] == "[":
                    depth -= 1
                    if depth == 0:
                        if (
                            j >= 1
                            and toks[j - 1][0] in _NAME_KINDS
                            and toks[j - 1][1].upper() == "ARRAY"
                        ):
                            lfirst = j - 1
                        break
        elif lj >= 0:
            lfirst = _backward_primary(toks, lj, include_unary=False)
        rlast = None
        if (
            r0 + 1 < n
            and toks[r0][0] in _NAME_KINDS
            and toks[r0][1].upper() == "ARRAY"
            and is_op(r0 + 1, "[")
        ):
            depth = 0
            for j in range(r0 + 1, n):
                if toks[j][0] == "op" and toks[j][1] == "[":
                    depth += 1
                elif toks[j][0] == "op" and toks[j][1] == "]":
                    depth -= 1
                    if depth == 0:
                        rlast = j
                        break
        else:
            rspan = _forward_primary(toks, r0)
            rlast = rspan[1] if rspan is not None else None
        # absorb trailing ::type / ::type[] / ::ARRAY<...> cast
        # suffixes. The [] / <...> absorptions only apply when rlast
        # currently sits ON a ::-cast type name (never a subscript or
        # a comparison) — _forward_primary may already have consumed
        # the ::NAME, so check the backward shape, not loop state.
        while rlast is not None and rlast + 1 < n:
            t1 = toks[rlast + 1]
            if (
                t1[0] == "op" and t1[1] == "::"
                and rlast + 2 < n
                and toks[rlast + 2][0] in _NAME_KINDS
            ):
                rlast += 2
                continue
            on_cast_type = (
                toks[rlast][0] in _NAME_KINDS
                and rlast >= 1
                and toks[rlast - 1][0] == "op"
                and toks[rlast - 1][1] == "::"
            )
            if (
                on_cast_type
                and t1[0] == "op" and t1[1] == "["
                and rlast + 2 < n
                and toks[rlast + 2][0] == "op"
                and toks[rlast + 2][1] == "]"
            ):
                rlast += 2
                continue
            if on_cast_type and t1[0] == "op" and t1[1] == "<":
                depth_g = 0
                done_g = None
                for j in range(rlast + 1, n):
                    if toks[j][0] == "op" and toks[j][1] == "<":
                        depth_g += 1
                    elif toks[j][0] == "op" and toks[j][1] == ">":
                        depth_g -= 1
                        if depth_g == 0:
                            done_g = j
                            break
                if done_g is None:
                    break
                rlast = done_g
                continue
            break
        if lfirst is None or rlast is None:
            raise TranspileError(
                f"postgres {'&&' if amp2 else text} (array operator) "
                "needs recognizable operands to rewrite; parenthesize "
                "them"
            )
        rspan = (r0, rlast)
        ls, re_ = toks[lfirst][2], toks[rspan[1]][3]
        if "::json" in sql[ls:re_].lower():
            raise TranspileError(
                f"postgres jsonb {text} (document containment) has "
                "no Spark rewrite; test concrete paths with "
                "get_json_object instead"
            )
        if not any(e[1] >= ls and e[0] <= re_ for e in edits):
            a_ = sql[ls: toks[i][2]].rstrip()
            b_ = sql[toks[rspan[0]][2]: re_]
            if amp2:
                edits.append((
                    ls, re_,
                    f"IF(({a_}) IS NULL OR ({b_}) IS NULL, NULL, "
                    f"coalesce(arrays_overlap(({a_}), ({b_})), "
                    f"false))",
                ))
                i = rspan[1] + 1
                return i
            if text == "<@":
                a_, b_ = b_, a_
            edits.append((
                ls, re_,
                f"IF(({a_}) IS NULL OR ({b_}) IS NULL, NULL, "
                f"forall(({b_}), _e -> "
                f"coalesce(array_contains(({a_}), _e), false)))",
            ))
            i = rspan[1] + 1
            return i
        i += 1
        return i

    if read == "postgres" and kind == "op" and text in ("@", "|/", "||/"):
        # prefix position only (pg defines them as prefix operators):
        # start of expression, or right after an opener/operator/
        # keyword. Anywhere else pg itself rejects — loud.
        prev_ok = (
            i == 0
            or (toks[i - 1][0] == "op"
                and toks[i - 1][1] not in (")", "]"))
            or (toks[i - 1][0] in _NAME_KINDS
                and toks[i - 1][1].upper() in _NONCALLABLE_KEYWORDS)
        )
        rspan = _forward_primary(toks, i + 1)
        if not prev_ok or rspan is None:
            raise TranspileError(
                f"postgres prefix operator {text} needs a prefix "
                "position and a recognizable operand"
            )
        fn = {"@": "abs", "|/": "sqrt", "||/": "cbrt"}[text]
        re_ = toks[rspan[1]][3]
        if not any(e[1] >= start and e[0] <= re_ for e in edits):
            operand = sql[toks[rspan[0]][2]: re_]
            edits.append((start, re_, f"{fn}(({operand}))"))
            i = rspan[1] + 1
            return i
        i += 1
        return i

    # Postgres literal-castee seams (round 8): 'on'/'off'-family
    # boolean literals Spark rejects, '...'::interval literals,
    # '{...}'::type[] array literals, and bytea::text hex rendering.
    if read in ("postgres", "duckdb") and kind == "op" and text == "::":
        # duck reaches ONLY the ::interval branch inside (round 11);
        # the boolean-word and '{...}'::type[] branches stay pg-gated
        nxt = _pg_cast_seams(ctx)
        if nxt is not None:
            return nxt

    # pg row-source / literal constructs with no Spark spelling —
    # loud with guidance before a raw parse error (round 8)
    if read == "postgres" and kind == "ident":
        up_t = text.upper()
        if first_pass and i + 1 < n and toks[i + 1][0] == "string":
            # typed literals. TIMESTAMP 'lit' IGNORES a trailing zone
            # offset in pg (it's the zone-less type) while Spark
            # honors it — a silent instant shift; strip statically.
            # TIMESTAMPTZ 'lit' → TIMESTAMP_LTZ 'lit' (both honor the
            # offset). TIME literals are loud (no Spark TIME type).
            # pg-only typed-literal spellings (float8 '1', int4 '2',
            # bool 't', numeric '1.5'...) re-spell as '::' casts so
            # the cast machinery applies its pg semantics.
            if up_t == "TIMESTAMP":
                content = _literal_content(toks[i + 1][1], read)
                m_z = re.match(
                    r"^(\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}(?::\d{2}"
                    r"(?:\.\d+)?)?)\s*(?:[+-]\d{1,2}(?::\d{2}){0,2}"
                    r"|[A-Za-z]{2,}(?:/[A-Za-z_]+)+|UTC|GMT|[A-Z]{3,4})$",
                    content,
                )
                if m_z is not None:
                    ls, le = toks[i + 1][2], toks[i + 1][3]
                    if not any(e[1] >= ls and e[0] <= le for e in edits):
                        edits.append(
                            (ls, le,
                             _spark_string_literal(m_z.group(1), read))
                        )
                    i += 2
                    return i
            elif up_t == "TIMESTAMPTZ":
                edits.append((start, end, "TIMESTAMP_LTZ"))
                i += 2
                return i
            elif up_t in ("TIME", "TIMETZ"):
                raise TranspileError(
                    "postgres TIME literals have no Spark type; store "
                    "as STRING or seconds-since-midnight"
                )
            elif text.lower() in (
                "int2", "int4", "int8", "float4", "float8", "real",
                "bool", "boolean", "numeric", "decimal", "text",
                "varchar", "bytea", "json", "jsonb", "uuid",
                "smallint", "integer", "bigint",
            ):
                lit = toks[i + 1][1]
                if not any(
                    e[1] >= start and e[0] <= toks[i + 1][3]
                    for e in edits
                ):
                    edits.append(
                        (start, toks[i + 1][3],
                         f"({lit}::{text.lower()})")
                    )
                    i += 2
                    return i
        if (
            text.lower() == "unnest"
            and first_pass
            and is_op(i + 1, "(")
        ):
            # FROM unnest(arr) x — pg makes `x` BOTH the table and the
            # single column alias; Spark's explode names the column
            # `col`, so a bare alias needs the column list: x → x(x).
            # Select-position unnest keeps its alias as-is (there it
            # aliases the exploded column already).
            depth_b = 0
            in_from = False
            for j in range(i - 1, -1, -1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ == ")":
                    depth_b += 1
                elif k_ == "op" and t_ == "(":
                    depth_b -= 1
                    if depth_b < 0:
                        break
                elif depth_b == 0 and k_ == "ident":
                    u_ = t_.upper()
                    if u_ in ("FROM", "JOIN", "LATERAL"):
                        in_from = True
                        break
                    if u_ in ("SELECT", "WHERE", "ON", "GROUP",
                              "HAVING", "ORDER"):
                        break
            if in_from:
                close_u = _call_arg_spans(toks, i + 1)[1]
                j = close_u + 1
                if (
                    j < n
                    and toks[j][0] == "ident"
                    and toks[j][1].upper() == "AS"
                ):
                    j += 1
                if (
                    j < n
                    and toks[j][0] == "ident"
                    and toks[j][1].upper() not in _NONCALLABLE_KEYWORDS
                    and not is_op(j + 1, "(")
                ):
                    alias_t = toks[j][1]
                    edits.append(
                        (toks[j][3], toks[j][3], f"({alias_t})")
                    )
            # fall through: the rename map still maps unnest → explode

        if up_t == "LOCALTIMESTAMP" and not is_op(i + 1, "("):
            # pg niladic spelling; Spark needs the call parens
            edits.append((start, end, "localtimestamp()"))
            i += 1
            return i
        if (
            up_t == "MATERIALIZED"
            and i >= 1
            and toks[i - 1][0] in _NAME_KINDS
            and toks[i - 1][1].upper() in ("AS", "NOT")
        ):
            # WITH c AS [NOT] MATERIALIZED (...) — pg planner fence
            # hints with no Spark spelling and no semantic effect
            if toks[i - 1][1].upper() == "NOT":
                edits.append((toks[i - 1][2], end, ""))
            else:
                edits.append((start, end, ""))
            i += 1
            return i
        if (
            up_t == "EXCLUDE"
            and i + 1 < n
            and toks[i + 1][0] in _NAME_KINDS
            and toks[i + 1][1].upper() in ("CURRENT", "GROUP", "TIES", "NO")
        ):
            # window frame EXCLUDE clause (pg 11+): Spark frames have
            # no exclusion — loud before a raw parse error
            raise TranspileError(
                "window frame EXCLUDE clauses have no Spark analog; "
                "re-express by subtracting the excluded rows' "
                "contribution explicitly"
            )
        if up_t == "ORDINALITY":
            raise TranspileError(
                "UNNEST ... WITH ORDINALITY has no direct Spark "
                "form; use LATERAL VIEW posexplode(arr) AS pos, col "
                "(0-based — add 1 for pg's 1-based ordinality)"
            )
        if (
            up_t in ("B", "X")
            and i + 1 < n
            and toks[i + 1][0] == "string"
            and toks[i + 1][2] == end
        ):
            raise TranspileError(
                f"postgres {up_t}'...' bit-string literals have no "
                "Spark type; use integer literals and bitwise "
                "operators"
            )
        if up_t == "OPERATOR" and is_op(i + 1, "("):
            raise TranspileError(
                "postgres OPERATOR(schema.op) call syntax has no "
                "Spark form; write the operator directly"
            )

    # GROUPS window frames (pg 11+) have no Spark analog (Spark
    # supports ROWS and RANGE only) — loud before a raw parse error.
    # The PRECEDING/FOLLOWING/CURRENT-ROW lookahead keeps columns
    # named `groups` (e.g. `groups BETWEEN 1 AND 2`) out of the net.
    if (
        read == "postgres"
        and kind == "ident"
        and text.upper() == "GROUPS"
        and i + 1 < n
        and toks[i + 1][0] in _NAME_KINDS
        and toks[i + 1][1].upper() in ("BETWEEN", "UNBOUNDED", "CURRENT")
    ):
        look = " ".join(
            t[1].upper() for t in toks[i + 1: i + 9] if t[0] in _NAME_KINDS
        )
        if "PRECEDING" in look or "FOLLOWING" in look or "CURRENT ROW" in look:
            raise TranspileError(
                "GROUPS window frames have no Spark analog (Spark "
                "frames are ROWS or RANGE only); re-express with a "
                "RANGE frame or dense_rank buckets"
            )

    # pg exponent literals are NUMERIC (exact, arbitrary precision);
    # Spark types them DOUBLE — visible wherever the value is rendered
    # ('1e10'::text is '10000000000' in pg but '1.0E10' in Spark) or
    # precision matters. Expand statically to the plain decimal form.
    if (
        read == "postgres"
        and kind == "number"
        and first_pass
        and ("e" in text.lower())
        and not any(e[1] >= start and e[0] <= end for e in edits)
    ):
        try:
            from decimal import Decimal

            expanded = format(Decimal(text), "f")
        except ArithmeticError:
            expanded = None
        if expanded is not None and len(expanded) <= 64:
            if "." not in expanded and len(expanded.lstrip("-")) <= 38:
                # INTEGRAL exponent literals must stay NUMERIC-typed: a
                # bare digit expansion made `1e0 / 3` integer division
                # (0 instead of pg's 0.333…, round-9 numeric wave). A
                # DECIMAL(38,0) cast keeps exact arithmetic AND the
                # scale-0 rendering ('1e0'::text is '1' in pg — casting
                # the decimal to STRING renders '1', not '1.0').
                expanded = f"CAST({expanded} AS DECIMAL(38,0))"
            edits.append((start, end, expanded))
            i += 1
            return i

    # Postgres jsonb MUTATION/EXISTENCE operators the text walker
    # cannot faithfully rewrite — loud with guidance (extraction has
    # rewrites: ->> and #>>). `?`/`?|`/`?&` test key existence;
    # `#-` deletes a path; `||` MERGES objects and `-` deletes a key
    # when an operand is json(b)-typed — Spark `||` would silently
    # STRING-concat two jsonb casts ('{"a":1}{"b":2}'), the one
    # silent-wrong shape, so the cast-tail check guards it.
    if read == "postgres" and kind == "op":
        if text == "?":
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            if (
                nxt is not None
                and nxt[0] == "op"
                and nxt[1] in ("|", "&")
                and nxt[2] == end
            ):
                raise TranspileError(
                    f"postgres ?{nxt[1]} (jsonb any/all keys exist) "
                    "has no Spark rewrite; unfold into ORed/ANDed "
                    "single-key ? tests"
                )
            lspan = _backward_primary(toks, i - 1, include_unary=False)
            rspan = _forward_primary(toks, i + 1)
            if lspan is None or rspan is None:
                raise TranspileError(
                    "postgres ? (jsonb key exists) needs simple "
                    "operand expressions to transpile"
                )
            if any(
                e[1] >= toks[lspan][2] and e[0] <= toks[rspan[1]][3]
                for e in edits
            ):
                i += 1  # operand edited this pass; resolve next pass
                return i
            # jsonb ? text, pinned live (round 11, wave 46): object →
            # top-level KEY exists; array → STRING element exists
            # ([1,2] ? '1' is f — number elements never match, guarded
            # here by requiring the QUOTED form in the document text,
            # since Spark's from_json coerces numbers into
            # array<string>); scalar string → equality ('"a"' ? 'a'
            # is t); NULL operand → NULL. The three shapes coalesce:
            # from_json(map<string,string>) is NULL off-objects
            # (Spark's own json_object_keys can't appear here — the
            # pg read louds that NAME, pg's being set-returning),
            # from_json(array)+exists is NULL off-arrays. Known edge: a key/element whose
            # JSON-ESCAPED form differs from its raw text (quotes,
            # backslashes, control chars) can false-negative on the
            # array branch — rare enough to accept for the everyday
            # containment test.
            x = sql[toks[lspan][2]:toks[i - 1][3]].strip()
            rv = sql[toks[rspan[0]][2]:toks[rspan[1]][3]].strip()
            # trailing `= TRUE` is a semantic no-op (NULL/t/f map to
            # themselves) that lets the ::int castee boolean-shape
            # classifier (transpile_types) see a boolean — without it
            # (j ? 'k')::int would round()-wrap the IF and fail
            # analysis; the STRING cast on the key keeps a literal
            # NULL rhs analyzable in array_contains
            repl = (
                f"(IF(({x}) IS NULL OR ({rv}) IS NULL, NULL, coalesce("
                f"array_contains(map_keys(from_json(({x}), "
                f"'map<string,string>')), CAST(({rv}) AS STRING)), "
                f"exists(from_json(({x}), 'array<string>'), "
                f"_e -> _e = ({rv})) AND "
                f"instr(({x}), '\"' || ({rv}) || '\"') > 0, "
                f"(ltrim(({x})) LIKE '\"%') AND "
                f"get_json_object(({x}), '$') = ({rv}), "
                f"false)) = TRUE)"
            )
            edits.append((toks[lspan][2], toks[rspan[1]][3], repl))
            return rspan[1] + 1
        if text in ("||", "-") and first_pass:
            def _json_cast_tail(li: int) -> bool:
                # ...::json(b) — bare or wrapped in one paren level
                if (
                    li >= 2
                    and toks[li][0] in _NAME_KINDS
                    and toks[li][1].lower() in ("json", "jsonb")
                    and toks[li - 1][0] == "op"
                    and toks[li - 1][1] == "::"
                ):
                    return True
                return (
                    li >= 3
                    and toks[li][0] == "op"
                    and toks[li][1] == ")"
                    and toks[li - 1][0] in _NAME_KINDS
                    and toks[li - 1][1].lower() in ("json", "jsonb")
                    and toks[li - 2][0] == "op"
                    and toks[li - 2][1] == "::"
                )
            jsonish = i >= 1 and _json_cast_tail(i - 1)
            if not jsonish:
                rspan = _forward_primary(toks, i + 1)
                jsonish = rspan is not None and _json_cast_tail(rspan[1])
            if jsonish:
                raise TranspileError(
                    f"postgres jsonb {text} "
                    + ("(object merge) has no Spark rewrite — Spark "
                       "|| would silently string-concatenate the "
                       "casts" if text == "||"
                       else "(key/element delete) has no Spark "
                       "rewrite")
                    + "; restructure with map/named_struct functions "
                    "or extract fields"
                )
        if (
            text == "::"
            and first_pass
            and i + 1 < n
            and toks[i + 1][0] in _NAME_KINDS
            and toks[i + 1][1].lower() in (
                "text", "varchar", "string", "char", "character",
                "bpchar",
            )
        ):
            # interval → text renders '3 days' in pg but
            # 'INTERVAL '3 00:00:00' DAY TO SECOND' in Spark — a
            # silent FORMAT divergence. Loud for the statically
            # interval-typed castee shapes: a ::interval chain tail,
            # a make_interval() call, an INTERVAL literal, or a
            # parenthesized expression whose only identifiers are
            # INTERVAL keywords (interval arithmetic stays interval).
            iv_typed = (
                i >= 2
                and toks[i - 1][0] in _NAME_KINDS
                and toks[i - 1][1].lower() == "interval"
                and toks[i - 2][0] == "op"
                and toks[i - 2][1] == "::"
            ) or (
                i >= 2
                and toks[i - 1][0] == "string"
                and toks[i - 2][0] in _NAME_KINDS
                and toks[i - 2][1].upper() == "INTERVAL"
            )
            if not iv_typed and i > 0:
                lf = _backward_primary(toks, i - 1, include_unary=True)
                if (
                    lf is not None
                    and toks[lf][0] == "op"
                    and toks[lf][1] == "("
                ):
                    inner = toks[lf + 1: i - 1]
                    idents = [
                        t for t in inner if t[0] in _NAME_KINDS
                    ]
                    iv_typed = bool(idents) and all(
                        t[1].upper() == "INTERVAL" for t in idents
                    )
                    if not iv_typed:
                        # (TIMESTAMP 'a' - TIMESTAMP 'b') is also
                        # interval-typed (pg renders '1 day 06:00:00')
                        iv_typed = (
                            len(idents) >= 2
                            and all(t[1].upper() == "TIMESTAMP"
                                    for t in idents)
                            and any(t[0] == "op" and t[1] == "-"
                                    for t in inner)
                        )
                elif (
                    lf is not None
                    and toks[lf][0] in _NAME_KINDS
                    and toks[lf][1].lower() == "make_interval"
                ):
                    iv_typed = True
            if iv_typed:
                raise TranspileError(
                    "postgres interval::text renders '3 days' where "
                    "Spark renders 'INTERVAL ...' — no faithful "
                    "rewrite; extract(epoch ...) or format the fields "
                    "explicitly"
                )
    return None


#: pg boolean literal words (DecodeBoolean accepts unique PREFIXES of
#: these, plus '1'/'0' exactly); Spark's string→boolean cast accepts
#: only t/f/y/n/true/false/yes/no/0/1 — the difference set rewrites.
_PG_BOOL_WORDS = (("true", True), ("false", False), ("yes", True),
                  ("no", False), ("on", True), ("off", False))
_SPARK_BOOL_OK = frozenset(
    ("t", "f", "y", "n", "true", "false", "yes", "no", "0", "1")
)

#: '{...}'::type[] element-type spellings → Spark element types
_PG_ARRAY_ELEM_TYPES = {
    "int": "INT", "int4": "INT", "integer": "INT",
    "smallint": "SMALLINT", "int2": "SMALLINT",
    "bigint": "BIGINT", "int8": "BIGINT",
    "real": "FLOAT", "float4": "FLOAT", "float8": "DOUBLE",
    "text": "STRING", "varchar": "STRING",
    "boolean": "BOOLEAN", "bool": "BOOLEAN",
    "date": "DATE",
}

_PG_NUMBER_RE = re.compile(r"^[+-]?\d+(\.\d+)?$")


def _pg_bool_of(content: str) -> "bool | None":
    """pg's string→boolean parse (trimmed, case-insensitive, unique
    word prefixes; '1'/'0' exact). None = pg itself rejects."""
    c = content.strip().lower()
    if c in ("1", "0"):
        return c == "1"
    if not c:
        return None
    hits = [v for w, v in _PG_BOOL_WORDS if w.startswith(c)]
    # 'o' prefixes both on and off — ambiguous, pg rejects;
    # 'n'/'no' prefix only no; 'y' only yes; 't' true; 'f' false
    vals = set(hits)
    return hits[0] if len(vals) == 1 else None


def _pg_cast_seams(ctx) -> "int | None":
    """Literal-castee `::` seams (round 8, probed live on PG 15):
    boolean words Spark rejects ('on'/'off'/prefix forms),
    '...'::interval literals → Spark INTERVAL literals, '{...}'::type[]
    array literals → array(...) constructors, and bytea::text → pg's
    '\\x' hex rendering. Returns the next scan index after an edit,
    None to fall through."""
    toks, edits, sql, read = ctx.toks, ctx.edits, ctx.sql, ctx.read
    i = ctx.i
    n = len(toks)
    if i + 1 >= n or i == 0 or toks[i + 1][0] not in _NAME_KINDS:
        return None
    tname = toks[i + 1][1].lower()
    prev = toks[i - 1]

    if (
        read == "postgres"
        and tname in ("boolean", "bool")
        and prev[0] == "string"
        and not (
            i + 2 < n
            and toks[i + 2][0] == "op"
            and toks[i + 2][1] == "["
        )  # '{...}'::boolean[] is the ARRAY literal branch below
    ):
        content = _literal_content(prev[1], read)
        val = _pg_bool_of(content)
        if val is not None and content.strip().lower() not in _SPARK_BOOL_OK:
            ls, le = prev[2], toks[i + 1][3]
            if not any(e[1] >= ls and e[0] <= le for e in edits):
                edits.append((ls, le, "TRUE" if val else "FALSE"))
                return i + 2
        return None  # Spark-acceptable (or pg-rejected) — pass through

    if tname == "interval" and prev[0] == "string":
        # duck included (round 11): same literal grammar and spilling,
        # same Spark INTERVAL-literal re-emission
        content = _literal_content(prev[1], read)
        parts = _pg_interval_parts(content)
        if parts is None:
            raise TranspileError(
                f"{read} ::interval literal {content!r} is not "
                "statically parseable — use verbose units, hh:mm:ss "
                "or ISO-8601"
            )
        months, days, micros = parts
        if months and (days or micros):
            # mixed families (incl. fraction spilling: '1.5 months' →
            # 1 mon 15 days) — make_interval, same as the INTERVAL
            # literal path (round 11; previously loud)
            secs_ = micros / 1_000_000
            secs_txt_ = f"{secs_:.6f}".rstrip("0").rstrip(".") or "0"
            if secs_txt_ in ("", "-0"):
                secs_txt_ = "0"
            repl = (
                f"make_interval(0, {months}, 0, {days}, 0, 0, "
                f"{secs_txt_})"
            )
        elif months:
            repl = f"INTERVAL '{months}' MONTH"
        elif micros:
            total = days * 86_400_000_000 + micros
            repl = f"INTERVAL '{total}' MICROSECOND"
        else:
            repl = f"INTERVAL '{days}' DAY"
        ls, le = prev[2], toks[i + 1][3]
        if not any(e[1] >= ls and e[0] <= le for e in edits):
            edits.append((ls, le, repl))
            return i + 2
        return None

    if read != "postgres":
        # duck reaches only the ::interval branch above; the array/
        # bytea/text-rendering seams below are pg semantics (duck
        # casts blob→varchar to the RAW bytes, exactly Spark's CAST)
        return None

    if (
        read == "postgres"
        and tname in _PG_ARRAY_ELEM_TYPES
        and prev[0] == "string"
        and i + 3 < n
        and toks[i + 2][0] == "op"
        and toks[i + 2][1] == "["
        and toks[i + 3][0] == "op"
        and toks[i + 3][1] == "]"
    ):
        spark_t = _PG_ARRAY_ELEM_TYPES[tname]
        content = _literal_content(prev[1], read).strip()
        if not (content.startswith("{") and content.endswith("}")):
            raise TranspileError(
                "postgres array literal casts need '{...}' text"
            )
        inner = content[1:-1].strip()
        if any(c in inner for c in "{}\\"):
            raise TranspileError(
                "postgres array literals with nesting or escapes "
                "have no static rewrite; use ARRAY[...] constructors"
            )
        elems = []
        ok = True
        if inner:
            for raw in inner.split(","):
                e = raw.strip()
                if not e:
                    ok = False
                    break
                if e.startswith('"') and e.endswith('"') and len(e) >= 2:
                    e_in = e[1:-1]
                    if '"' in e_in:
                        ok = False
                        break
                    elems.append(_spark_string_literal(e_in, read))
                elif e.upper() == "NULL":
                    elems.append("NULL")
                elif spark_t == "STRING":
                    elems.append(_spark_string_literal(e, read))
                elif spark_t == "BOOLEAN":
                    b = _pg_bool_of(e)
                    if b is None:
                        ok = False
                        break
                    elems.append("TRUE" if b else "FALSE")
                elif spark_t == "DATE":
                    elems.append(f"DATE {_spark_string_literal(e, read)}")
                elif _PG_NUMBER_RE.match(e):
                    elems.append(e)
                else:
                    ok = False
                    break
        if not ok:
            raise TranspileError(
                f"postgres array literal {content!r} has elements "
                "with no static rewrite; use ARRAY[...] constructors"
            )
        repl = f"CAST(array({', '.join(elems)}) AS ARRAY<{spark_t}>)"
        ls, le = prev[2], toks[i + 3][3]
        if not any(e[1] >= ls and e[0] <= le for e in edits):
            edits.append((ls, le, repl))
            return i + 4
        return None

    if read == "postgres" and tname == "bytea" and prev[0] == "string":
        # pg bytea INPUT syntax: '\x...' is hex (the default output
        # form round-trips); anything with a backslash is the legacy
        # octal-escape format. A plain-text literal's UTF-8 bytes
        # match Spark's CAST(string AS BINARY) exactly.
        content = _literal_content(prev[1], read)
        if content.startswith("\\x"):
            hexpart = content[2:]
            if (
                len(hexpart) % 2 == 0
                and all(c in "0123456789abcdefABCDEF" for c in hexpart)
            ):
                ls, le = prev[2], toks[i + 1][3]
                if not any(e[1] >= ls and e[0] <= le for e in edits):
                    edits.append(
                        (ls, le,
                         f"unhex({_spark_string_literal(hexpart, read)})")
                    )
                    return i + 2
                return None
            raise TranspileError(
                f"postgres bytea hex literal {content!r} is malformed"
            )
        if "\\" in content:
            raise TranspileError(
                "postgres bytea octal-escape literals have no Spark "
                "rewrite; use the '\\x...' hex form"
            )
        return None  # plain text: CAST(.. AS BINARY) is byte-exact

    if (
        tname in ("text", "varchar", "string", "bpchar")
        and i >= 2
        and toks[i - 1][0] == "op"
        and toks[i - 1][1] == ")"
    ):
        # binary-RETURNING call cast to text: pg renders bytea as
        # '\x<hex>'; Spark CAST(BINARY AS STRING) yields the raw
        # bytes — rewrite the statically visible producers (decode
        # and our own unbase64/unhex emissions)
        lf = _backward_primary(toks, i - 1, include_unary=False)
        if (
            lf is not None
            and toks[lf][0] in _NAME_KINDS
            and toks[lf][1].lower() in ("decode", "unbase64", "unhex")
        ):
            ls, le = toks[lf][2], toks[i + 1][3]
            if not any(e[1] >= ls and e[0] <= le for e in edits):
                castee = sql[ls: toks[i][2]]
                edits.append(
                    (ls, le,
                     f"concat('\\\\x', lower(hex(({castee}))))")
                )
                return i + 2
            return None

    if tname in ("text", "varchar", "string", "bpchar") and i >= 1:
        # float → text RENDERING diverges: Spark prints Java
        # Double.toString ('1.0', '1.0E10') where pg prints the
        # shortest exact form ('1', '10000000000') — every
        # whole-number double differs. Loud for statically
        # float-typed castees; float COLUMNS remain statically
        # invisible (same residual as the bround() rounding seam).
        lf_f = _backward_primary(toks, i - 1, include_unary=True)
        if lf_f is not None and _float_typed_castee(toks, lf_f, i - 1):
            raise TranspileError(
                "float → text rendering differs (Spark '1.0'/'1.0E10' "
                "vs pg '1'/'10000000000'); format explicitly with "
                "format_string or round to a numeric first"
            )

    if (
        tname in ("text", "varchar", "string", "bpchar")
        and i >= 3
        and toks[i - 1][0] in _NAME_KINDS
        and toks[i - 1][1].lower() in ("bytea", "binary")
        and toks[i - 2][0] == "op"
        and toks[i - 2][1] == "::"
    ):
        # bytea::text renders pg's hex form '\x6162...' (bytea_output
        # = hex, the default since 9.0); Spark CAST(BINARY AS STRING)
        # would yield the raw bytes — a silent divergence
        lf = _backward_primary(toks, i - 1, include_unary=False)
        if lf is None:
            return None
        ls, le = toks[lf][2], toks[i + 1][3]
        if not any(e[1] >= ls and e[0] <= le for e in edits):
            castee = sql[ls: toks[i][2]]
            edits.append(
                (ls, le,
                 f"concat('\\\\x', lower(hex(({castee}))))")
            )
            return i + 2
        return None

    return None
