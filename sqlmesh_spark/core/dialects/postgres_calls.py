"""Postgres-specific CALL handlers (the round-7 pg function seams:
num_nonnulls/num_nulls unfolds, format -> format_string, array_prepend
-> array_insert, array_replace, quote_ident family, substring-from-
regex, string_agg ORDER BY -> listagg WITHIN GROUP, string_to_array('')
and friends). Pre-split code verbatim; dispatched from
standard.call_handlers at the exact position the section occupied, so
handler order is unchanged. Token-level pg handlers live in
core/dialects/postgres.py.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _call_arg_spans,
    _require_spark4,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _pg_regex_substring_emit,
    _regex_literal,
    _spark_string_literal,
    convert_posix_classes,
)

_unused_imports = (_NAME_KINDS,)


def call_handlers(ctx) -> "int | None":
    """Round-7 pg call handlers, dispatched from standard.call_handlers
    at the exact position the section occupied (order unchanged)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, start, end, first_pass, is_op,
               _arg_text, transpile, n)

    # ---- Postgres-specific handlers (round 7, each found by the
    # live-PG differential fuzz harness tests/test_dialect_fuzz_pg.py)
    if read == "postgres" and first_pass:
        if name in ("num_nonnulls", "num_nulls"):
            # variadic NULL counters — unfold into an IF-sum (each arg
            # referenced exactly once; args may have mixed types, so an
            # array() fold is not an option)
            spans, close = _call_arg_spans(toks, i + 1)
            if not spans:
                raise TranspileError(f"{name} takes at least one argument")
            pred = "IS NOT NULL" if name == "num_nonnulls" else "IS NULL"
            parts = [
                f"(CASE WHEN ({_arg_text(sp)}) {pred} THEN 1 ELSE 0 END)"
                for sp in spans
            ]
            edits.append((start, toks[close][3], "(" + " + ".join(parts) + ")"))
            return close + 1
        if name == "format":
            # pg format() is exact only for %s/%% directives (with
            # explicit argument positions loud): %I/%L quote
            # identifiers/literals — no Spark analog. pg %s renders
            # NULL as '' where Java's format_string prints "null" —
            # each argument gets a coalesce(CAST(.. AS STRING), '').
            spans, close = _call_arg_spans(toks, i + 1)
            ftok = toks[spans[0][0]] if spans else None
            if (
                ftok is None
                or spans[0][0] != spans[0][1]
                or ftok[0] != "string"
            ):
                raise TranspileError(
                    "postgres format() needs a literal format string "
                    "to transpile"
                )
            fmt = _literal_content(ftok[1], read)
            if re.search(r"%[^s%]", fmt) or fmt.endswith("%"):
                raise TranspileError(
                    "postgres format() directives other than %s/%% "
                    "(%I identifier / %L literal quoting, positional "
                    "%n$) have no Spark rewrite"
                )
            args = ", ".join(
                f"coalesce(CAST(({_arg_text(sp)}) AS STRING), '')"
                for sp in spans[1:]
            )
            fmt_lit = _spark_string_literal(fmt, read)
            edits.append(
                (start, toks[close][3],
                 f"format_string({fmt_lit}{', ' + args if args else ''})")
            )
            return close + 1
        if name in ("array_prepend", "list_prepend"):
            # pg/duckdb take (element, array); Spark array_prepend
            # takes (array, element) — a pure swap would re-swap on the
            # next pass, so emit array_insert(arr, 1, elem) instead
            spans, close = _call_arg_spans(toks, i + 1)
            if len(spans) != 2:
                raise TranspileError(f"{name} takes (element, array)")
            edits.append(
                (start, toks[close][3],
                 f"array_insert(({_arg_text(spans[1])}), 1, "
                 f"({_arg_text(spans[0])}))")
            )
            return close + 1
        if name == "array_replace":
            # transform with a null-safe comparison: pg array_replace
            # also replaces NULL elements when `from` is NULL
            spans, close = _call_arg_spans(toks, i + 1)
            if len(spans) != 3:
                raise TranspileError("array_replace takes (array, from, to)")
            edits.append(
                (start, toks[close][3],
                 f"transform(({_arg_text(spans[0])}), _x -> "
                 f"if(_x <=> ({_arg_text(spans[1])}), "
                 f"({_arg_text(spans[2])}), _x))")
            )
            return close + 1
        if name in ("quote_ident", "quote_literal", "quote_nullable"):
            raise TranspileError(
                f"postgres {name}() quotes conditionally (keyword and "
                "character checks) — no Spark rewrite"
            )

    if (
        name == "string_to_array"
        and read == "postgres"
        and first_pass
    ):
        # pg string_to_array('') is an EMPTY array; Spark split('', p)
        # (and duckdb string_split) give ['']. Bind the source once and
        # branch; the separator converts to the escaped-regex split()
        # form INLINE (the shared handler below is first_pass-gated, so
        # an emitted inner string_to_array would never convert). The
        # 3-arg form's null_string maps matching elements to NULL
        # (never NULL-matches when null_string itself is NULL — split
        # produces no NULL elements, so <=> reproduces pg exactly).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) in (2, 3):
            sep_first, sep_last = spans[1]
            if not (sep_first == sep_last and toks[sep_first][0] == "string"):
                raise TranspileError(
                    "string_to_array separator must be a literal to "
                    "transpile (Spark split() treats it as a regex)"
                )
            s_ = _arg_text(spans[0])
            sep_lit = _regex_literal(
                _literal_content(toks[sep_first][1], read), read
            )
            split_expr = f"split(_t._ss, {sep_lit})"
            if len(spans) == 3:
                ns_ = _arg_text(spans[2])
                split_expr = (
                    f"transform({split_expr}, "
                    f"_x -> IF(_x <=> ({ns_}), NULL, _x))"
                )
            edits.append(
                (start, toks[close][3],
                 f"element_at(transform(array(struct(({s_}) AS _ss)), "
                 f"_t -> CASE WHEN _t._ss = '' THEN "
                 f"CAST(array() AS ARRAY<STRING>) ELSE "
                 f"{split_expr} END), 1)")
            )
            return close + 1

    if (
        name == "substring"
        and read == "postgres"
        and first_pass
        and is_op(i + 1, "(")
    ):
        # substring(s FROM 'pattern') / substring(s, 'pattern') — the
        # pg POSIX-regex form (a STRING second operand; the positional
        # form takes numbers). Returns group 1 when the pattern
        # captures, else the whole match; NULL when no match (Spark
        # regexp_extract gives '' — nullif). A pattern matching the
        # EMPTY string diverges (pg '' vs NULL here) — documented, no
        # non-matching shape.
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 2
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] == "string"
        ):
            pat = _literal_content(toks[spans[1][0]][1], read)
            edits.append(
                (start, toks[close][3],
                 _pg_regex_substring_emit(_arg_text(spans[0]), pat, read))
            )
            return close + 1
        if len(spans) == 1:
            sp = spans[0]
            from_idx = None
            depth = 0
            for j in range(sp[0], sp[1] + 1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                elif depth == 0 and k_ == "ident" and t_.upper() == "FROM":
                    from_idx = j
                    break
            if (
                from_idx is not None
                and from_idx + 1 == sp[1]
                and toks[sp[1]][0] == "string"
            ):
                pat = _literal_content(toks[sp[1]][1], read)
                s_text = sql[toks[sp[0]][2]: toks[from_idx][2]]
                edits.append(
                    (start, toks[close][3],
                     _pg_regex_substring_emit(s_text.rstrip(), pat, read))
                )
                return close + 1

    if (
        name == "string_agg"
        and read in ("duckdb", "postgres")
        and first_pass
    ):
        # string_agg(expr, sep ORDER BY k) — the rename below maps the
        # plain form to listagg (Spark 4); an in-args ORDER BY must
        # move into WITHIN GROUP (ORDER BY k), Spark's spelling.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            sp = spans[1]
            ob_idx = None
            depth = 0
            for j in range(sp[0], sp[1] + 1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                elif (
                    depth == 0 and k_ == "ident" and t_.upper() == "ORDER"
                    and j + 1 <= sp[1]
                    and toks[j + 1][0] == "ident"
                    and toks[j + 1][1].upper() == "BY"
                ):
                    ob_idx = j
                    break
            if ob_idx is not None:
                _require_spark4("string_agg", "listagg")
                order_text = sql[toks[ob_idx][2]: toks[sp[1]][3]]
                edits.append((start, end, "listagg"))
                # drop the ORDER BY from the arg list (and the space
                # before it), re-attach as WITHIN GROUP
                edits.append((toks[ob_idx - 1][3], toks[sp[1]][3], ""))
                edits.append(
                    (toks[close][3], toks[close][3],
                     f" WITHIN GROUP ({order_text})")
                )
                return close + 1

    return None
