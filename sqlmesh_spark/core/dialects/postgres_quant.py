"""Postgres quantified-comparison tier (round-11 split out of
postgres.py for the module-size convention): IS [NOT] NORMALIZED
louds, LIKE/ILIKE ANY|ALL over array-literal pattern lists, and the
ANY/ALL/SOME operator-quantified comparisons over arrays/subqueries
(membership, forall lambdas, array-literal TEXT decoding).  Handler
bodies moved VERBATIM; dispatched from postgres.token_handlers at the
original scan position, so ordering and read gates are unchanged (the
round-8 split-regression class: the dispatch call is read-ungated
because every branch here re-checks read == "postgres" itself).
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _NONCALLABLE_KEYWORDS,
    _backward_primary,
    _call_arg_spans,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _spark_string_literal,
)


def token_handlers(ctx) -> "int | None":
    """Quantifier tier; see module docstring."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i = ctx.i
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, first_pass, end, transpile, n)

    if (
        read == "postgres"
        and kind == "ident"
        and text.upper() == "NORMALIZED"
        and i >= 1
        and toks[i - 1][0] in _NAME_KINDS
        and toks[i - 1][1].upper() in ("IS", "NOT", "NFC", "NFD",
                                       "NFKC", "NFKD")
    ):
        # `x IS [NOT] [form] NORMALIZED` — Unicode normalization
        # tests have no Spark builtin (same ceiling as normalize());
        # the passthrough was a bare parse error (round 11)
        raise TranspileError(
            "postgres IS [NOT] NORMALIZED has no Spark analog "
            "(no Unicode normal-form builtin); normalize upstream "
            "or with a pandas UDF"
        )

    # Postgres LIKE/ILIKE ANY|ALL (ARRAY[...]) — pg quantifies ANY
    # operator over arrays; Spark's LIKE ANY/ALL wants a bare pattern
    # LIST (`LIKE ALL ('a%', '%c')` — the array(...) emission was a
    # DATATYPE_MISMATCH, round 11).  Literal-element constructors
    # rewrite to the list form; dynamic arrays stay loud.  The
    # [NOT] LIKE prefix itself is untouched (same meaning both sides).
    if (
        read == "postgres"
        and kind == "ident"
        and text.upper() in ("ANY", "ALL", "SOME")
        and is_op(i + 1, "(")
        and i >= 2
        and toks[i - 1][0] in _NAME_KINDS
        and toks[i - 1][1].upper() in ("LIKE", "ILIKE")
    ):
        spans_l, close_l = _call_arg_spans(toks, i + 1)
        if spans_l and all(
            sp[0] == sp[1] and toks[sp[0]][0] == "string"
            for sp in spans_l
        ):
            # already the Spark bare-pattern-list emission (our own
            # rewrite below) — consume so fixpoint re-reads stay inert
            return close_l + 1
        lits: "list[str] | None" = None
        if len(spans_l) == 1:
            s0, s1 = spans_l[0]
            if (
                toks[s0][0] in _NAME_KINDS
                and toks[s0][1].upper() == "ARRAY"
                and s0 + 1 < s1
                and toks[s0 + 1][0] == "op"
                and toks[s0 + 1][1] in ("[", "(")
                and toks[s1][0] == "op"
                and toks[s1][1] in ("]", ")")
            ):
                # elements between the constructor's brackets: each
                # depth-1 comma-separated item must be ONE string
                # token (_call_arg_spans only walks parens, so the
                # ARRAY[...] form parses manually)
                items = []
                j, okc = s0 + 2, True
                while j < s1 and okc:
                    if toks[j][0] == "string" and (
                        j + 1 == s1
                        or (toks[j + 1][0] == "op"
                            and toks[j + 1][1] == ",")
                    ):
                        items.append(toks[j][1])
                        j += 2
                    else:
                        okc = False
                if okc and items:
                    lits = [
                        _spark_string_literal(
                            _literal_content(lit, read), read
                        )
                        for lit in items
                    ]
        if lits is None:
            raise TranspileError(
                f"postgres LIKE {text.upper()}(...) transpiles only "
                "over an inline ARRAY[...] of pattern literals "
                "(Spark's LIKE ANY/ALL takes a bare pattern list)"
            )
        target = "ANY" if text.upper() in ("ANY", "SOME") else "ALL"
        edits.append(
            (start, toks[close_l][3],
             f"{target} ({', '.join(lits)})")
        )
        return close_l + 1

    # Postgres quantified comparisons over ARRAYS: x = ANY(arr) →
    # membership (array_contains), x = ALL(arr) → forall with an
    # equality lambda, and every other comparison operator (<> !=
    # < > <= >=) → exists/forall with the operator in the lambda
    # (SOME is pg's ANY synonym). All keep SQL three-valued NULL
    # semantics exactly — verified live against PostgreSQL 15:
    # Spark exists/forall return NULL when undetermined (1 >
    # ANY(ARRAY[2,NULL]) → NULL both engines, empty array → false/
    # true, NULL array → NULL). SUBQUERY operands: = ANY(SELECT..)
    # keeps its Spark meaning (valid IN-style Spark); the OTHER
    # operators over subqueries have no Spark form → loud with the
    # EXISTS-rewrite guidance.
    if (
        read == "postgres"
        and kind == "ident"
        and text.upper() in ("ANY", "ALL", "SOME")
        and is_op(i + 1, "(")
        and i >= 2
        and toks[i - 1][0] == "op"
        and toks[i - 1][1] in ("=", "<>", "!=", "<", ">", "<=", ">=")
    ):
        cmp_op = toks[i - 1][1]
        if (
            i + 2 < n
            and toks[i + 2][0] == "ident"
            and toks[i + 2][1].upper() == "SELECT"
        ):
            # Spark has no quantified subqueries, and ANY( parses as
            # the any() aggregate → a confusing parse error. The two
            # forms with exact IN equivalents rewrite (pg docs define
            # IN as = ANY and NOT IN as <> ALL, three-valued NULL
            # semantics included); the rest stay loud with guidance.
            up = text.upper()
            if cmp_op == "=" and up in ("ANY", "SOME"):
                edits.append((toks[i - 1][2], toks[i][3], "IN"))
                i += 1
                return i
            if cmp_op in ("<>", "!=") and up == "ALL":
                edits.append((toks[i - 1][2], toks[i][3], "NOT IN"))
                i += 1
                return i
            raise TranspileError(
                f"postgres {cmp_op} {up}(SELECT ...) has "
                "no Spark quantified-subquery form; rewrite as "
                "EXISTS (SELECT 1 FROM ... WHERE x "
                f"{cmp_op} col) or aggregate to min/max"
            )
        lfirst = _backward_primary(toks, i - 2, include_unary=True)
        spans_q, close_q = _call_arg_spans(toks, i + 1)
        if lfirst is None or len(spans_q) != 1:
            raise TranspileError(
                f"postgres {cmp_op} {text.upper()}(...) needs a "
                "recognizable left operand to rewrite"
            )
        # the primary must BE the whole left operand of `=`: a
        # tighter-binding operator before it (|| + - * / etc.)
        # means the real LHS is a larger expression and a
        # primary-level splice would rewrite the wrong operand
        if not (
            lfirst == 0
            or (toks[lfirst - 1][0] == "op"
                and toks[lfirst - 1][1] in ("(", ",", "["))
            or (toks[lfirst - 1][0] in _NAME_KINDS
                and toks[lfirst - 1][1].upper()
                in _NONCALLABLE_KEYWORDS)
        ):
            raise TranspileError(
                f"postgres {cmp_op} {text.upper()}(...) with an "
                "operator chain on the left has no scoped one-pass "
                "rewrite; parenthesize the left operand"
            )
        ls = toks[lfirst][2]
        arr_text = _arg_text(spans_q[0])
        if (
            spans_q[0][0] == spans_q[0][1]
            and toks[spans_q[0][0]][0] == "string"
        ):
            # pg array-literal TEXT ('{1,2}' — implicit unknown-type
            # cast): decode statically; the raw string would reach
            # array_contains as a STRING and fail analysis (round 11).
            # Unquoted numeric elements stay numeric (pg casts by the
            # LHS type); quoted or bare-word elements become strings;
            # bare NULL is NULL; nested arrays are loud.
            body_ = _literal_content(
                toks[spans_q[0][0]][1], read
            ).strip()
            if not (body_.startswith("{") and body_.endswith("}")):
                raise TranspileError(
                    f"postgres {cmp_op} {text.upper()}('...') needs "
                    "an array; the string is not a {...} array literal"
                )
            inner_ = body_[1:-1].strip()
            if "{" in inner_ or "}" in inner_:
                raise TranspileError(
                    "nested pg array literals have no 1-D Spark form"
                )
            elems_: list[str] = []
            cur = []
            in_q = False
            k2 = 0
            while k2 < len(inner_):
                c2 = inner_[k2]
                if in_q:
                    if c2 == "\\" and k2 + 1 < len(inner_):
                        cur.append(inner_[k2 + 1]); k2 += 2; continue
                    if c2 == '"':
                        in_q = False
                    else:
                        cur.append(c2)
                elif c2 == '"':
                    in_q = True
                    cur.append("\x00")  # quoted marker
                elif c2 == ",":
                    elems_.append("".join(cur)); cur = []
                else:
                    cur.append(c2)
                k2 += 1
            if cur or elems_:
                elems_.append("".join(cur))
            parts_ = []
            for e_ in elems_:
                quoted_ = "\x00" in e_
                e_ = e_.replace("\x00", "").strip() if not quoted_ \
                    else e_.replace("\x00", "")
                if not quoted_ and e_.upper() == "NULL":
                    parts_.append("NULL")
                elif not quoted_ and re.fullmatch(
                    r"[+-]?\d+(\.\d+)?", e_
                ):
                    parts_.append(e_)
                else:
                    parts_.append(_spark_string_literal(e_, read))
            arr_text = "array(" + ", ".join(parts_) + ")"
        lhs_text = sql[ls: toks[i - 2][3]]
        if not any(e[1] >= ls and e[0] <= toks[close_q][3] for e in edits):
            is_any = text.upper() in ("ANY", "SOME")
            if cmp_op == "=" and is_any:
                rewritten = f"array_contains(({arr_text}), ({lhs_text}))"
            elif cmp_op == "=":
                rewritten = (
                    f"forall(({arr_text}), _e -> _e = ({lhs_text}))"
                )
            elif is_any:
                rewritten = (
                    f"exists(({arr_text}), "
                    f"_e -> ({lhs_text}) {cmp_op} _e)"
                )
            else:
                rewritten = (
                    f"forall(({arr_text}), "
                    f"_e -> ({lhs_text}) {cmp_op} _e)"
                )
            edits.append((ls, toks[close_q][3], rewritten))
            i = close_q + 1
            return i
        i += 1
        return i

    return None
