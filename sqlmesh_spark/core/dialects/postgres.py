"""Postgres read-dialect token handlers (pre-split code, verbatim).

Moved out of core/transpile.py / dialects/standard.py (round 8,
restoring the round-6 module discipline): token_handlers covers
literal integer division -> DIV, DISTINCT ON, TABLESAMPLE, SIMILAR TO,
array-element ||, quantified comparisons (ANY/ALL/SOME), OVERLAPS/
COLLATE louds, DATE literal subtraction, the regex operator family
(~ ~* !~ !~* ~~ !~~), # XOR, #> / #>> jsonb paths; call_handlers the
round-7 pg function seams. Bodies unchanged (continue -> return i).
ref: reference delegates pg semantics to SQLGlot (sqlmesh/core/
dialect.py); this module is the Spark-first equivalent."""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _NONCALLABLE_KEYWORDS,
    _backward_primary,
    _call_arg_spans,
    _forward_primary,
    _in_lambda_hof,
    _require_spark4,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _pg_interval_parts,
    _pg_regex_substring_emit,
    _regex_literal,
    _spark_string_literal,
    convert_posix_classes,
)
from sqlmesh_spark.core.transpile_types import _float_typed_castee


def token_handlers(ctx) -> "int | None":
    """Returns the next scan index when a construct was consumed/edited,
    None to fall through to the shared handlers and plain renames."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, kind, text = ctx.i, ctx.kind, ctx.text
    start, end = ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    dead_zones, n = ctx.dead_zones, len(toks)
    _unused = (read, first_pass, kind, start, end, is_op, transpile)

    # postgres `/` over INTEGERS truncates (7/2 = 3, -7/2 = -3);
    # Spark `/` is always DOUBLE division. Statically provable only
    # for integer-literal / integer-literal — rewrite that shape to
    # DIV (Spark DIV truncates toward zero, same as pg). Guards:
    # the LHS literal must be a standalone operand (the token
    # before it must not be a tighter-or-equal operator — in
    # `x / 7 / 2` the second division's real LHS is `(x / 7)`), and
    # the RHS literal must not be captured by a tighter operator
    # (`7 / 2 ^ x` is `7 / (2 ^ x)`; `7 / 2::float8` is DOUBLE).
    # Non-literal operands pass through — a DOCUMENTED divergence
    # (column int division needs the model's types, which a textual
    # transpiler doesn't have; SQLGlot, and therefore the
    # reference, passes it through identically). Pinned in
    # tests/test_dialect_fuzz_pg.py. A preceding DIV name does NOT
    # block: postgres has no infix DIV, so it can only be this
    # handler's own prior emission — a provably-integer LHS — and
    # blocking it left chains half-converted (`7/2/2` stabilized as
    # `7 DIV 2/2` = 1.5 in Spark where pg gives 1; chain rewrites
    # land one `/` per fixpoint pass via the pending-edit defer).
    if (
        read == "postgres"
        and kind == "op"
        and text == "/"
        and i > 0
        and toks[i - 1][0] == "number"
        and toks[i - 1][1].isdigit()
        and not (
            i >= 2
            and toks[i - 2][0] == "op"
            and toks[i - 2][1] in ("*", "/", "%", "^", "::")
        )
    ):
        j = i + 1
        while j < n and toks[j][0] == "op" and toks[j][1] in ("+", "-"):
            j += 1
        if (
            j < n
            and toks[j][0] == "number"
            and toks[j][1].isdigit()
            and not (
                j + 1 < n
                and toks[j + 1][0] == "op"
                and toks[j + 1][1] in ("^", "::", "[", ".")
            )
            and not any(e[1] >= toks[i - 1][2] and e[0] <= toks[j][3]
                        for e in edits)
        ):
            edits.append((start, end, " DIV "))
            i = j + 1
            return i


    # Postgres SELECT DISTINCT ON (k, ...) — keep the FIRST row per
    # key group under the statement's ORDER BY (pg requires the
    # ORDER BY to start with the ON expressions). Spark has no
    # DISTINCT ON; rewrite QUALIFY-style to a ROW_NUMBER window:
    #   SELECT * EXCEPT (__don) FROM (
    #     SELECT <list>, ROW_NUMBER() OVER (PARTITION BY <on>
    #       ORDER BY <full order list>) AS __don FROM ...
    #   ) WHERE __don = 1 ORDER BY <on>
    # The outer ORDER BY needs only the ON prefix: the result has
    # ONE row per distinct prefix, so the tail (which picked the
    # row) cannot affect result order — and it may reference
    # non-selected columns that the outer scope lacks.
    if (
        read == "postgres"
        and kind == "ident"
        and text.upper() == "DISTINCT"
        and i > 0
        and toks[i - 1][0] == "ident"
        and toks[i - 1][1].upper() == "SELECT"
        and i + 1 < n
        and toks[i + 1][0] == "ident"
        and toks[i + 1][1].upper() == "ON"
        and is_op(i + 2, "(")
    ):
        on_spans, on_close = _call_arg_spans(toks, i + 2)
        on_text = sql[toks[i + 2][3]: toks[on_close][2]].strip()
        # a set operation BEFORE this SELECT (same depth) means any
        # trailing ORDER BY is UNION-scoped, not this SELECT's own
        # — pg then picks an arbitrary row per group (loud below),
        # and claiming the union's ORDER BY would both mis-order
        # the union and fabricate a deterministic pick
        depth = 0
        in_set_op_tail = False
        for j in range(i - 2, -1, -1):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ == ")":
                depth += 1
            elif k_ == "op" and t_ == "(":
                depth -= 1
                if depth < 0:
                    break
            elif depth == 0 and k_ == "ident" and t_.upper() in (
                "UNION", "EXCEPT", "INTERSECT", "MINUS"
            ):
                in_set_op_tail = True
                break
        # matching FROM of this SELECT (forward, same depth)
        depth = 0
        from_idx = None
        for j in range(on_close + 1, n):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ == "(":
                depth += 1
            elif k_ == "op" and t_ == ")":
                depth -= 1
                if depth < 0:
                    break
            elif depth == 0 and k_ == "ident" and t_.upper() == "FROM":
                from_idx = j
                break
        if from_idx is None:
            raise TranspileError("DISTINCT ON in a SELECT without FROM")
        # the ORDER BY of this SELECT (same depth, after FROM)
        depth = 0
        ord_idx = None
        for j in range(from_idx + 1, n):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ == "(":
                depth += 1
            elif k_ == "op" and t_ == ")":
                depth -= 1
                if depth < 0:
                    break
            elif depth == 0 and k_ == "ident" and t_.upper() == "ORDER":
                ord_idx = j
                break
            elif depth == 0 and (
                (k_ == "ident" and t_.upper() in (
                    "UNION", "EXCEPT", "INTERSECT", "MINUS", "LIMIT",
                    "OFFSET", "FETCH"))
                or (k_ == "op" and t_ == ";")
            ):
                break
        if ord_idx is None or in_set_op_tail:
            raise TranspileError(
                "DISTINCT ON without its own ORDER BY (a trailing "
                "ORDER BY after a set operation is UNION-scoped) "
                "picks an arbitrary row per group in postgres — "
                "give the DISTINCT ON select an ORDER BY starting "
                "with the ON expressions (e.g. in a subquery) to "
                "make the pick deterministic"
            )
        # order-list span: from ORDER to the next same-depth
        # terminator (LIMIT/OFFSET/FETCH/set-op/close/;)
        depth = 0
        ord_end = n
        for j in range(ord_idx + 2, n):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ == "(":
                depth += 1
            elif k_ == "op" and t_ == ")":
                depth -= 1
                if depth < 0:
                    ord_end = j
                    break
            elif depth == 0 and (
                (k_ == "ident" and t_.upper() in (
                    "LIMIT", "OFFSET", "FETCH",
                    "UNION", "EXCEPT", "INTERSECT", "MINUS"))
                or (k_ == "op" and t_ == ";")
            ):
                ord_end = j
                break
        # defer BEFORE the recursive transpiles below (they are
        # full fixpoint runs — wasted work on a deferred pass)
        if any(e[1] >= toks[i - 1][2] and e[0] <= toks[ord_end - 1][3]
               for e in edits):
            i += 1
            return i
        order_list = transpile(
            sql[toks[ord_idx + 2][2]: toks[ord_end - 1][3]], read
        )
        on_conv = transpile(on_text, read)
        d_col = "__sqlmesh_distinct_on__"
        # the ON expressions may not be in the select list (pg
        # allows ordering by non-selected columns); project them as
        # hidden aliases so the outer ORDER BY always resolves, and
        # EXCEPT them away. pg requires the ORDER BY to start with
        # the ON expressions, so item k's trailing direction
        # keywords (ASC/DESC/NULLS FIRST/LAST) carry to alias k.
        on_items = [
            transpile(sql[toks[s_][2]: toks[e_][3]], read)
            for s_, e_ in on_spans
        ]
        # first len(on) ORDER BY items' trailing direction keywords
        dirs: list[str] = []
        depth_o = 0
        item_toks: list[list[int]] = [[]]
        for j in range(ord_idx + 2, ord_end):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ == "(":
                depth_o += 1
            elif k_ == "op" and t_ == ")":
                depth_o -= 1
            if depth_o == 0 and k_ == "op" and t_ == ",":
                item_toks.append([])
            else:
                item_toks[-1].append(j)
        for item in item_toks[: len(on_items)]:
            tail: list[str] = []
            for j in reversed(item):
                if toks[j][0] == "ident" and toks[j][1].upper() in (
                    "ASC", "DESC", "NULLS", "FIRST", "LAST"
                ):
                    tail.insert(0, toks[j][1].upper())
                else:
                    break
            dirs.append((" " + " ".join(tail)) if tail else "")
        while len(dirs) < len(on_items):
            dirs.append("")
        hidden = [
            f"__sqlmesh_don_p{k}__" for k in range(len(on_items))
        ]
        hidden_sel = "".join(
            f", ({e_}) AS {h}" for e_, h in zip(on_items, hidden)
        )
        outer_ord = ", ".join(
            f"{h}{d}" for h, d in zip(hidden, dirs)
        )
        edits.append(
            (toks[i - 1][2], toks[i - 1][2],
             f"SELECT * EXCEPT ({d_col}, {', '.join(hidden)}) FROM (")
        )
        # drop `DISTINCT ON (...)` from the select list
        edits.append((start, toks[on_close][3], ""))
        edits.append(
            (toks[from_idx][2], toks[from_idx][2],
             f"{hidden_sel}, ROW_NUMBER() OVER (PARTITION BY {on_conv} "
             f"ORDER BY {order_list}) AS {d_col} ")
        )
        # close the subquery where the ORDER BY clause began; the
        # outer orders by the hidden ON prefix only (one row per
        # distinct prefix — the tail cannot affect result order).
        # The clause's replacement text was transpiled separately
        # above — mark the span DEAD so no later handler edits
        # inside the wholesale replacement (overlap corrupts).
        edits.append(
            (toks[ord_idx][2], toks[ord_end - 1][3],
             f") WHERE {d_col} = 1 ORDER BY {outer_ord}")
        )
        dead_zones.append((toks[ord_idx][2], toks[ord_end - 1][3]))
        i = on_close + 1
        return i

    # Postgres TABLESAMPLE SYSTEM/BERNOULLI (n) → Spark
    # TABLESAMPLE (n PERCENT). Both sample ~n% of rows (SYSTEM is
    # page-level, BERNOULLI row-level; Spark's is split-level —
    # the statistical contract, a ~n% sample, carries over).
    # REPEATABLE has no Spark form — loud.
    if (
        read == "postgres"
        and kind == "ident"
        and text.upper() in ("SYSTEM", "BERNOULLI")
        and i > 0
        and toks[i - 1][0] == "ident"
        and toks[i - 1][1].upper() == "TABLESAMPLE"
        and is_op(i + 1, "(")
    ):
        spans_s, close_s = _call_arg_spans(toks, i + 1)
        if (
            close_s + 1 < n
            and toks[close_s + 1][0] == "ident"
            and toks[close_s + 1][1].upper() == "REPEATABLE"
        ):
            raise TranspileError(
                "TABLESAMPLE ... REPEATABLE(seed) has no Spark form"
            )
        if len(spans_s) == 1:
            pct = sql[toks[spans_s[0][0]][2]: toks[spans_s[0][1]][3]]
            edits.append(
                (start, toks[close_s][3], f"({pct} PERCENT)")
            )
            i = close_s + 1
            return i
        i += 1
        return i

    # Postgres SIMILAR TO: SQL wildcards (% _) over a regex-like
    # grammar where . ^ $ are LITERAL characters and the match is
    # ANCHORED. Literal patterns convert: % → .*, _ → ., literal
    # . ^ $ escaped, everything else (| * + ? {} () [] \) already
    # means the same in Java regex; emitted as RLIKE '^(?:..)$'
    # (a preceding NOT keeps working: NOT RLIKE). Non-literal
    # patterns and ESCAPE clauses are loud.
    if (
        read == "postgres"
        and kind == "ident"
        and text.upper() == "SIMILAR"
        and i + 1 < n
        and toks[i + 1][0] == "ident"
        and toks[i + 1][1].upper() == "TO"
    ):
        pi = i + 2
        if not (pi < n and toks[pi][0] == "string"):
            raise TranspileError(
                "SIMILAR TO needs a literal pattern to transpile"
            )
        if (
            pi + 1 < n
            and toks[pi + 1][0] == "ident"
            and toks[pi + 1][1].upper() == "ESCAPE"
        ):
            raise TranspileError(
                "SIMILAR TO ... ESCAPE has no Spark rewrite"
            )
        pat = _literal_content(toks[pi][1], read)
        conv = []
        esc = False
        for c in pat:
            if esc:
                conv.append("\\" + c)
                esc = False
            elif c == "\\":
                esc = True
            elif c == "%":
                conv.append(".*")
            elif c == "_":
                conv.append(".")
            elif c in ".^$":
                conv.append("\\" + c)
            else:
                conv.append(c)
        rx = "^(?:" + "".join(conv) + ")$"
        edits.append((start, toks[i + 1][3], "RLIKE"))
        edits.append(
            (toks[pi][2], toks[pi][3], _spark_string_literal(rx, read))
        )
        i = pi + 1
        return i

    # Postgres array-element ||: elem || arr PREPENDS and arr ||
    # elem APPENDS (verified live: 1 || ARRAY[2,3] = {1,2,3});
    # Spark's || is concat, which raises a type mismatch there.
    # Only the statically provable shapes rewrite: a NUMBER literal
    # on one side and an ARRAY[...] constructor on the other
    # (string-literal elements error in pg itself — the literal
    # parses as an array; both engines loud). arr || arr stays
    # Spark concat (correct); column-element shapes fail loudly at
    # analysis, never silently. array_insert, not array_prepend:
    # prepend's swapped arg order is a non-idempotent rewrite.
    if read == "postgres" and kind == "op" and text == "||":
        if (
            i >= 1
            and toks[i - 1][0] == "number"
            and i + 2 < n
            and toks[i + 1][0] in _NAME_KINDS
            and toks[i + 1][1].upper() == "ARRAY"
            and is_op(i + 2, "[")
            and (
                i < 2
                or (toks[i - 2][0] == "op"
                    and toks[i - 2][1] in ("(", ",", "["))
                or (toks[i - 2][0] in _NAME_KINDS
                    and toks[i - 2][1].upper() in _NONCALLABLE_KEYWORDS)
            )
        ):
            depth = 0
            close_b = None
            for j in range(i + 2, n):
                if toks[j][0] == "op" and toks[j][1] == "[":
                    depth += 1
                elif toks[j][0] == "op" and toks[j][1] == "]":
                    depth -= 1
                    if depth == 0:
                        close_b = j
                        break
            if close_b is not None:
                ls, le = toks[i - 1][2], toks[close_b][3]
                if not any(e[1] >= ls and e[0] <= le for e in edits):
                    arr_txt = _arg_text((i + 1, close_b))
                    edits.append((
                        ls, le,
                        f"array_insert({arr_txt}, 1, "
                        f"{toks[i - 1][1]})",
                    ))
                    i = close_b + 1
                    return i
            i += 1
            return i
        if (
            i >= 3
            and toks[i - 1][0] == "op"
            # "]": the raw ARRAY[...] constructor (same pass);
            # ")": the array(...) call form — BOTH the rewritten
            # fixpoint spelling (the constructor's own edit lands
            # first and defers this handler one pass) and pg's
            # ARRAY(subquery)
            and toks[i - 1][1] in ("]", ")")
            and i + 1 < n
            and toks[i + 1][0] == "number"
            and not (
                i + 2 < n
                and toks[i + 2][0] == "op"
                and toks[i + 2][1] in ("^", "::", "[", ".")
            )
        ):
            closer, opener = toks[i - 1][1], \
                "[" if toks[i - 1][1] == "]" else "("
            depth = 0
            open_b = None
            for j in range(i - 1, -1, -1):
                if toks[j][0] == "op" and toks[j][1] == closer:
                    depth += 1
                elif toks[j][0] == "op" and toks[j][1] == opener:
                    depth -= 1
                    if depth == 0:
                        open_b = j
                        break
            if (
                open_b is not None
                and open_b >= 1
                and toks[open_b - 1][0] in _NAME_KINDS
                and toks[open_b - 1][1].upper() == "ARRAY"
            ):
                ls = toks[open_b - 1][2]
                le = toks[i + 1][3]
                if not any(e[1] >= ls and e[0] <= le for e in edits):
                    arr_txt = _arg_text((open_b - 1, i - 1))
                    edits.append((
                        ls, le,
                        f"array_append({arr_txt}, "
                        f"{toks[i + 1][1]})",
                    ))
                    i += 2
                    return i
            i += 1
            return i

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

    # pg `^@` starts-with operator (pg 11+) → startswith(a, b). Lexed
    # as ONE op token by the pg grammar (a bare `^` then `@` previously
    # died in the lexer's macro class — loud but unhelpful). Each
    # operand binds once; unrecognized operand shapes defer, and a
    # never-resolving `^@` survives to a Spark parse error (loud).
    if kind == "op" and text == "^@":
        lfirst = _backward_primary(toks, i - 1, include_unary=False)
        rspan = _forward_primary(toks, i + 1)
        if lfirst is not None and rspan is not None:
            ls, re_ = toks[lfirst][2], toks[rspan[1]][3]
            if not any(e[1] >= ls and e[0] <= re_ for e in edits):
                edits.append((ls, ls, "startswith("))
                edits.append((start, end, ","))
                edits.append((re_, re_, ")"))
                i = rspan[1] + 1
                return i
        i += 1
        return i

    # pg BETWEEN SYMMETRIC swaps its bounds when they arrive reversed
    # (2 BETWEEN SYMMETRIC 3 AND 1 is true); Spark has no SYMMETRIC and
    # would misparse the keyword as an expression. The bound spans end
    # at parser-precedence boundaries a token walk cannot see — LOUD
    # with the exact rewrite.
    if (
        kind == "ident"
        and text.upper() == "SYMMETRIC"
        and i > 0
        and toks[i - 1][0] in _NAME_KINDS
        and toks[i - 1][1].upper() == "BETWEEN"
    ):
        raise TranspileError(
            "BETWEEN SYMMETRIC has no Spark form; write "
            "x BETWEEN least(a, b) AND greatest(a, b)"
        )

    # Postgres (a, b) OVERLAPS (c, d) — interval-overlap predicate
    # with endpoint normalization and point-interval edge semantics;
    # no Spark spelling and the four operands would each need
    # least/greatest duplication — LOUD with the manual form.
    if (
        read == "postgres"
        and kind == "ident"
        and text.upper() == "OVERLAPS"
        and i > 0
        and toks[i - 1][0] == "op"
        and toks[i - 1][1] == ")"
    ):
        raise TranspileError(
            "(start1, end1) OVERLAPS (start2, end2) has no Spark "
            "spelling; write s1 < e2 AND s2 < e1 (with the "
            "endpoints ordered)"
        )

    # Postgres COLLATE "name" — collation-dependent comparison
    # semantics have no faithful Spark rewrite (Spark's collation
    # names and defaults differ); silent pass-through would change
    # comparison results. LOUD.
    if (
        read == "postgres"
        and kind == "ident"
        and text.upper() == "COLLATE"
        and i + 1 < n
        and toks[i + 1][0] in ("dquote", "string", "ident")
    ):
        raise TranspileError(
            "postgres COLLATE has no Spark rewrite (collation "
            "names/semantics differ); drop the clause or compare "
            "via upper()/lower()"
        )

    # Postgres DATE - DATE returns INTEGER days; Spark date
    # subtraction returns an INTERVAL. Only the literal shape
    # DATE '..' - DATE '..' is statically provable → datediff
    # (Spark datediff(end, start) = end - start in days). Typed
    # column subtraction passes through: the INTERVAL result type
    # breaks downstream integer arithmetic loudly, never silently.
    if (
        read == "postgres"
        and kind == "op"
        and text == "-"
        and i >= 2
        and toks[i - 1][0] == "string"
        and toks[i - 2][0] == "ident"
        and toks[i - 2][1].upper() == "DATE"
        and i + 2 < n
        and toks[i + 1][0] == "ident"
        and toks[i + 1][1].upper() == "DATE"
        and toks[i + 2][0] == "string"
    ):
        ls = toks[i - 2][2]
        re_ = toks[i + 2][3]
        if not any(e[1] >= ls and e[0] <= re_ for e in edits):
            edits.append((ls, ls, "datediff("))
            edits.append((start, end, ","))
            edits.append((re_, re_, ")"))
            i += 3
            return i
        i += 1
        return i

    # Postgres regex-match operators: a ~ p (partial match) → RLIKE,
    # ~* → RLIKE with an inline (?i), !~ / !~* → NOT RLIKE, and the
    # LIKE spellings ~~ / !~~ → LIKE / NOT LIKE. Spark RLIKE is also
    # a partial (unanchored) match, and its precedence band (the
    # LIKE predicates) matches pg's. Regex FLAVOR divergence (POSIX
    # ARE vs Java) is documented: anchors, alternation,
    # quantifiers — the common surface — agree; POSIX [:class:]
    # bracket elements CONVERT in literal patterns (Java reads the
    # class name as literal characters — a silent flip, see
    # convert_posix_classes), and non-literal patterns carrying
    # them still ship through unconverted (runtime-silent; only
    # literals are statically visible). Infix
    # reading requires the previous token to END an expression —
    # `SELECT ~ 5` stays Spark's unary bitwise NOT (same operator
    # in pg).
    if (
        read == "postgres"
        and kind == "op"
        and text in ("~", "!")
        and i > 0
        and (
            toks[i - 1][0] in ("number", "string", "dquote")
            or (toks[i - 1][0] == "op" and toks[i - 1][1] in (")", "]"))
            or (toks[i - 1][0] in _NAME_KINDS
                and (toks[i - 1][1].upper() == "END"
                     or toks[i - 1][1].upper()
                     not in _NONCALLABLE_KEYWORDS))
        )
    ):
        neg = text == "!"
        ti = i + 1 if neg else i
        ok = not neg or (
            ti < n and toks[ti][0] == "op" and toks[ti][1] == "~"
            and toks[ti][2] == end
        )
        if ok:
            # ~~ (LIKE spelling): second adjacent ~
            like_form = (
                ti + 1 < n
                and toks[ti + 1][0] == "op" and toks[ti + 1][1] == "~"
                and toks[ti + 1][2] == toks[ti][3]
            )
            li = ti + 1 if like_form else ti
            ci = (
                li + 1 < n
                and toks[li + 1][0] == "op" and toks[li + 1][1] == "*"
                and toks[li + 1][2] == toks[li][3]
            )
            op_last = li + 1 if ci else li
            rhs_idx = op_last + 1
            if like_form:
                # ~~* / !~~* are pg's ILIKE spellings — Spark has
                # ILIKE natively, no pattern rewrite needed
                base_kw = "ILIKE" if ci else "LIKE"
                kw = f" NOT {base_kw} " if neg else f" {base_kw} "
                ci = False  # no (?i) injection for LIKE patterns
            else:
                kw = " NOT RLIKE " if neg else " RLIKE "
            rspan = _forward_primary(toks, rhs_idx)
            if rspan is None:
                raise TranspileError(
                    f"postgres {'!' if neg else ''}~"
                    f"{'*' if ci else ''} needs a recognizable "
                    "right-hand pattern operand"
                )
            rs, re_ = toks[rspan[0]][2], toks[rspan[1]][3]
            if any(e[1] >= start and e[0] <= re_ for e in edits):
                i += 1  # pending rewrites — resolve next pass
                return i
            edits.append((start, toks[op_last][3], kw))
            is_lit = (
                rspan[0] == rspan[1] and toks[rspan[0]][0] == "string"
            )
            if is_lit and not like_form:
                # POSIX [:class:] elements convert (Java would read
                # the class NAME as literal characters — silent
                # flip); (?i) folds into the same re-emission
                pat = convert_posix_classes(
                    _literal_content(toks[rspan[0]][1], read)
                )
                if ci:
                    pat = "(?i)" + pat
                edits.append(
                    (rs, re_, _spark_string_literal(pat, read))
                )
            elif ci:
                # `||`, not concat(): the pg concat() handler
                # would re-rewrite the emission on a later pass
                # (fixpoint break); pg and Spark || agree
                # (NULL-propagating string concat)
                edits.append((rs, rs, "('(?i)' || "))
                edits.append((re_, re_, ")"))
            i = rhs_idx
            return i
        i += 1
        return i

    # Postgres `#` bitwise XOR. Spark's XOR operator is `^`, but a
    # pg-read emission of `^` would be re-read as POWER on the next
    # fixpoint pass — emit the single-evaluation and/or/not
    # composition over a struct binding instead (the substr-handler
    # pattern). Only provably-scoped operand shapes rewrite: `#`
    # binds LOOSER than + - * / in pg ("any other operator"), so a
    # neighboring arithmetic operator would make the primary-level
    # scoping silently wrong — loud there.
    if read == "postgres" and kind == "op" and text == "#":
        if is_op(i + 1, "-") and toks[i][3] == toks[i + 1][2]:
            # adjacent `#-` is the jsonb path-delete operator, not
            # XOR-of-negative — loud before the XOR rewrite below
            raise TranspileError(
                "postgres #- (jsonb delete path) has no Spark "
                "rewrite; restructure with named_struct/to_json"
            )
        lfirst = (
            _backward_primary(toks, i - 1, include_unary=True)
            if i > 0 else None
        )
        rspan = _forward_primary(toks, i + 1)
        prev_ok = lfirst is not None and (
            lfirst == 0
            or (toks[lfirst - 1][0] == "op"
                and toks[lfirst - 1][1] in ("(", ",", "=", "<", ">",
                                             "<=", ">=", "<>", "!="))
            or (toks[lfirst - 1][0] in _NAME_KINDS
                and toks[lfirst - 1][1].upper()
                in _NONCALLABLE_KEYWORDS)
        )
        nxt_j = rspan[1] + 1 if rspan is not None else n
        next_ok = rspan is not None and (
            nxt_j >= n
            or (toks[nxt_j][0] == "op"
                and toks[nxt_j][1] in (")", ",", ";", "=", "<", ">",
                                        "<=", ">=", "<>", "!="))
            or (toks[nxt_j][0] in _NAME_KINDS
                and toks[nxt_j][1].upper() in _NONCALLABLE_KEYWORDS)
        )
        if not (prev_ok and next_ok):
            raise TranspileError(
                "postgres # (bitwise XOR) binds looser than "
                "arithmetic and this operand shape has no scoped "
                "one-pass rewrite; parenthesize both operands or "
                "the whole # expression"
            )
        ls = toks[lfirst][2]
        re_ = toks[rspan[1]][3]
        if any(e[1] >= ls and e[0] <= re_ for e in edits):
            i += 1
            return i
        edits.append((ls, ls, "element_at(transform(array(struct(("))
        edits.append((start, end, ") AS _x, ("))
        edits.append(
            (re_, re_,
             ") AS _y)), _t -> (_t._x | _t._y) & ~ (_t._x & _t._y)), 1)")
        )
        i = rspan[1] + 1
        return i

    # Postgres @-family and root prefix operators (round 8; semantics
    # pinned live on PG 15): a @> b / a <@ b array containment —
    # SET-semantics with strict equality (ARRAY[NULL] @> ARRAY[NULL]
    # is FALSE; NULL operand → NULL; empty needle → TRUE), unary
    # @ = abs, |/ = sqrt, ||/ = cbrt (pg computes pow(x, 1/3.0);
    # sub-1e-6 float noise vs Spark's cbrt).
    if read == "postgres" and kind == "op" and text in ("@>", "<@"):
        # operands may be ARRAY[...] constructors (which the generic
        # primary scanners don't span), with optional ::type[] / ::type
        # cast suffix chains, or ordinary primaries
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
            i + 2 < n
            and toks[i + 1][0] in _NAME_KINDS
            and toks[i + 1][1].upper() == "ARRAY"
            and is_op(i + 2, "[")
        ):
            depth = 0
            for j in range(i + 2, n):
                if toks[j][0] == "op" and toks[j][1] == "[":
                    depth += 1
                elif toks[j][0] == "op" and toks[j][1] == "]":
                    depth -= 1
                    if depth == 0:
                        rlast = j
                        break
        else:
            rspan = _forward_primary(toks, i + 1)
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
                f"postgres {text} (array containment) needs "
                "recognizable operands to rewrite; parenthesize them"
            )
        rspan = (i + 1, rlast)
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
    if read == "postgres" and kind == "op" and text == "::":
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
            raise TranspileError(
                "postgres ? (jsonb key exists) has no direct Spark "
                "operator; use json_object_keys()/get_json_object "
                "IS NOT NULL explicitly"
            )
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

    # Postgres jsonb path extraction: j #>> '{a,b}' (text at path) →
    # get_json_object with the combined bracket JsonPath — exact for
    # scalars, same text-form caveats as ->> (documented there).
    # All-digit segments are loud (array index on arrays, key on
    # objects — the ->>/pointer polymorphism). `#>` is loud like
    # terminal -> (JSON-typed result quotes string scalars), and an
    # arrow chained onto #>> text is a pg type error — loud.
    if read == "postgres" and kind == "op" and text in ("#>", "#>>"):
        if text == "#>":
            raise TranspileError(
                "postgres #> returns the JSON-typed value, whose "
                "text form differs from get_json_object for string "
                "scalars; use #>> (text at path)"
            )
        if not (i + 1 < n and toks[i + 1][0] == "string"):
            i += 1  # non-literal path — loud at Spark render
            return i
        lfirst = (
            _backward_primary(toks, i - 1, include_unary=False)
            if i > 0 else None
        )
        if lfirst is None or _in_lambda_hof(toks, lfirst):
            i += 1
            return i
        if (
            lfirst > 0
            and toks[lfirst - 1][0] == "op"
            and (
                toks[lfirst - 1][1] in ("->", "#>", "#>>")
                or (
                    toks[lfirst - 1][1] == ">"
                    and lfirst >= 2
                    and toks[lfirst - 2][0] == "op"
                    and toks[lfirst - 2][1] == "->"
                    and toks[lfirst - 2][3] == toks[lfirst - 1][2]
                )
            )
        ):
            i += 1  # LHS is a preceding JSON operator's RHS
            return i
        raw = _literal_content(toks[i + 1][1], read)
        inner = raw.strip()
        if not (inner.startswith("{") and inner.endswith("}")):
            raise TranspileError(
                "postgres #>> takes a text[] path literal like "
                "'{a,b}'"
            )
        segs = [s.strip() for s in inner[1:-1].split(",")] \
            if inner[1:-1].strip() else []
        if not segs:
            raise TranspileError(
                "postgres #>> '{}' returns the whole document as "
                "text, whose form differs from Spark's — extract a "
                "concrete path"
            )
        if any(not s or any(c in s for c in "'\"[]{}") for s in segs):
            raise TranspileError(
                "postgres #>> path segments with quotes/brackets "
                "have no Spark JsonPath form"
            )
        if any(s.isdigit() for s in segs):
            raise TranspileError(
                "postgres #>> digit segments are array indexes on "
                "arrays but keys on objects — statically ambiguous "
                "in Spark's JsonPath"
            )
        j2 = i + 2
        while j2 < n and is_op(j2, ")"):
            j2 += 1
        if (
            j2 < n
            and toks[j2][0] == "op"
            and toks[j2][1] in ("->", "#>", "#>>")
        ):
            raise TranspileError(
                "#>> returns text; chaining another JSON operator "
                "onto text is a type error in postgres"
            )
        ls = toks[lfirst][2]
        if any(e[1] >= ls and e[0] <= toks[i + 1][3] for e in edits):
            i += 1
            return i
        path = "$" + "".join(f"['{s}']" for s in segs)
        edits.append((ls, ls, "get_json_object("))
        edits.append(
            (start, toks[i + 1][3],
             ", " + _spark_string_literal(path, read) + ")")
        )
        i += 2
        return i

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
        tname in ("boolean", "bool")
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
        content = _literal_content(prev[1], read)
        parts = _pg_interval_parts(content)
        if parts is None:
            raise TranspileError(
                f"postgres ::interval literal {content!r} is not "
                "statically parseable — use verbose units, hh:mm:ss "
                "or ISO-8601"
            )
        months, days, micros = parts
        if months and (days or micros):
            raise TranspileError(
                "postgres interval literals mixing year-month and "
                "day-time parts have no Spark interval type; split "
                "the arithmetic into two intervals"
            )
        if months:
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

    if (
        tname in _PG_ARRAY_ELEM_TYPES
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

    if tname == "bytea" and prev[0] == "string":
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
