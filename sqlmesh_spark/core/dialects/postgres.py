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
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _spark_string_literal,
    convert_posix_classes,
    convert_regex_literal,
)
from sqlmesh_spark.core.dialects.postgres_ops import (
    token_handlers as _ops_token_handlers,
)
from sqlmesh_spark.core.dialects.postgres_quant import (
    token_handlers as _quant_token_handlers,
)


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

    if (
        kind == "ident"
        and text.upper() in ("CURRENT_TIME", "LOCALTIME")
        and not (
            i + 1 < n
            and toks[i + 1][0] == "op"
            and toks[i + 1][1] == "("
        )
    ):
        # bare TIME-typed session keywords (round 11): Spark has no
        # TIME type and no such keyword — the passthrough resolved as
        # an unknown COLUMN. (current_date/current_timestamp/
        # localtimestamp all exist in Spark and pass through.)
        raise TranspileError(
            f"{text.lower()} has no Spark analog (no TIME type); use "
            "current_timestamp and format/extract the time fields"
        )

    if (
        kind == "ident"
        and text.upper() == "ARRAY"
        and i + 2 < n
        and toks[i + 1][0] == "op" and toks[i + 1][1] == "("
        and toks[i + 2][0] in _NAME_KINDS
        and toks[i + 2][1].upper() == "SELECT"
    ):
        # pg ARRAY(SELECT ...) subquery constructor (round 11, wave
        # 51): one column, rows to an array, '{}' on zero rows, NULL
        # elements KEPT. Spark can't parse the form — rewritten to a
        # scalar subquery over the struct-wrapped array_agg (the
        # collect_list family drops NULLs; the struct wrap keeps
        # them, [] falls out on empty). SELECT DISTINCT →
        # array_agg(DISTINCT struct(..)) (one NULL survives, like
        # pg). A trailing ORDER BY <the selected expr> [ASC|DESC]
        # (no explicit NULLS, no LIMIT after it) is absorbed:
        # ASC → array_sort (NULLs LAST, pg's ASC default); DESC →
        # reverse(array_sort(..)) (NULLs FIRST, pg's DESC default).
        # Any other tail — expression keys, NULLS overrides,
        # ORDER BY + LIMIT (stripping the sort would change WHICH
        # rows limit keeps) — is loud.
        depth = 0
        close_p = None
        for j in range(i + 1, n):
            if toks[j][0] == "op" and toks[j][1] == "(":
                depth += 1
            elif toks[j][0] == "op" and toks[j][1] == ")":
                depth -= 1
                if depth == 0:
                    close_p = j
                    break
        if close_p is None:
            raise TranspileError("unbalanced ARRAY( subquery")
        if any(
            e[1] >= start and e[0] <= toks[close_p][3] for e in edits
        ):
            return i + 1  # inner edits pending; resolve next pass
        sel = i + 2
        lead = sel + 1
        distinct = ""
        if (
            lead < close_p
            and toks[lead][0] in _NAME_KINDS
            and toks[lead][1].upper() == "DISTINCT"
        ):
            distinct = "DISTINCT "
            lead += 1
        # select-list span: up to the first depth-0 clause keyword
        depth2 = 0
        expr_end = None   # token AFTER the select expression
        clause_tok = close_p
        for j in range(lead, close_p):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ in ("(", "["):
                depth2 += 1
            elif k_ == "op" and t_ in (")", "]"):
                depth2 -= 1
            elif depth2 == 0 and k_ == "op" and t_ == ",":
                raise TranspileError(
                    "ARRAY(SELECT ...) must select exactly one "
                    "column"
                )
            elif depth2 == 0 and k_ in _NAME_KINDS and t_.upper() in (
                "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT",
                "OFFSET", "UNION", "INTERSECT", "EXCEPT",
            ):
                clause_tok = j
                break
        expr_end = clause_tok
        expr_txt = sql[toks[lead][2]:toks[expr_end - 1][3]].strip()
        if not expr_txt:
            raise TranspileError("ARRAY(SELECT ...) has no select list")
        # locate a depth-0 ORDER BY tail inside the subquery
        depth3 = 0
        order_at = None
        for j in range(clause_tok, close_p):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ in ("(", "["):
                depth3 += 1
            elif k_ == "op" and t_ in (")", "]"):
                depth3 -= 1
            elif depth3 == 0 and k_ in _NAME_KINDS:
                if t_.upper() == "ORDER":
                    order_at = j
                    break
                if t_.upper() in ("UNION", "INTERSECT", "EXCEPT"):
                    raise TranspileError(
                        "ARRAY(SELECT ... set operation) has no "
                        "Spark rewrite; aggregate each branch"
                    )
                if t_.upper() in ("LIMIT", "OFFSET", "FETCH"):
                    # in the aggregated rewrite a LIMIT would apply
                    # AFTER the aggregate (a no-op on its one row)
                    # instead of limiting the input — silent wrong
                    raise TranspileError(
                        "ARRAY(SELECT ... LIMIT/OFFSET) has no "
                        "faithful rewrite through the aggregate "
                        "form; apply slice() to the result instead"
                    )
        wrap_open, wrap_close = "", ""
        rest_end = close_p   # token AFTER the body we keep
        if order_at is not None:
            # ORDER BY <expr> [ASC|DESC] must be the LAST clause and
            # key on exactly the selected expression
            k0 = order_at + 2
            key_end = close_p
            dirn = "asc"
            jj = close_p - 1
            if toks[jj][0] in _NAME_KINDS and toks[jj][1].upper() in (
                "ASC", "DESC",
            ):
                dirn = toks[jj][1].lower()
                key_end = jj
            key_txt = sql[toks[k0][2]:toks[key_end - 1][3]].strip()
            if (
                toks[order_at + 1][0] not in _NAME_KINDS
                or toks[order_at + 1][1].upper() != "BY"
                or key_txt != expr_txt
            ):
                raise TranspileError(
                    "ARRAY(SELECT x ... ORDER BY k) transpiles only "
                    "when k is exactly the selected expression "
                    "(array_sort orders the elements); expression "
                    "keys / NULLS overrides / LIMIT have no faithful "
                    "rewrite"
                )
            if dirn == "asc":
                wrap_open, wrap_close = "array_sort(", ")"
            else:
                wrap_open, wrap_close = "reverse(array_sort(", "))"
            rest_end = order_at
        body = sql[toks[expr_end][2]:toks[rest_end - 1][3]].strip() \
            if rest_end > expr_end else ""
        agg = (
            f"array_agg({distinct}struct(({expr_txt}) AS _v))"
        )
        # the sort wraps INSIDE the scalar subquery: Spark rejects a
        # subquery nested in a higher-order function's argument
        # (UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY), the reverse
        # nesting is fine
        repl = (
            f"(SELECT {wrap_open}transform({agg}, _s -> _s._v)"
            f"{wrap_close} {body})"
        )
        edits.append((start, toks[close_p][3], repl))
        return close_p + 1

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
    if read == "postgres" and kind == "op" and text == "/" and i > 0:
        int_ts = {
            "int", "int2", "int4", "int8", "integer", "bigint",
            "smallint",
        }
        lhs_ok = False
        lhs_start = None
        if (
            toks[i - 1][0] == "number"
            and toks[i - 1][1].isdigit()
            and not (
                i >= 2
                and toks[i - 2][0] == "op"
                and toks[i - 2][1] in ("*", "/", "%", "^", "::")
            )
        ):
            lhs_ok = True
            lhs_start = i - 1
        elif (
            toks[i - 1][0] in _NAME_KINDS
            and toks[i - 1][1].lower() in int_ts
            and i >= 2
            and toks[i - 2][0] == "op"
            and toks[i - 2][1] == "::"
        ):
            # x::bigint / y — the cast makes the LHS statically
            # integer-typed (round-9 numeric wave: the float-division
            # pass-through gave -9.2e18 for bigint-overflow division);
            # the primary's PRECEDING token must not be a
            # tighter-or-equal operator (in `a * b::int / 2` the
            # division's real LHS is the product, type unknown)
            first = _backward_primary(toks, i - 1, include_unary=False)
            if first is not None and not (
                first >= 1
                and toks[first - 1][0] == "op"
                and toks[first - 1][1] in ("*", "/", "%", "^")
            ):
                lhs_ok = True
                lhs_start = first
        if lhs_ok:
            j = i + 1
            while j < n and toks[j][0] == "op" and toks[j][1] in ("+", "-"):
                j += 1
            rhs_end = None
            if (
                j < n
                and toks[j][0] == "number"
                and toks[j][1].isdigit()
                and not (
                    j + 1 < n
                    and toks[j + 1][0] == "op"
                    and toks[j + 1][1] in ("^", "::", "[", ".")
                )
            ):
                rhs_end = j
            else:
                span = _forward_primary(toks, i + 1)
                if (
                    span is not None
                    and toks[span[1]][0] in _NAME_KINDS
                    and toks[span[1]][1].lower() in int_ts
                    and span[1] >= 1
                    and toks[span[1] - 1][0] == "op"
                    and toks[span[1] - 1][1] == "::"
                    and not (
                        span[1] + 1 < n
                        and toks[span[1] + 1][0] == "op"
                        and toks[span[1] + 1][1] in ("^", "[", ".")
                    )
                ):
                    rhs_end = span[1]
            if rhs_end is not None and not any(
                e[1] >= toks[lhs_start][2] and e[0] <= toks[rhs_end][3]
                for e in edits
            ):
                edits.append((start, end, " DIV "))
                i = rhs_end + 1
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
        # duckdb included (round 10): duck supports DISTINCT ON with
        # the same first-row-per-group-under-ORDER-BY contract (it
        # merely drops pg's ORDER-BY-prefix requirement, which this
        # rewrite never depended on); dispatched for duck via the
        # DISTINCT trigger in transpile.py
        read in ("postgres", "duckdb")
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
                # pg SIMILAR TO escapes are ARE regex escapes (pinned
                # live, PG 15: '7' SIMILAR TO '\d' is TRUE, 'd' is
                # FALSE — \d IS the digit class, not a literal d), and
                # the ARE escape table matches Java's for \d \s \w \.
                # etc.; the ARE-specific word/backspace letters have
                # DIFFERENT Java meanings → loud
                if c in "bmMy":
                    raise TranspileError(
                        f"SIMILAR TO escape \\{c} is an ARE-specific "
                        "escape (backspace/word-boundary) with a "
                        "different Java regex meaning — no faithful "
                        "rewrite"
                    )
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
        # (?s)..\z, not ^..$: SIMILAR TO anchors to the WHOLE string —
        # Java $ would also accept a final newline, and the _ → .
        # wildcard must match newline characters like pg's does
        rx = "(?s)^(?:" + "".join(conv) + ")\\z"
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

    # Postgres quantified tier (IS NORMALIZED / LIKE ANY|ALL /
    # = ANY(arr) comparisons) — round-11 split into
    # core/dialects/postgres_quant.py, dispatched HERE so the scan
    # position and ordering are exactly the pre-split ones
    nxtq = _quant_token_handlers(ctx)
    if nxtq is not None:
        return nxtq

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
                # flip); convert_regex_literal fixes the ARE-default
                # seams ($ → \z, (?s) dot prefix — round 10, pinned
                # live); (?i) folds into the same re-emission
                pat = convert_regex_literal(convert_posix_classes(
                    _literal_content(toks[rspan[0]][1], read)
                ), read)
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

    # ---- Round-8 operator/literal/cast seams (core/dialects/postgres_ops.py):
    # @-family + root prefix operators, literal-castee seams
    # (booleans/intervals/array literals/bytea), typed literals,
    # MATERIALIZED hints, unnest aliases, exponent-literal
    # expansion, jsonb mutation-operator and interval/float/
    # bytea-to-text louds, GROUPS frames. Moved verbatim (round 8
    # re-split); trigger tokens are disjoint from the handlers
    # above and below, so scan semantics are unchanged.
    nxt8 = _ops_token_handlers(ctx)
    if nxt8 is not None:
        return nxt8

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


