"""DuckDB token-level handlers, split out of ``duckdb_fns.py`` in
round 11 (the module had regrown past the ~1,100-1,200-line transpile
convention after the round's statement-tier additions). Bodies
verbatim; the dispatch gate in ``core/transpile.py`` keeps the same
trigger-token set and now points here.

Covers: digit-group underscore literals (1_000_000), USING SAMPLE /
TABLESAMPLE sampling clauses, FROM-first statements, {'k': v} struct
and MAP {k: v} literals, duck typed-literal spellings (int4 '5'),
* REPLACE / BY NAME / PIVOT / EXCLUDE / ASOF / POSITIONAL louds, the
date-seam '-' handler, and the '&' / '::' token seams.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _backward_primary,
    _call_arg_spans,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _spark_string_literal,
)


def token_handlers(ctx) -> "int | None":
    """DuckDB struct/map literal syntax: {'k': v, ...} → named_struct,
    MAP {k: v, ...} → map(k, v, ...). The outermost braces rewrite per
    pass; nested literals inside the copied value text convert on the
    next fixpoint pass."""
    toks, edits = ctx.toks, ctx.edits
    sql = ctx.sql
    i, kind, text = ctx.i, ctx.kind, ctx.text
    start = ctx.start
    n = len(toks)

    nxt_handled = _duck_match_operators(ctx)
    if nxt_handled is not None:
        return nxt_handled

    if (
        kind == "op"
        and text == "!"
        and i > 0
        and not (
            i + 1 < n
            and toks[i + 1][0] == "op"
            and toks[i + 1][1] in ("=", "~")
            and toks[i + 1][2] == ctx.end
        )
        and (
            toks[i - 1][0] in ("ident", "qident", "bquote", "dquote",
                               "number")
            or (toks[i - 1][0] == "op" and toks[i - 1][1] in (")", "]"))
        )
    ):
        # duck POSTFIX factorial (5! = 120, round 11 — previously a
        # Spark parse error). != / !~ / !~~ operator heads are
        # excluded by the adjacency check; a genuinely prefix ! does
        # not exist in duck. Spark's factorial is exact to 20! and
        # NULL above where duck goes HUGEINT — same seam as the
        # factorial() function-form passthrough.
        lf = _backward_primary(toks, i - 1, include_unary=False)
        if lf is not None and not any(
            e[1] >= toks[lf][2] and e[0] <= ctx.end for e in edits
        ):
            lhs_txt = sql[toks[lf][2]:toks[i - 1][3]].strip()
            edits.append(
                (toks[lf][2], ctx.end, f"factorial(({lhs_txt}))")
            )
            return i + 1

    if (
        kind == "ident"
        and text.upper() in ("IGNORE", "RESPECT")
        and i + 2 < n
        and toks[i + 1][0] in _NAME_KINDS
        and toks[i + 1][1].upper() == "NULLS"
        and toks[i + 2][0] == "op"
        and toks[i + 2][1] == ")"
    ):
        # duck window-function NULL treatment sits INSIDE the call
        # parens — last_value(x IGNORE NULLS) OVER ... — where
        # Spark's grammar wants it between the call and OVER:
        # last_value(x) IGNORE NULLS OVER ... (pinned live, round
        # 11: the in-paren form is a PARSE_SYNTAX_ERROR). Move the
        # two keywords outside the close paren; Spark validates the
        # function/OVER context itself.
        kw = f" {text.upper()} NULLS"
        if not any(
            e[1] >= start and e[0] <= toks[i + 2][3] for e in edits
        ):
            edits.append((start, toks[i + 1][3], ""))
            edits.append((toks[i + 2][3], toks[i + 2][3], kw))
            return i + 3
        return i + 1

    if (
        kind == "ident"
        and text[0] == "_"
        and len(text) > 1
        and text.lstrip("_0123456789") == ""
        and i >= 1
        and toks[i - 1][0] == "number"
        and toks[i - 1][3] == start  # adjacent: one lexeme in duck
    ):
        # duck digit-group underscores (1_000_000, 2_5.5_0 — pinned
        # live): the lexer splits them into number + _-ident, and
        # Spark reads the ident half as an unresolved column. Merge
        # and strip. Multi-segment decimals resolve one segment per
        # handler hit within the pass.
        merged = (toks[i - 1][1] + text).replace("_", "")
        edits.append((toks[i - 1][2], ctx.end, merged))
        return i + 1

    if kind == "ident" and (
        (text.upper() == "USING" and i + 1 < n
         and toks[i + 1][0] == "ident"
         and toks[i + 1][1].upper() == "SAMPLE")
        or text.upper() == "TABLESAMPLE"
    ):
        # duck sampling clauses (pinned live, duckdb 1.0): USING
        # SAMPLE n% (default system, vector-granularity), bernoulli/
        # system(n%), an optional trailing (method, seed), and the
        # TABLESAMPLE spelling. Spark's TABLESAMPLE (n PERCENT)
        # [REPEATABLE (seed)] is row-level Bernoulli — the faithful
        # map for bernoulli and the honest approximation for system
        # (documented; sampling is approximate by contract). EXACT-n
        # forms (reservoir(n) / bare n [ROWS]) pick n RANDOM rows
        # where Spark's (n ROWS) takes the FIRST n — silently
        # deterministic, so they are loud with the faithful rewrite.
        j = i + 2 if text.upper() == "USING" else i + 1
        pct = None
        seed = None
        rows_form = False
        if (
            j < n and toks[j][0] == "ident"
            and toks[j][1].lower() in ("bernoulli", "system", "reservoir")
            and j + 1 < n and toks[j + 1][0] == "op"
            and toks[j + 1][1] == "("
        ):
            meth = toks[j][1].lower()
            spans_s, close_s = _call_arg_spans(toks, j + 1)
            if len(spans_s) == 1 and toks[spans_s[0][0]][0] == "number":
                num_ = toks[spans_s[0][0]][1]
                tail_ = [
                    toks[k][1].upper() if toks[k][0] == "ident"
                    else toks[k][1]
                    for k in range(spans_s[0][0] + 1, spans_s[0][1] + 1)
                ]
                if meth == "reservoir" or tail_ == ["ROWS"] or (
                    not tail_ and meth == "reservoir"
                ):
                    rows_form = True
                elif tail_ in ([], ["%"], ["PERCENT"]):
                    if meth == "reservoir":
                        rows_form = True
                    else:
                        pct = num_
                j = close_s + 1
            else:
                return None
        elif j < n and toks[j][0] == "number":
            num_ = toks[j][1]
            if ctx.is_op(j + 1, "%"):
                pct = num_
                j += 2
            elif (
                j + 1 < n and toks[j + 1][0] == "ident"
                and toks[j + 1][1].upper() == "PERCENT"
            ):
                pct = num_
                j += 2
            else:
                rows_form = True
                if (
                    j + 1 < n and toks[j + 1][0] == "ident"
                    and toks[j + 1][1].upper() == "ROWS"
                ):
                    j += 2
                else:
                    j += 1
        else:
            return None
        if rows_form:
            raise TranspileError(
                "duckdb exact-n sampling (reservoir / n ROWS) picks n "
                "RANDOM rows; Spark's TABLESAMPLE (n ROWS) takes the "
                "FIRST n — rewrite as ORDER BY rand() LIMIT n"
            )
        # optional trailing (method[, seed])
        if j < n and toks[j][0] == "op" and toks[j][1] == "(":
            spans_s, close_s = _call_arg_spans(toks, j)
            if (
                len(spans_s) == 2
                and toks[spans_s[1][0]][0] == "number"
            ):
                seed = toks[spans_s[1][0]][1]
                if toks[spans_s[0][0]][1].lower() == "reservoir":
                    raise TranspileError(
                        "duckdb reservoir sampling picks n RANDOM "
                        "rows — rewrite as ORDER BY rand() LIMIT n"
                    )
            elif len(spans_s) == 1:
                pass  # bare (method)
            else:
                return None
            j = close_s + 1
        rep = f" TABLESAMPLE ({pct} PERCENT)"
        if seed is not None:
            rep += f" REPEATABLE ({seed})"
        edits.append((toks[i][2] - (1 if toks[i][2] > 0 and
                                    sql[toks[i][2] - 1] == " " else 0),
                      toks[j - 1][3], rep))
        return j

    if (
        kind == "ident"
        and text.upper() == "FROM"
        and (
            i == 0
            or (toks[i - 1][0] == "op" and toks[i - 1][1] in ("(", ";"))
        )
    ):
        # duck FROM-first statements (pinned live, duckdb 1.0):
        #   FROM t [clauses...]            ≡ SELECT * FROM t [clauses]
        #   FROM t SELECT list [clauses]   — clauses only AFTER the
        #   select list (WHERE before SELECT is a duck parse error).
        # Spark's parser rejects both. The whole statement re-emits
        # with transpile()d fragments and a dead zone (same wholesale
        # convention as DISTINCT ON): the select list moves first,
        # the FROM clause in between, trailing clauses (incl. UNION
        # branches) after.
        depth = 0
        sel_j = None
        end_j = n
        for j in range(i + 1, n):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ == "(":
                depth += 1
            elif k_ == "op" and t_ == ")":
                depth -= 1
                if depth < 0:
                    end_j = j
                    break
            elif depth == 0 and k_ == "op" and t_ == ";":
                end_j = j
                break
            elif depth == 0 and k_ == "ident" and t_.upper() == "SELECT":
                sel_j = j
                break
        if any(e[1] >= start and e[0] <= toks[end_j - 1][3]
               for e in edits):
            return i + 1  # pending rewrites inside — next pass
        if sel_j is None:
            edits.append((start, start, "select * "))
            return i + 1
        # end of the whole statement (for the wholesale replacement)
        depth = 0
        for j in range(sel_j + 1, n):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ == "(":
                depth += 1
            elif k_ == "op" and t_ == ")":
                depth -= 1
                if depth < 0:
                    end_j = j
                    break
            elif depth == 0 and k_ == "op" and t_ == ";":
                end_j = j
                break
        else:
            end_j = n
        # select LIST ends at the first depth-0 clause keyword
        tail_j = end_j
        depth = 0
        for j in range(sel_j + 1, end_j):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ == "(":
                depth += 1
            elif k_ == "op" and t_ == ")":
                depth -= 1
            elif depth == 0 and k_ == "ident" and t_.upper() in (
                "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
                "QUALIFY", "WINDOW", "UNION", "EXCEPT", "INTERSECT",
            ):
                tail_j = j
                break
        tr = ctx.transpile
        # transpile the table-REF fragment, not the whole "from ..."
        # text: a fragment starting with FROM would re-enter this
        # handler and grow a spurious "select *"
        f_text = "from " + tr(
            sql[toks[i][3]: toks[sel_j][2]].strip(), ctx.read
        )
        sel_text = tr(
            sql[toks[sel_j][2]: toks[tail_j - 1][3]
                if tail_j > sel_j else toks[sel_j][3]], ctx.read
        )
        tail_text = (
            " " + tr(sql[toks[tail_j][2]: toks[end_j - 1][3]], ctx.read)
            if tail_j < end_j else ""
        )
        stmt_end = toks[end_j - 1][3]
        edits.append((start, stmt_end, f"{sel_text} {f_text}{tail_text}"))
        ctx.dead_zones.append((start, stmt_end))
        return end_j

    n_ = len(toks)
    if (
        kind == "op"
        and text == "-"
        and i >= 2
        and toks[i - 1][0] == "string"
        and toks[i - 2][0] == "ident"
        and toks[i - 2][1].upper() == "DATE"
        and i + 2 < n_
        and toks[i + 1][0] == "ident"
        and toks[i + 1][1].upper() == "DATE"
        and toks[i + 2][0] == "string"
    ):
        # duck DATE - DATE is INTEGER days (pinned live, round-10
        # operator probe — same as pg); Spark date subtraction returns
        # an INTERVAL. Literal shape → datediff; typed column
        # subtraction passes through (the INTERVAL result breaks
        # downstream arithmetic loudly, never silently). Mirrors the
        # pg handler in core/dialects/postgres.py.
        ls = toks[i - 2][2]
        re_ = toks[i + 2][3]
        if not any(e[1] >= ls and e[0] <= re_ for e in edits):
            edits.append((ls, ls, "datediff("))
            edits.append((start, ctx.end, ","))
            edits.append((re_, re_, ")"))
            return i + 3
        return i + 1

    if (
        kind == "ident"
        and text.upper() in ("ASOF", "POSITIONAL")
        and i + 1 < n_
        and toks[i + 1][0] == "ident"
        and toks[i + 1][1].upper() in ("JOIN", "LEFT", "RIGHT", "INNER")
    ):
        if text.upper() == "POSITIONAL":
            # duck POSITIONAL JOIN pairs rows by physical position —
            # no Spark SQL form (round 11; previously a parse error)
            raise TranspileError(
                "duckdb POSITIONAL JOIN has no Spark SQL form; add "
                "row_number() OVER () keys to both sides and equi-join"
            )
        # duck ASOF [LEFT] JOIN previously shipped verbatim into a
        # Spark parse error. No faithful textual rewrite exists (the
        # semantics are per-row nearest-preceding-match); loud with
        # the operator-level alternative this engine ships.
        raise TranspileError(
            "duckdb ASOF JOIN has no Spark SQL form; use the as-of "
            "join composition (bucketed range join + max_by — see "
            "sqlmesh_spark.operators.relational's asof cases) or a "
            "MERGE_ASOF-style window over a unioned stream"
        )

    if (
        kind == "ident"
        and text.upper() == "REPLACE"
        and i >= 1
        and toks[i - 1][0] == "op" and toks[i - 1][1] == "*"
        and i + 1 < n_
        and toks[i + 1][0] == "op" and toks[i + 1][1] == "("
    ):
        # SELECT * REPLACE (expr AS col): expanding it needs the
        # table's column list, which a textual transpiler doesn't
        # have (Spark's star modifier is EXCEPT only)
        raise TranspileError(
            "duckdb SELECT * REPLACE (...) has no Spark star "
            "modifier; list the columns explicitly"
        )

    if (
        kind == "ident"
        and text.upper() == "EXCLUDE"
        and not (i > 0 and toks[i - 1][0] == "op" and toks[i - 1][1] == "*")
        and i + 1 < n_
        and toks[i + 1][0] in _NAME_KINDS
        and toks[i + 1][1].upper() in ("CURRENT", "GROUP", "TIES", "NO")
    ):
        # window frame EXCLUDE clause (duckdb supports it like pg 11+);
        # Spark frames have no exclusion — loud before a raw parse
        # error. (`* EXCLUDE (...)` star modifiers rewrite to EXCEPT in
        # the main walker and never reach here.)
        raise TranspileError(
            "window frame EXCLUDE clauses have no Spark analog; "
            "re-express by subtracting the excluded rows' "
            "contribution explicitly"
        )

    if (
        kind == "ident"
        and text.lower() in (
            "int2", "int4", "int8", "float4", "float8", "real",
            "bool", "boolean", "numeric", "decimal", "text",
            "varchar", "json", "uuid", "smallint", "integer", "bigint",
        )
        and i + 1 < n_
        and toks[i + 1][0] == "string"
    ):
        # duckdb typed-literal spellings (numeric '12.34', bool 't',
        # int4 '2'... — all verified accepted) re-spell as '::' casts
        # so the duck cast machinery applies (bare numeric →
        # DECIMAL(18,3), string→int rounding, 0x folds). Previously
        # passed through into Spark's UNSUPPORTED_TYPED_LITERAL.
        lit = toks[i + 1][1]
        if not any(
            e[1] >= start and e[0] <= toks[i + 1][3] for e in edits
        ):
            edits.append(
                (start, toks[i + 1][3], f"({lit}::{text.lower()})")
            )
            return i + 2

    if (
        kind == "op" and text == "&"
        and i + 1 < n_
        and toks[i + 1][0] == "op" and toks[i + 1][1] == "&"
        and toks[i + 1][2] == ctx.end
    ):
        # duckdb `&&` list-overlap (lexes as two adjacent `&`; a lone
        # `&` stays bitwise AND). Pinned: NULL elements never overlap
        # ([1,NULL] && [NULL,2] = false), NULL operand → NULL — same
        # as pg's. Bracket-literal operands defer one pass (the
        # primary helpers return None until they're array(...) calls).
        from sqlmesh_spark.core.transpile_shared import (
            _forward_primary,
        )

        # absorb LHS ::type / ::type[] / ::ARRAY<...> cast suffixes
        # (the primary helpers don't span them — same shapes the pg
        # containment handler absorbs) and allow a bare NULL operand
        lj = i - 1
        while lj >= 0:
            if (
                lj >= 2
                and toks[lj][0] in _NAME_KINDS
                and toks[lj - 1][0] == "op" and toks[lj - 1][1] == "::"
            ):
                lj -= 2
                continue
            if (
                lj >= 3
                and toks[lj][0] == "op" and toks[lj][1] == "]"
                and toks[lj - 1][0] == "op" and toks[lj - 1][1] == "["
                and toks[lj - 2][0] in _NAME_KINDS
                and toks[lj - 3][0] == "op" and toks[lj - 3][1] == "::"
            ):
                lj -= 4
                continue
            if toks[lj][0] == "op" and toks[lj][1] == ">":
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
                    gj is not None and gj >= 2
                    and toks[gj - 1][0] in _NAME_KINDS
                    and toks[gj - 2][0] == "op"
                    and toks[gj - 2][1] == "::"
                ):
                    lj = gj - 3
                    continue
            break
        if (
            lj >= 0
            and toks[lj][0] in _NAME_KINDS
            and toks[lj][1].upper() == "NULL"
        ):
            lf = lj
        else:
            lf = (
                _backward_primary(toks, lj, include_unary=False)
                if lj >= 0 else None
            )
        rs = _forward_primary(toks, i + 2)
        if lf is not None and rs is not None:
            ls, le = toks[lf][2], toks[rs[1]][3]
            if not any(e[1] >= ls and e[0] <= le for e in edits):
                a_ = sql[ls: toks[i][2]].rstrip()
                b_ = sql[toks[rs[0]][2]: le]
                edits.append(
                    (ls, le,
                     f"IF(({a_}) IS NULL OR ({b_}) IS NULL, NULL, "
                     f"coalesce(arrays_overlap(({a_}), ({b_})), "
                     f"false))")
                )
                return rs[1] + 1
        return None

    if kind == "op" and text == "::":
        # duckdb DECIMAL→DECIMAL rescale TRUNCATES toward zero
        # (1.29::numeric(5,1) = 1.2, -1.25 → -1.2 — pinned; not a
        # tie-rounding nuance: every dropped digit diverges from
        # Spark's half-up CAST). Statically provable for decimal
        # LITERAL castees — quantize at transpile time. Decimal-typed
        # COLUMNS keep the pass-through (documented seam, same class
        # as untyped int division). double→decimal rescale ROUNDS in
        # duck and matches Spark natively.
        j = i + 1
        if (
            j + 1 < n_
            and toks[j][0] in _NAME_KINDS
            and toks[j][1].lower() in ("numeric", "decimal")
            and toks[j + 1][0] == "op" and toks[j + 1][1] == "("
        ):
            spans, close = _call_arg_spans(toks, j + 1)
            lit = None
            first_tok = None
            if i >= 1 and toks[i - 1][0] == "number":
                lit = toks[i - 1][1]
                first_tok = i - 1
            elif (
                i >= 4
                and toks[i - 1][0] == "op" and toks[i - 1][1] == ")"
                and toks[i - 2][0] == "number"
                and toks[i - 3][0] == "op" and toks[i - 3][1] in ("-", "+")
                and toks[i - 4][0] == "op" and toks[i - 4][1] == "("
            ):
                sign = "-" if toks[i - 3][1] == "-" else ""
                lit = sign + toks[i - 2][1]
                first_tok = i - 4
            if (
                lit is not None
                and "." in lit
                and "e" not in lit.lower()
                and len(spans) == 2
                and all(
                    sp[0] == sp[1] and toks[sp[0]][0] == "number"
                    for sp in spans
                )
                and not any(
                    e[1] >= toks[first_tok][2] and e[0] <= toks[close][3]
                    for e in edits
                )
            ):
                from decimal import ROUND_DOWN, Decimal

                p_ = int(toks[spans[0][0]][1])
                s_ = int(toks[spans[1][0]][1])
                q = Decimal(lit).quantize(
                    Decimal(1).scaleb(-s_), rounding=ROUND_DOWN
                )
                if len(str(q).lstrip("-").replace(".", "")) <= p_:
                    edits.append(
                        (toks[first_tok][2], toks[close][3],
                         f"CAST({q} AS DECIMAL({p_},{s_}))")
                    )
                    return close + 1

    if kind == "ident" and text.upper() == "INTERVAL":
        # date ± INTERVAL promotes to TIMESTAMP in duckdb too (pinned:
        # DATE '2024-01-31' + INTERVAL '1 month' is TIMESTAMP
        # 2024-02-29 00:00:00) — shared pg/duck handler
        from sqlmesh_spark.core.dialects.interval_promote import (
            date_interval_promote,
        )

        nxt = date_interval_promote(ctx)
        if nxt is not None:
            return nxt

    if kind == "ident" and text.lower() == "make_interval":
        # composition partner: mixed-family intervals decomposed to
        # make_interval(...) lose their INTERVAL trigger token — the
        # date operand must still promote (r11 verdict #3, duck_wave65)
        from sqlmesh_spark.core.dialects.interval_promote import (
            make_interval_date_promote,
        )

        nxt = make_interval_date_promote(ctx)
        if nxt is not None:
            return nxt

    if (
        kind == "ident"
        and text.upper() in ("PIVOT", "UNPIVOT", "PIVOT_WIDER")
        and (i == 0 or (toks[i - 1][0] == "op" and toks[i - 1][1] == "("))
        and i + 1 < n_
        and not (toks[i + 1][0] == "op" and toks[i + 1][1] == "(")
    ):
        # duckdb statement-level PIVOT t ON col USING agg (and UNPIVOT):
        # the simplified syntax derives the pivoted column VALUES from
        # the data at bind time — Spark's PIVOT clause (and this repo's
        # @PIVOT macro) need the value list spelled out. Previously
        # passed through verbatim into a confusing Spark parse error.
        # Spark's own `FROM t PIVOT (agg FOR c IN (...))` has '(' right
        # after the keyword and is untouched.
        raise TranspileError(
            f"duckdb statement-level {text.upper()} derives pivot "
            "values from the data; Spark needs them enumerated — use "
            "FROM t PIVOT (agg FOR col IN (values...)) or the @PIVOT "
            "macro"
        )

    if (
        kind == "ident"
        and text.upper() == "BY"
        and i >= 1
        and toks[i - 1][0] in _NAME_KINDS
        and toks[i - 1][1].upper() in (
            "UNION", "ALL", "EXCEPT", "INTERSECT", "DISTINCT",
        )
        and i + 1 < n_
        and toks[i + 1][0] in _NAME_KINDS
        and toks[i + 1][1].upper() == "NAME"
    ):
        # UNION [ALL] BY NAME matches columns positionally-by-NAME;
        # Spark set operations are positional only
        raise TranspileError(
            "duckdb set operations BY NAME have no Spark form; align "
            "the column lists positionally"
        )

    if kind == "op" and text == "{":
        depth = 0
        close_b = None
        for j in range(i, n):
            if toks[j][0] == "op" and toks[j][1] == "{":
                depth += 1
            elif toks[j][0] == "op" and toks[j][1] == "}":
                depth -= 1
                if depth == 0:
                    close_b = j
                    break
        if close_b is None:
            raise TranspileError("unbalanced { in duckdb struct literal")
        is_map = (
            i >= 1
            and toks[i - 1][0] in _NAME_KINDS
            and toks[i - 1][1].upper() == "MAP"
        )
        # split top-level entries on commas; each entry is key : value
        entries = []
        depth = 0
        entry_start = i + 1
        for j in range(i + 1, close_b + 1):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ in ("(", "[", "{"):
                depth += 1
            elif k_ == "op" and t_ in (")", "]"):
                depth -= 1
            elif k_ == "op" and t_ == "}" and j != close_b:
                depth -= 1
            elif depth == 0 and k_ == "op" and t_ in (",",) or j == close_b:
                if j > entry_start:
                    entries.append((entry_start, j - 1))
                entry_start = j + 1
        parts = []
        for s0, s1 in entries:
            colon = None
            depth = 0
            for j in range(s0, s1 + 1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ in ("(", "[", "{"):
                    depth += 1
                elif k_ == "op" and t_ in (")", "]", "}"):
                    depth -= 1
                elif depth == 0 and k_ == "op" and t_ == ":":
                    colon = j
                    break
            if colon is None or colon == s0 or colon == s1:
                raise TranspileError(
                    "duckdb struct/map literal entries need key: value"
                )
            key_toks = toks[s0:colon]
            val = sql[toks[colon + 1][2]: toks[s1][3]]
            if is_map:
                key = sql[toks[s0][2]: toks[colon][2]].rstrip()
                parts.append((f"({key})", f"({val})"))
            else:
                if not (
                    len(key_toks) == 1
                    and key_toks[0][0] in ("string", "ident", "qident")
                ):
                    raise TranspileError(
                        "duckdb struct literal keys must be single "
                        "names or strings"
                    )
                kt = key_toks[0]
                key = (
                    _literal_content(kt[1], "duckdb")
                    if kt[0] == "string" else kt[1]
                )
                parts.append(
                    f"{_spark_string_literal(key, 'duckdb')}, ({val})"
                )
        ls = toks[i - 1][2] if is_map else start
        if is_map:
            # map_from_arrays, NOT a variadic map(...) call: a
            # one-entry literal would otherwise collide with the
            # duckdb map(keys, values) 2-list rewrite above
            ks = ", ".join(k for k, _ in parts)
            vs = ", ".join(v for _, v in parts)
            repl = f"map_from_arrays(array({ks}), array({vs}))"
        else:
            repl = f"named_struct({', '.join(parts)})"
        if not any(e[1] >= ls and e[0] <= toks[close_b][3] for e in edits):
            edits.append((ls, toks[close_b][3], repl))
            return close_b + 1
        return None

    return None


def _glob_to_regex(p: str) -> str:
    """duck GLOB pattern → Java regex body (round 11, pinned live):
    case-sensitive; ``*`` any run, ``?`` one char, ``[...]`` classes
    with fnmatch-style ``[!...]`` negation, ``%``/``_`` LITERAL. An
    unterminated ``[`` matches a literal bracket."""
    out = []
    i2 = 0
    while i2 < len(p):
        c = p[i2]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j2 = i2 + 1
            cls = "["
            if j2 < len(p) and p[j2] == "!":
                cls += "^"
                j2 += 1
            while j2 < len(p) and p[j2] != "]":
                ch = p[j2]
                cls += ("\\" + ch) if ch in "\\[" else ch
                j2 += 1
            if j2 >= len(p):
                out.append("\\[")
                i2 += 1
                continue
            out.append(cls + "]")
            i2 = j2
        elif c in "\\.^$+{}()|":
            out.append("\\" + c)
        else:
            out.append(c)
        i2 += 1
    return "".join(out)


def _duck_match_operators(ctx) -> "int | None":
    """duck's match-operator tier (round 11, all pinned live —
    every form previously PASSED THROUGH into a Spark parse error):

      x ~ p      regexp FULL match ('abc' ~ 'b' is FALSE — unlike
                 pg's partial ~; same seam class as duck hash())
      x !~ p     negated full match
      x ~~ p     LIKE        (duck LIKE: NO default escape)
      x !~~ p    NOT LIKE
      x ~~~ p    GLOB        (also the GLOB keyword)
      x !~~~ p   NOT GLOB (operator only; the keyword form does not
                 parse in duck)
      x GLOB p   case-sensitive glob (*, ?, [..], [!..]; %/_ literal)
      x SIMILAR TO p   full-match against a PLAIN REGEX — duck's
                 pattern is NOT pg's SQL-regex ('a%' matches the
                 literal; 'a.*' matches) so the pg SIMILAR handler
                 must never run on the duck read

    Literal patterns only (the anchor/conversion must see the text);
    ~ run length disambiguates which operator. Unary ~ (bitwise NOT)
    is left untouched: binary requires a primary-ending token on the
    left."""
    toks, edits = ctx.toks, ctx.edits
    sql = ctx.sql
    i, kind, text = ctx.i, ctx.kind, ctx.text
    start = ctx.start
    n = len(toks)

    def _emit(lhs_start, lhs_end, pat_idx, end_idx, negate, mode):
        ptok = toks[pat_idx]
        if ptok[0] != "string":
            raise TranspileError(
                "duckdb match operators (~, ~~, ~~~, GLOB, SIMILAR "
                "TO) need a literal pattern to transpile"
            )
        if any(
            e[1] >= lhs_start and e[0] <= toks[end_idx][3]
            for e in edits
        ):
            return i + 1  # operand edited this pass; resolve next
        lhs_txt = sql[lhs_start:lhs_end].strip()
        content = _literal_content(ptok[1], "duckdb")
        neg = "NOT " if negate else ""
        if mode in ("like", "ilike"):
            # duck LIKE has NO default escape char (Spark's is
            # backslash) — double backslashes at the pattern level,
            # same as the shared duck LIKE literal handler
            lit = _spark_string_literal(
                content.replace("\\", "\\\\"), "duckdb"
            )
            kw = "ILIKE" if mode == "ilike" else "LIKE"
            repl = f"(({lhs_txt}) {neg}{kw} {lit})"
        else:
            if mode == "glob":
                body = _glob_to_regex(content)
            else:
                from sqlmesh_spark.core.transpile_text import (
                    convert_posix_classes,
                    convert_regex_literal,
                )
                body = convert_regex_literal(
                    convert_posix_classes(content), "duckdb"
                )
            lit = _spark_string_literal(f"^(?:{body})\\z", "duckdb")
            repl = f"({neg}(({lhs_txt}) RLIKE {lit}))"
        edits.append((lhs_start, toks[end_idx][3], repl))
        return end_idx + 1

    def _lhs_start(before_idx):
        lf = _backward_primary(toks, before_idx, include_unary=False)
        return None if lf is None else toks[lf][2]

    if kind == "op" and text in ("@>", "<@"):
        # duck list containment (round 11, pinned live): a @> b is
        # "every element of b appears in a", with NULL ELEMENTS
        # MATCHING ([1,NULL] @> [NULL] is true — unlike pg's strict
        # array @>), empty needle true, NULL operand NULL. The
        # standard grammar rejected '@' outright (the duck grammar
        # derivation adds the family). Bracket-literal operands defer
        # one pass until they are array(...) calls.
        from sqlmesh_spark.core.transpile_shared import (
            _forward_primary,
        )
        lf = (
            _backward_primary(toks, i - 1, include_unary=False)
            if i > 0 else None
        )
        rs = _forward_primary(toks, i + 1)
        if lf is None or rs is None:
            return None
        if any(
            e[1] >= toks[lf][2] and e[0] <= toks[rs[1]][3]
            for e in edits
        ):
            return i + 1
        a_ = sql[toks[lf][2]:toks[i - 1][3]].strip()
        b_ = sql[toks[rs[0]][2]:toks[rs[1]][3]].strip()
        if text == "<@":
            a_, b_ = b_, a_
        # trailing '= TRUE' is the boolean-castee classifier no-op
        # (the jsonb-? class): without it (l @> [2])::int round()-
        # wraps the IF and fails analysis
        edits.append(
            (toks[lf][2], toks[rs[1]][3],
             f"(IF(({a_}) IS NULL OR ({b_}) IS NULL, NULL, "
             f"forall(({b_}), _ce -> exists(({a_}), "
             f"_ca -> _ca <=> _ce))) = TRUE)")
        )
        return rs[1] + 1

    if kind == "op" and text == "^@":
        # duck ^@ starts-with (round 11, pinned live)
        from sqlmesh_spark.core.transpile_shared import (
            _forward_primary,
        )
        lf = (
            _backward_primary(toks, i - 1, include_unary=False)
            if i > 0 else None
        )
        rs = _forward_primary(toks, i + 1)
        if lf is None or rs is None:
            return None
        if any(
            e[1] >= toks[lf][2] and e[0] <= toks[rs[1]][3]
            for e in edits
        ):
            return i + 1
        a_ = sql[toks[lf][2]:toks[i - 1][3]].strip()
        b_ = sql[toks[rs[0]][2]:toks[rs[1]][3]].strip()
        edits.append(
            (toks[lf][2], toks[rs[1]][3],
             f"(startswith(({a_}), ({b_})) = TRUE)")
        )
        return rs[1] + 1

    if kind == "op" and text == "@":
        # duck unary @ = abs (round 11, pinned live: @ -5.5 is 5.5)
        from sqlmesh_spark.core.transpile_shared import (
            _forward_primary,
        )
        rs = _forward_primary(toks, i + 1)
        if rs is None:
            return None
        if any(
            e[1] >= start and e[0] <= toks[rs[1]][3] for e in edits
        ):
            return i + 1
        b_ = sql[toks[rs[0]][2]:toks[rs[1]][3]].strip()
        edits.append(
            (start, toks[rs[1]][3], f"abs(({b_}))")
        )
        return rs[1] + 1

    if kind == "ident" and text.upper() == "GLOB":
        if i + 1 >= n or i == 0:
            return None
        ls = _lhs_start(i - 1)
        if ls is None:
            return None
        return _emit(ls, toks[i - 1][3], i + 1, i + 1, False, "glob")

    if kind == "ident" and text.upper() == "SIMILAR":
        if not (
            i + 2 < n
            and toks[i + 1][0] in _NAME_KINDS
            and toks[i + 1][1].upper() == "TO"
        ) or i == 0:
            return None
        negate = False
        back = i - 1
        if (
            toks[back][0] in _NAME_KINDS
            and toks[back][1].upper() == "NOT"
        ):
            negate = True
            back -= 1
        if (
            i + 3 < n
            and toks[i + 3][0] in _NAME_KINDS
            and toks[i + 3][1].upper() == "ESCAPE"
        ):
            raise TranspileError(
                "duckdb SIMILAR TO ... ESCAPE has no regex rewrite "
                "(duck patterns are plain regexes; escape inline)"
            )
        ls = _lhs_start(back)
        if ls is None:
            return None
        return _emit(ls, toks[back][3], i + 2, i + 2, negate, "regex")

    if kind == "op" and text == "~":
        # only the FIRST ~ of a run dispatches (a preceding adjacent
        # ~ means an earlier ~ owns the operator; a preceding
        # adjacent ! is the NEGATED form — duck's postfix-factorial !
        # is never adjacent to a following ~)
        prev = toks[i - 1] if i > 0 else None
        if (
            prev is not None
            and prev[0] == "op"
            and prev[1] == "~"
            and prev[3] == start
        ):
            return None
        run = 1
        while (
            i + run < n
            and toks[i + run][0] == "op"
            and toks[i + run][1] == "~"
            and toks[i + run][2] == toks[i + run - 1][3]
        ):
            run += 1
        if run > 3:
            return None
        ilike = False
        if (
            run == 2
            and i + run < n
            and toks[i + run][0] == "op"
            and toks[i + run][1] == "*"
            and toks[i + run][2] == toks[i + run - 1][3]
        ):
            # duck ~~* / !~~* are the ILIKE aliases (pinned live)
            ilike = True
        negate = False
        back = i - 1
        if (
            prev is not None
            and prev[0] == "op"
            and prev[1] == "!"
            and prev[3] == start
        ):
            negate = True
            back = i - 2
        if back < 0:
            return None
        # binary only: the left neighbour must END a primary
        lt = toks[back]
        if not (
            lt[0] in ("ident", "qident", "bquote", "dquote",
                      "number", "string")
            or (lt[0] == "op" and lt[1] in (")", "]"))
        ):
            return None  # unary bitwise NOT — Spark-native
        pat_idx = i + run
        if pat_idx >= n:
            return None
        ls = _lhs_start(back)
        if ls is None:
            return None
        if ilike:
            pat_idx += 1
        mode = (
            "ilike" if ilike
            else {1: "regex", 2: "like", 3: "glob"}[run]
        )
        return _emit(ls, toks[back][3], pat_idx, pat_idx, negate, mode)

    return None
