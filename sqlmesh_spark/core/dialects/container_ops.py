"""Container-access token handlers shared by the pg-family reads
(pre-split code, verbatim): bracket syntax — list literals → array(...),
1-based subscripts → element_at — for duckdb/postgres (snowflake/
bigquery bare subscripts are 0-based, Spark-native, and pass through),
and the duckdb/postgres/mysql JSON extraction arrows (-> / ->>).

Moved out of core/transpile.py (round 8, restoring the round-6 module
discipline: every transpile-family module <= 1,100 lines); handler
bodies are unchanged (continue -> return i), so file:line references in
docstrings and VERDICT history still resolve against git history.
"""

from __future__ import annotations

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _NONCALLABLE_KEYWORDS,
    _backtrack_primary,
    _backward_primary,
    _call_args,
    _call_arg_spans,
    _in_lambda_hof,
    _json_key_to_path,
    _match_bracket,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _spark_string_literal,
)


def _row_constructor_lhs(toks, i: int):
    """For an operator token at ``i`` whose previous token is ``)``:
    the (start_token, open_paren, arg_spans) of a ROW-CONSTRUCTOR left
    operand — a bare parenthesized list with >= 2 top-level elements,
    or an explicit ROW(...) — else None (call args, subscripts and
    single-expression parens are not rows)."""
    depth = 0
    l_open = None
    for j in range(i - 1, -1, -1):
        if toks[j][0] == "op" and toks[j][1] == ")":
            depth += 1
        elif toks[j][0] == "op" and toks[j][1] == "(":
            depth -= 1
            if depth == 0:
                l_open = j
                break
    if l_open is None:
        return None
    l_start_tok = l_open
    if l_open >= 1:
        prev = toks[l_open - 1]
        if prev[0] in _NAME_KINDS and prev[1].upper() == "ROW":
            l_start_tok = l_open - 1
        elif (
            prev[0] in _NAME_KINDS
            and prev[1].upper() not in _NONCALLABLE_KEYWORDS
        ) or (prev[0] == "op" and prev[1] in (")", "]", "}")):
            return None
    spans, _close = _call_arg_spans(toks, l_open)
    if len(spans) < 2 and l_start_tok == l_open:
        return None
    if any(
        toks[s_][0] in _NAME_KINDS and toks[s_][1].upper() == "SELECT"
        for s_, _e in spans
    ):
        return None
    return l_start_tok, l_open, spans


def token_handlers(ctx) -> "int | None":
    """Bracket/arrow handlers; returns the next scan index when a
    construct was consumed/edited, None to fall through."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i = ctx.i
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (first_pass, _arg_text, transpile)

    # Bracket syntax: list literals → array(...), subscripts (1-based
    # in DuckDB/Postgres, matching element_at) → element_at(...).
    # Snowflake/BigQuery bare subscripts are 0-BASED — exactly Spark's
    # native arr[i] semantics — so for those reads subscripts pass
    # through untouched (rewriting via 1-based element_at would be a
    # silent off-by-one); only the bracket LITERAL forms rewrite.
    if kind == "op" and text == "[":
        if read == "mysql":
            raise TranspileError(
                "mysql has no array/bracket expression syntax; "
                "brackets in mysql-dialect model SQL are not "
                "transpilable"
            )
        close = _match_bracket(toks, i)
        # Array slice syntax x[a:b]: pg and duckdb are both 1-based
        # INCLUSIVE with clamping (([1,2,3])[0:2] = {1,2}, [2:9] =
        # {2,3}, [3:2] = {}, verified live on both) — for LITERAL
        # non-negative bounds this maps exactly to Spark slice(x, A,
        # b-A+1) with A = max(a,1); an open upper bound ([a:]) needs
        # size(x), bound once via the struct trick. Negative bounds
        # DIVERGE between the engines (duckdb counts from the end,
        # pg clamps) and expression bounds are statically invisible —
        # both stay LOUD.
        bdepth = 0
        colon_j = None
        for j in range(i + 1, close):
            k_, t_, _, _ = toks[j]
            if k_ == "op" and t_ in ("(", "["):
                bdepth += 1
            elif k_ == "op" and t_ in (")", "]"):
                bdepth -= 1
            elif bdepth == 0 and k_ == "op" and t_ == ":":
                colon_j = j
                break
        if colon_j is not None:
            prev = toks[i - 1] if i > 0 else None
            lo_ok = colon_j == i + 1 or (
                colon_j == i + 2
                and toks[i + 1][0] == "number"
                and toks[i + 1][1].isdigit()
            )
            hi_ok = colon_j == close - 1 or (
                colon_j == close - 2
                and toks[close - 1][0] == "number"
                and toks[close - 1][1].isdigit()
            )
            anchorable = prev is not None and (
                (prev[0] in _NAME_KINDS
                 and prev[1].upper() not in _NONCALLABLE_KEYWORDS)
                or (prev[0] == "op" and prev[1] in (")", "]", "}"))
            )
            if (
                read not in ("duckdb", "postgres")
                or not (lo_ok and hi_ok)
                or not anchorable
            ):
                raise TranspileError(
                    "array slice syntax [a:b] rewrites only for "
                    "literal non-negative bounds (negative bounds "
                    "diverge between duckdb and pg); use "
                    "slice(arr, start, length) explicitly"
                )
            if prev[0] == "op":
                j = _backtrack_primary(toks, i - 1)
            else:
                j = i - 1
                while (
                    j >= 2
                    and toks[j - 1][0] == "op" and toks[j - 1][1] == "."
                    and toks[j - 2][0] in _NAME_KINDS
                ):
                    j -= 2
            if j is None or any(e[1] >= toks[j][2] and e[0] <= toks[close][3]
                                for e in edits):
                i += 1  # defer to the next fixpoint pass
                return i
            a = int(toks[i + 1][1]) if colon_j == i + 2 else 1
            a = max(a, 1)
            # statically-STRING base (round 10): duck slices VARCHAR
            # with the same 1-based inclusive clamped [a:b] ('hello'
            # [2:4] = 'ell', [4:2] = '', [2:99] = 'ello' — pinned
            # live); Spark's slice() is array-only, so the previous
            # emission was a type error. substring(s, a, len) has the
            # identical clamp behavior; open upper bound is the 2-arg
            # to-end form. Column bases stay on the array path (lists
            # are the common case; a string column slice arrives as a
            # Spark type error, not a silent value).
            str_base = (
                toks[j][0] == "string"
                or (
                    toks[j][0] == "op" and toks[j][1] == "("
                    and j + 2 == i - 1
                    and toks[j + 1][0] == "string"
                    and toks[j + 2][0] == "op" and toks[j + 2][1] == ")"
                )
            )
            if colon_j == close - 2:
                b = int(toks[close - 1][1])
                length = b - a + 1
                if length <= 0:
                    a, length = 1, 0
                if str_base:
                    # keyword FROM/FOR form: inert on fixpoint
                    # re-reads (the duck 3-arg comma form would be
                    # rewrapped by the substring fidelity handler)
                    edits.append((toks[j][2], toks[j][2], "substring("))
                    edits.append(
                        (start, toks[close][3], f" FROM {a} FOR {length})")
                    )
                else:
                    edits.append((toks[j][2], toks[j][2], "slice("))
                    edits.append(
                        (start, toks[close][3], f", {a}, {length})")
                    )
            elif str_base:
                edits.append((toks[j][2], toks[j][2], "substring("))
                edits.append((start, toks[close][3], f" FROM {a})"))
            else:
                edits.append((
                    toks[j][2], toks[j][2],
                    "element_at(transform(array(struct((",
                ))
                edits.append((
                    start, toks[close][3],
                    f") AS _sl)), _t -> slice(_t._sl, {a}, "
                    f"greatest(size(_t._sl) - {a} + 1, 0))), 1)",
                ))
            i = close + 1
            return i
        prev = toks[i - 1] if i > 0 else None
        # Redshift SUPER-array subscripts are 0-based too (pass-through
        # = Spark's native semantics).
        zero_based = read in ("snowflake", "bigquery", "redshift")
        # DuckDB string subscript: 'abc'[2] is 1-based single-char
        # extraction. Pinned live (duckdb 1.0): negative counts from
        # the end, index 0 and out-of-bounds give '' (EMPTY, not NULL)
        # — Spark substring matches everywhere EXCEPT index 0
        # (substring(s, 0, 1) is the FIRST char), so a literal 0 emits
        # '' and an expression index gets an if-guard.
        if prev is not None and prev[0] == "string" and not zero_based:
            idx_static = None
            if close == i + 2 and toks[i + 1][0] == "number":
                idx_static = toks[i + 1][1]
            elif (
                close == i + 3 and is_op(i + 1, "-")
                and toks[i + 2][0] == "number"
            ):
                idx_static = "-" + toks[i + 2][1]
            # keyword FROM/FOR spelling: inert on fixpoint re-reads
            # (the comma form is rewrapped by the duck substring
            # fidelity handler — same convention as the slice rewrite)
            if idx_static is not None and idx_static.lstrip("-") == "0":
                edits.append((prev[2], toks[close][3], "''"))
            elif idx_static is not None:
                edits.append((prev[2], prev[2], "substring("))
                edits.append((start, end, " FROM "))
                edits.append((toks[close][2], toks[close][3], " FOR 1)"))
            else:
                lit = sql[prev[2]: prev[3]]
                idx = sql[toks[i][3]: toks[close][2]]
                edits.append(
                    (prev[2], toks[close][3],
                     f"if(({idx}) = 0, '', "
                     f"substring({lit} FROM ({idx}) FOR 1))")
                )
            i += 1
            return i
        # Postgres/DuckDB ARRAY[...] literal
        if prev is not None and prev[0] == "ident" and prev[1].lower() == "array":
            edits.append((prev[2], end, "array("))
            edits.append((toks[close][2], toks[close][3], ")"))
            i += 1
            return i
        is_subscript = (
            prev is not None
            and (
                (
                    prev[0] in _NAME_KINDS
                    and prev[1].upper() not in _NONCALLABLE_KEYWORDS
                )
                or (prev[0] == "op" and prev[1] in (")", "]", "}"))
            )
        )
        if not is_subscript:
            edits.append((start, end, "array("))
            edits.append((toks[close][2], toks[close][3], ")"))
            i += 1
            return i
        if read == "clickhouse":
            # CH subscripts return the element type's DEFAULT (0, '')
            # out of bounds / for a missing map key — the common
            # arr[indexOf(keys, k)] idiom RELIES on arr[0] being the
            # default. element_at raises for index 0 and (under
            # Spark 4 ANSI) out of bounds — same loud stance as the
            # arrayElement() function spelling.
            raise TranspileError(
                "clickhouse [..] subscripts return the element "
                "type's default out of bounds; no faithful Spark "
                "rewrite — use try_element_at + coalesce explicitly"
            )
        if prev[0] == "op":
            j = _backtrack_primary(toks, i - 1)
        else:
            j = i - 1
            while (
                j >= 2
                and toks[j - 1][0] == "op" and toks[j - 1][1] == "."
                and toks[j - 2][0] in _NAME_KINDS
            ):
                j -= 2
        if zero_based:
            # BigQuery arr[SAFE_OFFSET(i)] / arr[SAFE_ORDINAL(i)]
            # return NULL out of bounds (plain subscripts error under
            # ANSI) → try_element_at, compensating its 1-based index.
            if (
                read == "bigquery"
                and j is not None
                and toks[i + 1][0] == "ident"
                and toks[i + 1][1].lower() in ("safe_offset", "safe_ordinal")
                and is_op(i + 2, "(")
                and not any(e[0] >= toks[j][2] for e in edits)
            ):
                fn_close = _call_args(toks, i + 2)[-1]
                if fn_close == close - 1:
                    safe_name = toks[i + 1][1].lower()
                    edits.append((toks[j][2], toks[j][2], "try_element_at("))
                    # `[ SAFE_OFFSET (` → `, (`
                    edits.append((start, toks[i + 2][3], ", ("))
                    if safe_name == "safe_offset":
                        # 0-based → 1-based
                        edits.append(
                            (toks[fn_close][2], toks[close][3], ") + 1)")
                        )
                    else:
                        edits.append(
                            (toks[fn_close][2], toks[close][3], "))")
                        )
                    i += 1
                    return i
            # Otherwise Spark's arr[i] is 0-based like
            # Snowflake/BigQuery — pass the subscript through
            # (OFFSET/ORDINAL wrappers are compensated by their own
            # handlers).
            i += 1
            return i
        if j is None or any(e[0] >= toks[j][2] for e in edits):
            i += 1  # defer the bracket to the next fixpoint pass
            return i
        if read in ("duckdb", "postgres"):
            # DuckDB/Postgres subscripts return NULL out of bounds
            # AND for index 0 (verified: ([1,2,3])[10] → NULL,
            # ([1,2,3])[0] → NULL); Spark-4 ANSI element_at raises
            # on both (try_element_at still raises for index 0) →
            # try_element_at + nullif(i, 0). DuckDB resolves
            # NEGATIVE indexes from the end (matching
            # try_element_at); Postgres returns NULL for them —
            # greatest(i, 0) folds every non-positive index into
            # the NULL arm. Trino/ANSI keep plain element_at below:
            # their bracket subscripts ERROR out of bounds, which
            # ANSI element_at matches.
            if (
                read == "duckdb"
                and toks[j][0] in _NAME_KINDS
                and toks[j][1].lower() in (
                    "map", "map_from_arrays", "map_from_entries",
                )
            ):
                # duckdb map[k] returns a LIST of matching values
                # ([] when the key is absent), NOT the element.
                # Statically visible only when the base IS a map
                # constructor call (column bases are untyped text).
                # try_element_at == element_at under the contains-key
                # guard, and (not being a duck name) it stays inert on
                # fixpoint re-reads where a bare element_at(m, k) would
                # re-dispatch into the duck map-access handler.
                base = sql[toks[j][2]: start]
                key = sql[toks[i][3]: toks[close][2]]
                edits.append(
                    (toks[j][2], toks[close][3],
                     f"IF(map_contains_key(({base}), ({key})), "
                     f"array(try_element_at(({base}), ({key}))), "
                     f"array())")
                )
                i = close + 1
                return i
            if (
                read == "duckdb"
                and toks[j][0] == "op" and toks[j][1] == "("
                and j + 2 == i - 1
                and toks[j + 1][0] == "string"
                and toks[j + 2][0] == "op" and toks[j + 2][1] == ")"
            ):
                # parenthesized-STRING base: duck single-subscript on
                # VARCHAR (1-based char extraction; index 0/OOB → '',
                # negative from the end — pinned live; round-10
                # SPARK_ERR: try_element_at rejects string bases).
                # substring matches everywhere except index 0
                # (substring(s, 0, 1) is the FIRST char) → if-guard.
                lit = sql[toks[j][2]: toks[j + 2][3]]
                idx = sql[toks[i][3]: toks[close][2]]
                edits.append(
                    (toks[j][2], toks[close][3],
                     f"if(({idx}) = 0, '', "
                     f"substring({lit} FROM ({idx}) FOR 1))")
                )
                i = close + 1
                return i
            if close == i + 1 + 1 and toks[i + 1][0] == "string":
                # duckdb struct['field'] / map['key'], postgres
                # jsonb['key']: a string-literal subscript is KEY
                # access — try_element_at's nullif('k', 0) guard is
                # a string-vs-int comparison that fails under ANSI
                # at EXECUTION; raise at render instead. (duckdb
                # map[k] additionally returns a LIST, not the
                # element — no faithful element_at form at all.)
                raise TranspileError(
                    f"{read} ['...'] string-key subscripts (struct/"
                    "map/jsonb key access) have no faithful Spark "
                    "element_at rewrite; use dot access for struct "
                    "fields or ->> for JSON keys"
                )
            edits.append((toks[j][2], toks[j][2], "try_element_at("))
            if read == "postgres":
                edits.append((start, end, ", nullif(greatest("))
                edits.append((toks[close][2], toks[close][3], ", 0), 0))"))
            else:
                edits.append((start, end, ", nullif("))
                edits.append((toks[close][2], toks[close][3], ", 0))"))
            i += 1
            return i
        edits.append((toks[j][2], toks[j][2], "element_at("))
        edits.append((start, end, ", "))
        edits.append((toks[close][2], toks[close][3], ")"))
        i += 1  # keep scanning inside the subscript expression
        return i


    # Row-constructor [NOT] IN over a VALUE list: pg/duckdb evaluate
    # (a,b) IN ((x,y), ...) as OR'd row equalities with three-valued
    # logic — verified live: (1,NULL) NOT IN ((1,2)) is NULL in pg (row
    # FILTERED by WHERE) where Spark's struct-IN says TRUE (row KEPT) —
    # a silent flip. Expanded like the comparison handler below; a
    # subquery RHS is untouched (Spark's null-aware semi/anti joins
    # already implement SQL 3VL for IN (SELECT ...)).
    if (
        read in ("duckdb", "postgres")
        and kind == "ident"
        and text.upper() == "IN"
        and i >= 1
    ):
        neg = (
            toks[i - 1][0] in _NAME_KINDS
            and toks[i - 1][1].upper() == "NOT"
        )
        p_idx = i - 2 if neg else i - 1
        if (
            p_idx >= 0
            and toks[p_idx][0] == "op"
            and toks[p_idx][1] == ")"
            and i + 1 < n
            and toks[i + 1][0] == "op"
            and toks[i + 1][1] == "("
        ):
            lhs = _row_constructor_lhs(toks, p_idx + 1)
            if lhs is not None:
                l_start_tok, l_open, l_spans = lhs
                out_spans, out_close = _call_arg_spans(toks, i + 1)
                rows = []
                ok = len(out_spans) >= 1
                for s_, e_ in out_spans:
                    first = s_
                    if (
                        toks[first][0] in _NAME_KINDS
                        and toks[first][1].upper() == "ROW"
                    ):
                        first += 1
                    if not (
                        toks[first][0] == "op" and toks[first][1] == "("
                        and toks[e_][0] == "op" and toks[e_][1] == ")"
                    ):
                        ok = False
                        break
                    r_spans, r_close = _call_arg_spans(toks, first)
                    if r_close != e_ or any(
                        toks[s2][0] in _NAME_KINDS
                        and toks[s2][1].upper() == "SELECT"
                        for s2, _e2 in r_spans
                    ):
                        ok = False
                        break
                    if len(r_spans) != len(l_spans):
                        raise TranspileError(
                            "row IN with unequal row lengths "
                            f"({len(l_spans)} vs {len(r_spans)})"
                        )
                    rows.append(r_spans)
                if ok and rows:
                    ls = toks[l_start_tok][2]
                    re_ = toks[out_close][3]
                    if not any(e[1] >= ls and e[0] <= re_ for e in edits):
                        lt = [_arg_text(sp) for sp in l_spans]
                        binds = [
                            f"({t}) AS _r{k}" for k, t in enumerate(lt)
                        ]
                        ors = []
                        for ri, r_spans in enumerate(rows):
                            rts = [_arg_text(sp) for sp in r_spans]
                            binds += [
                                f"({t}) AS _s{ri}_{m}"
                                for m, t in enumerate(rts)
                            ]
                            ors.append("(" + " AND ".join(
                                f"_t._r{m} = _t._s{ri}_{m}"
                                for m in range(len(lt))
                            ) + ")")
                        body = " OR ".join(ors)
                        if neg:
                            body = f"NOT ({body})"
                        edits.append((
                            ls, re_,
                            "element_at(transform(array(struct("
                            + ", ".join(binds)
                            + f")), _t -> {body}), 1)",
                        ))
                        i = out_close + 1
                        return i
                i += 1
                return i

    # Row-constructor comparisons: pg AND duckdb compare (a,b) <op>
    # (c,d) field-by-field with SQL three-valued logic — verified live
    # on both: (1,NULL) = (1,2) is NULL, (1,NULL) < (1,0) is NULL,
    # (NULL,1) = (NULL,1) is NULL. Spark's STRUCT comparison instead
    # treats NULL as an ordinary smallest value (false/true/true for
    # the same probes) — a silent flip whenever a row field is NULL
    # (tuple keyset pagination is the everyday shape). Expand to the
    # SQL-standard form with every element bound ONCE via the struct
    # trick: `=` → pairwise AND, `<>` → pairwise OR, orderings →
    # lexicographic strict-or-equal recursion.
    if (
        read in ("duckdb", "postgres")
        and kind == "op"
        and text in ("=", "<>", "!=", "<", ">", "<=", ">=")
        and i >= 1
        and toks[i - 1][0] == "op"
        and toks[i - 1][1] == ")"
        and i + 1 < n
        and (
            (toks[i + 1][0] == "op" and toks[i + 1][1] == "(")
            or (
                toks[i + 1][0] in _NAME_KINDS
                and toks[i + 1][1].upper() == "ROW"
                and is_op(i + 2, "(")
            )
        )
    ):
        # LHS group: backward-match to its opener
        depth = 0
        l_open = None
        for j in range(i - 1, -1, -1):
            if toks[j][0] == "op" and toks[j][1] == ")":
                depth += 1
            elif toks[j][0] == "op" and toks[j][1] == "(":
                depth -= 1
                if depth == 0:
                    l_open = j
                    break
        lhs_row = l_open is not None
        l_start_tok = l_open
        if lhs_row and l_open >= 1:
            prev = toks[l_open - 1]
            if prev[0] in _NAME_KINDS and prev[1].upper() == "ROW":
                l_start_tok = l_open - 1  # explicit ROW(...) constructor
            elif (
                prev[0] in _NAME_KINDS
                and prev[1].upper() not in _NONCALLABLE_KEYWORDS
            ) or (prev[0] == "op" and prev[1] in (")", "]", "}")):
                lhs_row = False  # call args / subscript, not a row
        if lhs_row:
            l_spans, l_close = _call_arg_spans(toks, l_open)
            r_open = i + 2 if toks[i + 1][0] in _NAME_KINDS else i + 1
            r_first = i + 1
            r_spans, r_close = _call_arg_spans(toks, r_open)
            is_select = lambda sp: any(  # noqa: E731
                toks[k][0] in _NAME_KINDS
                and toks[k][1].upper() == "SELECT"
                for s_, e_ in sp for k in (s_,)
            )
            if (
                len(l_spans) >= 2
                and not is_select(l_spans)
                and not is_select(r_spans)
            ):
                if len(r_spans) != len(l_spans):
                    raise TranspileError(
                        "row comparison with unequal row lengths "
                        f"({len(l_spans)} vs {len(r_spans)})"
                    )
                ls = toks[l_start_tok][2]
                re_ = toks[r_close][3]
                if not any(e[1] >= ls and e[0] <= re_ for e in edits):
                    lt = [_arg_text(sp) for sp in l_spans]
                    rt = [_arg_text(sp) for sp in r_spans]
                    binds = ", ".join(
                        f"({t}) AS _r{k}" for k, t in enumerate(lt)
                    ) + ", " + ", ".join(
                        f"({t}) AS _s{k}" for k, t in enumerate(rt)
                    )
                    nn = len(lt)
                    L = [f"_t._r{k}" for k in range(nn)]
                    R = [f"_t._s{k}" for k in range(nn)]
                    op = "<>" if text == "!=" else text
                    if op == "=":
                        body = " AND ".join(
                            f"{L[k]} = {R[k]}" for k in range(nn)
                        )
                    elif op == "<>":
                        body = " OR ".join(
                            f"{L[k]} <> {R[k]}" for k in range(nn)
                        )
                    else:
                        strict = op[0]  # '<' or '>'

                        def lex(k: int) -> str:
                            if k == nn - 1:
                                return f"{L[k]} {op} {R[k]}"
                            return (
                                f"{L[k]} {strict} {R[k]} OR "
                                f"({L[k]} = {R[k]} AND ({lex(k + 1)}))"
                            )

                        body = lex(0)
                    edits.append((
                        ls, re_,
                        "element_at(transform(array(struct("
                        f"{binds})), _t -> {body}), 1)",
                    ))
                    i = r_close + 1
                    return i
            i += 1
            return i

    # duckdb/postgres/mysql JSON extraction arrows: j ->> k (text)
    # maps to get_json_object — EXACT for scalar results (unquoted,
    # 0-based $[n] indexes); object/array results re-serialize in
    # Spark's compact form, which matches duckdb byte-for-byte but
    # can differ in whitespace/key order from postgres-json source
    # text and mysql's normalized printing (the mapping SQLGlot
    # ships; documented divergence — scalars, the common case, are
    # exact everywhere). A contiguous literal chain
    # j -> 'a' -> 'b' ->> 'c' folds into ONE combined JsonPath
    # ($['a']['b']['c']) so Spark navigates the ORIGINAL document —
    # this matches the source engines when an intermediate hop is a
    # JSON string scalar (both stop with NULL; per-hop nesting
    # would unquote the scalar text and keep navigating). A terminal
    # -> is LOUD (its JSON-typed text form quotes string scalars),
    # and a chain interrupted by parentheses is LOUD too (the
    # combined path cannot see through the grouping, and per-hop
    # nesting diverges on string-scalar hops). Negative integer
    # indexes (pg/duckdb count from the end) have no Spark JsonPath
    # form — LOUD. An arrow chained onto ->> TEXT output re-parses:
    # duckdb's VARCHAR→JSON implicit cast does exactly that (nested
    # get_json_object is exact, resolved on the next fixpoint pass);
    # postgres/mysql reject arrows on text — LOUD. Lambda arrows
    # (x -> expr inside transform/filter/...) are excluded.
    # Non-literal keys pass through untouched (Spark's parser
    # rejects them — loud at render/analysis).
    if (
        read in ("duckdb", "postgres", "mysql")
        and kind == "op"
        and text == "->"
    ):
        arrow2 = is_op(i + 1, ">") and toks[i + 1][2] == end
        rhs_idx = i + (2 if arrow2 else 1)
        rhs = toks[rhs_idx] if rhs_idx < n else None
        lfirst = (
            _backward_primary(toks, i - 1, include_unary=False)
            if i > 0 else None
        )
        if (
            lfirst is not None
            and lfirst > 0
            and toks[lfirst - 1][0] == "op"
            and (
                toks[lfirst - 1][1] in ("->", "#>", "#>>")
                or (
                    # the trailing > of a split ->> pair; a bare
                    # comparison > is NOT an arrow tail
                    toks[lfirst - 1][1] == ">"
                    and lfirst >= 2
                    and toks[lfirst - 2][0] == "op"
                    and toks[lfirst - 2][1] == "->"
                    and toks[lfirst - 2][3] == toks[lfirst - 1][2]
                )
            )
        ):
            # the "primary" is itself the RHS of a preceding JSON
            # operator (j -> 'a' ->> 'b' seen at the SECOND arrow
            # when the first deferred to the next pass on a pending
            # LHS edit) — never fold from mid-chain; the left arrow
            # owns the whole chain
            i += 1
            return i
        if (
            rhs is not None
            and lfirst is not None
            and not _in_lambda_hof(toks, lfirst)
            and rhs[0] == "op"
            and rhs[1] == "-"
            and rhs_idx + 1 < n
            and toks[rhs_idx + 1][0] == "number"
        ):
            if read == "mysql":
                raise TranspileError(
                    "mysql JSON arrows take '$...' path strings"
                )
            num_idx = rhs_idx + 1
            after = toks[num_idx + 1] if num_idx + 1 < n else None
            terminal = not (
                after is not None
                and after[0] == "op"
                and after[1] in ("->", "#>", "#>>")
            )
            if terminal and toks[num_idx][1].isdigit():
                if any(
                    e[1] >= toks[lfirst][2] and e[0] <= toks[num_idx][3]
                    for e in edits
                ):
                    # LHS edited this pass (e.g. ::json → ::STRING);
                    # defer — the next fixpoint pass sees it clean
                    return i + 1
                # Terminal single-hop negative index, pinned live
                # (round 11, wave 45): pg counts from the END
                # ('[10,20,30]' ->> -1 is '30', out-of-range NULL) —
                # emitted as a DYNAMIC JsonPath over
                # json_array_length (get_json_object accepts
                # non-foldable paths; a non-array LHS gives NULL
                # length -> NULL path -> NULL, matching pg). duckdb
                # 1.x has NO from-end semantics (->> -1 is NULL,
                # pinned) — the static '$[-N]' path returns NULL in
                # Spark too. The LHS text is referenced twice on the
                # pg read (length + extract) — fine for a scan
                # column, hoist an expensive LHS yourself. ->> only;
                # a -> hop with a negative index stays loud (its
                # JSON-typed output shape differs per scalar type).
                if not arrow2:
                    raise TranspileError(
                        f"negative JSON index on -> in {read}: "
                        "extract with ->> (text) instead; the "
                        "JSON-typed -> output has no Spark form"
                    )
                lhs_text = sql[toks[lfirst][2]:toks[i][2]].strip()
                neg = toks[num_idx][1]
                if read == "duckdb":
                    repl = (
                        f"get_json_object(({lhs_text}), '$[-{neg}]')"
                    )
                else:
                    # '||' not concat(): the pg concat NULL-skip
                    # handler would rewrap the emission every pass
                    repl = (
                        f"get_json_object(({lhs_text}), '$[' || "
                        f"CAST(json_array_length(({lhs_text})) - "
                        f"{neg} AS STRING) || ']')"
                    )
                edits.append((toks[lfirst][2], toks[num_idx][3], repl))
                return num_idx + 1
            raise TranspileError(
                f"negative JSON index counts from the end in {read}; "
                "Spark's JsonPath has no from-end form"
            )
        if (
            rhs is not None
            and rhs[0] in ("string", "number")
            and lfirst is not None
            and not _in_lambda_hof(toks, lfirst)
        ):
            ls = toks[lfirst][2]
            # collect the contiguous literal chain: (->|->>) lit,
            # stopping at (and including) the first ->> hop
            hops = []  # (is_text_arrow, rhs_token)
            cur = i
            chain_end = rhs[3]
            terminated = False
            while True:
                a2 = (
                    is_op(cur + 1, ">")
                    and toks[cur + 1][2] == toks[cur][3]
                )
                ridx = cur + (2 if a2 else 1)
                r = toks[ridx] if ridx < n else None
                if (
                    r is not None
                    and r[0] == "op"
                    and r[1] == "-"
                    and ridx + 1 < n
                    and toks[ridx + 1][0] == "number"
                ):
                    if read == "mysql":
                        raise TranspileError(
                            "mysql JSON arrows take '$...' path "
                            "strings"
                        )
                    raise TranspileError(
                        "negative JSON index counts from the end "
                        f"in {read}; Spark's JsonPath has no "
                        "from-end form"
                    )
                if r is None or r[0] not in ("string", "number"):
                    break  # non-literal continuation: pass through
                hops.append((a2, r))
                chain_end = r[3]
                if a2:
                    terminated = True
                    break
                cur = ridx + 1
                if not (
                    cur < n
                    and toks[cur][0] == "op"
                    and toks[cur][1] == "->"
                ):
                    break  # chain ends on a -> hop
            if any(e[1] >= ls and e[0] <= chain_end for e in edits):
                i += 1  # LHS edited this pass; resolve next pass
                return i
            if not terminated:
                # when the collection loop stopped with toks[cur]
                # still an arrow, the continuation key is
                # non-literal (pass through — Spark's parser
                # rejects the surviving arrow: loud at render);
                # otherwise the chain genuinely ends on a -> hop
                if hops and not (
                    cur < n
                    and toks[cur][0] == "op"
                    and toks[cur][1] == "->"
                ):
                    j2 = cur
                    while j2 < n and is_op(j2, ")"):
                        j2 += 1
                    if (
                        j2 > cur
                        and j2 < n
                        and toks[j2][0] == "op"
                        and toks[j2][1] == "->"
                    ):
                        raise TranspileError(
                            "parenthesized JSON arrow chains cannot "
                            "fold into one Spark JsonPath (and "
                            "per-hop rewrites diverge when a hop is "
                            "a JSON string scalar); remove the "
                            "parentheses so the -> chain ends in a "
                            "single ->> extraction"
                        )
                    raise TranspileError(
                        "terminal -> returns the JSON-typed "
                        "value, whose text form differs from "
                        "get_json_object for string scalars; "
                        "use ->> (text) or "
                        + ("JSON_UNQUOTE" if read == "mysql"
                           else "json_extract_string")
                    )
                i += 1  # non-literal continuation — loud at render
                return i
            segs = []
            for _a2, r in hops:
                if r[0] == "number":
                    if read == "mysql":
                        raise TranspileError(
                            "mysql JSON arrows take '$...' path "
                            "strings"
                        )
                    segs.append(f"[{r[1]}]")
                else:
                    key = _literal_content(r[1], read)
                    segs.append(_json_key_to_path(key, read)[1:])
            path = "$" + "".join(segs)
            # an arrow chained onto this ->> TEXT output re-parses
            # the text: exact for duckdb (VARCHAR→JSON implicit
            # cast, next-pass nesting), a type error in postgres
            # and invalid mysql — loud for those
            nxt_i = rhs_idx if not hops else (
                cur + (2 if hops[-1][0] else 1)
            )
            j2 = nxt_i + 1
            while j2 < n and is_op(j2, ")"):
                j2 += 1
            if (
                read in ("postgres", "mysql")
                and j2 < n
                and toks[j2][0] == "op"
                and toks[j2][1] in ("->", "#>", "#>>")
            ):
                raise TranspileError(
                    "->> returns text; chaining another JSON "
                    f"operator onto text is a type error in {read}"
                )
            edits.append((ls, ls, "get_json_object("))
            edits.append(
                (start, chain_end,
                 ", " + _spark_string_literal(path, read) + ")")
            )
            i = nxt_i + 1
            return i
        i += 1
        return i

    return None
