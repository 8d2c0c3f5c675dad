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
    _in_lambda_hof,
    _json_key_to_path,
    _match_bracket,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _spark_string_literal,
)


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
                or (prev[0] == "op" and prev[1] in (")", "]"))
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
            if colon_j == close - 2:
                b = int(toks[close - 1][1])
                length = b - a + 1
                if length <= 0:
                    a, length = 1, 0
                edits.append((toks[j][2], toks[j][2], "slice("))
                edits.append((start, toks[close][3], f", {a}, {length})"))
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
        # extraction → substr(lit, idx, 1).
        if prev is not None and prev[0] == "string" and not zero_based:
            edits.append((prev[2], prev[2], "substr("))
            edits.append((start, end, ", "))
            edits.append((toks[close][2], toks[close][3], ", 1)"))
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
                or (prev[0] == "op" and prev[1] in (")", "]"))
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
