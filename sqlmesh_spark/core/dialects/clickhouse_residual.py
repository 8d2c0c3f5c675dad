"""ClickHouse round-11 residual tier (split out of clickhouse.py for
the module-size convention): the anyIf/countDistinct/bitTest/exp2/
intDivOrZero/range/trunc/hasAll/arrayFirstIndex/arrayUniq/
arrayReverseSort/arrayEnumerate/toRelativeDayNum/age/sumArray
handlers, moved VERBATIM.  Dispatched from clickhouse.call_handlers at
the original scan position with the precomputed (spans, close) of the
call — the parameterized-combinator loud has already run, so every
handler here sees a plain call shape.  All 27 Spark-side value checks
and the fixpoint assertions live in
tests/test_transpile.py::test_clickhouse_residual_sweep_round11.
"""

from __future__ import annotations

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _call_arg_spans,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _resolve_unit,
)


def call_handlers(ctx, _spans0, _close0) -> "int | None":
    """Residual tier; see module docstring."""
    toks, edits = ctx.toks, ctx.edits
    read = ctx.read
    i, name, text = ctx.i, ctx.name, ctx.text
    start = ctx.start
    _arg_text = ctx.arg_text
    _unused = (text, _call_arg_spans)

    if name == "anyif":
        # anyIf(x, cond) → any_value over the filtered arm with
        # ignoreNulls (Spark's default KEEPS nulls — the if() arm
        # introduces them for filtered rows)
        spans, close = _spans0, _close0
        if len(spans) != 2:
            raise TranspileError("anyIf takes 2 args")
        x = _arg_text(spans[0])
        c = _arg_text(spans[1])
        edits.append(
            (start, toks[close][3],
             f"any_value(if(({c}), ({x}), NULL), true)")
        )
        return close + 1

    if name == "countdistinct" and len(_spans0) >= 1:
        # countDistinct is the uniqExact alias → count(DISTINCT ...)
        args_ = ", ".join(f"({_arg_text(sp)})" for sp in _spans0)
        edits.append(
            (start, toks[_close0][3], f"count(DISTINCT {args_})")
        )
        return _close0 + 1

    if name == "bittest":
        # bitTest(n, i) — bit i (0-based from LSB) as 0/1
        spans, close = _spans0, _close0
        if len(spans) == 2:
            a, b = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"(shiftright(CAST(({a}) AS BIGINT), ({b})) & 1)")
            )
            return close + 1

    if name in ("exp2", "exp10"):
        spans, close = _spans0, _close0
        if len(spans) == 1:
            base = "2" if name == "exp2" else "10"
            edits.append(
                (start, toks[close][3],
                 f"power({base}, ({_arg_text(spans[0])}))")
            )
            return close + 1

    if name in ("intdivorzero", "moduloorzero"):
        # ...OrZero: 0 instead of the division-by-zero error
        spans, close = _spans0, _close0
        if len(spans) == 2:
            a, b = _arg_text(spans[0]), _arg_text(spans[1])
            op_ = (f"(({a}) DIV ({b}))" if name == "intdivorzero"
                   else f"mod(({a}), ({b}))")
            edits.append(
                (start, toks[close][3],
                 f"IF(({b}) = 0, 0, {op_})")
            )
            return close + 1

    if name == "range" and len(_spans0) == 3:
        raise TranspileError(
            "clickhouse range(start, end, step) has no Spark rewrite "
            "(negative steps flip the emptiness test); use sequence "
            "with explicit bounds"
        )

    if name == "range" and len(_spans0) in (1, 2):
        # CH range is END-EXCLUSIVE ([0..n-1] / [a..b-1]) and returns
        # [] on an empty span — the duck range() emission shape (a
        # bare passthrough would hit Spark's range TVF in scalar
        # position).  The 3-arg step form stays loud (negative steps
        # flip the emptiness test).
        spans, close = _spans0, _close0
        if len(spans) == 1:
            a_, b_ = "0", _arg_text(spans[0])
        else:
            a_, b_ = _arg_text(spans[0]), _arg_text(spans[1])
        edits.append(
            (start, toks[close][3],
             f"(CASE WHEN ({a_}) <= ({b_}) - 1 THEN "
             f"sequence(({a_}), ({b_}) - 1) ELSE "
             f"slice(sequence(({a_}), ({a_})), 1, 0) END)")
        )
        return close + 1

    if name in ("trunc", "truncate"):
        # toward-zero numeric truncation (CH has no date overload of
        # these names; Spark's trunc is the date form)
        spans, close = _spans0, _close0
        if len(spans) == 1:
            x = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"CAST(CASE WHEN ({x}) < 0 THEN ceil(({x})) "
                 f"ELSE floor(({x})) END AS DOUBLE)")
            )
            return close + 1
        if len(spans) == 2:
            x, d = _arg_text(spans[0]), _arg_text(spans[1])
            p_ = f"power(10, ({d}))"
            edits.append(
                (start, toks[close][3],
                 f"(CASE WHEN ({x}) < 0 THEN ceil(({x}) * {p_}) "
                 f"ELSE floor(({x}) * {p_}) END / {p_})")
            )
            return close + 1

    if name in ("hasall", "hasany"):
        # NULL-element-safe containment (the duck @>/<@ class: <=>
        # matches NULL elements as values, like CH's semantics);
        # empty needle → hasAll true / hasAny false, matching
        # forall/exists over the empty array
        spans, close = _spans0, _close0
        if len(spans) == 2:
            a, b = _arg_text(spans[0]), _arg_text(spans[1])
            q = "forall" if name == "hasall" else "exists"
            edits.append(
                (start, toks[close][3],
                 f"{q}(({b}), _y -> exists(({a}), _x -> _x <=> _y))")
            )
            return close + 1

    if name == "arrayfirstindex":
        # lambda FIRST; 0 when no element matches (array_position's
        # own not-found contract; a NULL lambda result is not true,
        # matching CH's falsy NULL)
        spans, close = _spans0, _close0
        if len(spans) == 2:
            l_, a_ = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"coalesce(array_position(transform(({a_}), {l_}), "
                 "true), 0)")
            )
            return close + 1

    if name == "arrayfirst":
        raise TranspileError(
            "clickhouse arrayFirst returns the element TYPE'S DEFAULT "
            "(0, '') when nothing matches — no faithful Spark "
            "rewrite; use element_at(filter(arr, pred), 1) + coalesce "
            "explicitly"
        )

    if name == "arrayuniq":
        # number of DISTINCT elements (not the distinct array)
        spans, close = _spans0, _close0
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3],
                 f"size(array_distinct(({_arg_text(spans[0])})))")
            )
            return close + 1

    if name == "arrayreversesort":
        # descending sort, NULLs LAST in CH — exactly
        # sort_array(x, false); the key-extractor lambda form louds
        # like arraySort's
        spans, close = _spans0, _close0
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3],
                 f"sort_array(({_arg_text(spans[0])}), false)")
            )
            return close + 1
        raise TranspileError(
            "arrayReverseSort with a key-extractor lambda has no "
            "Spark rewrite; sort a struct-wrapped key explicitly"
        )

    if name == "arrayenumerate":
        # [1, 2, ..., size] — the slice keeps the empty-array edge
        # (sequence(1, 0) would DESCEND)
        spans, close = _spans0, _close0
        if len(spans) == 1:
            # sequence(0, n) is [0..n] for any n >= 0; the slice
            # drops the leading 0 (greatest() would re-loud on the
            # CH read — it's a None-mapped name here)
            a = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"slice(sequence(0, size(({a}))), 2, size(({a})))")
            )
            return close + 1

    if name == "torelativedaynum":
        spans, close = _spans0, _close0
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3],
                 f"datediff(CAST(({_arg_text(spans[0])}) AS DATE), "
                 "DATE '1970-01-01')")
            )
            return close + 1

    if name == "age" and len(_spans0) == 3:
        # age('unit', a, b) counts COMPLETE elapsed units — exactly
        # Spark's timestampdiff (dateDiff's boundary-crossing
        # truncation machinery is the standard.py handler; age needs
        # none)
        spans, close = _spans0, _close0
        u_tok = toks[spans[0][0]]
        if u_tok[0] == "string" and spans[0][0] == spans[0][1]:
            raw_u = _literal_content(u_tok[1], read).lower()
            unit = _resolve_unit(read, raw_u)
            if unit is None:
                raise TranspileError(
                    f"age unit {raw_u!r} has no Spark timestampdiff "
                    "equivalent"
                )
            edits.append(
                (start, toks[close][3],
                 f"timestampdiff({unit}, ({_arg_text(spans[1])}), "
                 f"({_arg_text(spans[2])}))")
            )
            return close + 1
        raise TranspileError("age unit must be a string literal")

    if name == "sumarray":
        # sumArray(arr): total of every element across all rows —
        # SUM over the per-row arraySum fold
        spans, close = _spans0, _close0
        if len(spans) == 1:
            a = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"sum(aggregate(({a}), CAST(0 AS DOUBLE), "
                 "(_a, _x) -> _a + coalesce(CAST(_x AS DOUBLE), "
                 "0.0D)))")
            )
            return close + 1

    return None
