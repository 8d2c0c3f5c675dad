"""Postgres JSON constructor/aggregate handlers, split out of
``postgres_calls.py`` in round 11 (the module had regrown past the
~1,100-1,200-line transpile convention after the wave-46
json_object_agg addition). Bodies verbatim: the round-9 scalar-form
constructors (json_agg/jsonb_agg, json(b)_build_object/array,
row_to_json, the to_json own-emission consumer) plus the round-11
json_object_agg. Dispatched from postgres_calls.call_handlers WITHOUT
the first_pass gate — the to_json shape-consumer must also fire on
later fixpoint passes.
"""

from __future__ import annotations

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _call_arg_spans,
    _parse_inagg_order,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _spark_string_literal,
)


def _pg_json_text(v: str) -> str:
    """The exact JSON text of one scalar value: Spark's to_json encoder
    over a one-element array, brackets stripped.  Handles escaping,
    null→'null', booleans, and DECIMAL trailing zeros (to_json renders
    1.50 as 1.50, matching pg NUMERIC) without any regex surgery on the
    document.  The keyword-form substring re-reads untouched (the 3-arg
    substr handler only fires on comma-separated spans).  The explicit
    options-map second argument is the OWN-EMISSION TAG: pg to_json is
    unary, so the fixpoint consumer passes through exactly the 2-arg
    shape — user-written pg to_json(anything) stays loud."""
    enc = f"to_json(array(({v})), map('ignoreNullFields', 'false'))"
    return f"substring({enc} FROM 2 FOR length({enc}) - 2)"


def _pg_json_calls(ctx) -> "int | None":
    """Round-9 pg JSON constructor handlers — the scalar-argument forms
    of json_agg/jsonb_agg, json_build_object/jsonb_build_object,
    json_build_array/jsonb_build_array, and row_to_json, previously all
    loud.  Text forms pinned live on PG 15:

      json_agg(x)                 -> [1, 2, 3]        (', ' separator)
      jsonb_agg(x)                -> [1, 2]           (same)
      json_build_object('a',1)    -> {"a" : 1}        (' : ', given order,
                                                       duplicate keys kept)
      jsonb_build_object('a',1)   -> {"a": 1}         (': ', keys sorted
                                                       length-then-bytes,
                                                       duplicates last-wins)
      row_to_json(t)              -> {"a":1,"b":null}  (COMPACT — exactly
                                                       Spark's to_json)

    json_agg keeps NULL elements and yields NULL on zero rows (Spark's
    collect_list drops both — the array_agg struct-wrap + CASE from the
    shared handler provides the faithful base).  Aggregate documents are
    assembled with '||' (never concat(): the pg concat NULL-skip handler
    would rewrap the emission every pass).  Known unsupported forms stay
    loud: ORDER BY / DISTINCT / FILTER / OVER on the aggregates,
    non-literal object keys, ROW(...) with more than positional fields.
    Timestamps render as to_json's ISO-with-Z vs pg's bare ISO — a
    documented seam; keep timestamps out of JSON documents or cast.
    Dispatched for read == postgres on EVERY pass (the to_json consumer
    must see our own emissions)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read = ctx.sql, ctx.read
    i, name = ctx.i, ctx.name
    start = ctx.start
    _arg_text = ctx.arg_text
    n = len(toks)

    def _kw(ix):
        return (
            toks[ix][1].upper()
            if ix < n and toks[ix][0] in _NAME_KINDS else ""
        )

    if name == "to_json":
        # consume OUR emission shapes so the pg None-map entry doesn't
        # raise on them across fixpoint passes; everything else falls
        # through to the map's loud (pg to_json's per-type text forms
        # diverge from Spark's encoder).  Own emissions are tagged by
        # the options-map SECOND argument (every _pg_json_text /
        # row_to_json emission carries map('ignoreNullFields', ...));
        # pg to_json is unary, so a 2-arg call can only be ours —
        # user-written to_json(ARRAY[...]) / to_json(struct_expr)
        # stays loud instead of silently hitting Spark's encoder.
        spans, _close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            f0 = toks[spans[1][0]]
            if f0[0] in _NAME_KINDS and f0[1].lower() == "map":
                return i + 1
        return None

    if name in ("json_agg", "jsonb_agg"):
        spans, close = _call_arg_spans(toks, i + 1)
        if _kw(close + 1) in ("FILTER", "OVER") or _kw(close + 1) == "WITHIN":
            raise TranspileError(
                f"postgres {name}(...) FILTER/OVER has no faithful "
                "Spark rewrite with the NULL-on-empty wrap; aggregate "
                "plainly"
            )
        if len(spans) != 1:
            raise TranspileError(f"postgres {name} takes 1 argument")
        depth_ = 0
        order_at = None
        for j in range(spans[0][0], spans[0][1] + 1):
            k_, t_ = toks[j][0], toks[j][1]
            if k_ == "op" and t_ in ("(", "["):
                depth_ += 1
            elif k_ == "op" and t_ in (")", "]"):
                depth_ -= 1
            elif depth_ == 0 and k_ in _NAME_KINDS and t_.upper() in (
                "ORDER", "DISTINCT",
            ):
                if t_.upper() == "ORDER":
                    order_at = j
                    break
                raise TranspileError(
                    f"postgres {name} with DISTINCT has no "
                    "order-preserving Spark rewrite; aggregate then "
                    "sort explicitly"
                )
        a1 = spans[0][1]
        sort_wrap = None
        if order_at is not None:
            # json_agg(x ORDER BY k [ASC|DESC] [NULLS FIRST|LAST])
            # (round 11, wave 53 machinery): single-key sorts absorb
            # as a comparator array_sort over (_k, _v) struct pairs
            # before the document render. Multi-key stays loud.
            a1, key_txt, sort_wrap = _parse_inagg_order(
                toks, sql, spans[0], order_at, read
            )
        x_ = sql[toks[spans[0][0]][2]:toks[a1][3]].strip()
        if sort_wrap is not None:
            agg = (
                f"array_agg(struct(({key_txt}) AS _k, ({x_}) AS _v))"
            )
            body = f"array_sort({agg}, {sort_wrap})"
        else:
            agg = f"array_agg(struct(({x_}) AS _v))"
            body = agg
        je = _pg_json_text("_s._v")
        edits.append(
            (start, toks[close][3],
             f"(CASE WHEN size({agg}) = 0 THEN NULL ELSE "
             f"'[' || array_join(transform({body}, _s -> {je}), ', ') "
             f"|| ']' END)")
        )
        return close + 1

    if name == "json_object_agg":
        # Pinned live (round 11, wave 46): `{ "b" : 1, "a" : 2, "a" :
        # 3 }` — SPACE-padded braces (unlike json_build_object's
        # tight '{'), ' : ' separator, INSERTION order, duplicate
        # keys KEPT, key coerced to text then JSON-string-rendered
        # (json_object_agg(1,'x') is { "1" : "x" }), NULL on zero
        # rows, ERROR on a NULL key (raise_error here, matching pg's
        # 'null value not allowed for object key').
        spans, close = _call_arg_spans(toks, i + 1)
        if _kw(close + 1) in ("FILTER", "OVER", "WITHIN"):
            raise TranspileError(
                "postgres json_object_agg(...) FILTER/OVER has no "
                "faithful Spark rewrite with the NULL-on-empty wrap; "
                "aggregate plainly"
            )
        if len(spans) != 2:
            raise TranspileError(
                "postgres json_object_agg takes (key, value)"
            )
        for sp in spans:
            depth_ = 0
            for j in range(sp[0], sp[1] + 1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ in ("(", "["):
                    depth_ += 1
                elif k_ == "op" and t_ in (")", "]"):
                    depth_ -= 1
                elif depth_ == 0 and k_ in _NAME_KINDS and t_.upper() in (
                    "ORDER", "DISTINCT",
                ):
                    raise TranspileError(
                        "postgres json_object_agg with ORDER BY/"
                        "DISTINCT has no order-preserving Spark "
                        "rewrite; aggregate then sort explicitly"
                    )
        k_t, v_t = _arg_text(spans[0]), _arg_text(spans[1])
        agg = f"array_agg(struct(({k_t}) AS _k, ({v_t}) AS _v))"
        kj = _pg_json_text("CAST(_s._k AS STRING)")
        vj = _pg_json_text("_s._v")
        pair = (
            f"IF(_s._k IS NULL, raise_error('json_object_agg: null "
            f"value not allowed for object key'), {kj}) || ' : ' "
            f"|| {vj}"
        )
        edits.append(
            (start, toks[close][3],
             f"(CASE WHEN size({agg}) = 0 THEN NULL ELSE "
             f"'{{ ' || array_join(transform({agg}, _s -> {pair}), "
             f"', ') || ' }}' END)")
        )
        return close + 1

    if name in ("json_build_array", "jsonb_build_array"):
        spans, close = _call_arg_spans(toks, i + 1)
        if not spans:
            edits.append((start, toks[close][3], "'[]'"))
            return close + 1
        body = " || ', ' || ".join(
            _pg_json_text(_arg_text(sp)) for sp in spans
        )
        edits.append((start, toks[close][3], f"('[' || {body} || ']')"))
        return close + 1

    if name in ("json_build_object", "jsonb_build_object"):
        import json as _json

        spans, close = _call_arg_spans(toks, i + 1)
        if not spans:
            edits.append((start, toks[close][3], "'{}'"))
            return close + 1
        if len(spans) % 2:
            raise TranspileError(
                f"postgres {name} needs an even number of arguments"
            )
        pairs = []
        for k in range(0, len(spans), 2):
            ks0, ks1 = spans[k]
            if not (ks0 == ks1 and toks[ks0][0] == "string"):
                raise TranspileError(
                    f"postgres {name} transpiles only with literal "
                    "string keys (dynamic keys have no static Spark "
                    "document form)"
                )
            key = _literal_content(toks[ks0][1], read)
            pairs.append((key, _arg_text(spans[k + 1])))
        if name == "jsonb_build_object":
            # jsonb normalizes: duplicate keys last-wins, then sorted
            # by byte length then bytewise (pinned live:
            # jsonb_build_object('b',2,'a',1) = {"a": 1, "b": 2})
            dd = {}
            for k_, v_ in pairs:
                dd[k_] = v_
            pairs = sorted(
                dd.items(),
                key=lambda kv: (len(kv[0].encode()), kv[0].encode()),
            )
            colon = ": "
        else:
            colon = " : "
        parts = []
        for idx2, (k_, v_) in enumerate(pairs):
            prefix = ("{" if idx2 == 0 else ", ") + _json.dumps(k_) + colon
            parts.append(_spark_string_literal(prefix, read))
            parts.append(_pg_json_text(v_))
        edits.append(
            (start, toks[close][3],
             "(" + " || ".join(parts) + " || '}')")
        )
        return close + 1

    if name == "row_to_json":
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 1
            and spans[0][0] == spans[0][1]
            and toks[spans[0][0]][0] in _NAME_KINDS
        ):
            # row/table alias: pg renders COMPACT JSON with the row's
            # column names — exactly Spark's to_json over struct(t.*)
            ident = toks[spans[0][0]][1]
            edits.append(
                (start, toks[close][3],
                 f"to_json(struct({ident}.*), "
                 f"map('ignoreNullFields', 'false'))")
            )
            return close + 1
        if (
            len(spans) == 1
            and _kw(spans[0][0]) == "ROW"
            and spans[0][0] + 1 <= spans[0][1]
            and toks[spans[0][0] + 1][0] == "op"
            and toks[spans[0][0] + 1][1] == "("
        ):
            # ROW(...) constructor: pg names the fields f1..fn
            inner, _ic = _call_arg_spans(toks, spans[0][0] + 1)
            fields = ", ".join(
                f"'f{ix + 1}', ({_arg_text(sp)})"
                for ix, sp in enumerate(inner)
            )
            edits.append(
                (start, toks[close][3],
                 f"to_json(named_struct({fields}), "
                 f"map('ignoreNullFields', 'false'))")
            )
            return close + 1
        raise TranspileError(
            "postgres row_to_json transpiles for a row/table alias or "
            "a ROW(...) constructor; other record expressions have no "
            "static field names"
        )

    return None
