"""Postgres user-facing function tier (round 10, pg-only-name sweep).

Found by mechanically probing every pg_catalog scalar whose name does
NOT exist in Spark (the passthrough/UNRESOLVED_ROUTINE gap class —
complement of the same-name collision sweeps).  Pinned live on PG 15:

* degree trigonometry (sind/cosd/tand/cotd/asind/acosd/atand/atan2d)
  → radians()/degrees() compositions.  pg computes special angles
  EXACTLY (sind(30) = 0.5) where the double round-trip gives
  0.49999999999999994 — a 1-ulp class divergence, inside every
  comparator tolerance and the honest float answer.
* array_length(a, 1) / array_upper(a, 1) → nullif(size(a), 0): pg
  returns NULL (not 0) for empty arrays; array_lower(a, 1) → 1 for
  non-empty, NULL for empty/NULL.  Non-literal or ≠1 dimensions are
  loud (pg's multidim arrays have no Spark analog; a dim-2 query on a
  1-D array is NULL in pg — statically unknowable here).
* gcd/lcm, clock_timestamp (wall clock mid-statement), lastval/
  currval/nextval (sequences), array_to_json/row_to_json-free to_json
  relatives, array_ndims/array_dims (nesting depth statically
  unknowable): loud with guidance — every one previously died as an
  unresolved-routine error.
"""

from __future__ import annotations

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _call_arg_spans,
)

_DEG_TRIG = {
    "sind": ("sin(radians({x}))",),
    "cosd": ("cos(radians({x}))",),
    "tand": ("tan(radians({x}))",),
    "cotd": ("cot(radians({x}))",),
    "asind": ("degrees(asin({x}))",),
    "acosd": ("degrees(acos({x}))",),
    "atand": ("degrees(atan({x}))",),
}

_LOUD = {
    "gcd": "postgres gcd() has no Spark builtin; precompute or use a "
           "pandas UDF",
    "lcm": "postgres lcm() has no Spark builtin; precompute or use a "
           "pandas UDF",
    "clock_timestamp": "postgres clock_timestamp() advances WITHIN a "
                       "statement; Spark timestamps are fixed per "
                       "query — use current_timestamp() and accept "
                       "statement-start semantics explicitly",
    "statement_timestamp": "use current_timestamp() (statement-start "
                           "semantics match)",
    "lastval": "sequences have no Spark analog; use monotonically-"
               "increasing ids or row_number",
    "currval": "sequences have no Spark analog; use monotonically-"
               "increasing ids or row_number",
    "nextval": "sequences have no Spark analog; use monotonically-"
               "increasing ids or row_number",
    "array_to_json": "pg array_to_json's per-type text forms diverge "
                     "from Spark's encoder (same class as to_json); "
                     "build the document with json_build_array",
    "array_ndims": "array nesting depth is statically unknowable for "
                   "columns; Spark arrays are 1-D — restructure",
    "array_dims": "pg dimension text ('[1:3]') needs the nesting "
                  "depth; for 1-D arrays use size()",
    "min_scale": "numeric introspection has no Spark form",
    "trim_scale": "numeric introspection has no Spark form",
}


def call_handlers(ctx) -> "int | None":
    """pg-only-name tier; dispatched for read == postgres."""
    toks, edits = ctx.toks, ctx.edits
    i, name = ctx.i, ctx.name
    start = ctx.start
    _arg_text = ctx.arg_text

    if name == "unistr":
        # pg 16 unistr(): \XXXX (4 hex), \+XXXXXX (6 hex), \\ → one
        # backslash (pinned live: 'd\0061t' = 'dat', '\+01F600' = 😀).
        # Spark has no unistr — decode LITERAL arguments statically
        # into a plain Spark literal; non-literals are loud.
        import re as _re2

        from sqlmesh_spark.core.transpile_text import (
            _literal_content,
            _spark_string_literal,
        )

        spans, close = _call_arg_spans(toks, i + 1)
        if not (
            len(spans) == 1
            and spans[0][0] == spans[0][1]
            and toks[spans[0][0]][0] == "string"
        ):
            raise TranspileError(
                "unistr() needs a literal argument to decode statically"
                " (Spark has no unistr function)"
            )
        raw = _literal_content(toks[spans[0][0]][1], ctx.read)

        def _dec(m):
            g = m.group(0)
            if g == "\\\\":
                return "\\"
            return chr(int(g[2:] if g[1] == "+" else g[1:], 16))

        out_ = _re2.sub(
            r"\\\\|\\\+[0-9A-Fa-f]{6}|\\[0-9A-Fa-f]{4}", _dec, raw
        )
        if "\\" in _re2.sub(
            r"\\\\|\\\+[0-9A-Fa-f]{6}|\\[0-9A-Fa-f]{4}", "", raw
        ):
            raise TranspileError(
                "unistr() argument has a malformed \\ escape"
            )
        edits.append(
            (start, toks[close][3], _spark_string_literal(out_, ctx.read))
        )
        return close + 1

    tmpl = _DEG_TRIG.get(name)
    if tmpl is not None:
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3],
                 tmpl[0].format(x=f"({_arg_text(spans[0])})"))
            )
            return close + 1

    if name == "atan2d":
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            y_, x_ = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"degrees(atan2(({y_}), ({x_})))")
            )
            return close + 1

    if name in ("array_length", "array_upper", "array_lower"):
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            d0, d1 = spans[1]
            if not (
                d0 == d1 and toks[d0][0] == "number"
                and toks[d0][1] == "1"
            ):
                raise TranspileError(
                    f"postgres {name} with a dimension other than the "
                    "literal 1 needs pg's multidim arrays (no Spark "
                    "analog)"
                )
            a_ = _arg_text(spans[0])
            if name == "array_lower":
                # 1 for non-empty, NULL for empty/NULL (pinned live)
                repl = (
                    f"IF(coalesce(size(({a_})), 0) > 0, 1, "
                    f"CAST(NULL AS INT))"
                )
            else:
                # pg returns NULL, not 0, for empty arrays
                repl = f"nullif(size(({a_})), 0)"
            edits.append((start, toks[close][3], repl))
            return close + 1

    msg = _LOUD.get(name)
    if msg is not None:
        raise TranspileError(f"postgres {name}(): {msg}")

    return None
