"""Redshift read-dialect function map and call handlers.

Split out of core/transpile.py (round 6): the walker in
core/transpile.py dispatches into this module's handler functions; see
TokenCtx in core/transpile_shared.py for the contract. Handler bodies
are the pre-split code verbatim (continue -> return i), so every
file:line reference in docstrings and VERDICT history still applies.
"""

from __future__ import annotations

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _call_arg_spans,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
)

_REDSHIFT_FN: dict[str, str | None] = {
    "getdate": None,                    # UTC wall-clock — handler below
    "len": "length",                    # both character counts
    "charindex": "position",            # both (substr, str), 1-based
    "strpos": "instr",                  # both 1-based, 0 when absent
    "random": "rand",                   # both uniform [0,1) doubles
    "array": None,                      # builds SUPER array → no faithful type
    "strtol": None,                     # arbitrary-base parse → loud
    "to_number": None,                  # numeric format language differs
    "trunc": None,                      # type-overloaded (ts→date / numeric
                                        # scale) vs Spark's (date, fmt) →
                                        # use CAST(x AS DATE) or floor
    "sysdate": None,                    # bare-keyword form handled above;
                                        # a parenthesized call is not
                                        # Redshift syntax → loud
    "text_to_int_alt": None,
    "text_to_numeric_alt": None,
    # decode passes through (Oracle NULL-safe form = Spark's decode)
    "json_parse": None,                 # SUPER type has no Spark analog
    "json_serialize": None,
    "is_valid_json": None,
    "json_array_length": None,
    # APPROXIMATE COUNT(DISTINCT ...) is a keyword prefix, not a call —
    # it reaches Spark's parser unchanged and fails loudly there.
    "dexp": "exp",
    "dlog1": "ln",
    "dlog10": "log10",
    "checksum": None,                   # different hash → silent wrong values
    "func_sha1": "sha1",
    "crc32": None,                      # Redshift returns hex string; Spark bigint
    "timeofday": None,
    "getutcdate": None,                 # handler below (UTC wall-clock)
    "interval_cmp": None,
    "date_cmp": None, "date_cmp_timestamp": None, "timestamp_cmp": None,
}

# MySQL renames (ref dialect.py:1040; the most common OLTP-source dialect
# for replicated reporting models). Identical-semantics pass-throughs:
# ifnull, nullif, if, concat/concat_ws (NULL-propagating in both... concat
# of NULL is NULL in MySQL; Spark concat also returns NULL on any NULL
# arg), locate, instr, substring_index, lpad/rpad, repeat, reverse, space,
# elt, conv, bin, hex, unhex, crc32, md5, sha/sha1, sha2, last_day,
# datediff (both count whole days), dayofweek (both 1=Sunday), weekofyear
# (both ISO), dayofyear, quarter, timestampdiff (both count COMPLETE
# elapsed units — verified against Spark 4.1), rand, pow/power, truncate
# handled loud, DIV passes natively. None = loud failure.


def call_handlers(ctx) -> "int | None":
    """Redshift read-dialect function map and call handlers (pre-split code, verbatim)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, first_pass, is_op, _arg_text, transpile, n)
    if name == "split_to_array" and first_pass:
        # redshift SPLIT_TO_ARRAY(s[, delimiter]) — the delimiter is a
        # LITERAL string (default ','); Spark's split takes a REGEX
        # (the passthrough was UNRESOLVED_ROUTINE, round 11). Literal
        # delimiters regex-escape; dynamic ones are loud.
        import re as _re_r
        from sqlmesh_spark.core.transpile_text import (
            _literal_content as _lc,
            _spark_string_literal as _sl,
        )
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) in (1, 2):
            if len(spans) == 2:
                d0 = spans[1]
                if not (
                    d0[0] == d0[1] and toks[d0[0]][0] == "string"
                ):
                    raise TranspileError(
                        "redshift split_to_array needs a literal "
                        "delimiter (Spark split treats it as a regex)"
                    )
                delim = _lc(toks[d0[0]][1], "redshift")
            else:
                delim = ","
            lit = _sl(_re_r.escape(delim), "redshift")
            edits.append(
                (start, toks[close][3],
                 f"split(({_arg_text(spans[0])}), {lit})")
            )
            return close + 1
    if name in ("getdate", "getutcdate"):
        # Both return UTC wall-clock regardless of session TZ
        # (Redshift stores timestamps normalized to UTC).
        spans, close = _call_arg_spans(toks, i + 1)
        if spans:
            raise TranspileError(f"{name} takes no arguments")
        edits.append(
            (start, toks[close][3],
             "to_utc_timestamp(current_timestamp(), current_timezone())")
        )
        i = close + 1
        return i

    if name == "json_extract_path_text" and first_pass:
        # json_extract_path_text(j, 'a', 'b'[, null_if_invalid])
        # → get_json_object(j, '$.a.b'). Literal path elements
        # only ($-path assembly needs them at render time).
        # Divergence, documented: on malformed JSON Spark
        # returns NULL where Redshift without null_if_invalid
        # errors — NULL-on-garbage accepted for fidelity of the
        # well-formed path.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) < 2:
            raise TranspileError(
                "json_extract_path_text needs at least one path "
                "element"
            )
        path_spans = spans[1:]
        if (
            path_spans
            and toks[path_spans[-1][0]][0] == "ident"
            and toks[path_spans[-1][0]][1].lower() in ("true", "false")
        ):
            path_spans = path_spans[:-1]
        parts = []
        for p_first, p_last in path_spans:
            p_tok = toks[p_first]
            if p_first != p_last or p_tok[0] != "string":
                raise TranspileError(
                    "json_extract_path_text path elements must "
                    "be string literals to transpile"
                )
            elem = _literal_content(p_tok[1], read)
            if "'" in elem or "." in elem or "[" in elem:
                raise TranspileError(
                    f"json path element {elem!r} cannot be "
                    "embedded in a $.a.b path"
                )
            parts.append(elem)
        j_text = _arg_text(spans[0])
        path = "$." + ".".join(parts)
        edits.append(
            (start, toks[close][3],
             f"get_json_object({j_text}, '{path}')")
        )
        i = close + 1
        return i

    return None
