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
    _NAME_KINDS,
    _call_arg_spans,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _resolve_unit,
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
    "replicate": "repeat",              # round 11; was unresolved
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
    if name in ("date_part", "datepart", "pgdate_part") and first_pass:
        # Redshift DATE_PART(field, x) — the field is a BARE keyword
        # or string literal with Redshift's alias tiers (round 11; a
        # bare ident passed through as an unknown Spark column, and
        # 'dow' would have been SILENTLY 1-based under Spark's
        # same-named field).  Redshift is pg-derived: dow is FIXED
        # 0=Sunday (no session parameter — unlike Snowflake), week is
        # ISO, epoch is seconds — the pg template tier applies, with
        # the integer-seconds variant.
        from sqlmesh_spark.core.dialects.standard_edges import (
            _DP_FIELD_TEMPLATES,
            _loud_tz_field,
        )

        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            u_tok = toks[spans[0][0]]
            if u_tok[0] == "string" and spans[0][0] == spans[0][1]:
                raw_u = _literal_content(u_tok[1], read).lower()
            elif u_tok[0] == "ident" and spans[0][0] == spans[0][1]:
                raw_u = u_tok[1].lower()
            else:
                raise TranspileError(
                    f"{name} field must be a bare keyword or a "
                    "string literal"
                )
            x_ = _arg_text(spans[1])
            _loud_tz_field(raw_u, name)
            tmpl = _DP_FIELD_TEMPLATES.get(raw_u)
            if tmpl is not None:
                repl = tmpl.format(x=f"({x_})")
            else:
                canon = _resolve_unit(read, raw_u)
                if canon is None:
                    raise TranspileError(
                        f"{name} field {raw_u!r} has no Spark "
                        "equivalent"
                    )
                tmpl = _DP_FIELD_TEMPLATES.get(canon.lower())
                if tmpl is not None:
                    repl = tmpl.format(x=f"({x_})")
                elif (
                    u_tok[0] == "string"
                    and raw_u == canon.lower()
                    and name == "date_part"
                ):
                    # already the Spark spelling (our own emission or
                    # a canonical string field) — inert
                    return None
                else:
                    repl = f"date_part('{canon}', ({x_}))"
            edits.append((start, toks[close][3], repl))
            return close + 1

    if name == "extract" and first_pass:
        # extract(FIELD FROM x) — same field tier as date_part above
        # (bare idents; yr/mon/w aliases rewrite, dow/doy/epoch take
        # the template forms, plain year/month/day pass through)
        from sqlmesh_spark.core.dialects.standard_edges import (
            _DP_FIELD_TEMPLATES,
            _loud_tz_field,
        )

        if (
            i + 4 < n
            and toks[i + 2][0] in _NAME_KINDS
            and toks[i + 3][0] in _NAME_KINDS
            and toks[i + 3][1].upper() == "FROM"
        ):
            raw_u = toks[i + 2][1].lower()
            _loud_tz_field(raw_u, name)
            spans, close = _call_arg_spans(toks, i + 1)
            tmpl = _DP_FIELD_TEMPLATES.get(raw_u)
            canon = None
            if tmpl is None:
                canon = _resolve_unit(read, raw_u)
                if canon is not None:
                    tmpl = _DP_FIELD_TEMPLATES.get(canon.lower())
            if tmpl is not None:
                x_ = transpile(
                    sql[toks[i + 4][2]:toks[close - 1][3]], read
                )
                edits.append(
                    (start, toks[close][3],
                     tmpl.format(x=f"({x_})"))
                )
                return close + 1
            if canon is not None and canon.lower() != raw_u:
                # alias spelling (yr/mon/w) → the Spark field name
                edits.append(
                    (toks[i + 2][2], toks[i + 2][3], canon.lower())
                )
                return i + 3
            # plain year/month/day/week/quarter etc. pass through

    if name == "convert_timezone" and first_pass:
        # CONVERT_TIMEZONE([src,] tgt, ts) → from_utc_timestamp over
        # to_utc_timestamp (2-arg form: source is UTC).  Zone names
        # pass through (both engines accept IANA names; fixed-offset
        # spellings like '+05:30' too).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 3:
            s_, t_, ts_ = (_arg_text(sp) for sp in spans)
            repl = (f"from_utc_timestamp(to_utc_timestamp(({ts_}), "
                    f"({s_})), ({t_}))")
            edits.append((start, toks[close][3], repl))
            return close + 1
        if len(spans) == 2:
            t_, ts_ = (_arg_text(sp) for sp in spans)
            repl = f"from_utc_timestamp(({ts_}), ({t_}))"
            edits.append((start, toks[close][3], repl))
            return close + 1

    if name == "regexp_substr" and first_pass:
        # pos/occurrence forms like Oracle's (Redshift is the same
        # signature) — but Redshift returns the EMPTY STRING on no
        # match (documented; Oracle and Spark's 2-arg regexp_substr
        # return NULL), so even the 2-arg form rewrites:
        # regexp_extract's ''-on-no-match is the exact contract.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            s_, p_ = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"regexp_extract(({s_}), ({p_}), 0)")
            )
            return close + 1
        if len(spans) in (3, 4):
            s_, p_ = _arg_text(spans[0]), _arg_text(spans[1])
            pos_ = _arg_text(spans[2])
            occ_ = _arg_text(spans[3]) if len(spans) == 4 else "1"
            edits.append(
                (start, toks[close][3],
                 f"coalesce(try_element_at(regexp_extract_all("
                 f"substring(({s_}), ({pos_})), ({p_}), 0), "
                 f"({occ_})), '')")
            )
            return close + 1
        if len(spans) > 4:
            raise TranspileError(
                "redshift REGEXP_SUBSTR parameter arguments have no "
                "Spark rewrite"
            )

    if name == "regexp_replace" and first_pass:
        # 2-arg form DELETES matches (Spark requires the replacement)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            edits.append((toks[close][2], toks[close][2], ", ''"))
            return close + 1

    if name == "json_extract_array_element_text" and first_pass:
        # (json, idx[, null_if_invalid]) → get_json_object $[idx]
        # for a literal index (0-based in both)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) in (2, 3):
            ix_tok = toks[spans[1][0]]
            if not (spans[1][0] == spans[1][1]
                    and ix_tok[0] == "number"):
                raise TranspileError(
                    "json_extract_array_element_text needs a literal "
                    "index to build the $-path"
                )
            j_ = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"get_json_object(({j_}), '$[{ix_tok[1]}]')")
            )
            return close + 1

    if name == "ratio_to_report" and first_pass:
        # RATIO_TO_REPORT(x) OVER (w) ≡ x / SUM(x) OVER (w) (round
        # 11; was an unresolved passthrough).  NULL x → NULL (the
        # division propagates); the window SUM skips NULLs like
        # Redshift's.
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 1
            and close + 2 < n
            and toks[close + 1][0] in _NAME_KINDS
            and toks[close + 1][1].upper() == "OVER"
            and toks[close + 2][0] == "op"
            and toks[close + 2][1] == "("
        ):
            _wspans, wclose = _call_arg_spans(toks, close + 2)
            x_ = _arg_text(spans[0])
            over_ = transpile(
                sql[toks[close + 2][2]:toks[wclose][3]], read
            )
            edits.append(
                (start, toks[wclose][3],
                 f"(CAST(({x_}) AS DOUBLE) / sum(({x_})) "
                 f"OVER {over_})")
            )
            return wclose + 1
        raise TranspileError(
            "ratio_to_report needs an OVER clause (window function)"
        )

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
