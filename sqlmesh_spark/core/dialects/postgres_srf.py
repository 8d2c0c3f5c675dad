"""Postgres set-returning-function tier (round 10).

FROM-position SRFs beyond generate_series/unnest(single) previously
either passed through into UNRESOLVED_ROUTINE (string_to_table) or
emitted an invalid multi-arg explode (unnest(a, b)).  Pinned live on
PG 15 and probed end-to-end with `probe_dialect.py --table`:

* string_to_table(s, sep[, null_string]) — row-form of
  string_to_array with IDENTICAL splitting rules ('' → ZERO rows,
  NULL separator splits per character, null_string maps matching
  fields to NULL) → explode() over the transpiled string_to_array
  emission (which already guards all of those edges).
* regexp_split_to_table(s, pat[, flags]) — row-form of
  regexp_split_to_array; NOTE the empty-string edge DIFFERS from
  string_to_table ('' → ONE empty row, pinned live) and matches
  Spark's split('')→[''] exactly, so a plain explode(split(...)) is
  faithful.  Literal patterns convert (posix classes + the (?s)/\\z
  ARE seams); i/c/s flags inline.
* unnest(a, b, ...) — multi-array zip with NULL padding for shorter
  arrays (pinned live) → inline(arrays_zip(...)), which pads with
  NULL identically and works directly in FROM position.

json_array_elements / jsonb_each / jsonb_object_keys stay LOUD: pg
returns JSON-TEXT elements ('"a"' with quotes for strings), which no
from_json cast reproduces.  UNNEST ... WITH ORDINALITY keeps its
existing loud guidance (posexplode re-orders and 0-bases the columns).
"""

from __future__ import annotations

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _call_arg_spans,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _spark_string_literal,
    convert_posix_classes,
    convert_regex_literal,
)


def call_handlers(ctx) -> "int | None":
    """pg SRF tier; dispatched for read == postgres, first pass only
    (every emission renames the head function, so re-reads are
    inert)."""
    toks, edits = ctx.toks, ctx.edits
    i, name = ctx.i, ctx.name
    start = ctx.start
    sql = ctx.sql
    _arg_text, transpile = ctx.arg_text, ctx.transpile

    if name not in (
        "string_to_table", "regexp_split_to_table", "unnest",
    ):
        return None
    spans, close = _call_arg_spans(toks, i + 1)
    if any(e[1] >= start and e[0] <= toks[close][3] for e in edits):
        return i + 1  # an earlier construct's edit spans this call

    if name == "string_to_table":
        if len(spans) not in (2, 3):
            raise TranspileError(
                "string_to_table takes (string, separator[, "
                "null_string])"
            )
        # delegate the splitting rules to the string_to_array handler
        # (same rules, pinned identical) by transpiling the array form
        frag = (
            "string_to_array("
            + sql[toks[spans[0][0]][2]: toks[spans[-1][1]][3]]
            + ")"
        )
        edits.append(
            (start, toks[close][3], f"explode({transpile(frag, 'postgres')})")
        )
        return close + 1

    if name == "regexp_split_to_table":
        if len(spans) not in (2, 3):
            raise TranspileError(
                "regexp_split_to_table takes (string, pattern[, flags])"
            )
        flags = ""
        if len(spans) == 3:
            fsp = spans[2]
            if not (fsp[0] == fsp[1] and toks[fsp[0]][0] == "string"):
                raise TranspileError(
                    "regexp_split_to_table flags must be a string "
                    "literal to transpile"
                )
            flags = _literal_content(toks[fsp[0]][1], "postgres")
            if not set(flags) <= {"i", "c", "s"} or (
                "i" in flags and "c" in flags
            ):
                raise TranspileError(
                    f"regexp_split_to_table flag string '{flags}' has "
                    "no Spark rewrite; only i/c/s transpile"
                )
        psp = spans[1]
        if psp[0] == psp[1] and toks[psp[0]][0] == "string":
            pat = convert_regex_literal(convert_posix_classes(
                _literal_content(toks[psp[0]][1], "postgres")
            ), "postgres")
            if "i" in flags:
                pat = "(?i)" + pat
            p_ = _spark_string_literal(pat, "postgres")
        elif flags:
            raise TranspileError(
                "regexp_split_to_table with flags needs a literal "
                "pattern to inline them"
            )
        else:
            p_ = f"({_arg_text(psp)})"
        edits.append(
            (start, toks[close][3],
             f"explode(split(({_arg_text(spans[0])}), {p_}))")
        )
        return close + 1

    if name == "unnest" and len(spans) >= 2:
        args = ", ".join(f"({_arg_text(sp)})" for sp in spans)
        edits.append(
            (start, toks[close][3], f"inline(arrays_zip({args}))")
        )
        return close + 1

    return None
