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
    _NAME_KINDS,
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


def unfold_variadic(sql: str) -> str:
    """Raw-text PRE-pass (round 11): pg ``f(..., VARIADIC ARRAY[a, b])``
    ≡ ``f(..., a, b)`` for ANY element expressions — but the unfold
    must happen before call handlers consume the parent call (they
    paren-wrap each argument span, which would turn the unfolded comma
    list into a tuple; the wave-57 format()/concat() SPARK_ERRs).
    Splicing the RAW inner text back keeps everything in pg spelling
    for the normal pipeline.  Non-ARRAY-literal VARIADIC uses (dynamic
    arrays, ARRAY(SELECT ...), ::type[] cast suffixes) are left for
    token_handlers' louds below.  Called from transpile() when the
    keyword appears; bounded by one splice per scan.
    """
    from sqlmesh_spark.core.transpile_shared import _tokenize_spans

    for _ in range(32):
        toks = _tokenize_spans(sql, "postgres")
        n = len(toks)
        spliced = False
        for i in range(n - 2):
            if not (toks[i][0] in _NAME_KINDS
                    and toks[i][1].upper() == "VARIADIC"):
                continue
            j = i + 1
            if not (toks[j][0] in _NAME_KINDS
                    and toks[j][1].upper() == "ARRAY"
                    and j + 1 < n
                    and toks[j + 1][0] == "op"
                    and toks[j + 1][1] in ("[", "(")):
                continue
            k = j + 1
            if (toks[k][1] == "(" and k + 1 < n
                    and toks[k + 1][0] in _NAME_KINDS
                    and toks[k + 1][1].upper() == "SELECT"):
                continue
            depth, m = 0, k
            while m < n:
                tk, tt = toks[m][0], toks[m][1]
                if tk == "op" and tt in ("[", "("):
                    depth += 1
                elif tk == "op" and tt in ("]", ")"):
                    depth -= 1
                    if depth == 0:
                        break
                m += 1
            if m >= n:
                continue
            if (m + 1 < n and toks[m + 1][0] == "op"
                    and toks[m + 1][1] == "::"):
                continue  # typed empty-array idiom — loud later
            inner = sql[toks[k][3]: toks[m][2]].strip()
            sql = sql[:toks[i][2]] + inner + sql[toks[m][3]:]
            spliced = True
            break
        if not spliced:
            return sql
    return sql


def token_handlers(ctx) -> "int | None":
    """pg ROWS FROM (...) and VARIADIC (round 11) — token-level SRF
    companions, dispatched from transpile.py for read == postgres on
    exactly the ROWS / VARIADIC trigger idents.  NOT first_pass-gated:
    a deferral (pending-edit overlap) must still convert on later
    passes, and every emission is rename-inert on re-reads.

    * ROWS FROM (unnest(a), unnest(b), ...) — pg zips member SRFs with
      NULL padding for the shorter ones, exactly arrays_zip's padding
      (the same semantics as multi-arg unnest above); members other
      than 1-arg unnest (generate_series, column-definition AS
      suffixes) stay loud.
    * VARIADIC ARRAY[...] — pg unfolds the constructor's elements into
      plain arguments (f(VARIADIC ARRAY[a, b]) ≡ f(a, b), any element
      expressions); a DYNAMIC array (VARIADIC arr_col) cannot become
      an argument list textually and is loud.  The ARRAY(...) spelling
      is matched too (pending-edit deferral leaves the constructor in
      Spark spelling on the next pass); ARRAY(SELECT ...) subqueries
      and trailing ::type[] casts (the empty-array typing idiom) are
      loud.
    """
    toks, edits = ctx.toks, ctx.edits
    i, kind, text = ctx.i, ctx.kind, ctx.text
    sql = ctx.sql
    n = len(toks)
    if kind not in _NAME_KINDS:
        return None
    up = text.upper()

    if up == "ROWS":
        if not (
            i + 2 < n
            and toks[i + 1][0] in _NAME_KINDS
            and toks[i + 1][1].upper() == "FROM"
            and toks[i + 2][0] == "op" and toks[i + 2][1] == "("
        ):
            return None  # window-frame ROWS etc.
        spans, close = _call_arg_spans(toks, i + 2)
        if any(e[1] >= ctx.start and e[0] <= toks[close][3]
               for e in edits):
            return i + 1  # defer under an earlier overlapping edit
        arrays = []
        for sp in spans:
            s0, s1 = sp
            ok = (
                toks[s0][0] in _NAME_KINDS
                and toks[s0][1].lower() == "unnest"
                and s0 + 1 < s1
                and toks[s0 + 1][0] == "op" and toks[s0 + 1][1] == "("
            )
            if ok:
                isp, iclose = _call_arg_spans(toks, s0 + 1)
                ok = len(isp) == 1 and iclose == s1
            if not ok:
                raise TranspileError(
                    "pg ROWS FROM (...) transpiles only when every "
                    "member is a 1-argument unnest(<array>) (zip "
                    "semantics → arrays_zip); other set-returning "
                    "members or column-definition suffixes need "
                    "separate LATERAL joins"
                )
            arrays.append(f"({ctx.arg_text(isp[0])})")
        if len(arrays) == 1:
            repl = f"explode({arrays[0]})"
        else:
            repl = f"inline(arrays_zip({', '.join(arrays)}))"
        edits.append((ctx.start, toks[close][3], repl))
        return close + 1

    if up == "VARIADIC":
        j = i + 1
        if not (
            j < n
            and toks[j][0] in _NAME_KINDS
            and toks[j][1].upper() == "ARRAY"
            and j + 1 < n
            and toks[j + 1][0] == "op" and toks[j + 1][1] in ("[", "(")
        ):
            raise TranspileError(
                "pg VARIADIC transpiles only over an inline "
                "ARRAY[...] constructor (unfolds into plain "
                "arguments); a dynamic array argument cannot become "
                "an argument list"
            )
        k = j + 1
        if (
            toks[k][1] == "("
            and k + 1 < n
            and toks[k + 1][0] in _NAME_KINDS
            and toks[k + 1][1].upper() == "SELECT"
        ):
            raise TranspileError(
                "pg VARIADIC ARRAY(SELECT ...) cannot unfold into an "
                "argument list; aggregate first, or list the "
                "arguments explicitly"
            )
        depth, m = 0, k
        while m < n:
            tk, tt = toks[m][0], toks[m][1]
            if tk == "op" and tt in ("[", "("):
                depth += 1
            elif tk == "op" and tt in ("]", ")"):
                depth -= 1
                if depth == 0:
                    break
            m += 1
        if m >= n:
            return None
        if any(e[1] >= ctx.start and e[0] <= toks[m][3] for e in edits):
            return i + 1
        if (
            m + 1 < n
            and toks[m + 1][0] == "op" and toks[m + 1][1] == "::"
        ):
            raise TranspileError(
                "pg VARIADIC ARRAY[...]::type[] keeps its cast after "
                "unfolding, which has no argument-list meaning; drop "
                "the cast or list the arguments explicitly"
            )
        inner = sql[toks[k][3]: toks[m][2]].strip()
        repl = ctx.transpile(inner, "postgres") if inner else ""
        edits.append((ctx.start, toks[m][3], repl))
        return m + 1

    return None
