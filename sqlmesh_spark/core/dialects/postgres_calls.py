"""Postgres-specific CALL handlers (the round-7 pg function seams:
num_nonnulls/num_nulls unfolds, format -> format_string, array_prepend
-> array_insert, array_replace, quote_ident family, substring-from-
regex, string_agg ORDER BY -> listagg WITHIN GROUP, string_to_array('')
and friends). Pre-split code verbatim; dispatched from
standard.call_handlers at the exact position the section occupied, so
handler order is unchanged. Token-level pg handlers live in
core/dialects/postgres.py.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _call_arg_spans,
    _require_spark4,
)
from sqlmesh_spark.core.transpile_text import (
    _literal_content,
    _pg_regex_substring_emit,
    _regex_literal,
    _spark_string_literal,
    convert_posix_classes,
    convert_regex_literal,
)
from sqlmesh_spark.core.dialects.postgres_json import (
    _pg_json_calls,
)

_unused_imports = (_NAME_KINDS,)


def call_handlers(ctx) -> "int | None":
    """Round-7 pg call handlers, dispatched from standard.call_handlers
    at the exact position the section occupied (order unchanged)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, start, end, first_pass, is_op,
               _arg_text, transpile, n)

    # ---- Postgres-specific handlers (round 7, each found by the
    # live-PG differential fuzz harness tests/test_dialect_fuzz_pg.py)
    if read == "postgres" and first_pass:
        if name in ("num_nonnulls", "num_nulls"):
            # variadic NULL counters — unfold into an IF-sum (each arg
            # referenced exactly once; args may have mixed types, so an
            # array() fold is not an option)
            spans, close = _call_arg_spans(toks, i + 1)
            if not spans:
                raise TranspileError(f"{name} takes at least one argument")
            pred = "IS NOT NULL" if name == "num_nonnulls" else "IS NULL"
            parts = [
                f"(CASE WHEN ({_arg_text(sp)}) {pred} THEN 1 ELSE 0 END)"
                for sp in spans
            ]
            edits.append((start, toks[close][3], "(" + " + ".join(parts) + ")"))
            return close + 1
        if name == "format":
            # pg format() is exact only for %s/%% directives (with
            # explicit argument positions loud): %I/%L quote
            # identifiers/literals — no Spark analog. pg %s renders
            # NULL as '' where Java's format_string prints "null" —
            # each argument gets a coalesce(CAST(.. AS STRING), '').
            spans, close = _call_arg_spans(toks, i + 1)
            ftok = toks[spans[0][0]] if spans else None
            if (
                ftok is None
                or spans[0][0] != spans[0][1]
                or ftok[0] != "string"
            ):
                raise TranspileError(
                    "postgres format() needs a literal format string "
                    "to transpile"
                )
            fmt = _literal_content(ftok[1], read)
            if (
                re.search(r"%(?!(\d+\$)?s|%)", fmt)
                or fmt.endswith("%")
            ):
                raise TranspileError(
                    "postgres format() directives other than "
                    "%s/%n$s/%% (%I identifier / %L literal quoting, "
                    "width/flags) have no Spark rewrite"
                )
            pos = re.findall(r"%(\d*)(?:\$)?s", fmt)
            if any(p for p in pos) and not all(p for p in pos):
                # mixed positional + sequential: pg's plain %s
                # continues AFTER the last argument any directive
                # consumed ('%1$s %s' of (a,b) is 'a b'), Java's
                # ordinary conversions keep their OWN counter
                # ('a a') — pinned live both sides, round 11
                raise TranspileError(
                    "postgres format() mixing %n$s with plain %s "
                    "diverges from Java's format_string argument "
                    "indexing; use all-positional or all-sequential "
                    "directives"
                )
            args = ", ".join(
                f"coalesce(CAST(({_arg_text(sp)}) AS STRING), '')"
                for sp in spans[1:]
            )
            fmt_lit = _spark_string_literal(fmt, read)
            edits.append(
                (start, toks[close][3],
                 f"format_string({fmt_lit}{', ' + args if args else ''})")
            )
            return close + 1
        if name in ("array_prepend", "list_prepend"):
            # pg/duckdb take (element, array); Spark array_prepend
            # takes (array, element) — a pure swap would re-swap on the
            # next pass, so emit array_insert(arr, 1, elem) instead
            spans, close = _call_arg_spans(toks, i + 1)
            if len(spans) != 2:
                raise TranspileError(f"{name} takes (element, array)")
            edits.append(
                (start, toks[close][3],
                 f"array_insert(({_arg_text(spans[1])}), 1, "
                 f"({_arg_text(spans[0])}))")
            )
            return close + 1
        if name == "array_replace":
            # transform with a null-safe comparison: pg array_replace
            # also replaces NULL elements when `from` is NULL
            spans, close = _call_arg_spans(toks, i + 1)
            if len(spans) != 3:
                raise TranspileError("array_replace takes (array, from, to)")
            edits.append(
                (start, toks[close][3],
                 f"transform(({_arg_text(spans[0])}), _x -> "
                 f"if(_x <=> ({_arg_text(spans[1])}), "
                 f"({_arg_text(spans[2])}), _x))")
            )
            return close + 1
        if name in ("quote_ident", "quote_literal", "quote_nullable"):
            raise TranspileError(
                f"postgres {name}() quotes conditionally (keyword and "
                "character checks) — no Spark rewrite"
            )


    if (
        read == "postgres"
        and name in ("percentile_cont", "percentile_disc")
    ):
        # the ARRAY-of-fractions form (round 11, wave 54):
        # percentile_cont(ARRAY[...]) WITHIN GROUP returns the
        # quantile PER ELEMENT as an array — Spark's
        # percentile_cont takes only a scalar fraction (the array
        # passed through as an analysis error). percentile_cont →
        # Spark percentile(v, array(...)) (exact interpolation,
        # same contract); percentile_disc unfolds into an array()
        # of scalar WITHIN GROUP calls (needs literal elements).
        # DESC order keys are loud (continuous could flip to 1-p
        # but discrete tie-breaking differs). Scalar-fraction
        # forms fall through to the native passthrough.
        spans, close = _call_arg_spans(toks, i + 1)
        arr0 = spans[0][0] if len(spans) == 1 else None
        # only the converted array(...) call form — a raw
        # ARRAY[...] constructor resolves on the next fixpoint
        # pass once the bracket form rewrites
        is_arr = (
            arr0 is not None
            and toks[arr0][0] in _NAME_KINDS
            and toks[arr0][1].upper() == "ARRAY"
            and arr0 + 1 <= spans[0][1]
            and toks[arr0 + 1][0] == "op"
            and toks[arr0 + 1][1] == "("
        )
        if is_arr and not any(
            e[1] >= start and e[0] <= toks[close][3] for e in edits
        ):
            j = close + 1
            kws = []
            while j < n and toks[j][0] in _NAME_KINDS and len(kws) < 2:
                kws.append(toks[j][1].upper())
                j += 1
            if kws[:2] == ["WITHIN", "GROUP"] and (
                j < n and toks[j][0] == "op" and toks[j][1] == "("
            ):
                ospans, oclose = _call_arg_spans(toks, j)
                og = ospans[0]
                if not (
                    og[1] >= og[0] + 2
                    and toks[og[0]][1].upper() == "ORDER"
                    and toks[og[0] + 1][1].upper() == "BY"
                ):
                    raise TranspileError(
                        "WITHIN GROUP needs ORDER BY"
                    )
                kend = og[1]
                if toks[kend][0] in _NAME_KINDS and \
                        toks[kend][1].upper() in ("ASC", "DESC"):
                    if toks[kend][1].upper() == "DESC":
                        raise TranspileError(
                            f"postgres {name}(ARRAY[...]) with a "
                            "DESC order key has no faithful "
                            "rewrite; invert the fractions or "
                            "sort ascending"
                        )
                    kend -= 1
                v_ = sql[toks[og[0] + 2][2]:toks[kend][3]].strip()
                fr_sp, fr_close = _call_arg_spans(toks, arr0 + 1)
                if name == "percentile_cont":
                    fr_txt = ", ".join(
                        f"({_arg_text(sp)})" for sp in fr_sp
                    )
                    repl = (
                        f"percentile(({v_}), array({fr_txt}))"
                    )
                else:
                    parts = ", ".join(
                        f"percentile_disc(({_arg_text(sp)})) "
                        f"WITHIN GROUP (ORDER BY ({v_}))"
                        for sp in fr_sp
                    )
                    repl = f"array({parts})"
                _unused2 = fr_close
                edits.append((start, toks[oclose][3], repl))
                return oclose + 1

    if (
        name == "string_to_array"
        and read == "postgres"
        and first_pass
    ):
        # pg string_to_array('') is an EMPTY array; Spark split('', p)
        # (and duckdb string_split) give ['']. Bind the source once and
        # branch; the separator converts to the escaped-regex split()
        # form INLINE (the shared handler below is first_pass-gated, so
        # an emitted inner string_to_array would never convert). The
        # 3-arg form's null_string maps matching elements to NULL
        # (never NULL-matches when null_string itself is NULL — split
        # produces no NULL elements, so <=> reproduces pg exactly).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) in (2, 3):
            sep_first, sep_last = spans[1]
            sep_is_null = (
                sep_first == sep_last
                and toks[sep_first][0] in _NAME_KINDS
                and toks[sep_first][1].upper() == "NULL"
            )
            if not sep_is_null and not (
                sep_first == sep_last and toks[sep_first][0] == "string"
            ):
                raise TranspileError(
                    "string_to_array separator must be a literal to "
                    "transpile (Spark split() treats it as a regex)"
                )
            s_ = _arg_text(spans[0])
            if sep_is_null:
                # pg NULL separator splits into CHARACTERS (pinned:
                # string_to_array('abc', NULL) = {a,b,c}; '' → {})
                split_expr = "split(_t._ss, '')"
            else:
                sep_lit = _regex_literal(
                    _literal_content(toks[sep_first][1], read), read
                )
                split_expr = f"split(_t._ss, {sep_lit})"
            if len(spans) == 3:
                ns_ = _arg_text(spans[2])
                split_expr = (
                    f"transform({split_expr}, "
                    f"_x -> IF(_x <=> ({ns_}), NULL, _x))"
                )
            edits.append(
                (start, toks[close][3],
                 f"element_at(transform(array(struct(({s_}) AS _ss)), "
                 f"_t -> CASE WHEN _t._ss = '' THEN "
                 f"CAST(array() AS ARRAY<STRING>) ELSE "
                 f"{split_expr} END), 1)")
            )
            return close + 1

    if (
        name == "substring"
        and read in ("postgres", "duckdb")
        and first_pass
        and is_op(i + 1, "(")
    ):
        # substring(s FROM 'pattern') / substring(s, 'pattern') — the
        # pg POSIX-regex form (a STRING second operand; the positional
        # form takes numbers). Returns group 1 when the pattern
        # captures, else the whole match; NULL when no match (Spark
        # regexp_extract gives '' — nullif). A pattern matching the
        # EMPTY string diverges (pg '' vs NULL here) — documented, no
        # non-matching shape. The FROM-less `substring(s FOR n)` form
        # below exists in BOTH pg and duckdb (round-9 string wave);
        # the regex branches are pg-only (duck's substring is
        # positional-only — a string second operand is duck-rejected).
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            read == "postgres"
            and len(spans) == 2
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] == "string"
        ):
            pat = _literal_content(toks[spans[1][0]][1], read)
            edits.append(
                (start, toks[close][3],
                 _pg_regex_substring_emit(_arg_text(spans[0]), pat, read))
            )
            return close + 1
        if len(spans) == 1:
            sp = spans[0]
            from_idx = None
            for_idx = None
            similar_idx = None
            depth = 0
            for j in range(sp[0], sp[1] + 1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                elif depth == 0 and k_ == "ident" and t_.upper() == "FROM":
                    from_idx = j
                    break
                elif depth == 0 and k_ == "ident" and t_.upper() == "FOR":
                    for_idx = j
                    break
                elif (
                    depth == 0 and k_ == "ident"
                    and t_.upper() == "SIMILAR"
                ):
                    similar_idx = j
                    break
            if read == "postgres" and similar_idx is not None:
                # substring(s SIMILAR p ESCAPE e) — SQL:2003 regex
                # form (pg 15; the ESCAPE is grammatically REQUIRED).
                # The pattern is a SIMILAR-TO pattern where the two
                # e" markers delimit the returned portion; no markers
                # returns the whole match; no match → NULL, an EMPTY
                # capture → '' (both pinned live on PG 15, so a bare
                # nullif-on-'' emission would be wrong — RLIKE-guarded
                # CASE instead). Previously shipped as a Spark parse
                # error.
                if not (
                    similar_idx + 3 == sp[1]
                    and toks[similar_idx + 1][0] == "string"
                    and toks[similar_idx + 2][0] == "ident"
                    and toks[similar_idx + 2][1].upper() == "ESCAPE"
                    and toks[sp[1]][0] == "string"
                ):
                    raise TranspileError(
                        "substring(s SIMILAR p ESCAPE e) needs literal "
                        "pattern and escape to transpile"
                    )
                pat_s = _literal_content(toks[similar_idx + 1][1], read)
                esc_s = _literal_content(toks[sp[1]][1], read)
                if len(esc_s) != 1:
                    raise TranspileError(
                        "substring SIMILAR escape must be one character"
                    )
                rx_s = _similar_substring_regex(pat_s, esc_s)
                s_text = transpile(
                    sql[toks[sp[0]][2]: toks[similar_idx][2]].rstrip(),
                    read,
                )
                lit_s = _spark_string_literal(rx_s, read)
                edits.append(
                    (start, toks[close][3],
                     f"CASE WHEN ({s_text}) RLIKE {lit_s} THEN "
                     f"regexp_extract(({s_text}), {lit_s}, 1) "
                     f"ELSE NULL END")
                )
                return close + 1
            if from_idx is None and for_idx is not None:
                # substring(s FOR n) — pg's FROM-less form starts at 1;
                # Spark's grammar requires the FROM. transpile() the
                # copied fragments (not raw slices): an E'...' literal
                # inside a whole-call edit span is skipped by the end-
                # of-pass literal decode and would ship untranspiled
                s_text = transpile(
                    sql[toks[sp[0]][2]: toks[for_idx][2]].rstrip(), read
                )
                n_text = transpile(
                    sql[toks[for_idx][3]: toks[sp[1]][3]].strip(), read
                )
                edits.append(
                    (start, toks[close][3],
                     f"substring(({s_text}) FROM 1 FOR {n_text})")
                )
                return close + 1
            if (
                read == "postgres"
                and from_idx is not None
                and from_idx + 1 == sp[1]
                and toks[sp[1]][0] == "string"
            ):
                pat = _literal_content(toks[sp[1]][1], read)
                # transpile(), not a raw slice: an E'...' source inside
                # this whole-call edit span would otherwise skip the
                # end-of-pass literal decode and ship untranspiled
                s_text = transpile(
                    sql[toks[sp[0]][2]: toks[from_idx][2]].rstrip(), read
                )
                edits.append(
                    (start, toks[close][3],
                     _pg_regex_substring_emit(s_text, pat, read))
                )
                return close + 1

    # ---- Round-8 pg function batch (each found by adversarially
    # probing live PG 15 with shapes outside the fuzz corpus)
    if read == "postgres" and first_pass:
        nxt = _pg_round8_calls(ctx)
        if nxt is not None:
            return nxt

    # ---- Round-9 JSON constructors — dispatched WITHOUT the
    # first_pass gate: the to_json shape-consumer below must also fire
    # on later fixpoint passes or the pg None-map entry for to_json
    # would raise on our own emissions.
    if read == "postgres":
        nxt = _pg_json_calls(ctx)
        if nxt is not None:
            return nxt

    if (
        name == "string_agg"
        and read in ("duckdb", "postgres")
        and first_pass
    ):
        # string_agg(expr, sep ORDER BY k) — the rename below maps the
        # plain form to listagg (Spark 4); an in-args ORDER BY must
        # move into WITHIN GROUP (ORDER BY k), Spark's spelling.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            sp = spans[1]
            ob_idx = None
            depth = 0
            for j in range(sp[0], sp[1] + 1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                elif (
                    depth == 0 and k_ == "ident" and t_.upper() == "ORDER"
                    and j + 1 <= sp[1]
                    and toks[j + 1][0] == "ident"
                    and toks[j + 1][1].upper() == "BY"
                ):
                    ob_idx = j
                    break
            if ob_idx is not None:
                _require_spark4("string_agg", "listagg")
                order_text = sql[toks[ob_idx][2]: toks[sp[1]][3]]
                edits.append((start, end, "listagg"))
                # drop the ORDER BY from the arg list (and the space
                # before it), re-attach as WITHIN GROUP
                edits.append((toks[ob_idx - 1][3], toks[sp[1]][3], ""))
                edits.append(
                    (toks[close][3], toks[close][3],
                     f" WITHIN GROUP ({order_text})")
                )
                return close + 1

    return None


def _similar_substring_regex(pat: str, esc: str) -> str:
    """Java regex for pg ``substring(s SIMILAR p ESCAPE e)``: ``p`` is
    a SIMILAR-TO pattern (%→.*, _→., anchored whole-string) where the
    two ``e"`` marker pairs delimit the capture; no markers capture the
    whole match. ``e``-escaped characters substitute for ``\\`` in ARE
    regex escapes (``#d`` IS the digit class — pinned live). One marker
    is a pg syntax error → loud.

    Greediness (r11 verdict #1, re-pinned live across 15 overlap
    shapes in pg_wave64): ``%`` in the segment BEFORE the capture
    markers must be NON-greedy (``.*?``) — pg returns the capture at
    the EARLIEST position ('a1b22c' ~ '%#"[0-9]+#"%' → '1', and
    'abc123def' → '123', not the '3' a greedy Java prefix eats to —
    while the capture itself and the suffix stay greedy ('abcabc' ~
    '%b#"c%#"' → 'cabc')."""
    segs: list[list[str]] = [[]]
    k = 0
    while k < len(pat):
        c = pat[k]
        if c == esc:
            if k + 1 >= len(pat):
                raise TranspileError(
                    "substring SIMILAR pattern ends with its escape "
                    "character"
                )
            if pat[k + 1] == '"':
                segs.append([])
            else:
                # the escape char substitutes for \ in ARE escapes
                # (pinned live: '#d' IS the digit class — substring(
                # 'a7b' similar '%#"#d#"%' escape '#') = '7'); ARE and
                # Java agree on \d \s \w and punctuation escapes, the
                # ARE-specific letters diverge → loud
                if pat[k + 1] in "bmMy":
                    raise TranspileError(
                        f"substring SIMILAR escape {esc}{pat[k + 1]} "
                        "is an ARE-specific escape with a different "
                        "Java regex meaning — no faithful rewrite"
                    )
                segs[-1].append("\\" + pat[k + 1])
            k += 2
            continue
        if c == "%":
            # placeholder: greediness depends on which segment this
            # lands in, known only after the whole pattern is parsed
            segs[-1].append("\x00%")
        elif c == "_":
            segs[-1].append(".")
        elif c in ".^$":
            segs[-1].append("\\" + c)
        else:
            segs[-1].append(c)
        k += 1
    parts = ["".join(s) for s in segs]
    # prefix-segment wildcards are lazy, capture/suffix greedy (see
    # docstring); with no markers the whole match is anchored and
    # greediness is unobservable — emit greedy.
    parts = [
        p.replace("\x00%", ".*?" if (idx == 0 and len(parts) == 3) else ".*")
        for idx, p in enumerate(parts)
    ]
    if len(parts) == 1:
        return "(?s)^(" + parts[0] + ")\\z"
    if len(parts) != 3:
        raise TranspileError(
            "substring SIMILAR pattern needs exactly two (or zero) "
            'e" capture markers'
        )
    return (
        "(?s)^(?:" + parts[0] + ")(" + parts[1] + ")(?:" + parts[2]
        + ")\\z"
    )


def _count_capture_groups(pat: str) -> int:
    """Number of capturing groups in a POSIX/Java regex (char-classes
    and (?...) non-capturing constructs excluded). NAMED groups —
    RE2/Python (?P<n>...) and Java (?<n>...), but not (?<=/(?<!
    lookbehinds — are capturing and count toward Java's group
    numbering (round 11: the duck named-group regexp_extract form)."""
    n_ = len(pat)
    idx = 0
    in_class = False
    count = 0
    while idx < n_:
        c = pat[idx]
        if c == "\\":
            idx += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            nxt = pat[idx + 1: idx + 2]
            if nxt != "?":
                count += 1
            else:
                tail = pat[idx + 2: idx + 4]
                if tail.startswith("P<") or (
                    tail.startswith("<") and tail[1:2] not in ("=", "!")
                ):
                    count += 1
        idx += 1
    return count


def _group_always_participates(pat: str) -> bool:
    """True iff the pattern's SINGLE capture group provably participates
    in every overall match.  pg renders a non-participating group as a
    NULL array element where the regexp_extract emission yields '' — a
    silent value divergence even with ONE group (verified live on PG 15:
    regexp_match('abc','a(x)?') = {NULL}).  Conservative static check:
    no top-level alternation, no non-capturing groups (they could make
    the capture optional) except a leading inline-flags group, and no
    0-min quantifier (?, *, {0,...}) after the group's closing paren.
    Alternation INSIDE the group is fine — a participating group that
    captures '' renders '' on both engines."""
    n_ = len(pat)
    idx = 0
    in_class = False
    g_seen = False
    while idx < n_:
        c = pat[idx]
        if c == "\\":
            idx += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "|":
            return False
        elif c == "(":
            if idx + 1 < n_ and pat[idx + 1] == "?":
                m = re.match(r"\(\?[a-z]+\)", pat[idx:])
                if not (idx == 0 and m):
                    return False
                idx += m.end()
                continue
            # capture group: skip to its closing paren (escape/class
            # aware), then inspect the quantifier position
            depth = 1
            j = idx + 1
            icl = False
            while j < n_ and depth:
                cj = pat[j]
                if cj == "\\":
                    j += 2
                    continue
                if icl:
                    if cj == "]":
                        icl = False
                elif cj == "[":
                    icl = True
                elif cj == "(":
                    depth += 1
                elif cj == ")":
                    depth -= 1
                j += 1
            if depth:
                return False
            if j < n_ and pat[j] in "?*{":
                if pat[j] != "{":
                    return False
                m2 = re.match(r"\{(\d+)", pat[j:])
                if not m2 or int(m2.group(1)) == 0:
                    return False
            g_seen = True
            idx = j
            continue
        idx += 1
    return g_seen


#: pg make_interval keyword-argument order — identical to Spark's
#: positional make_interval(years, months, weeks, days, hours, mins,
#: secs), so named calls rewrite to positional ones.
_MAKE_INTERVAL_ARGS = (
    "years", "months", "weeks", "days", "hours", "mins", "secs",
)


def _pg_round8_calls(ctx) -> "int | None":
    """Postgres call handlers added in round 8: encode/decode
    (hex/base64), to_hex, intN()/floatN() function-style casts,
    isfinite, get_byte, array_upper/lower/fill/positions, trim_array,
    regexp_match, make_interval named arguments. Dispatched only for
    read == postgres on the first pass."""
    toks, edits = ctx.toks, ctx.edits
    sql, read = ctx.sql, ctx.read
    i, name = ctx.i, ctx.name
    start = ctx.start
    _arg_text = ctx.arg_text
    _unused = (sql,)

    if name in ("rank", "dense_rank", "percent_rank", "cume_dist"):
        # HYPOTHETICAL-SET aggregates: rank(x) WITHIN GROUP (ORDER BY
        # v) is "the rank x WOULD have if inserted" — Spark's
        # same-named functions are window-only and reject the syntax
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            spans
            and close + 1 < len(toks)
            and toks[close + 1][0] in _NAME_KINDS
            and toks[close + 1][1].upper() == "WITHIN"
        ):
            raise TranspileError(
                f"postgres hypothetical-set {name}(x) WITHIN GROUP "
                "has no Spark form; count rows on either side of x "
                "explicitly (e.g. 1 + count(*) FILTER (WHERE v < x))"
            )

    if name in ("encode", "decode"):
        # pg encode(bytea, fmt) / decode(text, fmt) — Spark's same-named
        # functions do CHARSET conversion, a silent misread without this
        # rewrite (loudly rejected charsets aside). hex is lowercase in
        # pg; Spark hex() is uppercase. 'escape' format is loud (pg
        # octal-escapes non-printables — no Spark analog).
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) != 2
            or spans[1][0] != spans[1][1]
            or toks[spans[1][0]][0] != "string"
        ):
            raise TranspileError(
                f"postgres {name}(x, format) needs a literal format "
                "to transpile (Spark's encode/decode are charset "
                "converters, not binary codecs)"
            )
        fmt = _literal_content(toks[spans[1][0]][1], read).lower()
        x_ = _arg_text(spans[0])
        if fmt == "hex":
            repl = (
                f"lower(hex(({x_})))" if name == "encode"
                else f"unhex(({x_}))"
            )
        elif fmt == "base64":
            repl = (
                f"base64(({x_}))" if name == "encode"
                else f"unbase64(({x_}))"
            )
        else:
            raise TranspileError(
                f"postgres {name}(x, '{fmt}') has no Spark rewrite "
                "(only hex/base64 map); 'escape' octal-escaping has "
                "no analog"
            )
        edits.append((start, toks[close][3], repl))
        return close + 1

    if name in ("convert_from", "convert_to"):
        # convert_from(bytea, 'UTF8') / convert_to(text, 'UTF8') —
        # Spark strings ARE UTF-8, so the conversions are plain
        # BINARY↔STRING casts (pinned live: convert_from(decode(
        # '616263','hex'),'UTF8') = 'abc').  Other encodings have no
        # Spark charset machinery on the pg read (Spark's own
        # encode/decode names collide with pg's binary codecs above).
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 2
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] == "string"
        ):
            enc = _literal_content(
                toks[spans[1][0]][1], read
            ).lower().replace("-", "").replace("_", "")
            if enc in ("utf8", "utf8mb4"):
                x_ = _arg_text(spans[0])
                tgt = "STRING" if name == "convert_from" else "BINARY"
                edits.append(
                    (start, toks[close][3],
                     f"CAST(({x_}) AS {tgt})")
                )
                return close + 1
        raise TranspileError(
            f"postgres {name} transpiles only for the 'UTF8' "
            "encoding (Spark strings are UTF-8; other charsets have "
            "no conversion)"
        )

    if name == "to_hex":
        # literal non-negative ints evaluate statically; anything else
        # is loud — pg to_hex(int4) renders negatives as 32-bit
        # two's-complement ('ffffffff') while Spark hex() is always
        # 64-bit, a silent divergence on negative columns
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 1
            and spans[0][0] == spans[0][1]
            and toks[spans[0][0]][0] == "number"
            and "." not in toks[spans[0][0]][1]
        ):
            v = int(toks[spans[0][0]][1])
            edits.append(
                (start, toks[close][3], _spark_string_literal(f"{v:x}", read))
            )
            return close + 1
        raise TranspileError(
            "postgres to_hex() maps only for literal non-negative "
            "integers (pg renders negative int4 as 32-bit "
            "two's-complement; Spark hex() is 64-bit) — use "
            "lower(hex(x)) explicitly if the column is non-negative"
        )

    if name in ("int2", "int4", "int8", "float4", "float8"):
        # function-style casts: re-spell as the :: form so the existing
        # cast machinery applies pg's numeric->int rounding rules
        # (int4(2.7) = 3) on the next fixpoint pass
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3], f"(({_arg_text(spans[0])})::{name})")
            )
            return close + 1

    if name == "isfinite":
        # Spark datetimes cannot hold pg's 'infinity' sentinel, so a
        # finite non-NULL input is always TRUE; NULL stays NULL
        # ('infinity'::date itself fails the Spark cast loudly first)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"IF(({x_}) IS NULL, NULL, TRUE)")
            )
            return close + 1

    if name == "get_byte":
        # get_byte(bytea, n) — byte n (0-based) as int. Spark has no
        # byte indexer; two hex digits at offset 2n+1 are exact.
        # Out-of-range: pg raises, conv('')=0 would be silent — bound
        # with a CASE that nulls OOB (NULL beats a wrong 0; pg rejects
        # the shape anyway).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            b_, n_ = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"CAST(conv(nullif(substring(hex(({b_})) "
                 f"FROM ({n_}) * 2 + 1 FOR 2), ''), 16, 10) AS INT)")
            )
            return close + 1

    if name in ("array_upper", "array_lower"):
        # 1-D semantics over Spark arrays: upper = cardinality (empty
        # and NULL arrays → NULL), lower = 1 when non-empty. Only the
        # literal dimension 1 maps; pg returns NULL for higher dims on
        # 1-D values but a real bound on nested arrays — statically
        # unknowable, loud.
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) == 2
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] == "number"
        ):
            if toks[spans[1][0]][1] != "1":
                raise TranspileError(
                    f"postgres {name}(a, dim) maps only for dim=1 "
                    "(higher dims need nested-array type knowledge)"
                )
            a_ = _arg_text(spans[0])
            repl = (
                f"nullif(cardinality(({a_})), 0)"
                if name == "array_upper"
                else f"IF(coalesce(cardinality(({a_})), 0) = 0, "
                     f"NULL, 1)"
            )
            edits.append((start, toks[close][3], repl))
            return close + 1
        raise TranspileError(
            f"postgres {name}(a, dim) needs a literal dimension to "
            "transpile"
        )

    if name == "array_fill":
        # array_fill(elem, ARRAY[n]) → array_repeat(elem, n); the
        # 3-arg lower-bound form and multi-dim fills have no Spark
        # analog (Spark arrays are 1-based 1-D)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            d0, d1 = spans[1]
            if (
                d1 == d0 + 3
                and toks[d0][0] in _NAME_KINDS
                and toks[d0][1].upper() == "ARRAY"
                and toks[d0 + 1][1] == "["
                and toks[d0 + 2][0] == "number"
                and toks[d0 + 3][1] == "]"
            ):
                edits.append(
                    (start, toks[close][3],
                     f"array_repeat(({_arg_text(spans[0])}), "
                     f"{toks[d0 + 2][1]})")
                )
                return close + 1
        raise TranspileError(
            "postgres array_fill maps only for a literal 1-D "
            "dimension ARRAY[n]; lower-bound/multi-dim forms have no "
            "Spark analog"
        )

    if name == "array_remove":
        # pg array_remove matches NULL-safely (array_remove(a, NULL)
        # DROPS the NULL elements); Spark's returns NULL for a NULL
        # needle — filter with <=> reproduces pg exactly, NULL array
        # in → NULL out included
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, x_ = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"filter(({a_}), _e -> NOT (_e <=> ({x_})))")
            )
            return close + 1

    if name in ("arraycontains", "arraycontained", "arrayoverlap"):
        # pg catalog-internal spellings of @> / <@ / && — same
        # containment/overlap semantics (strict equality, NULL
        # operand → NULL)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, b_ = _arg_text(spans[0]), _arg_text(spans[1])
            if name == "arraycontained":
                a_, b_ = b_, a_
            if name == "arrayoverlap":
                repl = (
                    f"IF(({a_}) IS NULL OR ({b_}) IS NULL, NULL, "
                    f"coalesce(arrays_overlap(({a_}), ({b_})), false))"
                )
            else:
                repl = (
                    f"IF(({a_}) IS NULL OR ({b_}) IS NULL, NULL, "
                    f"forall(({b_}), _e -> "
                    f"coalesce(array_contains(({a_}), _e), false)))"
                )
            edits.append((start, toks[close][3], repl))
            return close + 1

    if name == "array_positions":
        # every 1-based index whose element IS NOT DISTINCT FROM the
        # needle (pg matches NULL elements too); NULL array → NULL,
        # no match → empty array — transform+filter reproduces all
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, x_ = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"filter(transform(({a_}), (_e, _i) -> "
                 f"IF(_e <=> ({x_}), _i + 1, CAST(NULL AS INT))), "
                 f"_p -> _p IS NOT NULL)")
            )
            return close + 1

    if name == "initcap":
        # pg initcap starts a new word after ANY non-alphanumeric
        # character ('wORLD-foo' → 'World-Foo', "c'd" → "C'D" — pinned
        # live; unicode letters count as word chars: 'éa' → 'Éa');
        # Spark's initcap only splits on whitespace — a silent value
        # divergence on every hyphen/punctuation boundary. Per-char
        # rebuild: lowercase once, uppercase chars whose PREDECESSOR
        # is not a letter/digit. array_join (not concat_ws) so a NULL
        # input stays NULL — pg initcap(NULL) IS NULL, and concat_ws
        # never returns NULL (it yields '' when the transformed array
        # is NULL). Keyword-form substring stays inert on re-reads
        # (the 3-arg comma form would be rewritten).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            x_ = _arg_text(spans[0])
            cls = "'[\\\\p{L}\\\\p{Nd}]'"
            edits.append(
                (start, toks[close][3],
                 f"element_at(transform(array(lower(({x_}))), _s -> "
                 f"array_join(transform(split(_s, ''), (_c, _i) -> "
                 f"CASE WHEN _i = 0 OR NOT substring(_s FROM _i FOR 1) "
                 f"RLIKE {cls} THEN upper(_c) ELSE _c END), '')), 1)")
            )
            return close + 1

    if name == "normalize" and len(_call_arg_spans(toks, i + 1)[0]) >= 1:
        raise TranspileError(
            "postgres normalize() (Unicode normal forms) has no Spark "
            "builtin; normalize at ingestion or with a pandas UDF"
        )

    if name == "round":
        # pg round(float8) is round-half-EVEN (round(2.5::float8) = 2,
        # pinned live — the numeric overload is half-away); Spark's
        # round() is half-up for doubles, so statically float-typed
        # arguments need bround. (The 2-arg form is numeric-only in pg
        # — no float path.) Mirrors the ::int castee bround seam.
        from sqlmesh_spark.core.transpile_types import (
            _float_typed_castee,
        )

        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1 and _float_typed_castee(
            toks, spans[0][0], spans[0][1]
        ):
            edits.append(
                (start, toks[close][3],
                 f"bround(({_arg_text(spans[0])}))")
            )
            return close + 1

    if name == "crosstab":
        # tablefunc crosstab('sql') derives the output COLUMNS from the
        # data at call time — no static Spark schema exists. Previously
        # passed through into a confusing unresolved-function error.
        raise TranspileError(
            "postgres crosstab() derives its output columns from the "
            "data; Spark needs them enumerated — use PIVOT (agg FOR "
            "col IN (values...)) or the @PIVOT macro"
        )

    if name == "cardinality":
        # pg cardinality() counts elements across ALL dimensions of a
        # multidimensional array (cardinality(ARRAY[[1,2],[3,4]]) = 4,
        # live-pinned); Spark size() counts only the outer level — the
        # bare rename was a silent halving on nested input. Statically
        # nested constructors rewrite through flatten() (exact for 2-D);
        # deeper nesting is loud. Non-literal operands can't be typed
        # textually and keep the 1-D rename (documented seam: our table
        # schemas have no nested arrays).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            s0, s1 = spans[0]
            k0, t0 = toks[s0][0], toks[s0][1]
            opens_outer = (
                (k0 in _NAME_KINDS and t0.upper() == "ARRAY"
                 and s0 + 1 <= s1
                 and toks[s0 + 1][0] == "op" and toks[s0 + 1][1] == "[")
                or (k0 in _NAME_KINDS and t0.lower() == "array"
                    and s0 + 1 <= s1
                    and toks[s0 + 1][0] == "op" and toks[s0 + 1][1] == "(")
            )
            if opens_outer:
                # constructor-nesting depth: ARRAY[, array(, and bare
                # sub-array '[' (a '[' right after '[', ',' or '(' —
                # anywhere else '[' is a subscript) open a level; their
                # matching closer ends it.  Plain grouping parens are
                # tracked so closers pop the right thing.
                stack: list[bool] = []  # True = constructor level
                max_nest = 0
                j = s0
                while j <= s1:
                    k_, t_ = toks[j][0], toks[j][1]
                    if (
                        k_ in _NAME_KINDS and t_.upper() == "ARRAY"
                        and j + 1 <= s1
                        and toks[j + 1][0] == "op"
                        and toks[j + 1][1] in ("[", "(")
                    ):
                        stack.append(True)
                        max_nest = max(max_nest, sum(stack))
                        j += 2
                        continue
                    if k_ == "op" and t_ == "[":
                        is_ctor = j > s0 and (
                            toks[j - 1][0] == "op"
                            and toks[j - 1][1] in ("[", ",", "(")
                        )
                        stack.append(is_ctor)
                        if is_ctor:
                            max_nest = max(max_nest, sum(stack))
                    elif k_ == "op" and t_ == "(":
                        stack.append(False)
                    elif k_ == "op" and t_ in (")", "]") and stack:
                        stack.pop()
                    j += 1
                if max_nest >= 3:
                    raise TranspileError(
                        "postgres cardinality() on a 3-D+ array "
                        "constructor has no single-flatten Spark "
                        "rewrite; flatten() per level explicitly"
                    )
                if max_nest == 2:
                    edits.append(
                        (start, toks[close][3],
                         f"size(flatten({_arg_text(spans[0])}))")
                    )
                    return close + 1

    if name == "trim_array":
        # drop the last n elements; pg raises when n exceeds the
        # length or is negative (slice's clamp only shows on
        # pg-rejected inputs)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            a_, n_ = _arg_text(spans[0]), _arg_text(spans[1])
            edits.append(
                (start, toks[close][3],
                 f"slice(({a_}), 1, "
                 f"greatest(cardinality(({a_})) - ({n_}), 0))")
            )
            return close + 1

    if name == "regexp_match":
        # first-match capture array: [group1] when the pattern has one
        # capture group, [whole match] when none; NULL on no match.
        # Two or more groups are loud: Spark regexp_extract renders a
        # non-participating group as '' where pg yields a NULL element.
        spans, close = _call_arg_spans(toks, i + 1)
        if (
            len(spans) in (2, 3)
            and spans[1][0] == spans[1][1]
            and toks[spans[1][0]][0] == "string"
        ):
            pat = convert_regex_literal(convert_posix_classes(
                _literal_content(toks[spans[1][0]][1], read)
            ), read)
            if len(spans) == 3:
                if not (
                    spans[2][0] == spans[2][1]
                    and toks[spans[2][0]][0] == "string"
                    and _literal_content(toks[spans[2][0]][1], read) == "i"
                ):
                    raise TranspileError(
                        "postgres regexp_match flags other than 'i' "
                        "have no Spark rewrite"
                    )
                pat = "(?i)" + pat
            g = _count_capture_groups(pat)
            if g > 1:
                raise TranspileError(
                    "postgres regexp_match with 2+ capture groups has "
                    "no faithful Spark rewrite (non-participating "
                    "groups render '' instead of pg's NULL); extract "
                    "each group with substring(s from 'pat')"
                )
            if g == 1 and not _group_always_participates(pat):
                # same divergence with ONE group when it can sit out of
                # an overall match: pg regexp_match('abc','a(x)?') =
                # {NULL}, the emission would yield [''] (live-pinned)
                raise TranspileError(
                    "postgres regexp_match with an optional capture "
                    "group has no faithful Spark rewrite (a "
                    "non-participating group renders '' instead of "
                    "pg's NULL element); make the group mandatory or "
                    "extract with substring(s from 'pat')"
                )
            s_ = _arg_text(spans[0])
            lit = _spark_string_literal(pat, read)
            edits.append(
                (start, toks[close][3],
                 f"IF(({s_}) RLIKE {lit}, "
                 f"array(regexp_extract(({s_}), {lit}, {g})), NULL)")
            )
            return close + 1
        raise TranspileError(
            "postgres regexp_match needs a literal pattern to "
            "transpile"
        )

    if name == "make_interval":
        # pg keyword arguments (days => 2) — same positional order as
        # Spark's make_interval, so rewrite named calls to positional
        spans, close = _call_arg_spans(toks, i + 1)
        named = {}
        any_named = False
        for sp in spans:
            s0, s1 = sp
            if (
                s1 >= s0 + 2
                and toks[s0][0] in _NAME_KINDS
                and toks[s0 + 1][0] == "op"
                and toks[s0 + 1][1] == "="
                and toks[s0 + 2][0] == "op"
                and toks[s0 + 2][1] == ">"
            ):
                any_named = True
                key = toks[s0][1].lower()
                if key not in _MAKE_INTERVAL_ARGS:
                    raise TranspileError(
                        f"make_interval has no argument {key!r}"
                    )
                named[key] = sql[toks[s0 + 3][2]: toks[s1][3]]
            elif any_named:
                raise TranspileError(
                    "make_interval mixes positional and named "
                    "arguments — name them all"
                )
        if any_named:
            args = ", ".join(
                named.get(k, "0") for k in _MAKE_INTERVAL_ARGS
            )
            edits.append(
                (start, toks[close][3], f"make_interval({args})")
            )
            return close + 1

    return None
