"""MySQL read-dialect function map, operator fixes and call handlers.

Split out of core/transpile.py (round 6): the walker in
core/transpile.py dispatches into this module's handler functions; see
TokenCtx in core/transpile_shared.py for the contract. Handler bodies
are the pre-split code verbatim (continue -> return i), so every
file:line reference in docstrings and VERDICT history still applies.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.transpile_shared import (
    TranspileError,
    _NAME_KINDS,
    _require_spark4,
    _call_arg_spans,
)
from sqlmesh_spark.core.transpile_text import (
    _DIFF_UNITS,
    convert_mysql_format,
    _mysql_fmt_has_time,
    _spark_string_literal,
    _literal_content,
)

_MYSQL_FN: dict[str, str | None] = {
    "length": "octet_length",           # MySQL LENGTH() counts BYTES
    # MOD(a, 0) is NULL in MySQL (non-strict default); Spark-4 ANSI mod
    # raises. Sign semantics are C-style in both.
    "mod": "try_mod",
    "curdate": "current_date",
    "curtime": None,                    # TIME type has no Spark analog
    "now": "current_timestamp",
    "sysdate": "current_timestamp",     # per-call vs per-statement clock:
                                        # sub-statement skew accepted
    "localtime": "localtimestamp",
    "utc_timestamp": None,              # handler below (UTC wall-clock)
    "utc_date": None,
    "utc_time": None,
    "format": "format_number",          # both add thousands separators
    "field": None,                      # no Spark equivalent
    # find_in_set passes through (Spark's matches MySQL's 1-based index)
    "make_set": None,
    "export_set": None,
    # weekday passes through (0=Monday..6 in both MySQL and Spark)
    "week": None,                       # mode-dependent numbering → loud
    "yearweek": None,
    "to_days": None, "from_days": None,
    "time_to_sec": None, "sec_to_time": None,
    "timediff": None, "maketime": None, "makedate": None,
    # date_format is handled below (format conversion; same name in Spark,
    # so NOT mapped None here — the fixpoint's later passes must leave the
    # handler's own Spark-ready output untouched)
    "str_to_date": None,                # handler below
    "get_format": None,
    "group_concat": None,               # handler below (SEPARATOR syntax)
    "json_extract": None, "json_unquote": None, "json_object": None,
    "json_arrayagg": None, "json_objectagg": None,
    "convert_tz": None,
    "truncate": None,                   # numeric truncate → loud
    "least": None,                      # MySQL returns NULL on any NULL arg;
    "greatest": None,                   # Spark ignores NULLs → silent wrong
    "password": None, "encrypt": None, "aes_encrypt": None,
    "aes_decrypt": None, "compress": None, "uncompress": None,
    "uuid_short": None,
    "connection_id": None, "database": None, "schema": None, "user": None,
    "session_user": None, "system_user": None, "version": None,
    "benchmark": None, "sleep": None, "get_lock": None, "release_lock": None,
    # round 11: session-state louds + the oct radix rename
    "last_insert_id": None, "found_rows": None, "row_count": None,
    "is_free_lock": None, "is_used_lock": None, "master_pos_wait": None,
}

# Oracle renames (ref dialect.py:1040; the classic enterprise migration
# source). Huge identical-semantics overlap with Spark — these pass
# through: nvl, nvl2, decode (Spark's decode IS Oracle's NULL-safe
# comparison form, verified on 4.1), months_between (same 31-day-month
# formula), add_months, last_day, next_day, instr (2-arg), substr
# (negative-from-end), lpad/rpad, translate, initcap, greatest/least
# (Oracle propagates NULL... see map), ceil/floor/round/trunc-numeric
# handled loud, listagg (Spark>=4 gate), sign, power, mod, chr, ascii,
# soundex, concat (2-arg), coalesce, abs. TO_CHAR/TO_DATE/TO_TIMESTAMP
# route through the shared Postgres-pattern handler (Oracle is that
# pattern language's origin). Known documented divergence with no static
# rewrite: Oracle '' IS NULL — Spark treats '' as a value.


def token_handlers(ctx) -> "int | None":
    """Walker-level (non-call) token handlers (pre-split code, verbatim)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, first_pass, is_op, _arg_text, transpile, n)
    if read == "mysql":
        if (
            kind == "ident"
            and text.upper() in ("REGEXP", "RLIKE")
            and i + 1 < n
        ):
            # MySQL REGEXP/RLIKE is case-INSENSITIVE under the
            # default ci collations ('ABC' REGEXP 'abc' is 1); Spark
            # RLIKE is case-sensitive — silent wrong. Prefix (?i):
            # inline for a literal pattern, concatenated for a
            # dynamic one. (Binary-collation columns would be
            # case-sensitive in MySQL — statically invisible;
            # documented residual.) NOT REGEXP forms keep the NOT
            # (it precedes this token untouched).
            pt = toks[i + 1]
            if pt[0] == "string":
                content = _literal_content(pt[1], "mysql")
                if not content.startswith("(?i)") and not any(
                    e[1] >= start and e[0] <= pt[3] for e in edits
                ):
                    edits.append((start, end, "RLIKE"))
                    edits.append(
                        (pt[2], pt[3],
                         _spark_string_literal("(?i)" + content,
                                               "mysql"))
                    )
                    return i + 2
            else:
                from sqlmesh_spark.core.transpile_shared import (
                    _forward_primary,
                )
                rs = _forward_primary(toks, i + 1)
                if rs is not None and not any(
                    e[1] >= start and e[0] <= toks[rs[1]][3]
                    for e in edits
                ):
                    p_ = sql[toks[rs[0]][2]:toks[rs[1]][3]].strip()
                    if not p_.startswith("concat('(?i)'"):
                        # concat, not ||: the mysql ||→OR rewrite
                        # would re-consume the emission (mysql CONCAT
                        # NULL-propagates exactly like Spark's)
                        edits.append(
                            (start, toks[rs[1]][3],
                             f"RLIKE concat('(?i)', ({p_}))")
                        )
                        return rs[1] + 1
        if (
            kind == "ident"
            and text.upper() == "LIKE"
            and not (
                i + 1 < n
                and toks[i + 1][0] == "op"
                and toks[i + 1][1] == "("
            )  # like(...) function spelling stays on the call path
        ):
            # MySQL LIKE matches case-insensitively under the default
            # ci collations ('ABC' LIKE 'abc' is 1) — Spark ILIKE is
            # the faithful map (same rewrite rationale as REGEXP
            # above). The static CEILING of this posture: `=`
            # comparisons, DISTINCT, GROUP BY and ORDER BY are ALSO
            # collation-ci in MySQL and have no per-construct rewrite
            # (wrapping every operand in lower() would change output
            # values) — a documented residual, like the pg locale
            # case-folding note.
            # LIKE BINARY is the explicit case-SENSITIVE form — the
            # blanket ILIKE upgrade emitted invalid `ILIKE BINARY`
            # (and would invert the author's intent if it parsed;
            # ADVICE r11). Emit Spark's case-sensitive like() FUNCTION
            # spelling: an emitted infix LIKE would be re-upgraded to
            # ILIKE by this very branch on the next fixpoint pass.
            if (
                i + 1 < n
                and toks[i + 1][0] in _NAME_KINDS
                and toks[i + 1][1].upper() == "BINARY"
            ):
                from sqlmesh_spark.core.transpile_shared import (
                    _backward_primary,
                    _forward_primary,
                )

                neg = (
                    i >= 1
                    and toks[i - 1][0] in _NAME_KINDS
                    and toks[i - 1][1].upper() == "NOT"
                )
                lhs_end = i - 2 if neg else i - 1
                lf = (
                    _backward_primary(toks, lhs_end, include_unary=False)
                    if lhs_end >= 0 else None
                )
                rs = _forward_primary(toks, i + 2)
                if lf is None or rs is None:
                    raise TranspileError(
                        "mysql LIKE BINARY with an unrecognized "
                        "operand shape; spell the case-sensitive "
                        "match as like(expr, pattern)"
                    )
                # a trailing ESCAPE clause must ride along: the
                # function spelling cannot take infix ESCAPE, so
                # leaving it produced unparseable `like(..) ESCAPE '!'`
                # (ADVICE r12). Spark's like() has a 3-arg
                # (str, pattern, escape) form — pinned live: like('A%',
                # 'A!%', '!') is true, like('AX', 'A!%', '!') false.
                last = rs[1]
                esc_ = None
                if (
                    last + 1 < n
                    and toks[last + 1][0] in _NAME_KINDS
                    and toks[last + 1][1].upper() == "ESCAPE"
                ):
                    if not (
                        last + 2 < n and toks[last + 2][0] == "string"
                    ):
                        raise TranspileError(
                            "mysql LIKE BINARY .. ESCAPE with a "
                            "non-literal escape cannot ride Spark's "
                            "like(str, pattern, escape) form; inline "
                            "the escape character"
                        )
                    esc_ = sql[toks[last + 2][2]:toks[last + 2][3]]
                    last = last + 2
                if any(
                    e[1] >= toks[lf][2] and e[0] <= toks[last][3]
                    for e in edits
                ):
                    return i + 1  # pending edits inside — next pass
                a_ = sql[toks[lf][2]:toks[lhs_end][3]].strip()
                p_ = sql[toks[rs[0]][2]:toks[rs[1]][3]].strip()
                fn = (
                    f"like(({a_}), ({p_}), {esc_})" if esc_ is not None
                    else f"like(({a_}), ({p_}))"
                )
                edits.append(
                    (toks[lf][2], toks[last][3],
                     f"(NOT {fn})" if neg else fn)
                )
                return last + 1
            edits.append((start, end, "ILIKE"))
            return i + 1
        # MySQL `||` is logical OR (PIPES_AS_CONCAT off, the default);
        # Spark reads it as string concat — silent wrong values.
        if kind == "op" and text == "||":
            edits.append((start, end, " OR "))
            i += 1
            return i
        # JSON -> / ->> operators are handled by the shared arrow
        # branch in core/transpile.py (->> maps exactly to
        # get_json_object; -> only mid-chain).
        # XOR is a reserved MySQL boolean operator Spark lacks.
        if kind == "ident" and text.upper() == "XOR":
            raise TranspileError(
                "mysql XOR operator has no Spark equivalent; rewrite "
                "as (a OR b) AND NOT (a AND b)"
            )
        # LIMIT offset, count → LIMIT count OFFSET offset. LIMIT is
        # reserved in MySQL, so a bare ident here is the clause (a
        # column of that name would be backtick-quoted).
        if (
            kind == "ident"
            and text.upper() == "LIMIT"
            and i + 3 < n
            and toks[i + 1][0] == "number"
            and is_op(i + 2, ",")
            and toks[i + 3][0] == "number"
        ):
            off_txt = toks[i + 1][1]
            cnt_txt = toks[i + 3][1]
            edits.append(
                (toks[i + 1][2], toks[i + 3][3],
                 f"{cnt_txt} OFFSET {off_txt}")
            )
            i += 4
            return i

    # BigQuery raw/bytes string prefixes: r'...' keeps backslashes
    # literal (ubiquitous for regex patterns) — re-emit as a Spark
    # literal with the backslashes escaped; b'...'/rb'...' BYTES
    # literals have no Spark string form — LOUD. The prefix lexes as
    # a separate ident, so adjacency (no whitespace) is the signature.
    return None


def call_handlers(ctx) -> "int | None":
    """MySQL read-dialect function map, operator fixes and call handlers (pre-split code, verbatim)."""
    toks, edits = ctx.toks, ctx.edits
    sql, read, first_pass = ctx.sql, ctx.read, ctx.first_pass
    i, name = ctx.i, ctx.name
    kind, text, start, end = ctx.kind, ctx.text, ctx.start, ctx.end
    is_op, _arg_text, transpile = ctx.is_op, ctx.arg_text, ctx.transpile
    n = len(toks)
    _unused = (sql, name, kind, text, first_pass, is_op, _arg_text, transpile, n)
    if name == "insert" and first_pass:
        # MySQL INSERT(s, pos, len, repl) — 1-based splice like Spark's
        # overlay, but with MySQL's edges (round 11; was an unresolved
        # passthrough): pos out of range returns the ORIGINAL string
        # (not NULL — unlike T-SQL STUFF), and a negative len replaces
        # through the end of the string.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 4:
            raise TranspileError(
                "mysql INSERT() expects (str, pos, len, newstr)"
            )
        s_, p_, l_, r_ = (_arg_text(sp) for sp in spans)
        # char_length, NOT length: the MySQL length → octet_length
        # rename would turn a length() here into BYTE counting on the
        # next pass, but INSERT positions are CHARACTER-based
        repl = (
            f"IF(({p_}) < 1 OR ({p_}) > char_length(({s_})), ({s_}), "
            f"overlay(({s_}), ({r_}), ({p_}), "
            f"IF(({l_}) < 0, char_length(({s_})), ({l_}))))"
        )
        edits.append((start, toks[close][3], repl))
        return close + 1

    if name == "field":
        # FIELD(x, a, b, ...) — 1-based index of x in the list, 0 when
        # absent or x IS NULL (round 11; was loud).  array_position
        # returns 0 on not-found and NULL on a NULL needle — coalesce
        # covers the NULL case.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) >= 2:
            x_ = _arg_text(spans[0])
            rest = ", ".join(f"({_arg_text(sp)})" for sp in spans[1:])
            edits.append(
                (start, toks[close][3],
                 f"coalesce(array_position(array({rest}), ({x_})), 0)")
            )
            return close + 1

    if name == "char" and first_pass:
        # multi-arg CHAR(65, 66) concatenates one character per code
        # (NULL arguments are SKIPPED — the coalesce arms); Spark's
        # char is 1-arg.  Code points ≤ 255 only in MySQL's default
        # charset reading — multi-byte packing (value > 255 packs
        # BYTES) has no Spark form and is the documented ceiling.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) >= 2:
            parts = ", ".join(
                f"coalesce(char(({_arg_text(sp)})), '')" for sp in spans
            )
            edits.append(
                (start, toks[close][3], f"concat({parts})")
            )
            return close + 1

    if name == "oct":
        # OCT(n) = CONV(n, 10, 8) (round 11; Spark has no oct)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            edits.append(
                (start, toks[close][3],
                 f"conv(({_arg_text(spans[0])}), 10, 8)")
            )
            return close + 1

    if name == "truncate" and first_pass:
        # TRUNCATE(x, d) — toward-zero truncation to d decimal places
        # (negative d truncates left of the point; power(10, d)
        # handles both).  DOUBLE result — MySQL keeps the input's
        # numeric type, the documented dtype ceiling.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            x_, d_ = _arg_text(spans[0]), _arg_text(spans[1])
            p_ = f"power(10, ({d_}))"
            edits.append(
                (start, toks[close][3],
                 f"(CASE WHEN ({x_}) < 0 THEN ceil(({x_}) * {p_}) "
                 f"ELSE floor(({x_}) * {p_}) END / {p_})")
            )
            return close + 1

    if name == "quote" and first_pass:
        # QUOTE(NULL) renders the four-character string 'NULL' in
        # MySQL where Spark's same-named quote() returns SQL NULL; the
        # escaping rules (backslash, quote doubling) otherwise agree.
        # The inner identity-IF marks the emission so re-reads skip
        # (the transpile-handler identity-IF convention).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1 and not (
            toks[spans[0][0]][0] in _NAME_KINDS
            and toks[spans[0][0]][1].upper() == "IF"
        ):
            x_ = _arg_text(spans[0])
            edits.append(
                (start, toks[close][3],
                 f"IF(({x_}) IS NULL, 'NULL', "
                 f"quote(IF(({x_}) IS NULL, NULL, ({x_}))))")
            )
            return close + 1

    if name == "json_unquote" and first_pass:
        # JSON_UNQUOTE(JSON_EXTRACT(doc, '$.path')) is MySQL's ->>
        # — exactly get_json_object's TEXT mode (unquoted scalars).
        # Lone json_extract stays loud (returns JSON with quoted
        # strings); non-literal paths too.
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            s0, s1 = spans[0]
            if (
                toks[s0][0] in _NAME_KINDS
                and toks[s0][1].lower() == "json_extract"
                and toks[s0 + 1][0] == "op" and toks[s0 + 1][1] == "("
            ):
                isp, iclose = _call_arg_spans(toks, s0 + 1)
                if (
                    iclose == s1
                    and len(isp) == 2
                    and isp[1][0] == isp[1][1]
                    and toks[isp[1][0]][0] == "string"
                ):
                    doc_ = _arg_text(isp[0])
                    path_ = toks[isp[1][0]][1]
                    edits.append(
                        (start, toks[close][3],
                         f"get_json_object(({doc_}), {path_})")
                    )
                    return close + 1
            raise TranspileError(
                "mysql json_unquote transpiles only over "
                "json_extract(doc, '<literal path>') — together they "
                "are get_json_object; other shapes have no text-mode "
                "equivalent"
            )

    if name == "convert" and first_pass:
        # CONVERT(expr USING charset) — a UTF-8 target is an identity
        # in Spark (all strings are UTF-8); other charsets have no
        # Spark conversion.  (CONVERT(expr, type) is handled by the
        # shared cast machinery.)
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) == 1:
            s0, s1 = spans[0]
            using_at = None
            depth = 0
            for j in range(s0, s1 + 1):
                tk, tt = toks[j][0], toks[j][1]
                if tk == "op" and tt in ("(", "["):
                    depth += 1
                elif tk == "op" and tt in (")", "]"):
                    depth -= 1
                elif (depth == 0 and tk in _NAME_KINDS
                        and tt.upper() == "USING"):
                    using_at = j
                    break
            if using_at is not None:
                cs = "".join(
                    toks[j][1] for j in range(using_at + 1, s1 + 1)
                ).lower()
                expr_ = _arg_text((s0, using_at - 1))
                if cs in ("utf8", "utf8mb4", "utf8mb3"):
                    edits.append(
                        (start, toks[close][3], f"({expr_})")
                    )
                    return close + 1
                raise TranspileError(
                    f"mysql CONVERT(... USING {cs}) has no Spark "
                    "charset conversion (Spark strings are UTF-8)"
                )

    if name == "utc_timestamp":
        spans, close = _call_arg_spans(toks, i + 1)
        if spans:
            raise TranspileError("utc_timestamp takes no arguments")
        edits.append(
            (start, toks[close][3],
             "to_utc_timestamp(current_timestamp(), current_timezone())")
        )
        i = close + 1
        return i

    if name == "date_format" and first_pass:
        # Same name + arg order as Spark, but MySQL %-codes.
        spans, _close = _call_arg_spans(toks, i + 1)
        if len(spans) != 2 or toks[spans[1][0]][0] != "string" \
                or spans[1][0] != spans[1][1]:
            raise TranspileError(
                "mysql date_format needs a literal format to "
                "transpile"
            )
        fmt_tok = toks[spans[1][0]]
        raw_fmt = _literal_content(fmt_tok[1], read)
        if "%" not in raw_fmt:
            # No %-codes: either our OWN already-converted Java
            # pattern re-read on a later logical pass (must
            # stay untouched for idempotence) or a pure-literal
            # MySQL format. Letters are ambiguous between the
            # two readings — loud; letterless formats mean the
            # same in both.
            if re.search(r"[A-Za-z]", raw_fmt):
                raise TranspileError(
                    f"date_format pattern {raw_fmt!r} has no "
                    "%-codes; cannot tell a literal MySQL "
                    "format from an already-Spark pattern"
                )
            i += 1
            return i
        converted = convert_mysql_format(raw_fmt)
        edits.append((start, end, "date_format"))
        edits.append(
            (fmt_tok[2], fmt_tok[3],
             _spark_string_literal(converted, read))
        )
        i += 1
        return i

    if name == "str_to_date" and first_pass:
        # → to_timestamp when the format has time codes, else
        # to_date (MySQL returns DATETIME vs DATE on the same
        # rule).
        spans, _close = _call_arg_spans(toks, i + 1)
        if len(spans) != 2 or toks[spans[1][0]][0] != "string" \
                or spans[1][0] != spans[1][1]:
            raise TranspileError(
                "str_to_date needs a literal format to transpile"
            )
        fmt_tok = toks[spans[1][0]]
        raw_fmt = _literal_content(fmt_tok[1], read)
        converted = convert_mysql_format(raw_fmt)
        target = (
            "to_timestamp" if _mysql_fmt_has_time(raw_fmt)
            else "to_date"
        )
        edits.append((start, end, target))
        edits.append(
            (fmt_tok[2], fmt_tok[3],
             _spark_string_literal(converted, read))
        )
        i += 1
        return i

    if name == "from_unixtime" and first_pass:
        # 1-arg matches Spark; 2-arg format is MySQL %-codes
        # (Spark's is a Java pattern). Same shared-name
        # ambiguity rule as date_format: a no-% format with
        # letters cannot be told apart from our own emitted
        # Java pattern — loud; letterless means the same.
        spans, _close = _call_arg_spans(toks, i + 1)
        if len(spans) == 2:
            fmt_tok = toks[spans[1][0]]
            if toks[spans[1][0]][0] != "string" \
                    or spans[1][0] != spans[1][1]:
                raise TranspileError(
                    "from_unixtime format must be a literal to "
                    "transpile"
                )
            raw_fmt = _literal_content(fmt_tok[1], read)
            if "%" not in raw_fmt:
                if re.search(r"[A-Za-z]", raw_fmt):
                    raise TranspileError(
                        f"from_unixtime pattern {raw_fmt!r} has "
                        "no %-codes; cannot tell a literal MySQL "
                        "format from an already-Spark pattern"
                    )
                i += 1
                return i
            converted = convert_mysql_format(raw_fmt)
            edits.append((start, end, "from_unixtime"))
            edits.append(
                (fmt_tok[2], fmt_tok[3],
                 _spark_string_literal(converted, read))
            )
        i += 1
        return i

    if name == "group_concat" and first_pass:
        # GROUP_CONCAT([DISTINCT] expr [SEPARATOR 'sep']) →
        # listagg([DISTINCT] expr, sep), default separator ','.
        # ORDER BY inside the call has no pre-4.0 rewrite and
        # WITHIN GROUP placement differs — LOUD.
        _require_spark4(name, "listagg")
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 1:
            raise TranspileError(
                "group_concat with multiple exprs has no "
                "direct Spark rewrite (concatenate explicitly)"
            )
        s_first, s_last = spans[0]
        sep_lit = "','"
        arg_end = toks[s_last][3]
        # scan the single arg span for ORDER BY / SEPARATOR
        # at bracket depth 0
        depth_ = 0
        sep_at = None
        for j in range(s_first, s_last + 1):
            k_, t_, _, _ = toks[j]
            if k_ == "op" and t_ in ("(", "["):
                depth_ += 1
            elif k_ == "op" and t_ in (")", "]"):
                depth_ -= 1
            elif depth_ == 0 and k_ == "ident":
                up = t_.upper()
                if up == "ORDER":
                    raise TranspileError(
                        "group_concat ORDER BY has no Spark "
                        "rewrite (listagg WITHIN GROUP differs "
                        "in placement); order in an outer query"
                    )
                if up == "SEPARATOR":
                    sep_at = j
        if sep_at is not None:
            if sep_at == s_first:
                raise TranspileError(
                    "group_concat needs an expression before "
                    "SEPARATOR"
                )
            if (
                sep_at + 1 > s_last
                or toks[sep_at + 1][0] != "string"
                or sep_at + 1 != s_last
            ):
                raise TranspileError(
                    "group_concat SEPARATOR must be a trailing "
                    "string literal"
                )
            sep_lit = _spark_string_literal(
                _literal_content(toks[sep_at + 1][1], read), read
            )
            # expr ends just before SEPARATOR
            arg_end = toks[sep_at - 1][3]
            # drop "SEPARATOR 'sep'"
            edits.append((arg_end, toks[s_last][3], ""))
        edits.append((start, end, "listagg"))
        edits.append((arg_end, arg_end, f", {sep_lit}"))
        i += 1
        return i

    if name in ("date_add", "date_sub", "adddate", "subdate") \
            and first_pass:
        # INTERVAL form → timestampadd(UNIT, [-]expr, date) —
        # Spark INTERVAL literals need constant quantities, but
        # MySQL allows expressions, so timestampadd is the
        # general rewrite (type caveat as dateadd: result is
        # TIMESTAMP). adddate(d, n) day-shorthand matches
        # Spark's own date_add(d, n).
        spans, close = _call_arg_spans(toks, i + 1)
        if len(spans) != 2:
            raise TranspileError(f"{name} takes 2 args")
        s2_first, s2_last = spans[1]
        neg = name in ("date_sub", "subdate")
        if (
            toks[s2_first][0] == "ident"
            and toks[s2_first][1].upper() == "INTERVAL"
        ):
            if s2_last < s2_first + 2:
                raise TranspileError(
                    f"{name} INTERVAL needs a quantity and unit"
                )
            u_tok = toks[s2_last]
            if u_tok[0] != "ident":
                raise TranspileError(
                    f"{name} INTERVAL unit must be a keyword"
                )
            unit = _DIFF_UNITS.get(u_tok[1].lower())
            if unit is None and u_tok[1].lower() == "microsecond":
                unit = "MICROSECOND"
            if unit is None:
                raise TranspileError(
                    f"{name} unit {u_tok[1]!r} has no Spark "
                    "timestampadd equivalent (composite units "
                    "like SECOND_MICROSECOND are unsupported)"
                )
            qty = transpile(
                sql[toks[s2_first + 1][2] : toks[s2_last - 1][3]],
                read,
            )
            date_text = _arg_text(spans[0])
            qty_text = f"-({qty})" if neg else qty
            edits.append(
                (start, toks[close][3],
                 f"timestampadd({unit}, {qty_text}, {date_text})")
            )
            i = close + 1
            return i
        if name in ("adddate", "subdate"):
            # integer-days shorthand
            if neg:
                d_text = _arg_text(spans[0])
                n_text = _arg_text(spans[1])
                edits.append(
                    (start, toks[close][3],
                     f"date_sub({d_text}, {n_text})")
                )
                i = close + 1
            else:
                edits.append((start, end, "date_add"))
                i += 1
            return i
        raise TranspileError(
            f"mysql {name} needs an INTERVAL second argument"
        )

    return None
