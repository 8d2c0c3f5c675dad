"""Shared transpile infrastructure: error type, dialect constants, type maps, Spark-version gates, tokenizer span helpers, and expression-primary parsers.

Split out of core/transpile.py (round 6): the walker in
core/transpile.py dispatches into this module's handler functions; see
TokenCtx in core/transpile_shared.py for the contract. Handler bodies
are the pre-split code verbatim (continue -> return i), so every
file:line reference in docstrings and VERDICT history still applies.
"""

from __future__ import annotations

import re

from sqlmesh_spark.core.sqlparse import DIALECT_ALIASES  # noqa: F401
from sqlmesh_spark.core.sqlparse import _EXPR_KEYWORDS, _TOKEN_RE  # noqa: F401
from sqlmesh_spark.core.sqlparse import ESCAPE_LITERAL_DIALECTS, _token_re_for  # noqa: F401

class TranspileError(ValueError):
    pass


SPARK = "spark"

#: read dialects accepted by ``transpile``; "" / None / "spark" are no-ops.
READ_DIALECTS = (
    "duckdb", "postgres", "ansi", "snowflake", "bigquery", "redshift",
    "mysql", "oracle", "tsql", "trino", "clickhouse",
)

#: alias dialects (presto/athena → trino, mssql/fabric/azuresql → tsql,
#: risingwave/gcp_postgres → postgres, motherduck → duckdb, databricks →
#: spark no-op) live in core/sqlparse.py — the LEXING seam — so that
#: depends_on / lineage / fingerprints / the formatter select the right
#: grammar too, not just this module's tables. Re-exported here for the
#: public transpile API.
from sqlmesh_spark.core.sqlparse import DIALECT_ALIASES  # noqa: E402

#: dialects whose string literals are standard SQL (backslash is an
#: ordinary character) and need backslash-doubling for Spark's C-style
#: escape parser. Snowflake/BigQuery/Redshift/MySQL literals already treat
#: backslash as an escape character, matching Spark — no doubling
#: (Redshift's standard_conforming_strings defaults to off, inherited
#: from its PostgreSQL 8.0 base; models written against a cluster with it
#: flipped on should declare dialect postgres instead). Oracle, T-SQL and
#: Trino literals are standard '' doubling.
_STD_LITERAL_DIALECTS = ("duckdb", "postgres", "ansi", "oracle", "tsql", "trino")

# ---------------------------------------------------------------------------
# Function maps: read-dialect function name → Spark function name, applied
# only in call position (identifier immediately followed by '(') so column
# names are never rewritten. Arg order/shape must match in both engines —
# anything needing restructuring gets a special handler instead.
# ---------------------------------------------------------------------------


#: ANSI two-word type spellings (pg family + duckdb accept them in both
#: `::` and CAST AS position): rewritten to the canonical single-word
#: name; a trailing (n) list is left in place for the regular param
#: machinery on the next fixpoint pass (so `character varying(2)`
#: follows exactly the user-written varchar(2) path). None is LOUD.
_TWO_WORD_TYPES: dict[tuple[str, str], str | None] = {
    ("double", "precision"): "DOUBLE",
    ("character", "varying"): "VARCHAR",
    ("bit", "varying"): None,           # pg bit strings → no Spark analog
}


# date_diff units both timestampdiff and date_trunc accept (DuckDB also

_SPARK4_TARGETS = frozenset({"listagg", "try_to_date"})


def _spark_version() -> tuple[int, int]:
    """(major, minor) of the active session if any, else the pyspark lib."""
    v = None
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            v = s.version
    except Exception:  # pragma: no cover - session probing is best-effort
        v = None
    if v is None:
        import pyspark

        v = pyspark.__version__
    parts = v.split(".")
    return int(parts[0]), int(parts[1])


def _require_spark4(fn_name: str, target: str) -> None:
    if target in _SPARK4_TARGETS and _spark_version() < (4, 0):
        major, minor = _spark_version()
        raise TranspileError(
            f"{fn_name}() transpiles to {target}(), which requires Spark >= "
            f"4.0 (session is {major}.{minor}); rewrite as "
            "concat_ws(delim, collect_list(expr)) or upgrade Spark"
        )


# ---------------------------------------------------------------------------
# Tokenization with source spans
# ---------------------------------------------------------------------------


# Escape-aware token grammar for Snowflake/BigQuery: their string
# literals use backslash escapes ('O\'Brien'), which the standard-SQL
# grammar would mis-lex (literal ends at the escaped quote). BigQuery
# additionally uses double quotes for STRINGS, not identifiers. The
# grammar itself lives in core/sqlparse.py so depends_on / lineage /
# linter lexing of the same dialect text shares one derivation.


def _tokenize_spans(sql: str, read: str = "") -> list[tuple[str, str, int, int]]:
    """(kind, text, start, end) per token, comments/ws skipped but their
    bytes preserved by span-based editing. For escape-literal dialects the
    grammar understands backslash-escaped quotes; BigQuery double-quoted
    tokens are re-kinded as strings (Spark's default parser also treats
    them as string literals, so they pass through valid)."""
    token_re = _token_re_for(read)
    out: list[tuple[str, str, int, int]] = []
    pos = 0
    n = len(sql)
    while pos < n:
        m = token_re.match(sql, pos)
        if not m:
            raise TranspileError(f"unexpected character {sql[pos]!r} at offset {pos}")
        kind = m.lastgroup or ""
        if kind == "dquote" and read in ("bigquery", "mysql"):
            kind = "string"
        if kind not in ("ws", "line_comment", "block_comment"):
            out.append((kind, m.group(), m.start(), m.end()))
        pos = m.end()
    return out


def _emit_infix_call(
    edits: list, toks: list, start: int, close: int, spans: list,
    op_: str, arg_text, fname: str,
) -> None:
    """Replace ``fname(a, b)`` with ``((a) op (b))`` — the ONE 2-arg
    function→infix-operator emitter (snowflake bitand family, clickhouse
    plus/minus/multiply/divide/intDiv, trino bitwise_*)."""
    if len(spans) != 2:
        raise TranspileError(f"{fname} takes 2 args")
    a = arg_text(spans[0])
    b = arg_text(spans[1])
    edits.append((start, toks[close][3], f"(({a}) {op_} ({b}))"))


def _emit_iso_dow(edits: list, start: int, end: int, close_end: int) -> None:
    """Emit ``(weekday(x) + 1)`` — the ISO Monday=1 day-of-week rewrite
    shared by trino day_of_week/dow and clickhouse toDayOfWeek."""
    edits.append((start, end, "(weekday"))
    edits.append((close_end, close_end, " + 1)"))



_NAME_KINDS = ("ident", "qident", "bquote", "dquote", "brident")


def _ident_text(tok_kind: str, tok_text: str) -> str:
    """Identifier token text normalized for Spark: double-quoted and
    T-SQL bracket-quoted names become backtick-quoted (Spark reads "x"
    as a string literal and [x] as a subscript)."""
    if tok_kind == "dquote":
        inner = tok_text[1:-1].replace('""', '"')
        return "`" + inner.replace("`", "``") + "`"
    if tok_kind == "brident":
        inner = tok_text[1:-1].replace("]]", "]")
        return "`" + inner.replace("`", "``") + "`"
    return tok_text


def _match_bracket(toks: list, open_idx: int) -> int:
    """Index of the ']' matching the '[' at open_idx."""
    depth = 0
    for j in range(open_idx, len(toks)):
        kind, text, _, _ = toks[j]
        if kind == "op" and text == "[":
            depth += 1
        elif kind == "op" and text == "]":
            depth -= 1
            if depth == 0:
                return j
    raise TranspileError("unbalanced [ ] brackets")


def _backtrack_primary(toks: list, close_idx: int):
    """For a postfix subscript after ')' — `f(x)[1]`, `(a)[1]` — return the
    token index where the subscripted primary starts, or None to defer the
    rewrite to the next fixpoint pass (chained `][`)."""
    kind, text, _, _ = toks[close_idx]
    if text == "]":
        return None  # resolves next pass, after the inner subscript rewrites
    depth = 0
    for j in range(close_idx, -1, -1):
        k, t, _, _ = toks[j]
        if k == "op" and t == ")":
            depth += 1
        elif k == "op" and t == "(":
            depth -= 1
            if depth == 0:
                if (
                    j > 0
                    and toks[j - 1][0] in _NAME_KINDS
                    and toks[j - 1][1].upper() not in _NONCALLABLE_KEYWORDS
                ):
                    # function call: include the (possibly dotted) name
                    i = j - 1
                    while (
                        i >= 2
                        and toks[i - 1][0] == "op" and toks[i - 1][1] == "."
                        and toks[i - 2][0] in _NAME_KINDS
                    ):
                        i -= 2
                    return i
                return j
    return None


#: literal keywords that form a primary expression on their own
_PRIMARY_KEYWORDS = ("NULL", "TRUE", "FALSE")

#: clause-head keywords that may precede a parenthesized EXPRESSION but
#: are never call names. Everything else keyword-shaped before `(` is
#: treated as a call head: CAST/TRY_CAST/ARRAY/MAP/STRUCT obviously, but
#: also FILTER/RANGE/FIRST/LAST — real functions despite being keywords
#: in other positions (`filter(ids, x -> x > 2)[1]` must include the
#: name, or the rewrite splices between name and parens).
_NONCALLABLE_KEYWORDS = frozenset({
    "SELECT", "WHERE", "FROM", "ON", "HAVING", "AND", "OR", "NOT",
    "WHEN", "THEN", "ELSE", "CASE", "END", "IN", "LIKE", "ILIKE",
    "RLIKE", "BETWEEN", "IS", "AS", "BY", "DISTINCT", "ALL", "USING",
    "LIMIT", "OFFSET", "ESCAPE", "ORDER", "GROUP", "DIV", "INTERVAL",
    "OVER", "PARTITION", "UNION", "INTERSECT", "EXCEPT", "EXISTS",
})




def _forward_primary(toks: list, idx: int):
    """(first, last) token-index span of the primary expression starting
    at idx — optional unary +/-/~ chain, then a literal, (possibly
    dotted) identifier with optional call parens, parenthesized
    expression, or CASE..END — plus trailing `[..]` subscript and
    `::type` cast postfixes. Returns None when the shape isn't
    recognized; callers leave the SQL untouched (loud downstream rather
    than a mis-scoped rewrite)."""
    n = len(toks)
    j = idx
    while j < n and toks[j][0] == "op" and toks[j][1] in ("+", "-", "~"):
        j += 1
    if j >= n:
        return None
    kind, text = toks[j][0], toks[j][1]
    if kind == "op" and text == "(":
        last = _call_arg_spans(toks, j)[1]
    elif kind in ("number", "string"):
        last = j
    elif kind in _NAME_KINDS:
        up = text.upper()
        if up == "CASE":
            depth = 1
            last = None
            for k in range(j + 1, n):
                tu = toks[k][1].upper() if toks[k][0] in _NAME_KINDS else ""
                if tu == "CASE":
                    depth += 1
                elif tu == "END":
                    depth -= 1
                    if depth == 0:
                        last = k
                        break
            if last is None:
                return None
        elif up in _NONCALLABLE_KEYWORDS:
            return None
        else:
            last = j
            while (
                last + 2 < n
                and toks[last + 1][0] == "op" and toks[last + 1][1] == "."
                and toks[last + 2][0] in _NAME_KINDS
            ):
                last += 2
            if (
                last + 1 < n
                and toks[last + 1][0] == "op" and toks[last + 1][1] == "("
            ):
                last = _call_arg_spans(toks, last + 1)[1]
    else:
        return None
    # postfixes: subscripts and :: casts (both bind tighter than any
    # infix operator)
    while last + 1 < n and toks[last + 1][0] == "op":
        t1 = toks[last + 1][1]
        if t1 == "[":
            last = _match_bracket(toks, last + 1)
        elif t1 == "::" and last + 2 < n and toks[last + 2][0] in _NAME_KINDS:
            last += 2
            if (
                last + 1 < n
                and toks[last + 1][0] == "op" and toks[last + 1][1] == "("
            ):
                last = _call_arg_spans(toks, last + 1)[1]
        else:
            break
    return (idx, last)


def _backward_primary(toks: list, idx: int, include_unary: bool):
    """First token index of the primary expression ENDING at idx —
    mirror of _forward_primary for infix left operands (the `a` of
    `a ^ b`). include_unary pulls a leading unary +/- into the primary
    (DuckDB binds unary minus tighter than ^; Postgres does not).
    `::type` postfixes are part of the primary (they bind tighter than
    any infix operator, mirroring _forward_primary) — the primary of
    `j::jsonb ->> 'a'` is `j::jsonb`, never the bare type name.
    Returns None when unrecognized or when the primary ends in `]`
    (defer to the next fixpoint pass, after subscripts rewrite)."""
    # step back over trailing bare `::type` postfixes so the walk
    # starts at the CAST's operand, not its type name; two-word ANSI
    # spellings (`::double precision`) step over BOTH words — anchoring
    # on the trailing ident alone wrapped bare `precision` in round()
    while True:
        if (
            idx >= 3
            and toks[idx][0] in _NAME_KINDS
            and toks[idx - 1][0] in _NAME_KINDS
            and toks[idx - 2][0] == "op"
            and toks[idx - 2][1] == "::"
            and (toks[idx - 1][1].lower(), toks[idx][1].lower())
            in _TWO_WORD_TYPES
        ):
            idx -= 3
        elif (
            idx >= 2
            and toks[idx][0] in _NAME_KINDS
            and toks[idx - 1][0] == "op"
            and toks[idx - 1][1] == "::"
        ):
            idx -= 2
        else:
            break
    kind, text = toks[idx][0], toks[idx][1]
    if kind == "op" and text in ("]", "::"):
        return None  # subscript/cast tail — resolves next pass
    if kind == "op" and text == ")":
        first = _backtrack_primary(toks, idx)
    elif kind in ("number", "string"):
        first = idx
    elif kind in _NAME_KINDS:
        up = text.upper()
        if up == "END":
            depth = 1
            first = None
            for k in range(idx - 1, -1, -1):
                tu = toks[k][1].upper() if toks[k][0] in _NAME_KINDS else ""
                if tu == "END":
                    depth += 1
                elif tu == "CASE":
                    depth -= 1
                    if depth == 0:
                        first = k
                        break
            if first is None:
                return None
        elif up in _EXPR_KEYWORDS and up not in _PRIMARY_KEYWORDS:
            return None
        else:
            first = idx
            while (
                first >= 2
                and toks[first - 1][0] == "op" and toks[first - 1][1] == "."
                and toks[first - 2][0] in _NAME_KINDS
            ):
                first -= 2
    else:
        return None
    if first is None:
        return None
    # a parameterized `::type(args)` postfix backtracks to the type
    # name (numeric(10,2) looks like a call) — extend to the operand;
    # two-word parameterized spellings (`::character varying(10)`)
    # backtrack to the SECOND word, so step over both
    while first >= 2:
        if toks[first - 1][0] == "op" and toks[first - 1][1] == "::":
            sub = _backward_primary(toks, first - 2, include_unary=False)
        elif (
            first >= 3
            and toks[first - 1][0] in _NAME_KINDS
            and toks[first - 2][0] == "op"
            and toks[first - 2][1] == "::"
            and (toks[first - 1][1].lower(), toks[first][1].lower())
            in _TWO_WORD_TYPES
        ):
            sub = _backward_primary(toks, first - 3, include_unary=False)
        else:
            break
        if sub is None:
            return None
        first = sub
    if include_unary:
        # walk back one sign at a time: a sign is unary only if what
        # precedes IT cannot end an expression. `2 - -2 ^ 2` includes
        # exactly the inner minus (DuckDB AND PostgreSQL: 2 - ((-2)^2)
        # = -2, both bind unary minus tighter than ^); the outer minus
        # is the binary operator and stays outside.
        while (
            first > 0
            and toks[first - 1][0] == "op"
            and toks[first - 1][1] in ("+", "-", "~")
        ):
            p = toks[first - 2] if first >= 2 else None
            if p is None or (
                (p[0] == "op" and p[1] not in (")", "]"))
                or (p[0] in _NAME_KINDS and p[1].upper() in _EXPR_KEYWORDS
                    and p[1].upper() not in _PRIMARY_KEYWORDS)
            ):
                first -= 1
            else:
                break
    return first


def _call_args(toks: list, open_idx: int) -> list[int]:
    """Indices of top-level argument-start tokens for the call whose '('
    is at open_idx; also returns close paren index via sentinel last item."""
    spans, close = _call_arg_spans(toks, open_idx)
    return [s for s, _ in spans] + [close]


def _call_arg_spans(toks: list, open_idx: int):
    """(first_token, last_token) index pair per top-level argument of the
    call whose '(' is at open_idx, plus the close-paren index."""
    spans: list[tuple[int, int]] = []
    depth = 0
    bdepth = 0  # bracket nesting — commas inside [1, 2] are not arg splits
    first = None
    last = None
    i = open_idx
    while i < len(toks):
        kind, text, _, _ = toks[i]
        if kind == "op" and text == "(":
            depth += 1
            if depth == 1:
                i += 1
                continue
        elif kind == "op" and text == ")":
            depth -= 1
            if depth == 0:
                if first is not None:
                    spans.append((first, last))
                return spans, i
        elif kind == "op" and text == "[":
            bdepth += 1
        elif kind == "op" and text == "]":
            bdepth -= 1
        elif depth == 1 and bdepth == 0 and kind == "op" and text == ",":
            spans.append((first, last))
            first = None
            i += 1
            continue
        if depth >= 1:
            if first is None:
                first = i
            last = i
        i += 1
    raise TranspileError("unbalanced parens in function call")


def _cast_as_indices(toks: list) -> set[int]:
    """Token indices of the TYPE-introducing ``AS`` of each
    CAST(...)/TRY_CAST(...) — the LAST depth-1 AS before the close paren.
    Only these positions may have their following type name renamed: an
    output alias named `text`, even inside a subquery nested in a CAST
    body, must never be rewritten."""
    out: set[int] = set()
    for i, (kind, text, _, _) in enumerate(toks):
        if (
            kind == "ident"
            and text.lower() in ("cast", "try_cast", "safe_cast")
            and i + 1 < len(toks)
            and toks[i + 1][0] == "op"
            and toks[i + 1][1] == "("
        ):
            depth = 0
            last_as = None
            for j in range(i + 1, len(toks)):
                k, t_, _, _ = toks[j]
                if k == "op" and t_ == "(":
                    depth += 1
                elif k == "op" and t_ == ")":
                    depth -= 1
                    if depth == 0:
                        if last_as is not None:
                            out.add(last_as)
                        break
                elif depth == 1 and k == "ident" and t_.upper() == "AS":
                    last_as = j
    return out


def _json_key_to_path(key: str, read: str) -> str:
    """Spark JsonPath for a JSON-operator key/path argument.

    duckdb accepts full ``$``-paths and ``/``-rooted JSON Pointers;
    postgres keys are ALWAYS literal keys; mysql arrows always take
    ``$``-paths. Literal keys emit the BRACKET form (``$['a.b']``) so
    dots inside keys stay literal. Constructs Spark's JsonPath cannot
    carry — wildcards/recursion (result shape changes), quoted or
    bracketed members, quotes inside keys — are LOUD, never a silently
    different value.
    """
    if read == "mysql":
        if not key.startswith("$"):
            raise TranspileError(
                "mysql JSON arrows take '$...' path strings"
            )
        if any(c in key for c in "*\""):
            raise TranspileError(
                "mysql JSON path wildcards/quoted members have no "
                "Spark JsonPath equivalent"
            )
        return key
    if read == "duckdb" and key.startswith("$"):
        if "*" in key:
            raise TranspileError(
                "JSON path wildcards return lists in duckdb; no Spark "
                "JsonPath equivalent"
            )
        return key
    if read == "duckdb" and key.startswith("/"):
        segs = key.split("/")[1:]
        if any("~" in g or "'" in g or "[" in g or "]" in g for g in segs):
            raise TranspileError(
                "JSON Pointer escapes/special characters have no Spark "
                "JsonPath form"
            )
        if any(g.isdigit() for g in segs):
            # duckdb pointer segments are POLYMORPHIC: '/a/0' is an
            # array INDEX when a is an array but a KEY when a is an
            # object (verified live: '{"a":[10,20]}' → '10',
            # '{"a":{"0":5}}' → '5'); Spark's bracket JsonPath ['0'] is
            # a field name ONLY (NULL on arrays). Statically ambiguous
            # — loud, mirroring the postgres numeric-string-key guard.
            raise TranspileError(
                "duckdb JSON Pointer digit segments are array indexes "
                "on arrays but keys on objects — statically ambiguous "
                "in Spark's JsonPath; use the '$'-path form ($.a[0] "
                "for indexes, $.a['0'] is not expressible)"
            )
        return "$" + "".join(f"['{g}']" for g in segs)
    # literal key lookup (postgres always; duckdb non-$/non-/ keys)
    if any(c in key for c in "'[]"):
        raise TranspileError(
            "JSON keys containing quotes or brackets cannot be "
            "expressed in Spark's JsonPath"
        )
    if read == "postgres" and key.isdigit():
        raise TranspileError(
            "postgres JSON element access with a numeric-string key is "
            "an ARRAY INDEX on arrays but a KEY on objects — statically "
            "ambiguous; use the integer form for indexes"
        )
    return f"$['{key}']"


#: builtins whose arguments are LAMBDAS (x -> expr) — a bare-identifier
#: (or tuple) operand of -> directly inside one of these calls is lambda
#: syntax, not JSON extraction
_LAMBDA_HOFS = frozenset({
    "transform", "filter", "aggregate", "reduce", "exists", "forall",
    "zip_with", "map_filter", "map_zip_with", "array_sort",
    "list_transform", "list_filter", "list_reduce", "list_aggr",
    "list_sort", "list_reverse_sort", "any_match", "all_match",
    "none_match", "transform_keys", "transform_values",
    # duck aliases (round 11): without these a constant-STRING lambda
    # body (x -> 'lit') is misread as JSON-arrow extraction
    "apply", "list_apply", "array_transform", "array_filter",
    "array_reduce",
})


def _in_lambda_hof(toks: list, lfirst: int) -> bool:
    """True when the -> left operand starting at ``lfirst`` is a lambda
    parameter: a bare identifier (or parenthesized tuple) sitting
    directly after '(' or ',' of an enclosing known lambda-HOF call."""
    if lfirst == 0:
        return False
    prev = toks[lfirst - 1]
    if not (prev[0] == "op" and prev[1] in ("(", ",")):
        return False
    depth = 0
    for j in range(lfirst - 1, -1, -1):
        k, t, _, _ = toks[j]
        if k == "op" and t == ")":
            depth += 1
        elif k == "op" and t == "(":
            if depth == 0:
                return (
                    j > 0
                    and toks[j - 1][0] in _NAME_KINDS
                    and toks[j - 1][1].lower() in _LAMBDA_HOFS
                )
            depth -= 1
    return False


class TokenCtx:
    """Mutable per-pass token view handed to the dialect handler modules
    (core/dialects/*). The walker in core/transpile.py updates the
    per-token fields (i/kind/text/start/end/name) before each dispatch;
    a handler returns the next scan index when it consumed or edited the
    construct, or None to fall through to the shared handlers and plain
    renames."""

    __slots__ = (
        "sql", "read", "first_pass", "toks", "edits",
        "i", "kind", "text", "start", "end", "name",
        "arg_text", "is_op", "transpile", "dead_zones",
    )


def _parse_inagg_order(toks, sql, span, order_at, read):
    """Parse an in-aggregate `ORDER BY k [ASC|DESC] [NULLS FIRST|LAST]`
    tail (round 11, wave 53): returns ``(a1_new, key_txt, comparator)``
    where ``a1_new`` is the last token of the aggregate's value
    expression, ``key_txt`` the sort-key SQL text, and ``comparator``
    a Spark lambda string ordering ``(_l, _r)`` struct pairs by their
    ``_k`` field. Defaults encode each read's null order: pg flips to
    NULLS FIRST on DESC; duck's default_null_order is nulls_last for
    BOTH directions (pinned live). Multi-key tails raise.
    """
    a1 = span[1]
    if (
        order_at + 1 > a1
        or toks[order_at + 1][0] not in _NAME_KINDS
        or toks[order_at + 1][1].upper() != "BY"
    ):
        raise TranspileError("malformed in-aggregate ORDER BY")
    k0 = order_at + 2
    kend = a1
    nulls_first = None
    if (
        kend >= k0 + 1
        and toks[kend][0] in _NAME_KINDS
        and toks[kend][1].upper() in ("FIRST", "LAST")
        and toks[kend - 1][0] in _NAME_KINDS
        and toks[kend - 1][1].upper() == "NULLS"
    ):
        nulls_first = toks[kend][1].upper() == "FIRST"
        kend -= 2
    descending = False
    if (
        kend >= k0
        and toks[kend][0] in _NAME_KINDS
        and toks[kend][1].upper() in ("ASC", "DESC")
    ):
        descending = toks[kend][1].upper() == "DESC"
        kend -= 1
    if kend < k0:
        raise TranspileError("malformed in-aggregate ORDER BY")
    d2 = 0
    for j in range(k0, kend + 1):
        k_, t_ = toks[j][0], toks[j][1]
        if k_ == "op" and t_ in ("(", "["):
            d2 += 1
        elif k_ == "op" and t_ in (")", "]"):
            d2 -= 1
        elif d2 == 0 and k_ == "op" and t_ == ",":
            raise TranspileError(
                "in-aggregate ORDER BY k1, k2 multi-key sorts have "
                "no comparator rewrite; sort explicitly after "
                "aggregating"
            )
    if nulls_first is None:
        # pg and trino flip to NULLS FIRST on DESC; duck's
        # default_null_order is nulls_last for both directions;
        # bigquery defaults NULLS FIRST ascending / LAST descending
        if read == "bigquery":
            nulls_first = not descending
        else:
            nulls_first = descending and read in ("postgres", "trino")
    key_txt = sql[toks[k0][2]:toks[kend][3]].strip()
    lt, gt = ("1", "-1") if descending else ("-1", "1")
    nl, nr = ("-1", "1") if nulls_first else ("1", "-1")
    comparator = (
        "(_l, _r) -> CASE "
        "WHEN _l._k IS NULL AND _r._k IS NULL THEN 0 "
        f"WHEN _l._k IS NULL THEN {nl} "
        f"WHEN _r._k IS NULL THEN {nr} "
        f"WHEN _l._k < _r._k THEN {lt} "
        f"WHEN _l._k > _r._k THEN {gt} ELSE 0 END"
    )
    return order_at - 1, key_txt, comparator
