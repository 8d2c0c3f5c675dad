"""Read-dialect → Spark SQL transpilation.

The reference renders model SQL written in ANY SQLGlot dialect and
transpiles it to the target engine's dialect at render time
(sqlmesh/core/renderer.py:517 ``render`` normalizes through the model's
``dialect``; sqlmesh/core/dialect.py:1040 ``extend_sqlglot`` registers the
dialect surface). sqlglot is not available in this sandbox, so this module
implements the same *capability* directly on the tokenizer from
``core/sqlparse.py``: a span-preserving token rewrite from a read dialect
(DuckDB / Postgres / ANSI / Snowflake / BigQuery / Redshift / MySQL /
Oracle / T-SQL) to Spark SQL.

Design rules:

- **Surgical edits, never re-rendering.** Tokens carry source offsets;
  rewrites are (start, end, replacement) edits applied right-to-left, so
  untouched SQL — whitespace, comments, quoting, macro tokens — survives
  byte-identical. A transpile of already-Spark SQL is a no-op.
- **Only rewrite what differs.** Functions with identical names and
  semantics in both dialects (coalesce, round, date_trunc, concat, ...)
  pass through. The maps below cover names that exist only in the read
  dialect (strftime, epoch, list_*) or exist in both with DIFFERENT
  semantics (single-arg ``log`` is log10 in DuckDB/Postgres but ln in
  Spark).
- **Format strings convert with their functions.** ``strftime``/
  ``strptime`` carry C-style ``%Y-%m-%d`` patterns; Spark's
  ``date_format``/``to_timestamp`` take Java-style ``yyyy-MM-dd``. The
  literal second argument is converted, including quoting literal letter
  runs (``%H:%M:%ST%z`` → ``HH:mm:ss'T'xx``-style). Unknown ``%`` codes
  raise ``TranspileError`` — silently passing one through would produce a
  query that runs and returns wrong strings.
- **Loud failure.** Anything this layer cannot express in Spark raises
  ``TranspileError`` at render time instead of shipping broken SQL to the
  cluster.

Scale note: transpilation is a driver-side string pass over model text
(microseconds per model); it runs inside the render cache keyed by
snapshot version, so a 5,000-model DAG transpiles each model once.
"""

from __future__ import annotations

import re  # noqa: F401  (kept for any residual use in the walker)

# The round-6 split: maps/types/helpers live in transpile_shared,
# literal/format machinery in transpile_text, per-dialect handler blocks
# in core/dialects/*. Every pre-split public and private name is
# re-exported here so external imports keep working unchanged.
from sqlmesh_spark.core.sqlparse import (  # noqa: F401
    ESCAPE_LITERAL_DIALECTS,
    _token_re_for,
)
from sqlmesh_spark.core.transpile_shared import (  # noqa: F401
    TranspileError,
    SPARK,
    READ_DIALECTS,
    DIALECT_ALIASES,
    _STD_LITERAL_DIALECTS,
    _TYPE_MAP,
    _DIALECT_TYPES,
    _PARAM_TYPES,
    _PARAM_DROP_TYPES,
    _type_map,
    _LOUD_TYPE,
    _lookup_type,
    _SPARK4_TARGETS,
    _spark_version,
    _require_spark4,
    _tokenize_spans,
    _emit_infix_call,
    _emit_iso_dow,
    _NAME_KINDS,
    _ident_text,
    _match_bracket,
    _backtrack_primary,
    _PRIMARY_KEYWORDS,
    _NONCALLABLE_KEYWORDS,
    _forward_primary,
    _backward_primary,
    _call_args,
    _call_arg_spans,
    _cast_as_indices,
    _type_token_edits,
    _maybe_round_castee,
    _maybe_varchar_truncate,
    _json_key_to_path,
    TokenCtx,
    _EXPR_KEYWORDS,
)
from sqlmesh_spark.core.transpile_text import (  # noqa: F401
    _DIFF_UNITS,
    _TSQL_UNIT_ALIASES,
    _resolve_unit,
    _C_FMT,
    _PG_FMT,
    _CH_FMT,
    _convert_pct_format,
    convert_strftime_format,
    convert_ch_format,
    _convert_pg_like_format,
    convert_pg_format,
    convert_posix_classes,
    convert_sf_format,
    _MYSQL_FMT,
    _MYSQL_TIME_CODES,
    convert_mysql_format,
    _mysql_fmt_has_time,
    _regex_escape_content,
    _regex_literal,
    _SIMPLE_ESCAPES,
    _BQ_EXTRA_ESCAPES,
    _decode_u_escape,
    _SPARK_EMIT,
    _quote_escape,
    _spark_string_literal,
    _raw_body,
    _literal_content,
    _regex_replacement_to_spark,
)
from sqlmesh_spark.core import dialects as _dialects
from sqlmesh_spark.core.dialects import (  # noqa: F401
    _BIGQUERY_FN,
    _CLICKHOUSE_FN,
    _COMMON_FN,
    _DIALECT_FN,
    _MYSQL_FN,
    _ORACLE_FN,
    _REDSHIFT_FN,
    _SNOWFLAKE_FN,
    _TRINO_FN,
    _TSQL_FN,
)
from sqlmesh_spark.core.dialects import standard as _d_standard
from sqlmesh_spark.core.dialects import clickhouse as _d_clickhouse
from sqlmesh_spark.core.dialects import mysql as _d_mysql
from sqlmesh_spark.core.dialects import oracle as _d_oracle

_PRE_CALL_HANDLERS = _dialects.PRE_CALL_HANDLERS
_POST_CALL_HANDLERS = _dialects.POST_CALL_HANDLERS

#: builtins whose arguments are LAMBDAS (x -> expr) — a bare-identifier
#: (or tuple) operand of -> directly inside one of these calls is lambda
#: syntax, not JSON extraction
_LAMBDA_HOFS = frozenset({
    "transform", "filter", "aggregate", "reduce", "exists", "forall",
    "zip_with", "map_filter", "map_zip_with", "array_sort",
    "list_transform", "list_filter", "list_reduce", "list_aggr",
    "list_sort", "list_reverse_sort", "any_match", "all_match",
    "none_match", "transform_keys", "transform_values",
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


def transpile(sql: str, read: str | None = "duckdb") -> str:
    """Rewrite ``sql`` written in ``read`` dialect into Spark SQL.

    ``read`` of ``None``/``""``/``"spark"``/``"databricks"`` returns
    ``sql`` unchanged. Alias dialects (presto/athena → trino, risingwave
    → postgres, fabric → tsql) normalize before table lookup. Unknown
    dialects raise (loud, per module contract). Runs the edit pass to a
    fixpoint (bounded) so chained constructs — ``x[1][2]``, nested list
    literals — resolve one layer per pass.
    """
    if read:
        read = DIALECT_ALIASES.get(read, read)
    if not read or read == SPARK:
        return sql
    if read not in READ_DIALECTS:
        raise TranspileError(
            f"unknown read dialect {read!r}; supported: "
            f"{READ_DIALECTS + tuple(DIALECT_ALIASES)}"
        )
    out = sql
    for pass_no in range(8):
        nxt = _transpile_once(out, read, first_pass=(pass_no == 0))
        if nxt == out:
            if read in ("duckdb", "postgres"):
                # `^` is POWER in these dialects but XOR in Spark; any
                # occurrence the power() rewrite could not scope must
                # fail loud, never pass through as XOR.
                for k, t, _, _ in _tokenize_spans(nxt, read):
                    if k == "op" and t == "^":
                        raise TranspileError(
                            f"{read} ^ is exponentiation (Spark ^ is "
                            "XOR) and this operand shape has no scoped "
                            "rewrite; use power(a, b) explicitly"
                        )
            return nxt
        out = nxt
    raise TranspileError("transpile did not converge (pathological nesting)")



def _transpile_once(sql: str, read: str, first_pass: bool = True) -> str:
    fn_map = _DIALECT_FN[read]
    toks = _tokenize_spans(sql, read)
    cast_as_idx = _cast_as_indices(toks)
    edits: list[tuple[int, int, str]] = []  # (start, end, replacement)

    if read in ("mysql", "clickhouse") and first_pass:
        # MySQL/ClickHouse `# ...` line comments: comments normally pass
        # through byte-identical (they're skipped, not tokens), but
        # Spark's parser rejects `#` — re-lex including comment matches
        # and rewrite the marker to `--`. The lexer guarantees a `#`
        # inside a string or backtick span never matches as a comment.
        token_re = _token_re_for(read)
        pos = 0
        while pos < len(sql):
            m = token_re.match(sql, pos)
            if not m:
                break  # main loop raises the proper error
            if m.lastgroup == "line_comment" and m.group().startswith("#"):
                edits.append((m.start(), m.start() + 1, "--"))
            pos = m.end()

    def is_op(i: int, val: str) -> bool:
        return 0 <= i < len(toks) and toks[i][0] == "op" and toks[i][1] == val

    def _arg_text(span: tuple[int, int]) -> str:
        # Recursively transpile copied argument text: the tokens of a
        # consumed region are SKIPPED by the outer scan, and later
        # fixpoint passes run with first_pass handlers off — a plain copy
        # would silently ship untranspiled literals (e.g. a SPLIT
        # separator inside UNNEST). The fragment is a balanced
        # expression, so the full pipeline (including literal doubling
        # for standard-literal dialects) applies.
        return transpile(sql[toks[span[0]][2] : toks[span[1]][3]], read)

    # per-pass dispatch context for the dialect handler modules; the
    # walker updates the per-token fields right before each dispatch
    ctx = TokenCtx()
    ctx.sql, ctx.read, ctx.first_pass = sql, read, first_pass
    ctx.toks, ctx.edits = toks, edits
    ctx.arg_text, ctx.is_op, ctx.transpile = _arg_text, is_op, transpile

    i = 0
    n = len(toks)
    #: char spans consumed WHOLESALE by a restructuring handler whose
    #: replacement text was transpiled separately (DISTINCT ON's ORDER
    #: BY clause) — tokens inside must reach NO other handler: a later
    #: edit overlapping the wholesale replacement corrupts the splice.
    dead_zones: list[tuple[int, int]] = []
    while i < n:
        kind, text, start, end = toks[i]
        if dead_zones and any(z0 <= start < z1 for z0, z1 in dead_zones):
            i += 1
            continue

        # `//` integer division → DIV (adjacent '/' '/' spans). For
        # duckdb the next pass wraps DIV's divisor in nullif (below).
        if kind == "op" and text == "/" and is_op(i + 1, "/") and toks[i + 1][2] == end:
            edits.append((start, toks[i + 1][3], " DIV "))
            i += 2
            continue

        # postgres `/` over INTEGERS truncates (7/2 = 3, -7/2 = -3);
        # Spark `/` is always DOUBLE division. Statically provable only
        # for integer-literal / integer-literal — rewrite that shape to
        # DIV (Spark DIV truncates toward zero, same as pg). Guards:
        # the LHS literal must be a standalone operand (the token
        # before it must not be a tighter-or-equal operator — in
        # `x / 7 / 2` the second division's real LHS is `(x / 7)`), and
        # the RHS literal must not be captured by a tighter operator
        # (`7 / 2 ^ x` is `7 / (2 ^ x)`; `7 / 2::float8` is DOUBLE).
        # Non-literal operands pass through — a DOCUMENTED divergence
        # (column int division needs the model's types, which a textual
        # transpiler doesn't have; SQLGlot, and therefore the
        # reference, passes it through identically). Pinned in
        # tests/test_dialect_fuzz_pg.py. A preceding DIV name does NOT
        # block: postgres has no infix DIV, so it can only be this
        # handler's own prior emission — a provably-integer LHS — and
        # blocking it left chains half-converted (`7/2/2` stabilized as
        # `7 DIV 2/2` = 1.5 in Spark where pg gives 1; chain rewrites
        # land one `/` per fixpoint pass via the pending-edit defer).
        if (
            read == "postgres"
            and kind == "op"
            and text == "/"
            and i > 0
            and toks[i - 1][0] == "number"
            and toks[i - 1][1].isdigit()
            and not (
                i >= 2
                and toks[i - 2][0] == "op"
                and toks[i - 2][1] in ("*", "/", "%", "^", "::")
            )
        ):
            j = i + 1
            while j < n and toks[j][0] == "op" and toks[j][1] in ("+", "-"):
                j += 1
            if (
                j < n
                and toks[j][0] == "number"
                and toks[j][1].isdigit()
                and not (
                    j + 1 < n
                    and toks[j + 1][0] == "op"
                    and toks[j + 1][1] in ("^", "::", "[", ".")
                )
                and not any(e[1] >= toks[i - 1][2] and e[0] <= toks[j][3]
                            for e in edits)
            ):
                edits.append((start, end, " DIV "))
                i = j + 1
                continue

        # DuckDB `/`, `%` and `//`(→DIV above) return NULL on a zero
        # divisor; Spark 4 (ANSI on) raises DIVIDE_BY_ZERO — wrap the
        # divisor in nullif(d, 0) (x / NULL is NULL in both engines).
        # MySQL has the same NULL-on-zero semantics for / % MOD and its
        # native DIV keyword (non-strict default). Runs every pass:
        # pending rewrites inside the divisor (subscripts, :: casts)
        # defer it to the next pass, and the nullif(…, 0) guard keeps
        # the fixpoint convergent. Postgres/oracle/tsql/snowflake/
        # bigquery/trino raise on zero division like ANSI — no rewrite.
        # Unrecognized divisor shapes stay untouched (ANSI raise: loud,
        # never silent-wrong).
        if (
            read in ("duckdb", "mysql")
            and (
                (kind == "op" and text in ("/", "%") and not is_op(i + 1, "/"))
                or (
                    kind in _NAME_KINDS
                    and text.upper() == "DIV"
                    # only the infix-operator reading: the previous
                    # token must END an expression (operand). Excludes
                    # a COLUMN named div — `t.div + 1` (prev is '.') or
                    # `SELECT div` (prev is a clause keyword) must not
                    # wrap `nullif(+ 1, 0)` around what follows.
                    and i > 0
                    and (
                        toks[i - 1][0] in ("number", "string", "dquote")
                        or (toks[i - 1][0] == "op"
                            and toks[i - 1][1] in (")", "]"))
                        or (toks[i - 1][0] in _NAME_KINDS
                            and (toks[i - 1][1].upper() == "END"
                                 or toks[i - 1][1].upper()
                                 not in _NONCALLABLE_KEYWORDS))
                    )
                )
            )
        ):
            span = _forward_primary(toks, i + 1)
            if span is not None:
                ps = toks[span[0]][2]
                pe = toks[span[1]][3]
                k0 = span[0]
                while toks[k0][0] == "op" and toks[k0][1] in ("+", "-", "~"):
                    k0 += 1
                already = False
                if (
                    toks[k0][0] in _NAME_KINDS
                    and toks[k0][1].lower() == "nullif"
                    and is_op(k0 + 1, "(")
                ):
                    nspans, _nc = _call_arg_spans(toks, k0 + 1)
                    if (
                        len(nspans) == 2
                        and nspans[1][0] == nspans[1][1]
                        and toks[nspans[1][0]][0] == "number"
                        and toks[nspans[1][0]][1] == "0"
                    ):
                        already = True
                if not already and not any(
                    e[1] >= ps and e[0] <= pe for e in edits
                ):
                    edits.append((ps, ps, "nullif("))
                    edits.append((pe, pe, ", 0)"))
            i += 1
            continue

        # DuckDB/Postgres `^` (and DuckDB `**`) are POWER; Spark's `^` is
        # bitwise XOR — passing it through would be silently wrong
        # (2 ^ 3 = 1). Rewrite a ^ b → power(a, b); left-associative
        # chains resolve over fixpoint passes (both engines' ^ is
        # left-assoc), and BOTH bind unary minus tighter than ^
        # (-2 ^ 2 = 4; verified live on PostgreSQL 15 — its docs'
        # precedence table puts unary +/- above ^). A `^` whose
        # operands never resolve is caught by the post-fixpoint guard
        # in transpile() (loud, never XOR).
        if (
            read in ("duckdb", "postgres")
            and kind == "op"
            and (
                text == "^"
                or (
                    read == "duckdb"
                    and text == "*"
                    and is_op(i + 1, "*")
                    and toks[i + 1][2] == end
                )
            )
        ):
            two_star = text == "*"
            op_end = toks[i + 1][3] if two_star else end
            right_idx = i + 2 if two_star else i + 1
            lfirst = (
                _backward_primary(toks, i - 1, include_unary=True)
                if i > 0 else None
            )
            rspan = _forward_primary(toks, right_idx)
            if lfirst is not None and rspan is not None:
                ls = toks[lfirst][2]
                re_ = toks[rspan[1]][3]
                if not any(e[1] >= ls and e[0] <= re_ for e in edits):
                    edits.append((ls, ls, "power("))
                    edits.append((start, op_end, ", "))
                    edits.append((re_, re_, ")"))
                    # keep scanning INSIDE the right operand so its own
                    # first-pass handlers still run this pass
                    i = right_idx
                    continue
            i += 1
            continue

        # Redshift SYSDATE is a bare keyword (no parens) returning the UTC
        # transaction timestamp.
        if (
            read == "redshift"
            and kind == "ident"
            and text.lower() == "sysdate"
            and not is_op(i + 1, "(")
        ):
            edits.append(
                (start, end,
                 "to_utc_timestamp(current_timestamp(), current_timezone())")
            )
            i += 1
            continue

        # Trino/Oracle TIMESTAMP '...' typed literals are zone-LESS (the
        # same type CAST(x AS timestamp) maps to TIMESTAMP_NTZ); Spark's
        # bare TIMESTAMP literal is session-zone LTZ — emit the NTZ
        # spelling so both spellings of the type agree. ONLY for plain
        # date-time content: a literal carrying a zone/offset suffix
        # ('... America/Los_Angeles', '... +02:00') is a WITH TIME ZONE
        # literal whose instant Spark's LTZ literal already honors —
        # left untouched (an NTZ rewrite would silently drop the zone).
        if (
            read in ("trino", "oracle")
            and kind == "ident"
            and text.upper() == "TIMESTAMP"
            and i + 1 < n
            and toks[i + 1][0] == "string"
        ):
            lit_content = _literal_content(toks[i + 1][1], read)
            if re.fullmatch(
                r"\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?",
                lit_content.strip(),
            ):
                edits.append((start, end, "TIMESTAMP_NTZ"))
            i += 2
            continue

        # Trino AT TIME ZONE: changes the display zone of the same
        # instant — Spark timestamps are session-zone-normalized with no
        # per-value zone, so there is no faithful rewrite. LOUD.
        if (
            read == "trino"
            and kind == "ident"
            and text.upper() == "AT"
            and i + 2 < n
            and toks[i + 1][0] == "ident"
            and toks[i + 1][1].upper() == "TIME"
            and toks[i + 2][0] == "ident"
            and toks[i + 2][1].upper() == "ZONE"
        ):
            raise TranspileError(
                "AT TIME ZONE has no faithful Spark rewrite (Spark "
                "timestamps carry no per-value zone); rewrite with "
                "to_utc_timestamp/from_utc_timestamp explicitly"
            )

        # ClickHouse ternary `cond ? a : b` — rewriting needs expression
        # boundaries the token pass doesn't model; Spark would misparse.
        # ---- ClickHouse token-level fixes (core/dialects/clickhouse.py)
        if read == "clickhouse" and kind in ("op", "ident"):
            ctx.i, ctx.kind, ctx.text = i, kind, text
            ctx.start, ctx.end, ctx.name = start, end, ""
            nxt = _d_clickhouse.token_handlers(ctx)
            if nxt is not None:
                i = nxt
                continue

        # ---- Oracle bare-keyword fixes (core/dialects/oracle.py)
        if read == "oracle" and kind == "ident":
            ctx.i, ctx.kind, ctx.text = i, kind, text
            ctx.start, ctx.end, ctx.name = start, end, ""
            nxt = _d_oracle.token_handlers(ctx)
            if nxt is not None:
                i = nxt
                continue

        if (
            read == "oracle"
            and kind == "op" and text == "("
            and is_op(i + 1, "+") and is_op(i + 2, ")")
        ):
            raise TranspileError(
                "oracle (+) outer-join syntax has no Spark rewrite; use "
                "ANSI LEFT/RIGHT JOIN"
            )

        # ANSI/Oracle/Postgres row-limiting clauses Spark lacks:
        #   OFFSET m ROWS [FETCH FIRST|NEXT n ROWS|ROW ONLY] → LIMIT n OFFSET m
        #   FETCH FIRST|NEXT n ROWS|ROW ONLY → LIMIT n
        # (T-SQL's OFFSET..FETCH is the same grammar.)
        if (
            read in ("oracle", "ansi", "postgres", "tsql", "trino")
            and kind == "ident"
            and text.upper() in ("OFFSET", "FETCH")
        ):
            j = i
            off_txt = None
            if toks[j][1].upper() == "OFFSET":
                if (
                    j + 2 < n
                    and toks[j + 1][0] == "number"
                    and toks[j + 2][0] == "ident"
                    and toks[j + 2][1].upper() in ("ROW", "ROWS")
                ):
                    off_txt = toks[j + 1][1]
                    j += 3
                else:
                    i += 1  # plain OFFSET n (already Spark) — untouched
                    continue
            cnt_txt = None
            if (
                j < n
                and toks[j][0] == "ident"
                and toks[j][1].upper() == "FETCH"
                and j + 1 < n
                and toks[j + 1][0] == "ident"
                and toks[j + 1][1].upper() in ("FIRST", "NEXT")
            ):
                k_ = j + 2
                if k_ < n and toks[k_][0] == "number":
                    cnt_txt = toks[k_][1]
                    k_ += 1
                else:
                    cnt_txt = "1"
                if not (
                    k_ + 1 < n
                    and toks[k_][0] == "ident"
                    and toks[k_][1].upper() in ("ROW", "ROWS")
                    and toks[k_ + 1][0] == "ident"
                    and toks[k_ + 1][1].upper() == "ONLY"
                ):
                    raise TranspileError(
                        "FETCH FIRST ... requires ROWS ONLY (WITH TIES / "
                        "PERCENT have no Spark rewrite)"
                    )
                j = k_ + 2
            elif off_txt is None:
                i += 1  # bare FETCH ident (not the clause) — untouched
                continue
            parts = []
            if cnt_txt is not None:
                parts.append(f"LIMIT {cnt_txt}")
            if off_txt is not None:
                parts.append(f"OFFSET {off_txt}")
            edits.append((start, toks[j - 1][3], " ".join(parts)))
            i = j
            continue

        # T-SQL N'...' unicode literal prefix: Spark strings are already
        # unicode — drop the N (adjacency = no whitespace, so a column
        # named n is never touched).
        if (
            read == "tsql"
            and kind == "ident"
            and text.lower() == "n"
            and i + 1 < n
            and toks[i + 1][0] == "string"
            and toks[i + 1][2] == end
        ):
            edits.append((start, end, ""))
            i += 1
            continue

        # T-SQL SELECT TOP n [select-list...] → LIMIT n at the scope end.
        if (
            read == "tsql"
            and kind == "ident"
            and text.upper() == "TOP"
            and i > 0
            and toks[i - 1][0] == "ident"
            and toks[i - 1][1].upper() in ("SELECT", "DISTINCT")
            and i + 1 < n
            and toks[i + 1][0] == "number"
        ):
            n_txt = toks[i + 1][1]
            after = i + 2
            if (
                after < n
                and toks[after][0] == "ident"
                and toks[after][1].upper() in ("PERCENT", "WITH")
            ):
                raise TranspileError(
                    "TOP n PERCENT / WITH TIES has no Spark rewrite"
                )
            # find this SELECT's scope end: depth-0 ')' or set-op keyword
            # or end of text
            depth = 0
            end_pos = len(sql)
            setop_after = False
            for j in range(i + 2, n):
                k_, t_, s_, _e = toks[j]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                    if depth < 0:
                        end_pos = s_
                        break
                elif (
                    depth == 0
                    and k_ == "ident"
                    and t_.upper() in ("UNION", "INTERSECT", "EXCEPT", "MINUS")
                ):
                    end_pos = s_
                    setop_after = True
                    break
            # a set-op BEFORE this SELECT at the same depth means we're a
            # non-first union branch
            setop_before = False
            sel_idx = i - 1 if toks[i - 1][1].upper() == "SELECT" else i - 2
            depth = 0
            for j in range(sel_idx - 1, -1, -1):
                k_, t_, _s, _e = toks[j]
                if k_ == "op" and t_ == ")":
                    depth += 1
                elif k_ == "op" and t_ == "(":
                    depth -= 1
                    if depth < 0:
                        break
                elif (
                    depth == 0
                    and k_ == "ident"
                    and t_.upper() in ("UNION", "INTERSECT", "EXCEPT", "MINUS")
                ):
                    setop_before = True
                    break
            # drop "TOP n" and attach LIMIT at the scope end. A trailing
            # LIMIT in a set operation binds to the WHOLE union in Spark,
            # so a union branch gets parenthesized: (SELECT ... LIMIT n).
            # absorb the whitespace between SELECT/DISTINCT and TOP so
            # the emitted text has no doubled spaces
            edits.append((toks[i - 1][3], toks[i + 1][3], ""))
            lead = "" if end_pos > 0 and sql[end_pos - 1].isspace() else " "
            if setop_after or setop_before:
                edits.append((toks[sel_idx][2], toks[sel_idx][2], "("))
                edits.append((end_pos, end_pos, f"{lead}LIMIT {n_txt}) "))
            else:
                edits.append((end_pos, end_pos, f"{lead}LIMIT {n_txt}"))
            i += 2
            continue

        # ---- MySQL operator fixes (core/dialects/mysql.py)
        if read == "mysql":
            ctx.i, ctx.kind, ctx.text = i, kind, text
            ctx.start, ctx.end, ctx.name = start, end, ""
            nxt = _d_mysql.token_handlers(ctx)
            if nxt is not None:
                i = nxt
                continue

        if (
            read == "bigquery"
            and kind == "ident"
            and text.lower() in ("r", "b", "rb", "br")
            and i + 1 < n
            and toks[i + 1][0] == "string"
            and toks[i + 1][2] == end
            and not any(e_start <= start < e_end for e_start, e_end, _ in edits)
        ):
            if "b" in text.lower():
                raise TranspileError(
                    "BigQuery bytes literals (b'...') have no Spark string "
                    "rewrite; use an explicit CAST or unhex"
                )
            body = _raw_body(toks[i + 1][1])
            lit = _spark_string_literal(body, read)
            edits.append((start, toks[i + 1][3], lit))
            i += 2
            continue

        # Bracket syntax: list literals → array(...), subscripts (1-based
        # in DuckDB/Postgres, matching element_at) → element_at(...).
        # Snowflake/BigQuery bare subscripts are 0-BASED — exactly Spark's
        # native arr[i] semantics — so for those reads subscripts pass
        # through untouched (rewriting via 1-based element_at would be a
        # silent off-by-one); only the bracket LITERAL forms rewrite.
        if kind == "op" and text == "[":
            if read == "mysql":
                raise TranspileError(
                    "mysql has no array/bracket expression syntax; "
                    "brackets in mysql-dialect model SQL are not "
                    "transpilable"
                )
            close = _match_bracket(toks, i)
            # DuckDB slice syntax x[1:3] has no element_at analog — LOUD.
            bdepth = 0
            for j in range(i + 1, close):
                k_, t_, _, _ = toks[j]
                if k_ == "op" and t_ in ("(", "["):
                    bdepth += 1
                elif k_ == "op" and t_ in (")", "]"):
                    bdepth -= 1
                elif bdepth == 0 and k_ == "op" and t_ == ":":
                    raise TranspileError(
                        "array slice syntax [a:b] has no Spark rewrite; "
                        "use slice(arr, start, length) explicitly"
                    )
            prev = toks[i - 1] if i > 0 else None
            # Redshift SUPER-array subscripts are 0-based too (pass-through
            # = Spark's native semantics).
            zero_based = read in ("snowflake", "bigquery", "redshift")
            # DuckDB string subscript: 'abc'[2] is 1-based single-char
            # extraction → substr(lit, idx, 1).
            if prev is not None and prev[0] == "string" and not zero_based:
                edits.append((prev[2], prev[2], "substr("))
                edits.append((start, end, ", "))
                edits.append((toks[close][2], toks[close][3], ", 1)"))
                i += 1
                continue
            # Postgres/DuckDB ARRAY[...] literal
            if prev is not None and prev[0] == "ident" and prev[1].lower() == "array":
                edits.append((prev[2], end, "array("))
                edits.append((toks[close][2], toks[close][3], ")"))
                i += 1
                continue
            is_subscript = (
                prev is not None
                and (
                    (
                        prev[0] in _NAME_KINDS
                        and prev[1].upper() not in _NONCALLABLE_KEYWORDS
                    )
                    or (prev[0] == "op" and prev[1] in (")", "]"))
                )
            )
            if not is_subscript:
                edits.append((start, end, "array("))
                edits.append((toks[close][2], toks[close][3], ")"))
                i += 1
                continue
            if read == "clickhouse":
                # CH subscripts return the element type's DEFAULT (0, '')
                # out of bounds / for a missing map key — the common
                # arr[indexOf(keys, k)] idiom RELIES on arr[0] being the
                # default. element_at raises for index 0 and (under
                # Spark 4 ANSI) out of bounds — same loud stance as the
                # arrayElement() function spelling.
                raise TranspileError(
                    "clickhouse [..] subscripts return the element "
                    "type's default out of bounds; no faithful Spark "
                    "rewrite — use try_element_at + coalesce explicitly"
                )
            if prev[0] == "op":
                j = _backtrack_primary(toks, i - 1)
            else:
                j = i - 1
                while (
                    j >= 2
                    and toks[j - 1][0] == "op" and toks[j - 1][1] == "."
                    and toks[j - 2][0] in _NAME_KINDS
                ):
                    j -= 2
            if zero_based:
                # BigQuery arr[SAFE_OFFSET(i)] / arr[SAFE_ORDINAL(i)]
                # return NULL out of bounds (plain subscripts error under
                # ANSI) → try_element_at, compensating its 1-based index.
                if (
                    read == "bigquery"
                    and j is not None
                    and toks[i + 1][0] == "ident"
                    and toks[i + 1][1].lower() in ("safe_offset", "safe_ordinal")
                    and is_op(i + 2, "(")
                    and not any(e[0] >= toks[j][2] for e in edits)
                ):
                    fn_close = _call_args(toks, i + 2)[-1]
                    if fn_close == close - 1:
                        safe_name = toks[i + 1][1].lower()
                        edits.append((toks[j][2], toks[j][2], "try_element_at("))
                        # `[ SAFE_OFFSET (` → `, (`
                        edits.append((start, toks[i + 2][3], ", ("))
                        if safe_name == "safe_offset":
                            # 0-based → 1-based
                            edits.append(
                                (toks[fn_close][2], toks[close][3], ") + 1)")
                            )
                        else:
                            edits.append(
                                (toks[fn_close][2], toks[close][3], "))")
                            )
                        i += 1
                        continue
                # Otherwise Spark's arr[i] is 0-based like
                # Snowflake/BigQuery — pass the subscript through
                # (OFFSET/ORDINAL wrappers are compensated by their own
                # handlers).
                i += 1
                continue
            if j is None or any(e[0] >= toks[j][2] for e in edits):
                i += 1  # defer the bracket to the next fixpoint pass
                continue
            if read in ("duckdb", "postgres"):
                # DuckDB/Postgres subscripts return NULL out of bounds
                # AND for index 0 (verified: ([1,2,3])[10] → NULL,
                # ([1,2,3])[0] → NULL); Spark-4 ANSI element_at raises
                # on both (try_element_at still raises for index 0) →
                # try_element_at + nullif(i, 0). DuckDB resolves
                # NEGATIVE indexes from the end (matching
                # try_element_at); Postgres returns NULL for them —
                # greatest(i, 0) folds every non-positive index into
                # the NULL arm. Trino/ANSI keep plain element_at below:
                # their bracket subscripts ERROR out of bounds, which
                # ANSI element_at matches.
                if close == i + 1 + 1 and toks[i + 1][0] == "string":
                    # duckdb struct['field'] / map['key'], postgres
                    # jsonb['key']: a string-literal subscript is KEY
                    # access — try_element_at's nullif('k', 0) guard is
                    # a string-vs-int comparison that fails under ANSI
                    # at EXECUTION; raise at render instead. (duckdb
                    # map[k] additionally returns a LIST, not the
                    # element — no faithful element_at form at all.)
                    raise TranspileError(
                        f"{read} ['...'] string-key subscripts (struct/"
                        "map/jsonb key access) have no faithful Spark "
                        "element_at rewrite; use dot access for struct "
                        "fields or ->> for JSON keys"
                    )
                edits.append((toks[j][2], toks[j][2], "try_element_at("))
                if read == "postgres":
                    edits.append((start, end, ", nullif(greatest("))
                    edits.append((toks[close][2], toks[close][3], ", 0), 0))"))
                else:
                    edits.append((start, end, ", nullif("))
                    edits.append((toks[close][2], toks[close][3], ", 0))"))
                i += 1
                continue
            edits.append((toks[j][2], toks[j][2], "element_at("))
            edits.append((start, end, ", "))
            edits.append((toks[close][2], toks[close][3], ")"))
            i += 1  # keep scanning inside the subscript expression
            continue

        # Snowflake semi-structured colon paths: v:a.b[0]."Key"::TYPE.
        # The ::cast form maps exactly — casting a VARIANT to STRING
        # unquotes JSON strings, which is get_json_object's behavior,
        # and other target types parse the extracted text just like
        # Spark's ANSI CAST; the emitted CAST's type name is transpiled
        # by the regular type machinery on the next fixpoint pass. A
        # BARE colon path (no cast) yields a VARIANT whose text form
        # quotes string scalars — no faithful rewrite, LOUD.
        if (
            read == "snowflake"
            and kind == "op"
            and text == ":"
            and i + 1 < n
            and toks[i + 1][0] in ("ident", "dquote")
        ):
            lfirst = (
                _backward_primary(toks, i - 1, include_unary=False)
                if i > 0 else None
            )
            if lfirst is not None and not any(
                e[1] >= toks[lfirst][2] for e in edits
            ):
                parts = []
                j2 = i + 1
                while j2 < n:
                    tk, tt, _, tend_ = toks[j2]
                    if tk == "ident":
                        parts.append("." + tt)
                    elif tk == "dquote":
                        inner = tt[1:-1].replace('""', '"')
                        if any(c in inner for c in "'[]"):
                            raise TranspileError(
                                "snowflake path elements containing "
                                "quotes or brackets cannot be expressed "
                                "in Spark's JsonPath"
                            )
                        parts.append("['" + inner + "']")
                    else:
                        break
                    j2 += 1
                    if j2 < n and is_op(j2, "."):
                        j2 += 1
                        continue
                    while (
                        j2 + 2 < n
                        and is_op(j2, "[")
                        and toks[j2 + 1][0] == "number"
                        and is_op(j2 + 2, "]")
                    ):
                        parts.append(f"[{toks[j2 + 1][1]}]")
                        j2 += 3
                    if j2 < n and is_op(j2, "."):
                        j2 += 1
                        continue
                    break
                if parts:
                    path = "$" + "".join(parts)
                    if not (
                        j2 < n
                        and is_op(j2, "::")
                        and j2 + 1 < n
                        and toks[j2 + 1][0] == "ident"
                    ):
                        raise TranspileError(
                            "bare snowflake :path returns VARIANT, whose "
                            "text form quotes string scalars; append "
                            "::STRING (exactly get_json_object) or a "
                            "typed cast"
                        )
                    t_last = j2 + 1
                    if is_op(t_last + 1, "("):
                        t_last = _call_arg_spans(toks, t_last + 1)[1]
                    type_text = sql[toks[j2 + 1][2]: toks[t_last][3]]
                    ls = toks[lfirst][2]
                    gjo = "get_json_object(" + sql[ls: toks[i - 1][3]]
                    edits.append(
                        (ls, toks[t_last][3],
                         f"CAST({gjo}, "
                         f"{_spark_string_literal(path, read)}) "
                         f"AS {type_text})")
                    )
                    i = t_last + 1
                    continue
            i += 1
            continue

        # duckdb/postgres/mysql JSON extraction arrows: j ->> k (text)
        # maps to get_json_object — EXACT for scalar results (unquoted,
        # 0-based $[n] indexes); object/array results re-serialize in
        # Spark's compact form, which matches duckdb byte-for-byte but
        # can differ in whitespace/key order from postgres-json source
        # text and mysql's normalized printing (the mapping SQLGlot
        # ships; documented divergence — scalars, the common case, are
        # exact everywhere). A contiguous literal chain
        # j -> 'a' -> 'b' ->> 'c' folds into ONE combined JsonPath
        # ($['a']['b']['c']) so Spark navigates the ORIGINAL document —
        # this matches the source engines when an intermediate hop is a
        # JSON string scalar (both stop with NULL; per-hop nesting
        # would unquote the scalar text and keep navigating). A terminal
        # -> is LOUD (its JSON-typed text form quotes string scalars),
        # and a chain interrupted by parentheses is LOUD too (the
        # combined path cannot see through the grouping, and per-hop
        # nesting diverges on string-scalar hops). Negative integer
        # indexes (pg/duckdb count from the end) have no Spark JsonPath
        # form — LOUD. An arrow chained onto ->> TEXT output re-parses:
        # duckdb's VARCHAR→JSON implicit cast does exactly that (nested
        # get_json_object is exact, resolved on the next fixpoint pass);
        # postgres/mysql reject arrows on text — LOUD. Lambda arrows
        # (x -> expr inside transform/filter/...) are excluded.
        # Non-literal keys pass through untouched (Spark's parser
        # rejects them — loud at render/analysis).
        if (
            read in ("duckdb", "postgres", "mysql")
            and kind == "op"
            and text == "->"
        ):
            arrow2 = is_op(i + 1, ">") and toks[i + 1][2] == end
            rhs_idx = i + (2 if arrow2 else 1)
            rhs = toks[rhs_idx] if rhs_idx < n else None
            lfirst = (
                _backward_primary(toks, i - 1, include_unary=False)
                if i > 0 else None
            )
            if (
                lfirst is not None
                and lfirst > 0
                and toks[lfirst - 1][0] == "op"
                and (
                    toks[lfirst - 1][1] in ("->", "#>", "#>>")
                    or (
                        # the trailing > of a split ->> pair; a bare
                        # comparison > is NOT an arrow tail
                        toks[lfirst - 1][1] == ">"
                        and lfirst >= 2
                        and toks[lfirst - 2][0] == "op"
                        and toks[lfirst - 2][1] == "->"
                        and toks[lfirst - 2][3] == toks[lfirst - 1][2]
                    )
                )
            ):
                # the "primary" is itself the RHS of a preceding JSON
                # operator (j -> 'a' ->> 'b' seen at the SECOND arrow
                # when the first deferred to the next pass on a pending
                # LHS edit) — never fold from mid-chain; the left arrow
                # owns the whole chain
                i += 1
                continue
            if (
                rhs is not None
                and lfirst is not None
                and not _in_lambda_hof(toks, lfirst)
                and rhs[0] == "op"
                and rhs[1] == "-"
                and rhs_idx + 1 < n
                and toks[rhs_idx + 1][0] == "number"
            ):
                if read == "mysql":
                    raise TranspileError(
                        "mysql JSON arrows take '$...' path strings"
                    )
                raise TranspileError(
                    f"negative JSON index counts from the end in {read}; "
                    "Spark's JsonPath has no from-end form"
                )
            if (
                rhs is not None
                and rhs[0] in ("string", "number")
                and lfirst is not None
                and not _in_lambda_hof(toks, lfirst)
            ):
                ls = toks[lfirst][2]
                # collect the contiguous literal chain: (->|->>) lit,
                # stopping at (and including) the first ->> hop
                hops = []  # (is_text_arrow, rhs_token)
                cur = i
                chain_end = rhs[3]
                terminated = False
                while True:
                    a2 = (
                        is_op(cur + 1, ">")
                        and toks[cur + 1][2] == toks[cur][3]
                    )
                    ridx = cur + (2 if a2 else 1)
                    r = toks[ridx] if ridx < n else None
                    if (
                        r is not None
                        and r[0] == "op"
                        and r[1] == "-"
                        and ridx + 1 < n
                        and toks[ridx + 1][0] == "number"
                    ):
                        if read == "mysql":
                            raise TranspileError(
                                "mysql JSON arrows take '$...' path "
                                "strings"
                            )
                        raise TranspileError(
                            "negative JSON index counts from the end "
                            f"in {read}; Spark's JsonPath has no "
                            "from-end form"
                        )
                    if r is None or r[0] not in ("string", "number"):
                        break  # non-literal continuation: pass through
                    hops.append((a2, r))
                    chain_end = r[3]
                    if a2:
                        terminated = True
                        break
                    cur = ridx + 1
                    if not (
                        cur < n
                        and toks[cur][0] == "op"
                        and toks[cur][1] == "->"
                    ):
                        break  # chain ends on a -> hop
                if any(e[1] >= ls and e[0] <= chain_end for e in edits):
                    i += 1  # LHS edited this pass; resolve next pass
                    continue
                if not terminated:
                    # when the collection loop stopped with toks[cur]
                    # still an arrow, the continuation key is
                    # non-literal (pass through — Spark's parser
                    # rejects the surviving arrow: loud at render);
                    # otherwise the chain genuinely ends on a -> hop
                    if hops and not (
                        cur < n
                        and toks[cur][0] == "op"
                        and toks[cur][1] == "->"
                    ):
                        j2 = cur
                        while j2 < n and is_op(j2, ")"):
                            j2 += 1
                        if (
                            j2 > cur
                            and j2 < n
                            and toks[j2][0] == "op"
                            and toks[j2][1] == "->"
                        ):
                            raise TranspileError(
                                "parenthesized JSON arrow chains cannot "
                                "fold into one Spark JsonPath (and "
                                "per-hop rewrites diverge when a hop is "
                                "a JSON string scalar); remove the "
                                "parentheses so the -> chain ends in a "
                                "single ->> extraction"
                            )
                        raise TranspileError(
                            "terminal -> returns the JSON-typed "
                            "value, whose text form differs from "
                            "get_json_object for string scalars; "
                            "use ->> (text) or "
                            + ("JSON_UNQUOTE" if read == "mysql"
                               else "json_extract_string")
                        )
                    i += 1  # non-literal continuation — loud at render
                    continue
                segs = []
                for _a2, r in hops:
                    if r[0] == "number":
                        if read == "mysql":
                            raise TranspileError(
                                "mysql JSON arrows take '$...' path "
                                "strings"
                            )
                        segs.append(f"[{r[1]}]")
                    else:
                        key = _literal_content(r[1], read)
                        segs.append(_json_key_to_path(key, read)[1:])
                path = "$" + "".join(segs)
                # an arrow chained onto this ->> TEXT output re-parses
                # the text: exact for duckdb (VARCHAR→JSON implicit
                # cast, next-pass nesting), a type error in postgres
                # and invalid mysql — loud for those
                nxt_i = rhs_idx if not hops else (
                    cur + (2 if hops[-1][0] else 1)
                )
                j2 = nxt_i + 1
                while j2 < n and is_op(j2, ")"):
                    j2 += 1
                if (
                    read in ("postgres", "mysql")
                    and j2 < n
                    and toks[j2][0] == "op"
                    and toks[j2][1] in ("->", "#>", "#>>")
                ):
                    raise TranspileError(
                        "->> returns text; chaining another JSON "
                        f"operator onto text is a type error in {read}"
                    )
                edits.append((ls, ls, "get_json_object("))
                edits.append(
                    (start, chain_end,
                     ", " + _spark_string_literal(path, read) + ")")
                )
                i = nxt_i + 1
                continue
            i += 1
            continue

        # ORDER BY NULL-placement defaults (verified live for pg and
        # duckdb; others per their documented defaults): Spark sorts
        # NULLS FIRST on ASC / NULLS LAST on DESC, while
        # pg/redshift/oracle/snowflake/trino treat NULL as LARGEST
        # (NULLS LAST on ASC, NULLS FIRST on DESC) and duckdb/
        # clickhouse default NULLS LAST in BOTH directions. Any
        # unannotated sort item therefore places NULL rows differently
        # — silently different results under LIMIT and window ranking.
        # Append the source dialect's placement to every item that
        # lacks an explicit NULLS keyword, in statement-level and
        # OVER-window ORDER BY clauses (function-arg ORDER BYs are
        # owned by their functions' handlers — loud or restructured —
        # and WITHIN GROUP aggregates skip NULL inputs). mysql/tsql/
        # bigquery treat NULL as SMALLEST, matching Spark — no-op.
        if (
            kind == "ident"
            and text.upper() == "ORDER"
            and i + 1 < n
            and toks[i + 1][0] == "ident"
            and toks[i + 1][1].upper() == "BY"
            and read in ("postgres", "redshift", "oracle", "snowflake",
                          "trino", "duckdb", "clickhouse")
        ):
            # context: statement/subquery level or OVER window — skip
            # function-argument and WITHIN GROUP clauses
            depth = 0
            opener_prev = None
            at_top = True
            for j in range(i - 1, -1, -1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ == ")":
                    depth += 1
                elif k_ == "op" and t_ == "(":
                    depth -= 1
                    if depth < 0:
                        opener_prev = toks[j - 1] if j > 0 else None
                        at_top = False
                        break
            applies = at_top or opener_prev is None or not (
                opener_prev[0] in _NAME_KINDS
                and (
                    opener_prev[1].upper() == "GROUP"  # WITHIN GROUP
                    or opener_prev[1].upper() not in _NONCALLABLE_KEYWORDS
                )
            )
            if applies:
                # item spans to the clause end at this depth; each item
                # records (token_idx, depth-within-item) — NULLS and
                # ASC/DESC classification must see ONLY depth-0 tokens
                # (a NULLS LAST inside a nested OVER window previously
                # suppressed the whole item's annotation, silently
                # keeping Spark's default placement for the outer sort)
                depth = 0
                items: list[list[tuple[int, int]]] = [[]]
                end_j = n
                for j in range(i + 2, n):
                    k_, t_ = toks[j][0], toks[j][1]
                    if k_ == "op" and t_ == "(":
                        depth += 1
                    elif k_ == "op" and t_ == ")":
                        depth -= 1
                        if depth < 0:
                            end_j = j
                            break
                    elif depth == 0 and k_ == "op" and t_ in (",", ";"):
                        if t_ == ";":
                            end_j = j
                            break
                        items.append([])
                        continue
                    elif depth == 0 and k_ == "ident" and t_.upper() in (
                        "LIMIT", "OFFSET", "FETCH", "WINDOW", "ROWS",
                        "RANGE", "GROUPS",
                        "UNION", "EXCEPT", "INTERSECT", "MINUS",
                    ):
                        end_j = j
                        break
                    items[-1].append((j, depth))
                for item in items:
                    if not item:
                        continue
                    ups = [
                        toks[j][1].upper()
                        for j, d in item
                        if d == 0 and toks[j][0] == "ident"
                    ]
                    if "NULLS" in ups:
                        continue  # explicit placement — faithful as-is
                    desc = False
                    for j, d in reversed(item):
                        if d == 0 and toks[j][0] == "ident" and \
                                toks[j][1].upper() in ("ASC", "DESC"):
                            desc = toks[j][1].upper() == "DESC"
                            break
                    last_end = toks[item[-1][0]][3]
                    if any(e[1] >= toks[item[0][0]][2] and e[0] <= last_end
                           for e in edits):
                        continue  # pending rewrites — next pass
                    if read in ("duckdb", "clickhouse"):
                        kw_n = " NULLS LAST"
                    else:
                        kw_n = " NULLS FIRST" if desc else " NULLS LAST"
                    edits.append((last_end, last_end, kw_n))
            i += 2
            continue

        # Postgres SELECT DISTINCT ON (k, ...) — keep the FIRST row per
        # key group under the statement's ORDER BY (pg requires the
        # ORDER BY to start with the ON expressions). Spark has no
        # DISTINCT ON; rewrite QUALIFY-style to a ROW_NUMBER window:
        #   SELECT * EXCEPT (__don) FROM (
        #     SELECT <list>, ROW_NUMBER() OVER (PARTITION BY <on>
        #       ORDER BY <full order list>) AS __don FROM ...
        #   ) WHERE __don = 1 ORDER BY <on>
        # The outer ORDER BY needs only the ON prefix: the result has
        # ONE row per distinct prefix, so the tail (which picked the
        # row) cannot affect result order — and it may reference
        # non-selected columns that the outer scope lacks.
        if (
            read == "postgres"
            and kind == "ident"
            and text.upper() == "DISTINCT"
            and i > 0
            and toks[i - 1][0] == "ident"
            and toks[i - 1][1].upper() == "SELECT"
            and i + 1 < n
            and toks[i + 1][0] == "ident"
            and toks[i + 1][1].upper() == "ON"
            and is_op(i + 2, "(")
        ):
            on_spans, on_close = _call_arg_spans(toks, i + 2)
            on_text = sql[toks[i + 2][3]: toks[on_close][2]].strip()
            # a set operation BEFORE this SELECT (same depth) means any
            # trailing ORDER BY is UNION-scoped, not this SELECT's own
            # — pg then picks an arbitrary row per group (loud below),
            # and claiming the union's ORDER BY would both mis-order
            # the union and fabricate a deterministic pick
            depth = 0
            in_set_op_tail = False
            for j in range(i - 2, -1, -1):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ == ")":
                    depth += 1
                elif k_ == "op" and t_ == "(":
                    depth -= 1
                    if depth < 0:
                        break
                elif depth == 0 and k_ == "ident" and t_.upper() in (
                    "UNION", "EXCEPT", "INTERSECT", "MINUS"
                ):
                    in_set_op_tail = True
                    break
            # matching FROM of this SELECT (forward, same depth)
            depth = 0
            from_idx = None
            for j in range(on_close + 1, n):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                    if depth < 0:
                        break
                elif depth == 0 and k_ == "ident" and t_.upper() == "FROM":
                    from_idx = j
                    break
            if from_idx is None:
                raise TranspileError("DISTINCT ON in a SELECT without FROM")
            # the ORDER BY of this SELECT (same depth, after FROM)
            depth = 0
            ord_idx = None
            for j in range(from_idx + 1, n):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                    if depth < 0:
                        break
                elif depth == 0 and k_ == "ident" and t_.upper() == "ORDER":
                    ord_idx = j
                    break
                elif depth == 0 and (
                    (k_ == "ident" and t_.upper() in (
                        "UNION", "EXCEPT", "INTERSECT", "MINUS", "LIMIT",
                        "OFFSET", "FETCH"))
                    or (k_ == "op" and t_ == ";")
                ):
                    break
            if ord_idx is None or in_set_op_tail:
                raise TranspileError(
                    "DISTINCT ON without its own ORDER BY (a trailing "
                    "ORDER BY after a set operation is UNION-scoped) "
                    "picks an arbitrary row per group in postgres — "
                    "give the DISTINCT ON select an ORDER BY starting "
                    "with the ON expressions (e.g. in a subquery) to "
                    "make the pick deterministic"
                )
            # order-list span: from ORDER to the next same-depth
            # terminator (LIMIT/OFFSET/FETCH/set-op/close/;)
            depth = 0
            ord_end = n
            for j in range(ord_idx + 2, n):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                    if depth < 0:
                        ord_end = j
                        break
                elif depth == 0 and (
                    (k_ == "ident" and t_.upper() in (
                        "LIMIT", "OFFSET", "FETCH",
                        "UNION", "EXCEPT", "INTERSECT", "MINUS"))
                    or (k_ == "op" and t_ == ";")
                ):
                    ord_end = j
                    break
            # defer BEFORE the recursive transpiles below (they are
            # full fixpoint runs — wasted work on a deferred pass)
            if any(e[1] >= toks[i - 1][2] and e[0] <= toks[ord_end - 1][3]
                   for e in edits):
                i += 1
                continue
            order_list = transpile(
                sql[toks[ord_idx + 2][2]: toks[ord_end - 1][3]], read
            )
            on_conv = transpile(on_text, read)
            d_col = "__sqlmesh_distinct_on__"
            # the ON expressions may not be in the select list (pg
            # allows ordering by non-selected columns); project them as
            # hidden aliases so the outer ORDER BY always resolves, and
            # EXCEPT them away. pg requires the ORDER BY to start with
            # the ON expressions, so item k's trailing direction
            # keywords (ASC/DESC/NULLS FIRST/LAST) carry to alias k.
            on_items = [
                transpile(sql[toks[s_][2]: toks[e_][3]], read)
                for s_, e_ in on_spans
            ]
            # first len(on) ORDER BY items' trailing direction keywords
            dirs: list[str] = []
            depth_o = 0
            item_toks: list[list[int]] = [[]]
            for j in range(ord_idx + 2, ord_end):
                k_, t_ = toks[j][0], toks[j][1]
                if k_ == "op" and t_ == "(":
                    depth_o += 1
                elif k_ == "op" and t_ == ")":
                    depth_o -= 1
                if depth_o == 0 and k_ == "op" and t_ == ",":
                    item_toks.append([])
                else:
                    item_toks[-1].append(j)
            for item in item_toks[: len(on_items)]:
                tail: list[str] = []
                for j in reversed(item):
                    if toks[j][0] == "ident" and toks[j][1].upper() in (
                        "ASC", "DESC", "NULLS", "FIRST", "LAST"
                    ):
                        tail.insert(0, toks[j][1].upper())
                    else:
                        break
                dirs.append((" " + " ".join(tail)) if tail else "")
            while len(dirs) < len(on_items):
                dirs.append("")
            hidden = [
                f"__sqlmesh_don_p{k}__" for k in range(len(on_items))
            ]
            hidden_sel = "".join(
                f", ({e_}) AS {h}" for e_, h in zip(on_items, hidden)
            )
            outer_ord = ", ".join(
                f"{h}{d}" for h, d in zip(hidden, dirs)
            )
            edits.append(
                (toks[i - 1][2], toks[i - 1][2],
                 f"SELECT * EXCEPT ({d_col}, {', '.join(hidden)}) FROM (")
            )
            # drop `DISTINCT ON (...)` from the select list
            edits.append((start, toks[on_close][3], ""))
            edits.append(
                (toks[from_idx][2], toks[from_idx][2],
                 f"{hidden_sel}, ROW_NUMBER() OVER (PARTITION BY {on_conv} "
                 f"ORDER BY {order_list}) AS {d_col} ")
            )
            # close the subquery where the ORDER BY clause began; the
            # outer orders by the hidden ON prefix only (one row per
            # distinct prefix — the tail cannot affect result order).
            # The clause's replacement text was transpiled separately
            # above — mark the span DEAD so no later handler edits
            # inside the wholesale replacement (overlap corrupts).
            edits.append(
                (toks[ord_idx][2], toks[ord_end - 1][3],
                 f") WHERE {d_col} = 1 ORDER BY {outer_ord}")
            )
            dead_zones.append((toks[ord_idx][2], toks[ord_end - 1][3]))
            i = on_close + 1
            continue

        # Postgres TABLESAMPLE SYSTEM/BERNOULLI (n) → Spark
        # TABLESAMPLE (n PERCENT). Both sample ~n% of rows (SYSTEM is
        # page-level, BERNOULLI row-level; Spark's is split-level —
        # the statistical contract, a ~n% sample, carries over).
        # REPEATABLE has no Spark form — loud.
        if (
            read == "postgres"
            and kind == "ident"
            and text.upper() in ("SYSTEM", "BERNOULLI")
            and i > 0
            and toks[i - 1][0] == "ident"
            and toks[i - 1][1].upper() == "TABLESAMPLE"
            and is_op(i + 1, "(")
        ):
            spans_s, close_s = _call_arg_spans(toks, i + 1)
            if (
                close_s + 1 < n
                and toks[close_s + 1][0] == "ident"
                and toks[close_s + 1][1].upper() == "REPEATABLE"
            ):
                raise TranspileError(
                    "TABLESAMPLE ... REPEATABLE(seed) has no Spark form"
                )
            if len(spans_s) == 1:
                pct = sql[toks[spans_s[0][0]][2]: toks[spans_s[0][1]][3]]
                edits.append(
                    (start, toks[close_s][3], f"({pct} PERCENT)")
                )
                i = close_s + 1
                continue
            i += 1
            continue

        # Postgres SIMILAR TO: SQL wildcards (% _) over a regex-like
        # grammar where . ^ $ are LITERAL characters and the match is
        # ANCHORED. Literal patterns convert: % → .*, _ → ., literal
        # . ^ $ escaped, everything else (| * + ? {} () [] \) already
        # means the same in Java regex; emitted as RLIKE '^(?:..)$'
        # (a preceding NOT keeps working: NOT RLIKE). Non-literal
        # patterns and ESCAPE clauses are loud.
        if (
            read == "postgres"
            and kind == "ident"
            and text.upper() == "SIMILAR"
            and i + 1 < n
            and toks[i + 1][0] == "ident"
            and toks[i + 1][1].upper() == "TO"
        ):
            pi = i + 2
            if not (pi < n and toks[pi][0] == "string"):
                raise TranspileError(
                    "SIMILAR TO needs a literal pattern to transpile"
                )
            if (
                pi + 1 < n
                and toks[pi + 1][0] == "ident"
                and toks[pi + 1][1].upper() == "ESCAPE"
            ):
                raise TranspileError(
                    "SIMILAR TO ... ESCAPE has no Spark rewrite"
                )
            pat = _literal_content(toks[pi][1], read)
            conv = []
            esc = False
            for c in pat:
                if esc:
                    conv.append("\\" + c)
                    esc = False
                elif c == "\\":
                    esc = True
                elif c == "%":
                    conv.append(".*")
                elif c == "_":
                    conv.append(".")
                elif c in ".^$":
                    conv.append("\\" + c)
                else:
                    conv.append(c)
            rx = "^(?:" + "".join(conv) + ")$"
            edits.append((start, toks[i + 1][3], "RLIKE"))
            edits.append(
                (toks[pi][2], toks[pi][3], _spark_string_literal(rx, read))
            )
            i = pi + 1
            continue

        # Postgres quantified comparisons: x = ANY(arr) → membership
        # (array_contains), x = ALL(arr) → forall with an equality
        # lambda (both keep SQL three-valued NULL semantics: Spark
        # array_contains/forall return NULL when undetermined, matching
        # pg). Only `=` rewrites; other comparison quantifiers pass
        # through to a loud Spark analysis error. SUBQUERY operands
        # (x = ANY(SELECT ...)) keep their Spark meaning (= ANY over a
        # subquery is valid Spark) — only array-typed operands need the
        # rewrite, and a subquery's SELECT keyword marks the difference.
        if (
            read == "postgres"
            and kind == "ident"
            and text.upper() in ("ANY", "ALL")
            and is_op(i + 1, "(")
            and i >= 2
            and toks[i - 1][0] == "op"
            and toks[i - 1][1] == "="
            and not (
                i + 2 < n
                and toks[i + 2][0] == "ident"
                and toks[i + 2][1].upper() == "SELECT"
            )
        ):
            lfirst = _backward_primary(toks, i - 2, include_unary=True)
            spans_q, close_q = _call_arg_spans(toks, i + 1)
            if lfirst is None or len(spans_q) != 1:
                raise TranspileError(
                    f"postgres = {text.upper()}(...) needs a "
                    "recognizable left operand to rewrite"
                )
            # the primary must BE the whole left operand of `=`: a
            # tighter-binding operator before it (|| + - * / etc.)
            # means the real LHS is a larger expression and a
            # primary-level splice would rewrite the wrong operand
            if not (
                lfirst == 0
                or (toks[lfirst - 1][0] == "op"
                    and toks[lfirst - 1][1] in ("(", ",", "["))
                or (toks[lfirst - 1][0] in _NAME_KINDS
                    and toks[lfirst - 1][1].upper()
                    in _NONCALLABLE_KEYWORDS)
            ):
                raise TranspileError(
                    f"postgres = {text.upper()}(...) with an operator "
                    "chain on the left has no scoped one-pass rewrite; "
                    "parenthesize the left operand"
                )
            ls = toks[lfirst][2]
            arr_text = _arg_text(spans_q[0])
            lhs_text = sql[ls: toks[i - 2][3]]
            if not any(e[1] >= ls and e[0] <= toks[close_q][3] for e in edits):
                if text.upper() == "ANY":
                    rewritten = f"array_contains(({arr_text}), ({lhs_text}))"
                else:
                    rewritten = (
                        f"forall(({arr_text}), _e -> _e = ({lhs_text}))"
                    )
                edits.append((ls, toks[close_q][3], rewritten))
                i = close_q + 1
                continue
            i += 1
            continue

        # Postgres (a, b) OVERLAPS (c, d) — interval-overlap predicate
        # with endpoint normalization and point-interval edge semantics;
        # no Spark spelling and the four operands would each need
        # least/greatest duplication — LOUD with the manual form.
        if (
            read == "postgres"
            and kind == "ident"
            and text.upper() == "OVERLAPS"
            and i > 0
            and toks[i - 1][0] == "op"
            and toks[i - 1][1] == ")"
        ):
            raise TranspileError(
                "(start1, end1) OVERLAPS (start2, end2) has no Spark "
                "spelling; write s1 < e2 AND s2 < e1 (with the "
                "endpoints ordered)"
            )

        # Postgres COLLATE "name" — collation-dependent comparison
        # semantics have no faithful Spark rewrite (Spark's collation
        # names and defaults differ); silent pass-through would change
        # comparison results. LOUD.
        if (
            read == "postgres"
            and kind == "ident"
            and text.upper() == "COLLATE"
            and i + 1 < n
            and toks[i + 1][0] in ("dquote", "string", "ident")
        ):
            raise TranspileError(
                "postgres COLLATE has no Spark rewrite (collation "
                "names/semantics differ); drop the clause or compare "
                "via upper()/lower()"
            )

        # Postgres DATE - DATE returns INTEGER days; Spark date
        # subtraction returns an INTERVAL. Only the literal shape
        # DATE '..' - DATE '..' is statically provable → datediff
        # (Spark datediff(end, start) = end - start in days). Typed
        # column subtraction passes through: the INTERVAL result type
        # breaks downstream integer arithmetic loudly, never silently.
        if (
            read == "postgres"
            and kind == "op"
            and text == "-"
            and i >= 2
            and toks[i - 1][0] == "string"
            and toks[i - 2][0] == "ident"
            and toks[i - 2][1].upper() == "DATE"
            and i + 2 < n
            and toks[i + 1][0] == "ident"
            and toks[i + 1][1].upper() == "DATE"
            and toks[i + 2][0] == "string"
        ):
            ls = toks[i - 2][2]
            re_ = toks[i + 2][3]
            if not any(e[1] >= ls and e[0] <= re_ for e in edits):
                edits.append((ls, ls, "datediff("))
                edits.append((start, end, ","))
                edits.append((re_, re_, ")"))
                i += 3
                continue
            i += 1
            continue

        # Postgres regex-match operators: a ~ p (partial match) → RLIKE,
        # ~* → RLIKE with an inline (?i), !~ / !~* → NOT RLIKE, and the
        # LIKE spellings ~~ / !~~ → LIKE / NOT LIKE. Spark RLIKE is also
        # a partial (unanchored) match, and its precedence band (the
        # LIKE predicates) matches pg's. Regex FLAVOR divergence (POSIX
        # ARE vs Java) is documented: anchors, alternation,
        # quantifiers — the common surface — agree; POSIX [:class:]
        # bracket elements CONVERT in literal patterns (Java reads the
        # class name as literal characters — a silent flip, see
        # convert_posix_classes), and non-literal patterns carrying
        # them still ship through unconverted (runtime-silent; only
        # literals are statically visible). Infix
        # reading requires the previous token to END an expression —
        # `SELECT ~ 5` stays Spark's unary bitwise NOT (same operator
        # in pg).
        if (
            read == "postgres"
            and kind == "op"
            and text in ("~", "!")
            and i > 0
            and (
                toks[i - 1][0] in ("number", "string", "dquote")
                or (toks[i - 1][0] == "op" and toks[i - 1][1] in (")", "]"))
                or (toks[i - 1][0] in _NAME_KINDS
                    and (toks[i - 1][1].upper() == "END"
                         or toks[i - 1][1].upper()
                         not in _NONCALLABLE_KEYWORDS))
            )
        ):
            neg = text == "!"
            ti = i + 1 if neg else i
            ok = not neg or (
                ti < n and toks[ti][0] == "op" and toks[ti][1] == "~"
                and toks[ti][2] == end
            )
            if ok:
                # ~~ (LIKE spelling): second adjacent ~
                like_form = (
                    ti + 1 < n
                    and toks[ti + 1][0] == "op" and toks[ti + 1][1] == "~"
                    and toks[ti + 1][2] == toks[ti][3]
                )
                li = ti + 1 if like_form else ti
                ci = (
                    li + 1 < n
                    and toks[li + 1][0] == "op" and toks[li + 1][1] == "*"
                    and toks[li + 1][2] == toks[li][3]
                )
                op_last = li + 1 if ci else li
                rhs_idx = op_last + 1
                if like_form:
                    # ~~* / !~~* are pg's ILIKE spellings — Spark has
                    # ILIKE natively, no pattern rewrite needed
                    base_kw = "ILIKE" if ci else "LIKE"
                    kw = f" NOT {base_kw} " if neg else f" {base_kw} "
                    ci = False  # no (?i) injection for LIKE patterns
                else:
                    kw = " NOT RLIKE " if neg else " RLIKE "
                rspan = _forward_primary(toks, rhs_idx)
                if rspan is None:
                    raise TranspileError(
                        f"postgres {'!' if neg else ''}~"
                        f"{'*' if ci else ''} needs a recognizable "
                        "right-hand pattern operand"
                    )
                rs, re_ = toks[rspan[0]][2], toks[rspan[1]][3]
                if any(e[1] >= start and e[0] <= re_ for e in edits):
                    i += 1  # pending rewrites — resolve next pass
                    continue
                edits.append((start, toks[op_last][3], kw))
                is_lit = (
                    rspan[0] == rspan[1] and toks[rspan[0]][0] == "string"
                )
                if is_lit and not like_form:
                    # POSIX [:class:] elements convert (Java would read
                    # the class NAME as literal characters — silent
                    # flip); (?i) folds into the same re-emission
                    pat = convert_posix_classes(
                        _literal_content(toks[rspan[0]][1], read)
                    )
                    if ci:
                        pat = "(?i)" + pat
                    edits.append(
                        (rs, re_, _spark_string_literal(pat, read))
                    )
                elif ci:
                    # `||`, not concat(): the pg concat() handler
                    # would re-rewrite the emission on a later pass
                    # (fixpoint break); pg and Spark || agree
                    # (NULL-propagating string concat)
                    edits.append((rs, rs, "('(?i)' || "))
                    edits.append((re_, re_, ")"))
                i = rhs_idx
                continue
            i += 1
            continue

        # Postgres `#` bitwise XOR. Spark's XOR operator is `^`, but a
        # pg-read emission of `^` would be re-read as POWER on the next
        # fixpoint pass — emit the single-evaluation and/or/not
        # composition over a struct binding instead (the substr-handler
        # pattern). Only provably-scoped operand shapes rewrite: `#`
        # binds LOOSER than + - * / in pg ("any other operator"), so a
        # neighboring arithmetic operator would make the primary-level
        # scoping silently wrong — loud there.
        if read == "postgres" and kind == "op" and text == "#":
            lfirst = (
                _backward_primary(toks, i - 1, include_unary=True)
                if i > 0 else None
            )
            rspan = _forward_primary(toks, i + 1)
            prev_ok = lfirst is not None and (
                lfirst == 0
                or (toks[lfirst - 1][0] == "op"
                    and toks[lfirst - 1][1] in ("(", ",", "=", "<", ">",
                                                 "<=", ">=", "<>", "!="))
                or (toks[lfirst - 1][0] in _NAME_KINDS
                    and toks[lfirst - 1][1].upper()
                    in _NONCALLABLE_KEYWORDS)
            )
            nxt_j = rspan[1] + 1 if rspan is not None else n
            next_ok = rspan is not None and (
                nxt_j >= n
                or (toks[nxt_j][0] == "op"
                    and toks[nxt_j][1] in (")", ",", ";", "=", "<", ">",
                                            "<=", ">=", "<>", "!="))
                or (toks[nxt_j][0] in _NAME_KINDS
                    and toks[nxt_j][1].upper() in _NONCALLABLE_KEYWORDS)
            )
            if not (prev_ok and next_ok):
                raise TranspileError(
                    "postgres # (bitwise XOR) binds looser than "
                    "arithmetic and this operand shape has no scoped "
                    "one-pass rewrite; parenthesize both operands or "
                    "the whole # expression"
                )
            ls = toks[lfirst][2]
            re_ = toks[rspan[1]][3]
            if any(e[1] >= ls and e[0] <= re_ for e in edits):
                i += 1
                continue
            edits.append((ls, ls, "element_at(transform(array(struct(("))
            edits.append((start, end, ") AS _x, ("))
            edits.append(
                (re_, re_,
                 ") AS _y)), _t -> (_t._x | _t._y) & ~ (_t._x & _t._y)), 1)")
            )
            i = rspan[1] + 1
            continue

        # Postgres jsonb path extraction: j #>> '{a,b}' (text at path) →
        # get_json_object with the combined bracket JsonPath — exact for
        # scalars, same text-form caveats as ->> (documented there).
        # All-digit segments are loud (array index on arrays, key on
        # objects — the ->>/pointer polymorphism). `#>` is loud like
        # terminal -> (JSON-typed result quotes string scalars), and an
        # arrow chained onto #>> text is a pg type error — loud.
        if read == "postgres" and kind == "op" and text in ("#>", "#>>"):
            if text == "#>":
                raise TranspileError(
                    "postgres #> returns the JSON-typed value, whose "
                    "text form differs from get_json_object for string "
                    "scalars; use #>> (text at path)"
                )
            if not (i + 1 < n and toks[i + 1][0] == "string"):
                i += 1  # non-literal path — loud at Spark render
                continue
            lfirst = (
                _backward_primary(toks, i - 1, include_unary=False)
                if i > 0 else None
            )
            if lfirst is None or _in_lambda_hof(toks, lfirst):
                i += 1
                continue
            if (
                lfirst > 0
                and toks[lfirst - 1][0] == "op"
                and (
                    toks[lfirst - 1][1] in ("->", "#>", "#>>")
                    or (
                        toks[lfirst - 1][1] == ">"
                        and lfirst >= 2
                        and toks[lfirst - 2][0] == "op"
                        and toks[lfirst - 2][1] == "->"
                        and toks[lfirst - 2][3] == toks[lfirst - 1][2]
                    )
                )
            ):
                i += 1  # LHS is a preceding JSON operator's RHS
                continue
            raw = _literal_content(toks[i + 1][1], read)
            inner = raw.strip()
            if not (inner.startswith("{") and inner.endswith("}")):
                raise TranspileError(
                    "postgres #>> takes a text[] path literal like "
                    "'{a,b}'"
                )
            segs = [s.strip() for s in inner[1:-1].split(",")] \
                if inner[1:-1].strip() else []
            if not segs:
                raise TranspileError(
                    "postgres #>> '{}' returns the whole document as "
                    "text, whose form differs from Spark's — extract a "
                    "concrete path"
                )
            if any(not s or any(c in s for c in "'\"[]{}") for s in segs):
                raise TranspileError(
                    "postgres #>> path segments with quotes/brackets "
                    "have no Spark JsonPath form"
                )
            if any(s.isdigit() for s in segs):
                raise TranspileError(
                    "postgres #>> digit segments are array indexes on "
                    "arrays but keys on objects — statically ambiguous "
                    "in Spark's JsonPath"
                )
            j2 = i + 2
            while j2 < n and is_op(j2, ")"):
                j2 += 1
            if (
                j2 < n
                and toks[j2][0] == "op"
                and toks[j2][1] in ("->", "#>", "#>>")
            ):
                raise TranspileError(
                    "#>> returns text; chaining another JSON operator "
                    "onto text is a type error in postgres"
                )
            ls = toks[lfirst][2]
            if any(e[1] >= ls and e[0] <= toks[i + 1][3] for e in edits):
                i += 1
                continue
            path = "$" + "".join(f"['{s}']" for s in segs)
            edits.append((ls, ls, "get_json_object("))
            edits.append(
                (start, toks[i + 1][3],
                 ", " + _spark_string_literal(path, read) + ")")
            )
            i += 2
            continue

        # DuckDB LIKE/ILIKE have NO default escape character; Spark's is
        # backslash. A literal pattern containing backslashes (plain DATA
        # in duckdb) must have them doubled at the PATTERN level so Spark
        # reads them literally; patterns with an explicit ESCAPE clause
        # keep their author-chosen semantics. (Postgres' default LIKE
        # escape IS backslash, matching Spark — no rewrite.) The emitted
        # literal is Spark-ready — the generic doubling pass skips edited
        # literals. Dynamic (non-literal) patterns can't be rewritten.
        if (
            read == "duckdb"
            and first_pass
            and kind == "string"
            and "\\" in text
            and i > 0
            and toks[i - 1][0] in _NAME_KINDS
            and toks[i - 1][1].upper() in ("LIKE", "ILIKE")
            and not (
                i + 1 < n
                and toks[i + 1][0] in _NAME_KINDS
                and toks[i + 1][1].upper() == "ESCAPE"
            )
        ):
            content = _literal_content(text, read)
            edits.append(
                (start, end,
                 _spark_string_literal(content.replace("\\", "\\\\"), read))
            )
            i += 1
            continue

        # `* EXCLUDE (...)` → `* EXCEPT (...)` (DuckDB star modifier).
        # DuckDB also allows a bare single column (`* EXCLUDE a`); Spark
        # EXCEPT requires parens, so the bare form gains them.
        if (
            kind == "ident"
            and text.upper() == "EXCLUDE"
            and i > 0
            and is_op(i - 1, "*")
        ):
            edits.append((start, end, "EXCEPT"))
            if not is_op(i + 1, "(") and i + 1 < n and toks[i + 1][0] in _NAME_KINDS:
                j = i + 1
                while (
                    j + 2 < n
                    and toks[j + 1][0] == "op" and toks[j + 1][1] == "."
                    and toks[j + 2][0] in _NAME_KINDS
                ):
                    j += 2
                edits.append((toks[i + 1][2], toks[i + 1][2], "("))
                edits.append((toks[j][3], toks[j][3], ")"))
            i += 1
            continue

        # `::type` cast target rename; `::type[]` (Postgres array-type
        # cast) becomes `::ARRAY<type>`.
        if kind == "op" and text == "::" and i + 1 < n and toks[i + 1][0] == "ident":
            vc = _maybe_varchar_truncate(toks, i, read, edits, cast_form=False)
            if vc is not None:
                v_edits, consumed = vc
                edits.extend(v_edits)
                i += consumed
                continue
            _maybe_round_castee(
                toks, i - 1, toks[i + 1][1], read, edits, cast_form=False
            )
            type_edits, consumed = _type_token_edits(toks, i, read, is_op)
            edits.extend(type_edits)
            i += consumed
            continue

        # CAST(x AS type): rename — ONLY the type-introducing AS of a
        # CAST/TRY_CAST (the last depth-1 AS); aliases named like types,
        # even inside subqueries nested in a CAST body, stay untouched.
        if (
            kind == "ident"
            and text.upper() == "AS"
            and i in cast_as_idx
            and i + 1 < n
            and toks[i + 1][0] == "ident"
        ):
            vc = _maybe_varchar_truncate(toks, i, read, edits, cast_form=True)
            if vc is not None:
                v_edits, consumed = vc
                edits.extend(v_edits)
                i += consumed
                continue
            _maybe_round_castee(
                toks, i - 1, toks[i + 1][1], read, edits, cast_form=True
            )
            type_edits, consumed = _type_token_edits(toks, i, read, is_op)
            edits.extend(type_edits)
            i += consumed
            continue

        # QUALIFY (DuckDB/Snowflake/BigQuery window filter; Spark has no
        # equivalent clause). Rewrite the SELECT block:
        #   SELECT <list> FROM ... QUALIFY <pred> [ORDER BY ...]
        # →
        #   SELECT * EXCEPT (__sqlmesh_qualify__) FROM (
        #     SELECT <list>, (<pred>) AS __sqlmesh_qualify__ FROM ...
        #   ) WHERE __sqlmesh_qualify__ [ORDER BY ...]
        # The predicate (window exprs included — they're legal in a select
        # list) evaluates inside; the outer WHERE filters on the boolean
        # and `* EXCEPT` drops the synthetic column. ORDER BY / LIMIT
        # after QUALIFY land in the OUTER query, preserving their scope.
        if (
            kind == "ident"
            and text.upper() == "QUALIFY"
            and read in ("duckdb", "snowflake", "bigquery", "redshift")
        ):
            # locate the owning SELECT (nearest, scanning back at depth 0)
            depth = 0
            sel_idx = None
            for j in range(i - 1, -1, -1):
                k_, t_, _, _ = toks[j]
                if k_ == "op" and t_ == ")":
                    depth += 1
                elif k_ == "op" and t_ == "(":
                    depth -= 1
                    if depth < 0:
                        break
                elif depth == 0 and k_ == "ident" and t_.upper() == "SELECT":
                    sel_idx = j
                    break
            if sel_idx is None:
                raise TranspileError("QUALIFY without an owning SELECT")
            if toks[sel_idx + 1][0] == "ident" and toks[sel_idx + 1][1].upper() == "DISTINCT":
                # Snowflake applies QUALIFY BEFORE DISTINCT; injecting the
                # predicate column would change the distinct key set.
                raise TranspileError(
                    "QUALIFY with SELECT DISTINCT has no faithful Spark "
                    "rewrite; deduplicate in an outer query instead"
                )
            # matching FROM of that SELECT (forward, same depth)
            depth = 0
            from_idx = None
            for j in range(sel_idx + 1, i):
                k_, t_, _, _ = toks[j]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                elif depth == 0 and k_ == "ident" and t_.upper() == "FROM":
                    from_idx = j
                    break
            if from_idx is None:
                raise TranspileError("QUALIFY in a SELECT without FROM")
            # predicate span: from after QUALIFY to the next same-depth
            # terminator (ORDER/LIMIT/OFFSET/FETCH/WINDOW/set-op/;/close)
            terminators = {
                "ORDER", "LIMIT", "OFFSET", "FETCH", "WINDOW",
                "UNION", "EXCEPT", "INTERSECT", "MINUS",
            }
            depth = 0
            bdepth = 0  # [...] nesting — OFFSET/ORDER-class idents inside
            # a subscript are not clause terminators
            pred_end_tok = len(toks)
            for j in range(i + 1, len(toks)):
                k_, t_, _, _ = toks[j]
                if k_ == "op" and t_ == "(":
                    depth += 1
                elif k_ == "op" and t_ == ")":
                    depth -= 1
                    if depth < 0:
                        pred_end_tok = j
                        break
                elif k_ == "op" and t_ == "[":
                    bdepth += 1
                elif k_ == "op" and t_ == "]":
                    bdepth -= 1
                elif depth == 0 and bdepth == 0 and (
                    (k_ == "ident" and t_.upper() in terminators)
                    or (k_ == "op" and t_ == ";")
                ):
                    pred_end_tok = j
                    break
            if pred_end_tok == i + 1:
                raise TranspileError("QUALIFY with an empty predicate")
            pred_text = transpile(
                sql[toks[i + 1][2] : toks[pred_end_tok - 1][3]], read
            )
            q_col = "__sqlmesh_qualify__"
            edits.append(
                (toks[sel_idx][2], toks[sel_idx][2],
                 f"SELECT * EXCEPT ({q_col}) FROM (")
            )
            edits.append(
                (toks[from_idx][2], toks[from_idx][2],
                 f", ({pred_text}) AS {q_col} ")
            )
            pred_span_end = toks[pred_end_tok - 1][3]
            edits.append((start, pred_span_end, f") WHERE {q_col}"))
            # Skip the consumed predicate tokens — their spans are inside
            # the replacement; the COPY in the select list transpiles on
            # later fixpoint passes (plain renames; first-pass-only
            # literal handlers inside a QUALIFY predicate fail loudly at
            # execution rather than silently).
            i = pred_end_tok
            continue

        if kind == "ident" and is_op(i + 1, "("):
            name = text.lower()

            # Dotted call: `schema.fn(...)` is a qualified UDF whose LAST
            # segment must not be renamed by the builtin maps (renaming
            # s.epoch() to s.unix_timestamp() would corrupt a user UDF
            # reference). BigQuery's SAFE. prefix (NULL-on-error calls) is
            # a semantic wrapper with no Spark rewrite — LOUD.
            if i > 0 and is_op(i - 1, "."):
                if (
                    read == "bigquery"
                    and i >= 2
                    and toks[i - 2][0] == "ident"
                    and toks[i - 2][1].lower() == "safe"
                ):
                    raise TranspileError(
                        f"SAFE.{text}() has no Spark rewrite; use the "
                        "try_-prefixed function if one exists"
                    )
                i += 1
                continue

            # listagg (snowflake native, or any dialect passing it through)
            # only exists on Spark >= 4.0 — gate at render time.
            if name == "listagg":
                _require_spark4(name, "listagg")


            # ---- dialect call-handler dispatch (core/dialects/*.py) ----
            # Order preserved from the pre-split monolith: dialect
            # pre-handlers (snowflake/bigquery/redshift/mysql/oracle/
            # tsql), then the multi-dialect standard handlers, then the
            # post-handlers (clickhouse/trino), then the plain renames.
            ctx.i, ctx.kind, ctx.text = i, kind, text
            ctx.start, ctx.end, ctx.name = start, end, name
            _pre = _PRE_CALL_HANDLERS.get(read)
            if _pre is not None:
                nxt = _pre(ctx)
                if nxt is not None:
                    i = nxt
                    continue
            nxt = _d_standard.call_handlers(ctx)
            if nxt is not None:
                i = nxt
                continue
            _post = _POST_CALL_HANDLERS.get(read)
            if _post is not None:
                nxt = _post(ctx)
                if nxt is not None:
                    i = nxt
                    continue

            # ---- plain renames
            if name in fn_map:
                target = fn_map[name]
                if target is None:
                    raise TranspileError(
                        f"function {name}() has no direct Spark equivalent"
                    )
                _require_spark4(name, target)
                edits.append((start, end, target))
            i += 1
            continue

        # Double-quoted IDENTIFIERS (standard SQL + Snowflake): Spark's
        # default parser reads "MyCol" as a STRING LITERAL, silently
        # substituting the constant for the column — rewrite to backticks.
        # (BigQuery never reaches here: its dquote tokens are re-kinded
        # to strings by the tokenizer, which matches Spark's reading.)
        if kind == "dquote":
            inner = text[1:-1].replace('""', '"')
            edits.append((start, end, "`" + inner.replace("`", "``") + "`"))
            i += 1
            continue

        # T-SQL [Name] bracket identifiers → backticks (Spark would read
        # a subscript expression).
        if kind == "brident":
            inner = text[1:-1].replace("]]", "]")
            edits.append((start, end, "`" + inner.replace("`", "``") + "`"))
            i += 1
            continue

        # BigQuery quotes whole dotted paths in ONE backtick span
        # (`project.dataset.table`); Spark would read that as a single
        # identifier whose name contains dots. Split into per-part quoting.
        if kind == "bquote" and read == "bigquery" and "." in text:
            inner = text[1:-1]
            if "`" not in inner.replace("``", ""):
                parts = inner.split(".")
                edits.append(
                    (start, end, ".".join(f"`{p}`" for p in parts))
                )
            i += 1
            continue

        i += 1

    # Literal-semantics pass: DuckDB/Postgres string literals are standard
    # SQL (backslash is an ordinary character); Spark's default parser
    # processes C-style escapes ('a\b' is 'a'+backspace). Double every
    # backslash in untouched literals so content survives byte-identical.
    # Literals a special handler already rewrote (regex separators,
    # converted formats) are skipped — those were emitted Spark-ready.
    # FIRST PASS ONLY: all literal-deriving handlers complete in pass 1;
    # later fixpoint passes (deferred subscripts) must not re-double.
    if first_pass and read in _STD_LITERAL_DIALECTS:
        for kind, text, start, end in toks:
            if (
                kind == "string"
                and "\\" in text
                and not any(e_start < end and start < e_end for e_start, e_end, _ in edits)
            ):
                edits.append((start, end, text.replace("\\", "\\\\")))

    # Snowflake/BigQuery literals also use backslash escapes, but the
    # escape TABLES differ from Spark's (\f, \xhh, \a, \v, \ooo... have no
    # Spark decoding — Spark drops the backslash, silently yielding 'x41'
    # from '\x41'). Untouched literals containing a backslash are decoded
    # per the READ dialect and re-emitted in Spark-safe form; common regex
    # escapes (\\d) round-trip byte-identical. Invalid bigquery escapes
    # raise here — faithful, since BigQuery itself rejects them.
    if first_pass and read in ESCAPE_LITERAL_DIALECTS:
        for kind, text, start, end in toks:
            # Triple-quoted bigquery literals re-encode even WITHOUT a
            # backslash — Spark has no triple-quoted form at all (it
            # would parse the trailing '' as an adjacent empty literal /
            # alias, silently corrupting results).
            needs_reencode = "\\" in text or (
                read == "bigquery" and text[:3] in ("'''", '"""')
            ) or (
                # mysql double-quoted STRINGS re-emit single-quoted: Spark
                # reads "..." as a literal too, but its handling of the
                # mysql ("")-doubling differs — re-encoding removes the
                # ambiguity entirely.
                read == "mysql" and text[0] == '"'
            )
            if (
                kind == "string"
                and needs_reencode
                and not any(e_start < end and start < e_end for e_start, e_end, _ in edits)
            ):
                lit = _spark_string_literal(_literal_content(text, read), read)
                if lit != text:
                    edits.append((start, end, lit))

    if not edits:
        return sql
    out = sql
    # Right-to-left by start; at EQUAL start the consuming replacement
    # (larger end) must apply before a zero-width insert, else the insert's
    # text lands inside the span the replacement then deletes (e.g. the
    # date_trunc wrapper inserted at now()'s start, or substr( prefixed to
    # a backslash literal that the doubling pass also replaces).
    for start, end, rep in sorted(edits, key=lambda e: (-e[0], -e[1])):
        out = out[:start] + rep + out[end:]
    return out
