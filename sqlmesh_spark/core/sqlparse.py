"""Tokenizer + scope-walking SQL analyzer for depends_on extraction and
column-level lineage.

The reference resolves both through a real parser: ``find_tables``
(sqlmesh/core/dialect.py:1270) walks the SQLGlot AST collecting
``exp.Table`` nodes minus CTE names, and column lineage
(sqlmesh/core/lineage.py:1-114) builds optimizer scopes
(``build_scope``/``qualify``) and walks them. sqlglot isn't available in
this sandbox, so this module implements the same *semantics* directly:

- a proper tokenizer (strings, quoted identifiers, comments, numbers,
  ``@macro`` tokens) so table names inside string literals or comments are
  never mistaken for references;
- a recursive-descent structural parse of the query shape (WITH / SELECT /
  FROM / JOIN / LATERAL VIEW / set operations / subqueries) producing a
  scope tree;
- lexical CTE scoping with shadowing: a CTE named like an upstream model
  hides that model for the remainder of its WITH statement, including
  nested subqueries, exactly like SQLGlot scope resolution — and inner
  WITH clauses shadow outer ones;
- alias resolution per scope, so repeated aliases in sibling subqueries
  (``(...) a JOIN (...) a``) resolve to their own scope's relation, and
  correlated references chase the scope chain outward;
- projection lineage through derived tables: resolving ``alias.col``
  where ``alias`` is a subquery or CTE recursively flattens to external
  ``(table, column)`` pairs, with ``SELECT *`` expanding derived output
  columns and passing externals through as ``(table, '*')``.

Anything unparseable (macro-heavy text, partial statements) raises
``SqlParseError``; callers fall back to the conservative regex scan, so
behavior degrades to the previous implementation instead of breaking.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional


class SqlParseError(ValueError):
    pass

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<line_comment>--[^\n]*)
  | (?P<block_comment>/\*.*?\*/)
  | (?P<string>'(?:[^']|'')*')
  | (?P<dquote>"(?:[^"]|"")*")
  | (?P<bquote>`(?:[^`]|``)*`)
  | (?P<number>0[xX][0-9a-fA-F]+|\d+(?:\.\d+)?(?:[eE][+-]?\d+)?[LlSsYyDdFf]?)
  | (?P<macro>@\{?[A-Za-z_][A-Za-z0-9_]*\}?)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=>|<>|!=|<=|>=|\|\||->|::|[(),.;*=<>+\-/%^&|\[\]{}?:!~])
    """,
    re.VERBOSE | re.DOTALL,
)


#: dialects whose string literals use backslash escapes ('O\'Brien'),
#: which the standard-SQL grammar above would mis-lex (the literal would
#: end at the escaped quote). Spark's own default parser also processes
#: backslash escapes, so text in these dialects stays lexable end-to-end.
#: Redshift inherits PostgreSQL 8.0's escape-on literals (its
#: standard_conforming_strings default is off — the famous "nonstandard
#: use of \\ in a string literal" warning); MySQL and ClickHouse literals
#: always backslash-escape.
ESCAPE_LITERAL_DIALECTS = ("snowflake", "bigquery", "redshift", "mysql", "clickhouse")

#: alias dialects normalized before ANY dialect-keyed decision — grammar
#: selection here as well as core/transpile.py's function/type tables.
#: Living at the lexing seam matters: depends_on / lineage / fingerprints
#: / the formatter all lex raw model text, and a model declaring
#: `dialect mssql` must select the T-SQL bracket grammar, not fall to a
#: SqlParseError + lossy regex scan. Presto and Athena (engine v3) ARE
#: Trino's grammar (ref engine_adapter/athena.py builds on trino.py);
#: RisingWave and GCP Postgres speak Postgres; Fabric/MSSQL/AzureSQL are
#: T-SQL (ref fabric.py extends mssql); MotherDuck is DuckDB; Databricks
#: SQL IS Spark SQL.
DIALECT_ALIASES: dict[str, str] = {
    "presto": "trino",
    "athena": "trino",
    "risingwave": "postgres",
    "gcp_postgres": "postgres",
    "fabric": "tsql",
    "mssql": "tsql",
    "azuresql": "tsql",
    "motherduck": "duckdb",
    "databricks": "spark",
    "hive": "spark",                    # Spark SQL is the Hive-QL
                                        # superset (LATERAL VIEW,
                                        # DISTRIBUTE/CLUSTER BY, backtick
                                        # idents are all native)
}


def normalize_dialect(dialect: str) -> str:
    """Resolve an alias dialect to its grammar; unknown names unchanged."""
    return DIALECT_ALIASES.get(dialect, dialect) if dialect else dialect


def _derive_esc_pattern(triple: bool = False, hash_comments: bool = False) -> str:
    """Escape-aware grammar derived from _TOKEN_RE by exact substring
    replacement. EACH replacement is individually asserted — a reformat of
    either alternative above would otherwise no-op silently and that
    literal class would mis-lex downstream. ``triple`` additionally lexes
    BigQuery triple-quoted strings ('''...''' / \"\"\"...\"\"\") as ONE
    token — inside them a lone quote char is literal, which the
    ('')-doubling fold cannot represent (it would split the token at the
    embedded quote). Snowflake has no triple-quoted form, so its grammar
    keeps the standard fold. ``hash_comments`` additionally lexes MySQL's
    ``# ...`` line comments (the ``#`` op alternative would otherwise
    reject the rest of the line)."""
    sq3 = r"'''(?:[^'\\]|\\.|'(?!''))*'''|" if triple else ""
    dq3 = r'"""(?:[^"\\]|\\.|"(?!""))*"""|' if triple else ""
    pattern = _TOKEN_RE.pattern
    alts = [
        (r"(?P<string>'(?:[^']|'')*')",
         r"(?P<string>" + sq3 + r"'(?:[^'\\]|\\.|'')*')"),
        (r'(?P<dquote>"(?:[^"]|"")*")',
         r'(?P<dquote>' + dq3 + r'"(?:[^"\\]|\\.|"")*")'),
    ]
    if hash_comments:
        alts.append(
            (r"(?P<line_comment>--[^\n]*)",
             r"(?P<line_comment>--[^\n]*|\#[^\n]*)")
        )
    for old_alt, new_alt in alts:
        replaced = pattern.replace(old_alt, new_alt)
        if replaced == pattern:  # pragma: no cover - build-time guard
            raise AssertionError(
                f"escape-literal grammar failed to derive: alternative "
                f"{old_alt!r} not found in sqlparse._TOKEN_RE — update "
                "sqlparse._derive_esc_pattern"
            )
        pattern = replaced
    return pattern


_ESC_TOKEN_RE = re.compile(_derive_esc_pattern(), re.VERBOSE | re.DOTALL)
_BQ_TOKEN_RE = re.compile(_derive_esc_pattern(triple=True), re.VERBOSE | re.DOTALL)
_MYSQL_TOKEN_RE = re.compile(
    _derive_esc_pattern(hash_comments=True), re.VERBOSE | re.DOTALL
)


def _derive_tsql_pattern() -> str:
    """T-SQL grammar derived from the STANDARD grammar (T-SQL literals are
    standard '' doubling, no backslash escapes) plus one alternative:
    ``[Name]`` bracket-quoted identifiers (``]]`` doubles a bracket),
    placed before the number/op classes so ``[`` never lexes as an op.
    Same assert-on-derive rule as _derive_esc_pattern."""
    old_alt = r"| (?P<number>"
    new_alt = r"| (?P<brident>\[(?:[^\]]|\]\])*\])" + "\n  " + old_alt
    pattern = _TOKEN_RE.pattern
    replaced = pattern.replace(old_alt, new_alt, 1)
    if replaced == pattern:  # pragma: no cover - build-time guard
        raise AssertionError(
            "tsql bracket-identifier grammar failed to derive: number "
            "alternative not found in sqlparse._TOKEN_RE — update "
            "sqlparse._derive_tsql_pattern"
        )
    return replaced


_TSQL_TOKEN_RE = re.compile(_derive_tsql_pattern(), re.VERBOSE | re.DOTALL)


def _derive_pg_pattern() -> str:
    """Postgres grammar: the STANDARD grammar plus (a) the ``#`` operator
    family — ``#`` XOR, ``#>`` / ``#>>`` jsonb paths — which the standard
    op class rejects, and (b) ``E'...'`` escape-string literals, whose
    backslash can escape a quote INSIDE the body (``E'it\'s'``) — the
    standard literal class would mis-span at the first ``\'``. Same
    assert-on-derive rule as the other derived grammars."""
    pattern = _TOKEN_RE.pattern
    alts = [
        # ||/ (cube root) must precede || in the alternation or the
        # concat alternative swallows its first two chars; likewise
        # |/ (square root) after ||
        (r"<=|>=|\|\|",
         r"<=|>=|\|\|/|\|\||\|/"),
        # @-family: @> / <@ containment, unary @ abs; # XOR/jsonb paths
        (r"->|::|[(),.;*=<>+\-/%^&|\[\]{}?:!~]",
         r"->|::|\#>>|\#>|\^@|@>|<@|"
         r"[(),.;*=<>+\-/%^&|\[\]{}?:!~\#@]"),
        (r"(?P<string>'(?:[^']|'')*')",
         r"(?P<string>[eE]'(?:[^'\\]|\\.|'')*'|'(?:[^']|'')*')"),
    ]
    for old_alt, new_alt in alts:
        replaced = pattern.replace(old_alt, new_alt)
        if replaced == pattern:  # pragma: no cover - build-time guard
            raise AssertionError(
                "postgres grammar failed to derive: expected "
                "alternative not found in sqlparse._TOKEN_RE — update "
                "sqlparse._derive_pg_pattern"
            )
        pattern = replaced
    return pattern


_PG_TOKEN_RE = re.compile(_derive_pg_pattern(), re.VERBOSE | re.DOTALL)


def _derive_duck_pattern() -> str:
    """DuckDB grammar: the STANDARD grammar plus the ``@`` operator
    family duck 1.x grew — ``@>`` / ``<@`` list containment, ``^@``
    starts-with, unary ``@`` abs (all pinned live, round 11; the
    standard op class rejected the character outright). Same
    assert-on-derive rule as the other derived grammars."""
    pattern = _TOKEN_RE.pattern
    old_alt = r"->|::|[(),.;*=<>+\-/%^&|\[\]{}?:!~]"
    new_alt = (r"->|::|\^@|@>|<@|"
               r"[(),.;*=<>+\-/%^&|\[\]{}?:!~@]")
    replaced = pattern.replace(old_alt, new_alt)
    if replaced == pattern:  # pragma: no cover - build-time guard
        raise AssertionError(
            "duckdb grammar failed to derive: expected alternative "
            "not found in sqlparse._TOKEN_RE — update "
            "sqlparse._derive_duck_pattern"
        )
    return replaced


_DUCK_TOKEN_RE = re.compile(_derive_duck_pattern(), re.VERBOSE | re.DOTALL)


def _token_re_for(dialect: str):
    """The ONE grammar choice shared by sqlparse.tokenize and
    transpile._tokenize_spans."""
    dialect = normalize_dialect(dialect)
    if dialect == "bigquery":
        return _BQ_TOKEN_RE
    if dialect in ("mysql", "clickhouse"):
        # both: backslash-escape literals + `#` line comments
        return _MYSQL_TOKEN_RE
    if dialect == "tsql":
        return _TSQL_TOKEN_RE
    if dialect == "postgres":
        return _PG_TOKEN_RE
    if dialect == "duckdb":
        return _DUCK_TOKEN_RE
    if dialect in ESCAPE_LITERAL_DIALECTS:
        return _ESC_TOKEN_RE
    return _TOKEN_RE


@dataclass(frozen=True)
class Token:
    kind: str  # 'ident' | 'qident' | 'string' | 'number' | 'macro' | 'op'
    value: str  # normalized: idents lowercased, qidents unquoted
    upper: str  # uppercase form for keyword checks ('' for non-idents)


def tokenize(sql: str, dialect: str = "") -> list[Token]:
    """Lex ``sql``; ``dialect`` selects literal semantics: snowflake /
    bigquery / redshift / mysql literals use backslash escapes, and
    bigquery + mysql double-quoted tokens are STRINGS, not identifiers
    (matching how core/transpile.py and Spark's parser read the same
    text). Alias dialects (mssql, athena, ...) normalize first."""
    dialect = normalize_dialect(dialect)
    token_re = _token_re_for(dialect)
    out: list[Token] = []
    pos = 0
    n = len(sql)
    while pos < n:
        m = token_re.match(sql, pos)
        if not m:
            raise SqlParseError(f"unexpected character {sql[pos]!r} at offset {pos}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind in ("ws", "line_comment", "block_comment"):
            continue
        if kind == "dquote" and dialect in ("bigquery", "mysql"):
            kind = "string"
        if kind == "ident":
            out.append(Token("ident", text.lower(), text.upper()))
        elif kind == "brident":
            out.append(
                Token("qident", text[1:-1].replace("]]", "]").lower(), "")
            )
        elif kind in ("dquote", "bquote"):
            out.append(Token("qident", text[1:-1].lower(), ""))
        elif kind == "string":
            out.append(Token("string", text, ""))
        elif kind == "number":
            out.append(Token("number", text, ""))
        elif kind == "macro":
            out.append(Token("macro", text, ""))
        else:
            out.append(Token("op", text, ""))
    return out


# ---------------------------------------------------------------------------
# Scope model
# ---------------------------------------------------------------------------


@dataclass
class OutputColumn:
    name: str
    # external (table, column) sources, flattened through derived relations
    sources: set = field(default_factory=set)


@dataclass
class Relation:
    """A resolved FROM-clause entry: external table, CTE, or subquery."""

    name: str  # alias (or table name) it is known by in its scope
    external: Optional[str] = None  # full external table name, if external
    derived: Optional["Query"] = None  # parsed body, if CTE/subquery
    generated: Optional[set] = None  # lineage sources for LATERAL VIEW cols
    gen_columns: tuple = ()  # column names a LATERAL VIEW defines


@dataclass
class Query:
    """One SELECT (or a set-op chain of them) with its scope."""

    columns: list = field(default_factory=list)  # list[OutputColumn]
    tables: set = field(default_factory=set)  # external tables in subtree


class Scope:
    """Lexical scope: CTE names + FROM aliases, chained to the parent."""

    def __init__(self, parent: Optional["Scope"] = None):
        self.parent = parent
        self.ctes: dict[str, Relation] = {}
        self.relations: dict[str, Relation] = {}  # FROM/JOIN aliases
        self.ordered_relations: list[Relation] = []

    def resolve_cte(self, name: str) -> Optional[Relation]:
        s: Optional[Scope] = self
        while s is not None:
            if name in s.ctes:
                return s.ctes[name]
            s = s.parent
        return None

    def resolve_alias(self, name: str) -> Optional[Relation]:
        s: Optional[Scope] = self
        while s is not None:
            if name in s.relations:
                return s.relations[name]
            s = s.parent
        return None


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_CLAUSE_STARTERS = {
    "WHERE",
    "GROUP",
    "HAVING",
    "ORDER",
    "LIMIT",
    "WINDOW",
    "QUALIFY",
    "UNION",
    "INTERSECT",
    "EXCEPT",
    "DISTRIBUTE",
    "CLUSTER",
    "SORT",
}
_JOIN_WORDS = {"JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "SEMI", "ANTI"}

# Identifiers that are SQL syntax, not column references, inside expressions.
_EXPR_KEYWORDS = {
    "AND", "OR", "NOT", "CASE", "WHEN", "THEN", "ELSE", "END", "NULL",
    "TRUE", "FALSE", "IS", "IN", "LIKE", "RLIKE", "ILIKE", "BETWEEN",
    "EXISTS", "DISTINCT", "AS", "ASC", "DESC", "INTERVAL", "OVER",
    "PARTITION", "BY", "ROWS", "RANGE", "UNBOUNDED", "PRECEDING",
    "FOLLOWING", "CURRENT", "ROW", "IGNORE", "RESPECT", "NULLS", "FIRST",
    "LAST", "ESCAPE", "ALL", "ANY", "SOME", "FILTER", "WITHIN", "ORDER",
    "GROUP", "LIMIT", "OFFSET", "HAVING", "WHERE", "FROM", "SELECT", "ON",
    "USING", "CAST", "TRY_CAST", "DIV", "END",
    # Spark type names (CAST targets and :: casts). DuckDB/Postgres-only
    # type names live in _DIALECT_TYPE_KEYWORDS below — syntax only in
    # cast position, never shadowing same-named columns.
    "INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT", "FLOAT", "DOUBLE",
    "REAL", "DECIMAL", "NUMERIC", "STRING", "VARCHAR", "CHAR", "TEXT",
    "BOOLEAN", "DATE", "TIMESTAMP", "TIMESTAMP_NTZ", "BINARY", "ARRAY",
    "MAP", "STRUCT", "VOID", "LONG",
    # interval units
    "YEAR", "YEARS", "QUARTER", "MONTH", "MONTHS", "WEEK", "WEEKS", "DAY",
    "DAYS", "HOUR", "HOURS", "MINUTE", "MINUTES", "SECOND", "SECONDS",
    "MILLISECOND", "MICROSECOND",
    # misc function-adjacent syntax
    "SEPARATOR", "PLACING", "FOR", "BOTH", "LEADING", "TRAILING", "AT",
    "TIME", "ZONE", "GROUPING", "SETS", "ROLLUP", "CUBE", "LATERAL",
    "VIEW", "OUTER", "TABLESAMPLE", "VALUES", "WITH", "RECURSIVE",
}


# DuckDB/Postgres type names that read-dialect models carry. These are
# syntax ONLY in cast position (after `::` or a CAST body's AS) — a
# Spark-dialect column legitimately named `signed` or `blob` must still
# resolve as a column ref, so they are NOT in _EXPR_KEYWORDS.
_DIALECT_TYPE_KEYWORDS = {
    "HUGEINT", "INT128", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
    "INT1", "INT2", "INT4", "INT8", "SIGNED", "BPCHAR", "BLOB", "BYTEA",
    "FLOAT4", "FLOAT8", "TIMESTAMPTZ", "LOGICAL", "BOOL",
}


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    # -- token helpers ------------------------------------------------------
    def peek(self, offset: int = 0) -> Optional[Token]:
        j = self.i + offset
        return self.toks[j] if j < len(self.toks) else None

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "ident" and t.upper in words

    def take(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_op(self, op: str) -> None:
        t = self.peek()
        if t is None or t.kind != "op" or t.value != op:
            raise SqlParseError(f"expected {op!r} at token {self.i}: {t}")
        self.i += 1

    def expect_kw(self, word: str) -> None:
        if not self.at_kw(word):
            raise SqlParseError(f"expected {word} at token {self.i}: {self.peek()}")
        self.i += 1

    # -- entry --------------------------------------------------------------
    def parse_query(self, parent: Optional[Scope]) -> Query:
        """[WITH ...] select_core (set_op select_core)* [ORDER/LIMIT]"""
        scope = Scope(parent)
        cte_tables: set = set()
        if self.at_kw("WITH"):
            self.i += 1
            if self.at_kw("RECURSIVE"):
                self.i += 1
            while True:
                name = self._ident_name()
                cte_cols: tuple = ()
                if self._at_op("("):
                    cte_cols = self._paren_name_list()
                self.expect_kw("AS")
                self.expect_op("(")
                body = self.parse_query(scope)
                self.expect_op(")")
                if cte_cols:
                    for col, out in zip(cte_cols, body.columns):
                        out.name = col
                # Defined AFTER parse so a self-reference inside a
                # non-recursive CTE body resolves to the outer name; the
                # scope passed in already chains to earlier siblings.
                scope.ctes[name] = Relation(name=name, derived=body)
                cte_tables |= body.tables
                if self._at_op(","):
                    self.i += 1
                    continue
                break
        q = self._parse_set_chain(scope)
        q.tables |= cte_tables
        # trailing ORDER BY / LIMIT of the whole statement
        self._skip_expressions_until_end(scope, q)
        return q

    def _parse_set_chain(self, scope: Scope) -> Query:
        first = self._parse_select_core(scope)
        while self.at_kw("UNION", "INTERSECT", "EXCEPT", "MINUS"):
            self.i += 1
            if self.at_kw("ALL", "DISTINCT"):
                self.i += 1
            # Each set-op branch gets its own alias scope, but it must
            # CHAIN to the statement scope so the WITH clause's CTEs stay
            # visible — chaining to scope.parent instead skipped them and
            # misresolved `... UNION ALL SELECT FROM cte` as an external
            # table reference.
            nxt = self._parse_select_core(Scope(scope))
            first.tables |= nxt.tables
            # positional merge of output-column sources
            for a, b in zip(first.columns, nxt.columns):
                a.sources |= b.sources
        return first

    def _parse_select_core(self, scope: Scope) -> Query:
        if self._at_op("("):
            self.i += 1
            inner = self.parse_query(scope)
            self.expect_op(")")
            return inner
        if self.at_kw("VALUES"):
            return self._parse_values(scope)
        self.expect_kw("SELECT")
        if self.at_kw("DISTINCT", "ALL"):
            self.i += 1
        proj_slices = self._split_projections()
        # FROM clause (may be absent: SELECT 1)
        q = Query()
        if self.at_kw("FROM"):
            self.i += 1
            self._parse_from(scope, q)
        # remaining clauses of this core: collect tables from subqueries,
        # stop at set ops / closing paren
        self._skip_expressions_until_end(scope, q, stop_at_setop=True)
        # now resolve projections against the completed scope
        for idx, sl in enumerate(proj_slices):
            resolved = self._resolve_projection(sl, scope, q, idx)
            if resolved is not None:
                name, cols = resolved
                q.columns.append(OutputColumn(name=name, sources=cols))
        return q

    def _parse_values(self, scope: Scope) -> Query:
        self.expect_kw("VALUES")
        depth = 0
        while self.peek() is not None:
            t = self.peek()
            if t.kind == "op" and t.value == "(":
                depth += 1
            elif t.kind == "op" and t.value == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and t.kind == "ident" and (t.upper == "AS" or t.upper in _CLAUSE_STARTERS):
                break
            self.i += 1
        q = Query()
        # optional AS t(c1, c2)
        if self.at_kw("AS"):
            self.i += 1
        t = self.peek()
        if t is not None and t.kind in ("ident", "qident") and t.upper not in _CLAUSE_STARTERS:
            self.i += 1
            if self._at_op("("):
                for col in self._paren_name_list():
                    q.columns.append(OutputColumn(name=col, sources=set()))
        return q

    # -- FROM clause --------------------------------------------------------
    def _parse_from(self, scope: Scope, q: Query) -> None:
        self._parse_table_ref(scope, q)
        while True:
            if self._at_op(","):
                self.i += 1
                self._parse_table_ref(scope, q)
                continue
            if self.at_kw("LATERAL"):
                save = self.i
                self.i += 1
                if self.at_kw("VIEW"):
                    self.i += 1
                    self._parse_lateral_view(scope, q)
                    continue
                # LATERAL (subquery) / LATERAL explode(...) — comma form
                self._parse_table_ref(scope, q, lateral=True)
                if self.i == save + 1:
                    raise SqlParseError("bare LATERAL")
                continue
            if self.at_kw(*_JOIN_WORDS):
                # consume join modifiers up to JOIN
                while self.at_kw(*(_JOIN_WORDS | {"OUTER"})):
                    w = self.take()
                    if w.upper == "JOIN":
                        break
                self._parse_table_ref(scope, q)
                if self.at_kw("ON"):
                    self.i += 1
                    self._consume_expr(scope, q, stop={"WHERE", "GROUP", "HAVING",
                                                      "ORDER", "LIMIT", "UNION",
                                                      "INTERSECT", "EXCEPT",
                                                      "QUALIFY", "WINDOW"} | _JOIN_WORDS | {"LATERAL"},
                                       stop_comma=True)
                elif self.at_kw("USING"):
                    self.i += 1
                    self._paren_name_list()
                continue
            break

    def _parse_lateral_view(self, scope: Scope, q: Query) -> None:
        """LATERAL VIEW [OUTER] fn(args) [tbl_alias] [AS col (, col)*]"""
        if self.at_kw("OUTER"):
            self.i += 1
        fn = self._ident_name()  # generator function name
        del fn
        refs: set = set()
        if self._at_op("("):
            refs = self._collect_paren_refs(scope, q)
        alias = ""
        if self.peek() is not None and self.peek().kind in ("ident", "qident") and not self.at_kw("AS") and self.peek().upper not in _CLAUSE_STARTERS | _JOIN_WORDS | {"LATERAL", "WHERE"}:
            alias = self.take().value
        cols: list[str] = []
        if self.at_kw("AS"):
            self.i += 1
            while True:
                cols.append(self._ident_name())
                if self._at_op(","):
                    self.i += 1
                    continue
                break
        rel = Relation(name=alias or (cols[0] if cols else "_lv"),
                       generated=refs, gen_columns=tuple(cols))
        key = alias or (cols[0] if cols else "_lv")
        scope.relations[key] = rel
        for c in cols:
            scope.relations.setdefault(c, rel)
        scope.ordered_relations.append(rel)

    def _parse_table_ref(self, scope: Scope, q: Query, lateral: bool = False) -> None:
        if self._at_op("("):
            self.i += 1
            # Derived tables parse with the current scope as parent: they
            # see enclosing CTEs (and, conservatively, outer aliases for
            # the correlated case) but their own aliases stay local.
            body = self.parse_query(scope)
            self.expect_op(")")
            alias = self._opt_alias(body)
            rel = Relation(name=alias or "_subq", derived=body)
            q.tables |= body.tables
            scope.relations[rel.name] = rel
            scope.ordered_relations.append(rel)
            return
        if self.at_kw("VALUES"):
            body = self._parse_values(scope)
            rel = Relation(name="_values", derived=body)
            alias = self._opt_alias(body)
            if alias:
                rel.name = alias
            scope.relations[rel.name] = rel
            scope.ordered_relations.append(rel)
            return
        # possibly a table-function: ident ( ... )
        name_parts = [self._ident_name()]
        while self._at_op("."):
            self.i += 1
            name_parts.append(self._ident_name())
        if self._at_op("(") and len(name_parts) == 1:
            # table function: explode(...), range(...), read_parquet(...)
            refs = self._collect_paren_refs(scope, q)
            alias = self._opt_alias(None)
            rel = Relation(name=alias or name_parts[0], generated=refs)
            if self._at_op("("):
                rel.gen_columns = self._paren_name_list()
            scope.relations[rel.name] = rel
            scope.ordered_relations.append(rel)
            return
        full = ".".join(name_parts)
        cte = scope.resolve_cte(full) if len(name_parts) == 1 else None
        if cte is not None:
            alias = self._opt_alias(None)
            rel = Relation(name=alias or full, derived=cte.derived)
        else:
            q.tables.add(full)
            alias = self._opt_alias(None)
            rel = Relation(name=alias or name_parts[-1], external=full)
            # a fully-qualified ref is also addressable by its full name
            scope.relations.setdefault(full, rel)
        scope.relations[rel.name] = rel
        scope.ordered_relations.append(rel)

    def _opt_alias(self, body: Optional[Query]) -> str:
        if self.at_kw("AS"):
            self.i += 1
            name = self._ident_name()
        else:
            t = self.peek()
            if (
                t is not None
                and t.kind in ("ident", "qident")
                and t.upper not in _CLAUSE_STARTERS | _JOIN_WORDS
                and t.upper not in ("ON", "USING", "LATERAL", "WHERE", "AS", "SELECT")
            ):
                name = self.take().value
            else:
                return ""
        if self._at_op("(") and body is not None:
            cols = self._paren_name_list()
            for col, out in zip(cols, body.columns):
                out.name = col
        elif self._at_op("("):
            self._paren_name_list()
        return name

    # -- projections --------------------------------------------------------
    # Clause starters that only open a clause when followed by BY — a bare
    # GROUP inside `WITHIN GROUP (...)` or ORDER inside an OVER clause at
    # depth 0 is part of an expression, not a clause boundary.
    _BY_CLAUSES = {"GROUP", "ORDER", "DISTRIBUTE", "CLUSTER", "SORT"}

    def _is_clause_start(self, i: int) -> bool:
        t = self.toks[i]
        if t.kind != "ident" or t.upper not in _CLAUSE_STARTERS:
            return False
        if t.upper in self._BY_CLAUSES:
            nxt = self.toks[i + 1] if i + 1 < len(self.toks) else None
            return nxt is not None and nxt.kind == "ident" and nxt.upper == "BY"
        return True

    def _split_projections(self) -> list[list[Token]]:
        """Collect token slices for each projection, ending at top-level
        FROM or statement end. Subqueries inside projections are kept as
        raw token runs here and parsed during resolution."""
        slices: list[list[Token]] = []
        cur: list[Token] = []
        depth = 0
        while True:
            t = self.peek()
            if t is None:
                break
            if t.kind == "op" and t.value in ("(", "["):
                depth += 1
            elif t.kind == "op" and t.value in (")", "]"):
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and t.kind == "op" and t.value == ",":
                slices.append(cur)
                cur = []
                self.i += 1
                continue
            elif depth == 0 and t.kind == "ident" and (
                t.upper == "FROM" or self._is_clause_start(self.i)
            ):
                break
            cur.append(self.take())
            continue
        if cur:
            slices.append(cur)
        if not slices:
            raise SqlParseError("empty projection list")
        return slices

    def _resolve_projection(self, toks: list[Token], scope: Scope, q: Query, idx: int):
        """Append nothing and return (output_name, sources), or None when
        the projection was a star already expanded into ``q.columns``."""
        if len(toks) == 1 and toks[0].kind == "op" and toks[0].value == "*":
            for rel in scope.ordered_relations:
                self._expand_star(rel, q)
            return None
        # qualified star: alias.*
        if (
            len(toks) == 3
            and toks[0].kind in ("ident", "qident")
            and toks[1].kind == "op" and toks[1].value == "."
            and toks[2].kind == "op" and toks[2].value == "*"
        ):
            rel = scope.resolve_alias(toks[0].value)
            if rel is not None:
                self._expand_star(rel, q)
                return None
            return toks[0].value + ".*", set()
        # output name: trailing "AS name" or trailing lone identifier chain
        name = None
        body = toks
        if len(toks) >= 2 and toks[-2].kind == "ident" and toks[-2].upper == "AS" and toks[-1].kind in ("ident", "qident"):
            name = toks[-1].value
            body = toks[:-2]
        elif (
            len(toks) >= 2
            and toks[-1].kind in ("ident", "qident")
            and toks[-1].upper not in _EXPR_KEYWORDS
            and (toks[-2].kind in ("qident", "string", "number")
                 or (toks[-2].kind == "op" and toks[-2].value == ")"))
        ):
            # implicit alias: expr name
            name = toks[-1].value
            body = toks[:-1]
        if name is None:
            # bare column ref (possibly qualified): name is last ident
            if body and body[-1].kind in ("ident", "qident"):
                name = body[-1].value
            else:
                name = f"_col{idx}"
        sources = self._refs_in_tokens(body, scope, q)
        return name, sources

    def _expand_star(self, rel: Relation, q: Query) -> None:
        if rel.derived is not None:
            for c in rel.derived.columns:
                q.columns.append(OutputColumn(name=c.name, sources=set(c.sources)))
        elif rel.external is not None:
            q.columns.append(OutputColumn(name="*", sources={(rel.external, "*")}))
        elif rel.generated is not None:
            for c in rel.gen_columns or ("*",):
                q.columns.append(OutputColumn(name=c, sources=set(rel.generated)))

    # -- expression scanning -------------------------------------------------
    def _refs_in_tokens(self, toks: list[Token], scope: Scope, q: Query,
                        skip: frozenset = frozenset()) -> set:
        """Column refs in a projection token slice; nested subqueries are
        re-parsed in a child scope (their externals land in q.tables).
        ``skip`` carries enclosing lambda parameter names into recursion."""
        refs: set = set()
        # Higher-order-function lambda parameters (x -> ..., (a, b) -> ...)
        # are scoped to the lambda body, never column refs — collect names
        # up front and skip them during resolution.
        lambda_params: set[str] = set()
        for k, t in enumerate(toks):
            if t.kind == "op" and t.value == "->":
                if k >= 1 and toks[k - 1].kind == "ident":
                    lambda_params.add(toks[k - 1].value)
                elif k >= 2 and toks[k - 1].kind == "op" and toks[k - 1].value == ")":
                    j = k - 2
                    while j >= 0 and not (toks[j].kind == "op" and toks[j].value == "("):
                        if toks[j].kind == "ident":
                            lambda_params.add(toks[j].value)
                        j -= 1
        lambda_params |= set(skip)
        i = 0
        n = len(toks)
        while i < n:
            t = toks[i]
            if t.kind == "op" and t.value == "(":
                # find matching close; check for subquery
                depth = 1
                j = i + 1
                while j < n and depth:
                    if toks[j].kind == "op" and toks[j].value == "(":
                        depth += 1
                    elif toks[j].kind == "op" and toks[j].value == ")":
                        depth -= 1
                    j += 1
                inner = toks[i + 1 : j - 1]
                if inner and inner[0].kind == "ident" and inner[0].upper in ("SELECT", "WITH"):
                    sub = _Parser(inner)
                    body = sub.parse_query(scope)
                    q.tables |= body.tables
                    for c in body.columns:
                        refs |= c.sources
                else:
                    refs |= self._refs_in_tokens(
                        inner, scope, q, skip=frozenset(lambda_params)
                    )
                i = j
                continue
            if t.kind in ("ident", "qident"):
                nxt = toks[i + 1] if i + 1 < n else None
                # function call: ident( — skip the name, recurse args later
                if nxt is not None and nxt.kind == "op" and nxt.value == "(":
                    i += 1
                    continue
                # qualified ref chain a.b(.c)
                if nxt is not None and nxt.kind == "op" and nxt.value == ".":
                    parts = [t.value]
                    j = i + 1
                    while (
                        j + 1 < n
                        and toks[j].kind == "op" and toks[j].value == "."
                        and toks[j + 1].kind in ("ident", "qident")
                    ):
                        parts.append(toks[j + 1].value)
                        j += 2
                    refs |= self._resolve_ref(parts, scope)
                    i = j
                    continue
                if t.kind == "ident" and t.upper in _EXPR_KEYWORDS:
                    # skip the AS target (cast type) too
                    i += 1
                    continue
                # struct-field access after ')' etc is caught above; bare ref:
                prev = toks[i - 1] if i > 0 else None
                if prev is not None and prev.kind == "op" and prev.value == ".":
                    i += 1
                    continue
                # dialect type names are syntax only in cast position
                if t.upper in _DIALECT_TYPE_KEYWORDS and prev is not None and (
                    (prev.kind == "op" and prev.value == "::")
                    or (prev.kind == "ident" and prev.upper == "AS")
                ):
                    i += 1
                    continue
                if t.value in lambda_params:
                    i += 1
                    continue
                refs |= self._resolve_ref([t.value], scope)
                i += 1
                continue
            i += 1
        return refs

    def _resolve_ref(self, parts: list[str], scope: Scope) -> set:
        """Resolve an identifier chain to external (table, column) pairs."""
        if len(parts) >= 2:
            # try alias.col first (covers alias.struct_col.field too — the
            # struct column is the lineage source), then sch.tbl.col
            alias = parts[0]
            rel = scope.resolve_alias(alias)
            if rel is not None:
                return self._rel_column_sources(rel, parts[1])
            if len(parts) >= 3:
                rel = scope.resolve_alias(".".join(parts[:-1]))
                if rel is not None:
                    return self._rel_column_sources(rel, parts[-1])
                # sch.tbl.col on an unaliased external
                return {(".".join(parts[:-1]), parts[-1])}
            # alias unknown — maybe struct field access on a bare column
            return self._resolve_ref([parts[0]], scope)
        col = parts[0]
        # bare column: prefer a derived relation exposing it, else the
        # single relation in scope, else all externals (conservative)
        s: Optional[Scope] = scope
        while s is not None:
            rels = s.ordered_relations
            if rels:
                exposing = [
                    r for r in rels
                    if (r.derived is not None and any(c.name == col for c in r.derived.columns))
                    or (r.gen_columns and col in r.gen_columns)
                ]
                if len(exposing) >= 1:
                    out: set = set()
                    for r in exposing:
                        out |= self._rel_column_sources(r, col)
                    return out
                if len(rels) == 1:
                    return self._rel_column_sources(rels[0], col)
                externals = [r for r in rels if r.external is not None]
                if externals and len(externals) == len(rels):
                    return {(r.external, col) for r in externals}
                # mixed and ambiguous: attribute to all
                out = set()
                for r in rels:
                    out |= self._rel_column_sources(r, col)
                return out
            s = s.parent
        return set()

    def _rel_column_sources(self, rel: Relation, col: str) -> set:
        if rel.external is not None:
            return {(rel.external, col)}
        if rel.derived is not None:
            for c in rel.derived.columns:
                if c.name == col:
                    return set(c.sources)
            # star passthrough
            for c in rel.derived.columns:
                if c.name == "*":
                    return {(t, col) for (t, cc) in c.sources if cc == "*"}
            return set()
        if rel.generated is not None:
            return set(rel.generated)
        return set()

    # -- misc ----------------------------------------------------------------
    def _consume_expr(self, scope: Scope, q: Query, stop: set, stop_comma: bool = False) -> set:
        """Scan an expression region, collecting subquery tables; stops at
        a top-level stop keyword (or comma)."""
        toks: list[Token] = []
        depth = 0
        while True:
            t = self.peek()
            if t is None:
                break
            if t.kind == "op" and t.value in ("(", "["):
                depth += 1
            elif t.kind == "op" and t.value in (")", "]"):
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and t.kind == "ident" and t.upper in stop:
                break
            elif depth == 0 and stop_comma and t.kind == "op" and t.value == ",":
                break
            toks.append(self.take())
        return self._refs_in_tokens(toks, scope, q)

    def _skip_expressions_until_end(self, scope: Scope, q: Query, stop_at_setop: bool = False) -> None:
        """Consume WHERE/GROUP BY/HAVING/ORDER BY/LIMIT clauses, collecting
        subquery table refs, stopping at ')' or set ops (if requested)."""
        depth = 0
        collected: list[Token] = []
        while True:
            t = self.peek()
            if t is None:
                break
            if t.kind == "op" and t.value == "(":
                depth += 1
            elif t.kind == "op" and t.value == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and t.kind == "op" and t.value == ";":
                self.i += 1
                break
            elif depth == 0 and stop_at_setop and t.kind == "ident" and t.upper in ("UNION", "INTERSECT", "EXCEPT", "MINUS"):
                break
            collected.append(self.take())
        # only need subquery tables out of these clauses
        self._refs_in_tokens(collected, scope, q)

    def _collect_paren_refs(self, scope: Scope, q: Query) -> set:
        self.expect_op("(")
        depth = 1
        toks: list[Token] = []
        while depth:
            t = self.peek()
            if t is None:
                raise SqlParseError("unbalanced parens")
            if t.kind == "op" and t.value == "(":
                depth += 1
            elif t.kind == "op" and t.value == ")":
                depth -= 1
                if depth == 0:
                    self.i += 1
                    break
            toks.append(self.take())
        return self._refs_in_tokens(toks, scope, q)

    def _paren_name_list(self) -> tuple:
        self.expect_op("(")
        names: list[str] = []
        depth = 0
        while True:
            t = self.peek()
            if t is None:
                raise SqlParseError("unbalanced parens in name list")
            if t.kind == "op" and t.value == "(":
                depth += 1
            elif t.kind == "op" and t.value == ")":
                if depth == 0:
                    self.i += 1
                    break
                depth -= 1
            elif depth == 0 and t.kind in ("ident", "qident"):
                names.append(t.value)
            self.i += 1
        return tuple(names)

    def _ident_name(self) -> str:
        t = self.peek()
        if t is None or t.kind not in ("ident", "qident"):
            raise SqlParseError(f"expected identifier at token {self.i}: {t}")
        self.i += 1
        return t.value

    def _at_op(self, op: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "op" and t.value == op


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def parse_query(sql: str, dialect: str = "") -> Query:
    """Parse one SELECT statement into its scope tree. EVERY failure mode
    — lexer, structural, or an internal bug on adversarial input — is
    normalized to SqlParseError: this runs on every loaded model query,
    and callers (extract_depends_on, column_lineage, fingerprinting) are
    contracted to catch SqlParseError and fall back to the regex path, so
    no malformed model may crash project loading with anything else.
    ``dialect`` selects the literal grammar (see ``tokenize``)."""
    try:
        toks = tokenize(sql, dialect)
        # strip trailing semicolons
        while toks and toks[-1].kind == "op" and toks[-1].value == ";":
            toks.pop()
        p = _Parser(toks)
        q = p.parse_query(None)
    except SqlParseError:
        raise
    except (RecursionError, IndexError, KeyError, ValueError, TypeError) as exc:
        raise SqlParseError(f"internal parse failure: {type(exc).__name__}: {exc}") from exc
    if p.i < len(p.toks):
        raise SqlParseError(
            f"trailing tokens at {p.i}/{len(p.toks)}: {p.toks[p.i : p.i + 5]}"
        )
    return q


def find_tables(sql: str, dialect: str = "") -> frozenset[str]:
    """External table references with CTE shadowing resolved — the
    tokenizer-level equivalent of reference dialect.py:1270 find_tables."""
    return frozenset(parse_query(sql, dialect).tables)


def query_lineage(sql: str, dialect: str = "") -> dict[str, set]:
    """Output column name → {(external_table, column), ...} resolved
    through CTEs, subqueries, aliases, and set operations."""
    q = parse_query(sql, dialect)
    out: dict[str, set] = {}
    for c in q.columns:
        out.setdefault(c.name, set()).update(c.sources)
    return out


def dotted_names(sql: str, dialect: str = "") -> frozenset[str]:
    """All dotted identifier chains at the token level — unlike a raw regex
    scan this never matches inside string literals or comments. Used as the
    known-model fallback for macro-wrapped relations (@DEDUPLICATE(m, ...))
    that the structural parse can't see as FROM entries."""
    try:
        toks = tokenize(sql, dialect)
    except SqlParseError:
        return frozenset()
    out: set[str] = set()
    i = 0
    n = len(toks)
    while i < n:
        if toks[i].kind in ("ident", "qident"):
            parts = [toks[i].value]
            j = i + 1
            while (
                j + 1 < n
                and toks[j].kind == "op" and toks[j].value == "."
                and toks[j + 1].kind in ("ident", "qident")
            ):
                parts.append(toks[j + 1].value)
                j += 2
            if len(parts) > 1:
                out.add(".".join(parts))
            i = j
        else:
            i += 1
    return frozenset(out)
