"""Column-level lineage (reference sqlmesh/core/lineage.py:1-114).

The reference walks SQLGlot optimizer scopes (build_scope/qualify); this
module does the same walk over the tokenizer-level scope tree built by
``core/sqlparse.py``: CTE shadowing, nested subqueries with repeated
aliases, set operations, LATERAL VIEW, and star expansion all resolve
lexically, then expand through upstream MODELS (transitive lineage down
to source tables). The legacy projection-regex path survives only as the
fallback for macro-heavy SQL the structural parse rejects.

Deliberately conservative: an expression's lineage is the set of ALL
columns it references (no conditional-branch pruning) — the same
over-approximation every practical lineage tool makes.
"""

from __future__ import annotations

import re
from typing import Mapping

from sqlmesh_spark.core.model import Model
from sqlmesh_spark.macros import split_top_level

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_FROM_RE = re.compile(
    rf"\b(?:FROM|JOIN)\s+((?:{_IDENT}\.)*{_IDENT})(?:\s+(?:AS\s+)?({_IDENT}))?",
    re.IGNORECASE,
)
_QUALIFIED_RE = re.compile(rf"\b({_IDENT})\.({_IDENT})\b")
_BARE_RE = re.compile(rf"\b({_IDENT})\b")
_KEYWORDS = {
    "select", "from", "where", "group", "by", "order", "having", "join",
    "left", "right", "full", "inner", "outer", "cross", "on", "and", "or",
    "not", "as", "case", "when", "then", "else", "end", "cast", "sum",
    "count", "avg", "min", "max", "round", "coalesce", "distinct", "null",
    "true", "false", "timestamp", "date", "interval", "bigint", "int",
    "double", "string", "between", "in", "is", "like", "desc", "asc",
    "substring", "date_format", "concat", "with", "union", "all",
}


def _strip_with(sql: str) -> str:
    """Skip to the final top-level SELECT (lineage through CTEs resolves
    them as opaque relations — conservative)."""
    s = sql
    m = re.match(r"\s*WITH\b", s, re.IGNORECASE)
    if not m:
        return s
    # Find the last top-level SELECT.
    depth = 0
    last = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and s[i : i + 6].upper() == "SELECT":
            last = i
    return s[last:]


def _projection_list(sql: str) -> list[str]:
    body = _strip_with(sql)
    m = re.match(r"\s*SELECT\s+(?:DISTINCT\s+)?", body, re.IGNORECASE)
    if not m:
        return []
    rest = body[m.end() :]
    # Cut at top-level FROM.
    depth = 0
    end = len(rest)
    for i in range(len(rest)):
        ch = rest[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and rest[i : i + 5].upper() == "FROM " :
            end = i
            break
    return split_top_level(rest[:end])


def _alias_map(sql: str) -> dict[str, str]:
    """table-or-model name/alias → full relation name."""
    out: dict[str, str] = {}
    for m in _FROM_RE.finditer(sql):
        rel, alias = m.group(1).lower(), (m.group(2) or "").lower()
        if alias and alias not in _KEYWORDS:
            out[alias] = rel
        out[rel.split(".")[-1]] = rel
        out[rel] = rel
    return out


def _expr_refs(expr: str, aliases: Mapping[str, str]) -> set[tuple[str, str]]:
    refs: set[tuple[str, str]] = set()
    cleaned = re.sub(r"'[^']*'", "", expr)  # drop string literals
    qualified_spans = []
    for m in _QUALIFIED_RE.finditer(cleaned):
        tbl, col = m.group(1).lower(), m.group(2).lower()
        if tbl in aliases:
            refs.add((aliases[tbl], col))
            qualified_spans.append(m.span())
    # Bare identifiers (not keywords, not part of qualified refs).
    for m in _BARE_RE.finditer(cleaned):
        if any(s <= m.start() < e for s, e in qualified_spans):
            continue
        name = m.group(1).lower()
        if name in _KEYWORDS or name.isdigit():
            continue
        # Attribute to the single-relation case only (ambiguous otherwise).
        rels = set(aliases.values())
        if len(rels) == 1:
            refs.add((next(iter(rels)), name))
    return refs


def _out_name(projection: str, idx: int) -> str:
    m = re.search(rf"\bAS\s+({_IDENT})\s*$", projection, re.IGNORECASE)
    if m:
        return m.group(1).lower()
    m = re.match(rf"^\s*(?:{_IDENT}\.)?({_IDENT})\s*$", projection)
    if m:
        return m.group(1).lower()
    return f"_col{idx}"


_log = __import__("logging").getLogger("sqlmesh_spark.lineage")


def column_lineage(model: Model) -> dict[str, set[tuple[str, str]]]:
    """Output column → {(relation, column), ...} for one model. Relations
    here may be upstream models (expanded by transitive_column_lineage) or
    true external tables.

    Resolution ladder (the reference always resolves structurally through
    SQLGlot scopes, lineage.py:1-114 — the regex rung exists only because
    this engine's parser is in-repo):

    1. structural parse of the raw query;
    2. for macro-bearing text the parser rejects: expand macros with
       placeholder temporal bindings, then structural parse — macro
       EXPANSION is what makes the text parseable, the placeholders never
       appear in lineage output (they are literals, not column refs);
    3. regex projection scan, logged as a WARNING — silently degrading to
       the weaker resolver can mis-attribute columns, so the fallback is
       loud."""
    from sqlmesh_spark.core.sqlparse import SqlParseError, query_lineage

    try:
        return query_lineage(model.query, model.dialect)
    except SqlParseError:
        pass
    try:
        from sqlmesh_spark.macros import MacroEvaluator, temporal_variables

        variables = temporal_variables("1970-01-01", "1970-01-02")
        variables["this_model"] = model.name
        variables.update(model.variables)
        expanded = MacroEvaluator(variables=variables).render(model.query)
        return query_lineage(expanded, model.dialect)
    except Exception:  # noqa: BLE001 - any macro/parse failure → regex rung
        pass
    _log.warning(
        "column lineage for %s fell back to the regex resolver "
        "(query is unparseable even after macro expansion); "
        "attribution may be incomplete",
        model.name,
    )
    return _column_lineage_regex(model)


def _column_lineage_regex(model: Model) -> dict[str, set[tuple[str, str]]]:
    """Legacy fallback for SQL the structural parse rejects."""
    aliases = _alias_map(model.query)
    out: dict[str, set[tuple[str, str]]] = {}
    for i, proj in enumerate(_projection_list(model.query)):
        # Strip the output alias so it isn't mistaken for a column ref.
        expr = re.sub(rf"\bAS\s+{_IDENT}\s*$", "", proj, flags=re.IGNORECASE)
        out[_out_name(proj, i)] = _expr_refs(expr, aliases)
    return out


def transitive_column_lineage(
    models: Mapping[str, Model], model_name: str, column: str
) -> set[tuple[str, str]]:
    """Expand lineage through upstream MODELS until only external
    relations remain — end-to-end source attribution for one column."""
    seen: set[tuple[str, str]] = set()
    frontier = {(model_name.lower(), column.lower())}
    result: set[tuple[str, str]] = set()
    while frontier:
        rel, col = frontier.pop()
        if (rel, col) in seen:
            continue
        seen.add((rel, col))
        if rel in models:
            lin = column_lineage(models[rel])
            srcs = lin.get(col)
            if srcs is None and "*" in lin:
                # the model selects * — pass the column through to every
                # star-source relation
                srcs = {(t, col) for (t, c) in lin["*"] if c == "*"}
            for src in srcs or set():
                frontier.add(src)
        else:
            result.add((rel, col))
    return result
