"""Data-quality audit operators.

An audit is a SQL-generating operator: given a relation and parameters it
emits a query returning *violating rows* — any returned row is a failure
(blocking or not is a model-level policy). This mirrors the reference's
builtin audit suite (sqlmesh/core/audit/builtin.py:16-622, 29 audits);
semantics re-derived here, generated for Spark SQL and (for the oracle
gate) DuckDB.

At scale every audit is a single Spark SQL query over the just-written
partition/table — Catalyst pushes the violation predicate into the scan,
so an audit on a 100 TB table with a time filter touches only the new
partitions.
"""

from __future__ import annotations

from typing import Iterable, Sequence

SPARK = "spark"
DUCKDB = "duckdb"

UUID_RX = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
URL_RX = "^(https?|ftp)://[^\\s/$.?#].[^\\s]*$"
EMAIL_RX = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
HTTP_METHODS = ("GET", "POST", "PUT", "DELETE", "PATCH", "HEAD", "OPTIONS", "TRACE", "CONNECT")


def _rx(col: str, pattern: str, dialect: str) -> str:
    """Partial-match regex predicate in either dialect.

    Patterns are stored as real regex text. Spark string literals unescape
    backslashes ('\\s' in SQL → \\s regex needs doubling); DuckDB literals
    are raw. Verified empirically — getting this wrong silently turns \\s
    into 's' on the Spark side.
    """
    esc = pattern.replace("'", "''")
    if dialect == DUCKDB:
        return f"regexp_matches({col}, '{esc}')"
    return f"{col} RLIKE '{esc.replace(chr(92), chr(92) * 2)}'"


def _in_list(values: Iterable) -> str:
    parts = []
    for v in values:
        if isinstance(v, str):
            parts.append("'" + v.replace("'", "''") + "'")
        else:
            parts.append(str(v))
    return ", ".join(parts)


def _like(column: str, pattern: str) -> str:
    return f"{column} LIKE '" + pattern.replace("'", "''") + "'"


# --- row-level audits ------------------------------------------------------


def not_null(table: str, columns: Sequence[str], dialect: str = SPARK) -> str:
    """builtin.py:16 — rows where any of the columns is NULL."""
    cond = " OR ".join(f"{c} IS NULL" for c in columns)
    return f"SELECT * FROM {table} WHERE {cond}"


def not_empty_string(table: str, column: str, dialect: str = SPARK) -> str:
    """builtin.py:168"""
    return f"SELECT * FROM {table} WHERE {column} = ''"


def accepted_values(table: str, column: str, values: Sequence, dialect: str = SPARK) -> str:
    """builtin.py:61 — rows whose value is outside the accepted set."""
    return f"SELECT * FROM {table} WHERE {column} NOT IN ({_in_list(values)})"


def not_accepted_values(table: str, column: str, values: Sequence, dialect: str = SPARK) -> str:
    """builtin.py:197"""
    return f"SELECT * FROM {table} WHERE {column} IN ({_in_list(values)})"


def forall(table: str, criteria: Sequence[str], dialect: str = SPARK) -> str:
    """builtin.py:92 — rows violating any criterion."""
    cond = " OR ".join(f"NOT ({c})" for c in criteria)
    return f"SELECT * FROM {table} WHERE {cond}"


def accepted_range(
    table: str, column: str, low, high, inclusive: bool = True, dialect: str = SPARK
) -> str:
    """builtin.py:115"""
    if inclusive:
        cond = f"{column} < {low} OR {column} > {high}"
    else:
        cond = f"{column} <= {low} OR {column} >= {high}"
    return f"SELECT * FROM {table} WHERE {cond}"


def string_length_between(
    table: str, column: str, min_len: int, max_len: int, dialect: str = SPARK
) -> str:
    """builtin.py:440"""
    return (
        f"SELECT * FROM {table} "
        f"WHERE LENGTH({column}) < {min_len} OR LENGTH({column}) > {max_len}"
    )


def string_length_equal(table: str, column: str, length: int, dialect: str = SPARK) -> str:
    """builtin.py:465"""
    return f"SELECT * FROM {table} WHERE LENGTH({column}) <> {length}"


def valid_uuid(table: str, column: str, dialect: str = SPARK) -> str:
    """builtin.py:293"""
    return (
        f"SELECT * FROM {table} "
        f"WHERE {column} IS NOT NULL AND NOT {_rx(column, UUID_RX, dialect)}"
    )


def valid_url(table: str, column: str, dialect: str = SPARK) -> str:
    """builtin.py:308"""
    return (
        f"SELECT * FROM {table} "
        f"WHERE {column} IS NOT NULL AND NOT {_rx(column, URL_RX, dialect)}"
    )


def valid_email(table: str, column: str, dialect: str = SPARK) -> str:
    """builtin.py:329"""
    return (
        f"SELECT * FROM {table} "
        f"WHERE {column} IS NOT NULL AND NOT {_rx(column, EMAIL_RX, dialect)}"
    )


def valid_http_method(table: str, column: str, dialect: str = SPARK) -> str:
    """builtin.py:319"""
    return (
        f"SELECT * FROM {table} "
        f"WHERE {column} IS NOT NULL AND {column} NOT IN ({_in_list(HTTP_METHODS)})"
    )


def match_regex_pattern_list(
    table: str, column: str, patterns: Sequence[str], dialect: str = SPARK
) -> str:
    """builtin.py:340 — violations match NONE of the patterns."""
    any_match = " OR ".join(_rx(column, p, dialect) for p in patterns)
    return f"SELECT * FROM {table} WHERE {column} IS NOT NULL AND NOT ({any_match})"


def not_match_regex_pattern_list(
    table: str, column: str, patterns: Sequence[str], dialect: str = SPARK
) -> str:
    """builtin.py:360 — violations match ANY pattern."""
    any_match = " OR ".join(_rx(column, p, dialect) for p in patterns)
    return f"SELECT * FROM {table} WHERE {any_match}"


def match_like_pattern_list(
    table: str, column: str, patterns: Sequence[str], dialect: str = SPARK
) -> str:
    """builtin.py:380 — violations LIKE none of the patterns."""
    any_like = " OR ".join(_like(column, p) for p in patterns)
    return f"SELECT * FROM {table} WHERE {column} IS NOT NULL AND NOT ({any_like})"


def not_match_like_pattern_list(
    table: str, column: str, patterns: Sequence[str], dialect: str = SPARK
) -> str:
    """builtin.py:400"""
    any_like = " OR ".join(_like(column, p) for p in patterns)
    return f"SELECT * FROM {table} WHERE {any_like}"


# --- uniqueness / structure audits ----------------------------------------


def unique_values(table: str, columns: Sequence[str], dialect: str = SPARK) -> str:
    """builtin.py:36 — per column, values appearing more than once.

    The reference flags rows via ROW_NUMBER()>1 (arbitrary which duplicate
    is flagged); we emit the deterministic (column, value, cnt) form so
    results are stable for hashing while preserving the pass/fail set.
    """
    parts = [
        f"SELECT '{c}' AS column_name, CAST({c} AS STRING) AS value, COUNT(*) AS cnt "
        f"FROM {table} GROUP BY {c} HAVING COUNT(*) > 1"
        for c in columns
    ]
    return " UNION ALL ".join(parts)


def unique_combination_of_columns(
    table: str, columns: Sequence[str], dialect: str = SPARK
) -> str:
    """builtin.py:233"""
    cols = ", ".join(columns)
    return (
        f"SELECT {cols}, COUNT(*) AS cnt FROM {table} "
        f"GROUP BY {cols} HAVING COUNT(*) > 1"
    )


def sequential_values(table: str, column: str, interval: int = 1, dialect: str = SPARK) -> str:
    """builtin.py:209 — gaps in the distinct sorted values."""
    return f"""
WITH d AS (SELECT DISTINCT {column} AS v FROM {table}),
w AS (SELECT v, LAG(v) OVER (ORDER BY v) AS prev FROM d)
SELECT prev, v FROM w WHERE prev IS NOT NULL AND v - prev <> {interval}
"""


def mutually_exclusive_ranges(
    table: str, lower: str, upper: str, dialect: str = SPARK
) -> str:
    """builtin.py:247 — [lower, upper) ranges that overlap a prior range.

    Window formulation (sort by range start, compare against running max of
    prior ends) — O(n log n) with one shuffle instead of the O(n²)
    self-join; this is the shape that survives 100 TB.
    """
    return f"""
WITH r AS (SELECT {lower} AS lb, {upper} AS ub FROM {table}),
w AS (SELECT lb, ub, MAX(ub) OVER (
        ORDER BY lb, ub ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM r)
SELECT lb, ub, prev_max FROM w WHERE prev_max > lb
"""


# --- table-level stat audits ----------------------------------------------


def number_of_rows(table: str, threshold: int, dialect: str = SPARK) -> str:
    """builtin.py:72 — fails (returns a row) when count < threshold."""
    return f"SELECT COUNT(*) AS n FROM {table} HAVING COUNT(*) < {threshold}"


def at_least_one(table: str, column: str, dialect: str = SPARK) -> str:
    """builtin.py:140"""
    return f"SELECT COUNT({column}) AS n FROM {table} HAVING COUNT({column}) = 0"


def not_constant(table: str, column: str, dialect: str = SPARK) -> str:
    """builtin.py:153"""
    return (
        f"SELECT COUNT(DISTINCT {column}) AS n_distinct FROM {table} "
        f"HAVING COUNT(DISTINCT {column}) <= 1"
    )


def not_null_proportion(table: str, column: str, threshold: float, dialect: str = SPARK) -> str:
    """builtin.py:179 — fails when the non-null proportion < threshold."""
    return (
        f"SELECT COUNT(*) AS n_rows, COUNT({column}) AS n_nonnull FROM {table} "
        f"HAVING CAST(COUNT({column}) AS DOUBLE) / COUNT(*) < {threshold}"
    )


def mean_in_range(table: str, column: str, low: float, high: float, dialect: str = SPARK) -> str:
    """builtin.py:502"""
    return (
        f"SELECT ROUND(AVG({column}), 4) AS stat FROM {table} "
        f"HAVING AVG({column}) < {low} OR AVG({column}) > {high}"
    )


def stddev_in_range(table: str, column: str, low: float, high: float, dialect: str = SPARK) -> str:
    """builtin.py:476 — sample stddev within [low, high]."""
    return (
        f"SELECT ROUND(STDDEV({column}), 4) AS stat FROM {table} "
        f"HAVING STDDEV({column}) < {low} OR STDDEV({column}) > {high}"
    )


def z_score(table: str, column: str, threshold: float, dialect: str = SPARK) -> str:
    """builtin.py:420 — rows whose |z| exceeds the threshold."""
    return f"""
WITH stats AS (SELECT AVG({column}) AS m, STDDEV({column}) AS s FROM {table})
SELECT {column} AS value, ROUND(({column} - m) / s, 4) AS z
FROM {table} CROSS JOIN stats
WHERE s > 0 AND ABS(({column} - m) / s) > {threshold}
"""


def kl_divergence(
    table: str,
    column: str,
    baseline: str,
    threshold: float,
    dialect: str = SPARK,
) -> str:
    """builtin.py:528 — KL(P‖Q) between the categorical distribution of
    `column` in `table` (P) and in `baseline` relation (Q); fails when the
    divergence exceeds the threshold. Categories absent from Q make KL
    infinite — flagged by the COALESCE(0) guard producing +inf in both
    engines is messy, so absent categories are excluded by the inner join
    (the separate `accepted_values` audit covers novel-category detection).
    """
    return f"""
WITH p AS (
  SELECT {column} AS v, CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM {table}) AS pr
  FROM {table} GROUP BY {column}
),
q AS (
  SELECT {column} AS v, CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM {baseline}) AS qr
  FROM {baseline} GROUP BY {column}
)
SELECT CAST(SUM(CAST(ROUND(p.pr * LN(p.pr / q.qr) * 1000000000) AS BIGINT)) AS DOUBLE) / 1000000000 AS kl
FROM p JOIN q ON p.v = q.v
HAVING SUM(p.pr * LN(p.pr / q.qr)) > {threshold}
"""


def chi_square(
    table: str, column_a: str, column_b: str, critical_value: float, dialect: str = SPARK
) -> str:
    """builtin.py:622 — χ² independence statistic over the contingency
    table of two categorical columns; fails when above the critical value."""
    return f"""
WITH obs AS (
  SELECT {column_a} AS a, {column_b} AS b, CAST(COUNT(*) AS DOUBLE) AS n
  FROM {table} GROUP BY {column_a}, {column_b}
),
tot AS (SELECT SUM(n) AS t FROM obs),
ra AS (SELECT a, SUM(n) AS na FROM obs GROUP BY a),
cb AS (SELECT b, SUM(n) AS nb FROM obs GROUP BY b)
SELECT CAST(SUM(CAST(ROUND((obs.n - ra.na * cb.nb / tot.t) * (obs.n - ra.na * cb.nb / tot.t)
                 / (ra.na * cb.nb / tot.t) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS chi2
FROM obs JOIN ra ON obs.a = ra.a JOIN cb ON obs.b = cb.b CROSS JOIN tot
HAVING SUM((obs.n - ra.na * cb.nb / tot.t) * (obs.n - ra.na * cb.nb / tot.t)
           / (ra.na * cb.nb / tot.t)) > {critical_value}
"""


# --------------------------------------------------------------------------
# Registry cases: each audit exercised on the synthetic tables, violations
# checked against the DuckDB oracle built from the same generator.
# --------------------------------------------------------------------------

from sqlmesh_spark.registry import register  # noqa: E402
from sqlmesh_spark.sources.tables import register_views  # noqa: E402

# (audit fn, kwargs, tables to register) — params chosen so several audits
# return non-empty violation sets against the synthetic data.
_CASES = {
    "audit_not_null": (not_null, dict(table="(SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders) o", columns=["o_custkey", "o_orderstatus"]), ("orders",)),
    "audit_not_empty_string": (not_empty_string, dict(table="documents", column="text"), ("documents",)),
    "audit_accepted_values": (accepted_values, dict(table="(SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders) o", column="o_orderstatus", values=["O", "F"]), ("orders",)),
    # events.ts is nanosecond-precision (Spark truncates to µs) — project it
    # away so SELECT * violation rows compare cleanly across engines.
    "audit_not_accepted_values": (not_accepted_values, dict(table="(SELECT event_id, user_id, event_type, value FROM events) e", column="event_type", values=["error"]), ("events",)),
    "audit_forall": (forall, dict(table="customer", criteria=["c_acctbal >= 0", "c_custkey > 0"]), ("customer",)),
    "audit_accepted_range": (accepted_range, dict(table="customer", column="c_acctbal", low=0, high=10000), ("customer",)),
    "audit_string_length_between": (string_length_between, dict(table="documents", column="text", min_len=50, max_len=600), ("documents",)),
    "audit_string_length_equal": (string_length_equal, dict(table="region", column="r_name", length=6), ("region",)),
    "audit_valid_uuid": (valid_uuid, dict(table="documents", column="source"), ("documents",)),
    "audit_valid_url": (valid_url, dict(table="documents", column="source"), ("documents",)),
    "audit_valid_email": (valid_email, dict(table="documents", column="source"), ("documents",)),
    "audit_valid_http_method": (valid_http_method, dict(table="(SELECT event_id, user_id, event_type, value FROM events) e", column="event_type"), ("events",)),
    "audit_match_regex_pattern_list": (match_regex_pattern_list, dict(table="part", column="p_type", patterns=["^STANDARD", "^SMALL"]), ("part",)),
    "audit_not_match_regex_pattern_list": (not_match_regex_pattern_list, dict(table="part", column="p_type", patterns=["BRUSHED"]), ("part",)),
    "audit_match_like_pattern_list": (match_like_pattern_list, dict(table="(SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders) o", column="o_orderpriority", patterns=["1-%", "2-%", "3-%"]), ("orders",)),
    "audit_not_match_like_pattern_list": (not_match_like_pattern_list, dict(table="(SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders) o", column="o_orderpriority", patterns=["5-%"]), ("orders",)),
    "audit_unique_values": (unique_values, dict(table="supplier", columns=["s_suppkey", "s_nationkey"]), ("supplier",)),
    "audit_unique_combination_of_columns": (unique_combination_of_columns, dict(table="lineitem", columns=["l_orderkey", "l_linenumber"]), ("lineitem",)),
    "audit_sequential_values": (sequential_values, dict(table="lineitem", column="l_linenumber"), ("lineitem",)),
    "audit_mutually_exclusive_ranges": (mutually_exclusive_ranges, dict(table="supplier", lower="s_acctbal", upper="s_acctbal + 100"), ("supplier",)),
    "audit_number_of_rows": (number_of_rows, dict(table="nation", threshold=100), ("nation",)),
    "audit_at_least_one": (at_least_one, dict(table="orders", column="o_totalprice"), ("orders",)),
    "audit_not_constant": (not_constant, dict(table="region", column="r_name"), ("region",)),
    "audit_not_null_proportion": (not_null_proportion, dict(table="documents", column="lang", threshold=0.999), ("documents",)),
    "audit_mean_in_range": (mean_in_range, dict(table="events", column="value", low=0.0, high=10.0), ("events",)),
    "audit_stddev_in_range": (stddev_in_range, dict(table="events", column="value", low=0.0, high=10.0), ("events",)),
    "audit_z_score": (z_score, dict(table="events", column="value", threshold=3.0), ("events",)),
    "audit_kl_divergence": (kl_divergence, dict(table="documents", column="lang", baseline="(SELECT * FROM documents WHERE doc_id % 2 = 0) b", threshold=0.0001), ("documents",)),
    "audit_chi_square": (chi_square, dict(table="orders", column_a="o_orderstatus", column_b="o_orderpriority", critical_value=1.0), ("orders",)),
}


def _make_case(fn, kwargs, tables):
    def run(spark, sf_dir):
        register_views(spark, sf_dir, tables)
        return spark.sql(fn(dialect=SPARK, **kwargs))

    return run


for _name, (_fn, _kwargs, _tables) in _CASES.items():
    register(_name, oracle=_fn(dialect=DUCKDB, **_kwargs), tags=("audit",))(
        _make_case(_fn, _kwargs, _tables)
    )
