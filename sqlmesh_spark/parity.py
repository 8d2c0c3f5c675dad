"""Local mirror of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle side-by-side over the
same parquet and compares row-count, column names, and an order-insensitive
value representation. Used by tests; stricter-is-fine: exact string equality
after canonicalization.
"""

from __future__ import annotations

import math
from typing import Optional

import duckdb
import pandas as pd

from sqlmesh_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        # Deliberately dtype-sensitive: the driver's value-hash distinguishes
        # float64 `3862161901.0` from int64 `3862161901` (round-2 VERDICT "What's
        # wrong" #1). Collapsing integral floats here masked oracle-dtype bugs
        # (DuckDB SUM(bigint) -> HUGEINT -> pandas float64); oracles must
        # CAST(... AS BIGINT) instead so builder-green implies driver-green.
        return repr(float(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def driver_canon_check(df: pd.DataFrame) -> Optional[str]:
    """Reproduce the DRIVER's canonicalization step on raw cells.

    The driver's correctness gate sorts the result frame with pandas
    ``sort_values`` over all columns BEFORE hashing — raw cells, no
    stringification.  That step dies on unhashable cells (``list``/``dict``
    from ARRAY/MAP/STRUCT columns: round-8's only red row,
    ``TypeError: unhashable type: 'list'``) and on mixed-type object
    columns.  Local verification must fail the same way, so this runs the
    identical operation and returns the failure string (or None).  Registry
    cases must serialize container outputs (``array_join``/``to_json``)
    on BOTH the Spark and oracle sides.
    """
    try:
        df.sort_values(by=sorted(df.columns), kind="mergesort")
    except Exception as exc:  # noqa: BLE001 - the point is to surface any crash
        return f"driver canon would fail: {type(exc).__name__}: {exc}"
    return None


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


def compare_case(
    spark,
    sf_dir: str,
    name: str,
    fn,
    oracle: Optional[str],
    limit_mismatches: int = 5,
) -> dict:
    sdf = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    result = {
        "name": name,
        "rows": len(spark_pdf),
        "columns": sorted(spark_pdf.columns),
        "match": None,
        "detail": "",
    }
    if oracle is None:
        result["match"] = len(spark_pdf) >= 0
        result["detail"] = "rows-only (no oracle)"
        return result
    canon_err = driver_canon_check(spark_pdf)
    if canon_err:
        result["match"] = False
        result["detail"] = canon_err
        return result
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        result["match"] = False
        result["detail"] = f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        return result
    if len(spark_pdf) != len(duck_pdf):
        result["match"] = False
        result["detail"] = f"row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}"
        return result
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows == d_rows:
        result["match"] = True
        return result
    diffs = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ][:limit_mismatches]
    result["match"] = False
    result["detail"] = f"value mismatch, first diffs: {diffs}"
    return result
