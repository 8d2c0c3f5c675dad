"""SCD Type 2 — single-statement slowly-changing-dimension maintenance.

Re-derivation of the reference's ``_scd_type_2`` CTE pipeline
(sqlmesh/core/engine_adapter/base.py:1810-2201), the largest relational
operator in the reference (~390 LoC of AST building). Differences, both
Spark-first simplifications with identical results:

- native FULL OUTER JOIN instead of the LEFT ∪ RIGHT-where-unmatched
  emulation the reference needs for MySQL (base.py:2093-2148);
- ``deleted`` is the anti-join of closed history against current keys
  (the reference's filter at base.py:2060 is vacuous — latest.valid_to is
  NULL by construction — because latest_deleted is only consulted for keys
  with no current row; the anti-join states that intent directly).

The builder emits one dialect-agnostic SELECT, so the exact same generator
(a) runs on Spark and (b) composes the DuckDB oracle by nesting step N's
query as step N+1's target relation.

Pipeline (CTE names preserved from the reference for auditability):
  source        dedup snapshot, _exists flag
  static        closed history rows (valid_to IS NOT NULL)
  latest        current rows (valid_to IS NULL)
  deleted       closed rows for keys with no current row
  latest_deleted max(valid_to) per deleted key — revival watermark
  joined        latest ⟗ source, target cols prefixed t_*
  updated_rows  carried/closed/revived/new-key rows (COALESCE pattern)
  inserted_rows new version rows for changed keys
  final         static ∪ updated_rows ∪ inserted_rows
"""

from __future__ import annotations

from typing import Optional, Sequence

EPOCH0 = "TIMESTAMP '1970-01-01 00:00:00'"


def _ts(literal: str) -> str:
    return f"TIMESTAMP '{literal}'"


def scd_type_2_query(
    target_sql: str,
    source_sql: str,
    unique_key: Sequence[str],
    columns: Sequence[str],
    execution_ts: str,
    updated_at_col: Optional[str] = None,
    check_columns: Optional[Sequence[str]] = None,
    invalidate_hard_deletes: bool = True,
    updated_at_as_valid_from: bool = False,
    execution_time_as_valid_from: bool = False,
    truncate: bool = False,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    changes_only: bool = False,
) -> str:
    """Build the one-statement SCD2 maintenance query.

    ``columns`` are the unmanaged columns (including ``updated_at_col`` for
    the by-time variant); the output schema is columns + valid_from +
    valid_to. ``target_sql`` must yield the current dimension state with the
    managed columns; ``source_sql`` the new snapshot without them.

    ``changes_only=True`` drops the ``static`` branch from the final
    UNION: the result is updated_rows ∪ inserted_rows — every row of the
    next CURRENT slice plus the rows newly closed THIS run (any output
    row with non-NULL valid_to was closed now, since updated_rows only
    sees previously-current rows). This is the copy-on-write write set
    (backends.py scd2_apply_cow): closed history passes through
    untouched, so the apply never rewrites it.
    """
    if bool(updated_at_col) == bool(check_columns):
        raise ValueError("exactly one of updated_at_col / check_columns is required")
    keys = list(unique_key)
    cols = list(columns)
    vf, vt = valid_from_col, valid_to_col
    exec_ts = _ts(execution_ts)

    target_cols = cols + [vf, vt]
    key_eq = " AND ".join(f"latest.{k} = source.{k}" for k in keys)

    # source dedup: one row per key (reference: DISTINCT ON unique_key).
    order = f"{updated_at_col} DESC" if updated_at_col else ", ".join(keys)
    src_select = ", ".join(cols)
    source_cte = f"""source AS (
  SELECT TRUE AS _exists, {src_select} FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY {', '.join(keys)} ORDER BY {order}) AS _rn
    FROM ({source_sql}) raw_source
  ) s WHERE _rn = 1
)"""

    static_where = "LIMIT 0" if truncate else ""
    joined_t_cols = ", ".join(f"latest.{c} AS t_{c}" for c in target_cols)
    joined_s_cols = ", ".join(f"source.{c} AS {c}" for c in cols)

    ld_keys_sel = ", ".join(f"{k} AS _key{i}" for i, k in enumerate(keys))
    ld_join = " AND ".join(f"joined.{k} = latest_deleted._key{i}" for i, k in enumerate(keys))

    if updated_at_col:
        ua = updated_at_col
        updated_row_filter = f"joined.{ua} > joined.t_{ua}"
        start = f"joined.{ua}" if updated_at_as_valid_from else EPOCH0
        valid_from_case = f"""CASE
      WHEN joined.t_{vf} IS NULL AND latest_deleted._exists IS NOT NULL THEN
        CASE WHEN latest_deleted.{vt} > joined.{ua} THEN latest_deleted.{vt}
             ELSE joined.{ua} END
      WHEN joined.t_{vf} IS NULL THEN {start}
      ELSE joined.t_{vf} END"""
        delete_when = (
            f"WHEN joined._exists IS NULL THEN {exec_ts}" if invalidate_hard_deletes else ""
        )
        valid_to_case = f"""CASE WHEN {updated_row_filter} THEN joined.{ua}
      {delete_when}
      ELSE joined.t_{vt} END"""
        insert_valid_from = f"joined.{ua}"
    else:
        # Null-safe per-column change check — the 3-way OR triple the
        # reference emits (base.py:1938-1959).
        diffs = []
        for c in check_columns:  # type: ignore[union-attr]
            diffs.append(
                f"(joined.{c} <> joined.t_{c}"
                f" OR (joined.t_{c} IS NULL AND joined.{c} IS NOT NULL)"
                f" OR (joined.t_{c} IS NOT NULL AND joined.{c} IS NULL))"
            )
        key_not_null = " AND ".join(
            f"joined.t_{k} IS NOT NULL AND joined.{k} IS NOT NULL" for k in keys
        )
        updated_row_filter = f"({key_not_null}) AND ({' OR '.join(diffs)})"
        start = EPOCH0 if (truncate and not execution_time_as_valid_from) else exec_ts
        valid_from_case = f"COALESCE(joined.t_{vf}, {start})"
        delete_or_update = (
            f"joined._exists IS NULL OR ({updated_row_filter})"
            if invalidate_hard_deletes
            else f"({updated_row_filter})"
        )
        valid_to_case = f"CASE WHEN {delete_or_update} THEN {exec_ts} ELSE joined.t_{vt} END"
        insert_valid_from = exec_ts

    updated_unmanaged = ", ".join(f"COALESCE(joined.t_{c}, joined.{c}) AS {c}" for c in cols)
    final_cols = ", ".join(target_cols)

    return f"""
WITH target AS ({target_sql}),
{source_cte},
static AS (
  SELECT {final_cols}, TRUE AS _exists FROM target WHERE {vt} IS NOT NULL {static_where}
),
latest AS (
  SELECT {final_cols}, TRUE AS _exists FROM target WHERE {vt} IS NULL {static_where}
),
deleted AS (
  SELECT static.* FROM static
  LEFT JOIN latest ON {' AND '.join(f'static.{k} = latest.{k}' for k in keys)}
  WHERE latest._exists IS NULL
),
latest_deleted AS (
  SELECT TRUE AS _exists, {ld_keys_sel}, MAX({vt}) AS {vt}
  FROM deleted GROUP BY {', '.join(keys)}
),
joined AS (
  SELECT source._exists AS _exists, {joined_t_cols}, {joined_s_cols}
  FROM latest FULL OUTER JOIN source ON {key_eq}
),
updated_rows AS (
  SELECT {updated_unmanaged},
         {valid_from_case} AS {vf},
         {valid_to_case} AS {vt}
  FROM joined LEFT JOIN latest_deleted ON {ld_join}
),
inserted_rows AS (
  SELECT {', '.join(f'joined.{c} AS {c}' for c in cols)},
         {insert_valid_from} AS {vf},
         CAST(NULL AS TIMESTAMP) AS {vt}
  FROM joined WHERE {updated_row_filter}
)
{"" if changes_only else f"SELECT {final_cols} FROM static UNION ALL "}SELECT {final_cols} FROM updated_rows
UNION ALL SELECT {final_cols} FROM inserted_rows
"""


def empty_target_sql(columns: Sequence[str], types: Sequence[str]) -> str:
    """A zero-row target relation with the right schema for initial loads."""
    typed = ", ".join(
        f"CAST(NULL AS {t}) AS {c}" for c, t in zip(columns, types)
    )
    return f"SELECT {typed} WHERE FALSE"
