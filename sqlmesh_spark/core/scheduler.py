"""Scheduler + snapshot evaluator: interval computation → rendered SQL →
materialization strategy → audits → interval recording.

Reference: Scheduler.run (scheduler.py:259) → merged_missing_intervals
(:1022) → batch_intervals (:334) → SnapshotEvaluator.evaluate
(snapshot/evaluator.py:150, strategies :1693-3200) → audits (:547) →
state_sync.add_interval (:254).

Parallelism: independent DAG branches execute on a thread pool — the Spark
scheduler is thread-safe and local[N]/FAIR pools overlap their stages
(utils/concurrency.py:178 concurrent_apply_to_dag equivalent).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Mapping, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from sqlmesh_spark import audits as audit_lib
from sqlmesh_spark.adapter import SparkAdapter
from sqlmesh_spark.core.model import Model, ModelKind, _unquote
from sqlmesh_spark.core.snapshot import (
    Snapshot,
    batch_intervals,
    floor_to,
    from_epoch,
    interval_unit,
    missing_intervals,
    model_interval_unit,
    prev_unit,
    snapshots_to_dag,
    to_epoch,
)
from sqlmesh_spark.core.state import StateStore
from sqlmesh_spark.macros import MacroEvaluator, temporal_variables
from sqlmesh_spark.operators.scd2 import scd_type_2_query


class AuditError(Exception):
    pass


import contextlib as _contextlib
import threading as _threading

# Serializes evaluations that set session-global Spark confs (see
# SnapshotEvaluator.evaluate); conf-less models never take it.
_SESSION_CONF_LOCK = _threading.Lock()
_NULL_LOCK = _contextlib.nullcontext()


import re as _re

_NUMERIC_RE = _re.compile(r"^-?\d+(\.\d+)?$")


# Custom materialization registry (reference evaluator.py:2812): name →
# fn(evaluator, snapshot, df, start, end). Users register via
# register_custom_materialization().
CUSTOM_MATERIALIZATIONS: dict[str, "t_CustomFn"] = {}


def register_custom_materialization(name: str, fn) -> None:
    CUSTOM_MATERIALIZATIONS[name.lower()] = fn


# Render cache (reference model/cache.py:1-234 caches optimized renders
# keyed by fingerprint): a snapshot's version hash covers its query, kind
# args, and (recursively) its parents, so (version, start, end, mapping)
# fully determines the rendered SQL — a 5,000-model DAG re-planning an
# unchanged project re-renders nothing. Schema-consuming (@STAR/@UNION)
# queries bypass the cache: a forward-only ALTER can change an upstream
# schema without changing any version.
_RENDER_CACHE: dict[tuple, str] = {}
RENDER_STATS = {"hits": 0, "misses": 0}
_RENDER_CACHE_MAX = 4096


class SnapshotEvaluator:
    """kind → materialization strategy dispatch
    (evaluator.py:1643 _evaluation_strategy)."""

    def __init__(
        self,
        spark: SparkSession,
        adapter: Optional[SparkAdapter] = None,
        execution_time: Optional[str] = None,
    ):
        self.spark = spark
        self.adapter = adapter or SparkAdapter(spark)
        # reference plan/run arg execution_time: pins @execution_ts/_ds
        # (defaults to the interval end) — reproducible re-renders.
        self.execution_time = execution_time

    def render(
        self,
        snapshot: Snapshot,
        start: str,
        end: str,
        table_mapping: Mapping[str, str],
    ) -> str:
        """Macro-render the model query and resolve model references to
        physical snapshot tables (renderer.py:527 + _resolve_tables)."""
        from sqlmesh_spark.core.inference import needs_schemas

        cacheable = not needs_schemas(snapshot.model.query)
        key = ()
        if cacheable:
            # The key carries a hash of the RAW QUERY TEXT in addition to
            # the version: a forward-only plan pins a snapshot to its OLD
            # version while carrying NEW query text, so version alone no
            # longer determines the rendered SQL (a stale hit would
            # evaluate the old logic and silently drop the change).
            import hashlib as _hashlib

            key = (
                snapshot.version,
                _hashlib.md5(snapshot.model.query.encode()).hexdigest()[:12],
                snapshot.model.name,
                start,
                end,
                self.execution_time,
                tuple(sorted(table_mapping.items())),
            )
            cached = _RENDER_CACHE.get(key)
            if cached is not None:
                RENDER_STATS["hits"] += 1
                return cached
            RENDER_STATS["misses"] += 1
        variables = temporal_variables(start, end, execution=self.execution_time)
        variables["this_model"] = snapshot.table_name
        # Evaluation-context vars (renderer.py:140-151).
        variables["model_kind_name"] = f"'{snapshot.model.kind.value}'"
        # Blueprint-bound variables (definition.py:2035) — @VAR lookups.
        variables.update(snapshot.model.variables)
        # Schema-consuming macros (@STAR/@UNION) resolve upstream schemas
        # from the live physical relations (parents materialize first in
        # DAG order) — render-time type inference, definition.py:1449-1482.
        schemas: Mapping[str, Mapping[str, str]] = {}
        from sqlmesh_spark.core.inference import needs_schemas, upstream_schemas

        if needs_schemas(snapshot.model.query):
            schemas = upstream_schemas(self.spark, snapshot.model, table_mapping)
        sql = MacroEvaluator(variables=variables, schemas=schemas).render(snapshot.model.query)
        # Read-dialect transpilation AFTER macro expansion (macros emit
        # Spark SQL; the model author's text is what carries the dialect —
        # reference renderer.py:517 normalizes through model.dialect) and
        # BEFORE physical-name resolution (transpile never touches tables).
        if snapshot.model.dialect and snapshot.model.dialect != "spark":
            from sqlmesh_spark.core.transpile import transpile

            sql = transpile(sql, snapshot.model.dialect)
        # Physical-name resolution: longest names first so db.a.b wins.
        for logical, physical in sorted(table_mapping.items(), key=lambda kv: -len(kv[0])):
            sql = _replace_table_ref(sql, logical, physical)
        if cacheable:
            if len(_RENDER_CACHE) >= _RENDER_CACHE_MAX:
                _RENDER_CACHE.clear()
            _RENDER_CACHE[key] = sql
        return sql

    def render_statement(
        self,
        stmt: str,
        snapshot: Snapshot,
        start: str,
        end: str,
        table_mapping: Mapping[str, str],
        this_model: Optional[str] = None,
    ) -> str:
        """Render a pre/post/on_virtual_update statement (definition.py:357
        render_pre_statements): same macro + table-resolution pipeline as
        the query, uncached."""
        variables = temporal_variables(start, end, execution=self.execution_time)
        variables["this_model"] = this_model or snapshot.table_name
        # Pre-quoted literal form, for statements that need the resolved
        # name as a STRING (logs, messages) rather than a table ref.
        variables["this_model_name"] = f"'{this_model or snapshot.table_name}'"
        variables["model_kind_name"] = f"'{snapshot.model.kind.value}'"
        variables.update(snapshot.model.variables)
        sql = MacroEvaluator(variables=variables).render(stmt)
        if snapshot.model.dialect and snapshot.model.dialect != "spark":
            from sqlmesh_spark.core.transpile import transpile

            sql = transpile(sql, snapshot.model.dialect)
        for logical, physical in sorted(table_mapping.items(), key=lambda kv: -len(kv[0])):
            sql = _replace_table_ref(sql, logical, physical)
        return sql

    def evaluate(
        self,
        snapshot: Snapshot,
        start: str,
        end: str,
        table_mapping: Mapping[str, str],
        is_first_insert: bool,
    ) -> None:
        """Core of evaluator.py:677 _evaluate_snapshot."""
        model = snapshot.model
        adapter = self.adapter
        table = snapshot.table_name
        adapter.create_schema(snapshot.physical_schema)

        if model.kind in (ModelKind.EMBEDDED, ModelKind.EXTERNAL):
            return
        # Pre-statements (evaluator runs them in the same transaction
        # scope as the evaluation — definition.py:156 pre_statements_).
        for stmt in model.pre_statements:
            self.spark.sql(self.render_statement(stmt, snapshot, start, end, table_mapping))
        # session_properties (meta.py:109): per-model Spark confs for the
        # duration of this evaluation (shuffle partitions, AQE knobs, ...),
        # restored afterward so models can't leak tuning into each other.
        # Spark confs are SESSION-GLOBAL and the scheduler runs DAG levels
        # on a thread pool, so models that declare session_properties
        # serialize behind a lock — otherwise a concurrent model's
        # save/restore interleaving can permanently clobber a conf (and
        # its evaluation would silently run under the other model's
        # tuning). Models without session_properties never touch confs
        # and proceed fully parallel.
        lock = _SESSION_CONF_LOCK if model.session_properties else _NULL_LOCK
        with lock:
            saved: dict[str, object] = {}
            for k, v in model.session_properties.items():
                try:
                    saved[k] = self.spark.conf.get(k)
                except Exception:  # noqa: BLE001 - unset conf
                    saved[k] = None
                self.spark.conf.set(k, v)
            self._evaluate_scoped(
                snapshot, start, end, table_mapping, is_first_insert, saved
            )

    def _evaluate_scoped(
        self, snapshot, start, end, table_mapping, is_first_insert, saved
    ) -> None:
        model = snapshot.model
        # Explicit success flag rather than inspecting __context__ on the
        # post-statement exception: PySpark raises converted exceptions
        # inside its own except handlers (`raise ... from None` still sets
        # __context__), so __context__ is set even when OUR evaluation
        # succeeded — the old check silently swallowed real post failures.
        evaluation_raised = True
        try:
            self._evaluate_inner(snapshot, start, end, table_mapping, is_first_insert)
            # physical_properties (meta.py:107) → TBLPROPERTIES on the
            # physical snapshot table (views excluded), re-applied after
            # every write since full refreshes recreate the table.
            if model.physical_properties and model.kind != ModelKind.VIEW and \
                    self.adapter.table_exists(snapshot.table_name):
                props = ", ".join(
                    f"'{k}' = '{v}'" for k, v in sorted(model.physical_properties.items())
                )
                self.spark.sql(
                    f"ALTER TABLE {snapshot.table_name} SET TBLPROPERTIES ({props})"
                )
            evaluation_raised = False
        finally:
            # Post-statements run even when the evaluation fails — they
            # release what pre-statements acquired (caches, temp objects).
            # They run INSIDE the conf scope (the same-scope contract with
            # pre-statements). A post failure during an in-flight
            # evaluation exception is logged, never allowed to MASK it; a
            # post failure after a SUCCESSFUL evaluation propagates.
            try:
                for stmt in model.post_statements:
                    self.spark.sql(
                        self.render_statement(stmt, snapshot, start, end, table_mapping)
                    )
            except Exception:  # noqa: BLE001
                import logging as _logging

                _logging.getLogger("sqlmesh_spark").exception(
                    "post-statement failed for %s", model.name
                )
                if not evaluation_raised:
                    raise
            finally:
                for k, v in saved.items():
                    if v is None:
                        self.spark.conf.unset(k)
                    else:
                        self.spark.conf.set(k, v)

    def _evaluate_inner(
        self,
        snapshot: Snapshot,
        start: str,
        end: str,
        table_mapping: Mapping[str, str],
        is_first_insert: bool,
    ) -> None:
        model = snapshot.model
        adapter = self.adapter
        table = snapshot.table_name
        if model.kind == ModelKind.SEED:
            adapter.load_seed(table, model.seed_csv or "", model.columns)
            return

        if model.python_fn is not None:
            # Python model: call the function with an execution context
            # (model/definition.py:1896-1941 render path; DataFrames are
            # first-class returns per spark.py:224-231).
            from sqlmesh_spark.core.python_model import ExecutionContext

            df = model.python_fn(
                ExecutionContext(self.spark, start, end, dict(table_mapping))
            )
            # Generator models (definition.py:1896-1941: the evaluator
            # consumes generators frame-by-frame) — union the yielded
            # frames; each stays lazy, so this is a plan-level UNION ALL.
            if not isinstance(df, DataFrame):
                from functools import reduce

                frames = list(df)
                if not frames:
                    raise ValueError(f"python model {model.name} yielded no frames")
                df = reduce(lambda a, b: a.unionByName(b), frames)
            if model.kind in (ModelKind.FULL, ModelKind.VIEW, ModelKind.MANAGED):
                # VIEW-with-python materializes (a view cannot capture a
                # DataFrame); FULL semantics are identical. MANAGED python
                # models refresh like FULL (emulated engine refresh).
                adapter.replace_query(table, df)
                return
        else:
            if (
                "@this_model" in model.query
                and model.kind
                in (
                    ModelKind.INCREMENTAL_BY_TIME_RANGE,
                    ModelKind.INCREMENTAL_BY_UNIQUE_KEY,
                    ModelKind.INCREMENTAL_UNMANAGED,
                )
                and not adapter.table_exists(table)
            ):
                # Self-referencing incremental (depends_on_past): the query
                # reads its own previous state, so ANALYSIS needs the table
                # to exist before the first batch renders. The reference
                # creates it from columns_to_types (evaluator create stage);
                # self-reference makes inference circular, so declared
                # columns are required.
                if not model.columns:
                    raise ValueError(
                        f"self-referencing model {model.name} must declare "
                        "columns (...) — the table is created from them "
                        "before the first batch"
                    )
                casts = ", ".join(
                    f"CAST(NULL AS {t}) AS {c}" for c, t in model.columns.items()
                )
                empty = self.spark.sql(f"SELECT {casts} WHERE FALSE")
                if model.kind == ModelKind.INCREMENTAL_BY_TIME_RANGE:
                    empty = empty.withColumn("_ds", F.lit(None).cast("string"))
                    adapter.ctas(table, empty, partitioned_by=("_ds",))
                else:
                    adapter.ctas(table, empty)
            sql = self.render(snapshot, start, end, table_mapping)
            if model.kind == ModelKind.VIEW:
                adapter.create_view(table, sql)
                return
            if model.kind == ModelKind.FULL:
                adapter.replace_query(
                    table, sql,
                    partitioned_by=model.partitioned_by,
                    clustered_by=model.clustered_by,
                    buckets=model.buckets,
                    storage_format=model.storage_format,
                )
                return
            if model.kind == ModelKind.MANAGED:
                # EngineManagedStrategy (evaluator.py:3089): create a
                # managed table from the defining query; each scheduled
                # tick performs the refresh the managing engine would.
                if not adapter.table_exists(table):
                    adapter.create_managed_table(
                        table, sql, partitioned_by=model.partitioned_by
                    )
                else:
                    adapter.refresh_managed_table(table, sql)
                return
            df = self.spark.sql(sql)
        if model.kind == ModelKind.INCREMENTAL_BY_TIME_RANGE:
            time_col = model.time_column or "ds"
            # kind.py:471 partition_by_time_column (default true): false
            # opts out of the derived-day partitioning — the table stays
            # unpartitioned and interval overwrites take the adapter's
            # DELETE_INSERT fallback (engines/layouts where partitioning
            # on time is wrong, e.g. when the model partitions by
            # something else entirely).
            part_by_time = model.kind_args.get(
                "partition_by_time_column", "true"
            ).strip("'\"").lower() != "false"
            if part_by_time:
                if is_first_insert and not adapter.table_exists(table):
                    # Partition on a derived day column so interval
                    # overwrites prune to exactly the touched partitions.
                    with_ds = df.withColumn("_ds", F.date_format(F.col(time_col), "yyyy-MM-dd"))
                    adapter.ctas(table, with_ds.limit(0), partitioned_by=("_ds",))
                batch = df.withColumn("_ds", F.date_format(F.col(time_col), "yyyy-MM-dd"))
            else:
                if is_first_insert and not adapter.table_exists(table):
                    adapter.ctas(table, df.limit(0))
                batch = df
            adapter.insert_overwrite_by_time_partition(table, batch, time_col, start, end)
        elif model.kind == ModelKind.INCREMENTAL_BY_UNIQUE_KEY:
            if is_first_insert and not adapter.table_exists(table):
                adapter.ctas(table, df)
            else:
                adapter.merge(table, df, unique_key=model.unique_key)
        elif model.kind == ModelKind.INCREMENTAL_BY_PARTITION:
            if is_first_insert and not adapter.table_exists(table):
                adapter.ctas(table, df, partitioned_by=model.partitioned_by)
            else:
                adapter.insert_overwrite_by_partition(table, df)
        elif model.kind == ModelKind.INCREMENTAL_UNMANAGED:
            if is_first_insert and not adapter.table_exists(table):
                adapter.ctas(table, df)
            else:
                adapter.insert_append(table, df)
        elif model.kind == ModelKind.CUSTOM:
            # Custom materialization plugin point (evaluator.py:2812
            # CustomMaterialization): a registered strategy owns the write.
            name = model.kind_args.get("materialization", "")
            CUSTOM_MATERIALIZATIONS[name](self, snapshot, df, start, end)
        elif model.kind in (ModelKind.SCD_TYPE_2_BY_TIME, ModelKind.SCD_TYPE_2_BY_COLUMN):
            # SCD2 consumes the source as SQL text; a python model's frame
            # goes through a temp view handle.
            if model.python_fn is not None:
                view = f"_py_src_{snapshot.version}"
                df.createOrReplaceTempView(view)
                self._evaluate_scd2(snapshot, f"SELECT * FROM {view}", end)
            else:
                self._evaluate_scd2(snapshot, sql, end)
        else:  # pragma: no cover
            raise NotImplementedError(model.kind)

    def _evaluate_scd2(self, snapshot: Snapshot, source_sql: str, end: str) -> None:
        model = snapshot.model
        adapter = self.adapter
        table = snapshot.table_name
        source_cols = list(self.spark.sql(source_sql).columns)
        first = not adapter.table_exists(table)
        if first:
            types = dict(self.spark.sql(source_sql).dtypes)
            typed = ", ".join(
                f"CAST(NULL AS {types[c]}) AS {c}" for c in source_cols
            )
            target_sql = (
                f"SELECT {typed}, CAST(NULL AS TIMESTAMP) AS valid_from,"
                f" CAST(NULL AS TIMESTAMP) AS valid_to WHERE FALSE"
            )
        else:
            target_sql = f"SELECT * FROM {table}"
        kwargs: dict = dict(
            target_sql=target_sql,
            source_sql=source_sql,
            unique_key=model.unique_key,
            columns=source_cols,
            execution_ts=end,
            truncate=first,
        )
        if model.kind == ModelKind.SCD_TYPE_2_BY_TIME:
            kwargs["updated_at_col"] = model.kind_args.get("updated_at_name", "updated_at")
        else:
            check = model.kind_args.get("columns", "")
            kwargs["check_columns"] = tuple(
                c.strip() for c in check.split(",") if c.strip()
            ) or tuple(c for c in source_cols if c not in model.unique_key)
        # partition_by_current: opt the dimension into the copy-on-write
        # tail (backends.py scd2_apply_cow) — the table partitions on the
        # engine-managed _is_current flag, closed history is APPEND-ONLY,
        # and each apply rewrites O(|current| + |batch|), never O(history).
        # The _is_current column stays physical-only: the virtual layer
        # view hides `_`-prefixed engine columns (plan.py promote).
        cow = model.kind_args.get("partition_by_current", "").lower() in ("true", "1")
        if not cow:
            adapter.replace_query(table, self.spark.sql(scd_type_2_query(**kwargs)))
            return
        if first:
            types = dict(self.spark.sql(source_sql).dtypes)
            schema = {c: types[c] for c in source_cols}
            schema["valid_from"] = "TIMESTAMP"
            schema["valid_to"] = "TIMESTAMP"
            schema[adapter.backend.CURRENT_COL] = "INT"
            adapter.create_table(
                table, schema, partitioned_by=(adapter.backend.CURRENT_COL,)
            )
        else:
            managed = ", ".join(source_cols + ["valid_from", "valid_to"])
            kwargs["target_sql"] = f"SELECT {managed} FROM {table}"
        changes = self.spark.sql(scd_type_2_query(changes_only=True, **kwargs))
        adapter.backend.scd2_apply_cow(table, changes)

    # -- audits (evaluator.py:547; scheduler.py:887) ------------------------

    def run_audits(
        self,
        snapshot: Snapshot,
        start: Optional[str] = None,
        end: Optional[str] = None,
    ) -> list[str]:
        """Returns BLOCKING failures; non-blocking audits (audit arg
        `blocking = false`, audit/definition.py blocking flag) only warn.

        When the model is incremental with a time column and [start, end)
        is given, audits scope to the just-written interval (the
        reference renders @this_model with the evaluated batch —
        audit/definition.py:194): the audit cost is O(batch), never
        O(table) — the difference between auditable and un-auditable at
        100 TB. Whole-table audits remain for wholesale kinds."""
        import logging

        relation = snapshot.table_name
        tc = snapshot.model.time_column
        if start is not None and end is not None and tc:
            relation = (
                f"(SELECT * FROM {snapshot.table_name} "
                f"WHERE {tc} >= CAST('{start}' AS TIMESTAMP) "
                f"AND {tc} < CAST('{end}' AS TIMESTAMP)) AS _audit_scope"
            )
        failures = []
        custom = getattr(self, "custom_audits", {})
        for name, args in snapshot.model.audits:
            kwargs = dict(args)
            if name in custom:
                # Custom model audit (audit/definition.py:121): render its
                # violation query with @this_model bound to the audited
                # relation and defaults/args bound as @vars.
                audit_def = custom[name]
                blocking_default = "true" if audit_def.blocking else "false"
                blocking = (
                    _unquote(str(kwargs.pop("blocking", blocking_default))).lower()
                    != "false"
                )
                variables: dict[str, str] = {"this_model": relation}
                for k, v in {**audit_def.defaults, **kwargs}.items():
                    # Args are RAW tokens: numbers and 'quoted' string
                    # literals bind verbatim, and a bare identifier binds
                    # verbatim too — i.e. as a COLUMN REFERENCE, not a
                    # quoted constant. (Quoting everything non-numeric made
                    # `column = some_col` a constant string, so the audit
                    # vacuously passed — the safety check silently off.)
                    variables[k] = v if isinstance(v, str) else str(v)
                sql = MacroEvaluator(variables=variables).render(audit_def.query)
            else:
                fn = getattr(audit_lib, name, None)
                if fn is None:
                    raise AuditError(
                        f"unknown audit {name!r} on {snapshot.model.name}"
                    )
                blocking = (
                    _unquote(str(kwargs.pop("blocking", "true"))).lower() != "false"
                )
                # SQL-level audits take the physical table as relation.
                # Builtin audit fns expect UNQUOTED scalar args (they quote
                # internally where needed) — strip the raw tokens' quotes.
                kwargs = {
                    k: _unquote(v) if isinstance(v, str) else v
                    for k, v in kwargs.items()
                }
                sql = fn(table=relation, dialect=audit_lib.SPARK, **kwargs)
            n_bad = self.spark.sql(sql).limit(1).count()
            if n_bad > 0:
                if blocking:
                    failures.append(name)
                else:
                    logging.getLogger("sqlmesh_spark").warning(
                        "non-blocking audit %s failed on %s", name, snapshot.model.name
                    )
        return failures


def _replace_table_ref(sql: str, logical: str, physical: str) -> str:
    import re

    # The replacement is a CALLABLE: `physical` may be an EMBEDDED model's
    # inlined query text containing backslashes (regexp_extract patterns)
    # that a template-string re.sub would reinterpret ('bad escape \d').
    return re.sub(
        rf"(?<![\w.]){re.escape(logical)}(?![\w.])",
        lambda _m: physical,
        sql,
        flags=re.IGNORECASE,
    )


def _weekly_cron_boundary(epoch: int, dow_field: str) -> int:
    """Most recent occurrence (epoch seconds, UTC midnight) of a weekly
    cron's day-of-week at or before ``epoch``.

    A bare ``epoch // 7d`` floor lands on Thursdays (epoch day 0,
    1970-01-01, was a Thursday), so ``'0 0 * * 1'`` would restate on a
    Thursday grid — up to 6 days off the declared Monday. Anchor the
    7-day grid to the cron's target day instead. Lists/ranges/steps in
    the field use their FIRST day (one weekly cadence per model).
    """
    dow_names = {
        "sun": 0, "mon": 1, "tue": 2, "wed": 3, "thu": 4, "fri": 5, "sat": 6,
    }
    tok = _re.split(r"[,/-]", dow_field)[0].strip().lower()
    if tok.isdigit():
        cron_dow = int(tok) % 7  # cron allows 7 == Sunday
    elif tok[:3] in dow_names:
        cron_dow = dow_names[tok[:3]]
    else:
        # Defaulting would silently reintroduce the Thursday grid this
        # function exists to fix — unsupported fields fail loudly.
        raise ValueError(
            f"unsupported day-of-week field {dow_field!r} in "
            "auto_restatement_cron; use 0-7 or SUN..SAT"
        )
    # epoch day d falls on cron dow w exactly when d % 7 == (w - 4) % 7.
    off = ((cron_dow - 4) % 7) * 86400
    week = 7 * 86400
    return (epoch - off) // week * week + off


class Scheduler:
    """Missing-interval computation + ordered (parallel) evaluation
    (scheduler.py:259 run)."""

    def __init__(
        self,
        spark: SparkSession,
        state: StateStore,
        snapshots: Mapping[str, Snapshot],
        max_workers: int = 4,
        custom_audits: Optional[Mapping[str, object]] = None,
        execution_time: Optional[str] = None,
        ignore_cron: bool = False,
        backfill_models: Optional[set] = None,
    ):
        self.spark = spark
        self.state = state
        self.snapshots = dict(snapshots)
        # reference run arg ignore_cron: process the trailing partial unit
        # regardless of cron completion (allow_partials for every model,
        # one run only).
        self.ignore_cron = ignore_cron
        # reference plan arg backfill_models: restrict interval processing
        # to these models; everything else gets snapshots and views only.
        self.backfill_models = backfill_models
        self.evaluator = SnapshotEvaluator(spark, execution_time=execution_time)
        self.evaluator.custom_audits = dict(custom_audits or {})
        self.max_workers = max_workers

    def table_mapping(self) -> dict[str, str]:
        """Logical model name → physical relation. EMBEDDED models inline
        their (macro-rendered) query text into dependents (the reference's
        embedded semantics); EXTERNAL models reference themselves."""
        from sqlmesh_spark.macros import MacroEvaluator

        out: dict[str, str] = {}
        for name, s in self.snapshots.items():
            if s.model.kind == ModelKind.EMBEDDED:
                inlined = MacroEvaluator().render(s.model.query)
                if s.model.dialect and s.model.dialect != "spark":
                    from sqlmesh_spark.core.transpile import transpile

                    inlined = transpile(inlined, s.model.dialect)
                out[name] = "(" + inlined + ")"
            elif s.model.kind == ModelKind.EXTERNAL:
                out[name] = name
            else:
                out[name] = s.table_name
        # Resolve model refs INSIDE embedded inlined text here (to a
        # fixpoint, for embedded-of-embedded): render()'s single
        # longest-first pass over the final SQL cannot reach a parent name
        # that only appears after the embedded text is substituted in.
        for _ in range(5):
            changed = False
            for name, s in self.snapshots.items():
                if s.model.kind != ModelKind.EMBEDDED:
                    continue
                text = out[name]
                for logical, physical in sorted(out.items(), key=lambda kv: -len(kv[0])):
                    if logical == name:
                        continue
                    new_text = _replace_table_ref(text, logical, physical)
                    if new_text != text:
                        text = new_text
                        changed = True
                out[name] = text
            if not changed:
                break
        return out

    def run(self, start: str, end: str) -> dict[str, int]:
        """Backfill every snapshot's missing intervals in DAG order.
        Returns {model: n_batches_executed}."""
        order = snapshots_to_dag(self.snapshots)
        mapping = self.table_mapping()
        executed: dict[str, int] = {}
        # Level-parallel execution: models whose parents are all done run
        # concurrently (concurrent_apply_to_dag analog). In-DAG parent
        # sets are computed once — rebuilding set(self.snapshots) per
        # candidate per level made level selection O(levels × N²).
        known = set(self.snapshots)
        in_dag_parents = {
            n: set(self.snapshots[n].parents) & known for n in order
        }
        done: set[str] = set()
        remaining = list(order)
        while remaining:
            level = [n for n in remaining if in_dag_parents[n] <= done]
            with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
                counts = pool.map(
                    lambda n: self._run_snapshot(self.snapshots[n], start, end, mapping),
                    level,
                )
            for n, c in zip(level, counts):
                executed[n] = c
                done.add(n)
            remaining = [n for n in remaining if n not in done]
        return executed

    def _run_snapshot(
        self, snapshot: Snapshot, start: str, end: str, mapping: Mapping[str, str]
    ) -> int:
        model = snapshot.model
        if self.backfill_models is not None and model.name not in self.backfill_models:
            return 0
        unit = model_interval_unit(model)
        eff_start = model.start or start
        processed = self.state.get_intervals(model.name, snapshot.version)

        # Periodic auto-restatement (kind.py auto_restatement_cron /
        # auto_restatement_intervals; recorded in _auto_restatements): when
        # a new auto-restatement period begins, the trailing N model-cron
        # intervals are dropped from state so this run recomputes them —
        # scheduled healing for slowly-settling upstream data, without a
        # manual restate.
        ar_cron = model.kind_args.get("auto_restatement_cron", "").strip("'\"")
        if ar_cron and processed:
            ar_n = int(model.kind_args.get("auto_restatement_intervals", "1").strip("'\"") or 1)
            # Weekly crons ('0 0 * * 1': dow restricted, dom free) have no
            # rung on the interval-unit ladder — interval_unit would floor
            # them to DAY and fire the restatement EVERY day (7× the
            # intended recompute). Use a fixed 7-day cadence for them.
            ar_fields = ar_cron.split()
            if (
                len(ar_fields) == 5
                and ar_fields[2] == "*"
                and ar_fields[4] not in ("*", "?")
                # `*/N` step fields fire multiple days a week — not a
                # weekly cadence; they stay on the interval-unit ladder.
                and not ar_fields[4].startswith("*")
            ):
                boundary = _weekly_cron_boundary(to_epoch(end), ar_fields[4])
            else:
                boundary = floor_to(to_epoch(end), interval_unit(ar_cron))
            last = self.state.get_auto_restatement(model.name, snapshot.version)
            if last is None or last < boundary:
                hi = max(e for _, e in processed)
                lo = hi
                for _ in range(ar_n):
                    lo = prev_unit(lo, unit)
                self.state.remove_intervals(model.name, snapshot.version, lo, hi)
                self.state.put_auto_restatement(model.name, snapshot.version, boundary)
                processed = self.state.get_intervals(model.name, snapshot.version)

        if model.kind in (
            ModelKind.INCREMENTAL_BY_TIME_RANGE,
            ModelKind.INCREMENTAL_BY_UNIQUE_KEY,
            ModelKind.INCREMENTAL_BY_PARTITION,
            ModelKind.INCREMENTAL_UNMANAGED,
            ModelKind.SCD_TYPE_2_BY_TIME,
            ModelKind.SCD_TYPE_2_BY_COLUMN,
        ):
            chunks = missing_intervals(
                eff_start,
                end,
                processed,
                unit=unit,
                lookback=model.lookback,
                allow_partials=model.allow_partials or self.ignore_cron,
            )
            if model.signals:
                # Signal gating (scheduler.py:950 _check_ready_intervals):
                # only admitted intervals run; the rest stay missing.
                from sqlmesh_spark.core.signal import check_ready_intervals

                chunks = check_ready_intervals(model.signals, chunks)
            batches = batch_intervals(chunks, model.batch_size)
        else:
            # Non-incremental kinds re-run wholesale each scheduled tick
            # (FULL-refresh semantics); the single sentinel batch carries
            # no interval.
            batches = [(0, 0)]
            batches = [] if model.kind in (ModelKind.EMBEDDED, ModelKind.EXTERNAL) else batches
        first = not processed
        n = 0
        wholesale = (
            ModelKind.FULL,
            ModelKind.VIEW,
            ModelKind.SEED,
            ModelKind.CUSTOM,
            ModelKind.MANAGED,
        )
        done: list[tuple[int, int]] = []
        for bs, be in batches:
            if model.kind in wholesale:
                # Wholesale kinds re-run over the full requested window.
                self.evaluator.evaluate(snapshot, eff_start, end, mapping, first)
            else:
                self.evaluator.evaluate(
                    snapshot, from_epoch(bs), from_epoch(be), mapping, first and n == 0
                )
                if model.kind == ModelKind.INCREMENTAL_UNMANAGED:
                    # Unmanaged appends are NOT idempotent: a written-but-
                    # unrecorded batch would re-append on the next run and
                    # duplicate rows forever. Record immediately after the
                    # write; a blocking-audit failure still raises below
                    # (alerting), it just can't trigger a reprocess of an
                    # append-only target (the reference likewise exempts
                    # unmanaged models from restatement).
                    self.state.add_interval(model.name, snapshot.version, bs, be)
                else:
                    done.append((bs, be))
            n += 1
        # Audits gate interval recording (reference scheduler.py:191→:254:
        # evaluate → audits → add_interval): a blocking-audit failure leaves
        # the batch UNRECORDED, so the next run reprocesses it — safe because
        # every REMAINING incremental write path is idempotent per interval
        # (time-range overwrite, keyed merge, partition overwrite, SCD2;
        # unmanaged recorded above).
        if batches:
            a_start = a_end = None
            if done:
                # Scope audits to the union of just-written batches so the
                # audit scan is O(batch), not O(table), at scale.
                a_start = from_epoch(min(bs for bs, _ in done))
                a_end = from_epoch(max(be for _, be in done))
            failures = self.evaluator.run_audits(snapshot, a_start, a_end)
            if failures:
                raise AuditError(f"audits failed on {model.name}: {failures}")
        for bs, be in done:
            self.state.add_interval(model.name, snapshot.version, bs, be)
        return n
