"""Plan/apply: context diff → categorization → stages → virtual layer.

Reference: ContextDiff.create (context_diff.py:93), categorize_change
(snapshot/categorizer.py:10), PlanBuilder.build (plan/builder.py:280),
build_plan_stages (plan/stages.py:698). Stages here:

  1. snapshot records            (CreateSnapshotRecordsStage:47)
  2. physical tables + backfill  (PhysicalLayerUpdateStage:58 + BackfillStage:119)
  3. virtual layer view swap     (VirtualLayerUpdateStage:165 — THE atomic
                                  deployment: env views repoint to new
                                  physical tables only after data is ready)
  4. finalize environment        (FinalizeEnvironmentStage:195)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Mapping, Optional, Sequence

from pyspark.sql import SparkSession

from sqlmesh_spark.adapter import SparkAdapter
from sqlmesh_spark.core.model import Model
from sqlmesh_spark.core.scheduler import Scheduler
from sqlmesh_spark.core.snapshot import Snapshot, fingerprint_model, snapshots_to_dag
from sqlmesh_spark.core.state import StateStore


class PlanError(Exception):
    """A plan cannot be applied as requested (policy violation)."""


@dataclass
class ContextDiff:
    """context_diff.py:42 — local project vs environment state."""

    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    modified: list[str] = field(default_factory=list)
    unchanged: list[str] = field(default_factory=list)
    # Children reverted to their old version by the NON_BREAKING
    # categorization: no data work, but they are part of the change
    # surface and must still be virtual-updated (even under
    # include_unmodified=False).
    indirectly_modified: list[str] = field(default_factory=list)

    @property
    def has_changes(self) -> bool:
        return bool(self.added or self.removed or self.modified)


@dataclass
class Plan:
    environment: str
    start: str
    end: str
    snapshots: dict[str, Snapshot]
    diff: ContextDiff
    # Forward-only (plan/stages.py:150 MigrateSchemasStage + the
    # forward_only plan flag): modified models KEEP their physical table
    # (pinned to the previous version), additive schema changes apply as
    # ALTERs, and history is not recomputed — only new intervals run.
    forward_only: bool = False
    # no_gaps (plan/builder.py:72): refuse promotion of a replacement
    # snapshot whose processed intervals don't cover its predecessor's.
    no_gaps: bool = False
    # skip_backfill (plan/builder.py:73-80): record snapshots and promote
    # whatever physical data already exists WITHOUT processing intervals —
    # the operator explicitly accepts missing data (mutually exclusive
    # with no_gaps in the reference; enforced here too).
    skip_backfill: bool = False
    # empty_backfill: create the physical tables with the models' schemas
    # but NO rows, marking the plan window processed — onboarding lever
    # for models whose history will arrive later via restatement.
    empty_backfill: bool = False
    # backfill_models (plan arg): only these models process intervals;
    # the rest get snapshots + views over whatever data already exists.
    backfill_models: Optional[tuple] = None
    # include_unmodified (plan arg): when False, a new environment gets
    # views only for ADDED/MODIFIED models (leaner dev envs).
    include_unmodified: bool = True
    # ignore_cron (reference run arg): process the trailing partial unit
    # regardless of cron completion for this one execution.
    ignore_cron: bool = False
    # Forward-only schema migrations computed at plan time, EXECUTED at
    # apply time (table → ALTER statements): plan() stays read-only, so a
    # dry-run never alters the serving table (MigrateSchemasStage:150).
    pending_migrations: dict = field(default_factory=dict)
    # execution_time (plan arg): pins @execution_ts/@execution_ds in
    # rendered SQL (defaults to each interval's end) — reproducible runs.
    execution_time: Optional[str] = None
    # effective_from (plan/builder.py: effective_from; snapshot
    # definition's effective_from): on a forward-only plan, the date the
    # new logic takes effect — processed intervals from it onward are
    # dropped from the pinned snapshot so they recompute with the new
    # query; history before it is preserved as-is.
    effective_from: Optional[str] = None


def _categorize(old_query: str | None, new_query: str, dialect: str = "") -> str:
    """NON_BREAKING iff the change is additive-projections-only
    (categorizer.py:10: added projections ⇒ NON_BREAKING): both queries are
    single outer SELECTs over an IDENTICAL tail (FROM onward), and the new
    projection list is a superset of the old. Comparison is over CANONICAL
    TOKEN STREAMS (core/sqlparse.py), so whitespace, comments, and
    identifier case never make an additive change read as breaking.
    Anything unlexable falls back to the textual splitter; anything
    unsplittable is BREAKING (conservative)."""
    if old_query is None:
        return "BREAKING"
    old_parts = _projection_split(old_query, dialect)
    new_parts = _projection_split(new_query, dialect)
    if not old_parts or not new_parts:
        return "BREAKING"
    if old_parts[1] == new_parts[1] and old_parts[0] <= new_parts[0]:
        return "NON_BREAKING"
    return "BREAKING"


def _projection_split(q: str, dialect: str = ""):
    """(projection set, tail) for a single outer SELECT, both as canonical
    token strings; None when the shape doesn't apply."""
    from sqlmesh_spark.core.sqlparse import SqlParseError, tokenize

    try:
        toks = tokenize(q, dialect)
    except SqlParseError:
        return _projection_split_textual(q)
    while toks and toks[-1].kind == "op" and toks[-1].value == ";":
        toks.pop()
    if not toks or toks[0].upper != "SELECT":
        return None
    projections: set[str] = set()
    cur: list[str] = []
    depth = 0
    i = 1
    n = len(toks)
    while i < n:
        t = toks[i]
        if t.kind == "op" and t.value == "(":
            depth += 1
        elif t.kind == "op" and t.value == ")":
            depth -= 1
            if depth < 0:
                return None  # not a single outer SELECT
        elif depth == 0 and t.kind == "op" and t.value == ",":
            projections.add(" ".join(cur))
            cur = []
            i += 1
            continue
        elif depth == 0 and t.kind == "ident" and t.upper == "FROM":
            break
        cur.append(t.value)
        i += 1
    if i == n:
        return None  # no top-level FROM
    if cur:
        projections.add(" ".join(cur))
    tail = " ".join(t.value for t in toks[i:])
    return projections, tail


def _projection_split_textual(q: str):
    """Legacy splitter for unlexable (macro-soup) queries."""
    from sqlmesh_spark.macros import split_top_level

    s = q.strip().rstrip(";").strip()
    if not s.upper().startswith("SELECT"):
        return None
    body = s[6:]
    for m in re.finditer(r"\bFROM\b", body, re.IGNORECASE):
        prefix = body[: m.start()]
        if prefix.count("(") == prefix.count(")") and prefix.count("'") % 2 == 0:
            projections = {p.strip() for p in split_top_level(prefix)}
            tail = re.sub(r"\s+", " ", body[m.start() :]).strip()
            return projections, tail
    return None


def build_snapshots(models: Mapping[str, Model]) -> dict[str, Snapshot]:
    """Fingerprint in DAG order so parent hashes feed child hashes
    (snapshot/definition.py:1891-1901 recursive fingerprints)."""
    # Restrict depends_on to actual models (externals don't version us).
    known = set(models)
    pseudo = {
        name: Snapshot(model=m, version="", parents=tuple(sorted(m.depends_on & known)))
        for name, m in models.items()
    }
    order = snapshots_to_dag(pseudo)
    fps: dict[str, str] = {}
    out: dict[str, Snapshot] = {}
    for name in order:
        m = models[name]
        parents = tuple(sorted(m.depends_on & known))
        fp = fingerprint_model(m, [fps[p] for p in parents])
        fps[name] = fp
        out[name] = Snapshot(model=m, version=fp, parents=parents)
    return out


def context_diff(
    snapshots: Mapping[str, Snapshot], env_state: Mapping[str, str]
) -> ContextDiff:
    diff = ContextDiff()
    for name, snap in snapshots.items():
        if name not in env_state:
            diff.added.append(name)
        elif env_state[name] != snap.version:
            diff.modified.append(name)
        else:
            diff.unchanged.append(name)
    diff.removed = [n for n in env_state if n not in snapshots]
    return diff


class PlanEvaluator:
    """plan/evaluator.py:85 BuiltInPlanEvaluator."""

    def __init__(self, spark: SparkSession, state: StateStore, custom_audits=None):
        self.spark = spark
        self.state = state
        self.adapter = SparkAdapter(spark)
        # Live reference to the project's custom model-audit definitions.
        self.custom_audits = custom_audits if custom_audits is not None else {}

    def plan(
        self,
        models: Mapping[str, Model],
        environment: str,
        start: str,
        end: str,
        forward_only: bool = False,
        select_models: Optional[Sequence[str]] = None,
        no_gaps: bool = False,
        effective_from: Optional[str] = None,
        skip_backfill: bool = False,
        empty_backfill: bool = False,
        create_from: Optional[str] = None,
        allow_destructive_models: Optional[Sequence[str]] = None,
        allow_additive_models: Optional[Sequence[str]] = None,
        execution_time: Optional[str] = None,
        backfill_models: Optional[Sequence[str]] = None,
        include_unmodified: bool = True,
        ignore_cron: bool = False,
        no_auto_categorization: bool = False,
    ) -> Plan:
        env_state = self.state.get_environment(environment)
        if not env_state and create_from:
            # create_from (reference plan:1314 arg): a brand-new target
            # environment diffs/categorizes against ANOTHER environment's
            # state instead of empty — branching envs off staging rather
            # than recomputing everything.
            env_state = self.state.get_environment(create_from)
        if select_models is not None:
            # Selection happens at the MODEL level BEFORE fingerprinting
            # (reference node_selector semantics): a deferred parent's model
            # text is restored to its applied definition so every child
            # fingerprint embeds the pinned parent's OLD fingerprint. Pinning
            # versions after build_snapshots instead would give a selected
            # child a version embedding the parent's NEW fingerprint while
            # it is built from the parent's OLD table — a later full plan
            # applying the parent would then see the child's fingerprint
            # unchanged and never rebuild it (permanently stale).
            models = self._select_models(models, env_state, select_models)
        snapshots = build_snapshots(models)
        self._warn_unpartitioned_merges(models)
        diff = context_diff(snapshots, env_state)
        # no_auto_categorization (reference plan arg): treat EVERY change
        # as breaking — teams that review categorization manually opt out
        # of the additive-projection heuristic entirely.
        if not no_auto_categorization:
            self._categorize_and_revert(snapshots, diff, env_state)
        if effective_from and not forward_only:
            raise PlanError("effective_from requires a forward-only plan")
        if skip_backfill and no_gaps:
            raise PlanError("skip_backfill and no_gaps are mutually exclusive")
        if skip_backfill and empty_backfill:
            raise PlanError("skip_backfill and empty_backfill are mutually exclusive")
        pending_migrations: dict[str, list[str]] = {}
        if forward_only:
            pending_migrations = self._pin_forward_only(
                snapshots,
                diff,
                env_state,
                allow_destructive={m.lower() for m in (allow_destructive_models or [])},
                allow_additive={m.lower() for m in (allow_additive_models or [])},
            )
            # effective_from's interval removal is deferred to apply():
            # plan() must stay read-only so a dry-run or abandoned plan
            # never mutates the serving version's processed state.
        return Plan(
            environment=environment,
            start=start,
            end=end,
            snapshots=snapshots,
            diff=diff,
            forward_only=forward_only,
            no_gaps=no_gaps,
            effective_from=effective_from,
            skip_backfill=skip_backfill,
            empty_backfill=empty_backfill,
            execution_time=execution_time,
            backfill_models=self._resolve_backfill_models(
                backfill_models, snapshots
            ),
            include_unmodified=include_unmodified,
            ignore_cron=ignore_cron,
            pending_migrations=pending_migrations,
        )

    _MERGE_KINDS = frozenset(
        {"INCREMENTAL_BY_UNIQUE_KEY", "SCD_TYPE_2_BY_TIME", "SCD_TYPE_2_BY_COLUMN"}
    )

    def _warn_unpartitioned_merges(self, models: Mapping[str, Model]) -> None:
        """Plan-time scale guard: a MERGE/SCD2 model with no partition
        layout gets the parquet backend's full-rewrite tail — every apply
        is O(table) (backends.py _merge_full_rewrite). With
        ``partitioned_by``/``clustered_by`` declared, the copy-on-write
        path rewrites only touched partitions (SCALE.md). Warn once per
        plan so the cost is a choice, not a surprise."""
        import logging

        log = logging.getLogger("sqlmesh_spark.plan")
        for name, model in models.items():
            if (
                model.kind.value in self._MERGE_KINDS
                and not model.partitioned_by
                and not model.clustered_by
            ):
                log.warning(
                    "model %s has kind %s but no partitioned_by/clustered_by: "
                    "every apply rewrites the whole table (O(table)); declare a "
                    "partition layout to enable the partition-scoped "
                    "copy-on-write merge path",
                    name,
                    model.kind.value,
                )

    def _select_models(
        self,
        models: Mapping[str, Model],
        env_state: Mapping[str, str],
        select_models: Sequence[str],
    ) -> dict[str, Model]:
        """`plan --select-model` (reference plan/builder.py selection via
        node_selector): only SELECTED models' changes enter the plan;
        unselected modified models are replaced by their stored (applied)
        definitions — deferring their change to a later full plan — and
        unselected brand-new models are excluded entirely. `*` wildcards
        match like fnmatch. Returns the effective models map; fingerprinting
        runs AFTER this, so child versions embed the deferred parent's old
        fingerprint (see plan())."""
        import dataclasses
        import fnmatch

        selected = {
            name
            for name in models
            for pat in select_models
            if fnmatch.fnmatch(name, pat.lower())
        }
        unknown = [
            p for p in select_models if not any(fnmatch.fnmatch(n, p.lower()) for n in models)
        ]
        if unknown:
            raise PlanError(f"select_models matched nothing: {unknown}")
        out = dict(models)
        for name, model in models.items():
            if name in selected:
                continue
            if name not in env_state:
                dependents = [
                    n
                    for n, m in models.items()
                    if name in m.depends_on and (n in selected or n in env_state)
                ]
                if dependents:
                    raise PlanError(
                        f"cannot exclude new model {name}: selected/applied "
                        f"models depend on it: {dependents}"
                    )
                del out[name]
                continue
            # Restore the QUERY TEXT to the applied state — wholesale kinds
            # re-evaluate every run, and the deferred change must not leak
            # into the old table.
            old = self.state.get_snapshot(name, env_state[name]) or {}
            old_query = old.get("query")
            if old_query is None:
                raise PlanError(
                    f"cannot defer {name}: no stored snapshot for its "
                    f"applied version {env_state[name]}"
                )
            if old_query != model.query:
                out[name] = dataclasses.replace(model, query=old_query)
        return out

    def _categorize_and_revert(
        self,
        snapshots: dict[str, Snapshot],
        diff: ContextDiff,
        env_state: Mapping[str, str],
    ) -> None:
        """Change categorization (snapshot/categorizer.py:10): a directly
        modified model whose change only ADDS projections (same FROM/WHERE
        tail, projection superset) is NON_BREAKING — its children's data
        cannot change, so children whose own text is unchanged keep their
        existing version/physical table and are only virtual-updated.
        BREAKING changes taint every descendant, which rebuilds as usual.
        """
        taint: dict[str, bool] = {}
        for name in snapshots_to_dag(snapshots):
            snap = snapshots[name]
            if name not in env_state or env_state[name] == snap.version:
                taint[name] = False
                continue
            old = self.state.get_snapshot(name, env_state[name]) or {}
            old_query = old.get("query")
            own_changed = old_query is None or old_query != snap.model.query
            parent_taint = any(taint.get(p, False) for p in snap.parents)
            if own_changed:
                breaking = _categorize(old_query, snap.model.query, snap.model.dialect) == "BREAKING"
                taint[name] = breaking or parent_taint
            elif not parent_taint:
                # Modified only via a NON_BREAKING ancestor: revert to the
                # old version — zero recompute, view keeps pointing at the
                # existing table (the indirect-non-breaking contract).
                snapshots[name] = Snapshot(
                    model=snap.model, version=env_state[name], parents=snap.parents
                )
                diff.modified.remove(name)
                diff.unchanged.append(name)
                diff.indirectly_modified.append(name)
                taint[name] = False
            else:
                taint[name] = True

    def _pin_forward_only(
        self,
        snapshots: dict[str, Snapshot],
        diff: ContextDiff,
        env_state: Mapping[str, str],
        allow_destructive: Optional[set] = None,
        allow_additive: Optional[set] = None,
    ) -> dict[str, list[str]]:
        """Pin modified models to their previous version (same physical
        table), migrate the table schema additively, and carry the old
        version's processed intervals — the forward-only contract
        (evaluator.py:1105-1233 migrate). Destructive changes (dropped
        columns, narrowing types) are governed by the model's
        on_destructive_change policy (model/kind.py:195-226): error
        rejects the plan before any mutation; warn/allow proceed with the
        column RETAINED on disk (parquet cannot DROP COLUMN) — history
        keeps its values and new intervals null-fill it."""
        import logging

        from sqlmesh_spark.diff import SchemaDiffer

        differ = SchemaDiffer()
        pending: dict[str, list[str]] = {}
        for name in diff.modified:
            old_version = env_state[name]
            new = snapshots[name]
            pinned = Snapshot(model=new.model, version=old_version, parents=new.parents)
            if self.adapter.table_exists(pinned.table_name):
                current_cols = self.adapter.columns(pinned.table_name)
                target_cols = self._query_schema(
                    pinned, self._mapping(snapshots), snapshots
                )
                if target_cols is not None:
                    deltas = differ.compare(current_cols, target_cols)
                    destructive = [d for d in deltas if differ.is_destructive(d)]
                    additive = [d for d in deltas if d.op == "add"]
                    policy = new.model.on_destructive_change
                    if name in (allow_destructive or set()):
                        # plan-level override (reference plan arg
                        # allow_destructive_models): the operator accepts
                        # the destructive change for THIS plan only.
                        policy = "allow"
                    if destructive and policy == "error":
                        detail = ", ".join(
                            f"{d.op} {d.column} ({d.current_type} -> {d.new_type})"
                            for d in destructive
                        )
                        raise PlanError(
                            f"forward-only plan for {name} requires destructive "
                            f"change(s) [{detail}] but on_destructive_change=error"
                        )
                    if destructive and policy == "warn":
                        logging.getLogger("sqlmesh_spark").warning(
                            "forward-only destructive change(s) on %s: %s",
                            name,
                            destructive,
                        )
                    # on_additive_change (kind.py:195-226): same ladder for
                    # column ADDs — teams that version schemas externally
                    # set error to force an explicit (breaking) migration.
                    add_policy = new.model.on_additive_change
                    if name in (allow_additive or set()):
                        add_policy = "allow"
                    if additive and add_policy == "error":
                        detail = ", ".join(f"add {d.column} {d.new_type}" for d in additive)
                        raise PlanError(
                            f"forward-only plan for {name} requires additive "
                            f"change(s) [{detail}] but on_additive_change=error"
                        )
                    if additive and add_policy == "warn":
                        logging.getLogger("sqlmesh_spark").warning(
                            "forward-only additive change(s) on %s: %s", name, additive,
                        )
                    stmts = [
                        f"ALTER TABLE {pinned.table_name} ADD COLUMN {d.column} {d.new_type}"
                        for d in deltas
                        if d.op == "add"
                    ]
                    if stmts:
                        # Collected, not executed: plan() is read-only —
                        # apply() runs these (a dry-run must never alter
                        # the serving table's schema).
                        pending[pinned.table_name] = stmts
            snapshots[name] = pinned
        return pending

    def _empty_backfill(self, plan: Plan) -> dict[str, int]:
        """Create each snapshot's physical table with the model's analyzed
        schema and zero rows, then mark the plan window processed for
        interval-recording kinds — the scheduler will never revisit it
        (backfill-later models use restatement to fill real data).

        The physical LAYOUT mirrors what the evaluator's first insert
        would build: time-range incrementals get the derived ``_ds``
        partition (scheduler first-insert path) so later writes stay
        partition-pruned instead of falling into the unpartitioned
        full-rewrite tail forever. SCD2 kinds are REFUSED: their
        engine-managed history columns (valid_from/valid_to, the COW
        ``_is_current`` partition) only exist through a real evaluation —
        an empty table would poison every later apply."""
        from sqlmesh_spark.core.snapshot import to_epoch

        mapping = self._mapping(plan.snapshots)
        executed: dict[str, int] = {}
        for name, snap in plan.snapshots.items():
            model = snap.model
            if model.kind.value in ("EMBEDDED", "EXTERNAL", "VIEW", "SEED"):
                continue
            if plan.backfill_models is not None and name not in plan.backfill_models:
                continue
            if model.kind.value.startswith("SCD"):
                raise PlanError(
                    f"empty_backfill is unsupported for {model.kind.value} "
                    f"({name}): SCD2 history columns require a real evaluation"
                )
            if not self.adapter.table_exists(snap.table_name):
                cols = self._query_schema(snap, mapping, plan.snapshots)
                if cols is None:
                    continue
                partitioned_by = model.partitioned_by
                if model.kind.value == "INCREMENTAL_BY_TIME_RANGE":
                    part_by_time = model.kind_args.get(
                        "partition_by_time_column", "true"
                    ).strip("'\"").lower() != "false"
                    if part_by_time:
                        partitioned_by = ("_ds",)
                    else:
                        cols.pop("_ds", None)
                self.adapter.create_schema(snap.physical_schema)
                self.adapter.create_table(
                    snap.table_name,
                    cols,
                    partitioned_by=partitioned_by,
                    clustered_by=model.clustered_by,
                    buckets=model.buckets,
                    storage_format=model.storage_format,
                )
            if model.kind.value.startswith("INCREMENTAL"):
                self.state.add_interval(
                    name, snap.version, to_epoch(plan.start), to_epoch(plan.end)
                )
            executed[name] = 0
        return executed

    def _apply_effective_from(
        self,
        snapshots: dict[str, Snapshot],
        diff: ContextDiff,
        effective_from: str,
    ) -> None:
        """Drop the pinned snapshots' processed intervals from
        ``effective_from`` onward: the scheduler then sees them as missing
        and recomputes exactly that span with the NEW query over the OLD
        physical table — the reference's effective_from contract (the
        forward-only change 'takes effect' at a chosen date instead of
        only for future intervals)."""
        from sqlmesh_spark.core.snapshot import to_epoch

        efrom = to_epoch(effective_from)
        horizon = 2**62  # clear everything after efrom
        for name in diff.modified:
            snap = snapshots[name]
            self.state.remove_intervals(name, snap.version, efrom, horizon)

    def _mapping(self, snapshots: Mapping[str, Snapshot]) -> dict[str, str]:
        return {n: s.table_name for n, s in snapshots.items()}

    def _query_schema(
        self, snapshot: Snapshot, mapping=None, snapshots=None
    ) -> dict[str, str] | None:
        """Analyze (don't execute) the rendered query for its schema."""
        from sqlmesh_spark.core.scheduler import SnapshotEvaluator

        if snapshot.model.python_fn is not None:
            return None
        try:
            sql = SnapshotEvaluator(self.spark, self.adapter).render(
                snapshot, "1970-01-01", "1970-01-02", mapping or {}
            )
            cols = dict(self.spark.sql(sql).dtypes)
        except Exception:
            # Upstream physical tables may not exist yet (plan precedes
            # backfill) — fall back to pure inference over empty views.
            try:
                from sqlmesh_spark.core.inference import infer_columns_to_types

                models = {n: s.model for n, s in (snapshots or {}).items()}
                cols = infer_columns_to_types(self.spark, models, snapshot.model.name)
            except Exception:
                return None
            if cols is None:
                return None
        if snapshot.model.kind.value == "INCREMENTAL_BY_TIME_RANGE":
            cols["_ds"] = "string"
        return cols

    def _resolve_backfill_models(
        self,
        backfill_models: Optional[Sequence[str]],
        snapshots: Mapping[str, Snapshot],
    ) -> Optional[tuple]:
        """Expand/validate the backfill allow-list (same fnmatch wildcard
        semantics as select_models). A pattern matching nothing is a
        PlanError — a typo must not silently promote an empty backfill.
        Selecting a model whose NOT-selected parent has no physical table
        yet is also an error: its evaluation would crash mid-apply."""
        if backfill_models is None:
            return None
        import fnmatch

        selected = {
            name
            for name in snapshots
            for pat in backfill_models
            if fnmatch.fnmatch(name, pat.lower())
        }
        unknown = [
            p
            for p in backfill_models
            if not any(fnmatch.fnmatch(n, p.lower()) for n in snapshots)
        ]
        if unknown:
            raise PlanError(f"backfill_models matched nothing: {unknown}")
        for name in sorted(selected):
            for parent in snapshots[name].parents:
                if parent in selected or parent not in snapshots:
                    continue
                psnap = snapshots[parent]
                if psnap.model.kind.value in ("EMBEDDED", "EXTERNAL", "SEED"):
                    continue
                if not self.adapter.table_exists(psnap.table_name):
                    raise PlanError(
                        f"backfill_models selects {name} but excludes its "
                        f"parent {parent}, which has no physical table yet"
                    )
        return tuple(sorted(selected))

    @staticmethod
    def _merge_intervals(raw: list) -> list[tuple[int, int]]:
        out: list[tuple[int, int]] = []
        for s, e in sorted(tuple(p) for p in raw):
            if out and s <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        return out

    def _ensure_no_gaps(self, plan: Plan) -> None:
        """For each model whose version CHANGES in this environment and
        whose kind records intervals, the new version's processed set must
        cover the old version's — otherwise raise PlanError and leave the
        environment's views untouched (reference promote(no_gaps)
        semantics, state_sync/base.py:419-422)."""
        env_state = self.state.get_environment(plan.environment)
        problems: list[str] = []
        for name, snap in plan.snapshots.items():
            old_version = env_state.get(name)
            if old_version is None or old_version == snap.version:
                continue
            old_iv = self._merge_intervals(
                self.state.get_intervals(name, old_version)
            )
            if not old_iv:
                continue  # wholesale kinds record no intervals
            new_iv = self._merge_intervals(
                self.state.get_intervals(name, snap.version)
            )
            gaps: list[tuple[int, int]] = []
            for s, e in old_iv:
                pos = s
                for ns, ne in new_iv:
                    if ne <= pos or ns >= e:
                        continue
                    if ns > pos:
                        gaps.append((pos, ns))
                    pos = max(pos, ne)
                    if pos >= e:
                        break
                if pos < e:
                    gaps.append((pos, e))
            if gaps:
                problems.append(f"{name}: {len(gaps)} gap(s) vs previous version")
        if problems:
            raise PlanError(
                "no_gaps violation — replacement snapshots do not cover "
                "their predecessors' processed intervals: " + "; ".join(problems)
            )

    def apply(self, plan: Plan) -> dict[str, int]:
        # Stage 1: snapshot records — one bulk state write for the whole
        # plan (the per-snapshot loop rewrote the snapshots file N times,
        # O(N²) bytes in model count; see StateStore.put_snapshots).
        self.state.put_snapshots(
            {
                (name, snap.version): {
                    "kind": snap.model.kind.value,
                    "parents": list(snap.parents),
                    # Raw query text backs change categorization on the
                    # next plan (categorizer.py:10 compares old vs new).
                    "query": snap.model.query,
                }
                for name, snap in plan.snapshots.items()
            }
        )
        # Stage 2: physical layer + backfill. Unchanged snapshots keep their
        # physical tables and processed intervals — the virtual-environment
        # zero-recompute property: only new versions do work.
        scheduler = Scheduler(
            self.spark,
            self.state,
            plan.snapshots,
            custom_audits=self.custom_audits,
            execution_time=plan.execution_time,
            backfill_models=set(plan.backfill_models)
            if plan.backfill_models is not None
            else None,
            ignore_cron=plan.ignore_cron,
        )
        # Forward-only schema migrations (MigrateSchemasStage:150): the
        # ALTERs plan() computed run now, before any backfill reads the
        # pinned tables.
        for table, stmts in plan.pending_migrations.items():
            self.adapter.alter_table(table, stmts)
        if plan.forward_only and plan.effective_from:
            self._apply_effective_from(plan.snapshots, plan.diff, plan.effective_from)
        if plan.skip_backfill:
            executed = {}
        elif plan.empty_backfill:
            executed = self._empty_backfill(plan)
        else:
            executed = scheduler.run(plan.start, plan.end)
        # no_gaps promotion guard (reference state_sync/base.py:407-426
        # promote(no_gaps_snapshot_names), plan/builder.py:72): a snapshot
        # REPLACING one already serving this environment must cover every
        # interval its predecessor had processed — otherwise promoting it
        # would silently serve a table with data gaps. Checked BEFORE the
        # view swap so a violation leaves the environment untouched.
        if plan.no_gaps:
            self._ensure_no_gaps(plan)
        # Stage 3: virtual layer swap — views repoint atomically after data
        # exists (plan/stages.py:165).
        env_schema = (
            "prod_views" if plan.environment == "prod" else f"{plan.environment}_views"
        )
        self.adapter.create_schema(env_schema)
        modified_or_added = (
            set(plan.diff.added)
            | set(plan.diff.modified)
            | set(plan.diff.indirectly_modified)
        )
        def _promote_one(name: str, snap) -> None:
            if snap.model.kind.value in ("EMBEDDED", "EXTERNAL"):
                return
            if not plan.include_unmodified and name not in modified_or_added:
                return
            if not self.adapter.table_exists(snap.table_name):
                # Signals may have gated every interval — the snapshot has
                # no physical data yet; leave the env view where it was
                # (possibly absent) rather than pointing at nothing.
                return
            # Comment registration (reference base.py COMMENT creation;
            # spark.py:545-554 ALTER COLUMN ... COMMENT) happens HERE in
            # the apply stage — once per model per apply, not per backfill
            # batch, and it lands even when no batch ran (a
            # description-only edit is metadata-only by design: no new
            # version, no data work, but the comment still updates).
            model = snap.model
            if model.kind.value != "VIEW" and (
                model.description or model.column_descriptions
            ):
                tbl = snap.table_name
                if model.description:
                    c = model.description.replace("'", "''")
                    self.spark.sql(
                        f"ALTER TABLE {tbl} SET TBLPROPERTIES ('comment' = '{c}')"
                    )
                existing = set(self.adapter.columns(tbl))
                for col, desc in sorted(model.column_descriptions.items()):
                    if col not in existing:
                        continue
                    c = desc.replace("'", "''")
                    self.spark.sql(
                        f"ALTER TABLE {tbl} ALTER COLUMN {col} COMMENT '{c}'"
                    )
            env_view = f"{env_schema}.{snap.model.view_name}"
            # The virtual layer exposes the MODEL's schema exactly: engine-
            # managed physical columns (the derived `_ds` time partition,
            # the SCD2-COW `_is_current` partition — always `_`-prefixed)
            # stay behind the view, matching the reference where
            # Iceberg/Delta partitioning is table metadata, not columns.
            cols = [c for c in self.adapter.columns(snap.table_name) if not c.startswith("_")]
            self.adapter.create_view(
                env_view, f"SELECT {', '.join(cols)} FROM {snap.table_name}"
            )
            # on_virtual_update statements (definition.py:158; rendered
            # with @this_model bound to the ENV VIEW — :452) run right
            # after the view repoints: grants, invalidations, notifies.
            from sqlmesh_spark.core.scheduler import SnapshotEvaluator

            for stmt in snap.model.on_virtual_update:
                sql = SnapshotEvaluator(
                    self.spark, self.adapter, execution_time=plan.execution_time
                ).render_statement(
                    stmt,
                    snap,
                    plan.start,
                    plan.end,
                    self._mapping(plan.snapshots),
                    this_model=env_view,
                )
                self.spark.sql(sql)

        # Promotion is per-model independent (each snapshot repoints its
        # own env view; ordering only matters versus stage 2, which is
        # complete) — run it level-parallel like the scheduler does, so
        # the N× (table_exists + schema read + CREATE VIEW) catalog
        # round-trips overlap instead of serializing (measured: the
        # serial loop was ~40% of a 1,000-model apply,
        # tools/scale_orchestration.py). Exceptions propagate on
        # iteration, same as the sequential loop.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(lambda kv: _promote_one(*kv), plan.snapshots.items()))
        # Stage 4: finalize environment pointers.
        self.state.put_environment(
            plan.environment, {n: s.version for n, s in plan.snapshots.items()}
        )
        return executed
