"""Context — the user-facing facade (reference: sqlmesh/core/context.py).

Loads a project directory of .sql model files (loader.py:481 SqlMeshLoader
walks models/ audits/ macros/ seeds/), builds snapshots, and exposes
plan/apply/run/render/evaluate.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from sqlmesh_spark.core.model import Model, ModelKind, extract_depends_on, parse_model_file
from sqlmesh_spark.core.plan import Plan, PlanEvaluator
from sqlmesh_spark.core.scheduler import SnapshotEvaluator
from sqlmesh_spark.core.state import StateStore


class Context:
    def __init__(
        self,
        spark: SparkSession,
        project_dir: Optional[str] = None,
        state_dir: Optional[str] = None,
        models: Optional[dict[str, Model]] = None,
    ):
        self.spark = spark
        self.project_dir = project_dir
        self.models: dict[str, Model] = dict(models or {})
        if project_dir:
            self._load(project_dir)
        state_dir = state_dir or os.path.join(project_dir or ".", ".sqlmesh_state")
        self.state = StateStore(state_dir)
        self._evaluator = PlanEvaluator(spark, self.state)

    # -- load (context.py:629 → loader.py:191) ------------------------------

    def _load(self, project_dir: str) -> None:
        for path in sorted(glob.glob(os.path.join(project_dir, "models", "**", "*.sql"), recursive=True)):
            model = parse_model_file(path)
            self.models[model.name] = model
        for path in sorted(glob.glob(os.path.join(project_dir, "seeds", "*.csv"))):
            name = os.path.splitext(os.path.basename(path))[0]
            # Seeds referenced as seed_schema.<name> by convention unless a
            # model file claims them explicitly.
            with open(path) as f:
                csv_text = f.read()
            header = csv_text.splitlines()[0].split(",")
            model = Model(
                name=f"seed.{name}",
                kind=ModelKind.SEED,
                query="",
                seed_csv=csv_text,
                columns={c: "STRING" for c in header},
            )
            self.models.setdefault(model.name, model)
        # Re-resolve depends_on now that all model names are known.
        known = set(self.models)
        for m in self.models.values():
            m.depends_on = extract_depends_on(m.query, known)

    def add_model(self, text: str, seed_csv: Optional[str] = None,
                  columns: Optional[dict[str, str]] = None) -> Model:
        from sqlmesh_spark.core.model import parse_model_text

        model = parse_model_text(text)
        if seed_csv is not None:
            model.seed_csv = seed_csv
            if columns:
                model.columns = columns
        self.models[model.name] = model
        known = set(self.models)
        for m in self.models.values():
            m.depends_on = extract_depends_on(m.query, known)
        return model

    # -- plan/apply (context.py:plan/apply) ---------------------------------

    def plan(self, environment: str = "prod", start: str = "1992-01-01", end: str = "1998-12-31") -> Plan:
        return self._evaluator.plan(self.models, environment, start, end)

    def apply(self, plan: Plan) -> dict[str, int]:
        return self._evaluator.apply(plan)

    def run(self, environment: str = "prod", start: str = "1992-01-01", end: str = "1998-12-31") -> dict[str, int]:
        """plan+apply in one step (context.py:756 run semantics: process
        missing intervals for the environment)."""
        return self.apply(self.plan(environment, start, end))

    def restate(
        self,
        model_names: list[str],
        start: str,
        end: str,
        environment: str = "prod",
    ) -> dict[str, int]:
        """Restatement (plan/builder.py:369): clear processed intervals of
        the named models AND their downstream dependents for [start, end),
        then re-run — late-arriving/corrected source data reprocesses
        exactly that window."""
        from sqlmesh_spark.core.plan import build_snapshots
        from sqlmesh_spark.core.snapshot import to_epoch

        snaps = build_snapshots(self.models)
        targets = {n.lower() for n in model_names}
        # Downstream closure: anything depending (transitively) on a target.
        changed = True
        while changed:
            changed = False
            for name, m in self.models.items():
                if name not in targets and m.depends_on & targets:
                    targets.add(name)
                    changed = True
        for name in targets:
            snap = snaps[name]
            self.state.remove_intervals(
                name, snap.version, to_epoch(start), to_epoch(end)
            )
        return self.run(environment, start, end)

    # -- render / evaluate (context.py:1099/1168) ---------------------------

    def render(self, model_name: str, start: str = "1992-01-01", end: str = "1998-12-31") -> str:
        from sqlmesh_spark.core.plan import build_snapshots

        snaps = build_snapshots(self.models)
        mapping = {n: s.table_name for n, s in snaps.items()}
        return SnapshotEvaluator(self.spark).render(
            snaps[model_name.lower()], start, end, mapping
        )

    def evaluate(self, model_name: str, start: str = "1992-01-01", end: str = "1998-12-31") -> DataFrame:
        return self.spark.sql(self.render(model_name, start, end))

    # -- lineage (core/lineage.py analog, table level) ----------------------

    def lineage(self, model_name: str) -> list[str]:
        """Upstream closure in dependency order."""
        seen: list[str] = []

        def walk(name: str) -> None:
            for dep in sorted(self.models[name].depends_on):
                if dep in self.models and dep not in seen:
                    walk(dep)
            if name not in seen:
                seen.append(name)

        walk(model_name.lower())
        return seen
