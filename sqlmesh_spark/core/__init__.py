"""Framework core: models, snapshots, intervals, state, scheduler, plan.

The orchestration half of the engine — what the reference implements in
sqlmesh/core/*. Spark executes the data; this package decides WHAT runs,
WHEN, and WHERE it lands (physical snapshot tables + virtual view layer).
"""

from sqlmesh_spark.core.context import Context
from sqlmesh_spark.core.model import Model, ModelKind, parse_model_file
from sqlmesh_spark.core.snapshot import Snapshot, fingerprint_model, missing_intervals

__all__ = [
    "Context",
    "Model",
    "ModelKind",
    "Snapshot",
    "fingerprint_model",
    "missing_intervals",
    "parse_model_file",
]
