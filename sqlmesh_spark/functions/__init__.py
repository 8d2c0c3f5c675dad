from sqlmesh_spark.functions.dates import (
    DAY,
    HOUR,
    floor_to,
    from_epoch,
    interval_unit,
    temporal_variables,
    to_epoch,
)

__all__ = [
    "DAY",
    "HOUR",
    "floor_to",
    "from_epoch",
    "interval_unit",
    "temporal_variables",
    "to_epoch",
]
