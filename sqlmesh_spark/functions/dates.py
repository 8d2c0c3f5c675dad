"""Date/interval function surface (reference sqlmesh/utils/date.py).

Thin façade over the engine-internal implementations so user code (python
models, custom materializations, signals) has one import point for the
temporal vocabulary: epoch conversions, cron-unit flooring, and the
@start_ds-family variable dictionary.
"""

from sqlmesh_spark.core.snapshot import (  # noqa: F401
    DAY,
    HOUR,
    floor_to,
    from_epoch,
    interval_unit,
    to_epoch,
)
from sqlmesh_spark.macros import temporal_variables  # noqa: F401
