from sqlmesh_spark.streaming.incremental import (
    stream_incremental_aggregate,
    stream_to_memory_sink,
)

__all__ = ["stream_incremental_aggregate", "stream_to_memory_sink"]
