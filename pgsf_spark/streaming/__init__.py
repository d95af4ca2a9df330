from pgsf_spark.streaming.incremental import (  # noqa: F401
    start_incremental_merge,
    windowed_event_counts,
)
