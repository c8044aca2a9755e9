from data_engineer_development_spark.streaming.windows import (
    sessionized,
    sliding_counts,
    stream_events,
    tumbling_counts,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "sessionized",
]
