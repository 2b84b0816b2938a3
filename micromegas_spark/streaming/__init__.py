from micromegas_spark.streaming.incremental import (
    materialize_stream,
    stream_log_stats,
)

__all__ = ["materialize_stream", "stream_log_stats"]
