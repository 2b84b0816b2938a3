from micromegas_spark.views.telemetry import (
    blocks_view,
    log_entries_view,
    log_stats_extract,
    measures_view,
    processes_view,
    streams_view,
)

__all__ = [
    "blocks_view",
    "log_entries_view",
    "log_stats_extract",
    "measures_view",
    "processes_view",
    "streams_view",
]
