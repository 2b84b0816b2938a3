"""micromegas_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of madesroches/micromegas (observability
lakehouse: logs / metrics / traces), rebuilt Spark-first.

Reference (read-only, studied for semantics only): /root/reference
Architecture notes: SURVEY.md at the repo root.

Layout
------
- ``session``      : SparkSession construction tuned for scale (AQE, Arrow).
- ``sources``      : parquet/CSV/JSON readers + the test-table loader.
- ``functions``    : the reference's custom scalar/agg function surface
                     (jsonb_*, property_get, histogram suite, color, math)
                     re-expressed as native Spark Column expressions.
- ``operators``    : composite operators (span pairing, call trees, dedup,
                     similarity search, text analysis, multimodal plumbing).
- ``views``        : the reference's table/view builders (processes, streams,
                     blocks, log_entries, measures, ... analogues).
- ``materialize``  : incremental batch materialization (extract/merge SQL
                     pairs with freshness checking), per SURVEY §3.3.
- ``plans``        : time-range injection and read-path partition pruning.
- ``streaming``    : Structured Streaming flavors of the materialize jobs.
"""

__version__ = "0.1.0"


def connect(uri=None, preserve_dictionary=False):
    """Connect to a FlightSQL server — the reference's top-level entry
    point (python/micromegas/micromegas/__init__.py:13-27: default
    grpc://localhost:50051). For an in-process engine without a server,
    use ``Engine.from_test_tables`` + ``client.Client`` instead."""
    from micromegas_spark.flightsql.client import FlightSQLClient

    return FlightSQLClient(
        uri or "grpc://localhost:50051", preserve_dictionary=preserve_dictionary
    )
