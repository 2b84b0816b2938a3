from micromegas_spark.materialize.batch import LOG_STATS, PROC_STATS, BatchViewSpec, Lakehouse

__all__ = ["BatchViewSpec", "Lakehouse", "LOG_STATS", "PROC_STATS"]
