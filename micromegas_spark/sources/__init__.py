from micromegas_spark.sources.tables import TEST_TABLES, load_table, load_tables

__all__ = ["TEST_TABLES", "load_table", "load_tables"]
