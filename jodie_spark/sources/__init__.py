"""Dataset loaders."""

from jodie_spark.sources.tables import TPCH_TABLES, load_events, load_table

__all__ = ["TPCH_TABLES", "load_events", "load_table"]
