"""Dataset loaders and converters."""

from jodie_spark.sources.convert import convert_to_delta
from jodie_spark.sources.tables import TPCH_TABLES, load_events, load_table

__all__ = ["TPCH_TABLES", "convert_to_delta", "load_events", "load_table"]

def register_datasource(spark):
    """Register the jodie_delta format (lazy import keeps pyarrow off
    the import path until needed)."""
    from jodie_spark.sources.datasource import register

    register(spark)
