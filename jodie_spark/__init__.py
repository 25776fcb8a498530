"""jodie_spark: PySpark-native Delta utilities + LLM-pipeline operators.

Top-level convenience exports; subpackages hold the full surface
(``jodie_spark.operators``, ``jodie_spark.functions``,
``jodie_spark.streaming``, ``jodie_spark.sources``,
``jodie_spark.tables``).
"""

from jodie_spark.errors import (
    ConcurrentModificationException,
    DeltaProtocolError,
    JodieValidationError,
    VersionNotFoundError,
)
from jodie_spark.catalog import register_delta_table
from jodie_spark.session import get_spark
from jodie_spark.sql import sql
from jodie_spark.tables.table import DeltaTable, write_delta

__version__ = "0.2.0"

__all__ = [
    "ConcurrentModificationException",
    "DeltaProtocolError",
    "DeltaTable",
    "JodieValidationError",
    "VersionNotFoundError",
    "get_spark",
    "register_delta_table",
    "sql",
    "write_delta",
]
