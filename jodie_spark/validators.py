"""Column-existence validation.

Parity: reference JodieValidator.scala:8-18.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from jodie_spark.errors import JodieValidationError


def validate_columns_exist_in_dataframe(columns: Sequence[str], df: DataFrame) -> None:
    """Raise JodieValidationError if any of ``columns`` is absent from ``df``.

    Parity: JodieValidator.validateColumnsExistsInDataFrame
    (reference JodieValidator.scala:9-17).
    """
    df_columns = list(df.columns)
    missing = [c for c in columns if c not in df_columns]
    if missing:
        raise JodieValidationError(
            f"these columns: {missing} do not exists in the dataframe: {df_columns}"
        )
