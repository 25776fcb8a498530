"""Dataset loaders and converters.

Exports resolve lazily (PEP 562): the streaming-source runner process
imports ``jodie_spark.sources.datasource`` to unpickle the reader, and
an eager ``convert``/``tables`` import here dragged ``tables.table``
(the whole DML surface) into every stream start.
"""

_EXPORTS = {
    "convert_to_delta": "jodie_spark.sources.convert",
    "TPCH_TABLES": "jodie_spark.sources.tables",
    "load_events": "jodie_spark.sources.tables",
    "load_table": "jodie_spark.sources.tables",
}

__all__ = sorted(_EXPORTS) + ["register_datasource"]


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(
            f"module 'jodie_spark.sources' has no attribute {name!r}"
        )
    import importlib

    val = getattr(importlib.import_module(mod), name)
    globals()[name] = val
    return val


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))


def register_datasource(spark):
    """Register the jodie_delta format (lazy import keeps pyarrow off
    the import path until needed)."""
    from jodie_spark.sources.datasource import register

    register(spark)
