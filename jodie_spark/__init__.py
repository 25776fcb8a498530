"""jodie_spark: PySpark-native Delta utilities + LLM-pipeline operators.

Top-level convenience exports; subpackages hold the full surface
(``jodie_spark.operators``, ``jodie_spark.functions``,
``jodie_spark.streaming``, ``jodie_spark.sources``,
``jodie_spark.tables``).

Exports resolve lazily (PEP 562): Spark's Python streaming-source
runner is a FRESH non-daemon process per stream that imports this
package just to unpickle the data source — eagerly importing the whole
API tree (sql, tables.table, catalog) charged ~0.15 s to every stream
start for modules the reader never touches.
"""

__version__ = "0.2.0"

# `sql` stays EAGER: the export shares its name with the submodule, and
# with a lazy binding a first-time `import jodie_spark.sql` would rebind
# the package attribute to the module (the import system setattrs the
# parent), silently shadowing the function. The module imports only
# `errors` (~13 ms) so eagerness costs nothing.
from jodie_spark.sql import sql  # noqa: E402

_EXPORTS = {
    "ConcurrentModificationException": "jodie_spark.errors",
    "DeltaProtocolError": "jodie_spark.errors",
    "JodieValidationError": "jodie_spark.errors",
    "VersionNotFoundError": "jodie_spark.errors",
    "register_delta_table": "jodie_spark.catalog",
    "get_spark": "jodie_spark.session",
    "DeltaTable": "jodie_spark.tables.table",
    "write_delta": "jodie_spark.tables.table",
}

__all__ = sorted(_EXPORTS) + ["sql"]


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'jodie_spark' has no attribute {name!r}")
    import importlib

    val = getattr(importlib.import_module(mod), name)
    globals()[name] = val  # cache: next access skips __getattr__
    return val


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
