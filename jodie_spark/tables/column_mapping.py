"""Column mapping (mode ``name``) read support for the native log reader.

Delta's column-mapping feature decouples a field's LOGICAL name (what
queries use, stored in ``metaData.schemaString``) from its PHYSICAL
name (what the parquet files store, recorded per field as
``delta.columnMapping.physicalName`` in the schema-string metadata).
Tables written by modern delta-spark after a RENAME COLUMN, or created
with ``delta.columnMapping.mode = name``, cannot be read correctly by
physical name alone — every column would come back null.

Read strategy (public protocol, delta.io PROTOCOL.md "Column Mapping"):
scan the parquet files with the PHYSICAL schema (so names resolve and
Hive-style partition directories — also physical-named — reconstruct),
then rename back to logical names with a positional struct cast.

Mode ``id`` resolves data columns by parquet FIELD ID instead of name
(the contract Iceberg-converted / UniForm tables rely on — their
parquet column names need not match ``physicalName``): the reader
schema carries ``parquet.field.id`` metadata copied from
``delta.columnMapping.id`` and Spark's vectorized reader matches on it
(``spark.sql.parquet.fieldId.read.enabled``, scoped to the scan via a
child session — never a global conf mutation). Partition directories
are not parquet fields, so they still resolve by physical name.
Writes into id-mode tables carry the same metadata on the physical
projection, so Spark's parquet writer emits matching footer field ids
(``spark.sql.parquet.fieldId.write.enabled``, default on) — giving
both mapping modes the full DML/CDF/rewrite surface.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PHYSICAL_NAME_KEY = "delta.columnMapping.physicalName"
MODE_KEY = "delta.columnMapping.mode"


def column_mapping_mode(metadata: dict[str, Any]) -> str:
    """The table's column-mapping mode: 'none' (default), 'name', 'id'."""
    conf = metadata.get("configuration") or {}
    return str(conf.get(MODE_KEY, "none"))


PARQUET_FIELD_ID_KEY = "parquet.field.id"


def _physical_type(dt: T.DataType, with_field_ids: bool = False) -> T.DataType:
    if isinstance(dt, T.StructType):
        return to_physical_schema(dt, with_field_ids)
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_physical_type(dt.elementType, with_field_ids), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _physical_type(dt.keyType, with_field_ids),
            _physical_type(dt.valueType, with_field_ids),
            dt.valueContainsNull,
        )
    return dt


def to_physical_schema(
    schema: T.StructType, with_field_ids: bool = False
) -> T.StructType:
    """Schema with every field renamed to its recorded physical name
    (fields without an annotation keep their logical name — pre-mapping
    columns in upgraded tables). ``with_field_ids=True`` (mode=id
    reads) additionally copies ``delta.columnMapping.id`` into the
    ``parquet.field.id`` metadata key Spark's field-id-matching parquet
    reader consumes."""
    fields = []
    for f in schema.fields:
        md = dict(f.metadata or {})
        phys = md.get(PHYSICAL_NAME_KEY, f.name)
        if with_field_ids and ID_KEY in md:
            md[PARQUET_FIELD_ID_KEY] = int(md[ID_KEY])
        fields.append(
            T.StructField(phys, _physical_type(f.dataType, with_field_ids), f.nullable, md)
        )
    return T.StructType(fields)


def rename_to_physical(
    df: DataFrame,
    logical: T.StructType,
    physical: T.StructType,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Inverse of :func:`rename_to_logical`: project a logical-named
    DataFrame to the physical names the parquet files must store.
    Nested structs rename via a positional cast. ``keep`` columns
    (physical-only payloads like materialized row lineage) pass
    through unrenamed.

    The physical field's metadata travels on the alias: on mode=id
    tables it carries ``parquet.field.id``, which Spark's parquet
    writer (``spark.sql.parquet.fieldId.write.enabled``, default on)
    turns into footer field ids — so files THIS engine writes into an
    id-mapped table resolve for every field-id reader. Nested field
    ids ride the positional cast's target type."""
    cols = []
    for lf, pf in zip(logical.fields, physical.fields):
        c = F.col(f"`{lf.name}`")
        if lf.dataType != pf.dataType:
            c = c.cast(pf.dataType)
        cols.append(c.alias(pf.name, metadata=dict(pf.metadata or {})))
    cols += [F.col(f"`{k}`") for k in keep if k in df.columns]
    return df.select(*cols)


ID_KEY = "delta.columnMapping.id"
MAX_ID_PROP = "delta.columnMapping.maxColumnId"


def schema_requests_field_ids(schema: T.StructType) -> bool:
    """True when a read schema carries ``parquet.field.id`` metadata —
    i.e. it came from :func:`to_physical_schema` for a mode=id table
    and the scan must run with Spark's field-id matcher enabled
    (routed through the scoped child session, never a global conf)."""
    def field_has(f: T.StructField) -> bool:
        if PARQUET_FIELD_ID_KEY in (f.metadata or {}):
            return True
        dt = f.dataType
        return isinstance(dt, T.StructType) and any(field_has(sf) for sf in dt.fields)

    return any(field_has(f) for f in schema.fields)


def max_column_id(metadata: dict[str, Any]) -> int:
    conf = metadata.get("configuration") or {}
    return int(conf.get(MAX_ID_PROP, "0"))


def _assign_field(f: T.StructField, next_id: list[int], fresh_physical: bool) -> T.StructField:
    md = dict(f.metadata or {})
    if ID_KEY not in md:
        next_id[0] += 1
        md[ID_KEY] = next_id[0]
        if PHYSICAL_NAME_KEY not in md:
            # upgrade keeps the current name physical (existing files
            # resolve); columns born after the upgrade get fresh
            # col-<uuid> names, matching delta-spark's assignment
            import uuid

            md[PHYSICAL_NAME_KEY] = f"col-{uuid.uuid4()}" if fresh_physical else f.name
    dt = f.dataType
    if isinstance(dt, T.StructType):
        dt = T.StructType(
            [_assign_field(sf, next_id, fresh_physical) for sf in dt.fields]
        )
    return T.StructField(f.name, dt, f.nullable, md)


def assign_column_mapping(
    schema: T.StructType, start_id: int = 0, fresh_physical: bool = False
) -> tuple[T.StructType, int]:
    """Annotate every field (incl. nested struct fields) lacking
    mapping metadata with a column id and physical name. Returns the
    annotated schema and the new max column id.

    ``fresh_physical=False`` (table upgrade): physical name = current
    logical name, so existing data files keep resolving.
    ``fresh_physical=True`` (new columns / new mapped tables):
    physical name = ``col-<uuid>``.
    """
    counter = [start_id]
    out = T.StructType([_assign_field(f, counter, fresh_physical) for f in schema.fields])
    return out, counter[0]


def rename_to_logical(
    df: DataFrame,
    logical: T.StructType,
    physical: T.StructType,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Project physical-named columns back to logical names. Nested
    struct fields rename via a positional cast (struct casts match
    fields by position, so the physical layout maps 1:1 onto the
    logical type). ``keep`` columns pass through unrenamed."""
    cols = []
    for lf, pf in zip(logical.fields, physical.fields):
        c = F.col(f"`{pf.name}`")
        if pf.dataType != lf.dataType:
            c = c.cast(lf.dataType)
        cols.append(c.alias(lf.name))
    cols += [F.col(f"`{k}`") for k in keep if k in df.columns]
    return df.select(*cols)
