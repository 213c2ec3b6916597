"""Frictionless Table Schema <-> Spark StructType translation.

The reference's unit of schema is a Table Schema JSON descriptor whose fields
carry custom ``es:*`` annotations that drive the Elasticsearch mapping
(reference: datapackage_pipelines_migdar/flows/dump_to_es.py:16-30 interprets
``es:keyword`` / ``es:title`` / ``es:hebrew`` / ``es:boost`` / ``es:itemType`` /
``es:index``; they are attached via set_type/add_field kwargs, e.g.
flows/publications.py:121-124 and flows/datasets.py:347-357).

Spark-first design: the annotations ride in ``StructField.metadata`` — Catalyst
preserves metadata through projections, so the ES sink can read them off the
final DataFrame without any side-channel descriptor.

Type mapping (SURVEY.md §1.2):
  string->StringType, integer->LongType, number->DecimalType(38,10) (the
  reference computes in Python Decimal — flows/datasets.py:6,151,158,386),
  boolean->BooleanType, date->DateType, datetime->TimestampType,
  array->ArrayType (element from es:itemType), object->StringType holding JSON
  (the faithful idiom for the free-form ``value`` document column built by
  collate — dump_to_es.py:105-132).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

ES_ANNOTATION_KEYS = (
    "es:keyword",
    "es:title",
    "es:hebrew",
    "es:boost",
    "es:itemType",
    "es:index",
    "es:time",
    "es:schema",
)

_TYPE_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "year": T.IntegerType(),
    "object": T.StringType(),  # JSON-encoded document
}

_SPARK_TO_TYPE = {
    T.StringType(): "string",
    T.LongType(): "integer",
    T.IntegerType(): "integer",
    T.ShortType(): "integer",
    T.BooleanType(): "boolean",
    T.DateType(): "date",
    T.TimestampType(): "datetime",
    T.DoubleType(): "number",
    T.FloatType(): "number",
}


def field_to_struct_field(field: dict[str, Any]) -> T.StructField:
    """One Table Schema field descriptor -> StructField with es:* metadata."""
    ftype = field.get("type", "string")
    if ftype == "number":
        # Reference numbers are Python Decimal until the sink edge; 38,10 keeps
        # oracle hash-match stable (SURVEY.md §7.4 "Decimal semantics").
        dtype: T.DataType = T.DecimalType(38, 10)
    elif ftype == "array":
        item = field.get("es:itemType", "string")
        elem: T.DataType = T.StringType() if item != "object" else T.StringType()
        dtype = T.ArrayType(elem)
    else:
        dtype = _TYPE_TO_SPARK.get(ftype, T.StringType())
    metadata = {k: field[k] for k in field if k.startswith("es:")}
    # keep non-spark-native facets (format, groupChar...) for sink fidelity
    for extra in ("format", "groupChar", "bareNumber", "constraints"):
        if extra in field:
            metadata[extra] = field[extra]
    return T.StructField(field["name"], dtype, nullable=True, metadata=metadata)


def schema_to_struct(table_schema: dict[str, Any]) -> T.StructType:
    """Table Schema descriptor -> StructType (primaryKey kept in metadata)."""
    fields = [field_to_struct_field(f) for f in table_schema.get("fields", [])]
    return T.StructType(fields)


def struct_to_schema(struct: T.StructType, primary_key: list[str] | None = None) -> dict:
    """StructType -> Table Schema descriptor, round-tripping es:* metadata."""
    fields = []
    for f in struct.fields:
        if isinstance(f.dataType, T.ArrayType):
            desc: dict[str, Any] = {"name": f.name, "type": "array"}
        elif isinstance(f.dataType, T.DecimalType):
            desc = {"name": f.name, "type": "number"}
        else:
            desc = {"name": f.name, "type": _SPARK_TO_TYPE.get(f.dataType, "string")}
        for k, v in (f.metadata or {}).items():
            desc[k] = v
        fields.append(desc)
    out: dict[str, Any] = {"fields": fields}
    if primary_key:
        out["primaryKey"] = list(primary_key)
    return out
