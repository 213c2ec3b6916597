"""S11: inline literal resource — a Python list of dicts spliced into the plan
(flows/sitemap.py:31-34,64 splices the tags list)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.windows import ORD


def inline_resource(
    spark: SparkSession, rows: list[dict], schema: T.StructType | str | None = None
) -> DataFrame:
    stamped = [{**r, ORD: i} for i, r in enumerate(rows)]
    if schema is None:
        return spark.createDataFrame(stamped)
    if isinstance(schema, T.StructType):
        schema = T.StructType(list(schema.fields) + [T.StructField(ORD, T.LongType())])
        return spark.createDataFrame(stamped, schema)
    return spark.createDataFrame(stamped, schema + f", {ORD} long")
