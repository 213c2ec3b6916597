"""Core projection / filter / column-derivation operators.

Parity targets (SURVEY.md §2.3-§2.4):
  P1/P2 DF.filter_rows            -> filter_rows / filter_rows_equals
  P4    DF.select_fields          -> select_fields
  P5    DF.delete_fields (regex!) -> delete_fields
  C1    DF.add_field              -> add_field
  C2    add_computed_field(format)-> format_field
  C3    add_computed_field(op=fn) -> add_computed_field (Column expression)
  §1.3  DF.set_type (cast with groupChar strip + on_error fallback)
                                  -> set_type

All are thin, declarative wrappers over Column expressions — Catalyst sees
plain projections/filters, so pushdown and pruning work untouched. None of
these shuffle.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def filter_rows(df: DataFrame, predicate: Column) -> DataFrame:
    """P1: keep rows where predicate holds (reference filter_rows(lambda) —
    flows/publications.py:93, flows/broken_links.py:112)."""
    return df.filter(predicate)


def filter_rows_equals(df: DataFrame, equals: list[dict[str, Any]]) -> DataFrame:
    """P2: declarative OR-of-ANDs equality filter
    (obsolete/prepare_data_for_es.py:236 ``filter_rows(equals=[{...}])``)."""
    clause = None
    for cond in equals:
        sub = None
        for k, v in cond.items():
            c = F.col(k).isNull() if v is None else (F.col(k) == F.lit(v))
            sub = c if sub is None else (sub & c)
        clause = sub if clause is None else (clause | sub)
    return df.filter(clause) if clause is not None else df


def select_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    """P4: keep listed columns in the given order (flows/sitemap.py:86)."""
    return df.select(*fields)


def delete_fields(df: DataFrame, patterns: list[str]) -> DataFrame:
    """P5: drop columns; names may be regexes, resolved against df.columns at
    plan time (reference supports 'alt_name[1-5]' — flows/organisations.py:72,
    flows/datasets.py:363)."""
    to_drop = set()
    for pat in patterns:
        rx = re.compile(f"^{pat}$")
        matched = [c for c in df.columns if rx.match(c)]
        if matched:
            to_drop.update(matched)
        elif pat in df.columns:
            to_drop.add(pat)
    return df.drop(*to_drop) if to_drop else df


def add_field(
    df: DataFrame,
    name: str,
    type_: str = "string",
    default: Any | Column = None,
    **es_metadata: Any,
) -> DataFrame:
    """C1: append a column with a constant or computed default
    (flows/datasets.py:340, flows/publications.py:125-126). ``default`` may be
    a Column expression (the Spark analogue of the reference's lambda(row)).
    es:* kwargs ride in StructField metadata for the ES sink."""
    col = default if isinstance(default, Column) else F.lit(default)
    spark_type = {
        "string": "string",
        "integer": "long",
        "number": "double",
        "boolean": "boolean",
        "date": "date",
        "datetime": "timestamp",
        "array": "array<string>",
        "object": "string",
    }.get(type_)
    if spark_type and not isinstance(default, Column):
        col = col.cast(spark_type)
    out = df.withColumn(name, col)
    if es_metadata:
        meta = {k.replace("es_", "es:"): v for k, v in es_metadata.items()}
        out = out.withMetadata(name, meta)
    return out


def format_field(df: DataFrame, name: str, pattern: str) -> DataFrame:
    """C2: string-interpolation column from row fields, e.g.
    'publications/{migdar_id}' (flows/publications.py:134-138,
    flows/organisations.py:85-89)."""
    parts: list[Column] = []
    for literal, field in re.findall(r"([^{]*)(?:\{([^}]+)\})?", pattern):
        if literal:
            parts.append(F.lit(literal))
        if field:
            parts.append(F.col(field).cast("string"))
    return df.withColumn(name, F.concat(*parts) if parts else F.lit(""))


def add_computed_field(
    df: DataFrame, name: str, expr: Column | str, **es_metadata: Any
) -> DataFrame:
    """C3: arbitrary computed column — the expression IS the operation
    (reference passes a lambda; here a Column keeps it JVM-side)."""
    col = F.expr(expr) if isinstance(expr, str) else expr
    out = df.withColumn(name, col)
    if es_metadata:
        meta = {k.replace("es_", "es:"): v for k, v in es_metadata.items()}
        out = out.withMetadata(name, meta)
    return out


def set_type(
    df: DataFrame,
    name: str,
    type_: str,
    group_char: str | None = None,
    bare_number: bool = False,
    on_error_default: Any = None,
    **es_metadata: Any,
) -> DataFrame:
    """§1.3 progressive schema refinement: cast a column in place with the
    reference's dirty-number handling.

    - ``group_char``: strip thousands separators before cast
      (flows/datasets.py:345 ``groupChar=','``).
    - ``bare_number``: strip any non-numeric glyphs (%, currency, Hebrew
      suffixes) keeping digits/sign/decimal point.
    - ``on_error_default``: failed casts become this value instead of null —
      the reference's on_error handler (flows/datasets.py:312-316 substitutes
      2020 on failed integer cast of extrapulation years).
    """
    target = {
        "string": "string",
        "integer": "long",
        "number": "double",
        "decimal": "decimal(38,10)",
        "boolean": "boolean",
        "date": "date",
        "datetime": "timestamp",
    }[type_]
    col: Column = F.col(name)
    if group_char:
        col = F.regexp_replace(col.cast("string"), re.escape(group_char), "")
    if bare_number:
        col = F.regexp_replace(col.cast("string"), r"[^0-9.+-]", "")
        col = F.when(col == "", None).otherwise(col)
    # try_cast: malformed input -> null (the reference's cast errors are
    # handled, not thrown — ANSI mode would abort the job instead).
    cast = col.try_cast(target)
    if on_error_default is not None:
        cast = F.when(
            F.col(name).isNotNull() & cast.isNull(), F.lit(on_error_default).cast(target)
        ).otherwise(cast)
    out = df.withColumn(name, cast)
    if es_metadata:
        meta = {k.replace("es_", "es:"): v for k, v in es_metadata.items()}
        out = out.withMetadata(name, meta)
    return out


def rename_fields(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Bulk column rename (used by join field specs and concatenate)."""
    return df.withColumnsRenamed(mapping)
