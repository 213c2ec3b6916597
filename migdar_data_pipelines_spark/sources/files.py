"""File sources S1/S3/S4/S10: CSV / parquet / JSON with the ``__ord`` stamp.

Reference loads (SURVEY.md §2.1) stream files row-by-row in file order; several
downstream operators depend on that order (forward fill, dedup suffix,
ordinals). The engine convention (§7.4): every source stamps ``__ord``.

Scale: ``monotonically_increasing_id`` is partition-local — it preserves
within-file order without any shuffle and gives a global order when combined
with the file's partition index (which it encodes in its high bits). For
multi-file crawls (S10) the (file, line) order is made explicit from
``input_file_name`` so results don't depend on split planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import ORD


def _stamp(df: DataFrame) -> DataFrame:
    return df.withColumn(ORD, F.monotonically_increasing_id())


def load_csv(
    spark: SparkSession,
    path: str | list[str],
    header: bool = True,
    infer_strings: bool = False,
    encoding: str = "utf-8",
    **options,
) -> DataFrame:
    """S1/S4: CSV load. ``infer_strings=True`` mirrors the reference's
    INFER_STRINGS/CAST_TO_STRINGS strategy (flows/publications.py:87-90):
    everything string, cast later with set_type."""
    reader = (
        spark.read.option("header", header)
        .option("encoding", encoding)
        .option("inferSchema", not infer_strings)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return _stamp(reader.csv(path))


def load_parquet(
    spark: SparkSession,
    path: str | list[str],
    stamp_ord: bool = False,
    merge_schema: bool = False,
) -> DataFrame:
    """S3: reload a previously dumped stage (manifest-described parquet).

    ``merge_schema=True`` reconciles stages written under an EVOLVED schema
    (a later pipeline run added a column): the union schema is read from all
    footers and absent columns come back null — the reference's progressive
    schema refinement (SURVEY §1.3) applied across stage generations. Off by
    default: footer merging reads every file's metadata up front, which is a
    real cost over 100 TB of stage history when schemas are known stable."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*(path if isinstance(path, list) else [path]))
    return _stamp(df) if stamp_ord else df


def load_json(spark: SparkSession, path: str | list[str], multiline: bool = True) -> DataFrame:
    """S7: JSON payloads fetched from APIs, landed then scanned."""
    return _stamp(spark.read.option("multiline", multiline).json(path))


def indexed_crawl(
    spark: SparkSession,
    paths: list[str],
    id_col: str = "migdar_id",
    id_prefix_from_file: bool = True,
    **csv_options,
) -> DataFrame:
    """S10: read an index's referenced per-search CSVs, synthesizing
    ``migdar_id = f'{search_id}-{rownum}'`` (obsolete/join_publications.py:26-36)
    via input_file_name + per-file row_number."""
    df = load_csv(spark, paths, **csv_options).withColumn("__file", F.input_file_name())
    w = Window.partitionBy("__file").orderBy(ORD)
    search_id = F.regexp_extract(F.col("__file"), r"([^/]+)/[^/]+$", 1)
    rn = F.row_number().over(w)
    out = df.withColumn(
        id_col,
        F.concat(search_id, F.lit("-"), rn.cast("string")) if id_prefix_from_file else rn.cast("string"),
    )
    return out.drop("__file")
