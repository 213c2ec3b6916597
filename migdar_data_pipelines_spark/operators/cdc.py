"""D1-D3: hash-diff CDC (the reference's incremental-processing semantics).

Reference (obsolete/prepare_data_for_es.py): read the existing {key -> stored
hash + status} snapshot (:41-60), md5-hash each incoming row's non-key fields
(:80-87,173-186), compare to classify __is_new / changed / same / __is_stale
(:90-169), stamp a REVISION counter (constants.py:12-14) so a post-load GC can
delete stale docs (dump_to_es.py:43-79).

Spark-first: one full-outer join on the key + a column block — the classic
hash-diff. At scale both sides shuffle-partition on the key; with Delta this
becomes MERGE INTO, but the classification output here is engine-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import content_hash


def hash_diff(
    incoming: DataFrame,
    existing: DataFrame,
    key: str,
    hash_cols: list[str],
    existing_hash_col: str = "__hash",
    revision: int | None = None,
) -> DataFrame:
    """Classify incoming rows vs the stored snapshot.

    Returns incoming columns + ``__hash`` + ``__status`` in
    {'new','changed','same','stale'}; stale rows (present only in the
    snapshot) carry the snapshot key with nulls elsewhere. Optional
    ``revision`` stamps the reference's revision counter (D3).
    """
    inc = incoming.withColumn("__hash", content_hash(hash_cols))
    ex = existing.select(
        F.col(key).alias("__ex_key"), F.col(existing_hash_col).alias("__ex_hash")
    )
    joined = inc.join(ex, inc[key] == ex["__ex_key"], "full_outer")
    status = (
        F.when(F.col("__ex_key").isNull(), "new")
        .when(F.col(key).isNull(), "stale")
        .when(F.col("__hash") == F.col("__ex_hash"), "same")
        .otherwise("changed")
    )
    out = joined.withColumn("__status", status).withColumn(
        key, F.coalesce(F.col(key), F.col("__ex_key"))
    ).drop("__ex_key", "__ex_hash")
    if revision is not None:
        out = out.withColumn("revision", F.lit(int(revision)))
    return out


def cdc_counts(classified: DataFrame) -> DataFrame:
    """A3: totals of new/changed/same/stale rows
    (obsolete/prepare_data_for_es.py:90-169 keeps running counters)."""
    return classified.groupBy("__status").agg(F.count(F.lit(1)).alias("n"))


def scd2_history(
    df: DataFrame,
    keys: list[str],
    attr_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from attribute
    snapshots: one row per (key, unbroken run of equal attributes) with
    ``valid_from`` (first snapshot showing the state), ``valid_to`` (the
    NEXT state's valid_from; null while current) and ``is_current``.

    Two windows over one shuffle on the key: change rows are where the
    attribute hash differs from its lag (or no lag — the first snapshot);
    lead() over the surviving change rows closes each interval. This is the
    warehouse-standard materialization of the hash-diff CDC stream above —
    D1's classification turned into queryable validity intervals. Snapshots
    must be unique per (key, ts)."""
    from pyspark.sql import Window

    from .textops import content_hash

    w = Window.partitionBy(*keys).orderBy(ts_col)
    h = content_hash(attr_cols)
    marked = df.withColumn("__h", h).withColumn(
        "__prev", F.lag("__h").over(w)
    )
    changes = marked.filter(
        F.col("__prev").isNull() | (F.col("__h") != F.col("__prev"))
    )
    w2 = Window.partitionBy(*keys).orderBy(ts_col)
    return (
        changes.withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumnRenamed(ts_col, "valid_from")
        .drop("__h", "__prev")
    )
