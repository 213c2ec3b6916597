"""W1-W4 + C4: the reference's order-dependent operators.

In the reference these are stateful single-threaded generators whose semantics
depend on stream order (SURVEY.md §2.8). The engine convention (§7.4): every
source stamps an explicit ``__ord`` column; each operator here takes the order
column explicitly and is deterministic under any partitioning.

Scale note: ``Window.orderBy`` without partitionBy is a single-partition sort —
fine for the reference-sized resources these mirror (thousands of rows), wrong
for 100 TB facts. Operators that could meet big data (first_seen_dedup,
dedup_suffix) partition by key and only sort within key groups, which scales;
the global-order ones (forward_fill, add_ordinal) document the constraint and
accept partition keys where the semantics allow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ORD = "__ord"


def stamp_ord(df: DataFrame, order_by: list[Column | str] | None = None) -> DataFrame:
    """Stamp the engine's monotonic order column. With ``order_by``, a
    row_number over that order (single-partition — use on dimension-sized
    data); without, ``monotonically_increasing_id`` preserves file/partition
    order without any shuffle (the scalable default for sources)."""
    if order_by:
        w = Window.orderBy(*order_by)
        return df.withColumn(ORD, F.row_number().over(w).cast("long") - 1)
    return df.withColumn(ORD, F.monotonically_increasing_id())


def forward_fill(
    df: DataFrame,
    col: str,
    order_col: str = ORD,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """W1: col := last non-null seen in order (flows/datasets.py:303-309
    forward-fills chart_title). ``partition_by`` bounds the window for scale
    when fill never crosses a key boundary."""
    w = (
        Window.partitionBy(*partition_by) if partition_by else Window.partitionBy(F.lit(1))
    ).orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(col, F.last(col, ignorenulls=True).over(w))


def dedup_suffix(
    df: DataFrame, key: str, order_col: str = ORD, out: str | None = None
) -> DataFrame:
    """W2: 2nd+ occurrence of ``key`` gets suffix .1, .2, ... in stream order
    (flows/organisations.py:44-52 suffixes duplicate entity_ids). Partitioned
    by key -> scales; sort only within duplicate groups."""
    out = out or key
    w = Window.partitionBy(key).orderBy(order_col)
    rn = F.row_number().over(w)
    return df.withColumn(
        out,
        F.when(rn > 1, F.concat(F.col(key).cast("string"), F.lit("."), (rn - 1).cast("string")))
        .otherwise(F.col(key).cast("string")),
    )


def add_ordinal(
    df: DataFrame, name: str = "order_index", order_col: str = ORD, start: int = 0
) -> DataFrame:
    """C4/W3: global ordinal (flows/datasets.py:341 ``order_index = i``).
    Global total order -> single-partition window; reference resources are
    small. For large data prefer zipWithIndex-style ``stamp_ord``."""
    w = Window.orderBy(order_col)
    return df.withColumn(name, F.row_number().over(w).cast("long") - 1 + start)


def first_seen_dedup(
    df: DataFrame, keys: list[str], order_col: str = ORD
) -> DataFrame:
    """W4/R3: first row per key wins (flows/broken_links.py:34-43 emits each
    URL once, keeping the first carrying row). Partitioned by key — scales to
    arbitrary data; map-side partial via AQE skew handling."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def explode_dedup(
    df: DataFrame,
    array_col: str,
    out_col: str,
    order_col: str = ORD,
    keep: list[str] | None = None,
) -> DataFrame:
    """R3 ``unwind``: one row per element of ``array_col``, each distinct value
    emitted once globally, first carrying row wins (broken_links.py:34-43)."""
    exploded = df.select(
        *(keep or [c for c in df.columns if c != array_col]),
        F.explode(array_col).alias(out_col),
    )
    return first_seen_dedup(exploded, [out_col], order_col=order_col)
