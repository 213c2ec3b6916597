"""Bucketed range join — interval containment as an equi-join.

``point BETWEEN start AND end`` has no equality predicate, so Spark plans it
as BroadcastNestedLoopJoin — O(|points| x |intervals|) comparisons, the
classic scale-killer for "which time windows does this event fall in".

The bucketed form makes it shuffle-joinable: pick a bucket width, map each
point to ``floor(p / w)``, explode each interval to every bucket it overlaps
(``sequence(floor(s/w), floor(e/w))``), equi-join on the bucket, then apply
the exact BETWEEN as a post-join filter. A matching pair meets exactly once —
the point lives in one bucket and the interval covers that bucket once — so
no distinct pass is needed. Cost: one shuffle of each side on an 8-byte
bucket key plus interval duplication by ``ceil(len/w) + 1``; pick w near the
typical interval length so that factor stays ~2.

Works on any numeric axis; for timestamps, convert both sides to epoch
microseconds first (``F.unix_micros``) — bucketing on raw timestamps would
tie the width to calendar arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them (inclusive on
    both bounds). Column names must not collide across the two inputs."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    p = points.withColumn("__b", F.floor(F.col(point_col) / bucket_width))
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor(F.col(end_col) / bucket_width),
            )
        ),
    )
    return (
        p.join(i, "__b")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__b")
    )
