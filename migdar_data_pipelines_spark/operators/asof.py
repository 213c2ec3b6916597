"""As-of (point-in-time) join — a custom operator the Spark DataFrame API
lacks as a primitive.

Semantics: for each left row, attach the single right row with the same key
whose timestamp is the greatest at-or-before the left timestamp (``backward``,
the default), or the least at-or-after it (``forward``). Unmatched left rows
keep nulls (left-join semantics). This is the standard enrichment shape for
event streams — "state of X as of this event" — which the reference's KV-store
joins (flows/judges.py:137-143) can only approximate with exact keys.

Spark-first implementation — the union-merge pattern, NOT a range join:

1. Tag right rows and union them with left rows by name (missing columns
   null-filled).
2. One window per key, ordered by (ts, is_right DESC) with an
   unbounded-preceding row frame: ``last(right_struct, ignorenulls=True)``
   forward-propagates the most recent right payload onto every left row.
   Packing the payload in a STRUCT makes propagation null-safe: a right row
   whose value column is NULL still advances the as-of pointer.
3. Filter back to left rows and unpack.

Cost: ONE shuffle on the join key and a per-key sort — identical asymptotics
to a sort-merge equi-join, with none of the O(|L|·|R|) candidate explosion a
``l.ts >= r.ts`` range-join predicate produces. At 100 TB both inputs shuffle
once; AQE handles skewed keys like any other sort-merge join. A ``tolerance_s``
bound nulls matches older (backward) / newer (forward) than the window — the
match is dropped, not the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    fields: dict[str, str],
    direction: str = "backward",
    tolerance_s: float | None = None,
    right_ts_as: str | None = None,
) -> DataFrame:
    """Left as-of join: enrich ``left`` with ``fields`` ({right_col: out_name})
    from the nearest at-or-before (``backward``) / at-or-after (``forward``)
    ``right`` row per key.

    ``right`` should be unique per (key, right_ts) — pre-aggregate if not;
    with duplicates the propagated row among equals is unspecified.
    ``right_ts_as`` additionally emits the matched right timestamp.
    ``tolerance_s`` (seconds) nulls matches farther than the bound.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [F.col(src).alias(out) for src, out in fields.items()]
    payload.append(F.col(right_ts).cast("timestamp").alias("__rts"))
    r_tag = right.select(
        *keys,
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__is_r"),
        F.struct(*payload).alias("__pay"),
    )
    l_tag = left.withColumn("__ts", F.col(left_ts).cast("timestamp")).withColumn(
        "__is_r", F.lit(0)
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    ts_ord = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    # At equal timestamps the right row must sort BEFORE the left row so the
    # left row sees it (at-or-before / at-or-after inclusive semantics).
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_ord, F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__hit", F.last("__pay", ignorenulls=True).over(w))
    if tolerance_s is not None:
        gap = F.abs(
            F.col("__ts").cast("double") - F.col("__hit.__rts").cast("double")
        )
        filled = filled.withColumn(
            "__hit", F.when(gap <= F.lit(float(tolerance_s)), F.col("__hit"))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"__hit.{out}").alias(out) for out in fields.values()]
    if right_ts_as is not None:
        out_cols.append(F.col("__hit.__rts").alias(right_ts_as))
    return filled.filter(F.col("__is_r") == 0).select(*out_cols)
