"""Exact heavy hitters (top-k by frequency) without a full-cardinality
shuffle: two-phase Misra-Gries.

The plain plan — ``groupBy(col).count()`` then top-k — is map-side
combinable, but its exchange still carries one row PER DISTINCT KEY per map
partition: at 100 TB of URLs/tokens that is billions of partial rows whose
only purpose is to lose to the top-k filter. The classic fix (Misra-Gries
1982; the summary-merge analysis is Agarwal et al., "Mergeable Summaries",
PODS 2012) runs per-partition MG summaries of capacity ``c`` — bounded
state, one pass — and only the summaries' SURVIVORS (<= c rows per
partition) become candidates whose exact counts are then re-counted with an
ordinary combinable groupBy over a broadcast semi-join. The result is
certified exact, not approximate:

* MG guarantee, per partition p with n_p rows: any value absent from p's
  summary has true count in p strictly below n_p / (c + 1).
* Summed over partitions: a value absent from EVERY summary has global
  count < N / (c + 1).
* So if the k-th best exact candidate count >= N / (c + 1), no
  non-candidate can displace the top k — the answer equals the full
  groupBy's. The operator CHECKS this certificate; when the data is too
  flat for it (no heavy hitters at this capacity), it falls back to the
  plain full groupBy rather than return a possibly-wrong set.

Reference scope: the reference engine has no frequency operator at all
(its closest is the es-dumper's per-type counts); this is part of the
LLM-scale toolkit next to the CMS/HLL sketches (operators/sketches.py) —
CMS estimates any key's count with error; this returns the exact top-k set
with a proof, which is what vocabulary builds and URL-dedup triage actually
consume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .caching import scoped_persist

# default summary capacity: candidates are <= capacity * n_partitions rows
# (at 64 * 1000 partitions = 64k rows — broadcast-sized), and the
# certificate needs the k-th hitter to hold > N/(capacity+1) of the rows,
# so capacity should be >> k / (expected share of the k-th hitter).
DEFAULT_CAPACITY = 256


def _mg_partial(capacity: int):
    """Per-partition Misra-Gries over a single 'v' column via the MERGE form
    (Agarwal et al. 2012, Lemma 1): each Arrow batch's exact value_counts is
    a trivially-valid summary; merging = add counts, and when more than
    ``capacity`` entries remain, subtract the (capacity+1)-th largest count
    from ALL and drop the non-positive — the total undercount introduced
    across all merges stays <= n_p/(capacity+1). Fully vectorized in pandas
    (the element-at-a-time MG fold costs O(capacity) python-dict work per
    eviction event — measured irrelevant at sketch sizes but pointless when
    the merge form is a two-liner on Series). Emits (value, est, rows_seen);
    est is the residual (undercounted) weight, rows_seen sums to N."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s = None
        rows_seen = 0
        for pdf in batches:
            vals = pdf["v"]
            rows_seen += len(vals)
            vc = vals.value_counts()
            s = vc if s is None else s.add(vc, fill_value=0)
            if len(s) > capacity:
                cut = s.nlargest(capacity + 1).iloc[-1]
                s = s[s > cut] - cut
        if s is None or len(s) == 0:
            yield pd.DataFrame({"v": [None], "est": [0], "rows_seen": [rows_seen]})
            return
        out = pd.DataFrame(
            {
                "v": s.index,
                "est": s.values.astype("int64"),
                "rows_seen": [0] * len(s),
            }
        )
        out.loc[out.index[0], "rows_seen"] = rows_seen
        yield out

    return run


def frequent_items(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int = DEFAULT_CAPACITY,
) -> DataFrame:
    """Exact top-``k`` values of ``col`` by count, as (value, n, rank) with
    the deterministic (n desc, value asc) ordering — ties at the boundary
    resolve by value, so the result is a pure function of the data.

    NULL keys are excluded (the SQL mirror filters them identically) — a
    NULL-share question belongs to the profiling operators, not a
    vocabulary/top-terms result.

    Scale shape: one scan-local MG pass (bounded ``capacity`` state per
    partition), a summary-sized merge (<= capacity * partitions rows), one
    broadcast semi-join + combinable groupBy over candidate rows only, and
    a k-bounded TakeOrdered. The full-cardinality exchange of the naive
    plan never happens — unless the exactness certificate fails (see module
    docstring), in which case the operator runs the plain groupBy (with the
    same k-bounded TakeOrdered, never a global single-partition sort) and
    the answer is still exact, just not cheap.
    """
    assert k >= 1 and capacity > k
    src = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    field = src.schema["v"]
    summary_schema = (
        f"v {field.dataType.simpleString()}, est long, rows_seen long"
    )
    summaries = scoped_persist(
        src.mapInPandas(_mg_partial(capacity), schema=summary_schema)
    )
    totals = summaries.agg(F.sum("rows_seen").alias("n")).collect()[0]
    n_total = int(totals["n"] or 0)

    from .windows import bounded_running

    def ranked_topk(counts: DataFrame) -> DataFrame:
        # TakeOrdered (orderBy+limit) keeps the sort k-bounded per partition;
        # ranks on the k-row frame come from bounded_running's broadcast
        # self-join, not a no-partition WindowExec (house convention, see
        # vocab_top_terms). (n desc, v asc) totally orders: v is distinct.
        lim = scoped_persist(counts.orderBy(F.desc("n"), F.asc("v")).limit(k))
        return bounded_running(
            lim, order_by=[("n", "desc"), ("v", "asc")], rank_col="rank"
        ).select(
            F.col("v").alias("value"),
            F.col("n").cast("long").alias("n"),
            F.col("rank").cast("long").alias("rank"),
        )

    if n_total == 0:
        return src.limit(0).select(
            F.col("v").alias("value"),
            F.lit(0).cast("long").alias("n"),
            F.lit(0).cast("long").alias("rank"),
        )
    candidates = summaries.filter(F.col("v").isNotNull()).select("v").distinct()

    exact = (
        src.join(F.broadcast(candidates), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    topk = ranked_topk(exact)  # k-row frame persisted inside ranked_topk
    rows = topk.count()
    kth = (
        topk.agg(F.min("n").alias("kth")).collect()[0]["kth"] if rows else 0
    )
    # certificate: a value absent from every summary has global count
    # <= N/(capacity+1); the k-th candidate must clear that bound STRICTLY
    # (an exact tie could still displace it under the value tie-break)
    if rows >= k and kth * (capacity + 1) > n_total:
        return topk
    # flat data at this capacity (or fewer than k certified candidates):
    # fall back to the plain exact plan
    full = src.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    return ranked_topk(full)


def frequent_items_sql(col: str, from_sql: str, k: int = 10) -> str:
    """DuckDB mirror: the plain exact top-k with the same deterministic
    (count desc, value asc) tie-break and the same NULL exclusion — the
    oracle for both the certified fast path and the fallback (they must
    agree by construction)."""
    return f"""
SELECT value, n, rank FROM (
  SELECT {col} AS value, CAST(count(*) AS BIGINT) AS n,
         CAST(row_number() OVER (ORDER BY count(*) DESC, {col} ASC) AS BIGINT)
           AS rank
  FROM {from_sql} WHERE {col} IS NOT NULL GROUP BY {col}
) WHERE rank <= {k}
"""


__all__ = ["frequent_items", "frequent_items_sql", "DEFAULT_CAPACITY"]
