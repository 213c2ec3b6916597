"""Similarity search over an embedding column (array<float>).

Two tiers:
  * cosine_topk — brute-force exact top-k: queries x corpus with the dot
    product as a pure expression fold. The queries side is broadcast (it is
    small by construction); the corpus is scanned once, no shuffle besides the
    final per-query top-k, which is a partial top-k under AQE.
  * ivf_topk — the scale path: both sides carry a coarse cell id (IVF-style
    quantizer; any assignment works — a kmeans label, an LSH bucket). Probing
    only matching cells cuts the candidate set by ~|cells|x at the cost of
    recall, the standard ANN trade.

At 100 TB the corpus lives partitioned by cell; ivf_topk's join is then
co-partitioned and the brute-force tier is reserved for reranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbours per query by cosine. Returns
    (query_id, neighbour_id, cosine, rank)."""
    q = F.broadcast(
        queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("qv"))
    )
    c = corpus.select(F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cv"))
    pairs = c.join(q, F.lit(True))
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col("cid"))
    scored = pairs.withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbour_id"),
            "cosine",
            "rank",
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    cell_col: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """ANN top-k probing only the query's cell (IVF nprobe=1). Same output
    shape as cosine_topk; recall < 1 by design."""
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("qid"),
            F.col(query_vec).alias("qv"),
            F.col(cell_col).alias("qcell"),
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"),
        F.col(corpus_vec).alias("cv"),
        F.col(cell_col).alias("ccell"),
    )
    pairs = c.join(q, F.col("qcell") == F.col("ccell"))
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col("cid"))
    scored = pairs.withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbour_id"),
            "cosine",
            "rank",
        )
    )
