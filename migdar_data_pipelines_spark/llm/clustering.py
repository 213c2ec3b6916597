"""Distributed Lloyd k-means over embedding columns — the full-corpus
clustering primitive behind domain discovery, SemDeDup-style semantic
bucketing, and cluster-balanced mixture construction (reference parity:
the migdar pipelines group records by curated category columns; this is
the learned-geometry generalisation the LLM-scale corpus needs).

Two k-means live in this package and they are different tools:
``similarity.train_ivf_centroids`` learns a COARSE QUANTIZER on a bounded
driver-side sample (the IVF recipe — the corpus never reaches the
driver), while this module runs Lloyd iterations over the WHOLE corpus
distributedly: every row votes in every update, which is what you want
when the clusters themselves are the product (domain labels, dedup
buckets) rather than an index approximation.

Engine-exact by construction (the ``label_centroids_embeddings`` house
convention): every coordinate is quantized once to integer micro-units
(``round(x * 1e6)`` — exact, order-independent sums), distances are
integer sums of squares, centroid updates are exact integer floor
divisions (``(s - pmod(s, n)) div n`` — the mod-adjusted numerator is
divisible, so Spark's truncating ``div`` and DuckDB's flooring ``//``
agree on every sign), and ties go to the lowest cluster id. The DuckDB
mirror (``kmeans_sql``) unrolls the same iterations as CTEs from the
same literals, so engine and oracle match bit-for-bit with no float
accumulation order anywhere in the contract.

Shape at scale (100 TB corpus, k clusters, d dims):

* one quantization pass, persisted — the only corpus-sized state, and it
  lives distributed;
* per iteration: one scan-local pandas_udf assignment (the k x d integer
  centroid matrix rides in the closure — kilobytes), then a
  posexplode -> groupBy(cluster, dim) update whose exchange carries only
  (cluster, dim, partial-sum) rows — map-side combinable, k*d groups;
* the driver holds k*d longs per round (never rows), so iterations are
  eager by necessity (each update is a collect) — documented here the
  same way as ``incremental_dedup``'s plan-time jobs;
* empty clusters keep their previous centroid (no resampling — keeps
  the trace deterministic and the SQL mirror a left join + coalesce).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .._serde import register_self_contained
from .curation import md5_bucket, md5_bucket_sql

register_self_contained(__name__)

#: micro-unit quantization scale (parity with label_centroids_embeddings)
KMEANS_SCALE = 1_000_000


def quantize_vectors(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, vq) with vq = array<long> of round(x * 1e6) micro-units.

    All downstream arithmetic is integer-exact; the one float op (the
    round) is a single correctly-rounded IEEE multiply both engines
    perform identically on the raw stored value.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * KMEANS_SCALE).cast("long"),
        ).alias("vq"),
    )


def _seed_centroids(v: DataFrame, k: int) -> list[list[int]]:
    """Deterministic init: the k rows with the smallest (md5-fold(id), id)
    become centroids 0..k-1 in that order. orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-k, no global sort); the
    driver receives k vectors, never the corpus."""
    rows = (
        v.select("id", "vq", md5_bucket("id").alias("__f"))
        .orderBy("__f", "id")
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("kmeans: empty input")
    return [list(r["vq"]) for r in rows]


def _assign_udf(centroids: list[list[int]], with_dist: bool):
    """Scalar pandas_udf: argmin over integer squared distances, ties to
    the lowest cluster id (np.argmin's first-minimum IS that rule). All
    int64: |xq| <= ~1e6 * |x|, so per-dim squared diffs stay < 4e12 and
    64-dim sums < 3e14 — exact, no float in sight."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.int64)
    c2 = np.einsum("kd,kd->k", C, C)

    if with_dist:

        @pandas_udf("struct<cluster: int, dist_q: long>")
        def _assign(vqs: pd.Series) -> pd.DataFrame:
            X = np.asarray(vqs.tolist(), dtype=np.int64)
            d = (
                np.einsum("nd,nd->n", X, X)[:, None]
                - 2 * (X @ C.T)
                + c2[None, :]
            )
            a = np.argmin(d, axis=1)
            return pd.DataFrame(
                {
                    "cluster": a.astype("int32"),
                    "dist_q": d[np.arange(len(a)), a].astype("int64"),
                }
            )

        return _assign

    @pandas_udf("int")
    def _assign_only(vqs: pd.Series) -> pd.Series:
        X = np.asarray(vqs.tolist(), dtype=np.int64)
        d = np.einsum("nd,nd->n", X, X)[:, None] - 2 * (X @ C.T) + c2[None, :]
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    return _assign_only


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iters: int = 4,
) -> tuple[DataFrame, list[list[int]]]:
    """Full-corpus Lloyd k-means; returns (assignments, centroids).

    assignments: (id, cluster int, dist_q long) under the FINAL centroids
    — dist_q is the exact integer squared distance in micro-units², so
    the whole output surface is integer-exact. centroids: k lists of d
    micro-unit ints (the quantized means after ``n_iters`` updates).

    NOTE — eager construction: each Lloyd update is a driver collect of
    k*d longs, so building this result runs ``n_iters`` Spark jobs (plus
    the seed TakeOrdered) before the caller's first action on the
    returned frame. The quantized corpus is scoped-persisted so each
    round rescans the pinned frame, not the source.
    """
    from ..operators.caching import scoped_persist

    v = scoped_persist(quantize_vectors(df, vec_col, id_col))
    C = _seed_centroids(v, k)
    for _ in range(n_iters):
        a = v.withColumn("cluster", _assign_udf(C, with_dist=False)("vq"))
        upd = (
            a.select("cluster", F.posexplode("vq").alias("dim", "xq"))
            .groupBy("cluster", "dim")
            .agg(F.sum("xq").alias("s"), F.count(F.lit(1)).alias("n"))
            # exact floor(s / n): mod-adjust then divide — the numerator is
            # divisible, so truncating div == flooring // in both engines
            .withColumn("cq", F.expr("(s - pmod(s, n)) div n"))
            .select("cluster", "dim", "cq")
            .collect()
        )
        # clusters absent from upd had no members: previous centroid kept
        for r in upd:
            C[r["cluster"]][r["dim"]] = r["cq"]
    out = (
        v.withColumn("__a", _assign_udf(C, with_dist=True)("vq"))
        .select("id", F.col("__a.cluster").alias("cluster"), F.col("__a.dist_q").alias("dist_q"))
    )
    return out, C


def kmeans_sql(
    src_sql: str,
    k: int = 8,
    n_iters: int = 4,
    id_out: str = "vec_id",
) -> str:
    """Generated DuckDB mirror of ``kmeans_fit`` (single-source-of-truth
    rule: same md5 seed fold, same micro-unit scale, same floor-div
    identity, same lowest-cluster tie-break), iterations unrolled as
    CTEs. ``src_sql`` must yield ``(id, embedding)``.

    DuckDB type note: sum(BIGINT) is HUGEINT — the %/+/// chain stays in
    hugeint and the final CASTs pin the output surface to (BIGINT id,
    INTEGER cluster, BIGINT dist_q)."""
    fold = md5_bucket_sql("id")
    parts = [
        f"""vl AS (
  SELECT id, pos - 1 AS dim,
         CAST(round(CAST(x AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS xq
  FROM (SELECT id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM ({src_sql}))
)""",
        f"""seeds AS (
  SELECT id, cluster FROM (
    SELECT id, row_number() OVER (ORDER BY {fold}, id) - 1 AS cluster
    FROM ({src_sql})
  ) WHERE cluster < {k}
)""",
        """c0 AS (
  SELECT s.cluster, v.dim, v.xq AS cq FROM seeds s JOIN vl v USING (id)
)""",
    ]
    prev = "c0"
    for i in range(1, n_iters + 1):
        parts.append(
            f"""d{i} AS (
  SELECT v.id, c.cluster, sum((v.xq - c.cq) * (v.xq - c.cq)) AS dist
  FROM vl v JOIN {prev} c ON v.dim = c.dim
  GROUP BY v.id, c.cluster
),
a{i} AS (
  SELECT id, cluster FROM (
    SELECT id, cluster,
           row_number() OVER (PARTITION BY id ORDER BY dist, cluster) AS rk
    FROM d{i}
  ) WHERE rk = 1
),
c{i} AS (
  SELECT p.cluster, p.dim, coalesce(u.cq, p.cq) AS cq
  FROM {prev} p LEFT JOIN (
    SELECT a.cluster, v.dim,
           (sum(v.xq) - ((sum(v.xq) % count(*)) + count(*)) % count(*))
             // count(*) AS cq
    FROM a{i} a JOIN vl v USING (id)
    GROUP BY a.cluster, v.dim
  ) u ON p.cluster = u.cluster AND p.dim = u.dim
)"""
        )
        prev = f"c{i}"
    parts.append(
        f"""dfin AS (
  SELECT v.id, c.cluster, sum((v.xq - c.cq) * (v.xq - c.cq)) AS dist
  FROM vl v JOIN {prev} c ON v.dim = c.dim
  GROUP BY v.id, c.cluster
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT id AS {id_out}, CAST(cluster AS INTEGER) AS cluster,
       CAST(dist AS BIGINT) AS dist_q
FROM (
  SELECT id, cluster, dist,
         row_number() OVER (PARTITION BY id ORDER BY dist, cluster) AS rk
  FROM dfin
) WHERE rk = 1
"""
    )
