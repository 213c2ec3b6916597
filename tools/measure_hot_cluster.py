#!/usr/bin/env python
"""Measure the LSH hot-bucket shape (VERDICT r10 #1): a near-identical
template cluster funneling into one band bucket — the one skew shape the
Zipfian rung (groupBy/window/SMJ only) didn't exercise, and the classic
production LSH failure (a 1M-doc boilerplate cluster is ~10^12 candidate
pairs out of a single bucket at 100 TB).

Corpus: tools/gen_scale_corpus.py gen_documents_hotcluster() — 500k docs,
EXACTLY 20% one near-identical cluster (shared 39-word template + unique
final word; member-member Jaccard 35/41 ~ 0.854, so exact dedup can't
collapse it and verification keeps every cluster pair). Rungs by doc_id
prefix keep the 20% ratio: 50k (10k-member cluster) and 500k (100k-member).

Per rung this measures, from the band-bucket size histogram (sums over
bucket sizes — the implied quadratic is COMPUTED, never materialized):

  buckets / max bucket size / buckets over MAX_LSH_BUCKET_SIZE,
  implied_unguarded_pairs = sum n*(n-1)/2 over all buckets (what the
      pre-guard all-pairs self-join would emit, before dedup),
  guarded_candidates     = sum_small n*(n-1)/2 + sum_big (n-1) (what the
      capped join emits: all-pairs below the ceiling, star above),

then runs the REAL guarded operator end-to-end (production params of
dedup_groups_lsh: 32 hashes / 16 bands / k=3 / threshold 0.8) for wall
time + verified pair count, and checks group CORRECTNESS: the cluster must
come out as ONE connected-component group of exactly n/5 docs (star
chaining through the canonical member preserves it).

A 5k mini-rung (1k-member cluster, below the quadratic wall) additionally
runs the UNGUARDED path and asserts the dedup GROUPS are identical —
the same invariant tests/test_llm_ops.py::test_lsh_hot_bucket_ceiling
pins at unit scale, re-proven on the generated corpus.

Writes /tmp/migdar_scale/hot_cluster_stats.json for tools/gen_scaling.py.

Usage: python tools/measure_hot_cluster.py   (run alone; ~3-6 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/migdar_scale")
CORPUS = f"{SCALE_DIR}/documents_hotcluster.parquet"
N_HASHES, BANDS, K, THRESHOLD = 32, 16, 3, 0.8


def bucket_stats(spark, limit: int) -> dict[str, int]:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import (
        MAX_LSH_BUCKET_SIZE,
        _shingle_band_frames,
    )

    corpus = spark.read.parquet(CORPUS).filter(F.col("doc_id") < limit)
    _, band_rows = _shingle_band_frames(
        corpus, "text", "doc_id", N_HASHES, BANDS, K
    )
    sizes = band_rows.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    c = MAX_LSH_BUCKET_SIZE
    row = sizes.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.max("n").alias("max_bucket"),
        F.sum(F.when(F.col("n") > c, 1).otherwise(0)).alias("hot_buckets"),
        F.sum(F.expr("n * (n - 1) / 2").cast("long")).alias("implied_unguarded"),
        F.sum(
            F.when(F.col("n") > c, F.col("n") - 1).otherwise(
                F.expr("n * (n - 1) / 2").cast("long")
            )
        ).alias("guarded_candidates"),
    ).collect()[0]
    return {k: int(row[k]) for k in row.asDict()}


def guarded_run(spark, limit: int) -> dict[str, int | float]:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import (
        canonical_groups,
        minhash_lsh_pairs,
    )
    from migdar_data_pipelines_spark.operators import metrics

    corpus = spark.read.parquet(CORPUS).filter(F.col("doc_id") < limit)
    t0 = time.time()
    pairs = minhash_lsh_pairs(
        corpus, "text", "doc_id",
        n_hashes=N_HASHES, bands=BANDS, k=K, jaccard_threshold=THRESHOLD,
    )
    n_pairs = pairs.count()
    wall = time.time() - t0
    groups = canonical_groups(corpus.select("doc_id"), pairs, "doc_id")
    cluster = groups.filter(F.col("canonical_id") == 0).count()
    expected = limit // 5
    # Not an equality: a member whose unique tail shingle hashes BELOW every
    # common shingle wins permutation minima and can land in singleton
    # buckets in every band — a genuine LSH false negative (measured: doc
    # 1010, unique-shingle h=12.4M vs common min 91M) that the UNGUARDED
    # path misses identically (singleton buckets emit no pairs either way;
    # the 5k mini-rung group-equality run includes doc 1010 and passes).
    # The guard must not ADD misses beyond that signature-scheme floor.
    assert cluster >= 0.999 * expected, (
        f"cluster capture {cluster}/{expected} below the 99.9% floor"
    )
    return {
        "verified_pairs": n_pairs,
        "wall_s": round(wall, 2),
        "lsh_hot_buckets": metrics.LAST.get("lsh_hot_buckets", 0),
        "lsh_hot_bucket_rows": metrics.LAST.get("lsh_hot_bucket_rows", 0),
        "cluster_group_size": cluster,
        "cluster_expected": expected,
        "lsh_signature_misses": expected - cluster,
    }


def mini_rung_group_equality(spark) -> dict[str, int]:
    """5k docs / 1k cluster: small enough to run UNGUARDED — assert the
    guarded and unguarded paths produce identical dedup groups."""
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import (
        canonical_groups,
        minhash_lsh_pairs,
    )

    corpus = spark.read.parquet(CORPUS).filter(F.col("doc_id") < 5_000)
    ids = corpus.select("doc_id")

    def groups(max_bucket):
        p = minhash_lsh_pairs(
            corpus, "text", "doc_id",
            n_hashes=N_HASHES, bands=BANDS, k=K,
            jaccard_threshold=THRESHOLD, max_bucket_size=max_bucket,
        )
        return (
            {(r.doc_id, r.canonical_id)
             for r in canonical_groups(ids, p, "doc_id").collect()},
            p.count(),
        )

    g_guard, n_guard = groups(500)  # 1k cluster trips a 500 ceiling
    g_plain, n_plain = groups(None)
    assert g_guard == g_plain, "groups diverged between guarded and unguarded"
    return {"guarded_pairs": n_guard, "unguarded_pairs": n_plain}


def main() -> None:
    from migdar_data_pipelines_spark.operators.caching import release_scoped
    from migdar_data_pipelines_spark.session import get_spark

    if not os.path.exists(CORPUS):
        sys.exit(f"missing {CORPUS} — run tools/gen_scale_corpus.py first")
    spark = get_spark("measure-hot-cluster", shuffle_partitions=32)
    out: dict[str, dict] = {}

    out["mini_5k_equality"] = mini_rung_group_equality(spark)
    release_scoped()
    spark.catalog.clearCache()
    print("mini 5k:", out["mini_5k_equality"])

    for name, limit in [("50k", 50_000), ("500k", 500_000)]:
        s = bucket_stats(spark, limit)
        release_scoped()
        spark.catalog.clearCache()
        r = guarded_run(spark, limit)
        release_scoped()
        spark.catalog.clearCache()
        s.update(r)
        s["cut_factor"] = round(
            s["implied_unguarded"] / max(1, s["guarded_candidates"]), 1
        )
        out[name] = s
        print(f"{name}: {s}")

    with open(f"{SCALE_DIR}/hot_cluster_stats.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", f"{SCALE_DIR}/hot_cluster_stats.json")
    spark.stop()


if __name__ == "__main__":
    main()
