#!/usr/bin/env python
"""Measure the SimHash hot-bucket + tiny-keyspace shapes (VERDICT r11 #1/#6):
the batch band self-join was the last unguarded quadratic; it now rides
``_band_candidates``'s per-bucket ceiling with the hamming verify folded into
the star form. Two distinct failure shapes are measured here:

  * HOT CLUSTER — documents_simhash_hot.parquet (gen_scale_corpus.py): 20% of
    docs share a 400-word boilerplate template + a member-unique final word,
    so member signatures sit within a few free-bit flips of each other and
    the whole cluster funnels into the same band buckets. Measured under the
    WIDE (48-bit / 12-bit-band) parameterization — the corpus-scale form the
    narrow-band RuntimeWarning steers callers to.
  * TINY KEYSPACE — the registered 32-bit / 8-bit-band form has only 256
    values per band, so at 500k docs the BACKGROUND alone pushes every
    bucket's occupancy ~1.5k > the ceiling: the join trends quadratic with
    no adversarial cluster at all. Histogram numbers contrast the two.

Per rung, from the band-bucket size histogram (sums over bucket sizes — the
implied quadratic is COMPUTED, never materialized):

  implied_unguarded_pairs = sum n*(n-1)/2  (pre-guard all-pairs output),
  guarded_candidates      = sum_small n*(n-1)/2 + sum_big (n-1),

then the REAL guarded operator end-to-end (wall + verified pairs + the
rep-connected cluster group via CC). Unlike the minhash hot rung, cluster
capture is NOT asserted ~100%: simhash's star form verifies hamming against
the representative, and a member 4+ free-bit flips from the rep that is
within 3 of some OTHER member is the documented recall trade — the 5k
mini-rung REPORTS that trade exactly (guarded pairs / groups vs the
unguarded quadratic truth).

Writes /tmp/migdar_scale/simhash_hot_stats.json for tools/gen_scaling.py.

Usage: python tools/measure_simhash_hot.py   (run alone; ~5-10 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/migdar_scale")
CORPUS = f"{SCALE_DIR}/documents_simhash_hot.parquet"
MAX_HAMMING = 3  # bands = 4 either way; 48-bit -> 12-bit bands, 32 -> 8


def bucket_stats(spark, limit: int, bits: int) -> dict[str, int]:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import (
        MAX_LSH_BUCKET_SIZE,
        simhash_fast,
    )

    bands = MAX_HAMMING + 1
    width = bits // bands
    mask = (1 << width) - 1
    corpus = spark.read.parquet(CORPUS).filter(F.col("doc_id") < limit)
    sh = corpus.select(simhash_fast("text", bits).alias("sh"))
    bucket_arr = F.array(
        *[
            (
                F.shiftright(F.col("sh"), width * i).bitwiseAND(mask)
                + F.lit(i * (mask + 1))
            ).cast("long")
            for i in range(bands)
        ]
    )
    sizes = (
        sh.select(F.explode(bucket_arr).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
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
    out = {k: int(row[k]) for k in row.asDict()}
    out["cut_factor"] = round(
        out["implied_unguarded"] / max(1, out["guarded_candidates"]), 1
    )
    return out


def guarded_run(spark, limit: int, bits: int) -> dict[str, int | float]:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import (
        canonical_groups,
        simhash_near_dup,
    )
    from migdar_data_pipelines_spark.operators import metrics

    corpus = spark.read.parquet(CORPUS).filter(F.col("doc_id") < limit)
    metrics.LAST.pop("lsh_hot_buckets", None)
    t0 = time.time()
    pairs = simhash_near_dup(
        corpus, "text", "doc_id", max_hamming=MAX_HAMMING, bits=bits
    )
    n_pairs = pairs.count()
    wall = time.time() - t0
    groups = canonical_groups(
        corpus.select("doc_id"), pairs.select("id_a", "id_b"), "doc_id"
    )
    cluster = groups.filter(F.col("canonical_id") == 0).count()
    return {
        "verified_pairs": n_pairs,
        "wall_s": round(wall, 2),
        "lsh_hot_buckets": metrics.LAST.get("lsh_hot_buckets", 0),
        "lsh_hot_bucket_rows": metrics.LAST.get("lsh_hot_bucket_rows", 0),
        "cluster_group_size": cluster,
        "cluster_expected": limit // 5,
    }


def mini_rung(spark) -> dict[str, int | float]:
    """5k docs / 1k cluster, 48-bit: small enough to run UNGUARDED — report
    the star form's exact recall trade (pairs kept, rep-group size) against
    the full quadratic-band truth, and assert guarded pairs are a SUBSET
    (the guard must never invent a pair)."""
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import (
        canonical_groups,
        simhash_near_dup,
    )

    corpus = spark.read.parquet(CORPUS).filter(F.col("doc_id") < 5_000)
    ids = corpus.select("doc_id")

    def run(max_bucket):
        p = simhash_near_dup(
            corpus, "text", "doc_id",
            max_hamming=MAX_HAMMING, bits=48, max_bucket_size=max_bucket,
        )
        pairs = {(r.id_a, r.id_b) for r in p.select("id_a", "id_b").collect()}
        rep_group = (
            canonical_groups(ids, p.select("id_a", "id_b"), "doc_id")
            .filter(F.col("canonical_id") == 0)
            .count()
        )
        return pairs, rep_group

    g_pairs, g_group = run(500)  # the 1k cluster trips a 500 ceiling
    u_pairs, u_group = run(None)
    assert g_pairs <= u_pairs, "guard invented pairs absent from the truth"
    return {
        "guarded_pairs": len(g_pairs),
        "unguarded_pairs": len(u_pairs),
        "pair_recall": round(len(g_pairs) / max(1, len(u_pairs)), 4),
        "guarded_rep_group": g_group,
        "unguarded_rep_group": u_group,
        "cluster_size": 1_000,
    }


def main() -> None:
    import warnings

    from migdar_data_pipelines_spark.operators.caching import release_scoped
    from migdar_data_pipelines_spark.session import get_spark

    warnings.simplefilter("ignore", RuntimeWarning)  # the narrow-band advisory
    if not os.path.exists(CORPUS):
        sys.exit(f"missing {CORPUS} — run tools/gen_scale_corpus.py first")
    spark = get_spark("measure-simhash-hot", shuffle_partitions=32)
    out: dict[str, dict] = {}

    out["mini_5k"] = mini_rung(spark)
    release_scoped()
    spark.catalog.clearCache()
    print("mini 5k:", out["mini_5k"])

    for label, bits, limits in (
        ("wide", 48, (50_000, 500_000)),
        ("narrow", 32, (50_000, 500_000)),
    ):
        for limit in limits:
            key = f"{label}_{limit // 1000}k"
            s = bucket_stats(spark, limit, bits)
            release_scoped()
            spark.catalog.clearCache()
            # end-to-end wall for every wide rung; narrow only at 50k (the
            # 500k narrow histogram already proves the saturation point)
            if label == "wide" or limit == 50_000:
                s.update(guarded_run(spark, limit, bits))
                release_scoped()
                spark.catalog.clearCache()
            out[key] = s
            print(f"{key}: {s}")

    with open(f"{SCALE_DIR}/simhash_hot_stats.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", f"{SCALE_DIR}/simhash_hot_stats.json")
    spark.stop()


if __name__ == "__main__":
    main()
