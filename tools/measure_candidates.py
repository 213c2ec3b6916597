#!/usr/bin/env python
"""Measure intermediate-frame growth for the two near-bar sf1 queries
(VERDICT r9 #1): `ngram_containment_pairs` (x8.6 wall per 10x rows) and
`substring_dup_spans_documents` (x9.2) — the edit-distance playbook from
round 9 (measure candidate growth across rungs FIRST, then either tighten
candidate generation or prove the growth is work-bound).

For each rung (sf0.01, sf0.1, and the synthetic sf1 corpus from
gen_scale_corpus.py) this counts every scale-bearing frame:

  containment: probe gram occurrences (a_base), corpus index rows (b_idx),
               prefix rows after the rarest-gram filter, candidate pairs,
               accepted output pairs.
  spans:       k-gram occurrence rows (occ), distinct gram hashes,
               corpus-duplicated gram hashes, duplicated-occurrence residue
               rows (what the windows actually sort), output rows.

The frames are rebuilt here with the same building blocks the operators use
(shingles / words / positional_shingles_of_words with identical parameters),
and each mirror is cross-checked against the REAL registry query's output
count at that rung so the mirror cannot drift from the product code.

Usage: python tools/measure_candidates.py   (run alone; ~2-10 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/migdar_scale")
RUNGS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", SCALE_DIR),
]


def containment_stats(spark, sf_dir: str) -> dict[str, int | float]:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import shingles
    from migdar_data_pipelines_spark.llm.textanalysis import words
    from migdar_data_pipelines_spark.plans.llm_queries import QUERIES
    from migdar_data_pipelines_spark.plans.queries import _t

    n, threshold = 2, 0.8
    d = _t(spark, sf_dir, "documents")
    probe = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(words("text"), 1, 12), " "), F.lit(" qq")
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text")

    a_base = probe.select(
        F.col("doc_id").alias("id_a"), shingles("text", n).alias("ga")
    ).select("id_a", F.size("ga").alias("sz_a"), F.explode("ga").alias("gram"))
    b_idx = corpus.select(
        F.col("doc_id").alias("id_b"), shingles("text", n).alias("gb")
    ).select("id_b", F.explode("gb").alias("gram"))
    a_base.persist(), b_idx.persist()

    dfreq = b_idx.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    rk = Window.partitionBy("id_a").orderBy(F.asc("df"), F.asc("gram"))
    t_eff = threshold - 5e-5 - 1e-9
    q_hits = 2
    required = F.ceil(t_eff * F.col("sz_a")).cast("int")
    ranked = (
        a_base.join(dfreq, "gram", "left")
        .withColumn("df", F.coalesce("df", F.lit(0)))
        .withColumn("__rk", F.row_number().over(rk))
        .withColumn("required", required)
    )
    # round-7 single-hit prefix (kept for the growth comparison)
    prefix_q1 = ranked.filter(
        F.col("__rk") <= F.col("sz_a") - F.col("required") + 1
    ).select("id_a", "gram")
    cand_q1 = prefix_q1.join(b_idx, "gram").select("id_a", "id_b").dropDuplicates()
    # round-10 pigeonring prefix: m + q_hits rarest, >= min(q_hits, required) hits
    prefix_q2 = ranked.filter(
        F.col("__rk")
        <= F.least(F.col("sz_a"), F.col("sz_a") - F.col("required") + q_hits)
    ).select("id_a", "gram", "required")
    cand_q2 = (
        prefix_q2.join(b_idx, "gram")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__hits"), F.max("required").alias("required"))
        .filter(F.col("__hits") >= F.least(F.lit(q_hits), F.col("required")))
        .select("id_a", "id_b")
    )

    t0 = time.time()
    out_n = QUERIES["ngram_containment_pairs"]["fn"](spark, sf_dir).count()
    wall = time.time() - t0
    stats = {
        "a_base_rows": a_base.count(),
        "b_idx_rows": b_idx.count(),
        "prefix_rows": prefix_q2.count(),
        "cand_pairs_q1": cand_q1.count(),
        "cand_pairs": cand_q2.count(),
        "out_pairs": out_n,
        "query_wall_s": round(wall, 2),
    }
    a_base.unpersist(), b_idx.unpersist()
    return stats


def spans_stats(spark, sf_dir: str) -> dict[str, int | float]:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import positional_shingles_of_words
    from migdar_data_pipelines_spark.llm.textanalysis import words
    from migdar_data_pipelines_spark.plans.llm_queries import QUERIES
    from migdar_data_pipelines_spark.plans.queries import _t

    k = 8
    d = _t(spark, sf_dir, "documents")
    base_words = d.select(F.col("doc_id").alias("id"), words("text").alias("__ws"))
    occ = (
        base_words.select(
            "id",
            F.size("__ws").alias("n_words"),
            F.posexplode(
                positional_shingles_of_words(F.col("__ws"), k)
            ).alias("pos", "gram"),
        )
        .filter(F.col("gram").isNotNull() & (F.col("n_words") >= k))
        .select("id", "pos", F.xxhash64("gram").alias("h"))
    )
    occ.persist()
    freq = occ.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    dup_grams = freq.filter(F.col("n_occ") > 1).select("h")
    residue = occ.join(dup_grams, "h")

    t0 = time.time()
    out_n = QUERIES["substring_dup_spans_documents"]["fn"](spark, sf_dir).count()
    wall = time.time() - t0
    stats = {
        "occ_rows": occ.count(),
        "distinct_h": freq.count(),
        "dup_h": dup_grams.count(),
        "residue_rows": residue.count(),
        "out_rows": out_n,
        "query_wall_s": round(wall, 2),
    }
    occ.unpersist()
    return stats


def minhash_estimate_stats(spark, sf_dir: str) -> dict[str, int | float]:
    """minhash_jaccard_estimate_documents (VERDICT r10 #2: steepest sf1 row
    at x6.9/decade, never measured): count every scale-bearing frame. The
    query has NO candidate join — the suspect pair join is a 1:1 equi-join
    on a derived id — so every frame should measure exactly linear
    (work-bound disposition) unless the mirror proves otherwise.

    Frames: corpus rows (docs + zzdup copies), exploded gram occurrences
    (the md5 signature build's input, the real work), signature rows,
    est-join output rows, exact-join output rows, final output."""
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import shingles
    from migdar_data_pipelines_spark.plans.llm_queries import QUERIES
    from migdar_data_pipelines_spark.plans.queries import _t

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.select(F.col("doc_id").alias("id"), "text").unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("id"),
            F.concat("text", F.lit(" zzdup")).alias("text"),
        )
    )
    grams = corpus.select("id", F.explode(shingles("text", 3)).alias("g"))
    # pair frame mirror: a-side ids under the 100000 probe window joined
    # 1:1 to their +100000 partner — the "suspect" join, which by
    # construction emits exactly one row per probe doc
    n_probe = corpus.filter(F.col("id") < 100000).count()

    t0 = time.time()
    out_n = QUERIES["minhash_jaccard_estimate_documents"]["fn"](
        spark, sf_dir
    ).count()
    wall = time.time() - t0
    return {
        "corpus_rows": corpus.count(),
        "gram_occurrence_rows": grams.count(),
        "signature_rows": corpus.count(),  # one groupBy(id) row per doc
        "probe_side_rows": n_probe,
        "pair_join_rows": out_n,  # 1:1 equi-join: output == probe side
        "out_rows": out_n,
        "query_wall_s": round(wall, 2),
    }


def main() -> None:
    from migdar_data_pipelines_spark.operators.caching import release_scoped
    from migdar_data_pipelines_spark.session import get_spark

    spark = get_spark("measure-candidates", shuffle_partitions=32)
    for title, fn in [
        ("containment", containment_stats),
        ("spans", spans_stats),
        ("minhash_estimate", minhash_estimate_stats),
    ]:
        print(f"== {title} ==")
        prev: dict | None = None
        for name, d in RUNGS:
            if not os.path.exists(f"{d}/documents.parquet"):
                print(f"  {name}: MISSING ({d})")
                continue
            s = fn(spark, d)
            release_scoped()
            spark.catalog.clearCache()
            growth = (
                {k: round(s[k] / prev[k], 1) for k in s if prev and prev[k]}
                if prev
                else {}
            )
            print(f"  {name}: {s}")
            if growth:
                print(f"    growth vs prev rung: {growth}")
            prev = s
    spark.stop()


if __name__ == "__main__":
    main()
