#!/usr/bin/env python
"""Measure the SRP/cosine LSH hot-bucket shape (VERDICT r11 #2): the
per-bucket ceiling was extended to ``srp_lsh_near_dup`` in r11 with a unit
test, but the measured hot-cluster rung covered minhash only. Corpus:
embeddings_hotcluster.parquet (gen_scale_corpus.py) — 20% of vectors are
near-identical copies of ONE template direction (sigma=0.005, member-member
cosine ~0.9999 >= the 0.99 threshold; no two byte-identical), so every
member signs the same side of all 128 hyperplanes with overwhelming
probability and the whole cluster funnels into the same (band, key) bucket
in every band. The 80% background follows the standard clustered geometry
(cosine ~0.86 — below threshold: bucket load, no true pairs).

Per rung, from the band-bucket size histogram (computed, never
materialized — same accounting as the minhash/simhash rungs):

  implied_unguarded_pairs = sum n*(n-1)/2,
  guarded_candidates      = sum_small n*(n-1)/2 + sum_big (n-1),

then the REAL guarded operator end-to-end (default 128-bit/8-band params,
threshold 0.99) for wall + verified pairs + rep-connected cluster group.
Unlike simhash, the star form costs NO recall here: exact-cosine
verification vs the representative passes for every member of a genuinely
near-identical cluster (cosine ~0.9999), so the 2k mini-rung asserts
guarded == unguarded dedup GROUPS outright — the minhash treatment.

The histogram mirrors the operator's own banding (srp_planes matmul ->
band-key pack -> xxhash64(band, key) fold; llm/dedup.py::srp_lsh_near_dup)
so the counted buckets are the buckets the join would see.

Writes /tmp/migdar_scale/srp_hot_stats.json for tools/gen_scaling.py.

Usage: python tools/measure_srp_hot.py   (run alone; ~3-5 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

# module-level on purpose: pandas_udf resolves 'pd.Series' type hints
# against module globals under `from __future__ import annotations`
import pandas as pd  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/migdar_scale")
CORPUS = f"{SCALE_DIR}/embeddings_hotcluster.parquet"
NBITS, BANDS, THRESHOLD = 128, 8, 0.99  # srp_lsh_near_dup defaults


def _band_rows(spark, limit: int):
    """(id, bucket) rows exactly as srp_lsh_near_dup builds them."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from migdar_data_pipelines_spark.llm.dedup import srp_planes

    dim = 64
    rows_per_band = NBITS // BANDS
    planes_np = np.array(srp_planes(dim, NBITS), dtype=np.float64)
    pack = np.zeros((NBITS, BANDS))
    for b in range(BANDS):
        for r in range(rows_per_band):
            pack[b * rows_per_band + r, b] = 1 << (rows_per_band - 1 - r)

    @pandas_udf("array<long>")
    def _band_keys(vs: pd.Series) -> pd.Series:
        X = np.stack(vs.to_numpy())
        bits = (X @ planes_np.T) >= 0
        keys = bits.astype(np.int64) @ pack.astype(np.int64)
        return pd.Series(list(keys))

    corpus = spark.read.parquet(CORPUS).filter(F.col("vec_id") < limit)
    return corpus.select(
        F.col("vec_id").alias("id"),
        F.posexplode(_band_keys(F.col("embedding"))).alias("band", "key"),
    ).select("id", F.xxhash64("band", "key").alias("bucket"))


def bucket_stats(spark, limit: int) -> dict[str, int]:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import MAX_LSH_BUCKET_SIZE

    sizes = _band_rows(spark, limit).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
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


def guarded_run(spark, limit: int) -> dict[str, int | float]:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import (
        canonical_groups,
        srp_lsh_near_dup,
    )
    from migdar_data_pipelines_spark.operators import metrics

    corpus = spark.read.parquet(CORPUS).filter(F.col("vec_id") < limit)
    metrics.LAST.pop("srp_lsh_hot_buckets", None)
    t0 = time.time()
    pairs = srp_lsh_near_dup(
        corpus, "embedding", "vec_id", threshold=THRESHOLD,
        nbits=NBITS, bands=BANDS, dim=64,
    )
    n_pairs = pairs.count()
    wall = time.time() - t0
    cluster = (
        canonical_groups(
            corpus.select("vec_id"), pairs.select("id_a", "id_b"), "vec_id"
        )
        .filter(F.col("canonical_id") == 0)
        .count()
    )
    expected = limit // 5
    assert cluster >= 0.999 * expected, (
        f"cluster capture {cluster}/{expected} below the 99.9% floor"
    )
    return {
        "verified_pairs": n_pairs,
        "wall_s": round(wall, 2),
        "srp_hot_buckets": metrics.LAST.get("srp_lsh_hot_buckets", 0),
        "srp_hot_bucket_rows": metrics.LAST.get("srp_lsh_hot_bucket_rows", 0),
        "cluster_group_size": cluster,
        "cluster_expected": expected,
    }


def mini_rung(spark) -> dict[str, int]:
    """2k vectors / 400-member cluster: small enough to run UNGUARDED —
    assert the guarded and unguarded paths produce identical dedup groups
    (the star form loses nothing when exact-cosine verification vs the
    representative passes for every cluster member)."""
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import (
        canonical_groups,
        srp_lsh_near_dup,
    )

    corpus = spark.read.parquet(CORPUS).filter(F.col("vec_id") < 2_000)
    ids = corpus.select("vec_id")

    def groups(max_bucket):
        p = srp_lsh_near_dup(
            corpus, "embedding", "vec_id", threshold=THRESHOLD,
            nbits=NBITS, bands=BANDS, dim=64, max_bucket_size=max_bucket,
        )
        return (
            {(r.vec_id, r.canonical_id)
             for r in canonical_groups(ids, p.select("id_a", "id_b"), "vec_id").collect()},
            p.count(),
        )

    g_guard, n_guard = groups(200)  # the 400-member cluster trips 200
    g_plain, n_plain = groups(None)
    assert g_guard == g_plain, "groups diverged between guarded and unguarded"
    return {"guarded_pairs": n_guard, "unguarded_pairs": n_plain}


def main() -> None:
    from migdar_data_pipelines_spark.operators.caching import release_scoped
    from migdar_data_pipelines_spark.session import get_spark

    if not os.path.exists(CORPUS):
        sys.exit(f"missing {CORPUS} — run tools/gen_scale_corpus.py first")
    spark = get_spark("measure-srp-hot", shuffle_partitions=32)
    out: dict[str, dict] = {}

    out["mini_2k_equality"] = mini_rung(spark)
    release_scoped()
    spark.catalog.clearCache()
    print("mini 2k:", out["mini_2k_equality"])

    for name, limit in [("20k", 20_000), ("200k", 200_000)]:
        s = bucket_stats(spark, limit)
        release_scoped()
        spark.catalog.clearCache()
        s.update(guarded_run(spark, limit))
        release_scoped()
        spark.catalog.clearCache()
        out[name] = s
        print(f"{name}: {s}")

    with open(f"{SCALE_DIR}/srp_hot_stats.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", f"{SCALE_DIR}/srp_hot_stats.json")
    spark.stop()


if __name__ == "__main__":
    main()
