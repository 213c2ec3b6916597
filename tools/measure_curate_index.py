#!/usr/bin/env python
"""Measure streaming-curation per-MICRO-BATCH cost as the standing index
grows 10x/100x (VERDICT r13 #4: streaming_curate_documents was the #1
engine cost at sf1 with no decade rung for its defining dimension — the
index a batch probes).

Corpus (numpy, seed 17, self-contained like measure_copurchase.py): docs of
60 tokens drawn from a 50k-word vocabulary. Index ladder: 10k / 100k / 1M
docs. The probed BATCH is FIXED at 2,000 docs per rung: 10% exact copies of
index docs, 10% near copies (2 of 60 tokens replaced — shingle Jaccard
~0.81, just above the 0.8 threshold), 80% fresh text.

Per rung, three measurements (production params: 32 hashes / 16 bands /
bucket ceiling at the MAX_LSH_BUCKET_SIZE default):

  build_wall_s    — one-time index-state build (index_probe_frames + the
                    three parquet writes): paid ONCE per increment, grows
                    linearly with the increment (not per batch);
  prepared_wall_s — the per-micro-batch verdict against the PERSISTED
                    probe state (curate_batch_verdict(index_state=...)):
                    the cost every future batch pays, which must stay
                    ~flat as the index decades;
  raw_wall_s      — the same verdict handed the RAW index text
                    (pre-round-14 shape): re-shingles + re-minhashes the
                    whole corpus per batch — the O(index) trend the
                    persisted state removes.

Writes /tmp/migdar_scale/curate_index_stats.json for tools/gen_scaling.py.

Usage: python tools/measure_curate_index.py   (run alone; ~8-12 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/migdar_scale")
WORK = f"{SCALE_DIR}/curate_index"
RUNGS = {"10k": 10_000, "100k": 100_000, "1M": 1_000_000}
BATCH_ROWS = 2_000
DOC_WORDS = 60
VOCAB = 50_000


def gen_corpus() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(17)
    n = max(RUNGS.values())
    toks = rng.integers(0, VOCAB, size=(n, DOC_WORDS), dtype=np.int64)
    texts = [" ".join(f"w{t}" for t in row) for row in toks]
    pq.write_table(
        pa.table({"id": pa.array(range(n), pa.int64()), "text": pa.array(texts)}),
        f"{WORK}/docs.parquet",
        row_group_size=100_000,
    )
    # fixed probe batch built against the SMALLEST rung's prefix so every
    # rung contains the referenced docs: ids offset far above any index id
    n_dup = BATCH_ROWS // 10
    rows_id, rows_tx = [], []
    for i in range(n_dup):  # exact copies
        rows_id.append(10_000_000 + i)
        rows_tx.append(texts[i])
    for i in range(n_dup):  # near copies: replace 2 interior tokens — each
        # kills 3 of the 58 3-gram shingles, so Jaccard = 52/64 ~ 0.81,
        # just above the 0.8 verification threshold
        w = texts[n_dup + i].split()
        for j, pos in enumerate((20, 40)):
            w[pos] = f"n{i}_{j}"
        rows_id.append(10_100_000 + i)
        rows_tx.append(" ".join(w))
    fresh = rng.integers(0, VOCAB, size=(BATCH_ROWS - 2 * n_dup, DOC_WORDS))
    for i, row in enumerate(fresh):  # fresh docs: disjoint token space
        rows_id.append(10_200_000 + i)
        rows_tx.append(" ".join(f"f{t}" for t in row))
    pq.write_table(
        pa.table({"id": pa.array(rows_id, pa.int64()), "text": pa.array(rows_tx)}),
        f"{WORK}/batch.parquet",
    )
    print(f"corpus: {n:,} index docs + {BATCH_ROWS:,}-doc probe batch")


def main() -> None:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import (
        MAX_LSH_BUCKET_SIZE,
        index_probe_frames,
    )
    from migdar_data_pipelines_spark.operators.caching import release_scoped
    from migdar_data_pipelines_spark.session import get_spark
    from migdar_data_pipelines_spark.streaming.curate import curate_batch_verdict

    os.makedirs(WORK, exist_ok=True)
    if not os.path.exists(f"{WORK}/docs.parquet"):
        gen_corpus()
    spark = get_spark("measure-curate-index", shuffle_partitions=32)
    batch = spark.read.parquet(f"{WORK}/batch.parquet")

    out: dict[str, dict] = {}
    for name, limit in RUNGS.items():
        idx = spark.read.parquet(f"{WORK}/docs.parquet").filter(F.col("id") < limit)
        st = f"{WORK}/state_{name}"
        shutil.rmtree(st, ignore_errors=True)
        t0 = time.time()
        idx.write.parquet(f"{st}/docs")
        h, b = index_probe_frames(idx, "text", "id")
        h.write.parquet(f"{st}/hashes")
        b.write.parquet(f"{st}/bands")
        release_scoped()
        build_wall = round(time.time() - t0, 2)

        def prepared_run() -> tuple[float, int, int]:
            state = (
                spark.read.parquet(f"{st}/hashes"),
                spark.read.parquet(f"{st}/bands"),
                spark.read.parquet(f"{st}/docs"),
            )
            t = time.time()
            v = curate_batch_verdict(
                batch, None,
                max_bucket_size=MAX_LSH_BUCKET_SIZE, index_state=state,
            )
            r = v.agg(
                F.sum(F.col("dup_exact").cast("long")).alias("e"),
                F.sum(F.col("near_dup").cast("long")).alias("n"),
            ).collect()[0]
            w = time.time() - t
            release_scoped()
            return w, int(r["e"]), int(r["n"])

        def raw_run() -> float:
            t = time.time()
            v = curate_batch_verdict(batch, idx, max_bucket_size=MAX_LSH_BUCKET_SIZE)
            v.agg(F.sum(F.col("dup_exact").cast("long"))).collect()
            w = time.time() - t
            release_scoped()
            return w

        prepared_run()  # warm scan/codegen; report the steady-state run
        p_wall, n_exact, n_near = prepared_run()
        raw_run()
        r_wall = raw_run()
        out[name] = {
            "index_rows": limit,
            "batch_rows": BATCH_ROWS,
            "build_wall_s": build_wall,
            "prepared_wall_s": round(p_wall, 2),
            "raw_wall_s": round(r_wall, 2),
            "flagged_exact": n_exact,
            "flagged_near": n_near,
        }
        print(name, json.dumps(out[name]))
    with open(f"{SCALE_DIR}/curate_index_stats.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {SCALE_DIR}/curate_index_stats.json")


if __name__ == "__main__":
    main()
