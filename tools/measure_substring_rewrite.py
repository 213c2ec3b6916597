#!/usr/bin/env python
"""Measure substring-dedup REWRITE cost against its two scaling dimensions
(VERDICT r13 #4: substring_dedup_rewrite_documents landed with no rung):

  1. DUP-RESIDUE FRACTION sweep at fixed corpus (20k docs x 100 words):
     a fraction p of docs carries the SAME 30-word boilerplate block
     spliced at a per-doc offset — the C4/RefinedWeb shape where one hot
     template owns a large share of all duplicated k-grams. p in
     {0, 0.1, 0.5, 1.0}. The hot grams are exactly what the
     min(struct(id,pos)) groupBy (never a rank window) must absorb:
     wall should grow sub-linearly in residue, and output dropped_words
     should track p exactly (every carrier after the first loses the block
     at k-gram resolution).

  2. ROWS decade at fixed p=0.1: 20k -> 200k docs. Linear-ish wall, the
     scan-dominated regime.

Corpus: numpy seed 23, fresh tokens per doc outside the boilerplate so the
only cross-doc dup residue is the planted block (plus rare collisions).

Writes /tmp/migdar_scale/substring_rewrite_stats.json for
tools/gen_scaling.py.

Usage: python tools/measure_substring_rewrite.py   (run alone; ~5-8 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/migdar_scale")
WORK = f"{SCALE_DIR}/substring_rewrite"
DOC_WORDS = 100
BLOCK_WORDS = 30
K = 8
FRACTIONS = (0.0, 0.1, 0.5, 1.0)
ROWS_RUNGS = {"20k": 20_000, "200k": 200_000}


def gen_corpus(n_docs: int, frac: float, path: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(23)
    block = [f"b{j}" for j in range(BLOCK_WORDS)]
    texts = []
    n_carriers = int(n_docs * frac)
    for i in range(n_docs):
        # per-doc-unique tokens: doc i's token space is disjoint from doc
        # j's, so no accidental cross-doc k-grams outside the block
        words = [f"d{i}_{t}" for t in range(DOC_WORDS - BLOCK_WORDS)]
        if i < n_carriers:
            at = int(rng.integers(0, len(words)))
            words = words[:at] + block + words[at:]
        texts.append(" ".join(words))
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                  "text": pa.array(texts)}),
        path,
        row_group_size=50_000,
    )


def run(spark, path: str) -> dict[str, float | int]:
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import drop_duplicated_spans
    from migdar_data_pipelines_spark.operators.caching import release_scoped

    df = spark.read.parquet(path)

    def one() -> tuple[float, int, int]:
        t = time.time()
        out = drop_duplicated_spans(df, "text", "doc_id", k=K)
        r = out.agg(
            F.sum("dropped_words").alias("d"),
            F.sum((F.col("dropped_words") > 0).cast("long")).alias("c"),
        ).collect()[0]
        w = time.time() - t
        release_scoped()
        return w, int(r["d"] or 0), int(r["c"] or 0)

    one()  # warm scan/codegen
    wall, dropped, rewritten = one()
    return {
        "wall_s": round(wall, 2),
        "dropped_words": dropped,
        "docs_rewritten": rewritten,
    }


def main() -> None:
    from migdar_data_pipelines_spark.session import get_spark

    os.makedirs(WORK, exist_ok=True)
    spark = get_spark("measure-substring-rewrite", shuffle_partitions=32)

    out: dict[str, dict] = {"fraction_sweep": {}, "rows_decade": {}}
    for frac in FRACTIONS:
        path = f"{WORK}/docs_f{int(frac * 100)}.parquet"
        if not os.path.exists(path):
            gen_corpus(ROWS_RUNGS["20k"], frac, path)
        s = run(spark, path)
        s["frac"] = frac
        s["docs"] = ROWS_RUNGS["20k"]
        out["fraction_sweep"][f"{int(frac * 100)}%"] = s
        print("frac", frac, json.dumps(s))
    for name, n in ROWS_RUNGS.items():
        path = f"{WORK}/docs_n{name}.parquet"
        if not os.path.exists(path):
            gen_corpus(n, 0.1, path)
        s = run(spark, path)
        s["frac"] = 0.1
        s["docs"] = n
        out["rows_decade"][name] = s
        print("rows", name, json.dumps(s))
    with open(f"{SCALE_DIR}/substring_rewrite_stats.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {SCALE_DIR}/substring_rewrite_stats.json")


if __name__ == "__main__":
    main()
