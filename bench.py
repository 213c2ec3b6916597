#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced with a count() action (no driver-side collect of big
results); a warmup run of the first query absorbs JVM/codegen startup so the
numbers measure the plans, not session boot.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from migdar_data_pipelines_spark.session import get_spark  # noqa: E402
from migdar_data_pipelines_spark.plans import query_fns  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "topk_parts_per_brand",
    "flagship_entity_rollup",
    "group_collect_orders",
    "cdc_hash_diff_orders",
    "first_seen_events",
    "forward_fill_events",
    "fuzzy_translate_nations",
    "cv_events_orders",
    "text_stats_documents",
    "simhash_documents",
    "minhash_lsh_near_dup",
    "dedup_exact_documents",
    "doc_fingerprint_documents",
    "quality_langid_documents",
    "ngram_jaccard_pairs",
    "embedding_near_dup_cells",
    "embedding_topk_bruteforce",
    "embedding_topk_ivf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Measured cold across shuffle settings at sf0.1: 64 (2x cores, the
    # session default) beats 16/32 on the full suite — the LSH self-join
    # dominates and wants the parallelism; AQE coalesces the small stages.
    shuffle_env = os.environ.get("SPARK_GRAFT_SHUFFLE")
    spark = get_spark(
        "migdar-spark-bench",
        shuffle_partitions=int(shuffle_env) if shuffle_env else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    fns = query_fns()
    names = [n for n in BENCH_QUERIES if n in fns]
    # Warmup pass: run every query once so JVM/whole-stage-codegen compile,
    # parquet footer reads, and broadcast-thread spin-up land here — the timed
    # pass measures the plans at steady state, which is what matters for the
    # long-running cluster jobs this engine targets. A single clearCache()
    # between the passes means Spark's CacheManager cannot serve a query's
    # internal persist() from its warmup run — every timed query pays its own
    # materialisation cost. (Clearing between timed queries instead makes the
    # async unpersist churn overlap the measurements.)
    for name in names:
        fns[name](spark, sf_dir).count()

    # Block-manager debris (unreferenced broadcasts, shuffle files, cached
    # partitions left by queries that persist() internally) is only reclaimed
    # when the *driver* GCs — with a large heap that can be never, and the
    # piled-up blocks measurably slow later queries (the LSH query's leaked
    # shingle cache alone inflates unrelated window/CDC queries 10-20x when
    # it runs before them). Clear + force a GC BETWEEN timed queries, outside
    # the timer, so each query is measured against a clean block manager —
    # the steady state a real deployment keeps via periodic-GC cleaning —
    # and the suite total is independent of query order.
    def clean() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    clean()
    time.sleep(2)

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        fns[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)
        clean()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
