#!/usr/bin/env python
"""Phase-split instrumentation for streaming_curate_documents: monkeypatch
the curate module's batch internals with wall-clock timers to attribute the
drain's time to (filter/frame build, emptiness probe, state reads, verdict
plan build incl. gate collects, sink writes) per micro-batch. Measurement
tool only (guide §1)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from migdar_data_pipelines_spark.plans import query_fns  # noqa: E402
from migdar_data_pipelines_spark.session import get_spark  # noqa: E402
from migdar_data_pipelines_spark.streaming import curate as C  # noqa: E402
from migdar_data_pipelines_spark.llm import dedup as D  # noqa: E402

PHASES: list[tuple] = []


def wrap(mod, name, label):
    orig = getattr(mod, name)

    def inner(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        PHASES.append((label, time.perf_counter() - t0))
        return out

    setattr(mod, name, inner)
    return orig


def main() -> None:
    spark = get_spark("curate-phases")
    spark.sparkContext.setLogLevel("ERROR")
    fns = query_fns()
    # warmup
    fns["streaming_curate_documents"](spark, sf_dir()).count()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1)

    wrap(C, "curate_batch_verdict", "verdict_plan_build")
    wrap(D, "_verify_hints", "gate_collect")
    wrap(D, "_shingle_band_frames", "shingle_frames_build")
    wrap(D, "incremental_dedup_prepared", "cross_probe_plan")
    wrap(D, "minhash_lsh_pairs", "lsh_pairs_plan")

    t0 = time.perf_counter()
    fns["streaming_curate_documents"](spark, sf_dir()).count()
    wall = time.perf_counter() - t0
    print(f"wall={wall:.2f}s")
    for label, sec in PHASES:
        print(f"  {label}: {sec*1000:.0f} ms")


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


if __name__ == "__main__":
    main()
