#!/usr/bin/env python
"""Extend the CC-rounds trend one more ~decade (VERDICT r11 #5): mutual-kNN's
connected-component pass measured 2 rounds at sf1 (2k vectors), 7 of <=19 at
the 200k rung — the open question is whether the round count FLATTENS
(clique-ish mutual-kNN graphs, diameter ~constant) or keeps climbing
(diameter growth: the multiplier that would surface at 100x scale). This
runs the same default-argument call (auto -> IVF branch) on the 1M-vector
corpus (gen_scale_corpus.py::gen_embeddings_1m — same clustered geometry,
10,000 centers x 100 members) and records wall + measured rounds + the
O(log n) budget connected_components asserts against.

Writes /tmp/migdar_scale/cc_trend_stats.json for tools/gen_scaling.py.

Usage: python tools/measure_cc_trend.py   (run alone; ~5-15 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/migdar_scale")
CORPUS = f"{SCALE_DIR}/embeddings_1m.parquet"


def main() -> None:
    from migdar_data_pipelines_spark.llm.similarity import mutual_knn_clusters
    from migdar_data_pipelines_spark.operators import metrics
    from migdar_data_pipelines_spark.operators.caching import release_scoped
    from migdar_data_pipelines_spark.session import get_spark

    if not os.path.exists(CORPUS):
        sys.exit(f"missing {CORPUS} — run tools/gen_scale_corpus.py first")
    spark = get_spark("measure-cc-trend", shuffle_partitions=32)
    e = spark.read.parquet(CORPUS).select("vec_id", "embedding")
    n = e.count()

    # steady-state: first run absorbs scan/codegen; the second is recorded
    out: dict[str, dict] = {}
    wall = None
    for i in range(2):
        metrics.LAST.pop("cc_rounds", None)
        t0 = time.time()
        n_rows = mutual_knn_clusters(e, "vec_id", "embedding", k=3).count()
        wall = time.time() - t0
        release_scoped()
        spark.catalog.clearCache()
        print(f"run {i}: {wall:.1f}s, rows={n_rows}, "
              f"rounds={metrics.LAST.get('cc_rounds')}")
    out["1m"] = {
        "rows": int(n),
        "wall_s": round(wall, 2),
        "cc_rounds": metrics.LAST.get("cc_rounds"),
        "cc_rounds_budget": metrics.LAST.get("cc_rounds_budget"),
    }
    with open(f"{SCALE_DIR}/cc_trend_stats.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", f"{SCALE_DIR}/cc_trend_stats.json", out)
    spark.stop()


if __name__ == "__main__":
    main()
