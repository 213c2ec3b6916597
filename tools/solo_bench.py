#!/usr/bin/env python
"""Solo per-query timing with medians: run each named registry query N times
in one fresh session (bench.py methodology: count() action, clearCache +
System.gc between runs, first run discarded as warmup) and print
name/median/samples as JSON lines. The in-session A/B tool for optimization
work (guide §1) on a noisy machine where cross-session absolute numbers are
not comparable — measurement-only, not part of the bench contract.

Usage: python tools/solo_bench.py <query> [<query> ...] [--n 5]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from migdar_data_pipelines_spark.plans import query_fns  # noqa: E402
from migdar_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    n = 5
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--n"):
            if "=" in a:
                n = int(a.split("=", 1)[1])
            else:
                n = int(argv[i + 1])
                i += 1
        else:
            args.append(a)
        i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("solo-bench")
    spark.sparkContext.setLogLevel("ERROR")
    fns = query_fns()

    def clean() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    for name in args:
        if name not in fns:
            print(json.dumps({"query": name, "error": "not registered"}))
            continue
        samples = []
        for i in range(n + 1):
            t0 = time.perf_counter()
            fns[name](spark, sf_dir).count()
            sec = time.perf_counter() - t0
            clean()
            if i > 0:  # discard warmup
                samples.append(round(sec, 3))
        ss = sorted(samples)
        mid = len(ss) // 2
        med = ss[mid] if len(ss) % 2 else (ss[mid - 1] + ss[mid]) / 2
        print(
            json.dumps(
                {"query": name, "median": round(med, 3), "samples": samples}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
