#!/usr/bin/env python
"""Per-query diagnostic: split a registry query's wall time into plan-build
(the Python fn call, which includes any eager persist/count gates) vs action
(.count()), and report the Spark jobs it ran (count + per-job wall from the
status tracker). Usage:

    python tools/profile_query.py <query> [<query> ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Runs each query twice (warm the second) and prints both so JVM warmup is
visible. This is a measurement tool (guide §1) — not part of the bench
contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from migdar_data_pipelines_spark.plans import query_fns  # noqa: E402
from migdar_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    fns = query_fns()
    st = spark.sparkContext.statusTracker()

    def run(name: str, tag: str) -> None:
        jobs_before = st.getJobIdsForGroup(None)
        t0 = time.perf_counter()
        df = fns[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        jobs_after = st.getJobIdsForGroup(None)
        new_jobs = sorted(set(jobs_after) - set(jobs_before))
        print(
            f"{name} [{tag}]: build={t1-t0:.2f}s action={t2-t1:.2f}s "
            f"total={t2-t0:.2f}s jobs={len(new_jobs)}"
        )
        spark.catalog.clearCache()

    for name in names:
        if name not in fns:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        run(name, "cold")
        run(name, "warm")


if __name__ == "__main__":
    main()
