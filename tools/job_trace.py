#!/usr/bin/env python
"""Per-JOB trace for a registry query: run it once warm, then list every
Spark job it launched with wall time and the first line of its call site —
the tool that answers "where do the N jobs of this query come from?"
(guide §1: measure before changing). Measurement-only; not part of bench.

Usage: python tools/job_trace.py <query> [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from migdar_data_pipelines_spark.plans import query_fns  # noqa: E402
from migdar_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job-trace")
    spark.sparkContext.setLogLevel("ERROR")
    fns = query_fns()
    # warmup
    fns[name](spark, sf_dir).count()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1)

    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup(None))
    t0 = time.perf_counter()
    fns[name](spark, sf_dir).count()
    wall = time.perf_counter() - t0
    jsc = spark.sparkContext._jsc.sc().statusTracker()
    new_jobs = sorted(set(st.getJobIdsForGroup(None)) - before)
    total_job = 0.0
    prev_end = None
    for jid in new_jobs:
        info = jsc.getJobInfo(jid)
        if info.isEmpty():
            continue
        ji = info.get()
        sids = list(ji.stageIds())
        names = []
        sub = end = None
        for sid in sids:
            si = jsc.getStageInfo(sid)
            if si.isEmpty():
                continue
            s = si.get()
            names.append(s.name().split("\n")[0][:90])
        # job-level times via the AppStatusStore are not exposed here; use
        # stage submission bounds from the listener bus snapshot
        data = spark.sparkContext._jsc.sc().statusStore().job(jid)
        sub = data.submissionTime().get().getTime() / 1000.0
        end = data.completionTime().get().getTime() / 1000.0
        dur = end - sub
        gap = (sub - prev_end) if prev_end is not None else 0.0
        prev_end = end
        total_job += dur
        print(f"job {jid}: {dur*1000:7.0f} ms  (+gap {gap*1000:6.0f} ms)  "
              f"stages={len(sids)}  {names[-1] if names else '?'}")
    print(f"wall={wall:.2f}s sum_jobs={total_job:.2f}s jobs={len(new_jobs)}")


if __name__ == "__main__":
    main()
