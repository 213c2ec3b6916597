#!/usr/bin/env python
"""Dump a registry query's physical plan (`.explain("formatted")`) to a file
— the plan-evidence helper for the optimization rounds (guide §1/§7.2).

    python tools/dump_plan.py <query> <out_file>

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Builds the query's
DataFrame (running any eager plan-construction gates it contains) and writes
the formatted physical plan; for queries whose fn materializes the result
driver-side (streaming drains, index-lifecycle composites) the final frame's
plan is a LocalTableScan — noted in the output header.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from migdar_data_pipelines_spark.plans import query_fns  # noqa: E402
from migdar_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    name, out = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    df = query_fns()[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(out, "w") as f:
        f.write(f"== {name} @ {sf_dir} ==\n")
        f.write(plan)
    print(f"wrote {out} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
