"""bench.py driver contract: the LAST stdout line must be one parseable JSON
object with the keys the round driver records (round 3 shipped a line that
outgrew the driver's tail capture — BENCH_r03.json recorded parsed:null)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_stdout_is_one_compact_json_line(tmp_path):
    # the sidecar goes to tmp_path so this test never overwrites the round's
    # full-registry bench_full.json artifact (VERDICT r5 finding #1)
    out = tmp_path / "bench_full.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_ONLY="q1_pricing_summary,decimal_pricing_summary",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_ORACLE="0",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_OUT=str(out),
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"] == "suite_total_sec"
    assert d["unit"] == "sec"
    assert set(d["queries"]) == {"q1_pricing_summary", "decimal_pricing_summary"}
    assert d["sf"] == 0.001
    # compactness: separators carry no spaces (the full-registry line must
    # stay inside the driver's tail capture)
    assert '", "' not in line and '": ' not in line
    # the full-detail sidecar exists and is a superset of the stdout line
    full = json.load(open(out))
    assert set(d["queries"]) == set(full["queries"])
    assert "slowest" in full
    # median-of-N regression detection (VERDICT r8 #2): both queries fall in
    # the slowest-30 window, so each carries repeat_n samples, a median
    # per-query number, and a relative spread
    assert d["repeated"] == 2 and d["repeat_n"] == 3
    for name in d["queries"]:
        assert len(full["repeat_samples"][name]) == 3
        ss = sorted(full["repeat_samples"][name])
        assert full["queries"][name] == round(ss[1], 4)
        assert full["repeat_spread"][name] >= 0


def test_full_registry_stdout_line_fits_driver_tail_capture():
    """The driver tail-captures ~2000 chars; with the real registry's names
    and worst-case timing widths the final line must stay under that."""
    sys.path.insert(0, REPO)
    import bench
    from migdar_data_pipelines_spark.plans import query_fns

    names = list(query_fns())
    assert len(names) >= 70  # the full registry, not a filtered run
    result = {
        "metric": "suite_total_sec",
        "value": 12345.67,
        "unit": "sec",
        "queries": {n: 123.45 for n in names},
        "sf": 0.1,
        "vs_oracle_ratio": 0.1234,
    }
    line = bench.compact_stdout_line(result)
    assert len(line) <= 1800
    d = json.loads(line)
    assert d["value"] == 12345.67 and d["sf"] == 0.1
    assert d["n_queries"] == len(names)
    assert d["queries_truncated_to_slowest"] is True
    assert 0 < len(d["queries"]) < len(names)

    # small maps pass through untouched
    small = dict(result, queries={"a": 1.0})
    assert json.loads(bench.compact_stdout_line(small))["queries"] == {"a": 1.0}
