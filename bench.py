#!/usr/bin/env python
"""Benchmark harness: runs EVERY registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}; the full detail (oracle timings, capped list,
slowest queries) is written to bench_full.json beside this script.

Each query is forced with a count() action (no driver-side collect of big
results); a warmup pass absorbs JVM/codegen startup so the numbers measure the
plans, not session boot. The oracle pass times the same DuckDB SQL the
correctness gate runs, capped per query (a LSH/ngram oracle is quadratic in
DuckDB and would run for minutes) — capped queries report oracle_sec = cap and
appear in "oracle_capped".

Regression detection (VERDICT r8 #2): single-run timings carry ~±35%
run-to-run noise at this scale (ppjoin measured 4.10/5.55/2.85s across three
rounds with zero code change), which hides real regressions. The slowest
REPEAT_TOP queries from the first timed pass are therefore re-timed to
REPEAT_N samples each; their reported per-query number is the MEDIAN and
bench_full.json records every sample plus the relative spread
((max-min)/median), so a cross-round comparison can tell signal from noise.

Env knobs:
  SPARK_GRAFT_SF_DIR        data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_SHUFFLE       override spark.sql.shuffle.partitions
  SPARK_GRAFT_ORACLE        "0" to skip the DuckDB oracle pass
  SPARK_GRAFT_ORACLE_CAP    per-query oracle cap in seconds (default 60)
  SPARK_GRAFT_BENCH_ONLY    comma-separated query names to restrict the run
  SPARK_GRAFT_REPEAT_TOP    how many slowest queries get repeated (default 30)
  SPARK_GRAFT_REPEAT_N      samples per repeated query, >=1 (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from migdar_data_pipelines_spark.session import TESTDATA_TABLES, get_spark  # noqa: E402
from migdar_data_pipelines_spark.plans import oracle_sqls, query_fns  # noqa: E402

def compact_stdout_line(result: dict, limit: int = 1800) -> str:
    """The driver captures only the LAST ~2000 chars of stdout and json-parses
    the final line (BENCH_r03 recorded parsed:null when the line outgrew that
    window). If the full per-query map would overflow, keep only the slowest
    entries that fit — the complete map is always in bench_full.json, and the
    suite total/sf stay authoritative either way."""
    line = json.dumps(result, separators=(",", ":"))
    if len(line) <= limit:
        return line
    full_map = dict(result["queries"])
    by_cost = sorted(full_map, key=full_map.get, reverse=True)
    result = dict(result)
    result["n_queries"] = len(full_map)
    result["queries_truncated_to_slowest"] = True
    result["full"] = "bench_full.json"
    keep = len(by_cost)
    while keep > 1 and len(line) > limit:
        keep -= 1
        result["queries"] = {n: full_map[n] for n in by_cost[:keep]}
        line = json.dumps(result, separators=(",", ":"))
    return line


# Headline queries first (stable, comparable across rounds), then every other
# registered query in name order — the full registry is always timed, so a
# perf regression in any query shows up in the next BENCH_r{N}.json.
# Registered-but-not-benched: scale-unsafe reference variants kept in the
# registry purely as semantics references for their scale-safe defaults (the
# correctness gate still runs them at sf0.01). VERDICT r4 #4/#7. Module-level
# so the README-freshness unit test can derive the benched-registry count.
BENCH_EXCLUDE = {"profile_orders_exact", "ngram_jaccard_pairs_invidx"}

HEADLINE = [
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


def time_oracles(names, sqls, sf_dir: str, cap_s: float):
    """Time each oracle SQL in DuckDB with a per-query interrupt cap.

    Returns (timings: name -> sec | None, capped: [names]). None means the
    query has no oracle SQL; a capped query records the cap itself (a lower
    bound, same convention as the judge's ">60s (capped)").
    """
    import duckdb

    timings: dict[str, float | None] = {}
    capped: list[str] = []
    for name in names:
        sql = sqls.get(name)
        if not sql:
            timings[name] = None
            continue
        # Fresh connection per query: DuckDB caches nothing across queries
        # and an interrupted connection can be left in a poisoned state.
        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        timer = threading.Timer(cap_s, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            con.sql(sql).fetchall()
            timings[name] = round(time.perf_counter() - t0, 4)
        except duckdb.Error:
            timings[name] = round(cap_s, 4)
            capped.append(name)
        finally:
            timer.cancel()
            con.close()
    return timings, capped


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
    names = [n for n in HEADLINE if n in fns]
    names += sorted(n for n in fns if n not in HEADLINE)
    names = [n for n in names if n not in BENCH_EXCLUDE]
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",")}
        names = [n for n in names if n in keep]
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

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        fns[name](spark, sf_dir).count()
        sec = round(time.perf_counter() - t0, 4)
        clean()
        return sec

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        sec = timed(name)
        timings[name] = sec
        samples[name] = [sec]

    # Median-of-N on the slowest queries: the heavy tail is where a real
    # regression would live AND where single-run noise is largest in absolute
    # terms, so only it earns the extra samples (repeating the ~100 sub-second
    # queries would double the wall time to stabilise numbers already near the
    # job-launch floor).
    repeat_top = int(os.environ.get("SPARK_GRAFT_REPEAT_TOP", "30"))
    repeat_n = max(1, int(os.environ.get("SPARK_GRAFT_REPEAT_N", "3")))
    spread: dict[str, float] = {}
    if repeat_top > 0 and repeat_n > 1:
        slowest = sorted(timings, key=timings.get, reverse=True)[:repeat_top]
        for name in slowest:
            for _ in range(repeat_n - 1):
                samples[name].append(timed(name))
            ss = sorted(samples[name])
            mid = len(ss) // 2
            med = ss[mid] if len(ss) % 2 else (ss[mid - 1] + ss[mid]) / 2
            timings[name] = round(med, 4)
            spread[name] = round((ss[-1] - ss[0]) / med, 4) if med else 0.0

    # The stdout contract is ONE compact JSON line the driver tail-captures.
    # r3's line (53 queries + the full oracle map) outgrew that capture and
    # recorded parsed:null — so the line now carries only the driver-contract
    # keys (metric/value/unit/queries/sf) plus small summary fields, rounded
    # and with compact separators, and EVERYTHING (oracle timings, caps,
    # slowest list) goes to bench_full.json next to this script.
    result = {
        "metric": "suite_total_sec",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": {n: round(t, 2) for n, t in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if spread:
        result["repeated"] = len(spread)
        result["repeat_n"] = repeat_n
    full = {
        "metric": "suite_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": result["sf"],
        "slowest": sorted(timings, key=timings.get, reverse=True)[:5],
        # every sample for the repeated queries (first-pass value included),
        # plus relative spread (max-min)/median — the noise band a cross-round
        # comparison must exceed before calling a move a regression
        "repeat_samples": {n: samples[n] for n in spread},
        "repeat_spread": spread,
    }

    if os.environ.get("SPARK_GRAFT_ORACLE", "1") != "0":
        cap_s = float(os.environ.get("SPARK_GRAFT_ORACLE_CAP", "60"))
        oracle_sec, oracle_capped = time_oracles(names, oracle_sqls(), sf_dir, cap_s)
        full["oracle_sec"] = oracle_sec
        full["oracle_capped"] = oracle_capped
        known = [
            (timings[n], oracle_sec[n]) for n in names if oracle_sec.get(n)
        ]
        if known:
            # Suite-level engine/oracle ratio over the oracle-comparable set
            # (capped oracles enter at the cap — a conservative lower bound).
            ratio = round(sum(e for e, _ in known) / sum(o for _, o in known), 4)
            result["vs_oracle_ratio"] = ratio
            full["vs_oracle_ratio"] = ratio

    # Setup-vs-compute split for the streaming drains (VERDICT r3 ask #8):
    # an AvailableNow drain pays query start/checkpoint/state-store lifecycle
    # once per JOB — on a cluster the stream starts once — so the split shows
    # the steady-state operator cost inside the recorded wall time. Keyed by
    # drain prefix; the timed pass ran last, so newest entry per prefix wins.
    from migdar_data_pipelines_spark.streaming.windows import STREAM_RUN_STATS

    if STREAM_RUN_STATS:
        split: dict[str, dict] = {}
        for qname, stats in STREAM_RUN_STATS.items():
            split[qname.rsplit("_", 1)[0]] = stats
        full["streaming_split"] = split

    # Sidecar destination is overridable so harness runs (the pytest bench
    # contract test, ad-hoc filtered runs) never clobber the round's full
    # 130+-query artifact in the repo root (VERDICT r5 finding #1). A
    # BENCH_ONLY-restricted run self-routes to a scratch sidecar for the
    # same reason — only an unrestricted run may replace the full artifact.
    default_out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "bench_full_partial.json" if only else "bench_full.json",
    )
    full_path = os.environ.get("SPARK_GRAFT_BENCH_OUT") or default_out
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
    print(compact_stdout_line(result))


if __name__ == "__main__":
    main()
