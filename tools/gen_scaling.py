#!/usr/bin/env python
"""Regenerate SCALING.md: steady-state wall time for scale-critical queries
across the three testdata scale factors (10x data per step), with the
time-growth factor per step. A scale-safe plan grows at most linearly with
the data (factor <= ~10 per step, usually far less while fixed costs
dominate); super-linear growth flags a plan that would not survive 100x.
Run from the repo root with nothing else on the machine."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.001", "0.01", "0.1"]
PICK = [
    # (query, what scales, dominant cost)
    ("q1_pricing_summary", "lineitem rows", "scan + map-side-combined groupBy"),
    ("global_ordinal_lineitem", "lineitem rows", "range exchange + per-partition index"),
    ("asof_join_events_purchase", "events rows", "one key shuffle + per-key sort"),
    ("range_join_events_windows", "events rows", "bucket equi-join"),
    ("minhash_lsh_near_dup", "documents + dup corpus", "shingle explode + band join"),
    ("ngram_jaccard_pairs", "documents + dup corpus", "per-block segment kernel"),
    ("embedding_near_dup_cells", "embedding corpus", "cell-blocked matmul + rescore"),
    ("incremental_dedup_documents", "batch x index", "hash probe + band probe"),
    ("dedup_exact_documents", "documents", "one hash groupBy"),
    ("classifier_score_documents", "documents", "scan-local expressions"),
    ("substring_dup_spans_documents", "documents", "gram-count agg + dup-residue join"),
    ("srp_lsh_near_dup_embeddings", "embedding corpus", "matmul signatures + band join"),
    ("record_linkage_parts", "parts x corrupted copy", "distinct-name block join"),
    ("unigram_lm_nll_documents", "documents", "token agg + broadcast LM join"),
    ("dedup_lines_documents", "documents", "line-hash agg + rebuild"),
    ("ngram_containment_pairs", "probe x corpus", "prefix-filtered index join"),
    ("margin_mining_embeddings", "embedding halves", "persisted top-k pass + margin join"),
    ("mutual_knn_clusters_embeddings", "embedding corpus", "persisted blocked kNN + CC rounds"),
    ("ngram_jaccard_pairs_ppjoin", "documents + dup corpus", "prefix self-join + exact verify"),
    ("ngram_jaccard_pairs_invidx_prefix", "documents + dup corpus", "block+prefix index join"),
    ("exact_percentiles_lineitem", "lineitem rows", "value histogram + auto-routed cumsum"),
    ("pareto_revenue_customers", "customer aggregate", "auto-routed running totals"),
    ("profile_orders", "orders rows", "one-pass stats + portable HLL registers"),
    ("equi_depth_buckets_lineitem", "lineitem rows", "value histogram + auto-routed cumsum"),
    ("dedup_groups_lsh", "documents + dup corpus", "LSH pairs + CC rounds"),
    ("pagerank_documents", "doc link graph", "per-round edge join + map-side agg"),
    ("minhash_jaccard_estimate_documents", "documents + dup corpus", "portable signature agg + pair join"),
    ("winnow_fingerprints_documents", "documents", "scan-local Arrow window minima"),
    ("winnow_shared_pairs_documents", "doc + variant corpus", "culled fingerprint index self-join"),
    ("curate_corpus_stats", "documents", "filter + exact dedup + LSH/CC + split chain"),
    ("kmeans_clusters_embeddings", "embedding corpus", "per-round scan-local assign + (cluster, dim) agg"),
    ("kmv_setops_users_events", "events rows", "scan-local k-min partials + sketch-sized merge"),
    ("sampled_quantiles_lineitem", "lineitem rows", "TakeOrdered k-min sample + sketch-sized rank"),
    ("embedding_covariance", "embedding corpus", "per-batch int64 matmul partials + (i,j) reduce"),
    ("bigram_lm_nll_documents", "documents", "two broadcast count models over the token stream"),
    ("gopher_repetition_documents", "doc + repeat-variant corpus", "segment/gram aggs + per-doc interval union"),
    ("knn_graph_embeddings", "embedding corpus", "block-pair matmul (quadratic gate path)"),
    ("label_propagation_documents", "doc community graph", "per-round O(edges) join + argmax window"),
    ("kmv_day_overlap_events", "events rows", "scan-local grouped k-min + sketch-sized pair algebra"),
    ("sampled_quantiles_by_returnflag", "lineitem rows", "grouped k-min partials + candidate-only rank"),
    ("winsorize_prices_returnflag", "lineitem rows", "quantile pass + broadcast bounds join"),
    ("mutual_information_documents", "documents", "one joint groupBy + broadcast term sum"),
    ("edit_distance_pairs_documents", "documents + 1-del copy", "PASS-JOIN segment join + banded levenshtein"),
    ("source_overlap_matrix", "documents by source", "grouped k-min + all-pairs sketch algebra"),
    ("ks_drift_events", "events rows", "(group, value) agg + distinct-value cumsum window"),
    ("interpolate_events_value", "events rows", "one per-key sort, two shared frames"),
    ("triangle_count_knn_embeddings", "embedding corpus", "exact-kNN gate edges + oriented wedge join"),
    ("oov_rate_documents", "documents token stream", "pair agg + term-keyed join, pre-aggregated hot keys"),
    ("session_paths_events", "events rows", "two per-user window passes + path count + TakeOrdered"),
    ("rfm_segments_orders", "orders rows", "entity rollup + 3 ECDF threshold passes, broadcast back"),
    ("mannwhitney_auc_events", "events rows", "(group, value) agg + distinct-value cumsum window"),
    ("score_lift_documents", "documents", "distinct-score ECDF thresholds + scan-local decile agg"),
]


from common import (  # noqa: E402
    knn_auto_sampled_recall as _knn_auto_recall,
    knn_graph_auto as _knn_graph_auto,
    knn_graph_ivf as _knn_graph_ivf,
    mutual_knn_clusters_auto as _mutual_knn_auto,
    skew_agg_plain as _skew_agg_plain,
    skew_agg_salted as _skew_agg_salted,
    skew_join_sortmerge as _skew_join,
    skew_topk_salted as _skew_topk_salted,
    skew_topk_window as _skew_topk_window,
)

# non-registry measurements: (name, callable, what scales, dominant cost)
EXTRA = [
    (
        "knn_graph_ivf (scale path)",
        _knn_graph_ivf,
        "embedding corpus",
        "sqrt(n) cells, same-cell block pairs only",
    ),
]

# Synthetic rungs beyond the driver testdata (gen_scale_corpus.py writes
# them; VERDICT r8 #3/#4). SCALE_DIR holds a 10x-sf0.1 documents corpus with
# per-shard-disjoint token space (constant dup density — pair count grows
# linearly) and a 200k-row embedding corpus (above the ANN auto gate's 100k
# exact ceiling, so default-argument calls take the IVF branch).
SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/migdar_scale")

# the pair-heavy family: the x2.4-3.6 growers at sf0.1 whose sub-linear
# trend needed one more decade of data to prove (VERDICT r7 #8 / r8 #4)
PAIR_SF1 = [
    "ngram_jaccard_pairs_ppjoin",
    "ngram_jaccard_pairs_invidx_prefix",
    "ngram_containment_pairs",
    "substring_dup_spans_documents",
    "minhash_jaccard_estimate_documents",
    "edit_distance_pairs_documents",
    # the simhash family's sf1 rows (VERDICT r11 #1/#6): the registered
    # 32-bit/8-bit-band form next to the corpus-scale 48-bit/12-bit-band
    # variant — the narrow band keyspace (256 values) fills linearly with
    # the corpus, so its growth factor is expected to run HOTTER than the
    # wide form's at identical output semantics
    "simhash_near_dup_pairs",
    "simhash_near_dup_pairs_wide",
]

# the ANN defaults, measured at BOTH sides of the auto gate: sf0.1 (2k rows
# -> exact branch) and the synthetic 200k rung (-> IVF branch)
ANN_AUTO = [
    ("knn_graph (default args)", _knn_graph_auto),
    ("mutual_knn_clusters (default args)", _mutual_knn_auto),
]

# the iteration-heavy family (VERDICT r9 #3): fixed-point/CC operators whose
# ROUND COUNT can grow with data — the pair-family rung doesn't exercise
# that. rounds_key reads operators.metrics.LAST after the timed run; None
# means the operator runs a FIXED iteration count by construction.
ITER_SF1 = [
    ("dedup_groups_lsh", "cc_rounds"),
    ("curate_corpus_stats", "cc_rounds"),
    ("label_propagation_documents", None),
    ("pagerank_documents", None),
]


def main() -> None:
    # the engine session (24g driver heap, AQE, UTC) — a bare 1g-default
    # builder OOM-spills the 200k-row ANN rung before the kernel even runs
    from migdar_data_pipelines_spark.session import get_spark

    spark = get_spark("gen-scaling", shuffle_partitions=32)
    from migdar_data_pipelines_spark.plans.llm_queries import QUERIES

    runs = [(name, QUERIES[name]["fn"], scales, cost) for name, scales, cost in PICK]
    runs += [(name, fn, scales, cost) for name, fn, scales, cost in EXTRA]

    from migdar_data_pipelines_spark.operators.caching import release_scoped

    def steady(fn, d: str) -> float:
        fn(spark, d).count()  # steady-state: warm run absorbs codegen/scan setup
        release_scoped()
        t0 = time.time()
        fn(spark, d).count()
        sec = time.time() - t0
        release_scoped()
        spark.catalog.clearCache()
        return sec

    def steady_median(fn, d: str, n: int = 3) -> float:
        # the synthetic-rung queries run 10-60s late in a long JVM session,
        # where single runs swing +/-40% (containment measured 24s and 47s in
        # two same-code runs) — median-of-n is the same treatment bench.py
        # gives its slowest queries
        runs = sorted(steady(fn, d) for _ in range(n))
        return runs[n // 2]

    times: dict[str, dict[str, float]] = {}
    for name, fn, _, _ in runs:
        times[name] = {}
        for sf in SFS:
            times[name][sf] = steady(fn, f"/root/testdata/sf{sf}")

    # ---- synthetic rungs (skipped with a note if the corpus isn't generated)
    have_scale = os.path.exists(f"{SCALE_DIR}/documents.parquet")
    pair_sf1: dict[str, float] = {}
    pair_sf01: dict[str, float] = {}  # median sf0.1 base for the x-factor
    ann: dict[str, dict[str, float]] = {}
    n_scale_docs = n_scale_emb = 0
    if have_scale:
        n_scale_docs = spark.read.parquet(f"{SCALE_DIR}/documents.parquet").count()
        n_scale_emb = spark.read.parquet(f"{SCALE_DIR}/embeddings.parquet").count()
        for name in PAIR_SF1:
            pair_sf01[name] = steady_median(QUERIES[name]["fn"], "/root/testdata/sf0.1")
            pair_sf1[name] = steady_median(QUERIES[name]["fn"], SCALE_DIR)
        for name, fn in ANN_AUTO:
            ann[name] = {
                "sf0.1": steady_median(fn, "/root/testdata/sf0.1"),
                "200k": steady_median(fn, SCALE_DIR),
            }
        recall, n_truth = _knn_auto_recall(spark, SCALE_DIR)

        # ---- iteration-heavy family: wall + round count per rung
        from migdar_data_pipelines_spark.operators import metrics as _metrics

        def _rounds_fmt(rounds_key: str | None) -> str:
            """rounds next to the O(log n) budget connected_components now
            records (VERDICT r10 #5) — a rounds column drifting toward its
            budget flags diameter growth before a 100x run."""
            if not rounds_key:
                return "fixed"
            r = _metrics.LAST.get(rounds_key, "?")
            if rounds_key == "cc_rounds" and "cc_rounds_budget" in _metrics.LAST:
                return f"{r} of <={_metrics.LAST['cc_rounds_budget']}"
            return str(r)

        iter_rows: list[tuple[str, float, str, float, str]] = []
        for name, rounds_key in ITER_SF1:
            fn = QUERIES[name]["fn"]
            a = steady_median(fn, "/root/testdata/sf0.1")
            ra = _rounds_fmt(rounds_key)
            b = steady_median(fn, SCALE_DIR)
            rb = _rounds_fmt(rounds_key)
            iter_rows.append((name, a, ra, b, rb))
        # mutual_knn's CC pass: rounds at the 200k ANN rung (wall already in ann)
        _mutual_knn_auto(spark, SCALE_DIR).count()
        release_scoped()
        spark.catalog.clearCache()
        mutual_rounds = _rounds_fmt("cc_rounds")

        # ---- Zipfian skew rung: plain vs salted, AQE skew-join on/off
        # measure the rung's actual shape from the generated parquet instead
        # of embedding constants that go stale when the corpus seed/size
        # changes (ADVICE r10): row count, distinct users, hot-key share
        import duckdb as _duck

        _shape = _duck.sql(
            "SELECT sum(c) AS n, count(*) AS users, max(c) AS hot FROM "
            "(SELECT user_id, count(*) AS c FROM "
            f"read_parquet('{SCALE_DIR}/events_skewed.parquet') GROUP BY 1)"
        ).fetchone()
        skew_n, skew_users = int(_shape[0]), int(_shape[1])
        hot_pct = round(100.0 * _shape[2] / _shape[0], 1)

        skew_rows: list[tuple[str, float, float]] = []
        for label, plain_fn, salted_fn in [
            ("per-key top-5 (window vs salted_topk)", _skew_topk_window, _skew_topk_salted),
            ("per-key sum/count (groupBy vs salted_aggregate)", _skew_agg_plain, _skew_agg_salted),
        ]:
            p = steady_median(plain_fn, SCALE_DIR)
            s = steady_median(salted_fn, SCALE_DIR)
            skew_rows.append((label, p, s))
        # equality sanity: the salted forms must return the same row sets
        n_plain = _skew_topk_window(spark, SCALE_DIR).count()
        n_salted = _skew_topk_salted(spark, SCALE_DIR).count()
        assert n_plain == n_salted, (n_plain, n_salted)

        # skewed sort-merge join: AQE skew split off vs on (thresholds sized
        # for this rung's MB-scale partitions; both runtime-settable)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        skew_join: dict[str, float] = {}
        skew_plan_engaged = False
        for setting in ("false", "true"):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", setting)
            skew_join[setting] = steady_median(_skew_join, SCALE_DIR)
            if setting == "true":
                df = _skew_join(spark, SCALE_DIR)
                # collect() THIS df: count() runs a different QueryExecution,
                # leaving df's own plan un-finalized (isFinalPlan=false, no
                # AQE skew markers — bit this harness once)
                df.collect()
                final_plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "simple"
                )
                skew_plan_engaged = "skew=true" in final_plan
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    lines = [
        "# SCALING — steady-state wall time across scale factors",
        "",
        "Each step multiplies the data by 10x. `xN` columns show the time-growth",
        "factor per step; a scale-safe plan stays well under the 10x data growth",
        "while fixed costs (scheduling floor, dimension work) dominate, and at most",
        "linear once data dominates. Times are the SECOND run at each SF (warm",
        "scan/codegen), local[32]. Regenerate with `python tools/gen_scaling.py`.",
        "",
        "| query | what scales | sf0.001 | sf0.01 | x | sf0.1 | x | dominant cost |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, _, scales, cost in runs:
        t = times[name]
        a, b, c = (t[sf] for sf in SFS)
        lines.append(
            f"| {name} | {scales} | {a:.2f}s | {b:.2f}s | x{b / a:.1f} "
            f"| {c:.2f}s | x{c / b:.1f} | {cost} |"
        )
    lines += [
        "",
        "Reading: an `x` near 1 means the fixed floor still dominates at that step;",
        "the sf0.01 -> sf0.1 factor is the honest signal. Factors well under 10",
        "mean the plan's scale-bearing stages (shuffles, joins, kernels) grow",
        "sub-linearly in wall time because parallel slots absorb the growth —",
        "the property that carries to a 1000-executor cluster. Any factor ABOVE",
        "10 would mean super-linear work (e.g. a pair explosion) and fails review.",
        "",
    ]
    if have_scale:
        lines += [
            "## Synthetic sf1 rung — the pair-heavy family",
            "",
            f"One more 10x decade for the x2.4-3.6 growers: {n_scale_docs:,} docs",
            "(10 shards of the sf0.1 corpus with per-shard-disjoint token",
            "space, so duplicate DENSITY stays constant — pair count grows",
            "linearly with rows, the regime a real corpus scales in).",
            "Generate with `python tools/gen_scale_corpus.py`.",
            "Both columns are MEDIANS of 3 steady-state runs (the 10-60s rungs",
            "swing +/-40% between single runs late in a long JVM session).",
            "",
            "| query | sf0.1 | sf1 (synthetic) | x |",
            "|---|---|---|---|",
        ]
        for name in PAIR_SF1:
            a, b = pair_sf01[name], pair_sf1[name]
            note = ""
            if name == "simhash_near_dup_pairs" and b / a > 10:
                note = " (narrow 256-value band keyspace — see the SimHash hot-cluster section; the `_wide` row below is the corpus-scale form)"
            lines.append(f"| {name} | {a:.2f}s | {b:.2f}s | x{b / a:.1f}{note} |")
        lines += [
            "",
            "The one factor above 10, narrow-band `simhash_near_dup_pairs`, is",
            "the STRUCTURAL tiny-keyspace saturation the SimHash hot-cluster",
            "section measures and the RuntimeWarning steers callers away from:",
            "256 values per band means bucket occupancy grows linearly with",
            "the corpus with no adversarial cluster needed. The operator's",
            "corpus-scale parameterization (`_wide`, 48-bit/12-bit bands) is",
            "the row beneath it at x6-7 — in-family with the other pair ops.",
            "",
            "The edit_distance row is the round-9 measure-then-fix story: this",
            "corpus is char-level TEMPLATED (every shard shares the same ~30",
            "base words, so in-token q-grams repeat corpus-wide at aligned",
            "positions), and the first implementation — Ed-Join q-gram prefix",
            "filtering, even with its location extension — measured candidates",
            "growing x51 per 10x rows here (2.6M -> 135M pairs; q=5 didn't",
            "save it) for a x14 wall-time rung. Candidate generation was then",
            "replaced with PASS-JOIN segment matching (Li, Deng, Feng 2011):",
            "an untouched 1-of-(d+1) segment appears as an EXACT ~len/(d+1)-",
            "char substring at a +/-d-shifted position, and those long keys",
            "include the shard-distinct token suffixes — identical output",
            "(6,024 / 60,258 pairs, linear), wall 6.0s -> 1.8s at sf0.1 and",
            "68.7s -> 7.0s at sf1.",
            "",
            "Round 10 gave the two no-headroom rows (x8.6 / x9.2 in the r9",
            "table) the same treatment (tools/measure_candidates.py counts",
            "every scale-bearing frame across the rungs; PLANS.md carries the",
            "dispositions):",
            "",
            "- ngram_containment_pairs: single-rare-gram candidates were",
            "  MEASURED growing x119 per 10x rows on the shared-vocabulary",
            "  testdata rung (507,400 candidates for 1,109 true pairs at sf0.1",
            "  — one hit admits a whole posting list, and posting lists grow",
            "  with the corpus). Candidate generation now requires >= 2",
            "  independent hits on the m+2 rarest grams (pigeonring, exact by",
            "  pigeonhole) — a 9.5x candidate cut at every rung — grams fold",
            "  to xxhash64 longs once at array build, and verification reads",
            "  persisted hashed-gram arrays under a count-gated broadcast.",
            "  Identical output at every rung; sf1 wall 24.9s -> 12.9s.",
            "- substring_dup_spans: measured exactly LINEAR at every frame",
            "  (occurrences, distinct hashes, dup hashes, residue, output all",
            "  x10.0 per decade) — work-bound, not a filter defect; its one",
            "  redundant cost (a second full shuffle of the occurrence frame",
            "  into the residue join) is now a count-gated broadcast of the",
            "  dup-hash set.",
        ]
        lines += [
            "",
            "## ANN auto gate — default-argument calls on both sides of the 100k ceiling",
            "",
            f"`strategy=\"auto\"` (the default) at sf0.1 ({2000:,} vectors) routes",
            f"to the exact blocked kernel; at the synthetic {n_scale_emb:,}-vector",
            "rung it routes to IVF (~sqrt(n) cells, nprobe=2) — the production",
            "branch, measured on the path a default-argument caller actually",
            "takes (100x the rows, NOT 100x the time — the sub-quadratic",
            "evidence the gate exists for).",
            "",
            "| call | sf0.1 (2k, exact branch) | 200k rung (IVF branch) | x per 100x rows |",
            "|---|---|---|---|",
        ]
        for name, _ in ANN_AUTO:
            a, b = ann[name]["sf0.1"], ann[name]["200k"]
            lines.append(f"| {name} | {a:.2f}s | {b:.2f}s | x{b / a:.1f} |")
        lines += [
            "",
            f"Measured accuracy at the 200k rung: edge recall@3 = **{recall:.4f}**",
            f"for the default (IVF-routed) call vs exact brute-force ground truth on",
            f"a deterministic 1-in-200 query sample ({n_truth:,} true edges; exact",
            "side = blocked-matmul kernel, sample x full corpus). The production",
            "route is fast AND finds the neighbours — not a speed-for-garbage trade.",
            "",
            "Control (measured once, r9): on a NEAR-UNIFORM 200k corpus (noise",
            "vector ~2x the center norm — no local structure) the same call",
            "measured recall@3 = 0.11: IVF recall is a property of the corpus's",
            "clusterability, as ANN theory says. Real embedding models produce",
            "the clustered regime above; for adversarially unstructured vectors",
            "raise nprobe or force strategy='exact'.",
            "",
            "## Iteration-heavy family — sf1 rung with round counts",
            "",
            "Fixed-point/CC operators' ROUND count can grow with data (graph",
            "diameter), multiplying every per-round cost — the pair-family rung",
            "doesn't exercise that. `rounds` is the measured convergence round",
            "count (operators/metrics.py, recorded by connected_components);",
            "`fixed` = the operator runs a data-independent iteration count by",
            "construction (pagerank 5, label_propagation 3). Medians of 3.",
            "",
            "| query | sf0.1 | rounds | sf1 (synthetic) | rounds | x |",
            "|---|---|---|---|---|---|",
        ]
        for name, a, ra, b, rb in iter_rows:
            lines.append(
                f"| {name} | {a:.2f}s | {ra} | {b:.2f}s | {rb} | x{b / a:.1f} |"
            )
        lines += [
            "",
            f"`mutual_knn_clusters` (default args, 200k ANN rung above) converged",
            f"its CC pass in **{mutual_rounds} rounds** at 200k vectors.",
            "Star-contraction CC converges in O(log diameter) rounds; near-dup",
            "graphs are clique-ish (diameter ~2), so the count stays flat as the",
            "corpus grows with constant dup density — the rung verifies exactly",
            "that (a rising rounds column would flag diameter growth before it",
            "becomes a 100x-scale surprise).",
            "",
            "## Zipfian skew rung — hot-key behavior, plain vs explicit handling",
            "",
            f"events_skewed.parquet: {skew_n:,} rows, user_id ~ Zipf(1.5) over",
            f"{skew_users:,} distinct users, hot key = {hot_pct}% of all rows",
            "(shape measured from the generated parquet, not assumed)",
            "(gen_scale_corpus.py, seed 7) — the skew every uniform rung",
            "hides. Medians of 3, local[32]. The measured outcome is a MAP of",
            "which skew shapes Spark's own machinery already defuses and which",
            "need explicit handling:",
            "",
            "| shape | plain | salted/two-phase | verdict |",
            "|---|---|---|---|",
        ]
        for label, p, s in skew_rows:
            verdict = (
                "salted wins" if s < p * 0.8
                else ("parity — native handling suffices" if s < p * 1.25 else "plain wins")
            )
            lines.append(f"| {label} | {p:.2f}s | {s:.2f}s | {verdict} |")
        lines += [
            "",
            "Readings (each verified in the final physical plans):",
            "",
            "- **rank()<=k top-k: Spark 3.5+'s WindowGroupLimit already defuses",
            "  the hot key** — a Partial group-limit below the exchange keeps ~k",
            "  rows per key per map partition, so the 7.65M-row hot key never",
            "  funnels through one sort. Parity measured; `salted_topk`",
            "  (operators/scale.py) is the explicit two-phase form for filters",
            "  the rule can't push (non-literal k, composed views, other",
            "  engines), equality-tested against the window form.",
            "- **algebraic SUM/COUNT: map-side partial aggregation collapses",
            "  hot-key rows per input partition before the exchange** — parity;",
            "  `salted_aggregate` is for partials that don't collapse and",
            "  AQE-off clusters.",
            "",
            "Skewed sort-merge join (20M Zipf events x 50k-user dim, broadcast",
            "disabled, AQE skew thresholds sized to this rung's MB-scale",
            "partitions):",
            "",
            "| AQE skewJoin | wall |",
            "|---|---|",
            f"| disabled | {skew_join['false']:.2f}s |",
            f"| enabled | {skew_join['true']:.2f}s |",
            "",
            f"Final adaptive plan shows `SortMergeJoin(skew=true)` + the hot side",
            f"read as `coalesced and skewed`: **{skew_plan_engaged}** — the runtime",
            "split ENGAGES at this rung (the hot partition is ~100MB; the",
            "wall-time delta stays modest at laptop scale, but at 100 TB the same",
            "split is the difference between a 30-TB straggler task and ~120",
            "parallel splits). Caveat discovered while building this rung, now",
            "pinned in the harness docstring (tools/common.py): OptimizeSkewedJoin",
            "only matches SMJ children that are bare shuffle+sort — building the",
            "dim with `.distinct()` right before the join leaves a HashAggregate",
            "between its shuffle and the join and SILENTLY disables the split at",
            "every threshold. Materialize dims before skew-prone joins.",
            "",
        ]
        # ---- hot-cluster LSH rung (VERDICT r10 #1): read the stats JSON
        # written by tools/measure_hot_cluster.py (run separately — its 500k
        # rung takes minutes and should not gate every SCALING regen)
        hc_path = f"{SCALE_DIR}/hot_cluster_stats.json"
        if os.path.exists(hc_path):
            with open(hc_path) as f:
                hc = json.load(f)
            mini = hc.get("mini_5k_equality", {})
            lines += [
                "## Hot-cluster LSH rung — the shape that makes a band bucket quadratic",
                "",
                "Corpus: documents_hotcluster.parquet (gen_scale_corpus.py) — 20% of",
                "docs form ONE near-identical template cluster (paraphrase-level: a",
                "member-unique final word, member-member Jaccard ~0.95, so exact",
                "dedup cannot collapse it), funneling into the SAME band bucket in",
                "every band. `implied unguarded` is what the pre-guard all-pairs",
                "self-join would emit, COMPUTED from the bucket-size histogram",
                "(sum n*(n-1)/2) — never materialized. The guard",
                "(`MAX_LSH_BUCKET_SIZE`, llm/dedup.py): oversized buckets emit",
                "linear star pairs against the bucket's canonical member.",
                "Production params (32 hashes / 16 bands / k=3 / t=0.8).",
                "",
                "| rung | max bucket | implied unguarded pairs | guarded candidates | cut | wall (guarded, end-to-end) | cluster captured |",
                "|---|---|---|---|---|---|---|",
            ]
            for rung in ("50k", "500k"):
                s = hc.get(rung)
                if s:
                    lines.append(
                        f"| {rung} | {s['max_bucket']:,} | {s['implied_unguarded']:,} "
                        f"| {s['guarded_candidates']:,} | x{s['cut_factor']:,} "
                        f"| {s['wall_s']:.2f}s | {s['cluster_group_size']:,}/{s['cluster_expected']:,} |"
                    )
            wall_ratio = (
                f"{hc['500k']['wall_s'] / hc['50k']['wall_s']:.1f}"
                if "50k" in hc and "500k" in hc
                else "?"
            )
            lines += [
                "",
                f"10x rows -> x{wall_ratio} wall: the implied quadratic grows",
                f"x100 per decade ({hc.get('500k', {}).get('implied_unguarded', 0):,}",
                "pairs at 500k docs); the guarded candidate count grows x10",
                "(linear). Dedup GROUPS are preserved: the 5k mini-rung",
                "(1k-member cluster, small enough to run unguarded) asserts",
                "guarded == unguarded groups",
                f"({mini.get('guarded_pairs', 0):,} guarded vs",
                f"{mini.get('unguarded_pairs', 0):,} unguarded PAIRS — the pair",
                "list for a hot bucket is rep-member by design; the groups are",
                "identical), and tests/test_llm_ops.py::test_lsh_hot_bucket_ceiling",
                "pins the same invariant in CI. The 1-doc capture shortfall at both",
                "rungs is a SIGNATURE-scheme false negative (a member whose unique",
                "shingle hashes below every common shingle sculpts its own",
                "signature and lands in singleton buckets), present identically",
                "with the guard off — not a guard miss.",
                "",
            ]
        else:
            lines += [
                "## Hot-cluster LSH rung",
                "",
                f"(not measured this run: {hc_path} missing — run",
                "`python tools/measure_hot_cluster.py`)",
                "",
            ]

        # ---- co-purchase basket-ceiling + a-priori rung (VERDICT r12 #2):
        # stats JSON written by tools/measure_copurchase.py (run separately)
        cp_path = f"{SCALE_DIR}/copurchase_stats.json"
        if os.path.exists(cp_path):
            with open(cp_path) as f:
                cp = json.load(f)
            mini = cp.get("mini_20k_apriori_equality", {})
            lines += [
                "## Co-purchase rung — basket ceiling + a-priori prune under Zipf skew",
                "",
                "Corpus: baskets_zipf.parquet (measure_copurchase.py, seed 11) —",
                "basket sizes ~ Zipf(2.5) clipped at 2000 plus three 20,000-item",
                "bot-cart baskets per rung; items uniform over a |baskets|-sized",
                "universe so a large singleton fraction exists for the a-priori",
                "prune. `implied unguarded` is sum s*(s-1)/2 over ALL baskets",
                "(computed from the size histogram, never materialized);",
                "`guarded` is the same sum after the <=1000 ceiling and the",
                "min-support-2 item prune — the join the operator actually runs.",
                "Production params (ceiling 1000, item + pair support 2).",
                "",
                "| rung | baskets | max basket | over ceiling | implied unguarded pairs | guarded pairs | cut | items pruned | wall (end-to-end) | output pairs |",
                "|---|---|---|---|---|---|---|---|---|---|",
            ]
            for rung in ("20k", "200k", "2M"):
                s = cp.get(rung)
                if s:
                    lines.append(
                        f"| {rung} | {s['baskets']:,} | {s['max_basket']:,} "
                        f"| {s['over_ceiling']} | {s['implied_unguarded_pairs']:,} "
                        f"| {s['guarded_pairs']:,} | x{s['cut_factor']:,} "
                        f"| {s['items_pruned_frac']:.1%} | {s['wall_s']:.2f}s "
                        f"| {s['output_pairs']:,} |"
                    )
            if "20k" in cp and "2M" in cp:
                wall_ratio = cp["2M"]["wall_s"] / cp["20k"]["wall_s"]
                lines += [
                    "",
                    f"100x baskets -> x{wall_ratio:.1f} wall: the guarded join",
                    "budget grows linearly with baskets (sum_b |b|^2 under a",
                    "fixed size distribution), while the three bot carts alone",
                    "would add ~6e8 unguarded pairs per rung — the ceiling",
                    "removes them deterministically. The 20k mini-rung asserts",
                    "the a-priori prune is LOSSLESS for the surviving pair set:",
                    f"(item_a, item_b, n_ab, n_a, n_b) identical ({mini.get('pairs', 0):,}",
                    "pairs) with min_item_support 1 vs 2 — downward closure, so",
                    "no frequent pair can contain an infrequent item.",
                    "",
                ]
        else:
            lines += [
                "## Co-purchase rung",
                "",
                f"(not measured this run: {cp_path} missing — run",
                "`python tools/measure_copurchase.py`)",
                "",
            ]

        # ---- streaming-curation index-growth rung (VERDICT r13 #4): stats
        # JSON written by tools/measure_curate_index.py (run separately)
        ci_path = f"{SCALE_DIR}/curate_index_stats.json"
        if os.path.exists(ci_path):
            with open(ci_path) as f:
                ci = json.load(f)
            lines += [
                "## Streaming-curation rung — per-micro-batch cost vs standing-index growth",
                "",
                "Corpus: curate_index/docs.parquet (measure_curate_index.py,",
                "seed 23/17 family) — 60-token docs over a 50k vocabulary;",
                "the probed BATCH is FIXED at 2,000 docs (10% exact + 10%",
                "near copies of index docs, 80% fresh) while the standing",
                "index decades 10k -> 100k -> 1M docs. `build` is the",
                "ONE-TIME probe-state materialization per increment",
                "(index_probe_frames -> parquet); `prepared` is the verdict",
                "every later micro-batch pays against that state",
                "(curate_batch_verdict(index_state=...)); `raw` is the same",
                "verdict handed the raw index text — the pre-r14 shape that",
                "re-shingles the whole corpus per batch. Production bucket",
                "ceiling; flagged counts prove the probe finds the planted",
                "duplicates at every rung.",
                "",
                "| index | batch | build (once) | per-batch prepared | x | per-batch raw | raw x | flagged exact / near |",
                "|---|---|---|---|---|---|---|---|",
            ]
            prev_p = prev_r = None
            for rung in ("10k", "100k", "1M"):
                s = ci.get(rung)
                if not s:
                    continue
                xp = f"x{s['prepared_wall_s'] / prev_p:.1f}" if prev_p else ""
                xr = f"x{s['raw_wall_s'] / prev_r:.1f}" if prev_r else ""
                prev_p, prev_r = s["prepared_wall_s"], s["raw_wall_s"]
                lines.append(
                    f"| {s['index_rows']:,} | {s['batch_rows']:,} "
                    f"| {s['build_wall_s']:.1f}s | {s['prepared_wall_s']:.2f}s "
                    f"| {xp} | {s['raw_wall_s']:.2f}s | {xr} "
                    f"| {s['flagged_exact']:,} / {s['flagged_near']:,} |"
                )
            if "10k" in ci and "1M" in ci:
                pd_ratio = ci["1M"]["prepared_wall_s"] / ci["10k"]["prepared_wall_s"]
                rw_ratio = ci["1M"]["raw_wall_s"] / ci["10k"]["raw_wall_s"]
                lines += [
                    "",
                    f"100x index -> x{pd_ratio:.1f} per-batch wall on the",
                    f"persisted-state path vs x{rw_ratio:.1f} on the raw path:",
                    "the prepared probe touches the batch's own shingles, a",
                    "skinny (id, bucket) band-table scan, and verification",
                    "shingles for candidate docs only, so index growth shows",
                    "up as scan IO, not recompute. The raw path re-minhashes",
                    "the full corpus per batch — the trend that made the",
                    "persisted state load-bearing at 100 TB (a standing",
                    "corpus probed by thousands of batches must not be",
                    "re-signed per batch).",
                    "",
                ]
        else:
            lines += [
                "## Streaming-curation index-growth rung",
                "",
                f"(not measured this run: {ci_path} missing — run",
                "`python tools/measure_curate_index.py`)",
                "",
            ]

        # ---- substring-rewrite residue/rows rung (VERDICT r13 #4): stats
        # JSON written by tools/measure_substring_rewrite.py (run separately)
        sr_path = f"{SCALE_DIR}/substring_rewrite_stats.json"
        if os.path.exists(sr_path):
            with open(sr_path) as f:
                sr = json.load(f)
            lines += [
                "## Substring-rewrite rung — dup-residue fraction sweep + rows decade",
                "",
                "Corpus: substring_rewrite/*.parquet",
                "(measure_substring_rewrite.py, seed 23) — 100-word docs with",
                "per-doc-unique tokens; a fraction p of docs splices the SAME",
                "30-word boilerplate block at a random offset, so the planted",
                "block is the entire cross-doc dup residue and its k-grams",
                "are maximally hot (every carrier shares them). k=8;",
                "drop_duplicated_spans end-to-end (keep-first excise).",
                "",
                "| sweep | docs | residue p | wall | dropped words | docs rewritten |",
                "|---|---|---|---|---|---|",
            ]
            for key, s in sr.get("fraction_sweep", {}).items():
                lines.append(
                    f"| fraction | {s['docs']:,} | {key} | {s['wall_s']:.2f}s "
                    f"| {s['dropped_words']:,} | {s['docs_rewritten']:,} |"
                )
            for key, s in sr.get("rows_decade", {}).items():
                lines.append(
                    f"| rows | {s['docs']:,} | 10% | {s['wall_s']:.2f}s "
                    f"| {s['dropped_words']:,} | {s['docs_rewritten']:,} |"
                )
            fs = sr.get("fraction_sweep", {})
            rd = sr.get("rows_decade", {})
            if "0%" in fs and "100%" in fs and "20k" in rd and "200k" in rd:
                f_ratio = fs["100%"]["wall_s"] / max(fs["0%"]["wall_s"], 1e-9)
                r_ratio = rd["200k"]["wall_s"] / max(rd["20k"]["wall_s"], 1e-9)
                lines += [
                    "",
                    f"0% -> 100% residue: x{f_ratio:.1f} wall — the hot",
                    "boilerplate grams land in ONE map-side-combinable",
                    "min(struct(id,pos)) groupBy (never a rank window over",
                    "the occurrence stream), so a corpus-wide template",
                    "costs an aggregation, not a hot-key sort. Dropped",
                    "words track (carriers-1) x 30 exactly — every later",
                    "carrier loses the planted block at k-gram resolution.",
                    f"10x rows at fixed residue: x{r_ratio:.1f} wall — the",
                    "scan-dominated regime.",
                    "",
                ]
        else:
            lines += [
                "## Substring-rewrite rung",
                "",
                f"(not measured this run: {sr_path} missing — run",
                "`python tools/measure_substring_rewrite.py`)",
                "",
            ]

        # ---- persisted IVF-PQ index rung (round 14): stats JSON written by
        # tools/measure_ivfpq_index.py (run separately)
        iv_path = f"{SCALE_DIR}/ivfpq_index_stats.json"
        if os.path.exists(iv_path):
            with open(iv_path) as f:
                iv = json.load(f)
            lines += [
                "## Persisted IVF-PQ index rung — extend cost vs increment, search cost vs index decade",
                "",
                f"Corpus: ivfpq_index (measure_ivfpq_index.py, seed {iv['seed']}) —",
                f"{iv['dim']}-dim vectors around {iv['n_cells']} frozen cluster",
                "centres (the quantizer references). Index ladder 20k -> 200k ->",
                "1M rows: built ONCE at 20k, then extended by",
                "incremental_add_ivf_pq (assign to frozen cells + append codes",
                f"— never retrains, never rewrites standing rows). Fixed",
                f"{iv['n_queries']}-query search at k={iv['k']},",
                f"nprobe={iv['nprobe']} of {iv['n_cells']} cells, so the codes",
                "scan is partition-pruned to",
                f"{iv['nprobe']}/{iv['n_cells']} of the index. Brute =",
                "cosine_topk over the full corpus (the exact baseline the",
                "index replaces), measured at the two lower rungs — two",
                "points pin its linear slope.",
                "",
                "| index rows | increment | add/build | search | search x | brute | recall@5 |",
                "|---|---|---|---|---|---|---|",
            ]
            prev_s = None
            for rung in ("20k", "200k", "1M"):
                s = iv["rungs"].get(rung)
                if not s:
                    continue
                xs = f"x{s['search_wall_s'] / prev_s:.1f}" if prev_s else ""
                prev_s = s["search_wall_s"]
                brute = (
                    f"{s['brute_wall_s']:.1f}s"
                    if s["brute_wall_s"] is not None
                    else "(not run)"
                )
                rec = (
                    f"{s['recall_at_5']:.2f}"
                    if s["recall_at_5"] is not None
                    else "—"
                )
                lines.append(
                    f"| {s['rows']:,} | {s['increment_rows']:,} "
                    f"| {s['add_wall_s']:.1f}s | {s['search_wall_s']:.2f}s "
                    f"| {xs} | {brute} | {rec} |"
                )
            r = iv["rungs"]
            if "20k" in r and "200k" in r and "1M" in r:
                sx = r["1M"]["search_wall_s"] / r["20k"]["search_wall_s"]
                ax = r["1M"]["add_wall_s"] / r["200k"]["add_wall_s"]
                ix = r["1M"]["increment_rows"] / r["200k"]["increment_rows"]
                lines += [
                    "",
                    f"50x index -> x{sx:.1f} search wall (fixed probe/rerank",
                    "overhead dominates): the probed-cell partition filter",
                    "keeps the scan at rows-per-cell scale (N/n_cells x",
                    "nprobe), and the int8 code tier keeps the scanned bytes",
                    "4x under float — while brute force grows with the FULL",
                    "corpus per query (its two measured points pin the",
                    "linear slope). Add cost tracks the INCREMENT, never the",
                    f"standing index: a {ix:.1f}x bigger increment cost",
                    f"x{ax:.1f} wall with a 5x bigger standing index behind",
                    "it — at 100 TB the quantizer is frozen once and every",
                    "ingest batch pays only its own encode + append, the ANN",
                    "mirror of incremental_dedup.",
                    "",
                ]
        else:
            lines += [
                "## Persisted IVF-PQ index rung",
                "",
                f"(not measured this run: {iv_path} missing — run",
                "`python tools/measure_ivfpq_index.py`)",
                "",
            ]

        # ---- simhash hot-cluster + tiny-keyspace rung (VERDICT r11 #1/#6):
        # stats JSON written by tools/measure_simhash_hot.py (run separately)
        sh_path = f"{SCALE_DIR}/simhash_hot_stats.json"
        if os.path.exists(sh_path):
            with open(sh_path) as f:
                sh = json.load(f)
            mini = sh.get("mini_5k", {})
            lines += [
                "## SimHash hot-cluster rung — band join guarded, keyspace contrasted",
                "",
                "Corpus: documents_simhash_hot.parquet (gen_scale_corpus.py) — 20% of",
                "docs share a 400-word boilerplate template + a member-unique final",
                "word (member signatures within a few free-bit flips: a genuine",
                "hamming<=3 cluster that funnels into the same band buckets); 80%",
                "token-disjoint unique docs. Accounting identical to the LSH rung",
                "(implied quadratic COMPUTED from the bucket histogram, never",
                "materialized). Two parameterizations of the SAME operator:",
                "`wide` = 48-bit/12-bit bands (4,096 values/band — the corpus-scale",
                "form, registered as simhash_near_dup_pairs_wide), `narrow` =",
                "32-bit/8-bit bands (256 values/band — the reference-parity form,",
                "now emitting a RuntimeWarning at this width).",
                "",
                "| rung | bits | max bucket | hot buckets | implied unguarded pairs | guarded candidates | cut | wall (guarded) |",
                "|---|---|---|---|---|---|---|---|",
            ]
            for key, bits in (
                ("wide_50k", 48), ("wide_500k", 48),
                ("narrow_50k", 32), ("narrow_500k", 32),
            ):
                s = sh.get(key)
                if s:
                    wall = f"{s['wall_s']:.2f}s" if "wall_s" in s else "(histogram only)"
                    lines.append(
                        f"| {key.split('_')[1]} | {bits} | {s['max_bucket']:,} "
                        f"| {s['hot_buckets']:,} | {s['implied_unguarded']:,} "
                        f"| {s['guarded_candidates']:,} | x{s['cut_factor']:,} "
                        f"| {wall} |"
                    )
            w50, w500 = sh.get("wide_50k", {}), sh.get("wide_500k", {})
            wall_ratio = (
                f"{w500['wall_s'] / w50['wall_s']:.1f}"
                if "wall_s" in w50 and "wall_s" in w500
                else "?"
            )
            lines += [
                "",
                f"Wide form, 10x rows -> x{wall_ratio} wall; the narrow form's",
                "256-value keyspace saturates at 500k docs",
                f"({sh.get('narrow_500k', {}).get('hot_buckets', 0):,}",
                f"of {sh.get('narrow_500k', {}).get('buckets', 0):,} band buckets",
                "over the ceiling — the token-disjoint background pushes every",
                "bucket's occupancy ~1.5k with no adversarial cluster needed,",
                f"{sh.get('narrow_500k', {}).get('implied_unguarded', 0):,} implied",
                "pairs) — the structural tiny-keyspace failure the guard caps to",
                "linear and the RuntimeWarning exists",
                "for. Unlike minhash, the star form's hamming-vs-representative",
                "verify CAN trade recall on a signature-spread cluster (a member",
                "within distance of a neighbour but past it vs the rep); the",
                "5k mini-rung (1k-member cluster, unguarded run feasible) measures",
                f"it: pair recall {mini.get('pair_recall', 0):.2%}",
                f"({mini.get('guarded_pairs', 0):,} guarded vs",
                f"{mini.get('unguarded_pairs', 0):,} unguarded pairs — star lists",
                "rep-member pairs by design), rep-connected group",
                f"{mini.get('guarded_rep_group', 0):,} guarded vs",
                f"{mini.get('unguarded_rep_group', 0):,} unguarded of the",
                f"{mini.get('cluster_size', 0):,}-member cluster. Guarded pairs are",
                "asserted a SUBSET of the unguarded truth (the guard never invents",
                "a pair); below the ceiling the plans are bit-identical",
                "(tests/test_llm_ops.py::test_simhash_hot_bucket_ceiling).",
                "",
            ]
        else:
            lines += [
                "## SimHash hot-cluster rung",
                "",
                f"(not measured this run: {sh_path} missing — run",
                "`python tools/measure_simhash_hot.py`)",
                "",
            ]

        # ---- SRP/cosine hot-cluster rung (VERDICT r11 #2)
        srp_path = f"{SCALE_DIR}/srp_hot_stats.json"
        if os.path.exists(srp_path):
            with open(srp_path) as f:
                srp = json.load(f)
            mini = srp.get("mini_2k_equality", {})
            lines += [
                "## SRP/cosine hot-cluster rung — the embedding-space boilerplate shape",
                "",
                "Corpus: embeddings_hotcluster.parquet (gen_scale_corpus.py) — 20%",
                "of vectors are near-identical copies of ONE template direction",
                "(sigma=0.005, member-member cosine ~0.9999 >= the 0.99 threshold;",
                "none byte-identical), so the cluster funnels into the same",
                "(band, key) bucket in all 8 bands; the 80% background is the",
                "standard clustered geometry (cosine ~0.86 — bucket load, no true",
                "pairs). Default srp_lsh_near_dup params (128 bits / 8 bands).",
                "",
                "| rung | max bucket | hot buckets | implied unguarded pairs | guarded candidates | cut | wall (guarded) | cluster captured |",
                "|---|---|---|---|---|---|---|---|",
            ]
            for rung in ("20k", "200k"):
                s = srp.get(rung)
                if s:
                    lines.append(
                        f"| {rung} | {s['max_bucket']:,} | {s['hot_buckets']:,} "
                        f"| {s['implied_unguarded']:,} | {s['guarded_candidates']:,} "
                        f"| x{s['cut_factor']:,} | {s['wall_s']:.2f}s "
                        f"| {s['cluster_group_size']:,}/{s['cluster_expected']:,} |"
                    )
            wall_ratio = (
                f"{srp['200k']['wall_s'] / srp['20k']['wall_s']:.1f}"
                if "20k" in srp and "200k" in srp
                else "?"
            )
            lines += [
                "",
                f"10x rows -> x{wall_ratio} wall with the implied quadratic growing",
                "x100 per decade. No recall trade here, unlike simhash: exact-cosine",
                "verification vs the representative passes for every member of a",
                "genuinely near-identical cluster, so the 2k mini-rung asserts",
                "guarded == unguarded dedup GROUPS outright",
                f"({mini.get('guarded_pairs', 0):,} guarded vs",
                f"{mini.get('unguarded_pairs', 0):,} unguarded PAIRS — star form by",
                "design; groups identical). Run: `python tools/measure_srp_hot.py`.",
                "",
            ]
        else:
            lines += [
                "## SRP/cosine hot-cluster rung",
                "",
                f"(not measured this run: {srp_path} missing — run",
                "`python tools/measure_srp_hot.py`)",
                "",
            ]

        # ---- CC-rounds trend, 1M rung (VERDICT r11 #5)
        cc_path = f"{SCALE_DIR}/cc_trend_stats.json"
        if os.path.exists(cc_path):
            with open(cc_path) as f:
                cc = json.load(f)
            m = cc.get("1m", {})
            lines += [
                "## CC-rounds trend — 1M-vector rung",
                "",
                "The open question from the 200k rung (7 of <=19 rounds): does",
                "mutual-kNN's connected-component round count flatten (clique-ish",
                "graphs, diameter ~constant) or climb (diameter growth — the",
                "multiplier a 100x run would pay)? Same default-argument call",
                "(auto -> IVF branch) on the 1M-vector corpus",
                "(gen_scale_corpus.py::gen_embeddings_1m, same clustered geometry,",
                "10,000 centers x 100 members; steady-state second run).",
                "",
                "| rung | rows | wall | CC rounds |",
                "|---|---|---|---|",
                f"| 1M | {m.get('rows', 0):,} | {m.get('wall_s', 0):.2f}s "
                f"| {m.get('cc_rounds', '?')} of <={m.get('cc_rounds_budget', '?')} |",
                "",
                "Run: `python tools/measure_cc_trend.py`.",
                "",
            ]
        else:
            lines += [
                "## CC-rounds trend — 1M-vector rung",
                "",
                f"(not measured this run: {cc_path} missing — run",
                "`python tools/measure_cc_trend.py`)",
                "",
            ]
    else:
        lines += [
            f"(Synthetic rungs skipped: {SCALE_DIR} not generated — run",
            "`python tools/gen_scale_corpus.py` first.)",
            "",
        ]

    # ---- triangle-census hub rung (needs no scale corpus: the graph is
    # generated from spark.range by tools/measure_triangle_hub.py)
    th_path = f"{SCALE_DIR}/triangle_hub_stats.json"
    if os.path.exists(th_path):
        with open(th_path) as f:
            th = json.load(f)
        lines += [
            "## Triangle census — hub-graph rung (degree-ordered orientation)",
            "",
            "The graph analogue of the LSH hot-bucket shape: one node adjacent",
            "to the whole corpus. A wedge enumeration keyed on the center pays",
            "sum deg*(deg-1)/2 join rows — the hub alone is ~n^2/2. The",
            "orientation (Suri & Vassilvitskii 2011) directs every edge toward",
            "the higher (deg, id) rank, so the hub ends with OUT-degree 0 and",
            "wedges are charged to the bounded spokes. `naive` is COMPUTED from",
            "the degree frame (never materialized); `oriented` is the actual",
            "row count of the engine's own wedge join; triangle counts asserted",
            "against the analytic ground truth (3n-5) at every rung.",
            "",
            "| spokes | edges | naive wedge rows | oriented wedge rows | cut | hub out-deg | wall |",
            "|---|---|---|---|---|---|---|",
        ]
        for n in sorted(th, key=int):
            s = th[n]
            lines.append(
                f"| {int(n):,} | {s['n_edges']:,} | {s['naive_wedge_rows']:,} "
                f"| {s['oriented_wedge_rows']:,} | x{s['cut_factor']:,.0f} "
                f"| {s['hub_out_degree']} | {s['wall_s']:.2f}s |"
            )
        lines += [
            "",
            "Run: `python tools/measure_triangle_hub.py`.",
            "",
        ]
    else:
        lines += [
            "## Triangle census — hub-graph rung",
            "",
            f"(not measured this run: {th_path} missing — run",
            "`python tools/measure_triangle_hub.py`)",
            "",
        ]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")
    for name, _, _, _ in runs:
        t = times[name]
        print(name, {k: round(v, 2) for k, v in t.items()})
    for name, t1 in pair_sf1.items():
        print("sf1", name, round(t1, 2))
    for name, t in ann.items():
        print("ann", name, {k: round(v, 2) for k, v in t.items()})
    if have_scale:
        for name, a, ra, b, rb in iter_rows:
            print("iter", name, round(a, 2), ra, "->", round(b, 2), rb)
        for label, p, s in skew_rows:
            print("skew", label, round(p, 2), "vs salted", round(s, 2))
        print("skew join", {k: round(v, 2) for k, v in skew_join.items()},
              "plan skew=true:", skew_plan_engaged)


if __name__ == "__main__":
    main()
