#!/usr/bin/env python
"""Regenerate SCALING.md: steady-state wall time for scale-critical queries
across the three testdata scale factors (10x data per step), with the
time-growth factor per step. A scale-safe plan grows at most linearly with
the data (factor <= ~10 per step, usually far less while fixed costs
dominate); super-linear growth flags a plan that would not survive 100x.
Run from the repo root with nothing else on the machine."""

from __future__ import annotations

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
]


from common import knn_graph_ivf as _knn_graph_ivf  # noqa: E402

# non-registry measurements: (name, callable, what scales, dominant cost)
EXTRA = [
    (
        "knn_graph_ivf (scale path)",
        _knn_graph_ivf,
        "embedding corpus",
        "sqrt(n) cells, same-cell block pairs only",
    ),
]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    from migdar_data_pipelines_spark.plans.llm_queries import QUERIES

    runs = [(name, QUERIES[name]["fn"], scales, cost) for name, scales, cost in PICK]
    runs += [(name, fn, scales, cost) for name, fn, scales, cost in EXTRA]

    times: dict[str, dict[str, float]] = {}
    for name, fn, _, _ in runs:
        times[name] = {}
        for sf in SFS:
            d = f"/root/testdata/sf{sf}"
            fn(spark, d).count()  # steady-state: warm run absorbs codegen/scan setup
            t0 = time.time()
            fn(spark, d).count()
            times[name][sf] = time.time() - t0

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
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")
    for name, _, _, _ in runs:
        t = times[name]
        print(name, {k: round(v, 2) for k, v in t.items()})


if __name__ == "__main__":
    main()
