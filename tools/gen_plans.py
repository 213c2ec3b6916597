#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for representative registry
queries, trimmed to the operator tree plus the scan/exchange/join detail
blocks (PushedFilters / ReadSchema / partitioning arguments) that the scale
review actually reads. Run from the repo root."""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ADDENDA_MARKER = (
    "<!-- HAND-WRITTEN ADDENDA — gen_plans.py preserves everything below "
    "this line across regenerations -->"
)

PICK = {
    "q5_region_revenue": "Multi-way join: dims broadcast, one fact shuffle",
    "minhash_lsh_near_dup": "Banded LSH: bucket-key self-join, broadcast verification",
    "asof_join_events_purchase": (
        "As-of join: ONE hash exchange; the range semantics live in a window, "
        "not a join node"
    ),
    "range_join_events_windows": "Range join as bucketed equi-join: no nested-loop node",
    "incremental_dedup_documents": (
        "Batch probes standing index: batch side broadcast, index never shuffled"
    ),
    "embedding_topk_ivf": "IVF: probe only the query's cell",
    "classifier_score_documents": "In-scan model inference: zero exchange",
    "hll_distinct_orders": "HLL: algebraic partial aggregation, <=256-row exchange",
    "substring_dup_spans_documents": (
        "Substring dedup: map-side-combined gram counts, dup-residue join, "
        "islands window over the residue only"
    ),
    "srp_lsh_near_dup_embeddings": (
        "SRP cosine LSH: Arrow-matmul signatures, band-key self-join, "
        "broadcast exact-cosine verify"
    ),
    "record_linkage_parts": (
        "Blocked linkage: distinct-name rollup before the block join, "
        "broadcast weight-join back to entities"
    ),
    "semi_join_late_orders": "EXISTS as LeftSemi: output bounded by probe side",
    "bm25_topk_documents": "BM25: broadcast query terms over the postings scan",
    "dedup_lines_documents": (
        "Line dedup: min(struct) first-occurrence, no window over hot lines"
    ),
    "ngram_containment_pairs": (
        "Containment: probe-prefix candidates, full-gram exact verify"
    ),
    "market_share_snowflake": "7-table snowflake: one fact shuffle, dims broadcast",
    "kmv_setops_users_events": (
        "KMV set algebra: per-partition k-min inside the scan stage, "
        "only sketch-sized exchanges above the MapInPandas"
    ),
    "embedding_covariance": (
        "Covariance: per-Arrow-batch int64 X^T X partials, "
        "(i, j)-keyed integer reduce — no float accumulation"
    ),
    "kmeans_clusters_embeddings": (
        "k-means final assignment: ArrowEvalPython over the persisted "
        "quantized frame, centroids in the closure, no join"
    ),
    "simhash_near_dup_pairs": (
        "Banded hamming search: band-bucket self-join with the exact "
        "bit_count(xor) verify folded into the join condition, hot-bucket "
        "ceiling in front (VERDICT r11 #1/#3)"
    ),
    "ks_drift_events": (
        "Two-sample KS: one map-side-combinable (group, value) groupBy, "
        "per-group cumulative window over DISTINCT values, totals broadcast"
    ),
    "chi_square_orders": (
        "Chi-square: cell groupBy + marginals over the CELL frame, "
        "zero-cell algebra — no R*C grid node anywhere in the plan"
    ),
    "triangle_count_knn_embeddings": (
        "Triangle census: degree-ordered orientation, wedge join keyed on "
        "the wedge node, closing join on id pairs (edge kernel is the "
        "exact-kNN oracle gate; production swaps the IVF graph)"
    ),
    "interpolate_events_value": (
        "Linear interpolation: both IGNORE NULLS frames share ONE "
        "exchange+sort per key"
    ),
    "ab_test_events": (
        "Welch t-test: ONE map-side-combinable groupBy, six integers per "
        "group on the shuffle — no window, no join"
    ),
    "acf_events": (
        "Lag-k ACF: all three lags fold into ONE Window node over one "
        "exchange+sort of the pre-aggregated daily frame"
    ),
    "session_paths_events": (
        "Session paths: two per-user linear window passes, "
        "TakeOrderedAndProject top-K, bounded_running broadcast ranks — "
        "no single-partition WindowExec"
    ),
    "oov_rate_documents": (
        "OOV rate: (doc, term) pair groupBy, term totals over the PAIR "
        "frame, term-keyed join with at-most-one-row-per-doc hot-key bound"
    ),
    "rfm_segments_orders": (
        "RFM: running_totals thresholds over distinct-value frames (auto-"
        "routed: plain window below 2M rows as recorded here, two-phase "
        "range-exchange above), ONE broadcast row per metric, scan-local "
        "scores — no row-level ntile at any scale"
    ),
    "curate_corpus_stats": (
        "Five-stage curation chain (the #1 engine-cost bench query): "
        "scan-local filter, hash-groupBy exact dedup, banded-LSH + CC "
        "near-dup collapse — scoped persists pin each stage frame once, "
        "every audit count reads the frame the next stage consumes"
    ),
    "assortativity_knn_embeddings": (
        "Degree assortativity: two degree equi-joins onto the canonical "
        "edge list, exact DECIMAL(38,0) moments, one scalar aggregate — "
        "no adjacency materialization, no window"
    ),
    "golden_record_customers": (
        "Golden record: scan-local melt, (cluster, attr, value) vote "
        "groupBy, min(struct(-cnt, val)) modal choice WITHOUT a window, "
        "conditional-agg pivot back to columns"
    ),
    "hll_rollup_events": (
        "HLL rollup-merge: (type, day, register) map-side-combined "
        "groupBy, register-wise max re-aggregation over the SKETCH frame "
        "(<= types*days*256 rows on any exchange) — raw stream scanned once"
    ),
    "attribution_events": (
        "Attribution: running first + last touch share ONE per-user "
        "exchange+sort (identical frames fold into a single Window node), "
        "conversions explode into two credits, one map-side groupBy"
    ),
    "wape_backtest_events": (
        "WAPE backtest: one per-group lag window over the aggregated "
        "daily frame + one map-side-combinable groupBy, a single half-up "
        "integer division — zero float until the output"
    ),
    "cross_corr_event_types": (
        "Pairwise cross-correlation: type-pair self-join on the "
        "AGGREGATED |days|x|types| frame only, exact DECIMAL(38,0) "
        "cross-moments, one canonical double chain per pair"
    ),
    "frequent_tokens_mg_documents": (
        "Misra-Gries heavy hitters: per-partition bounded summaries, "
        "capacity*partitions rows on the merge exchange, candidate-only "
        "exact recount + N/(capacity+1) certificate"
    ),
    "copurchase_parts_orders": (
        "Co-purchase mining: a-priori item prune + basket-size ceiling "
        "BEFORE the basket-keyed pair join (blow-up bounded by "
        "sum_b |b|^2, never corpus^2), support joins back onto pairs"
    ),
    "embedding_topk_ivf_pq": (
        "IVF-PQ: residual-quantized candidate scoring inside the probed "
        "cells (persisted reconstruction — the quantize chain runs once "
        "per corpus row), exact float rerank touches only top k*rerank"
    ),
    "substring_dedup_rewrite_documents": (
        "Substring rewrite: min(struct) first-occurrence groupBy over the "
        "dup residue (no rank window over hot grams), islands window, "
        "scan-local indexed word-drop over bounded per-doc span lists"
    ),
    "c4_clean_documents": (
        "C4 cleaning: the whole line+page rule set folds into ONE "
        "zero-exchange project over the scan — no Generate, no shuffle; "
        "keep_doc prunes pages before any downstream dedup"
    ),
    "unicode_normalize_documents": (
        "Unicode canonicalization: one ArrowEvalPython hop for NFC, every "
        "strip/collapse regexp above it JVM-side, zero exchange"
    ),
    "ccnet_perplexity_buckets_documents": (
        "CCNet terciles: running_totals cumulative token mass (auto-routed "
        "two-phase range-exchange at scale), ONE broadcast total row — "
        "no single-partition global window"
    ),
}


from common import knn_graph_ivf as _knn_graph_ivf  # noqa: E402


def _streaming_simhash_plan(spark, sf_dir):
    """The stateful-streaming plan shape (VERDICT r11 #3): the not-yet-
    started streaming frame, so explain() shows the
    FlatMapGroupsInPandasWithState node over the bucket exchange instead of
    the drained sink table."""
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import simhash_fast
    from migdar_data_pipelines_spark.streaming import read_events_stream
    from migdar_data_pipelines_spark.streaming.stateful import (
        streaming_simhash_near_dup,
    )

    stream = read_events_stream(spark, f"{sf_dir}/documents.parquet")
    sig = stream.select(
        F.col("doc_id").alias("id"),
        F.col("doc_id").alias("ord"),
        simhash_fast("text", 32).alias("sig"),
    )
    return streaming_simhash_near_dup(
        sig, "id", "ord", "sig", bits=32, bands=4, max_hamming=3
    )


def _streaming_attribution_plan(spark, sf_dir):
    """Pre-start stateful-streaming plan for the attribution feed (same
    rationale as _streaming_simhash_plan: explain() on the drained sink
    shows nothing; the not-yet-started frame shows the
    FlatMapGroupsInPandasWithState node over the user-key exchange)."""
    from migdar_data_pipelines_spark.streaming import read_events_stream
    from migdar_data_pipelines_spark.streaming.stateful import (
        streaming_attribution,
    )

    from pyspark.sql import functions as F

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    feed = stream.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("xus"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return streaming_attribution(
        feed, "purchase", "user_id", "event_type", "cents",
        order_cols=["xus", "event_id"],
    )


def _streaming_curate_batch_plan(spark, sf_dir):
    """The per-microbatch verdict plan the curation stream runs each
    trigger (streaming/curate.py::curate_batch_verdict): a representative
    increment (first documents chunk) probing a representative standing
    index (the rest of the corpus)."""
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.streaming.curate import (
        curate_batch_verdict, curation_filter,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    filt = d.filter(curation_filter("text")).select(
        F.col("doc_id").alias("id"), "text"
    )
    batch = filt.filter(F.col("id") % 5 == 0)
    index = filt.filter(F.col("id") % 5 != 0)
    return curate_batch_verdict(batch, index)


def _streaming_curate_prepared_plan(spark, sf_dir):
    """The per-microbatch verdict plan against the PERSISTED probe state —
    what streaming_curate actually runs per trigger since r14 (the raw-index
    form above is the semantics reference): the standing corpus arrives as
    its stored md5/band tables, so the plan contains no index-side shingle
    or minhash stage."""
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.dedup import index_probe_frames
    from migdar_data_pipelines_spark.streaming.curate import (
        curate_batch_verdict, curation_filter,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    filt = d.filter(curation_filter("text")).select(
        F.col("doc_id").alias("id"), "text"
    )
    batch = filt.filter(F.col("id") % 5 == 0)
    index = filt.filter(F.col("id") % 5 != 0)
    i_h, i_b = index_probe_frames(index, "text", "id")
    return curate_batch_verdict(
        batch, None, index_state=(i_h, i_b, index)
    )


def _ivf_pq_persisted_search_plan(spark, sf_dir):
    """search_ivf_pq_index over a materialized index (llm/similarity.py):
    the probed-cell partition filter must reach the codes scan, and the
    quantize chain must NOT appear (codes are stored; only the
    reconstruction zip_with runs at search time)."""
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.llm.similarity import (
        build_ivf_pq_index, search_ivf_pq_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    w = Window.partitionBy("label").orderBy("vec_id")
    refs = [
        (r["label"], list(r["embedding"]))
        for r in e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label", "embedding")
        .collect()
    ]
    base = tempfile.mkdtemp(prefix="plans_ivfpq_")
    build_ivf_pq_index(e, base, refs, "vec_id")
    return search_ivf_pq_index(
        spark, base, e.filter(F.col("vec_id") < 5), "vec_id", k=5, nprobe=2
    )


# non-registry plans: (title, callable, note)
EXTRA = [
    (
        "streaming_attribution (streaming, pre-start)",
        _streaming_attribution_plan,
        "applyInPandasWithState attribution: ONE exchange on the user key "
        "below FlatMapGroupsInPandasWithState; state per user is exactly "
        "two strings (first + latest touch) — nothing grows with the stream",
    ),
    (
        "streaming_curate per-microbatch verdict",
        _streaming_curate_batch_plan,
        "foreachBatch curation increment: within-batch min-per-hash exact "
        "tier + banded-LSH pair tier over the increment only; the index "
        "probe broadcasts the increment's band rows so the standing corpus "
        "is never shuffled (incremental_dedup)",
    ),
    (
        "streaming_curate per-microbatch verdict (persisted probe state)",
        _streaming_curate_prepared_plan,
        "the r14 production form: the standing index's md5 set and band "
        "table come from parquet (no index-side Generate/shingle stage in "
        "the plan — compare with the raw-index reference above); the batch "
        "broadcasts into the band probe, verification shingles only the "
        "candidate semi-join of the corpus",
    ),
    (
        "ivf_pq persisted index search",
        _ivf_pq_persisted_search_plan,
        "search over build_ivf_pq_index's layout: probed-cell partition "
        "filter on the codes scan (PartitionFilters — non-probed cells "
        "never read), reconstruction zip_with over stored int8 codes, "
        "exact rerank joins the float column for only the top k*rerank",
    ),
    (
        "knn_graph_ivf",
        _knn_graph_ivf,
        "ANN kNN graph: per-cell blocks meet in a cell equi-join "
        "(no cross join, nothing corpus-sized broadcast) — the "
        "sub-quadratic production route next to the exact block "
        "cross-join gate",
    ),
    (
        "streaming_simhash_near_dup (streaming, pre-start)",
        _streaming_simhash_plan,
        "applyInPandasWithState custom operator: ONE exchange on the "
        "band-bucket key below FlatMapGroupsInPandasWithState; per-bucket "
        "state capped at max_state signatures — nothing corpus-sized in "
        "state or shuffle",
    ),
]

KEEP_DETAIL = re.compile(
    r"PushedFilters|ReadSchema|Location|Arguments: hashpartitioning"
    r"|Arguments: .*Broadcast|Join condition|Output \[",
)


def trim(formatted: str) -> str:
    tree, _, detail = formatted.partition("\n\n")
    kept: list[str] = []
    block_head = None
    for line in detail.splitlines():
        if line.startswith("("):
            block_head = line
        elif KEEP_DETAIL.search(line):
            if block_head:
                kept.append(block_head)
                block_head = None
            kept.append(line.rstrip())
    return tree.rstrip() + ("\n\n" + "\n".join(kept) if kept else "")


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    from migdar_data_pipelines_spark.plans.llm_queries import QUERIES

    out = [
        "# PLANS — formatted physical plans for representative registry queries",
        "",
        "Generated at sf0.01 (local[8], shuffle=8; AQE final plans differ only in",
        "runtime-coalesced partition counts). Trees are full; per-node detail is",
        "trimmed to scan pushdown / exchange partitioning / join conditions.",
        "Regenerate with `python tools/gen_plans.py`.",
        "",
    ]
    runs = [(n, QUERIES[n]["fn"], note) for n, note in PICK.items()]
    runs += [(n, fn, note) for n, fn, note in EXTRA]
    for name, fn, note in runs:
        df = fn(spark, "/root/testdata/sf0.01")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"_{note}_", "", "```", trim(buf.getvalue()), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    # hand-written addenda (variance notes, per-round dispositions) live
    # below the marker and survive regeneration
    marker = ADDENDA_MARKER
    addenda = ""
    if os.path.exists(path):
        old = open(path).read()
        if marker in old:
            addenda = old[old.index(marker):]
    with open(path, "w") as f:
        f.write("\n".join(out))
        if addenda:
            f.write("\n" + addenda)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
