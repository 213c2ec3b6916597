"""Unit tests for the round-4 operators: substring dup spans, unigram LM
scoring, BM25 retrieval, count-min sketch, blocked record linkage."""

import math

import pytest
from pyspark.sql import functions as F

from migdar_data_pipelines_spark.llm import bm25_topk, duplicated_spans
from migdar_data_pipelines_spark.llm.textanalysis import unigram_lm_scores
from migdar_data_pipelines_spark.operators.linkage import (
    block_histogram,
    blocked_linkage,
    phonetic_block_key,
)
from migdar_data_pipelines_spark.operators.sketches import (
    CMS_DEPTH,
    cms_estimate,
    cms_sketch,
)


# ---------------------------------------------------------------------------
# duplicated_spans
# ---------------------------------------------------------------------------


def test_duplicated_spans_finds_shared_region(spark):
    shared = "one two three four five"  # 5-word span shared by docs 1 and 2
    df = spark.createDataFrame(
        [
            (1, f"a b c {shared} x y z"),
            (2, f"p q {shared} r s t u"),
            (3, "totally unrelated words here only once ever said now"),
        ],
        "id long, text string",
    )
    got = {r.id: r for r in duplicated_spans(df, "text", "id", k=5).collect()}
    # the shared 5-gram occurs once in each doc -> one 5-word span each
    assert got[1].n_dup_spans == 1 and got[1].dup_words == 5
    assert got[2].n_dup_spans == 1 and got[2].dup_words == 5
    assert got[3].n_dup_spans == 0 and got[3].dup_words == 0
    assert got[1].dup_frac == round(5 / got[1].n_words, 4)


def test_duplicated_spans_merges_overlap(spark):
    # docs share a 6-word run -> two overlapping 5-grams merge to ONE 6-word span
    run = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, f"{run} tail1 x"), (2, f"head {run} tail2")],
        "id long, text string",
    )
    got = {r.id: r for r in duplicated_spans(df, "text", "id", k=5).collect()}
    assert got[1].n_dup_spans == 1 and got[1].dup_words == 6
    assert got[2].n_dup_spans == 1 and got[2].dup_words == 6


def test_duplicated_spans_short_docs_are_zero(spark):
    df = spark.createDataFrame(
        [(1, "only three words"), (2, "only three words")], "id long, text string"
    )
    got = {r.id: r for r in duplicated_spans(df, "text", "id", k=5).collect()}
    # below k words: no k-gram exists, even though the docs are identical
    assert got[1].n_dup_spans == 0 and got[2].dup_words == 0


# ---------------------------------------------------------------------------
# unigram_lm_scores
# ---------------------------------------------------------------------------


def test_unigram_lm_matches_hand_computation(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "id long, text string"
    )
    # corpus: a=2, b=2, c=1; T=5, V=3 -> P(a)=3/8, P(b)=3/8, P(c)=2/8
    got = {r.id: r for r in unigram_lm_scores(df, "text", "id").collect()}
    nll1 = -(2 * math.log(3 / 8) + math.log(3 / 8)) / 3
    nll2 = -(math.log(3 / 8) + math.log(2 / 8)) / 2
    assert got[1].n_tokens == 3 and got[1].nll == round(nll1, 4)
    assert got[2].n_tokens == 2 and got[2].nll == round(nll2, 4)
    # rarer words -> higher surprise
    assert got[2].nll > got[1].nll


# ---------------------------------------------------------------------------
# bm25_topk
# ---------------------------------------------------------------------------


def test_bm25_ranks_term_matches_first(spark):
    df = spark.createDataFrame(
        [
            (1, "spark shuffle join plan"),
            (2, "spark spark spark unrelated"),
            (3, "nothing relevant here at all"),
            (4, "join plan"),
        ],
        "id long, text string",
    )
    got = bm25_topk(
        spark, df, [("q", "spark join")], "text", "id", topk=3
    ).collect()
    assert [r.rank for r in got] == [1, 2, 3]
    ids = [r.id for r in got]
    assert ids[0] == 1  # matches both terms
    assert 3 not in ids  # no term overlap -> never retrieved
    assert all(r.score > 0 for r in got)


def test_bm25_tie_break_is_id_order(spark):
    df = spark.createDataFrame(
        [(7, "same words here"), (3, "same words here")], "id long, text string"
    )
    got = bm25_topk(spark, df, [("q", "same")], "text", "id", topk=2).collect()
    assert [r.id for r in got] == [3, 7]  # equal scores -> ascending id


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_and_is_exact_when_sparse(spark):
    rows = [(f"user{i % 7}",) for i in range(70)]
    df = spark.createDataFrame(rows, "u string")
    sk = cms_sketch(df, "u")
    cells = sk.collect()
    # each input row increments one cell per hash row
    assert sum(c.cnt for c in cells) == 70 * CMS_DEPTH
    est = {
        r.key: r.est
        for r in cms_estimate(df.select("u").distinct(), "u", sk).collect()
    }
    for k, e in est.items():
        assert e >= 10  # true count per key
    # 7 keys in 256 buckets: collisions effectively impossible in every row
    assert all(e == 10 for e in est.values())


def test_cms_merges_across_shards(spark):
    a = spark.createDataFrame([("x",)] * 5, "u string")
    b = spark.createDataFrame([("x",)] * 3 + [("y",)], "u string")
    merged = (
        cms_sketch(a, "u")
        .unionByName(cms_sketch(b, "u"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    est = {
        r.key: r.est
        for r in cms_estimate(
            spark.createDataFrame([("x",), ("y",)], "u string"), "u", merged
        ).collect()
    }
    assert est == {"x": 8, "y": 1}


# ---------------------------------------------------------------------------
# blocked record linkage
# ---------------------------------------------------------------------------


def test_phonetic_block_key_invariances(spark):
    df = spark.createDataFrame(
        [("small ring",), ("smll ring",), ("small-ring",), ("SMALL RING",)],
        "n string",
    )
    keys = {r[0] for r in df.select(phonetic_block_key("n")).collect()}
    assert keys == {"sml"}  # vowel drop, hyphenation, case: all same block


def test_blocked_linkage_matches_within_threshold_only(spark):
    left = spark.createDataFrame(
        [(1, "small ring"), (2, "red widget")], "id long, n string"
    )
    right = spark.createDataFrame(
        [(10, "smll ring"), (20, "ruud wiidgeet"), (30, "small rings")],
        "id long, n string",
    )
    got = {
        (r.left_id, r.right_id): r.dist
        for r in blocked_linkage(left, right, "n", "id", max_dist=2).collect()
    }
    assert got[(1, 10)] == 1  # dropped vowel
    assert got[(1, 30)] == 1  # plural
    # same block ('rdw' consonant skeleton) but 4 edits away: verify rejects
    assert (2, 20) not in got


def test_block_histogram_shape(spark):
    df = spark.createDataFrame([("aa bb",), ("abb",), ("zz",)], "n string")
    hist = {r.block: r.n for r in block_histogram(df, "n").collect()}
    assert hist == {"bb": 2, "zz": 1}


# ---------------------------------------------------------------------------
# SRP (signed-random-projection) cosine LSH
# ---------------------------------------------------------------------------


def test_srp_lsh_finds_clones_and_skips_distant(spark):
    from migdar_data_pipelines_spark.llm.dedup import srp_lsh_near_dup

    base = [float(i % 7) - 3 for i in range(16)]
    other = [float((i * 3) % 5) - 2 for i in range(16)]
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, other)], "id long, v array<double>"
    )
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in srp_lsh_near_dup(df, "v", "id", threshold=0.99, dim=16).collect()
    }
    assert got == {(1, 2): 1.0}  # clone pair found at cosine 1.0; distant skipped


def test_srp_planes_deterministic(spark):
    from migdar_data_pipelines_spark.llm.dedup import srp_planes

    a, b = srp_planes(8, 16), srp_planes(8, 16)
    assert a == b
    assert all(v in (-1, 1) for row in a for v in row)
    # planes differ across bits (not degenerate)
    assert len({tuple(r) for r in a}) > 1


# ---------------------------------------------------------------------------
# Determinism under repartitioning (§5.2.4 pattern): the round-4 operators
# must give identical results at any partition count.
# ---------------------------------------------------------------------------


def _docs(spark, n=40):
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(12 + i % 5)))
        for i in range(n)
    ]
    # seed real duplication: clone a block of docs
    rows += [(100 + i, rows[i][1]) for i in range(8)]
    return spark.createDataFrame(rows, "id long, text string")


@pytest.mark.parametrize("nparts", [1, 7])
def test_duplicated_spans_partition_invariant(spark, nparts):
    df = _docs(spark).repartition(nparts)
    got = sorted(
        tuple(r) for r in duplicated_spans(df, "text", "id", k=5).collect()
    )
    ref = sorted(
        tuple(r)
        for r in duplicated_spans(_docs(spark).repartition(3), "text", "id", k=5)
        .collect()
    )
    assert got == ref


@pytest.mark.parametrize("nparts", [1, 7])
def test_unigram_lm_partition_invariant(spark, nparts):
    df = _docs(spark).repartition(nparts)
    got = {r.id: (r.n_tokens, r.nll) for r in unigram_lm_scores(df, "text", "id").collect()}
    ref = {
        r.id: (r.n_tokens, r.nll)
        for r in unigram_lm_scores(_docs(spark).repartition(2), "text", "id").collect()
    }
    assert got == ref


@pytest.mark.parametrize("nparts", [1, 7])
def test_srp_lsh_partition_invariant(spark, nparts):
    from migdar_data_pipelines_spark.llm.dedup import srp_lsh_near_dup

    vecs = [
        (i, [float((i * 11 + j * 3) % 17) - 8 for j in range(16)]) for i in range(30)
    ]
    vecs += [(100 + i, vecs[i][1]) for i in range(10)]  # clones
    df = spark.createDataFrame(vecs, "id long, v array<double>").repartition(nparts)
    got = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in srp_lsh_near_dup(df, "v", "id", threshold=0.99, dim=16).collect()
    )
    assert len(got) >= 10  # every clone pair found regardless of partitioning
    ref_df = spark.createDataFrame(vecs, "id long, v array<double>").repartition(4)
    ref = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in srp_lsh_near_dup(ref_df, "v", "id", threshold=0.99, dim=16).collect()
    )
    assert got == ref


# ---------------------------------------------------------------------------
# hybrid RRF fusion
# ---------------------------------------------------------------------------


def test_hybrid_rrf_fuses_both_channels(spark):
    from migdar_data_pipelines_spark.llm import hybrid_rrf

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta delta"),   # strong lexical match to doc 1
            (3, "epsilon zeta eta"),   # no lexical overlap with doc 1
            (4, "alpha unrelated filler"),
        ],
        "doc_id long, text string",
    )
    # vector space disagrees with text: doc 3 is the vector twin of doc 1
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [1.0, 0.0, 0.001]),
            (4, [0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = hybrid_rrf(docs, vecs, [1], channel_k=4, topk=4).collect()
    by_rank = {r.rank: r.id for r in got}
    assert by_rank[1] == 1  # the query doc itself tops both channels
    ids = {r.id for r in got}
    assert {2, 3}.issubset(ids)  # both the lexical and the vector neighbour fused
    # every rrf score is a sum of 1/(60+r) terms
    for r in got:
        assert 0 < r.rrf_score <= round(2 / 61, 6)


def test_cms_absent_key_estimates_zero(spark):
    from migdar_data_pipelines_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame([("present",)] * 4, "u string")
    sk = cms_sketch(df, "u")
    probes = spark.createDataFrame([("present",), ("never-seen-key",)], "u string")
    est = {r.key: r.est for r in cms_estimate(probes, "u", sk).collect()}
    # the absent key must appear, and with all (or any) cells untouched its
    # min-over-cells estimate is 0 — not a dropped row, not a collision count
    assert est["present"] == 4
    assert est["never-seen-key"] == 0


def test_stratified_fixed_n_exact_and_stable(spark):
    from migdar_data_pipelines_spark.llm.curation import stratified_fixed_n

    rows = [(i, f"src{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "id long, source string")
    a = stratified_fixed_n(df.repartition(1), "source", "id", 5)
    b = stratified_fixed_n(df.repartition(11), "source", "id", 5)
    sa = sorted((r.source, r.id) for r in a.collect())
    sb = sorted((r.source, r.id) for r in b.collect())
    assert sa == sb  # same members at any partitioning
    from collections import Counter

    counts = Counter(s for s, _ in sa)
    assert counts == {"src0": 5, "src1": 5, "src2": 5}  # exactly N per group


def test_cms_join_size_upper_bounds_exact(spark):
    from migdar_data_pipelines_spark.operators.sketches import (
        cms_join_size,
        cms_sketch,
    )

    a = spark.createDataFrame([(i % 5,) for i in range(50)], "k long")
    b = spark.createDataFrame([(i % 7,) for i in range(70)], "k long")
    est = cms_join_size(cms_sketch(a, "k"), cms_sketch(b, "k")).first().est_join_size
    exact = a.join(b, "k").count()
    assert est >= exact  # inner product never under-estimates
    assert est <= 50 * 70  # and is far below the cross-join bound


def test_dedup_lines_keeps_first_occurrence_only(spark):
    from migdar_data_pipelines_spark.llm.dedup import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "shared header\nunique to one"),
            (2, "shared header\nunique to two"),
            (3, "unique to three\nshared header"),
        ],
        "id long, text string",
    )
    got = {r.id: r for r in dedup_lines(df, "text", "id").collect()}
    assert got[1].n_kept == 2  # first occurrence of the header survives
    assert got[2].n_kept == 1 and got[2].cleaned_text == "unique to two"
    assert got[3].n_kept == 1 and got[3].cleaned_text == "unique to three"


def test_containment_sees_quotation_jaccard_misses(spark):
    from migdar_data_pipelines_spark.llm.dedup import ngram_containment_pairs

    long_doc = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(8))  # the long doc's head
    corpus = spark.createDataFrame([(1, long_doc)], "id long, text string")
    probe = spark.createDataFrame([(100, excerpt)], "id long, text string")
    got = ngram_containment_pairs(
        probe, corpus, "text", "id", n=2, threshold=0.8
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (100, 1)
    assert r.containment == 1.0  # every excerpt bigram is in the long doc
    # while the symmetric jaccard of the same pair is far below threshold
    assert 7 / 39 < 0.3


def test_containment_prefix_filter_is_lossless(spark):
    from migdar_data_pipelines_spark.llm.dedup import ngram_containment_pairs

    # probe at EXACTLY the threshold: 4 of 5 bigrams shared (C = 0.8)
    corpus = spark.createDataFrame(
        [(1, "a b c d e f")], "id long, text string"  # bigrams ab bc cd de ef
    )
    probe = spark.createDataFrame(
        [(100, "a b c d e zz")], "id long, text string"  # ab bc cd de ezz
    )
    got = ngram_containment_pairs(
        probe, corpus, "text", "id", n=2, threshold=0.8
    ).collect()
    assert len(got) == 1 and got[0].containment == 0.8


def test_containment_pigeonring_floor_is_lossless(spark):
    """The q_hits=2 pigeonring filter's worst cases: (a) every allowed miss
    lands INSIDE the rarest prefix, so a true pair shares exactly
    prefix_len - m = q_hits prefix grams; (b) a tiny probe where
    required < q_hits, so the hit floor must drop to `required` (a 1-gram
    probe can never share 2 grams)."""
    from migdar_data_pipelines_spark.llm.dedup import ngram_containment_pairs

    # (a) probe bigrams: ab bc cd de ef zq (sz=6, t=0.8 -> required=5, m=1,
    # prefix=3 rarest). 'zq' is corpus-absent (df 0, always in the prefix)
    # and IS the one miss; the doc must still qualify via 2 prefix hits.
    corpus = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y")], "id long, text string"
    )
    probe = spark.createDataFrame(
        [(100, "a b c d e f zq")], "id long, text string"
    )
    got = ngram_containment_pairs(
        probe, corpus, "text", "id", n=2, threshold=0.8
    ).collect()
    assert len(got) == 1 and got[0].containment == 0.8333  # round(5/6, 4)

    # (b) single-gram probe (2 words): required=1 < q_hits=2
    probe1 = spark.createDataFrame([(200, "x y")], "id long, text string")
    got1 = ngram_containment_pairs(
        probe1, corpus, "text", "id", n=2, threshold=0.8
    ).collect()
    assert [(r.id_b, r.containment) for r in got1] == [(2, 1.0)]


def test_margin_mining_rejects_hub_vectors(spark):
    from migdar_data_pipelines_spark.llm.similarity import margin_mining

    # left 0 and right 1 are twins; right 3 is a hub (moderately close to
    # EVERY left vector) — raw cosine would retrieve it, the margin kills it
    left = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.2]),
            (2, [0.0, 1.0, 0.0, 0.2]),
            (4, [0.0, 0.0, 1.0, 0.2]),
        ],
        "vec_id long, embedding array<double>",
    )
    right = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.2]),   # twin of 0
            (3, [0.5, 0.5, 0.5, 0.3]),   # hub
            (5, [0.0, 1.0, 0.1, 0.2]),   # near-twin of 2
        ],
        "vec_id long, embedding array<double>",
    )
    got = margin_mining(left, right, k=2, margin_threshold=1.05).collect()
    pairs = {(r.left_id, r.right_id) for r in got}
    assert (0, 1) in pairs and (2, 5) in pairs  # genuine twins clear the margin
    # vectors WITH a genuine twin don't also mine the hub: their strong
    # neighbourhood pushes the hub's relative score below threshold
    assert (0, 3) not in pairs and (2, 3) not in pairs
    for r in got:
        assert r.margin >= 1.05 and 0 < r.cosine <= 1.0


def test_cosine_topk_blocked_matches_expression_path(spark):
    from migdar_data_pipelines_spark.llm.similarity import (
        cosine_topk,
        cosine_topk_blocked,
    )

    vecs = [
        (i, [float((i * 7 + j * 5) % 13) - 6 for j in range(8)]) for i in range(60)
    ]
    q = spark.createDataFrame(vecs[:20], "vec_id long, embedding array<double>")
    c = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    a = cosine_topk(q, c, "vec_id", "vec_id", k=5, exclude_self=True)
    b = cosine_topk_blocked(
        q, c, "vec_id", "vec_id", k=5, exclude_self=True, block_rows=16
    )
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb  # blocked kernel is rank- and score-identical


def test_dedup_lines_keeps_all_input_docs(spark):
    """ADVICE r4: a doc whose text is only empty/whitespace lines must still
    appear in the output as (id, 0, 0, '') — a rewrite op may not lose
    input documents."""
    from migdar_data_pipelines_spark.llm.dedup import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "keep me\nshared line"),
            (2, "shared line\nother text"),
            (3, "\n   \n  \n"),      # space/empty lines only: none survive
                                      # (trim strips spaces in both engines)
            (4, ""),                   # fully empty
        ],
        "id long, text string",
    )
    got = {r.id: r for r in dedup_lines(df, "text", "id").collect()}
    assert set(got) == {1, 2, 3, 4}
    for empty_id in (3, 4):
        r = got[empty_id]
        assert (r.n_lines, r.n_kept, r.cleaned_text) == (0, 0, "")
    assert got[1].n_kept == 2          # both its lines are corpus-first
    assert got[2].n_kept == 1          # 'shared line' deduped away


def test_srp_lsh_rejects_indivisible_bands(spark):
    """ADVICE r4: nbits not divisible by bands would silently drop trailing
    signature bits — must raise instead."""
    import pytest as _pytest

    from migdar_data_pipelines_spark.llm.dedup import srp_lsh_near_dup

    df = spark.createDataFrame([(1, [1.0] * 8)], "id long, v array<double>")
    with _pytest.raises(ValueError, match="divisible"):
        srp_lsh_near_dup(df, "v", "id", nbits=100, bands=8, dim=8)


def test_kmv_matches_python_reference_and_is_accurate(spark):
    """operators/sketches.py KMV vs a pure-Python reference (same md5 fold,
    same k-min trim, same estimator literals), plus accuracy: the union /
    intersection estimates must land within the ~1/sqrt(k-2) band of the
    exact answer on overlapping integer sets."""
    import hashlib

    from migdar_data_pipelines_spark.operators.sketches import (
        KMV_HEX_DIGITS,
        KMV_K,
        KMV_SPACE,
        kmv_set_ops,
        kmv_sketch,
    )

    A = list(range(0, 3000))           # |A| = 3000
    B = list(range(2000, 6000))        # |B| = 4000, |A∩B| = 1000, |A∪B| = 6000

    def fold(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:KMV_HEX_DIGITS], 16)

    def ref_sketch(vals):
        return sorted({fold(v) for v in vals})[:KMV_K]

    ra, rb = ref_sketch(A), ref_sketch(B)
    ru = sorted(set(ra) | set(rb))[:KMV_K]
    ni = len([h for h in ru if h in set(ra) and h in set(rb)])

    def est(sk):
        return len(sk) if len(sk) < KMV_K else round((KMV_K - 1) * KMV_SPACE / sk[-1], 4)

    da = spark.createDataFrame([(v,) for v in A], "user_id long")
    db = spark.createDataFrame([(v,) for v in B], "user_id long")
    sa, sb = kmv_sketch(da, "user_id"), kmv_sketch(db, "user_id")
    got_a = [r["h"] for r in sa.orderBy("rk").collect()]
    assert got_a == ra

    rows = {r["set_name"]: r for r in kmv_set_ops(sa, sb).collect()}
    assert rows["a"]["n_sketch"] == len(ra) and rows["a"]["kth_hash"] == ra[-1]
    assert rows["a"]["est"] == est(ra)
    assert rows["union"]["est"] == est(ru)
    assert rows["intersection"]["n_sketch"] == ni
    assert rows["intersection"]["kth_hash"] is None
    assert rows["intersection"]["est"] == round(ni / len(ru) * est(ru), 4)

    # accuracy: 3-sigma of the k-min estimator (sigma ~ n/sqrt(k-2))
    for name, true in (("a", 3000), ("b", 4000), ("union", 6000)):
        sigma = true / (KMV_K - 2) ** 0.5
        assert abs(rows[name]["est"] - true) < 3 * sigma, (name, rows[name]["est"])
    # intersection: looser (ratio estimator compounds)
    assert abs(rows["intersection"]["est"] - 1000) < 1000


def test_kmv_underfull_and_empty_intersection(spark):
    """Under-full sketches estimate EXACTLY (the sketch is the distinct
    set), and disjoint sets still yield an intersection row with est 0."""
    from migdar_data_pipelines_spark.operators.sketches import (
        kmv_set_ops,
        kmv_sketch,
    )

    da = spark.createDataFrame([(v,) for v in range(10)], "u long")
    db = spark.createDataFrame([(v,) for v in range(100, 120)], "u long")
    rows = {
        r["set_name"]: r
        for r in kmv_set_ops(kmv_sketch(da, "u"), kmv_sketch(db, "u")).collect()
    }
    assert rows["a"]["est"] == 10.0 and rows["b"]["est"] == 20.0
    assert rows["union"]["est"] == 30.0
    assert rows["intersection"]["n_sketch"] == 0
    assert rows["intersection"]["est"] == 0.0


def test_sampled_quantiles_reference_and_accuracy(spark):
    """sampled_quantiles vs a pure-Python mirror (same fold, same
    nearest-rank-lower rule) and vs the TRUE quantiles of a known
    distribution (rank error within ~3/sqrt(k) of uniform)."""
    import hashlib

    from migdar_data_pipelines_spark.operators.sketches import (
        KMV_HEX_DIGITS,
        sampled_quantiles,
    )

    N, K = 20000, 1024
    rows = [(i, float(i % 10007)) for i in range(N)]  # near-uniform values

    def fold(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:KMV_HEX_DIGITS], 16)

    samp = sorted(((fold(i), v) for i, v in rows))[:K]
    vals = sorted((v, h) for h, v in samp)
    probs = (0.25, 0.5, 0.9, 0.99)
    want = {p: vals[int((len(vals) - 1) * p)][0] for p in probs}

    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["p"]: (r["sample_n"], r["q_value"])
        for r in sampled_quantiles(df, "v", "id", probs=probs, k=K).collect()
    }
    assert set(got) == set(probs)
    for p in probs:
        assert got[p][0] == K
        assert got[p][1] == want[p], p
        # accuracy vs the true distribution quantile (values ~ U[0, 10007))
        assert abs(got[p][1] - p * 10007) < 3 / K**0.5 * 10007 + 1, (p, got[p])


def test_sampled_quantiles_underfull_input(spark):
    """Fewer rows than k: the sample IS the data and quantiles are exact."""
    from migdar_data_pipelines_spark.operators.sketches import sampled_quantiles

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(11)], "id long, v double"
    )
    got = {
        r["p"]: r["q_value"]
        for r in sampled_quantiles(df, "v", "id", probs=(0.0, 0.5, 1.0)).collect()
    }
    assert got == {0.0: 0.0, 0.5: 5.0, 1.0: 10.0}


def test_psi_drift_matches_python_reference(spark):
    """operators/profile.py::psi_drift vs a pure-Python PSI: add-one
    smoothing over the union of buckets, one-sided buckets finite, and
    identical distributions scoring ~0."""
    import math

    from migdar_data_pipelines_spark.operators.profile import psi_drift

    a_rows = [("en",)] * 50 + [("fr",)] * 30 + [("de",)] * 20
    b_rows = [("en",)] * 30 + [("fr",)] * 50 + [("he",)] * 20  # de lost, he new

    ca = {"en": 50, "fr": 30, "de": 20}
    cb = {"en": 30, "fr": 50, "he": 20}
    buckets = sorted(set(ca) | set(cb))
    ta, tb, nb = sum(ca.values()), sum(cb.values()), len(buckets)

    def term(k):
        pa = (ca.get(k, 0) + 1) / (ta + nb)
        pb = (cb.get(k, 0) + 1) / (tb + nb)
        return (pa - pb) * math.log(pa / pb)

    want = {k: round(term(k), 6) for k in buckets}
    want_total = round(sum(term(k) for k in buckets), 6)

    da = spark.createDataFrame(a_rows, "lang string")
    db = spark.createDataFrame(b_rows, "lang string")
    rows = {r["lang"]: r for r in psi_drift(da, db, ["lang"]).collect()}
    for k in buckets:
        assert rows[k]["psi_term"] == pytest.approx(want[k], abs=1e-6), k
        assert rows[k]["count_a"] == ca.get(k, 0)
        assert rows[k]["count_b"] == cb.get(k, 0)
    assert rows["__total__"]["psi_term"] == pytest.approx(want_total, abs=1e-6)
    assert rows["__total__"]["count_a"] == ta and rows["__total__"]["count_b"] == tb
    # every term of a genuine shift is finite and the total is alarmingly big
    assert all(math.isfinite(r["psi_term"]) for r in rows.values())
    assert rows["__total__"]["psi_term"] > 0.25

    # identical snapshots -> total PSI ~ 0
    same = {
        r["lang"]: r["psi_term"] for r in psi_drift(da, da, ["lang"]).collect()
    }
    assert same["__total__"] == 0.0


def test_psi_drift_by_matches_python_reference(spark):
    """psi_drift_by: per-group PSI vs one reference — python mirror with
    per-group bucket unions (a group-only bucket and a ref-only bucket)."""
    import math

    from migdar_data_pipelines_spark.operators.profile import psi_drift_by

    ref = {"en": 60, "fr": 40}
    cur = {
        "w1": {"en": 30, "fr": 20},            # same mix -> small PSI
        "w2": {"en": 5, "he": 45},             # fr lost, he new -> big PSI
    }

    def terms(g):
        buckets = sorted(set(ref) | set(cur[g]))
        ta, tb, nb = sum(ref.values()), sum(cur[g].values()), len(buckets)
        out = {}
        for k in buckets:
            pa = (ref.get(k, 0) + 1) / (ta + nb)
            pb = (cur[g].get(k, 0) + 1) / (tb + nb)
            out[k] = (pa - pb) * math.log(pa / pb)
        return out

    rdf = spark.createDataFrame(
        [(k, v) for k, v in ref.items()], "event_type string, count_a long"
    )
    cdf = spark.createDataFrame(
        [(g, k, v) for g, m in cur.items() for k, v in m.items()],
        "w string, event_type string, count_b long",
    )
    rows = {
        (r["w"], r["event_type"]): r
        for r in psi_drift_by(rdf, cdf, ["w"], ["event_type"]).collect()
    }
    for g in cur:
        t = terms(g)
        for k, v in t.items():
            assert rows[(g, k)]["psi_term"] == pytest.approx(
                round(v, 6), abs=1e-6
            ), (g, k)
            assert rows[(g, k)]["count_a"] == ref.get(k, 0)
            assert rows[(g, k)]["count_b"] == cur[g].get(k, 0)
        assert rows[(g, "__total__")]["psi_term"] == pytest.approx(
            round(sum(t.values()), 6), abs=1e-6
        )
    assert rows[("w2", "__total__")]["psi_term"] > rows[("w1", "__total__")]["psi_term"]
    # ref bucket 'fr' materializes in w2 with count_b 0; group-only 'he'
    # materializes with count_a 0
    assert rows[("w2", "fr")]["count_b"] == 0
    assert rows[("w2", "he")]["count_a"] == 0


def test_kmv_sketch_is_mergeable(spark):
    """Shard-merge property: re-trimming the union of two shard sketches
    equals the sketch of the union — what lets 100 TB shards sketch
    independently and combine at the driver/coordinator."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.operators.sketches import KMV_K, kmv_sketch

    da = spark.createDataFrame([(v,) for v in range(0, 4000)], "u long")
    db = spark.createDataFrame([(v,) for v in range(3000, 7000)], "u long")
    whole = spark.createDataFrame([(v,) for v in range(0, 7000)], "u long")

    sa, sb = kmv_sketch(da, "u"), kmv_sketch(db, "u")
    merged = (
        sa.select("h")
        .union(sb.select("h"))
        .dropDuplicates(["h"])
        .withColumn("rk", F.row_number().over(Window.orderBy("h")))
        .where(F.col("rk") <= KMV_K)
    )
    direct = kmv_sketch(whole, "u")
    assert [r["h"] for r in merged.orderBy("rk").collect()] == [
        r["h"] for r in direct.orderBy("rk").collect()
    ]


def test_kmv_adjacent_overlap_matches_python_reference(spark):
    """kmv_sketch_by + kmv_adjacent_overlap vs a pure-Python mirror on
    three consecutive 'days' with controlled overlap (plus a gap day that
    must produce no pair)."""
    import hashlib

    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.operators.sketches import (
        KMV_HEX_DIGITS,
        KMV_K,
        KMV_SPACE,
        kmv_adjacent_overlap,
        kmv_sketch_by,
    )

    days = {
        "2024-01-01": set(range(0, 3000)),
        "2024-01-02": set(range(2000, 5000)),     # 1000 shared with day 1
        "2024-01-04": set(range(0, 500)),         # gap: no 01-03 pair
    }

    def fold(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:KMV_HEX_DIGITS], 16)

    def sk(vals):
        return sorted({fold(v) for v in vals})[:KMV_K]

    def est(s):
        return len(s) if len(s) < KMV_K else round((KMV_K - 1) * KMV_SPACE / s[-1], 4)

    a, b = sk(days["2024-01-01"]), sk(days["2024-01-02"])
    u = sorted(set(a) | set(b))[:KMV_K]
    ni = len([h for h in u if h in set(a) and h in set(b)])
    want = {
        "est_a": est(a),
        "est_b": est(b),
        "est_union": est(u),
        "est_inter": round(ni / len(u) * est(u), 4),
    }

    rows = [(d, v) for d, vs in days.items() for v in vs]
    df = spark.createDataFrame(rows, "day string, user_id long")
    s = kmv_sketch_by(df, ["day"], "user_id")
    nxt = F.date_format(F.date_add(F.to_date(F.col("g")), 1), "yyyy-MM-dd")
    got = kmv_adjacent_overlap(s, "day", nxt).collect()
    assert len(got) == 1  # only the 01->02 pair exists
    r = got[0]
    assert (r["grp"], r["next_grp"]) == ("2024-01-01", "2024-01-02")
    for k_, v in want.items():
        assert r[k_] == v, (k_, r[k_], v)
    # sanity: the intersection estimate is in the right ballpark (true 1000)
    assert 400 < r["est_inter"] < 1800


def test_mutual_information_matches_python_reference(spark):
    """profile.py::mutual_information vs pure-Python MI/entropy/NMI:
    independent columns score ~0, a deterministic dependency scores
    NMI ~1, and the generic case matches to 6dp."""
    import math

    from migdar_data_pipelines_spark.operators.profile import mutual_information

    rows = [
        ("en", "web"), ("en", "web"), ("en", "book"),
        ("fr", "web"), ("fr", "book"), ("fr", "book"),
        ("de", "code"), ("de", "code"),
    ]

    def ref(pairs):
        n = len(pairs)
        cxy, cx, cy = {}, {}, {}
        for p in pairs:
            cxy[p] = cxy.get(p, 0) + 1
            cx[p[0]] = cx.get(p[0], 0) + 1
            cy[p[1]] = cy.get(p[1], 0) + 1
        mi = sum(
            (c / n) * math.log((c / cx[x]) * (n / cy[y]))
            for (x, y), c in cxy.items()
        )
        hx = sum(-(c / n) * math.log(c / n) for c in cx.values())
        hy = sum(-(c / n) * math.log(c / n) for c in cy.values())
        return n, mi, hx, hy, mi / math.sqrt(hx * hy)

    df = spark.createDataFrame(rows, "lang string, source string")
    r = mutual_information(df, "lang", "source").collect()[0]
    n, mi, hx, hy, nmi = ref(rows)
    assert r["n"] == n
    assert r["mi"] == pytest.approx(mi, abs=1e-6)
    assert r["h_x"] == pytest.approx(hx, abs=1e-6)
    assert r["h_y"] == pytest.approx(hy, abs=1e-6)
    assert r["nmi"] == pytest.approx(nmi, abs=1e-6)

    # x == y (deterministic dependency): NMI == 1
    same = spark.createDataFrame(
        [(a, a) for a, _ in rows], "lang string, source string"
    )
    assert mutual_information(same, "lang", "source").collect()[0]["nmi"] == 1.0

    # independent uniform columns: MI == 0 exactly (every ratio is 1)
    ind = spark.createDataFrame(
        [(a, b) for a in "ab" for b in "xy"] * 3, "lang string, source string"
    )
    assert mutual_information(ind, "lang", "source").collect()[0]["mi"] == 0.0


def test_sampled_quantiles_by_matches_python_reference(spark):
    """Grouped sampled quantiles vs the python mirror: per-group k-min
    sample by (h, v), rank by (v, h), nearest-rank-lower — including an
    under-full group whose quantiles are exact."""
    import hashlib

    from pyspark.sql import functions as F

    from migdar_data_pipelines_spark.operators.sketches import (
        KMV_HEX_DIGITS,
        sampled_quantiles_by,
    )

    K = 64
    rows = [("a", i, float((i * 37) % 1009)) for i in range(3000)] + [
        ("b", 10_000 + i, float(i)) for i in range(10)
    ]

    def fold(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:KMV_HEX_DIGITS], 16)

    probs = (0.5, 0.9)
    want = {}
    for g in ("a", "b"):
        cand = sorted(
            ((fold(i), v) for gg, i, v in rows if gg == g)
        )[:K]
        vals = sorted((v, h) for h, v in cand)
        for p in probs:
            want[(g, p)] = (len(vals), vals[int((len(vals) - 1) * p)][0])

    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        (r["g"], r["p"]): (r["sample_n"], r["q_value"])
        for r in sampled_quantiles_by(
            df, ["g"], "v", "id", probs=probs, k=K
        ).collect()
    }
    assert got == want
    assert got[("b", 0.5)] == (10, 4.0)  # under-full group: exact median


def test_winsorize_stats_matches_python_reference(spark):
    """winsorize_stats_by vs a python mirror on an under-full group (the
    sample IS the data, so bounds are the true quantiles): clip counts,
    bounds, and the exact decimal sum."""
    from decimal import Decimal

    from migdar_data_pipelines_spark.operators.sketches import winsorize_stats_by

    vals = [float(v) for v in range(1, 101)]  # 1..100 in one group
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    r = winsorize_stats_by(
        df, ["grp"], "v", "id", lo=0.05, hi=0.95, k=1024
    ).collect()[0]

    s = sorted(vals)
    lo_v = s[int((len(s) - 1) * 0.05)]   # nearest-rank-lower on the full set
    hi_v = s[int((len(s) - 1) * 0.95)]
    clipped = [min(max(v, lo_v), hi_v) for v in vals]
    assert (r["lo_v"], r["hi_v"]) == (lo_v, hi_v)
    assert r["n"] == 100
    assert r["n_clipped_low"] == sum(v < lo_v for v in vals)
    assert r["n_clipped_high"] == sum(v > hi_v for v in vals)
    assert r["sum_w"] == Decimal(f"{sum(clipped):.2f}")


def test_kmv_pairwise_overlap_matches_python_reference(spark):
    """kmv_sketch_by + kmv_pairwise_overlap vs a pure-Python mirror on
    three sources with controlled overlap: every unordered pair appears
    exactly once (g < g2) and each pair's estimates match the reference
    algebra; exactly-disjoint pairs estimate est_inter = 0."""
    import hashlib
    from itertools import combinations

    from migdar_data_pipelines_spark.operators.sketches import (
        KMV_HEX_DIGITS,
        KMV_K,
        KMV_SPACE,
        kmv_pairwise_overlap,
        kmv_sketch_by,
    )

    srcs = {
        "s_a": set(range(0, 3000)),
        "s_b": set(range(2000, 5000)),   # 1000 shared with s_a
        "s_c": set(range(9000, 9200)),   # disjoint from both
    }

    def fold(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:KMV_HEX_DIGITS], 16)

    def sk(vals):
        return sorted({fold(v) for v in vals})[:KMV_K]

    def est(s):
        return len(s) if len(s) < KMV_K else round((KMV_K - 1) * KMV_SPACE / s[-1], 4)

    def pair_ref(va, vb):
        a, b = sk(va), sk(vb)
        u = sorted(set(a) | set(b))[:KMV_K]
        ni = len([h for h in u if h in set(a) and h in set(b)])
        return {
            "est_a": est(a),
            "est_b": est(b),
            "est_union": est(u),
            "est_inter": round(ni / len(u) * est(u), 4),
        }

    rows = [(s, v) for s, vs in srcs.items() for v in vs]
    df = spark.createDataFrame(rows, "source string, val long")
    s = kmv_sketch_by(df, ["source"], "val")
    got = {(r["grp"], r["next_grp"]): r for r in kmv_pairwise_overlap(s, "source").collect()}

    assert set(got) == {(a, b) for a, b in combinations(sorted(srcs), 2)}
    for (ga, gb), r in got.items():
        want = pair_ref(srcs[ga], srcs[gb])
        for k_, v in want.items():
            assert r[k_] == v, (ga, gb, k_, r[k_], v)
    assert got[("s_a", "s_c")]["est_inter"] == 0.0
    assert got[("s_b", "s_c")]["est_inter"] == 0.0
    assert 400 < got[("s_a", "s_b")]["est_inter"] < 1800  # true 1000


def test_js_divergence_bounds_and_symmetry(spark):
    """Identical distributions -> 0; disjoint vocabularies -> 1 bit; value
    is independent of which group sorts first (symmetry is structural —
    pairs are unordered)."""
    from migdar_data_pipelines_spark.operators.profile import js_divergence_by

    rows = (
        [("a", "x")] * 6 + [("a", "y")] * 2
        + [("b", "x")] * 3 + [("b", "y")] * 1   # same distribution as a
        + [("c", "zz")] * 4                      # disjoint vocab
    )
    df = spark.createDataFrame(rows, "g string, w string")
    got = {(r.group_a, r.group_b): r.jsd_bits
           for r in js_divergence_by(df, "g", "w").collect()}
    assert got[("a", "b")] == 0.0
    assert got[("a", "c")] == 1.0 and got[("b", "c")] == 1.0


def test_ols_trend_matches_numpy(spark):
    """The closed-form integer-moment slope/intercept equals numpy's
    lstsq on the same quantized points."""
    import numpy as np

    from migdar_data_pipelines_spark.plans.llm_queries import QUERIES

    out = {r.event_type: r for r in
           QUERIES["ols_trend_events"]["fn"](spark, "/root/testdata/sf0.001").collect()}
    import duckdb
    pts = duckdb.sql("""
      SELECT event_type,
             (epoch_us(ts) - 1704067200000000) // 60000000 AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM read_parquet('/root/testdata/sf0.001/events.parquet')
    """).fetchall()
    by = {}
    for et, x, y in pts:
        by.setdefault(et, []).append((x, y))
    for et, xy in by.items():
        a = np.array(xy, dtype=np.float64)
        slope, intercept = np.polyfit(a[:, 0], a[:, 1], 1)
        assert abs(out[et].slope_cents_per_min - slope) < 1e-4, et
        assert abs(out[et].intercept_cents - intercept) < 0.05, et
