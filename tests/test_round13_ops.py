"""Round-13 operators: quantized-residual IVF (IVF-PQ-style index tier with
exact float rerank), substring span-drop dedup, streaming curation composite.
Hand-computed fixtures + the equality/recall contracts VERDICT r12 asked for."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- IVF quantized residual


def test_ivf_pq_equals_nprobe_gate_corpus(spark, sf_dir):
    """VERDICT r12 #5 equality contract: on the gate corpus the quantized-
    residual route's exact-rerank output equals embedding_topk_ivf_nprobe
    row-for-row (the k*rerank cut keeps every true top-k candidate)."""
    from migdar_data_pipelines_spark.plans.llm_queries import (
        embedding_topk_ivf_nprobe,
        embedding_topk_ivf_pq,
    )

    a = sorted(map(tuple, embedding_topk_ivf_nprobe(spark, sf_dir).collect()))
    b = sorted(map(tuple, embedding_topk_ivf_pq(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_ivf_pq_learned_recall(spark):
    """Learned-centroid quantized route (ivf_build_and_search quantized=True)
    reaches recall >= 0.95 vs brute-force on the clustered corpus — the
    quantization tier must not cost recall once the rerank is exact."""
    from migdar_data_pipelines_spark.llm.similarity import (
        cosine_topk,
        ivf_build_and_search,
    )

    e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    clustered = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: (
                x + F.when(i == F.col("label"), F.lit(2.0)).otherwise(F.lit(0.0))
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    queries = clustered.filter("vec_id < 20")
    exact = cosine_topk(queries, clustered, "vec_id", "vec_id", k=5)
    exact_pairs = {(r["query_id"], r["neighbour_id"]) for r in exact.collect()}
    approx = ivf_build_and_search(
        queries, clustered, "vec_id", "vec_id", n_cells=16, k=5, seed=7,
        nprobe=4, quantized=True, rerank=4,
    )
    pairs = {(r["query_id"], r["neighbour_id"]) for r in approx.collect()}
    recall = len(exact_pairs & pairs) / len(exact_pairs)
    assert recall >= 0.95, recall


def test_residual_quantized_zero_residual_safe(spark):
    """The cell representative's own residual is exactly zero (scale 0) —
    the reconstruction must fall back to the reference vector instead of
    dividing by zero, and the vector must still be scoreable."""
    from migdar_data_pipelines_spark.llm.similarity import (
        residual_quantized_topk,
    )

    rows = [
        (0, [1.0, 0.0], 0, [1.0, 0.0]),       # rep member: residual == 0
        (1, [0.8, 0.6], 0, [1.0, 0.0]),
        (2, [0.6, 0.8], 0, [1.0, 0.0]),
    ]
    corpus = spark.createDataFrame(
        rows, "cid long, cv array<float>, ccell int, rv array<float>"
    )
    probes = spark.createDataFrame(
        [(9, [1.0, 0.0], 0)], "qid long, qv array<float>, qcell int"
    )
    out = {r["neighbour_id"]: r for r in
           residual_quantized_topk(probes, corpus, k=3, rerank=4).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["cosine"] == pytest.approx(1.0)
    assert out[0]["rank"] == 1
    assert out[1]["cosine"] == pytest.approx(0.8, abs=1e-4)


# ---------------------------------------------- substring dedup rewrite


def test_drop_duplicated_spans_hand_case(spark):
    """Keep-first semantics across docs: doc1 is the corpus-first occurrence
    of every gram (kept whole), its full copy doc2 is fully excised, and a
    doc embedding the shared region loses exactly that region."""
    from migdar_data_pipelines_spark.llm.dedup import drop_duplicated_spans

    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i j"),
        (3, "x y z a b c d e f q r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in
           drop_duplicated_spans(df, "text", "doc_id", k=4).collect()}
    assert out[1]["cleaned_text"] == "a b c d e f g h i j"
    assert out[1]["dropped_words"] == 0
    assert out[2]["cleaned_text"] == "" and out[2]["dropped_words"] == 10
    assert out[3]["cleaned_text"] == "x y z q r s"
    assert out[3]["dropped_words"] == 6


def test_drop_duplicated_spans_within_doc_repeat(spark):
    """A within-document repeat keeps its first copy and drops the second;
    a short doc (< k words) passes through untouched."""
    from migdar_data_pipelines_spark.llm.dedup import drop_duplicated_spans

    rows = [(1, "p q r s p q r s"), (2, "t u v")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in
           drop_duplicated_spans(df, "text", "doc_id", k=4).collect()}
    assert out[1]["cleaned_text"] == "p q r s"
    assert out[1]["dropped_words"] == 4
    assert out[2]["cleaned_text"] == "t u v"
    assert out[2]["dropped_words"] == 0


# ------------------------------------------------ streaming curation


def test_streaming_curate_cross_batch(spark, tmp_path):
    """Two micro-batches: batch 2 carries an exact copy and a near copy of a
    batch-1 doc (flagged via the standing parquet index) plus a fresh doc
    (admitted); a junk doc never reaches the verdict (filter stage)."""
    from migdar_data_pipelines_spark.streaming.curate import streaming_curate

    base_text = (
        "the quick brown fox jumps over the lazy dog and runs far away home"
    )
    b1 = [(1, base_text), (2, "completely different words " + "alpha beta gamma delta " * 4)]
    b2 = [
        (10, base_text),                       # exact copy of doc 1
        (11, base_text + " extra"),            # near copy (jaccard ~0.9)
        (12, "the wholly novel and original of is " + "zeta eta theta iota " * 4),
        (13, "short junk"),                    # fails min_words filter
    ]
    src = str(tmp_path / "src")
    for chunk in (b1, b2):
        spark.createDataFrame(chunk, "doc_id long, text string").sort(
            "doc_id"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming_curate(
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "out"),
        jaccard_threshold=0.8,
        query_name="t_curate_ut",
    )
    out = {r["id"]: r for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert 13 not in out                      # filtered out, no verdict row
    assert out[1]["admitted"] and not out[1]["dup_exact"]
    assert out[10]["dup_exact"] and not out[10]["admitted"]
    assert out[11]["near_dup"] and not out[11]["dup_exact"]
    assert not out[11]["admitted"]
    assert out[12]["admitted"]
    # the index holds every filtered doc (flagged dups included)
    idx_ids = {r["id"] for r in spark.read.parquet(str(tmp_path / "index")).collect()}
    assert idx_ids == {1, 2, 10, 11, 12}


# ---------------------------------------------- tokenizer fertility


def test_token_fertility_hand_case(spark, tmp_path):
    """fertility_bp = 1e4 * tokens/word, compression_bp = 1e4 * chars/token,
    exact half-up over corpus sums: en = {'ab cd', 'x, y'} -> chars 9,
    words 4, tokens 5 (ab|cd + x|,|y)."""
    import duckdb

    from migdar_data_pipelines_spark.plans.llm_queries import (
        QUERIES, token_fertility_by_lang,
    )

    rows = [(1, "ab cd", "en", "s", 5), (2, "x, y", "en", "s", 4),
            (3, "zz", "fr", "s", 2)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    p = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(p)
    import shutil, glob, os
    part = glob.glob(p + "/*.parquet")[0]
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    shutil.copy(part, flat + "/documents.parquet")
    out = {r["lang"]: r for r in token_fertility_by_lang(spark, flat).collect()}
    en = out["en"]
    assert (en["total_chars"], en["total_words"], en["total_tokens"]) == (9, 4, 5)
    assert en["fertility_bp"] == 12500        # half_up(1e4 * 5 / 4)
    assert en["compression_bp"] == 18000      # half_up(1e4 * 9 / 5)
    # oracle agrees on the same parquet
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{flat}/documents.parquet')")
    duck = {r[0]: r for r in con.execute(QUERIES["token_fertility_by_lang"]["sql"]).fetchall()}
    assert duck["en"][5] == 12500 and duck["en"][6] == 18000
