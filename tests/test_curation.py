"""Corpus-curation operators: PII redaction, repetition signals, md5-hash
sampling/splits (llm/curation.py)."""

import hashlib

from pyspark.sql import functions as F

from migdar_data_pipelines_spark.llm.curation import (
    deterministic_sample,
    md5_bucket,
    pii_counts,
    redact_pii,
    repetition_stats,
    train_val_split,
)


def test_redact_pii_kinds_and_order(spark):
    df = spark.createDataFrame(
        [
            (
                "mail a@b.co then ssn 123-45-6789 ip 10.0.0.7 "
                "phone +1 (555) 123-4567 end",
            )
        ],
        "text string",
    )
    out = df.select(redact_pii("text").alias("r")).first()["r"]
    assert "<EMAIL>" in out and "<SSN>" in out and "<IP>" in out and "<PHONE>" in out
    assert "a@b.co" not in out and "123-45-6789" not in out
    # order contract: the SSN was NOT consumed by the looser phone pattern
    assert out.count("<SSN>") == 1 and out.count("<PHONE>") == 1


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [("x@y.io and z@w.net, ssn 123-45-6789",), ("clean text",)],
        "text string",
    )
    counts = pii_counts("text")
    rows = df.select(
        counts["n_email"].alias("e"), counts["n_ssn"].alias("s")
    ).collect()
    assert (rows[0]["e"], rows[0]["s"]) == (2, 1)
    assert (rows[1]["e"], rows[1]["s"]) == (0, 0)


def test_repetition_stats_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "once\nupon\na time"),  # no dup lines
            (2, "same\nsame\nother"),  # 1 of 3 lines duplicate
            (3, "a b a b a b"),  # grams: ab ba ab ba ab -> top 3/5
        ],
        "id long, text string",
    )
    stats = repetition_stats("text")
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            stats["dup_line_frac"].alias("dlf"),
            stats["top_bigram_share"].alias("tbs"),
        ).collect()
    }
    assert rows[1]["dlf"] == 0.0
    assert abs(rows[2]["dlf"] - 1 / 3) < 1e-3
    assert abs(rows[3]["tbs"] - 0.6) < 1e-9


def test_md5_bucket_matches_hashlib(spark):
    rows = spark.range(50).select(
        "id", md5_bucket("id").alias("b")
    ).collect()
    for r in rows:
        expect = int(hashlib.md5(str(r["id"]).encode()).hexdigest()[:6], 16)
        assert r["b"] == expect


def test_sample_and_split_properties(spark):
    df = spark.range(20000)
    frac = df.filter(deterministic_sample("id", 0.25)).count() / 20000
    assert abs(frac - 0.25) < 0.02
    # stability under repartitioning
    a = {r["id"] for r in df.filter(deterministic_sample("id", 0.1)).collect()}
    b = {
        r["id"]
        for r in df.repartition(17).filter(deterministic_sample("id", 0.1)).collect()
    }
    assert a == b
    # nested holdout: a smaller val set is a subset of a larger one
    v05 = {
        r["id"]
        for r in df.withColumn("s", train_val_split("id", 0.05))
        .filter("s = 'val'")
        .collect()
    }
    v10 = {
        r["id"]
        for r in df.withColumn("s", train_val_split("id", 0.10))
        .filter("s = 'val'")
        .collect()
    }
    assert v05 < v10
    assert abs(len(v10) / 20000 - 0.10) < 0.02


def test_chunk_text_windows(spark):
    from migdar_data_pipelines_spark.llm.curation import chunk_text

    text = " ".join(f"w{i}" for i in range(250))
    df = spark.createDataFrame([(text,), ("",), ("   ",)], "text string")
    rows = df.select(chunk_text("text", 100, 20).alias("c")).collect()
    chunks = rows[0]["c"]
    # stride 80 over 250 words -> starts 0,80,160,240 -> 4 chunks
    assert len(chunks) == 4
    assert chunks[0].split()[0] == "w0" and chunks[0].split()[-1] == "w99"
    assert chunks[1].split()[0] == "w80"  # 20-word overlap
    assert chunks[3].split() == [f"w{i}" for i in range(240, 250)]  # ragged tail
    assert rows[1]["c"] == [] and rows[2]["c"] == []

    import pytest

    with pytest.raises(ValueError):
        chunk_text("text", 50, 50)


def test_decontaminate_flags_shared_ngrams(spark):
    from migdar_data_pipelines_spark.llm.curation import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains bench 5-gram
            (2, "totally clean words none shared here at all"),
            (3, "short doc"),  # <5 words: whole-doc shingle, no collision
            (10, "alpha beta gamma delta epsilon"),  # the benchmark doc itself
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 10")
    out = {
        r.doc_id: (r.n_contaminated_grams, r.contaminated)
        for r in decontaminate(docs, bench, n=5).collect()
    }
    # doc 1 has 2 distinct 5-grams; one ("alpha..epsilon") is the bench doc
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)
    assert out[10] == (1, True)  # bench doc flags itself


def test_mix_sources_fractions_and_determinism(spark):
    from migdar_data_pipelines_spark.llm.curation import mix_sources

    rows = [(i, ["web", "books", "code"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = mix_sources(df, {"web": 1.0, "books": 0.5, "code": 0.0}).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert len(by_src.get("web", ())) == 1000  # weight 1.0 keeps everything
    assert "code" not in by_src  # weight 0.0 drops everything
    assert 400 <= len(by_src["books"]) <= 600  # ~half
    # unknown sources are dropped, not passed through
    extra = spark.createDataFrame([(1, "mystery")], "doc_id long, source string")
    assert mix_sources(extra, {"web": 1.0}).count() == 0
    # stable under partitioning
    kept2 = {
        (r.doc_id, r.source)
        for r in mix_sources(df.repartition(17), {"web": 1.0, "books": 0.5, "code": 0.0}).collect()
    }
    assert kept2 == {(r.doc_id, r.source) for r in kept}


def test_decontaminate_plan_broadcasts_bench(spark):
    """Plan shape: the benchmark gram set must reach the corpus through a
    BroadcastHashJoin (the property that keeps decontamination one scan at
    100 TB), never a sort-merge join of the full corpus gram explosion."""
    from migdar_data_pipelines_spark.llm.curation import decontaminate

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4} w{i+5}") for i in range(50)],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id % 10 = 0")
    plan = decontaminate(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    # the contamination join itself (keyed on gram) must be broadcast; the
    # final dimension-sized hit attach may plan as SMJ statically — AQE
    # upgrades it from real stage stats at runtime
    assert "BroadcastHashJoin [gram" in plan, plan


def test_mix_sources_plan_is_shuffle_free(spark):
    """mix_sources is a pure scan-local predicate — its physical plan must
    contain NO Exchange (the zero-shuffle claim, asserted not narrated)."""
    from migdar_data_pipelines_spark.llm.curation import mix_sources

    df = spark.createDataFrame(
        [(i, ["web", "books"][i % 2]) for i in range(100)],
        "doc_id long, source string",
    )
    out = mix_sources(df, {"web": 0.5, "books": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pack_sequences_arithmetic(spark):
    """Packing arithmetic on a hand-checked shard: window indices, offsets,
    boundary crossings, and the empty-doc edge (0 tokens never 'crosses')."""
    from migdar_data_pipelines_spark.llm.curation import pack_sequences

    rows = [  # (id, shard, tokens) — capacity 10
        (1, 0, 4),   # [0, 4)   seq 0 off 0
        (2, 0, 6),   # [4, 10)  seq 0 off 4, touches boundary but fits
        (3, 0, 0),   # [10,10)  empty: seq 1 off 0, no crossing
        (4, 0, 12),  # [10,22)  seq 1 off 0, crosses into seq 2
        (5, 0, 3),   # [22,25)  seq 2 off 2
        (6, 1, 11),  # other shard restarts at 0 and crosses
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n_tokens long")
    out = {
        r.doc_id: (r.seq_index, r.offset_in_seq, r.crosses_boundary)
        for r in pack_sequences(df, "n_tokens", "shard", "doc_id", capacity=10).collect()
    }
    assert out[1] == (0, 0, False)
    assert out[2] == (0, 4, False)  # ends exactly at the boundary: no cross
    assert out[3] == (1, 0, False)  # empty doc
    assert out[4] == (1, 0, True)
    assert out[5] == (2, 2, False)
    assert out[6] == (0, 0, True)  # shards pack independently


def test_normalize_url_edges(spark):
    """Corners the registered query's generator can't produce: root slash
    kept, schemeless passthrough, all-tracking query fully stripped, mixed
    params preserving order, multiple trailing slashes."""
    from migdar_data_pipelines_spark.llm.curation import normalize_url

    cases = {
        "HTTPS://WWW.Site.COM/": "https://www.site.com/",      # root slash kept
        "https://site.com/a/b///": "https://site.com/a/b",     # multi-slash
        "http://x.com/p?utm_source=a&utm_medium=b": "http://x.com/p",
        "http://x.com/p?a=1&utm_source=x&b=2#frag": "http://x.com/p?a=1&b=2",
        "http://x.com/p?gclid=9&fbclid=8&ref=t": "http://x.com/p",
        "not a url at all": "not a url at all",                # passthrough
        "ftp://Host.Org/File.TXT": "ftp://host.org/File.TXT",  # path case kept
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["canon"] for r in df.select("url", normalize_url("url").alias("canon")).collect()}
    assert got == cases


def test_normalize_url_sql_mirror(spark):
    """The generated DuckDB chain produces byte-identical canon URLs."""
    import duckdb

    from migdar_data_pipelines_spark.llm.curation import normalize_url, normalize_url_sql

    urls = [
        "HTTP://EXAMPLE3.COM/p/7/",
        "http://example3.com/p/7?utm_source=x&utm_campaign=y&id=7",
        "https://a.b/c?utm_a=1#z",
        "plain text",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    spark_out = [r["c"] for r in df.select(normalize_url("url").alias("c")).collect()]
    con = duckdb.connect()
    duck_out = [
        con.sql(
            f"SELECT {normalize_url_sql('u')} FROM (SELECT ? AS u)", params=[u]
        ).fetchone()[0]
        for u in urls
    ]
    assert spark_out == duck_out


def test_hashed_classifier_sum_exactness(spark):
    """Integer weight sum: permutation-invariant (exact arithmetic) and
    engine-mirrored via the generated SQL fragment."""
    import duckdb

    from migdar_data_pipelines_spark.llm.curation import (
        hashed_classifier_sum,
        hashed_classifier_sum_sql,
    )

    words = ["Alpha", "beta", "GAMMA", "delta", "beta"]
    perm = ["beta", "delta", "Alpha", "beta", "GAMMA"]
    df = spark.createDataFrame([(words,), (perm,)], "ws array<string>")
    sums = [r["s"] for r in df.select(hashed_classifier_sum(F.col("ws")).alias("s")).collect()]
    assert sums[0] == sums[1]  # order-independent
    con = duckdb.connect()
    duck = con.sql(
        f"SELECT {hashed_classifier_sum_sql('ws')} FROM (SELECT ? AS ws)",
        params=[words],
    ).fetchone()[0]
    assert sums[0] == duck


def test_l_diversity_report_histogram(spark):
    """l-diversity l-value histogram on a hand-built frame: a class that is
    k-anonymous (3 rows) but homogeneous (l=1) must flag below_l — the
    homogeneity attack k-anonymity alone misses."""
    from migdar_data_pipelines_spark.llm.curation import l_diversity_report

    rows = (
        [("A", "x")] * 3          # l=1: 3 rows, one sensitive value
        + [("B", "x"), ("B", "y")]  # l=2
        + [("C", "x"), ("C", "y"), ("C", "z"), ("C", "z")]  # l=3, 4 rows
    )
    df = spark.createDataFrame(rows, "qi string, sv string")
    got = {
        r.l_value: (r.n_classes, r.n_rows, r.below_l)
        for r in l_diversity_report(df, ["qi"], "sv", l=3).collect()
    }
    assert got == {1: (1, 3, True), 2: (1, 2, True), 3: (1, 4, False)}
