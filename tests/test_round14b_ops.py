"""Round-14 curation additions: C4 line+page cleaning and Unicode NFC
canonicalization. Hand-computed fixtures covering every rule branch, plus
the NFC/Unicode edge cases the oracle comparison can't isolate."""

import hashlib

from pyspark.sql import functions as F


# ------------------------------------------------------------ c4_clean


def _c4(spark, rows):
    from migdar_data_pipelines_spark.llm.curation import c4_clean

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["id"]: r.asDict() for r in c4_clean(df).collect()}


def test_c4_line_rules(spark):
    """Line tier: terminal punctuation required, >= 5 words required,
    'javascript' (case-insensitive) banned; lines are trimmed first and
    blank lines don't count."""
    out = _c4(
        spark,
        [
            (
                1,
                "Good line with five words here.\n"
                "   \n"  # blank after trim: not a line at all
                "short line.\n"  # 2 words: dropped
                "no terminal punctuation on this line\n"  # dropped
                "This line mentions JavaScript somewhere here.\n"  # dropped
                "  Trailing-space line keeps its five words!  \n"  # trimmed, kept
                'Quoted terminal also counts as five words"',  # kept
            )
        ],
    )[1]
    assert out["n_lines"] == 6
    assert out["n_kept"] == 3
    assert out["keep_doc"] is True
    assert out["cleaned_text"] == (
        "Good line with five words here.\n"
        "Trailing-space line keeps its five words!\n"
        'Quoted terminal also counts as five words"'
    )


def test_c4_page_rules(spark):
    """Page tier: curly brace, lorem ipsum, and the min-kept-lines floor
    each drop the page on their own; dropped pages keep their line stats
    but emit empty cleaned text."""
    three_good = (
        "First good line with five words.\n"
        "Second good line with five words.\n"
        "Third good line with five words."
    )
    out = _c4(
        spark,
        [
            (1, three_good),
            (2, three_good + "\nvar x = { a: 1 }."),
            (3, three_good + "\nWe embed Lorem Ipsum right here."),
            (4, "Only two good lines survive here.\nSecond good line with five words."),
            (5, ""),
        ],
    )
    assert out[1]["keep_doc"] is True and out[1]["n_kept"] == 3
    assert out[2]["keep_doc"] is False and out[2]["cleaned_text"] == ""
    assert out[2]["n_kept"] == 4  # the brace line itself passes the line tier
    assert out[3]["keep_doc"] is False  # lorem ipsum, case-insensitive
    assert out[4]["keep_doc"] is False and out[4]["n_kept"] == 2
    assert out[5] == {
        "id": 5,
        "n_lines": 0,
        "n_kept": 0,
        "keep_doc": False,
        "cleaned_text": "",
    }


# ------------------------------------------------------- unicode_clean


def _uc(spark, texts):
    from migdar_data_pipelines_spark.llm.curation import unicode_clean

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    out = df.select("i", unicode_clean("text").alias("c")).collect()
    return [r["c"] for r in sorted(out, key=lambda r: r["i"])]


def test_unicode_nfc_composes(spark):
    """Decomposed e + COMBINING ACUTE (U+0065 U+0301) composes to U+00E9;
    already-composed input is untouched (NFC idempotence)."""
    got = _uc(spark, ["cafe\u0301", "caf\u00e9"])
    assert got == ["caf\u00e9", "caf\u00e9"]
    assert len(got[0]) == 4


def test_unicode_strip_set_and_whitespace(spark):
    """BEL/ZWSP/BOM vanish, NBSP becomes a space, space/tab runs collapse
    to one space, and the result is trimmed — while single interior tabs
    and newlines survive (the strip set is explicit, not category-wide)."""
    got = _uc(
        spark,
        [
            " bell\x07char\u200bzero\ufeff ",
            "a\u00a0b",
            "a\u00a0 b",  # NBSP + space -> two spaces -> collapse
            "  lots \t\t of   runs  ",
            "keep\tsingle\ttabs",
            "keep\nnewlines\nintact",
            None,
        ],
    )
    assert got == [
        "bellcharzero",
        "a b",
        "a b",
        "lots of runs",
        "keep\tsingle\ttabs",
        "keep\nnewlines\nintact",
        None,
    ]


def test_unicode_md5_is_over_utf8_bytes(spark):
    """The gate hashes the cleaned string; pin the md5 to the UTF-8 bytes
    of the composed form so an engine hashing UTF-16 or the decomposed
    form would fail loudly."""
    from migdar_data_pipelines_spark.llm.curation import unicode_clean

    df = spark.createDataFrame([(1, "cafe\u0301")], "i long, text string")
    got = df.select(F.md5(unicode_clean("text")).alias("h")).collect()[0]["h"]
    assert got == hashlib.md5("caf\u00e9".encode("utf-8")).hexdigest()


# -------------------------------------------------- perplexity_buckets


def _buckets(spark, rows):
    from migdar_data_pipelines_spark.llm.textanalysis import perplexity_buckets

    df = spark.createDataFrame(rows, "id long, n_tokens long, nll double")
    return {
        r["id"]: (r["cum_tokens"], r["bucket"])
        for r in perplexity_buckets(df).collect()
    }


def test_perplexity_buckets_equal_mass(spark):
    """Three equal-token docs in nll order land head/middle/tail; the
    exclusive-start rule puts each exactly at its third's opening offset."""
    got = _buckets(spark, [(1, 10, 0.1), (2, 10, 0.2), (3, 10, 0.3)])
    assert got == {1: (10, "head"), 2: (20, "middle"), 3: (30, "tail")}


def test_perplexity_buckets_best_doc_spans_boundaries(spark):
    """A best-scoring doc carrying >2/3 of the corpus tokens STARTS at
    offset 0, so it is head (the inclusive-cum rule would have mislabeled
    the corpus' best document as tail)."""
    got = _buckets(spark, [(1, 25, 0.1), (2, 3, 0.2), (3, 2, 0.3)])
    assert got[1] == (25, "head")
    assert got[2] == (28, "tail")  # starts at 25, 3*25 >= 2*30
    assert got[3] == (30, "tail")


def test_perplexity_buckets_nll_tie_breaks_on_id(spark):
    """Equal nll orders by id, so the cumulative sums — and the buckets —
    are deterministic under ties."""
    got = _buckets(spark, [(7, 10, 0.5), (3, 10, 0.5), (5, 10, 0.5)])
    assert got == {3: (10, "head"), 5: (20, "middle"), 7: (30, "tail")}
