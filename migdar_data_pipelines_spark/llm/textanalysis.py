"""Text-analysis operators over a document column: token counting, quality
scoring, language ID, fingerprinting.

All pure column expressions (JVM-side, whole-stage codegen) — at 100 TB these
run inside the scan stage with zero shuffle; every one generalizes the
reference's scalar text ops (C5-C9, C16).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | single digits | punctuation glyphs
# (GPT-2-style contraction/space handling stripped down to a portable regex).
BPE_ISH_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

WORD_SPLIT_RE = r"\s+"


def words(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.trim(c), WORD_SPLIT_RE)
    return F.filter(arr, lambda x: x != "")


def token_stats(col: Column | str) -> dict[str, Column]:
    """Whitespace word count + BPE-ish regex token count + char count."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "n_chars": F.length(c).cast("long"),
        "n_words": F.size(words(c)).cast("long"),
        "n_tokens": F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0)).cast("long"),
    }


STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def quality_score(col: Column | str) -> Column:
    """Heuristic quality in [0,1]: blends length, mean word length, stopword
    ratio and punctuation ratio (the classic Gopher/C4-style filters folded
    into one score). Deterministic, SQL-expressible, rounded to 4dp."""
    c = F.col(col) if isinstance(col, str) else col
    ws = words(c)
    n_words = F.size(ws).cast("double")
    n_chars = F.length(c).cast("double")
    mean_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_words > 0,
        F.size(F.filter(ws, lambda x: F.lower(x).isin(*STOPWORDS))).cast("double") / n_words,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0,
        F.size(F.regexp_extract_all(c, F.lit(r"[^A-Za-z0-9\s]"), 0)).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    length_term = F.least(n_words / F.lit(100.0), F.lit(1.0))
    word_len_term = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    stop_term = F.least(stop_ratio * 5.0, F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
    score = 0.25 * (length_term + word_len_term + stop_term + punct_term)
    return F.round(score, 4)


# tiny per-language marker lists (n-gram heuristic reduced to word unigrams —
# deterministic and portable; swap for real profiles in production)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
}


def language_id(col: Column | str) -> Column:
    """Marker-word language ID: argmax over per-language hit counts, ties and
    zero-evidence -> 'und'. The structure (score per language -> argmax) is
    the real n-gram-profile algorithm; the profiles are pluggable."""
    ws = words(col)

    def marker_hits(markers: tuple[str, ...]) -> Column:
        # one-arg lambda only: pyspark treats a 2-param lambda as (value, idx)
        return F.size(F.filter(ws, lambda x: F.lower(x).isin(*markers)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    # deterministic tie-break: first language in declaration order wins
    expr = None
    for lang in LANG_MARKERS:
        cond = (scores[lang] == best) & (best > 0)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def doc_fingerprint(col: Column | str) -> Column:
    """OpenRefine-style fingerprint: md5 of the sorted distinct lowercased
    words — canonicalizes word order and duplication for clustering
    (generalizes C17's md5 doc ids, datasets.py:430-436)."""
    ws = words(col)
    canon = F.array_join(F.array_sort(F.array_distinct(F.transform(ws, F.lower))), " ")
    return F.md5(canon)


def unigram_lm_scores(df, text_col: str, id_col: str):
    """CCNet-style LM quality scoring (Wenzek et al. 2020): score each
    document by its per-token negative log-likelihood under a unigram
    language model estimated from the corpus itself, add-one smoothed:

        P(w) = (count(w) + 1) / (total_tokens + vocab_size)
        nll(doc) = avg over tokens of -ln P(w)

    CCNet ranks Common Crawl documents by KenLM perplexity and keeps the
    low-perplexity head; the unigram form is the engine-native rung of that
    ladder (the probabilities are exact rationals from two corpus
    aggregates, so any engine reproduces them bit-for-bit; only the final
    ln/avg is floating point, rounded for the contract surface).

    Shape at scale: token explode -> map-side-combinable word-count
    aggregate (vocab-sized result), a 1-row (total, vocab) aggregate
    cross-joined in, and the count table joined back to tokens — explicitly
    broadcast here since real vocabularies (1e6-1e8 terms) fit executor
    memory; beyond that, drop the hint and let the shuffle join on the word
    key do it. Per-doc avg is again map-side combinable. No sorts.
    """
    from pyspark.sql import DataFrame, functions as F  # noqa: F811

    from ..operators.caching import scoped_persist

    # toks feeds both the vocabulary aggregate and the scoring join; persist
    # so the corpus split+explode runs once per invocation
    toks = scoped_persist(
        df.select(F.col(id_col).alias("id"), F.explode(words(text_col)).alias("w"))
    )
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    totals = counts.agg(
        F.sum("cw").alias("total_toks"), F.count(F.lit(1)).alias("vocab")
    )
    model = F.broadcast(counts.crossJoin(F.broadcast(totals)))
    scored = toks.join(model, "w")
    nll = -F.log((F.col("cw") + 1) / (F.col("total_toks") + F.col("vocab")))
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg(nll), 4).alias("nll"),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(col: Column | str) -> dict[str, Column]:
    """The published Gopher document-quality rules (Rae et al. 2021 §A1.1)
    as per-rule booleans plus their counters — the rule set web-corpus
    pipelines apply verbatim, kept ENGINE-EXACT by doing every ratio test as
    a CROSS-MULTIPLIED INTEGER comparison (``10*n_sym <= n_words`` instead of
    ``n_sym/n_words <= 0.1``): integer counts compare identically in any
    engine, where a float ratio at the boundary depends on division rounding.

    Rules: word count in [50, 100000]; mean word length in [3, 10]
    (3*n_words <= word_chars <= 10*n_words); symbol-to-word ratio <= 0.1
    applied to EACH symbol type separately — '#' characters and ellipses
    (ASCII '...' occurrences plus the Unicode HORIZONTAL ELLIPSIS U+2026),
    per the paper's per-symbol phrasing; bullet-starting lines <= 90%;
    ellipsis-ending lines <= 30% (either ellipsis form); >= 80% of words
    contain an alphabetic character; >= 2 distinct-occurrence stopword
    hits. ``keep`` is the AND. All scan-local expressions — at 100 TB this
    is a free rider on any scan.
    """
    c = F.col(col) if isinstance(col, str) else col
    ws = words(c)
    n_words = F.size(ws).cast("long")
    word_chars = F.aggregate(
        F.transform(ws, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_hash = (
        F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    ).cast("long")
    # '...' occurrences (greedy non-overlapping replace, same in any engine)
    # plus the single-char Unicode ellipsis
    n_ellipsis = (
        (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / 3
        + (F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit(""))))
    ).cast("long")
    lines = F.filter(F.split(c, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda x: F.substring(F.ltrim(x), 1, 1).isin("-", "*"),
        )
    ).cast("long")
    n_ell_end = F.size(
        F.filter(
            lines,
            lambda x: F.rtrim(x).endswith("...")
            | F.rtrim(x).endswith("…"),
        )
    ).cast("long")
    n_alpha_words = F.size(
        F.filter(ws, lambda x: x.rlike("[A-Za-z]"))
    ).cast("long")
    n_stop = F.size(
        F.filter(ws, lambda x: F.lower(x).isin(*GOPHER_STOPWORDS))
    ).cast("long")

    rules = {
        "r_word_count": (n_words >= 50) & (n_words <= 100_000),
        "r_mean_word_len": (word_chars >= 3 * n_words)
        & (word_chars <= 10 * n_words),
        "r_symbol_ratio": (10 * n_hash <= n_words)
        & (10 * n_ellipsis <= n_words),
        "r_bullet_lines": 10 * n_bullet <= 9 * n_lines,
        "r_ellipsis_lines": 10 * n_ell_end <= 3 * n_lines,
        "r_alpha_words": 5 * n_alpha_words >= 4 * n_words,
        "r_stopwords": n_stop >= 2,
    }
    keep = None
    for r in rules.values():
        keep = r if keep is None else keep & r
    return {
        "n_words": n_words,
        "word_chars": word_chars,
        "n_hash": n_hash,
        "n_ellipsis": n_ellipsis,
        "n_lines": n_lines,
        "n_bullet_lines": n_bullet,
        "n_ellipsis_lines": n_ell_end,
        "n_alpha_words": n_alpha_words,
        "n_stopwords": n_stop,
        **rules,
        "keep": keep,
    }
