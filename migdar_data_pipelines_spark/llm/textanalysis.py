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
