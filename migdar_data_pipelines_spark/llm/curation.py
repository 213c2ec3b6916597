"""Corpus-curation operators a large-scale training-data pipeline needs on
top of dedup/similarity: PII redaction, repetition/quality signals, and
deterministic id-hash sampling & train/val splitting.

All pure column expressions (JVM-side, whole-stage codegen, zero shuffle at
100 TB — these run inside the scan stage) except the one Arrow-batched
integer counter ``_top_bigram_count`` (see its docstring: the expression
form is an interpreted per-row sort+fold), and every construct is restricted
to regex/arith features shared by Java regex and RE2 so the DuckDB oracles
mirror them exactly: no lookaround, no backrefs, hash arithmetic via md5 hex
digits rather than engine-specific hash functions.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textanalysis import words
from .._serde import register_self_contained

register_self_contained(__name__)

# Redaction patterns applied IN ORDER (more specific first — SSN before the
# generic phone run, email before hostname-ish text). Shared Java/RE2 syntax;
# the phone class spells out RE2's \s set (Java \s adds \x0b, which would let
# a vertical tab extend a phone span on the Spark side only).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9() \t\n\f\r.-]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace email/SSN/IPv4/phone spans with typed placeholder tokens —
    the standard pre-training scrub pass. Chained regexp_replace stays in
    codegen; pattern order is part of the contract (a redacted <SSN> must
    not be re-matched by the looser phone run)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts (the audit view of ``redact_pii``): counted on
    the progressively-redacted text with the same pattern order, so each
    span is attributed to exactly one kind, matching what redact_pii
    replaces."""
    c = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    for kind, pattern, repl in PII_PATTERNS:
        out[f"n_{kind}"] = F.size(F.regexp_extract_all(c, F.lit(pattern), 0)).cast(
            "long"
        )
        c = F.regexp_replace(c, pattern, repl)
    return out


@F.pandas_udf(T.LongType())
def _top_bigram_count(texts: pd.Series) -> pd.Series:
    """Exact per-document top-bigram occurrence count, Arrow-batched.

    Replaces the expression-tier ``array_sort`` + ``aggregate`` run fold:
    higher-order functions are interpreted (no whole-stage codegen), and the
    per-row O(n log n) sort plus a struct-allocating fold measured ~640s
    engine wall over the 50k-doc sf1 corpus — this counter loop is ~20x
    cheaper (the simhash_fast kernel-tier rule). Exactness: word split
    replicates ``words()``'s ``[ \\t\\n\\f\\r]+`` regex byte-for-byte,
    bigrams join with a single space, and the return is an exact INTEGER —
    the share ratio and its F.round stay JVM-side (python round is
    half-even; never round a contract surface Python-side)."""
    split = re.compile(r"[ \t\n\f\r]+").split
    out = []
    for t in texts:
        if t is None:
            out.append(0)
            continue
        ws = [w for w in split(t) if w != ""]
        if len(ws) < 2:
            out.append(0)
            continue
        best = 0
        counts: dict[str, int] = {}
        prev = ws[0]
        for w in ws[1:]:
            g = prev + " " + w
            c = counts.get(g, 0) + 1
            counts[g] = c
            if c > best:
                best = c
            prev = w
        out.append(best)
    return pd.Series(out, dtype="int64")


def repetition_stats(col: Column | str) -> dict[str, Column]:
    """Repetition signals (Gopher/FineWeb-style quality filters):

    * ``dup_line_frac`` — fraction of non-empty lines that are duplicates of
      an earlier line;
    * ``top_bigram_share`` — share of the most frequent word bigram among
      all bigrams (near-1.0 flags boilerplate/spam).

    Scan-local with zero shuffle; the top-bigram count comes from the
    Arrow-batched ``_top_bigram_count`` (exact integer; see its docstring
    for why not the interpreted array_sort+fold), the bigram denominator is
    the closed form max(n_words - 1, 0), and both ratios + rounds are plain
    JVM expressions.
    """
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(F.split(c, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines).cast("double")
    n_distinct = F.size(F.array_distinct(lines)).cast("double")
    dup_line_frac = F.when(
        n_lines > 0, F.round((n_lines - n_distinct) / n_lines, 4)
    ).otherwise(F.lit(0.0))

    n_w = F.size(words(c))
    n_grams = F.when(n_w >= 2, n_w - 1).otherwise(F.lit(0)).cast("double")
    top_count = _top_bigram_count(c).cast("double")
    top_bigram_share = F.when(
        n_grams > 0, F.round(top_count / n_grams, 4)
    ).otherwise(F.lit(0.0))
    return {"dup_line_frac": dup_line_frac, "top_bigram_share": top_bigram_share}


def chunk_text(col: Column | str, chunk_words: int = 100, overlap: int = 20) -> Column:
    """Split a document into overlapping word-window chunks (the standard
    long-document segmentation before tokenization: fixed window, fixed
    stride, last window ragged). Returns ``array<string>`` — callers
    ``posexplode`` to get (chunk_id, chunk) rows.

    Scan-local expression; the explode multiplies rows ~n_words/stride
    but carries no shuffle. Empty/whitespace docs produce zero chunks."""
    if overlap >= chunk_words:
        raise ValueError("overlap must be < chunk_words")
    c = F.col(col) if isinstance(col, str) else col
    ws = words(c)
    n = F.size(ws)
    stride = chunk_words - overlap
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(ws, s + 1, chunk_words), " ")
    )
    return F.when(n > 0, chunks).otherwise(F.array().cast("array<string>"))


def md5_bucket(col: Column | str, hex_digits: int = 6) -> Column:
    """Deterministic engine-portable bucket in [0, 16^hex_digits): the first
    ``hex_digits`` md5 hex chars of the stringified id as an integer.

    This is the sampling/split primitive: stable under repartitioning,
    re-runs, AND engines (DuckDB computes the identical value from the same
    md5 hex — unlike xxhash64, which is Spark-specific). 6 digits = 2^24
    buckets: sampling-rate granularity of 6e-8, and the hex->int fold is 6
    plan-time constants, still pure codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, hex_digits), 16, 10).cast(
        "long"
    )


def md5_bucket_sql(expr: str, hex_digits: int = 6) -> str:
    """The DuckDB mirror of ``md5_bucket`` (positional hex fold — DuckDB has
    no hex->int cast). Used by oracle SQL; kept next to the Spark form so
    they can only drift together."""
    terms = []
    for i in range(hex_digits):
        shift = 16 ** (hex_digits - 1 - i)
        terms.append(
            f"(strpos('0123456789abcdef', substr(md5(CAST({expr} AS VARCHAR)),{i + 1},1))-1)*{shift}"
        )
    return "(" + " + ".join(terms) + ")"


#: Knuth's multiplicative-hash constant — the weight scrambler for
#: hashed_classifier_sum. 4095 * K < 2^63, so the BIGINT product never
#: overflows in either engine.
_CLS_MULT = 2654435761


def hashed_classifier_sum(
    words_col: Column, hex_digits: int = 3, multiplier: int = _CLS_MULT
) -> Column:
    """fastText-style linear model scored IN THE SCAN: each token hashes to a
    feature bucket (md5 fold, 16^hex_digits features), each bucket carries a
    deterministic integer weight in [-space/2, space/2), and the document
    score is the weight sum — returned as the raw INTEGER sum so it is exact
    and summation-order-independent (a double accumulation would make the
    result depend on element order and engine libm, breaking both
    reproducibility and cross-engine parity). Callers derive
    ``logit = sum / (space * n_words)`` and ``keep = sum > 0`` — IEEE division
    of exact integers is correctly rounded, so those are engine-exact too.

    This is the shape of every production quality/language/toxicity filter
    over a 100 TB corpus: broadcast-free (weights are arithmetic, a real
    model would broadcast a weight array), zero shuffle, whole-stage codegen
    end to end. Swapping the arithmetic weight for a trained vector lookup
    changes one lambda."""
    space = 16**hex_digits
    return F.aggregate(
        F.transform(
            words_col,
            lambda w: F.pmod(
                F.conv(F.substring(F.md5(F.lower(w)), 1, hex_digits), 16, 10).cast(
                    "long"
                )
                * F.lit(multiplier),
                F.lit(space),
            )
            - F.lit(space // 2),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hashed_classifier_sum_sql(
    words_expr: str, hex_digits: int = 3, multiplier: int = _CLS_MULT
) -> str:
    """DuckDB mirror of ``hashed_classifier_sum`` (kept adjacent so they can
    only drift together). list_sum of integers is exact; cast from HUGEINT."""
    space = 16**hex_digits
    bucket = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(lower(w)),{i + 1},1))-1)"
        f"*{16 ** (hex_digits - 1 - i)}"
        for i in range(hex_digits)
    )
    return (
        f"CAST(coalesce(list_sum(list_transform({words_expr}, "
        f"w -> (({bucket}) * {multiplier}) % {space} - {space // 2})), 0) AS BIGINT)"
    )


#: Query parameters stripped by normalize_url — the standard tracking set.
TRACKING_PARAMS = r"(utm_[a-z]+|gclid|fbclid|ref)"


def normalize_url(col: Column | str) -> Column:
    """Canonical URL for web-corpus dedup: lowercase scheme+host, drop the
    fragment, strip tracking query params (TRACKING_PARAMS), collapse the
    leftover ``?&``/trailing ``?``/``&`` artifacts, drop a trailing slash on
    a non-root path. Pure regexp chain (no lookaround — the same pattern
    class the PII redactor commits to, so Java regex and RE2 agree), fully
    codegen'd in the scan: URL canonicalization at 100 TB is a zero-shuffle
    map, and the dedup it feeds is one hash-groupBy on the canon string."""
    c = F.col(col) if isinstance(col, str) else col
    # fragment first so '#' never shields params from the strips below
    c = F.regexp_replace(c, r"#.*$", "")
    prefix = F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(c, F.length(prefix) + 1, F.lit(1 << 30))
    c = F.concat(F.lower(prefix), rest)
    c = F.regexp_replace(c, r"([?&])" + TRACKING_PARAMS + r"=[^&#]*", "$1")
    c = F.regexp_replace(c, r"\?&+", "?")
    c = F.regexp_replace(c, r"&&+", "&")
    c = F.regexp_replace(c, r"[?&]+$", "")
    c = F.regexp_replace(c, r"(://[^/]+/.+?)/+$", "$1")
    return c


def normalize_url_sql(expr: str) -> str:
    """DuckDB mirror of ``normalize_url`` (RE2: global flag 'g' is explicit,
    backrefs are ``\\1``). Kept adjacent so the chains can only drift
    together."""
    c = f"regexp_replace({expr}, '#.*$', '', 'g')"
    prefix = f"regexp_extract({c}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)"
    c = f"lower({prefix}) || substr({c}, len({prefix}) + 1)"
    c = f"regexp_replace({c}, '([?&]){TRACKING_PARAMS}=[^&#]*', '\\1', 'g')"
    c = f"regexp_replace({c}, '\\?&+', '?', 'g')"
    c = f"regexp_replace({c}, '&&+', '&', 'g')"
    c = f"regexp_replace({c}, '[?&]+$', '', 'g')"
    c = f"regexp_replace({c}, '(://[^/]+/.+?)/+$', '\\1', 'g')"
    return c


def bloom_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """Decontamination against a BLOOM FILTER of the benchmark's n-grams —
    the space-bounded form of :func:`decontaminate` for when the eval-suite
    gram set itself is too large to broadcast as strings: the filter is
    ``k_hashes * |grams|`` distinct bit positions in [0, m_bits), integers,
    ~50x smaller than the grams.

    The filter is held as a RELATION of set bits (not a packed bitset): a
    probe gram is "in" the filter iff all k of its md5-derived positions
    join the broadcast bit table — plain equi-joins, portable to the oracle,
    and the bit table stays the broadcast side at any corpus size. False
    positives are INHERENT to bloom semantics and deterministic here (md5
    positions), so engine and oracle agree on every hit, true or false.

    Returns (id, n_grams, n_bloom_hits, contaminated); compare with
    :func:`decontaminate`'s exact counts to measure the realized FP rate.
    """
    from .dedup import shingles

    def positions(gram: Column) -> Column:
        return F.array(
            *[
                F.pmod(
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(f"{i}:"), gram)), 1, 5),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(m_bits),
                )
                for i in range(k_hashes)
            ]
        )

    bench_grams = (
        bench.select(F.explode(shingles(text_col, n)).alias("g")).distinct()
    )
    bits = (
        bench_grams.select(F.explode(positions(F.col("g"))).alias("bit"))
        .distinct()
        .withColumn("__set", F.lit(1))
    )
    doc_grams = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("g")
    ).distinct()
    probe = doc_grams.select(
        "id", "g", F.explode(positions(F.col("g"))).alias("bit")
    )
    hits = (
        probe.join(F.broadcast(bits), "bit", "left")
        .groupBy("id", "g")
        .agg((F.sum(F.coalesce("__set", F.lit(0))) == k_hashes).alias("in_bloom"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.col("in_bloom").cast("long")).cast("long").alias("n_bloom_hits"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_bloom_hits", F.lit(0)).cast("long").alias("n_bloom_hits"),
            (F.coalesce("n_bloom_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def deterministic_sample(col: Column | str, fraction: float, hex_digits: int = 6) -> Column:
    """Boolean keep-predicate sampling ``fraction`` of rows by id hash.
    Unlike ``DataFrame.sample`` this is stable across partitioning, retries,
    and engines — the property a reproducible data pipeline needs."""
    space = 16**hex_digits
    return md5_bucket(col, hex_digits) < int(fraction * space)


def train_val_split(col: Column | str, val_fraction: float = 0.1, hex_digits: int = 6) -> Column:
    """'train'/'val' assignment by id hash: the val set is the TOP tail of
    the bucket space so growing val_fraction only MOVES docs train->val
    (nested splits, the standard holdout-stability property)."""
    space = 16**hex_digits
    threshold = int((1.0 - val_fraction) * space)
    return F.when(
        md5_bucket(col, hex_digits) < threshold, F.lit("train")
    ).otherwise(F.lit("val"))


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag every training document that shares at
    least one word n-gram with an evaluation/benchmark corpus — the standard
    guard against test-set leakage into training data (the n=13 variant is
    the common published recipe; n is a parameter).

    Output: ``docs`` + ``n_contaminated_grams`` (count of the doc's DISTINCT
    n-grams that appear anywhere in the benchmark) + ``contaminated`` bool.

    Scale shape (100 TB corpus vs kilobyte-scale benchmarks): the benchmark
    gram set is exploded, deduplicated, and BROADCAST — eval suites are tiny
    compared to any training corpus, so the contamination check is a
    broadcast hash join inside the corpus scan stage. The only shuffle is the
    per-doc hit count aggregation, which carries HIT rows only (rare by
    construction), and the final attach joins that dimension-sized hit table
    back on doc id. No corpus-sized wide exchange anywhere."""
    from .dedup import shingles

    bench_grams = (
        bench.select(F.explode(shingles(bench_text_col, n)).alias("gram")).distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("__did"), F.explode(shingles(text_col, n)).alias("gram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("__did")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        docs.join(hits, docs[id_col] == hits["__did"], "left")
        .drop("__did")
        .withColumn(
            "n_contaminated_grams",
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0)).cast("long"),
        )
        .withColumn("contaminated", F.col("n_contaminated_grams") > 0)
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    hex_digits: int = 6,
) -> DataFrame:
    """Deterministic source mixing: keep each row with its source's sampling
    fraction (a weight in [0, 1]) — how a training mix like "50% web, 100%
    books, 20% code" is materialized. Sources absent from ``weights`` are
    dropped (explicit mix only).

    The keep decision hashes ``id:source`` through the engine-portable md5
    fold (``md5_bucket``), so the mix is stable across partitioning, retries,
    and engines, and INDEPENDENT of the train/val split hash (which folds the
    bare id — salting with the source decorrelates the two decisions). Pure
    scan-local predicate: zero shuffle at any corpus size."""
    c = F.lit(None).cast("double")
    for src, w in sorted(weights.items()):
        c = F.when(F.col(source_col) == src, F.lit(float(w))).otherwise(c)
    space = 16**hex_digits
    salted = F.concat_ws(":", F.col(id_col).cast("string"), F.col(source_col))
    keep = md5_bucket(salted, hex_digits) < (c * space).cast("long")
    return df.filter(keep)


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    shard_col: str,
    order_col: str,
    capacity: int = 512,
) -> DataFrame:
    """Sequence packing: concatenate documents in deterministic
    (shard, order) order and cut fixed-``capacity`` context windows — the
    standard "concat and chunk" step that turns a ragged document corpus
    into dense fixed-length training sequences with no padding waste.

    Adds per row: ``seq_index`` (which window the doc STARTS in),
    ``offset_in_seq`` (token offset of the doc inside that window), and
    ``crosses_boundary`` (the doc spills into the next window — the rows a
    downstream attention-masking or resplit step needs to look at).

    Scale shape: one window cumsum PARTITIONED BY the shard — packing is
    per-shard by construction (each training worker consumes one shard's
    stream), so the sort is a hash-exchange on shard + in-partition sort,
    never a global single-partition window. Shards are how real pipelines
    parallelize this exact step; an unsharded global pack would serialize
    the corpus through one task at any scale."""
    w = Window.partitionBy(shard_col).orderBy(order_col)
    end = F.sum(F.col(tokens_col)).over(w)  # inclusive running token count
    start = end - F.col(tokens_col)
    cap = F.lit(capacity)
    return (
        df.withColumn("seq_index", F.floor(start / cap).cast("long"))
        .withColumn("offset_in_seq", (start % cap).cast("long"))
        .withColumn(
            "crosses_boundary",
            F.floor((end - 1) / cap) > F.floor(start / cap),
        )
    )


__all__ = [
    "PII_PATTERNS",
    "redact_pii",
    "pii_counts",
    "repetition_stats",
    "chunk_text",
    "md5_bucket",
    "md5_bucket_sql",
    "hashed_classifier_sum",
    "hashed_classifier_sum_sql",
    "deterministic_sample",
    "train_val_split",
    "decontaminate",
    "mix_sources",
    "pack_sequences",
]


def stratified_fixed_n(
    df,
    group_col: str,
    id_col: str,
    n_per_group: int,
    hex_digits: int = 6,
):
    """Exactly-N-per-group deterministic sampling: within each group, rank
    rows by their md5 id-hash (with the id as tie-break) and keep the first
    ``n_per_group`` — the balanced-eval-set / per-source-cap primitive that
    fraction-based sampling (``deterministic_sample``, ``mix_sources``)
    cannot express (a fraction drifts with group size; a cap doesn't).

    The hash order is uniform-random-LIKE but stable across partitioning,
    retries, and engines, so the selected set is reproducible and adding
    rows to a group only swaps members whose hash falls inside the cut.
    One window shuffle keyed by group; groups larger than executor memory
    don't matter (row_number is streaming) — but a HOT group still funnels
    to one task, so at extreme skew pre-filter with an approximate
    per-group hash threshold before the exact window."""
    from pyspark.sql import Window, functions as F  # noqa: F811

    w = Window.partitionBy(group_col).orderBy(
        md5_bucket(id_col, hex_digits), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_group)
        .drop("__rk")
    )


def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], k: int = 10
) -> DataFrame:
    """Privacy-risk audit over quasi-identifier columns — the re-identification
    check a training-data release runs next to PII redaction: rows whose
    quasi-identifier combination is shared by fewer than ``k`` records are
    re-identifiable by linkage (Sweeney's k-anonymity). Returns the
    equivalence-CLASS-SIZE histogram: one row per observed class size with
    the number of classes, the rows they hold, and whether that size is
    below the ``k`` threshold — the curve an anonymization reviewer reads
    (the summary "x% of rows at risk" is one filtered sum over it).

    Shape at scale: one groupBy over the quasi-identifiers (map-side
    combinable) to size the classes, then a groupBy over the CLASS frame
    (at most one row per distinct QI combination) to histogram the sizes —
    the second pass never touches the corpus. No windows, nothing
    collected."""
    cls = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("__sz"))
    return (
        cls.groupBy(F.col("__sz").alias("class_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_classes"))
        .select(
            F.col("class_size").cast("long").alias("class_size"),
            "n_classes",
            (F.col("class_size") * F.col("n_classes"))
            .cast("long")
            .alias("n_rows"),
            (F.col("class_size") < k).alias("below_k"),
        )
    )


def k_anonymity_sql(
    rows_sql: str, qi_exprs: list[str], k: int = 10
) -> str:
    """Generated DuckDB mirror of ``k_anonymity_report``."""
    qi = ", ".join(qi_exprs)
    return f"""
WITH rows_in AS ({rows_sql}),
cls AS (SELECT {qi}, count(*) AS sz FROM rows_in GROUP BY {qi})
SELECT CAST(sz AS BIGINT) AS class_size,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sz * count(*) AS BIGINT) AS n_rows,
       sz < {k} AS below_k
FROM cls GROUP BY sz
"""


def l_diversity_report(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, l: int = 3
) -> DataFrame:
    """The companion audit to :func:`k_anonymity_report` (Machanavajjhala's
    l-diversity): a quasi-identifier class can be large enough for
    k-anonymity yet still leak — if every record in the class shares the
    SAME sensitive value, linkage reveals it without identifying the row
    (the homogeneity attack). Per QI equivalence class this counts the
    DISTINCT sensitive values; the output is the l-value histogram — one
    row per observed distinct-count with the number of classes, the rows
    they hold, and the below-``l`` flag (classes an anonymization reviewer
    must generalize or suppress).

    Shape at scale: three map-side-combinable groupBys, each over a frame
    no larger than the previous one's output — (QI, sensitive) cells from
    the corpus scan, classes from the cell frame, the histogram from the
    class frame. No count_distinct expansion, no windows, nothing
    collected."""
    cells = df.groupBy(*qi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    cls = cells.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("__l"),
        F.sum("__n").alias("__sz"),
    )
    return (
        cls.groupBy(F.col("__l").alias("l_value"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("__sz").cast("long").alias("n_rows"),
        )
        .select(
            F.col("l_value").cast("long").alias("l_value"),
            "n_classes",
            "n_rows",
            (F.col("l_value") < l).alias("below_l"),
        )
    )


def l_diversity_sql(
    rows_sql: str, qi_exprs: list[str], sensitive_expr: str, l: int = 3
) -> str:
    """Generated DuckDB mirror of ``l_diversity_report``."""
    qi = ", ".join(qi_exprs)
    return f"""
WITH rows_in AS ({rows_sql}),
cells AS (SELECT {qi}, {sensitive_expr} AS sv, count(*) AS n
          FROM rows_in GROUP BY {qi}, {sensitive_expr}),
cls AS (SELECT {qi}, count(*) AS lv, sum(n) AS sz
        FROM cells GROUP BY {qi})
SELECT CAST(lv AS BIGINT) AS l_value,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(sz) AS BIGINT) AS n_rows,
       lv < {l} AS below_l
FROM cls GROUP BY lv
"""


# C4 cleaning thresholds (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning…", §2.2): line kept iff it ends in terminal punctuation,
# has >= 5 words, and doesn't mention javascript; page dropped iff it has a
# curly brace, the string "lorem ipsum", or fewer than C4_MIN_KEPT_LINES
# surviving lines. The terminal set is the paper's {. ! ? "}.
C4_TERMINAL_RE = r'[.!?"]$'
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3


def _c4_line_keep(line: Column) -> Column:
    n_words = F.size(
        F.filter(F.split(line, r"[ \t\n\f\r]+"), lambda w: w != "")
    )
    return (
        F.regexp_like(line, F.lit(C4_TERMINAL_RE))
        & (n_words >= C4_MIN_LINE_WORDS)
        & ~F.contains(F.lower(line), F.lit("javascript"))
    )


def c4_clean(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style line + page cleaning (Raffel et al. 2020 §2.2) — the
    standard first pass of a web-scale training-data pipeline, before any
    dedup: per line keep only sentences that end in terminal punctuation,
    have >= C4_MIN_LINE_WORDS words, and don't mention "javascript"; drop
    the whole page when the raw text contains ``{`` or "lorem ipsum", or
    when fewer than C4_MIN_KEPT_LINES lines survive.

    Pure column expressions over ``split``/``filter``/``array_join`` higher-
    order functions: zero shuffle at 100 TB — the whole operator runs inside
    the scan stage, one pass per document, and the page-drop predicate prunes
    before any downstream dedup pays for the text. ``cleaned_text`` is the
    surviving lines re-joined with ``\\n`` (empty when the page is dropped),
    so a gate can hash the rebuilt text and prove both the keep decisions and
    the reassembly order.

    Output: (id, n_lines, n_kept, keep_doc, cleaned_text).
    """
    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    kept = F.filter(lines, _c4_line_keep)
    n_kept = F.size(kept)
    keep_doc = (
        (n_kept >= C4_MIN_KEPT_LINES)
        & ~F.contains(c, F.lit("{"))
        & ~F.contains(F.lower(c), F.lit("lorem ipsum"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        keep_doc.alias("keep_doc"),
        F.when(keep_doc, F.array_join(kept, "\n")).otherwise(F.lit("")).alias(
            "cleaned_text"
        ),
    )


def c4_clean_sql(rows_sql: str, text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """Generated DuckDB mirror of :func:`c4_clean` — kept adjacent so the
    line predicate and page predicate can only drift together."""
    keep = (
        "regexp_matches(x, '[.!?\"]$')"
        " AND len(list_filter(string_split_regex(x, '[ \\t\\n\\f\\r]+'),"
        " w -> w <> '')) >= " + str(C4_MIN_LINE_WORDS) +
        " AND NOT contains(lower(x), 'javascript')"
    )
    return f"""
WITH c4_in AS ({rows_sql}),
c4_lines AS (
  SELECT {id_expr} AS id, {text_expr} AS text,
         list_filter(list_transform(string_split({text_expr}, chr(10)),
                     x -> trim(x)), x -> x <> '') AS lines
  FROM c4_in
),
c4_kept AS (
  SELECT id, text, lines,
         list_filter(lines, x -> {keep}) AS kept
  FROM c4_lines
)
SELECT id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       len(kept) >= {C4_MIN_KEPT_LINES}
         AND NOT contains(text, '{{')
         AND NOT contains(lower(text), 'lorem ipsum') AS keep_doc,
       CASE WHEN len(kept) >= {C4_MIN_KEPT_LINES}
              AND NOT contains(text, '{{')
              AND NOT contains(lower(text), 'lorem ipsum')
            THEN array_to_string(kept, chr(10)) ELSE '' END AS cleaned_text
FROM c4_kept
"""


#: Characters :func:`unicode_clean` removes outright — C0 controls except
#: tab/newline, DEL, the zero-width set U+200B–U+200D, and the BOM/ZWNBSP
#: U+FEFF. An EXPLICIT class (not "category Cc/Cf") so the Java-regex engine
#: side and the RE2 oracle side strip byte-identical sets.
UNICODE_STRIP_RE = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\x{200B}-\\x{200D}\\x{FEFF}]"
)


@F.pandas_udf(T.StringType())
def _nfc_normalize(texts: pd.Series) -> pd.Series:
    """Unicode NFC normalization, Arrow-batched. NFC is the one step of
    :func:`unicode_clean` no JVM built-in expresses (Spark has no
    normalization function); everything else in the chain stays JVM-side
    regexp. Both this and the oracle's ``nfc_normalize()`` implement the
    Unicode-standard canonical composition, so they agree wherever their
    Unicode table versions overlap — pin fixtures to long-stable sequences
    (e.g. e + COMBINING ACUTE -> U+00E9) rather than newly-assigned
    codepoints."""
    import unicodedata

    return texts.map(
        lambda t: None if t is None else unicodedata.normalize("NFC", t)
    )


def unicode_clean(col: Column | str) -> Column:
    """Canonical text cleanup for a multi-source training corpus: (1) NFC
    normalization (Arrow-batched pandas UDF — see :func:`_nfc_normalize`),
    then JVM-side (2) strip the :data:`UNICODE_STRIP_RE` control/zero-width
    set, (3) NBSP -> space, (4) collapse runs of spaces/tabs to one space,
    (5) trim. Scan-local with zero shuffle at 100 TB; the Python hop carries
    one string column through Arrow once, and every rule after it is a
    codegen'd regexp on the JVM."""
    c = F.col(col) if isinstance(col, str) else col
    c = _nfc_normalize(c)
    c = F.regexp_replace(c, UNICODE_STRIP_RE, "")
    c = F.regexp_replace(c, "\u00a0", " ")
    c = F.regexp_replace(c, r"[ \t]{2,}", " ")
    return F.trim(c)


def unicode_clean_sql(expr: str) -> str:
    """Generated DuckDB mirror of :func:`unicode_clean` (RE2 spells the
    same explicit strip class; 'g' flag is explicit)."""
    c = f"nfc_normalize({expr})"
    c = f"regexp_replace({c}, '{UNICODE_STRIP_RE}', '', 'g')"
    c = f"regexp_replace({c}, chr(160), ' ', 'g')"
    c = f"regexp_replace({c}, '[ \\t]{{2,}}', ' ', 'g')"
    return f"trim({c})"
