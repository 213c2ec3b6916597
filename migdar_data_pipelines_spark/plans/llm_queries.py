"""LLM-data-pipeline + streaming queries with DuckDB oracles.

Same registry/conventions as queries.py. The near-dup queries build a corpus
of documents unioned with perturbed copies (id+100000) so that each operator
has guaranteed positives with known ground truth; the oracle computes the
exact (blocking-free or identically-blocked) answer, which the Spark LSH path
must reproduce. Recall accounting for the LSH queries (16 hashes / 8 bands /
r=2): a pair at jaccard j collides in a band with probability j^2, so
P(miss all bands) = (1-j^2)^8 — ~2.6e-14 at the near-1.0 jaccard of the
synthesized dups, but as high as 2.8e-4 for a borderline pair at exactly the
0.8 threshold. The corpus' observed cross-doc pairs sit well above 0.9
(P(miss) < 3e-9); the group-assembly query, whose output is sensitive to ANY
missed edge, runs at 32 hashes / 16 bands (P(miss at 0.8) = 7.9e-8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..llm.curation import PII_PATTERNS, md5_bucket_sql
from ..session import local_df
from ..llm.dedup import (
    canonical_groups,
    exact_dedup,
    embedding_near_dup_matmul,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_blocked_kernel,
    ngram_jaccard_pairs_ppjoin,
    simhash,
)
from ..llm.multimodal import binary_features, documents_as_media
from ..llm.similarity import cosine_topk, ivf_topk
from ..llm.textanalysis import (
    doc_fingerprint,
    language_id,
    quality_score,
    quality_sql,
    token_stats,
)
from ..streaming.windows import sessionize, session_window_agg, sliding_agg, tumbling_agg
from .queries import QUERIES, _t, register

# DuckDB fragment: whitespace words of text (parity with textanalysis.words)
_W = r"list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '')"
# DuckDB fragment: exact-basis-point quality over a `words` column + `text`
# (parity with textanalysis.quality_score — single source of truth, four
# oracles inline it)
_QUALITY_W = quality_sql("words")
# DuckDB fragment: word 3-shingles (parity with dedup.shingles k=3)
_SH3 = (
    "CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')] "
    "ELSE list_distinct(list_transform(generate_series(1, len(words)-2), "
    "i -> array_to_string(list_slice(words, i, i+2), ' '))) END"
)
# DuckDB fragment: first-16-bit md5 word hash (parity with dedup.simhash)
_HEX16 = (
    "(strpos('0123456789abcdef', substr(md5(word),1,1))-1)*4096"
    " + (strpos('0123456789abcdef', substr(md5(word),2,1))-1)*256"
    " + (strpos('0123456789abcdef', substr(md5(word),3,1))-1)*16"
    " + (strpos('0123456789abcdef', substr(md5(word),4,1))-1)"
)
# DuckDB fragment: cosine of two DOUBLE-cast float lists (parity with
# similarity.cosine's sequential fold)
_COS = (
    "list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]::DOUBLE * cv[i]::DOUBLE))"
    " / (sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE)))"
    " * sqrt(list_sum(list_transform(cv, x -> x::DOUBLE * x::DOUBLE))))"
)


@register(
    "text_stats_documents",
    sql=f"""
WITH w AS (SELECT doc_id, text, {_W} AS words FROM documents)
SELECT doc_id,
       CAST(len(text) AS BIGINT) AS n_chars,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\f\\r]')) AS BIGINT) AS n_tokens,
       md5(array_to_string(list_sort(list_distinct(list_transform(words, x -> lower(x)))), ' ')) AS fingerprint
FROM w
""",
)
def text_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) and document
    fingerprinting over the documents table."""
    d = _t(spark, sf_dir, "documents")
    stats = token_stats("text")
    return d.select(
        "doc_id",
        stats["n_chars"].alias("n_chars"),
        stats["n_words"].alias("n_words"),
        stats["n_tokens"].alias("n_tokens"),
        doc_fingerprint("text").alias("fingerprint"),
    )


@register(
    "token_fertility_by_lang",
    sql=f"""
WITH w AS (
  SELECT lang,
         CAST(len(text) AS BIGINT) AS c,
         CAST(len({_W}) AS BIGINT) AS wds,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\f\\r]'))
              AS BIGINT) AS t
  FROM documents
), g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(c) AS HUGEINT) AS sc,
         CAST(sum(wds) AS HUGEINT) AS sw,
         CAST(sum(t) AS HUGEINT) AS st
  FROM w GROUP BY lang
)
SELECT lang, n_docs,
       CAST(sc AS BIGINT) AS total_chars,
       CAST(sw AS BIGINT) AS total_words,
       CAST(st AS BIGINT) AS total_tokens,
       CASE WHEN sw > 0 THEN
         CAST((CAST(2 AS HUGEINT) * 10000 * st + sw)
              // (CAST(2 AS HUGEINT) * sw) AS BIGINT) END AS fertility_bp,
       CASE WHEN st > 0 THEN
         CAST((CAST(2 AS HUGEINT) * 10000 * sc + st)
              // (CAST(2 AS HUGEINT) * st) AS BIGINT) END AS compression_bp
FROM g
""",
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility + compression per language — the
    tokenizer-budget planning metric a multilingual training run prices
    corpora with: fertility_bp = 10^4 * tokens/word (how many BPE-ish
    tokens a whitespace word costs in each language; high fertility =
    expensive language under this tokenizer) and compression_bp =
    10^4 * chars/token. Both are EXACT half-up integer divisions over
    corpus-level integer sums (counts are non-negative, so DuckDB's
    truncating `//` coincides with Spark's pmod floor — the ADVICE r12
    contract). One map-side-combinable groupBy over scan-local counters;
    the exchange carries |langs| rows of four longs. At 100 TB this is
    the same plan with bigger partials — nothing else moves."""
    from ..llm.textanalysis import token_stats as _ts

    d = _t(spark, sf_dir, "documents")
    s = _ts("text")
    dec = "decimal(38,0)"
    g = (
        d.select(
            "lang",
            s["n_chars"].alias("c"),
            s["n_words"].alias("w"),
            s["n_tokens"].alias("t"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("c").cast(dec).alias("sc"),
            F.sum("w").cast(dec).alias("sw"),
            F.sum("t").cast(dec).alias("st"),
        )
    )

    def half_up(num: "F.Column", den: "F.Column") -> "F.Column":
        return ((num - F.pmod(num, den)) / den).cast("long")

    two = F.lit(2).cast(dec)
    fert = half_up(two * F.lit(10000).cast(dec) * F.col("st") + F.col("sw"),
                   two * F.col("sw"))
    comp = half_up(two * F.lit(10000).cast(dec) * F.col("sc") + F.col("st"),
                   two * F.col("st"))
    return g.select(
        "lang",
        "n_docs",
        F.col("sc").cast("long").alias("total_chars"),
        F.col("sw").cast("long").alias("total_words"),
        F.col("st").cast("long").alias("total_tokens"),
        F.when(F.col("sw") > 0, fert).alias("fertility_bp"),
        F.when(F.col("st") > 0, comp).alias("compression_bp"),
    )


@register(
    "quality_langid_documents",
    sql=None,  # SQL installed below (generated quality fragment)
)
def quality_langid_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (length/punct/stopword blend) + marker-word language
    ID. Quality is EXACT integer basis points on both engines
    (llm/textanalysis.py::quality_score / quality_sql — the sf0.1 parity
    gate caught the old round(double, 4) flipping on exact .00005
    boundaries, PARITY r12)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        quality_score("text").alias("quality"),
        language_id("text").alias("lang_pred"),
    )


def _install_quality_langid_sql() -> None:
    from ..llm.textanalysis import quality_sql

    QUERIES["quality_langid_documents"]["sql"] = rf"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '') AS words
  FROM documents
), m AS (
  SELECT doc_id,
         {quality_sql("words")} AS quality,
         len(list_filter(words, x -> lower(x) IN ('the','and','of','is'))) AS s_en,
         len(list_filter(words, x -> lower(x) IN ('el','la','de','que'))) AS s_es,
         len(list_filter(words, x -> lower(x) IN ('le','la','et','les'))) AS s_fr,
         len(list_filter(words, x -> lower(x) IN ('der','die','und','das'))) AS s_de
  FROM w
)
SELECT doc_id, quality,
       CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
            WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
            WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
            WHEN s_de = greatest(s_en, s_es, s_fr, s_de) THEN 'de'
            ELSE 'und' END AS lang_pred
FROM m
"""


_install_quality_langid_sql()


@register(
    "dedup_exact_documents",
    sql="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents
)
SELECT md5(text) AS content_hash,
       min(doc_id) AS canonical_id,
       CAST(count(*) AS BIGINT) AS group_size
FROM corpus GROUP BY md5(text)
""",
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash over a corpus with known duplicates."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    out = exact_dedup(corpus, "text", "doc_id")
    return out.select(
        "content_hash", "canonical_id", F.col("group_size").cast("long").alias("group_size")
    )


@register(
    "minhash_signatures",
    sql=f"""
WITH w AS (SELECT doc_id, {_W} AS words FROM documents),
sh AS (SELECT doc_id, {_SH3} AS s FROM w)
SELECT doc_id,
       list_min(list_transform(s, x -> md5('0:' || x))) AS minhash_0,
       list_min(list_transform(s, x -> md5('1:' || x))) AS minhash_1,
       list_min(list_transform(s, x -> md5('2:' || x))) AS minhash_2,
       list_min(list_transform(s, x -> md5('3:' || x))) AS minhash_3
FROM sh
""",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (salted-md5 minima over word 3-shingles)."""
    d = _t(spark, sf_dir, "documents")
    out = minhash_signature(d, "text", n_hashes=4, k=3)
    return out.select("doc_id", "minhash_0", "minhash_1", "minhash_2", "minhash_3")


@register(
    "minhash_lsh_near_dup",
    sql=f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' zzdup' FROM documents
), w AS (SELECT id, {_W} AS words FROM corpus),
sh AS (SELECT id, {_SH3} AS s FROM w),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b
  FROM sh a, sh b
  WHERE a.id < b.id
    AND CAST(least(len(a.s), len(b.s)) AS DOUBLE)
        / greatest(len(a.s), len(b.s)) >= 0.8
), scored AS (
  SELECT id_a, id_b,
         round(CAST(len(list_intersect(s_a, s_b)) AS DOUBLE)
               / len(list_distinct(list_concat(s_a, s_b))), 4) AS jaccard
  FROM cand
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.8
""",
)
def minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (16 hashes, 8 bands) verified by true
    Jaccard; the oracle is the exact blocking-free answer (the count-ratio
    prefilter in the SQL is lossless for jaccard>=0.8 since jac <= min/max).
    Exactness contract vs the hot-bucket guard: the engine runs with the
    default per-bucket ceiling (MAX_LSH_BUCKET_SIZE=1000), whose plan is
    bit-identical to the unguarded one whenever every band bucket stays
    under the ceiling — true at every driver rung (max bucket here is the
    2-member dup pair) and equality-tested in CI; on a corpus with a
    >1000-member near-identical cluster the emitted pair list is rep-member
    star pairs BY DESIGN (SCALING.md hot-cluster rung), where the exact
    list is quadratic and unshippable."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" zzdup")).alias("text"),
        )
    )
    return minhash_lsh_pairs(
        corpus, "text", "doc_id", n_hashes=16, bands=8, k=3, jaccard_threshold=0.8
    )


@register(
    "dedup_groups_lsh",
    sql=f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' zzdup' FROM documents
), w AS (SELECT id, {_W} AS words FROM corpus),
sh AS (SELECT id, {_SH3} AS s FROM w),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b
  FROM sh a, sh b
  WHERE a.id < b.id
    AND CAST(least(len(a.s), len(b.s)) AS DOUBLE)
        / greatest(len(a.s), len(b.s)) >= 0.8
), pairs AS (
  SELECT id_a, id_b FROM cand
  WHERE round(CAST(len(list_intersect(s_a, s_b)) AS DOUBLE)
              / len(list_distinct(list_concat(s_a, s_b))), 4) >= 0.8
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), cc(id, comp) AS (
  SELECT id, id FROM corpus
  UNION
  SELECT e.v, cc.comp FROM cc JOIN edges e ON e.u = cc.id
), lab AS (
  SELECT id, min(comp) AS comp FROM cc GROUP BY id
)
SELECT id AS doc_id, comp AS canonical_id,
       CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS group_size
FROM lab
""",
)
def dedup_groups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup group assembly: LSH pairs -> connected components (alternating
    large-star/small-star, pure DataFrame iteration) -> one canonical keeper
    id + group size for EVERY corpus doc. The oracle recomputes the exact
    pair list and its transitive closure with a recursive CTE. 32 hashes /
    16 bands so a missed threshold-grade edge (which would split a group) has
    P < 1e-7. This is the operator that turns pair detection into the
    deduplicated corpus a training-data pipeline consumes. Hot-bucket
    guard contract: runs with the default MAX_LSH_BUCKET_SIZE ceiling —
    bit-identical below it (all driver rungs; equality-tested), and above
    it star-pair candidates preserve the connected-component GROUPS (the
    surface this query checks) whenever cluster members verify against the
    bucket's canonical member (mini-rung equality + unit test)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" zzdup")).alias("text"),
        )
    )
    pairs = minhash_lsh_pairs(
        corpus, "text", "doc_id", n_hashes=32, bands=16, k=3, jaccard_threshold=0.8
    )
    out = canonical_groups(corpus.select("doc_id"), pairs, "doc_id")
    return out.select(
        "doc_id", "canonical_id", F.col("group_size").cast("long").alias("group_size")
    )


@register(
    "simhash_documents",
    sql=f"""
WITH w AS (
  SELECT doc_id, unnest({_W}) AS word FROM documents
), h AS (
  SELECT doc_id, {_HEX16} AS hw FROM w
), bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (hw >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(generate_series(0, 15)) AS bit) b
  GROUP BY doc_id, b.bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
""",
)
def simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signatures over words (md5-derived word hashes)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", simhash("text", bits=16).alias("simhash"))


@register(
    "ngram_jaccard_pairs",
    sql=f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' zzdup' FROM documents
), w AS (
  SELECT id, CAST(floor(len(text) / 64.0) AS BIGINT) AS blk, {_W} AS words FROM corpus
), g AS (
  SELECT id, blk,
         CASE WHEN len(words) < 2 THEN [array_to_string(words, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(words)-1),
                   i -> array_to_string(list_slice(words, i, i+1), ' '))) END AS s
  FROM w
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b
  FROM g a, g b WHERE a.blk = b.blk AND a.id < b.id
), scored AS (
  SELECT id_a, id_b,
         round(CAST(len(list_intersect(s_a, s_b)) AS DOUBLE)
               / len(list_distinct(list_concat(s_a, s_b))), 4) AS jaccard
  FROM pairs
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.6
""",
)
def ngram_jaccard_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram Jaccard near-dup pairs with length-bucket blocking (the oracle
    applies the identical blocking, so this checks operator semantics).
    Uses the per-block numpy kernel — row-identical to the inverted-index
    join path (tested), with no pair shuffle."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" zzdup")).alias("text"),
        )
    )
    blk = F.floor(F.length("text") / 64.0).cast("long")
    return ngram_jaccard_pairs_blocked_kernel(
        corpus, "text", "doc_id", n=2, block_col=blk, threshold=0.6
    )


@register(
    "ngram_jaccard_pairs_invidx",
    sql=QUERIES["ngram_jaccard_pairs"]["sql"],
)
def ngram_jaccard_pairs_invidx_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted-gram-index join path for the SAME query as
    ngram_jaccard_pairs (identical corpus, blocking, and oracle SQL) —
    registered alongside the blocked-kernel variant per VERDICT r2 ask #9 so
    BOTH strategies carry a timing signal in every BENCH_r{N}.json and the
    choice between them is measured, not remembered. The two are
    row-identical by construction (also asserted in tests/test_llm_ops.py).

    Measured at sf0.1 (20k docs, ~600-doc length blocks): kernel ~2.5-4s,
    index join ~9-16s — the index join's (block, gram) self-join pays k^2
    hit expansion on popular grams at this block shape, so the kernel is the
    registered primary here; the index join wins when blocks are few and
    huge (where a per-block kernel segment would not fit a task). Per
    VERDICT r4 #7 this pure-index form is EXCLUDED from bench (12.8s — 10%
    of the suite — for a timing control); the benched form of this exact
    query is ``ngram_jaccard_pairs_invidx_prefix`` below, which folds the
    PPJoin prefix/length/positional filters into the block-keyed index."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" zzdup")).alias("text"),
        )
    )
    blk = F.floor(F.length("text") / 64.0).cast("long")
    return ngram_jaccard_pairs(
        corpus, "text", "doc_id", n=2, block_col=blk, threshold=0.6
    )


@register(
    "ngram_jaccard_pairs_invidx_prefix",
    sql=f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' zzdup' FROM documents
), w AS (
  SELECT id, CAST(floor(len(text) / 64.0) AS BIGINT) AS blk, {_W} AS words FROM corpus
), g AS (
  SELECT id, blk, {_SH3} AS s FROM w
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b
  FROM g a, g b WHERE a.blk = b.blk AND a.id < b.id
), scored AS (
  SELECT id_a, id_b,
         round(CAST(len(list_intersect(s_a, s_b)) AS DOUBLE)
               / len(list_distinct(list_concat(s_a, s_b))), 4) AS jaccard
  FROM pairs
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.6
""",
)
def ngram_jaccard_pairs_invidx_prefix_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VERDICT r4 #7 delivered — with the negative result MEASURED first:
    folding the PPJoin prefix filter into the block-keyed inverted index
    (llm/dedup.py::ngram_jaccard_pairs_ppjoin with block_col) at the pure
    invidx entry's own shape (BIGRAMS, t=0.6, ~1k-gram vocabulary) benched
    at 18.4s vs 12.8s — the regime the ppjoin docstring predicts: when every
    gram is ultra-frequent, 40%-of-doc prefixes still collide everywhere and
    the df-rank/sort machinery is pure overhead. So the benched fold runs at
    the shape where the prefix DOES discriminate — TRIGRAMS (~28k-gram
    vocabulary) at the same t=0.6 and the same length-block corpus, against
    its own blocked quadratic oracle; the pure bigram index entry
    (ngram_jaccard_pairs_invidx) stays registered + oracle-gated but out of
    bench. The (block, gram) prefix self-join admits only each doc's rarest
    ``sz - ceil(t_eff*sz) + 1`` trigrams; length + positional filters prune
    further; survivors verify exactly."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" zzdup")).alias("text"),
        )
    )
    blk = F.floor(F.length("text") / 64.0).cast("long")
    return ngram_jaccard_pairs_ppjoin(
        corpus, "text", "doc_id", n=3, threshold=0.6, block_col=blk
    )


@register(
    "ngram_jaccard_pairs_ppjoin",
    sql=f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' zzdup' FROM documents
), w AS (
  SELECT id, {_W} AS words FROM corpus
), g AS (
  SELECT id, {_SH3} AS s FROM w
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b
  FROM g a, g b WHERE a.id < b.id
), scored AS (
  SELECT id_a, id_b,
         round(CAST(len(list_intersect(s_a, s_b)) AS DOUBLE)
               / len(list_distinct(list_concat(s_a, s_b))), 4) AS jaccard
  FROM pairs
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.8
""",
)
def ngram_jaccard_pairs_ppjoin_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PPJoin prefix-filter strategy (VERDICT r3 ask #5) for the SAME
    corpus as the other two n-gram paths but BLOCKING-FREE at threshold 0.8 —
    the oracle is the exact all-pairs answer over the whole corpus (no block
    constraint), so this checks that prefix + length + positional filtering
    loses nothing. The quadratic DuckDB oracle is the price of a
    blocking-free ground truth; the Spark side never forms all pairs.

    Trigram shingles (the dedup module's default k), not bigrams: the
    synthetic corpus draws from a tiny vocabulary (~1k distinct BIGRAMS over
    10k docs at sf0.1 — every bigram is ultra-frequent), which is exactly the
    regime prefix filtering cannot discriminate (measured 16s vs 5.6s with
    trigrams' ~28k-gram vocabulary at identical output). Real web corpora
    sit far on the trigram side of that contrast."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" zzdup")).alias("text"),
        )
    )
    return ngram_jaccard_pairs_ppjoin(corpus, "text", "doc_id", n=3, threshold=0.8)


@register(
    "embedding_topk_bruteforce",
    sql=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
scored AS (
  SELECT qid, cid, round({_COS}, 4) AS cosine FROM q, c WHERE qid <> cid
), r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
  FROM scored
)
SELECT qid AS query_id, cid AS neighbour_id, cosine, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
""",
)
def embedding_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbours for 5 query vectors (broadcast queries,
    single corpus scan)."""
    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk(
        e.filter(F.col("vec_id") < 5), e, "vec_id", "vec_id", k=5
    )


@register(
    "embedding_topk_ivf",
    sql=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qcell
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cid, embedding AS cv, label AS ccell FROM embeddings),
scored AS (
  SELECT qid, cid, round({_COS}, 4) AS cosine
  FROM q, c WHERE qid <> cid AND qcell = ccell
), r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
  FROM scored
)
SELECT qid AS query_id, cid AS neighbour_id, cosine, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
""",
)
def embedding_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN top-5: probe only the query's cell (label column as the
    coarse quantizer assignment) — the 100 TB scale path."""
    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        e.filter(F.col("vec_id") < 5), e, "vec_id", "vec_id", cell_col="label", k=5
    )


@register(
    "embedding_topk_ivf_nprobe",
    sql=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
rep AS (
  SELECT label AS rcell, embedding AS rv
  FROM (SELECT label, embedding,
               row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM embeddings)
  WHERE rn = 1
),
pr AS (
  SELECT qid, qv, rcell, round({_COS.replace('cv', 'rv')}, 4) AS pc
  FROM q, rep
),
probes AS (
  SELECT qid, qv, rcell AS qcell
  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY pc DESC, rcell) AS prn
        FROM pr)
  WHERE prn <= 2
),
c AS (SELECT vec_id AS cid, embedding AS cv, label AS ccell FROM embeddings),
scored AS (
  SELECT qid, cid, round({_COS}, 4) AS cosine
  FROM probes p JOIN c ON p.qcell = c.ccell AND p.qid <> c.cid
), r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
  FROM scored
)
SELECT qid AS query_id, cid AS neighbour_id, cosine, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
""",
)
def embedding_topk_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 with multi-probe (nprobe=2): per query, rank cells by cosine
    against each cell's representative vector (its min-vec_id member — pure
    selection, so the ranking is bit-deterministic in both engines, unlike a
    mean centroid whose float accumulation order differs), probe the best 2
    cells, then exact-rerank the probed candidates. Scale shape: the
    representative table is n_cells rows (broadcast), the exploded probe list
    is |queries| x nprobe rows (broadcast), and the corpus is scanned once
    with the probe join on a small int key — the same plan at 100 TB with
    the corpus pre-partitioned by cell. The learned-centroid variant
    (llm/similarity.py::ivf_build_and_search nprobe>1) carries the
    recall>=0.95 assertion in tests/test_llm_ops.py."""
    from pyspark.sql import Window

    from ..llm.linalg import cosine

    e = _t(spark, sf_dir, "embeddings")
    nprobe, k = 2, 5
    w_rep = Window.partitionBy("label").orderBy("vec_id")
    rep = (
        e.withColumn("rn", F.row_number().over(w_rep))
        .filter(F.col("rn") == 1)
        .select(F.col("label").alias("rcell"), F.col("embedding").alias("rv"))
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    ranked = q.join(F.broadcast(rep), F.lit(True)).withColumn(
        "pc", F.round(cosine(F.col("qv"), F.col("rv")), 4)
    )
    w_p = Window.partitionBy("qid").orderBy(F.desc("pc"), F.asc("rcell"))
    probes = (
        ranked.withColumn("prn", F.row_number().over(w_p))
        .filter(F.col("prn") <= nprobe)
        .select("qid", "qv", F.col("rcell").alias("qcell"))
    )
    c = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("ccell"),
    )
    pairs = c.join(F.broadcast(probes), F.col("qcell") == F.col("ccell")).filter(
        F.col("qid") != F.col("cid")
    )
    scored = pairs.withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbour_id"),
            "cosine",
            "rank",
        )
    )


@register(
    "embedding_topk_ivf_pq",
    sql=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
rep AS (
  SELECT label AS rcell, embedding AS rv
  FROM (SELECT label, embedding,
               row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM embeddings)
  WHERE rn = 1
),
pr AS (
  SELECT qid, qv, rcell, round({_COS.replace('cv', 'rv')}, 4) AS pc
  FROM q, rep
),
probes AS (
  SELECT qid, qv, rcell AS qcell
  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY pc DESC, rcell) AS prn
        FROM pr)
  WHERE prn <= 2
),
cj AS (
  SELECT e.vec_id AS cid, e.label AS ccell, e.embedding AS cv, rep.rv
  FROM embeddings e JOIN rep ON e.label = rep.rcell
),
res AS (
  SELECT cid, ccell, cv, rv,
         list_transform(generate_series(1, len(cv)),
                        i -> cv[i]::DOUBLE - rv[i]::DOUBLE) AS rs
  FROM cj
),
sc AS (
  SELECT *, list_max(list_transform(rs, x -> abs(x))) / 127.0 AS scale FROM res
),
recon AS (
  SELECT cid, ccell, cv,
         CASE WHEN scale = 0 THEN list_transform(rv, x -> x::DOUBLE)
              ELSE list_transform(generate_series(1, len(rs)),
                     i -> rv[i]::DOUBLE
                          + CAST(round(rs[i] / scale) AS INTEGER) * scale)
         END AS dv
  FROM sc
),
cand AS (
  SELECT p.qid, p.qv, r.cid, r.cv,
         round({_COS.replace('cv', 'dv').replace('qv', 'p.qv')}, 4) AS approx
  FROM probes p JOIN recon r ON p.qcell = r.ccell AND p.qid <> r.cid
),
topm AS (
  SELECT qid, qv, cid, cv
  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY approx DESC, cid) AS arn
        FROM cand)
  WHERE arn <= 20
),
rr AS (
  SELECT qid, cid, round({_COS}, 4) AS cosine FROM topm
)
SELECT qid AS query_id, cid AS neighbour_id, cosine, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
      FROM rr)
WHERE rank <= 5
""",
)
def embedding_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with QUANTIZED-RESIDUAL candidate scoring + exact float rerank
    (VERDICT r12 #5) — the full 100 TB ANN memory story: same nprobe=2
    deterministic cell ranking as ``embedding_topk_ivf_nprobe`` (min-vec_id
    representative per cell — bit-deterministic in both engines), but the
    probed candidates are scored on int8-quantized residuals against the
    cell reference (the stored index is ~4x smaller than float32; residuals
    share a tighter scale than whole vectors) and only the per-query top
    k*rerank=20 reconstructed candidates touch the float column for the
    exact rerank. The oracle replays the ENTIRE quantize -> reconstruct ->
    cut -> rerank chain, so the gate covers the quantization arithmetic and
    the rerank cut, not just the final ranking. On the gate corpus the
    output equals ``embedding_topk_ivf_nprobe`` row-for-row (asserted in
    tests/test_round13_ops.py) — the equality contract VERDICT asked for."""
    from pyspark.sql import Window

    from ..llm.linalg import cosine
    from ..llm.similarity import residual_quantized_topk

    e = _t(spark, sf_dir, "embeddings")
    nprobe, k = 2, 5
    w_rep = Window.partitionBy("label").orderBy("vec_id")
    rep = (
        e.withColumn("rn", F.row_number().over(w_rep))
        .filter(F.col("rn") == 1)
        .select(F.col("label").alias("rcell"), F.col("embedding").alias("rv"))
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    ranked = q.join(F.broadcast(rep), F.lit(True)).withColumn(
        "pc", F.round(cosine(F.col("qv"), F.col("rv")), 4)
    )
    w_p = Window.partitionBy("qid").orderBy(F.desc("pc"), F.asc("rcell"))
    probes = (
        ranked.withColumn("prn", F.row_number().over(w_p))
        .filter(F.col("prn") <= nprobe)
        .select("qid", "qv", F.col("rcell").alias("qcell"))
    )
    cw = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("ccell"),
    ).join(F.broadcast(rep.withColumnRenamed("rcell", "ccell")), "ccell")
    return residual_quantized_topk(probes, cw, k=k, rerank=4)


@register(
    "embedding_topk_ivf_pq_incremental",
    sql=f"""
WITH refs AS (
  SELECT label AS rcell, embedding AS rv
  FROM (SELECT label, embedding,
               row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        FROM embeddings WHERE vec_id % 2 = 0)
  WHERE rn = 1
),
asg AS (
  SELECT cid, rcell AS ccell, cv FROM (
    SELECT e.vec_id AS cid, r.rcell, e.embedding AS cv,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round({_COS.replace('qv', 'e.embedding').replace('cv', 'r.rv')}, 4) DESC,
                      r.rcell) AS arn
    FROM embeddings e, refs r
  ) WHERE arn = 1
),
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
pr AS (
  SELECT qid, qv, rcell, round({_COS.replace('cv', 'rv')}, 4) AS pc
  FROM q, refs
),
probes AS (
  SELECT qid, qv, rcell AS qcell
  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY pc DESC, rcell) AS prn
        FROM pr)
  WHERE prn <= 2
),
cj AS (
  SELECT a.cid, a.ccell, a.cv, refs.rv
  FROM asg a JOIN refs ON a.ccell = refs.rcell
),
res AS (
  SELECT cid, ccell, cv, rv,
         list_transform(generate_series(1, len(cv)),
                        i -> cv[i]::DOUBLE - rv[i]::DOUBLE) AS rs
  FROM cj
),
sc AS (
  SELECT *, list_max(list_transform(rs, x -> abs(x))) / 127.0 AS scale FROM res
),
recon AS (
  SELECT cid, ccell, cv,
         CASE WHEN scale = 0 THEN list_transform(rv, x -> x::DOUBLE)
              ELSE list_transform(generate_series(1, len(rs)),
                     i -> rv[i]::DOUBLE
                          + CAST(round(rs[i] / scale) AS INTEGER) * scale)
         END AS dv
  FROM sc
),
cand AS (
  SELECT p.qid, p.qv, r.cid, r.cv,
         round({_COS.replace('cv', 'dv').replace('qv', 'p.qv')}, 4) AS approx
  FROM probes p JOIN recon r ON p.qcell = r.ccell AND p.qid <> r.cid
),
topm AS (
  SELECT qid, qv, cid, cv
  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY approx DESC, cid) AS arn
        FROM cand)
  WHERE arn <= 20
),
rr AS (
  SELECT qid, cid, round({_COS}, 4) AS cosine FROM topm
)
SELECT qid AS query_id, cid AS neighbour_id, cosine, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
      FROM rr)
WHERE rank <= 5
""",
)
def embedding_topk_ivf_pq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED + INCREMENTALLY EXTENDED IVF-PQ index (VERDICT r13 #5 —
    llm/similarity.py::build_ivf_pq_index / incremental_add_ivf_pq /
    search_ivf_pq_index): corpus A (even vec_ids) is built into a parquet
    index — frozen references (min-vec_id member per label cell, the
    bit-deterministic representative convention) + cell-partitioned int8
    residual codes — then corpus B (odd vec_ids) arrives as an increment and
    is assigned to the FROZEN cells and appended, never retraining the
    quantizer or rewriting standing rows (the ANN mirror of
    incremental_dedup). The search prunes the codes scan to each query's
    nprobe=2 ranked cells, scores candidates on the STORED codes
    (reconstruct rv + code*scale — quantization does not re-run at search
    time), and exact-reranks the per-query top 20.

    Because encoding is a pure per-row function of (vector, frozen
    reference), build(A) + add(B) is byte-identical to a from-scratch build
    of A UNION B with the same references — so the oracle replays exactly
    that: assign ALL vectors to argmax round-4 cosine cell against
    A-derived references, then the quantize -> reconstruct -> cut -> rerank
    chain. tests/test_round14_ops.py additionally asserts the
    incremental-vs-scratch index and search equality frame-for-frame."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from ..llm.similarity import (
        build_ivf_pq_index,
        incremental_add_ivf_pq,
        search_ivf_pq_index,
    )

    e = _t(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") % 2 == 0)
    b = e.filter(F.col("vec_id") % 2 == 1)
    w_rep = Window.partitionBy("label").orderBy("vec_id")
    refs = [
        (r["label"], list(r["embedding"]))
        for r in a.withColumn("rn", F.row_number().over(w_rep))
        .filter(F.col("rn") == 1)
        .select("label", "embedding")
        .collect()
    ]
    base = tempfile.mkdtemp(prefix="ivfpq_idx_")
    try:
        build_ivf_pq_index(a, base, refs, "vec_id")
        # the builder's own frozen quantizer is passed through the add and
        # search steps — identical rows to the persisted path/refs, skipping
        # only the per-step read-back collect (VERDICT r14 #2: the lifecycle
        # rebuilt identical refs plans 3x)
        incremental_add_ivf_pq(spark, base, b, "vec_id", refs=refs)
        res = search_ivf_pq_index(
            spark, base, e.filter(F.col("vec_id") < 5), "vec_id",
            k=5, nprobe=2, rerank=4, refs=refs,
        )
        # materialize before the index dir goes away (k rows per query)
        return local_df(spark, res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "embedding_near_dup_cells",
    sql=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding, label FROM embeddings
), a AS (SELECT id, embedding, label FROM corpus),
scored AS (
  SELECT x.id AS id_a, y.id AS id_b,
         round({_COS.replace('qv', 'x.embedding').replace('cv', 'y.embedding')}, 4) AS cosine
  FROM a x, a y WHERE x.label = y.label AND x.id < y.id
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.99
""",
)
def embedding_near_dup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within label cells (corpus contains an
    exact copy of every vector, so each vector pairs with its clone at 1.0).
    Uses the two-tier matmul+exact-rescore path; output is bit-identical to
    the pure-expression embedding_near_dup (tested) and the SQL oracle."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    corpus = e.unionByName(
        e.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    )
    return embedding_near_dup_matmul(
        corpus, "embedding", "vec_id", "label", threshold=0.99
    )


@register(
    "corpus_filter_documents",
    sql=f"""
WITH corpus AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 4 = 1 THEN text || chr(10) || text
           WHEN doc_id % 4 = 2 THEN array_to_string(list_slice({_W}, 1, 5), ' ')
           WHEN doc_id % 4 = 3 THEN array_to_string(list_slice({_W}, 1, 30), ' ')
                                    || ' !! ?? ## $$ %% ^^ && ** (( ))'
           ELSE text
         END AS text
  FROM documents
), w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '[ \\t\\n\\f\\r]+'), x -> x <> '') AS words,
         list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines
  FROM corpus
), g AS (
  SELECT doc_id,
         CASE WHEN len(words) >= 2
              THEN list_transform(generate_series(1, len(words)-1),
                                  i -> words[i] || ' ' || words[i+1])
              ELSE [] END AS grams
  FROM w
), e AS (
  SELECT doc_id, unnest(grams) AS gram FROM g
), topg AS (
  SELECT doc_id, max(c) AS top_c
  FROM (SELECT doc_id, gram, count(*) AS c FROM e GROUP BY doc_id, gram)
  GROUP BY doc_id
), m AS (
  SELECT w.doc_id,
         {_QUALITY_W} AS quality,
         CAST(len(words) AS BIGINT) AS n_words,
         CASE WHEN len(lines) > 0
              THEN round((len(lines) - len(list_distinct(lines)))
                         / CAST(len(lines) AS DOUBLE), 4) ELSE 0.0 END AS dlf,
         CASE WHEN len(g.grams) > 0
              THEN round(topg.top_c / CAST(len(g.grams) AS DOUBLE), 4)
              ELSE 0.0 END AS tbs,
         len(list_filter(words, x -> lower(x) IN ('the','and','of','is'))) AS s_en,
         len(list_filter(words, x -> lower(x) IN ('el','la','de','que'))) AS s_es,
         len(list_filter(words, x -> lower(x) IN ('le','la','et','les'))) AS s_fr,
         len(list_filter(words, x -> lower(x) IN ('der','die','und','das'))) AS s_de
  FROM w JOIN g ON w.doc_id = g.doc_id LEFT JOIN topg ON w.doc_id = topg.doc_id
), lang AS (
  SELECT doc_id,
         CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
              WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
              WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
              WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
              WHEN s_de = greatest(s_en, s_es, s_fr, s_de) THEN 'de'
              ELSE 'und' END AS l
  FROM m
), r AS (
  SELECT m.doc_id,
         list_filter([
           CASE WHEN m.quality < 0.7 THEN 'low_quality' END,
           CASE WHEN m.n_words < 10 THEN 'too_short' END,
           CASE WHEN m.dlf > 0.3 OR m.tbs > 0.2 THEN 'repetitive' END,
           CASE WHEN lang.l NOT IN ('en', 'und') THEN 'non_target_lang' END
         ], x -> x IS NOT NULL) AS reasons
  FROM m JOIN lang ON m.doc_id = lang.doc_id
)
SELECT doc_id, len(reasons) = 0 AS keep,
       coalesce(array_to_string(reasons, ','), '') AS reasons
FROM r
""",
)
def corpus_filter_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation decision: keep/drop with an auditable reasons
    list — low_quality (quality < 0.7), too_short (< 10 words), repetitive
    (dup-line frac > 0.3 or top-bigram share > 0.2), non_target_lang. The
    corpus is seeded so every reason fires: doc_id%4==1 line-doubled,
    %4==2 truncated to 5 words, %4==3 truncated + punctuation spam. All
    signals are scan-local expressions composed from the tested operators
    (quality_score, token_stats, repetition_stats, language_id) — at 100 TB
    this whole decision runs inside the scan stage with zero shuffle, which
    is the property that makes corpus filtering cheap enough to re-run per
    recipe change."""
    from ..llm.curation import repetition_stats
    from ..llm.textanalysis import words as _words

    d = _t(spark, sf_dir, "documents")
    ws = _words("text")
    corpus = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 1, F.concat("text", F.lit("\n"), "text"))
        .when(F.col("doc_id") % 4 == 2, F.array_join(F.slice(ws, 1, 5), " "))
        .when(
            F.col("doc_id") % 4 == 3,
            F.concat(
                F.array_join(F.slice(ws, 1, 30), " "),
                F.lit(" !! ?? ## $$ %% ^^ && ** (( ))"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    rep = repetition_stats("text")
    reasons = F.filter(
        F.array(
            F.when(quality_score("text") < 0.7, F.lit("low_quality")),
            F.when(token_stats("text")["n_words"] < 10, F.lit("too_short")),
            F.when(
                (rep["dup_line_frac"] > 0.3) | (rep["top_bigram_share"] > 0.2),
                F.lit("repetitive"),
            ),
            F.when(~language_id("text").isin("en", "und"), F.lit("non_target_lang")),
        ),
        lambda x: x.isNotNull(),
    )
    # Registry convention (plans/queries.py): array columns are joined to
    # delimited strings on BOTH sides so the external canonicalizer can hash
    # them. The array form stays available via llm.curation.corpus_filter.
    return corpus.select(
        "doc_id",
        (F.size(reasons) == 0).alias("keep"),
        F.array_join(reasons, ",").alias("reasons"),
    )


@register(
    "frame_sample_media",
    sql="""
WITH m AS (
  SELECT doc_id AS media_id, md5(text) AS cmd5, doc_id % 60000 + 1000 AS dur
  FROM documents
), f AS (
  SELECT media_id, unnest(generate_series(0, 4)) AS i, cmd5, dur FROM m
)
SELECT media_id, CAST(i AS INT) AS frame_idx,
       CAST(((2*i+1)*dur) // 10 AS BIGINT) AS frame_ts_ms,
       md5(cmd5 || ':' || CAST(CAST(((2*i+1)*dur) // 10 AS BIGINT) AS VARCHAR)) AS frame_md5
FROM f
""",
)
def frame_sample_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: 5 midpoint-rule frame timestamps per
    media row (integer math), per-frame digest from the deterministic fake
    decoder, exploded INSIDE the Arrow batch via mapInPandas. The oracle
    recomputes timestamps and digests from the same md5 chain — the
    schema/batch-shape/explode plumbing is what's being verified; a real
    ffmpeg seek-decode drops into the stub's place unchanged."""
    from ..llm.multimodal import frame_sample

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        (F.col("doc_id") % 60000 + 1000).cast("long").alias("duration_ms"),
    )
    return frame_sample(media, n_frames=5).select(
        "media_id", "frame_idx", "frame_ts_ms", "frame_md5"
    )


@register(
    "resize_plan_media",
    sql="""
WITH m AS (SELECT doc_id AS media_id, doc_id % 640 AS w, doc_id % 480 AS h FROM documents)
SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(CASE WHEN greatest(w, h) > 256 THEN (w * 256) // greatest(w, h) ELSE w END AS INT) AS out_width,
       CAST(CASE WHEN greatest(w, h) > 256 THEN (h * 256) // greatest(w, h) ELSE h END AS INT) AS out_height
FROM m
""",
)
def resize_plan_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize geometry computed engine-side (pure integer
    expressions, scan-local): longest side clamped to 256, the other scaled
    proportionally, identity below the clamp. The byte resize is the
    decoder's job; the plan math is what belongs in the engine and what the
    oracle checks."""
    from ..llm.multimodal import documents_as_media, resize_plan

    media = documents_as_media(_t(spark, sf_dir, "documents"))
    return resize_plan(media, max_side=256).select(
        "media_id", "width", "height", "out_width", "out_height"
    )


@register(
    "semantic_dedup_groups",
    sql=f"""
WITH RECURSIVE corpus AS (
  SELECT vec_id AS id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings
), scored AS (
  SELECT x.id AS id_a, y.id AS id_b,
         round({_COS.replace('qv', 'x.embedding').replace('cv', 'y.embedding')}, 4) AS cosine
  FROM corpus x, corpus y WHERE x.id < y.id
), p AS (
  SELECT id_a, id_b FROM scored WHERE cosine >= 0.99
), edges AS (
  SELECT id_a AS u, id_b AS v FROM p
  UNION
  SELECT id_b, id_a FROM p
), cc(id, comp) AS (
  SELECT id, id FROM corpus
  UNION
  SELECT e.v, cc.comp FROM cc JOIN edges e ON e.u = cc.id
), lab AS (
  SELECT id, min(comp) AS comp FROM cc GROUP BY id
)
SELECT id AS vec_id, comp AS canonical_id,
       CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS group_size
FROM lab
""",
)
def semantic_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space dedup groups: cosine near-dup pairs (two-tier
    matmul + exact rescore, label cells as blocking) -> connected components
    -> one canonical keeper per semantic cluster. The same group-assembly
    operator as dedup_groups_lsh composed over a different similarity
    channel — text LSH and embedding cosine feed one dedup surface. Oracle
    computes the BLOCKING-FREE exact pair set (every i<j pair) plus a
    recursive-CTE closure, so the label-cell blocking is also validated as
    lossless at this threshold (cross-cell near-dups at cosine>=0.99 would
    make it fail)."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    corpus = e.unionByName(
        e.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    )
    pairs = embedding_near_dup_matmul(
        corpus, "embedding", "vec_id", "label", threshold=0.99
    )
    out = canonical_groups(corpus.select("vec_id"), pairs, "vec_id")
    return out.select(
        F.col("vec_id"),
        "canonical_id",
        F.col("group_size").cast("long").alias("group_size"),
    )


@register(
    "multimodal_features",
    sql="""
WITH m AS (SELECT doc_id AS media_id, text, md5(text) AS h FROM documents)
SELECT media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       h AS content_md5,
       concat_ws(',',
         round(((strpos('0123456789abcdef', substr(h,1,1))-1)*16
               + strpos('0123456789abcdef', substr(h,2,1))-1) / 255.0, 4),
         round(((strpos('0123456789abcdef', substr(h,3,1))-1)*16
               + strpos('0123456789abcdef', substr(h,4,1))-1) / 255.0, 4),
         round(((strpos('0123456789abcdef', substr(h,5,1))-1)*16
               + strpos('0123456789abcdef', substr(h,6,1))-1) / 255.0, 4),
         round(((strpos('0123456789abcdef', substr(h,7,1))-1)*16
               + strpos('0123456789abcdef', substr(h,8,1))-1) / 255.0, 4)
       ) AS features
FROM m
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents as opaque binary media ->
    Arrow-batched mapInPandas feature extraction (deterministic md5 fake in
    place of the stubbed decoder)."""
    d = _t(spark, sf_dir, "documents")
    media = documents_as_media(d)
    feats = binary_features(media, deterministic_fake=True)
    return feats.select(
        "media_id",
        "n_bytes",
        "content_md5",
        F.array_join(
            F.transform("features", lambda x: F.round(x, 4).cast("string")), ","
        ).alias("features"),
    )


@register(
    "tumbling_window_events",
    sql="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows per event_type — the same plan runs as a
    Structured Streaming query with watermarking (tests assert parity)."""
    return tumbling_agg(_t(spark, sf_dir, "events"), "1 hour")


@register(
    "sliding_window_events",
    sql="""
WITH s AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w_start, event_type, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE, event_type, value
  FROM events
)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM s GROUP BY 1, 2
""",
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows (each event in 2 windows)."""
    return sliding_agg(_t(spark, sf_dir, "events"), "1 hour", "30 minutes")


@register(
    "session_windows_events",
    sql="""
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, session_id
""",
)
def session_windows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with 30-minute inactivity gap (lag + cumsum batch form;
    the streaming-native session_window form is session_window_agg)."""
    return sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)


# PII patterns shared with llm/curation.py — the SQL strings are generated
# from the same constants so the two engines can only drift together.
def _pii_sql_chain(expr: str) -> str:
    out = expr
    for _, pattern, repl in PII_PATTERNS:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


_PII_EMAIL = PII_PATTERNS[0][1].replace("'", "''")

@register(
    "redact_pii_documents",
    sql=f"""
WITH seeded AS (
  SELECT doc_id,
         text || ' reach me: user' || doc_id || '@example.com or ' ||
         CASE WHEN doc_id % 3 = 0 THEN '123-45-6789'
              WHEN doc_id % 3 = 1 THEN '10.0.' || doc_id % 256 || '.7'
              ELSE '+1 (555) 123-4567' END AS text
  FROM documents
)
SELECT doc_id,
       {_pii_sql_chain('text')} AS redacted,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email
FROM seeded
""",
)
def redact_pii_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: deterministic synthetic PII (email per doc; SSN / IPv4
    / phone round-robin by doc_id) appended to each document, then redacted
    with the chained typed-placeholder patterns. Chained regexp_replace is
    scan-local codegen — zero shuffle at any scale. Oracle applies the
    identical pattern chain with RE2 'g' replacement; patterns are
    restricted to the Java-regex/RE2 shared subset."""
    from ..llm.curation import pii_counts, redact_pii

    d = _t(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        F.concat(
            "text",
            F.lit(" reach me: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or "),
            F.when(F.col("doc_id") % 3 == 0, F.lit("123-45-6789"))
            .when(
                F.col("doc_id") % 3 == 1,
                F.concat(F.lit("10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")),
            )
            .otherwise(F.lit("+1 (555) 123-4567")),
        ).alias("text"),
    )
    return seeded.select(
        "doc_id",
        redact_pii("text").alias("redacted"),
        pii_counts("text")["n_email"].alias("n_email"),
    )


@register(
    "repetition_stats_documents",
    sql="""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 1 THEN text || chr(10) || text ELSE text END AS text
  FROM documents
), l AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines,
         list_filter(string_split_regex(trim(text), '[ \\t\\n\\f\\r]+'), x -> x <> '') AS ws
  FROM corpus
), g AS (
  SELECT doc_id, lines,
         CASE WHEN len(ws) >= 2
              THEN list_transform(generate_series(1, len(ws)-1),
                                  i -> ws[i] || ' ' || ws[i+1])
              ELSE [] END AS grams
  FROM l
), e AS (
  SELECT doc_id, unnest(grams) AS gram FROM g
), counts AS (
  SELECT doc_id, gram, count(*) AS c FROM e GROUP BY doc_id, gram
), topg AS (
  SELECT doc_id, max(c) AS top_c FROM counts GROUP BY doc_id
)
SELECT g.doc_id,
       CASE WHEN len(lines) > 0
            THEN round((len(lines) - len(list_distinct(lines)))
                       / CAST(len(lines) AS DOUBLE), 4)
            ELSE 0.0 END AS dup_line_frac,
       CASE WHEN len(grams) > 0
            THEN round(topg.top_c / CAST(len(grams) AS DOUBLE), 4)
            ELSE 0.0 END AS top_bigram_share
FROM g LEFT JOIN topg ON g.doc_id = topg.doc_id
""",
)
def repetition_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (Gopher/FineWeb-style): duplicate-line
    fraction and top-bigram share, on a corpus where odd docs are
    line-doubled (guaranteed positives). Scan-local expressions; per-doc
    cost bounded by doc length, independent of corpus size."""
    from ..llm.curation import repetition_stats

    d = _t(spark, sf_dir, "documents")
    corpus = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 1, F.concat("text", F.lit("\n"), "text")
        ).otherwise(F.col("text")).alias("text"),
    )
    stats = repetition_stats("text")
    return corpus.select(
        "doc_id",
        stats["dup_line_frac"].alias("dup_line_frac"),
        stats["top_bigram_share"].alias("top_bigram_share"),
    )


@register(
    "chunk_documents",
    sql=f"""
WITH w AS (
  SELECT doc_id, {_W} AS ws FROM documents
), c AS (
  SELECT doc_id,
         CASE WHEN len(ws) > 0
              THEN list_transform(generate_series(1, len(ws), 80),
                                  s -> array_to_string(list_slice(ws, s, s + 99), ' '))
              ELSE [] END AS chunks
  FROM w
), e AS (
  SELECT doc_id, unnest(generate_series(1, len(chunks))) AS cid, chunks FROM c
)
SELECT doc_id, CAST(cid - 1 AS INT) AS chunk_id, chunks[cid] AS chunk,
       CAST(len(list_filter(string_split_regex(trim(chunks[cid]), '[ \\t\\n\\f\\r]+'),
                            x -> x <> '')) AS BIGINT) AS n_words
FROM e
""",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document chunking: 100-word windows, 20-word overlap (stride
    80), last window ragged — the segmentation pass before tokenization.
    posexplode multiplies rows scan-locally; no shuffle at any scale.
    Oracle builds the identical windows with list_slice (end-inclusive, so
    s..s+99 == Spark's slice(start, length=100))."""
    from ..llm.curation import chunk_text

    d = _t(spark, sf_dir, "documents")
    from ..llm.textanalysis import words as _words

    return d.select(
        "doc_id",
        F.posexplode(chunk_text("text", chunk_words=100, overlap=20)).alias(
            "chunk_id", "chunk"
        ),
    ).select(
        "doc_id",
        "chunk_id",
        "chunk",
        F.size(_words("chunk")).cast("long").alias("n_words"),
    )


@register(
    "corpus_split_documents",
    sql=f"""
SELECT doc_id,
       CAST({md5_bucket_sql('doc_id')} AS BIGINT) AS bucket,
       CASE WHEN {md5_bucket_sql('doc_id')} < {int(0.9 * 16**6)}
            THEN 'train' ELSE 'val' END AS split
FROM documents
""",
)
def corpus_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val split by md5 id-hash bucket — stable across
    partitioning, retries, AND engines (md5 hex fold, not an engine-specific
    hash), with the nested-holdout property (growing val only moves docs
    train->val). The primitive for reproducible corpus sampling at 100 TB:
    a scan-local predicate, no shuffle, no sampling state."""
    from ..llm.curation import md5_bucket, train_val_split

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        md5_bucket("doc_id").alias("bucket"),
        train_val_split("doc_id", val_fraction=0.1).alias("split"),
    )


_SH5 = (
    "CASE WHEN len(words) < 5 THEN [array_to_string(words, ' ')] "
    "ELSE list_distinct(list_transform(generate_series(1, len(words)-4), "
    "i -> array_to_string(list_slice(words, i, i+4), ' '))) END"
)


@register(
    "decontaminate_documents",
    sql=f"""
WITH w AS (SELECT doc_id, {_W} AS words FROM documents),
g AS (SELECT doc_id, {_SH5} AS s FROM w),
bg AS (SELECT list_distinct(flatten(list(s))) AS bl FROM g WHERE doc_id % 97 = 0)
SELECT doc_id,
       CAST(len(list_intersect(s, bl)) AS BIGINT) AS n_contaminated_grams,
       len(list_intersect(s, bl)) > 0 AS contaminated
FROM g CROSS JOIN bg
""",
)
def decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every doc sharing a 5-gram with the
    "benchmark" subset (doc_id % 97 == 0 — guaranteed positives: the bench
    docs flag themselves, plus any true collisions) gets its distinct-hit
    count. The benchmark gram set is broadcast; the corpus side never
    shuffles except the (rare) hit rows — the shape that lets a 100 TB
    corpus be decontaminated against kilobyte-scale eval suites in one
    scan."""
    from ..llm.curation import decontaminate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(d, bench, "text", "doc_id", "text", n=5).select(
        "doc_id", "n_contaminated_grams", "contaminated"
    )


@register(
    "mix_sources_documents",
    sql=f"""
WITH s AS (
  SELECT doc_id, ['web', 'books', 'code'][(doc_id % 3) + 1] AS source
  FROM documents
)
SELECT doc_id, source FROM s
WHERE {md5_bucket_sql("CAST(doc_id AS VARCHAR) || ':' || source")}
      < CAST(floor(CASE source WHEN 'web' THEN 0.9 WHEN 'books' THEN 0.5
                               WHEN 'code' THEN 0.2 END * 16777216) AS BIGINT)
""",
)
def mix_sources_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mix materialization: per-source sampling
    fractions (web 0.9 / books 0.5 / code 0.2) applied via the engine-
    portable md5 fold over id:source — salting with the source decorrelates
    the mix from the train/val split's bare-id hash. Pure scan-local
    predicate: the mix of a 100 TB corpus is a filter, not a shuffle."""
    from ..llm.curation import mix_sources

    d = _t(spark, sf_dir, "documents")
    src = F.element_at(
        F.array(F.lit("web"), F.lit("books"), F.lit("code")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    tagged = d.select("doc_id", src.alias("source"))
    return mix_sources(
        tagged, {"web": 0.9, "books": 0.5, "code": 0.2}, "source", "doc_id"
    ).select("doc_id", "source")


@register(
    "pack_sequences_documents",
    sql=f"""
WITH w AS (
  SELECT doc_id, doc_id % 4 AS shard, CAST(len({_W}) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS endo
  FROM w
)
SELECT doc_id, shard, n_tokens,
       CAST(floor((endo - n_tokens) / 512) AS BIGINT) AS seq_index,
       CAST((endo - n_tokens) % 512 AS BIGINT) AS offset_in_seq,
       floor((endo - 1) / 512) > floor((endo - n_tokens) / 512) AS crosses_boundary
FROM c
""",
)
def pack_sequences_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing over the documents corpus: 4 shards (doc_id % 4),
    deterministic doc_id order, 512-token windows. The oracle recomputes the
    per-shard running token count with a plain window cumsum — checking both
    the packing arithmetic and the shard-parallel shape (the cumsum
    partitions by shard; nothing global)."""
    from ..llm.curation import pack_sequences

    d = _t(spark, sf_dir, "documents")
    tagged = d.select(
        "doc_id",
        (F.col("doc_id") % 4).alias("shard"),
        token_stats("text")["n_words"].cast("long").alias("n_tokens"),
    )
    return pack_sequences(tagged, "n_tokens", "shard", "doc_id", capacity=512)


@register(
    "embedding_quantize_int8",
    sql="""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
q AS (SELECT vec_id, v, scale,
        CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS INTEGER))
             ELSE list_transform(v, x -> CAST(round(x / scale) AS INTEGER)) END AS qv
      FROM s),
d AS (SELECT vec_id, v, scale, qv, list_transform(qv, i -> i * scale) AS dv FROM q)
SELECT vec_id,
       array_to_string(list_transform(qv, i -> CAST(i AS VARCHAR)), ',') AS qvec,
       round(scale, 6) AS qscale_r,
       round(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * dv[i]))
             / (sqrt(list_sum(list_transform(v, x -> x * x)))
                * sqrt(list_sum(list_transform(dv, x -> x * x)))), 4) AS recon_cosine
FROM d
""",
)
def embedding_quantize_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding corpus — the
    4x (vs float32) memory/IO lever for 100 TB ANN stores — with the oracle
    recomputing the quantized codes AND the reconstruction cosine from the
    same arithmetic. recon_cosine ~0.99+ on random vectors documents the
    quality retained; the codes themselves hash-match, so the quantizer is
    bit-deterministic across engines. Scan-local expressions only."""
    from ..llm.linalg import cosine
    from ..llm.similarity import dequantize_expr, quantize_int8

    e = _t(spark, sf_dir, "embeddings")
    return quantize_int8(e).select(
        "vec_id",
        F.array_join(F.transform("qvec", lambda i: i.cast("string")), ",").alias(
            "qvec"
        ),
        F.round(F.col("qscale"), 6).alias("qscale_r"),
        F.round(cosine(F.col("embedding"), dequantize_expr()), 4).alias(
            "recon_cosine"
        ),
    )


@register(
    "lakehouse_merge_documents",
    sql="""
WITH delta AS (
  SELECT doc_id, 'UPDATED: ' || text AS text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 100000000, text FROM documents WHERE doc_id % 25 = 0
)
SELECT b.doc_id, b.text
FROM documents b LEFT JOIN delta d ON b.doc_id = d.doc_id
WHERE d.doc_id IS NULL
UNION ALL
SELECT doc_id, text FROM delta
""",
)
def lakehouse_merge_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2's lakehouse MERGE executed END-TO-END through storage in the
    correctness gate (not just unit tests): write the documents table as a
    copy-on-write lakehouse table, MERGE a delta that updates every 10th doc
    and inserts new ids, re-apply the SAME delta (the idempotent-re-run path
    — the version must not advance), and read the committed snapshot back.
    The oracle is the relational definition of upsert: target-anti-join-source
    union source. The read-back is localCheckpoint'ed so the temp table dir
    can be removed before returning (same lifetime pattern as the streaming
    drains' memory sinks).

    Insert-id fixture contract (PARITY r13 sf1): synthetic insert ids are
    doc_id + 1e8, ASSERTED above the corpus' max id at build. The old +1e6
    offset collided with the sf1 shard id space (d + shard*1e6), which put
    duplicate keys inside one delta — an undefined merge ("latest wins" per
    engine) vs the oracle's UNION ALL double-count; the assert turns any
    future id-space collision into a loud failure instead of a silent
    fixture degeneration."""
    import shutil
    import tempfile

    from ..sinks.lakehouse import LakehouseTable

    _INSERT_OFFSET = 100_000_000
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = d.agg(F.max("doc_id")).first()[0]
    assert max_id < _INSERT_OFFSET, (
        f"lakehouse_merge_documents fixture: corpus max doc_id {max_id} "
        f"reaches the synthetic insert offset {_INSERT_OFFSET}"
    )
    delta = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.concat(F.lit("UPDATED: "), "text").alias("text"))
        .unionByName(
            d.filter(F.col("doc_id") % 25 == 0).select(
                (F.col("doc_id") + _INSERT_OFFSET).alias("doc_id"), "text"
            )
        )
    )
    tmp = tempfile.mkdtemp(prefix="lakehouse_q_")
    try:
        t = LakehouseTable(tmp)
        t.merge(d, ["doc_id"])
        v1 = t.merge(delta, ["doc_id"])
        v2 = t.merge(delta, ["doc_id"])  # idempotent re-run
        assert v2 == v1, f"re-applied merge advanced the version: {v1} -> {v2}"
        return t.read(spark).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _drain_stream(
    spark: SparkSession,
    out: DataFrame,
    prefix: str,
    output_mode: str = "append",
    state_partitions: int = 8,
) -> DataFrame:
    """Run a streaming frame to completion with Trigger.AvailableNow into a
    uniquely-named memory sink and return the drained table. Checkpoint dirs
    are per-invocation temp dirs (queries must be re-runnable: the driver and
    bench call each registry entry several times). Windowed aggregations
    drain in ``complete`` mode: under ``append`` the final watermark never
    passes the last window, so its rows would be withheld at termination.

    ``state_partitions`` sizes the stateful shuffle for a BOUNDED drain:
    every state partition pays store init/commit per microbatch (x4 stores
    for a stream-stream join), so an oversized count is pure overhead here —
    measured 7.9s -> 2.6s on the stream-stream join going 32 -> 8. This is
    the streaming analogue of what AQE does for batch shuffles; a long-lived
    production stream sizes it by throughput instead (and can't change it
    after the first checkpoint). The caller session's conf is restored after
    the drain — partition count never affects results, only task count."""
    import shutil
    import tempfile
    import uuid

    from ..streaming import run_available_now

    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{prefix}_")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        run_available_now(out, ckpt, query_name=name, output_mode=output_mode)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


@register(
    "streaming_first_seen_users",
    sql="""
WITH r AS (
  SELECT user_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts FROM r WHERE rn = 1
""",
)
def streaming_first_seen_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.13 stateful streaming in the correctness gate, not just pytest:
    the applyInPandasWithState first-seen operator (W4 as a stream,
    broken_links.py:34-43's in-memory ``used`` set made a keyed state store)
    drained with Trigger.AvailableNow must equal the batch
    row_number()=1 oracle. Ties on the minimum ts emit that ts regardless of
    which tied row wins, so the (user_id, first_ts) surface is deterministic."""
    from ..streaming import read_events_stream, streaming_first_seen

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = streaming_first_seen(stream, ["user_id"], "ts")
    return _drain_stream(spark, out, "t_first_seen").select(
        "user_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts")
    )


@register(
    "streaming_cdc_events",
    sql="""
WITH h AS (
  SELECT user_id, ts, event_id, md5(event_type) AS h FROM events
), s AS (
  SELECT user_id, ts, h,
         lag(h) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM h
)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CASE WHEN prev IS NULL THEN 'new'
            WHEN prev = h THEN 'same' ELSE 'changed' END AS status
FROM s
""",
)
def streaming_cdc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.13 stateful streaming CDC in the correctness gate: per user, each
    event's content hash against the previous one (the reference's
    snapshot-diff classification, obsolete/prepare_data_for_es.py:41-169, as
    a keyed state stream) — new/same/changed statuses must match the batch
    lag() oracle. order_cols pins tie-breaks on (ts, event_id) so the
    classification is partitioning-independent."""
    from ..streaming import read_events_stream
    from ..streaming.stateful import streaming_cdc

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    feed = stream.withColumn("h", F.md5("event_type"))
    out = streaming_cdc(feed, ["user_id"], "h", "ts", order_cols=["ts", "event_id"])
    return _drain_stream(spark, out, "t_cdc").select(
        "user_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"), "status"
    )


@register(
    "streaming_tumbling_events",
    sql=QUERIES["tumbling_window_events"]["sql"],
)
def streaming_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.13 watermarked WINDOW aggregation as a TRUE stream in the gate —
    the third streaming code path next to the two applyInPandasWithState
    queries: readStream -> withWatermark -> window groupBy, drained with
    AvailableNow in complete mode (append would withhold the final window:
    the watermark never passes it at termination) and checked against the
    batch date_trunc oracle. With the 1h watermark the state store GC's
    closed windows — the property that lets this plan run forever."""
    from ..streaming import read_events_stream

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = tumbling_agg(stream, "1 hour", watermark="1 hour")
    return _drain_stream(spark, out, "t_tumbling", output_mode="complete")


@register(
    "session_window_native_events",
    sql="""
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, session_id
""",
)
def session_window_native_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window on the batch path (window end = last
    event + gap, per streaming semantics) — oracle reproduces via lag/cumsum."""
    return session_window_agg(_t(spark, sf_dir, "events"), gap="30 minutes")


@register(
    "streaming_session_events",
    sql=QUERIES["session_window_native_events"]["sql"],
)
def streaming_session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.13 session_window as a TRUE stream in the gate — the engine's
    dynamic-gap session state (merging sessions as late rows arrive) drained
    with AvailableNow in complete mode and checked against the same batch
    lag+cumsum oracle as the native batch form. Together with
    streaming_tumbling_events and the two applyInPandasWithState queries,
    every streaming aggregation family the engine ships is now exercised as
    an actual stream, not only via batch parity."""
    from ..streaming import read_events_stream

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = session_window_agg(stream)
    return _drain_stream(spark, out, "t_session", output_mode="complete")


@register(
    "embedding_topk_quantized",
    sql=f"""
WITH c0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
cq AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM c0),
cd AS (SELECT vec_id AS cid,
              CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
                   ELSE list_transform(v, x -> CAST(round(x / scale) AS INTEGER) * scale)
              END AS cv
       FROM cq),
q AS (SELECT vec_id AS qid, list_transform(embedding, x -> x::DOUBLE) AS qv
      FROM embeddings WHERE vec_id < 5),
scored AS (SELECT qid, cid, round({_COS}, 4) AS cosine FROM q, cd WHERE qid <> cid),
r AS (SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
      FROM scored)
SELECT qid AS query_id, cid AS neighbour_id, cosine, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
""",
)
def embedding_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k search against the int8-QUANTIZED corpus (full-precision
    queries, dequantized corpus scoring) — what an ANN deployment actually
    runs against a 4x-compressed store. The oracle recomputes the
    quantize -> dequantize -> cosine chain bit-identically, so this gates
    the whole quantized search arithmetic, not just the codes. At scale the
    corpus column is array<tinyint> on disk; the dequantize is a scan-local
    expression fused into scoring."""
    from ..llm.similarity import dequantize_expr, quantize_int8
    from ..operators.caching import scoped_persist

    e = _t(spark, sf_dir, "embeddings")
    # Materialize the dequantized corpus BEFORE the query cross-join: the
    # quantize->dequantize chain is three interpreted array transforms, and
    # without the persist it re-evaluates once per (query, corpus) pair —
    # n_queries x the work (measured 2.5s -> 0.7s at sf0.1). At scale this is
    # the same rule as the IVF index: reconstruct once, score many.
    corpus = scoped_persist(
        quantize_int8(e).select("vec_id", dequantize_expr().alias("dv"))
    )
    queries = e.filter(F.col("vec_id") < 5)
    return cosine_topk(
        queries, corpus, "vec_id", "vec_id",
        query_vec="embedding", corpus_vec="dv", k=5,
    )


@register(
    "simhash_near_dup_pairs",
    sql=f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' zzdup' FROM documents
), w AS (
  SELECT id, unnest({_W}) AS word FROM corpus
), h AS (
  SELECT id, {md5_bucket_sql("word", 8)} AS hw FROM w
), bits AS (
  SELECT id, b.bit,
         sum(CASE WHEN (hw >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(generate_series(0, 31)) AS bit) b
  GROUP BY id, b.bit
), sh AS (
  SELECT id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS sh
  FROM bits GROUP BY id
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sh a, sh b
WHERE a.id < b.id AND bit_count(xor(a.sh, b.sh)) <= 3
""",
)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash completed into a dedup operator: banded hamming-ball pair
    search (4 bands of 8 bits over a 32-bit signature -> lossless for
    hamming <= 3 by pigeonhole) over the same doc+perturbed-copy corpus as
    the other near-dup queries; the oracle is the exact quadratic hamming
    answer. The Spark side never forms all pairs — candidates come from the
    (band, value) equi-join. 32-bit, not the 16-bit signature of
    ``simhash_documents``: 4-bit bands have only 16 values, so at 20k docs
    every bucket holds ~1.2k docs and the join degenerates toward quadratic
    (measured 13s; 8-bit bands: ~1.3s at identical output semantics)."""
    from ..llm.dedup import simhash_near_dup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" zzdup")).alias("text"),
        )
    )
    # max_bucket_size=None: this query IS the oracle-parity surface, and the
    # exact quadratic oracle knows nothing of the production ceiling — at
    # sf0.1 the narrow 256-value bands grow hot buckets and the guard's
    # star-pair subset diverged from the exact answer (PARITY r12 sf0.1
    # gate). The guarded default is the production path, measured on the
    # SCALING hot-cluster rung; the gate pins the exact form at every SF.
    return simhash_near_dup(
        corpus, "text", "doc_id", max_hamming=3, bits=32, max_bucket_size=None
    )


@register(
    "simhash_near_dup_pairs_wide",
    sql=f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' zzdup' FROM documents
), w AS (
  SELECT id, unnest({_W}) AS word FROM corpus
), h AS (
  SELECT id, {md5_bucket_sql("word", 12)} AS hw FROM w
), bits AS (
  SELECT id, b.bit,
         sum(CASE WHEN (hw >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(generate_series(0, 47)) AS bit) b
  GROUP BY id, b.bit
), sh AS (
  SELECT id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS sh
  FROM bits GROUP BY id
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sh a, sh b
WHERE a.id < b.id AND bit_count(xor(a.sh, b.sh)) <= 3
""",
)
def simhash_near_dup_pairs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CORPUS-SCALE parameterization of ``simhash_near_dup_pairs``
    (VERDICT r11 #6): a 48-bit signature banded 4x12 gives 4096 distinct
    values per band — a keyspace that keeps bucket occupancy flat as the
    corpus grows, where the 32-bit/8-bit-band registered query's 256-value
    bands fill linearly and trend the self-join quadratic (its docstring
    measured the 16-bit default degenerating 13s -> 1.3s at 20k docs just
    from 4->8-bit bands). Identical operator, identical hamming ball
    (<= 3); the oracle recomputes the exact quadratic answer over the same
    12-hex-digit md5 word hashes, so this also pins the wide-signature
    arithmetic cross-engine. Default-argument scale callers are steered
    here by the narrow-band RuntimeWarning in ``simhash_near_dup``."""
    from ..llm.dedup import simhash_near_dup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" zzdup")).alias("text"),
        )
    )
    # max_bucket_size=None for the same reason as simhash_near_dup_pairs:
    # the parity surface is the exact form (even 4096-value bands grew one
    # hot bucket at sf0.1); the production ceiling is SCALING-measured
    return simhash_near_dup(
        corpus, "text", "doc_id", max_hamming=3, bits=48, max_bucket_size=None
    )


@register(
    "classifier_score_documents",
    sql=None,  # assigned below: needs the generated weight-fold fragment
)
def classifier_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier scored in the scan
    (llm/curation.py::hashed_classifier_sum): tokens hash to 4096 feature
    buckets (md5 fold), each bucket carries a deterministic integer weight,
    and the document's keep decision is sign(weight sum). The INTEGER sum is
    the parity surface — exact and order-independent, where a double
    accumulation would depend on element order and libm; logit =
    sum/(space*n) is a correctly-rounded IEEE division of exact integers so
    it hashes identically too. This is the fastText-quality-filter shape:
    zero shuffle, whole-stage codegen, weights swappable for a trained
    broadcast vector without changing the plan."""
    from ..llm.curation import hashed_classifier_sum
    from ..llm.textanalysis import words as _words_fn

    d = _t(spark, sf_dir, "documents")
    ws = _words_fn("text")
    base = d.select(
        "doc_id",
        hashed_classifier_sum(ws).alias("wsum"),
        F.size(ws).alias("n"),
    )
    return base.select(
        "doc_id",
        "wsum",
        F.when(
            F.col("n") > 0,
            F.round(F.col("wsum") / (F.lit(4096.0) * F.col("n")), 6),
        ).alias("logit"),
        (F.col("wsum") > 0).alias("keep"),
    )


def _install_classifier_sql() -> None:
    from ..llm.curation import hashed_classifier_sum_sql

    QUERIES["classifier_score_documents"]["sql"] = f"""
WITH w AS (SELECT doc_id, {_W} AS words FROM documents),
s AS (SELECT doc_id, {hashed_classifier_sum_sql('words')} AS wsum,
             len(words) AS n
      FROM w)
SELECT doc_id, wsum,
       CASE WHEN n > 0 THEN round(wsum / (4096.0 * n), 6) END AS logit,
       wsum > 0 AS keep
FROM s
"""


_install_classifier_sql()


def _install_url_dedup_sql() -> None:
    from ..llm.curation import normalize_url_sql

    url = (
        "CASE doc_id % 4 "
        "WHEN 0 THEN 'http://example' || (doc_id % 50) || '.com/p/' || (doc_id % 200) || '?id=7' "
        "WHEN 1 THEN 'HTTP://EXAMPLE' || (doc_id % 50) || '.COM/p/' || (doc_id % 200) || '/' "
        "WHEN 2 THEN 'http://example' || (doc_id % 50) || '.com/p/' || (doc_id % 200) "
        "|| '?utm_source=x&utm_campaign=y&id=7' "
        "ELSE 'http://example' || (doc_id % 50) || '.com/p/' || (doc_id % 200) "
        "|| '?utm_source=a&utm_medium=b#frag' END"
    )
    QUERIES["url_dedup_documents"]["sql"] = f"""
WITH u AS (SELECT doc_id, {url} AS url FROM documents),
c AS (SELECT doc_id, {normalize_url_sql('url')} AS canon_url FROM u)
SELECT canon_url, CAST(count(*) AS BIGINT) AS n_variants,
       CAST(min(doc_id) AS BIGINT) AS keeper
FROM c GROUP BY canon_url
"""


@register("url_dedup_documents", sql=None)  # SQL installed below (generated chain)
def url_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL canonicalization + dedup (llm/curation.py::
    normalize_url): deterministic dirty variants — uppercase scheme/host,
    trailing slash, utm/gclid tracking params, fragments — are synthesized
    per doc, normalized by the pure-regexp chain (no lookaround, so Java
    regex and RE2 agree literally), and deduped with one hash-groupBy on the
    canonical string keeping min(doc_id). The oracle rebuilds the SAME chain
    from normalize_url_sql, generated from the same constants. At 100 TB the
    canonicalization is scan-local; the groupBy is the only exchange and
    carries just (canon_url, id)."""
    from ..llm.curation import normalize_url

    d = _t(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 50).cast("string")
    m = (F.col("doc_id") % 200).cast("string")
    base = F.concat(F.lit("http://example"), k, F.lit(".com/p/"), m)
    loud = F.concat(F.lit("HTTP://EXAMPLE"), k, F.lit(".COM/p/"), m, F.lit("/"))
    url = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(base, F.lit("?id=7")))
        .when(F.col("doc_id") % 4 == 1, loud)
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(base, F.lit("?utm_source=x&utm_campaign=y&id=7")),
        )
        .otherwise(F.concat(base, F.lit("?utm_source=a&utm_medium=b#frag")))
    )
    u = d.select("doc_id", url.alias("url"))
    c = u.select("doc_id", normalize_url("url").alias("canon_url"))
    return c.groupBy("canon_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_variants"),
        F.min("doc_id").cast("long").alias("keeper"),
    )


_install_url_dedup_sql()


@register(
    "incremental_dedup_documents",
    sql=f"""
WITH b0 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 20 = 0 THEN doc_id + 1
              WHEN doc_id % 20 = 10 THEN doc_id + 2
              ELSE doc_id END AS src,
         doc_id % 20 AS r
  FROM documents WHERE doc_id % 5 = 0
), batch AS (
  SELECT b0.doc_id AS id,
         CASE WHEN r = 10 THEN d.text || ' qq7 qq8' ELSE d.text END AS text
  FROM b0 JOIN documents d ON d.doc_id = b0.src
), idx AS (
  SELECT doc_id AS id, text FROM documents WHERE doc_id % 5 <> 0
), bw AS (SELECT id, text, {_W} AS words FROM batch),
bs AS (SELECT id, md5(text) AS h, {_SH3} AS s FROM bw),
iw AS (SELECT id, text, {_W} AS words FROM idx),
isx AS (SELECT id, md5(text) AS h, {_SH3} AS s FROM iw),
near AS (
  SELECT b.id, count(DISTINCT i.id) AS n_near
  FROM bs b, isx i
  WHERE CAST(least(len(b.s), len(i.s)) AS DOUBLE)
        / greatest(len(b.s), len(i.s)) >= 0.8
    AND round(CAST(len(list_intersect(b.s, i.s)) AS DOUBLE)
              / len(list_distinct(list_concat(b.s, i.s))), 4) >= 0.8
  GROUP BY b.id
)
SELECT bs.id, EXISTS(SELECT 1 FROM isx WHERE isx.h = bs.h) AS dup_exact,
       CAST(coalesce(near.n_near, 0) AS BIGINT) AS n_near_index,
       NOT EXISTS(SELECT 1 FROM isx WHERE isx.h = bs.h)
         AND coalesce(near.n_near, 0) = 0 AS is_new
FROM bs LEFT JOIN near ON bs.id = near.id
""",
)
def incremental_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new batch against a standing corpus index
    (llm/dedup.py::incremental_dedup) — the 100 TB production shape: the
    corpus is NEVER re-deduped; the increment probes its hash set (exact
    tier) and its LSH band table (near tier, batch side broadcast so the
    index never shuffles). Batch = every 5th doc, seeded so all outcomes
    occur: %20==0 exact-copies an index doc, %20==10 carries a perturbed
    near-copy (+2 tokens, jaccard ~0.9), the rest keep their own text. The
    oracle computes the exact blocking-free batch x index answer (count-ratio
    prefilter is lossless at jaccard >= 0.8); 32 hashes / 16 bands puts
    P(band-miss at 0.9) ~ 3e-12, far below the gate's resolution."""
    from ..llm.dedup import incremental_dedup

    d = _t(spark, sf_dir, "documents")
    b0 = d.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") % 20 == 0, F.col("doc_id") + 1)
        .when(F.col("doc_id") % 20 == 10, F.col("doc_id") + 2)
        .otherwise(F.col("doc_id"))
        .alias("src"),
        (F.col("doc_id") % 20).alias("r"),
    )
    batch = b0.join(d.select("doc_id", "text"), b0["src"] == F.col("doc_id")).select(
        "id",
        F.when(F.col("r") == 10, F.concat("text", F.lit(" qq7 qq8")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    idx = d.filter(F.col("doc_id") % 5 != 0).select(F.col("doc_id").alias("id"), "text")
    return incremental_dedup(
        batch, idx, "text", "id", n_hashes=32, bands=16, k=3, jaccard_threshold=0.8
    )


@register(
    "shard_plan_documents",
    sql=f"""
WITH s AS (
  SELECT doc_id, ({md5_bucket_sql('doc_id')}) % 8 AS shard,
         len({_W}) AS n_words
  FROM documents
)
SELECT CAST(shard AS INT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id
FROM s GROUP BY shard
""",
)
def shard_plan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shard writer's assignment rule (sinks/shards.py::shard_assignment,
    md5-fold mod n — stable across partitioning/retries/engines) surfaced as
    a queryable plan: per-shard doc counts, token mass, and id range. This is
    the pre-flight a training run does before writing 100 TB of shards —
    checking balance (md5 gives ~uniform mass) without writing a byte; the
    oracle recomputes the fold from the same generated fragment."""
    from ..llm.textanalysis import words as _words_fn
    from ..sinks.shards import shard_assignment

    d = _t(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        shard_assignment("doc_id", 8).alias("shard"),
        F.size(_words_fn("text")).alias("n_words"),
    )
    return s.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
    )


@register(
    "streaming_dedup_events",
    sql="""
SELECT CAST(event_id AS BIGINT) AS event_id, user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM events
""",
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming at-least-once dedup in the correctness gate
    (streaming/windows.py::dedup_within_watermark): the event stream is
    UNIONED WITH ITSELF to simulate redelivery, then
    dropDuplicatesWithinWatermark(event_id) must emit each event exactly
    once — the oracle is simply the events table. The operator's state is
    watermark-bounded (keys GC as event time advances), which is what lets
    it run unbounded where dropDuplicates' state would grow forever. The
    duplicate payloads are identical, so which copy wins is immaterial to
    the output surface."""
    from ..streaming import read_events_stream
    from ..streaming.windows import dedup_within_watermark

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    redelivered = stream.unionByName(stream)
    out = dedup_within_watermark(redelivered, ["event_id"], "ts", "1 hour")
    return _drain_stream(spark, out, "t_dedup").select(
        F.col("event_id").cast("long").alias("event_id"),
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    )


@register(
    "range_join_events_windows",
    sql="""
WITH w AS (
  SELECT k AS window_id,
         1704067200000000 + k * 25200000000 AS s_us,
         1704067200000000 + k * 25200000000 + 32400000000 AS e_us
  FROM (SELECT unnest(generate_series(0, 99)) AS k)
), e AS (SELECT event_id, value, epoch_us(ts) AS ts_us FROM events)
SELECT CAST(window_id AS BIGINT) AS window_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM e JOIN w ON e.ts_us BETWEEN w.s_us AND w.e_us
GROUP BY window_id
""",
)
def range_join_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bucketing (operators/rangejoin.py): 100 overlapping
    9-hour analysis windows at a 7-hour stride over January 2024, joined to
    every event they contain. The naive BETWEEN join is a
    BroadcastNestedLoopJoin — O(points x intervals); the bucketed form
    shuffles both sides on an 8-byte bucket key (width = the 9h interval
    length, so each interval explodes to at most 2 buckets) and applies the
    exact BETWEEN post-join. Axis is epoch MICROseconds on both sides, so
    boundary inclusivity is bit-exact against the oracle's plain BETWEEN
    join. Output is the per-window rollup a monitoring pipeline would feed."""
    from ..operators.rangejoin import range_join_bucketed

    base_us = 1704067200000000  # 2024-01-01 00:00:00 UTC
    stride_us = 25200000000  # 7 h
    length_us = 32400000000  # 9 h
    windows = spark.range(100).select(
        F.col("id").alias("window_id"),
        (F.lit(base_us) + F.col("id") * stride_us).alias("s_us"),
        (F.lit(base_us) + F.col("id") * stride_us + length_us).alias("e_us"),
    )
    # ts is TIMESTAMP_NTZ off parquet; unix_micros needs LTZ. The cast reads
    # the naive value in the session zone — pinned UTC, same as DuckDB's
    # epoch_us over its naive timestamps, so the epoch axes agree exactly.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("ts_us"),
    )
    joined = range_join_bucketed(ev, windows, "ts_us", "s_us", "e_us", length_us)
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def _install_hll_sql() -> None:
    from ..operators.sketches import hll_sql

    QUERIES["hll_distinct_orders"]["sql"] = f"""
WITH est AS ({hll_sql("o_custkey", "orders")}),
ex AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact FROM orders)
SELECT est.hll_estimate, est.n_registers_used, ex.n_exact FROM est, ex
"""


@register("hll_distinct_orders", sql=None)  # SQL installed below (generated)
def hll_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog (operators/sketches.py): distinct buyers
    estimated from 256 integer registers derived from md5 — reproducible
    across engines, runs, and partitionings, unlike approx_count_distinct's
    Spark-internal HLL++. The oracle recomputes the ENTIRE sketch (register
    maxima, exact power-of-two Z sum, correction branch) from the generated
    mirror SQL and must match the estimate to 4dp — which it can, because
    rho uses integer/string logic only and Z's power-of-two terms sum
    exactly in any order. The exact distinct count rides along to show the
    error profile. One scan, algebraic aggregate, 256-row final state: the
    sketch costs the same at 100 TB."""
    from ..operators.sketches import hll_distinct

    o = _t(spark, sf_dir, "orders")
    est = hll_distinct(o, "o_custkey")
    exact = o.agg(F.countDistinct("o_custkey").cast("long").alias("n_exact"))
    return est.crossJoin(exact)


_install_hll_sql()


@register(
    "exact_percentiles_lineitem",
    sql="""
WITH r AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       round(min(CASE WHEN rn >= CAST(ceil(0.5 * n) AS BIGINT) THEN l_extendedprice END), 2) AS p50,
       round(min(CASE WHEN rn >= CAST(ceil(0.95 * n) AS BIGINT) THEN l_extendedprice END), 2) AS p95,
       round(min(CASE WHEN rn >= CAST(ceil(0.99 * n) AS BIGINT) THEN l_extendedprice END), 2) AS p99,
       CAST(max(n) AS BIGINT) AS n
FROM r GROUP BY l_returnflag
""",
)
def exact_percentiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group percentiles at fact scale — the deterministic rule
    'smallest value whose rank >= ceil(p*n)' spelled out identically in both
    engines, rather than approx_percentile (whose t-digest answer is
    engine-internal) or engine quantile functions (whose interpolation
    conventions differ). DISTRIBUTED order statistics, no per-group sort:
    the percentile of a value distribution depends only on per-VALUE counts
    (the rank of the first row carrying value v is cum_count(< v)+1, so the
    p-th percentile is the smallest v with cum_count(<= v) >= ceil(p*n)).
    Phase 1 collapses the fact table to a (group, value) histogram — a
    map-side-combinable groupBy with full parallelism; phase 2 runs
    running_totals' two-phase cumsum over that histogram (range exchange on
    (group, value), parallel partial cumsums, broadcast prefix offsets).
    The old plan's Window.partitionBy(l_returnflag) bounded parallelism by
    the ~3 distinct flags — 3 tasks each sorting n/3 of the fact table —
    this plan's parallelism is bounded only by the partition count."""
    from ..operators.windows import running_totals

    lineitem = _t(spark, sf_dir, "lineitem")
    hist = lineitem.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    cum = running_totals(
        hist,
        "__c",
        order_by=[("l_extendedprice", "asc")],
        partition_by=["l_returnflag"],
        cum_col="__cum",
    )
    # group totals read off the cumsum's own (persisted) histogram — max cum
    # per group IS n; no second pass over the fact table
    n_by_g = F.broadcast(
        cum.groupBy("l_returnflag").agg(F.max("__cum").cast("long").alias("n"))
    )
    r = cum.join(n_by_g, "l_returnflag")

    def pick(p: float):
        return F.min(
            F.when(
                F.col("__cum") >= F.ceil(F.lit(p) * F.col("n")).cast("long"),
                F.col("l_extendedprice"),
            )
        )

    return r.groupBy("l_returnflag").agg(
        F.round(pick(0.5), 2).alias("p50"),
        F.round(pick(0.95), 2).alias("p95"),
        F.round(pick(0.99), 2).alias("p99"),
        F.max("n").cast("long").alias("n"),
    )


@register(
    "vocab_top_terms_documents",
    sql=f"""
WITH t AS (SELECT unnest({_W}) AS term FROM documents),
c AS (SELECT term, CAST(count(*) AS BIGINT) AS freq FROM t GROUP BY term)
SELECT term, freq,
       CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank
FROM c ORDER BY rank LIMIT 200
""",
)
def vocab_top_terms_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction — the first step of BPE/tokenizer training and
    of frequency-based filtering: corpus-wide term counts with a total order
    (freq DESC, term ASC) and a top-K cut. explode -> count is map-side
    combinable (partial counts collapse before the exchange), and the top-K
    is TakeOrderedAndProject — per-partition heaps, never a global sort. The
    heaviest NL word carries ~1/vocab of the corpus: real skew, handled by
    the partial aggregation, not salting. Ranks on the 200-row top-K frame
    come from bounded_running's broadcast self-join (count of
    at-or-before rows), not a no-partition WindowExec."""
    from ..llm.textanalysis import words as _words_fn
    from ..operators.windows import bounded_running

    d = _t(spark, sf_dir, "documents")
    c = (
        d.select(F.explode(_words_fn("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    from ..operators.caching import scoped_persist

    # the top-K frame feeds both sides of bounded_running's self-join;
    # persist so the corpus scan + TakeOrdered run once
    top = scoped_persist(c.orderBy(F.desc("freq"), F.asc("term")).limit(200))
    return bounded_running(
        top, order_by=[("freq", "desc"), ("term", "asc")], rank_col="rank"
    )


@register(
    "frequent_tokens_mg_documents",
    sql=f"""
WITH t AS (SELECT unnest({_W}) AS term FROM documents)
SELECT value, n, rank FROM (
  SELECT term AS value, CAST(count(*) AS BIGINT) AS n,
         CAST(row_number() OVER (ORDER BY count(*) DESC, term ASC) AS BIGINT)
           AS rank
  FROM t WHERE term IS NOT NULL GROUP BY term
) WHERE rank <= 20
""",
)
def frequent_tokens_mg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 corpus tokens via two-phase Misra-Gries
    (operators/frequent.py, new r10) — the heavy-hitters alternative to
    vocab_top_terms' full groupBy: per-partition bounded-state summaries
    nominate candidates (<= capacity rows per partition reach the merge),
    exact counts are re-counted for candidates only, and an
    N/(capacity+1) certificate proves the result equals the full groupBy
    — which is exactly what the oracle runs (natural-language token
    frequencies are Zipfian, so the certificate holds and the fast path
    serves; on flat data the operator falls back to the plain plan and
    still matches). At 100 TB this is the difference between shuffling
    billions of per-partition (token, count) partials and shuffling
    capacity * partitions rows."""
    from ..llm.textanalysis import words as _words_fn
    from ..operators.frequent import frequent_items

    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(_words_fn("text")).alias("term"))
    return frequent_items(toks, "term", k=20, capacity=4096)


@register(
    "weighted_sample_documents",
    sql=f"""
WITH u AS (
  SELECT doc_id, n_chars,
         ({md5_bucket_sql('doc_id')} + 1.0) / 16777217.0 AS u
  FROM documents
), k AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         ln(u) / n_chars AS key
  FROM u WHERE n_chars > 0
)
SELECT doc_id, weight FROM k ORDER BY key DESC, doc_id LIMIT 50
""",
)
def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws u from the md5 fold (portable, stable
    across runs/partitionings — never rand()) and ranks by u^(1/w),
    computed in log space as ln(u)/w. Top-50 by that key IS a weighted
    sample: selection probability proportional to n_chars. The plan is
    TakeOrderedAndProject over (double, long) — per-partition heaps, no
    global sort; at 100 TB this is how you draw a fixed-size quality-
    weighted eval set in one scan. Output carries (doc_id, weight) only —
    integers — so the gate surface is exact; the ln-key itself stays
    internal (libm ulps must not be a contract)."""
    from ..llm.curation import md5_bucket

    d = _t(spark, sf_dir, "documents")
    u = (md5_bucket("doc_id") + F.lit(1.0)) / F.lit(16777217.0)
    k = d.filter(F.col("n_chars") > 0).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        (F.log(u) / F.col("n_chars")).alias("key"),
    )
    return k.orderBy(F.desc("key"), F.asc("doc_id")).limit(50).select("doc_id", "weight")


@register(
    "label_centroids_embeddings",
    sql="""
WITH e AS (
  SELECT label, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
), q AS (
  SELECT label, pos - 1 AS dim,
         CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xq
  FROM e
)
SELECT label, CAST(dim AS INT) AS dim,
       round(sum(xq) / (1000000.0 * count(*)), 6) AS centroid,
       CAST(count(*) AS BIGINT) AS n
FROM q GROUP BY label, dim
""",
)
def label_centroids_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids with an EXACT parity surface: each
    coordinate is quantized to an integer (round(x*1e6) — micro-units),
    summed exactly (order-independent, unlike a float sum), and the mean is
    one correctly-rounded IEEE division — so the engine and oracle agree
    bit-for-bit without trusting float accumulation order. posexplode ->
    groupBy(label, dim) is map-side combinable; the exchange carries
    (label, dim, partial-sum) rows only. This is the class-prototype
    computation behind centroid-based dedup/clustering and drift checks."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "label",
        F.col("dim").cast("int").alias("dim"),
        F.round(F.col("x").cast("double") * 1000000).cast("long").alias("xq"),
    )
    return q.groupBy("label", "dim").agg(
        F.round(F.sum("xq") / (F.lit(1000000.0) * F.count(F.lit(1))), 6).alias(
            "centroid"
        ),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "streaming_join_events",
    sql="""
SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
       CAST(c.event_id AS BIGINT) AS click_id,
       p.user_id,
       round(p.value, 2) AS purchase_value
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
""",
)
def streaming_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM join in the correctness gate: purchases joined to the
    same user's clicks in the preceding hour, both sides true streams of the
    same source with watermarks — the time-range condition is what lets the
    engine bound both state stores (a click older than the watermark plus
    the hour window can never match a future purchase and is evicted), the
    property that makes stream-stream joins run forever at production rates.
    Drained AvailableNow; the oracle is the equivalent batch interval join.
    Completes the streaming surface: windows (tumbling/sliding/session),
    custom state (first-seen, CDC), dedup, and now two-sided join state."""
    from ..streaming import read_events_stream
    from ..streaming.windows import _ensure_event_time

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = _ensure_event_time(read_events_stream(spark, f"{sf_dir}/events.parquet"))
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.round("value", 2).alias("purchase_value"),
        )
    )
    c = (
        stream.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    return _drain_stream(spark, joined, "t_ssjoin").select(
        F.col("purchase_id").cast("long"),
        F.col("click_id").cast("long"),
        F.col("p_user").alias("user_id"),
        "purchase_value",
    )


def _install_bloom_sql() -> None:
    from ..llm.curation import md5_bucket_sql

    folds = [
        "(" + md5_bucket_sql(f"'{i}:' || gm", 5) + ") % 65536" for i in range(3)
    ]
    QUERIES["bloom_decontaminate_documents"]["sql"] = f"""
WITH w AS (SELECT doc_id, {_W} AS words FROM documents),
g AS (SELECT doc_id, {_SH5} AS s FROM w),
bg AS (SELECT DISTINCT unnest(s) AS gm FROM g WHERE doc_id % 97 = 0),
bits AS (
  SELECT DISTINCT {folds[0]} AS bit FROM bg
  UNION SELECT DISTINCT {folds[1]} FROM bg
  UNION SELECT DISTINCT {folds[2]} FROM bg
),
dg AS (SELECT DISTINCT doc_id, unnest(s) AS gm FROM g),
inb AS (
  SELECT doc_id, gm,
         {folds[0]} IN (SELECT bit FROM bits)
         AND {folds[1]} IN (SELECT bit FROM bits)
         AND {folds[2]} IN (SELECT bit FROM bits) AS in_bloom
  FROM dg
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN in_bloom THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       sum(CASE WHEN in_bloom THEN 1 ELSE 0 END) > 0 AS contaminated
FROM inb GROUP BY doc_id
"""


@register("bloom_decontaminate_documents", sql=None)  # SQL installed below
def bloom_decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-bounded decontamination (llm/curation.py::bloom_decontaminate):
    the benchmark's 5-gram set compressed to 3 md5-derived bit positions per
    gram in a 2^16 space, held as a broadcast RELATION of set bits; a doc
    gram is contaminated iff all 3 positions join. Bloom false positives are
    deterministic here (md5), so engine and oracle agree on every hit —
    compare against decontaminate_documents' exact counts for the realized
    FP rate. At 100 TB the bit table is kilobytes where the gram set would
    be gigabytes; the corpus side stays scan-local + one broadcast probe."""
    from ..llm.curation import bloom_decontaminate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return bloom_decontaminate(d, bench, "text", "doc_id", n=5).select(
        F.col("id").alias("doc_id"), "n_grams", "n_bloom_hits", "contaminated"
    )


_install_bloom_sql()


@register(
    "pmi_bigrams_documents",
    sql=f"""
WITH w AS (SELECT doc_id, {_W} AS words FROM documents),
uni AS (
  SELECT unnest(words) AS t FROM w
), ucnt AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY t
), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ucnt),
bg AS (
  SELECT u.t1 AS t1, u.t2 AS t2 FROM (
    SELECT unnest(CASE WHEN len(words) >= 2
                       THEN list_transform(generate_series(1, len(words)-1),
                                           i -> {{'t1': words[i], 't2': words[i+1]}})
                       ELSE [] END) AS u
    FROM w
  )
), bcnt AS (
  SELECT t1, t2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY t1, t2
), scored AS (
  SELECT b.t1, b.t2, b.c12, u1.c AS c1, u2.c AS c2,
         round(ln(CAST(b.c12 AS DOUBLE) * tot.n / (u1.c * u2.c)), 4) AS pmi
  FROM bcnt b
  JOIN ucnt u1 ON b.t1 = u1.t
  JOIN ucnt u2 ON b.t2 = u2.t
  CROSS JOIN tot
  WHERE b.c12 >= 5
)
SELECT t1, t2, c12, c1, c2, pmi,
       CAST(row_number() OVER (ORDER BY pmi DESC, t1, t2) AS BIGINT) AS rank
FROM scored QUALIFY rank <= 100
""",
)
def pmi_bigrams_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-100 adjacent word pairs by pointwise mutual
    information — the statistic behind phrase detection in tokenizer/embedding
    pipelines. Counts are exact integers (bigram pairs via a posexplode-lead
    pair walk; unigram totals map-side combined); only the final ln ratio is
    floating point, rounded 4dp on identical integer inputs. The c12 >= 5
    support floor is what keeps PMI from degenerating to rare-pair noise —
    and keeps the scored set small. Joins to unigram counts broadcast (the
    vocabulary is dimension-sized relative to the corpus)."""
    from pyspark.sql import Window

    from ..llm.textanalysis import words as _words_fn

    d = _t(spark, sf_dir, "documents")
    w = d.select(_words_fn("text").alias("ws"))
    uni = w.select(F.explode("ws").alias("t")).groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = uni.agg(F.sum("c").cast("long").alias("n"))
    pairs = w.select(
        F.explode(
            F.zip_with(
                F.slice("ws", 1, F.greatest(F.size("ws") - 1, F.lit(0))),
                F.slice("ws", 2, F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
            )
        ).alias("p")
    ).select("p.t1", "p.t2")
    bcnt = (
        pairs.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .filter(F.col("c12") >= 5)
    )
    u1 = uni.select(F.col("t").alias("t1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("t").alias("t2"), F.col("c").alias("c2"))
    scored = (
        bcnt.join(F.broadcast(u1), "t1")
        .join(F.broadcast(u2), "t2")
        .crossJoin(F.broadcast(tot))
        .select(
            "t1", "t2", "c12", "c1", "c2",
            F.round(
                F.log(F.col("c12").cast("double") * F.col("n") / (F.col("c1") * F.col("c2"))),
                4,
            ).alias("pmi"),
        )
    )
    from ..operators.caching import scoped_persist
    from ..operators.windows import bounded_running

    # persisted: the top-K frame feeds both sides of the rank self-join
    top = scoped_persist(
        scored.orderBy(F.desc("pmi"), F.asc("t1"), F.asc("t2")).limit(100)
    )
    return bounded_running(
        top,
        order_by=[("pmi", "desc"), ("t1", "asc"), ("t2", "asc")],
        rank_col="rank",
    )


@register(
    "funnel_events_users",
    sql="""
WITH s AS (
  SELECT user_id, min(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t_signup
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT s.user_id,
       strftime(s.t_signup, '%Y-%m-%d %H:%M:%S') AS t_signup,
       strftime(c.t_click, '%Y-%m-%d %H:%M:%S') AS t_click,
       strftime(p.t_purchase, '%Y-%m-%d %H:%M:%S') AS t_purchase,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS funnel_depth
FROM s LEFT JOIN c ON s.user_id = c.user_id
       LEFT JOIN p ON s.user_id = p.user_id
""",
)
def funnel_events_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: per user, the earliest signup, the earliest
    click strictly AFTER it, the earliest purchase strictly after THAT — the
    order constraint is what distinguishes a funnel from three independent
    mins. Three keyed aggregates, each joined back on user_id: every step
    shuffles only (user, ts) pairs and each successive step's input shrinks
    to survivors. Left joins keep drop-offs with their depth (1/2/3)."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    out = s.join(c, "user_id", "left").join(p, "user_id", "left")
    fmt = lambda col: F.date_format(col, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    return out.select(
        "user_id",
        fmt("t_signup").alias("t_signup"),
        fmt("t_click").alias("t_click"),
        fmt("t_purchase").alias("t_purchase"),
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .otherwise(1)
        .alias("funnel_depth"),
    )


@register(
    "retention_cohorts_events",
    sql="""
WITH f AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN f ON e.user_id = f.user_id
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(day_offset AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_active_users
FROM a GROUP BY cohort_day, day_offset
""",
)
def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen calendar day, counted on
    each later day-offset they were active — the standard product-analytics
    triangle. Two shuffles total (first-seen per user, then the distinct
    (user, offset) grid collapses into cohort cells); the per-user first-seen
    frame is broadcast back against events. Dates are derived by calendar
    truncation in both engines."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort_day"))
    a = (
        ev.join(F.broadcast(f), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return a.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_users")
    ).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"),
        "n_active_users",
    )


@register(
    "pivot_events_types",
    sql="""
SELECT user_id,
       CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
       CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
       CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
       CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
FROM events GROUP BY user_id
""",
)
def pivot_events_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-format pivot: per-user event counts, one column per event type —
    Spark's ``pivot`` with the value list PINNED (an unpinned pivot runs an
    extra distinct job to discover values and makes the output schema
    data-dependent, which breaks at scale and breaks schema contracts).
    Pinned, it compiles to exactly the oracle's conditional aggregation: one
    shuffle, map-side combinable."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types]
    )


@register(
    "cube_orders_status_priority",
    sql="""
SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all four aggregation granularities of
    (status, priority) in ONE pass — Catalyst expands the cube into an
    Expand node feeding a single shuffle, where four separate GROUP BYs
    would scan the fact table four times. Null grouping markers are
    coalesced to '(all)' so the surface is hash-stable (a real NULL status
    would be ambiguous with the subtotal marker; orders has none, and at
    scale you'd use GROUPING() bits as the discriminator)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "json_props_events",
    sql="""
WITH j AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(min(k) AS BIGINT) AS k_min, CAST(max(k) AS BIGINT) AS k_max
FROM j GROUP BY event_type
""",
)
def json_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ELT: the events' JSON ``props`` payload parsed with a
    DECLARED schema (``from_json`` — typed, vectorized, no schema-inference
    job) and aggregated. The typed path matters at 100 TB: get_json_object
    per field re-parses the document per extraction, while one from_json
    parses once into a struct Catalyst can prune. The oracle uses DuckDB's
    json_extract over the same strings."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = _t(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    j = ev.select(
        "event_type", F.from_json("props", schema)["k"].alias("k")
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("k_sum"),
        F.min("k").cast("long").alias("k_min"),
        F.max("k").cast("long").alias("k_max"),
    )


@register(
    "corr_pricing_lineitem",
    sql="""
WITH q AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), s AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(x*x) AS DECIMAL(38,0)) AS sxx,
         CAST(sum(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS syy
  FROM q GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 4)
         AS corr_qty_price
FROM s
""",
)
def corr_pricing_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from EXACT integer moments: price quantized to
    cents, then the five sums (x, y, x^2, xy, y^2) accumulate in
    DECIMAL(38,0) — exact in any order, unlike F.corr's float Welford
    streams whose result depends on partitioning AND engine. The closed-form
    ratio is evaluated from those exact sums in double at the END, so both
    engines divide identical numbers. Map-side combinable, one shuffle —
    same cost as the float version, none of its nondeterminism. (x*x at
    these magnitudes exceeds a long: the pairwise products are computed in
    DECIMAL(19,0)x int -> decimal before summing.)"""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    q = li.select("l_returnflag", x.alias("x"), y.alias("y"))
    dec = "decimal(19,0)"
    s = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sx * sy
    den = F.sqrt(
        (nd * F.col("sxx").cast("double") - sx * sx)
        * (nd * F.col("syy").cast("double") - sy * sy)
    )
    return s.select(
        "l_returnflag", "n", F.round(num / den, 4).alias("corr_qty_price")
    )


from ..llm.bpe import PINNED_BPE_MERGES as _BPE_MERGES  # noqa: E402
from ..llm.bpe import bpe_segment_sql as _bpe_segment_sql  # noqa: E402


@register(
    "bpe_token_count_documents",
    sql=_bpe_segment_sql("SELECT doc_id AS id, text FROM documents", _BPE_MERGES),
)
def bpe_token_count_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE application (llm/bpe.py::bpe_segment) with the PINNED merge
    table — the production shape: tokenizers apply a fixed, offline-trained
    vocabulary, so the gate segments with PINNED_BPE_MERGES (learned at
    import by the same deterministic learn_bpe the unit tests pin on the
    classic corpus) and the ORACLE is generated from the identical merge
    list (bpe_segment_sql: rank-order exhaustive replaces over
    sentinel-wrapped symbols — provably equal to the greedy lowest-rank
    loop). This graduated the registry's last oracle-less query to
    hash-checked (VERDICT r6 #8); the TRAINING loop (corpus word counts ->
    driver merge loop, vocabulary bounded by min_count/top_n) stays
    covered by tests/test_llm_ops.py::test_bpe_train_and_segment. Shape:
    merges ride the mapInPandas closure; the corpus pass is one
    Arrow-batched scan with a per-batch word memo — scan-local, zero
    shuffle."""
    from ..llm.bpe import bpe_segment
    from ..llm.textanalysis import words as _words_fn

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    seg = bpe_segment(d, _BPE_MERGES)
    return seg.select(
        "id",
        F.size(_words_fn("text")).cast("long").alias("n_words"),
        F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
    )


@register(
    "constraint_report_orders",
    sql="""
SELECT 'status_whitelist' AS rule,
       CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') OR o_orderstatus IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM orders
UNION ALL
SELECT 'positive_price',
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'null_priority',
       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'unique_orderkey',
       CAST(coalesce(sum(c - 1), 0) AS BIGINT)
FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'fk_customer',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
""",
)
def constraint_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (operators/validate.py::
    constraint_report): whitelist, range, not-null (all folded into ONE
    aggregation pass — a 50-rule suite costs the same scan as one rule),
    key uniqueness (one groupBy), and referential integrity against
    customer (left-anti, parent side dimension-sized). The violation COUNTS
    are the oracle surface; real pipelines assert the frame is all-zero
    (here fk/unique genuinely are, making the zero path itself checked)."""
    from ..operators.validate import constraint_report

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return constraint_report(
        o,
        row_rules={
            "status_whitelist": ~F.col("o_orderstatus").isin("O", "F", "P")
            | F.col("o_orderstatus").isNull(),
            "positive_price": F.col("o_totalprice") <= 0,
            "null_priority": F.col("o_orderpriority").isNull(),
        },
        unique={"unique_orderkey": ["o_orderkey"]},
        foreign_keys={"fk_customer": (c, ["o_custkey"], ["c_custkey"])},
    )


@register(
    "scd2_orders_history",
    sql="""
WITH snaps AS (
  SELECT o_orderkey, g,
         CASE WHEN (o_orderkey + g) % 7 = 0 THEN 'X' || CAST(g AS VARCHAR)
              ELSE o_orderstatus END AS status,
         DATE '2024-02-01' + to_days(CAST(g AS INT)) AS snap_day
  FROM orders, (SELECT unnest(generate_series(0, 2)) AS g)
), m AS (
  SELECT o_orderkey, status, snap_day,
         lag(status) OVER (PARTITION BY o_orderkey ORDER BY snap_day) AS prev
  FROM snaps
), ch AS (
  SELECT o_orderkey, status, snap_day FROM m
  WHERE prev IS NULL OR status <> prev
)
SELECT o_orderkey, status,
       strftime(snap_day, '%Y-%m-%d') AS valid_from,
       strftime(lead(snap_day) OVER (PARTITION BY o_orderkey ORDER BY snap_day),
                '%Y-%m-%d') AS valid_to,
       lead(snap_day) OVER (PARTITION BY o_orderkey ORDER BY snap_day) IS NULL
         AS is_current
FROM ch
""",
)
def scd2_orders_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history (operators/cdc.py::scd2_history): three synthetic
    daily snapshots of order status (every 7th key drifts each day — runs of
    equal state, real changes, and never-changed keys all occur) collapsed
    into validity intervals with is_current flags. One shuffle on the key;
    both windows share its sort. This is D1's hash-diff stream materialized
    the way a warehouse actually stores it — the reference's revision
    counter (dump_to_es.py:43-79) answers 'is this row current', SCD2
    answers 'what was true WHEN'."""
    from ..operators.cdc import scd2_history

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    g = spark.range(3).select(F.col("id").cast("int").alias("g"))
    snaps = o.crossJoin(F.broadcast(g)).select(
        "o_orderkey",
        F.when(
            (F.col("o_orderkey") + F.col("g")) % 7 == 0,
            F.concat(F.lit("X"), F.col("g").cast("string")),
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.date_add(F.lit("2024-02-01").cast("date"), F.col("g")).alias("snap_day"),
    )
    hist = scd2_history(snaps, ["o_orderkey"], ["status"], "snap_day")
    return hist.select(
        "o_orderkey",
        "status",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    )


@register(
    "rolling_7day_events",
    sql="""
WITH d AS (
  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dn,
         round(sum(value), 2) AS day_value,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY dn
)
SELECT CAST(dn AS BIGINT) AS day_number,
       strftime(DATE '2024-01-01' + to_days(CAST(dn AS INT)), '%Y-%m-%d') AS day,
       day_value, n_events,
       round(sum(day_value) OVER w, 2) AS value_7d,
       round(avg(day_value) OVER w, 4) AS avg_7d
FROM d
WINDOW w AS (ORDER BY dn RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def rolling_7day_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day metrics: daily totals plus a RANGE-frame rolling
    sum/avg keyed on day NUMBER (an integer axis — a RANGE frame over dates
    needs interval arithmetic that engines disagree on; the datediff axis is
    portable and makes gaps in the calendar behave correctly, which ROWS
    BETWEEN would not). The daily pre-aggregation collapses the fact table
    before any rolling math runs, so the trailing frame is a broadcast
    range self-join over a calendar-bounded frame (~days rows regardless of
    corpus size, ≤3.7k rows/decade) — no empty-partition WindowExec; the
    only full-data cost is the day groupBy."""
    from ..operators.caching import scoped_persist

    ev = _t(spark, sf_dir, "events")
    # persisted: the day frame feeds both sides of the range self-join
    d = scoped_persist(
        ev.select(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("dn"),
            "value",
        )
        .groupBy("dn")
        .agg(
            F.round(F.sum("value"), 2).alias("day_value"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    trail = F.broadcast(
        d.select(F.col("dn").alias("dn2"), F.col("day_value").alias("dv2"))
    )
    rolled = (
        d.join(
            trail,
            (F.col("dn2") >= F.col("dn") - 6) & (F.col("dn2") <= F.col("dn")),
        )
        .groupBy("dn", "day_value", "n_events")
        .agg(
            F.round(F.sum("dv2"), 2).alias("value_7d"),
            F.round(F.avg("dv2"), 4).alias("avg_7d"),
        )
    )
    return rolled.select(
        F.col("dn").cast("long").alias("day_number"),
        F.date_format(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("dn").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        "day_value",
        "n_events",
        "value_7d",
        "avg_7d",
    )


@register(
    "setops_nations_coverage",
    sql="""
WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier),
both_k AS (SELECT nk FROM cn INTERSECT SELECT nk FROM sn),
conly AS (SELECT nk FROM cn EXCEPT SELECT nk FROM sn),
sonly AS (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
SELECT n.n_name AS nation,
       CASE WHEN n.n_nationkey IN (SELECT nk FROM both_k) THEN 'both'
            WHEN n.n_nationkey IN (SELECT nk FROM conly) THEN 'customers_only'
            WHEN n.n_nationkey IN (SELECT nk FROM sonly) THEN 'suppliers_only'
            ELSE 'neither' END AS coverage
FROM nation n
""",
)
def setops_nations_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 set operations: INTERSECT / EXCEPT over the distinct nation-key
    sets of customers and suppliers, labelled per nation. Spark plans
    intersect/subtract as hash semi/anti joins over the deduplicated sides
    — dimension-sized here, broadcast by AQE; at fact scale the distinct
    collapses before any join."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    n = _t(spark, sf_dir, "nation")
    both_k = c.intersect(s).withColumn("cov", F.lit("both"))
    conly = c.subtract(s).withColumn("cov", F.lit("customers_only"))
    sonly = s.subtract(c).withColumn("cov", F.lit("suppliers_only"))
    labels = both_k.unionByName(conly).unionByName(sonly)
    return n.join(
        F.broadcast(labels), n["n_nationkey"] == labels["nk"], "left"
    ).select(
        F.col("n_name").alias("nation"),
        F.coalesce("cov", F.lit("neither")).alias("coverage"),
    )


@register(
    "outliers_events_zscore",
    sql="""
WITH q AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cv
  FROM events
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cv) AS DECIMAL(38,0)) AS s1,
         CAST(sum(CAST(cv AS DECIMAL(19,0)) * cv) AS DECIMAL(38,0)) AS s2
  FROM q GROUP BY event_type
)
SELECT q.event_id, q.event_type,
       round(q.cv / 100.0, 2) AS value,
       round((q.cv - CAST(m.s1 AS DOUBLE) / m.n)
             / sqrt(CAST(m.s2 AS DOUBLE) / m.n
                    - (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n)),
             4) AS zscore
FROM q JOIN m ON q.event_type = m.event_type
WHERE abs((q.cv - CAST(m.s1 AS DOUBLE) / m.n)
          / sqrt(CAST(m.s2 AS DOUBLE) / m.n
                 - (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n))) > 2.5
""",
)
def outliers_events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging from EXACT integer moments: values
    quantized to cents, sums and sum-of-squares in DECIMAL(38,0) (exact in
    any order — the same parity discipline as corr_pricing_lineitem), the
    z-score one IEEE expression over identical inputs. The tiny per-group
    moment frame broadcasts back against the fact scan — flagging is then
    scan-local; two passes total, no window. The >2.5-sigma threshold is
    evaluated on the same expression both sides so the kept set is exact."""
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("cv")
    )
    dec = "decimal(19,0)"
    m = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cv").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("cv").cast(dec) * F.col("cv")).cast("decimal(38,0)").alias("s2"),
    )
    j = q.join(F.broadcast(m), "event_type")
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    z = (F.col("cv") - mean) / F.sqrt(var)
    return (
        j.filter(F.abs(z) > 2.5)
        .select(
            "event_id",
            "event_type",
            F.round(F.col("cv") / 100.0, 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


@register(
    "histogram_lineitem_price",
    sql="""
WITH b AS (
  SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin, l_extendedprice
  FROM lineitem
)
SELECT bin, round(bin * 5000.0, 1) AS bin_lo,
       CAST(count(*) AS BIGINT) AS n,
       round(min(l_extendedprice), 2) AS lo,
       round(max(l_extendedprice), 2) AS hi
FROM b GROUP BY bin
""",
)
def histogram_lineitem_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram over the fact table: bin index from integer
    floor division (exact), counts map-side combined, per-bin min/max for
    the render. One scan, one dimension-sized exchange — the distribution
    profile that sits next to exact_percentiles in a data-quality report."""
    li = _t(spark, sf_dir, "lineitem")
    b = F.floor(F.col("l_extendedprice") / 5000).cast("long")
    return (
        li.select(b.alias("bin"), "l_extendedprice")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
        .select(
            "bin",
            F.round(F.col("bin") * 5000.0, 1).alias("bin_lo"),
            "n",
            "lo",
            "hi",
        )
    )


# ---------------------------------------------------------------------------
# Round-4 additions: substring-level dedup, LM quality scoring, BM25
# retrieval, portable count-min sketch, blocked record linkage.
# ---------------------------------------------------------------------------

_SPAN_K = 8


@register(
    "substring_dup_spans_documents",
    sql=f"""
WITH w AS (SELECT doc_id, {_W} AS ws FROM documents),
g AS (
  SELECT doc_id, len(ws) AS n_words,
         unnest(list_transform(
           generate_series(1, len(ws) - {_SPAN_K} + 1),
           i -> struct_pack(pos := i - 1,
                            gram := array_to_string(
                              list_slice(ws, i, i + {_SPAN_K} - 1), ' ')))) AS s
  FROM w WHERE len(ws) >= {_SPAN_K}
),
occ AS (SELECT doc_id, s.pos AS pos, md5(s.gram) AS h FROM g),
dup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS n_occ FROM occ
  ) WHERE n_occ > 1
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN max(pos + {_SPAN_K} - 1) OVER prev IS NULL
                OR pos > max(pos + {_SPAN_K} - 1) OVER prev + 1
              THEN 1 ELSE 0 END AS new_island
  FROM dup
  WINDOW prev AS (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
num AS (
  SELECT doc_id, pos,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, island,
         max(pos + {_SPAN_K} - 1) - min(pos) + 1 AS span_words
  FROM num GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         CAST(sum(span_words) AS BIGINT) AS dup_words
  FROM spans GROUP BY doc_id
)
SELECT w.doc_id AS id, CAST(len(w.ws) AS BIGINT) AS n_words,
       coalesce(p.n_dup_spans, 0) AS n_dup_spans,
       coalesce(p.dup_words, 0) AS dup_words,
       round(coalesce(p.dup_words, 0)
             / CAST(greatest(len(w.ws), 1) AS DOUBLE), 4) AS dup_frac
FROM w LEFT JOIN per_doc p ON w.doc_id = p.doc_id
""",
)
def substring_dup_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup signal (Lee et al. 2021 re-expressed as
    positional k-gram matching — llm/dedup.py::duplicated_spans): per doc,
    the merged word spans covered by corpus-repeated 8-grams and the dup-word
    fraction. One count-over-window shuffle on 16-byte gram hashes + a
    per-doc gaps-and-islands window over only the duplicated residue — the
    substring analogue of the whole-doc dedup cascade, and the signal a 100 TB
    curation pass uses to EXCISE boilerplate instead of dropping whole docs."""
    from ..llm.dedup import duplicated_spans

    d = _t(spark, sf_dir, "documents")
    return duplicated_spans(d, "text", "doc_id", k=_SPAN_K)


@register(
    "substring_dedup_rewrite_documents",
    sql=f"""
WITH w AS (SELECT doc_id, {_W} AS ws FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, len(ws) - {_SPAN_K} + 1),
           i -> struct_pack(pos := i - 1,
                            gram := array_to_string(
                              list_slice(ws, i, i + {_SPAN_K} - 1), ' ')))) AS s
  FROM w WHERE len(ws) >= {_SPAN_K}
),
occ AS (SELECT doc_id, s.pos AS pos, md5(s.gram) AS h FROM g),
red AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
    FROM occ
  ) WHERE rn > 1
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN max(pos + {_SPAN_K} - 1) OVER prev IS NULL
                OR pos > max(pos + {_SPAN_K} - 1) OVER prev + 1
              THEN 1 ELSE 0 END AS new_island
  FROM red
  WINDOW prev AS (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
num AS (
  SELECT doc_id, pos,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, island, min(pos) AS s, max(pos + {_SPAN_K} - 1) AS e
  FROM num GROUP BY doc_id, island
),
cov AS (SELECT doc_id, unnest(generate_series(s, e)) AS p FROM spans),
wp AS (
  SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS i FROM w
),
kept AS (
  SELECT wp.doc_id, wp.word, wp.i
  FROM wp LEFT JOIN cov ON wp.doc_id = cov.doc_id AND wp.i - 1 = cov.p
  WHERE cov.p IS NULL
),
recon AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS cleaned_text,
         count(*) AS kept_n
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id AS id, CAST(len(w.ws) AS BIGINT) AS n_words,
       CAST(len(w.ws) - coalesce(r.kept_n, 0) AS BIGINT) AS dropped_words,
       coalesce(r.cleaned_text, '') AS cleaned_text
FROM w LEFT JOIN recon r ON w.doc_id = r.doc_id
""",
)
def substring_dedup_rewrite_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring dedup as a REWRITE, not a flag (VERDICT r12 #6 — the
    Lee et al. 2021 / C4 / RefinedWeb production mode the flag-only
    ``substring_dup_spans_documents`` stops short of): every corpus-repeated
    8-gram region keeps its FIRST occurrence (corpus-minimal (doc_id, pos) —
    unique, so the keep-one choice is deterministic in both engines) and
    later copies are EXCISED, emitting the cleaned text column itself. The
    oracle recomputes the full shingle -> first-occurrence -> island-merge ->
    word-drop -> re-join chain, so the gate covers the rewrite output
    byte-for-byte, not just the drop counts. Scale shape is
    ``llm/dedup.py::drop_duplicated_spans``'s: positional 8-byte gram hashes,
    map-side-combinable multiplicity and first-occurrence aggregates (never
    a rank window over the raw occurrence stream — hot boilerplate grams),
    and a per-doc span list bounded by n_words/k driving a scan-local
    indexed array filter."""
    from ..llm.dedup import drop_duplicated_spans

    d = _t(spark, sf_dir, "documents")
    return drop_duplicated_spans(d, "text", "doc_id", k=_SPAN_K)


@register(
    "unigram_lm_nll_documents",
    sql=f"""
WITH toks AS (SELECT doc_id, unnest({_W}) AS w FROM documents),
counts AS (SELECT w, count(*) AS cw FROM toks GROUP BY w),
tot AS (SELECT CAST(sum(cw) AS BIGINT) AS total_toks,
               CAST(count(*) AS BIGINT) AS vocab FROM counts)
SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln((cw + 1) / CAST(total_toks + vocab AS DOUBLE))), 4) AS nll
FROM toks JOIN counts USING (w) CROSS JOIN tot
GROUP BY doc_id
""",
)
def unigram_lm_nll_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality ranking (llm/textanalysis.py::unigram_lm_scores):
    per-doc avg negative log-likelihood under the corpus' own add-one-smoothed
    unigram LM. Probabilities are exact rationals from two aggregates, so the
    score is engine-reproducible; the vocab-sized count table is broadcast
    back onto the token stream (join fallback for 1e8+ vocabularies)."""
    from ..llm.textanalysis import unigram_lm_scores

    d = _t(spark, sf_dir, "documents")
    return unigram_lm_scores(d, "text", "doc_id")


_BM25_QUERIES = [
    ("q_exec", "spark join window"),
    ("q_scan", "fast scan filter table"),
    ("q_sales", "customer order data"),
    ("q_ops", "hash merge sort stream"),
]


def _install_bm25_sql() -> None:
    from ..llm.retrieval import bm25_sql

    QUERIES["bm25_topk_documents"]["sql"] = bm25_sql(_BM25_QUERIES, topk=5)


@register("bm25_topk_documents", sql=None)  # SQL installed below (generated)
def bm25_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval (llm/retrieval.py::bm25_topk): 4 queries scored
    against the whole corpus, top-5 docs each — the engine-native form of the
    reference's Elasticsearch search surface (its ES default similarity IS
    BM25). Broadcast query terms over the postings scan; rank on a rounded
    score with id tie-break so the cut is deterministic across engines."""
    from ..llm.retrieval import bm25_topk

    d = _t(spark, sf_dir, "documents")
    return bm25_topk(spark, d, _BM25_QUERIES, "text", "doc_id", topk=5)


_install_bm25_sql()


def _install_cms_sql() -> None:
    from ..operators.sketches import cms_sql

    QUERIES["cms_user_frequency_events"]["sql"] = f"""
WITH est AS ({cms_sql("user_id", "events")}),
tru AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS true_cnt
        FROM events GROUP BY user_id)
SELECT t.key AS user_id, t.true_cnt, e.est
FROM tru t JOIN est e ON t.key = e.key
"""


@register("cms_user_frequency_events", sql=None)  # SQL installed below (generated)
def cms_user_frequency_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable count-min sketch (operators/sketches.py::cms_sketch,
    same md5 portability contract as the HLL): per-user frequency estimates
    from a 4x256-cell sketch, joined against exact counts so the
    overestimation profile is part of the checked surface. The sketch of any
    corpus is <= 1024 longs — mergeable across shards/engines by cell-wise
    sum; estimation is a broadcast join over the candidate scan."""
    from ..operators.sketches import cms_estimate, cms_sketch

    e = _t(spark, sf_dir, "events")
    sk = cms_sketch(e, "user_id")
    tru = e.groupBy(F.col("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    est = cms_estimate(tru.select("user_id"), "user_id", sk)
    return tru.join(est, F.col("user_id") == F.col("key")).select(
        "user_id", "true_cnt", "est"
    )


_install_cms_sql()


from ..operators.linkage import phonetic_block_key_sql as _blk_sql


@register(
    "record_linkage_parts",
    sql=f"""
WITH corrupted AS (
  SELECT p_partkey + 100000 AS right_id,
         CASE
           WHEN p_partkey % 4 = 1
             THEN regexp_replace(p_name, '^(.[^aeiou]*)[aeiou]', '\\1')
           WHEN p_partkey % 4 = 2 THEN replace(p_name, ' ', '-')
           WHEN p_partkey % 4 = 3
             THEN split_part(p_name, ' ', 1) || ' ' ||
                  reverse(substr(p_name, strpos(p_name, ' ') + 1))
           ELSE p_name
         END AS name
  FROM part
),
l AS (SELECT p_partkey AS left_id, p_name AS name,
             {_blk_sql('p_name')} AS blk
      FROM part),
r AS (SELECT right_id, name,
             {_blk_sql('name')} AS blk
      FROM corrupted),
pairs AS (
  SELECT l.left_id, r.right_id, levenshtein(l.name, r.name) AS dist
  FROM l JOIN r USING (blk)
  WHERE levenshtein(l.name, r.name) <= 2
),
wb AS (
  SELECT left_id, right_id, dist,
         min(dist) OVER (PARTITION BY left_id) AS best_dist
  FROM pairs
)
SELECT left_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(best_dist AS BIGINT) AS best_dist,
       CAST(min(CASE WHEN dist = best_dist THEN right_id END) AS BIGINT)
         AS best_right_id
FROM wb
GROUP BY left_id, best_dist
""",
)
def record_linkage_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked record linkage (operators/linkage.py building blocks): parts
    matched against a seeded-corrupted copy (vowel drop / hyphenation /
    reversed second word, ids +100000) through a consonant-skeleton block key
    and a levenshtein<=2 verify — the big-big form of the reference's fuzzy
    translate, never a cross join. The verify runs at DISTINCT-NAME level:
    both sides roll up to (name, multiplicity, min_id) before blocking, the
    per-block edit-distance work is |distinct_l| x |distinct_r| instead of
    rows x rows, and the name-level decisions are weight-joined back to the
    entity rows (measured 28.5s -> sub-second at sf0.1 on this corpus's
    300x-repeated names; on a mostly-unique corpus the rollup costs one
    map-side-combinable aggregate and is never worse). Output per left id:
    match count, best distance, best match id. The oracle states the same
    semantics row-level — the rollup must be exactly equivalent to pass."""
    from ..operators.linkage import phonetic_block_key

    p = _t(spark, sf_dir, "part")
    name = F.col("p_name")
    first_vowel_dropped = F.regexp_replace(
        name, r"^(.[^aeiou]*)[aeiou]", "$1"
    )
    rest = F.expr("substring(p_name, locate(' ', p_name) + 1)")
    corrupted = p.select(
        (F.col("p_partkey") + 100000).alias("right_id"),
        F.when(F.col("p_partkey") % 4 == 1, first_vowel_dropped)
        .when(F.col("p_partkey") % 4 == 2, F.regexp_replace(name, " ", "-"))
        .when(
            F.col("p_partkey") % 4 == 3,
            F.concat(F.substring_index(name, " ", 1), F.lit(" "), F.reverse(rest)),
        )
        .otherwise(name)
        .alias("p_name"),
    )
    ln = (
        p.select(name.alias("lname"))
        .distinct()
        .withColumn("blk", phonetic_block_key("lname"))
    )
    rn = (
        corrupted.groupBy(name.alias("rname"))
        .agg(
            F.count(F.lit(1)).alias("cnt_r"),
            F.min("right_id").alias("min_rid"),
        )
        .withColumn("blk", phonetic_block_key("rname"))
    )
    cand = (
        ln.join(rn, "blk")
        .withColumn("dist", F.levenshtein("lname", "rname"))
        .filter(F.col("dist") <= 2)
    )
    best = Window.partitionBy("lname")
    name_agg = (
        cand.withColumn("best_dist", F.min("dist").over(best))
        .groupBy("lname", "best_dist")
        .agg(
            F.sum("cnt_r").cast("long").alias("n_matches"),
            F.min(F.when(F.col("dist") == F.col("best_dist"), F.col("min_rid")))
            .cast("long")
            .alias("best_right_id"),
        )
    )
    return (
        p.select(F.col("p_partkey").alias("left_id"), name.alias("lname"))
        .join(F.broadcast(name_agg), "lname")
        .select(
            "left_id",
            "n_matches",
            F.col("best_dist").cast("long").alias("best_dist"),
            "best_right_id",
        )
    )


@register(
    "srp_lsh_near_dup_embeddings",
    sql=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings
),
scored AS (
  SELECT x.id AS id_a, y.id AS id_b,
         round({_COS.replace('qv', 'x.embedding').replace('cv', 'y.embedding')},
               4) AS cosine
  FROM corpus x, corpus y WHERE x.id < y.id
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.99
""",
)
def srp_lsh_near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine LSH via signed random projections (llm/dedup.py::
    srp_lsh_near_dup, Charikar 2002): banded 128-bit sign signatures from
    deterministic md5-derived hyperplanes generate candidates, exact cosine
    verifies — the BLOCKING-FREE near-dup rung (no label cells): the oracle
    is the full quadratic answer, so the banded path must find every
    qualifying pair. On this corpus every >=0.99 pair is an exact clone
    (max off-diagonal cosine ~0.51), and identical vectors have identical
    signatures, so LSH recall is exactly 1 — the query proves the
    signature/banding/verify plumbing, not a probabilistic bound."""
    from ..llm.dedup import srp_lsh_near_dup

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.unionByName(
        e.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    return srp_lsh_near_dup(
        corpus, "embedding", "vec_id", threshold=0.99, nbits=128, bands=8, dim=64
    )


@register(
    "streaming_enrich_events",
    sql="""
SELECT n.n_name AS nation_name,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY n.n_name
""",
)
def streaming_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC dimension enrichment — the one streaming join family not
    yet in the gate (stream-stream interval join is streaming_join_events):
    readStream events joined to the static nation dim and aggregated per
    nation, drained with AvailableNow. A stream-static equi-join is
    STATELESS in Structured Streaming (each microbatch hash-joins against
    the static side; nothing persists between batches) and the static side
    broadcasts — at production scale this is the canonical enrich-then-
    aggregate topology, and the only state is the running aggregate."""
    from ..streaming import read_events_stream

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = stream.join(
        F.broadcast(nation), stream["user_id"] % 25 == nation["n_nationkey"]
    )
    out = joined.groupBy(F.col("n_name").alias("nation_name")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return _drain_stream(spark, out, "t_enrich", output_mode="complete")


_HYBRID_IDS = [7, 23, 41]
_HYBRID_CHANNEL_K = 50


def _install_hybrid_sql() -> None:
    from ..llm.retrieval import bm25_sql

    ids = ", ".join(str(i) for i in _HYBRID_IDS)
    bm25 = bm25_sql(
        [],
        topk=_HYBRID_CHANNEL_K,
        docs_sql="SELECT doc_id AS id, text FROM documents",
        queries_sql=(
            f"SELECT doc_id AS query_id, text AS qtext FROM documents"
            f" WHERE doc_id IN ({ids})"
        ),
    )
    cosx = _COS.replace("qv", "q.embedding").replace("cv", "c.embedding")
    QUERIES["hybrid_rrf_documents"]["sql"] = f"""
WITH rank_t AS (SELECT query_id, id, rank AS rank_t FROM ({bm25})),
rank_v AS (
  SELECT query_id, id, rank_v FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round({cosx}, 4) DESC, c.vec_id ASC) AS rank_v
    FROM (SELECT * FROM embeddings WHERE vec_id IN ({ids})) q, embeddings c
  ) WHERE rank_v <= {_HYBRID_CHANNEL_K}
),
f AS (
  SELECT coalesce(t.query_id, v.query_id) AS query_id,
         coalesce(t.id, v.id) AS id,
         coalesce(CAST(1 AS DOUBLE) / (60 + t.rank_t), 0)
           + coalesce(CAST(1 AS DOUBLE) / (60 + v.rank_v), 0) AS rrf
  FROM rank_t t FULL OUTER JOIN rank_v v
    ON t.query_id = v.query_id AND t.id = v.id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY round(rrf, 9) DESC, id ASC) AS BIGINT)
         AS rank,
       id, round(rrf, 6) AS rrf_score
FROM f
QUALIFY rank <= 5
"""


@register("hybrid_rrf_documents", sql=None)  # SQL installed below (generated)
def hybrid_rrf_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search (llm/retrieval.py::hybrid_rrf): BM25 lexical ranking and
    exact-cosine vector ranking fused with reciprocal-rank fusion
    (Cormack 2009) for query-by-example doc ids — the production retrieval
    topology (ES + vector store) as one Spark plan. RRF needs only the
    channels' integer ranks, so the fused surface is engine-exact; both
    channels broadcast the 3-query side and cap at 50 before the fusion
    full-outer join."""
    from ..llm.retrieval import hybrid_rrf

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    return hybrid_rrf(
        d, e, _HYBRID_IDS, channel_k=_HYBRID_CHANNEL_K, topk=5
    )


_install_hybrid_sql()


def _install_hll_by_sql() -> None:
    from ..operators.sketches import hll_by_sql

    QUERIES["hll_distinct_by_status"]["sql"] = f"""
WITH est AS ({hll_by_sql("o_custkey", "o_orderstatus", "orders")}),
tru AS (SELECT o_orderstatus AS g, CAST(count(DISTINCT o_custkey) AS BIGINT)
               AS exact_distinct
        FROM orders GROUP BY o_orderstatus)
SELECT t.g AS status, t.exact_distinct, e.hll_estimate, e.n_registers_used
FROM tru t JOIN est e ON t.g = e.g
"""


@register("hll_distinct_by_status", sql=None)  # SQL installed below (generated)
def hll_distinct_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED portable HLL (operators/sketches.py::hll_distinct_by):
    approximate distinct customers per order status next to the exact
    count, both oracle-checked — the sketch-as-aggregate form a 100 TB
    rollup uses. The exchange carries <= 256 register rows per group after
    map-side max-combining; the estimate is plain expressions over that
    state (no UDAF, no per-group driver work), and the per-group register
    state stays shard/engine-mergeable."""
    from ..operators.sketches import hll_distinct_by

    o = _t(spark, sf_dir, "orders")
    est = hll_distinct_by(o, ["o_orderstatus"], "o_custkey")
    tru = o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_distinct")
    )
    return (
        tru.join(est, "o_orderstatus")
        .select(
            F.col("o_orderstatus").alias("status"),
            "exact_distinct",
            "hll_estimate",
            "n_registers_used",
        )
    )


_install_hll_by_sql()


@register(
    "quality_threshold_sweep_documents",
    sql=f"""
WITH w0 AS (
  SELECT doc_id, text, {_W} AS words FROM documents
), q AS (
  SELECT doc_id, {_QUALITY_W} AS quality FROM w0
),
b AS (
  SELECT CAST(floor(quality / 0.05) AS BIGINT) * 5 AS bucket_pct,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM q GROUP BY 1
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM b)
SELECT bucket_pct, n_docs,
       round(sum(n_docs) OVER (ORDER BY bucket_pct DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / CAST(t AS DOUBLE), 4) AS keep_frac_at_threshold
FROM b CROSS JOIN tot
""",
)
def quality_threshold_sweep_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recipe calibration: the keep-rate curve for the quality filter — for
    each 0.05-grain score bucket, how much of the corpus survives a
    threshold set there (descending cumulative share). This is the query a
    data team runs BEFORE picking corpus_filter's 0.7 cutoff; the scan-local
    score buckets into a ≤21-row frame (score∈[0,1] at 0.05 grain), so the
    descending cumulative is bounded_running's broadcast self-join over
    bucket-cardinality rows — no empty-partition WindowExec anywhere; the
    corpus-sized work is all in the scan."""
    from ..llm.textanalysis import quality_score
    from ..operators.caching import scoped_persist
    from ..operators.windows import bounded_running

    d = _t(spark, sf_dir, "documents")
    # persisted: the bucket histogram feeds the total, and both sides of
    # bounded_running's self-join — one corpus scan, not three
    b = scoped_persist(
        d.select(
            (F.floor(quality_score("text") / 0.05).cast("long") * 5).alias(
                "bucket_pct"
            )
        )
        .groupBy("bucket_pct")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    tot = F.broadcast(b.agg(F.sum("n_docs").cast("long").alias("__t")))
    cum = bounded_running(
        b, order_by=[("bucket_pct", "desc")], value_col="n_docs", cum_col="__cd"
    )
    return (
        cum.crossJoin(tot)
        .withColumn(
            "keep_frac_at_threshold",
            F.round(F.col("__cd") / F.col("__t"), 4),
        )
        .drop("__t", "__cd")
    )


@register(
    "token_budget_by_source",
    sql=f"""
WITH t AS (
  SELECT source, CAST(sum(len({_W})) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM t)
SELECT source, n_docs, n_tokens,
       round(n_tokens / CAST(total AS DOUBLE), 4) AS token_share
FROM t CROSS JOIN tot
""",
)
def token_budget_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The token-budget rollup every training run starts from: tokens and
    docs per source with each source's share of the corpus — the input to
    mix_sources' sampling fractions. Scan-local token counts into a
    source-cardinality aggregate; the total is a broadcast 1-row cross
    join (same Exchange-free shape as key_distribution)."""
    from ..llm.textanalysis import words as _words

    d = _t(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(_words("text"))).cast("long").alias("n_tokens"),
    )
    tot = F.broadcast(t.agg(F.sum("n_tokens").cast("long").alias("__total")))
    return (
        t.crossJoin(tot)
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("__total"), 4).alias("token_share"),
        )
    )


@register(
    "stratified_sample_documents",
    sql=f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {md5_bucket_sql('doc_id')}, doc_id) AS rk
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
         AS member_digest
FROM ranked WHERE rk <= 20
GROUP BY source
""",
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N-per-group sampling (llm/curation.py::stratified_fixed_n):
    20 docs per source selected by stable md5-hash order — the balanced
    eval-set primitive fractions can't express. The gate compares an
    order-insensitive digest of the SELECTED MEMBER SET per source, so the
    check proves both engines pick the IDENTICAL members, not just the same
    count."""
    from ..llm.curation import md5_bucket, stratified_fixed_n

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    picked = stratified_fixed_n(d, "source", "doc_id", 20)
    return picked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("member_digest"),
    )


def _install_cms_join_sql() -> None:
    from ..operators.sketches import cms_join_size_sql

    QUERIES["cms_join_size_orders"]["sql"] = f"""
WITH est AS ({cms_join_size_sql("o_orderkey", "orders", "l_orderkey", "lineitem")}),
tru AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_join_size
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
SELECT e.est_join_size, t.exact_join_size FROM est e CROSS JOIN tru t
"""


@register("cms_join_size_orders", sql=None)  # SQL installed below (generated)
def cms_join_size_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation WITHOUT running the join (operators/sketches.py::
    cms_join_size, the CM inner-product estimator): the orders and lineitem
    key sketches — 1024 cells each, one scan each — multiply cell-wise and
    the min row-sum upper-bounds |orders join lineitem|. Checked beside the
    exact join count: this is how a 100 TB pipeline decides broadcast vs
    shuffle (or predicts a skew blowup) before paying for the join."""
    from ..operators.sketches import cms_join_size, cms_sketch

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    est = cms_join_size(
        cms_sketch(o, "o_orderkey"), cms_sketch(li, "l_orderkey")
    )
    tru = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).agg(
        F.count(F.lit(1)).cast("long").alias("exact_join_size")
    )
    return est.crossJoin(tru)


_install_cms_join_sql()


@register(
    "dedup_lines_documents",
    sql="""
WITH corpus AS (
  SELECT doc_id,
         'shared header block number ' || CAST(doc_id // 10 AS VARCHAR)
           || chr(10) || text AS text
  FROM documents
),
ln AS (
  SELECT doc_id AS id, s.pos - 1 AS pos, s.line
  FROM (
    SELECT doc_id,
           unnest(list_transform(string_split(text, chr(10)),
                  (x, i) -> struct_pack(pos := i, line := x))) AS s
    FROM corpus
  ) WHERE trim(s.line) <> ''
),
h AS (SELECT id, pos, line,
             lpad(CAST(id AS VARCHAR), 20, '0') || ':'
               || lpad(CAST(pos AS VARCHAR), 20, '0') AS ok,
             md5(line) AS lh
      FROM ln),
first AS (SELECT lh, min(ok) AS fo FROM h GROUP BY lh),
kept AS (
  SELECT h.id, h.pos, h.line, h.ok = f.fo AS keep
  FROM h JOIN first f ON h.lh = f.lh
),
agg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept,
         md5(coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (keep), ''))
           AS cleaned_md5
  FROM kept GROUP BY id
)
SELECT c.doc_id, coalesce(a.n_lines, 0) AS n_lines,
       coalesce(a.n_kept, 0) AS n_kept,
       coalesce(a.cleaned_md5, md5('')) AS cleaned_md5
FROM corpus c LEFT JOIN agg a ON c.doc_id = a.id
""",
)
def dedup_lines_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-corpus line dedup (llm/dedup.py::dedup_lines): every
    doc gets a boilerplate header shared by its block of 10 (the seeded
    web-template scenario), and only the corpus-FIRST occurrence of each
    line survives the rewrite. First-occurrence is a map-side-combinable
    min(struct(id,pos)) per line hash — never a window over the hot
    boilerplate key. The gate hashes the REBUILT text per doc, so
    reassembly order and keep decisions are both proved identical. The
    oracle mirrors min(struct) with a zero-padded '(id):(pos)' string key —
    order-safe at any line count, unlike the earlier id*1000+pos encoding
    which collided past 1000 lines/doc — and LEFT JOINs the per-doc
    aggregate onto the full doc set, matching dedup_lines' every-input-doc
    output contract (all-empty docs appear as (id, 0, 0, md5('')))."""
    from ..llm.dedup import dedup_lines

    d = _t(spark, sf_dir, "documents")
    corpus = d.select(
        "doc_id",
        F.concat(
            F.lit("shared header block number "),
            F.floor(F.col("doc_id") / 10).cast("long").cast("string"),
            F.lit("\n"),
            F.col("text"),
        ).alias("text"),
    )
    out = dedup_lines(corpus, "text", "doc_id")
    return out.select(
        F.col("id").alias("doc_id"),
        "n_lines",
        "n_kept",
        F.md5("cleaned_text").alias("cleaned_md5"),
    )


@register(
    "ngram_containment_pairs",
    sql=f"""
WITH probe AS (
  SELECT doc_id + 200000 AS id_a,
         array_to_string(list_slice({_W}, 1, 12), ' ') || ' qq' AS text
  FROM documents WHERE doc_id % 5 = 0
), corpus AS (SELECT doc_id AS id_b, text FROM documents),
ga AS (
  SELECT id_a, s FROM (
    SELECT id_a,
           CASE WHEN len({_W}) < 2 THEN [array_to_string({_W}, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len({_W})-1),
                     i -> array_to_string(list_slice({_W}, i, i+1), ' '))) END AS s
    FROM probe
  )
), gb AS (
  SELECT id_b, s FROM (
    SELECT id_b,
           CASE WHEN len({_W}) < 2 THEN [array_to_string({_W}, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len({_W})-1),
                     i -> array_to_string(list_slice({_W}, i, i+1), ' '))) END AS s
    FROM corpus
  )
), scored AS (
  SELECT a.id_a, b.id_b,
         round(len(list_intersect(a.s, b.s)) / CAST(len(a.s) AS DOUBLE), 4)
           AS containment
  FROM ga a, gb b
)
SELECT id_a, id_b, containment FROM scored WHERE containment >= 0.8
""",
)
def ngram_containment_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment, probe-vs-corpus (llm/dedup.py::
    ngram_containment_pairs): every fifth doc's 12-word excerpt (+200000)
    probes the standing corpus for documents that CONTAIN it — the
    quotation relationship symmetric Jaccard cannot see. The Spark path
    prunes candidates with an exact pigeonring count filter (>= 2 hits on
    the m+2 rarest grams — the single-hit prefix form was measured
    admitting x119 candidates per 10x rows on shared-vocabulary corpora,
    r10) and verifies from hashed gram arrays; the oracle is the
    blocking-free quadratic probe x corpus answer, so the filter is proved
    lossless at the threshold."""
    from ..llm.dedup import ngram_containment_pairs
    from ..llm.textanalysis import words as _words2

    d = _t(spark, sf_dir, "documents")
    probe = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(_words2("text"), 1, 12), " "), F.lit(" qq")
        ).alias("text"),
    )
    return ngram_containment_pairs(
        probe, d.select("doc_id", "text"), "text", "doc_id", n=2, threshold=0.8
    )


@register(
    "margin_mining_embeddings",
    sql=f"""
WITH l AS (SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id % 2 = 0),
r AS (SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id % 2 = 1),
cx AS (
  SELECT l.id AS lid, r.id AS rid,
         round({_COS.replace('qv', 'l.embedding').replace('cv', 'r.embedding')},
               4) AS c
  FROM l, r
),
fwd AS (SELECT lid, rid, c,
               row_number() OVER (PARTITION BY lid ORDER BY c DESC, rid) AS rk
        FROM cx),
rev AS (SELECT lid, rid, c,
               row_number() OVER (PARTITION BY rid ORDER BY c DESC, lid) AS rk
        FROM cx),
al AS (SELECT lid, avg(c) AS avg_l FROM fwd WHERE rk <= 4 GROUP BY lid),
ar AS (SELECT rid, avg(c) AS avg_r FROM rev WHERE rk <= 4 GROUP BY rid),
scored AS (
  SELECT f.lid AS left_id, f.rid AS right_id, f.c AS cosine,
         round(f.c / ((al.avg_l + ar.avg_r) / 2), 4) AS margin
  FROM fwd f JOIN al ON f.lid = al.lid JOIN ar ON f.rid = ar.rid
  WHERE f.rk <= 4
)
SELECT left_id, right_id, cosine, margin FROM scored WHERE margin >= 1.05
""",
)
def margin_mining_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based mining (llm/similarity.py::margin_mining, Artetxe &
    Schwenk 2019): the even-id and odd-id halves of the embedding table
    stand in for two languages' spaces, and candidate pairs are kept only
    when their cosine clears the local-neighbourhood margin — the
    LASER/CCMatrix scorer that filters out hub vectors raw cosine would
    mine. Oracle: blocking-free quadratic, both directions' top-4
    neighbourhoods recomputed with the identical rounded-cosine ranking."""
    from ..llm.similarity import margin_mining

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    left = e.filter(F.col("vec_id") % 2 == 0)
    right = e.filter(F.col("vec_id") % 2 == 1)
    return margin_mining(left, right, k=4, margin_threshold=1.05).select(
        "left_id", "right_id", "cosine", "margin"
    )


@register(
    "knn_graph_embeddings",
    sql=f"""
WITH e AS (SELECT vec_id AS id, embedding FROM embeddings),
cx AS (
  SELECT a.id AS qid, b.id AS cid,
         round({_COS.replace('qv', 'a.embedding').replace('cv', 'b.embedding')},
               4) AS c
  FROM e a, e b WHERE a.id <> b.id
),
ranked AS (
  SELECT qid, cid, c,
         row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rk
  FROM cx
)
SELECT qid AS query_id, cid AS neighbour_id, c AS cosine,
       CAST(rk AS BIGINT) AS rank
FROM ranked WHERE rk <= 3
""",
)
def knn_graph_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full kNN-graph construction (llm/similarity.py::cosine_topk_blocked):
    the exact top-3 cosine neighbours of EVERY vector — the input graph for
    graph-based dedup/clustering, and the all-pairs shape where the query
    side is the whole corpus. The block-pair matmul kernel scores it
    compiled (the interpreted expression fold is the 40s version of this
    query); candidates carry a rounding-slack cut and are exact-rescored,
    so the graph matches the quadratic oracle edge-for-edge. This EXACT
    strategy is the oracle gate; the production scale path is
    knn_graph(strategy="ivf") — same output contract, sub-quadratic,
    recall-gated in tests/test_llm_ops.py::test_knn_graph_ivf_recall."""
    from ..llm.similarity import knn_graph

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return knn_graph(e, "vec_id", "embedding", k=3, strategy="exact")


@register(
    "mutual_knn_clusters_embeddings",
    sql=f"""
WITH RECURSIVE e AS (SELECT vec_id AS id, embedding FROM embeddings),
cx AS (
  SELECT a.id AS qid, b.id AS cid,
         round({_COS.replace('qv', 'a.embedding').replace('cv', 'b.embedding')},
               4) AS c
  FROM e a, e b WHERE a.id <> b.id
),
ranked AS (
  SELECT qid, cid,
         row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rk
  FROM cx
),
knn AS (SELECT qid, cid FROM ranked WHERE rk <= 3),
mutual AS (
  SELECT least(a.qid, a.cid) AS u, greatest(a.qid, a.cid) AS v
  FROM knn a JOIN knn b ON a.qid = b.cid AND a.cid = b.qid
  WHERE a.qid < a.cid
),
edges AS (SELECT u, v FROM mutual UNION SELECT v, u FROM mutual),
cc(id, comp) AS (
  SELECT id, id FROM e
  UNION
  SELECT ed.v, cc.comp FROM cc JOIN edges ed ON ed.u = cc.id
),
lab AS (SELECT id, min(comp) AS comp FROM cc GROUP BY id)
SELECT id AS vec_id, comp AS cluster_id,
       CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS cluster_size
FROM lab
""",
)
def mutual_knn_clusters_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic clustering by mutual-kNN + connected components (the
    SemDeDup-family pipeline shape): edges exist only where BOTH vectors
    rank each other in their top-3 — the standard symmetric filter that
    stops chain-linking through hubs — then the alternating-star CC
    assigns every vector its cluster (singletons stay their own). Built
    entirely from gate-proven parts: the block-pair matmul kNN
    (cosine_topk_blocked) and connected_components; the oracle recomputes
    the exact kNN graph, the mutual filter, and the transitive closure by
    recursive CTE. The EXACT strategy gates the operator; production runs
    mutual_knn_clusters(strategy="ivf") — sub-quadratic; a missed ANN
    edge usually under-merges but can also promote a next-nearest
    candidate into a spurious mutual edge (see similarity.py's recall
    analysis — the filter bounds, not eliminates, the effect; on
    separable data the clusterings coincide and the recall test pins
    both)."""
    from ..llm.similarity import mutual_knn_clusters

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return mutual_knn_clusters(e, "vec_id", "embedding", k=3, strategy="exact")


@register(
    "session_bounce_rate_events",
    sql="""
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
),
sess AS (
  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(min(ts) AS DATE) AS day
  FROM s GROUP BY user_id, session_id
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (n_events = 1) AS BIGINT) AS n_bounces,
       round(count(*) FILTER (n_events = 1) / CAST(count(*) AS DOUBLE), 4)
         AS bounce_rate
FROM sess GROUP BY day
""",
)
def session_bounce_rate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: sessions (30-min inactivity gap, the proven
    lag/cumsum sessionization from session_window_native_events) bucketed by
    their start day, with the single-event fraction — the engagement metric
    a product pipeline derives from the same session assignment it already
    computes. One window shuffle on user_id, then session- and
    day-cardinality aggregates."""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ (skill gotcha): cast to timestamp before the
    # epoch conversion; gap compared in microseconds
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_s = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = (
        e.withColumn("new_s", new_s)
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd").alias("day"),
        )
    )
    return sess.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long"))
        .cast("long")
        .alias("n_bounces"),
        F.round(
            F.sum((F.col("n_events") == 1).cast("long"))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("bounce_rate"),
    )


from ..operators.graph import pagerank_fixed_point, pagerank_sql  # noqa: E402

_PR_NODES_SQL = "SELECT doc_id AS id FROM documents"
_PR_EDGES_SQL = """
SELECT u, v FROM (
  SELECT doc_id AS u,
         (doc_id * 31 + 7) % (SELECT count(*) FROM documents) AS v
  FROM documents
  UNION
  SELECT doc_id,
         (doc_id * 17 + 3) % (SELECT count(*) FROM documents)
  FROM documents
) WHERE u <> v
"""


@register(
    "pagerank_documents",
    sql=pagerank_sql(_PR_NODES_SQL, _PR_EDGES_SQL, iterations=5)
    .replace("SELECT id, r AS rank_fp", "SELECT id AS doc_id, r AS rank_fp"),
)
def pagerank_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (operators/graph.py) over a deterministic
    synthetic link graph on the documents table (each doc links to two
    affine-modular targets — the seeded stand-in for a web/citation graph;
    UNION-deduped, self-loops dropped): the quality-weighting signal a
    web-corpus curation pipeline computes before sampling. Five rounds of
    join + map-side-combinable groupBy, lineage truncated per round; ranks
    are INTEGER fixed-point (SCALE=10^12), so the oracle — the same five
    rounds UNROLLED as a CTE chain with identical integer arithmetic —
    hash-matches exactly, which float PageRank never could."""
    d = _t(spark, sf_dir, "documents")
    n = d.count()
    nodes = d.select(F.col("doc_id").alias("id"))
    mk = lambda a, b: (F.col("doc_id") * a + b) % F.lit(n)  # noqa: E731
    edges = (
        d.select(F.col("doc_id").alias("u"), mk(31, 7).alias("v"))
        .unionByName(d.select(F.col("doc_id").alias("u"), mk(17, 3).alias("v")))
        .distinct()
        .filter(F.col("u") != F.col("v"))
    )
    return pagerank_fixed_point(nodes, edges, iterations=5).select(
        F.col("id").alias("doc_id"), "rank_fp"
    )


from ..operators.layout import zorder_key, zorder_key_sql  # noqa: E402

_Z_X = "datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 1024"
_Z_Y = "(user_id % 1024)"


@register(
    "zorder_locality_events",
    sql=f"""
WITH d AS (
  SELECT CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 1024
              AS BIGINT) AS day_n,
         CAST(user_id % 1024 AS BIGINT) AS user_b
  FROM events
), z AS (
  SELECT day_n, user_b, {zorder_key_sql(["day_n", "user_b"], bits=10)} AS zk
  FROM d
)
SELECT CAST(zk // 16384 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(day_n) AS BIGINT) AS min_day, CAST(max(day_n) AS BIGINT) AS max_day,
       CAST(min(user_b) AS BIGINT) AS min_user, CAST(max(user_b) AS BIGINT) AS max_user,
       CAST((max(day_n) - min(day_n) + 1) * (max(user_b) - min(user_b) + 1)
            AS BIGINT) AS bbox_area
FROM z GROUP BY 1
""",
)
def zorder_locality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys for the lakehouse OPTIMIZE path
    (operators/layout.py): events mapped to a (day, user-bucket) plane, bits
    interleaved by pure integer arithmetic into a 20-bit Morton key, bucketed
    by the key's high 6 bits — each bucket is the row set one output file
    would hold after ``cluster_by_zorder``. The per-bucket min/max bounding
    box (exactly what a parquet footer would publish) is the data-skipping
    evidence: Morton buckets cover small hyper-rectangles in BOTH dimensions,
    where a single-column sort gives ranges only in its leading column. The
    oracle recomputes the interleave from the generated integer-div/mod
    mirror SQL — engine-exact, like every portable key here. Scan-local
    expressions + one bucket-cardinality groupBy; nothing wide."""
    e = _t(spark, sf_dir, "events")
    d = e.select(
        (
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            % 1024
        ).cast("long").alias("day_n"),
        (F.col("user_id") % 1024).cast("long").alias("user_b"),
    )
    z = d.withColumn("zk", zorder_key(["day_n", "user_b"], bits=10))
    return (
        z.groupBy(F.shiftright("zk", 14).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("day_n").cast("long").alias("min_day"),
            F.max("day_n").cast("long").alias("max_day"),
            F.min("user_b").cast("long").alias("min_user"),
            F.max("user_b").cast("long").alias("max_user"),
            (
                (F.max("day_n") - F.min("day_n") + 1)
                * (F.max("user_b") - F.min("user_b") + 1)
            ).cast("long").alias("bbox_area"),
        )
    )


from ..llm.dedup import (  # noqa: E402
    minhash_signature_portable,
    minhash_signature_sql,
)

_MH_N = 16
_MH_GRAMS_SQL = f"""
SELECT id, unnest(s) AS gram FROM (
  SELECT id, {_SH3} AS s FROM (
    SELECT id, {_W} AS words FROM (
      SELECT doc_id AS id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text || ' zzdup' FROM documents
    )
  ) w
)
"""
_MH_EQ = " + ".join(
    f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(_MH_N)
)


@register(
    "minhash_jaccard_estimate_documents",
    sql=f"""
WITH sig AS ({minhash_signature_sql(_MH_N, _MH_GRAMS_SQL)}),
g AS (
  SELECT id, {_SH3} AS s FROM (
    SELECT id, {_W} AS words FROM (
      SELECT doc_id AS id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text || ' zzdup' FROM documents
    )
  ) w
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST({_MH_EQ} AS BIGINT) AS n_eq
  FROM sig a JOIN sig b ON b.id = a.id + 100000
  WHERE a.id < 100000
),
ex AS (
  SELECT ga.id AS id_a,
         round(CAST(len(list_intersect(ga.s, gb.s)) AS DOUBLE)
               / len(list_distinct(list_concat(ga.s, gb.s))), 4) AS exact_jaccard
  FROM g ga JOIN g gb ON gb.id = ga.id + 100000
  WHERE ga.id < 100000
)
SELECT p.id_a, p.id_b, round(p.n_eq / {float(_MH_N)}, 4) AS est_jaccard,
       ex.exact_jaccard
FROM pairs p JOIN ex ON p.id_a = ex.id_a
""",
)
def minhash_jaccard_estimate_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash as an ESTIMATOR, not just a candidate generator
    (llm/dedup.py::minhash_signature_portable): every (doc, doc+' zzdup')
    pair gets the fraction of agreeing signature components — the Broder
    estimate of Jaccard — next to the exact trigram Jaccard, the calibration
    report a dedup team reads before picking bands/rows. Signatures are
    md5-derived integers, so the oracle rebuilds the IDENTICAL signature
    matrix from generated SQL (the same portability contract as HLL/CMS) —
    this checks the estimator itself, where the xxhash64 LSH path can only
    be checked by its verified output. One explode + map-side-combined
    min() aggregation per side; the pair join is a trivially co-partitioned
    equi-join on the derived id."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.select(F.col("doc_id").alias("id"), "text").unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("id"),
            F.concat("text", F.lit(" zzdup")).alias("text"),
        )
    )
    from ..operators.caching import scoped_persist

    sig = scoped_persist(
        minhash_signature_portable(corpus, "text", "id", n_hashes=_MH_N, k=3)
    )
    a = sig.select("id", *[F.col(f"m{i}").alias(f"a{i}") for i in range(_MH_N)])
    b = sig.select(
        (F.col("id") - 100000).alias("id"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(_MH_N)],
    )
    n_eq = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(_MH_N)
    )
    est = (
        a.filter(F.col("id") < 100000)
        .join(b, "id")
        .select(
            F.col("id").alias("id_a"),
            (F.col("id") + 100000).alias("id_b"),
            F.round(n_eq.cast("double") / _MH_N, 4).alias("est_jaccard"),
        )
    )
    from ..llm.dedup import shingles

    g = scoped_persist(
        corpus.select("id", shingles("text", 3).alias("s"))
    )
    ga = g.select(F.col("id").alias("id_a"), F.col("s").alias("s_a")).filter(
        F.col("id_a") < 100000
    )
    gb = g.select((F.col("id") - 100000).alias("id_a"), F.col("s").alias("s_b"))
    inter = F.size(F.array_intersect("s_a", "s_b"))
    union = (F.size("s_a") + F.size("s_b") - inter).cast("double")
    ex = ga.join(gb, "id_a").select(
        "id_a", F.round(inter.cast("double") / union, 4).alias("exact_jaccard")
    )
    return est.join(ex, "id_a")


_GOPHER_STOP_SQL = "('the','be','to','of','and','that','have','with')"


@register(
    "gopher_rules_documents",
    sql=f"""
WITH w AS (
  SELECT doc_id, text, {_W} AS words,
         list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines
  FROM documents
), c AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(words, x -> len(x))), 0)
              AS BIGINT) AS word_chars,
         CAST(len(text) - len(replace(text, '#', '')) AS BIGINT) AS n_hash,
         CAST((len(text) - len(replace(text, '...', ''))) // 3
              + (len(text) - len(replace(text, '…', '')))
              AS BIGINT) AS n_ellipsis,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lines,
              x -> substr(ltrim(x), 1, 1) IN ('-', '*'))) AS BIGINT)
           AS n_bullet_lines,
         CAST(len(list_filter(lines, x -> ends_with(rtrim(x), '...')
              OR ends_with(rtrim(x), '…'))) AS BIGINT) AS n_ellipsis_lines,
         CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
              AS BIGINT) AS n_alpha_words,
         CAST(len(list_filter(words, x -> lower(x) IN {_GOPHER_STOP_SQL}))
              AS BIGINT) AS n_stopwords
  FROM w
)
SELECT doc_id, n_words, word_chars, n_hash, n_ellipsis, n_lines,
       n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stopwords,
       (n_words >= 50 AND n_words <= 100000) AS r_word_count,
       (word_chars >= 3 * n_words AND word_chars <= 10 * n_words)
         AS r_mean_word_len,
       (10 * n_hash <= n_words AND 10 * n_ellipsis <= n_words)
         AS r_symbol_ratio,
       (10 * n_bullet_lines <= 9 * n_lines) AS r_bullet_lines,
       (10 * n_ellipsis_lines <= 3 * n_lines) AS r_ellipsis_lines,
       (5 * n_alpha_words >= 4 * n_words) AS r_alpha_words,
       (n_stopwords >= 2) AS r_stopwords,
       ((n_words >= 50 AND n_words <= 100000)
        AND (word_chars >= 3 * n_words AND word_chars <= 10 * n_words)
        AND (10 * n_hash <= n_words AND 10 * n_ellipsis <= n_words)
        AND (10 * n_bullet_lines <= 9 * n_lines)
        AND (10 * n_ellipsis_lines <= 3 * n_lines)
        AND (5 * n_alpha_words >= 4 * n_words)
        AND (n_stopwords >= 2)) AS keep
FROM c
""",
)
def gopher_rules_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher quality rule set (llm/textanalysis.py::
    gopher_rules) applied per document: every rule's counter, its boolean,
    and the final keep decision — the verbatim filter stack a web-corpus
    pipeline runs before any model-based scoring. Every ratio test is a
    cross-multiplied INTEGER comparison in both engines, so the gate is
    hash-exact with no float-boundary caveat (unlike score-style filters).
    Pure scan-local expressions into a row-per-doc projection — a free
    rider on the corpus scan at any scale."""
    from ..llm.textanalysis import gopher_rules

    d = _t(spark, sf_dir, "documents")
    cols = gopher_rules("text")
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()])


@register(
    "equi_depth_buckets_lineitem",
    sql="""
WITH h AS (
  SELECT l_returnflag AS g, l_extendedprice AS v, CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT g, v, c, CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cm
  FROM h
),
n AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY g)
SELECT cum.g AS l_returnflag,
       CAST(((cm - c) * 8) // n.n AS BIGINT) AS bucket,
       CAST(sum(c) AS BIGINT) AS n_rows,
       round(min(v), 2) AS lo, round(max(v), 2) AS hi
FROM cum JOIN n ON cum.g = n.g
GROUP BY 1, 2
""",
)
def equi_depth_buckets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram per group — the bucketing a
    stats collector or stratified sampler derives from the SAME distributed
    order-statistics plan as exact_percentiles_lineitem: per-value counts
    (map-side-combinable groupBy), running_totals' two-phase cumsum over the
    value histogram, then bucket = ((cum_before_value) * k) div n — integer
    arithmetic, so every row with a given value lands in one deterministic
    bucket in any engine. No fact-table window, no per-group single-task
    sort; the oracle recomputes the cumsum with a plain window over the
    (tiny per-group) value histogram. k=8 buckets; buckets can be skipped
    entirely when a hot value spans several (correct equi-depth semantics)."""
    from ..operators.windows import running_totals

    from ..operators.caching import scoped_persist

    li = _t(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        F.col("l_returnflag").alias("g"), F.col("l_extendedprice").alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    # persisted: n_by_g and the bucket projection both read it — without
    # the pin the auto window path would recompute the cumsum per reference
    cum = scoped_persist(
        running_totals(
            hist, "c", order_by=[("v", "asc")], partition_by=["g"],
            cum_col="cm",
        )
    )
    n_by_g = F.broadcast(
        cum.groupBy("g").agg(F.max("cm").cast("long").alias("n"))
    )
    return (
        cum.join(n_by_g, "g")
        .select(
            F.col("g").alias("l_returnflag"),
            F.expr("((cm - c) * 8) div n").cast("long").alias("bucket"),
            "v", "c",
        )
        .groupBy("l_returnflag", "bucket")
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.round(F.min("v"), 2).alias("lo"),
            F.round(F.max("v"), 2).alias("hi"),
        )
    )


from ..llm.dedup import winnow_fingerprints, winnow_sql  # noqa: E402

_WINNOW_DOCS_SQL = "SELECT doc_id AS id, text FROM documents"
# the shared-substring corpus: every doc plus a tail-extended variant —
# the variant shares the original's whole gram sequence, so winnowing's
# density guarantee forces shared fingerprints for every (doc, variant)
_WINNOW_CORPUS_SQL = (
    "SELECT doc_id AS id, text FROM documents "
    "UNION ALL SELECT doc_id + 100000, "
    "text || ' zz tail marker words appended here' FROM documents"
)
# drop fingerprints present in more than this many docs before pairing:
# boilerplate/hot grams otherwise quadratically blow up the index self-join
# (the MOSS common-fingerprint cull); with the synthetic vocabulary many
# trigrams repeat across unrelated docs, exactly the shape the cull exists
# for
_WINNOW_MAX_DF = 8
_WINNOW_MIN_SHARED = 3


@register(
    "winnow_fingerprints_documents",
    sql=winnow_sql(_WINNOW_DOCS_SQL, k=3, window=4),
)
def winnow_fingerprints_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust winnowing fingerprints (llm/dedup.py::winnow_fingerprints —
    Schleimer/Wilkerson/Aiken SIGMOD 2003, the MOSS selection) per document:
    the substring-level complement to duplicated_spans_documents — where
    that operator needs every positional gram, winnowing keeps
    ~2/(window+1) of them with a guaranteed detection floor (any shared
    substring of window+k-1 words shares a fingerprint). md5-hex8 gram
    hashes + per-row array window minima make the set engine-exact; the
    oracle rebuilds it from generated SQL. Scan-local until the explode,
    which emits (id, fingerprint) index rows only."""
    d = _t(spark, sf_dir, "documents")
    return (
        winnow_fingerprints(d, "text", "doc_id", k=3, window=4)
        .select(
            "id",
            "n_grams",
            "n_fingerprints",
            F.explode("fingerprints").alias("fingerprint"),
        )
    )


@register(
    "winnow_shared_pairs_documents",
    sql=f"""
WITH fp AS ({winnow_sql(_WINNOW_CORPUS_SQL, k=3, window=4)}),
ok AS (
  SELECT fingerprint FROM fp
  GROUP BY fingerprint HAVING count(*) <= {_WINNOW_MAX_DF}
),
i AS (SELECT f.id, f.fingerprint FROM fp f JOIN ok USING (fingerprint))
SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
FROM i a JOIN i b ON a.fingerprint = b.fingerprint AND a.id < b.id
GROUP BY 1, 2
HAVING count(*) >= {_WINNOW_MIN_SHARED}
""",
)
def winnow_shared_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-sharing pairs from the winnowing fingerprint index: each
    doc paired against a tail-extended variant corpus, fingerprints present
    in more docs than _WINNOW_MAX_DF culled (the MOSS hot-fingerprint drop
    — the bucket-size cap that keeps the index self-join linear in true
    matches), then pairs sharing >= _WINNOW_MIN_SHARED surviving
    fingerprints. The same
    index-join shape as the n-gram inverted-index family: the shuffle
    carries (fingerprint, id) rows only, bucket sizes bounded by the cull;
    never all-pairs. Every (doc, variant) pair is guaranteed by winnowing's
    density bound to share fingerprints unless the cull removed them."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    corpus = d.unionByName(
        d.select(
            (F.col("id") + 100000).alias("id"),
            F.concat(
                "text", F.lit(" zz tail marker words appended here")
            ).alias("text"),
        )
    )
    from ..operators.caching import scoped_persist

    idx = scoped_persist(
        winnow_fingerprints(corpus, "text", "id", k=3, window=4).select(
            "id", F.explode("fingerprints").alias("fingerprint")
        )
    )
    ok = (
        idx.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= _WINNOW_MAX_DF)
        .select("fingerprint")
    )
    # pin the culled index too: BOTH sides of the pair self-join read it,
    # and unpinned each side re-ran the document-frequency aggregate and
    # the cull join (the ppjoin prefix lesson, r15). idx stays pinned so
    # the winnow kernel runs once inside this materialization.
    culled = scoped_persist(idx.join(ok, "fingerprint"))
    a = culled.select("fingerprint", F.col("id").alias("id_a"))
    b = culled.select(
        F.col("fingerprint").alias("fp_b"), F.col("id").alias("id_b")
    )
    return (
        a.join(
            b,
            (F.col("fingerprint") == F.col("fp_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )


from ..llm.curation import md5_bucket_sql as _md5_bucket_sql  # noqa: E402

# curate_corpus_stats: the full curation chain's stage counts. The quality /
# language expressions are the quality_langid_documents mirrors; the exact
# and near-dup stages are the dedup_exact / dedup_groups_lsh mirrors scoped
# to the filtered corpus; the split is the corpus_split mirror. val_fraction
# 0.1 -> train iff md5 hex6 bucket < int(0.9 * 16^6) = 15099494.
_CURATE_SPLIT_THRESHOLD = int((1.0 - 0.1) * 16**6)


@register(
    "curate_corpus_stats",
    sql=rf"""
WITH RECURSIVE w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '') AS words
  FROM documents
), m AS (
  SELECT doc_id, text, words,
         {_QUALITY_W} AS quality,
         len(list_filter(words, x -> lower(x) IN ('the','and','of','is'))) AS s_en,
         len(list_filter(words, x -> lower(x) IN ('el','la','de','que'))) AS s_es,
         len(list_filter(words, x -> lower(x) IN ('le','la','et','les'))) AS s_fr,
         len(list_filter(words, x -> lower(x) IN ('der','die','und','das'))) AS s_de
  FROM w
), f AS (
  SELECT doc_id, text, words FROM m
  WHERE len(words) >= 10
    AND quality >= 0.5
    AND (CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
              WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
              WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
              WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
              WHEN s_de = greatest(s_en, s_es, s_fr, s_de) THEN 'de'
              ELSE 'und' END) IN ('en', 'und')
), e AS (
  SELECT doc_id, text, words FROM f
  WHERE doc_id IN (SELECT min(doc_id) FROM f GROUP BY md5(text))
), sh AS (
  SELECT doc_id AS id,
         CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
         ELSE list_distinct(list_transform(generate_series(1, len(words)-2),
              i -> array_to_string(list_slice(words, i, i+2), ' '))) END AS s
  FROM e
), cand AS (
  SELECT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b
  FROM sh a, sh b
  WHERE a.id < b.id
    AND CAST(least(len(a.s), len(b.s)) AS DOUBLE)
        / greatest(len(a.s), len(b.s)) >= 0.8
), pairs AS (
  SELECT id_a, id_b FROM cand
  WHERE round(CAST(len(list_intersect(s_a, s_b)) AS DOUBLE)
              / len(list_distinct(list_concat(s_a, s_b))), 4) >= 0.8
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), cc(id, comp) AS (
  SELECT id, id FROM sh
  UNION
  SELECT e2.v, cc.comp FROM cc JOIN edges e2 ON e2.u = cc.id
), lab AS (
  SELECT id, min(comp) AS comp FROM cc GROUP BY id
), survivors AS (
  SELECT id FROM lab WHERE id = comp
), sp AS (
  SELECT id,
         CASE WHEN {_md5_bucket_sql("CAST(id AS VARCHAR)")}
                   < {_CURATE_SPLIT_THRESHOLD}
              THEN 'train' ELSE 'val' END AS split
  FROM survivors
)
SELECT 'input' AS stage, CAST(count(*) AS BIGINT) AS n_rows FROM documents
UNION ALL SELECT 'after_filter', CAST(count(*) AS BIGINT) FROM f
UNION ALL SELECT 'after_exact_dedup', CAST(count(*) AS BIGINT) FROM e
UNION ALL SELECT 'after_near_dedup', CAST(count(*) AS BIGINT) FROM survivors
UNION ALL SELECT 'split_' || split, CAST(count(*) AS BIGINT) FROM sp GROUP BY split
""",
)
def curate_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSITE curation pipeline as a gate query (llm/pipeline.py::
    curation_stage_frames — the exact frames curate_corpus writes shards
    from): scan-local quality/length/language filter -> exact content-hash
    dedup -> MinHash-LSH + connected-components near-dup collapse ->
    deterministic md5 train/val split, each stage's row count checked
    against an oracle that recomputes the whole chain in SQL (recursive-CTE
    closure for the components, as in dedup_groups_lsh). This is the
    product the individual llm/ operators compose into; one green row per
    stage proves the five-stage chain end to end, not just its pieces.
    The LSH candidate recall at (32 hashes, 16 bands, j >= 0.8) is
    1 - (1 - j^2)^16 >= 1 - 4e-8, so the banded path and the oracle's
    exact quadratic pair scan agree on this corpus."""
    from ..llm.pipeline import curation_stage_frames

    d = _t(spark, sf_dir, "documents")
    # the stage frames come back scoped_persist-ed from
    # curation_stage_frames itself (pinned before the LSH stage's eager
    # broadcast-gate estimate), so the chain evaluates each stage once
    frames = curation_stage_frames(d)

    def cnt(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_rows")).select(
            F.lit(stage).alias("stage"), "n_rows"
        )

    out = cnt("input", frames["input"])
    for s in ("after_filter", "after_exact_dedup", "after_near_dedup"):
        out = out.unionByName(cnt(s, frames[s]))
    split_counts = (
        frames["final"]
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            F.concat(F.lit("split_"), F.col("split")).alias("stage"), "n_rows"
        )
    )
    return out.unionByName(split_counts)


from ..llm.textanalysis import gopher_repetition, gopher_repetition_sql  # noqa: E402

# The synthetic documents are single-line and rarely repeat a 5-gram, so the
# plain table would leave the dup-line/para and coverage rules exercised only
# at zero. The gate corpus therefore unions each doc with a variant that is
# the doc repeated three times as blank-line-separated paragraphs — every
# line, paragraph and n-gram in the variant is duplicated, driving all 13
# rules through their non-trivial branches (the winnowing-corpus playbook).
_GOPHER_REP_CORPUS_SQL = (
    "SELECT doc_id AS id, text FROM documents "
    "UNION ALL SELECT doc_id + 100000, "
    "text || chr(10) || chr(10) || text || chr(10) || chr(10) || text "
    "FROM documents"
)


@register(
    "gopher_repetition_documents",
    sql=gopher_repetition_sql(_GOPHER_REP_CORPUS_SQL),
)
def gopher_repetition_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher repetition-rule half of the published quality filter
    (llm/textanalysis.py::gopher_repetition — Rae et al. 2021 §A1.1
    "repetitious text"): 13 rules over duplicate lines/paragraphs (count +
    char mass), top-{2,3,4}-gram char fractions, and duplicated-{5..10}-gram
    word coverage, every counter integer-exact and every ratio a
    cross-multiplied integer comparison. The oracle SQL is GENERATED from
    the same GOPHER_REP_THRESHOLDS literals (the winnow_sql playbook).
    Corpus = documents plus a triple-repeat paragraph variant per doc so the
    dup branches all fire. Shape at scale: segment/gram explodes into
    map-side-combinable groupBys; the coverage interval union is a
    per-(doc, n) window — parallel per document, no global sort."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    variant = d.select(
        (F.col("id") + 100000).alias("id"),
        F.concat_ws("\n\n", "text", "text", "text").alias("text"),
    )
    return gopher_repetition(d.unionByName(variant), "text", "id")


from ..llm.dsir import dsir_sample, dsir_sql  # noqa: E402

_DSIR_RAW_SQL = "SELECT doc_id AS id, text FROM documents"
_DSIR_TARGET_SQL = "SELECT doc_id AS id, text FROM documents WHERE lang = 'en'"


@register(
    "dsir_sample_documents",
    sql=dsir_sql(_DSIR_RAW_SQL, _DSIR_TARGET_SQL, n_buckets=512, top_k=100),
)
def dsir_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (llm/dsir.py — Xie et al. 2023): score
    every document by the log importance weight of its hashed
    unigram+bigram features under target-vs-raw bag-of-n-grams models
    (target = the English subset), then Gumbel-top-100 with the
    deterministic md5 uniform. The oracle is GENERATED from the same
    md5_bucket folds and smoothing literals (dsir_sql). Shape at scale:
    one feature explode, two broadcast n_buckets-row models, a per-doc
    sum, TakeOrdered keep set — the unigram_lm_scores pattern; nothing
    corpus-sized collected or broadcast."""
    d = _t(spark, sf_dir, "documents")
    raw = d.select("doc_id", "text")
    target = d.filter(F.col("lang") == "en").select("doc_id", "text")
    return dsir_sample(raw, target, n_buckets=512, top_k=100)


from ..llm.clustering import kmeans_fit, kmeans_sql  # noqa: E402

_KMEANS_SRC_SQL = "SELECT vec_id AS id, embedding FROM embeddings"


@register(
    "kmeans_clusters_embeddings",
    sql=kmeans_sql(_KMEANS_SRC_SQL, k=8, n_iters=4),
)
def kmeans_clusters_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus distributed Lloyd k-means (llm/clustering.py): 8
    clusters, 4 update rounds, md5-seeded deterministic init, all
    arithmetic in integer micro-units so the UNROLLED-CTE oracle
    (kmeans_sql — generated from the same literals) matches bit-for-bit:
    (vec_id, cluster, dist_q) with dist_q the exact integer squared
    distance. Shape at scale: one persisted quantization pass; per round
    a scan-local pandas_udf assignment (k x d ints in the closure) plus a
    map-side-combinable (cluster, dim) update whose exchange carries k*d
    groups; the driver holds k*d longs per round, never rows. This is the
    whole-corpus clustering primitive (domain discovery, SemDeDup
    buckets) next to train_ivf_centroids' bounded-sample coarse
    quantizer."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out, _ = kmeans_fit(e, "vec_id", "embedding", k=8, n_iters=4)
    return out.select(F.col("id").alias("vec_id"), "cluster", "dist_q")


from ..llm.textanalysis import bigram_lm_scores, bigram_lm_sql  # noqa: E402

_BLM_TRAIN_SQL = "SELECT doc_id AS id, text FROM documents WHERE lang = 'en'"
_BLM_SCORE_SQL = "SELECT doc_id AS id, text FROM documents"


@register(
    "bigram_lm_nll_documents",
    sql=bigram_lm_sql(_BLM_TRAIN_SQL, _BLM_SCORE_SQL),
)
def bigram_lm_nll_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-Backoff bigram LM scoring (llm/textanalysis.py::
    bigram_lm_scores — Brants et al. 2007): train bigram/unigram tables on
    the English subset, score EVERY document; non-English text shows up as
    a high exact-integer backoff count plus high nll — the rung of the
    CCNet quality ladder above unigram_lm_nll_documents. Oracle is
    GENERATED from the same counts and literals (bigram_lm_sql; its lag()
    window is the SQL spelling of the engine's pre-explode position zip).
    Shape at scale: two broadcast count models over the train corpus
    joined onto the score token stream, one per-doc avg — no windows, no
    sorts."""
    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("lang") == "en").select("doc_id", "text")
    return bigram_lm_scores(train, d.select("doc_id", "text"), "text", "doc_id")


def _install_kmv_sql() -> None:
    from ..operators.sketches import kmv_set_ops_sql

    QUERIES["kmv_setops_users_events"]["sql"] = kmv_set_ops_sql(
        "user_id", "(SELECT user_id FROM events WHERE event_type = 'click')",
        "user_id", "(SELECT user_id FROM events WHERE event_type = 'purchase')",
    )


@register("kmv_setops_users_events", sql=None)  # SQL installed below (generated)
def kmv_setops_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketches with SET ALGEBRA (operators/sketches.py::
    kmv_sketch/kmv_set_ops — Beyer et al. 2007): clicking users vs
    purchasing users, estimating |A|, |B|, |A∪B| and |A∩B| — the
    intersection estimate register-max HLL structurally cannot produce.
    Sketch build is a scan-local mapInPandas k-min per partition (bounded
    k-row state, ZERO corpus-sized shuffle — only <= partitions*k
    candidate hashes reach the merge); every count and kth hash in the
    output is an exact integer, the two estimator divisions are identical
    IEEE expressions both engines round at 4dp. Oracle is GENERATED from
    the same md5 fold and estimator literals (kmv_set_ops_sql)."""
    from ..operators.sketches import kmv_set_ops, kmv_sketch

    e = _t(spark, sf_dir, "events")
    a = kmv_sketch(e.filter(F.col("event_type") == "click"), "user_id")
    b = kmv_sketch(e.filter(F.col("event_type") == "purchase"), "user_id")
    return kmv_set_ops(a, b)


_install_kmv_sql()


def _install_sampled_quantiles_sql() -> None:
    from ..operators.sketches import sampled_quantiles_sql

    QUERIES["sampled_quantiles_lineitem"]["sql"] = sampled_quantiles_sql(
        "l_extendedprice",
        "(l_orderkey || ':' || l_linenumber)",
        "lineitem",
    )


@register("sampled_quantiles_lineitem", sql=None)  # SQL installed below (generated)
def sampled_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order statistics without a global sort (operators/sketches.py::
    sampled_quantiles): price quantiles from a deterministic 1024-row
    md5-k-min sample — TakeOrderedAndProject (per-partition heaps, no
    range Exchange), then nearest-rank-lower picks VERBATIM data values,
    so the surface is exact. The one-scan bounded-memory complement to
    exact_percentiles_lineitem's full histogram route; oracle GENERATED
    from the same fold/trim/index literals (sampled_quantiles_sql)."""
    from ..operators.sketches import sampled_quantiles

    li = _t(spark, sf_dir, "lineitem")
    return sampled_quantiles(
        li,
        "l_extendedprice",
        F.concat_ws(":", "l_orderkey", "l_linenumber"),
    )


_install_sampled_quantiles_sql()


def _install_psi_sql() -> None:
    from ..operators.profile import psi_drift_sql

    half = f"{md5_bucket_sql('doc_id')} % 2"
    QUERIES["psi_drift_documents"]["sql"] = psi_drift_sql(
        f"(SELECT lang, source FROM documents WHERE {half} = 0)",
        f"(SELECT lang, source FROM documents WHERE {half} = 1)",
        ["lang", "source"],
    )


@register("psi_drift_documents", sql=None)  # SQL installed below (generated)
def psi_drift_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor (operators/profile.py::
    psi_drift): the corpus' (lang, source) mix compared across two
    deterministic md5 halves — per-bucket add-one-smoothed PSI terms
    (WHICH slice drifted) plus the rolled-up __total__ alarm row. Counts
    exact integers, probabilities exact rationals of two totals, only
    the final ln is float (6dp contract). Shape at scale: two map-side
    combinable bucket counts, one outer join on the bucket key, two
    broadcast 1-row totals — one scan per snapshot, no sorts. Oracle
    GENERATED from the same literals (psi_drift_sql)."""
    from ..llm.curation import md5_bucket
    from ..operators.profile import psi_drift

    d = _t(spark, sf_dir, "documents")
    half = F.pmod(md5_bucket("doc_id"), F.lit(2))
    a = d.where(half == 0).select("lang", "source")
    b = d.where(half == 1).select("lang", "source")
    return psi_drift(a, b, ["lang", "source"])


_install_psi_sql()


def _install_second_moments_sql() -> None:
    from ..llm.linalg import second_moments_sql

    QUERIES["embedding_covariance"]["sql"] = second_moments_sql(
        "SELECT embedding FROM embeddings"
    )


@register("embedding_covariance", sql=None)  # SQL installed below (generated)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed second moments / covariance of the embedding corpus
    (llm/linalg.py::second_moments_q) — the map-side partial X^T X pass
    PCA, whitening, and Mahalanobis outlier scoring start from: one d x d
    int64 matmul per Arrow batch, d*(d+1)/2 exact-integer partial rows per
    batch into an integer-addition reduce (no float accumulation — the
    contract surface is exact up to a documented ~3.7e10-row overflow
    bound), cov derived by identical IEEE ops both engines round at 6dp.
    Oracle GENERATED from the same scale/round literals
    (second_moments_sql — the long-format self-join spelling of the
    batch matmul)."""
    from ..llm.linalg import second_moments_q

    e = _t(spark, sf_dir, "embeddings")
    return second_moments_q(e.select("embedding"))


_install_second_moments_sql()


#: pinned integer component matrix (k=2, d=64) for the pca_project oracle
#: gate — deterministic small weights so every reduction stays exact int64
PCA_PINNED_COMPONENTS = [
    [((i * 7 + 3) % 5) - 2 for i in range(64)],
    [((i * 13 + 1) % 7) - 3 for i in range(64)],
]


def _install_pca_project_sql() -> None:
    from ..llm.linalg import pca_project_pinned_sql

    QUERIES["pca_project_embeddings"]["sql"] = pca_project_pinned_sql(
        "SELECT vec_id, embedding FROM embeddings", PCA_PINNED_COMPONENTS
    )


@register("pca_project_embeddings", sql=None)  # SQL installed below (generated)
def pca_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection pass (llm/linalg.py::pca_project) on PINNED integer
    components — the oracle gate for the projection machinery (scan-local
    Arrow-batched matmul with the component matrix in the closure, exact
    integer centering sums, one d-int driver row — never the corpus).
    Pinning the components sidesteps the eigendecomposition's float
    non-portability (the eigen route is separately verified against
    numpy in tests/test_llm_ops.py) while value-hashing the projection
    itself: micro-unit quantization, the X @ W^T reduce, the mu . W
    centering, and the 6dp de-scale all run under the DuckDB mirror
    (pca_project_pinned_sql, GENERATED from the same literals). Output
    LONG format (vec_id, component, y) so the hash covers scalars."""
    from ..llm.linalg import pca_project

    e = _t(spark, sf_dir, "embeddings")
    out, _, _ = pca_project(
        e.select("vec_id", "embedding"), components=PCA_PINNED_COMPONENTS
    )
    return out.select(
        "vec_id", F.posexplode("pca").alias("component", "y")
    )


_install_pca_project_sql()


def _install_streaming_psi_sql() -> None:
    from ..operators.profile import psi_drift_by_sql

    ref = """SELECT event_type,
       CAST(count(*) AS BIGINT) AS count_a FROM events GROUP BY 1"""
    cur = """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type, CAST(count(*) AS BIGINT) AS count_b
FROM events GROUP BY 1, 2"""
    QUERIES["streaming_psi_events"]["sql"] = psi_drift_by_sql(
        ref, cur, ["window_start"], ["event_type"]
    )


@register("streaming_psi_events", sql=None)  # SQL installed below (generated)
def streaming_psi_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window drift monitoring on a TRUE stream: the tumbling 1h
    event_type counts run as a watermarked Structured Streaming query
    (drained AvailableNow, complete mode), then each window's mix is
    PSI-scored against the full-corpus reference distribution with
    psi_drift_by — the foreachBatch shape of a production drift alarm
    (the windowed counts are the streaming state; the PSI join is the
    per-batch enrich). Union-of-buckets smoothing per window; __total__
    row per window is the alarm value. Oracle GENERATED from the same
    literals (psi_drift_by_sql over date_trunc'd batch windows)."""
    from ..operators.profile import psi_drift_by
    from ..streaming import read_events_stream

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    windowed = tumbling_agg(stream, "1 hour", watermark="1 hour")
    drained = _drain_stream(spark, windowed, "t_psi", output_mode="complete")
    cur = drained.select(
        "window_start", "event_type", F.col("n_events").alias("count_b")
    )
    ref = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("count_a"))
    )
    return psi_drift_by(ref, cur, ["window_start"], ["event_type"])


_install_streaming_psi_sql()


from ..operators.graph import label_propagation, label_propagation_sql  # noqa: E402

_LPA_NODES_SQL = "SELECT doc_id AS id FROM documents"
# blocks of 8 docs: a star onto the block head plus the block-internal
# chain — real community structure (dense blocks, no bridges) so the
# propagation outcome is meaningful, not just deterministic
_LPA_EDGES_SQL = """
SELECT u, v FROM (
  SELECT doc_id AS u, (doc_id // 8) * 8 AS v FROM documents
  UNION
  SELECT doc_id AS u, doc_id + 1 AS v FROM documents
  WHERE (doc_id + 1) // 8 = doc_id // 8
    AND doc_id + 1 IN (SELECT doc_id FROM documents)
) WHERE u <> v
"""


@register(
    "label_propagation_documents",
    sql=label_propagation_sql(_LPA_NODES_SQL, _LPA_EDGES_SQL, iterations=3)
    .replace("SELECT l.id, l.label", "SELECT l.id AS doc_id, l.label"),
)
def label_propagation_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (operators/graph.py — Raghavan et al.
    2007) over a block-community graph on documents (8-doc blocks: star
    onto the block head + internal chain): community detection one rung
    above connected components — dense neighborhoods win, thin bridges
    don't merge. Fully deterministic (synchronous rounds, majority label
    with smallest-label ties, isolated nodes keep theirs — all integers,
    no floats), so the oracle UNROLLS the identical 3 rounds as CTEs.
    Per round: one O(edges) join + map-side-combinable (node, label)
    count + per-node argmax window; localCheckpoint truncates lineage."""
    d = _t(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    ids = d.select(F.col("doc_id").alias("__t"))
    # integer-exact block arithmetic (floor(x/8) via double drifts past
    # 2^53): head = doc_id - doc_id%8; same-block successor iff (u+1)%8 != 0
    star = d.select(
        F.col("doc_id").alias("u"),
        (F.col("doc_id") - F.pmod("doc_id", F.lit(8))).cast("long").alias("v"),
    )
    chain = (
        d.select(
            F.col("doc_id").alias("u"),
            (F.col("doc_id") + 1).cast("long").alias("v"),
        )
        .where(F.pmod(F.col("u") + 1, F.lit(8)) != 0)
        .join(F.broadcast(ids), F.col("v") == F.col("__t"), "left_semi")
    )
    edges = star.unionByName(chain).distinct().where(F.col("u") != F.col("v"))
    return label_propagation(nodes, edges, iterations=3).select(
        F.col("id").alias("doc_id"), "label", "community_size"
    )


def _install_kmv_overlap_sql() -> None:
    from ..operators.sketches import kmv_adjacent_overlap_sql, kmv_by_sql

    sketch = kmv_by_sql(
        "user_id",
        ["day"],
        "(SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id FROM events)",
    )
    QUERIES["kmv_day_overlap_events"]["sql"] = kmv_adjacent_overlap_sql(
        sketch, "day", "strftime(CAST(g AS DATE) + INTERVAL 1 DAY, '%Y-%m-%d')"
    )


@register("kmv_day_overlap_events", sql=None)  # SQL installed below (generated)
def kmv_day_overlap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day returning-user estimation from GROUPED KMV sketches
    (operators/sketches.py::kmv_sketch_by/kmv_adjacent_overlap): per-day
    distinct-user sketches (scan-local per-partition k-min, group-keyed
    sketch-sized merge), then for each consecutive day pair the union
    re-trim + rho-ratio intersection estimate — the bounded-memory form
    of retention overlap (exact distinct-intersections at 1e10 users/day
    need the full sets; these are k rows per day). Everything after the
    one corpus scan is sketch-sized with broadcast joins. Oracle
    GENERATED from the same fold and estimator literals."""
    from ..operators.sketches import kmv_adjacent_overlap, kmv_sketch_by

    e = _t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    s = kmv_sketch_by(e, ["day"], "user_id")
    nxt = F.date_format(F.date_add(F.to_date(F.col("g")), 1), "yyyy-MM-dd")
    return kmv_adjacent_overlap(s, "day", nxt)


_install_kmv_overlap_sql()


def _install_mi_sql() -> None:
    from ..operators.profile import mutual_information_sql

    QUERIES["mutual_information_documents"]["sql"] = mutual_information_sql(
        "documents", "lang", "source"
    )


@register("mutual_information_documents", sql=None)  # SQL installed below (generated)
def mutual_information_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-dependency profile (operators/profile.py::mutual_information):
    MI, entropies, and NMI of (lang, source) — the check a curation
    pipeline runs before trusting a column as a stratification key (high
    NMI = confounded splits). One (x, y) groupBy over the corpus; the
    marginals and total derive from the joint table, so everything after
    the scan is joint-cardinality-sized with broadcast joins. Exact
    rationals into ln/sqrt, rounded 6dp; oracle GENERATED with the same
    evaluation order (mutual_information_sql)."""
    from ..operators.profile import mutual_information

    d = _t(spark, sf_dir, "documents")
    return mutual_information(d, "lang", "source")


_install_mi_sql()


@register(
    "audio_segments_media",
    sql="""
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(doc_id % 90000 + 2000 AS BIGINT) AS dur
  FROM documents
), s AS (
  SELECT media_id, dur,
         unnest(generate_series(0,
           CASE WHEN dur > 30000
                THEN CAST(1 + (dur - 30000 + 20000 - 1) // 20000 AS INT)
                ELSE 1 END - 1)) AS seg_idx
  FROM m
)
SELECT media_id, CAST(seg_idx AS INT) AS seg_idx,
       CAST(seg_idx * 20000 AS BIGINT) AS start_ms,
       CAST(least(seg_idx * 20000 + 30000, dur) AS BIGINT) AS end_ms,
       CAST((least(seg_idx * 20000 + 30000, dur) - seg_idx * 20000) * 16000 // 1000
            AS BIGINT) AS n_samples
FROM s
""",
)
def audio_segments_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio ingest segmentation plumbing (llm/multimodal.py::
    audio_segments): 30s windows with 20s hop over deterministic
    duration metadata (documents standing in as clips, the
    frame_sample_media convention) — all integer column expressions, NO
    UDF, zero shuffle: the plan pipelines into the decode mapInPandas
    that would follow it. The one op where the whole multimodal step is
    oracle-exact end to end (planning needs metadata, never bytes)."""
    from ..llm.multimodal import audio_segments

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 90000 + 2000).cast("long").alias("duration_ms"),
    )
    return audio_segments(media)




def _install_grouped_quantiles_sql() -> None:
    from ..operators.sketches import sampled_quantiles_by_sql

    QUERIES["sampled_quantiles_by_returnflag"]["sql"] = sampled_quantiles_by_sql(
        "l_extendedprice",
        "(l_orderkey || ':' || l_linenumber)",
        ["l_returnflag"],
        "lineitem",
    )


@register("sampled_quantiles_by_returnflag", sql=None)  # SQL installed below
def sampled_quantiles_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group order statistics without sorts (operators/sketches.py::
    sampled_quantiles_by): price quantiles per l_returnflag from
    deterministic 1024-row per-group md5-k-min samples — scan-local
    per-(partition, group) partials with the value as payload, a
    group-keyed candidate-only merge (the corpus never shuffles), and
    nearest-rank-lower verbatim data values. Oracle GENERATED from the
    same fold/trim/rank/index literals."""
    from ..operators.sketches import sampled_quantiles_by

    li = _t(spark, sf_dir, "lineitem")
    return sampled_quantiles_by(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        F.concat_ws(":", "l_orderkey", "l_linenumber"),
    )


_install_grouped_quantiles_sql()


def _install_ewma_sql() -> None:
    from ..operators.windows import ewma_by_sql

    inner = ewma_by_sql(
        "(SELECT user_id, CAST(event_id AS BIGINT) AS event_id, ts,"
        " round(value, 2) AS v FROM events)",
        ["user_id"],
        ["ts", "event_id"],
        "v",
    )
    QUERIES["ewma_user_value_events"]["sql"] = (
        "SELECT user_id, event_id,"
        " strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, v, ewma"
        f" FROM ({inner})"
    )


@register("ewma_user_value_events", sql=None)  # SQL installed below (generated)
def ewma_user_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-window EWMA smoothing per user (operators/windows.py::
    ewma_by, alpha=0.25 over the trailing 8 events): the anomaly-monitor
    smoothing pass as ONE keyed frame aggregate — collect_list over the
    row frame (frame order is the ORDER BY order) plus a higher-order
    fold; no shuffle beyond the keyed-window exchange; the closed-form
    denominator handles the warm-up rows. The unbounded recurrence is the
    streaming side's shape; the bounded form drops (1-a)^8 of the weight
    mass, documented not hidden. Oracle GENERATED (ewma_by_sql — same
    frame, same sequential weighted fold)."""
    from ..operators.windows import ewma_by

    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").cast("long").alias("event_id"),
        "ts",
        F.round("value", 2).alias("v"),
    )
    out = ewma_by(e, ["user_id"], ["ts", "event_id"], "v")
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "v",
        "ewma",
    )


_install_ewma_sql()


def _install_winsorize_sql() -> None:
    from ..operators.sketches import winsorize_stats_by_sql

    QUERIES["winsorize_prices_returnflag"]["sql"] = winsorize_stats_by_sql(
        "l_extendedprice",
        "(l_orderkey || ':' || l_linenumber)",
        ["l_returnflag"],
        "lineitem",
    )


@register("winsorize_prices_returnflag", sql=None)  # SQL installed below
def winsorize_prices_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization audit (operators/sketches.py::
    winsorize_stats_by): prices clipped to each return flag's sampled
    [p5, p95] bounds — the heavy-tail handling pass before feature
    normalization, shipped as its audit aggregate so the surface is
    exact (integer clip counts, verbatim data-value bounds, and a
    DECIMAL(18,2) winsorized sum — a double sum at this magnitude could
    not be rounded into cross-engine agreement). Two scans, one
    broadcast bounds join, no sorts. Oracle GENERATED on the same
    quantile SQL."""
    from ..operators.sketches import winsorize_stats_by

    li = _t(spark, sf_dir, "lineitem")
    return winsorize_stats_by(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        F.concat_ws(":", "l_orderkey", "l_linenumber"),
    )


_install_winsorize_sql()


@register(
    "streaming_ewma_events",
    sql="""
WITH o AS (
  SELECT user_id, CAST(event_id AS BIGINT) AS event_id, ts,
         round(value, 2) AS v,
         array_agg(round(value, 2)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS pre
  FROM events
)
SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, v,
       floor(list_reduce(pre,
         (acc, x) -> CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * acc)
         * 1000000.0 + 0.5) / 1000000.0 AS ewma
FROM o
""",
)
def streaming_ewma_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNBOUNDED EWMA recurrence as a TRUE stateful stream
    (streaming/stateful.py::streaming_ewma — the shape ewma_by's bounded
    window defers to streaming): per-user exponential smoothing whose
    whole history folds into ONE checkpointed double per key, drained
    AvailableNow and hash-checked against DuckDB's list_reduce left fold
    over each row's full ordered prefix — the same association order as
    the per-row state update, so the trace matches to 6dp. The third
    applyInPandasWithState operator family (first-seen, CDC, now
    numeric-fold state)."""
    from ..streaming import read_events_stream, streaming_ewma
    from ..streaming.windows import _ensure_event_time

    stream = _ensure_event_time(
        read_events_stream(spark, f"{sf_dir}/events.parquet")
    ).select(
        "user_id",
        F.col("event_id").cast("long").alias("event_id"),
        "ts",
        F.round("value", 2).alias("v"),
    )
    # alpha=0.3, NOT the 0.25 default: dyadic weights (2^-2) keep the fold
    # in exact binary arithmetic over cent inputs, which lands on exact
    # decimal .5 boundaries where Spark's BigDecimal half-up and DuckDB's
    # multiply-based round disagree; a non-dyadic alpha makes exact
    # ARITHMETIC halves measure-zero. It does NOT protect against
    # SHORTEST-REPR halves (a double whose shortest decimal repr ends
    # ...5, ~1e-7 of rows): the sf0.1 gate caught 5 of those (PARITY r12),
    # so the contract rounding is now the explicit IEEE
    # floor(x*1e6 + 0.5)/1e6 on BOTH engines (streaming_ewma + oracle).
    # (1.0 - 0.3 == double(0.7) exactly — the subtraction ties to even —
    # so the complement weight literal is safe here.)
    out = streaming_ewma(
        stream, ["user_id"], "v", order_cols=["ts", "event_id"], alpha=0.3
    )
    drained = _drain_stream(spark, out, "t_ewma")
    return drained.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "v",
        "ewma",
    )

def _install_source_overlap_sql() -> None:
    from ..operators.sketches import kmv_by_sql, kmv_pairwise_overlap_sql

    seeded = (
        "(SELECT source, CASE WHEN doc_id % 3 = 0 "
        "THEN 'shared pool ' || CAST(doc_id % 50 AS VARCHAR) "
        "ELSE text END AS content FROM documents)"
    )
    sketch = kmv_by_sql("content", ["source"], seeded)
    QUERIES["source_overlap_matrix"]["sql"] = kmv_pairwise_overlap_sql(
        sketch, "source"
    )


@register("source_overlap_matrix", sql=None)  # SQL installed below (generated)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content-overlap MATRIX from grouped KMV sketches
    (operators/sketches.py::kmv_sketch_by/kmv_pairwise_overlap) — the
    survey a corpus merge runs FIRST: which of the G sources share content
    and how much, before any row-level dedup is scheduled. Per-source
    distinct-content sketches (scan-local per-partition k-min, group-keyed
    sketch-sized merge), then for EVERY unordered source pair the union
    re-trim + rho-ratio intersection estimate — G(G-1)/2 pairs x 2k sketch
    rows of algebra, so a 1000-source merge survey costs ~500k tiny rows
    after ONE corpus scan, where exact pairwise distinct-intersections
    would need G full passes.

    Deterministic seeded overlap (the synthetic corpus's sources are
    otherwise disjoint): every doc_id % 3 == 0 document's content is
    replaced by one of 50 shared pool values, which span sources by
    construction (pool key doc_id % 50 vs source key doc_id % 20), so the
    matrix has real non-zero intersections to estimate. Oracle GENERATED
    from the same md5 fold and estimator literals."""
    from ..operators.sketches import kmv_pairwise_overlap, kmv_sketch_by

    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("shared pool "), (F.col("doc_id") % 50).cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("content"),
    )
    s = kmv_sketch_by(d, ["source"], "content")
    return kmv_pairwise_overlap(s, "source")


_install_source_overlap_sql()


@register(
    "edit_distance_pairs_documents",
    sql="""
WITH c AS (
  SELECT doc_id AS id, substr(text, 1, 40) AS t FROM documents
  UNION ALL
  SELECT doc_id + 100000, substr(text, 1, 6) || substr(text, 8, 33) FROM documents
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM c a JOIN c b ON a.id < b.id AND abs(len(a.t) - len(b.t)) <= 2
WHERE levenshtein(a.t, b.t) <= 2
""",
)
def edit_distance_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-level near-dup mining (llm/dedup.py::edit_distance_pairs —
    PASS-JOIN segment matching): exact pairs within Levenshtein distance 2
    over 40-char document keys plus a 1-char-deletion corrupted copy per doc
    — the third dedup similarity class (edit distance) next to
    set-similarity and hash-based, catching the single-character variants
    word-shingle methods cannot see (one edit changes every overlapping
    word gram). Spark side: each string is cut into d+1 segments (pigeonhole:
    any pair within distance d shares one segment verbatim), candidates come
    from an equi-join of segments against the substring windows they could
    match, then a JVM banded levenshtein(threshold) verifies — no all-pairs
    stage (the earlier Ed-Join q-gram prefix filter was measured collapsing
    on templated corpora, ×51 candidates per 10× rows, and replaced); the
    quadratic DuckDB oracle is the blocking-free ground truth (both engines'
    levenshtein agree on the standard DP)."""
    from ..llm.dedup import edit_distance_pairs

    d = _t(spark, sf_dir, "documents")
    corpus = d.select(
        F.col("doc_id").alias("id"), F.substring("text", 1, 40).alias("t")
    ).unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("id"),
            F.concat(
                F.substring("text", 1, 6), F.substring("text", 8, 33)
            ).alias("t"),
        )
    )
    return edit_distance_pairs(corpus, "t", "id", max_dist=2)


def _install_tfidf_sql() -> None:
    from ..llm.retrieval import tfidf_topk_terms_sql

    QUERIES["tfidf_topk_terms_documents"]["sql"] = tfidf_topk_terms_sql(topk=3)


@register("tfidf_topk_terms_documents", sql=None)  # SQL installed below (generated)
def tfidf_topk_terms_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction (llm/retrieval.py::tfidf_topk_terms):
    top-3 terms by smoothed TF-IDF — the document-major companion to BM25
    (same postings algebra; sklearn-style smooth idf). Postings and document
    frequency are two map-side-combinable groupBys; N broadcasts as a 1-row
    aggregate; the per-doc cut is a literal row_number()<=k filter Spark
    rewrites into a map-side WindowGroupLimit, so no doc's postings funnel
    through one task un-pruned. The oracle SQL is generated from the same
    formula (tfidf_topk_terms_sql) so Spark and DuckDB can only drift
    together."""
    from ..llm.retrieval import tfidf_topk_terms

    d = _t(spark, sf_dir, "documents")
    return tfidf_topk_terms(
        d.select("doc_id", "text"), "text", "doc_id", topk=3
    ).withColumnRenamed("id", "doc_id").select(
        F.col("doc_id"), "term", "tf", "score", "rk"
    )


_install_tfidf_sql()


@register(
    "mad_outliers_events",
    sql="""
WITH q AS (
  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cv
  FROM events
),
med AS (
  SELECT event_type, quantile_cont(cv, 0.5) AS m FROM q GROUP BY event_type
),
mad AS (
  SELECT q.event_type, quantile_cont(abs(q.cv - med.m), 0.5) AS mad
  FROM q JOIN med USING (event_type) GROUP BY q.event_type, med.m
)
SELECT q.event_id, q.event_type, round(q.cv / 100.0, 2) AS value,
       round(0.6745 * (q.cv - med.m) / mad.mad, 4) AS robust_z
FROM q JOIN med USING (event_type) JOIN mad USING (event_type)
WHERE mad.mad > 0
  AND abs(0.6745 * (q.cv - med.m) / mad.mad) > 3.5
""",
)
def mad_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier flagging via the modified z-score
    (Iglewicz-Hoaglin 0.6745 * (x - median) / MAD, cut at 3.5) — the
    quality gate that, unlike outliers_events_zscore, a single extreme
    value cannot poison (mean/std break down exactly when outliers exist;
    median/MAD have a 50% breakdown point). Values quantize to integer
    cents first, so both engines interpolate medians over integers (exact
    .0/.5 results — no float-median parity risk). Plan: two groupBy
    aggregation passes (median, then MAD over the broadcast-joined
    residuals) and one broadcast-back flag filter — three scans, zero
    windows, no per-group row funnel."""
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cv"),
    )
    med = q.groupBy("event_type").agg(
        F.percentile("cv", F.lit(0.5)).alias("m")
    )
    mad = (
        q.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "m")
        .agg(F.percentile(F.abs(F.col("cv") - F.col("m")), F.lit(0.5)).alias("mad"))
    )
    rz = 0.6745 * (F.col("cv") - F.col("m")) / F.col("mad")
    return (
        q.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(rz) > 3.5))
        .select(
            "event_id",
            "event_type",
            F.round(F.col("cv") / 100.0, 2).alias("value"),
            F.round(rz, 4).alias("robust_z"),
        )
    )


def _install_char_entropy_sql() -> None:
    from ..llm.textanalysis import char_entropy_sql

    QUERIES["char_entropy_documents"]["sql"] = (
        "SELECT id AS doc_id, n_chars, entropy_bits FROM ("
        + char_entropy_sql("SELECT doc_id AS id, text FROM documents")
        + ")"
    )


@register("char_entropy_documents", sql=None)  # SQL installed below (generated)
def char_entropy_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-entropy quality signal
    (llm/textanalysis.py::char_entropy): Shannon bits over the char
    distribution — degenerate repetition scores near 0, noise/binary
    spillage scores high; pretraining filters cut on both ends. Two
    map-side-combinable groupBys; exchanges carry (id, char, count) rows
    only, never text. Oracle generated from the same formula
    (char_entropy_sql)."""
    from ..llm.textanalysis import char_entropy

    d = _t(spark, sf_dir, "documents")
    return char_entropy(d.select("doc_id", "text"), "text", "doc_id").select(
        F.col("id").alias("doc_id"), "n_chars", "entropy_bits"
    )


_install_char_entropy_sql()


@register(
    "streaming_simhash_near_dup_documents",
    sql=f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' zzdup' FROM documents
), w AS (
  SELECT id, unnest({_W}) AS word FROM corpus
), h AS (
  SELECT id, {md5_bucket_sql("word", 8)} AS hw FROM w
), bits AS (
  SELECT id, b.bit,
         sum(CASE WHEN (hw >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(generate_series(0, 31)) AS bit) b
  GROUP BY id, b.bit
), sh AS (
  SELECT id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS sh
  FROM bits GROUP BY id
)
SELECT a.id AS doc_id,
       coalesce(bool_or(bit_count(xor(a.sh, b.sh)) <= 3), FALSE) AS is_near_dup
FROM sh a LEFT JOIN sh b
  ON b.id < a.id AND bit_count(xor(a.sh, b.sh)) <= 3
GROUP BY a.id
""",
)
def streaming_simhash_near_dup_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRUE-STREAMING near-dup flagging
    (streaming/stateful.py::streaming_simhash_near_dup): documents arrive
    as a stream (plus perturbed +100000 copies arriving 'later' by order),
    each carrying its portable 32-bit simhash computed in the stream
    projection; per (band, slice) bucket an applyInPandasWithState keeps
    the earliest signatures and flags any arrival within hamming<=3 of an
    EARLIER doc — lossless for the hamming ball by pigeonhole (4 bands,
    <=3 flips leave one band untouched). The drained per-band rows OR into
    one flag per doc. The oracle is the exact quadratic
    earlier-within-hamming-3 answer over the identical md5-derived
    signatures — no banding in the oracle at all, which is exactly the
    losslessness claim under test."""
    from ..llm.dedup import simhash_fast
    from ..streaming import read_events_stream
    from ..streaming.stateful import streaming_simhash_near_dup

    stream = read_events_stream(spark, f"{sf_dir}/documents.parquet")
    corpus = stream.select(
        F.col("doc_id").alias("id"), F.col("text")
    ).unionByName(
        stream.select(
            (F.col("doc_id") + 100000).alias("id"),
            F.concat("text", F.lit(" zzdup")).alias("text"),
        )
    )
    sig = corpus.select(
        "id", F.col("id").alias("ord"), simhash_fast("text", 32).alias("sig")
    )
    # max_state lifted to corpus size for the PARITY surface: the exact
    # quadratic oracle knows nothing of the production state ceiling, and
    # at sf0.1 skewed (band, value) buckets overflowed the 256 default —
    # dup became the documented lower bound and the gate went red (PARITY
    # r12 sf0.1). Production keeps the bounded default; the ceiling
    # semantics are pinned by the state-cap unit test instead.
    flagged = streaming_simhash_near_dup(
        sig, "id", "ord", "sig", bits=32, bands=4, max_hamming=3,
        max_state=200_000,
    )
    drained = _drain_stream(spark, flagged, "t_simdup")
    return drained.groupBy("id").agg(
        F.expr("bool_or(dup)").alias("is_near_dup")
    ).select(F.col("id").alias("doc_id"), "is_near_dup")


@register(
    "streaming_curate_documents",
    sql=rf"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '') AS words
  FROM documents
), m AS (
  SELECT doc_id, text, words,
         {_QUALITY_W} AS quality,
         len(list_filter(words, x -> lower(x) IN ('the','and','of','is'))) AS s_en,
         len(list_filter(words, x -> lower(x) IN ('el','la','de','que'))) AS s_es,
         len(list_filter(words, x -> lower(x) IN ('le','la','et','les'))) AS s_fr,
         len(list_filter(words, x -> lower(x) IN ('der','die','und','das'))) AS s_de
  FROM w
), f AS (
  SELECT doc_id, text, words FROM m
  WHERE len(words) >= 10
    AND quality >= 0.5
    AND (CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
              WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
              WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
              WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
              WHEN s_de = greatest(s_en, s_es, s_fr, s_de) THEN 'de'
              ELSE 'und' END) IN ('en', 'und')
), s AS (
  SELECT doc_id AS id, md5(text) AS h, {_SH3} AS sh FROM f
)
SELECT a.id AS doc_id,
       EXISTS(SELECT 1 FROM s b WHERE b.id < a.id AND b.h = a.h) AS dup_exact,
       EXISTS(SELECT 1 FROM s b WHERE b.id < a.id
              AND CAST(least(len(a.sh), len(b.sh)) AS DOUBLE)
                  / greatest(len(a.sh), len(b.sh)) >= 0.8
              AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                        / len(list_distinct(list_concat(a.sh, b.sh))), 4)
                  >= 0.8) AS near_dup,
       NOT EXISTS(SELECT 1 FROM s b WHERE b.id < a.id AND b.h = a.h)
         AND NOT EXISTS(SELECT 1 FROM s b WHERE b.id < a.id
              AND CAST(least(len(a.sh), len(b.sh)) AS DOUBLE)
                  / greatest(len(a.sh), len(b.sh)) >= 0.8
              AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                        / len(list_distinct(list_concat(a.sh, b.sh))), 4)
                  >= 0.8) AS admitted
FROM s a
""",
)
def streaming_curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming curation composite (VERDICT r12 #7 —
    streaming/curate.py::streaming_curate): documents arrive as a TRUE
    multi-micro-batch stream (three id-range chunk files, maxFilesPerTrigger
    1 — the order-monotonic delivery contract); each micro-batch runs the
    batch chain's scan-local filter, within-batch exact + banded-LSH near
    dedup, and the incremental_dedup probe against the parquet INDEX of all
    previously-filtered docs, then appends itself to that index — the
    foreachBatch production shape where the standing corpus is never
    re-deduped. Verdict per filtered doc: (dup_exact, near_dup, admitted),
    each defined against STRICTLY-EARLIER filtered docs only, so the drained
    stream equals the batch replay and the oracle is the exact quadratic
    earlier-doc answer over the same md5/shingle surfaces (count-ratio
    prefilter is lossless at jaccard >= 0.8; 32 hashes / 16 bands puts the
    band-miss probability ~3e-12, the incremental_dedup_documents claim).
    Parity lifts the LSH hot-bucket ceilings (max_bucket_size=None), as
    every parity query does — production keeps the bounded defaults."""
    import shutil
    import tempfile

    from ..streaming.curate import streaming_curate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="curate_stream_")
    src = f"{base}/src"
    try:
        hi = d.agg(F.max("doc_id")).first()[0] + 1
        n_chunks = 3
        step = (hi + n_chunks - 1) // n_chunks
        # The three chunk writes are independent jobs over disjoint id
        # ranges — submit them from a small thread pool so the later jobs
        # back-fill the earlier jobs' task tails (guide §2.6) instead of
        # paying three sequential job walls. Each chunk lands in its own
        # staging dir so part files attribute to chunks without the
        # write-order bookkeeping, then moves into the source dir.
        import glob as _glob
        import os as _os
        from concurrent.futures import ThreadPoolExecutor

        def _write_chunk(i: int) -> None:
            d.filter(
                (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
            ).sort("doc_id").coalesce(1).write.mode("overwrite").parquet(
                f"{base}/c{i}"
            )

        with ThreadPoolExecutor(max_workers=n_chunks) as tp:
            list(tp.map(_write_chunk, range(n_chunks)))
        _os.makedirs(src, exist_ok=True)
        for i in range(n_chunks):
            # FileStreamSource orders files by modification time; stamp each
            # chunk's part files with explicitly increasing mtimes so
            # delivery order (the strictly-earlier-id contract, ADVICE r13)
            # is forced, not hoped for.
            for j, p in enumerate(sorted(_glob.glob(f"{base}/c{i}/*.parquet"))):
                dst = f"{src}/chunk{i:03d}_{j:03d}.parquet"
                _os.rename(p, dst)
                _os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        streaming_curate(
            stream,
            checkpoint_dir=f"{base}/ckpt",
            index_dir=f"{base}/index",
            out_dir=f"{base}/out",
            id_col="doc_id",
            text_col="text",
            jaccard_threshold=0.8,
            n_hashes=32,
            bands=16,
            max_bucket_size=None,
        )
        res = spark.read.parquet(f"{base}/out").select(
            F.col("id").alias("doc_id"), "dup_exact", "near_dup", "admitted"
        )
        # materialize before the temp dirs go away (the drained verdict is
        # one small row per filtered doc)
        return local_df(spark, res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "ols_trend_events",
    sql="""
WITH q AS (
  SELECT event_type,
         (epoch_us(ts) - 1704067200000000) AS xus,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
), qq AS (
  SELECT event_type,
         (xus - ((xus % 60000000) + 60000000) % 60000000) // 60000000 AS x,
         y
  FROM q
), m AS (
  SELECT event_type,
         CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(CAST(x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
         CAST(sum(CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
         CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sxx,
         CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sxy
  FROM qq GROUP BY event_type
), c AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
         nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0) AS den,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM m
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(num / den, 6) AS slope_cents_per_min,
       round((syd - (num / den) * sxd) / CAST(n AS DOUBLE), 4) AS intercept_cents
FROM c
""",
)
def ols_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS trend (is each event type's value drifting
    over the month?): slope/intercept from the five classical moments, all
    accumulated as EXACT integers — x quantized to minutes since the corpus
    epoch by an explicit exact FLOOR division ((a - pmod(a, d)) div d, so
    pre-epoch timestamps bucket identically cross-engine regardless of
    either engine's truncation convention — ADVICE r11), y to cents,
    per-row cross products in DECIMAL(19,0)x(19,0) and sums kept at the
    full DECIMAL(38,0) accumulator width (never narrowed: a 19-digit cast
    would go silently NULL in non-ANSI Spark but raise in DuckDB — the
    silent-vs-loud trap). The coefficient arithmetic then runs in DOUBLE
    on BOTH engines — each exact decimal sum converts once, and the
    multiply/subtract/divide chain is correctly-rounded IEEE, identical
    cross-engine at any magnitude (decimal-38 products would instead hit
    engine-divergent overflow behavior in exactly the 100x regime). A
    single-minute group (den = 0) yields NULL slope/intercept via an
    explicit guard in both engines, not inf/exception. Plan: a single
    map-side-combinable groupBy over the scan (five algebraic sums), 5-row
    result; no window, no second pass, nothing collected."""
    ev = _t(spark, sf_dir, "events")
    dec = "decimal(19,0)"
    wide = "decimal(38,0)"
    x_us = "(unix_micros(cast(ts as timestamp)) - 1704067200000000)"
    q = ev.select(
        "event_type",
        # ts loads as TIMESTAMP_NTZ; session TZ is pinned UTC so the cast
        # is identity — the unix_micros(NTZ) trap from the verify notes
        F.expr(f"({x_us} - pmod({x_us}, 60000000)) div 60000000").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    m = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(wide).alias("n"),
        F.sum(F.col("x").cast(dec)).cast(wide).alias("sx"),
        F.sum(F.col("y").cast(dec)).cast(wide).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).cast(wide).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).cast(wide).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sxd * syd
    den_raw = nd * F.col("sxx").cast("double") - sxd * sxd
    den = F.when(den_raw != 0, den_raw)  # NULL on a single-minute group
    slope = num / den
    intercept = (syd - slope * sxd) / nd
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope_cents_per_min"),
        F.round(intercept, 4).alias("intercept_cents"),
    )


def _install_jsd_sql() -> None:
    from ..operators.profile import js_divergence_by_sql

    QUERIES["js_divergence_sources"]["sql"] = js_divergence_by_sql(
        f"SELECT source AS g, unnest({_W}) AS w FROM documents"
    ).replace("group_a", "source_a").replace("group_b", "source_b")


@register("js_divergence_sources", sql=None)  # SQL installed below (generated)
def js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every pair of document
    SOURCES' word distributions (operators/profile.py::js_divergence_by) —
    the symmetric, always-defined corpus-comparison signal a mixing
    pipeline reads before blending sources (KL blows up on one-sided
    vocabulary; JSD is bounded [0,1] bits). One (source, word) groupBy over
    the corpus; the pair frame is source-cardinality-sized and broadcast;
    per-pair vocab union via FULL OUTER join on (pair, word). Oracle
    generated from the same formula and evaluation order."""
    from ..llm.textanalysis import words
    from ..operators.profile import js_divergence_by

    d = _t(spark, sf_dir, "documents")
    rows = d.select("source", F.explode(words("text")).alias("w"))
    out = js_divergence_by(rows, "source", "w")
    return out.select(
        F.col("group_a").alias("source_a"),
        F.col("group_b").alias("source_b"),
        "n_a",
        "n_b",
        "jsd_bits",
    )


_install_jsd_sql()


def _install_kanon_sql() -> None:
    from ..llm.curation import k_anonymity_sql

    QUERIES["k_anonymity_events"]["sql"] = k_anonymity_sql(
        "SELECT event_type, CAST(ts AS DATE) AS day, user_id % 50 AS ubkt "
        "FROM events",
        ["event_type", "day", "ubkt"],
        k=10,
    )


@register("k_anonymity_events", sql=None)  # SQL installed below (generated)
def k_anonymity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (llm/curation.py::k_anonymity_report) over the
    quasi-identifier combination (event_type, day, user-bucket): the
    equivalence-class-size histogram with the below-k flag — the
    re-identification risk curve a data release reviews next to PII
    redaction. Two map-side-combinable groupBys; the second pass runs over
    the class frame, never the corpus."""
    from ..llm.curation import k_anonymity_report

    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        (F.col("user_id") % 50).alias("ubkt"),
    )
    return k_anonymity_report(q, ["event_type", "day", "ubkt"], k=10)


_install_kanon_sql()


def _install_ldiv_sql() -> None:
    from ..llm.curation import l_diversity_sql

    QUERIES["l_diversity_events"]["sql"] = l_diversity_sql(
        "SELECT event_type, CAST(ts AS DATE) AS day, user_id % 50 AS ubkt "
        "FROM events",
        ["day", "ubkt"],
        "event_type",
        l=3,
    )


@register("l_diversity_events", sql=None)  # SQL installed below (generated)
def l_diversity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (llm/curation.py::l_diversity_report) — the
    homogeneity-attack companion to ``k_anonymity_events``: per (day,
    user-bucket) quasi-identifier class, how many DISTINCT event types
    (the sensitive attribute) it contains; the l-value histogram with the
    below-l flag. A class can pass k-anonymity yet leak its sensitive
    value when l=1 (every record in the class shares one event type).
    Three map-side-combinable groupBys, each over the previous pass's
    (smaller) output — never a count_distinct expand."""
    from ..llm.curation import l_diversity_report

    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        (F.col("user_id") % 50).alias("ubkt"),
    )
    return l_diversity_report(q, ["day", "ubkt"], "event_type", l=3)


_install_ldiv_sql()


def _install_ks_sql() -> None:
    from ..operators.profile import ks_two_sample_by_sql

    inner = ks_two_sample_by_sql(
        "SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x, "
        "ts >= TIMESTAMP '2024-01-16' AS s FROM events"
    )
    QUERIES["ks_drift_events"]["sql"] = (
        f"SELECT g AS event_type, n_a, n_b, ks_d FROM ({inner}) ks"
    )


@register("ks_drift_events", sql=None)  # SQL installed below (generated)
def ks_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type two-sample Kolmogorov-Smirnov drift between the first
    and second half of the month (operators/profile.py::ks_two_sample_by) —
    the exact, binning-free companion to ``psi_drift_documents``: PSI moves
    with the bin edges; KS is the sup distance between the two exact ECDFs.
    The sup is taken over EXACT integers (cum_a*n_b - cum_b*n_a in
    DECIMAL(38,0)); the single float division happens once per group, so
    both engines agree to the bit before round(6). One (group, value)
    map-side-combinable groupBy + one per-group cumulative window over
    distinct values."""
    from ..operators.profile import ks_two_sample_by

    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        (F.col("ts").cast("timestamp") >= F.lit("2024-01-16").cast("timestamp"))
        .alias("is_b"),
    )
    return ks_two_sample_by(q, "event_type", "v_cents", "is_b")


_install_ks_sql()


def _install_chi2_sql() -> None:
    from ..operators.profile import chi_square_independence_sql

    QUERIES["chi_square_orders"]["sql"] = chi_square_independence_sql(
        "SELECT o_orderstatus AS xv, o_orderpriority AS yv FROM orders"
    )


@register("chi_square_orders", sql=None)  # SQL installed below (generated)
def chi_square_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of order status vs priority
    (operators/profile.py::chi_square_independence) with Cramér's V — the
    significance companion to ``mutual_information_documents``. Zero cells
    are handled by algebra (chi2 = sum_obs (o-e)^2/e + (n - sum_obs e)),
    so no R*C grid ever materializes: one cell groupBy, two marginal
    groupBys over the CELL frame, broadcast joins, one scalar aggregate."""
    from ..operators.profile import chi_square_independence

    o = _t(spark, sf_dir, "orders")
    return chi_square_independence(o, "o_orderstatus", "o_orderpriority")


_install_chi2_sql()


def _install_benford_sql() -> None:
    from ..operators.profile import benford_report_sql

    QUERIES["benford_orders_totalprice"]["sql"] = benford_report_sql(
        "SELECT o_totalprice AS amt FROM orders"
    )


@register("benford_orders_totalprice", sql=None)  # SQL installed below
def benford_orders_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals
    (operators/profile.py::benford_report): observed vs expected
    first-significant-digit distribution with per-digit chi-square terms —
    the fabricated-data / unit-mixing screen for financial columns. The
    digit is extracted EXACTLY (integer cents -> decimal string -> first
    char; no float log10), and the 9-row expectation table is the same
    double literals on both engines. One 9-key groupBy over the scan."""
    from ..operators.profile import benford_report

    o = _t(spark, sf_dir, "orders")
    return benford_report(o, "o_totalprice", cents=True)


_install_benford_sql()


@register(
    "interpolate_events_value",
    sql="""
WITH m AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v,
         epoch_us(ts) AS xo
  FROM events
), w AS (
  SELECT event_id, user_id, v, CAST(xo AS DOUBLE) AS x,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY xo, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN CAST(xo AS DOUBLE) END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY xo, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY xo, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN CAST(xo AS DOUBLE) END
                     IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY xo, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
  FROM m
)
SELECT event_id, user_id,
       round(CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NOT NULL AND nv IS NOT NULL
                       AND (nx - px) <> 0
                    THEN pv + (nv - pv) * ((x - px) / (nx - px))
                  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN pv
             END, 4) AS value_i
FROM w
""",
)
def interpolate_events_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear interpolation of a deterministically-masked gap set
    (operators/windows.py::interpolate_linear): every 7th event's value is
    NULLed, then refilled on the straight line between its nearest non-null
    neighbours weighted by event-time micros — the numeric gap-repair
    companion to ``forward_fill_events`` (W1). Interior gaps only:
    leading/trailing NULLs stay NULL; a duplicate-x bracket holds the
    previous value. Two frames over ONE per-user sort; the interpolation is
    a single canonical IEEE-double expression, mirrored by DuckDB's IGNORE
    NULLS windows."""
    from ..operators.windows import interpolate_linear

    ev = _t(spark, sf_dir, "events")
    m = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("xus"),
    )
    out = interpolate_linear(
        m, "value", "xus", ["user_id"], order_by=["xus", "event_id"],
        out_col="value_i",
    )
    return out.select("event_id", "user_id", F.round("value_i", 4).alias("value_i"))


def _install_triangle_sql() -> None:
    from ..operators.graph import triangle_count_sql

    knn_edges = f"""
WITH e AS (SELECT vec_id AS id, embedding FROM embeddings),
cx AS (
  SELECT a.id AS qid, b.id AS cid,
         round({_COS.replace('qv', 'a.embedding').replace('cv', 'b.embedding')},
               4) AS c
  FROM e a, e b WHERE a.id <> b.id
),
ranked AS (
  SELECT qid, cid, c,
         row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rk
  FROM cx
)
SELECT qid AS a, cid AS b FROM ranked WHERE rk <= 3
"""
    QUERIES["triangle_count_knn_embeddings"]["sql"] = triangle_count_sql(knn_edges)


@register("triangle_count_knn_embeddings", sql=None)  # SQL installed below
def triangle_count_knn_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the exact top-3 cosine kNN graph
    (operators/graph.py::triangle_count): triangles, wedges, and
    transitivity via degree-ordered orientation (Suri & Vassilvitskii
    2011) — each node's out-degree is O(sqrt(m)) after orientation, so the
    wedge join survives hub vectors that would make the naive neighbour
    self-join quadratic. The edge set reuses the exact kNN kernel that
    ``knn_graph_embeddings`` gates (production swaps in the IVF graph at
    identical downstream shape); the census itself shuffles id pairs only."""
    from ..llm.similarity import knn_graph
    from ..operators.graph import triangle_count

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    edges = knn_graph(e, "vec_id", "embedding", k=3, strategy="exact")
    return triangle_count(edges, "query_id", "neighbour_id")


_install_triangle_sql()


@register(
    "streaming_topk_events",
    sql="""
WITH c AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), r AS (
  SELECT window_start, event_type, n_events,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY n_events DESC, event_type) AS rnk
  FROM c
)
SELECT window_start, event_type, n_events, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
""",
)
def streaming_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.13 streaming top-k: hourly tumbling counts per event type computed
    as a TRUE watermarked stream (the heavy, state-bounded aggregation),
    drained AvailableNow in complete mode, then ranked top-3-per-window in
    one batch window pass over the WINDOWED COUNT frame — the foreachBatch
    shape a production leaderboard uses (ranking is not incrementally
    maintainable in append mode; the post-pass input is window-count-sized,
    never event-sized). Ties break on event_type, so the rank is
    deterministic under any micro-batch split."""
    from ..streaming import read_events_stream

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    counts = tumbling_agg(stream, "1 hour", watermark="1 hour")
    drained = _drain_stream(spark, counts, "t_topk", output_mode="complete")
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        drained.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("window_start", "event_type", "n_events", "rnk")
    )


def _install_cusum_sql() -> None:
    from ..operators.profile import cusum_by_sql

    inner = cusum_by_sql(
        "SELECT event_type AS g, epoch_us(ts) AS ord1, event_id AS ord2, "
        "CAST(round(value * 100) AS BIGINT) AS x, event_id AS rid FROM events",
        target=5000,
        slack_k=50,
        threshold_h=20000,
        with_id=True,
    )
    QUERIES["cusum_drift_events"]["sql"] = (
        f"SELECT g AS event_type, n, max_cusum, n_alarms, first_alarm_id "
        f"FROM ({inner}) c"
    )


@register("cusum_drift_events", sql=None)  # SQL installed below (generated)
def cusum_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type one-sided CUSUM changepoint scan
    (operators/profile.py::cusum_by, Page 1954): where PSI/KS/JSD compare
    two fixed windows, CUSUM localizes WHEN a persistent upward shift in
    value began. The max(0, ...) recurrence is evaluated through its
    closed form S_i = P_i - min(0, running_min(P)) — two stacked window
    functions over ONE per-group sort, ALL in exact integer cents (no
    float surface at all), so both engines agree to the bit. Output: per
    group n / peak statistic / alarm count / first alarming event id."""
    from ..operators.profile import cusum_by

    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("xus"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    return cusum_by(
        q,
        "event_type",
        ["xus", "event_id"],
        "v_cents",
        target=5000,
        slack_k=50,
        threshold_h=20000,
        id_col="event_id",
    )


_install_cusum_sql()


def _install_copurchase_sql() -> None:
    from ..operators.frequent import copurchase_pairs_sql

    QUERIES["copurchase_parts_orders"]["sql"] = copurchase_pairs_sql(
        "SELECT l_orderkey AS bk, l_partkey AS it FROM lineitem",
        min_item_support=3,
        min_pair_support=3,
        max_basket_size=1000,
    )


@register("copurchase_parts_orders", sql=None)  # SQL installed below
def copurchase_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part co-occurrence across orders
    (operators/frequent.py::copurchase_pairs): pairs of parts bought in the
    same order with support >= 3, their lift (exact DECIMAL(38,0) integer
    ratio, one terminal float division) and basket-jaccard. The pair join
    is keyed on the ORDER id so the blow-up is bounded by max basket size
    squared, with two scale guards: a-priori item pruning (downward
    closure — output unchanged) and a 1000-item basket ceiling (bot carts
    excluded deterministically)."""
    from ..operators.frequent import copurchase_pairs

    li = _t(spark, sf_dir, "lineitem")
    return copurchase_pairs(
        li,
        "l_orderkey",
        "l_partkey",
        min_item_support=3,
        min_pair_support=3,
        max_basket_size=1000,
    )


_install_copurchase_sql()


@register(
    "streaming_cusum_events",
    sql="""
WITH m AS (
  SELECT event_type AS g, epoch_us(ts) AS ord1, event_id,
         CAST(round(value * 100) AS BIGINT) AS x
  FROM events
), p AS (
  SELECT g, ord1, event_id,
         sum(x - 5050) OVER (PARTITION BY g ORDER BY ord1, event_id
                             ROWS UNBOUNDED PRECEDING) AS p
  FROM m
)
SELECT g AS event_type, event_id,
       CAST(p - least(0, min(p) OVER (PARTITION BY g ORDER BY ord1, event_id
                                      ROWS UNBOUNDED PRECEDING))
            AS BIGINT) AS cusum
FROM p
""",
)
def streaming_cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.13 the CUSUM changepoint monitor as a TRUE stateful stream
    (streaming/stateful.py::streaming_cusum): two int64 per key in the
    state store (running prefix sum + its running min), every arithmetic
    step exact integer — the drained stream must match the batch
    closed-form window oracle BIT-FOR-BIT, which is the strongest parity
    claim the streaming tier makes (ewma's is round-6 float). Same
    order-monotonic delivery contract as streaming_ewma; per-row emission
    in append mode (no watermark needed — state is O(1) per key)."""
    from ..streaming import read_events_stream
    from ..streaming.stateful import streaming_cusum

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    feed = stream.select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("xus"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    out = streaming_cusum(
        feed,
        ["event_type"],
        "v_cents",
        target=5000,
        slack_k=50,
        order_cols=["xus", "event_id"],
    )
    return _drain_stream(spark, out, "t_cusum").select(
        "event_type", "event_id", "cusum"
    )


def _install_welch_sql() -> None:
    from ..operators.profile import welch_ttest_by_sql

    inner = welch_ttest_by_sql(
        "SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x, "
        "user_id % 2 = 1 AS s FROM events"
    )
    QUERIES["ab_test_events"]["sql"] = (
        f"SELECT g AS event_type, n_a, n_b, mean_a, mean_b, t_stat, df_welch "
        f"FROM ({inner}) w"
    )


@register("ab_test_events", sql=None)  # SQL installed below (generated)
def ab_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Welch (unequal-variance) two-sample t-test
    (operators/profile.py::welch_ttest_by) between an odd/even user-id
    cohort split — the A/B-experiment readout: cohort means, t statistic,
    Welch-Satterthwaite df. KS (``ks_drift_events``) detects ANY
    distributional move; Welch answers the experiment question "did the
    MEAN move relative to sampling noise". All moments are exact integers
    (n, sum, sum-of-squares in DECIMAL(38,0) over cents); every float
    derives from them in one canonical double chain mirrored verbatim in
    the oracle. ONE map-side-combinable groupBy over the scan — no
    window, no join, six integers per group on the shuffle."""
    from ..operators.profile import welch_ttest_by

    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        (F.col("user_id") % 2 == 1).alias("is_b"),
    )
    return welch_ttest_by(q, "event_type", "v_cents", "is_b")


_install_welch_sql()


def _install_gini_sql() -> None:
    from ..operators.profile import gini_by_sql

    inner = gini_by_sql(
        "SELECT c.c_mktsegment AS g, r.cents AS x "
        "FROM (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
        "AS BIGINT) AS cents FROM orders GROUP BY o_custkey) r "
        "JOIN customer c ON c.c_custkey = r.o_custkey"
    )
    QUERIES["gini_revenue_customers"]["sql"] = (
        f"SELECT g AS c_mktsegment, n, total, gini FROM ({inner}) gi"
    )


@register("gini_revenue_customers", sql=None)  # SQL installed below
def gini_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment Gini coefficient of customer revenue
    (operators/profile.py::gini_by) — the scalar concentration readout
    that complements ``pareto_revenue_customers``'s full curve. Revenue
    is rolled up per customer FIRST (map-side-combinable groupBy on
    custkey over the orders scan — the Gini window then sorts customers,
    not orders), joined to the customer dim for the segment (dim-sized
    side; AQE broadcast-converts), then one per-segment sort window for
    ranks and exact DECIMAL(38,0) numerator/denominator with a single
    terminal division. Ties need no tiebreaker: permuting equal values
    cannot change sum(rank * x)."""
    from ..operators.profile import gini_by

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (
        o.select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    j = rev.join(c.select("c_custkey", "c_mktsegment"),
                 rev.o_custkey == F.col("c_custkey"))
    return gini_by(j, "c_mktsegment", "cents")


_install_gini_sql()


def _install_fd_sql() -> None:
    from ..operators.validate import fd_audit_sql

    QUERIES["fd_audit_lineitem"]["sql"] = fd_audit_sql(
        "SELECT l_partkey AS d0, l_suppkey AS dep FROM lineitem", n_det=1
    )


@register("fd_audit_lineitem", sql=None)  # SQL installed below (generated)
def fd_audit_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (operators/validate.py::fd_audit): does
    l_partkey determine l_suppkey? (It does not — parts ship from several
    suppliers; the audit quantifies by how much.) One summary row:
    determinant classes, violating classes, rows inside them, and the
    g3-style repair cost (minimum deletions to restore the FD). Shape:
    groupBy(part, supp) over the scan (shuffle carries DISTINCT pairs),
    groupBy(part) over the pair frame, one scalar aggregate — three
    strictly-shrinking shuffles, no count_distinct expand, no join."""
    from ..operators.validate import fd_audit

    li = _t(spark, sf_dir, "lineitem")
    return fd_audit(li, ["l_partkey"], "l_suppkey")


_install_fd_sql()


def _install_oov_sql() -> None:
    from ..llm.textanalysis import oov_rate_sql

    QUERIES["oov_rate_documents"]["sql"] = oov_rate_sql(_W, min_count=5)


@register("oov_rate_documents", sql=None)  # SQL installed below (generated)
def oov_rate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate in exact basis points
    (llm/textanalysis.py::oov_rate, min_count=5) — the tokenizer-coverage
    screen run before a training job pays for OCR noise. The vocabulary
    is implicit (terms with corpus frequency >= 5): explode ->
    (doc, term) groupBy, term totals over the PAIR frame, shuffle join of
    pairs vs terms on the term key (the hot natural-language term joins
    one term row against pre-aggregated at-most-one-row-per-doc — the
    same skew bound PMI relies on), one per-doc groupBy, zero float
    (half-up integer division mirrored as DuckDB BIGINT //)."""
    from ..llm.textanalysis import oov_rate

    d = _t(spark, sf_dir, "documents")
    return oov_rate(d, "doc_id", "text", min_count=5)


_install_oov_sql()


def _install_acf_sql() -> None:
    from ..operators.profile import acf_by_sql

    inner = acf_by_sql(
        "SELECT event_type AS g, CAST(ts AS DATE) AS o, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x "
        "FROM events GROUP BY event_type, CAST(ts AS DATE)",
        lags=(1, 2, 3),
    )
    QUERIES["acf_events"]["sql"] = (
        f"SELECT g AS event_type, n, acf_1, acf_2, acf_3 FROM ({inner}) a"
    )


@register("acf_events", sql=None)  # SQL installed below (generated)
def acf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type lag-1/2/3 autocorrelation of the DAILY value series
    (operators/profile.py::acf_by) — the persistence/periodicity screen
    that complements the drift story (``ols_trend_events`` finds slope;
    ACF finds "does yesterday predict today"). The series is aggregated
    first (map-side-combinable (type, day) groupBy — the ACF window then
    sorts ~31 rows per group, not events), every lag shares ONE
    exchange+sort (identical window spec), and numerator/denominator are
    exact DECIMAL(38,0) with one double division per lag. The n^2-scaled
    integer algebra is sized for AGGREGATED series by contract — the
    docstring pins the 38-digit envelope."""
    from ..operators.profile import acf_by

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    return acf_by(daily, "event_type", "day", "cents", lags=(1, 2, 3))


_install_acf_sql()


def _install_seasonal_sql() -> None:
    from ..operators.profile import seasonal_index_by_sql

    inner = seasonal_index_by_sql(
        "SELECT event_type AS g, CAST(hour(ts) AS BIGINT) AS slot, "
        "CAST(round(value * 100) AS BIGINT) AS x FROM events"
    )
    QUERIES["seasonality_hourly_events"]["sql"] = (
        f"SELECT g AS event_type, slot AS hour_of_day, n_s, slot_total, index_bp "
        f"FROM ({inner}) s"
    )


@register("seasonality_hourly_events", sql=None)  # SQL installed below
def seasonality_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal index per event type in EXACT basis points
    (operators/profile.py::seasonal_index_by): 10000 = the hour runs at
    the type's average value, computed as the exact rational
    (sum_hour * n_total) / (n_hour * sum_total) through half-up integer
    division — Spark DECIMAL(38,0) pmod mirrored as DuckDB HUGEINT //,
    so there is NO float boundary anywhere (the quality_score sf0.1
    lesson, applied from day one). One (type, hour) map-side groupBy
    over the scan, one type-level groupBy over the 24-row-per-type slot
    frame, broadcast join back. Output bounded by |types| * 24."""
    from ..operators.profile import seasonal_index_by

    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = seasonal_index_by(q, "event_type", "hod", "cents")
    return out.select(
        "event_type",
        F.col("slot").alias("hour_of_day"),
        "n_s",
        "slot_total",
        "index_bp",
    )


_install_seasonal_sql()


def _install_paths_sql() -> None:
    from ..operators.windows import session_paths_sql

    QUERIES["session_paths_events"]["sql"] = session_paths_sql(
        gap_minutes=30, max_len=5, top_k=20
    )


@register("session_paths_events", sql=None)  # SQL installed below (generated)
def session_paths_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session journey paths (operators/windows.py::session_paths):
    30-minute-gap sessions (the session_windows_events contract), each
    truncated to its first 5 event types and joined into a path string,
    counted and ranked deterministically (count DESC, path ASC). Two
    per-user linear window passes, a groupBy carrying <= 5 structs per
    session, a map-side-combinable path count, TakeOrderedAndProject for
    the top-K, and bounded_running's broadcast self-join for ranks on the
    20-row frame — no single-partition WindowExec."""
    from ..operators.windows import session_paths

    ev = _t(spark, sf_dir, "events")
    return session_paths(ev, gap_minutes=30, max_len=5, top_k=20)


_install_paths_sql()


def _install_mw_sql() -> None:
    from ..operators.profile import rank_sum_auc_by_sql

    inner = rank_sum_auc_by_sql(
        "SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x, "
        "user_id % 2 = 1 AS s FROM events"
    )
    QUERIES["mannwhitney_auc_events"]["sql"] = (
        f"SELECT g AS event_type, n_a, n_b, u_stat, auc FROM ({inner}) mw"
    )


@register("mannwhitney_auc_events", sql=None)  # SQL installed below
def mannwhitney_auc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Mann-Whitney U / exact ROC-AUC over the same odd/even
    cohort split as ``ab_test_events`` (operators/profile.py::
    rank_sum_auc_by) — the nonparametric third leg of the experiment
    toolkit: Welch tests the MEAN, KS the whole CDF, U/AUC the stochastic
    ordering P(B > A), computed exactly with midrank ties (doubled-rank
    integer algebra in DECIMAL(38,0), one terminal division). Same shape
    as KS: one (group, value) map-side-combinable groupBy, one per-group
    cumulative window over DISTINCT values, totals broadcast."""
    from ..operators.profile import rank_sum_auc_by

    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        (F.col("user_id") % 2 == 1).alias("is_b"),
    )
    return rank_sum_auc_by(q, "event_type", "v_cents", "is_b")


_install_mw_sql()


def _install_rfm_sql() -> None:
    from ..operators.profile import rfm_segments_sql

    QUERIES["rfm_segments_orders"]["sql"] = rfm_segments_sql()


@register("rfm_segments_orders", sql=None)  # SQL installed below (generated)
def rfm_segments_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer RFM segmentation (operators/profile.py::rfm_segments):
    recency/frequency/monetary quintile scores per customer, rolled up to
    the at-most-125-cell segment grid. Built WITHOUT a global ntile: each
    metric's four quintile thresholds come from running_totals' two-phase
    cumulative sum over the DISTINCT-value frame and are broadcast back as
    ONE row — ties share a score, scores are assigned scan-locally, and no
    no-partition WindowExec exists anywhere in the plan (the
    pareto_revenue_customers lesson, reapplied). All integers: days,
    counts, cents."""
    from ..operators.profile import rfm_segments

    o = _t(spark, sf_dir, "orders")
    return rfm_segments(o)


_install_rfm_sql()


@register(
    "dau_mau_events",
    sql="""
WITH d AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM d GROUP BY day),
m AS (
  SELECT DISTINCT date_trunc('month', CAST(ts AS DATE)) AS mon, user_id
  FROM events
),
mau AS (SELECT mon, CAST(count(*) AS BIGINT) AS mau FROM m GROUP BY mon)
SELECT dau.day, dau.dau, mau.mau,
       CAST((CAST(2 AS BIGINT) * 10000 * dau.dau + mau.mau)
            // (CAST(2 AS BIGINT) * mau.mau) AS BIGINT) AS stickiness_bp
FROM dau JOIN mau ON date_trunc('month', dau.day) = mau.mon
""",
)
def dau_mau_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness — the product-engagement pulse: daily active
    users, the month's active users, and their ratio in EXACT basis
    points (half-up integer division; no float surface — dau/mau are
    counts, so the numerator is non-negative and DuckDB's truncating
    ``//`` coincides with Spark's pmod floor). Two
    distinct-then-count ladders — groupBy(day, user) / groupBy(month,
    user) collapse duplicates map-side BEFORE the exchange (never a
    count_distinct expand over the raw stream), then day-level and
    month-level counts over the already-distinct frames, joined on the
    month key (month frame is months x users -> the join side after
    counting is months-sized; broadcast). At 100 TB the distinct frames
    are bounded by |days| x |users| and |months| x |users|."""
    ev = _t(spark, sf_dir, "events")
    d = (
        ev.select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("dau"))
    )
    m = (
        ev.select(
            F.trunc(F.col("ts").cast("date"), "month").alias("mon"), "user_id"
        )
        .distinct()
        .groupBy("mon")
        .agg(F.count(F.lit(1)).cast("long").alias("mau"))
    )
    j = d.join(
        F.broadcast(m), F.trunc(F.col("day"), "month") == F.col("mon")
    )
    num = F.lit(2).cast("long") * 10000 * F.col("dau") + F.col("mau")
    den = F.lit(2).cast("long") * F.col("mau")
    bp = ((num - F.pmod(num, den)).cast("decimal(38,0)") / den.cast("decimal(38,0)")).cast("long")
    return j.select("day", "dau", "mau", bp.alias("stickiness_bp"))


def _install_assort_sql() -> None:
    from ..operators.graph import degree_assortativity_sql

    knn_edges = f"""
WITH ke AS (SELECT vec_id AS id, embedding FROM embeddings),
cx AS (
  SELECT ka.id AS qid, kb.id AS cid,
         round({_COS.replace('qv', 'ka.embedding').replace('cv', 'kb.embedding')},
               4) AS c
  FROM ke ka, ke kb WHERE ka.id <> kb.id
),
ranked AS (
  SELECT qid, cid, c,
         row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rk
  FROM cx
)
SELECT qid AS a, cid AS b FROM ranked WHERE rk <= 3
"""
    QUERIES["assortativity_knn_embeddings"]["sql"] = degree_assortativity_sql(
        knn_edges
    )


@register("assortativity_knn_embeddings", sql=None)  # SQL installed below
def assortativity_knn_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the exact top-3 cosine kNN graph
    (operators/graph.py::degree_assortativity) — does high-degree connect
    to high-degree? The one-number structural screen next to
    ``triangle_count_knn_embeddings``'s clustering census: positive r
    means hub-core chaining (dedup groups will snowball), negative means
    star shapes (groups stay shallow). Symmetric exact-integer moments
    over the canonical edge list (M*S_jk − S_j² over M*S_jj − S_j², all
    DECIMAL(38,0)), two degree equi-joins, one scalar aggregate, one
    terminal division. Edge kernel shared with the triangle census
    (exact kNN as the oracle gate; production swaps the IVF graph)."""
    from ..llm.similarity import knn_graph
    from ..operators.graph import degree_assortativity

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    edges = knn_graph(e, "vec_id", "embedding", k=3, strategy="exact")
    return degree_assortativity(edges, "query_id", "neighbour_id")


_install_assort_sql()


def _install_lift_sql() -> None:
    from ..llm.curation import md5_bucket_sql
    from ..operators.profile import score_lift_deciles_sql

    score = md5_bucket_sql("text", 3)
    seeded = "text || 'x'"  # literal 'x' suffix — NOT the lateral alias x
    label = f"({md5_bucket_sql(seeded, 3)} < {score})"
    QUERIES["score_lift_documents"]["sql"] = score_lift_deciles_sql(
        f"SELECT {score} AS x, {label} AS y FROM documents"
    )


@register("score_lift_documents", sql=None)  # SQL installed below (generated)
def score_lift_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier lift/calibration table over a deterministic synthetic
    score (operators/profile.py::score_lift_deciles): score = 3-hex-digit
    md5 bucket of the text, label = a second independent md5 bucket below
    the score — so P(label) rises with the score and the top decile shows
    real lift, all engine-portable through the shared md5_bucket fold.
    AUC (``mannwhitney_auc_events``) grades the ranking; this table says
    WHERE to threshold a quality-filtered corpus cut. Deciles via the
    RFM ECDF-threshold machinery (no global ntile); all rates/lifts are
    exact basis points (DECIMAL(38,0) pmod ≡ DuckDB HUGEINT //)."""
    from ..llm.curation import md5_bucket
    from ..operators.profile import score_lift_deciles

    d = _t(spark, sf_dir, "documents")
    score = md5_bucket("text", 3)
    label = md5_bucket(F.concat(F.col("text"), F.lit("x")), 3) < score
    q = d.select(score.alias("score"), label.alias("label"))
    return score_lift_deciles(q, "score", "label")


_install_lift_sql()


def _install_streaming_hll_sql() -> None:
    from ..operators.sketches import hll_by_sql

    inner = hll_by_sql("user_id", "event_type", "events")
    QUERIES["streaming_hll_users_events"]["sql"] = (
        f"SELECT g AS event_type, hll_estimate, n_registers_used "
        f"FROM ({inner}) h"
    )


@register("streaming_hll_users_events", sql=None)  # SQL installed below
def streaming_hll_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.13 approximate distinct users per event type as a TRUE stateful
    stream (streaming/stateful.py::streaming_hll_distinct): the portable
    md5 HLL registers are maintained per key in the state store (256 small
    ints — state does NOT grow with the stream), the drained final
    registers are bit-identical to the batch sketch under any micro-batch
    split (register max is commutative), and the ESTIMATE is computed by
    the shared batch estimator over the drained frame — the engine's own
    float path, so the oracle is simply the batch ``hll_by_sql``. The
    "latest wins" drain selector is max_by on the strictly-increasing
    per-key fold counter."""
    from ..operators.sketches import _hll_estimate_by
    from ..streaming import read_events_stream
    from ..streaming.stateful import streaming_hll_distinct

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    feed = stream.select("event_type", "user_id")
    out = streaming_hll_distinct(feed, ["event_type"], "user_id")
    drained = _drain_stream(spark, out, "t_shll")
    final = drained.groupBy("event_type").agg(
        F.max_by("regs", "rows_folded").alias("regs")
    )
    regs = (
        final.select(
            "event_type", F.posexplode("regs").alias("register", "max_rho")
        )
        .where(F.col("max_rho") > 0)
        .select(F.col("event_type").alias("g"), "register", "max_rho")
    )
    est = _hll_estimate_by(regs, ["g"])
    return est.select(
        F.col("g").alias("event_type"), "hll_estimate", "n_registers_used"
    )


_install_streaming_hll_sql()


def _install_hll_rollup_sql() -> None:
    from ..operators.sketches import hll_by_sql

    inner = hll_by_sql("user_id", "event_type", "events")
    QUERIES["hll_rollup_events"]["sql"] = f"""
WITH direct AS ({inner}),
days AS (
  SELECT event_type AS g,
         CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
  FROM events GROUP BY event_type
)
SELECT d.g AS event_type, days.n_days, d.hll_estimate, d.n_registers_used
FROM direct d JOIN days ON d.g = days.g
"""


@register("hll_rollup_events", sql=None)  # SQL installed below (generated)
def hll_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly distinct users per event type computed by MERGING the
    per-day HLL sketches — the sketch-reuse pattern a 100 TB rollup lives
    on: compute each day's 256-register sketch ONCE at ingest, then answer
    any window by a register-wise max over the days — never rescanning the
    raw corpus. The oracle is the DIRECT single-pass sketch
    (``hll_by_sql``), so the green check IS the losslessness proof:
    max-of-daily-maxes equals the full-scan max, register for register,
    hence bit-equal estimates. Plan: one (type, day, register) groupBy
    (map-side combinable, ≤ types*days*256 rows on the exchange), one
    (type, register) merge groupBy over the SKETCH frame, the shared
    estimator's scalar math, and a broadcast day-count join."""
    from ..operators.sketches import _hll_estimate_by, _hll_registers_by

    ev = _t(spark, sf_dir, "events")
    rows = ev.select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    )
    daily = _hll_registers_by(rows, ["event_type", "day"], "user_id")
    merged = daily.groupBy("event_type", "register").agg(
        F.max("max_rho").alias("max_rho")
    )
    est = _hll_estimate_by(
        merged.select(F.col("event_type").alias("g"), "register", "max_rho"),
        ["g"],
    )
    days = (
        rows.select("event_type", "day")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    )
    return est.join(
        F.broadcast(days), est.g == days.event_type
    ).select(
        "event_type", "n_days", "hll_estimate", "n_registers_used"
    )


_install_hll_rollup_sql()


def _install_golden_sql() -> None:
    from ..operators.linkage import golden_record_sql

    seeded = """
SELECT c_custkey AS cl, c_name, c_mktsegment,
       CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS acct_cents
FROM customer
UNION ALL
SELECT c_custkey, c_name, c_mktsegment,
       CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR)
FROM customer
UNION ALL
SELECT c_custkey,
       CASE WHEN c_custkey % 3 = 0 THEN upper(c_name) ELSE c_name END,
       CASE WHEN c_custkey % 4 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END,
       CASE WHEN c_custkey % 5 = 0 THEN NULL
            ELSE CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) END
FROM customer
"""
    QUERIES["golden_record_customers"]["sql"] = golden_record_sql(
        seeded, "cl", ["c_name", "c_mktsegment", "acct_cents"]
    )


@register("golden_record_customers", sql=None)  # SQL installed below
def golden_record_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship after linkage (operators/linkage.py::golden_record):
    three copies of every customer — two clean, one corrupted
    (uppercased name / 'UNKNOWN' segment / NULLed balance on residue
    classes) — clustered by custkey; majority vote recovers the clean
    values deterministically (ties broken by smallest value, and NULLs
    don't vote). The MDM consolidation step the reference's linkage
    pipelines stop short of. Plan: scan-local melt, one (cluster, attr,
    value) count groupBy, one min(struct(-cnt, val)) groupBy — modal
    choice WITHOUT a window — and a known-attr-list conditional-agg
    pivot."""
    from ..operators.linkage import golden_record

    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long").cast("string")
    clean = c.select(
        F.col("c_custkey").alias("cl"),
        "c_name",
        "c_mktsegment",
        cents.alias("acct_cents"),
    )
    corrupted = c.select(
        F.col("c_custkey").alias("cl"),
        F.when(F.col("c_custkey") % 3 == 0, F.upper("c_name"))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(cents)
        .alias("acct_cents"),
    )
    seeded = clean.unionByName(clean).unionByName(corrupted)
    return golden_record(seeded, "cl", ["c_name", "c_mktsegment", "acct_cents"])


_install_golden_sql()


def _install_attribution_sql() -> None:
    from ..operators.windows import attribution_report_sql

    QUERIES["attribution_events"]["sql"] = attribution_report_sql("purchase")


@register("attribution_events", sql=None)  # SQL installed below (generated)
def attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution over the event
    stream (operators/windows.py::attribution_report): every purchase
    credits its user's most recent (last-touch) and earliest
    (first-touch) prior non-purchase channel, 'direct' when none exists.
    The funnel says how many converted; this says which channel earns the
    credit. Both carried channels share ONE per-user exchange+sort
    (identical unbounded..1-preceding frames fold into a single Window
    node), then two map-side-combinable groupBys over the
    conversions-only frame."""
    from ..operators.windows import attribution_report

    ev = _t(spark, sf_dir, "events")
    return attribution_report(ev, "purchase")


_install_attribution_sql()


def _install_streaming_attr_sql() -> None:
    from ..operators.windows import attribution_report_sql

    QUERIES["streaming_attribution_events"]["sql"] = attribution_report_sql(
        "purchase"
    )


@register("streaming_attribution_events", sql=None)  # SQL installed below
def streaming_attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.13 first/last-touch attribution as a TRUE stateful stream
    (streaming/stateful.py::streaming_attribution): per user the state
    store holds exactly TWO strings (earliest touch, latest touch), every
    purchase is credited AT ARRIVAL — the real-time feed whose drained
    rollup must equal the batch window report exactly, so the oracle IS
    the batch ``attribution_report_sql``. Same order-monotonic delivery
    contract as streaming_ewma/cusum; the rollup after the drain is the
    same explode-credits single groupBy as the batch operator."""
    from ..streaming import read_events_stream
    from ..streaming.stateful import streaming_attribution

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    feed = stream.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("xus"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = streaming_attribution(
        feed,
        "purchase",
        "user_id",
        "event_type",
        "cents",
        order_cols=["xus", "event_id"],
    )
    drained = _drain_stream(spark, out, "t_attr")
    credits = drained.select(
        "cents",
        F.explode(
            F.array(
                F.struct(
                    F.lit("last_touch").alias("attribution"),
                    F.col("channel_last").alias("channel"),
                ),
                F.struct(
                    F.lit("first_touch").alias("attribution"),
                    F.col("channel_first").alias("channel"),
                ),
            )
        ).alias("c"),
    )
    return credits.groupBy(
        F.col("c.attribution").alias("attribution"),
        F.col("c.channel").alias("channel"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("conversions"),
        F.sum("cents").cast("long").alias("value_cents"),
    )


_install_streaming_attr_sql()


def _install_wape_sql() -> None:
    from ..operators.profile import wape_backtest_by_sql

    inner = wape_backtest_by_sql(
        "SELECT event_type AS g, CAST(ts AS DATE) AS o, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x "
        "FROM events GROUP BY event_type, CAST(ts AS DATE)"
    )
    QUERIES["wape_backtest_events"]["sql"] = (
        f"SELECT g AS event_type, n_periods, wape_bp FROM ({inner}) w"
    )


@register("wape_backtest_events", sql=None)  # SQL installed below (generated)
def wape_backtest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest over the daily value series
    (operators/profile.py::wape_backtest_by): predict each day with the
    previous observed day, score per event type with WAPE in EXACT basis
    points — the baseline every forecasting effort must beat, and a
    drift/volatility scalar in its own right. WAPE (ratio of two exact
    integer sums, one half-up division) rather than MAPE (a float per
    point, explodes on near-zero actuals). Aggregate first: the lag
    window sorts ~31 rows per type, not events."""
    from ..operators.profile import wape_backtest_by

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    return wape_backtest_by(daily, "event_type", "day", "cents")


_install_wape_sql()


def _install_crosscorr_sql() -> None:
    from ..operators.profile import pairwise_corr_by_sql

    inner = pairwise_corr_by_sql(
        "SELECT event_type AS g, CAST(ts AS DATE) AS o, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x "
        "FROM events GROUP BY event_type, CAST(ts AS DATE)"
    )
    QUERIES["cross_corr_event_types"]["sql"] = inner


@register("cross_corr_event_types", sql=None)  # SQL installed below
def cross_corr_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson cross-correlation between every pair of event types' daily
    value series (operators/profile.py::pairwise_corr_by) — the
    co-movement screen completing the time-series toolkit (OLS trend =
    drift, ACF = self-persistence, this = cross-coupling, e.g. do errors
    spike with purchases). Series aligned on the shared day; exact
    DECIMAL(38,0) moments, one canonical double chain per pair. The
    self-join runs on the AGGREGATED |days|x|types| frame — tiny next to
    the corpus, uniform join key."""
    from ..operators.profile import pairwise_corr_by

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    return pairwise_corr_by(daily, "event_type", "day", "cents")


_install_crosscorr_sql()


def _install_c4_clean_sql() -> None:
    from ..llm.curation import c4_clean_sql

    corpus = f"""
WITH c4_base AS (SELECT doc_id, {_W} AS w FROM documents),
c4_lined AS (
  SELECT doc_id,
         CASE WHEN len(w) > 0 THEN
           list_transform(
             generate_series(1, CAST(floor((len(w) + 7) / 8.0) AS BIGINT)),
             i -> array_to_string(list_slice(w, (i-1)*8 + 1, (i-1)*8 + 8), ' ')
                  || (CASE WHEN (doc_id + (i-1)) % 7 = 0
                           THEN ' javascript' ELSE '' END)
                  || (CASE WHEN (doc_id + (i-1)) % 3 = 0
                           THEN '' ELSE '.' END))
         ELSE [] END AS lines
  FROM c4_base
)
SELECT doc_id,
       array_to_string(lines, chr(10))
       || (CASE WHEN doc_id % 31 = 0
                THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END)
       || (CASE WHEN doc_id % 37 = 0
                THEN chr(10) || 'var x = {{ a: 1 }}.' ELSE '' END) AS text
FROM c4_lined
"""
    QUERIES["c4_clean_documents"]["sql"] = f"""
SELECT id AS doc_id, n_lines, n_kept, keep_doc,
       md5(cleaned_text) AS cleaned_md5
FROM ({c4_clean_sql(corpus)}) c4_out
"""


@register("c4_clean_documents", sql=None)  # SQL installed below (generated)
def c4_clean_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line + page cleaning (llm/curation.py::c4_clean — Raffel et al.
    2020 §2.2), the standard first pass of a web-scale curation pipeline:
    keep lines ending in terminal punctuation with >= 5 words and no
    "javascript"; drop pages containing ``{``, "lorem ipsum", or fewer
    than 3 surviving lines. The corpus gets deterministic web-page
    structure so every rule has positives: each doc's words fold into
    8-word lines, line (doc_id+i) % 3 == 0 loses its terminal punct,
    (doc_id+i) % 7 == 0 gains a "javascript" token, doc_id % 31 gains a
    lorem-ipsum footer and doc_id % 37 a curly-brace code footer. The gate
    hashes the REBUILT cleaned text, so keep decisions and reassembly
    order are both proved identical. Zero shuffle: the whole operator runs
    inside the scan stage, and at 100 TB the keep_doc predicate prunes
    pages before any downstream dedup pays for them."""
    from ..llm.curation import c4_clean
    from ..llm.textanalysis import words

    d = _t(spark, sf_dir, "documents")
    w = words(F.col("text"))
    n = F.size(w)
    n_lines = F.floor((n + F.lit(7)) / F.lit(8.0)).cast("int")

    def mk_line(i: Column) -> Column:
        return F.concat(
            F.array_join(F.slice(w, i * 8 + 1, 8), " "),
            F.when((F.col("doc_id") + i) % 7 == 0, F.lit(" javascript"))
            .otherwise(F.lit("")),
            F.when((F.col("doc_id") + i) % 3 == 0, F.lit(""))
            .otherwise(F.lit(".")),
        )

    lines = F.when(
        n > 0, F.transform(F.sequence(F.lit(0), n_lines - 1), mk_line)
    ).otherwise(F.array().cast("array<string>"))
    corpus = d.select(
        "doc_id",
        F.concat(
            F.array_join(lines, "\n"),
            F.when(F.col("doc_id") % 31 == 0, F.lit("\nlorem ipsum dolor sit amet."))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 37 == 0, F.lit("\nvar x = { a: 1 }."))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    out = c4_clean(corpus, "text", "doc_id")
    return out.select(
        F.col("id").alias("doc_id"),
        "n_lines",
        "n_kept",
        "keep_doc",
        F.md5("cleaned_text").alias("cleaned_md5"),
    )


_install_c4_clean_sql()


@register(
    "ccnet_perplexity_buckets_documents",
    sql=f"""
WITH toks AS (SELECT doc_id, unnest({_W}) AS w FROM documents),
counts AS (SELECT w, count(*) AS cw FROM toks GROUP BY w),
tot AS (SELECT CAST(sum(cw) AS BIGINT) AS total_toks,
               CAST(count(*) AS BIGINT) AS vocab FROM counts),
scored AS (
  SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_tokens,
         round(avg(-ln((cw + 1) / CAST(total_toks + vocab AS DOUBLE))), 4) AS nll
  FROM toks JOIN counts USING (w) CROSS JOIN tot
  GROUP BY doc_id
),
cum AS (
  SELECT id, n_tokens, nll,
         CAST(sum(n_tokens) OVER (ORDER BY nll, id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens,
         CAST(sum(n_tokens) OVER () AS BIGINT) AS tot_tokens
  FROM scored
)
SELECT id, n_tokens, nll, cum_tokens,
       CASE WHEN 3 * (cum_tokens - n_tokens) < tot_tokens THEN 'head'
            WHEN 3 * (cum_tokens - n_tokens) < 2 * tot_tokens THEN 'middle'
            ELSE 'tail' END AS bucket
FROM cum
""",
)
def ccnet_perplexity_buckets_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail split (llm/textanalysis.py::perplexity_buckets
    over unigram_lm_scores — Wenzek et al. 2020 §4.3): rank every document
    by its LM nll and cut the corpus into three buckets of equal TOKEN
    mass; training keeps the head (and usually middle). This is the
    DECISION rung of the CCNet quality ladder whose scoring rungs are
    unigram_lm_nll_documents and bigram_lm_nll_documents. All-integer cut
    rule — a doc belongs to the bucket its token range STARTS in
    (3*(cum - n_tokens) vs corpus total, the exclusive-start shard
    convention, so the best doc is head even when it spans a boundary) —
    over the inclusive running token sum in (nll, id) order; nll is the
    4dp contract-rounded score both engines already reproduce, so the
    order and every bucket edge are exact. Scale
    shape: the scoring plan's explode + broadcast model join, then
    running_totals (auto-routed two-phase range-exchange above the
    threshold — no single-partition global window) and one broadcast
    total row."""
    from ..llm.textanalysis import perplexity_buckets, unigram_lm_scores

    d = _t(spark, sf_dir, "documents")
    return perplexity_buckets(unigram_lm_scores(d, "text", "doc_id"))


def _install_unicode_clean_sql() -> None:
    from ..llm.curation import unicode_clean_sql

    dirty = (
        "text || CASE CAST(doc_id % 4 AS INTEGER)"
        " WHEN 0 THEN ' caf' || 'e' || chr(769) || ' resume' || chr(769)"
        " WHEN 1 THEN chr(160) || 'pinned' || chr(160) || ' value'"
        " WHEN 2 THEN ' bell' || chr(7) || 'char' || chr(8203) || 'zero' || chr(65279)"
        " ELSE '  spaced' || chr(9) || chr(9) || 'out  ' END"
    )
    QUERIES["unicode_normalize_documents"]["sql"] = f"""
WITH u_in AS (SELECT doc_id, {dirty} AS text FROM documents)
SELECT doc_id,
       {unicode_clean_sql('text')} AS cleaned_text,
       CAST(len(text) AS BIGINT) AS n_before,
       CAST(len({unicode_clean_sql('text')}) AS BIGINT) AS n_after,
       {unicode_clean_sql('text')} <> text AS changed,
       md5({unicode_clean_sql('text')}) AS cleaned_md5
FROM u_in
"""


@register("unicode_normalize_documents", sql=None)  # SQL installed below
def unicode_normalize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization (llm/curation.py::unicode_clean): NFC
    composition via an Arrow-batched pandas UDF — the one step Spark has no
    built-in for — then JVM-side regexp strips of the explicit control/
    zero-width class, NBSP -> space, whitespace-run collapse, trim. The
    corpus gains a deterministic dirty suffix per doc_id % 4: a decomposed
    e+COMBINING ACUTE pair (NFC must compose to U+00E9), NBSP padding, a
    BEL + ZERO WIDTH SPACE + BOM cluster, and double-tab/space runs — so
    every rule fires and the oracle's native ``nfc_normalize()`` checks the
    Python ``unicodedata`` composition character-for-character (lengths in
    code points AND md5 over the UTF-8 bytes). Scan-local, zero shuffle;
    the Python hop carries one column through Arrow once."""
    from ..llm.curation import unicode_clean

    d = _t(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(" cafe\u0301 resume\u0301"))
        .when(F.col("doc_id") % 4 == 1, F.lit("\u00a0pinned\u00a0 value"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" bell\x07char\u200bzero\ufeff"))
        .otherwise(F.lit("  spaced\t\tout  ")),
    )
    cleaned = unicode_clean(dirty)
    return d.select(
        "doc_id",
        cleaned.alias("cleaned_text"),
        F.length(dirty).cast("long").alias("n_before"),
        F.length(cleaned).cast("long").alias("n_after"),
        (cleaned != dirty).alias("changed"),
        F.md5(cleaned).alias("cleaned_md5"),
    )


_install_unicode_clean_sql()
