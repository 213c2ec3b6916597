"""BM25 full-text retrieval over a document column: score a (small) query
set against the whole corpus and return top-k documents per query.

The reference engine's search surface is Elasticsearch (sinks/es.py maps the
schema into ES and `dump_to_es` feeds it); this module is the engine-native
rung — the same Okapi BM25 ranking function ES uses as its default
similarity, computed as one Spark plan so a corpus-scale scoring/eval pass
doesn't round-trip through a search cluster. Typical uses in a training-data
pipeline: relevance-mining seed corpora, dedup-by-retrieval spot checks, and
offline eval of retrieval prompts.

Scale shape: postings (doc, term, tf) are one explode + map-side-combinable
aggregate; document length and the 1-row (N, avgdl) aggregate are cheap
scans; per-term df is vocab-sized. The query side is tiny by construction
and explicitly broadcast, so scoring is a broadcast hash join over the
postings scan followed by one map-side-combinable sum per (query, doc) —
no shuffle ever carries more than the matched postings. Top-k per query is
a per-query window over the scored docs (queries are few; per-query cardinality
is corpus-sized, so rank on a rounded score with an id tie-break to keep the
cut deterministic across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..session import local_df

from .textanalysis import words

K1 = 1.2
B = 0.75


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[str, str]],
    text_col: str,
    id_col: str,
    topk: int = 5,
) -> DataFrame:
    """Top-``topk`` documents per query by BM25.

    ``queries`` is [(query_id, query_text)]. Returns
    (query_id, rank, id, score) with score = round(BM25, 4) and rank
    assigned by (round(score, 6) desc, id asc) — the rounding makes the
    ordering decision identical across engines whose float sums differ in
    the last ulp.

    idf uses the standard Lucene/ES form ln(1 + (N - df + .5)/(df + .5)),
    which is positive even for terms present in most documents.
    """
    qdf = local_df(spark, queries, "query_id string, qtext string")
    return bm25_topk_df(docs, qdf, text_col, id_col, topk=topk)


def bm25_sql(
    queries: list[tuple[str, str]],
    topk: int = 5,
    docs_sql: str = "SELECT doc_id AS id, text FROM documents",
    queries_sql: str | None = None,
) -> str:
    """DuckDB mirror of ``bm25_topk`` over the same corpus, generated from
    the same constants so the two can only drift together. The query set is
    either literal ``queries`` VALUES or a ``queries_sql`` subquery
    (query-by-example, as ``hybrid_rrf`` uses)."""
    if queries_sql is None:
        if not queries:
            raise ValueError("bm25_sql needs queries or queries_sql")
        qvals = ", ".join(
            "('{}', '{}')".format(
                str(qid).replace("'", "''"), str(qt).replace("'", "''")
            )
            for qid, qt in queries
        )
        queries_sql = f"SELECT * FROM (VALUES {qvals}) AS q(query_id, qtext)"
    k1 = f"CAST({K1!r} AS DOUBLE)"
    b = f"CAST({B!r} AS DOUBLE)"
    return f"""
WITH docs AS ({docs_sql}),
toks AS (
  SELECT id,
         len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS dl,
         unnest(list_filter(string_split_regex(trim(text), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS w
  FROM docs
),
postings AS (SELECT id, dl, w, count(*) AS tf FROM toks GROUP BY id, dl, w),
stats AS (SELECT count(*) AS n_docs,
                 avg(len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\f\\r]+'),
                                     x -> x <> ''))) AS avgdl
          FROM docs),
dfreq AS (SELECT w, count(*) AS df FROM postings GROUP BY w),
q AS ({queries_sql}),
qterms AS (
  SELECT DISTINCT query_id,
         unnest(list_filter(string_split_regex(trim(qtext), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS w
  FROM q
),
scored AS (
  SELECT qt.query_id, p.id,
         sum(ln(CAST(1 AS DOUBLE) + (s.n_docs - d.df + CAST(0.5 AS DOUBLE))
                                     / (d.df + CAST(0.5 AS DOUBLE)))
             * (p.tf * ({k1} + 1))
               / (p.tf + {k1} * (1 - {b} + {b} * p.dl / s.avgdl))) AS s
  FROM postings p
  JOIN qterms qt USING (w) JOIN dfreq d USING (w) CROSS JOIN stats s
  GROUP BY qt.query_id, p.id
),
ranked AS (
  SELECT query_id, id, s,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(s, 6) DESC, id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, id, round(s, 4) AS score
FROM ranked WHERE rank <= {topk}
"""


def bm25_topk_df(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    topk: int = 5,
) -> DataFrame:
    """``bm25_topk`` with the query set as a DataFrame (query_id, qtext) —
    the form query-by-example callers use (queries ARE corpus rows; nothing
    is collected to the driver)."""
    from ..operators.caching import scoped_persist

    ws = words(text_col)
    # two-step projection: materialize the word array BELOW the Generate so
    # dl reads the array length instead of re-running the regex split per
    # exploded token (measured 5x on the postings aggregate); persist base
    # and postings because each feeds two+ consumers (stats reads base,
    # dfreq AND the scoring join read postings) — without the persist the
    # corpus split+explode+aggregate pipeline runs ~3x per query set
    base = scoped_persist(docs.select(F.col(id_col).alias("id"), ws.alias("__ws")))
    toks = base.select(
        "id", F.size("__ws").alias("dl"), F.explode("__ws").alias("w")
    )
    postings = scoped_persist(
        toks.groupBy("id", "dl", "w").agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = base.select(F.size("__ws").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = postings.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        "query_id", F.explode(words("qtext")).alias("w")
    ).distinct()
    joined = (
        postings.join(F.broadcast(qterms), "w")
        .join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
    )
    scored = joined.groupBy("query_id", "id").agg(F.sum(idf * tf_part).alias("__s"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("__s"), 6).desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "id",
            F.round("__s", 4).alias("score"),
        )
    )


RRF_K = 60


def hybrid_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_ids: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    channel_k: int = 50,
    topk: int = 5,
) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: a lexical (BM25) and a
    vector (exact cosine) channel each rank the corpus for query-by-example
    doc ids; the fused score is sum over channels of 1/(RRF_K + rank)
    (Cormack et al. 2009), missing channels contributing nothing.

    RRF is the standard production fusion because it needs NO score
    calibration between channels — only ranks, which are integers, which is
    also why the fused surface is engine-exact: both channel rankings are
    already deterministic (rounded score + id tie-break), and 1/(60+rank)
    sums are identical doubles everywhere.

    Scale shape: each channel broadcasts the tiny query side and caps
    itself at channel_k per query before fusion, so the fusion join is
    (queries x channel_k) rows — driver-free, shuffle-light. The per-query
    ranking windows are the channels' own top-k machinery (at extreme
    corpus sizes swap row_number for a TakeOrderedAndProject per query,
    as ivf/cosine_topk do)."""
    from .similarity import cosine_topk

    q_txt = docs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(text_col).alias("qtext")
    )
    t_rank = bm25_topk_df(docs, q_txt, text_col, id_col, topk=channel_k).select(
        "query_id", "id", F.col("rank").alias("rank_t")
    )
    q_vec = embeddings.filter(F.col(vec_id_col).isin(query_ids))
    v_rank = cosine_topk(
        q_vec,
        embeddings,
        vec_id_col,
        vec_id_col,
        query_vec=vec_col,
        corpus_vec=vec_col,
        k=channel_k,
        exclude_self=False,
    ).select(
        "query_id", F.col("neighbour_id").alias("id"), F.col("rank").alias("rank_v")
    )
    fused = t_rank.join(v_rank, ["query_id", "id"], "full_outer")
    rrf = F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rank_t")), F.lit(0.0)) + F.coalesce(
        1.0 / (F.lit(RRF_K) + F.col("rank_v")), F.lit(0.0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(rrf, 9).desc(), F.col("id").asc()
    )
    return (
        fused.withColumn("rrf_score", F.round(rrf, 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "id", "rrf_score")
    )


def tfidf_topk_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    topk: int = 3,
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF — the keyword-extraction
    companion to BM25 retrieval (same postings algebra, document-major
    output): score(d, w) = tf(d, w) * (ln((N+1)/(df(w)+1)) + 1), the
    sklearn-style smooth idf that never zeroes or divides by zero.

    Execution shape (100 TB): one explode -> groupBy(id, w) postings build
    (map-side combinable — a doc's exploded tokens stay contiguous in their
    input partition), document frequency as a second groupBy over the
    postings (never over raw tokens), N as a broadcast 1-row aggregate, and
    the per-doc cut as a literal ``row_number() <= k`` window that Spark's
    WindowGroupLimit rewrites into a map-side group limit below the
    exchange — no doc's postings ever funnel through one task un-pruned.
    Deterministic across engines: rank orders on (rounded score DESC, term
    ASC) and (id, term) is unique, so row_number is total."""
    from ..operators.caching import scoped_persist

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(words(text_col)).alias("w")
    )
    # pinned: the postings frame feeds BOTH the document-frequency rollup
    # and the score join — unpersisted, the explode+groupBy would run twice
    tf = scoped_persist(
        toks.groupBy("id", "w").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = F.broadcast(df.agg(F.count(F.lit(1)).alias("__n")))
    scored = (
        tf.join(dfreq, "w")
        .join(n_docs)
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0))
                    + 1.0
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("w"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select(
            F.col("id"),
            F.col("w").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("score"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def tfidf_topk_terms_sql(
    topk: int = 3,
    docs_sql: str = "SELECT doc_id AS id, text FROM documents",
) -> str:
    """DuckDB mirror of ``tfidf_topk_terms`` over the same corpus, generated
    from the same formula so the two can only drift together."""
    w_expr = r"list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '')"
    return f"""
WITH docs AS ({docs_sql}),
toks AS (SELECT id, unnest({w_expr}) AS w FROM docs),
tf AS (SELECT id, w, count(*) AS tf FROM toks GROUP BY id, w),
dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
nd AS (SELECT count(*) AS n FROM docs),
s AS (
  SELECT id, w,
         round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 4) AS score, tf
  FROM tf JOIN dfreq USING (w) CROSS JOIN nd
)
SELECT id AS doc_id, w AS term, CAST(tf AS BIGINT) AS tf, score,
       CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY score DESC, w ASC) AS rk
      FROM s)
WHERE rk <= {topk}
"""
