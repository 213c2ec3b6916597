"""Table profiling: per-column quality stats in ONE scan.

The reference refines inferred schemas progressively and validates fields ad
hoc (SURVEY §1.3, §2.10 X4/X5 — unused_fields, whitelists, percent sanity);
this operator is the systematic form: for every column, row/null/distinct
counts and min/max, the report that drives schema refinement, whitelist
construction, and drift detection between pipeline runs.

Scale notes: one aggregation pass over the scan — no joins, no per-column
jobs. With ``exact=True`` the multiple COUNT(DISTINCT) rewrite goes through
Spark's EXPAND (rows duplicated once per distinct-agg — exact but data-volume
multiplying); at 100 TB call with ``exact=False`` to use
``approx_count_distinct`` (HyperLogLog, one pass, no expand) — the report is
diagnostic, ±2% cardinality is fine. Measured at sf0.1 (150k orders rows, 5
columns): exact 3.4s vs approx 0.8s steady-state — the EXPAND multiple is
real, and it grows with data volume. min/max are computed in the column's own
type and cast to string only for presentation, so numeric/date ordering is
preserved (a lexicographic min of stringified numbers would be wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, n_null, n_distinct, min_str, max_str).

    ``n_distinct`` counts non-null distinct values (exact or HLL-approx per
    ``exact``); min/max are typed aggregates presented as strings.
    """
    cols = columns or df.columns
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.struct(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(col.isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
                distinct(col).cast("long").alias("n_distinct"),
                F.min(col).cast("string").alias("min_str"),
                F.max(col).cast("string").alias("max_str"),
            ).alias(f"__p_{c}")
        )
    one = df.agg(*aggs)
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(f"'{c}', `__p_{c}`" for c in cols)
        + ") as (column, p)"
    )
    return one.selectExpr(stack).select("column", "p.*")


def profile_hll(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """The 100 TB profile: per-column row/null counts and typed min/max in
    ONE aggregation pass (no EXPAND), with cardinality from the repo's
    ENGINE-PORTABLE HyperLogLog (operators/sketches.py) instead of exact
    COUNT(DISTINCT) — so the report stays oracle-checkable (unlike Spark's
    internal approx_count_distinct) while the shuffle carries at most
    ``columns × 256`` register rows after map-side max-combining, instead of
    every distinct value of every column.

    Output: (column, n_rows, n_null, n_distinct_est, min_str, max_str);
    ``n_distinct_est`` is the 4dp HLL estimate over non-null values,
    reproducible in any engine from the generated mirror SQL
    (sketches.hll_by_sql). The base stats reuse ``profile``'s single-pass
    struct aggregation; the unpivot feeding the sketch multiplies rows only
    map-side — its exchange is register-sized.
    """
    from .sketches import hll_distinct_by

    cols = columns or df.columns
    # base stats without the distinct agg: one pass, typed min/max
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.struct(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(col.isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
                F.min(col).cast("string").alias("min_str"),
                F.max(col).cast("string").alias("max_str"),
            ).alias(f"__p_{c}")
        )
    one = df.agg(*aggs)
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(f"'{c}', `__p_{c}`" for c in cols)
        + ") as (column, p)"
    )
    stats = one.selectExpr(stack).select("column", "p.*")

    # (column, value) unpivot of non-null values -> grouped portable HLL
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.v").filter(F.col("v").isNotNull())
    est = hll_distinct_by(pairs, ["column"], "v").select(
        "column", F.col("hll_estimate").alias("n_distinct_est")
    )
    return stats.join(F.broadcast(est), "column", "left").select(
        "column", "n_rows", "n_null", "n_distinct_est", "min_str", "max_str"
    )


__all__ = ["profile", "profile_hll"]



def psi_drift(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    min_count: int = 0,
) -> DataFrame:
    """Population Stability Index between two snapshots of a categorical
    distribution — the standard drift monitor for a corpus/feature mix
    (did the lang x source composition of this week's crawl shift against
    the reference snapshot?):

        PSI = sum over buckets of (p_a - p_b) * ln(p_a / p_b)

    with add-one smoothing over the UNION of observed buckets (so a
    bucket present in only one side contributes a finite, positive term
    instead of an infinity). Rule of thumb: < 0.1 stable, 0.1-0.25
    drifting, > 0.25 shifted.

    Returns one row per bucket (key..., count_a, count_b, psi_term[6dp])
    plus the rolled-up total under ``__total__`` keys — per-bucket terms
    are the actionable part (WHICH slice drifted), the total is the alarm
    threshold. All counts are exact integers; p_a/p_b are exact rationals
    of two 1-row totals; only the final ln is float, rounded for the
    contract surface.

    Shape at scale: two map-side-combinable count aggregates (bucket-
    cardinality sized), an outer join on the bucket key, two broadcast
    1-row totals — one scan per snapshot, no sorts. ``min_count`` drops
    buckets below a support floor on BOTH sides (noise control for
    long-tail keys).
    """
    from ..operators.caching import scoped_persist

    def counts(df, name):
        return df.groupBy(*key_cols).agg(
            F.count(F.lit(1)).cast("long").alias(name)
        )

    ca = counts(a, "count_a")
    cb = counts(b, "count_b")
    j = scoped_persist(
        ca.join(cb, key_cols, "full_outer")
        .select(
            *key_cols,
            F.coalesce("count_a", F.lit(0)).alias("count_a"),
            F.coalesce("count_b", F.lit(0)).alias("count_b"),
        )
        .where(
            (F.col("count_a") >= min_count) | (F.col("count_b") >= min_count)
        )
    )
    tot = j.agg(
        F.sum("count_a").alias("ta"),
        F.sum("count_b").alias("tb"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    w = j.crossJoin(F.broadcast(tot))
    pa = (F.col("count_a") + 1) / (F.col("ta") + F.col("nb"))
    pb = (F.col("count_b") + 1) / (F.col("tb") + F.col("nb"))
    terms = w.select(
        *key_cols,
        "count_a",
        "count_b",
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    )
    total = (
        w.agg(
            F.sum("count_a").alias("count_a"),
            F.sum("count_b").alias("count_b"),
            F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi_term"),
        )
        .select(
            *[F.lit("__total__").alias(c) for c in key_cols],
            "count_a",
            "count_b",
            "psi_term",
        )
    )
    return terms.unionByName(total)


def psi_drift_sql(
    from_a: str, from_b: str, keys: list[str], min_count: int = 0
) -> str:
    """DuckDB mirror of ``psi_drift`` — same smoothing, same union-of-
    buckets outer join, same rounded term surface. ``keys`` are bucket
    column names present in both sources (the engine's key_cols)."""
    ks = ", ".join(keys)
    coal = " AND ".join(f"a.{k} IS NOT DISTINCT FROM b.{k}" for k in keys)
    pick = ", ".join(f"coalesce(a.{k}, b.{k}) AS {k}" for k in keys)
    totkeys = ", ".join(f"'__total__' AS {k}" for k in keys)
    return f"""
WITH ca AS (SELECT {ks}, CAST(count(*) AS BIGINT) AS count_a
            FROM {from_a} GROUP BY {ks}),
cb AS (SELECT {ks}, CAST(count(*) AS BIGINT) AS count_b
       FROM {from_b} GROUP BY {ks}),
j AS (
  SELECT {pick},
         coalesce(a.count_a, 0) AS count_a,
         coalesce(b.count_b, 0) AS count_b
  FROM ca a FULL OUTER JOIN cb b ON {coal}
  WHERE coalesce(a.count_a, 0) >= {min_count}
     OR coalesce(b.count_b, 0) >= {min_count}
),
tot AS (SELECT CAST(sum(count_a) AS BIGINT) AS ta,
               CAST(sum(count_b) AS BIGINT) AS tb,
               CAST(count(*) AS BIGINT) AS nb FROM j),
t AS (
  SELECT {ks}, count_a, count_b,
         ((count_a + 1) / CAST(ta + nb AS DOUBLE)
          - (count_b + 1) / CAST(tb + nb AS DOUBLE))
         * ln(((count_a + 1) / CAST(ta + nb AS DOUBLE))
              / ((count_b + 1) / CAST(tb + nb AS DOUBLE))) AS term
  FROM j CROSS JOIN tot
)
SELECT {ks}, count_a, count_b, round(term, 6) AS psi_term FROM t
UNION ALL
SELECT {totkeys}, CAST(sum(count_a) AS BIGINT), CAST(sum(count_b) AS BIGINT),
       round(sum(term), 6)
FROM t
"""



def psi_drift_by(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    group_cols: list[str],
    key_cols: list[str],
) -> DataFrame:
    """Per-GROUP PSI against one reference distribution — the monitoring
    form of ``psi_drift``: ``ref_counts`` is (key..., count_a) for the
    reference mix, ``cur_counts`` is (group..., key..., count_b) with one
    distribution per group (an hour window, a crawl snapshot, a source
    shard). Callers aggregate however they like — a batch groupBy or a
    drained streaming window agg both fit (this is the foreachBatch shape
    of a production drift monitor).

    Bucket union per group: every reference bucket appears in every group
    (cross join with the broadcast reference — bounded: groups x ref
    buckets), plus the group's own extra buckets via the outer join; the
    same add-one smoothing as ``psi_drift`` keeps one-sided buckets
    finite. Output: per (group..., key...) rows with (count_a, count_b,
    psi_term[6dp]) plus one __total__ row per group. The reference total
    is the same for every group; the smoothing bucket count nb varies
    with the group's union size — exactly what per-group PSI means.
    """
    from ..operators.caching import scoped_persist

    groups = cur_counts.select(*group_cols).distinct()
    base = groups.crossJoin(F.broadcast(ref_counts))
    # the outer join's right side derives from the same frame as ``groups``
    # (a self-join): rename its columns so the join resolves on distinct
    # names (the join_self convention) instead of conflicting references
    cols = [*group_cols, *key_cols]
    cur2 = cur_counts.select(
        *[F.col(c).alias(f"__c_{c}") for c in cols],
        F.col("count_b").alias("__count_b"),
    )
    cond = None
    for c in cols:
        e = base[c].eqNullSafe(cur2[f"__c_{c}"])
        cond = e if cond is None else (cond & e)
    j = scoped_persist(
        base.join(cur2, cond, "full_outer").select(
            *[
                F.coalesce(base[c], cur2[f"__c_{c}"]).alias(c)
                for c in cols
            ],
            F.coalesce("count_a", F.lit(0)).alias("count_a"),
            F.coalesce("__count_b", F.lit(0)).alias("count_b"),
        )
    )
    tot = j.groupBy(*group_cols).agg(
        F.sum("count_a").alias("ta"),
        F.sum("count_b").alias("tb"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    w = j.join(F.broadcast(tot), group_cols)
    pa = (F.col("count_a") + 1) / (F.col("ta") + F.col("nb"))
    pb = (F.col("count_b") + 1) / (F.col("tb") + F.col("nb"))
    term = (pa - pb) * F.log(pa / pb)
    rows = w.select(
        *group_cols, *key_cols, "count_a", "count_b",
        F.round(term, 6).alias("psi_term"),
    )
    totals = (
        w.groupBy(*group_cols)
        .agg(
            F.sum("count_a").alias("count_a"),
            F.sum("count_b").alias("count_b"),
            F.round(F.sum(term), 6).alias("psi_term"),
        )
        .select(
            *group_cols,
            *[F.lit("__total__").alias(k) for k in key_cols],
            "count_a",
            "count_b",
            "psi_term",
        )
    )
    return rows.unionByName(totals)


def psi_drift_by_sql(
    ref_counts_sql: str,
    cur_counts_sql: str,
    group_cols: list[str],
    key_cols: list[str],
) -> str:
    """DuckDB mirror of ``psi_drift_by``: ``ref_counts_sql`` must yield
    (key..., count_a), ``cur_counts_sql`` (group..., key..., count_b)."""
    g = ", ".join(group_cols)
    k = ", ".join(key_cols)
    gk = f"{g}, {k}"
    coal_keys = ", ".join(
        f"coalesce(l.{c}, r.{c}) AS {c}" for c in [*group_cols, *key_cols]
    )
    on = " AND ".join(
        f"l.{c} IS NOT DISTINCT FROM r.{c}" for c in [*group_cols, *key_cols]
    )
    totkeys = ", ".join(f"'__total__' AS {c}" for c in key_cols)
    return f"""
WITH ref AS ({ref_counts_sql}),
cur AS ({cur_counts_sql}),
base AS (SELECT gsel.*, ref.* FROM (SELECT DISTINCT {g} FROM cur) gsel
         CROSS JOIN ref),
j AS (
  SELECT {coal_keys},
         coalesce(l.count_a, 0) AS count_a,
         coalesce(r.count_b, 0) AS count_b
  FROM base l FULL OUTER JOIN cur r ON {on}
),
tot AS (
  SELECT {g}, CAST(sum(count_a) AS BIGINT) AS ta,
         CAST(sum(count_b) AS BIGINT) AS tb,
         CAST(count(*) AS BIGINT) AS nb
  FROM j GROUP BY {g}
),
t AS (
  SELECT j.*, tot.ta, tot.tb, tot.nb,
         ((count_a + 1) / CAST(ta + nb AS DOUBLE)
          - (count_b + 1) / CAST(tb + nb AS DOUBLE))
         * ln(((count_a + 1) / CAST(ta + nb AS DOUBLE))
              / ((count_b + 1) / CAST(tb + nb AS DOUBLE))) AS term
  FROM j JOIN tot USING ({g})
)
SELECT {gk}, count_a, count_b, round(term, 6) AS psi_term FROM t
UNION ALL
SELECT {g}, {totkeys}, CAST(sum(count_a) AS BIGINT),
       CAST(sum(count_b) AS BIGINT), round(sum(term), 6)
FROM t GROUP BY {g}
"""



def mutual_information(df: DataFrame, x: str, y: str) -> DataFrame:
    """Mutual information (and entropies / NMI) between two categorical
    columns — the dependency profile a curation pipeline reads before
    trusting a column as a stratification key (MI(lang, source) ~ 0 means
    the source mix is language-balanced; high NMI flags confounded
    splits).

        MI   = sum_xy p(x,y) ln( p(x,y) / (p(x) p(y)) )
        H(c) = -sum p ln p ;  NMI = MI / sqrt(H(x) H(y))

    Every probability is an exact rational of the joint-count table; the
    ln/sqrt are the float surface, rounded 6dp. One row out:
    (n, mi, h_x, h_y, nmi).

    Shape at scale: ONE (x, y) groupBy over the corpus (map-side
    combinable, joint-cardinality rows); both marginals and the total
    derive from the joint table, so the corpus is scanned once; the term
    sum is a broadcast-joined aggregate over the joint rows.
    """
    from ..operators.caching import scoped_persist

    j = scoped_persist(
        df.groupBy(F.col(x).alias("xv"), F.col(y).alias("yv")).agg(
            F.count(F.lit(1)).cast("long").alias("cxy")
        )
    )
    mx = j.groupBy("xv").agg(F.sum("cxy").alias("cx"))
    my = j.groupBy("yv").agg(F.sum("cxy").alias("cy"))
    tot = j.agg(F.sum("cxy").alias("n"))
    w = (
        j.join(F.broadcast(mx), "xv")
        .join(F.broadcast(my), "yv")
        .crossJoin(F.broadcast(tot))
    )
    # one canonical evaluation order, mirrored verbatim in SQL
    ratio = (F.col("cxy") / F.col("cx")) * (F.col("n") / F.col("cy"))
    mi = F.sum((F.col("cxy") / F.col("n")) * F.log(ratio))
    hx = mx.crossJoin(F.broadcast(tot)).agg(
        F.sum(-(F.col("cx") / F.col("n")) * F.log(F.col("cx") / F.col("n"))).alias(
            "h"
        )
    )
    hy = my.crossJoin(F.broadcast(tot)).agg(
        F.sum(-(F.col("cy") / F.col("n")) * F.log(F.col("cy") / F.col("n"))).alias(
            "h"
        )
    )
    base = w.agg(
        F.max("n").alias("n"), mi.alias("__mi")
    )
    return (
        base.crossJoin(F.broadcast(hx.select(F.col("h").alias("__hx"))))
        .crossJoin(F.broadcast(hy.select(F.col("h").alias("__hy"))))
        .select(
            F.col("n"),
            F.round("__mi", 6).alias("mi"),
            F.round("__hx", 6).alias("h_x"),
            F.round("__hy", 6).alias("h_y"),
            F.round(
                F.col("__mi") / F.sqrt(F.col("__hx") * F.col("__hy")), 6
            ).alias("nmi"),
        )
    )


def mutual_information_sql(from_sql: str, x: str, y: str) -> str:
    """DuckDB mirror of ``mutual_information`` — identical joint/marginal
    derivation and evaluation order."""
    return f"""
WITH j AS (
  SELECT {x} AS xv, {y} AS yv, CAST(count(*) AS BIGINT) AS cxy
  FROM {from_sql} GROUP BY 1, 2
),
mx AS (SELECT xv, CAST(sum(cxy) AS BIGINT) AS cx FROM j GROUP BY xv),
my AS (SELECT yv, CAST(sum(cxy) AS BIGINT) AS cy FROM j GROUP BY yv),
tot AS (SELECT CAST(sum(cxy) AS BIGINT) AS n FROM j),
mi AS (
  SELECT sum((cxy / CAST(n AS DOUBLE))
             * ln((cxy / CAST(cx AS DOUBLE)) * (n / CAST(cy AS DOUBLE))))
           AS v
  FROM j JOIN mx USING (xv) JOIN my USING (yv) CROSS JOIN tot
),
hx AS (SELECT sum(-(cx / CAST(n AS DOUBLE)) * ln(cx / CAST(n AS DOUBLE))) AS v
       FROM mx CROSS JOIN tot),
hy AS (SELECT sum(-(cy / CAST(n AS DOUBLE)) * ln(cy / CAST(n AS DOUBLE))) AS v
       FROM my CROSS JOIN tot)
SELECT tot.n, round(mi.v, 6) AS mi, round(hx.v, 6) AS h_x,
       round(hy.v, 6) AS h_y,
       round(mi.v / sqrt(hx.v * hy.v), 6) AS nmi
FROM tot CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy
"""


def js_divergence_by(
    df: DataFrame, group_col: str, token_col: str
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (bits, symmetric, bounded [0, 1])
    between the token distributions of every unordered pair of groups — the
    corpus-comparison profile a mixing pipeline reads before blending
    sources (JSD ~ 0: interchangeable; ~ 1: disjoint vocabularies; unlike
    KL it is defined when a token appears on one side only).

        JSD(P, Q) = 0.5 * sum_w [ p*log2(2p/(p+q)) + q*log2(2q/(p+q)) ]

    with one-sided terms evaluated only where the count is > 0 (the
    mathematical limit). Every probability is an exact rational of integer
    counts; log2 is the float surface, one canonical evaluation order
    mirrored verbatim in the generated SQL.

    Shape at scale: ONE (group, token) groupBy over the corpus (map-side
    combinable), totals derived from it; the G(G-1)/2 pair frame is
    group-cardinality-sized and broadcast; the per-pair union of vocab rows
    comes from a FULL OUTER join of the pair-tagged count frames on
    (pair, token) — shuffles carry (group, token, count) rows only, never
    text; the term sum is one aggregate per pair."""
    c = df.groupBy(
        F.col(group_col).alias("g"), F.col(token_col).alias("w")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    from ..operators.caching import scoped_persist

    c = scoped_persist(c)
    t = c.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    pairs = (
        t.select(F.col("g").alias("ga"), F.col("n").alias("na"))
        .join(
            t.select(F.col("g").alias("gb"), F.col("n").alias("nb")),
            F.col("ga") < F.col("gb"),
        )
    )
    wa = c.join(
        F.broadcast(pairs), F.col("g") == F.col("ga")
    ).select("ga", "gb", "na", "nb", "w", F.col("c").alias("ca"))
    wb = c.join(
        F.broadcast(pairs), F.col("g") == F.col("gb")
    ).select(
        F.col("ga").alias("gb_a"),
        F.col("gb").alias("gb_b"),
        F.col("w").alias("w_b"),
        F.col("c").alias("cb"),
    )
    full = wa.join(
        wb,
        (F.col("ga") == F.col("gb_a"))
        & (F.col("gb") == F.col("gb_b"))
        & (F.col("w") == F.col("w_b")),
        "full",
    ).select(
        F.coalesce("ga", "gb_a").alias("ga"),
        F.coalesce("gb", "gb_b").alias("gb"),
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = (
        t.select(F.col("g").alias("ga"), F.col("n").alias("na2"))
    )
    tot_b = t.select(F.col("g").alias("gb"), F.col("n").alias("nb2"))
    full = full.join(F.broadcast(tot), "ga").join(F.broadcast(tot_b), "gb")
    p = F.col("ca") / F.col("na2")
    q = F.col("cb") / F.col("nb2")
    term = F.when(
        F.col("ca") > 0, p * F.log2(F.lit(2.0) * p / (p + q))
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("cb") > 0, q * F.log2(F.lit(2.0) * q / (p + q))
    ).otherwise(F.lit(0.0))
    return (
        full.groupBy("ga", "gb")
        .agg(
            F.max("na2").cast("long").alias("n_a"),
            F.max("nb2").cast("long").alias("n_b"),
            F.round(F.lit(0.5) * F.sum(term), 6).alias("jsd_bits"),
        )
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "n_a",
            "n_b",
            "jsd_bits",
        )
    )


def js_divergence_by_sql(
    rows_sql: str, group_expr: str = "g", token_expr: str = "w"
) -> str:
    """Generated DuckDB mirror of ``js_divergence_by`` — same counts, same
    pair algebra, same canonical term order."""
    return f"""
WITH rows_in AS ({rows_sql}),
c AS (SELECT {group_expr} AS g, {token_expr} AS w, count(*) AS c
      FROM rows_in GROUP BY 1, 2),
t AS (SELECT g, sum(c) AS n FROM c GROUP BY g),
pairs AS (
  SELECT a.g AS ga, a.n AS na, b.g AS gb, b.n AS nb
  FROM t a JOIN t b ON a.g < b.g
),
wa AS (SELECT p.ga, p.gb, c.w, c.c AS ca
       FROM c JOIN pairs p ON c.g = p.ga),
wb AS (SELECT p.ga, p.gb, c.w, c.c AS cb
       FROM c JOIN pairs p ON c.g = p.gb),
full_w AS (
  SELECT coalesce(wa.ga, wb.ga) AS ga, coalesce(wa.gb, wb.gb) AS gb,
         coalesce(wa.ca, 0) AS ca, coalesce(wb.cb, 0) AS cb
  FROM wa FULL JOIN wb
    ON wa.ga = wb.ga AND wa.gb = wb.gb AND wa.w = wb.w
),
terms AS (
  SELECT f.ga, f.gb, ta.n AS na2, tb.n AS nb2,
         (CASE WHEN f.ca > 0
               THEN (f.ca / CAST(ta.n AS DOUBLE))
                    * log2(2.0 * (f.ca / CAST(ta.n AS DOUBLE))
                           / ((f.ca / CAST(ta.n AS DOUBLE))
                              + (f.cb / CAST(tb.n AS DOUBLE))))
               ELSE 0.0 END
          + CASE WHEN f.cb > 0
               THEN (f.cb / CAST(tb.n AS DOUBLE))
                    * log2(2.0 * (f.cb / CAST(tb.n AS DOUBLE))
                           / ((f.ca / CAST(ta.n AS DOUBLE))
                              + (f.cb / CAST(tb.n AS DOUBLE))))
               ELSE 0.0 END) AS term
  FROM full_w f JOIN t ta ON f.ga = ta.g JOIN t tb ON f.gb = tb.g
)
SELECT ga AS group_a, gb AS group_b,
       CAST(max(na2) AS BIGINT) AS n_a, CAST(max(nb2) AS BIGINT) AS n_b,
       round(0.5 * sum(term), 6) AS jsd_bits
FROM terms GROUP BY ga, gb
"""
