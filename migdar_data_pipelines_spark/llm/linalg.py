"""Vector expressions over array<float> embedding columns.

One shared implementation of dot/norm/cosine for the dedup and similarity
operators. The fold shape (``zip_with`` + ``aggregate``) is deliberately the
ONLY path: unrolling a known-width dot into a flat 64-term
``a[0]*b[0] + a[1]*b[1] + ...`` expression was measured SLOWER (3.1s vs 1.1s
steady-state on 1M rows x 64 dims) — the wide expression tree drops out of
whole-stage codegen and falls back to per-node interpreted eval, while
Spark's higher-order-function evaluator runs the fold as a tight loop over
the primitive array. Keep per-PAIR work down structurally instead: compute
norms once per row before a pair join (bit-identical — the per-vector sum
order is unchanged), and block/bucket before ever forming pairs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold — same summation order as a sequential SQL oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: ANSI mode THROWS on double/0.0, so a single zero-norm
    # vector would kill the job with plain division; NULL (which fails every
    # threshold comparison) is the intended "no similarity" semantics.
    return F.try_divide(dot(a, b), norm(a) * norm(b))



# ---------------------------------------------------------------------------
# Distributed second moments + PCA (the linear-algebra pass embedding
# compression and whitening need before ANN indexing)
# ---------------------------------------------------------------------------

#: micro-unit scale for the exact second-moment surface (the
#: label_centroids / kmeans house convention)
MOMENT_SCALE = 1_000_000


def second_moments_q(df, vec_col: str = "embedding"):
    """Exact integer second moments of an embedding column: one row per
    (i, j) upper-triangle dim pair with

        n        — corpus row count,
        sum_i_q  — sum of micro-unit coordinate i            (exact),
        sum_j_q  — sum of micro-unit coordinate j            (exact),
        xtx_q    — sum over rows of xq_i * xq_j              (exact),
        cov      — ((xtx_q/n) - (sum_i_q/n)*(sum_j_q/n)) / SCALE^2,
                   rounded 6dp (REAL units, magnitude <= max|x|^2: the
                   de-scale keeps the rounded value small enough that both
                   engines' round() is exact — rounding a micro-unit^2
                   value of ~1e10 at 6dp would exceed double precision and
                   diverge at the ULP).

    Why this shape: covariance/Gram matrices at 100 TB are computed as
    MAP-SIDE PARTIAL X^T X — here a mapInPandas computes one d x d int64
    matmul per Arrow batch and emits d*(d+1)/2 partial rows per batch, so
    the exchange carries (batches x pairs) sketch-sized rows and the
    groupBy reduce is exact integer addition (order-independent — no float
    accumulation anywhere). Overflow bound: |xq| <= S*|x|, so xtx partials
    stay inside int64 up to ~(2^63 / (S^2 * max|x|^2)) rows ~ 3.7e10 at
    |x| <= 0.5 — past that, shard the corpus and merge the integer rows.
    """
    import numpy as np

    from pyspark.sql import functions as F  # noqa: F811

    q = df.select(
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * MOMENT_SCALE).cast("long"),
        ).alias("vq")
    )

    def _partials(it):
        for pdf in it:
            X = np.asarray(pdf["vq"].tolist(), dtype=np.int64)
            if not len(X):
                continue
            d = X.shape[1]
            xtx = X.T @ X
            s = X.sum(axis=0)
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu.astype("int32"),
                    "j": ju.astype("int32"),
                    "n": np.int64(len(X)),
                    "si": s[iu],
                    "sj": s[ju],
                    "xtx": xtx[iu, ju],
                }
            )

    parts = q.mapInPandas(
        _partials, schema="i int, j int, n long, si long, sj long, xtx long"
    )
    agg = parts.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum("si").alias("sum_i_q"),
        F.sum("sj").alias("sum_j_q"),
        F.sum("xtx").alias("xtx_q"),
    )
    return agg.select(
        "i",
        "j",
        "n",
        "sum_i_q",
        "sum_j_q",
        "xtx_q",
        (
            F.round(
                (
                    F.col("xtx_q") / F.col("n")
                    - (F.col("sum_i_q") / F.col("n"))
                    * (F.col("sum_j_q") / F.col("n"))
                )
                / F.lit(float(MOMENT_SCALE) ** 2),
                6,
            )
            # + 0.0 folds IEEE negative zero into positive zero (engines
            # disagree on which side of -0.0 a rounded tiny negative lands)
            + F.lit(0.0)
        ).alias("cov"),
    )


def second_moments_sql(src_sql: str, vec_expr: str = "embedding") -> str:
    """DuckDB mirror of ``second_moments_q`` (same scale, same rounding,
    same upper-triangle pairing; the long-format self-join is the SQL
    spelling of the per-batch matmul). ``src_sql`` must yield the vector
    column named by ``vec_expr``."""
    return f"""
WITH vl AS (
  SELECT rid, pos - 1 AS dim,
         CAST(round(CAST(x AS DOUBLE) * {MOMENT_SCALE}) AS BIGINT) AS xq
  FROM (SELECT row_number() OVER () AS rid, unnest({vec_expr}) AS x,
               generate_subscripts({vec_expr}, 1) AS pos
        FROM ({src_sql}))
),
p AS (
  SELECT a.dim AS i, b.dim AS j,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a.xq) AS BIGINT) AS sum_i_q,
         CAST(sum(b.xq) AS BIGINT) AS sum_j_q,
         CAST(sum(a.xq * b.xq) AS BIGINT) AS xtx_q
  FROM vl a JOIN vl b ON a.rid = b.rid AND a.dim <= b.dim
  GROUP BY a.dim, b.dim
)
SELECT i, j, n, sum_i_q, sum_j_q, xtx_q,
       round((xtx_q / CAST(n AS DOUBLE)
              - (sum_i_q / CAST(n AS DOUBLE)) * (sum_j_q / CAST(n AS DOUBLE)))
             / CAST({float(MOMENT_SCALE) ** 2!r} AS DOUBLE),
             6) + CAST(0.0 AS DOUBLE) AS cov
FROM p
"""


def pca_project(
    df,
    vec_col: str = "embedding",
    n_components: int = 8,
    out_col: str = "pca",
    components=None,
):
    """Principal-component projection of an embedding column.

    The covariance matrix comes from ``second_moments_q`` (d^2 integer
    rows collected to the driver — never the corpus), eigendecomposition
    is driver-side numpy (d x d — microseconds), and the projection is a
    scan-local pandas_udf matmul with the component matrix in the closure.
    Components are sign-normalized (largest-|entry| coordinate made
    positive) so the output is deterministic up to eigenvalue ties.
    Returns (df + out_col array<double>, components, eigenvalues) — the
    standard compression pass before ANN indexing (centered, projected;
    eigenvalues in descending order, micro-unit^2 scale removed).

    ``components`` (optional) pins an INTEGER component matrix (k x d,
    list of lists) instead of the eigenvectors — the oracle-gate route:
    the projection then runs entirely in exact integer arithmetic
    (micro-unit quantized coordinates x int weights, the
    ``second_moments_q`` conventions), the centering term ``mu . W_j``
    is an exact int64 ``S . W_j`` divided by ``n`` once, and the final
    de-scale + 6dp round is the same fixed two-operand IEEE expression
    in both engines (``pca_project_pinned_sql`` is the generated
    mirror), so a DuckDB oracle can value-hash the projection — closing
    the one operator that was previously verified only against a
    driver-side numpy recomputation. Eigenvalues return ``None`` in
    this mode; the projection machinery (scan-local Arrow-batched
    matmul, weights in the closure) is the SAME code shape as the
    eigen route.
    """
    import numpy as np

    from pyspark.sql import functions as F  # noqa: F811
    from pyspark.sql.functions import pandas_udf

    if components is not None:
        Wq = np.asarray(components, dtype=np.int64)  # (k, d)
        d = Wq.shape[1]
        vq = F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * MOMENT_SCALE).cast("long"),
        )
        base = df.withColumn("__vq", vq)
        # exact per-dim sums + count: d map-side-combinable integer SUM
        # aggregates over the quantized coordinates — one scan, one
        # d-int row to the driver, no explode/shuffle of the corpus
        tot = base.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.col("__vq")[i]).alias(f"s{i}")
                for i in range(d)
            ],
        ).collect()[0]
        n = tot["n"]
        S = np.asarray([tot[f"s{i}"] for i in range(d)], dtype=object)
        # centering term per component: exact integer S . W_j, divided
        # by n ONCE (python bigint -> correctly-rounded double, matching
        # CAST(m AS DOUBLE)/CAST(n AS DOUBLE) for |m| < 2^53)
        M_over_n = np.asarray(
            [float(int((S * Wq[j]).sum()) / n) for j in range(Wq.shape[0])]
        )

        @pandas_udf("array<double>")
        def _proj_q(vqs: pd.Series) -> pd.Series:
            X = np.asarray(vqs.tolist(), dtype=np.int64)
            Yq = X @ Wq.T  # exact int64
            Y = np.round(
                (Yq.astype(np.float64) - M_over_n[None, :]) / MOMENT_SCALE, 6
            ) + 0.0
            return pd.Series(list(Y))

        out = base.withColumn(out_col, _proj_q(F.col("__vq"))).drop("__vq")
        return out, Wq.astype(np.float64), None

    rows = second_moments_q(df, vec_col).collect()
    d = max(r["j"] for r in rows) + 1
    n = rows[0]["n"]
    S = np.zeros(d)
    C = np.zeros((d, d))
    for r in rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["xtx_q"]
        S[r["i"]] = r["sum_i_q"]
    mu = S / n
    cov = C / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T                   # (k, d)
    for r_i in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r_i]))
        if comps[r_i, m] < 0:
            comps[r_i] = -comps[r_i]
    lam = evals[order] / float(MOMENT_SCALE) ** 2
    W = comps.astype(np.float64)
    mu_f = mu / MOMENT_SCALE

    @pandas_udf("array<double>")
    def _proj(vecs: pd.Series) -> pd.Series:
        X = np.asarray(vecs.tolist(), dtype=np.float64)
        Y = (X - mu_f[None, :]) @ W.T
        return pd.Series(list(Y))

    out = df.withColumn(out_col, _proj(F.col(vec_col)))
    return out, comps, lam


def pca_project_pinned_sql(
    src_sql: str,
    components,
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
) -> str:
    """DuckDB mirror of ``pca_project(components=...)`` in LONG format —
    one row (id, component, y) per projected coordinate: identical
    micro-unit quantization (round half away from zero, the
    ``second_moments_sql`` contract), exact integer xq*w sums per
    (row, component), exact integer centering numerators, and the same
    fixed ``(yq - m/n)/SCALE`` double expression rounded at 6dp."""
    Wq = [list(map(int, row)) for row in components]
    vals = ",".join(
        f"({j},{dim},{w})"
        for j, row in enumerate(Wq)
        for dim, w in enumerate(row)
    )
    return f"""
WITH vl AS (
  SELECT {id_expr} AS rid, pos - 1 AS dim,
         CAST(round(CAST(x AS DOUBLE) * {MOMENT_SCALE}) AS BIGINT) AS xq
  FROM (SELECT {id_expr}, unnest({vec_expr}) AS x,
               generate_subscripts({vec_expr}, 1) AS pos
        FROM ({src_sql}))
),
w(comp, dim, wt) AS (VALUES {vals}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ({src_sql})),
s AS (SELECT dim, CAST(sum(xq) AS BIGINT) AS s FROM vl GROUP BY dim),
m AS (SELECT w.comp, CAST(sum(s.s * w.wt) AS BIGINT) AS m
      FROM s JOIN w ON s.dim = w.dim GROUP BY w.comp),
yq AS (SELECT vl.rid, w.comp, CAST(sum(vl.xq * w.wt) AS BIGINT) AS yq
       FROM vl JOIN w ON vl.dim = w.dim GROUP BY vl.rid, w.comp)
SELECT yq.rid AS {id_expr}, CAST(yq.comp AS INTEGER) AS component,
       round((CAST(yq.yq AS DOUBLE) - CAST(m.m AS DOUBLE) / CAST(tot.n AS DOUBLE))
             / CAST({float(MOMENT_SCALE)!r} AS DOUBLE), 6)
       + CAST(0.0 AS DOUBLE) AS y
FROM yq JOIN m ON yq.comp = m.comp CROSS JOIN tot
"""
