"""Engine-portable HyperLogLog — an approximate-distinct sketch whose value
is REPRODUCIBLE across engines, runs, and partitionings.

Spark's ``approx_count_distinct`` is HLL++ over xxhash64 — fast, but its
answer is Spark-specific, so it can't be contract-tested against another
engine and two systems sharing a lakehouse can't agree on the sketch. This
implementation pays ~2x the hash cost to buy portability:

  * hash = md5 of the stringified value (same portable choice as
    llm/curation.py::md5_bucket);
  * register index = first 2 hex chars (b=8 bits, m=256 registers);
  * rho = leading-zero count of the next 48 bits + 1, computed with INTEGER
    AND STRING logic ONLY (count '0' hex chars, then a 4-way CASE inside the
    first non-zero nibble) — never floor(log2(double)), whose boundary
    behavior is library-dependent;
  * Z = sum of 2^-M_j over registers: each term is an exact power of two and
    the 53-bit mantissa spans all 50 magnitudes, so the double sum is EXACT
    in any order — the estimate is then two correctly-rounded IEEE ops on
    identical inputs, hence bit-identical across engines.

The aggregation is algebraic: per-partition partial maxima combine map-side,
the exchange carries at most m rows per partition, and the final reduce is
m rows total — the sketch costs one scan regardless of corpus size. The
standard small-range correction (E <= 2.5m with empty registers ->
m*ln(m/V)) is applied; the 2^32 large-range correction is omitted (the
64-bit-era variant never needs it at any corpus size this engine targets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..session import local_df

M_REGISTERS = 256  # b = 8 index bits
_TAIL_HEX = 12  # 48 bits of rho stream
#: alpha_256 from the HLL paper; a Python literal so Spark and the generated
#: SQL inline the exact same double.
ALPHA = 0.7213 / (1 + 1.079 / M_REGISTERS)


def _rho(h: Column) -> Column:
    """Leading-zero-count(+1) of the 48-bit tail of an md5 hex string."""
    t = F.substring(h, 3, _TAIL_HEX)
    z = F.length(F.regexp_extract(t, "^(0*)", 1))
    v = F.conv(F.substring(t, z + 1, 1), 16, 10).cast("int")
    lz_in_nibble = (
        F.when(v >= 8, 0).when(v >= 4, 1).when(v >= 2, 2).otherwise(3)
    )
    return F.when(t == F.lit("0" * _TAIL_HEX), F.lit(4 * _TAIL_HEX + 1)).otherwise(
        z * 4 + lz_in_nibble + 1
    )


def _hll_registers_by(
    df: DataFrame, group_cols: list[str], col: str | Column
) -> DataFrame:
    """(group..., register, max_rho) sketch state; group_cols=[] is the
    global sketch. Union-able across shards/engines by re-aggregating max
    per (group, register)."""
    c = F.col(col) if isinstance(col, str) else col
    # NOT widened (measured, round 14): one md5+rho per row is light enough
    # that the widening exchange costs more than the single-task pass at
    # gate scale (hll_distinct_orders 0.28s -> 0.39s with widen_scan) —
    # unlike the DEPTH-hashes-per-row CMS build below.
    h = F.md5(c.cast("string"))
    j = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    return (
        df.select(*group_cols, j.alias("register"), _rho(h).alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def _hll_estimate_by(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., hll_estimate, n_registers_used) from register state — the
    single home of the estimate arithmetic (global = group_cols=[])."""
    m = float(M_REGISTERS)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("zp"),
        F.count(F.lit(1)).alias("used"),
    )
    z = F.col("zp") + (F.lit(m) - F.col("used"))
    e_raw = F.lit(ALPHA) * F.lit(m * m) / z
    v = F.lit(m) - F.col("used")
    e = F.when((e_raw <= 2.5 * m) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)).otherwise(
        e_raw
    )
    return agg.select(
        *group_cols,
        F.round(e, 4).alias("hll_estimate"),
        F.col("used").cast("long").alias("n_registers_used"),
    )


def hll_registers(df: DataFrame, col: str | Column) -> DataFrame:
    """(register, max_rho) rows — the integer-exact global sketch state."""
    return _hll_registers_by(df, [], col)


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row (hll_estimate, n_registers_used) from hll_registers output."""
    return _hll_estimate_by(registers, [])


def hll_distinct(df: DataFrame, col: str | Column) -> DataFrame:
    """One-row portable approximate-distinct estimate of ``col``."""
    return hll_estimate(hll_registers(df, col))


def hll_sql(expr: str, from_sql: str) -> str:
    """DuckDB mirror of the GLOBAL sketch: the grouped generator with a
    constant group, projected away — one home for the SQL arithmetic too."""
    return (
        "SELECT hll_estimate, n_registers_used FROM ("
        + hll_by_sql(expr, "1", from_sql)
        + ")"
    )


# ---------------------------------------------------------------------------
# Engine-portable count-min sketch (Cormode & Muthukrishnan 2005): frequency
# estimation in fixed space, same portability contract as the HLL above —
# md5-derived hash rows so any engine (or any shard, merged by cell-wise sum)
# reproduces the identical sketch.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 256  # buckets per row (one md5 hex byte)


def _cms_bucket(row: int, key):
    """Bucket of ``key`` in hash row ``row``: byte ``row`` of
    md5(row || ':' || key) — four independent 8-bit hashes from one digest."""
    h = F.md5(F.concat(F.lit(f"{row}:"), key.cast("string")))
    return F.conv(F.substring(h, 2 * row + 1, 2), 16, 10).cast("int")


def cms_sketch(df: DataFrame, col: str | Column) -> DataFrame:
    """The sketch state: (row, bucket, cnt) cells, at most DEPTH*WIDTH rows
    regardless of input cardinality. One explode (DEPTH rows per input row,
    cheap integer/md5 column work) into a map-side-combinable aggregate whose
    exchange carries <= DEPTH*WIDTH rows per partition — the sketch of 100 TB
    is 1024 longs. Shards/engines merge by summing cnt per (row, bucket)."""
    from .scale import widen_scan

    c = F.col(col) if isinstance(col, str) else col
    # raw key first, widen, then the DEPTH md5 bucket hashes — the per-row
    # hashing otherwise runs single-task on a small scan (count groupBy is
    # order-insensitive, so the sketch is partitioning-invariant)
    src = widen_scan(df.select(c.alias("__k")), "__k")
    cells = src.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(r, F.col("__k")).alias("bucket"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.row", "cell.bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(keys: DataFrame, col: str | Column, sketch: DataFrame) -> DataFrame:
    """Point estimates for a candidate key set: est(key) = min over rows of
    the key's cell count (an upper bound on the true count; never under).
    The sketch is broadcast (it is at most 1024 cells), so estimation is a
    broadcast join over the candidate scan. The join is LEFT with empty
    cells counted as 0: a probe key absent from the sketched data must
    estimate as 0 when ANY of its cells is untouched (zero-count cells are
    simply missing rows in the sparse state) — an inner join would silently
    drop such keys, or worse return min over only the colliding cells."""
    c = F.col(col) if isinstance(col, str) else col
    probes = keys.select(
        c.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cms_bucket(r, c).alias("bucket")
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select("key", "cell.row", "cell.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


def cms_sql(expr: str, from_sql: str) -> str:
    """DuckDB mirror: identical cells/estimate arithmetic over
    ``SELECT {expr} FROM {from_sql}`` (keys = the distinct values of the same
    expression). Generated from the same DEPTH/WIDTH constants."""
    rows = ", ".join(str(r) for r in range(CMS_DEPTH))
    hexv = (
        "(strpos('0123456789abcdef', substr(h, 2*r+1, 1))-1)*16"
        " + (strpos('0123456789abcdef', substr(h, 2*r+2, 1))-1)"
    )
    return f"""
WITH src AS (SELECT {expr} AS k FROM {from_sql}),
hashed AS (
  SELECT k, r, md5(CAST(r AS VARCHAR) || ':' || CAST(k AS VARCHAR)) AS h
  FROM src, (SELECT unnest([{rows}]) AS r)
),
cells AS (
  SELECT r AS row, {hexv} AS bucket, count(*) AS cnt
  FROM hashed GROUP BY 1, 2
),
probes AS (
  SELECT DISTINCT k AS key, r AS row, {hexv} AS bucket FROM hashed
)
SELECT key, CAST(min(cnt) AS BIGINT) AS est
FROM probes JOIN cells USING (row, bucket)
GROUP BY key
"""


def hll_distinct_by(df: DataFrame, group_cols: list[str], col: str | Column) -> DataFrame:
    """Grouped portable approximate-distinct: one (group, hll_estimate,
    n_registers_used) row per group — the sketch-as-aggregate form a 100 TB
    rollup uses (per-source distinct users, per-day distinct documents).

    Same register/rho/estimate arithmetic as the global ``hll_distinct``,
    keyed by group: the exchange carries at most m=256 rows per (group,
    partition) after map-side max-combining, and the estimate math runs as
    plain expressions on the m-row-per-group state — no per-group driver
    work, no UDAF. The per-group state remains union-able across shards and
    engines by re-aggregating max per (group, register)."""
    return _hll_estimate_by(_hll_registers_by(df, group_cols, col), group_cols)


def hll_by_sql(expr: str, group_expr: str, from_sql: str) -> str:
    """DuckDB mirror of ``hll_distinct_by`` grouped by ``group_expr``,
    generated from the same constants."""
    a = f"CAST({ALPHA!r} AS DOUBLE)"
    m = f"CAST({float(M_REGISTERS)!r} AS DOUBLE)"
    m2 = f"CAST({float(M_REGISTERS) ** 2!r} AS DOUBLE)"
    thr = f"CAST({2.5 * M_REGISTERS!r} AS DOUBLE)"
    hexpos = "strpos('0123456789abcdef', substr(t, z + 1, 1)) - 1"
    j = (
        "(strpos('0123456789abcdef', substr(h,1,1))-1)*16"
        " + (strpos('0123456789abcdef', substr(h,2,1))-1)"
    )
    return f"""
WITH hx AS (SELECT {group_expr} AS g, md5(CAST({expr} AS VARCHAR)) AS h
            FROM {from_sql}),
parts AS (
  SELECT g, {j} AS register, substr(h, 3, {_TAIL_HEX}) AS t FROM hx
), zc AS (
  SELECT g, register, t, len(regexp_extract(t, '^(0*)', 1)) AS z FROM parts
), rho AS (
  SELECT g, register,
         CASE WHEN t = '{'0' * _TAIL_HEX}' THEN {4 * _TAIL_HEX + 1}
              ELSE 4*z + CASE WHEN ({hexpos}) >= 8 THEN 0
                              WHEN ({hexpos}) >= 4 THEN 1
                              WHEN ({hexpos}) >= 2 THEN 2
                              ELSE 3 END + 1 END AS r
  FROM zc
), regs AS (
  SELECT g, register, max(r) AS max_rho FROM rho GROUP BY g, register
), agg AS (
  SELECT g, sum(power(2.0, -max_rho)) AS zp, count(*) AS used
  FROM regs GROUP BY g
)
SELECT g, round(CASE WHEN {a} * {m2} / (zp + ({m} - used)) <= {thr}
                      AND ({m} - used) > 0
                THEN {m} * ln({m} / ({m} - used))
                ELSE {a} * {m2} / (zp + ({m} - used))
           END, 4) AS hll_estimate,
       CAST(used AS BIGINT) AS n_registers_used
FROM agg
"""


def cms_join_size(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Join-cardinality estimate from two count-min sketches over the SAME
    key expression: the CM inner-product estimator (Cormode & Muthukrishnan
    §4.2) — est = min over hash rows of sum_buckets cntA * cntB, an upper
    bound on |A join B| on that key that never under-estimates.

    This is the planning primitive sketches buy you at 100 TB: both sides'
    sketches are <= DEPTH*WIDTH cells built in one scan each (often already
    maintained incrementally per partition/day), so a pipeline can ask
    "how big would this join be?" — pick broadcast vs shuffle, predict
    skew blowup — without running the join. The estimate math here is a
    1024-row join + a DEPTH-row aggregate: driver-free, instant."""
    a = sketch_a.select("row", "bucket", F.col("cnt").alias("cnt_a"))
    b = sketch_b.select("row", "bucket", F.col("cnt").alias("cnt_b"))
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
    )
    return per_row.agg(F.min("ip").cast("long").alias("est_join_size"))


def cms_join_size_sql(expr_a: str, from_a: str, expr_b: str, from_b: str) -> str:
    """DuckDB mirror: both sketches + the inner-product min, generated from
    the same DEPTH/WIDTH constants."""
    return f"""
WITH ra AS (SELECT row, bucket, cnt AS cnt_a FROM ({_cms_cells_sql(expr_a, from_a)})),
rb AS (SELECT row, bucket, cnt AS cnt_b FROM ({_cms_cells_sql(expr_b, from_b)})),
per_row AS (
  SELECT row, sum(cnt_a * cnt_b) AS ip
  FROM ra JOIN rb USING (row, bucket) GROUP BY row
)
SELECT CAST(min(ip) AS BIGINT) AS est_join_size FROM per_row
"""


def _cms_cells_sql(expr: str, from_sql: str) -> str:
    """Just the (row, bucket, cnt) cells of ``cms_sql`` — shared by the
    estimate and inner-product mirrors."""
    rows = ", ".join(str(r) for r in range(CMS_DEPTH))
    hexv = (
        "(strpos('0123456789abcdef', substr(h, 2*r+1, 1))-1)*16"
        " + (strpos('0123456789abcdef', substr(h, 2*r+2, 1))-1)"
    )
    return f"""
SELECT r AS row, {hexv} AS bucket, count(*) AS cnt
FROM (
  SELECT k, r, md5(CAST(r AS VARCHAR) || ':' || CAST(k AS VARCHAR)) AS h
  FROM (SELECT {expr} AS k FROM {from_sql}),
       (SELECT unnest([{rows}]) AS r)
)
GROUP BY 1, 2
"""



# ---------------------------------------------------------------------------
# KMV (k-minimum values) — the distinct sketch with SET ALGEBRA
# ---------------------------------------------------------------------------

#: sketch size (k smallest hashes kept); relative error ~ 1/sqrt(k-2)
KMV_K = 64
#: md5 hex digits of hash space: 16^15 = 2^60 values, fits a signed long
#: (the same positional fold as llm/curation.md5_bucket, so the generated
#: SQL computes the identical integer)
KMV_HEX_DIGITS = 15
#: the hash space size as an EXACT double (2^60 is a power of two, so the
#: literal is representable; both engines inline the same value)
KMV_SPACE = float(16**KMV_HEX_DIGITS)


def kmv_sketch(
    df: DataFrame, col: str | Column, k: int = KMV_K
) -> DataFrame:
    """The k smallest distinct portable hashes of ``col`` as (h, rk) rows.

    Why another distinct sketch next to HLL: KMV values are real hash
    SAMPLES, so two sketches support set algebra — union (merge + re-trim)
    and intersection/Jaccard (fraction of the union sketch present in
    both) — which register-max HLL structurally cannot do. Beyer et al.
    2007 ("On synopses for distinct-value estimation under multiset
    operations") is the published recipe.

    Shape at scale — ZERO corpus-sized shuffle: a scan-local mapInPandas
    keeps the k smallest distinct hashes per input partition (bounded
    k-row state), and only those <= P*k candidates reach the final
    dropDuplicates + k-trim. The sketch stays union-able across shards and
    engines by re-merging row sets (kmv_union does exactly that).
    """
    from pyspark.sql import Window

    from ..llm.curation import md5_bucket

    # NOT widened (measured, round 14): one md5 per row is light enough
    # that a widening exchange costs more than the single-task pass at gate
    # scale (kmv_setops 1.35s -> 1.71s with widen_scan).
    hashed = df.select(md5_bucket(col, KMV_HEX_DIGITS).alias("h"))

    def _partial(it):
        for pdf in it:
            yield (
                pdf.drop_duplicates(subset=["h"])
                .sort_values("h")
                .head(k)
            )

    partial = hashed.mapInPandas(_partial, schema="h long")
    w = Window.orderBy("h")
    return (
        partial.dropDuplicates(["h"])
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def kmv_estimate_expr(n_sketch: Column, kth_hash: Column, k: int) -> Column:
    """Distinct estimate from a sketch's row count and kth hash: exact when
    the sketch is under-full (it IS the distinct set), else the standard
    (k-1) * M / h_k. Written once so engine and SQL share the formula via
    ``kmv_estimate_sql_expr``."""
    return F.round(
        F.when(n_sketch < k, n_sketch.cast("double")).otherwise(
            F.lit(float(k - 1)) * F.lit(KMV_SPACE) / kth_hash.cast("double")
        ),
        4,
    )


def kmv_estimate_sql_expr(n_sketch: str, kth_hash: str, k: int) -> str:
    """DuckDB spelling of ``kmv_estimate_expr`` — identical literals."""
    return (
        f"round(CASE WHEN {n_sketch} < {k} THEN CAST({n_sketch} AS DOUBLE) "
        f"ELSE CAST({float(k - 1)!r} AS DOUBLE) * CAST({KMV_SPACE!r} AS DOUBLE) "
        f"/ CAST({kth_hash} AS DOUBLE) END, 4)"
    )


def kmv_set_ops(
    a: DataFrame, b: DataFrame, k: int = KMV_K
) -> DataFrame:
    """Set-algebra estimates from two KMV sketches (rows of (h, rk)):

    one row per set_name in {a, b, union, intersection} with
    (n_sketch, kth_hash, est): the union sketch is the k smallest of the
    merged hash sets; the intersection estimate is rho * est(union) where
    rho = |union-sketch hashes present in BOTH input sketches| / |union
    sketch| (Beyer et al. 2007) — every count and kth hash is an exact
    integer, only the two estimator divisions are float, rounded for the
    contract. All frames here are <= 2k rows: the whole computation is
    sketch-sized, never data-sized.
    """
    from pyspark.sql import Window

    from ..operators.caching import scoped_persist

    a = scoped_persist(a.select("h"))
    b = scoped_persist(b.select("h"))
    w = Window.orderBy("h")
    u = scoped_persist(
        a.union(b)
        .dropDuplicates(["h"])
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )
    both = u.join(a, "h", "left_semi").join(b, "h", "left_semi")

    def stats(df, name):
        return df.agg(
            F.lit(name).alias("set_name"),
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("h").alias("kth_hash"),
        )

    rows = (
        stats(a, "a")
        .unionByName(stats(b, "b"))
        .unionByName(stats(u, "union"))
        .withColumn(
            "est", kmv_estimate_expr(F.col("n_sketch"), F.col("kth_hash"), k)
        )
    )
    inter = (
        both.agg(
            F.lit("intersection").alias("set_name"),
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            # the intersection is a subset sample, not a k-min sketch of its
            # own — it has no kth-hash contract surface
            F.lit(None).cast("long").alias("kth_hash"),
        )
        .crossJoin(
            u.agg(
                F.count(F.lit(1)).cast("long").alias("__nu"),
                F.max("h").alias("__ku"),
            )
        )
        .withColumn(
            "est",
            F.round(
                F.col("n_sketch").cast("double")
                / F.col("__nu")
                * kmv_estimate_expr(F.col("__nu"), F.col("__ku"), k),
                4,
            ),
        )
        .drop("__nu", "__ku")
    )
    return rows.unionByName(inter)


def kmv_sql(expr: str, from_sql: str, k: int = KMV_K) -> str:
    """DuckDB mirror of ``kmv_sketch`` (same md5 fold, same trim)."""
    from ..llm.curation import md5_bucket_sql

    fold = md5_bucket_sql(expr, KMV_HEX_DIGITS)
    return f"""
SELECT h, rk FROM (
  SELECT h, row_number() OVER (ORDER BY h) AS rk
  FROM (SELECT DISTINCT {fold} AS h FROM {from_sql})
) WHERE rk <= {k}
"""


def kmv_set_ops_sql(
    expr_a: str, from_a: str, expr_b: str, from_b: str, k: int = KMV_K
) -> str:
    """DuckDB mirror of sketch-build + ``kmv_set_ops`` end to end,
    generated from the same fold and estimator literals."""
    est = kmv_estimate_sql_expr("n_sketch", "kth_hash", k)
    est_u = kmv_estimate_sql_expr("nu", "ku", k)
    return f"""
WITH a AS ({kmv_sql(expr_a, from_a, k)}),
b AS ({kmv_sql(expr_b, from_b, k)}),
u AS (
  SELECT h, rk FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rk
    FROM (SELECT DISTINCT h FROM (SELECT h FROM a UNION ALL SELECT h FROM b))
  ) WHERE rk <= {k}
),
ib AS (
  SELECT u.h FROM u
  WHERE u.h IN (SELECT h FROM a) AND u.h IN (SELECT h FROM b)
),
base AS (
  SELECT 'a' AS set_name, CAST(count(*) AS BIGINT) AS n_sketch,
         max(h) AS kth_hash FROM a
  UNION ALL
  SELECT 'b', CAST(count(*) AS BIGINT), max(h) FROM b
  UNION ALL
  SELECT 'union', CAST(count(*) AS BIGINT), max(h) FROM u
),
ustats AS (
  SELECT CAST(count(*) AS BIGINT) AS nu, max(h) AS ku FROM u
),
istats AS (
  SELECT CAST(count(*) AS BIGINT) AS ni FROM ib
)
SELECT set_name, n_sketch, kth_hash, {est} AS est FROM base
UNION ALL
SELECT 'intersection', ni AS n_sketch,
       CAST(NULL AS BIGINT) AS kth_hash,
       round(CAST(ni AS DOUBLE) / nu * {est_u}, 4) AS est
FROM istats CROSS JOIN ustats
"""



def sampled_quantiles(
    df: DataFrame,
    val_col: str | Column,
    id_col: str | Column,
    probs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    k: int = 1024,
) -> DataFrame:
    """Order statistics WITHOUT a global sort: quantiles of ``val_col``
    from a deterministic k-row uniform sample (the rows whose md5-fold id
    hash is smallest — the KMV trick pointed at row selection, so the
    sample is stable across runs, partitionings, and engines).

    The estimate of quantile p is the sample's nearest-rank-lower order
    statistic (index floor((n-1)*p), value taken VERBATIM from the data —
    no interpolation, so the output surface is exact data values).
    Sampling error ~ O(1/sqrt(k)) in rank space (Manku et al. 1998-style
    single-pass sampling); the exact-histogram route
    (exact_percentiles_lineitem) is the exactness gate, this is the
    one-scan bounded-memory path a 100 TB profile job uses.

    Shape at scale: orderBy(hash).limit(k) compiles to
    TakeOrderedAndProject — per-partition k-row heaps merged once, no
    range Exchange, driver holds k (hash, value) pairs at most. Quantile
    extraction then runs on the k-row frame (sketch-sized window).
    """
    from pyspark.sql import Window

    from ..llm.curation import md5_bucket

    v = F.col(val_col) if isinstance(val_col, str) else val_col
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    samp = (
        df.select(v.alias("v"), md5_bucket(i, KMV_HEX_DIGITS).alias("h"))
        # NULL values (or NULL ids -> NULL hash) are excluded outright:
        # Spark sorts NULLS FIRST, DuckDB NULLS LAST, so any NULL in the
        # orderings would silently diverge engine vs oracle — and a
        # quantile of NULL is meaningless anyway
        .where(F.col("v").isNotNull() & F.col("h").isNotNull())
        .orderBy("h", "v")
        .limit(k)
    )
    from ..operators.caching import scoped_persist

    samp = scoped_persist(samp)
    ranked = samp.withColumn(
        "rk", F.row_number().over(Window.orderBy("v", "h"))
    )
    n = samp.agg(F.count(F.lit(1)).cast("long").alias("sample_n"))
    pr = local_df(df.sparkSession, [(float(p),) for p in probs], "p double")
    tgt = pr.crossJoin(F.broadcast(n)).withColumn(
        "idx", F.floor((F.col("sample_n") - 1) * F.col("p")) + 1
    )
    return (
        tgt.join(F.broadcast(ranked), tgt["idx"] == ranked["rk"])
        .select("p", "sample_n", F.col("v").alias("q_value"))
    )


def sampled_quantiles_sql(
    val_expr: str,
    id_expr: str,
    from_sql: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    k: int = 1024,
) -> str:
    """DuckDB mirror of ``sampled_quantiles`` — identical fold, trim,
    rank rule, and index arithmetic (probs inlined as DOUBLE casts: bare
    decimal literals parse as DECIMAL in DuckDB and must not)."""
    from ..llm.curation import md5_bucket_sql

    fold = md5_bucket_sql(id_expr, KMV_HEX_DIGITS)
    plist = ", ".join(f"CAST({float(p)!r} AS DOUBLE)" for p in probs)
    return f"""
WITH s AS (
  SELECT v, h FROM (
    SELECT {val_expr} AS v, {fold} AS h FROM {from_sql}
    WHERE {val_expr} IS NOT NULL AND {fold} IS NOT NULL
    ORDER BY h, v LIMIT {k}
  )
),
r AS (SELECT v, row_number() OVER (ORDER BY v, h) AS rk FROM s),
n AS (SELECT CAST(count(*) AS BIGINT) AS sample_n FROM s),
p AS (SELECT unnest([{plist}]) AS p)
SELECT p, sample_n, v AS q_value
FROM p CROSS JOIN n
JOIN r ON r.rk = CAST(floor((sample_n - 1) * p) AS BIGINT) + 1
"""



def kmv_sketch_by(
    df: DataFrame, group_cols: list[str], col: str | Column, k: int = KMV_K
) -> DataFrame:
    """Grouped KMV: the k smallest distinct hashes of ``col`` PER GROUP as
    (group..., h, rk) rows — the sketch-as-aggregate form (per-day
    distinct users, per-source distinct documents) whose rows still
    support set algebra BETWEEN groups (see ``kmv_adjacent_overlap``).

    Same zero-corpus-shuffle shape as ``kmv_sketch``: the scan-local
    mapInPandas keeps k smallest distinct hashes per (partition, group) —
    bounded G*k state — and only those candidates reach the per-group
    dropDuplicates + k-trim window (which shuffles by GROUP, not by the
    corpus)."""
    from pyspark.sql import Window

    from ..llm.curation import md5_bucket

    c = F.col(col) if isinstance(col, str) else col
    hashed = df.select(*group_cols, md5_bucket(c, KMV_HEX_DIGITS).alias("h"))
    gc = list(group_cols)

    def _partial(it):
        for pdf in it:
            yield (
                pdf.drop_duplicates(subset=[*gc, "h"])
                .sort_values("h")
                # dropna=False: a NULL group key is a real group (pandas
                # silently discards it by default — the oracle keeps it)
                .groupby(gc, sort=False, dropna=False)
                .head(k)
            )

    schema = hashed.schema
    partial = hashed.mapInPandas(_partial, schema=schema)
    w = Window.partitionBy(*gc).orderBy("h")
    return (
        partial.dropDuplicates([*gc, "h"])
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def kmv_by_sql(
    expr: str, group_exprs: list[str], from_sql: str, k: int = KMV_K
) -> str:
    """DuckDB mirror of ``kmv_sketch_by`` (group_exprs are the output
    column names, present in ``from_sql``)."""
    from ..llm.curation import md5_bucket_sql

    g = ", ".join(group_exprs)
    fold = md5_bucket_sql(expr, KMV_HEX_DIGITS)
    return f"""
SELECT {g}, h, rk FROM (
  SELECT {g}, h, row_number() OVER (PARTITION BY {g} ORDER BY h) AS rk
  FROM (SELECT DISTINCT {g}, {fold} AS h FROM {from_sql})
) WHERE rk <= {k}
"""


def kmv_adjacent_overlap(
    sketches: DataFrame,
    group_col: str,
    next_of: Column,
    k: int = KMV_K,
    max_broadcast_groups: int | None = None,
) -> DataFrame:
    """Distinct-set overlap between CONSECUTIVE groups from their KMV
    sketches — the bounded-memory form of day-over-day returning-user /
    recurring-document metrics (exact distinct-intersections at 1e10
    users/day need the full sets; the sketches are k rows each):

    for each group g with successor g' = ``next_of``(g) present, estimate
    |A_g|, |A_g'|, |A_g u A_g'| (union re-trim) and |A_g n A_g'|
    (rho-ratio on the union sketch). Output one row per adjacent pair:
    (group, next_group, est_a, est_b, est_union, est_inter[4dp]) — every
    intermediate count and hash an exact integer.

    Everything here is sketch-sized: pairs x 2k rows at most, broadcast
    joins throughout — count-gated like :func:`kmv_pairwise_overlap`
    (the full G*k-row sketch set is what gets broadcast; adjacent pairs
    are only G rows but G itself is unbounded).
    """
    from ..operators.caching import scoped_persist

    s = scoped_persist(
        sketches.select(F.col(group_col).alias("g"), "h")
    )
    g1 = scoped_persist(s.select("g").distinct())
    ceiling = (
        MAX_BROADCAST_SKETCH_GROUPS
        if max_broadcast_groups is None
        else max_broadcast_groups
    )
    bcast = g1.count() <= ceiling
    groups = g1.withColumn("g2", next_of)
    pairs = (
        groups.join(
            g1.select(F.col("g").alias("__gx")),
            F.col("g2") == F.col("__gx"),
            "left_semi",
        )
    )
    return _kmv_pairs_overlap(s, pairs, k, bcast=bcast)


# Broadcast ceiling for the pair-overlap algebra: with G groups the sketch
# set is G*k rows and the pair frames are up to G(G-1)/2 rows — both are
# force-broadcast on the fast path. 2048 groups * k=64 = 131k sketch rows /
# ~2M pair rows, comfortably executor-sized; past it (a 100k-source corpus
# merge -> 5e9 pair rows) every forced broadcast would blow up silently, so
# the gate drops the hints and lets the joins shuffle on (g, g2) with AQE
# free to re-broadcast from MEASURED sizes (same policy as the LSH candidate
# gate, llm/dedup.py::MAX_BROADCAST_CANDIDATE_PAIRS).
MAX_BROADCAST_SKETCH_GROUPS = 2048


def kmv_pairwise_overlap(
    sketches: DataFrame,
    group_col: str,
    k: int = KMV_K,
    max_broadcast_groups: int = MAX_BROADCAST_SKETCH_GROUPS,
) -> DataFrame:
    """Distinct-set overlap between EVERY pair of groups (g < g2) from
    their KMV sketches — the cross-source contamination/overlap MATRIX a
    corpus merge runs first: which sources share content, and how much,
    before any row-level dedup is scheduled. Same estimator algebra as
    :func:`kmv_adjacent_overlap`; with G groups the whole computation is
    G(G-1)/2 pairs x 2k sketch rows — G=1000 sources is still only ~500k
    pair-rows of k-hash algebra, nothing data-sized.

    The broadcast hints are COUNT-GATED: one cheap ``count()`` over the
    distinct group list (the sketch frame is persisted, so this reads G
    rows) decides whether the sketch set and pair frames may be broadcast
    (G <= ``max_broadcast_groups``) or must shuffle on their keys — G is
    unbounded user input (one group per source/day/tenant) and a forced
    broadcast at G=100k would materialize G^2/2 pair rows on every executor.

    Output one row per unordered pair: (grp, next_grp, est_a, est_b,
    est_union, est_inter) — grp < next_grp."""
    from ..operators.caching import scoped_persist

    s = scoped_persist(
        sketches.select(F.col(group_col).alias("g"), "h")
    )
    g1 = scoped_persist(s.select("g").distinct())
    bcast = g1.count() <= max_broadcast_groups
    pairs = g1.join(
        g1.select(F.col("g").alias("g2")), F.col("g") < F.col("g2")
    )
    return _kmv_pairs_overlap(s, pairs, k, bcast=bcast)


def _kmv_pairs_overlap(
    s: DataFrame, pairs: DataFrame, k: int, bcast: bool = True
) -> DataFrame:
    """Shared pair algebra: per (g, g2) pair, union re-trim + rho-ratio
    intersection over the (g, h) sketch rows. ``pairs`` carries (g, g2);
    with ``bcast`` every frame here is pair x sketch sized and broadcast;
    callers whose group count exceeds their broadcast ceiling pass
    ``bcast=False`` and the same joins shuffle on their keys (AQE may still
    broadcast from runtime size estimates — only the plan-time force is
    dropped)."""
    from pyspark.sql import Window

    from ..operators.caching import scoped_persist

    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bcast else df

    a = s.select(F.col("g").alias("__ga"), F.col("h").alias("__ha"))
    b = s.select(F.col("g").alias("__gb"), F.col("h").alias("__hb"))
    merged = (
        pairs.join(_b(a), F.col("g") == F.col("__ga"))
        .select("g", "g2", F.col("__ha").alias("h"))
        .unionByName(
            pairs.join(_b(b), F.col("g2") == F.col("__gb"))
            .select("g", "g2", F.col("__hb").alias("h"))
        )
        .dropDuplicates(["g", "g2", "h"])
    )
    w = Window.partitionBy("g", "g2").orderBy("h")
    u = scoped_persist(
        merged.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
    )
    inter = (
        u.join(
            _b(a),
            (F.col("g") == F.col("__ga")) & (F.col("h") == F.col("__ha")),
            "left_semi",
        )
        .join(
            _b(b),
            (F.col("g2") == F.col("__gb")) & (F.col("h") == F.col("__hb")),
            "left_semi",
        )
        .groupBy("g", "g2")
        .agg(F.count(F.lit(1)).cast("long").alias("ni"))
    )
    def stats(df, gcol, n_name, k_name):
        return df.groupBy(F.col(gcol).alias("__g")).agg(
            F.count(F.lit(1)).cast("long").alias(n_name),
            F.max("h").alias(k_name),
        )

    sa = stats(s, "g", "na", "ka")
    ustats = u.groupBy("g", "g2").agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.max("h").alias("ku"),
    )
    out = (
        pairs.select("g", "g2")
        .join(_b(sa.select(F.col("__g").alias("g"), "na", "ka")), "g")
        .join(
            _b(
                sa.select(
                    F.col("__g").alias("g2"),
                    F.col("na").alias("nb"),
                    F.col("ka").alias("kb"),
                )
            ),
            "g2",
        )
        .join(_b(ustats), ["g", "g2"])
        .join(_b(inter), ["g", "g2"], "left")
        .select(
            F.col("g").alias("grp"),
            F.col("g2").alias("next_grp"),
            kmv_estimate_expr(F.col("na"), F.col("ka"), k).alias("est_a"),
            kmv_estimate_expr(F.col("nb"), F.col("kb"), k).alias("est_b"),
            kmv_estimate_expr(F.col("nu"), F.col("ku"), k).alias("est_union"),
            F.round(
                F.coalesce("ni", F.lit(0)).cast("double")
                / F.col("nu")
                * kmv_estimate_expr(F.col("nu"), F.col("ku"), k),
                4,
            ).alias("est_inter"),
        )
    )
    return out


def kmv_adjacent_overlap_sql(
    sketch_sql: str, group_col: str, next_expr: str, k: int = KMV_K
) -> str:
    """DuckDB mirror of ``kmv_adjacent_overlap``: ``sketch_sql`` yields
    (group, h, rk) rows (use ``kmv_by_sql``); ``next_expr`` maps the
    group column to its successor (e.g. ``g + INTERVAL 1 DAY`` spelled
    over the group expression)."""
    pairs = f"""
  SELECT g, g2 FROM (SELECT DISTINCT g, {next_expr} AS g2 FROM s)
  WHERE g2 IN (SELECT DISTINCT g FROM s)
"""
    return _kmv_pairs_overlap_sql(sketch_sql, group_col, pairs, k)


def kmv_pairwise_overlap_sql(
    sketch_sql: str, group_col: str, k: int = KMV_K
) -> str:
    """DuckDB mirror of ``kmv_pairwise_overlap`` (all unordered pairs)."""
    pairs = """
  SELECT a.g, b.g AS g2
  FROM (SELECT DISTINCT g FROM s) a JOIN (SELECT DISTINCT g FROM s) b
  ON a.g < b.g
"""
    return _kmv_pairs_overlap_sql(sketch_sql, group_col, pairs, k)


def _kmv_pairs_overlap_sql(
    sketch_sql: str, group_col: str, pairs_sql: str, k: int
) -> str:
    est_a = kmv_estimate_sql_expr("na", "ka", k)
    est_b = kmv_estimate_sql_expr("nb", "kb", k)
    est_u = kmv_estimate_sql_expr("nu", "ku", k)
    return f"""
WITH s AS (SELECT {group_col} AS g, h FROM ({sketch_sql})),
pairs AS (
{pairs_sql}
),
merged AS (
  SELECT DISTINCT p.g, p.g2, x.h
  FROM pairs p JOIN s x ON x.g = p.g OR x.g = p.g2
),
u AS (
  SELECT g, g2, h FROM (
    SELECT g, g2, h, row_number() OVER (PARTITION BY g, g2 ORDER BY h) AS rk
    FROM merged
  ) WHERE rk <= {k}
),
istat AS (
  SELECT u.g, u.g2, CAST(count(*) AS BIGINT) AS ni
  FROM u
  WHERE EXISTS (SELECT 1 FROM s a WHERE a.g = u.g AND a.h = u.h)
    AND EXISTS (SELECT 1 FROM s b WHERE b.g = u.g2 AND b.h = u.h)
  GROUP BY u.g, u.g2
),
gstat AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n, max(h) AS kh FROM s GROUP BY g
),
ustat AS (
  SELECT g, g2, CAST(count(*) AS BIGINT) AS nu, max(h) AS ku
  FROM u GROUP BY g, g2
)
SELECT p.g AS grp, p.g2 AS next_grp,
       {est_a} AS est_a, {est_b} AS est_b, {est_u} AS est_union,
       round(coalesce(i.ni, 0) / CAST(nu AS DOUBLE) * {est_u}, 4) AS est_inter
FROM pairs p
JOIN (SELECT g, n AS na, kh AS ka FROM gstat) ga ON ga.g = p.g
JOIN (SELECT g AS gg2, n AS nb, kh AS kb FROM gstat) gb ON gb.gg2 = p.g2
JOIN ustat us ON us.g = p.g AND us.g2 = p.g2
LEFT JOIN istat i ON i.g = p.g AND i.g2 = p.g2
"""



def sampled_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    val_col: str | Column,
    id_col: str | Column,
    probs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    k: int = 1024,
) -> DataFrame:
    """Per-GROUP quantiles from deterministic k-row samples — the grouped
    form of ``sampled_quantiles`` (per-source price spreads, per-day
    latency percentiles) with the ``kmv_sketch_by`` build: a scan-local
    mapInPandas keeps each (partition, group)'s k rows with the smallest
    id-hash (bounded G*k state, value rides as payload), the merge ranks
    only candidate rows per group (shuffled by GROUP, never the corpus),
    and nearest-rank-lower picks verbatim data values per group.

    Returns (group..., p, sample_n, q_value). Ties rank by (h, v) in the
    sample trim and (v, h) in the quantile rank — both total orders, so
    the result is a pure function of the data.
    """
    from pyspark.sql import Window

    from ..llm.curation import md5_bucket
    from ..operators.caching import scoped_persist

    v = F.col(val_col) if isinstance(val_col, str) else val_col
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    gc = list(group_cols)
    hashed = df.select(
        *gc, v.alias("v"), md5_bucket(i, KMV_HEX_DIGITS).alias("h")
    ).where(F.col("v").isNotNull() & F.col("h").isNotNull())

    def _partial(it):
        for pdf in it:
            yield (
                pdf.sort_values(["h", "v"])
                .groupby(gc, sort=False, dropna=False)
                .head(k)
            )

    partial = hashed.mapInPandas(_partial, schema=hashed.schema)
    wtrim = Window.partitionBy(*gc).orderBy("h", "v")
    samp = scoped_persist(
        partial.withColumn("__rk", F.row_number().over(wtrim))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
    wrank = Window.partitionBy(*gc).orderBy("v", "h")
    ranked = samp.withColumn("rk", F.row_number().over(wrank))
    n = samp.groupBy(*gc).agg(F.count(F.lit(1)).cast("long").alias("sample_n"))
    pr = local_df(df.sparkSession, [(float(p),) for p in probs], "p double")
    tgt = n.crossJoin(F.broadcast(pr)).withColumn(
        "idx", F.floor((F.col("sample_n") - 1) * F.col("p")) + 1
    )
    cond = [tgt[c] == ranked[c] for c in gc] + [tgt["idx"] == ranked["rk"]]
    return tgt.join(F.broadcast(ranked), cond).select(
        *[tgt[c] for c in gc], "p", "sample_n", F.col("v").alias("q_value")
    )


def sampled_quantiles_by_sql(
    val_expr: str,
    id_expr: str,
    group_exprs: list[str],
    from_sql: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    k: int = 1024,
) -> str:
    """DuckDB mirror of ``sampled_quantiles_by`` — identical fold, trim
    order (h, v), rank order (v, h), and index arithmetic."""
    from ..llm.curation import md5_bucket_sql

    g = ", ".join(group_exprs)
    gn = ", ".join(f"n.{c}" for c in group_exprs)
    gjoin = " AND ".join(f"r.{c} = n.{c}" for c in group_exprs)
    fold = md5_bucket_sql(id_expr, KMV_HEX_DIGITS)
    plist = ", ".join(f"CAST({float(p)!r} AS DOUBLE)" for p in probs)
    return f"""
WITH s AS (
  SELECT {g}, v, h FROM (
    SELECT {g}, {val_expr} AS v, {fold} AS h,
           row_number() OVER (PARTITION BY {g} ORDER BY {fold}, {val_expr})
             AS trk
    FROM {from_sql}
    WHERE {val_expr} IS NOT NULL AND {fold} IS NOT NULL
  ) WHERE trk <= {k}
),
r AS (
  SELECT {g}, v,
         row_number() OVER (PARTITION BY {g} ORDER BY v, h) AS rk
  FROM s
),
n AS (SELECT {g}, CAST(count(*) AS BIGINT) AS sample_n FROM s GROUP BY {g}),
p AS (SELECT unnest([{plist}]) AS p)
SELECT {gn}, p.p, n.sample_n, r.v AS q_value
FROM n CROSS JOIN p
JOIN r ON {gjoin}
      AND r.rk = CAST(floor((n.sample_n - 1) * p.p) AS BIGINT) + 1
"""



def winsorize_stats_by(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    id_col: str | Column,
    lo: float = 0.05,
    hi: float = 0.95,
    k: int = 1024,
) -> DataFrame:
    """Per-group winsorization audit: clip ``val_col`` to the group's
    sampled [lo, hi] quantile bounds (``sampled_quantiles_by`` — the
    deterministic k-min sample, so the bounds are verbatim data values)
    and report per group

        (group..., n, n_clipped_low, n_clipped_high, lo_v, hi_v, sum_w)

    — the outlier-handling pass a feature/reward pipeline runs before
    normalizing heavy-tailed columns, shipped as its AUDIT aggregate so
    the contract surface stays exact: counts are integers, bounds are
    data values, and the winsorized sum is a DECIMAL(18,2) (exact,
    order-independent — a double sum at 1e8 magnitude could not be
    rounded into cross-engine agreement).

    Shape at scale: the quantile pass (one scan, corpus never shuffles) +
    one broadcast join of the per-group bounds onto the second scan +
    a map-side-combinable aggregate. Two scans total, no sorts.

    NULL ``val_col`` rows are EXCLUDED everywhere — the quantile sample
    already skips them, and the clip aggregate filters them before
    counting (ADVICE r7: previously they inflated ``n`` and, because
    least/greatest skip NULLs, silently entered ``sum_w`` as ``lo_v`` —
    an engine-version-sensitive accident, not a contract).

    Output-shape consequence (ADVICE r8): a group whose ``val_col`` is
    entirely NULL has no quantile sample and no surviving rows, so it
    produces NO output row at all — consumers that need one row per input
    group should left-join this result back onto the distinct group keys.
    """
    from ..operators.caching import scoped_persist

    gc = list(group_cols)
    qs = scoped_persist(
        sampled_quantiles_by(df, gc, val_col, id_col, probs=(lo, hi), k=k)
    )
    b = qs.groupBy(*gc).agg(
        F.max(F.when(F.col("p") == lo, F.col("q_value"))).alias("lo_v"),
        F.max(F.when(F.col("p") == hi, F.col("q_value"))).alias("hi_v"),
    )
    v = F.col(val_col)
    j = df.filter(v.isNotNull()).join(F.broadcast(b), gc)
    clipped = F.least(F.greatest(v, F.col("lo_v")), F.col("hi_v"))
    return j.groupBy(*gc).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((v < F.col("lo_v")).cast("long")).alias("n_clipped_low"),
        F.sum((v > F.col("hi_v")).cast("long")).alias("n_clipped_high"),
        F.max("lo_v").alias("lo_v"),
        F.max("hi_v").alias("hi_v"),
        F.sum(clipped.cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_w"),
    )


def winsorize_stats_by_sql(
    val_expr: str,
    id_expr: str,
    group_exprs: list[str],
    from_sql: str,
    lo: float = 0.05,
    hi: float = 0.95,
    k: int = 1024,
) -> str:
    """DuckDB mirror of ``winsorize_stats_by`` — bounds from the same
    generated quantile SQL, identical clip and decimal-exact sum."""
    g = ", ".join(group_exprs)
    q = sampled_quantiles_by_sql(
        val_expr, id_expr, group_exprs, from_sql, probs=(lo, hi), k=k
    )
    return f"""
WITH q AS ({q}),
b AS (
  SELECT {g},
         max(CASE WHEN p = CAST({float(lo)!r} AS DOUBLE) THEN q_value END)
           AS lo_v,
         max(CASE WHEN p = CAST({float(hi)!r} AS DOUBLE) THEN q_value END)
           AS hi_v
  FROM q GROUP BY {g}
)
SELECT {g}, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN {val_expr} < lo_v THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(sum(CASE WHEN {val_expr} > hi_v THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high,
       max(lo_v) AS lo_v, max(hi_v) AS hi_v,
       CAST(sum(CAST(least(greatest({val_expr}, lo_v), hi_v)
                     AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_w
FROM {from_sql} JOIN b USING ({g})
WHERE {val_expr} IS NOT NULL
GROUP BY {g}
"""
