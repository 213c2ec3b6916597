"""W1-W4 + C4: the reference's order-dependent operators.

In the reference these are stateful single-threaded generators whose semantics
depend on stream order (SURVEY.md §2.8). The engine convention (§7.4): every
source stamps an explicit ``__ord`` column; each operator here takes the order
column explicitly and is deterministic under any partitioning.

Scale note: ``Window.orderBy`` without partitionBy is a single-partition sort —
fine for the reference-sized resources these mirror (thousands of rows), wrong
for 100 TB facts. Key-partitioned operators (first_seen_dedup, dedup_suffix)
sort only within key groups, which scales. The global-order ones (forward_fill,
add_ordinal) each carry a *distributed* two-phase strategy for fact-sized data:
``repartitionByRange`` on the order column gives globally-ordered partition
ranges with parallel intra-partition sorts; a driver-side pass over one tiny
summary row per partition (counts for ordinal, last-non-null for fill) splices
the partitions together; no single-partition exchange anywhere. ``auto`` picks
the strategy from the input's partition count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .caching import scoped_persist
from .._serde import register_self_contained

register_self_contained(__name__)


ORD = "__ord"

# auto-routing bound: at/below this many input partitions the data is
# dimension-sized and the plain global window is cheaper than two extra jobs
AUTO_PARTITION_THRESHOLD = 4

# running_totals auto-routing bound, in ROWS (its inputs are usually
# post-aggregation frames whose partition count is just shuffle.partitions,
# so partition count carries no size signal there): at/below this the plain
# window path wins — a few-million-row sort on one task is milliseconds
# next to the two-phase plan's extra jobs; above it, two-phase
AUTO_ROWS_THRESHOLD = 2_000_000

# fail-fast bound on the two-phase driver summary (one row per physical
# partition per group): beyond this the offsets closure stops being "tiny"
MAX_SUMMARY_ROWS = 200_000


def stamp_ord(df: DataFrame, order_by: list[Column | str] | None = None) -> DataFrame:
    """Stamp the engine's monotonic order column. With ``order_by``, a
    row_number over that order (single-partition — use on dimension-sized
    data); without, ``monotonically_increasing_id`` preserves file/partition
    order without any shuffle (the scalable default for sources)."""
    if order_by:
        w = Window.orderBy(*order_by)
        return df.withColumn(ORD, F.row_number().over(w).cast("long") - 1)
    return df.withColumn(ORD, F.monotonically_increasing_id())


def _ranged_by(df: DataFrame, order_col: str, num_partitions: int | None) -> DataFrame:
    """Range-exchange on ``order_col`` + parallel intra-partition sorts: a
    total order across partition boundaries without a global sort. The frame
    is scoped-persisted because both the summary pass and the output job read
    it — the persist pins one consistent range assignment for both."""
    spark = df.sparkSession
    npart = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return scoped_persist(
        df.repartitionByRange(npart, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
    )


def forward_fill(
    df: DataFrame,
    col: str,
    order_col: str = ORD,
    partition_by: list[str] | None = None,
    strategy: str = "auto",
    num_partitions: int | None = None,
) -> DataFrame:
    """W1: col := last non-null seen in order (flows/datasets.py:303-309
    forward-fills chart_title). ``partition_by`` bounds the window for scale
    when fill never crosses a key boundary (always the window path).

    Without ``partition_by``, ``strategy`` routes the global fill:
    ``'window'`` (single-partition global sort — dimension data),
    ``'distributed'`` (two-phase: per-range-partition vectorized ffill +
    driver-side splice of one last-non-null summary row per partition), or
    ``'auto'`` (distributed when the input has more than
    ``AUTO_PARTITION_THRESHOLD`` partitions)."""
    if partition_by:
        w = (
            Window.partitionBy(*partition_by)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(col, F.last(col, ignorenulls=True).over(w))
    if strategy == "auto":
        strategy = (
            "distributed"
            if df.rdd.getNumPartitions() > AUTO_PARTITION_THRESHOLD
            else "window"
        )
    if strategy == "window":
        w = (
            Window.partitionBy(F.lit(1))
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(col, F.last(col, ignorenulls=True).over(w))
    if strategy != "distributed":
        raise ValueError(f"unknown forward_fill strategy {strategy!r}")
    return _forward_fill_distributed(df, col, order_col, num_partitions)


def _forward_fill_distributed(
    df: DataFrame, col: str, order_col: str, num_partitions: int | None
) -> DataFrame:
    """Two-phase global forward fill, no single-partition exchange.

    Phase 1 (tiny): one summary row per range partition — its last non-null
    value — collected to the driver; a prefix scan turns those into the seed
    value each partition inherits from everything before it. Phase 2: a
    vectorized pandas ``ffill`` per partition (mapInPandas, Arrow batches,
    carry maintained across batches) seeded from the broadcast dict."""
    import pandas as pd

    ranged = _ranged_by(df, order_col, num_partitions)
    out_fields = df.schema.fields
    col_field = df.schema[col]

    summary_schema = (
        f"__pid int, v {col_field.dataType.simpleString()}"
    )

    def summarize(batches):
        pid, last = None, None
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["__pid"].iloc[0])
            nn = pdf[col].dropna()
            if len(nn):
                last = nn.iloc[-1]
        if pid is not None:
            yield pd.DataFrame({"__pid": [pid], "v": [last]})

    rows = ranged.select("__pid", col).mapInPandas(summarize, summary_schema).collect()
    last_by_pid = {r["__pid"]: r["v"] for r in rows}
    seeds: dict[int, object] = {}
    carry = None
    for p in sorted(last_by_pid):
        seeds[p] = carry
        if last_by_pid[p] is not None:
            carry = last_by_pid[p]

    out_schema_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields
    )
    out_cols = [f.name for f in out_fields]

    def fill(batches):
        carry = None
        seeded = False
        for pdf in batches:
            if not len(pdf):
                continue
            if not seeded:
                carry = seeds.get(int(pdf["__pid"].iloc[0]))
                seeded = True
            orig = pdf[col]
            filled = orig.ffill()
            if carry is not None:
                filled = filled.fillna(carry)
            nn = orig.dropna()
            if len(nn):
                carry = nn.iloc[-1]
            pdf = pdf.copy()
            pdf[col] = filled
            yield pdf[out_cols]

    return ranged.mapInPandas(fill, out_schema_ddl)


def dedup_suffix(
    df: DataFrame, key: str, order_col: str = ORD, out: str | None = None
) -> DataFrame:
    """W2: 2nd+ occurrence of ``key`` gets suffix .1, .2, ... in stream order
    (flows/organisations.py:44-52 suffixes duplicate entity_ids). Partitioned
    by key -> scales; sort only within duplicate groups."""
    out = out or key
    w = Window.partitionBy(key).orderBy(order_col)
    rn = F.row_number().over(w)
    return df.withColumn(
        out,
        F.when(rn > 1, F.concat(F.col(key).cast("string"), F.lit("."), (rn - 1).cast("string")))
        .otherwise(F.col(key).cast("string")),
    )


def add_ordinal(
    df: DataFrame,
    name: str = "order_index",
    order_col: str = ORD,
    start: int = 0,
    strategy: str = "auto",
    num_partitions: int | None = None,
) -> DataFrame:
    """C4/W3: global ordinal (flows/datasets.py:341 ``order_index = i``).

    ``strategy='window'``: global ``row_number`` — a single-partition sort,
    right for dimension-sized resources. ``'distributed'``: two-phase —
    range-exchange on ``order_col`` (globally-ordered partition ranges,
    parallel sorts), per-partition row index from the low 33 bits of
    ``monotonically_increasing_id``, and a driver-side cumulative sum over
    one count per partition spliced back as a map literal. No
    single-partition exchange; scales to fact tables. ``'auto'`` picks
    distributed when the input has more than ``AUTO_PARTITION_THRESHOLD``
    partitions. Deterministic whenever ``order_col`` is unique (the engine's
    ``__ord`` convention guarantees that)."""
    if strategy == "auto":
        strategy = (
            "distributed"
            if df.rdd.getNumPartitions() > AUTO_PARTITION_THRESHOLD
            else "window"
        )
    if strategy == "window":
        w = Window.orderBy(order_col)
        return df.withColumn(name, F.row_number().over(w).cast("long") - 1 + start)
    if strategy != "distributed":
        raise ValueError(f"unknown add_ordinal strategy {strategy!r}")

    ranged = _ranged_by(df, order_col, num_partitions)
    counts = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = start
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    omap = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in (kv[0], int(kv[1]))]
    )
    intra = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
    return (
        ranged.withColumn(name, (F.element_at(omap, F.col("__pid")) + intra).cast("long"))
        .drop("__pid")
    )


def first_seen_dedup(
    df: DataFrame, keys: list[str], order_col: str = ORD
) -> DataFrame:
    """W4/R3: first row per key wins (flows/broken_links.py:34-43 emits each
    URL once, keeping the first carrying row). Partitioned by key — scales to
    arbitrary data; map-side partial via AQE skew handling."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def explode_dedup(
    df: DataFrame,
    array_col: str,
    out_col: str,
    order_col: str = ORD,
    keep: list[str] | None = None,
) -> DataFrame:
    """R3 ``unwind``: one row per element of ``array_col``, each distinct value
    emitted once globally, first carrying row wins (broken_links.py:34-43)."""
    exploded = df.select(
        *(keep or [c for c in df.columns if c != array_col]),
        F.explode(array_col).alias(out_col),
    )
    return first_seen_dedup(exploded, [out_col], order_col=order_col)


def _order_specs(order_by) -> list[tuple[str, str]]:
    """Normalize order_by items (``"col"`` or ``("col", "asc"|"desc")``)."""
    out = []
    for s in order_by:
        name, direction = (s, "asc") if isinstance(s, str) else s
        if direction not in ("asc", "desc"):
            raise ValueError(f"order direction must be asc/desc, got {direction!r}")
        out.append((name, direction))
    return out


def running_totals(
    df: DataFrame,
    value_col: str,
    order_by,
    partition_by: list[str] | None = None,
    cum_col: str = "cum",
    rank_col: str | None = None,
    num_partitions: int | None = None,
    strategy: str = "auto",
    auto_rows_threshold: int | None = None,
) -> DataFrame:
    """Distributed running sum (and optional rank).

    ``strategy``:
      * ``'auto'`` (default) — persist the input, count it (one bounded
        scalar; the persisted frame feeds whichever path wins, so the count
        pass is the only evaluation of the upstream plan), and route:
        at/below ``auto_rows_threshold`` rows (default
        ``AUTO_ROWS_THRESHOLD``) the plain window is strictly cheaper —
        the two-phase form pays a range-exchange sampling pass, a summary
        collect, and a mapInPandas Arrow round-trip that dominate on
        dimension-sized inputs (measured 3.2-4.3s vs <1s at sf0.1 on the
        value-histogram callers) — above it, the two-phase plan below.
      * ``'window'`` — ``Window.partitionBy(partition_by).orderBy(...)``;
        with no/low-cardinality ``partition_by`` this funnels each group
        through one task: only for bounded inputs.
      * ``'two_phase'`` (alias ``'distributed'``) — never sorts a group on
        one task; the scale path:

    Phase 1: range-exchange on ``(partition_by, order_by)`` — globally ordered
    partition ranges, parallel intra-partition sorts — then ONE tiny summary
    row per ``(physical partition, group)``: its sum and count. A driver-side
    prefix scan over that bounded frame (``num_partitions × groups`` rows)
    yields the offset each partition inherits from everything ordered before
    it within its group. The collect is guarded by ``MAX_SUMMARY_ROWS`` —
    a high-cardinality ``partition_by`` would make it unbounded, and for
    that shape a plain ``Window.partitionBy`` already scales (many small
    groups spread across tasks), so the guard raises with that advice
    rather than silently shipping an enormous offsets closure.

    Phase 2: a vectorized pandas cumsum per partition (mapInPandas, Arrow
    batches, per-group carry maintained across batches) seeded from the
    broadcast offset dict. ``rank_col`` rides along as offset-count +
    intra-partition position — a ``row_number`` that never sorts on one task.

    Requirements: ``order_by`` (with ``partition_by``) must totally order the
    rows for a deterministic rank; group/order/value columns must be non-null.
    Float caveat: the cumsum associates per-partition-then-offset, so double
    sums can differ from a strict sequential scan in the last ulps — same
    class of noise as any partial aggregate.
    """
    import numpy as np

    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
    )

    partition_by = list(partition_by or [])
    specs = _order_specs(order_by)
    spark = df.sparkSession
    npart = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )

    integral = isinstance(
        df.schema[value_col].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )

    if strategy == "auto":
        from .caching import scoped_persist as _persist

        bound = (
            AUTO_ROWS_THRESHOLD
            if auto_rows_threshold is None
            else auto_rows_threshold
        )
        df = _persist(df)
        strategy = "window" if df.count() <= bound else "two_phase"
    if strategy == "window":
        ocols = [
            F.col(n).desc() if d == "desc" else F.col(n).asc()
            for n, d in specs
        ]
        w = (
            Window.partitionBy(*partition_by).orderBy(*ocols)
            if partition_by
            else Window.orderBy(*ocols)
        )
        v = F.col(value_col).cast("long" if integral else "double")
        out = df.withColumn(
            cum_col,
            F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        if rank_col:
            out = out.withColumn(
                rank_col, F.row_number().over(w).cast("long")
            )
        return out
    if strategy not in ("two_phase", "distributed"):
        raise ValueError(f"unknown running_totals strategy {strategy!r}")

    cum_ddl = "bigint" if integral else "double"
    work = df.withColumn(
        "__v", F.col(value_col).cast("long" if integral else "double")
    )

    keys = [F.col(c).asc() for c in partition_by] + [
        F.col(n).desc() if d == "desc" else F.col(n).asc() for n, d in specs
    ]
    ranged = scoped_persist(
        work.repartitionByRange(npart, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("__pid", F.spark_partition_id())
    )

    summary_df = ranged.groupBy("__pid", *partition_by).agg(
        F.sum("__v").alias("__s"), F.count(F.lit(1)).alias("__c")
    )
    summary = summary_df.limit(MAX_SUMMARY_ROWS + 1).collect()
    if len(summary) > MAX_SUMMARY_ROWS:
        raise ValueError(
            f"running_totals: two-phase summary exceeds {MAX_SUMMARY_ROWS} "
            "rows — partition_by is high-cardinality, and for that shape a "
            "plain Window.partitionBy already scales (many small groups "
            "spread across tasks); use it instead of the two-phase plan"
        )
    per_group: dict[tuple, list] = {}
    for r in summary:
        per_group.setdefault(
            tuple(r[c] for c in partition_by), []
        ).append((r["__pid"], r["__s"], r["__c"]))
    offsets: dict[tuple, tuple] = {}
    for g, rows in per_group.items():
        s_acc, c_acc = (0 if integral else 0.0), 0
        for pid, s, c in sorted(rows):
            offsets[(pid,) + g] = (s_acc, c_acc)
            s_acc += s
            c_acc += c

    out_fields = list(df.schema.fields)
    out_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields
    )
    out_ddl += f", `{cum_col}` {cum_ddl}"
    if rank_col:
        out_ddl += f", `{rank_col}` bigint"
    out_cols = [f.name for f in out_fields]
    gcols = list(partition_by)

    def scan(batches):
        state: dict[tuple, list] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["__pid"].iloc[0])
            n = len(pdf)
            cum = np.empty(n, dtype=np.int64 if integral else np.float64)
            rk = np.empty(n, dtype=np.int64)
            if gcols:
                groups = pdf.groupby(gcols, sort=False).indices.items()
            else:
                groups = [((), np.arange(n))]
            for key, idx in groups:
                k = key if isinstance(key, tuple) else (key,)
                if not gcols:
                    k = ()
                if k not in state:
                    state[k] = list(
                        offsets.get((pid,) + k, (0 if integral else 0.0, 0))
                    )
                s0, c0 = state[k]
                cs = pdf["__v"].values[idx].cumsum() + s0
                cum[idx] = cs
                rk[idx] = np.arange(1, len(idx) + 1) + c0
                state[k] = [cs[-1], c0 + len(idx)]
            out = pdf[out_cols].copy()
            out[cum_col] = cum
            if rank_col:
                out[rank_col] = rk
            yield out

    return ranged.mapInPandas(scan, out_ddl)


def bounded_running(
    df: DataFrame,
    order_by,
    value_col: str | None = None,
    cum_col: str = "cum",
    rank_col: str | None = None,
) -> DataFrame:
    """Running rank/cumsum for PROVABLY BOUNDED frames (a post-``limit`` top-K,
    a score-bucket histogram, a calendar-day aggregate — ≤ ~10⁴ rows by
    construction) with no empty-partition WindowExec: each row's rank is the
    count of rows at-or-before it in the total order, its cum the sum of
    their values, computed by ONE broadcast self-join whose O(n²) comparisons
    spread across all tasks. Use ``running_totals`` for anything fact-sized.

    Requirements: ``order_by`` must totally order (uniquely key) the frame —
    the before-or-equal predicate then matches the current row exactly once —
    and the order columns must be non-null.
    """
    specs = _order_specs(order_by)
    ocols = [n for n, _ in specs]
    b_cols = list(dict.fromkeys(ocols + ([value_col] if value_col else [])))
    a = df.alias("__a")
    b = F.broadcast(df.select(*b_cols).alias("__b"))

    cond = None
    eqs = None
    for name, direction in specs:
        a_c, b_c = F.col(f"__a.{name}"), F.col(f"__b.{name}")
        strict = (b_c > a_c) if direction == "desc" else (b_c < a_c)
        clause = strict if eqs is None else eqs & strict
        cond = clause if cond is None else cond | clause
        eq = a_c == b_c
        eqs = eq if eqs is None else eqs & eq
    cond = cond | eqs  # before-or-equal: includes the current row once

    aggs = []
    if rank_col:
        aggs.append(
            F.count(F.col(f"__b.{ocols[0]}")).cast("long").alias(rank_col)
        )
    if value_col:
        aggs.append(F.sum(F.col(f"__b.{value_col}")).alias(cum_col))
    if not aggs:
        raise ValueError("bounded_running needs rank_col and/or value_col")
    return a.join(b, cond, "inner").groupBy(
        *[F.col(f"__a.{c}").alias(c) for c in df.columns]
    ).agg(*aggs)



def ewma_by(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    val_col: str,
    alpha: float = 0.25,
    window: int = 8,
) -> DataFrame:
    """Bounded-window exponentially-weighted moving average per key — the
    smoothing pass metric/anomaly monitors run over a value stream:

        ewma_t = sum_{j=0..m-1} (1-a)^j x_{t-j} / sum_{j=0..m-1} (1-a)^j

    with m = min(window, rows so far). The window bound is what makes
    this a WINDOW FUNCTION instead of a prefix scan: the full recurrence
    needs running state (the streaming side owns that shape); the bounded
    form is one frame aggregate, embarrassingly parallel per key, and the
    tail weights it drops are (1-a)^window — under 1e-1 of the mass at
    the defaults and documented rather than hidden.

    Engine shape: collect_list over rowsBetween(-(window-1), 0) — frame
    order IS the ORDER BY order, so the list runs oldest->newest — then
    one higher-order fold per row (m <= window terms); the denominator is
    the closed form (1 - q^m)/(1 - q). No shuffle beyond the one
    partitionBy(key) exchange every keyed window pays. Adds ``ewma``
    (6dp; the weights are float — identical IEEE pow/mul both engines
    round well inside 6dp at these magnitudes).

    NULL ``val_col`` semantics (ADVICE r7): NULL observations are
    EXCLUDED from the frame — the average runs over the non-null values
    of the last ``window`` rows, m counts only those, and a frame with
    no non-null values yields ewma NULL (try_divide) rather than a
    division error. The generated mirror applies the same list_filter,
    so both engines agree on nullable streams.
    """
    from pyspark.sql import Window

    q = 1.0 - alpha
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.collect_list(F.col(val_col).cast("double")).over(w)
    m = F.size("__arr")
    num = F.aggregate(
        F.zip_with(
            F.col("__arr"),
            F.sequence(F.lit(1), m),
            lambda x, i: x * F.pow(F.lit(q), (m - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    den = (F.lit(1.0) - F.pow(F.lit(q), m.cast("double"))) / F.lit(1.0 - q)
    return (
        df.withColumn("__arr", arr)
        # try_divide: an all-NULL frame gives m=0 -> den=0; ANSI division
        # would throw, NULL is the contract (see docstring)
        .withColumn(
            # explicit IEEE half-up (floor(x*1e6 + 0.5)/1e6), NOT
            # F.round(double, 6): Spark rounds the double's shortest decimal
            # repr, so an ...xxxxxx5 shortest repr reads as an exact half and
            # rounds up while DuckDB's multiply sees the true binary just
            # below it — the ~1e-7/row flip the sf0.1 parity gate measured
            # on streaming_ewma (PARITY r12); same contract both operators
            "ewma",
            F.floor(F.try_divide(num, den) * F.lit(1000000.0) + F.lit(0.5))
            / F.lit(1000000.0),
        )
        .drop("__arr")
    )


def ewma_by_sql(
    from_sql: str,
    group_cols: list[str],
    order_cols: list[str],
    val_expr: str,
    alpha: float = 0.25,
    window: int = 8,
) -> str:
    """DuckDB mirror of ``ewma_by`` — same frame, same left-to-right
    weighted fold (list_sum of the transformed frame list is sequential),
    same closed-form denominator. NULL observations are list_filtered
    out of the frame before weighting (Spark's collect_list drops them
    implicitly — ADVICE r7), and an all-NULL frame yields NULL via
    nullif on the denominator."""
    q = repr(1.0 - alpha)
    g = ", ".join(group_cols)
    o = ", ".join(order_cols)
    return f"""
WITH a AS (
  SELECT *, array_agg(CAST({val_expr} AS DOUBLE)) OVER (
              PARTITION BY {g} ORDER BY {o}
              ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW
            ) AS arr
  FROM {from_sql}
),
fa AS (
  SELECT * EXCLUDE (arr),
         list_filter(arr, x -> x IS NOT NULL) AS fl
  FROM a
)
SELECT * EXCLUDE (fl),
       floor(
         list_sum(list_transform(list_zip(fl, generate_series(1, len(fl))),
           t -> t[1] * power(CAST({q} AS DOUBLE),
                             CAST(len(fl) - t[2] AS DOUBLE))))
         / nullif((1 - power(CAST({q} AS DOUBLE), CAST(len(fl) AS DOUBLE)))
                  / CAST({repr(1.0 - (1.0 - alpha))} AS DOUBLE), 0)
         * 1000000.0 + 0.5) / 1000000.0 AS ewma
FROM fa
"""


def interpolate_linear(
    df: DataFrame,
    col: str,
    x_col: str,
    partition_by: list[str],
    order_by: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Per-key LINEAR interpolation of NULL gaps — the numeric companion to
    ``forward_fill`` (W1): an interior NULL is replaced by the value on the
    straight line between its nearest non-null neighbours, weighted by the
    numeric ``x_col`` (typically epoch time), not by row position.

        v = v_prev + (v_next - v_prev) * (x - x_prev) / (x_next - x_prev)

    Contract: only INTERIOR gaps fill — leading/trailing NULLs (no
    neighbour on one side) stay NULL; a degenerate bracket with
    x_next = x_prev (duplicate x) holds the previous value (the limit from
    the left). Non-null rows pass through bit-unchanged.

    Shape at scale: two frames over ONE per-key sort (last-non-null
    looking back, first-non-null looking forward share the same window
    ordering, so Spark plans a single exchange + sort); the interpolation
    itself is one IEEE-double expression in a canonical order, mirrored
    verbatim by DuckDB's IGNORE NULLS window mirror in the registered
    oracle. No joins, nothing collected."""
    order = [F.col(c) for c in (order_by or [x_col])]
    wprev = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(col)
    x = F.col(x_col).cast("double")
    xn = F.when(v.isNotNull(), F.col(x_col)).cast("double")
    pv = F.last(v, ignorenulls=True).over(wprev)
    px = F.last(xn, ignorenulls=True).over(wprev)
    nv = F.first(v, ignorenulls=True).over(wnext)
    nx = F.first(xn, ignorenulls=True).over(wnext)
    den = nx - px
    interp = pv + (nv - pv) * ((x - px) / den)
    filled = (
        F.when(v.isNotNull(), v)
        .when(pv.isNotNull() & nv.isNotNull() & (den != 0), interp)
        .when(pv.isNotNull() & nv.isNotNull(), pv)
    )
    return df.withColumn(out_col or col, filled)


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    max_len: int = 5,
    top_k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Top-K session paths — the clickstream "what do journeys look like"
    primitive: sessionize by inactivity gap (same lag+cumsum contract as
    ``streaming/windows.sessionize``), take each session's first
    ``max_len`` event types in (ts, event_id) order, join them into a
    path string, and return the ``top_k`` most frequent paths with
    deterministic ranks (count DESC, path ASC).

    Shape at scale: TWO per-user linear passes — one exchange+sort on
    (user) for the session-boundary lag/cumsum, one on (user, session)
    for the within-session row_number (the second sort is a re-sort of
    already-user-clustered rows; AQE coalesces the exchange). The truncated
    path assembly is a groupBy over (user, session) carrying at most
    ``max_len`` small structs per session; path counting is a map-side-
    combinable groupBy on the path string; the final top-K is
    TakeOrderedAndProject (per-partition heaps, no global sort), ranked by
    ``bounded_running``'s broadcast self-join on the K-row frame — no
    single-partition WindowExec anywhere."""
    from ..streaming.windows import _ensure_event_time

    events = _ensure_event_time(events)
    wu = Window.partitionBy(user_col).orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev_us = F.unix_micros(F.lag("ts").over(wu))
    ts_us = F.unix_micros(F.col("ts"))
    new_s = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = events.withColumn(
        "__sid", F.sum(new_s).over(wsum).cast("long")
    )
    wr = Window.partitionBy(user_col, "__sid").orderBy("ts", "event_id")
    truncated = (
        sess.withColumn("__rn", F.row_number().over(wr))
        .where(F.col("__rn") <= max_len)
    )
    paths = (
        truncated.groupBy(user_col, "__sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__rn"), F.col(type_col)))
                    ),
                    lambda s: s[type_col],
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )
    top = scoped_persist(
        paths.orderBy(F.col("n_sessions").desc(), F.col("path")).limit(top_k)
    )
    ranked = bounded_running(
        top,
        [("n_sessions", "desc"), ("path", "asc")],
        rank_col="rank",
    )
    return ranked.select(
        "path", "n_sessions", F.col("rank").cast("long").alias("rank")
    ).orderBy("rank")


def session_paths_sql(
    gap_minutes: int = 30,
    max_len: int = 5,
    top_k: int = 20,
    table: str = "events",
) -> str:
    """Generated DuckDB mirror of ``session_paths`` (same session contract
    as the session_windows_events oracle)."""
    return f"""
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL {gap_minutes} MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM {table}
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
), r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, sid
                               ORDER BY ts, event_id) AS rn
  FROM s
), p AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= {max_len} GROUP BY user_id, sid
), c AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p GROUP BY path
)
SELECT path, n_sessions,
       CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rank
FROM c ORDER BY n_sessions DESC, path LIMIT {top_k}
"""


def attribution_report(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """First-touch / last-touch conversion attribution — the marketing
    question ``funnel_events_users`` doesn't answer: when a conversion
    fires, WHICH earlier channel gets the credit? For every conversion
    event, last-touch credits the most recent strictly-earlier
    non-conversion event of the same user, first-touch the earliest one;
    users converting with no prior touch credit the 'direct' channel.
    Output: one row per (attribution, channel) with conversion count and
    total converted value in cents.

    Shape at scale: BOTH carried channels (running last + running first
    of the non-conversion types) share ONE per-user exchange+sort — the
    frames are identical (unbounded preceding .. 1 preceding), so
    Catalyst folds them into a single Window node (plan-tested); each
    conversion row then EXPLODES into its two (mode, channel) credits and
    one map-side-combinable groupBy counts them — no union, so the window
    subtree is never duplicated. Deterministic: window order is
    (ts, event_id) — a total order."""
    from ..streaming.windows import _ensure_event_time

    events = _ensure_event_time(events)
    w = (
        Window.partitionBy(user_col)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col) != conversion_type
    touch = F.when(is_touch, F.col(type_col))
    marked = events.select(
        user_col,
        type_col,
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        F.last(touch, ignorenulls=True).over(w).alias("lt"),
        F.first(touch, ignorenulls=True).over(w).alias("ft"),
    ).where(F.col(type_col) == conversion_type)
    credits = marked.select(
        "cents",
        F.explode(
            F.array(
                F.struct(
                    F.lit("last_touch").alias("attribution"),
                    F.coalesce(F.col("lt"), F.lit("direct")).alias("channel"),
                ),
                F.struct(
                    F.lit("first_touch").alias("attribution"),
                    F.coalesce(F.col("ft"), F.lit("direct")).alias("channel"),
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


def attribution_report_sql(
    conversion_type: str = "purchase", table: str = "events"
) -> str:
    """Generated DuckDB mirror of ``attribution_report``: IGNORE NULLS
    last_value/first_value over the identical 1-preceding frame."""
    return f"""
WITH marked AS (
  SELECT user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         last_value(CASE WHEN event_type <> '{conversion_type}'
                         THEN event_type END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt,
         first_value(CASE WHEN event_type <> '{conversion_type}'
                          THEN event_type END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft
  FROM {table}
),
conv AS (SELECT * FROM marked WHERE event_type = '{conversion_type}')
SELECT 'last_touch' AS attribution, coalesce(lt, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS conversions,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM conv GROUP BY coalesce(lt, 'direct')
UNION ALL
SELECT 'first_touch' AS attribution, coalesce(ft, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS conversions,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM conv GROUP BY coalesce(ft, 'direct')
"""
