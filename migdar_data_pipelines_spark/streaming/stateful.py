"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference approximates stateful continuous processing with cron re-runs
+ persisted lookups: first-seen URL dedup holds a ``used`` set in process
memory (flows/broken_links.py:34-43), and the CDC pathway re-reads the whole
Postgres snapshot each run to classify new/changed/same rows
(obsolete/prepare_data_for_es.py:41-169). Both are *stateful streams* at
heart; here they run as Structured Streaming operators with per-key state
that survives micro-batches and checkpoint/restart.

Scale notes: state lives in the state store partitioned by the grouping key
(RocksDB-backed on a real cluster), so memory is bounded per executor and
GC'd via timeouts — set ``state_ttl`` so idle keys expire instead of
accumulating forever (the knob the reference lacks: its ``used`` set grows
without bound within a run). Arrow batches keep the Python hop vectorized.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T
from .._serde import register_self_contained

register_self_contained(__name__)


def streaming_first_seen(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """W4 as a stream: emit each key's FIRST row (by ``ts_col`` within the
    arriving data), suppress every later occurrence across micro-batches.

    Equivalent batch semantics: ``row_number() over (partition by keys order
    by ts) = 1`` — tests assert the AvailableNow drain matches that.
    """
    out_schema = T.StructType(
        [f for f in events.schema.fields if f.name in set(key_cols + [ts_col])]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    cols = [f.name for f in out_schema.fields]

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # key already emitted in an earlier batch — swallow everything
            for _ in pdfs:
                pass
            if state_ttl_ms:
                state.setTimeoutDuration(state_ttl_ms)
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = pdf.sort_values(ts_col).head(1)
            if first is None or cand[ts_col].iloc[0] < first[ts_col].iloc[0]:
                first = cand
        if first is not None:
            state.update((True,))
            if state_ttl_ms:
                state.setTimeoutDuration(state_ttl_ms)
            yield first[cols]

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def streaming_cdc(
    changes: DataFrame,
    key_cols: list[str],
    hash_col: str,
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """D2 as a stream: per key, compare each arriving row's content hash with
    the last seen hash; emit (key..., ts, status) where status is 'new' on
    first sight, 'changed' when the hash moved, 'same' otherwise. The stored
    state is one hash per key — the streaming equivalent of the reference's
    Postgres snapshot read (obsolete/prepare_data_for_es.py:41-60).

    ``order_cols`` pins the within-key processing order (default
    ``[ts_col]``); pass a tie-breaking suffix (e.g. ``["ts", "event_id"]``)
    when timestamps can collide, otherwise tied rows classify in arrival
    order, which is partitioning-dependent."""
    order_cols = list(order_cols or [ts_col])
    key_fields = [f for f in changes.schema.fields if f.name in set(key_cols)]
    ts_field = [f for f in changes.schema.fields if f.name == ts_col]
    out_schema = T.StructType(
        key_fields + ts_field + [T.StructField("status", T.StringType())]
    )
    state_schema = T.StructType([T.StructField("last_hash", T.StringType())])

    cols = [f.name for f in out_schema.fields]

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        # Vectorized shift+compare (no per-row Python): each row's reference
        # hash is the previous row's hash after a stable global sort of the
        # whole group batch (concat first — Arrow may deliver the group in
        # several chunks, and sorting per-chunk would misorder boundaries),
        # with the cross-batch state hash spliced in as row 0's reference.
        last = state.get[0] if state.exists else None
        parts = [pdf for pdf in pdfs if not pdf.empty]
        if not parts:
            return
        df = pd.concat(parts, ignore_index=True).sort_values(
            order_cols, kind="stable", ignore_index=True
        )
        h = df[hash_col]
        prev = h.shift(1)
        if last is not None:
            prev.iloc[0] = last
        status = np.where(
            prev.isna(), "new", np.where(h.to_numpy() == prev.to_numpy(), "same", "changed")
        )
        out = df[[*key_cols, ts_col]].copy()
        out["status"] = status
        state.update((h.iloc[-1],))
        yield out[cols]

    return changes.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_simhash_near_dup(
    docs: DataFrame,
    id_col: str,
    order_col: str,
    sig_col: str,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_state: int = 256,
) -> DataFrame:
    """STREAMING near-duplicate flagging — the LSH dedup family's unbounded
    form: each arriving document (already carrying its portable simhash
    ``sig_col``) is flagged ``dup=True`` iff some EARLIER document (strictly
    smaller ``(order_col, id_col)``) within hamming distance
    ``max_hamming`` has been seen. Banding makes the state tractable: the
    signature splits into ``bands`` equal bit-slices, the stream is keyed by
    (band, slice-value), and by pigeonhole any pair within ``max_hamming``
    <= bands - 1 bit flips shares at least one untouched band — so
    per-bucket comparison is LOSSLESS for the hamming ball while each
    bucket's state holds only its own members (never the corpus).

    State per bucket: up to ``max_state`` first-arriving (order, id,
    signature) triples — the same hot-bucket discipline as the batch guard
    (MAX_LSH_BUCKET_SIZE): a template-cluster bucket past the cap stops
    accumulating and ``dup`` becomes a lower bound against the kept
    members (for a genuinely near-identical cluster, still correct —
    everything matches the first member). The per-bucket scan is a Python
    loop over <= max_state ints per row: this is the
    applyInPandasWithState custom-operator tier, sized by the cap, not by
    the corpus.

    Emits one row per (doc, band); the caller ORs bands per doc after the
    drain (a doc is near-dup iff ANY band flagged it). Ordering contract
    (ADVICE r11): state entries carry their (order, id) and a row is
    flagged ONLY by entries strictly smaller in that ordering — a
    straggler doc delivered in a later micro-batch than higher-ordered
    neighbours is never flagged by them. So ``dup=True`` always witnesses
    a genuinely earlier near-dup, under ANY delivery order; the flag is
    additionally COMPLETE (equal to the batch earlier-within-hamming
    answer) when delivery is order-monotonic across micro-batches below
    the state cap — append mode cannot retro-flag a row that was emitted
    before its earlier neighbour arrived."""
    width = bits // bands
    mask = (1 << width) - 1
    bucket = F.array(
        *[
            (
                F.shiftright(F.col(sig_col), b * width).bitwiseAND(F.lit(mask))
                + F.lit(b * (mask + 1))
            ).cast("long")
            for b in range(bands)
        ]
    )
    rows = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(order_col).cast("long").alias("order"),
        F.col(sig_col).cast("long").alias("sig"),
        F.explode(bucket).alias("bucket"),
    )
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("dup", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("orders", T.ArrayType(T.LongType())),
            T.StructField("ids", T.ArrayType(T.LongType())),
            T.StructField("sigs", T.ArrayType(T.LongType())),
        ]
    )

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            st_orders, st_ids, st_sigs = state.get
            st = [
                (int(o), int(i), int(s))
                for o, i, s in zip(st_orders, st_ids, st_sigs)
            ]
        else:
            st = []
        parts = [pdf for pdf in pdfs if not pdf.empty]
        if not parts:
            return
        df = pd.concat(parts, ignore_index=True).sort_values(
            ["order", "id"], kind="stable", ignore_index=True
        )
        flags = []
        # plain zip over the column arrays, not iterrows(): iterrows builds
        # a pandas Series per row (~100µs each) and was the dominant cost of
        # the whole drain at gate scale; the loop body is unchanged
        for s, o, i in zip(
            df["sig"].to_numpy(), df["order"].to_numpy(), df["id"].to_numpy()
        ):
            s, o, i = int(s), int(o), int(i)
            # only STRICTLY earlier (order, id) entries may flag this row —
            # state rows from a previous micro-batch can be later-ordered
            # than a straggler arriving now (ADVICE r11)
            flags.append(
                any(
                    (so, si) < (o, i)
                    and bin(s ^ ss).count("1") <= max_hamming
                    for so, si, ss in st
                )
            )
            if len(st) < max_state:
                st.append((o, i, s))
        state.update(
            (
                [o for o, _, _ in st],
                [i for _, i, _ in st],
                [s for _, _, s in st],
            )
        )
        yield pd.DataFrame({"id": df["id"], "dup": flags})

    return rows.groupBy("bucket").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


__all__ = ["streaming_first_seen", "streaming_cdc", "streaming_simhash_near_dup"]




def streaming_ewma(
    events: DataFrame,
    key_cols: list[str],
    val_col: str,
    order_cols: list[str] | None = None,
    alpha: float = 0.25,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """The UNBOUNDED EWMA recurrence as a stateful stream — the shape the
    batch ``operators/windows.py::ewma_by`` docstring defers here:

        s_first = x ;  s_t = alpha * x_t + (1 - alpha) * s_{t-1}

    (pandas ``adjust=False`` semantics). The whole history folds into ONE
    double per key — the state store holds (s,), nothing grows with the
    stream; ``state_ttl_ms`` expires idle keys. Rows are processed in
    ``order_cols`` order within each micro-batch and the fold value
    carries across batches/restarts via the checkpointed state.

    Emits every input row as (key..., order..., value, ewma[6dp]); the
    batch-equivalent semantics (a left fold over the key's full prefix in
    order) are what the gate's DuckDB ``list_reduce`` oracle recomputes.
    """
    order_cols = order_cols or ["ts"]
    out_fields = [
        f
        for f in events.schema.fields
        if f.name in set(key_cols) | set(order_cols) | {val_col}
    ]
    out_schema = T.StructType(
        out_fields + [T.StructField("ewma", T.DoubleType())]
    )
    state_schema = T.StructType([T.StructField("s", T.DoubleType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    cols = [f.name for f in out_fields]
    q = 1.0 - alpha

    def fn(key: tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        s = state.get[0] if state.exists else None
        parts = [pdf for pdf in pdfs if not pdf.empty]
        if not parts:
            if state_ttl_ms and state.exists:
                state.setTimeoutDuration(state_ttl_ms)
            return
        batch = pd.concat(parts).sort_values(order_cols, kind="mergesort")
        out = []
        for x in batch[val_col].astype(float):
            # same association order as the oracle's list_reduce lambda;
            # emitted UNROUNDED — python round() is half-even, the engine
            # contract rounding is F.round (half-up, matching DuckDB)
            s = x if s is None else alpha * x + q * s
            out.append(s)
        batch = batch[cols].copy()
        batch["ewma"] = out
        state.update((s,))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        yield batch

    out = events.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
    # stateless projection after the stateful op: contract rounding happens
    # JVM-side as the EXPLICIT IEEE sequence floor(x*1e6 + 0.5)/1e6, mirrored
    # verbatim in the oracle. F.round(double, 6) is NOT portable: Spark
    # rounds the double's SHORTEST DECIMAL REPR (BigDecimal.valueOf), so a
    # double whose shortest repr ends ...xxxxxx5 reads as an exact half and
    # rounds up, while DuckDB multiplies the true binary value (just below
    # the half) and rounds down — a ~1e-7/row cross-engine flip that the
    # sf0.1 parity gate measured on 5 of 100k rows (PARITY r12; non-dyadic
    # alpha does NOT protect against shortest-repr halves). floor and the
    # two multiplies are correctly-rounded IEEE ops identical everywhere.
    from pyspark.sql import functions as F  # noqa: F811

    return out.withColumn(
        "ewma",
        F.floor(F.col("ewma") * F.lit(1000000.0) + F.lit(0.5))
        / F.lit(1000000.0),
    )


def streaming_cusum(
    events: DataFrame,
    key_cols: list[str],
    val_col: str,
    target: int,
    slack_k: int = 0,
    order_cols: list[str] | None = None,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """The CUSUM recurrence (operators/profile.py::cusum_by) as a stateful
    stream — the live form of the changepoint monitor:

        S_i = max(0, S_{i-1} + (x_i - target - k))

    folded EXACTLY in int64 via the same closed form the batch operator
    uses (S = P - min(0, running_min(P))): the state store holds TWO longs
    per key — the running prefix sum P and its running minimum M — nothing
    grows with the stream, and every arithmetic step is integer, so the
    drained stream matches the batch window oracle bit-for-bit.
    ``val_col`` must be integral (quantize to cents upstream); rows are
    processed in ``order_cols`` order within each micro-batch, with the
    fold carrying across batches/restarts via the checkpointed state (the
    same order-monotonic delivery contract as ``streaming_ewma``).

    Emits every input row as (key..., order..., value, cusum) with the
    int64 statistic; alarming/thresholding is a stateless filter the
    caller composes downstream."""
    order_cols = order_cols or ["ts"]
    out_fields = [
        f
        for f in events.schema.fields
        if f.name in set(key_cols) | set(order_cols) | {val_col}
    ]
    out_schema = T.StructType(
        out_fields + [T.StructField("cusum", T.LongType())]
    )
    state_schema = T.StructType(
        [T.StructField("p", T.LongType()), T.StructField("m", T.LongType())]
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    cols = [f.name for f in out_fields]
    shift = int(target) + int(slack_k)

    def fn(key: tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            p, m = int(state.get[0]), int(state.get[1])
            have = True
        else:
            p, m = 0, 0
            have = False
        parts = [pdf for pdf in pdfs if not pdf.empty]
        if not parts:
            if state_ttl_ms and state.exists:
                state.setTimeoutDuration(state_ttl_ms)
            return
        batch = pd.concat(parts).sort_values(order_cols, kind="mergesort")
        out = []
        for x in batch[val_col].astype("int64"):
            p += int(x) - shift
            m = min(m, p) if have else p
            have = True
            out.append(p - min(0, m))
        batch = batch[cols].copy()
        batch["cusum"] = pd.array(out, dtype="int64")
        state.update((p, m))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        yield batch

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def streaming_hll_distinct(
    events: DataFrame,
    key_cols: list[str],
    val_col: str,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Approximate distinct-count as a TRUE stateful stream: the portable
    md5 HLL sketch (operators/sketches.py) maintained per key in the state
    store — 256 small ints per key, NOTHING grows with the stream — the
    continuous form of ``hll_distinct_by`` with the strongest parity claim
    available to a sketch: state, transitions, and emissions are ALL
    integers (register maxima), so the drained final registers are
    BIT-IDENTICAL to the batch sketch under ANY micro-batch split (max is
    commutative/associative), and the estimate is then computed by the
    SHARED batch estimator over the drained frame — the engine's own float
    path, not a Python reimplementation.

    Emits one row per key per micro-batch: (key..., rows_folded, regs)
    where rows_folded is the key's cumulative input count (strictly
    increasing — the deterministic "latest wins" selector for the drain)
    and regs is the dense 256-slot register array. Register index and rho
    replicate sketches._rho digit-for-digit from the same md5 hex.
    ``state_ttl_ms`` expires idle keys (sliding-corpus monitoring).

    ``val_col`` contract (ADVICE r12): BOOLEAN, integral, or STRING only —
    the types whose Python canonicalization is provably identical to Spark's
    ``CAST(x AS STRING)`` ('true'/'false', decimal integer repr, identity).
    Fractional DOUBLE/FLOAT columns are REJECTED at build time: their
    string form is engine-specific (Java Double.toString vs Python repr
    diverge on scientific-notation magnitudes), which would silently break
    the bit-identical claim — cast to string upstream with an explicit
    format instead."""
    import hashlib

    m = 256
    tail = 12

    vt = events.schema[val_col].dataType
    integral = isinstance(vt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
    if isinstance(vt, T.BooleanType):
        # Spark CAST(bool AS STRING) -> 'true'/'false' (Python str() would
        # give 'True'/'False' and md5-diverge from the batch sketch)
        def canon(x) -> str:
            return "true" if bool(x) else "false"
    elif integral:
        # canonicalized JVM-SIDE below (CAST(val AS STRING) in the plan):
        # the Arrow->pandas hop delivers a null-mixed int64 column as
        # float64, where ids above 2^53 have ALREADY lost their exact
        # decimal repr before any Python code runs — no astype can recover
        # them (ADVICE r13). Casting in the plan means the UDF only ever
        # sees Spark's own exact decimal string.
        canon = str
    elif isinstance(vt, T.StringType):
        canon = str
    else:
        raise ValueError(
            f"streaming_hll_distinct: val_col {val_col!r} has type {vt}; "
            "only boolean/integral/string canonicalize bit-identically to "
            "Spark CAST(x AS STRING) — cast upstream with an explicit format"
        )

    out_schema = T.StructType(
        [f for f in events.schema.fields if f.name in set(key_cols)]
        + [
            T.StructField("rows_folded", T.LongType()),
            T.StructField("regs", T.ArrayType(T.IntegerType())),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("regs", T.ArrayType(T.IntegerType())),
        ]
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def _reg_rho(s: str) -> tuple[int, int]:
        h = hashlib.md5(s.encode("utf-8")).hexdigest()
        reg = int(h[:2], 16)
        t = h[2 : 2 + tail]
        if t == "0" * tail:
            return reg, 4 * tail + 1
        z = len(t) - len(t.lstrip("0"))
        v = int(t[z], 16)
        lz = 0 if v >= 8 else 1 if v >= 4 else 2 if v >= 2 else 3
        return reg, z * 4 + lz + 1

    def fn(key: tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n, regs = state.get
            regs = list(regs)
        else:
            n, regs = 0, [0] * m
        folded = 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            for x in pdf[val_col]:
                if pd.isna(x):
                    continue
                reg, rho = _reg_rho(canon(x))
                if rho > regs[reg]:
                    regs[reg] = rho
                folded += 1
        if folded == 0:
            if state_ttl_ms and state.exists:
                state.setTimeoutDuration(state_ttl_ms)
            return
        n += folded
        state.update((n, regs))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            [list(key) + [n, regs]],
            columns=list(key_cols) + ["rows_folded", "regs"],
        )

    if integral:
        # exact canonicalization happens in the plan, not in Python: the
        # JVM's CAST(long AS STRING) is exact for all int64, whereas the
        # Arrow->pandas transfer of a null-mixed long column goes through
        # float64 and corrupts ids above 2^53 before the UDF sees them
        events = events.withColumn(val_col, F.col(val_col).cast("string"))
    return events.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def streaming_attribution(
    events: DataFrame,
    conversion_type: str,
    user_col: str,
    type_col: str,
    cents_col: str,
    order_cols: list[str],
    id_col: str = "event_id",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """First/last-touch conversion attribution as a TRUE stateful stream —
    the continuous form of ``operators/windows.py::attribution_report``:
    per user the state store holds exactly TWO strings (first touch ever,
    most recent touch), nothing grows with the stream, and every
    conversion row is emitted AT ARRIVAL with both credits — the
    real-time "which channel converted" feed, vs the batch report's
    end-of-day rollup.

    Same order-monotonic delivery contract as streaming_ewma/cusum (rows
    sorted by ``order_cols`` within each micro-batch; earlier order never
    arrives in a later batch); under it the drained emissions equal the
    batch window form row-for-row, so the registered query's oracle IS
    the batch SQL. ``state_ttl_ms`` expires idle users."""
    out_fields = [
        f
        for f in events.schema.fields
        if f.name in {user_col, id_col, cents_col}
    ]
    out_schema = T.StructType(
        out_fields
        + [
            T.StructField("channel_last", T.StringType()),
            T.StructField("channel_first", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ft", T.StringType()),
            T.StructField("lt", T.StringType()),
        ]
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    cols = [f.name for f in out_fields]

    def fn(key: tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        ft, lt = state.get if state.exists else (None, None)
        parts = [pdf for pdf in pdfs if not pdf.empty]
        if not parts:
            if state_ttl_ms and state.exists:
                state.setTimeoutDuration(state_ttl_ms)
            return
        batch = pd.concat(parts).sort_values(order_cols, kind="mergesort")
        out_rows = []
        col_vals = [batch[c].tolist() for c in cols]
        for i, t in enumerate(batch[type_col].tolist()):
            if t == conversion_type:
                out_rows.append(
                    [vals[i] for vals in col_vals]
                    + [lt if lt is not None else "direct",
                       ft if ft is not None else "direct"]
                )
            else:
                lt = t
                if ft is None:
                    ft = t
        state.update((ft, lt))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=cols + ["channel_last", "channel_first"]
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
