"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB:
  * All hashing is md5-based column expressions — deterministic across runs,
    engines and partitionings (no JVM hashCode, no Python hash seeds).
  * MinHash/LSH is the scale path: shingles -> k salted-md5 min-hashes ->
    banded bucket keys -> self-join per bucket. The only shuffle is on bucket
    keys, whose cardinality we control via (bands, rows-per-band); candidate
    verification (true Jaccard) runs only on bucket collisions.
  * Pairwise operators (ngram_jaccard_pairs, embedding_near_dup) always block
    first (bucket / cell) — never a global cross join.
"""

from __future__ import annotations

import math
import warnings

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.caching import scoped_persist
from ..operators.scale import widen_scan
from .linalg import dot, norm
from .textanalysis import words
from .._serde import register_self_contained
from ..session import local_df

register_self_contained(__name__)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content hash: every row mapped to its group's canonical
    (minimum) id. One hash-groupBy shuffle; at scale this is the cheapest
    pass and runs first in a dedup cascade."""
    h = F.md5(F.col(text_col))
    return (
        df.withColumn("__h", h)
        .groupBy("__h")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .withColumnRenamed("__h", "content_hash")
    )


def _appid() -> str:
    """Key prefix for Column-expression memos: cached py4j expression trees
    are only valid for the JVM gateway that built them, so memo entries are
    scoped to the active application (same policy as plans/queries.py::_t)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    return sc.applicationId if sc is not None else ""


# Built-Column memo for shingles(str, k). A Column is a pure expression
# tree — no data, no plan, no session state — so reuse is trivially
# bit-identical; what it saves is the py4j round trips of rebuilding the
# k-pass zip_with chain, which streaming callers (one micro-batch = one
# rebuild) and the per-query registry pay over and over for the same
# (column-name, k) pair.
_SHINGLES_CACHE: dict[tuple, Column] = {}


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles as strings ('w1 w2 w3').

    Built as a chain of k-1 ``zip_with`` passes gluing progressively shifted
    copies of the word array (shingle_i = w[i] + ' ' + w[i+1] + ... ), not as
    ``transform(sequence, i -> array_join(slice(ws, i, k)))``: higher-order
    functions are interpreted, so per-element cost dominates — the zip chain
    does O(k) array passes total where slice-per-index does one O(k)
    slice+join per shingle *position* (measured 5x faster at k=3). The
    shifted copies run one short at the tail; ``concat`` propagates those
    nulls and ``array_compact`` drops them, leaving exactly the n-k+1 full
    shingles. Docs with fewer than k words contribute one whole-doc shingle.
    """
    key = (_appid(), col, k) if isinstance(col, str) else None
    if key is not None:
        hit = _SHINGLES_CACHE.get(key)
        if hit is not None:
            return hit
    ws = words(col)
    n = F.size(ws)
    acc = ws
    for j in range(1, k):
        shifted = F.slice(ws, j + 1, F.greatest(n - j, F.lit(1)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    full = F.array_distinct(F.array_compact(acc))
    out = F.when(n < k, F.array(F.array_join(ws, " "))).otherwise(full)
    if key is not None:
        _SHINGLES_CACHE[key] = out
    return out


def _minhash_one(shingle_arr: Column, seed: int) -> Column:
    """min over shingles of md5(seed || shingle) — a salted permutation
    simulation; min of hex strings is total-ordered and engine-portable."""
    return F.array_min(
        F.transform(shingle_arr, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def minhash_signature(df: DataFrame, text_col: str, n_hashes: int = 8, k: int = 3) -> DataFrame:
    """Append minhash_0..n-1 columns (md5-hex minima per salt)."""
    sh = shingles(text_col, k)
    # n_hashes interpreted md5-min folds per row, all in the scan stage —
    # widen a narrow input first (no-op on wide scans). No key column is
    # assumed on this generic entry point; round-robin is safe here because
    # the output is row-wise deterministic (no order-sensitive aggregate).
    out = widen_scan(df).withColumn("__shingles", sh)
    for i in range(n_hashes):
        out = out.withColumn(f"minhash_{i}", _minhash_one(F.col("__shingles"), i))
    return out


# (perm-min aggregate Columns, band-keys Column) per
# (applicationId, n_hashes, bands) — see the inline comment at the use site.
_LSH_EXPR_CACHE: dict[tuple, tuple] = {}


def _shingle_band_frames(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int,
    bands: int,
    k: int,
    persist: bool = True,
):
    """Shared LSH front half: the persisted (id, shingle-array) frame and the
    exploded (id, band-bucket) rows. Salts/multipliers are FIXED constants,
    so two frames built separately (e.g. a new batch probing a standing
    corpus index) land in the same bucket space.

    Execution shape (codegen-first, shuffle-light): form the shingle array
    per-row ONCE (one interpreted higher-order pass — nested functions skip
    whole-stage codegen) and persist that narrow (id, shingles) frame; then
    EXPLODE it to shingle rows so hashing and all n_hashes permutations run
    codegen'd, with one ``groupBy(id)`` computing the permutation minima as
    plain aggregates. Each shingle is hashed to a long ONCE (xxhash64); the
    permutations are then universal-hash integer arithmetic. The explode
    keeps each doc's shingle rows contiguous in their input partition, so
    map-side partial aggregation collapses them BEFORE the exchange — the
    signature shuffle carries (id, n_hashes longs) only.
    """
    rows = n_hashes // bands
    # 31-bit Mersenne modulus: keeps a_i*h + b_i inside a long under ANSI
    # mode (h < 2^31, a_i <= 2*n_hashes+1). A hash collision here can only
    # MERGE buckets (extra candidates, filtered by verification), never split
    # them, so the narrower modulus cannot cause false negatives.
    mersenne = (1 << 31) - 1

    # Widen a narrow scan BEFORE the shingle fold (operators/scale.py::
    # widen_scan): the interpreted shingle chain plus the explode+hash
    # pipeline below all run in the SCAN stage, and a single-file input
    # would put the whole per-row cost on one task. Project to the two
    # needed columns first so the widening exchange ships only (id, text).
    src = widen_scan(
        df.select(F.col(id_col), F.col(text_col)), id_col
    )
    base = src.select(F.col(id_col).alias("id"), shingles(text_col, k).alias("__sh"))
    if persist:
        base = scoped_persist(base)

    # One row per (doc, shingle); shingles() emits the whole-doc join for
    # docs shorter than k words (incl. [""] for empty docs), so every doc
    # survives the explode with >= 1 row.
    shingle_rows = base.select("id", F.explode("__sh").alias("__s")).withColumn(
        "__h", F.pmod(F.xxhash64("__s"), F.lit(mersenne))
    )

    # permutation i: min over shingles of (a_i*h + b_i) mod p, with fixed odd
    # multipliers — deterministic across runs/partitionings, three integer
    # ops per element. Built as ONE parsed SQL string per aggregate instead
    # of a py4j Column chain: this construction runs per invocation on the
    # gate path, and the ~6x fewer gateway round-trips measurably cut the
    # driver-side plan-build time for 32-hash signatures. The built Columns
    # (pure expression trees) are additionally memoized per
    # (applicationId, n_hashes, bands) — streaming_curate rebuilds this
    # pipeline once per MICRO-BATCH, where the ~33 parses were a measurable
    # slice of the per-batch driver gap.
    memo_key = (_appid(), n_hashes, bands)
    memo = _LSH_EXPR_CACHE.get(memo_key)
    if memo is None:

        def perm_min(i: int) -> Column:
            # large odd multipliers (golden-ratio stride) — h < 2^31 and
            # a < 2^31 keep a*h < 2^62, inside a signed long under ANSI
            # mode. Small multipliers correlate the permutations and
            # measurably raise the band-miss rate at threshold-grade
            # similarity.
            a = ((0x9E3779B1 * (i + 1)) % mersenne) | 1
            b = (0x85EBCA77 * (i + 1)) % mersenne
            return F.expr(f"min(pmod(__h * {a}L + {b}L, {mersenne}L))")

        memo = (
            [perm_min(i).alias(f"__m{i}") for i in range(n_hashes)],
            F.expr(
                "array("
                + ", ".join(
                    "xxhash64({}, {})".format(
                        bnd,
                        ", ".join(f"__m{bnd * rows + r}" for r in range(rows)),
                    )
                    for bnd in range(bands)
                )
                + ")"
            ),
        )
        _LSH_EXPR_CACHE[memo_key] = memo
    perm_cols, band_keys = memo

    sig = shingle_rows.groupBy("id").agg(*perm_cols)
    band_rows = sig.select("id", F.explode(band_keys).alias("bucket"))
    if persist:
        band_rows = scoped_persist(band_rows)
    return base, band_rows


# Broadcast-hint ceiling for LSH candidate-pair frames. The hint is only
# safe when the candidate list is provably executor-memory-small; crawl
# corpora run 30-50% duplication, so the pair list is O(dup pairs) —
# billions of rows at 100 TB — and an unconditional broadcast is an OOM,
# not a retuning nit. The gate counts the PERSISTED candidate frame
# itself — the candidates have to be computed for verification anyway, so
# pinning them and counting makes the decision exact and costs only the
# count's scheduling overhead (r6 instead pre-estimated from bucket
# histograms: an extra aggregate job whose answer the main pass then
# recomputed; measured ~0.9s/query slower at sf0.1). Above the ceiling
# the verification runs as shuffle joins (AQE may still broadcast from
# its own runtime size estimate — but only the explicit hint keeps the
# corpus-side shingle frame out of the exchange altogether, which is the
# 100 TB point of gating at plan time).
MAX_BROADCAST_CANDIDATE_PAIRS = 1_000_000

# duplicated_spans' dup-hash set ceiling: 8-byte xxhash64 rows, ~32MB
# serialized at the ceiling — broadcasting it spares the occurrence frame
# its second full shuffle (see the inline comment at the residue join)
MAX_BROADCAST_DUP_GRAMS = 4_000_000

# Byte ceiling for the SECOND verify broadcast — the intermediate that
# carries each candidate pair PLUS the probe's full shingle/gram array.
# Rows there are fat: 1M pairs x a few hundred 8-byte grams is GBs, so
# the 1M-pair ceiling calibrated for thin (id_a, id_b) rows is not a safe
# gate for it (ADVICE r10). 64 MiB keeps the serialized broadcast an
# order of magnitude under executor memory at default configs.
MAX_BROADCAST_VERIFY_BYTES = 64 << 20


def _verify_hints(
    cand: DataFrame,
    a_sizes: DataFrame,
    join_col: str,
    pair_ceiling: int,
    bytes_per_elem: int,
) -> tuple[bool, bool]:
    """Broadcast gates for the two-hop candidate verification. ``cand`` must
    already be persisted (this runs one eager aggregate over it — same
    plan-time-count policy as the pair gate it extends). Returns
    ``(thin, fat)``: ``thin`` gates broadcasting the bare (id_a, id_b)
    frame into the first lookup (exact row count vs ``pair_ceiling``);
    ``fat`` gates broadcasting the array-carrying intermediate into the
    second lookup, from the estimated serialized size — total array
    elements the candidates drag along x ``bytes_per_elem`` + ~32B/row
    envelope, capped at ``MAX_BROADCAST_VERIFY_BYTES``. When ``fat`` is
    False the second join shuffles (AQE may still broadcast from its own
    runtime estimate, which — unlike the plan-time hint — sees the real
    bytes)."""
    row = (
        cand.join(a_sizes, join_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("__asz"), F.lit(0)).alias("elems"),
        )
        .collect()[0]
    )
    thin = row["n"] <= pair_ceiling
    fat_bytes = row["elems"] * bytes_per_elem + row["n"] * 32
    return thin, thin and fat_bytes <= MAX_BROADCAST_VERIFY_BYTES


# rough serialized width of one word-3-shingle string element in a
# broadcast row (UTF8String payload + array offset overhead)
_SHINGLE_ELEM_BYTES = 24

# Per-band-bucket cardinality ceiling for the LSH candidate self-join
# (VERDICT r10 #1). Exact-dedup-first collapses byte-identical docs, but a
# NEAR-identical template cluster of M docs (boilerplate, paraphrase-level
# edits) lands all M in the same bucket in every band -> O(M^2) candidate
# pairs out of a single key: at 100 TB a 1M-doc boilerplate cluster is
# ~10^12 pairs from one bucket — the classic production LSH failure. Above
# the ceiling a bucket emits STAR pairs only (every member against the
# bucket's canonical representative, min id): O(M) rows, and connectivity
# through the representative keeps the bucket one candidate-graph
# component, so connected-component dedup groups are preserved whenever
# the cluster is genuinely near-identical (members verify against the rep
# too). What CAN change above the ceiling: (a) the emitted PAIR LIST for a
# hot bucket lists rep-member pairs, not all member-member pairs, and (b)
# a borderline member that fails Jaccard against the rep but would have
# passed against some nearer member may split off — the documented
# recall trade for not being quadratic. A pair suppressed in one band's
# hot bucket is still found by any OTHER band where the two ids share a
# below-ceiling bucket. 1000 keeps the worst single bucket's all-pairs
# output at ~500k rows.
MAX_LSH_BUCKET_SIZE = 1000


def _band_candidates(
    band_rows: DataFrame,
    max_bucket_size: int | None,
    persist: bool = False,
    payload_cols: tuple[str, ...] = (),
    pair_filter: Column | None = None,
) -> tuple[DataFrame, dict[str, int] | None]:
    """(id_a < id_b) candidate pairs from (id, bucket) band rows, with the
    per-bucket cardinality ceiling above. One groupBy sizes the buckets
    (map-side combinable, reuses the self-join's bucket partitioning);
    below-ceiling buckets take the exact all-pairs self-join, oversized
    ones the linear star form. The bucket-size frame and the guard cost
    O(band rows); nothing here is ever quadratic in an oversized bucket.

    ``payload_cols`` names extra columns on ``band_rows`` (e.g. a simhash
    signature) carried through to the pair output as ``{c}_a`` / ``{c}_b``
    — on the star branch the representative's payload is taken with
    ``min_by(c, id)``, exact because ids are unique per bucket.
    ``pair_filter`` is an optional predicate over the joined pair columns
    (ids + payloads), applied BEFORE the cross-band dropDuplicates so
    Catalyst folds it into the join condition on the all-pairs branches —
    the verification-in-the-join shape (e.g. hamming <= d) that keeps
    failing pairs out of the dedup exchange. On the star branch it runs
    against the representative: a member failing the filter vs the rep but
    passing vs some nearer member is the documented recall trade.

    With ``persist`` the bucket-size histogram is aggregated EAGERLY (one
    cheap job over the already-persisted band rows, sketch-sized output)
    and returned as telemetry; when it shows ZERO oversized buckets — the
    common case — the plain all-pairs self-join is returned unchanged, so
    the guard costs one aggregate job and nothing in the main plan. Only
    when a hot bucket actually exists does the guarded plan engage, with
    the size-annotated band rows pinned (read three times: small-side
    left/right and the star branch). Without ``persist`` the guard is
    SKIPPED and the plain self-join returned: the guarded plan reads the
    annotated band rows three times plus the histogram once, and with
    nothing pinned each read would re-execute the whole shingle+signature
    subtree (~5x the dominant cost) — worse than the quadratic risk it
    hedges for the lazy-composition callers who opted out of persistence.
    Telemetry is None on that path."""
    pay = list(payload_cols)
    out_cols = ["id_a", "id_b"] + [f"{c}_a" for c in pay] + [f"{c}_b" for c in pay]

    def left_sel(rows_df: DataFrame) -> DataFrame:
        return rows_df.select(
            "bucket",
            F.col("id").alias("id_a"),
            *[F.col(c).alias(f"{c}_a") for c in pay],
        )

    def right_sel(rows_df: DataFrame) -> DataFrame:
        return rows_df.select(
            F.col("bucket").alias("bucket_r"),
            F.col("id").alias("id_b"),
            *[F.col(c).alias(f"{c}_b") for c in pay],
        )

    def filtered(pairs: DataFrame) -> DataFrame:
        return pairs if pair_filter is None else pairs.filter(pair_filter)

    def plain(rows_df: DataFrame) -> DataFrame:
        joined = left_sel(rows_df).join(
            right_sel(rows_df),
            (F.col("bucket") == F.col("bucket_r"))
            & (F.col("id_a") < F.col("id_b")),
        )
        return filtered(joined).select(*out_cols).dropDuplicates(["id_a", "id_b"])

    if max_bucket_size is None or not persist:
        return plain(band_rows), None
    # persist is True from here on — the early return above took the rest.
    sizes = band_rows.groupBy("bucket").agg(F.count(F.lit(1)).alias("__bn"))
    over = (
        sizes.filter(F.col("__bn") > max_bucket_size)
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.coalesce(F.sum("__bn"), F.lit(0)).alias("nr"),
        )
        .collect()[0]
    )
    stats = {
        "lsh_hot_buckets": int(over["nb"]),
        "lsh_hot_bucket_rows": int(over["nr"]),
    }
    if stats["lsh_hot_buckets"] == 0:
        return plain(band_rows), stats
    rows = scoped_persist(band_rows.join(sizes, "bucket"))
    small = rows.filter(F.col("__bn") <= max_bucket_size)
    pairs_small = (
        filtered(
            left_sel(small).join(
                right_sel(small),
                (F.col("bucket") == F.col("bucket_r"))
                & (F.col("id_a") < F.col("id_b")),
            )
        )
        .select(*out_cols)
    )
    big = rows.filter(F.col("__bn") > max_bucket_size)
    reps = big.groupBy("bucket").agg(
        F.min("id").alias("id_a"),
        *[F.min_by(c, "id").alias(f"{c}_a") for c in pay],
    )
    pairs_big = (
        filtered(
            big.join(reps, "bucket")
            # rep = min(id), so the (id_a < id_b) pair convention holds
            .filter(F.col("id") != F.col("id_a"))
            .select(
                "id_a",
                F.col("id").alias("id_b"),
                *[F.col(f"{c}_a") for c in pay],
                *[F.col(c).alias(f"{c}_b") for c in pay],
            )
        )
        .select(*out_cols)
    )
    return (
        pairs_small.unionByName(pairs_big).dropDuplicates(["id_a", "id_b"]),
        stats,
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    jaccard_threshold: float = 0.5,
    persist_shingles: bool = True,
    max_broadcast_candidates: int | None = None,
    max_bucket_size: int | None = MAX_LSH_BUCKET_SIZE,
    frames: tuple[DataFrame, DataFrame] | None = None,
    verify_hints: tuple[bool, bool] | None = None,
    gate_observation=None,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified with true shingle Jaccard.

    ``verify_hints`` optionally supplies the broadcast-gate decision
    ``(thin, fat)`` directly, skipping the eager candidate-count job — for
    callers that can carry the decision across invocations (streaming_curate
    carries it across micro-batches: VERDICT r14 #1). The hints only pick a
    join strategy, never change output. ``gate_observation`` (a
    ``pyspark.sql.Observation``) is attached to the verify join when given,
    measuring the exact (n, elems) the eager gate would have counted as a
    free side-effect of the caller's own action — the caller reads it after
    its action to refresh the carried decision.

    ``frames`` optionally supplies a prebuilt, PERSISTED
    ``(base, band_rows)`` pair from :func:`_shingle_band_frames` (same
    n_hashes/bands/k) so a caller that needs the shingle/band frames for
    other consumers too (streaming_curate's per-micro-batch state writes
    and index probe) computes them exactly once — the pair output is
    bit-identical because the frames are the same deterministic
    fixed-salt construction. With ``frames`` given, ``persist_shingles``
    only gates the candidate broadcast-hint count (the frames themselves
    are assumed already pinned by the caller).

    ``max_broadcast_candidates`` overrides ``MAX_BROADCAST_CANDIDATE_PAIRS``
    — the candidate-count ceiling above which the verification joins drop
    the broadcast hint (see the inline comment at the verify step).

    ``max_bucket_size`` is the per-band-bucket cardinality ceiling
    (``MAX_LSH_BUCKET_SIZE``; None disables): oversized buckets emit
    linear star pairs against the bucket's canonical (min-id) member
    instead of the quadratic all-pairs join — see the constant's comment
    for the exact semantics trade. Below the ceiling the output is
    bit-identical to the unguarded plan (equality-tested). The guard
    requires the persisted path: with ``persist_shingles=False`` it is
    skipped (the guarded plan would re-execute the unpinned signature
    subtree ~5x) and the plain self-join is built.

    NOTE — eager construction: with ``persist_shingles=True`` (default),
    BUILDING this plan runs Spark jobs before the caller's first action:
    the candidate frame is persisted and counted to make the broadcast
    gate decision (a plan-time choice, so it cannot be deferred). The
    work is reused — the main pass reads the pinned candidates — but
    callers composing plans lazily should pass ``persist_shingles=False``
    (gate then defers to AQE's runtime-size broadcast).

    rows-per-band = n_hashes/bands sets the collision sensitivity
    (threshold ~ (1/bands)^(1/rows)). Self-join happens per band-bucket only;
    dedup of (a,b) across bands via distinct on the id pair.

    Fast internal hashing: LSH buckets are engine-internal (the *output* is
    the verified-jaccard pair list, so bucket values never need cross-engine
    portability — unlike ``minhash_signature``, which is oracle-checked and
    stays md5). Each shingle is hashed to a long ONCE (xxhash64); the
    n_hashes permutations are then cheap universal-hash arithmetic
    ``(a_i*h + b_i) mod p`` over those longs. This matters because nested
    higher-order functions are interpreted (no whole-stage codegen): hashing
    the shingle *strings* once instead of n_hashes times cuts the dominant
    cost, and the per-permutation work drops to three integer ops.

    Execution shape (codegen-first, shuffle-light): form the shingle array
    per-row ONCE (one interpreted higher-order pass — nested functions skip
    whole-stage codegen) and persist that narrow (id, shingles) frame; then
    EXPLODE it to shingle rows so hashing and all n_hashes permutations run
    codegen'd, with one ``groupBy(id)`` computing the permutation minima as
    plain aggregates. The alternative of permuting inside ``transform``
    costs ~n_hashes interpreted passes over every shingle; the alternative
    of building shingles row-wise with a window ``lead`` over exploded
    words costs a full-corpus shuffle for the window.

    Scale notes (100 TB): explode keeps each doc's shingle rows contiguous
    in their input partition, so the groupBy's map-side partial aggregation
    collapses them to one row per doc BEFORE the exchange — the signature
    shuffle carries (id, n_hashes longs) only, never shingles or words.
    Verification reads shingle sets from the persisted (id, shingles)
    frame, which is never shuffled: the candidate side is orders of
    magnitude smaller and broadcast-joins against it. Persisted frames:
    (id, shingles) — shingling pass, both verification joins — and
    (id, bucket) band rows — both sides of the candidate self-join. The
    candidate shuffle carries only 8-byte bucket keys.
    """
    if frames is not None:
        base, band_rows = frames
    else:
        base, band_rows = _shingle_band_frames(
            df, text_col, id_col, n_hashes, bands, k, persist=persist_shingles
        )
    cand, hot_stats = _band_candidates(
        band_rows, max_bucket_size, persist=persist_shingles
    )
    if hot_stats is not None:
        # driver-side telemetry (operators/metrics.py): how many buckets
        # tripped the ceiling and how many band rows sit in them — the two
        # numbers the hot-cluster SCALING.md rung reports
        from migdar_data_pipelines_spark.operators import metrics as _metrics

        for k_, v_ in hot_stats.items():
            _metrics.record(k_, v_)

    # Verify only the candidates with true Jaccard over shingle sets. The
    # candidate side is broadcast in both lookups ONLY when its EXACT size
    # proves it small: the candidate frame is persisted (it has to be
    # computed for verification anyway) and counted — an eager driver
    # action at plan-construction time, after which the main pass reads
    # the pinned pairs instead of re-running the bucket join. A
    # high-duplication corpus makes the candidate list O(dup pairs) — far
    # past executor memory at 100 TB — so past the ceiling the
    # verification runs as ordinary shuffle joins on id (AQE may still
    # broadcast from its runtime estimate, but only the plan-time hint
    # keeps the corpus-side shingle frame out of the exchange). When the
    # frames aren't persisted the count would recompute the whole
    # signature pipeline, so we skip the hint and let AQE decide.
    if persist_shingles:
        cand = scoped_persist(cand)
        if verify_hints is not None:
            hint, fat_hint = verify_hints
        else:
            hint, fat_hint = _verify_hints(
                cand,
                base.select(F.col("id").alias("id_a"), F.size("__sh").alias("__asz")),
                "id_a",
                MAX_BROADCAST_CANDIDATE_PAIRS
                if max_broadcast_candidates is None
                else max_broadcast_candidates,
                _SHINGLE_ELEM_BYTES,
            )
    else:
        hint = fat_hint = False
    sh_df = base.select(F.col("id").alias("__sid"), F.col("__sh"))
    cand = (
        (F.broadcast(cand) if hint else cand)
        .join(sh_df, F.col("id_a") == F.col("__sid"))
        .withColumnRenamed("__sh", "sh_a")
        .drop("__sid")
    )
    if gate_observation is not None:
        # every cand row has exactly one base row (its id_a came from these
        # very rows), so the joined frame carries the same (n, sum |sh_a|)
        # the eager gate aggregates — observe it here for free
        cand = cand.observe(
            gate_observation,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.size("sh_a")), F.lit(0)).alias("elems"),
        )
    # the second hop's left side carries sh_a — rows are arrays, not id
    # pairs, so its broadcast is gated on estimated BYTES, not row count
    cand = (
        (F.broadcast(cand) if fat_hint else cand)
        .join(sh_df, F.col("id_b") == F.col("__sid"))
        .withColumnRenamed("__sh", "sh_b")
        .drop("__sid")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        cand.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def index_probe_frames(
    increment: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    bands: int = 16,
    k: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """The PERSISTABLE probe state of a corpus increment — what a standing
    index must keep on disk so later batches can probe it WITHOUT
    re-shingling the whole corpus (the O(index)-compute-per-micro-batch trap
    `incremental_dedup` pays when handed raw text):

      * hashes — (id, h): per-doc content md5, the exact tier;
      * bands  — (id, bucket): the banded-minhash rows, the near tier.

    Same fixed salts as every LSH entry point, so state built batch-by-batch
    shares one bucket space. ~bands+1 skinny rows per doc — a few hundred
    bytes each, disk-bounded like the corpus itself."""
    h = increment.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("h")
    )
    _, band_rows = _shingle_band_frames(
        increment, text_col, id_col, n_hashes, bands, k, persist=False
    )
    return h, band_rows.select("id", "bucket")


def incremental_dedup_prepared(
    batch: DataFrame,
    index_hashes: DataFrame,
    index_bands: DataFrame,
    index_texts: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    bands: int = 16,
    k: int = 3,
    jaccard_threshold: float = 0.8,
    max_broadcast_candidates: int | None = None,
    max_index_bucket: int | None = MAX_LSH_BUCKET_SIZE,
    batch_frames: tuple[DataFrame, DataFrame] | None = None,
    batch_hashes: DataFrame | None = None,
    verify_hints: tuple[bool, bool] | None = None,
    gate_observation=None,
) -> DataFrame:
    """``incremental_dedup`` against PERSISTED probe state (VERDICT r13 #4's
    index-growth rung made this load-bearing): the standing corpus's md5 set
    and band table arrive as parquet-backed frames built once per increment
    (:func:`index_probe_frames`), so a micro-batch pays

      * O(batch) shingle/signature compute (its own rows only),
      * a broadcast probe of its band rows against the stored band table
        (skinny (id, bucket) scan — no index text touched, no index shuffle),
      * verification shingling for ONLY the candidate index docs (a
        semi-join against ``index_texts`` by candidate id),

    instead of re-shingling and re-minhashing the ENTIRE index per batch.
    Output is bit-identical to ``incremental_dedup`` on the same corpus
    (asserted in tests): same salts -> same buckets; verification recomputes
    the same shingles from the same text; the hot-index-bucket ceiling is
    applied per matched bucket as a dense_rank over candidate index ids —
    the same smallest-``max_index_bucket``-ids keep-set as the pre-join
    row_number form, computed over O(candidates) rows instead of a window
    over the full band table.

    ``batch_frames`` / ``batch_hashes`` optionally supply the batch's
    prebuilt probe-state frames — the persisted ``(base, band_rows)`` pair
    from :func:`_shingle_band_frames` and the ``(id, h)`` md5 frame — so a
    caller that already built them (streaming_curate shares one set across
    the within-batch LSH, this probe, and the per-batch state writes)
    never recomputes the shingle/signature pipeline. Bit-identical output:
    the frames are the same deterministic fixed-salt construction.

    ``verify_hints`` / ``gate_observation``: as in :func:`minhash_lsh_pairs`
    — carry the broadcast-gate decision in from a previous invocation
    instead of the eager count job, and measure this invocation's exact
    (n, elems) as a side-effect of the caller's action.

    Returns one row per batch doc: (id, dup_exact, n_near_index, is_new)."""
    if batch_hashes is not None:
        bh = batch_hashes.select("id", F.col("h").alias("__h"))
    else:
        bh = batch.select(
            F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("__h")
        )
    ih = (
        index_hashes.select(F.col("h").alias("__h"))
        .dropDuplicates(["__h"])
        .withColumn("__hit", F.lit(True))
    )
    exact = bh.join(ih, "__h", "left").select(
        "id", F.coalesce("__hit", F.lit(False)).alias("dup_exact")
    )

    if batch_frames is not None:
        b_base, b_bands = batch_frames
    else:
        b_base, b_bands = _shingle_band_frames(
            batch, text_col, id_col, n_hashes, bands, k
        )
    i_sel = index_bands.select("bucket", F.col("id").alias("id_i"))
    if max_index_bucket is not None:
        from pyspark.sql import Window

        # same keep-set as incremental_dedup's pre-join ceiling (smallest
        # max_index_bucket ids per bucket), but ranked only over buckets the
        # batch actually probes — the broadcast semi-join first shrinks the
        # window's input to matched buckets, so the guard never windows the
        # full standing band table
        i_sel = i_sel.join(
            F.broadcast(b_bands.select("bucket").distinct()), "bucket"
        )
        w_bkt = Window.partitionBy("bucket").orderBy("id_i")
        i_sel = (
            i_sel.withColumn("__rk", F.row_number().over(w_bkt))
            .filter(F.col("__rk") <= max_index_bucket)
            .drop("__rk")
        )
    cand = (
        F.broadcast(b_bands.select("bucket", F.col("id").alias("id_b")))
        .join(i_sel, "bucket")
        .select("id_b", "id_i")
        .dropDuplicates(["id_b", "id_i"])
    )
    cand = scoped_persist(cand)
    if verify_hints is not None:
        hint, fat_hint = verify_hints
    else:
        hint, fat_hint = _verify_hints(
            cand,
            b_base.select(F.col("id").alias("id_b"), F.size("__sh").alias("__asz")),
            "id_b",
            MAX_BROADCAST_CANDIDATE_PAIRS
            if max_broadcast_candidates is None
            else max_broadcast_candidates,
            _SHINGLE_ELEM_BYTES,
        )
    # verification shingles for ONLY the candidate index docs: semi-join the
    # corpus text by candidate id (the id set is bounded by the persisted
    # candidate count the hint gate just measured), then shingle those rows
    i_ids = cand.select(F.col("id_i").alias("__iid")).distinct()
    i_cand = index_texts.join(
        (F.broadcast(i_ids) if hint else i_ids),
        F.col(id_col) == F.col("__iid"),
    )
    i_base = i_cand.select(
        F.col(id_col).alias("id"), shingles(text_col, k).alias("__sh")
    )
    cand = (
        (F.broadcast(cand) if hint else cand)
        .join(b_base.select(F.col("id").alias("__sid"), F.col("__sh").alias("sh_b")),
              F.col("id_b") == F.col("__sid"))
        .drop("__sid")
    )
    if gate_observation is not None:
        # same free (n, elems) measurement as minhash_lsh_pairs: the join
        # with the batch's own shingle frame preserves every cand row
        cand = cand.observe(
            gate_observation,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.size("sh_b")), F.lit(0)).alias("elems"),
        )
    cand = (
        (F.broadcast(cand) if fat_hint else cand)
        .join(i_base.select(F.col("id").alias("__sid"), F.col("__sh").alias("sh_i")),
              F.col("id_i") == F.col("__sid"))
        .drop("__sid")
    )
    inter = F.size(F.array_intersect("sh_b", "sh_i")).cast("double")
    union = F.size(F.array_union("sh_b", "sh_i")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    near_counts = (
        cand.filter(F.round(jac, 4) >= jaccard_threshold)
        .groupBy("id_b")
        .agg(F.countDistinct("id_i").alias("n_near_index"))
    )
    return (
        exact.join(near_counts, exact["id"] == near_counts["id_b"], "left")
        .select(
            "id",
            "dup_exact",
            F.coalesce("n_near_index", F.lit(0)).cast("long").alias("n_near_index"),
            (~F.col("dup_exact") & F.coalesce("n_near_index", F.lit(0)).eqNullSafe(0)).alias(
                "is_new"
            ),
        )
    )


def incremental_dedup(
    batch: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    bands: int = 16,
    k: int = 3,
    jaccard_threshold: float = 0.8,
    max_broadcast_candidates: int | None = None,
    max_index_bucket: int | None = MAX_LSH_BUCKET_SIZE,
) -> DataFrame:
    """Dedup a NEW batch against a STANDING corpus — the production shape at
    100 TB: the corpus is never re-deduped; the daily increment probes it.

    ``max_index_bucket`` closes the last unguarded band-join shape: a hot
    INDEX bucket (a >ceiling near-identical template cluster in the
    standing corpus) would otherwise emit batch-docs-in-bucket x M
    candidates from one key. Per bucket, only the ``max_index_bucket``
    smallest-id index members are probed — a literal ``row_number() <= k``
    filter Spark rewrites to a map-side WindowGroupLimit below the
    exchange, so the hot bucket's rows never funnel un-pruned. Semantics
    above the ceiling: ``n_near_index`` becomes a LOWER BOUND (capped at
    the ceiling) and ``is_new`` stays correct whenever the batch doc
    verifies against any of the kept members — for a genuinely
    near-identical cluster, all of them. Below the ceiling (every driver
    rung; tested) output is bit-identical. None disables.

    Two tiers, neither of which shuffles the index:
      * exact — the batch's content md5 left-joins the index's distinct-hash
        set (``dup_exact``);
      * near  — batch LSH band-buckets equi-join the index's band table
        (same fixed salts, so separately-built frames share a bucket space),
        candidates verified with true shingle Jaccard (``n_near_index`` =
        distinct index docs at >= threshold).

    The BATCH side of the probe join is explicitly broadcast (a daily
    increment is orders of magnitude smaller than the corpus), so the index
    band table is streamed map-side — no index shuffle; with the band table
    persisted as parquet bucketed by ``bucket`` this is the write-once /
    probe-many layout, same as the persisted IVF index
    (similarity.py::ivf_write_index).

    Returns one row per batch doc: (id, dup_exact, n_near_index, is_new).

    NOTE — eager construction: building this plan persists and counts the
    probe-join candidate frame (the broadcast-gate decision is made at
    plan time), so Spark jobs run before the caller's first action; the
    counted candidates are pinned and reused by the verification pass.
    """
    bh = batch.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("__h"))
    ih = (
        index.select(F.md5(F.col(text_col)).alias("__h"))
        .dropDuplicates(["__h"])
        .withColumn("__hit", F.lit(True))
    )
    exact = bh.join(ih, "__h", "left").select(
        "id", F.coalesce("__hit", F.lit(False)).alias("dup_exact")
    )

    b_base, b_bands = _shingle_band_frames(batch, text_col, id_col, n_hashes, bands, k)
    i_base, i_bands = _shingle_band_frames(index, text_col, id_col, n_hashes, bands, k)
    i_sel = i_bands.select("bucket", F.col("id").alias("id_i"))
    if max_index_bucket is not None:
        from pyspark.sql import Window

        w_bkt = Window.partitionBy("bucket").orderBy("id_i")
        i_sel = (
            i_sel.withColumn("__rk", F.row_number().over(w_bkt))
            .filter(F.col("__rk") <= max_index_bucket)
            .drop("__rk")
        )
    cand = (
        F.broadcast(b_bands.select("bucket", F.col("id").alias("id_b")))
        .join(i_sel, "bucket")
        .select("id_b", "id_i")
        .dropDuplicates(["id_b", "id_i"])
    )
    # Verification: the candidate side gets a broadcast hint ONLY when its
    # exact count proves it small (same persist-and-count gate as
    # minhash_lsh_pairs — a high-dup batch against a big index makes the
    # candidate list O(batch x index dup pairs), past executor memory at
    # scale); above the ceiling these run as shuffle joins on id.
    cand = scoped_persist(cand)
    hint, fat_hint = _verify_hints(
        cand,
        b_base.select(F.col("id").alias("id_b"), F.size("__sh").alias("__asz")),
        "id_b",
        MAX_BROADCAST_CANDIDATE_PAIRS
        if max_broadcast_candidates is None
        else max_broadcast_candidates,
        _SHINGLE_ELEM_BYTES,
    )
    cand = (
        (F.broadcast(cand) if hint else cand)
        .join(b_base.select(F.col("id").alias("__sid"), F.col("__sh").alias("sh_b")),
              F.col("id_b") == F.col("__sid"))
        .drop("__sid")
    )
    # second hop carries sh_b arrays — byte-gated, not row-count-gated
    cand = (
        (F.broadcast(cand) if fat_hint else cand)
        .join(i_base.select(F.col("id").alias("__sid"), F.col("__sh").alias("sh_i")),
              F.col("id_i") == F.col("__sid"))
        .drop("__sid")
    )
    inter = F.size(F.array_intersect("sh_b", "sh_i")).cast("double")
    union = F.size(F.array_union("sh_b", "sh_i")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    near_counts = (
        cand.filter(F.round(jac, 4) >= jaccard_threshold)
        .groupBy("id_b")
        .agg(F.countDistinct("id_i").alias("n_near_index"))
    )
    return (
        exact.join(near_counts, exact["id"] == near_counts["id_b"], "left")
        .select(
            "id",
            "dup_exact",
            F.coalesce("n_near_index", F.lit(0)).cast("long").alias("n_near_index"),
            (~F.col("dup_exact") & F.coalesce("n_near_index", F.lit(0)).eqNullSafe(0)).alias(
                "is_new"
            ),
        )
    )


# Edge-count ceiling for the driver-local union-find fast path of
# connected_components. The alternating-star loop pays a FIXED driver cost
# per round that is independent of data size — measured ~10 Spark jobs of
# 10-75 ms (AQE stage materializations, the checkpoint, the observation)
# plus ~0.3 s of per-round plan building, ~0.4-0.9 s/round, times ~5-7
# rounds at every CC consumer. Below this ceiling the normalized edge set
# is provably tiny (two longs per row, ~3 MB collected at the ceiling —
# the same order as the broadcast-gate frames this engine already
# collects), and an exact driver-side union-find with min-id roots
# produces the IDENTICAL labelling in milliseconds with zero jobs beyond
# the collect. Above it the distributed O(log n) loop runs unchanged —
# this is a size-gated plan choice like the LSH broadcast gates, not a
# scale compromise: at 100 TB the edge count exceeds any ceiling and the
# star loop is the path.
MAX_DRIVER_CC_EDGES = 200_000


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 16,
    max_driver_edges: int | None = None,
) -> DataFrame:
    """Connected components over an undirected pair list: every node labelled
    with the MINIMUM id of its component. Returns (id, comp), one row per
    non-isolated node (callers coalesce isolated rows to their own id —
    see ``canonical_groups``).

    Two size-gated execution tiers, identical output:

    * **driver union-find** when the normalized edge count (measured by an
      Observation riding the initial checkpoint — no extra job) is at most
      ``max_driver_edges`` (default ``MAX_DRIVER_CC_EDGES``; 0 disables):
      the tiny (u, v) long pairs are collected and labelled exactly with
      union-by-min + path compression — milliseconds, zero per-round jobs.
      Min-id roots are an invariant of union-by-min, so the labelling is
      bit-identical to the star loop's fixed point.
    * **alternating large-star / small-star** above the ceiling (the
      MapReduce CC algorithm of Kiveris et al., "Connected Components in
      MapReduce and Beyond"), expressed as pure DataFrame ops. Each round:

      * large-star: every node connects its LARGER neighbours to the minimum
        of its neighbourhood (incl. itself);
      * small-star: every node connects its smaller-or-equal neighbours and
        itself to that minimum.

    Both are a groupBy(min) + a join, i.e. two hash shuffles keyed on node
    id, and the edge set provably converges to stars centred at each
    component's minimum in O(log n) rounds (dedup near-dup graphs — cliques
    plus short bridges — converge in 2-3). Convergence is detected by
    comparing a (count, xxhash64-xor) signature of the edge set between
    rounds: one cheap aggregate per round instead of a set-difference join.

    Scale notes (100 TB): the shuffled payload is only (long, long) edge
    rows, and the edge count MONOTONICALLY shrinks toward one edge per
    non-root node — iterations get cheaper. Each round is eagerly
    local-checkpointed: lineage truncation is what keeps per-round Catalyst
    planning cost constant (see the loop comment), and no round ever
    re-executes. Skew: a
    giant near-dup cluster turns its root into a hot key in the final
    rounds' groupBy; min() is an algebraic aggregate so map-side partial
    aggregation collapses the hot key before the exchange.
    """
    from pyspark.sql import Observation

    from ..operators.metrics import record

    # Materialize the normalized edge set ONCE before iterating: round 1's
    # star(star(...)) references its input plan several times, and without a
    # checkpoint each reference re-executes the (possibly expensive — LSH,
    # shingling) pair-generation subtree. After this the loop only ever sees
    # (long, long) leaf frames. The edge count rides the checkpoint as an
    # Observation (same trick as the round signature below) — it decides the
    # execution tier for free.
    obs0 = Observation()
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .dropDuplicates(["u", "v"])
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_norm_edges = int(obs0.get["n"])
    ceiling = MAX_DRIVER_CC_EDGES if max_driver_edges is None else max_driver_edges
    if n_norm_edges <= ceiling:
        # Driver tier: exact union-find with min-id roots over the already
        # checkpointed edges (~16 bytes/row — broadcast-gate-sized at the
        # ceiling). Union-by-min keeps every tree's root its minimum member,
        # so find(x) is exactly the component minimum the star loop
        # converges to.
        record("cc_driver_edges", n_norm_edges)
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for row in edges.collect():
            u, v = row[0], row[1]
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        spark = pairs.sparkSession
        id_type = edges.schema["u"].dataType
        from pyspark.sql import types as T

        out_schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("comp", id_type)]
        )
        labels = [(x, find(x)) for x in parent]
        if not labels:
            return local_df(spark, [], out_schema)
        # Arrow-backed conversion (session enables arrow.pyspark): one
        # columnar batch instead of per-row pickling for up to ~2x ceiling
        # label rows.
        pdf = pd.DataFrame(labels, columns=["id", "comp"])
        return spark.createDataFrame(pdf, schema=out_schema)

    def nbrs(e: DataFrame) -> DataFrame:
        return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def star(e: DataFrame, large: bool) -> DataFrame:
        nb = nbrs(e)
        m = (
            nb.groupBy("u")
            .agg(F.min("v").alias("__mn"))
            .select("u", F.least("u", "__mn").alias("m"))
        )
        j = nb.join(m, "u")
        kept = j.filter(F.col("v") > F.col("u")) if large else j.filter(F.col("v") <= F.col("u"))
        out = kept.select(F.col("v").alias("u"), F.col("m").alias("v"))
        if not large:
            # small-star also re-points the node itself at its minimum —
            # without this edge a node with only smaller neighbours would
            # disconnect from its component.
            out = out.unionByName(m.select("u", F.col("m").alias("v")))
        return out.filter(F.col("u") != F.col("v")).dropDuplicates(["u", "v"])

    prev_sig = None
    rounds = 0
    n_edges0 = 0
    for rounds in range(1, max_iter + 1):
        # localCheckpoint, not persist: each star references its input plan
        # FOUR times (both union arms of the neighbourhood view, the min
        # aggregate, the re-join), so round k's *logical plan* would hold
        # 4^k copies of round 0 — Catalyst re-analyzes the whole tree even
        # when the data is cached, and the loop stops being bounded by data
        # long before max_iter. Eager local checkpointing materializes the
        # round AND truncates lineage to a leaf, keeping per-round planning
        # cost constant. (On a real cluster prefer a reliable checkpoint dir
        # if executor loss during the loop must be survivable.)
        #
        # The convergence signature RIDES the checkpoint action as an
        # Observation (accumulator side-channel of the same pass): one job
        # per round instead of two, and no second full scan of the edge
        # frame — at scale each saved pass is a whole read of the edge set.
        # XOR fold, not sum: order-independent over the distinct edge rows
        # and can't overflow under ANSI mode (sum of full-range longs throws).
        obs = Observation()
        edges = (
            star(star(edges, large=True), large=False)
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
        row = obs.get
        sig = (row["n"], row["h"])
        if rounds == 1:
            n_edges0 = int(row["n"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # driver-side diagnostic: the scale harness reports rounds next to wall
    # time (a CC rung that slowed down may simply have run more rounds)
    record("cc_rounds", rounds)
    # Rounds budget (VERDICT r10 #5): alternating large-star/small-star
    # converges in O(log n) rounds, so rounds materially past
    # ceil(log2(n)) + 2 means the candidate graph's DIAMETER is growing
    # with the corpus — the trend that multiplies every per-round shuffle
    # at 100x scale and should surface as a loud warning long before a
    # 100x run, not as a mysterious 3x wall regression. n is the round-1
    # edge count (already computed for the convergence signature; no extra
    # job). Mutual-kNN's 200k ANN rung measured 7 rounds vs a budget of
    # 2 + log2(~550k edges) = 22 — headroom recorded, drift observable.
    budget = 2 + max(1, math.ceil(math.log2(max(2, n_edges0))))
    record("cc_rounds_budget", budget)
    record("cc_edges_round1", n_edges0)
    if rounds > budget:
        import warnings

        warnings.warn(
            f"connected_components used {rounds} rounds for {n_edges0} "
            f"round-1 edges (O(log n) budget {budget}) — the pair graph's "
            "diameter is growing with the corpus; expect per-round shuffle "
            "costs to multiply at scale",
            RuntimeWarning,
            stacklevel=2,
        )

    # Converged: every edge is (node, component-min). Roots appear only on
    # the v side; the defensive min() collapses any duplicate child rows.
    labels = edges.select(F.col("u").alias("id"), F.col("v").alias("comp"))
    roots = edges.select(F.col("v").alias("id")).distinct().withColumn(
        "comp", F.col("id")
    )
    return labels.unionByName(roots).groupBy("id").agg(F.min("comp").alias("comp"))


def canonical_groups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Assign every row of ``df`` to its dedup group: ``canonical_id`` = the
    minimum id of its connected component over ``pairs`` (its own id when
    unpaired), plus ``group_size``. This is the operator a training-data
    pipeline actually consumes — "keep one doc per group" is then a single
    ``filter(col(id) == col('canonical_id'))``.

    Scale notes: the label frame holds only PAIRED nodes (usually a small
    fraction of the corpus), left-joined on id — AQE broadcasts it when it
    fits, falls back to a shuffle join when the dup rate is high. group_size
    comes from one count-window partitioned by canonical_id (a single
    shuffle keyed on the group, no extra join)."""
    from pyspark.sql import Window

    comp = connected_components(pairs, id_a, id_b)
    out = (
        df.join(
            comp.withColumnRenamed("id", "__cc_id"),
            F.col(id_col) == F.col("__cc_id"),
            "left",
        )
        .withColumn("canonical_id", F.coalesce(F.col("comp"), F.col(id_col)))
        .drop("__cc_id", "comp")
    )
    w = Window.partitionBy("canonical_id")
    return out.withColumn("group_size", F.count(F.lit(1)).over(w))


def simhash(col: Column | str, bits: int = 16) -> Column:
    """SimHash over words: per-word hash = first ``bits/4`` md5 hex digits,
    signature bit i = sign of sum over words of (+1 if bit set else -1).
    Pure expressions: explode the bit index, weigh, re-fold. Wider signatures
    (32/64 bits) discriminate better — banded hamming search bucket sizes
    shrink exponentially with band width — at O(bits x words) fold cost."""
    assert bits % 4 == 0 and bits <= 52, "bits must be a multiple of 4, <= 52"
    ws = words(col)
    word_h = F.transform(
        ws, lambda w: F.conv(F.substring(F.md5(w), 1, bits // 4), 16, 10).cast("long")
    )
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))
    # shiftright/shiftleft need literal shift counts; with a Column index use
    # pow(2, i) arithmetic instead (exact for bits <= 52 in double).
    pow2 = lambda i: F.pow(F.lit(2.0), i.cast("double")).cast("long")  # noqa: E731
    bit_sums = F.transform(
        bit_idx,
        lambda i: F.aggregate(
            word_h,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when((h / pow2(i)).cast("long") % 2 == 1, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_sums,
            bit_idx,
            lambda s, i: F.when(s > 0, pow2(i)).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def simhash_fast(col: Column | str, bits: int = 16) -> Column:
    """Signature-identical fast path for :func:`simhash`: same word split,
    same md5-prefix word hash, same sign-of-sums bits — but the per-word
    bit fold runs as one numpy matrix op per Arrow batch instead of Spark's
    interpreted higher-order-function chain, which is O(bits x words) of
    per-element closure evaluation (measured 11s for 32-bit signatures over
    10k docs vs ~1.5s here; the expression form stays as the
    oracle-mirroring reference implementation, equality is unit-tested)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    assert bits % 4 == 0 and bits <= 52, "bits must be a multiple of 4, <= 52"
    nhex = bits // 4

    @pandas_udf("long")
    def _sh(ws: pd.Series) -> pd.Series:
        import hashlib as _hashlib

        shifts = np.arange(bits, dtype=np.int64)
        out = np.zeros(len(ws), dtype=np.int64)
        for row_i, words_list in enumerate(ws):
            if words_list is None or len(words_list) == 0:
                continue
            hs = np.fromiter(
                (
                    int(_hashlib.md5(w.encode()).hexdigest()[:nhex], 16)
                    for w in words_list
                ),
                dtype=np.int64,
                count=len(words_list),
            )
            sums = (2 * ((hs[:, None] >> shifts[None, :]) & 1) - 1).sum(axis=0)
            out[row_i] = int(((sums > 0).astype(np.int64) << shifts).sum())
        return pd.Series(out)

    return _sh(words(col))


def simhash_near_dup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bits: int = 16,
    max_bucket_size: int | None = MAX_LSH_BUCKET_SIZE,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, found by BANDED bucketing
    — the candidate generator that turns SimHash signatures into an actual
    dedup operator (``simhash`` alone only computes them).

    Pigeonhole losslessness: splitting a ``bits``-wide signature into
    ``max_hamming + 1`` bands guarantees any pair within ``max_hamming``
    flipped bits agrees EXACTLY on at least one whole band, so an equi-join
    on (band index, band value) generates every qualifying pair; the exact
    ``bit_count(xor)`` check rides in the join condition and duplicates
    (pairs agreeing on several bands) collapse with one dropDuplicates.
    Returns (id_a, id_b, hamming).

    ``max_bucket_size`` is the per-band-bucket cardinality ceiling
    (``MAX_LSH_BUCKET_SIZE``; None disables), shared with the minhash path
    via :func:`_band_candidates`: a near-identical template cluster lands
    in the same (band, value) bucket in EVERY band — O(M^2) pairs from one
    key — and, worse than minhash, the band keyspace here is structurally
    tiny (2^(bits/bands) values per band), so bucket occupancy grows
    linearly with the corpus and the self-join trends quadratic even
    without an adversarial cluster. Above the ceiling a bucket emits
    linear star pairs hamming-verified against its min-id representative;
    below it the output is bit-identical to the unguarded plan
    (equality-tested). A member within ``max_hamming`` of some nearer
    member but past it vs the representative is the documented recall
    trade; a pair suppressed in one hot band is still found by any other
    band where the two ids share a below-ceiling bucket.

    Scale notes: signatures are computed once (persisted — the bit-fold over
    every word occurrence is the expensive part) and the join shuffles
    (band-bucket key, 8-byte signature) rows — never text. Bucket sizes
    shrink exponentially with band width, so at corpus scale use a wider
    word hash + signature — e.g. ``bits=48`` keeps hamming <= 3 banding at
    4096 values per band (the registered ``simhash_near_dup_pairs_wide``
    variant); narrow defaults emit a RuntimeWarning below. The 16-bit
    default keeps the reference word-hash arithmetic so the oracle
    reproduces it digit-for-digit."""
    bands = max_hamming + 1
    assert bits % bands == 0, "bits must divide into max_hamming+1 bands"
    width = bits // bands
    if (1 << width) <= 256:
        warnings.warn(
            f"simhash_near_dup: {bits}-bit signature / {bands} bands gives "
            f"only {1 << width} distinct values per band — bucket occupancy "
            "grows linearly with the corpus and the band join trends "
            "quadratic at scale (the hot-bucket ceiling caps it to linear "
            "star pairs, at a recall trade). For corpus-scale runs use a "
            "wider signature, e.g. bits=48 for hamming<=3.",
            RuntimeWarning,
            stacklevel=2,
        )
    mask = (1 << width) - 1
    # NOT widened (measured, round 14): the Arrow bit-fold is one batched
    # kernel pass per row — light enough that widen_scan's exchange + probe
    # cost more at gate scale (simhash_near_dup_pairs_wide solo medians
    # 1.21s widened vs 0.89s unwidened; plain 1.29 vs 1.22).
    base = scoped_persist(
        df.select(F.col(id_col).alias("id"), simhash_fast(text_col, bits).alias("sh"))
    )
    # one long key per (band, value): band index folded into the high bits
    bucket_arr = F.array(
        *[
            (
                F.shiftright(F.col("sh"), width * i).bitwiseAND(mask)
                + F.lit(i * (mask + 1))
            ).cast("long")
            for i in range(bands)
        ]
    )
    band_rows = scoped_persist(
        base.select("id", "sh", F.explode(bucket_arr).alias("bucket"))
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    cand, hot_stats = _band_candidates(
        band_rows,
        max_bucket_size,
        persist=True,
        payload_cols=("sh",),
        pair_filter=hamming <= max_hamming,
    )
    if hot_stats is not None:
        from migdar_data_pipelines_spark.operators import metrics as _metrics

        for k_, v_ in hot_stats.items():
            _metrics.record(k_, v_)
    return cand.select("id_a", "id_b", hamming.cast("long").alias("hamming"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    block_col: Column | str | None = None,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via an inverted gram index (never a cross
    join, never a per-pair array intersection). Default block: document
    length bucket; pairs are scored only within a block.

    Shape: explode distinct grams to an inverted index, equi-join it with
    itself on (block, gram) — so only pairs sharing >=1 gram ever exist —
    and count the hits per pair: that count IS |A∩B| (grams are distinct per
    doc), and |A∪B| = |A| + |B| - |A∩B| from per-doc gram counts carried on
    the index rows. The old shape (all same-block pairs, then
    ``array_intersect`` per pair) is quadratic in block size with an
    interpreted set op on every pair — 245s at sf0.1 (10k docs, ~1.3k-doc
    blocks) vs ~10s for the index join, identical output.

    Scale notes (100 TB): the only shuffles are the gram-index self-join
    (keyed on (block, gram) — row count = total distinct grams, not pairs)
    and the pair-count aggregation, whose map-side partial aggregation
    collapses each pair's hits before the exchange. Ultra-frequent grams are
    the skew risk: AQE skew-join splitting handles moderate cases; for
    web-scale corpora add a document-frequency cap or PPJoin-style prefix
    filtering on top (both prune candidates, so with a cap the result is a
    superset-safe approximation — flag it, don't silently drop exactness).

    Requires threshold > 0 (pairs sharing no gram are never produced; they
    have jaccard 0).
    """
    assert threshold > 0, "ngram_jaccard_pairs requires threshold > 0"
    grams = shingles(text_col, n)
    block = (
        (F.col(block_col) if isinstance(block_col, str) else block_col)
        if block_col is not None
        else (F.length(text_col) / F.lit(64)).cast("long")
    )
    base = widen_scan(df, id_col).select(
        F.col(id_col).alias("id"), grams.alias("g"), block.alias("blk")
    )
    # The self-join reads the index from BOTH sides; without a persist each
    # side re-runs the shingling+explode subtree (regex split + distinct per
    # doc — the expensive part, measured ~40% of the query). Scoped-persisted
    # so the per-query release hook frees the blocks after the action.
    idx = scoped_persist(
        base.select("blk", "id", F.size("g").alias("sz"), F.explode("g").alias("gram"))
    )
    a = idx.select(
        "blk", "gram", F.col("id").alias("id_a"), F.col("sz").alias("sz_a")
    )
    b = idx.select(
        F.col("blk").alias("blk_b"),
        F.col("gram").alias("gram_b"),
        F.col("id").alias("id_b"),
        F.col("sz").alias("sz_b"),
    )
    hits = a.join(
        b,
        (F.col("blk") == F.col("blk_b"))
        & (F.col("gram") == F.col("gram_b"))
        & (F.col("id_a") < F.col("id_b")),
    )
    pair = hits.groupBy("id_a", "id_b", "sz_a", "sz_b").agg(
        F.count(F.lit(1)).alias("inter")
    )
    union = (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
    jac = F.col("inter").cast("double") / union
    return (
        pair.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_blocked_kernel(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    block_col: Column | str | None = None,
    threshold: float = 0.3,
    chunk_pairs: int = 4_000_000,
) -> DataFrame:
    """Exact n-gram Jaccard pairs with a per-block numpy kernel instead of
    the inverted-index join — identical output to ``ngram_jaccard_pairs``.

    Each block's exploded (doc, gram) index arrives as one ``applyInPandas``
    group; pair generation is the classic segment trick, fully vectorized:
    sort by (gram, doc), then every row pairs with its gram's whole segment,
    and the (left, right) arrays come from ``repeat``/``cumsum`` arithmetic —
    no Python loop over grams, no scipy. Shared-gram counts are aggregated
    with ``np.unique``/``bincount`` on packed positional pair keys, chunked
    so peak memory is O(chunk_pairs). The kernel emits exact INTEGER
    (id_a, id_b, inter, sz_a, sz_b); the division, HALF_UP rounding and
    threshold filter run as Spark expressions — numpy's banker's rounding
    never touches the result, keeping oracle parity bit-exact.

    Trade-off vs the join path: no pair shuffle at all (the only exchange is
    grouping doc rows by block), but parallelism is bounded by the number
    of blocks and the largest block must fit one task's memory. Prefer this
    kernel when blocks are many and bounded (length buckets, LSH bands);
    prefer the join when a block can be huge or blocks are few.

    Shuffle payload (guide §2.3 — shuffle keys and metadata, not payloads):
    one row per DOC crosses the block exchange, carrying the doc's gram set
    as an ``array<long>`` of xxhash64 values — 8 bytes per gram instead of
    the gram string, and |docs| rows instead of |grams| exploded rows. Gram
    identity by 64-bit hash is the same house convention as the gopher
    dup-gram keys and the LSH bucket space (llm/textanalysis.py,
    _shingle_band_frames): a collision would merge two distinct grams
    (probability ~|grams|^2/2^64 — zero on every gate corpus, where the
    oracle hash-checks the output exactly); np.unique on int64 is also
    several times faster than on Python string objects, which was the
    kernel's dominant single step."""
    import numpy as np

    assert threshold > 0, "requires threshold > 0"
    grams = shingles(text_col, n)
    block = (
        (F.col(block_col) if isinstance(block_col, str) else block_col)
        if block_col is not None
        else (F.length(text_col) / F.lit(64)).cast("long")
    )
    # The gram fold + per-gram hashing below run in the scan stage; widen a
    # narrow input first so that per-row compute is not single-task
    # (operators/scale.py::widen_scan — no-op on wide production scans).
    base = widen_scan(df, id_col).select(
        F.col(id_col).alias("id"), grams.alias("g"), block.alias("blk")
    )
    idx = base.select(
        "blk",
        "id",
        F.size("g").alias("sz"),
        F.transform("g", lambda x: F.xxhash64(x)).alias("hs"),
    )

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n_docs = len(pdf)
        if n_docs < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "inter": [], "sz_a": [], "sz_b": []}
            ).astype("int64")
        ids = pdf["id"].to_numpy()
        order0 = np.argsort(ids, kind="stable")  # ids unique per block
        uids = ids[order0]
        sz_u = pdf["sz"].to_numpy()[order0]
        hs_list = pdf["hs"].to_numpy()[order0]
        lens = np.fromiter((len(h) for h in hs_list), dtype=np.int64, count=n_docs)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        allh = np.concatenate([np.asarray(h, dtype=np.int64) for h in hs_list])
        gid = np.unique(allh, return_inverse=True)[1]
        order = np.lexsort((doc_idx, gid))
        d, g = doc_idx[order], gid[order]
        counts = np.bincount(g)
        seg_start = np.concatenate(([0], np.cumsum(counts)))[:-1]
        row_len = counts[g]
        row_seg_start = seg_start[g]
        row_block_start = np.concatenate(([0], np.cumsum(row_len)))[:-1]
        # chunk row ranges so each emits <= chunk_pairs pair slots
        keys_all, cnts_all = [], []
        r0 = 0
        R = len(d)
        while r0 < R:
            r1 = r0
            budget = 0
            while r1 < R and budget + row_len[r1] <= chunk_pairs:
                budget += row_len[r1]
                r1 += 1
            r1 = max(r1, r0 + 1)
            rl = row_len[r0:r1]
            P = int(rl.sum())
            left = np.repeat(d[r0:r1], rl)
            block_start = np.repeat(
                row_block_start[r0:r1] - row_block_start[r0], rl
            )
            offset = np.arange(P, dtype=np.int64) - block_start
            right = d[np.repeat(row_seg_start[r0:r1], rl) + offset]
            keep = left < right
            packed = left[keep].astype(np.int64) * n_docs + right[keep]
            uk, uc = np.unique(packed, return_counts=True)
            keys_all.append(uk)
            cnts_all.append(uc)
            r0 = r1
        keys = np.concatenate(keys_all)
        cnts = np.concatenate(cnts_all)
        uk, inv = np.unique(keys, return_inverse=True)
        inter = np.bincount(inv, weights=cnts).astype(np.int64)
        pa, pb = uk // n_docs, uk % n_docs
        sz_a, sz_b = sz_u[pa], sz_u[pb]
        # lossless prefilter: jac <= inter/union exactly; margin for nothing —
        # the ints are exact — but keep the final decision in Spark anyway.
        union = sz_a + sz_b - inter
        keep = inter >= (threshold - 1e-9) * union
        return pd.DataFrame(
            {
                "id_a": uids[pa[keep]],
                "id_b": uids[pb[keep]],
                "inter": inter[keep],
                "sz_a": sz_a[keep],
                "sz_b": sz_b[keep],
            }
        )

    # Explicit kernel-stage width: the (blk) exchange is kilobytes of hashed
    # gram arrays but feeds the CPU-heavy pair kernel — AQE's byte-based
    # coalescing serialized it to 2 tasks on a 32-core session (guide §2.5);
    # the groupBy below reuses this partitioning, so no extra exchange.
    from ..operators.scale import partition_for_kernel

    cand = partition_for_kernel(idx, "blk").groupBy("blk").applyInPandas(
        _pairs, "id_a long, id_b long, inter long, sz_a long, sz_b long"
    )
    union = (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
    jac = F.col("inter").cast("double") / union
    return (
        cand.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_ppjoin(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    threshold: float = 0.8,
    block_col: Column | str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via PPJoin-style prefix filtering — the
    blocking-FREE candidate generator for high thresholds (the third strategy
    next to the inverted-index join and the per-block kernel; named as the
    scale rung in ``ngram_jaccard_pairs``'s docstring).

    AllPairs/PPJoin principle (Bayardo et al. WWW'07, Xiao et al. WWW'08):
    order every document's gram set by one global canonical order (document
    frequency ascending, gram ascending — rarest first), and keep only the
    first ``p = sz - ceil(t*sz) + 1`` grams as the *prefix*. Two sets with
    Jaccard >= t MUST share a prefix token under the same global order, so
    the inverted index is built over prefixes only — the ultra-frequent
    grams that blow up a full-index self-join sit at the END of the order
    and almost never enter a prefix. Candidates are further pruned by the
    length filter (min_sz >= t * max_sz) and PPJoin's positional filter
    (a shared token at sorted positions (i, j) caps the overlap at
    ``1 + min(sz_a-i-1, sz_b-j-1)``, which must reach the minimal overlap
    ``t/(1+t) * (sz_a+sz_b)``). Survivors are verified EXACTLY with a set
    intersection, so the output is identical to the other two strategies at
    the same threshold — the filters are lossless (each bound is slackened
    by the 4-dp output rounding, so a true jaccard of t - 0.00005 that
    rounds INTO the filter still generates its candidate).

    Scale notes (100 TB): no blocking column and no full-index self-join —
    the only wide ops are the gram document-frequency aggregation (a
    dictionary-sized groupBy), the prefix-index self-join (prefix tokens are
    ~(1-t) of the index, and frequency-ascending order makes the per-token
    candidate lists short), and the verify join keyed on doc id. The per-pair
    interpreted ``array_intersect`` touches only verified candidates, which
    at t >= 0.8 is a vanishing fraction of the corpus. Prefer this path at
    high thresholds on corpora where no natural block bounds pair growth;
    below t ~ 0.6 prefixes lengthen and the kernel/index strategies win.

    ``block_col`` composes the prefix filter WITH blocking (VERDICT r4 #7,
    folding the PPJoin filters into the inverted-index path): the prefix
    self-join keys on (block, gram) instead of gram, so candidates must
    share a block AND a prefix token — the prefix/length/positional bounds
    stay lossless within a block, and the oracle for the block-constrained
    query is the blocked one. This is the scale form for mid thresholds
    (t ~ 0.6) where a full inverted-index self-join pays k² hit expansion
    on every popular gram but pure prefix filtering alone admits too much.
    """
    assert 0.5 < threshold <= 1.0, "ppjoin needs a high threshold (> 0.5)"
    # Rounding slack: the final filter is round(jac, 4) >= threshold, so any
    # true jaccard >= threshold - 5e-5 can survive — every bound below uses
    # t_eff so no such pair is pruned (and FP ceil boundaries are avoided).
    t_eff = threshold - 0.5e-4
    grams = shingles(text_col, n)
    blk = (
        (F.col(block_col) if isinstance(block_col, str) else block_col)
        if block_col is not None
        else F.lit(0)
    )
    # NOT widened (measured, round 14): ppjoin's cost lives in the exchanges
    # and joins BELOW this base (prefix-index self-join, df-frequency agg),
    # not in the one-zip-pass gram fold — widen_scan measured a regression
    # here (solo medians 3.19s widened vs 2.70s unwidened; the blocked
    # invidx_prefix variant 3.23 vs 2.66).
    base = scoped_persist(
        df.select(
            F.col(id_col).alias("id"),
            grams.alias("g"),
            F.size(grams).alias("sz"),
            blk.alias("blk"),
        )
    )
    tok = base.select("id", "sz", "blk", F.explode("g").alias("gram"))
    # Global canonical order = (document frequency asc, gram asc). No global
    # rank is materialised — the (dfc, gram) struct itself is the sort key,
    # so ordering is a dictionary-sized aggregation plus a per-doc array_sort.
    dfreq = tok.groupBy("gram").agg(F.count(F.lit(1)).alias("dfc"))
    sorted_docs = (
        tok.join(dfreq, "gram")
        .groupBy("id", "sz", "blk")
        .agg(F.array_sort(F.collect_list(F.struct("dfc", "gram"))).alias("sg"))
    )
    p = (F.col("sz") - F.ceil(F.lit(t_eff) * F.col("sz")) + 1).cast("int")
    # PIN the prefix frame (guide §1.2/§5): both sides of the candidate
    # self-join below read it, and without the persist the ENTIRE pipeline
    # above — explode, the df-frequency aggregate, the frequency join and
    # the per-doc collect_list — executes twice, once per side (r15 plan
    # trace: the subtree appeared duplicated with no ReusedExchange; the
    # exchanges below the base were the query's measured cost, VERDICT r14
    # #5). The prefix rows are the ~(1-t) sliced head of each doc's sorted
    # grams — far smaller than the exploded token frame, so this is the
    # cheapest frame on the path that cuts the duplication.
    prefix = scoped_persist(
        sorted_docs.select(
            "id",
            "sz",
            "blk",
            F.posexplode(F.slice(F.col("sg.gram"), 1, p)).alias("pos", "gram"),
        )
    )
    a = prefix.select(
        "blk", "gram", F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), F.col("pos").alias("pa")
    )
    b = prefix.select(
        F.col("blk").alias("blk_b"),
        F.col("gram").alias("gram_b"),
        F.col("id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.col("pos").alias("pb"),
    )
    cand = (
        a.join(
            b,
            (F.col("blk") == F.col("blk_b"))
            & (F.col("gram") == F.col("gram_b"))
            & (F.col("id_a") < F.col("id_b"))
            # length filter: jac <= min_sz / max_sz
            & (F.least("sz_a", "sz_b") >= F.lit(t_eff) * F.greatest("sz_a", "sz_b")),
        )
        # One row per pair; min positions give the LOOSEST positional bound,
        # so aggregating before the filter stays lossless.
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.min("pa").alias("pa"), F.min("pb").alias("pb"))
        # positional filter: overlap <= 1 + min(remaining suffix lengths)
        .filter(
            F.lit(1)
            + F.least(
                F.col("sz_a") - F.col("pa") - 1, F.col("sz_b") - F.col("pb") - 1
            )
            >= F.lit(t_eff / (1.0 + t_eff)) * (F.col("sz_a") + F.col("sz_b"))
        )
        .select("id_a", "id_b")
    )
    # Exact verification on the surviving candidates only.
    ga = base.select(F.col("id").alias("id_a"), F.col("g").alias("g_a"))
    gb = base.select(F.col("id").alias("id_b"), F.col("g").alias("g_b"))
    verified = cand.join(ga, "id_a").join(gb, "id_b")
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = (F.size("g_a") + F.size("g_b") - inter).cast("double")
    jac = inter.cast("double") / union
    return (
        verified.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_near_dup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    threshold: float = 0.95,
    prefilter_coords: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a cell (blocked — the IVF-style
    scale path; cells from a coarse quantizer, here any cell column).

    Norms are computed ONCE per row before the pair join, not per pair: the
    per-vector sum order is unchanged, so the double result is bit-identical
    to an inline norm (oracle-safe), while the interpreted per-pair work
    drops from three array folds + two sqrts to one dot (see llm/linalg.py
    for why the fold, not an unrolled sum, is the fast dot).

    Coordinate prefilter (lossless): for unit vectors, cos(a,b) >= t implies
    ||a_n - b_n|| <= sqrt(2-2t), hence EVERY normalized coordinate differs by
    at most that bound. The first ``prefilter_coords`` normalized coordinates
    are precomputed per row and compared with plain codegen arithmetic before
    the interpreted dot ever runs — at t=0.99 each coordinate check passes
    ~58% of random pairs, so 4 checks drop ~89% of the dot products. The
    bound is slackened by the output rounding (a true cosine of t - 0.00005
    still rounds INTO the t filter) plus an FP margin, so no qualifying pair
    is ever pruned. Zero-norm vectors: ``try_divide`` yields NULL (ANSI mode
    THROWS on double/0.0 — plain ``/`` would crash the job on the first
    zero vector), NULL fails every comparison, so they never pair."""
    v = F.col(vec_col)
    nrm = norm(v)
    coord_cols = {
        f"c{i}": F.try_divide(v.getItem(i).cast("double"), nrm)
        for i in range(prefilter_coords)
    }
    base = df.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.col(cell_col).alias("cell"),
        nrm.alias("nrm"),
        *[c.alias(name) for name, c in coord_cols.items()],
    )
    a = base.select(
        "cell",
        F.col("id").alias("id_a"),
        F.col("v").alias("v_a"),
        F.col("nrm").alias("n_a"),
        *[F.col(n).alias(f"a_{n}") for n in coord_cols],
    )
    b = base.select(
        F.col("cell").alias("cell_b"),
        F.col("id").alias("id_b"),
        F.col("v").alias("v_b"),
        F.col("nrm").alias("n_b"),
        *[F.col(n).alias(f"b_{n}") for n in coord_cols],
    )
    # rounding slack: round(cos, 4) >= t admits true cosines down to
    # t - 0.00005; the distance bound must cover them (plus an FP margin).
    t_eff = threshold - 0.00005 - 1e-9
    bound = float((2.0 - 2.0 * t_eff) ** 0.5)
    cond = (F.col("cell") == F.col("cell_b")) & (F.col("id_a") < F.col("id_b"))
    for n in coord_cols:
        cond = cond & (F.abs(F.col(f"a_{n}") - F.col(f"b_{n}")) <= F.lit(bound))
    pairs = a.join(b, cond)
    cos = F.try_divide(dot(F.col("v_a"), F.col("v_b")), F.col("n_a") * F.col("n_b"))
    return (
        pairs.withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dup_matmul(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    threshold: float = 0.95,
    chunk_rows: int = 2048,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, two-tier: a vectorized numpy matmul
    per cell generates CANDIDATES under a safety margin, then the exact
    expression fold rescored only those — output identical to
    ``embedding_near_dup`` (and the SQL oracle) with a compiled inner loop.

    Tier 1 (candidates): ``applyInPandas`` per cell; vectors arrive as one
    Arrow batch, get L2-normalized, and a blocked Gram matmul
    (``chunk_rows`` query rows at a time, so memory stays
    O(chunk_rows * cell)) emits (id_a, id_b) where the numpy cosine clears
    ``threshold - 5e-5 - 1e-6`` — the 4-dp rounding slack plus an FP margin
    far above matmul-vs-fold summation drift (~1e-13), so no qualifying pair
    can be missed. Zero-norm vectors normalize to NaN and never pass.

    Tier 2 (exact): the candidate ids (a tiny fraction of the pair space)
    broadcast-join back to the vectors and the SAME fold/round/filter as the
    expression path runs, guaranteeing bit-identical cosines.

    Scale notes (100 TB): the only wide data movement is the cell-grouped
    shuffle of (id, vector) — the pair space never materializes outside the
    blocked numpy kernel, and the exact pass streams the corpus against a
    broadcast candidate list. Compare ``embedding_near_dup``: same plan
    shape but the pair join carries both vectors and scores with the
    interpreted fold; the matmul tier is ~4x faster at sf0.1 and widens
    with cell size."""
    import numpy as np

    cand_t = threshold - 5e-5 - 1e-6

    def _cands(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            Xn = X / nrm
        order = np.argsort(ids, kind="stable")
        ids, Xn = ids[order], Xn[order]
        out_a, out_b = [], []
        for s in range(0, len(ids), chunk_rows):
            block = Xn[s : s + chunk_rows]
            sim = block @ Xn.T  # (chunk, n)
            ai, bj = np.nonzero(sim >= cand_t)
            ai += s
            keep = ai < bj  # id_a < id_b and never self
            out_a.append(ids[ai[keep]])
            out_b.append(ids[bj[keep]])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else np.array([], dtype=ids.dtype),
                "id_b": np.concatenate(out_b) if out_b else np.array([], dtype=ids.dtype),
            }
        )

    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col(cell_col).alias("cell")
    )
    # Explicit kernel-stage width (guide §2.5): the (cell) exchange carries
    # few bytes but the matmul kernel is the query's compute — keep it from
    # being AQE-coalesced onto 1-2 tasks; groupBy reuses the partitioning.
    from ..operators.scale import partition_for_kernel

    cands = (
        partition_for_kernel(base, "cell")
        .groupBy("cell")
        .applyInPandas(_cands, "id_a long, id_b long")
    )

    vecs = df.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__vv"),
        norm(F.col(vec_col)).alias("__vn"),
    )
    scored = (
        F.broadcast(cands)
        .join(vecs, F.col("id_a") == F.col("__vid"))
        .select("id_a", "id_b", F.col("__vv").alias("v_a"), F.col("__vn").alias("n_a"))
        .join(vecs, F.col("id_b") == F.col("__vid"))
        .select("id_a", "id_b", "v_a", "n_a", F.col("__vv").alias("v_b"), F.col("__vn").alias("n_b"))
    )
    cos = F.try_divide(dot(F.col("v_a"), F.col("v_b")), F.col("n_a") * F.col("n_b"))
    return (
        scored.withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def positional_shingles(col: Column | str, k: int) -> Column:
    """Word k-shingles WITH position: an array aligned to word index, where
    element i (0-based) is the shingle starting at word i, null past the last
    full window. Same O(k)-array-passes zip_with construction as
    ``shingles`` (see its docstring for why not transform+slice), but keeps
    duplicates and alignment instead of distinct-ing — the span-merge
    consumer needs every occurrence and its offset."""
    return positional_shingles_of_words(words(col), k)


def positional_shingles_of_words(ws: Column, k: int) -> Column:
    """``positional_shingles`` over an ALREADY-SPLIT word array column.

    Callers that hold a materialized (cached) word array use this form so
    the zip chain references the array k+1 times without re-running the
    regex split each time: Catalyst inlines multiply-referenced projection
    aliases, so building from a text column re-splits per reference
    (measured 2.9s -> 0.9s on the sf0.1 shingle build going through a
    persisted word frame)."""
    n = F.size(ws)
    acc = ws
    for j in range(1, k):
        shifted = F.slice(ws, j + 1, F.greatest(n - j, F.lit(1)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return acc


def duplicated_spans(
    df: DataFrame, text_col: str, id_col: str, k: int = 8
) -> DataFrame:
    """Substring-level exact dedup signal: per document, the merged spans of
    word k-grams that occur more than once in the corpus, as
    (id, n_words, n_dup_spans, dup_words, dup_frac).

    The reference point is suffix-array substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): find and
    excise repeated substrings, not just whole near-dup documents. A
    distributed suffix array is the wrong primitive for Spark; the
    standard scalable re-expression is positional k-gram matching — any
    repeated substring of >= k words contains a repeated k-gram, so marking
    k-gram occurrences whose gram repeats corpus-wide and merging the
    overlapping [pos, pos+k-1] word intervals per document recovers exactly
    the maximal repeated regions at k-word resolution.

    Shape at scale: one explode of (id, pos, hash(gram)) — 8-byte xxhash64
    keys (engine-internal; see the inline comment), never the gram text. Gram multiplicity is a map-side-combinable
    groupBy (NOT a count-over-window: boilerplate corpora have hot grams,
    and a window shuffles every occurrence of a hot key to one task with a
    sort, where the combiner collapses them before the exchange); positions
    are then inner-joined against only the >1-count gram set, so the second
    shuffle carries just the duplicated residue plus the (much smaller)
    dup-gram list. The interval merge is a per-document gaps-and-islands
    window over that residue. Nothing is ever pairwise.
    """
    from pyspark.sql import Window

    # split once into a cached narrow frame: every downstream reference
    # (k+1 in the zip chain, the size(), the final doc-length join) reads
    # the array instead of re-running the regex split
    base_words = scoped_persist(
        widen_scan(df.select(F.col(id_col), F.col(text_col)), id_col).select(
            F.col(id_col).alias("id"), words(text_col).alias("__ws")
        )
    )
    base = base_words.select(
        "id",
        F.size("__ws").alias("n_words"),
        positional_shingles_of_words(F.col("__ws"), k).alias("grams"),
    )
    occ = base.select(
        "id",
        "n_words",
        F.posexplode("grams").alias("pos", "gram"),
    ).filter(F.col("gram").isNotNull() & (F.col("n_words") >= k))
    # engine-internal key: only the dup SET must match the oracle, not the
    # hash values, so the cheaper 8-byte xxhash64 beats md5 here (the oracle
    # hashes with md5 on its own side; both collision floors are negligible
    # for a dedup signal — Lee et al. hash their grams too)
    occ = scoped_persist(
        occ.select("id", "n_words", "pos", F.xxhash64("gram").alias("h"))
    )

    dup_grams = scoped_persist(
        occ.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") > 1)
        .select("h")
    )
    # Broadcast the dup-hash set when its EXACT count proves it small: the
    # residue join is occ's SECOND full shuffle (the groupBy above is the
    # first, and with near-unique grams its map-side combine collapses
    # nothing — every rung measured distinct_h ~ 0.95 * occ_rows), so a
    # broadcast here halves the operator's shuffled bytes. 8-byte hash rows:
    # the 4M ceiling is ~32MB serialized. Past it, shuffle as before (AQE
    # may still broadcast from runtime sizes). Same eager-count-at-plan-
    # construction policy as the LSH gate; scoped persists freed by
    # release_scoped().
    dup_small = dup_grams.count() <= MAX_BROADCAST_DUP_GRAMS
    dup = occ.join(F.broadcast(dup_grams) if dup_small else dup_grams, "h")

    by_doc = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k - 1).over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    island = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), F.lit(1)
    ).otherwise(F.lit(0))
    spans = (
        dup.withColumn(
            "island",
            F.sum(island).over(by_doc.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("id", "n_words", "island")
        .agg((F.max(F.col("pos") + k - 1) - F.min("pos") + 1).alias("span_words"))
        .groupBy("id", "n_words")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
            F.sum("span_words").cast("long").alias("dup_words"),
        )
    )

    docs = base_words.select("id", F.size("__ws").alias("n_words"))
    return (
        docs.join(spans.drop("n_words"), "id", "left")
        .select(
            "id",
            F.col("n_words").cast("long").alias("n_words"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("dup_words", F.lit(0)).cast("long").alias("dup_words"),
            F.round(
                F.coalesce("dup_words", F.lit(0))
                / F.greatest(F.col("n_words"), F.lit(1)),
                4,
            ).alias("dup_frac"),
        )
    )


def drop_duplicated_spans(
    df: DataFrame, text_col: str, id_col: str, k: int = 8
) -> DataFrame:
    """Exact substring dedup as a REWRITE (VERDICT r12 #6) — the Lee et al.
    2021 production mode (C4/RefinedWeb lineage): instead of flagging the
    document (``duplicated_spans``), EXCISE every repeated region and emit
    the cleaned text column, keeping the FIRST occurrence corpus-wide.

    Contract at k-word resolution: an occurrence of a k-gram is REDUNDANT
    iff it is not the corpus-minimal (id, pos) occurrence of that gram —
    so every repeated substring keeps exactly its first copy (ties are
    impossible: (id, pos) is unique) and later copies are dropped. The
    redundant occurrences' overlapping [pos, pos+k-1] intervals are merged
    per document (gaps-and-islands, the ``duplicated_spans`` machinery) and
    the covered word positions are removed; the cleaned text is the
    remaining words re-joined with single spaces. Documents shorter than k
    words pass through untouched.

    Shape at scale (same skeleton as ``duplicated_spans`` — one cached
    word-array frame, positional shingles, 8-byte xxhash64 gram keys):
    the first-occurrence selector is a map-side-combinable
    ``groupBy(h).agg(min(struct(id, pos)))`` over only the duplicated
    RESIDUE — never a rank window over the raw occurrence stream, which
    would sort every occurrence of a hot boilerplate gram in one task
    (the same hot-gram reasoning that keeps the multiplicity count a
    groupBy). The per-doc span list is bounded by n_words/k, so the
    rebuild join carries tiny arrays, and the word-position filter is a
    scan-local nested higher-order expression. Nothing is ever pairwise.
    """
    from pyspark.sql import Window

    base_words = scoped_persist(
        widen_scan(df.select(F.col(id_col), F.col(text_col)), id_col).select(
            F.col(id_col).alias("id"), words(text_col).alias("__ws")
        )
    )
    base = base_words.select(
        "id",
        F.size("__ws").alias("n_words"),
        positional_shingles_of_words(F.col("__ws"), k).alias("grams"),
    )
    occ = (
        base.select("id", "n_words", F.posexplode("grams").alias("pos", "gram"))
        .filter(F.col("gram").isNotNull() & (F.col("n_words") >= k))
        .select("id", "pos", F.xxhash64("gram").alias("h"))
    )
    occ = scoped_persist(occ)
    dup_grams = scoped_persist(
        occ.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") > 1)
        .select("h")
    )
    dup_small = dup_grams.count() <= MAX_BROADCAST_DUP_GRAMS
    occ_dup = scoped_persist(
        occ.join(F.broadcast(dup_grams) if dup_small else dup_grams, "h")
    )
    firsts = occ_dup.groupBy("h").agg(
        F.min(F.struct("id", "pos")).alias("f")
    )
    red = (
        occ_dup.join(F.broadcast(firsts) if dup_small else firsts, "h")
        .filter(
            (F.col("id") != F.col("f.id")) | (F.col("pos") != F.col("f.pos"))
        )
        .select("id", "pos")
    )

    by_doc = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k - 1).over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    island = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), F.lit(1)
    ).otherwise(F.lit(0))
    spans = (
        red.withColumn(
            "island",
            F.sum(island).over(by_doc.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("id", "island")
        .agg(
            F.min("pos").alias("s"),
            (F.max(F.col("pos") + k - 1)).alias("e"),
        )
        .groupBy("id")
        .agg(F.collect_list(F.struct("s", "e")).alias("sp"))
    )

    joined = base_words.join(spans, "id", "left")
    sp = F.coalesce("sp", F.array())
    kept = F.filter(
        F.col("__ws"),
        lambda w, i: ~F.exists(
            sp, lambda seg: (i >= seg["s"]) & (i <= seg["e"])
        ),
    )
    return joined.select(
        "id",
        F.size("__ws").cast("long").alias("n_words"),
        (F.size("__ws") - F.size(kept)).cast("long").alias("dropped_words"),
        F.array_join(kept, " ").alias("cleaned_text"),
    )


def srp_planes(dim: int, nbits: int = 32) -> list[list[int]]:
    """Deterministic signed-random-projection hyperplanes: an nbits x dim
    matrix of +-1 derived from md5 parity, so any engine (or a re-run years
    later) regenerates the identical planes from (dim, nbits) alone — the
    same portability contract as the md5 minhash/HLL constants, materialized
    Python-side because the planes are tiny compile-time constants, not
    data."""
    import hashlib

    out = []
    for j in range(nbits):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"srp:{j}:{i}".encode()).hexdigest()
            row.append(1 if int(h[:8], 16) % 2 == 0 else -1)
        out.append(row)
    return out


def srp_lsh_near_dup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.99,
    nbits: int = 128,
    bands: int = 8,
    dim: int | None = None,
    max_bucket_size: int | None = MAX_LSH_BUCKET_SIZE,
) -> DataFrame:
    """Cosine near-dup pairs via signed random projections (Charikar 2002's
    simhash for real vectors): candidates from banded bit-signature
    collisions, verified with exact cosine — the blocking-free counterpart
    to the label-cell-blocked ``embedding_near_dup`` family.

    Each signature bit is sign(v . r_j) for a fixed +-1 hyperplane r_j
    (``srp_planes``); two vectors disagree on a bit with probability
    angle/pi, so at near-dup cosines the banded collision probability is
    effectively 1 (exact duplicates collide with certainty — identical
    vectors give identical signatures), while random pairs (cosine ~ 0,
    p_diff ~ 0.5) collide in a b-bit band with probability 2^-b. Band
    WIDTH is the candidate-volume knob and it matters more than total
    bits: on the 4k-vector copy corpus, 4-bit bands admit 4.2M candidate
    pairs where 16-bit bands admit 18k (measured) — at bigger corpora,
    widen the bands (and add bands to hold recall: at 16 bits x 8 bands
    the miss probability for a TRUE pair at cosine exactly 0.99 is
    (1-0.955^16)^8 ~ 0.5%, and falls fast above it).

    Shape at scale: the signature is one Arrow-batched numpy matmul
    (vectors x planes^T) per batch — nbits dot products per row in
    compiled BLAS, the same kernel-tier choice as ``simhash_fast`` (the
    expression form is 32 interpreted ``aggregate(zip_with(...))`` passes
    per row: higher-order functions skip whole-stage codegen, measured
    28s -> 1.5s at sf0.1 for the matmul). Band keys are small integers,
    so the candidate self-join shuffles (band, key, id) rows only; the
    exact-cosine verify touches just the candidate pairs joined against
    the (id, vector) frame (no forced broadcast — AQE picks the strategy
    from the runtime candidate count). Like every near-dup operator here:
    never all-pairs.

    NOTE — eager construction (same policy as ``minhash_lsh_pairs``): with
    ``max_bucket_size`` set (the default) BUILDING this plan runs one Spark
    job — the bucket-size histogram over the persisted band frame that
    decides whether the hot-bucket guard engages. Pass
    ``max_bucket_size=None`` for fully lazy composition (unguarded plain
    self-join, no eager jobs).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    if nbits % bands:
        # trailing nbits - bands*(nbits//bands) signature bits would be
        # silently ignored, weakening recall below the documented banding
        # math — refuse rather than surprise
        raise ValueError(
            f"nbits ({nbits}) must be divisible by bands ({bands}); "
            "leftover signature bits would be silently dropped"
        )
    rows_per_band = nbits // bands
    if dim is None:
        # inspecting the data for the dimension costs a driver action and
        # cannot work on an empty frame — callers on a hot path pass dim
        head = df.select(vec_col).head(1)
        if not head:
            return local_df(
                df.sparkSession, [], "id_a long, id_b long, cosine double"
            )
        dim = len(head[0][0])
    planes_np = np.array(srp_planes(dim, nbits), dtype=np.float64)  # nbits x dim
    # bit -> band-key packing as a matmul too: weight bit (b, r) by 2^(rows-1-r)
    pack = np.zeros((nbits, bands))
    for b in range(bands):
        for r in range(rows_per_band):
            pack[b * rows_per_band + r, b] = 1 << (rows_per_band - 1 - r)

    @pandas_udf("array<long>")
    def _band_keys(vs: pd.Series) -> pd.Series:
        X = np.stack(vs.to_numpy())  # n x dim
        bits = (X @ planes_np.T) >= 0  # n x nbits
        keys = bits.astype(np.int64) @ pack.astype(np.int64)  # n x bands
        return pd.Series(list(keys))

    v = F.col(vec_col)
    # the persisted band frame carries (id, band, key) ONLY — including the
    # vector here would cache `bands` redundant copies of every embedding;
    # the verify step re-reads vectors from the source frame instead
    sig = scoped_persist(
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(_band_keys(v)).alias("band", "key"),
        )
    )

    # (band, key) folded to ONE bucket long so the self-join shares the
    # hot-bucket-guarded _band_candidates path with the minhash LSH: a
    # cluster of near-identical embeddings collides in EVERY band, and the
    # unguarded all-pairs join is O(M^2) in the cluster size (same failure
    # as the shingle LSH — see MAX_LSH_BUCKET_SIZE). An xxhash64 fold can
    # only MERGE buckets (extra candidates, pruned by the exact-cosine
    # verify), never split them, so recall is unaffected.
    band_rows = sig.select(
        "id", F.xxhash64("band", "key").alias("bucket")
    )
    cand, hot_stats = _band_candidates(band_rows, max_bucket_size, persist=True)
    if hot_stats is not None:
        from migdar_data_pipelines_spark.operators import metrics as _metrics

        for k_, v_ in hot_stats.items():
            _metrics.record(f"srp_{k_}", v_)

    vecs = df.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__vv"),
        norm(F.col(vec_col)).alias("__vn"),
    )
    # NO broadcast hint on cand: narrow bands admit candidate sets far past
    # broadcast size (4.2M pairs measured at 4-bit bands on the 4k copy
    # corpus) — an unconditional broadcast is a driver OOM at scale. AQE
    # still broadcasts small candidate sets from its runtime size estimate.
    scored = (
        cand
        .join(vecs, F.col("id_a") == F.col("__vid"))
        .select("id_a", "id_b", F.col("__vv").alias("v_a"), F.col("__vn").alias("n_a"))
        .join(vecs, F.col("id_b") == F.col("__vid"))
        .select(
            "id_a", "id_b", "v_a", "n_a",
            F.col("__vv").alias("v_b"), F.col("__vn").alias("n_b"),
        )
    )
    cos = F.try_divide(dot(F.col("v_a"), F.col("v_b")), F.col("n_a") * F.col("n_b"))
    return (
        scored.withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def dedup_lines(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Cross-corpus line-level dedup (the C4 cleaning rule, Raffel et al.
    2020: discard every repeated occurrence of a line corpus-wide, keeping
    only the FIRST): documents are rebuilt with all non-first occurrences
    of each line removed. Returns (id, n_lines, n_kept, cleaned_text).

    First occurrence is the minimum (id, pos) per line — resolved with a
    map-side-combinable ``min(struct(id, pos))`` groupBy on the line hash
    (NOT a row_number window: boilerplate lines are hot keys by
    definition, and min() collapses them before the exchange where a
    window would sort every occurrence in one task). Keep-decisions join
    back on the hash; reassembly is a per-doc sort of the surviving
    (pos, line) pairs. Three shuffles, all on narrow keys; text moves
    twice (explode in, reassemble out) — the unavoidable minimum for a
    rewrite op.

    Every input document appears in the output: a doc whose text is all
    empty/whitespace lines survives as (id, 0, 0, '') via the left join back
    onto the id set (same contract as ``duplicated_spans``) — a rewrite op
    that silently LOSES documents is a hazardous curation primitive."""
    lines = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .filter(F.trim("line") != "")
        .withColumn("h", F.xxhash64("line"))
    )
    lines = scoped_persist(lines)
    first = lines.groupBy("h").agg(
        F.min(F.struct("id", "pos")).alias("first_occ")
    )
    kept = (
        lines.join(first, "h")
        .withColumn(
            "keep",
            (F.col("id") == F.col("first_occ.id"))
            & (F.col("pos") == F.col("first_occ.pos")),
        )
    )
    per_doc = kept.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "line"))
                    )
                ),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("cleaned_text"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


def ngram_containment_pairs(
    probe: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    threshold: float = 0.8,
    q_hits: int = 2,
    max_broadcast_candidates: int | None = None,
) -> DataFrame:
    """DIRECTIONAL n-gram containment: C(A in B) = |grams(A) ∩ grams(B)| /
    |grams(A)| for probe docs A against corpus docs B — the asymmetric
    companion to ``ngram_jaccard_pairs`` that Jaccard cannot see: a short
    excerpt fully quoted inside a long doc has containment ~1 but low
    Jaccard (the union is dominated by the long side). The
    quotation/boilerplate/contamination detector a curation pass runs next
    to symmetric near-dup, shaped like ``incremental_dedup``: a (small)
    probe set against a standing corpus.

    Candidate generation is a pigeonring-count prefix filter on the PROBE
    side, exact by pigeonhole: with m = |A| - ceil(t_eff*|A|) misses allowed,
    any qualifying B contains at least min(q_hits, |A|-m) of A's m+q_hits
    RAREST grams (rarest by corpus document frequency, gram tie-break). The
    matched prefix rows therefore feed a map-side-combinable
    groupBy(id_a, id_b) count, and only groups reaching the hit floor
    become candidates. The single-gram form of this filter (q_hits=1, the
    round-7 implementation) was MEASURED collapsing on shared-vocabulary
    corpora: candidate pairs grew x119 per 10x rows at the
    sf0.01 -> sf0.1 rung (4,262 -> 507,400 for 114 -> 1,109 true pairs —
    precision 37 -> 458 candidates per output pair), because one rare-gram
    hit admits every doc in that gram's posting list and posting lists grow
    with the corpus; requiring a SECOND independent rare-gram hit makes the
    admission probability quadratic in df instead of linear
    (tools/measure_candidates.py is the rung harness, PLANS.md the
    disposition). Verification computes the exact intersection from the
    persisted gram ARRAYS (array_intersect) — the candidate frame is
    count-gated for broadcast like the LSH verify (no corpus shuffle at
    all when candidates are output-sized); the filter only prunes, never
    decides.
    """
    assert 0 < threshold <= 1
    assert q_hits >= 1
    # grams are folded to xxhash64 longs ONCE at array build: every later
    # frame (df counts, prefix rows, matched stream, verify arrays) carries
    # 8-byte keys instead of ~20-char strings — 3-4x smaller shuffles and a
    # long-array intersect at verify. Engine-internal key, same contract as
    # duplicated_spans (the oracle only needs the distinct-count algebra to
    # match; the 2^-64 collision floor is negligible for a dedup signal).
    a_arr = scoped_persist(
        widen_scan(probe.select(F.col(id_col), F.col(text_col)), id_col)
        .select(
            F.col(id_col).alias("id_a"), shingles(text_col, n).alias("ga")
        ).select(
            "id_a",
            F.size("ga").alias("sz_a"),
            F.transform("ga", lambda g: F.xxhash64(g)).alias("ga"),
        )
    )
    a_base = a_arr.select("id_a", "sz_a", F.explode("ga").alias("gram"))
    b_arr = scoped_persist(
        widen_scan(corpus.select(F.col(id_col), F.col(text_col)), id_col)
        .select(
            F.col(id_col).alias("id_b"), shingles(text_col, n).alias("gb")
        ).select("id_b", F.transform("gb", lambda g: F.xxhash64(g)).alias("gb"))
    )
    b_idx = b_arr.select("id_b", F.explode("gb").alias("gram"))
    dfreq = b_idx.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))

    from pyspark.sql import Window

    rk = Window.partitionBy("id_a").orderBy(
        F.asc("df"), F.asc("gram")
    )
    # pigeonhole: C >= t allows at most sz_a - ceil(t*sz_a) missing grams —
    # but acceptance keeps round(containment,4) >= t, which admits RAW values
    # down to t - 5e-5, so the prefix must be sized from that effective
    # threshold (the PPJoin t_eff convention) or boundary pairs in the
    # rounding band get pruned that the acceptance filter would keep. The
    # extra 1e-9 keeps binary-float t*sz (e.g. 0.8*5 = 4.0000000000000002)
    # from ceiling one too high and shrinking the prefix below losslessness.
    t_eff = threshold - 5e-5 - 1e-9
    required = F.ceil(t_eff * F.col("sz_a")).cast("int")
    # prefix of the m + q_hits rarest grams (m = sz_a - required miss budget,
    # capped at sz_a); a qualifying B hits >= min(q_hits, required) of them
    prefix_len = F.least(F.col("sz_a"), F.col("sz_a") - required + q_hits)
    needed = F.least(F.lit(q_hits), F.col("required"))
    prefix = (
        a_base.join(dfreq, "gram", "left")
        .withColumn("df", F.coalesce("df", F.lit(0)))
        .withColumn("__rk", F.row_number().over(rk))
        .filter(F.col("__rk") <= prefix_len)
        .withColumn("required", required)
        .select("id_a", "gram", "required")
    )
    cand = (
        prefix.join(b_idx, "gram")
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("__hits"),
            F.max("required").alias("required"),
        )
        .filter(F.col("__hits") >= needed)
        .select("id_a", "id_b")
    )

    # verify from the persisted gram arrays; thin candidate side broadcast
    # only when its EXACT count proves it small, and the array-carrying
    # intermediate only when its estimated BYTES fit (sum of sz_a over the
    # candidates x 8-byte grams — the fat rows ADVICE r10 flagged: 1M pairs
    # x a few hundred grams is GBs, far past what the 1M-pair ceiling was
    # calibrated for)
    cand = scoped_persist(cand)
    hint, fat_hint = _verify_hints(
        cand,
        a_arr.select("id_a", F.col("sz_a").alias("__asz")),
        "id_a",
        MAX_BROADCAST_CANDIDATE_PAIRS
        if max_broadcast_candidates is None
        else max_broadcast_candidates,
        8,  # grams are xxhash64 longs
    )
    withf = (F.broadcast(cand) if hint else cand).join(
        a_arr.select("id_a", "sz_a", "ga"), "id_a"
    )
    withf = (F.broadcast(withf) if fat_hint else withf).join(b_arr, "id_b")
    return (
        withf.withColumn(
            "containment",
            F.round(
                F.size(F.array_intersect("ga", "gb")) / F.col("sz_a"), 4
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


# ---------------------------------------------------------------------------
# Engine-portable MinHash (md5-derived, like the HLL/CMS sketches): the
# SIGNATURE ITSELF is the deliverable — for signature stores, cross-engine
# handoff, and estimator-calibration queries — unlike _shingle_band_frames'
# xxhash64 signatures, which are Spark-internal (fine for in-engine LSH,
# unverifiable anywhere else).
# ---------------------------------------------------------------------------

MINHASH_MERSENNE = (1 << 31) - 1


def _minhash_coeffs(n_hashes: int) -> list[tuple[int, int]]:
    """Fixed universal-hash coefficients (golden-ratio stride, odd a) —
    Python literals so Spark expressions and generated SQL inline the exact
    same integers."""
    return [
        (
            ((0x9E3779B1 * (i + 1)) % MINHASH_MERSENNE) | 1,
            (0x85EBCA77 * (i + 1)) % MINHASH_MERSENNE,
        )
        for i in range(n_hashes)
    ]


def minhash_signature_portable(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """(id, m0..m{n_hashes-1}): engine-portable MinHash signature over word
    k-shingles. Base hash = first 8 md5 hex digits as an integer mod the
    Mersenne prime (integer/string ops any engine reproduces); permutations
    are (a_i*h + b_i) mod p with the fixed coefficients. One explode + one
    groupBy(id) whose min() partials combine map-side — the signature
    exchange carries (id, n_hashes longs) only, same shape as the LSH
    front half. E[fraction of equal components] = Jaccard (Broder 1997),
    so two engines' signatures agree bit-for-bit AND estimate identically."""
    h8 = F.conv(F.substring(F.md5(F.col("__g")), 1, 8), 16, 10).cast("long")
    rows = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, k)).alias("__g")
    ).withColumn("__h", h8 % MINHASH_MERSENNE)
    aggs = [
        F.min((F.col("__h") * a + b) % MINHASH_MERSENNE).alias(f"m{i}")
        for i, (a, b) in enumerate(_minhash_coeffs(n_hashes))
    ]
    return rows.groupBy("id").agg(*aggs)


def minhash_signature_sql(
    n_hashes: int, grams_sql: str, id_expr: str = "id", gram_expr: str = "gram"
) -> str:
    """DuckDB mirror of ``minhash_signature_portable`` from the same
    coefficients. ``grams_sql`` must yield (id, gram) rows."""
    p = MINHASH_MERSENNE
    nib = "strpos('0123456789abcdef', substr(__md, {j}, 1)) - 1"
    hex8 = " + ".join(
        f"({nib.format(j=j + 1)}) * {16 ** (7 - j)}" for j in range(8)
    )
    mins = ", ".join(
        f"min(({a} * __h + {b}) % {p}) AS m{i}"
        for i, (a, b) in enumerate(_minhash_coeffs(n_hashes))
    )
    return f"""
SELECT {id_expr} AS id, {mins}
FROM (
  SELECT {id_expr}, (({hex8}) % {p}) AS __h
  FROM (SELECT {id_expr}, md5({gram_expr}) AS __md FROM ({grams_sql}))
) GROUP BY {id_expr}
"""


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Robust winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS
    algorithm): per document, the distinct set of window-minimum k-gram
    hashes over the POSITIONAL gram sequence. Winnowing guarantees that any
    shared substring of at least ``window + k - 1`` words yields at least
    one SHARED fingerprint value, while selecting only ~2/(window+1) of all
    gram hashes — the density-guaranteed sparsification that raw
    "hash mod p == 0" fingerprinting lacks. (Positions matter: the minima
    run over every consecutive window of the in-order gram sequence with
    duplicates kept — ``positional_shingles`` — a distinct-ed gram set
    would slide windows across a different sequence in each document and
    void the guarantee. Tie choice inside a window is irrelevant here
    because only the fingerprint VALUE enters the set.)

    Engine-portable: gram hash = first 8 md5 hex digits as an integer (the
    minhash_signature_portable base hash) — any engine reproduces the
    identical fingerprint set, and the gate hashes the exploded set.

    Execution tier (measured at sf0.1, 5000 docs): winnowing is inherently
    SCAN-LOCAL — every fingerprint depends only on its own document — so
    the right shape is a vectorized Arrow-batched ``mapInPandas`` with
    ZERO shuffle: hashlib md5 per gram plus a strided numpy window-min per
    doc, ~1s. The two declarative alternatives both lose: the per-row
    array-expression form (``transform(sequence, i -> array_min(slice(hs,
    i, w)))``) re-inlines the whole hash array into every window lambda —
    Catalyst inlines multiply-referenced projection aliases and
    higher-order functions are interpreted — going O(n_grams²) md5 calls
    per doc, 75s; the explode + ``min groupBy (id, window_idx)`` form is
    codegen'd but pays a ×window row fanout and two hash shuffles for
    per-doc-local math, 4-6s. At 100 TB the UDF form is also the right
    plan: it rides the corpus scan with no exchange at all.

    Docs shorter than ``k`` words contribute their whole text as one gram
    (the ``shingles`` convention). Returns (id, n_grams, n_fingerprints,
    fingerprints) — the array SORTED ascending — for downstream pair
    generation.
    """
    import hashlib
    import re

    id_type = df.schema[id_col].dataType.simpleString()
    out_ddl = (
        f"id {id_type}, n_grams bigint, n_fingerprints bigint, "
        "fingerprints array<bigint>"
    )
    # Shared whitespace contract is RE2's \s set [\t\n\f\r ] (no vertical
    # tab — DuckDB's string_split_regex excludes \x0b, Java/Python \s
    # include it); mirror it exactly so spans agree with words()/the oracle
    split_re = re.compile("[ \t\n\f\r]+")

    def winnow(batches):
        import numpy as np

        # per-task gram-hash memo: natural text repeats trigrams heavily
        # (boilerplate, shared phrases, near-dup variants), and md5-per-gram
        # is the kernel's dominant Python cost — a dict hit replaces the
        # digest for every repeat. Bounded by the task's distinct grams
        # (guide §4.5: per-task state, amortized over the batch loop).
        memo: dict[str, int] = {}

        def ghash(g: str) -> int:
            v = memo.get(g)
            if v is None:
                v = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                memo[g] = v
            return v

        for pdf in batches:
            ids, ngs, nfs, fps = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in split_re.split(t or "") if w]
                if len(ws) < k:
                    grams = [" ".join(ws)]
                else:
                    grams = [
                        " ".join(ws[j : j + k])
                        for j in range(len(ws) - k + 1)
                    ]
                hs = np.fromiter(
                    (ghash(g) for g in grams),
                    dtype=np.int64,
                    count=len(grams),
                )
                if len(hs) <= window:
                    sel = np.array([hs.min()])
                else:
                    sel = np.lib.stride_tricks.sliding_window_view(
                        hs, window
                    ).min(axis=1)
                uniq = np.unique(sel)
                ids.append(i)
                ngs.append(len(hs))
                nfs.append(len(uniq))
                fps.append(list(uniq))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_grams": ngs,
                    "n_fingerprints": nfs,
                    "fingerprints": fps,
                }
            )

    # the per-doc md5+window-min kernel rides the scan stage — widen a
    # narrow input so it is not single-task (no-op on wide production scans)
    return widen_scan(
        df.select(F.col(id_col).alias(id_col), F.col(text_col)), id_col
    ).mapInPandas(winnow, out_ddl)


def winnow_sql(
    docs_sql: str,
    k: int = 3,
    window: int = 4,
    id_expr: str = "id",
) -> str:
    """DuckDB mirror of ``winnow_fingerprints`` — (id, n_grams,
    n_fingerprints, fingerprint) with the fingerprint set UNNESTed to rows
    (array order is engine-convention, sets are not; the gate sorts rows).
    ``docs_sql`` must yield (id, text). Same md5-hex8 base hash as
    ``minhash_signature_sql``; the window minima are the literal list-
    arithmetic twin of the Spark expression."""
    nib = "strpos('0123456789abcdef', substr(m, {j}, 1)) - 1"
    hex8 = " + ".join(f"({nib.format(j=j + 1)}) * {16 ** (7 - j)}" for j in range(8))
    # whitespace words of `text` — parity with textanalysis.words
    words_sql = r"list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '')"
    return f"""
WITH w AS (
  SELECT {id_expr} AS id, {words_sql} AS words FROM ({docs_sql})
), g AS (
  SELECT id,
    CASE WHEN len(words) < {k} THEN [array_to_string(words, ' ')]
    ELSE list_transform(generate_series(1, len(words) - {k} + 1),
         i -> array_to_string(list_slice(words, i, i + {k} - 1), ' '))
    END AS grams
  FROM w
), h AS (
  SELECT id, list_transform(list_transform(grams, x -> md5(x)),
                            m -> {hex8}) AS hs
  FROM g
), f AS (
  SELECT id, CAST(len(hs) AS BIGINT) AS n_grams,
    list_distinct(list_transform(
      generate_series(1, greatest(len(hs) - {window} + 1, 1)),
      i -> list_min(list_slice(hs, i, i + {window} - 1)))) AS fps
  FROM h
)
SELECT id, n_grams, CAST(len(fps) AS BIGINT) AS n_fingerprints,
       CAST(unnest(fps) AS BIGINT) AS fingerprint
FROM f
"""


# ---------------------------------------------------------------------------
# Edit-distance pair mining (Ed-Join family: Xiao, Wang, Lin 2008) — the
# third similarity class next to set-similarity (jaccard/containment) and
# hash-based (minhash/simhash) dedup: typo-level near-duplicates that token
# shingles cannot see (a 1-char edit changes every overlapping word gram).
# ---------------------------------------------------------------------------


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """EXACT pairs within Levenshtein distance ``max_dist`` as
    (id_a, id_b, dist), id_a < id_b — without the all-pairs join.

    Candidate generation is PASS-JOIN segment matching (Li, Deng, Feng
    2011), exact by pigeonhole: partition every string into ``max_dist+1``
    even segments — ``max_dist`` edits cannot touch them all, and an
    untouched segment of y appears in x as an EXACT substring whose
    position shifted by at most ``max_dist`` (each insert/delete shifts
    later content by 1). So the index holds each string's ``d+1`` segments
    keyed by (segment value, slot, length) and every string probes its own
    substrings at the slot positions of each hypothesized partner length
    ``len±d`` — a bounded ``(2d+1)(d+1)(2d+1)`` probe rows per string with
    ~``len/(d+1)``-char join keys. Long exact keys are what survives
    char-level TEMPLATED corpora: the previous Ed-Join q-gram prefix
    filter (even with its location extension) measured candidates growing
    x51 per 10x rows on the shard-templated scale corpus because in-token
    q-grams repeat corpus-wide at aligned positions, while 13-char
    segment keys there include the shard-distinct token suffixes and stay
    selective. Survivors pass the ``|len_a - len_b| <= max_dist`` length
    filter (built into the join key) and are verified with the BANDED
    ``levenshtein(a, b, threshold)`` kernel (O(d*n) per pair, JVM-side,
    returns -1 above the band — the filter only prunes, the verify
    decides).

    Strings shorter than ``max_dist + 1`` cannot form ``d+1`` non-empty
    segments, so they route through a length-bucket path instead: each
    explodes to buckets ``len-d .. len+d`` and equi-joins every string on
    its exact length. Tiny strings are a sliver of any real corpus; the
    bucket join is bounded by that sliver's size.

    Scale shape: one corpus scan builds (segments, substring probes); the
    candidate join is an equi-join on (value, slot, length); the verify is
    candidate-sized with the banded kernel. No all-pairs stage anywhere.
    """
    from ..operators.caching import scoped_persist

    assert max_dist >= 1
    d = max_dist
    nseg = d + 1

    base = scoped_persist(
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("t"),
            F.length(text_col).alias("len"),
        ).where(F.col(text_col).isNotNull())
    )

    # index side: the d+1 even-partition segments of every string with
    # len >= d+1. base_sz = len div (d+1), rem = len mod (d+1): the first
    # (d+1-rem) segments take base_sz chars, the last rem take base_sz+1;
    # start_i is 1-indexed for substr.
    seg_struct = (
        f"transform(sequence(0, {d}), i -> named_struct("
        f"'i', i, "
        f"'seg', substr(t, "
        f"1 + i * (len div {nseg}) + greatest(0, i - ({nseg} - len % {nseg})), "
        f"(len div {nseg}) + IF(i >= {nseg} - (len % {nseg}), 1, 0))))"
    )
    idx = base.where(F.col("len") >= nseg).select(
        F.col("id").alias("id2"),
        F.col("len").alias("L"),
        F.explode(F.expr(seg_struct)).alias("sg"),
    ).select("id2", "L", F.col("sg.i").alias("i"), F.col("sg.seg").alias("seg"))

    # probe side: every string hypothesizes partner lengths L in
    # [max(d+1, len-d), len+d], computes the partner's slot geometry from
    # L alone, and emits its own substrings of that slot length at
    # positions within +/-d of the slot start.
    probe = (
        base.select(
            "id",
            "t",
            "len",
            F.explode(
                F.sequence(
                    F.greatest(F.col("len") - d, F.lit(nseg)),
                    F.col("len") + d,
                )
            ).alias("L"),
        )
        .where(F.col("L") >= nseg)
        .select(
            "id", "t", "len", "L", F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i")
        )
        .withColumn(
            "__s",
            F.lit(1)
            + F.col("i") * (F.col("L") / nseg).cast("long").cast("int")
            + F.greatest(
                F.lit(0), F.col("i") - (F.lit(nseg) - F.col("L") % nseg).cast("int")
            ),
        )
        .withColumn(
            "__l",
            (F.col("L") / nseg).cast("long").cast("int")
            + F.when(F.col("i") >= F.lit(nseg) - F.col("L") % nseg, 1).otherwise(0),
        )
        .withColumn("__plo", F.greatest(F.lit(1), F.col("__s") - d))
        .withColumn("__phi", F.least(F.col("len") - F.col("__l") + 1, F.col("__s") + d))
        .where(F.col("__phi") >= F.col("__plo"))
        .select(
            "id",
            "L",
            "i",
            F.explode(F.sequence("__plo", "__phi")).alias("p"),
            "t",
            "__l",
        )
        .select("id", "L", "i", F.expr("substr(t, p, __l)").alias("seg"))
        .dropDuplicates(["id", "L", "i", "seg"])
    )
    cand_long = (
        probe.join(idx, ["L", "i", "seg"])
        .where(F.col("id") != F.col("id2"))
        .select(
            F.least("id", "id2").alias("id_a"),
            F.greatest("id", "id2").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    # tiny-string path: bucket join on exact length within +/- max_dist
    shorts = base.where(F.col("len") < nseg)
    short_probe = shorts.select(
        "id",
        F.explode(
            F.sequence(
                F.greatest(F.col("len") - max_dist, F.lit(0)),
                F.col("len") + max_dist,
            )
        ).alias("__bkt"),
    )
    cand_short = (
        short_probe.join(
            base.select(F.col("id").alias("id2"), F.col("len").alias("__bkt")),
            "__bkt",
        )
        .where(F.col("id") != F.col("id2"))
        .select(
            F.least("id", "id2").alias("id_a"),
            F.greatest("id", "id2").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    a = base.select(
        F.col("id").alias("id_a"), F.col("t").alias("__ta"), F.col("len").alias("__la")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("t").alias("__tb"), F.col("len").alias("__lb")
    )
    verified = (
        cand_long.unionByName(cand_short)
        .dropDuplicates(["id_a", "id_b"])
        .join(a, "id_a")
        .join(b, "id_b")
        .where(F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        .withColumn(
            "dist", F.levenshtein("__ta", "__tb", max_dist).cast("long")
        )
        .where(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )
    return verified
