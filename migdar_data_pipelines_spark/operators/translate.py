"""X1/X2 ``split_and_translate``: the reference's flagship fuzzy-enrichment op.

Reference (flows/i18n.py:80-163, called from datasets.py:427-429,
publications.py:127-131, organisations.py:73-81): split a multi-value string
field on a delimiter; translate each value against a small translation table —
exact match first, else fuzzy match (fuzzywuzzy UQRatio, score_cutoff=90, top-2
with ambiguity warning); replace the field with arrays ``f, f__en, f__ar,
f__all``; unmatched values pass through to all outputs.

Spark-first design (no row-at-a-time Python):
  1. explode the split values (narrow),
  2. exact match = broadcast hash join on the cleaned value (no shuffle),
  3. fuzzy pass over the *misses only*: broadcast nested-loop join against the
     (tiny) translation table. Default scorer is ``uqratio_similarity`` —
     fuzzywuzzy UQRatio parity (unicode full_process + indel ratio
     100*2*LCS/(|a|+|b|), half-even int rounding) as an Arrow-batched pandas
     UDF, plus the reference's top-2 ambiguity warning as an optional column.
     ``scorer='levenshtein'`` keeps the pure-expression JVM-side stand-in,
  4. reassemble per-row arrays with order-pinned collect_list.

The miss-set is usually tiny (dirty long tail), so the quadratic fuzzy stage
touches |misses| x |table| pairs with the table broadcast — at 100 TB the
exact-match join does the heavy lifting and stays a broadcast hash join.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .caching import scoped_persist
from .textops import clean_string, split_to_array
from .._serde import register_self_contained

register_self_contained(__name__)


def levenshtein_similarity(a: Column, b: Column) -> Column:
    """Similarity in [0,100]: 100*(1 - lev(a,b)/max(len)). 100 = identical.

    Engine-portable expression scorer (JVM-side, no Python hop) — NOT the
    reference's ranking; ``uqratio_similarity`` is the parity scorer."""
    dist = F.levenshtein(a, b)
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(100.0)).otherwise(
        F.round(100.0 * (1.0 - dist.cast("double") / denom.cast("double")), 4)
    )


def full_process(c: Column | str) -> Column:
    """fuzzywuzzy ``utils.full_process`` with force_ascii=False (the U in
    UQRatio): every non-word character (unicode classes) becomes a space,
    lowercase, strip — consecutive junk chars become MULTIPLE spaces, which
    is fuzzywuzzy behaviour and is deliberately not collapsed."""
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.lower(F.regexp_replace(c, r"[^\p{L}\p{N}_]", " ")))


def _lcs_len(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        ap = cur.append
        for j, cb in enumerate(b):
            ap(prev[j] + 1 if ca == cb else max(prev[j + 1], cur[j]))
        prev = cur
    return prev[-1]


def _uqratio_py(a: str, b: str) -> float:
    if not a or not b:
        return 0.0
    # fuzz.ratio with the C speedup is the INDEL ratio: 100 * 2*LCS/(|a|+|b|)
    # (substitution cost 2 == LCS formulation), rounded to an int with
    # Python round() — which is HALF-EVEN; the DuckDB oracle mirrors that
    # with round_even, NOT round (half-up).
    return float(round(200.0 * _lcs_len(a, b) / (len(a) + len(b))))


def _uqratio_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    # Arrow-batched; a tiny per-batch memo collapses the repeated
    # (miss value x table key) grid that the cross join produces.
    cache: dict[tuple[str, str], float] = {}
    out = []
    for x, y in zip(a, b):
        k = (x or "", y or "")
        v = cache.get(k)
        if v is None:
            v = cache[k] = _uqratio_py(*k)
        out.append(v)
    return pd.Series(out, dtype="float64")


def uqratio_similarity(a: Column, b: Column) -> Column:
    """fuzzywuzzy ``UQRatio(a, b)`` parity: unicode full_process both sides,
    then the indel ratio 100*2*LCS/(|a|+|b|) rounded half-even to an integer
    (returned as double). Reference scorer at i18n.py:107-109.

    This is a pandas UDF (LCS needs a real DP) — use it where the reference
    uses it: scoring the small fuzzy-miss set against a broadcast table,
    never as a corpus-scale hot path. (The udf is wrapped lazily so the
    module imports without an active SparkSession.)

    The module is registered pickle-by-value (_serde.py) so executors do NOT
    need this package on their PYTHONPATH: a by-reference cloudpickle of a
    module-level fn would make every Python worker import
    migdar_data_pipelines_spark."""
    udf = F.pandas_udf(_uqratio_batch, "double")
    return udf(full_process(a), full_process(b))


@dataclass
class TranslationTable:
    """X1: the broadcastable lookup built from the 12 translation sheets
    (i18n.py:50-77): key column + translation columns keyed by suffix."""

    df: DataFrame
    key: str = "key"
    translations: tuple[str, ...] = ("hebrew", "english", "arabic")

    def cleaned(self) -> DataFrame:
        return self.df.select(
            clean_string(self.key).alias("__tkey"),
            *[F.col(c) for c in self.translations],
        ).dropDuplicates(["__tkey"])


def split_and_translate(
    df: DataFrame,
    field: str,
    table: TranslationTable,
    delimiter: str = ",",
    score_cutoff: float = 90.0,
    keep_row_id: str = "__row_id",
    suffixes: dict[str, str] | None = None,
    scorer: str = "uqratio",
    capture_ambiguity: bool = False,
) -> DataFrame:
    """Replace ``field`` with translated arrays ``field``, ``field__en``,
    ``field__ar``, ``field__all`` (suffix->translation-column mapping
    overridable via ``suffixes``).

    ``scorer``: 'uqratio' (default — fuzzywuzzy UQRatio parity, the
    reference's ranking at i18n.py:107-109) or 'levenshtein' (pure
    expression, JVM-side; word-reordered or punctuation-dirty values rank
    differently from the reference).

    ``capture_ambiguity``: when True, adds a boolean ``{field}__ambiguous``
    column reproducing the reference's top-2 warning (i18n.py:110-114): the
    best fuzzy match scored < 100 while the runner-up also cleared the
    cutoff with a DIFFERENT translation."""
    suffixes = suffixes or {"": "hebrew", "__en": "english", "__ar": "arabic"}
    lut = F.broadcast(table.cleaned())

    # The row id is NONDETERMINISTIC (monotonically_increasing_id) and ``base``
    # feeds two plan branches (explode side + the final rejoin). Without
    # pinning, a recompute under a different partition layout (AQE, upstream
    # windows) can assign different ids per branch and the rejoin silently
    # nulls out. persist() materializes the ids once; at scale this is the
    # standard id-stamping pattern (cache or checkpoint before branching).
    rid = F.monotonically_increasing_id()
    base = scoped_persist(df.withColumn(keep_row_id, rid))
    exploded = base.select(
        keep_row_id,
        F.posexplode_outer(split_to_array(field, delimiter)).alias("__pos", "__val"),
    ).withColumn("__ckey", clean_string(F.col("__val")))

    # exact pass: broadcast hash join
    exact = exploded.join(lut, exploded["__ckey"] == lut["__tkey"], "left")

    hits = exact.filter(F.col("__tkey").isNotNull()).drop("__tkey")
    misses = exact.filter(F.col("__tkey").isNull()).select(keep_row_id, "__pos", "__val", "__ckey")

    # fuzzy pass on misses only: broadcast nested-loop + similarity scorer
    if scorer == "uqratio":
        sim = uqratio_similarity(F.col("__ckey"), F.col("__tkey"))
    elif scorer == "levenshtein":
        sim = levenshtein_similarity(F.col("__ckey"), F.col("__tkey"))
    else:
        raise ValueError(f"unknown scorer {scorer!r}")
    scored = misses.join(lut, F.lit(True), "left").withColumn("__score", sim)
    w = Window.partitionBy(keep_row_id, "__pos").orderBy(
        F.desc("__score"), F.asc("__tkey")
    )
    tstruct = F.struct(*[F.col(c) for c in table.translations])
    # keep rank 1 AND 2: rank 1 decides the translation, rank 2 only feeds
    # the ambiguity flag. One extra window row per miss — the miss set is
    # the dirty long tail, so this costs nothing at scale.
    ranked = scored.withColumn("__rank", F.row_number().over(w)).filter(
        F.col("__rank") <= 2
    )
    agg = ranked.groupBy(keep_row_id, "__pos", "__val", "__ckey").agg(
        F.max(
            F.when(F.col("__rank") == 1, F.struct(F.col("__score").alias("s"), tstruct.alias("t")))
        ).alias("__r1"),
        F.max(
            F.when(F.col("__rank") == 2, F.struct(F.col("__score").alias("s"), tstruct.alias("t")))
        ).alias("__r2"),
    )
    best = agg.withColumn("__matched", F.col("__r1.s") >= F.lit(score_cutoff))
    # reference warning semantics (i18n.py:110-114): best scored < 100, the
    # runner-up also cleared the cutoff, and their translations differ.
    amb = (
        F.col("__matched")
        & (F.col("__r1.s") < 100)
        & F.coalesce(
            (F.col("__r2.s") >= F.lit(score_cutoff))
            & (F.col("__r2.t") != F.col("__r1.t")),
            F.lit(False),
        )
    )
    fuzzy = best.select(
        keep_row_id,
        "__pos",
        "__val",
        "__ckey",
        *[
            F.when(F.col("__matched"), F.col(f"__r1.t.{c}")).otherwise(F.lit(None)).alias(c)
            for c in table.translations
        ],
        amb.alias("__amb"),
    )

    resolved = hits.withColumn("__amb", F.lit(False)).unionByName(fuzzy)
    # unmatched values pass through to every output column (i18n.py:131-140)
    out_cols = []
    for suffix, tcol in suffixes.items():
        out_cols.append(
            F.coalesce(F.col(tcol), F.col("__val")).alias(f"__out{suffix or '__he'}")
        )
    resolved = resolved.select(keep_row_id, "__pos", "__val", "__amb", *out_cols)

    def ordered_list(c: str) -> Column:
        return F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("__pos").alias("o"), F.col(c).alias("v")))),
            lambda s: s["v"],
        )

    agg_cols = []
    all_parts = []
    for suffix in suffixes:
        src = f"__out{suffix or '__he'}"
        agg_cols.append(ordered_list(src).alias(f"{field}{suffix}"))
        all_parts.append(src)
    # __all must be deterministic under partitioning: pin element order by
    # position before flatten+distinct (bare collect_list order is not).
    all_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("__pos").alias("o"),
                    F.array(*[F.col(c) for c in all_parts]).alias("v"),
                )
            )
        ),
        lambda s: s["v"],
    )
    amb_cols = (
        [F.max("__amb").alias(f"{field}__ambiguous")] if capture_ambiguity else []
    )
    grouped = resolved.groupBy(keep_row_id).agg(
        *agg_cols,
        F.array_distinct(F.flatten(all_sorted)).alias(f"{field}__all"),
        *amb_cols,
    )

    return (
        base.drop(field)
        .join(grouped, keep_row_id, "left")
        .drop(keep_row_id)
    )
