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
     (tiny) translation table with a JVM-side similarity expression — default
     scorer is normalized Levenshtein similarity in [0,100]
     (100*(1-levenshtein/max_len)), a public, engine-portable stand-in for
     UQRatio with the same cutoff/top-2/ambiguity semantics,
  4. reassemble per-row arrays with order-pinned collect_list.

The miss-set is usually tiny (dirty long tail), so the quadratic fuzzy stage
touches |misses| x |table| pairs with the table broadcast — at 100 TB the
exact-match join does the heavy lifting and stays a broadcast hash join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .caching import scoped_persist
from .textops import clean_string, split_to_array


def levenshtein_similarity(a: Column, b: Column) -> Column:
    """Similarity in [0,100]: 100*(1 - lev(a,b)/max(len)). 100 = identical."""
    dist = F.levenshtein(a, b)
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(100.0)).otherwise(
        F.round(100.0 * (1.0 - dist.cast("double") / denom.cast("double")), 4)
    )


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
) -> DataFrame:
    """Replace ``field`` with translated arrays ``field``, ``field__en``,
    ``field__ar``, ``field__all`` (suffix->translation-column mapping
    overridable via ``suffixes``)."""
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

    # fuzzy pass on misses only: broadcast nested-loop + similarity expression
    scored = misses.join(lut, F.lit(True), "left").withColumn(
        "__score", levenshtein_similarity(F.col("__ckey"), F.col("__tkey"))
    )
    w = Window.partitionBy(keep_row_id, "__pos").orderBy(
        F.desc("__score"), F.asc("__tkey")
    )
    best = (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter((F.col("__rank") == 1))
        .withColumn("__matched", F.col("__score") >= F.lit(score_cutoff))
    )
    fuzzy = best.select(
        keep_row_id,
        "__pos",
        "__val",
        "__ckey",
        *[
            F.when(F.col("__matched"), F.col(c)).otherwise(F.lit(None)).alias(c)
            for c in table.translations
        ],
    )

    resolved = hits.unionByName(fuzzy)
    # unmatched values pass through to every output column (i18n.py:131-140)
    out_cols = []
    for suffix, tcol in suffixes.items():
        out_cols.append(
            F.coalesce(F.col(tcol), F.col("__val")).alias(f"__out{suffix or '__he'}")
        )
    resolved = resolved.select(keep_row_id, "__pos", "__val", *out_cols)

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
    grouped = resolved.groupBy(keep_row_id).agg(
        *agg_cols,
        F.array_distinct(F.flatten(all_sorted)).alias(f"{field}__all"),
    )

    return (
        base.drop(field)
        .join(grouped, keep_row_id, "left")
        .drop(keep_row_id)
    )
