"""End-to-end corpus curation: the composition the individual llm/ operators
exist for — raw documents in, deduplicated/filtered/split training shards
out, with audit counts at every stage.

Stage order is the cost-aware one for 100 TB:
  1. scan-local FILTER first (quality/length/lang/repetition — zero shuffle,
     drops the junk before anything pays a shuffle for it);
  2. EXACT dedup second (one cheap hash-groupBy, removes the bulk of
     duplication before the expensive near-dup pass sees it);
  3. NEAR-DUP collapse third (banded MinHash-LSH + connected components,
     keeping each group's canonical doc — smallest surviving id);
  4. deterministic train/val SPLIT (md5 fold — stable across re-runs);
  5. SHARD WRITE (md5-stable assignment, sorted content, bounded files).

Every stage emits its row count into the returned stats so a re-run is
auditable stage by stage; all counts come from the frames the write itself
consumes (no second pipeline execution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import train_val_split
from .dedup import canonical_groups, exact_dedup, minhash_lsh_pairs
from .textanalysis import language_id, quality_score, token_stats


def curation_stage_frames(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en", "und"),
    jaccard_threshold: float = 0.8,
    val_fraction: float = 0.1,
) -> dict[str, DataFrame]:
    """Stages 1-4 of the curation chain as NAMED FRAMES — the single
    definition both ``curate_corpus`` (counts + shard write) and the
    ``curate_corpus_stats`` gate query consume, so the oracle-checked
    chain IS the shipped chain. Keys: input, after_filter,
    after_exact_dedup, after_near_dedup, final (with the split column).
    Each frame builds on the previous lazily; callers that read several
    should persist the shared prefixes."""
    out: dict[str, DataFrame] = {"input": docs}

    # 1. scan-local filter
    kept = docs.filter(
        (token_stats(text_col)["n_words"] >= min_words)
        & (quality_score(text_col) >= min_quality)
        & language_id(text_col).isin(*languages)
    )
    out["after_filter"] = kept

    # 2. exact dedup: keep each content hash's canonical (minimum) id
    exact = exact_dedup(kept, text_col, id_col)
    kept = kept.join(
        exact.select(F.col("canonical_id").alias(id_col)), id_col, "inner"
    )
    out["after_exact_dedup"] = kept

    # 3. near-dup collapse: LSH pairs -> connected components -> keep the
    # canonical (minimum-id) member of every group
    pairs = minhash_lsh_pairs(
        kept, text_col, id_col,
        n_hashes=32, bands=16, jaccard_threshold=jaccard_threshold,
    )
    groups = canonical_groups(kept, pairs.select("id_a", "id_b"), id_col)
    dropped = groups.filter(F.col(id_col) != F.col("canonical_id")).select(id_col)
    kept = kept.join(dropped, id_col, "left_anti")
    out["after_near_dedup"] = kept

    # 4. deterministic split
    out["final"] = kept.withColumn("split", train_val_split(id_col, val_fraction))
    return out


def curate_corpus(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en", "und"),
    jaccard_threshold: float = 0.8,
    val_fraction: float = 0.1,
    n_shards: int = 4,
) -> dict:
    """Run the five-stage curation over ``docs`` and write training shards
    to ``out_dir``. Returns per-stage counts + the writer's shard layout."""
    from ..sinks.shards import write_training_shards

    frames = curation_stage_frames(
        docs, text_col, id_col, min_words, min_quality, languages,
        jaccard_threshold, val_fraction,
    )
    stats: dict = {
        "input_rows": frames["input"].count(),
        "after_filter": frames["after_filter"].count(),
        "after_exact_dedup": frames["after_exact_dedup"].count(),
        "after_near_dedup": frames["after_near_dedup"].count(),
    }
    final = frames["final"]
    split_counts = {
        r["split"]: r["n"]
        for r in final.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    stats["split"] = split_counts

    # 5. shard write
    stats["shards"] = write_training_shards(
        final, out_dir, id_col, n_shards=n_shards
    )
    return stats
