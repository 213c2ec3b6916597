#!/usr/bin/env python
"""Generate the synthetic scale rungs SCALING.md measures beyond the driver's
testdata (which stops at sf0.1): an "sf1" documents corpus (10x sf0.1, same
intra-copy duplicate structure) for the pair-heavy dedup family, and a 200k-row
embedding corpus (above ANN_AUTO_EXACT_MAX_ROWS = 100k) so the ANN auto gate's
IVF branch is measured on the path production actually takes — not just
exercised via a test-lowered threshold (VERDICT r8 #3/#4).

Deterministic (fixed seeds), writes under $SPARK_GRAFT_SCALE_DIR (default
/tmp/migdar_scale). /root/testdata is read-only and never touched.

  documents.parquet   50,000 rows: the sf0.1 corpus plus 9 disjoint "shards",
                      each a remapped copy whose every token carries a
                      per-shard suffix — near-dup PAIRS exist only within a
                      shard, so pair DENSITY stays that of sf0.1 while row
                      count grows 10x (the honest way to scale a dedup
                      benchmark: constant dup rate, not a pair explosion).
  embeddings.parquet  200,000 rows x 64 dims: 2,000 cluster centers (unit
                      vectors) each with 100 noisy members, L2-normalized —
                      clustered geometry so IVF cells are non-degenerate.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/migdar_scale")
SRC = "/root/testdata/sf0.1"
N_SHARDS = 10  # sf0.1 corpus + 9 suffixed copies = 10x rows
EMB_CENTERS = 2_000
EMB_PER_CENTER = 100  # 200k rows total
EMB_DIM = 64


def gen_documents(con) -> None:
    # Token-level suffixing keeps every shard's shingle space disjoint from
    # every other shard's: n-gram/minhash/containment candidates can only
    # form INSIDE a shard, so the global pair count is 10x sf0.1's (linear),
    # never (10x)^2. doc_ids are remapped per shard to stay unique.
    con.execute(
        f"""
        COPY (
          SELECT
            d.doc_id + s.shard * 1_000_000 AS doc_id,
            CASE WHEN s.shard = 0 THEN d.text
                 ELSE list_aggregate(
                        list_transform(
                          list_filter(string_split_regex(trim(d.text), '[ \t\n\f\r]+'),
                                      x -> x <> ''),
                          t -> t || 'x' || CAST(s.shard AS VARCHAR)),
                        'string_agg', ' ')
            END AS text,
            d.lang,
            d.source,
            CAST(NULL AS BIGINT) AS n_chars
          FROM read_parquet('{SRC}/documents.parquet') d
          CROSS JOIN (SELECT unnest(range({N_SHARDS})) AS shard) s
        ) TO '{OUT_DIR}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # n_chars must describe the suffixed text
    con.execute(
        f"""
        COPY (
          SELECT doc_id, text, lang, source, CAST(length(text) AS BIGINT) AS n_chars
          FROM read_parquet('{OUT_DIR}/documents.parquet')
        ) TO '{OUT_DIR}/documents2.parquet' (FORMAT PARQUET)
        """
    )
    os.replace(f"{OUT_DIR}/documents2.parquet", f"{OUT_DIR}/documents.parquet")


def gen_embeddings() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((EMB_CENTERS, EMB_DIM)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # members = center + sigma*noise, renormalized. Noise VECTOR length is
    # sigma*sqrt(dim): sigma must shrink with dim or the corpus degenerates
    # to near-uniform directions (sigma=0.25 at d=64 gives |noise|~2 vs
    # |center|=1 -> intra-cluster cosine ~0.2, an ANN-hostile geometry no
    # real embedding model produces). sigma=0.05 -> |noise|~0.4, member-to-
    # center cosine ~0.93, member-to-member ~0.86 — the clustered local
    # structure actual text/image embeddings exhibit.
    vecs = np.repeat(centers, EMB_PER_CENTER, axis=0)
    vecs = vecs + 0.05 * rng.standard_normal(vecs.shape).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float32()), EMB_DIM
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(
                np.repeat(np.arange(EMB_CENTERS, dtype=np.int32), EMB_PER_CENTER)
            ),
        }
    )
    pq.write_table(tbl, f"{OUT_DIR}/embeddings.parquet", row_group_size=20_000)


def gen_events_skewed() -> None:
    """Zipfian hot-key events corpus (VERDICT r9 #2): 20M rows whose user_id
    is Zipf(1.5) over ~41k distinct users (measured 40,808 at seed 7; the
    SCALING.md prose computes the real numbers from the parquet rather than
    trusting this estimate) — the hottest key holds ~38% of
    all rows, the canonical skew that kills per-key windows and shuffle
    joins at 100x scale (every uniform rung so far hides it).
    Deterministic (seed 7)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 20_000_000
    rng = np.random.default_rng(7)
    # one Zipf(1.5) draw per row, clipped to 50k distinct users: rank 1 is
    # the hot key (~38% of rows measured), rank 2 ~13%, rank 3 ~7% — the
    # textbook hot-key distribution, already interleaved across partitions
    user = np.minimum(rng.zipf(1.5, size=n), 50_000).astype(np.int64)
    value = np.round(rng.exponential(100.0, size=n), 2)
    etype = rng.integers(0, 4, size=n).astype(np.int8)
    ts = np.int64(1_700_000_000_000_000) + rng.integers(  # microseconds
        0, 30 * 86_400_000_000, size=n, dtype=np.int64
    )
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(user),
            "event_type": pa.array(etype.astype(np.int32)),
            "ts_us": pa.array(ts),
            "value": pa.array(value),
        }
    )
    pq.write_table(tbl, f"{OUT_DIR}/events_skewed.parquet", row_group_size=500_000)


def gen_documents_hotcluster() -> None:
    """Hot-cluster LSH corpus (VERDICT r10 #1): 500k docs of which EXACTLY
    20% (doc_id % 5 == 0, so any doc_id-prefix rung keeps the ratio) form
    ONE near-identical template cluster — a shared 39-word template plus a
    member-unique final word. Paraphrase-level: exact dedup cannot collapse
    the members (every text is distinct), member-member Jaccard is
    35/41 ~ 0.854 (>= the 0.8 production threshold), and the shared
    35-shingle prefix dominates every minhash permutation, so the whole
    cluster funnels into the SAME band buckets — the boilerplate shape that
    makes an unguarded band self-join quadratic in the cluster size. The
    other 80% are token-disjoint unique docs (no cross-doc pairs).
    Rungs by prefix: doc_id < 50_000 (10k cluster) and the full 500k
    (100k cluster). Deterministic (no RNG needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 500_000
    template = " ".join(f"tpl{i}" for i in range(39))
    texts = []
    for i in range(n):
        if i % 5 == 0:
            texts.append(f"{template} tail{i}")
        else:
            texts.append(" ".join(f"u{i}w{j}" for j in range(30)))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(
        tbl, f"{OUT_DIR}/documents_hotcluster.parquet", row_group_size=50_000
    )


def gen_documents_simhash_hot() -> None:
    """SimHash hot-cluster corpus (VERDICT r11 #1): 500k docs of which
    EXACTLY 20% (doc_id % 5 == 0, so doc_id-prefix rungs keep the ratio)
    form ONE boilerplate cluster — a shared 400-word template plus a
    member-unique final word. The template must be LONG for simhash
    specifically: a signature bit is free to flip between members only
    where the 400-word template's +-1 bit sum is exactly +-1
    (P ~ 2*sqrt(2/(pi*401)) ~ 0.08 per bit), so members sit within a few
    hamming flips of each other (~3.8 expected free bits at 48-bit
    signatures) — a genuine hamming<=3 near-dup cluster that funnels into
    the same band buckets, while the 39-word hotcluster corpus's members
    spread ~12 free bits apart (no simhash pairs at all). The other 80%
    are token-disjoint unique docs: under the 48-bit/12-bit-band WIDE
    parameterization they spread over 4096 values/band (below any sane
    ceiling), while under the registered 32-bit/8-bit-band form the
    256-value keyspace saturates from the background ALONE — the two
    regimes the SCALING rung contrasts. Deterministic (no RNG)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 500_000
    template = " ".join(f"sh{i}" for i in range(400))
    texts = []
    for i in range(n):
        if i % 5 == 0:
            texts.append(f"{template} tail{i}")
        else:
            texts.append(" ".join(f"u{i}w{j}" for j in range(30)))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(
        tbl, f"{OUT_DIR}/documents_simhash_hot.parquet", row_group_size=50_000
    )


def gen_embeddings_hotcluster() -> None:
    """SRP hot-cluster corpus (VERDICT r11 #2): 200k unit vectors of which
    EXACTLY 20% (vec_id % 5 == 0) are near-identical copies of ONE
    template direction (sigma=0.005 noise, renormalized — member-member
    cosine ~0.9999, far above the 0.99 near-dup threshold, yet no two
    vectors are byte-identical so exact dedup can't collapse them). Every
    member signs the same side of all 128 SRP hyperplanes with
    overwhelming probability, so the whole cluster funnels into the same
    (band, key) bucket in every band — the embedding-space analogue of
    the boilerplate LSH failure. The other 80% follow the standard
    clustered geometry (1,600 centers x 100 members, sigma=0.05,
    member-member cosine ~0.86 — below threshold, so they add bucket
    load but no true pairs). Deterministic (seed 11)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    n = 200_000
    n_cluster = n // 5
    template = rng.standard_normal(EMB_DIM).astype(np.float32)
    template /= np.linalg.norm(template)
    cluster = template[None, :] + 0.005 * rng.standard_normal(
        (n_cluster, EMB_DIM)
    ).astype(np.float32)
    n_bg = n - n_cluster
    centers = rng.standard_normal((1_600, EMB_DIM)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    bg = np.repeat(centers, n_bg // 1_600, axis=0)
    bg = bg + 0.05 * rng.standard_normal(bg.shape).astype(np.float32)
    vecs = np.empty((n, EMB_DIM), dtype=np.float32)
    mask = np.arange(n) % 5 == 0
    vecs[mask] = cluster
    vecs[~mask] = bg
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float32()), EMB_DIM
            ).cast(pa.list_(pa.float32())),
        }
    )
    pq.write_table(
        tbl, f"{OUT_DIR}/embeddings_hotcluster.parquet", row_group_size=20_000
    )


def gen_embeddings_1m() -> None:
    """1M-vector rung (VERDICT r11 #5): one more ~decade for the CC-rounds
    trend (200k -> 1M) under the same clustered geometry as the 200k
    corpus (10,000 centers x 100 members, sigma=0.05) so mutual-kNN's
    graph shape — and therefore its connected-component diameter — scales
    the way a real embedding corpus does. Deterministic (seed 43)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(43)
    n_centers, per = 10_000, 100
    centers = rng.standard_normal((n_centers, EMB_DIM)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0)
    vecs = vecs + 0.05 * rng.standard_normal(vecs.shape).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float32()), EMB_DIM
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(
                np.repeat(np.arange(n_centers, dtype=np.int32), per)
            ),
        }
    )
    pq.write_table(tbl, f"{OUT_DIR}/embeddings_1m.parquet", row_group_size=50_000)


def main() -> None:
    import duckdb

    os.makedirs(OUT_DIR, exist_ok=True)
    con = duckdb.connect()
    gen_documents(con)
    gen_embeddings()
    gen_events_skewed()
    gen_documents_hotcluster()
    gen_documents_simhash_hot()
    gen_embeddings_hotcluster()
    gen_embeddings_1m()
    print(
        "wrote",
        OUT_DIR,
        con.sql(
            f"SELECT count(*) FROM read_parquet('{OUT_DIR}/documents.parquet')"
        ).fetchone()[0],
        "docs,",
        con.sql(
            f"SELECT count(*) FROM read_parquet('{OUT_DIR}/embeddings.parquet')"
        ).fetchone()[0],
        "embeddings",
    )


if __name__ == "__main__":
    main()
