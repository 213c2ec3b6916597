"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, decoded/feature-extracted via Arrow-batched pandas UDFs.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_stub`` raises NotImplementedError unless
``deterministic_fake=True``, in which case it produces md5-derived fake
features so the Spark-side plumbing — schema, partitioning, UDF signature,
batch shape — is real and testable end-to-end.

At 100 TB: binaries stay in parquet/iceberg BINARY columns co-located with
their metadata; mapInPandas processes Arrow record batches so bytes never
round-trip through Python row objects; partition sizing is governed by
``spark.sql.files.maxPartitionBytes`` against the binary column width.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from .._serde import register_self_contained

register_self_contained(__name__)


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_stub(content: bytes, media_type: str, deterministic_fake: bool = False):
    """Placeholder for the real decoder (PIL/ffmpeg/torchaudio). The real
    implementation is environment-provided; the fake is md5-derived and
    deterministic so tests exercise the full plumbing."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in this "
            "environment; pass deterministic_fake=True for plumbing tests"
        )
    digest = hashlib.md5(content or b"").digest()
    return [b / 255.0 for b in digest[:4]]


def decode_pil(content: bytes, media_type: str = "image", feature_dim: int = 4):
    """REAL image decode via Pillow (optional dependency — import is inside
    so environments without media libs never pay for it). Same signature
    contract as the stub: bytes in, ``feature_dim`` doubles out. Features are
    per-channel RGB means + global std — a minimal real feature vector that
    proves the decode happened (the md5-fake cannot produce them).

    This is the drop-in the stub's docstring promises: pass
    ``decoder=decode_pil`` to :func:`binary_features` and nothing else in the
    plan, schema, or batch shape changes."""
    import io

    import numpy as np
    from PIL import Image

    img = Image.open(io.BytesIO(content)).convert("RGB")
    arr = np.asarray(img, dtype=np.float64) / 255.0
    feats = [float(arr[..., c].mean()) for c in range(3)] + [float(arr.std())]
    return feats[:feature_dim] + [0.0] * max(0, feature_dim - len(feats))


def decode_ffmpeg_frame(content: bytes, ts_ms: int, feature_dim: int = 4):
    """REAL video frame decode via PyAV/ffmpeg (optional dependency): seek to
    ``ts_ms``, decode the first frame at/after it, return
    ``(frame_md5, features)`` — the contract :func:`frame_sample`'s
    ``frame_decoder`` seam expects. Digest is over the raw RGB plane, features
    are channel means + std."""
    import hashlib as _hashlib
    import io

    import av
    import numpy as np

    with av.open(io.BytesIO(content)) as container:
        stream = container.streams.video[0]
        offset = int((ts_ms / 1000.0) / float(stream.time_base))
        container.seek(offset, backward=True, stream=stream)
        for frame in container.decode(stream):
            arr = frame.to_ndarray(format="rgb24")
            fm = _hashlib.md5(arr.tobytes()).hexdigest()
            x = arr.astype(np.float64) / 255.0
            feats = [float(x[..., c].mean()) for c in range(3)] + [float(x.std())]
            return fm, feats[:feature_dim] + [0.0] * max(0, feature_dim - len(feats))
    raise ValueError(f"no decodable frame at {ts_ms}ms")


def binary_features(
    df: DataFrame,
    content_col: str = "content",
    media_type_col: str = "media_type",
    deterministic_fake: bool = True,
    feature_dim: int = 4,
    decoder=None,
) -> DataFrame:
    """Append (n_bytes, content_md5, features array<double>) via mapInPandas.

    Batch shape: one Arrow batch in, one out, feature extraction vectorized
    per batch — the signature a real decoder drops into unchanged.

    ``decoder``: optional ``(content: bytes) -> list[float]`` — e.g.
    ``lambda b: decode_pil(b, feature_dim=4)`` — shipped by value inside the
    closure (cloudpickle), so a real Pillow/ffmpeg decode slots in with ZERO
    change to the plan: same mapInPandas, same schema, same batch shape. When
    given, it overrides both the fake and the NotImplementedError guard."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("n_bytes", T.LongType()),
            T.StructField("content_md5", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    fake = deterministic_fake
    dim = feature_dim
    real = decoder

    # self-contained closure: no references to this module's globals, so
    # cloudpickle ships it by value and workers don't need the package on
    # their sys.path (the driver may run us from any cwd).
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        def _decode(content):
            if real is not None:
                return real(content)
            if not fake:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries not present "
                    "in this environment; pass decoder=decode_pil (or your own)"
                )
            digest = _hashlib.md5(content or b"").digest()
            return [b / 255.0 for b in digest[:dim]]

        for pdf in batches:
            blobs = pdf[content_col]
            pdf = pdf.copy()
            pdf["n_bytes"] = [len(b) if b is not None else 0 for b in blobs]
            pdf["content_md5"] = [
                _hashlib.md5(b or b"").hexdigest() for b in blobs
            ]
            pdf["features"] = [_decode(b) for b in blobs]
            yield pdf

    return df.mapInPandas(extract, schema=out_schema)


def frame_sample(
    df: DataFrame,
    n_frames: int = 5,
    content_col: str = "content",
    duration_col: str = "duration_ms",
    id_col: str = "media_id",
    feature_dim: int = 4,
    deterministic_fake: bool = True,
    frame_decoder=None,
) -> DataFrame:
    """Video frame sampling: N evenly-spaced frame timestamps per media row
    (midpoint rule in pure integer math: ``ts_i = (2i+1)*duration //
    (2N)``), each "decoded" to a frame digest + feature vector. Output is
    one row PER FRAME — the explode happens inside the Arrow batch, so
    bytes never round-trip through Python row objects and the output batch
    is written columnar.

    The real decoder (ffmpeg seek + decode at ts_i) drops into the stub's
    place with the same signature; the deterministic fake derives the frame
    digest from md5(content_md5 ':' ts) so the full plumbing — schema,
    batch explode, per-frame features — is testable and SQL-oracle-able.
    Rows with NULL/non-positive duration yield zero frames (not an error —
    images mix with videos in one media table).

    ``frame_decoder``: optional ``(content: bytes, ts_ms: int) ->
    (frame_md5, features)`` — e.g. :func:`decode_ffmpeg_frame` — replacing
    the fake per frame while timestamps, explode, and schema stay identical.

    At 100 TB: row count multiplies by n_frames inside the scan stage with
    no shuffle; downstream embedding/dedup operators consume frame rows
    exactly like document rows."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame_md5", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    fake, dim, n = deterministic_fake, feature_dim, n_frames
    real = frame_decoder

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            ids: list = []
            idxs: list = []
            tss: list = []
            fmd5s: list = []
            feats: list = []
            for mid, blob, dur in zip(
                pdf[id_col], pdf[content_col], pdf[duration_col]
            ):
                if dur is None or pd.isna(dur) or int(dur) <= 0:
                    continue
                if real is None and not fake:
                    raise NotImplementedError(
                        "frame decoding requires ffmpeg/video libraries not "
                        "present in this environment; pass "
                        "frame_decoder=decode_ffmpeg_frame (or your own)"
                    )
                dur = int(dur)
                cmd5 = _hashlib.md5(blob or b"").hexdigest()
                for i in range(n):
                    ts = ((2 * i + 1) * dur) // (2 * n)
                    if real is not None:
                        fm, fv = real(blob, ts)
                    else:
                        fm = _hashlib.md5(f"{cmd5}:{ts}".encode()).hexdigest()
                        fv = [
                            int(fm[2 * j : 2 * j + 2], 16) / 255.0
                            for j in range(dim)
                        ]
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(ts)
                    fmd5s.append(fm)
                    feats.append(fv)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_md5": pd.Series(fmd5s, dtype="object"),
                    "features": pd.Series(feats, dtype="object"),
                }
            )

    return df.mapInPandas(sample, schema=out_schema)


def resize_plan(
    df: DataFrame,
    max_side: int = 256,
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Aspect-preserving resize PLAN: target dimensions in pure integer
    expressions (``out = side * max_side // longest`` when the longest side
    exceeds ``max_side``, identity otherwise; degenerate 0-dims pass
    through). The byte transform itself is the decoder's job — computing
    the plan engine-side keeps the Python hop free of metadata math and
    makes the geometry oracle-checkable."""
    w, h = F.col(width_col).cast("long"), F.col(height_col).cast("long")
    longest = F.greatest(w, h)
    needs = longest > max_side
    out_w = F.when(needs, (w * max_side).cast("long") / longest).otherwise(w)
    out_h = F.when(needs, (h * max_side).cast("long") / longest).otherwise(h)
    return df.withColumn("out_width", F.floor(out_w).cast("int")).withColumn(
        "out_height", F.floor(out_h).cast("int")
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for testing: treat each document's UTF-8 bytes as an opaque
    blob with image-ish metadata, so the multimodal path runs on the driver's
    testdata without real media files."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.pmod(F.col("doc_id"), F.lit(640)).cast("int").alias("width"),
        F.pmod(F.col("doc_id"), F.lit(480)).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )



def audio_segments(
    media: "DataFrame",
    seg_ms: int = 30_000,
    hop_ms: int = 20_000,
    sample_rate: int = 16_000,
    duration_col: str = "duration_ms",
    id_col: str = "media_id",
):
    """Audio segmentation PLAN: fixed-length overlapping windows over each
    clip's duration metadata — the row-expansion step an ASR/audio-LM
    ingest runs before decode (the decode itself stays behind the stub
    seam like the image/video ops; planning needs only the typed
    metadata, never the bytes).

    Pure integer column expressions — no UDF at all: n_segs = 1 +
    ceil((dur - seg)/hop) when dur > seg else 1, exploded via
    ``sequence`` — ceil, not floor, so the LAST window always reaches the
    clip end and no tail audio is dropped (the window itself clips short);
    n_samples = (end - start) * sample_rate div 1000. Runs entirely
    inside whole-stage codegen in the scan stage — at 100 TB this is a
    zero-shuffle flatMap the optimizer can pipeline into the decode
    mapInPandas that follows it.

    Returns (id, seg_idx, start_ms, end_ms, n_samples).
    """
    from pyspark.sql import DataFrame, functions as F  # noqa: F811

    dur = F.col(duration_col)
    n_segs = F.when(
        dur > seg_ms,
        (
            F.lit(1)
            + F.expr(f"({duration_col} - {seg_ms} + {hop_ms} - 1) div {hop_ms}")
        ).cast("int"),
    ).otherwise(F.lit(1))
    segs = media.select(
        F.col(id_col),
        dur.alias("__dur"),
        F.explode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_idx"),
    )
    start = (F.col("seg_idx").cast("long") * hop_ms).alias("start_ms")
    end = F.least(
        F.col("seg_idx").cast("long") * hop_ms + seg_ms, F.col("__dur")
    ).alias("end_ms")
    out = segs.select(id_col, F.col("seg_idx").cast("int").alias("seg_idx"), start, end)
    return out.withColumn(
        "n_samples",
        F.expr(f"((end_ms - start_ms) * {sample_rate}) div 1000").cast("long"),
    )
