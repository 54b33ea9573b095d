"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schema, partition sizing, Arrow batch shape,
UDF signatures — is real and tested; the actual media decode is STUBBED
(the image/audio libraries are not in this container): ``decode_media``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder produces stable feature vectors so the
pipeline around it can be exercised end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),     # image|audio|video
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from any text table: payload
    = repeated md5 bytes (binary plumbing without external data)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    payload = F.unhex(
        F.concat(F.md5(F.col(text_col)), F.md5(F.concat(F.col(text_col), F.lit("x"))))
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            kinds.alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            (F.col(id_col) % 640 + 1).cast("int").alias("width"),
            (F.col(id_col) % 480 + 1).cast("int").alias("height"),
            (F.col(id_col) % 10_000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode_batch(payloads, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a whole Arrow batch of byte payloads at once: all payloads
    are packed into ONE contiguous uint8 buffer and the per-row cyclic
    tile (feature[i, j] = payload[i][j mod len_i] / 255) becomes a single
    2-D fancy gather — no per-row Python in the batch hot loop. Returns
    ``(lens, features)`` with ``features`` shaped (rows, dim); zero-length
    / NULL payloads yield zero vectors."""
    n = len(payloads)
    lens = np.fromiter(
        (0 if p is None else len(p) for p in payloads), dtype=np.int64, count=n
    )
    buf = np.frombuffer(b"".join(p for p in payloads if p), dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    safe = np.maximum(lens, 1)
    idx = offsets[:, None] + (np.arange(dim)[None, :] % safe[:, None])
    feats = np.zeros((n, dim), dtype=np.float32)
    nz = lens > 0
    if nz.any() and len(buf):
        feats[nz] = buf[idx[nz]].astype(np.float32) / 255.0
    return lens, feats


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas`` —
    Arrow-batched, vectorized inside each batch (numpy over the byte
    buffers), never per-row Python at the Spark level.

    ``fake=False`` is the real-decoder slot: plug in PIL/librosa/ffmpeg
    there on a cluster that has them; the container lacks them, so it
    raises ``NotImplementedError`` (clearly marked stub).
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/librosa/ffmpeg — not available in "
            "this container; pass fake=True for the deterministic stub"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens, feats = _fake_decode_batch(list(pdf["payload"]), dim)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": lens,
                    "feature": list(feats),
                }
            )

    out = media
    if batch_hint:
        out = out.repartition(batch_hint)
    return out.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (JVM-side explode of a sequence — the decode of the actual
    frame happens in :func:`extract_features` downstream)."""
    return media.where(F.col("meta.kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
        "payload",
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plumbing: computes target dimensions (aspect-preserving)
    JVM-side; the pixel work belongs to the decode stub."""
    w, h = F.col("meta.width").cast("double"), F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(max_side)) / w, F.lit(float(max_side)) / h, F.lit(1.0))
    return media.select(
        "media_id",
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
    )
