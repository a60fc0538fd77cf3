"""Multimodal column plumbing: opaque binary media + typed metadata.

Media (image/audio/video) travels as ``binary`` columns with a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so each executor processes whole record batches.  The
actual codec step is STUBBED (image/audio libraries are not available in
this environment): ``decode_stub=True`` (default) produces deterministic
fake features derived from the bytes, and ``decode_stub=False`` raises
``NotImplementedError`` at the point where a real decoder (PIL/ffmpeg)
would be invoked.  The Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_dim", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FEAT_DIM = 16


def make_media_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fabricate a deterministic media table from a text table: payload =
    utf-8 bytes, mime cycled over image/audio/video — a stand-in corpus
    for plumbing tests (no real media ships with the sandbox)."""
    mime = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        mime.alias("mime"),
        # byte count of the payload, not the char count of the text —
        # they diverge on any multibyte corpus
        F.length(payload).cast("long").alias("n_bytes"),
        payload.alias("payload"),
    )


def _decode_real(payload: bytes, mime: str) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding requires PIL/soundfile/ffmpeg, which are not "
        "installed in this environment; run with decode_stub=True"
    )


def _decode_fake(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic fake 'decoded features': byte-histogram projection
    seeded by the payload digest — stable across processes."""
    if payload is None:
        return np.zeros(FEAT_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % FEAT_DIM, minlength=FEAT_DIM).astype(np.float64)
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "big")
    hist[seed % FEAT_DIM] += 1.0
    n = np.linalg.norm(hist)
    return (hist / n if n else hist).astype(np.float32)


def extract_media_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """media -> per-item feature vectors via Arrow-batched mapInPandas."""
    decode = _decode_fake if decode_stub else _decode_real

    def run(batches):
        for pdf in batches:
            feats = [decode(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_dim": FEAT_DIM,
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the opaque payload: slice the byte stream at
    fixed strides (real video frame extraction is stubbed; the
    partitioning/explode shape is what matters at scale — one media row
    fans out to many frame rows, so the explode must happen on executors)."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            # ceil so the trailing partial frame is emitted (floor dropped
            # the tail for every payload with size % stride != 0)
            F.greatest(F.ceil(F.col("n_bytes") / every_n_bytes).cast("int") - 1, F.lit(0)),
        ),
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            # slice the BINARY column directly — substring on BinaryType
            # returns an exact byte slice.  Never cast payload to string:
            # real media is not valid UTF-8 and the cast mangles bytes.
            F.substring(F.col("payload"), i * every_n_bytes + 1, every_n_bytes).alias("frame_bytes"),
        ),
    )
    return media.select(
        "media_id", "mime", F.explode(frames).alias("frame")
    ).select("media_id", "mime", F.col("frame.frame_idx").alias("frame_idx"), F.col("frame.frame_bytes").alias("frame_bytes"))
