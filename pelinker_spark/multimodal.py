"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, plus the Spark-side plumbing for decode / feature-extract /
resize / frame-sample.

The decode bodies are STUBS (this container has no image/audio codecs —
clearly marked below); everything Spark-level is real and tested: schemas,
Arrow batch shapes, mapInPandas signatures, partitioning, and the
deterministic fake decoder used by tests. Swapping a stub body for
PIL/ffmpeg changes nothing else.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("n_frames", T.IntegerType(), False),
    ]
)


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table — payload bytes derive from
    (seed, id) so decode stubs can verify round-trips."""
    rng = spark.range(n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                h = int.from_bytes(
                    hashlib.md5(f"{seed}:media:{i}".encode()).digest()[:8], "big"
                )
                kind = kinds[h % 3]
                payload = hashlib.md5(f"{seed}:payload:{i}".encode()).digest() * (
                    2 + h % 6
                )
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "mime": {"image": "image/png", "audio": "audio/wav",
                                 "video": "video/mp4"}[kind],
                        "width": 64 + h % 512 if kind != "audio" else None,
                        "height": 64 + (h >> 8) % 512 if kind != "audio" else None,
                        "duration_ms": (h >> 4) % 60000 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return rng.mapInPandas(gen, MEDIA_SCHEMA)


def _decode_real(payload: bytes, mime: str) -> np.ndarray:
    """STUB — real decode requires PIL/ffmpeg, absent in this container.
    The engine-level contract is: bytes → (frames, H, W) float array."""
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "swap in PIL/ffmpeg here — the Spark plumbing is unchanged"
    )


def _decode_fake(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in decoder: pseudo-pixels from the payload
    hash. Same output shape contract as _decode_real."""
    h = hashlib.md5(payload).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    n_frames = 1 if mime.startswith("image") else 4
    return rng.rand(n_frames, 8, 8).astype(np.float32)


def extract_media_features(
    media: DataFrame, frame_stride: int = 2, use_fake_decoder: bool = True
) -> DataFrame:
    """Decode → frame-sample (every frame_stride-th frame) → mean-pool
    pixel features, as mapInPandas over Arrow batches. The decoder loads
    once per partition iterator (the per-executor amortization pattern of
    the encode UDF)."""
    decode = _decode_fake if use_fake_decoder else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nfr = [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                frames = decode(bytes(payload), mime)
                sampled = frames[::frame_stride] if len(frames) > 1 else frames
                feats.append(sampled.mean(axis=(0, 1)).astype(np.float32))
                nfr.append(len(sampled))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "n_frames": nfr}
            )

    return media.select("media_id", "payload", "mime").mapInPandas(run, FEATURE_SCHEMA)
