"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(``decode_media`` raises NotImplementedError unless the deterministic fake is
requested), but everything Spark-side is real and tested: the schema, the
Arrow batch shape through ``mapInPandas``, the partitioning discipline
(binary payloads never shuffle — feature extraction is a narrow map), and the
downstream feature columns.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("payload", T.BinaryType()),    # opaque encoded bytes
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),     # nullable for audio
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),  # nullable for image
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "media_id long, kind string, payload_bytes int, "
    f"feature array<float>, decode_status string"
)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode an encoded media payload into a raw array.

    STUB: real decoding requires PIL/ffmpeg, absent from this container.
    With ``fake=True`` a deterministic stand-in (seeded by the payload hash)
    is produced so the full Spark plumbing can be exercised and tested.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires PIL/ffmpeg (not in this container); "
            "pass fake=True for the deterministic test double"
        )
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.rand(FEATURE_DIM).astype(np.float32)


def extract_media_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Feature extraction as a narrow Arrow-batched map (no shuffle): decode
    each payload (stub), emit a FEATURE_DIM embedding + decode status.
    Batch shape is the real one a production decoder would see."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                try:
                    feat = decode_media(bytes(payload), row["kind"], fake=fake_decode)
                    status = "ok" if fake_decode else "unreachable"
                except NotImplementedError:
                    feat, status = np.zeros(FEATURE_DIM, dtype=np.float32), "stubbed"
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "payload_bytes": len(payload),
                        "feature": feat.tolist(),
                        "decode_status": status,
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def gen_media_df(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.sha256(f"media:{i}".encode()).digest() * (4 + i % 8)
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        "width": 64 + i % 512 if kind != "audio" else None,
                        "height": 64 + (i * 7) % 512 if kind != "audio" else None,
                        "duration_ms": 1000 + i % 60000 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)
