"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` columns travelling next to typed
metadata (``modality``, ``mime``, ``width``…). All Spark-side
mechanics — schema, partition sizing, Arrow batch shape, UDF
signatures — are real and tested; only the codec step is stubbed
because no image/audio libraries exist in this container. Swap
``_decode_stub`` for PIL/torchaudio in production; nothing else
changes.

Scale notes: binary payloads make rows wide — size
``spark.sql.files.maxPartitionBytes`` so a task's batch of blobs fits
executor memory, and use ``mapInPandas`` (streaming iterator of Arrow
batches) rather than collect-style UDFs so one task never
materializes its whole partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes, modality: str) -> list[float]:
    """STUB codec: deterministic fake feature vector from payload
    bytes. Real deployments replace this with PIL / ffmpeg /
    torchaudio decode + model featurization; the Spark plumbing
    around it is unchanged."""
    if payload is None:
        return []
    # 8-dim "feature": byte-histogram moments, stable across runs.
    arr = memoryview(payload)
    n = len(arr)
    if n == 0:
        return [0.0] * 8
    s = sum(arr)
    return [
        float(n),
        s / n,
        float(arr[0]),
        float(arr[-1]),
        float(min(arr)),
        float(max(arr)),
        float(s % 997),
        float((n * 31 + s) % 65521),
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/featurize media blobs via ``mapInPandas`` (Arrow-batched,
    streaming — the only sane shape for multi-MB blobs at scale)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "payload_hash": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": [
                        _decode_stub(p, m)
                        for p, m in zip(pdf["payload"], pdf["modality"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode each video blob into
    frame rows. Decode is stubbed (frame index + hash only); the
    explode/repartition shape is the real deliverable."""

    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_hash", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_hash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                # STUB: pretend 1 frame per 1 KiB of payload.
                n_frames = max(len(payload) // 1024, 1)
                for i in range(0, n_frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_hash"].append(
                        hashlib.md5(payload[i : i + 64]).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=frame_schema)


def resize_media(media: DataFrame, target_bytes: int = 4096) -> DataFrame:
    """Image-resize plumbing: rewrite each payload to its resized
    form, preserving the media schema and annotating ``meta``. The
    codec is the documented STUB (deterministic byte truncation to
    ``target_bytes`` — a real deployment decodes, resizes WxH, and
    re-encodes here); the mapInPandas iterator shape, schema
    round-trip, and meta update are the real deliverable. Streaming
    Arrow batches keep one task from materializing its partition of
    blobs at once — the property that matters when payloads are
    megapixel images at 100 TB."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(
                lambda b: None if b is None else bytes(b)[:target_bytes]
            )
            pdf["meta"] = pdf["meta"].map(
                lambda m: {
                    **(dict(m) if m is not None else {}),
                    "resized_to": str(target_bytes),
                }
            )
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: wrap the fixtures' text documents
    as fake media blobs so the binary plumbing is exercised without
    real image data."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


# Executor-side closures live here: ship this module's code by value
# so workers need not import the package (see functions/_shipping.py).
import sys as _sys

from bighouse_spark.functions._shipping import ship_by_value as _ship

_ship(_sys.modules[__name__])
