"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas`` so each Python batch amortizes the
serialization boundary. The decode libraries (PIL/ffmpeg/etc.) are NOT in
this container — the decode kernel is stubbed behind
``set_decoder``/``DeterministicFakeDecoder`` with the Spark-side plumbing
(schemas, batch iteration, partition sizing) fully real and tested.

At 100 TB: payloads dominate row size, so operators (a) never shuffle the
binary column — metadata is extracted first, payloads are only carried
through narrow maps; (b) repartition by byte budget, not row count
(``repartition_by_bytes``).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

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
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("content_hash", StringType(), False),
    ]
)

Decoder = Callable[[bytes], tuple[int, int]]

_decoder: Optional[Decoder] = None


def set_decoder(fn: Decoder) -> None:
    """Install a real decode kernel, e.g. PIL:  lambda b: Image.open(io.BytesIO(b)).size"""
    global _decoder
    _decoder = fn


class DeterministicFakeDecoder:
    """Stand-in decode: md5-derived (width, height). Deterministic, so the
    full pipeline is testable (and oracle-checkable) without media libs."""

    def __call__(self, payload: bytes) -> tuple[int, int]:
        h = hashlib.md5(payload).hexdigest()
        return int(h[:4], 16) % 1920 + 1, int(h[4:8], 16) % 1080 + 1


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fixture adapter: fabricate a binary payload column from text (the
    corpus has no real media); production sources read binary directly."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_metadata(media: DataFrame) -> DataFrame:
    """Extract typed metadata from payloads via Arrow-batched pandas.

    The pattern to copy for any real decoder: iterate pandas batches,
    apply the kernel per element, emit a narrow typed frame — the binary
    column is dropped as early as possible so downstream stages never
    shuffle payload bytes.
    """
    decoder = _decoder or DeterministicFakeDecoder()

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(
                lambda b: decoder(bytes(b)) if b is not None else (None, None)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                        if b is not None
                        else ""
                    ),
                }
            )

    return media.mapInPandas(_decode, DECODED_SCHEMA)


def repartition_by_bytes(
    media: DataFrame,
    target_partition_bytes: int = 128 * 1024 * 1024,
    payload_col: str = "payload",
) -> DataFrame:
    """Repartition a payload table so each partition holds ~target bytes.

    Row-count-based splits are wrong when rows are megabytes; size the
    shuffle by the actual byte volume (computed from a cheap agg).
    """
    total = media.select(
        F.sum(F.length(F.col(payload_col))).alias("b")
    ).collect()[0]["b"] or 0
    n = max(1, int(total / target_partition_bytes) + 1)
    return media.repartition(n)


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Per-payload feature vector (the embedding-model stage) as an
    Arrow-batched one-to-one map. Fake kernel: md5-chained floats in
    [0, 1) — install a real model with ``set_feature_extractor``. The
    binary column is dropped in the same stage (never shuffled)."""
    extractor = _feature_extractor or _fake_features

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": pdf["payload"].map(
                        lambda b: extractor(bytes(b), dim)
                        if b is not None
                        else None
                    ),
                }
            )

    return media.mapInPandas(_run, FEATURES_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> list:
    h = hashlib.md5(payload).hexdigest()
    out = []
    for i in range(dim):
        h = hashlib.md5((h + str(i)).encode()).hexdigest()
        out.append(int(h[:8], 16) / float(2**32))
    return out


_feature_extractor = None


def set_feature_extractor(fn) -> None:
    """Install a real feature kernel: ``fn(payload_bytes, dim) -> list[float]``."""
    global _feature_extractor
    _feature_extractor = fn


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def resize_media(
    media: DataFrame, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """Payload → payload transform (the resize/transcode stage): binary in,
    binary out, dims clamped to the bounding box with aspect preserved.
    Fake kernel halves the payload; a real one re-encodes pixels
    (``set_resizer``). Payloads stay within the narrow map — resize then
    write, never resize then shuffle."""
    resizer = _resizer or _fake_resize
    decoder = _decoder or DeterministicFakeDecoder()

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r["payload"]) if r["payload"] is not None else None
                if b is None:
                    rows.append((r["doc_id"], r["media_type"], None, None, None))
                    continue
                w, h = decoder(b)
                scale = min(max_w / w, max_h / h, 1.0)
                rows.append(
                    (
                        r["doc_id"],
                        r["media_type"],
                        resizer(b, scale),
                        max(1, int(w * scale)),
                        max(1, int(h * scale)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "payload", "width", "height"],
            )

    return media.mapInPandas(_run, RESIZED_SCHEMA)


def _fake_resize(payload: bytes, scale: float) -> bytes:
    return payload[: max(1, int(len(payload) * max(scale, 0.01)))]


_resizer = None


def set_resizer(fn) -> None:
    """Install a real resize kernel: ``fn(payload, scale) -> bytes``."""
    global _resizer
    _resizer = fn


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_hash", StringType(), False),
    ]
)


def sample_frames(media: DataFrame, max_frames: int = 4) -> DataFrame:
    """Video → frames: the one-to-many (UDTF-shaped) media op. Each
    payload yields ``len % max_frames + 1`` deterministic frames; a real
    kernel (``set_frame_sampler``) would emit decoded frame payloads at a
    target fps. Output rows are narrow (hashes, not frames) so the
    explode happens after the binary column is consumed."""
    sampler = _frame_sampler or _fake_frames

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, idxs, hashes = [], [], [], []
            for _, r in pdf.iterrows():
                if r["payload"] is None:
                    continue
                for i, fh in sampler(bytes(r["payload"]), max_frames):
                    ids.append(r["doc_id"])
                    types.append(r["media_type"])
                    idxs.append(i)
                    hashes.append(fh)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "media_type": pd.Series(types, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return media.mapInPandas(_run, FRAMES_SCHEMA)


def _fake_frames(payload: bytes, max_frames: int) -> list:
    ph = hashlib.md5(payload).hexdigest()
    k = len(payload) % max_frames + 1
    return [
        (i, hashlib.md5((ph + str(i)).encode()).hexdigest())
        for i in range(k)
    ]


_frame_sampler = None


def set_frame_sampler(fn) -> None:
    """Install a real sampler: ``fn(payload, max_frames) -> [(idx, hash)]``."""
    global _frame_sampler
    _frame_sampler = fn


__all__ = [
    "MEDIA_SCHEMA",
    "DECODED_SCHEMA",
    "FEATURES_SCHEMA",
    "RESIZED_SCHEMA",
    "FRAMES_SCHEMA",
    "set_decoder",
    "set_feature_extractor",
    "set_resizer",
    "set_frame_sampler",
    "DeterministicFakeDecoder",
    "attach_payload",
    "decode_metadata",
    "extract_features",
    "resize_media",
    "sample_frames",
    "repartition_by_bytes",
]
