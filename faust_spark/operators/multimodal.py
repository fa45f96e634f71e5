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
    BinaryType,
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


__all__ = [
    "MEDIA_SCHEMA",
    "DECODED_SCHEMA",
    "set_decoder",
    "DeterministicFakeDecoder",
    "attach_payload",
    "decode_metadata",
    "repartition_by_bytes",
]
