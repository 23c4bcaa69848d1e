"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns next to typed metadata; the
decode / feature-extract steps run as Arrow-batched ``mapInPandas`` so the
heavy libraries touch data executor-side in columnar batches.

The actual codec libraries (PIL/ffmpeg/etc.) are NOT in this container, so
the decode kernel is a clearly-marked deterministic stub — but the Spark
side (schema, partitioning, UDF signature, batch iteration) is the real
production shape and is what the tests exercise.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
    ]
)


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Demo plumbing: derive a binary payload column (utf-8 bytes of the
    text) so the downstream binary-column operators have real input shape.
    In production this column comes straight from the lake (image bytes,
    audio frames...)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
    )


def decode_media_real(content: bytes, media_type: str):
    """Real decode entry point — requires codec libraries not present in
    this environment."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg-class libraries; not available "
        "in this container — use extract_media_meta (deterministic stub)"
    )


def extract_media_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    Stub kernel: byte length + a deterministic fake (width, height) derived
    from the byte length — stands in for a real image-header parse. The
    mapInPandas shape (schema in/out, batch iterator, no per-row Python) is
    the production pattern.
    Returns (media_id, n_bytes, fake_width, fake_height)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("fake_width", T.LongType()),
            T.StructField("fake_height", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n_bytes = pdf["content"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    # deterministic stand-in for decoded dimensions
                    "fake_width": (n_bytes % 1920) + 1,
                    "fake_height": (n_bytes % 1080) + 1,
                }
            )

    return df.select("media_id", "content").mapInPandas(kernel, schema=out_schema)
