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


def chunk_media(df: DataFrame, frame_bytes: int = 64) -> DataFrame:
    """Frame/chunk sampling over the binary column: split each payload
    into fixed-size byte frames — the video-frame / audio-window pattern.

    Fully columnar (sequence -> explode -> binary substring): chunk
    geometry and slicing stay in whole-stage codegen; no Python touches
    the bytes. Returns (media_id, frame_idx, n_frame_bytes, frame_md5) —
    the frame payload itself is sliced but only its fingerprint is
    emitted here; a downstream decode kernel would take the slice.
    """
    n = F.octet_length(F.col("content"))
    n_frames = F.ceil(n / F.lit(frame_bytes)).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.expr("array()").cast("array<int>")
    )
    # content rides through the explode — no join back, no extra shuffle
    exploded = df.select(
        "media_id", "content", F.explode(idx).alias("__i")
    ).withColumn("frame_idx", F.col("__i").cast("long"))
    chunk = F.substring(
        F.col("content"),
        (F.col("frame_idx") * frame_bytes + 1).cast("int"),
        frame_bytes,
    )
    return exploded.select(
        "media_id",
        "frame_idx",
        F.octet_length(chunk).cast("long").alias("n_frame_bytes"),
        F.md5(chunk).alias("frame_md5"),
    )


def embed_media_stub(df: DataFrame, dim: int = 4) -> DataFrame:
    """Embedding-generation plumbing: an Arrow-batched mapInPandas kernel
    that maps each binary payload to a dense vector — the exact shape a
    real image/audio embedding model runs in (batch in, vector batch out).

    The kernel is a deterministic md5-derived stub (the model libraries
    are not in this container): dim j = uint32(md5(j ':' payload)) / 2^32.
    Deterministic and closed-form, so the DuckDB oracle can verify the
    kernel's output exactly — proving the Arrow plumbing end to end.
    Emits flattened columns (media_id, e0..e{dim-1}).
    """
    import hashlib

    out_schema = T.StructType(
        [T.StructField("media_id", T.LongType())]
        + [T.StructField(f"e{j}", T.DoubleType()) for j in range(dim)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cols = {"media_id": pdf["media_id"].astype("int64")}
            payloads = pdf["content"]
            for j in range(dim):
                prefix = f"{j}:".encode()
                cols[f"e{j}"] = [
                    int.from_bytes(
                        hashlib.md5(prefix + bytes(p)).digest()[:4], "big"
                    )
                    / 2**32
                    for p in payloads
                ]
            yield pd.DataFrame(cols)

    return df.select("media_id", "content").mapInPandas(kernel, schema=out_schema)


def audio_frame_energy(df: DataFrame, frame_bytes: int = 64) -> DataFrame:
    """Audio-feature extraction plumbing: treat the binary payload as
    unsigned 8-bit PCM, split it into ``frame_bytes``-byte frames
    (trailing partial frame included, consistent with ``chunk_media``),
    and compute per-frame signal energy ``sum((b - 128)^2)`` — the
    windowed-energy / silence-detection kernel every audio pipeline runs
    before VAD or loudness filtering.

    The kernel is a real vectorized DSP shape — ``np.frombuffer`` ->
    per-frame reduction, Arrow-batched via ``mapInPandas``, no per-row
    Python — and, being closed-form integer arithmetic, it is exactly
    reproducible by the DuckDB oracle (which recomputes byte values from
    ``hex(encode(text))``), proving the Arrow plumbing end to end. A real
    16-bit/float PCM decode would change only the ``frombuffer`` dtype.

    Returns (media_id, n_frames, total_energy, peak_frame_energy,
    mean_frame_energy); payloads of zero length yield no row (no frames).
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("total_energy", T.LongType()),
            T.StructField("peak_frame_energy", T.LongType()),
            T.StructField("mean_frame_energy", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {
                "media_id": [],
                "n_frames": [],
                "total_energy": [],
                "peak_frame_energy": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                if payload is None:
                    # NULL content (left-joined / sparse media rows): skip
                    # like an empty buffer instead of TypeError on bytes()
                    continue
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                if buf.size == 0:
                    continue
                sq = (buf.astype(np.int64) - 128) ** 2
                n_frames = -(-buf.size // frame_bytes)
                pad = n_frames * frame_bytes - buf.size
                if pad:
                    sq = np.concatenate([sq, np.zeros(pad, dtype=np.int64)])
                per_frame = sq.reshape(n_frames, frame_bytes).sum(axis=1)
                rows["media_id"].append(int(mid))
                rows["n_frames"].append(n_frames)
                rows["total_energy"].append(int(per_frame.sum()))
                rows["peak_frame_energy"].append(int(per_frame.max()))
            if not rows["media_id"]:
                continue
            out = pd.DataFrame(rows)
            out["mean_frame_energy"] = (
                out["total_energy"] / out["n_frames"]
            )
            yield out.astype(
                {
                    "media_id": "int64",
                    "n_frames": "int64",
                    "total_energy": "int64",
                    "peak_frame_energy": "int64",
                    "mean_frame_energy": "float64",
                }
            )

    return df.select("media_id", "content").mapInPandas(kernel, schema=out_schema)
