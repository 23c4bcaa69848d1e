"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns next to typed metadata; the
decode / feature-extract steps run as Arrow-batched ``mapInPandas`` so the
heavy libraries touch data executor-side in columnar batches.

Round-6: formats whose specs need no codec libraries decode FOR REAL with
pure-stdlib parsers — WAV (RIFF chunk walk + 8/16-bit PCM), PPM/PGM
(netpbm headers), BMP (BITMAPINFOHEADER) — via ``decode_media_real`` /
``extract_wav_meta`` / ``wav_frame_energy`` / ``extract_image_meta``.
JPEG/PNG/MP4-class formats still require codec libraries (PIL/ffmpeg)
that are NOT in this container, and stay behind the NotImplementedError
gate; for those, ``extract_media_meta`` remains the clearly-marked
deterministic stub exercising the same Arrow-batched plumbing.
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


# ---------------------------------------------------------------------------
# Real container codecs (round-6): pure-stdlib parsers for the formats whose
# specs need no codec libraries — WAV (RIFF + PCM), PPM/PGM (P6/P5), BMP
# (BITMAPINFOHEADER). JPEG/PNG/MP4-class formats stay behind the
# NotImplementedError gate (they need real codec libraries).
# ---------------------------------------------------------------------------

import struct


def build_wav(
    pcm: bytes, channels: int = 1, sample_rate: int = 16000, bits: int = 8
) -> bytes:
    """Minimal canonical RIFF/WAVE container around raw PCM frames —
    the builder half of the round-trip the oracle checks."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, channels, sample_rate, byte_rate,
        block_align, bits,
        b"data", len(pcm),
    )
    return hdr + pcm


def parse_wav(b: bytes) -> dict:
    """RIFF chunk walk: returns channels / sample_rate / bits_per_sample /
    n_samples / pcm bytes. Raises ValueError on a malformed container —
    callers decide whether to quarantine or fail."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos:pos + 4], struct.unpack("<I", b[pos + 4:pos + 8])[0]
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            # a truncated fmt chunk must raise ValueError (the quarantine
            # contract), not struct.error, which would fail the Spark task
            if len(body) < 16:
                raise ValueError(
                    f"truncated fmt chunk ({len(body)} bytes, need 16)"
                )
            (audio_fmt, channels, rate, _br, _ba, bits) = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(f"non-PCM wav (format {audio_fmt})")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    channels, rate, bits = fmt
    n_samples = len(data) // (channels * bits // 8) if bits else 0
    return {
        "kind": "audio/wav", "channels": channels, "sample_rate": rate,
        "bits": bits, "n_samples": n_samples, "pcm": data,
    }


def parse_ppm(b: bytes) -> dict:
    """P5 (graymap) / P6 (pixmap) header: magic, whitespace/comment-
    separated width height maxval, then binary pixels."""
    if b[:2] not in (b"P5", b"P6"):
        raise ValueError("not a P5/P6 netpbm file")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    channels = 3 if b[:2] == b"P6" else 1
    return {
        "kind": "image/ppm" if channels == 3 else "image/pgm",
        "width": width, "height": height, "maxval": maxval,
        "channels": channels, "pixels": b[pos:pos + width * height * channels],
    }


def parse_bmp(b: bytes) -> dict:
    """BITMAPFILEHEADER + BITMAPINFOHEADER (the 40-byte DIB header)."""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP file")
    data_offset = struct.unpack("<I", b[10:14])[0]
    # biWidth AND biHeight are both signed in the BMP spec: a negative
    # biHeight marks a top-down bitmap and must read as abs(height) rows,
    # not a ~4-billion unsigned reinterpretation.
    hdr_size, width, height = struct.unpack("<Iii", b[14:26])
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    bpp = struct.unpack("<H", b[28:30])[0]
    return {
        "kind": "image/bmp", "width": width, "height": abs(height),
        "top_down": height < 0,
        "bits_per_pixel": bpp, "pixels": b[data_offset:],
    }


def decode_media_real(content: bytes, media_type: str | None = None) -> dict:
    """Real decode entry point, dispatched on magic bytes. WAV / PPM /
    PGM / BMP parse with the pure-stdlib codecs above; every other
    format still requires codec libraries not present in this
    environment and stays gated."""
    b = bytes(content)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return parse_wav(b)
    if b[:2] in (b"P5", b"P6"):
        return parse_ppm(b)
    if b[:2] == b"BM":
        return parse_bmp(b)
    raise NotImplementedError(
        f"media decode for {media_type or 'unknown'} requires "
        "PIL/ffmpeg-class libraries; not available in this container — "
        "WAV/PPM/PGM/BMP decode natively, others use extract_media_meta "
        "(deterministic stub)"
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


def attach_wav(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sample_rate: int = 16000,
) -> DataFrame:
    """Wrap each row's utf-8 text bytes in a REAL RIFF/WAVE container
    (8-bit mono PCM) — the demo producer for the real-decode path: what
    reaches downstream operators is a genuine parseable container, so
    ``extract_wav_meta`` / ``wav_frame_energy`` exercise the actual
    header walk, not a stub."""
    out_schema = MEDIA_SCHEMA

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "content": [
                        build_wav(bytes(p), sample_rate=sample_rate)
                        for p in pdf["content"]
                    ],
                    "media_type": "audio/wav",
                }
            )

    base = df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("audio/wav").alias("media_type"),
    )
    return base.mapInPandas(kernel, schema=out_schema)


def extract_wav_meta(df: DataFrame) -> DataFrame:
    """REAL container metadata via the stdlib RIFF parser (round-6,
    replacing the fake-dimension stub for WAV payloads): channels,
    sample rate, bit depth, sample count, duration. Malformed payloads
    yield valid=false with nulls (quarantine row, not a task failure).
    Returns (media_id, valid, channels, sample_rate, bits, n_samples,
    duration_sec)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("valid", T.BooleanType()),
            T.StructField("channels", T.LongType()),
            T.StructField("sample_rate", T.LongType()),
            T.StructField("bits", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_sec", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                if payload is None:
                    continue
                try:
                    meta = parse_wav(bytes(payload))
                    rows.append(
                        (
                            int(mid), True, meta["channels"],
                            meta["sample_rate"], meta["bits"],
                            meta["n_samples"],
                            meta["n_samples"] / meta["sample_rate"],
                        )
                    )
                except ValueError:
                    rows.append((int(mid), False, None, None, None, None, None))
            if not rows:
                continue
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_id", "valid", "channels", "sample_rate",
                    "bits", "n_samples", "duration_sec",
                ],
            )
            yield out

    return df.select("media_id", "content").mapInPandas(kernel, schema=out_schema)


def wav_frame_energy(df: DataFrame, frame_samples: int = 64) -> DataFrame:
    """REAL audio decode + DSP: RIFF header walk -> PCM extraction (8-bit
    unsigned or 16-bit signed LE) -> per-frame energy, the upgrade of
    ``audio_frame_energy``'s treat-bytes-as-PCM shape to a genuine
    container path. Energy is sum(sample_centered^2) per frame of
    ``frame_samples`` samples (8-bit centered at 128, 16-bit at 0), so
    for an 8-bit container the numbers are bit-identical to
    ``audio_frame_energy`` over the raw payload — which is what makes
    the DuckDB oracle able to verify the real decode end-to-end.
    Returns (media_id, n_frames, total_energy, peak_frame_energy,
    mean_frame_energy); malformed/empty payloads yield no row."""
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
                "media_id": [], "n_frames": [],
                "total_energy": [], "peak_frame_energy": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                if payload is None:
                    continue
                try:
                    meta = parse_wav(bytes(payload))
                except ValueError:
                    continue
                if meta["bits"] == 8:
                    samples = np.frombuffer(meta["pcm"], dtype=np.uint8)
                    centered = samples.astype(np.int64) - 128
                elif meta["bits"] == 16:
                    samples = np.frombuffer(meta["pcm"], dtype="<i2")
                    centered = samples.astype(np.int64)
                else:
                    continue  # 24/32-bit: out of scope for the stdlib path
                if centered.size == 0:
                    continue
                sq = centered ** 2
                n_frames = -(-sq.size // frame_samples)
                pad = n_frames * frame_samples - sq.size
                if pad:
                    sq = np.concatenate([sq, np.zeros(pad, dtype=np.int64)])
                per_frame = sq.reshape(n_frames, frame_samples).sum(axis=1)
                rows["media_id"].append(int(mid))
                rows["n_frames"].append(n_frames)
                rows["total_energy"].append(int(per_frame.sum()))
                rows["peak_frame_energy"].append(int(per_frame.max()))
            if not rows["media_id"]:
                continue
            out = pd.DataFrame(rows)
            out["mean_frame_energy"] = out["total_energy"] / out["n_frames"]
            yield out.astype(
                {
                    "media_id": "int64", "n_frames": "int64",
                    "total_energy": "int64", "peak_frame_energy": "int64",
                    "mean_frame_energy": "float64",
                }
            )

    return df.select("media_id", "content").mapInPandas(kernel, schema=out_schema)


def extract_image_meta(df: DataFrame) -> DataFrame:
    """REAL image-header metadata for the stdlib-parseable formats
    (PPM/PGM/BMP): width, height, channels/bpp. Unknown magic yields
    valid=false. Returns (media_id, valid, kind, width, height,
    channels)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("valid", T.BooleanType()),
            T.StructField("kind", T.StringType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("channels", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                if payload is None:
                    continue
                b = bytes(payload)
                try:
                    if b[:2] in (b"P5", b"P6"):
                        m = parse_ppm(b)
                        rows.append(
                            (int(mid), True, m["kind"], m["width"],
                             m["height"], m["channels"])
                        )
                    elif b[:2] == b"BM":
                        m = parse_bmp(b)
                        rows.append(
                            (int(mid), True, m["kind"], m["width"],
                             m["height"], m["bits_per_pixel"] // 8)
                        )
                    else:
                        rows.append((int(mid), False, None, None, None, None))
                except ValueError:
                    rows.append((int(mid), False, None, None, None, None))
            if not rows:
                continue
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "valid", "kind", "width", "height", "channels",
                ],
            )

    return df.select("media_id", "content").mapInPandas(kernel, schema=out_schema)


def build_ppm(payload: bytes) -> bytes | None:
    """Wrap raw bytes as a REAL binary P6 PPM (one pixel row, width =
    pixel count): the demo producer for the real image-decode path,
    exactly as ``build_wav`` is for audio. Returns None when fewer than
    one full RGB pixel is available."""
    n_px = len(payload) // 3
    if n_px == 0:
        return None
    body = payload[: n_px * 3]
    return b"P6\n%d 1\n255\n" % n_px + body


def attach_ppm(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(media_id, content, media_type) frame of genuine P6 containers
    built from each row's utf-8 text bytes (rows too short for one
    pixel are dropped)."""
    out_schema = MEDIA_SCHEMA

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, blobs = [], []
            for mid, p in zip(pdf["media_id"], pdf["content"]):
                blob = build_ppm(bytes(p))
                if blob is None:
                    continue
                ids.append(int(mid))
                blobs.append(blob)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "content": pd.Series(blobs, dtype=object),
                    "media_type": "image/x-portable-pixmap",
                }
            )

    base = df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
    )
    return base.mapInPandas(kernel, schema=out_schema)


def ppm_channel_stats(df: DataFrame) -> DataFrame:
    """Per-image RGB channel statistics through the REAL P6 decode
    (``parse_ppm`` header walk -> pixel plane): exact integer channel
    sums and one float mean per channel — the image-side twin of
    ``wav_frame_energy`` (same contract: a malformed container
    quarantines as valid=false instead of failing the task). Returns
    (media_id, valid, width, height, sum_r, sum_g, sum_b, mean_r,
    mean_g, mean_b).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("valid", T.BooleanType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                if payload is None:
                    continue
                try:
                    m = parse_ppm(bytes(payload))
                    px = np.frombuffer(
                        m["pixels"], dtype=np.uint8
                    ).astype(np.int64)
                    n_px = m["width"] * m["height"]
                    px = px[: n_px * 3].reshape(n_px, 3)
                    sums = px.sum(axis=0)
                    rows.append(
                        (
                            int(mid),
                            True,
                            int(m["width"]),
                            int(m["height"]),
                            int(sums[0]),
                            int(sums[1]),
                            int(sums[2]),
                            float(sums[0]) / n_px,
                            float(sums[1]) / n_px,
                            float(sums[2]) / n_px,
                        )
                    )
                except (ValueError, struct.error):
                    rows.append(
                        (int(mid), False, None, None, None, None, None,
                         None, None, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in out_schema.fields],
            )

    return df.mapInPandas(kernel, schema=out_schema)
