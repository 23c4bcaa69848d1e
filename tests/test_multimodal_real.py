"""Real stdlib media codecs (round-6): hand-built WAV/PPM/BMP bytes with
known answers through the parsers and the Arrow-batched Spark operators."""

from __future__ import annotations

import struct

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators import multimodal as mm


def test_wav_roundtrip_header_fields():
    pcm = bytes(range(200))
    b = mm.build_wav(pcm, channels=1, sample_rate=8000, bits=8)
    meta = mm.parse_wav(b)
    assert meta["channels"] == 1
    assert meta["sample_rate"] == 8000
    assert meta["bits"] == 8
    assert meta["n_samples"] == 200
    assert meta["pcm"] == pcm


def test_wav_16bit_stereo_counts_frames_not_bytes():
    # 100 stereo 16-bit frames = 400 bytes of PCM
    pcm = struct.pack("<400B", *([0] * 400))
    b = mm.build_wav(pcm, channels=2, sample_rate=44100, bits=16)
    meta = mm.parse_wav(b)
    assert meta["channels"] == 2 and meta["bits"] == 16
    assert meta["n_samples"] == 100


def test_wav_chunk_walk_skips_unknown_chunks():
    """A LIST chunk between fmt and data must be walked over (real files
    carry INFO metadata), including the odd-size word-alignment pad."""
    pcm = b"\x80\x7f\x80"
    base = mm.build_wav(pcm, sample_rate=16000, bits=8)
    fmt_chunk = base[12:36]          # "fmt " + size + 16 bytes
    data_chunk = base[36:]
    listbody = b"INFOx"              # odd size 5 -> needs 1 pad byte
    lst = b"LIST" + struct.pack("<I", len(listbody)) + listbody + b"\x00"
    doctored = (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt_chunk) + len(lst) + len(data_chunk))
        + b"WAVE" + fmt_chunk + lst + data_chunk
    )
    meta = mm.parse_wav(doctored)
    assert meta["pcm"] == pcm and meta["n_samples"] == 3


def test_wav_malformed_raises():
    with pytest.raises(ValueError):
        mm.parse_wav(b"RIFFxxxxWAVE")  # no chunks
    with pytest.raises(ValueError):
        mm.parse_wav(b"not audio at all")


def test_ppm_and_pgm_headers():
    ppm = b"P6\n# a comment\n3 2\n255\n" + bytes(18)
    m = mm.parse_ppm(ppm)
    assert (m["width"], m["height"], m["channels"]) == (3, 2, 3)
    assert len(m["pixels"]) == 18
    pgm = b"P5 4 4 255 " + bytes(16)
    m = mm.parse_pgm_bytes = mm.parse_ppm(pgm)
    assert (m["width"], m["height"], m["channels"]) == (4, 4, 1)


def test_bmp_header():
    # minimal 2x2 24bpp BMP: 54-byte headers + 2 rows of (6 bytes + 2 pad)
    row = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"
    pixels = row * 2
    filehdr = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    infohdr = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixels),
                          2835, 2835, 0, 0)
    m = mm.parse_bmp(filehdr + infohdr + pixels)
    assert (m["width"], m["height"], m["bits_per_pixel"]) == (2, 2, 24)
    assert len(m["pixels"]) == 16


def test_wav_truncated_fmt_chunk_raises_valueerror_not_struct_error():
    """A fmt chunk shorter than 16 bytes must raise ValueError (the
    quarantine contract the Arrow kernels catch), never struct.error."""
    short_fmt = b"fmt " + struct.pack("<I", 8) + bytes(8)
    data = b"data" + struct.pack("<I", 2) + b"\x80\x80"
    body = b"WAVE" + short_fmt + data
    b = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="truncated fmt"):
        mm.parse_wav(b)


def test_bmp_top_down_negative_height():
    """biHeight is SIGNED: a top-down BMP (negative height) reads as
    abs(height) rows, not a ~4-billion unsigned reinterpretation."""
    row = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"
    pixels = row * 2
    filehdr = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    infohdr = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(pixels),
                          2835, 2835, 0, 0)
    m = mm.parse_bmp(filehdr + infohdr + pixels)
    assert (m["width"], m["height"]) == (2, 2)
    assert m["top_down"] is True


def test_decode_media_real_dispatch_and_gate():
    assert mm.decode_media_real(mm.build_wav(b"\x80"))["kind"] == "audio/wav"
    assert mm.decode_media_real(b"P5 1 1 255 \x00")["kind"] == "image/pgm"
    with pytest.raises(NotImplementedError):
        mm.decode_media_real(b"\x89PNG\r\n", "image/png")


def test_extract_wav_meta_spark(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "hi")], "doc_id long, text string"
    )
    media = mm.attach_wav(df, "doc_id", "text", sample_rate=16000)
    out = {r.media_id: r for r in mm.extract_wav_meta(media).collect()}
    assert out[1].valid and out[1].n_samples == 5
    assert out[1].sample_rate == 16000 and out[1].bits == 8
    assert out[1].duration_sec == pytest.approx(5 / 16000)
    assert out[2].n_samples == 2


def test_extract_wav_meta_quarantines_malformed(spark):
    good = mm.build_wav(b"\x80\x80")
    rows = [(1, bytearray(good), "audio/wav"),
            (2, bytearray(b"garbage"), "audio/wav")]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.extract_wav_meta(media).collect()}
    assert out[1].valid is True and out[2].valid is False
    assert out[2].n_samples is None


def test_wav_frame_energy_matches_raw_pcm_kernel(spark):
    """For 8-bit containers the real decode must be bit-identical to
    audio_frame_energy over the raw payload (container stripped)."""
    df = spark.createDataFrame(
        [(1, "some audio-ish text"), (2, "x" * 100)],
        "doc_id long, text string",
    )
    wrapped = mm.attach_wav(df, "doc_id", "text")
    raw = mm.attach_binary(df, "doc_id", "text")
    via_container = {
        r.media_id: (r.n_frames, r.total_energy, r.peak_frame_energy)
        for r in mm.wav_frame_energy(wrapped, frame_samples=64).collect()
    }
    via_raw = {
        r.media_id: (r.n_frames, r.total_energy, r.peak_frame_energy)
        for r in mm.audio_frame_energy(raw, frame_bytes=64).collect()
    }
    assert via_container == via_raw


def test_wav_frame_energy_16bit(spark):
    # two 16-bit samples: +100 and -100 -> energy 2*10000
    pcm = struct.pack("<hh", 100, -100)
    media = spark.createDataFrame(
        [(7, bytearray(mm.build_wav(pcm, bits=16)), "audio/wav")],
        mm.MEDIA_SCHEMA,
    )
    r = mm.wav_frame_energy(media, frame_samples=64).collect()[0]
    assert r.total_energy == 20000 and r.n_frames == 1


def test_extract_image_meta_spark(spark):
    ppm = b"P6 2 3 255 " + bytes(18)
    rows = [(1, bytearray(ppm), "image/ppm"),
            (2, bytearray(b"\x89PNG"), "image/png")]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.extract_image_meta(media).collect()}
    assert out[1].valid and (out[1].width, out[1].height) == (2, 3)
    assert out[1].kind == "image/ppm" and out[1].channels == 3
    assert out[2].valid is False
