"""Wave 68: real PPM container build/decode and channel statistics —
hand-built pixel goldens, truncation, quarantine."""

from __future__ import annotations

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.multimodal import (
    attach_ppm,
    build_ppm,
    parse_ppm,
    ppm_channel_stats,
)


def test_build_parse_roundtrip():
    payload = bytes(range(30))  # 10 RGB pixels
    blob = build_ppm(payload)
    m = parse_ppm(blob)
    assert m["width"] == 10
    assert m["height"] == 1
    assert m["channels"] == 3
    assert m["pixels"] == payload


def test_build_truncates_partial_pixel():
    blob = build_ppm(b"ABCDE")  # 5 bytes -> 1 pixel, 2 bytes dropped
    m = parse_ppm(blob)
    assert m["width"] == 1
    assert m["pixels"] == b"ABC"


def test_build_too_short_returns_none():
    assert build_ppm(b"AB") is None
    assert build_ppm(b"") is None


def test_channel_stats_golden(spark):
    """Pixels (1,2,3) and (10, 20, 30): sums (11, 22, 33), means
    (5.5, 11, 16.5)."""
    import pandas as pd

    blob = build_ppm(bytes([1, 2, 3, 10, 20, 30]))
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [7], "content": [blob], "media_type": ["image/x-portable-pixmap"]}
        )
    )
    row = ppm_channel_stats(media).collect()[0]
    assert row.valid
    assert (row.sum_r, row.sum_g, row.sum_b) == (11, 22, 33)
    assert row.mean_r == pytest.approx(5.5)
    assert row.mean_b == pytest.approx(16.5)
    assert row.width == 2 and row.height == 1


def test_malformed_container_quarantines(spark):
    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "content": [b"P6\n10 1\n255\nxx", build_ppm(b"abcdef")],
                "media_type": ["image/x-portable-pixmap"] * 2,
            }
        )
    )
    rows = {r.media_id: r for r in ppm_channel_stats(media).collect()}
    assert rows[1].valid is False
    assert rows[1].sum_r is None
    assert rows[2].valid is True


def test_attach_ppm_drops_short_and_preserves_bytes(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "ab")], "doc_id long, text string"
    )
    out = attach_ppm(df, "doc_id", "text").collect()
    assert [r.media_id for r in out] == [1]
    m = parse_ppm(bytes(out[0].content))
    assert m["pixels"] == b"hello wor"  # 11 bytes -> 3 pixels
