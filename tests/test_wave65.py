"""Wave 65: bucketed interval-overlap join — differential vs the plain
theta join, boundary semantics, multi-bucket dedup."""

from __future__ import annotations

import itertools

from hmpps_digital_prison_reporting_glue_poc_spark.operators.joins import (
    interval_overlap_join,
)

H = 3_600_000_000  # one hour in micros


def _iv(spark, rows, name="id"):
    return spark.createDataFrame(
        rows, f"{name} long, start_us long, end_us long"
    )


def _brute(lrows, rrows):
    out = set()
    for (li, ls, le), (ri, rs, re) in itertools.product(lrows, rrows):
        if ls <= re and rs <= le:
            out.add((li, ri))
    return out


def test_overlap_matches_theta_join(spark):
    lrows = [
        (1, 0, H // 2),
        (2, H, 3 * H),
        (3, 5 * H, 5 * H + 1),
        (4, 10 * H, 20 * H),
    ]
    rrows = [
        (10, H // 4, H),
        (11, 2 * H, 6 * H),
        (12, 19 * H, 25 * H),
        (13, 30 * H, 31 * H),
    ]
    got = {
        (r.id, r.id_r)
        for r in interval_overlap_join(
            _iv(spark, lrows), _iv(spark, rrows)
        ).collect()
    }
    assert got == _brute(lrows, rrows)


def test_touching_endpoints_match_inclusively(spark):
    l = _iv(spark, [(1, 0, H)])
    r = _iv(spark, [(2, H, 2 * H)])  # starts exactly where l ends
    got = interval_overlap_join(l, r).collect()
    assert len(got) == 1


def test_multibucket_overlap_emits_once(spark):
    """Two long intervals sharing many buckets: exactly ONE output row."""
    l = _iv(spark, [(1, 0, 10 * H)])
    r = _iv(spark, [(2, H, 9 * H)])
    got = interval_overlap_join(l, r).collect()
    assert len(got) == 1


def test_bucket_width_does_not_change_results(spark):
    lrows = [(i, i * H // 3, i * H // 3 + H) for i in range(20)]
    rrows = [(100 + i, i * H // 2, i * H // 2 + H // 4) for i in range(20)]
    base = None
    for width in (H // 4, H, 7 * H):
        got = {
            (r.id, r.id_r)
            for r in interval_overlap_join(
                _iv(spark, lrows), _iv(spark, rrows), bucket_us=width
            ).collect()
        }
        if base is None:
            base = got
        assert got == base
    assert base == _brute(lrows, rrows)
