"""Wave 77: deseasonalized robust anomalies — the weekly-cycle blind
spot fixed: cyclic peaks are normal, within-weekday spikes flag."""

from __future__ import annotations

import datetime

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    daily_anomaly_robust_z,
    deseasonalized_anomalies,
)


def _events(spark, day_counts):
    """day_counts: {day_index: n} -> that many purchase events per day."""
    rows = []
    d0 = datetime.datetime(2024, 1, 1)  # a Monday
    for day, n in day_counts.items():
        for i in range(n):
            rows.append(
                ("purchase", d0 + datetime.timedelta(days=day, minutes=i))
            )
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_weekly_cycle_not_anomalous(spark):
    """Saturdays always 3x weekday volume: the plain robust z flags
    them; the deseasonalized one does not."""
    counts = {}
    for day in range(28):
        dow = day % 7
        # deterministic jitter keeps the residual MAD nonzero (a
        # perfectly flat residual series has no scale -> NULL z)
        counts[day] = (30 if dow == 5 else 10) + day % 3
    df = _events(spark, counts)
    plain = {
        str(r.day): r.robust_z
        for r in daily_anomaly_robust_z(df).collect()
    }
    desea = {
        str(r.day): r.robust_z
        for r in deseasonalized_anomalies(df).collect()
    }
    sat = "2024-01-06"  # first Saturday
    assert plain[sat] is not None and plain[sat] > 3  # plain z panics
    # deseasonalized: every Saturday equals the Saturday median -> flat
    # residuals per dow; residual z small or NULL
    assert desea[sat] is None or abs(desea[sat]) < 1


def test_within_weekday_spike_flags(spark):
    """One Saturday doubling the OTHER Saturdays is anomalous even
    though all Saturdays dwarf weekdays."""
    counts = {}
    for day in range(28):
        dow = day % 7
        counts[day] = (30 if dow == 5 else 10) + day % 3
    counts[19] = 60  # the 3rd Saturday (day 19 -> dow 5) spikes
    df = _events(spark, counts)
    out = {str(r.day): r for r in deseasonalized_anomalies(df).collect()}
    spike = out["2024-01-20"]
    assert spike.dow == 5
    assert spike.robust_z is not None and spike.robust_z > 3
    # an ordinary Saturday stays calm
    calm = out["2024-01-06"]
    assert calm.robust_z is None or abs(calm.robust_z) < 1


def test_dow_median_exact(spark):
    counts = {0: 10, 7: 20, 14: 30}  # three Mondays
    df = _events(spark, counts)
    out = {str(r.day): r for r in deseasonalized_anomalies(df).collect()}
    assert out["2024-01-01"].dow_median == pytest.approx(20.0)
    assert out["2024-01-01"].residual == pytest.approx(-10.0)
