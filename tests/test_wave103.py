"""Wave 103: McNemar paired test + Cochran's Q — hand-computed goldens
through the queries() registry."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _write_events(spark, tmp_path, user_types):
    ts = datetime.datetime
    rows = [
        (i, ts(2025, 1, 1 + i % 20, 8), u, t, 1.0, "{}")
        for i, (u, t) in enumerate(user_types)
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_mcnemar_golden(spark, tmp_path):
    # u1 both; u2,u3,u6 click only; u4 purchase only; u5 neither (view)
    # b=3, c=1 -> continuity-corrected (|3-1|-1)^2 / 4 = 0.25
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "click"), (1, "purchase"),
            (2, "click"), (3, "click"), (6, "click"),
            (4, "purchase"),
            (5, "view"),
        ],
    )
    r = entry_mod.queries()["mcnemar_click_purchase"](
        spark, sf
    ).collect()[0]
    assert (r.n_pairs, r.n_both, r.n_only_x, r.n_only_y, r.n_neither) == (
        6, 1, 3, 1, 1,
    )
    assert r.mcnemar_chi2 == pytest.approx(0.25)


def test_mcnemar_no_discordant_pairs(spark, tmp_path):
    # everyone does both -> b+c = 0 -> NULL statistic
    sf = _write_events(
        spark, tmp_path, [(1, "click"), (1, "purchase"), (2, "click"), (2, "purchase")]
    )
    r = entry_mod.queries()["mcnemar_click_purchase"](
        spark, sf
    ).collect()[0]
    assert (r.n_both, r.n_only_x, r.n_only_y) == (2, 0, 0)
    assert r.mcnemar_chi2 is None


def test_cochran_q_golden(spark, tmp_path):
    # flags per user (view, click, purchase):
    # u1 (1,1,1)  u2 (1,0,0)  u3 (1,1,0)  u4 (0,0,1)
    # C = (3,2,2), T = 7, sum R^2 = 15
    # Q = 2*(3*17 - 49)/(21 - 15) = 4/6
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "view"), (1, "click"), (1, "purchase"),
            (2, "view"),
            (3, "view"), (3, "click"),
            (4, "purchase"),
        ],
    )
    r = entry_mod.queries()["cochran_q_events"](spark, sf).collect()[0]
    assert (r.n_users, r.k, r.t_total, r.df) == (4, 3, 7, 2)
    assert r.q_stat == pytest.approx(4 / 6, abs=1e-9)


def test_cochran_q_uniform_users_null(spark, tmp_path):
    # every user does all three -> k*T = sum R^2 -> denominator 0 -> NULL
    sf = _write_events(
        spark,
        tmp_path,
        [(u, t) for u in (1, 2) for t in ("view", "click", "purchase")],
    )
    r = entry_mod.queries()["cochran_q_events"](spark, sf).collect()[0]
    assert (r.n_users, r.t_total) == (2, 6)
    assert r.q_stat is None
