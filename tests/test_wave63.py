"""Wave 63: Markov stationary distribution — known-chain goldens,
mass conservation, and determinism of the 9dp orbit."""

from __future__ import annotations

import datetime

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    markov_stationary,
)


def _chain_df(spark, sequences):
    """sequences: {user: [types...]} -> events frame."""
    rows = []
    eid = 0
    for user, seq in sequences.items():
        for i, t in enumerate(seq):
            eid += 1
            rows.append(
                (
                    user,
                    eid,
                    t,
                    datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
                )
            )
    return spark.createDataFrame(
        rows, "user_id string, event_id long, event_type string, ts timestamp"
    )


def test_two_state_symmetric_chain_converges_to_half(spark):
    """a<->b alternating: stationary = (0.5, 0.5) exactly (uniform start
    is already stationary)."""
    df = _chain_df(spark, {"u": ["a", "b"] * 20})
    out = {r.event_type: r.stationary_p for r in markov_stationary(df).collect()}
    assert out["a"] == pytest.approx(0.5, abs=1e-9)
    assert out["b"] == pytest.approx(0.5, abs=1e-9)


def test_absorbing_state_takes_all_mass(spark):
    """a -> b always, b -> b always: stationary mass concentrates on b."""
    seqs = {f"u{i}": ["a", "b", "b", "b", "b", "b"] for i in range(5)}
    df = _chain_df(spark, seqs)
    out = {r.event_type: r.stationary_p for r in markov_stationary(df, n_iter=12).collect()}
    assert out["b"] > 0.99
    assert out["a"] < 0.01


def test_biased_two_state_golden(spark):
    """P(a->b)=1, P(b->a)=0.5, P(b->b)=0.5: stationary = (1/3, 2/3)."""
    # craft transitions: from a always to b (6x); from b: 3x to a, 3x to b
    seq = ["a", "b", "b", "a", "b", "a", "b", "b", "a", "b", "a", "b", "b"]
    # count the realized transitions to confirm the intended matrix
    trans = list(zip(seq, seq[1:]))
    from collections import Counter

    c = Counter(trans)
    assert c[("a", "b")] > 0 and c[("b", "a")] > 0 and c[("b", "b")] > 0
    assert c.get(("a", "a"), 0) == 0
    df = _chain_df(spark, {"u": seq})
    out = {r.event_type: r.stationary_p for r in markov_stationary(df, n_iter=30).collect()}
    pa = c[("b", "a")] / (c[("b", "a")] + c[("b", "b")])
    # stationary of (a->b w.p. 1; b->a w.p. pa): pi_a = pa/(1+pa)
    want_a = pa / (1 + pa)
    assert out["a"] == pytest.approx(want_a, abs=1e-6)
    assert out["b"] == pytest.approx(1 - want_a, abs=1e-6)


def test_mass_conserved_without_dangling(spark):
    """Every state has outgoing transitions -> total mass stays ~1
    (up to 9dp rounding dust)."""
    df = _chain_df(spark, {"u": ["a", "b", "c", "a", "c", "b", "a"] * 3})
    out = markov_stationary(df, n_iter=8).collect()
    assert sum(r.stationary_p for r in out) == pytest.approx(1.0, abs=1e-6)


def test_partition_independence_and_determinism(spark):
    seqs = {f"u{i}": ["a", "b", "c", "b", "a", "c"][: 3 + i % 4] for i in range(8)}
    df = _chain_df(spark, seqs)
    a = {r.event_type: r.stationary_p for r in markov_stationary(df).collect()}
    b = {
        r.event_type: r.stationary_p
        for r in markov_stationary(df.repartition(16)).collect()
    }
    assert a == b
