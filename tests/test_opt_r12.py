"""Round-12 optimization pins: exactness guards for operator-internal
changes (the tests/test_opt_r11.py discipline).

- label_propagation gained a convergence early-exit riding each round's
  write as an Observation, plus a shared per-round repartition("v") that
  serves both the vote groupBy and the argmax window. The early-exit is
  exact only because a zero-change round is a fixpoint of the
  deterministic synchronous update; these tests pin BOTH directions:
  a converged graph's output is identical however many extra rounds are
  requested, and an oscillating graph (synchronous LPA's known failure
  mode) still honors the fixed-round contract — the exit must never fire
  on a nonzero-change round.
"""

from __future__ import annotations

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.graph import (
    label_propagation,
)


def _communities(spark, rows, rounds):
    edges = spark.createDataFrame(rows, "a string, b string")
    return {
        (r.community, r.n_members)
        for r in label_propagation(edges, rounds=rounds).collect()
    }


def test_lpa_early_exit_is_exact_fixpoint(spark):
    # Triangle: round 1 (b,a,a), round 2 (a,a,a), round 3 changed=0 ->
    # fixpoint; rounds=4 and rounds=8 must be identical (the exit makes
    # them the SAME computation) and equal to the hand-computed state.
    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    out4 = _communities(spark, tri, rounds=4)
    out8 = _communities(spark, tri, rounds=8)
    assert out4 == out8 == {("a", 3)}


def test_lpa_oscillator_keeps_fixed_round_contract(spark):
    # Path a-b-c oscillates with period 2 under synchronous LPA
    # (hand-unrolled: r1 (b,a,b), r2 (a,b,a), r3 (b,a,b), r4 (a,b,a));
    # every round changes 3 labels, so the early exit must never fire
    # and rounds=3 / rounds=4 must still differ exactly as the unrolled
    # oracle says.
    path = [("a", "b"), ("b", "c")]
    assert _communities(spark, path, rounds=4) == {("a", 2), ("b", 1)}
    assert _communities(spark, path, rounds=3) == {("b", 2), ("a", 1)}


def test_lpa_empty_graph_exits_immediately(spark):
    # Empty edge set: the observed change-sum is NULL on the first empty
    # round and the loop exits instead of writing `rounds` empty tables.
    assert _communities(spark, [], rounds=4) == set()


def test_lpa_self_loops_and_duplicates_still_canonicalized(spark):
    # canonicalization (distinct + self-loop drop) precedes the loop —
    # unchanged by the r12 restructure (r9 advice pin).
    rows = [("a", "b"), ("b", "a"), ("a", "a"), ("a", "b")]
    assert _communities(spark, rows, rounds=2) == {("a", 1), ("b", 1)}
