"""Wave-22 operators: user-relative z-scores, k-anonymity audit,
contamination report rollup."""

from __future__ import annotations

import math

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    user_value_zscores,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    k_anonymity_audit,
)


def test_user_zscores_match_closed_form(spark):
    rows = [
        (1, 10, 1.00),
        (2, 10, 2.00),
        (3, 10, 3.00),
        (4, 20, 5.00),  # single event -> NULL z
        (5, 30, 7.00),
        (6, 30, 7.00),  # zero variance -> NULL z
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    got = {r.event_id: r for r in user_value_zscores(df).collect()}
    # user 10: cents 100,200,300; n=3 s=600 ss=140000
    # z_1 = (3*100-600)/sqrt(3*140000-360000) = -300/sqrt(60000)
    for eid, qv in ((1, 100), (2, 200), (3, 300)):
        expect = (3 * qv - 600) / math.sqrt(3 * 140000 - 600 * 600)
        assert abs(got[eid].zscore - expect) < 1e-15
    assert got[4].zscore is None
    assert got[5].zscore is None and got[6].zscore is None
    assert got[2].zscore == 0.0  # exactly the mean
    assert got[1].value_q == 1.0 and got[1].n_user_events == 3


def test_k_anonymity_flags_small_groups(spark):
    rows = [("a", 0)] * 6 + [("a", 50)] * 2 + [("b", 0)] * 5
    df = spark.createDataFrame(rows, "event_type string, value_band long")
    got = {
        (r.event_type, r.value_band): (r.n_rows, r.risky)
        for r in k_anonymity_audit(df, ["event_type", "value_band"], k=5).collect()
    }
    assert got[("a", 0)] == (6, False)
    assert got[("a", 50)] == (2, True)
    assert got[("b", 0)] == (5, False)  # exactly k is safe


def test_overlap_report_argmax_is_deterministic(spark):
    import __spark_entry__ as m

    out = m.queries()["train_eval_overlap_report"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out  # the synthetic corpus has 5-gram overlaps
    for r in out:
        assert r.max_shared <= r.total_shared
        assert r.n_train_docs >= 1
        assert r.eval_id % 10 == 0 and r.worst_train_id % 10 != 0


def test_shard_manifest_invariants(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import (
        training_shard_manifest,
    )

    rows = [(i, f"tok{i} tok{i+1} x") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        training_shard_manifest(df, shard_docs=256).collect(),
        key=lambda r: r.shard_id,
    )
    assert [r.n_docs for r in out] == [256, 256, 256, 232]
    assert out[0].rank_from == 1 and out[-1].rank_to == 1000
    # contiguous, non-overlapping rank ranges
    for a, b in zip(out, out[1:]):
        assert b.rank_from == a.rank_to + 1
    # checksum is partition-layout independent (content-stable export)
    again = {
        r.shard_id: r.shard_md5
        for r in training_shard_manifest(
            df.repartition(13), shard_docs=256
        ).collect()
    }
    assert {r.shard_id: r.shard_md5 for r in out} == again


def test_partial_moments_merge_is_exact(spark):
    """Merging per-batch moment partials (any grouping of batches) is
    bit-identical to one-pass aggregation — the incremental contract."""
    import random

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.incremental import (
        finalize_moments,
        merge_partial_moments,
        partial_moments,
    )

    random.seed(7)
    rows = [
        (i, i % 5, round(random.uniform(0, 300), 2)) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    full = partial_moments(df, ["user_id"], "value")

    b1 = df.filter("event_id % 3 = 0")
    b2 = df.filter("event_id % 3 = 1")
    b3 = df.filter("event_id % 3 = 2")
    merged = merge_partial_moments(
        merge_partial_moments(
            partial_moments(b1, ["user_id"], "value"),
            partial_moments(b2, ["user_id"], "value"),
            ["user_id"],
        ),
        partial_moments(b3, ["user_id"], "value"),
        ["user_id"],
    )
    a = {r.user_id: (r.n_m, r.s_m, r.ss_m) for r in full.collect()}
    b = {r.user_id: (r.n_m, r.s_m, r.ss_m) for r in merged.collect()}
    assert a == b  # exact, not approximate

    fin = {r.user_id: r for r in finalize_moments(merged, ["user_id"]).collect()}
    import statistics

    for uid in fin:
        vals = [round(v * 100) / 100 for (_, u, v) in rows if u == uid]
        # population variance on the cent grid
        m = sum(vals) / len(vals)
        var = sum((v - m) ** 2 for v in vals) / len(vals)
        assert abs(fin[uid].mean - m) < 1e-9
        assert abs(fin[uid].variance - var) < 1e-6
