"""Sketch-state compaction (round-6 streaming stress follow-up): delta
partitions fold into coverage-encoded base partitions, readers stay
exact, crash leftovers never double-count, and fresh-checkpoint reruns
sweep bases too."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
    ks_from_state,
    stream_ks_drift,
)
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
    live_state,
)

KS_SCHEMA = T.StructType(
    [
        T.StructField("value", T.DoubleType()),
        T.StructField("is_right", T.BooleanType()),
    ]
)


def _feed(src, name, rows):
    with open(os.path.join(src, name), "w") as fh:
        for v, r in rows:
            fh.write(json.dumps({"value": v, "is_right": r}) + "\n")


def _parts(state):
    return sorted(
        int(p.split("=")[1])
        for p in os.listdir(state)
        if p.startswith("__batch_id=")
    )


def test_ks_compaction_bounds_partitions_and_stays_exact(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)
    all_rows = []
    for b in range(10):
        rows = [(float(b), b % 2 == 0), (b + 0.5, b % 2 == 1)]
        all_rows += rows
        _feed(src, f"b{b}.json", rows)
        q = stream_ks_drift(
            spark, src, KS_SCHEMA, state, ckpt,
            trigger_once=True, compact_threshold=4,
        )
        q.awaitTermination()
    parts = _parts(state)
    # far fewer than 10 partitions; at least one base (negative id)
    assert len(parts) <= 6 and min(parts) < 0
    out = ks_from_state(spark, state).collect()[0]
    n_left = sum(1 for _v, r in all_rows if not r)
    n_right = len(all_rows) - n_left
    assert out.n_left == n_left and out.n_right == n_right


def test_live_state_ignores_covered_crash_leftovers(spark, tmp_path):
    """Simulate a crash after the base rename but before delta cleanup:
    base __batch_id=-3 (covers 0..2) coexists with still-present deltas
    0..2 — readers must count the covered deltas ONCE (via the base)."""
    state = str(tmp_path / "state")
    df = spark.createDataFrame(
        [
            (1, 10, -3),  # base covering 0..2: holds the merged 0..2 total
            (1, 4, 0),    # covered leftovers — must be ignored
            (1, 3, 1),
            (1, 3, 2),
            (1, 7, 3),    # uncovered delta — counts
        ],
        "k int, c long, __batch_id int",
    )
    df.write.partitionBy("__batch_id").parquet(state)
    total = (
        live_state(spark, state)
        .groupBy("k")
        .agg(F.sum("c").alias("c"))
        .collect()[0]
    )
    assert total.c == 17  # 10 (base) + 7 (delta 3), not 27


def test_fresh_checkpoint_rerun_sweeps_bases(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    # run 1 with compaction: 6 batches, threshold 2 -> base exists
    for b in range(6):
        _feed(src, f"b{b}.json", [(float(b), b % 2 == 0)])
        q = stream_ks_drift(
            spark, src, KS_SCHEMA, state, str(tmp_path / "ck1"),
            trigger_once=True, compact_threshold=2,
        )
        q.awaitTermination()
    assert min(_parts(state)) < 0
    # fresh checkpoint: everything repacks into batch 0; old base must go
    q = stream_ks_drift(
        spark, src, KS_SCHEMA, state, str(tmp_path / "ck2"),
        trigger_once=True, compact_threshold=2,
    )
    q.awaitTermination()
    assert _parts(state) == [0]
    out = ks_from_state(spark, state).collect()[0]
    assert out.n_left + out.n_right == 6


def test_cms_compaction_estimate_parity(spark, tmp_path):
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.cms_stream import (
        read_cms_estimate,
        stream_cms_counts,
    )

    schema = T.StructType([T.StructField("text", T.StringType())])
    src_a = str(tmp_path / "srca")
    src_b = str(tmp_path / "srcb")
    os.makedirs(src_a)
    os.makedirs(src_b)
    batches = [f"alpha beta w{b} alpha" for b in range(8)]
    for b, text in enumerate(batches):
        with open(os.path.join(src_a, f"b{b}.json"), "w") as fh:
            fh.write(json.dumps({"text": text}) + "\n")
        with open(os.path.join(src_b, f"b{b}.json"), "w") as fh:
            fh.write(json.dumps({"text": text}) + "\n")
        # compacting stream (threshold 3)
        q = stream_cms_counts(
            spark, src_a, schema, str(tmp_path / "cells_a"),
            str(tmp_path / "cka"), trigger_once=True, compact_threshold=3,
        )
        q.awaitTermination()
        # non-compacting control (threshold high)
        q = stream_cms_counts(
            spark, src_b, schema, str(tmp_path / "cells_b"),
            str(tmp_path / "ckb"), trigger_once=True, compact_threshold=999,
        )
        q.awaitTermination()
    probe = spark.createDataFrame([("alpha",), ("beta",), ("w3",)], "token string")
    est_a = {
        r.token: r.cms_estimate
        for r in read_cms_estimate(
            spark, str(tmp_path / "cells_a"), probe
        ).collect()
    }
    est_b = {
        r.token: r.cms_estimate
        for r in read_cms_estimate(
            spark, str(tmp_path / "cells_b"), probe
        ).collect()
    }
    assert est_a == est_b
    assert est_a["alpha"] == 16  # 2 per batch x 8 batches
    assert min(_parts(str(tmp_path / "cells_a"))) < 0


def test_hll_register_store_bounded_at_two_partitions(spark, tmp_path):
    """HLL partitions are full merges — after each batch all but the
    newest two are pruned, and the estimate equals the batch operator's
    over the union."""
    import json as _json

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.hll_stream import (
        read_hll_estimate,
        stream_hll_distinct,
    )

    schema = T.StructType([T.StructField("user_id", T.LongType())])
    src = str(tmp_path / "src")
    regs = str(tmp_path / "regs")
    os.makedirs(src)
    for b in range(6):
        with open(os.path.join(src, f"b{b}.json"), "w") as fh:
            for u in range(b * 50, (b + 1) * 50):
                fh.write(_json.dumps({"user_id": u}) + "\n")
        q = stream_hll_distinct(
            spark, src, schema, regs, str(tmp_path / "ck"),
            trigger_once=True,
        )
        q.awaitTermination()
    assert len(_parts(regs)) <= 2
    est = read_hll_estimate(spark, regs).collect()[0].hll_estimate
    assert 250 <= est <= 350  # ~300 distinct, HLL tolerance


def test_ingest_dedup_store_compacts_and_stays_exact(spark, tmp_path):
    import json as _json

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.dedup_stream import (
        stream_ingest_dedup,
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    corpus = str(tmp_path / "corpus")
    os.makedirs(src)
    # 6 batches; batch b re-sends one doc from every earlier batch (must
    # be dropped by the store even after its delta was compacted away)
    for b in range(6):
        rows = [(b * 100 + i, f"doc {b} {i}") for i in range(5)]
        rows += [(900 + b, f"doc {e} 0") for e in range(b)]  # dup content
        with open(os.path.join(src, f"b{b}.json"), "w") as fh:
            for did, text in rows:
                fh.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        q = stream_ingest_dedup(
            spark, src, schema, store, corpus, str(tmp_path / "ck"),
            trigger_once=True,
        )
        q.awaitTermination()
    # compaction with default threshold 64 shouldn't have fired at 6
    # batches; force the geometry instead by checking correctness + that
    # live_state sees exactly the accepted fingerprints
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        compact_state,
        live_state,
    )

    n_store_before = live_state(spark, store).count()
    assert n_store_before == 30  # 5 originals per batch, dups rejected
    ran = compact_state(
        spark, store, batch_id=6, key_cols=["doc_id", "fingerprint"],
        aggs=[], threshold=3,
    )
    assert ran
    assert len([p for p in _parts(store) if p >= 0]) == 0
    assert min(_parts(store)) < 0
    assert live_state(spark, store).count() == 30
