"""Streaming MinHash-LSH near-dup ingest gate (r8 verdict task 5).

Pins three contracts:

1. the batch gate's survivor semantics (``dedup.neardup_against_store``):
   survivors are pairwise band-disjoint, every near-dup family's smallest
   id survives, store band matches reject — all verified against a
   brute-force recomputation from the band table itself;
2. batch/stream parity: driving N micro-batches through
   ``stream_neardup_ingest`` yields EXACTLY the corpus + band store a
   sequential batch fold of ``neardup_against_store`` produces over the
   same segmentation;
3. replay safety: re-running the stream with the same checkpoint adds
   nothing (the crash-window double-kill schedule lives in
   ``test_stream_crash_replay.py`` with the other 8 stores).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import (
    doc_band_table,
    neardup_against_store,
)
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.neardup_stream import (
    stream_neardup_ingest,
)
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
    live_state,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BASE = "the quick brown fox jumps over the lazy dog near the old river bank"
VAR1 = BASE.replace("river", "creek")  # near-dup of BASE (1 word)
VAR2 = BASE.replace("dog near the old", "cat close to an aged")  # farther
OTHER = "completely different content about spark adaptive query execution"
OTHER2 = "partition pruning and predicate pushdown keep the scan narrow"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _bands_of(spark, rows):
    """Brute-force reference: {doc_id: set of (band_idx, band_key)}."""
    out = defaultdict(set)
    for r in doc_band_table(_df(spark, rows), "doc_id", "text").collect():
        out[r.doc_id].add((r.band_idx, r.band_key))
    return dict(out)


def _expected_survivors(bands, store_bands):
    """Reference survivor rule: reject on any store band hit; reject
    unless minimum id in every in-batch band bucket."""
    bucket_min = {}
    for doc, bs in bands.items():
        for b in bs:
            bucket_min[b] = min(doc, bucket_min.get(b, doc))
    survivors = set()
    for doc, bs in bands.items():
        if any(b in store_bands for b in bs):
            continue
        if all(bucket_min[b] == doc for b in bs):
            survivors.add(doc)
    return survivors


def test_gate_semantics_against_bruteforce(spark):
    rows = [
        (1, BASE),
        (2, VAR1),      # near-dups BASE -> beaten by id 1 if bands collide
        (3, OTHER),
        (4, BASE),      # exact dup -> always beaten by id 1
        (5, OTHER2),
    ]
    bands = _bands_of(spark, rows)
    # store holds VAR2's bands: docs banding with VAR2 get store-rejected
    store_rows = [(99, VAR2)]
    store_bands = set().union(*_bands_of(spark, store_rows).values())
    store_df = spark.createDataFrame(
        [(99, b[0], b[1]) for b in store_bands],
        "doc_id long, band_idx int, band_key string",
    )
    kept = neardup_against_store(_df(spark, rows), store_df)
    got = {r.doc_id for r in kept.select("doc_id").distinct().collect()}
    assert got == _expected_survivors(bands, store_bands)
    # exact dup (4) must never survive; unrelated docs must always survive
    assert 4 not in got
    assert {3, 5} <= got
    # survivors are pairwise band-disjoint
    surv_bands = [bands[d] for d in got]
    for i in range(len(surv_bands)):
        for j in range(i + 1, len(surv_bands)):
            assert not (surv_bands[i] & surv_bands[j])


def test_gate_smallest_id_of_family_survives(spark):
    rows = [(10, BASE), (11, BASE), (12, BASE), (20, OTHER)]
    empty_store = spark.createDataFrame(
        [], "doc_id long, band_idx int, band_key string"
    )
    kept = neardup_against_store(_df(spark, rows), empty_store)
    got = {r.doc_id for r in kept.select("doc_id").distinct().collect()}
    assert got == {10, 20}


def _write_batch(src, b, rows):
    with open(os.path.join(src, f"b{b}.json"), "w") as fh:
        for doc_id, text in rows:
            fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


BATCHES = [
    [(1, BASE), (2, VAR1), (3, OTHER)],
    [(11, BASE), (12, OTHER2), (13, VAR2)],   # 11 re-sends BASE content
    [],                                        # empty batch
    [(21, OTHER2), (22, "fresh unique text nine"), (23, VAR1)],
]


def _batch_fold(spark):
    """Sequential reference fold of the batch operator over BATCHES."""
    store_rows: list[tuple] = []
    corpus_ids: list[int] = []
    for rows in BATCHES:
        if not rows:
            continue
        store_df = spark.createDataFrame(
            store_rows or [], "doc_id long, band_idx int, band_key string"
        )
        kept = neardup_against_store(_df(spark, rows), store_df)
        krows = kept.collect()
        corpus_ids += sorted({r.doc_id for r in krows})
        store_rows += [(r.doc_id, r.band_idx, r.band_key) for r in krows]
    return sorted(corpus_ids), sorted((r[0], r[1], r[2]) for r in store_rows)


def _drive_stream(spark, tmp_path, tag, batches):
    src = str(tmp_path / f"src_{tag}")
    store = str(tmp_path / f"store_{tag}")
    corpus = str(tmp_path / f"corpus_{tag}")
    ck = str(tmp_path / f"ck_{tag}")
    os.makedirs(src)
    for b, rows in enumerate(batches):
        _write_batch(src, b, rows)
        q = stream_neardup_ingest(
            spark, src, SCHEMA, store, corpus, ck, compact_threshold=2
        )
        q.awaitTermination()
    return store, corpus, src, ck


def _read_sink(spark, path, cols):
    return sorted(
        tuple(r[c] for c in cols)
        for r in live_state(spark, path).select(*cols).collect()
    )


def test_batch_stream_parity(spark, tmp_path):
    store, corpus, _src, _ck = _drive_stream(spark, tmp_path, "parity", BATCHES)
    got_corpus = [t[0] for t in _read_sink(spark, corpus, ["doc_id"])]
    got_store = _read_sink(spark, store, ["doc_id", "band_idx", "band_key"])
    exp_corpus, exp_store = _batch_fold(spark)
    assert got_corpus == exp_corpus
    assert got_store == exp_store
    # the exact re-send (11: BASE) must have been rejected
    assert 11 not in got_corpus
    assert 1 in got_corpus


def test_restart_same_checkpoint_adds_nothing(spark, tmp_path):
    store, corpus, src, ck = _drive_stream(spark, tmp_path, "restart", BATCHES)
    before_c = _read_sink(spark, corpus, ["doc_id"])
    before_s = _read_sink(spark, store, ["doc_id", "band_idx", "band_key"])
    q = stream_neardup_ingest(
        spark, src, SCHEMA, store, corpus, ck, compact_threshold=2
    )
    q.awaitTermination()
    assert _read_sink(spark, corpus, ["doc_id"]) == before_c
    assert _read_sink(spark, store, ["doc_id", "band_idx", "band_key"]) == before_s


def test_store_grows_only_by_survivor_bands(spark, tmp_path):
    store, corpus, _src, _ck = _drive_stream(spark, tmp_path, "growth", BATCHES)
    srows = live_state(spark, store)
    crows = live_state(spark, corpus)
    # one band-table row set per surviving doc, nothing else
    assert (
        srows.select("doc_id").distinct().count()
        == crows.select("doc_id").distinct().count()
    )
    n_bands = 8 // 2
    per_doc = (
        srows.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert all(r.n <= n_bands for r in per_doc)  # distinct band keys per doc


def test_broadcast_probe_parity_with_default_path(spark):
    """The inverted (broadcast-batch, stream-store) probe must keep the
    survivor set bit-identical to the direct semi-join path — only the
    physical strategy differs (r10 verdict task 6)."""
    rows = [(1, BASE), (2, VAR1), (10, OTHER), (11, OTHER2), (12, VAR2)]
    store = doc_band_table(
        _df(spark, [(100, OTHER), (101, VAR2)]), "doc_id", "text"
    ).select("doc_id", "band_idx", "band_key")
    a = sorted(
        tuple(r)
        for r in neardup_against_store(_df(spark, rows), store).collect()
    )
    b = sorted(
        tuple(r)
        for r in neardup_against_store(
            _df(spark, rows), store, broadcast_incoming=True
        ).collect()
    )
    assert a == b
    assert a  # non-degenerate: at least one survivor


def test_broadcast_probe_never_shuffles_the_store(spark, tmp_path):
    """The 100 TB contract of the ingest gate: store-CARDINALITY rows
    must never enter an Exchange — between the store's scan and the
    first row-reducer (the partial-agg distinct over matched ids, which
    is batch-bounded by map-side combine) there must be no shuffle. The
    direct semi-join shape re-shuffles the raw store every micro-batch
    at corpus scale (only its BUILD side — the store — is
    broadcastable), which is exactly what the inverted probe removes."""
    from hmpps_digital_prison_reporting_glue_poc_spark.plans.fingerprint import (
        _REDUCER_NODES,
        _walk,
    )

    store_dir = str(tmp_path / "band_store")
    doc_band_table(
        _df(spark, [(100, OTHER), (101, VAR2)]), "doc_id", "text"
    ).select("doc_id", "band_idx", "band_key").write.parquet(store_dir)
    store = spark.read.parquet(store_dir)
    rows = [(1, BASE), (2, VAR1), (10, OTHER)]

    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        kept = neardup_against_store(
            _df(spark, rows), store, broadcast_incoming=True
        )
        root = kept._jdf.queryExecution().executedPlan()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)

    def is_store_scan(jnode) -> bool:
        # toString TRUNCATES long locations (pytest tmp paths) — read the
        # untruncated root paths off the relation instead
        if jnode.getClass().getSimpleName() != "FileSourceScanExec":
            return False
        try:
            paths = jnode.relation().location().rootPaths().mkString(",")
        except Exception:
            return False
        return "band_store" in paths

    def store_rows_unreduced(jnode) -> bool:
        """Store scan reachable without crossing a row-reducer — i.e.
        this subtree's output is store-cardinality."""
        name = jnode.getClass().getSimpleName()
        if name in _REDUCER_NODES or name == "BroadcastExchangeExec":
            return False
        if is_store_scan(jnode):
            return True
        ch = jnode.children()
        return any(
            store_rows_unreduced(ch.apply(i)) for i in range(ch.size())
        )

    assert any(
        is_store_scan(n) for n in _walk(root)
    ), "fixture must actually scan the store"
    for node in _walk(root):
        if node.getClass().getSimpleName() == "ShuffleExchangeExec":
            assert not store_rows_unreduced(node.child()), (
                "store-cardinality rows enter a ShuffleExchange: the "
                "probe join re-shuffles the band store per micro-batch"
            )
