"""Wave 64: largest-remainder quota split (exact per-stratum counts)
and rendezvous/HRW sharding (minimal movement) — quota exactness,
determinism, and the movement bound."""

from __future__ import annotations

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import (
    quota_split,
    rendezvous_shards,
)


def _ids(spark, n, stratum=None):
    if stratum is None:
        rows = [(i,) for i in range(1, n + 1)]
        return spark.createDataFrame(rows, "doc_id long")
    rows = [(i, stratum(i)) for i in range(1, n + 1)]
    return spark.createDataFrame(rows, "doc_id long, src string")


def test_quota_exact_counts_per_stratum(spark):
    """47 rows in one stratum at 80/10/10: largest remainder gives
    train=38, val=5, test=4 (bases 37/4/4, remainders 600/700/700 ->
    leftover 2 goes to val and test... check: ranked desc with
    declaration-order tiebreak: val(700) first, test(700) second,
    train(600) third -> extras to val, test)."""
    df = _ids(spark, 47, stratum=lambda i: "s")
    out = quota_split(df, "doc_id", "src").groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in out}
    assert counts == {"train": 37, "val": 5, "test": 5}
    assert sum(counts.values()) == 47


def test_quota_tiny_stratum_keeps_every_split_reachable(spark):
    """10 rows: exactly 8/1/1 — the case md5-proportional splitting can
    easily miss."""
    df = _ids(spark, 10, stratum=lambda i: "s")
    counts = {
        r.split: r["count"]
        for r in quota_split(df, "doc_id", "src").groupBy("split").count().collect()
    }
    assert counts == {"train": 8, "val": 1, "test": 1}


def test_quota_multi_strata_independent(spark):
    df = _ids(spark, 100, stratum=lambda i: f"s{i % 2}")
    out = quota_split(df, "doc_id", "src")
    counts = {
        (r.src, r.split): r["count"]
        for r in out.groupBy("src", "split").count().collect()
    }
    for s in ("s0", "s1"):
        assert counts[(s, "train")] == 40
        assert counts[(s, "val")] == 5
        assert counts[(s, "test")] == 5


def test_quota_deterministic_and_partition_independent(spark):
    df = _ids(spark, 53, stratum=lambda i: f"s{i % 3}")
    a = {r.doc_id: r.split for r in quota_split(df, "doc_id", "src").collect()}
    b = {
        r.doc_id: r.split
        for r in quota_split(df.repartition(16), "doc_id", "src").collect()
    }
    assert a == b


def test_quota_rejects_nonquantizing_weights(spark):
    df = _ids(spark, 5, stratum=lambda i: "s")
    with pytest.raises(ValueError):
        quota_split(df, "doc_id", "src", weights={"a": 0.5, "b": 0.3})


def test_rendezvous_deterministic_and_covers_shards(spark):
    df = _ids(spark, 2000)
    out = rendezvous_shards(df, "doc_id", n_shards=8)
    a = {r.doc_id: r.shard for r in out.collect()}
    b = {r.doc_id: r.shard for r in rendezvous_shards(df.repartition(8), "doc_id", 8).collect()}
    assert a == b
    shards = set(a.values())
    assert shards == set(range(8))
    # roughly balanced: no shard under half or over double the mean
    from collections import Counter

    c = Counter(a.values())
    mean = 2000 / 8
    assert all(mean / 2 < v < mean * 2 for v in c.values())


def test_rendezvous_minimal_movement_on_shard_add(spark):
    """Going 8 -> 9 shards re-homes ONLY keys won by the new shard:
    every moved key must now live on shard 8, and the moved fraction is
    ~1/9."""
    df = _ids(spark, 3000)
    before = {r.doc_id: r.shard for r in rendezvous_shards(df, "doc_id", 8).collect()}
    after = {r.doc_id: r.shard for r in rendezvous_shards(df, "doc_id", 9).collect()}
    moved = {k for k in before if before[k] != after[k]}
    assert all(after[k] == 8 for k in moved)
    frac = len(moved) / 3000
    assert 0.05 < frac < 0.18  # ~1/9 = 0.111
