"""Crash-replay contract for EVERY storage-backed stream store (r7
verdict task 4).

Both round-7 ADVICE bugs (hll register gap-deletion, the empty-batch-0
sweep skip) were crash-WINDOW state bugs: the process dies after the
batch's state write but before the checkpoint commit, and the replay
either loses accumulated state or double-counts the batch. They were
found by inspection; this suite makes the property a contract.

One parametrized scenario runs every family — ks / cms / hll / quantile /
anomaly / ingest-dedup / gram — through the same hostile schedule:

  batch 0: normal      batch 1: CRASH after state write, then replay
  batch 2: EMPTY file  batch 3: CRASH after state write, then replay

The kill is injected through the stream's ``on_batch`` hook, which every
store-backed stream fires AFTER its state write (and compaction) and
BEFORE ``foreachBatch`` returns — exactly the at-least-once window.
Compaction thresholds are forced low (2) so the crash also lands after a
live base-fold where supported. Batch 3 crashes right after the
empty-batch gap — the id-arithmetic shape that caused the hll bug.

Pass condition: the crash run's final read-back state is IDENTICAL to a
control run that saw the same files, same batch segmentation, and no
crashes — no loss, no double-count.
"""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import types as T


class CrashInjected(Exception):
    pass


def _crash_at(batch: int):
    def hook(batch_id: int) -> None:
        if batch_id == batch:
            raise CrashInjected(f"injected kill after batch {batch_id} state write")

    return hook


def _write_file(src: str, b: int, rows: list[dict]) -> None:
    with open(os.path.join(src, f"b{b}.json"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


_TS0 = datetime.datetime(2024, 1, 1, 9)


class _Family:
    """One store-backed stream family: how to start it, what to feed it,
    how to read the state back for comparison."""

    name: str = ""

    def rows(self, b: int) -> list[dict]:
        raise NotImplementedError

    def start(self, spark, src: str, state: str, ck: str, on_batch):
        raise NotImplementedError

    def read(self, spark, state: str) -> list[str]:
        raise NotImplementedError


class _KS(_Family):
    name = "ks"
    schema = T.StructType(
        [
            T.StructField("is_right", T.BooleanType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def rows(self, b):
        if b == 2:
            return []
        return [
            {"is_right": i % 2 == 1, "value": (b * 17 + i) * 0.5}
            for i in range(24)
        ]

    def start(self, spark, src, state, ck, on_batch):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import stream_ks_drift

        return stream_ks_drift(
            spark, src, self.schema, state, ck,
            on_batch=on_batch, compact_threshold=2,
        )

    def read(self, spark, state):
        # all four drift functionals read the same store (r10): the
        # crash/fuzz comparison covers every one of them
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
            cvm_from_state,
            energy_from_state,
            ks_from_state,
            w1_from_state,
        )

        out = []
        for fn in (ks_from_state, w1_from_state, cvm_from_state, energy_from_state):
            out.extend(sorted(map(repr, fn(spark, state).collect())))
        return out


class _CMS(_Family):
    name = "cms"
    schema = T.StructType([T.StructField("text", T.StringType())])

    def rows(self, b):
        if b == 2:
            return []
        return [
            {"text": f"alpha beta w{b} alpha tok{i % 5}"} for i in range(12)
        ]

    def start(self, spark, src, state, ck, on_batch):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.cms_stream import stream_cms_counts

        return stream_cms_counts(
            spark, src, self.schema, state, ck,
            on_batch=on_batch, compact_threshold=2,
        )

    def read(self, spark, state):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.cms_stream import read_cms_estimate

        probe = spark.createDataFrame(
            [("alpha",), ("beta",), ("w0",), ("w1",), ("w3",), ("tok2",)],
            "token string",
        )
        return sorted(map(repr, read_cms_estimate(spark, state, probe).collect()))


class _HLL(_Family):
    name = "hll"
    schema = T.StructType([T.StructField("user_id", T.LongType())])

    def rows(self, b):
        if b == 2:
            return []
        # overlap across batches exercises the max-merge
        return [{"user_id": b * 40 + i} for i in range(60)]

    def start(self, spark, src, state, ck, on_batch):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.hll_stream import stream_hll_distinct

        return stream_hll_distinct(
            spark, src, self.schema, state, ck, on_batch=on_batch
        )

    def read(self, spark, state):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.hll_stream import read_hll_estimate

        return sorted(map(repr, read_hll_estimate(spark, state).collect()))


class _Quantile(_Family):
    name = "quantile"
    schema = T.StructType([T.StructField("value", T.DoubleType())])

    def rows(self, b):
        if b == 2:
            return []
        return [{"value": float((b * 31 + i * 7) % 100)} for i in range(25)]

    def start(self, spark, src, state, ck, on_batch):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.quantile_stream import (
            stream_quantile_counts,
        )

        return stream_quantile_counts(
            spark, src, self.schema, state, ck,
            on_batch=on_batch, compact_threshold=2,
        )

    def read(self, spark, state):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.quantile_stream import (
            quantiles_from_state,
        )

        return sorted(
            map(repr, quantiles_from_state(spark, state, [0.25, 0.5, 0.9]).collect())
        )


class _Anomaly(_Family):
    name = "anomaly"
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )

    def rows(self, b):
        if b == 2:
            return []
        out = []
        for i in range(18):
            day = (b * 3 + i) % 7
            typ = "purchase" if i % 3 else "view"
            out.append(
                {
                    "event_id": b * 100 + i,
                    "ts": (_TS0 + datetime.timedelta(days=day)).isoformat(),
                    "event_type": typ,
                }
            )
        return out

    def start(self, spark, src, state, ck, on_batch):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.anomaly_stream import (
            stream_daily_anomaly,
        )

        return stream_daily_anomaly(
            spark, src, self.schema, state, ck,
            on_batch=on_batch, compact_threshold=2,
        )

    def read(self, spark, state):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.anomaly_stream import (
            anomaly_from_state,
        )

        return sorted(map(repr, anomaly_from_state(spark, state).collect()))


class _IngestDedup(_Family):
    name = "ingest_dedup"
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def rows(self, b):
        if b == 2:
            return []
        fresh = [
            {"doc_id": b * 100 + i, "text": f"document body {b}-{i}"}
            for i in range(5)
        ]
        # re-sends of earlier batches' docs — must stay rejected on replay
        resend = (
            [{"doc_id": 900 + b, "text": "document body 0-0"}] if b > 0 else []
        )
        return fresh + resend

    def start(self, spark, src, state, ck, on_batch):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.dedup_stream import (
            stream_ingest_dedup,
        )

        return stream_ingest_dedup(
            spark, src, self.schema,
            os.path.join(state, "store"), os.path.join(state, "corpus"), ck,
            on_batch=on_batch, compact_threshold=2,
        )

    def read(self, spark, state):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import live_state

        corpus = sorted(
            r.doc_id
            for r in live_state(
                spark, os.path.join(state, "corpus"),
                schema="doc_id long, text string, __batch_id long",
            )
            .select("doc_id")
            .collect()
        )
        store = sorted(
            (r.doc_id, r.fingerprint)
            for r in live_state(
                spark, os.path.join(state, "store"),
                schema="doc_id long, fingerprint string, __batch_id long",
            )
            .select("doc_id", "fingerprint")
            .collect()
        )
        return [repr(corpus), repr(store)]


class _Gram(_Family):
    name = "gram"
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def rows(self, b):
        if b == 2:
            return []
        return [
            {
                "vec_id": b * 10 + i,
                "embedding": [((b + 1) * (i + j + 1)) % 7 * 0.25 for j in range(4)],
            }
            for i in range(8)
        ]

    def start(self, spark, src, state, ck, on_batch):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.gram_stream import (
            stream_gram_accumulate,
        )

        return stream_gram_accumulate(
            spark, src, self.schema, state, ck, dim=4,
            on_batch=on_batch, compact_threshold=2,
        )

    def read(self, spark, state):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.gram_stream import read_stream_gram

        return sorted(map(repr, read_stream_gram(spark, state).collect()))


class _Trend(_Family):
    name = "trend"
    schema = T.StructType(
        [
            T.StructField("score", T.LongType()),
            T.StructField("label", T.BooleanType()),
        ]
    )

    def rows(self, b):
        if b == 2:
            return []
        return [
            {"score": (b + i) % 5, "label": (i % ((b + i) % 5 + 2)) == 0}
            for i in range(20)
        ]

    def start(self, spark, src, state, ck, on_batch):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.trend_stream import (
            stream_trend_drift,
        )

        return stream_trend_drift(
            spark, src, self.schema, state, ck,
            on_batch=on_batch, compact_threshold=2,
        )

    def read(self, spark, state):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.trend_stream import (
            trend_from_state,
        )

        return sorted(map(repr, trend_from_state(spark, state).collect()))


class _NearDup(_Family):
    name = "neardup"
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )

    _BASE = "the quick brown fox jumps over the lazy dog by the river bank"

    def rows(self, b):
        if b == 2:
            return []
        fresh = [
            {
                "doc_id": b * 100 + i,
                "text": f"unique body {b}-{i} " + " ".join(
                    f"tok{b}x{i}y{j}" for j in range(6)
                ),
            }
            for i in range(4)
        ]
        # near/exact re-sends of the batch-0 base doc — must stay rejected
        # on every delivery and every replay
        base = [{"doc_id": b * 100 + 50, "text": self._BASE}]
        return fresh + base

    def start(self, spark, src, state, ck, on_batch):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.neardup_stream import (
            stream_neardup_ingest,
        )

        return stream_neardup_ingest(
            spark, src, self.schema,
            os.path.join(state, "store"), os.path.join(state, "corpus"), ck,
            on_batch=on_batch, compact_threshold=2,
        )

    def read(self, spark, state):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import live_state

        corpus = sorted(
            r.doc_id
            for r in live_state(
                spark, os.path.join(state, "corpus"),
                schema="doc_id long, text string, __batch_id long",
            )
            .select("doc_id")
            .collect()
        )
        store = sorted(
            (r.doc_id, r.band_idx, r.band_key)
            for r in live_state(
                spark, os.path.join(state, "store"),
                schema="doc_id long, band_idx int, band_key string,"
                " __batch_id long",
            )
            .select("doc_id", "band_idx", "band_key")
            .collect()
        )
        return [repr(corpus), repr(store)]


class _PageHinkley(_Family):
    name = "pagehinkley"
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def rows(self, b):
        if b == 2:
            return []
        return [
            {
                "ts": f"2025-03-{(b * 2 + i) % 9 + 1:02d}T09:0{i % 6}:00",
                "event_type": "purchase" if i % 3 != 2 else "view",
                "value": 1.0 + b * 0.5 + (i % 4) * 0.25,
            }
            for i in range(10)
        ]

    def start(self, spark, src, state, ck, on_batch):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.pagehinkley_stream import (
            stream_page_hinkley,
        )

        return stream_page_hinkley(
            spark, src, self.schema, state, ck,
            on_batch=on_batch, compact_threshold=2,
        )

    def read(self, spark, state):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.pagehinkley_stream import (
            ph_from_state,
        )

        return sorted(map(repr, ph_from_state(spark, state).collect()))


FAMILIES = [
    _KS(), _CMS(), _HLL(), _Quantile(), _Anomaly(), _IngestDedup(), _Gram(),
    _Trend(), _NearDup(), _PageHinkley(),
]

N_BATCHES = 4
CRASH_BATCHES = {1, 3}  # 3 crashes right after the empty-batch-2 gap


def _drive(spark, fam: _Family, tmp_path, tag: str, crash: bool) -> list[str]:
    src = str(tmp_path / f"src_{tag}")
    state = str(tmp_path / f"state_{tag}")
    ck = str(tmp_path / f"ck_{tag}")
    os.makedirs(src)
    for b in range(N_BATCHES):
        _write_file(src, b, fam.rows(b))
        if crash and b in CRASH_BATCHES:
            # batch 1 is killed TWICE before it finally commits: every
            # kill lands after the state write and before the checkpoint
            # commit, so the store sees the same batch id three times —
            # the strongest at-least-once schedule the runtime can deal
            n_kills = 2 if b == 1 else 1
            for _ in range(n_kills):
                q = fam.start(spark, src, state, ck, on_batch=_crash_at(b))
                with pytest.raises(Exception) as excinfo:
                    q.awaitTermination()
                assert "injected kill" in str(excinfo.value), (
                    f"{fam.name}: expected the injected crash, got "
                    f"{excinfo.value}"
                )
            # the batch's state is written but its checkpoint commit is
            # not — restart replays the SAME batch id over the same files
        q = fam.start(spark, src, state, ck, on_batch=None)
        q.awaitTermination()
    return fam.read(spark, state)


@pytest.mark.parametrize("fam", FAMILIES, ids=[f.name for f in FAMILIES])
def test_crash_between_state_write_and_commit_is_lossless(spark, fam, tmp_path):
    crashed = _drive(spark, fam, tmp_path, f"{fam.name}_crash", crash=True)
    control = _drive(spark, fam, tmp_path, f"{fam.name}_ctl", crash=False)
    assert crashed == control, (
        f"{fam.name}: state after crash+replay diverged from the no-crash "
        f"control\ncrashed={crashed}\ncontrol={control}"
    )
    assert control, f"{fam.name}: control read-back is empty — test is vacuous"


def test_ingest_dedup_crash_replay_exact_ids(spark, tmp_path):
    """Sharper than the control comparison for the dedup store: the
    surviving corpus ids are closed-form — every fresh id, no re-sent id —
    so a double-append or a lost batch is directly visible."""
    fam = _IngestDedup()
    crashed = _drive(spark, fam, tmp_path, "dedup_ids", crash=True)
    expected = sorted(
        b * 100 + i for b in range(N_BATCHES) if b != 2 for i in range(5)
    )
    assert crashed[0] == repr(expected)
