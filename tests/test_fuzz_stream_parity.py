"""Fuzz-seeded batch/stream parity for the 10 store-backed streams
(r9 verdict task 4).

The 20 streaming modules were pinned only by hand-written parity tests
(tests/test_stream_*.py) and the crash-replay contract; the batch
registry, by contrast, gets 103 families x 6 random seeds through
``test_fuzz_differential``. This suite closes that asymmetry: the SAME
six committed seed datasets are mapped onto each store-backed stream's
input schema, split into three micro-batches, and driven through the
real stream (trigger-once per batch, exactly the crash-replay suite's
no-crash schedule). The final state read-back must be BIT-identical to
the reference:

- mergeable-state families (ks, cms, hll, quantile, anomaly, gram,
  trend, pagehinkley): the reference is the same stream given ALL rows
  in ONE batch — i.e. a single application of the family's batch
  aggregation over the concatenated input plus one state write. The
  hand-written per-family tests already pin "one batch == batch
  operator" (e.g. test_stream_hll.py bit-equates the streamed sketch to
  ``hll_distinct`` on the union), so 3-batch == 1-batch here is
  end-to-end batch parity: incremental merge across batches must lose
  nothing vs one-shot computation.
- keep-first gate families (ingest_dedup, neardup): batch segmentation
  is SEMANTIC (a doc rejected against the store does not enter it, so a
  later chained near-dup can legitimately survive — segmentation
  invariance does NOT hold for the near-dup closure). The reference is
  therefore the BATCH operator itself (``dedup_against_store`` /
  ``neardup_against_store``) folded over the identical 3-way split with
  plain DataFrames — no stream plumbing, no parquet state. Parity then
  verifies everything the stream adds: state layout, live_state
  reconstruction, sweep, and compaction.

Empty seeds drive 3 genuinely empty micro-batches (the batch-0 sweep
path); 'nulls' feeds NULL measure values through every fold.
"""

from __future__ import annotations

import datetime
import os

import pytest

import test_stream_crash_replay as crash
from test_fuzz_differential import SEEDS, _gen_tables

_SEED_TABLES: dict[str, dict] = {}


def _tables(mode: str) -> dict:
    if mode not in _SEED_TABLES:
        _SEED_TABLES[mode] = _gen_tables(mode)
    return _SEED_TABLES[mode]


def _iso(us: int) -> str:
    return datetime.datetime.utcfromtimestamp(us / 1_000_000).isoformat()


def _rows_from(tables: dict, cols: dict[str, str], table: str) -> list[dict]:
    """Materialize row dicts for a stream input from a seed table.
    ``cols`` maps output field -> source column or a derivation tag."""
    src = tables[table]
    n = len(next(iter(src.values()))) if src else 0
    out = []
    for i in range(n):
        row = {}
        for field, spec in cols.items():
            if spec == "__iso_ts":
                row[field] = _iso(src["ts"][i])
            elif spec == "__is_purchase":
                row[field] = src["event_type"][i] == "purchase"
            elif spec == "__score_bucket":
                row[field] = src["user_id"][i] % 5
            else:
                row[field] = src[spec][i]
        out.append(row)
    return out


# ----------------------------------------------------------------------
# per-family seed-input mapping (the stream schemas come from the
# crash-replay _Family classes — same start()/read() plumbing)
# ----------------------------------------------------------------------

def _seed_rows(fam_name: str, tables: dict) -> list[dict]:
    if fam_name == "ks":
        return _rows_from(
            tables, {"is_right": "__is_purchase", "value": "value"}, "events"
        )
    if fam_name == "cms":
        return _rows_from(tables, {"text": "text"}, "documents")
    if fam_name == "hll":
        return _rows_from(tables, {"user_id": "user_id"}, "events")
    if fam_name == "quantile":
        return _rows_from(tables, {"value": "value"}, "events")
    if fam_name == "anomaly":
        return _rows_from(
            tables,
            {"event_id": "event_id", "ts": "__iso_ts", "event_type": "event_type"},
            "events",
        )
    if fam_name == "ingest_dedup" or fam_name == "neardup":
        return _rows_from(tables, {"doc_id": "doc_id", "text": "text"}, "documents")
    if fam_name == "gram":
        return _rows_from(
            tables, {"vec_id": "vec_id", "embedding": "embedding"}, "embeddings"
        )
    if fam_name == "trend":
        return _rows_from(
            tables, {"score": "__score_bucket", "label": "__is_purchase"}, "events"
        )
    if fam_name == "pagehinkley":
        return _rows_from(
            tables,
            {"ts": "__iso_ts", "event_type": "event_type", "value": "value"},
            "events",
        )
    raise AssertionError(fam_name)


def _split3(rows: list[dict]) -> list[list[dict]]:
    """Deterministic contiguous thirds — arrival order, ids ascending
    where the input carries ids (keeps the exact-dedup keep-first
    outcome well-defined on both sides)."""
    n = len(rows)
    a, b = n // 3, (2 * n) // 3
    return [rows[:a], rows[a:b], rows[b:]]


def _drive_batches(spark, fam, tmp_path, tag: str, batches: list[list[dict]]):
    """The crash-replay suite's no-crash schedule: one source file and
    one trigger-once run per micro-batch."""
    src = str(tmp_path / f"src_{tag}")
    state = str(tmp_path / f"state_{tag}")
    ck = str(tmp_path / f"ck_{tag}")
    os.makedirs(src)
    for b, rows in enumerate(batches):
        crash._write_file(src, b, rows)
        q = fam.start(spark, src, state, ck, on_batch=None)
        q.awaitTermination()
    return fam.read(spark, state)


# gram needs dim=64 for the seed embeddings (the crash family pins dim=4
# for its own synthetic rows)
class _Gram64(crash._Gram):
    def start(self, spark, src, state, ck, on_batch):
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.gram_stream import (
            stream_gram_accumulate,
        )

        return stream_gram_accumulate(
            spark, src, self.schema, state, ck, dim=64,
            on_batch=on_batch, compact_threshold=2,
        )


MERGEABLE = [
    crash._KS(), crash._CMS(), crash._HLL(), crash._Quantile(),
    crash._Anomaly(), _Gram64(), crash._Trend(), crash._PageHinkley(),
]
GATES = [crash._IngestDedup(), crash._NearDup()]


@pytest.mark.parametrize("mode", SEEDS)
@pytest.mark.parametrize("fam", MERGEABLE, ids=[f.name for f in MERGEABLE])
def test_stream_split_equals_one_batch(fam, mode, spark, tmp_path):
    rows = _seed_rows(fam.name, _tables(mode))
    split = _drive_batches(
        spark, fam, tmp_path, f"{fam.name}_{mode}_s", _split3(rows)
    )
    whole = _drive_batches(
        spark, fam, tmp_path, f"{fam.name}_{mode}_w", [rows, [], []]
    )
    assert split == whole, (
        f"{fam.name}/{mode}: 3-batch incremental state diverged from the "
        f"one-shot batch computation\nsplit={split}\nwhole={whole}"
    )


def _fold_gate_reference(spark, fam_name: str, batches: list[list[dict]]):
    """The batch operator folded over the same splits, no stream
    plumbing. Returns [repr(corpus_ids), repr(store_tuples)] in the
    crash families' read() format."""
    from pyspark.sql import functions as F

    from hmpps_digital_prison_reporting_glue_poc_spark.operators import dedup as D

    if fam_name == "ingest_dedup":
        store = spark.createDataFrame([], "doc_id long, fingerprint string")
        gate = lambda batch, st: D.dedup_against_store(batch, st)
        key = lambda r: (r.doc_id, r.fingerprint)
    else:
        store = spark.createDataFrame(
            [], "doc_id long, band_idx int, band_key string"
        )
        gate = lambda batch, st: D.neardup_against_store(batch, st)
        key = lambda r: (r.doc_id, r.band_idx, r.band_key)

    corpus_ids: list[int] = []
    kept_rows: list = []
    for rows in batches:
        if not rows:
            continue
        batch = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in rows],
            "doc_id long, text string",
        )
        kept = gate(batch, store).collect()
        kept_rows.extend(kept)
        corpus_ids.extend(sorted({r.doc_id for r in kept}))
        if kept:
            store = store.unionByName(
                spark.createDataFrame(
                    [key(r) for r in kept], store.schema
                )
            )
    return [repr(sorted(corpus_ids)), repr(sorted(key(r) for r in kept_rows))]


@pytest.mark.parametrize("mode", SEEDS)
@pytest.mark.parametrize("fam", GATES, ids=[f.name for f in GATES])
def test_gate_stream_equals_batch_fold(fam, mode, spark, tmp_path):
    rows = _seed_rows(fam.name, _tables(mode))
    batches = _split3(rows)
    streamed = _drive_batches(
        spark, fam, tmp_path, f"{fam.name}_{mode}_g", batches
    )
    reference = _fold_gate_reference(spark, fam.name, batches)
    assert streamed == reference, (
        f"{fam.name}/{mode}: streamed store/corpus diverged from the batch "
        f"operator folded over the same splits"
        f"\nstream={streamed}\nbatch={reference}"
    )
