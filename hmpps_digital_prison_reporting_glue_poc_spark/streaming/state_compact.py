"""Crash-safe compaction for storage-backed sketch-stream state.

The sketch streams (ks_stream, cms_stream, hll/bloom/dedup variants)
persist one ``__batch_id=N`` delta partition per micro-batch so a
replayed batch overwrites its own delta (the non-idempotent-merge
discipline). Correct — but the partition count grows linearly with
batches: a month of minute-batches is ~43k directories, and every reader
pays the listing + small-file cost (round-6 streaming stress, SCALE.md).

Compaction folds committed deltas into a BASE partition whose id encodes
its coverage: ``__batch_id=-(K+1)`` holds the merged state of deltas
``0..K``. Readers (:func:`live_state`) take the newest base (most
negative id) plus only deltas ``> K``. That encoding makes every crash
window safe with no commit protocol:

- new base is staged in a dot-directory (parquet readers ignore hidden
  dirs) and RENAMED into place — atomic on local/HDFS, so a reader never
  sees a partial base;
- after the rename, the old base and the deltas it covers are deleted
  lazily — if a crash leaves them behind, readers already ignore them
  (covered by the newer base), and the next compaction sweeps them;
- a replayed batch N only re-runs compaction over deltas ``< N`` — all
  committed — and skips if below threshold; either path is consistent.

Merge semantics are the sketch's own (sum for count states, max for HLL
registers, bitwise-OR for Bloom words), passed in as aggregate columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_TMP = ".compact_tmp"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _partition_ids(spark: SparkSession, state_path: str) -> list[int]:
    jvm, fs = _fs(spark, state_path)
    jpath = jvm.org.apache.hadoop.fs.Path(state_path)
    if not fs.exists(jpath):
        return []
    ids = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith("__batch_id="):
            try:
                ids.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return ids


def live_state(
    spark: SparkSession, state_path: str, schema: str | None = None
) -> DataFrame:
    """The logically-live state rows: newest base partition (if any) plus
    every delta above its coverage. The id scan is a directory listing —
    metadata-scale, no data read.

    ``schema``: when given, a missing or partition-less state path (no
    batch ever wrote — e.g. every micro-batch so far was empty after the
    stream's input filter) returns an EMPTY frame of that schema instead
    of failing parquet schema inference — so every ``*_from_state`` read
    degrades to its batch twin's empty-input contract (r10 stream fuzz)."""
    if schema is not None and not _partition_ids(spark, state_path):
        return spark.createDataFrame([], schema)
    df = spark.read.parquet(state_path)
    ids = _partition_ids(spark, state_path)
    bases = [i for i in ids if i < 0]
    if not bases:
        return df
    newest = min(bases)
    covered = -newest - 1
    return df.filter(
        (F.col("__batch_id") == newest) | (F.col("__batch_id") > covered)
    )


def sweep_stale(spark: SparkSession, state_path: str, batch_id: int) -> None:
    """Drop state partitions a replay makes stale: any delta with id >=
    the current batch (within one checkpoint lineage a higher id can only
    come from an abandoned attempt), and on batch 0 — a fresh-checkpoint
    rerun — EVERYTHING, bases and staging dirs included, so a re-segmented
    replay can't double-count the previous run's state."""
    jvm, fs = _fs(spark, state_path)
    jpath = jvm.org.apache.hadoop.fs.Path(state_path)
    if not fs.exists(jpath):
        return
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name == _TMP and batch_id == 0:
            fs.delete(status.getPath(), True)
            continue
        if not name.startswith("__batch_id="):
            continue
        try:
            stale_id = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if stale_id >= batch_id or (batch_id == 0 and stale_id < 0):
            fs.delete(status.getPath(), True)


def compact_state(
    spark: SparkSession,
    state_path: str,
    batch_id: int,
    key_cols: list[str],
    aggs: list[Column],
    threshold: int = 64,
) -> bool:
    """Fold committed deltas (< ``batch_id``) into a new base partition
    when at least ``threshold`` delta partitions have accumulated (i.e.
    ``len(eligible) >= threshold``). Returns True when a compaction ran.
    Call from inside the stream's ``foreachBatch`` AFTER writing the
    current delta."""
    ids = _partition_ids(spark, state_path)
    bases = [i for i in ids if i < 0]
    newest = min(bases) if bases else None
    covered = -newest - 1 if newest is not None else -1
    eligible = sorted(i for i in ids if covered < i < batch_id)
    if len(eligible) < threshold:
        return False

    new_covered = max(eligible)
    src = spark.read.parquet(state_path)
    keep = F.col("__batch_id").isin(
        *([newest] if newest is not None else []), *eligible
    )
    kept = src.filter(keep)
    if aggs:
        merged = kept.groupBy(*key_cols).agg(*aggs)
    else:  # set-union state (e.g. fingerprint stores): distinct rows
        merged = kept.select(*key_cols).distinct()

    jvm, fs = _fs(spark, state_path)
    tmp = jvm.org.apache.hadoop.fs.Path(state_path.rstrip("/") + "/" + _TMP)
    if fs.exists(tmp):
        fs.delete(tmp, True)
    merged.write.mode("overwrite").parquet(tmp.toString())
    dest = jvm.org.apache.hadoop.fs.Path(
        state_path.rstrip("/") + f"/__batch_id=-{new_covered + 1}"
    )
    if fs.exists(dest):  # only possible from a replayed identical attempt
        fs.delete(dest, True)
    fs.rename(tmp, dest)

    # lazy cleanup — everything below is already ignored by live_state:
    # the old base, the deltas just folded, crash-leftover deltas already
    # covered by the OLD base (id <= covered — a prior compaction renamed
    # its base but died before its own cleanup), and crash-leftover older
    # bases (negative ids less negative than the old ``newest``). Without
    # the last two groups, pre-coverage leftovers would linger forever.
    leftover_deltas = [i for i in ids if 0 <= i <= covered and i not in eligible]
    leftover_bases = [i for i in ids if i < 0 and newest is not None and i > newest]
    for i in ([] if newest is None else [newest]) + eligible + leftover_deltas + leftover_bases:
        p = jvm.org.apache.hadoop.fs.Path(
            state_path.rstrip("/") + f"/__batch_id={i}"
        )
        if fs.exists(p):
            fs.delete(p, True)
    return True
