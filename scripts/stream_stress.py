"""Round-6 streaming stress (r5 verdict task 4): per-batch wall time and
state growth across >=20 micro-batches for every stateful streaming
surface. Watermark-state leaks and per-batch file/size growth are the
streaming analogues of batch quadratics — invisible in 3-batch pytest
runs, fatal on a stream that runs for a month.

Families:
  pipeline-flat     4-stage CDC pipeline, unpartitioned target (default)
  pipeline-part     same, date-partitioned target + incremental curated
  sessionize        applyInPandasWithState, growing user space
  join              dual-watermark stream-stream join, advancing event time
  ks / cms          storage-backed sketch states, per-batch delta partitions

Each family prints one JSON line per batch:
  {"family": ..., "batch": i, "sec": ..., "state_rows": ..., "files": ...,
   "bytes": ...}
and a trailer {"family": ..., "summary": {...}} with first-5/last-5 mean
ratio (a ratio >> 1 across constant-size batches = growth leak).

Usage: python scripts/stream_stress.py [family ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark

WORK = os.path.abspath(os.environ.get("STREAM_STRESS_DIR", ".scale/stream"))
N_BATCHES = int(os.environ.get("STREAM_STRESS_BATCHES", "24"))
ROWS_PER_BATCH = int(os.environ.get("STREAM_STRESS_ROWS", "4000"))


def _reset(*names: str) -> list[str]:
    out = []
    for n in names:
        p = os.path.join(WORK, n)
        shutil.rmtree(p, ignore_errors=True)
        os.makedirs(p, exist_ok=True)
        out.append(p)
    return out


def _dir_stats(path: str) -> tuple[int, int]:
    files = size = 0
    for dirpath, _d, fns in os.walk(path):
        for fn in fns:
            if fn.startswith((".", "_")):
                continue
            files += 1
            size += os.path.getsize(os.path.join(dirpath, fn))
    return files, size


def _emit(family: str, batch: int, sec: float, **extra) -> None:
    print(
        json.dumps(
            {"family": family, "batch": batch, "sec": round(sec, 3), **extra}
        ),
        flush=True,
    )


def _summary(family: str, secs: list[float], **extra) -> None:
    k = min(5, max(1, len(secs) // 4))
    first = sum(secs[:k]) / k
    last = sum(secs[-k:]) / k
    print(
        json.dumps(
            {
                "family": family,
                "summary": {
                    "n_batches": len(secs),
                    "first5_mean_sec": round(first, 3),
                    "last5_mean_sec": round(last, 3),
                    "last_over_first": round(last / first, 2) if first else None,
                    **extra,
                },
            }
        ),
        flush=True,
    )


# ---------------------------------------------------------------- pipeline

PIPE_ROW_SCHEMA = T.StructType(
    [
        T.StructField("OFFENDER_ID", T.LongType()),
        T.StructField("LAST_NAME", T.StringType()),
        T.StructField("EV_DATE", T.StringType()),
    ]
)


def _cdc_event(op: str, pos: int, oid: int, name: str, ev_date: str) -> dict:
    row = {"OFFENDER_ID": oid, "LAST_NAME": name, "EV_DATE": ev_date}
    out = {
        "table": "OMS_OWNER.OFFENDERS",
        "op_type": op,
        "op_ts": "2022-09-07 21:35:18.000000",
        "current_ts": "c",
        "pos": f"{pos:020d}",
    }
    if op in ("U", "D"):
        out["before"] = row
    if op in ("I", "U"):
        out["after"] = row
    return out


def _write_pipeline_files(srcdir: str) -> None:
    """Batch i: mostly inserts of NEW keys dated day i, plus updates to a
    fixed number of keys from the two previous days — the recent-churn
    shape real CDC has. Batch size constant, so flat per-batch cost is
    the pass criterion."""
    pos = 0
    new_per_batch = ROWS_PER_BATCH * 3 // 4
    upd_per_batch = ROWS_PER_BATCH - new_per_batch
    for b in range(N_BATCHES):
        day = f"2024-01-{b + 1:02d}"
        events = []
        base = b * new_per_batch
        for i in range(new_per_batch):
            pos += 1
            events.append(
                _cdc_event("I", pos, base + i, f"n{b}_{i}", day)
            )
        # updates against the previous day's keys (stay in their partition)
        if b > 0:
            prev_day = f"2024-01-{b:02d}"
            prev_base = (b - 1) * new_per_batch
            for i in range(upd_per_batch):
                pos += 1
                events.append(
                    _cdc_event(
                        "U", pos, prev_base + i, f"u{b}_{i}", prev_day
                    )
                )
        with open(os.path.join(srcdir, f"b{b:03d}.json"), "w") as fh:
            for e in events:
                fh.write(json.dumps(e) + "\n")


def run_pipeline_family(spark, partitioned: bool) -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.catalog import Catalog, TableSpec
    from hmpps_digital_prison_reporting_glue_poc_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline_streaming,
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.types import (
        schema_from_ddl,
        with_admin_columns,
    )

    fam = "pipeline-part" if partitioned else "pipeline-flat"
    src, log_p, tgt, cur, ckpt = _reset(
        f"{fam}/src", f"{fam}/log", f"{fam}/tgt", f"{fam}/cur", f"{fam}/ckpt"
    )
    _write_pipeline_files(src)
    part = ["ev_date"] if partitioned else []
    catalog = Catalog(
        {
            "log": TableSpec("log", log_p, pk=[]),
            "tgt": TableSpec("tgt", tgt, pk=["offender_id"], partition_by=part),
            "cur": TableSpec("cur", cur, pk=["offender_id"], partition_by=part),
        }
    )
    cfg = PipelineConfig(
        raw_path=src,
        event_log_table="log",
        row_schema=PIPE_ROW_SCHEMA,
        tables={"offenders": ("tgt", "cur")},
    )
    target_schema = with_admin_columns(
        schema_from_ddl(
            "offender_id bigint, last_name varchar2(60), ev_date varchar2(10)"
        )
    )
    # one sentinel row: an EMPTY partitioned table has no files to infer
    # a schema from, so seed with a real (inert) row in a sentinel date
    seed = spark.createDataFrame(
        [(-1, "seed", "2023-12-31", None, None, None, None)],
        target_schema,
    )
    for p in (tgt, cur):
        w = seed.write.mode("overwrite")
        if partitioned:
            w = w.partitionBy("ev_date")
        w.parquet(p)
    times: list[float] = []
    rewrites: list[float] = []
    last = [time.time()]
    prev_snap: dict[str, dict] = {"tgt": {}, "cur": {}}

    def _snap(root):
        out = {}
        for dirpath, _d, fns in os.walk(root):
            for fn in fns:
                if fn.startswith((".", "_")):
                    continue
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                out[p] = (st.st_mtime_ns, st.st_size)
        return out

    def _rewritten(key, root):
        """Bytes of files new or modified since the previous batch — the
        batch's true write amplification."""
        now_snap = _snap(root)
        prev = prev_snap[key]
        delta = sum(
            sz for p, (mt, sz) in now_snap.items() if prev.get(p) != (mt, sz)
        )
        prev_snap[key] = now_snap
        return delta

    def on_batch(batch_id: int) -> None:
        now = time.time()
        sec = now - last[0]
        last[0] = now
        files, size = _dir_stats(tgt)
        tgt_rw = _rewritten("tgt", tgt)
        cur_rw = _rewritten("cur", cur)
        _emit(
            fam, batch_id, sec,
            tgt_files=files, tgt_mb=round(size / 1e6, 2),
            tgt_rewritten_mb=round(tgt_rw / 1e6, 2),
            cur_rewritten_mb=round(cur_rw / 1e6, 2),
        )
        times.append(sec)
        rewrites.append((tgt_rw + cur_rw) / 1e6)

    run_pipeline_streaming(
        spark, cfg, catalog, checkpoint_dir=ckpt, on_batch=on_batch
    )
    k = min(5, max(1, len(rewrites) // 4))
    _summary(
        fam, times,
        first5_rewritten_mb=round(sum(rewrites[:k]) / k, 2),
        last5_rewritten_mb=round(sum(rewrites[-k:]) / k, 2),
    )


# -------------------------------------------------------------- sessionize

SESS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
    ]
)


def run_sessionize_family(spark, idle_timeout: int | None = None) -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.sessionize import (
        stream_sessionize,
    )

    fam = "sessionize" if idle_timeout is None else f"sessionize-t{idle_timeout}"
    src, out, ckpt = _reset(f"{fam}/src", f"{fam}/out", f"{fam}/ckpt")
    # growing user space: each batch brings a fresh cohort of users plus
    # continuing events from the previous cohort — total distinct users
    # grows linearly, the worst case for NoTimeout state
    eid = 0
    cohort = ROWS_PER_BATCH // 4
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH):
                eid += 1
                uid = (b * cohort) + (i % (2 * cohort))  # half old, half new
                ts = f"2024-01-01 {b % 24:02d}:{(i // 60) % 60:02d}:{i % 60:02d}"
                fh.write(
                    json.dumps(
                        {"user_id": uid, "event_id": eid, "ts": ts}
                    )
                    + "\n"
                )
    stream = (
        spark.readStream.schema(SESS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    kwargs = {} if idle_timeout is None else {"idle_timeout_minutes": idle_timeout}
    q = (
        stream_sessionize(stream, gap_minutes=30, **kwargs)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    secs = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        sec = p["durationMs"].get("triggerExecution", 0) / 1000.0
        state = (p.get("stateOperators") or [{}])[0]
        _emit(
            fam, p["batchId"], sec,
            state_rows=state.get("numRowsTotal"),
            state_mb=round(state.get("memoryUsedBytes", 0) / 1e6, 2),
        )
        secs.append(sec)
    final_state = (q.lastProgress.get("stateOperators") or [{}])[0]
    _summary(fam, secs, final_state_rows=final_state.get("numRowsTotal"))


# -------------------------------------------------------------------- join

JOIN_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)


def run_join_family(spark) -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.join_stream import (
        stream_enrich,
    )

    fam = "join"
    src, out, ckpt = _reset(f"{fam}/src", f"{fam}/out", f"{fam}/ckpt")
    # event time advances one hour per batch; watermark 30 min + lookback
    # 1 h -> state must PLATEAU at ~2 batches' worth, not grow 24x
    eid = 0
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH):
                eid += 1
                kind = "view" if i % 2 == 0 else "purchase"
                mins = (i // 2) % 60
                fh.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "user_id": i % 500,
                            "kind": kind,
                            "ts": f"2024-01-{1 + b // 24:02d} "
                            f"{b % 24:02d}:{mins:02d}:00",
                        }
                    )
                    + "\n"
                )

    def side(kind, id_alias, ts_alias):
        return (
            spark.readStream.schema(JOIN_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .filter(F.col("kind") == kind)
            .select(
                F.col("event_id").alias(id_alias),
                "user_id",
                F.col("ts").alias(ts_alias),
            )
        )

    q = (
        stream_enrich(
            side("purchase", "purchase_id", "ts"),
            side("view", "view_id", "r_ts"),
            watermark_delay="30 minutes",
            lookback="1 hour",
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    secs, rows = [], []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        sec = p["durationMs"].get("triggerExecution", 0) / 1000.0
        state = (p.get("stateOperators") or [{}])[0]
        _emit(
            fam, p["batchId"], sec,
            state_rows=state.get("numRowsTotal"),
            state_mb=round(state.get("memoryUsedBytes", 0) / 1e6, 2),
        )
        secs.append(sec)
        rows.append(state.get("numRowsTotal") or 0)
    _summary(
        fam, secs,
        max_state_rows=max(rows) if rows else None,
        final_state_rows=rows[-1] if rows else None,
    )


# ----------------------------------------------------------------- ks, cms

def run_ks_family(spark) -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
        ks_from_state,
        stream_ks_drift,
    )

    fam = "ks"
    src, state, ckpt = _reset(f"{fam}/src", f"{fam}/state", f"{fam}/ckpt")
    schema = T.StructType(
        [
            T.StructField("value", T.DoubleType()),
            T.StructField("is_right", T.BooleanType()),
        ]
    )
    secs = []
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH):
                fh.write(
                    json.dumps(
                        {
                            "value": (i * 7919 + b) % 1000 / 10.0,
                            "is_right": i % 2 == 0,
                        }
                    )
                    + "\n"
                )
        t0 = time.time()
        q = stream_ks_drift(
            spark, src, schema, state, ckpt, trigger_once=True,
            compact_threshold=8,
        )
        q.awaitTermination()
        apply_sec = time.time() - t0
        t1 = time.time()
        ks_from_state(spark, state).collect()
        read_sec = time.time() - t1
        files, size = _dir_stats(state)
        _emit(
            fam, b, apply_sec,
            read_sec=round(read_sec, 3),
            state_files=files, state_kb=round(size / 1e3, 1),
        )
        secs.append(apply_sec + read_sec)
    _summary(fam, secs, final_state_files=_dir_stats(state)[0])


def run_anomaly_family(spark) -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.anomaly_stream import (
        anomaly_from_state,
        stream_daily_anomaly,
    )

    fam = "anomaly"
    src, state, ckpt = _reset(f"{fam}/src", f"{fam}/state", f"{fam}/ckpt")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    secs = []
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH):
                # day advances with the batch: the state's day span grows
                # linearly — the monitor must stay flat per batch anyway
                day = (b * 3 + i % 5) % 60 + 1
                fh.write(
                    json.dumps(
                        {
                            "event_id": b * ROWS_PER_BATCH + i,
                            "ts": f"2024-01-{day:02d}T08:00:00",
                            "event_type": "purchase" if i % 3 else "view",
                        }
                    )
                    + "\n"
                )
        t0 = time.time()
        q = stream_daily_anomaly(
            spark, src, schema, state, ckpt, trigger_once=True,
            compact_threshold=8,
        )
        q.awaitTermination()
        apply_sec = time.time() - t0
        t1 = time.time()
        anomaly_from_state(spark, state).collect()
        read_sec = time.time() - t1
        files, size = _dir_stats(state)
        _emit(
            fam, b, apply_sec,
            read_sec=round(read_sec, 3),
            state_files=files, state_kb=round(size / 1e3, 1),
        )
        secs.append(apply_sec + read_sec)
    _summary(fam, secs, final_state_files=_dir_stats(state)[0])


def run_hll_family(spark) -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.hll_stream import (
        read_hll_estimate,
        stream_hll_distinct,
    )

    fam = "hll"
    src, state, ckpt = _reset(f"{fam}/src", f"{fam}/state", f"{fam}/ckpt")
    schema = T.StructType([T.StructField("user_id", T.LongType())])
    secs = []
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH):
                # rolling key space: each batch adds fresh distincts
                fh.write(json.dumps({"user_id": b * 1000 + i % 2500}) + "\n")
        t0 = time.time()
        q = stream_hll_distinct(
            spark, src, schema, state, ckpt, trigger_once=True
        )
        q.awaitTermination()
        apply_sec = time.time() - t0
        t1 = time.time()
        read_hll_estimate(spark, state).collect()
        read_sec = time.time() - t1
        files, size = _dir_stats(state)
        _emit(
            fam, b, apply_sec,
            read_sec=round(read_sec, 3),
            state_files=files, state_kb=round(size / 1e3, 1),
        )
        secs.append(apply_sec + read_sec)
    _summary(fam, secs, final_state_files=_dir_stats(state)[0])


def run_quantile_family(spark) -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.quantile_stream import (
        quantiles_from_state,
        stream_quantile_counts,
    )

    fam = "quantile"
    src, state, ckpt = _reset(f"{fam}/src", f"{fam}/state", f"{fam}/ckpt")
    schema = T.StructType([T.StructField("value", T.DoubleType())])
    secs = []
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH):
                fh.write(
                    json.dumps({"value": ((i * 31 + b * 7) % 5000) / 10.0})
                    + "\n"
                )
        t0 = time.time()
        q = stream_quantile_counts(
            spark, src, schema, state, ckpt, trigger_once=True,
            compact_threshold=8,
        )
        q.awaitTermination()
        apply_sec = time.time() - t0
        t1 = time.time()
        quantiles_from_state(spark, state, [0.5, 0.95, 0.99]).collect()
        read_sec = time.time() - t1
        files, size = _dir_stats(state)
        _emit(
            fam, b, apply_sec,
            read_sec=round(read_sec, 3),
            state_files=files, state_kb=round(size / 1e3, 1),
        )
        secs.append(apply_sec + read_sec)
    _summary(fam, secs, final_state_files=_dir_stats(state)[0])


def run_bloom_family(spark) -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.retrieval import (
        bloom_bit_positions,
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.bloom_stream import (
        stream_bloom_decontaminate,
    )

    fam = "bloom"
    src, bits, out, ckpt = _reset(
        f"{fam}/src", f"{fam}/bits", f"{fam}/out", f"{fam}/ckpt"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    eval_docs = spark.createDataFrame(
        [(i, f"ev{i} tok{i} mark{i} ev{i} tok{i}") for i in range(200)],
        "doc_id long, text string",
    )
    bits_path = os.path.join(bits, "bits.parquet")
    bloom_bit_positions(eval_docs).write.parquet(bits_path)
    secs = []
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH // 10):
                did = b * 100_000 + i
                # every ~20th doc quotes an eval doc (a contamination hit)
                text = (
                    f"ev{i % 200} tok{i % 200} mark{i % 200} pad{did}"
                    if i % 20 == 0
                    else f"w{did} x{did} y{did} z{did} q{did}"
                )
                fh.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        t0 = time.time()
        q = stream_bloom_decontaminate(
            spark, src, schema, bits_path, out, ckpt, trigger_once=True
        )
        q.awaitTermination()
        secs.append(time.time() - t0)
        files, size = _dir_stats(out)
        _emit(fam, b, secs[-1], out_files=files, out_kb=round(size / 1e3, 1))
    _summary(fam, secs, final_out_files=_dir_stats(out)[0])


def run_ingest_dedup_family(spark) -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.dedup_stream import (
        stream_ingest_dedup,
    )

    fam = "ingest-dedup"
    src, store, corpus, ckpt = _reset(
        f"{fam}/src", f"{fam}/store", f"{fam}/corpus", f"{fam}/ckpt"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    secs = []
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH // 10):
                did = b * 100_000 + i
                # ~30% of each batch repeats earlier content (dup pressure
                # against a store that grows every batch)
                text = (
                    f"dup body {i % 120}"
                    if i % 3 == 0
                    else f"fresh {b} {i} body"
                )
                fh.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        t0 = time.time()
        q = stream_ingest_dedup(
            spark, src, schema, store, corpus, ckpt, trigger_once=True,
            compact_threshold=8,
        )
        q.awaitTermination()
        secs.append(time.time() - t0)
        sfiles, ssize = _dir_stats(store)
        _emit(
            fam, b, secs[-1],
            store_files=sfiles, store_kb=round(ssize / 1e3, 1),
        )
    _summary(fam, secs, final_store_files=_dir_stats(store)[0])


def run_cms_family(spark) -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.cms_stream import (
        read_cms_estimate,
        stream_cms_counts,
    )

    fam = "cms"
    src, cells, ckpt = _reset(f"{fam}/src", f"{fam}/cells", f"{fam}/ckpt")
    schema = T.StructType([T.StructField("text", T.StringType())])
    secs = []
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH // 10):
                words = " ".join(
                    f"w{(i * 31 + j + b) % 5000}" for j in range(10)
                )
                fh.write(json.dumps({"text": words}) + "\n")
        t0 = time.time()
        q = stream_cms_counts(
            spark, src, schema, cells, ckpt, trigger_once=True,
            compact_threshold=8,
        )
        q.awaitTermination()
        apply_sec = time.time() - t0
        t1 = time.time()
        probe = spark.createDataFrame(
            [("w1",), ("w100",), ("w4999",)], "token string"
        )
        read_cms_estimate(spark, cells, probe).collect()
        read_sec = time.time() - t1
        files, size = _dir_stats(cells)
        _emit(
            fam, b, apply_sec,
            read_sec=round(read_sec, 3),
            state_files=files, state_kb=round(size / 1e3, 1),
        )
        secs.append(apply_sec + read_sec)
    _summary(fam, secs, final_state_files=_dir_stats(cells)[0])


# ---------------------------------------------------------------- trending

TREND_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def run_trending_family(spark) -> None:
    """Top-k per finalized window (r6 verdict task 4): state under MANY
    concurrent open windows. Each batch spreads its docs over a full hour
    of event time (6 open 10-min windows at once) while the event clock
    advances an hour per batch — the windowed count state must PLATEAU at
    the watermark horizon (~4 windows x vocabulary), never grow with
    total windows ever opened; per-batch time must stay flat; the ranked
    sink must append k rows per closed window, nothing rewritten."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.trending import (
        stream_trending_tokens,
    )

    fam = "trending"
    src, out, ckpt = _reset(f"{fam}/src", f"{fam}/out", f"{fam}/ckpt")
    vocab = 800
    did = 0
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH):
                did += 1
                # event time: batch b covers hour b, spread over 60 min
                day, hour = 1 + b // 24, b % 24
                ts = f"2024-01-{day:02d} {hour:02d}:{i % 60:02d}:{i % 53:02d}"
                toks = " ".join(
                    f"tok{(i * 7 + j * 131 + b) % vocab}" for j in range(8)
                )
                fh.write(
                    json.dumps({"doc_id": did, "ts": ts, "text": toks}) + "\n"
                )
    t0 = time.time()
    q = stream_trending_tokens(
        spark, src, TREND_SCHEMA, out, ckpt,
        k=5, window_duration="10 minutes", watermark_delay="30 minutes",
        trigger_once=True, max_files_per_trigger=1,
    )
    q.awaitTermination()
    secs = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        sec = p["durationMs"].get("triggerExecution", 0) / 1000.0
        state = (p.get("stateOperators") or [{}])[0]
        _emit(
            fam, p["batchId"], sec,
            state_rows=state.get("numRowsTotal"),
            state_mb=round(state.get("memoryUsedBytes", 0) / 1e6, 2),
        )
        secs.append(sec)
    final_state = (q.lastProgress.get("stateOperators") or [{}])[0]
    rows = spark.read.parquet(out)
    n_windows = rows.select("window_start").distinct().count()
    files, size = _dir_stats(out)
    _summary(
        fam, secs,
        final_state_rows=final_state.get("numRowsTotal"),
        total_sec=round(time.time() - t0, 1),
        closed_windows=n_windows,
        ranked_rows=rows.count(),
        out_files=files, out_kb=round(size / 1e3, 1),
    )


# ---------------------------------------------------------------- windowed

WIND_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.StringType()),
    ]
)


def run_windowed_family(spark) -> None:
    """Watermarked windowed aggregation under an OPEN key space (r6
    verdict task 4): every batch brings ENTIRELY new user ids (the
    unbounded-cardinality worst case), event time advances an hour per
    batch. Watermark eviction must keep state at the horizon's windows x
    that horizon's keys — NOT total keys ever seen; per-batch time flat."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.windowed import (
        stream_windowed_counts,
    )

    fam = "windowed"
    src, out, ckpt = _reset(f"{fam}/src", f"{fam}/out", f"{fam}/ckpt")
    eid = 0
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH):
                eid += 1
                uid = b * ROWS_PER_BATCH + i  # all-new keys every batch
                day, hour = 1 + b // 24, b % 24
                ts = f"2024-01-{day:02d} {hour:02d}:{i % 60:02d}:{i % 47:02d}"
                fh.write(
                    json.dumps(
                        {
                            "event_id": eid, "user_id": uid,
                            "value": float(i % 100), "ts": ts,
                        }
                    )
                    + "\n"
                )
    stream = (
        spark.readStream.schema(WIND_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    counts = stream_windowed_counts(
        stream, window_duration="10 minutes", watermark_delay="30 minutes",
        keys=["user_id"],
    )
    q = (
        counts.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    secs = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        sec = p["durationMs"].get("triggerExecution", 0) / 1000.0
        state = (p.get("stateOperators") or [{}])[0]
        _emit(
            fam, p["batchId"], sec,
            state_rows=state.get("numRowsTotal"),
            state_mb=round(state.get("memoryUsedBytes", 0) / 1e6, 2),
            evicted=state.get("numRowsRemoved"),
        )
        secs.append(sec)
    final_state = (q.lastProgress.get("stateOperators") or [{}])[0]
    emitted = spark.read.parquet(out).count()
    _summary(
        fam, secs,
        final_state_rows=final_state.get("numRowsTotal"),
        emitted_rows=emitted,
    )


# ---------------------------------------------------------------- wm-dedup

WMD_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)


def run_wm_dedup_family(spark) -> None:
    """dropDuplicatesWithinWatermark under an OPEN key space: every batch
    brings 75% new keys + 25% in-horizon duplicates of the previous
    batch, event time +1h/batch, 30-min horizon. State must plateau at
    ~the horizon's key count (watermark eviction), NOT keys-ever-seen;
    emitted rows = exactly the first occurrences."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.wm_dedup_stream import (
        stream_dedup_within_watermark,
    )

    fam = "wm-dedup"
    src, out, ckpt = _reset(f"{fam}/src", f"{fam}/out", f"{fam}/ckpt")
    new_per = ROWS_PER_BATCH * 3 // 4
    dup_per = ROWS_PER_BATCH - new_per
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            day, hour = 1 + b // 24, b % 24
            for i in range(new_per):
                eid = b * new_per + i
                ts = f"2024-01-{day:02d} {hour:02d}:{i % 60:02d}:{i % 41:02d}"
                fh.write(json.dumps({"event_id": eid, "payload": f"n{b}", "ts": ts}) + "\n")
            # duplicates of the PREVIOUS batch's keys, nudged 1 min later
            prev = max(b - 1, 0)
            for i in range(dup_per):
                eid = prev * new_per + i
                ts = f"2024-01-{day:02d} {hour:02d}:{(i + 1) % 60:02d}:{i % 37:02d}"
                fh.write(json.dumps({"event_id": eid, "payload": f"d{b}", "ts": ts}) + "\n")
    q = stream_dedup_within_watermark(
        spark, src, WMD_SCHEMA, out, ckpt,
        key_cols=("event_id",), watermark_delay="30 minutes",
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    secs = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        sec = p["durationMs"].get("triggerExecution", 0) / 1000.0
        state = (p.get("stateOperators") or [{}])[0]
        _emit(
            fam, p["batchId"], sec,
            state_rows=state.get("numRowsTotal"),
            evicted=state.get("numRowsRemoved"),
        )
        secs.append(sec)
    final_state = (q.lastProgress.get("stateOperators") or [{}])[0]
    emitted = spark.read.parquet(out).count()
    # exact first-occurrence count: batch b's dup block duplicates keys
    # already emitted in batch b-1 (except batch 0, which dups its own)
    expected = N_BATCHES * new_per
    _summary(
        fam, secs,
        final_state_rows=final_state.get("numRowsTotal"),
        emitted_rows=emitted,
        expected_first_occurrences=expected,
    )


def run_session_agg_family(spark) -> None:
    """Native session_window aggregation under many concurrent users:
    every batch advances event time +1h (> the 30-min gap), so each of
    the 1,000 users opens a NEW session per batch while the watermark
    closes the previous one. State must plateau at ~open-session count
    (one per active user), NOT sessions-ever-seen; emitted rows must be
    exactly the closed sessions."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.session_agg import (
        stream_session_aggregates,
    )

    fam = "session-agg"
    src, out, ckpt = _reset(f"{fam}/src", f"{fam}/out", f"{fam}/ckpt")
    n_users = 1000
    per_user = max(1, ROWS_PER_BATCH // n_users)
    for b in range(N_BATCHES):
        day, hour = 1 + b // 24, b % 24
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for u in range(n_users):
                for i in range(per_user):
                    ts = f"2024-01-{day:02d} {hour:02d}:{(i * 7) % 25:02d}:{(u + i) % 60:02d}"
                    fh.write(
                        json.dumps(
                            {
                                "event_id": b * ROWS_PER_BATCH + u * per_user + i,
                                "user_id": f"u{u}",
                                "ts": ts,
                                "value": float((u + i) % 50),
                            }
                        )
                        + "\n"
                    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.StringType()),
            T.StructField("ts", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_session_aggregates(stream, "30 minutes", "30 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    secs = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        sec = p["durationMs"].get("triggerExecution", 0) / 1000.0
        state = (p.get("stateOperators") or [{}])[0]
        _emit(
            fam, p["batchId"], sec,
            state_rows=state.get("numRowsTotal"),
            evicted=state.get("numRowsRemoved"),
        )
        secs.append(sec)
    final_state = (q.lastProgress.get("stateOperators") or [{}])[0]
    emitted = spark.read.parquet(out).count()
    # each batch-hour creates one session per user; all but the last
    # batch's sessions close once the next batch advances the watermark
    _summary(
        fam, secs,
        final_state_rows=final_state.get("numRowsTotal"),
        emitted_sessions=emitted,
        expected_closed=(N_BATCHES - 1) * n_users,
    )


def run_funnel_family(spark) -> None:
    """Streaming funnel CEP under an open user space: each batch brings
    500 users cycling view->click->purchase (one completion per user per
    batch) with event time +1h/batch and a 2h event-time idle timeout.
    State must be bounded by the active working set, not users-ever-seen;
    completions must equal the planted count exactly."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.funnel_stream import (
        stream_funnel_completions,
    )

    fam = "funnel"
    src, out, ckpt = _reset(f"{fam}/src", f"{fam}/out", f"{fam}/ckpt")
    n_users = 500
    for b in range(N_BATCHES):
        day, hour = 1 + b // 24, b % 24
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            eid = b * n_users * 3
            for u in range(n_users):
                # churn half the user ids every batch: open key space
                uid = u if u % 2 == 0 else b * n_users + u
                for i, etype in enumerate(("view", "click", "purchase")):
                    eid += 1
                    ts = f"2024-01-{day:02d} {hour:02d}:{(3 * (u % 15) + i):02d}:00"
                    fh.write(
                        json.dumps(
                            {
                                "event_id": eid,
                                "user_id": uid,
                                "event_type": etype,
                                "ts": ts,
                            }
                        )
                        + "\n"
                    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_funnel_completions(
            stream, ["view", "click", "purchase"],
            window_hours=1.0, idle_timeout_minutes=120,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    secs = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        sec = p["durationMs"].get("triggerExecution", 0) / 1000.0
        state = (p.get("stateOperators") or [{}])[0]
        _emit(
            fam, p["batchId"], sec,
            state_rows=state.get("numRowsTotal"),
            evicted=state.get("numRowsRemoved"),
        )
        secs.append(sec)
    final_state = (q.lastProgress.get("stateOperators") or [{}])[0]
    emitted = spark.read.parquet(out).count()
    _summary(
        fam, secs,
        final_state_rows=final_state.get("numRowsTotal"),
        completions=emitted,
        expected_completions=N_BATCHES * n_users,
    )


def run_gram_family(spark) -> None:
    """Streaming incremental gram: 24 batches of 1,000 64-dim vectors.
    Non-idempotent addition under the CMS delta-partition contract —
    state files must stay compaction-bounded, per-batch time flat, and
    the final merged gram must have exactly d*(d+1)/2 cells."""
    import numpy as np

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.gram_stream import (
        read_stream_gram,
        stream_gram_accumulate,
    )

    fam = "gram"
    src, state, ckpt = _reset(f"{fam}/src", f"{fam}/state", f"{fam}/ckpt")
    rng = np.random.default_rng(42)
    dim = 64
    for b in range(N_BATCHES):
        mat = rng.normal(size=(1000, dim))
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i, row in enumerate(mat):
                fh.write(
                    json.dumps(
                        {
                            "vec_id": b * 1000 + i,
                            "embedding": [float(x) for x in row],
                        }
                    )
                    + "\n"
                )
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    import glob as _glob

    secs = []
    # one run per file (maxFilesPerTrigger is not honored by foreachBatch
    # availableNow the same way; drive batch-at-a-time via repeated runs)
    t_all = time.time()
    q = stream_gram_accumulate(
        spark, src, schema, state, ckpt, dim=dim, compact_threshold=8,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    total = time.time() - t_all
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        sec = p["durationMs"].get("triggerExecution", 0) / 1000.0
        _emit(fam, p["batchId"], sec)
        secs.append(sec)
    n_parts = len(
        [d for d in os.listdir(state) if d.startswith("__batch_id=")]
    )
    files, bytes_ = _dir_stats(state)
    cells = read_stream_gram(spark, state).count()
    _summary(
        fam, secs or [total],
        state_files=files,
        state_partitions=n_parts,
        merged_cells=cells,
        expected_cells=dim * (dim + 1) // 2,
    )


def run_trend_family(spark) -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.trend_stream import (
        stream_trend_drift,
        trend_from_state,
    )

    fam = "trend"
    src, state, ckpt = _reset(f"{fam}/src", f"{fam}/state", f"{fam}/ckpt")
    schema = T.StructType(
        [
            T.StructField("score", T.LongType()),
            T.StructField("label", T.BooleanType()),
        ]
    )
    secs = []
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH):
                s_val = (i * 31 + b) % 8
                fh.write(
                    json.dumps(
                        {"score": s_val, "label": (i % (s_val + 2)) == 0}
                    )
                    + "\n"
                )
        t0 = time.time()
        q = stream_trend_drift(
            spark, src, schema, state, ckpt, trigger_once=True,
            compact_threshold=8,
        )
        q.awaitTermination()
        apply_sec = time.time() - t0
        t1 = time.time()
        trend_from_state(spark, state).collect()
        read_sec = time.time() - t1
        files, size = _dir_stats(state)
        _emit(
            fam, b, apply_sec,
            read_sec=round(read_sec, 3),
            state_files=files, state_kb=round(size / 1e3, 1),
        )
        secs.append(apply_sec + read_sec)
    _summary(fam, secs, final_state_files=_dir_stats(state)[0])


def run_neardup_family(spark) -> None:
    """Streaming MinHash-LSH near-dup gate: 24 batches of docs where ~25%
    of each batch near-dups earlier batches (re-sent bodies with one word
    changed) and the rest is fresh. The band store must grow only with
    ACCEPTED docs (so growth flattens as the dup share repeats), state
    files stay compaction-bounded, per-batch time flat."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.neardup_stream import (
        stream_neardup_ingest,
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        live_state,
    )

    fam = "neardup"
    src, store, corpus, ckpt = _reset(
        f"{fam}/src", f"{fam}/store", f"{fam}/corpus", f"{fam}/ckpt"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    n_docs = max(ROWS_PER_BATCH // 20, 50)  # text docs are heavier rows

    def body(b: int, i: int) -> str:
        if i % 4 == 0 and b > 0:
            # near-dup of an earlier batch's doc: same body, one word off
            ob, oi = (b - 1), (i + 1) % n_docs
            return (
                f"document body {ob} {oi} " +
                " ".join(f"w{(oi * 7 + j) % 97}" for j in range(20)) +
                " tailvariant"
            )
        return (
            f"document body {b} {i} " +
            " ".join(f"w{(i * 7 + j) % 97}" for j in range(20))
        )

    secs = []
    for b in range(N_BATCHES):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(n_docs):
                fh.write(
                    json.dumps(
                        {"doc_id": b * 100000 + i, "text": body(b, i)}
                    )
                    + "\n"
                )
        t0 = time.time()
        q = stream_neardup_ingest(
            spark, src, schema, store, corpus, ckpt, trigger_once=True,
            compact_threshold=8,
        )
        q.awaitTermination()
        apply_sec = time.time() - t0
        accepted = live_state(spark, store).select("doc_id").distinct().count()
        files, size = _dir_stats(store)
        _emit(
            fam, b, apply_sec,
            accepted_docs=accepted,
            state_files=files, state_kb=round(size / 1e3, 1),
        )
        secs.append(apply_sec)
    _summary(fam, secs, final_state_files=_dir_stats(store)[0])


def run_pagehinkley_family(spark) -> None:
    """Streaming Page-Hinkley monitor: 24 batches of purchase events over
    an advancing-but-overlapping day window (late arrivals re-touch old
    days). State is the per-day cents grid — growth must be bounded by
    the DAY SPAN, not the batch count; per-batch time flat."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.pagehinkley_stream import (
        ph_from_state,
        stream_page_hinkley,
    )

    fam = "pagehinkley"
    src_d, state, ckpt = _reset(f"{fam}/src", f"{fam}/state", f"{fam}/ckpt")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    secs = []
    for b in range(N_BATCHES):
        with open(os.path.join(src_d, f"b{b:03d}.json"), "w") as fh:
            for i in range(ROWS_PER_BATCH):
                day = (b + i) % 28 + 1
                fh.write(
                    json.dumps(
                        {
                            "ts": f"2025-04-{day:02d}T08:{i % 60:02d}:00",
                            "event_type": (
                                "purchase" if i % 3 != 2 else "view"
                            ),
                            "value": 1.0 + (b % 5) * 0.2 + (i % 7) * 0.1,
                        }
                    )
                    + "\n"
                )
        t0 = time.time()
        q = stream_page_hinkley(
            spark, src_d, schema, state, ckpt, trigger_once=True,
            compact_threshold=8,
        )
        q.awaitTermination()
        apply_sec = time.time() - t0
        t1 = time.time()
        n_days = ph_from_state(spark, state).count()
        read_sec = time.time() - t1
        files, size = _dir_stats(state)
        _emit(
            fam, b, apply_sec,
            read_sec=round(read_sec, 3), n_days=n_days,
            state_files=files, state_kb=round(size / 1e3, 1),
        )
        secs.append(apply_sec + read_sec)
    _summary(fam, secs, final_state_files=_dir_stats(state)[0])


FAMILIES = {
    "pipeline-flat": lambda s: run_pipeline_family(s, partitioned=False),
    "pipeline-part": lambda s: run_pipeline_family(s, partitioned=True),
    "sessionize": run_sessionize_family,
    "sessionize-timeout": lambda s: run_sessionize_family(s, idle_timeout=1),
    "join": run_join_family,
    "ks": run_ks_family,
    "cms": run_cms_family,
    "anomaly": run_anomaly_family,
    "hll": run_hll_family,
    "quantile": run_quantile_family,
    "bloom": run_bloom_family,
    "ingest-dedup": run_ingest_dedup_family,
    "trending": run_trending_family,
    "windowed": run_windowed_family,
    "wm-dedup": run_wm_dedup_family,
    "session-agg": run_session_agg_family,
    "funnel": run_funnel_family,
    "gram": run_gram_family,
    "trend": run_trend_family,
    "neardup": run_neardup_family,
    "pagehinkley": run_pagehinkley_family,
}


def main() -> None:
    wanted = sys.argv[1:] or list(FAMILIES)
    spark = get_spark(shuffle_partitions=8)
    for name in wanted:
        FAMILIES[name](spark)


if __name__ == "__main__":
    main()
