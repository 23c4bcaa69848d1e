"""Store-growth series for the streaming near-dup ingest gate (r9
verdict task 3): per-BATCH cost of ``neardup_stream`` as the accepted
corpus (the persistent band store) grows 1x -> 10x -> 100x, with the
batch itself held FIXED.

The claim under test is the module's own cost contract
(streaming/neardup_stream.py): each micro-batch costs one
shingle->minhash aggregation over the batch plus one equi-join probe
against the store's band table — so per-batch time must be governed by
BATCH size, with only a weakly-growing term from the store side (the
band table is 3 narrow columns, linear in accepted docs; at 100 TB the
upgrade path is bucketing the compacted store on band_key so the probe
join reuses the store's layout instead of reshuffling it per batch).

Store rungs come from the scale-ladder corpora (scripts/scale_ladder.py
must have built .scale/ladder_{10,100} first): the documents table at
1x / 10x / 100x of sf0.1 (5k / 50k / 500k docs), banded with the exact
``doc_band_table`` parameters the stream uses and written in the
stream's ``__batch_id``-partitioned state layout. The measured step is
the stream's ``apply_batch`` body on a fixed 500-doc batch: live_state
read -> ``neardup_against_store`` gate -> survivors + band rows written
to parquet sinks. Each rung is measured ``REPS`` times; the REPORT line
carries the min (the contention-free estimate) and
alpha = log10(t_100x / t_10x).

Usage: python scripts/neardup_store_growth.py
Writes state to .scale/neardup_growth/ (gitignored); prints one JSON
line per measurement and a final REPORT line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.path.join(REPO, ".scale", "neardup_growth")
RUNGS = {
    1: BASE,
    10: os.path.join(REPO, ".scale", "ladder_10"),
    100: os.path.join(REPO, ".scale", "ladder_100"),
}
BATCH_DOCS = 500
REPS = 3
# the stream's defaults (stream_neardup_ingest signature)
BAND_KW = dict(num_hashes=8, rows_per_band=2, shingle_k=3)


def _build_store(spark, docs_path: str, store_path: str) -> int:
    """Band the rung's documents with the stream's parameters and write
    them in the stream's state layout (one committed __batch_id=0
    partition — what a long-running ingest's compacted store looks
    like)."""
    from pyspark.sql import functions as F

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import doc_band_table

    done = os.path.join(store_path, "_GROWTH_DONE")
    if os.path.exists(done):
        with open(done, encoding="utf-8") as fh:
            return int(fh.read().strip())
    shutil.rmtree(store_path, ignore_errors=True)
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    bands = doc_band_table(docs, "doc_id", "text", **BAND_KW)
    (
        bands.withColumn("__batch_id", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("__batch_id")
        .parquet(store_path)
    )
    with open(done, "w", encoding="utf-8") as fh:
        fh.write(f"{n_docs}\n")
    return n_docs


def _fixed_batch(spark):
    """A fixed 500-doc batch of FRESH content (distinct per-doc marker
    tokens so the gate does real probe work without the batch being a
    wholesale near-dup of the store)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    return (
        docs.orderBy("doc_id")
        .limit(BATCH_DOCS)
        .select(
            (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"),
            F.concat(
                F.col("text"),
                F.lit(" growthbatch tok"),
                F.col("doc_id").cast("string"),
            ).alias("text"),
        )
    )


def _measure_batch(spark, store_path: str, sink_dir: str) -> float:
    """The stream's apply_batch body (minus checkpointing): live store
    read, gate, survivors + band rows to parquet sinks."""
    from pyspark.sql import functions as F

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import (
        neardup_against_store,
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import live_state

    batch_df = _fixed_batch(spark)
    shutil.rmtree(sink_dir, ignore_errors=True)
    t0 = time.time()
    store = live_state(spark, store_path).drop("__batch_id")
    kept = neardup_against_store(
        batch_df, store, id_col="doc_id", text_col="text",
        broadcast_incoming=True,  # the stream's inverted probe (r11)
        **BAND_KW
    ).persist()
    try:
        survivors = batch_df.join(kept.select("doc_id").distinct(), on="doc_id")
        for frame, sub in ((survivors, "corpus"), (kept, "bands")):
            (
                frame.withColumn("__batch_id", F.lit(1))
                .write.mode("overwrite")
                .partitionBy("__batch_id")
                .parquet(os.path.join(sink_dir, sub))
            )
    finally:
        kept.unpersist()
    return time.time() - t0


def main() -> None:
    from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark

    spark = get_spark(app_name="neardup_store_growth")
    os.makedirs(WORK, exist_ok=True)
    report: dict[str, dict] = {}
    for factor, src in RUNGS.items():
        docs_path = os.path.join(src, "documents.parquet")
        if not os.path.exists(docs_path):
            print(f"missing rung corpus {docs_path} — run scale_ladder.py first")
            sys.exit(2)
        store_path = os.path.join(WORK, f"store_{factor}x")
        t0 = time.time()
        n_docs = _build_store(spark, docs_path, store_path)
        print(
            json.dumps(
                {
                    "build_store": factor,
                    "docs": n_docs,
                    "sec": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )
    sink_dir = os.path.join(WORK, "sink")
    # warm-up: one un-measured batch so session/codec setup does not land
    # on the 1x rung
    _measure_batch(spark, os.path.join(WORK, "store_1x"), sink_dir)
    times: dict[int, float] = {}
    for factor in RUNGS:
        store_path = os.path.join(WORK, f"store_{factor}x")
        runs = []
        for rep in range(REPS):
            sec = _measure_batch(spark, store_path, sink_dir)
            runs.append(round(sec, 2))
            print(
                json.dumps(
                    {"store_rung": factor, "rep": rep, "sec": runs[-1]}
                ),
                flush=True,
            )
        times[factor] = min(runs)
    report["neardup_batch_vs_store"] = {
        "batch_docs": BATCH_DOCS,
        "sec_store_1x": times[1],
        "sec_store_10x": times[10],
        "sec_store_100x": times[100],
        "alpha_10_100": round(
            math.log10(max(times[100], 1e-3) / max(times[10], 1e-3)), 2
        ),
    }
    print("REPORT " + json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
