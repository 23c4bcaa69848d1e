"""Streaming HyperLogLog: continuous distinct-count over an unbounded
stream with kilobytes of state.

The batch twin (``operators/topk.hll_distinct``) sketches a static
corpus; here the register table lives in storage and every micro-batch
MAX-MERGES its own registers into it — the defining property of HLL (and
why it beats exact distinct at stream scale: state is m registers
forever, not one entry per key). The merged table after N batches is
bit-identical to sketching the union in one pass, which the pytest
batch/stream parity test pins exactly.

Retry contract: the register store is partitioned by ``__batch_id`` with
dynamic overwrite and the merge reads every partition EXCEPT the
replaying batch's own — an at-least-once replay recomputes the same
merged registers instead of double-merging (max-merge is idempotent
anyway; the exclusion keeps the store's lineage clean). Because every
partition holds the FULL merged table, all but the newest two are
redundant and are deleted after each write (round-6): the store is
O(2·m) registers regardless of stream lifetime, and a stale-attempt /
fresh-checkpoint sweep keeps reruns from inheriting dead state.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def stream_hll_distinct(
    spark,
    source_path: str,
    schema,
    registers_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    m_registers: int = 256,
    trigger_once: bool = True,
    on_batch=None,
):
    """Stream records from ``source_path``; per micro-batch, sketch the
    batch's keys (same md5 register/rank derivation as the batch
    operator) and max-merge into the register store. Read the estimate
    back with :func:`read_hll_estimate`."""
    raw = spark.readStream.schema(schema).json(source_path)

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        sweep_stale,
    )

    def apply_batch(batch_df, batch_id: int) -> None:
        # Sweep BEFORE the empty-batch early return: a fresh-checkpoint
        # rerun whose batch 0 happens to be empty must still clear the
        # dead run's store, or batch 1+ double-counts it.
        sweep_stale(spark, registers_path, batch_id)
        if batch_df.isEmpty():
            return
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("hll:"), F.col(key_col).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        keyed = batch_df.select(
            (h % m_registers).alias("j"),
            F.floor(h / m_registers).cast("long").alias("w"),
        )
        rho = F.when(
            F.col("w") > 0, F.lit(25) - F.length(F.bin(F.col("w")))
        ).otherwise(F.lit(25))
        batch_regs = keyed.select("j", rho.alias("M")).groupBy("j").agg(
            F.max("M").alias("M")
        )
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(registers_path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        # partition listing, not fs.exists: the sweep can leave the dir
        # existing but EMPTY (batch-0 replay), which a parquet read rejects
        from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
            _partition_ids,
        )
        if _partition_ids(spark, registers_path):
            prior = (
                spark.read.parquet(registers_path)
                .filter(F.col("__batch_id") != batch_id)
                .drop("__batch_id")
            )
            merged = (
                prior.unionByName(batch_regs)
                .groupBy("j")
                .agg(F.max("M").alias("M"))
            )
        else:
            merged = batch_regs
        (
            merged.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(registers_path)
        )
        # Every partition holds the FULL merged register table, so all but
        # the newest two are redundant. Keep the two largest PRESENT ids —
        # not "ids > batch_id-2": empty micro-batches advance batch ids
        # without writing a partition, so after a gap (non-empty 5, empty
        # 6-7, non-empty 8) arithmetic would delete partition 5, the only
        # prior full merge; a crash before batch 8's checkpoint commit
        # would then let the replay's sweep_stale delete partition 8 too
        # and lose ALL accumulated state. Keeping the newest present pair
        # preserves a complete prior merge no matter how the ids are
        # spaced. Crash anywhere in the cleanup only leaves extra
        # partitions — max-merge readers are unaffected — so state is
        # O(2·m) registers, not O(batches·m).
        present: list[tuple[int, object]] = []
        for status in fs.listStatus(jpath):
            name = status.getPath().getName()
            if not name.startswith("__batch_id="):
                continue
            try:
                old_id = int(name.split("=", 1)[1])
            except ValueError:
                continue
            present.append((old_id, status.getPath()))
        present.sort(key=lambda t: t[0])
        for _old_id, path in present[:-2]:
            fs.delete(path, True)
        # crash-window hook (see tests/test_stream_crash_replay.py)
        if on_batch is not None:
            on_batch(batch_id)

    writer = (
        raw.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hll_estimate(spark, registers_path: str, m_registers: int = 256):
    """Estimate from the stored register table (latest merged state =
    max over every batch partition), using the batch operator's exact
    integer-denominator formula."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        _partition_ids,
    )

    if _partition_ids(spark, registers_path):
        regs_src = spark.read.parquet(registers_path)
    else:
        # no batch ever wrote (r10 stream fuzz): the batch twin's
        # empty-input contract — all registers absent
        regs_src = spark.createDataFrame(
            [], "j long, M int, __batch_id long"
        )
    regs = regs_src.groupBy("j").agg(F.max("M").alias("M"))
    agg = regs.agg(
        F.sum(F.expr("CAST(shiftleft(1, 25 - M) AS BIGINT)")).alias(
            "S_present"
        ),
        F.count(F.lit(1)).alias("n_present"),
    )
    m = F.lit(m_registers).cast("double")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / m)
    s_total = (
        F.col("S_present")
        + (F.lit(m_registers) - F.col("n_present"))
        * F.lit(1 << 25).cast("long")
    ).cast("double")
    raw_est = alpha * m * m * F.lit(float(1 << 25)) / s_total
    n_zero = (F.lit(m_registers) - F.col("n_present")).cast("double")
    est = F.when(
        (raw_est <= F.lit(2.5) * m) & (n_zero > 0),
        m * F.round(F.log(m / n_zero), 6),
    ).otherwise(raw_est)
    return agg.select(est.alias("hll_estimate"))
