"""Salted join parity, bucketed shuffle-free joins, small-file compaction."""

import os

import pytest
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.catalog import Catalog, TableSpec
from hmpps_digital_prison_reporting_glue_poc_spark.maintenance import compact_table
from hmpps_digital_prison_reporting_glue_poc_spark.operators.joins import (
    bucketed_write,
    salted_join,
)


def test_salted_join_matches_plain_join(spark):
    """Salting must not change results — build a skewed left side (90% one
    key) and diff against the plain join."""
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rval")
    )
    plain = left.join(right, on=["k"]).select("k", "payload", "rval")
    salted = salted_join(left, right, on=["k"], salt_buckets=8).select(
        "k", "payload", "rval"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    assert salted.count() == plain.count() == 900  # all hot-key rows match


def test_salted_join_left_outer(spark):
    left = spark.range(10).select(F.col("id").alias("k"))
    right = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    out = salted_join(left, right, on=["k"], how="left", salt_buckets=4)
    rows = {r.k: r.v for r in out.collect()}
    assert len(rows) == 10 and rows[9] is None and rows[3] == "x"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    a = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("a"))
    b = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") % 3).alias("b"))
    bucketed_write(a, "bt_a", ["k"], num_buckets=8, sort_cols=["k"])
    bucketed_write(b, "bt_b", ["k"], num_buckets=8, sort_cols=["k"])
    # Tiny test tables would take the (also correct) broadcast path; force
    # the sort-merge planner branch that a 100 TB fact-fact join would use.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_a").join(spark.table("bt_b"), on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "same-bucketing join must not shuffle either side"
        )
        assert joined.count() == 5000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_compact_table_reduces_file_count(spark, tmp_path):
    path = os.path.join(str(tmp_path), "shattered")
    # 40 tiny files (the reference's self-reported pathology)
    spark.range(4000).repartition(40).write.parquet(path)
    cat = Catalog()
    cat.register(TableSpec("shattered", path))
    before = len(spark.read.parquet(path).inputFiles())
    after = compact_table(spark, cat, "shattered")
    assert before == 40 and after < 5
    assert spark.read.parquet(path).count() == 4000


def test_compact_preserves_partition_layout(spark, tmp_path):
    path = os.path.join(str(tmp_path), "parts")
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("p"), F.col("id").alias("v")
    )
    df.repartition(20).write.partitionBy("p").parquet(path)
    cat = Catalog()
    cat.register(TableSpec("parts", path, partition_by=["p"]))
    compact_table(spark, cat, "parts")
    dirs = {d for d in os.listdir(path) if d.startswith("p=")}
    assert dirs == {"p=0", "p=1", "p=2"}
    assert spark.read.parquet(path).count() == 1000


def test_zorder_write_narrows_file_stats_on_both_columns(spark, tmp_path):
    """Z-order clustering: per-file value ranges on BOTH interleaved
    columns must be far narrower than an unclustered write, so min-max
    data skipping works for either predicate."""
    from hmpps_digital_prison_reporting_glue_poc_spark.maintenance import zorder_write

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.floor(F.col("id") / 64)).alias("y"),
        F.col("id").alias("payload"),
    )
    # shuffle row order so the input has no pre-existing locality
    df = df.orderBy(F.hash("payload"))

    plain_path = str(tmp_path / "plain")
    z_path = str(tmp_path / "zorder")
    df.repartition(16).write.parquet(plain_path)
    zorder_write(df, ["x", "y"], z_path, n_files=16, bits=8)

    def mean_span(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        spans = [r.span for r in per_file.collect()]
        return sum(spans) / len(spans)

    for col, domain in (("x", 63.0), ("y", 63.0)):
        z_span = mean_span(z_path, col)
        plain_span = mean_span(plain_path, col)
        assert plain_span > 0.9 * domain, "random write should span the domain"
        assert z_span < 0.45 * domain, (
            f"z-ordered files must be narrow on {col}: {z_span} vs {plain_span}"
        )


def test_salted_join_rejects_right_preserving_modes(spark):
    # Replicated right side would duplicate unmatched right rows for
    # right/full joins — must be an explicit error, not silent duplicates.
    left = spark.range(10).withColumnRenamed("id", "k")
    right = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, on=["k"], how=how)
