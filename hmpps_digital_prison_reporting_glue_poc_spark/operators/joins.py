"""Join strategies for scale: salted joins for skew, bucketed co-located
joins to eliminate the shuffle entirely.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
``salted_join`` is the explicit tool for the pathological case AQE can't
fix — a single hot key whose rows exceed one executor's memory on the
build side of an aggregation-free join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: the (skewed) left side gets a
    deterministic salt in [0, salt_buckets) derived from a hash of the full
    row, and the right side is replicated once per salt value — so a hot
    key's rows spread over ``salt_buckets`` tasks instead of one.

    Deterministic (hash of row content, not rand()) so retries and
    re-executions produce identical partitioning. Result is exactly the
    plain join's result — verified by tests against the unsalted join.

    Use when: one key holds >~1 partition of data AND the right side is too
    big to broadcast. Otherwise prefer the plain join + AQE.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    salted_left = left.withColumn("__salt", salt)
    salted_right = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return salted_left.join(salted_right, on=on + ["__salt"], how=how).drop("__salt")


def bucketed_write(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Write a table bucketed (and optionally sorted) on its join key.
    Two tables bucketed the same way join with ZERO shuffle — the physical
    plan has no Exchange on either side (asserted in tests/test_plans.py).
    At 100 TB this is the difference between re-shuffling the fact table on
    every join and never shuffling it at all."""
    spark = df.sparkSession
    # Drop stale metadata AND any orphaned location (a crashed prior run
    # can leave the directory behind without catalog metadata).
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    loc = jvm.org.apache.hadoop.fs.Path(warehouse, table_name.lower())
    fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)
    writer = df.write.format(fmt).mode("overwrite").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
