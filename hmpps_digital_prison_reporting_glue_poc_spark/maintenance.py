"""Table maintenance: small-file compaction and partition hygiene.

The reference's README self-diagnoses "Large number of small files not
efficient" and "Large number of generations in delta versions not
efficient" (reference README.md:53-54). This module is the rebuild's
answer for plain-parquet layouts; with delta-spark installed, OPTIMIZE /
VACUUM take over.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.catalog import Catalog

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _table_bytes(spark: SparkSession, df: DataFrame) -> int:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        path = jvm.org.apache.hadoop.fs.Path(f)
        fs = path.getFileSystem(conf)
        total += fs.getFileStatus(path).getLen()
    return total


def compact_table(
    spark: SparkSession,
    catalog: Catalog,
    name: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite a catalog table into ~target-sized files. Returns the new
    file count. Partitioned tables are rewritten per partition layout
    (partitionBy preserved) so pruning survives compaction."""
    spec = catalog.get(name)
    df = catalog.read(spark, name)
    total = _table_bytes(spark, df)
    n_files = max(1, math.ceil(total / target_file_bytes))
    # Break lineage from the files being overwritten.
    compacted = df.repartition(n_files).localCheckpoint(eager=True)
    writer = compacted.write.format(spec.format).mode("overwrite")
    if spec.partition_by:
        writer = writer.partitionBy(*spec.partition_by)
    writer.save(spec.path)
    return len(catalog.read(spark, name).inputFiles())


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered on the Z-order (Morton) curve of two numeric
    columns, so parquet row-group/file min-max stats stay narrow on BOTH
    columns and scans filtering either one skip most files.

    A plain sort clusters only its leading column; interleaving the bits
    of both (after min-max scaling each into ``bits``-bit rank space)
    gives locality in both dimensions. The z-value is a pure JVM
    expression; the layout cost is one range repartition + in-partition
    sort — the standard price of any clustered rewrite. Min/max scaling
    (not quantiles) keeps it a two-pass job: one tiny agg, one write.
    """
    if len(cols) != 2:
        raise ValueError("zorder_write interleaves exactly two columns")
    a, b = cols
    stats = df.agg(
        F.min(a).alias("amin"), F.max(a).alias("amax"),
        F.min(b).alias("bmin"), F.max(b).alias("bmax"),
    ).first()
    top = float((1 << bits) - 1)

    def scaled(c: str, lo, hi) -> F.Column:
        span = float(hi) - float(lo) if hi is not None else 0.0
        if not span:
            return F.lit(0).cast("long")
        return F.least(
            F.lit(int(top)).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                ((F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span) * top)
                .cast("long"),
            ),
        )
    xa = scaled(a, stats["amin"], stats["amax"])
    xb = scaled(b, stats["bmin"], stats["bmax"])
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftleft(F.shiftright(xa, i).bitwiseAND(F.lit(1)), 2 * i))
            + (F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
