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
