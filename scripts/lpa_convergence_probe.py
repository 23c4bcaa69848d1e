"""Measure label-propagation convergence on the bench token-bigram graph
(r12 task 2 pre-measurement): per round, how many vertices changed label.

If the bench graph converges before the fixed 4 rounds, a CC-style
observed convergence witness + early-exit is an exact win; if it never
converges inside the horizon, the extra old-vs-new join per round is pure
cost and the early-exit should NOT land. Measure first (guide §1).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/lpa_convergence_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens
from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize
from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ROUNDS", "6"))
    spark = get_spark(app_name="lpa_probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toked = docs.select(tokens(F.col("text")).alias("__toks"))
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array(F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.expr("array()").cast("array<array<string>>"))
    edges = (
        toked.select(F.explode(grams).alias("__e"))
        .select(F.col("__e")[0].alias("s"), F.col("__e")[1].alias("t"))
        .filter(F.col("s") != F.col("t"))
        .select(F.least("s", "t").alias("a"), F.greatest("s", "t").alias("b"))
        .distinct()
    )
    und = materialize(edges, "lpa_probe_edges_")
    nbrs = und.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    labels = nbrs.select("v").distinct().select("v", F.col("v").alias("lab"))
    w = Window.partitionBy("v").orderBy(F.col("__c").desc(), F.col("lab").asc())
    for r in range(rounds):
        t0 = time.perf_counter()
        counted = (
            nbrs.join(labels.withColumnRenamed("v", "u"), "u")
            .groupBy("v", "lab")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        new_labels = (
            counted.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("v", "lab")
        )
        joined = new_labels.join(
            labels.select("v", F.col("lab").alias("__old")), "v"
        ).select("v", "lab", (F.col("lab") != F.col("__old")).cast("long").alias("__chg"))
        stored = materialize(joined, f"lpa_probe_r{r}_")
        changed = stored.agg(F.sum("__chg")).collect()[0][0]
        labels = stored.drop("__chg")
        print(
            f"round {r + 1}: changed={changed} "
            f"({time.perf_counter() - t0:.2f}s)",
            flush=True,
        )
        if not changed:
            print("CONVERGED")
            break


if __name__ == "__main__":
    main()
