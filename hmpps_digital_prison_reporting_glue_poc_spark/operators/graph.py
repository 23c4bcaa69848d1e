"""Distributed connected components — the transitive-closure step a dedup
pipeline needs between "near-dup pairs" and "dedup groups": LSH/MinHash
emits pairwise edges, but removal decisions need whole clusters (A~B, B~C
means A,B,C are one group even though (A,C) never scored).

Min-label propagation over DataFrames: every vertex starts labelled with
itself; each round it takes the min of its own and its neighbours' labels.
Converges in O(cluster diameter) rounds — near-dup clusters are shallow
(dozens of docs, diameter <~ 5), so this beats the alternating
large-star/small-star scheme (O(log n) rounds but 2 shuffles/round) on the
workloads this engine targets; swap in large-star/small-star if components
with huge diameters ever appear.

Each round is one shuffle (edge-label join + groupBy min). Lineage is cut
every round by materialising labels to a parquet work dir — NOT
``persist()``/``localCheckpoint()``, which poison the local-mode session
(see session.py notes); at cluster scale this write is tiny (|V| rows of
two longs) next to the edge shuffle.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    work_dir: str | None = None,
) -> DataFrame:
    """Return (id, component) for every vertex appearing in ``edges``,
    where ``component`` is the minimum vertex id reachable from ``id``.
    Deterministic. Raises if not converged within ``max_iter`` rounds
    (each round extends reach by one hop, so max_iter bounds the cluster
    diameter the caller expects).

    The result frame is backed by parquet under ``work_dir`` (a fresh temp
    dir by default); intermediate rounds are pruned as the loop advances,
    and only the final round's labels remain on disk.
    """
    spark = edges.sparkSession
    workdir = work_dir or tempfile.mkdtemp(prefix="cc_labels_")
    if work_dir is None:
        # the returned frame lazily reads the final round's parquet, so
        # the dir must outlive this call; reap it at interpreter exit
        atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))

    def materialize(df: DataFrame, i: int) -> DataFrame:
        path = f"{workdir}/iter_{i}"
        df.write.mode("overwrite").parquet(path)
        shutil.rmtree(f"{workdir}/iter_{i - 1}", ignore_errors=True)
        return spark.read.parquet(path)

    sym_path = f"{workdir}/edges"
    sym.write.mode("overwrite").parquet(sym_path)
    sym = spark.read.parquet(sym_path)

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    # Monotone convergence witness: sum(comp) strictly decreases until the
    # fixpoint, so one cheap scalar per round detects termination.
    prev_sum = None
    for i in range(max_iter):
        labels = materialize(labels, i)
        cur_sum = labels.agg(F.sum("comp")).first()[0]
        if cur_sum == prev_sum:
            shutil.rmtree(sym_path, ignore_errors=True)
            return labels
        prev_sum = cur_sum
        nbr_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        labels = labels.join(nbr_min, labels.id == nbr_min.a, "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias(
                "comp"
            ),
        )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def neardup_groups(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Resolve near-dup pairs into groups: every doc mapped to the minimum
    doc id of its connected component (singletons map to themselves)."""
    comp = connected_components(pairs, src=pair_a, dst=pair_b)
    return (
        docs.select(F.col(id_col))
        .join(comp, docs[id_col] == comp.id, "left")
        .select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("component"),
        )
    )
