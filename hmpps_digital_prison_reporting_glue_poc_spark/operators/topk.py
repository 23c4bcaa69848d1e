"""Shuffle-pruned top-k per group.

The naive ``row_number() over (partition by g order by v) <= k`` shuffles
EVERY row of every group to the window task. At 100 TB that is the whole
fact table through the network to keep k rows per key. ``topk_per_group``
cuts the shuffled volume to ≤ partitions × k rows per group by taking a
local top-k inside each input partition first (an Arrow-batched pandas
pass — no shuffle, no state), then running the exact window on the
pruned remainder. Any row outside its partition's local top-k cannot be
in the global top-k, so the result is exactly the naive window's —
verified against it in tests.

Use when k << group size. For k near the group size the pruning pass is
pure overhead; use the plain window.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    keys: list[str],
    order_cols: str | list[str],
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Exact top-k rows per key group by ``order_cols`` (pass trailing
    tie-break columns — e.g. the primary key — to make ranks
    deterministic). Output carries a ``rank`` column (1-based)."""
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def local_prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # dropna=False: the exact window keeps null-key groups, so the
            # prune must too (pandas drops them by default).
            yield (
                pdf.sort_values(order_cols, ascending=ascending)
                .groupby(keys, sort=False, dropna=False)
                .head(k)
            )

    pruned = df.mapInPandas(local_prune, schema=df.schema)
    order = [
        F.col(c).asc() if ascending else F.col(c).desc() for c in order_cols
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def heavy_hitter_tokens(
    df: DataFrame,
    text_col: str = "text",
    min_share: float = 0.01,
    capacity: int | None = None,
) -> DataFrame:
    """Exact frequent-token detection with a bounded-shuffle sketch:
    Misra-Gries summaries per Arrow batch, merged, then an EXACT recount
    of the surviving candidates — so the output is precisely the tokens
    whose corpus share is >= ``min_share``, but the corpus-wide shuffle
    moves only sketch rows (<= batches x capacity) plus the candidate
    equi-join, never a full token groupBy.

    Correctness argument (Misra-Gries / mergeable-summaries): a batch
    summary truncated to ``capacity`` undercounts any token by at most
    N_batch/(capacity+1); summed over batches the total undercount is
    <= N/(capacity+1). With the default ``capacity = ceil(8/min_share)``
    a token at the threshold keeps a positive merged count, so the
    candidate set has NO false negatives; false positives are removed by
    the exact recount. The result is therefore exact and
    partition-independent — which is what makes a hard DuckDB oracle
    possible for a sketch-based operator.

    Returns (token, n_occurrences, share), exact values.
    """
    from pyspark.sql import types as T

    if capacity is None:
        capacity = int(8.0 / min_share) + 1

    toks = df.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
        ).alias("token")
    )

    sk_schema = T.StructType(
        [
            T.StructField("token", T.StringType()),
            T.StructField("mg_count", T.LongType()),
        ]
    )

    def mg_sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            counts = pdf["token"].value_counts()  # exact batch histogram
            if len(counts) > capacity:
                # Misra-Gries truncation: subtract the (capacity+1)-th
                # largest count, keep strictly positive — the canonical
                # capacity-bounded summary of this batch's stream.
                cut = int(counts.iloc[capacity])
                counts = counts.iloc[:capacity] - cut
                counts = counts[counts > 0]
            if counts.empty:
                continue
            yield pd.DataFrame(
                {
                    "token": counts.index.to_numpy(),
                    "mg_count": counts.to_numpy("int64"),
                }
            )

    merged = (
        toks.mapInPandas(mg_sketch, schema=sk_schema)
        .groupBy("token")
        .agg(F.sum("mg_count").alias("__mg"))
        .filter(F.col("__mg") > 0)
        .select("token")
    )

    total = toks.agg(F.count(F.lit(1)).alias("__total"))
    return (
        toks.join(F.broadcast(merged), on="token")  # exact recount,
        .groupBy("token")                           # candidates only
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("n_occurrences").cast("double")
            >= F.lit(min_share) * F.col("__total").cast("double")
        )
        .select(
            "token",
            "n_occurrences",
            (
                F.col("n_occurrences").cast("double")
                / F.col("__total").cast("double")
            ).alias("share"),
        )
    )
