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
