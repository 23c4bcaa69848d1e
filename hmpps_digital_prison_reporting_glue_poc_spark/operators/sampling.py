"""Sampling operators for corpus curation.

``cap_per_group`` is the workhorse of training-data balancing: "at most N
documents per domain/source/language". Done with a window row_number over
a *content-derived* ordering (md5 of a chosen column), it is exactly
reproducible across runs, clusters, engines and partitionings — unlike
``sample()``/``sampleBy()``, whose output depends on partition layout.
One shuffle on the group keys; each group's rows never leave their task.

``stratified_sample`` wraps native ``sampleBy`` (per-stratum Bernoulli
fractions) for the approximate case where throughput matters more than
exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_per_group(
    df: DataFrame,
    keys: list[str],
    n: int,
    order_col: str | None = None,
) -> DataFrame:
    """Keep a deterministic sample of at most ``n`` rows per group.
    Rows are ranked by md5(``order_col``) (pseudo-random but stable and
    engine-portable); ties broken by the value itself. Pass an id or
    content column as ``order_col``; defaults to the first non-key
    column."""
    order_col = order_col or next(c for c in df.columns if c not in keys)
    rank_key = F.md5(F.col(order_col).cast("string"))
    w = Window.partitionBy(*keys).orderBy(rank_key, F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (native ``sampleBy``): approximate
    fraction per key value, single pass, no shuffle."""
    return df.sampleBy(key, fractions, seed)
