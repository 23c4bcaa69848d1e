"""Incremental aggregate maintenance — materialized-view-style rollups
that absorb new data without touching the history.

At 100 TB you cannot re-aggregate the full fact table per batch; you keep
a compact partial-aggregate table (keys + mergeable states) and fold each
increment into it. Sums/counts/min/max are algebraic: merging partials is
just re-summing them, so the per-batch cost is shuffle(|agg| + |batch|)
instead of scan(|history|). avg is derived at read time from sum/count —
never stored, because stored averages don't merge.

This is the aggregate-side twin of the CDC merge (operators/cdc.py): both
turn "recompute the world" (the reference's full-rewrite pattern,
README.md:56) into "fold the delta".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_alias: str = "n_rows",
) -> DataFrame:
    """Collapse a raw batch into mergeable partial-aggregate states:
    exact DECIMAL(12,2) sums per ``sum_cols`` (named ``sum_<col>``),
    min/max per column, and a row count."""
    aggs = [F.count(F.lit(1)).alias(count_alias)]
    for c in sum_cols:
        aggs.append(F.sum(F.col(c).cast("decimal(12,2)")).alias(f"sum_{c}"))
        aggs.append(F.min(F.col(c)).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"max_{c}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_partial_aggs(
    existing: DataFrame, increment: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold an increment's partials into the existing partial table. Both
    inputs must share the ``partial_agg`` column layout; the output keeps
    it, so merging is closed (re-mergeable forever)."""
    merged_aggs = []
    for field in existing.schema.fields:
        if field.name in keys:
            continue
        if field.name.startswith(("sum_", "n_")):
            merged_aggs.append(F.sum(field.name).alias(field.name))
        elif field.name.startswith("min_"):
            merged_aggs.append(F.min(field.name).alias(field.name))
        elif field.name.startswith("max_"):
            merged_aggs.append(F.max(field.name).alias(field.name))
        else:
            raise ValueError(
                f"non-mergeable column {field.name!r}: partial tables may "
                "only hold sum_/min_/max_/n_ states"
            )
    return (
        existing.unionByName(increment, allowMissingColumns=False)
        .groupBy(*keys)
        .agg(*merged_aggs)
    )


def partial_moments(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Mergeable EXACT second-moment state per key: (n, s, ss) over the
    ``scale``-quantized integer grid — the incremental twin of
    ``behavior.user_value_zscores``'s per-user statistics. Integer sums
    merge associatively with zero error (the float two-pass/Welford
    alternatives accumulate merge-order-dependent drift), so a 100 TB
    pipeline maintains per-key mean/variance/z-scores by folding each
    batch's partials into the state table — never rescanning history."""
    qv = F.round(F.col(value_col).cast("double") * scale, 0).cast("long")
    # per-term DECIMAL(38,0) casts BEFORE the sums: qv^2 is ~1e12 for
    # cent-quantized values, so a long accumulator silently wraps within
    # ~1e7 rows per key (non-ANSI Spark); decimal sums are exact at any
    # history size and stay closed under merge_partial_moments.
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_m"),
        F.sum(qv.cast("decimal(38,0)")).alias("s_m"),
        F.sum((qv * qv).cast("decimal(38,0)")).alias("ss_m"),
    )


def merge_partial_moments(
    existing: DataFrame, increment: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold an increment's moment partials into the existing state —
    closed under merging (output layout == input layout), exact."""
    return (
        existing.unionByName(increment, allowMissingColumns=False)
        .groupBy(*keys)
        .agg(
            F.sum("n_m").alias("n_m"),
            F.sum("s_m").alias("s_m"),
            F.sum("ss_m").alias("ss_m"),
        )
    )


def finalize_moments(
    partials: DataFrame, keys: list[str], scale: int = 100
) -> DataFrame:
    """Derive mean / variance / stddev from the exact integer state at
    read time (never stored — derived values don't merge). Uses the same
    single-rounding identities as ``user_value_zscores``:
    var = (n*ss - s^2) / n^2 on the quantized grid."""
    n_d = F.col("n_m").cast("double")
    var_num = (
        F.col("n_m") * F.col("ss_m") - F.col("s_m") * F.col("s_m")
    ).cast("double")
    mean = F.col("s_m").cast("double") / n_d / F.lit(float(scale))
    variance = var_num / (n_d * n_d) / F.lit(float(scale * scale))
    return partials.select(
        *keys,
        F.col("n_m").alias("n_rows"),
        mean.alias("mean"),
        variance.alias("variance"),
        F.sqrt(variance).alias("stddev"),
    )
