"""Dataset profiling — the QC pass a pipeline runs before trusting a new
drop of data: per-column null counts, cardinality and value bounds, in
ONE scan of the table.

All per-column statistics are computed in a single ``agg`` (so the input
is read once no matter how many columns), then the one-row result is
exploded to long format driver-side-free. Exact ``countDistinct`` on many
columns multiplies the aggregation via Catalyst's Expand operator — fine
for QC on a sample or a partition; pass ``exact=False`` to switch to HLL
``approx_count_distinct`` (single pass, no Expand) for full-corpus runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Return one row per profiled column:
    (column, n_rows, n_null, n_distinct, min_value, max_value) with the
    bounds rendered as strings so heterogeneous column types coexist."""
    cols = cols or df.columns
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"__nn_{c}"))
        aggs.append(distinct(c).alias(f"__nd_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__mx_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
