"""Dataset profiling — the QC pass a pipeline runs before trusting a new
drop of data: per-column null counts, cardinality and value bounds.

Two cardinality modes:

- ``exact=False`` (default — the 100 TB path): ONE scan of the table, all
  statistics in a single ``agg`` with HLL ``approx_count_distinct``. No
  Catalyst Expand, no row multiplication; partial aggregation makes the
  shuffle one row per partition.
- ``exact=True``: exact distinct counts WITHOUT the Expand blow-up of
  multi-column ``countDistinct`` (which multiplies every input row once
  per profiled column before the hash aggregate). Each column is profiled
  from its own pruned single-column scan via groupBy(col) -> two-stage
  aggregation: the shuffle carries only the per-partition distinct values
  of that column, and parquet column pruning means the k scans together
  read the same bytes as one k-column scan. Exact results, no Expand.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _profile_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    frames = []
    for c in cols:
        grouped = df.select(c).groupBy(c).agg(F.count(F.lit(1)).alias("__cnt"))
        frames.append(
            grouped.agg(
                F.lit(c).alias("column"),
                F.sum("__cnt").cast("long").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col(c).isNull(), F.col("__cnt"))), F.lit(0)
                )
                .cast("long")
                .alias("n_null"),
                F.count(c).cast("long").alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            )
        )
    return reduce(DataFrame.unionByName, frames)


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Return one row per profiled column:
    (column, n_rows, n_null, n_distinct, min_value, max_value) with the
    bounds rendered as strings so heterogeneous column types coexist."""
    cols = cols or df.columns
    if exact:
        return _profile_exact(df, cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"__nn_{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
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


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every
    distinct combination appearing fewer than ``k`` times is a
    re-identification risk — the governance check a dataset passes
    before release.

    One groupBy on the quasi-identifier tuple (partial-agg friendly);
    returns every combination with its count and a ``risky`` verdict —
    callers suppress or generalize the risky rows. Deterministic,
    shuffle = the one the problem requires.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("risky", F.col("n_rows") < k)
    )


def json_key_profile(df: DataFrame, json_col: str) -> DataFrame:
    """Schema-on-read profiling of a semi-structured JSON column: which
    keys occur, how often, and what scalar type their values look like —
    the ingest-time inference every lake pipeline runs before promoting a
    payload field to a real column.

    Keys explode from ``from_json`` map parsing (one pass, columnar);
    type classification is REGEX on the extracted scalar string, not
    TRY_CAST, because the two engines' cast leniency differs (whitespace
    trimming, scientific notation) while anchored regex agrees exactly.
    One map-side-combinable groupBy on the key.
    Returns (key, n_rows, n_int, n_float, n_bool, n_distinct_values).
    """
    kv = df.select(
        F.explode(
            F.from_json(F.col(json_col), "map<string,string>")
        ).alias("key", "val")
    )
    is_int = F.col("val").rlike("^-?[0-9]+$")
    is_float = F.col("val").rlike("^-?[0-9]*\\.[0-9]+$")
    is_bool = F.col("val").isin("true", "false")
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(is_int, 1).otherwise(0)).cast("long").alias("n_int"),
        F.sum(F.when(is_float, 1).otherwise(0)).cast("long").alias("n_float"),
        F.sum(F.when(is_bool, 1).otherwise(0)).cast("long").alias("n_bool"),
        F.countDistinct("val").cast("long").alias("n_distinct_values"),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 5,
) -> DataFrame:
    """l-diversity audit — the companion check to ``k_anonymity_audit``:
    a quasi-identifier group can be large (k-anonymous) yet still leak
    the sensitive attribute if everyone in it shares one value. Each QI
    combination reports its row count, the EXACT number of distinct
    sensitive values, and whether it meets the ``l`` bar.

    One groupBy with an exact count-distinct (Spark's two-phase
    partial-distinct expansion: dedup map-side on (QI, sensitive), then
    count — no driver state, no approximation, because a privacy
    verdict from an approximate sketch is not a verdict). Shuffle = the
    one the problem requires, on the QI tuple.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(sensitive_col)
            .cast("long")
            .alias("n_distinct_sensitive"),
        )
        .withColumn("diverse", F.col("n_distinct_sensitive") >= l)
    )
