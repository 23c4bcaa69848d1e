"""Quantile-level drift localization over the exact cent grid (round
11, wave 117) — WHERE in the distribution did the two populations
diverge, the robust-statistics complement of the scalar drift
functionals (KS/W1 say "how far"; these say "which quantiles moved"):

- ``decile_shift``: the shift function evaluated at the nine deciles —
  per k in 1..9 the exact type-1 (lower) sample quantile of each side
  and their difference. A location shift moves every decile equally; a
  scale change fans the tails out while the median holds; a tail-only
  contamination moves q90 alone. EXACT: the k-th decile is
  min{v : F_s(v) >= ceil(k*n_s/10)}, a pure integer threshold probe of
  the cumulative count grid — no interpolation, no float before the
  final cent-to-unit divide.

- ``trimmed_mean_two_sample``: 10%-trimmed means per side and their
  difference — the robust location-drift number a single fat-fingered
  outlier batch cannot move. EXACT including partial tie blocks: with
  t = floor(n/10) trimmed per tail, the trimmed sum is
  S - S_low(t) - S_high(t) where S_low(t) takes min(c(v), t - below(v))
  observations from each ascending tie block (integer arithmetic on
  the grid), so a block straddling the trim boundary contributes
  exactly its in-range members.

No counterpart exists in the reference (a 1.4k-LoC Glue CDC pipeline
with no statistics code, ``/root/reference/src``).

Scale shape: both operators are one pass over the value-domain-bounded
count grid (the materialized ``_ecdf_counts`` rollup), with one-row
totals broadcast back; the decile probe adds a 9-row literal frame
cross-joined onto the grid (9x grid rows, still domain-bounded), and
every aggregation is a plain map-side-combining groupBy — no windows
beyond the shared two-level bucketed cumulative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.drift import (
    _ecdf_counts,
    _grid_from_counts,
)


def decile_shift(
    df: DataFrame, side, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Shift function at the nine deciles between the two value
    populations. Returns one row per decile k in 1..9:
    (decile, q_left, q_right, shift) — quantiles in value units,
    shift = q_right - q_left; NULLs where a side is empty."""
    counts = _ecdf_counts(df, side, value_col, scale, "ecdf_counts_dshift_")
    grid, tot = _grid_from_counts(counts)
    spark = df.sparkSession
    ks = spark.range(1, 10).select(F.col("id").cast("long").alias("decile"))
    joined = grid.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ks))
    # ceil(k*n/10) as pure integer arithmetic: (k*n + 9) div 10 — both
    # engines integer-exact (no float thresholds)
    t1 = (F.col("decile") * F.col("n1") + 9) - (
        (F.col("decile") * F.col("n1") + 9) % 10
    )
    t2 = (F.col("decile") * F.col("n2") + 9) - (
        (F.col("decile") * F.col("n2") + 9) % 10
    )
    q1 = F.min(F.when(F.col("f1") * 10 >= t1, F.col("__qv")))
    q2 = F.min(F.when(F.col("f2") * 10 >= t2, F.col("__qv")))
    agg = joined.groupBy("decile").agg(
        q1.alias("__q1"),
        q2.alias("__q2"),
        F.max("n1").alias("__n1"),
        F.max("n2").alias("__n2"),
    )
    s = F.lit(float(scale))
    ql = F.when(F.col("__n1") > 0, F.col("__q1").cast("double") / s)
    qr = F.when(F.col("__n2") > 0, F.col("__q2").cast("double") / s)
    return agg.select(
        "decile",
        ql.alias("q_left"),
        qr.alias("q_right"),
        (qr - ql).alias("shift"),
    )


def trimmed_mean_two_sample(
    df: DataFrame,
    side,
    value_col: str = "value",
    scale: int = 100,
    trim_pct: int = 10,
) -> DataFrame:
    """10%-trimmed (by default) means of both sides and their
    difference, exact through partial tie blocks. Returns ONE row:
    (n_left, n_right, trim_left, trim_right, tmean_left, tmean_right,
    tmean_shift) — NULLs for an empty side or when trimming consumes
    the whole sample (n <= 2t)."""
    counts = _ecdf_counts(df, side, value_col, scale, "ecdf_counts_tmean_")
    grid, tot = _grid_from_counts(counts)
    joined = grid.crossJoin(F.broadcast(tot))
    t1 = (F.col("n1") * trim_pct - (F.col("n1") * trim_pct) % 100) / 100
    t2 = (F.col("n2") * trim_pct - (F.col("n2") * trim_pct) % 100) / 100
    t1 = t1.cast("long")
    t2 = t2.cast("long")

    def _trim_terms(c, f, n, t):
        """(low_cut_count, high_cut_count) this grid point contributes
        to the trimmed-away tails, exact for straddling tie blocks."""
        below = f - c
        low = F.greatest(
            F.lit(0), F.least(c, t - below)
        )
        above_excl = n - f
        high = F.greatest(
            F.lit(0), F.least(c, t - above_excl)
        )
        return low, high

    lo1, hi1 = _trim_terms(F.col("c1"), F.col("f1"), F.col("n1"), t1)
    lo2, hi2 = _trim_terms(F.col("c2"), F.col("f2"), F.col("n2"), t2)
    qv = F.col("__qv").cast("decimal(38,0)")
    agg = joined.agg(
        F.sum(qv * F.col("c1")).alias("__s1"),
        F.sum(qv * F.col("c2")).alias("__s2"),
        F.sum(qv * lo1).alias("__l1"),
        F.sum(qv * hi1).alias("__h1"),
        F.sum(qv * lo2).alias("__l2"),
        F.sum(qv * hi2).alias("__h2"),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
        F.max(t1).alias("trim_left"),
        F.max(t2).alias("trim_right"),
    )
    kept1 = F.col("n_left") - 2 * F.col("trim_left")
    kept2 = F.col("n_right") - 2 * F.col("trim_right")
    s = F.lit(float(scale))
    tm1 = F.when(
        (F.col("n_left") > 0) & (kept1 > 0),
        (F.col("__s1") - F.col("__l1") - F.col("__h1")).cast("double")
        / kept1.cast("double")
        / s,
    )
    tm2 = F.when(
        (F.col("n_right") > 0) & (kept2 > 0),
        (F.col("__s2") - F.col("__l2") - F.col("__h2")).cast("double")
        / kept2.cast("double")
        / s,
    )
    return agg.select(
        "n_left",
        "n_right",
        "trim_left",
        "trim_right",
        tm1.alias("tmean_left"),
        tm2.alias("tmean_right"),
        (tm2 - tm1).alias("tmean_shift"),
    )
