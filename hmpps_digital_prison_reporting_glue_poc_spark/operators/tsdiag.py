"""Time-series residual diagnostics over the span-bounded day rollup
(round 11, wave 114) — the "is there structure left" tests that close
the forecasting loop: ``behavior.acf_daily`` profiles the memory,
Holt/Holt-Winters fit it, these two say whether what remains is noise.

- ``ljung_box_daily``: the portmanteau whiteness test — cumulative
  LB(h) = n(n+2) * sum_{k<=h} rho_k^2/(n-k) and Box-Pierce
  BP(h) = n * sum_{k<=h} rho_k^2 per lag h. Each rho_k comes from
  ``acf_daily``'s exact-integer numerator/denominator (one IEEE divide
  per lag), and the cumulative sums run over a WINDOW ORDERED BY LAG —
  a deterministic, engine-portable summation order (both engines add
  the identical doubles in the identical sequence, so no rounding
  fuzz is needed).
- ``durbin_watson_daily``: DW = sum (e_t - e_{t-1})^2 / sum e_t^2 on
  the mean-centered series over CONSECUTIVE-day pairs (calendar-gap-
  correct: the lag-1 pair join is on epoch day + 1, the acf_daily
  convention). With the integer centering c_t = n*x_t - S both sums
  are EXACT DECIMAL(38,0); DW is one final divide. DW ~ 2 means no
  lag-1 autocorrelation, < 2 positive, > 2 negative.

No counterpart exists in the reference (``/root/reference/src`` is a
1.4k-LoC Glue CDC pipeline with no statistics code); built per the
round-11 brief's analytics mandate.

Scale shape: everything runs on the day-grain rollup (span-bounded —
years of days is ~1e3 rows), so every join is a broadcast and the lag
table is a literal range; the heavy lifting (the daily aggregation)
happens once upstream in the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    acf_daily,
)


def ljung_box_daily(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
    max_lag: int = 7,
) -> DataFrame:
    """Cumulative Ljung-Box and Box-Pierce portmanteau statistics over
    lags 1..max_lag of a day-grain metric series.

    Returns one row per h in 1..max_lag:
    (h, n_days, lb_stat, bp_stat) — the test statistics over the first
    h lags (compare to chi-square with h dof). NULL when the series is
    flat (zero variance), when n_days <= h (the n-k denominator dies),
    or when any contributing lag has no pairs (a gap-ridden series
    where some lag never occurs — rho is undefined there, and a
    portmanteau over undefined terms would lie)."""
    rho = acf_daily(daily, day_col, value_col, max_lag=max_lag)
    n_days = daily.select(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    base = rho.crossJoin(F.broadcast(n_days))
    term_ok = (
        F.col("acf").isNotNull()
        & (F.col("n_days") > F.col("lag"))
    )
    lb_term = F.when(
        term_ok,
        F.col("acf")
        * F.col("acf")
        / (F.col("n_days") - F.col("lag")).cast("double"),
    )
    bp_term = F.when(term_ok, F.col("acf") * F.col("acf"))
    # window ordered by lag: deterministic summation order on BOTH
    # engines (max_lag rows — a driver-bounded frame, the single
    # partition is by construction, not a data-sized window)
    w = Window.orderBy("lag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = base.select(
        F.col("lag").alias("h"),
        "n_days",
        F.sum(lb_term).over(w).alias("__lb_sum"),
        F.sum(bp_term).over(w).alias("__bp_sum"),
        F.max(F.when(~term_ok, 1).otherwise(0)).over(w).alias("__bad"),
    )
    nd = F.col("n_days").cast("double")
    valid = F.col("__bad") == 0
    return cum.select(
        "h",
        "n_days",
        F.when(valid, nd * (nd + 2.0) * F.col("__lb_sum")).alias(
            "lb_stat"
        ),
        F.when(valid, nd * F.col("__bp_sum")).alias("bp_stat"),
    )


def durbin_watson_daily(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
) -> DataFrame:
    """Durbin-Watson statistic of the mean-centered day-grain series
    over consecutive-day pairs.

    Integer core: c_t = n*x_t - S (the acf_daily centering), so
    DW = sum over (d, d+1) pairs of (c_{d+1} - c_d)^2 / sum_t c_t^2 —
    both sums EXACT in DECIMAL(38,0), one final divide. Returns ONE
    row: (n_days, n_pairs, dw) — dw NULL for a flat series (zero
    variance) or when no consecutive-day pair exists."""
    d = F.datediff(F.col(day_col), F.lit("1970-01-01")).cast("long")
    x = F.col(value_col).cast("long")
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize,
    )

    # day-grid cut: bounded rollup, three consumers (totals, both pair
    # sides) — the r10 plan-audit discipline
    base = materialize(
        daily.select(d.alias("__d"), x.alias("__x")), "dw_base_"
    )
    totals = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__x").cast("long").alias("__s"),
    )
    centered = base.crossJoin(F.broadcast(totals)).select(
        "__d",
        (F.col("n_days") * F.col("__x") - F.col("__s"))
        .cast("decimal(38,0)")
        .alias("__c"),
    )
    # n_days rides in from the COUNT aggregate (0 on an empty rollup),
    # not a MAX over `centered` (NULL on empty — the r11 fuzz catch)
    den = centered.agg(
        F.sum(F.col("__c") * F.col("__c")).alias("__den")
    ).crossJoin(F.broadcast(totals.select("n_days")))
    a = centered.select(
        F.col("__d").alias("__da"), F.col("__c").alias("__ca")
    )
    b = centered.select(
        F.col("__d").alias("__db"), F.col("__c").alias("__cb")
    )
    pairs = a.join(F.broadcast(b), F.col("__db") == F.col("__da") + 1)
    num = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            (F.col("__cb") - F.col("__ca"))
            * (F.col("__cb") - F.col("__ca"))
        ).alias("__num"),
    )
    out = den.crossJoin(F.broadcast(num))
    valid = (F.col("__den") > 0) & (F.col("n_pairs") > 0)
    return out.select(
        "n_days",
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias(
            "n_pairs"
        ),
        F.when(
            valid,
            F.col("__num").cast("double") / F.col("__den").cast("double"),
        ).alias("dw"),
    )
