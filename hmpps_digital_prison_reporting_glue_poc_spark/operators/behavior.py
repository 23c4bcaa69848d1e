"""Behavioral / event-sequence analytics over the event log: ordered
funnels and cohort retention.

Both are two-phase aggregations partitioned by the user key — every pass
shuffles on ``user_id`` (or reuses that exchange via AQE), never on time,
so user-count scale-out is linear and there is no per-event state on the
driver. Sequence constraints (stage N after stage N-1) are conditional
min-windows, not joins: no self-join of the event log against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel completion: a user completes stage N at the earliest
    event of type ``stages[N]`` that is strictly after their stage-N-1
    completion. Returns one row per stage: (stage_idx, stage, n_users).

    Each stage is one conditional min-window over the same user partition
    — k window passes, ONE physical shuffle on the user key (Catalyst
    collapses same-spec windows into one Window node).
    """
    w = Window.partitionBy(user_col)
    df = events
    prev = None
    stage_cols = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        col_name = f"__t{i}"
        df = df.withColumn(col_name, F.min(F.when(cond, F.col(ts_col))).over(w))
        stage_cols.append(col_name)
        prev = col_name
    per_user = df.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in stage_cols]
    )
    counts = per_user.agg(
        *[
            F.count(stage_cols[i]).alias(f"__n{i}")
            for i in range(len(stages))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, stage in enumerate(stages)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of their
    FIRST event; each (cohort_period, period_offset) cell counts the
    distinct cohort users active in that later period.

    first-event pass is a groupBy(user) min; the join back is a
    co-partitioned equi-join on the user key; the matrix agg shuffles on
    the (cohort, offset) pair. No window over the full event log.
    """
    first = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("__cohort")
    )
    enriched = events.join(first, on=user_col)
    offset = (
        F.datediff(F.date_trunc(period, F.col(ts_col)), F.col("__cohort"))
        / F.lit(7 if period == "week" else 1)
    ).cast("long")
    return (
        enriched.select(
            F.col("__cohort").cast("date").alias("cohort_period"),
            offset.alias("period_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_period", "period_offset")
        .agg(F.countDistinct(user_col).alias("n_active_users"))
    )
