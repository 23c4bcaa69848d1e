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


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition counts (the Markov-chain edge table behind
    next-action prediction and path analysis): for each user's event stream
    in (ts, id) order, count (previous type -> type) occurrences.

    One lag window on the user key, one small groupBy on the (from, to)
    pair — the event log shuffles once.
    Returns (from_type, to_type, n_transitions).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return (
        events.withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def dedup_time_window(
    events: DataFrame,
    gap_seconds: int = 60,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-windowed event dedup: drop an event if the PREVIOUS event of
    the same (user, type) lies within ``gap_seconds`` of it — the standard
    double-fire / retry-storm suppressor. Lag-based (each event compares to
    its immediate predecessor), so it is a single window pass with no
    chained state; the batch twin of the streaming
    ``dropDuplicatesWithinWatermark`` family.
    """
    w = Window.partitionBy(user_col, type_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    prev_ts = F.lag(ts_col).over(w)
    keep = prev_ts.isNull() | (
        F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
        > gap_seconds
    )
    return (
        events.withColumn("__keep", keep)
        .filter(F.col("__keep"))
        .drop("__keep")
    )


def rolling_distinct_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing-N-day distinct active users per day (the DAU/WAU family).
    COUNT(DISTINCT) over a sliding range frame isn't expressible as a
    window, and a day-spine range-join would be a nested-loop join — so:
    dedupe to (day, user) pairs (one shuffle, at 100 TB orders of
    magnitude smaller than the event log), explode each pair into the N
    future days it keeps the user "active" for (bounded xN fan-out),
    semi-join to the observed-day spine (broadcast — it's tiny), and count
    distinct per day. Every join is an equi-join; no BNLJ anywhere.
    Returns (day, n_active_users).
    """
    pairs = events.select(
        F.to_date(F.col(ts_col)).alias("__day"), F.col(user_col)
    ).distinct()
    days = pairs.select(F.col("__day").alias("day")).distinct()
    covered = pairs.select(
        F.col(user_col),
        F.explode(
            F.sequence(
                F.col("__day"),
                F.date_add(F.col("__day"), window_days - 1),
            )
        ).alias("day"),
    )
    return (
        covered.join(F.broadcast(days), on="day", how="left_semi")
        .groupBy("day")
        .agg(F.countDistinct(user_col).alias("n_active_users"))
    )


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


def user_value_zscores(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    scale: int = 100,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Per-event anomaly z-score against the event's OWN user's value
    distribution — the user-relative outlier signal behind per-account
    fraud/abuse flags.

    Exact and engine-portable via the integer identity
    ``z = (n*qv - s) / sqrt(n*ss - s^2)``: values quantize to integer
    cents (``round(value * scale)``), per-user count / sum / squared sum
    are exact int64 aggregates, the numerator is an exact integer, and
    the denominator is one sqrt of an exact integer — three IEEE
    roundings total, identical everywhere (the naive
    ``(x - mean) / stddev`` would divide by a float-summed variance).
    One user-keyed aggregation + one co-keyed join-back. Users with a
    single event or zero variance emit NULL z (undefined).
    """
    q = events.select(
        F.col(id_col),
        F.col(user_col),
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv"),
    )
    # squared sums accumulate in DECIMAL(38,0), cast per term BEFORE the
    # sum: qv^2 for cent-quantized values reaches ~1e12+, so a long sum
    # silently wraps within ~1e7 events for one user (non-ANSI Spark).
    stats = q.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__qv").cast("decimal(38,0)")).alias("__s"),
        F.sum(
            (F.col("__qv") * F.col("__qv")).cast("decimal(38,0)")
        ).alias("__ss"),
    )
    # Broadcast the STATS side explicitly: left to AQE at test scale it
    # broadcast the (tiny-looking) events projection instead — the side
    # that is 100 TB in production. With stats broadcast the event log
    # never shuffles on user_id, so a hot user cannot skew the join
    # (10x-stress measured task skew 656x with the auto choice; the
    # stats aggregation itself is immune via map-side partial agg).
    # ``broadcast_stats=False`` is the fallback when user cardinality
    # itself exceeds broadcast size (billions of keys): a user-keyed
    # shuffle join, where AQE skew splitting handles hot keys.
    joined = q.join(
        F.broadcast(stats) if broadcast_stats else stats, user_col
    )
    var_num = F.col("__n") * F.col("__ss") - F.col("__s") * F.col("__s")
    z = F.when(
        (F.col("__n") >= 2) & (var_num > 0),
        (F.col("__n") * F.col("__qv") - F.col("__s")).cast("double")
        / F.sqrt(var_num.cast("double")),
    )
    return joined.select(
        F.col(id_col),
        F.col(user_col),
        (F.col("__qv").cast("double") / scale).alias("value_q"),
        F.col("__n").cast("long").alias("n_user_events"),
        z.alias("zscore"),
    )


def ks_two_sample(
    df: DataFrame,
    side_col,
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two row populations (``side_col`` false = left,
    true = right) — the distribution-drift test behind train/serve skew
    and A/B sanity monitors, computed EXACTLY and engine-portably:

    values quantize to the integer ``scale`` grid; per-value per-side
    counts aggregate once; both ECDFs accumulate over the DISTINCT-VALUE
    table (bounded by the value domain, e.g. ~10^5 cent values — never
    corpus-sized); and the supremum ``D = max |F1 - F2|`` is located by
    the INTEGER cross-product argmax ``max |f1*n2 - f2*n1|`` (DECIMAL-
    exact), so the only float op is one final divide by ``n1*n2``. Ties
    in the supremum resolve to the smallest value via the struct arg-max.
    Returns one row: (n_left, n_right, ks_d, ks_at_value).
    """
    side = F.col(side_col) if isinstance(side_col, str) else side_col
    # NULL values carry no distribution information and a NULL grid key
    # silently falls out of the bucket-offset equi-join (NULL keys never
    # match), losing its side counts on one engine only — filter
    # explicitly so both engines test the same sample (r9 fuzz harness).
    q = df.select(
        side.cast("boolean").alias("__r"),
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv"),
    ).filter(F.col("__qv").isNotNull())
    counts = q.groupBy("__qv").agg(
        F.sum(F.when(~F.col("__r"), 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("__r"), 1).otherwise(0)).cast("long").alias("c2"),
    )
    # materialized: the count rollup feeds THREE consumers (bucket sums,
    # the cumulative join, totals) whose differing column pruning defeats
    # Spark's ReusedExchange — un-cut, the FACT TABLE is scanned three
    # times (r10 plan audit; the fix was proven bit-exact on the sibling
    # drift family in operators/drift.py, applied here in r11 once the
    # rotation could absorb the behavior-wide fingerprint change). The
    # rollup is value-domain-bounded, so the cut is metadata-scale.
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    counts = materialize(counts, "ks_counts_")
    # Two-level ECDF accumulation: a bare ``sum over (order by qv)`` is ONE
    # task for the whole distinct-value table (the 10x stress read a 42.8x
    # task skew on it). Bucket on floor(qv/1024) — order-consistent, floor
    # division so negatives sort correctly — which bounds every in-bucket
    # window at 1024 GRID POINTS by construction (not by data); bucket
    # offsets come from the bucket-count-sized table, broadcast back.
    keyed = counts.withColumn(
        "__bk", F.floor(F.col("__qv") / F.lit(1024)).cast("long")
    )
    bsums = keyed.groupBy("__bk").agg(
        F.sum("c1").alias("__b1"), F.sum("c2").alias("__b2")
    )
    w_boff = Window.orderBy("__bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    boffs = bsums.select(
        "__bk",
        F.coalesce(F.sum("__b1").over(w_boff), F.lit(0)).alias("__o1"),
        F.coalesce(F.sum("__b2").over(w_boff), F.lit(0)).alias("__o2"),
    )
    w_in = Window.partitionBy("__bk").orderBy("__qv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = keyed.join(F.broadcast(boffs), "__bk").select(
        "__qv",
        (F.sum("c1").over(w_in) + F.col("__o1")).alias("f1"),
        (F.sum("c2").over(w_in) + F.col("__o2")).alias("f2"),
    )
    tot = counts.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    joined = cum.join(F.broadcast(tot), how="cross")
    d = F.abs(
        F.col("f1").cast("decimal(38,0)") * F.col("n2")
        - F.col("f2").cast("decimal(38,0)") * F.col("n1")
    )
    agg = joined.agg(
        F.max(
            F.struct(d.alias("__d"), (-F.col("__qv")).alias("__nq"))
        ).alias("__best"),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    denom = (
        F.col("n_left").cast("decimal(19,0)")
        * F.col("n_right").cast("decimal(19,0)")
    ).cast("double")
    # KS is undefined when either sample is empty — unguarded, the final
    # divide is n1*n2 = 0 and ANSI Spark raises DIVIDE_BY_ZERO where
    # DuckDB emits a non-finite value (r9 fuzz harness). NULL both stats.
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    return agg.select(
        "n_left",
        "n_right",
        F.when(valid, F.col("__best.__d").cast("double") / denom).alias(
            "ks_d"
        ),
        F.when(
            valid,
            (-F.col("__best.__nq")).cast("double") / F.lit(float(scale)),
        ).alias("ks_at_value"),
    )


def copurchase_lift(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item",
    min_pairs: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Item-item co-occurrence lift ("users who bought X also bought Y"):
    for distinct (user, item) pairs, count users holding BOTH items of a
    pair and score ``lift = c_xy * n_users / (c_x * c_y)`` — the
    first-stop collaborative-filtering signal and the association-rule
    miner's core table.

    Candidate pairs come from a self-equi-join on the user key of the
    DISTINCT (user, item) table — an inverted index keyed by user, never
    a cross join; per-user fan-out is C(basket_size, 2), bounded by
    basket size, not corpus size. Margins broadcast back; the lift is
    exact DECIMAL integer products through one IEEE divide (the
    bigram_lift_top convention).

    ``max_basket``: hot-user pruning (the dedup.jaccard_pairs ``max_df``
    convention — r5 verdict finding 2). C(basket, 2) is quadratic in
    basket size, so ONE bot/power user holding 10^6 distinct items
    contributes ~5*10^11 candidate pairs. Users whose distinct basket
    exceeds ``max_basket`` are dropped BEFORE the self-join, and the
    margins and user count are computed over the pruned holdings so the
    lift stays internally consistent (a bot's holdings are association
    noise anyway — it "co-purchases" everything with everything).
    ``max_basket=None`` keeps exact full-population semantics — only
    safe when the caller knows the basket-size distribution.
    Returns (item_a, item_b, n_both, lift), item_a < item_b.
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize_if_large,
    )

    holdings = events.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket is not None:
        sizes = holdings.groupBy("u").agg(F.count(F.lit(1)).alias("__bs"))
        over = sizes.filter(F.col("__bs") > max_basket).select("u")
        # the OVER-cap user set is tiny by construction (the basket-size
        # distribution head), so it broadcasts; anti-join drops their rows
        holdings = holdings.join(F.broadcast(over), "u", "left_anti")
    # Lineage cut, gated on input scale (r7 controlled A/B, SCALE.md):
    # the distinct (+ capped) holdings feed FOUR consumers (both
    # self-join sides, the margins, the user count) — at corpus scale
    # each would re-run the events-scan + distinct (+ anti-join) chain,
    # so the cut is mandatory there; at test scale the temp-parquet
    # write job costs more than the milliseconds of recompute it saves
    # (measured inline 0.97s vs materialized 1.05s at sf0.1).
    holdings = materialize_if_large(holdings, "copurchase_holdings")
    # n_users as a broadcast 1-row aggregate (not a driver count action):
    # the whole lift is then ONE job over the materialized parquet
    n_users = holdings.agg(
        F.countDistinct("u").cast("decimal(19,0)").alias("__nu")
    )
    pairs = (
        holdings.alias("l")
        .join(holdings.alias("r"), on="u")
        .filter(F.col("l.item") < F.col("r.item"))
        .groupBy(
            F.col("l.item").alias("item_a"), F.col("r.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_pairs)
    )
    margins = holdings.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    ma = margins.select(F.col("item").alias("item_a"), F.col("c").alias("c_a"))
    mb = margins.select(F.col("item").alias("item_b"), F.col("c").alias("c_b"))
    lift = (
        F.col("n_both").cast("decimal(19,0)") * F.col("__nu")
    ).cast("double") / (
        F.col("c_a").cast("decimal(19,0)") * F.col("c_b").cast("decimal(19,0)")
    ).cast("double")
    return (
        pairs.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .crossJoin(F.broadcast(n_users))
        .select("item_a", "item_b", "n_both", lift.alias("lift"))
    )


def funnel_time_bound(
    events: DataFrame,
    stages: list[str],
    max_gap_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-bounded ordered funnel: a user completes stage N at the
    earliest ``stages[N]`` event that is strictly after their stage-N-1
    completion AND within ``max_gap_seconds`` of it — the conversion-
    window semantics real funnel dashboards use (a purchase a month
    after the click is not attribution).

    SINGLE-ANCHOR (first-touch) semantics, deliberately: each stage
    anchors ONLY to the user's earliest completion of the previous
    stage — there is no re-anchoring. A user whose first view→click gap
    exceeds the window is counted out even if a later view would have
    started a qualifying chain. This matches the DuckDB oracle exactly;
    dashboards wanting any-qualifying-chain funnel counts need a
    different (sequence-scan) operator, not a parameter of this one.

    Same shape as ``funnel_conversion``: k conditional min-windows over
    ONE user-keyed partition (Catalyst collapses same-spec windows into
    one Window node — a single shuffle of the event log).
    Returns (stage_idx, stage, n_users).
    """
    w = Window.partitionBy(user_col)
    df = events
    prev = None
    stage_cols = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            # microsecond-exact gap: unix_timestamp would TRUNCATE to
            # seconds and admit events up to 1s past the window (and
            # disagree with a fractional-seconds SQL engine at the bound)
            gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
                F.col(prev)
            )
            cond = cond & (F.col(ts_col) > F.col(prev)) & (
                gap_us <= int(max_gap_seconds) * 1_000_000
            )
        col_name = f"__t{i}"
        df = df.withColumn(
            col_name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        stage_cols.append(col_name)
        prev = col_name
    per_user = df.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in stage_cols]
    )
    counts = per_user.agg(
        *[F.count(stage_cols[i]).alias(f"__n{i}") for i in range(len(stages))]
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


def dialog_turn_stats(
    events: DataFrame,
    conv_col: str = "user_id",
    role_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_turns: int | None = None,
) -> DataFrame:
    """Instruction-data QA over conversation-shaped logs: per
    conversation, the turn count, role-alternation violations (adjacent
    turns by the SAME role — malformed dialog for chat-format training
    data), distinct roles, and the mean inter-turn gap. Turn order is
    (ts, id) — the deterministic total order the CDC discipline uses.

    One conversation-keyed window partition (lag over the same spec
    Catalyst collapses into a single shuffle); microsecond-exact gaps
    (unix_micros — truncation-free, the funnel_time_bound convention).

    ``max_turns``: hot-conversation pruning (the max_basket/max_df
    convention; round-6 10x stress measured one planted 300k-turn bot
    "conversation" funneling its whole window partition into a single
    165x-straggler task). Conversations longer than ``max_turns`` are
    dropped BEFORE the window — a six-figure-turn conversation is bot
    traffic, not dialog, and its QA stats are meaningless anyway. The
    over-cap id set is the conversation-length head: tiny, broadcast.
    Returns (conv, n_turns, n_role_violations, n_roles,
    mean_gap_seconds) — mean gap NULL for single-turn conversations.
    """
    if max_turns is not None:
        lens = events.groupBy(F.col(conv_col)).agg(
            F.count(F.lit(1)).alias("__nt")
        )
        over = lens.filter(F.col("__nt") > max_turns).select(conv_col)
        events = events.join(F.broadcast(over), conv_col, "left_anti")
    w = Window.partitionBy(conv_col).orderBy(ts_col, id_col)
    lagged = events.select(
        F.col(conv_col).alias("__c"),
        F.col(role_col).alias("__role"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
    ).select(
        "__c", "__role", "__ts",
        F.lag("__role").over(
            Window.partitionBy("__c").orderBy("__ts", "__id")
        ).alias("__prev_role"),
        (
            F.unix_micros(F.col("__ts"))
            - F.unix_micros(
                F.lag("__ts").over(
                    Window.partitionBy("__c").orderBy("__ts", "__id")
                )
            )
        ).alias("__gap_us"),
    )
    return (
        lagged.groupBy(F.col("__c").alias(conv_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum(
                F.when(F.col("__role") == F.col("__prev_role"), 1).otherwise(0)
            ).cast("long").alias("n_role_violations"),
            F.countDistinct("__role").cast("long").alias("n_roles"),
            (
                F.sum(F.col("__gap_us").cast("decimal(38,0)")).cast("double")
                / F.lit(1_000_000.0)
                / F.count("__gap_us")
            ).alias("mean_gap_seconds"),
        )
    )


def decayed_item_counts(
    events: DataFrame,
    item_col: str,
    ts_col: str = "ts",
    t_ref: str | None = None,
    half_life_days: int = 7,
) -> DataFrame:
    """Exponentially-decayed item popularity ("trending now" with
    memory): each event contributes weight ``2^-(age_days // half_life)``
    toward its item, so items fade by half every ``half_life_days`` of
    STALENESS and the score is dominated by recent activity without a
    hard cutoff window.

    Engine-exact by construction: ages quantize to whole days, the
    exponent is an integer, so every weight is the dyadic rational
    ``2^(50-k) / 2^50`` — the weighted sum runs in exact DECIMAL integer
    arithmetic (scaled by 2^50) with ONE IEEE divide at the end, the
    same discipline as the z-score/lift operators (a naive sum of
    pow(0.5, age/hl) doubles is accumulation-order-dependent and libm-
    dependent, unverifiable across engines). One map-side-combinable
    groupBy on the item — a single shuffle.
    Returns (item, n_events, decayed_count).
    """
    ref = (
        F.lit(t_ref).cast("timestamp")
        if t_ref is not None
        else F.current_timestamp()
    )
    age_days = F.floor(
        (F.unix_micros(ref) - F.unix_micros(F.col(ts_col)))
        / F.lit(86_400_000_000)
    )
    kexp = F.least(
        F.greatest(
            F.floor(age_days / F.lit(int(half_life_days))), F.lit(0)
        ),
        F.lit(50),
    ).cast("int")
    # shiftleft needs a column-valued shift -> SQL expr form
    staged = events.select(
        F.col(item_col).alias("item"), kexp.alias("__k")
    ).withColumn(
        "weight", F.expr("shiftleft(CAST(1 AS BIGINT), 50 - __k)")
    )
    return (
        staged.groupBy("item")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (
                F.sum(F.col("weight").cast("decimal(38,0)")).cast("double")
                / F.lit(float(1 << 50))
            ).alias("decayed_count"),
        )
    )


def pit_features(
    events: DataFrame,
    label_type: str = "purchase",
    feature_type: str = "view",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    scale: int = 100,
    max_user_events: int | None = None,
) -> DataFrame:
    """Point-in-time-correct training features: for every ``label_type``
    event, aggregates of the SAME user's strictly-earlier events — the
    leakage-free feature extraction a feature store performs when it
    materializes training rows ("what did the model know at prediction
    time"). Using any same-or-later event would leak the future into the
    features; the strict ROWS ... AND 1 PRECEDING frame makes the cutoff
    exact per label row, not per day.

    One user-partitioned window (all four feature frames share the same
    (partition, order) spec, so Catalyst collapses them into a single
    Window node over ONE shuffle on the user key). Values quantize to
    integer cents so running sums are exact int64s, portable across
    engines. Returns (event_id, user_id, n_prior_events, n_prior_views,
    cents_prior_value, last_prior_type) for each label event.
    """
    if max_user_events is not None:
        # hot-user pruning (the max_turns/max_basket/max_df convention;
        # round-6 10x stress: one planted 300k-event bot funneled its
        # whole user partition into a 69x-straggler task). A six-figure-
        # event user is bot traffic whose PIT features would poison
        # training anyway; the over-cap user set is tiny and broadcast.
        over = (
            events.groupBy(F.col(user_col))
            .agg(F.count(F.lit(1)).alias("__ne"))
            .filter(F.col("__ne") > max_user_events)
            .select(user_col)
        )
        events = events.join(F.broadcast(over), user_col, "left_anti")
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_lag = Window.partitionBy(user_col).orderBy(*order)
    qv = (
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv")
    )
    df = events.select(id_col, user_col, type_col, ts_col, qv)
    feats = (
        df.withColumn("n_prior_events", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_prior_views",
            F.coalesce(
                F.sum(
                    F.when(F.col(type_col) == feature_type, 1).otherwise(0)
                ).over(w),
                F.lit(0),
            ),
        )
        .withColumn(
            "cents_prior_value",
            F.coalesce(F.sum("__qv").over(w), F.lit(0)),
        )
        .withColumn("last_prior_type", F.lag(type_col).over(w_lag))
    )
    return feats.filter(F.col(type_col) == label_type).select(
        F.col(id_col),
        F.col(user_col),
        F.col("n_prior_events").cast("long").alias("n_prior_events"),
        F.col("n_prior_views").cast("long").alias("n_prior_views"),
        F.col("cents_prior_value").cast("long").alias("cents_prior_value"),
        F.col("last_prior_type"),
    )


def attribution_last_touch(
    events: DataFrame,
    conversion_type: str = "purchase",
    window_hours: int = 72,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    scale: int = 100,
    max_user_events: int | None = None,
) -> DataFrame:
    """Last-touch conversion attribution: each ``conversion_type`` event
    is credited to the latest preceding NON-conversion event of the same
    user within ``window_hours`` — the channel-performance rollup behind
    marketing spend allocation.

    The "latest preceding touch" is a running MAX over a packed sortable
    string ``zero-padded epoch_us | zero-padded event_id | type`` on the
    strict 1-PRECEDING frame — an order-free aggregate both engines
    evaluate identically (a struct max would depend on engine-specific
    struct ordering). One user-partitioned window, then a channel-grain
    groupBy of conversions only: the event log shuffles once on the user
    key and once on the (tiny) channel key. Returns per channel:
    (channel, n_conversions, cents_value, sum_lag_us).
    """
    if max_user_events is not None:
        # hot-user pruning (max_turns convention; round-6 10x stress: the
        # planted bot user's packed-string running max was a single
        # 231x-straggler task). Bot "conversions" would mis-credit
        # channels anyway; over-cap user set is tiny and broadcast.
        over = (
            events.groupBy(F.col(user_col))
            .agg(F.count(F.lit(1)).alias("__ne"))
            .filter(F.col("__ne") > max_user_events)
            .select(user_col)
        )
        events = events.join(F.broadcast(over), user_col, "left_anti")
    us = F.unix_micros(F.col(ts_col))
    packed = F.when(
        F.col(type_col) != conversion_type,
        F.concat_ws(
            "|",
            F.lpad(us.cast("string"), 20, "0"),
            F.lpad(F.col(id_col).cast("string"), 12, "0"),
            F.col(type_col),
        ),
    )
    qv = (
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv")
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = events.select(
        F.col(user_col),
        F.col(type_col),
        F.col(ts_col),
        F.col(id_col),
        qv,
        packed.alias("__packed"),
        us.alias("__us"),
    ).withColumn("__touch", F.max("__packed").over(w))
    parts = F.split(F.col("__touch"), "\\|")
    touch_us = parts.getItem(0).cast("long")
    lag_us = F.col("__us") - touch_us
    conv = staged.filter(
        (F.col(type_col) == conversion_type)
        & F.col("__touch").isNotNull()
        & (lag_us <= F.lit(int(window_hours) * 3_600_000_000))
    )
    return (
        conv.select(
            parts.getItem(2).alias("channel"),
            F.col("__qv"),
            lag_us.alias("__lag_us"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.sum("__qv").cast("long").alias("cents_value"),
            F.sum("__lag_us").cast("long").alias("sum_lag_us"),
        )
    )


def time_to_next_hazard(
    events: DataFrame,
    target_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Discrete hazard table for inter-purchase time — the exact
    (day-grain) life table behind repeat-purchase / churn survival
    curves: for each whole-day gap ``d`` between a user's consecutive
    ``target_type`` events, ``n_events`` = gaps of exactly ``d`` days
    and ``n_at_risk`` = gaps of at least ``d`` days, so the discrete
    hazard is n_events/n_at_risk and the Kaplan-Meier survival curve is
    the consumer-side running product of (1 - hazard).

    Gaps come from one LEAD over the user partition (one shuffle);
    day-binning is exact integer division of the microsecond delta. The
    final at-risk cumulation IS a global ordered window, but its input
    is the day-grain rollup whose cardinality is bounded by the corpus
    date span in days (30 here, ~10^4 for decades) — bounded by
    construction, never by data volume, the same argument as the
    1024-point KS grid. Returns (gap_days, n_events, n_at_risk).
    """
    us = F.unix_micros(F.col(ts_col))
    p = events.filter(F.col("event_type") == target_type).select(
        F.col(user_col), us.alias("__us"), F.col(id_col)
    )
    gaps = (
        p.withColumn("__next", F.lead("__us").over(
            Window.partitionBy(user_col).orderBy(
                F.col("__us").asc(), F.col(id_col).asc()
            )
        ))
        .filter(F.col("__next").isNotNull())
        .select(
            F.expr("(__next - __us) DIV 86400000000").alias("gap_days")
        )
    )
    d = gaps.groupBy("gap_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    w_risk = Window.orderBy(F.col("gap_days").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return d.select(
        F.col("gap_days"),
        F.col("n_events"),
        F.sum("n_events").over(w_risk).cast("long").alias("n_at_risk"),
    )


def rolling_daily_revenue(
    events: DataFrame,
    target_type: str = "purchase",
    window_days: int = 7,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Trailing-N-day revenue: per-day cents plus the ``window_days``
    rolling sum and the count of observed days in the window — the
    smoothed topline a dashboard draws over raw daily noise.

    The rolling frame is a RANGE window over the integer epoch-day of
    the DAY-GRAIN rollup, so gaps in the calendar shorten the window
    arithmetically (no row-frame off-by-gaps bug) and the ordered window
    runs over one row per day — bounded by the corpus date span by
    construction (30 here, ~10^4 for decades), never by event volume;
    the same argument as the hazard table's at-risk cumulation. Returns
    (day, cents_day, cents_7d, n_days_7d).
    """
    qv = (
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv")
    )
    daily = (
        events.filter(F.col(type_col) == target_type)
        .select(F.to_date(F.col(ts_col)).alias("day"), qv)
        .groupBy("day")
        .agg(F.sum("__qv").cast("long").alias("cents_day"))
        .withColumn(
            "__ord", F.datediff(F.col("day"), F.lit("1970-01-01"))
        )
    )
    w = Window.orderBy("__ord").rangeBetween(-(window_days - 1), 0)
    return daily.select(
        "day",
        "cents_day",
        F.sum("cents_day").over(w).cast("long").alias("cents_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_days_7d"),
    )


def value_decile_transition(
    events: DataFrame,
    target_type: str = "purchase",
    n_tiles: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    scale: int = 100,
    bucket_cents: int = 5_000,
) -> DataFrame:
    """User-value decile transition matrix: rank users by spend in the
    first and second halves of the observation period, and count users
    per (decile_then, decile_now) cell — the rank-stability / churn-risk
    migration table behind "are our top customers still our top
    customers".

    Exact deciles WITHOUT a table-spanning window: per period, the
    range-bucket + in-bucket row_number + broadcast cumulative-offset
    idiom (corpus.global_sort_rank / the ntile fix) yields the exact
    global rank r under the unique total order (cents, user), and the
    decile is closed-form (n_tiles·(r−1)) div n. The period boundary is
    the integer midpoint day of the observed span (broadcast 1-row
    aggregate), so the split is data-derived but deterministic. Only
    users active in BOTH periods transition. Returns
    (decile_from, decile_to, n_users).
    """
    qv = (
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv")
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize_if_large

    base = events.filter(F.col(type_col) == target_type).select(
        F.col(user_col).alias("user"),
        F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).alias(
            "__d"
        ),
        qv,
    )
    # ONE fact pass (r12, the r11 rfm_scores store pattern): the user x
    # day rollup is the only fact-derived state the transition needs —
    # the span (min/max over a grouping key equals the global min/max)
    # and both period rollups (integer sums of per-day sums equal sums
    # over the raw rows; NULL day-cells drop out of the outer sum exactly
    # as NULL rows dropped out of the inner one) derive from it. Before,
    # the span agg and the per_up producer each re-scanned events raw.
    # Size-gated cut (not unconditional): at pin scale the day-grain
    # write job costs more than the two cheap rollup recomputes it saves
    # (solo A/B: unconditional store 1.33s -> 2.01s), while above the
    # gate the store caps the fact lineage at ONE scan.
    per_ud = materialize_if_large(
        base.groupBy("user", "__d").agg(F.sum("__qv").alias("__dqv")),
        "vdt_per_ud_",
    )
    span = per_ud.agg(
        F.min("__d").alias("__lo"), F.max("__d").alias("__hi")
    )
    mid = ((F.col("__lo") + F.col("__hi") + F.lit(1)) / 2).cast("long")
    per_up = (
        per_ud.crossJoin(F.broadcast(span))
        .withColumn("period", (F.col("__d") >= mid).cast("int"))
        .groupBy("user", "period")
        # coalesce(0): all-NULL spend ranks as zero recorded cents, not
        # as a NULL that drops out of the bucket join (r9 fuzz sweep)
        .agg(F.coalesce(F.sum("__dqv"), F.lit(0)).cast("long").alias("cents"))
    )
    # user x period frame feeding the bucket/offset chain
    per_up = materialize_if_large(per_up, "vdt_perup_")
    # Exact per-period rank: range-bucket on cents, rank in-bucket, add
    # per-(period, bucket) cumulative offsets (a tiny rollup: windows on
    # it are bounded by n_periods x n_buckets by construction).
    bucketed = per_up.withColumn(
        "__b", F.floor(F.col("cents") / F.lit(bucket_cents)).cast("long")
    )
    counts = bucketed.groupBy("period", "__b").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy("period")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # per-period total rides the SAME window pass as the offsets (same
    # partition/order spec -> one Window operator) instead of a separate
    # groupBy consumed via a second broadcast join, whose subtree
    # re-executed the counts lineage once more (r12, the r11 item-6/12
    # lesson): sum over the whole period partition == the period's row
    # count, exact.
    w_tot = (
        Window.partitionBy("period")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    offsets = counts.select(
        "period",
        "__b",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__n").over(w_tot).cast("long").alias("__tot"),
    )
    w_in = Window.partitionBy("period", "__b").orderBy("cents", "user")
    ranked = (
        bucketed.join(F.broadcast(offsets), ["period", "__b"])
        .select(
            "user",
            "period",
            F.expr(
                f"({n_tiles} * (row_number() over (partition by period, __b "
                "order by cents, user) + __off - 1)) div __tot"
            ).alias("tile"),
        )
    )
    # Pair the two periods with ONE user-keyed aggregation instead of a
    # self-join: a self-join on `ranked` would duplicate the whole rank
    # lineage (plan fingerprint showed 10 Exchanges) — the conditional-max
    # pivot reads it once.
    paired = ranked.groupBy("user").agg(
        F.max(F.when(F.col("period") == 0, F.col("tile"))).alias(
            "decile_from"
        ),
        F.max(F.when(F.col("period") == 1, F.col("tile"))).alias(
            "decile_to"
        ),
    )
    return (
        paired.filter(
            F.col("decile_from").isNotNull()
            & F.col("decile_to").isNotNull()
        )
        .groupBy("decile_from", "decile_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def daily_anomaly_robust_z(
    events: DataFrame,
    target_type: str = "purchase",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Robust daily-volume anomaly scores: each day's event count scored
    as (count − median) / (1.4826·MAD) — the median/MAD z-score that a
    single bad ingest day can't poison the way a mean/stddev score can
    (50% breakdown point vs 0).

    Median and MAD are EXACT interpolated percentiles computed on the
    day-grain rollup — a table bounded by the corpus date span by
    construction (the hazard-table argument), so the two single-row
    percentile aggregations are metadata-sized no matter how many events
    fed them. The stats broadcast back onto the rollup. Returns
    (day, n_events, robust_z); z is NULL when MAD == 0 (a flat series
    has no scale to score against).
    """
    daily = (
        events.filter(F.col(type_col) == target_type)
        .groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # day-grid cut: bounded rollup, multiple consumers (r10 plan audit)
    daily = materialize(daily, "robustz_daily_")
    med = daily.agg(
        F.percentile(F.col("n_events").cast("double"), F.lit(0.5)).alias(
            "__med"
        )
    )
    dev = daily.crossJoin(F.broadcast(med)).select(
        "day",
        "n_events",
        "__med",
        F.abs(F.col("n_events").cast("double") - F.col("__med")).alias(
            "__dev"
        ),
    )
    mad = dev.agg(F.percentile(F.col("__dev"), F.lit(0.5)).alias("__mad"))
    scored = dev.crossJoin(F.broadcast(mad))
    z = F.when(
        F.col("__mad") > 0.0,
        (F.col("n_events").cast("double") - F.col("__med"))
        / (F.lit(1.4826) * F.col("__mad")),
    )
    return scored.select("day", "n_events", z.alias("robust_z"))


def cusum_changepoint(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
) -> DataFrame:
    """CUSUM level-shift detector over a day-grain metric series: the
    cumulative-sum statistic C_k = sum_{i<=k}(x_i − mean) whose peak
    |C_k| locates the most likely changepoint (Page's CUSUM / the
    binary-segmentation first split). The complement of
    ``daily_anomaly_robust_z``: that flags single outlier DAYS, this
    finds a persistent LEVEL SHIFT that no single day exposes.

    Exactness: the series lives on the span-bounded day rollup, so with
    integer inputs everything up to the final standardization is exact —
    C_k is computed SCALED BY n as C_k*n = n*P_k − k*S (prefix sum P_k,
    total S, both integers), avoiding the float mean entirely; the
    standardized z_k = C_k / (sigma*sqrt(n)) = (n*P_k − k*S) /
    sqrt((n*Q − S^2) * n) is ONE float expression over exact integer
    aggregates. Caller contract: value_col is an integer metric (cents,
    counts); n*P_k must fit in a long (day-grain cents: safe below
    ~$10^13 of daily revenue over a 10-year span).

    Plan: one window pass over the rollup (bounded by the date span —
    the ``daily_anomaly_robust_z`` argument), totals broadcast back.
    Returns (day, x, prefix, cusum_n_scaled, cusum_z, is_peak) with
    is_peak = exact-integer argmax of |C_k*n| (ties all flagged);
    cusum_z is NULL on a flat series (zero variance).
    """
    from pyspark.sql import Window

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    d, x = F.col(day_col), F.col(value_col).cast("long")
    # materialized: the span-bounded day grid feeds multiple
    # consumers whose broadcast cross joins would otherwise re-derive
    # the caller's event rollup per consumer (r10 plan audit)
    base = materialize(daily.select(d.alias("day"), x.alias("x")), "cusum_base_")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pref = base.select(
        "day",
        "x",
        F.sum("x").over(w).cast("long").alias("prefix"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("__k"),
    )
    totals = base.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("x").cast("long").alias("__s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("__q"),
    )
    scored = pref.crossJoin(F.broadcast(totals)).withColumn(
        "cusum_n_scaled",
        (F.col("__n") * F.col("prefix") - F.col("__k") * F.col("__s")).cast(
            "long"
        ),
    )
    var_n2 = (
        F.col("__n").cast("decimal(38,0)") * F.col("__q")
        - F.col("__s").cast("decimal(38,0)") * F.col("__s")
    ).cast("double")
    z = F.when(
        var_n2 > 0.0,
        F.col("cusum_n_scaled").cast("double")
        / F.sqrt(var_n2 * F.col("__n").cast("double")),
    )
    peak = scored.agg(
        F.max(F.abs(F.col("cusum_n_scaled"))).cast("long").alias("__peak")
    )
    return (
        scored.crossJoin(F.broadcast(peak))
        .select(
            "day",
            "x",
            "prefix",
            "cusum_n_scaled",
            z.alias("cusum_z"),
            # coalesce: an all-NULL value column makes cusum_n_scaled NULL
            # and a bare equality would emit a NULL BOOLEAN — which pandas
            # renders as None (Spark) vs NaN (DuckDB) and the driver
            # canonicalizer hashes differently (r9 fuzz, "nulls" seed).
            # No signal -> not a peak.
            F.coalesce(
                F.abs(F.col("cusum_n_scaled")) == F.col("__peak"),
                F.lit(False),
            ).alias("is_peak"),
        )
    )


def mann_kendall_trend(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
) -> DataFrame:
    """Mann-Kendall monotone-trend test over a day-grain metric series —
    the nonparametric complement of ``cusum_changepoint``: CUSUM finds a
    level SHIFT, Mann-Kendall scores a sustained DRIFT without assuming
    normality (it is Kendall's S against time itself).

    S = sum_{i<j} sign(x_j − x_i) and the tie-corrected variance
    Var(S)·18 = n(n−1)(2n+5) − sum_t t(t−1)(2t+5) are both exact
    integers on the span-bounded day rollup (the pair join is
    rollup×rollup with a broadcast side — bounded by the DATE SPAN
    squared, never by event count); the normal-approximation z applies
    the standard ±1 continuity correction in ONE float expression.
    Returns one row (n, s_stat, var_s_x18, z); z is NULL when the
    variance is zero (all values tied).
    """
    from pyspark.sql import Window  # noqa: F401  (parallel import style)

    d, x = F.col(day_col), F.col(value_col).cast("long")
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # day-grid cut: bounded rollup, multiple consumers (r10 plan audit)
    base = materialize(
        daily.select(d.alias("__d"), x.alias("__x")), "mk_base_"
    )
    a = base.select(F.col("__d").alias("__da"), F.col("__x").alias("__xa"))
    b = base.select(F.col("__d").alias("__db"), F.col("__x").alias("__xb"))
    s = (
        a.join(F.broadcast(b), F.col("__da") < F.col("__db"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("__xb") > F.col("__xa"), 1)
                    .when(F.col("__xb") < F.col("__xa"), -1)
                    .otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n_row = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        base.groupBy("__x")
        .agg(F.count(F.lit(1)).cast("long").alias("__t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("__t")
                    * (F.col("__t") - 1)
                    * (2 * F.col("__t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("__tie_term")
        )
    )
    joined = n_row.crossJoin(F.broadcast(s)).crossJoin(F.broadcast(ties))
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("__tie_term")
    ).cast("long")
    sd = F.sqrt(var18.cast("double") / F.lit(18.0))
    z = F.when(
        var18 > 0,
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double") / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0)),
    )
    return joined.select(
        "n", "s_stat", var18.alias("var_s_x18"), z.alias("z")
    )


def acf_daily(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
    max_lag: int = 7,
) -> DataFrame:
    """Lag-k autocorrelation function of a day-grain metric series —
    the seasonality/memory profile (a weekly cycle shows as a spike at
    lag 7) that complements ``cusum_changepoint`` (shift) and
    ``mann_kendall_trend`` (drift).

    Exactness: with the series on the span-bounded day rollup, the
    centered products are integer-ized by scaling with n — the lag-k
    numerator n^2 * sum_t (x_t − mean)(x_{t+k} − mean) equals
    sum_t (n*x_t − S)(n*x_{t+k} − S), an EXACT integer from the
    (epoch-day + k) equi-join of the rollup with itself; the lag-0
    denominator is the same expression at k = 0. One float division per
    lag row. Calendar gaps are respected: lag k means k DAYS apart, not
    k rows (the join key is the epoch day, the rolling_daily_revenue
    RANGE-frame argument).

    Returns one row per lag 1..max_lag: (lag, n_pairs, acf); acf is
    NULL for a flat series (zero variance) or when no pairs exist at
    that lag.
    """
    d = F.datediff(F.col(day_col), F.lit("1970-01-01")).cast("long")
    x = F.col(value_col).cast("long")
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # day-grid cut: bounded rollup, multiple consumers (r10 plan audit)
    base = materialize(
        daily.select(d.alias("__d"), x.alias("__x")), "acf_base_"
    )
    totals = base.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").cast("long").alias("__s"),
    )
    centered = base.crossJoin(F.broadcast(totals)).select(
        "__d",
        (F.col("__n") * F.col("__x") - F.col("__s"))
        .cast("decimal(38,0)")
        .alias("__c"),
    )
    den = centered.agg(
        F.sum(F.col("__c") * F.col("__c")).alias("__den")
    )
    lags = centered.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = centered.select(
        F.col("__d").alias("__da"), F.col("__c").alias("__ca")
    )
    b = centered.select(
        F.col("__d").alias("__db"), F.col("__c").alias("__cb")
    )
    pairs = a.crossJoin(F.broadcast(lags)).join(
        F.broadcast(b),
        F.col("__db") == F.col("__da") + F.col("lag"),
    )
    num = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("__ca") * F.col("__cb")).alias("__num"),
    )
    out = lags.join(F.broadcast(num), "lag", "left").crossJoin(
        F.broadcast(den)
    )
    acf = F.when(
        (F.col("__den") > 0) & F.col("__num").isNotNull(),
        F.col("__num").cast("double") / F.col("__den").cast("double"),
    )
    return out.select(
        "lag",
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
        acf.alias("acf"),
    )


def ccf_daily(
    daily_x: DataFrame,
    daily_y: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
    max_lag: int = 7,
) -> DataFrame:
    """Lead-lag cross-correlation between two day-grain series — "does
    x lead y?" (e.g. click volume leading purchase volume): positive
    lags correlate x at day d with y at day d+lag, negative lags the
    reverse. The two-series sibling of ``acf_daily``.

    Exactness, same scheme as acf_daily: each series is centered with
    ITS OWN integer scaling (c_x = n_x*x − S_x), the lag-k numerator is
    the exact integer sum of c_x(d)*c_y(d+k) over the epoch-day
    equi-join, and the denominator sqrt(sum c_x^2 * sum c_y^2) comes
    from exact integers — ONE float expression per lag. The estimator
    normalizes by the full-series variances (the standard sample-CCF
    convention, not per-overlap renormalization); days missing from
    either series simply contribute no pair — calendar-gap-correct.

    Returns one row per lag in [-max_lag, max_lag]:
    (lag, n_pairs, ccf); ccf NULL when either series is flat or the lag
    has no overlapping pairs.
    """
    def _centered(df: DataFrame, tag: str) -> DataFrame:
        d = F.datediff(F.col(day_col), F.lit("1970-01-01")).cast("long")
        x = F.col(value_col).cast("long")
        from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

        # day-grid cut: bounded rollup, multiple consumers (r10 plan audit)
        base = materialize(
            df.select(d.alias(f"__d{tag}"), x.alias("__v")),
            f"ccf_base_{tag}_",
        )
        tot = base.agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__v").cast("long").alias("__s"),
        )
        return base.crossJoin(F.broadcast(tot)).select(
            f"__d{tag}",
            (F.col("__n") * F.col("__v") - F.col("__s"))
            .cast("decimal(38,0)")
            .alias(f"__c{tag}"),
        )

    cx = _centered(daily_x, "x")
    cy = _centered(daily_y, "y")
    den_x = cx.agg(F.sum(F.col("__cx") * F.col("__cx")).alias("__dx"))
    den_y = cy.agg(F.sum(F.col("__cy") * F.col("__cy")).alias("__dy"))
    spark = daily_x.sparkSession
    lags = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    pairs = cx.crossJoin(F.broadcast(lags)).join(
        F.broadcast(cy),
        F.col("__dy") == F.col("__dx") + F.col("lag"),
    )
    num = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("__cx") * F.col("__cy")).alias("__num"),
    )
    out = (
        lags.join(F.broadcast(num), "lag", "left")
        .crossJoin(F.broadcast(den_x))
        .crossJoin(F.broadcast(den_y))
    )
    ccf = F.when(
        (F.col("__dx") > 0) & (F.col("__dy") > 0)
        & F.col("__num").isNotNull(),
        F.col("__num").cast("double")
        / F.sqrt(
            F.col("__dx").cast("double") * F.col("__dy").cast("double")
        ),
    )
    return out.select(
        "lag",
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
        ccf.alias("ccf"),
    )


def cohort_ltv_curve(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    revenue_cents_col: str = "revenue_cents",
    period: str = "week",
) -> DataFrame:
    """Cohort lifetime-value curve: users cohorted by the period of
    their FIRST event (the ``cohort_retention`` convention), each
    (cohort, period_offset) row reporting the CUMULATIVE revenue per
    cohort user through that offset — the payback-period readout next
    to retention's activity matrix.

    Exactness: revenue stays integer cents through the (cohort, offset)
    rollup and the cumulative window (which runs over the offset axis
    of the rollup — bounded by the date span, the hazard-table
    argument); cohort size comes from the first-event pass (every
    cohort user counts, including zero-revenue ones — dividing by
    ACTIVE users would inflate LTV); ltv_per_user is ONE float divide
    per row. Only offsets with at least one cohort event appear (the
    cumulative value at an absent offset equals the previous row's).
    Returns (cohort_period, period_offset, n_users, period_cents,
    cum_cents, ltv_cents_per_user).
    """
    from pyspark.sql import Window

    days_per = 7 if period == "week" else 1
    first = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("__cohort")
    )
    sizes = first.groupBy("__cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize_if_large

    # user-sized rollup re-derived per consumer without a cut
    first = materialize_if_large(first, "ltv_first_")
    enriched = events.join(first, on=user_col)
    offset = (
        F.datediff(F.date_trunc(period, F.col(ts_col)), F.col("__cohort"))
        / F.lit(days_per)
    ).cast("long")
    cells = (
        enriched.select(
            F.col("__cohort"),
            offset.alias("period_offset"),
            F.col(revenue_cents_col).cast("long").alias("__cents"),
        )
        .groupBy("__cohort", "period_offset")
        .agg(F.sum("__cents").cast("long").alias("period_cents"))
    )
    w = Window.partitionBy("__cohort").orderBy("period_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    curve = cells.withColumn(
        "cum_cents", F.sum("period_cents").over(w).cast("long")
    )
    out = curve.join(F.broadcast(sizes), "__cohort")
    return out.select(
        F.col("__cohort").cast("date").alias("cohort_period"),
        "period_offset",
        "n_users",
        "period_cents",
        "cum_cents",
        (
            F.col("cum_cents").cast("double") / F.col("n_users").cast("double")
        ).alias("ltv_cents_per_user"),
    )


def attribution_linear(
    events: DataFrame,
    conversion_type: str = "purchase",
    window_hours: int = 72,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_user_events: int | None = None,
) -> DataFrame:
    """Linear multi-touch attribution: every conversion distributes its
    100% equally across ALL its preceding touches inside the window
    (credit 1/k each) — the equal-credit complement of
    ``attribution_last_touch`` (which pays only the final touch).

    Exactness without a float sum: credits are grouped by
    (channel, journey_len) — every row in a group carries the SAME
    rational credit 1/k, so the group's total is n*10000/k basis
    points, ONE divide per OUTPUT row (bounded by channels x window
    capacity, not by events). The consumer sums basis points across the
    tiny table for channel totals.

    Plan: one user-keyed interval join (touch.ts in
    [conv.ts − window, conv.ts)) — the touches-per-conversion fan-out is
    bounded by the window; ``max_user_events`` prunes bot users exactly
    as in attribution_last_touch. Conversions with ZERO in-window
    touches surface as one (channel = NULL, journey_len = 0) row so
    unattributable volume is visible. Returns
    (channel, journey_len, n_touches, credit_bp).
    """
    if max_user_events is not None:
        over = (
            events.groupBy(F.col(user_col))
            .agg(F.count(F.lit(1)).alias("__ne"))
            .filter(F.col("__ne") > max_user_events)
            .select(user_col)
        )
        events = events.join(F.broadcast(over), user_col, "left_anti")
    us = F.unix_micros(F.col(ts_col))
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize_if_large

    # event-sized frame feeding the conversion + touch branches: gated
    # cut (r10 plan audit measured 12 fact scans un-cut)
    events = materialize_if_large(events, "attr_events_")
    base = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__c"),
        us.alias("__t"),
        F.col(id_col).cast("long").alias("__id"),
    )
    conv = base.filter(F.col("__c") == conversion_type).select(
        F.col("__u"),
        F.col("__t").alias("__ct"),
        F.col("__id").alias("__cid"),
    )
    touch = base.filter(F.col("__c") != conversion_type).select(
        "__u",
        F.col("__c").alias("channel"),
        F.col("__t").alias("__tt"),
    )
    win_us = window_hours * 3_600_000_000
    pairs = conv.join(
        touch,
        (conv["__u"] == touch["__u"])
        & (F.col("__tt") < F.col("__ct"))
        & (F.col("__tt") >= F.col("__ct") - F.lit(win_us)),
        "left",
    )
    per_conv = pairs.groupBy("__cid").agg(
        F.count("channel").cast("long").alias("__k"),
    )
    journeys = pairs.join(
        F.broadcast(per_conv.select("__cid", "__k")), "__cid"
    )
    credited = (
        journeys.filter(F.col("__k") > 0)
        .groupBy("channel", F.col("__k").alias("journey_len"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_touches"))
    )
    credit = (
        F.col("n_touches").cast("double")
        * F.lit(10_000.0)
        / F.col("journey_len").cast("double")
    )
    zero = (
        per_conv.filter(F.col("__k") == 0)
        .agg(F.count(F.lit(1)).cast("long").alias("n_touches"))
        .select(
            F.lit(None).cast("string").alias("channel"),
            F.lit(0).cast("long").alias("journey_len"),
            "n_touches",
            F.lit(0.0).alias("credit_bp"),
        )
        .filter(F.col("n_touches") > 0)
    )
    return credited.select(
        "channel", "journey_len", "n_touches", credit.alias("credit_bp")
    ).unionByName(zero)


def markov_stationary(
    events: DataFrame,
    n_iter: int = 8,
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain —
    where does a user's behavior settle long-run? (The equilibrium
    complement of ``event_transitions``' one-step counts; a state whose
    stationary mass exceeds its empirical frequency is an absorbing
    pattern.)

    Power iteration over the K-state transition matrix (K = distinct
    event types — a BOUNDED rollup, so every iteration joins a K^2-row
    edge table with a K-row rank table; nothing data-sized repeats).
    Transition probabilities are exact single divides c_ij/c_i;
    iterations use the token_pagerank determinism recipe — every
    contribution rounded to 9 dp, summed as DECIMAL(38,9), each new
    rank re-rounded — so both engines walk the identical orbit. States
    with no outgoing transitions leak their mass (the documented
    pagerank variant). Returns (event_type, stationary_p) after
    ``n_iter`` steps from the uniform start.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(id_col)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("__from"),
            F.lead(type_col, 1).over(w).alias("__to"),
        )
        .filter(F.col("__to").isNotNull())
        .groupBy("__from", "__to")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    outs = pairs.groupBy("__from").agg(F.sum("__c").cast("long").alias("__ci"))
    from decimal import Decimal, ROUND_HALF_UP

    from pyspark.sql import types as T

    # The K^2-bounded edge grid (K = distinct event types, a caller
    # contract) iterates DRIVER-SIDE (r11 optimization): these are
    # exactly the rows the previous loop broadcast to every executor
    # each round (F.broadcast(rank) / broadcast(outs)); the 2
    # temp-parquet lineage cuts plus the 8-round lazy join tower (16
    # tiny joins per call) collapse to ONE collect job over the single
    # data-sized window+groupBy pass, identical at any corpus scale.
    # Arithmetic mirrors the committed oracle orbit token for token
    # (round-9dp contributions, DECIMAL(38,9) exact order-free sums,
    # re-rounded ranks — verified repr-bit-exact vs the prior Spark
    # loop at sf0.001 + sf0.01).
    edges = pairs.join(F.broadcast(outs), "__from").select(
        "__from",
        "__to",
        (F.col("__c").cast("double") / F.col("__ci").cast("double")).alias(
            "__p"
        ),
    )
    rows = [
        (r["__from"], r["__to"], r["__p"]) for r in edges.collect()
    ]
    spark = events.sparkSession
    schema = T.StructType(
        [
            T.StructField(type_col, events.schema[type_col].dataType, True),
            T.StructField("stationary_p", T.DoubleType(), True),
        ]
    )
    states = sorted(
        {r[0] for r in rows} | {r[1] for r in rows},
        key=lambda s: (s is None, s),
    )
    if not states:
        return spark.createDataFrame([], schema)

    q9 = Decimal("1E-9")

    def _round9(x: float) -> float:
        # F.round(double, 9): shortest-repr HALF_UP, NaN/Inf unchanged
        if x != x or x in (float("inf"), float("-inf")):
            return x
        return float(Decimal(repr(x)).quantize(q9, rounding=ROUND_HALF_UP))

    def _dec9(x: float):
        return Decimal(repr(x)).quantize(q9, rounding=ROUND_HALF_UP)

    rank = {s: _round9(1.0 / float(len(states))) for s in states}
    for _ in range(n_iter):
        acc: dict = {}
        for frm, to, p in rows:
            acc[to] = acc.get(to, Decimal(0)) + _dec9(_round9(rank[frm] * p))
        # states with zero inbound mass this round keep 0.0 (the old
        # states-left-join/coalesce re-completion)
        rank = {
            s: (_round9(float(acc[s])) if s in acc else 0.0) for s in states
        }
    return spark.createDataFrame([(s, rank[s]) for s in states], schema)


def theil_sen_trend(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
) -> DataFrame:
    """Theil-Sen robust trend estimator over a day-grain series: the
    MEDIAN of all pairwise slopes (x_j − x_i)/(d_j − d_i) — the
    estimator Mann-Kendall is the test for (breakdown point 29% vs
    OLS's 0: one bad ingest day cannot bend the line). Intercept =
    median of (x_i − slope*d_i).

    Exactness: every slope is ONE divide of exact integers, so both
    engines hold identical doubles; the median is the k = ceil(m/2)
    ORDER STATISTIC selected by row_number with a full deterministic
    tie-break (slope, d_i, d_j) — no interpolating percentile, whose
    float averaging would be the only cross-engine hazard. The pair
    table and its selection sort are DATE-SPAN^2-bounded (the
    mann_kendall argument) — at a 10-year daily grain that is ~6.6M
    rollup-derived rows once, never event-scaled. Returns one row
    (n_days, n_pairs, slope_per_day, intercept); NULLs when n_days < 2.
    """
    from pyspark.sql import Window

    d = F.datediff(F.col(day_col), F.lit("1970-01-01")).cast("long")
    x = F.col(value_col).cast("long")
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # day-grid cut: bounded rollup, multiple consumers (r10 plan audit)
    base = materialize(
        daily.select(d.alias("__d"), x.alias("__x")), "ts_base_"
    )
    a = base.select(F.col("__d").alias("__da"), F.col("__x").alias("__xa"))
    b = base.select(F.col("__d").alias("__db"), F.col("__x").alias("__xb"))
    pairs = a.join(F.broadcast(b), F.col("__da") < F.col("__db")).select(
        "__da",
        "__db",
        (
            (F.col("__xb") - F.col("__xa")).cast("double")
            / (F.col("__db") - F.col("__da")).cast("double")
        ).alias("__s"),
    )
    w = Window.orderBy("__s", "__da", "__db")
    ranked = pairs.withColumn("__r", F.row_number().over(w).cast("long"))
    m_row = pairs.agg(F.count(F.lit(1)).cast("long").alias("__m"))
    target = m_row.select(
        "__m",
        ((F.col("__m") + 1) - (F.col("__m") + 1) % 2).alias("__t2"),
    ).select("__m", (F.col("__t2") / 2).cast("long").alias("__t"))
    slope = (
        ranked.join(F.broadcast(target), F.col("__r") == F.col("__t"))
        .select(F.col("__s").alias("__slope"), "__m")
    )
    resid = base.crossJoin(F.broadcast(slope)).select(
        (F.col("__x").cast("double") - F.col("__slope") * F.col("__d").cast("double")).alias(
            "__b"
        ),
        "__d",
        "__slope",
        "__m",
    )
    wb = Window.orderBy("__b", "__d")
    n_row = base.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    resid_ranked = resid.withColumn(
        "__rb", F.row_number().over(wb).cast("long")
    ).crossJoin(F.broadcast(n_row))
    out = resid_ranked.filter(
        F.col("__rb") == ((F.col("n_days") + 1) - (F.col("n_days") + 1) % 2) / 2
    ).select(
        "n_days",
        F.col("__m").alias("n_pairs"),
        F.col("__slope").alias("slope_per_day"),
        F.col("__b").alias("intercept"),
    )
    # n_days < 2: no pairs, empty out — surface the degenerate row
    empty = n_row.filter(F.col("n_days") < 2).select(
        "n_days",
        F.lit(0).cast("long").alias("n_pairs"),
        F.lit(None).cast("double").alias("slope_per_day"),
        F.lit(None).cast("double").alias("intercept"),
    )
    return out.unionByName(empty)


def dow_seasonality(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-of-week seasonality profile per event type: the share of a
    type's volume landing on each weekday, and the seasonality index
    7*share (1.0 = flat week) — the calendar-profile complement of
    ``acf_daily``'s lag-7 spike.

    The weekday comes from PURE INTEGER arithmetic — (epoch_day + 3)
    mod 7, anchored on 1970-01-01 being a Thursday (0 = Monday) — not
    from dayofweek(), whose numbering differs across engines (Spark
    1=Sunday, DuckDB 0=Sunday: a classic silent off-by-one). One
    (type, dow)-keyed rollup + broadcast type totals; share and index
    are each one exact divide. Returns
    (event_type, dow, n, share, seasonality_index) with dow 0..6.
    """
    epoch_day = F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
    dow = ((epoch_day + 3) % 7).cast("long")
    cells = (
        events.select(F.col(type_col).alias("event_type"), dow.alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("__t")
    )
    out = cells.join(F.broadcast(totals), "event_type")
    share = F.col("n").cast("double") / F.col("__t").cast("double")
    index = (F.lit(7.0) * F.col("n").cast("double")) / F.col("__t").cast(
        "double"
    )
    return out.select(
        "event_type", "dow", "n", share.alias("share"),
        index.alias("seasonality_index"),
    )


def longest_monotone_streaks(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
) -> DataFrame:
    """Longest strictly-up and strictly-down day streaks of a metric
    series — the "9 days of growth in a row" readout (a streak is what
    a drifting CUSUM looks like from the calendar side; unlike
    mann_kendall it is direction-local, not global).

    Islands idiom on the span-bounded day rollup: per-day direction
    sign vs the previous CALENDAR day (a calendar gap breaks every
    streak — a Monday after a missing weekend is not a continuation),
    island id = running count of direction changes, lengths from one
    rollup, maxima from another. All exact integers. Returns one row
    (n_days, longest_up, longest_down); streak length counts the DAYS
    in the run (a single day is a streak of 1 in neither direction —
    up/down runs need >= 2 days, reported as day counts).
    """
    from pyspark.sql import Window

    d = F.datediff(F.col(day_col), F.lit("1970-01-01")).cast("long")
    x = F.col(value_col).cast("long")
    base = daily.select(d.alias("__d"), x.alias("__x"))
    w = Window.orderBy("__d")
    prev_d = F.lag("__d", 1).over(w)
    prev_x = F.lag("__x", 1).over(w)
    sign = (
        F.when(
            prev_d.isNull() | (F.col("__d") - prev_d != 1), F.lit(None)
        )
        .when(F.col("__x") > prev_x, F.lit(1))
        .when(F.col("__x") < prev_x, F.lit(-1))
        .otherwise(F.lit(0))
    )
    staged = base.withColumn("__s", sign)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    flag = F.when(
        F.col("__s").isNull()
        | (F.col("__s") != F.coalesce(F.lag("__s", 1).over(w), F.lit(99))),
        1,
    ).otherwise(0)
    islands = staged.withColumn("__brk", flag).withColumn(
        "__isl", F.sum("__brk").over(wsum)
    )
    runs = (
        islands.filter(F.col("__s").isin(1, -1))
        .groupBy("__isl", "__s")
        # run of k change-days spans k+1 calendar days
        .agg((F.count(F.lit(1)) + 1).cast("long").alias("__len"))
    )
    n_row = base.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    maxes = runs.agg(
        F.coalesce(
            F.max(F.when(F.col("__s") == 1, F.col("__len"))), F.lit(1)
        )
        .cast("long")
        .alias("longest_up"),
        F.coalesce(
            F.max(F.when(F.col("__s") == -1, F.col("__len"))), F.lit(1)
        )
        .cast("long")
        .alias("longest_down"),
    )
    return n_row.crossJoin(F.broadcast(maxes))


def _range_rank(
    df: DataFrame,
    value_col: str,
    id_col: str,
    bucket_width: int,
    rank_col: str,
) -> DataFrame:
    """Exact global 1-based rank under the total order (value, id)
    WITHOUT a table-spanning window — the numeric-range variant of
    corpus.global_sort_rank: range-bucket the value, rank in-bucket in
    parallel, add the broadcast cumulative bucket offset.

    The input feeds two consumers (the in-bucket window and the bucket
    counts), and chained rank calls compound that fan-out (r10 plan
    audit: rfm's three chained ranks re-scanned the fact lineage 32x).
    A SIZE-GATED cut bounds it: above materialize_if_large's threshold
    the input is stored once (at corpus scale the cut saves the
    re-scans; at test scale inline recompute stays faster — the r7
    copurchase A/B)."""
    from pyspark.sql import Window

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize_if_large,
    )

    df = materialize_if_large(df, f"rr_{rank_col.strip('_')}_")
    b = F.floor(F.col(value_col) / F.lit(bucket_width)).cast("long")
    staged = df.withColumn("__rb", b)
    counts = staged.groupBy("__rb").agg(F.count(F.lit(1)).alias("__bn"))
    w_off = Window.orderBy("__rb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__rb",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__rb").orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    return (
        staged.withColumn("__intra", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "__rb")
        .withColumn(
            rank_col, (F.col("__intra") + F.col("__off")).cast("long")
        )
        .drop("__rb", "__intra", "__off")
    )


def rfm_scores(
    events: DataFrame,
    target_type: str = "purchase",
    n_tiles: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation with
    EXACT quintile scores — the classic marketing-base cut, built on
    the same scale discipline as ``value_decile_transition``: each
    dimension's global rank comes from the range-bucket + broadcast-
    offset idiom (no table-spanning window), and the tile is the
    closed-form (n_tiles*(r−1)) div n.

    Scores are 1..n_tiles with n_tiles best: frequency/monetary rank
    ascending (spend more = higher score); recency INVERTS (fewer days
    since the last purchase = higher score). Ties break on the user id
    — the unique total order both engines replay. Returns
    (user, recency_days, frequency, monetary_cents, r_score, f_score,
    m_score, rfm_segment) with segment = 100r + 10f + m.
    """
    qv = (
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv")
    )
    base = events.filter(F.col(type_col) == target_type).select(
        F.col(user_col).alias("user"),
        F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).alias(
            "__d"
        ),
        qv,
    )
    span = base.agg(F.max("__d").alias("__today"))
    per_user = (
        base.groupBy("user")
        .agg(
            F.max("__d").alias("__last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            # coalesce(0): a user whose every purchase value is NULL has
            # zero RECORDED spend, not an unrankable NULL that silently
            # drops them from the monetary rank bucket join on one
            # engine only (r9 fuzz sweep, "nulls" seed)
            F.coalesce(F.sum("__qv"), F.lit(0))
            .cast("long")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(span))
        .withColumn(
            "recency_days",
            (F.col("__today") - F.col("__last")).cast("long"),
        )
        .drop("__last", "__today")
    )
    # The user-grain rollup feeds SEVEN consumers before the r11 cut:
    # each chained _range_rank scans its input twice (bucket counts +
    # in-bucket window), compounding to 2^3 replays of the per_user
    # lineage, and the __n crossJoin subtree re-executed the whole
    # three-rank tower once more (the rank_dependence lesson, item 6).
    # One stored copy of the rollup (user-count-bounded — an Aggregate
    # output, reduced provenance) collapses all of it to cheap scans:
    # measured 1.22s -> 0.95s warm / 3.90s -> 1.21s cold at sf0.1.
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize,
    )

    per_user = materialize(per_user, "rfm_per_user_")
    ranked = _range_rank(per_user, "recency_days", "user", 4, "__rr")
    ranked = _range_rank(ranked, "frequency", "user", 4, "__rf")
    ranked = _range_rank(ranked, "monetary_cents", "user", 5_000, "__rm")
    # _range_rank is 1:1 row-preserving, so the tile denominator __n can
    # count the STORED rollup instead of re-executing the rank tower.
    n = per_user.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    scored = ranked.crossJoin(F.broadcast(n))

    def tile(rank_col):
        return (
            (
                F.lit(n_tiles) * (F.col(rank_col) - 1)
                - (F.lit(n_tiles) * (F.col(rank_col) - 1)) % F.col("__n")
            )
            / F.col("__n")
        ).cast("long")

    r_score = (F.lit(n_tiles) - tile("__rr")).cast("long")
    f_score = (tile("__rf") + 1).cast("long")
    m_score = (tile("__rm") + 1).cast("long")
    return scored.select(
        "user",
        "recency_days",
        "frequency",
        "monetary_cents",
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
        (r_score * 100 + f_score * 10 + m_score).alias("rfm_segment"),
    )


def seasonal_naive_backtest(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
    season_days: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast backtest: predict every day by the value
    ``season_days`` earlier and report the exact error mass — the
    baseline every fancier forecaster must beat, and the honest way to
    quantify how seasonal a series is (a weekly series has tiny MAE at
    season 7, huge at 5).

    The forecast join is the epoch-day equi-join of the span-bounded
    rollup with itself (calendar-correct: a missing day simply yields
    no forecast); absolute errors are exact integers; MAE and WAPE are
    ONE divide each. Returns one row
    (n_forecasts, total_abs_err, mae, total_actual, wape).
    """
    d = F.datediff(F.col(day_col), F.lit("1970-01-01")).cast("long")
    x = F.col(value_col).cast("long")
    base = daily.select(d.alias("__d"), x.alias("__x"))
    hist = base.select(
        (F.col("__d") + F.lit(season_days)).alias("__d"),
        F.col("__x").alias("__pred"),
    )
    joined = base.join(hist, "__d")
    err = F.abs(F.col("__x") - F.col("__pred"))
    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_forecasts"),
        F.sum(err).cast("long").alias("total_abs_err"),
        F.sum(F.abs(F.col("__x"))).cast("long").alias("total_actual"),
    )
    return agg.select(
        "n_forecasts",
        "total_abs_err",
        (
            F.col("total_abs_err").cast("double")
            / F.col("n_forecasts").cast("double")
        ).alias("mae"),
        "total_actual",
        (
            F.col("total_abs_err").cast("double")
            / F.col("total_actual").cast("double")
        ).alias("wape"),
    )


def daily_peaks(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
) -> DataFrame:
    """Strict local maxima of a day-grain series with a simple
    prominence measure (x minus the larger CALENDAR neighbor) — the
    spike finder next to ``daily_anomaly_robust_z``'s distributional
    score: a peak is local shape, an anomaly is global scale; a
    promo-day shows in both, a drifting baseline only in one.

    Calendar-correct: neighbors are day-1/day+1 values from the
    epoch-day self-joins of the span-bounded rollup, so a value beside
    a data GAP has no neighbor on that side and cannot be a peak there
    (peaks need BOTH neighbors present and strictly smaller). All
    integers; prominence is an exact integer difference. Returns
    (day, x, prev_x, next_x, is_peak, prominence).
    """
    d = F.datediff(F.col(day_col), F.lit("1970-01-01")).cast("long")
    x = F.col(value_col).cast("long")
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # day-grid cut: bounded rollup, multiple consumers (r10 plan audit)
    base = materialize(
        daily.select(F.col(day_col), d.alias("__d"), x.alias("__x")),
        "peaks_base_",
    )
    prev = base.select(
        (F.col("__d") + 1).alias("__d"), F.col("__x").alias("prev_x")
    )
    nxt = base.select(
        (F.col("__d") - 1).alias("__d"), F.col("__x").alias("next_x")
    )
    joined = base.join(prev, "__d", "left").join(nxt, "__d", "left")
    is_peak = (
        F.col("prev_x").isNotNull()
        & F.col("next_x").isNotNull()
        & (F.col("__x") > F.col("prev_x"))
        & (F.col("__x") > F.col("next_x"))
    )
    prominence = F.when(
        is_peak, F.col("__x") - F.greatest(F.col("prev_x"), F.col("next_x"))
    ).cast("long")
    return joined.select(
        F.col(day_col),
        F.col("__x").alias(value_col),
        "prev_x",
        "next_x",
        is_peak.alias("is_peak"),
        prominence.alias("prominence"),
    )


def lorenz_deciles(
    df: DataFrame,
    unit_col: str,
    amount_col: str,
    n_tiles: int = 10,
    bucket_width: int = 5_000,
) -> DataFrame:
    """Lorenz curve points over units ranked by amount — "the top
    decile holds X% of revenue", the inequality curve whose area gap is
    the Gini (``token_gini_docs`` reports the scalar for tokens; this
    gives the auditable per-decile CURVE for any unit/amount pair).

    Exact deciles via the range-bucket rank idiom (no table-spanning
    window) under the unique (amount, unit) ascending order; per-decile
    integer amount sums; the cumulative share is computed over the
    n_tiles-row rollup (bounded window) with ONE divide per row.
    Returns (decile, n_units, decile_amount, cum_amount, cum_share),
    decile 0 = poorest.
    """
    from pyspark.sql import Window

    staged = df.select(
        F.col(unit_col).alias("__u"),
        F.col(amount_col).cast("long").alias("__a"),
    # explicit: a NULL amount is unrankable. It would silently fall out
    # of the range-bucket join anyway (NULL keys never match) while a
    # SQL twin's row_number KEEPS it — the engines must agree on the
    # population, not rely on join accidents (r9 fuzz, "nulls" seed).
    ).filter(F.col("__a").isNotNull())
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # Store the unit-grain input once under the rank fan-out (r12, the
    # r11 rfm_scores pattern): _range_rank scans its input twice and the
    # n/total denominator re-executed the whole ranked tower once more.
    # _range_rank is 1:1 row-preserving (NULL amounts already filtered),
    # and __a is untouched by it, so counting/summing the STORE is
    # value-identical to aggregating the ranked output — the fact lineage
    # now runs exactly once, inside the store's producer job.
    staged = materialize(staged, "lorenz_staged_")
    ranked = _range_rank(staged, "__a", "__u", bucket_width, "__r")
    n_row = staged.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__a").cast("long").alias("__total"),
    )
    tiled = ranked.crossJoin(F.broadcast(n_row)).withColumn(
        "decile",
        (
            (
                F.lit(n_tiles) * (F.col("__r") - 1)
                - (F.lit(n_tiles) * (F.col("__r") - 1)) % F.col("__n")
            )
            / F.col("__n")
        ).cast("long"),
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("__a").cast("long").alias("decile_amount"),
        F.max("__total").alias("__total"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.withColumn(
        "cum_amount", F.sum("decile_amount").over(w).cast("long")
    ).select(
        "decile",
        "n_units",
        "decile_amount",
        "cum_amount",
        (
            F.col("cum_amount").cast("double")
            / F.col("__total").cast("double")
        ).alias("cum_share"),
    )


def deseasonalized_anomalies(
    events: DataFrame,
    target_type: str = "purchase",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Seasonally-adjusted robust daily anomalies — the composition
    that fixes ``daily_anomaly_robust_z``'s one blind spot: on a weekly-
    cyclic series the plain robust z flags every Saturday. Here each
    day's count is first centered by its WEEKDAY's median (the
    dow_seasonality axis), and the median/MAD z runs on the residuals —
    a spike only flags if it is anomalous FOR THAT WEEKDAY.

    Exactness: weekday = (epoch_day + 3) mod 7 pure integer; the
    per-dow median is an exact interpolated percentile over the
    span-bounded day rollup sliced 7 ways (each slice metadata-sized);
    residual median/MAD the same. Returns
    (day, dow, n_events, dow_median, residual, robust_z); z NULL on a
    flat residual series.
    """
    daily = (
        events.filter(F.col(type_col) == target_type)
        .groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .withColumn(
            "dow",
            (
                (F.datediff(F.col("day"), F.lit("1970-01-01")) + 3) % 7
            ).cast("long"),
        )
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # day-grid cut: bounded rollup, multiple consumers (r10 plan audit)
    daily = materialize(daily, "deseason_daily_")
    dow_med = daily.groupBy("dow").agg(
        F.percentile(F.col("n_events").cast("double"), F.lit(0.5)).alias(
            "dow_median"
        )
    )
    resid = daily.join(F.broadcast(dow_med), "dow").withColumn(
        "residual", F.col("n_events").cast("double") - F.col("dow_median")
    )
    med = resid.agg(
        F.percentile(F.col("residual"), F.lit(0.5)).alias("__med")
    )
    dev = resid.crossJoin(F.broadcast(med)).withColumn(
        "__dev", F.abs(F.col("residual") - F.col("__med"))
    )
    mad = dev.agg(F.percentile(F.col("__dev"), F.lit(0.5)).alias("__mad"))
    scored = dev.crossJoin(F.broadcast(mad))
    z = F.when(
        F.col("__mad") > 0.0,
        (F.col("residual") - F.col("__med"))
        / (F.lit(1.4826) * F.col("__mad")),
    )
    return scored.select(
        "day", "dow", "n_events", "dow_median", "residual",
        z.alias("robust_z"),
    )


def event_path_trigrams(
    events: DataFrame,
    top_n: int = 50,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    max_user_events: int | None = 100_000,
) -> DataFrame:
    """Top third-order behavioral paths: the (t1 -> t2 -> t3) event-type
    trigrams across every user's time-ordered stream — the sequence-mining
    step past ``event_transitions``' first-order Markov edges (a funnel
    like view->click->purchase only shows up at third order).

    One user-keyed window shuffle (lead, lead2 under the deterministic
    (ts, event_id) order), one tiny trigram rollup, exact counts, and a
    deterministic top-N (count desc, then path asc — the tie-break both
    engines replay). Returns (t1, t2, t3, n_paths).

    ``max_user_events`` is the hot-user cap (the max_turns/max_basket
    convention): a single bot user's window partition is one task — the
    round-6 stress measured 231x stragglers on exactly this shape — and
    its machine-generated paths poison the path table anyway. Over-cap
    users are dropped via a broadcast anti-join of the (tiny) over-cap
    head; non-binding at organic scale factors (oracle-parity-pinned).
    """
    if max_user_events is not None:
        over = (
            events.groupBy(F.col(user_col))
            .agg(F.count(F.lit(1)).alias("__ne"))
            .filter(F.col("__ne") > max_user_events)
            .select(user_col)
        )
        events = events.join(F.broadcast(over), user_col, "left_anti")
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    tri = (
        events.select(
            F.col(type_col).alias("t1"),
            F.lead(type_col, 1).over(w).alias("t2"),
            F.lead(type_col, 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
    )
    return tri.orderBy(
        F.col("n_paths").desc(), "t1", "t2", "t3"
    ).limit(top_n)


def rate_ratio_two_periods(
    events: DataFrame,
    target_type: str = "purchase",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Two-period Poisson rate comparison: split the observed span at its
    midpoint day and test whether the target event RATE (count per day
    of exposure) changed — the "did volume actually shift or did the
    window just get longer" check behind every before/after dashboard
    claim.

    Counts and exposures are exact integers from one filtered rollup +
    one min/max scan; the unconditional z

        z = (r1 − r2) / sqrt(c1/e1² + c2/e2²),  r_i = c_i/e_i

    is a fixed IEEE tree over exactly-cast int64 leaves (no logs), so
    both engines agree bit-for-bit. Returns one row: (c1, e1_days,
    rate1, c2, e2_days, rate2, rate_ratio, z_rate); NULL z when either
    period has zero events (no variance basis), NULL ratio when period
    2 is empty.
    """
    days = events.filter(F.col(type_col) == target_type).select(
        F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).alias("__d")
    )
    span = days.agg(
        F.min("__d").alias("__lo"), F.max("__d").alias("__hi")
    )
    mid = (F.col("__lo") + F.col("__hi") - (F.col("__lo") + F.col("__hi")) % 2) / 2
    split = span.select(
        "__lo", "__hi", mid.cast("long").alias("__mid")
    )
    counted = days.crossJoin(F.broadcast(split)).agg(
        F.sum(F.when(F.col("__d") <= F.col("__mid"), 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("__d") > F.col("__mid"), 1).otherwise(0))
        .cast("long")
        .alias("c2"),
        F.max(F.col("__mid") - F.col("__lo") + 1).cast("long").alias("e1_days"),
        F.max(F.col("__hi") - F.col("__mid")).cast("long").alias("e2_days"),
    )
    r1 = F.col("c1").cast("double") / F.col("e1_days").cast("double")
    r2 = F.col("c2").cast("double") / F.col("e2_days").cast("double")
    se = F.sqrt(
        F.col("c1").cast("double")
        / (F.col("e1_days").cast("double") * F.col("e1_days").cast("double"))
        + F.col("c2").cast("double")
        / (F.col("e2_days").cast("double") * F.col("e2_days").cast("double"))
    )
    ok = (F.col("c1") > 0) & (F.col("c2") > 0) & (F.col("e2_days") > 0)
    return counted.select(
        "c1",
        "e1_days",
        r1.alias("rate1"),
        "c2",
        "e2_days",
        F.when(F.col("e2_days") > 0, r2).alias("rate2"),
        F.when(ok, r1 / r2).alias("rate_ratio"),
        F.when(ok, (r1 - r2) / se).alias("z_rate"),
    )


def runs_test_daily(
    events: DataFrame,
    target_type: str = "purchase",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue vs its median: are the
    above/below-median days RANDOMLY interleaved, or do they clump
    (trend/regime) or alternate (overcorrection)? The significance
    companion to ``updown_streaks``' descriptive streak table.

    All machinery on the span-bounded day rollup: exact integer daily
    cents, the exact LOWER median via the ceil(n/2) order statistic on
    the bounded rollup, median-tied days excluded (the standard
    convention), runs counted with one lag over the day order. E[R] and
    V[R] are the closed forms in n1, n2; z is one fixed IEEE tree over
    exact int64 leaves. Returns one row: (n_days, n_above, n_below,
    median_cents, n_runs, z_runs); NULL z when either side is empty or
    V = 0.
    """
    daily = (
        events.filter(F.col(type_col) == target_type)
        .select(
            F.to_date(F.col(ts_col)).alias("__day"),
            F.round(F.col(value_col).cast("double") * scale, 0)
            .cast("long")
            .alias("__cents"),
        )
        .groupBy("__day")
        .agg(F.sum("__cents").cast("long").alias("__x"))
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # day-grid cut: bounded rollup, multiple consumers (r10 plan audit)
    daily = materialize(daily, "runs_daily_")
    w_ord = Window.orderBy(F.col("__x").asc(), F.col("__day").asc())
    ranked = daily.withColumn("__rn", F.row_number().over(w_ord))
    n_row = daily.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    med = (
        ranked.crossJoin(F.broadcast(n_row))
        .filter(
            F.col("__rn")
            == (F.col("__n") - F.col("__n") % 2) / 2 + F.col("__n") % 2
        )
        .select(F.col("__x").alias("__med"))
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("__x") != F.col("__med"))
        .select(
            "__day",
            (F.col("__x") > F.col("__med")).alias("__up"),
            "__med",
        )
    )
    w_day = Window.orderBy("__day")
    runs = signed.withColumn(
        "__new",
        F.when(
            F.lag("__up").over(w_day).isNull()
            | (F.lag("__up").over(w_day) != F.col("__up")),
            1,
        ).otherwise(0),
    )
    agg = runs.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("__up"), 1).otherwise(0)).cast("long").alias("n_above"),
        F.sum(F.when(~F.col("__up"), 1).otherwise(0)).cast("long").alias("n_below"),
        F.max("__med").cast("long").alias("median_cents"),
        F.sum("__new").cast("long").alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    nn = n1 + n2
    e_r = F.lit(2.0) * n1 * n2 / nn + F.lit(1.0)
    v_r = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
    ) / (nn * nn * (nn - F.lit(1.0)))
    ok = (F.col("n_above") > 0) & (F.col("n_below") > 0) & (v_r > 0)
    return agg.select(
        "n_days",
        "n_above",
        "n_below",
        "median_cents",
        "n_runs",
        F.when(ok, (F.col("n_runs").cast("double") - e_r) / F.sqrt(v_r)).alias(
            "z_runs"
        ),
    )


def activity_heatmap_dow_hour(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    target_type: str | None = None,
) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap with exact shares and
    peak flags — the load-shape table behind capacity planning and
    send-time optimization. Weekday uses the integer (epoch_day + 3) % 7
    convention (Monday = 0; 1970-01-01 was a Thursday) so both engines
    derive it from exact arithmetic rather than locale-dependent
    date-part functions. One map-side-combinable groupBy onto the
    bounded 7×24 grid; share is one IEEE divide; the peak flag compares
    against the grid max (a window over ≤168 rows). Returns
    (dow, hour, n_events, share, is_peak).
    """
    base = events
    if target_type is not None:
        base = base.filter(F.col(type_col) == target_type)
    cells = (
        base.select(
            (
                (
                    F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
                    + F.lit(3)
                )
                % 7
            ).cast("long").alias("dow"),
            F.hour(F.col(ts_col)).cast("long").alias("hour"),
        )
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return cells.select(
        "dow",
        "hour",
        "n_events",
        (
            F.col("n_events").cast("double")
            / F.sum("n_events").over(w_all).cast("double")
        ).alias("share"),
        (F.col("n_events") == F.max("n_events").over(w_all)).alias("is_peak"),
    )


def kaplan_meier_curve(
    events: DataFrame,
    target_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Kaplan-Meier time-to-first-``target_type`` survival curve (day
    granularity): a user's clock starts at their first event; the event
    of interest is their first ``target_type`` event; users who never
    convert are right-censored at their last observed day. Returns one
    row per event time, ordered by ``t_day``: (t_day, n_risk, d_event,
    c_censored, log_survival, survival_zero).

    Cross-engine exactness: the per-step factor ln(1 - d/n) is computed
    as ln(n - d) - ln(n) over exact integer risk-set counts, quantized
    to integer micros (round(x * 1e6) as BIGINT), and the survival
    product becomes an exact int64 running SUM over the span-bounded
    duration grid — ``log_survival`` is the unique correctly-rounded
    int64 -> double conversion divided by 1e6 (the doclen_lognormal_fit
    convention; exp is deliberately never taken — it is the one libm
    function with no cross-engine bit-parity precedent here). When the
    risk set is exhausted (d == n: the largest observation is an event,
    survival hits exactly 0) ``log_survival`` is NULL from that step on
    and ``survival_zero`` (never NULL) marks the tail.

    Scale shape: one user-keyed shuffle for the per-user rollup, then
    all windows run over the duration grid, which is bounded by the
    day-span of the corpus (the cusum_changepoint discipline) — never
    by user count. NULL timestamps are excluded up front on both
    engines (window NULL-ordering is an engine divergence).
    """
    days = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("__u"),
        F.to_date(F.col(ts_col)).alias("__d"),
        F.when(F.col(type_col) == target_type, 1).otherwise(0).alias("__hit"),
    )
    per_user = days.groupBy("__u").agg(
        F.min("__d").alias("__first"),
        F.max("__d").alias("__last"),
        F.min(F.when(F.col("__hit") == 1, F.col("__d"))).alias("__conv"),
    )
    flagged = per_user.select(
        F.datediff(
            F.coalesce(F.col("__conv"), F.col("__last")), F.col("__first")
        )
        .cast("long")
        .alias("t_day"),
        F.when(F.col("__conv").isNotNull(), 1).otherwise(0).alias("__e"),
    )
    grid = flagged.groupBy("t_day").agg(
        F.sum("__e").cast("long").alias("d_event"),
        F.sum(F.lit(1) - F.col("__e")).cast("long").alias("c_censored"),
    )
    w_rev = Window.orderBy(F.col("t_day").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.withColumn(
        "n_risk",
        F.sum(F.col("d_event") + F.col("c_censored"))
        .over(w_rev)
        .cast("long"),
    )
    w_fwd = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    micros = F.when(
        F.col("d_event") < F.col("n_risk"),
        F.round(
            (
                F.log((F.col("n_risk") - F.col("d_event")).cast("double"))
                - F.log(F.col("n_risk").cast("double"))
            )
            * F.lit(1000000.0),
            0,
        ).cast("long"),
    )
    return (
        risk.withColumn("__m", micros)
        .withColumn(
            "__zero",
            F.max(
                F.when(F.col("d_event") >= F.col("n_risk"), 1).otherwise(0)
            ).over(w_fwd),
        )
        .withColumn("__s", F.sum("__m").over(w_fwd))
        .filter(F.col("d_event") > 0)
        .select(
            "t_day",
            "n_risk",
            "d_event",
            "c_censored",
            F.when(
                F.col("__zero") == 0,
                F.col("__s").cast("double") / F.lit(1000000.0),
            ).alias("log_survival"),
            (F.col("__zero") == 1).alias("survival_zero"),
        )
    )


def logrank_two_cohorts(
    events: DataFrame,
    target_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Log-rank test comparing time-to-first-``target_type`` hazards of
    the two A/A-style experiment buckets (user-id parity — the
    deterministic stand-in for hash-bucketed assignment), under the same
    clock/censoring model as :func:`kaplan_meier_curve`. Returns exactly
    ONE row: (n_users_cohort, n_users_rest, n_event_times, o1, e1, v1,
    logrank_chi2) — the bucket-0 observed conversions, their
    hypergeometric expectation and variance, and the 1-df chi-square.
    On a healthy assignment the statistic is small — this is the
    experiment-health (A/A) shape of the test.

    Exactness: per event time the expectation term d*n1/n and variance
    term d*n1*n0*(n-d) / (n*n*(n-1)) are each ONE fixed IEEE tree over
    exact integer risk-set counts, quantized to integer micros and
    summed in int64; the final statistic is two subtractions/divides on
    int64->double casts. Times where the pooled risk set is a single
    user carry no information and are skipped on both engines. Empty
    inputs (or zero observed conversions) keep the one-row contract
    with zero counts and NULL e1/v1/chi2.

    Scale shape: identical to the KM curve — one user-keyed shuffle,
    then span-bounded grid windows; the bucket flag is exact integer
    arithmetic folded into the same rollup.
    """
    days = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("__u"),
        F.to_date(F.col(ts_col)).alias("__d"),
        F.when(F.col(type_col) == target_type, 1).otherwise(0).alias("__hit"),
    )
    per_user = days.groupBy("__u").agg(
        F.min("__d").alias("__first"),
        F.max("__d").alias("__last"),
        F.min(F.when(F.col("__hit") == 1, F.col("__d"))).alias("__conv"),
    )
    flagged = per_user.select(
        F.datediff(
            F.coalesce(F.col("__conv"), F.col("__last")), F.col("__first")
        )
        .cast("long")
        .alias("t_day"),
        F.when(F.col("__conv").isNotNull(), 1).otherwise(0).alias("__e"),
        F.when(F.pmod(F.col("__u"), F.lit(2)) == 0, 1)
        .otherwise(0)
        .alias("__grp"),
    )
    grid = flagged.groupBy("t_day").agg(
        F.sum(F.col("__e") * F.col("__grp")).cast("long").alias("__d1"),
        F.sum(F.col("__e") * (F.lit(1) - F.col("__grp")))
        .cast("long")
        .alias("__d0"),
        F.sum(F.col("__grp")).cast("long").alias("__r1"),
        F.sum(F.lit(1) - F.col("__grp")).cast("long").alias("__r0"),
    )
    w_rev = Window.orderBy(F.col("t_day").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.select(
        "t_day",
        "__d1",
        "__d0",
        F.sum("__r1").over(w_rev).cast("long").alias("__n1"),
        F.sum("__r0").over(w_rev).cast("long").alias("__n0"),
    )
    d = (F.col("__d1") + F.col("__d0")).cast("long")
    n = (F.col("__n1") + F.col("__n0")).cast("long")
    terms = risk.filter(d > 0).filter(n > 1).select(
        F.col("__d1"),
        F.round(
            d.cast("double")
            * F.col("__n1").cast("double")
            / n.cast("double")
            * F.lit(1000000.0),
            0,
        )
        .cast("long")
        .alias("__e1m"),
        F.round(
            d.cast("double")
            * F.col("__n1").cast("double")
            * F.col("__n0").cast("double")
            * (n - d).cast("double")
            / (
                n.cast("double")
                * n.cast("double")
                * (n - F.lit(1)).cast("double")
            )
            * F.lit(1000000.0),
            0,
        )
        .cast("long")
        .alias("__vm"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_event_times"),
        F.coalesce(F.sum("__d1"), F.lit(0)).cast("long").alias("o1"),
        F.sum("__e1m").cast("long").alias("__e1mu"),
        F.sum("__vm").cast("long").alias("__vmu"),
    )
    sizes = flagged.agg(
        F.coalesce(F.sum("__grp"), F.lit(0))
        .cast("long")
        .alias("n_users_cohort"),
        F.coalesce(F.sum(F.lit(1) - F.col("__grp")), F.lit(0))
        .cast("long")
        .alias("n_users_rest"),
    )
    ome = (
        F.col("o1").cast("double")
        - F.col("__e1mu").cast("double") / F.lit(1000000.0)
    )
    return sizes.crossJoin(F.broadcast(agg)).select(
        "n_users_cohort",
        "n_users_rest",
        "n_event_times",
        "o1",
        (F.col("__e1mu").cast("double") / F.lit(1000000.0)).alias("e1"),
        (F.col("__vmu").cast("double") / F.lit(1000000.0)).alias("v1"),
        F.when(
            F.col("__vmu") > 0,
            (ome * ome) / (F.col("__vmu").cast("double") / F.lit(1000000.0)),
        ).alias("logrank_chi2"),
    )


def page_hinkley(
    daily: DataFrame,
    day_col: str = "day",
    x_col: str = "x",
    delta_micros: int = 0,
) -> DataFrame:
    """Page-Hinkley upward-shift detector over an ordered integer
    series (typically the exact-cents daily revenue rollup): the
    sequential cousin of :func:`cusum_changepoint` — PH_t =
    m_t - min_{i<=t} m_i with m_t = sum_{i<=t} (x_i - mean_i - delta),
    where mean_i is the RUNNING mean (cusum uses the global mean, so it
    needs the full series; PH is the form a streaming monitor applies).
    Returns one row per day: (day, x, ph_micros, ph, is_peak).

    Exactness: the running mean prefix_i / i is one fixed IEEE tree per
    row over exact int64 prefix sums, quantized to integer micros; m_t,
    its running minimum, and PH_t then stay in exact int64 arithmetic
    end-to-end — ``ph`` is the unique correctly-rounded int64 -> double
    conversion divided by 1e6 and ``is_peak`` (never NULL) marks the
    arg-max days. ``delta_micros`` is the drift allowance in micros.

    Scale shape: all windows run over the span-bounded day grid (the
    cusum_changepoint discipline) — the data-sized pass is whatever
    rollup produced ``daily``.
    """
    w_fwd = Window.orderBy(day_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pref = daily.select(
        F.col(day_col).alias("day"),
        F.col(x_col).cast("long").alias("x"),
        F.sum(F.col(x_col).cast("long")).over(w_fwd).alias("__prefix"),
        F.row_number().over(Window.orderBy(day_col)).cast("long").alias("__k"),
    )
    term = (
        F.round(
            (
                F.col("x").cast("double")
                - F.col("__prefix").cast("double") / F.col("__k").cast("double")
            )
            * F.lit(1000000.0),
            0,
        ).cast("long")
        - F.lit(int(delta_micros))
    )
    walked = (
        pref.withColumn("__t", term)
        .withColumn("__m", F.sum("__t").over(w_fwd))
        .withColumn("__mmin", F.min(F.col("__m")).over(w_fwd))
        .withColumn("ph_micros", (F.col("__m") - F.col("__mmin")).cast("long"))
    )
    return walked.select(
        "day",
        "x",
        "ph_micros",
        (F.col("ph_micros").cast("double") / F.lit(1000000.0)).alias("ph"),
        F.coalesce(
            F.col("ph_micros") == F.max("ph_micros").over(w_all), F.lit(False)
        ).alias("is_peak"),
    )


def holt_linear_smooth(
    daily: DataFrame,
    day_col: str = "day",
    x_col: str = "x",
) -> DataFrame:
    """Holt double-exponential (level + trend) smoothing of an ordered
    integer series — the first true forecasting recurrence in the
    engine (seasonal_naive_backtest only replays history). alpha = 1/5
    and beta = 1/10 are FIXED RATIONALS and the whole state evolves in
    exact integer MILLIS of the input unit: the update
    l_t = (x_t*1000 + 4*(l+b)) / 5, b_t = ((l_t - l_prev) + 9*b) / 10
    uses round-half-up floor division ((2n + d) div 2d via nonneg mod),
    so both engines walk bit-identical int64 state with NO float in the
    loop. Returns exactly ONE row: (n_days, level_millis, trend_millis,
    level, trend, forecast_next) — the floats are single correctly-
    rounded int64 -> double casts divided by 1000.

    Spark-first shape: the recurrence is inherently sequential, but the
    series is the span-bounded day grid (the cusum discipline), so the
    fold runs JVM-side as ONE ``F.aggregate`` over the array_sort'ed
    collected grid — no Python, no driver loop, no row-at-a-time UDF;
    the data-sized pass is whatever rollup produced ``daily``. The
    DuckDB twin is a recursive CTE applying the identical integer
    update. Exactness bound: |2*state| must stay below 2^53 for the
    exact-division-through-double step — at cents input that is ~45
    trillion per day, far above any benchmarked rollup; document before
    feeding raw micro-units.

    NULL observations are EXCLUDED up front (a day whose rollup is NULL
    is a missing reading, not a zero) — this is also load-bearing for
    correctness: ``F.aggregate`` coerces each merge result to the
    non-nullable schema of ``init``, so a NULL leaking into the fold
    state would silently decay to 0 instead of poisoning the output
    (verified against Spark 4.1; the DuckDB twin filters identically).
    """

    def _rnd_div(n, d: int):
        # round-half-up floor division on exact int64 columns: the
        # intermediate (n - pmod) is exactly divisible by d, so the
        # double-typed `/` is exact below 2^53 and the cast is lossless
        num = n * F.lit(2) + F.lit(d)
        dd = F.lit(2 * d)
        return ((num - F.pmod(num, dd)) / dd).cast("long")

    daily = daily.filter(F.col(x_col).isNotNull())
    arr = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(day_col).alias("d"),
                    F.col(x_col).cast("long").alias("x"),
                )
            )
        ).alias("__a"),
    )

    def _step(acc, row):
        xm = row["x"] * F.lit(1000)
        first = acc["i"] == 0
        lt = F.when(first, xm).otherwise(
            _rnd_div(xm + F.lit(4) * (acc["l"] + acc["b"]), 5)
        )
        bt = F.when(first, F.lit(0).cast("long")).otherwise(
            _rnd_div((lt - acc["l"]) + F.lit(9) * acc["b"], 10)
        )
        return F.struct(
            (acc["i"] + F.lit(1)).cast("long").alias("i"),
            lt.cast("long").alias("l"),
            bt.cast("long").alias("b"),
        )

    init = F.struct(
        F.lit(0).cast("long").alias("i"),
        F.lit(0).cast("long").alias("l"),
        F.lit(0).cast("long").alias("b"),
    )
    folded = arr.select(
        "n_days",
        # fold-state: NULL x rows filtered upstream, every _step branch
        # is a total long expression; non-nullable init safe
        F.aggregate(F.col("__a"), init, _step).alias("__s"),
    )
    has = F.col("n_days") > 0
    lvl = F.col("__s")["l"]
    trd = F.col("__s")["b"]
    return folded.select(
        "n_days",
        F.when(has, lvl).alias("level_millis"),
        F.when(has, trd).alias("trend_millis"),
        F.when(has, lvl.cast("double") / F.lit(1000.0)).alias("level"),
        F.when(has, trd.cast("double") / F.lit(1000.0)).alias("trend"),
        F.when(has, (lvl + trd).cast("double") / F.lit(1000.0)).alias(
            "forecast_next"
        ),
    )


def nelson_aalen_curve(
    events: DataFrame,
    target_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard curve for the same
    time-to-first-``target_type`` model as :func:`kaplan_meier_curve`:
    H(t) = sum_{t_i <= t} d_i / n_i. Where KM answers "what fraction
    survives past t", Nelson-Aalen answers "how much conversion pressure
    has accumulated by t" — additive, so it is the form rate
    comparisons and piecewise-exponential fits consume. Returns one row
    per event time: (t_day, n_risk, d_event, c_censored,
    cum_hazard_micros, cum_hazard).

    Exactness: each d/n increment is ONE fixed IEEE tree over exact
    integer risk-set counts quantized to integer micros; the cumulative
    hazard is an exact int64 running sum over the span-bounded duration
    grid (``cum_hazard`` is the correctly-rounded int64 -> double cast
    / 1e6). Unlike the KM product there is no zero-survival singularity
    — d == n just contributes a full 1e6 micros step.

    Scale shape: identical to the KM curve — one user-keyed shuffle,
    then span-bounded grid windows; deliberately self-contained rather
    than sharing a grid helper with KM (the round-8 kruskal refactor
    break is the cautionary tale for helper extraction on
    driver-pinned paths).
    """
    days = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("__u"),
        F.to_date(F.col(ts_col)).alias("__d"),
        F.when(F.col(type_col) == target_type, 1).otherwise(0).alias("__hit"),
    )
    per_user = days.groupBy("__u").agg(
        F.min("__d").alias("__first"),
        F.max("__d").alias("__last"),
        F.min(F.when(F.col("__hit") == 1, F.col("__d"))).alias("__conv"),
    )
    flagged = per_user.select(
        F.datediff(
            F.coalesce(F.col("__conv"), F.col("__last")), F.col("__first")
        )
        .cast("long")
        .alias("t_day"),
        F.when(F.col("__conv").isNotNull(), 1).otherwise(0).alias("__e"),
    )
    grid = flagged.groupBy("t_day").agg(
        F.sum("__e").cast("long").alias("d_event"),
        F.sum(F.lit(1) - F.col("__e")).cast("long").alias("c_censored"),
    )
    w_rev = Window.orderBy(F.col("t_day").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.withColumn(
        "n_risk",
        F.sum(F.col("d_event") + F.col("c_censored"))
        .over(w_rev)
        .cast("long"),
    )
    w_fwd = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    step = F.round(
        F.col("d_event").cast("double")
        / F.col("n_risk").cast("double")
        * F.lit(1000000.0),
        0,
    ).cast("long")
    return (
        risk.withColumn("__h", step)
        .withColumn(
            "cum_hazard_micros", F.sum("__h").over(w_fwd).cast("long")
        )
        .filter(F.col("d_event") > 0)
        .select(
            "t_day",
            "n_risk",
            "d_event",
            "c_censored",
            "cum_hazard_micros",
            (
                F.col("cum_hazard_micros").cast("double") / F.lit(1000000.0)
            ).alias("cum_hazard"),
        )
    )


def holt_winters_weekly(
    daily: DataFrame,
    day_col: str = "day",
    x_col: str = "x",
) -> DataFrame:
    """Holt-Winters ADDITIVE smoothing with a weekly season — the
    seasonal extension of :func:`holt_linear_smooth` and the form a
    daily-revenue forecast actually needs (dow is the dominant cycle in
    event data; see dow_seasonality / activity_heatmap). alpha = 1/5,
    beta = 1/10, gamma = 1/10 are FIXED RATIONALS and level, trend, and
    the 7 seasonal slots all evolve in exact integer MILLIS with
    round-half-up floor division — both engines walk bit-identical
    int64 state, no float in the loop. Returns exactly ONE row:
    (n_days, level_millis, trend_millis, season_amplitude_millis,
    level, trend, forecast_next).

    Seasonal slots are indexed by the CALENDAR day-of-week of each
    observation ((epoch_day + 3) % 7, Monday = 0 — the
    activity_heatmap convention), NOT by row position, so missing days
    cannot shift the seasonal phase. Slots start at 0 and the first
    observation initializes level = x (its seasonal update is then
    exactly 0, so the uniform recurrence applies from row one).
    ``forecast_next`` = level + trend + slot(dow of last day + 1).
    NULL rollup days are excluded (missing readings, and the
    F.aggregate non-nullable-init contract — see holt_linear_smooth).

    Spark-first shape: ONE JVM-side ``F.aggregate`` over the
    array_sort'ed span-bounded day grid; the DuckDB twin is a recursive
    CTE over the identical integer update. Same 2^53 exactness bound as
    holt_linear_smooth.
    """

    def _rnd_div(n, d: int):
        num = n * F.lit(2) + F.lit(d)
        dd = F.lit(2 * d)
        return ((num - F.pmod(num, dd)) / dd).cast("long")

    daily = daily.filter(F.col(x_col).isNotNull())
    # pmod, not sign-following %: a pre-1970 day would otherwise yield a
    # negative dow that falls through the slot when-chain to NULL, which
    # the non-nullable F.aggregate init silently decays to 0 while the
    # SQL twin's CASE ELSE keeps walking finite state (r9 ADVICE).
    dow = F.pmod(
        F.datediff(F.col(day_col), F.lit("1970-01-01")) + F.lit(3),
        F.lit(7),
    ).cast("long")
    arr = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(day_col).alias("d"),
                    (F.col(x_col).cast("long") * F.lit(1000)).alias("xm"),
                    dow.alias("dow"),
                )
            )
        ).alias("__a"),
    )

    def _slot(acc, k: int):
        return acc[f"s{k}"]

    def _step(acc, row):
        sprev = F.when(row["dow"] == 0, _slot(acc, 0))
        for k in range(1, 7):
            sprev = sprev.when(row["dow"] == k, _slot(acc, k))
        first = acc["i"] == 0
        lt = F.when(first, row["xm"]).otherwise(
            _rnd_div(
                (row["xm"] - sprev) + F.lit(4) * (acc["l"] + acc["b"]), 5
            )
        )
        bt = F.when(first, F.lit(0).cast("long")).otherwise(
            _rnd_div((lt - acc["l"]) + F.lit(9) * acc["b"], 10)
        )
        snew = _rnd_div((row["xm"] - lt) + F.lit(9) * sprev, 10)
        fields = [
            (acc["i"] + F.lit(1)).cast("long").alias("i"),
            lt.cast("long").alias("l"),
            bt.cast("long").alias("b"),
        ]
        for k in range(7):
            fields.append(
                F.when(row["dow"] == k, snew)
                .otherwise(_slot(acc, k))
                .cast("long")
                .alias(f"s{k}")
            )
        return F.struct(*fields)

    init_fields = [
        F.lit(0).cast("long").alias("i"),
        F.lit(0).cast("long").alias("l"),
        F.lit(0).cast("long").alias("b"),
    ] + [F.lit(0).cast("long").alias(f"s{k}") for k in range(7)]
    folded = arr.select(
        "n_days",
        # fold-state: NULL x filtered upstream and the pmod dow keeps the
        # slot when-chain total (r9 ADVICE); non-nullable init safe
        F.aggregate(F.col("__a"), F.struct(*init_fields), _step).alias(
            "__s"
        ),
        # ANSI element_at(-1) throws on an empty array — guard the
        # empty-grid case explicitly (fuzz empty/nulls seeds)
        F.when(
            F.size(F.col("__a")) > 0, F.element_at(F.col("__a"), -1)["dow"]
        ).alias("__last_dow"),
    )
    has = F.col("n_days") > 0
    lvl = F.col("__s")["l"]
    trd = F.col("__s")["b"]
    slots = [F.col("__s")[f"s{k}"] for k in range(7)]
    next_dow = F.pmod(F.col("__last_dow") + F.lit(1), F.lit(7))
    s_next = F.when(next_dow == 0, slots[0])
    for k in range(1, 7):
        s_next = s_next.when(next_dow == k, slots[k])
    amplitude = F.greatest(*slots) - F.least(*slots)
    return folded.select(
        "n_days",
        F.when(has, lvl).alias("level_millis"),
        F.when(has, trd).alias("trend_millis"),
        F.when(has, amplitude).cast("long").alias(
            "season_amplitude_millis"
        ),
        F.when(has, lvl.cast("double") / F.lit(1000.0)).alias("level"),
        F.when(has, trd.cast("double") / F.lit(1000.0)).alias("trend"),
        F.when(
            has, (lvl + trd + s_next).cast("double") / F.lit(1000.0)
        ).alias("forecast_next"),
    )


def pettitt_changepoint(
    daily: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
) -> DataFrame:
    """Pettitt rank-based changepoint test over a day-grain metric
    series (wave 111) — the NONPARAMETRIC complement of
    ``cusum_changepoint``: CUSUM's mean-shift peak is only optimal-ish
    under roughly constant variance and no heavy tails, while Pettitt's
    statistic is a Mann-Whitney scan — K = max_t |U_t| with
    U_t = sum_{i<=t, j>t} sign(x_i - x_j) — so a single outlier day
    cannot fake (or hide) a shift. The standard retrospective
    "did the level change, and WHEN" test for metric series.

    Exact integer core: the O(n^2) pairwise definition collapses via
    the midrank identity U_t = sum_{i<=t} 2R_i - t(n+1) (verified under
    ties), with the DOUBLED midrank 2R_i = min_rn + max_rn over each
    tie group of the value ordering — all integers, so K and its argmax
    location are exact; the only float is the one-expression
    approximate significance p ~ 2*exp(-6K^2/(n^3+n^2)). Everything
    runs on the span-bounded day rollup (the cusum/mann_kendall
    argument): windows over a bounded materialized AGGREGATE, never
    base rows. Ties in the argmax resolve to the EARLIEST day via the
    integer struct max on (-k).

    Returns one row: (n_days, k_stat, u_at_change, change_day,
    p_approx) — NULLs (with n_days kept) when the series has fewer
    than 2 days, where a changepoint is undefined.
    """
    from pyspark.sql import Window

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    d, x = F.col(day_col), F.col(value_col).cast("long")
    # day-grid cut: bounded rollup, multiple consumers (rank windows,
    # totals) — the r10 plan-audit discipline
    base = materialize(
        daily.select(d.alias("day"), x.alias("x")), "pettitt_base_"
    )
    # doubled midranks: row_number over the (x, day) order is exact and
    # deterministic; each value-tie group's doubled midrank is
    # min_rn + max_rn (= 2 * average rank, integral by construction)
    w_rn = Window.orderBy("x", "day")
    rn = base.select(
        "day", "x", F.row_number().over(w_rn).cast("long").alias("__rn")
    )
    w_x = Window.partitionBy("x")
    r2 = rn.select(
        "day",
        (F.min("__rn").over(w_x) + F.max("__rn").over(w_x)).alias("__r2"),
    )
    w_day = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pref = r2.select(
        "day",
        F.sum("__r2").over(w_day).alias("__pr2"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("__k"),
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    # t ranges over 1..n-1: U_n is identically 0 (sum of doubled
    # midranks is n(n+1)), and a split AFTER the last day is no split
    scored = pref.crossJoin(F.broadcast(tot)).filter(
        F.col("__k") < F.col("__n")
    )
    u = F.col("__pr2") - F.col("__k") * (F.col("__n") + 1)
    agg = scored.agg(
        F.max(
            F.struct(
                F.abs(u).alias("k"),
                (-F.col("__k")).alias("nk"),
                F.col("day").alias("day"),
                u.alias("u"),
            )
        ).alias("__best"),
        F.max("__n").alias("__n"),
    )
    n_all = tot.select(F.col("__n").alias("n_days"))
    out = n_all.crossJoin(F.broadcast(agg.drop("__n")))
    nd = F.col("n_days").cast("double")
    p = F.lit(2.0) * F.exp(
        F.lit(-6.0)
        * F.col("__best.k").cast("double")
        * F.col("__best.k").cast("double")
        / (nd * nd * nd + nd * nd)
    )
    return out.select(
        "n_days",
        F.col("__best.k").alias("k_stat"),
        F.col("__best.u").alias("u_at_change"),
        F.col("__best.day").alias("change_day"),
        # exp() is libm-dependent across engines — round to 6 dp (the
        # source_language_entropy ln-portability convention)
        F.when(
            F.col("__best.k").isNotNull(),
            F.round(F.least(p, F.lit(1.0)), 6),
        ).alias("p_approx"),
    )
