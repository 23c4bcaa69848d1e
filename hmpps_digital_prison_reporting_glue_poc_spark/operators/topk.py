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

from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
    materialize,
)


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


def hll_distinct(
    df: DataFrame,
    key_col: str,
    m_registers: int = 256,
) -> DataFrame:
    """From-scratch HyperLogLog distinct-count sketch (Flajolet et al.
    2007), built so every bit is engine-reproducible: h = u32(md5('hll:'
    || key)), register index j = h % m, and rank rho = leading-zero count
    of the remaining 24 bits + 1. The harmonic-mean denominator is kept
    EXACT — sum(2^-M_j) = S / 2^25 with S an integer sum of powers of
    two — so the estimate is closed-form over integers with two float
    ops at the end (one multiply chain, one divide), identical in any
    IEEE engine. The standard small-range (linear counting) correction
    applies below 2.5m, with the repo's rounded-ln contract.

    This is the mergeable-sketch shape a 100 TB pipeline uses for
    distinct counts across partitions/days: the register table is m rows
    (max-merge to combine sketches); the exact distinct (one extra agg
    here) is emitted alongside for the accuracy audit. Returns one row:
    (n_exact, hll_estimate, rel_error).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col(key_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    keyed = df.select(
        (h % m_registers).alias("j"), F.floor(h / m_registers).cast("long").alias("w")
    )
    # rho = leading zeros within 24 bits + 1; w == 0 -> 25
    rho = F.when(F.col("w") > 0, F.lit(25) - F.length(F.bin(F.col("w")))).otherwise(
        F.lit(25)
    )
    regs = keyed.select("j", rho.alias("rho")).groupBy("j").agg(
        F.max("rho").alias("M")
    )
    # S = sum over PRESENT registers of 2^(25 - M_j); absent registers
    # (M_j = 0) contribute 2^25 each — add them arithmetically.
    agg = regs.agg(
        F.sum(F.expr("CAST(shiftleft(1, 25 - M) AS BIGINT)")).alias("S_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    m = F.lit(m_registers).cast("double")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / m)
    s_total = (
        F.col("S_present")
        + (F.lit(m_registers) - F.col("n_present"))
        * F.lit(1 << 25).cast("long")
    ).cast("double")
    raw_est = alpha * m * m * F.lit(float(1 << 25)) / s_total
    n_zero = (F.lit(m_registers) - F.col("n_present")).cast("double")
    est = F.when(
        (raw_est <= F.lit(2.5) * m) & (n_zero > 0),
        m * F.round(F.log(m / n_zero), 6),
    ).otherwise(raw_est)
    exact = df.select(
        F.countDistinct(F.col(key_col)).alias("n_exact")
    )
    row = exact.crossJoin(agg.select(est.alias("hll_estimate")))
    # empty-input guard: n_exact = 0 makes rel_error a 0/0 whose result
    # differs across engines (Spark NULL, DuckDB inf) — emit NULL
    # explicitly in both.
    return row.select(
        "n_exact",
        "hll_estimate",
        F.when(
            F.col("n_exact") > 0,
            F.abs(F.col("hll_estimate") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
        ).alias("rel_error"),
    )


def cms_token_estimates(
    df: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 3,
    probe_k: int = 20,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over corpus token
    counts, with the accuracy audit built in: fold every token's count
    into a depth x width counter table (md5-derived columns, exact
    integer sums), then probe the ``probe_k`` most frequent tokens —
    estimate = min over rows, always >= truth, overestimate =
    estimate - truth.

    The sketch table is depth*width rows regardless of vocabulary size
    (mergeable by cell-wise +), which is what earns it a place at 100 TB:
    heavy-hitter queries hit a kilobyte-scale table instead of the
    vocabulary. Everything is integer arithmetic — the oracle reproduces
    every cell. Probe set is (count desc, token asc)-ordered, so LIMIT
    is deterministic."""
    from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    counts = materialize(counts, "cms_counts_")
    hashed = counts.select(
        "token",
        "n_true",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).withColumn(
        "col",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("d").cast("string"), F.lit(":"), F.col("token")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width,
    )
    cells = hashed.groupBy("d", "col").agg(
        F.sum("n_true").cast("long").alias("cell")
    )
    probes = (
        counts.orderBy(F.col("n_true").desc(), F.col("token").asc())
        .limit(probe_k)
        .join(
            hashed.select("token", "d", "col"),
            "token",
        )
        .join(cells, ["d", "col"])
        .groupBy("token")
        .agg(
            F.max("n_true").alias("n_true"),
            F.min("cell").alias("cms_estimate"),
        )
    )
    return probes.select(
        "token",
        F.col("n_true").cast("long").alias("n_true"),
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("n_true")).cast("long").alias(
            "overestimate"
        ),
    )


def grid_quantile_state(
    df: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """Mergeable quantile-sketch state: per-grid-point counts after
    fixed-grid quantization (``round(v * scale)`` — the ks_two_sample
    grid). Counts are associative, so states merge by cellwise addition
    (union + re-groupBy), which is what makes this the quantile member
    of the mergeable-sketch family (HLL max, CMS sum, MG fold). Error is
    bounded by the grid pitch 1/scale BY CONSTRUCTION — data
    distribution cannot degrade it, unlike rank-based sketches whose
    guarantees are probabilistic. State size = occupied grid points.
    Returns (__qv, n)."""
    return (
        df.select(
            F.round(F.col(value_col).cast("double") * scale, 0)
            .cast("long")
            .alias("__qv")
        )
        # NULL values carry no rank information and a NULL grid key
        # would behave differently in the band join vs a SQL twin's
        # window (r9 fuzz sweep, "nulls" seed) — exclude explicitly
        .filter(F.col("__qv").isNotNull())
        .groupBy("__qv")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def grid_quantiles(
    state: DataFrame, quantiles: list[float], scale: int = 100
) -> DataFrame:
    """Exact type-1 (lower) quantiles of the QUANTIZED multiset from a
    ``grid_quantile_state`` table: for each q, the smallest grid value
    whose running count reaches ``ceil(q * n)``. The cumulation uses
    the ks-style two-level grid bucketing (1024-point in-bucket windows
    bounded by construction, broadcast bucket offsets) — no
    table-spanning window, though the state is value-domain-sized
    anyway. Returns (q, value, rank_target, n_total)."""
    from pyspark.sql import Window

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize,
    )

    # The counts table feeds THREE plan branches (cumulation, bucket
    # offsets, total); without a lineage cut each branch re-scans and
    # re-aggregates the full input — 3x the dominant cost at scale. The
    # merged table is value-domain-sized, so the cut is ~free.
    counts = materialize(
        state.groupBy("__qv").agg(F.sum("n").cast("long").alias("n")),
        "grid_quantile_counts_",
    )
    keyed = counts.withColumn(
        "__bk", F.floor(F.col("__qv") / F.lit(1024)).cast("long")
    )
    bsums = keyed.groupBy("__bk").agg(F.sum("n").alias("__bn"))
    w_off = Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)
    boffs = bsums.select(
        "__bk",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__bk").orderBy("__qv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = keyed.join(F.broadcast(boffs), "__bk").select(
        "__qv", (F.sum("n").over(w_in) + F.col("__off")).alias("__cum")
    )
    total = counts.agg(F.sum("n").cast("long").alias("__n_total"))
    qs = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("q")
    targets = total.select(qs, "__n_total").withColumn(
        "rank_target",
        F.ceil(F.col("q") * F.col("__n_total")).cast("long"),
    )
    # value-domain-sized cross of grid points x |quantiles| — bounded by
    # construction, and the grid side is the small one so it broadcasts
    hit = cum.crossJoin(F.broadcast(targets)).filter(
        F.col("__cum") >= F.col("rank_target")
    )
    return (
        hit.groupBy("q", "rank_target", "__n_total")
        .agg(F.min("__qv").alias("__v"))
        .select(
            "q",
            (F.col("__v").cast("double") / F.lit(float(scale))).alias("value"),
            "rank_target",
            F.col("__n_total").alias("n_total"),
        )
    )


def grid_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    scale: int = 100,
) -> DataFrame:
    """Per-GROUP exact type-1 quantiles on the fixed grid (the grouped
    twin of ``grid_quantiles`` — per-source length p95s, per-type value
    medians). The in-group cumulation window is partitioned by the group
    and bounded by OCCUPIED GRID POINTS per group — a bound set by the
    grid pitch, not the data, so no group's size can recreate a
    single-task funnel. Returns (group, q, value, rank_target, n_total).
    """
    from pyspark.sql import Window

    counts = (
        df.select(
            F.col(group_col).alias("grp"),
            F.round(F.col(value_col).cast("double") * scale, 0)
            .cast("long")
            .alias("__qv"),
        )
        .groupBy("grp", "__qv")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("grp").orderBy("__qv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        "grp", "__qv", F.sum("n").over(w).alias("__cum")
    )
    totals = counts.groupBy("grp").agg(
        F.sum("n").cast("long").alias("n_total")
    )
    targets = totals.select(
        "grp",
        "n_total",
        F.explode(
            F.array(*[F.lit(float(q)) for q in quantiles])
        ).alias("q"),
    ).withColumn(
        "rank_target", F.ceil(F.col("q") * F.col("n_total")).cast("long")
    )
    return (
        cum.join(targets, "grp")
        .filter(F.col("__cum") >= F.col("rank_target"))
        .groupBy(
            F.col("grp").alias(group_col), "q", "rank_target", "n_total"
        )
        .agg(
            (F.min("__qv").cast("double") / F.lit(float(scale))).alias("value")
        )
        .select(group_col, "q", "value", "rank_target", "n_total")
    )
