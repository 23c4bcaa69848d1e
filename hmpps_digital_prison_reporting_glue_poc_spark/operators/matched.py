"""Matched-design rank tests over complete blocks (new module by policy:
round-9 froze the driver-pinned operator files after their known-good
full-suite gate, so post-freeze additions land in fresh modules that
cannot dirty existing query fingerprints).

Currently: Friedman's test — the k-treatment rank generalization of the
Wilcoxon signed-rank, completing the matched family (McNemar / Cochran's
Q for binaries, Wilcoxon for two continuous, Friedman for k continuous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def friedman_test(
    blocks: DataFrame,
    value_cols: list[str],
) -> DataFrame:
    """Friedman test over COMPLETE blocks: each row is one subject
    measured under k = len(value_cols) treatments; ranks are computed
    WITHIN the row (midranks under ties) and the test asks whether any
    treatment systematically ranks higher. Returns exactly ONE row:
    (n_blocks, k, df, q_stat, s_x2_0 .. s_x2_{k-1}) where s_x2_j is the
    DOUBLED rank sum of treatment j.

    Exactness: within-row doubled midranks are pure integer
    comparisons — 2r_j = 2*(#cols strictly below) + (#other cols tied)
    + 2 — and the tie-general statistic

        Q = (k-1) * sum_j (S_j - n(k+1))^2
                  / (sum_{u,j} s_uj^2 - n*k*(k+1)^2)

    (derived from Q = (k-1)*sum(R_j - n(k+1)/2)^2 / (A - C) with every
    rank doubled: the 1/4 factors cancel) is exact int64 end-to-end
    with ONE float division. Rows containing a NULL measurement are
    excluded (incomplete blocks — standard Friedman); NULL q_stat when
    every block is fully tied (zero denominator).

    Scale shape: ranks are per-row expressions (no shuffle at all);
    the only aggregation is one k-column reduce — embarrassingly
    map-side.
    """
    k = len(value_cols)
    if k < 2:
        raise ValueError("friedman_test needs >= 2 treatment columns")
    cols = [F.col(c).cast("long") for c in value_cols]
    complete = blocks
    for c in value_cols:
        complete = complete.filter(F.col(c).isNotNull())

    def _two_rank(i: int):
        less = sum(
            [
                F.when(cols[j] < cols[i], 1).otherwise(0)
                for j in range(k)
                if j != i
            ],
            F.lit(0),
        )
        ties = sum(
            [
                F.when(cols[j] == cols[i], 1).otherwise(0)
                for j in range(k)
                if j != i
            ],
            F.lit(0),
        )
        return (F.lit(2) * less + ties + F.lit(2)).cast("long")

    ranked = complete.select(
        *[_two_rank(i).alias(f"__s{i}") for i in range(k)]
    )
    sq = sum(
        [F.col(f"__s{i}") * F.col(f"__s{i}") for i in range(k)], F.lit(0)
    ).cast("long")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.coalesce(F.sum(sq), F.lit(0)).cast("long").alias("__sq"),
    ]
    for i in range(k):
        aggs.append(
            F.coalesce(F.sum(F.col(f"__s{i}")), F.lit(0))
            .cast("long")
            .alias(f"s_x2_{i}")
        )
    agg = ranked.agg(*aggs)
    n = F.col("n_blocks")
    num = sum(
        [
            (F.col(f"s_x2_{i}") - n * F.lit(k + 1))
            * (F.col(f"s_x2_{i}") - n * F.lit(k + 1))
            for i in range(k)
        ],
        F.lit(0),
    ).cast("long")
    den = (F.col("__sq") - n * F.lit(k) * F.lit((k + 1) * (k + 1))).cast(
        "long"
    )
    return agg.select(
        "n_blocks",
        F.lit(k).cast("long").alias("k"),
        F.lit(k - 1).cast("long").alias("df"),
        F.when(
            den > 0,
            (F.lit(k - 1) * num).cast("double") / den.cast("double"),
        ).alias("q_stat"),
        *[F.col(f"s_x2_{i}") for i in range(k)],
    )
