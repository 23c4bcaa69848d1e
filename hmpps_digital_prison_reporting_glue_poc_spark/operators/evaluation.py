"""Evaluation & measurement operators: annotator agreement, probability
calibration, and ranking hit-rate — the metrics layer a training-data
pipeline runs over its own labels and models before trusting them.

All statistics are computed from EXACT integer counts with fixed double
expression trees (single divisions, no logs, no order-dependent float
sums), so any ANSI engine reproduces them bit-for-bit — the repo-wide
oracle-parity discipline.

Rebuilt semantics, not code, from the reference's aggregate/join surface
(see SURVEY.md §2: A1-A5, J1-J5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohens_kappa(
    df: DataFrame,
    rater_a,
    rater_b,
) -> DataFrame:
    """Cohen's kappa between two boolean raters — the chance-corrected
    agreement score that decides whether weak labelers are consistent
    enough to vote (``weak_label_vote``) or are just correlated noise.

    One groupBy-free pass: the four 2x2 cells are conditional sums in a
    single aggregation (map-side combined, one 1-row result), and
    kappa = (po − pe) / (1 − pe) with po, pe built from the exact cells
    in a fixed tree. Returns one row:
    (n, n_both_true, n_both_false, n_only_a, n_only_b, po, pe, kappa);
    kappa is NULL when pe == 1 (a degenerate single-cell table).
    """
    a = (rater_a if not isinstance(rater_a, str) else F.col(rater_a)).cast(
        "boolean"
    )
    b = (rater_b if not isinstance(rater_b, str) else F.col(rater_b)).cast(
        "boolean"
    )
    cells = df.select(a.alias("__a"), b.alias("__b")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("__a") & F.col("__b"), 1).otherwise(0))
        .cast("long")
        .alias("n_both_true"),
        F.sum(F.when(~F.col("__a") & ~F.col("__b"), 1).otherwise(0))
        .cast("long")
        .alias("n_both_false"),
        F.sum(F.when(F.col("__a") & ~F.col("__b"), 1).otherwise(0))
        .cast("long")
        .alias("n_only_a"),
        F.sum(F.when(~F.col("__a") & F.col("__b"), 1).otherwise(0))
        .cast("long")
        .alias("n_only_b"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n_both_true") + F.col("n_both_false")).cast("double") / n
    a_true = (F.col("n_both_true") + F.col("n_only_a")).cast("double")
    b_true = (F.col("n_both_true") + F.col("n_only_b")).cast("double")
    a_false = (F.col("n_both_false") + F.col("n_only_b")).cast("double")
    b_false = (F.col("n_both_false") + F.col("n_only_a")).cast("double")
    pe = (a_true * b_true + a_false * b_false) / (n * n)
    kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe))
    return cells.select(
        "n",
        "n_both_true",
        "n_both_false",
        "n_only_a",
        "n_only_b",
        po.alias("po"),
        pe.alias("pe"),
        kappa.alias("kappa"),
    )


def calibration_bins(
    df: DataFrame,
    score_num_col: str,
    score_den_col,
    outcome,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram (calibration curve) over an integer-ratio
    score: the score is ``num/den`` in [0, 1] (numerator and denominator
    integer columns/expressions, so the BIN assignment is exact integer
    arithmetic — ``(n_bins·num) div den``, no float boundary drift), and
    each bin reports count, positives, mean score and positive rate.

    A model whose bin-``mean_score`` tracks ``frac_pos`` is calibrated;
    the gap is the per-bin calibration error. One shuffle on the
    ~n_bins-cardinality bin key, everything else map-side. Returns
    (bin, n, n_pos, mean_score, frac_pos).
    """
    den = (
        F.col(score_den_col)
        if isinstance(score_den_col, str)
        else score_den_col
    ).cast("long")
    num = F.col(score_num_col).cast("long")
    out = (outcome if not isinstance(outcome, str) else F.col(outcome)).cast(
        "boolean"
    )
    b = F.least(
        (F.lit(n_bins) * num - (F.lit(n_bins) * num) % den) / den,
        F.lit(n_bins - 1),
    ).cast("long")
    staged = df.select(
        b.alias("bin"),
        num.alias("__num"),
        den.alias("__den"),
        F.when(out, 1).otherwise(0).alias("__pos"),
    )
    agg = staged.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__num").cast("long").alias("__sum_num"),
        F.max("__den").alias("__d"),
    )
    mean_score = F.col("__sum_num").cast("double") / (
        F.col("n").cast("double") * F.col("__d").cast("double")
    )
    frac_pos = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return agg.select(
        "bin",
        "n",
        "n_pos",
        mean_score.alias("mean_score"),
        frac_pos.alias("frac_pos"),
    )


def hitrate_at_k(
    history: DataFrame,
    evals: DataFrame,
    item_col: str = "item",
    k: int = 20,
    weight_col: str | None = None,
) -> DataFrame:
    """Popularity-baseline hit-rate@k: rank items by count in the
    ``history`` window, and score the fraction of ``evals`` rows whose
    item is in the top-k — the sanity floor every recommender must beat
    and the drift check for a deployed ranking.

    The top-k cut is a deterministic TakeOrdered ((count desc, item
    asc) tie-break) over the item-count rollup — k is a constant, so
    the sort ships only per-partition heads (the ``vocab_oov_rate``
    convention); membership is a broadcast semi-probe, no shuffle of
    the eval side. ``weight_col`` lets callers pass PRE-AGGREGATED
    (item, weight) tables on both sides instead of row-level events —
    the caller rolls the event log up once and every downstream branch
    (span, ranking, scoring) reads the small rollup, not the log.
    Returns one row (n_eval, n_hits, hitrate).
    """
    wt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    top = (
        history.groupBy(item_col)
        .agg(F.sum(wt).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col(item_col).asc())
        .limit(k)
        .select(item_col)
    )
    hits = evals.join(
        F.broadcast(top.withColumn("__hit", F.lit(1))), item_col, "left"
    )
    return hits.agg(
        F.sum(wt).cast("long").alias("n_eval"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0)) * wt)
        .cast("long")
        .alias("n_hits"),
        (
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)) * wt).cast("double")
            / F.sum(wt).cast("double")
        ).alias("hitrate"),
    )
