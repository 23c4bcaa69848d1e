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

from pyspark.sql import DataFrame, Window
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
        # coalesce(0): empty eval side -> SUM NULL vs the oracle's
        # COUNT(*) 0 (r9 fuzz sweep); the rate itself stays NULL
        F.coalesce(F.sum(wt), F.lit(0)).cast("long").alias("n_eval"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0)) * wt)
        .cast("long")
        .alias("n_hits"),
        (
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)) * wt).cast("double")
            / F.sum(wt).cast("double")
        ).alias("hitrate"),
    )


def exact_auc(
    df: DataFrame,
    score_col: str,
    label,
    id_col: str | None = None,
    bucket_width: int = 1_000,
) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank-sum — fully distributed,
    tie-correct (midranks), no sampling and no sort-to-one-task. The
    standard approximate AUC (threshold sweep over binned scores) drifts
    on ties and bin edges; this is the number sklearn would print, at
    any scale.

    Works on the per-VALUE rollup: group scores (integer-valued) to
    (score, n, n_pos); exact cumulative-below counts come from the
    range-bucket + broadcast-offset idiom (the ntile/global_sort_rank
    fix), so the only ordered-unbounded window runs over the bucket
    rollup. Midranks are closed-form per value (2·mid = 2·c_below + n +
    1); the rank-sum accumulates in DECIMAL(38,0) (rank×count products
    overflow int64 around 10^9.5 rows — the token_gini guard). Returns
    one row (n, n_pos, n_neg, auc); auc NULL when a class is empty.
    """
    lab = (label if not isinstance(label, str) else F.col(label)).cast(
        "boolean"
    )
    vals = (
        df.select(
            F.col(score_col).cast("long").alias("__s"),
            F.when(lab, 1).otherwise(0).alias("__pos"),
        )
        # NULL scores are unrankable and a NULL bucket key silently falls
        # out of the offset equi-join on one engine only — exclude them
        # from the sample explicitly (r9 fuzz harness, "nulls" seed)
        .filter(F.col("__s").isNotNull())
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__pos").cast("long").alias("__np"),
        )
        .withColumn(
            "__b", F.floor(F.col("__s") / F.lit(bucket_width)).cast("long")
        )
    )
    from pyspark.sql import Window

    counts = vals.groupBy("__b").agg(F.sum("__n").alias("__bn"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__b").orderBy("__s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = vals.join(F.broadcast(offsets), "__b").select(
        "__s",
        "__n",
        "__np",
        (
            F.col("__off") + F.coalesce(F.sum("__n").over(w_in), F.lit(0))
        ).alias("__cb"),
    )
    two_mid = F.lit(2) * F.col("__cb") + F.col("__n") + F.lit(1)
    agg = ranked.agg(
        # coalesce(0): on an EMPTY sample SUM is NULL while the oracle's
        # COUNT(*) is 0 — the (n, n_pos, n_neg) counts are defined (zero)
        # even when the AUC itself is not (r9 fuzz harness, "empty" seed)
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum("__np"), F.lit(0)).cast("long").alias("n_pos"),
        F.sum(
            F.col("__np").cast("decimal(38,0)")
            * two_mid.cast("decimal(38,0)")
        ).alias("__s2"),
    )
    n1 = F.col("n_pos").cast("decimal(38,0)")
    n0 = (F.col("n") - F.col("n_pos")).cast("decimal(38,0)")
    num = F.col("__s2") - n1 * (n1 + F.lit(1))
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n") > F.col("n_pos")),
        num.cast("double") / (F.lit(2).cast("decimal(38,0)") * n1 * n0).cast(
            "double"
        ),
    )
    return agg.select(
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
        auc.alias("auc"),
    )


def decile_lift(
    df: DataFrame,
    score_col: str,
    label,
    id_col: str,
    n_tiles: int = 10,
    bucket_width: int = 1_000,
) -> DataFrame:
    """Decile lift / gains table: rank rows by score descending, cut
    into ``n_tiles`` exact equal tiles, and report each tile's response
    rate, lift over the base rate, and cumulative gain — the campaign-
    targeting table ("the top decile captures X% of all conversions").

    Exact global ranks by (score desc, id asc) via the range-bucket +
    broadcast-offset idiom (no table-spanning window); tiles are
    closed-form (n_tiles·(r−1)) div n. Lift and gains are fixed-tree
    divisions of exact counts; the cumulative window runs over the
    n_tiles-row result. Returns (tile, n, n_pos, response_rate, lift,
    cum_gain).
    """
    from pyspark.sql import Window

    lab = (label if not isinstance(label, str) else F.col(label)).cast(
        "boolean"
    )
    rows = (
        df.select(
            F.col(score_col).cast("long").alias("__s"),
            F.col(id_col).alias("__id"),
            F.when(lab, 1).otherwise(0).alias("__pos"),
        )
        # NULL scores are unrankable; they would silently fall out of the
        # bucket-offset equi-join on this engine only while a SQL twin's
        # row_number keeps them (r9 fuzz sweep, "nulls" seed)
        .filter(F.col("__s").isNotNull())
        .withColumn(
            "__b", F.floor(F.col("__s") / F.lit(bucket_width)).cast("long")
        )
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize_if_large,
    )

    # event-sized scored frame, two consumers (bucket counts + the
    # offset join): size-gated cut (r10 plan audit)
    rows = materialize_if_large(rows, "declift_rows_")
    counts = rows.groupBy("__b").agg(F.count(F.lit(1)).alias("__bn"))
    w_off = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # The grand total rides the SAME bucket-rollup window pass as the
    # offsets (same partition/order spec -> one Window operator) instead
    # of a separate agg consumed via crossJoin(broadcast) — which
    # re-executed the counts lineage (and under it the scored-rows
    # producer) a second time for one number (r12; the r11 item-6/12
    # lesson applied here). sum over ALL buckets == row count, exact.
    w_all = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "__b",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__bn").over(w_all).cast("long").alias("__nt"),
    )
    w_in = Window.partitionBy("__b").orderBy(
        F.col("__s").desc(), F.col("__id").asc()
    )
    ranked = (
        rows.join(F.broadcast(offsets), "__b")
        .select(
            "__pos",
            "__nt",
            (F.row_number().over(w_in) + F.col("__off")).alias("__r"),
        )
    )
    tile = F.expr(f"({n_tiles} * (__r - 1)) div __nt")
    per = (
        ranked.select(tile.alias("tile"), "__pos", "__nt")
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__pos").cast("long").alias("n_pos"),
            F.max("__nt").alias("__n_all"),
        )
    )
    # __p_all likewise rides the n_tiles-row rollup's cumulative window
    # (same orderBy -> same Window operator) instead of an agg whose
    # crossJoin(broadcast) subtree re-executed the ENTIRE rank tower.
    w_cum = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_tot = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    per = per.withColumn(
        "__p_all", F.sum("n_pos").over(w_tot).cast("long")
    )
    resp = F.col("n_pos").cast("double") / F.col("n").cast("double")
    base = F.col("__p_all").cast("double") / F.col("__n_all").cast("double")
    return (
        per.select(
            "tile",
            "n",
            "n_pos",
            resp.alias("response_rate"),
            F.when(F.col("__p_all") > 0, resp / base).alias("lift"),
            F.when(
                F.col("__p_all") > 0,
                F.sum("n_pos").over(w_cum).cast("double")
                / F.col("__p_all").cast("double"),
            ).alias("cum_gain"),
        )
    )


def psi_bands(
    df: DataFrame,
    band_col: str,
    period_col,
) -> DataFrame:
    """Per-band Population Stability Index terms between two periods —
    the score/feature drift metric model-risk teams gate deployments on
    (PSI > 0.2 = significant shift). Term = (p_a − p_b)·ln(p_a / p_b)
    per band; the total is the consumer-side sum of the table.

    One groupBy on the band with conditional sums (no self-join), plus
    a broadcast 1-row total. Each band's term is rounded to 6 dp (the
    ``source_language_entropy`` ln-portability convention) and NULL when
    the band is empty on either side — emitting per-band terms instead
    of one pre-summed scalar keeps every output row order-independent.
    Returns (band, n_a, n_b, psi_term).
    """
    per = (
        df.select(
            F.col(band_col).alias("band"),
            (
                period_col
                if not isinstance(period_col, str)
                else F.col(period_col)
            )
            .cast("int")
            .alias("__p"),
        )
        .groupBy("band")
        .agg(
            F.sum(F.when(F.col("__p") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("__p") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
    )
    tot = per.agg(
        F.sum("n_a").cast("long").alias("__ta"),
        F.sum("n_b").cast("long").alias("__tb"),
    )
    pa = F.col("n_a").cast("double") / F.col("__ta").cast("double")
    pb = F.col("n_b").cast("double") / F.col("__tb").cast("double")
    term = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.round((pa - pb) * F.log(pa / pb), 6),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "band", "n_a", "n_b", term.alias("psi_term")
    )


def spearman_groups(
    df: DataFrame,
    group_col: str,
    x_col,
    y_col,
) -> DataFrame:
    """Per-group EXACT Spearman rank correlation with tie midranks — the
    monotonic-association check (feature vs target, metric vs metric)
    that Pearson misreads on non-linear but ordered relationships.

    Exactness: the classic midrank is half-integral under ties, so both
    rank vectors are DOUBLED into integers — for a tie block starting at
    min-rank r with g members, 2*midrank = 2r + g - 1 — and Pearson over
    the doubled ranks (scale-invariant) runs entirely on DECIMAL(38,0)
    integer sums: rho = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) *
    (n*Syy - Sy^2)). Only the final sqrt/divide touch floating point
    through one fixed expression tree, so any engine reproduces the
    number bit-for-bit. Two in-group windows (rank + tie size per axis)
    ride the SAME group-keyed shuffle; the reduction is one groupBy.
    Returns (group, n, spearman_rho); groups with zero variance on
    either axis yield NULL rho.
    """
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    base = df.select(
        F.col(group_col).alias("grp"), x.alias("__x"), y.alias("__y")
    )
    rx = F.rank().over(Window.partitionBy("grp").orderBy("__x"))
    cx = F.count(F.lit(1)).over(Window.partitionBy("grp", "__x"))
    ry = F.rank().over(Window.partitionBy("grp").orderBy("__y"))
    cy = F.count(F.lit(1)).over(Window.partitionBy("grp", "__y"))
    ranked = base.select(
        "grp",
        (F.lit(2) * rx + cx - 1).cast("long").alias("__rx2"),
        (F.lit(2) * ry + cy - 1).cast("long").alias("__ry2"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d(F.col("__rx2"))).alias("__sx"),
        F.sum(d(F.col("__ry2"))).alias("__sy"),
        F.sum(d(F.col("__rx2") * F.col("__rx2"))).alias("__sxx"),
        F.sum(d(F.col("__ry2") * F.col("__ry2"))).alias("__syy"),
        F.sum(d(F.col("__rx2") * F.col("__ry2"))).alias("__sxy"),
    )
    n = d(F.col("n"))
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    vx = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    vy = (n * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    rho = F.when(
        (vx > 0) & (vy > 0), num / F.sqrt(vx * vy)
    )
    return agg.select(F.col("grp").alias(group_col), "n", rho.alias("spearman_rho"))


def mrr_at_k(
    history: DataFrame,
    evals: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item",
    k: int = 20,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-user reciprocal rank of the popularity baseline — MRR's
    per-user table (position-sensitive where ``hitrate_at_k`` is
    membership-only): rank items by history count (count desc, item asc
    — the deterministic TakeOrdered cut), then each user's score is
    1/rank of the FIRST of their eval items found in the top-k, 0 on a
    miss. rr = 1/min_rank is one exact division per user, so the table
    is engine-exact with no float-summation hazard; MRR itself is the
    consumer's mean over the table.

    Plan: k-row broadcast ranking, eval side grouped once on the user.
    Returns (user, n_eval_items, first_hit_rank, rr).
    """
    wt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    w = Window.orderBy(F.col("__cnt").desc(), F.col(item_col).asc())
    top = (
        history.groupBy(item_col)
        .agg(F.sum(wt).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col(item_col).asc())
        .limit(k)
        .withColumn("__rank", F.row_number().over(w).cast("long"))
        .select(item_col, "__rank")
    )
    joined = evals.select(user_col, item_col).distinct().join(
        F.broadcast(top), item_col, "left"
    )
    per_user = joined.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_items"),
        F.min("__rank").alias("first_hit_rank"),
    )
    rr = F.when(
        F.col("first_hit_rank").isNotNull(),
        F.lit(1.0) / F.col("first_hit_rank").cast("double"),
    ).otherwise(F.lit(0.0))
    return per_user.select(
        user_col, "n_eval_items", "first_hit_rank", rr.alias("rr")
    )


def js_divergence_terms(
    df: DataFrame,
    group_col: str,
    cat_col: str,
) -> DataFrame:
    """Per-(group, category) Jensen-Shannon divergence terms between each
    group's categorical distribution and the corpus distribution — the
    bounded, symmetric drift metric (0..ln 2) that, unlike KL, stays
    finite when a category is missing on one side: the question "which
    source's language mix is drifting from the corpus" answered per term.

    JSD(P_g || Q) = sum_c [ p_c/2 * ln(p_c/m_c) + q_c/2 * ln(q_c/m_c) ],
    m_c = (p_c + q_c) / 2. Categories ABSENT from a group still
    contribute (p = 0 ⇒ term = q/2 * ln 2), so the (group x category)
    grid is completed by a broadcast nested-loop of two bounded rollups.
    The ``psi_bands`` portability convention: per-term output, each term
    rounded to 6 dp (ln), never a pre-summed order-dependent scalar —
    consumers sum the table.
    Returns (group, category, n_group_cat, n_cat, js_term).
    """
    base = df.select(
        F.col(group_col).alias("grp"), F.col(cat_col).alias("cat")
    )
    cats = base.groupBy("cat").agg(
        F.count(F.lit(1)).cast("long").alias("n_cat")
    )
    groups = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("__ng")
    )
    gc = base.groupBy("grp", "cat").agg(
        F.count(F.lit(1)).cast("long").alias("n_group_cat")
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    grid = (
        groups.crossJoin(F.broadcast(cats))
        .join(gc, ["grp", "cat"], "left")
        .withColumn("n_group_cat", F.coalesce(F.col("n_group_cat"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("n_group_cat").cast("double") / F.col("__ng").cast("double")
    q = F.col("n_cat").cast("double") / F.col("__N").cast("double")
    m = (p + q) / F.lit(2.0)
    term = F.round(
        F.when(F.col("n_group_cat") > 0, p / 2 * F.log(p / m)).otherwise(
            F.lit(0.0)
        )
        + q / 2 * F.log(q / m),
        6,
    )
    return grid.select(
        F.col("grp").alias(group_col),
        F.col("cat").alias(cat_col),
        "n_group_cat",
        "n_cat",
        term.alias("js_term"),
    )


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    alpha: float = 0.1,
    bucket_width: int = 1_000,
) -> DataFrame:
    """Split-conformal prediction threshold: the ceil((n+1)(1−alpha))-th
    smallest nonconformity score on a calibration set — the EXACT order
    statistic whose acceptance region guarantees (1−alpha) marginal
    coverage on exchangeable data (Vovk et al.'s split-conformal
    recipe). An approximate quantile voids the guarantee; this is the
    same per-value-rollup + range-bucket cumulation as ``exact_auc`` /
    ``equifreq_edges``, so the exact rank costs no global sort.

    Returns one row (n, target_rank, threshold); threshold is NULL when
    target_rank > n (alpha too small for the calibration size — the
    honest "cannot certify" answer rather than the max score).
    """
    from pyspark.sql import Window

    vals = (
        df.select(F.col(score_col).cast("long").alias("__s"))
        .groupBy("__s")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .withColumn(
            "__b", F.floor(F.col("__s") / F.lit(bucket_width)).cast("long")
        )
    )
    counts = vals.groupBy("__b").agg(F.sum("__n").alias("__bn"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__b").orderBy("__s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vals.join(F.broadcast(offsets), "__b").select(
        "__s", (F.sum("__n").over(w_in) + F.col("__off")).alias("__cum")
    )
    # target = ceil((n+1)(1-alpha)) in exact integer arithmetic over the
    # scaled representation: with alpha = a_num/a_den,
    # ceil((n+1)*(a_den-a_num)/a_den)
    from fractions import Fraction

    frac = Fraction(alpha).limit_denominator(1_000_000)
    a_num, a_den = frac.numerator, frac.denominator
    # coalesce(0): on an EMPTY sample SUM is NULL while the oracle's
    # COUNT(*) is 0; n = 0 then yields target_rank = ceil(1-alpha) with
    # a NULL threshold — the documented "alpha too small" row shape
    # (r9 fuzz sweep, empty/ties/single seeds)
    total = vals.agg(F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n"))
    target = total.select(
        "n",
        (
            (
                (F.col("n") + 1) * F.lit(a_den - a_num)
                + F.lit(a_den - 1)
                - ((F.col("n") + 1) * F.lit(a_den - a_num) + F.lit(a_den - 1))
                % F.lit(a_den)
            )
            / F.lit(a_den)
        )
        .cast("long")
        .alias("target_rank"),
    )
    hit = cum.crossJoin(F.broadcast(target)).filter(
        F.col("__cum") >= F.col("target_rank")
    )
    found = hit.groupBy("n", "target_rank").agg(
        F.min("__s").alias("threshold")
    )
    # preserve the "alpha too small" row even when no value reaches the
    # target rank (target_rank > n -> empty hit set)
    return (
        target.join(found, ["n", "target_rank"], "left")
        .select("n", "target_rank", F.col("threshold").cast("long").alias("threshold"))
    )


def ndcg_weights_millionths(k: int) -> tuple[list[int], list[int]]:
    """Integer DCG gain table: weight[r] = round(1e6 / log2(r+1)) for
    ranks 1..k, plus its prefix sums (the ideal-DCG table). Computing the
    irrational log weights ONCE in Python and summing INTEGERS on the
    cluster makes per-user DCG order-independent and engine-exact — the
    same integer-ize-then-one-divide discipline as ``exact_auc`` /
    ``psi_bands``. Exposed so the SQL oracle can inline the identical
    literals.
    """
    import math

    w = [int(round(1_000_000 / math.log2(r + 1))) for r in range(1, k + 1)]
    prefix, acc = [], 0
    for x in w:
        acc += x
        prefix.append(acc)
    return w, prefix


def ndcg_at_k(
    history: DataFrame,
    evals: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item",
    k: int = 20,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-user NDCG@k of the popularity baseline — position-weighted
    where ``hitrate_at_k`` is membership-only and ``mrr_at_k`` scores
    only the FIRST hit: every eval item found in the top-k contributes
    gain 1/log2(rank+1), normalized by the ideal DCG of min(n_eval, k)
    relevant items.

    Exactness: gains are the integer-millionths table from
    ``ndcg_weights_millionths`` — per-user DCG is an INTEGER sum (any
    aggregation order, any engine), IDCG is a literal prefix-sum lookup
    on least(n_eval, k), and ndcg is ONE float division at the end.

    Plan: k-row broadcast ranking (count desc, item asc deterministic
    cut), eval side deduped and grouped once on the user — identical
    shuffle shape to ``mrr_at_k``. Returns
    (user, n_eval_items, n_hits, dcg_millionths, idcg_millionths, ndcg).
    """
    w_table, prefix = ndcg_weights_millionths(k)
    wt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    w = Window.orderBy(F.col("__cnt").desc(), F.col(item_col).asc())
    top = (
        history.groupBy(item_col)
        .agg(F.sum(wt).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col(item_col).asc())
        .limit(k)
        .withColumn("__rank", F.row_number().over(w).cast("long"))
        .select(item_col, "__rank")
    )
    # rank -> integer gain, as a literal expression over the k-row side
    gain = F.lit(None).cast("long")
    for r, g in enumerate(w_table, start=1):
        gain = F.when(F.col("__rank") == r, F.lit(g)).otherwise(gain)
    top = top.withColumn("__gain", gain)
    joined = evals.select(user_col, item_col).distinct().join(
        F.broadcast(top), item_col, "left"
    )
    per_user = joined.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_items"),
        F.sum(F.when(F.col("__rank").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_hits"),
        F.coalesce(F.sum("__gain"), F.lit(0))
        .cast("long")
        .alias("dcg_millionths"),
    )
    # idcg = prefix[min(n_eval, k)] — literal lookup, no float log on-cluster
    clamped = F.least(F.col("n_eval_items"), F.lit(k))
    idcg = F.lit(None).cast("long")
    for i, p in enumerate(prefix, start=1):
        idcg = F.when(clamped == i, F.lit(p)).otherwise(idcg)
    per_user = per_user.withColumn("idcg_millionths", idcg)
    ndcg = (
        F.col("dcg_millionths").cast("double")
        / F.col("idcg_millionths").cast("double")
    )
    return per_user.select(
        user_col,
        "n_eval_items",
        "n_hits",
        "dcg_millionths",
        "idcg_millionths",
        ndcg.alias("ndcg"),
    )


def kendall_tau_groups(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group EXACT Kendall tau-b between two BOUNDED-CARDINALITY
    ordinal columns — the tie-corrected rank-correlation complement of
    ``spearman_groups`` (Spearman weights by rank distance; Kendall
    counts pair inversions, so one wild outlier costs at most n-1
    pairs).

    The O(n^2) pair count collapses onto the (x, y) CONTINGENCY cells:
    concordant/discordant sums are cell-count products over cell pairs
    with x_i < x_j (each unordered pair exactly once; equal-x pairs are
    x-ties and contribute to neither), so the self-join is bounded by
    distinct-cell count squared — grid-sized, not data-sized. Tie terms
    n1/n2 come from the 1-D marginal rollups. All counts and products
    are DECIMAL(38,0)-exact; tau-b is ONE float expression at the end.

    Caller contract: x and y must be low-cardinality ordinals (bands,
    grades, small integers). Returns
    (group, n, n_pairs, concordant, discordant, x_tie_pairs,
    y_tie_pairs, tau_b); tau_b is NULL when either marginal is constant
    (denominator 0).
    """
    g, x, y = F.col(group_col), F.col(x_col), F.col(y_col)
    cells = (
        df.select(
            g.alias("__g"),
            x.cast("long").alias("__x"),
            y.cast("long").alias("__y"),
        )
        .groupBy("__g", "__x", "__y")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"))
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # grid cut: the (group, x, y) cell rollup is value-grid bounded and
    # feeds both self-join sides plus the three tie rollups — un-cut,
    # five re-derivations of the fact lineage (r10 plan audit)
    cells = materialize(cells, "kendall_cells_")
    a = cells.select(
        F.col("__g").alias("__ga"),
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
        F.col("__n").alias("__na"),
    )
    b = cells.select(
        F.col("__g").alias("__gb"),
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        F.col("__n").alias("__nb"),
    )
    # the cell table is grid-bounded (caller contract), so the pair join
    # broadcasts regardless of what the base-table statistics say
    pairs = a.join(
        F.broadcast(b),
        (F.col("__ga") == F.col("__gb")) & (F.col("__xa") < F.col("__xb")),
    )
    cd = pairs.groupBy(F.col("__ga").alias("__g")).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__ya") < F.col("__yb"),
                    F.col("__na") * F.col("__nb"),
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("concordant"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__ya") > F.col("__yb"),
                    F.col("__na") * F.col("__nb"),
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("discordant"),
    )
    totals = cells.groupBy("__g").agg(
        F.sum("__n").alias("__nt"),
    )
    x_ties = (
        cells.groupBy("__g", "__x")
        .agg(F.sum("__n").alias("__m"))
        .groupBy("__g")
        .agg(
            (F.sum(F.col("__m") * (F.col("__m") - 1)) / 2)
            .cast("decimal(38,0)")
            .alias("x_tie_pairs")
        )
    )
    y_ties = (
        cells.groupBy("__g", "__y")
        .agg(F.sum("__n").alias("__m"))
        .groupBy("__g")
        .agg(
            (F.sum(F.col("__m") * (F.col("__m") - 1)) / 2)
            .cast("decimal(38,0)")
            .alias("y_tie_pairs")
        )
    )
    out = (
        totals.join(F.broadcast(x_ties), "__g")
        .join(F.broadcast(y_ties), "__g")
        .join(F.broadcast(cd), "__g", "left")
    )
    n0 = (F.col("__nt") * (F.col("__nt") - 1) / 2).cast("decimal(38,0)")
    c = F.coalesce(F.col("concordant"), F.lit(0).cast("decimal(38,0)"))
    d = F.coalesce(F.col("discordant"), F.lit(0).cast("decimal(38,0)"))
    den_x = (n0 - F.col("x_tie_pairs")).cast("double")
    den_y = (n0 - F.col("y_tie_pairs")).cast("double")
    tau = F.when(
        (den_x > 0) & (den_y > 0),
        (c - d).cast("double") / F.sqrt(den_x * den_y),
    )
    return out.select(
        F.col("__g").alias(group_col),
        F.col("__nt").cast("long").alias("n"),
        n0.alias("n_pairs"),
        c.alias("concordant"),
        d.alias("discordant"),
        "x_tie_pairs",
        "y_tie_pairs",
        tau.alias("tau_b"),
    )


def isotonic_fit_bins(
    bins: DataFrame,
    bin_col: str = "bin",
    n_col: str = "n",
    pos_col: str = "n_pos",
) -> DataFrame:
    """Weighted isotonic regression (PAV) over a binned calibration
    rollup — the monotone-fit step that turns ``calibration_bins``'s
    reliability diagram into an isotonic CALIBRATOR (Zadrozny & Elkan's
    recipe): fitted rates are non-decreasing in the bin index and
    minimize weighted squared error.

    Instead of porting the sequential pool-adjacent-violators loop, the
    fit uses the minimax identity — fitted[k] = max_{i<=k} min_{j>=k}
    rate(i..j) with rate(i..j) the pooled positives/count over bins
    i..j — which is pure relational algebra over the B-row rollup:
    prefix sums, a B^2 interval grid, a B^3 (k, i, j) join, two grouped
    extremes. Every pooled rate is ONE division of exact integer prefix
    differences, so both engines compare IDENTICAL doubles and the
    min/max tower is engine-deterministic. B is the caller's bin count
    (~10-20): the whole fit is metadata-sized regardless of how many
    rows fed the bins.

    Returns (bin, n, n_pos, raw_rate, iso_rate) with iso_rate monotone
    non-decreasing by construction.
    """
    b = F.col(bin_col)
    n = F.col(n_col).cast("long")
    y = F.col(pos_col).cast("long")
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # bin-grid cut: the caller's bin rollup feeds prefix/lo/hi/interval
    # consumers — un-cut, 8 re-derivations of the fact lineage (r10
    # plan audit); the bin table is bounded by construction
    base = materialize(
        bins.select(b.alias("__b"), n.alias("__n"), y.alias("__y")),
        "iso_base_",
    )
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    pref = base.select(
        "__b",
        "__n",
        "__y",
        F.sum("__n").over(w).cast("long").alias("__sn"),
        F.sum("__y").over(w).cast("long").alias("__sy"),
    )
    lo = pref.select(
        F.col("__b").alias("__i"),
        (F.col("__sn") - F.col("__n")).alias("__sn_lo"),
        (F.col("__sy") - F.col("__y")).alias("__sy_lo"),
    )
    hi = pref.select(
        F.col("__b").alias("__j"),
        F.col("__sn").alias("__sn_hi"),
        F.col("__sy").alias("__sy_hi"),
    )
    intervals = lo.join(
        F.broadcast(hi), F.col("__i") <= F.col("__j")
    ).select(
        "__i",
        "__j",
        (
            (F.col("__sy_hi") - F.col("__sy_lo")).cast("double")
            / (F.col("__sn_hi") - F.col("__sn_lo")).cast("double")
        ).alias("__rate"),
    )
    ks = base.select(F.col("__b").alias("__k"))
    trip = intervals.join(
        F.broadcast(ks),
        (F.col("__i") <= F.col("__k")) & (F.col("__k") <= F.col("__j")),
    )
    inner = trip.groupBy("__k", "__i").agg(
        F.min("__rate").alias("__min_j")
    )
    fitted = inner.groupBy("__k").agg(F.max("__min_j").alias("iso_rate"))
    raw = F.col("__y").cast("double") / F.col("__n").cast("double")
    return (
        base.join(
            F.broadcast(fitted), F.col("__b") == F.col("__k")
        )
        .select(
            F.col("__b").alias(bin_col),
            F.col("__n").alias(n_col),
            F.col("__y").alias(pos_col),
            raw.alias("raw_rate"),
            "iso_rate",
        )
    )


def stratified_ate(
    df: DataFrame,
    stratum_col: str,
    treated_col,
    outcome_col: str,
) -> DataFrame:
    """Stratified average-treatment-effect table — the
    subclassification estimator (Cochran's recipe, the workhorse of
    observational A/B readouts): within each stratum the
    treatment/control outcome-mean gap, with the stratum's population
    weight, so the consumer's ATE = sum(weight * diff) and common
    support is auditable per row.

    Per-stratum rows (the ``psi_bands`` convention) keep the output
    order-independent: each row carries ONE fixed float tree over exact
    integer sums (outcome in integer units, counts long); no
    cross-stratum float accumulation happens inside the operator.
    Plan: one stratum-keyed rollup with conditional sums, one broadcast
    total. Returns (stratum, n, n_treated, n_control, mean_treated,
    mean_control, diff, weight); means/diff NULL in strata lacking one
    arm (off-support strata surface instead of silently dropping).
    """
    t = (
        treated_col if not isinstance(treated_col, str) else F.col(treated_col)
    ).cast("boolean")
    y = F.col(outcome_col).cast("long")
    staged = df.select(
        F.col(stratum_col).alias("stratum"),
        t.alias("__t"),
        y.alias("__y"),
    )
    per = staged.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("__t"), 1).otherwise(0))
        .cast("long")
        .alias("n_treated"),
        F.sum(F.when(~F.col("__t"), 1).otherwise(0))
        .cast("long")
        .alias("n_control"),
        F.coalesce(F.sum(F.when(F.col("__t"), F.col("__y"))), F.lit(0))
        .cast("long")
        .alias("__sy_t"),
        F.coalesce(F.sum(F.when(~F.col("__t"), F.col("__y"))), F.lit(0))
        .cast("long")
        .alias("__sy_c"),
    )
    total = per.agg(F.sum("n").cast("long").alias("__nt"))
    out = per.crossJoin(F.broadcast(total))
    mean_t = F.when(
        F.col("n_treated") > 0,
        F.col("__sy_t").cast("double") / F.col("n_treated").cast("double"),
    )
    mean_c = F.when(
        F.col("n_control") > 0,
        F.col("__sy_c").cast("double") / F.col("n_control").cast("double"),
    )
    return out.select(
        F.col("stratum").alias(stratum_col),
        "n",
        "n_treated",
        "n_control",
        mean_t.alias("mean_treated"),
        mean_c.alias("mean_control"),
        (mean_t - mean_c).alias("diff"),
        (F.col("n").cast("double") / F.col("__nt").cast("double")).alias(
            "weight"
        ),
    )


def cmh_terms(
    df: DataFrame,
    stratum_col: str,
    exposed_col,
    outcome_col,
) -> DataFrame:
    """Cochran-Mantel-Haenszel per-stratum terms — the stratified 2x2
    association test that asks "does exposure move the outcome AFTER
    controlling for the stratum?" (the significance companion to
    ``stratified_ate``'s effect-size table, and the standard guard
    against Simpson's-paradox readouts).

    Each stratum's 2x2 cells (a=exposed+positive, with row/col
    marginals r1, c1 and total n) come from one conditional-sum rollup;
    the row reports a, E[a] = r1*c1/n and Var[a] =
    r1*r2*c1*c2/(n^2*(n−1)) — each ONE float expression over exact
    integer cells (numerators kept DECIMAL(38,0)). Per-stratum rows
    keep the output order-independent; the consumer forms
    CMH = (|sum(a − e)| − 0.5)^2 / sum(v) over the tiny table.
    Degenerate strata (n < 2 or an empty margin) yield NULL var rather
    than silently vanishing. Returns
    (stratum, n, a, r1, c1, expected_a, var_a).
    """
    ex = (
        exposed_col if not isinstance(exposed_col, str) else F.col(exposed_col)
    ).cast("boolean")
    out = (
        outcome_col if not isinstance(outcome_col, str) else F.col(outcome_col)
    ).cast("boolean")
    staged = df.select(
        F.col(stratum_col).alias("__s"),
        ex.alias("__e"),
        out.alias("__o"),
    )
    per = staged.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("__e") & F.col("__o"), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("__e"), 1).otherwise(0)).cast("long").alias("r1"),
        F.sum(F.when(F.col("__o"), 1).otherwise(0)).cast("long").alias("c1"),
    )
    r2 = F.col("n") - F.col("r1")
    c2 = F.col("n") - F.col("c1")
    expected = (
        F.col("r1").cast("double") * F.col("c1").cast("double")
    ) / F.col("n").cast("double")
    var_num = (
        F.col("r1").cast("decimal(38,0)")
        * r2
        * F.col("c1")
        * c2
    )
    var = F.when(
        (F.col("n") > 1) & (F.col("r1") > 0) & (r2 > 0)
        & (F.col("c1") > 0) & (c2 > 0),
        var_num.cast("double")
        / (
            F.col("n").cast("double")
            * F.col("n").cast("double")
            * (F.col("n") - 1).cast("double")
        ),
    )
    return per.select(
        F.col("__s").alias(stratum_col),
        "n",
        "a",
        "r1",
        "c1",
        expected.alias("expected_a"),
        var.alias("var_a"),
    )


def brier_decomposition_bins(
    df: DataFrame,
    score_num_col: str,
    score_den_col,
    outcome,
    n_bins: int = 10,
) -> DataFrame:
    """Murphy decomposition of the Brier score over the calibration
    bins — Brier = reliability − resolution + uncertainty, the readout
    that separates "the probabilities are WRONG" (reliability) from
    "the model can't DISCRIMINATE" (resolution): two models with equal
    Brier can need opposite fixes.

    Same exact integer-ratio binning as ``calibration_bins``; each
    bin's reliability term n_b*(yhat_b − ybar_b)^2 / N and resolution
    term n_b*(ybar_b − ybar)^2 / N are fixed float trees over exact
    integer sums, emitted PER BIN (the psi_bands order-independence
    convention — the consumer sums the tiny table and adds
    ``uncertainty``). Returns (bin, n, n_pos, mean_score, frac_pos,
    reliability_term, resolution_term, uncertainty) with uncertainty =
    ybar*(1−ybar) repeated on every row for convenience.
    """
    bins = calibration_bins(
        df, score_num_col, score_den_col, outcome, n_bins=n_bins
    )
    totals = bins.agg(
        F.sum("n").cast("long").alias("__nn"),
        F.sum("n_pos").cast("long").alias("__yy"),
    )
    staged = bins.crossJoin(F.broadcast(totals))
    ybar = F.col("__yy").cast("double") / F.col("__nn").cast("double")
    yb = F.col("frac_pos")
    yhat = F.col("mean_score")
    w = F.col("n").cast("double") / F.col("__nn").cast("double")
    rel = w * (yhat - yb) * (yhat - yb)
    res = w * (yb - ybar) * (yb - ybar)
    unc = ybar * (F.lit(1.0) - ybar)
    return staged.select(
        "bin",
        "n",
        "n_pos",
        "mean_score",
        "frac_pos",
        rel.alias("reliability_term"),
        res.alias("resolution_term"),
        unc.alias("uncertainty"),
    )


def uplift_decile_terms(
    df: DataFrame,
    score_col: str,
    treated_col,
    outcome_col,
    n_tiles: int = 10,
    id_col: str | None = None,
    bucket_width: int = 5_000,
) -> DataFrame:
    """Uplift (Qini-style) decile table: rank units by a targeting
    score, and per decile report treated/control conversions and the
    incremental-conversion term y_t − y_c * n_t/n_c — the evaluation
    that separates "the model finds converters" (plain lift) from "the
    model finds people the TREATMENT converts" (uplift), the question
    ``stratified_ate`` answers globally and this answers per targeting
    depth.

    Deciles are EXACT: global rank via the range-bucket + broadcast-
    offset idiom (``behavior._range_rank`` — no table-spanning window)
    under the unique (score, id) order, tile closed-form. Counts are
    exact integers; each row spends ONE float tree. Off-support deciles
    (no controls) surface with NULL terms. Returns
    (decile, n, n_treated, n_control, conv_treated, conv_control,
    uplift_term).
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import _range_rank

    t = (
        treated_col if not isinstance(treated_col, str) else F.col(treated_col)
    ).cast("boolean")
    y = (
        outcome_col if not isinstance(outcome_col, str) else F.col(outcome_col)
    ).cast("boolean")
    rid = F.col(id_col) if id_col else F.monotonically_increasing_id()
    if id_col is None:
        raise ValueError(
            "id_col is required: the decile order must be a unique, "
            "engine-replayable total order"
        )
    staged = df.select(
        F.col(score_col).cast("long").alias("__score"),
        rid.alias("__id"),
        t.alias("__t"),
        y.alias("__y"),
    )
    # Store the unit-grain input once under the rank fan-out (r12, the
    # r11 rfm_scores pattern): _range_rank scans its input twice (bucket
    # counts + in-bucket window) and the __n denominator's
    # crossJoin(broadcast) subtree re-executed the WHOLE ranked tower a
    # third time — each replay re-running the caller's per-unit rollup
    # over the fact table. One stored copy collapses every replay to a
    # cheap scan, and __n counts the STORE: _range_rank is 1:1
    # row-preserving over non-NULL scores (a NULL bucket never matches
    # the offset equi-join), so the filtered store count is
    # value-identical to counting the ranked output.
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize,
    )

    staged = materialize(staged, "uplift_staged_")
    ranked = _range_rank(staged, "__score", "__id", bucket_width, "__r")
    n_row = staged.filter(F.col("__score").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
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
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("__t"), 1).otherwise(0))
        .cast("long")
        .alias("n_treated"),
        F.sum(F.when(~F.col("__t"), 1).otherwise(0))
        .cast("long")
        .alias("n_control"),
        F.sum(F.when(F.col("__t") & F.col("__y"), 1).otherwise(0))
        .cast("long")
        .alias("conv_treated"),
        F.sum(F.when(~F.col("__t") & F.col("__y"), 1).otherwise(0))
        .cast("long")
        .alias("conv_control"),
    )
    term = F.when(
        F.col("n_control") > 0,
        F.col("conv_treated").cast("double")
        - F.col("conv_control").cast("double")
        * (
            F.col("n_treated").cast("double")
            / F.col("n_control").cast("double")
        ),
    )
    return per.select(
        "decile",
        "n",
        "n_treated",
        "n_control",
        "conv_treated",
        "conv_control",
        term.alias("uplift_term"),
    )


def diff_in_diff(
    df: DataFrame,
    group_col,
    period_col,
    outcome_col: str,
) -> DataFrame:
    """Difference-in-differences estimator — the 2x2 causal workhorse
    when treatment lands at a known time: DiD = (T_after − T_before) −
    (C_after − C_before), which cancels both the group's fixed gap and
    the common time trend (``stratified_ate`` controls composition;
    this controls TIME).

    One conditional-sum aggregation builds all four cells (exact
    integer outcome sums + counts); the four means and the DiD are one
    fixed float tree. Returns one row with the four cell means, their
    counts, and ``did``; NULL if any cell is empty (no basis for the
    parallel-trends subtraction).
    """
    g = (
        group_col if not isinstance(group_col, str) else F.col(group_col)
    ).cast("boolean")
    p = (
        period_col if not isinstance(period_col, str) else F.col(period_col)
    ).cast("boolean")
    y = F.col(outcome_col).cast("long")
    staged = df.select(g.alias("__t"), p.alias("__a"), y.alias("__y"))

    def cell(t, a, what):
        cond = (F.col("__t") == t) & (F.col("__a") == a)
        if what == "n":
            return F.sum(F.when(cond, 1).otherwise(0)).cast("long")
        return F.coalesce(
            F.sum(F.when(cond, F.col("__y"))), F.lit(0)
        ).cast("long")

    agg = staged.agg(
        cell(True, False, "n").alias("n_treat_before"),
        cell(True, True, "n").alias("n_treat_after"),
        cell(False, False, "n").alias("n_ctrl_before"),
        cell(False, True, "n").alias("n_ctrl_after"),
        cell(True, False, "s").alias("__s_tb"),
        cell(True, True, "s").alias("__s_ta"),
        cell(False, False, "s").alias("__s_cb"),
        cell(False, True, "s").alias("__s_ca"),
    )

    def mean(s, n):
        return F.when(
            F.col(n) > 0, F.col(s).cast("double") / F.col(n).cast("double")
        )

    m_tb = mean("__s_tb", "n_treat_before")
    m_ta = mean("__s_ta", "n_treat_after")
    m_cb = mean("__s_cb", "n_ctrl_before")
    m_ca = mean("__s_ca", "n_ctrl_after")
    return agg.select(
        "n_treat_before",
        "n_treat_after",
        "n_ctrl_before",
        "n_ctrl_after",
        m_tb.alias("mean_treat_before"),
        m_ta.alias("mean_treat_after"),
        m_cb.alias("mean_ctrl_before"),
        m_ca.alias("mean_ctrl_after"),
        ((m_ta - m_tb) - (m_ca - m_cb)).alias("did"),
    )


def info_gain_terms(
    df: DataFrame,
    feature_col: str,
    label_col,
) -> DataFrame:
    """Information gain of a BOUNDED-cardinality categorical feature
    about a boolean label, as per-category terms — the entropy-based
    feature screen next to ``chi2_feature_label`` (chi2 measures
    dependence strength; IG measures it in bits, comparable across
    features with different cardinalities).

    IG = H(Y) − sum_x p(x) H(Y|x). Each output row carries its
    category's weighted conditional-entropy term −p(x)·sum_y p(y|x)·
    log2(p(y|x)) plus the (repeated) corpus H(Y), both built from exact
    integer cell counts with the psi_bands 6dp log convention — the
    consumer's IG = h_y − sum(cond_entropy_term) over the tiny table.
    Returns (feature_value, n, n_pos, cond_entropy_term, h_y).
    """
    lbl = (
        label_col if not isinstance(label_col, str) else F.col(label_col)
    ).cast("boolean")
    cells = (
        df.select(F.col(feature_col).alias("__x"), lbl.alias("__y"))
        .groupBy("__x")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("__y"), 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
        )
    )
    totals = cells.agg(
        F.sum("n").cast("long").alias("__nn"),
        F.sum("n_pos").cast("long").alias("__yy"),
    )
    staged = cells.crossJoin(F.broadcast(totals))
    ln2 = F.log(F.lit(2.0))

    def plogp(num, den):
        # −(num/den)·log2(num/den), rounded to 6dp; 0 when num == 0
        p = num.cast("double") / den.cast("double")
        return F.when(
            num > 0, F.round(-p * F.log(p) / ln2, 6)
        ).otherwise(F.lit(0.0))

    n_neg = F.col("n") - F.col("n_pos")
    h_cond = plogp(F.col("n_pos"), F.col("n")) + plogp(n_neg, F.col("n"))
    w = F.col("n").cast("double") / F.col("__nn").cast("double")
    yy_neg = F.col("__nn") - F.col("__yy")
    h_y = plogp(F.col("__yy"), F.col("__nn")) + plogp(yy_neg, F.col("__nn"))
    return staged.select(
        F.col("__x").alias("feature_value"),
        "n",
        "n_pos",
        F.round(w * h_cond, 6).alias("cond_entropy_term"),
        h_y.alias("h_y"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    bucket_width: int = 1_000,
) -> DataFrame:
    """EXACT Kruskal-Wallis H (one-way ANOVA on ranks, the K-group
    extension of the Mann-Whitney/AUC rank-sum): does the distribution of
    an integer-valued column differ across K groups, distribution-free.

    Machinery shared with :func:`exact_auc`: a per-VALUE rollup with
    per-group counts, exact midranks from the range-bucket +
    broadcast-offset idiom (2·mid = 2·c_below + n_v + 1, integral), and
    per-group doubled rank sums S_g = Σ n_gv·two_mid accumulated as
    BIGINT — every input to the float stage is an exact integer.

    Engine-exact float assembly: each group's term 3·S_g²/(n_g·N·(N+1))
    (the 12/(N(N+1)) factor folded in, 12/4 = 3) is ONE IEEE float tree
    over exactly-represented integers (S_g < 2^53 casts exactly; the
    square and divisions are correctly rounded, so both engines produce
    the same double); the cross-group sum is an ORDERED cumulative
    window over the K-row rollup — a left-fold both engines replay
    bit-identically (an unordered SUM(double) is association-order-
    dependent, and round-to-9dp-then-DECIMAL disagrees between engines
    at rounding boundaries). H = Σterms − 3(N+1) with one final
    small-scalar subtraction. Tie correction C = 1 − Σ(t³−t)/(N³−N)
    uses int64 sums cast once to double. Returns one row:
    (n, k_groups, h, h_corrected); NULL h when every row ties on one
    value (C = 0) or k < 2.

    100 TB shape: two data-sized shuffles — the (value, group) rollup
    and its value marginal — then everything runs on value-domain-sized
    rollups; the only ordered-unbounded window is over the BUCKET rollup
    (the AUC discipline). At >1e9 rows per group, promote S_g to
    DECIMAL(38,0) (the exact_auc guard); the default stays int64 for the
    exact-cast property documented above.
    """
    pg, tot, ties = _rank_group_sums(df, value_col, group_col, bucket_width)
    sgd = F.col("__sg").cast("double")
    term = (F.lit(3.0) * sgd * sgd) / (
        F.col("__ng").cast("double")
        * F.col("n").cast("double")
        * (F.col("n") + F.lit(1)).cast("double")
    )
    w_cum = Window.orderBy("__g").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cums = pg.crossJoin(F.broadcast(tot)).select(
        "__g", F.sum(term).over(w_cum).alias("__cum")
    )
    terms = cums.agg(
        F.max(F.struct(F.col("__g"), F.col("__cum"))).alias("__last")
    ).select(F.col("__last.__cum").alias("__st"))
    out = tot.crossJoin(F.broadcast(terms)).crossJoin(F.broadcast(ties))
    h = F.col("__st") - (
        F.lit(3) * (F.col("n") + F.lit(1))
    ).cast("double")
    n_d = F.col("n").cast("double")
    c = F.lit(1.0) - F.col("__t").cast("double") / (
        n_d * n_d * n_d - n_d
    )
    valid = (F.col("k_groups") >= 2) & (
        F.col("__t").cast("double") < n_d * n_d * n_d - n_d
    )
    return out.select(
        "n",
        "k_groups",
        F.when(valid, h).alias("h"),
        F.when(valid, h / c).alias("h_corrected"),
    )


def welch_t_two_sample(
    df: DataFrame,
    value_col: str,
    right,
) -> DataFrame:
    """Welch's unequal-variance two-sample t over an INTEGER value column
    — the parametric sibling of the exact-AUC rank test, built on the
    overdispersion_by_group moment discipline: per-side n, Σx, Σx² in
    int64 (every sum < 2^53 casts to double exactly for the value ranges
    this engine benchmarks; promote to DECIMAL(38,0) past ~1e9 rows of
    wide values), unbiased variance from the n·Q − S² numerator, then
    t and the Welch-Satterthwaite df as ONE fixed float tree per side —
    IEEE-deterministic across engines because every leaf is an exactly-
    cast integer. Returns one row: (n_left, n_right, mean_left,
    mean_right, t_stat, df); NULLs when either side has n < 2 or both
    variances are zero.
    """
    r = (right if not isinstance(right, str) else F.col(right)).cast("boolean")
    per = (
        df.select(
            F.col(value_col).cast("long").alias("__x"),
            F.when(r, 1).otherwise(0).alias("__side"),
        )
        .groupBy("__side")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__x").cast("long").alias("__s"),
            F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__q"),
        )
    )

    def side(col, s):
        return F.max(F.when(F.col("__side") == s, F.col(col)))

    wide = per.agg(
        side("__n", 0).alias("n0"), side("__s", 0).alias("s0"),
        side("__q", 0).alias("q0"),
        side("__n", 1).alias("n1"), side("__s", 1).alias("s1"),
        side("__q", 1).alias("q1"),
    )

    def stats(n, s, q):
        nd = F.col(n).cast("double")
        mean = F.col(s).cast("double") / nd
        var = (
            nd * F.col(q).cast("double")
            - F.col(s).cast("double") * F.col(s).cast("double")
        ) / (nd * (nd - F.lit(1.0)))
        return nd, mean, var

    n0, m0, v0 = stats("n0", "s0", "q0")
    n1, m1, v1 = stats("n1", "s1", "q1")
    a = v0 / n0
    b = v1 / n1
    se2 = a + b
    t = (m0 - m1) / F.sqrt(se2)
    dof = (se2 * se2) / (
        a * a / (n0 - F.lit(1.0)) + b * b / (n1 - F.lit(1.0))
    )
    valid = (
        F.col("n0").isNotNull() & F.col("n1").isNotNull()
        & (F.col("n0") > 1) & (F.col("n1") > 1)
    )
    return wide.select(
        F.col("n0").alias("n_left"),
        F.col("n1").alias("n_right"),
        F.when(valid, m0).alias("mean_left"),
        F.when(valid, m1).alias("mean_right"),
        F.when(valid & (se2 > 0), t).alias("t_stat"),
        F.when(valid & (se2 > 0), dof).alias("df"),
    )


def _rank_group_sums(
    df: DataFrame, value_col: str, group_col: str, bucket_width: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared midrank machinery for the K-group rank tests
    (:func:`kruskal_wallis`, :func:`dunn_pairwise_z`): returns
    (per-group ``(__g, __ng, __sg)`` with S_g = doubled rank sum,
    per-corpus ``(n, k_groups)``, tie rollup ``(__t,)`` with
    T = Σ(t³ − t)) — every column an exact int64."""
    vals = (
        df.select(
            F.col(value_col).cast("long").alias("__v"),
            F.col(group_col).alias("__g"),
        )
        .groupBy("__v", "__g")
        .agg(F.count(F.lit(1)).cast("long").alias("__ngv"))
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # grid cut: the (value, group) rollup is value-domain x K bounded
    # and feeds the per-value rollup, the midrank join, and the group
    # sums — un-cut, each consumer re-derived it through the full fact
    # lineage (r10 plan audit: 10 fact scans in kruskal/dunn)
    vals = materialize(vals, "rankgrid_vals_")
    pv = vals.groupBy("__v").agg(F.sum("__ngv").cast("long").alias("__nv"))
    bucketed = pv.withColumn(
        "__b", F.floor(F.col("__v") / F.lit(bucket_width)).cast("long")
    )
    counts = bucketed.groupBy("__b").agg(F.sum("__nv").alias("__bn"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__b").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = bucketed.join(F.broadcast(offsets), "__b").select(
        "__v",
        (
            F.lit(2)
            * (
                F.col("__off")
                + F.coalesce(F.sum("__nv").over(w_in), F.lit(0))
            )
            + F.col("__nv")
            + F.lit(1)
        ).cast("long").alias("__two_mid"),
    )
    pg = (
        vals.join(ranked, "__v")
        .groupBy("__g")
        .agg(
            F.sum("__ngv").cast("long").alias("__ng"),
            F.sum(F.col("__ngv") * F.col("__two_mid")).cast("long").alias("__sg"),
        )
    )
    tot = pg.agg(
        F.sum("__ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
    )
    ties = pv.agg(
        F.sum(
            F.col("__nv") * F.col("__nv") * F.col("__nv") - F.col("__nv")
        ).cast("long").alias("__t")
    )
    return pg, tot, ties


def dunn_pairwise_z(
    df: DataFrame,
    value_col: str,
    group_col: str,
    bucket_width: int = 1_000,
) -> DataFrame:
    """Dunn's post-hoc pairwise z after a Kruskal-Wallis rejection:
    WHICH groups differ, not just "some group differs". Shares the
    midrank grid with :func:`kruskal_wallis` (same per-group doubled
    rank sums S_g, same tie rollup) and emits one row per unordered
    group pair:

        z_ij = (m_i − m_j) / sqrt( (N(N+1)/12 − T/(12(N−1)))
                                    · (1/n_i + 1/n_j) )

    with m_g = S_g/(2·n_g) the tie-corrected mean rank. The pair space
    is the K-row group rollup self-joined on g_a < g_b — K(K−1)/2 rows,
    broadcast, never data-sized. Every float leaf is an exactly-cast
    int64 and the z tree is fixed, so both engines reproduce the value
    bit for bit. Returns (group_a, group_b, n_a, n_b, mean_rank_a,
    mean_rank_b, z_dunn); z NULL when the tie term consumes the whole
    variance (all values equal) or N < 2.
    """
    pg, tot, ties = _rank_group_sums(df, value_col, group_col, bucket_width)
    left = pg.select(
        F.col("__g").alias("group_a"),
        F.col("__ng").alias("n_a"),
        F.col("__sg").alias("__sa"),
    )
    right = pg.select(
        F.col("__g").alias("group_b"),
        F.col("__ng").alias("n_b"),
        F.col("__sg").alias("__sb"),
    )
    pairs = (
        left.join(F.broadcast(right), F.col("group_a") < F.col("group_b"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
    )
    nd = F.col("n").cast("double")
    ma = F.col("__sa").cast("double") / (
        F.lit(2.0) * F.col("n_a").cast("double")
    )
    mb = F.col("__sb").cast("double") / (
        F.lit(2.0) * F.col("n_b").cast("double")
    )
    var = (
        nd * (nd + F.lit(1.0)) / F.lit(12.0)
        - F.col("__t").cast("double")
        / (F.lit(12.0) * (nd - F.lit(1.0)))
    ) * (
        F.lit(1.0) / F.col("n_a").cast("double")
        + F.lit(1.0) / F.col("n_b").cast("double")
    )
    valid = (F.col("n") > 1) & (var > 0)
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        ma.alias("mean_rank_a"),
        mb.alias("mean_rank_b"),
        F.when(valid, (ma - mb) / F.sqrt(var)).alias("z_dunn"),
    )


def cochran_armitage_trend(
    df: DataFrame,
    score_col: str,
    label,
) -> DataFrame:
    """Cochran-Armitage trend test: is a BINARY outcome monotonically
    associated with an ORDERED integer exposure score — the
    dose-response sibling of the chi2 independence screen (chi2 asks
    "any association", this asks "a trend in score order", one degree of
    freedom, far more powerful when the alternative is monotone).

        z = (N·Σs·r − R·Σs·n) /
            sqrt( R(N−R)/N · (N·Σs²n − (Σs·n)²) / N )
          = diff / sqrt(R(N−R)(N·Σs²n − (Σsn)²)/N²)  [algebra folded
            into one fixed tree below]

    All five sufficient statistics (N, R, Σsn, Σsr, Σs²n) are exact
    int64 sums from ONE map-side-combinable aggregation over the
    per-score rollup; the z/z² assembly is a fixed IEEE float tree whose
    leaves are exactly-cast integers — deterministic across engines.
    Keep scores SMALL (band indexes, not raw cents): the products stay
    within the 2^53 exact-integer window of a double; past ~1e9 rows
    promote the sums to DECIMAL(38,0) (the exact_auc guard). Returns one
    row: (n, n_pos, k_scores, z_trend, z2_trend); NULL when the outcome
    or the score is constant.
    """
    lab = (label if not isinstance(label, str) else F.col(label)).cast(
        "boolean"
    )
    per = (
        df.select(
            F.col(score_col).cast("long").alias("__s"),
            F.when(lab, 1).otherwise(0).alias("__y"),
        )
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__y").cast("long").alias("__r"),
        )
    )
    agg = per.agg(
        F.sum("__n").cast("long").alias("n"),
        F.sum("__r").cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("k_scores"),
        F.sum(F.col("__s") * F.col("__n")).cast("long").alias("__sn"),
        F.sum(F.col("__s") * F.col("__r")).cast("long").alias("__sr"),
        F.sum(F.col("__s") * F.col("__s") * F.col("__n"))
        .cast("long")
        .alias("__s2n"),
    )
    nd = F.col("n").cast("double")
    rd = F.col("n_pos").cast("double")
    diff = nd * F.col("__sr").cast("double") - rd * F.col("__sn").cast("double")
    den = (
        rd
        * (nd - rd)
        * (
            nd * F.col("__s2n").cast("double")
            - F.col("__sn").cast("double") * F.col("__sn").cast("double")
        )
        / nd
    )
    valid = (
        (F.col("n_pos") > 0)
        & (F.col("n_pos") < F.col("n"))
        & (F.col("k_scores") > 1)
    )
    z = diff / F.sqrt(den)
    return agg.select(
        "n",
        "n_pos",
        "k_scores",
        F.when(valid & (den > 0), z).alias("z_trend"),
        F.when(valid & (den > 0), z * z).alias("z2_trend"),
    )


def brunner_munzel(
    df: DataFrame,
    value_col: str,
    right,
    bucket_width: int = 1_000,
) -> DataFrame:
    """Brunner-Munzel two-sample test (stochastic superiority with
    unequal variances — the modern replacement for Mann-Whitney when the
    two distributions may differ in shape, not just location).

    Built entirely on tied-value rollups: GLOBAL midranks (the exact_auc
    bucket-offset grid) and WITHIN-GROUP midranks (same grid, cumulated
    per side), giving every row's doubled placement 2P = 2R − 2R^w as an
    exact integer per (value, side) cell. Per-side placement moments
    (n, Σ2P, Σ(2P)²) accumulate in int64/DECIMAL(38,0); the estimator

        d  = (m₂ − m₁) + (n₂ − n₁)/2      (= R̄₂ − R̄₁, global ranks)
        p̂  = d/N + 1/2                    (P(X₁ < X₂) + ½P(=))
        W  = n₁n₂·d / ((n₁+n₂)·sqrt(n₁v₁ + n₂v₂))
        df = (n₁v₁ + n₂v₂)² / ((n₁v₁)²/(n₁−1) + (n₂v₂)²/(n₂−1))

    (m/v the per-side placement mean/ddof-1 variance) is one fixed IEEE
    float tree whose leaves are exactly-cast integers / scale-0 decimals
    — deterministic across engines. Returns one row: (n_left, n_right,
    p_hat, w_stat, df); NULLs when a side has n < 2 or both placement
    variances are 0 (complete separation still yields p_hat 0/1).
    """
    staged = df.select(
        F.col(value_col).cast("long").alias("__v"),
        F.when(
            (right if not isinstance(right, str) else F.col(right)).cast(
                "boolean"
            ),
            1,
        )
        .otherwise(0)
        .alias("__side"),
    )
    gv = staged.groupBy("__v", "__side").agg(
        F.count(F.lit(1)).cast("long").alias("__ngv")
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # grid cut: the (value, side) rollup feeds the global + within-group
    # midrank paths and the cell join (r10 plan audit: 5 fact scans)
    gv = materialize(gv, "bm_gv_")
    pv = gv.groupBy("__v").agg(F.sum("__ngv").cast("long").alias("__nv"))
    b = F.floor(F.col("__v") / F.lit(bucket_width)).cast("long")

    def midranks(rollup: DataFrame, count_col: str, part_cols: list[str]):
        """two_mid per (part_cols..., __v) under the bucket-offset idiom;
        partition-scoped when part_cols names the side."""
        staged_r = rollup.withColumn("__b", b)
        counts = staged_r.groupBy(*part_cols, "__b").agg(
            F.sum(count_col).alias("__bn")
        )
        w_off = Window.partitionBy(*part_cols).orderBy("__b").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = counts.select(
            *part_cols,
            "__b",
            F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
        )
        w_in = Window.partitionBy(*part_cols, "__b").orderBy("__v").rowsBetween(
            Window.unboundedPreceding, -1
        )
        return staged_r.join(F.broadcast(offsets), [*part_cols, "__b"]).select(
            *part_cols,
            "__v",
            (
                F.lit(2)
                * (
                    F.col("__off")
                    + F.coalesce(F.sum(count_col).over(w_in), F.lit(0))
                )
                + F.col(count_col)
                + F.lit(1)
            ).cast("long").alias("__two_mid"),
        )

    glob = midranks(pv, "__nv", []).select("__v", F.col("__two_mid").alias("__tg"))
    within = midranks(gv, "__ngv", ["__side"]).select(
        "__side", "__v", F.col("__two_mid").alias("__tw")
    )
    cells = (
        gv.join(glob, "__v")
        .join(within, ["__side", "__v"])
        .select(
            "__side",
            "__ngv",
            (F.col("__tg") - F.col("__tw")).alias("__p2"),  # doubled placement
        )
    )
    per = cells.groupBy("__side").agg(
        F.sum("__ngv").cast("long").alias("__n"),
        F.sum(F.col("__ngv") * F.col("__p2")).cast("long").alias("__s"),
        F.sum(
            F.col("__ngv").cast("decimal(38,0)")
            * (
                F.col("__p2").cast("decimal(38,0)")
                * F.col("__p2").cast("decimal(38,0)")
            )
        ).alias("__q"),
    )

    def side(col, s):
        return F.max(F.when(F.col("__side") == s, F.col(col)))

    wide = per.agg(
        side("__n", 0).alias("n0"), side("__s", 0).alias("s0"),
        side("__q", 0).alias("q0"),
        side("__n", 1).alias("n1"), side("__s", 1).alias("s1"),
        side("__q", 1).alias("q1"),
    )

    def mv(n, s, q):
        # placement moments: P = p2/2, so mean = S/(2n) and the ddof-1
        # variance carries a /4: v = (n·Q − S²) / (4·n·(n−1))
        nd = F.col(n).cast("double")
        mean = F.col(s).cast("double") / (F.lit(2.0) * nd)
        var = (
            (
                F.col(n).cast("decimal(38,0)") * F.col(q)
                - (F.col(s).cast("decimal(38,0)") * F.col(s))
            ).cast("double")
        ) / (F.lit(4.0) * nd * (nd - F.lit(1.0)))
        return nd, mean, var

    n0, m0, v0 = mv("n0", "s0", "q0")
    n1, m1, v1 = mv("n1", "s1", "q1")
    nd = n0 + n1
    # the statistic runs on the GLOBAL mean-rank difference R̄₁ − R̄₀ =
    # (m₁ − m₀) + (n₁ − n₀)/2 — placement means alone drop the group-size
    # offset and bias p̂ whenever n₀ ≠ n₁ (caught by the complete-
    # separation pytest: p̂ must be exactly 1)
    d = (m1 - m0) + (n1 - n0) / F.lit(2.0)
    p_hat = d / nd + F.lit(0.5)
    pooled = n0 * v0 + n1 * v1
    w = (n0 * n1 * d) / (nd * F.sqrt(pooled))
    dof = (pooled * pooled) / (
        (n0 * v0) * (n0 * v0) / (n0 - F.lit(1.0))
        + (n1 * v1) * (n1 * v1) / (n1 - F.lit(1.0))
    )
    valid = (
        F.col("n0").isNotNull() & F.col("n1").isNotNull()
        & (F.col("n0") > 1) & (F.col("n1") > 1)
    )
    return wide.select(
        F.col("n0").alias("n_left"),
        F.col("n1").alias("n_right"),
        F.when(valid, p_hat).alias("p_hat"),
        F.when(valid & (pooled > 0), w).alias("w_stat"),
        F.when(valid & (pooled > 0), dof).alias("df"),
    )


def proportion_ci_by_group(
    df: DataFrame,
    group_col: str,
    label,
    z: float = 1.96,
) -> DataFrame:
    """Per-group binomial share with the Wilson score interval — the
    monitoring table behind every conversion/defect-rate dashboard (the
    Wald interval misbehaves at small n / extreme p; Wilson is the
    standard fix). One map-side-combinable aggregation; the interval is
    one fixed IEEE float tree per group row over exact int64 counts with
    a LITERAL z (both engines parse the same constant). Returns
    (group, n, n_pos, share, wilson_lo, wilson_hi).
    """
    lab = (label if not isinstance(label, str) else F.col(label)).cast(
        "boolean"
    )
    per = (
        df.select(
            F.col(group_col).alias("grp"),
            F.when(lab, 1).otherwise(0).alias("__y"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__y").cast("long").alias("n_pos"),
        )
    )
    nd = F.col("n").cast("double")
    p = F.col("n_pos").cast("double") / nd
    z2 = F.lit(float(z)) * F.lit(float(z))
    denom = F.lit(1.0) + z2 / nd
    center = (p + z2 / (F.lit(2.0) * nd)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(p * (F.lit(1.0) - p) / nd + z2 / (F.lit(4.0) * nd * nd))
        / denom
    )
    return per.select(
        "grp",
        "n",
        "n_pos",
        p.alias("share"),
        # clamp: at p in {0,1} the exact bound is 0/1 but the float tree
        # can land an ulp outside; both engines clamp identically
        F.greatest(center - half, F.lit(0.0)).alias("wilson_lo"),
        F.least(center + half, F.lit(1.0)).alias("wilson_hi"),
    )


def mcnemar_paired(
    events: DataFrame,
    type_x: str = "click",
    type_y: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """McNemar's test of marginal homogeneity for two PAIRED binaries —
    per user, "did type_x ever happen" vs "did type_y ever happen". The
    matched-design complement to the independent-sample chi2 family:
    only the DISCORDANT pairs carry information (a user who did both or
    neither says nothing about which behavior is more prevalent).
    Returns exactly ONE row: (n_pairs, n_both, n_only_x, n_only_y,
    n_neither, mcnemar_chi2) with the continuity-corrected statistic
    (|b - c| - 1)^2 / (b + c), NULL when no discordant pairs exist.

    Exactness: the 2x2 concordance cells are exact integers from one
    user-keyed rollup; the statistic is one integer square over one
    integer divide — a single float division total.
    """
    flags = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.max(F.when(F.col(type_col) == type_x, 1).otherwise(0)).alias(
            "__x"
        ),
        F.max(F.when(F.col(type_col) == type_y, 1).otherwise(0)).alias(
            "__y"
        ),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(
            F.sum(F.col("__x") * F.col("__y")), F.lit(0)
        )
        .cast("long")
        .alias("n_both"),
        F.coalesce(
            F.sum(F.col("__x") * (F.lit(1) - F.col("__y"))), F.lit(0)
        )
        .cast("long")
        .alias("n_only_x"),
        F.coalesce(
            F.sum((F.lit(1) - F.col("__x")) * F.col("__y")), F.lit(0)
        )
        .cast("long")
        .alias("n_only_y"),
        F.coalesce(
            F.sum((F.lit(1) - F.col("__x")) * (F.lit(1) - F.col("__y"))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_neither"),
    )
    b, c = F.col("n_only_x"), F.col("n_only_y")
    absdiff = F.abs(b - c)
    corrected = F.greatest(absdiff - F.lit(1), F.lit(0))
    return agg.select(
        "n_pairs",
        "n_both",
        "n_only_x",
        "n_only_y",
        "n_neither",
        F.when(
            (b + c) > 0,
            (corrected * corrected).cast("double")
            / (b + c).cast("double"),
        ).alias("mcnemar_chi2"),
    )


def cochran_q(
    events: DataFrame,
    types: list[str] | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Cochran's Q test across k MATCHED binary treatments — per user,
    the presence flags of k event types; Q asks whether the k behaviors
    have equal prevalence given that the SAME users are measured on all
    of them (the k-treatment generalization of McNemar). Returns
    exactly ONE row: (n_users, k, t_total, df, q_stat).

    Exactness: using column totals C_j, row totals R_i, and T = sum R_i,
    Q = (k-1) * (k*sum(C_j^2) - T^2) / (k*T - sum(R_i^2)) — every term
    is an exact int64 (squares of counts; promote to DECIMAL(38,0) past
    ~3e9 users), and the statistic is ONE float division. Users whose
    row is all-ones or all-zeros contribute nothing to either side
    (standard Q behavior, kept implicit — the algebra cancels them).
    NULL q_stat when the denominator is zero (every user uniform).

    Scale shape: one user-keyed rollup with k conditional maxes, then a
    one-row reduce; k is a fixed literal list.
    """
    types = types or ["view", "click", "purchase"]
    k = len(types)
    flag_cols = [
        F.max(F.when(F.col(type_col) == t, 1).otherwise(0)).alias(
            f"__f{i}"
        )
        for i, t in enumerate(types)
    ]
    flags = events.groupBy(F.col(user_col).alias("__u")).agg(*flag_cols)
    row_sum = sum(
        [F.col(f"__f{i}") for i in range(k)], F.lit(0)
    ).cast("long")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.coalesce(F.sum(row_sum), F.lit(0)).cast("long").alias("t_total"),
        F.coalesce(F.sum(row_sum * row_sum), F.lit(0))
        .cast("long")
        .alias("__r2"),
    ]
    for i in range(k):
        aggs.append(
            F.coalesce(F.sum(F.col(f"__f{i}")), F.lit(0))
            .cast("long")
            .alias(f"__c{i}")
        )
    agg = flags.agg(*aggs)
    c2 = sum(
        [F.col(f"__c{i}") * F.col(f"__c{i}") for i in range(k)], F.lit(0)
    ).cast("long")
    t = F.col("t_total")
    num = (F.lit(k - 1) * (F.lit(k) * c2 - t * t)).cast("long")
    den = (F.lit(k) * t - F.col("__r2")).cast("long")
    return agg.select(
        "n_users",
        F.lit(k).cast("long").alias("k"),
        "t_total",
        F.lit(k - 1).cast("long").alias("df"),
        F.when(den > 0, num.cast("double") / den.cast("double")).alias(
            "q_stat"
        ),
    )


def wilcoxon_signed_rank(
    diffs: DataFrame,
    diff_col: str = "d",
    bucket_width: int = 1_000,
) -> DataFrame:
    """Wilcoxon signed-rank test over PAIRED integer differences — the
    continuous matched-design sibling of :func:`mcnemar_paired` (two
    measurements on the SAME unit; is the median difference zero?).
    Zero differences are dropped (standard Wilcoxon), |d| is midranked
    with the shared :func:`_rank_group_sums` grid (sign as the group
    key), and the normal approximation carries the standard tie
    correction. Returns exactly ONE row: (n_pairs, n_nonzero,
    w_plus_x2, tie_term, z_wilcoxon).

    Exactness: w_plus_x2 is the DOUBLED positive-rank sum (midranks are
    half-integral under ties, doubling keeps int64 exact — the Spearman
    convention); with n nonzero pairs and T = sum(t^3 - t) the scaled
    moments 4*mean = n(n+1) and 48*var = 2n(n+1)(2n+1) - T are exact
    int64, so z = (num_x4 / 4) / sqrt(var_x48 / 48) with
    num_x4 = 2*w_plus_x2... see below — ONE fixed IEEE tree. NULL z
    when every pair ties at zero or the variance degenerates (all |d|
    equal in one tie group).

    Scale shape: the rank grid is value-bucketed (the kruskal_wallis
    discipline); diff magnitudes are the only shuffled key.
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize_if_large,
    )

    # unit-sized paired-diff frame, two consumers (the rank grid + the
    # n_pairs count): size-gated cut (r10 plan audit)
    diffs = materialize_if_large(diffs, "wilcoxon_diffs_")
    d = F.col(diff_col).cast("long")
    nz = diffs.filter(d != 0).select(
        F.abs(d).alias("__v"),
        F.when(d > 0, F.lit("pos")).otherwise(F.lit("neg")).alias("__g"),
    )
    pg, tot, ties = _rank_group_sums(nz, "__v", "__g", bucket_width)
    wide = pg.agg(
        F.coalesce(
            F.sum(F.when(F.col("__g") == "pos", F.col("__sg"))), F.lit(0)
        )
        .cast("long")
        .alias("w_plus_x2"),
    )
    n_pairs = diffs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    tot2 = tot.select(F.coalesce(F.col("n"), F.lit(0)).alias("__n"))
    joined = (
        n_pairs.crossJoin(F.broadcast(wide))
        .crossJoin(F.broadcast(tot2))
        .crossJoin(F.broadcast(ties))
    )
    n = F.col("__n")
    t_term = F.coalesce(F.col("__t"), F.lit(0)).cast("long")
    # 4*W+ - n(n+1) = 2*w_plus_x2 - n(n+1)  (W+ = w_plus_x2 / 2)
    num_x4 = (F.lit(2) * F.col("w_plus_x2") - n * (n + F.lit(1))).cast(
        "long"
    )
    var_x48 = (
        F.lit(2) * n * (n + F.lit(1)) * (F.lit(2) * n + F.lit(1)) - t_term
    ).cast("long")
    z = (num_x4.cast("double") / F.lit(4.0)) / F.sqrt(
        var_x48.cast("double") / F.lit(48.0)
    )
    return joined.select(
        "n_pairs",
        n.alias("n_nonzero"),
        "w_plus_x2",
        t_term.alias("tie_term"),
        F.when((n > 0) & (var_x48 > 0), z).alias("z_wilcoxon"),
    )


def brown_forsythe_terms(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group Brown-Forsythe variance-drift terms (wave 110) — the
    robust Levene variant: Z_ij = |x_ij - median_i| per observation,
    then the one-way-ANOVA F on the Z values. Mean-shift tests
    (KS/W1/t) are blind to a population whose CENTER holds while its
    SPREAD explodes — the regime-change signature (fee experiments,
    mixed traffic, sensor degradation) this screens for, robust to
    heavy tails because the center is the exact MEDIAN, not the mean.

    Exact integer core: values quantize to the integer ``scale`` grid;
    the per-group median comes from the cumulative count grid and is
    kept INTEGRAL by doubling (med2 = qv_lo + qv_hi — lower/upper
    middle, so even-n averaging never leaves the integers); per-row
    deviations z2 = |2*qv - med2| roll up to exact S1 = sum(cnt*z2),
    S2 = sum(cnt*z2^2) in DECIMAL(38,0). Every emitted float is a
    FIXED per-row scalar tree over those integers (one row per group;
    no cross-row float sum anywhere — the psi_bands / contingency_chi2
    order-independence convention), so both engines emit identical
    doubles. ECDF windows use the (group, 1024-point bucket) two-level
    pattern; the count grid is (group x value-domain)-bounded and
    materialized once for its three consumers (cumulative grid, group
    totals, deviation rollup).

    Returns one row per group: (group, n, z_mean, between_term,
    within_ss), in VALUE units. The consumer-side statistic is
    W = (N-k)/(k-1) * sum(between_term) / sum(within_ss), F(k-1, N-k)
    under equal spreads.
    """
    q = df.select(
        F.col(group_col).alias("g"),
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv"),
    ).filter(F.col("__qv").isNotNull())
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    counts = materialize(
        q.groupBy("g", "__qv").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        ),
        "bf_counts_",
    )
    # per-group cumulative over the grid — (g, bucket) two-level windows
    keyed = counts.withColumn(
        "__bk", F.floor(F.col("__qv") / F.lit(1024)).cast("long")
    )
    bsums = keyed.groupBy("g", "__bk").agg(F.sum("cnt").alias("__b"))
    w_boff = (
        Window.partitionBy("g")
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boffs = bsums.select(
        "g",
        "__bk",
        F.coalesce(F.sum("__b").over(w_boff), F.lit(0)).alias("__o"),
    )
    w_in = (
        Window.partitionBy("g", "__bk")
        .orderBy("__qv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boffs_r = boffs.withColumnRenamed("g", "__gb")
    cum = (
        keyed.join(
            boffs_r,
            keyed["g"].eqNullSafe(boffs_r["__gb"])
            & (keyed["__bk"] == boffs_r["__bk"]),
        )
        .drop(boffs_r["__bk"])
        .drop("__gb")
        .select(
            "g",
            "__qv",
            (F.sum("cnt").over(w_in) + F.col("__o")).alias("f"),
        )
    )
    tot = counts.groupBy("g").agg(F.sum("cnt").cast("long").alias("n"))
    tot_r = tot.withColumnRenamed("g", "__gt")
    ranked = cum.join(tot_r, cum["g"].eqNullSafe(tot_r["__gt"])).drop("__gt")
    # doubled exact median: lower middle at rank (n+1)//2, upper middle
    # at rank n//2 + 1 (equal when n is odd)
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor(F.col("n") / 2) + 1
    med = ranked.groupBy("g").agg(
        F.min(F.when(F.col("f") >= lo, F.col("__qv"))).alias("__qlo"),
        F.min(F.when(F.col("f") >= hi, F.col("__qv"))).alias("__qhi"),
    )
    med_r = med.select(
        F.col("g").alias("__gm"),
        (F.col("__qlo") + F.col("__qhi")).alias("med2"),
    )
    dev = counts.join(
        med_r, counts["g"].eqNullSafe(med_r["__gm"])
    ).drop("__gm")
    z2 = F.abs(2 * F.col("__qv") - F.col("med2"))
    gstats = dev.groupBy("g").agg(
        F.sum(F.col("cnt").cast("decimal(38,0)") * z2).alias("s1"),
        F.sum(
            F.col("cnt").cast("decimal(38,0)") * z2 * z2
        ).alias("s2"),
        F.sum("cnt").cast("long").alias("n"),
    )
    glob = gstats.agg(
        F.sum("s1").alias("__a"),
        F.sum("n").cast("long").alias("__nn"),
    )
    out = gstats.crossJoin(F.broadcast(glob))
    sc2 = F.lit(float(2 * scale))
    zbar_g = F.col("s1").cast("double") / (F.col("n").cast("double") * sc2)
    zbar = F.col("__a").cast("double") / (F.col("__nn").cast("double") * sc2)
    dmean = zbar_g - zbar
    between = F.col("n").cast("double") * dmean * dmean
    within = (
        F.col("s2").cast("double")
        - (F.col("s1") * F.col("s1")).cast("double")
        / F.col("n").cast("double")
    ) / (sc2 * sc2)
    return out.select(
        F.col("g").alias(group_col),
        "n",
        zbar_g.alias("z_mean"),
        between.alias("between_term"),
        within.alias("within_ss"),
    )


def median_test_terms(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group Mood's-median-test terms (wave 110): split every
    observation at the POOLED exact median, count above vs at-or-below
    per group, and emit each group's two chi-square cell terms — the
    nonparametric "did this tenant's center move" screen that stays
    valid under wild non-normality where ANOVA's assumptions die.

    Exact core: pooled doubled median from the global cumulative grid
    (the ks_two_sample 1024-point bucketed windows); per-group above /
    at-or-below counts are exact longs; each group's chi2_term is the
    two-cell sum (N*o - n_g*T)^2 / (N*n_g*T) computed as a FIXED
    per-row scalar tree over exact DECIMAL(38,0) numerators (the
    contingency_chi2 convention — one float division per cell, no
    cross-row float sums). Consumer sums chi2_term against
    chi-square(k-1).

    Returns one row per group: (group, n, n_above, expected_above,
    chi2_term) — chi2_term NULL when a margin is empty (all pooled
    values at or below the median, or an empty side), where the test
    is undefined.
    """
    q = df.select(
        F.col(group_col).alias("g"),
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv"),
    ).filter(F.col("__qv").isNotNull())
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    counts = materialize(
        q.groupBy("g", "__qv").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        ),
        "mt_counts_",
    )
    # pooled cumulative grid (group-free) for the global median
    pooled = counts.groupBy("__qv").agg(F.sum("cnt").alias("pc"))
    keyed = pooled.withColumn(
        "__bk", F.floor(F.col("__qv") / F.lit(1024)).cast("long")
    )
    bsums = keyed.groupBy("__bk").agg(F.sum("pc").alias("__b"))
    w_boff = Window.orderBy("__bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    boffs = bsums.select(
        "__bk",
        F.coalesce(F.sum("__b").over(w_boff), F.lit(0)).alias("__o"),
    )
    w_in = Window.partitionBy("__bk").orderBy("__qv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = keyed.join(F.broadcast(boffs), "__bk").select(
        "__qv", (F.sum("pc").over(w_in) + F.col("__o")).alias("f")
    )
    nn = pooled.agg(F.sum("pc").cast("long").alias("__nn"))
    lo = F.floor((F.col("__nn") + 1) / 2)
    hi = F.floor(F.col("__nn") / 2) + 1
    med = cum.crossJoin(F.broadcast(nn)).agg(
        (
            F.min(F.when(F.col("f") >= lo, F.col("__qv")))
            + F.min(F.when(F.col("f") >= hi, F.col("__qv")))
        ).alias("med2")
    )
    split = counts.crossJoin(F.broadcast(med))
    above = F.when(2 * F.col("__qv") > F.col("med2"), F.col("cnt")).otherwise(
        F.lit(0)
    )
    gstats = split.groupBy("g").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(above).cast("long").alias("n_above"),
    )
    glob = gstats.agg(
        F.sum("n").cast("long").alias("__tn"),
        F.sum("n_above").cast("long").alias("__ta"),
    )
    out = gstats.crossJoin(F.broadcast(glob))
    t_b = F.col("__tn") - F.col("__ta")  # pooled at-or-below margin
    o_b = F.col("n") - F.col("n_above")

    def cell(o, t) -> F.Column:
        num = (
            F.col("__tn").cast("decimal(38,0)") * o
            - F.col("n").cast("decimal(38,0)") * t
        )
        return (num * num).cast("double") / (
            F.col("__tn").cast("double")
            * F.col("n").cast("double")
            * t.cast("double")
        )

    valid = (F.col("__ta") > 0) & (t_b > 0) & (F.col("n") > 0)
    expected_above = (
        F.col("n").cast("double")
        * F.col("__ta").cast("double")
        / F.col("__tn").cast("double")
    )
    return out.select(
        F.col("g").alias(group_col),
        "n",
        "n_above",
        expected_above.alias("expected_above"),
        F.when(
            valid, cell(F.col("n_above"), F.col("__ta")) + cell(o_b, t_b)
        ).alias("chi2_term"),
    )
