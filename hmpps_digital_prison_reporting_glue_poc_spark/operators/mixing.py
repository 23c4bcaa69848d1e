"""Data-selection and mixture operators for LLM training pipelines:
DSIR-style importance weights, domain mixing factors, and deterministic
weighted sampling.

Determinism contract (same as the dedup family): every random choice is an
md5 hash, every floating-point reduction is either avoided (integer
counts, ratios of exact integers) or made order-free by rounding each term
to a fixed decimal scale and summing DECIMALs — so an independent SQL
engine reproduces the outputs bit-for-bit.

Scale shape: unigram statistics ride one token-keyed shuffle each; the
per-document reductions are second shuffles keyed by doc id; vocabulary
and per-group tables are broadcast. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens
from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
    materialize as _materialize,
)


def _u32(col: F.Column) -> F.Column:
    """First 8 hex chars of md5 as an unsigned 32-bit integer — the
    engine-portable uniform hash used across this repo."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def dsir_importance_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "is_target",
) -> DataFrame:
    """DSIR-style (Xie et al., Data Selection via Importance Resampling)
    importance weight per document: the log-likelihood ratio of the doc
    under add-1-smoothed unigram models of the TARGET subcorpus (rows
    where ``target_col``) versus the FULL corpus.

        w(doc) = sum over token occurrences of
                 ln( (tgt_c+1)/(tgt_total+V) / ((all_c+1)/(all_total+V)) )

    Exactness: each occurrence term is computed as ln of a ratio of exact
    int64 products (both engines divide the same two doubles), rounded to
    6 decimals, and summed as DECIMAL(28,6) — an order-free reduction, so
    the result is reproducible in ANSI SQL despite float ln.

    Scale shape: token frequency tables are one groupBy each over the
    token explode; they join back to the exploded stream on the token key
    (Catalyst broadcasts them when small; at web scale this is the
    standard skew-safe token-keyed equi-join), and the per-doc sum is one
    doc-keyed shuffle. V (vocabulary size) and totals are scalar
    aggregates crossed in, never collected.
    Returns (id, n_tokens, dsir_logweight).
    """
    toks = df.select(
        F.col(id_col),
        F.col(target_col).alias("__is_tgt"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    # The frequency table feeds both the totals aggregate and the
    # per-occurrence scoring join; store it once (vocabulary-sized) so
    # the corpus-wide token count does not re-run per consumer.
    freqs = _materialize(
        toks.groupBy("token").agg(
            F.count(F.lit(1)).alias("all_c"),
            F.sum(F.when(F.col("__is_tgt"), 1).otherwise(0)).alias("tgt_c"),
        ),
        "dsir_freqs_",
    )
    totals = freqs.agg(
        F.sum("all_c").alias("all_total"),
        F.sum("tgt_c").alias("tgt_total"),
        F.count(F.lit(1)).alias("vocab"),
    )
    # ln of a ratio of integer products: (tgt_c+1)*(all_total+V) over
    # (all_c+1)*(tgt_total+V). Each FACTOR is cast to double before the
    # multiply: factors are bounded by corpus token count (~1e12 at
    # 100 TB, exact in double below 2^53) but their PRODUCT can exceed
    # int64, where Spark (ANSI off) would silently wrap while DuckDB
    # widens — double*double instead rounds once, identically (IEEE) in
    # both engines at any scale.
    term = F.round(
        F.log(
            (
                (F.col("tgt_c") + 1).cast("double")
                * (F.col("all_total") + F.col("vocab")).cast("double")
            )
            / (
                (F.col("all_c") + 1).cast("double")
                * (F.col("tgt_total") + F.col("vocab")).cast("double")
            )
        ),
        6,
    ).cast("decimal(28,6)")
    scored = (
        toks.join(freqs, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(term).cast("double").alias("dsir_logweight"),
        )
    )
    return scored


def domain_mix_weights(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain mixture statistics for temperature-scaled sampling
    (the alpha=0.5 regime — sqrt — because IEEE sqrt is correctly rounded
    and therefore engine-exact, unlike pow): document/token counts, the
    domain's exact token share, and two sampling factors —

    - ``upsample_factor = sqrt(all_tokens / domain_tokens)``: the relative
      oversampling a sqrt-temperature mixture applies to this domain;
    - ``weight_vs_max = sqrt(domain_tokens / max_domain_tokens)``: the
      domain's sampling weight normalised by the largest domain (max is an
      order-free reduction, so no float-summation hazard).

    One corpus token-count groupBy; the totals come from an unpartitioned
    window OVER THE AGGREGATED per-domain table (domain-count rows, not
    corpus rows) so the corpus aggregation runs once — a crossJoin with a
    separately-derived totals frame would re-run it per side.
    Returns (group, n_docs, n_tokens, token_share, upsample_factor,
    weight_vs_max).
    """
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col(text_col)))).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    per = per.withColumn(
        "all_tokens", F.sum("n_tokens").over(w)
    ).withColumn("max_tokens", F.max("n_tokens").over(w))
    return (
        per
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_tokens",
            (
                F.col("n_tokens").cast("double")
                / F.col("all_tokens").cast("double")
            ).alias("token_share"),
            F.sqrt(
                F.col("all_tokens").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("upsample_factor"),
            F.sqrt(
                F.col("n_tokens").cast("double")
                / F.col("max_tokens").cast("double")
            ).alias("weight_vs_max"),
        )
    )


def weighted_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    project: bool = True,
) -> DataFrame:
    """Deterministic per-group Bernoulli sampling — the "apply the mixture
    weights" step. Each group's keep-rate is itself md5-derived (uniform in
    [0.25, 0.75): ``rate_u32 = u32(md5(group))/2 + 2^30``) and a document
    is kept iff ``u32(md5('s:' || id)) < rate_u32``. Pure integer
    comparisons: content-stable, partition-independent, reproducible in
    any engine — re-running the pipeline keeps the same documents.

    Shuffle-free: both hashes are narrow row-local expressions.
    Returns the kept rows as (id, group, rate_u32) — or, with
    ``project=False``, the kept rows with ALL input columns (the composed
    corpus pipeline continues with text in the same scan).
    """
    rate = F.floor(_u32(F.col(group_col)) / F.lit(2)).cast("long") + F.lit(
        1 << 30
    ).cast("long")
    draw = _u32(F.concat(F.lit("s:"), F.col(id_col).cast("string")))
    kept = df.withColumn("__rate", rate).filter(draw < F.col("__rate"))
    if not project:
        return kept.drop("__rate")
    return kept.select(
        F.col(id_col),
        F.col(group_col),
        F.col("__rate").alias("rate_u32"),
    )


def quality_quantile_gate(
    df: DataFrame,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    drop_frac: float = 0.2,
) -> DataFrame:
    """Per-domain quantile quality gating: drop each group's bottom
    ``drop_frac`` by score — the per-domain-threshold filtering step a
    quality pipeline runs after scoring (a global threshold would gut
    under-resourced domains whose score distribution sits lower).

    Exact and engine-portable: rows rank by (score asc, id asc) inside
    their group, the group's cutoff is ``floor(drop_frac * n)`` (integer
    arithmetic on the count; drop_frac is a dyadic rational by contract
    so the double product is exact), and a row survives iff
    ``rank > cutoff``. One shuffle on the group key; rank and count ride
    the same window partition. Returns survivors with (q_rank, n_group,
    cutoff).
    """
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    w_all = Window.partitionBy(group_col)
    ranked = (
        df.withColumn("q_rank", F.row_number().over(w_rank).cast("long"))
        .withColumn("n_group", F.count(F.lit(1)).over(w_all).cast("long"))
        .withColumn(
            "cutoff",
            F.floor(F.lit(drop_frac) * F.col("n_group").cast("double")).cast(
                "long"
            ),
        )
    )
    return ranked.filter(F.col("q_rank") > F.col("cutoff"))


def quality_decile_audit(
    df: DataFrame,
    score_col: str,
    signal_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = 10,
) -> DataFrame:
    """Calibration audit for a quality score: bucket each domain's
    documents into score deciles and report an independent integer
    signal's exact mean per (domain, decile) — the curve a pipeline
    inspects before choosing a filter threshold (a well-calibrated score
    shows the signal trending monotonically across deciles).

    ntile runs inside the domain partition (bounded strata of large
    groups — the documented per-domain window pattern); means are exact
    integer-sum / count divisions. Returns (group, decile, n_docs,
    mean_signal, min_score, max_score).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    bucketed = df.withColumn("decile", F.ntile(n_buckets).over(w))
    return (
        bucketed.groupBy(group_col, "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col(signal_col)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_signal"),
            F.min(score_col).cast("long").alias("min_score"),
            F.max(score_col).cast("long").alias("max_score"),
        )
        .withColumn("decile", F.col("decile").cast("long"))
    )


def winsorized_signal_means(
    df: DataFrame,
    signal_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    trim_rank_frac: float = 0.1,
) -> DataFrame:
    """Outlier-robust per-domain signal means: rank-winsorize each
    group's integer signal (values below the ``trim_rank_frac`` rank
    clamp UP to that rank's value, values above the symmetric upper rank
    clamp DOWN), then take the exact mean — the robust location estimate
    quality dashboards use when a handful of garbage documents would
    swamp a plain mean.

    Rank-based winsorization (not value-based): cut points are the
    values AT ranks ceil(f*n) and n+1-ceil(f*n) under the total order
    (signal, id), so everything stays integer-exact — the mean is an
    int64 sum divided once. One window shuffle on the group key; cut
    values ride a same-partition max/min window, no second pass.
    Returns (group, n_docs, lo_cut, hi_cut, winsorized_mean, raw_mean).
    """
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col(signal_col).asc(), F.col(id_col).asc()
    )
    w_all = Window.partitionBy(group_col)
    k = F.ceil(
        F.lit(trim_rank_frac) * F.count(F.lit(1)).over(w_all).cast("double")
    ).cast("long")
    ranked = (
        df.withColumn("__r", F.row_number().over(w_rank).cast("long"))
        .withColumn("__n", F.count(F.lit(1)).over(w_all).cast("long"))
        .withColumn("__k", k)
    )
    lo_cut = F.max(
        F.when(F.col("__r") == F.col("__k"), F.col(signal_col))
    ).over(w_all)
    hi_cut = F.max(
        F.when(
            F.col("__r") == F.col("__n") + 1 - F.col("__k"),
            F.col(signal_col),
        )
    ).over(w_all)
    clamped = ranked.withColumn("__lo", lo_cut).withColumn("__hi", hi_cut)
    wins = F.least(F.greatest(F.col(signal_col), F.col("__lo")), F.col("__hi"))
    return (
        clamped.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("__lo").cast("long").alias("lo_cut"),
            F.min("__hi").cast("long").alias("hi_cut"),
            (
                F.sum(wins).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("winsorized_mean"),
            (
                F.sum(signal_col).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("raw_mean"),
        )
    )


def weak_label_vote(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Weak-supervision label aggregation (the Snorkel majority-vote
    tier): three deterministic labeling functions vote quality/keep on
    each document — LF1: length (>= 30 tokens), LF2: lexical diversity
    (distinct/total >= 0.5), LF3: digit-light (< 10% digit chars); each
    emits +1 (keep), -1 (drop) or 0 (abstain, when its signal is in the
    uncertain middle band). Output per doc: the three votes, the vote
    sum, the majority label and the conflict flag (some + and some -) —
    the columns a downstream label model trains on.

    Pure per-row column expressions (one corpus pass, no shuffle); a
    production deployment swaps the literal LFs for anything expressible
    as a column or Arrow kernel — the aggregation contract is the point.
    """
    toked = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("__toks"),
        F.length(text_col).cast("double").alias("__chars"),
        (
            F.length(text_col)
            - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
        ).cast("double").alias("__digits"),
    )
    n = F.size("__toks")
    lf1 = (
        F.when(n >= 30, 1).when(n < 10, -1).otherwise(0)
    )
    diversity = F.size(F.array_distinct(F.col("__toks"))).cast("double") / F.greatest(
        n, F.lit(1)
    ).cast("double")
    lf2 = (
        F.when(diversity >= 0.5, 1).when(diversity < 0.25, -1).otherwise(0)
    )
    digit_share = F.col("__digits") / F.greatest(F.col("__chars"), F.lit(1.0))
    lf3 = (
        F.when(digit_share < 0.10, 1).when(digit_share > 0.30, -1).otherwise(0)
    )
    voted = toked.select(
        F.col(id_col),
        lf1.cast("long").alias("lf_length"),
        lf2.cast("long").alias("lf_diversity"),
        lf3.cast("long").alias("lf_digits"),
    )
    vote_sum = (
        F.col("lf_length") + F.col("lf_diversity") + F.col("lf_digits")
    )
    has_pos = F.greatest("lf_length", "lf_diversity", "lf_digits") == 1
    has_neg = F.least("lf_length", "lf_diversity", "lf_digits") == -1
    return voted.select(
        id_col,
        "lf_length",
        "lf_diversity",
        "lf_digits",
        vote_sum.alias("vote_sum"),
        F.when(vote_sum > 0, F.lit("keep"))
        .when(vote_sum < 0, F.lit("drop"))
        .otherwise(F.lit("abstain"))
        .alias("majority_label"),
        (has_pos & has_neg).alias("conflict"),
    )


def token_budget_waterfill(
    df: DataFrame,
    group_col: str = "source",
    size_col: str = "n_tokens",
    budget: int = 1_000_000,
) -> DataFrame:
    """Water-filling token-budget allocation across sources: find the
    integer cap ``c`` maximising ``sum(min(size_g, c)) <= budget`` and
    allocate ``min(size_g, c)`` tokens to each source — the standard
    way a data-mixture spec caps over-represented domains under a fixed
    total token budget (sources smaller than the cap keep everything,
    larger ones are clipped to the same waterline).

    Exact integer solve, no iteration: with sizes sorted ascending and
    ``csum_k`` the cumulative size of the k-1 smallest, the candidate
    cap funding rows k..m equally is ``c_k = (budget - csum_k) div
    (m - k + 1)``; the waterline is the first k where ``c_k < size_k``
    (every earlier source is fully funded by construction), else no cap
    binds. The scan is a window over ONE ROW PER SOURCE — metadata-
    scale, like every mixture table here; the corpus itself only feeds
    the per-source size aggregate (one map-side-combined shuffle).
    Returns (group, total_tokens, allocated_tokens, capped).
    """
    sizes = df.groupBy(group_col).agg(
        F.sum(F.col(size_col)).cast("long").alias("total_tokens")
    )
    w_ord = Window.orderBy(
        F.col("total_tokens").asc(), F.col(group_col).asc()
    )
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    ranked = sizes.select(
        group_col,
        "total_tokens",
        F.row_number().over(w_ord).alias("__k"),
        F.coalesce(F.sum("total_tokens").over(w_prev), F.lit(0)).alias(
            "__csum"
        ),
        F.count(F.lit(1)).over(w_all).alias("__m"),
    )
    remaining = F.lit(int(budget)).cast("long") - F.col("__csum")
    cand = F.expr(
        f"div({int(budget)}L - __csum, __m - __k + 1)"
    )
    annotated = ranked.withColumn(
        "__cand",
        F.when((remaining >= 0) & (cand < F.col("total_tokens")), cand),
    )
    # first valid candidate by k, as a struct arg-min aggregate: always
    # exactly ONE row (cap NULL when the budget covers every source), so
    # the cross join below cannot wipe the result on the uncapped path
    cap_row = annotated.agg(
        F.min(
            F.when(
                F.col("__cand").isNotNull(),
                F.struct(F.col("__k"), F.col("__cand")),
            )
        ).alias("__s")
    ).select(F.col("__s.__cand").alias("__cap"))
    return (
        annotated.join(F.broadcast(cap_row), how="cross")
        .select(
            group_col,
            "total_tokens",
            F.when(
                F.col("__cap").isNotNull(),
                F.least(F.col("total_tokens"), F.col("__cap")),
            )
            .otherwise(F.col("total_tokens"))
            .cast("long")
            .alias("allocated_tokens"),
            (
                F.col("__cap").isNotNull()
                & (F.col("total_tokens") > F.col("__cap"))
            ).alias("capped"),
        )
    )


def curriculum_interleave(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n_bins: int = 4,
) -> DataFrame:
    """Mixture-preserving deterministic training order: rank the corpus
    by ``score_col`` (ties broken by id), cut the rank range into
    ``n_bins`` equal difficulty bins, and round-robin-interleave the bins
    so every consecutive window of ``n_bins`` positions holds one doc of
    each difficulty — the fixed, reproducible data order a curriculum /
    anti-curriculum training run materialises (uniform difficulty mix at
    every training step, no difficulty "phases").

    One range-bucketed two-level exact global rank (the
    ``corpus.global_sort_rank`` idiom — no table-spanning window), then
    EVERYTHING else is closed-form in (rank r, total n): the bin is
    ``floor((r-1)·k/n)``, the bin's first rank is ``floor(b·n/k)+1``, the
    within-bin rank follows by subtraction, and the interleaved position
    is ``(r_b - 1)·k + b``. No second rank pass, no join by bin.
    Returns (id, score, bin, pos) — ``pos`` is the 0-based training
    order, a permutation of 0..n-1 (pinned by pytest).
    """
    bucketed = df.select(
        F.col(id_col), F.col(score_col).cast("double").alias("__score")
    ).withColumn(
        # range bucket on the score keeps bucketing order-consistent;
        # resolution matters only for balance, not correctness
        "__b", F.floor(F.col("__score") * 16).cast("long")
    )
    counts = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    total = counts.agg(F.sum("__n").cast("long").alias("__n_total"))
    w_in = Window.partitionBy("__b").orderBy("__score", id_col)
    ranked = (
        bucketed.join(F.broadcast(offsets), "__b")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.col("__score").alias("score"),
            (F.row_number().over(w_in) + F.col("__off")).cast("long").alias("__r"),
            "__n_total",
        )
    )
    n = F.col("__n_total")
    # clamp: more bins than rows would leave empty bins and gaps in the
    # round-robin positions (caught by the hypothesis permutation test)
    k = F.least(F.lit(int(n_bins)), n)
    r = F.col("__r")
    # NTILE-style split (first n%k bins one row larger): with bin sizes
    # NON-INCREASING, round-robin positions (r_b-1)·k + b tile into
    # contiguous blocks with at most one partial block — the LAST — so
    # the result is a gap-free permutation for every (n, k). The earlier
    # floor((r-1)k/n) binning interleaves big and small bins and leaves
    # holes (hypothesis found n=10, k=4).
    quot = F.floor(n / k)
    rem = n % k
    big = quot + 1
    cut = rem * big
    b = F.when(r <= cut, F.floor((r - 1) / big)).otherwise(
        rem + F.floor((r - 1 - cut) / quot)
    ).cast("long")
    bin_first = F.when(b < rem, b * big + 1).otherwise(
        cut + (b - rem) * quot + 1
    )
    pos = ((r - bin_first) * k + b).cast("long")
    return ranked.select(
        id_col,
        "score",
        b.alias("bin"),
        pos.alias("pos"),
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    value_col: str = "value",
    m: float = 100.0,
    scale: int = 100,
) -> DataFrame:
    """Smoothed target encoding — the categorical-feature encoder of
    gradient-boosting pipelines: each category's target mean shrunk
    toward the global prior with pseudo-count ``m``, so rare categories
    don't memorize their few labels (encoded = (sum + m·prior)/(n + m)).

    Targets quantize to integer cents (exact int64 sums, engine-portable);
    the ONLY floating-point steps are the two final divisions, written as
    a fixed expression tree (prior = S/N computed once, then one
    fused multiply-add-free chain) so Spark and any ANSI engine produce
    bit-identical doubles. The global prior is a 1-row aggregate
    broadcast-cross-joined onto the per-category rollup — one shuffle on
    the category key, nothing else. Returns (cat, n, sum_cents, encoded).
    """
    qv = (
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv")
    )
    per_cat = (
        df.select(F.col(cat_col).alias("cat"), qv)
        .groupBy("cat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__qv").cast("long").alias("sum_cents"),
        )
    )
    totals = df.select(qv).agg(
        F.count(F.lit(1)).cast("long").alias("__N"),
        F.sum("__qv").cast("long").alias("__S"),
    )
    prior = F.col("__S").cast("double") / F.col("__N").cast("double")
    enc = (
        F.col("sum_cents").cast("double") + F.lit(float(m)) * prior
    ) / (F.col("n").cast("double") + F.lit(float(m)))
    return (
        per_cat.crossJoin(F.broadcast(totals))
        .select("cat", "n", "sum_cents", enc.alias("encoded"))
    )


def grouped_percent_rank(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    bucket_width: int = 1_000,
    rank_col: str = "pct_rank",
) -> DataFrame:
    """Exact per-group percent_rank when the GROUPS are hot: a plain
    ``percent_rank() over (partition by group)`` funnels each group
    through one task — fatal when the grouping column has a handful of
    values holding billions of rows (event types, languages, sources).
    Same cure as the global-rank fix, applied per group: range-bucket the
    value inside each group, rank in-bucket, add broadcast per-(group,
    bucket) cumulative offsets; with the unique (value, id) total order
    percent_rank is closed-form (r−1)/(n−1). Max task = hottest (group,
    value-range) slice, not the hottest group.

    Returns the input's (id, group, value) plus ``rank_col``; single-row
    groups get 0.0 (the SQL convention).
    """
    rows = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("long").alias("__v"),
        )
        # NULL values are unrankable; exclude them EXPLICITLY instead of
        # relying on the bucket equi-join silently dropping NULL keys —
        # a SQL twin's window would keep them (r9 fuzz sweep)
        .filter(F.col("__v").isNotNull())
        .withColumn(
            "__b", F.floor(F.col("__v") / F.lit(bucket_width)).cast("long")
        )
    )
    counts = rows.groupBy("__g", "__b").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy("__g")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__g",
        "__b",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    totals = counts.groupBy("__g").agg(
        F.sum("__n").cast("long").alias("__nt")
    )
    w_in = Window.partitionBy("__g", "__b").orderBy(
        F.col("__v").asc(), F.col("__id").asc()
    )
    r = F.row_number().over(w_in) + F.col("__off")
    pr = F.when(
        F.col("__nt") > 1,
        (r - F.lit(1)).cast("double")
        / (F.col("__nt") - F.lit(1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        rows.join(F.broadcast(offsets), ["__g", "__b"])
        .join(F.broadcast(totals), "__g")
        .select(
            F.col("__id").alias(id_col),
            F.col("__g").alias(group_col),
            F.col("__v").alias(value_col),
            pr.alias(rank_col),
        )
    )


def equifreq_edges(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    bucket_width: int = 1_000,
) -> DataFrame:
    """Exact equal-frequency bin edges — the learned discretizer edges a
    feature pipeline fits once and broadcasts everywhere (quantile-bin
    encoding, histogram equalization, WOE prep). Edge j (1..n_bins−1) is
    the smallest value whose cumulative count reaches ceil(j·n/n_bins) —
    the exact order statistic, not an approximation.

    Built on the per-VALUE rollup with the range-bucket cumulation (the
    exact_auc machinery): the only ordered-unbounded window runs over
    the bucket rollup, and the edge lookup is a broadcast theta-join of
    the (n_bins−1)-row target table against the cumulated values,
    reduced by MIN — candidate volume is (n_bins−1)·|distinct values
    past the target|, grouped map-side. Returns (edge_idx, edge_value,
    target_rank, cum_count).
    """
    vals = (
        df.select(F.col(value_col).cast("long").alias("__v"))
        .groupBy("__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .withColumn(
            "__b", F.floor(F.col("__v") / F.lit(bucket_width)).cast("long")
        )
    )
    counts = vals.groupBy("__b").agg(F.sum("__n").alias("__bn"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__b").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vals.join(F.broadcast(offsets), "__b").select(
        "__v",
        (F.sum("__n").over(w_in) + F.col("__off")).alias("__cum"),
    )
    total = vals.agg(F.sum("__n").cast("long").alias("__nt"))
    targets = (
        total.select(
            F.explode(
                F.sequence(F.lit(1), F.lit(n_bins - 1))
            ).alias("edge_idx"),
            "__nt",
        )
        # ceil(j*n/B) in exact integer arithmetic
        .select(
            "edge_idx",
            (
                (F.col("edge_idx") * F.col("__nt") + F.lit(n_bins - 1))
                - (F.col("edge_idx") * F.col("__nt") + F.lit(n_bins - 1))
                % F.lit(n_bins)
            ).cast("long").alias("__tr_scaled"),
        )
        .select(
            "edge_idx",
            (F.col("__tr_scaled") / F.lit(n_bins)).cast("long").alias(
                "target_rank"
            ),
        )
    )
    hit = cum.join(
        F.broadcast(targets), F.col("__cum") >= F.col("target_rank"), "inner"
    )
    return (
        hit.groupBy("edge_idx", "target_rank")
        .agg(
            F.min(F.struct(F.col("__v"), F.col("__cum"))).alias("__best")
        )
        .select(
            "edge_idx",
            F.col("__best.__v").alias("edge_value"),
            "target_rank",
            F.col("__best.__cum").alias("cum_count"),
        )
    )


def feature_hash_stats(
    df: DataFrame,
    cross_cols: list[str],
    n_buckets: int = 64,
    salt: str = "fh1",
) -> DataFrame:
    """Hashing-trick collision audit: cross the given feature columns,
    hash the cross into ``n_buckets`` via md5 (engine-portable integer
    derivation — the split_assign convention, no JVM-specific hash), and
    report per bucket the row count and the number of DISTINCT crosses
    sharing it. A bucket with n_distinct_crosses > 1 is a collision —
    the audit a pipeline runs before committing to a hashed feature
    dimension ("is D big enough for this cross's cardinality?").

    One groupBy on (bucket, cross) then a bucket rollup — both map-side
    combined; nothing data-sized leaves the executors. Returns
    (bucket, n_rows, n_distinct_crosses).
    """
    cross = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in cross_cols]
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), cross)), 1, 8), 16, 10
        ).cast("long")
        % n_buckets
    )
    per_cross = (
        df.select(bucket.alias("bucket"), cross.alias("__x"))
        .groupBy("bucket", "__x")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    return per_cross.groupBy("bucket").agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_crosses"),
    )


def eb_shrunk_rates(
    df: DataFrame,
    category_col: str,
    outcome_col,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-category rates —
    the CTR/quality-rate smoother that keeps a 2-impression category
    from outranking a 10,000-impression one: method-of-moments beta
    prior fit on the observed rate spread, then posterior mean
    (y + alpha)/(n + alpha + beta) per category. The adaptive-strength
    sibling of ``target_encode`` (whose prior strength is a fixed k).

    Exactness: the pooled mean is ONE divide (mu = Y/N); the
    between-category moment needs a cross-category sum of per-category
    rationals with different denominators, so each term
    (y_c*N − n_c*Y)^2 / (n_c*N^2) — one divide from exact integers —
    is rounded to 9 dp and summed as DECIMAL(38,9), the token_pagerank
    recipe that makes a float sum order-free and engine-exact. The
    prior strength M = mu(1−mu)/v − 1 and each posterior are fixed
    float trees. Returns (category, n, n_pos, raw_rate, prior_strength,
    shrunk_rate); prior_strength and shrunk_rate are NULL when the
    moment estimate is degenerate (v <= 0, v >= mu(1-mu), or a single
    category) — the honest "no basis to shrink" answer.
    """
    out = (
        outcome_col if not isinstance(outcome_col, str) else F.col(outcome_col)
    ).cast("boolean")
    cells = (
        df.select(F.col(category_col).alias("__c"), out.alias("__o"))
        .groupBy("__c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("__o"), 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
        )
    )
    totals = cells.agg(
        F.count(F.lit(1)).cast("long").alias("__k"),
        F.sum("n").cast("long").alias("__nn"),
        F.sum("n_pos").cast("long").alias("__yy"),
    )
    staged = cells.crossJoin(F.broadcast(totals))
    dev = (
        F.col("n_pos").cast("decimal(38,0)") * F.col("__nn")
        - F.col("n").cast("decimal(38,0)") * F.col("__yy")
    ).cast("double")
    # (r_c − mu)^2 = dev^2 / (n_c^2 * N^2): the SIMPLE between-category
    # rate variance (sampling noise not subtracted — the conservative
    # prior; a noisier category can only shrink MORE, never less)
    term = F.round(
        dev
        * dev
        / (
            F.col("n").cast("double")
            * F.col("n").cast("double")
            * F.col("__nn").cast("double")
            * F.col("__nn").cast("double")
        ),
        9,
    ).cast("decimal(38,9)")
    mom = staged.agg(F.sum(term).alias("__s"))
    prior = (
        totals.crossJoin(F.broadcast(mom))
        .select(
            "__k",
            "__nn",
            "__yy",
            (F.col("__yy").cast("double") / F.col("__nn").cast("double")).alias(
                "__mu"
            ),
            F.when(
                F.col("__k") > 1,
                F.col("__s").cast("double")
                / (F.col("__k") - 1).cast("double"),
            ).alias("__v"),
        )
        .select(
            "__nn",
            "__yy",
            "__mu",
            "__v",
            F.when(
                F.col("__v").isNotNull()
                & (F.col("__v") > 0.0)
                & (F.col("__v") < F.col("__mu") * (F.lit(1.0) - F.col("__mu"))),
                F.col("__mu") * (F.lit(1.0) - F.col("__mu")) / F.col("__v")
                - F.lit(1.0),
            ).alias("prior_strength"),
        )
    )
    final = cells.crossJoin(F.broadcast(prior))
    alpha = F.col("prior_strength") * F.col("__mu")
    shrunk = F.when(
        F.col("prior_strength").isNotNull(),
        (F.col("n_pos").cast("double") + alpha)
        / (F.col("n").cast("double") + F.col("prior_strength")),
    )
    return final.select(
        F.col("__c").alias(category_col),
        "n",
        "n_pos",
        (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
            "raw_rate"
        ),
        "prior_strength",
        shrunk.alias("shrunk_rate"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Quantile normalization across groups — map every group's value
    distribution onto the POOLED distribution (the batch-effect remover:
    after it, every source's doc-length histogram is the corpus
    histogram, so a length-based quality gate can't favor one crawl).

    Each distinct (group, value) keeps its in-group cumulative rank r
    (of n_g); its normalized value is the pooled EXACT order statistic
    at rank ceil(r*N/n_g) — the equifreq_edges integer order-statistic
    idiom: ceil via (r*N + n_g − 1 − ((r*N + n_g − 1) mod n_g))/n_g,
    the pooled lookup via a broadcast theta-join (pooled cum >= target)
    reduced by MIN. Everything is integer-exact; there is no float at
    all. Per-group windows run over per-group VALUE ROLLUPS (bounded by
    distinct values, not rows). Returns one row per distinct
    (group, value): (group, value, n, in_group_rank, target_rank,
    normalized_value).
    """
    from pyspark.sql import Window

    g = F.col(group_col)
    v = F.col(value_col).cast("long")
    cells = (
        df.select(g.alias("__g"), v.alias("__v"))
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    w_in = Window.partitionBy("__g").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = cells.withColumn(
        "__r", F.sum("__n").over(w_in).cast("long")
    )
    sizes = cells.groupBy("__g").agg(F.sum("__n").cast("long").alias("__ng"))
    total = cells.agg(F.sum("__n").cast("long").alias("__nn"))
    pooled = (
        cells.groupBy("__v")
        .agg(F.sum("__n").cast("long").alias("__pn"))
        .withColumn(
            "__cum",
            F.sum("__pn")
            .over(
                Window.orderBy("__v").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .cast("long"),
        )
        .select(F.col("__v").alias("__pv"), "__pn", "__cum")
    )
    staged = (
        ranked.join(F.broadcast(sizes), "__g")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__t",
            (
                (
                    F.col("__r") * F.col("__nn")
                    + F.col("__ng")
                    - 1
                    - (
                        (F.col("__r") * F.col("__nn") + F.col("__ng") - 1)
                        % F.col("__ng")
                    )
                )
                / F.col("__ng")
            ).cast("long"),
        )
    )
    # band join: rank t lives in exactly ONE pooled bucket
    # (cum − pn < t <= cum) — single match per row, no reduce needed
    hit = staged.join(
        F.broadcast(pooled),
        (F.col("__cum") >= F.col("__t"))
        & (F.col("__cum") - F.col("__pn") < F.col("__t")),
    ).withColumnRenamed("__pv", "normalized_value")
    return hit.select(
        F.col("__g").alias(group_col),
        F.col("__v").alias(value_col),
        F.col("__n").alias("n"),
        F.col("__r").alias("in_group_rank"),
        F.col("__t").alias("target_rank"),
        "normalized_value",
    )
