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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _profile_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    frames = []
    for c in cols:
        grouped = df.select(c).groupBy(c).agg(F.count(F.lit(1)).alias("__cnt"))
        frames.append(
            grouped.agg(
                F.lit(c).alias("column"),
                # coalesce(0): SUM over an EMPTY table is NULL while the
                # oracle's COUNT(*) is 0 — row counts are defined (zero)
                # on empty input (r9 fuzz harness, "empty" seed)
                F.coalesce(F.sum("__cnt"), F.lit(0)).cast("long").alias("n_rows"),
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


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    band_col,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit — the third leg of the release-governance trio
    (``k_anonymity_audit``, ``l_diversity_audit``): a quasi-identifier
    group can be k-anonymous AND l-diverse yet still leak if its
    sensitive-attribute DISTRIBUTION diverges from the corpus (e.g. one
    department's salaries all in the top band). Closeness is the Earth
    Mover's Distance between the group's distribution and the global one
    over the ORDERED sensitive bands:

        EMD(P_g, Q) = (1 / (m - 1)) * SUM_i | CUM_g(i)/N_g - CUM(i)/N |

    Exactness: the cumulative terms are rewritten over a COMMON integer
    numerator — |CUM_g(i) * N - CUM(i) * N_g| — so the whole sum is
    int64 arithmetic (bands*rows products stay under 2^63 up to ~10^9
    rows x 10^3 bands) and only the final division is a double: the
    audit verdict is bit-identical across engines and partitionings.

    Plan: one groupBy on (QI, band), one on band, one on QI — each
    map-side-combinable; the (QI x band) grid completion is a broadcast
    nested-loop of two BOUNDED rollups (groups x bands, never row-scale);
    one per-group window over the grid does the cumulative walk.
    Returns (*quasi_cols, n_rows, n_bands, t_closeness, t_ok).
    """
    band = (
        F.col(band_col) if isinstance(band_col, str) else band_col
    ).alias("__band")
    base = df.select(*[F.col(c) for c in quasi_cols], band)

    bands = base.groupBy("__band").agg(
        F.count(F.lit(1)).cast("long").alias("__n_band")
    )
    w_all = Window.orderBy("__band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bands = bands.withColumn("__cum_all", F.sum("__n_band").over(w_all))
    groups = base.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    gb = base.groupBy(*quasi_cols, "__band").agg(
        F.count(F.lit(1)).cast("long").alias("__n_gb")
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("__N"),
        F.countDistinct("__band").cast("long").alias("__m"),
    )
    grid = (
        groups.crossJoin(F.broadcast(bands.select("__band", "__cum_all")))
        .join(gb, [*quasi_cols, "__band"], "left")
        .withColumn("__n_gb", F.coalesce(F.col("__n_gb"), F.lit(0)))
    )
    w_g = (
        Window.partitionBy(*quasi_cols)
        .orderBy("__band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid = grid.withColumn("__cum_g", F.sum("__n_gb").over(w_g))
    num = F.abs(
        F.col("__cum_g") * F.col("__N") - F.col("__cum_all") * F.col("n_rows")
    )
    per_group = (
        grid.crossJoin(F.broadcast(tot))
        .groupBy(*quasi_cols, "n_rows", "__N", "__m")
        .agg(F.sum(num).cast("long").alias("__emd_num"))
    )
    # m > 1 guard: with a single observed band every group's distribution
    # equals the global one, so EMD is exactly 0 — and the (m-1)
    # normalizer would divide by zero (ANSI throws; r9 fuzz sweep)
    t_val = F.when(
        F.col("__m") > 1,
        F.col("__emd_num").cast("double")
        / (
            (F.col("__m") - 1).cast("double")
            * F.col("n_rows").cast("double")
            * F.col("__N").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    return per_group.select(
        *quasi_cols,
        "n_rows",
        F.col("__m").alias("n_bands"),
        t_val.alias("t_closeness"),
        (t_val <= F.lit(t)).alias("t_ok"),
    )


def chi2_feature_label(
    df: DataFrame,
    feature_col: str,
    label_col,
) -> DataFrame:
    """Per-bin chi-square feature/label screen — the univariate relevance
    test a feature-selection pass runs before training: for each value of
    ``feature_col`` and a boolean label, the 2x2 contingency chi-square
    contribution T·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)) where a = positives
    in the bin, b = negatives in the bin, c/d = the rest of the corpus.

    All four cells derive from ONE groupBy on the feature (a, bin size)
    plus a broadcast 1-row total (P positives, T rows): c = P − a,
    d = (T − n) − c. The statistic is per-row scalar arithmetic over
    exact int64 counts with a fixed double expression tree — no log, no
    order-dependent float sum — so any ANSI engine reproduces it bit-for-
    bit. Returns (bin, n, n_pos, chi2).
    """
    lab = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    binned = df.select(
        F.col(feature_col).alias("bin"),
        F.when(lab, 1).otherwise(0).alias("__pos"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__pos").cast("long").alias("n_pos"),
    )
    totals = binned.agg(
        F.count(F.lit(1)).cast("long").alias("__T"),
        F.sum("__pos").cast("long").alias("__P"),
    )
    a = F.col("n_pos").cast("double")
    b = (F.col("n") - F.col("n_pos")).cast("double")
    c = (F.col("__P") - F.col("n_pos")).cast("double")
    d = (
        F.col("__T") - F.col("n") - (F.col("__P") - F.col("n_pos"))
    ).cast("double")
    t = F.col("__T").cast("double")
    num = t * (a * d - b * c) * (a * d - b * c)
    den = (a + b) * (c + d) * (a + c) * (b + d)
    chi2 = F.when(den > F.lit(0.0), num / den).otherwise(F.lit(0.0))
    return (
        per_bin.crossJoin(F.broadcast(totals))
        .select("bin", "n", "n_pos", chi2.alias("chi2"))
    )


def key_skew_histogram(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Partition-skew diagnostic: the log2 histogram of group sizes for a
    prospective shuffle key — the first thing to look at before keying a
    100 TB join or aggregation on a column ("how hot is the hottest
    key?"). Each key's row count lands in bucket floor(log2(count)),
    computed EXACTLY as length(bin(count)) − 1 (binary digit count, no
    floating-point log that could round differently across engines near
    powers of two).

    Two shuffles by construction: one on the candidate key (the count
    being diagnosed), one on the ~64-value bucket grain. Returns
    (log2_bucket, n_keys, min_rows, max_rows, sum_rows).
    """
    counts = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    bucket = (F.length(F.bin(F.col("__cnt"))) - 1).cast("long")
    return (
        counts.select(bucket.alias("log2_bucket"), "__cnt")
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.min("__cnt").cast("long").alias("min_rows"),
            F.max("__cnt").cast("long").alias("max_rows"),
            F.sum("__cnt").cast("long").alias("sum_rows"),
        )
    )


def jackknife_group_influence(
    df: DataFrame,
    group_col: str,
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Delete-one-group jackknife of a mean: for every group, the metric
    recomputed WITHOUT that group and the delta it induces — the "is any
    single source secretly driving our average" audit a curation
    pipeline runs before trusting a corpus-level number. A group whose
    removal moves the mean by more than the others' spread is a
    dominance / contamination flag.

    All N delete-one estimates come from ONE group rollup plus a
    broadcast 1-row total: mean_without_g = (S − s_g)/(N − n_g) — no
    N passes over the data, no self-join. Integer-cents sums, fixed
    double division tree. Returns (group, n_rows, mean_cents,
    mean_without, delta_cents); mean_without NULL for a group that is
    the whole dataset.
    """
    qv = (
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv")
    )
    per = (
        df.select(F.col(group_col).alias("group"), qv)
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("__qv").cast("long").alias("__s"),
        )
    )
    # NOTE: the session is case-INsensitive, so totals must not be named
    # __N/__S (they would collide with per's __s); totals come from the
    # BASE frame (the target_encode pattern) under distinct names
    tot = df.select(qv).agg(
        F.count(F.lit(1)).cast("long").alias("__tot_n"),
        F.sum("__qv").cast("long").alias("__tot_s"),
    )
    mean_g = F.col("__s").cast("double") / F.col("n_rows").cast("double")
    rest_n = F.col("__tot_n") - F.col("n_rows")
    mean_wo = F.when(
        rest_n > 0,
        (F.col("__tot_s") - F.col("__s")).cast("double")
        / rest_n.cast("double"),
    )
    overall = (
        F.col("__tot_s").cast("double") / F.col("__tot_n").cast("double")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "group",
        "n_rows",
        mean_g.alias("mean_cents"),
        mean_wo.alias("mean_without"),
        (mean_wo - overall).alias("delta_cents"),
    )


def benford_expected_millionths() -> list[int]:
    """Benford first-digit expected frequencies as exact integer
    millionths: round(1e6 * log10(1 + 1/d)) for d = 1..9. Computed ONCE
    in Python (the ndcg_weights_millionths discipline) so both engines
    compare observed counts against IDENTICAL integer literals instead
    of each taking their own log10."""
    import math

    return [
        int(round(1_000_000 * math.log10(1.0 + 1.0 / d)))
        for d in range(1, 10)
    ]


def benford_first_digit(
    df: DataFrame,
    amount_cents_col: str,
) -> DataFrame:
    """Benford's-law first-significant-digit audit over a positive
    integer amount column — the classic fabricated-data / broken-ETL
    screen: natural multi-scale amounts follow P(d) = log10(1 + 1/d),
    while generated or truncated data shows a flat or spiked digit
    histogram.

    The first digit comes from the STRING rendering of the integer
    (substr(cast(n as string), 1, 1)) — no float log10/pow round-trip,
    so values at power-of-ten boundaries can't misclassify. Expected
    frequencies are the integer-millionths literals from
    ``benford_expected_millionths``. One digit-keyed groupBy (9 groups)
    plus a broadcast total; observed_p and the chi-square term are the
    only float expressions, each a fixed tree per row. Returns one row
    per digit 1..9: (digit, n, observed_p, expected_p, chi2_term).
    Non-positive amounts are excluded (Benford is defined on magnitudes).
    """
    exp = benford_expected_millionths()
    amt = F.col(amount_cents_col).cast("long")
    digits = (
        df.select(amt.alias("__a"))
        .filter(F.col("__a") > 0)
        .select(
            F.substring(F.col("__a").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = digits.agg(F.sum("n").cast("long").alias("__t"))
    exp_col = F.lit(None).cast("long")
    for d, e in enumerate(exp, start=1):
        exp_col = F.when(F.col("digit") == d, F.lit(e)).otherwise(exp_col)
    out = digits.crossJoin(F.broadcast(total)).withColumn(
        "__exp_m", exp_col
    )
    observed_p = F.col("n").cast("double") / F.col("__t").cast("double")
    expected_p = F.col("__exp_m").cast("double") / F.lit(1_000_000.0)
    # chi2 term over counts: (o − e)^2 / e with e = total*expected —
    # exact integer numerator (1e6-scaled) over one float divide:
    # (1e6*o − t*exp_m)^2 / (1e6 * t * exp_m)
    num = (
        F.lit(1_000_000).cast("decimal(38,0)") * F.col("n")
        - F.col("__t").cast("decimal(38,0)") * F.col("__exp_m")
    )
    chi2 = (num * num).cast("double") / (
        F.lit(1_000_000.0)
        * F.col("__t").cast("double")
        * F.col("__exp_m").cast("double")
    )
    return out.select(
        "digit",
        "n",
        observed_p.alias("observed_p"),
        expected_p.alias("expected_p"),
        chi2.alias("chi2_term"),
    )


def contingency_chi2(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """RxC contingency chi-square independence screen — the general-
    table extension of the 2x2 ``chi2_feature_label``: per-cell terms of
    sum((o − e)^2 / e) with e = row_total*col_total/n, over two BOUNDED-
    CARDINALITY categoricals.

    The grid is COMPLETED (row marginals cross col marginals, observed
    cells left-joined) because zero-observed cells still contribute
    e > 0 to the statistic — dropping them understates dependence. Cell
    terms keep the exact integer numerator (n*o − rt*ct)^2 at
    DECIMAL(38,0) and spend ONE float division per cell, so both
    engines emit identical doubles. Marginals are two 1-D rollups
    broadcast onto the grid; the only data-sized pass is the initial
    cell groupBy. Returns one row per (row_val, col_val) grid cell:
    (row_val, col_val, observed, expected, chi2_term); the consumer
    sums chi2_term against a chi-square((R-1)(C-1)) tail.
    """
    r = F.col(row_col)
    c = F.col(col_col)
    cells = (
        df.select(r.alias("row_val"), c.alias("col_val"))
        .groupBy("row_val", "col_val")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # grid cut: the contingency cells are (rows x cols)-bounded and feed
    # the row/col/total rollups plus the expected-grid join — un-cut,
    # every chi2/cramers/g_test consumer re-derived the fact lineage per
    # rollup (r10 plan audit: 4 scans each)
    cells = materialize(cells, "chi2_cells_")
    row_tot = cells.groupBy("row_val").agg(
        F.sum("observed").cast("long").alias("__rt")
    )
    col_tot = cells.groupBy("col_val").agg(
        F.sum("observed").cast("long").alias("__ct")
    )
    total = cells.agg(F.sum("observed").cast("long").alias("__n"))
    grid = (
        row_tot.crossJoin(F.broadcast(col_tot))
        .crossJoin(F.broadcast(total))
        .join(F.broadcast(cells), ["row_val", "col_val"], "left")
        .withColumn("observed", F.coalesce(F.col("observed"), F.lit(0)))
    )
    expected = (
        F.col("__rt").cast("double") * F.col("__ct").cast("double")
    ) / F.col("__n").cast("double")
    num = (
        F.col("__n").cast("decimal(38,0)") * F.col("observed")
        - F.col("__rt").cast("decimal(38,0)") * F.col("__ct")
    )
    chi2 = (num * num).cast("double") / (
        F.col("__n").cast("double")
        * F.col("__rt").cast("double")
        * F.col("__ct").cast("double")
    )
    return grid.select(
        "row_val",
        "col_val",
        "observed",
        expected.alias("expected"),
        chi2.alias("chi2_term"),
    )


def concentration_stats(
    df: DataFrame,
    group_col: str,
    category_col: str,
) -> DataFrame:
    """Herfindahl-Hirschman concentration audit per group: how
    concentrated is each group's mass across categories? The corpus-
    health complement of entropy — HHI = sum(share_c^2) reads directly
    as "effective number of sources" via its reciprocal, the number a
    mixture designer actually wants (a lang whose corpus is 95% one
    crawl is a diversity bug no mean-based profile shows).

    All three statistics are single divides from exact integers: HHI =
    sum(n_c^2)/n^2 (DECIMAL(38,0) numerator), effective_categories =
    n^2/sum(n_c^2), top1_share = max(n_c)/n. Two nested rollups (the
    l_diversity two-phase shape), nothing data-sized past the first.
    Returns (group, n, n_categories, top1_share, hhi,
    effective_categories).
    """
    cells = (
        df.select(
            F.col(group_col).alias("__g"), F.col(category_col).alias("__c")
        )
        .groupBy("__g", "__c")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    per = cells.groupBy("__g").agg(
        F.sum("__n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.max("__n").cast("long").alias("__top1"),
        F.sum(F.col("__n").cast("decimal(38,0)") * F.col("__n")).alias(
            "__sq"
        ),
    )
    n_d = F.col("n").cast("double")
    sq_d = F.col("__sq").cast("double")
    return per.select(
        F.col("__g").alias(group_col),
        "n",
        "n_categories",
        (F.col("__top1").cast("double") / n_d).alias("top1_share"),
        (sq_d / (n_d * n_d)).alias("hhi"),
        ((n_d * n_d) / sq_d).alias("effective_categories"),
    )


def weighted_median_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact weighted median per group — the lower weighted median
    (smallest value whose cumulative weight reaches half the total),
    computed entirely in integers: per-(group, value) weight rollup,
    in-group cumulative window over the VALUE rollup (bounded by
    distinct values, not rows), and the threshold test
    2*cum >= total avoids the divide-by-two entirely. The weighted
    sibling of the exact-percentile family (conformal/equifreq order
    statistics). Returns (group, total_weight, weighted_median).
    """
    from pyspark.sql import Window

    g = F.col(group_col)
    v = F.col(value_col).cast("long")
    w = F.col(weight_col).cast("long")
    cells = (
        df.select(g.alias("__g"), v.alias("__v"), w.alias("__w"))
        .groupBy("__g", "__v")
        .agg(F.sum("__w").cast("long").alias("__wn"))
    )
    win = Window.partitionBy("__g").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.withColumn("__cum", F.sum("__wn").over(win).cast("long"))
    totals = cells.groupBy("__g").agg(
        F.sum("__wn").cast("long").alias("total_weight")
    )
    hit = (
        cum.join(F.broadcast(totals), "__g")
        .filter(F.lit(2) * F.col("__cum") >= F.col("total_weight"))
        .groupBy("__g", "total_weight")
        .agg(F.min("__v").alias("weighted_median"))
    )
    return hit.select(
        F.col("__g").alias(group_col), "total_weight", "weighted_median"
    )


def validate_constraints(
    df: DataFrame,
    rules: list[dict],
) -> DataFrame:
    """Declarative data-contract validation in ONE pass: each rule is a
    dict with ``column`` and one of ``not_null: True`` / ``min: x`` /
    ``max: x`` / ``max_distinct: k``, and the report gives per-rule
    violation counts — the CI gate a pipeline runs before publishing a
    table (the executable form of the reference's implicit schema
    contracts; dataset_card_stats describes, this one JUDGES).

    All scalar rules compile to conditional sums in a single
    aggregation (one job, map-side combined); ``max_distinct`` rules
    each add one approx-free two-level distinct rollup. Returns one row
    per rule, in declaration order:
    (rule_idx, column, rule, threshold, n_checked, n_violations, ok).
    """
    aggs = []
    metas = []
    distinct_rules = []
    n_total = F.count(F.lit(1)).cast("long")
    for idx, r in enumerate(rules):
        col = r["column"]
        if r.get("not_null"):
            metas.append((idx, col, "not_null", None))
            aggs.append(
                # coalesce(0): zero rows -> zero violations, not NULL
                # (a NULL would surface as a NULL BOOLEAN verdict;
                # r9 fuzz sweep, "empty" seed)
                F.coalesce(
                    F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__viol{idx}")
            )
        elif "min" in r:
            metas.append((idx, col, "min", float(r["min"])))
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(F.col(col) < F.lit(r["min"]), 1).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__viol{idx}")
            )
        elif "max" in r:
            metas.append((idx, col, "max", float(r["max"])))
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(F.col(col) > F.lit(r["max"]), 1).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__viol{idx}")
            )
        elif "max_distinct" in r:
            metas.append((idx, col, "max_distinct", float(r["max_distinct"])))
            distinct_rules.append((idx, col, int(r["max_distinct"])))
            aggs.append(F.lit(0).cast("long").alias(f"__viol{idx}"))
        else:  # pragma: no cover - caller contract
            raise ValueError(f"unknown rule: {r}")
    scalars = df.agg(n_total.alias("__n"), *aggs)
    spark = df.sparkSession
    rows = scalars.crossJoin(
        F.broadcast(
            spark.createDataFrame(
                [(i, c, k, t) for i, c, k, t in metas],
                "rule_idx long, column string, rule string, threshold double",
            )
        )
    )
    viol = F.lit(None).cast("long")
    for idx, _, _, _ in metas:
        viol = F.when(F.col("rule_idx") == idx, F.col(f"__viol{idx}")).otherwise(viol)
    out = rows.select(
        "rule_idx",
        "column",
        "rule",
        "threshold",
        F.col("__n").alias("n_checked"),
        viol.alias("n_violations"),
    )
    # distinct-cardinality rules: exact count-distinct per rule column,
    # violation = excess distinct values over the threshold
    for idx, col, k in distinct_rules:
        d = df.agg(
            F.countDistinct(F.col(col)).cast("long").alias("__d")
        ).select(
            F.greatest(F.col("__d") - F.lit(k), F.lit(0))
            .cast("long")
            .alias("__excess")
        )
        out = out.crossJoin(F.broadcast(d)).withColumn(
            "n_violations",
            F.when(F.col("rule_idx") == idx, F.col("__excess")).otherwise(
                F.col("n_violations")
            ),
        ).drop("__excess")
    return out.withColumn("ok", F.col("n_violations") == 0)


def overdispersion_by_group(
    df: DataFrame,
    group_col: str,
    count_col: str,
) -> DataFrame:
    """Count-model overdispersion diagnostics per group — is the count
    column Poisson-like (dispersion ~ 1) or clumped (negative-binomial
    territory)? The modeling-assumption gate before anyone fits a rate
    model on per-user event counts.

    Exact moments: n, S = sum x, Q = sum x^2 as integers/DECIMAL; the
    unbiased sample variance's numerator n*Q − S^2 is exact, and the
    three reported statistics — mean, dispersion index var/mean, and
    the method-of-moments NB alpha = (var − mean)/mean^2 — are fixed
    float trees. Returns (group, n, mean, variance, dispersion_index,
    nb_alpha); NULLs where undefined (n < 2 or mean == 0).
    """
    g = F.col(group_col)
    x = F.col(count_col).cast("long")
    per = df.select(g.alias("__g"), x.alias("__x")).groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").cast("long").alias("__s"),
        F.sum(F.col("__x").cast("decimal(38,0)") * F.col("__x")).alias(
            "__q"
        ),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("__s").cast("double") / n_d
    var_num = (
        F.col("n").cast("decimal(38,0)") * F.col("__q")
        - F.col("__s").cast("decimal(38,0)") * F.col("__s")
    ).cast("double")
    variance = F.when(
        F.col("n") > 1, var_num / (n_d * (n_d - F.lit(1.0)))
    )
    disp = F.when((F.col("n") > 1) & (F.col("__s") > 0), variance / mean)
    alpha = F.when(
        (F.col("n") > 1) & (F.col("__s") > 0),
        (variance - mean) / (mean * mean),
    )
    return per.select(
        F.col("__g").alias(group_col),
        "n",
        mean.alias("mean"),
        variance.alias("variance"),
        disp.alias("dispersion_index"),
        alpha.alias("nb_alpha"),
    )


def file_row_audit(df: DataFrame) -> DataFrame:
    """Per-FILE row counts of whatever a DataFrame scans — the
    small-file / skewed-file detector behind `maintenance.compact_
    small_files`' decisions, via Spark's ``input_file_name`` (one
    metadata column, no extra scan). At 100 TB this is the first
    question about any slow table: is the row mass spread over files
    evenly enough for the scheduler to parallelize? Returns one row per
    file basename: (file_name, n_rows).
    """
    return (
        df.withColumn(
            "file_name",
            F.element_at(F.split(F.input_file_name(), "/"), -1),
        )
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


def _auto_rank_bucket_width(
    df: DataFrame, col: str, target_buckets: int = 256,
    per_value_max_distinct: int = 1024,
) -> int:
    """Pick the range-bucket width for an exact-rank dimension from the
    column's observed shape (r7 verdict task 3). One metadata-scale agg
    (EXACT distinct + min/max — decision only, both strategies are
    exact; exact count_distinct keeps the cutover deterministic near the
    per_value_max_distinct boundary where an HLL estimate could flip the
    plan shape run-to-run, r8 advice fix) selects between:

    - **per-value cumulation** (width 1: bucket == value, the
      ``equifreq_edges`` idiom) when the dimension is low-cardinality —
      rank parallelism then equals the number of DISTINCT VALUES, not
      the arbitrary domain/width quotient that capped the wave-80 grid
      at ~13 tasks on the 50-value quantity column;
    - a domain-scaled width giving ~``target_buckets`` buckets when the
      dimension is high-cardinality, so a wide domain (price in cents,
      ~1e7) doesn't degenerate to a handful of mega-buckets.
    """
    row = df.agg(
        F.count_distinct(F.col(col)).alias("d"),
        F.min(col).cast("long").alias("lo"),
        F.max(col).cast("long").alias("hi"),
    ).collect()[0]
    if row["d"] is None or row["lo"] is None:
        return 1
    if row["d"] <= per_value_max_distinct:
        return 1
    return max(1, (int(row["hi"]) - int(row["lo"]) + 1) // target_buckets)


def rank_quintile_dependence(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    n_tiles: int = 5,
    x_bucket_width: int | None = None,
    y_bucket_width: int | None = None,
) -> DataFrame:
    """Empirical-copula dependence grid: quintile BOTH columns by exact
    rank, and report each (x_tile, y_tile) cell's observed count
    against the independence expectation — the distribution-free
    dependence HEATMAP behind the scalar rank correlations (Spearman
    says 0.4; this shows WHERE the dependence lives — tails, middle,
    one corner).

    Exact machinery throughout: per-dimension global ranks via the
    range-bucket + broadcast-offset idiom under the unique (value, id)
    order; closed-form tiles; the grid COMPLETED from the two marginal
    tile rollups (zero-observed cells still report, the
    contingency_chi2 argument); expected = n_x*n_y/n and the
    observed/expected ratio are one float tree per cell. Returns
    (x_tile, y_tile, observed, expected, ratio).
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import _range_rank

    staged = df.select(
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
        F.col(id_col).alias("__id"),
    )
    # Per-dimension widths, auto-selected by default: a width larger
    # than the column's domain collapses every row into ONE range
    # bucket (measured: 63x task skew on the 50-value quantity column
    # at a fixed 1000), and even a hand-tuned domain/width quotient
    # caps rank parallelism at ~quotient tasks. Low-cardinality
    # dimensions switch to per-value cumulation (width 1) so the rank
    # stage parallelises over every distinct value.
    #
    # BOTH width probes and the row count come from ONE metadata agg
    # over the staged frame (r11 optimization, guide §2.4): the
    # previous shape ran two _auto_rank_bucket_width aggs PLUS a
    # count agg whose crossJoin(broadcast) subtree re-executed the
    # entire two-rank lineage — 3 of this query's 6 base-table scans
    # (r10 scan audit). The decisions and the literal n are
    # value-identical, so every downstream row is unchanged.
    n_total: int | None = None
    if x_bucket_width is None or y_bucket_width is None:
        probe = staged.agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.count_distinct(F.col("__x")).alias("__dx"),
            F.min("__x").cast("long").alias("__lox"),
            F.max("__x").cast("long").alias("__hix"),
            F.count_distinct(F.col("__y")).alias("__dy"),
            F.min("__y").cast("long").alias("__loy"),
            F.max("__y").cast("long").alias("__hiy"),
        ).collect()[0]
        n_total = int(probe["__n"])

        def _width(d, lo, hi) -> int:
            # mirrors _auto_rank_bucket_width token for token
            if d is None or lo is None:
                return 1
            if d <= 1024:
                return 1
            return max(1, (int(hi) - int(lo) + 1) // 256)

        if x_bucket_width is None:
            x_bucket_width = _width(
                probe["__dx"], probe["__lox"], probe["__hix"]
            )
        if y_bucket_width is None:
            y_bucket_width = _width(
                probe["__dy"], probe["__loy"], probe["__hiy"]
            )
    ranked = _range_rank(staged, "__x", "__id", x_bucket_width, "__rx")
    ranked = _range_rank(ranked, "__y", "__id", y_bucket_width, "__ry")
    if n_total is not None:
        tiled = ranked.withColumn("__n", F.lit(n_total).cast("long"))
    else:
        n_row = ranked.agg(F.count(F.lit(1)).cast("long").alias("__n"))
        tiled = ranked.crossJoin(F.broadcast(n_row))

    def tile(rank_col):
        return (
            (
                F.lit(n_tiles) * (F.col(rank_col) - 1)
                - (F.lit(n_tiles) * (F.col(rank_col) - 1)) % F.col("__n")
            )
            / F.col("__n")
        ).cast("long")

    tiled = tiled.select(
        tile("__rx").alias("x_tile"), tile("__ry").alias("y_tile")
    )
    cells = tiled.groupBy("x_tile", "y_tile").agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    mx = cells.groupBy("x_tile").agg(F.sum("observed").cast("long").alias("__nx"))
    my = cells.groupBy("y_tile").agg(F.sum("observed").cast("long").alias("__ny"))
    total = cells.agg(F.sum("observed").cast("long").alias("__nn"))
    grid = (
        mx.crossJoin(F.broadcast(my))
        .crossJoin(F.broadcast(total))
        .join(F.broadcast(cells), ["x_tile", "y_tile"], "left")
        .withColumn("observed", F.coalesce(F.col("observed"), F.lit(0)))
    )
    expected = (
        F.col("__nx").cast("double") * F.col("__ny").cast("double")
    ) / F.col("__nn").cast("double")
    return grid.select(
        "x_tile",
        "y_tile",
        "observed",
        expected.alias("expected"),
        (F.col("observed").cast("double") / expected).alias("ratio"),
    )


def fk_orphan_audit(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit across declared FK edges: for each
    (name, child_df, fk_col, parent_df, pk_col), count child rows whose
    FK has no parent (orphans) and parents with no children (childless)
    — the two numbers every warehouse DQ gate checks before a join-heavy
    mart build trusts its FKs.

    Shape per edge: one left-anti join each way, keyed on the FK — at
    100 TB the child-side anti-join is the same shuffle the downstream
    equi-join would pay (broadcast when the parent is dim-sized, which
    Catalyst decides from stats), and counts are map-side-combined.
    NULL FKs are counted separately (a NULL is "unknown", not an
    orphan). Returns one row per edge: (edge, n_child, n_null_fk,
    n_orphans, n_parents, n_childless).
    """
    outs = []
    for name, child, fk, parent, pk in edges:
        c = child.select(F.col(fk).alias("__fk"))
        p = parent.select(F.col(pk).alias("__pk"))
        nn = c.filter(F.col("__fk").isNull())
        orphans = (
            c.filter(F.col("__fk").isNotNull())
            .join(p.withColumnRenamed("__pk", "__fk"), "__fk", "left_anti")
        )
        childless = p.join(
            c.filter(F.col("__fk").isNotNull()).withColumnRenamed("__fk", "__pk"),
            "__pk",
            "left_anti",
        )
        row = (
            c.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
            .crossJoin(
                F.broadcast(
                    nn.agg(F.count(F.lit(1)).cast("long").alias("n_null_fk"))
                )
            )
            .crossJoin(
                F.broadcast(
                    orphans.agg(
                        F.count(F.lit(1)).cast("long").alias("n_orphans")
                    )
                )
            )
            .crossJoin(
                F.broadcast(
                    p.agg(F.count(F.lit(1)).cast("long").alias("n_parents"))
                )
            )
            .crossJoin(
                F.broadcast(
                    childless.agg(
                        F.count(F.lit(1)).cast("long").alias("n_childless")
                    )
                )
            )
            .select(
                F.lit(name).alias("edge"),
                "n_child",
                "n_null_fk",
                "n_orphans",
                "n_parents",
                "n_childless",
            )
        )
        outs.append(row)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def pk_uniqueness_audit(
    tables: list[tuple[str, DataFrame, list[str]]],
) -> DataFrame:
    """Primary-key uniqueness audit: per (name, df, key_cols), the row
    count, distinct-key count, number of keys appearing more than once,
    and the worst key's multiplicity — the other half of the DQ gate
    (:func:`fk_orphan_audit` trusts parents are unique; this verifies
    it). One groupBy per table (map-side combined), rollup-sized
    aggregation after. NULL key components participate as ordinary
    grouping values (two NULL-keyed rows ARE a duplicate — surrogate
    keys must not be NULL, and the n_null_keys column exposes them).
    Returns (table_name, n_rows, n_keys, n_dup_keys, max_multiplicity,
    n_null_keys).
    """
    outs = []
    for name, df, keys in tables:
        per = df.groupBy(*[F.col(k) for k in keys]).agg(
            F.count(F.lit(1)).cast("long").alias("__m")
        )
        null_any = None
        for k in keys:
            cond = F.col(k).isNull()
            null_any = cond if null_any is None else (null_any | cond)
        row = per.agg(
            F.sum("__m").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.when(F.col("__m") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_keys"),
            F.max("__m").cast("long").alias("max_multiplicity"),
            F.sum(F.when(null_any, F.col("__m")).otherwise(0))
            .cast("long")
            .alias("n_null_keys"),
        ).select(F.lit(name).alias("table_name"), "*")
        outs.append(row)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def cramers_v(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Cramér's V effect size for an RxC contingency table — the
    [0, 1]-normalized companion to :func:`contingency_chi2` that makes
    dependence strengths comparable across tables of different shapes
    (raw chi-square grows with n; V does not). Returns exactly ONE row:
    (n, n_rows, n_cols, chi2, cramers_v) with
    V = sqrt(chi2 / (n * min(R-1, C-1))).

    Exactness: the per-cell terms are the driver-verified
    contingency_chi2 doubles (exact DECIMAL(38,0) numerators, one float
    divide each); summing raw doubles would be ORDER-DEPENDENT across
    engines, so each term is quantized to integer micros and the
    statistic accumulates in int64 (the established micros rollup
    convention). Degenerate tables (single row or column category:
    min(R-1, C-1) = 0) keep the one-row contract with NULL V.
    """
    cells = contingency_chi2(df, row_col, col_col)
    agg = cells.agg(
        F.coalesce(F.sum("observed"), F.lit(0)).cast("long").alias("n"),
        F.count_distinct(F.col("row_val")).cast("long").alias("n_rows"),
        F.count_distinct(F.col("col_val")).cast("long").alias("n_cols"),
        F.sum(
            F.round(F.col("chi2_term") * F.lit(1000000.0), 0).cast("long")
        )
        .cast("long")
        .alias("__chi2m"),
    )
    dfree = F.least(F.col("n_rows") - F.lit(1), F.col("n_cols") - F.lit(1))
    chi2 = F.col("__chi2m").cast("double") / F.lit(1000000.0)
    return agg.select(
        "n",
        "n_rows",
        "n_cols",
        chi2.alias("chi2"),
        F.when(
            (F.col("n") > 0) & (dfree > 0),
            F.sqrt(
                F.col("__chi2m").cast("double")
                / F.lit(1000000.0)
                / (F.col("n").cast("double") * dfree.cast("double"))
            ),
        ).alias("cramers_v"),
    )


def g_test(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """G-test (likelihood-ratio) of independence for an RxC contingency
    table — the information-theoretic complement to
    :func:`contingency_chi2`: G = 2*sum(o*ln(o/e)) is additive under
    table partitions and better behaved than Pearson when expected
    counts are small. Returns exactly ONE row:
    (n, n_rows, n_cols, df, g_stat).

    Exactness: cells ride the driver-verified contingency_chi2 grid
    (exact integer marginals, one float divide for e); each cell's
    2*o*(ln(o) - ln(e)) is ONE fixed IEEE tree quantized to integer
    micros and summed in int64 (zero-observed cells contribute exactly
    0, the o*ln(o) -> 0 limit). Degenerate tables (single row or column
    category: df = 0) keep the one-row contract with NULL g_stat.
    """
    cells = contingency_chi2(df, row_col, col_col)
    term = F.when(
        F.col("observed") > 0,
        F.round(
            F.lit(2.0)
            * F.col("observed").cast("double")
            * (
                F.log(F.col("observed").cast("double"))
                - F.log(F.col("expected"))
            )
            * F.lit(1000000.0),
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    agg = cells.agg(
        F.coalesce(F.sum("observed"), F.lit(0)).cast("long").alias("n"),
        F.count_distinct(F.col("row_val")).cast("long").alias("n_rows"),
        F.count_distinct(F.col("col_val")).cast("long").alias("n_cols"),
        F.sum(term).cast("long").alias("__gm"),
    )
    dfree = (F.col("n_rows") - F.lit(1)) * (F.col("n_cols") - F.lit(1))
    return agg.select(
        "n",
        "n_rows",
        "n_cols",
        F.coalesce(dfree, F.lit(0)).cast("long").alias("df"),
        F.when(
            (F.col("n") > 0) & (dfree > 0),
            F.col("__gm").cast("double") / F.lit(1000000.0),
        ).alias("g_stat"),
    )
