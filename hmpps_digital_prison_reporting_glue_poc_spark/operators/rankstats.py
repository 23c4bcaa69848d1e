"""Rank-statistic completions over the exact cent grid (round 11,
wave 113) — the ordered-alternative and scale-shift complements of the
repo's location tests (Mann-Whitney/Kruskal via midranks, wave 94+) and
ECDF drift functionals (``operators/drift.py``):

- ``mood_scale_two_sample``: Mood's squared-rank SCALE test. Kruskal/
  Wilcoxon ask "did the center move"; Mood asks "did the SPREAD move" —
  the rank-based complement of Brown-Forsythe (which works on |x - med|
  deviations). T = sum over left-side observations of
  (r_i - (N+1)/2)^2 with pooled midranks; under H0 the left sample's
  squared rank deviations should look like a random n1-subset of the
  pooled ones, so E[T] = n1/N * S with S the pooled sum (the tie-exact
  form). EXACT: doubled midranks m = 2P - p + 1 are integers, so
  4*T = sum c1*(m - N - 1)^2 sums in DECIMAL(38,0); the only float ops
  are the two final divides.

- ``jonckheere_terpstra``: the ordered-alternative trend test across K
  ordered groups (dose-response: "does the value distribution shift
  monotonically as the group level rises"). JT = sum over ordered group
  pairs i<j of U_ij (Mann-Whitney counts with the standard 1/2 tie
  credit). The O(n^2) pair count collapses onto the (group x pooled
  grid) DENSE cumulative table: 2*U_ij = sum_v c_j(v) * (2*F_i(v) -
  c_i(v)) — every pair counted exactly once, ties doubled to stay
  integer — so the whole statistic is one grid pass plus a grid-sized
  K^2-fan self-join, never a data-sized join (the kendall_tau_groups
  anti-quadratic move). EXACT in DECIMAL(38,0); JT = sum / 2.

No counterpart exists in the reference (a 1.4k-LoC Glue CDC pipeline,
``/root/reference/src``, has no statistics code); built per the
round-11 brief's "text/data analysis at scale" mandate.

Scale shape: all state is value-domain-bounded (distinct quantized
cents x groups), never corpus-sized; windows are (group, 1024-point
bucket)-bounded by construction; totals broadcast back as one-row (or
K-row) frames. The count rollups are materialized (lineage cut) because
they feed 3+ consumers whose differing column pruning defeats
ReusedExchange — the r10 plan-audit discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.drift import (
    _ecdf_counts,
    _grid_from_counts,
)


def mood_scale_two_sample(
    df: DataFrame, side, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Mood's squared-rank scale test between the value distributions
    of two row populations (``side`` false = left, true = right).

    Returns ONE row: (n_left, n_right, mood_t, expected_t) —
    mood_t = sum over LEFT observations of (r_i - (N+1)/2)^2 with
    pooled midranks, expected_t = n1/N * pooled sum (tie-exact H0
    mean). Both NULL when either side is empty (the r9 fuzz-guard
    convention). A mood_t far above expected_t means the left sample
    concentrates in the rank EXTREMES (wider spread); far below means
    it concentrates near the pooled median (narrower)."""
    return mood_from_counts(
        _ecdf_counts(df, side, value_col, scale, "ecdf_counts_mood_")
    )


def mood_from_counts(counts: DataFrame) -> DataFrame:
    """Mood's scale test over a pre-aggregated (__qv, c1, c2) count
    table — shared by the batch operator and the ks_stream state read
    (streaming twin), like the drift family's *_from_counts."""
    grid, tot = _grid_from_counts(counts)
    joined = grid.crossJoin(F.broadcast(tot))
    n_tot = F.col("n1") + F.col("n2")
    # doubled midrank m = 2P - p + 1 (P pooled cumulative, p pooled
    # count at the grid point) -> m - (N+1) = 2P - p - N, an integer
    dev = (
        F.lit(2) * (F.col("f1") + F.col("f2"))
        - (F.col("c1") + F.col("c2"))
        - n_tot
    ).cast("decimal(19,0)")
    t4_term = F.col("c1").cast("decimal(19,0)") * dev * dev
    s4_term = (F.col("c1") + F.col("c2")).cast("decimal(19,0)") * dev * dev
    agg = joined.agg(
        F.sum(t4_term).alias("__t4"),
        F.sum(s4_term).alias("__s4"),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    nn = (F.col("n_left") + F.col("n_right")).cast("double")
    return agg.select(
        "n_left",
        "n_right",
        F.when(valid, F.col("__t4").cast("double") / F.lit(4.0)).alias(
            "mood_t"
        ),
        F.when(
            valid,
            (F.col("n_left").cast("decimal(19,0)") * F.col("__s4"))
            .cast("double")
            / (F.lit(4.0) * nn),
        ).alias("expected_t"),
    )


def jonckheere_terpstra(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend statistic across
    the natural ordering of ``group_col`` values.

    Caller contract: ``group_col`` is a LOW-CARDINALITY ordinal (the
    kendall_tau_groups contract) whose natural sort order IS the tested
    ordering; NULL groups are dropped (no defined order position), NULL
    values are dropped (no distribution information — the r9 fuzz
    convention).

    Returns ONE row: (n_total, n_groups, jt_u, expected_jt) — jt_u the
    tie-credited Mann-Whitney sum over ordered group pairs, expected_jt
    its exact H0 mean (N^2 - sum n_g^2) / 4. jt_u >> expected_jt means
    values RISE with the group ordering; << means they fall; both NULL
    when fewer than 2 groups survive the filters."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    q = df.select(
        g.alias("__g"),
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv"),
    ).filter(F.col("__qv").isNotNull() & F.col("__g").isNotNull())
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize,
    )

    # (group x grid)-bounded rollup feeding 4 consumers (the pooled
    # grid, the dense frame, group totals, the pair join) — cut once
    counts = materialize(
        q.groupBy("__g", "__qv").agg(
            F.count(F.lit(1)).cast("long").alias("__c")
        ),
        "jt_counts_",
    )
    # K-wide grid pivot instead of a dense K x grid completion (r11
    # optimization, guide §2.3/§2.4): the previous shape cross-joined
    # the K groups against the pooled grid, re-joined the counts, ran
    # per-(group, bucket) cumulatives, and self-joined the cumulative
    # table on the grid point with a K^2 fan — 2 extra grid-sized
    # exchanges and a grid-sized join. With the K group values in hand
    # (a K-row collect off the stored rollup — the caller contract says
    # K is bounded, and the kendall/markov family already pulls such
    # grids through the driver), the SAME statistic is one row per grid
    # point with K conditional-count columns: per-group cumulatives
    # become K column expressions over ONE bucketed window pass, and
    # the ordered-pair sum Σ_{i<j} c_j·(2·F_i − c_i) is a single
    # column expression — every term integer-identical to the pair-join
    # form (zero-count terms contribute 0 exactly as the dense rows
    # did).
    schema = (
        "n_total long, n_groups long, jt_u double, expected_jt double"
    )
    spark = df.sparkSession
    grp_rows = counts.select("__g").distinct().collect()
    groups = sorted(r["__g"] for r in grp_rows)
    if not groups:
        return spark.createDataFrame([(None, 0, None, None)], schema)
    cg = [
        F.sum(
            F.when(F.col("__g") == F.lit(g), F.col("__c")).otherwise(0)
        )
        .cast("long")
        .alias(f"__c{i}")
        for i, g in enumerate(groups)
    ]
    piv = counts.groupBy("__qv").agg(*cg)
    # two-level bucketed cumulative (the drift-family skew discipline:
    # in-bucket windows 1024-point-bounded; the bucket-offset window
    # runs over the ~grid/1024-row bucket rollup)
    keyed = piv.withColumn(
        "__bk", F.floor(F.col("__qv") / F.lit(1024)).cast("long")
    )
    bsums = keyed.groupBy("__bk").agg(
        *[F.sum(f"__c{i}").alias(f"__b{i}") for i in range(len(groups))]
    )
    w_boff = Window.orderBy("__bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    boffs = bsums.select(
        "__bk",
        *[
            F.coalesce(F.sum(f"__b{i}").over(w_boff), F.lit(0)).alias(
                f"__o{i}"
            )
            for i in range(len(groups))
        ],
    )
    w_in = (
        Window.partitionBy("__bk")
        .orderBy("__qv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = keyed.join(F.broadcast(boffs), "__bk").select(
        "__qv",
        *[F.col(f"__c{i}") for i in range(len(groups))],
        *[
            (F.sum(f"__c{i}").over(w_in) + F.col(f"__o{i}"))
            .cast("long")
            .alias(f"__f{i}")
            for i in range(len(groups))
        ],
    )
    # ordered group pairs i<j at each grid point: 2*U_ij =
    # sum_v c_j(v) * (2*F_i(v) - c_i(v)) — strictly-less pairs twice,
    # tied pairs once (the standard 1/2 tie credit, doubled)
    jt_term = None
    for j in range(len(groups)):
        for i in range(j):
            term = F.col(f"__c{j}").cast("decimal(38,0)") * (
                F.lit(2) * F.col(f"__f{i}") - F.col(f"__c{i}")
            ).cast("decimal(38,0)")
            jt_term = term if jt_term is None else jt_term + term
    if jt_term is None:
        jt_term = F.lit(0).cast("decimal(38,0)")
    agg = cum.agg(
        F.coalesce(
            F.sum(jt_term), F.lit(0).cast("decimal(38,0)")
        ).alias("__jt2"),
        *[
            F.sum(f"__c{i}").cast("long").alias(f"__n{i}")
            for i in range(len(groups))
        ],
    )
    n_total = None
    ssq = None
    for i in range(len(groups)):
        ni = F.col(f"__n{i}")
        n_total = ni if n_total is None else n_total + ni
        sq = ni.cast("decimal(19,0)") * ni.cast("decimal(19,0)")
        ssq = sq if ssq is None else ssq + sq
    out = agg.select(
        n_total.cast("long").alias("n_total"),
        F.lit(len(groups)).cast("long").alias("n_groups"),
        "__jt2",
        ssq.alias("__ssq"),
    )
    valid = F.col("n_groups") >= 2
    nsq = (
        F.col("n_total").cast("decimal(19,0)")
        * F.col("n_total").cast("decimal(19,0)")
    )
    return out.select(
        "n_total",
        "n_groups",
        F.when(valid, F.col("__jt2").cast("double") / F.lit(2.0)).alias(
            "jt_u"
        ),
        F.when(
            valid, (nsq - F.col("__ssq")).cast("double") / F.lit(4.0)
        ).alias("expected_jt"),
    )


def gamma_somers_groups(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Goodman-Kruskal gamma and both Somers' D asymmetric
    rank associations between two bounded-cardinality ordinals — the
    tie-policy-differentiated family members of Kendall tau-b (same
    concordant/discordant core, different tie denominators):

    - gamma = (C - D) / (C + D): ignores ALL ties — the association
      among pairs that actually ordered themselves.
    - somers_d_yx = (C - D) / (n_pairs - x_tie_pairs): penalizes ties
      on the DEPENDENT y only — "how well does x predict y's order".
    - somers_d_xy: the transpose.

    One kendall_tau_groups pass (operators/evaluation.py) supplies the
    exact DECIMAL C/D/tie table; the three statistics are single final
    float expressions over it — no extra scan, no extra shuffle.
    NULL where the respective denominator is 0."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
        kendall_tau_groups,
    )

    k = kendall_tau_groups(df, group_col, x_col, y_col)
    c, d = F.col("concordant"), F.col("discordant")
    cd = (c - d).cast("double")
    den_g = (c + d).cast("double")
    den_yx = (F.col("n_pairs") - F.col("x_tie_pairs")).cast("double")
    den_xy = (F.col("n_pairs") - F.col("y_tie_pairs")).cast("double")
    return k.select(
        F.col(group_col),
        "n",
        "concordant",
        "discordant",
        F.when(den_g > 0, cd / den_g).alias("gamma"),
        F.when(den_yx > 0, cd / den_yx).alias("somers_d_yx"),
        F.when(den_xy > 0, cd / den_xy).alias("somers_d_xy"),
    )


def cliffs_delta_two_sample(
    df: DataFrame, side, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Cliff's delta ordinal EFFECT SIZE between the two value
    populations — the "how big is the shift" companion every
    significance test here (KS/Mood/Mann-Whitney) needs: delta =
    (#{x_left > x_right} - #{x_left < x_right}) / (n1*n2), in [-1, 1],
    0 when the distributions overlap symmetrically, +/-1 on complete
    separation. Unlike a mean difference it is outlier-immune and
    unit-free, the standard report beside a rank test.

    The O(n^2) pair counts collapse onto the shared cent grid:
    #{x1 > x2} = sum_v c1(v) * (F2(v) - c2(v)) and
    #{x1 < x2} = sum_v c1(v) * (n2 - F2(v)) — both EXACT in
    DECIMAL(38,0); delta is ONE final divide. Also returns the
    rank-biserial r (identical value by the Kerby identity — kept as
    the doubled-check column pair_gt/pair_lt instead of duplicating).
    One row: (n_left, n_right, pair_gt, pair_lt, cliffs_delta) —
    NULLs when either side is empty."""
    return cliffs_from_counts(
        _ecdf_counts(df, side, value_col, scale, "ecdf_counts_cliffs_")
    )


def cliffs_from_counts(counts: DataFrame) -> DataFrame:
    """Cliff's delta over a pre-aggregated (__qv, c1, c2) count table —
    shared by the batch operator and the ks_stream state read."""
    grid, tot = _grid_from_counts(counts)
    joined = grid.crossJoin(F.broadcast(tot))
    gt = F.col("c1").cast("decimal(19,0)") * (
        F.col("f2") - F.col("c2")
    ).cast("decimal(19,0)")
    lt = F.col("c1").cast("decimal(19,0)") * (
        F.col("n2") - F.col("f2")
    ).cast("decimal(19,0)")
    agg = joined.agg(
        F.sum(gt).alias("__gt"),
        F.sum(lt).alias("__lt"),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    nn = (
        F.col("n_left").cast("decimal(19,0)")
        * F.col("n_right").cast("decimal(19,0)")
    ).cast("double")
    return agg.select(
        "n_left",
        "n_right",
        F.col("__gt").cast("long").alias("pair_gt"),
        F.col("__lt").cast("long").alias("pair_lt"),
        F.when(
            valid,
            (F.col("__gt") - F.col("__lt")).cast("double") / nn,
        ).alias("cliffs_delta"),
    )


def cucconi_two_sample(
    df: DataFrame, side, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Cucconi's joint LOCATION-SCALE two-sample test — one statistic
    that reacts to a center shift AND a spread change together (the
    classical alternative to running Wilcoxon + Mood side by side,
    strictly older than and often more powerful than Lepage):

        U = (6*sum R_i^2    - n2(N+1)(2N+1)) / sd
        V = (6*sum (N+1-R)^2 - n2(N+1)(2N+1)) / sd
        sd = sqrt(n1 n2 (N+1)(2N+1)(8N+11)/5)
        rho = 2(N^2-4)/((2N+1)(8N+11)) - 1
        C = (U^2 + V^2 - 2 rho U V) / (2 (1 - rho^2))

    with R the pooled midranks of the RIGHT sample. Exactness: doubled
    midranks m = 2P - p + 1 are integers, so 4*sum R^2 = sum c2*m^2
    and 4*sum (N+1-R)^2 = sum c2*(2(N+1)-m)^2 sum exactly in
    DECIMAL(38,0); the fixed scalar IEEE tail (a dozen ops from exact
    integers) is mirrored token-for-token in the DuckDB twin, the
    mmd2_quadratic convention — no float enters before it, so no
    rounding is needed.

    One row: (n_left, n_right, u_stat, v_stat, cucconi_c) — NULLs when
    either side is empty or N < 3 (rho's denominator needs it)."""
    return cucconi_from_counts(
        _ecdf_counts(df, side, value_col, scale, "ecdf_counts_cucconi_")
    )


def cucconi_from_counts(counts: DataFrame) -> DataFrame:
    """Cucconi over a pre-aggregated (__qv, c1, c2) count table —
    shared by the batch operator and the ks_stream state read."""
    grid, tot = _grid_from_counts(counts)
    joined = grid.crossJoin(F.broadcast(tot))
    n_tot = (F.col("n1") + F.col("n2")).cast("decimal(19,0)")
    # doubled midrank of the grid point in the POOLED sample
    m = (
        F.lit(2) * (F.col("f1") + F.col("f2"))
        - (F.col("c1") + F.col("c2"))
        + F.lit(1)
    ).cast("decimal(19,0)")
    m_contra = F.lit(2).cast("decimal(19,0)") * (n_tot + 1) - m
    agg = joined.agg(
        F.sum(F.col("c2").cast("decimal(38,0)") * m * m).alias("__r2x4"),
        F.sum(
            F.col("c2").cast("decimal(38,0)") * m_contra * m_contra
        ).alias("__s2x4"),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    n1d = F.col("n_left").cast("double")
    n2d = F.col("n_right").cast("double")
    nd = n1d + n2d
    # fixed scalar tail — mirror token-for-token in the SQL twin
    sd = F.sqrt(
        n1d * n2d * (nd + 1.0) * (2.0 * nd + 1.0) * (8.0 * nd + 11.0)
        / 5.0
    )
    u = (
        6.0 * (F.col("__r2x4").cast("double") / 4.0)
        - n2d * (nd + 1.0) * (2.0 * nd + 1.0)
    ) / sd
    v = (
        6.0 * (F.col("__s2x4").cast("double") / 4.0)
        - n2d * (nd + 1.0) * (2.0 * nd + 1.0)
    ) / sd
    rho = 2.0 * (nd * nd - 4.0) / ((2.0 * nd + 1.0) * (8.0 * nd + 11.0)) - 1.0
    c = (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho))
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0) & (
        (F.col("n_left") + F.col("n_right")) >= 3
    )
    return agg.select(
        "n_left",
        "n_right",
        F.when(valid, u).alias("u_stat"),
        F.when(valid, v).alias("v_stat"),
        F.when(valid, c).alias("cucconi_c"),
    )


def ansari_bradley_two_sample(
    df: DataFrame, side, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Ansari-Bradley scale test between the value distributions of two
    row populations (wave 121) — the center-in/center-out rank score
    complement of Mood's squared-rank test: scores a_i = min(r_i,
    N+1-r_i) are LARGEST in the pooled middle, so a left sample whose
    AB statistic falls below its H0 mean is WIDER than the right.

    Returns ONE row: (n_left, n_right, ab_stat, expected_ab) — ab_stat
    the left sample's score sum with midrank tie handling, expected_ab
    the tie-exact H0 mean n1 * S / N (S the pooled score sum). EXACT:
    doubled midranks m = 2P - p + 1 are integers, so the doubled score
    t = min(m, 2(N+1) - m) sums in DECIMAL(38,0); the only float ops
    are the two final divides. Both outputs NULL when either side is
    empty (the r9 fuzz-guard convention)."""
    return ansari_from_counts(
        _ecdf_counts(df, side, value_col, scale, "ecdf_counts_ansari_")
    )


def ansari_from_counts(counts: DataFrame) -> DataFrame:
    """Ansari-Bradley over a pre-aggregated (__qv, c1, c2) count table —
    shared by the batch operator and any ks_stream state read (the
    mood_from_counts streaming-twin pattern)."""
    grid, tot = _grid_from_counts(counts)
    joined = grid.crossJoin(F.broadcast(tot))
    n_tot = F.col("n1") + F.col("n2")
    # doubled midrank m = 2P - p + 1; doubled AB score
    # t = min(m, 2(N+1) - m) = 2 * min(midrank, N+1-midrank), an integer
    m = (
        F.lit(2) * (F.col("f1") + F.col("f2"))
        - (F.col("c1") + F.col("c2"))
        + F.lit(1)
    )
    t = F.least(m, F.lit(2) * (n_tot + F.lit(1)) - m).cast("decimal(19,0)")
    agg = joined.agg(
        F.sum(F.col("c1").cast("decimal(19,0)") * t).alias("__ab2"),
        F.sum((F.col("c1") + F.col("c2")).cast("decimal(19,0)") * t).alias(
            "__s2"
        ),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    nn = (F.col("n_left") + F.col("n_right")).cast("double")
    return agg.select(
        "n_left",
        "n_right",
        F.when(valid, F.col("__ab2").cast("double") / F.lit(2.0)).alias(
            "ab_stat"
        ),
        F.when(
            valid,
            (F.col("n_left").cast("decimal(19,0)") * F.col("__s2"))
            .cast("double")
            / (F.lit(2.0) * nn),
        ).alias("expected_ab"),
    )


def hodges_lehmann_shift(
    df: DataFrame, side, value_col: str, scale: int = 1
) -> DataFrame:
    """Hodges-Lehmann two-sample shift estimator: the exact type-1
    lower median of ALL n1*n2 pairwise differences (right - left) — the
    robust "how far did the distribution move" companion to the
    Wilcoxon/Mann-Whitney significance machinery (it estimates the
    shift those tests detect, immune to outliers where a mean
    difference is not).

    Caller contract: ``value_col`` quantizes to a LOW-CARDINALITY
    domain (the kendall_tau_groups contract) — the pairwise-difference
    support is grid x grid, value-domain-bounded, never the O(n^2) data
    pairs (weights c1*c2 carry the multiplicity exactly).

    Returns ONE row: (n_left, n_right, n_pairs, hl_shift) — hl_shift in
    quantized units (long), NULL when either side is empty."""
    counts = _ecdf_counts(df, side, value_col, scale, "ecdf_counts_hl_")
    a = counts.filter(F.col("c1") > 0).select(
        F.col("__qv").alias("__va"), "c1"
    )
    b = counts.filter(F.col("c2") > 0).select(
        F.col("__qv").alias("__vb"), "c2"
    )
    # grid x grid difference distribution with exact pair weights; the
    # right grid is value-domain-bounded (caller contract) so the fan
    # is a broadcast BNLJ, never a CartesianProduct over data
    dist = (
        a.crossJoin(F.broadcast(b))
        .groupBy((F.col("__vb") - F.col("__va")).alias("__d"))
        .agg(
            F.sum(
                F.col("c1").cast("decimal(19,0)")
                * F.col("c2").cast("decimal(19,0)")
            ).alias("__w")
        )
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize,
    )

    # the difference grid feeds the cumulative AND the totals — cut once
    dist = materialize(dist, "hl_diff_grid_")
    # two-level bucketed cumulative over the difference grid (the drift
    # family skew discipline: every window 1024-point-bounded)
    keyed = dist.withColumn(
        "__bk", F.floor(F.col("__d") / F.lit(1024)).cast("long")
    )
    bsums = keyed.groupBy("__bk").agg(F.sum("__w").alias("__b"))
    w_boff = Window.orderBy("__bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    boffs = bsums.select(
        "__bk",
        F.coalesce(
            F.sum("__b").over(w_boff), F.lit(0).cast("decimal(38,0)")
        ).alias("__o"),
    )
    w_in = (
        Window.partitionBy("__bk")
        .orderBy("__d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = keyed.join(F.broadcast(boffs), "__bk").select(
        "__d", (F.sum("__w").over(w_in) + F.col("__o")).alias("__f")
    )
    tot = counts.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).cast("long").alias("n_left"),
        F.coalesce(F.sum("c2"), F.lit(0)).cast("long").alias("n_right"),
    )
    # exact type-1 lower median: min{d : F(d) >= (n_pairs + 1) div 2}
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(
            # (n_pairs + 1) div 2 in pure long arithmetic — decimal
            # division would ROUND the .5 case instead of flooring it
            F.col("__f")
            >= F.expr("(n_left * n_right + 1) div 2").cast(
                "decimal(38,0)"
            )
        )
        .agg(F.min("__d").alias("hl_shift"))
    )
    return tot.crossJoin(F.broadcast(med)).select(
        "n_left",
        "n_right",
        (
            F.col("n_left").cast("decimal(19,0)")
            * F.col("n_right").cast("decimal(19,0)")
        )
        .cast("long")
        .alias("n_pairs"),
        F.when(
            (F.col("n_left") > 0) & (F.col("n_right") > 0),
            F.col("hl_shift"),
        ).alias("hl_shift"),
    )
