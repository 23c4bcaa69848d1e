"""Distribution-distance drift functionals over the exact cent grid
(round 10, wave 107) — the integral complements of the supremum-based
``behavior.ks_two_sample``.

KS answers "how far apart do the ECDFs get at the worst point"; these
three answer "how much do they differ overall", which is what a
training-data drift gate usually wants (KS is blind to many small
shifts; W1 is the retraining-cost proxy):

- ``wasserstein_1``: W1 = integral |F1 - F2| dx — earth-mover distance
  in value units, EXACT (integer |f1*n2 - f2*n1| * grid-gap summed in
  DECIMAL(38,0), one final divide).
- ``cvm_two_sample``: two-sample Cramer-von Mises
  T = n1*n2/N^2 * sum_pooled (F1 - F2)^2, EXACT
  (sum of pooled-count * d^2 in DECIMAL(38,0); T = sum / (N^2*n1*n2)).
- ``energy_distance``: D = 2E|X-Y| - E|X-X'| - E|Y-Y'|, which for
  one-dimensional samples collapses to the Cramer distance
  2 * integral (F1 - F2)^2 dx (derivation in the docstring) — EXACT
  (sum of d^2 * gap in DECIMAL(38,0)).

All three share one grid pass (``_ecdf_counts`` + ``_grid_from_counts``):
quantize to the integer
cent grid, one per-value count rollup, the two-level bucketed ECDF
accumulation from ``ks_two_sample`` (every window bounded at 1024 GRID
POINTS by construction — the 10x stress discipline), and a bucket-level
next-point table for grid gaps. State is distinct-cent-sized (bounded
by the value domain, never corpus-sized); totals broadcast back as a
one-row cross join. No float enters until the single final divide, so
the DuckDB twins walk bit-identical integers (HUGEINT there,
DECIMAL(38,0) here).

Exactness bound: the largest intermediate is sum(d^2 * gap) <=
(n1*n2)^2 * domain-width — inside DECIMAL(38,0) through the 100x
ladder rung (n ~ 1e7 -> ~1e34); the 2^53/decimal-overflow regime
starts three decades above that, same family as the repo's other
DECIMAL(38,x) reductions.

Empty-side contract (fuzz seeds): every operator returns exactly ONE
row; when either side has no observations the statistic is NULL
(undefined), mirroring ``ks_two_sample``'s r9 guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ecdf_counts(
    df: DataFrame, side, value_col: str, scale: int, prefix: str
) -> DataFrame:
    """Quantize + per-value (__qv, c1, c2) counts — the mergeable state
    the grid builds on (and exactly the ks_stream state schema).
    ``prefix`` is the per-STATISTIC materialize prefix: materialize()
    reaps the previous dir for a prefix, so a shared prefix across the
    three functionals would let interleaved query construction (build
    W1's frame, build CvM's, then collect W1) read a deleted path — the
    r10 advice hazard. One prefix per statistic keeps the reap strictly
    within one operator's lifecycle."""
    side_col: Column = F.col(side) if isinstance(side, str) else side
    # NULL values carry no distribution information (ks_two_sample's r9
    # fuzz guard): filter before the grid so both engines see the same
    # sample
    q = df.select(
        side_col.cast("boolean").alias("__r"),
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv"),
    ).filter(F.col("__qv").isNotNull())
    counts = q.groupBy("__qv").agg(
        F.sum(F.when(~F.col("__r"), 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("__r"), 1).otherwise(0)).cast("long").alias("c2"),
    )
    # materialized: the count rollup feeds THREE consumers (bucket sums,
    # the grid join, totals) whose differing column pruning defeats
    # Spark's ReusedExchange — un-cut, the FACT TABLE is scanned three
    # times (r10 plan audit: 3x "Scan parquet", 0 ReusedExchange). The
    # rollup is value-domain-bounded, so the cut is metadata-scale.
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    return materialize(counts, prefix)


def _grid_from_counts(counts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """ECDF grid from a pre-aggregated (__qv, c1, c2) count table —
    ALSO the entry point for the streaming twins (the ks_stream state
    IS this table, so the W1/CvM/energy reads over the live stream
    state reuse this code verbatim). Returns (grid, tot) where grid has
    one row per distinct quantized value — (qv, c1, c2, f1, f2, gap)
    with exact long cumulative counts and the gap to the next grid
    point (0 at the maximum, where F1 - F2 = 0 makes the term vanish
    anyway) — and tot is the one-row (n1, n2) totals frame."""
    # Two-level ECDF accumulation (the ks_two_sample skew discipline): a
    # bare global-order window is ONE task for the whole grid; bucketing
    # on floor(qv/1024) bounds every in-bucket window at 1024 grid
    # points by construction, with bucket offsets broadcast back.
    keyed = counts.withColumn(
        "__bk", F.floor(F.col("__qv") / F.lit(1024)).cast("long")
    )
    bsums = keyed.groupBy("__bk").agg(
        F.sum("c1").alias("__b1"),
        F.sum("c2").alias("__b2"),
        F.min("__qv").alias("__bmin"),
    )
    w_boff = Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)
    w_bnext = Window.orderBy("__bk")
    boffs = bsums.select(
        "__bk",
        F.coalesce(F.sum("__b1").over(w_boff), F.lit(0)).alias("__o1"),
        F.coalesce(F.sum("__b2").over(w_boff), F.lit(0)).alias("__o2"),
        # first grid point of the NEXT non-empty bucket: the gap target
        # for each bucket's last row
        F.lead("__bmin").over(w_bnext).alias("__nextb"),
    )
    w_in = Window.partitionBy("__bk").orderBy("__qv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_lead = Window.partitionBy("__bk").orderBy("__qv")
    grid = (
        keyed.join(F.broadcast(boffs), "__bk")
        .select(
            "__qv",
            "c1",
            "c2",
            (F.sum("c1").over(w_in) + F.col("__o1")).cast("long").alias("f1"),
            (F.sum("c2").over(w_in) + F.col("__o2")).cast("long").alias("f2"),
            F.coalesce(
                F.lead("__qv").over(w_lead), F.col("__nextb")
            ).alias("__next"),
        )
        .select(
            "__qv",
            "c1",
            "c2",
            "f1",
            "f2",
            F.coalesce(F.col("__next") - F.col("__qv"), F.lit(0))
            .cast("long")
            .alias("gap"),
        )
    )
    tot = counts.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    return grid, tot


def _finish(
    grid: DataFrame,
    tot: DataFrame,
    term: Column,
    out_name: str,
    denom: Column,
) -> DataFrame:
    """One-row reduction shared by the three functionals: exact decimal
    term sum, broadcast one-row totals cross join, NULL-on-empty-side
    guard, single final IEEE divide."""
    joined = grid.crossJoin(F.broadcast(tot))
    agg = joined.agg(
        F.sum(term).alias("__s"),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    return agg.select(
        "n_left",
        "n_right",
        F.when(valid, F.col("__s").cast("double") / denom).alias(out_name),
    )


def wasserstein_1(
    df: DataFrame, side, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between the value
    distributions of two row populations — W1 = integral |F1 - F2| dx,
    the total work to morph one distribution into the other, in value
    units. The retraining-cost drift signal KS cannot give: a uniform
    +0.01 shift of every value moves W1 by exactly 0.01 while KS barely
    reacts to wide flat gaps and saturates on narrow tall ones.

    Integer core: per grid point |f1*n2 - f2*n1| * gap summed in
    DECIMAL(38,0); W1 = sum / (n1*n2*scale). One row:
    (n_left, n_right, w1) — w1 NULL when either side is empty."""
    return w1_from_counts(
        _ecdf_counts(df, side, value_col, scale, "ecdf_counts_w1_"),
        scale=scale,
    )


def w1_from_counts(counts: DataFrame, scale: int = 100) -> DataFrame:
    """W1 over a pre-aggregated (__qv, c1, c2) count table — shared by
    the batch operator and the ks_stream state read (streaming twin)."""
    grid, tot = _grid_from_counts(counts)
    d = F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")
    # fold-free: |d| <= n1*n2 fits long; the product with gap goes to
    # DECIMAL(38,0) before summing
    term = F.abs(d).cast("decimal(19,0)") * F.col("gap").cast("decimal(19,0)")
    denom = (
        F.col("n_left").cast("double")
        * F.col("n_right").cast("double")
        * F.lit(float(scale))
    )
    return _finish(grid, tot, term, "w1", denom)


def cvm_two_sample(
    df: DataFrame, side, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Exact two-sample Cramer-von Mises statistic
    T = n1*n2/N^2 * sum over POOLED observations of (F1 - F2)^2 —
    the mass-weighted integral complement of KS: every pooled
    observation contributes its squared ECDF discrepancy, so many small
    departures accumulate where KS sees only the single worst one.
    Ties are handled by weighting each grid point with its pooled
    multiplicity (c1 + c2), the standard grouped form.

    Integer core: d = f1*n2 - f2*n1 (long), pooled-count * d^2 summed
    in DECIMAL(38,0); T = sum / (N^2 * n1 * n2). One row:
    (n_left, n_right, cvm_t) — NULL when either side is empty."""
    return cvm_from_counts(
        _ecdf_counts(df, side, value_col, scale, "ecdf_counts_cvm_")
    )


def cvm_from_counts(counts: DataFrame) -> DataFrame:
    """CvM over a pre-aggregated (__qv, c1, c2) count table — shared by
    the batch operator and the ks_stream state read (streaming twin)."""
    grid, tot = _grid_from_counts(counts)
    d = (F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")).cast(
        "decimal(19,0)"
    )
    term = (F.col("c1") + F.col("c2")).cast("decimal(19,0)") * d * d
    n_tot = F.col("n_left") + F.col("n_right")
    denom = (
        n_tot.cast("double")
        * n_tot.cast("double")
        * F.col("n_left").cast("double")
        * F.col("n_right").cast("double")
    )
    return _finish(grid, tot, term, "cvm_t", denom)


def energy_distance(
    df: DataFrame, side, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Exact energy distance D = 2E|X-Y| - E|X-X'| - E|Y-Y'| between
    the two value distributions, in value units. For one-dimensional
    samples the three pairwise expectations collapse via
    E|A-B| = integral (Fa(1-Fb) + Fb(1-Fa)) dt to
    D = 2 * integral (F1 - F2)^2 dt — the Cramer distance — so NO
    pairwise join ever happens: the O(n^2) definition becomes one grid
    pass, the same anti-quadratic move as the repo's sorted-prefix rank
    statistics. D = 0 iff the distributions coincide; unlike W1 it
    weights the gap quadratically (robust to heavy single-point noise).

    Integer core: d^2 * gap summed in DECIMAL(38,0);
    D = 2 * sum / ((n1*n2)^2 * scale). One row:
    (n_left, n_right, energy_d) — NULL when either side is empty."""
    return energy_from_counts(
        _ecdf_counts(df, side, value_col, scale, "ecdf_counts_energy_"),
        scale=scale,
    )


def energy_from_counts(
    counts: DataFrame, scale: int = 100
) -> DataFrame:
    """Energy distance over a pre-aggregated (__qv, c1, c2) count table
    — shared by the batch operator and the ks_stream state read
    (streaming twin)."""
    grid, tot = _grid_from_counts(counts)
    d = (F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")).cast(
        "decimal(19,0)"
    )
    term = d * d * F.col("gap").cast("decimal(19,0)")
    nn = F.col("n_left").cast("double") * F.col("n_right").cast("double")
    denom = nn * nn * F.lit(float(scale)) / F.lit(2.0)
    return _finish(grid, tot, term, "energy_d", denom)


def wasserstein_by_group(
    df: DataFrame,
    group_col: str,
    side,
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Per-group exact W1 drift — the production "drift per tenant"
    table: one Wasserstein-1 distance per ``group_col`` value between
    the two populations, in ONE pass over the data (no per-group
    driver loop; every window and rollup just gains the group key).

    Scale shape: the grid is (group, distinct-cent)-sized; the ECDF
    windows partition on (group, bucket) so the 1024-grid-point bound
    holds PER GROUP and groups parallelize across tasks — adding
    groups adds parallelism, not depth. Group totals join back on the
    group key (shuffle bounded by group count x grid). NULL group keys
    are kept as their own group (a real tenant-id-missing population)
    via null-safe grouping.

    Returns one row per group present in the (NULL-value-filtered)
    input: (group, n_left, n_right, w1) — w1 NULL where either side of
    THAT group is empty, ordered by nothing (callers sort).
    """
    side_col: Column = F.col(side) if isinstance(side, str) else side
    q = df.select(
        F.col(group_col).alias("g"),
        side_col.cast("boolean").alias("__r"),
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv"),
    ).filter(F.col("__qv").isNotNull())
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # materialized for the same three-consumer / broken-reuse reason as
    # _ecdf_counts; (group x grid)-bounded
    counts = materialize(
        q.groupBy("g", "__qv").agg(
            F.sum(F.when(~F.col("__r"), 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("__r"), 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        ),
        "ecdf_gcounts_",
    )
    keyed = counts.withColumn(
        "__bk", F.floor(F.col("__qv") / F.lit(1024)).cast("long")
    )
    bsums = keyed.groupBy("g", "__bk").agg(
        F.sum("c1").alias("__b1"),
        F.sum("c2").alias("__b2"),
        F.min("__qv").alias("__bmin"),
    )
    w_boff = (
        Window.partitionBy("g")
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_bnext = Window.partitionBy("g").orderBy("__bk")
    boffs = bsums.select(
        "g",
        "__bk",
        F.coalesce(F.sum("__b1").over(w_boff), F.lit(0)).alias("__o1"),
        F.coalesce(F.sum("__b2").over(w_boff), F.lit(0)).alias("__o2"),
        F.lead("__bmin").over(w_bnext).alias("__nextb"),
    )
    w_in = (
        Window.partitionBy("g", "__bk")
        .orderBy("__qv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lead = Window.partitionBy("g", "__bk").orderBy("__qv")
    # null-safe joins: Spark's name-list join is EqualTo, which would
    # silently drop the NULL group the docstring promises to keep
    boffs_r = boffs.withColumnRenamed("g", "__gb")
    grid = (
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
            (F.sum("c1").over(w_in) + F.col("__o1")).cast("long").alias("f1"),
            (F.sum("c2").over(w_in) + F.col("__o2")).cast("long").alias("f2"),
            F.coalesce(
                F.lead("__qv").over(w_lead), F.col("__nextb")
            ).alias("__next"),
        )
        .withColumn(
            "gap",
            F.coalesce(F.col("__next") - F.col("__qv"), F.lit(0)).cast(
                "long"
            ),
        )
    )
    tot = counts.groupBy("g").agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    d = F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")
    term = F.abs(d).cast("decimal(19,0)") * F.col("gap").cast("decimal(19,0)")
    tot_r = tot.withColumnRenamed("g", "__gt")
    joined = grid.join(tot_r, grid["g"].eqNullSafe(tot_r["__gt"])).drop(
        "__gt"
    )
    agg = joined.groupBy("g").agg(
        F.sum(term).alias("__s"),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    denom = (
        F.col("n_left").cast("double")
        * F.col("n_right").cast("double")
        * F.lit(float(scale))
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_left",
        "n_right",
        F.when(valid, F.col("__s").cast("double") / denom).alias("w1"),
    )


def anderson_darling_two_sample(
    df: DataFrame, side, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Two-sample Anderson-Darling statistic A2_akN (Scholz-Stephens
    1987, the tie-adjusted midrank form scipy's ``anderson_ksamp``
    uses) between the value distributions of two row populations — the
    TAIL-SENSITIVE omnibus drift test completing the family: KS sees
    the worst single gap, CvM the mass-weighted average gap, AD weights
    each pooled observation's squared ECDF discrepancy by
    1 / (B_a * (N - B_a)) so departures in the distribution TAILS —
    where B_a(N-B_a) is small — count hardest. Tail drift is the
    classic silent killer of trained models (outlier regimes appear
    before the bulk moves), and it is exactly what W1/CvM/KS discount.

    Integer core (grid form): with h = pooled count per grid point,
    B = pooled inclusive cumulative, and the midrank adjustments kept
    INTEGRAL by doubling (m2_i = 2*F_i - c_i = 2*M_ai,
    b2 = 2*B - h = 2*B_a):

        A2 = (N-1)/N^2 * sum_i (1/n_i) sum_j
             h_j * (N*m2_ij - n_i*b2_j)^2 / D4_j,
        D4_j = b2_j*(2N - b2_j) - N*h_j   (= 4*(B_a(N-B_a) - N*h/4))

    Every factor is exact DECIMAL(38,0); each per-grid-point quotient
    is fixed-point quantized at 1e-6 by EXACT floor division
    (numerator and D4 both non-negative, so truncation == floor on
    both engines: Spark via the (a - a%b)/b decimal identity — the
    built-in ``div`` silently wraps through BIGINT — and DuckDB via
    HUGEINT ``//``), making the statistic deterministic and
    bit-identical across engines; the only free IEEE ops are the fixed
    final scalar tree. Degenerate grid points with D4 = 0 (a single
    pooled distinct value) contribute 0.

    Exactness bound: the largest scaled term is
    h * (2*N^2)^2 * 1e6 <= 4e31 at N ~ 1e5 — DECIMAL(38,0)/HUGEINT-
    exact through the 10x ladder rung (N ~ 1e6 -> ~4e36); overflow
    beyond is LOUD (ANSI decimal), the drift-family regime contract.

    One row: (n_left, n_right, ad_a2) — NULL when either side is
    empty, mirroring the sibling functionals.
    """
    return ad_from_counts(
        _ecdf_counts(df, side, value_col, scale, "ecdf_counts_ad_")
    )


def ad_from_counts(counts: DataFrame) -> DataFrame:
    """A2_akN over a pre-aggregated (__qv, c1, c2) count table — shared
    by the batch operator and the ks_stream state read (streaming
    twin), like the sibling ``*_from_counts`` entry points."""
    grid, tot = _grid_from_counts(counts)
    joined = grid.crossJoin(F.broadcast(tot))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    h = F.col("c1") + F.col("c2")
    big_n = F.col("n1") + F.col("n2")
    b2 = dec(2 * (F.col("f1") + F.col("f2")) - h)
    d4 = b2 * dec(2 * big_n - (2 * (F.col("f1") + F.col("f2")) - h)) - dec(
        big_n
    ) * dec(h)

    def scaled_term(m2, n_i) -> Column:
        u = dec(big_n) * dec(m2) - dec(n_i) * b2
        num = dec(h) * u * u * F.lit(1_000_000).cast("decimal(38,0)")
        # exact floor division: num, d4 >= 0 here, and Spark's `div`
        # is NOT usable (it wraps through BIGINT) — (a - a%b)/b is
        # exact and representable (quotient << 10^32)
        return F.when(
            d4 > 0, ((num - (num % d4)) / d4).cast("decimal(38,0)")
        ).otherwise(F.lit(0).cast("decimal(38,0)"))

    agg = joined.agg(
        F.sum(scaled_term(2 * F.col("f1") - F.col("c1"), F.col("n1"))).alias(
            "__t1"
        ),
        F.sum(scaled_term(2 * F.col("f2") - F.col("c2"), F.col("n2"))).alias(
            "__t2"
        ),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    nn = (F.col("n_left") + F.col("n_right")).cast("double")
    a2 = (
        (nn - F.lit(1.0))
        / (nn * nn)
        * (
            F.col("__t1").cast("double") / F.col("n_left").cast("double")
            + F.col("__t2").cast("double") / F.col("n_right").cast("double")
        )
        / F.lit(1_000_000.0)
    )
    return agg.select(
        "n_left", "n_right", F.when(valid, a2).alias("ad_a2")
    )


def ks_by_group(
    df: DataFrame,
    group_col: str,
    side,
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Per-group exact two-sample KS — the supremum complement of
    ``wasserstein_by_group``'s per-tenant drift table: one KS statistic
    per ``group_col`` value between the two populations, in ONE pass
    (no per-group driver loop; every window and rollup just gains the
    group key, so groups add parallelism, not depth).

    Same integer core as ``behavior.ks_two_sample``: the supremum
    D = max |F1 - F2| is located by the integer cross-product argmax
    max |f1*n2 - f2*n1| per group (DECIMAL-exact; ties resolve to the
    smallest value via the struct arg-max), and the only float op is
    one final divide by n1*n2 per group. The ECDF windows partition on
    (group, bucket) so the 1024-grid-point bound holds PER GROUP. NULL
    group keys are kept as their own group via null-safe joins.

    Returns one row per group present in the (NULL-value-filtered)
    input: (group, n_left, n_right, ks_d, ks_at_value) — the stats
    NULL where either side of THAT group is empty.
    """
    side_col: Column = F.col(side) if isinstance(side, str) else side
    q = df.select(
        F.col(group_col).alias("g"),
        side_col.cast("boolean").alias("__r"),
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__qv"),
    ).filter(F.col("__qv").isNotNull())
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    # materialized for the same three-consumer / broken-reuse reason as
    # the sibling functionals; (group x grid)-bounded
    counts = materialize(
        q.groupBy("g", "__qv").agg(
            F.sum(F.when(~F.col("__r"), 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("__r"), 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        ),
        "ks_gcounts_",
    )
    keyed = counts.withColumn(
        "__bk", F.floor(F.col("__qv") / F.lit(1024)).cast("long")
    )
    bsums = keyed.groupBy("g", "__bk").agg(
        F.sum("c1").alias("__b1"), F.sum("c2").alias("__b2")
    )
    w_boff = (
        Window.partitionBy("g")
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boffs = bsums.select(
        "g",
        "__bk",
        F.coalesce(F.sum("__b1").over(w_boff), F.lit(0)).alias("__o1"),
        F.coalesce(F.sum("__b2").over(w_boff), F.lit(0)).alias("__o2"),
    )
    w_in = (
        Window.partitionBy("g", "__bk")
        .orderBy("__qv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # null-safe joins keep the NULL group (a real tenant-id-missing
    # population), as in wasserstein_by_group
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
            (F.sum("c1").over(w_in) + F.col("__o1")).alias("f1"),
            (F.sum("c2").over(w_in) + F.col("__o2")).alias("f2"),
        )
    )
    tot = counts.groupBy("g").agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    tot_r = tot.withColumnRenamed("g", "__gt")
    joined = cum.join(tot_r, cum["g"].eqNullSafe(tot_r["__gt"])).drop("__gt")
    d = F.abs(
        F.col("f1").cast("decimal(38,0)") * F.col("n2")
        - F.col("f2").cast("decimal(38,0)") * F.col("n1")
    )
    agg = joined.groupBy("g").agg(
        F.max(
            F.struct(d.alias("__d"), (-F.col("__qv")).alias("__nq"))
        ).alias("__best"),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    denom = (
        F.col("n_left").cast("decimal(19,0)")
        * F.col("n_right").cast("decimal(19,0)")
    ).cast("double")
    return agg.select(
        F.col("g").alias(group_col),
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


def kuiper_two_sample(
    df: DataFrame, side, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Exact two-sample Kuiper statistic V = D+ + D- where
    D+ = sup(F1 - F2) and D- = sup(F2 - F1) — the cyclic-safe,
    tail-sensitive sibling of KS. KS's single supremum under-weights
    shifts that push mass in BOTH directions (e.g. a variance change
    moves F1 above F2 on one side of the center and below on the
    other); Kuiper adds the two one-sided suprema so symmetric tail
    drift scores fully. It is also invariant to cyclic shifts, the
    standard choice for periodic domains (hour-of-day, day-of-week).

    Integer core: d = f1*n2 - f2*n1 (long) over the shared cent grid;
    D+ = max(d), D- = max(-d), both exact (the grid's last point has
    d = 0, so each supremum is >= 0 without clamping);
    V = (max(d) + max(-d)) / (n1*n2). The only float op is the final
    divide. Returns ONE row: (n_left, n_right, d_plus, d_minus,
    kuiper_v) — NULLs when either side is empty, mirroring
    ``behavior.ks_two_sample``'s r9 guard."""
    return kuiper_from_counts(
        _ecdf_counts(df, side, value_col, scale, "ecdf_counts_kuiper_")
    )


def kuiper_from_counts(counts: DataFrame) -> DataFrame:
    """Kuiper over a pre-aggregated (__qv, c1, c2) count table — shared
    by the batch operator and the ks_stream state read (streaming
    twin), like the other *_from_counts entry points."""
    grid, tot = _grid_from_counts(counts)
    joined = grid.crossJoin(F.broadcast(tot))
    d = F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")
    agg = joined.agg(
        F.max(d).alias("__dp"),
        F.max(-d).alias("__dm"),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    denom = (
        F.col("n_left").cast("decimal(19,0)")
        * F.col("n_right").cast("decimal(19,0)")
    ).cast("double")
    return agg.select(
        "n_left",
        "n_right",
        F.when(valid, F.col("__dp").cast("double") / denom).alias("d_plus"),
        F.when(valid, F.col("__dm").cast("double") / denom).alias("d_minus"),
        F.when(
            valid,
            (F.col("__dp") + F.col("__dm")).cast("double") / denom,
        ).alias("kuiper_v"),
    )


def hellinger_tv_two_sample(
    df: DataFrame, side, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Histogram-space total-variation distance and squared Hellinger
    distance between the two value distributions over the shared cent
    grid — the DENSITY-space complements of the ECDF functionals (W1
    integrates the CDF gap; TV/Hellinger compare the histograms bin by
    bin, so a mass SWAP between two distant bins that leaves the CDF
    gap small still scores):

    - ``tv_d`` = (1/2) * sum_v |c1/n1 - c2/n2| — EXACT: the integer
      core |c1*n2 - c2*n1| sums in DECIMAL(38,0) with ONE final divide
      by 2*n1*n2 (same discipline as W1).
    - ``hellinger_h2`` = 1 - sum_v sqrt((c1/n1)*(c2/n2)), the squared
      Hellinger distance via the Bhattacharyya affinity. sqrt is
      irrational so this term is IEEE-double; each per-bin term is
      computed as sqrt(c1*c2)/sqrt(n1*n2) and the sum is rounded to
      6 dp — the bm25/entropy portability convention (libm last-ulp +
      summation-order noise live far below 1e-6).

    Returns ONE row: (n_left, n_right, tv_d, hellinger_h2) — NULLs
    when either side is empty."""
    counts = _ecdf_counts(df, side, value_col, scale, "ecdf_counts_htv_")
    tot = counts.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    joined = counts.crossJoin(F.broadcast(tot))
    tv_term = F.abs(
        F.col("c1").cast("decimal(19,0)") * F.col("n2")
        - F.col("c2").cast("decimal(19,0)") * F.col("n1")
    )
    bc_term = F.sqrt(
        F.col("c1").cast("double") * F.col("c2").cast("double")
    )
    agg = joined.agg(
        F.sum(tv_term).alias("__tv"),
        F.sum(bc_term).alias("__bc"),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    nn = F.col("n_left").cast("double") * F.col("n_right").cast("double")
    return agg.select(
        "n_left",
        "n_right",
        F.when(valid, F.col("__tv").cast("double") / (2.0 * nn)).alias(
            "tv_d"
        ),
        F.when(
            valid,
            F.round(F.lit(1.0) - F.col("__bc") / F.sqrt(nn), 6),
        ).alias("hellinger_h2"),
    )
