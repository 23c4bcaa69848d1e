"""Dependence-measure completions over exact contingency grids (round
11, wave 120) — the general-dependence / quadrant / categorical-PRE
complements of the repo's rank correlations (kendall_tau_groups,
spearman, wave 113's gamma/Somers) and association measures (Cramér's
V, Theil's U):

- ``hoeffding_d``: Hoeffding's D test of INDEPENDENCE. Kendall/Spearman
  detect monotone association only; D is consistent against ANY
  dependence with continuous margins (a U-shaped relation scores tau ~ 0
  but D > 0). Computed exactly on the dense bivariate grid with the
  Hollander-Wolfe statistic and midrank/quarter tie credits:
  D = 30 * [(n-2)(n-3)*D1 + D2 - 2(n-2)*D3] / [n(n-1)(n-2)(n-3)(n-4)],
  D1 = sum c_i(c_i - 1), D2 = sum (R-1)(R-2)(S-1)(S-2),
  D3 = sum (R-2)(S-2)c_i, where R, S are marginal midranks and c_i the
  bivariate "both strictly below" count with the standard tie credits
  (1/2 per single-axis tie, 1/4 per double tie, self excluded). EXACT:
  doubled midranks 2R = 2F_less + c + 1 and quartered quadrant counts
  4c_i = 4*LL + 2*EL + 2*LE + (c_cell - 1) are integers, so
  16*D1/16*D2/16*D3 sum exactly in DECIMAL(38,0); the only float work is
  the fixed scalar tail (mirrored token-for-token in the SQL twin).

- ``blomqvist_beta``: the medial (quadrant) correlation — sign
  agreement around the joint medians, the maximally outlier-immune
  dependence screen. Exact type-1 lower medians from the marginal count
  grids (integer threshold probes, the wave-117 decile discipline);
  points ON either median are excluded (the classical convention).

- ``gk_lambda``: Goodman-Kruskal lambda, the proportional-reduction-in
  -error measure for CATEGORICAL pairs — "how much better do we guess
  lang knowing source" — the directional complement of the symmetric
  Cramér's V and the entropy-based Theil's U already in the registry.
  Pure contingency counts, exact integers, three final divides.

No counterpart exists in the reference (a 1.4k-LoC Glue CDC pipeline,
``/root/reference/src``, has no statistics code); built per the
round-11 brief's "text/data analysis at scale" mandate.

Scale shape: all state is value-domain-bounded (distinct quantized
cell pairs), never corpus-sized. Caller contract for ``hoeffding_d``:
both axes are LOW-CARDINALITY quantized domains (the kendall_tau_groups
contract — e.g. 50 quantities x 11 discount points), so the dense grid
and its windows are grid-sized by construction. Count rollups are
materialized (lineage cut) because they feed 3+ consumers whose
differing column pruning defeats ReusedExchange — the r10 plan-audit
discipline. Decimal overflow is LOUD (ANSI decimal), never a silent
wrap. Exact-regime bound (hoeffding_d only): the summed 16*D2 core is
bounded by 256*n^5 — an inherent magnitude, since D2 itself is
Theta(n^5) for real data — so DECIMAL(38,0) guarantees exactness to
n ~ 1.3e7 rows PER EVALUATION (typical balanced grids reach further);
the 100x scale-ladder rung (n = 6e7) demonstrated the loud
ARITHMETIC_OVERFLOW raise at the boundary. Beyond it, stratify (the
statistic is per-group anyway in practice: run hoeffding_d per tenant
/ day / segment, each under the bound) or subsample — the same
documented-regime convention as the exact quadratic dedup verifiers
(BENCH_EXCLUDED) and mmd.py's int64 gram guard. blomqvist_beta /
gk_lambda / chatterjee_xi carry no such bound (cores <= n^3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
    materialize,
)


def _d19(col) -> F.Column:
    return col.cast("decimal(19,0)")


def hoeffding_d(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Hoeffding's D statistic of independence between two quantized
    long columns (caller quantizes; NULLs on either axis are dropped —
    no dependence information, the r9 fuzz convention).

    Returns ONE row: (n_total, d1_16, d2_16, d3_16, hoeffding_d) —
    the 16-scaled exact component sums (as double, exact integer
    conversions) and the Hollander-Wolfe D, which is 1 for perfect
    monotone dependence without ties, ~0 under independence, and can
    reach -0.5 under heavy ties. NULL when n_total < 5 (the statistic's
    denominator vanishes)."""
    q = df.select(
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    # (x-domain x y-domain)-bounded rollup feeding SIX consumers (dense
    # axes, the dense left join, both marginals, totals) — cut once
    cells = materialize(
        q.groupBy("__x", "__y").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ),
        "hoeffd_cells_",
    )
    # dense bivariate grid: the exclusive cumulative LL(x,y) =
    # sum_{x'<x} EL(x',y) needs EL evaluable at EVERY grid y, not just
    # column x's own points — axes are bounded (caller contract) so the
    # cross join is grid-sized
    xs = cells.select("__x").distinct()
    ys = cells.select("__y").distinct()
    dense = (
        xs.crossJoin(ys)
        .join(cells, ["__x", "__y"], "left")
        .select(
            "__x",
            "__y",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    # grid-sized windows over the materialized (reduced) rollup: each
    # partition is one axis slice, bounded by the domain contract
    w_el = (
        Window.partitionBy("__x")
        .orderBy("__y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_le = (
        Window.partitionBy("__y")
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = dense.select(
        "__x",
        "__y",
        "c",
        F.coalesce(F.sum("c").over(w_el), F.lit(0)).alias("el"),
        F.coalesce(F.sum("c").over(w_le), F.lit(0)).alias("le"),
    )
    cum2 = cum.select(
        "__x",
        "__y",
        "c",
        "el",
        "le",
        F.coalesce(F.sum("el").over(w_le), F.lit(0)).alias("ll"),
    ).filter(F.col("c") > 0)
    # marginal doubled midranks 2R = 2*F_less + c + 1 (integer): a
    # domain-sized window over the grid marginals
    w_x = Window.orderBy("__x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marg_x = (
        cells.groupBy("__x")
        .agg(F.sum("c").cast("long").alias("cx"))
        .select(
            "__x",
            (
                F.lit(2) * (F.sum("cx").over(w_x) - F.col("cx"))
                + F.col("cx")
                + F.lit(1)
            ).alias("r2"),
        )
    )
    w_y = Window.orderBy("__y").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marg_y = (
        cells.groupBy("__y")
        .agg(F.sum("c").cast("long").alias("cy"))
        .select(
            "__y",
            (
                F.lit(2) * (F.sum("cy").over(w_y) - F.col("cy"))
                + F.col("cy")
                + F.lit(1)
            ).alias("s2"),
        )
    )
    pts = cum2.join(F.broadcast(marg_x), "__x").join(
        F.broadcast(marg_y), "__y"
    )
    # quartered quadrant count 4c_i = 4*LL + 2*EL + 2*LE + (c-1): the
    # same integer for every point of the cell, weighted by c
    q4 = (
        F.lit(4) * F.col("ll")
        + F.lit(2) * F.col("el")
        + F.lit(2) * F.col("le")
        + F.col("c")
        - F.lit(1)
    )
    c_d = _d19(F.col("c"))
    q4_d = _d19(q4)
    r2_d = _d19(F.col("r2"))
    s2_d = _d19(F.col("s2"))
    two = F.lit(2).cast("decimal(19,0)")
    four = F.lit(4).cast("decimal(19,0)")
    agg = pts.agg(
        F.sum(c_d * q4_d * (q4_d - four)).alias("__hd1"),
        F.sum(
            c_d * (r2_d - two) * (r2_d - four) * (s2_d - two) * (s2_d - four)
        ).alias("__hd2"),
        F.sum(c_d * (r2_d - four) * (s2_d - four) * q4_d).alias("__hd3"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_total"),
    )
    nd = F.col("n_total").cast("double")
    d1 = F.col("__hd1").cast("double") / F.lit(16.0)
    d2 = F.col("__hd2").cast("double") / F.lit(16.0)
    d3 = F.col("__hd3").cast("double") / F.lit(16.0)
    valid = F.col("n_total") >= 5
    return agg.select(
        "n_total",
        F.when(valid, d1).alias("d1_16x"),
        F.when(valid, d2).alias("d2_16x"),
        F.when(valid, d3).alias("d3_16x"),
        F.when(
            valid,
            F.lit(30.0)
            * (
                (nd - F.lit(2.0)) * (nd - F.lit(3.0)) * d1
                + d2
                - F.lit(2.0) * (nd - F.lit(2.0)) * d3
            )
            / (
                nd
                * (nd - F.lit(1.0))
                * (nd - F.lit(2.0))
                * (nd - F.lit(3.0))
                * (nd - F.lit(4.0))
            ),
        ).alias("hoeffding_d"),
    )


def blomqvist_beta(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Blomqvist's beta (medial / quadrant correlation) between two
    quantized long columns: sign agreement around the exact type-1
    lower medians. Points ON either median are EXCLUDED (the classical
    convention — they carry no quadrant sign).

    Returns ONE row: (n_total, med_x, med_y, n_conc, n_disc, beta)
    with beta = (n_conc - n_disc) / (n_conc + n_disc), NULL when no
    off-median points remain."""
    q = df.select(
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    # Both marginal count tables in ONE pass: explode each row to
    # (axis, value) and group once. The previous shape rolled up the
    # full (x-domain x y-domain) grid first — but for blomqvist that
    # grid is INPUT-cardinality whenever one axis is near-continuous
    # (price cents), so the "rollup" was a corpus-sized store feeding
    # five consumers, and its y-marginal cumulative ran as an
    # unpartitioned window. The marginals are the only value-bounded
    # state the statistic needs (guide §2.3/§2.4: shuffle keys, not
    # payloads; remove the store outright).
    marg = materialize(
        q.select(
            F.posexplode(F.array("__x", "__y")).alias("__axis", "__v")
        )
        .groupBy("__axis", "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__cc")),
        "blomqvist_marg_",
    )
    # Two-level bucketed cumulative (the drift.py _grid_from_counts
    # skew discipline): a bare per-axis window is ONE task for a whole
    # near-continuous marginal; bucketing on floor(v/1024) bounds every
    # in-bucket window at 1024 grid points by construction, with
    # per-axis bucket offsets (and the axis total n) broadcast back —
    # so medians AND n_total come out of one window job + one 1-row agg
    # (the old shape executed the grid store's tot agg three times
    # under crossJoin broadcasts).
    keyed = marg.withColumn(
        "__bk", F.floor(F.col("__v") / F.lit(1024)).cast("long")
    )
    bsums = keyed.groupBy("__axis", "__bk").agg(
        F.sum("__cc").cast("long").alias("__bc")
    )
    w_boff = (
        Window.partitionBy("__axis")
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_ball = Window.partitionBy("__axis")
    boffs = bsums.select(
        "__axis",
        "__bk",
        F.coalesce(F.sum("__bc").over(w_boff), F.lit(0))
        .cast("long")
        .alias("__off"),
        F.sum("__bc").over(w_ball).cast("long").alias("__n"),
    )
    w_in = (
        Window.partitionBy("__axis", "__bk")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Domain note (r11 advice): boffs has ~distinct(__v)/1024 rows per
    # axis, so the broadcast hint assumes value-DOMAIN-bounded axes
    # (integer quantities, price cents — ladder-verified). A genuinely
    # unbounded long column would grow this toward broadcast limits;
    # such a caller should gate the hint on the marginal's estimated
    # size (materialize.estimated_bytes) before reusing this shape.
    cum = keyed.join(F.broadcast(boffs), ["__axis", "__bk"]).select(
        "__axis",
        "__v",
        (F.sum("__cc").over(w_in) + F.col("__off")).cast("long").alias(
            "__f"
        ),
        "__n",
    )
    # exact type-1 lower median per axis: min{v : F(v) >= (n+1) div 2}
    # (posexplode order: axis 0 = x, 1 = y)
    med = (
        cum.filter(F.col("__f") >= F.expr("(__n + 1) div 2").cast("long"))
        .agg(
            F.min(F.when(F.col("__axis") == 0, F.col("__v"))).alias(
                "med_x"
            ),
            F.min(F.when(F.col("__axis") == 1, F.col("__v"))).alias(
                "med_y"
            ),
            F.coalesce(
                F.max(F.when(F.col("__axis") == 0, F.col("__n"))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_total"),
        )
    )
    # quadrant agg straight over the base rows (map-side combinable;
    # no grid, no store): points ON either median excluded by the
    # strict inequalities
    joined = q.crossJoin(F.broadcast(med))
    conc = (
        (F.col("__x") > F.col("med_x")) & (F.col("__y") > F.col("med_y"))
    ) | ((F.col("__x") < F.col("med_x")) & (F.col("__y") < F.col("med_y")))
    disc = (
        (F.col("__x") > F.col("med_x")) & (F.col("__y") < F.col("med_y"))
    ) | ((F.col("__x") < F.col("med_x")) & (F.col("__y") > F.col("med_y")))
    agg = joined.agg(
        F.coalesce(F.sum(F.when(conc, F.lit(1))), F.lit(0))
        .cast("long")
        .alias("n_conc"),
        F.coalesce(F.sum(F.when(disc, F.lit(1))), F.lit(0))
        .cast("long")
        .alias("n_disc"),
        F.max("med_x").alias("med_x"),
        F.max("med_y").alias("med_y"),
        F.coalesce(F.max("n_total"), F.lit(0)).cast("long").alias(
            "n_total"
        ),
    )
    denom = F.col("n_conc") + F.col("n_disc")
    return agg.select(
        "n_total",
        "med_x",
        "med_y",
        "n_conc",
        "n_disc",
        F.when(
            denom > 0,
            (F.col("n_conc") - F.col("n_disc")).cast("double")
            / denom.cast("double"),
        ).alias("beta"),
    )


def gk_lambda(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Goodman-Kruskal lambda over a categorical pair: the
    proportional reduction in modal-guess error. NULL categories are
    dropped on both axes (no class information).

    Returns ONE row: (n_total, sum_rowmax, sum_colmax, max_row_margin,
    max_col_margin, lambda_y_x, lambda_x_y, lambda_sym) — lambda_y_x
    predicts y FROM x: (sum_x max_y n_xy - max_y n_y) / (n - max_y n_y);
    each lambda NULL when its denominator is 0 (one category holds all
    the mass — nothing to improve on)."""
    q = df.select(
        F.col(x_col).alias("__x"), F.col(y_col).alias("__y")
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    # contingency rollup feeding row maxes, col maxes, margins, totals
    cells = materialize(
        q.groupBy("__x", "__y").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ),
        "gk_lambda_cells_",
    )
    rowmax = cells.groupBy("__x").agg(F.max("c").alias("__m")).agg(
        F.coalesce(F.sum("__m"), F.lit(0)).cast("long").alias("sum_rowmax")
    )
    colmax = cells.groupBy("__y").agg(F.max("c").alias("__m")).agg(
        F.coalesce(F.sum("__m"), F.lit(0)).cast("long").alias("sum_colmax")
    )
    row_margin = cells.groupBy("__x").agg(F.sum("c").alias("__n")).agg(
        F.coalesce(F.max("__n"), F.lit(0))
        .cast("long")
        .alias("max_row_margin")
    )
    col_margin = cells.groupBy("__y").agg(F.sum("c").alias("__n")).agg(
        F.coalesce(F.max("__n"), F.lit(0))
        .cast("long")
        .alias("max_col_margin")
    )
    tot = cells.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_total")
    )
    one = (
        tot.crossJoin(F.broadcast(rowmax))
        .crossJoin(F.broadcast(colmax))
        .crossJoin(F.broadcast(row_margin))
        .crossJoin(F.broadcast(col_margin))
    )
    den_yx = F.col("n_total") - F.col("max_col_margin")
    den_xy = F.col("n_total") - F.col("max_row_margin")
    den_sym = den_yx + den_xy
    return one.select(
        "n_total",
        "sum_rowmax",
        "sum_colmax",
        "max_row_margin",
        "max_col_margin",
        F.when(
            den_yx > 0,
            (F.col("sum_rowmax") - F.col("max_col_margin")).cast("double")
            / den_yx.cast("double"),
        ).alias("lambda_y_x"),
        F.when(
            den_xy > 0,
            (F.col("sum_colmax") - F.col("max_row_margin")).cast("double")
            / den_xy.cast("double"),
        ).alias("lambda_x_y"),
        F.when(
            den_sym > 0,
            (
                F.col("sum_rowmax")
                + F.col("sum_colmax")
                - F.col("max_col_margin")
                - F.col("max_row_margin")
            ).cast("double")
            / den_sym.cast("double"),
        ).alias("lambda_sym"),
    )


def chatterjee_xi(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Chatterjee's xi rank correlation (2020) between two quantized
    long columns — the modern dependence coefficient that is 0 iff
    independent and 1 iff y is a measurable function of x, detecting
    NON-monotone functional dependence that tau/rho/Spearman miss:
    xi = 1 - 3 * sum_i |r_{i+1} - r_i| / (n^2 - 1), rows sorted by x
    with ties broken UNIFORMLY AT RANDOM, and r_i = #{j : y_j <= y_i}.

    EXPECTED-STATISTIC VARIANT: the prescribed random tie-break cannot
    be engine-mirrored (and any deterministic order is WRONG — sorting
    tied-x rows by y drives xi to ~1 on independent data, measured
    0.995 on the qty/discount pair before this fix). This implementation
    computes E[xi] over the tie-break randomness EXACTLY: in a uniform
    random permutation of a tie block of m rows, each unordered row
    pair is adjacent with probability 2/m, and each block boundary
    joins one uniform row from each neighbouring block, so
    E[sum |dr|] = sum_blocks (2/m_b) * S_b
                + sum_consecutive_blocks S_ij / (m_i * m_j)
    with S_b / S_ij the exact pairwise |rank gap| sums — all computable
    on the (x-domain x y-domain)-bounded grid, never a corpus-sized
    sort. Per-block divides are micro-quantized to integer micros and
    summed order-free (the theils_u / g_test portability convention);
    the double core is exact while block pair sums stay below 2^53.
    NULLs on either axis are dropped.

    Returns ONE row: (n_total, exp_sum_micros, xi) — exp_sum_micros
    the micro-quantized E[sum |dr|], xi NULL when n_total < 2 (the
    denominator vanishes)."""
    q = df.select(
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    # grid rollup feeding the y-marginal, block sizes, the within-block
    # pair fan, the boundary fan and totals — cut once
    cells = materialize(
        q.groupBy("__x", "__y").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ),
        "chatterjee_cells_",
    )
    # r(y) = #{j : y_j <= y} — the inclusive marginal cumulative
    # (grid-sized window over the materialized, reduced rollup)
    w_y = Window.orderBy("__y").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marg_y = (
        cells.groupBy("__y")
        .agg(F.sum("c").cast("long").alias("__cy"))
        .select("__y", F.sum("__cy").over(w_y).cast("long").alias("__r"))
    )
    ranked = cells.join(F.broadcast(marg_y), "__y").select(
        "__x", "__y", "c", "__r"
    )
    blocks = cells.groupBy("__x").agg(F.sum("c").cast("long").alias("__m"))
    # within-block doubled pair sum 2*S_b = sum over ORDERED y1 != y2 of
    # c1*c2*|r1-r2| — a grid-sized per-block self-join
    a = ranked.select(
        "__x",
        F.col("__y").alias("__ya"),
        F.col("c").alias("__ca"),
        F.col("__r").alias("__ra"),
    )
    b = ranked.select(
        "__x",
        F.col("__y").alias("__yb"),
        F.col("c").alias("__cb"),
        F.col("__r").alias("__rb"),
    )
    s2_in = (
        a.join(b, "__x")
        .filter(F.col("__ya") != F.col("__yb"))
        .groupBy("__x")
        .agg(
            F.sum(
                _d19(F.col("__ca"))
                * _d19(F.col("__cb"))
                * _d19(F.abs(F.col("__ra") - F.col("__rb")))
            ).alias("__s2")
        )
    )
    # E-contribution of block b: (2/m)*S_b = S2_b/m, micro-quantized
    within = (
        blocks.join(s2_in, "__x", "left")
        .select(
            F.when(
                F.col("__s2").isNotNull(),
                F.round(
                    F.lit(1000000.0)
                    * F.col("__s2").cast("double")
                    / F.col("__m").cast("double"),
                    0,
                ).cast("decimal(38,0)"),
            )
            .otherwise(F.lit(0).cast("decimal(38,0)"))
            .alias("__t")
        )
        # DECIMAL(38,0) accumulation: per-block micro terms reach
        # ~1e6 * m * n and their sum overflows LONG two decades up —
        # the 10x ladder rung caught exactly that (loud ANSI raise)
        .agg(
            F.coalesce(
                F.sum("__t"), F.lit(0).cast("decimal(38,0)")
            ).alias("__w")
        )
    )
    # boundary pairs: one uniform row from each of two CONSECUTIVE
    # blocks in x order -> S_ij / (m_i * m_j)
    w_x = Window.orderBy("__x")
    nxt = blocks.select(
        "__x",
        F.col("__m").alias("__mi"),
        F.lead("__x").over(w_x).alias("__xn"),
        F.lead("__m").over(w_x).alias("__mj"),
    ).filter(F.col("__xn").isNotNull())
    bj = ranked.select(
        F.col("__x").alias("__xn"),
        F.col("c").alias("__cj"),
        F.col("__r").alias("__rj"),
    )
    bi = ranked.select(
        "__x", F.col("c").alias("__ci"), F.col("__r").alias("__ri")
    )
    s_ij = (
        nxt.join(bi, "__x")
        .join(bj, "__xn")
        .groupBy("__x", "__mi", "__mj")
        .agg(
            F.sum(
                _d19(F.col("__ci"))
                * _d19(F.col("__cj"))
                * _d19(F.abs(F.col("__ri") - F.col("__rj")))
            ).alias("__s")
        )
    )
    boundary = s_ij.select(
        F.round(
            F.lit(1000000.0)
            * F.col("__s").cast("double")
            / (F.col("__mi").cast("double") * F.col("__mj").cast("double")),
            0,
        )
        .cast("decimal(38,0)")
        .alias("__t")
    ).agg(
        F.coalesce(F.sum("__t"), F.lit(0).cast("decimal(38,0)")).alias(
            "__b"
        )
    )
    tot = cells.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_total")
    )
    one = tot.crossJoin(F.broadcast(within)).crossJoin(F.broadcast(boundary))
    nd = F.col("n_total").cast("decimal(19,0)")
    denom = (nd * nd - F.lit(1).cast("decimal(19,0)")).cast("double")
    return one.select(
        "n_total",
        (F.col("__w") + F.col("__b")).cast("double").alias(
            "exp_sum_micros"
        ),
        F.when(
            F.col("n_total") >= 2,
            F.lit(1.0)
            - F.lit(3.0)
            * (
                (F.col("__w") + F.col("__b")).cast("double")
                / F.lit(1000000.0)
            )
            / denom,
        ).alias("xi"),
    )
