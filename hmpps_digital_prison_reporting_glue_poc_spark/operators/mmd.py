"""Embedding-space distribution drift: polynomial-kernel MMD^2 by
exact moment factorization (round 10, wave 108).

Maximum Mean Discrepancy with the quadratic kernel
k(x, y) = (x.y / D + 1)^2 (D = d * scale^2 normalizes the quantized
dot product to ~[-1, 1] for unit-scale embeddings) — the
embedding-space complement of the value-grid drift family: W1/CvM/KS
see a 1-D projection, MMD^2 sees the joint distribution of the whole
vector, and the quadratic kernel makes it EXACTLY computable from
second moments:

    sum_{x in A, y in B} (x.y)   = S_A . S_B
    sum_{x in A, y in B} (x.y)^2 = sum_ij G_A[i,j] * G_B[i,j]

with S = per-side coordinate sums and G = per-side gram (sum of outer
products). So the O(n^2) pairwise kernel sum collapses to ONE data
pass producing (n, S, G) per side — d + d(d+1)/2 integer cells — and
a d^2-sized driver-free reduce. This is the same anti-quadratic move
as ``pca_top_component``'s gram pass (similarity.py), reusing its
micro-quantization (floor(x * scale), int64) and Arrow ``mapInPandas``
partial-sum kernel; the only floats are the FIXED final tree of ~15
IEEE ops, written identically in the DuckDB twin.

Estimator: the biased V-statistic
MMD^2 = K_aa/na^2 + K_bb/nb^2 - 2 K_ab/(na nb), K_xy the full kernel
sum including self-pairs — exactly zero for identical multisets,
engine-exact, and free of the U-statistic's n>=2 special cases.

Exactness bound: gram cells reach n * (scale*|x|_max)^2 and the
GG cross terms their square — DECIMAL(38,0)-exact to ~40k vectors per
side at scale=1e6 (unit-scale embeddings). Beyond that pass a smaller
``scale`` (1e3 extends the exact regime by 1e12); overflow is LOUD
everywhere: the post-shuffle sums are ANSI decimal, and the
per-partition int64 partials carry an explicit runtime guard in the
Arrow kernel (rows-per-partition x max|q|^2 must stay under 2^62, else
OverflowError names the remedy) — numpy's += would otherwise WRAP
silently on non-unit-scale embeddings or over-large partitions (r10
advice).

Empty/degenerate contract: one row (n_left, n_right, mmd2); mmd2 NULL
when either side is empty; rows with NULL side, NULL vector, or a
dimension != the table's probe dimension (deterministically the MAX
vector length over non-NULL vectors, identical on both engines) are
excluded (the fuzz degenerate-input discipline), mirrored by the SQL
twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mmd2_quadratic(
    df: DataFrame,
    side,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    import pandas as pd

    side_col: Column = F.col(side) if isinstance(side, str) else side
    # Deterministic probe dimension: max(size(vec)) over non-NULL
    # vectors — .first()-style probes are partition-order-dependent, so
    # on a heterogeneous-dim table the two engines could probe different
    # dims and filter DIFFERENT row sets (r10 advice). A one-row global
    # agg is metadata-scale and both engines compute the identical value
    # (the SQL twin uses max(len(embedding))).
    d = df.filter(F.col(vec_col).isNotNull()).agg(
        F.max(F.size(vec_col))
    ).first()[0]
    spark = df.sparkSession
    if d is None:
        # empty table: the one-row contract without a kernel pass
        # (counts coalesce to 0 like the populated path's empty side)
        return spark.createDataFrame(
            [(0, 0, None)], "n_left long, n_right long, mmd2 double"
        )
    base = df.select(
        side_col.cast("boolean").alias("__r"), F.col(vec_col).alias("__v")
    ).filter(
        F.col("__r").isNotNull()
        & F.col("__v").isNotNull()
        & (F.size("__v") == F.lit(d))
    )

    def kernel(batches):
        import numpy as np

        G = {0: np.zeros((d, d), dtype=np.int64),
             1: np.zeros((d, d), dtype=np.int64)}
        S = {0: np.zeros(d, dtype=np.int64), 1: np.zeros(d, dtype=np.int64)}
        N = {0: 0, 1: 0}
        qmax = {0: 0, 1: 0}
        for pdf in batches:
            if pdf.empty:
                continue
            for r in (0, 1):
                sub = pdf[pdf["__r"] == bool(r)]
                if sub.empty:
                    continue
                mat = np.stack(
                    [
                        np.floor(
                            np.asarray(v, dtype=np.float64) * float(scale)
                        ).astype(np.int64)
                        for v in sub["__v"]
                    ]
                )
                N[r] += len(sub)
                qmax[r] = max(qmax[r], int(np.abs(mat).max(initial=0)))
                # int64 += wraps SILENTLY in numpy — guard BEFORE the
                # accumulate: every gram cell is bounded by
                # rows-so-far * qmax^2, so this bound exceeding 2^62
                # is the loud trip-wire the module contract promises
                # (non-unit-scale embeddings / over-large partitions).
                if N[r] * qmax[r] * qmax[r] >= (1 << 62):
                    raise OverflowError(
                        "mmd2_quadratic int64 gram partial would "
                        f"overflow: {N[r]} rows x max|q|={qmax[r]} in "
                        "one partition; pass a smaller `scale` or "
                        "repartition to smaller partitions"
                    )
                G[r] += mat.T @ mat
                S[r] += mat.sum(axis=0)
        rows = {"r": [], "i": [], "j": [], "s": []}
        iu = np.triu_indices(d)
        for r in (0, 1):
            if N[r] == 0:
                continue
            rows["r"].append(r); rows["i"].append(-2)
            rows["j"].append(-2); rows["s"].append(N[r])
            for i in range(d):
                rows["r"].append(r); rows["i"].append(int(i))
                rows["j"].append(-1); rows["s"].append(int(S[r][i]))
            rows["r"].extend([r] * len(iu[0]))
            rows["i"].extend(iu[0].astype("int64"))
            rows["j"].extend(iu[1].astype("int64"))
            rows["s"].extend(G[r][iu].astype("int64"))
        yield pd.DataFrame(rows)

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    partials = base.mapInPandas(kernel, schema="r int, i long, j long, s long")
    # materialized: the d^2-sized moment table feeds SIX consumers
    # (two counts, three pair sums, the final row) — without the cut the
    # data-sized Arrow gram pass would recompute per consumer (caught by
    # the r10 10x stress: six identical ~1.2s stages)
    moments = materialize(
        partials.groupBy("r", "i", "j").agg(
            F.sum(F.col("s").cast("decimal(38,0)")).alias("s")
        ),
        "mmd_moments_",
    )

    def _side(r: int, alias: str) -> DataFrame:
        return moments.filter(F.col("r") == r).select(
            "i", "j", F.col("s").alias(alias)
        )
    a, b = _side(0, "sa"), _side(1, "sb")

    # upper-triangle gram cells count twice off-diagonal
    mult = (
        F.when((F.col("i") >= 0) & (F.col("i") != F.col("j")), F.lit(2))
        .otherwise(F.lit(1))
        .cast("decimal(2,0)")
    )

    def _self_pair(x: DataFrame, col: str, tag: str):
        # within-side kernel sums need no join: gg = sum mult*s^2
        return x.agg(
            F.sum(
                F.when(
                    (F.col("i") >= 0) & (F.col("j") >= 0),
                    mult * F.col(col) * F.col(col),
                )
            ).alias(f"gg_{tag}"),
            F.sum(
                F.when(F.col("j") == -1, F.col(col) * F.col(col))
            ).alias(f"ss_{tag}"),
        )

    n_a = moments.filter((F.col("r") == 0) & (F.col("i") == -2)).agg(
        F.coalesce(F.max("s").cast("long"), F.lit(0)).alias("n_left")
    )
    n_b = moments.filter((F.col("r") == 1) & (F.col("i") == -2)).agg(
        F.coalesce(F.max("s").cast("long"), F.lit(0)).alias("n_right")
    )
    paa = _self_pair(a, "sa", "aa")
    pbb = _self_pair(b, "sb", "bb")
    joined_ab = a.join(
        b.withColumnRenamed("i", "__i").withColumnRenamed("j", "__j"),
        (F.col("i") == F.col("__i")) & (F.col("j") == F.col("__j")),
    )
    pab = joined_ab.agg(
        F.sum(
            F.when(
                (F.col("i") >= 0) & (F.col("j") >= 0),
                mult * F.col("sa") * F.col("sb"),
            )
        ).alias("gg_ab"),
        F.sum(
            F.when(F.col("j") == -1, F.col("sa") * F.col("sb"))
        ).alias("ss_ab"),
    )
    row = (
        n_a.crossJoin(F.broadcast(n_b))
        .crossJoin(F.broadcast(paa))
        .crossJoin(F.broadcast(pbb))
        .crossJoin(F.broadcast(pab))
    )
    # the fixed IEEE tree — written token-for-token in the SQL twin:
    # D1 = d*scale*scale (exact partial products), D2 = D1*D1,
    # K_xy = gg/D2 + 2*(ss/D1) + nx*ny, each mean divided by nx*ny
    d1 = F.lit(float(d)) * F.lit(float(scale)) * F.lit(float(scale))
    d2 = d1 * d1

    def k_mean(gg, ss, nx, ny):
        nprod = nx.cast("double") * ny.cast("double")
        ksum = (
            gg.cast("double") / d2
            + F.lit(2.0) * (ss.cast("double") / d1)
            + nprod
        )
        return ksum / nprod

    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    mmd2 = (
        k_mean(F.col("gg_aa"), F.col("ss_aa"), F.col("n_left"), F.col("n_left"))
        + k_mean(F.col("gg_bb"), F.col("ss_bb"), F.col("n_right"), F.col("n_right"))
        - F.lit(2.0)
        * k_mean(F.col("gg_ab"), F.col("ss_ab"), F.col("n_left"), F.col("n_right"))
    )
    return row.select(
        "n_left", "n_right", F.when(valid, mmd2).alias("mmd2")
    )
