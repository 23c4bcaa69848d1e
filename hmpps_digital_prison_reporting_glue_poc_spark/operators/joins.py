"""Join strategies for scale: salted joins for skew, bucketed co-located
joins to eliminate the shuffle entirely.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
``salted_join`` is the explicit tool for the pathological case AQE can't
fix — a single hot key whose rows exceed one executor's memory on the
build side of an aggregation-free join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: the (skewed) left side gets a
    deterministic salt in [0, salt_buckets) derived from a hash of the full
    row, and the right side is replicated once per salt value — so a hot
    key's rows spread over ``salt_buckets`` tasks instead of one.

    Deterministic (hash of row content, not rand()) so retries and
    re-executions produce identical partitioning. Result is exactly the
    plain join's result — verified by tests against the unsalted join.

    Use when: one key holds >~1 partition of data AND the right side is too
    big to broadcast. Otherwise prefer the plain join + AQE.

    Only left-preserving joins are legal: the right side is replicated once
    per salt value, so 'right'/'full'/'right_semi' would emit every
    unmatched right row ``salt_buckets`` times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated right "
            "side would duplicate unmatched right rows. Use inner/left/"
            "left_semi/left_anti, or a plain join with AQE skew handling."
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    salted_left = left.withColumn("__salt", salt)
    salted_right = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return salted_left.join(salted_right, on=on + ["__salt"], how=how).drop("__salt")


def bucketed_write(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Write a table bucketed (and optionally sorted) on its join key.
    Two tables bucketed the same way join with ZERO shuffle — the physical
    plan has no Exchange on either side (asserted in tests/test_plans.py).
    At 100 TB this is the difference between re-shuffling the fact table on
    every join and never shuffling it at all."""
    spark = df.sparkSession
    # Drop stale metadata AND any orphaned location (a crashed prior run
    # can leave the directory behind without catalog metadata).
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    loc = jvm.org.apache.hadoop.fs.Path(warehouse, table_name.lower())
    fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)
    writer = df.write.format(fmt).mode("overwrite").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_expr: F.Column | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the columns of the
    most recent right row with the same key and ``right_ts <= left_ts``
    (inclusive), or NULLs when none exists (left-join semantics).

    The reference has no as-of/range joins (SURVEY.md §2.3); this is the
    time-series primitive its event-log model calls for. Implemented as a
    single-shuffle union-sort instead of a range join: tag both sides,
    union them (right payload as one struct, absent left columns
    null-filled), and run ``last(payload, ignorenulls=True)`` over a
    window partitioned by key and ordered by (ts, side) so each left row
    sees the latest preceding right values. Cost is one shuffle of
    |L|+|R| rows and a per-key sort — no O(|L|·|R|) range-condition
    explosion, no skewed inequality join, which is what makes it survive
    a 100 TB event log.

    ``right_cols`` defaults to every non-key, non-ts right column; they
    are emitted with their original names (callers rename beforehand on
    collision). The matched right timestamp is emitted as ``__asof_ts``;
    pass ``tolerance_expr`` (e.g. ``F.expr("interval 1 hour")``) to null
    out matches older than ``left_ts - tolerance``.
    """
    from pyspark.sql import Window

    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on + [right_ts]]
    payload = F.struct(
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn(
            "__payload", F.lit(None).cast(r.schema["__payload"].dataType)
        )
    )
    # Right rows sort before left rows at equal ts (__side 0 < 1) so an
    # exactly-simultaneous right row is visible to the left row.
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_expr is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m.__asof_ts") >= F.col("__ts") - tolerance_expr,
                F.col("__m"),
            ),
        )
    return matched.select(
        *left.columns,
        F.col("__m.__asof_ts").alias("__asof_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: list[str] | None = None,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair — optionally
    key-matched via ``on`` — with ``start_ts <= point_ts <= end_ts``
    (inclusive both ends).

    A naive range join is a broadcast-nested-loop (O(|P|·|I|)) the moment
    the only equi-keys are low-cardinality. This instead *bins* time into
    ``bin_seconds`` buckets: each interval row is exploded to every bucket
    it overlaps, points land in exactly one bucket, and the join becomes an
    equi-join on (keys + bucket) followed by the exact range filter. A
    point's single bucket meets each overlapping interval exactly once, so
    no dedup pass is needed. Replication factor is interval_length /
    bin_seconds — pick a bin width near the typical interval length so
    shuffled volume stays ~2× input at any scale.
    """
    on = on or []
    w = F.lit(bin_seconds) * F.lit(1_000_000).cast("long")
    p = points.withColumn("__bin", F.floor(F.unix_micros(F.col(point_ts)) / w))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_ts)) / w),
                F.floor(F.unix_micros(F.col(end_ts)) / w),
            )
        ),
    )
    return (
        p.join(i, on=on + ["__bin"], how="inner")
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("__bin")
    )


def fuzzy_block_match(
    df: DataFrame,
    name_col: str,
    block_col,
    max_dist: int = 3,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Record linkage by blocking + edit-distance verify: candidate pairs
    are generated ONLY within a block (an equi-join on ``block_col``, e.g.
    a phonetic code, a sort-key prefix, or the name's last token), then
    verified with JVM-side ``levenshtein`` <= ``max_dist`` — the standard
    way to get fuzzy matching without the O(n²) cross join that a naive
    `levenshtein(a, b) < k` theta-join forces.

    Matches on DISTINCT names, weighted by occurrence count: the same
    name appearing r times contributes one vertex with ``n_a``/``n_b``
    frequency, not C(r, 2) trivial pairs — candidate volume scales with
    vocabulary, not corpus rows. ``max_block`` drops blocks larger than
    the cap (the ``max_df`` hot-token convention from ``jaccard_pairs``):
    a degenerate block ("", "smith") otherwise reintroduces the
    quadratic. Pair order is canonical (name_a < name_b). Returns
    (block_key, name_a, name_b, dist, n_a, n_b).
    """
    names = (
        df.select(
            F.col(name_col).alias("__name"),
            F.col(block_col).alias("__blk") if isinstance(block_col, str)
            else block_col.alias("__blk"),
        )
        .groupBy("__blk", "__name")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    if max_block is not None:
        from pyspark.sql import Window

        names = (
            names.withColumn(
                "__bsz",
                F.count(F.lit(1)).over(Window.partitionBy("__blk")),
            )
            .filter(F.col("__bsz") <= max_block)
            .drop("__bsz")
        )
    a = names.select(
        F.col("__blk"),
        F.col("__name").alias("name_a"),
        F.col("__n").alias("n_a"),
    )
    b = names.select(
        F.col("__blk"),
        F.col("__name").alias("name_b"),
        F.col("__n").alias("n_b"),
    )
    return (
        a.join(b, on="__blk", how="inner")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("__blk").alias("block_key"),
            "name_a",
            "name_b",
            F.col("dist").cast("long").alias("dist"),
            "n_a",
            "n_b",
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 3_600_000_000,
    suffix: str = "_r",
) -> DataFrame:
    """Interval x interval OVERLAP join, bucketed — the scale pattern
    that turns the O(|L|x|R|) theta join (a.start <= b.end AND b.start
    <= a.end) into an equi-join: every interval explodes to the integer
    time buckets it covers (``sequence`` — columnar, no Python), the
    join runs on the bucket key, duplicate matches from multi-bucket
    overlaps collapse with one distinct, and the exact overlap predicate
    re-verifies each candidate. Shuffle cost follows bucket occupancy
    (pick ``bucket_us`` ~ the typical interval length), never |L|x|R| —
    the same band-then-verify shape as the LSH/prefix dedup family
    (``interval_join`` handles point-in-interval; this is its
    interval-interval sibling).

    Inclusive overlap semantics: intervals touching at one instant
    match. Returns all left columns plus right columns suffixed.
    """
    lcols = left.columns
    rcols = right.columns
    r = right
    for c in rcols:
        r = r.withColumnRenamed(c, c + suffix)
    rs, re = start_col + suffix, end_col + suffix

    def buckets(s, e):
        lo = (
            (F.col(s) - F.col(s) % F.lit(bucket_us)) / F.lit(bucket_us)
        ).cast("long")
        hi = (
            (F.col(e) - F.col(e) % F.lit(bucket_us)) / F.lit(bucket_us)
        ).cast("long")
        return F.sequence(lo, hi)

    lb = left.withColumn("__b", F.explode(buckets(start_col, end_col)))
    rb = r.withColumn("__b", F.explode(buckets(rs, re)))
    cand = lb.join(rb, "__b").filter(
        (F.col(start_col) <= F.col(re)) & (F.col(rs) <= F.col(end_col))
    )
    return cand.select(*lcols, *[c + suffix for c in rcols]).distinct()
