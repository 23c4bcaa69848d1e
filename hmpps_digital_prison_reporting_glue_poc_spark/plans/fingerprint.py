"""Physical-plan fingerprinting for scale-regression pinning (r5 verdict
task 1).

"A plan you'd want at 100×" is a property of the PHYSICAL plan — how many
shuffles, which join strategies, whether any operator funnels the table
through one task. This module reduces a DataFrame's executed plan to a
small count vector so every query's plan shape can be committed
(``PLAN_PINS.json``) and pytest-asserted against: an Exchange count that
grows, or a CartesianProduct / unpartitioned Window that appears, fails
the suite BEFORE a round's bench or the driver sees it.

The walk uses the py4j plan tree, not string matching: node kinds come
from the SparkPlan class name, global-ness of a Sort from
``SortExec.global``, window partitioning from
``WindowExec.partitionSpec().isEmpty()``, and single-partition exchanges
from ``ShuffleExchangeExec.outputPartitioning`` — precise where a regex
over ``toString()`` is guesswork.

Fingerprints are taken with AQE OFF so the tree is the static Catalyst
choice (deterministic for fixed inputs); AQE can only improve on it at
runtime (skew split, SMJ→BHJ), never worsen the pinned shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# SparkPlan simple class name -> fingerprint bucket
_JOIN_NODES = {
    "BroadcastHashJoinExec": "n_broadcast_hash_join",
    "SortMergeJoinExec": "n_sort_merge_join",
    "ShuffledHashJoinExec": "n_shuffled_hash_join",
    "BroadcastNestedLoopJoinExec": "n_broadcast_nested_loop_join",
    "CartesianProductExec": "n_cartesian",
}

FIELDS = [
    "n_exchange",
    "n_exchange_single",
    "n_exchange_single_on_base",
    "n_broadcast_exchange",
    "n_broadcast_hash_join",
    "n_sort_merge_join",
    "n_shuffled_hash_join",
    "n_broadcast_nested_loop_join",
    "n_cartesian",
    "n_global_sort",
    "n_window",
    "n_window_unpartitioned",
    "n_window_unpartitioned_on_base",
]

# Growth in any of these marks a scale regression (more shuffles, a join
# demotion, a new global funnel). The remaining fields are informational.
REGRESSION_FIELDS = [
    "n_exchange",
    "n_exchange_single",
    "n_sort_merge_join",
    "n_shuffled_hash_join",
    "n_broadcast_nested_loop_join",
    "n_cartesian",
    "n_global_sort",
    "n_window_unpartitioned",
    "n_window_unpartitioned_on_base",
]

# These must be ZERO for every query, pinned or not: a cartesian product,
# a table-spanning window over BASE-TABLE rows, or a single-partition
# Exchange fed by raw base-table rows (vs an already-reduced rollup) is
# never the plan you want at 100 TB. An unpartitioned Window over an
# aggregate output (a bounded rollup — daily revenue, a K×K grid) is fine
# and stays merely regression-guarded via n_window_unpartitioned.
FORBIDDEN_FIELDS = [
    "n_cartesian",
    "n_window_unpartitioned_on_base",
    "n_exchange_single_on_base",
]

# Row-reducing operators: data past one of these is bounded by the
# aggregation's group count / the limit, not by base-table cardinality —
# a single-partition funnel downstream of one is a tiny-rollup sink.
_REDUCER_NODES = {
    "HashAggregateExec",
    "SortAggregateExec",
    "ObjectHashAggregateExec",
    "AggregateInPandasExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
    "TakeOrderedAndProjectExec",
}

# Leaf scans that read table data at input cardinality. LocalTableScan
# (driver-literal frames) is excluded: its size is fixed at plan time.
_BASE_SCAN_NODES = {
    "FileSourceScanExec",
    "BatchScanExec",
    "RowDataSourceScanExec",
    "RDDScanExec",
    "InMemoryTableScanExec",
}


def _walk(jnode):
    yield jnode
    children = jnode.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _funnels_base_rows(jnode) -> bool:
    """Provenance of a single-partition Exchange's input (r6 verdict task
    6): True when a base-table leaf scan is reachable from ``jnode``
    without crossing a row-reducing operator — i.e. the funnel would pull
    input-cardinality rows through ONE task. Broadcast sides are not
    descended into (a broadcast input is bounded by definition: it had to
    fit in one executor to broadcast), and the walk stops at reducers
    (aggregates/limits), past which row count is group-count-bounded."""
    name = jnode.getClass().getSimpleName()
    if name in _REDUCER_NODES or name == "BroadcastExchangeExec":
        return False
    if name in _BASE_SCAN_NODES:
        # a scan of an operators/materialize.py lineage-cut dir whose
        # STORED rows crossed a row-reducer before the write is a stored
        # ROLLUP, not base-table rows (r10 — the scan-audit cuts moved
        # day grids/midrank grids behind temp-parquet scans). Membership
        # is per-path via the materializer's _reduced registry, recorded
        # at write time by the logical mirror of this very walk — an
        # input-cardinality cut (materialize_if_large on a projection /
        # explode, e.g. attr_events_, bm25_toks_) is NOT exempt, so a
        # funnel fed through its scan still trips the FORBIDDEN guards
        # (r11, from the r10 advice).
        from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
            is_reduced_path,
        )

        # toString truncates long locations (maxMetadataStringLength);
        # prefer the untruncated root paths off the file relation
        try:
            loc = jnode.relation().location().rootPaths().mkString(",")
        except Exception:
            loc = jnode.toString()
        if is_reduced_path(loc):
            return False
        return True
    children = jnode.children()
    for i in range(children.size()):
        if _funnels_base_rows(children.apply(i)):
            return True
    return False


def plan_fingerprint_and_scans(
    df: DataFrame, tables: list[str] | None = None
) -> tuple[dict[str, int], dict[str, int]]:
    """ONE tree walk computing both the plan-shape count vector AND the
    per-base-table scan counts (r12: the plan-pin and scan-pin suites
    each rebuilt the query and re-walked the same executed plan — every
    py4j node visit twice, every materialize() producer job twice; one
    walk serves both)."""
    counts = dict.fromkeys(FIELDS, 0)
    scans: dict[str, int] = {}
    root = df._jdf.queryExecution().executedPlan()
    for node in _walk(root):
        name = node.getClass().getSimpleName()
        if name == "ShuffleExchangeExec":
            counts["n_exchange"] += 1
            if node.outputPartitioning().toString() == "SinglePartition":
                counts["n_exchange_single"] += 1
                if _funnels_base_rows(node.child()):
                    counts["n_exchange_single_on_base"] += 1
        elif name == "BroadcastExchangeExec":
            counts["n_broadcast_exchange"] += 1
        elif name in _JOIN_NODES:
            counts[_JOIN_NODES[name]] += 1
        elif name == "SortExec":
            # 'global' is a Python keyword — getattr for the Scala accessor
            if getattr(node, "global")():
                counts["n_global_sort"] += 1
        elif name in ("WindowExec", "WindowInPandasExec"):
            counts["n_window"] += 1
            if node.partitionSpec().isEmpty():
                counts["n_window_unpartitioned"] += 1
                # r7 verdict task 5: provenance — an unpartitioned Window
                # is a single-task funnel only when it consumes raw
                # base-table rows; over an Aggregate output its input is
                # group-count-bounded (same walk as the Exchange check).
                if _funnels_base_rows(node.child()):
                    counts["n_window_unpartitioned_on_base"] += 1
        elif name in _BASE_SCAN_NODES:
            s = node.toString()
            for t in tables or BASE_TABLES:
                if f"{t}.parquet" in s:
                    scans[t] = scans.get(t, 0) + 1
    return counts, scans


def plan_fingerprint(df: DataFrame) -> dict[str, int]:
    """Count vector over the physical plan tree of ``df`` (pre-execution;
    caller should take it with AQE disabled for a static tree)."""
    return plan_fingerprint_and_scans(df)[0]


def fingerprint_query(
    spark: SparkSession, fn, sf_dir: str
) -> dict[str, int]:
    """Fingerprint one queries() callable with AQE pinned off (restored
    after), so the committed counts are the static Catalyst plan."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return plan_fingerprint(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def compare_to_pin(
    fp: dict[str, int], pin: dict[str, int]
) -> list[str]:
    """Regression report: fields where the live plan is WORSE than the pin
    (growth in a REGRESSION_FIELD, or any forbidden node present at all
    when the pin has none). Empty list = no regression. Improvements
    (fewer exchanges than pinned) pass — regenerate pins to lock them in.
    """
    problems = []
    for f in REGRESSION_FIELDS:
        if fp.get(f, 0) > pin.get(f, 0):
            problems.append(
                f"{f}: {pin.get(f, 0)} pinned -> {fp.get(f, 0)} now"
            )
    return problems


# Base tables of the test fixture — the fact/dim parquet files whose scan
# multiplicity the SCAN_PINS.json contract tracks (r10 verdict task 3:
# the one-off scripts/scan_audit.py report, promoted to a pinned gate).
BASE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def base_scan_counts(
    df: DataFrame, tables: list[str] | None = None
) -> dict[str, int]:
    """Count physical SCAN NODES per base table in ``df``'s executed
    plan — the per-plan multiplicity the r10 fact-scan audit measured by
    string-counting. A frame feeding N consumers without a lineage cut
    re-runs its producer N times: milliseconds at test scale, N-1 wasted
    FULL TABLE SCANS at 100 TB. Node-granular (one count per scan
    operator whose location matches ``<table>.parquet``), so a long
    multi-line scan node cannot overcount. Scans of materialized temp
    dirs never match a base-table name and are therefore free."""
    return plan_fingerprint_and_scans(df, tables)[1]


def scan_counts_query(
    spark: SparkSession, fn, sf_dir: str
) -> dict[str, int]:
    """Scan counts for one queries() callable with AQE pinned off, same
    determinism contract as ``fingerprint_query``."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return base_scan_counts(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
