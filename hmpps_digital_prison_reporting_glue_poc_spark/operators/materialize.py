"""Storage-backed lineage cut for self-join operators.

A DataFrame self-join scans the producing plan once per join side; when the
producer is a corpus-wide aggregation (MinHash signatures, LSH sketches),
that doubles the most expensive stage of the query. Writing the frame to a
temp parquet and joining the stored table is the same compute-once/store/
join shape a 100 TB pipeline uses for its signature tables — and unlike
executor-side ``persist()`` it never pressures executor memory (local-mode
persist also measured strictly worse; see graph.py notes).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame


# Latest dir per prefix. Long-lived sessions (bench runs every query at
# least twice; a service reusing one SparkSession) would otherwise
# accumulate one dir per materialize() call for the whole process
# lifetime. Each prefix names one operator role and no operator holds two
# live readers of the same prefix at once, so reaping the previous dir
# when the same role re-materializes is safe: by then the earlier query's
# actions have completed and its reader is dead.
_live: dict[str, str] = {}


def _reap_all() -> None:
    for path in _live.values():
        shutil.rmtree(path, ignore_errors=True)
    _live.clear()


atexit.register(_reap_all)


def materialize(df: DataFrame, prefix: str) -> DataFrame:
    """Write ``df`` to a fresh temp parquet dir and return a reader over
    it. The previous dir for the same prefix is removed (lazily-held
    readers over it belong to already-finished queries); whatever remains
    is removed at interpreter exit."""
    path = tempfile.mkdtemp(prefix=prefix)
    df.write.mode("overwrite").parquet(path)
    previous = _live.get(prefix)
    if previous is not None:
        shutil.rmtree(previous, ignore_errors=True)
    _live[prefix] = path
    return df.sparkSession.read.parquet(path)


def estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the frame's optimized plan — file
    sizes at the scan, propagated through filters/projections. Pure
    metadata: no job runs. Used to gate lineage cuts on input scale."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def materialize_if_large(
    df: DataFrame, prefix: str, min_bytes: int = 256 << 20
) -> DataFrame:
    """Lineage-cut ``df`` only when its estimated input size crosses
    ``min_bytes``. A multi-consumer plan re-runs its producer once per
    consumer — at corpus scale the cut saves N-1 full scans and is
    mandatory; at test scale (a few MB) the temp-parquet write JOB is
    itself the dominant cost (r7 controlled A/B on copurchase_lift_items
    at sf0.1: inline 0.97s vs materialized 1.05s, while the write saves
    nothing because the recomputed scan is milliseconds). Catalyst's
    size estimate decides without running a job."""
    if estimated_bytes(df) >= min_bytes:
        return materialize(df, prefix)
    return df
