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


def materialize(df: DataFrame, prefix: str) -> DataFrame:
    """Write ``df`` to a fresh temp parquet dir and return a reader over
    it. Files are removed at interpreter exit (callers hold lazy readers
    over them, so eager cleanup would break downstream actions)."""
    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
