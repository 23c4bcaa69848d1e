"""Write-amplification contract of the partitioned parquet merge fallback
(BASELINE.md bar: merge runtime scales with |updates| + |touched
partitions|, not |target|): after an incremental merge, the files of
UNTOUCHED partitions must be byte-identical and unmoved — same paths,
same mtimes, same bytes. Reference semantics: the incremental twin of the
reference's full-overwrite Delta sink (src/apply_change_log_to_delta.py).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.sources.io import merge_write


def _snapshot(root: str) -> dict[str, tuple[float, int, str]]:
    """{relative parquet file path: (mtime, size, md5)} under root."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            full = os.path.join(dirpath, fn)
            st = os.stat(full)
            with open(full, "rb") as fh:
                digest = hashlib.md5(fh.read()).hexdigest()
            out[os.path.relpath(full, root)] = (st.st_mtime, st.st_size, digest)
    return out


def _rows(spark, path):
    return {
        (r.pk, r.part, r.val)
        for r in spark.read.parquet(path).select("pk", "part", "val").collect()
    }


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(40)],
        "pk long, part int, val string",
    )
    merge_write(spark, base, path, pk=["pk"], partition_by=["part"])

    before = _snapshot(path)
    untouched_before = {
        p: v for p, v in before.items() if not p.startswith("part=1" + os.sep)
    }
    assert untouched_before, "expected files outside the touched partition"

    # updates touch ONLY part=1: one update, one insert
    updates = spark.createDataFrame(
        [(1, 1, "v1-new"), (101, 1, "fresh")],
        "pk long, part int, val string",
    )
    merge_write(spark, updates, path, pk=["pk"], partition_by=["part"])

    after = _snapshot(path)
    for rel, meta in untouched_before.items():
        assert rel in after, f"untouched file vanished: {rel}"
        assert after[rel] == meta, f"untouched file rewritten: {rel}"

    rows = _rows(spark, path)
    assert (1, 1, "v1-new") in rows and (1, 1, "v1") not in rows
    assert (101, 1, "fresh") in rows
    assert len(rows) == 41


def test_merge_partitioned_delete_and_partition_drop(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, 0, "a"), (2, 0, "b"), (3, 1, "c"), (4, 2, "d")],
        "pk long, part int, val string",
    )
    merge_write(spark, base, path, pk=["pk"], partition_by=["part"])
    before = _snapshot(path)
    part2_files = {p: v for p, v in before.items() if p.startswith("part=2" + os.sep)}
    assert part2_files

    # delete pk=3 (the ONLY row of part=1) and update pk=1 in part=0;
    # part=2 untouched
    updates = spark.createDataFrame(
        [(1, 0, "a2", False), (3, 1, None, True)],
        "pk long, part int, val string, is_delete boolean",
    )
    merge_write(
        spark, updates, path, pk=["pk"], delete_col="is_delete",
        partition_by=["part"],
    )

    after = _snapshot(path)
    # emptied partition directory is gone
    assert not any(p.startswith("part=1" + os.sep) for p in after)
    # untouched partition byte-identical
    for rel, meta in part2_files.items():
        assert after.get(rel) == meta
    assert _rows(spark, path) == {(1, 0, "a2"), (2, 0, "b"), (4, 2, "d")}


def test_merge_partitioned_scan_prunes_partitions(spark, tmp_path):
    """The target-side scan of the merge must carry partition filters —
    i.e. the plan reads only touched partition directories."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, i % 8, f"v{i}") for i in range(80)],
        "pk long, part int, val string",
    )
    merge_write(spark, base, path, pk=["pk"], partition_by=["part"])

    target = spark.read.parquet(path).filter(F.col("part") == 3)
    plan = target._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # pruned scan reads 1 of 8 partition dirs
    scanned = target.select(F.input_file_name()).distinct().collect()
    dirs = {os.path.dirname(r[0]) for r in scanned}
    assert len(dirs) == 1 and list(dirs)[0].endswith("part=3")


def test_merge_partitioned_null_partition_value(spark, tmp_path):
    """ADVICE r5 (medium): a NULL partition value lands in
    __HIVE_DEFAULT_PARTITION__; the merge slice must include that
    partition's pre-existing rows (eqNullSafe, not ==) or dynamic
    overwrite silently drops them."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, None, "keep-null"), (2, None, "update-me"), (3, "a", "keep-a")],
        "pk long, part string, val string",
    )
    merge_write(spark, base, path, pk=["pk"], partition_by=["part"])
    assert _rows(spark, path) == {
        (1, None, "keep-null"), (2, None, "update-me"), (3, "a", "keep-a")
    }

    # update ONLY pk=2 in the null partition: pk=1 must survive
    updates = spark.createDataFrame(
        [(2, None, "updated")], "pk long, part string, val string"
    )
    merge_write(spark, updates, path, pk=["pk"], partition_by=["part"])
    assert _rows(spark, path) == {
        (1, None, "keep-null"), (2, None, "updated"), (3, "a", "keep-a")
    }


def test_merge_partitioned_null_partition_drop(spark, tmp_path):
    """Deleting the last row of the NULL partition must remove the
    __HIVE_DEFAULT_PARTITION__ directory (the drop loop's c=v path)."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, None, "only-null"), (2, "a", "keep-a")],
        "pk long, part string, val string",
    )
    merge_write(spark, base, path, pk=["pk"], partition_by=["part"])

    updates = spark.createDataFrame(
        [(1, None, None, True)],
        "pk long, part string, val string, is_delete boolean",
    )
    merge_write(
        spark, updates, path, pk=["pk"], delete_col="is_delete",
        partition_by=["part"],
    )
    assert _rows(spark, path) == {(2, "a", "keep-a")}
    assert not any(
        "__HIVE_DEFAULT_PARTITION__" in p for p in _snapshot(path)
    )
