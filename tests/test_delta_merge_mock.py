"""Execute merge_write's Delta MERGE branch with a recording DeltaTable stub.

delta-spark cannot be installed in this container (round-3 re-attempt:
``pip install delta-spark`` fails with ``NewConnectionError ... Name or
service not known`` — no network route to any index; see COVERAGE.md S4).
The logical anti-join+union fallback is what the rest of the suite tests;
this file drives the otherwise-dead MERGE wiring (sources/io.py
``merge_write``, Delta branch) so its condition strings, clause choice and
``execute()`` call are exercised and pinned.

The stub mirrors the delta-spark builder API (DeltaTable.forPath ->
.alias -> .merge -> whenMatched*/whenNotMatched* -> execute) and records
every call; semantics of MERGE itself belong to Delta Lake, so only the
wiring — what this repo is responsible for — is asserted.
"""

from __future__ import annotations

import pytest

import hmpps_digital_prison_reporting_glue_poc_spark.sources.io as io_mod


class _RecordingBuilder:
    def __init__(self, log: list):
        self._log = log

    def whenMatchedDelete(self, condition=None):
        self._log.append(("whenMatchedDelete", condition))
        return self

    def whenMatchedUpdateAll(self, condition=None):
        self._log.append(("whenMatchedUpdateAll", condition))
        return self

    def whenNotMatchedInsertAll(self, condition=None):
        self._log.append(("whenNotMatchedInsertAll", condition))
        return self

    def execute(self):
        self._log.append(("execute", None))


class _RecordingDeltaTable:
    """Class-level log: merge_write touches only classmethod-style entry
    points (isDeltaTable, forPath), so the stub keeps state on the class."""

    log: list = []

    @classmethod
    def reset(cls):
        cls.log = []

    @classmethod
    def isDeltaTable(cls, spark, path):
        cls.log.append(("isDeltaTable", path))
        return True

    @classmethod
    def forPath(cls, spark, path):
        cls.log.append(("forPath", path))
        return cls._Aliased(cls.log)

    class _Aliased:
        def __init__(self, log):
            self._log = log

        def alias(self, name):
            self._log.append(("alias", name))
            return self

        def merge(self, updates, cond):
            self._log.append(("merge", cond))
            return _RecordingBuilder(self._log)


@pytest.fixture()
def delta_stub(monkeypatch):
    _RecordingDeltaTable.reset()
    monkeypatch.setattr(io_mod, "DeltaTable", _RecordingDeltaTable)
    monkeypatch.setattr(io_mod, "HAS_DELTA", True)
    return _RecordingDeltaTable


def _ops(log):
    return [op for op, _ in log]


def test_merge_branch_upsert_wiring(spark, delta_stub, tmp_path):
    updates = spark.createDataFrame(
        [(1, "a"), (2, "b")], "pk BIGINT, payload STRING"
    )
    io_mod.merge_write(spark, updates, str(tmp_path / "t"), pk=["pk"])
    log = delta_stub.log
    assert _ops(log) == [
        "isDeltaTable",
        "forPath",
        "alias",
        "merge",
        "whenMatchedUpdateAll",
        "whenNotMatchedInsertAll",
        "execute",
    ]
    assert dict(log)["merge"] == "t.pk = u.pk"
    # no delete_col -> unconditional clauses
    assert dict(log)["whenMatchedUpdateAll"] is None
    assert dict(log)["whenNotMatchedInsertAll"] is None
    # the Delta branch must NOT fall through to the parquet fallback
    assert not (tmp_path / "t").exists()


def test_merge_branch_delete_wiring_composite_pk(spark, delta_stub, tmp_path):
    updates = spark.createDataFrame(
        [(1, "x", "a", False), (2, "y", "b", True)],
        "pk BIGINT, pk2 STRING, payload STRING, is_delete BOOLEAN",
    )
    io_mod.merge_write(
        spark,
        updates,
        str(tmp_path / "t"),
        pk=["pk", "pk2"],
        delete_col="is_delete",
    )
    log = delta_stub.log
    assert _ops(log) == [
        "isDeltaTable",
        "forPath",
        "alias",
        "merge",
        "whenMatchedDelete",
        "whenMatchedUpdateAll",
        "whenNotMatchedInsertAll",
        "execute",
    ]
    by_op = dict(log)
    assert by_op["merge"] == "t.pk = u.pk AND t.pk2 = u.pk2"
    # deletes fire on the flag; upserts/inserts are guarded off it
    assert by_op["whenMatchedDelete"] == "u.is_delete"
    assert by_op["whenMatchedUpdateAll"] == "NOT u.is_delete"
    assert by_op["whenNotMatchedInsertAll"] == "NOT u.is_delete"
    assert not (tmp_path / "t").exists()
