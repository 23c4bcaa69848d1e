"""Wave 90: FK orphan and PK uniqueness audits — planted-violation goldens."""

from __future__ import annotations

from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    fk_orphan_audit,
    pk_uniqueness_audit,
)


def test_fk_orphans_and_childless(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    row = fk_orphan_audit([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert row.edge == "c->p"
    assert row.n_child == 5
    assert row.n_null_fk == 1  # NULL FK is unknown, not an orphan
    assert row.n_orphans == 1  # fk=99
    assert row.n_parents == 3
    assert row.n_childless == 1  # pk=30


def test_fk_clean_edge_zero_violations(spark):
    child = spark.createDataFrame([(1, 10), (2, 20)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = fk_orphan_audit([("e", child, "fk", parent, "pk")]).collect()[0]
    assert (row.n_orphans, row.n_childless, row.n_null_fk) == (0, 0, 0)


def test_fk_multiple_edges_one_row_each(spark):
    a = spark.createDataFrame([(1, 10)], "id long, fk long")
    p = spark.createDataFrame([(10,)], "pk long")
    out = fk_orphan_audit(
        [("e1", a, "fk", p, "pk"), ("e2", a, "fk", p, "pk")]
    ).collect()
    assert sorted(r.edge for r in out) == ["e1", "e2"]


def test_pk_uniqueness_detects_dups_and_nulls(spark):
    t = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d"), (None, "e"), (3, "f")],
        "k long, v string",
    )
    row = pk_uniqueness_audit([("t", t, ["k"])]).collect()[0]
    assert row.n_rows == 6
    assert row.n_keys == 4  # 1, 2, 3, NULL
    assert row.n_dup_keys == 2  # k=1 (x2) and NULL (x2)
    assert row.max_multiplicity == 2
    assert row.n_null_keys == 2


def test_pk_composite_key(spark):
    t = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 2), (2, 1)], "a long, b long"
    )
    row = pk_uniqueness_audit([("t", t, ["a", "b"])]).collect()[0]
    assert row.n_keys == 3
    assert row.n_dup_keys == 1  # (1,2) twice
    assert row.max_multiplicity == 2
    assert row.n_null_keys == 0
