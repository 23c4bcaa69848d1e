"""Robustness: corrupt-record quarantine, schema evolution on the merge
sink, composite primary keys, catalog schema publish."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.catalog import Catalog, TableSpec
from hmpps_digital_prison_reporting_glue_poc_spark.operators.cdc import merge_cdc
from hmpps_digital_prison_reporting_glue_poc_spark.sources.io import (
    merge_write,
    read_cdc_json,
    split_corrupt,
)

ROW_SCHEMA = T.StructType(
    [
        T.StructField("OFFENDER_ID", T.LongType()),
        T.StructField("LAST_NAME", T.StringType()),
    ]
)


def test_corrupt_records_quarantined_not_dropped(spark, tmp_path):
    path = os.path.join(str(tmp_path), "mixed.json")
    with open(path, "w") as f:
        f.write(json.dumps({
            "table": "S.T", "op_type": "I", "op_ts": "t", "current_ts": "c",
            "pos": "1", "after": {"OFFENDER_ID": 1, "LAST_NAME": "ok"},
        }) + "\n")
        f.write('{"table": "S.T", "op_type": "I", BROKEN JSON\n')
        f.write("not json at all\n")
    raw = read_cdc_json(spark, path, ROW_SCHEMA, quarantine=True)
    clean, corrupt = split_corrupt(raw)
    assert clean.count() == 1
    assert clean.first().after.LAST_NAME == "ok"
    bad = [r[0] for r in corrupt.collect()]
    assert len(bad) == 2 and "not json at all" in bad


def test_merge_write_schema_evolution(spark, tmp_path):
    """A batch carrying a new column evolves the parquet target (Delta
    mergeSchema semantics, reference src/apply_to_domains.py:223-224)."""
    path = os.path.join(str(tmp_path), "t")
    v1 = spark.createDataFrame([(1, "a")], "pk long, val string")
    merge_write(spark, v1, path, pk=["pk"])
    v2 = spark.createDataFrame(
        [(2, "b", "extra")], "pk long, val string, new_col string"
    )
    merge_write(spark, v2, path, pk=["pk"])
    out = spark.read.parquet(path)
    assert set(out.columns) == {"pk", "val", "new_col"}
    rows = {r.pk: (r.val, r.new_col) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", "extra")}


def test_merge_cdc_composite_primary_key(spark):
    schema = "pk1 long, pk2 string, val string, event_type string, admin_gg_pos string"
    target = spark.createDataFrame(
        [(1, "a", "old", "I", ""), (1, "b", "keep", "I", "")], schema
    )
    events = spark.createDataFrame(
        [
            (1, "a", "new", "U", "00000000000000000001"),
            (2, "a", "ins", "I", "00000000000000000002"),
            (1, "b", None, "D", "00000000000000000003"),
        ],
        schema,
    )
    final = merge_cdc(target, events, pk=["pk1", "pk2"])
    rows = {(r.pk1, r.pk2): r.val for r in final.collect()}
    assert rows == {(1, "a"): "new", (2, "a"): "ins"}


def test_catalog_schema_publish_roundtrip(spark, tmp_path):
    cat = Catalog()
    cat.register(TableSpec("t1", os.path.join(str(tmp_path), "t1")))
    df = spark.range(3).select(F.col("id"), F.lit("x").alias("name"))
    cat.publish_schema("t1", df.schema)
    meta_path = os.path.join(str(tmp_path), "cat.json")
    cat.save(meta_path)
    loaded = Catalog.load(meta_path)
    schema = loaded.published_schema("t1")
    assert [f.name for f in schema.fields] == ["id", "name"]
    assert isinstance(schema.fields[1].dataType, T.StringType)
    assert loaded.published_schema("t1") == df.schema
