"""Replay the reference's OWN test fixtures through this engine and pin the
reference's exact golden values — the strongest available proof of hash and
merge-semantics parity (a migrating user's first question).

Goldens come from the reference test suite (read-only fixtures at
/root/reference/tests/data/):

- Murmur3 struct-hash goldens: reference
  tests/test_1_gg_logs_to_parquet.py:23-34 pins after_hash=-1007943897 for
  offender 150's insert and before_hash=-852450643 for offender 140's
  delete over the kinesis JSON fixtures.
- Event-log union count 3897: reference tests/test_1:56-57 (the parquet
  event log carries the full union of inserts/updates/deletes).
- Merge-stage goldens: reference tests/test_2_apply_change_log_delta.py:
  110-192 — 1951 distinct event keys, offender 149's U event maps to
  last_name 'Lightfoot', offender 144 folds to ('Byrne', 'Mr', action D)
  and is therefore absent after apply.
- Domain-join goldens: reference tests/test_4_apply_to_domains.py:57-88 —
  four exact rows out of the curated-join Resolution SQL.

These tests use the same schema-inference JSON read the reference used
(field order is what the Murmur3 struct hash depends on); the engine's
production path reads schema-first with the identical field order.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.catalog import Catalog, TableSpec
from hmpps_digital_prison_reporting_glue_poc_spark.operators.cdc import (
    ingest_events,
    latest_event_per_key,
    map_events_to_target,
    merge_cdc,
)
from hmpps_digital_prison_reporting_glue_poc_spark.plans.domains import run_domains

REF = "/root/reference/tests/data"
KINESIS_JSON = f"{REF}/dummy/kinesis/transac/json/oms_owner/offenders"
EVENT_LOG = f"{REF}/dummy/kinesis/transac/parquet/oms_owner/offenders/"
BASE_TABLE = f"{REF}/dummy/database/oms_owner/offenders/"
CURATED = f"{REF}/dummy/database/oms_owner"
DOMAIN_DEFS = f"{REF}/dummy/database/domain_definitions/"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not present"
)


def test_murmur3_hash_goldens_match_reference(spark):
    # reference tests/test_1_gg_logs_to_parquet.py:23-34
    ins = ingest_events(spark.read.json(KINESIS_JSON + "/inserts/"))
    assert ins.filter(F.col("after.OFFENDER_ID") == 150).select(
        "after_hash"
    ).first()[0] == -1007943897

    dele = ingest_events(spark.read.json(KINESIS_JSON + "/deletes/"))
    assert dele.filter(F.col("before.OFFENDER_ID") == 140).select(
        "before_hash"
    ).first()[0] == -852450643


def test_demo_fixture_hash_chain(spark):
    # demo/{insert,update,delete}.json: one offender (4242) through the full
    # I -> U -> D lifecycle. The chain invariant the reference's disabled
    # hash-chain check relies on (dev/_read_delta_table.py:343-369): each
    # event's before_hash equals the previous event's after_hash.
    def read(name):
        return ingest_events(
            spark.read.option("multiLine", "true").json(f"{REF}/demo/{name}.json")
        )

    ins, upd, dele = read("insert"), read("update"), read("delete")
    ins_after = ins.select("after_hash").first()[0]
    upd_before, upd_after = upd.select("before_hash", "after_hash").first()
    del_before = dele.select("before_hash").first()[0]
    assert ins_after == upd_before == -1600109591
    assert upd_after == del_before == -123437881


def test_event_log_and_merge_goldens_match_reference(spark):
    # reference tests/test_1:56-57 and tests/test_2:110-192
    logs = spark.read.parquet(EVENT_LOG)
    target = spark.read.parquet(BASE_TABLE)
    assert logs.count() == 3897  # full I/U/D union
    assert [r[0] for r in logs.select("table").distinct().collect()] == [
        "OMS_OWNER.OFFENDERS"
    ]

    mapped = map_events_to_target(logs, T.StructType(list(target.schema.fields)))
    assert mapped.select("offender_id").distinct().count() == 1951

    # mapper golden: offender 149's U event carries last_name 'Lightfoot'
    assert (
        mapped.filter(
            (F.col("offender_id") == 149) & (F.col("event_type") == "U")
        )
        .select("last_name")
        .first()[0]
        == "Lightfoot"
    )

    # fold golden: offender 144's final event is ('Byrne', 'Mr', D) ...
    final_144 = (
        latest_event_per_key(mapped, ["offender_id"])
        .filter(F.col("offender_id") == 144)
        .select("last_name", "title", "event_type")
        .first()
    )
    assert tuple(final_144) == ("Byrne", "Mr", "D")

    # ... so after the merge the row is gone, and 149 holds Lightfoot.
    merged = merge_cdc(target, mapped, ["offender_id"])
    assert merged.filter(F.col("offender_id") == 144).count() == 0
    assert (
        merged.filter(F.col("offender_id") == 149).select("last_name").first()[0]
        == "Lightfoot"
    )


def test_domain_join_goldens_match_reference(spark):
    # reference tests/test_4_apply_to_domains.py:57-88
    cat = Catalog(
        {
            "offenders": TableSpec(
                name="offenders",
                path=f"{CURATED}/offenders_curated/",
                format="parquet",
                pk=["offender_id"],
            ),
            "offender_bookings": TableSpec(
                name="offender_bookings",
                path=f"{CURATED}/offender_bookings_curated/",
                format="parquet",
                pk=["offender_book_id"],
            ),
        }
    )
    defs_df = spark.read.option("header", "true").csv(DOMAIN_DEFS)
    out = run_domains(
        spark, defs_df, ["offender_bookings", "anottable"], cat, process_id=777
    )
    assert sorted(out) == ["domain1_off_book", "domain2_book_off"]

    d2 = out["domain2_book_off"]
    assert tuple(
        d2.filter(F.col("offender_book_id") == 93)
        .select("offender_book_id", "offender_name", "in_out_status")
        .first()
    ) == (93, "David Martin", "OUT")
    assert tuple(
        d2.filter(F.col("offender_book_id") == 88)
        .select("offender_book_id", "offender_name", "in_out_status")
        .first()
    ) == (88, "Patrick Murphy", "IN")

    d1 = out["domain1_off_book"]
    assert tuple(
        d1.filter(F.col("offender_id") == 9)
        .select(
            "offender_name",
            "in_out_status",
            "booking_begin_date",
            "booking_end_date",
        )
        .first()
    ) == (
        "David Martin",
        "OUT",
        datetime.date(2019, 5, 7),
        datetime.date(2022, 9, 24),
    )
    assert tuple(
        d1.filter(F.col("offender_id") == 4)
        .select(
            "offender_name",
            "in_out_status",
            "booking_begin_date",
            "booking_end_date",
        )
        .first()
    ) == ("Patrick Murphy", "IN", datetime.date(2011, 9, 29), None)
    assert d1.select("process_id").first()[0] == 777
