"""Property-based CDC merge test: for arbitrary event sequences, the
distributed merge must equal a trivial sequential Python model
(last-writer-wins in pos order, delete drops, insert revives)."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.cdc import merge_cdc

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("pk", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("admin_gg_pos", T.StringType()),
    ]
)

# an event: (pk in a small keyspace, op, payload)
EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.sampled_from(["I", "U", "D"]),
        st.text(alphabet="abc", min_size=0, max_size=3),
    ),
    min_size=0,
    max_size=12,
)
TARGET_KEYS = st.sets(st.integers(min_value=0, max_value=4), max_size=3)


def _model(target_keys, events):
    """Sequential reference model of merge semantics."""
    state = {k: f"base_{k}" for k in target_keys}
    last = {}
    for pos, (pk, op, val) in enumerate(events):
        last[pk] = (pos, op, val)
    out = dict(state)
    for pk, (pos, op, val) in last.items():
        if op == "D":
            out.pop(pk, None)
        else:
            out[pk] = val
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(target_keys=TARGET_KEYS, events=EVENTS)
def test_merge_matches_sequential_model(spark, target_keys, events):
    target = spark.createDataFrame(
        [(k, f"base_{k}", "I", "") for k in sorted(target_keys)],
        schema=TARGET_SCHEMA,
    )
    mapped = spark.createDataFrame(
        [
            (pk, val, op, f"{pos:020d}")
            for pos, (pk, op, val) in enumerate(events)
        ],
        schema=TARGET_SCHEMA,
    )
    got = {
        r.pk: r.val
        for r in merge_cdc(target, mapped, pk=["pk"]).collect()
    }
    assert got == _model(target_keys, events)
