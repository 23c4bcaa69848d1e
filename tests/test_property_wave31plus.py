"""Property-based tests (hypothesis) for the round-6 wave 31-35
operators: randomized inputs against brute-force Python models."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hmpps_digital_prison_reporting_glue_poc_spark.operators import multimodal as mm
from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import line_dedup
from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import (
    curriculum_interleave,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.topk import (
    grid_quantile_state,
    grid_quantiles,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_line = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_doc = st.lists(_line, min_size=1, max_size=5).map("\n".join)


@given(texts=st.lists(_doc, min_size=1, max_size=5))
@settings(**_SETTINGS)
def test_line_dedup_each_line_survives_exactly_once(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r.doc_id: r for r in line_dedup(df).collect()}
    # every distinct line of the corpus appears exactly once in the union
    survivors = [
        ln
        for r in out.values()
        if r.text
        for ln in r.text.split("\n")
    ]
    all_lines = {ln for t in texts for ln in t.split("\n")}
    assert sorted(survivors) == sorted(all_lines)
    # n_lines preserved; n_kept sums to the distinct-line count
    assert sum(r.n_lines for r in out.values()) == sum(
        len(t.split("\n")) for t in texts
    )
    assert sum(r.n_kept for r in out.values()) == len(all_lines)
    # first-occurrence rule: doc 0 keeps its full prefix of fresh lines
    seen = set()
    expect0 = []
    for ln in texts[0].split("\n"):
        if ln not in seen:
            expect0.append(ln)
            seen.add(ln)
    assert out[0].text == "\n".join(expect0)


@given(
    n=st.integers(min_value=1, max_value=23),
    k=st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_curriculum_interleave_is_gapfree_permutation(spark, n, k):
    df = spark.createDataFrame(
        [(i, float((i * 7) % 11)) for i in range(n)], "doc_id long, q double"
    )
    out = curriculum_interleave(df, "doc_id", "q", n_bins=k).collect()
    assert sorted(r.pos for r in out) == list(range(n))
    assert {r.bin for r in out} <= set(range(k))
    # a full window of k consecutive positions holds k distinct bins
    if n >= k:
        window = {r.bin for r in out if r.pos < k}
        assert len(window) == k


@given(
    vals=st.lists(
        st.floats(min_value=-50, max_value=50).map(lambda v: round(v, 2)),
        min_size=1,
        max_size=30,
    ),
    q=st.sampled_from([0.1, 0.5, 0.9, 1.0]),
)
@settings(**_SETTINGS)
def test_grid_quantiles_match_type1_model(spark, vals, q):
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {
        r.q: r.value
        for r in grid_quantiles(
            grid_quantile_state(df, "value"), [q]
        ).collect()
    }
    # brute-force type-1 quantile on the quantized multiset
    grid = sorted(round(v * 100) for v in vals)
    target = math.ceil(q * len(grid))
    expect = grid[target - 1] / 100.0
    assert got[q] == expect


@given(payload=st.binary(min_size=0, max_size=64))
@settings(max_examples=25, deadline=None)
def test_wav_roundtrip_property(payload):
    meta = mm.parse_wav(mm.build_wav(payload, sample_rate=8000, bits=8))
    assert meta["pcm"] == payload
    assert meta["n_samples"] == len(payload)
