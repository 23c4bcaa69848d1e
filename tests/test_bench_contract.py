"""The driver parses bench.py's FINAL stdout line as JSON from a 2000-char
tail capture. Round 1 lost the line head (76 queries > 2000 chars) and
recorded "parsed": null — these tests pin the contract: always valid JSON,
always short enough to survive the tail window, total covers every query.
"""

from __future__ import annotations

import json

import bench


def _fake_timings(n: int) -> dict[str, float]:
    return {f"query_with_a_long_name_{i:03d}": 0.001 * (i + 1) for i in range(n)}


def test_line_is_valid_json_and_fits_tail_window():
    for n in (1, 10, 76, 200):
        line = bench.format_bench_line(_fake_timings(n), sf=0.1)
        assert len(line) <= bench.MAX_LINE_CHARS < 2000
        parsed = json.loads(line)
        assert parsed["metric"] == "headline_queries_total"
        assert parsed["unit"] == "sec"
        assert parsed["sf"] == 0.1
        assert parsed["n_queries"] == n


def test_total_covers_all_queries_even_when_truncated():
    timings = _fake_timings(200)
    line = bench.format_bench_line(timings, sf=0.1)
    parsed = json.loads(line)
    assert parsed["value"] == round(sum(timings.values()), 3)
    # Truncation keeps the SLOWEST queries.
    if len(parsed["queries"]) < len(timings):
        kept_min = min(parsed["queries"].values())
        dropped = set(timings) - set(parsed["queries"])
        assert all(round(timings[q], 2) <= kept_min for q in dropped)


def test_drift_names_survive_into_contract_line():
    """r10 verdict task 4: the committed artifact must NAME its drifted
    queries — BENCH_r10.json said n_drift: 1 and could not say which
    (the BENCH_DRIFT report line falls outside the driver's 2000-char
    tail capture). The names ride the noise dict into the final line,
    bounded, without blowing the tail window."""
    noise = {
        "n_drift": 20,
        "drift": [f"some_quite_long_query_name_{i:02d}" for i in range(20)],
    }
    line = bench.format_bench_line(_fake_timings(200), sf=0.1, noise=noise)
    assert len(line) <= bench.MAX_LINE_CHARS < 2000
    parsed = json.loads(line)
    assert parsed["drift"] == noise["drift"]


def test_bench_query_list_is_resolvable():
    import __spark_entry__ as entry_mod

    declared = entry_mod.queries()
    missing = [q for q in bench.BENCH_QUERIES if q not in declared]
    assert not missing, f"bench names not in queries(): {missing}"


def test_every_query_benched_or_documented_excluded():
    """r7 verdict task 2: BENCH_QUERIES and BENCH_EXCLUDED partition the
    full queries() registry — every query either gets a kernel-time pin or
    sits on an explicit, reasoned exclusion list. An unbenched query with
    no recorded rationale (the r6 invisible-kernel-regression hole) fails
    here."""
    import collections

    import __spark_entry__ as entry_mod

    declared = set(entry_mod.queries())
    benched = set(bench.BENCH_QUERIES)
    excluded = set(bench.BENCH_EXCLUDED)
    dups = [n for n, c in collections.Counter(bench.BENCH_QUERIES).items() if c > 1]
    assert not dups, f"duplicate bench names: {dups}"
    assert not benched & excluded, f"both benched and excluded: {benched & excluded}"
    uncovered = sorted(declared - benched - excluded)
    assert not uncovered, (
        f"queries neither benched nor on the documented exclusion list: {uncovered}"
    )
    stale = sorted((benched | excluded) - declared)
    assert not stale, f"bench/exclusion names not in queries(): {stale}"
    for name, reason in bench.BENCH_EXCLUDED.items():
        assert len(reason) > 20, f"exclusion reason for {name} too thin"


def test_every_benched_query_has_a_pin():
    """Kernel-time pins (BENCH_PINS.json) must cover the full bench set —
    a benched-but-unpinned query reports no drift signal."""
    import json
    import os

    with open(os.path.join(os.path.dirname(bench.__file__), "BENCH_PINS.json")) as fh:
        pins = json.load(fh)
    ratios = pins.get("ratios", pins)
    missing = sorted(set(bench.BENCH_QUERIES) - set(ratios))
    assert not missing, f"benched queries without a time pin: {missing}"


def test_uniform_suspect_rule():
    """r8 verdict task 3: run_inflation > 1.3 persisting across two
    consecutive runs with a flat cross-sentinel ratio flags a uniform
    (whole-run) regression that the median-correction would otherwise
    suppress; every other combination stays quiet."""
    pin = 3.9
    flat_prev = {"run_inflation": 1.5, "cross_sentinel": 3.8}
    # two consecutive inflated runs, cross ratio flat on both -> suspect
    assert bench.uniform_suspect(1.6, 3.95, pin, flat_prev)
    # single inflated run (no corroborating previous run) -> host noise
    assert not bench.uniform_suspect(1.6, 3.95, pin, None)
    assert not bench.uniform_suspect(
        1.6, 3.95, pin, {"run_inflation": 1.0, "cross_sentinel": 3.9}
    )
    # inflation under threshold -> quiet
    assert not bench.uniform_suspect(1.2, 3.9, pin, flat_prev)
    # cross ratio shifted beyond tolerance -> the slowdown has a SHAPE
    # (one plan family), so per-query drift flags own it, not this rule
    assert not bench.uniform_suspect(1.6, 5.2, pin, flat_prev)
    assert not bench.uniform_suspect(1.6, 2.5, pin, flat_prev)
    # previous run's cross ratio shifted -> not the same signature twice
    assert not bench.uniform_suspect(
        1.6, 3.9, pin, {"run_inflation": 1.6, "cross_sentinel": 6.0}
    )
    # no pin on record -> rule disabled (never crashes)
    assert not bench.uniform_suspect(1.6, 3.9, 0.0, flat_prev)


def test_sentinel2_pin_committed():
    import json
    import os

    with open(os.path.join(os.path.dirname(bench.__file__), "BENCH_PINS.json")) as fh:
        pins = json.load(fh)
    assert pins["sentinel2_query"] == bench.SENTINEL2_QUERY
    assert pins["cross_sentinel_ratio"] > 0
    assert bench.SENTINEL2_QUERY in bench.BENCH_QUERIES
    assert bench.SENTINEL_QUERY in bench.BENCH_QUERIES
