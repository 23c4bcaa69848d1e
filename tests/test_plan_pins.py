"""Physical-plan regression pins (r5 verdict task 1): every queries()
entry's plan shape — Exchange count, join strategies, global funnels — is
committed in PLAN_PINS.json; this suite recomputes each fingerprint and
fails on any regression (Exchange growth, BHJ→SMJ demotion, a new
CartesianProduct / unpartitioned Window / global Sort).

Improvements (fewer shuffles than pinned) pass — lock them in with
``python scripts/gen_plan_pins.py``. New queries without a pin fail until
pinned, so the pin file can't silently fall behind the registry.
"""

from __future__ import annotations

import json
import os

import pytest

import __spark_entry__ as entry_mod
from hmpps_digital_prison_reporting_glue_poc_spark.plans.fingerprint import (
    FORBIDDEN_FIELDS,
    compare_to_pin,
)

SF_DIR = os.environ.get("PLAN_PIN_SF_DIR", "/root/testdata/sf0.001")
PIN_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_PINS.json")

QUERIES = entry_mod.queries()
with open(PIN_PATH) as _fh:
    PINS = json.load(_fh)


def test_every_query_is_pinned():
    missing = sorted(set(QUERIES) - set(PINS))
    assert not missing, (
        f"queries without a plan pin (run scripts/gen_plan_pins.py): {missing}"
    )


def test_no_stale_pins():
    stale = sorted(set(PINS) - set(QUERIES))
    assert not stale, f"pins for removed queries: {stale}"


def test_single_partition_exchanges_consume_rollups_registry_wide():
    """r6 verdict task 6: every pinned single-partition Exchange must be a
    tiny-rollup sink (its input crosses an aggregate/limit before the
    funnel), never a base-table-row funnel. The provenance field must be
    PRESENT (regenerated pins) and ZERO for all queries."""
    missing = sorted(
        n for n, p in PINS.items() if "n_exchange_single_on_base" not in p
    )
    assert not missing, (
        f"pins missing provenance field (regenerate): {missing[:10]}..."
    )
    offenders = {
        n: p["n_exchange_single_on_base"]
        for n, p in PINS.items()
        if p["n_exchange_single_on_base"] > 0
    }
    assert not offenders, (
        f"single-partition Exchange fed by base-table rows: {offenders}"
    )


def test_unpartitioned_windows_consume_rollups_registry_wide():
    """r7 verdict task 5: every pinned unpartitioned Window must run over a
    bounded rollup (its input crosses an aggregate/limit), never raw
    base-table rows — the same provenance gate n_exchange_single_on_base
    applies to exchanges. Field must be PRESENT and ZERO for all queries."""
    missing = sorted(
        n for n, p in PINS.items() if "n_window_unpartitioned_on_base" not in p
    )
    assert not missing, (
        f"pins missing window-provenance field (regenerate): {missing[:10]}..."
    )
    offenders = {
        n: p["n_window_unpartitioned_on_base"]
        for n, p in PINS.items()
        if p["n_window_unpartitioned_on_base"] > 0
    }
    assert not offenders, (
        f"unpartitioned Window fed by base-table rows: {offenders}"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) & set(PINS)))
def test_plan_shape_not_regressed(spark, pin_probe, name):
    # shared probe: ONE query build + ONE plan walk serves this suite and
    # test_scan_pins.py (r12 — the driver-verify wall-clock budget)
    fp = pin_probe(name, QUERIES[name], SF_DIR)[0]
    pin = PINS[name]
    problems = compare_to_pin(fp, pin)
    assert not problems, f"{name} plan regressed: {problems}; full={fp}"
    for f in FORBIDDEN_FIELDS:
        # forbidden nodes must never appear unless the pin itself records
        # one (in which case compare_to_pin already guards growth)
        assert fp.get(f, 0) <= pin.get(f, 0), (
            f"{name}: forbidden plan node {f}={fp[f]}"
        )
