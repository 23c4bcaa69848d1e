"""Regenerate SCAN_PINS.json — committed per-query BASE-TABLE SCAN
COUNTS, the r10 fact-scan audit promoted to a pinned contract (r10
verdict task 3).

A frame feeding N consumers without a lineage cut re-runs its producer
once per consumer: invisible at sf0.1 wall-clock, a multiplicative
full-scan waste at 100 TB (markov_stationary_events carried 56 scans
before the r10 sweep). tests/test_scan_pins.py fails on any INCREASE
over these pins, so a new multi-consumer frame without a cut can no
longer merge silently. Queries legitimately >1 (size-gated cuts inline
at test scale, wrapper fixtures slicing one table, the multi-table
audit family) are ACCEPTED by being pinned at their triaged count —
the pin is the rationale record.

Run after any deliberate plan change (and eyeball the diff: a count
that grew is N-1 new full scans at scale unless you can argue
otherwise):

    python scripts/gen_scan_pins.py            # all queries
    python scripts/gen_scan_pins.py ks markov  # only matching names
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from hmpps_digital_prison_reporting_glue_poc_spark.plans.fingerprint import (  # noqa: E402
    scan_counts_query,
)
from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SCAN_PIN_SF_DIR", "/root/testdata/sf0.001")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCAN_PINS.json",
)


def main() -> None:
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    spark = get_spark(shuffle_partitions=8)
    queries = entry_mod.queries()
    pins: dict[str, dict[str, int]] = {}
    if only and os.path.exists(OUT):
        with open(OUT) as fh:
            pins = json.load(fh)
    t0 = time.time()
    for i, (name, fn) in enumerate(sorted(queries.items())):
        if only and not any(s in name for s in only):
            continue
        t = time.time()
        try:
            pins[name] = scan_counts_query(spark, fn, SF_DIR)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            print(f"FAIL {name}: {exc}")
            continue
        total = sum(pins[name].values())
        worst = max(pins[name].values(), default=0)
        print(
            f"[{i + 1}/{len(queries)}] {name}: scans={total} "
            f"worst={worst} ({time.time() - t:.1f}s)"
        )
    with open(OUT, "w") as fh:
        json.dump(dict(sorted(pins.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {OUT}: {len(pins)} queries in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
