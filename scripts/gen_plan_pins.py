"""Regenerate PLAN_PINS.json — the committed per-query physical-plan
fingerprints that tests/test_plan_pins.py asserts against.

Run after any deliberate plan change (and eyeball the diff: an Exchange
count that grew is a scale regression unless you can argue otherwise):

    python scripts/gen_plan_pins.py            # all queries
    python scripts/gen_plan_pins.py q1 ntile   # only names containing these
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from hmpps_digital_prison_reporting_glue_poc_spark.plans.fingerprint import fingerprint_query
from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark

SF_DIR = os.environ.get("PLAN_PIN_SF_DIR", "/root/testdata/sf0.001")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_PINS.json")


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
            pins[name] = fingerprint_query(spark, fn, SF_DIR)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            print(f"FAIL {name}: {exc}")
            continue
        print(
            f"[{i + 1}/{len(queries)}] {name}: "
            f"ex={pins[name]['n_exchange']} "
            f"1p={pins[name]['n_exchange_single']} "
            f"({time.time() - t:.1f}s)"
        )
    with open(OUT, "w") as fh:
        json.dump(dict(sorted(pins.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {OUT}: {len(pins)} queries in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
