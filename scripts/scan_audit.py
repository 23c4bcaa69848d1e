"""Registry-wide fact-scan audit (round 10): count how many times each
query's executed plan scans each BASE table. A frame feeding multiple
consumers without a lineage cut re-runs its producer per consumer —
invisible in sf0.1 wall-clock (the recompute is milliseconds) but a
multiplicative full-scan waste at 100 TB. This audit found 65 flagged
plans in r10 (worst: markov_stationary 56 scans, rfm/rank_dependence
32) and drove the round's materialize sweep; see SCALE.md "Round-10
registry-wide fact-scan audit".

Reading the flags: a query can legitimately remain flagged at test
scale — size-GATED cuts (materialize_if_large) deliberately stay
inline below 256 MB because the temp-parquet write costs more than the
milliseconds of recompute it saves (the r7 copurchase A/B), and some
wrappers build synthetic fixtures by slicing one table several ways.
The audit is a FINDER; each flag needs the plan read before acting.

Usage: python scripts/scan_audit.py          # full registry
       python scripts/scan_audit.py name...  # substring filter
Prints one JSON line per flagged query and a FLAGGED count.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF_DIR = os.environ.get("SCAN_AUDIT_SF_DIR", "/root/testdata/sf0.001")
THRESHOLD = int(os.environ.get("SCAN_AUDIT_THRESHOLD", "3"))


def main() -> None:
    wanted = [a for a in sys.argv[1:] if not a.startswith("-")]
    spark = get_spark(shuffle_partitions=8, app_name="scan_audit")
    qs = entry_mod._all_queries()
    flagged = []
    for name, fn in qs.items():
        if wanted and not any(w in name for w in wanted):
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - audit must not abort
            flagged.append((name, "ERR", str(exc)[:80]))
            continue
        hot = {
            t: plan.count(f"{t}.parquet")
            for t in TABLES
            if plan.count(f"{t}.parquet") >= THRESHOLD
        }
        if hot:
            flagged.append((name, "SCANS", hot))
    print(f"FLAGGED {len(flagged)}")
    for row in flagged:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
