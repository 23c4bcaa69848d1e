"""Write / update the QUERY_FP.json dirtiness baseline (r8 verdict task 2).

Usage:
  python scripts/gen_query_fp.py --write
      Full re-baseline: fingerprint every queries() entry as of the
      CURRENT tree. Use only at a known-good point (right after a round's
      driver CORRECTNESS lands AND every row it re-checked is green).

  python scripts/gen_query_fp.py --update CORRECTNESS_r09.json
      Round ritual: refresh ONLY the queries the given driver round
      actually re-checked green (plus add fingerprints for brand-new
      queries). A dirty query that missed the round's ~50-slot window
      keeps its OLD baseline fingerprint and therefore stays dirty.

  python scripts/gen_query_fp.py --check
      Print the current dirty set (what __spark_entry__ will front-load).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from hmpps_digital_prison_reporting_glue_poc_spark import fingerprint as fp  # noqa: E402


def main() -> None:
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    current = fp.query_fingerprints(queries, oracles, entry_mod)

    if "--check" in sys.argv:
        dirty = fp.dirty_queries(queries, oracles, entry_mod)
        print("DIRTY: " + json.dumps(sorted(dirty)))
        return

    if "--write" in sys.argv:
        merged = current
        note = "full re-baseline"
    elif "--update" in sys.argv:
        corr_path = sys.argv[sys.argv.index("--update") + 1]
        with open(corr_path, encoding="utf-8") as fh:
            rows = json.load(fh)
        green = {
            name
            for name, row in rows.items()
            if isinstance(row, dict)
            and row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match") is not False
        }
        merged = fp.load_baseline()
        refreshed = sorted(n for n in current if n in green)
        added = sorted(n for n in current if n not in merged and n not in green)
        for n in refreshed + added:
            merged[n] = current[n]
        merged = {n: h for n, h in merged.items() if n in current}
        note = (
            f"update from {os.path.basename(corr_path)}: "
            f"{len(refreshed)} refreshed, {len(added)} new"
        )
        print(note)
    else:
        print(__doc__)
        sys.exit(2)

    with open(fp.BASELINE_PATH, "w", encoding="utf-8") as fh:
        json.dump(
            {
                "_doc": (
                    "Per-query source fingerprints as of each query's last "
                    "green driver check — see "
                    "hmpps_digital_prison_reporting_glue_poc_spark/"
                    "fingerprint.py. Regenerate with "
                    "scripts/gen_query_fp.py (--update CORRECTNESS_rNN.json "
                    "each round; --write only at a known-good full point)."
                ),
                "fingerprints": dict(sorted(merged.items())),
            },
            fh,
            indent=1,
        )
        fh.write("\n")
    print(f"wrote {fp.BASELINE_PATH}: {len(merged)} fingerprints ({note})")


if __name__ == "__main__":
    main()
