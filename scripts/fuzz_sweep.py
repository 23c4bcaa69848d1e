"""Full-registry differential fuzz sweep (r8 verdict task 6, completeness
pass).

The in-suite harness (`tests/test_fuzz_differential.py`) guards 86
representative families on every pytest run. This script sweeps EVERY
registered query/oracle pair across the same 6 committed seed datasets —
~1,900 comparisons, minutes of wall clock — so it runs per-round from the
command line rather than inside the suite.

Usage:
  python scripts/fuzz_sweep.py            # all queries, all seeds
  python scripts/fuzz_sweep.py q1_pricing_summary hill_token_tail_alpha
  FUZZ_SEEDS=empty,nulls python scripts/fuzz_sweep.py

Prints one line per failing (query, seed) with the failure class and a
final JSON summary; exit code 1 if anything failed. Every failure is
either a genuine cross-engine divergence (fix operator/oracle, add the
query to _R09_CHANGED's successor) or a fuzz-generator artifact (fix the
generator) — triage before the round closes.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark  # noqa: E402
from test_fuzz_differential import SEEDS, _gen_tables, _write_sf_dir  # noqa: E402
from test_oracle_parity import TABLES, _normalise  # noqa: E402


# Documented input-contract raises: operators whose API VALIDATES its
# input and raises a named error on degenerate data, by design. The sweep
# treats the specific contract error as a pass; anything else still fails.
CONTRACT_RAISES: dict[str, str] = {
    # a drift comparison needs both label groups present — an input with
    # fewer is a caller error, not a computable edge case
    "centroid_drift_labels": "exactly two groups required",
}


def main() -> None:
    wanted = sys.argv[1:]
    seeds = os.environ.get("FUZZ_SEEDS", ",".join(SEEDS)).split(",")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = wanted or [n for n in sorted(queries) if n in oracles]

    spark = get_spark(shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="fuzz_sweep_")
    cons: dict[str, duckdb.DuckDBPyConnection] = {}
    dirs: dict[str, str] = {}
    for mode in seeds:
        d = os.path.join(work, mode)
        os.makedirs(d)
        _write_sf_dir(d, _gen_tables(mode))
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
        cons[mode], dirs[mode] = con, d

    failures: dict[str, str] = {}
    n_run = 0
    for i, name in enumerate(names):
        for mode in seeds:
            n_run += 1
            key = f"{name}/{mode}"
            try:
                sdf = queries[name](spark, dirs[mode])
                spdf = sdf.toPandas()
                null_bools = [
                    f.name
                    for f in sdf.schema.fields
                    if f.dataType.typeName() == "boolean"
                    and spdf[f.name].isna().any()
                ]
                if null_bools:
                    failures[key] = f"NULL_BOOLEAN_OUTPUT {null_bools}"
                    print(f"FAIL {key}: NULL_BOOLEAN_OUTPUT {null_bools}",
                          flush=True)
                    continue
                s_cols, s_vals = _normalise(spdf)
                d_cols, d_vals = _normalise(cons[mode].sql(oracles[name]).df())
                if s_cols != d_cols:
                    failures[key] = f"COLUMNS {s_cols} vs {d_cols}"
                elif len(s_vals) != len(d_vals):
                    failures[key] = f"ROWS {len(s_vals)} vs {len(d_vals)}"
                else:
                    mism = [
                        (a, b) for a, b in zip(s_vals, d_vals) if a != b
                    ]
                    if mism:
                        failures[key] = (
                            f"VALUES {len(mism)} rows; first {mism[:2]}"
                        )
                if key in failures:
                    print(f"FAIL {key}: {failures[key][:300]}", flush=True)
            except Exception as exc:  # noqa: BLE001 - report and continue
                contract = CONTRACT_RAISES.get(name)
                if contract and contract in str(exc):
                    continue  # documented input-contract raise
                failures[key] = f"ERROR {type(exc).__name__}: {exc}"
                print(f"FAIL {key}: {failures[key][:300]}", flush=True)
                if os.environ.get("FUZZ_TRACE"):
                    traceback.print_exc()
        if (i + 1) % 25 == 0:
            print(f"[{i + 1}/{len(names)}] {len(failures)} failures so far",
                  flush=True)

    print(
        json.dumps(
            {
                "n_queries": len(names),
                "n_seeds": len(seeds),
                "n_comparisons": n_run,
                "n_failures": len(failures),
                "failed": sorted(failures),
            }
        ),
        flush=True,
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
