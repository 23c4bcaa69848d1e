"""Solo-isolate suspect bench queries (generalizes bench_isolate_r7).

Round-9 use (r8 verdict task 4): the r8 full-bench run started with the
sentinel 1.45x host-inflated and flagged a cluster of >20% raw-seconds
movers (lsh_precision_table, lsh_candidate_pairs, bloom_decontaminate,
bigram_lift_top_docs, hybrid_rrf_fusion, q21_waiting_suppliers) that the
sentinel-normalized pins called noise (n_drift 0). This re-measures them
on a calm host, interleaved with the q1_pricing_summary control so
ambient load hits suspect and control alike — the suspect/control RATIO
and the min-of-reps are the signal.

Usage: python scripts/bench_isolate.py [suspect ...]
  (defaults to the r8 regression cluster; REPS and SPARK_GRAFT_SF_DIR
   env-configurable)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark  # noqa: E402

R8_CLUSTER = [
    "lsh_precision_table",
    "lsh_candidate_pairs",
    "bloom_decontaminate",
    "bigram_lift_top_docs",
    "hybrid_rrf_fusion",
    "q21_waiting_suppliers",
]
CONTROL = "q1_pricing_summary"


def main() -> None:
    suspects = sys.argv[1:] or R8_CLUSTER
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "5"))
    spark = get_spark(app_name="bench_isolate")
    queries = entry_mod.queries()

    def run(name: str) -> float:
        start = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - start

    # warm-up: control + one Arrow query (python worker pool, codegen)
    for w in (CONTROL, "multimodal_meta", *suspects):
        run(w)

    results: dict[str, list[float]] = {n: [] for n in [CONTROL, *suspects]}
    loads: list[float] = []
    for _ in range(reps):
        loads.append(round(os.getloadavg()[0], 1))
        results[CONTROL].append(run(CONTROL))
        for s in suspects:
            results[s].append(run(s))
            results[CONTROL].append(run(CONTROL))

    ctl_min = min(results[CONTROL])
    out = {
        "control_min": round(ctl_min, 3),
        "control_all": [round(v, 2) for v in results[CONTROL]],
        "loads": loads,
    }
    for s in suspects:
        m = min(results[s])
        out[s] = {
            "min": round(m, 3),
            "all": [round(v, 2) for v in results[s]],
            "ratio_vs_control": round(m / ctl_min, 2),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
