"""Round-7 task 1: isolate the r6 Arrow-kernel bench regression.

Runs each suspect query (ann_recall_at_k, ivfpq_topk,
kmeans_refine_clusters, copurchase_lift_items) interleaved with the
q1_pricing_summary control, N reps each, recording per-rep wall time and
the 1-min load average. Interleaving means ambient load hits suspect and
control alike, so the suspect/control RATIO is the signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark  # noqa: E402

SUSPECTS = [
    "ann_recall_at_k",
    "ivfpq_topk",
    "kmeans_refine_clusters",
    "copurchase_lift_items",
]
CONTROL = "q1_pricing_summary"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "5"))
    spark = get_spark(app_name="bench_isolate_r7")
    queries = entry_mod.queries()

    def run(name: str) -> float:
        start = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - start

    # warm-up: control + one Arrow query (python worker pool, codegen)
    for w in (CONTROL, "multimodal_meta", *SUSPECTS):
        run(w)

    results: dict[str, list[float]] = {n: [] for n in [CONTROL] + SUSPECTS}
    loads: list[float] = []
    for _ in range(reps):
        loads.append(round(os.getloadavg()[0], 1))
        results[CONTROL].append(run(CONTROL))
        for s in SUSPECTS:
            results[s].append(run(s))
            results[CONTROL].append(run(CONTROL))

    ctl_min = min(results[CONTROL])
    out = {
        "control_min": round(ctl_min, 3),
        "control_all": [round(v, 2) for v in results[CONTROL]],
        "loads": loads,
    }
    for s in SUSPECTS:
        m = min(results[s])
        out[s] = {
            "min": round(m, 3),
            "all": [round(v, 2) for v in results[s]],
            "ratio_vs_control": round(m / ctl_min, 2),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
