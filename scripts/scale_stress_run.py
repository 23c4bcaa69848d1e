"""Generic 1x-vs-10x stress runner: times the named queries() entries on
sf0.1 and the 10x skewed corpus (scripts/scale_stress.py builds it) with
per-stage max/median task-time quantiles from the Spark UI — the same
method as the per-wave SCALE.md sections.

Usage: python scripts/scale_stress_run.py query1 query2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_stress import BASE, SCALED, build_scaled_corpus, stage_skew  # noqa: E402


def main(names: list[str]) -> None:
    build_scaled_corpus()

    import __spark_entry__ as entry_mod
    from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark

    spark = get_spark(
        app_name="scale_stress_run", extra_conf={"spark.ui.enabled": "true"}
    )
    app_id = spark.sparkContext.applicationId
    queries = entry_mod.queries()

    queries[names[0]](spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()  # warm-up

    report = {}
    for name in names:
        times = {}
        for label, sf_dir in (("1x", BASE), ("10x", SCALED)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            times[label] = round(best, 2)
        last_stage = -1
        try:
            with urllib.request.urlopen(
                f"http://localhost:4040/api/v1/applications/{app_id}"
                "/stages?status=COMPLETE",
                timeout=10,
            ) as r:
                last_stage = max(s["stageId"] for s in json.loads(r.read()))
        except Exception:
            pass
        queries[name](spark, SCALED).write.format("noop").mode(
            "overwrite"
        ).save()
        try:
            skews = stage_skew(app_id, last_stage)
        except Exception as exc:
            skews = [{"error": str(exc)}]
        worst = max((s.get("ratio", 0) for s in skews), default=0)
        report[name] = {
            "sec_1x": times["1x"],
            "sec_10x": times["10x"],
            "scale_ratio": round(times["10x"] / max(times["1x"], 1e-9), 1),
            "worst_task_skew": round(worst, 1),
        }
        print(
            f"{name}: 1x={times['1x']}s 10x={times['10x']}s "
            f"ratio={report[name]['scale_ratio']} "
            f"worst_task_skew={report[name]['worst_task_skew']}",
            flush=True,
        )
    print("REPORT " + json.dumps(report))


if __name__ == "__main__":
    main(sys.argv[1:])
