"""Capture .explain('formatted') for named queries into plans/<round>/.

Usage: python scripts/capture_plan.py TAG name [name ...]
  TAG is 'before' or 'after'; files land at plans/$PLAN_ROUND/<name>_<TAG>.txt
  (PLAN_ROUND defaults to r12). SPARK_GRAFT_SF_DIR selects the data dir
  (default sf0.1 — the judged scale, so the plan matches what the bench
  executes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLAN_ROUND", "r12"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_plan")
    queries = entry_mod.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} — explain('formatted') at "
                f"{os.path.basename(sf_dir)} ({tag})\n"
            )
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
