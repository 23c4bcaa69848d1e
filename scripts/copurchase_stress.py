"""Round-6 copurchase hot-user stress (r5 verdict task 3 'done' bar):
a planted bot holding 10^4 distinct items must not explode the candidate
pair count when ``max_basket`` is set.

Candidate count = sum over users of C(basket, 2) — computed from basket
sizes (the join fan-in), no pair materialization. Prints JSON rows for
SCALE.md.

Usage: python scripts/copurchase_stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import copurchase_lift
from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BOT_ITEMS = 10_000


def candidates(holdings) -> int:
    return int(
        holdings.groupBy("u")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(
                (F.col("n").cast("decimal(38,0)") * (F.col("n") - 1)) / 2
            )
        )
        .collect()[0][0]
        or 0
    )


def main() -> None:
    spark = get_spark(shuffle_partitions=32)
    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    items = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).filter(F.col("item").isNotNull())

    # plant the bot: ONE user (id -1) holding BOT_ITEMS distinct items
    bot = spark.range(BOT_ITEMS).select(
        F.lit(-1).cast("long").alias("user_id"),
        (F.col("id") + 1_000_000).alias("item"),
    )
    poisoned = items.unionByName(bot)

    for label, df, cap in (
        ("organic", items, None),
        ("bot_uncapped", poisoned, None),
        ("bot_capped_1000", poisoned, 1000),
    ):
        holdings = df.select(
            F.col("user_id").alias("u"), "item"
        ).distinct()
        if cap is not None:
            sizes = holdings.groupBy("u").agg(F.count(F.lit(1)).alias("n"))
            over = sizes.filter(F.col("n") > cap).select("u")
            holdings = holdings.join(F.broadcast(over), "u", "left_anti")
        cand = candidates(holdings)
        t0 = time.time()
        n_out = copurchase_lift(
            df, "user_id", "item", min_pairs=2, max_basket=cap
        ).count()
        print(
            json.dumps(
                {
                    "case": label,
                    "candidate_pairs": cand,
                    "output_rows": n_out,
                    "sec": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
