"""Two-decade scaling ladder (round 9): time representative queries at
1x / 10x / 100x of sf0.1 and report the per-decade scaling exponent
alpha = log10(t_hi / t_lo) — the number the 100 TB extrapolation
actually rests on (alpha ~ 1.0 = linear data-bound scaling, < 1 =
overhead still amortizing, > 1 = a super-linear term that would be
fatal three decades up).

Unlike scripts/scale_stress.py (which injects hot keys and near-dup
families to hunt skew), the ladder grows the FACTS uniformly and keeps
the dimensions fixed — the shape a growing production corpus actually
has: more orders per customer, more events per user, more docs per
source. The corpora are built WITH SPARK (unions of key-shifted
copies written straight to parquet — nothing materializes on the
driver), so building the 100x rung is itself a small scale test.

Usage: python scripts/scale_ladder.py          # build + run all rungs
       python scripts/scale_ladder.py q1_pricing_summary ...  # subset
Writes corpora to .scale/ladder_{10,100}/ (gitignored); prints one
JSON line per (query, rung) and a final REPORT line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LADDER = {10: os.path.join(REPO, ".scale", "ladder_10"),
          100: os.path.join(REPO, ".scale", "ladder_100")}

# dimensions copied as-is; facts duplicated with consistent key shifts
DIMS = ["region", "nation", "customer", "supplier", "part"]
FACTS = ["orders", "lineitem", "events", "documents", "embeddings"]

QUERIES = [
    "q1_pricing_summary",        # scan + wide agg (lineitem)
    "q3_shipping_priority",      # 3-table join + top-k
    "cdc_last_writer_wins",      # user-keyed window fold (events)
    "token_frequency",           # text explode + vocab rollup (documents)
    "lsh_candidate_pairs",       # banded MinHash self-join (documents)
    "kaplan_meier_conversion",   # survival grid (events)
]


def _build(spark, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        shutil.copy(
            os.path.join(BASE, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )
    copies = spark.range(factor).withColumnRenamed("id", "__k")

    def dup(df, shifts: dict):
        out = df.crossJoin(F.broadcast(copies))
        for col, per in shifts.items():
            out = out.withColumn(
                col, (F.col(col) + F.col("__k") * F.lit(per)).cast("long")
            )
        return out.drop("__k")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    orders = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
    dup(orders, {"o_orderkey": 10_000_000_000}).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    dup(li, {"l_orderkey": 10_000_000_000}).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "lineitem.parquet"))

    import __spark_entry__ as entry_mod

    ev = entry_mod._events(spark, BASE)
    dup(ev, {"event_id": 1_000_000_000}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    # per-copy token-tail marker keeps duplicated docs from being EXACT
    # dups (LSH sees near-dup families, the realistic growth mode)
    docs_d = dup(docs, {"doc_id": 100_000_000})
    docs_d = docs_d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" ladcp"),
            ((F.col("doc_id") / F.lit(100_000_000)).cast("long")).cast(
                "string"
            ),
        ),
    )
    docs_d.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    dup(emb, {"vec_id": 100_000_000}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    open(done, "w").write("ok\n")


def main(names: list[str]) -> None:
    import __spark_entry__ as entry_mod
    from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark

    names = names or QUERIES
    spark = get_spark(app_name="scale_ladder")
    queries = entry_mod.queries()
    for factor, path in LADDER.items():
        t0 = time.time()
        _build(spark, factor, path)
        print(
            json.dumps(
                {"build": factor, "sec": round(time.time() - t0, 1)}
            ),
            flush=True,
        )

    rungs = {1: BASE, 10: LADDER[10], 100: LADDER[100]}
    # warm-up: touch each rung once so listing/codec costs don't land on
    # the first measured query
    queries[names[0]](spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()

    report: dict[str, dict] = {}
    for name in names:
        times = {}
        for factor, path in rungs.items():
            t0 = time.time()
            queries[name](spark, path).write.format("noop").mode(
                "overwrite"
            ).save()
            times[factor] = round(time.time() - t0, 2)
            print(
                json.dumps(
                    {"query": name, "rung": factor, "sec": times[factor]}
                ),
                flush=True,
            )
        import math

        report[name] = {
            "sec_1x": times[1],
            "sec_10x": times[10],
            "sec_100x": times[100],
            "alpha_10_100": round(
                math.log10(max(times[100], 1e-3) / max(times[10], 1e-3)), 2
            ),
        }
    print("REPORT " + json.dumps(report), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
