"""Round-5 scale stress: the ANN/similarity family + the SimHash 64-bit
chunk-geometry fix, on the same 10x skewed corpus as scripts/scale_stress.py.

Two goals (VERDICT r4 items 2 and 5):

1. **SimHash geometry**: quantify what widening the sketch from 32 bits
   (8-bit pigeonhole chunk keys, 256 buckets) to 64 bits (16-bit keys,
   65,536 buckets) does to the candidate-pair count and wall time of the
   near-dup pair stage at 1x and 10x. Candidate count is computed exactly
   and cheaply as sum over chunks of C(bucket_size, 2) from a groupBy on
   the chunk key — the size of the self-equi-join without running it.

2. **ANN family**: ann_topk_numpy, ivfpq_topk, embedding_lsh_pairs,
   kmeans_refine_clusters at 1x vs 10x embeddings (50k vectors with true
   near-dup families), with per-stage max/median task-time quantiles from
   the Spark UI REST API (straggler check, threshold ~4x).

Usage: python scripts/scale_stress_r5.py   (builds .scale/sf1x10 if absent)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_stress import BASE, SCALED, build_scaled_corpus, stage_skew  # noqa: E402

ANN_QUERIES = [
    "ann_topk_numpy",
    "ivfpq_topk",
    "embedding_lsh_pairs",
    "kmeans_refine_clusters",
    "simhash_sketches",
    "simhash_near_dups",
]


def main() -> None:
    build_scaled_corpus()

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from hmpps_digital_prison_reporting_glue_poc_spark.operators import dedup as dd
    from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark

    spark = get_spark(
        app_name="scale_stress_r5", extra_conf={"spark.ui.enabled": "true"}
    )
    app_id = spark.sparkContext.applicationId
    queries = entry_mod.queries()

    # warm-up (JIT + parquet footer caches)
    queries["ann_topk_numpy"](spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()

    report = {}

    # ---- 1. SimHash chunk geometry: candidate pairs + pair-stage time ----
    for label, sf_dir in (("1x", BASE), ("10x", SCALED)):
        corpus = entry_mod._dup_corpus(spark, sf_dir, mutate=True)
        for bits in (32, 64):
            sketches = dd.simhash(corpus, "doc_id", "text", bits=bits)
            sk = dd._materialize(sketches, f"simhash_geom_{bits}_")
            chunk_bits = bits // 4
            # exact candidate-join size: sum over chunks of C(bucket, 2)
            cand = 0
            for c in range(4):
                key = F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(
                    (1 << chunk_bits) - 1
                )
                sizes = sk.groupBy(key.alias("k")).count()
                row = sizes.agg(
                    F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p")
                ).collect()[0]
                cand += int(row.p or 0)
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                dd.simhash_near_dup_pairs(
                    sk, "doc_id", max_hamming=3, bits=bits, materialize=False
                ).write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            report[f"simhash_pairs_{bits}bit_{label}"] = {
                "candidate_pairs": cand,
                "pair_stage_sec": round(best, 2),
            }
            print(
                f"simhash pairs {bits}-bit {label}: candidates={cand:,} "
                f"pair_stage={best:.2f}s",
                flush=True,
            )

    # ---- 2. ANN family 1x vs 10x with straggler quantiles ----
    for name in ANN_QUERIES:
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
            done_stages = json.loads("[]")
            import urllib.request

            with urllib.request.urlopen(
                f"http://localhost:4040/api/v1/applications/{app_id}"
                "/stages?status=COMPLETE",
                timeout=10,
            ) as r:
                done_stages = json.loads(r.read())
            last_stage = max(s["stageId"] for s in done_stages)
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
    main()
