"""Core-scaling mini-bench at a larger corpus (r12, verdict task 8).

The driver's 8-vs-32-core block at sf0.1 measures job overhead, not data
parallelism: every materialize-loop operator came out <= 1.0 because
sf0.1 cannot keep 32 cores busy (BENCH_r11_c8). This reruns the slowest
printed-line queries on the 10x ladder corpus (scripts/scale_ladder.py
builds it once under .scale/ladder_10), where the per-stage data volume
is large enough for the core count to matter.

Each core count is a SEPARATE process (local[N] master is fixed at JVM
start), so run twice and diff the JSON lines:

    SPARK_GRAFT_CPUS=32 python scripts/scale_cores_bench.py > /tmp/c32.json
    SPARK_GRAFT_CPUS=8  python scripts/scale_cores_bench.py > /tmp/c8.json

Prints one JSON line: {"cpus": N, "rung": 10, "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The 10 slowest r11 printed-line queries (BENCH_r11.json order).
DEFAULT_QUERIES = [
    "simhash_near_dups",
    "cdc_chunk_stats_docs",
    "rank_dependence_qty_price",
    "corpus_pipeline_e2e",
    "neardup_dedup_corpus",
    "minhash_jaccard_pairs",
    "blomqvist_beta_qty_price",
    "user_health_mart",
    "kcore_token_graph",
    "partial_corr_lineitem",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT_QUERIES
    rung_dir = os.path.join(REPO, ".scale", "ladder_10")
    if not os.path.exists(os.path.join(rung_dir, "_DONE")):
        raise SystemExit(
            "10x ladder corpus missing - run scripts/scale_ladder.py first"
        )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # The 10x rung's fact parquets pack into ~12 default-size splits, so
    # scan parallelism — not the core count — binds scan-heavy queries
    # (measured: partial_corr ran 12-task stages on 32 cores). For a
    # CORE-scaling measurement the split size must not be the limiter;
    # SCALE_MAX_PARTITION_BYTES=33554432 gives every rung-10 scan >= 32
    # splits. Leave unset to measure with production defaults.
    extra = {}
    if os.environ.get("SCALE_MAX_PARTITION_BYTES"):
        extra["spark.sql.files.maxPartitionBytes"] = os.environ[
            "SCALE_MAX_PARTITION_BYTES"
        ]
    spark = get_spark(app_name=f"scale_cores_{cpus}", extra_conf=extra)
    queries = entry_mod.queries()

    # warm-up: JVM codegen + python worker pool + rung footer caches
    for w in ("q1_pricing_summary", "multimodal_meta"):
        queries[w](spark, rung_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    out: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, rung_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 2)
        print(
            json.dumps({"query": name, "cpus": cpus, "sec": out[name]}),
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps({"cpus": cpus, "rung": 10, "queries": out}), flush=True)


if __name__ == "__main__":
    main()
