"""Scale stress harness: validate the dedup/ANN family's 100 TB claims
against DATA, not just plan shape.

Builds a ~10x "sf1-equivalent" corpus from sf0.1 — documents duplicated
with per-copy perturbation (real near-dup families for the MinHash /
component queries), events duplicated with an injected hot user_id
(~30% of all rows on ONE key, the salted-join stress) — then times the
four scale-critical queries at 1x and 10x and pulls per-stage task-time
quantiles from the Spark UI REST API to catch stragglers (a stage whose
max task exceeds ~4x its median task is a skew failure).

Usage: python scripts/scale_stress.py  (writes the corpus to
.scale/sf1x10/, ~80 MB, gitignored; prints a report table).
"""

from __future__ import annotations

import json
import os
import time
import urllib.request

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED = os.path.join(REPO, ".scale", "sf1x10")
COPIES = 10
HOT_SHARE = 0.3  # fraction of duplicated events forced onto one key

QUERIES = [
    # round-6 waves 31-34
    "line_dedup_corpus",
    "grid_quantiles_events",
    "curriculum_interleave_docs",
    "dialog_turn_stats_events",
    "negative_samples_docs",
    "decayed_type_counts",
    "media_wav_meta",
    "media_wav_energy",
    "minhash_jaccard_pairs",
    "neardup_dedup_corpus",
    "salted_join_events",
    "training_order_shuffle",
    "semantic_dedup_docs",
    # waves 19-20
    "dup_span_stats_docs",
    "bloom_decontaminate",
    "token_pagerank",
    "length_bucket_packing",
    "inverted_index_postings",
    "kmeans_refine_clusters",
    "chunk_embed_pool_docs",
    # waves 21-24
    "bpe_merge_candidates",
    "token_graph_triangle_census",
    "user_value_zscores",
    "training_shard_manifest",
]


def build_scaled_corpus() -> None:
    if os.path.exists(os.path.join(SCALED, "_DONE")):
        _backfill_part()
        return
    os.makedirs(SCALED, exist_ok=True)

    docs = pq.read_table(os.path.join(BASE, "documents.parquet")).to_pandas()
    n = len(docs)
    out = []
    for k in range(COPIES):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] + k * 10_000_000
        if k > 0:
            # per-copy perturbation: truncate a k-dependent token tail and
            # append copy markers — copies of one doc span a range of
            # Jaccard similarities, so some pairs cross the near-dup
            # thresholds (real dup families) and some don't.
            frac = 1.0 - 0.05 * k
            c["text"] = [
                " ".join(t.split(" ")[: max(1, int(len(t.split(" ")) * frac))])
                + f" scalecp{k}tok aug{k}x"
                for t in c["text"]
            ]
            c["n_chars"] = c["text"].str.len()
        out.append(c)
    pd.concat(out, ignore_index=True).to_parquet(
        os.path.join(SCALED, "documents.parquet"), index=False
    )

    ev = pq.read_table(os.path.join(BASE, "events.parquet")).to_pandas()
    hot_key = int(
        pq.read_table(os.path.join(BASE, "customer.parquet"))
        .to_pandas()["c_custkey"]
        .min()
    )
    rng = np.random.default_rng(42)
    out = []
    for k in range(COPIES):
        c = ev.copy()
        c["event_id"] = c["event_id"] + k * 100_000_000
        if k > 0:
            hot = rng.random(len(c)) < (HOT_SHARE * COPIES / (COPIES - 1))
            c.loc[hot, "user_id"] = hot_key
        out.append(c)
    pd.concat(out, ignore_index=True).to_parquet(
        os.path.join(SCALED, "events.parquet"), index=False
    )

    emb = pq.read_table(os.path.join(BASE, "embeddings.parquet")).to_pandas()
    out = []
    for k in range(COPIES):
        c = emb.copy()
        c["vec_id"] = c["vec_id"] + k * 10_000_000
        if k > 0:
            # small additive noise: copies are true semantic near-dups
            # (cosine ~0.999 to the original) — the SemDeDup stress case
            mats = np.vstack(c["embedding"].to_numpy()).astype(np.float64)
            mats += rng.normal(scale=0.02, size=mats.shape)
            c["embedding"] = [row.astype(np.float32) for row in mats]
        out.append(c)
    pd.concat(out, ignore_index=True).to_parquet(
        os.path.join(SCALED, "embeddings.parquet"), index=False
    )

    pq.write_table(
        pq.read_table(os.path.join(BASE, "customer.parquet")),
        os.path.join(SCALED, "customer.parquet"),
    )
    open(os.path.join(SCALED, "_DONE"), "w").close()
    _backfill_part()


def _backfill_part() -> None:
    """10x part/orders tables (added with waves 37/41): keys shift per
    copy, the value columns stay — vocabulary/value-domain cardinality is
    constant while per-key weights grow 10x, the realistic shape for
    linkage and order-statistics stress."""
    for tbl, key, shift in (
        ("part", "p_partkey", 10_000_000),
        ("orders", "o_orderkey", 100_000_000),
        # waves 53+: kendall needs lineitem; value columns stay so the
        # qty/discount grid cardinality is constant while weights grow 10x
        ("lineitem", "l_orderkey", 100_000_000),
    ):
        dst = os.path.join(SCALED, f"{tbl}.parquet")
        if os.path.exists(dst):
            continue
        base = pq.read_table(os.path.join(BASE, f"{tbl}.parquet")).to_pandas()
        out = []
        for k in range(COPIES):
            c = base.copy()
            c[key] = c[key] + k * shift
            out.append(c)
        pd.concat(out, ignore_index=True).to_parquet(dst, index=False)
    # dimension tables pass through unscaled (wave 90: the FK audits join
    # the scaled facts against the same dim universe — orphans grow 10x,
    # the parent side stays broadcastable, the realistic DQ shape)
    for tbl in ("nation", "region", "supplier"):
        dst = os.path.join(SCALED, f"{tbl}.parquet")
        if os.path.exists(dst):
            continue
        pq.write_table(
            pq.read_table(os.path.join(BASE, f"{tbl}.parquet")), dst
        )


def _ui(path: str):
    with urllib.request.urlopen(f"http://localhost:4040{path}", timeout=10) as r:
        return json.loads(r.read())


def stage_skew(app_id: str, after_stage: int) -> list[dict]:
    """max/median task-duration ratio for every completed stage with id >
    ``after_stage`` (i.e. the stages of the query just run)."""
    rows = []
    for st in _ui(f"/api/v1/applications/{app_id}/stages?status=COMPLETE"):
        sid = st["stageId"]
        if sid <= after_stage or st["numCompleteTasks"] < 2:
            continue
        try:
            q = _ui(
                f"/api/v1/applications/{app_id}/stages/{sid}/"
                f"{st['attemptId']}/taskSummary?quantiles=0.5,1.0"
            )
        except Exception:
            continue
        med, mx = q["executorRunTime"]
        if med <= 0:
            med = 1.0
        rows.append(
            {
                "stage": sid,
                "tasks": st["numCompleteTasks"],
                "med_ms": med,
                "max_ms": mx,
                "ratio": mx / med,
            }
        )
    return rows


def main() -> None:
    build_scaled_corpus()

    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod
    from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark

    spark = get_spark(
        app_name="scale_stress", extra_conf={"spark.ui.enabled": "true"}
    )
    app_id = spark.sparkContext.applicationId
    queries = entry_mod.queries()

    # warm-up
    queries["minhash_jaccard_pairs"](spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()

    report = {}
    wanted = [a for a in sys.argv[1:] if not a.startswith("-")]
    for name in (wanted or QUERIES):
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
        skews = []
        try:
            done = _ui(f"/api/v1/applications/{app_id}/stages?status=COMPLETE")
            last_stage = max(s["stageId"] for s in done)
        except Exception:
            pass
        # re-run the 10x once more so its stages are the tail we inspect
        t0 = time.perf_counter()
        queries[name](spark, SCALED).write.format("noop").mode(
            "overwrite"
        ).save()
        try:
            skews = stage_skew(app_id, last_stage)
        except Exception as exc:  # UI off / parse issue: report, don't die
            skews = [{"error": str(exc)}]
        worst = max((s.get("ratio", 0) for s in skews), default=0)
        report[name] = {
            "sec_1x": times["1x"],
            "sec_10x": times["10x"],
            "scale_ratio": round(times["10x"] / max(times["1x"], 1e-9), 1),
            "worst_task_skew": round(worst, 1),
            "stages": skews,
        }
        print(
            f"{name}: 1x={times['1x']}s 10x={times['10x']}s "
            f"ratio={report[name]['scale_ratio']} "
            f"worst_task_skew={report[name]['worst_task_skew']}",
            flush=True,
        )

    # Control experiment: the same skewed join UNSALTED — quantifies what
    # the salt buys on the hot-key corpus.
    from pyspark.sql import functions as F

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.joins import salted_join

    ev = entry_mod._events(spark, SCALED).select("user_id", "value")
    cust = (
        spark.read.parquet(os.path.join(SCALED, "customer.parquet"))
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    for label, frame in (
        ("unsalted", ev.join(cust, on=["user_id"], how="inner")),
        ("salted", salted_join(ev, cust, on=["user_id"], how="inner", salt_buckets=8)),
    ):
        agg = frame.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
        )
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            agg.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        report[f"join_{label}_10x"] = round(best, 2)
        print(f"join_{label}_10x: {best:.2f}s", flush=True)

    print("REPORT " + json.dumps(report))


if __name__ == "__main__":
    main()
