"""Round-6 dedup-family knee check (r5 verdict task 5): candidate-pair
growth vs corpus size at FIXED dup-rate, up to 100x.

The corpus series is built so true-pair count scales EXACTLY linearly:
scale s replicates the base documents s times, each block's tokens
suffixed with the block id (``tok`` -> ``tokb7``), so blocks are
internally identical (same dup families, same pair count p0 per block)
and share zero tokens/shingles across blocks — cross-block TRUE pairs
are impossible by construction. A correct candidate generator's count
should therefore track s (linear); any superlinear term is hash-bucket
random collision — the n²/buckets knee.

Measured per scale, via bucket statistics (sum over buckets of
C(size, 2) on the exact keys the operators join on — no pair
materialization):
  simhash   4 x 16-bit chunk keys     expected knee: n²/2^16 per chunk
  lsh       minhash band keys (md5)   expected: no knee (2^64 key space)
  contain   pruned inverted index     expected: bounded by max_df

Usage: python scripts/dedup_knee.py [scales...]  (default 1 4 20 100)
Writes corpora to .scale/knee/s{N}/ (gitignored); prints one JSON line
per (scale, family).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import (
    _doc_tokens,
    minhash_signatures,
    simhash,
)
from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KNEE = os.path.join(REPO, ".scale", "knee")


def build_corpus(spark, s: int) -> str:
    path = os.path.join(KNEE, f"s{s}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet")).select(
        "doc_id", "text"
    )
    blocks = spark.range(s).select(F.col("id").alias("__blk"))
    scaled = docs.crossJoin(blocks).select(
        (F.col("doc_id") + F.col("__blk") * 10_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("b"), F.col("__blk").cast("string")),
            ),
        ).alias("text"),
    )
    scaled.repartition(max(4, s // 4)).write.mode("overwrite").parquet(path)
    return path


def _pairs_from_buckets(keyed, key_cols) -> int:
    """sum over buckets of C(size, 2) — the exact fan-in of the
    candidate self-equi-join on key_cols."""
    return (
        keyed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(
                (F.col("n").cast("decimal(38,0)") * (F.col("n") - 1)) / 2
            ).alias("p")
        )
        .collect()[0][0]
        or 0
    )


def measure(spark, path: str, s: int) -> None:
    docs = spark.read.parquet(path)
    n = docs.count()

    # --- simhash chunk buckets (dedup.simhash_near_dup_pairs geometry)
    t0 = time.time()
    sk = simhash(docs, "doc_id", "text", bits=64)
    sk.write.mode("overwrite").parquet(os.path.join(KNEE, f"tmp_sk_s{s}"))
    sk = spark.read.parquet(os.path.join(KNEE, f"tmp_sk_s{s}"))
    simhash_cand = 0
    for c in range(4):
        key = F.shiftright(F.col("simhash"), c * 16).bitwiseAND((1 << 16) - 1)
        simhash_cand += int(
            _pairs_from_buckets(sk.select(key.alias("k")), ["k"])
        )
    print(
        json.dumps(
            {
                "family": "simhash",
                "scale": s,
                "n_docs": n,
                "candidates": simhash_cand,
                "sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )

    # --- minhash banded LSH buckets (lsh_candidate_pairs geometry)
    t0 = time.time()
    sigs = minhash_signatures(docs, "doc_id", "text")
    banded = sigs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws(
                            "|", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")
                        ).alias("band_key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("__b")
    ).select("__b.band_idx", "__b.band_key")
    lsh_cand = int(_pairs_from_buckets(banded, ["band_idx", "band_key"]))
    print(
        json.dumps(
            {
                "family": "lsh",
                "scale": s,
                "n_docs": n,
                "candidates": lsh_cand,
                "sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )

    # --- pruned inverted index (containment_pairs / jaccard_pairs, max_df=100)
    t0 = time.time()
    toks = _doc_tokens(docs, "doc_id", "text")
    dfs = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") <= 100
    )
    contain_cand = int(
        dfs.agg(
            F.sum(
                (F.col("n").cast("decimal(38,0)") * (F.col("n") - 1)) / 2
            ).alias("p")
        ).collect()[0][0]
        or 0
    )
    print(
        json.dumps(
            {
                "family": "contain",
                "scale": s,
                "n_docs": n,
                "candidates": contain_cand,
                "sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 20, 100]
    spark = get_spark(shuffle_partitions=32)
    for s in scales:
        path = build_corpus(spark, s)
        measure(spark, path, s)


if __name__ == "__main__":
    main()
