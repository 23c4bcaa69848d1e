"""Composed end-to-end corpus-preparation pipeline (r6 verdict task 7).

Every stage exists — and is driver-verified — as a standalone operator;
this module proves they COMPOSE: one DataFrame chain from raw documents to
the training-shard manifest, with the stage boundaries a 100 TB run would
actually cut. Composition is where plan blowup hides (re-shuffles between
stages keyed differently, duplicate corpus scans fanning out of
multi-consumer stages), so the chain is also plan-pinned.

Stage map (reference: the reference repo has no corpus pipeline — this is
the LLM-training-data surface the build brief adds as first-class):

1. quality gate   — ``textstats.gopher_rules`` (one projection, no shuffle)
2. exact dedup    — ``dedup.exact_dedup`` (one md5-keyed window)
3. near dedup     — ``dedup.jaccard_pairs_prefix`` (PPJoin prefix filter)
   + drop the HIGHER id of every qualifying pair (the deterministic,
   SQL-expressible keep rule; the CC-based variant is the separate
   ``neardup_dedup_corpus`` query)
4. mixture        — ``mixing.weighted_sample`` (md5-deterministic
   per-source Bernoulli, row-local, shuffle-free)
5. export         — ``corpus.training_shard_manifest`` (deterministic
   shuffle order, fixed-size shards, order-sensitive checksums)

The gated+exact-deduped survivor set is lineage-cut once
(``materialize``): it feeds the prefix-join's index build AND the
near-dup anti-join — without the cut the whole gate+dedup chain (and the
documents scan under it) would run once per consumer. The final plan
therefore contains ZERO scans of the raw corpus: only bounded re-reads
of the cut survivor/token tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import training_shard_manifest
from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs_prefix,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize
from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import weighted_sample
from hmpps_digital_prison_reporting_glue_poc_spark.operators.textstats import gopher_rules


def corpus_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    jaccard_threshold: float = 0.8,
    max_df: int | None = 100,
    shard_docs: int = 64,
) -> DataFrame:
    """Run the full prepare-for-training chain over ``docs`` and return
    the shard manifest (shard_id, n_docs, n_tokens, rank_from, rank_to,
    shard_md5). Deterministic end to end: every decision (gates, dedup
    keep rule, sampling, shard order) is content-derived, so re-running
    the pipeline reproduces the same manifest byte-for-byte."""
    gated = (
        gopher_rules(docs, id_col, text_col, passthrough=(text_col, group_col))
        .filter(F.col("keep"))
        .select(id_col, text_col, group_col)
    )
    survivors = materialize(
        exact_dedup(gated, id_col, text_col), "corpus_e2e_survivors_"
    )
    pairs = jaccard_pairs_prefix(
        survivors, id_col, text_col,
        threshold=jaccard_threshold, max_df=max_df,
    )
    near_drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    kept = survivors.join(near_drop, id_col, "left_anti")
    sampled = weighted_sample(kept, id_col, group_col, project=False)
    return training_shard_manifest(
        sampled, id_col, text_col, shard_docs=shard_docs
    )
