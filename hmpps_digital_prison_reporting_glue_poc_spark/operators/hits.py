"""HITS (hubs & authorities) over the directed token bigram graph
(round 11, wave 118) — the second classic eigenvector-style centrality
beside ``graph.token_pagerank``, and a genuinely different signal:
PageRank scores global reachability; HITS separates "pointed to by
good hubs" (authority) from "points at good authorities" (hub), the
split that matters on asymmetric graphs (function words are hubs,
content heads are authorities).

Fixed ``n_iter`` synchronous iterations of the weighted update
    a(v) = sum over in-edges (u -> v) of w * h(u)
    h(v) = sum over out-edges (v -> u) of w * a(u)
with L1 normalization after every half-step. Each half-step is one
edge-score equi-join + one keyed aggregation; the edge table is built
once and the score frame is |V| rows, so at 100 TB every round
shuffles edges-joined-scores only — the GraphX/Pregel plan with a
vocabulary-sized state frame (the token_pagerank shape; lineage is cut
per round by materializing the score frame).

Cross-engine determinism (the token_pagerank recipe, graph.py:149):
per-edge contributions round to 9 decimals and sum as DECIMAL(38,9)
(order-free); each normalized score re-rounds to 9 decimals; every
float constant is built from the same IEEE ops the oracle writes out.
The DuckDB twin unrolls the same ``n_iter`` iterations as CTEs.

No counterpart exists in the reference (``/root/reference/src`` has no
graph code).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
    materialize,
)


def token_hits(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_iter: int = 2,
    top_k: int | None = 30,
):
    """HITS over directed bigram edges (weight = corpus bigram count).
    Returns (token, authority, hub) — top_k by (authority desc, token
    asc) when top_k is set; both scores 9-dp-rounded L1-normalized.
    Empty corpus returns a typed empty frame."""
    from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens

    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array(
                F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<array<string>>"))
    edges = (
        toked.select(F.explode(grams).alias("__e"))
        .select(F.col("__e")[0].alias("src"), F.col("__e")[1].alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    edges = materialize(edges, prefix="hits_edges_")
    nodes = (
        edges.select(F.col("src").alias("token"))
        .union(edges.select(F.col("dst").alias("token")))
        .distinct()
    )
    nodes = materialize(nodes, prefix="hits_nodes_")
    n_nodes = nodes.count()  # metadata-scale: vocabulary count
    if n_nodes == 0:
        return nodes.select(
            "token",
            F.lit(None).cast("double").alias("authority"),
            F.lit(None).cast("double").alias("hub"),
        )
    v = F.lit(float(n_nodes))
    scores = nodes.select(
        "token",
        F.round(F.lit(1.0) / v, 9).alias("authority"),
        F.round(F.lit(1.0) / v, 9).alias("hub"),
    )

    def _half_step(scores_df, from_col, src_key, dst_key, out_name):
        """One weighted propagation + L1 normalization: out_name(v) =
        round(sum round(w * from(u), 9) / L1-total, 9)."""
        contrib = (
            edges.join(
                scores_df.select(
                    F.col("token").alias(src_key),
                    F.col(from_col).alias("__f"),
                ),
                src_key,
            )
            .groupBy(F.col(dst_key).alias("token"))
            .agg(
                F.sum(
                    F.round(F.col("__f") * F.col("w").cast("double"), 9)
                    .cast("decimal(38,9)")
                ).alias("__raw")
            )
        )
        raw = nodes.join(contrib, "token", "left").select(
            "token",
            F.coalesce(
                F.col("__raw"), F.lit(0).cast("decimal(38,9)")
            ).alias("__raw"),
        )
        tot = raw.agg(F.sum("__raw").alias("__tot"))
        return raw.crossJoin(F.broadcast(tot)).select(
            "token",
            F.when(
                F.col("__tot") > 0,
                F.round(
                    F.col("__raw").cast("double")
                    / F.col("__tot").cast("double"),
                    9,
                ),
            ).otherwise(F.lit(0.0)).alias(out_name),
        )

    for i in range(n_iter):
        auth = _half_step(scores, "hub", "src", "dst", "authority")
        scores = materialize(
            scores.select("token", "hub").join(auth, "token"),
            prefix="hits_scores_a_",
        )
        hub = _half_step(scores, "authority", "dst", "src", "hub")
        scores = materialize(
            scores.select("token", "authority").join(hub, "token"),
            prefix="hits_scores_h_",
        )
    out = scores.select("token", "authority", "hub")
    if top_k is not None:
        out = out.orderBy(
            F.col("authority").desc(), F.col("token").asc()
        ).limit(top_k)
    return out
