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

from pyspark.sql import Observation, functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
    materialize,
    materialize_observed,
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
    # vocabulary count rides the nodes write (r12: was a separate
    # footer-count job after the materialize)
    obs_n = Observation()
    nodes = materialize_observed(
        nodes, "hits_nodes_", obs_n, F.count(F.lit(1)).alias("n")
    )
    n_nodes = obs_n.get["n"]
    if n_nodes == 0:
        return nodes.select(
            "token",
            F.lit(None).cast("double").alias("authority"),
            F.lit(None).cast("double").alias("hub"),
        )
    v = F.lit(float(n_nodes))
    init = F.round(F.lit(1.0) / v, 9)

    def _norm(raw_col, tot):
        """round(raw / L1-total, 9) with ``tot`` the driver-side
        DECIMAL(38,9) total observed on the half-step's write — a single
        exact global, so the > 0 branch is decided once (value-identical
        to the per-row WHEN over the broadcast tot it replaces: both
        casts are correctly-rounded decimal→double)."""
        if tot is None or tot <= 0:
            return F.lit(0.0)
        return F.round(raw_col.cast("double") / F.lit(float(tot)), 9)

    def _half_step(state, from_col, src_key, dst_key, prefix):
        """One weighted propagation: store (token, __carry, __raw) with
        the L1 total riding the SAME write action as an observed metric.
        The previous shape computed the total with a broadcast agg
        subtree that re-executed the whole edges-join contrib lineage —
        two edge joins per half-step for one number (guide §1.2)."""
        contrib = (
            edges.join(
                state.select(
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
        out = (
            state.select("token", F.col(from_col).alias("__carry"))
            .join(contrib, "token", "left")
            .select(
                "token",
                "__carry",
                F.coalesce(
                    F.col("__raw"), F.lit(0).cast("decimal(38,9)")
                ).alias("__raw"),
            )
        )
        obs = Observation()
        stored = materialize_observed(
            out, prefix, obs, F.sum("__raw").alias("__tot")
        )
        return stored, obs.get["__tot"]

    # State per half-step: the driving score is also the carried one
    # (the A-step consumes AND keeps hub; the H-step authority), so each
    # half-step is one edges join + one vocab-sized left join + one
    # vocab-sized store; normalization folds into the NEXT step's
    # projection as a literal-denominator expression.
    scores = nodes.select(
        "token", init.alias("authority"), init.alias("hub")
    )
    for _ in range(n_iter):
        stored, tot = _half_step(scores, "hub", "src", "dst", "hits_raw_a_")
        scores = stored.select(
            "token",
            _norm(F.col("__raw"), tot).alias("authority"),
            F.col("__carry").alias("hub"),
        )
        stored, tot = _half_step(
            scores, "authority", "dst", "src", "hits_raw_h_"
        )
        scores = stored.select(
            "token",
            F.col("__carry").alias("authority"),
            _norm(F.col("__raw"), tot).alias("hub"),
        )
    out = scores.select("token", "authority", "hub")
    if top_k is not None:
        out = out.orderBy(
            F.col("authority").desc(), F.col("token").asc()
        ).limit(top_k)
    return out
