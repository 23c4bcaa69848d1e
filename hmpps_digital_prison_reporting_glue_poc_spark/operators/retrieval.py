"""Retrieval-side corpus operators: inverted-index construction and
Bloom-filter decontamination.

Both are index-building shapes a 100 TB training pipeline runs ahead of
selection/dedup: the inverted index is the token -> postings structure a
BM25/keyword retriever serves from, and the Bloom filter is the compact
broadcastable membership structure that lets a benchmark-decontamination
pass avoid a train-side x eval-side join entirely — the eval set is
folded into an m-bit filter (kilobytes) and every train document is
probed with pure row-local hash arithmetic plus one broadcast semi-join
against the set-bit table.

Determinism contract (as everywhere in this repo): hashing is md5-derived
(``u32(md5(...))``), so results are content-stable, partition-independent
and bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens


def _u32(col: F.Column) -> F.Column:
    """First 8 hex chars of md5 as an unsigned 32-bit integer — the
    engine-portable uniform hash used across this repo."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_cap: int = 8,
    top_k: int | None = 40,
) -> DataFrame:
    """Build the token -> postings inverted index: per token, document
    frequency (``df_docs``), collection frequency (``cf``), and the first
    ``postings_cap`` document ids ascending as a comma-joined preview
    string (the driver-portable stand-in for the postings array).

    Shape: one explode + one (token, doc) partial count + one token
    rollup — two keyed shuffles, both partial-agg friendly. The postings
    preview is built from ``sort_array(collect_list(...))`` over the
    per-token doc list; at 100 TB the cap bounds what ships out of the
    aggregation (a production index would instead sink the full postings
    to a bucketed store — this operator is the build plan, the cap is the
    preview contract). ``top_k`` orders by (df_docs desc, token asc) — a
    total order, so LIMIT sets are deterministic.
    """
    tf = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idx = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df_docs"),
        F.sum("tf").cast("long").alias("cf"),
        F.array_join(
            F.transform(
                F.slice(
                    F.sort_array(F.collect_list("doc_id")), 1, postings_cap
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings_head"),
    )
    if top_k is not None:
        idx = idx.orderBy(F.col("df_docs").desc(), F.col("token").asc()).limit(
            top_k
        )
    return idx


def bloom_bit_positions(
    df: DataFrame,
    text_col: str = "text",
    ngram_n: int = 3,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Fold a document set's word n-grams into the set-bit table of an
    m-bit Bloom filter: ``k_hashes`` md5-derived positions per distinct
    n-gram, distinct positions out. The result has at most ``m_bits``
    rows — kilobytes — regardless of corpus size, which is the whole
    point: it broadcasts.

    Position h of gram g is ``u32(md5(h || ':' || g)) % m_bits``."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import _ngrams

    grams = df.select(
        F.explode(_ngrams(F.col(text_col), ngram_n)).alias("gram")
    ).distinct()
    hashes = grams.select(
        "gram",
        F.explode(
            F.sequence(F.lit(0), F.lit(k_hashes - 1))
        ).alias("h"),
    )
    return (
        hashes.select(
            (
                _u32(
                    F.concat(
                        F.col("h").cast("string"), F.lit(":"), F.col("gram")
                    )
                )
                % m_bits
            ).alias("bit_pos")
        )
        .distinct()
    )


def bloom_probe_docs(
    train: DataFrame,
    filter_bits: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 3,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Probe every training document's distinct n-grams against a Bloom
    filter built by :func:`bloom_bit_positions`. A gram is *flagged*
    (possibly contaminated — Bloom filters have false positives, never
    false negatives) iff all ``k_hashes`` of its bit positions are set.

    Per document: ``n_grams`` (distinct), ``n_flagged``,
    ``flagged_share``. The filter side is broadcast (<= m_bits rows); the
    train side is one explode + distinct + a broadcast inner join + two
    keyed aggregations — no train x eval shuffle join anywhere, which is
    what makes this the 100 TB decontamination shape.
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import _ngrams

    doc_grams = (
        train.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_ngrams(F.col(text_col), ngram_n)).alias("gram"),
        )
        .distinct()
    )
    # Single pass over the (doc, gram) table: explode the k probe indexes,
    # LEFT-join the broadcast set-bit table (a miss keeps the row with a
    # null marker), count hits per gram, then roll up the doc — n_grams
    # and n_flagged come out of the same aggregation, so the distinct
    # gram shuffle runs exactly once. Collisions between a gram's own k
    # positions are handled by counting h values, not distinct positions.
    probes = doc_grams.select(
        "doc_id",
        "gram",
        F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("h"),
    ).withColumn(
        "bit_pos",
        _u32(F.concat(F.col("h").cast("string"), F.lit(":"), F.col("gram")))
        % m_bits,
    )
    marked = probes.join(
        F.broadcast(filter_bits.withColumn("__set", F.lit(1))),
        "bit_pos",
        "left",
    )
    per_gram = marked.groupBy("doc_id", "gram").agg(
        F.count("__set").alias("n_hit")
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("n_hit") == k_hashes, F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_flagged"),
        )
        .withColumn(
            "flagged_share",
            F.col("n_flagged").cast("double")
            / F.col("n_grams").cast("double"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k0: int = 60,
    limit: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of N candidate rankings (hybrid retrieval's
    standard lexical+semantic combiner): ``rrf = sum_i 1/(k0 + rank_i)``
    with a document missing from a list contributing 0 — Cormack et al.'s
    formulation, k0=60.

    Each input frame carries (id, rank). The fuse is a chain of full
    outer joins on the id over TOP-K CANDIDATE LISTS (bounded by
    construction upstream — rank lists are limit-cut before fusion), so
    every join side is top-k-sized regardless of corpus size. The score
    is a fixed-order sum of ``1/(k0+rank)`` doubles — identical IEEE ops
    in any engine. Returns (id, rank_1..rank_N, rrf_score), the top
    ``limit`` by (score desc, id asc).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused = None
    for i, r in enumerate(rankings, start=1):
        side = r.select(
            F.col(id_col), F.col("rank").cast("long").alias(f"rank_{i}")
        )
        fused = side if fused is None else fused.join(
            side, on=id_col, how="full_outer"
        )
    score = None
    for i in range(1, len(rankings) + 1):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k0) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return (
        fused.withColumn("rrf_score", score)
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(limit)
    )


def skipgram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gap: int = 2,
    min_count: int = 2,
    top_k: int | None = 50,
) -> DataFrame:
    """Distance-``gap`` skip-gram counts — the positional-index query
    ("w1 NEAR w2") that adjacency bigrams can't answer: pairs of tokens
    exactly ``gap`` positions apart, with pair and document frequencies.
    Feeds word-vector co-occurrence matrices and collocation mining
    beyond adjacency.

    Fully columnar: the pair list is ``arrays_zip`` of the token array
    against its own ``gap``-shifted slice — no positional explode +
    self-join (which would shuffle |tokens| rows twice); one explode
    feeds one (w1, w2) rollup with a map-side-combined distinct-doc
    count. ``top_k`` cuts deterministically ((n_pairs desc, w1, w2) —
    TakeOrdered ships per-partition heads only). Returns
    (w1, w2, n_pairs, n_docs).
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda c: c != "")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - gap, F.lit(0))),
        F.slice(toks, 1 + gap, F.greatest(n - gap, F.lit(0))),
    )
    exploded = (
        df.select(F.col(id_col).alias("__id"), F.explode(pairs).alias("__p"))
        .select(
            "__id",
            F.col("__p.0").alias("w1"),
            F.col("__p.1").alias("w2"),
        )
    )
    agg = (
        exploded.groupBy("w1", "w2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("__id").cast("long").alias("n_docs"),
        )
        .filter(F.col("n_pairs") >= min_count)
    )
    if top_k is not None:
        agg = agg.orderBy(
            F.col("n_pairs").desc(), F.col("w1").asc(), F.col("w2").asc()
        ).limit(top_k)
    return agg
