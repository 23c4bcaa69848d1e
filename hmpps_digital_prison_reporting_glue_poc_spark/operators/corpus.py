"""Corpus-preparation operators for LLM training-data pipelines: n-gram
statistics, benchmark decontamination, sequence packing, deterministic
dataset splits, and repetition-based quality signals.

All candidate generation is equi-join- or window-shaped (never a cross
join), aggregation is partial-agg friendly, and every expression is a
JVM-side built-in so the hot path stays in whole-stage codegen. Each
operator has an exact ANSI-SQL twin in ``__spark_entry__.py`` — the
determinism contract (md5 hashing, id tie-breaks) exists to keep them
engine-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens
from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize


def _ngrams(text_col, n: int):
    """Array of space-joined word n-grams (column expression).

    Built with transform over an index sequence — one pass, no explode
    until the caller wants rows. slice + array_join per index instead of
    n element_at lookups: one array op per gram keeps the generated code
    small (6x faster cold — janino compile dominates the wide concat
    form — and 2x faster warm)."""
    toks = tokens(text_col)
    if n <= 1:
        return toks
    # Guard: sequence(1, m) with m < 1 DESCENDS in Spark, which would
    # fabricate reversed/negative-index n-grams for docs shorter than n
    # tokens — short docs must contribute an empty array instead.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus-level n-gram frequency table: (ngram, n_docs, n_occurrences).

    Two-phase aggregation: groupBy(ngram, doc_id) partial counts, then
    groupBy(ngram) rolls docs and occurrences up together. Counting
    distinct docs this way avoids the Catalyst Expand that a
    countDistinct-plus-count agg would inject (which doubles every
    exploded row before the hash aggregate) — same exact result, one
    fewer row-multiplying pass. ``top_k`` orders by (count desc, ngram
    asc) — a total order, so LIMIT sets are deterministic.
    """
    exploded = df.select(
        F.col("doc_id"), F.explode(_ngrams(F.col(text_col), n)).alias("ngram")
    )
    per_doc = exploded.groupBy("ngram", "doc_id").agg(
        F.count(F.lit(1)).alias("__c")
    )
    counts = per_doc.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__c").cast("long").alias("n_occurrences"),
    )
    if top_k is not None:
        counts = counts.orderBy(
            F.col("n_occurrences").desc(), F.col("ngram").asc()
        ).limit(top_k)
    return counts


def contamination_pairs(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: which training docs share word n-grams
    with an evaluation set (the GPT-3-style 13-gram check, smaller n here).

    Returns (train_id, eval_id, n_shared) for every contaminated pair.
    Candidate generation is an equi-join on the n-gram — never a cross
    join; n-grams are distinct within each doc so ``n_shared`` counts
    distinct shared n-grams. At 100 TB the eval side is tiny and
    broadcasts; the train side streams through one explode + join. The
    eval-side n-gram frame is MATERIALIZED before the broadcast: train
    and eval usually derive from the same corpus scan, and without the
    lineage cut the explode subplan runs twice — once to build the
    broadcast table, once streamed (measured 1.76s -> 0.6s at sf0.1).
    """
    t = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(F.array_distinct(_ngrams(F.col(text_col), n))).alias("ngram"),
    )
    e = materialize(
        evalset.select(
            F.col(id_col).alias("eval_id"),
            F.explode(F.array_distinct(_ngrams(F.col(text_col), n))).alias(
                "ngram"
            ),
        ),
        "contam_eval_",
    )
    return (
        t.join(F.broadcast(e), on="ngram")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding token-window chunking with overlap (stride < size), the
    standard long-document split for LLM context windows — distinct from
    ``pack_sequences`` (which concatenates short docs): here one long doc
    becomes many overlapping chunks.

    Chunk starts are a stride sequence over the token array; each chunk is
    one slice + array_join — all codegen, no Python, and perfectly
    parallel (no shuffle: every chunk derives from its own row). Emits the
    chunk as (token count, md5) rather than raw text so downstream
    compares/dedups ship 32 hex chars instead of the text body.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toked = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") > 0)  # sequence(0, -1) would descend
    starts = F.sequence(
        F.lit(0), F.size("__toks") - 1, F.lit(stride)
    )
    exploded = toked.select(
        F.col(id_col),
        F.col("__toks"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    length_col: str = "n_tokens",
    budget: int = 512,
    by: str | None = "source",
) -> DataFrame:
    """Streaming sequence packing (GPT-style pack-and-chunk): documents are
    concatenated in ``id_col`` order within each ``by`` group and split
    into fixed ``budget``-token bins. Emits, per doc, the bin its FIRST
    token lands in and the offset inside that bin — a doc may straddle a
    bin boundary (the concatenate-then-chunk semantics used for
    pretraining batches, not first-fit bin packing).

    One window shuffle per group; bin arithmetic is pure codegen.
    """
    part = [by] if by else []
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(length_col)).over(w)
    before = (cum - F.col(length_col)).cast("long")
    out_cols = ([F.col(by)] if by else []) + [
        F.col(id_col),
        F.col(length_col).cast("long").alias(length_col),
        F.floor(before / F.lit(budget)).alias("bin_id"),
        (before % F.lit(budget)).alias("bin_offset"),
    ]
    return df.select(*out_cols)


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: md5(salt || id) maps each
    row to a bucket in [0, 1); cumulative weight ranges carve the buckets
    into named splits. Content-stable (re-runs and late-arriving data land
    in the same split), partition-independent, no RNG state.

    Returns the input plus a ``split`` column.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    # First 8 hex chars of md5 -> uniform 32-bit integer -> [0, 1).
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(2**32))
    )
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """C4/Gopher-style repetition signals per document:
    (id, n_ngrams, n_distinct_ngrams, top_ngram_count, dup_ngram_frac).

    ``dup_ngram_frac`` is the fraction of n-gram occurrences that are
    repeats of an already-seen n-gram in the same doc;
    ``top_ngram_count`` is the multiplicity of the most repeated n-gram.
    explode -> groupBy(id, ngram) -> groupBy(id): two partial-agg shuffles
    on keys that include the doc id, so no skew beyond document length.
    """
    per_ngram = (
        df.select(
            F.col(id_col), F.explode(_ngrams(F.col(text_col), n)).alias("ngram")
        )
        .groupBy(id_col, "ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_ngram.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct_ngrams"),
        F.max("cnt").cast("long").alias("top_ngram_count"),
        (
            (F.sum("cnt") - F.count(F.lit(1))).cast("double")
            / F.sum("cnt").cast("double")
        ).alias("dup_ngram_frac"),
    )


def token_zipf(
    df: DataFrame, text_col: str = "text", round_to: int = 6
) -> DataFrame:
    """Corpus token-frequency (Zipf) table: every token with its occurrence
    count, frequency rank and the cumulative share of all token occurrences
    covered through that rank. The head of this table is the stopword
    candidate list; the tail is the rare-token noise a vocabulary builder
    truncates.

    Rank order is (count desc, md5-sub asc, token asc) — a total order
    whose md5 tie-break exists so the rank can be computed WITHOUT a
    vocabulary-sized window partition (the vocab is corpus-scale at
    100 TB; a bare ``row_number() over (order by count desc)`` is one
    task). Same decomposition as ``token_gini_concentration``:

    - ``off_rank(c)`` / ``off_sum(c)`` — tokens / occurrences with count
      STRICTLY HIGHER than c, from the one-row-per-distinct-count table
      via octave two-level windows (metadata-sized partitions);
    - within a count, tokens sub-bucket on md5 (65,536 keys) and rank by
      token inside (count, sub); the running occurrence sum inside an
      equal-count group is just ``rank_within * c``.

    Returns (token, n_occurrences, freq_rank, cum_share).
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize_if_large,
    )

    counts = materialize_if_large(
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences")),
        "zipf_counts_",
    )
    # vocabulary-sized rollup, multiple consumers: size-gated cut (r10
    # plan audit — un-cut, each consumer re-tokenized the corpus)

    sub = F.conv(F.substring(F.md5(F.col("token")), 1, 4), 16, 10).cast("int")
    keyed = counts.withColumn("__sub", sub)
    subcnt = keyed.groupBy("n_occurrences", "__sub").agg(
        F.count(F.lit(1)).alias("__m")
    )

    # one row per distinct count: token count and occurrence mass
    fcnt = subcnt.groupBy("n_occurrences").agg(
        F.sum("__m").alias("__n_tok")
    ).withColumn(
        "__occ", (F.col("n_occurrences") * F.col("__n_tok")).cast("long")
    ).withColumn(
        "__bucket", F.length(F.bin(F.col("n_occurrences"))).cast("int")
    )
    bcounts = fcnt.groupBy("__bucket").agg(
        F.sum("__n_tok").alias("__bn"), F.sum("__occ").alias("__bocc")
    )
    # offsets among HIGHER counts: buckets (and in-bucket counts) in
    # DESCENDING order; the bucket table is ~log2(max_count) rows
    w_boff = Window.orderBy(F.col("__bucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()  # 64-row bucket table: total occurrence mass
    boffsets = bcounts.select(
        "__bucket",
        F.coalesce(F.sum("__bn").over(w_boff), F.lit(0)).alias("__brank"),
        F.coalesce(F.sum("__bocc").over(w_boff), F.lit(0)).alias("__bsum"),
        F.sum("__bocc").over(w_all).alias("__total"),
    )
    w_f = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("n_occurrences").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    foff = (
        fcnt.join(F.broadcast(boffsets), "__bucket")
        .select(
            "n_occurrences",
            "__total",
            (
                F.coalesce(F.sum("__n_tok").over(w_f), F.lit(0))
                + F.col("__brank")
            ).alias("__off_rank"),
            (
                F.coalesce(F.sum("__occ").over(w_f), F.lit(0))
                + F.col("__bsum")
            ).alias("__off_sum"),
        )
    )

    # per-(count, sub) offsets among smaller subs of the same count
    w_sub = (
        Window.partitionBy("n_occurrences")
        .orderBy("__sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    suboff = (
        subcnt.withColumn(
            "__cum", F.coalesce(F.sum("__m").over(w_sub), F.lit(0))
        )
        .join(foff, "n_occurrences")
        .select("n_occurrences", "__sub", "__cum", "__off_rank",
                "__off_sum", "__total")
    )

    w_in = Window.partitionBy("n_occurrences", "__sub").orderBy(
        F.col("token").asc()
    )
    ranked = keyed.join(suboff, ["n_occurrences", "__sub"])
    rank_within = F.row_number().over(w_in) + F.col("__cum")
    cum = F.col("__off_sum") + rank_within * F.col("n_occurrences")
    return ranked.select(
        "token",
        "n_occurrences",
        (F.col("__off_rank") + rank_within).cast("long").alias("freq_rank"),
        F.round(
            cum.cast("double") / F.col("__total").cast("double"), round_to
        ).alias("cum_share"),
    )


def cross_doc_ngram_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Cross-document duplicate-text signal (the per-document summary of
    Lee et al.'s "Deduplicating Training Data Makes Language Models
    Better" substring dedup): for each document, the fraction of its
    n-gram INSTANCES whose n-gram also appears in at least one OTHER
    document. Documents with high coverage are boilerplate/templated text
    even when no whole-document near-dup fires.

    Scale shape: n-grams are keyed by their 60-bit md5 prefix (an int64)
    the moment they are built, so every shuffle moves 8-byte keys instead
    of ~n*8-byte strings; the doc-frequency pass is a window over the
    (doc, gram) partial counts — the producing aggregation runs ONCE (a
    join back to a separately-derived frequency table would re-run it per
    join side). Three keyed shuffles total, no self-joins, integer counts
    end to end. Hash collisions (2^-60-scale) would merge two grams
    corpus-wide — deterministically, and identically in any engine that
    uses the same key.
    Returns (id, n_ngrams, n_dup_ngrams, cross_dup_frac).
    """
    gram_key = F.conv(
        F.substring(F.md5(F.col("ngram")), 1, 15), 16, 10
    ).cast("long")
    per_doc = (
        df.select(
            F.col(id_col), F.explode(_ngrams(F.col(text_col), n)).alias("ngram")
        )
        .select(F.col(id_col), gram_key.alias("gkey"))
        .groupBy(id_col, "gkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("gkey")
    flagged = per_doc.withColumn("ndocs", F.count(F.lit(1)).over(w))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_ngrams"),
            F.sum(F.when(F.col("ndocs") > 1, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_dup_ngrams"),
        )
        .withColumn(
            "cross_dup_frac",
            F.col("n_dup_ngrams").cast("double")
            / F.col("n_ngrams").cast("double"),
        )
    )


def global_sort_rank(
    df: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Exact global 1-based rank under the total order (key, id) WITHOUT a
    single-partition window: the naive ``row_number() over (order by key)``
    funnels the whole dataset through one task. Instead: bucket rows by the
    key's first two hex chars (prefix-consistent with lexicographic order),
    rank inside each bucket in parallel, and add each bucket's cumulative
    offset — a 256-row table that broadcasts. This is the deterministic
    "training-order shuffle" a data pipeline materialises so every epoch
    reads the same order.

    Assumes ``key_col`` is a lowercase hex string (md5). Two shuffles: the
    bucket window and the bucket-count aggregation (both keyed), plus a
    broadcast join — no global exchange-to-one anywhere.
    """
    bucketed = df.withColumn(
        "__bucket", F.conv(F.substring(F.col(key_col), 1, 2), 16, 10).cast("int")
    )
    w_in = Window.partitionBy("__bucket").orderBy(
        F.col(key_col).asc(), F.col(id_col).asc()
    )
    counts = bucketed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
    )
    return (
        bucketed.withColumn("__intra", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "__bucket")
        .withColumn(
            rank_col, (F.col("__offset") + F.col("__intra")).cast("long")
        )
        .drop("__bucket", "__intra", "__offset")
    )


def length_bucket_packing(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
) -> DataFrame:
    """Length-bucketed batch packing: bucket documents by
    ``floor(log2(n_tokens))``, pad every document in bucket b to
    ``2^(b+1)`` tokens, and pack ``max_tokens // padded_len`` documents
    per batch — the standard dynamic-batching layout that bounds padding
    waste to <50% while keeping every batch a fixed token budget.
    Returns per (bucket, batch) packing stats: document count, real
    tokens, padded tokens, and the padding-waste fraction.

    Batch assignment needs an exact per-bucket rank, and there are only
    ~log2(max_doc_len) buckets — a plain ``row_number() over (partition
    by bucket)`` funnels the whole corpus through a handful of tasks at
    scale. Same cure as ``global_sort_rank``: sub-bucket each length
    bucket by the first two hex chars of md5(id) (256 sub-buckets), rank
    inside (bucket, sub) in parallel, and add broadcast cumulative
    offsets — max task size is corpus/(buckets*256), and the pack order
    (md5 of id) doubles as the deterministic within-bucket shuffle a
    training run wants anyway.
    """
    toked = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    # floor(log2(n)) via binary-digit count, NOT floating log2: IEEE
    # log(n)/log(2) can land a hair under an exact power of two and the
    # two engines need not err identically — digit count is integer-exact
    # in both (Spark bin(), DuckDB bin()).
    keyed = toked.withColumn(
        "bucket", (F.length(F.bin(F.col("n_tokens"))) - 1).cast("int")
    ).withColumn("__key", F.md5(F.col("doc_id").cast("string"))).withColumn(
        "__sub", F.conv(F.substring(F.col("__key"), 1, 2), 16, 10).cast("int")
    )
    counts = keyed.groupBy("bucket", "__sub").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy("bucket")
        .orderBy("__sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "bucket",
        "__sub",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("bucket", "__sub").orderBy(
        F.col("__key").asc(), F.col("doc_id").asc()
    )
    ranked = (
        keyed.join(F.broadcast(offsets), ["bucket", "__sub"])
        .withColumn("__rank", F.row_number().over(w_in) + F.col("__off"))
    )
    # SQL-function form: the PySpark shiftleft wrapper takes only a
    # literal bit count, but the bucket-dependent shift is a plain
    # expression in Spark SQL.
    padded_len = F.expr("CAST(shiftleft(1, bucket + 1) AS BIGINT)")
    docs_per_batch = F.greatest(
        F.lit(1).cast("long"), (F.lit(max_tokens) / padded_len).cast("long")
    )
    packed = ranked.withColumn(
        "batch_id", ((F.col("__rank") - 1) / docs_per_batch).cast("long")
    ).withColumn("padded_len", padded_len)
    return (
        packed.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("real_tokens"),
            F.sum("padded_len").cast("long").alias("padded_tokens"),
        )
        .withColumn(
            "waste_frac",
            (F.col("padded_tokens") - F.col("real_tokens")).cast("double")
            / F.col("padded_tokens").cast("double"),
        )
    )


def chunk_embed_pool(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    stride: int = 48,
    dim: int = 4,
) -> DataFrame:
    """The RAG ingest pipeline in one plan: chunk long documents with
    overlap (``chunk_tokens``), embed each chunk, mean-pool chunk vectors
    back to a document vector. The embed step is the repo's deterministic
    md5 stub (component j = u32(md5(j ':' chunk_md5)) / 2^32 — a real
    model call would replace exactly that expression with an Arrow-batched
    kernel, as ``embed_media_stub`` demonstrates); everything else is the
    production shape: explode-free chunk derivation, one shuffle to pool
    by document.

    Pooling sums are per-chunk doubles rounded to 9 dp and accumulated as
    DECIMAL(38,9) (order-free), then divided once by the chunk count.
    Returns (id, n_chunks, p0..p{dim-1}).
    """
    chunks = chunk_tokens(df, id_col, text_col, size=size, stride=stride)
    embedded = chunks.select(
        F.col(id_col),
        *[
            F.round(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{j}:"), F.col("chunk_md5")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("double")
                / F.lit(4294967296.0),
                9,
            )
            .cast("decimal(38,9)")
            .alias(f"__e{j}")
            for j in range(dim)
        ],
    )
    agg = embedded.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        *[F.sum(f"__e{j}").alias(f"__s{j}") for j in range(dim)],
    )
    return agg.select(
        F.col(id_col),
        F.col("n_chunks"),
        *[
            (
                F.col(f"__s{j}").cast("double")
                / F.col("n_chunks").cast("double")
            ).alias(f"p{j}")
            for j in range(dim)
        ],
    )


def training_shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_docs: int = 512,
) -> DataFrame:
    """The training-data export's final mile: place every document into a
    fixed-size shard under the deterministic epoch-stable shuffle order
    (``global_sort_rank`` over md5 keys — no single-partition window) and
    emit the shard MANIFEST a downstream loader consumes: per shard, doc
    count, token total, rank range, and an order-sensitive content
    checksum (md5 of the in-order doc fingerprints) that makes shard
    drift detectable byte-for-byte.

    At 100 TB this is the plan that writes `part-<shard>` training files:
    the shard assignment is pure arithmetic on the exact rank, the
    manifest aggregation shuffles once on shard_id, and the checksum is
    the standard re-export validation. (The write itself is the
    partitioned-parquet sink the pipeline already has; this operator is
    the assignment + manifest contract.)
    """
    keyed = df.select(
        F.col(id_col),
        F.md5(F.concat(F.lit("ord:"), F.col(id_col).cast("string"))).alias(
            "sort_key"
        ),
        F.size(tokens(F.col(text_col))).cast("long").alias("__n_tokens"),
        F.md5(F.col(text_col)).alias("__fp"),
    )
    ranked = global_sort_rank(
        keyed, key_col="sort_key", id_col=id_col
    ).withColumn(
        "shard_id", ((F.col("shuffle_rank") - 1) / shard_docs).cast("long")
    )
    return (
        ranked.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n_tokens").cast("long").alias("n_tokens"),
            F.min("shuffle_rank").alias("rank_from"),
            F.max("shuffle_rank").alias("rank_to"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("shuffle_rank").alias("r"),
                                    F.col("__fp").alias("fp"),
                                )
                            )
                        ),
                        lambda s: s["fp"],
                    ),
                    "",
                )
            ).alias("shard_md5"),
        )
    )


def token_gini_concentration(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Gini coefficient of the corpus token-frequency distribution — the
    vocabulary-concentration scalar next to the Zipf fit: 0 = uniform
    usage, ->1 = a few tokens dominate (boilerplate/templating smell).

    Needs every vocabulary entry's exact global rank under ascending
    frequency — but sum(rank * freq) is INVARIANT under permutation of
    ranks among equal-frequency tokens (within a tie group the assigned
    rank set is fixed and freq is constant), so any total order
    (freq, tie_break) yields the same Gini. That licenses a fully
    parallel exact rank with no vocabulary-sized window partition:

    - ``off(freq)`` = number of tokens with strictly smaller frequency,
      from the one-row-per-distinct-frequency table via the octave
      two-level rank (window partition = one frequency octave of the
      DISTINCT-FREQ table — metadata-sized, never the vocab);
    - within a frequency, tokens sub-bucket on md5(token) (16-bit key,
      65,536 sub-buckets), rank by token inside (freq, sub) and add the
      per-(freq, sub) cumulative offset.

    The old single-level octave rank put the entire freq=1 octave —
    ~half a Zipfian vocabulary — through one ``row_number`` task; now
    the hapax mass spreads over 65,536 (freq, sub) partitions and every
    join key is well distributed (r4 verdict finding #2).

    G = (2 * sum(rank_i * f_i)) / (n * sum(f)) - (n + 1) / n; rank and
    freq are cast to DECIMAL before the product so the sum is exact at
    any scale (rank*f <= |V| * corpus_tokens overflows int64 at corpus
    scale). Single-row output.
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize_if_large,
    )

    counts = materialize_if_large(
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq")),
        "gini_counts_",
    )
    # vocabulary-sized rollup, multiple consumers: size-gated cut (r10
    # plan audit — un-cut, each consumer re-tokenized the corpus)

    sub = F.conv(F.substring(F.md5(F.col("token")), 1, 4), 16, 10).cast("int")
    keyed = counts.withColumn("__sub", sub)
    subcnt = keyed.groupBy("freq", "__sub").agg(F.count(F.lit(1)).alias("__n"))

    # off(freq): cumulative token count over strictly smaller frequencies,
    # computed on the distinct-frequency table with the octave two-level
    # rank (bucket = binary digit count of freq: order-consistent).
    fcnt = subcnt.groupBy("freq").agg(F.sum("__n").alias("__n_tok"))
    fkeyed = fcnt.withColumn(
        "__bucket", F.length(F.bin(F.col("freq"))).cast("int")
    )
    bcounts = fkeyed.groupBy("__bucket").agg(F.sum("__n_tok").alias("__bn"))
    w_boff = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    boffsets = bcounts.select(
        "__bucket",
        F.coalesce(F.sum("__bn").over(w_boff), F.lit(0)).alias("__boff"),
    )
    w_f = (
        Window.partitionBy("__bucket")
        .orderBy("freq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    foff = (
        fkeyed.join(F.broadcast(boffsets), "__bucket")
        .withColumn(
            "__foff",
            F.coalesce(F.sum("__n_tok").over(w_f), F.lit(0)) + F.col("__boff"),
        )
        .select("freq", "__foff")
    )

    # per-(freq, sub) offset: tokens of the same freq in smaller sub-buckets
    # (window partition <= 65,536 rows per freq), plus off(freq).
    w_sub = (
        Window.partitionBy("freq")
        .orderBy("__sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    suboff = (
        subcnt.withColumn(
            "__cum", F.coalesce(F.sum("__n").over(w_sub), F.lit(0))
        )
        .join(foff, "freq")
        .select(
            "freq", "__sub", (F.col("__cum") + F.col("__foff")).alias("__off")
        )
    )

    w_in = Window.partitionBy("freq", "__sub").orderBy(F.col("token").asc())
    ranked = keyed.join(suboff, ["freq", "__sub"]).withColumn(
        "__rank", (F.row_number().over(w_in) + F.col("__off")).cast("long")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum("freq").cast("long").alias("total_tokens"),
        F.sum(
            F.col("__rank").cast("decimal(19,0)")
            * F.col("freq").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("__rf"),
    )
    n_d = F.col("n_vocab").cast("double")
    gini = (
        F.lit(2.0)
        * F.col("__rf").cast("double")
        / (n_d * F.col("total_tokens").cast("double"))
        - (n_d + F.lit(1.0)) / n_d
    )
    return agg.select("n_vocab", "total_tokens", gini.alias("token_gini"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    payload_cols: tuple = ("text",),
    group_col: str | None = "source",
) -> DataFrame:
    """Corpus snapshot diff — classify every document across two corpus
    versions as added / removed / changed / unchanged by comparing an
    md5 over the payload columns, rolled up per group: the audit a
    training pipeline runs between crawl refreshes before deciding what
    to re-process downstream (CDC for corpora; change detection by
    content hash, not timestamps).

    One full outer join on the id plus a content-hash equality test —
    both sides shuffle once on the id; the rollup is group-cardinality
    sized. Group attribution: a document's group comes from the NEW
    snapshot when present there, else from the old (removed docs).
    Returns (group, status, n_docs) — or (status, n_docs) when
    ``group_col`` is None.
    """
    def keyed(df: DataFrame, tag: str) -> DataFrame:
        fp = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in payload_cols]))
        cols = [F.col(id_col), fp.alias(f"__fp_{tag}")]
        if group_col is not None:
            cols.append(F.col(group_col).alias(f"__g_{tag}"))
        return df.select(*cols)

    joined = keyed(old, "old").join(
        keyed(new, "new"), on=id_col, how="full_outer"
    )
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") == F.col("__fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    classified = joined.withColumn("status", status)
    if group_col is None:
        return classified.groupBy("status").agg(
            F.count(F.lit(1)).alias("n_docs")
        )
    grp = F.coalesce(F.col("__g_new"), F.col("__g_old")).alias(group_col)
    return classified.select(grp, "status").groupBy(
        group_col, "status"
    ).agg(F.count(F.lit(1)).alias("n_docs"))


def source_language_entropy(
    df: DataFrame,
    group_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source language-mix entropy: ``H = -sum p_l * ln p_l`` over the
    source's document-language distribution — the monolingual-vs-mixed
    composition signal next to the domain-mix weights (a "multilingual"
    source collapsing to one language, or a clean source suddenly
    code-switching, is a crawl regression).

    Two metadata-sized aggregations ((source, lang) then source). The
    entropy is rounded to 6 dp: ln() differs in the last ulp across libm
    implementations and the per-language term sum is engine-order-
    dependent — the same portability rounding bm25_scores applies.
    Returns (group, n_docs, n_langs, lang_entropy).
    """
    pairs = df.groupBy(group_col, lang_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.partitionBy(group_col)
    p = F.col("__c").cast("double") / F.sum("__c").over(w).cast("double")
    terms = pairs.select(
        group_col,
        F.col("__c"),
        (-p * F.log(p)).alias("__h"),
    )
    return terms.groupBy(group_col).agg(
        F.sum("__c").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.round(F.sum("__h"), 6).alias("lang_entropy"),
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    keep_empty_docs: bool = True,
) -> DataFrame:
    """Corpus-wide LINE-level dedup (the C4 preprocessing step): every
    distinct line is kept exactly ONCE across the whole corpus — at its
    first occurrence in (doc, line position) order — and every later
    repeat (boilerplate headers, navigation chrome, license banners) is
    dropped from its document, which is then reassembled in original
    line order.

    Scale shape: explode lines once, ONE map-side-combinable groupBy on
    the line fingerprint for the global first-occurrence table (grouped
    struct arg-min — no window, no collect), an equi-join back on the
    same fingerprint key (co-partitioned with the groupBy's shuffle),
    and a per-doc ordered reassembly (sort_array over collected
    (idx, line) structs — bounded by lines-per-doc, not corpus). No
    cross join, nothing table-spanning.

    Returns (id, text, n_lines, n_kept): the rebuilt text plus per-doc
    audit counts. Documents whose every line was a repeat come back with
    empty text (``keep_empty_docs=False`` drops them, the C4 behavior).
    """
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__idx", "__line"),
    )
    keyed = lines.withColumn("__key", F.md5(F.col("__line")))
    first = keyed.groupBy("__key").agg(
        F.min(F.struct("__id", "__idx")).alias("__first")
    )
    kept_flag = (F.col("__id") == F.col("__first.__id")) & (
        F.col("__idx") == F.col("__first.__idx")
    )
    marked = keyed.join(first, "__key").select(
        "__id", "__idx", "__line", kept_flag.alias("__keep")
    )
    rebuilt = marked.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("__keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct("__idx", "__line"),
                        )
                    )
                ),
                lambda s: s["__line"],
            ),
        ).alias(text_col),
    )
    out = rebuilt.select(
        F.col("__id").alias(id_col), text_col, "n_lines", "n_kept"
    )
    if not keep_empty_docs:
        out = out.filter(F.col("n_kept") > 0)
    return out


def split_leakage_audit(
    df: DataFrame,
    fp_col: str = "fingerprint",
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test leakage audit: for every pair of splits, how many
    exact-duplicate fingerprints appear on BOTH sides — the contamination
    check a pipeline runs after ``split_assign`` before shipping an eval
    set (a doc whose duplicate sits in train inflates every metric).

    Pre-aggregating to (fingerprint, split, count) FIRST bounds the
    self-join fan-out at C(n_splits, 2) pairs per fingerprint — never
    C(dups, 2) row pairs — so the audit's cost is one shuffle on the
    fingerprint key regardless of how pathological the duplicate families
    are. Returns (split_a, split_b, n_shared_fps, n_docs_a, n_docs_b)
    where n_docs_x counts the split-x documents whose fingerprint also
    occurs in the other split of the pair.
    """
    per = df.groupBy(
        F.col(fp_col).alias("__fp"), F.col(split_col).alias("__split")
    ).agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    a = per.select(
        "__fp",
        F.col("__split").alias("split_a"),
        F.col("__cnt").alias("__ca"),
    )
    b = per.select(
        "__fp",
        F.col("__split").alias("split_b"),
        F.col("__cnt").alias("__cb"),
    )
    return (
        a.join(b, "__fp")
        .filter(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_fps"),
            F.sum("__ca").cast("long").alias("n_docs_a"),
            F.sum("__cb").cast("long").alias("n_docs_b"),
        )
    )


def quota_split(
    df: DataFrame,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
    weights: dict[str, float] | None = None,
    salt: str = "v1",
    denom: int = 1000,
) -> DataFrame:
    """EXACT-count train/val/test split by largest-remainder quota: each
    stratum gets floor(n*w) rows per split plus one extra for the
    largest fractional remainders — the allocation is exactly right PER
    STRATUM, not just in expectation (``split_assign``'s md5-proportional
    carve drifts by O(sqrt(n)); a 10-row stratum can easily lose its val
    slice entirely — this one cannot).

    Mechanics, all exact integers: weights quantize to ``denom``-ths
    (caller contract: they must sum to exactly ``denom`` after
    quantization, checked eagerly); rows order within a stratum by
    (md5(salt || id), id) — content-stable, partition-independent; row
    rank r (1-based) maps to the split whose cumulative largest-
    remainder quota covers it. Quota for split j in a stratum of n:
    base_j = floor(n*w_j/denom), remainders r_j = n*w_j mod denom ranked
    (desc, then declaration order) get the leftover +1s. The rank->split
    mapping is a closed-form comparison against cumulative quotas
    computed per stratum in one rollup — no driver loop.

    Returns the input plus ``split``. One window pass over the stratum
    partition (rank) + a broadcast of the per-stratum quota table.
    """
    from pyspark.sql import Window

    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(weights)
    q = [int(round(w * denom)) for w in weights.values()]
    if sum(q) != denom:
        raise ValueError(
            f"weights must quantize to exactly {denom}: got {q}"
        )
    stratum = (
        F.col(stratum_col) if stratum_col is not None else F.lit("__all")
    )
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w_rank = Window.partitionBy("__st").orderBy("__h", F.col(id_col))
    staged = (
        df.withColumn("__st", stratum)
        .withColumn("__h", h)
        .withColumn("__r", F.row_number().over(w_rank).cast("long"))
    )
    sizes = staged.groupBy("__st").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    # per-stratum cumulative quota for each split, computed as literal
    # arithmetic over __n: cum_j = sum_{i<=j} floor(n*q_i/denom) + (number
    # of the top-(leftover) remainders among splits 1..j). Remainder
    # ranking is (remainder desc, declaration order asc) — deterministic.
    n = F.col("__n")
    bases = [(n * F.lit(qi) - (n * F.lit(qi)) % F.lit(denom)) / F.lit(denom) for qi in q]
    bases = [b.cast("long") for b in bases]
    rems = [(n * F.lit(qi)) % F.lit(denom) for qi in q]
    leftover = (n - sum(bases)).cast("long")
    # rank of split i's remainder: number of splits j with (rem_j > rem_i)
    # or (rem_j == rem_i and j declared earlier)
    extras = []
    for i in range(len(q)):
        ahead = F.lit(0)
        for j in range(len(q)):
            if j == i:
                continue
            cond = (rems[j] > rems[i]) if j > i else (rems[j] >= rems[i])
            ahead = ahead + F.when(cond, 1).otherwise(0)
        extras.append(F.when(ahead < leftover, 1).otherwise(0).cast("long"))
    cums = []
    acc = None
    for i in range(len(q)):
        share = bases[i] + extras[i]
        acc = share if acc is None else acc + share
        cums.append(acc.alias(f"__cum{i}"))
    quota = sizes.select("__st", *cums)
    joined = staged.join(F.broadcast(quota), "__st")
    expr = None
    for i, name in enumerate(names[:-1]):
        cond = F.col("__r") <= F.col(f"__cum{i}")
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return joined.withColumn("split", expr).drop(
        "__st", "__h", "__r", *[f"__cum{i}" for i in range(len(q))]
    )


def rendezvous_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "v1",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each key
    goes to argmax over shards of md5(salt || shard || id) — the
    stateless sharding scheme whose defining property is MINIMAL
    MOVEMENT: adding shard S+1 re-homes only the keys whose new hash
    wins (~1/(S+1) of them), and every other key stays put (a modulo
    shard would re-home ~all of them). The natural shard-manifest
    companion to ``training_shard_manifest``.

    Columnar: the S candidate hashes are an array literal transform,
    the argmax an ``array_max`` over (hash, shard) structs — string
    comparison on fixed-width hex is exact and engine-portable; no
    Python, no shuffle at all (fully map-side). Returns the input plus
    ``shard`` (long in [0, n_shards)).
    """
    sid = F.col(id_col).cast("string")
    cands = F.array(
        *[
            F.struct(
                F.md5(
                    F.concat(F.lit(salt), F.lit(f"|{s}|"), sid)
                ).alias("h"),
                F.lit(s).cast("long").alias("s"),
            )
            for s in range(n_shards)
        ]
    )
    return df.withColumn("shard", F.array_max(cands).getField("s"))


def heaps_law_vocab_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10,
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct token
    TYPES vs cumulative token volume at corpus-order checkpoints — the
    "is the vocabulary saturating or still growing" diagnostic that
    decides whether more data buys new diversity or re-treads.

    Exact machinery: every token type is attributed to its FIRST
    occurrence document (min doc id — one groupBy), documents get exact
    ranks under the unique id order via the range-bucket idiom (never a
    corpus-spanning window), ranks collapse to ``n_buckets`` closed-form
    buckets, and both the new-type and token-volume rollups cumulate
    over the bucket grid. All integers; returns one row per bucket:
    (bucket, n_docs, cum_tokens, new_types, cum_types).
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import _range_rank

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize_if_large,
    )

    # the tokenized corpus feeds BOTH the per-doc size path and the
    # first-occurrence explode — un-cut, each re-tokenizes the corpus
    # through the fact lineage (r10 plan audit: 9 scans); size-gated
    toked = materialize_if_large(
        df.select(
            F.col(id_col).cast("long").alias("__id"),
            tokens(F.col(text_col)).alias("__toks"),
        ),
        "heaps_toked_",
    )
    per_doc = toked.select(
        "__id", F.size("__toks").cast("long").alias("__nt")
    )
    ranked = _range_rank(per_doc, "__id", "__id", 1_000, "__r")
    n_row = ranked.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    bucket = (
        (
            F.lit(n_buckets) * (F.col("__r") - 1)
            - (F.lit(n_buckets) * (F.col("__r") - 1)) % F.col("__n")
        )
        / F.col("__n")
    ).cast("long")
    doc_b = materialize_if_large(
        ranked.crossJoin(F.broadcast(n_row)).select(
            "__id", "__nt", bucket.alias("bucket")
        ),
        "heaps_docb_",
    )
    vol = doc_b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__nt").cast("long").alias("__tok"),
    )
    first_doc = (
        toked.select("__id", F.explode("__toks").alias("__t"))
        .groupBy("__t")
        .agg(F.min("__id").alias("__fd"))
    )
    new_types = (
        first_doc.join(
            doc_b.select(F.col("__id").alias("__fd"), "bucket"), "__fd"
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    )
    grid = vol.join(new_types, "bucket", "left").fillna(0, ["new_types"])
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return grid.select(
        "bucket",
        "n_docs",
        F.sum("__tok").over(w_cum).cast("long").alias("cum_tokens"),
        "new_types",
        F.sum("new_types").over(w_cum).cast("long").alias("cum_types"),
    )


def source_vocab_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Pairwise vocabulary overlap between corpus sources: Jaccard of
    each source's ``top_k`` tokens (by in-source count, lexicographic
    tie-break) — the corpus-comparison table behind "are these two
    crawls the same register?" decisions; js_divergence_sources
    measures distributional distance over langs, this measures lexical
    identity over the head vocabulary. Returns one row per unordered
    source pair: (source_a, source_b, overlap, union_size, jaccard).

    Exactness: per-source top-k sets are deterministic rank windows;
    overlap/union are exact integers from one token equi-join; jaccard
    is ONE float divide. The pair join is keyed on the token, so cost
    is O(sources_per_token^2) per shared token with top-k bounding
    every source's contribution at k rows — sources x k is the whole
    join input, never the corpus.
    """
    from pyspark.sql import Window
    from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens

    counts = (
        df.select(
            F.col(source_col).alias("__s"),
            F.explode(tokens(F.col(text_col))).alias("__t"),
        )
        .groupBy("__s", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = Window.partitionBy("__s").orderBy(
        F.col("__c").desc(), F.col("__t").asc()
    )
    top = (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(int(top_k)))
        .select("__s", "__t")
    )
    sizes = top.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__k")
    )
    a = top.select(F.col("__s").alias("source_a"), "__t")
    b = top.select(F.col("__s").alias("source_b"), "__t")
    inter = (
        a.join(b, "__t")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    pairs = (
        sizes.select(F.col("__s").alias("source_a"), F.col("__k").alias("__ka"))
        .crossJoin(
            F.broadcast(
                sizes.select(
                    F.col("__s").alias("source_b"), F.col("__k").alias("__kb")
                )
            )
        )
        .filter(F.col("source_a") < F.col("source_b"))
        .join(inter, ["source_a", "source_b"], "left")
        .withColumn("overlap", F.coalesce(F.col("overlap"), F.lit(0)))
    )
    union = (F.col("__ka") + F.col("__kb") - F.col("overlap")).cast("long")
    return pairs.select(
        "source_a",
        "source_b",
        "overlap",
        union.alias("union_size"),
        F.when(
            union > 0, F.col("overlap").cast("double") / union.cast("double")
        ).alias("jaccard"),
    )
