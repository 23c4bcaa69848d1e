"""Deduplication operators for large-scale corpus pipelines.

Exact dedup, MinHash+LSH, SimHash, and token-Jaccard near-dup — each built
from shuffle-friendly DataFrame primitives:

- exact:   one hash-groupBy (map-side partial agg; one shuffle on the
           fingerprint).
- minhash: explode distinct tokens -> ONE groupBy(id) carrying all k min()
           aggregates (one shuffle, k-wide combine), not k passes.
- LSH:     band keys -> self-equi-join per band (hash join on band key; at
           100 TB each band join is a co-partitioned shuffle, never a cross
           join).
- jaccard: token-inverted-index self-join; candidate generation prunes by
           shared token before any pairwise math.

Hash family is md5 (hex string order) rather than murmur3 so every stage is
reproducible in ANSI SQL — the DuckDB oracle computes byte-identical
signatures. Swap in xxhash64 for raw speed later; the band/bucket algebra is
hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens
from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
    materialize as _materialize,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
    estimated_bytes,
    materialize_if_large,
)


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """md5 content fingerprint per row."""
    return df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("fingerprint")
    )


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical documents: fingerprint -> (canonical id =
    min id, group size). One shuffle on the fingerprint."""
    return (
        fingerprint(df, id_col, text_col)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep exactly one row (lowest id) per distinct content."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) pairs, tokens distinct within a doc."""
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
    )


def _doc_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, shingle) pairs: k-token shingles, distinct within a doc.
    Shingling (vs bare tokens) is what keeps MinHash discriminative on
    small vocabularies — with bare tokens every long document converges on
    the full vocabulary and all LSH buckets collapse into one giant skewed
    bucket (a quadratic self-join at scale). Documents shorter than k
    tokens contribute one whole-text shingle."""
    if k <= 1:
        return _doc_tokens(df, id_col, text_col)
    # Materialise the token array first: the shingle expression references
    # it several times (size + slice per shingle), and as a bare attribute
    # each reference is free — inlined, the split/filter would re-evaluate
    # per reference. slice + array_join per index (not k element_at's):
    # one array op per shingle keeps the generated code small — janino
    # compile time dominates the wide concat form cold, and it is ~2x
    # faster warm (same measurement as corpus._ngrams).
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    shingles = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return toked.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("token")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature per document over k-token shingles: ``mh_i = min
    over shingles of md5(i || ':' || shingle)`` (lexicographic min of hex
    digests — a valid min-wise permutation family, and byte-reproducible in
    any SQL engine).

    All ``num_hashes`` minima ride one groupBy — a single shuffle keyed on
    the doc id regardless of k.
    """
    toks = _doc_shingles(df, id_col, text_col, shingle_k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("token")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """Banded LSH over minhash signatures: docs sharing any full band are
    candidates. All bands ride ONE self-equi-join on (band_idx, band_key).
    The signature frame is materialized to storage first (``materialize``),
    so the expensive signature aggregation (explode + k-wide groupBy over
    the shingle index) runs ONCE and both self-join sides scan the stored
    table — the same compute-once/store/join shape a 100 TB pipeline uses
    for its signature table. The join is hash-partitioned on the band key;
    bucket sizes stay small as long as the hash family discriminates (which
    is why signatures are shingled, not bare-token).
    Returns (id_a, id_b) with id_a < id_b."""
    if materialize:
        signatures = _materialize(signatures, "minhash_sigs_")
    bands = num_hashes // rows_per_band
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                "|",
                *[F.col(f"mh{i}")
                  for i in range(b * rows_per_band, (b + 1) * rows_per_band)],
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("__b")
    ).select(id_col, "__b.band_idx", "__b.band_key")
    # The self-join scans the banded plan twice, but with the signature
    # table materialized that is two cheap parquet scans + narrow explodes,
    # not two runs of the corpus-wide aggregation.
    return (
        banded.alias("l")
        .join(banded.alias("r"), on=["band_idx", "band_key"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def doc_band_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, band_idx, band_key) LSH band table — the storable index unit
    behind near-dup detection. ``num_hashes // rows_per_band`` rows per
    document, so a persistent band store grows linearly with the accepted
    corpus and every candidate probe is an equi-join on
    (band_idx, band_key), never an all-pairs comparison."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    bands = num_hashes // rows_per_band
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                "|",
                *[F.col(f"mh{i}")
                  for i in range(b * rows_per_band, (b + 1) * rows_per_band)],
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("__b")
    ).select(id_col, "__b.band_idx", "__b.band_key")


def neardup_against_store(
    incoming: DataFrame,
    store_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 3,
    broadcast_incoming: bool = False,
) -> DataFrame:
    """NEAR-dup gate for continuous ingest — the MinHash-LSH twin of
    ``dedup_against_store`` (which gates on exact content fingerprints).
    An incoming document is REJECTED when

    - any of its LSH bands matches the accepted-corpus band store
      (``store_bands``: (band_idx, band_key), extra columns ignored), or
    - it is not the minimum id in EVERY in-batch band bucket it belongs
      to.

    The in-batch rule makes the survivor set deterministic and pairwise
    band-disjoint in one window pass (no surviving pair shares a band;
    the smallest id of every near-dup family always survives) — the
    distributed-friendly closure of "keep first arrival", where a
    sequential gate's outcome would depend on scan order for chained
    near-dups. It is deliberately conservative toward rejection: a doc
    band-tied ONLY to a store-rejected batch-mate is still dropped
    (they are near-dups of each other — the family is represented by the
    store copy).

    Cost shape at 100 TB: one shingle->minhash aggregation over the
    batch, one window over the batch's band buckets, one store probe.
    Returns the surviving (id, band_idx, band_key) rows; callers append
    these to the store and the matching documents to the corpus.

    ``broadcast_incoming`` (the streaming-ingest shape, r10 verdict
    task 6): a ``bands left_semi store`` join can only broadcast its
    BUILD side — the store — so at corpus scale Spark falls back to a
    shuffle join and RE-SHUFFLES THE WHOLE STORE on every micro-batch
    (the store-growth term the r9 series measured at α=0.13/decade).
    Inverted, the probe broadcasts the batch's band table (bounded by
    micro-batch size x bands, small by construction) and STREAMS the
    store through a BroadcastHashJoin: zero store-side Exchange, zero
    store-side sort — the per-batch store term is one partition-local
    scan, and the only shuffle is the partial-agg distinct over matched
    ids (batch-bounded by map-side combine even when a boilerplate band
    key matches millions of store rows). Keep False for the bulk batch
    operator where ``incoming`` may itself be corpus-sized.
    """
    bands = _materialize(
        doc_band_table(
            incoming, id_col, text_col, num_hashes, rows_per_band, shingle_k
        ),
        "neardup_bands_",
    )
    if broadcast_incoming:
        hit_store = (
            store_bands.select("band_idx", "band_key")
            .join(
                F.broadcast(bands.select(id_col, "band_idx", "band_key")),
                on=["band_idx", "band_key"],
            )
            .select(id_col)
            .distinct()
        )
    else:
        hit_store = (
            bands.join(
                store_bands.select("band_idx", "band_key"),
                on=["band_idx", "band_key"],
                how="left_semi",
            )
            .select(id_col)
            .distinct()
        )
    w = Window.partitionBy("band_idx", "band_key")
    beaten = (
        bands.withColumn("__min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) > F.col("__min_id"))
        .select(id_col)
        .distinct()
    )
    rejected = hit_store.unionByName(beaten).distinct()
    return bands.join(rejected, on=id_col, how="left_anti")


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Token-set Jaccard similarity for candidate pairs generated through a
    token inverted index (docs sharing >=1 token). Intersection sizes come
    from one groupBy over the index self-join; set sizes broadcast back in.

    ``max_df``: hot-token pruning — tokens appearing in more than ``max_df``
    documents are dropped BEFORE the self-join, and document sizes are
    computed over the pruned vocabulary so the jaccard stays internally
    consistent. A single stopword-frequency token makes the index self-join
    quadratic on that key (df=10^6 -> 10^12 pairs from one token); pruning
    the head bounds every join bucket at max_df^2 pairs. The hot-token set
    is tiny by construction (the vocabulary head), so it broadcasts.
    ``max_df=None`` keeps exact full-vocabulary semantics — only safe when
    the caller knows the df distribution (e.g. shingled input).
    Returns (id_a, id_b, inter, size_a, size_b, jaccard).
    """
    toks = _doc_tokens(df, id_col, text_col)
    if max_df is not None:
        hot = (
            toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("token")
        )
        toks = toks.join(F.broadcast(hot), on="token", how="left_anti")
    # The (pruned) inverted index feeds three consumers (both self-join
    # sides + the size aggregation); store it once instead of re-tokenizing
    # the corpus per consumer.
    toks = _materialize(toks, "jaccard_toks_")
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("size"))

    left = toks.alias("l")
    right = toks.alias("r")
    inter = (
        left.join(right, on="token")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("size").alias("size_b"))
    scored = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "inter", "size_a", "size_b", "jaccard"
    )


def minhash_jaccard_estimates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """End-to-end MinHash pipeline check: for every banded-LSH candidate
    pair, the signature-agreement count (the MinHash Jaccard estimator's
    numerator) NEXT TO the true shingle-set Jaccard — the pair of numbers a
    dedup pipeline tunes its band/row configuration against.

    Candidates necessarily share >= 1 shingle (a band match means equal
    min-md5 digests, i.e. the same argmin shingle exists in both docs), so
    the true-intersection join below never drops a candidate.

    Scale shape: ONE groupBy over the exploded shingle index computes the
    per-doc DISTINCT SHINGLE ARRAY and all ``num_hashes`` signature
    minima together (``min`` is duplicate-insensitive, so minima over the
    exploded multiset equal minima over the set; ``collect_set`` dedups
    by definition) — a single shuffle and a single stored table where the
    r10 shape paid a second explode + groupBy + store round-trip to
    derive signatures FROM the stored arrays (measured 2.17s -> 1.5s for
    the two stages at sf0.1). Parquet column pruning serves each
    downstream consumer its slice: the banded self-join reads only
    (id, mh0..mhk), the true-jaccard rescore reads only (id, __sh). True
    intersections come from ``array_intersect`` on the candidate pairs'
    joined-back shingle arrays — candidate pairs are a vanishing fraction
    of the corpus, so this moves arrays only for matched docs instead of
    shuffling the whole exploded token index (measured 4.3s -> ~1.5s at
    sf0.1, and the saving grows with corpus size). No cross joins
    anywhere. Every output is an integer or a ratio of integers, so it is
    engine-exact.
    Returns (id_a, id_b, n_sig_matches, inter, union_sz, est_jaccard,
    true_jaccard).
    """
    exploded = _doc_shingles(df, id_col, text_col, shingle_k)
    sig_aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("token")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    sh = _materialize(
        exploded.groupBy(id_col).agg(
            F.collect_set("token").alias("__sh"), *sig_aggs
        ),
        "shingle_sigs_",
    )
    sigs = sh.select(
        F.col(id_col), *[F.col(f"mh{i}") for i in range(num_hashes)]
    )

    # Carry the signature columns THROUGH the band join instead of joining
    # sigs back onto the candidate pairs afterwards — with sigs stored, each
    # band-join side is a cheap parquet scan + narrow explode.
    bands = num_hashes // rows_per_band
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                "|",
                *[F.col(f"mh{i}")
                  for i in range(b * rows_per_band, (b + 1) * rows_per_band)],
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = sigs.select(
        F.col(id_col),
        *[F.col(f"mh{i}") for i in range(num_hashes)],
        F.explode(F.array(*band_structs)).alias("__b"),
    ).select(
        id_col, *[f"mh{i}" for i in range(num_hashes)],
        "__b.band_idx", "__b.band_key",
    )
    n_matches = None
    for i in range(num_hashes):
        term = F.when(
            F.col(f"l.mh{i}") == F.col(f"r.mh{i}"), 1
        ).otherwise(0)
        n_matches = term if n_matches is None else n_matches + term
    # all rows of a (id_a, id_b) pair carry identical signature columns, so
    # the multi-band dedup can keep any one of them
    cands = (
        banded.alias("l")
        .join(banded.alias("r"), on=["band_idx", "band_key"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            n_matches.cast("long").alias("n_sig_matches"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sha = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha"))
    shb = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb"))
    rescored = (
        cands.join(sha, "id_a")
        .join(shb, "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect("__sha", "__shb")).cast("long")
        )
        .withColumn("__sza", F.size("__sha").cast("long"))
        .withColumn("__szb", F.size("__shb").cast("long"))
    )
    return (
        rescored.select(
            "id_a",
            "id_b",
            "n_sig_matches",
            "inter",
            (F.col("__sza") + F.col("__szb") - F.col("inter")).alias("union_sz"),
            (F.col("n_sig_matches").cast("double") / num_hashes).alias("est_jaccard"),
            (
                F.col("inter").cast("double")
                / (F.col("__sza") + F.col("__szb") - F.col("inter")).cast("double")
            ).alias("true_jaccard"),
        )
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    hash every char k-gram, then keep the minimum hash of each sliding
    window of ``w`` consecutive k-grams — the classic plagiarism/copy
    detection sketch. Guarantees any shared substring of length >= k+w-1
    contributes at least one common fingerprint.

    All columnar: substring k-grams via transform over a sequence, window
    minima via array_min over slices. Hash family is md5 (lexicographic
    min), same engine-portability rationale as MinHash.
    Returns exploded (id, fp) pairs, distinct per document.
    """
    prepped = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("__n"),
        F.col(text_col).alias("__t"),
    )
    kgrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.col("__n") - (k - 1), F.lit(1))),
        lambda i: F.md5(F.col("__t").substr(i, F.lit(k))),
    )
    grammed = prepped.select(F.col(id_col), kgrams.alias("__kg"))
    windows = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size(F.col("__kg")) - (w - 1), F.lit(1))
        ),
        lambda j: F.array_min(F.slice(F.col("__kg"), j, w)),
    )
    return grammed.select(
        F.col(id_col), F.explode(F.array_distinct(windows)).alias("fp")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """SimHash document sketch: each token votes +-1 per bit position of its
    ``bits``-bit hash (taken from the leading hex chars of md5 so the oracle
    can reproduce it bit-for-bit); the sign of each bit-sum forms the sketch.

    64-bit is the scale default: with ``max_hamming=3`` the pigeonhole
    chunks are then 16 bits wide (65,536 bucket keys) instead of 8
    (256 keys), which keeps the candidate self-join from degenerating
    toward all-pairs at corpus scale (the r4 verdict's Θ(n²/256) finding).

    The 64-bit token hash is assembled from two 32-bit md5 halves (hex
    chars 1-8 = bits 63..32, chars 9-16 = bits 31..0): ``F.conv`` of 16 hex
    chars would overflow a signed long for values >= 2^63. The sketch long
    is likewise assembled with bitwiseOR of per-bit terms — ``shiftleft(1L,
    63)`` wraps to the sign bit without any checked arithmetic.

    Expressed as one explode + one groupBy with ``bits`` conditional sums —
    single shuffle, map-side combined.
    """
    if bits > 64:
        raise ValueError("simhash supports at most 64 bits")
    toks = _doc_tokens(df, id_col, text_col)
    lo = F.conv(F.substring(F.md5(F.col("token")), 9, 8), 16, 10).cast("long")
    hi = F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
    if bits <= 32:
        # legacy 32-bit sketch: hash = first 8 hex chars (bit-compatible
        # with the pre-64-bit implementation and its oracles)
        toks = toks.withColumn("__h_lo", hi)
    else:
        toks = toks.withColumn("__h_lo", lo).withColumn("__h_hi", hi)

    def bit_of_hash(b: int):
        if b < 32:
            return F.shiftright(F.col("__h_lo"), b).bitwiseAND(1)
        return F.shiftright(F.col("__h_hi"), b - 32).bitwiseAND(1)

    aggs = [
        F.sum(F.when(bit_of_hash(b) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(bits)
    ]
    summed = toks.groupBy(id_col).agg(*aggs)
    sketch = F.lit(0).cast("long")
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sketch = sketch.bitwiseOR(F.shiftleft(bit, b))
    return summed.select(F.col(id_col), sketch.alias("simhash"))


def simhash_near_dup_pairs(
    sketches: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    bits: int = 64,
    materialize: bool = True,
    explode_join: bool | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, bucketed for scale:
    split the sketch into (max_hamming + 1) chunks — two sketches within
    ``max_hamming`` must agree exactly on at least one chunk (pigeonhole),
    so candidate generation is an equi-join per chunk, never a cross join.

    Chunk width = ``bits // (max_hamming + 1)`` IS the scale knob: the
    expected candidate-pair count for unrelated docs is Θ(n² / 2^width) per
    chunk. At the 64-bit default with max_hamming=3 the keys are 16-bit
    (65,536 buckets); the old 32-bit default gave 8-bit keys (256 buckets),
    which degenerates toward a cross join at corpus scale. If you raise
    ``max_hamming``, raise ``bits`` to keep the width >= ~16.

    When to widen (round-6 knee measurement, SCALE.md): the random
    background ~n²/2^(width+1) per chunk overtakes true candidates d·n
    (d = near-dup candidate pairs per doc) at n ≈ d·2^(width+1). Dense
    corpora (d in the hundreds) hold 16-bit chunks to tens of millions
    of docs — measured linear to 500k at d≈512; SPARSE corpora (d≈1)
    knee near 2^17 ≈ 130k docs and need 32-bit chunks
    (``bits=64, max_hamming=1``), which push the d=1 knee to ~10^9 docs.

    The sketch table is materialized first: the chunk joins scan it
    2 x (max_hamming + 1) times, and without the lineage cut each scan
    re-runs the full sketch aggregation (a corpus-wide ``bits``-column
    groupBy).
    """
    if materialize:
        sketches = _materialize(sketches, "simhash_sketches_")
    chunks = max_hamming + 1
    chunk_bits = bits // chunks
    # Candidate-generation shape is SIZE-ADAPTIVE (r11 optimization,
    # guide §2.4 + §1.1's empirical check). Two provably-equivalent
    # shapes produce the same candidate multiset (pair (a,b) appears
    # once per chunk whose keys agree), so the distinct below sees
    # identical input either way:
    #
    # - broadcast-sized sketch table: `chunks` separate self-joins +
    #   union. Catalyst makes each a broadcast hash join with NO
    #   exchange, and the independent join subtrees run as concurrent
    #   stages — measured FASTER at sf0.1 (3.66s vs 4.25s) than the
    #   single exploded join.
    # - above the broadcast threshold: the per-chunk loop degrades to
    #   `chunks` sort-merge joins = 2*chunks full exchanges of the
    #   sketch table. ONE self-join on (chunk_idx, chunk_key) over the
    #   chunk-exploded table shuffles the same bytes through 2
    #   exchanges instead, and the key domain widens by the chunk_idx
    #   which only helps the hash spread.
    #
    # The gate mirrors materialize_if_large: plan-time stats decide,
    # with the cutover at the broadcast-threshold scale where Catalyst
    # stops making the per-chunk joins broadcasts.
    if explode_join is None:
        explode_join = estimated_bytes(sketches) >= (10 << 20)
    if explode_join:
        chunk_structs = [
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftright(F.col("simhash"), c * chunk_bits)
                .bitwiseAND((1 << chunk_bits) - 1)
                .alias("chunk_key"),
            )
            for c in range(chunks)
        ]
        keyed = sketches.select(
            F.col(id_col),
            F.col("simhash"),
            F.explode(F.array(*chunk_structs)).alias("__ck"),
        ).select(
            id_col,
            "simhash",
            F.col("__ck.chunk_idx").alias("chunk_idx"),
            F.col("__ck.chunk_key").alias("chunk_key"),
        )
        cand = (
            keyed.alias("l")
            .join(keyed.alias("r"), on=["chunk_idx", "chunk_key"])
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
                F.col("l.simhash").alias("sh_a"),
                F.col("r.simhash").alias("sh_b"),
            )
        )
    else:
        frames = []
        for c in range(chunks):
            key = F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(
                (1 << chunk_bits) - 1
            )
            keyed = sketches.select(
                F.col(id_col), F.col("simhash"), key.alias("chunk_key")
            )
            pairs = (
                keyed.alias("l")
                .join(keyed.alias("r"), on="chunk_key")
                .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
                .select(
                    F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.col("l.simhash").alias("sh_a"),
                    F.col("r.simhash").alias("sh_b"),
                )
            )
            frames.append(pairs)
        cand = frames[0]
        for frame in frames[1:]:
            cand = cand.unionByName(frame)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    # hamming/filter/projection BEFORE the distinct (r12, guide §2.3):
    # (id_a, id_b) functionally determines (sh_a, sh_b) — each id carries
    # ONE sketch — so distinct-then-score equals score-then-distinct, and
    # the dedup exchange now moves 3 narrow columns of only the pairs
    # that already passed the hamming gate instead of 4 columns of every
    # raw chunk collision. (Catalyst was already pushing the <= filter
    # into the chunk joins; the projection it could not push.)
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_against_store(
    incoming: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    store_fp_col: str = "fingerprint",
) -> DataFrame:
    """Dedup-at-ingest: drop incoming documents whose content fingerprint
    already exists in the historical store, then drop intra-batch dupes
    (keeping the lowest id). This is the production shape for continuous
    corpus growth — the store is the materialized fingerprint table of
    everything ingested so far, so each new batch costs one anti-join
    against it plus one batch-local shuffle, never a rescan of history.

    Returns the surviving (id, fingerprint) rows; callers append these to
    the store and the documents to the corpus.
    """
    fp = fingerprint(incoming, id_col, text_col)
    fresh = fp.join(
        store.select(F.col(store_fp_col).alias("fingerprint")),
        on="fingerprint",
        how="left_anti",
    )
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    return (
        fresh.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dup_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
) -> DataFrame:
    """Exact repeated-substring contamination per document (the
    token-window approximation of suffix-array substring dedup, Lee et
    al. 2022 "Deduplicating Training Data Makes Language Models Better"):
    every ``window_tokens``-token sliding window (stride 1) is
    fingerprinted with md5; a window is a *duplicate span* iff its
    fingerprint occurs >= 2 times corpus-wide (across documents or
    repeated within one). Per document: total windows, duplicated
    windows, duplicated share — the "how much of this doc is boilerplate
    someone else also has" trim signal.

    Shape: one explode (stride-1 windows ~= one row per token), a
    (span, doc) partial count, a span rollup, and a broadcast-free join
    back keyed on span — all equi-join/partial-agg friendly. At 100 TB
    the span rollup is the big shuffle and it is exactly the shuffle the
    problem requires; no pairwise doc x doc comparison ever happens
    (the suffix-array approach needs a global sort instead — this is the
    cheaper shuffle-native approximation).

    Windows reuse the shingle expression from ``_doc_shingles`` WITHOUT
    the per-doc distinct: within-doc repetition must count toward span
    multiplicity. Documents shorter than ``window_tokens`` contribute one
    whole-text window (consistent with the shingle convention).
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    spans = F.when(
        F.size(toks) >= window_tokens,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (window_tokens - 1)),
            lambda i: F.array_join(F.slice(toks, i, window_tokens), " "),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    per_doc_span = (
        toked.select(
            F.col(id_col), F.explode(spans).alias("__span")
        )
        .select(F.col(id_col), F.md5(F.col("__span")).alias("span_md5"))
        .groupBy(id_col, "span_md5")
        .agg(F.count(F.lit(1)).alias("n_in_doc"))
    )
    span_totals = per_doc_span.groupBy("span_md5").agg(
        F.sum("n_in_doc").cast("long").alias("n_total")
    )
    return (
        per_doc_span.join(span_totals, "span_md5")
        .groupBy(F.col(id_col).alias("doc_id"))
        .agg(
            F.sum("n_in_doc").cast("long").alias("n_windows"),
            F.sum(
                F.when(F.col("n_total") >= 2, F.col("n_in_doc")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_dup_windows"),
        )
        .withColumn(
            "dup_share",
            F.col("n_dup_windows").cast("double")
            / F.col("n_windows").cast("double"),
        )
    )


def dup_span_removal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
) -> DataFrame:
    """Cross-document exact-substring span REMOVAL (r7 verdict task 6) —
    the actionable half of ``dup_span_stats``: Lee et al. 2022's "remove
    the ~50-token span that appears more than once in the corpus",
    re-expressed on the same stride-1 token-window fingerprints.

    Algorithm (all equi-join / partial-agg / per-doc-window shaped):

    1. every ``window_tokens``-token stride-1 window is fingerprinted
       (md5) with its 1-based token position;
    2. a fingerprint groupBy keeps spans occurring >= 2 times corpus-wide
       (across docs or repeated within one) and elects the CANONICAL
       occurrence — min (doc, pos) under the unique total order, the
       deterministic choice both engines replay;
    3. duplicated window occurrences join back on the fingerprint (inner
       join: non-duplicated windows never reshuffle) and are flagged
       ``keep`` (canonical) or not;
    4. per (doc, keep-class), overlapping/adjacent windows merge into
       MAXIMAL token intervals via gaps-and-islands — running max of
       span end over a per-doc window, never a global one.

    Returns one row per maximal interval: (doc_id, span_start, span_len,
    keep) in token units — ``keep = false`` rows are the text to cut; the
    canonical copy survives so the corpus retains exactly one occurrence
    of every duplicated span.

    100 TB shape: the fingerprint rollup + join-back is THE required
    shuffle (same as dup_span_stats); the island merge is per-(doc,
    keep), so its window parallelises over documents. No doc x doc
    pairing, no global sort, no driver state. Candidate volume is linear
    in total duplicated-window count (measured in SCALE.md).
    """
    w = window_tokens
    toked = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") >= w)
    toks = F.col("__toks")
    occ = toked.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (w - 1)),
                lambda i: F.struct(
                    i.cast("long").alias("pos"),
                    F.md5(F.array_join(F.slice(toks, i, w), " ")).alias("h"),
                ),
            )
        ).alias("__o"),
    ).select("doc_id", F.col("__o.pos").alias("pos"), F.col("__o.h").alias("h"))
    roll = (
        occ.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct(F.col("doc_id"), F.col("pos"))).alias("__c"),
        )
        .filter(F.col("__n") >= 2)
    )
    marked = occ.join(roll, "h").select(
        "doc_id",
        "pos",
        (
            (F.col("doc_id") == F.col("__c.doc_id"))
            & (F.col("pos") == F.col("__c.pos"))
        ).alias("keep"),
    )
    w_prev = (
        Window.partitionBy("doc_id", "keep")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id", "keep")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = marked.withColumn(
        "__brk",
        F.when(
            F.col("pos")
            > F.coalesce(
                F.max(F.col("pos") + F.lit(w - 1)).over(w_prev), F.lit(-2).cast("long")
            )
            + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("__isl", F.sum("__brk").over(w_run))
    return islands.groupBy("doc_id", "keep", "__isl").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + F.lit(w) - F.min("pos")).cast("long").alias("span_len"),
    ).select("doc_id", "span_start", "span_len", "keep")


def cross_source_dup_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Split-integrity audit: exact-duplicate content that appears under
    MORE THAN ONE source — the leak that silently couples train/eval
    splits drawn per-source (the same page crawled by two feeds, a
    mirrored dataset). Per leaked fingerprint: the distinct-source count,
    total copies, lowest doc id, and the joined source list
    (deterministic order) for triage.

    One shuffle on the content fingerprint; the per-fingerprint source
    set is bounded by the source cardinality (tiny), so the collect_set
    state is safe at any corpus size.
    """
    fp = df.select(
        F.md5(F.col(text_col)).alias("fingerprint"),
        F.col(id_col),
        F.col(source_col),
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.countDistinct(source_col).alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("min_doc_id"),
            F.array_join(
                F.array_sort(F.collect_set(source_col)), ","
            ).alias("sources"),
        )
        .filter(F.col("n_sources") >= 2)
    )


def boilerplate_prefix_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_tokens: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Boilerplate-header detection: cluster documents sharing an
    identical first-``prefix_tokens``-token prefix (the web-scrape
    pattern where thousands of pages open with the same navigation/
    disclaimer block, which full-document dedup misses because the
    bodies differ). Per cluster of >= ``min_docs``: size, the lowest
    member id, and whether members' FULL texts are all identical
    (pure duplicates) or diverge after the prefix (true boilerplate).

    Documents shorter than the prefix window cluster on their whole
    text. One fingerprint-keyed shuffle; fully columnar.
    """
    toked = df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("__full_fp"),
        tokens(F.col(text_col)).alias("__toks"),
    )
    prefix = F.when(
        F.size("__toks") >= prefix_tokens,
        F.array_join(F.slice("__toks", 1, prefix_tokens), " "),
    ).otherwise(F.concat_ws(" ", F.col("__toks")))
    return (
        toked.select(
            F.col(id_col),
            F.col("__full_fp"),
            F.md5(prefix).alias("prefix_md5"),
        )
        .groupBy("prefix_md5")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("min_doc_id"),
            (F.countDistinct("__full_fp") == 1).alias("all_identical"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def keep_best_per_component(
    scored_components: DataFrame,
    id_col: str = "doc_id",
    comp_col: str = "component",
    score_col: str = "score",
) -> DataFrame:
    """Representative selection for near-dup clusters: per component,
    keep the highest-scoring member (smallest id on score ties) — the
    step after connected components where a dedup pipeline decides WHICH
    copy of each duplicate family survives (keep the best-quality one,
    not an arbitrary one).

    One grouped struct arg-min pass (min over (-score, id) picks the
    max-score/min-id member without a window), so the shuffle is the
    same component-keyed exchange the component join already produced.
    Returns (component, n_docs, kept_id, kept_score).
    """
    best = F.min(
        F.struct(
            (-F.col(score_col)).alias("__ns"), F.col(id_col).alias("__id")
        )
    ).alias("__best")
    return (
        scored_components.groupBy(comp_col)
        .agg(F.count(F.lit(1)).alias("n_docs"), best)
        .select(
            comp_col,
            "n_docs",
            F.col("__best.__id").alias("kept_id"),
            (-F.col("__best.__ns")).alias("kept_score"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric token-set CONTAINMENT ``C(A in B) = |A ∩ B| / |A|`` for
    inverted-index candidate pairs — the doc-inside-doc detector symmetric
    Jaccard misses: a short document quoted wholesale inside a long one
    has tiny Jaccard (union is large) but containment ~1. Standard quote/
    wrapper/boilerplate-envelope detection in corpus dedup.

    Same candidate machinery as ``jaccard_pairs`` (pruned inverted-index
    self-join, one intersection groupBy, sizes joined back); emits ONE row
    per unordered pair with the containment computed in BOTH directions
    and kept when either direction crosses the threshold. ``max_df``
    hot-token pruning bounds each join bucket exactly as in
    ``jaccard_pairs`` (sizes use the pruned vocabulary — internally
    consistent).
    Returns (id_a, id_b, inter, size_a, size_b, containment_a_in_b,
    containment_b_in_a).
    """
    toks = _doc_tokens(df, id_col, text_col)
    if max_df is not None:
        hot = (
            toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("token")
        )
        toks = toks.join(F.broadcast(hot), on="token", how="left_anti")
    toks = _materialize(toks, "containment_toks_")
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("size"))

    left = toks.alias("l")
    right = toks.alias("r")
    inter = (
        left.join(right, on="token")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("size").alias("size_b"))
    c_ab = F.col("inter").cast("double") / F.col("size_a").cast("double")
    c_ba = F.col("inter").cast("double") / F.col("size_b").cast("double")
    scored = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("containment_a_in_b", c_ab)
        .withColumn("containment_b_in_a", c_ba)
    )
    return scored.filter(
        (F.col("containment_a_in_b") >= threshold)
        | (F.col("containment_b_in_a") >= threshold)
    ).select(
        "id_a", "id_b", "inter", "size_a", "size_b",
        "containment_a_in_b", "containment_b_in_a",
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Prefix-filtered set-similarity join (PPJoin-style candidate
    generation): same output as ``jaccard_pairs`` — exact token-set
    Jaccard >= ``threshold`` — but the self-join runs on each document's
    PREFIX only: the |d| − ceil(t·|d|) + 1 globally-rarest tokens.

    Why it's correct: order all tokens by the global total order
    (df asc, token asc). If J(A,B) >= t then min(A∩B) under that order
    lies in BOTH prefixes (were every shared token past A's prefix,
    |A∩B| <= ceil(t|A|) − 1 < t|A| <= |A∩B| — contradiction; symmetric
    for B), so the prefix-prefix equi-join finds every qualifying pair.
    Why it scales: the index holds a (1−t)-fraction of each document's
    tokens — at t=0.8 that's 5x fewer postings and ~25x fewer join
    candidates than the full inverted index, and the hot head of the
    vocabulary (the quadratic join buckets) is exactly what the prefix
    ordering EXCLUDES (rarest-first). Verification joins candidates
    back to full token lists — fan-out bounded by |candidates| x doc
    size, never all-pairs. The ``threshold`` is interpreted exactly via
    its rational form, so prefix lengths are integer-exact.
    Returns (id_a, id_b, inter, size_a, size_b, jaccard).
    """
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1_000_000)
    tn, td = frac.numerator, frac.denominator

    toks = _doc_tokens(df, id_col, text_col)
    if max_df is not None:
        hot = (
            toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("token")
        )
        toks = toks.join(F.broadcast(hot), on="token", how="left_anti")
    toks = _materialize(toks, "jaccard_prefix_toks_")
    sizes = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("size")
    )
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    ordered = toks.join(dfreq, "token")
    w_doc = Window.partitionBy(id_col).orderBy(
        F.col("__df").asc(), F.col("token").asc()
    )
    # ceil(t*s) = (tn*s + td - 1) div td, exact integers
    s = F.count(F.lit(1)).over(Window.partitionBy(id_col))
    ceil_ts = F.expr(f"({tn} * __s + {td} - 1) div {td}")
    prefix = (
        ordered.withColumn("__rn", F.row_number().over(w_doc))
        .withColumn("__s", s)
        .filter(F.col("__rn") <= F.col("__s") - ceil_ts + F.lit(1))
        .select(id_col, "token")
    )
    # the self-join below consumes `prefix` TWICE — un-cut, the dfreq
    # join + both document windows execute once per side (2x the index
    # build at corpus scale); size-gated so pin-scale plans stay inline
    prefix = materialize_if_large(prefix, "jaccard_prefix_idx_")
    cands = (
        prefix.alias("l")
        .join(prefix.alias("r"), on="token")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    # verify: intersection via candidate -> full-token joins (fan-out
    # |cands| x doc size, not all-pairs)
    ta = toks.select(F.col(id_col).alias("id_a"), "token")
    tb = toks.select(F.col(id_col).alias("id_b"), "token")
    inter = (
        cands.join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("size").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (
                F.col("size_a") + F.col("size_b") - F.col("inter")
            ).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _u32_expr(col: F.Column) -> F.Column:
    """First 8 md5 hex chars as an unsigned 32-bit integer — the
    engine-portable uniform hash (the mixing._u32 convention)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def content_defined_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 3,
    divisor: int = 16,
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/FastCDC family) over the
    token stream: a boundary falls AFTER token position i whenever the
    hash of the w-token window ending at i is ≡ 0 (mod ``divisor``) —
    so boundaries are decided by LOCAL content, and inserting or
    deleting a paragraph shifts at most the chunks it touches, never the
    whole tail. That shift-resistance is exactly what fixed-size
    chunking lacks and why CDC is the unit of large-corpus byte/segment
    dedup. Expected chunk length = ``divisor`` tokens.

    Columnar end to end: boundary detection is one array expression per
    row (filter over the window-hash sequence — no explode of windows,
    no shuffle), chunks explode once for fingerprinting. The window hash
    is md5-u32 per TOKEN (computed once, O(n) md5 calls) folded with an
    integer polynomial (acc*31 + h) over the w-window — the per-window
    md5-of-joined-slice form cost O(n*w) string builds and measured 6x
    slower at sf0.1. Integer arithmetic is engine-portable, so any
    engine reproduces the exact same boundaries.
    Returns (id, chunk_idx, n_tokens, fingerprint) — one row per chunk,
    chunk_idx 1-based in document order.
    """
    toked = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") > 0)
    toks = F.col("__toks")
    n = F.size(toks)
    # one md5 per token, materialized as its own attribute so the window
    # fold reads an array element, not a re-evaluated expression
    toked = toked.withColumn(
        "__th", F.transform(toks, lambda t: _u32_expr(t))
    )
    hs = F.col("__th")
    # Guard n < w: Spark's sequence(w, n) with w > n yields a DESCENDING
    # sequence (step inferred -1), not empty — short docs must produce
    # zero cuts (one whole-doc chunk).
    # The w-window polynomial acc*31 + h over slice [i-w+1 .. i] equals
    # sum_k th[i-k] * 31^k (k = 0..w-1) — w is a Python int, so the fold
    # UNROLLS to w element_at terms with literal coefficients (r11
    # optimization, guide §1.2 per-task work): the per-position
    # F.slice(...) array allocation + F.aggregate lambda dispatch
    # disappear from the inner loop while every window hash stays
    # integer-identical.
    def _win_hash(i):
        acc = None
        for k in range(w - 1, -1, -1):
            term = F.element_at(hs, i - k) * F.lit(31 ** k).cast("long")
            acc = term if acc is None else acc + term
        return acc

    cuts_expr = F.when(
        n >= w,
        F.filter(
            F.sequence(F.lit(w), n),
            lambda i: _win_hash(i) % divisor == 0,
        ),
    ).otherwise(F.expr("array()").cast("array<int>"))
    # Each intermediate is its OWN attribute (withColumn), never an
    # inlined expression: the chunk transform below reads the boundary
    # array 3x per chunk, and an inlined `cuts` would re-run the whole
    # window-hash filter per reference (the _doc_shingles lesson;
    # measured 9.2s -> 2.6s at sf0.1 for exactly this).
    toked = toked.withColumn("__cuts", cuts_expr)
    # append the doc end as the final boundary unless a cut already
    # landed there (array_distinct would work but its order guarantee is
    # engine-specific; the conditional is portable)
    toked = toked.withColumn(
        "__bounds",
        F.when(
            F.try_element_at(F.col("__cuts"), F.lit(-1)) == n,
            F.col("__cuts"),
        ).otherwise(F.concat(F.col("__cuts"), F.array(n))),
    )
    toked = toked.withColumn(
        "__full", F.concat(F.array(F.lit(0)), F.col("__bounds"))
    )  # leading 0 sentinel
    full = F.col("__full")
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(F.col("__bounds"))),
        lambda k: F.struct(
            k.alias("chunk_idx"),
            (F.element_at(full, (k + 1).cast("int"))
             - F.element_at(full, k.cast("int"))).alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.slice(
                        toks,
                        F.element_at(full, k.cast("int")) + 1,
                        F.element_at(full, (k + 1).cast("int"))
                        - F.element_at(full, k.cast("int")),
                    ),
                    " ",
                )
            ).alias("fingerprint"),
        ),
    )
    return toked.select(
        F.col(id_col), F.explode(chunks).alias("__c")
    ).select(
        id_col,
        F.col("__c.chunk_idx").cast("long").alias("chunk_idx"),
        F.col("__c.n_tokens").cast("long").alias("n_tokens"),
        F.col("__c.fingerprint").alias("fingerprint"),
    )


def cdc_shared_chunk_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 3,
    divisor: int = 16,
) -> DataFrame:
    """Per-document shift-resistant duplication profile: how much of each
    document's content lives in chunks that also appear elsewhere. The
    chunk table feeds a fingerprint-count rollup (one groupBy, map-side
    combinable) joined back per chunk — the same two-pass shape as
    ``dup_span_stats`` but on CDC boundaries, so a copy-paste with an
    inserted sentence still matches on every untouched chunk.
    Returns (id, n_chunks, n_tokens, n_shared_chunks, shared_token_frac).
    """
    chunks = _materialize(
        content_defined_chunks(df, id_col, text_col, w, divisor),
        "cdc_chunks_",
    )
    counts = chunks.groupBy("fingerprint").agg(
        F.countDistinct(id_col).cast("long").alias("__n_docs")
    )
    joined = chunks.join(counts, "fingerprint")
    shared = F.when(F.col("__n_docs") >= 2, 1).otherwise(0)
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum(shared).cast("long").alias("n_shared_chunks"),
            F.sum(shared * F.col("n_tokens")).cast("long").alias("__sh_toks"),
        )
        .select(
            id_col,
            "n_chunks",
            "n_tokens",
            "n_shared_chunks",
            (
                F.col("__sh_toks").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("shared_token_frac"),
        )
    )
