"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- ``cosine_topk``: exact brute-force top-k, pure DataFrame — the *queries*
  side (small) is broadcast, the corpus streams through one narrow
  projection + per-query window top-k. No shuffle of the corpus beyond the
  final top-k aggregation; linear scans like this are how exact ANN
  baselines run at cluster scale.
- ``cosine_topk_np``: same semantics on the numpy fast path — mapInPandas
  computes partition-local top-k against the broadcast query matrix with
  one BLAS matmul per Arrow batch, then a tiny global window reduces
  per-partition candidates. The rows shuffled for the final reduce are
  O(partitions * queries * k), independent of corpus size.
- ``ivf_topk``: the scale path — k-means-style coarse quantizer (centroids
  fit on a sample, driver-side numpy; assignment + search distributed),
  probing only ``nprobe`` inverted lists per query.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.functions.vectors import cosine
from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
    materialize,
)


def _peek_dim(corpus: DataFrame, vec_col: str) -> int | None:
    """Vector dimension from the corpus's first row, or None when the
    corpus is empty (or its first vector is NULL) — operators use this to
    return a typed EMPTY result instead of raising: an empty shard or a
    fully-filtered corpus is a legitimate runtime state at scale, not a
    caller bug (r9 fuzz sweep, "empty" seed)."""
    first = corpus.select(vec_col).first()
    if first is None or first[0] is None:
        return None
    return len(first[0])


def _empty_result(df: DataFrame, spec) -> DataFrame:
    """Typed empty frame: spec is a list of (name, dtype) where dtype is
    either a pyspark DataType or a COLUMN NAME of ``df`` whose type to
    copy (so id columns keep the caller's id type)."""
    fields = []
    for name, t in spec:
        dt = df.schema[t].dataType if isinstance(t, str) else t
        fields.append(T.StructField(name, dt, True))
    return df.sparkSession.createDataFrame([], T.StructType(fields))


def _require_dim(corpus: DataFrame, vec_col: str) -> int:
    """Vector dimension from the corpus's first row, with a clear error on
    an empty corpus (``first()`` returns None and a bare ``first[0]``
    dereference would raise TypeError deep inside the operator)."""
    first = corpus.select(vec_col).first()
    if first is None or first[0] is None:
        raise ValueError(
            f"corpus is empty (or {vec_col!r} is null in its first row): "
            "vector dimension cannot be inferred"
        )
    return len(first[0])


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours per query by cosine similarity.

    Returns (query_id, neighbor_id, rank); rank ties broken by neighbor id
    so results are total-ordered and engine-comparable. Self-matches are
    excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # fold-state: zip_with over equal-dim non-NULL vectors; non-nullable
        # double init safe (a length mismatch would NULL-pad and decay to 0)
        .withColumn("score", cosine(F.col("__cvec"), F.col("__qvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_topk_np(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same result as ``cosine_topk`` on the Arrow/numpy fast path."""
    qrows = queries.select(id_col, vec_col).collect()  # queries are small
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    if not qrows:
        # no queries (e.g. an empty corpus slice): nothing to rank
        # (r9 fuzz sweep, "empty" seed)
        return _empty_result(
            queries,
            [("query_id", id_col), ("neighbor_id", id_col),
             ("rank", T.LongType())],
        )
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((qids, qmat))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def partial_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, qm = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            cmat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = cmat @ qm.T  # (corpus_batch, queries)
            rows = []
            for j, qid in enumerate(ids_b):
                col = sims[:, j]
                mask = cids != qid
                # Tie-break by neighbor_id ASC inside the kernel so the
                # partial prune keeps exactly the rows the global
                # (score desc, neighbor_id asc) window would: under exact
                # score ties at the k-th boundary, batch order must not
                # decide which tied id survives. lexsort: last key is
                # primary -> sort by -score, then id.
                order = np.lexsort((cids[mask], -col[mask]))[:k]
                sel_ids = cids[mask][order]
                sel_scores = col[mask][order]
                rows.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": sel_ids, "score": sel_scores}
                    )
                )
            if rows:
                yield pd.concat(rows, ignore_index=True)

    partial = corpus.select(id_col, vec_col).mapInPandas(
        partial_topk, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_pairs_above(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, id_a < id_b.

    Brute-force form (corpus joined to itself with the smaller projection
    broadcast) — correct baseline; at scale swap the candidate generation
    for ``ivf_topk`` buckets or random-hyperplane LSH.
    """
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("score", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b")
    )


def ivf_topk(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float = 1.0,
    max_train_rows: int = 100_000,
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer.

    Train: sample corpus -> numpy k-means (few iterations, driver-side on a
    bounded sample). Index: assign every corpus vector to its nearest
    centroid (mapInPandas, one pass). Search: each query probes its
    ``nprobe`` closest lists; the candidate join is an equi-join on
    ``list_id`` — the 100 TB-safe replacement for the brute-force cross
    product. Returns (query_id, neighbor_id, rank).

    Training rows collected to the driver are HARD-CAPPED at
    ``max_train_rows`` regardless of ``sample_fraction`` — a full-corpus
    driver collect at 100 TB is an OOM, and k-means centroid quality
    saturates far below 100k samples for n_lists this small.
    """
    if _peek_dim(corpus, vec_col) is None:
        return _empty_result(
            queries,
            [("query_id", id_col), ("neighbor_id", id_col),
             ("rank", T.LongType())],
        )
    sample = corpus.select(vec_col)
    if sample_fraction < 1.0:
        sample = sample.sample(fraction=sample_fraction, seed=seed)
    sample = sample.limit(max_train_rows)
    rows = sample.collect()
    if not rows:
        # a Bernoulli sample of a tiny corpus can come back empty even
        # though the corpus is not — train on the capped head instead of
        # crashing centroid init (r9 fuzz sweep, "single" seed)
        rows = corpus.select(vec_col).limit(max_train_rows).collect()
    train = np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    centroids = train[rng.choice(len(train), size=min(n_lists, len(train)), replace=False)]
    for _ in range(10):  # Lloyd iterations on the sample
        assign = np.argmax(train @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = train[assign == c]
            if len(members):
                centroid = members.mean(axis=0)
                centroids[c] = centroid / np.linalg.norm(centroid)
    bc = spark.sparkContext.broadcast(centroids)

    assign_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("__vec", T.ArrayType(T.DoubleType())),
        ]
    )

    def assign_lists(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            lists = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "list_id": lists,
                    "__vec": list(mat),
                }
            )

    indexed = corpus.select(id_col, vec_col).mapInPandas(
        assign_lists, schema=assign_schema
    )

    probe_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("__qvec", T.ArrayType(T.DoubleType())),
        ]
    )

    def probe_lists(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            near = np.argsort(-(mat @ cents.T), axis=1)[:, :nprobe]
            rows = []
            for i, qid in enumerate(pdf[id_col].to_numpy(dtype=np.int64)):
                for lid in near[i]:
                    rows.append((qid, int(lid), mat[i]))
            yield pd.DataFrame(rows, columns=["query_id", "list_id", "__qvec"])

    probes = queries.select(id_col, vec_col).mapInPandas(
        probe_lists, schema=probe_schema
    )

    scored = (
        indexed.join(F.broadcast(probes), on="list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            # fold-state: zip_with over equal-dim non-NULL vectors;
            # non-nullable double init safe
            F.aggregate(
                F.zip_with(
                    F.col("__vec"), F.col("__qvec"), lambda x, y: x * y
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplane_lsh_pairs(
    spark: SparkSession,
    corpus: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 16,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Cosine near-dup pairs via random-hyperplane (SimHash-for-vectors)
    LSH: ``n_tables`` independent sign-bit sketches of ``n_bits`` planes
    each; two vectors are candidates if any table's full sketch matches
    (P[bit match] = 1 - angle/pi, so near-parallel vectors collide with
    high probability). Candidates are then exactly re-scored and filtered
    by the true cosine threshold.

    The candidate join is an equi-join on (table_id, sketch) — the 100 TB
    replacement for the brute-force O(n^2) pair scan in
    ``cosine_pairs_above``. Planes are derived deterministically from
    ``seed``, so sketches are stable across runs/retries.
    """
    dim = _peek_dim(corpus, vec_col)
    if dim is None:
        return _empty_result(corpus, [("id_a", id_col), ("id_b", id_col)])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_bits, dim))
    bp = spark.sparkContext.broadcast(planes)

    sketch_schema = T.StructType(
        [
            T.StructField("__id", T.LongType()),
            T.StructField("table_id", T.IntegerType()),
            T.StructField("sketch", T.LongType()),
        ]
    )

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pls = bp.value
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            out = []
            for t in range(n_tables):
                bits = (mat @ pls[t].T) > 0  # (rows, n_bits)
                codes = bits @ weights
                out.append(
                    pd.DataFrame(
                        {
                            "__id": ids,
                            "table_id": t,
                            "sketch": codes.astype(np.int64),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    # ids-only through the candidate self-join: carrying the dense vectors
    # through the (table_id, sketch) shuffle multiplies shuffle bytes by
    # the vector width; join them back for re-scoring instead — candidate
    # pairs are a vanishing fraction of the corpus at any scale. The sketch
    # table is materialized so the mapInPandas kernel runs once, not once
    # per join side.
    sketched = materialize(
        corpus.select(id_col, vec_col).mapInPandas(sketch, schema=sketch_schema),
        "hp_sketches_",
    )
    cand = (
        sketched.alias("l")
        .join(sketched.alias("r"), on=["table_id", "sketch"])
        .filter(F.col("l.__id") < F.col("r.__id"))
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    to_dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    va = corpus.select(
        F.col(id_col).alias("id_a"), to_dbl(F.col(vec_col)).alias("__va")
    )
    vb = corpus.select(
        F.col(id_col).alias("id_b"), to_dbl(F.col(vec_col)).alias("__vb")
    )
    rescored = cand.join(va, "id_a").join(vb, "id_b")
    # fold-state: equal-dim non-NULL corpus vectors; non-nullable double
    # init safe for the dot and both norm folds below
    score = F.aggregate(
        F.zip_with(F.col("__va"), F.col("__vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / (
        F.sqrt(F.aggregate(F.col("__va"), F.lit(0.0), lambda a, x: a + x * x))
        * F.sqrt(F.aggregate(F.col("__vb"), F.lit(0.0), lambda a, x: a + x * x))
    )
    return (
        rescored.withColumn("score", score)
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b")
    )


def md5_plane_weights(
    n_tables: int, n_bits: int, dim: int
) -> list[tuple[int, int, int, int]]:
    """Deterministic integer hyperplane weights derived from md5: for each
    (table, bit, dimension), ``w = int(md5("t:b:d")[:8], 16) - 2^31`` — a
    signed 32-bit value any SQL engine reproduces exactly (the same
    ``('0x' || substr(md5(...), 1, 8))::BIGINT`` trick the multimodal
    embed stub uses). Returns (d, table_id, bit, w) rows."""
    import hashlib

    return [
        (
            d,
            t,
            b,
            int(hashlib.md5(f"{t}:{b}:{d}".encode()).hexdigest()[:8], 16)
            - 2**31,
        )
        for t in range(n_tables)
        for b in range(n_bits)
        for d in range(dim)
    ]


def hyperplane_lsh_pairs_md5(
    spark: SparkSession,
    corpus: DataFrame,
    threshold: float = 0.4,
    n_bits: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 1_000_000,
) -> DataFrame:
    """Engine-exact random-hyperplane LSH near-dup pairs: same banding
    algebra as ``hyperplane_lsh_pairs`` but every arithmetic step is
    integer-exact, so an independent SQL engine reproduces the output
    bit-for-bit (no float summation-order hazards anywhere):

    - vectors quantized to ``floor(x * quant_scale)`` int64 — both engines
      compute the identical double product and floor;
    - plane weights are md5-derived int64 (``md5_plane_weights``);
    - a sketch bit is the sign of an INTEGER dot product (order-free);
    - the cosine threshold is applied by integer cross-multiplication:
      ``den * qdot^2 >= num * |qa|^2 * |qb|^2 (and qdot > 0)`` where
      num/den is the exact rational ``threshold^2`` — evaluated in
      decimal(38,0) (Spark) / HUGEINT (DuckDB), both exact at these
      magnitudes (|qdot| <= dim * quant_scale^2 ~ 1e14 squared ~ 1e28).

    Scale shape: quantized vectors are materialized once; the sketch
    pipeline is a broadcast join against the tiny plane table + two
    keyed aggregations; candidates ride one ids-only self-equi-join on
    (table_id, sketch); vectors join back only for the final re-score.
    Returns (id_a, id_b), id_a < id_b.
    """
    from fractions import Fraction

    dim = _peek_dim(corpus, vec_col)
    if dim is None:
        return _empty_result(corpus, [("id_a", id_col), ("id_b", id_col)])
    frac = Fraction(str(threshold)) ** 2
    num, den = frac.numerator, frac.denominator

    # Quantization is a narrow per-row transform of the source scan; the
    # three consumers (sketch kernel + both re-score sides) just recompute
    # it — cheaper than a store/read round trip at any scale.
    q = corpus.select(
        F.col(id_col).cast("long").alias("vid"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(float(quant_scale))
            ).cast("long"),
        ).alias("qv"),
    )
    # Sketch stage: Arrow-batched INTEGER matmul against the broadcast
    # plane matrix — int64 arithmetic is order-free, so the numpy fast
    # path is bit-identical to the oracle's SUM. (A pure column-expression
    # form was tried and rejected: n_tables*n_bits*dim literal terms make
    # Catalyst's own tree walks the bottleneck; an explode + plane-table
    # join shuffles |corpus| x dim rows for no benefit. The kernel is the
    # same shape a real embedding model runs in.)
    planes = np.empty((n_tables, n_bits, dim), dtype=np.int64)
    for d, t, b, w in md5_plane_weights(n_tables, n_bits, dim):
        planes[t, b, d] = w
    bp = spark.sparkContext.broadcast(planes)
    sketch_schema = T.StructType(
        [
            T.StructField("vid", T.LongType()),
            T.StructField("table_id", T.IntegerType()),
            T.StructField("sketch", T.LongType()),
        ]
    )

    def sketch_kernel(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        pls = bp.value
        weights = (np.int64(1) << np.arange(n_bits, dtype=np.int64))
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf["qv"].to_numpy()).astype(np.int64)
            ids = pdf["vid"].to_numpy(dtype=np.int64)
            out = []
            for t in range(n_tables):
                dots = mat @ pls[t].T  # exact int64 dot products
                codes = (dots > 0) @ weights
                out.append(
                    pd.DataFrame(
                        {
                            "vid": ids,
                            "table_id": t,
                            "sketch": codes.astype(np.int64),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    sk = materialize(
        q.select("vid", "qv").mapInPandas(sketch_kernel, schema=sketch_schema),
        "hp_sketch_",
    )
    cand = (
        sk.alias("l")
        .join(sk.alias("r"), on=["table_id", "sketch"])
        .filter(F.col("l.vid") < F.col("r.vid"))
        .select(
            F.col("l.vid").alias("id_a"), F.col("r.vid").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    qa = q.select(F.col("vid").alias("id_a"), F.col("qv").alias("__qa"))
    qb = q.select(F.col("vid").alias("id_b"), F.col("qv").alias("__qb"))

    # fold-state: quantized int64 arrays are non-NULL; non-nullable init safe
    def long_sum(arr: F.Column) -> F.Column:
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, x: acc + x
        )

    scored = (
        cand.join(qa, "id_a")
        .join(qb, "id_b")
        .withColumn(
            "__qdot",
            long_sum(
                F.zip_with(F.col("__qa"), F.col("__qb"), lambda x, y: x * y)
            ),
        )
        .withColumn(
            "__na", long_sum(F.transform(F.col("__qa"), lambda x: x * x))
        )
        .withColumn(
            "__nb", long_sum(F.transform(F.col("__qb"), lambda x: x * x))
        )
    )
    dec = "decimal(38,0)"
    keep = (F.col("__qdot") > 0) & (
        F.lit(den).cast(dec)
        * (F.col("__qdot").cast(dec) * F.col("__qdot").cast(dec))
        >= F.lit(num).cast(dec) * (F.col("__na").cast(dec) * F.col("__nb").cast(dec))
    )
    return scored.filter(keep).select("id_a", "id_b")


def md5_pq_codebook(
    n_subspaces: int, n_centroids: int, sub_dim: int, scale: int = 1000
) -> "np.ndarray":
    """Deterministic product-quantization codebook: centroid component
    ``(s, c, j)`` is an md5-derived integer in [-scale, scale) — the same
    engine-portable construction as ``md5_plane_weights``. A production
    pipeline trains centroids with k-means; the codebook here is fixed so
    the encode step (the part that runs over 100 TB) is exactly
    verifiable in any engine."""
    import hashlib

    cb = np.empty((n_subspaces, n_centroids, sub_dim), dtype=np.int64)
    for s in range(n_subspaces):
        for c in range(n_centroids):
            for j in range(sub_dim):
                h = hashlib.md5(f"pq:{s}:{c}:{j}".encode()).hexdigest()[:8]
                cb[s, c, j] = int(h, 16) % (2 * scale) - scale
    return cb


def pq_encode(
    spark: SparkSession,
    corpus: DataFrame,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 1000,
) -> DataFrame:
    """Product-quantization encoding — the vector-compression step of an
    IVF-PQ index: split each vector into ``n_subspaces`` contiguous
    subvectors, assign each to its nearest codebook centroid by L2, pack
    the centroid ids into one int64 code (4 bits per subspace for 16
    centroids). 64x compression of a float64[64] at 100 TB scale.

    Engine-exact: vectors are quantized to integers (``floor(x * scale)``),
    centroids ARE integers, so squared distances are exact int64 sums and
    the argmin (ties broken by lowest centroid id) is deterministic. The
    kernel is an Arrow-batched integer numpy pass over the broadcast
    codebook — no shuffle at all; the code column is a narrow projection
    of the corpus.
    Returns (id, pq_code).
    """
    dim = _peek_dim(corpus, vec_col)
    if dim is None:
        return _empty_result(corpus, [(id_col, id_col), ("pq_code", T.LongType())])
    sub_dim = dim // n_subspaces
    cb = md5_pq_codebook(n_subspaces, n_centroids, sub_dim, quant_scale)
    bcb = spark.sparkContext.broadcast(cb)

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("pq_code", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codebook = bcb.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            qmat = np.floor(mat * quant_scale).astype(np.int64)
            codes = np.zeros(len(pdf), dtype=np.int64)
            for s in range(n_subspaces):
                sub = qmat[:, s * sub_dim : (s + 1) * sub_dim]
                # (rows, cents): exact integer squared distances
                diffs = sub[:, None, :] - codebook[s][None, :, :]
                d2 = np.einsum("rcj,rcj->rc", diffs, diffs)
                # np.argmin takes the FIRST minimum -> lowest centroid id,
                # matching the SQL tie-break
                best = np.argmin(d2, axis=1).astype(np.int64)
                codes |= best << (4 * s)
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "pq_code": codes}
            )

    return corpus.select(id_col, vec_col).mapInPandas(kernel, schema=out_schema)


def md5_coarse_centroids(
    n_lists: int, dim: int, scale: int = 1000
) -> "np.ndarray":
    """Deterministic IVF coarse-quantizer centroids, same md5-integer
    construction as ``md5_pq_codebook`` (component (l, j) from
    md5('ivf:l:j')). Production trains these with k-means; fixing them
    makes the whole search path exactly verifiable."""
    import hashlib

    cc = np.empty((n_lists, dim), dtype=np.int64)
    for li in range(n_lists):
        for j in range(dim):
            h = hashlib.md5(f"ivf:{li}:{j}".encode()).hexdigest()[:8]
            cc[li, j] = int(h, 16) % (2 * scale) - scale
    return cc


def ivfpq_topk(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    nprobe: int = 2,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 1000,
) -> DataFrame:
    """IVF-PQ approximate nearest-neighbour search, end to end:

    1. **Index** (one corpus pass, no shuffle): every vector is assigned
       to its nearest coarse centroid (integer L2, ties to the lowest
       list id) and PQ-encoded against the subspace codebook — the
       corpus is represented as (id, list_id, pq_code): 12 bytes/vector.
    2. **Probe**: each query (small frame, collected like
       ``cosine_topk_np``'s queries) selects its ``nprobe`` nearest
       coarse lists and precomputes the 16 x n_subspaces ADC lookup
       table of integer distances to every codebook centroid.
    3. **Scan**: candidates = index rows equi-joined to the broadcast
       (query, list) probe table — the only shuffle-ish step, and it
       moves codes, not vectors. ADC distance = sum of LUT entries
       selected by the code's nibbles (Arrow-batched integer lookups).
    4. **Top-k** per query by (adc_dist asc, neighbor id asc).

    Every arithmetic step is int64, so the FULL APPROXIMATE pipeline —
    not just an exact-mode configuration — has a bit-exact SQL oracle.
    Returns (query_id, neighbor_id, adc_dist, rank).
    """
    dim = _peek_dim(corpus, vec_col)
    if dim is None:
        return _empty_result(
            queries,
            [
                ("query_id", id_col),
                ("neighbor_id", id_col),
                ("adc_dist", T.LongType()),
                ("rank", T.LongType()),
            ],
        )
    sub_dim = dim // n_subspaces
    cb = md5_pq_codebook(n_subspaces, n_centroids, sub_dim, quant_scale)
    cc = md5_coarse_centroids(n_lists, dim, quant_scale)
    bcb = spark.sparkContext.broadcast(cb)
    bcc = spark.sparkContext.broadcast(cc)

    idx_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("pq_code", T.LongType()),
        ]
    )

    def index_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codebook, coarse = bcb.value, bcc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            qmat = np.floor(mat * quant_scale).astype(np.int64)
            cd = ((qmat[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
            list_id = np.argmin(cd, axis=1).astype(np.int32)  # first min = lowest id
            codes = np.zeros(len(pdf), dtype=np.int64)
            for s in range(n_subspaces):
                sub = qmat[:, s * sub_dim : (s + 1) * sub_dim]
                diffs = sub[:, None, :] - codebook[s][None, :, :]
                d2 = np.einsum("rcj,rcj->rc", diffs, diffs)
                codes |= np.argmin(d2, axis=1).astype(np.int64) << (4 * s)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].astype("int64"),
                    "list_id": list_id,
                    "pq_code": codes,
                }
            )

    index = corpus.select(id_col, vec_col).mapInPandas(
        index_kernel, schema=idx_schema
    )

    qrows = queries.select(id_col, vec_col).collect()  # queries are small
    probe_rows = []
    luts: dict[int, "np.ndarray"] = {}
    for r in qrows:
        qid = int(r[0])
        qv = np.floor(np.asarray(r[1], dtype=np.float64) * quant_scale).astype(
            np.int64
        )
        cdist = ((cc - qv[None, :]) ** 2).sum(axis=1)
        order = np.argsort(cdist, kind="stable")[:nprobe]  # ties -> low list id
        probe_rows.extend((qid, int(li)) for li in order)
        lut = np.empty((n_subspaces, n_centroids), dtype=np.int64)
        for s in range(n_subspaces):
            sub = qv[s * sub_dim : (s + 1) * sub_dim]
            lut[s] = ((cb[s] - sub[None, :]) ** 2).sum(axis=1)
        luts[qid] = lut
    probes = spark.createDataFrame(
        probe_rows, schema="query_id LONG, list_id INT"
    )
    bluts = spark.sparkContext.broadcast(luts)

    cand = index.join(F.broadcast(probes), "list_id")

    adc_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("adc_dist", T.LongType()),
        ]
    )

    def adc_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables = bluts.value
        for pdf in batches:
            if pdf.empty:
                continue
            codes = pdf["pq_code"].to_numpy(dtype=np.int64)
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            dists = np.zeros(len(pdf), dtype=np.int64)
            for qid in np.unique(qids):
                mask = qids == qid
                lut = tables[int(qid)]
                sub_codes = codes[mask]
                acc = np.zeros(mask.sum(), dtype=np.int64)
                for s in range(n_subspaces):
                    nib = (sub_codes >> (4 * s)) & 15
                    acc += lut[s][nib]
                dists[mask] = acc
            yield pd.DataFrame(
                {
                    "query_id": qids,
                    "neighbor_id": pdf["neighbor_id"].to_numpy(dtype=np.int64),
                    "adc_dist": dists,
                }
            )

    scored = cand.mapInPandas(adc_kernel, schema=adc_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def semantic_dedup(
    spark: SparkSession,
    corpus: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 1000,
) -> DataFrame:
    """SemDeDup-shape semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then inside each
    cluster drop every vector that has a near-identical (cosine >=
    ``threshold``) neighbour with a lower id — the survivor of each
    semantic-duplicate group is its lowest id, a deterministic stand-in
    for SemDeDup's keep-farthest-from-centroid rule.

    Engine-exact end to end: centroids are md5-derived integers
    (``md5_coarse_centroids``), vectors quantize to int64 via
    ``floor(x * scale)``, cluster assignment is an exact integer-L2
    argmin (ties to the lowest cluster id), and pair cosine is
    ``int_dot / (sqrt(int_norm_a) * sqrt(int_norm_b))`` — int64 sums are
    order-free, int->double conversion is exact below 2^53, and sqrt /
    multiply / divide each round once, identically, in any IEEE engine.

    Scale shape: one Arrow-batched corpus pass (no shuffle) produces the
    (id, cluster, quantized-vector, norm) assignment table, which is
    MATERIALIZED once; the duplicate verdicts come from ONE shuffle of
    that table by cluster_id into a per-cluster int64 gram-matrix kernel
    (``applyInPandas``) — a pairwise self-JOIN instead would move every
    candidate pair's two 64-long arrays through the shuffle (measured
    12.3s vs 1s at sf0.1). Within-cluster work is quadratic in cluster
    size, the SemDeDup cost model: at scale ``n_clusters`` grows with the
    corpus so clusters stay bounded (the paper uses ~10k-100k clusters
    for web corpora). Zero-norm vectors never match anything (guarded,
    same in both engines).

    Returns one row per input vector: (id, cluster_id, kept).
    """
    dim = _peek_dim(corpus, vec_col)
    if dim is None:
        return _empty_result(
            corpus,
            [(id_col, id_col), ("cluster_id", T.LongType()), ("kept", T.BooleanType())],
        )
    cc = md5_coarse_centroids(n_clusters, dim, quant_scale)
    bcc = spark.sparkContext.broadcast(cc)

    assign_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cluster_id", T.LongType()),
            T.StructField("qv", T.ArrayType(T.LongType())),
            T.StructField("norm_sq", T.LongType()),
        ]
    )

    def assign_kernel(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        coarse = bcc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            qm = np.floor(mat * quant_scale).astype(np.int64)
            diffs = qm[:, None, :] - coarse[None, :, :]
            d2 = np.einsum("rlj,rlj->rl", diffs, diffs)
            # np.argmin takes the FIRST minimum -> lowest cluster id,
            # matching the SQL (d ASC, l ASC) tie-break
            cl = np.argmin(d2, axis=1).astype(np.int64)
            norms = np.einsum("rj,rj->r", qm, qm)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "cluster_id": cl,
                    "qv": list(qm),
                    "norm_sq": norms,
                }
            )

    assign = materialize(
        corpus.select(id_col, vec_col).mapInPandas(
            assign_kernel, schema=assign_schema
        ),
        "semdedup_assign_",
    )

    drop_schema = T.StructType([T.StructField(id_col, T.LongType())])

    def cluster_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        qm = np.vstack(pdf["qv"].to_numpy()).astype(np.float64)
        norms = pdf["norm_sq"].to_numpy(dtype=np.int64)
        # float64 BLAS matmul, still EXACT when dim * scale^2 < 2^53:
        # |component| <= scale so every product and every partial sum is
        # an exactly-represented integer (<= 6.4e7 at the defaults),
        # whatever order BLAS accumulates in. An int64 matmul (no BLAS
        # kernel) measured 40x slower on 6k-vector clusters; it remains
        # the fallback when the bound doesn't hold.
        if dim * quant_scale * quant_scale < 2**53:
            gram = qm @ qm.T
        else:
            qi = qm.astype(np.int64)
            gram = (qi @ qi.T).astype(np.float64)
        denom = np.sqrt(norms.astype(np.float64))
        with np.errstate(divide="ignore", invalid="ignore"):
            # double(dot) / (sqrt(na) * sqrt(nb)): the same three IEEE
            # roundings, in the same order, as the SQL oracle
            cos = gram / (denom[:, None] * denom[None, :])
        valid = norms > 0
        hit = (cos >= threshold) & valid[:, None] & valid[None, :]
        # b dropped iff some LOWER id in the cluster is a near-dup: rows
        # are id-sorted, so "lower id" = strict upper triangle by column
        hit &= np.triu(np.ones_like(hit, dtype=bool), k=1)
        return pd.DataFrame({id_col: ids[hit.any(axis=0)]})

    dropped = (
        assign.select(id_col, "cluster_id", "qv", "norm_sq")
        .groupBy("cluster_id")
        .applyInPandas(cluster_kernel, schema=drop_schema)
    )
    return (
        assign.join(
            dropped.withColumn("__dropped", F.lit(1)), on=id_col, how="left"
        )
        .select(
            F.col(id_col),
            F.col("cluster_id"),
            F.col("__dropped").isNull().alias("kept"),
        )
    )


def kmeans_refine(
    spark: SparkSession,
    corpus: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 1000,
) -> DataFrame:
    """One exact Lloyd (k-means) refinement step over the embedding
    space: assign every vector to its nearest md5-seeded centroid,
    recompute each cluster's mean, re-assign against the refined
    centroids. This is the training step the IVF / SemDeDup paths stub
    out with fixed md5 centroids — here the full distributed iterate is
    real, and exact.

    Integer end to end, so both engines agree bit for bit with NO float
    rounding anywhere: vectors quantize to int64 (``floor(x * scale)``),
    assignment-0 is integer L2 against integer centroids, per-cluster
    component sums/counts are exact int64 aggregates, and the refined
    centroid components are fixed-point milli-units computed by exact
    rational half-away-from-zero rounding ``(2*s*1000 + c) // (2*c)`` —
    assignment-1 is then integer L2 on the x1000 grid.

    Scale shape: two Arrow-batched corpus passes (assignment kernels
    against a broadcast centroid matrix — no shuffle), one tiny
    partial-agg shuffle for the Lloyd update (n_clusters x dim groups),
    and a metadata-scale driver collect of the refined centroids
    (n_clusters x dim values — same driver budget as ``ivf_topk``'s
    trained centroids). Returns (id, cluster0, cluster1, moved).
    """
    dim = _peek_dim(corpus, vec_col)
    if dim is None:
        return _empty_result(
            corpus,
            [
                (id_col, id_col),
                ("cluster0", T.LongType()),
                ("cluster1", T.LongType()),
                ("moved", T.BooleanType()),
            ],
        )
    cc = md5_coarse_centroids(n_clusters, dim, quant_scale)
    bcc = spark.sparkContext.broadcast(cc)

    assign_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cluster0", T.LongType()),
            T.StructField("qv", T.ArrayType(T.LongType())),
        ]
    )

    def assign0_kernel(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        coarse = bcc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            qm = np.floor(mat * quant_scale).astype(np.int64)
            diffs = qm[:, None, :] - coarse[None, :, :]
            d2 = np.einsum("rlj,rlj->rl", diffs, diffs)
            cl = np.argmin(d2, axis=1).astype(np.int64)  # first min = low l
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "cluster0": cl,
                    "qv": list(qm),
                }
            )

    assign = materialize(
        corpus.select(id_col, vec_col).mapInPandas(
            assign0_kernel, schema=assign_schema
        ),
        "kmeans_assign_",
    )

    # Lloyd update: exact integer component sums + counts. posexplode to
    # (cluster0, j) rows -> n_clusters*dim groups; partial aggregation
    # makes the shuffle metadata-sized regardless of corpus size.
    sums = (
        assign.select(
            "cluster0", F.posexplode("qv").alias("j", "qx")
        )
        .groupBy("cluster0", "j")
        .agg(F.sum("qx").cast("long").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    refined = cc * quant_scale  # empty clusters keep their seed (x1000 grid)
    for row in sums:
        s, c = int(row.s) * quant_scale, int(row.c)
        if s >= 0:
            m = (2 * s + c) // (2 * c)
        else:
            m = -((2 * (-s) + c) // (2 * c))
        refined[row.cluster0, row.j] = m
    bref = spark.sparkContext.broadcast(refined)

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cluster0", T.LongType()),
            T.StructField("cluster1", T.LongType()),
            T.StructField("moved", T.BooleanType()),
        ]
    )

    def assign1_kernel(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        cents = bref.value
        for pdf in batches:
            if pdf.empty:
                continue
            qm = np.vstack(pdf["qv"].to_numpy()).astype(np.int64)
            scaled = qm * quant_scale  # same x1000 grid as the centroids
            diffs = scaled[:, None, :] - cents[None, :, :]
            d2 = np.einsum("rlj,rlj->rl", diffs, diffs)
            cl = np.argmin(d2, axis=1).astype(np.int64)
            c0 = pdf["cluster0"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "cluster0": c0,
                    "cluster1": cl,
                    "moved": cl != c0,
                }
            )

    return assign.mapInPandas(assign1_kernel, schema=out_schema)


def int8_quant_stats(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization audit per vector — the compression
    step an embedding store applies before ANN serving: per-vector scale
    ``amax = max(|x|)``, codes ``q_i = round(127 * x_i / amax)``,
    saturation count (``|q_i| = 127``) and reconstruction SSE.

    Exact on the micro-quantized grid, with NO per-element float
    rounding: vectors quantize to int64 (``floor(x * 1e6)``, the LSH
    scale), the per-vector scale is the integer ``amax = max(|qx|)``,
    codes come from exact rational half-away rounding
    ``qd = sign * (2*127*|qx| + amax) // (2*amax)``, and the residual
    numerator ``N = 127*qx - qd*amax`` is an exact int64 whose squared
    sum divides ONCE by the exactly-representable ``(127e6)^2`` — every
    intermediate is an integer, so both engines agree to the last bit.
    (A 12-dp decimal-rounded float formulation was tried first and
    disagreed by 1e-12 quanta on ~0.05% of elements: squared residuals
    ~1e-8 sit right at the rounding granularity, where Spark's
    BigDecimal HALF_UP and DuckDB's scaled-double round diverge.)
    Shuffle-free narrow scan. Zero vectors (amax = 0) are excluded.
    """
    qv = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * F.lit(1000000.0)).cast("long"),
    )
    base = df.select(
        F.col(id_col),
        qv.alias("__q"),
        F.array_max(
            F.transform(qv, lambda q: F.abs(q))
        ).alias("__amax"),
    ).filter(F.col("__amax") > 0)
    amax = F.col("__amax")

    def _terms(q):
        qd_abs = (F.lit(2) * F.lit(127) * F.abs(q) + amax) / (F.lit(2) * amax)
        qd = F.signum(q.cast("double")).cast("long") * F.floor(qd_abs).cast(
            "long"
        )
        n = F.lit(127) * q - qd * amax
        return F.struct(
            (n * n).alias("n2"),
            (F.abs(qd) == 127).cast("long").alias("sat"),
        )

    terms = F.transform(F.col("__q"), _terms)
    return base.select(
        F.col(id_col),
        (amax.cast("double") / F.lit(1000000.0)).alias("amax"),
        # fold-state: __q terms come from F.transform over non-NULL
        # quantized arrays; non-nullable long init safe (both folds)
        F.aggregate(
            terms,
            F.lit(0).cast("long"),
            lambda acc, t: acc + t["sat"],
        ).alias("n_saturated"),
        (
            F.aggregate(
                terms,
                F.lit(0).cast("long"),
                lambda acc, t: acc + t["n2"],
            ).cast("double")
            / (F.lit(127000000.0) * F.lit(127000000.0))
        ).alias("sse"),
    )


def embedding_dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension corpus statistics (mean / variance / extrema) over
    the embedding space — the whitening / PCA-prep pass an embedding
    pipeline runs before normalization or dimensionality reduction.

    Exact: vectors quantize to int64 micro-units, per-dimension sums and
    squared sums are exact int64/decimal aggregates (sum^2 goes through
    DECIMAL(38) — at 1e6-scale quanta it exceeds int64), and the only
    float ops are the final scaled divisions, identical in any IEEE
    engine. One posexplode + one dim-keyed aggregation (dim rows out);
    partial aggregation makes the shuffle dim-sized regardless of corpus
    size.
    """
    el = df.select(F.posexplode(vec_col).alias("j", "__x")).select(
        "j", F.floor(F.col("__x").cast("double") * F.lit(1000000.0)).cast("long").alias("qx")
    )
    # cast BEFORE the sum: qx^2 is ~1e12, so a long sum silently wraps
    # past ~9.2e6 rows per dimension (and the plain qx sum past ~9.2e12);
    # summing DECIMAL(38,0) terms is exact at any corpus size and matches
    # the DuckDB oracle's exact HUGEINT accumulation.
    agg = el.groupBy("j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qx").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s"),
        F.sum(
            (F.col("qx") * F.col("qx")).cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("ss"),
        F.min("qx").alias("qmin"),
        F.max("qx").alias("qmax"),
    )
    n_d = F.col("n").cast("double")
    micro = F.lit(1000000.0)
    return agg.select(
        F.col("j").cast("long").alias("dim"),
        (F.col("s").cast("double") / n_d / micro).alias("mean"),
        (
            (F.col("n").cast("decimal(38,0)") * F.col("ss") - F.col("s") * F.col("s"))
            .cast("double")
            / (n_d * n_d)
            / (micro * micro)
        ).alias("variance"),
        (F.col("qmin").cast("double") / micro).alias("dim_min"),
        (F.col("qmax").cast("double") / micro).alias("dim_max"),
    )


def matryoshka_prefix_norms(
    df: DataFrame,
    prefixes: tuple = (16, 32),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-representation audit: what fraction of each vector's
    norm mass lives in its first k dimensions, for the typical MRL
    truncation points. ``share_k = sqrt(norm_k / norm_full)`` is exactly
    ``cosine(full, prefix-truncated)``, so this is the per-vector quality
    loss of serving truncated embeddings.

    Integer norms on the micro-quantized grid; one division + one sqrt
    per share (single-rounding IEEE, engine-exact). Shuffle-free narrow
    scan. Zero-norm vectors are excluded.
    """
    qv = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * F.lit(1000000.0)).cast("long"),
    )
    sq = F.transform(qv, lambda q: q * q)

    # fold-state: floor-quantized int64 elements are non-NULL;
    # non-nullable init safe
    def norm_of(arr, k=None):
        sliced = F.slice(arr, 1, k) if k else arr
        return F.aggregate(
            sliced, F.lit(0).cast("long"), lambda a, x: a + x
        )

    base = df.select(
        F.col(id_col),
        norm_of(sq).alias("norm_full"),
        *[norm_of(sq, k).alias(f"norm_{k}") for k in prefixes],
    ).filter(F.col("norm_full") > 0)
    return base.select(
        F.col(id_col),
        "norm_full",
        *[
            F.sqrt(
                F.col(f"norm_{k}").cast("double")
                / F.col("norm_full").cast("double")
            ).alias(f"share_{k}")
            for k in prefixes
        ],
    )


def embedding_outlier_rate(
    df: DataFrame,
    vec_col: str = "embedding",
    n_sigma: float = 3.0,
) -> DataFrame:
    """Per-dimension outlier audit over the embedding space: the share of
    values outside ``mean ± n_sigma * stddev`` of their OWN dimension —
    the pre-whitening screen that catches dead dims (rate 0 with zero
    variance) and heavy-tailed dims that will dominate a cosine after
    normalization.

    Statistics ride the exact integer grid of ``embedding_dim_stats``
    (micro-quantized values; DECIMAL sums), so mean/variance are the
    same two exact-int-to-double divisions in any engine, and the bound
    compare is pure double arithmetic on identical inputs — oracle-exact
    without any tolerance. Two dim-keyed aggregations with a broadcast
    stats join-back; the corpus explodes once per pass.
    Returns (dim, n, n_outliers, outlier_rate).
    """
    el = df.select(F.posexplode(vec_col).alias("j", "__x")).select(
        "j",
        F.floor(F.col("__x").cast("double") * F.lit(1000000.0))
        .cast("long")
        .alias("qx"),
    )
    stats = el.groupBy("j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qx").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("qx") * F.col("qx")).cast("decimal(38,0)")).alias("ss"),
    )
    n_d = F.col("n").cast("double")
    mean_q = F.col("s").cast("double") / n_d
    var_q = (
        (
            F.col("n").cast("decimal(38,0)") * F.col("ss")
            - F.col("s") * F.col("s")
        ).cast("double")
        / (n_d * n_d)
    )
    bounds = stats.select(
        "j",
        mean_q.alias("__mean_q"),
        (F.lit(float(n_sigma)) * F.sqrt(var_q)).alias("__band_q"),
    )
    flagged = el.join(F.broadcast(bounds), "j")
    is_out = (
        F.abs(F.col("qx").cast("double") - F.col("__mean_q"))
        > F.col("__band_q")
    )
    return flagged.groupBy("j").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
        (
            F.sum(F.when(is_out, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("outlier_rate"),
    ).select(
        F.col("j").cast("long").alias("dim"), "n", "n_outliers", "outlier_rate"
    )


def ivfpq_residual_topk(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    nprobe: int = 2,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 1000,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the production IVFADC layout
    (Jegou et al., "Product Quantization for Nearest Neighbor Search"):
    each vector is PQ-encoded against its residual from the assigned
    coarse centroid, r = v - c_list, instead of against the raw vector.
    Residuals concentrate near the origin, so the same codebook budget
    quantizes them with far less error — the reason every serious IVF
    deployment encodes residuals. The price is a LIST-dependent ADC
    table: the query's lookup table is built per probed list from
    (q - c_list), nprobe tables per query instead of one.

    Residual concentration REQUIRES data-adapted coarse centroids (the
    residual from a random centroid is wider than the raw vector, not
    narrower — measured 2.3x worse self-quantization error with the md5
    centroids). So the coarse quantizer here is ONE deterministic Lloyd
    step from the md5 init: per-list integer means of the vectors the
    init assigns (floor(sum/count), empty lists keep their init
    centroid) — the ``kmeans_refine`` convention, computed with one
    Arrow partial-stats pass + a (lists x dims)-row rollup, never a
    corpus collect.

    Same engine-exact discipline as ``ivfpq_topk``: integer-quantized
    vectors, integer centroids/codebook, int64 distances end to end,
    argmin ties to the lowest id — the FULL approximate pipeline
    (including the training step) has a bit-exact SQL oracle. Plan shape
    adds the training rollup before the index pass; the search half is
    unchanged (broadcast probe join -> Arrow ADC scan -> per-query
    top-k) with the LUT keyed by (query, probed list).
    Returns (query_id, neighbor_id, adc_dist, rank).
    """
    dim = _peek_dim(corpus, vec_col)
    if dim is None:
        return _empty_result(
            queries,
            [
                ("query_id", id_col),
                ("neighbor_id", id_col),
                ("adc_dist", T.LongType()),
                ("rank", T.LongType()),
            ],
        )
    sub_dim = dim // n_subspaces
    cb = md5_pq_codebook(n_subspaces, n_centroids, sub_dim, quant_scale)
    cc0 = md5_coarse_centroids(n_lists, dim, quant_scale)
    bcb = spark.sparkContext.broadcast(cb)
    bcc0 = spark.sparkContext.broadcast(cc0)

    # --- one Lloyd step: per-list integer means under the init assignment
    stats_schema = T.StructType(
        [
            T.StructField("list_id", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("s", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def train_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        coarse = bcc0.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            qmat = np.floor(mat * quant_scale).astype(np.int64)
            cd = ((qmat[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(cd, axis=1)
            rows = {"list_id": [], "j": [], "s": [], "n": []}
            for li in np.unique(a):
                mask = a == li
                sums = qmat[mask].sum(axis=0)
                cnt = int(mask.sum())
                for j in range(dim):
                    rows["list_id"].append(int(li))
                    rows["j"].append(j)
                    rows["s"].append(int(sums[j]))
                    rows["n"].append(cnt)
            yield pd.DataFrame(rows)

    stats = (
        corpus.select(id_col, vec_col)
        .mapInPandas(train_kernel, schema=stats_schema)
        .groupBy("list_id", "j")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()  # (n_lists x dim) rows — metadata-scale
    )
    cc = cc0.copy()
    for r in stats:
        # floor(sum/count) — exact while |sum| < 2^53, matches the SQL
        # FLOOR(CAST(s AS DOUBLE) / n) twin
        cc[r["list_id"], r["j"]] = int(np.floor(r["s"] / r["n"]))
    bcc = spark.sparkContext.broadcast(cc)

    # --- one Lloyd step on the PQ codebook too: per-(subspace, centroid)
    # integer means of the residual subvectors the md5 codebook assigns.
    # Without this the residual gain is marginal — a random codebook
    # spread over the full cube quantizes a concentrated residual ball no
    # better than a raw vector (measured: 0.5% vs 2.5x after training).
    cbstats_schema = T.StructType(
        [
            T.StructField("s", T.IntegerType()),
            T.StructField("c", T.IntegerType()),
            T.StructField("sj", T.IntegerType()),
            T.StructField("sm", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def cb_train_kernel(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        codebook, coarse = bcb.value, bcc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            qmat = np.floor(mat * quant_scale).astype(np.int64)
            cd = ((qmat[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
            resid = qmat - coarse[np.argmin(cd, axis=1)]
            rows = {"s": [], "c": [], "sj": [], "sm": [], "n": []}
            for s in range(n_subspaces):
                sub = resid[:, s * sub_dim : (s + 1) * sub_dim]
                diffs = sub[:, None, :] - codebook[s][None, :, :]
                d2 = np.einsum("rcj,rcj->rc", diffs, diffs)
                a = np.argmin(d2, axis=1)
                for c in np.unique(a):
                    mask = a == c
                    sums = sub[mask].sum(axis=0)
                    cnt = int(mask.sum())
                    for sj in range(sub_dim):
                        rows["s"].append(s)
                        rows["c"].append(int(c))
                        rows["sj"].append(sj)
                        rows["sm"].append(int(sums[sj]))
                        rows["n"].append(cnt)
            yield pd.DataFrame(rows)

    cb_stats = (
        corpus.select(id_col, vec_col)
        .mapInPandas(cb_train_kernel, schema=cbstats_schema)
        .groupBy("s", "c", "sj")
        .agg(F.sum("sm").alias("sm"), F.sum("n").alias("n"))
        .collect()  # <= n_subspaces x n_centroids x sub_dim rows
    )
    cb = cb.copy()
    for r in cb_stats:
        cb[r["s"], r["c"], r["sj"]] = int(np.floor(r["sm"] / r["n"]))
    bcb = spark.sparkContext.broadcast(cb)

    idx_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("list_id", T.IntegerType()),
            T.StructField("pq_code", T.LongType()),
        ]
    )

    def index_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codebook, coarse = bcb.value, bcc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            qmat = np.floor(mat * quant_scale).astype(np.int64)
            cd = ((qmat[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
            list_id = np.argmin(cd, axis=1).astype(np.int32)
            resid = qmat - coarse[list_id]  # <- the residual step
            codes = np.zeros(len(pdf), dtype=np.int64)
            for s in range(n_subspaces):
                sub = resid[:, s * sub_dim : (s + 1) * sub_dim]
                diffs = sub[:, None, :] - codebook[s][None, :, :]
                d2 = np.einsum("rcj,rcj->rc", diffs, diffs)
                codes |= np.argmin(d2, axis=1).astype(np.int64) << (4 * s)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].astype("int64"),
                    "list_id": list_id,
                    "pq_code": codes,
                }
            )

    index = corpus.select(id_col, vec_col).mapInPandas(
        index_kernel, schema=idx_schema
    )

    qrows = queries.select(id_col, vec_col).collect()  # queries are small
    probe_rows = []
    luts: dict[tuple[int, int], "np.ndarray"] = {}  # (query, list) -> LUT
    for r in qrows:
        qid = int(r[0])
        qv = np.floor(np.asarray(r[1], dtype=np.float64) * quant_scale).astype(
            np.int64
        )
        cdist = ((cc - qv[None, :]) ** 2).sum(axis=1)
        order = np.argsort(cdist, kind="stable")[:nprobe]
        for li in order:
            li = int(li)
            probe_rows.append((qid, li))
            qres = qv - cc[li]  # query residual vs THIS list
            lut = np.empty((n_subspaces, n_centroids), dtype=np.int64)
            for s in range(n_subspaces):
                sub = qres[s * sub_dim : (s + 1) * sub_dim]
                lut[s] = ((cb[s] - sub[None, :]) ** 2).sum(axis=1)
            luts[(qid, li)] = lut
    probes = spark.createDataFrame(
        probe_rows, schema="query_id LONG, list_id INT"
    )
    bluts = spark.sparkContext.broadcast(luts)

    cand = index.join(F.broadcast(probes), "list_id")

    adc_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("adc_dist", T.LongType()),
        ]
    )

    def adc_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables = bluts.value
        for pdf in batches:
            if pdf.empty:
                continue
            codes = pdf["pq_code"].to_numpy(dtype=np.int64)
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            lids = pdf["list_id"].to_numpy(dtype=np.int64)
            dists = np.zeros(len(pdf), dtype=np.int64)
            keys = qids * 1_000_000 + lids
            for key in np.unique(keys):
                mask = keys == key
                lut = tables[(int(key // 1_000_000), int(key % 1_000_000))]
                sub_codes = codes[mask]
                acc = np.zeros(mask.sum(), dtype=np.int64)
                for s in range(n_subspaces):
                    nib = (sub_codes >> (4 * s)) & 15
                    acc += lut[s][nib]
                dists[mask] = acc
            yield pd.DataFrame(
                {
                    "query_id": qids,
                    "neighbor_id": pdf["neighbor_id"].to_numpy(dtype=np.int64),
                    "adc_dist": dists,
                }
            )

    scored = cand.select("query_id", "neighbor_id", "list_id", "pq_code").mapInPandas(
        adc_kernel, schema=adc_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def pca_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    n_iter: int = 8,
) -> DataFrame:
    """Top principal direction of an embedding table, engine-exact — the
    drift/collapse diagnostic an embedding pipeline runs per snapshot (a
    dominant component that swallows most variance means the encoder is
    collapsing; its drift across snapshots means re-index).

    Two-stage design that scales and stays exact:
    1. EXACT INTEGER GRAM: vectors micro-quantize to int64 (floor(x*1e6),
       the int8_quant_stats / LSH scale), and an Arrow ``mapInPandas``
       kernel emits per-partition partial sums of q_i*q_j for i <= j —
       integer outer products, mergeable, one tiny (d*(d+1)/2)-row
       DECIMAL(38,0) reduce. The only data-sized pass; nothing float.
    2. Power iteration on the d x d grid with the token_pagerank
       determinism recipe: contributions rounded to 9 dp, summed as
       DECIMAL(38,9), the vector re-normalized by max|w| (one divide by
       one scalar) and re-rounded each step — both engines walk the
       identical orbit (the markov_stationary machinery, on the
       uncentered second-moment matrix; for centered PCA subtract means
       upstream).

    Returns one row per dimension: (dim_idx, component, eigenvalue_q2)
    with the component L-infinity-normalized (max |component| = 1) and
    ``eigenvalue_q2`` the Rayleigh-style floor(max|G v|) in micro^2
    units from the final step (a long — the exact-decimal floor, because
    the raw 23-digit decimal rounds to double differently per engine). Caller contract: partial int64 gram sums must not
    overflow per partition (|q| <= ~2e6 for unit-scale embeddings ->
    safe below ~1e6 rows per partition per the 4e12-per-term bound).
    """
    import pandas as pd

    d_probe = _peek_dim(df, vec_col)
    if d_probe is None:
        return _empty_result(
            df,
            [("dim_idx", T.LongType()), ("component", T.DoubleType()),
             ("eigenvalue_q2", T.LongType())],
        )

    def gram_kernel(batches):
        import numpy as np

        acc = np.zeros((d_probe, d_probe), dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(
                [
                    np.floor(
                        np.asarray(v, dtype=np.float64) * 1_000_000.0
                    ).astype(np.int64)
                    for v in pdf[vec_col]
                ]
            )
            acc += mat.T @ mat
        iu = np.triu_indices(d_probe)
        yield pd.DataFrame(
            {
                "i": iu[0].astype("int64"),
                "j": iu[1].astype("int64"),
                "s": acc[iu].astype("int64"),
            }
        )

    partials = df.select(vec_col).mapInPandas(
        gram_kernel, schema="i long, j long, s long"
    )
    gram_u = partials.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("g")
    )
    return power_iteration_top(gram_u, d_probe, n_iter)


def power_iteration_top(
    gram_u: DataFrame, d_probe: int, n_iter: int = 8
) -> DataFrame:
    """The deterministic 9dp power-iteration stage shared by the batch
    gram (``pca_top_component``) and the streaming incremental gram
    (``streaming/gram_stream.py``): input is the UPPER-TRIANGULAR exact
    gram (i <= j, DECIMAL(38,0) column ``g``); output is the same
    (dim_idx, component, eigenvalue_q2) contract.

    The iteration runs DRIVER-SIDE on the collected gram (r11
    optimization). Boundedness: the gram is (d*(d+1)/2) rows — set by
    the DECLARED embedding dimension (d=64 -> 2,080 rows), independent
    of corpus size — and is exactly the table the previous
    implementation already pulled through the driver as a per-round
    broadcast. The Spark-side loop cost ~17 jobs per call (a
    temp-parquet lineage-cut round-trip for the vector and eigenvalue
    every one of the 8 iterations — without those cuts the compounding
    lineage cost 78s of plan analysis at sf0.001); the driver-side loop
    is ONE collect job plus a d-row local result, identical at any
    corpus scale because the only data-sized pass (the gram itself)
    stays distributed in the caller.

    Exactness: mirrors the committed oracle orbit token for token —
    contributions ``round(g_double * v, 9)`` summed as DECIMAL(38,9)
    (exact integer-scaled addition, order-free), vector renormalized by
    max|w| and re-rounded to 9dp, eigenvalue = floor(max|w_decimal|) as
    long. ``Decimal(repr(x))`` is shortest-roundtrip like Java's
    ``BigDecimal.valueOf(double)`` and ROUND_HALF_UP matches Spark's
    Round / decimal-cast semantics, so the orbit is repr-bit-exact vs
    the prior Spark loop (verified at sf0.001 + sf0.01) and vs the
    DuckDB twin.
    """
    from decimal import Decimal, ROUND_FLOOR, ROUND_HALF_UP

    spark = gram_u.sparkSession
    q9 = Decimal("1E-9")

    def _round9(x: float) -> float:
        # F.round(double, 9) = BigDecimal.valueOf(x).setScale(9, HALF_UP)
        # .doubleValue(); NaN/Inf pass through unchanged (Spark Round).
        if x != x or x in (float("inf"), float("-inf")):
            return x
        return float(Decimal(repr(x)).quantize(q9, rounding=ROUND_HALF_UP))

    def _dec9(x: float):
        # cast(double as decimal(38,9)) — raises on non-finite, matching
        # the session's ANSI decimal cast.
        return Decimal(repr(x)).quantize(q9, rounding=ROUND_HALF_UP)

    # ONE job: collect the bounded gram (metadata-scale; see docstring),
    # mirroring the old plan's upper+lower triangle union.
    by_dim: dict[int, list[tuple[int, float]]] = {}
    for row in gram_u.select("i", "j", "g").collect():
        i, j, g = int(row["i"]), int(row["j"]), float(row["g"])
        by_dim.setdefault(j, []).append((i, g))
        if i != j:
            by_dim.setdefault(i, []).append((j, g))

    vec = {d: 1.0 for d in range(d_probe)}
    lam = None
    for _ in range(n_iter):
        wd: dict[int, object] = {}
        for j, entries in by_dim.items():
            s = Decimal(0)
            for i, g in entries:
                s += _dec9(_round9(g * vec[i]))
            wd[j] = s
        if wd:
            w = {j: float(s) for j, s in wd.items()}
            mx = max(abs(x) for x in w.values())
            # eigenvalue from the EXACT decimal (floor -> long): the raw
            # decimal holds ~23 significant digits, and decimal->double
            # rounding differs between engines at the last ulp (measured
            # .664 vs .662) — the normalization divide is ulp-insensitive
            # (round(w/mx, 9) absorbs it) but the reported scalar is not
            lam = int(
                max(abs(s) for s in wd.values()).to_integral_value(
                    rounding=ROUND_FLOOR
                )
            )
            nxt: dict[int, float] = {}
            for d in range(d_probe):
                if d not in w:
                    nxt[d] = 0.0
                elif mx == 0.0:
                    nxt[d] = float("nan")  # IEEE 0/0, as the Spark divide
                else:
                    nxt[d] = _round9(w[d] / mx)
            vec = nxt
        else:
            # empty gram: the prior dims-left-join/coalesce path — all
            # zero vector, NULL eigenvalue
            lam = None
            vec = {d: 0.0 for d in range(d_probe)}
    return spark.createDataFrame(
        [(d, vec[d], lam) for d in range(d_probe)],
        schema="dim_idx long, component double, eigenvalue_q2 long",
    )


def jl_sign(salt: str, out_dim: int, in_dim: int) -> int:
    """The shared ±1 Rademacher entry for the deterministic JL matrix:
    +1 when the first hex nibble of md5('salt|out|in') is 0-7, else -1.
    Python and SQL both derive the matrix from THIS definition, so the
    projection is engine-exact with no shipped matrix artifact."""
    import hashlib

    h = hashlib.md5(f"{salt}|{out_dim}|{in_dim}".encode()).hexdigest()
    return 1 if h[0] in "01234567" else -1


def jl_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    salt: str = "v1",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to k dims with a
    DETERMINISTIC md5-derived Rademacher matrix — the cheap
    dimensionality reducer in front of LSH/clustering when d is large
    (pairwise distances preserved within (1±eps) w.h.p.), reproducible
    across engines and runs because the "random" matrix is a pure
    function of (salt, i, j), never an artifact to ship.

    Exactness: inputs micro-quantize to int64 (the pca_top_component /
    LSH scale), each output coordinate is an EXACT integer signed sum
    y_i = sum_j s_ij * q_j (Arrow kernel, matrix built once per task
    from ``jl_sign``), and the scaled component divides ONCE by
    sqrt(k)*1e6 — with the default k = 16 the sqrt is exact, so the
    divide is by the exactly-representable 4e6. Map-side only, zero
    shuffle. Returns one row per (id, out_dim):
    (id, out_dim, y_micro, component). Caller contract: k must be a
    perfect square to keep the normalizer exact.
    """
    import math

    import pandas as pd

    root = math.isqrt(k)
    if root * root != k:
        raise ValueError(f"k must be a perfect square, got {k}")
    d_in = _peek_dim(df, vec_col)
    if d_in is None:
        return _empty_result(
            df,
            [(id_col, id_col), ("out_dim", T.LongType()),
             ("y_micro", T.LongType()), ("component", T.DoubleType())],
        )
    norm = float(root) * 1_000_000.0

    def kernel(batches):
        import numpy as np

        signs = np.array(
            [
                [jl_sign(salt, i, j) for j in range(d_in)]
                for i in range(k)
            ],
            dtype=np.int64,
        )
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(
                [
                    np.floor(
                        np.asarray(v, dtype=np.float64) * 1_000_000.0
                    ).astype(np.int64)
                    for v in pdf[vec_col]
                ]
            )
            y = mat @ signs.T  # (rows, k) exact int64
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "id": np.repeat(
                        pdf[id_col].to_numpy().astype("int64"), k
                    ),
                    "out_dim": np.tile(
                        np.arange(k, dtype="int64"), n
                    ),
                    "y_micro": y.reshape(-1).astype("int64"),
                }
            )

    out = df.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        kernel, schema=f"id long, out_dim long, y_micro long"
    )
    return out.select(
        F.col("id").alias(id_col),
        "out_dim",
        "y_micro",
        (F.col("y_micro").cast("double") / F.lit(norm)).alias("component"),
    )


def centroid_cosine_drift(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine similarity between the centroids of two embedding groups —
    the one-number drift check between snapshots/splits (a centroid
    cosine falling from ~1 means the encoder or the corpus moved; the
    scalar companion to ``pca_top_component``'s directional monitor).

    Exactness via scale-invariance: cosine(mean_a, mean_b) =
    cosine(sum_a, sum_b), so the mean (a float divide per dimension)
    is never computed — per-(group, dim) integer SUMS of the
    micro-quantized coordinates feed exact DECIMAL(38,0) dot/norm
    accumulations, and ONE float expression (two sqrt, one divide)
    produces the cosine. Caller contract: exactly two groups (checked).
    Returns one row (group_a, group_b, n_a, n_b, centroid_cosine);
    NULL when either centroid is the zero vector.
    """
    sums = (
        df.select(
            F.col(group_col).alias("__g"),
            F.posexplode(
                F.transform(
                    F.col(vec_col),
                    lambda v: F.floor(
                        v.cast("double") * F.lit(1_000_000.0)
                    ).cast("long"),
                )
            ).alias("__dim", "__q"),
        )
        .groupBy("__g", "__dim")
        .agg(F.sum("__q").cast("decimal(38,0)").alias("__s"))
    )
    counts = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    groups = [r["__g"] for r in counts.select("__g").orderBy("__g").collect()]
    if len(groups) != 2:
        raise ValueError(f"exactly two groups required, got {groups}")
    ga, gb = groups
    a = sums.filter(F.col("__g") == ga).select(
        "__dim", F.col("__s").alias("__sa")
    )
    b = sums.filter(F.col("__g") == gb).select(
        "__dim", F.col("__s").alias("__sb")
    )
    joined = a.join(b, "__dim", "full").select(
        F.coalesce(F.col("__sa"), F.lit(0).cast("decimal(38,0)")).alias(
            "__sa"
        ),
        F.coalesce(F.col("__sb"), F.lit(0).cast("decimal(38,0)")).alias(
            "__sb"
        ),
    )
    mom = joined.agg(
        F.sum(F.col("__sa") * F.col("__sb")).alias("__dot"),
        F.sum(F.col("__sa") * F.col("__sa")).alias("__na"),
        F.sum(F.col("__sb") * F.col("__sb")).alias("__nb"),
    )
    na = counts.filter(F.col("__g") == ga).select(
        F.col("__n").alias("n_a")
    )
    nb = counts.filter(F.col("__g") == gb).select(
        F.col("__n").alias("n_b")
    )
    cos = F.when(
        (F.col("__na") > 0) & (F.col("__nb") > 0),
        F.col("__dot").cast("double")
        / F.sqrt(F.col("__na").cast("double") * F.col("__nb").cast("double")),
    )
    return (
        mom.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            F.lit(ga).alias("group_a"),
            F.lit(gb).alias("group_b"),
            "n_a",
            "n_b",
            cos.alias("centroid_cosine"),
        )
    )
