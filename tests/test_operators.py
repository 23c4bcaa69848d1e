"""Operator semantics tests: dedup family, similarity search, text stats,
multimodal plumbing — small handcrafted frames with known answers (the
DuckDB parity suite covers the synthetic corpus at scale)."""

import pytest
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators import dedup as dd
from hmpps_digital_prison_reporting_glue_poc_spark.operators import similarity as sim
from hmpps_digital_prison_reporting_glue_poc_spark.operators import textstats as ts
from hmpps_digital_prison_reporting_glue_poc_spark.operators import multimodal as mm


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "the quick brown fox"),          # exact dup of 1
        (3, "the quick brown fox jumps"),    # near dup of 1
        (4, "completely different words entirely unrelated"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = dd.exact_dup_groups(docs, "doc_id", "text").collect()
    by_canon = {r.canonical_id: r.n_docs for r in groups}
    assert by_canon == {1: 2, 3: 1, 4: 1}
    kept = sorted(r.doc_id for r in dd.exact_dedup(docs, "doc_id", "text").collect())
    assert kept == [1, 3, 4]


def test_minhash_identical_docs_share_signature(docs):
    sigs = {r.doc_id: tuple(r)[1:] for r in dd.minhash_signatures(
        docs, "doc_id", "text", num_hashes=8).collect()}
    assert sigs[1] == sigs[2]          # identical text -> identical signature
    assert sigs[1] != sigs[4]          # disjoint text -> different signature


def test_lsh_finds_exact_and_near_dups(docs):
    sigs = dd.minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    pairs = {(r.id_a, r.id_b) for r in dd.lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=8, rows_per_band=2).collect()}
    assert (1, 2) in pairs             # exact dup always collides
    assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_jaccard_pairs_values(docs):
    pairs = {(r.id_a, r.id_b): r for r in dd.jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5).collect()}
    assert pairs[(1, 2)].jaccard == 1.0
    assert pairs[(1, 3)].jaccard == pytest.approx(4 / 5)
    assert (1, 4) not in pairs


def test_minhash_jaccard_estimates(docs):
    rows = {
        (r.id_a, r.id_b): r
        for r in dd.minhash_jaccard_estimates(
            docs, "doc_id", "text", num_hashes=8, rows_per_band=2, shingle_k=3
        ).collect()
    }
    exact = rows[(1, 2)]  # identical docs: estimator and truth both 1
    assert exact.n_sig_matches == 8
    assert exact.est_jaccard == 1.0
    assert exact.true_jaccard == 1.0
    # doc 3 adds one token -> shingles {2 shared, 1 new}: true J = 2/3
    if (1, 3) in rows:
        near = rows[(1, 3)]
        assert near.inter == 2 and near.union_sz == 3
        assert near.true_jaccard == pytest.approx(2 / 3)
    assert not any(4 in p for p in rows)  # unrelated doc never a candidate


def test_char_class_stats_exact_counts(spark):
    df = spark.createDataFrame(
        [(1, "Ab1 c2, d!"), (2, "")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in ts.char_class_stats(df, "doc_id", "text").collect()}
    assert got[1].n_chars == 10
    assert got[1].n_digits == 2
    assert got[1].n_upper == 1
    assert got[1].n_spaces == 2
    assert got[1].n_punct == 2  # ',' and '!' ('!' in class, '!' counted)
    assert tuple(got[2])[1:] == (0, 0, 0, 0, 0)


def test_simhash_near_dups(docs):
    sketches = dd.simhash(docs, "doc_id", "text", bits=32)
    vals = {r.doc_id: r.simhash for r in sketches.collect()}
    assert vals[1] == vals[2]
    pairs = {(r.id_a, r.id_b): r.hamming for r in dd.simhash_near_dup_pairs(
        sketches, "doc_id", max_hamming=3, bits=32).collect()}
    assert pairs[(1, 2)] == 0


def test_simhash_64bit_matches_bruteforce(docs):
    """Default 64-bit path: md5-hex-prefix reference sketch, pigeonhole
    chunked pairs == brute-force hamming pairs."""
    import hashlib

    sketches = dd.simhash(docs, "doc_id", "text")  # default bits=64
    vals = {r.doc_id: r.simhash for r in sketches.collect()}

    def ref_sketch(text):
        toks = [t for t in text.split(" ") if t]
        sums = [0] * 64
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
            for b in range(64):
                sums[b] += 1 if (h >> b) & 1 else -1
        u = sum((1 << b) for b in range(64) if sums[b] > 0)
        return u - (1 << 64) if u >= (1 << 63) else u  # signed long

    for r in docs.collect():
        assert vals[r.doc_id] == ref_sketch(r.text), r.doc_id

    brute = set()
    ids = sorted(vals)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1")
            if ham <= 3:
                brute.add((a, b, ham))
    got = {(r.id_a, r.id_b, r.hamming) for r in dd.simhash_near_dup_pairs(
        sketches, "doc_id", max_hamming=3).collect()}
    assert got == brute


@pytest.fixture()
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.8, 0.2, 0.0]),   # close to 0 and 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(vectors):
    queries = vectors.filter(F.col("vec_id") == 0)
    out = sim.cosine_topk(vectors, queries, k=2)
    got = [(r.neighbor_id, r.rank) for r in out.orderBy("rank").collect()]
    assert got == [(1, 1), (4, 2)]


def test_cosine_topk_np_matches_dataframe_path(spark, vectors):
    queries = vectors.filter(F.col("vec_id") < 2)
    a = {(r.query_id, r.rank): r.neighbor_id
         for r in sim.cosine_topk(vectors, queries, k=3).collect()}
    b = {(r.query_id, r.rank): r.neighbor_id
         for r in sim.cosine_topk_np(spark, vectors, queries, k=3).collect()}
    assert a == b


def test_cosine_pairs_above(vectors):
    pairs = {(r.id_a, r.id_b) for r in sim.cosine_pairs_above(
        vectors, threshold=0.95).collect()}
    assert (0, 1) in pairs and (1, 4) in pairs
    assert not any(3 in p for p in pairs)


def test_ivf_topk_recovers_nearest_on_clustered_data(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    rows = []
    for c, center in enumerate([np.array([10.0, 0, 0]), np.array([0, 10.0, 0])]):
        for i in range(50):
            v = center + rng.normal(0, 0.1, 3)
            rows.append((c * 50 + i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") == 0)
    exact = {r.neighbor_id for r in sim.cosine_topk(corpus, queries, k=5).collect()}
    approx = {r.neighbor_id for r in sim.ivf_topk(
        spark, corpus, queries, k=5, n_lists=4, nprobe=2).collect()}
    # same-cluster neighbours; IVF should recover the exact set here
    assert approx == exact


def test_token_stats_values(spark):
    df = spark.createDataFrame([(1, "aa bb  aa")], "doc_id long, text string")
    r = ts.token_stats(df, "doc_id", "text").first()
    assert (r.n_chars, r.n_tokens, r.n_distinct_tokens, r.sum_token_len) == (9, 3, 2, 6)


def test_language_id_heuristic(spark):
    df = spark.createDataFrame(
        [(1, "the cat is on the mat"), (2, "zzz qqq xxx www")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_pred for r in ts.language_id(df, "doc_id", "text").collect()}
    assert out == {1: "en", 2: "unknown"}


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [(1, "the of and to in is"), (2, "x")], "doc_id long, text string"
    )
    scores = {r.doc_id: r.quality_score for r in ts.quality_score(
        df, "doc_id", "text").collect()}
    assert all(0.0 <= s <= 1.0 for s in scores.values())
    assert scores[1] > scores[2]


def test_multimodal_meta_shapes(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "")], "doc_id long, text string")
    media = mm.attach_binary(df, "doc_id", "text")
    assert dict(media.dtypes)["content"] == "binary"
    out = {r.media_id: r for r in mm.extract_media_meta(media).collect()}
    assert out[1].n_bytes == 5 and out[1].fake_width == 6 and out[1].fake_height == 6
    assert out[2].n_bytes == 0


def test_multimodal_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_media_real(b"\x00", "image/png")


def test_winnow_shared_substring_shares_fingerprint(spark):
    """Winnowing guarantee: a shared substring of length >= k+w-1 yields at
    least one common fingerprint; disjoint texts share none."""
    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "AAAA " + shared + " BBBB"),
        (2, "CCCC " + shared + " DDDD"),
        (3, "0123456789 completely unrelated zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = dd.winnow_fingerprints(df, "doc_id", "text", k=8, w=4)
    sets = {
        doc: {r.fp for r in fps.filter(F.col("doc_id") == doc).collect()}
        for doc in (1, 2, 3)
    }
    assert sets[1] & sets[2], "overlapping docs must share a fingerprint"
    assert not (sets[1] & sets[3]), "disjoint docs must not"


def test_hyperplane_lsh_recovers_near_dups(spark):
    """Near-parallel vectors must collide in some hash table and survive the
    exact re-score; orthogonal vectors must not pass the threshold."""
    import numpy as np
    rng = np.random.RandomState(3)
    base = rng.normal(size=(20, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # a near-duplicate: tiny perturbation
        rows.append((100 + i, [float(x) for x in v + rng.normal(0, 0.01, 16)]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b) for r in sim.hyperplane_lsh_pairs(
        spark, corpus, threshold=0.95, n_bits=12, n_tables=6).collect()}
    expected = {(i, 100 + i) for i in range(20)}
    recall = len(pairs & expected) / len(expected)
    assert recall >= 0.9, f"LSH recall too low: {recall}"
    # exact re-score keeps precision: no pair below the cosine threshold
    brute = {(r.id_a, r.id_b) for r in sim.cosine_pairs_above(
        corpus, threshold=0.95).collect()}
    assert pairs <= brute


def test_asof_join_semantics(spark):
    """Backward as-of: inclusive at equal ts, NULL when nothing precedes,
    tolerance nulls out stale matches, duplicate left rows preserved."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 10:00:00", "a"),
            (2, "u1", "2024-01-01 10:00:00", "b"),   # duplicate (key, ts)
            (3, "u1", "2024-01-01 09:00:00", "c"),   # before any right row
            (4, "u2", "2024-01-02 00:00:00", "d"),
            (5, "u3", "2024-01-02 00:00:00", "e"),   # key with no right rows
        ],
        "id long, user string, ts string, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:00:00", 10.0),  # equal ts -> visible
            ("u1", "2024-01-01 09:30:00", 9.0),
            ("u2", "2024-01-01 00:00:00", 20.0),  # a day earlier
        ],
        "user string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = {
        r.id: (r.v, r["__asof_ts"])
        for r in asof_join(left, right, on=["user"]).collect()
    }
    assert out[1][0] == 10.0 and out[2][0] == 10.0
    assert out[3] == (None, None)
    assert out[4][0] == 20.0
    assert out[5] == (None, None)
    assert len(out) == 5

    # tolerance: u2's only match is 24h old; a 1-hour tolerance nulls it
    tol = {
        r.id: r.v
        for r in asof_join(
            left, right, on=["user"],
            tolerance_expr=F.expr("interval 1 hour"),
        ).collect()
    }
    assert tol[4] is None and tol[1] == 10.0


def test_interval_join_matches_naive_range_join(spark):
    """Binned interval join must equal the naive range-condition join,
    including intervals spanning many bins and boundary-inclusive points."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.joins import (
        interval_join,
    )

    points = spark.createDataFrame(
        [(i, "k%d" % (i % 3), "2024-01-01 00:%02d:00" % (i % 60)) for i in range(200)],
        "pid long, k string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [
            (100, "k0", "2024-01-01 00:10:00", "2024-01-01 00:20:00"),
            (101, "k1", "2023-12-31 22:00:00", "2024-01-01 01:00:00"),  # 3h span
            (102, "k2", "2024-01-01 00:05:00", "2024-01-01 00:05:00"),  # zero-width
            (103, "k0", "2024-01-02 00:00:00", "2024-01-02 01:00:00"),  # no points
        ],
        "iid long, k string, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn(
        "e", F.col("e").cast("timestamp")
    )

    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "ts", "s", "e", on=["k"], bin_seconds=600
        ).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.join(
            intervals,
            (points.k == intervals.k)
            & (points.ts >= intervals.s)
            & (points.ts <= intervals.e),
        ).collect()
    }
    assert got == naive and len(got) > 0


def test_connected_components_known_graphs(spark):
    """Chain, cycle, star and singleton-free graph shapes resolve to the
    min-id component; disjoint clusters stay separate."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.graph import (
        connected_components,
        neardup_groups,
    )

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),        # chain 1-2-3-4
            (10, 11), (11, 12), (12, 10),  # cycle 10-11-12
            (20, 21),                      # pair
        ],
        "id_a long, id_b long",
    )
    comp = {r.id: r.comp for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]], "doc_id long"
    )
    groups = {r.doc_id: r.component for r in neardup_groups(edges, docs).collect()}
    assert groups[99] == 99  # singleton keeps itself
    assert groups[4] == 1 and groups[12] == 10


def test_incremental_agg_merge_equals_full_recompute(spark):
    """Two-step (history + increment) partial merge must bit-match the
    one-shot aggregation; merge output stays mergeable (third fold works);
    non-mergeable columns are rejected."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import (
        incremental as inc,
    )

    rows = [(i % 4, float(i) / 3.0) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, v double")
    full = inc.partial_agg(df, ["k"], ["v"])

    d1 = df.filter(F.col("v") < 11.0)
    d2 = df.filter(F.col("v") >= 11.0)
    merged = inc.merge_partial_aggs(
        inc.partial_agg(d1, ["k"], ["v"]), inc.partial_agg(d2, ["k"], ["v"]), ["k"]
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))

    # closed under merge: folding an empty increment changes nothing
    empty = inc.partial_agg(df.filter(F.lit(False)), ["k"], ["v"])
    again = inc.merge_partial_aggs(merged, empty, ["k"])
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, full.collect()))

    with pytest.raises(ValueError):
        inc.merge_partial_aggs(
            merged.withColumn("avg_v", F.lit(1.0)),
            merged.withColumn("avg_v", F.lit(1.0)),
            ["k"],
        )


def test_cap_per_group_deterministic_and_bounded(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.sampling import (
        cap_per_group,
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(100)], "id long, g string"
    )
    out1 = cap_per_group(df, ["g"], 7, order_col="id")
    out2 = cap_per_group(df.repartition(13), ["g"], 7, order_col="id")
    rows1 = sorted((r.g, r.id) for r in out1.collect())
    rows2 = sorted((r.g, r.id) for r in out2.collect())
    assert rows1 == rows2, "cap must not depend on partition layout"
    from collections import Counter
    counts = Counter(g for g, _ in rows1)
    assert all(c == 7 for c in counts.values())

    # stratified: fractions honoured roughly, absent key -> dropped
    s = stratified_sample(df, "g", {"g0": 1.0, "g1": 0.0}, seed=1)
    got = {r.g for r in s.collect()}
    assert "g0" in got and "g1" not in got and "g2" not in got


def test_topk_per_group_matches_naive_window(spark):
    """Local pruning must not change the answer: exact match with the
    full-shuffle window top-k, across many partitions and group sizes."""
    from pyspark.sql import Window
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.topk import (
        topk_per_group,
    )

    # v is a bijection of id (37 invertible mod prime 5003) so orderings
    # are tie-free and both paths are fully deterministic
    df = spark.range(5000).select(
        (F.col("id") % 17).alias("g"),
        F.pmod(F.col("id") * 37, F.lit(5003)).alias("v"),
        F.col("id"),
    ).repartition(32)

    got = {
        (r.g, r.id, r.rank)
        for r in topk_per_group(df, ["g"], "v", k=5).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v").desc())
    naive = {
        (r.g, r.id, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    assert got == naive and len(got) == 17 * 5

    # ascending flavour too
    got_asc = {
        (r.g, r.id)
        for r in topk_per_group(df, ["g"], "v", k=3, ascending=True).collect()
    }
    w_asc = Window.partitionBy("g").orderBy(F.col("v").asc())
    naive_asc = {
        (r.g, r.id)
        for r in df.withColumn("rank", F.row_number().over(w_asc))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    assert got_asc == naive_asc


def test_topk_per_group_keeps_null_key_groups(spark):
    # pandas groupby drops null keys by default; the prune pass must not
    # (the exact window it mirrors keeps them).
    from pyspark.sql import Window
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.topk import (
        topk_per_group,
    )

    df = spark.createDataFrame(
        [(None, i) for i in range(20)] + [("a", i) for i in range(20)],
        "g string, v int",
    ).repartition(4)
    got = {
        (r.g, r.v, r.rank)
        for r in topk_per_group(df, ["g"], "v", k=3).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v").desc())
    want = {
        (r.g, r.v, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    assert got == want
    assert any(g is None for g, _, _ in got)


def test_ivf_topk_training_is_hard_capped(spark, monkeypatch):
    # Default args must never collect the full corpus: the limit is applied
    # before .collect() regardless of sample_fraction.
    import numpy as np
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import similarity as sim

    rng = np.random.RandomState(0)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(400)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.limit(3)

    collected_sizes = []
    orig_collect = type(corpus).collect

    def spy_collect(self):
        out = orig_collect(self)
        collected_sizes.append(len(out))
        return out

    monkeypatch.setattr(type(corpus), "collect", spy_collect)
    res = sim.ivf_topk(
        spark, corpus, queries, k=3, n_lists=4, nprobe=2, max_train_rows=100
    )
    n = res.count()
    assert n > 0
    # The training collect (first collect call) obeys the cap.
    assert collected_sizes[0] <= 100


def test_jaccard_hot_token_pruning(spark):
    # One token in ~90% of docs: with max_df pruning the pairs must be
    # exactly the brute-force jaccard over the PRUNED token sets, and the
    # hot token must contribute no candidate pairs.
    import itertools

    docs = []
    for i in range(40):
        base = f"alpha{i} beta{i} gamma{i} delta{i}"
        if i < 36:  # hot stop-token in 90% of docs
            base += " thestopword"
        docs.append((i, base))
    # two real near-dup pairs sharing rare tokens
    docs.append((100, "alpha1 beta1 gamma1 delta1 extra"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.jaccard_pairs(df, "doc_id", "text", threshold=0.5, max_df=10).collect()
    }

    # brute force on pruned vocab
    toksets = {}
    from collections import Counter
    freq = Counter(t for _, txt in docs for t in set(txt.split()))
    for i, txt in docs:
        toksets[i] = {t for t in set(txt.split()) if freq[t] <= 10}
    want = {}
    for a, b in itertools.combinations(sorted(toksets), 2):
        inter = len(toksets[a] & toksets[b])
        union = len(toksets[a] | toksets[b])
        if union and inter / union >= 0.5:
            want[(a, b)] = inter / union
    assert got == pytest.approx(want)
    # hot token alone must not make every doc-pair a candidate
    assert (0, 1) not in got


def test_profile_table_exact_and_hll_modes(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None), (None, "b")], "x int, s string"
    )
    exact = {r.column: r for r in profile_table(df, exact=True).collect()}
    assert (exact["x"].n_rows, exact["x"].n_null, exact["x"].n_distinct) == (4, 1, 2)
    assert (exact["x"].min_value, exact["x"].max_value) == ("1", "2")
    assert (exact["s"].n_rows, exact["s"].n_null, exact["s"].n_distinct) == (4, 1, 2)
    # HLL default: same shape, approximate cardinality (exact at this size)
    hll = {r.column: r for r in profile_table(df).collect()}
    assert hll["x"].n_distinct == 2 and hll["s"].n_null == 1
    # no Expand in the exact plan
    plan = profile_table(df, exact=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_chunk_media_geometry_and_fingerprints(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import multimodal as mm
    import hashlib

    df = spark.createDataFrame(
        [(1, "a" * 130), (2, "b" * 64), (3, "")], "doc_id long, text string"
    )
    media = mm.attach_binary(df, "doc_id", "text")
    got = {
        (r.media_id, r.frame_idx): (r.n_frame_bytes, r.frame_md5)
        for r in mm.chunk_media(media, frame_bytes=64).collect()
    }
    # 130 bytes -> 64 + 64 + 2; exactly-64 -> one frame; empty -> no rows
    assert {k: v[0] for k, v in got.items()} == {
        (1, 0): 64, (1, 1): 64, (1, 2): 2, (2, 0): 64,
    }
    assert got[(1, 2)][1] == hashlib.md5(b"aa").hexdigest()
    assert got[(2, 0)][1] == hashlib.md5(b"b" * 64).hexdigest()


def test_embed_media_stub_matches_closed_form(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import multimodal as mm
    import hashlib

    df = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    media = mm.attach_binary(df, "doc_id", "text")
    row = mm.embed_media_stub(media, dim=2).collect()[0]
    for j in (0, 1):
        want = int.from_bytes(
            hashlib.md5(f"{j}:hello world".encode()).digest()[:4], "big"
        ) / 2**32
        assert getattr(row, f"e{j}") == want


def test_pii_stats_counts_and_redaction(spark):
    import hashlib
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d@e.org from 10.0.0.1 ok"),
            (2, "no pii here"),
            (3, "999.999.1.1 still matches the ipv4 shape"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ts.pii_stats(df, "doc_id", "text").collect()}
    assert (got[1].n_emails, got[1].n_ipv4) == (2, 1)
    assert (got[2].n_emails, got[2].n_ipv4) == (0, 0)
    # the regex is a shape check, not a validator — 999.x matches by design
    assert got[3].n_ipv4 == 1
    want = hashlib.md5(b"mail <EMAIL> and <EMAIL> from <IP> ok").hexdigest()
    assert got[1].redacted_md5 == want
    assert got[2].redacted_md5 == hashlib.md5(b"no pii here").hexdigest()


def test_tfidf_top_terms_exact_small_corpus(spark):
    import math
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import textstats as ts

    # 3 docs: "common" in all (idf=0), "rare" only in doc 1.
    df = spark.createDataFrame(
        [
            (1, "common rare rare"),
            (2, "common mid"),
            (3, "common mid"),
        ],
        "doc_id long, text string",
    )
    out = ts.tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    top1 = {d: rows[0] for d, rows in by_doc.items()
            for rows in [sorted(rows, key=lambda r: r.term_rank)]}
    assert top1[1].token == "rare"
    assert top1[1].tfidf == round(2 * math.log(3 / 1), 6)
    # idf=0 terms score 0 and rank after positive-idf terms
    assert top1[2].token == "mid"
    for rows in by_doc.values():
        assert [r.term_rank for r in sorted(rows, key=lambda r: r.term_rank)] == list(
            range(1, len(rows) + 1)
        )


def test_gopher_rules_verdicts(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import textstats as ts

    good = "the quick brown fox jumps over a lazy dog today"
    short = "too short"
    symbols = "§§ ¶¶ 1234 %% ## !! @@ (( )) ++"
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in ts.gopher_rules(df, "doc_id", "text").collect()}
    assert got[1].keep and got[1].ok_word_count and got[1].ok_stopwords
    assert not got[2].ok_word_count and not got[2].keep
    assert not got[3].ok_alpha and not got[3].ok_stopwords and not got[3].keep
    assert got[1].n_words == 10 and got[1].n_stop_hits >= 2


def test_token_zipf_ranks_and_shares(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import corpus as cp

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b z")], "doc_id long, text string"
    )
    rows = {r.token: r for r in cp.token_zipf(df, "text").collect()}
    # counts: a=4, b=3, c=1, z=1 (ties broken by token asc)
    assert [rows[t].freq_rank for t in ("a", "b", "c", "z")] == [1, 2, 3, 4]
    assert rows["a"].cum_share == round(4 / 9, 6)
    assert rows["b"].cum_share == round(7 / 9, 6)
    assert rows["z"].cum_share == 1.0


def test_bigram_lm_scores_tiny_corpus(spark):
    """Hand-checkable bigram LM: 'a b a b' corpus — repeated bigrams score
    higher than one-off bigrams; docs under 2 tokens are absent."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.textstats import (
        bigram_lm_scores,
    )
    import math

    df = spark.createDataFrame(
        [
            (1, "a b a b"),   # bigrams: (a,b)x2, (b,a)x1
            (2, "a b"),       # the common bigram only
            (3, "x y"),       # rare bigram
            (4, "solo"),      # no bigrams -> absent
            (5, ""),          # no tokens  -> absent
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].n_bigrams == 3 and got[2].n_bigrams == 1
    # corpus counts: c(a,b)=3, c(b,a)=1, c(x,y)=1; c(a.)=3, c(b.)=1,
    # c(x.)=1; V=3 distinct contexts {a,b,x}
    p_ab = round(math.log((3 + 1) / (3 + 3)), 6)
    p_ba = round(math.log((1 + 1) / (1 + 3)), 6)
    p_xy = round(math.log((1 + 1) / (1 + 3)), 6)
    assert abs(got[2].avg_logprob - p_ab) < 1e-9
    assert abs(got[3].avg_logprob - p_xy) < 1e-9
    assert abs(got[1].avg_logprob - (2 * p_ab + p_ba) / 3) < 1e-9
    # the doc made of the corpus-dominant bigram outscores the rare one
    assert got[2].avg_logprob > got[3].avg_logprob


def test_char_entropy_hand_computed(spark):
    """Entropy values pinned by hand: uniform 4-char doc -> ln 4; single
    repeated char -> 0; multibyte chars counted as characters."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.textstats import (
        char_entropy,
    )
    import math

    df = spark.createDataFrame(
        [(1, "abcd"), (2, "aaaa"), (3, "日本日本"), (4, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    assert set(got) == {1, 2, 3}  # empty doc absent
    assert got[1].n_chars == 4 and got[1].n_distinct_chars == 4
    assert abs(got[1].char_entropy - round(math.log(4), 6)) < 2e-6
    assert got[2].char_entropy == 0.0
    # 2x日 + 2x本: H = ln 4 - (2 ln 2 + 2 ln 2)/4 = ln 2
    assert got[3].n_chars == 4 and got[3].n_distinct_chars == 2
    assert abs(got[3].char_entropy - math.log(2)) < 2e-6


def test_heavy_hitters_exact_and_partition_independent(spark):
    """Misra-Gries + exact recount must equal the brute-force answer on a
    corpus where heavy tokens are scattered across partitions and the
    distinct-token count dwarfs the sketch capacity."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.topk import (
        heavy_hitter_tokens,
    )

    rows = []
    for i in range(2000):
        # 2000 docs of unique noise tokens, heavy tokens interleaved
        noise = f"u{i}a u{i}b u{i}c"
        heavy = "hot" if i % 4 == 0 else ("warm" if i % 10 == 0 else "")
        rows.append((i, (noise + " " + heavy).strip()))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def brute(frame):
        from pyspark.sql import functions as F

        toks = frame.select(
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != F.lit(""))
            ).alias("token")
        )
        total = toks.count()
        return {
            (r.token, r.n)
            for r in toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
            if r.n >= 0.01 * total
        }

    expected = brute(df)
    assert expected, "construction must produce at least one heavy hitter"
    for parts in (2, 16):
        got = {
            (r.token, r.n_occurrences)
            for r in heavy_hitter_tokens(
                df.repartition(parts), min_share=0.01, capacity=50
            ).collect()
        }
        assert got == expected


def test_json_key_profile(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
        json_key_profile,
    )

    df = spark.createDataFrame(
        [
            ('{"a": 1, "b": "x"}',),
            ('{"a": 2.5, "c": true}',),
            ('{"a": -3}',),
        ],
        "props string",
    )
    out = {r.key: r for r in json_key_profile(df, "props").collect()}
    assert out["a"].n_rows == 3
    assert out["a"].n_int == 2 and out["a"].n_float == 1
    assert out["b"].n_rows == 1 and out["b"].n_int == 0
    assert out["c"].n_bool == 1
    assert out["a"].n_distinct_values == 3


def test_grid_group_quantiles(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.topk import (
        grid_group_quantiles,
    )

    rows = [("s1", float(i)) for i in range(1, 11)]      # 1..10
    rows += [("s2", 100.0)] * 4                           # constant group
    df = spark.createDataFrame(rows, "src string, v double")
    out = {
        (r.src, r.q): (r.value, r.rank_target, r.n_total)
        for r in grid_group_quantiles(df, "src", "v", [0.5, 1.0]).collect()
    }
    assert out[("s1", 0.5)] == (5.0, 5, 10)
    assert out[("s1", 1.0)] == (10.0, 10, 10)
    assert out[("s2", 0.5)] == (100.0, 2, 4)
    assert out[("s2", 1.0)] == (100.0, 4, 4)
