"""Text analysis operators: token stats, language ID, quality scoring.

Everything is built-in column expressions (split/filter/aggregate/size) —
JVM-side, codegen'd, zero Python in the row path — so a 100 TB corpus scan
is one embarrassingly-parallel stage with no shuffle at all.

Each operator materialises the token array in a first projection and
computes all statistics off that attribute: a bare column reference is free,
while an inlined ``split(...)`` expression would re-evaluate per reference
(5+ times per row for the quality score).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import (
    EN_STOPWORDS,
    tokens,
)


def _with_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.col(text_col),
        tokens(F.col(text_col)).alias("__toks"),
    )


def _stop_ratio(toks: Column) -> Column:
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics:
    (id, n_chars, n_tokens, n_distinct_tokens, sum_token_len)."""
    toked = _with_tokens(df, id_col, text_col)
    toks = F.col("__toks")
    return toked.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        # fold-state: non-nullable long init is safe — elements are split()
        # tokens (never NULL), so the fold can never see NULL state
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("sum_token_len"),
    )


def language_id(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.05
) -> DataFrame:
    """Heuristic language ID: function-word hit-rate against a small English
    stopword list. (A production version scores several per-language lists
    and takes the argmax — same shape, more lists.)
    Returns (id, stopword_ratio, lang_pred)."""
    toked = _with_tokens(df, id_col, text_col).withColumn(
        "stopword_ratio", _stop_ratio(F.col("__toks"))
    )
    return toked.select(
        F.col(id_col),
        F.col("stopword_ratio"),
        F.when(F.col("stopword_ratio") > threshold, F.lit("en"))
        .otherwise(F.lit("unknown"))
        .alias("lang_pred"),
    )


# BPE-ish pre-tokenisation: letter runs, digit runs, single punctuation —
# the classic GPT-2-style pre-split shape, kept to regex constructs whose
# semantics agree across regex engines (no lookarounds, no \p classes).
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Per-language function-word lists for the argmax language classifier.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "was", "for", "with", "on"],
    "fr": ["le", "la", "les", "de", "des", "et", "en", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu"],
}


def bpe_token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counts under a BPE-ish regex pre-tokeniser (vs whitespace):
    (id, n_ws_tokens, n_bpe_tokens)."""
    toked = _with_tokens(df, id_col, text_col)
    return toked.select(
        F.col(id_col),
        F.size(F.col("__toks")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def language_id_multi(
    df: DataFrame, id_col: str, text_col: str, min_ratio: float = 0.02
) -> DataFrame:
    """Argmax language ID over per-language function-word hit-rates; ties
    and everything under ``min_ratio`` fall to 'unknown'. Tie-break is by
    list order (en > fr > de), deterministic.
    Returns (id, ratio_en, ratio_fr, ratio_de, lang_pred)."""
    toked = _with_tokens(df, id_col, text_col)
    toks = F.col("__toks")
    n_safe = F.greatest(F.size(toks), F.lit(1)).cast("double")
    ratios = {
        lang: (
            F.size(F.filter(toks, lambda t: F.lower(t).isin(*words))).cast("double")
            / n_safe
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    scored = toked.select(
        F.col(id_col),
        *[ratio.alias(f"ratio_{lang}") for lang, ratio in ratios.items()],
    )
    best = F.greatest(*[F.col(f"ratio_{lang}") for lang in LANG_STOPWORDS])
    pred = F.when(best < min_ratio, F.lit("unknown"))
    for lang in LANG_STOPWORDS:  # first match wins -> list-order tie-break
        pred = pred.when(F.col(f"ratio_{lang}") == best, F.lit(lang))
    return scored.withColumn("lang_pred", pred.otherwise(F.lit("unknown")))


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite quality signal in [0, 1]:
    0.4 * stopword_ratio + 0.3 * distinct-token ratio + 0.3 * length factor
    (length factor = min(1, n_tokens / 100)). The exact formula matters less
    than determinism — it must be replicable in the SQL oracle."""
    toked = _with_tokens(df, id_col, text_col)
    toks = F.col("__toks")
    n = F.size(toks)
    n_safe = F.greatest(n, F.lit(1)).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_safe
    length_factor = F.least(F.lit(1.0), n.cast("double") / F.lit(100.0))
    score = (
        F.lit(0.4) * _stop_ratio(toks)
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.3) * length_factor
    )
    return toked.select(F.col(id_col), score.alias("quality_score"))


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a bag of query ``terms``
    (Robertson/Sparck-Jones, the IDF+1 variant that keeps weights
    positive). Everything is JVM-columnar: one explode for term
    frequencies, one tiny per-term document-frequency aggregate and one
    corpus-stats scalar frame, both broadcast back onto the tf rows — the
    corpus-sized side is touched exactly twice (tokenise, score) no
    matter how many query terms there are.

    Scores are rounded to 6 dp: ln() differs in the last ulp across libm
    implementations, and the rounding makes results engine-portable.
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize_if_large,
    )

    # size-gated cuts: the exploded term table feeds the doclen and tf
    # paths, and doclen feeds the stats scalar + the score join — un-cut
    # each consumer re-tokenizes the corpus (r10 plan audit: 4 scans)
    toks = materialize_if_large(
        df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
        ),
        "bm25_toks_",
    )
    doclen = materialize_if_large(
        toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl")),
        "bm25_doclen_",
    )
    stats = doclen.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        (F.sum("__dl").cast("double") / F.count(F.lit(1))).alias("__avgdl"),
    )
    tf = (
        toks.filter(F.col("token").isin(*terms))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(
        (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    contrib = idf * F.col("__tf") * F.lit(k1 + 1.0) / denom
    return (
        tf.join(doclen, on=id_col)
        .join(F.broadcast(dfreq), on="token")
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )


# Patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition and \b only — no
# lookarounds, no backrefs. That compatibility is what makes the PII scan
# oracle-checkable.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII detection + redaction over a document corpus: per-doc counts of
    email addresses and IPv4 literals, plus the md5 fingerprint of the
    redacted text (emails first, then IPs — order matters and is part of
    the contract).

    Pure regexp column expressions — the 100 TB path is one
    embarrassingly-parallel scan, zero shuffles, zero Python. A production
    pipeline materialises the redacted text itself; the fingerprint is
    emitted here so the result stays compact and hash-comparable.
    Returns (id, n_emails, n_ipv4, redacted_md5).
    """
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        IPV4_RE,
        "<IP>",
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.md5(redacted).alias("redacted_md5"),
    )


def char_class_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Character-class composition per document: exact counts of digits,
    uppercase letters, spaces and sentence punctuation — the integer-exact
    quality signals (code/boilerplate detection, shouting-caps filters)
    that complement the ratio-based ``quality_score``.

    Counts are length deltas after class removal, so everything is
    codegen'd string ops in one shuffle-free scan, and every output is an
    exact integer — no float tolerance needed anywhere.
    Returns (id, n_chars, n_digits, n_upper, n_spaces, n_punct).
    """
    t = F.col(text_col)

    def class_count(pattern: str) -> Column:
        return (
            F.length(t) - F.length(F.regexp_replace(t, pattern, ""))
        ).cast("long")

    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        class_count("[0-9]").alias("n_digits"),
        class_count("[A-Z]").alias("n_upper"),
        class_count(" ").alias("n_spaces"),
        class_count("[.,!?;:]").alias("n_punct"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf
    (idf = ln(n_docs / df), the plain unsmoothed variant).

    Shape: one explode for term frequencies, one tiny vocabulary-sized
    document-frequency aggregate and a one-row corpus count, both
    broadcast back onto the tf rows; the corpus-sized data is shuffled
    once (on the doc id, for the per-doc ranking window). Scores are
    rounded to 6 dp before ranking — ln() differs in the last ulp across
    libm implementations, and ranking on the rounded value (ties broken
    by token) keeps the result engine-portable.
    Returns (id, token, tf, tfidf, term_rank), term_rank in [1, k].
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).alias("__n_docs")
    )
    scored = (
        tf.join(F.broadcast(dfreq), on="token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "token", "tf", "tfidf", "term_rank")
    )


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, simplified to
    the signals computable from whitespace tokens): word-count bounds,
    mean-word-length bounds, alphabetic-word fraction, and a minimum
    stopword hit count. Emits each rule verdict plus the conjunction —
    pipelines filter on ``keep`` but audit the per-rule columns.

    One projection over the token array: every rule is a codegen'd
    expression off the same attribute, no shuffle anywhere.
    ``passthrough``: extra input columns carried into the output so a
    composed pipeline can gate + continue in ONE scan (a keep-ids
    semi-join back to the corpus would scan it twice).
    Returns (id, [passthrough...,] n_words, mean_word_len,
    frac_alpha_words, n_stop_hits, ok_word_count, ok_mean_len, ok_alpha,
    ok_stopwords, keep).
    """
    extra = [c for c in passthrough if c not in (id_col,)]
    toked = df.select(
        F.col(id_col),
        F.col(text_col),
        *[F.col(c) for c in extra if c != text_col],
        tokens(F.col(text_col)).alias("__toks"),
    )
    toks = F.col("__toks")
    n = F.size(toks)
    n_safe = F.greatest(n, F.lit(1)).cast("double")
    mean_len = (
        # fold-state: split() tokens are never NULL; non-nullable init safe
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
        .cast("double")
        / n_safe
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double")
        / n_safe
    )
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    ok_words = (n >= 5) & (n <= 100_000)
    ok_mean = (mean_len >= 2.0) & (mean_len <= 12.0)
    ok_alpha = alpha_frac >= 0.8
    ok_stop = stop_hits >= 2
    return toked.select(
        F.col(id_col),
        *[F.col(c) for c in extra],
        n.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("frac_alpha_words"),
        stop_hits.cast("long").alias("n_stop_hits"),
        ok_words.alias("ok_word_count"),
        ok_mean.alias("ok_mean_len"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_mean & ok_alpha & ok_stop).alias("keep"),
    )


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-fertility statistics per language (or any grouping):
    characters and utf-8 bytes per whitespace token — the signal a
    multilingual pipeline uses to spot languages a tokenizer serves badly
    (high bytes/token => fragmenting scripts). One grouped aggregation of
    integer sums; the ratios are divisions of exact int64s, so the output
    is engine-exact.
    Returns (group, n_docs, n_tokens, n_chars, n_bytes, chars_per_token,
    bytes_per_token).
    """
    toks = tokens(F.col(text_col))
    agg = df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
        F.sum(F.length(F.col(text_col))).cast("long").alias("n_chars"),
        F.sum(F.octet_length(F.encode(F.col(text_col), "utf-8")))
        .cast("long")
        .alias("n_bytes"),
    )
    return agg.select(
        group_col,
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_bytes",
        (F.col("n_chars").cast("double") / F.col("n_tokens").cast("double")).alias(
            "chars_per_token"
        ),
        (F.col("n_bytes").cast("double") / F.col("n_tokens").cast("double")).alias(
            "bytes_per_token"
        ),
    )


def bigram_lm_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style n-gram language-model quality scoring: train an
    add-one-smoothed bigram LM on the corpus itself, then score every
    document by its mean bigram log-probability — fluent, corpus-typical
    text scores high, boilerplate/garbage scores low. The classic cheap
    perplexity filter for LLM training data (CCNet trains KenLM on
    Wikipedia; the corpus-self-trained bigram variant needs no external
    model and is what this engine can verify end-to-end).

    ``P(w2|w1) = (c(w1 w2) + 1) / (c(w1 .) + V)`` with V = number of
    distinct context words. Engine-exact: counts are integers, each ln
    term is computed double/double (one rounding), rounded to 6 dp and
    summed as DECIMAL (order-free), and the final mean divides two exact
    casts — identical in Spark and DuckDB.

    Scale shape: the corpus is exploded into bigrams EXACTLY ONCE — the
    per-doc bigram count table (doc, w1, w2, k) is materialized, and
    everything else derives from that stored table: global bigram counts
    (one groupBy), context counts and V (aggregates over the counts),
    and the scoring join (token-keyed equi-join of stored doc-bigrams
    against stored global counts; broadcast when small, skew-safe hash
    join at web scale) followed by one doc-keyed shuffle for the mean,
    with each ln term weighted by its in-doc multiplicity k. Documents
    with fewer than two tokens have no bigrams and are absent from the
    output (no defined perplexity).
    Returns (id, n_bigrams, avg_logprob).
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize,
    )

    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    bg = toked.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("__toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - 1),
                    lambda i: F.struct(
                        F.element_at("__toks", i).alias("w1"),
                        F.element_at("__toks", i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))

    bgc = materialize(
        bg.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("__k")),
        "doc_bigram_counts_",
    )
    c12 = bgc.groupBy("w1", "w2").agg(F.sum("__k").cast("long").alias("__c12"))
    c1 = bgc.groupBy("w1").agg(F.sum("__k").cast("long").alias("__c1"))
    vq = c1.agg(F.count(F.lit(1)).alias("__v"))

    term = F.round(
        F.log(
            (F.col("__c12") + 1).cast("double")
            / (F.col("__c1") + F.col("__v")).cast("double")
        ),
        6,
    ).cast("decimal(28,6)")
    return (
        bgc.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vq))
        .groupBy(id_col)
        .agg(
            F.sum("__k").cast("long").alias("n_bigrams"),
            F.sum(F.col("__k").cast("decimal(28,6)") * term).alias("__sum"),
        )
        .select(
            F.col(id_col),
            F.col("n_bigrams"),
            (
                F.col("__sum").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("avg_logprob"),
        )
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-distribution Shannon entropy (nats) — the
    compression-ratio-style garbage detector: natural text sits in a
    narrow entropy band, while base64 blobs / key-mash / repeated-char
    padding land far above or below it. ``H = ln(n) - (sum_c k_c ln k_c)/n``
    over per-character counts ``k_c``.

    Engine-exact: characters come from the same explode-positions +
    substring construction in Spark and DuckDB (char-based in both, so
    multibyte-safe); each ``k ln k`` term is rounded to 6 dp and summed
    as DECIMAL (order-free), and the final expression performs the same
    single-rounding double ops in the same order in both engines.

    Scale shape: one narrow per-char explode (|chars| rows, the
    unavoidable cost of a character histogram) into a (doc, char)
    groupBy, then a doc-keyed rollup — two shuffles, both keyed well.
    Documents with empty text have no characters and are absent.
    Returns (id, n_chars, n_distinct_chars, char_entropy).
    """
    ch = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.length(text_col) > 0,
                F.sequence(F.lit(1), F.length(text_col)),
            ).otherwise(F.array())
        ).alias("__i"),
        F.col(text_col),
    ).select(
        F.col(id_col),
        F.col(text_col).substr(F.col("__i"), F.lit(1)).alias("__c"),
    )
    counts = ch.groupBy(id_col, "__c").agg(F.count(F.lit(1)).alias("__k"))
    term = F.col("__k").cast("decimal(28,6)") * F.round(
        F.log(F.col("__k").cast("double")), 6
    ).cast("decimal(28,6)")
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("__k").cast("long").alias("n_chars"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
            F.sum(term).alias("__s"),
        )
        .select(
            F.col(id_col),
            F.col("n_chars"),
            F.col("n_distinct_chars"),
            (
                F.round(F.log(F.col("n_chars").cast("double")), 6).cast(
                    "double"
                )
                - F.col("__s").cast("double")
                / F.col("n_chars").cast("double")
            ).alias("char_entropy"),
        )
    )


def bpe_merge_candidates(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 30,
) -> DataFrame:
    """The first iteration of BPE vocabulary induction (Sennrich et al.
    2016): count adjacent character-pair frequencies across the corpus,
    weighted by word frequency — the top pair is the merge a BPE trainer
    would perform next. Emits the ``top_k`` candidate merges by
    (weighted count desc, pair asc).

    Shape: one word-frequency groupBy over the token explode (the big
    shuffle — vocabulary-keyed, partial-agg friendly), then pairs derive
    from the *vocabulary table* (|V| rows, not corpus rows): each word
    explodes into its len-1 adjacent pairs and one pair-keyed rollup
    finishes. At 100 TB the corpus is touched once; everything after is
    vocabulary-sized. Further BPE iterations would re-segment against
    the merge table — this operator is the per-iteration counting plan.
    """
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # adjacent char pair i = substr(word, i, 2); words shorter than 2
    # chars contribute nothing (sequence guard — Spark sequence DESCENDS
    # on an empty range, which would fabricate pairs)
    pair_idx = F.when(
        F.length("word") >= 2, F.sequence(F.lit(1), F.length("word") - 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    pairs = words.select(
        "freq",
        F.explode(
            F.transform(
                pair_idx, lambda i: F.col("word").substr(i, F.lit(2))
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n_weighted"))
        .orderBy(F.col("n_weighted").desc(), F.col("pair").asc())
        .limit(top_k)
    )


BLOCKLIST_V1 = ["spam", "fraud", "scam", "phishing", "malware", "exploit"]


def blocklist_filter_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Lexicon-based safety filtering (the blocklist tier every corpus
    pipeline runs before model-based classifiers): per document, the
    count of distinct blocklist terms present and a keep/drop verdict;
    rolled up per domain with the hit rate — the triage view that
    decides whether a source needs review.

    The lexicon is a literal array (broadcast-free: it folds into the
    plan as a constant), membership is ``array_intersect`` over the
    token set — pure codegen, shuffle only for the per-domain rollup.
    In production the list is thousands of terms: same plan, the
    constant array becomes a broadcast join against a lexicon table.
    Returns (group, n_docs, n_flagged, flagged_share, total_hits).
    """
    terms = F.array(*[F.lit(t) for t in (blocklist or BLOCKLIST_V1)])
    hits = F.size(
        F.array_intersect(F.array_distinct(tokens(F.col(text_col))), terms)
    )
    scored = df.select(
        F.col(id_col), F.col(group_col), hits.alias("__hits")
    )
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("__hits") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        (
            F.sum(F.when(F.col("__hits") > 0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("flagged_share"),
        F.sum("__hits").cast("long").alias("total_hits"),
    )


def vocab_oov_rate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 500,
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_size`` token vocabulary — the tokenizer-coverage audit a
    training pipeline runs before committing to a vocab (docs with high
    OOV under the candidate vocab will fragment into long byte-level
    token sequences).

    Vocabulary = top tokens by (freq desc, token asc) — the tie-break
    makes the cut deterministic and oracle-reproducible. The top-k is a
    ``limit`` over the token-count aggregate (TakeOrdered: partial
    per-partition top-k, never a full sort of the vocabulary), the
    membership probe is a broadcast left-semi join, so the corpus-sized
    side shuffles once for the doc rollup and never for the probe.
    Returns (id, n_tokens, n_oov, oov_rate).
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select("token")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("__in_vocab", F.lit(1))),
        on="token",
        how="left",
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        (
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("oov_rate"),
    )


def bigram_lift_top(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top collocations by association LIFT over adjacent token bigrams:
    ``lift = c_xy * N / (left_x * right_y)`` where ``c_xy`` counts the
    bigram, ``left_x`` / ``right_y`` count x as a bigram-left / y as a
    bigram-right, and N is the total bigram count — the multiword-
    expression miner behind tokenizer-merge and phrase-vocab decisions.

    Deliberately lift, not PMI: lift is PMI without the final ``ln``,
    so every value is ONE IEEE division of two exactly-summed integer
    products (long->double casts and the divide are the same half-even
    ops in any engine) — bit-identical to the SQL oracle, where a
    transcendental ln's last ulp is not. Ordering ties break on
    (count desc, x, y). One explode + two broadcast-joined unigram
    margins; the bigram table aggregates with map-side combine.
    Returns (x, y, c_xy, lift) — the top ``k`` rows.
    """
    toks = tokens(F.col(text_col))
    pairs = df.select(
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.struct(a.alias("x"), b.alias("y")),
                ),
            ).otherwise(F.array()),
        ).alias("bi")
    ).select(F.col("bi.x").alias("x"), F.col("bi.y").alias("y"))
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        materialize_if_large,
    )

    # bigram-vocab rollup feeding margins + total + scores: gated cut
    counts = materialize_if_large(
        pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy")),
        "bilift_counts_",
    )
    lefts = counts.groupBy("x").agg(F.sum("c_xy").alias("left_x"))
    rights = counts.groupBy("y").agg(F.sum("c_xy").alias("right_y"))
    total = counts.agg(F.sum("c_xy").alias("n_bi"))
    scored = (
        counts.filter(F.col("c_xy") >= min_count)
        .join(F.broadcast(lefts), "x")
        .join(F.broadcast(rights), "y")
        .crossJoin(F.broadcast(total))
        .withColumn(
            # exact integer products via DECIMAL (long*long wraps at corpus
            # scale), then ONE double cast + divide each — the same
            # exact-int-to-double rounding DuckDB's HUGEINT path applies
            "lift",
            (
                F.col("c_xy").cast("decimal(19,0)")
                * F.col("n_bi").cast("decimal(19,0)")
            ).cast("double")
            / (
                F.col("left_x").cast("decimal(19,0)")
                * F.col("right_y").cast("decimal(19,0)")
            ).cast("double"),
        )
    )
    return (
        scored.orderBy(
            F.col("lift").desc(), F.col("c_xy").desc(),
            F.col("x").asc(), F.col("y").asc(),
        )
        .limit(k)
        .select("x", "y", "c_xy", "lift")
    )


def flesch_reading_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Flesch reading-ease per document — the classic readability gate a
    quality pipeline runs next to ``gopher_rules``: 206.835 −
    1.015*(words/sentences) − 84.6*(syllables/words), with syllables
    approximated by VOWEL-GROUP runs (the standard regex surrogate —
    consistent, monotone with true syllable count, and exactly portable
    across engines, unlike dictionary syllabifiers).

    All three counts are exact integers from columnar regexp extraction
    (no Python in the row path): words = whitespace tokens, sentences =
    [.!?]+ runs floored at 1 (an unpunctuated doc is one sentence, not a
    division by zero), syllable groups = [aeiouy]+ runs in the
    lowercased text. The score is ONE fixed float tree over those
    integers. Returns (id, n_words, n_sentences, n_syllable_groups,
    flesch); flesch is NULL for wordless docs.
    """
    words = F.size(tokens(F.col(text_col))).cast("long")
    sentences = F.greatest(
        F.lit(1).cast("long"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), 0)
        ).cast("long"),
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    staged = df.select(
        F.col(id_col).alias("id"),
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllable_groups"),
    )
    flesch = F.when(
        F.col("n_words") > 0,
        F.lit(206.835)
        - F.lit(1.015)
        * (
            F.col("n_words").cast("double")
            / F.col("n_sentences").cast("double")
        )
        - F.lit(84.6)
        * (
            F.col("n_syllable_groups").cast("double")
            / F.col("n_words").cast("double")
        ),
    )
    return staged.select(
        "id",
        "n_words",
        "n_sentences",
        "n_syllable_groups",
        flesch.alias("flesch"),
    )


def source_profile_cosine(
    df: DataFrame,
    group_col: str,
    text_col: str,
) -> DataFrame:
    """Pairwise cosine similarity between groups' token-count profiles
    — "does source A write like source B?", the lexical-distribution
    complement of the vocabulary-OVERLAP matrix (overlap asks which
    words are shared; this asks whether they are used at the same
    RATES).

    Exact integer machinery end-to-end: per-(group, token) counts, the
    dot product sum(c_a * c_b) over the token equi-join of the two
    profiles, the norms sum(c^2) per group — all DECIMAL(38,0); one
    float expression per pair. The pair space is groups^2 (bounded —
    caller contract), the join is token-keyed, never a cartesian of
    rows. Returns one row per unordered pair (group_a < group_b):
    (group_a, group_b, n_shared_tokens, cosine).
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens

    cells = (
        df.select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(F.col(text_col))).alias("__t"),
        )
        .groupBy("__g", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    norms = cells.groupBy("__g").agg(
        F.sum(F.col("__c").cast("decimal(38,0)") * F.col("__c")).alias(
            "__n2"
        )
    )
    a = cells.select(
        F.col("__g").alias("__ga"), "__t", F.col("__c").alias("__ca")
    )
    b = cells.select(
        F.col("__g").alias("__gb"), "__t", F.col("__c").alias("__cb")
    )
    dots = (
        a.join(b, "__t")
        .filter(F.col("__ga") < F.col("__gb"))
        .groupBy("__ga", "__gb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_tokens"),
            F.sum(
                F.col("__ca").cast("decimal(38,0)") * F.col("__cb")
            ).alias("__dot"),
        )
    )
    na = norms.select(F.col("__g").alias("__ga"), F.col("__n2").alias("__na"))
    nb = norms.select(F.col("__g").alias("__gb"), F.col("__n2").alias("__nb"))
    out = dots.join(F.broadcast(na), "__ga").join(F.broadcast(nb), "__gb")
    cos = F.col("__dot").cast("double") / F.sqrt(
        F.col("__na").cast("double") * F.col("__nb").cast("double")
    )
    return out.select(
        F.col("__ga").alias("group_a"),
        F.col("__gb").alias("group_b"),
        "n_shared_tokens",
        cos.alias("cosine"),
    )


def code_prose_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Code-vs-prose detection heuristic — the RedPajama/Dolma-style
    structural screen that routes documents to a code pipeline (or drops
    code from a prose corpus) WITHOUT a model: per document, the density
    of code-indicative structure over total characters, all from
    ``regexp_count``-style columnar passes (no UDF, no explode).

    Signals (integer counts, exact in both engines):
    - ``n_code_chars``: characters in ``{}[]();=<>`` plus ``#`` and
      backtick — punctuation prose rarely stacks;
    - ``n_keyword_hits``: occurrences of a fixed code-keyword set
      (def/return/import/void/const/function/class) as whole words;
    - ``n_chars`` / ``n_tokens`` for the densities.

    Returns (doc_id, n_chars, n_tokens, n_code_chars, n_keyword_hits,
    code_char_ratio, is_codelike) with is_codelike the standard
    ratio>0.03 OR keywords>=3 cut. Ratios are single IEEE divisions of
    exact int64 counts — engine-deterministic. One narrow projection per
    doc: at 100 TB this is a map-only pass, no shuffle at all.
    """
    text = F.col(text_col)
    n_chars = F.length(text).cast("long")
    code_chars = F.length(
        F.regexp_replace(text, r"[^{}\[\]();=<>#`]", "")
    ).cast("long")
    kw = F.regexp_count(
        text,
        F.lit(r"\b(def|return|import|void|const|function|class)\b"),
    ).cast("long")
    n_tokens = F.size(tokens(text)).cast("long")
    ratio = F.when(
        n_chars > 0, code_chars.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        code_chars.alias("n_code_chars"),
        kw.alias("n_keyword_hits"),
        ratio.alias("code_char_ratio"),
        ((ratio > 0.03) | (kw >= 3)).alias("is_codelike"),
    )


def byte_char_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """UTF-8 byte-budget audit: bytes vs characters per group (or
    corpus-wide with ``group_col=None``) — the number that converts a
    100 TB *byte* budget into a character/token budget, and the
    multibyte share that flags scripts whose tokenizer fertility will
    differ (CJK, Cyrillic, emoji-heavy). Exact int64 sums of
    ``octet_length`` and ``length`` per group; one map-side-combinable
    aggregation, ratios as single IEEE divisions. Returns (group?,
    n_docs, total_bytes, total_chars, multibyte_chars,
    bytes_per_char, multibyte_share).
    """
    text = F.col(text_col)
    byts = F.octet_length(text).cast("long")
    chars = F.length(text).cast("long")
    grouped = (
        df.groupBy(F.col(group_col).alias("grp")) if group_col else df.groupBy()
    )
    agg = grouped.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(byts).cast("long").alias("total_bytes"),
        F.sum(chars).cast("long").alias("total_chars"),
        F.sum(byts - chars).cast("long").alias("multibyte_extra"),
    )
    bpc = F.when(
        F.col("total_chars") > 0,
        F.col("total_bytes").cast("double") / F.col("total_chars").cast("double"),
    )
    share = F.when(
        F.col("total_bytes") > 0,
        F.col("multibyte_extra").cast("double")
        / F.col("total_bytes").cast("double"),
    )
    return agg.select(
        *(["grp"] if group_col else []),
        "n_docs",
        "total_bytes",
        "total_chars",
        "multibyte_extra",
        bpc.alias("bytes_per_char"),
        share.alias("multibyte_extra_share"),
    )


def hill_tail_alpha(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 200,
) -> DataFrame:
    """Hill estimator of the token-frequency power-law tail index — the
    number behind "is this corpus Zipfian with alpha ~ 1?" that
    token_zipf's rank table only shows visually. alpha_hat = k / Σ_{i<=k}
    ln(c_i / c_(k+1)) over the k most frequent tokens, with the
    (k+1)-th count as the threshold.

    Determinism contract: the top-(k+1) selection orders by (count desc,
    token asc) — a TakeOrderedAndProject, never a vocab-spanning sort —
    and each ln term is quantized to INTEGER MICROS
    (round(ln(ratio)·1e6) as BIGINT): int64 sums cast to double are
    correctly rounded identically in both engines, where a DECIMAL→
    double cast is not (the 17th-digit pitfall). ALWAYS returns exactly
    one row: (k, c_threshold, sum_log, alpha); alpha is NULL when the
    top-k counts all tie the threshold (sum 0), and the whole row is
    (requested k, NULL, NULL, NULL) when the vocabulary has <= k types
    (no (k+1)-th threshold exists). The small-vocabulary guard is a
    left join from a literal one-row frame, so collect()[0]-style
    consumers never crash on a small corpus (r8 advice fix).
    """
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(k + 1)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    ranked = top.withColumn("__rn", F.row_number().over(w))
    thr = ranked.filter(F.col("__rn") == k + 1).select(
        F.col("n").alias("__cmin")
    )
    micros = F.round(
        F.log(F.col("n").cast("double") / F.col("__cmin").cast("double"))
        * F.lit(1000000.0),
        0,
    ).cast("long")
    terms = (
        ranked.filter(F.col("__rn") <= k)
        .crossJoin(F.broadcast(thr))
        .select(micros.alias("__m"), "__cmin")
    )
    agg = terms.groupBy("__cmin").agg(
        F.count(F.lit(1)).cast("long").alias("__k"),
        F.sum("__m").cast("long").alias("__sm"),
    )
    sum_log = F.col("__sm").cast("double") / F.lit(1000000.0)
    out = agg.select(
        F.col("__k").alias("k"),
        F.col("__cmin").cast("long").alias("c_threshold"),
        sum_log.alias("sum_log"),
        F.when(
            F.col("__sm") > 0, F.col("__k").cast("double") / sum_log
        ).alias("alpha"),
    )
    # Small-vocabulary guard: when the corpus has <= k token types, thr
    # is empty and the aggregate above yields ZERO rows. A left join
    # from a literal one-row frame restores the documented one-row
    # contract with (requested k, NULL, NULL, NULL).
    one = df.sparkSession.range(1).select(F.lit(1).alias("__j"))
    return (
        one.join(F.broadcast(out.withColumn("__j", F.lit(1))), "__j", "left")
        .select(
            F.coalesce(F.col("k"), F.lit(k).cast("long")).alias("k"),
            "c_threshold",
            "sum_log",
            "alpha",
        )
    )


def doclen_lognormal_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Log-normal fit of the document-length distribution: mu/sigma of
    ln(token count) — corpus length distributions are approximately
    lognormal, and (mu, sigma) is the 2-number summary that a length-
    bucketed packing plan or a truncation policy actually needs.

    Integer-micros convention end-to-end: each doc's ln(n_tokens) is one
    IEEE log over an exact integer, quantized to micros
    (round(ln·1e6) as BIGINT); first and second moments accumulate in
    int64 (promote to DECIMAL(38,0) past ~1e9 docs), every cast to
    double is the unique correctly-rounded int64 conversion, and mu /
    the ddof-1 sigma are fixed IEEE trees — bit-equal across engines.
    Returns one row: (n_docs, n_empty, mu_log_len, sigma_log_len);
    zero-token docs are excluded from the fit (ln undefined) and
    counted in n_empty.
    """
    lens = df.select(
        F.size(tokens(F.col(text_col))).cast("long").alias("__l")
    )
    micros = F.round(
        F.log(F.col("__l").cast("double")) * F.lit(1000000.0), 0
    ).cast("long")
    nonempty = lens.filter(F.col("__l") > 0).select(micros.alias("__m"))
    agg = nonempty.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__m").cast("long").alias("__s"),
        F.sum(F.col("__m") * F.col("__m")).cast("long").alias("__q"),
    )
    empty = lens.agg(
        F.sum(F.when(F.col("__l") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_empty")
    )
    out = agg.crossJoin(F.broadcast(empty))
    nd = F.col("n_docs").cast("double")
    mu = F.col("__s").cast("double") / F.lit(1000000.0) / nd
    var = (
        nd * F.col("__q").cast("double")
        - F.col("__s").cast("double") * F.col("__s").cast("double")
    ) / (F.lit(1000000.0) * F.lit(1000000.0) * nd * (nd - F.lit(1.0)))
    return out.select(
        "n_docs",
        "n_empty",
        F.when(F.col("n_docs") > 0, mu).alias("mu_log_len"),
        F.when(F.col("n_docs") > 1, F.sqrt(var)).alias("sigma_log_len"),
    )


def vocab_richness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chao1 vocabulary-richness estimate + Good-Turing unseen mass over
    the whitespace-token vocabulary — the two numbers a corpus-growth
    plan actually consumes: how many types the corpus is still missing
    (Chao1 lower bound via singleton/doubleton counts) and how much
    probability mass the NEXT token draw puts on unseen types
    (Good-Turing P0 = N1/N). Heaps'-law's sampling-theory complement.
    Returns exactly ONE row: (n_tokens, vocab, n_singletons,
    n_doubletons, chao1, unseen_mass).

    Exactness: all five counts are exact integers from one token
    groupBy; the bias-corrected Chao1 term N1*(N1-1)/(2*(N2+1)) — the
    form that stays defined when no doubletons exist — and P0 are each
    ONE fixed IEEE tree. Empty corpora keep the one-row contract with
    zero counts and NULL estimates.

    Scale shape: one map-side-combinable token count, then a count-of-
    counts rollup over the (bounded) frequency domain — the token_zipf
    discipline.
    """
    toks = df.select(
        F.explode(tokens(F.col(text_col))).alias("__t")
    )
    counts = toks.groupBy("__t").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    agg = counts.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.coalesce(F.sum(F.when(F.col("__c") == 1, 1)), F.lit(0))
        .cast("long")
        .alias("n_singletons"),
        F.coalesce(F.sum(F.when(F.col("__c") == 2, 1)), F.lit(0))
        .cast("long")
        .alias("n_doubletons"),
    )
    n1 = F.col("n_singletons")
    chao1 = F.col("vocab").cast("double") + (
        n1.cast("double")
        * (n1 - F.lit(1)).cast("double")
        / (F.lit(2.0) * (F.col("n_doubletons") + F.lit(1)).cast("double"))
    )
    return agg.select(
        "n_tokens",
        "vocab",
        "n_singletons",
        "n_doubletons",
        F.when(F.col("vocab") > 0, chao1).alias("chao1"),
        F.when(
            F.col("n_tokens") > 0,
            n1.cast("double") / F.col("n_tokens").cast("double"),
        ).alias("unseen_mass"),
    )


def token_burstiness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Fano factor (variance/mean of the per-document count, zeros
    included) for the ``top_k`` corpus tokens — the Church-style
    burstiness diagnostic: function words arrive ~Poisson (Fano near
    1), content/topical words are bursty (Fano >> 1), and boilerplate
    repeated verbatim in few docs is the extreme tail. The signal a
    stopword-list builder or a topical-token screen reads directly.
    Returns ``top_k`` rows ordered by total count:
    (token, total_count, n_docs_with, fano).

    Exactness: with D = total docs, T = sum of per-doc counts, and
    Q = sum of squared per-doc counts (zero docs contribute 0 to both),
    the population Fano factor is (D*Q - T^2) / (D*T) — exact integer
    numerator/denominator at DECIMAL(38,0) (D*Q overflows int64 past
    ~1e9 docs x large Q) and ONE float division. Ties on total count
    break lexicographically; both engines rank identically.

    Scale shape: one (token, doc) count rollup, one token rollup, a
    top-k over the vocabulary — the token_zipf discipline; D is a
    broadcast 1-row aggregate.
    """
    per_doc = (
        df.select(
            F.col(id_col).alias("__d"),
            F.explode(tokens(F.col(text_col))).alias("__t"),
        )
        .groupBy("__t", "__d")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    per_token = per_doc.groupBy("__t").agg(
        F.sum("__c").cast("long").alias("total_count"),
        F.count(F.lit(1)).cast("long").alias("n_docs_with"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__q"),
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("__nd"))
    w = Window.orderBy(
        F.col("total_count").desc(), F.col("__t").asc()
    )
    top = (
        per_token.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(int(top_k)))
        .crossJoin(F.broadcast(n_docs))
    )
    num = (
        F.col("__nd").cast("decimal(38,0)") * F.col("__q")
        - F.col("total_count").cast("decimal(38,0)")
        * F.col("total_count")
    )
    den = F.col("__nd").cast("decimal(38,0)") * F.col("total_count")
    return top.select(
        F.col("__t").alias("token"),
        "total_count",
        "n_docs_with",
        F.when(
            (F.col("__nd") > 0) & (F.col("total_count") > 0),
            num.cast("double") / den.cast("double"),
        ).alias("fano"),
    )
