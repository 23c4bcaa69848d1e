"""Wave 82: cross-document exact-substring span removal (Lee et al. 2022
"remove the duplicated span, keep one canonical occurrence") — hand-computed
golden intervals, class separation, and partition independence."""

from __future__ import annotations

from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import dup_span_removal

DOCS = [
    (1, "a b c d e f"),
    (2, "x b c d e y"),
    (3, "a b c a b c a b c"),
    (4, "too short"),  # < window_tokens: contributes nothing
]

# window_tokens=3 over the corpus above:
#   "a b c": (1,1) (3,1) (3,4) (3,7) — canonical (1,1)
#   "b c d": (1,2) (2,2)            — canonical (1,2)
#   "c d e": (1,3) (2,3)            — canonical (1,3)
#   "b c a": (3,2) (3,5)            — canonical (3,2)
#   "c a b": (3,3) (3,6)            — canonical (3,3)
#   "x b c" / "d e f" / "d e y": unique — never emitted
# islands (per doc, per keep-class, adjacent/overlapping windows merged):
#   doc1 keep:   pos 1,2,3      -> start 1, len 3+3-1 = 5
#   doc2 remove: pos 2,3        -> start 2, len 3+3-2 = 4
#   doc3 keep:   pos 2,3        -> start 2, len 3+3-2 = 4
#   doc3 remove: pos 1,4,5,6,7  -> [1,3] adjacent to [4,6] merges on
#                                  through 7 -> start 1, len 7+3-1 = 9
GOLDEN = {
    (1, 1, 5, True),
    (2, 2, 4, False),
    (3, 2, 4, True),
    (3, 1, 9, False),
}


def _run(spark, df):
    out = dup_span_removal(df, "doc_id", "text", window_tokens=3)
    return {
        (r.doc_id, r.span_start, r.span_len, r.keep) for r in out.collect()
    }


def test_golden_intervals(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert _run(spark, df) == GOLDEN


def test_partition_independent(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").repartition(7)
    assert _run(spark, df) == GOLDEN


def test_exactly_one_canonical_occurrence_per_duplicated_span(spark):
    """Every duplicated span keeps exactly one occurrence: the keep=True
    interval set must cover the canonical positions and no removal row may
    be the corpus's only copy. Checked structurally: for each doc the
    keep and remove interval sets never coincide exactly (a span can't be
    both fully kept and fully removed as the same interval)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = _run(spark, df)
    keeps = {(d, s, n) for (d, s, n, k) in rows if k}
    removes = {(d, s, n) for (d, s, n, k) in rows if not k}
    assert keeps and removes
    assert not keeps & removes
