"""Wave 50: content-defined chunking — shift resistance, token
conservation, partition independence."""

from __future__ import annotations

from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import (
    cdc_shared_chunk_stats,
    content_defined_chunks,
)


def _mk(spark):
    text = " ".join(f"word{i % 37}x{i % 11}" for i in range(200))
    return spark.createDataFrame(
        [
            (1, text),
            (2, "inserted sentence goes here . " + text),  # prefix insert
            (3, text + " and a suffix"),                    # suffix insert
            (4, "tiny doc"),                                # shorter than w
        ],
        "doc_id long, text string",
    )


def test_cdc_token_conservation_and_order(spark):
    ch = content_defined_chunks(_mk(spark), "doc_id", "text").collect()
    per = {}
    for r in ch:
        per.setdefault(r.doc_id, []).append(r)
    assert sum(r.n_tokens for r in per[1]) == 200
    idxs = sorted(r.chunk_idx for r in per[1])
    assert idxs == list(range(1, len(idxs) + 1))  # dense 1-based order
    assert len(per[4]) == 1 and per[4][0].n_tokens == 2  # whole-doc chunk


def test_cdc_shift_resistance(spark):
    """A PREFIX insertion — the case that re-fingerprints EVERY
    fixed-offset chunk — must preserve the vast majority of CDC chunks,
    because boundaries re-synchronise at the first content-derived cut
    after the edit."""
    ch = content_defined_chunks(_mk(spark), "doc_id", "text").collect()
    fp = {}
    for r in ch:
        fp.setdefault(r.doc_id, set()).add(r.fingerprint)
    survival_prefix = len(fp[1] & fp[2]) / len(fp[1])
    survival_suffix = len(fp[1] & fp[3]) / len(fp[1])
    assert survival_prefix >= 0.8
    assert survival_suffix >= 0.8


def test_cdc_partition_independent(spark):
    df = _mk(spark)
    one = sorted(
        map(tuple, content_defined_chunks(df.coalesce(1), "doc_id", "text").collect())
    )
    many = sorted(
        map(tuple, content_defined_chunks(df.repartition(8), "doc_id", "text").collect())
    )
    assert one == many  # boundaries are content-derived, layout-free


def test_cdc_shared_stats(spark):
    stats = {
        r.doc_id: r
        for r in cdc_shared_chunk_stats(_mk(spark), "doc_id", "text").collect()
    }
    # docs 1-3 share most content; doc 4 shares nothing
    assert stats[1].shared_token_frac > 0.8
    assert stats[4].n_shared_chunks == 0 and stats[4].shared_token_frac == 0.0
    assert stats[1].n_tokens == 200
