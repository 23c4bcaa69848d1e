"""Wave 118: HITS hubs & authorities over the token bigram graph —
hand-walked goldens through the queries() registry."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod


def _sf_docs(spark, tmp_path, texts):
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [(i, t, "en", "web") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_hits_star_golden(spark, tmp_path):
    # docs "a b" and "c b": edges a->b, c->b. After 2 L1-normalized
    # iterations: b is THE authority (1.0, hub 0), a and c are the
    # hubs (0.5 each, authority 0) — the hub/authority split PageRank
    # cannot express.
    sf = _sf_docs(spark, tmp_path, ["a b", "c b"])
    q = entry_mod.queries()
    rows = {r.token: r for r in q["hits_token_graph"](spark, sf).collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["b"].authority == pytest.approx(1.0)
    assert rows["b"].hub == pytest.approx(0.0)
    for t in ("a", "c"):
        assert rows[t].authority == pytest.approx(0.0)
        assert rows[t].hub == pytest.approx(0.5)


def test_hits_chain_weights(spark, tmp_path):
    # "x y y z" gives edges x->y (1), y->y (1), y->z (1): y is both a
    # hub and an authority; scores must stay L1-normalized per vector
    sf = _sf_docs(spark, tmp_path, ["x y y z"])
    q = entry_mod.queries()
    rows = q["hits_token_graph"](spark, sf).collect()
    a_sum = sum(r.authority for r in rows)
    h_sum = sum(r.hub for r in rows)
    assert a_sum == pytest.approx(1.0, abs=1e-6)
    assert h_sum == pytest.approx(1.0, abs=1e-6)
    by = {r.token: r for r in rows}
    assert by["y"].authority > by["x"].authority
    assert by["y"].hub > by["z"].hub


def test_hits_empty_and_single_token(spark, tmp_path):
    # no bigrams at all -> empty typed frame (no divide-by-zero)
    sf = _sf_docs(spark, tmp_path, ["solo", ""])
    q = entry_mod.queries()
    assert q["hits_token_graph"](spark, sf).collect() == []
