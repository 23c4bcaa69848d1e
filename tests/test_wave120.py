"""Wave 120: Hoeffding's D + Blomqvist's beta + Goodman-Kruskal lambda
— hand-computed goldens through the queries() registry."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod


def _sf_li(spark, tmp_path, rows, sub="sf"):
    """rows: (qty, extprice, disc)."""
    sf = str(tmp_path / sub)
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(float(q), float(p), float(d)) for (q, p, d) in rows],
        "l_quantity double, l_extendedprice double, l_discount double",
    ).write.mode("overwrite").parquet(os.path.join(sf, "lineitem.parquet"))
    return sf


def _sf_docs(spark, tmp_path, rows, sub="sf"):
    """rows: (lang, source) with multiplicity."""
    sf = str(tmp_path / sub)
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, lang, src) for i, (lang, src) in enumerate(rows)],
        "doc_id long, lang string, source string",
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_hoeffding_perfect_monotone_no_ties(spark, tmp_path):
    # x = y = 1..5, no ties: R_i = S_i = i, c_i = i - 1.
    # D1 = sum (i-1)(i-2) = 20, D2 = sum ((i-1)(i-2))^2 = 184,
    # D3 = sum (i-2)^2 (i-1) = 50.
    # D = 30*[(3*2)*20 + 184 - 2*3*50] / (5*4*3*2*1) = 30*4/120 = 1.
    sf = _sf_li(
        spark, tmp_path,
        [(i, 0, i / 100.0) for i in range(1, 6)],
    )
    q = entry_mod.queries()
    r = q["hoeffding_d_qty_discount"](spark, sf).collect()[0]
    assert r.n_total == 5
    assert r.d1_16x == pytest.approx(20.0)
    assert r.d2_16x == pytest.approx(184.0)
    assert r.d3_16x == pytest.approx(50.0)
    assert r.hoeffding_d == pytest.approx(1.0)


def test_hoeffding_tied_pairs_golden(spark, tmp_path):
    # x = y over {1,1,2,2,3}: cells (1,1)c=2, (2,2)c=2, (3,3)c=1.
    # Midranks 1.5/3.5/5; quarter-credit c_i = 0.25/2.25/4.
    # D1 = 17.25, D2 = 172.25, D3 = 46.25 ->
    # D = 30*[6*17.25 + 172.25 - 6*46.25]/120 = 30*(-1.75)/120 = -0.4375.
    sf = _sf_li(
        spark, tmp_path,
        [(v, 0, v / 100.0) for v in (1, 1, 2, 2, 3)],
    )
    q = entry_mod.queries()
    r = q["hoeffding_d_qty_discount"](spark, sf).collect()[0]
    assert r.n_total == 5
    assert r.d1_16x == pytest.approx(17.25)
    assert r.d2_16x == pytest.approx(172.25)
    assert r.d3_16x == pytest.approx(46.25)
    assert r.hoeffding_d == pytest.approx(-0.4375)


def test_hoeffding_small_n_null(spark, tmp_path):
    # n = 4 < 5: the denominator's (n-4) factor vanishes -> NULL stat
    sf = _sf_li(
        spark, tmp_path,
        [(i, 0, i / 100.0) for i in range(1, 5)],
    )
    q = entry_mod.queries()
    r = q["hoeffding_d_qty_discount"](spark, sf).collect()[0]
    assert r.n_total == 4
    assert r.hoeffding_d is None
    assert r.d1_16x is None


def test_blomqvist_perfect_quadrants(spark, tmp_path):
    # x = qty 1..4, y = 100*qty cents: lower medians (2, 200 cents);
    # (2,2) sits ON both medians -> excluded; the rest concordant.
    sf = _sf_li(
        spark, tmp_path,
        [(i, float(i), 0.0) for i in range(1, 5)],
    )
    q = entry_mod.queries()
    r = q["blomqvist_beta_qty_price"](spark, sf).collect()[0]
    assert (r.n_total, r.med_x, r.med_y) == (4, 2, 200)
    assert (r.n_conc, r.n_disc) == (3, 0)
    assert r.beta == pytest.approx(1.0)


def test_blomqvist_anti_dependence(spark, tmp_path):
    # y = 5 - x: (2, .) and (., med_y) rows excluded, rest discordant
    sf = _sf_li(
        spark, tmp_path,
        [(i, float(5 - i), 0.0) for i in range(1, 5)],
    )
    q = entry_mod.queries()
    r = q["blomqvist_beta_qty_price"](spark, sf).collect()[0]
    assert (r.med_x, r.med_y) == (2, 200)
    assert (r.n_conc, r.n_disc) == (0, 2)
    assert r.beta == pytest.approx(-1.0)


def test_gk_lambda_classic_2x2(spark, tmp_path):
    # n_xy = [[30,10],[10,50]]: sum row maxes 80, sum col maxes 80,
    # modal margins 60/60 -> all three lambdas = 20/40 = 0.5
    rows = (
        [("en", "web")] * 30 + [("en", "book")] * 10
        + [("fr", "web")] * 10 + [("fr", "book")] * 50
    )
    sf = _sf_docs(spark, tmp_path, rows)
    q = entry_mod.queries()
    r = q["gk_lambda_lang_source"](spark, sf).collect()[0]
    assert r.n_total == 100
    assert (r.sum_rowmax, r.sum_colmax) == (80, 80)
    assert (r.max_row_margin, r.max_col_margin) == (60, 60)
    assert r.lambda_y_x == pytest.approx(0.5)
    assert r.lambda_x_y == pytest.approx(0.5)
    assert r.lambda_sym == pytest.approx(0.5)


def test_gk_lambda_degenerate_single_column(spark, tmp_path):
    # every doc from one source: predicting source never errs ->
    # lambda_y_x denominator 0 -> NULL; lambda_x_y still defined
    rows = [("en", "web")] * 3 + [("fr", "web")] * 2
    sf = _sf_docs(spark, tmp_path, rows)
    q = entry_mod.queries()
    r = q["gk_lambda_lang_source"](spark, sf).collect()[0]
    assert r.n_total == 5
    assert r.lambda_y_x is None
    # knowing source = web does not improve the modal lang guess
    assert r.lambda_x_y == pytest.approx(0.0)
