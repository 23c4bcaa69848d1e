"""Wave 85: code-vs-prose structural screen and UTF-8 byte/char audit —
hand-computed goldens over mixed prose / code / multibyte docs."""

from __future__ import annotations

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.textstats import (
    byte_char_audit,
    code_prose_stats,
)

PROSE = "the quick brown fox jumps over the lazy dog again and again"
CODE = "def f(x): return {x: [1]} # comment\nimport os\nclass A: pass"
MIXED = "see the function notes below"


def _docs(spark):
    return spark.createDataFrame(
        [(1, PROSE, "en"), (2, CODE, "en"), (3, MIXED, "en"),
         (4, "été café déjà", "fr")],
        "doc_id long, text string, lang string",
    )


def test_code_doc_flagged_prose_not(spark):
    rows = {r.doc_id: r for r in code_prose_stats(_docs(spark)).collect()}
    assert rows[2].is_codelike  # def/return/import/class + {}[]();=#
    assert not rows[1].is_codelike
    assert rows[1].n_code_chars == 0
    assert rows[1].n_keyword_hits == 0


def test_code_counts_exact(spark):
    rows = {r.doc_id: r for r in code_prose_stats(_docs(spark)).collect()}
    r = rows[2]
    # {}[]();=<>#` characters in CODE: ( ) : -> no ':' not counted;
    # count by hand: f(x) -> ( ) ; { } [ ] ( ) is absent... enumerate:
    expected_code_chars = sum(CODE.count(c) for c in "{}[]();=<>#`")
    assert r.n_code_chars == expected_code_chars
    assert r.n_keyword_hits == 4  # def, return, import, class
    assert r.n_chars == len(CODE)
    # 'function' inside MIXED is a whole word -> 1 hit, but ratio tiny
    assert rows[3].n_keyword_hits == 1
    assert not rows[3].is_codelike


def test_byte_char_audit_multibyte(spark):
    out = {
        r.grp: r
        for r in byte_char_audit(_docs(spark), group_col="lang").collect()
    }
    fr = out["fr"]
    text = "été café déjà"
    assert fr.total_chars == len(text)
    assert fr.total_bytes == len(text.encode("utf-8"))
    assert fr.multibyte_extra == fr.total_bytes - fr.total_chars
    assert fr.bytes_per_char == pytest.approx(fr.total_bytes / fr.total_chars)
    en = out["en"]
    assert en.multibyte_extra == 0
    assert en.bytes_per_char == 1.0
    assert en.n_docs == 3


def test_byte_char_audit_corpus_wide(spark):
    row = byte_char_audit(_docs(spark), group_col=None).collect()[0]
    assert row.n_docs == 4
    assert "grp" not in row.asDict()
