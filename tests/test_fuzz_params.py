"""Parameterized differential fuzzing (r8 verdict task 6, parameter axis).

``test_fuzz_differential`` fuzzes the DATA under the registered
query/oracle pairs, whose parameters are baked in. This file fuzzes the
PARAMETERS: for operators whose DuckDB twin can be generated from the
same parameter values, draw several parameter sets, build the SQL twin
programmatically, and compare on the same fuzz tables — so the md5
minhash family, the LSH band geometry, and the KS quantization grid are
verified across their parameter ranges, not just at the registered
defaults.

Families:
- minhash_signatures(num_hashes, shingle_k)
- neardup_against_store(num_hashes, rows_per_band) — store = every 3rd doc
- ks_two_sample(scale)
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import ks_two_sample
from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import (
    doc_band_table,
    minhash_signatures,
    neardup_against_store,
)
from test_fuzz_differential import SEEDS, _gen_tables, _write_sf_dir
from test_oracle_parity import TABLES, _normalise

# two data seeds x parameter draws below
DATA_MODES = ["101", "ties"]


@pytest.fixture(scope="module")
def param_dirs(tmp_path_factory):
    dirs = {}
    for mode in DATA_MODES:
        assert mode in SEEDS
        d = tmp_path_factory.mktemp(f"pfuzz_{mode}")
        _write_sf_dir(str(d), _gen_tables(mode))
        dirs[mode] = str(d)
    return dirs


@pytest.fixture(scope="module")
def param_cons(param_dirs):
    cons = {}
    for mode, d in param_dirs.items():
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
        cons[mode] = con
    yield cons
    for con in cons.values():
        con.close()


def _shingles_sql(k: int, src: str = "documents") -> str:
    """DuckDB twin of dedup._doc_shingles for arbitrary k."""
    if k <= 1:
        return f"""
  SELECT doc_id, unnest(list_distinct(
           list_filter(string_split(text, ' '), x -> x <> ''))) AS token
  FROM {src}
"""
    joined = " || ' ' || ".join(f"tl[i+{j}]" if j else "tl[i]" for j in range(k))
    return f"""
  SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(tl) >= {k}
                THEN list_transform(generate_series(1, len(tl) - {k - 1}),
                                    i -> {joined})
                ELSE [array_to_string(tl, ' ')] END)) AS token
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
        FROM {src})
"""


def _minhash_aggs(h: int) -> str:
    return ", ".join(f"min(md5('{i}:' || token)) AS mh{i}" for i in range(h))


def _bands_sql(h: int, rpb: int, src: str) -> str:
    bands = h // rpb
    selects = []
    for b in range(bands):
        key = " || '|' || ".join(
            f"mh{i}" for i in range(b * rpb, (b + 1) * rpb)
        )
        selects.append(
            f"SELECT doc_id, CAST({b} AS INT) AS band_idx, {key} AS band_key "
            f"FROM {src}"
        )
    return " UNION ALL ".join(selects)


def _compare(sdf, con, sql, label):
    s_cols, s_vals = _normalise(sdf.toPandas())
    d_cols, d_vals = _normalise(con.sql(sql).df())
    assert s_cols == d_cols, f"{label}: columns {s_cols} vs {d_cols}"
    assert len(s_vals) == len(d_vals), (
        f"{label}: rows {len(s_vals)} vs {len(d_vals)}"
    )
    mism = [(a, b) for a, b in zip(s_vals, d_vals) if a != b]
    assert not mism, f"{label}: {len(mism)} mismatches; first {mism[:3]}"


@pytest.mark.parametrize("mode", DATA_MODES)
@pytest.mark.parametrize("h,k", [(2, 1), (4, 2), (6, 4)])
def test_minhash_params(h, k, mode, spark, param_dirs, param_cons):
    docs = spark.read.parquet(f"{param_dirs[mode]}/documents.parquet")
    sdf = minhash_signatures(docs, "doc_id", "text", num_hashes=h, shingle_k=k)
    sql = f"""
WITH toks AS ({_shingles_sql(k)})
SELECT doc_id, {_minhash_aggs(h)} FROM toks GROUP BY doc_id
"""
    _compare(sdf, param_cons[mode], sql, f"minhash h={h} k={k} {mode}")


@pytest.mark.parametrize("mode", DATA_MODES)
@pytest.mark.parametrize("h,rpb", [(4, 2), (6, 3), (8, 4)])
def test_neardup_gate_params(h, rpb, mode, spark, param_dirs, param_cons):
    docs = spark.read.parquet(f"{param_dirs[mode]}/documents.parquet")
    store_src = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    store = doc_band_table(
        store_src, "doc_id", "text", num_hashes=h, rows_per_band=rpb
    )
    sdf = neardup_against_store(
        docs, store, num_hashes=h, rows_per_band=rpb
    )
    sql = f"""
WITH toks AS ({_shingles_sql(3)}),
sigs AS (SELECT doc_id, {_minhash_aggs(h)} FROM toks GROUP BY doc_id),
bands AS ({_bands_sql(h, rpb, "sigs")}),
store_src AS (
  SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0),
store_toks AS ({_shingles_sql(3, "store_src")}),
store_sigs AS (SELECT doc_id, {_minhash_aggs(h)} FROM store_toks
               GROUP BY doc_id),
store_bands AS ({_bands_sql(h, rpb, "store_sigs")}),
hit AS (
  SELECT DISTINCT b.doc_id FROM bands b
  JOIN store_bands s USING (band_idx, band_key)),
beaten AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY band_idx, band_key) AS m
    FROM bands)
  WHERE doc_id > m)
SELECT doc_id, band_idx, band_key FROM bands
WHERE doc_id NOT IN (SELECT doc_id FROM hit)
  AND doc_id NOT IN (SELECT doc_id FROM beaten)
"""
    _compare(sdf, param_cons[mode], sql, f"neardup h={h} rpb={rpb} {mode}")


@pytest.mark.parametrize("mode", DATA_MODES)
@pytest.mark.parametrize("scale", [1, 10, 1000])
def test_ks_scale_params(scale, mode, spark, param_dirs, param_cons):
    ev = spark.read.parquet(f"{param_dirs[mode]}/events.parquet")
    sdf = ks_two_sample(
        ev, F.col("event_type") == "purchase", "value", scale=scale
    )
    sql = f"""
WITH q AS (
  SELECT (event_type = 'purchase') AS r,
         CAST(ROUND(CAST(value AS DOUBLE) * {scale}, 0) AS BIGINT) AS qv
  FROM events),
counts AS (
  SELECT qv,
         SUM(CASE WHEN NOT r THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN r THEN 1 ELSE 0 END) AS c2
  FROM q WHERE qv IS NOT NULL GROUP BY qv),
cum AS (
  SELECT qv, SUM(c1) OVER (ORDER BY qv) AS f1,
         SUM(c2) OVER (ORDER BY qv) AS f2
  FROM counts),
tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
        FROM counts),
scored AS (
  SELECT qv, abs(f1 * n2 - f2 * n1) AS d FROM cum CROSS JOIN tot),
best AS (SELECT MAX(struct_pack(d := d, nq := -qv)) AS s FROM scored)
SELECT tot.n1 AS n_left, tot.n2 AS n_right,
       CASE WHEN tot.n1 > 0 AND tot.n2 > 0
            THEN CAST(best.s.d AS DOUBLE) / CAST(tot.n1 * tot.n2 AS DOUBLE)
            END AS ks_d,
       CASE WHEN tot.n1 > 0 AND tot.n2 > 0
            THEN CAST(-best.s.nq AS DOUBLE) / CAST({scale} AS DOUBLE)
            END AS ks_at_value
FROM best CROSS JOIN tot
"""
    _compare(sdf, param_cons[mode], sql, f"ks scale={scale} {mode}")
