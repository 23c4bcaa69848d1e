"""Differential check of every queries() entry against its DuckDB oracle —
a local mirror of the driver's CORRECTNESS gate (row count + column names +
order-insensitive values) at sf0.001 so mismatches surface before rounds.
"""

import datetime as _dt
import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon_value(v):
    """Dtype-sensitive canonical string, shared by both engines' pandas
    frames. Integral float64 renders as '99111.0' while int64 renders as
    '99111' — deliberately DIFFERENT, because the driver's pandas-based
    hasher distinguishes them (r3: DuckDB SUM(BIGINT) -> HUGEINT ->
    float64 failed hash_match against Spark int64 despite equal values).
    """
    if v is None or v is pd.NaT:
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        fv = float(v)
        return "nan" if math.isnan(fv) else repr(fv)
    if isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
        return pd.Timestamp(v).isoformat()
    return str(v)


def _normalise(pdf):
    """Driver-equivalent canonical form of a pandas frame: lower-cased
    column names sorted by name, rows sorted by canonical value."""
    cols = [str(c).lower() for c in pdf.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = sorted(
        tuple(_canon_value(row[i]) for i in order)
        for row in pdf.itertuples(index=False, name=None)
    )
    return [cols[i] for i in order], normed


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, ddb):
    sdf = QUERIES[name](spark, SF_DIR)
    # Driver-proofing: the harness canonicalizes results with a pandas
    # sort, which raises "unhashable type" on array/map/struct cells
    # (round-1 collect_sorted_events went red exactly this way). Every
    # oracle-backed query must emit only atomic columns.
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not complex_cols, (
        f"{name}: non-atomic output columns {complex_cols} would crash the "
        "driver canonicalizer; emit them as joined strings instead"
    )
    # Both sides go through pandas, exactly like the driver: DuckDB via
    # rel.df() (HUGEINT/DECIMAL -> float64, the r3 hazard fetchall() hid)
    # and Spark via toPandas().
    s_cols, s_vals = _normalise(sdf.toPandas())
    d_cols, d_vals = _normalise(ddb.sql(ORACLES[name]).df())

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_vals) == len(d_vals), (
        f"{name}: row count {len(s_vals)} vs {len(d_vals)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_vals, d_vals) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
