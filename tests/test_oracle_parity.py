"""Differential check of every queries() entry against its DuckDB oracle —
a local mirror of the driver's CORRECTNESS gate (row count + column names +
order-insensitive values) at sf0.001 so mismatches surface before rounds.
"""

import math
import os

import duckdb
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


def _normalise(rows, columns):
    """Column-name-sorted, row-sorted, float-exact representation."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            out.append((v is None, str(type(v)), str(v)))
        return out

    normed = []
    for row in sorted(rows, key=key):
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(repr(v))
            else:
                vals.append(str(v))
        normed.append(tuple(vals))
    return [columns[i] for i in order], normed


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
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = [c.lower() for c in sdf.columns]

    rel = ddb.sql(ORACLES[name])
    duck_rows = rel.fetchall()
    duck_cols = [c.lower() for c in rel.columns]

    s_cols, s_vals = _normalise(spark_rows, spark_cols)
    d_cols, d_vals = _normalise(duck_rows, duck_cols)

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
