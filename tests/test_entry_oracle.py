"""Driver-contract harness: run every queries() entry against its DuckDB
oracle at sf0.001 and compare row count, column names, and order-insensitive
values — a local replica of the driver's CORRECTNESS gate."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    """Type-tagged normalization: the driver value-hashes results, so an
    int64 on one side vs a float64 on the other must FAIL here too (Python's
    ``2006 == 2006.0`` let the round-1 HUGEINT→float64 mismatch slip by)."""
    import decimal

    import numpy as np

    if isinstance(v, np.integer):
        v = int(v)
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, np.bool_):
        v = bool(v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 4))
    if isinstance(v, int):
        return ("i", v)
    return ("o", v)


def _rowset(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "content" in df.columns


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    # Fetch through pandas (like the driver) so DuckDB dtype quirks — e.g.
    # integer SUM → HUGEINT → float64 — surface here instead of in CI.
    ddf = ddb.execute(ORACLES[name]).df()
    duck_cols = list(ddf.columns)
    duck_rows = [tuple(r) for r in ddf.itertuples(index=False)]

    assert sorted(c.lower() for c in spark_cols) == sorted(c.lower() for c in duck_cols), name
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    got = _rowset([tuple(r) for r in spark_rows], spark_cols)
    want = _rowset(duck_rows, duck_cols)
    if got != want:
        for g, w in zip(got, want):
            if g != w:
                raise AssertionError(f"{name}: first diff\n got={g}\nwant={w}")
        raise AssertionError(f"{name}: sets differ in tails")


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
