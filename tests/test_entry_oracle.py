"""Differential oracle: every queries() entry with an oracle_sql() runs on
Spark and DuckDB at sf0.001 and must agree (row count + order-insensitive
values). Mirrors exactly what the driver does at sf0.01."""

import math
import os

import duckdb
import pytest


def pd_isna(v) -> bool:
    import pandas as pd

    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False

import __spark_entry__ as E

SF_DIR = os.environ.get("SPARK_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    # No int->float coercion: the driver's canonicalizer compares dtypes as
    # fetched, so a DuckDB HUGEINT (float64 in pandas) vs Spark BIGINT is a
    # real mismatch — oracle_sql() must CAST instead (see __spark_entry__.py).
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rowset(rows, cols):
    return sorted(
        tuple(_norm(v) for _, v in sorted(zip(cols, r), key=lambda x: x[0]))
        for r in rows
    )


ORACLES = E.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    q = E.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    # Fetch through pandas like the driver does: DuckDB HUGEINT becomes
    # float64 here, so un-cast integer sums fail locally too.
    pdf = con.execute(ORACLES[name]).df()
    dcols = list(pdf.columns)
    drows = [
        tuple(None if pd_isna(v) else v for v in r)
        for r in pdf.itertuples(index=False, name=None)
    ]
    con.close()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    a, b = _rowset(srows, scols), _rowset(drows, dcols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: first diffs {mismatches}"


def test_rows_only_queries_execute(spark):
    """Queries without an oracle must still run and return a stable schema."""
    for name, q in E.queries().items():
        if name in ORACLES or name == "mini_er":
            continue
        df = q(spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_all_queries_return_atomic_columns(spark):
    """The driver's order-insensitive canonicalizer (pandas factorize/hash)
    crashes on array/map/struct cells — every queries() entry must return
    only atomic column types (round 1 regression: doc_fingerprint)."""
    from pyspark.sql import types as T

    for name, q in E.queries().items():
        if name == "mini_er":
            continue
        df = q(spark, SF_DIR)
        for f in df.schema.fields:
            assert isinstance(
                f.dataType,
                (T.AtomicType, T.NullType),
            ), f"{name}.{f.name}: non-atomic type {f.dataType}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"record_id", "cluster_id"}


def test_registry_invariants():
    """The driver checks exactly the first 50 queries() entries: every one
    of those must be oracle-backed, every oracle key must name a query, and
    the rotation policy (documented in the queries() comment) only ever
    moves oracle-backed entries across the boundary."""
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    first50 = list(q)[:50]
    assert all(k in o for k in first50), [k for k in first50 if k not in o]
    assert set(o) <= set(q), sorted(set(o) - set(q))
    assert len(q) >= 77 and len(o) >= 59
