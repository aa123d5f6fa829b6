"""Differential oracle: every queries() entry with an oracle_sql() runs on
Spark and DuckDB at sf0.001 and must agree (row count + order-insensitive
values). Mirrors exactly what the driver does at sf0.01."""

import math
import os

import duckdb
import pytest

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
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
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
    res = con.execute(ORACLES[name])
    dcols = [c[0] for c in res.description]
    drows = res.fetchall()
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


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"record_id", "cluster_id"}
