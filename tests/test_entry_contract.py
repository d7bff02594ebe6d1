"""Emulates the driver's correctness gate: run each ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet tables,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("LMS_TEST_SF_DIR", "/root/testdata/sf0.01")

import __spark_entry__ as entry_mod  # noqa: E402

NAMES = list(entry_mod.oracle_sql().keys())


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "part", "nation", "region"):
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", NAMES)
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    dcols = [c.lower() for c in res.description and [d[0] for d in res.description]]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}"
    )
    a, b = _rows(scols, srows), _rows(dcols, drows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {f.name for f in df.schema.fields} == {"qid", "doc_id", "rank", "score"}
