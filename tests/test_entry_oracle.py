"""Mimics the driver's correctness gate: run every queries() entry via Spark
and its oracle_sql() via DuckDB on the same parquet tables, compare row
count, column names, and order-insensitive values (floats to 4dp)."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("WHOOSH_SPARK_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(dicts: list[dict], order: list[str]) -> list[tuple]:
    out = []
    for d in dicts:
        vals = []
        for c in order:
            v = d[c]
            if isinstance(v, float):
                v = round(v, 4) + 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    sdicts = [r.asDict() for r in sdf.collect()]
    if sql is None:
        assert isinstance(sdicts, list)  # rows-only check
        return
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    ddicts = [dict(zip(dcols, r)) for r in res.fetchall()]
    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(sdicts) == len(ddicts), f"{name}: rows {len(sdicts)} vs {len(ddicts)}"
    order = sorted(scols)
    a, b = _canon(sdicts, order), _canon(ddicts, order)
    for i, (ra, rb) in enumerate(zip(a, b)):
        for x, y in zip(ra, rb):
            if isinstance(x, float) or isinstance(y, float):
                assert float(x) == pytest.approx(float(y), abs=2e-4), f"{name} row {i}: {ra} vs {rb}"
            else:
                assert x == y, f"{name} row {i}: {ra} vs {rb}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
