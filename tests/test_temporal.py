"""As-of join: hand semantics, tolerance, scale shape (one shuffle)."""

import re

import pytest

from pyspark.sql import functions as F

from whoosh_spark.pipeline.temporal import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 5, "t5"), (1, 10, "t10"), (1, 3, "t3"), (2, 7, "x"), (3, 1, "y")],
        "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 4, "a"), (1, 10, "b"), (2, 9, "c"), (1, 1, "z")],
        "k long, t long, v string")
    return left, right


def test_asof_hand_case(frames):
    left, right = frames
    out = {(r.k, r.t): (r.t_r, r.v)
           for r in asof_join(left, right, key="k", ts_col="t").collect()}
    assert out[(1, 5)] == (4, "a")       # most recent at-or-before
    assert out[(1, 10)] == (10, "b")     # EQUAL timestamp matches (>= rule)
    assert out[(1, 3)] == (1, "z")
    assert out[(2, 7)] == (None, None)   # key exists, nothing at-or-before
    assert out[(3, 1)] == (None, None)   # key absent from right
    assert len(out) == 5                 # pure left semantics


def test_asof_tolerance(frames):
    left, right = frames
    out = {(r.k, r.t): r.v
           for r in asof_join(left, right, key="k", ts_col="t",
                              tolerance=0).collect()}
    assert out[(1, 5)] is None           # 5 - 4 > 0 discarded
    assert out[(1, 10)] == "b"           # exact-time match survives tolerance 0


def test_asof_collision_guard(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("v", "name"), key="k",
                  ts_col="t")


def test_asof_matches_duckdb_asof(spark):
    """Random-ish corpus vs DuckDB's native ASOF LEFT JOIN."""
    import duckdb

    left = spark.range(500).select(
        (F.col("id") % 23).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("t"),
        F.col("id").alias("lid"))
    right = spark.range(300).select(
        (F.col("id") % 23).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)).alias("t"),
        F.col("id").alias("rid"))
    # de-dupe (k, t) on the right so the match is deterministic
    right = right.groupBy("k", "t").agg(F.max("rid").alias("rid"))
    got = sorted(
        (r.lid, r.t_r, r.rid)
        for r in asof_join(left, right, key="k", ts_col="t").collect())
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("rr", right.toPandas())
    want = sorted(map(tuple, con.sql(
        "SELECT l.lid, rr.t AS t_r, rr.rid FROM l "
        "ASOF LEFT JOIN rr ON l.k = rr.k AND l.t >= rr.t").fetchall()))
    assert got == want


def test_asof_single_shuffle_no_python(spark):
    left = spark.range(100).select((F.col("id") % 5).alias("k"),
                                   F.col("id").alias("t"))
    right = spark.range(50).select((F.col("id") % 5).alias("k"),
                                   (F.col("id") * 2).alias("t"),
                                   F.lit("v").alias("v"))
    p = (asof_join(left, right, key="k", ts_col="t")
         ._jdf.queryExecution().executedPlan().toString())
    assert len(re.findall(r"\bExchange\b", p)) == 1   # union feeds ONE shuffle
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "PythonUDF" not in p


# ------------------------------- lookback (range) join ---------------------


def test_lookback_hand_case(spark):
    from whoosh_spark.pipeline.temporal import lookback_join

    left = spark.createDataFrame([(1, 100), (1, 205), (2, 100)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 100, "eq"), (1, 60, "in"), (1, 59, "out"), (1, 101, "future"),
         (2, 40, "edge")],
        "k long, t long, v string")
    out = sorted((r.k, r.t, r.t_r, r.v)
                 for r in lookback_join(left, right, "k", "t", 40).collect())
    # (1,100): window [60,100] -> eq + in; 59 out, 101 future
    # (1,205): nothing in [165,205]; (2,100): [60,100] excludes 40
    assert out == [(1, 100, 60, "in"), (1, 100, 100, "eq")]


def test_lookback_matches_duckdb_between(spark):
    import duckdb

    from whoosh_spark.pipeline.temporal import lookback_join

    left = spark.range(400).select(
        (F.col("id") % 17).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5000)).alias("t"),
        F.col("id").alias("lid"))
    right = spark.range(300).select(
        (F.col("id") % 17).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(5000)).alias("t"),
        F.col("id").alias("rid"))
    got = sorted((r.lid, r.t_r, r.rid)
                 for r in lookback_join(left, right, "k", "t", 137).collect())
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("rr", right.toPandas())
    want = sorted(map(tuple, con.sql(
        "SELECT l.lid, rr.t, rr.rid FROM l JOIN rr ON l.k = rr.k "
        "AND rr.t BETWEEN l.t - 137 AND l.t").fetchall()))
    assert got == want and len(got) > 50


def test_lookback_no_nested_loop(spark):
    from whoosh_spark.pipeline.temporal import lookback_join

    left = spark.range(100).select((F.col("id") % 5).alias("k"),
                                   F.col("id").alias("t"))
    right = spark.range(80).select((F.col("id") % 5).alias("k"),
                                   (F.col("id") * 3).alias("t"),
                                   F.lit("v").alias("v"))
    p = (lookback_join(left, right, "k", "t", 10)
         ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in p and "CartesianProduct" not in p


def test_lookback_validation(spark):
    from whoosh_spark.pipeline.temporal import lookback_join

    left = spark.createDataFrame([(1, 1)], "k long, t long")
    with pytest.raises(ValueError, match="positive"):
        lookback_join(left, left, "k", "t", 0)
