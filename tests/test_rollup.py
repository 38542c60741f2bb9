"""Hypertable rollup: nesting exactness (coarse-from-fine == from-raw)."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from whoosh_spark.pipeline.rollup import hypertable_rollup


def test_rollup_hand_case(spark):
    base = dt.datetime(2024, 3, 1)
    rows = [
        ("a", base + dt.timedelta(minutes=10), 1.2),
        ("a", base + dt.timedelta(minutes=70), 2.9),
        ("b", base + dt.timedelta(hours=7), -0.5),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = hypertable_rollup(df, grains=("1 hour", "6 hours"),
                            by="event_type", value="value")
    rowsd = {(r.grain, r.win_start, r.event_type):
             (r.n, r.sum_floor_value, r.min_value, r.max_value)
             for r in out.collect()}
    h = dt.timedelta(hours=1)
    assert rowsd[("1 hour", base, "a")] == (1, 1, 1.2, 1.2)
    assert rowsd[("1 hour", base + h, "a")] == (1, 2, 2.9, 2.9)
    # 6h bucket re-aggregated from the two hourly partials
    assert rowsd[("6 hours", base, "a")] == (2, 3, 1.2, 2.9)
    assert rowsd[("6 hours", base + 6 * h, "b")] == (1, -1, -0.5, -0.5)
    assert len(rowsd) == 5


def test_rollup_coarse_equals_direct(spark):
    """Re-aggregation is exact: every coarse bucket equals a DIRECT
    group-by of the raw frame at that grain."""
    df = spark.range(5000).select(
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        (F.lit(dt.datetime(2024, 3, 1))
         + F.make_interval(mins=F.pmod(F.xxhash64("id"), F.lit(60 * 24 * 20)))
         ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(1000)) / 10.0 - 20.0).alias("value"),
    )
    out = hypertable_rollup(df, grains=("6 hours", "1 day"),
                            by="event_type", value="value")
    coarse = sorted(map(tuple, out.where("grain = '1 day'")
                        .drop("grain").collect()))
    direct = sorted(map(tuple, hypertable_rollup(
        df, grains=("1 day",), by="event_type", value="value")
        .drop("grain").collect()))
    assert coarse == direct and len(coarse) > 50


def test_rollup_no_by_no_value(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 3, 1, 2),), (dt.datetime(2024, 3, 1, 3),)],
        "ts timestamp")
    out = hypertable_rollup(df, grains=("1 hour", "1 day")).collect()
    assert {(r.grain, r.n) for r in out} == {("1 hour", 1), ("1 day", 2)}


def test_rollup_validation(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 3, 1),)], "ts timestamp")
    with pytest.raises(ValueError):
        hypertable_rollup(df, grains=())
