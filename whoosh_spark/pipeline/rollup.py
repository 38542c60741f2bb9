"""Hypertable-style hierarchical time rollups (the brief's named custom
operator: TimescaleDB continuous aggregates).

``hypertable_rollup`` computes a time-bucketed aggregate at several
nested granularities, scanning the RAW table exactly once: the finest
grain is a normal tumbling-window groupBy, and every coarser grain
re-aggregates the previous level's partial aggregates (sum of counts,
min of mins, ...). At 100 TB that is the only viable shape — the hourly
table is orders of magnitude smaller than raw, so the daily/weekly
passes are nearly free, and each level is exactly what a continuous
aggregate would materialize incrementally.

Only decomposable aggregates participate (count, sum over integers,
min, max) so re-aggregation is EXACT — the driver entry proves it by
oracle-checking every level against a DIRECT group-by of the raw table
in DuckDB: coarse-from-fine ≡ coarse-from-raw, value for value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hypertable_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    grains: tuple = ("1 hour", "1 day"),
    by: str | None = None,
    value: str | None = None,
) -> DataFrame:
    """Multi-grain tumbling rollup: (grain, win_start, win_end[, <by>],
    n[, sum_floor_value, min_value, max_value]).

    ``grains`` must be ordered fine → coarse with each coarser grain an
    exact multiple of the finer one (windows then nest, so partial
    re-aggregation is lossless). ``value`` (optional numeric column)
    contributes ``sum_floor_value`` (sum of floor(value) as long —
    integer arithmetic, so the sum is exact and engine-order-independent),
    ``min_value`` and ``max_value``; counts are always present.

    Spark's tumbling windows are epoch-aligned, so every level's buckets
    coincide with DuckDB's ``time_bucket`` for durations dividing 24 h —
    the driver entry pins all levels against direct raw-table group-bys.
    """
    if len(grains) < 1:
        raise ValueError("grains must name at least one granularity")
    dims = [by] if by else []
    aggs = [F.count("*").alias("n")]
    reaggs = [F.sum("n").alias("n")]
    metric_cols: list[str] = []
    if value is not None:
        aggs += [
            F.sum(F.floor(F.col(value)).cast("long")).alias("sum_floor_value"),
            F.min(value).alias("min_value"),
            F.max(value).alias("max_value"),
        ]
        reaggs += [
            F.sum("sum_floor_value").alias("sum_floor_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        ]
        metric_cols = ["sum_floor_value", "min_value", "max_value"]

    def _flatten(grouped: DataFrame) -> DataFrame:
        cols = [
            F.col("_w.start").alias("win_start"),
            F.col("_w.end").alias("win_end"),
            *[F.col(d) for d in dims],
            F.col("n"),
            *[F.col(c) for c in metric_cols],
        ]
        return grouped.select(*cols)

    fine = _flatten(
        df.groupBy(F.window(ts_col, grains[0]).alias("_w"), *dims).agg(*aggs)
    )
    levels = [fine.withColumn("grain", F.lit(grains[0]))]
    prev = fine
    for g in grains[1:]:
        prev = _flatten(
            prev.groupBy(F.window("win_start", g).alias("_w"), *dims)
            .agg(*reaggs)
        )
        levels.append(prev.withColumn("grain", F.lit(g)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
