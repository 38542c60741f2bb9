"""Temporal joins over transcript/event streams: the as-of join Spark
has no native operator for (the brief's named custom-operator example).

``asof_join(left, right)`` attaches to every left row the most recent
right row with the same key at-or-before the left row's time — "which
event was in effect when this turn happened". The naive formulations
both die at scale: an inequality join plans as broadcast-nested-loop
(quadratic), and a per-key collect is driver-bound. The Spark-first
shape used here is the tagged-union window trick:

    union(left tagged 1, right tagged 0)
      -> Window.partitionBy(key).orderBy(ts, tag)
      -> last(right_payload, ignorenulls=True) over rows-unbounded-preceding
      -> keep tag==1 rows

ONE shuffle on the key, sort by time within partitions, O(n) state (the
single carried struct) — the same cost as any windowed op on the corpus,
no range explosion, skew bounded by the hottest key's row count exactly
like every other conv-keyed window in this engine. Equal timestamps:
the right side sorts BEFORE the left side (tag 0 < 1), so a right row
at exactly the left row's time IS matched — the ``ON l.t >= r.t``
convention of DuckDB's native ASOF JOIN, which the driver entry uses as
the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lookback_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    lookback: int,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Range join, lookback form: every (left, right) pair with the same
    ``key`` and ``left.ts - lookback <= right.ts <= left.ts`` (both ends
    inclusive — SQL ``BETWEEN``). ``ts_col`` must be NUMERIC (epoch
    seconds/micros as longs); ``lookback`` is in the same units.

    A plain inequality join plans as broadcast-nested-loop (quadratic
    per key). The scalable shape is BUCKETIZED: with bucket width =
    ``lookback``, a right row at time r can only pair with left rows in
    bucket floor(r/W) or floor(r/W)+1, so the right side replicates into
    exactly those two slots and the join becomes a pure equi-join on
    (key, bucket) plus a residual range filter. Cost: one 2x-replicated
    shuffle join, output-bound — the standard interval-join strategy of
    streaming engines (Flink's interval join partitions the same way).

    Output: all left columns, right's ``ts_col`` as ``<ts_col>_r``, then
    ``right_cols`` (default: all non-key/ts). INNER semantics — left
    rows with no right row in range drop (aggregate-then-left-join
    upstream if you need left-complete counts).
    """
    if lookback <= 0:
        raise ValueError(f"lookback must be positive, got {lookback}")
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (key, ts_col)
    ]
    clash = set(rcols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    l2 = left.withColumn("_b", F.floor(F.col(ts_col) / lookback).cast("long"))
    r2 = (
        right.select(
            F.col(key).alias("_rk"), F.col(ts_col).alias("_rt"),
            *[F.col(c) for c in rcols],
        )
        .withColumn(
            "_slot",
            F.explode(
                F.array(
                    F.floor(F.col("_rt") / lookback).cast("long"),
                    F.floor(F.col("_rt") / lookback).cast("long") + 1,
                )
            ),
        )
    )
    joined = l2.join(
        r2,
        (l2["_b"] == r2["_slot"]) & (l2[key] == r2["_rk"]),
        "inner",
    ).where(
        (F.col("_rt") >= F.col(ts_col) - lookback)
        & (F.col("_rt") <= F.col(ts_col))
    )
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("_rt").alias(f"{ts_col}_r"))
    sel.extend(F.col(c) for c in rcols)
    return joined.select(*sel)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` row of
    the same ``key`` with ``right.ts <= left.ts`` (ties match). Output =
    all left columns, then ``<ts_col>_r`` (matched right time) and
    ``right_cols`` (default: all non-key/ts right columns) — NULLs when
    the key has no right row at or before the left time.

    ``tolerance`` (same units as a NUMERIC ``ts_col``): discard matches
    older than ``left.ts - tolerance`` (pandas ``merge_asof`` semantics).
    Determinism: if ``right`` can hold several rows with identical
    (key, ts), pre-aggregate it — which of the tied rows wins would
    otherwise depend on shuffle arrival order.

    Column names in ``right_cols`` must not collide with left columns
    (rename upstream); the implementation carries both sides as structs
    so only the OUTPUT projection can collide, and that fails analysis
    loudly rather than silently aliasing.
    """
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (key, ts_col)
    ]
    clash = set(rcols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    rpay = F.struct(F.col(ts_col).alias("_rts"), *[F.col(c) for c in rcols])
    lpay = F.struct(*[F.col(c) for c in left.columns])
    # null-of-struct-type literals for the other side of the union
    rtype = right.select(rpay.alias("x")).schema["x"].dataType
    ltype = left.select(lpay.alias("x")).schema["x"].dataType
    lside = left.select(
        F.col(key).alias("_k"), F.col(ts_col).alias("_t"),
        F.lit(1).alias("_side"), lpay.alias("_l"),
        F.lit(None).cast(rtype).alias("_r"),
    )
    rside = right.select(
        F.col(key).alias("_k"), F.col(ts_col).alias("_t"),
        F.lit(0).alias("_side"), F.lit(None).cast(ltype).alias("_l"),
        rpay.alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        lside.unionByName(rside)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(F.col("_t") - F.col("_m._rts") <= tolerance, F.col("_m")),
        )
    sel = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    sel.append(F.col("_m._rts").alias(f"{ts_col}_r"))
    sel.extend(F.col(f"_m.{c}").alias(c) for c in rcols)
    return out.select(*sel)
