"""Deterministic dense doc-id assignment at scale.

Reference semantics: Whoosh assigns dense per-segment docnums in add order
(src/whoosh/reading.py::IndexReader.__iter__; codec/base.py::Segment); the
parity rule (FIXTURES.md F1) fixes add order to (conv_id, turn_idx), so
``doc_id = row_number() over (order by conv_id, turn_idx) - 1``.

A single global window would funnel 10^12 rows through one partition, so we
use the classic two-pass pattern instead:

1. range-repartition + sort by the order columns (one shuffle; Spark's
   RangePartitioner keeps partitions globally ordered),
2. count rows per partition (tiny collect: one long per partition),
3. per-partition ``row_number`` + broadcast prefix offset.

Correctness does not depend on where the sampled range boundaries fall —
only on (a) partitions being globally ordered and (b) rows being sorted
within each partition, both guaranteed by repartitionByRange +
sortWithinPartitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(
    df: DataFrame,
    order_cols: list[str],
    doc_id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 0-based ``doc_id`` following ``order_cols`` order."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = ranged.persist()
    counts = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        ranged.withColumn(
            doc_id_col,
            (F.row_number().over(w) - 1 + offset_expr[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )
    return out
