"""Iceberg segment-store adapter — the executable swap path for the
Parquet+manifest stand-in (BENCH.md §"Iceberg stand-in").

The north rule names Iceberg tables as the production substrate. This
sandbox ships no Iceberg runtime JARs, so the default store
(indexing/segments.py) is Parquet plus an Iceberg-snapshot-shaped JSON
manifest layer. This module makes the documented 1:1 mapping executable
rather than narrative:

- ``blocks/segment_id=N/`` Parquet + ``_manifest/seg_N.json``
  → ``<prefix>_blocks`` Iceberg table partitioned by ``segment_id``
  (data files + manifest entries with per-file stats) and a
  ``<prefix>_manifest`` row per segment.
- ``_meta.json`` atomic swap → ``<prefix>_meta`` ``createOrReplace``:
  the catalog's metadata-pointer swap gives the same
  readers-see-only-committed-snapshots guarantee.
- ``_deletes`` id sets applied at read → ``DELETE FROM`` on the blocks
  table (Iceberg position deletes, merge-on-read), compacted by the
  table's own rewrite, mirroring ``merge_segments``'s copy-on-write.

Everything is gated at runtime on an Iceberg catalog actually being
configured on the session (``spark.sql.catalog.<name>`` pointing at
``org.apache.iceberg.spark.SparkCatalog`` and the class loadable); with
no catalog every entry point raises :class:`IcebergUnavailable` and the
test suite skips. No operator logic changes either way — nothing outside
the store inspects the physical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IcebergUnavailable(RuntimeError):
    """No Iceberg catalog is configured on this SparkSession."""


def find_iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of the first configured Iceberg catalog, or None.

    A catalog counts only if its implementation class mentions Iceberg
    AND the class is actually loadable in the driver JVM (conf can name a
    class whose JAR is absent)."""
    prefix = "spark.sql.catalog."
    for key, value in spark.sparkContext.getConf().getAll():
        if not key.startswith(prefix) or key.count(".") != 3:
            continue
        if "iceberg" not in value.lower():
            continue
        try:
            spark._jvm.java.lang.Class.forName(value)  # noqa: SLF001
        except Exception:
            continue
        return key[len(prefix):]
    return None


def require_iceberg(spark: SparkSession) -> str:
    cat = find_iceberg_catalog(spark)
    if cat is None:
        raise IcebergUnavailable(
            "no loadable Iceberg catalog on this session; configure "
            "spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog "
            "(plus the iceberg-spark-runtime JAR) or use the default "
            "Parquet segment store"
        )
    return cat


class IcebergSegmentStore:
    """Segment block store over Iceberg tables.

    ``prefix`` is a fully-qualified table prefix inside the Iceberg
    catalog, e.g. ``"ice.db.turns_ix"`` — tables ``<prefix>_blocks``,
    ``<prefix>_manifest`` and ``<prefix>_meta`` are created on first
    write."""

    def __init__(self, spark: SparkSession, prefix: str):
        self.spark = spark
        self.catalog = require_iceberg(spark)
        if not prefix.split(".", 1)[0] == self.catalog:
            raise ValueError(
                f"table prefix {prefix!r} must live in the Iceberg catalog "
                f"{self.catalog!r}")
        self.blocks_table = f"{prefix}_blocks"
        self.manifest_table = f"{prefix}_manifest"
        self.meta_table = f"{prefix}_meta"

    # ------------------------------------------------------------- write

    def write_segment(self, blocks: DataFrame, segment_id: int,
                      manifest: dict) -> None:
        """Replace one segment's blocks + manifest row. Dynamic partition
        overwrite on the partitioned blocks table = the per-segment
        ``overwrite`` of the Parquet store; each call is one Iceberg
        snapshot commit."""
        df = blocks.withColumn("segment_id", F.lit(int(segment_id)))
        if not self.spark.catalog.tableExists(self.blocks_table):
            (df.writeTo(self.blocks_table)
               .partitionedBy(F.col("segment_id"))
               .create())
        else:
            df.writeTo(self.blocks_table).overwritePartitions()
        mrow = self.spark.createDataFrame(
            [(int(segment_id), str(manifest))], "segment_id long, manifest string")
        if not self.spark.catalog.tableExists(self.manifest_table):
            mrow.writeTo(self.manifest_table).create()
        else:
            self.spark.sql(
                f"DELETE FROM {self.manifest_table} WHERE segment_id = {int(segment_id)}")
            mrow.writeTo(self.manifest_table).append()

    def commit(self, doc_count: int, active_segments: list[int]) -> None:
        """The ``_meta.json`` swap: a one-row meta table replaced
        atomically by the catalog's metadata-pointer swap."""
        meta = self.spark.createDataFrame(
            [(int(doc_count), [int(s) for s in active_segments])],
            "doc_count long, active_segments array<long>")
        meta.writeTo(self.meta_table).createOrReplace()

    def delete_docs(self, doc_ids: DataFrame) -> None:
        """Position-delete analogue: drop postings rows whose block range
        could contain the ids, narrowed exactly inside the block on read
        is unnecessary here — Iceberg DELETE rewrites at row granularity
        (merge-on-read position deletes)."""
        doc_ids.select(F.col(doc_ids.columns[0]).alias("doc_id")) \
            .createOrReplaceTempView("_ws_delete_ids")
        self.spark.sql(
            f"DELETE FROM {self.blocks_table} WHERE max_doc >= "
            f"(SELECT MIN(doc_id) FROM _ws_delete_ids) AND min_doc <= "
            f"(SELECT MAX(doc_id) FROM _ws_delete_ids) AND EXISTS ("
            f"SELECT 1 FROM _ws_delete_ids d WHERE d.doc_id BETWEEN "
            f"min_doc AND max_doc)")

    # -------------------------------------------------------------- read

    def read_blocks(self, segment_ids: list[int] | None = None) -> DataFrame:
        """Committed block rows; partition pruning on ``segment_id`` comes
        from Iceberg partition metadata, same as the directory pruning the
        Parquet store gets from its per-segment paths."""
        df = self.spark.table(self.blocks_table)
        if segment_ids is not None:
            df = df.where(F.col("segment_id").isin([int(s) for s in segment_ids]))
        return df

    def active_segments(self) -> list[int]:
        row = self.spark.table(self.meta_table).head()
        return sorted(int(s) for s in row["active_segments"]) if row else []

    def snapshots(self) -> DataFrame:
        """The table's snapshot log (``<blocks>.snapshots``) — the
        generation history the Parquet store keeps as ``_meta.json`` +
        ``.old`` files."""
        return self.spark.table(f"{self.blocks_table}.snapshots")
