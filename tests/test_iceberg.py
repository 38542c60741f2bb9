"""Iceberg segment-store adapter: gating behavior always runs; the
catalog roundtrip is skip-gated on a real Iceberg runtime (absent in this
sandbox — BENCH.md §"Iceberg stand-in")."""

import pytest

from whoosh_spark.indexing.iceberg import (
    IcebergSegmentStore,
    IcebergUnavailable,
    find_iceberg_catalog,
    require_iceberg,
)


def _catalog(spark):
    return find_iceberg_catalog(spark)


def test_gating_without_catalog(spark):
    if _catalog(spark) is not None:
        pytest.skip("an Iceberg catalog IS configured here")
    assert find_iceberg_catalog(spark) is None
    with pytest.raises(IcebergUnavailable):
        require_iceberg(spark)
    with pytest.raises(IcebergUnavailable):
        IcebergSegmentStore(spark, "ice.db.turns_ix")


def test_catalog_detection_rejects_unloadable_class(spark):
    # conf naming an Iceberg class whose JAR is absent must NOT count
    conf_pairs = dict(spark.sparkContext.getConf().getAll())
    assert not any(
        "iceberg" in v.lower() and k.startswith("spark.sql.catalog.")
        for k, v in conf_pairs.items()
    ) or _catalog(spark) is not None


@pytest.mark.skipif(
    "config.getoption('--run-iceberg', default=False) is False",
    reason="needs an Iceberg catalog (iceberg-spark-runtime JAR); run with "
    "--run-iceberg on a session configured with spark.sql.catalog.ice",
)
def test_segment_roundtrip_on_iceberg(spark):
    cat = _catalog(spark)
    if cat is None:
        pytest.skip("no loadable Iceberg catalog on this session")
    store = IcebergSegmentStore(spark, f"{cat}.db.turns_ix")
    blocks = spark.createDataFrame(
        [("text", "spark", 0, 0, 5, 3), ("text", "join", 0, 1, 7, 2)],
        "field string, term string, block_id int, min_doc long, max_doc long, n long",
    )
    store.write_segment(blocks, 0, {"segment_id": 0, "n_blocks": 2})
    store.commit(doc_count=8, active_segments=[0])
    assert store.active_segments() == [0]
    assert store.read_blocks([0]).count() == 2
    ids = spark.createDataFrame([(5,)], "doc_id long")
    store.delete_docs(ids)
    assert store.read_blocks([0]).count() == 1
    assert store.snapshots().count() >= 2
