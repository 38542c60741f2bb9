"""Dense doc-id assignment parity: doc_id = row_number over (conv_id,
turn_idx) - 1, invariant to input partitioning (mirrors whoosh
test_mpwriter: parallel build == serial build)."""

from whoosh_spark.indexing import assign_doc_ids


def test_dense_ids_follow_order(spark):
    rows = [
        ("conv002", 0, "b"),
        ("conv000", 1, "x"),
        ("conv001", 0, "m"),
        ("conv000", 0, "a"),
        ("conv001", 1, "n"),
        ("conv002", 1, "c"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = assign_doc_ids(df, ["conv_id", "turn_idx"]).collect()
    by_id = {r["doc_id"]: (r["conv_id"], r["turn_idx"]) for r in out}
    assert sorted(by_id) == list(range(6))
    ordered = [by_id[i] for i in range(6)]
    assert ordered == sorted(ordered)


def test_ids_invariant_to_partitioning(spark):
    rows = [(f"conv{i % 7:03d}", i // 7, f"t{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    a = assign_doc_ids(df.repartition(1), ["conv_id", "turn_idx"], num_partitions=3)
    b = assign_doc_ids(df.repartition(13), ["conv_id", "turn_idx"], num_partitions=5)
    ra = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in a.collect()}
    rb = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in b.collect()}
    assert ra == rb
    assert sorted(ra.values()) == list(range(200))
