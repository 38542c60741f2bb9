"""Transcript corpus synthesis: shape, determinism, DuckDB mirror parity."""

import duckdb
import pytest

from whoosh_spark.transcripts import (
    TURNS_FROM_DOCUMENTS_SQL,
    synth_turns,
    transcript_corpus,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return transcript_corpus(spark, SF).orderBy("doc_id").toPandas()


def test_north_rule_shape(corpus):
    assert list(corpus.columns) == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "doc_id",
    ]
    assert str(corpus["turn_idx"].dtype) == "int32"
    assert corpus["doc_id"].tolist() == list(range(len(corpus)))  # dense docnums


def test_duckdb_mirror_exact(corpus):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    dk = con.sql(
        "WITH " + TURNS_FROM_DOCUMENTS_SQL +
        " SELECT conv_id, turn_idx, role, text, tool, ts, doc_id FROM turns ORDER BY doc_id"
    ).df()
    assert len(dk) == len(corpus)
    for col in ["conv_id", "turn_idx", "role", "text", "tool", "doc_id"]:
        assert corpus[col].tolist() == dk[col].tolist(), col
    assert (corpus["ts"].to_numpy() == dk["ts"].to_numpy()).all()


def test_synth_deterministic_across_parallelism(spark):
    a = synth_turns(spark, 2000, num_partitions=2).orderBy("doc_id").toPandas()
    b = synth_turns(spark, 2000, num_partitions=7).orderBy("doc_id").toPandas()
    assert a["text"].tolist() == b["text"].tolist()
    assert a["conv_id"].tolist() == b["conv_id"].tolist()
    assert a["tool"].fillna("").tolist() == b["tool"].fillna("").tolist()
    # multi-turn conversations with alternating roles
    assert set(a["role"]) == {"user", "assistant"}
    assert a["turn_idx"].max() == 19
