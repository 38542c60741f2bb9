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


# ---------------- time-axis analytics (sessionize / latency / tools) -------


@pytest.fixture(scope="module")
def jittered(spark):
    # synthetic corpus with irregular gaps: ts = 2025-01-01 + hash-jittered
    # cumulative offsets (same shape the driver entries derive)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t = synth_turns(spark, 3000, turns_per_conv=15)
    gap = F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(9)), F.lit(900))
    run = (Window.partitionBy("conv_id").orderBy("turn_idx")
           .rowsBetween(Window.unboundedPreceding, 0))
    return t.withColumn(
        "ts",
        F.to_timestamp(F.lit("2025-01-01 00:00:00"))
        + F.make_interval(secs=F.sum(gap).over(run)),
    )


def test_sessionize_invariants(jittered):
    from whoosh_spark.pipeline.conversations import sessionize

    s = sessionize(jittered, gap_seconds=600).orderBy("conv_id", "turn_idx").toPandas()
    for _, g in s.groupby("conv_id"):
        gaps = g["gap_s"].tolist()
        sidx = g["session_idx"].tolist()
        assert gaps[0] != gaps[0] or gaps[0] is None  # first gap is NaN/None
        assert sidx[0] == 0
        for k in range(1, len(sidx)):
            expect_new = gaps[k] > 600
            assert sidx[k] == sidx[k - 1] + (1 if expect_new else 0)
    # non-vacuous: some conversation actually splits
    assert s["session_idx"].max() >= 1


def test_session_stats_tile_conversations(jittered):
    from whoosh_spark.pipeline.conversations import session_stats

    st = session_stats(jittered, gap_seconds=600).toPandas()
    per_conv = st.groupby("conv_id").agg(
        turns=("n_turns", "sum"), sessions=("session_idx", "max"))
    assert (per_conv["turns"] == 15).all()  # sessions tile every conversation
    assert (st["duration_s"] == st["end_s"] - st["start_s"]).all()
    assert (st["duration_s"] >= 0).all()


def test_response_latency_matches_gaps(jittered):
    from whoosh_spark.pipeline.conversations import response_latency, sessionize

    lat = response_latency(jittered).toPandas()
    s = sessionize(jittered, 600).toPandas()
    ref = s[(s["role"] == "assistant") & s["gap_s"].notna()]
    merged = lat.merge(ref, on=["conv_id", "turn_idx"], how="outer")
    assert len(merged) == len(lat) == len(ref)
    assert (merged["latency_s"] == merged["gap_s"]).all()
    assert (lat["latency_s"] >= 0).all()  # monotone ts => non-negative


def test_tool_usage_stats_totals(jittered):
    from pyspark.sql import functions as F
    from whoosh_spark.pipeline.conversations import tool_usage_stats

    st = tool_usage_stats(jittered).toPandas()
    n_tool_turns = jittered.where(
        F.col("tool").isNotNull() & (F.col("tool") != "")).count()
    assert st["n_calls"].sum() == n_tool_turns
    assert set(st["tool"]) <= {"search", "code", "browse", "calc"}
    assert (st["first_s"] <= st["last_s"]).all()
    assert (st["mean_words"] > 0).all()


def test_expand_context(spark):
    """Hit turns gain their +-k conversation neighbors; windows clip at
    conversation edges and never cross conversations."""
    from whoosh_spark.pipeline.conversations import expand_context

    turns = spark.createDataFrame(
        [
            (0, "c1", 0), (1, "c1", 1), (2, "c1", 2), (3, "c1", 3),
            (4, "c2", 0), (5, "c2", 1),
        ],
        "doc_id long, conv_id string, turn_idx int",
    )
    hits = spark.createDataFrame([(1, 2.5), (4, 1.5)],
                                 "doc_id long, score double")
    out = expand_context(hits, turns, k=1).collect()
    got = {(r.hit_doc_id, r.ctx_doc_id): r.offset for r in out}
    # hit 1 (c1/idx1): neighbors 0,1,2; hit 4 (c2/idx0): clipped to 4,5
    assert got == {(1, 0): -1, (1, 1): 0, (1, 2): 1, (4, 4): 0, (4, 5): 1}
    # scores ride through; no cross-conversation leakage
    assert all(r.score in (2.5, 1.5) for r in out)
    assert all(r.conv_id == ("c1" if r.hit_doc_id == 1 else "c2") for r in out)
    # k=0 degenerates to the hits themselves
    assert sorted(r.ctx_doc_id for r in
                  expand_context(hits, turns, k=0).collect()) == [1, 4]
    # plan: equi-join on conv, no NestedLoop / cartesian
    plan = expand_context(hits, turns, k=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_assemble_context(spark):
    from whoosh_spark.pipeline.conversations import (assemble_context,
                                                     expand_context)

    turns = spark.createDataFrame(
        [
            (0, "c1", 0, "user", "hello there"),
            (1, "c1", 1, "assistant", "hi how can i help"),
            (2, "c1", 2, "user", "explain spark"),
            (4, "c2", 0, "user", "lone turn"),
        ],
        "doc_id long, conv_id string, turn_idx int, role string, text string",
    )
    hits = spark.createDataFrame([(1, 3.0), (4, 1.0)],
                                 "doc_id long, score double")
    out = {r.hit_doc_id: r for r in
           assemble_context(expand_context(hits, turns, k=1), turns).collect()}
    assert out[1].n_turns == 3
    assert out[1].context_text == ("user: hello there\n"
                                   "assistant: hi how can i help\n"
                                   "user: explain spark")
    assert out[4].n_turns == 1 and out[4].context_text == "user: lone turn"
    assert out[1].score == 3.0 and out[1].conv_id == "c1"
