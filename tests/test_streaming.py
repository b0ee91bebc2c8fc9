"""Structured Streaming coverage: exactly-once file-stream ingest into the
index (resume across restarts) and watermarked windowed aggregation
equivalence with the batch query."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def dirs(tmp_path):
    d = {
        name: str(tmp_path / name)
        for name in ["source", "staging", "index", "ckpt"]
    }
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def test_stream_ingest_builds_then_extends_index(spark, dirs):
    from clinical_trial_searchengine_spark.engine import SearchEngine
    from clinical_trial_searchengine_spark.sources.corpus import (
        generate_corpus_pandas,
    )
    from clinical_trial_searchengine_spark.streaming.ingest import (
        stream_corpus_to_index,
    )

    full = generate_corpus_pandas(120, seed=42)
    spark.createDataFrame(full.iloc[:80]).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["source"])

    meta1 = stream_corpus_to_index(
        spark, dirs["source"], dirs["staging"], dirs["index"], dirs["ckpt"],
        shard_size=48,
    )
    assert meta1["num_docs"] == 80 and meta1["new_docs"] == 80

    # drain again with no new files: checkpoint makes it a no-op
    meta_noop = stream_corpus_to_index(
        spark, dirs["source"], dirs["staging"], dirs["index"], dirs["ckpt"],
        shard_size=48,
    )
    assert meta_noop["new_docs"] == 0

    # late-arriving files -> incremental extension, exact stats
    spark.createDataFrame(full.iloc[80:]).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["source"])
    meta2 = stream_corpus_to_index(
        spark, dirs["source"], dirs["staging"], dirs["index"], dirs["ckpt"],
        shard_size=48,
    )
    assert meta2["num_docs"] == 120 and meta2["new_docs"] == 40

    # the extension is a DELTA GENERATION, not a rebuild: gen 0's segments
    # and generations.json must both exist
    import os

    assert os.path.exists(os.path.join(dirs["index"], "gen=1"))
    assert meta2.get("generations") == 2

    # the streamed-in index scores queries identically to the full-corpus
    # oracle (compared by stable key: generation doc_ids are gen-local)
    import sys

    sys.path.insert(0, "tests")
    from oracle import BM25Oracle

    eng = SearchEngine(spark, dirs["index"])
    key_by_id = {
        r["doc_id"]: (r["repo"], r["path"], r["commit"])
        for r in eng.handle().doc_meta_df().collect()
    }
    got = {
        key_by_id[r["doc_id"]]: r["score"]
        for r in eng.search_all("def license").collect()
    }
    oracle = BM25Oracle(full)
    exp = {
        oracle.key_of(d): s for d, s in oracle.score_all("def license").items()
    }
    assert set(got) == set(exp)
    for key, s in exp.items():
        assert abs(got[key] - s) <= 1e-9, key


def test_stream_windowed_counts_match_batch(spark, dirs):
    from clinical_trial_searchengine_spark.streaming.ingest import (
        stream_windowed_event_counts,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("append").parquet(dirs["source"])

    out = stream_windowed_event_counts(spark, dirs["source"])
    q = (
        out.writeStream.format("memory")
        .queryName("hourly_stream")
        .outputMode("complete")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["avg_value"])
        for r in spark.sql("SELECT * FROM hourly_stream").collect()
    }
    exp = {
        (r["hour"], r["event_type"]): (r["n"], r["avg_value"])
        for r in events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .collect()
    }
    assert got == exp and len(got) > 0


def test_stateful_sessionizer_matches_batch_twin(spark, tmp_path):
    """applyInPandasWithState sessionizer: every emitted (closed) session
    must exactly equal the batch gaps-and-islands twin's session for that
    (user, start); at most one still-open session per user is withheld."""
    from clinical_trial_searchengine_spark.streaming.sessions import (
        sessionize_events_batch,
        sessionize_events_stream,
    )

    src = str(tmp_path / "src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.where("user_id < 25").write.parquet(src)

    streamed = sessionize_events_stream(
        spark,
        src,
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        gap_minutes=360,
    ).toPandas()
    batch = (
        sessionize_events_batch(spark.read.parquet(src), gap_minutes=360)
        .toPandas()
        .drop(columns=["session_no"])
    )

    m = streamed.merge(
        batch, on=["user_id", "session_start"], suffixes=("_s", "_b")
    )
    assert len(m) == len(streamed) > 0          # every emitted row is real
    assert (m["n_events_s"] == m["n_events_b"]).all()
    assert (m["session_end_s"] == m["session_end_b"]).all()
    assert (abs(m["sum_value_s"] - m["sum_value_b"]) < 1e-6).all()
    n_users = batch["user_id"].nunique()
    assert len(streamed) >= len(batch) - n_users  # <=1 open session/user


def test_stateful_sessionizer_state_survives_micro_batches(spark, tmp_path):
    """Open sessions must carry across micro-batches: the source is split
    into time-range-ordered files and drained a few files per trigger, so
    most users' sessions span batches; the emitted set must still match
    the batch twin exactly."""
    from pyspark.sql import functions as F

    from clinical_trial_searchengine_spark.streaming.sessions import (
        sessionize_events_batch,
        sessionize_events_stream,
    )

    src = str(tmp_path / "src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").where(
        "user_id < 25"
    )
    # the file source drains oldest-mtime-first, so land six sequential
    # time-sliced files — the production arrival order the watermark
    # contract assumes (a single parallel write gives near-identical
    # mtimes and hence arbitrary, event-time-violating batch order)
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    step = (hi - lo) / 6
    for i in range(6):
        a = lo + step * i
        b = hi if i == 5 else lo + step * (i + 1)
        cond = (F.col("ts") >= a) & (
            (F.col("ts") <= b) if i == 5 else (F.col("ts") < b)
        )
        events.where(cond).coalesce(1).write.mode("append").parquet(src)

    streamed = sessionize_events_stream(
        spark,
        src,
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        gap_minutes=360,
        max_files_per_trigger=2,
    ).toPandas()
    batch = (
        sessionize_events_batch(spark.read.parquet(src), gap_minutes=360)
        .toPandas()
        .drop(columns=["session_no"])
    )

    m = streamed.merge(
        batch, on=["user_id", "session_start"], suffixes=("_s", "_b")
    )
    assert len(m) == len(streamed) > 0
    assert (m["n_events_s"] == m["n_events_b"]).all()
    assert (m["session_end_s"] == m["session_end_b"]).all()
    n_users = batch["user_id"].nunique()
    assert len(streamed) >= len(batch) - n_users
