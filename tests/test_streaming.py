"""Structured Streaming: sessionize/dedup/windows equivalence with batch."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ipl_dagster_pipeline_spark.operators.sessionize import session_aggregates, sessionize
from ipl_dagster_pipeline_spark.streaming.session_stream import (
    stream_transcripts,
    streaming_dedup,
    streaming_sessionize,
    streaming_turn_rates,
)

GAP = 900


def run_to_memory(stream_df, query_name: str, output_mode: str = "append") -> list:
    """Test-only drain: availableNow catch-up into an in-memory sink, collect.
    (The production entry point is session_stream.run_available_now → parquet;
    driver-side collect belongs in tests only.)"""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()


@pytest.fixture(scope="module")
def transcript_dir(spark, tmp_path_factory):
    from ipl_dagster_pipeline_spark.sources.transcripts import synthesize_transcripts

    d = str(tmp_path_factory.mktemp("stream_in"))
    synthesize_transcripts(spark, n_convs=15, turns_per_conv=20, seed=11).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_streaming_sessionize_matches_batch(spark, transcript_dir):
    stream = stream_transcripts(spark, transcript_dir)
    rows = run_to_memory(
        streaming_sessionize(stream, gap_seconds=GAP), "sess_stream", output_mode="complete"
    )
    batch = spark.read.parquet(transcript_dir)
    batch_sessions = session_aggregates(sessionize(batch, gap_seconds=GAP)).collect()

    # same number of sessions, same (conv_id → session count) histogram
    stream_per_conv = {}
    for r in rows:
        stream_per_conv[r.conv_id] = stream_per_conv.get(r.conv_id, 0) + 1
    batch_per_conv = {}
    for r in batch_sessions:
        batch_per_conv[r.conv_id] = max(batch_per_conv.get(r.conv_id, 0), r.session_id)
    assert stream_per_conv == batch_per_conv
    # per-session turn totals agree
    assert sum(r.n_turns for r in rows) == sum(r.n_turns for r in batch_sessions)
    stream_key = sorted((r.conv_id, r.session_start, r.n_turns) for r in rows)
    batch_key = sorted((r.conv_id, r.session_start, r.n_turns) for r in batch_sessions)
    assert stream_key == batch_key


def test_streaming_dedup_drops_late_duplicates(spark, transcript_dir):
    stream = stream_transcripts(spark, transcript_dir)
    # feed each file twice by unioning the stream with itself is not allowed;
    # instead duplicate rows inside the stream via explode
    doubled = stream.withColumn("__n", F.explode(F.array(F.lit(1), F.lit(2)))).drop("__n")
    rows = run_to_memory(streaming_dedup(doubled), "dedup_stream")
    n_unique = spark.read.parquet(transcript_dir).count()
    assert len(rows) == n_unique


def test_streaming_turn_rates_totals(spark, transcript_dir):
    stream = stream_transcripts(spark, transcript_dir)
    rows = run_to_memory(
        streaming_turn_rates(stream, window="1 hour", slide="1 hour"), "rates_stream", output_mode="complete"
    )
    total = spark.read.parquet(transcript_dir).count()
    assert sum(r.n_turns for r in rows) == total  # tumbling: each turn in exactly one window


def test_run_available_now_parquet_sink(spark, transcript_dir, tmp_path):
    from ipl_dagster_pipeline_spark.streaming.session_stream import run_available_now

    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    run_available_now(streaming_dedup(stream_transcripts(spark, transcript_dir)), sink, ck)
    assert spark.read.parquet(sink).count() == spark.read.parquet(transcript_dir).count()


def test_streaming_sessionize_floor_second_boundary(spark, tmp_path):
    """Streaming session_window must follow the engine's floor-second gap
    rule on sub-second timestamps: 00:00:00.100 → 00:15:00.700 floats past a
    900s gap but floors to exactly 900 → ONE session (matches batch)."""
    import datetime as dt

    from ipl_dagster_pipeline_spark.operators.sessionize import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 1, "user", "a", None, base + dt.timedelta(milliseconds=100)),
        ("c1", 2, "user", "b", None, base + dt.timedelta(minutes=15, milliseconds=700)),
        ("c1", 3, "user", "c", None, base + dt.timedelta(minutes=30, seconds=1, milliseconds=800)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    d = str(tmp_path / "subsec_stream")
    df.write.parquet(d)
    rows_out = run_to_memory(
        streaming_sessionize(stream_transcripts(spark, d), gap_seconds=900),
        "subsec_sessions",
        output_mode="complete",
    )
    # batch: turns 1+2 same session (floor delta 900), turn 3 new (floor 901)
    batch = sessionize(df, gap_seconds=900)
    assert batch.agg(F.max("session_id")).collect()[0][0] == 2
    assert len(rows_out) == 2
    assert sorted(r.n_turns for r in rows_out) == [1, 2]
