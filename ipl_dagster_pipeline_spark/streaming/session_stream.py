"""Structured Streaming surface (SURVEY §2.9).

The reference approximates streaming with minutely cron micro-batches
(sharing.py:142-149) plus keep-first dedup for late/duplicate data
(lamassu.py:307).  The engine's true-streaming equivalents:

* ``stream_transcripts``   — file-source readStream with the DECLARED schema
  (streams never infer).
* ``streaming_dedup``      — ``dropDuplicatesWithinWatermark`` on
  (conv_id, turn_idx): late duplicates within the watermark are dropped
  exactly like the batch keep-first rule.
* ``streaming_sessionize`` — ``F.session_window(ts, gap)`` gap sessions with
  watermarking; the streaming analog of operators/sessionize.py (equivalence
  covered by tests/test_streaming.py).
* ``streaming_turn_rates`` — sliding-window per-role turn counts.

All are incremental, watermark-bounded state — no unbounded state at scale.
``trigger(availableNow=True)`` turns any of them into a catch-up batch run,
which is the engine's late-data reprocessing story (together with idempotent
partition overwrite, io.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import TRANSCRIPT_SCHEMA


def stream_transcripts(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Keep-first dedup under late data (P7/W1 streaming analog)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])


def streaming_sessionize(
    stream: DataFrame, gap_seconds: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Per-conversation gap sessions: one output row per closed session with
    turn count, char volume, and session bounds.

    The session-window key is the ts TRUNCATED to seconds: the engine's gap
    definition is floor-second deltas (cast(ts as long), operators/
    sessionize.py), and ``session_window`` on raw µs timestamps would split/
    merge differently whenever a gap's fractional parts straddle the
    threshold.  Aggregated bounds still use the raw ts."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.session_window(F.date_trunc("second", "ts"), f"{gap_seconds} seconds"),
            F.col("conv_id"),
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("total_chars"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            "n_turns",
            "total_chars",
            "session_start",
            "session_end",
        )
    )


def streaming_turn_rates(
    stream: DataFrame, window: str = "10 minutes", slide: str = "5 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Sliding-window turn counts per role (tumbling if slide == window)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )


def run_available_now(
    stream_df: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    output_mode: str = "append",
) -> None:
    """Execute a streaming plan over all currently-available input (catch-up
    batch) into a PARQUET sink — the production late-data reprocessing entry
    point (pairs with idempotent partition overwrite, io.py).

    No driver-side collect: read the sink path afterwards.  The in-memory
    collecting variant lives in tests (tests/test_streaming.py drain helper).
    """
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
