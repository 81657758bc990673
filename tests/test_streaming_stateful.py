"""Stateful streaming: session ids continue across micro-batches and match
the batch sessionization for in-order arrivals."""

from __future__ import annotations

import pyspark.sql.functions as F

from ipl_dagster_pipeline_spark.operators.sessionize import sessionize
from ipl_dagster_pipeline_spark.streaming.session_stream import stream_transcripts
from ipl_dagster_pipeline_spark.streaming.stateful import running_features_stateful

GAP = 900


def test_stateful_sessions_continue_across_batches(spark, tmp_path):
    from ipl_dagster_pipeline_spark.sources.transcripts import synthesize_transcripts

    full = synthesize_transcripts(spark, n_convs=8, turns_per_conv=16, seed=21).cache()
    d = str(tmp_path / "in")
    # two time-ordered files per the stream: first half of each conv, then rest
    full.filter("turn_idx <= 8").coalesce(1).write.mode("overwrite").parquet(d)
    full.filter("turn_idx > 8").coalesce(1).write.mode("append").parquet(d)

    stream = stream_transcripts(spark, d, max_files_per_trigger=1)  # one file per micro-batch
    q = (
        running_features_stateful(stream, gap_seconds=GAP)
        .writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT * FROM stateful_out")
        .orderBy("conv_id", "ts", "turn_idx")
        .toPandas()
    )

    exp = (
        sessionize(full, gap_seconds=GAP)
        .orderBy("conv_id", "ts", "turn_idx")
        .toPandas()
    )
    assert len(got) == len(exp)
    assert got["session_id"].tolist() == exp["session_id"].tolist()
    # running turn counter is 1..n per conversation in stream order
    per_conv = got.groupby("conv_id")["running_turns"]
    assert (per_conv.max() == per_conv.count()).all()
