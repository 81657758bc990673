"""Streaming late-data maintenance == batch rebuild (foreachBatch bucket path)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ipl_dagster_pipeline_spark.plans.features import build_turn_features
from ipl_dagster_pipeline_spark.sources.transcripts import (
    synthesize_tool_dim,
    synthesize_transcripts,
)
from ipl_dagster_pipeline_spark.streaming.incremental_stream import stream_incremental_features

N_BUCKETS = 8


def _key(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.session_id, r.chars_sum_5, r.tool_ffill)
        for r in df.select("conv_id", "turn_idx", "session_id", "chars_sum_5", "tool_ffill").collect()
    )


def test_streaming_bucket_rebuild_matches_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    feats = str(tmp_path / "feats")
    ck = str(tmp_path / "ck")
    dim = synthesize_tool_dim(spark, seed=5, n_days=10)

    base = synthesize_transcripts(spark, n_convs=12, turns_per_conv=8, seed=5)
    base.write.mode("overwrite").parquet(input_dir)

    q = stream_incremental_features(spark, input_dir, dim, feats, ck, n_buckets=N_BUCKETS)
    q.awaitTermination()

    # LATE DATA: extra turns for 3 conversations land as a new file
    late = synthesize_transcripts(spark, n_convs=3, turns_per_conv=11, seed=5).filter(
        F.col("turn_idx") > 8
    )
    late.write.mode("append").parquet(input_dir)

    # catch-up run resumes from the checkpoint: processes ONLY the new file,
    # rebuilds only its touched buckets
    q2 = stream_incremental_features(spark, input_dir, dim, feats, ck, n_buckets=N_BUCKETS)
    q2.awaitTermination()

    got = spark.read.parquet(feats)
    exp = build_turn_features(spark.read.parquet(input_dir), dim)
    assert _key(got) == _key(exp)

    # idempotent: re-running with nothing new leaves the table identical
    q3 = stream_incremental_features(spark, input_dir, dim, feats, ck, n_buckets=N_BUCKETS)
    q3.awaitTermination()
    assert _key(spark.read.parquet(feats)) == _key(exp)
