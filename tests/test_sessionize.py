"""Sessionization: window-sum vs grouped-map pandas equivalence + pandas oracle."""

from __future__ import annotations

import pandas as pd

from ipl_dagster_pipeline_spark.operators.sessionize import (
    session_aggregates,
    sessionize,
    sessionize_grouped,
)

GAP = 900


def _key(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(drop=True)


def _pandas_oracle(pdf: pd.DataFrame, gap: int) -> pd.Series:
    pdf = _key(pdf.copy())
    delta = pdf.groupby("conv_id", sort=False)["ts"].diff().dt.total_seconds()
    return (delta.isna() | (delta > gap)).groupby(pdf["conv_id"], sort=False).cumsum().astype(int)


def test_sessionize_matches_pandas(small_transcripts, small_transcripts_pdf):
    got = _key(sessionize(small_transcripts, gap_seconds=GAP).toPandas())
    exp = _pandas_oracle(small_transcripts_pdf, GAP)
    assert got["session_id"].tolist() == exp.tolist()


def test_grouped_map_equivalent_to_window_sum(small_transcripts):
    a = _key(sessionize(small_transcripts, gap_seconds=GAP).toPandas())
    b = _key(sessionize_grouped(small_transcripts, gap_seconds=GAP).toPandas())
    assert a["session_id"].tolist() == b["session_id"].tolist()
    assert a["text"].tolist() == b["text"].tolist()  # per-turn text equality, stable order


def test_gap_exactly_threshold_stays_same_session(spark):
    import pyspark.sql.functions as F

    rows = [("c", 1, "2024-01-01 00:00:00"), ("c", 2, "2024-01-01 00:15:00"), ("c", 3, "2024-01-01 00:30:01")]
    df = (
        spark.createDataFrame(rows, ["conv_id", "turn_idx", "ts"])
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("role", F.lit("user"))
        .withColumn("text", F.lit("t"))
        .withColumn("tool", F.lit(None).cast("string"))
    )
    out = sessionize(df, gap_seconds=900).orderBy("turn_idx").toPandas()
    # 900s gap == threshold → same session; 901s → new session
    assert out["session_id"].tolist() == [1, 1, 2]


def test_session_aggregates_counts(small_transcripts):
    sess = sessionize(small_transcripts, gap_seconds=GAP)
    agg = session_aggregates(sess)
    total = agg.agg({"n_turns": "sum"}).collect()[0][0]
    assert total == small_transcripts.count()
