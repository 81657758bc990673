"""Window features vs a single-process pandas oracle (SURVEY §5 test plan)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ipl_dagster_pipeline_spark.operators.windows import (
    backfill,
    rank_dedup,
    top_k_per_group,
    with_lag_features,
    with_rolling_rows,
)


def _sorted_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(drop=True)


def test_lag_features_match_pandas(small_transcripts, small_transcripts_pdf):
    got = _sorted_pdf(with_lag_features(small_transcripts).toPandas())
    exp = _sorted_pdf(small_transcripts_pdf.copy())
    g = exp.groupby("conv_id", sort=False)
    exp["prev_role_1"] = g["role"].shift(1)
    exp["prev_tool_1"] = g["tool"].shift(1)
    exp["ts_delta_s_1"] = g["ts"].diff().dt.total_seconds()
    pd.testing.assert_series_equal(got["prev_role_1"], exp["prev_role_1"].astype(object).where(exp["prev_role_1"].notna(), None), check_names=False)
    assert got["ts_delta_s_1"].fillna(-1).tolist() == exp["ts_delta_s_1"].fillna(-1).tolist()


def test_rolling_rows_match_pandas(small_transcripts, small_transcripts_pdf):
    df = small_transcripts.withColumn("text_len", F.length("text").cast("long"))
    got = _sorted_pdf(with_rolling_rows(df, F.col("text_len"), k=5, out_prefix="chars").toPandas())
    exp = _sorted_pdf(small_transcripts_pdf.copy())
    exp["text_len"] = exp["text"].str.len()
    r = exp.groupby("conv_id", sort=False)["text_len"].rolling(5, min_periods=1)
    exp["chars_sum_5"] = r.sum().reset_index(level=0, drop=True)
    exp["chars_avg_5"] = r.mean().reset_index(level=0, drop=True)
    assert got["chars_sum_5"].tolist() == exp["chars_sum_5"].astype("int64").tolist()
    assert (got["chars_avg_5"] - exp["chars_avg_5"]).abs().max() < 1e-9


def test_backfill_matches_pandas(small_transcripts, small_transcripts_pdf):
    got = _sorted_pdf(backfill(small_transcripts, "tool").toPandas())
    exp = _sorted_pdf(small_transcripts_pdf.copy())
    exp["tool_ffill"] = exp.groupby("conv_id", sort=False)["tool"].ffill()
    assert got["tool_ffill"].fillna("∅").tolist() == exp["tool_ffill"].fillna("∅").tolist()


def test_rank_dedup_keeps_exactly_one(spark):
    rows = [
        ("c1", 1, "2024-01-01 00:00:00", "a"),
        ("c1", 1, "2024-01-01 00:00:05", "b"),
        ("c1", 2, "2024-01-01 00:01:00", "c"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "ts", "text"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    first = rank_dedup(df, ["conv_id", "turn_idx"], [F.col("ts"), F.col("text")], keep="first")
    last = rank_dedup(df, ["conv_id", "turn_idx"], [F.col("ts"), F.col("text")], keep="last")
    assert first.count() == 2 and last.count() == 2
    assert first.filter("turn_idx = 1").collect()[0].text == "a"
    assert last.filter("turn_idx = 1").collect()[0].text == "b"


def test_top_k_per_group(small_transcripts):
    got = top_k_per_group(small_transcripts, ["conv_id"], [F.col("ts"), F.col("turn_idx")], k=3)
    counts = got.groupBy("conv_id").count().toPandas()
    assert (counts["count"] <= 3).all()


def test_lag_never_reads_future(small_transcripts):
    """Zero-temporal-leakage: lag feature timestamps are all <= current ts."""
    df = with_lag_features(small_transcripts).withColumn(
        "prev_ts", F.col("ts").cast("long") - F.col("ts_delta_s_1")
    )
    bad = df.filter(F.col("prev_ts") > F.col("ts").cast("long")).count()
    assert bad == 0


def test_rank_dedup_direction_guard_is_anchored(spark):
    """The pre-directed-column guard matches the SortOrder SUFFIX only: a
    CASE expression containing ' DESCRIPTION' as a string literal must NOT
    be rejected, while an actual .desc()/.asc() column must."""
    import pytest

    df = spark.createDataFrame(
        [("c1", 1, "a DESCRIPTION", "x")], ["conv_id", "turn_idx", "ts", "text"]
    )
    # literal containing ' DESC' mid-expression: accepted
    order = [F.when(F.col("ts") == " DESCRIPTION", F.lit(0)).otherwise(F.lit(1)), F.col("text")]
    assert rank_dedup(df, ["conv_id"], order, keep="first").count() == 1
    # genuinely pre-directed columns: rejected
    for bad in (F.col("ts").desc(), F.col("ts").asc(), F.col("ts").desc_nulls_last()):
        with pytest.raises(ValueError, match="direction-less"):
            rank_dedup(df, ["conv_id"], [bad], keep="last")


def test_rolling_quantiles_hand_computed(spark):
    import datetime as dt

    from ipl_dagster_pipeline_spark.operators.windows import with_rolling_quantiles

    vals = [5.0, 1.0, 4.0, None, 3.0]
    df = spark.createDataFrame(
        [("c", i, dt.datetime(2024, 1, 1, 0, 0, i), v) for i, v in enumerate(vals)],
        "conv_id string, turn_idx int, ts timestamp, v double",
    )
    out = {
        r["turn_idx"]: r
        for r in with_rolling_quantiles(df, "v", 3, {"med": 0.5, "p25": 0.25}).collect()
    }
    assert out[0]["med"] == 5.0  # frame {5}
    assert out[1]["med"] == 3.0 and out[1]["p25"] == 2.0  # {1,5}
    assert out[2]["med"] == 4.0 and out[2]["p25"] == 2.5  # {1,4,5}
    assert out[3]["med"] == 2.5 and out[3]["p25"] == 1.75  # {1,4} (null skipped)
    assert out[4]["med"] == 3.5  # {3,4}


def test_rolling_quantiles_validation_and_all_null(spark):
    import datetime as dt

    import pytest

    from ipl_dagster_pipeline_spark.operators.windows import with_rolling_quantiles

    df = spark.createDataFrame(
        [("c", 0, dt.datetime(2024, 1, 1), None)],
        "conv_id string, turn_idx int, ts timestamp, v double",
    )
    assert with_rolling_quantiles(df, "v", 3, {"med": 0.5}).collect()[0]["med"] is None
    with pytest.raises(ValueError):
        with_rolling_quantiles(df, "v", 0, {"med": 0.5})
    with pytest.raises(ValueError):
        with_rolling_quantiles(df, "v", 3, {"bad": 1.5})


def test_rolling_quantiles_share_one_window_sort(spark):
    """All quantile columns read ONE collect_list window — a single Window
    node and a single sort in the physical plan."""
    import datetime as dt

    from ipl_dagster_pipeline_spark.operators.windows import with_rolling_quantiles

    df = spark.createDataFrame(
        [("c", 0, dt.datetime(2024, 1, 1), 1.0)],
        "conv_id string, turn_idx int, ts timestamp, v double",
    )
    plan = (
        with_rolling_quantiles(df, "v", 5, {"a": 0.25, "b": 0.5, "c": 0.75})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") == 1
    assert plan.count("Sort") == 1
