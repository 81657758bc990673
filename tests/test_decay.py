"""Exponentially time-decayed features (operators/decay.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ipl_dagster_pipeline_spark.operators.decay import (
    day_index,
    decay_weights,
    with_decayed_counts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(days=d, hours=3), k, v) for i, d, k, v in rows],
        "event_id long, ts timestamp, user_id long, value double",
    )


def test_weight_table_shape():
    wt = decay_weights(7.0, 28, 16)
    assert wt[0] == (1, round(65536 * 0.5 ** (1 / 7)))
    assert len(wt) == 28 and all(w > 0 for _, w in wt)
    assert [w for _, w in wt] == sorted((w for _, w in wt), reverse=True)
    with pytest.raises(ValueError):
        decay_weights(0, 28)


def test_decayed_counts_exact_small_case(spark):
    # key 7: 2 events day 0, 1 event day 1; feature at day 1 and day 3
    df = _ev(
        spark,
        [(1, 0, 7, 1.0), (2, 0, 7, 3.0), (3, 1, 7, 5.0), (4, 3, 7, None)],
    )
    out = {r["event_id"]: r for r in with_decayed_counts(df, "user_id", value_col="value").collect()}
    wt = dict(decay_weights(7.0, 28, 16))
    # day-0 rows: no past → exact zeros
    assert out[1]["decayed_cnt_q"] == 0 and out[1]["decayed_sum_q"] == 0
    # day-1 row sees day 0 (δ=1): cnt 2, sum 4.0
    assert out[3]["decayed_cnt_q"] == wt[1] * 2
    assert out[3]["decayed_sum_q"] == wt[1] * 4_000_000
    assert out[3]["decayed_cnt"] == pytest.approx(wt[1] * 2 / 65536, abs=1e-6)
    # day-3 row sees day 0 (δ=3) and day 1 (δ=2)
    assert out[4]["decayed_cnt_q"] == wt[3] * 2 + wt[2] * 1
    assert out[4]["decayed_sum_q"] == wt[3] * 4_000_000 + wt[2] * 5_000_000


def test_pit_same_day_excluded_and_horizon_truncates(spark):
    df = _ev(spark, [(1, 0, 7, 1.0), (2, 0, 7, 1.0), (3, 40, 7, 1.0)])
    out = {r["event_id"]: r for r in with_decayed_counts(df, "user_id").collect()}
    # same-day sibling events never contribute (δ ≥ 1)
    assert out[1]["decayed_cnt_q"] == 0 and out[2]["decayed_cnt_q"] == 0
    # day 40 is past the 28-day horizon of day 0 → zero
    assert out[3]["decayed_cnt_q"] == 0


def test_null_key_group_is_real(spark):
    df = _ev(spark, [(1, 0, None, 1.0), (2, 1, None, 1.0), (3, 1, 7, 1.0)])
    out = {r["event_id"]: r for r in with_decayed_counts(df, "user_id").collect()}
    wt = dict(decay_weights(7.0, 28, 16))
    # the NULL-key stratum decays within itself (null-safe join back)
    assert out[2]["decayed_cnt_q"] == wt[1]
    assert out[3]["decayed_cnt_q"] == 0


def test_plan_no_window_over_raw_rows(spark):
    """The raw frame is touched by ONE pre-aggregation; no Window operator,
    no cartesian/nested-loop join anywhere in the plan."""
    df = _ev(spark, [(1, 0, 7, 1.0), (2, 1, 7, 2.0)])
    plan = (
        with_decayed_counts(df, "user_id", value_col="value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_day_index_utc(spark):
    df = spark.createDataFrame([(dt.datetime(1970, 1, 2, 0, 0, 1),)], "ts timestamp")
    assert df.select(day_index(F.col("ts")).alias("d")).collect()[0]["d"] == 1
