"""SCD2 history building + MERGE-upsert snapshot maintenance."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from ipl_dagster_pipeline_spark.operators.dimensions import merge_upsert, scd2_history


def _ts(day: int, sec: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, 0, 0, sec)


def test_scd2_collapses_noop_changes_and_builds_intervals(spark):
    rows = [
        # key A: x -> x (no-op, collapsed) -> y -> y (no-op) -> x
        ("A", _ts(1), 1, "x"),
        ("A", _ts(2), 2, "x"),
        ("A", _ts(3), 3, "y"),
        ("A", _ts(4), 4, "y"),
        ("A", _ts(5), 5, "x"),
        # key B: single event -> one open version
        ("B", _ts(2), 6, "z"),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, attr string")
    got = {
        (r.k, r.version): (r.attr, r.valid_from, r.valid_to)
        for r in scd2_history(df, ["k"], "ts", ["attr"], tie_cols=["eid"]).collect()
    }
    assert got[("A", 1)] == ("x", _ts(1), _ts(3))
    assert got[("A", 2)] == ("y", _ts(3), _ts(5))
    assert got[("A", 3)] == ("x", _ts(5), None)
    assert got[("B", 1)] == ("z", _ts(2), None)
    assert len(got) == 4


def test_scd2_null_attrs_and_multi_attr_change_detection(spark):
    rows = [
        # null -> null is a no-op (null-safe compare); null -> value is a change;
        # a change in EITHER attr opens a version
        ("A", _ts(1), 1, None, 10),
        ("A", _ts(2), 2, None, 10),
        ("A", _ts(3), 3, "v", 10),
        ("A", _ts(4), 4, "v", 20),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, a1 string, a2 int")
    out = scd2_history(df, ["k"], "ts", ["a1", "a2"], tie_cols=["eid"]).collect()
    assert [(r.version, r.a1, r.a2) for r in sorted(out, key=lambda r: r.version)] == [
        (1, None, 10),
        (2, "v", 10),
        (3, "v", 20),
    ]
    with pytest.raises(ValueError, match="attr_cols"):
        scd2_history(df, ["k"], "ts", [])


def test_scd2_tiebreak_is_deterministic(spark):
    # two changes in the SAME timestamp: eid orders them
    rows = [("A", _ts(1), 2, "second"), ("A", _ts(1), 1, "first")]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, attr string")
    out = sorted(
        scd2_history(df, ["k"], "ts", ["attr"], tie_cols=["eid"]).collect(),
        key=lambda r: r.version,
    )
    assert [(r.version, r.attr) for r in out] == [(1, "first"), (2, "second")]
    assert out[0].valid_to == out[1].valid_from == _ts(1)


def test_merge_upsert_update_insert_delete_precedence(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, v string, seq int"
    )
    updates = spark.createDataFrame(
        [
            (1, "a2", 11, False),  # update
            (1, "a3", 12, False),  # later update wins (seq order)
            (4, "d", 40, False),   # insert
            (2, "b", 21, True),    # delete
        ],
        "k int, v string, seq int, is_del boolean",
    )
    got = {
        r.k: (r.v, r.seq)
        for r in merge_upsert(
            target, updates, ["k"], order_col="seq", delete_col="is_del"
        ).collect()
    }
    assert got == {1: ("a3", 12), 3: ("c", 30), 4: ("d", 40)}


def test_merge_upsert_late_stale_update_does_not_regress(spark):
    """order_col is compared ACROSS target and updates (advice r4 #2): a
    late-arriving change file carrying STALE sequence numbers must not
    regress a key the target already advanced past; equal order_col ties
    break toward the update (idempotent replay of the same change)."""
    target = spark.createDataFrame([(1, "new", 50), (2, "b", 20)], "k int, v string, seq int")
    updates = spark.createDataFrame(
        [
            (1, "stale", 30, False),  # older than target seq 50 → target wins
            (2, "b2", 20, False),     # tie with target seq 20 → update wins
        ],
        "k int, v string, seq int, is_del boolean",
    )
    got = {
        r.k: (r.v, r.seq)
        for r in merge_upsert(target, updates, ["k"], order_col="seq", delete_col="is_del").collect()
    }
    assert got == {1: ("new", 50), 2: ("b2", 20)}


def test_merge_upsert_schema_mismatch_fails_loudly(spark):
    t = spark.createDataFrame([(1, "a")], "k int, v string")
    u = spark.createDataFrame([(1, "a", 9)], "k int, v string, extra int")
    with pytest.raises(ValueError, match="schemas differ"):
        merge_upsert(t, u, ["k"])


def test_merge_upsert_null_delete_flag_means_keep(spark):
    t = spark.createDataFrame([(1, "a")], "k int, v string")
    u = spark.createDataFrame(
        [(1, "a2", None), (2, "b", None)], "k int, v string, is_del boolean"
    )
    got = {r.k: r.v for r in merge_upsert(t, u, ["k"], delete_col="is_del").collect()}
    assert got == {1: "a2", 2: "b"}


def test_merge_upsert_shuffles_once_no_cross_join(spark):
    t = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k int, v string")
    u = spark.createDataFrame([(i, f"u{i}") for i in range(0, 100, 2)], "k int, v string")
    out = merge_upsert(t, u, ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert out.count() == 100
    got = {r.k: r.v for r in out.collect()}
    assert got[2] == "u2" and got[3] == "v3"
