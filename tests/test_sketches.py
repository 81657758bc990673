"""Deterministic HyperLogLog sketches (operators/sketches.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ipl_dagster_pipeline_spark.operators.sketches import (
    HLL_M,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


@pytest.fixture(scope="module")
def vals(spark):
    # 3 groups with known cardinalities 5 / 500 / 5000, plus repeats + nulls
    rows = []
    for g, n in (("a", 5), ("b", 500), ("c", 5000)):
        rows += [(g, f"{g}:{i % n}") for i in range(2 * n)]
    rows += [("a", None)] * 7
    return spark.createDataFrame(rows, "g string, v string").cache()


def test_estimate_within_hll_error(vals):
    out = {r["g"]: r for r in hll_distinct(vals, ["g"], F.col("v")).collect()}
    # σ ≈ 1.04/√64 = 13%; assert 3σ
    for g, n in (("a", 5), ("b", 500), ("c", 5000)):
        assert out[g]["hll_est"] == pytest.approx(n, rel=0.39), (g, out[g]["hll_est"])
    # small group in linear-counting regime estimates tiny cardinalities well
    assert out["a"]["hll_est"] == pytest.approx(5, rel=0.05)


def test_sketch_is_bounded_and_duplicate_insensitive(vals, spark):
    sk = hll_sketch(vals, ["g"], F.col("v"))
    per_group = sk.groupBy("g").count().collect()
    assert all(r["count"] <= HLL_M for r in per_group)
    # duplicating the input changes NOTHING (registers are max-stable)
    doubled = hll_sketch(vals.unionAll(vals), ["g"], F.col("v"))
    assert sk.exceptAll(doubled).count() == 0 and doubled.exceptAll(sk).count() == 0


def test_merge_equals_sketch_of_union(vals):
    """The mergeability law the 100-TB shape relies on: sketch(A ∪ B) ==
    max-merge(sketch(A), sketch(B)), EXACTLY (integer registers)."""
    a = vals.filter(F.col("v").isNull() | (F.hash("v") % 2 == 0))
    b = vals.subtract(a.filter(F.col("v").isNotNull())).filter(F.col("v").isNotNull())
    union_sk = hll_sketch(vals.dropDuplicates(["g", "v"]), ["g"], F.col("v"))
    merged = hll_merge(hll_sketch(a, ["g"], F.col("v")), hll_sketch(b, ["g"], F.col("v")))
    assert merged.exceptAll(union_sk).count() == 0
    assert union_sk.exceptAll(merged).count() == 0
    # and the estimates (derived deterministically) agree exactly too
    ea = hll_estimate(union_sk, ["g"]).collect()
    eb = hll_estimate(merged, ["g"]).collect()
    assert sorted(map(tuple, ea)) == sorted(map(tuple, eb))


def test_nulls_skipped_and_empty_input(spark):
    df = spark.createDataFrame([("a", None)], "g string, v string")
    assert hll_sketch(df, ["g"], F.col("v")).count() == 0
    empty = spark.createDataFrame([], "g string, v string")
    assert hll_distinct(empty, ["g"], F.col("v")).count() == 0


def test_plan_single_aggregation_no_join(vals):
    plan = (
        hll_distinct(vals, ["g"], F.col("v"))._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Window" not in plan
    # partial (map-side) aggregation present: two HashAggregate levels per agg
    assert plan.count("HashAggregate") >= 2
