"""Streaming feature serving: the frozen fits inline as literals, so every
*_transform runs unchanged inside a readStream plan (no stream-side join),
and the streamed features are row-identical to the batch transform — the
train/serve parity the fit/transform family exists for."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ipl_dagster_pipeline_spark.operators.featurize import (
    clip_transform,
    fit_literals,
    impute_transform,
    one_hot,
    quantile_bins_fit,
    quantile_bins_transform,
    quantile_fit_elements,
    standardize_fit,
    standardize_transform,
)


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve_in"))
    rows = [(i, None if i % 9 == 0 else float(i % 50), "a" if i % 3 else "b")
            for i in range(200)]
    batch = spark.createDataFrame(rows, "id long, x double, cat string")
    batch.write.mode("overwrite").parquet(d)
    return batch, d


def _transform(df, lits_scaler, lits_edges, lits_fit):
    out = impute_transform(df, lits_fit, ["x"])
    out = clip_transform(out, lits_fit, "x", out_col="x_winsor")
    out = standardize_transform(out, lits_scaler, ["x"])
    out = quantile_bins_transform(out, lits_edges, "x", 4)
    return one_hot(out, "cat", ["a"], prefix="oh")


def test_streamed_features_match_batch(spark, served):
    batch, d = served
    train = batch.where("id % 5 != 4")  # a "train fold"
    lits_scaler = fit_literals(standardize_fit(train, ["x"]))
    lits_edges = fit_literals(quantile_bins_fit(train, "x", "id", 4))
    lits_fit = fit_literals(quantile_fit_elements(
        train, "x", "id", {"imp_x": 50, "clip_lo": 5, "clip_hi": 95}))

    expected = {r["id"]: r for r in
                _transform(batch, lits_scaler, lits_edges, lits_fit).collect()}

    stream = spark.readStream.schema("id long, x double, cat string").parquet(d)
    out = _transform(stream, lits_scaler, lits_edges, lits_fit)
    assert out.isStreaming  # literal inlining kept the plan streamable
    q = (out.writeStream.format("memory").queryName("served_feats")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r["id"]: r for r in spark.sql("SELECT * FROM served_feats").collect()}

    assert len(got) == len(expected) == 200
    cols = ["x", "x_winsor", "z_x", "qb_x", "oh_a", "oh_other"]
    for i, exp in expected.items():
        for c in cols:
            assert got[i][c] == exp[c], (i, c, got[i][c], exp[c])


def test_fit_literals_guards(spark, served):
    batch, _ = served
    with pytest.raises(ValueError, match="exactly one row"):
        fit_literals(batch)
    with pytest.raises(ValueError, match="missing keys"):
        standardize_transform(batch, {"n_x": 1}, ["x"])
