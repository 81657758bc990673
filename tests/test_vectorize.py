"""Frequency encoding (encoding.py) and frozen-vocab TF-IDF (vectorize.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ipl_dagster_pipeline_spark.operators.encoding import (
    count_encode_fit,
    count_encode_transform,
)
from ipl_dagster_pipeline_spark.operators.vectorize import tfidf_transform, vocab_fit


def test_count_encode_null_category_and_unseen_zero(spark):
    train = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)], "id long, k string"
    )
    fit = count_encode_fit(train, "k")
    score = spark.createDataFrame(
        [(10, "a"), (11, None), (12, "NEVER")], "id long, k string"
    )
    out = {r["id"]: (r["ce_cnt"], r["ce_ppm"]) for r in
           count_encode_transform(score, fit, "k").collect()}
    assert out[10] == (2, 500_000)       # 2/4 exact ppm
    assert out[11] == (1, 250_000)       # NULL is a fit category
    assert out[12] == (0, 0)             # unseen-at-fit → 0, not NULL
    with pytest.raises(ValueError, match="empty fit"):
        count_encode_fit(train.limit(0), "k")


def test_vocab_fit_rank_is_total_and_frozen(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple cherry date"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    vocab = {r["term"]: r for r in vocab_fit(docs, 3).collect()}
    # df: apple=2, banana=2, cherry=2, date=1 → ties break on term ASC,
    # so the size-3 vocabulary is apple(1), banana(2), cherry(3)
    assert {t: v["term_idx"] for t, v in vocab.items()} == {
        "apple": 1, "banana": 2, "cherry": 3
    }
    assert all(v["n_fit_docs"] == 4 for v in vocab.values())  # NULL-text doc still counted


def test_tfidf_transform_sparse_exact_weights(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple cherry date"), (4, None)],
        "doc_id long, text string",
    )
    vocab = vocab_fit(docs, 3)
    rows = tfidf_transform(docs, vocab).collect()
    by = {(r["doc_id"], r["term"]): r for r in rows}
    # doc 1: apple tf=2, idf_ppm = (4+1)*1e6 DIV (2+1) = 1_666_666
    assert by[(1, "apple")]["tf"] == 2
    assert by[(1, "apple")]["weight"] == 2 * 1_666_666
    # date is out-of-vocabulary → dropped; NULL doc → zero rows
    assert (3, "date") not in by
    assert not [r for r in rows if r["doc_id"] == 4]
    with pytest.raises(ValueError, match="vocab_size"):
        vocab_fit(docs, 0)
