"""Corpus cleaning: repetition collapse, quality gate, PII, decontamination."""

from __future__ import annotations

import pyspark.sql.functions as F

from ipl_dagster_pipeline_spark.operators.cleaning import (
    collapse_adjacent_repeats,
    contamination_flags,
    quality_gate,
    redact_pii,
)


def test_collapse_adjacent_repeats(spark):
    df = spark.createDataFrame(
        [(1, "a a the the the cat cat sat"), (2, "no repeats here"), (3, "x")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.text_clean for r in collapse_adjacent_repeats(df).collect()}
    assert got == {1: "a the cat sat", 2: "no repeats here", 3: "x"}


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org call +49 171 123-4567 host 10.0.0.1 ok")],
        ["doc_id", "text"],
    )
    out = df.select(redact_pii(F.col("text")).alias("t")).collect()[0].t
    assert "<EMAIL>" in out and "<PHONE>" in out and "<IP>" in out
    assert "bob" not in out and "171" not in out and "10.0.0.1" not in out


def test_quality_gate_flags(spark):
    rows = [
        # doc_id, n_ws_tokens, alpha_ratio, punct_ratio, mean_word_len
        (1, 50, 0.8, 0.05, 4.5),   # clean
        (2, 3, 0.8, 0.05, 4.5),    # too short
        (3, 50, 0.2, 0.05, 4.5),   # low alpha
        (4, 50, 0.8, 0.5, 4.5),    # high punct
        (5, 50, 0.8, 0.05, 20.0),  # word len
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "n_ws_tokens", "alpha_ratio", "punct_ratio", "mean_word_len"]
    )
    got = {r.doc_id: r.passes_quality for r in quality_gate(df).collect()}
    assert got == {1: True, 2: False, 3: False, 4: False, 5: False}


def test_contamination_flags_exact_and_copy(spark):
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog again and again tonight")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (10, "prefix words then the quick brown fox jumps over the lazy dog again and again tonight"),
            (11, "completely unrelated content about spark shuffles and window frames in engines"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.contaminated for r in contamination_flags(corpus, bench, k=30).collect()}
    assert got == {10: True, 11: False}
