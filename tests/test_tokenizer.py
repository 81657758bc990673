"""Real-BPE token counting: Spark replace-chain vs an INDEPENDENT pure-Python
reference of the same sequential-merge algorithm, plus contract properties."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ipl_dagster_pipeline_spark.operators.tokenizer import (
    BPE_MERGES,
    bpe_token_count,
    with_bpe_token_counts,
)


def ref_bpe_symbols(word: str) -> list[str]:
    """Independent reference: list-of-symbols scan, one leftmost
    non-overlapping pass per merge rule, rules in merge-list order."""
    syms = list(word)
    for a, b in BPE_MERGES:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


WORDS = [
    "the", "that", "then", "there", "and", "standard", "with", "within",
    "performance", "internationalization", "a", "x", "zz", "thth", "atat",
    "ing", "error", "0000", "10000", "20200", "o0o0", "running",
]


def test_spark_bpe_matches_independent_reference(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    got = {r.w: r.n for r in df.select("w", bpe_token_count(F.col("w")).alias("n")).collect()}
    for w in WORDS:
        assert got[w] == len(ref_bpe_symbols(w)), (w, got[w], ref_bpe_symbols(w))


def test_bpe_merge_actually_compresses(spark):
    df = spark.createDataFrame([("the",), ("qqq",)], "w string")
    got = {r.w: r.n for r in df.select("w", bpe_token_count(F.col("w")).alias("n")).collect()}
    assert got["the"] == 1        # t+h → th, th+e → the
    assert got["qqq"] == 3        # no merge applies → chars


def test_with_bpe_token_counts_sums_occurrences(spark):
    rows = [
        (1, "the the and"),          # 1 + 1 + 1
        (2, "THE, the!"),            # case-folded + punctuation carries none
        (3, ""),                     # no words → 0
        (4, None),                   # null text → 0
        (5, "zqj"),                  # unmergeable → len(word)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_bpe_tokens for r in with_bpe_token_counts(df).collect()}
    assert got == {1: 3, 2: 2, 3: 0, 4: 0, 5: 3}


def test_bpe_counts_bounded_and_positive(spark, docs=None):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = with_bpe_token_counts(df).select(
        "doc_id",
        "n_bpe_tokens",
        F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")).alias("n_word_chars"),
    )
    bad = out.filter(
        (F.col("n_bpe_tokens") > F.col("n_word_chars"))
        | ((F.col("n_word_chars") > 0) & (F.col("n_bpe_tokens") < 1))
    )
    assert bad.count() == 0
    # merges actually bite on natural-ish text: strictly fewer tokens than chars
    agg = out.agg(F.sum("n_bpe_tokens").alias("t"), F.sum("n_word_chars").alias("c")).collect()[0]
    assert agg.t < agg.c


def test_bpe_plan_has_no_python_stage(spark):
    """The tokenizer is the JVM replace chain — no Arrow/Python eval in the
    vocabulary projection (that is the point of the sequential variant)."""
    df = spark.createDataFrame([(1, "the quick fox")], "doc_id long, text string")
    plan = with_bpe_token_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
