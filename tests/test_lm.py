"""Corpus bigram-LM surprisal: hand-computed MLE on a tiny corpus, integer
milli-nat exactness, and edge totality (empty/short/null text)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from ipl_dagster_pipeline_spark.operators.lm import doc_bigrams, with_bigram_surprisal


def test_doc_bigrams_extraction(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat"), (2, "one"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = [(r.doc_id, r.a, r.b) for r in doc_bigrams(df).orderBy("doc_id", "a").collect()]
    assert got == [(1, "cat", "sat"), (1, "the", "cat")]


def test_surprisal_matches_hand_mle(spark):
    # corpus: "a b" ×3, "a c" ×1  →  C(a)=4, C(a,b)=3, C(a,c)=1
    rows = [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in with_bigram_surprisal(df).collect()}
    mn_ab = round(-math.log(3 / 4) * 1000)  # 288
    mn_ac = round(-math.log(1 / 4) * 1000)  # 1386
    assert out[1].surprisal_mnats == mn_ab and out[1].n_bigrams == 1
    assert out[4].surprisal_mnats == mn_ac
    assert out[4].bits_per_bigram == pytest.approx(mn_ac / 1000 / math.log(2), abs=1e-6)
    # the rare transition IS more surprising
    assert out[4].bits_per_bigram > out[1].bits_per_bigram


def test_surprisal_totality_and_types(spark):
    rows = [(1, "x y x y x"), (2, "solo"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = with_bigram_surprisal(df)
    dt = dict(out.dtypes)
    assert dt["n_bigrams"] == "bigint" and dt["surprisal_mnats"] == "bigint"
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].n_bigrams == 4
    for d in (2, 3, 4):
        assert got[d].n_bigrams == 0 and got[d].surprisal_mnats == 0
        assert got[d].bits_per_bigram is None


def test_surprisal_partitioning_invariant(spark):
    """Integer milli-nat sums are reduction-order-independent: 1 vs 16
    partitions produce identical totals (the float-sum failure mode this
    representation exists to rule out)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        (r.doc_id, r.surprisal_mnats, r.n_bigrams)
        for r in with_bigram_surprisal(docs.coalesce(1)).collect()
    }
    b = {
        (r.doc_id, r.surprisal_mnats, r.n_bigrams)
        for r in with_bigram_surprisal(docs.repartition(16)).collect()
    }
    assert a == b and len(a) == docs.count()


def test_source_kl_divergence_hand_computed(spark):
    """Two groups over a 2-word vocabulary, hand-computable KL; NULL group is
    a real group; identical distribution → KL exactly 0."""
    rows = [
        (1, "x x x y", "s1"),      # P_s1 = (3/4, 1/4)
        (2, "x y y y", "s2"),      # P_s2 = (1/4, 3/4)
        (3, "x x x y", None),      # NULL group, same dist as s1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from ipl_dagster_pipeline_spark.operators.lm import source_kl_divergence

    out = {r.source: r for r in source_kl_divergence(df).collect()}
    assert set(out) == {"s1", "s2", None}
    # corpus: x 7/12, y 5/12.  KL(s1||P) = 3/4 ln(9/7) + 1/4 ln(3/5)
    import math

    mn = lambda r: round(math.log(r) * 1000)  # noqa: E731
    expect_s1 = 3 * mn((3 / 4) * (12 / 7)) + 1 * mn((1 / 4) * (12 / 5))
    assert out["s1"].kl_mnats_weighted == expect_s1
    assert out[None].kl_mnats_weighted == expect_s1  # null group scored too
    assert out["s1"].n_tokens == 4
    assert out["s1"].kl_nats == round(expect_s1 / 1000 / 4, 6)
    # s2 diverges MORE (its majority word is the corpus minority)
    assert out["s2"].kl_nats > out["s1"].kl_nats > 0


def test_source_kl_zero_for_identical_distributions(spark):
    rows = [(i, "a b c", f"s{i % 3}") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from ipl_dagster_pipeline_spark.operators.lm import source_kl_divergence

    for r in source_kl_divergence(df).collect():
        assert r.kl_mnats_weighted == 0 and r.kl_nats == 0.0


def test_pmi_collocations_hand_computed(spark):
    from ipl_dagster_pipeline_spark.operators.lm import pmi_collocations

    df = spark.createDataFrame(
        [(1, "new york is big and new york is old"), (2, "new york new day")],
        "doc_id long, text string",
    )
    out = {(r["a"], r["b"]): r for r in pmi_collocations(df, min_count=2).collect()}
    # corpus: 13 unigrams, 11 bigrams; "new york" occurs 3×, new 4×, york 3×
    r = out[("new", "york")]
    assert (r["c_ab"], r["c_a"], r["c_b"]) == (3, 4, 3)
    expect = math.log(3) - math.log(4) - math.log(3) + 2 * math.log(13) - math.log(11)
    assert r["pmi_mnats"] == round(expect * 1000)
    assert r["pmi"] == pytest.approx(r["pmi_mnats"] / 1000, abs=1e-9)
    # a pair below min_count never appears
    assert ("york", "new") not in out  # c_ab = 1


def test_pmi_threshold_prunes_before_joins_and_empty_total(spark):
    from ipl_dagster_pipeline_spark.operators.lm import pmi_collocations

    with pytest.raises(ValueError):
        pmi_collocations(spark.createDataFrame([], "doc_id long, text string"), min_count=0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pmi_collocations(empty).count() == 0
    one_word = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    assert pmi_collocations(one_word).count() == 0
