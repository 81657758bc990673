"""Training-data ops: dedup quality, ANN recall, multimodal plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ipl_dagster_pipeline_spark.operators.multimodal import (
    decode_media,
    latest_media_per_source,
    synthesize_media,
)
from ipl_dagster_pipeline_spark.operators.similarity import cosine_topk_bruteforce, lsh_topk
from ipl_dagster_pipeline_spark.operators.text_dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    simhash,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


def test_exact_dedup_finds_planted_duplicates(spark, docs):
    # plant exact dups: re-append 10 docs with new ids
    dupes = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 100000)
    with_dupes = docs.unionByName(dupes)
    groups = exact_dedup(with_dupes)
    assert groups.filter("n_copies = 2").count() == 10
    # keeper is always the smallest id (the original)
    assert groups.filter("n_copies = 2").filter("keep_id >= 100000").count() == 0


def test_minhash_finds_near_dups_and_respects_threshold(docs):
    pairs = minhash_lsh_dedup(docs, threshold=0.5).toPandas()
    assert len(pairs) > 0, "sf0.001 documents contain mutated copies"
    assert (pairs["jaccard"] >= 0.5).all()


def test_minhash_finds_planted_mutation(spark, docs):
    # a doc plus itself with one word changed must pair with high jaccard
    mutated = docs.limit(1).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    pairs = minhash_lsh_dedup(docs.unionByName(mutated), threshold=0.5)
    hit = pairs.filter((F.col("doc_a") == 0) & (F.col("doc_b") == 200000)).collect()
    assert hit and hit[0].jaccard > 0.8


def test_simhash_similar_docs_close_hamming(spark, docs):
    sig = simhash(docs)
    mutated = docs.filter("doc_id = 0").select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    both = simhash(docs.filter("doc_id = 0").unionByName(mutated)).collect()
    a, b = both[0].simhash, both[1].simhash
    hamming = bin(a ^ b).count("1")
    assert hamming <= 3  # near-identical docs → near-identical signatures


def test_lsh_topk_recall_vs_bruteforce(emb):
    qids = list(range(20))
    bf = cosine_topk_bruteforce(emb, qids, k=5).toPandas()
    ann = lsh_topk(emb, qids, k=5, n_planes=4).toPandas()
    bf_set = set(zip(bf.query_id, bf.neighbor_id))
    ann_set = set(zip(ann.query_id, ann.neighbor_id))
    recall = len(bf_set & ann_set) / len(bf_set)
    # 4 planes → 16 buckets over 500 vecs; random-ish embeddings: modest recall
    assert recall > 0.2, f"recall {recall}"
    # every ANN rank-1 cosine must be <= brute force rank-1 (it's a subset search)
    bf1 = bf[bf.rnk == 1].set_index("query_id").cos
    ann1 = ann[ann.rnk == 1].set_index("query_id").cos
    common = bf1.index.intersection(ann1.index)
    assert (ann1[common] <= bf1[common] + 1e-9).all()


def test_media_decode_plumbing(docs):
    media = synthesize_media(docs)
    feats = decode_media(media, fake=True)
    pdf = feats.toPandas()
    assert len(pdf) == docs.count()
    img = pdf[pdf.media_type == "image"]
    assert img.width.notna().all() and img.duration_s.isna().all()
    aud = pdf[pdf.media_type == "audio"]
    assert aud.width.isna().all() and aud.duration_s.notna().all()
    assert pdf.content_hash.notna().all()


def test_media_decode_real_path_is_stubbed(docs):
    media = synthesize_media(docs)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_media(media, fake=False).collect()


def test_latest_media_per_source(docs):
    media = synthesize_media(docs)
    latest = latest_media_per_source(media)
    assert latest.count() == 3  # one source × 3 media types
    assert latest.agg(F.sum("n_items")).collect()[0][0] == docs.count()
