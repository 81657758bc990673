"""Token-window chunking (operators/chunking.py)."""

from __future__ import annotations

import pytest

from ipl_dagster_pipeline_spark.operators.chunking import chunk_token_windows


def test_chunk_windows_cover_stream_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(1, 11))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_token_windows(df, chunk_size=4, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 2 → starts 1,3,5,7,9; final windows clip
    assert [(r["chunk_idx"], r["start_tok"], r["n_chunk_tokens"]) for r in rows] == [
        (0, 1, 4), (1, 3, 4), (2, 5, 4), (3, 7, 4), (4, 9, 2),
    ]
    assert rows[0]["chunk_text"] == "t1 t2 t3 t4"
    assert rows[4]["chunk_text"] == "t9 t10"
    # every token appears in some window (no tail loss)
    covered = set()
    for r in rows:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"t{i}" for i in range(1, 11)}


def test_chunk_null_text_and_short_doc(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "only two"), (3, "")], "doc_id long, text string"
    )
    rows = chunk_token_windows(df, chunk_size=4, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc  # NULL text → zero windows
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 2
    # empty string splits to [''] — one empty-token window (same as DuckDB)
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_text"] == ""


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_token_windows(df, chunk_size=4, overlap=4)
    with pytest.raises(ValueError, match="chunk_size"):
        chunk_token_windows(df, chunk_size=0, overlap=0)
