"""Streaming SCD1 dimension maintenance == batch merge of all changes."""

from __future__ import annotations

import pyspark.sql.functions as F

from ipl_dagster_pipeline_spark.io import SnapshotTable
from ipl_dagster_pipeline_spark.streaming.dimension_stream import stream_dimension_upsert


def _snap(spark, path):
    return {r.k: (r.v, r.seq) for r in SnapshotTable(path).read(spark).collect()}


def test_streaming_dimension_upsert_matches_batch_merge(spark, tmp_path):
    input_dir = str(tmp_path / "changes")
    table = str(tmp_path / "dim")
    ck = str(tmp_path / "ck")

    wave1 = spark.createDataFrame(
        [(1, "a", 1, False), (2, "b", 2, False), (1, "a2", 3, False)],
        "k int, v string, seq int, is_del boolean",
    )
    wave1.write.mode("overwrite").parquet(input_dir)
    stream_dimension_upsert(
        spark, input_dir, table, ["k"], "seq", ck, delete_col="is_del"
    ).awaitTermination()
    assert _snap(spark, table) == {1: ("a2", 3), 2: ("b", 2)}
    first_id = SnapshotTable(table).current_snapshot_id()

    # wave 2 lands as a new file: update k=2, insert k=3, delete k=1
    wave2 = spark.createDataFrame(
        [(2, "b2", 4, False), (3, "c", 5, False), (1, "gone", 6, True)],
        "k int, v string, seq int, is_del boolean",
    )
    wave2.write.mode("append").parquet(input_dir)
    stream_dimension_upsert(
        spark, input_dir, table, ["k"], "seq", ck, delete_col="is_del"
    ).awaitTermination()
    assert _snap(spark, table) == {2: ("b2", 4), 3: ("c", 5)}
    assert SnapshotTable(table).current_snapshot_id() != first_id

    # catch-up with nothing new: no batch fires, no empty-commit churn
    before = SnapshotTable(table).current_snapshot_id()
    stream_dimension_upsert(
        spark, input_dir, table, ["k"], "seq", ck, delete_col="is_del"
    ).awaitTermination()
    assert SnapshotTable(table).current_snapshot_id() == before

    # the maintained snapshot equals a single batch merge over ALL changes:
    # latest change per key wins, deletes drop the key
    all_changes = spark.read.parquet(input_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    latest = (
        all_changes.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND NOT is_del")
        .select("k", "v", "seq")
    )
    assert _snap(spark, table) == {r.k: (r.v, r.seq) for r in latest.collect()}
