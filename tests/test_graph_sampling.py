"""Connected components (duplicate groups) + deterministic hash split."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ipl_dagster_pipeline_spark.operators.graph import connected_components, duplicate_groups
from ipl_dagster_pipeline_spark.operators.sampling import hash_split


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3, needs multiple rounds), pair 10-11, and
    # a triangle 20-21-22 with a redundant edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["src", "dst"],
    )
    comp = {r.v: r.comp for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_path_converges(spark):
    # path 0-1-...-30: worst-case diameter for label propagation; must still
    # converge within max_rounds and label everything with 0
    edges = spark.createDataFrame([(i, i + 1) for i in range(30)], ["src", "dst"])
    comp = connected_components(edges, max_rounds=40).collect()
    assert all(r.comp == 0 for r in comp)
    assert len(comp) == 31


def test_connected_components_deep_chain_default_rounds(spark):
    """Pointer jumping: a 300-hop path (diameter far above the round budget
    of plain one-hop propagation) converges within the DEFAULT max_rounds —
    the silent-split hazard of the one-hop formulation is gone."""
    edges = spark.createDataFrame([(i, i + 1) for i in range(300)], ["src", "dst"])
    comp = connected_components(edges).collect()  # default max_rounds=25
    assert len(comp) == 301
    assert all(r.comp == 0 for r in comp)


def test_connected_components_raises_on_nonconvergence(spark):
    from ipl_dagster_pipeline_spark.operators.graph import ComponentsNotConverged

    edges = spark.createDataFrame([(i, i + 1) for i in range(60)], ["src", "dst"])
    with pytest.raises(ComponentsNotConverged, match="did not converge"):
        connected_components(edges, max_rounds=1)


def test_duplicate_groups_keeper_rule(spark):
    pairs = spark.createDataFrame([(7, 3), (3, 9), (100, 50)], ["doc_a", "doc_b"])
    got = {r.member: (r.keeper, r.is_keeper) for r in duplicate_groups(pairs).collect()}
    assert got == {
        3: (3, True),
        7: (3, False),
        9: (3, False),
        50: (50, True),
        100: (50, False),
    }


def test_hash_split_is_deterministic_and_proportional(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    a = hash_split(df, "k").groupBy("split").count().collect()
    fracs = {r.split: r["count"] / 20000 for r in a}
    assert abs(fracs["train"] - 0.9) < 0.02
    assert abs(fracs["val"] - 0.05) < 0.01
    assert abs(fracs["test"] - 0.05) < 0.01
    # identical assignment under different parallelism (pure projection)
    b = hash_split(df.repartition(17), "k").select("k", "split")
    assert b.join(hash_split(df, "k").select("k", F.col("split").alias("s2")), "k").filter(
        F.col("split") != F.col("s2")
    ).count() == 0


def test_hash_split_validates_fractions(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "k", fractions={"a": 0.5, "b": 0.6})


def test_global_cumsum_matches_single_partition(spark):
    """Two-phase distributed prefix sum == the naive global window, at any
    partitioning, including many partitions of skewed sizes."""
    from pyspark.sql import Window

    from ipl_dagster_pipeline_spark.operators.packing import with_global_cumsum

    df = (
        spark.range(0, 5000)
        .withColumnRenamed("id", "k")
        .withColumn("v", (F.col("k") % 37 + 1).cast("long"))
        .repartition(23)  # deliberately scrambled input layout
    )
    got = {
        r.k: r.cumsum
        for r in with_global_cumsum(df, "k", "v", n_partitions=13).collect()
    }
    exp = {
        r.k: r.c
        for r in df.withColumn(
            "c",
            F.sum("v").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ).collect()
    }
    assert got == exp


def test_global_cumsum_many_partitions_uses_broadcast_offsets(spark):
    """At n_partitions=256 the offsets must be a broadcast join, never a
    256-arm CASE chain (which falls out of codegen at real partition counts),
    and values must still equal the single-partition cumsum."""
    from pyspark.sql import Window

    from ipl_dagster_pipeline_spark.operators.packing import with_global_cumsum

    df = (
        spark.range(0, 4000)
        .withColumnRenamed("id", "k")
        .withColumn("v", (F.col("k") % 11 + 1).cast("long"))
    )
    out = with_global_cumsum(df, "k", "v", n_partitions=256)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CASE WHEN" not in plan
    assert "Broadcast" in plan
    got = {r.k: r.cumsum for r in out.collect()}
    exp = {
        r.k: r.c
        for r in df.withColumn(
            "c",
            F.sum("v").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ).collect()
    }
    assert got == exp


def test_pack_sequences_intervals_are_contiguous(spark):
    from ipl_dagster_pipeline_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, (i * 131) % 700 + 1) for i in range(200)], ["doc_id", "n_tokens"]
    )
    out = pack_sequences(df, seq_len=512).orderBy("doc_id").collect()
    # intervals tile the stream exactly: start_i == end_{i-1}, width == n_tokens
    prev_end = 0
    for r in out:
        assert r.tok_start == prev_end
        assert r.tok_end - r.tok_start == r.n_tokens
        assert r.first_chunk == r.tok_start // 512
        assert r.last_chunk == (r.tok_end - 1) // 512
        prev_end = r.tok_end


def test_sample_stratified_fractions_and_determinism(spark):
    from ipl_dagster_pipeline_spark.operators.sampling import sample_stratified

    df = (
        spark.range(0, 30000)
        .withColumnRenamed("id", "k")
        .withColumn("s", F.when(F.col("k") % 3 == 0, "a").when(F.col("k") % 3 == 1, "b").otherwise("c"))
    )
    out = sample_stratified(df, "s", "k", {"a": 0.5, "b": 1.0}, default_fraction=0.1)
    got = {r.s: r["count"] for r in out.groupBy("s").count().collect()}
    assert abs(got["a"] / 10000 - 0.5) < 0.03
    assert got["b"] == 10000  # fraction 1.0 keeps everything
    assert abs(got["c"] / 10000 - 0.1) < 0.02
    # identical sample under different parallelism (pure projection + filter)
    again = set(r.k for r in sample_stratified(df.repartition(17), "s", "k", {"a": 0.5, "b": 1.0}, 0.1).select("k").collect())
    assert again == set(r.k for r in out.select("k").collect())
    # monotone: raising a stratum's fraction only ADDS rows (nested samples)
    smaller = set(r.k for r in sample_stratified(df, "s", "k", {"a": 0.2, "b": 1.0}, 0.1).filter("s = 'a'").select("k").collect())
    larger = set(r.k for r in out.filter("s = 'a'").select("k").collect())
    assert smaller <= larger


def test_sample_stratified_validates_fractions(spark):
    from ipl_dagster_pipeline_spark.operators.sampling import sample_stratified

    df = spark.range(5).withColumnRenamed("id", "k").withColumn("s", F.lit("a"))
    with pytest.raises(ValueError, match="must be in"):
        sample_stratified(df, "s", "k", {"a": 1.5})
