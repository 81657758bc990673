"""Similarity search over embedding columns (array<float>).

* ``cosine_topk_bruteforce`` — exact baseline: broadcast the (small) query
  set, JVM-side dot products via ``F.zip_with`` + ``F.aggregate`` (sequential
  left-to-right summation — bit-reproducible in any engine that sums in list
  order, which the DuckDB oracle does), rank per query.
* ``lsh_topk`` — the scale path: sign-random-projection (hyperplane) LSH.
  Hyperplanes are DERIVED FROM THE PORTABLE HASH (no RNG, no driver data):
  plane p's component for dimension d is ±1 by a hash bit.  Candidates =
  same bucket; exact cosine re-rank inside buckets.  At 100 TB the bucket
  join replaces the O(N·Q) cross product with an equi-join on bucket id.

All arithmetic in double (cast from float32 FIRST on both engines, so the
widening happens at the same point).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_dedup import portable_hash


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential in-order dot product (reproducible summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Queries are a broadcast dim (J1 pattern); candidates every other vector.
    Ranking rounds to 6 dp BEFORE ranking with vec_id tie-break, so ranking
    is stable across engines/float orders.
    """
    from pyspark.sql import Window

    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    pairs = base.join(F.broadcast(q), F.col(id_col) != F.col("query_id")).withColumn(
        "cos", F.round(cosine(F.col("qv"), F.col("v")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cos", F.col("rnk").cast("int").alias("rnk"))
    )


def hyperplane_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Deterministic sign-random-projection bucket id (0 .. 2^n_planes-1).

    Plane p, dim d sign = ±1 from bit (d % 60) of portable_hash("p", p||d).
    No RNG state — identical on every executor, run, and engine.
    """
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.lit(0.0)
        # fold the vector against the hash-sign plane, JVM-side
        signs = [
            1 if (0x9E3779B97F4A7C15 * (p * dim + d + 1)) % 2 == 0 else -1  # deterministic int math
            for d in range(dim)
        ]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane bucket, exact
    cosine re-rank within bucket.  Recall measured in tests vs brute force."""
    from pyspark.sql import Window

    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v")).withColumn(
        "bucket", hyperplane_bucket(F.col("v"), n_planes, dim)
    )
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("bucket")
    )
    pairs = base.join(F.broadcast(q), on="bucket").filter(F.col(id_col) != F.col("query_id"))
    pairs = pairs.withColumn("cos", F.round(cosine(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cos", F.col("rnk").cast("int").alias("rnk"))
    )
