"""Sequence packing for pretraining pipelines: concat-and-chunk.

The standard GPT-style packing concatenates the token stream in a canonical
document order and slices it into fixed-length examples.  The hard part at
100 TB is the GLOBAL running token offset — a naive
``Window.orderBy(doc_id)`` with no partition key plans a single-partition
window (one task owns the whole corpus).  ``with_global_cumsum`` computes it
scalably with the classic two-phase distributed prefix sum:

1. range-partition + sort by the order key (the layout a packed write wants
   anyway);
2. LOCAL cumulative sums per partition (ordinary partitioned window);
3. per-partition totals (one row per partition) → driver (bounded by the
   partition count, never by data) → broadcast prefix offsets;
4. global offset = partition prefix + local cumsum.

``pack_sequences`` then maps each document to its token interval and chunk
span — every downstream loader can slice example ``k`` as tokens
``[k*seq_len, (k+1)*seq_len)`` of the concatenated stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..caching import tracked_persist


def with_global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` in ``order_col`` order,
    without a single-partition window.

    The driver round-trip is one row PER PARTITION (bounded, not data-sized);
    ties on ``order_col`` across partition boundaries are fine because range
    partitioning puts equal keys in one partition.
    """
    rp = (
        df.repartitionByRange(n_partitions, F.col(order_col))
        if n_partitions
        else df.repartitionByRange(F.col(order_col))
    )
    local = rp.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__local",
        F.sum(value_col).over(
            Window.partitionBy("__pid").orderBy(order_col).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    local = tracked_persist(local)
    totals = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid").agg(F.sum(value_col).alias("t")).collect()
    }
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    # partition offsets as a BROADCAST-joined tiny frame, not a CASE chain:
    # a when-chain over 10^4-10^5 range partitions blows past the codegen
    # expression-tree limits (interpreted fallback + bloated plans); the
    # hash join against a P-row broadcast table is O(1) per row at any P.
    offsets_schema = T.StructType(
        [
            T.StructField("__pid", T.IntegerType(), False),
            T.StructField("__offset", T.LongType(), False),
        ]
    )
    offsets = df.sparkSession.createDataFrame(
        [(int(pid), int(off)) for pid, off in prefix.items()], offsets_schema
    )
    return (
        local.join(F.broadcast(offsets), on="__pid", how="left")
        .withColumn(
            out_col,
            (F.coalesce(F.col("__offset"), F.lit(0)) + F.col("__local")).cast("long"),
        )
        .drop("__pid", "__local", "__offset")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
) -> DataFrame:
    """Concat-and-chunk packing manifest: each document's interval in the
    concatenated token stream and the chunk span it lands in.

    Output per doc: ``tok_start`` (inclusive), ``tok_end`` (exclusive),
    ``first_chunk`` / ``last_chunk`` (chunks of ``seq_len`` tokens the doc
    overlaps), ``n_chunks_spanned``.  Deterministic: stream order is
    ``id_col`` ascending.
    """
    cum = with_global_cumsum(docs, order_col=id_col, value_col=token_count_col, out_col="__cum")
    return cum.select(
        id_col,
        F.col(token_count_col),
        (F.col("__cum") - F.col(token_count_col)).alias("tok_start"),
        F.col("__cum").alias("tok_end"),
        F.floor((F.col("__cum") - F.col(token_count_col)) / seq_len).cast("long").alias("first_chunk"),
        F.floor((F.col("__cum") - 1) / seq_len).cast("long").alias("last_chunk"),
    ).withColumn(
        "n_chunks_spanned", (F.col("last_chunk") - F.col("first_chunk") + 1).cast("long")
    )
