"""Sequence packing for pretraining pipelines: concat-and-chunk.

The standard GPT-style packing concatenates the token stream in a canonical
document order and slices it into fixed-length examples.  The hard part at
100 TB is the GLOBAL running token offset — a naive
``Window.orderBy(doc_id)`` with no partition key plans a single-partition
window (one task owns the whole corpus).  ``with_global_cumsum`` computes it
scalably with the classic two-phase distributed prefix sum:

1. range-partition + sort by the order key (the layout a packed write wants
   anyway);
2. LOCAL cumulative sums per partition in one vectorized Arrow pass riding
   that sort (a partitioned window would re-exchange the whole corpus — see
   ``_stamped_local_cumsum``);
3. per-partition totals (one row per partition) → driver (bounded by the
   partition count, never by data) → broadcast prefix offsets;
4. global offset = partition prefix + local cumsum.

``pack_sequences`` then maps each document to its token interval and chunk
span — every downstream loader can slice example ``k`` as tokens
``[k*seq_len, (k+1)*seq_len)`` of the concatenated stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..caching import tracked_persist


def _stamped_local_cumsum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    n_partitions: int | None,
) -> DataFrame:
    """Range-partition on (group, order), sort within partitions, and stamp
    each row with ``__pid`` and its per-(partition, group) running sum
    ``__local`` in ONE vectorized Arrow pass.

    A ``Window.partitionBy(__pid)`` would do the same arithmetic but Catalyst
    cannot prove range partitioning satisfies the window's required
    distribution, so it inserts a SECOND full-data hash exchange on
    ``(group, __pid)`` — at 100 TB that is the whole corpus shuffled twice.
    The mapInPandas pass rides the in-partition sort directly: zero extra
    exchange, no window sort, batch-wise cumsum with a carry across Arrow
    batches (groups are contiguous after the sort, so only the boundary group
    carries).
    """
    cols = [F.col(c) for c in group_cols + order_cols]
    rp = df.repartitionByRange(n_partitions, *cols) if n_partitions else df.repartitionByRange(*cols)
    srt = rp.sortWithinPartitions(*cols)
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, f.nullable) for f in srt.schema.fields]
        + [
            T.StructField("__pid", T.IntegerType(), False),
            T.StructField("__local", T.LongType(), True),
        ]
    )
    gcols, vcol = list(group_cols), value_col

    def gen(batches):
        import numpy as np
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        carry_key: object = object()  # sentinel: equal to no real key
        carry = 0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            pdf = pdf.copy()
            vals = pdf[vcol].fillna(0).astype("int64")
            if gcols:
                gid = pdf.groupby(gcols, sort=False, dropna=False).ngroup()
                cs = vals.groupby(gid).cumsum()
                first_key = tuple(None if pd.isna(x) else x for x in pdf.iloc[0][gcols])
                last_key = tuple(None if pd.isna(x) else x for x in pdf.iloc[-1][gcols])
                if first_key == carry_key:
                    cs = cs + (gid == gid.iloc[0]).astype("int64") * carry
            else:
                cs = vals.cumsum() + carry
                first_key = last_key = ()
            carry, carry_key = int(cs.iloc[-1]), last_key
            pdf["__pid"] = np.int32(pid)
            pdf["__local"] = cs.astype("int64")
            yield pdf

    return srt.mapInPandas(gen, out_schema)


def with_global_cumsum(
    df: DataFrame,
    order_col: str | list[str],
    value_col: str,
    out_col: str = "cumsum",
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` in ``order_col`` order,
    without a single-partition window.

    The driver round-trip is one row PER PARTITION (bounded, not data-sized);
    ties on ``order_col`` across partition boundaries are fine because range
    partitioning puts equal keys in one partition.  Pass a LIST of order
    columns (ending in a unique tie-breaker) when the leading key has ties and
    the running sum must be bit-deterministic — within-tie accumulation order
    is otherwise engine-dependent.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    local = _stamped_local_cumsum(df, [], order_cols, value_col, n_partitions)
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


def with_keyed_cumsum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
    n_partitions: int | None = None,
    max_offset_rows: int = 1_000_000,
) -> DataFrame:
    """Exact PER-GROUP running sum without a one-task-per-group window.

    ``Window.partitionBy(group)`` serializes each group into a single task —
    at 100 TB a dominant stratum (a crawl source that is 80% of the corpus)
    becomes one straggler task owning 80 TB.  Instead the same two-phase
    prefix sum as :func:`with_global_cumsum`, keyed:

    1. range-partition on ``(group, order)`` — each group spans MANY
       partitions but stays contiguous, so every partition is bounded by
       total-bytes/parallelism regardless of group skew;
    2. local cumsums per ``(group, partition)``;
    3. per-(group, partition) totals → driver (one row per group×partition —
       bounded by the partition count, never by data) → per-group prefix
       offsets over ascending partition id;
    4. group-global offset broadcast-joined back on ``(group, __pid)``.

    ``order_cols`` must end in a unique tie-breaker for bit-deterministic
    output (same contract as :func:`with_global_cumsum`).

    CONTRACT: ``group_cols`` must be STRATA-cardinality keys (source, lang,
    fold — tens to thousands of groups).  The driver round-trip is
    groups×partitions rows; keyed by a data-cardinality column (conv_id,
    doc_id) it would collect the corpus.  The collect is bounded by
    ``max_offset_rows`` and RAISES loudly past it (failure-loudness
    convention) — a high-cardinality keyed prefix sum needs a tree
    reduction, not this operator.
    """
    local = _stamped_local_cumsum(df, group_cols, order_cols, value_col, n_partitions)
    local = tracked_persist(local)
    # limit(N+1) bounds what reaches the driver even in the violating case:
    # the agg still runs distributed, but at most N+1 rows ship back.
    totals = (
        local.groupBy(*group_cols, "__pid")
        .agg(F.sum(value_col).alias("__t"))
        .limit(max_offset_rows + 1)
        .collect()
    )
    if len(totals) > max_offset_rows:
        raise ValueError(
            f"with_keyed_cumsum: groups×partitions offset rows exceed "
            f"max_offset_rows={max_offset_rows} — group_cols={group_cols} "
            f"look data-cardinality, not strata-cardinality; use a "
            f"tree-reduction prefix sum or coarser grouping keys"
        )
    acc: dict[tuple, int] = {}
    offset_rows = []
    for r in sorted(totals, key=lambda r: (tuple(str(r[g]) for g in group_cols), r["__pid"])):
        key = tuple(r[g] for g in group_cols)
        offset_rows.append((*key, r["__pid"], acc.get(key, 0)))
        acc[key] = acc.get(key, 0) + (r["__t"] or 0)
    by_name = {f.name: f.dataType for f in local.schema.fields}
    base = T.StructType(
        [T.StructField(g, by_name[g], True) for g in group_cols]
        + [
            T.StructField("__pid", T.IntegerType(), False),
            T.StructField("__offset", T.LongType(), False),
        ]
    )
    offsets = df.sparkSession.createDataFrame(offset_rows, base)
    # NULL-SAFE join: a plain equi-join on the group cols never matches a
    # NULL stratum (null = null is never true in SQL), so a null group
    # spanning partitions would silently restart its running sum per
    # partition.  eqNullSafe keys still plan a broadcast HASH join (Catalyst
    # extracts EqualNullSafe as join keys), so the physical shape is
    # unchanged: one broadcast of P·G rows, zero extra exchange.
    offsets = offsets.select(
        *[F.col(g).alias(f"__og_{i}") for i, g in enumerate(group_cols)],
        F.col("__pid").alias("__opid"),
        "__offset",
    )
    cond = local["__pid"] == offsets["__opid"]
    for i, g in enumerate(group_cols):
        cond = cond & local[g].eqNullSafe(offsets[f"__og_{i}"])
    return (
        local.join(F.broadcast(offsets), on=cond, how="left")
        .withColumn(
            out_col,
            (F.coalesce(F.col("__offset"), F.lit(0)) + F.col("__local")).cast("long"),
        )
        .drop("__pid", "__opid", "__local", "__offset", *[f"__og_{i}" for i in range(len(group_cols))])
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
