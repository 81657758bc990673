"""Corpus profiling: exact per-group order statistics at scale.

A data recipe wants per-source distribution facts (length quantiles, token
quantiles) that are EXACT and engine-portable — ``percentile_approx`` is
neither (approximate, implementation-defined), and the exact built-in
``percentile`` interpolates in floating point, which no cross-engine
value-hash survives.  ``group_quantiles`` instead selects the lower-rank
(type-1) quantile element with pure integer arithmetic:

* per-group rank in ``(value, key)`` order via the KEYED two-phase
  distributed prefix sum (`packing.with_keyed_cumsum`) — never a
  one-task-per-group window, so a source holding 80% of the corpus cannot
  straggle;
* the quantile row index is ``((n - 1) * p) DIV 100`` — integer-exact in
  any engine, no float rounding;
* the rows matching a quantile rank (a handful per group) are filtered
  FIRST, so the final per-group pivot aggregates only ``len(percents)``
  rows per group.

The reference profiles availability_status distributions with pandas
value_counts (lamassu.py:306-311); this is the distributed order-statistics
generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import with_keyed_cumsum

DEFAULT_PERCENTS = {"p25": 25, "p50": 50, "p90": 90}


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    percents: dict[str, int] | None = None,
    count_col: str = "n_rows",
    n_partitions: int | None = None,
) -> DataFrame:
    """One row per group: group cols, ``count_col``, and one column per entry
    of ``percents`` holding the exact lower-rank quantile of ``value_col``.

    ``key_col`` breaks value ties so ranks are total and the selected element
    is deterministic on any engine at any parallelism.
    """
    percents = percents or DEFAULT_PERCENTS
    for name, p in percents.items():
        if not 0 <= p <= 100:
            raise ValueError(f"percent for {name!r} must be in [0, 100], got {p}")
    ranked = with_keyed_cumsum(
        df.select(*group_cols, value_col, key_col).withColumn("__one", F.lit(1)),
        group_cols=group_cols,
        order_cols=[value_col, key_col],
        value_col="__one",
        out_col="__rank",
        n_partitions=n_partitions,
    )
    # NULL-SAFE counts join: a plain inner equi-join would drop the whole
    # NULL group (null = null never matches), silently erasing a null
    # stratum from the profile while a SQL GROUP BY keeps it.  eqNullSafe
    # keys still hash-join against the broadcast counts frame.
    #
    # The counts side is one row per group — broadcast assumes the group
    # cardinality is broadcast-sized (sources/languages/buckets: thousands,
    # not billions).  A group-key with data-scale cardinality would OOM the
    # driver here LOUDLY at the collect inside broadcast, not silently skew.
    counts = ranked.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    counts = counts.select(
        *[F.col(g).alias(f"__cg_{i}") for i, g in enumerate(group_cols)], "__n"
    )
    cond = None
    for i, g in enumerate(group_cols):
        c = ranked[g].eqNullSafe(counts[f"__cg_{i}"])
        cond = c if cond is None else (cond & c)
    j = ranked.join(F.broadcast(counts), on=cond).drop(
        *[f"__cg_{i}" for i in range(len(group_cols))]
    )
    sels = {
        name: F.expr(f"CAST(((__n - 1) * {p}) DIV 100 AS BIGINT) + 1")
        for name, p in percents.items()
    }
    hit_any = None
    for sel in sels.values():
        cond = F.col("__rank") == sel
        hit_any = cond if hit_any is None else (hit_any | cond)
    hits = j.filter(hit_any)
    aggs = [F.max("__n").cast("long").alias(count_col)] + [
        F.max(F.when(F.col("__rank") == sel, F.col(value_col))).alias(name)
        for name, sel in sels.items()
    ]
    return hits.groupBy(*group_cols).agg(*aggs)


def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    n_mads: int = 3,
    med_col: str = "med",
    mad_col: str = "mad",
    n_partitions: int | None = None,
) -> DataFrame:
    """Per-group robust outliers: rows where ``|value - median| > n_mads *
    MAD`` (median absolute deviation) — the outlier rule that, unlike
    mean/stddev z-scores, is not dragged by the outliers it is hunting.

    Both the median and the MAD are EXACT lower-rank order statistics
    (:func:`group_quantiles` — keyed distributed prefix-sum ranking, never a
    one-task-per-group sort), so on integer values the whole decision is
    integer arithmetic: bit-identical on any engine, no stddev float drift.
    Two ranking passes (values, then absolute deviations) + two broadcast
    joins of one-row-per-group stats frames.
    """
    from ..caching import tracked_persist

    # persist the strata-sized stats frames: `dev` is consumed twice (the
    # MAD fit and the final score join), so an unpersisted median frame
    # would re-run its whole ranked pass per consumer (r7)
    med = tracked_persist(group_quantiles(
        df.select(*group_cols, value_col, key_col),
        group_cols, value_col, key_col, {med_col: 50}, count_col="__n_med",
        n_partitions=n_partitions,
    ).drop("__n_med"))
    med_k = med.select(
        *[F.col(g).alias(f"__mg_{i}") for i, g in enumerate(group_cols)], med_col
    )
    cond = None
    for i, g in enumerate(group_cols):
        c = df[g].eqNullSafe(med_k[f"__mg_{i}"])
        cond = c if cond is None else (cond & c)
    with_med = df.join(F.broadcast(med_k), on=cond).drop(
        *[f"__mg_{i}" for i in range(len(group_cols))]
    )
    dev = with_med.withColumn("__adev", F.abs(F.col(value_col) - F.col(med_col)))
    mad = tracked_persist(group_quantiles(
        dev.select(*group_cols, "__adev", key_col),
        group_cols, "__adev", key_col, {mad_col: 50}, count_col="__n_mad",
        n_partitions=n_partitions,
    ).drop("__n_mad"))
    mad_k = mad.select(
        *[F.col(g).alias(f"__dg_{i}") for i, g in enumerate(group_cols)], mad_col
    )
    cond2 = None
    for i, g in enumerate(group_cols):
        c = dev[g].eqNullSafe(mad_k[f"__dg_{i}"])
        cond2 = c if cond2 is None else (cond2 & c)
    scored = dev.join(F.broadcast(mad_k), on=cond2).drop(
        *[f"__dg_{i}" for i in range(len(group_cols))]
    )
    return scored.filter(F.col("__adev") > n_mads * F.col(mad_col)).drop("__adev")


def group_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    bin_width: int,
    bin_col: str = "bin",
    lo_col: str = "bin_lo",
    count_col: str = "n_rows",
) -> DataFrame:
    """Exact fixed-width histogram per group: one row per (group, bin) with
    the bin's inclusive lower edge and row count.

    Pure integer arithmetic (``bin = floor(value / width)``) so counts are
    bit-identical on any engine — the profiling companion to
    :func:`group_quantiles` when the recipe wants the full distribution
    shape, not selected order statistics.  One hash shuffle, map-side
    combined; NULL values land in a NULL bin (kept, not dropped — absent
    data is a distribution fact).  Scale: output is |groups| × |occupied
    bins|, never data-sized.
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    b = F.floor(F.col(value_col) / bin_width).cast("long")
    return (
        df.withColumn(bin_col, b)
        .groupBy(*group_cols, bin_col)
        .agg(F.count(F.lit(1)).alias(count_col))
        .withColumn(lo_col, (F.col(bin_col) * bin_width).cast("long"))
    )
