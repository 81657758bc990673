"""Gap-based sessionization (SURVEY §2.6 W5) — two equivalent implementations.

1. ``sessionize`` — pure-Spark window-sum: flag turns whose gap from the
   previous turn exceeds the threshold, cumulative-sum the flags.  Whole-stage
   codegen, one shuffle on conv_id.  This is the default/scale path.
2. ``sessionize_grouped`` — vectorized grouped-map pandas (`applyInPandas`,
   Arrow-batched, no per-row Python) — the north-rule-mandated grouped-map
   variant; also the template for arbitrary per-conversation pandas feature
   blocks (reference precedent: per-feed pandas frame transforms,
   lamassu.py:137-235).

Both order by (ts, turn_idx) for stable tie-breaking.  A first turn (no
predecessor) always starts session 1.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .windows import turn_window


def sessionize(df: DataFrame, gap_seconds: int = 1800, key: str = "conv_id") -> DataFrame:
    """Window-sum sessionization: session_id = 1 + count of gaps > threshold
    among all preceding turns of the conversation."""
    w = turn_window(key)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0))
    cum = turn_window(key).rowsBetween(Window.unboundedPreceding, Window.currentRow)  # shares the chain sort
    return df.withColumn("__new", new_sess).withColumn(
        "session_id", F.sum("__new").over(cum).cast("int")
    ).drop("__new")


def sessionize_grouped(df: DataFrame, gap_seconds: int = 1800, key: str = "conv_id") -> DataFrame:
    """Grouped-map pandas sessionization — semantically identical to
    ``sessionize`` (equivalence covered by tests/test_sessionize.py).

    Scale notes: each group is one conversation; conversations are bounded in
    length (hot ones should be salted upstream via partitioning.salt_hot_keys
    only for aggregations — sessionization itself is a sequential scan per
    conversation and must see the whole group).  Arrow batching keeps the
    exchange vectorized.
    """
    from pyspark.sql import types as T

    # fresh StructType — StructType.add would mutate the DataFrame's cached schema
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField("session_id", T.IntegerType(), False)])
    gap = float(gap_seconds)

    def _sessionize_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
        # FLOOR-second deltas, exactly like the window path's
        # cast(ts as long) — a float total_seconds() diff would disagree on
        # sub-second timestamps whenever a gap straddles the threshold
        # (delta in (gap, gap+1) floors to gap → same session in the window
        # path, but floats past the threshold here)
        secs = pdf["ts"].astype("int64") // 1_000_000_000
        delta = secs.diff()
        pdf["session_id"] = (delta.isna() | (delta > gap)).cumsum().astype("int32")
        return pdf

    return df.groupBy(key).applyInPandas(_sessionize_pdf, schema=out_schema)


def session_aggregates(sessions: DataFrame, key: str = "conv_id") -> DataFrame:
    """Per-session rollup after sessionization (SURVEY §2.5 engine-added
    aggregates): turn count, span, distinct tools, role mix."""
    return sessions.groupBy(key, "session_id").agg(
        F.count("*").alias("n_turns"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("span_s"),
        F.count_distinct("tool").alias("n_tools"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user_turns"),
        F.sum(F.length("text")).alias("total_chars"),
    )
