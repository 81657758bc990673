"""The flagship end-to-end feature-build plan (north rule).

transcripts → as-of join dim snapshots (PIT-correct) → lag features →
rolling windows → backfill → gap sessionization → per-turn feature vector
(+ optional per-session rollup).

One declarative DataFrame plan: Catalyst fuses the window chain (all windows
share partitionBy(conv_id) orderBy(ts, turn_idx), so a single sort/shuffle
serves lag + rolling + backfill + sessionize), the as-of union-fill adds one
more pass over the same partitioning, and the dim build broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.asof import asof_join_broadcast_range
from ..operators.sessionize import session_aggregates, sessionize
from ..operators.windows import backfill, with_lag_features, with_rolling_range, with_rolling_rows


def build_turn_features(
    transcripts: DataFrame,
    tool_dim: DataFrame | None = None,
    gap_seconds: int = 1800,
    rolling_rows: int = 5,
    rolling_seconds: int = 3600,
) -> DataFrame:
    """Per-turn PIT-correct feature vector.

    Every feature reads only rows with ts' <= ts (lag/rolling/backfill frames
    end at CURRENT ROW; the as-of join matches effective_from <= ts).
    """
    df = transcripts.withColumn("text_len", F.length("text").cast("long"))
    if tool_dim is not None:
        # tool has ~5 distinct values → interval-broadcast path (skew-free),
        # not the window path (which would partition by tool).
        df = asof_join_broadcast_range(df, tool_dim, key="tool", ts_col="ts")
    # window chain order matters physically: the rows-frame windows require
    # [conv_id, ts, turn_idx]; the interval range window requires only the
    # prefix [conv_id, ts].  Running a rows-frame window FIRST establishes the
    # full ordering, so every later window (incl. the range frame) plans with
    # NO additional sort — one shuffle + one sort for the whole chain.
    df = with_lag_features(df)
    df = with_rolling_rows(df, F.col("text_len"), k=rolling_rows, out_prefix="chars")
    df = with_rolling_range(df, F.col("text_len"), seconds=rolling_seconds, out_prefix="chars")
    df = backfill(df, "tool", out="tool_ffill")
    df = sessionize(df, gap_seconds=gap_seconds)
    return df


def build_session_features(turn_features: DataFrame) -> DataFrame:
    """Per-session rollup over the sessionized turn features."""
    return session_aggregates(turn_features)
