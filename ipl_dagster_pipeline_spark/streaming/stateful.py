"""Custom stateful streaming operator: per-conversation running features
maintained across micro-batches with ``applyInPandasWithState`` (the
arbitrary-stateful path the north rule's "custom stateful operators" calls
for; vectorized — state + Arrow batches, no per-row Python dispatch).

State per conv_id: (turns_seen, last_ts_us, session_id).  Each micro-batch's
turns are processed in (ts, turn_idx) order; session ids CONTINUE across
batches — the incremental equivalent of the batch gap sessionization for
in-order arrivals (equivalence covered by tests/test_streaming_stateful.py).
Watermark-less by design here; production would pair it with a watermark and
state timeout (GroupStateTimeout) to bound state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("turns_seen", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_id", T.IntegerType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("running_turns", T.LongType()),
        T.StructField("session_id", T.IntegerType()),
        T.StructField("gap_s", T.LongType()),
    ]
)


def running_features_stateful(stream: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Running per-conversation features over a stream of transcript turns."""

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        turns_seen, last_ts_us, session_id = (
            state.get if state.exists else (0, None, 0)
        )
        # a group's rows can arrive as several Arrow chunks within one
        # micro-batch — concatenate before sorting or the order is only
        # per-chunk (the group-per-batch is bounded; state needs it anyway)
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
            out_rows = []
            for turn_idx, ts, t_us in zip(pdf["turn_idx"], pdf["ts"], ts_us):
                # difference of FLOOR-seconds, matching the batch paths'
                # cast(ts as long) — flooring the µs difference instead would
                # disagree whenever fractional parts straddle the threshold
                gap = (
                    None
                    if last_ts_us is None
                    else t_us // 1_000_000 - last_ts_us // 1_000_000
                )
                if last_ts_us is None or gap > gap_seconds:
                    session_id += 1
                turns_seen += 1
                last_ts_us = int(t_us)
                out_rows.append((conv_id, int(turn_idx), ts, turns_seen, session_id, gap))
            yield pd.DataFrame(
                out_rows,
                columns=["conv_id", "turn_idx", "ts", "running_turns", "session_id", "gap_s"],
            )
        state.update((turns_seen, last_ts_us, session_id))

    return stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
