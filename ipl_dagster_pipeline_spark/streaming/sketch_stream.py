"""Streaming sketch maintenance: merge per-batch log-histogram sketches
into a committed SnapshotTable.

The point of a MERGEABLE sketch (sketches.py: UNION of inputs == merge of
sketches) is exactly this deployment: arriving data files are reduced to a
tiny per-batch register frame and MERGED into the durable sketch — the
monitoring quantiles stay fresh without ever rescanning history, and the
per-batch cost is |batch| + |current sketch| (the sketch side is O(buckets),
never data-sized).

Unlike the SCD1 stream (whose merge is naturally idempotent), a COUNT merge
replayed after a crash would double-count — so exactly-once is carried by
the same batch-id discipline as the dedup index: every commit tags the
foreachBatch ``batch_id`` in its snapshot meta, and a replayed batch whose
id is already committed is skipped.  Reference precedent for tag-driven
skip-if-done: the If-Modified-Since fetch discipline (util/urllib.py:59-72).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F  # noqa: F401  (kept for parity with sibling modules)

from ..io import SnapshotTable
from ..operators.sketches import loghist_merge, loghist_sketch


def stream_sketch_maintenance(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    value_col: str,
    group_cols: list[str] | None,
    checkpoint_path: str,
    schema=None,
    available_now: bool = True,
    maintain_every: int = 20,
    keep_last: int = 3,
):
    """Start (or catch up) the streaming sketch-maintenance query.

    Returns the StreamingQuery; callers ``awaitTermination()`` it.  The
    maintained snapshot is always equal to ``loghist_sketch`` over every row
    processed so far (asserted in tests).  ``schema`` may be passed
    explicitly so the query can start on a fresh deployment before the
    first input file lands (round-5 ADVICE on the dedup stream).

    Housekeeping: committed batch tags go to a durable ``_stream_batches``
    registry file (not only snapshot meta), and every ``maintain_every``
    commits old snapshots are expired (``keep_last`` retained) — a
    long-running stream stays O(keep_last) on disk instead of one full
    sketch copy per batch, and tag-based replay skipping survives the
    expiration (the dedup-index registry discipline, round-5 ADVICE).
    """
    import json
    import os

    schema = schema or spark.read.parquet(input_dir).schema
    tbl = SnapshotTable(table_path)
    registry = os.path.join(table_path, "_stream_batches.json")

    def _committed() -> set:
        tags = {
            m.get("meta", {}).get("stream_batch_id")
            for m in tbl.snapshots()
            if m.get("meta", {}).get("stream_batch_id")
        }
        if os.path.exists(registry):
            with open(registry) as fh:
                tags |= set(json.load(fh))
        return tags

    def _record(tags: set) -> None:
        t = registry + ".tmp"
        with open(t, "w") as fh:
            json.dump(sorted(tags), fh)
        os.replace(t, registry)

    def _apply(batch_df, batch_id: int) -> None:
        tag = f"b{batch_id}"
        seen = _committed()
        if tag in seen:  # crash-replayed batch: counts must not double
            return
        if not batch_df.head(1):
            return
        delta = loghist_sketch(batch_df, value_col, group_cols)
        if tbl.current_snapshot_id() is not None:
            delta = loghist_merge(tbl.read(spark), delta)
        tbl.commit(delta, meta={"stream_batch_id": tag})
        _record(seen | {tag})
        if maintain_every and len(tbl.snapshots()) >= maintain_every:
            tbl.expire_snapshots(keep_last=keep_last)

    writer = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
