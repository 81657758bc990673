"""Streaming near-dup indexing: MinHash/LSH index maintenance per micro-batch.

The batch path (``jobs/dedup_index_update.py``) indexes a daily batch per
run; here arriving document files drive the same index continuously:

* a file-source stream with checkpointed offsets assigns every arriving
  file to exactly one micro-batch across restarts;
* each micro-batch becomes one ``MinHashIndex.add_batch`` call whose
  ``batch_id`` is the STREAM's batch id — and since ``add_batch`` is
  idempotent per batch id (the docs commit is the batch-done marker), a
  micro-batch replayed after a crash re-probes and converges to the same
  committed state instead of double-appending: exactly-once effect from
  at-least-once delivery;
* optional periodic maintenance (compaction + snapshot expiration) runs
  inside the same serialized foreachBatch loop, so it never races a probe;
* ``trigger(availableNow=True)`` turns the same query into a catch-up run.

Per-batch cost: O(batch + matched-neighborhood) — see
``operators/dedup_index.py``.  Reference parity: the reference's per-minute
re-fetch jobs (sharing.py:142-149) bound freshness by cadence and pay full
recompute; this bounds it by arrival and pays batch-sized work.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from ..operators.dedup_index import MinHashIndex


def stream_dedup_index(
    spark: SparkSession,
    input_dir: str,
    index: MinHashIndex,
    checkpoint_path: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    maintain_every: int | None = None,
    maintain_keep_last: int = 3,
    schema: StructType | None = None,
):
    """Start (or catch up) the streaming dedup-index maintenance query.

    Returns the StreamingQuery; callers ``awaitTermination()`` it.  The
    document schema is ``schema`` if given; otherwise it is inferred from
    the existing files in ``input_dir``, falling back to the index's own
    docs table on a fresh deployment where no input file has landed yet
    (round-5 ADVICE: the query must be startable before the first batch).
    """
    if schema is None:
        try:
            schema = spark.read.parquet(input_dir).schema
        except Exception:
            if index.docs.current_snapshot_id() is None:
                raise ValueError(
                    f"cannot infer stream schema: {input_dir!r} has no files yet "
                    "and the index is empty — pass schema= explicitly"
                ) from None
            schema = index.docs.read(spark).schema
    for col in (index.params["id_col"], index.params["text_col"]):
        if col not in schema.fieldNames():
            raise ValueError(f"stream input lacks index column {col!r}")

    def _apply(batch_df, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        # tag scoped to the checkpoint GENERATION (round-6 ADVICE): a fresh
        # or lost checkpoint renumbers batches from 0 with different
        # contents, and an unscoped "stream-0" tag from the old lineage
        # would silently skip them.  With the generation in the tag the new
        # lineage's batches are processed; docs already indexed are dropped
        # by add_batch's duplicate-id guard, so re-delivery stays correct.
        from . import checkpoint_generation

        gen = checkpoint_generation(checkpoint_path)
        index.add_batch(batch_df, batch_id=f"stream-{gen}-{batch_id}")
        if maintain_every and batch_id > 0 and batch_id % maintain_every == 0:
            index.maintain(spark, keep_last=maintain_keep_last)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
