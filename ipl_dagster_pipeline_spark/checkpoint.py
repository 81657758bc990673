"""Checkpointed, resumable multi-stage runs (north rule: "resumable from the
last committed checkpoint snapshot").

Reference precedent: run monitoring with ≤3 resume attempts
(dagster.docker.yaml:16-25) and the startup reaper that terminates stuck runs
(scripts/terminate_starting_and_started_runs.py) — supervision bolted onto
non-resumable compute.  Here resumability is structural: every stage writes
its output as an atomic `SnapshotTable` commit plus a lineage append; re-running
the pipeline skips stages whose snapshot already committed and recomputes the
rest from their inputs' snapshots.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .caching import tracked_scope
from .io import SnapshotTable
from .metrics import append_lineage, partition_lineage


class CheckpointedPipeline:
    """Registry of named stages over a checkpoint root directory.

    Usage:
        pipe = CheckpointedPipeline(spark, "/tmp/ckpt")
        t = pipe.stage("convert", lambda: transcripts_from_events(spark, sf))
        f = pipe.stage("features", lambda: build_turn_features(t))
    Each stage is computed at most once per checkpoint root; a rerun after a
    crash resumes from the last committed stage snapshot.
    """

    def __init__(self, spark: SparkSession, root: str, force: bool = False) -> None:
        self.spark = spark
        self.root = root
        self.force = force
        self.lineage_path = os.path.join(root, "_lineage")
        os.makedirs(root, exist_ok=True)

    def table(self, stage: str) -> SnapshotTable:
        return SnapshotTable(os.path.join(self.root, stage))

    def is_committed(self, stage: str) -> bool:
        return self.table(stage).current_snapshot_id() is not None

    def stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
        emit_lineage: bool = True,
    ) -> DataFrame:
        """Run (or resume) a stage: if a committed snapshot exists, read it
        back; otherwise compute, commit atomically, append per-partition
        lineage, and read the committed snapshot (so downstream stages always
        consume the durable copy, never a recomputable plan)."""
        tbl = self.table(name)
        if not self.force and tbl.current_snapshot_id() is not None:
            return tbl.read(self.spark)
        # the commit IS the consuming action — scope every intermediate the
        # stage persists (MinHash shingles, LSH buckets, prefix-sum locals)
        # so a multi-stage run never accumulates executor storage; the SCOPE
        # (not the global registry) owns the frames, so a concurrent pipeline
        # in the same session can't have its caches yanked by this stage
        with tracked_scope():
            df = fn()
            snap_id = tbl.commit(df, partition_by=partition_by)
        committed = tbl.read(self.spark)
        if emit_lineage:
            append_lineage(partition_lineage(committed, name, snapshot_id=snap_id), self.lineage_path)
        return committed

    def completed_stages(self) -> list[str]:
        return [
            d
            for d in sorted(os.listdir(self.root))
            if not d.startswith("_") and self.is_committed(d)
        ]
