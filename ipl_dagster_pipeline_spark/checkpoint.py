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
        if os.path.exists(os.path.join(self.root, stage, "manifest.json")):
            return True  # external (non-Spark) stage — see external_stage
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

    def external_stage(
        self,
        name: str,
        fn: Callable[[str], dict],
        max_attempts: int = 3,
        emit_lineage: bool = True,
    ) -> dict:
        """Supervise a NON-Spark stage under the same checkpoint registry
        (SURVEY §2 S10).

        Reference precedent: the GTFS import runs an external container under
        a supervising op (pipeline/assets/gtfs.py:28-70) and the deployment
        resumes stuck runs up to 3 times (dagster.docker.yaml:16-25) — the
        compute is opaque to the orchestrator, only its lifecycle is managed.
        Same split here: ``fn(work_dir)`` is arbitrary non-Spark work (fetch a
        feed, unzip an archive, call a loader) that writes its artifacts into
        ``work_dir`` and returns a small metadata dict (e.g. ``{'rows': n}``).
        The pipeline owns idempotence and atomicity:

        * committed stage → ``fn`` is NOT called; the stored manifest returns
        * success publishes atomically: scratch dir → versioned output dir
          (one rename), then the manifest (tmp + rename) — the manifest IS
          the commit point, exactly like ``SnapshotTable.commit``
        * an exception inside ``fn`` retries up to ``max_attempts`` with a
          fresh scratch dir; exhaustion re-raises the last error
        * a crash after the output rename but before the manifest write
          leaves an orphan versioned dir; the next run re-runs ``fn`` into a
          NEW version and commits that — readers only ever follow the
          manifest
        * the metadata lands in the same ``_lineage`` table (row_count from
          ``meta['rows']``), so K6 reconciliation covers external stages too

        Returns the manifest dict: ``{'stage', 'version', 'path', 'meta',
        'attempts'}``.
        """
        import json
        import shutil
        import time

        stage_root = os.path.join(self.root, name)
        manifest_path = os.path.join(stage_root, "manifest.json")
        os.makedirs(stage_root, exist_ok=True)
        if not self.force and os.path.exists(manifest_path):
            with open(manifest_path) as f:
                return json.load(f)

        existing = [
            int(d.split("_v")[1])
            for d in os.listdir(stage_root)
            if d.startswith("ext_v") and d.split("_v")[1].isdigit()
        ]
        version = max(existing, default=0) + 1
        out_dir = os.path.join(stage_root, f"ext_v{version}")
        scratch = os.path.join(stage_root, f"_scratch_v{version}")

        last_err: Exception | None = None
        for attempt in range(1, max_attempts + 1):
            shutil.rmtree(scratch, ignore_errors=True)
            os.makedirs(scratch)
            try:
                meta = fn(scratch) or {}
                break
            except Exception as err:  # supervised retry, never a silent skip
                last_err = err
        else:
            shutil.rmtree(scratch, ignore_errors=True)
            raise RuntimeError(
                f"external stage {name!r} failed after {max_attempts} attempts"
            ) from last_err

        os.replace(scratch, out_dir)  # atomic publish of the artifacts
        manifest = {
            "stage": name,
            "version": version,
            "path": out_dir,
            "meta": meta,
            "attempts": attempt,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)  # the commit point

        if emit_lineage:
            from pyspark.sql import functions as F

            row = self.spark.createDataFrame(
                [(name, version, -1, int(meta.get("rows", 0)), int(meta.get("checksum", 0)))],
                "stage string, snapshot_id long, partition_id int, row_count long, checksum long",
            ).withColumn("committed_at", F.current_timestamp())
            append_lineage(row, self.lineage_path)
        return manifest

    def completed_stages(self) -> list[str]:
        return [
            d
            for d in sorted(os.listdir(self.root))
            if not d.startswith("_") and self.is_committed(d)
        ]
