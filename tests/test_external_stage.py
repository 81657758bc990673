"""External (non-Spark) stage supervision under the checkpoint registry —
SURVEY §2 S10: idempotent skip, bounded retries, atomic publish,
crash-resume, and K6 lineage reconciliation."""

from __future__ import annotations

import json
import os

import pytest

from ipl_dagster_pipeline_spark.checkpoint import CheckpointedPipeline
from ipl_dagster_pipeline_spark.metrics import total_from_lineage


def _importer(calls: list):
    """A stand-in for the reference's container import (gtfs.py:28-70):
    writes artifacts into the scratch dir, returns rows metadata."""

    def fn(work_dir: str) -> dict:
        calls.append(work_dir)
        with open(os.path.join(work_dir, "stops.txt"), "w") as f:
            f.write("a\nb\nc\n")
        return {"rows": 3, "checksum": 42}

    return fn


def test_external_stage_runs_once_and_resumes(spark, tmp_path):
    pipe = CheckpointedPipeline(spark, str(tmp_path / "ckpt"))
    calls: list = []
    m1 = pipe.external_stage("gtfs_import", _importer(calls))
    assert m1["version"] == 1 and m1["attempts"] == 1 and m1["meta"]["rows"] == 3
    assert os.path.exists(os.path.join(m1["path"], "stops.txt"))
    assert pipe.is_committed("gtfs_import")
    assert "gtfs_import" in pipe.completed_stages()

    # a fresh pipeline over the same root SKIPS the work (fn never called)
    pipe2 = CheckpointedPipeline(spark, str(tmp_path / "ckpt"))
    m2 = pipe2.external_stage("gtfs_import", _importer(calls))
    assert m2 == m1 and len(calls) == 1

    # K6: the external stage reconciles through the same lineage table
    assert total_from_lineage(spark, pipe.lineage_path, "gtfs_import") == (3, 42)


def test_external_stage_retries_then_succeeds(spark, tmp_path):
    pipe = CheckpointedPipeline(spark, str(tmp_path / "ckpt"))
    attempts: list = []

    def flaky(work_dir: str) -> dict:
        attempts.append(1)
        if len(attempts) < 3:
            raise OSError("feed endpoint flapped")
        with open(os.path.join(work_dir, "out.bin"), "wb") as f:
            f.write(b"ok")
        return {"rows": 1}

    m = pipe.external_stage("flaky_feed", flaky, max_attempts=3)
    assert m["attempts"] == 3 and len(attempts) == 3
    # scratch dirs from failed attempts never leak into the published dir
    assert sorted(os.listdir(m["path"])) == ["out.bin"]


def test_external_stage_exhausts_attempts_loudly(spark, tmp_path):
    pipe = CheckpointedPipeline(spark, str(tmp_path / "ckpt"))

    def broken(work_dir: str) -> dict:
        raise OSError("always down")

    with pytest.raises(RuntimeError, match="failed after 2 attempts"):
        pipe.external_stage("down", broken, max_attempts=2)
    assert not pipe.is_committed("down")
    # no scratch or version dirs survive an exhausted stage
    leftovers = [d for d in os.listdir(os.path.join(pipe.root, "down")) if not d.startswith("_manifests")]
    assert leftovers == []


def test_external_stage_crash_between_publish_and_manifest(spark, tmp_path):
    """A crash AFTER the artifact rename but BEFORE the manifest write must
    re-run the stage into a NEW version: the manifest is the commit point,
    the orphan dir is dead weight, and readers only follow the manifest."""
    root = str(tmp_path / "ckpt")
    pipe = CheckpointedPipeline(spark, root)
    calls: list = []
    # simulate: run the stage fully, then delete the manifest (the state a
    # crash between the two renames leaves behind)
    m1 = pipe.external_stage("gtfs_import", _importer(calls))
    os.remove(os.path.join(root, "gtfs_import", "manifest.json"))
    assert not pipe.is_committed("gtfs_import")

    m2 = CheckpointedPipeline(spark, root).external_stage("gtfs_import", _importer(calls))
    assert len(calls) == 2
    assert m2["version"] == m1["version"] + 1  # fresh version, orphan ignored
    with open(os.path.join(root, "gtfs_import", "manifest.json")) as f:
        assert json.load(f)["path"] == m2["path"]


def test_external_stage_force_recomputes(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    calls: list = []
    CheckpointedPipeline(spark, root).external_stage("imp", _importer(calls))
    m = CheckpointedPipeline(spark, root, force=True).external_stage("imp", _importer(calls))
    assert len(calls) == 2 and m["version"] == 2


def test_external_stage_timeout_reaps_hung_callable(spark, tmp_path):
    """Run supervision (reference: 6h max runtime + stuck-run reaper,
    dagster.docker.yaml:16-25, terminate_starting_and_started_runs.py):
    a hung callable times out per attempt, exhaustion records a FAILURE
    lineage row and raises, and a re-run resumes cleanly."""
    import threading

    from ipl_dagster_pipeline_spark.checkpoint import ExternalStageTimeout

    pipe = CheckpointedPipeline(spark, str(tmp_path / "ckpt"))
    cancels_seen: list = []

    def hung(work_dir: str, cancel: threading.Event) -> dict:
        # cooperative: waits forever unless the supervisor cancels it
        cancel.wait(timeout=60)
        cancels_seen.append(cancel.is_set())
        raise RuntimeError("should have been cancelled long before 60s")

    with pytest.raises(RuntimeError, match="failed after 2 attempts") as ei:
        pipe.external_stage("stuck_import", hung, max_attempts=2, timeout_sec=0.3)
    assert isinstance(ei.value.__cause__, ExternalStageTimeout)
    assert not pipe.is_committed("stuck_import")

    # failure is visible in lineage (snapshot_id=-1, row_count=-1)
    rows = spark.read.parquet(pipe.lineage_path).filter("stage = 'stuck_import'").collect()
    assert len(rows) == 1 and rows[0].snapshot_id == -1 and rows[0].row_count == -1

    # the cancel event reached the (cooperative) zombie threads
    import time

    deadline = time.monotonic() + 5
    while len(cancels_seen) < 2 and time.monotonic() < deadline:
        time.sleep(0.05)
    assert cancels_seen == [True, True]

    # re-run with healthy work resumes cleanly into a fresh version
    calls: list = []
    m = pipe.external_stage("stuck_import", _importer(calls), timeout_sec=30)
    assert m["version"] >= 1 and len(calls) == 1 and pipe.is_committed("stuck_import")
    assert os.path.exists(os.path.join(m["path"], "stops.txt"))


def test_external_stage_timeout_then_success_counts_attempts(spark, tmp_path):
    """A timed-out first attempt is a failed attempt; the second succeeds in
    ITS OWN scratch dir (the abandoned attempt can't corrupt the publish)."""
    import time

    pipe = CheckpointedPipeline(spark, str(tmp_path / "ckpt"))
    n = {"calls": 0}

    def slow_then_fast(work_dir: str) -> dict:
        n["calls"] += 1
        if n["calls"] == 1:
            time.sleep(2.0)  # blows the 0.3s budget, ignores cancellation
            return {"rows": 99}
        with open(os.path.join(work_dir, "out.bin"), "wb") as f:
            f.write(b"ok")
        return {"rows": 1}

    m = pipe.external_stage("slow_feed", slow_then_fast, max_attempts=3, timeout_sec=0.3)
    assert m["attempts"] == 2 and m["meta"]["rows"] == 1
    assert os.path.exists(os.path.join(m["path"], "out.bin"))


def test_external_stage_stale_scratch_reaped_on_rerun(spark, tmp_path):
    """Scratch dirs from a crashed previous PROCESS are removed at stage
    start; committed outputs are untouched."""
    root = tmp_path / "ckpt"
    pipe = CheckpointedPipeline(spark, str(root))
    stage_root = root / "feed"
    (stage_root / "_scratch_v1_a1").mkdir(parents=True)
    (stage_root / "_scratch_v1_a1" / "partial.bin").write_bytes(b"junk")

    calls: list = []
    m = pipe.external_stage("feed", _importer(calls))
    assert m["version"] == 1 and len(calls) == 1
    assert not (stage_root / "_scratch_v1_a1").exists()
