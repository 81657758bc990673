"""Per-stage lineage + row-count/checksum metrics (north rule; SURVEY §2.2 K6).

Reference precedent: every publish emits ``num_rows`` output metadata
(postgis_geopandas_io_manager.py:103,260) and dedup deltas are warned
(lamassu.py:306-311).  Here every stage can emit:

* a zero-cost ``df.observe`` row-count/checksum (collected on action), and
* a per-PARTITION lineage frame (partition_id, row_count, checksum) computed
  with map-side partial aggregation (spark_partition_id groupBy — the shuffle
  moves only one row per partition), appended to a parquet ``_lineage`` table.

Checksums are order-insensitive (sum of per-row crc32) so they are stable
under any partitioning/parallelism.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# named-observation registry: operators that silently cap/drop rows (LSH
# oversized buckets) register an Observation here so the enclosing pipeline
# can report the dropped counts after its action — the A4-style dedup-delta
# warning (reference lamassu.py:306-311) made queryable.
# ---------------------------------------------------------------------------

_OBS_COUNTER = itertools.count()
STAGE_OBSERVATIONS: dict[str, Observation] = {}


def register_observation(prefix: str) -> Observation:
    """A fresh uniquely-named Observation, retrievable by its prefix via
    :func:`observed_metrics` after the consuming action ran."""
    name = f"{prefix}_{next(_OBS_COUNTER)}"
    obs = Observation(name)
    STAGE_OBSERVATIONS[name] = obs
    return obs


def _probe_completed(obs: Observation, deadline: float) -> bool | None:
    """True/False = the pinned-Spark private probe (``obs._jo.future()``)
    says completed / not completed by ``deadline``; None = the probe API is
    gone (Spark upgrade drift) — caller must use the public fallback."""
    import time

    jo = getattr(obs, "_jo", None)
    if jo is None:  # never attached to a DataFrame — definitively not run
        return False
    try:
        while not jo.future().isCompleted():
            if time.monotonic() >= deadline:
                return False
            time.sleep(0.02)
        return True
    except Exception:  # private API drifted — signal "probe unavailable"
        return None


def _get_with_timeout(obs: Observation, timeout_secs: float) -> dict | None:
    """Public-API fallback for drifted Spark: ``obs.get`` on a daemon thread
    bounded by ``timeout_secs``.  ``obs.get`` blocks forever if the observing
    action never ran — the daemon thread caps that at one (leaked, idle)
    thread per un-run observation instead of blocking the pipeline."""
    import threading

    box: list[dict] = []

    def fetch() -> None:
        try:
            box.append(obs.get)
        except Exception:
            pass

    t = threading.Thread(target=fetch, daemon=True)
    t.start()
    t.join(max(timeout_secs, 0.05))
    return box[0] if box else None


def observed_metrics(prefix: str, timeout_secs: float = 1.0) -> dict[str, dict]:
    """All collected metrics for observations registered under ``prefix``
    whose action has already executed (un-executed ones are skipped; metric
    delivery is listener-async, so attached-but-not-yet-delivered ones are
    polled up to ``timeout_secs``).

    Successfully read observations are CONSUMED (dropped from the registry):
    repeated polls in a long-lived session — bench loops, streaming
    foreachBatch — neither leak JVM-backed Observation objects nor report
    stale counts from earlier queries.  Un-run ones stay registered.

    Probe order: the pinned-Spark completion probe (``obs._jo.future()``,
    non-blocking) first; if that private API disappears in a Spark upgrade,
    the public ``obs.get`` bounded by a daemon-thread timeout — cap-honesty
    degrades to a bounded wait, never to silently-off (round-3 verdict #3).

    Caveat: an observation attached to a plan branch that AQE prunes away
    entirely (e.g. empty-relation propagation when EVERY bucket was dropped)
    never fires — treat "absent" as "branch never executed"."""
    import time

    out: dict[str, dict] = {}
    deadline = time.monotonic() + timeout_secs
    for name, obs in list(STAGE_OBSERVATIONS.items()):
        if not name.startswith(prefix):
            continue
        ready = _probe_completed(obs, deadline)
        if ready is False:
            continue
        if ready is None:  # API drift — public fallback with bounded wait
            if getattr(obs, "_jo", None) is None:
                continue
            row = _get_with_timeout(obs, deadline - time.monotonic())
            if row is None:
                continue
            out[name] = row
            STAGE_OBSERVATIONS.pop(name, None)
            continue
        try:
            out[name] = obs.get
        except Exception:
            # completed but unreadable — ALSO consumed: a permanently-raising
            # observation must not accumulate in long-lived sessions
            # (advice r4 #3); it will never become readable later.
            STAGE_OBSERVATIONS.pop(name, None)
            continue
        STAGE_OBSERVATIONS.pop(name, None)
    return out


def clear_observations(prefix: str = "") -> int:
    """Drop registered observations matching ``prefix`` (all by default) —
    the explicit stage-boundary hook for long-lived sessions; returns how
    many were dropped."""
    names = [n for n in STAGE_OBSERVATIONS if n.startswith(prefix)]
    for n in names:
        STAGE_OBSERVATIONS.pop(n, None)
    return len(names)


def _row_checksum(df: DataFrame) -> F.Column:
    """Order-insensitive row checksum: crc32 of the canonical JSON of all
    columns.  Summed per group → insensitive to row order and partitioning."""
    return F.crc32(F.to_json(F.struct(*[F.col(c) for c in df.columns])).cast("binary"))


def observe_stage(df: DataFrame, stage: str) -> tuple[DataFrame, Observation]:
    """Attach a named observation: rows + checksum, evaluated for free with
    whatever action executes the plan.  Usage:

        df, obs = observe_stage(df, 'convert')
        df.write...   # any action
        obs.get  # {'rows': ..., 'checksum': ...}
    """
    obs = Observation(stage)
    return df.observe(obs, F.count(F.lit(1)).alias("rows"), F.sum(_row_checksum(df)).alias("checksum")), obs


def partition_lineage(df: DataFrame, stage: str, snapshot_id: int = 0) -> DataFrame:
    """Per-partition (row_count, checksum) lineage frame for ``df`` as it is
    currently partitioned.  Partial-aggregates map-side; one output row per
    input partition.  ``snapshot_id`` ties the lineage rows to one committed
    snapshot so reconciliation never mixes recomputed runs."""
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("row_count"), F.sum(_row_checksum(df)).alias("checksum"))
        .select(
            F.lit(stage).alias("stage"),
            F.lit(snapshot_id).cast("long").alias("snapshot_id"),
            F.col("__pid").alias("partition_id"),
            "row_count",
            "checksum",
            F.current_timestamp().alias("committed_at"),
        )
    )


def append_lineage(lineage: DataFrame, lineage_path: str) -> None:
    """Append lineage rows to the parquet ``_lineage`` table (the engine's
    metrics sink; an Iceberg metadata table in production).

    The frame is coerced to ``schema.LINEAGE_SCHEMA`` first — a drifted
    producer (missing snapshot_id, wrong dtype) fails here, at the write
    boundary, not at some later reconciliation read."""
    from .schema import LINEAGE_SCHEMA

    missing = {f.name for f in LINEAGE_SCHEMA.fields} - set(lineage.columns)
    if missing:
        raise ValueError(f"lineage frame missing columns: {sorted(missing)}")
    from .schema import enforce_schema

    enforce_schema(lineage, LINEAGE_SCHEMA).write.mode("append").parquet(lineage_path)


def total_from_lineage(
    spark, lineage_path: str, stage: str, snapshot_id: int | None = None
) -> tuple[int, int]:
    """Reconcile a stage from its lineage rows: (total rows, total checksum).

    Only the requested snapshot is summed (default: the stage's LATEST
    snapshot) — summing all history would double-count recomputed stages.
    """
    lin = spark.read.parquet(lineage_path).filter(F.col("stage") == stage)
    if snapshot_id is None:
        latest = lin.agg(F.max("snapshot_id")).collect()[0][0]
        if latest is None:
            return 0, 0
        snapshot_id = latest
    row = (
        lin.filter(F.col("snapshot_id") == snapshot_id)
        .agg(F.sum("row_count").alias("r"), F.sum("checksum").alias("c"))
        .collect()[0]
    )
    return int(row["r"] or 0), int(row["c"] or 0)
