"""Deterministic release of persisted intermediates.

Several operators persist mid-pipeline frames that are read more than once
(MinHash shingles, LSH band/bucket frames, the prefix-sum local cumsums).
Within one query that is correct and necessary — but in a long-lived session
(bench reruns, streaming foreachBatch, the multi-stage curation job) the
blocks would pin executor storage until LRU eviction.

Every operator persist goes through :func:`tracked_persist`; after the
action that consumes a stage, the caller releases everything with
:func:`release_tracked` (the checkpointed pipeline does this automatically
per stage).  Reference precedent for explicit resource hygiene at stage
boundaries: the io-manager closes its COPY buffers per publish
(postgis_geopandas_io_manager.py:96-107).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` and register it for a later bulk release."""
    out = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(out)
    return out


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist(blocking)
        except Exception:  # session already stopped — nothing to release
            pass
        n += 1
    return n
