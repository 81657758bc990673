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

Concurrency contract (round-3 ADVICE): the global registry is
lock-protected, and a pipeline that shares one SparkSession with OTHER
concurrently running pipelines should wrap its work in
:func:`tracked_scope` — persists registered on that thread inside the scope
are released at scope exit and never touch the global registry, so one
pipeline's release can't unpersist a frame another thread still reads.
Unscoped use keeps the original single-pipeline-at-a-time semantics.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []
_SCOPES = threading.local()  # .stack: list[list[DataFrame]] per thread


def tracked_persist(df: DataFrame, storage_level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` and register it for a later bulk release.

    Registers with the innermost active :func:`tracked_scope` on this thread
    if one exists, else with the process-global registry."""
    out = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    stack = getattr(_SCOPES, "stack", None)
    if stack:
        stack[-1].append(out)
    else:
        with _LOCK:
            _TRACKED.append(out)
    return out


def _release(frames: list[DataFrame], blocking: bool) -> int:
    n = 0
    while frames:
        try:
            frames.pop().unpersist(blocking)
        except Exception:  # session already stopped — nothing to release
            pass
        n += 1
    return n


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every GLOBALLY tracked frame; returns how many were
    released.  Scoped frames (inside a :func:`tracked_scope`) are not
    touched — their scope owns them."""
    with _LOCK:
        frames, _TRACKED[:] = _TRACKED[:], []
    return _release(frames, blocking)


@contextmanager
def tracked_scope(blocking: bool = False) -> Iterator[list[DataFrame]]:
    """Isolate this thread's tracked persists: frames persisted inside the
    ``with`` block are released at exit, and a concurrent pipeline calling
    :func:`release_tracked` (or running its own scope) cannot release them."""
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    frames: list[DataFrame] = []
    stack.append(frames)
    try:
        yield frames
    finally:
        stack.pop()
        _release(frames, blocking)
