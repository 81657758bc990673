"""Streaming maintenance operators (micro-batch, exactly-once via tags).

Shared helper: a foreachBatch ``batch_id`` is only meaningful within ONE
checkpoint lineage — Spark renumbers from 0 if the checkpoint directory is
lost or recreated, and batch 0 of the new lineage typically contains ALL
pending files.  A raw ``b{batch_id}`` tag persisted in a durable registry
would then silently suppress that differently-composed batch (round-6
ADVICE).  ``checkpoint_generation`` scopes tags to the streaming query id
Spark writes into the checkpoint's ``metadata`` file: same checkpoint →
same generation (crash replays still skip), fresh checkpoint → new
generation (nothing from the old lineage can suppress it).
"""

from __future__ import annotations

import json
import os


def checkpoint_generation(checkpoint_path: str) -> str:
    """The streaming query id of ``checkpoint_path``'s lineage (first 8 hex
    chars), or ``"nogen"`` before Spark has initialized the checkpoint.
    Stable across restarts of the same checkpoint; different for a fresh
    one."""
    meta = os.path.join(checkpoint_path, "metadata")
    try:
        with open(meta) as fh:
            return str(json.load(fh)["id"]).replace("-", "")[:8]
    except Exception:
        return "nogen"
