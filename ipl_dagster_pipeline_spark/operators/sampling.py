"""Deterministic dataset splitting / sampling for training-data pipelines.

A training corpus needs train/val/test assignment that is (a) deterministic
across runs, engines, and cluster sizes, (b) a pure projection — no shuffle,
no RNG state, no sampleBy driver round-trip — and (c) stable under
repartitioning (``rand()`` and ``df.sample`` are neither engine-portable nor
re-run-stable).  The split key is the PORTABLE md5 hash (text_dedup.portable_
hash), so the DuckDB oracle reproduces the exact assignment bit-for-bit.

``hash_split`` buckets ``portable_hash(key) % granularity`` against cumulative
fraction boundaries; entity-keyed splits (e.g. conv_id) keep every row of an
entity in one fold — the leakage-safe way to split conversation data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_dedup import portable_hash

GRANULARITY = 10_000


def split_bucket(key: Column, seed: int = 7, granularity: int = GRANULARITY) -> Column:
    """Deterministic bucket in [0, granularity) from the portable hash.

    Null keys hash as the sentinel string ``<null>`` (not SQL-null): every
    null-keyed row lands deterministically in ONE fold instead of getting a
    null assignment that silently falls out of every split."""
    return F.pmod(
        portable_hash(F.coalesce(key.cast("string"), F.lit("<null>")), seed),
        F.lit(granularity),
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    seed: int = 7,
    out_col: str = "split",
    granularity: int = GRANULARITY,
) -> DataFrame:
    """Assign each row to a named fold by hashing ``key_col``.

    Pure projection (codegen'd, zero shuffle); identical assignment at any
    parallelism, any engine.  Fractions must sum to 1 (validated).
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = split_bucket(F.col(key_col), seed, granularity)
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        bound = round(acc * granularity)
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)
