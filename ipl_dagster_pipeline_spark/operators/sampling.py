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

``sample_stratified`` generalizes the same construction to PER-STRATUM keep
fractions — the source-mixture-weighting step of a pretraining data recipe
(downsample an over-represented crawl source, keep all of a curated one)
with the same guarantees: pure projection, no RNG, identical sample at any
parallelism, replayable in ANSI SQL.
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


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    seed: int = 13,
    granularity: int = GRANULARITY,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash bucket is
    below its stratum's fraction boundary (source-mixture weighting).

    Unlike ``df.sampleBy`` this is a pure projection + filter: no RNG, no
    driver round-trip, the exact same rows survive at any parallelism and on
    any engine — so a mixture decision made at 100 TB is reproducible and
    auditable.  Fractions are exact to 1/granularity; strata absent from
    ``fractions`` keep ``default_fraction``.  The hash key should be the
    entity id (doc/conv), so resampling a stratum never splits an entity.
    """
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {name!r} must be in [0, 1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    bucket = split_bucket(F.col(key_col), seed, granularity)
    bound = F.lit(round(default_fraction * granularity))
    for name, frac in fractions.items():
        bound = F.when(F.col(strata_col) == name, F.lit(round(frac * granularity))).otherwise(bound)
    return df.filter(bucket < bound)
