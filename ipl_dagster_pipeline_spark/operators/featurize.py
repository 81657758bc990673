"""Leakage-safe feature-vector assembly: standardization fit on the train
fold only, one-hot with an EXPLICIT domain, and the hashing trick for
high-cardinality categoricals.

This is the last mile of a feature-engineering pipeline: turning typed
columns into the fixed-width numeric feature columns a trainer consumes.
The three classic hazards it closes:

* **fit/transform leakage** — scaler statistics computed over ALL rows leak
  val/test distribution into training features.  ``standardize_fit`` takes
  the frame you give it (pass the TRAIN fold, selected by the deterministic
  ``sampling.hash_split``), and ``standardize_transform`` applies those
  frozen statistics to any frame — the same PIT discipline as
  ``encoding.target_encode_pit`` applied to dataset-level stats.
* **silent domain drift** — ``one_hot`` requires the category domain to be
  DECLARED (like the reference's explicit pivot domains / enum mappings,
  pipeline/assets/sharing.py form-factor classes); unseen values go to the
  ``{prefix}_other`` column instead of silently minting new feature columns
  that break schema stability between runs.
* **unbounded categorical width** — ``hash_bucket_onehot`` folds any
  cardinality into ``n_buckets`` indicator columns via the portable 60-bit
  md5 hash (identical assignment on any engine, any parallelism).

Determinism contract (cross-engine exact): inputs are quantized to INTEGER
milli-units per row BEFORE aggregation, so fit statistics are exact BIGINTs
(sum and sum-of-squares; milli scaling keeps sumsq < 2^63 for values up to
~1e6 over 1e8 rows); the z-score is then a FIXED sequence of IEEE double
ops over those integers — bit-identical in any engine — rounded at the end.

Scale shape: fit is one map-side-combined global aggregation producing a
single tiny row; transform/one-hot/hashing are pure projections over a
broadcast of that row — zero extra shuffles, fully codegen'd, and the plan
is identical at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ipl_dagster_pipeline_spark.operators.text_dedup import portable_hash

MILLI = 1_000


def value_milli(col: Column) -> Column:
    """Exact-integer milli-unit representation fit statistics sum over."""
    return F.round(col.cast("double") * MILLI).cast("long")


def standardize_fit(train: DataFrame, cols: list[str]) -> DataFrame:
    """One-row frame of frozen scaler statistics for ``cols``:
    ``n_<c>`` non-null count, ``s_<c>`` exact milli sum, ``q_<c>`` exact
    milli sum-of-squares (all BIGINT).  Pass the TRAIN fold only."""
    aggs = []
    for c in cols:
        v = value_milli(F.col(c))
        aggs += [
            F.count(v).alias(f"n_{c}"),
            F.coalesce(F.sum(v), F.lit(0)).cast("long").alias(f"s_{c}"),
            F.coalesce(F.sum(v * v), F.lit(0)).cast("long").alias(f"q_{c}"),
        ]
    return train.agg(*aggs)


def zscore_expr(c: str, decimals: int = 6) -> Column:
    """z = (v_milli − S/n) / sqrt(Q/n − (S/n)²) from the frozen integers —
    a fixed IEEE op sequence, identical cross-engine; degenerate fits
    (n = 0 or zero variance) yield 0.0 rather than NaN/±inf."""
    v = value_milli(F.col(c)).cast("double")
    # greatest(n, 1): ANSI mode raises on 0-divide even on the branch the
    # CASE discards; an empty fit lands in the n==0 arm regardless.
    n = F.greatest(F.col(f"n_{c}"), F.lit(1)).cast("double")
    mean = F.col(f"s_{c}").cast("double") / n
    var = F.col(f"q_{c}").cast("double") / n - mean * mean
    z = F.round((v - mean) / F.sqrt(var), decimals)
    return F.when((F.col(f"n_{c}") == 0) | (var <= 0), F.lit(0.0)).otherwise(z)


def standardize_transform(
    df: DataFrame, stats: DataFrame, cols: list[str], prefix: str = "z"
) -> DataFrame:
    """``df`` plus ``{prefix}_<c>`` z-score columns under the frozen stats
    (broadcast cross join of the single stats row; NULL in → NULL out)."""
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        out = out.withColumn(f"{prefix}_{c}", zscore_expr(c))
    return out.drop(*[k for c in cols for k in (f"n_{c}", f"s_{c}", f"q_{c}")])


def one_hot(
    df: DataFrame, col: str, domain: list[str], prefix: str | None = None
) -> DataFrame:
    """Indicator columns ``{prefix}_<value>`` over the DECLARED domain plus
    ``{prefix}_other`` for anything outside it (NULL counts as other).
    Schema is a pure function of ``domain`` — never of the data."""
    p = prefix or col
    out = df
    for v in domain:
        out = out.withColumn(
            f"{p}_{v}", F.when(F.col(col) == v, F.lit(1)).otherwise(F.lit(0))
        )
    in_domain = F.col(col).isin(domain)
    out = out.withColumn(
        f"{p}_other", F.when(in_domain, F.lit(0)).otherwise(F.lit(1))
    )
    return out


def hash_bucket_onehot(
    df: DataFrame, col: str, n_buckets: int, seed: int = 11, prefix: str = "hb"
) -> DataFrame:
    """The hashing trick: indicator columns ``{prefix}_0 … {prefix}_{n−1}``
    from the portable hash of ``col`` — fixed width at ANY cardinality.
    NULL keys bucket on the ``<null>`` sentinel (deterministic, not
    dropped), matching ``sampling.split_bucket``."""
    b = F.pmod(
        portable_hash(F.coalesce(F.col(col).cast("string"), F.lit("<null>")), seed),
        F.lit(n_buckets),
    )
    out = df.withColumn("__hb", b)
    for i in range(n_buckets):
        out = out.withColumn(
            f"{prefix}_{i}", F.when(F.col("__hb") == i, F.lit(1)).otherwise(F.lit(0))
        )
    return out.drop("__hb")
