"""Incremental MinHash/LSH dedup-index maintenance.

A training-data pipeline at 100 TB does not re-fingerprint the corpus per
run — it appends a daily batch and probes a PERSISTENT index.  The one-shot
path (``text_dedup.minhash_lsh_dedup``) recomputes shingles → signatures →
bands → pairs over everything; this module keeps that state as snapshot
tables (io.SnapshotTable — atomic commit, append chains, expiration,
compaction) and makes each new batch cost O(batch + matched-neighborhood):

* ``bands``  — the stored probe table ``(doc_id, band, bucket)``: the ONLY
  thing a probe equi-joins against.  Exactly ``text_dedup.band_rows`` of the
  stored signatures, so probe-vs-full-recompute equivalence is structural.
* ``docs``   — ``(doc_id, text)`` of every indexed doc: the exact-Jaccard
  verification re-shingles ONLY the old docs a candidate matched (a
  semi-join — bounded by candidate fan-in, never corpus-sized).  At scale
  this is the canonical corpus table the pipeline maintains anyway, not an
  extra copy.
* ``pairs``  — every Jaccard-verified pair found so far, appended per batch.

Equivalence contract (tested in tests/test_dedup_index.py):
``add_batch(b1); add_batch(b2)`` yields the same pair set and keeper set as
``minhash_lsh_dedup(b1 ∪ b2)``, because a probe joins the new band rows
against old ∪ new — every pair with ≥1 new side shares a bucket in both
constructions, and old-old pairs were emitted by an earlier probe.  The one
documented divergence is the oversized-bucket cap: the incremental path
evaluates ``max_bucket`` against the union size AT PROBE TIME, so a bucket
that crosses the cap mid-history stops emitting FUTURE pairs (already
verified pairs stand — the cap is a cost guard, not semantics) while a full
recompute would drop the bucket wholesale.  Dropped probe rows stay
observable (``metrics.observed_metrics('incr_lsh_dropped')``).

Resume/idempotence: each ``add_batch`` tags its three commits with
``batch_id`` (manifest ``meta`` — the Iceberg wap.id pattern).  Re-running a
batch skips tables that already committed it, so a crash between commits
resumes instead of double-appending; the ``docs`` commit lands LAST and is
the batch-done marker.

Scale shape: the probe is an equi shuffle join on (band, bucket) with the
union-size cap riding the same shuffle as a count window; signatures are one
md5 per shingle + affine mixes (text_dedup.minhash_params); components are
recomputed over the PAIRS table only (pairs ≪ docs — label propagation cost
is duplicate-graph-sized, not corpus-sized).

Reference parity: the reference re-fetches and re-converts sources per run
and relies on If-Modified-Since to skip work (util/urllib.py:59-72);
this is that incremental discipline applied to the dedup state itself.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..io import SnapshotTable
from ..metrics import register_observation
from .graph import duplicate_groups
from .text_dedup import (
    N_BANDS,
    N_HASHES,
    band_rows,
    jaccard_pairs,
    minhash_signatures,
    shingles,
)


class MinHashIndex:
    """Persistent banded-MinHash near-dup index over append-only batches."""

    def __init__(
        self,
        root: str,
        k: int = 5,
        threshold: float = 0.5,
        n_hashes: int = N_HASHES,
        n_bands: int = N_BANDS,
        max_bucket: int = 1000,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.root = root
        self.params = {
            "k": k,
            "threshold": threshold,
            "n_hashes": n_hashes,
            "n_bands": n_bands,
            "max_bucket": max_bucket,
            "id_col": id_col,
            "text_col": text_col,
        }
        os.makedirs(root, exist_ok=True)
        # pin the fingerprint parameters to the index: probing k=5 state with
        # k=7 shingles would silently find nothing — fail loudly instead
        pfile = os.path.join(root, "index-params.json")
        if os.path.exists(pfile):
            with open(pfile) as fh:
                stored = json.load(fh)
            if stored != self.params:
                raise ValueError(
                    f"index at {root} was built with {stored}, opened with "
                    f"{self.params} — parameters are part of the index identity"
                )
        else:
            with open(pfile, "w") as fh:
                json.dump(self.params, fh)
        self.docs = SnapshotTable(os.path.join(root, "docs"))
        self.bands = SnapshotTable(os.path.join(root, "bands"))
        self.pairs = SnapshotTable(os.path.join(root, "pairs"))

    # -- helpers --------------------------------------------------------

    @staticmethod
    def _committed_batches(table: SnapshotTable) -> set[str]:
        return {
            m.get("meta", {}).get("batch_id")
            for m in table.snapshots()
            if m.get("meta", {}).get("batch_id")
        }

    def _batch_snapshot_df(self, spark: SparkSession, table: SnapshotTable, batch_id: str) -> DataFrame:
        for m in table.snapshots():
            if m.get("meta", {}).get("batch_id") == batch_id:
                return spark.read.parquet(m["data_dir"])
        raise KeyError(f"batch {batch_id!r} not committed to {table.root}")

    # -- core -----------------------------------------------------------

    def add_batch(self, batch: DataFrame, batch_id: str) -> DataFrame:
        """Index ``batch`` and return the NEW verified near-dup pairs —
        every (old, new) and (new, new) pair with Jaccard ≥ threshold.

        Probe = new band rows equi-joined against stored ∪ new band rows on
        (band, bucket); verification = exact Jaccard over the batch shingles
        plus the re-shingled MATCHED old docs only.  Idempotent per
        ``batch_id`` (a replay returns the already-committed pairs).
        """
        spark = batch.sparkSession
        p = self.params
        id_col, text_col = p["id_col"], p["text_col"]
        if batch_id in self._committed_batches(self.docs):  # docs commit = batch-done marker
            return self._batch_snapshot_df(spark, self.pairs, batch_id)

        sh_new = tracked_persist(shingles(batch, id_col, text_col, p["k"]))
        sig_new = minhash_signatures(sh_new, id_col, p["n_hashes"])
        rows_per_band = p["n_hashes"] // p["n_bands"]
        bands_new = band_rows(sig_new, id_col, p["n_bands"], rows_per_band).withColumn(
            "__new", F.lit(True)
        )
        if self.bands.current_snapshot_id() is not None:
            bands_all = (
                self.bands.read(spark)
                .select(id_col, "band", "bucket")
                .withColumn("__new", F.lit(False))
                .unionByName(bands_new)
            )
        else:
            bands_all = bands_new

        # union-size bucket cap rides the probe join's own (band, bucket)
        # shuffle; dropped probe rows are observable, never silent
        from pyspark.sql import Window

        wb = Window.partitionBy("band", "bucket")
        sized = tracked_persist(bands_all.withColumn("__bsize", F.count(F.lit(1)).over(wb)))
        obs = register_observation("incr_lsh_dropped")
        probe = (
            sized.observe(
                obs,
                F.sum((F.col("__new") & (F.col("__bsize") > p["max_bucket"])).cast("long")).alias(
                    "dropped_probe_rows"
                ),
                F.sum(F.col("__new").cast("long")).alias("probe_rows"),
            )
            .filter(F.col("__new") & (F.col("__bsize") <= p["max_bucket"]))
            .select(F.col(id_col).alias("__pid_a"), "band", "bucket")
        )
        base = sized.filter(F.col("__bsize") <= p["max_bucket"]).select(
            F.col(id_col).alias("__pid_b"), "band", "bucket"
        )
        cand = (
            probe.join(base, on=["band", "bucket"])
            .filter(F.col("__pid_a") != F.col("__pid_b"))
            .select(
                F.least("__pid_a", "__pid_b").alias("doc_a"),
                F.greatest("__pid_a", "__pid_b").alias("doc_b"),
            )
            .distinct()
        )
        cand = tracked_persist(cand)

        # verification shingles: the batch's (already persisted) + ONLY the
        # old docs that matched a candidate — a semi-join, candidate-bounded
        cand_ids = (
            cand.select(F.col("doc_a").alias(id_col))
            .unionByName(cand.select(F.col("doc_b").alias(id_col)))
            .distinct()
        )
        old_needed = cand_ids.join(
            batch.select(id_col), on=id_col, how="left_anti"
        )
        if self.docs.current_snapshot_id() is not None:
            old_docs = self.docs.read(spark).join(old_needed, on=id_col, how="leftsemi")
            sh_ver = sh_new.unionByName(shingles(old_docs, id_col, text_col, p["k"]))
        else:
            sh_ver = sh_new
        new_pairs = jaccard_pairs(cand, sh_ver, id_col, p["threshold"])

        meta = {"batch_id": batch_id}
        if batch_id not in self._committed_batches(self.pairs):
            self.pairs.commit(new_pairs, mode="append", meta=meta)
        if batch_id not in self._committed_batches(self.bands):
            self.bands.commit(bands_new.drop("__new"), mode="append", meta=meta)
        if batch_id not in self._committed_batches(self.docs):
            self.docs.commit(batch.select(id_col, text_col), mode="append", meta=meta)
        return self._batch_snapshot_df(spark, self.pairs, batch_id)

    # -- reads ----------------------------------------------------------

    def all_pairs(self, spark: SparkSession) -> DataFrame:
        """Every verified pair across all indexed batches."""
        return self.pairs.read(spark)

    def keepers(self, spark: SparkSession) -> DataFrame:
        """(member, keeper, is_keeper) over the CURRENT pair graph —
        recomputed from the pairs table only (duplicate-graph-sized)."""
        return duplicate_groups(self.all_pairs(spark))

    # -- maintenance ----------------------------------------------------

    def maintain(self, spark: SparkSession, keep_last: int = 3, target_files: int = 8) -> dict:
        """Periodic housekeeping: compact each table's append chain into one
        balanced overwrite snapshot, then expire pre-compaction history."""
        out = {}
        for name, tbl in (("docs", self.docs), ("bands", self.bands), ("pairs", self.pairs)):
            if tbl.current_snapshot_id() is None:
                continue
            tbl.compact(spark, target_files=target_files)
            out[name] = tbl.expire_snapshots(keep_last=keep_last)
        return out
