"""spark-submit entrypoint: incremental dedup-index maintenance.

    spark-submit --py-files ipl_dagster_pipeline_spark.zip jobs/dedup_index_update.py \
        --index /data/dedup_index --add /data/batches/2026-08-17.parquet \
        --batch-id 2026-08-17 [--maintain]

Each invocation appends ONE batch of documents to the persistent MinHash/LSH
index (operators/dedup_index.MinHashIndex): probe the stored band table,
Jaccard-verify the candidates, commit new pairs + band rows + docs as tagged
snapshots.  Re-running a batch-id is a no-op resume (idempotent); pass
``--maintain`` periodically to compact append chains and expire history.

This is the daily-cadence complement to jobs/corpus_dedup.py (which
recomputes the full corpus): at 100 TB the full recompute runs once, then
every append costs O(batch + matched neighborhood).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from ipl_dagster_pipeline_spark.operators.dedup_index import MinHashIndex
from ipl_dagster_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="index root directory")
    ap.add_argument("--add", help="parquet path of the document batch to index")
    ap.add_argument("--batch-id", help="idempotence tag for this batch (required with --add)")
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--max-bucket", type=int, default=1000)
    ap.add_argument("--maintain", action="store_true",
                    help="compact append chains + expire old snapshots after the add")
    ap.add_argument("--keep-last", type=int, default=3)
    ap.add_argument("--target-files", type=int, default=32)
    args = ap.parse_args()
    if args.add and not args.batch_id:
        ap.error("--add requires --batch-id")

    spark = get_spark(app_name="ipl-dedup-index")
    idx = MinHashIndex(args.index, threshold=args.jaccard, max_bucket=args.max_bucket)

    report: dict = {"index": args.index}
    if args.add:
        batch = spark.read.parquet(args.add).select("doc_id", "text")
        new_pairs = idx.add_batch(batch, batch_id=args.batch_id)
        report["batch_id"] = args.batch_id
        report["new_pairs"] = new_pairs.count()
    if args.maintain:
        report["maintain"] = idx.maintain(
            spark, keep_last=args.keep_last, target_files=args.target_files
        )
    if idx.pairs.current_snapshot_id() is not None:
        report["total_pairs"] = idx.all_pairs(spark).count()
        report["duplicate_members"] = idx.keepers(spark).count()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
