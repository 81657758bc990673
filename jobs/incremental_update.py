"""spark-submit entrypoint: incremental / late-data feature maintenance.

    # bootstrap: snapshot the events-derived transcripts + full feature build
    python jobs/incremental_update.py --input /root/testdata/sf0.01 --work /tmp/ipl_incr --bootstrap
    # later: append late turns (here: simulated) and update only touched buckets
    python jobs/incremental_update.py --work /tmp/ipl_incr --simulate-late
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pyspark.sql.functions as F

from ipl_dagster_pipeline_spark.io import SnapshotTable
from ipl_dagster_pipeline_spark.plans.features import build_turn_features
from ipl_dagster_pipeline_spark.plans.incremental import incremental_update, write_feature_buckets
from ipl_dagster_pipeline_spark.session import get_spark
from ipl_dagster_pipeline_spark.sources.transcripts import (
    tool_dim_from_events,
    transcripts_from_events,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01")
    ap.add_argument("--work", default="/tmp/ipl_incremental")
    ap.add_argument("--bootstrap", action="store_true")
    ap.add_argument("--simulate-late", action="store_true")
    ap.add_argument("--since-snapshot", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="ipl-incremental")
    tbl = SnapshotTable(os.path.join(args.work, "transcripts"))
    feats_path = os.path.join(args.work, "features")
    dim_path = os.path.join(args.work, "tool_dim")
    state_path = os.path.join(args.work, "state.json")

    if args.bootstrap:
        t = transcripts_from_events(spark, args.input)
        tool_dim_from_events(spark, args.input).write.mode("overwrite").parquet(dim_path)
        snap = tbl.commit(t)
        dim = spark.read.parquet(dim_path)
        write_feature_buckets(build_turn_features(t, dim), feats_path)
        with open(state_path, "w") as fh:
            json.dump({"last_processed_snapshot": snap}, fh)
        print(json.dumps({"bootstrapped": True, "snapshot": snap, "rows": t.count()}))
        return

    dim = spark.read.parquet(dim_path)
    if args.simulate_late:
        # late batch: 25 extra turns for 5 conversations, after current max ts
        late = (
            tbl.read(spark)
            .filter(F.col("conv_id").isin([f"c{i}" for i in range(5)]))
            .groupBy("conv_id")
            .agg(F.max("turn_idx").alias("mx"), F.max("ts").alias("mts"))
            .join(tbl.read(spark).filter("turn_idx <= 5"), "conv_id")
            .select(
                "conv_id",
                (F.col("turn_idx") + F.col("mx")).cast("int").alias("turn_idx"),
                "role",
                F.concat(F.lit("late-"), F.col("text")).alias("text"),
                "tool",
                (F.col("mts") + F.make_interval(secs=F.col("turn_idx") * 60.0)).alias("ts"),
            )
        )
        tbl.commit(late, mode="append")

    since = args.since_snapshot
    if since is None:
        with open(state_path) as fh:
            since = json.load(fh)["last_processed_snapshot"]
    stats = incremental_update(spark, tbl, dim, feats_path, since_snapshot_id=since)
    with open(state_path, "w") as fh:
        json.dump({"last_processed_snapshot": stats["to_snapshot"]}, fh)
    total = spark.read.parquet(feats_path).count()
    print(json.dumps({**stats, "features_total_rows": total}))


if __name__ == "__main__":
    main()
