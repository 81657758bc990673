"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {name: sec}, "sf": ...}

Execution is forced with the noop sink (full pipeline runs, nothing collected
to the driver).  Also reports turns/sec for the flagship feature build — the
BASELINE.json target metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from ipl_dagster_pipeline_spark.session import get_spark

HEADLINE = [
    "flagship_features",
    "rich_features",
    "sessionize_window",
    "sessionize_grouped",
    "asof_broadcast_range",
    "asof_cogrouped",
    "rolling_range",
    "session_aggregates",
    "salted_agg_by_conv",
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "broadcast_enrich",
    "doc_minhash_lsh_pairs",
    "emb_cosine_topk",
]

# round-2 training-data scale paths — timed separately (steady-state, one
# run after a warm pass) so the headline `value` stays comparable to round 1
EXTENDED = [
    "emb_near_dup_lsh",
    "emb_dup_components",
    "emb_ivf_topk",
    "doc_winnow_fingerprints",
    "doc_collapse_repeats",
    "doc_contamination",
    "doc_hash_split",
    "media_sample_frames",
    # round-3 additions: mixture/budget/shard recipe ops (keyed + global
    # distributed prefix sums, single Arrow local-cumsum pass)
    "doc_mixture_epochs",
    "doc_token_budget",
    "doc_shuffle_shards",
    # round-4 additions: exact inverted-index Jaccard, SCD2 intervals,
    # MERGE-upsert, pinned-quantizer IVF (the value-hashed ANN gate row),
    # BM25 lexical ranking, robust MAD outliers
    "doc_ngram_jaccard",
    "dim_scd2_history",
    "dim_merge_upsert",
    "emb_ivf_topk_oracle",
    "doc_bm25",
    "doc_length_outliers",
    # round-5 additions: real-BPE budget metering, incremental index probe
    # (includes its snapshot-table writes), wrapped-grid geo radius join
    "doc_bpe_token_budget",
    "doc_incr_index_probe",
    "geo_station_proximity",
    "doc_lm_surprisal",
    "doc_containment_pairs",
    "source_unigram_kl",
    # round-5 feature/analytics additions: PIT target encoding, decayed
    # activity, HLL sketch, PMI phrases, fixed-point PageRank, skew profile,
    # rolling quantiles
    "event_target_encode",
    "event_decayed_features",
    "event_hll_users",
    "doc_pmi_collocations",
    "event_pagerank",
    "event_skew_profile",
    "event_rolling_quantiles",
    "event_cms_user_counts",
    # round-5 fit/transform family: frozen-stat feature vectors, frozen-edge
    # quantile bins, hashed crosses, frequency encoding, frozen-vocab TF-IDF,
    # and token-window chunking (documents → training windows)
    "event_feature_vectors",
    "event_quantile_bins",
    "event_hash_cross",
    "event_count_encoding",
    "doc_tfidf_vectors",
    "doc_token_chunks",
    # round-5 feature-selection statistics: exact-integer pairwise Pearson
    # (one global agg) and contingency MI (single scan, milli-nat sum)
    "event_feature_correlations",
    "event_type_hour_mi",
    # round-5 contrastive negatives: dense-position prefix sum + hash draws
    "doc_negative_pairs",
    # round-5 drift monitor + class balancing
    "event_value_psi",
    "event_class_balance",
    # round-5 frozen-fit preprocessing: median impute + p5/p95 winsorize
    "event_imputed_clipped",
    # round-5 wide→long melt (single Expand pass)
    "event_feature_melt",
    # round-6 additions: literal XML decode → cifs chain, mergeable
    # log-histogram quantile sketch (build + reads), ANN recall@k
    # observability, MinHash fuzzy decontamination vs broadcast benchmark
    "incident_xml_pipeline",
    "event_value_sketch",
    "event_sketch_quantiles",
    "emb_ann_recall",
    "doc_fuzzy_contamination",
    "event_morton_layout",
    "event_imputed_clipped_sketch",
]


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()
    # free tracked persisted intermediates so back-to-back queries don't
    # accumulate executor storage across the run
    from ipl_dagster_pipeline_spark.caching import release_tracked

    release_tracked()


def timed_pass(qs, spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        force(qs[name](spark, sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def fresh_session(cpus: str, sf_dir: str):
    """Restart the SparkContext (same JVM) for an accumulation-free sample.

    Round-5 verdict: per-query numbers inflated up to ~2.7x when the steady
    pass ran after ~60 other queries in the same session (listener/status
    state, shuffle-dir growth, GC pressure) — a measurement artifact, not a
    plan regression.  Stopping the context and rebuilding it in the same JVM
    resets all of that while keeping what makes a pass "steady": HotSpot JIT
    and the static whole-stage-codegen class cache both survive a context
    restart.  One tiny uncounted job absorbs per-context start cost so the
    first timed query doesn't pay it.
    """
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(app_name="ipl-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm executors + FS, uncounted
    return spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # ≥2 full steady samples per invocation: this sandbox throttles in
    # multi-minute windows, so any single sample can be uniformly inflated —
    # committing all samples with the best marked makes rounds comparable
    # best-vs-best (one sample twice looked like an 18% regression in r4).
    n_samples = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "2")))
    spark = get_spark(app_name="ipl-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    # all_queries keeps the round-1/2-comparable un-merged names (the exported
    # queries() is the consolidated 50-entry driver gate)
    qs = entry_mod.all_queries()

    # warm the JVM + parquet footers once (not counted)
    n_turns = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # The FIRST headline pass includes per-stage JIT/codegen warmup (each
    # query contributes fresh generated classes — a constant that vanishes at
    # real scale); `value` stays this cold-pass sum for cross-round
    # comparability.  Every later pass is engine steady state.
    cold = timed_pass(qs, spark, sf_dir, HEADLINE)
    for name in EXTENDED:
        force(qs[name](spark, sf_dir))  # extended codegen warm pass (uncounted)

    samples: list[dict] = []
    for i in range(n_samples):
        # each steady sample runs in a freshly restarted context (see
        # fresh_session) with the pass order reversed on odd samples, so a
        # query's best-of never depends on where it sits in the pass
        spark = fresh_session(cpus, sf_dir)
        head_order = HEADLINE if i % 2 == 0 else list(reversed(HEADLINE))
        ext_order = EXTENDED if i % 2 == 0 else list(reversed(EXTENDED))
        head = timed_pass(qs, spark, sf_dir, head_order)
        ext = timed_pass(qs, spark, sf_dir, ext_order)
        samples.append(
            {
                "sample": i + 1,
                "order": "forward" if i % 2 == 0 else "reversed",
                "queries_steady": head,
                "queries_extended_steady": ext,
                "total_steady": round(sum(head.values()), 3),
                "total_extended_steady": round(sum(ext.values()), 3),
            }
        )

    # best-of across samples, per query (the throttle-resistant reading)
    best_head = {n: min(s["queries_steady"][n] for s in samples) for n in HEADLINE}
    best_ext = {n: min(s["queries_extended_steady"][n] for s in samples) for n in EXTENDED}

    total = round(sum(cold.values()), 3)
    flag = cold.get("flagship_features") or 1e-9
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline query wall time (feature-build engine, local)",
                "value": total,
                "unit": "sec",
                "queries": cold,
                "value_steady": round(sum(best_head.values()), 3),
                "queries_steady": best_head,
                "queries_extended_steady": best_ext,
                "n_samples": n_samples,
                "samples": samples,
                "best": {
                    "queries_steady": best_head,
                    "queries_extended_steady": best_ext,
                    "total_steady": round(sum(best_head.values()), 3),
                    "total_extended_steady": round(sum(best_ext.values()), 3),
                },
                "timing": (
                    "queries = first run (cold, incl. codegen warmup; round-1-comparable); "
                    f"samples = {n_samples} full steady passes, each in a freshly restarted "
                    "SparkContext (same JVM: JIT + codegen cache stay warm, session "
                    "accumulation resets) with pass order reversed on odd samples; "
                    "queries_steady/best = per-query minimum across samples "
                    "(compare rounds best-vs-best — single samples carry sandbox throttle windows)"
                ),
                "sf": float(sf),
                "turns": n_turns,
                "flagship_turns_per_sec": round(n_turns / flag, 1),
                "flagship_turns_per_sec_steady": round(n_turns / (best_head.get("flagship_features") or 1e-9), 1),
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
