"""End-to-end spark-submit job surface: the full curation pipeline with the
round-3 recipe flags (--token-budget, --shards), checkpoint-resume, and
deterministic stage checksums across a forced recompute."""

from __future__ import annotations

import sys

import pyspark.sql.functions as F

from ipl_dagster_pipeline_spark.checkpoint import CheckpointedPipeline
from ipl_dagster_pipeline_spark.metrics import total_from_lineage

STAGES = ["curated", "exact", "groups", "pairs", "sharded", "stats"]


def _run_job(monkeypatch, out_dir: str, *extra: str) -> None:
    import jobs.corpus_dedup as job

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "corpus_dedup.py",
            "--input", "/root/testdata/sf0.001",
            "--output", out_dir,
            "--token-budget", "400",
            "--shards", "4",
            *extra,
        ],
    )
    job.main()


def _checksums(spark, root: str) -> dict[str, tuple[int, int]]:
    pipe = CheckpointedPipeline(spark, root)
    return {s: total_from_lineage(spark, pipe.lineage_path, s) for s in STAGES}


def test_corpus_job_bpe_budget_meter(spark, monkeypatch, tmp_path):
    """--bpe meters the budget in real BPE tokens: the stats stage carries
    n_bpe_tokens and the budget cap binds on the BPE running total."""
    out = str(tmp_path / "corpus_bpe")
    _run_job(monkeypatch, out, "--bpe")
    pipe = CheckpointedPipeline(spark, out)
    stats = pipe.table("stats").read(spark)
    assert "n_bpe_tokens" in stats.columns
    # BPE merges compress: strictly fewer tokens than word chars, ≥ ws tokens
    agg = stats.agg(
        F.sum("n_bpe_tokens").alias("bpe"), F.sum("n_ws_tokens").alias("ws")
    ).collect()[0]
    assert agg.bpe > agg.ws  # subword counts exceed whitespace-word counts
    curated = pipe.table("curated").read(spark)
    assert curated.filter(F.col("cum_tokens") > 400).count() == 0


def test_dedup_index_job_appends_and_resumes(spark, monkeypatch, tmp_path, capsys):
    """The daily-cadence CLI: two batch adds reproduce the full-recompute
    pair count, a replayed batch-id is a no-op, --maintain compacts without
    changing the pair set."""
    import json

    import jobs.dedup_index_update as job

    src = "/root/testdata/sf0.001/documents.parquet"
    half = str(tmp_path / "half.parquet")
    rest = str(tmp_path / "rest.parquet")
    docs = spark.read.parquet(src)
    docs.filter(F.col("doc_id") < 250).write.parquet(half)
    docs.filter(F.col("doc_id") >= 250).write.parquet(rest)
    idx_dir = str(tmp_path / "idx")

    def run(*argv: str) -> dict:
        monkeypatch.setattr(sys, "argv", ["dedup_index_update.py", *argv])
        job.main()
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    r1 = run("--index", idx_dir, "--add", half, "--batch-id", "b1")
    r2 = run("--index", idx_dir, "--add", rest, "--batch-id", "b2")
    from ipl_dagster_pipeline_spark.operators.text_dedup import minhash_lsh_dedup

    full = minhash_lsh_dedup(docs, threshold=0.5).count()
    assert r1["new_pairs"] + r2["new_pairs"] == full == r2["total_pairs"]
    replay = run("--index", idx_dir, "--add", rest, "--batch-id", "b2")
    assert replay["new_pairs"] == r2["new_pairs"] and replay["total_pairs"] == full
    maintained = run("--index", idx_dir, "--maintain", "--keep-last", "1",
                     "--target-files", "2")
    assert maintained["total_pairs"] == full
    assert maintained["duplicate_members"] == r2["duplicate_members"]


def test_corpus_job_budget_shards_resume_and_determinism(spark, monkeypatch, tmp_path):
    """Run the job with both recipe flags; assert (a) the budget stage caps
    every source's running token total, (b) shards are round-robin balanced,
    (c) a rerun RESUMES (no new snapshots, checksums unchanged), and (d) a
    --force recompute reproduces bit-identical stage checksums — the
    determinism the 'resumable from checkpoint' north rule depends on."""
    out = str(tmp_path / "corpus")
    _run_job(monkeypatch, out)

    pipe = CheckpointedPipeline(spark, out)
    assert pipe.completed_stages() == STAGES
    first = _checksums(spark, out)
    assert all(rows > 0 for rows, _ in first.values())

    curated = pipe.table("curated").read(spark)
    over = curated.filter(F.col("cum_tokens") > 400).count()
    assert over == 0, "token budget exceeded"
    assert set(r.split for r in curated.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }

    sharded = pipe.table("sharded").read(spark)
    sizes = sorted(
        r.n for r in sharded.groupBy("shard").agg(F.count("*").alias("n")).collect()
    )
    assert len(sizes) == 4 and sizes[-1] - sizes[0] <= 1
    assert sharded.count() == curated.count()

    # (c) resume: nothing recomputed, no lineage appended, checksums stable
    snaps_before = {s: pipe.table(s).current_snapshot_id() for s in STAGES}
    _run_job(monkeypatch, out)
    assert {s: pipe.table(s).current_snapshot_id() for s in STAGES} == snaps_before
    assert _checksums(spark, out) == first

    # (d) forced recompute: new snapshots, identical rows + checksums
    _run_job(monkeypatch, out, "--force")
    assert {s: pipe.table(s).current_snapshot_id() for s in STAGES} != snaps_before
    assert _checksums(spark, out) == first


def test_corpus_job_lm_gate(spark, monkeypatch, tmp_path):
    """--max-bits-per-bigram gates curation on the corpus-LM score: the
    stats stage carries the score columns and no curated doc exceeds the
    bound (NULL-scored short docs pass through to the length gates)."""
    out = str(tmp_path / "corpus_lm")
    _run_job(monkeypatch, out, "--max-bits-per-bigram", "9.0")
    pipe = CheckpointedPipeline(spark, out)
    stats = pipe.table("stats").read(spark)
    assert {"n_bigrams", "surprisal_mnats", "bits_per_bigram"} <= set(stats.columns)
    curated = pipe.table("curated").read(spark)
    assert curated.filter(F.col("bits_per_bigram") > 9.0).count() == 0
    assert curated.count() > 0  # the gate is a filter, not a wipe


def test_trainer_prep_job_resume_and_frozen_fits(spark, monkeypatch, tmp_path):
    """jobs/trainer_prep.py: run → resume (no recompute, identical
    checksums); the frozen fit artifacts are durable snapshots; features
    cover every fold under the train-only fits."""
    import jobs.trainer_prep as job

    out = str(tmp_path / "trainer")
    argv = ["trainer_prep.py", "--input", "/root/testdata/sf0.001",
            "--output", out, "--class-cap", "50"]
    monkeypatch.setattr(sys, "argv", argv)
    job.main()
    pipe = CheckpointedPipeline(spark, out)
    stages = ["balanced", "cefit", "clips", "corr", "edges", "features", "folds", "imputer", "psi", "scaler"]
    assert pipe.completed_stages() == stages
    first = {s: total_from_lineage(spark, pipe.lineage_path, s) for s in stages}
    # resume: lineage unchanged (nothing recomputed/re-appended)
    monkeypatch.setattr(sys, "argv", argv)
    job.main()
    pipe2 = CheckpointedPipeline(spark, out)
    assert {s: total_from_lineage(spark, pipe2.lineage_path, s) for s in stages} == first
    feats = pipe2.table("features").read(spark)
    folds = pipe2.table("folds").read(spark)
    assert feats.count() == folds.count()  # every fold transformed
    # imputation filled every NULL numeric; winsorized value within bounds
    assert feats.where("value IS NULL").count() == 0
    [b] = pipe2.table("clips").read(spark).collect()
    n_out = feats.where(
        (F.col("value_winsor") < b["clip_lo"]) | (F.col("value_winsor") > b["clip_hi"])
    ).count()
    assert n_out == 0
    # the frozen scaler is train-only: its count equals the train fold size
    [scaler] = pipe2.table("scaler").read(spark).collect()
    n_train_value = folds.where("fold = 'train' AND value IS NOT NULL").count()
    assert scaler["n_value"] == n_train_value
    # class cap binds per class
    bal = pipe2.table("balanced").read(spark)
    assert bal.groupBy("event_type").count().agg(F.max("count")).collect()[0][0] <= 50


def test_pretrain_prep_mega_job_kill_resume(spark, monkeypatch, tmp_path):
    """The whole-asset-graph analog (reference pipeline/__init__.py:26-58)
    as ONE checkpointed run: kill it twice mid-pipeline — once BETWEEN the
    dedup index's internal batches, once at the budget stage — and assert
    each rerun resumes without recomputing committed work, the replayed
    index batch is a no-op, and the final tables match a clean
    never-killed run stage-for-stage."""
    import jobs.pretrain_prep as job

    out = str(tmp_path / "pp")
    clean_out = str(tmp_path / "pp_clean")

    def run(target: str) -> None:
        monkeypatch.setattr(
            sys, "argv",
            ["pretrain_prep.py", "--input", "/root/testdata/sf0.001",
             "--output", target, "--token-budget", "2000", "--shards", "4"],
        )
        job.main()

    # -- kill #1: inside the index stage, between batch b_even and b_odd --
    from ipl_dagster_pipeline_spark.operators.dedup_index import MinHashIndex

    real_add = MinHashIndex.add_batch
    calls = {"n": 0}

    def add_then_die(self, batch, batch_id, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("killed between index batches")
        return real_add(self, batch, batch_id, **kw)

    monkeypatch.setattr(MinHashIndex, "add_batch", add_then_die)
    try:
        run(out)
        raise AssertionError("expected the injected kill")
    except RuntimeError as e:
        assert "killed between index batches" in str(e)
    monkeypatch.setattr(MinHashIndex, "add_batch", real_add)

    # -- kill #2: at the budget stage (everything upstream now commits) ---
    real_budget = job.token_budget_select

    def budget_dies(*a, **kw):
        raise RuntimeError("killed at budget stage")

    monkeypatch.setattr(job, "token_budget_select", budget_dies)
    try:
        run(out)
        raise AssertionError("expected the injected kill")
    except RuntimeError as e:
        assert "killed at budget stage" in str(e)

    pipe = CheckpointedPipeline(spark, out)
    committed = pipe.completed_stages()
    assert "curated" in committed and "budget" not in committed
    snap_before = {s: pipe.table(s).current_snapshot_id() for s in committed}
    pairs_before = pipe.table("index_pairs").read(spark).count()

    # -- resume: completes, nothing committed is recomputed ---------------
    monkeypatch.setattr(job, "token_budget_select", real_budget)
    run(out)
    for s, snap in snap_before.items():
        assert pipe.table(s).current_snapshot_id() == snap, f"{s} was recomputed"
    assert pipe.table("index_pairs").read(spark).count() == pairs_before

    # -- clean never-killed run matches stage-for-stage -------------------
    run(clean_out)
    clean = CheckpointedPipeline(spark, clean_out)
    assert clean.completed_stages() == pipe.completed_stages()
    for s in clean.completed_stages():
        a = total_from_lineage(spark, pipe.lineage_path, s)
        b = total_from_lineage(spark, clean.lineage_path, s)
        assert a == b, f"stage {s}: killed-run {a} != clean-run {b}"


def test_pretrain_prep_publishes_run_summary_asset(spark, monkeypatch, tmp_path):
    """The mega-job publishes its run summary as a K4 web asset: JSON +
    mtime-matched .gz sibling, values reconciling with the lineage table."""
    import gzip
    import json

    import jobs.pretrain_prep as job

    out = str(tmp_path / "pp")
    monkeypatch.setattr(
        sys, "argv",
        ["pretrain_prep.py", "--input", "/root/testdata/sf0.001",
         "--output", out, "--token-budget", "2000", "--shards", "2"],
    )
    job.main()

    import os

    p = os.path.join(out, "_webassets", "run_summary.json")
    with open(p) as fh:
        summary = json.load(fh)
    with gzip.open(p + ".gz") as fh:
        assert json.load(fh) == summary
    assert os.stat(p).st_mtime == os.stat(p + ".gz").st_mtime
    assert summary["trainer_rows"] > 0 and summary["stages"]["curated"] > 0
    assert set(summary["mixture_folds"]) <= {"train", "val", "test"}
    pipe = CheckpointedPipeline(spark, out)
    rows, _ = total_from_lineage(spark, pipe.lineage_path, "curated")
    assert summary["stages"]["curated"] == rows


def test_pretrain_prep_force_rebuilds_index(spark, monkeypatch, tmp_path):
    """--force must rebuild the MinHash index too: its batch-id idempotence
    would otherwise return stale pairs for changed input (review finding)."""
    import jobs.pretrain_prep as job

    out = str(tmp_path / "pp")
    full = "/root/testdata/sf0.001"
    half_dir = str(tmp_path / "half_in")
    docs = spark.read.parquet(f"{full}/documents.parquet")
    import os

    os.makedirs(half_dir)
    docs.filter(F.col("doc_id") < 250).write.parquet(f"{half_dir}/documents.parquet")

    def run(inp, *extra):
        monkeypatch.setattr(
            sys, "argv",
            ["pretrain_prep.py", "--input", inp, "--output", out,
             "--token-budget", "2000", "--shards", "2", *extra],
        )
        job.main()

    run(full)
    from ipl_dagster_pipeline_spark.operators.dedup_index import MinHashIndex

    n_docs_full = MinHashIndex(os.path.join(out, "_minhash_index")).docs.read(spark).count()

    # --force with REDUCED input: the index must reflect the new input only
    run(half_dir, "--force")
    n_docs_half = MinHashIndex(os.path.join(out, "_minhash_index")).docs.read(spark).count()
    assert n_docs_half < n_docs_full
    exp = docs.filter((F.col("doc_id") < 250) & (F.col("doc_id") % 97 != 0)).count()
    assert n_docs_half == exp
