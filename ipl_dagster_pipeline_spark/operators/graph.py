"""Connected components over candidate-pair graphs (duplicate-GROUP
resolution for dedup pipelines).

Near-dup detection (MinHash LSH / embedding LSH) emits PAIRS; an actual
dedup needs GROUPS — transitive closure over the pair graph — and one
canonical keeper per group.  This is the hash-to-min label-propagation
formulation (each node repeatedly adopts the minimum label in its
neighborhood; converges in O(graph diameter) rounds, O(log n) on the
short-chain graphs dedup produces):

* every round is one equi-join + one map-side-combined min-aggregation —
  no cross products, no driver-side graph;
* lineage is truncated every round (``localCheckpoint``) so the plan does
  not grow with iterations;
* convergence is detected with an ``Observation`` on the SAME action that
  materializes the round — no extra job per round.

The reference has no graph op (closest analog: its two-directional closure
lookup over situation records, cifs.py:218-224); this generalizes it to the
transitive case a training-data dedup requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """(v, component) for every vertex in ``edges``; component = min vertex id
    reachable.  Isolated vertices (no edges) are absent by construction —
    union the node set back in if needed.
    """
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = sym.select(F.col("s").alias("v")).distinct().withColumn("comp", F.col("v"))

    for _ in range(max_rounds):
        # neighbor-min messages ride the same shuffle as the re-aggregation
        msgs = sym.join(labels, sym["s"] == labels["v"]).select(
            F.col("d").alias("v"), F.col("comp")
        )
        obs = Observation()
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("v")
            .agg(F.min("comp").alias("comp"))
            .join(labels.select(F.col("v"), F.col("comp").alias("__old")), "v")
            .observe(obs, F.sum((F.col("comp") != F.col("__old")).cast("long")).alias("changed"))
            .select("v", "comp")
        )
        # one action per round: materialize + truncate lineage + convergence
        # count, all from the same job
        new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels
        if (obs.get.get("changed") or 0) == 0:
            break
    return labels.select(F.col("v"), F.col("comp"))


def duplicate_groups(
    pairs: DataFrame,
    left: str = "doc_a",
    right: str = "doc_b",
) -> DataFrame:
    """Resolve near-dup PAIRS into GROUPS: (member, keeper, is_keeper).

    keeper = min id of the connected component (matches exact_dedup's
    keep-min-id rule, text_dedup.py); drop-list = rows with is_keeper false.
    """
    comp = connected_components(pairs, src=left, dst=right)
    return comp.select(
        F.col("v").alias("member"),
        F.col("comp").alias("keeper"),
        (F.col("v") == F.col("comp")).alias("is_keeper"),
    )
