"""Distributed graph primitives for dedup cluster resolution.

Near-dup detection (minhash/LSH/jaccard — operators/dedup.py) yields
candidate PAIRS; a training pipeline needs CLUSTERS ("these 5 documents
are all the same article") so it can keep one representative per
cluster. Pairs → clusters is connected components.

Implementation: iterative min-label propagation over DataFrame joins —
each round every node adopts the smallest component id among itself and
its neighbors; fixpoint when no label changes. Rounds = graph diameter,
which for near-dup graphs is small (clusters are cliques-ish: docs
similar to a common template are similar to each other), so 3-5 rounds
settle real corpora. Each round is one shuffle on node id; lineage is
cut with localCheckpoint so the plan doesn't grow by one join per round
(20 stacked joins would crush the optimizer and any executor that has
to replay lineage). For adversarial long-chain graphs the
large-star/small-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond") converges in O(log^2 n) rounds with the same
join-per-round cost — the propagation loop here is the right default
for dedup workloads, not a shortcut.

No reference counterpart (the reference has no graph ops) — this is a
SURVEY §7 P6 scale-out extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_out: str = "node",
    comp_out: str = "component",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve undirected edges into (node, component) with component =
    the smallest node id in the node's connected component.

    Deterministic, converges in diameter rounds, checked each round via
    a count of changed labels (one cheap action on the already-computed
    round result). Raises if max_iter rounds don't reach the fixpoint —
    a silent partial clustering would merge too little and leak dups.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    e = e.localCheckpoint(eager=True)

    labels = e.select(F.col("u").alias("n")).distinct().withColumn("c", F.col("n"))
    for _ in range(max_iter):
        # smallest label among each node's neighbors
        neigh = (
            e.join(labels, e["v"] == labels["n"])
            .groupBy(F.col("u").alias("n2"))
            .agg(F.min("c").alias("nc"))
        )
        merged = (
            labels.join(neigh, labels["n"] == neigh["n2"], "left")
            .select(
                "n",
                "c",
                F.least(F.col("c"), F.coalesce(F.col("nc"), F.col("c"))).alias("c2"),
            )
        ).localCheckpoint(eager=True)
        changed = merged.filter(F.col("c2") != F.col("c")).limit(1).count()
        labels = merged.select("n", F.col("c2").alias("c"))
        if changed == 0:
            return labels.select(F.col("n").alias(node_out), F.col("c").alias(comp_out))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def cluster_representatives(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
    node_col: str = "node",
    comp_col: str = "component",
) -> DataFrame:
    """Keep one row per near-dup cluster (the smallest id — which IS the
    component label) plus every row that was in no cluster at all. The
    dedup step that follows component resolution."""
    clustered = components.select(
        F.col(node_col).alias("__n__"), F.col(comp_col).alias("__c__")
    )
    tagged = df.join(clustered, df[id_col] == clustered["__n__"], "left")
    return tagged.filter(
        F.col("__n__").isNull() | (F.col("__c__") == df[id_col])
    ).drop("__n__", "__c__")
