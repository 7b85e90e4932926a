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


def _shuffle_parts(df: DataFrame) -> int:
    """spark.sql.shuffle.partitions as an int, falling back to
    defaultParallelism when the conf is non-numeric (ADVICE r12: some
    platforms set it to "auto"; a bare int() raised ValueError and took
    the whole query down over a tuning knob)."""
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (ValueError, TypeError):
        return spark.sparkContext.defaultParallelism


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
    # r12: pre-partition the (static) edge relation on the join key it
    # is probed with EVERY round, then checkpoint — LogicalRDD preserves
    # the physical partitioning, so the per-round e ⋈ labels join stops
    # re-shuffling the edges (guide §2.4: operations keyed the same way
    # share one exchange). Edges are the component-finding pass's LARGE
    # relation at any scale — one edge shuffle paid at build replaces
    # one per round (plan evidence: the round-1 Exchange
    # hashpartitioning(v) over Scan ExistingRDD is gone). The partition
    # count matches spark.sql.shuffle.partitions so ENSURE_REQUIREMENTS
    # accepts the existing layout.
    nparts = _shuffle_parts(e)
    e = e.repartition(nparts, "v").localCheckpoint(eager=True)

    # checkpoint the seed labels too: round 1 consumes them on BOTH
    # sides of its join, and the un-checkpointed distinct re-executed
    # per consumer (same no-ReusedExchange class as everywhere else)
    labels = (
        e.select(F.col("u").alias("n"))
        .distinct()
        .withColumn("c", F.col("n"))
        .localCheckpoint(eager=True)
    )
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


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_out: str = "node",
    comp_out: str = "component",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond").

    Converges in O(log^2 n) rounds regardless of graph diameter — the
    variant to use when clusters can be long chains (e.g. transitive
    URL-redirect graphs) rather than the near-cliques that near-dup
    produces. Each round is two groupBy-min + join passes; like the
    propagation variant, lineage is cut per round and convergence is a
    fixpoint on the edge-set signature (count + order-independent hash
    sum — one tiny agg, no edge-set comparison join).

    large-star: every node's larger neighbors re-point to its minimum;
    small-star: every node's smaller neighbors collapse onto its
    minimum. Fixpoint = disjoint stars; each node's sole neighbor is
    its component's smallest id.
    """
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    nodes = (
        edges.select(F.col(src).alias("n"))
        .union(edges.select(F.col(dst).alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # canonical: edges directed larger -> smaller
    e = (
        e0.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_iter):
        if e.isEmpty():
            break
        # large-star over symmetric neighborhoods
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = sym.groupBy("u").agg(F.min("v").alias("mv"))
        lmin = lmin.select("u", F.least("mv", F.col("u")).alias("m"))
        large = (
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over larger->smaller edges
        smin = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smin, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smin.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        sig = small.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]
        e = small
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    else:
        raise RuntimeError(f"connected_components_star did not converge in {max_iter} rounds")
    # fixpoint stars: each non-root node points to its root
    labels = e.groupBy("u").agg(F.min("v").alias("c"))
    return nodes.join(labels, nodes["n"] == labels["u"], "left").select(
        F.col("n").alias(node_out),
        F.coalesce(F.col("c"), F.col("n")).alias(comp_out),
    )


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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank: r'(v) = (1-d)/N + d * Σ_{u→v} r(u)/deg(u).

    Each iteration is one join (ranks onto out-edges) + one grouped sum —
    the standard distributed formulation; no driver-side state beyond the
    loop counter, N travels as a broadcast literal row. Fixed `iters`
    (not convergence-tested) keeps the computation a finite SQL-
    expressible DAG, so the duckdb oracle replays it exactly — the same
    determinism stance as hll_deterministic vs approx HLL.

    Caveats by construction: dangling mass is NOT redistributed — feed a
    symmetric (undirected) edge list, where every node has out-edges,
    or accept leaked mass. Every node keeps a rank row regardless: the
    per-iteration update left-joins inbound sums onto the full node set
    (src ∪ dst) with missing inbound coalesced to 0, so nodes without
    in-edges decay toward (1-d)/N instead of vanishing from the output.
    Returns (node, rank).
    """
    e = edges.select(F.col(src).alias("__s__"), F.col(dst).alias("__d__"))
    nodes = (
        e.select(F.col("__s__").alias("node"))
        .union(e.select(F.col("__d__").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every iteration
    )
    # r12: the edge relation and the degree table are consumed by EVERY
    # iteration's contribs join, and an un-checkpointed lineage replays
    # the caller's whole edge derivation per iteration (pagerank_parts:
    # the lineitem distinct + symmetric union, 3x). Checkpoint both —
    # edges pre-partitioned on the per-iteration probe key __s__ so the
    # join stops re-shuffling them each round (the same discipline as
    # connected_components; edges are the big relation at any scale),
    # deg already hash(__s__)-partitioned by its groupBy. n_row is one
    # row, checkpointed so each iteration's broadcast doesn't re-run
    # the count aggregate.
    nparts = _shuffle_parts(e)
    e = e.repartition(nparts, "__s__").localCheckpoint(eager=True)
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n__")).localCheckpoint(
        eager=True
    )
    deg = e.groupBy("__s__").agg(F.count(F.lit(1)).alias("__deg__")).localCheckpoint(
        eager=True
    )
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("__n__")).alias("rank")
    )
    for _ in range(iters):
        contribs = (
            e.join(deg, "__s__")
            .join(ranks, F.col("__s__") == F.col("node"))
            .select(F.col("__d__").alias("node"), (F.col("rank") / F.col("__deg__")).alias("__c__"))
        )
        inbound = contribs.groupBy("node").agg(F.sum("__c__").alias("__in__"))
        ranks = (
            nodes.join(inbound, "node", "left")
            .crossJoin(F.broadcast(n_row))
            .select(
                "node",
                (
                    (1 - damping) / F.col("__n__")
                    + damping * F.coalesce(F.col("__in__"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
