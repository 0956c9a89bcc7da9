"""Graph centrality operators for corpus curation.

Web-graph centrality is a standard pretraining quality prior (the
original PageRank crawl-ordering use, and e.g. CommonCrawl harmonic/
PageRank centrality as a document-quality feature).  The reference has
no graph surface; the natural Spark-first shape is iterative DataFrame
joins over a pre-normalized adjacency — the same checkpointed-iteration
discipline as ``operators/dedup.py::dedup_groups`` (pointer jumping)
and ``operators/similarity.py::kmeans_refine``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
    checkpoint_every: int = 5,
    n_partitions: int = 32,
) -> DataFrame:
    """Damped PageRank over a directed edge list → (node, rank).

    Semantics: standard power iteration with uniform teleport and
    dangling-mass redistribution — every node's rank is
    ``(1-d)/N + d * (Σ_in rank/outdeg + dangling_mass/N)``, so ranks
    sum to 1 every iteration (the numpy dual in tests pins values).
    Duplicate (src, dst) rows count as parallel edges (each contributes
    its own 1/outdeg share).

    Scale shape, per iteration: ONE join of the pre-normalized adjacency
    (src, dst, 1/outdeg — built once, hash-partitioned on src and pinned)
    against the current ranks on the same key, one groupBy(dst) sum with
    map-side combining, and a 1-row dangling-mass aggregate broadcast
    back — no per-iteration driver collection of rank data, nothing
    node-count-sized in driver memory.  Lineage is truncated with an
    eager localCheckpoint every ``checkpoint_every`` iterations (else
    the plan doubles per round and the final job replays every
    iteration); like the other pinned operators, construction therefore
    RUNS Spark jobs eagerly and holds the adjacency in executor storage.
    On a real cluster, swap localCheckpoint for reliable checkpoint()
    so executor loss stays recoverable.

    Rank sums are floating-point tree-aggregations — deterministic only
    up to summation order, which is why the registered query surface
    keeps PageRank rows-only (like the other float-accumulation
    families) and tests pin against numpy with tolerance.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .repartition(n_partitions, "node")
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    adj = (
        edges.join(deg, src)
        .select(
            F.col(src).alias("node"),
            F.col(dst).alias("dst"),
            (F.lit(1.0) / F.col("deg")).alias("w"),
        )
        .repartition(n_partitions, "node")
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for i in range(n_iter):
        contribs = adj.join(ranks, "node").select(
            F.col("dst").alias("node"),
            (F.col("rank") * F.col("w")).alias("c"),
        )
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        # Σ contribs = Σ rank over non-dangling sources, so the mass
        # parked on dangling nodes is 1 - Σ contribs (ranks sum to 1
        # by construction); a 1-row aggregate, broadcast back.
        dangling = contribs.agg(
            (F.lit(1.0) - F.coalesce(F.sum("c"), F.lit(0.0))).alias("dm")
        )
        ranks = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("dm") / n_nodes
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
