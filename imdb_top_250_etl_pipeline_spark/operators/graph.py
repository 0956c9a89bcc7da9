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

from .pinning import eager_pin, pin


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
    nodes = eager_pin(
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .repartition(n_partitions, "node")
    )
    deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    adj = eager_pin(
        edges.join(deg, src)
        .select(
            F.col(src).alias("node"),
            F.col(dst).alias("dst"),
            (F.lit(1.0) / F.col("deg")).alias("w"),
        )
        .repartition(n_partitions, "node")
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    prev_pin = None
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
            # pin the new round, then free the previous round's blocks
            # — the new checkpoint already materialized, so nothing
            # downstream can re-read the old ones
            ranks, handle = pin(ranks)
            if prev_pin is not None:
                prev_pin.release()
            prev_pin = handle
    return ranks


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph →
    (node, n_tri) for every node in at least one triangle.

    Triangle density separates organic link neighborhoods from spam
    farms and near-duplicate clusters from chance collisions — the
    classic clustering-coefficient numerator.

    Algorithm: DEGREE-ORDERED ORIENTATION (the scalable formulation).
    Each undirected edge orients from its (degree, id)-smaller endpoint
    to the larger; wedges enumerate ordered out-neighbor pairs of each
    node; a wedge is a triangle iff the oriented closing edge exists.
    Every triangle is counted exactly once, and the wedge fan-out is
    bounded by out-degree, which orientation caps at O(√m) — a
    celebrity node with 10⁸ followers contributes almost no wedges
    because nearly all its edges orient INTO it.  Total work is
    O(m^1.5) worst case, the optimal bound for exact counting; all
    joins are equi-joins on node keys (no cross products), so the whole
    thing is hash-shuffle work Catalyst plans normally.

    Round-13 optimization (guide §2.4): the canonical edge list feeds
    FOUR plan branches (the two degree scans and both endpoint-degree
    joins) and the oriented adjacency THREE (both wedge sides + the
    closing-edge probe).  Lazily composed, every branch re-derived the
    whole upstream — for the co-purchase fixture that meant re-running
    the lineitem self-join + distinct up to 6x (the before-plan shows
    154 Exchange nodes).  Pinning ``e`` and ``oriented`` (persist() /
    a staging table on a cluster — the standard iterative-graph
    discipline this module already uses for PageRank) makes each a
    single materialized pass; identical rows, the after-plan collapses
    to the joins the algorithm actually needs.
    """
    e = eager_pin(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    lower_first = F.struct(F.col("da"), F.col("a")) < F.struct(
        F.col("db"), F.col("b")
    )
    oriented = eager_pin(
        ed.select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )
    # wedges join the oriented adjacency with itself on the pivot node;
    # the (dv, v) struct comparison reuses the SAME total order as the
    # orientation, so the closing edge of an ordered wedge is exactly
    # the oriented edge (y, z)
    wedges = (
        oriented.alias("e1")
        .join(
            oriented.alias("e2"),
            (F.col("e1.u") == F.col("e2.u"))
            & (
                F.struct(F.col("e1.dv"), F.col("e1.v"))
                < F.struct(F.col("e2.dv"), F.col("e2.v"))
            ),
        )
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )
    closing = oriented.select(
        F.col("u").alias("y"), F.col("v").alias("z")
    )
    tri = wedges.join(closing, ["y", "z"])
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_tri"))
    )


def kcore(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    max_rounds: int = 10,
) -> DataFrame:
    """The k-core (maximal subgraph where every node keeps degree ≥ k)
    by iterative peeling → (node, deg) with each survivor's
    core-internal degree.

    Coreness is the robust density prior triangle counts complement:
    spam farms and boilerplate-duplication clusters sit in high cores,
    and peeling is the standard first step of community/influence
    analysis.  Peeling is monotone — rounds only remove nodes — so the
    fixpoint is unique and order-independent.

    BOUNDED-ROUND CONTRACT: raises after ``max_rounds`` non-converged
    rounds instead of looping on (dedup_groups' discipline).  Because
    rounds past the fixpoint are idempotent, this is also what makes
    the operator oracle-checkable: a fixed ``max_rounds``-deep unrolled
    SQL restatement MUST equal the engine's converged answer whenever
    the engine converges — peeling depth, not graph size, is the bound,
    and real graphs peel shallow (each round must delete a node, and
    measured fixture depth is ≤5 at 10× scale).

    Scale shape, per round: one equi-join of the pinned symmetrized
    adjacency against the live-node set on each endpoint, one combining
    groupBy degree count, a filter — all hash-shuffle work.  EAGER like
    pagerank: every round materializes (localCheckpoint pin) so the
    convergence check doesn't replay lineage; previous rounds' blocks
    are released as soon as the next round lands (pin_scope composes).
    On a real cluster swap in reliable checkpoint().
    """
    sym = eager_pin(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    live = sym.select(F.col("u").alias("node")).distinct()
    live, prev_pin = pin(live)
    n_live = live.count()
    for _ in range(max_rounds):
        deg = (
            sym.join(live.select(F.col("node").alias("u")), "u")
            .join(
                live.select(F.col("node").alias("v")), "v"
            )
            .groupBy("u")
            .agg(F.count("*").alias("deg"))
        )
        nxt = deg.where(F.col("deg") >= k).select(
            F.col("u").alias("node"), "deg"
        )
        nxt, handle = pin(nxt)
        n_next = nxt.count()
        if n_next == n_live:
            prev_pin.release()
            return nxt
        live = nxt.select("node")
        prev_pin.release()
        prev_pin = handle
        n_live = n_next
    raise RuntimeError(
        f"k-core peeling did not converge within {max_rounds} rounds; "
        "raise max_rounds (and the oracle's unroll depth with it)"
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) → the
    (node, lab) community assignment after EXACTLY ``rounds`` rounds:
    every node starts as its own label and each round adopts the most
    frequent label among its neighbors (smallest label on ties).

    The near-linear community detector next to the density operators
    (kcore = how dense, triangles = how clustered, THIS = which
    group): mirror clusters, template farms, and topic communities
    condense onto one label within a few rounds.

    FIXED-ROUND contract, deliberately NOT run-to-convergence:
    synchronous LPA can 2-cycle on bipartite-ish structure, so a
    convergence loop is unbounded; a fixed round count is
    deterministic on every input — and exactly restatable as a
    ``rounds``-deep unrolled SQL oracle (the kcore discipline without
    needing idempotence).  Ties break to the SMALLEST label, making
    each round a pure function of the previous labeling.

    Scale shape, per round: one equi-join of the pinned symmetrized
    adjacency against the current labeling (shuffle on the endpoint),
    one combining (node, label) vote count, one argmax via max(struct)
    partial aggregation — never a window over the vote table.  EAGER
    like pagerank: each round's labeling pins (localCheckpoint) and
    the previous round's blocks release immediately (pin_scope
    composes; on a real cluster swap in reliable checkpoint()).
    """
    sym = eager_pin(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    labels, prev = pin(labels)
    for _ in range(rounds):
        votes = (
            sym.join(
                labels.select(F.col("node").alias("v"), "lab"), "v"
            )
            .groupBy("u", "lab")
            .agg(F.count("*").alias("c"))
        )
        # argmax(count, tie -> smallest label) as ONE partial-friendly
        # min(struct): struct order is (-c asc, lab asc), so the min is
        # the highest count with the smallest label.  The COUNT is the
        # side that gets negated — it is always numeric — so the label
        # column may be any orderable type (string ids included);
        # negating the label instead would cast strings to double and
        # silently yield all-NULL labels.
        nxt = (
            votes.select(
                "u", F.struct((-F.col("c")).alias("nc"), F.col("lab")).alias("s")
            )
            .groupBy("u")
            .agg(F.min("s").alias("m"))
            .select(F.col("u").alias("node"), F.col("m.lab").alias("lab"))
        )
        labels, handle = pin(nxt)
        prev.release()
        prev = handle
    return labels
