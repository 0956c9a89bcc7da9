"""PageRank (operators/graph.py) vs a numpy power-iteration dual.

The Spark operator and the dual implement the same recurrence
(uniform teleport + dangling-mass redistribution), so values must agree
to fp-summation tolerance on every graph shape that exercises a
distinct code path: cycles (symmetric fixed point), stars (in-degree
concentration), dangling sinks, parallel edges, and disconnected
components.
"""

from __future__ import annotations

import numpy as np
import pytest

from imdb_top_250_etl_pipeline_spark.operators.graph import pagerank


def _numpy_pagerank(edges, damping=0.85, n_iter=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        s = np.zeros(n)
        for u, v in edges:
            s[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        dangling = 1.0 - sum(r[idx[u]] for u in {u for u, _ in edges})
        r = (1 - damping) / n + damping * (s + dangling / n)
    return {node: r[idx[node]] for node in nodes}


def _spark_pagerank(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.rank
        for r in pagerank(df, "src", "dst", n_partitions=4, **kw).collect()
    }


CASES = {
    "cycle": [(1, 2), (2, 3), (3, 1)],
    "star_in": [(1, 9), (2, 9), (3, 9), (9, 1)],
    "dangling_sink": [(1, 2), (2, 3), (1, 3)],  # 3 has no out-edges
    "parallel_edges": [(1, 2), (1, 2), (1, 3)],
    "two_components": [(1, 2), (2, 1), (10, 11), (11, 12), (12, 10)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_pagerank_matches_numpy_dual(spark, name):
    edges = CASES[name]
    got = _spark_pagerank(spark, edges, n_iter=12, checkpoint_every=4)
    want = _numpy_pagerank(edges, n_iter=12)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], rel=1e-9), (
            name,
            node,
        )
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_cycle_is_uniform(spark):
    got = _spark_pagerank(spark, CASES["cycle"], n_iter=8)
    for v in got.values():
        assert v == pytest.approx(1.0 / 3, rel=1e-12)


def test_pagerank_star_concentrates_rank(spark):
    got = _spark_pagerank(spark, CASES["star_in"], n_iter=12)
    hub = got[9]
    # 9 absorbs every spoke's rank; 1 in turn absorbs all of 9's, so
    # only the pure-teleport spokes (2, 3) must be clearly dominated
    assert hub > got[2] * 2 and hub > got[3] * 2
    assert got[1] > got[2]


# ---------------------------------------------------------------------------
# triangle_counts — hand-computed shapes + brute-force dual
# ---------------------------------------------------------------------------


def _tri(spark, edges):
    from imdb_top_250_etl_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["n_tri"] for r in triangle_counts(df).collect()
    }


def test_triangle_single(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 1)]) == {1: 1, 2: 1, 3: 1}


def test_triangle_square_without_diagonal_has_none(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]) == {}


def test_triangle_k4_every_node_in_three(spark):
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert _tri(spark, k4) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_duplicate_reversed_and_self_edges_ignored(spark):
    # duplicates, reversed copies, and self loops must not inflate counts
    assert _tri(
        spark,
        [(1, 2), (2, 1), (2, 3), (2, 3), (3, 1), (1, 1)],
    ) == {1: 1, 2: 1, 3: 1}


def test_triangle_matches_brute_force_on_random_graph(spark):
    import itertools
    import random

    rng = random.Random(7)
    nodes = range(12)
    edges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.4
    ]
    eset = set(edges)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (
            ((a, b) in eset)
            and ((b, c) in eset)
            and ((a, c) in eset)
        ):
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert _tri(spark, edges) == want


def test_kcore_matches_python_peeling_and_bounds(spark):
    from imdb_top_250_etl_pipeline_spark.operators.graph import kcore

    # K5 clique (4-core) + a tail path + a triangle hanging off it
    edges = [
        (a, b) for a in range(5) for b in range(a + 1, 5)
    ] + [(4, 10), (10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(edges, ["src", "dst"])

    def peel(es, k):
        import collections

        adj = collections.defaultdict(set)
        for u, v in es:
            adj[u].add(v)
            adj[v].add(u)
        live = set(adj)
        while True:
            deg = {n: len(adj[n] & live) for n in live}
            new = {n for n in live if deg[n] >= k}
            if new == live:
                return {n: deg[n] for n in live}
            live = new

    for k in (2, 3, 4):
        got = {r.node: r.deg for r in kcore(df, k=k).collect()}
        assert got == peel(edges, k), k
    # k=4: only the clique survives; k=2: triangle survives, path pruned
    assert set(
        r.node for r in kcore(df, k=4).collect()
    ) == {0, 1, 2, 3, 4}
    assert {10, 11, 12} <= set(r.node for r in kcore(df, k=2).collect())
    # the whole graph peels away above the max core
    assert kcore(df, k=5).count() == 0
    # bounded-round contract: a long path under k=2 peels one node per
    # round from each end — max_rounds=1 cannot converge
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["src", "dst"]
    )
    import pytest as _pt

    with _pt.raises(RuntimeError, match="did not converge"):
        kcore(chain, k=2, max_rounds=1)


def test_label_propagation_python_dual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.graph import (
        label_propagation,
    )

    # two triangles bridged by one edge: LPA condenses each triangle
    # onto its smallest node id; a path tests tie-breaking
    edges = [
        (1, 2), (2, 3), (1, 3),        # triangle A
        (4, 5), (5, 6), (4, 6),        # triangle B
        (3, 4),                        # bridge
        (10, 11), (11, 12),            # path
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    for rounds in (1, 2, 4):
        got = {
            r.node: r.lab
            for r in label_propagation(df, "src", "dst", rounds=rounds).collect()
        }

        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        lab = {n: n for n in adj}
        for _ in range(rounds):
            new = {}
            for n, nbrs in adj.items():
                votes = {}
                for m in nbrs:
                    votes[lab[m]] = votes.get(lab[m], 0) + 1
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                new[n] = best[0]
            lab = new
        assert got == lab, (rounds, got, lab)
    # after enough rounds both triangles share the bridge community
    # structure: triangle A condenses onto label 1
    got4 = {
        r.node: r.lab
        for r in label_propagation(df, "src", "dst", rounds=4).collect()
    }
    assert got4[1] == got4[2] == got4[3]


def test_label_propagation_string_ids(spark):
    # the tie-break must be type-safe: negating the LABEL would cast
    # string ids to double and yield all-NULL labels; the operator
    # negates the COUNT instead, so string node ids work verbatim
    from imdb_top_250_etl_pipeline_spark.operators.graph import (
        label_propagation,
    )

    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e")]
    got = {
        r.node: r.lab
        for r in label_propagation(
            spark.createDataFrame(edges, ["src", "dst"]), "src", "dst", rounds=3
        ).collect()
    }
    assert None not in got.values()
    # the triangle condenses onto its lexicographically smallest id;
    # the isolated pair 2-cycles (documented synchronous-LPA behavior),
    # so after an odd round count the labels have swapped
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["d"] == "e" and got["e"] == "d"
