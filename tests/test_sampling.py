"""Operator-level invariants for the corpus-composition (data recipe)
operators — the properties the oracle hash can't state directly:
mixture proportions near target, exact expected epoch multiplicity,
budget prefix maximality, shuffle permutation + seed sensitivity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from imdb_top_250_etl_pipeline_spark.operators.sampling import (
    sample_mixture,
    select_until_budget,
    shuffle_order,
    upsample_epochs,
)
from imdb_top_250_etl_pipeline_spark.sources import load

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_CORRECT, "documents").select("doc_id", "lang")


def test_mixture_hits_target_proportions(docs):
    weights = {"en": 0.5, "zh": 0.25, "de": 0.25}
    out = sample_mixture(docs, "lang", "doc_id", weights)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(weights)  # unlisted domains dropped
    total = sum(counts.values())
    for lang, w in weights.items():
        # key-hash thinning is binomial around the exact rate; the 1/1000
        # hash grid plus sampling noise bounds deviation well within 10pp
        assert abs(counts[lang] / total - w) < 0.10, (lang, counts, total)


def test_mixture_binding_domain_kept_whole(docs):
    # with en weighted heavily, en is binding (largest n_d/w_d deficit)
    # and must be kept at rate 1.0 — every en row survives
    weights = {"en": 0.9, "zh": 0.1}
    n_en = docs.where(F.col("lang") == "en").count()
    out = sample_mixture(docs, "lang", "doc_id", weights)
    assert out.where(F.col("lang") == "en").count() == n_en


def test_upsample_exact_multiplicity_per_row(docs):
    up = upsample_epochs(docs, "lang", "doc_id", {"zh": 2.5, "en": 0.5}, 1.0)
    per_doc = up.groupBy("doc_id", "lang").agg(F.count("*").alias("n_copies"))
    bad = per_doc.where(
        (
            (F.col("lang") == "zh") & ~F.col("n_copies").isin(2, 3)
        )
        | ((F.col("lang") == "en") & (F.col("n_copies") != 1))
        | (~F.col("lang").isin("zh", "en") & (F.col("n_copies") != 1))
    ).count()
    assert bad == 0
    # en at 0.5 epochs: only the key-hash half appears at all
    n_en_src = docs.where(F.col("lang") == "en").count()
    n_en_up = up.where(F.col("lang") == "en").count()
    assert 0 < n_en_up < n_en_src
    # epoch column is a contiguous 1..n_copies index
    assert (
        up.groupBy("doc_id").agg(
            (F.max("epoch") != F.count("*")).alias("bad")
        ).where("bad").count()
        == 0
    )


def test_budget_prefix_is_maximal(spark):
    d = load(spark, SF_CORRECT, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    sel = select_until_budget(d, ["doc_id"], "n_tok", budget=5000)
    rows = sorted(
        (r["doc_id"], r["n_tok"], r["cum_tokens"]) for r in sel.collect()
    )
    total = rows[-1][2]
    assert total <= 5000
    # the selection is a PREFIX in doc_id order: re-deriving the cumsum
    # from the selected rows alone reproduces the emitted column
    run = 0
    for _doc, n, cum in rows:
        run += n
        assert run == cum
    # maximal: the first excluded doc would overflow the budget
    excluded = (
        d.join(sel.select("doc_id"), "doc_id", "left_anti")
        .orderBy("doc_id")
        .limit(1)
        .collect()
    )
    assert excluded and total + excluded[0]["n_tok"] > 5000


def test_shuffle_is_seeded_permutation(docs):
    a = shuffle_order(docs, "doc_id", seed="a")
    n = docs.count()
    pos = [r["shuffle_pos"] for r in a.select("shuffle_pos").collect()]
    assert sorted(pos) == list(range(1, n + 1))  # exact permutation
    b = shuffle_order(docs, "doc_id", seed="b")
    moved = (
        a.select("doc_id", "shuffle_pos")
        .join(
            b.select("doc_id", F.col("shuffle_pos").alias("pos_b")), "doc_id"
        )
        .where(F.col("shuffle_pos") != F.col("pos_b"))
        .count()
    )
    assert moved > n // 2  # a different seed reorders most rows
    # same seed → identical order (determinism across invocations)
    a2 = shuffle_order(docs, "doc_id", seed="a")
    assert (
        a.select("doc_id", "shuffle_pos")
        .exceptAll(a2.select("doc_id", "shuffle_pos"))
        .count()
        == 0
    )


def test_sample_weighted_odds_and_determinism(spark):
    from imdb_top_250_etl_pipeline_spark.operators.sampling import (
        sample_weighted,
    )

    # 5000 keys: class A weight 1, class B weight 10 -> in a k=1000
    # E-S draw, B's inclusion odds dominate roughly by the weight ratio
    df = spark.range(5000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, 1.0).otherwise(10.0).alias("w"),
    )
    sel = sample_weighted(df, "k", "w", k=1000)
    picked = [r.k for r in sel.collect()]
    assert len(picked) == 1000
    heavy = sum(1 for k in picked if k % 2 == 1)
    # expected heavy share >> 50%; loose bound leaves room for variance
    assert heavy > 700, heavy
    # deterministic: same inputs -> identical selection
    again = {r.k for r in sample_weighted(df, "k", "w", k=1000).collect()}
    assert set(picked) == again
    # zero/negative weights never selected
    df2 = df.withColumn(
        "w", F.when(F.col("k") < 100, F.lit(0.0)).otherwise(F.col("w"))
    )
    sel2 = {r.k for r in sample_weighted(df2, "k", "w", k=4900).collect()}
    assert all(k >= 100 for k in sel2)


# ---------------------------------------------------------------------------
# sample_per_group (deterministic uniform k-per-group)
# ---------------------------------------------------------------------------


def test_sample_per_group_matches_python_dual(spark):
    import hashlib

    from imdb_top_250_etl_pipeline_spark.operators.sampling import (
        sample_per_group,
    )

    rows = [(g, i) for g in ("a", "b", "c") for i in range(40)]
    df = spark.createDataFrame(rows, ["g", "k"]).repartition(5)
    got = {
        (r.g, r.k)
        for r in sample_per_group(df, "g", "k", k=7, seed="t").collect()
    }

    def h(g, k):
        return hashlib.md5(f"t:{g}:{k}".encode()).hexdigest()

    want = {
        (g, k)
        for g in ("a", "b", "c")
        for k in sorted(range(40), key=lambda k: (h(g, k), k))[:7]
    }
    assert got == want
    # exactly k per group, and a rerun under different layout agrees
    again = {
        (r.g, r.k)
        for r in sample_per_group(
            df.repartition(2), "g", "k", k=7, seed="t"
        ).collect()
    }
    assert again == got


def test_sample_per_group_small_groups_and_seed(spark):
    from imdb_top_250_etl_pipeline_spark.operators.sampling import (
        sample_per_group,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], ["g", "k"]
    )
    out = sample_per_group(df, "g", "k", k=5, seed="s1")
    # groups smaller than k come back whole
    assert out.count() == 3
    # a different seed reorders the selection boundary on a big group
    big = spark.createDataFrame([("g", i) for i in range(200)], ["g", "k"])
    s1 = {r.k for r in sample_per_group(big, "g", "k", 10, "s1").collect()}
    s2 = {r.k for r in sample_per_group(big, "g", "k", 10, "s2").collect()}
    assert s1 != s2


def test_group_safe_split_invariants(spark):
    from imdb_top_250_etl_pipeline_spark.operators.sampling import (
        group_safe_split,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    # chain 10-11-12 is one component; 50-51 another; rest singletons
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (50, 51)], ["id_a", "id_b"]
    )
    out = group_safe_split(df, "doc_id", pairs).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == 200  # left join: no row lost or duplicated
    # every member of a component shares the component's rep AND split
    assert {by_id[i].group_rep for i in (10, 11, 12)} == {10}
    assert len({by_id[i].split for i in (10, 11, 12)}) == 1
    assert {by_id[i].group_rep for i in (50, 51)} == {50}
    assert by_id[50].split == by_id[51].split
    # singletons are their own representative
    assert by_id[7].group_rep == 7
    # splits cover all three labels at 8/1/1-ish mass over 200 ids
    from collections import Counter

    c = Counter(r.split for r in out)
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]
    # determinism: rerun under a different layout agrees exactly
    again = {
        (r.doc_id, r.group_rep, r.split)
        for r in group_safe_split(
            df.repartition(3), "doc_id", pairs.repartition(2)
        ).collect()
    }
    assert again == {(r.doc_id, r.group_rep, r.split) for r in out}


def _water_fill(caps: dict, budget: int) -> dict:
    order = sorted(caps, key=lambda s: (caps[s], s))
    alloc, rem = {}, budget
    for idx, s in enumerate(order):
        n_rem = len(order) - idx
        if caps[s] * n_rem <= rem:
            alloc[s] = caps[s]
            rem -= caps[s]
        else:
            share, left = divmod(rem, n_rem)
            for j, s2 in enumerate(order[idx:]):
                alloc[s2] = share + (1 if j < left else 0)
            return alloc
    return alloc  # everything saturated; leftover budget unused


@pytest.mark.parametrize(
    "caps,budget",
    [
        ({"a": 10, "b": 10, "c": 10}, 12),  # nobody saturated, remainder
        ({"a": 3, "b": 100, "c": 100}, 60),  # one saturated
        ({"a": 1, "b": 2, "c": 3}, 100),  # all saturated, budget unused
        ({"a": 7}, 5),  # single source
        ({"a": 5, "b": 5}, 0),  # zero budget
    ],
)
def test_unimax_matches_water_filling_dual(spark, caps, budget):
    from imdb_top_250_etl_pipeline_spark.operators.sampling import (
        unimax_allocation,
    )

    # one row per token so tokens == capacity at max_epochs=1
    rows = [(s, i) for s, c in caps.items() for i in range(c)]
    df = spark.createDataFrame(rows, ["src", "k"]).withColumn(
        "len", F.lit(1)
    )
    out = unimax_allocation(df, "src", "len", budget, max_epochs=1)
    got = {r["src"]: r["allocation"] for r in out.collect()}
    assert got == _water_fill(caps, budget)


def test_unimax_invariants_and_apply(spark):
    from imdb_top_250_etl_pipeline_spark.operators.sampling import (
        apply_token_allocation,
        unimax_allocation,
    )
    from imdb_top_250_etl_pipeline_spark.sources import load

    docs = load(spark, SF_CORRECT, "documents")
    alloc = unimax_allocation(docs, "lang", "n_chars", (2, 1), max_epochs=3)
    rows = alloc.collect()
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    budget = 2 * total
    by = {r["lang"]: r for r in rows}
    # per-source cap respected; budget exhausted (some source unsaturated)
    assert all(r["allocation"] <= r["capacity"] for r in rows)
    assert sum(r["allocation"] for r in rows) == budget
    # unsaturated allocations uniform within 1 token
    unsat = [r["allocation"] for r in rows if not r["saturated"]]
    assert max(unsat) - min(unsat) <= 1
    # saturated sources take exactly their capacity
    assert all(
        r["allocation"] == r["capacity"] for r in rows if r["saturated"]
    )
    applied = apply_token_allocation(
        docs.select("doc_id", "lang", "n_chars"),
        "lang",
        "doc_id",
        "n_chars",
        alloc,
    )
    realized = {
        r["lang"]: (r["t"], r["max_len"])
        for r in applied.groupBy("lang")
        .agg(F.sum("n_chars").alias("t"), F.max("n_chars").alias("max_len"))
        .collect()
    }
    for lang, (t, max_len) in realized.items():
        a = by[lang]["allocation"]
        # within one document of the allocation, never over
        assert t <= a and a - t <= max_len, (lang, t, a, max_len)
    # layout determinism
    again = {
        (r.doc_id, r.epoch)
        for r in apply_token_allocation(
            docs.select("doc_id", "lang", "n_chars").repartition(7),
            "lang",
            "doc_id",
            "n_chars",
            alloc,
        ).collect()
    }
    assert again == {(r.doc_id, r.epoch) for r in applied.collect()}


def test_interleave_every_prefix_is_proportional(spark):
    from imdb_top_250_etl_pipeline_spark.operators.sampling import (
        interleave_sources,
    )

    rows = [("a", i) for i in range(300)] + [("b", i + 1000) for i in range(100)]
    df = spark.createDataFrame(rows, ["src", "k"])
    out = interleave_sources(df, "src", "k", {"a": 3, "b": 1}).collect()
    assert len(out) == 400
    order = sorted(out, key=lambda r: (r.interleave_key, r.src, r.k))
    # weighted round-robin: every prefix holds each source within one
    # document of its proportional share
    seen = {"a": 0, "b": 0}
    for pos, r in enumerate(order, start=1):
        seen[r.src] += 1
        assert abs(seen["a"] - pos * 3 / 4) <= 1.5, (pos, seen)
        assert abs(seen["b"] - pos * 1 / 4) <= 1.5, (pos, seen)
    # unknown sources are dropped; determinism across layouts
    df2 = df.union(spark.createDataFrame([("zz", 5)], ["src", "k"]))
    again = {
        (r.src, r.k, r.interleave_key)
        for r in interleave_sources(
            df2.repartition(5), "src", "k", {"a": 3, "b": 1}
        ).collect()
    }
    assert again == {(r.src, r.k, r.interleave_key) for r in out}


def test_rendezvous_assign_dual_and_minimal_disruption(spark):
    import collections
    import hashlib

    from imdb_top_250_etl_pipeline_spark.operators.sampling import (
        rendezvous_assign,
    )

    df = spark.createDataFrame([(i,) for i in range(500)], ["id"])
    shards = ["s0", "s1", "s2", "s3"]
    got = {r.id: r.shard for r in rendezvous_assign(df, "id", shards).collect()}

    def dual(i, ss):
        return max(
            ss,
            key=lambda s: (
                int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16),
                s,
            ),
        )

    assert got == {i: dual(i, shards) for i in range(500)}
    # THE rendezvous property: dropping a shard remaps ONLY its rows
    got3 = {
        r.id: r.shard
        for r in rendezvous_assign(df, "id", shards[:3]).collect()
    }
    moved = {i for i in range(500) if got3[i] != got[i]}
    assert moved == {i for i, s in got.items() if s == "s3"}
    # and the orphans land per the same rule over the surviving shards
    assert all(got3[i] == dual(i, shards[:3]) for i in moved)
    # rough balance: no shard starves (binomial bounds are loose here)
    counts = collections.Counter(got.values())
    assert all(60 <= counts[s] <= 190 for s in shards), counts
