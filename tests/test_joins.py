"""Skew-salted join and bucketed-layout plan guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imdb_top_250_etl_pipeline_spark.operators.joins import salted_join
from imdb_top_250_etl_pipeline_spark.sources import load

from .conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_inner_join_equals_plain_join(spark):
    orders = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
    salted = salted_join(orders, cust, "o_custkey", "c_custkey", n_salts=8)
    cols = ["o_orderkey", "o_custkey", "c_custkey", "c_mktsegment"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_left_join_preserves_unmatched_multiplicity(spark):
    orders = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    # key the dim down so a large fraction of orders go unmatched
    cust = (
        load(spark, SF_SMOKE, "customer")
        .select("c_custkey", "c_mktsegment")
        .where(F.col("c_custkey") % 5 == 0)
    )
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
    salted = salted_join(
        orders, cust, "o_custkey", "c_custkey", n_salts=4, how="left"
    )
    cols = ["o_orderkey", "o_custkey", "c_custkey", "c_mktsegment"]
    assert _rows(salted, cols) == _rows(plain, cols)
    # genuinely exercised the unmatched path
    assert salted.where(F.col("c_custkey").isNull()).count() > 0


def test_salted_join_handles_duplicate_keys_both_sides(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "rk long, rv string"
    )
    plain = left.join(right, left.k == right.rk)
    salted = salted_join(left, right, "k", "rk", n_salts=3)
    cols = ["k", "lv", "rk", "rv"]
    # 1 matches 2x2=4 ways, 2 matches 1 — multiplicity must be exact
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_join_salt_is_deterministic_across_runs(spark):
    orders = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    a = salted_join(orders, cust, "o_custkey", "c_custkey", n_salts=8)
    b = salted_join(orders, cust, "o_custkey", "c_custkey", n_salts=8)
    cols = ["o_orderkey", "c_custkey"]
    assert _rows(a, cols) == _rows(b, cols)


def test_salted_join_refuses_outer_modes(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, "id", "id", how="full")
    with pytest.raises(ValueError):
        salted_join(df, df, "id", "id", how="right")


def test_salted_join_spreads_hot_key_across_salts(spark):
    # one key owns 90% of the big side: the skew this operator exists for
    hot = spark.range(0, 1000).select(
        F.lit(42).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(0, 100).select(
        (F.col("id") % 10).alias("k"), (F.col("id") + 10_000).alias("payload")
    )
    big = hot.unionByName(cold)
    n_salts = 8
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64("k", "payload"), F.lit(n_salts))
    )
    used = (
        salted.where(F.col("k") == 42).select("_salt").distinct().count()
    )
    # the hot key's 1000 rows must occupy (essentially) all salt cells
    assert used == n_salts


def test_bucketed_tables_aggregate_without_shuffle(spark, tmp_path):
    # write-time bucketing satisfies groupBy's distribution too: join +
    # per-key aggregate, zero Exchange nodes end-to-end
    from imdb_top_250_etl_pipeline_spark.sources.sink import (
        drop_table,
        write_bucketed,
    )

    c = load(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice")
    try:
        write_bucketed(
            c, "tb_bk_c", str(tmp_path / "c"), ["c_custkey"], 4,
            sort_cols=["c_custkey"],
        )
        write_bucketed(
            o, "tb_bk_o", str(tmp_path / "o"), ["o_custkey"], 4,
            sort_cols=["o_custkey"],
        )
        agg = (
            spark.table("tb_bk_c")
            .hint("merge")
            .join(spark.table("tb_bk_o"), F.col("c_custkey") == F.col("o_custkey"))
            .groupBy("c_custkey")
            .agg(F.count("*").alias("n"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() > 0
    finally:
        drop_table(spark, "tb_bk_c")
        drop_table(spark, "tb_bk_o")


def test_preagg_join_equals_plain_join_aggregate(spark):
    """Eager aggregation must be value-identical to join-then-aggregate
    on a key-unique dim, including facts whose key has no dim match
    (inner-join semantics drop them on both paths)."""
    import pyspark.sql.functions as F

    from imdb_top_250_etl_pipeline_spark.operators.joins import preagg_join

    fact = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5), (3, 7), (99, 1000)],
        "k long, v long",
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "dk long, grp string"
    )
    got = {
        (r["grp"]): (r["sum_v"], r["n_rows"])
        for r in preagg_join(fact, dim, "k", "dk", ["v"], ["grp"]).collect()
    }
    exp = {
        r["grp"]: (r["s"], r["n"])
        for r in fact.join(dim, fact.k == dim.dk)
        .groupBy("grp")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    assert got == exp == {"a": (35, 3), "b": (7, 1)}


def test_salted_outer_joins_match_plain(spark):
    """Round 13: right/full salted joins must be row-for-row identical
    to the plain join — unmatched small rows exactly once (never once
    per salt replica), NULL keys unmatched on both sides, matched
    multiplicity preserved."""
    from pyspark.sql import functions as F

    from imdb_top_250_etl_pipeline_spark.operators.joins import salted_join

    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d"), (3, "e"), (1, "f")],
        "bk int, bval string",
    )
    small = spark.createDataFrame(
        [(1, "X"), (4, "Y"), (None, "Z"), (1, "W")], "sk int, sval string"
    )
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    for how, n_salts in (("right", 4), ("full", 4), ("right", 1), ("full", 7)):
        got = salted_join(big, small, "bk", "sk", n_salts=n_salts, how=how)
        ref = big.join(small, F.col("bk") == F.col("sk"), how)
        g = sorted((tuple(r) for r in got.collect()), key=key)
        r = sorted(
            (tuple(x) for x in ref.select(*got.columns).collect()), key=key
        )
        assert g == r, (how, n_salts, g, r)


def test_salted_outer_rejects_overlapping_columns(spark):
    import pytest

    from imdb_top_250_etl_pipeline_spark.operators.joins import salted_join

    a = spark.createDataFrame([(1, 2)], "k int, v int")
    b = spark.createDataFrame([(1, 3)], "k2 int, v int")
    with pytest.raises(ValueError, match="disjoint"):
        salted_join(a, b, "k", "k2", how="full")
    # inner stays permissive (pre-round-13 behavior unchanged)
    assert salted_join(a, b, "k", "k2", how="inner").count() == 1


def test_salted_outer_unmatched_small_exactly_once(spark):
    """The anti-join construction's core claim: an unmatched small row
    appears exactly once regardless of n_salts."""
    from imdb_top_250_etl_pipeline_spark.operators.joins import salted_join

    big = spark.createDataFrame([(1, "a")], "bk int, bval string")
    small = spark.createDataFrame(
        [(99, "lonely")], "sk int, sval string"
    )
    for n_salts in (1, 2, 16):
        rows = salted_join(
            big, small, "bk", "sk", n_salts=n_salts, how="full"
        ).collect()
        lonely = [r for r in rows if r.sval == "lonely"]
        assert len(lonely) == 1 and lonely[0].bk is None, (n_salts, rows)
