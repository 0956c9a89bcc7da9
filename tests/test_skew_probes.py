"""Skewed-data probes for the distributed window / composition operators.

The pid-pinning machinery (operators/windows.py) is correctness-tested on
uniform fixtures; these probes feed the deliberately hostile shapes the
100 TB design claims to survive — one group holding 90% of all rows, a
key space with 90% of keys clustered in a tiny range, and power-law user
activity — and assert (a) exact equivalence with an independent dual and
(b) that the range partitioner actually spreads the hot group across
partitions instead of collapsing it into one task (the single-task
window failure mode the operators exist to avoid).

Wall-clock numbers are printed (run with -s) and recorded in COVERAGE.md
alongside the round-3 dedup scaling probes; they are not asserted — this
container shares hardware and timing assertions flake.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _skewed_groups(spark, n=200_000, hot_frac=0.9, n_cold=20):
    """90% of rows in one group, the rest uniform over n_cold groups.
    Order key (h, id) is a shuffled total order."""
    hot_n = int(n * hot_frac)
    return spark.range(n).select(
        F.when(F.col("id") < hot_n, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % n_cold).cast("string")))
        .alias("g"),
        F.xxhash64("id").alias("h"),
        F.col("id"),
        (F.col("id") % 97).cast("long").alias("val"),
    )


def test_grouped_row_number_skewed_group_exact_and_balanced(spark):
    from imdb_top_250_etl_pipeline_spark.operators.windows import (
        grouped_row_number,
    )

    df = _skewed_groups(spark)
    t0 = time.perf_counter()
    got = grouped_row_number(df, ["g"], ["h", "id"], out_col="rn")
    dual = df.withColumn(
        "rn", F.row_number().over(W.partitionBy("g").orderBy("h", "id")).cast("long")
    )
    assert got.exceptAll(dual).isEmpty() and dual.exceptAll(got).isEmpty()
    wall = time.perf_counter() - t0
    print(f"\nskew-probe grouped_row_number 200k rows 90%-one-group: {wall:.2f}s")

    # the scale claim itself: range partitioning on (g, order) splits the
    # hot group across many partitions — no partition holds more than a
    # few times the fair share, so parallelism is ~n_partitions, not
    # n_groups (a groupBy-keyed exchange would put 90% in ONE task)
    n_parts = 64
    sizes = (
        df.repartitionByRange(n_parts, F.col("g"), F.col("h"), F.col("id"))
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    fair = df.count() / n_parts
    assert len(counts) > n_parts // 2, "range partitioner collapsed partitions"
    assert max(counts) <= 4 * fair, (
        f"hot group not spread: max partition {max(counts)} vs fair {fair:.0f}"
    )


def test_distributed_cumsum_clustered_keyspace_exact(spark):
    from imdb_top_250_etl_pipeline_spark.operators.windows import (
        distributed_cumsum,
    )

    # 90% of order keys clustered in [0, 1000), the tail spread over 1e9 —
    # a range partitioner must split the dense cluster by the tie-break id
    n = 200_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.pmod(F.xxhash64("id"), F.lit(1000)))
        .otherwise(F.pmod(F.xxhash64("id", "id"), F.lit(1_000_000_000)))
        .alias("k"),
        F.col("id"),
        (F.col("id") % 13).cast("long").alias("val"),
    )
    t0 = time.perf_counter()
    got = distributed_cumsum(df, ["k", "id"], "val", out_col="cs")
    dual = df.withColumn(
        "cs",
        F.sum("val").over(
            W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    assert got.exceptAll(dual).isEmpty() and dual.exceptAll(got).isEmpty()
    print(
        f"\nskew-probe distributed_cumsum 200k rows 90%-clustered-keys: "
        f"{time.perf_counter() - t0:.2f}s"
    )


def _power_law_events(spark, n=60_000):
    """User 0 owns half of all events; 500 cold users share the rest.
    Event types cycle view/click/purchase deterministically."""
    return spark.range(n).select(
        F.when(F.col("id") < n // 2, F.lit(0))
        .otherwise(1 + F.pmod(F.xxhash64("id"), F.lit(500)))
        .alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.pmod(F.xxhash64("id", "id"), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (
            F.to_timestamp(F.lit("2024-03-01 00:00:00"))
            + F.make_interval(secs=F.pmod(F.xxhash64(F.col("id") + 7), F.lit(2_000_000)))
        ).alias("ts"),
        F.col("id").alias("event_id"),
    )


def test_funnel_power_law_matches_pandas_dual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.analytics import funnel_steps

    ev = _power_law_events(spark)
    t0 = time.perf_counter()
    got = {
        r.user_id: (r.t_1, r.t_2, r.t_3, r.n_steps)
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    wall = time.perf_counter() - t0
    print(f"\nskew-probe funnel 60k events 50%-one-user: {wall:.2f}s")

    pdf = ev.toPandas()
    expected = {}
    for uid, g in pdf.groupby("user_id"):
        t1 = g.loc[g.event_type == "view", "ts"].min()
        if t1 != t1:  # NaT
            continue
        t2 = g.loc[(g.event_type == "click") & (g.ts > t1), "ts"].min()
        t3 = (
            g.loc[(g.event_type == "purchase") & (g.ts > t2), "ts"].min()
            if t2 == t2
            else float("nan")
        )
        n = 1 + (t2 == t2) + (t3 == t3)
        expected[uid] = (
            t1.to_pydatetime(),
            t2.to_pydatetime() if t2 == t2 else None,
            t3.to_pydatetime() if t3 == t3 else None,
            n,
        )
    assert got == expected


def test_retention_power_law_matches_pandas_dual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.analytics import (
        retention_cohorts,
    )

    ev = _power_law_events(spark)
    t0 = time.perf_counter()
    got = {
        (r.cohort_date, r.day_offset): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    wall = time.perf_counter() - t0
    print(f"\nskew-probe retention 60k events 50%-one-user: {wall:.2f}s")

    pdf = ev.toPandas()
    pdf["day"] = pdf.ts.dt.normalize()
    firsts = pdf.groupby("user_id").day.min().rename("cohort")
    act = pdf[["user_id", "day"]].drop_duplicates().join(firsts, on="user_id")
    act["off"] = (act.day - act.cohort).dt.days
    expected = {
        (c.date(), o): int(n)
        for (c, o), n in act.groupby(["cohort", "off"]).user_id.nunique().items()
    }
    assert got == expected


def test_attribution_hand_computed(spark):
    from imdb_top_250_etl_pipeline_spark.operators.analytics import (
        attribution,
    )

    rows = [
        # user 1: touch a, touch b, convert, touch c, convert
        (1, 10, 1, "a", "T"), (1, 20, 2, "b", "T"), (1, 30, 3, None, "C"),
        (1, 40, 4, "c", "T"), (1, 50, 5, None, "C"),
        # user 2: organic conversion (no prior touch)
        (2, 10, 6, None, "C"), (2, 20, 7, "a", "T"),
        # user 3: same-instant touch must be creditable
        (3, 10, 8, "b", "T"), (3, 10, 9, None, "C"),
    ]
    df = spark.createDataFrame(
        rows, "u long, ts long, eid long, ch string, kind string"
    )
    got = {
        r.eid: (r.first_touch, r.last_touch)
        for r in attribution(
            df, "u", "ts", "ch",
            F.col("kind") == "T", F.col("kind") == "C", order_col="eid",
        ).collect()
    }
    assert got == {
        3: ("a", "b"),
        5: ("a", "c"),
        6: (None, None),   # organic
        9: ("b", "b"),     # same-instant touch credited
    }


def test_triangle_counting_survives_celebrity_hub(spark):
    """Degree-ordered orientation under a hostile degree distribution:
    a 5000-spoke star plus a small clique.  Without orientation the hub
    alone generates C(5000,2) ≈ 12.5M wedges; WITH it every star edge
    orients INTO the hub (spokes have degree 1 < 5000), the hub has
    zero out-edges, and wedge volume collapses to the clique's — so the
    probe both checks exactness and would time out if orientation
    regressed to naive wedge generation."""
    import time

    from imdb_top_250_etl_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    hub = 0
    star = [(hub, i) for i in range(1, 5001)]
    # clique on 5 nodes that also touch the hub via the star edges
    clique = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    df = spark.createDataFrame(star + clique, "src long, dst long")
    t0 = time.time()
    got = {r["node"]: r["n_tri"] for r in triangle_counts(df).collect()}
    wall = time.time() - t0
    # K5 gives each clique node C(4,2)=6 in-clique triangles; since
    # clique nodes are also spokes, each (a, b) clique pair closes a
    # (hub, a, b) triangle too: hub sits in C(5,2)=10, each clique node
    # in 6 + 4 = 10.  Plain spokes (6..5000) close nothing.
    assert got == {n: 10 for n in range(0, 6)}
    assert wall < 60, f"triangle probe took {wall:.0f}s — orientation broken?"


def test_grouped_cumsum_skewed_group_exact_and_balanced(spark):
    from imdb_top_250_etl_pipeline_spark.operators.windows import (
        grouped_cumsum,
    )

    df = _skewed_groups(spark)
    t0 = time.perf_counter()
    got = grouped_cumsum(df, ["g"], ["h", "id"], "val", out_col="cs")
    dual = df.withColumn(
        "cs",
        F.sum("val").over(
            W.partitionBy("g")
            .orderBy("h", "id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    assert got.exceptAll(dual).isEmpty() and dual.exceptAll(got).isEmpty()
    wall = time.perf_counter() - t0
    print(f"\nskew-probe grouped_cumsum 200k rows 90%-one-group: {wall:.2f}s")
    # same spread claim as grouped_row_number: the hot group's prefix
    # sums come from many range partitions, not one group-keyed task
    n_parts = 64
    sizes = (
        df.repartitionByRange(n_parts, F.col("g"), F.col("h"), F.col("id"))
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    fair = df.count() / n_parts
    assert len(counts) > n_parts // 2
    assert max(counts) <= 4 * fair
