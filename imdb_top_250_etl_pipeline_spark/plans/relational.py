"""Core relational operator queries — SURVEY §2.2–§2.7.

Each query exercises one operator family over the fixture tables and has a
DuckDB oracle twin.  Scale notes are inline: every join states its intended
physical strategy at 100 TB (broadcast vs sort-merge), every agg is a
partial+final hash aggregate, and top-k queries rely on Catalyst's
TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from ..functions.numeric import money, rate, round_money
from ..operators.pinning import eager_pin
from ..sources import load
from .registry import register

# ---------------------------------------------------------------------------
# Flagship (SURVEY §7.1): scan → join → agg → sort → limit in one plan.
# ---------------------------------------------------------------------------


@register(
    "flagship_top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
    doc="Top-10 customers by discounted revenue: lineitem ⋈ orders ⋈ customer "
    "→ hash agg → TakeOrderedAndProject. customer broadcasts (small dim); "
    "lineitem⋈orders is the one shuffle, on orderkey. Revenue is summed in "
    "exact DECIMAL (order-independent) and only the final projection casts "
    "to double — both engines round the same exact value to the same IEEE "
    "bits, so the driver hash is stable.",
)
def flagship_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    revenue = F.sum(money("l_extendedprice") * (F.lit(1) - rate("l_discount")))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            # round the exact decimal sum to cents BEFORE the double cast:
            # with the unscaled value back under 2^53 both engines' decimal→
            # double conversion is a single correctly-rounded division (wide
            # scale-10 decimals hit a 1-ulp double-rounding in the JVM)
            round_money(revenue).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Aggregation battery (SURVEY §2.4) — TPC-H Q1 shape.
# ---------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,4)))
                    * (1 + CAST(l_tax AS DECIMAL(8,4)))), 2) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: filter → partial+final hash aggregate, 8 aggs. "
    "One shuffle on the two grouping keys; filter pushed to the scan.",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast(T.TimestampType())
    )
    disc_price = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    charge = disc_price * (F.lit(1) + rate("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(money("l_extendedprice")).cast("double").alias("sum_base_price"),
            round_money(F.sum(disc_price)).alias("sum_disc_price"),
            round_money(F.sum(charge)).alias("sum_charge"),
            (F.sum(money("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(rate("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="countDistinct → Spark plans expand+two-phase agg; exact, shuffles on "
    "(group, distinct) pairs. approx_count_distinct is the scale escape hatch "
    "(see agg_approx_distinct, invariant-oracled).",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           true AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="approx_count_distinct (HyperLogLog++): the 100 TB path for distinct "
    "counts — no expand, mergeable sketches.  The sketch value is "
    "engine-specific by design, so it FOLDS to the invariant the "
    "guarantee states (|approx − exact| ≤ 3·rsd·exact, a 3σ band at "
    "rsd=0.02) and the oracle pins that boolean true per group "
    "alongside the exact counts — the approx_percentile promotion "
    "discipline; the unit test additionally bounds the raw error.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    approx = F.approx_count_distinct("l_partkey", rsd=0.02)
    exact = F.countDistinct("l_partkey").cast("long")
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            exact.alias("exact_parts"),
            F.count("*").alias("n_rows"),
            (
                F.abs(approx.cast("double") - exact.cast("double"))
                <= 3 * 0.02 * exact.cast("double")
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT n.n_name, o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
           CAST(GROUPING(n.n_name) AS INT) AS g_nation,
           CAST(GROUPING(o.o_orderpriority) AS INT) AS g_prio
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP(n.n_name, o.o_orderpriority)
    ORDER BY g_nation, g_prio, n_name NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="ROLLUP hierarchy totals; GROUPING() flags disambiguate data-NULLs "
    "from subtotal rows. Expand multiplies rows pre-shuffle — at scale "
    "prefer two-level re-agg; still one shuffle here.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("total"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
        .orderBy(
            "g_nation",
            "g_prio",
            F.col("n_name").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE over two low-cardinality keys (4× expand, fine at any scale "
    "for enum-like keys).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
        )
        .orderBy(
            "g_rf",
            "g_ls",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Join battery (SURVEY §2.3: J1-J4 + engine-completeness joins).
# ---------------------------------------------------------------------------


@register(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderstatus
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                      AND o.o_orderstatus = 'F'
    ORDER BY c.c_custkey, o.o_orderkey
    """,
    doc="J1 (reference's only join, webscraper-postgres.py:101) as left "
    "equi-join with a pushed-down build-side predicate.",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_orderstatus")
        .orderBy("c_custkey", "o_orderkey")
    )


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
    doc="J2/J3: the reference's hand-rolled dict-lookup joins "
    "(webscraper-postgres.py:166-170,225-227) are broadcast hash joins — "
    "dims ship to every executor, zero shuffle on the fact side.",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(money("c_acctbal")).cast("double").alias("total_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "join_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    ORDER BY c.c_custkey
    """,
    doc="P6 membership test as left-semi join (no row duplication, probe "
    "side streams).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c.c_custkey
    """,
    doc="S6's insert-ignore (ON CONFLICT DO NOTHING, webscraper-postgres.py"
    ":160) reduces to left-anti join: keep rows with no match.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
         rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT COALESCE(b.o_custkey, r.c_custkey) AS custkey,
           (b.o_custkey IS NOT NULL) AS has_open_order,
           (r.c_custkey IS NOT NULL) AS is_rich
    FROM buyers b
    FULL OUTER JOIN rich r ON b.o_custkey = r.c_custkey
    ORDER BY custkey
    """,
    doc="Full outer join + coalesce key resolution — the core of the MERGE "
    "upsert pattern (S5).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    buyers = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .distinct()
    )
    rich = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    return (
        buyers.join(rich, buyers.o_custkey == rich.c_custkey, "full_outer")
        .select(
            F.coalesce("o_custkey", "c_custkey").alias("custkey"),
            F.col("o_custkey").isNotNull().alias("has_open_order"),
            F.col("c_custkey").isNotNull().alias("is_rich"),
        )
        .orderBy("custkey")
    )


@register(
    "join_right",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment
    FROM orders o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
    ORDER BY c.c_custkey, o.o_orderkey
    """,
    doc="Right outer join (engine completeness; Spark flips build side).",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.o_totalprice > 450000), "right")
        .select("o_orderkey", "c_custkey", "c_mktsegment")
        .orderBy("c_custkey", "o_orderkey")
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, x.n_name
    FROM region r CROSS JOIN (SELECT n_name FROM nation WHERE n_nationkey < 3) x
    ORDER BY r.r_name, x.n_name
    """,
    doc="Cross join, small×small only (BroadcastNestedLoop); at scale cross "
    "joins are always bounded by a pre-filter or bucketed (see similarity ops).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation").where(F.col("n_nationkey") < 3).select("n_name")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "join_range_theta",
    oracle="""
    SELECT p.p_partkey, p.p_size, b.bucket_name
    FROM part p
    JOIN (VALUES ('tiny', 0, 10), ('small', 10, 25), ('large', 25, 1000000))
         AS b(bucket_name, lo, hi)
      ON p.p_size >= b.lo AND p.p_size < b.hi
    ORDER BY p.p_partkey
    """,
    doc="Theta/range join against a tiny banding table — broadcast nested "
    "loop; the scale path for big-big range joins is bucketize-then-equi-join.",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    bands = p.sparkSession.createDataFrame(
        [("tiny", 0, 10), ("small", 10, 25), ("large", 25, 1000000)],
        "bucket_name string, lo int, hi int",
    )
    return (
        p.join(F.broadcast(bands), (p.p_size >= bands.lo) & (p.p_size < bands.hi))
        .select("p_partkey", "p_size", "bucket_name")
        .orderBy("p_partkey")
    )


@register(
    "join_zip_positional",
    oracle="""
    WITH r AS (SELECT r_name, row_number() OVER (ORDER BY r_regionkey) AS rn
               FROM region),
         n AS (SELECT n_name, row_number() OVER (ORDER BY n_nationkey) AS rn
               FROM nation)
    SELECT CAST(r.rn AS BIGINT) AS pos, r.r_name, n.n_name
    FROM r JOIN n ON r.rn = n.rn
    ORDER BY pos
    """,
    doc="J4: positional zip pairing (the reference's dict(zip(col_a, "
    "col_b)), webscraper-postgres.py:227) across tables — row_number-"
    "keyed equi-join, inner semantics truncate to the shorter side like "
    "Python zip. Partition-less windows are fine here (dim tables); "
    "fact-sized zips use with_surrogate_key's distributed ids.",
)
def join_zip_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select(
        "r_name", F.row_number().over(W.orderBy("r_regionkey")).alias("rn")
    )
    n = load(spark, sf_dir, "nation").select(
        "n_name", F.row_number().over(W.orderBy("n_nationkey")).alias("rn")
    )
    return (
        r.join(n, "rn")
        .select(F.col("rn").cast("bigint").alias("pos"), "r_name", "n_name")
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# Projections / filters (SURVEY §2.2) — pushdown-verified shapes.
# ---------------------------------------------------------------------------


@register(
    "filter_project_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount > 0.05
      AND l_returnflag = 'R'
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="P1-analog: multi-predicate filter + computed projection. All three "
    "predicates reach the parquet scan (PushedFilters); ReadSchema is 6 of "
    "11 columns.",
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast(T.TimestampType()))
            & (F.col("l_discount") > 0.05)
            & (F.col("l_returnflag") == "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (money("l_extendedprice") * (F.lit(1) - rate("l_discount")))
            .cast("double")
            .alias("net_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "filter_null_handling",
    oracle="""
    SELECT e.event_id, e.value,
           (e.value IS NULL) AS value_missing,
           COALESCE(e.value, 0.0) AS value_filled
    FROM events e
    WHERE e.event_id < 200
    ORDER BY e.event_id
    """,
    doc="P5/P7: null predicates + coalesce fill (reference's nan→NULL "
    "normalization, webscraper-postgres.py:176,184).",
)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 200)
    return e.select(
        "event_id",
        "value",
        F.col("value").isNull().alias("value_missing"),
        F.coalesce("value", F.lit(0.0)).alias("value_filled"),
    ).orderBy("event_id")


@register(
    "column_drop",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="P3: df.drop() — Catalyst column pruning makes the dropped columns "
    "never leave the parquet reader.",
)
def column_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return li.drop(
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# Sorts / top-k (SURVEY §2.6) and set ops (§2.7).
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="T1: ORDER BY + LIMIT → TakeOrderedAndProject (per-partition heaps, "
    "no global sort). The reference outsourced this to IMDb's server "
    "(webscraper-postgres.py:30).",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "set_union_distinct",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
    ) ORDER BY custkey
    """,
    doc="A1: the reference's set(chain(...)) distinct-union "
    "(webscraper-postgres.py:147-154) = UNION DISTINCT.",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    b = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return a.unionByName(b).distinct().orderBy("custkey")


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ORDER BY custkey
    """,
    doc="INTERSECT (engine completeness, SURVEY §2.7).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b).orderBy("custkey")


@register(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    ORDER BY custkey
    """,
    doc="EXCEPT: 'insert only new keys' (S6) is exactly new EXCEPT existing. "
    "subtract() is EXCEPT DISTINCT — correct even when a left value's "
    "multiplicity exceeds its right multiplicity (exceptAll would keep it).",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o).orderBy("custkey")


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.5).
# ---------------------------------------------------------------------------


@register(
    "window_rank_dense",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           CAST(rank() OVER w AS BIGINT) AS price_rank,
           CAST(dense_rank() OVER w AS BIGINT) AS price_dense_rank,
           CAST(row_number() OVER (PARTITION BY p_brand
                ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
    ORDER BY p_brand, rn, p_partkey
    """,
    doc="rank/dense_rank/row_number — the engine derives the 'rank' the "
    "reference scraped pre-computed (webscraper-postgres.py:38), and "
    "row_number is the SERIAL surrogate-key primitive (:112). "
    "Low-cardinality partition keys at 100 TB: use operators/windows.py"
    "::grouped_row_number instead (parallelism beyond n_groups).",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    wrn = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
        F.row_number().over(wrn).cast("long").alias("rn"),
    ).orderBy("p_brand", "rn", "p_partkey")


@register(
    "window_running_sum",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    ORDER BY user_id, ts, event_id
    """,
    doc="Frame-spec window (rowsBetween) — running total per user over the "
    "event stream; the batch form of the streaming cumulative state op.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(money("value")).over(w).cast("double").alias("running_value"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts,
           lag(event_type) OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts, event_id
    """,
    doc="lag/lead navigation + inter-event gap — the sessionization "
    "building block.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).alias("secs_since_prev"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
      FROM customer
    ) WHERE rn <= 3
    ORDER BY c_mktsegment, rn
    """,
    doc="Top-K per group: window row_number + filter. At scale this beats "
    "groupBy+collect_list by never materializing groups. When the "
    "partition key is low-cardinality at 100 TB, swap the window for "
    "operators/windows.py::grouped_row_number (range-partitioned, "
    "offset-corrected — parallelism independent of group count).",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "window_distribution_battery",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           first_value(c_custkey) OVER w AS richest_key,
           last_value(c_custkey) OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS poorest_key,
           nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS runner_up_key
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    """,
    doc="Distribution windows: ntile, percent_rank, cume_dist, first/last/"
    "nth_value. percent_rank = (rank-1)/(n-1) and cume_dist = n_le/n are "
    "single exact-integer divisions — engine-stable doubles. last/nth "
    "need the full-partition frame (the default frame stops at "
    "CURRENT ROW — a classic silent-wrong-answer; spelled out on both "
    "sides).",
)
def window_distribution_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(w).alias("richest_key"),
        F.last("c_custkey").over(w_full).alias("poorest_key"),
        F.nth_value("c_custkey", 2).over(w_full).alias("runner_up_key"),
    ).orderBy("c_mktsegment", F.desc("c_acctbal"), "c_custkey")


@register(
    "flagship_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): 6-way join — region/"
    "nation/supplier broadcast as dims, customer⋈orders⋈lineitem "
    "shuffles on their keys, the region filter prunes before any fact "
    "work. The classic join-ordering showcase; Catalyst + AQE pick the "
    "physical order.",
)
def flagship_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast(T.TimestampType()))
        & (F.col("o_orderdate") < F.lit("1995-01-01 00:00:00").cast(T.TimestampType()))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.sum(money("l_extendedprice") * (F.lit(1) - rate("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(round_money(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Pivot (engine completeness — common OLAP reshape).
# ---------------------------------------------------------------------------


@register(
    "pivot_status_by_flag",
    oracle="""
    WITH piv AS (
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN l_linestatus = 'O'
                  THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_O,
             CAST(SUM(CASE WHEN l_linestatus = 'F'
                  THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_F
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT 'pivot' AS part, l_returnflag, CAST(NULL AS VARCHAR) AS status,
           qty_O, qty_F, CAST(NULL AS DOUBLE) AS qty
    FROM piv
    UNION ALL
    SELECT 'unpivot' AS part, l_returnflag, s AS status,
           CAST(NULL AS DOUBLE) AS qty_O, CAST(NULL AS DOUBLE) AS qty_F,
           CASE s WHEN 'O' THEN qty_O ELSE qty_F END AS qty
    FROM piv CROSS JOIN (SELECT unnest(['O', 'F']) AS s)
    ORDER BY part, l_returnflag, status
    """,
    doc="Pivot with explicit value list (no discovery pass — required at "
    "scale; unlisted values would need an extra distinct scan) AND its "
    "inverse: df.unpivot melts the wide result back to long form — the "
    "round-trip proves both reshapes, tagged in one output.",
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(money("l_quantity")).cast("double"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
    )
    wide = piv.select(
        F.lit("pivot").alias("part"),
        "l_returnflag",
        F.lit(None).cast("string").alias("status"),
        "qty_O",
        "qty_F",
        F.lit(None).cast("double").alias("qty"),
    )
    melted = (
        piv.unpivot(
            ["l_returnflag"], ["qty_O", "qty_F"], "status", "qty"
        )
        .select(
            F.lit("unpivot").alias("part"),
            "l_returnflag",
            # unpivot's variable column carries the source column NAME —
            # strip the qty_ prefix back to the original status value
            F.substring("status", 5, 1).alias("status"),
            F.lit(None).cast("double").alias("qty_O"),
            F.lit(None).cast("double").alias("qty_F"),
            "qty",
        )
    )
    return wide.unionByName(melted).orderBy("part", "l_returnflag", "status")


# ---------------------------------------------------------------------------
# Scale-hardened join strategies (J-family at 100 TB): bucketed co-location
# and deterministic skew salting.  Both branches compute a plain-join
# aggregate the oracle can state in ANSI SQL — the STRATEGY is pinned by ok
# columns (no Exchange / salt in the join keys), the RESULT by the hash.
# ---------------------------------------------------------------------------


def _physical_plan(df: DataFrame) -> str:
    """Executed-plan string for ok-column pins; '' if the private plan
    accessor is unavailable (non-classic session) so the pin fails
    loudly rather than passing vacuously."""
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return ""


@register(
    "join_scale_battery",
    oracle=(
        "SELECT 'bucketed' AS part, CAST(c_custkey AS VARCHAR) AS k, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS v, "
        "true AS ok FROM customer JOIN orders ON c_custkey = o_custkey "
        "GROUP BY c_custkey"
        "\nUNION ALL\n"
        "SELECT 'salted' AS part, c_mktsegment AS k, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS v, "
        "true AS ok FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment"
        "\nUNION ALL\n"
        "SELECT 'salted_left' AS part, c.c_mktsegment AS k, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS v, "
        "true AS ok FROM orders o LEFT JOIN "
        "(SELECT * FROM customer WHERE c_custkey % 3 = 0) c "
        "ON o.o_custkey = c.c_custkey GROUP BY c.c_mktsegment"
        "\nUNION ALL\n"
        "SELECT 'salted_right' AS part, c.c_mktsegment AS k, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(ROUND(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0), 2) AS DOUBLE) AS v, "
        "true AS ok FROM orders o RIGHT JOIN customer c "
        "ON o.o_custkey = c.c_custkey GROUP BY c.c_mktsegment"
        "\nUNION ALL\n"
        "SELECT 'salted_full' AS part, c.c_mktsegment AS k, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(ROUND(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0), 2) AS DOUBLE) AS v, "
        "true AS ok FROM orders o FULL JOIN "
        "(SELECT * FROM customer WHERE c_custkey % 3 = 0) c "
        "ON o.o_custkey = c.c_custkey GROUP BY c.c_mktsegment"
    ),
    doc="The two join constructions Catalyst cannot pick on its own, "
    "result-hash-checked against the PLAIN-join oracle (strategy must "
    "not change semantics) with the strategy itself pinned by ok "
    "columns.  part=bucketed: customer and orders persisted via "
    "sources/sink.py::write_bucketed (8 hash buckets on the join key), "
    "then joined AND aggregated per custkey — ok pins that the entire "
    "executed plan contains ZERO Exchange nodes: the write-time "
    "bucketing satisfies both the sort-merge join's and the groupBy's "
    "distribution, the pay-the-shuffle-once layout for a daily-rerun "
    "100 TB join.  part=salted/salted_left: operators/joins.py::"
    "salted_join spreads each order key over 8 deterministic salts "
    "(xxhash64, not rand — retry-stable and oracle-checkable) while the "
    "customer side replicates once per salt, so a key owning 30% of the "
    "fact occupies 8 tasks instead of melting one; ok pins that _salt "
    "actually entered the join keys.  The left branch keys the dim down "
    "to a third of customers so unmatched orders must survive with NULL "
    "segment — the multiplicity-preservation half of the salting "
    "contract.  part=salted_right/salted_full (round 13): the OUTER "
    "small side — result = salted inner/left ∪ null-extended small "
    "rows anti-joined against the big side's DISTINCT keys, so "
    "unmatched customers appear exactly once (never once per salt "
    "replica) and the hot key never re-concentrates (the anti join "
    "shuffles distinct keys only).  TPC-H's ~1/3 orderless customers "
    "are the naturally-unmatched small rows; the full branch keeps the "
    "thirded dim so BOTH null sides ride the hash.",
)
def join_scale_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.joins import salted_join
    from ..sources.sink import drop_table, write_bucketed

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")

    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
    )
    os.makedirs(scratch, exist_ok=True)
    path = tempfile.mkdtemp(prefix="join_scale_", dir=scratch)
    try:
        write_bucketed(
            cust, "jsb_bk_customer", os.path.join(path, "c"),
            ["c_custkey"], 8, sort_cols=["c_custkey"],
        )
        write_bucketed(
            orders, "jsb_bk_orders", os.path.join(path, "o"),
            ["o_custkey"], 8, sort_cols=["o_custkey"],
        )
        # hint forces sort-merge: fixture-sized dims would auto-broadcast,
        # which hides the property under test (and a BroadcastExchange
        # would trip the no-Exchange pin)
        bk = (
            spark.table("jsb_bk_customer")
            .hint("merge")
            .join(
                spark.table("jsb_bk_orders"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .groupBy("c_custkey")
            .agg(
                F.count("*").alias("n"),
                round_money(F.sum(money("o_totalprice"))).alias("v"),
            )
        )
        ok_bk = "Exchange" not in _physical_plan(bk)
        # eager pin: detach before DROP TABLE/rmtree below
        bucketed = eager_pin(
            bk.select(
                F.lit("bucketed").alias("part"),
                F.col("c_custkey").cast("string").alias("k"),
                "n",
                "v",
                F.lit(bool(ok_bk)).alias("ok"),
            )
        )

        sj = salted_join(orders, cust, "o_custkey", "c_custkey", n_salts=8)
        ok_salt = "_salt" in _physical_plan(sj)
        salted = (
            sj.groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                round_money(F.sum(money("o_totalprice"))).alias("v"),
            )
            .select(
                F.lit("salted").alias("part"),
                F.col("c_mktsegment").alias("k"),
                "n",
                "v",
                F.lit(bool(ok_salt)).alias("ok"),
            )
        )

        sjl = salted_join(
            orders,
            cust.where(F.col("c_custkey") % 3 == 0),
            "o_custkey",
            "c_custkey",
            n_salts=8,
            how="left",
        )
        salted_left = (
            sjl.groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                round_money(F.sum(money("o_totalprice"))).alias("v"),
            )
            .select(
                F.lit("salted_left").alias("part"),
                F.col("c_mktsegment").alias("k"),
                "n",
                "v",
                F.lit(True).alias("ok"),
            )
        )

        sjr = salted_join(
            orders, cust, "o_custkey", "c_custkey", n_salts=8, how="right"
        )
        ok_right = "_salt" in _physical_plan(sjr)
        salted_right = (
            sjr.groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                round_money(
                    F.coalesce(
                        F.sum(money("o_totalprice")),
                        F.lit(0).cast("decimal(12,2)"),
                    )
                ).alias("v"),
            )
            .select(
                F.lit("salted_right").alias("part"),
                F.col("c_mktsegment").alias("k"),
                "n",
                "v",
                F.lit(bool(ok_right)).alias("ok"),
            )
        )

        sjf = salted_join(
            orders,
            cust.where(F.col("c_custkey") % 3 == 0),
            "o_custkey",
            "c_custkey",
            n_salts=8,
            how="full",
        )
        ok_full = "_salt" in _physical_plan(sjf)
        salted_full = (
            sjf.groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                round_money(
                    F.coalesce(
                        F.sum(money("o_totalprice")),
                        F.lit(0).cast("decimal(12,2)"),
                    )
                ).alias("v"),
            )
            .select(
                F.lit("salted_full").alias("part"),
                F.col("c_mktsegment").alias("k"),
                "n",
                "v",
                F.lit(bool(ok_full)).alias("ok"),
            )
        )

        return eager_pin(
            bucketed.unionByName(salted)
            .unionByName(salted_left)
            .unionByName(salted_right)
            .unionByName(salted_full)
        )
    finally:
        drop_table(spark, "jsb_bk_customer")
        drop_table(spark, "jsb_bk_orders")
        shutil.rmtree(path, ignore_errors=True)
