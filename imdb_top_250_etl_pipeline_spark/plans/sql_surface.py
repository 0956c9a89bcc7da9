"""SQL-API surface queries: the engine's second entry path.

Everything else in the registry uses the DataFrame API; a user of the
engine also gets ``spark.sql`` over the catalog views
(sources.catalog.register_views).  Both paths build the same Catalyst
logical plan — these queries prove the SQL route end-to-end and cover
GROUPING SETS, which reaches the DataFrame API only in newer Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import load
from ..sources.catalog import register_views
from .registry import register


@register(
    "sql_grouping_sets",
    oracle="""
    SELECT n.n_name, o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(GROUPING(n.n_name) AS INT) AS g_nation,
           CAST(GROUPING(o.o_orderpriority) AS INT) AS g_prio
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (o.o_orderpriority), ())
    ORDER BY g_nation, g_prio, n_name NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="GROUPING SETS through the spark.sql entry path (explicit set "
    "list — unlike rollup/cube only the requested groupings expand, so "
    "the pre-shuffle multiplier is len(sets), not 2^keys).",
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, o.o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(GROUPING(n.n_name) AS INT) AS g_nation,
               CAST(GROUPING(o.o_orderpriority) AS INT) AS g_prio
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((n.n_name), (o.o_orderpriority), ())
        ORDER BY g_nation, g_prio, n_name ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST
        """
    )


@register(
    "sql_tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 (shipping priority) through spark.sql: 3-way join with "
    "selective pushed filters → hash agg → top-10. The canonical "
    "scan-join-agg-topk plan; decimal-exact revenue, round-to-cents "
    "double projection (registry discipline).",
)
def sql_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_orderkey,
               CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE)
                   AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
        """
    )


@register(
    "sql_q17_correlated_subquery",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_price,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery (below-half-average "
    "quantity per part). Catalyst decorrelates it into an aggregate + "
    "join — the rewrite that makes per-row subqueries feasible at scale "
    "(a true per-row execution would be O(rows × parts)).",
)
def sql_q17_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                   AS total_price,
               COUNT(*) AS n_small
        FROM lineitem l
        WHERE l.l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
        )
        """
    )


@register(
    "join_null_safe",
    oracle="""
    WITH a AS (SELECT event_id, CASE WHEN event_id % 5 = 0 THEN NULL
                    ELSE event_id % 7 END AS k
               FROM events WHERE event_id < 300),
         b AS (SELECT CASE WHEN event_id % 4 = 0 THEN NULL
                    ELSE event_id % 7 END AS k,
                    COUNT(*) AS n
               FROM events WHERE event_id < 300 GROUP BY 1)
    SELECT a.event_id, a.k, b.n
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY a.event_id
    """,
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other instead of vanishing — the semantics upsert keys "
    "need when the business key is nullable. Still hash-partitionable "
    "(NULL hashes like any value under <=>), so it stays an equi-join, "
    "not a theta join.",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 300)
    k_a = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
        F.col("event_id") % 7
    )
    k_b = F.when(F.col("event_id") % 4 == 0, F.lit(None)).otherwise(
        F.col("event_id") % 7
    )
    a = e.select("event_id", k_a.alias("k"))
    b = e.select(k_b.alias("k")).groupBy("k").agg(F.count("*").alias("n"))
    return (
        a.join(b, a.k.eqNullSafe(b.k))
        .select("event_id", a.k.alias("k"), "n")
        .orderBy("event_id")
    )


@register(
    "agg_collect_battery",
    oracle="""
    WITH ranked AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders
    ),
    top3 AS (
      SELECT o_orderpriority,
             array_to_string(list_transform(list_sort(list(o_orderkey)),
                 x -> CAST(x AS VARCHAR)), '|') AS top3_orders
      FROM ranked WHERE rn <= 3 GROUP BY o_orderpriority
    ),
    base AS (
      SELECT o_orderpriority,
             array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|')
                 AS statuses,
             CAST(COUNT(DISTINCT o_custkey) AS INT) AS n_buyers
      FROM orders GROUP BY o_orderpriority
    )
    SELECT b.o_orderpriority, b.statuses, b.n_buyers, t.top3_orders
    FROM base b JOIN top3 t USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
    doc="Array-building aggregates: collect_set (sorted for determinism), "
    "distinct cardinality via the set, and top-3 keys per group. "
    "collect_* materializes whole groups — bounded domains only at "
    "scale; the top-k variant pre-filters with a window so only 3 rows "
    "per group reach the collect. Array outputs are serialized to "
    "'|'-joined strings so the driver's pandas canonicalizer (which "
    "cannot sort list cells) hash-checks them.",
)
def agg_collect_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ranked = o.withColumn("rn", F.row_number().over(w))
    top3 = (
        ranked.where(F.col("rn") <= 3)
        .groupBy("o_orderpriority")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.sort_array(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
            ).alias("top3_orders")
        )
    )
    base = o.groupBy("o_orderpriority").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("o_orderstatus"))).alias(
            "statuses"
        ),
        F.size(F.collect_set("o_custkey")).cast("int").alias("n_buyers"),
    )
    return (
        base.join(top3, "o_orderpriority")
        .select("o_orderpriority", "statuses", "n_buyers", "top3_orders")
        .orderBy("o_orderpriority")
    )


@register(
    "scalar_posexplode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id, pos
    """,
    doc="posexplode: unnest retaining the element index (1-based to match "
    "SQL generate_subscripts) — the keyed-unnest primitive under E2 when "
    "position matters (token order, frame indices).",
)
def scalar_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
    ).select(
        "doc_id", (F.col("pos") + 1).cast("int").alias("pos"), "word"
    ).orderBy("doc_id", "pos")


@register(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(stddev_samp(l_quantity), 6) AS qty_stddev,
           round(var_samp(l_quantity), 6) AS qty_var,
           round(skewness(l_quantity) * (COUNT(*) - 2)
                 / sqrt(COUNT(*) * (COUNT(*) - 1.0)), 6) AS qty_skew,
           round(kurtosis_pop(l_quantity), 6) AS qty_kurt,
           round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Statistical-moment aggregates per returnflag: stddev, variance, "
    "skewness, kurtosis, corr(price, qty) — the profiling aggregates a "
    "data pipeline runs before training. Estimator reconciliation makes "
    "this hash-checkable: Spark's skewness/kurtosis are POPULATION form "
    "(g1, excess g2) while DuckDB's are sample form, so the oracle maps "
    "skewness via g1 = G1*(n-2)/sqrt(n(n-1)) and uses kurtosis_pop "
    "directly; stddev_samp/var_samp/corr agree as-is. Both engines' "
    "streaming central-moment accumulators agree to ~1e-14 relative, so "
    "round(x, 6) on both sides lands on identical doubles (measured at "
    "sf0.01 and sf0.1) — the quantile_bins exact-mode precedent. Values "
    "are additionally numpy-pinned in tests/test_stats.py.",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
            F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
            F.round(F.skewness("l_quantity"), 6).alias("qty_skew"),
            F.round(F.kurtosis("l_quantity"), 6).alias("qty_kurt"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           true AS approx_ok
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Exact median + linear-interpolated percentiles (p50/p90/p99) of "
    "order totals per priority — Spark's percentile and DuckDB's "
    "quantile_cont share the lerp-at-rank-p*(n-1) definition, so "
    "round(x, 4) hash-matches (the quantile_bins exact-mode precedent) — "
    "plus approx_percentile, the sketch path that replaces exact sorting "
    "at 100 TB, verified AS AN INVARIANT (within 5% of the exact p90, "
    "folded to a boolean the oracle pins to true — sketch values "
    "themselves are engine-specific, the agg_distinct_battery "
    "discipline). Also pinned against numpy's 'linear' interpolation in "
    "tests/test_stats.py.",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.median("o_totalprice"), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90"),
            F.round(F.percentile("o_totalprice", 0.99), 4).alias("p99"),
            F.approx_percentile("o_totalprice", 0.9, 10000).alias("_p90_approx"),
        )
        .withColumn(
            "approx_ok",
            (F.abs(F.col("_p90_approx") - F.col("p90")) <= 0.05 * F.col("p90")),
        )
        .drop("_p90_approx")
        .orderBy("o_orderpriority")
    )


@register(
    "agg_psi_drift",
    oracle="""
    WITH mm AS (
      SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
    ),
    spine AS (SELECT unnest(range(10)) AS bucket),
    r AS (
      SELECT CAST(greatest(least(floor((l_extendedprice - lo)
                 / ((hi - lo) / 10)), 9), 0) AS INT) AS bucket,
             count(*) AS nr
      FROM lineitem, mm WHERE l_shipdate < TIMESTAMP '1996-01-01'
      GROUP BY 1
    ),
    c AS (
      SELECT CAST(greatest(least(floor((l_extendedprice - lo)
                 / ((hi - lo) / 10)), 9), 0) AS INT) AS bucket,
             count(*) AS nc
      FROM lineitem, mm WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      GROUP BY 1
    ),
    j AS (
      SELECT spine.bucket,
             COALESCE(nr, 0) AS nr, COALESCE(nc, 0) AS nc
      FROM spine LEFT JOIN r USING (bucket) LEFT JOIN c USING (bucket)
    ),
    prop AS (
      SELECT bucket,
             greatest(nr / CAST(SUM(nr) OVER () AS DOUBLE), 1e-4) AS p,
             greatest(nc / CAST(SUM(nc) OVER () AS DOUBLE), 1e-4) AS q
      FROM j
    ),
    contribs AS (
      SELECT bucket, p, q, (p - q) * ln(p / q) AS contrib FROM prop
    )
    SELECT CAST(bucket AS VARCHAR) AS bucket,
           round(p, 9) AS p_ref, round(q, 9) AS p_cur,
           round(contrib, 9) AS contrib,
           round(SUM(contrib) OVER (), 9) AS psi
    FROM contribs
    ORDER BY bucket
    """,
    doc="Population Stability Index drift gate (operators/profiling.py::"
    "population_stability): pre-1996 lineitem prices as the reference "
    "distribution vs 1996+ as current — equal-width buckets from the "
    "reference's min/max (broadcast 1-row), per-side combining counts, "
    "spine-densified zero buckets floored at 1e-4, "
    "psi = sum (p-q)*ln(p/q). Every proportion is one IEEE division; "
    "ln contributions round(9) on both sides (the stats-battery "
    "discipline for libm terms).",
)
def agg_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import population_stability

    li = load(spark, sf_dir, "lineitem")
    cut = F.lit("1996-01-01").cast(T.TimestampType())
    out = population_stability(
        li.where(F.col("l_shipdate") < cut),
        li.where(F.col("l_shipdate") >= cut),
        "l_extendedprice",
    )
    return out.select(
        F.col("bucket").cast("string").alias("bucket"),
        F.round("p_ref", 9).alias("p_ref"),
        F.round("p_cur", 9).alias("p_cur"),
        F.round("contrib", 9).alias("contrib"),
        F.round("psi", 9).alias("psi"),
    ).orderBy("bucket")


@register(
    "agg_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT o.o_orderpriority, m.med,
             abs(o.o_totalprice - m.med) AS adev
      FROM orders o JOIN med m USING (o_orderpriority)
    ),
    mad AS (
      SELECT o_orderpriority, med, quantile_cont(adev, 0.5) AS mad
      FROM d GROUP BY o_orderpriority, med
    )
    SELECT d.o_orderpriority,
           round(mad.med, 4) AS median, round(mad.mad, 4) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3.0 * 1.4826 * mad.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(SUM(CASE WHEN d.adev > 3.0 * 1.4826 * mad.mad
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS outlier_frac
    FROM d JOIN mad USING (o_orderpriority)
    GROUP BY d.o_orderpriority, mad.med, mad.mad
    ORDER BY o_orderpriority
    """,
    doc="Robust outlier profile per order priority (operators/"
    "profiling.py::mad_outliers): median, MAD, and the count/fraction "
    "beyond z·1.4826·MAD — the 50%-breakdown alternative to mean±3σ "
    "where planted garbage cannot inflate the spread enough to hide "
    "itself.  Hash-checkable because both engines share the lerp "
    "percentile definition (identical median/MAD doubles), the "
    "threshold compares those identical doubles, and the only "
    "projections are round(4)/round(6) of exact inputs — the "
    "agg_percentiles discipline.",
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import mad_outliers

    o = load(spark, sf_dir, "orders")
    return mad_outliers(o, "o_totalprice", ["o_orderpriority"]).orderBy(
        "o_orderpriority"
    )


_NULL_AWARE_ANTI_SQL = """
SELECT 'clean' AS part, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS s
FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT 'poisoned' AS part, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS s
FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING'
                        UNION ALL SELECT CAST(NULL AS BIGINT))
"""


@register(
    "sql_null_aware_anti",
    oracle=_NULL_AWARE_ANTI_SQL,
    doc="NOT IN with a nullable subquery — the classic three-valued-"
    "logic footgun, pinned cross-engine through the spark.sql entry "
    "path.  part=clean: a NULL-free subquery plans as a plain LEFT "
    "ANTI join (orders outside the BUILDING segment, count + exact "
    "integer key sum).  part=poisoned: the same subquery with one NULL "
    "row must return ZERO rows (x NOT IN (...NULL...) is UNKNOWN for "
    "every non-matching x under ANSI three-valued logic — count 0, sum "
    "NULL), which Spark plans as a null-aware anti join (single-column "
    "NAAJ: a broadcast hash join with isNullAwareAntiJoin, not a "
    "nested loop; plan-pinned in tests/test_plan_shapes.py).  Both "
    "engines agree because the semantics are ANSI SQL, not engine "
    "choice — exactly why NOT EXISTS (which ignores subquery NULLs) "
    "is the recommended rewrite at 100 TB.",
)
def sql_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_NULL_AWARE_ANTI_SQL)
