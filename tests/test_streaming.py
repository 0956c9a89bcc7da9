"""Structured Streaming tests: every job runs with Trigger.AvailableNow
over the events parquet and is compared against its deterministic batch
dual — the standard way to pin streaming logic without wall-clock flake.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE

from imdb_top_250_etl_pipeline_spark.plans import QUERIES, lookup
from imdb_top_250_etl_pipeline_spark.sources import load
from imdb_top_250_etl_pipeline_spark.streaming import (
    dedup_stream,
    foreach_batch_upsert,
    read_events_stream,
    session_counts,
    stateful_user_counts,
    tumbling_counts,
)


def _run_to_memory(writer_df, spark, name: str, mode: str):
    q = (
        writer_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _watermark_cutoff(spark, hours: int = 1):
    from datetime import timedelta

    max_ts = load(spark, SF_SMOKE, "events").agg(F.max("ts")).first()[0]
    return max_ts - timedelta(hours=hours)


def test_tumbling_counts_match_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    got = {
        r.w_start: r.n_events
        for r in _run_to_memory(
            tumbling_counts(stream), spark, "t_tumbling", "append"
        ).collect()
    }
    # append mode only emits windows the final watermark (max_ts - 1h)
    # has closed; the trailing open window is correctly withheld
    cutoff = _watermark_cutoff(spark)
    expected = {
        r.w_start: r.n_events
        for r in lookup("stream_tumbling_window").fn(spark, SF_SMOKE).collect()
        if r.w_end <= cutoff
    }
    assert got == expected


def test_session_counts_match_builtin_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in _run_to_memory(
            session_counts(stream), spark, "t_sessions", "append"
        ).collect()
    }
    cutoff = _watermark_cutoff(spark)
    expected = {
        (r.user_id, r.session_start): r.n_events
        for r in lookup("stream_session_window").fn(spark, SF_SMOKE).collect()
        if r.session_end <= cutoff
    }
    assert got == expected


def test_builtin_session_window_matches_manual_sessionize(spark):
    built_in = lookup("stream_session_window").fn(spark, SF_SMOKE).collect()
    manual = lookup("stream_sessionize").fn(spark, SF_SMOKE).collect()
    bi = {(r.user_id, r.session_start, r.n_events) for r in built_in}
    mn = {(r.user_id, r.session_start, r.n_events) for r in manual}
    assert bi == mn


def test_dedup_stream_removes_nothing_on_unique_ids(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    got = _run_to_memory(dedup_stream(stream), spark, "t_dedup", "append")
    assert got.count() == load(spark, SF_SMOKE, "events").count()


def test_stateful_user_counts_match_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    got = _run_to_memory(
        stateful_user_counts(stream), spark, "t_stateful", "update"
    )
    # update mode re-emits per microbatch; the LAST emission per user is
    # the running total — with availableNow there may be several batches
    final = {
        r.user_id: r.n_events
        for r in got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    }
    expected = {
        r.user_id: r.n
        for r in load(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert final == expected


def test_foreach_batch_upsert_is_idempotent(spark, tmp_path):
    target = str(tmp_path / "target")
    for i in range(2):  # second run re-delivers everything: upsert absorbs it
        stream = read_events_stream(spark, SF_SMOKE)
        q = foreach_batch_upsert(
            stream, target, str(tmp_path / f"ckpt{i}")
        ).start()
        q.awaitTermination(120)
    result = spark.read.parquet(target)
    events = load(spark, SF_SMOKE, "events")
    assert result.count() == events.count()
    # spot-check: values match the source after double delivery
    lhs = result.select("event_id", "user_id", "value")
    rhs = events.select("event_id", "user_id", "value")
    assert lhs.exceptAll(rhs).count() == 0 and rhs.exceptAll(lhs).count() == 0


def test_foreach_batch_upsert_rewrites_only_touched_bands(spark, tmp_path):
    import hashlib
    import pathlib

    target = str(tmp_path / "target")
    full = read_events_stream(spark, SF_SMOKE)
    q = foreach_batch_upsert(full, target, str(tmp_path / "ckpt_full")).start()
    q.awaitTermination(120)

    def band_files(band: int) -> dict[str, str]:
        d = pathlib.Path(target) / f"key_band={band}"
        return {
            p.name: hashlib.md5(p.read_bytes()).hexdigest()
            for p in d.glob("*.parquet")
        }

    before = {b: band_files(b) for b in range(16)}
    # second batch touches ONLY band 3 (event_id % 16 == 3)
    partial = read_events_stream(spark, SF_SMOKE).where(
        F.col("event_id") % 16 == 3
    )
    q = foreach_batch_upsert(partial, target, str(tmp_path / "ckpt_part")).start()
    q.awaitTermination(120)
    after = {b: band_files(b) for b in range(16)}

    for b in range(16):
        if b == 3:
            continue
        assert after[b] == before[b], f"band {b} files changed"
    # band 3 was rewritten and the table still matches the source
    result = spark.read.parquet(target)
    events = load(spark, SF_SMOKE, "events")
    assert result.count() == events.count()
    lhs = result.select("event_id", "user_id", "value")
    rhs = events.select("event_id", "user_id", "value")
    assert lhs.exceptAll(rhs).count() == 0 and rhs.exceptAll(lhs).count() == 0


def test_enrich_stream_matches_batch_join(spark):
    from imdb_top_250_etl_pipeline_spark.streaming import enrich_stream

    dim = (
        load(spark, SF_SMOKE, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    stream = read_events_stream(spark, SF_SMOKE)
    got = _run_to_memory(
        enrich_stream(stream, dim, "user_id").select(
            "event_id", "user_id", "c_mktsegment"
        ),
        spark,
        "t_enrich",
        "append",
    )
    expected = (
        load(spark, SF_SMOKE, "events")
        .select("event_id", "user_id")
        .join(dim, "user_id", "left")
        .select("event_id", "user_id", "c_mktsegment")
    )
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_stream_stream_join_matches_batch_dual(spark):
    from imdb_top_250_etl_pipeline_spark.streaming import join_event_streams

    clicks = read_events_stream(spark, SF_SMOKE).where(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, SF_SMOKE).where(
        F.col("event_type") == "purchase"
    )
    got = _run_to_memory(
        join_event_streams(purchases, clicks), spark, "t_ss_join", "append"
    )

    e = load(spark, SF_SMOKE, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_event_id")
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    expected = p.join(
        c,
        (p.user_id == c.r_user)
        & (c.r_ts > p.l_ts - F.expr("INTERVAL 1 HOUR"))
        & (c.r_ts <= p.l_ts),
    ).select("user_id", "l_ts", "l_event_id", "r_ts", "r_event_id")
    assert got.count() == expected.count() and expected.count() > 0
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_interval_join_boundaries_and_multiplicity(spark):
    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        interval_join,
    )

    # numeric domain: points 0..99, intervals chosen to exercise
    # inclusive boundaries, bucket straddling, containment, inversion
    pts = spark.range(0, 100).select(F.col("id").alias("p"))
    ivs = spark.createDataFrame(
        [
            (1, 10, 20),    # normal: 11 points inclusive
            (2, 15, 15),    # degenerate single point
            (3, 95, 200),   # extends past the point domain
            (4, 8, 32),     # spans multiple width-10 buckets
            (5, 50, 40),    # inverted -> matches nothing
        ],
        "iv_id long, s long, e long",
    )
    got = interval_join(pts, ivs, "p", "s", "e", bucket_width=10).collect()
    pairs = [(r.iv_id, r.p) for r in got]
    assert len(pairs) == len(set(pairs))  # exactly-once per pair
    from collections import Counter

    by_iv = Counter(iv for iv, _ in pairs)
    assert by_iv == {1: 11, 2: 1, 3: 5, 4: 25}
    assert (4, 8) in pairs and (4, 32) in pairs  # inclusive both ends
    assert all(iv != 5 for iv, _ in pairs)

    # overlapping column names must be rejected, not silently aliased
    import pytest as _pytest

    with _pytest.raises(ValueError):
        interval_join(
            pts, ivs.withColumnRenamed("iv_id", "p"), "p", "s", "e", 10
        )


def test_tws_user_stats_matches_batch_and_v1(spark):
    # transformWithStateInPandas speaks protobuf to its state server;
    # the package isn't in this image (and installs are forbidden), so
    # this runtime check activates wherever PySpark's declared deps are
    # actually installed — the operator itself is import-clean either way
    pytest.importorskip("google.protobuf")
    from imdb_top_250_etl_pipeline_spark.streaming import tws_user_stats

    stream = read_events_stream(spark, SF_SMOKE)
    got = _run_to_memory(tws_user_stats(stream), spark, "t_tws", "update")
    # update mode re-emits per microbatch; last (max) emission per user
    # is the final running state
    final = {
        r.user_id: (r.n_events, r.value_sum)
        for r in got.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("value_sum").alias("value_sum"),
        )
        .collect()
    }
    expected = {
        r.user_id: (r.n, r.s)
        for r in load(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(expected)
    for uid, (n, s) in expected.items():
        assert final[uid][0] == n, uid
        # per-batch pandas partial sums reassociate the fp additions
        assert final[uid][1] == pytest.approx(s, rel=1e-9), uid


def test_dedup_stream_ttl_drops_within_watermark_duplicates(spark):
    import shutil
    import tempfile

    from imdb_top_250_etl_pipeline_spark.streaming import dedup_stream_ttl

    ev = (
        load(spark, SF_SMOKE, "events")
        .select("event_id", "ts", "user_id", "value")
        .limit(500)
    )
    work = tempfile.mkdtemp(prefix="ttl_dedup_")
    try:
        # one delivery plus an immediate redelivery of every 3rd event —
        # duplicates land inside the watermark horizon, so all must drop
        ev.unionByName(ev.where(F.col("event_id") % 3 == 0)).coalesce(
            1
        ).write.parquet(work + "/src")
        stream = spark.readStream.schema(ev.schema).parquet(work + "/src")
        got = _run_to_memory(
            dedup_stream_ttl(stream), spark, "t_ttl_dedup", "append"
        )
        assert got.count() == 500
        assert got.select("event_id").distinct().count() == 500
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_stream_stream_left_outer_join_emits_on_watermark_expiry(
    spark, tmp_path
):
    """leftOuter stream-stream join semantics, pinned on a hand fixture:
    matched rows pair immediately; an unmatched left row null-extends
    ONLY once the watermark (2h) passes its match horizon; an unmatched
    left row still inside the horizon at stream end stays withheld —
    the append-mode contract restated for outer joins."""
    import datetime as dt

    from imdb_top_250_etl_pipeline_spark.streaming import (
        join_event_streams,
        read_events_stream,
    )

    U = dt.datetime
    rows = [
        # (event_id, ts, user_id, event_type)
        (1, U(2024, 1, 1, 9, 30), 1, "click"),      # matches purchase 2
        (2, U(2024, 1, 1, 10, 0), 1, "purchase"),
        (3, U(2024, 1, 1, 10, 0), 2, "purchase"),   # no click -> null-extend
        (4, U(2024, 1, 1, 19, 30), 3, "purchase"),  # inside horizon: withheld
        (5, U(2024, 1, 1, 20, 0), 99, "click"),     # watermark pushers,
        (6, U(2024, 1, 1, 20, 0), 99, "purchase"),  # matching each other
    ]
    df = spark.createDataFrame(
        [(e, t, u, k, 1.0, "{}") for (e, t, u, k) in rows],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    fix = str(tmp_path / "fixture")
    df.coalesce(1).write.parquet(str(tmp_path / "raw"))
    # the file-source helper expects <dir>/events.parquet
    import glob
    import os
    import shutil

    os.makedirs(fix)
    shutil.copy(
        glob.glob(str(tmp_path / "raw" / "part-*.parquet"))[0],
        os.path.join(fix, "events.parquet"),
    )

    clicks = read_events_stream(spark, fix).where(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, fix).where(
        F.col("event_type") == "purchase"
    )
    got = _run_to_memory(
        join_event_streams(purchases, clicks, how="leftOuter"),
        spark,
        "t_ss_left_outer",
        "append",
    ).collect()

    by_left = {r["l_event_id"]: r for r in got}
    # matched pairs present with their right side
    assert by_left[2]["r_event_id"] == 1
    assert by_left[6]["r_event_id"] == 5
    # the watermark (20:00 - 2h = 18:00) passed purchase 3's horizon ->
    # exactly one null-extended row
    assert by_left[3]["r_event_id"] is None and by_left[3]["r_ts"] is None
    assert sum(1 for r in got if r["l_event_id"] == 3) == 1
    # purchase 4 (19:30) is still inside the horizon: withheld, not
    # prematurely null-extended
    assert 4 not in by_left
    assert len(got) == 3


def test_stream_stream_full_outer_join_emits_both_sides(spark, tmp_path):
    """fullOuter stream-stream join: unmatched rows on EITHER side
    null-extend once the watermark passes their match horizon; the
    output key coalesces across sides (a right-only row has no left
    key); in-horizon rows stay withheld at stream end."""
    import datetime as dt

    from imdb_top_250_etl_pipeline_spark.streaming import (
        join_event_streams,
        read_events_stream,
    )

    U = dt.datetime
    rows = [
        # (event_id, ts, user_id, event_type); left=purchases,
        # right=clicks (the left-outer test's orientation)
        (1, U(2024, 1, 1, 9, 30), 1, "click"),      # matches purchase 2
        (2, U(2024, 1, 1, 10, 0), 1, "purchase"),
        (3, U(2024, 1, 1, 10, 0), 2, "purchase"),   # no click -> left-extend
        (4, U(2024, 1, 1, 10, 0), 5, "click"),      # no purchase -> right-extend
        (5, U(2024, 1, 1, 20, 0), 99, "click"),     # watermark pushers,
        (6, U(2024, 1, 1, 20, 0), 99, "purchase"),  # matching each other
    ]
    df = spark.createDataFrame(
        [(e, t, u, k, 1.0, "{}") for (e, t, u, k) in rows],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    fix = str(tmp_path / "fixture")
    df.coalesce(1).write.parquet(str(tmp_path / "raw"))
    import glob
    import os
    import shutil

    os.makedirs(fix)
    shutil.copy(
        glob.glob(str(tmp_path / "raw" / "part-*.parquet"))[0],
        os.path.join(fix, "events.parquet"),
    )

    clicks = read_events_stream(spark, fix).where(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, fix).where(
        F.col("event_type") == "purchase"
    )
    got = _run_to_memory(
        join_event_streams(purchases, clicks, how="fullOuter"),
        spark,
        "t_ss_full_outer",
        "append",
    ).collect()

    matched = {
        r["l_event_id"]: r for r in got if r["l_event_id"] is not None
    }
    # matched pairs present with their right side
    assert matched[2]["r_event_id"] == 1
    assert matched[6]["r_event_id"] == 5
    # purchase 3: no click -> null-extended exactly once
    assert matched[3]["r_event_id"] is None and matched[3]["r_ts"] is None
    # click 4: no purchase -> RIGHT-side null-extension, key coalesced
    # from the right side
    right_only = [r for r in got if r["l_event_id"] is None]
    assert len(right_only) == 1
    assert right_only[0]["r_event_id"] == 4
    assert right_only[0]["user_id"] == 5
    assert len(got) == 4


def test_trending_topk_streaming_composition(spark):
    """The trending report's streaming form end-to-end: the watermarked
    windowed COUNT runs under availableNow (append mode — only closed
    windows emit), then the per-window rank runs as the batch post-pass
    over the emitted windows.  The result must equal trending_topk's
    batch dual restricted to the windows the watermark closed."""
    from pyspark.sql.window import Window as W

    from imdb_top_250_etl_pipeline_spark.operators.analytics import (
        trending_topk,
    )

    stream = read_events_stream(spark, SF_SMOKE)
    per = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "user_id",
            "n_events",
        )
    )
    emitted = _run_to_memory(per, spark, "t_trend_counts", "append")
    wr = W.partitionBy("w_start").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    got = {
        (r["w_start"], r["rank"]): (r["user_id"], r["n_events"])
        for r in emitted.withColumn(
            "rank", F.row_number().over(wr).cast("int")
        )
        .where(F.col("rank") <= 3)
        .collect()
    }
    closed = {w for (w, _r) in got}
    assert closed, "no closed windows emitted"
    batch = load(spark, SF_SMOKE, "events").select("ts", "user_id")
    want = {
        (r["w_start"], r["rank"]): (r["user_id"], r["n_events"])
        for r in trending_topk(batch, "ts", "user_id", "6 hours", k=3)
        .collect()
        if r["w_start"] in closed
    }
    assert got == want


def test_cusum_stream_matches_batch_dual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        cusum_changepoints,
    )
    from imdb_top_250_etl_pipeline_spark.streaming import cusum_stream

    stream = read_events_stream(spark, SF_SMOKE)
    got = {
        (r.user_id, r.event_id): (
            r.cusum_pos, r.cusum_neg, r.alarm_pos, r.alarm_neg,
        )
        for r in _run_to_memory(
            cusum_stream(stream), spark, "t_cusum", "update"
        ).collect()
    }
    ev = load(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    expected = {
        (r.user_id, r.event_id): (
            r.cusum_pos, r.cusum_neg, r.alarm_pos, r.alarm_neg,
        )
        for r in cusum_changepoints(
            ev, "user_id", ["ts", "event_id"], "value",
            target=25.0, slack=5.0, threshold=100.0, scale=1000,
        ).collect()
    }
    assert got == expected


def test_cusum_stream_state_carries_across_batches(spark, tmp_path):
    # two availableNow deliveries through ONE checkpoint: the second
    # batch must fold on top of the first batch's carry, exactly as if
    # the rows had arrived in one batch
    import datetime as dt

    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        cusum_changepoints,
    )
    from imdb_top_250_etl_pipeline_spark.streaming import cusum_stream

    t0 = dt.datetime(2024, 1, 1)
    vals = [40.0, 41.0, 39.0, 42.0, 40.5, 41.5]  # steady above target+slack
    rows = [
        (1000 + i, t0 + dt.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    for lo, hi in ((0, 3), (3, 6)):  # two deliveries in event order
        spark.createDataFrame(rows[lo:hi], schema).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = (
            cusum_stream(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    sink_rows = {
        r.event_id: (r.cusum_pos, r.cusum_neg)
        for r in spark.read.parquet(out).collect()
    }
    ev = spark.createDataFrame(rows, schema).select(
        "user_id", "ts", "event_id", "value"
    )
    expected = {
        r.event_id: (r.cusum_pos, r.cusum_neg)
        for r in cusum_changepoints(
            ev, "user_id", ["ts", "event_id"], "value",
            target=25.0, slack=5.0, threshold=100.0, scale=1000,
        ).collect()
    }
    assert sink_rows == expected
    # the persistent drift accumulates across the batch boundary
    assert sink_rows[1005][0] > sink_rows[1002][0] > 0


def test_stream_near_dup_ingest_exactly_once_across_restarts(
    spark, tmp_path
):
    """Round 13: streaming incremental near-dup — planted cross-batch
    exact duplicates are found with jaccard 1.0 exactly once, and a
    FULL replay against a fresh checkpoint (every microbatch
    re-delivered) leaves the dups table byte-for-byte unchanged (the
    app_txn idempotent-append contract composed with the probe)."""
    from imdb_top_250_etl_pipeline_spark.sources.txn import txn_read
    from imdb_top_250_etl_pipeline_spark.streaming.jobs import (
        stream_near_dup_ingest,
    )

    src = str(tmp_path / "src")
    texts = [
        (i, f"alpha beta gamma delta {i} epsilon zeta eta")
        for i in range(30)
    ]
    b0 = spark.createDataFrame(texts[:10], "doc_id long, text string")
    b1 = spark.createDataFrame(texts[10:20], "doc_id long, text string")
    # batch 2 plants exact twins of docs 3 and 7 (batch 0) and 15
    # (batch 1) at ids 103/107/115
    twins = [(100 + i, texts[i][1]) for i in (3, 7, 15)]
    b2 = spark.createDataFrame(
        texts[20:] + twins, "doc_id long, text string"
    )
    for i, b in enumerate((b0, b1, b2)):
        b.coalesce(1).write.mode("append").parquet(src)
        # one file per delivery: maxFilesPerTrigger=1 below replays
        # them as three distinct microbatches in order

    def run(ckpt: str, index_dir: str):
        stream = (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_near_dup_ingest(
                stream, index_dir, ckpt, app_id="tnd",
                index_duplicates=True,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    index_dir = str(tmp_path / "index")
    run(str(tmp_path / "ckpt1"), index_dir)
    dups = txn_read(spark, index_dir + "/dups")
    found = {
        (r.new_id, r.existing_id, r.jaccard, r.batch_id)
        for r in dups.collect()
    }
    # exactly the planted pairs, jaccard 1.0, in batch 2
    assert found == {
        (103, 3, 1.0, 2), (107, 7, 1.0, 2), (115, 15, 1.0, 2)
    }, found
    # full replay with a FRESH checkpoint: every batch re-delivered,
    # every append must be an app_txn no-op
    run(str(tmp_path / "ckpt2"), index_dir)
    dups2 = txn_read(spark, index_dir + "/dups")
    assert dups2.count() == 3
    assert {
        (r.new_id, r.existing_id, r.jaccard, r.batch_id)
        for r in dups2.collect()
    } == found
    # the index accumulated every doc exactly once (report-only mode)
    sh = txn_read(spark, index_dir + "/shingles")
    assert sh.count() == 33 and sh.select("doc_id").distinct().count() == 33


def test_stream_near_dup_ingest_drop_mode_excludes_duplicates(
    spark, tmp_path
):
    """Drop mode: flagged duplicates stay OUT of the accumulated index,
    so a third copy matches only the earliest surviving copy."""
    from imdb_top_250_etl_pipeline_spark.sources.txn import txn_read
    from imdb_top_250_etl_pipeline_spark.streaming.jobs import (
        stream_near_dup_ingest,
    )

    src = str(tmp_path / "src")
    base = "one two three four five six seven"
    b0 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    b1 = spark.createDataFrame([(2, base)], "doc_id long, text string")
    b2 = spark.createDataFrame([(3, base)], "doc_id long, text string")
    for b in (b0, b1, b2):
        b.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    index_dir = str(tmp_path / "index")
    q = (
        stream_near_dup_ingest(
            stream, index_dir, str(tmp_path / "ckpt"), app_id="tdm"
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pairs = {
        (r.new_id, r.existing_id)
        for r in txn_read(spark, index_dir + "/dups").collect()
    }
    # doc 2 matched 1; doc 2 never entered the index, so doc 3 matches
    # ONLY doc 1 — drop mode resolves chains to the earliest copy
    assert pairs == {(2, 1), (3, 1)}, pairs
    sh = txn_read(spark, index_dir + "/shingles")
    assert {r.doc_id for r in sh.collect()} == {1}
