"""Unit pins for the round-7 operator batch: segment dedup (line form),
bigram KN statistics, linear quality scoring, transition matrix, and
table diff — hand-computed/numpy duals plus the plan properties that
matter at scale."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from imdb_top_250_etl_pipeline_spark.operators.analytics import (
    transition_counts,
)
from imdb_top_250_etl_pipeline_spark.operators.etl import table_diff
from imdb_top_250_etl_pipeline_spark.operators.text import (
    drop_frequent_segments,
    linear_text_score,
    ngram_lm_counts,
)


# ---------------------------------------------------------------------------
# drop_frequent_segments — the NEWLINE form the driver fixture can't cover
# ---------------------------------------------------------------------------


def test_segment_dedup_line_form(spark):
    docs = spark.createDataFrame(
        [
            (1, "keep me\nCOOKIE BANNER\nunique line one"),
            (2, "COOKIE BANNER\nunique line two"),
            (3, "COOKIE BANNER\nunique line three\nkeep me"),
            (4, "all boilerplate\nCOOKIE BANNER"),
            (5, "all boilerplate\nCOOKIE BANNER"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for r in drop_frequent_segments(
            docs, "doc_id", "text", delim="\n", max_doc_frac=0.5
        ).collect()
    }
    # COOKIE BANNER in 5/5 docs, 'all boilerplate' in 2/5, 'keep me' 2/5
    assert out[1] == ("keep me\nunique line one", 2)
    assert out[2] == ("unique line two", 1)
    # order of survivors is the ORIGINAL order, not sorted text
    assert out[3] == ("unique line three\nkeep me", 2)
    assert out[4] == ("all boilerplate", 1)
    assert len(out) == 5


def test_segment_dedup_fully_boilerplate_doc_survives_empty(spark):
    docs = spark.createDataFrame(
        [(1, "x\nx2"), (2, "x"), (3, "x")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for r in drop_frequent_segments(
            docs, "doc_id", "text", delim="\n", max_doc_frac=0.5
        ).collect()
    }
    assert out[2] == ("", 0) and out[3] == ("", 0)
    assert out[1] == ("x2", 1)


# ---------------------------------------------------------------------------
# ngram_lm_counts — hand-computed KN on a tiny corpus
# ---------------------------------------------------------------------------


def test_bigram_lm_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    rows = {
        (r["w1"], r["w2"]): r
        for r in ngram_lm_counts(docs, "doc_id", "text").collect()
    }
    # bigrams: doc1 -> (a,b),(b,a),(a,b); doc2 -> (a,b),(b,c)
    assert rows[("a", "b")]["c"] == 3
    assert rows[("b", "a")]["c"] == 1
    assert rows[("b", "c")]["c"] == 1
    ab = rows[("a", "b")]
    assert ab["c_w1"] == 3 and ab["r_w1"] == 1  # 'a' only continues to b
    assert ab["cont"] == 1  # 'b' has one distinct left context
    nb = 3  # distinct bigram types
    expect = max(3 - 0.75, 0.0) / 3 + (0.75 * 1 / 3) * (1 / nb)
    assert abs(ab["p_kn"] - round(expect, 9)) < 1e-12
    ba = rows[("b", "a")]
    # b: c_w1 = 2 (b->a, b->c), r_w1 = 2; 'a' continuation contexts = 1
    expect_ba = max(1 - 0.75, 0.0) / 2 + (0.75 * 2 / 2) * (1 / nb)
    assert abs(ba["p_kn"] - round(expect_ba, 9)) < 1e-12


def test_bigram_lm_marginals_join_shuffle_hash(spark):
    from tests.test_plan_shapes import plan_of

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "b c d")], "doc_id long, text string"
    )
    plan = plan_of(ngram_lm_counts(docs, "doc_id", "text"))
    # vocabulary-sized marginal joins must not broadcast; only the
    # single-row bigram-type total may
    assert plan.count("ShuffledHashJoin") >= 2


# ---------------------------------------------------------------------------
# linear_text_score — exactness + sigmoid
# ---------------------------------------------------------------------------


def test_linear_score_matches_math(spark):
    docs = spark.createDataFrame(
        [(1, "good good bad"), (2, "meh"), (3, "bad bad")],
        "doc_id long, text string",
    )
    w = [("good", 0.25), ("bad", -0.5)]
    out = {
        r["doc_id"]: r
        for r in linear_text_score(
            docs, "doc_id", "text", w, bias=0.125
        ).collect()
    }
    for did, z in {1: 0.125 + 0.5 - 0.5, 2: 0.125, 3: 0.125 - 1.0}.items():
        assert abs(out[did]["score"] - round(1 / (1 + math.exp(-z)), 9)) < 1e-12
        assert out[did]["keep"] == (z >= 0)


def test_linear_score_weight_join_broadcasts(spark):
    from tests.test_plan_shapes import plan_of

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = plan_of(
        linear_text_score(docs, "doc_id", "text", [("a", 0.25)])
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# transition_counts — pandas dual + probability closure
# ---------------------------------------------------------------------------


def test_transition_counts_tiny_timeline(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, "view"),
            (1, 2, "click"),
            (1, 3, "view"),
            (2, 1, "view"),
            (2, 2, "click"),
            (3, 1, "buy"),
        ],
        "user long, seq long, et string",
    )
    rows = {
        (r["src"], r["dst"]): r
        for r in transition_counts(ev, "user", ["seq"], "et").collect()
    }
    assert rows[("view", "click")]["n"] == 2
    assert rows[("click", "view")]["n"] == 1
    # single-event user contributes no transition
    assert ("buy", "view") not in rows and len(rows) == 2
    assert rows[("view", "click")]["p"] == 1.0
    assert rows[("click", "view")]["p"] == 1.0


def test_transition_probabilities_sum_to_one_per_src(spark):
    from tests.conftest import SF_CORRECT

    from imdb_top_250_etl_pipeline_spark.sources import load

    ev = load(spark, SF_CORRECT, "events")
    t = transition_counts(ev, "user_id", ["ts", "event_id"], "event_type")
    sums = (
        t.groupBy("src").agg(F.sum("p").alias("sp")).collect()
    )
    for r in sums:
        assert abs(r["sp"] - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# table_diff — all four statuses + null-safety + empty diff
# ---------------------------------------------------------------------------


def test_table_diff_statuses_and_null_safety(spark):
    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", 2.0), (3, "c", 3.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", None), (2, "B", 2.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r for r in table_diff(old, new, ["k"]).collect()}
    # key 1: NULL == NULL null-safely -> unchanged -> absent
    assert 1 not in out
    assert out[2]["status"] == "changed" and out[2]["n_changed"] == 1
    assert out[3]["status"] == "removed" and out[3]["n_changed"] is None
    assert out[4]["status"] == "added" and out[4]["n_changed"] is None


def test_table_diff_identical_tables_empty(spark):
    t = spark.createDataFrame(
        [(1, "a"), (2, None)], "k long, s string"
    )
    assert table_diff(t, t, ["k"]).count() == 0


def test_table_diff_compare_cols_subset(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double")
    new = spark.createDataFrame([(1, "a", 9.0)], "k long, s string, v double")
    # v excluded from comparison -> no diff
    assert table_diff(old, new, ["k"], compare_cols=["s"]).count() == 0
    assert table_diff(old, new, ["k"]).count() == 1


# ---------------------------------------------------------------------------
# Python DataSource API — pushdown contract + split parallelism
# ---------------------------------------------------------------------------


def test_pysource_pushfilters_retains_equality_yields_rest(spark):
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from imdb_top_250_etl_pipeline_spark.sources.pysource import (
        PyArrowParquetReader,
    )

    r = PyArrowParquetReader({"path": "/dev/null"})
    eq = EqualTo(("source",), "src3")
    gt = GreaterThan(("n_chars",), 10)
    remaining = list(r.pushFilters([eq, gt]))
    # equality consumed by the source; the range predicate handed back
    # to Spark BY REFERENCE (the API contract)
    assert r.pushed == [eq]
    assert remaining == [gt]


def test_pysource_row_group_splits_and_roundtrip(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from imdb_top_250_etl_pipeline_spark.sources.pysource import (
        register_python_source,
    )

    path = str(tmp_path / "multi_rg.parquet")
    tbl = pa.table(
        {"k": list(range(1000)), "tag": ["a", "b"] * 500}
    )
    pq.write_table(tbl, path, row_group_size=250)  # 4 row groups
    register_python_source(spark)
    df = spark.read.format("pyarrow_parquet").option("path", path).load()
    # one input split per row group
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    filtered = df.where(F.col("tag") == "a")
    assert filtered.count() == 500
    # the pushed equality no longer appears in the post-scan Filter
    from tests.test_plan_shapes import plan_of

    plan = plan_of(filtered, "extended")
    physical = plan.split("== Physical Plan ==")[1]
    assert "= a" not in physical.split("BatchScan")[0]


# ---------------------------------------------------------------------------
# session_paths — ordering, cap, and frequency semantics
# ---------------------------------------------------------------------------


def test_session_paths_order_and_cap(spark):
    from imdb_top_250_etl_pipeline_spark.operators.analytics import (
        session_paths,
    )

    ev = spark.createDataFrame(
        [
            (1, 3, "purchase"),
            (1, 1, "view"),
            (1, 2, "click"),
            (2, 1, "view"),
            (2, 2, "click"),
            (2, 3, "purchase"),
            (3, 1, "view"),
        ],
        "user long, seq long, et string",
    )
    out = {
        r["path"]: r["n_keys"]
        for r in session_paths(ev, "user", ["seq"], "et").collect()
    }
    # order comes from seq, not insertion: users 1 and 2 share a path
    assert out == {"view>click>purchase": 2, "view": 1}
    capped = {
        r["path"]: r["n_keys"]
        for r in session_paths(
            ev, "user", ["seq"], "et", max_len=2
        ).collect()
    }
    assert capped == {"view>click": 2, "view": 1}


# ---------------------------------------------------------------------------
# time-RANGE window frame — hand-computed trailing window with ties
# ---------------------------------------------------------------------------


def test_time_range_frame_hand_computed(spark):
    from pyspark.sql.window import Window as SW

    # trailing-10 range frame on a hand-sized axis, including a TIE at
    # t=30 (range peers must both see each other)
    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 9, 5.0), (1, 20, 2.0), (1, 30, 7.0),
         (1, 30, 3.0), (2, 100, 9.0)],
        "k long, t long, v double",
    )
    w = SW.partitionBy("k").orderBy("t").rangeBetween(-10, SW.currentRow)
    out = [
        (r["k"], r["t"], r["n"], r["vmax"])
        for r in df.select(
            "k",
            "t",
            F.count("*").over(w).alias("n"),
            F.max("v").over(w).alias("vmax"),
        )
        .orderBy("k", "t", "n")
        .collect()
    ]
    # t=0:[0]; t=9:[0,9]; t=20:[20] (10 exits: 20-10=10 > 9); t=30 peers
    # both count [20,30,30]
    assert out == [
        (1, 0, 1, 1.0),
        (1, 9, 2, 5.0),
        (1, 20, 1, 2.0),
        (1, 30, 3, 7.0),
        (1, 30, 3, 7.0),
        (2, 100, 1, 9.0),
    ]


# ---------------------------------------------------------------------------
# Python DataSource write side — two-phase commit protocol
# ---------------------------------------------------------------------------


def test_pysource_writer_two_phase_commit(spark, tmp_path):
    import json
    import os

    from imdb_top_250_etl_pipeline_spark.sources.pysource import (
        register_python_source,
    )

    register_python_source(spark)
    out = str(tmp_path / "w")
    df = spark.range(100).selectExpr("id", "id % 7 AS g")
    df.repartition(3).write.format("pyarrow_parquet").option(
        "path", out
    ).mode("append").save()
    files = sorted(os.listdir(out))
    parts = [f for f in files if f.endswith(".parquet")]
    # staged files were PUBLISHED (no _staging left behind) + manifest
    assert "_staging" not in files
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["files"] == sorted(parts)
    assert manifest["rows"] == 100
    # the published files are plain parquet the native reader round-trips
    assert spark.read.parquet(out).count() == 100

    # overwrite replaces prior files and the manifest reflects only them
    spark.range(10).selectExpr("id", "id AS g").repartition(1).write.format(
        "pyarrow_parquet"
    ).option("path", out).mode("overwrite").save()
    manifest2 = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest2["rows"] == 10
    assert spark.read.parquet(out).count() == 10


# ---------------------------------------------------------------------------
# Python DataSource streaming — offset replayability + full drain
# ---------------------------------------------------------------------------


def test_pysource_stream_replay_is_deterministic():
    from imdb_top_250_etl_pipeline_spark.sources.pysource import (
        PyArrowStreamReader,
    )

    r = PyArrowStreamReader(
        {"path": "/root/testdata/sf0.001/documents.parquet", "batchRows": "50"}
    )
    assert r.initialOffset() == {"row": 0}
    rows, nxt = r.read({"row": 0})
    assert nxt == {"row": 50} and len(list(rows)) == 50
    a = list(r.readBetweenOffsets({"row": 100}, {"row": 150}))
    b = list(r.readBetweenOffsets({"row": 100}, {"row": 150}))
    assert a == b and len(a) == 50
    # reading past EOF neither fails nor regresses the offset
    total = r._total()
    rows, nxt = r.read({"row": total})
    assert list(rows) == [] and nxt == {"row": total}


def test_pysource_stream_drains_source(spark, tmp_path):
    import time

    from imdb_top_250_etl_pipeline_spark.sources.pysource import (
        register_python_source,
    )

    register_python_source(spark)
    src = "/root/testdata/sf0.001/documents.parquet"
    q = (
        spark.readStream.format("pyarrow_parquet")
        .option("path", src)
        .option("batchRows", "123")
        .load()
    )
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    sq = (
        q.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", chk)
        .trigger(processingTime="1 seconds")
        .start()
    )
    exp = spark.read.parquet(src).count()
    got, deadline = 0, time.time() + 120
    try:
        while time.time() < deadline:
            try:
                got = spark.read.parquet(sink).count()
            except Exception:
                got = 0
            if got >= exp:
                break
            time.sleep(2)
    finally:
        sq.stop()
    assert got == exp
    # exactly-once: no duplicated rows across micro-batches
    assert (
        spark.read.parquet(sink).select("doc_id").distinct().count() == exp
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — sketch guarantees on adversarial inputs
# ---------------------------------------------------------------------------


def test_heavy_hitters_guarantees(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        heavy_hitters,
    )

    # 1000 rows: 'A' 400, 'B' 200, tail of 400 singletons
    rows = (
        [("A",)] * 400 + [("B",)] * 200 + [(f"t{i}",) for i in range(400)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(4)
    out = {r["item"]: r["est"] for r in heavy_hitters(df, "item", k=8).collect()}
    n = 1000
    # every item above n/k = 125 must be present with a valid lower bound
    for item, exact in (("A", 400), ("B", 200)):
        assert item in out
        assert exact - n / 8 <= out[item] <= exact
    # summary size is bounded: <= (k-1) * n_partitions before the merge,
    # and estimates never exceed true counts
    exact_counts = {"A": 400, "B": 200}
    for item, est in out.items():
        assert est <= exact_counts.get(item, 1)


def test_heavy_hitters_exact_when_domain_fits(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        heavy_hitters,
    )

    rows = [("x",)] * 5 + [("y",)] * 3
    df = spark.createDataFrame(rows, "item string").coalesce(1)
    out = {r["item"]: r["est"] for r in heavy_hitters(df, "item", k=8).collect()}
    # fewer distinct items than counters -> MG degrades to exact counts
    assert out == {"x": 5, "y": 3}


# ---------------------------------------------------------------------------
# UDTF + Variant — API-surface pins
# ---------------------------------------------------------------------------


def test_udtf_offsets_with_multichar_delim(spark):
    from imdb_top_250_etl_pipeline_spark.operators.udfs import (
        register_token_spans,
    )

    register_token_spans(spark)
    spark.sql("SELECT 'aa--b--ccc' AS t").createOrReplaceTempView(
        "_udtf_t"
    )
    out = [
        (r["pos"], r["span"], r["char_start"])
        for r in spark.sql(
            "SELECT s.* FROM _udtf_t d, LATERAL token_spans(d.t, '--') s"
        ).collect()
    ]
    assert out == [(0, "aa", 0), (1, "b", 4), (2, "ccc", 7)]


def test_variant_typed_path_reads(spark):
    from pyspark.sql import functions as F

    df = spark.sql(
        """SELECT parse_json('{"a": {"b": [1, 2, 3]}, "s": "x"}') AS v"""
    )
    row = df.select(
        F.variant_get("v", "$.a.b[1]", "int").alias("i"),
        F.variant_get("v", "$.s", "string").alias("s"),
        F.try_variant_get("v", "$.missing", "int").alias("m"),
    ).collect()[0]
    assert (row["i"], row["s"], row["m"]) == (2, "x", None)


# ---------------------------------------------------------------------------
# Python DataSource streaming SINK — batch publication + idempotent commit
# ---------------------------------------------------------------------------


def test_pysource_stream_writer_end_to_end(spark, tmp_path):
    import os
    import time

    from imdb_top_250_etl_pipeline_spark.sources.pysource import (
        register_python_source,
    )

    register_python_source(spark)
    src = "/root/testdata/sf0.001/documents.parquet"
    q = (
        spark.readStream.format("pyarrow_parquet")
        .option("path", src)
        .option("batchRows", "200")
        .load()
        .selectExpr("doc_id", "n_chars")
    )
    sink = str(tmp_path / "sink")
    sq = (
        q.writeStream.format("pyarrow_parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    exp = spark.read.parquet(src).count()
    got, deadline = 0, time.time() + 120
    try:
        while time.time() < deadline:
            try:
                got = (
                    spark.read.option("recursiveFileLookup", "true")
                    .parquet(sink)
                    .count()
                )
            except Exception:
                got = 0
            if got >= exp:
                break
            time.sleep(2)
    finally:
        sq.stop()
    assert got == exp
    # each micro-batch published under its own batch=<id> dir, staging gone
    dirs = sorted(os.listdir(sink))
    assert all(d.startswith("batch=") for d in dirs), dirs
    assert len(dirs) >= 2  # 500 rows at 200/batch -> >= 3 batches


def test_pysource_stream_writer_recommit_is_idempotent(tmp_path):
    import os

    import pyarrow.parquet as pq

    from imdb_top_250_etl_pipeline_spark.sources.pysource import (
        PyArrowStreamWriter,
        _FileCommit,
    )

    class _Row:
        def __init__(self, **kw):
            self._kw = kw

        def asDict(self):
            return dict(self._kw)

    sink = str(tmp_path / "s")
    w = PyArrowStreamWriter({"path": sink})
    # simulate a replayed micro-batch: same batchId committed twice
    for _ in range(2):
        msg = w.write(iter([_Row(a=1), _Row(a=2)]))
        assert isinstance(msg, _FileCommit) and msg.rows == 2
        w.commit([msg], batchId=7)
    bdir = os.path.join(sink, "batch=7")
    files = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
    # the replay REPLACED the directory — exactly one file, two rows
    assert len(files) == 1
    assert pq.read_table(os.path.join(bdir, files[0])).num_rows == 2
    assert not os.path.exists(os.path.join(sink, "_staging"))


# ---------------------------------------------------------------------------
# observe() quality metrics — same-job counters, no second scan
# ---------------------------------------------------------------------------


def test_with_quality_metrics_same_job(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        with_quality_metrics,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "k long, s string"
    )
    out, obs = with_quality_metrics(df, ["s"])
    # metrics ride the SAME action that materializes the frame
    assert out.count() == 4
    assert obs.get == {"n_rows": 4, "n_null_s": 2}


# ---------------------------------------------------------------------------
# snapshot_cdc / apply_snapshot_cdc — roundtrip property
# ---------------------------------------------------------------------------


def test_snapshot_cdc_roundtrip_reconstructs_new(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_snapshot_cdc,
        snapshot_cdc,
    )

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", None), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    stream = snapshot_cdc(old, new, ["k"])
    ops = {r["k"]: r["op"] for r in stream.collect()}
    assert ops == {2: "U", 3: "D", 4: "U", 5: "I"}
    rebuilt = apply_snapshot_cdc(old, stream, ["k"])
    # exact multiset equality both directions
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_snapshot_cdc_identical_snapshots_emit_nothing(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import snapshot_cdc

    t = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
    assert snapshot_cdc(t, t, ["k"]).count() == 0


# ---------------------------------------------------------------------------
# scd2_lookup — half-open interval boundaries + delete semantics
# ---------------------------------------------------------------------------


def test_scd2_lookup_boundaries_and_deletes(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        scd2_history,
        scd2_lookup,
    )

    changes = spark.createDataFrame(
        [
            (1, 10, "I", "v1"),
            (1, 20, "U", "v2"),
            (2, 10, "I", "w1"),
            (2, 15, "D", None),
        ],
        "k long, seq long, op string, val string",
    )
    hist = scd2_history(changes, "k", "seq", "op", ["val"])
    facts = spark.createDataFrame(
        [(1, 10), (1, 19), (1, 20), (1, 99), (2, 12), (2, 15), (3, 10)],
        "k long, at long",
    )
    out = {
        (r["k"], r["at"]): r["val"]
        for r in scd2_lookup(
            facts, hist, "k", "at"
        ).collect()
    }
    # valid_from inclusive, valid_to exclusive
    assert out[(1, 10)] == "v1" and out[(1, 19)] == "v1"
    assert out[(1, 20)] == "v2" and out[(1, 99)] == "v2"
    # key 2 deleted at seq 15: live before, NULL at/after the delete
    assert out[(2, 12)] == "w1"
    assert out[(2, 15)] is None
    # unknown key survives the left join with NULL dimension
    assert out[(3, 10)] is None
    assert len(out) == 7


# ---------------------------------------------------------------------------
# funnel_steps_fold — equivalence with the staged-join formulation
# ---------------------------------------------------------------------------


def test_funnel_fold_equals_staged_on_fixture(spark):
    from tests.conftest import SF_CORRECT

    from imdb_top_250_etl_pipeline_spark.operators.analytics import (
        funnel_steps,
        funnel_steps_fold,
    )
    from imdb_top_250_etl_pipeline_spark.sources import load

    ev = load(spark, SF_CORRECT, "events")
    steps = ["view", "click", "purchase"]
    a = funnel_steps(ev, steps)
    b = funnel_steps_fold(ev, steps)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_funnel_fold_equals_staged_on_adversarial_ties(spark):
    import itertools
    import random

    from imdb_top_250_etl_pipeline_spark.operators.analytics import (
        funnel_steps,
        funnel_steps_fold,
    )

    # heavy timestamp ties + repeated steps + users stalling at every
    # stage: the shapes where strict-precedence handling can diverge
    rng = random.Random(11)
    rows = []
    for u in range(40):
        for _ in range(rng.randint(0, 12)):
            rows.append(
                (u, rng.randint(0, 5), rng.choice(["a", "b", "c", "x"]))
            )
    df = spark.createDataFrame(rows, "u long, t long, et string")
    steps = ["a", "b", "c"]
    a = funnel_steps(df, steps, "u", "et", "t")
    b = funnel_steps_fold(df, steps, "u", "et", "t")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_funnel_fold_is_single_shuffle(spark):
    from tests.test_plan_shapes import plan_of

    from imdb_top_250_etl_pipeline_spark.operators.analytics import (
        funnel_steps_fold,
    )

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "u long, t long, et string"
    )
    plan = plan_of(
        funnel_steps_fold(df, ["a", "b", "c"], "u", "et", "t"),
        mode="simple",
    )
    # one groupBy = one exchange; the staged form has N-1 extra joins
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


# ---------------------------------------------------------------------------
# incremental_join_delta — delta algebra == full recompute
# ---------------------------------------------------------------------------


def test_incremental_join_delta_equals_recompute(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        incremental_join_delta,
    )

    a_old = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (2, "a2b")], "k long, av string"
    )
    a_new = spark.createDataFrame([(2, "a2c"), (3, "a3")], "k long, av string")
    b_old = spark.createDataFrame([(1, "b1"), (3, "b3")], "k long, bv string")
    b_new = spark.createDataFrame([(2, "b2"), (3, "b3b")], "k long, bv string")

    full = a_old.unionByName(a_new).join(
        b_old.unionByName(b_new), "k"
    )
    incremental = a_old.join(b_old, "k").unionByName(
        incremental_join_delta(a_old, a_new, b_old, b_new, "k")
    )
    assert full.exceptAll(incremental).count() == 0
    assert incremental.exceptAll(full).count() == 0


def test_incremental_join_delta_empty_deltas_yield_nothing(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        incremental_join_delta,
    )

    a = spark.createDataFrame([(1, "x")], "k long, av string")
    b = spark.createDataFrame([(1, "y")], "k long, bv string")
    empty_a = a.limit(0)
    empty_b = b.limit(0)
    assert (
        incremental_join_delta(a, empty_a, b, empty_b, "k").count() == 0
    )


# ---------------------------------------------------------------------------
# mapInArrow — arrow-native batch kernel vs the JVM expression form
# ---------------------------------------------------------------------------


def test_map_in_arrow_normalize_matches_jvm_expression(spark):
    from imdb_top_250_etl_pipeline_spark.operators.udfs import (
        normalize_embeddings_arrow,
    )
    from imdb_top_250_etl_pipeline_spark.sources import load
    from tests.conftest import SF_CORRECT

    emb = load(spark, SF_CORRECT, "embeddings")
    arrow = {
        r["vec_id"]: r["unit_vec"]
        for r in normalize_embeddings_arrow(
            emb, "embedding", "vec_id"
        ).collect()
    }
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    jvm = {
        r["vec_id"]: r["u"]
        for r in emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x / norm).alias("u"),
        ).collect()
    }
    assert arrow.keys() == jvm.keys()
    # float32 source components: the two pipelines promote to float64 at
    # different points, so agreement is float32-epsilon-scale, not exact
    for k in arrow:
        for a, b in zip(arrow[k], jvm[k]):
            assert abs(a - b) < 1e-6


def test_map_in_arrow_zero_vector_stays_zero(spark):
    from imdb_top_250_etl_pipeline_spark.operators.udfs import (
        normalize_embeddings_arrow,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r["unit_vec"]
        for r in normalize_embeddings_arrow(
            df, "embedding", "vec_id"
        ).collect()
    }
    assert out[1] == [0.0, 0.0]
    assert abs(out[2][0] - 0.6) < 1e-12 and abs(out[2][1] - 0.8) < 1e-12


# ---------------------------------------------------------------------------
# lm_perplexity_scores — ordering sanity + null handling
# ---------------------------------------------------------------------------


def test_lm_perplexity_orders_common_below_rare(spark):
    from imdb_top_250_etl_pipeline_spark.operators.text import (
        lm_perplexity_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),   # the dominant pattern
            (2, "a b a b a b a b"),
            (3, "a b a b a b a b"),
            (4, "x y z q r s"),       # one-off bigrams
            (5, "w"),                  # sub-2 tokens: no bigrams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in lm_perplexity_scores(
            docs, "doc_id", "text"
        ).collect()
    }
    # the corpus model finds the dominant pattern unsurprising
    assert out[1]["ppl"] < out[4]["ppl"]
    assert out[1]["ppl"] == out[2]["ppl"] == out[3]["ppl"]
    # single-token document is NULL-scored, not zero
    assert out[5]["ppl"] is None and out[5]["n_bigrams"] is None
    assert out[4]["n_bigrams"] == 5


# ---------------------------------------------------------------------------
# scalar pandas_udf — equivalence with the expression-based language ID
# ---------------------------------------------------------------------------


def test_scalar_pandas_udf_matches_expression_lang_id(spark):
    from tests.conftest import SF_CORRECT

    from imdb_top_250_etl_pipeline_spark.operators.text import language_id
    from imdb_top_250_etl_pipeline_spark.operators.udfs import (
        lang_id_pandas_udf,
    )
    from imdb_top_250_etl_pipeline_spark.sources import load

    docs = load(spark, SF_CORRECT, "documents").select("doc_id", "text")
    udf = lang_id_pandas_udf()
    got = {
        r["doc_id"]: r["lang_udf"]
        for r in docs.select(
            "doc_id", udf("text").alias("lang_udf")
        ).collect()
    }
    want = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id(docs, "text", "doc_id").collect()
    }
    assert got == want
    # and it composes inside SQL like any scalar function
    spark.udf.register("lang_id_py", udf)
    docs.createOrReplaceTempView("_plu_docs")
    n = spark.sql(
        "SELECT count(*) AS n FROM _plu_docs "
        "WHERE lang_id_py(text) = 'en'"
    ).collect()[0]["n"]
    assert n == sum(1 for v in want.values() if v == "en")


# ---------------------------------------------------------------------------
# trending_topk (round 9)
# ---------------------------------------------------------------------------


def test_trending_topk_hand_fixture_with_ties(spark):
    """Counts, window assignment, k-cut, and the lower-key tie-break on
    a hand fixture."""
    import datetime as dt

    from pyspark.sql import functions as F

    from imdb_top_250_etl_pipeline_spark.operators.analytics import (
        trending_topk,
    )

    U = dt.datetime
    rows = (
        # window 00:00-06:00: u1 x3, u2 x2, u7 x2, u9 x1 -> top3 =
        # u1(3), then the u2/u7 tie at 2 breaks low-key-first
        [(U(2024, 1, 1, 1), 1)] * 3
        + [(U(2024, 1, 1, 2), 2)] * 2
        + [(U(2024, 1, 1, 3), 7)] * 2
        + [(U(2024, 1, 1, 4), 9)]
        # window 06:00-12:00: u5 only
        + [(U(2024, 1, 1, 7), 5)]
    )
    e = spark.createDataFrame(rows, "ts timestamp, user_id long")
    got = {
        (r["w_start"].hour, r["rank"]): (r["user_id"], r["n_events"])
        for r in trending_topk(e, "ts", "user_id", "6 hours", k=3).collect()
    }
    assert got[(0, 1)] == (1, 3)
    assert got[(0, 2)] == (2, 2)   # tie with u7 -> lower key first
    assert got[(0, 3)] == (7, 2)
    assert got[(6, 1)] == (5, 1)
    assert len(got) == 4


def test_trending_topk_matches_plain_window_rank(spark):
    """The salted two-phase selection must equal a plain (unsalted)
    per-window rank on real data — the salt is a layout optimization,
    never a semantic change."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from imdb_top_250_etl_pipeline_spark.operators.analytics import (
        trending_topk,
    )

    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "ts", "user_id"
    )
    got = {
        (r["w_start"], r["rank"]): (r["user_id"], r["n_events"])
        for r in trending_topk(e, "ts", "user_id", "6 hours", k=5).collect()
    }
    per = e.groupBy(F.window("ts", "6 hours").alias("w"), "user_id").agg(
        F.count("*").alias("n_events")
    )
    w = W.partitionBy("w").orderBy(F.desc("n_events"), F.asc("user_id"))
    want = {
        (r["w"]["start"], r["rank"]): (r["user_id"], r["n_events"])
        for r in per.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    }
    assert got == want


def test_sessionize_timestamp_ntz_and_integer_paths(spark):
    """operators/analytics.py::sessionize accepts TIMESTAMP_NTZ (raw
    parquet reads without the catalog's schema land here — unix_micros
    would reject it; gaps go through zone-free timestamp_diff) and
    integral-µs columns, and both agree with each other on the same
    instants."""
    from imdb_top_250_etl_pipeline_spark.operators.analytics import sessionize

    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "user_id", "ts", "event_id"
    )
    assert e.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    gap = 6 * 3600 * 1_000_000
    ntz = sessionize(e, "user_id", "ts", gap, tiebreak_cols=["event_id"])
    as_us = e.select(
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("tus"),
        "event_id",
    )
    us = sessionize(as_us, "user_id", "tus", gap, tiebreak_cols=["event_id"])
    got = {
        (r["user_id"], r["session_id"]): r["n_events"] for r in ntz.collect()
    }
    want = {
        (r["user_id"], r["session_id"]): r["n_events"] for r in us.collect()
    }
    assert got == want and got
