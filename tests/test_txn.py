"""Transaction-log table (sources/txn.py): ACID MERGE over parquet.

The contract under test is the published Delta log design: immutable
data files + append-only JSON commits, snapshot isolation / time travel,
optimistic-concurrency conflict on racing commits, stats-driven file
skipping (a merge touching a narrow key range must NOT rewrite files
whose footer range can't contain those keys), and vacuum retention.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from imdb_top_250_etl_pipeline_spark.sources import load
from imdb_top_250_etl_pipeline_spark.sources.txn import (
    TxnConflictError,
    latest_version,
    snapshot,
    txn_create,
    txn_history,
    txn_merge,
    txn_read,
    txn_vacuum,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _customers(spark):
    return load(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )


def _data_file_bytes(table):
    return {
        str(p.relative_to(table)): hashlib.sha256(p.read_bytes()).hexdigest()
        for p in pathlib.Path(table, "data").glob("*.parquet")
    }


def test_create_read_roundtrip(spark, table):
    c = _customers(spark)
    assert txn_create(c, table, key="c_custkey", range_partitions=8) == 0
    back = txn_read(spark, table)
    assert back.exceptAll(c).isEmpty() and c.exceptAll(back).isEmpty()
    assert latest_version(table) == 0


def test_merge_matches_pure_upsert_and_time_travel(spark, table):
    from imdb_top_250_etl_pipeline_spark.operators.etl import upsert

    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=8)
    upd = (
        c.where(F.col("c_custkey") % 10 == 3)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000.0)
        .unionByName(
            c.limit(0).unionByName(
                spark.createDataFrame(
                    [(10_000_001, "new customer", 1.5, "BUILDING")],
                    c.schema,
                )
            )
        )
    )
    v = txn_merge(
        spark, table, upd, update_cols=["c_acctbal", "c_mktsegment"],
        stable_cols=["c_name"],
    )
    assert v == 1
    got = txn_read(spark, table)
    # upsert emits (key, update_cols…, stable_cols…); align to the
    # table's schema order — exceptAll compares positionally
    expected = upsert(
        c, upd, "c_custkey", ["c_acctbal", "c_mktsegment"], ["c_name"]
    ).select(*got.columns)
    assert got.exceptAll(expected).isEmpty() and expected.exceptAll(got).isEmpty()
    # time travel: version 0 still reads the pre-merge table
    v0 = txn_read(spark, table, version=0)
    assert v0.exceptAll(c).isEmpty() and c.exceptAll(v0).isEmpty()


def test_file_skipping_rewrites_only_overlapping_files(spark, table):
    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=8)
    _, _, _, live_before = snapshot(table)
    bytes_before = _data_file_bytes(table)
    # updates confined to the lowest key decile (sf0.001 custkeys span
    # 1..150): with 8 range-partitioned files, most files' [min,max]
    # cannot contain these keys
    upd = c.where(F.col("c_custkey") <= 15).withColumn(
        "c_acctbal", F.lit(0.0)
    )
    txn_merge(
        spark, table, upd, update_cols=["c_acctbal", "c_mktsegment"],
        stable_cols=["c_name"], range_partitions=2,
    )
    _, _, _, live_after = snapshot(table)
    survivors = set(live_before) & set(live_after)
    # the narrow merge must carry most files over by reference...
    assert len(survivors) >= len(live_before) // 2, (
        len(survivors),
        len(live_before),
    )
    assert len(survivors) < len(live_before)  # and rewrite at least one
    # ...and survivors are the same bytes on disk, untouched
    bytes_after = _data_file_bytes(table)
    for rel in survivors:
        assert bytes_after[rel] == bytes_before[rel]
    # correctness didn't regress for skipped keys
    got = txn_read(spark, table)
    assert got.count() == c.count()
    assert (
        got.where(F.col("c_custkey") <= 15)
        .where(F.col("c_acctbal") != 0.0)
        .isEmpty()
    )


def test_merge_idempotent(spark, table):
    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=4)
    upd = c.where(F.col("c_custkey") % 7 == 0).withColumn(
        "c_mktsegment", F.lit("MERGED")
    )
    txn_merge(spark, table, upd, ["c_acctbal", "c_mktsegment"], ["c_name"])
    once = txn_read(spark, table).localCheckpoint(eager=True)
    txn_merge(spark, table, upd, ["c_acctbal", "c_mktsegment"], ["c_name"])
    twice = txn_read(spark, table)
    assert twice.exceptAll(once).isEmpty() and once.exceptAll(twice).isEmpty()
    assert [h["version"] for h in txn_history(table)] == [0, 1, 2]


def test_concurrent_commit_conflicts(spark, table, monkeypatch):
    import imdb_top_250_etl_pipeline_spark.sources.txn as txn_mod

    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=4)
    # exclusive-create protocol: a second commit of the same version
    # must lose, whatever wrote first
    txn_mod._commit(table, 1, [{"remove": {"path": "data/none"}}])
    with pytest.raises(TxnConflictError):
        txn_mod._commit(table, 1, [{"remove": {"path": "data/none"}}])
    # merge-level race: an interloper publishes version 2 AFTER the
    # merge has taken its snapshot but BEFORE it commits — the merge
    # must surface the conflict, not overwrite the interloper's commit
    real_stage = txn_mod._stage_and_place
    state = {"fired": False}

    def stage_with_interloper(df, tbl, version, key, rp):
        if not state["fired"]:
            state["fired"] = True
            txn_mod._commit(tbl, 2, [{"remove": {"path": "data/none"}}])
        return real_stage(df, tbl, version, key, rp)

    monkeypatch.setattr(txn_mod, "_stage_and_place", stage_with_interloper)
    with pytest.raises(TxnConflictError):
        txn_merge(
            spark, table,
            c.where("c_custkey % 2 = 0"),
            ["c_acctbal", "c_mktsegment"], ["c_name"],
        )


def test_vacuum_reclaims_old_versions(spark, table):
    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=4)
    upd = c.withColumn("c_acctbal", F.col("c_acctbal") * 2)
    txn_merge(spark, table, upd, ["c_acctbal", "c_mktsegment"], ["c_name"])
    n_files_before = len(_data_file_bytes(table))
    removed = txn_vacuum(table, retain_versions=1)
    assert removed > 0
    assert len(_data_file_bytes(table)) == n_files_before - removed
    # latest still intact after vacuum
    got = txn_read(spark, table)
    assert got.count() == c.count()
    # the vacuumed historical version now fails at scan, not silently
    with pytest.raises(Exception):
        txn_read(spark, table, version=0).count()


def test_create_refuses_overwrite(spark, table):
    c = _customers(spark)
    txn_create(c, table, key="c_custkey")
    with pytest.raises(FileExistsError):
        txn_create(c, table, key="c_custkey")


def test_merge_schema_evolution(spark, table):
    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=4)
    upd = c.where(F.col("c_custkey") % 5 == 0).withColumn(
        "segment_rank", (F.col("c_custkey") % 3).cast("long")
    )
    # strict by default: new columns refuse without the flag
    with pytest.raises(ValueError, match="allow_schema_evolution"):
        txn_merge(
            spark, table, upd,
            ["c_acctbal", "c_mktsegment", "segment_rank"], ["c_name"],
        )
    v = txn_merge(
        spark, table, upd,
        ["c_acctbal", "c_mktsegment", "segment_rank"], ["c_name"],
        allow_schema_evolution=True,
    )
    got = txn_read(spark, table)
    assert "segment_rank" in got.columns
    # untouched historical rows lazily backfill NULL; merged rows carry
    # the new values
    assert (
        got.where(F.col("c_custkey") % 5 != 0)
        .where(F.col("segment_rank").isNotNull())
        .isEmpty()
    )
    assert (
        got.where(F.col("c_custkey") % 5 == 0)
        .where(F.col("segment_rank") != F.col("c_custkey") % 3)
        .isEmpty()
    )
    assert got.count() == c.count()
    # time travel to v0 reads the PRE-evolution schema
    v0 = txn_read(spark, table, version=0)
    assert "segment_rank" not in v0.columns
    # a followup merge in the evolved schema works and keeps it
    upd2 = txn_read(spark, table).where(F.col("c_custkey") % 25 == 0)
    txn_merge(
        spark, table, upd2,
        ["c_acctbal", "c_mktsegment", "segment_rank"], ["c_name"],
    )
    assert "segment_rank" in txn_read(spark, table).columns
    # a source missing table columns is rejected loudly
    with pytest.raises(ValueError, match="lack table columns"):
        txn_merge(spark, table, c, ["c_acctbal"], ["c_name"])


def test_changes_feed_per_commit_and_reconstruction(spark, table):
    """txn_changes: per-commit I/U/D rows tagged with _commit_version;
    rows merely copied along in a file rewrite cancel out; applying
    the feed in order onto the v_from snapshot reconstructs v_to."""
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_snapshot_cdc,
    )
    from imdb_top_250_etl_pipeline_spark.sources.txn import txn_changes

    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=8)
    # commit 1: update a band + insert a new key
    upd1 = (
        c.where(F.col("c_custkey") % 10 == 3)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000.0)
        .unionByName(
            spark.createDataFrame(
                [(10_000_001, "new customer", 1.5, "BUILDING")], c.schema
            )
        )
    )
    txn_merge(
        spark, table, upd1,
        update_cols=["c_acctbal", "c_mktsegment"], stable_cols=["c_name"],
    )
    # commit 2: touch a different band
    upd2 = txn_read(spark, table).where(
        F.col("c_custkey") % 10 == 7
    ).withColumn("c_mktsegment", F.lit("MACHINERY"))
    txn_merge(
        spark, table, upd2,
        update_cols=["c_acctbal", "c_mktsegment"], stable_cols=["c_name"],
    )

    feed = txn_changes(spark, table, 0)
    by_v = {
        v: [r for r in feed.collect() if r["_commit_version"] == v]
        for v in (1, 2)
    }
    n_upd1 = c.where(F.col("c_custkey") % 10 == 3).count()
    # commit 1: exactly the updated band as 'U' + the insert as 'I' —
    # unchanged rows rewritten alongside them must cancel out
    ops1 = {}
    for r in by_v[1]:
        ops1.setdefault(r["op"], []).append(r["c_custkey"])
    assert len(ops1.get("U", [])) == n_upd1
    assert ops1.get("I") == [10_000_001]
    assert "D" not in ops1
    # commit 2: only the %10==7 band, all 'U' (the new key 10000001 has
    # custkey % 10 == 1 and must not reappear) — and ONLY the rows whose
    # segment actually changed: customers already in MACHINERY were
    # rewritten with identical values and must cancel out of the feed
    assert all(r["op"] == "U" and r["c_custkey"] % 10 == 7 for r in by_v[2])
    assert len(by_v[2]) == c.where(
        (F.col("c_custkey") % 10 == 7) & (F.col("c_mktsegment") != "MACHINERY")
    ).count()

    # reconstruction: v0 + feed(1) + feed(2) == v2, exactly
    state = txn_read(spark, table, version=0)
    for v in (1, 2):
        chg = feed.where(F.col("_commit_version") == v).drop(
            "_commit_version"
        )
        state = apply_snapshot_cdc(state, chg, ["c_custkey"])
    final = txn_read(spark, table).select(*state.columns)
    assert state.exceptAll(final).isEmpty()
    assert final.exceptAll(state).isEmpty()

    # empty range -> empty frame with the feed schema
    empty = txn_changes(spark, table, 2, 2)
    assert empty.count() == 0
    assert "op" in empty.columns and "_commit_version" in empty.columns


def test_changes_feed_projects_schema_evolution_through_end_schema(
    spark, table
):
    """A schema-evolving commit INSIDE the range is projected through
    the END-of-range schema (Delta CDF semantics): the evolving
    commit's own change rows SURVIVE in the feed (the round-8 guard
    silently excluded them under either suggested split), new columns
    read as NULL for pre-evolution commits, and applying the full feed
    onto the v_from snapshot reconstructs the v_to snapshot exactly."""
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_snapshot_cdc,
    )
    from imdb_top_250_etl_pipeline_spark.sources.txn import txn_changes

    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=4)
    upd = c.limit(50).withColumn("loyalty_tier", F.lit("GOLD"))
    txn_merge(
        spark, table, upd,
        update_cols=["c_acctbal", "c_mktsegment", "loyalty_tier"],
        stable_cols=["c_name"],
        allow_schema_evolution=True,
    )
    # a post-evolution commit so the range spans both schemas
    upd2 = txn_read(spark, table).limit(20).withColumn(
        "c_mktsegment", F.lit("MACHINERY")
    )
    txn_merge(
        spark, table, upd2,
        update_cols=["c_acctbal", "c_mktsegment", "loyalty_tier"],
        stable_cols=["c_name"],
    )
    feed = txn_changes(spark, table, 0)
    assert "loyalty_tier" in feed.columns
    # the EVOLVING commit's own changes are in the feed — the exact
    # silent-loss class the old refusal's split advice produced
    v1 = feed.where(F.col("_commit_version") == 1)
    assert v1.where(
        (F.col("op") == "U") & (F.col("loyalty_tier") == "GOLD")
    ).count() > 0
    assert feed.where(F.col("_commit_version") == 2).count() > 0
    # reconstruction across the evolution: v0 (old schema, new column
    # as NULL) + full feed == v2
    state = txn_read(spark, table, version=0).withColumn(
        "loyalty_tier", F.lit(None).cast("string")
    )
    for v in (1, 2):
        chg = feed.where(F.col("_commit_version") == v).drop(
            "_commit_version"
        )
        state = apply_snapshot_cdc(state, chg, ["c_custkey"])
    final = txn_read(spark, table).select(*state.columns)
    assert state.exceptAll(final).isEmpty()
    assert final.exceptAll(state).isEmpty()


def test_changes_feed_refuses_merge_key_change_inside_range(spark, table):
    """Schema evolution projects through the end schema, but a merge-KEY
    change cannot — the feed's I/U/D classification is keyed on one
    column — so txn_changes refuses with split guidance that names the
    evolving version itself as unrepresentable."""
    import json as _json

    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        _log_path,
        txn_changes,
    )

    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=2)
    # hand-write a commit whose metaData re-keys the table (no public
    # API does this; the guard exists for hand-edited / foreign logs)
    with open(_log_path(table, 0)) as f:
        schema_json = _json.loads(f.readline())["metaData"]["schema"]
    with open(_log_path(table, 1), "w") as f:
        f.write(
            _json.dumps(
                {"metaData": {"schema": schema_json, "key": "c_name"}}
            )
            + "\n"
        )
    with pytest.raises(ValueError, match="merge key changed at version 1"):
        txn_changes(spark, table, 0)


def test_changes_feed_refuses_column_type_change_inside_range(spark, table):
    """ADVICE r9: projecting a mid-range TYPE change through the end
    schema's cast() silently NULLs incompatible values (string→long
    under non-ANSI cast), corrupting the feed — Delta refuses such
    evolution, and so must txn_changes, with split guidance, BEFORE
    reading any file.  Additive evolution (the dedicated test above)
    must keep flowing through."""
    import json as _json

    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        _log_path,
        txn_changes,
    )

    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=2)
    # hand-write a commit whose metaData re-types c_name string→long
    # (no public API does this; the guard exists for hand-edited /
    # foreign logs, like the merge-key guard)
    with open(_log_path(table, 0)) as f:
        meta = _json.loads(f.readline())["metaData"]
    evolved = _json.loads(meta["schema"])
    for fld in evolved["fields"]:
        if fld["name"] == "c_name":
            fld["type"] = "long"
    with open(_log_path(table, 1), "w") as f:
        f.write(
            _json.dumps(
                {
                    "metaData": {
                        "schema": _json.dumps(evolved),
                        "key": meta["key"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(
        ValueError, match="column 'c_name' changes type inside change range"
    ):
        txn_changes(spark, table, 0)
    # the START schema is guarded too: the re-typing commit's own
    # metaData (long) MATCHES the end schema (long), so only comparing
    # mid-range metaData would pass — the v_from=0 snapshot's string
    # schema is what the guard must catch
    with open(_log_path(table, 2), "w") as f:
        f.write("{}\n")
    with pytest.raises(
        ValueError, match="column 'c_name' changes type inside change range"
    ):
        txn_changes(spark, table, 0, 2)
    # and a sub-range that sits entirely AFTER the re-typing commit is
    # schema-consistent and must still work (split guidance is real)
    assert txn_changes(spark, table, 1, 2).count() == 0


def test_optimize_compacts_preserving_content_and_history(spark, table):
    """OPTIMIZE: small files compact into fewer key-clustered ones in
    one atomic commit; content identical; time travel to the
    pre-optimize version still works; the change feed for the optimize
    commit is EMPTY (compaction is invisible to CDF consumers); a
    second optimize is a no-op (-1, no empty commit)."""
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        txn_changes,
        txn_optimize,
    )

    c = _customers(spark)
    # create with many tiny files (one per range partition)
    txn_create(c, table, key="c_custkey", range_partitions=16)
    _, _, _, live0 = snapshot(table)
    assert len(live0) == 16

    v = txn_optimize(spark, table, target_files=2)
    assert v == 1
    _, _, _, live1 = snapshot(table)
    assert len(live1) < len(live0)
    # content identical
    after = txn_read(spark, table)
    assert after.exceptAll(c).isEmpty() and c.exceptAll(after).isEmpty()
    # time travel to v0 intact
    v0 = txn_read(spark, table, version=0)
    assert v0.exceptAll(c).isEmpty() and c.exceptAll(v0).isEmpty()
    # CDF: the optimize commit contributes ZERO changes
    assert txn_changes(spark, table, 0, 1).count() == 0
    # idempotence: everything is already compact
    assert txn_optimize(spark, table, target_files=2) == -1
    assert latest_version(table) == 1
    # new files carry key stats (file skipping stays selective)
    assert all(
        a.get("min_key") is not None for a in live1.values()
    )


def test_consume_changes_cursor_protocol(spark, table, tmp_path):
    """Incremental CDF subscription: the first call delivers the base
    snapshot as inserts plus all commits; advancing only after a
    successful apply makes a crashed consumer REPLAY the same batch;
    a caught-up consumer gets an empty batch; a new commit is
    delivered alone."""
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_snapshot_cdc,
    )
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        advance_cursor,
        consume_changes,
    )

    cur = str(tmp_path / "cursor")
    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=8)
    upd = c.where(F.col("c_custkey") % 10 == 3).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    txn_merge(spark, table, upd, ["c_acctbal", "c_mktsegment"], ["c_name"])

    # first call: base snapshot as 'I' + the merge's changes
    feed, v_from, v_to = consume_changes(spark, table, cur)
    assert (v_from, v_to) == (-1, 1)
    assert feed.where(
        (F.col("_commit_version") == 0) & (F.col("op") == "I")
    ).count() == c.count()
    # applying the whole feed in version order rebuilds the live table
    state = spark.createDataFrame([], txn_read(spark, table).schema)
    for v in (0, 1):
        chg = feed.where(F.col("_commit_version") == v).drop(
            "_commit_version"
        )
        state = apply_snapshot_cdc(state, chg, ["c_custkey"])
    live = txn_read(spark, table).select(*state.columns)
    assert state.exceptAll(live).isEmpty() and live.exceptAll(state).isEmpty()

    # crash before advancing: the SAME batch replays
    feed2, v_from2, v_to2 = consume_changes(spark, table, cur)
    assert (v_from2, v_to2) == (-1, 1)

    # advance, then caught-up consumers get an empty batch
    advance_cursor(cur, v_to)
    feed3, v_from3, v_to3 = consume_changes(spark, table, cur)
    assert (v_from3, v_to3) == (1, 1) and feed3.count() == 0

    # a new commit is delivered alone
    upd2 = c.where(F.col("c_custkey") % 10 == 4).withColumn(
        "c_mktsegment", F.lit("NEWSEG")
    )
    txn_merge(spark, table, upd2, ["c_acctbal", "c_mktsegment"], ["c_name"])
    feed4, v_from4, v_to4 = consume_changes(spark, table, cur)
    assert (v_from4, v_to4) == (1, 2)
    assert feed4.select("_commit_version").distinct().collect()[0][0] == 2


def test_schema_history_reports_evolution(spark, table):
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        txn_schema_history,
    )

    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=4)
    upd = c.where(F.col("c_custkey") % 5 == 0).withColumn(
        "segment_rank", (F.col("c_custkey") % 3).cast("long")
    )
    txn_merge(
        spark, table, upd,
        update_cols=["c_acctbal", "c_mktsegment", "segment_rank"],
        stable_cols=["c_name"],
        allow_schema_evolution=True,
    )
    hist = txn_schema_history(table)
    assert hist[0]["version"] == 0
    assert hist[0]["added"] == sorted(c.columns)
    assert hist[0]["removed"] == [] and hist[0]["retyped"] == []
    evo = [h for h in hist if h["version"] > 0]
    assert len(evo) == 1
    assert evo[0]["added"] == ["segment_rank"]
    assert evo[0]["removed"] == [] and evo[0]["retyped"] == []


# ---------------------------------------------------------------------------
# replaceWhere (range overwrite / backfill)
# ---------------------------------------------------------------------------


def test_replace_where_replaces_range_atomically(spark, table):
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        txn_replace_where,
    )

    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=8)
    _, _, _, live_before = snapshot(table)
    bytes_before = _data_file_bytes(table)
    # regenerate keys 1..30: half the old rows dropped, rest rewritten
    repl = (
        c.where((F.col("c_custkey") <= 30) & (F.col("c_custkey") % 2 == 0))
        .withColumn("c_acctbal", F.lit(7.0))
    )
    v = txn_replace_where(spark, table, repl, 0, 30, range_partitions=2)
    got = txn_read(spark, table)
    # inside the range: exactly the replacement rows
    inside = got.where(F.col("c_custkey") <= 30)
    assert inside.count() == repl.count()
    assert inside.where(F.col("c_acctbal") != 7.0).isEmpty()
    # outside the range: untouched
    outside_before = c.where(F.col("c_custkey") > 30)
    assert got.where(F.col("c_custkey") > 30).count() == outside_before.count()
    # files disjoint from the range carried over byte-identical
    _, _, _, live_after = snapshot(table)
    survivors = set(live_before) & set(live_after)
    assert survivors, "narrow replace must carry most files by reference"
    bytes_after = _data_file_bytes(table)
    for rel in survivors:
        assert bytes_after[rel] == bytes_before[rel]
    # time travel still sees the pre-replace rows
    old = txn_read(spark, table, version=v - 1)
    assert old.count() == c.count()


def test_replace_where_pure_delete_and_noop(spark, table):
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        txn_replace_where,
    )

    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=4)
    n = c.count()
    n_in = c.where(F.col("c_custkey").between(10, 40)).count()
    v = txn_replace_where(spark, table, None, 10, 40)
    assert v == 1
    assert txn_read(spark, table).count() == n - n_in
    # the range is now empty: a second delete finds nothing and commits
    # nothing (idempotent, no empty commits)
    assert txn_replace_where(spark, table, None, 10, 40) == -1
    assert latest_version(table) == 1


def test_replace_where_validates_predicate_and_feeds_cdf(spark, table):
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        txn_changes,
        txn_replace_where,
    )

    c = _customers(spark)
    txn_create(c, table, key="c_custkey", range_partitions=4)
    # a replacement row outside the range must be rejected pre-commit
    bad = c.where(F.col("c_custkey").isin(5, 77))
    with pytest.raises(ValueError, match="outside"):
        txn_replace_where(spark, table, bad, 1, 20)
    assert latest_version(table) == 0  # nothing committed
    # CDF of a real replace: D for dropped keys, I/U only inside range
    repl = c.where(F.col("c_custkey").between(1, 10)).withColumn(
        "c_name", F.lit("regen")
    )
    txn_replace_where(spark, table, repl, 1, 20)
    feed = txn_changes(spark, table, 0).collect()
    keys_in = {
        r.c_custkey for r in c.where(F.col("c_custkey").between(1, 20)).collect()
    }
    assert {r.c_custkey for r in feed} <= keys_in
    by_op = {}
    for r in feed:
        by_op.setdefault(r.op, set()).add(r.c_custkey)
    # keys 11..20 vanished -> D; keys 1..10 changed name -> U (or D+I)
    assert {k for k in keys_in if k > 10} <= by_op.get("D", set())
    assert all(r.c_name == "regen" for r in feed if r.op in ("I", "U"))


def test_txn_append_idempotent_and_exactly_once_stream(spark, tmp_path):
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        last_txn_version,
        txn_append,
    )
    from imdb_top_250_etl_pipeline_spark.streaming import (
        read_events_stream,
        stream_to_txn_table,
    )

    table = str(tmp_path / "facts")
    src = load(spark, SF_SMOKE, "events")
    n_src = src.count()

    # exactly-once stream: availableNow over the events dir
    q = stream_to_txn_table(
        read_events_stream(spark, SF_SMOKE),
        table,
        str(tmp_path / "ckpt"),
        app_id="ingest-a",
    ).start()
    q.awaitTermination(120)
    assert txn_read(spark, table).count() == n_src
    head = latest_version(table)
    committed = last_txn_version(table, "ingest-a")
    assert committed >= 0

    # a replayed microbatch (restart that lost the checkpoint commit,
    # or a fresh checkpoint re-reading the same files) is a no-op
    assert (
        txn_append(
            src, table, key="event_id", app_txn=("ingest-a", committed)
        )
        is None
    )
    q2 = stream_to_txn_table(
        read_events_stream(spark, SF_SMOKE),
        table,
        str(tmp_path / "ckpt2"),  # fresh checkpoint => batch ids replay
        app_id="ingest-a",
    ).start()
    q2.awaitTermination(120)
    assert latest_version(table) == head  # nothing re-committed
    assert txn_read(spark, table).count() == n_src

    # a NEW batch id appends; a DIFFERENT app's txn is independent
    v = txn_append(
        src.limit(5), table, key="event_id",
        app_txn=("ingest-a", committed + 1),
    )
    assert v == head + 1
    assert txn_read(spark, table).count() == n_src + 5
    assert last_txn_version(table, "other-app") == -1


def test_restore_rolls_back_and_feeds_cdf(spark, table):
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        txn_changes,
        txn_restore,
    )

    c = load(spark, SF_SMOKE, "customer").limit(40)
    txn_create(c, table, key="c_custkey", range_partitions=2)
    v0_rows = {tuple(r) for r in txn_read(spark, table, 0).collect()}
    upd = c.limit(10).withColumn("c_name", F.lit("changed"))
    txn_merge(
        spark, table, upd, ["c_name"], ["c_nationkey", "c_acctbal", "c_mktsegment"]
    )
    assert latest_version(table) == 1
    v_restore = txn_restore(table, 0)
    assert v_restore == 2
    # the restored head equals v0 exactly; v1 is still time-travelable
    assert {tuple(r) for r in txn_read(spark, table).collect()} == v0_rows
    assert any(
        r.c_name == "changed" for r in txn_read(spark, table, 1).collect()
    )
    # CDF over the restore commit: the changed names revert
    feed = [
        r
        for r in txn_changes(spark, table, 1).collect()
        if r._commit_version == 2
    ]
    assert feed and all(r.c_name != "changed" for r in feed if r.op in ("I", "U"))
    # restoring to the just-restored state is a no-op commit
    v3 = txn_restore(table, 0)
    assert txn_read(spark, table, v3).count() == len(v0_rows)


def test_restore_refuses_vacuumed_target(spark, table):
    from imdb_top_250_etl_pipeline_spark.sources.txn import txn_restore

    c = load(spark, SF_SMOKE, "customer").limit(30)
    txn_create(c, table, key="c_custkey", range_partitions=2)
    upd = c.withColumn("c_name", F.lit("rewritten"))
    txn_merge(
        spark, table, upd, ["c_name"], ["c_nationkey", "c_acctbal", "c_mktsegment"]
    )
    txn_vacuum(table, retain_versions=1)  # drops v0-only files
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        txn_restore(table, 0)


def test_shallow_clone_is_zero_copy_and_independent(spark, table, tmp_path):
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        txn_clone,
        txn_merge,
        txn_vacuum,
    )

    c = load(spark, SF_SMOKE, "customer").limit(30)
    txn_create(c, table, key="c_custkey", range_partitions=2)
    clone = str(tmp_path / "clone")
    txn_clone(table, clone)
    src_rows = {tuple(r) for r in txn_read(spark, table).collect()}
    assert {tuple(r) for r in txn_read(spark, clone).collect()} == src_rows
    # zero-copy: the clone's data dir holds no parquet of its own
    import os as _os

    dd = _os.path.join(clone, "data")
    assert not _os.path.isdir(dd) or not any(
        f.endswith(".parquet") for f in _os.listdir(dd)
    )
    # divergence: merging into the clone leaves the source untouched
    upd = c.limit(5).withColumn("c_name", F.lit("clone-only"))
    txn_merge(
        spark, clone, upd, ["c_name"], ["c_nationkey", "c_acctbal", "c_mktsegment"]
    )
    assert {tuple(r) for r in txn_read(spark, table).collect()} == src_rows
    assert any(
        r.c_name == "clone-only" for r in txn_read(spark, clone).collect()
    )
    # vacuuming the clone sweeps only its own data dir: the source's
    # files survive and the source still reads
    txn_vacuum(clone, retain_versions=1)
    assert {tuple(r) for r in txn_read(spark, table).collect()} == src_rows


def test_check_constraints_gate_every_write_path(spark, table):
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        txn_append,
        txn_constraints,
        txn_drop_constraint,
        txn_replace_where,
        txn_set_constraint,
    )

    c = load(spark, SF_SMOKE, "customer").limit(30)
    txn_create(c, table, key="c_custkey", range_partitions=2)
    txn_set_constraint(spark, table, "bal_floor", "c_acctbal >= -1000.0")
    assert txn_constraints(table) == {"bal_floor": "c_acctbal >= -1000.0"}
    head = latest_version(table)

    bad = c.limit(3).withColumn("c_acctbal", F.lit(-99999.0))
    with pytest.raises(ValueError, match="bal_floor"):
        txn_merge(
            spark, table, bad, ["c_acctbal", "c_mktsegment"], ["c_name"]
        )
    with pytest.raises(ValueError, match="bal_floor"):
        txn_append(bad, table, key="c_custkey")
    with pytest.raises(ValueError, match="bal_floor"):
        txn_replace_where(
            spark,
            table,
            bad.withColumn("c_custkey", F.lit(1)),
            1,
            5,
        )
    assert latest_version(table) == head  # nothing committed

    # SQL CHECK semantics: a NULL predicate passes
    nul = c.limit(2).withColumn("c_acctbal", F.lit(None).cast("double"))
    txn_merge(spark, table, nul, ["c_acctbal", "c_mktsegment"], ["c_name"])

    # good writes pass; dropping the constraint re-opens the gate
    txn_drop_constraint(table, "bal_floor")
    assert txn_constraints(table) == {}
    txn_append(bad, table, key="c_custkey")

    # ALTER-time validation: existing data now violates a new constraint
    with pytest.raises(ValueError, match="strict_floor"):
        txn_set_constraint(
            spark, table, "strict_floor", "c_acctbal >= -1000.0"
        )


def test_write_audit_publish_composition(spark, table, tmp_path):
    """WAP (write-audit-publish): stage a candidate batch on a zero-copy
    clone, audit it there with the declarative expectation gate, and
    only a fully-valid batch is published to the production table — the
    Iceberg/Delta branch-audit pattern composed from txn_clone +
    apply_expectations + txn_append, with the source provably untouched
    by a failed audit."""
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_expectations,
    )
    from imdb_top_250_etl_pipeline_spark.sources.txn import txn_append, txn_clone

    c = load(spark, SF_SMOKE, "customer").limit(30)
    txn_create(c, table, key="c_custkey", range_partitions=2)
    src_rows = {tuple(r) for r in txn_read(spark, table).collect()}
    rules = {"bal_sane": F.expr("c_acctbal BETWEEN -1000 AND 100000")}

    def wap(batch):
        audit = str(tmp_path / f"audit-{abs(hash(tuple(sorted(r.c_custkey for r in batch.collect()))))}")
        txn_clone(table, audit)
        txn_append(batch, audit, key="c_custkey")
        staged = txn_read(spark, audit)
        _valid, quarantine = apply_expectations(staged, rules)
        if not quarantine.isEmpty():
            return False  # audit failed: nothing reaches the source
        txn_append(batch, table, key="c_custkey")
        return True

    bad = c.limit(4).withColumn("c_acctbal", F.lit(9e9))
    assert wap(bad) is False
    assert {tuple(r) for r in txn_read(spark, table).collect()} == src_rows
    good = c.limit(4).withColumn("c_custkey", F.col("c_custkey") + 100000)
    assert wap(good) is True
    assert txn_read(spark, table).count() == len(src_rows) + 4


@pytest.mark.slow  # stress tier (see conftest)
def test_concurrent_writers_serializable_no_lost_updates(spark, table):
    """OCC under REAL contention: 7 threads (4 MERGE writers on
    interleaved key slices with external retry-on-conflict, 2 append
    writers, 1 OPTIMIZE loop) race on one table.  Afterward the history
    must be a gap-free serial order of atomic commits, every writer's
    LAST write must be visible (no lost updates — the re-diff-and-retry
    path under contention), every appended key present exactly once,
    and the change feed must reconstruct the final state from v0."""
    import threading

    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_snapshot_cdc,
    )
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        txn_append,
        txn_changes,
        txn_optimize,
    )

    base = spark.range(200).select(
        F.col("id").alias("k"),
        F.lit(0).cast("long").alias("val"),
        F.lit("init").alias("writer"),
    )
    txn_create(base, table, key="k", range_partitions=4)

    errors: list = []
    N_ITER = 2

    def merge_writer(i: int) -> None:
        try:
            for it in range(1, N_ITER + 1):
                upd = spark.range(200).where(F.col("id") % 4 == i).select(
                    F.col("id").alias("k"),
                    F.lit(it * 100 + i).cast("long").alias("val"),
                    F.lit(f"w{i}").alias("writer"),
                )
                while True:  # the OCC contract: caller re-merges on conflict
                    try:
                        txn_merge(
                            spark, table, upd,
                            update_cols=["val", "writer"], stable_cols=[],
                        )
                        break
                    except TxnConflictError:
                        continue
        except Exception as e:  # pragma: no cover - surfaced in assert
            errors.append(e)

    def append_writer(i: int) -> None:
        try:
            for b in range(N_ITER):
                rows = spark.range(10).select(
                    (F.lit(1000 + i * 100 + b * 10) + F.col("id")).alias("k"),
                    F.lit(-1).cast("long").alias("val"),
                    F.lit(f"a{i}").alias("writer"),
                )
                txn_append(rows, table, key="k")  # retries internally
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def optimizer() -> None:
        try:
            for _ in range(2):
                while True:
                    try:
                        txn_optimize(spark, table, target_files=2)
                        break
                    except TxnConflictError:
                        continue
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = (
        [threading.Thread(target=merge_writer, args=(i,)) for i in range(4)]
        + [threading.Thread(target=append_writer, args=(i,)) for i in range(2)]
        + [threading.Thread(target=optimizer)]
    )
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert not any(t.is_alive() for t in threads)

    # serializable, gap-free history: one commit per version 0..head
    head = latest_version(table)
    assert [h["version"] for h in txn_history(table)] == list(range(head + 1))
    # expected commit count: 4 mergers x2 + 2 appenders x2 + up to 2
    # optimizes (an optimize may no-op to -1), + create
    assert 13 <= head + 1 <= 15

    final = txn_read(spark, table)
    # no lost updates: every merge slice shows its writer's LAST value
    for i in range(4):
        slice_rows = final.where(
            (F.col("k") < 200) & (F.col("k") % 4 == i)
        )
        assert slice_rows.where(
            (F.col("val") != N_ITER * 100 + i) | (F.col("writer") != f"w{i}")
        ).isEmpty(), f"lost update in merge slice {i}"
    # every appended key exactly once
    appended = final.where(F.col("k") >= 1000)
    assert appended.count() == 2 * N_ITER * 10
    assert appended.select("k").distinct().count() == 2 * N_ITER * 10
    assert final.count() == 200 + 2 * N_ITER * 10

    # the change feed reconstructs the contended history exactly
    state = txn_read(spark, table, version=0)
    feed = txn_changes(spark, table, 0)
    for v in range(1, head + 1):
        chg = feed.where(F.col("_commit_version") == v).drop("_commit_version")
        state = apply_snapshot_cdc(state, chg, ["k"])
    assert state.exceptAll(final).isEmpty()
    assert final.exceptAll(state).isEmpty()

    # snapshot isolation: every intermediate version still scans, and
    # row counts never decrease (merges update, appends add, optimize
    # preserves)
    prev = -1
    for v in range(head + 1):
        n = txn_read(spark, table, version=v).count()
        assert n >= prev
        prev = n


# --------------------------------------------------------------- fuzzing

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402


@st.composite
def _txn_ops(draw):
    """A random program over the table: merge (random key slice, random
    value), append (fresh keys), optimize, restore (to a random earlier
    version).  Restores reference versions by INDEX into whatever
    history exists at run time."""
    n = draw(st.integers(1, 6))
    ops = []
    for _ in range(n):
        kind = draw(st.sampled_from(["merge", "merge", "append", "optimize", "restore"]))
        if kind == "merge":
            ops.append(
                (
                    "merge",
                    draw(st.integers(2, 5)),    # modulus: key slice k % m == r
                    draw(st.integers(0, 4)),    # remainder
                    draw(st.integers(-999, 999)),  # value to write
                )
            )
        elif kind == "restore":
            ops.append(("restore", draw(st.integers(0, 10))))  # index, clamped
        else:
            ops.append((kind,))
    return ops


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_txn_ops())
@pytest.mark.slow  # stress tier (see conftest)
def test_fuzz_txn_log_vs_model(spark, tmp_path, ops):
    """Model-based fuzz of the transaction log: a random program of
    MERGE / append / OPTIMIZE / RESTORE runs against both the real
    table and a pure-Python dict model with the same semantics.  After
    the program: final state == model, EVERY recorded version time
    travels to its model snapshot, and the change feed replays v0 to
    the final state — across restores and compactions."""
    import uuid as _uuid

    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_snapshot_cdc,
    )
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        txn_append,
        txn_changes,
        txn_optimize,
        txn_restore,
    )

    table = str(tmp_path / f"fuzz-{_uuid.uuid4().hex[:8]}")

    def mk_df(rows):
        return spark.createDataFrame(rows, "k long, val long, writer string")

    model: dict[int, tuple[int, str]] = {k: (0, "init") for k in range(30)}
    txn_create(
        mk_df([(k, v, w) for k, (v, w) in model.items()]),
        table, key="k", range_partitions=3,
    )
    history: list[dict] = [dict(model)]  # model snapshot per version
    next_key = 1000

    for op in ops:
        if op[0] == "merge":
            _, m, r, val = op
            upd = {k: (val, f"m{m}r{r}") for k in list(model) if k % m == r}
            if not upd:
                continue  # empty MERGE input is refused by design
            txn_merge(
                spark, table,
                mk_df([(k, v, w) for k, (v, w) in upd.items()]),
                update_cols=["val", "writer"], stable_cols=[],
            )
            model.update(upd)
            history.append(dict(model))
        elif op[0] == "append":
            rows = {next_key + i: (-1, "app") for i in range(5)}
            next_key += 5
            txn_append(
                mk_df([(k, v, w) for k, (v, w) in rows.items()]),
                table, key="k",
            )
            model.update(rows)
            history.append(dict(model))
        elif op[0] == "optimize":
            if txn_optimize(spark, table, target_files=2) >= 0:
                history.append(dict(model))  # content unchanged
        elif op[0] == "restore":
            idx = op[1] % len(history)
            if history[idx] == model:
                continue  # no-op restore commits nothing in the model
            txn_restore(table, idx)
            model = dict(history[idx])
            history.append(dict(model))

    def as_set(df):
        return {(r.k, r.val, r.writer) for r in df.collect()}

    want = {(k, v, w) for k, (v, w) in model.items()}
    assert as_set(txn_read(spark, table)) == want

    # time travel: every version reproduces its model snapshot
    assert latest_version(table) == len(history) - 1
    for v, snap in enumerate(history):
        assert as_set(txn_read(spark, table, version=v)) == {
            (k, val, w) for k, (val, w) in snap.items()
        }, f"time travel to v{v} diverged"

    # change feed replays the whole program
    state = txn_read(spark, table, version=0)
    feed = txn_changes(spark, table, 0)
    for v in range(1, len(history)):
        state = apply_snapshot_cdc(
            state,
            feed.where(F.col("_commit_version") == v).drop("_commit_version"),
            ["k"],
        )
    assert as_set(state) == want


@st.composite
def _txn_matrix_ops(draw):
    """Round 12: the FULL action matrix — merge / append / optimize /
    restore / replaceWhere (rewrite + pure delete) / schema evolution /
    CHECK constraints (set + drop, both the ALTER-time validation and
    the per-write gate) / SHALLOW CLONE — in random interleavings."""
    n = draw(st.integers(3, 9))
    ops = []
    for _ in range(n):
        kind = draw(
            st.sampled_from(
                [
                    "merge", "merge", "append", "optimize", "restore",
                    "replace", "replace_del", "evolve",
                    "set_cap", "drop_cap", "clone",
                ]
            )
        )
        if kind == "merge":
            ops.append(
                (
                    "merge",
                    draw(st.integers(2, 5)),
                    draw(st.integers(0, 4)),
                    draw(st.integers(-999, 999)),
                )
            )
        elif kind == "restore":
            ops.append(("restore", draw(st.integers(0, 10))))
        elif kind in ("replace", "replace_del"):
            ops.append(
                (
                    kind,
                    draw(st.integers(0, 35)),
                    draw(st.integers(0, 15)),
                    draw(st.integers(-999, 999)),
                )
            )
        elif kind == "evolve":
            ops.append(("evolve", draw(st.integers(2, 4))))
        elif kind == "set_cap":
            ops.append(("set_cap", draw(st.sampled_from([200, 500, 10000]))))
        else:
            ops.append((kind,))
    return ops


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_txn_matrix_ops())
@pytest.mark.slow  # stress tier (see conftest)
def test_fuzz_txn_full_matrix_vs_model(spark, tmp_path, ops):
    """Model-based fuzz over the FULL txn-action matrix (round 12,
    extending test_fuzz_txn_log_vs_model): random interleavings of
    MERGE / append / OPTIMIZE / RESTORE / replaceWhere (rewrite and
    pure range delete) / schema evolution / CHECK constraint set+drop /
    SHALLOW CLONE run against both the real log and a pure-Python
    model.  Afterwards: final state == model, every version time
    travels to its model snapshot WITH the right schema (restore rolls
    the schema back with the data), the change feed replays v0 → final
    ON THE ACTIVE TABLE (i.e. across any clone boundary, since a clone
    starts its own log at v0), and every clone SOURCE still reads its
    at-clone snapshot after clone-side writes (zero-copy independence).
    Constraint semantics modeled: ALTER validates the CURRENT snapshot
    (set fails loudly when existing rows violate), and every later
    merge / append / replaceWhere gates its incoming rows."""
    _run_txn_matrix_program(spark, tmp_path, ops)


@pytest.mark.slow
def test_txn_matrix_all_ops_deterministic(spark, tmp_path):
    """The guaranteed-composition program: every op kind fires, in an
    order that stacks evolution, constraints, a clone boundary, and a
    post-clone restore — so the cross-boundary CDF reconstruction and
    the schema-rollback-with-restore paths are exercised on every run,
    independent of what the derandomized fuzz examples draw."""
    ops = [
        ("merge", 3, 1, 50),
        ("set_cap", 200),          # snapshot max val is 50: commits
        ("merge", 2, 0, 500),      # 500 > cap: refused at the gate
        ("evolve", 2),             # adds the extra column
        ("append",),
        ("replace", 4, 9, 120),    # rewrite range [4, 13]
        ("optimize",),
        ("clone",),                # switch to the clone (cap resets)
        ("merge", 2, 1, 777),      # would violate old cap; clone has none
        ("replace_del", 0, 6, 0),  # pure range delete on the clone
        ("restore", 1),            # roll the clone back mid-history
        ("drop_cap",),
        ("merge", 5, 2, -40),
        ("append",),
    ]
    _run_txn_matrix_program(spark, tmp_path, ops)


def _run_txn_matrix_program(spark, tmp_path, ops):
    import uuid as _uuid

    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_snapshot_cdc,
    )
    from imdb_top_250_etl_pipeline_spark.sources.txn import (
        txn_append,
        txn_changes,
        txn_clone,
        txn_drop_constraint,
        txn_optimize,
        txn_replace_where,
        txn_restore,
        txn_set_constraint,
    )

    active = str(tmp_path / f"mx-{_uuid.uuid4().hex[:8]}")

    def mk_df(rows, evolved):
        if evolved:
            return spark.createDataFrame(
                [(k, v, w, e) for k, (v, w, e) in sorted(rows.items())],
                "k long, val long, writer string, extra long",
            )
        return spark.createDataFrame(
            [(k, v, w) for k, (v, w, _e) in sorted(rows.items())],
            "k long, val long, writer string",
        )

    # model row: k -> (val, writer, extra); extra None pre-evolution
    model: dict[int, tuple] = {k: (0, "init", None) for k in range(30)}
    evolved = False
    cap: int | None = None
    txn_create(mk_df(model, evolved), active, key="k", range_partitions=3)
    # history entry per committed version: (evolved_flag, model snapshot)
    history: list[tuple[bool, dict]] = [(False, dict(model))]
    next_key = 1000
    clone_sources: list[tuple[str, dict, bool]] = []
    n_clones = 0

    def gated(val) -> bool:
        return cap is not None and val > cap

    for op in ops:
        if op[0] == "merge":
            _, m, r, val = op
            upd = {
                k: (val, f"m{m}r{r}", model[k][2])
                for k in list(model)
                if k % m == r
            }
            if not upd:
                continue
            stable = ["extra"] if evolved else []
            if gated(val):
                with pytest.raises(ValueError, match="CHECK"):
                    txn_merge(
                        spark, active, mk_df(upd, evolved),
                        ["val", "writer"], stable,
                    )
                continue
            txn_merge(
                spark, active, mk_df(upd, evolved), ["val", "writer"], stable,
            )
            model.update(upd)
            history.append((evolved, dict(model)))
        elif op[0] == "append":
            rows = {
                next_key + i: (-1, "app", (next_key + i) % 7 if evolved else None)
                for i in range(5)
            }
            next_key += 5
            txn_append(mk_df(rows, evolved), active, key="k")
            model.update(rows)
            history.append((evolved, dict(model)))
        elif op[0] == "optimize":
            if txn_optimize(spark, active, target_files=2) >= 0:
                history.append((evolved, dict(model)))
        elif op[0] == "restore":
            idx = op[1] % len(history)
            if history[idx] == (evolved, model):
                continue
            txn_restore(active, idx)
            evolved, model = history[idx][0], dict(history[idx][1])
            history.append((evolved, dict(model)))
        elif op[0] in ("replace", "replace_del"):
            _, lo, width, val = op
            hi = lo + width
            if op[0] == "replace":
                rows = {
                    k: (val, "rw", k % 7 if evolved else None)
                    for k in range(lo, hi + 1)
                    if k % 2 == 0
                }
            else:
                rows = {}
            if rows and gated(val):
                with pytest.raises(ValueError, match="CHECK"):
                    txn_replace_where(
                        spark, active, mk_df(rows, evolved), lo, hi
                    )
                continue
            v = txn_replace_where(
                spark, active, mk_df(rows, evolved) if rows else None, lo, hi
            )
            if v < 0:
                continue  # nothing in range, nothing staged: no commit
            model = {k: t for k, t in model.items() if not lo <= k <= hi}
            model.update(rows)
            history.append((evolved, dict(model)))
        elif op[0] == "evolve":
            if evolved:
                continue
            _, m = op
            upd = {
                k: (model[k][0], model[k][1], k % 7)
                for k in list(model)
                if k % m == 1
            }
            if not upd:
                continue
            txn_merge(
                spark, active, mk_df(upd, True), ["extra"],
                ["val", "writer"],
                allow_schema_evolution=True,
            )
            evolved = True
            model.update(upd)
            model = {
                k: (v, w, e) for k, (v, w, e) in model.items()
            }  # unmatched rows lazily backfill NULL extra
            history.append((True, dict(model)))
        elif op[0] == "set_cap":
            _, c = op
            if any(v > c for v, _w, _e in model.values()):
                with pytest.raises(ValueError, match="CHECK"):
                    txn_set_constraint(spark, active, "val_cap", f"val <= {c}")
                continue
            txn_set_constraint(spark, active, "val_cap", f"val <= {c}")
            cap = c
            history.append((evolved, dict(model)))
        elif op[0] == "drop_cap":
            txn_drop_constraint(active, "val_cap")
            cap = None
            history.append((evolved, dict(model)))
        elif op[0] == "clone":
            if n_clones >= 2:
                continue
            n_clones += 1
            clone_sources.append((active, dict(model), evolved))
            dst = str(tmp_path / f"mx-clone{n_clones}-{_uuid.uuid4().hex[:6]}")
            txn_clone(active, dst)
            active = dst
            cap = None  # clone's fresh log carries no constraint actions
            history = [(evolved, dict(model))]

    def as_set(df):
        has_extra = "extra" in df.columns
        return {
            (r.k, r.val, r.writer, r.extra if has_extra else None)
            for r in df.collect()
        }

    want = {(k, v, w, e) for k, (v, w, e) in model.items()}
    assert as_set(txn_read(spark, active)) == want

    # time travel: every version reproduces its snapshot AND its schema
    assert latest_version(active) == len(history) - 1
    for v, (snap_evolved, snap) in enumerate(history):
        df = txn_read(spark, active, version=v)
        assert ("extra" in df.columns) == snap_evolved, f"v{v} schema"
        assert as_set(df) == {
            (k, val, w, e) for k, (val, w, e) in snap.items()
        }, f"time travel to v{v} diverged"

    # change feed replays the whole program on the active table —
    # across the clone boundary, since the clone's log starts at v0
    state = txn_read(spark, active, version=0)
    if "extra" not in state.columns:
        state = state.withColumn("extra", F.lit(None).cast("long"))
    feed = txn_changes(spark, active, 0)
    for v in range(1, len(history)):
        delta = feed.where(F.col("_commit_version") == v).drop(
            "_commit_version"
        )
        if "extra" not in delta.columns:
            delta = delta.withColumn("extra", F.lit(None).cast("long"))
        state = apply_snapshot_cdc(state, delta, ["k"])
    assert as_set(state) == want

    # clone independence: every source still reads its at-clone snapshot
    for src, src_model, _src_evolved in clone_sources:
        got = as_set(txn_read(spark, src))
        assert got == {
            (k, v, w, e) for k, (v, w, e) in src_model.items()
        }, f"clone source {src} drifted after clone-side writes"
