"""Transaction-log table with real MERGE — the Delta-shaped storage layer.

The reference's Postgres tables get atomicity from the database
(webscraper-postgres.py:199-209 ON CONFLICT inside a transaction); plain
parquet directories have no equivalent, which is why ``operators/etl.py::
upsert`` is documented as "storage atomicity is the table format's job".
No Delta/Iceberg jar ships in this image, so this module supplies the
table-format contract itself, following the *published* Delta log design
(an append-only JSON action log over immutable parquet data files —
Armbrust et al., "Delta Lake: High-Performance ACID Table Storage over
Cloud Object Stores", VLDB 2020):

* ``<table>/_txn_log/{version:020d}.json`` — one newline-delimited-JSON
  commit per version: a ``metaData`` action (schema + merge key), ``add``
  actions carrying per-file key min/max statistics, ``remove`` actions.
  Commits are published with an exclusive hard-link (link(2) fails with
  EEXIST if the version already exists), which is the whole optimistic-
  concurrency protocol: two writers racing to version N+1 — exactly one
  wins, the loser gets :class:`TxnConflictError` and must rebase.
* ``<table>/data/v{N}-*.parquet`` — immutable data files, written once by
  Spark into a staging directory and hard-moved in; never mutated.
* Readers replay the log to a version (time travel) and scan exactly the
  live file set — a crash mid-commit leaves either the old version or the
  new one, never a torn table.

MERGE rewrites only the files whose key range can contain an incoming
key: the file-skipping decision is pure *metadata* (parquet footer
statistics read on the driver, the same place Delta keeps its stats) —
the engine never collects row data to the driver, preserving the
no-collect invariant.  At 100 TB the win is proportional: a merge that
touches 0.1% of the key space rewrites ~0.1% of the files, and the
untouched 99.9% are carried over by reference (byte-identical, zero I/O).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG_DIR = "_txn_log"
_DATA_DIR = "data"


class TxnConflictError(RuntimeError):
    """Another writer committed this version first — rebase and retry."""


def _log_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG_DIR, f"{version:020d}.json")


def latest_version(table: str) -> int:
    """Highest committed version, -1 if the table does not exist yet."""
    try:
        names = os.listdir(os.path.join(table, _LOG_DIR))
    except FileNotFoundError:
        return -1
    vs = [int(n[:-5]) for n in names if n.endswith(".json")]
    return max(vs) if vs else -1


def _commit(table: str, version: int, actions: list[dict]) -> None:
    """Publish one commit file atomically and exclusively.

    Write-to-temp then ``os.link`` to the final name: link(2) is atomic
    and fails with EEXIST when a concurrent writer already published
    this version — the loser's data files stay orphaned in ``data/``
    (harmless; vacuum sweeps them) and the log never shows a torn or
    duplicated version.  On object stores without atomic create, this
    file is what a commit-coordinator service replaces.
    """
    log_dir = os.path.join(table, _LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    tmp = os.path.join(log_dir, f".tmp-{version}-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _log_path(table, version))
    except FileExistsError:
        raise TxnConflictError(
            f"version {version} of {table} was committed concurrently"
        ) from None
    finally:
        os.unlink(tmp)


def _file_key_stats(path: str, key: str):
    """(min, max) of ``key`` across row groups, from the parquet footer.

    Pure metadata — no row is read.  Returns (None, None) when the
    writer emitted no statistics for the column; the caller must treat
    such a file as overlapping every key range (skip nothing that could
    match, the same conservative rule Delta applies to stats-less
    files)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[key]
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None, None
        mn, mx = st.min, st.max
        if isinstance(mn, bytes):
            mn, mx = mn.decode(), mx.decode()
        if not isinstance(mn, (int, float, str)):
            # date/timestamp stats: ISO strings order lexicographically,
            # and both sides of every comparison go through this same
            # normalization, so range overlap stays correct
            mn, mx = str(mn), str(mx)
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    return lo, hi


def _stage_and_place(
    df: DataFrame,
    table: str,
    version: int,
    key: str,
    range_partitions: int | None,
) -> list[dict]:
    """Write ``df`` via Spark into a staging dir, move the parts into
    ``data/`` under version-prefixed names, and return their ``add``
    actions with footer key statistics.

    ``range_partitions`` range-partitions and sorts by the key first so
    data files carry *disjoint* key ranges — that layout is what makes
    MERGE's file skipping selective (files clustered on the merge key
    are exactly Delta's OPTIMIZE ZORDER / liquid-clustering advice).
    """
    stage = os.path.join(table, f"_stage-{uuid.uuid4().hex}")
    out = df
    if range_partitions:
        out = out.repartitionByRange(range_partitions, F.col(key)).sortWithinPartitions(key)
    out.write.parquet(stage)
    data_dir = os.path.join(table, _DATA_DIR)
    os.makedirs(data_dir, exist_ok=True)
    adds = []
    try:
        parts = sorted(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        for i, part in enumerate(parts):
            rel = os.path.join(_DATA_DIR, f"v{version}-{i:05d}-{uuid.uuid4().hex[:8]}.parquet")
            os.replace(os.path.join(stage, part), os.path.join(table, rel))
            lo, hi = _file_key_stats(os.path.join(table, rel), key)
            adds.append({"add": {"path": rel, "min_key": lo, "max_key": hi}})
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return adds


def txn_create(
    df: DataFrame,
    table: str,
    key: str,
    range_partitions: int | None = None,
) -> int:
    """Create a transactional table at version 0 from ``df``.

    ``key`` is the table's merge key (recorded in metaData; every later
    merge uses it for file skipping).  Fails if the table already has a
    committed version — there is no implicit overwrite."""
    if latest_version(table) >= 0:
        raise FileExistsError(f"{table} already has a committed version")
    os.makedirs(table, exist_ok=True)
    adds = _stage_and_place(df, table, 0, key, range_partitions)
    meta = {"metaData": {"schema": df.schema.json(), "key": key}}
    _commit(table, 0, [meta] + adds)
    return 0


def last_txn_version(table: str, app_id: str) -> int:
    """Highest application-transaction version committed under
    ``app_id`` (the Delta ``txn`` action protocol: each idempotent
    writer stamps its commits with (appId, version)), -1 if none.

    One pass over the log — log files are tiny JSON manifests, and the
    production analogue snapshots this from the checkpointed log state
    rather than re-listing."""
    head = latest_version(table)
    last = -1
    for i in range(head + 1):
        with open(_log_path(table, i)) as f:
            for line in f:
                a = json.loads(line)
                t = a.get("txn")
                if t and t.get("appId") == app_id:
                    last = max(last, int(t["version"]))
    return last


def txn_append(
    df: DataFrame,
    table: str,
    key: str,
    app_txn: tuple[str, int] | None = None,
    range_partitions: int | None = None,
) -> int | None:
    """Append-only commit; creates the table (metaData at the appended
    version) if it does not exist yet.

    With ``app_txn=(app_id, version)`` the append is IDEMPOTENT: if the
    log already records a ``txn`` action for ``app_id`` at or past
    ``version``, nothing is written and None is returned — the
    exactly-once handshake a replayed streaming microbatch needs.  The
    check-then-commit race is closed by the atomic commit itself: on an
    optimistic-concurrency conflict the txn watermark is re-read before
    retrying, so a concurrent retry of the SAME batch wins exactly once
    (the loser's staged files stay orphaned for vacuum, like any losing
    writer).  Appends conflict with nothing semantically, so retries
    only ever re-number the commit.

    Returns the committed log version, or None when skipped."""
    app_id, bver = app_txn if app_txn else (None, -1)
    if app_id is not None and last_txn_version(table, app_id) >= bver:
        return None
    os.makedirs(table, exist_ok=True)
    head = latest_version(table)
    if head >= 0:
        _enforce_constraints(df, txn_constraints(table))
    adds = _stage_and_place(df, table, head + 1, key, range_partitions)
    while True:
        head = latest_version(table)
        actions: list[dict] = []
        if head < 0:
            actions.append(
                {"metaData": {"schema": df.schema.json(), "key": key}}
            )
        if app_id is not None:
            actions.append({"txn": {"appId": app_id, "version": bver}})
        try:
            _commit(table, head + 1, actions + adds)
            return head + 1
        except TxnConflictError:
            if (
                app_id is not None
                and last_txn_version(table, app_id) >= bver
            ):
                return None  # a concurrent retry of this batch won


def snapshot(table: str, version: int | None = None):
    """Replay the log to ``version`` (default: latest).

    Returns (version, schema_json, key, live) where ``live`` maps each
    live relative file path to its {min_key, max_key} stats."""
    head = latest_version(table)
    if head < 0:
        raise FileNotFoundError(f"no committed version under {table}")
    v = head if version is None else version
    if v < 0 or v > head:
        raise ValueError(f"version {v} not in [0, {head}]")
    schema_json = table_key = None
    live: dict[str, dict] = {}
    for i in range(v + 1):
        with open(_log_path(table, i)) as f:
            for line in f:
                a = json.loads(line)
                if "metaData" in a:
                    schema_json = a["metaData"]["schema"]
                    table_key = a["metaData"]["key"]
                elif "add" in a:
                    live[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
    return v, schema_json, table_key, live


def txn_read(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Scan a committed snapshot (latest by default — time travel via
    ``version``).  The scan is pinned to the snapshot's exact file list,
    so concurrent commits never smear into a running read."""
    _v, schema_json, _key, live = snapshot(table, version)
    schema = T.StructType.fromJson(json.loads(schema_json))
    if not live:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table, rel) for rel in sorted(live)]
    return spark.read.schema(schema).parquet(*paths)


def _overlaps(file_stats: dict, ranges: list[tuple]) -> bool:
    lo, hi = file_stats.get("min_key"), file_stats.get("max_key")
    if lo is None or hi is None:
        return True  # stats-less file: conservatively rewrite
    for rlo, rhi in ranges:
        if rlo is None or rhi is None or (lo <= rhi and hi >= rlo):
            return True
    return False


def txn_merge(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    update_cols: list[str],
    stable_cols: list[str],
    range_partitions: int | None = None,
    allow_schema_evolution: bool = False,
) -> int:
    """MERGE ``updates`` into the table: matched keys take the incoming
    dynamic columns (EXCLUDED.* semantics, incoming NULLs win), unmatched
    keys insert — the relational semantics of ``operators/etl.py::
    upsert``, with this module supplying what that docstring delegates to
    the table format: snapshot isolation, atomic commit, and
    stats-driven file skipping.

    Only data files whose [min_key, max_key] intersects some staged
    update file's key range are read and rewritten; every other live
    file is carried into the new version untouched (same bytes, same
    path — zero I/O).  The updates are staged through parquet *first* so
    their key ranges come from footers like everything else; at scale
    that staging write is also what makes the merge restartable.
    """
    from ..operators.etl import upsert

    base_version, schema_json, key, live = snapshot(table)
    schema = T.StructType.fromJson(json.loads(schema_json))
    table_cols = {f.name for f in schema.fields}
    extra = [c for c in updates.columns if c not in table_cols]
    missing = table_cols - set(updates.columns)
    if missing:
        raise ValueError(
            f"updates lack table columns {sorted(missing)} — MERGE "
            "sources must carry full rows"
        )
    if extra and not allow_schema_evolution:
        raise ValueError(
            f"updates add columns {extra}; pass "
            "allow_schema_evolution=True to evolve the table schema"
        )
    evolved = bool(extra)
    if evolved:
        # Delta mergeSchema semantics: new columns append as nullable;
        # live files are untouched — a parquet scan with the evolved
        # schema reads the absent column as NULL, so historical rows
        # backfill lazily and file skipping stats stay valid.  The new
        # commit's metaData action carries the evolved schema (replay
        # keeps the latest), and time travel to an older version still
        # reads that version's schema.
        upd_schema = {f.name: f for f in updates.schema.fields}
        schema = T.StructType(
            list(schema.fields)
            + [
                T.StructField(c, upd_schema[c].dataType, True)
                for c in extra
            ]
        )
    _enforce_constraints(updates, txn_constraints(table))
    new_version = base_version + 1
    staged = _stage_and_place(
        updates.select(*[f.name for f in schema.fields]),
        table,
        new_version,
        key,
        range_partitions,
    )
    if not staged:
        raise ValueError("updates produced no data files (empty input?)")
    upd_ranges = [
        (a["add"]["min_key"], a["add"]["max_key"]) for a in staged
    ]
    touched = {
        rel for rel, st in live.items() if _overlaps(st, upd_ranges)
    }
    upd_df = spark.read.schema(schema).parquet(
        *[os.path.join(table, a["add"]["path"]) for a in staged]
    )
    if touched:
        existing = spark.read.schema(schema).parquet(
            *[os.path.join(table, rel) for rel in sorted(touched)]
        )
        merged = upsert(existing, upd_df, key, update_cols, stable_cols)
    else:
        merged = upd_df  # pure insert: no live file can contain these keys
    adds = _stage_and_place(merged, table, new_version, key, range_partitions)
    removes = [{"remove": {"path": rel}} for rel in sorted(touched)] + [
        {"remove": {"path": a["add"]["path"]}} for a in staged
    ]
    # the staged update files were added to data/ for footer stats and
    # restartability but are not part of the new snapshot: committed as
    # add+remove in the same version so vacuum reclaims them
    meta = (
        [{"metaData": {"schema": schema.json(), "key": key}}]
        if evolved
        else []
    )
    _commit(table, new_version, meta + staged + adds + removes)
    return new_version


def txn_history(table: str) -> list[dict]:
    """One summary row per commit: version, files added/removed."""
    out = []
    for v in range(latest_version(table) + 1):
        adds = removes = 0
        with open(_log_path(table, v)) as f:
            for line in f:
                a = json.loads(line)
                adds += "add" in a
                removes += "remove" in a
        out.append({"version": v, "adds": adds, "removes": removes})
    return out


def txn_vacuum(table: str, retain_versions: int = 1) -> int:
    """Delete data files referenced only by versions older than the last
    ``retain_versions`` snapshots.  Returns the number of files removed.

    Time travel to a vacuumed version then fails at scan time (the files
    are gone) — the retention/time-travel tradeoff every log-structured
    table format has."""
    head = latest_version(table)
    keep: set[str] = set()
    for v in range(max(0, head - retain_versions + 1), head + 1):
        keep.update(snapshot(table, v)[3])
    removed = 0
    data_dir = os.path.join(table, _DATA_DIR)
    for f in os.listdir(data_dir) if os.path.isdir(data_dir) else []:
        rel = os.path.join(_DATA_DIR, f)
        if f.endswith(".parquet") and rel not in keep:
            os.remove(os.path.join(table, rel))
            removed += 1
    return removed


def txn_constraints(table: str, version: int | None = None) -> dict[str, str]:
    """CHECK constraints in effect at ``version`` (default head), as
    {name: sql_expr} — replayed from the log's constraint /
    dropConstraint actions like any other metadata."""
    head = latest_version(table)
    v = head if version is None else version
    cons: dict[str, str] = {}
    for i in range(v + 1):
        with open(_log_path(table, i)) as f:
            for line in f:
                a = json.loads(line)
                if "constraint" in a:
                    cons[a["constraint"]["name"]] = a["constraint"]["expr"]
                elif "dropConstraint" in a:
                    cons.pop(a["dropConstraint"]["name"], None)
    return cons


def _enforce_constraints(df: DataFrame, cons: dict[str, str]) -> None:
    """Reject a write whose rows violate any CHECK constraint.

    SQL-standard CHECK semantics: a NULL predicate PASSES (only an
    explicit FALSE violates) — coalesce(expr, true).  One
    short-circuiting isEmpty probe over the incoming rows per
    constraint (constraints are few; writes already run eager staging
    jobs, so the cost is a bounded re-scan of the delta, never of the
    table — the replaceWhere range-validation discipline, no driver
    collect)."""
    bad = [
        name
        for name, expr in sorted(cons.items())
        if not df.where(~F.coalesce(F.expr(expr), F.lit(True))).isEmpty()
    ]
    if bad:
        detail = ", ".join(f"{n} [{cons[n]}]" for n in bad)
        raise ValueError(f"CHECK constraint violation — {detail}")


def txn_set_constraint(
    spark: SparkSession, table: str, name: str, expr: str
) -> int:
    """ADD CONSTRAINT ``name`` CHECK (``expr``): validates the CURRENT
    snapshot first (a constraint that existing data already violates
    must fail at ALTER time, not silently gate future writes), then
    commits a ``constraint`` action — every later merge / append /
    replaceWhere validates its incoming rows against it before
    committing.  Returns the new head version."""
    _enforce_constraints(txn_read(spark, table), {name: expr})
    while True:
        head = latest_version(table)
        try:
            _commit(
                table, head + 1,
                [{"constraint": {"name": name, "expr": expr}}],
            )
            return head + 1
        except TxnConflictError:
            continue


def txn_drop_constraint(table: str, name: str) -> int:
    """DROP CONSTRAINT: later writes stop validating ``name``."""
    while True:
        head = latest_version(table)
        try:
            _commit(table, head + 1, [{"dropConstraint": {"name": name}}])
            return head + 1
        except TxnConflictError:
            continue


def txn_restore(table: str, version: int) -> int:
    """RESTORE: commit a rollback to snapshot ``version`` — the live
    file set becomes exactly that snapshot's, as a NEW commit (history
    is append-only; nothing is rewritten or deleted, so the restore is
    itself time-travelable and shows up in the change data feed as the
    row-level diff).  Fails if vacuum already dropped a file the target
    snapshot needs — the retention/time-travel tradeoff, surfaced
    before committing rather than at scan time.

    Returns the new head version."""
    head = latest_version(table)
    _v, schema_json, _key, live_target = snapshot(table, version)
    for rel in live_target:
        if not os.path.exists(os.path.join(table, rel)):
            raise FileNotFoundError(
                f"cannot RESTORE {table} to v{version}: {rel} was vacuumed"
            )
    while True:
        head = latest_version(table)
        _hv, head_schema, _hk, live_head = snapshot(table, head)
        actions: list[dict] = []
        if head_schema != schema_json:
            # roll the schema back with the data (metaData is replayed
            # in-order, so the restore commit's wins from here on)
            actions.append(
                {"metaData": {"schema": schema_json, "key": _key}}
            )
        actions += [
            {"remove": {"path": p}} for p in sorted(live_head)
            if p not in live_target
        ]
        actions += [
            {"add": live_target[p]} for p in sorted(live_target)
            if p not in live_head
        ]
        try:
            _commit(table, head + 1, actions)
            return head + 1
        except TxnConflictError:
            continue  # re-diff against the new head and retry


def txn_clone(src_table: str, dst_table: str) -> int:
    """SHALLOW CLONE: create ``dst_table`` at version 0 referencing the
    SOURCE's current data files by relative path — a zero-copy
    branch of the table (dev/test sandboxes, experiment snapshots).
    The clone has its own independent log: merges/appends on either
    side never touch the other's files (new files land in each table's
    own data dir), and vacuuming the CLONE never deletes source files
    (vacuum only sweeps the table's own data dir).  Caveat, same as
    Delta's: vacuuming the SOURCE can drop files the clone still
    references — retain the source or deep-copy before vacuum."""
    if latest_version(dst_table) >= 0:
        raise FileExistsError(f"{dst_table} already has a committed version")
    _v, schema_json, key, live = snapshot(src_table)
    os.makedirs(dst_table, exist_ok=True)
    actions: list[dict] = [
        {"metaData": {"schema": schema_json, "key": key}}
    ]
    for rel in sorted(live):
        stats = dict(live[rel])
        stats["path"] = os.path.relpath(
            os.path.join(src_table, rel), dst_table
        )
        actions.append({"add": stats})
    _commit(dst_table, 0, actions)
    return 0


def txn_changes(
    spark: SparkSession,
    table: str,
    v_from: int,
    v_to: int | None = None,
) -> DataFrame:
    """Change data feed: the row-level I/U/D changes each commit in
    (``v_from``, ``v_to``] applied, tagged with ``_commit_version`` —
    the table_changes() surface downstream incremental consumers read
    instead of re-diffing full snapshots.

    Per commit, only the files that commit REWROTE are read: the
    change set is ``snapshot_cdc(removed-files rows, added-files
    rows)`` keyed on the table's merge key, so rows merely copied
    along in a rewrite cancel out and the work is bounded by the
    commit's rewrite volume, never the table size (the log-structured
    analogue of Delta's CDF; a full-snapshot diff per version would
    read the whole table per commit).

    Applying the feed in version order onto the ``v_from`` snapshot
    reconstructs the ``v_to`` snapshot exactly (property-tested via
    apply_snapshot_cdc).

    Schema evolution inside the range is handled the way Delta CDF
    handles it: every commit's files are read self-described (parquet
    footers, ``mergeSchema``) and projected through the END-of-range
    (``v_to``) schema, so the evolving commit's own change rows survive
    in the feed — columns added mid-range read as NULL for
    pre-evolution commits, columns dropped mid-range are omitted
    throughout.  A merge-KEY change inside the range is refused (the
    feed is keyed on one merge key; no projection can reconcile two),
    and so is a column-TYPE change: projecting an old type through the
    end schema's cast() would silently NULL incompatible values
    (string→long under non-ANSI cast) — corrupting the feed — exactly
    the evolution Delta itself refuses.  Only ADDITIVE evolution (new
    nullable columns / dropped columns) flows through.
    """
    from ..operators.etl import snapshot_cdc

    head = latest_version(table)
    v_to = head if v_to is None else v_to
    if not (0 <= v_from <= v_to <= head):
        raise ValueError(f"bad version range ({v_from}, {v_to}] vs head {head}")
    # project the whole feed through the END schema (Delta CDF reads
    # change data with the latest/end schema, not the start schema)
    _, schema_json, key, _ = snapshot(table, v_to)
    schema = T.StructType.fromJson(json.loads(schema_json))
    # the key at the START of the range — a mid-range metaData whose
    # key differs from this is a re-keying commit (the end-of-range key
    # would already reflect the change and mask it)
    _, schema_json_start, key_start, _ = snapshot(table, v_from)

    end_types = {f.name: f.dataType for f in schema.fields}

    def _guard_types(schema_json_v: str, v: int) -> None:
        # every schema state files in the range were written under must
        # be castable to the end schema WITHOUT changing a common
        # column's type: non-ANSI cast() silently NULLs incompatible
        # values and mergeSchema throws an opaque conflict — refuse
        # with the same split guidance as the merge-key guard instead
        for f in T.StructType.fromJson(json.loads(schema_json_v)).fields:
            end_t = end_types.get(f.name)
            if end_t is not None and f.dataType != end_t:
                raise ValueError(
                    f"column '{f.name}' changes type inside change range "
                    f"({v_from}, {v_to}]: {f.dataType.simpleString()} at "
                    f"version {v} vs {end_t.simpleString()} at version "
                    f"{v_to}; casting the older commits' change rows "
                    f"through the end schema would silently corrupt them "
                    f"(Delta refuses non-additive type evolution) — read "
                    f"the sub-ranges on either side of the evolving "
                    f"commit separately and reconcile it via snapshot "
                    f"diff"
                )

    _guard_types(schema_json_start, v_from)

    def _read(rels: list[str]) -> DataFrame:
        if not rels:
            return spark.createDataFrame([], schema)
        # files inside the range may predate a mid-range schema
        # evolution: read them self-described and align to the end
        # schema (missing columns -> typed NULL, extra columns dropped)
        df = (
            spark.read.option("mergeSchema", "true")
            .parquet(*[os.path.join(table, r) for r in sorted(rels)])
        )
        have = set(df.columns)
        return df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )

    # scan EVERY commit's log (and run both guards) before reading any
    # file: a type change at version N also corrupts the projection of
    # versions < N, so no part of the feed may build until the whole
    # range is known representable
    per_commit: list[tuple[int, set, set]] = []
    for v in range(v_from + 1, v_to + 1):
        adds, removes = set(), set()
        with open(_log_path(table, v)) as f:
            for line in f:
                a = json.loads(line)
                if "add" in a:
                    adds.add(a["add"]["path"])
                elif "remove" in a:
                    removes.add(a["remove"]["path"])
                elif "metaData" in a:
                    if a["metaData"].get("key") != key_start:
                        # schema evolution is projected through the end
                        # schema above, but a merge-KEY change cannot
                        # be: the feed's I/U/D classification is keyed
                        # on one column, and commits on either side of
                        # the change diff on different keys.
                        raise ValueError(
                            f"merge key changed at version {v} inside "
                            f"change range ({v_from}, {v_to}]: commit "
                            f"{v}'s changes are keyed differently and "
                            f"cannot appear in a single feed; read "
                            f"({v_from}, {v - 1}] and ({v}, {v_to}] "
                            f"separately and reconcile commit {v} via "
                            f"snapshot diff"
                        )
                    _guard_types(a["metaData"]["schema"], v)
        per_commit.append((v, adds, removes))

    out: DataFrame | None = None
    for v, adds, removes in per_commit:
        # a multi-pass merge may stage a file and replace it WITHIN the
        # same commit (add then remove): only the NET file delta is the
        # commit's rewrite
        cdc = snapshot_cdc(
            _read(sorted(removes - adds)), _read(sorted(adds - removes)),
            [key],
        ).withColumn("_commit_version", F.lit(v).cast("int"))
        out = cdc if out is None else out.unionByName(cdc)
    if out is None:
        payload = [f.name for f in schema.fields if f.name != key]
        return (
            spark.createDataFrame([], schema)
            .select(key, F.lit("").cast("string").alias("op"), *payload)
            .withColumn("_commit_version", F.lit(0).cast("int"))
            .where(F.lit(False))
        )
    return out


def txn_optimize(
    spark: SparkSession,
    table: str,
    target_files: int | None = None,
    small_file_bytes: int = 32 * 1024 * 1024,
) -> int:
    """OPTIMIZE: compact the current snapshot's small files into fewer,
    key-clustered ones in ONE atomic commit — content is untouched, so
    a concurrent reader pinned to any version sees identical rows and
    subsequent MERGEs skip better (fresh disjoint key ranges).

    Files at or above ``small_file_bytes`` are left alone (rewriting
    already-compact files is wasted I/O — Delta's OPTIMIZE applies the
    same bin threshold); the small ones are read once, range-
    repartitioned on the table key into ``target_files`` outputs
    (default: enough to average the threshold size), and committed as
    adds + removes.  Commits through the same exclusive-link protocol
    as MERGE, so racing writers conflict instead of losing files.
    Returns the new version, or -1 when nothing needed compacting
    (no empty commits).  Change-data-feed consumers see an EMPTY
    change set for an optimize commit by construction: txn_changes
    diffs removed-file rows against added-file rows and identical
    content cancels out — compaction is invisible to downstream
    incremental consumers, exactly as it should be.
    """
    head = latest_version(table)
    if head < 0:
        raise FileNotFoundError(f"no committed version under {table}")
    _, schema_json, key, live = snapshot(table)
    small = [
        rel
        for rel in sorted(live)
        if os.path.getsize(os.path.join(table, rel)) < small_file_bytes
    ]
    if target_files is None:
        total = sum(
            os.path.getsize(os.path.join(table, rel)) for rel in small
        )
        target_files = max(1, total // small_file_bytes)
    # compacting N files into >= N outputs achieves nothing: no empty
    # (or useless) commits — this is also what makes OPTIMIZE idempotent
    if len(small) <= target_files:
        return -1
    schema = T.StructType.fromJson(json.loads(schema_json))
    df = spark.read.schema(schema).parquet(
        *[os.path.join(table, rel) for rel in small]
    )
    version = head + 1
    adds = _stage_and_place(df, table, version, key, int(target_files))
    removes = [{"remove": {"path": rel}} for rel in small]
    _commit(table, version, adds + removes)
    return version


def txn_replace_where(
    spark: SparkSession,
    table: str,
    df: DataFrame | None,
    key_lo,
    key_hi,
    range_partitions: int | None = None,
) -> int:
    """replaceWhere: atomically replace every row whose merge key lies
    in [``key_lo``, ``key_hi``] with ``df`` (``None`` → pure range
    delete) — Delta's ``option("replaceWhere", ...)`` partition/range
    overwrite, the idempotent backfill primitive ("regenerate this
    day/shard") that MERGE cannot express (MERGE never deletes rows
    absent from the update set).

    The predicate is a key RANGE on purpose: this table clusters data
    files by merge-key range, so the predicate is decidable per file
    from footer stats alone — files fully inside the range drop with
    ZERO I/O, files fully outside carry over by reference (zero I/O),
    and only boundary-straddling files are read and rewritten keeping
    their outside-range rows.  An arbitrary-predicate overwrite would
    have to read every file; a range is what the stats model actually
    prunes (Delta's replaceWhere on a partition column is the same
    restriction in partition-column form).

    Incoming rows are validated against the range (Delta's replaceWhere
    constraint): any row outside [lo, hi] raises before anything is
    staged — validation is one short-circuiting ``isEmpty`` action,
    no driver-side row collection.  Change-feed consumers see exactly
    the replaced rows as D (or U when reinserted) and the new rows as
    I, because txn_changes diffs the commit's net rewritten files.

    Returns the new version.  Commits through the same exclusive-link
    protocol as MERGE — racing writers conflict, never interleave.
    """
    base_version, schema_json, key, live = snapshot(table)
    schema = T.StructType.fromJson(json.loads(schema_json))
    new_version = base_version + 1
    staged: list[dict] = []
    if df is not None:
        missing = {f.name for f in schema.fields} - set(df.columns)
        if missing:
            raise ValueError(
                f"replacement rows lack table columns {sorted(missing)}"
            )
        _enforce_constraints(df, txn_constraints(table))
        outside = df.where(
            (F.col(key) < F.lit(key_lo))
            | (F.col(key) > F.lit(key_hi))
            | F.col(key).isNull()
        )
        if not outside.isEmpty():
            raise ValueError(
                f"replacement rows fall outside {key} range "
                f"[{key_lo}, {key_hi}] — replaceWhere data must satisfy "
                "its own predicate"
            )
        staged = _stage_and_place(
            df.select(*[f.name for f in schema.fields]),
            table,
            new_version,
            key,
            range_partitions,
        )
    # classify live files by footer stats alone: no data file is read
    # unless it straddles the range boundary
    inside, straddle = [], []
    for rel in sorted(live):
        lo, hi = live[rel].get("min_key"), live[rel].get("max_key")
        if lo is None or hi is None:
            straddle.append(rel)  # stats-less: conservatively rewrite
        elif lo >= key_lo and hi <= key_hi:
            inside.append(rel)
        elif hi < key_lo or lo > key_hi:
            continue  # disjoint: carried over by reference
        else:
            straddle.append(rel)
    adds = list(staged)
    if straddle:
        keep = (
            spark.read.schema(schema)
            .parquet(*[os.path.join(table, rel) for rel in straddle])
            .where(
                (F.col(key) < F.lit(key_lo)) | (F.col(key) > F.lit(key_hi))
            )
        )
        adds += _stage_and_place(
            keep, table, new_version, key, range_partitions
        )
    removes = [
        {"remove": {"path": rel}} for rel in inside + sorted(straddle)
    ]
    if not adds and not removes:
        return -1  # nothing in range, nothing to write: no empty commits
    _commit(table, new_version, adds + removes)
    return new_version


def consume_changes(
    spark: SparkSession,
    table: str,
    cursor_path: str,
) -> tuple[DataFrame, int, int]:
    """Incremental change consumption with a durable cursor — the
    batch form of a streaming CDF subscription (Delta's
    ``startingVersion`` pattern): each call returns the change feed
    for every version committed since the last call, plus the
    (from, to] version range it covers.  Call ``advance_cursor`` with
    the returned ``to`` AFTER the downstream write commits — advancing
    only on success is what makes re-runs after a failure replay the
    same batch instead of dropping it (at-least-once, and exactly-once
    when the downstream apply is idempotent, e.g. apply_snapshot_cdc
    or MERGE on the key).

    The cursor is one integer in a file (atomic rename on write); the
    change set per call is bounded by the commits' rewrite volume via
    txn_changes, never the table.
    """
    head = latest_version(table)
    if not os.path.exists(cursor_path):
        # fresh subscription: the version-0 snapshot itself is consumed
        # as inserts, then the feed of every later commit
        base = txn_read(spark, table, version=0)
        key = snapshot(table, 0)[2]
        payload = [c for c in base.columns if c != key]
        initial = base.select(
            key,
            F.lit("I").alias("op"),
            *payload,
            F.lit(0).cast("int").alias("_commit_version"),
        )
        return initial.unionByName(txn_changes(spark, table, 0, head)), -1, head
    with open(cursor_path) as f:
        v_from = int(f.read().strip())
    return txn_changes(spark, table, v_from, head), v_from, head


def advance_cursor(cursor_path: str, to_version: int) -> None:
    """Persist the consumption cursor atomically (write + rename)."""
    tmp = f"{cursor_path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(str(to_version))
    os.replace(tmp, cursor_path)


def txn_schema_history(table: str) -> list[dict]:
    """Schema evolution audit from the log alone (no data read): one
    entry per version that committed a metaData action, with the
    columns added/removed/retyped relative to the previous schema —
    the drift report a platform team reviews before a breaking
    consumer deploy."""
    head = latest_version(table)
    out: list[dict] = []
    prev: dict[str, str] = {}
    for v in range(head + 1):
        with open(_log_path(table, v)) as f:
            for line in f:
                a = json.loads(line)
                if "metaData" not in a:
                    continue
                fields = {
                    fld["name"]: json.dumps(fld["type"], sort_keys=True)
                    for fld in json.loads(a["metaData"]["schema"])["fields"]
                }
                out.append(
                    {
                        "version": v,
                        "added": sorted(set(fields) - set(prev)),
                        "removed": sorted(set(prev) - set(fields)),
                        "retyped": sorted(
                            n
                            for n in set(fields) & set(prev)
                            if fields[n] != prev[n]
                        ),
                    }
                )
                prev = fields
    return out
