"""Write sinks — SURVEY §2.1 S4 (DDL/table creation) and the persistence
half of S5/S6.

The reference creates five Postgres tables with raw DDL and writes them
row-by-row (webscraper-postgres.py:109-144, :156-161, :190-222).  Spark's
equivalent is a set-oriented ``df.write`` into a partitioned columnar
layout; table formats with real MERGE (Delta/Iceberg) drop into the same
call sites.  At 100 TB the decisions that matter are here: partition
columns (prune on read), file sizing (maxRecordsPerFile vs small-file
explosion), and mode semantics (append vs overwrite vs dynamic partition
overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """S4: persist a DataFrame as a (optionally partitioned) parquet table.

    ``partition_by`` buys partition pruning for every downstream read
    that filters on those columns; ``max_records_per_file`` bounds file
    size so a 1000-executor write neither emits 10⁶ tiny files (use
    coalesce/AQE) nor single multi-GB files.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    """Companion scan for a write_parquet output (schema from footers —
    the engine's own layout, unlike fixture reads which assert schemas)."""
    return spark.read.parquet(path)


def roundtrip_materialized(df: DataFrame, path: str, **write_kwargs) -> DataFrame:
    """Write → read-back → eager localCheckpoint, then the path is
    disposable: the returned DataFrame no longer references the files.

    Exists so a registered query can exercise the full sink+scan cycle
    and still hand the driver a self-contained result.
    """
    write_parquet(df, path, **write_kwargs)
    spark = df.sparkSession
    from ..operators.pinning import eager_pin

    return eager_pin(read_back(spark, path))


def create_table(
    spark: SparkSession, name: str, columns_ddl: str, partition_by: str | None = None
) -> None:
    """S4 catalog DDL: ``CREATE TABLE IF NOT EXISTS ... USING parquet``.

    The managed-table form of the reference's five CREATE TABLE
    statements (webscraper-postgres.py:109-144): the catalog owns the
    location (spark.sql.warehouse.dir) and the schema is declared, not
    inferred.  Idempotent like the reference's IF NOT EXISTS.
    """
    part = f" PARTITIONED BY ({partition_by})" if partition_by else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({columns_ddl}) USING parquet{part}"
    )


def insert_into(df: DataFrame, name: str, overwrite: bool = False) -> None:
    """Set-oriented load into an existing catalog table (positional
    column resolution — the caller selects columns in DDL order), the
    batch replacement for the reference's per-row INSERT loops."""
    df.write.insertInto(name, overwrite=overwrite)


def save_as_table(df: DataFrame, name: str, mode: str = "overwrite") -> None:
    """CTAS-style managed-table write (schema from the DataFrame)."""
    df.write.mode(mode).saveAsTable(name)


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    isolation_level: str = "READ_COMMITTED",
    **options,
) -> None:
    """JDBC table write — the load half of the reference's Postgres sink
    (webscraper-postgres.py:156-161, 190-222: per-row INSERTs inside
    iterrows loops; here one batched write per partition).

    Executable here against embedded Derby (catalog.DERBY_EMBEDDED_DRIVER
    — tests/test_jdbc.py and the sink_jdbc_roundtrip battery drive a full
    write→read-back); external engines need their driver jar.  The knobs
    that matter at scale: ``batchsize`` (rows per round-trip — the 40-400×
    win over row-at-a-time), ``num_partitions`` (concurrent connections;
    coalesce first so a 1000-task stage doesn't open 1000 connections),
    ``isolation_level`` (NONE for bulk loads on quiesced tables).
    Upsert semantics (ON CONFLICT) are NOT expressible through the plain
    JDBC writer — apply operators/etl.py::upsert first and write the
    merged result, or land into a staging table and MERGE server-side.
    """
    out = df.coalesce(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", isolation_level)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on its join
    key — the pay-the-shuffle-once layout for joins and aggregations
    that repeat.

    Two tables bucketed on their join key with the SAME bucket count
    sort-merge-join with ZERO exchanges, and a groupBy on the bucket key
    aggregates without a shuffle (both plan-pinned in
    tests/test_plan_shapes.py and the join_scale_battery): the
    partitioning was paid at write time and amortizes over every
    subsequent consumer.  ``sort_cols`` additionally sorts within each
    bucket file so the SMJ's sort is already satisfied on read.

    Bucketing metadata lives in the session catalog (saveAsTable with an
    explicit ``path``: external table, data survives DROP TABLE) — plain
    ``read_back`` on the path sees ordinary parquet and ignores the
    layout, so readers that want the shuffle-free plans must go through
    ``spark.table(name)``.  At production scale the catalog is Hive/
    Unity/Glue and ``n_buckets`` is sized so one bucket ≈ one task's
    memory at the LARGEST consumer (too few buckets caps parallelism —
    buckets are not splittable for the co-located plans).
    """
    writer = df.write.mode(mode).option("path", path).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-aware write: sort within partitions before writing so
    parquet row-group min/max statistics become selective on
    ``sort_cols`` — scans filtering on those columns skip whole row
    groups (the poor man's clustering/Z-order; for multi-column skip
    patterns interleave a computed key).  One extra local sort per task,
    no shuffle beyond what ``partition_by`` needs.
    """
    w = df.sortWithinPartitions(*sort_cols).write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet dir into ceil(size /
    target_bytes) files.  Returns the output file count.

    The classic maintenance job — streaming sinks and over-parallel
    writes leave thousands of tiny files whose per-file open/footer cost
    dominates scans.  Sizing comes from the filesystem listing (cheap
    metadata), the rewrite is one narrow repartition job, and the
    original data is deleted only AFTER the compacted copy is fully
    written to a sibling temp directory and swapped in (write-then-
    rename, the write_versioned discipline) — a failure at any point
    leaves either the old table or the new one, never neither
    (delete-before-write would lose the table if the rewrite failed,
    since localCheckpoint blocks are executor-local and unreplicated).
    On object stores, prefer table-format compaction (Iceberg
    rewrite_data_files / Delta OPTIMIZE) — same shape, with snapshot
    isolation on top.
    """
    import math
    import os
    import shutil

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_bytes))
    tmp_path = path.rstrip("/") + "._compact_tmp"
    shutil.rmtree(tmp_path, ignore_errors=True)
    spark.read.parquet(path).repartition(n_files).write.parquet(tmp_path)
    old_path = path.rstrip("/") + "._compact_old"
    shutil.rmtree(old_path, ignore_errors=True)
    os.replace(path, old_path)
    os.replace(tmp_path, path)
    shutil.rmtree(old_path)
    return n_files


def write_versioned(df: DataFrame, path: str) -> int:
    """Minimal versioned table: write a new immutable snapshot directory
    ``path/v=<n>``, then atomically repoint ``path/_LATEST``.

    The poor-man's table format: readers that resolve the pointer before
    a writer finishes keep reading the previous snapshot — a crash
    mid-write leaves an orphan directory, never a torn table (the
    overwrite-in-place gap of plain parquet MERGE targets).  The pointer
    flip is tmp-write + rename, atomic on POSIX filesystems; object
    stores without atomic rename are exactly where Delta/Iceberg's
    log-based commit replaces this file.  Returns the new version.
    """
    import os

    os.makedirs(path, exist_ok=True)
    current = read_versioned_pointer(path)
    version = current + 1
    df.write.mode("errorifexists").parquet(os.path.join(path, f"v={version}"))
    tmp = os.path.join(path, "_LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(path, "_LATEST"))
    return version


def read_versioned_pointer(path: str) -> int:
    import os

    try:
        with open(os.path.join(path, "_LATEST")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return -1


def read_versioned(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot of a write_versioned table: the committed latest
    by default, or any retained historical version (time travel)."""
    import os

    v = read_versioned_pointer(path) if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no committed version under {path}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))
