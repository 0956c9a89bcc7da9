"""Parquet catalog over the driver fixture tables.

Replaces the reference's three ingress paths — Selenium page scans
(webscraper-postgres.py:30-33), per-row detail fan-out (:97), and
``pd.read_sql`` table read-backs (:163,:225) — with schema-checked
columnar scans.  Catalyst pushes filters and prunes columns into these
scans for free; at 100 TB the same call reads a partitioned parquet/
iceberg layout with partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import FIXTURE_SCHEMAS

TABLES = tuple(FIXTURE_SCHEMAS)

# (applicationId, sf_dir, table) → DataFrame.  A DataFrame is an immutable
# logical plan, so reusing one across queries is safe and saves a parquet
# footer read + schema assertion per load() call — the same role a real
# engine's cached catalog plays.  Keyed by applicationId so a new session
# never sees plans bound to a stopped one.  ASSUMES the fixture dirs are
# immutable for the life of the session: the cached plan snapshots the
# file listing, so a path whose files are rewritten in-session would be
# served stale — mutable paths must bypass load() or clear this cache.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table.

    The schema is asserted (column names/types must be a prefix-compatible
    match), never inferred — reads fail loudly on drift instead of
    silently reshaping downstream plans.
    """
    if name not in FIXTURE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; have {sorted(FIXTURE_SCHEMAS)}")
    cache_key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _PLAN_CACHE.get(cache_key)
    if cached is not None:
        return cached
    # Runtime-set (not only in our session factory): the driver passes its
    # own SparkSession, and events.ts is parquet TIMESTAMP(NANOS) which
    # Spark refuses to scan unless surfaced as long.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # ...and the NTZ→TIMESTAMP cast below is only value-identical when the
    # session timezone is UTC (NTZ wall-clock reinterpreted as UTC instant);
    # pin it here so driver-provided sessions match get_spark()'s config.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    expected = FIXTURE_SCHEMAS[name]
    got = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in expected.fields:
        if f.name not in got:
            raise ValueError(f"{name}: missing column {f.name!r} (have {sorted(got)})")
        if isinstance(f.dataType, T.TimestampType) and isinstance(got[f.name], T.LongType):
            # parquet TIMESTAMP(NANOS) surfaced as long via nanosAsLong:
            # integer-divide to µs (double division would lose precision on
            # int64 epoch-nanos) — same truncation DuckDB applies.
            cols.append(
                F.timestamp_micros(F.expr(f"`{f.name}` div 1000")).alias(f.name)
            )
        elif isinstance(f.dataType, T.TimestampType) and isinstance(
            got[f.name], T.TimestampNTZType
        ):
            # µs/ms-precision parquet timestamps surface as TIMESTAMP_NTZ;
            # with the session timezone pinned UTC (above) the cast is
            # value-identical, and downstream operators (unix_micros,
            # window(), withWatermark) require the zoned TIMESTAMP type.
            # cast(T.TimestampType()) not cast("timestamp"): the string
            # resolves via spark.sql.timestampType and would be a no-op in
            # a session that sets that to TIMESTAMP_NTZ.
            cols.append(F.col(f.name).cast(T.TimestampType()).alias(f.name))
        elif got[f.name] != f.dataType:
            raise ValueError(
                f"{name}.{f.name}: declared {f.dataType.simpleString()} but "
                f"parquet has {got[f.name].simpleString()} — schema drift"
            )
        else:
            cols.append(F.col(f.name))
    # project to the declared column order (column pruning still applies
    # on top of this select)
    out = df.select(*cols)
    _PLAN_CACHE[cache_key] = out
    return out


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


_VIEWS_AT: dict[str, str] = {}  # applicationId → sf_dir the views point at


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface.

    Idempotent while the session stays on one sf_dir; switching dirs
    re-registers (views must always point at the requested data)."""
    app = spark.sparkContext.applicationId
    if _VIEWS_AT.get(app) == sf_dir:
        return
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    _VIEWS_AT[app] = sf_dir


# Embedded Derby ships with Spark itself (derby*.jar in the pyspark jars
# dir, there for the Hive metastore) — it is the one JDBC database every
# Spark install can reach with zero extra jars, so it is what exercises
# the JDBC read/write path end-to-end (tests/test_jdbc.py and the
# sink_jdbc_roundtrip battery).  Production swaps the URL + driver for
# Postgres/MySQL; every option below is driver-agnostic.
DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC table scan (reference S3: pd.read_sql, webscraper-postgres.py:163).

    The production path: predicate pushdown via ``pushDownPredicate``
    (on by default — filters compile into the remote WHERE clause, see
    the PushedFilters assertion in tests/test_jdbc.py), parallel reads
    via ``partitionColumn``/``lowerBound``/``upperBound``/
    ``numPartitions`` (one connection per stride, so a 100 TB fact
    extract reads with cluster parallelism instead of one socket).
    Executable here against embedded Derby (DERBY_EMBEDDED_DRIVER);
    external engines need their driver jar on the classpath.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan with a REQUIRED explicit schema (S1 family).

    Inference is refused on principle: it costs an extra full pass and
    silently reshapes downstream plans when the data drifts — the same
    contract as load().  mode=FAILFAST so malformed rows fail loudly;
    pass mode=PERMISSIVE plus a columnNameOfCorruptRecord column when
    quarantining bad rows instead.
    """
    reader = (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("mode", options.pop("mode", "FAILFAST"))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> DataFrame:
    """JSON-lines scan with a REQUIRED explicit schema (S1 family).

    Same no-inference contract as read_csv; nested structs/arrays in the
    declared schema are projected schema-on-read, extra fields in the
    data are ignored (not errors) — the tolerant half of the contract
    that lets producers add fields without breaking readers.
    """
    reader = (
        spark.read.format("json")
        .schema(schema)
        .option("mode", options.pop("mode", "FAILFAST"))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
