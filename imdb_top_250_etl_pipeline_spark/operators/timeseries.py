"""Time-series operators: as-of (point-in-time) join.

Not in the reference (pure batch snapshots); required for any pipeline
that enriches events against a versioned dimension — "the dim row that
was current WHEN the event happened" — and named by the north star as a
canonical custom operator Spark lacks natively.

Implemented as a composition of existing DataFrame ops (no UDF): union
both sides on (key, ts), sort within the key partition, and carry the
most recent right-side payload forward with last(ignoreNulls) over a
running frame.  ONE shuffle on the key — the same cost as an equi-join —
versus the naive theta-join (left.ts >= right.ts) which explodes to the
full pairing before aggregation.  DuckDB's native ASOF JOIN provides the
oracle semantics to check against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with
    the greatest ``right_ts`` <= ``left_ts`` for the same ``key``
    (inclusive — a right version effective exactly at the event time
    matches).  Left rows with no prior right row keep NULL payloads.

    ``right`` must be unique per (key, right_ts) — dedup versions first
    (keep-latest) or the carried payload would be ambiguous; the forward
    variant is the same construction with the sort reversed.

    The union-sort-carry plan: right rows sort BEFORE left rows at equal
    timestamps (src 0 < 1), the matched row forward-fills via
    last(ignoreNulls) over rows UNBOUNDED PRECEDING..CURRENT, then only
    left rows are kept.  At 100 TB this is one hash shuffle on the key +
    a per-key sort — exactly a sort-merge join's cost profile, with no
    row explosion for high-version keys.

    The whole right row is carried as ONE struct(matched_ts, *payloads):
    the struct is non-NULL for every right row even when individual
    payload fields are NULL, so a version with a legitimate NULL payload
    never has that field back-filled from an OLDER version — the output
    row is always a single matched version, matching ASOF JOIN semantics
    (carrying columns independently would mix fields across versions).
    """
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    pack = F.struct(
        F.col(right_ts).alias("_matched_ts"),
        *[F.col(p) for p in payload_cols],
    )
    pack_type = right.select(pack.alias("_rpack")).schema["_rpack"].dataType
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_src"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(pack_type).alias("_rpack"),
    )
    ldtypes = dict(left.dtypes)
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_src"),
        *[F.lit(None).cast(ldtypes[c]).alias(c) for c in lcols],
        pack.alias("_rpack"),
    )
    u = l.unionByName(r)
    w = (
        W.partitionBy(key)
        .orderBy("_ts", "_src")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        key,
        "_ts",
        "_src",
        *lcols,
        F.last("_rpack", ignorenulls=True).over(w).alias("_rpack"),
    )
    return (
        carried.where(F.col("_src") == 1)
        .select(
            key,
            F.col("_ts").alias(left_ts),
            *lcols,
            F.col("_rpack._matched_ts").alias(f"asof_{right_ts}"),
            *[F.col(f"_rpack.{p}").alias(p) for p in payload_cols],
        )
    )


def forward_fill(
    df: DataFrame, key: str, ts: str, cols: list[str]
) -> DataFrame:
    """Gap filling: replace NULLs in ``cols`` with the most recent
    non-NULL value for the same ``key`` (ordered by ``ts``) — the
    sensor/telemetry cleanup pass before feature extraction.

    Same carry construction as asof_join without the union: one shuffle
    on the key, per-key sort, last(ignoreNulls) over a running frame.
    Leading NULLs (no prior observation) stay NULL by design.
    """
    w = (
        W.partitionBy(key)
        .orderBy(ts)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = [
        F.last(c, ignorenulls=True).over(w).alias(c) if c in cols else F.col(c)
        for c in df.columns
    ]
    return df.select(*filled)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Points-in-interval join (``start <= point <= end``) as an
    EQUI-join on time buckets — the range-join pattern Spark has no
    native optimization for (a raw theta-join degenerates to
    BroadcastNestedLoop / a full cross pairing).

    Each interval is exploded to every bucket of width
    ``bucket_width`` (seconds for timestamps, units for numerics) it
    covers; each point hashes to exactly ONE bucket, so the equi-join
    on bucket produces each qualifying (point, interval) pair exactly
    once — truncation keeps bucket(p) within [bucket(start),
    bucket(end)] whenever start <= p <= end, so the post-filter only
    removes false candidates, never real matches, and no dedup is
    needed.  Cost: shuffle of points + intervals×(span/width) replicas.
    Pick ``bucket_width`` near the typical interval span — width >>
    span wastes the filter (many false candidates per bucket); width <<
    span explodes replicas.  Intervals with end < start yield nothing
    (BETWEEN semantics) and are dropped before the explode — under ANSI
    mode a descending sequence() would otherwise error out.  A keyed
    variant is the same construction with the key appended to the join
    condition.  Column names of the two inputs must be disjoint.
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"overlapping column names: {sorted(overlap)}")
    w = int(bucket_width)
    p_sec = F.col(point_col).cast("long")
    s_sec, e_sec = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    iv = (
        intervals.where(F.col(start_col) <= F.col(end_col))
        .withColumn(
            "_b",
            F.explode(F.sequence(F.floor(s_sec / w), F.floor(e_sec / w))),
        )
    )
    pt = points.withColumn("_b", F.floor(p_sec / w))
    return (
        pt.join(iv, "_b")
        .where(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("_b")
    )
