"""ETL operators — the reference pipeline's transform/load surface as pure
``DataFrame -> DataFrame`` functions (SURVEY §2.1 S5/S6, §2.8, §2.9).

The reference does all of this row-at-a-time: per-field try/except
extraction (webscraper-postgres.py:36-70), itertools flatten+set dedup
(:147-154), per-row INSERT ... ON CONFLICT loops (:156-161, :190-222,
:239-285).  Here each step is one lazy columnar plan; at 100 TB each
function is a handful of narrow transformations plus at most one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.cleaning import (
    concat_url,
    safe_decimal,
    safe_int,
    safe_list,
    split_index,
    strip_parens,
)

IMDB_BASE = "https://www.imdb.com"
NBSP = "\u00a0"  # explicit escape: a literal NBSP is invisible and fragile


def extract_movies(raw: DataFrame) -> DataFrame:
    """P1: the listing-page extraction-projection, typed.

    One ``select`` of pure expressions replaces get_element_data's ten
    try/except blocks (webscraper-postgres.py:36-70): every parse failure
    becomes SQL NULL instead of np.nan.
    """
    return raw.select(
        safe_int(split_index("raw_title", r"\.", 0)).alias("rank"),
        split_index("raw_title", r"\.", 1).alias("title"),
        F.col("description"),
        safe_int("year").alias("year"),
        F.col("duration"),
        F.col("rating"),
        safe_int("metascore").alias("metascore"),
        safe_decimal(split_index("ratings_blob", NBSP, 0)).alias("imdb_score"),
        strip_parens(split_index("ratings_blob", NBSP, 1)).alias("views"),
        concat_url(IMDB_BASE, "href").alias("details_url"),
    )


def explode_names(df: DataFrame, key: str, col: str) -> Column | DataFrame:
    """E1/E2: unnest an array column, keeping the parent key.

    ``explode`` (not explode_outer) drops NULL/empty arrays — matching the
    reference's ``dropna`` before flatten (webscraper-postgres.py:149-150).
    """
    return df.select(key, F.explode(safe_list(col)).alias("name")).where(
        F.col("name").isNotNull()
    )


def normalize_people(merged: DataFrame) -> DataFrame:
    """A1 + SERIAL: distinct union of director + writers + stars → people.

    The reference builds set(chain(...)) then relies on Postgres SERIAL
    (webscraper-postgres.py:147-161).  Here: exploded unions → distinct →
    a distributed deterministic surrogate key ordered by name.
    """
    writers = explode_names(merged, "description", "writers").select("name")
    stars = explode_names(merged, "description", "stars").select("name")
    directors = merged.select(F.col("director").alias("name")).where(
        F.col("director").isNotNull()
    )
    names = writers.unionByName(stars).unionByName(directors).distinct()
    return names.transform(
        lambda d: with_surrogate_key(d, "person_id", ["name"])
    )


def with_surrogate_key(
    df: DataFrame, key_col: str, order_by: list[str], start: int = 1
) -> DataFrame:
    """SERIAL-equivalent surrogate key, distributed: ids 1..N in the global
    order of ``order_by`` (which must be a unique key — row_number over a
    non-unique ordering is nondeterministic under any strategy).

    Deliberately NOT monotonically_increasing_id (partition-dependent →
    nondeterministic, breaks oracle hashing and incremental appends), and
    NOT a partition-less window (single-task sort — a 100 TB scale
    killer).  Instead the zipWithIndex pattern in pure DataFrame ops:

    1. range-repartition + sort within partitions on the key → partition i
       holds strictly smaller keys than partition i+1;
    2. per-partition row counts → cumulative offsets (one tiny aggregate,
       #partitions rows, broadcast back);
    3. id = partition offset + row_number within the partition.

    The global id assignment depends only on the total order of the keys,
    not on where the range boundaries land, so the result is identical on
    1 or 1000 executors.  The partition ids are pinned by an eager
    localCheckpoint (operators/windows.py::_pin_partition_ids): the
    offset join reads ``_pid`` from two plan branches, and without the
    pin a non-reused range exchange would re-sample its boundaries per
    branch and silently mix two inconsistent partition assignments.
    EAGER: that pin runs a Spark job at construction time and holds the
    repartitioned rows in executor storage for the session — compose
    once and reuse the result rather than rebuilding per pass.
    """
    from .windows import _pin_partition_ids

    order_cols = [F.col(c) for c in order_by]
    parted = _pin_partition_ids(
        df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    )
    # tiny: one row per partition; the partition-less window over it is
    # bounded by the partition count, never by data volume
    offsets = (
        parted.groupBy("_pid")
        .count()
        .select(
            "_pid",
            (
                F.sum("count").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                )
            ).alias("_offset"),
        )
        .na.fill({"_offset": 0})
    )
    rn = F.row_number().over(W.partitionBy("_pid").orderBy(*order_cols))
    return (
        parted.join(F.broadcast(offsets), "_pid")
        .select(
            (rn + F.col("_offset") + F.lit(start - 1)).cast("int").alias(key_col),
            *df.columns,
        )
    )


def build_bridge(
    merged: DataFrame, movies: DataFrame, people: DataFrame, name_col: str
) -> DataFrame:
    """E2/E3 + J3: one bridge table (movie_director/_writer/_star).

    The reference loops rows × list elements with per-name dict probes and
    per-pair INSERTs (webscraper-postgres.py:239-285).  Spark shape:
    explode (or lift the scalar director to a 1-element relation), join
    the broadcast people dim on name, dedup the (movie_id, person_id)
    pair — its composite-PK ON CONFLICT DO NOTHING.

    Only ``people`` (a true dimension) is broadcast.  ``movies`` scales
    with the fact table, so that join is left to Catalyst/AQE: broadcast
    while it fits, shuffle join beyond — force-broadcasting it would OOM
    every executor at 100 TB.
    """
    if name_col == "director":
        pairs = merged.select(
            "description", F.col("director").alias("name")
        ).where(F.col("director").isNotNull())
    else:
        pairs = explode_names(merged, "description", name_col)
    return (
        pairs.join(movies.select("movie_id", "description"), "description")
        .join(F.broadcast(people), "name")
        .select("movie_id", "person_id")
        .dropDuplicates(["movie_id", "person_id"])
    )


def upsert(
    existing: DataFrame,
    incoming: DataFrame,
    key: str,
    update_cols: list[str],
    stable_cols: list[str],
) -> DataFrame:
    """S5: INSERT ... ON CONFLICT DO UPDATE (webscraper-postgres.py:199-209)
    as a pure transformation.

    Full-outer join on the key; dynamic columns take the incoming side when
    present (update-wins, including incoming NULLs — EXCLUDED.* semantics),
    stable columns keep the existing side.  Storage-level atomicity is the
    table format's job (Delta/Iceberg MERGE INTO at scale); the relational
    semantics live here and are oracle-checkable.
    """
    e = existing.alias("e")
    i = incoming.alias("i")
    ek, ik = F.col(f"e.{key}"), F.col(f"i.{key}")
    matched = ik.isNotNull()
    cols = [F.coalesce(ik, ek).alias(key)]
    for c in update_cols:
        cols.append(F.when(matched, F.col(f"i.{c}")).otherwise(F.col(f"e.{c}")).alias(c))
    for c in stable_cols:
        cols.append(
            F.when(ek.isNotNull(), F.col(f"e.{c}")).otherwise(F.col(f"i.{c}")).alias(c)
        )
    return e.join(i, ek == ik, "full_outer").select(*cols)


def apply_changes(
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """CDC apply: fold an insert/update/delete change stream (op ∈
    {'I','U','D'}, totally ordered per key by ``seq_col`` — an LSN /
    commit version) into the final table state.

    Latest change wins per key; a trailing 'D' removes the key.  The
    batch dual of every log-based replication sink (Debezium→warehouse,
    Delta CDF apply) and the generalization of ``upsert`` to ordered
    multi-change batches.  One shuffle (the per-key window); per-key
    work ∝ that key's change count, so skew is bounded by update
    frequency, not table size.  Exactly SQL-expressible — the oracle
    runs the same window.
    """
    w = W.partitionBy(key).orderBy(F.col(seq_col).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(F.col(op_col) != "D")
        .select(key, *payload_cols)
    )


def scd2_history(
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn the same CDC stream into
    full version history — one row per (key, version) with
    ``valid_from_v`` (the change's own sequence) and ``valid_to_v``
    (the NEXT change's sequence, NULL while current).

    A delete closes the last version's interval without emitting a row
    of its own, so ``valid_to_v IS NULL`` is exactly the live-row
    predicate ``apply_changes`` materializes.  Same single-shuffle
    window shape; the lead() must run BEFORE dropping 'D' rows (the
    delete's sequence is the predecessor's end).
    """
    w = W.partitionBy(key).orderBy(F.col(seq_col).asc())
    return (
        changes.withColumn("valid_to_v", F.lead(seq_col).over(w))
        .where(F.col(op_col) != "D")
        .select(
            key,
            *payload_cols,
            F.col(seq_col).alias("valid_from_v"),
            "valid_to_v",
        )
    )


def insert_ignore(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """S6: INSERT ... ON CONFLICT DO NOTHING (webscraper-postgres.py:160)
    as existing ∪ (incoming ⟕anti existing) — first-writer-wins."""
    new_rows = incoming.dropDuplicates([key]).join(existing, key, "left_anti")
    return existing.unionByName(new_rows)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot reconciliation: full-outer compare of two keyed tables →
    one row per divergent key with status ``added`` / ``removed`` /
    ``changed`` and, for changed rows, the count of differing columns.

    The migration-validation primitive: after a backfill, an engine
    swap, or a CDC replay, diff the rebuilt table against the original
    and assert the result is empty.  One shuffle on the key (the
    full-outer sort-merge); comparisons are null-safe codegen
    expressions, and unchanged rows are filtered BEFORE any further
    consumption, so the output is bounded by the divergence, not the
    table.  At 100 TB run it band-by-band on a key range (the
    foreachBatch-MERGE banding) or pre-bucket both sides to skip the
    exchange entirely (write_bucketed).
    """
    cols = compare_cols or [c for c in old.columns if c not in keys]
    o = old.select(
        *keys,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    j = o.join(n, keys, "full_outer")
    # seed with lit(0) so a key-only table (compare_cols resolves
    # empty) degrades to an added/removed-only diff instead of a
    # Python-None comparison blowing up below
    n_changed = F.lit(0)
    for c in cols:
        flag = (~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))).cast("int")
        n_changed = n_changed + flag
    both = F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()
    return (
        j.select(
            *keys,
            F.when(F.col("_in_old").isNull(), F.lit("added"))
            .when(F.col("_in_new").isNull(), F.lit("removed"))
            .when(n_changed > 0, F.lit("changed"))
            .alias("status"),
            F.when(both, n_changed.cast("long")).alias("n_changed"),
        )
        .where(F.col("status").isNotNull())
    )


def with_quality_metrics(df: DataFrame, cols: list[str], name: str = "quality"):
    """Attach zero-cost data-quality counters to a pipeline stage via
    ``df.observe`` → returns ``(df, Observation)``.

    The metrics (row count + per-column null counts) are computed by
    the SAME job that materializes the DataFrame — no second pass over
    the data, unlike a separate ``count()``/profile query.  After any
    action on the returned frame, ``observation.get`` yields the
    metrics dict: the ingest-gate pattern (abort the load if null rates
    spike) at no extra scan cost, which at 100 TB is the difference
    between free monitoring and doubling the pipeline.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        for c in cols
    ]
    return df.observe(obs, *metrics), obs


def snapshot_cdc(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Generate a CDC change stream by DIFFING two snapshots → one row
    per divergent key with ``op`` ∈ {'I','U','D'} and the new-side
    payload ('D' rows carry NULL payload).

    The inverse of ``apply_changes``: when a source system only hands
    you full snapshot loads (the common warehouse reality), this
    derives the change feed a downstream incremental consumer needs —
    snapshot-diff CDC.  Applying the emitted stream onto ``old``
    reconstructs ``new`` exactly (property-tested).  Same single
    full-outer key shuffle as ``table_diff``; output bounded by the
    divergence, so a daily diff of a 100 TB table ships only the
    changed rows.
    """
    cols = compare_cols or [c for c in old.columns if c not in keys]
    o = old.select(
        *keys,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    j = o.join(n, keys, "full_outer")
    # lit(False) seed: key-only tables emit I/D rows only (no column
    # can differ, so no spurious 'U'), instead of a NoneType crash
    changed = F.lit(False)
    for c in cols:
        flag = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        changed = changed | flag
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("I"))
        .when(F.col("_in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        j.select(
            *keys,
            op.alias(op_col),
            *[F.col(f"_n_{c}").alias(c) for c in cols],
        )
        .where(F.col(op_col).isNotNull())
    )


def apply_snapshot_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a ``snapshot_cdc`` stream onto the base snapshot: rows
    whose key is untouched survive, 'I'/'U' payloads replace or append,
    'D' keys drop — ``apply_snapshot_cdc(old, snapshot_cdc(old, new))``
    is exactly ``new`` (the roundtrip property test).  One anti join +
    one union: the incremental-materialization shape."""
    payload = [c for c in changes.columns if c != op_col]
    untouched = base.join(changes.select(*keys), keys, "left_anti")
    upserts = changes.where(F.col(op_col) != "D").select(*payload)
    return untouched.unionByName(upserts)


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    at_col: str,
    valid_from: str = "valid_from_v",
    valid_to: str = "valid_to_v",
    how: str = "left",
) -> DataFrame:
    """Point-in-time-correct dimension lookup: join each fact to the
    SCD2 version that was live AT the fact's own version stamp —
    ``valid_from <= at < valid_to`` (NULL valid_to = still current).

    The half-open interval contract matches ``scd2_history``: a version
    is live from its own change (inclusive) until the next change
    (exclusive), and a key deleted before ``at`` matches nothing (left
    join keeps the fact with NULL dimension columns — the
    training-data-leakage guard: a fact must never see a LATER version
    of its dimension).  Plans as an equi-join on the key with the
    interval bounds as join residual — one shuffle, never a range
    cross-product, because each key's version count is small by
    construction (bounded by its change frequency).
    """
    f, h = facts.alias("_f"), history.alias("_h")
    cond = (
        (F.col(f"_f.{key}") == F.col(f"_h.{key}"))
        & (F.col(f"_h.{valid_from}") <= F.col(f"_f.{at_col}"))
        & (
            F.col(f"_h.{valid_to}").isNull()
            | (F.col(f"_f.{at_col}") < F.col(f"_h.{valid_to}"))
        )
    )
    return f.join(h, cond, how).drop(F.col(f"_h.{key}"))


def incremental_join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Incremental view maintenance for an inner equi-join under
    INSERT-ONLY deltas: the new rows of ``(A ∪ dA) ⋈ (B ∪ dB)`` without
    recomputing the join —

        Δ(A ⋈ B) = (dA ⋈ B) ∪ (A ⋈ dB) ∪ (dA ⋈ dB)

    (the standard delta-propagation algebra).  Appending the result to
    the previously materialized join reproduces the full recompute
    exactly (equivalence-tested), so a 100 TB joined view refreshes at
    the cost of the DELTAS: each term joins a small batch against one
    big side — broadcast the delta, never shuffle the base.  Deletes/
    updates need retraction counts (negative multiplicities) on top of
    this shape; insert-only covers append-style fact pipelines, and the
    restriction is documented rather than silently wrong.
    """
    keys = [on] if isinstance(on, str) else list(on)
    d1 = a_delta.join(b_old, keys)
    d2 = a_old.join(b_delta, keys)
    d3 = a_delta.join(b_delta, keys)
    return d1.unionByName(d2).unionByName(d3)


def apply_expectations(
    df: DataFrame,
    expectations: dict,
    failed_col: str = "_failed",
) -> tuple[DataFrame, DataFrame]:
    """Declarative data-quality gate: evaluate named boolean
    expectations per row and split into (valid, quarantine), where
    quarantine rows carry the array of failed expectation names.

    The expectation-and-quarantine pattern (Delta Live Tables
    `expect_or_drop` / Great Expectations row conditions) expressed as
    ONE codegen projection: every expectation evaluates in the same
    pass, a NULL result counts as a failure (ANSI three-valued logic
    would otherwise let `NULL >= 0` rows slide through a gate that
    reads as airtight), and the failed-name array is built with
    array/filter expressions — no UDF, no second scan per rule.

    Both returned frames derive from one flagged plan; at scale write
    the flagged frame ONCE partitioned by validity (or run the gate
    inside ``with_quality_metrics``/foreachBatch) rather than
    triggering each side separately — the split here is lazy column
    pruning, not two jobs, but two ACTIONS on the results still scan
    twice without a persist.
    """
    if not expectations:
        raise ValueError("no expectations given")
    checks = F.array(
        *[
            F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
            for name, cond in expectations.items()
        ]
    )
    flagged = df.withColumn(
        failed_col, F.filter(checks, lambda x: x.isNotNull())
    )
    valid = flagged.where(F.size(failed_col) == 0).drop(failed_col)
    quarantine = flagged.where(F.size(failed_col) > 0)
    return valid, quarantine


def fk_expectation(
    df: DataFrame,
    fk_col: str,
    dim: DataFrame,
    dim_key: str,
    flag_col: str = "_fk_ok",
    allow_null: bool = False,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Referential-integrity expectation: flag each fact row by whether
    its foreign key exists in ``dim`` — the cross-table rule the
    row-local ``apply_expectations`` conditions cannot express (it
    needs a join, not a projection).  The returned frame carries
    ``flag_col`` for the gate to consume as a normal expectation:
    ``apply_expectations(flagged, {"fk_dim": F.col("_fk_ok")})``.

    ``allow_null=True`` gives SQL FK semantics (a NULL key vacuously
    satisfies the constraint); the default treats NULL as a violation
    — the data-quality reading, where an unset key is exactly what the
    gate should catch.

    Scale shape: the dim side reduces to DISTINCT keys first, then one
    equi-join — broadcast for true dimensions (default), hash-shuffle
    when the key set is fact-sized (``broadcast_dim=False``).  This is
    the audit-every-row form; for a violations-count-only gate an anti
    join + count is cheaper since matches never materialize.
    """
    keys = dim.select(F.col(dim_key).alias("__fk_key")).distinct()
    if broadcast_dim:
        keys = F.broadcast(keys)
    ok = F.col("__fk_key").isNotNull()
    if allow_null:
        ok = ok | F.col(fk_col).isNull()
    return (
        df.join(keys, F.col(fk_col) == F.col("__fk_key"), "left")
        .withColumn(flag_col, ok)
        .drop("__fk_key")
    )
