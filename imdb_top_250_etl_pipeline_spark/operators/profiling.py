"""Data-profiling operators — the monitoring pass a production pipeline
runs on every ingest batch (distribution drift, null creep, range
violations) before the data reaches training.

The reference profiles nothing (its dataset is 250 curated rows); at
corpus scale profiling is a first-class operator: cheap single-pass
aggregates whose outputs feed drift alerts and schema checks.
Everything here is exact integer/extremum arithmetic — no sketches, no
engine-dependent floats — so profiles are oracle-checkable and
comparable across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_distinct_estimate(
    df: DataFrame, key_col: str, bucket_col
) -> DataFrame:
    """Mergeable distinct-count: one HLL sketch per ``bucket_col`` value
    (a day, an ingest batch, a partition), unioned and estimated —
    single-row (n_buckets, estimate) output.

    THE incremental pattern for distinct counts at scale: per-batch
    sketches are persisted once (bytes per bucket, not users), and any
    window's distinct count is a union of already-built sketches —
    re-scanning history is never needed, which is what makes daily
    "distinct users this month" queries O(days) instead of O(events).
    Estimates are engine-specific (Datasketches HLL here), so callers
    verify the INVARIANT |estimate - exact| <= rsd bound rather than the
    value — the approx_count_distinct discipline.
    """
    bucketed = df.groupBy(bucket_col).agg(
        F.hll_sketch_agg(key_col).alias("_sk")
    )
    return bucketed.agg(
        F.count("*").alias("n_buckets"),
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("estimate"),
    )


def fixed_width_histogram(
    df: DataFrame, value_col: str, n_buckets: int = 10
) -> DataFrame:
    """Equal-width histogram of ``value_col``: (bucket, n) with bucket in
    [0, n_buckets), edges spanning [min, max].

    The distribution-drift primitive: two ingest batches are compared by
    their bucket vectors.  Two passes over the column — one min/max
    aggregate (broadcast single row), one bucket-count aggregate — both
    map-side-combined; NULLs are excluded (count them separately via a
    null-profile), and the max value lands in the top bucket (closed
    upper edge).  A constant column degenerates to one bucket 0.

    Contrast with quantile_bins (operators/windows.py): equal-WIDTH
    buckets profile the distribution's shape; equal-FREQUENCY bins
    discretize features.  Both broadcast their edges; neither collects.
    """
    mm = df.agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / n_buckets
    bucket = (
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col(value_col) - F.col("_lo")) / width),
                F.lit(n_buckets - 1),
            )
        )
        .cast("int")
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(mm))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style table statistics: one output row per profiled
    column with (col_name, n_rows, n_nulls, n_distinct, min_s, max_s).

    The stats-collection job behind every cost-based optimizer and
    ingest-quality gate (null creep / range violations / cardinality
    drift).  ONE aggregation job for every column at once: Catalyst
    plans the multi-column exact countDistinct as a single Expand +
    shuffle (rows × columns map-side, combined partially), and the
    single result row is unpivoted JVM-side with ``stack`` — no
    per-column scans, no driver loop.  Extrema are computed on the
    native type THEN cast to string (casting first would compare
    lexicographically), relying on shortest-round-trip double
    formatting for cross-engine exactness like the CSV sink path.
    """
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return row.selectExpr(
        "_rows",
        f"stack({len(cols)}, {stacked}) AS "
        "(col_name, _nonnull, n_distinct, min_s, max_s)",
    ).select(
        "col_name",
        F.col("_rows").alias("n_rows"),
        (F.col("_rows") - F.col("_nonnull")).alias("n_nulls"),
        "n_distinct",
        "min_s",
        "max_s",
    )


def population_stability(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    eps: float = 1e-4,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    distribution of ``value_col`` → one row per bucket
    (bucket, p_ref, p_cur, contrib) plus the summed ``psi``on each row.

    THE production drift gate (credit-risk lineage, now standard for
    feature/ingest monitoring): bucket the REFERENCE's [min, max] into
    equal widths, compare proportion vectors, psi = Σ (p-q)·ln(p/q).
    Rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.

    Determinism/scale shape: edges come from one broadcast min/max row
    of the reference (current values clamp into the end buckets — new
    out-of-range mass lands in bucket 0 or n-1, which is itself a drift
    signal); per-side bucket counts are map-side-combined aggregates;
    the bucket spine densifies empty buckets via one generated
    sequence, so zero-count buckets participate through the ``eps``
    floor instead of dividing by zero.  Proportions are single IEEE
    divisions; the only libm term is ln(p/q), so oracle comparisons
    round the contributions (the agg_stats_battery discipline).
    """
    mm = ref.agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / n_buckets

    def counts(df: DataFrame, name: str) -> DataFrame:
        bucket = (
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
            .otherwise(
                F.greatest(
                    F.least(
                        F.floor((F.col(value_col) - F.col("_lo")) / width),
                        F.lit(n_buckets - 1),
                    ),
                    F.lit(0),
                )
            )
            .cast("int")
        )
        return (
            df.where(F.col(value_col).isNotNull())
            .crossJoin(F.broadcast(mm))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias(name))
        )

    spine = mm.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket")
    )
    joined = (
        spine.join(counts(ref, "_nr"), "bucket", "left")
        .join(counts(cur, "_nc"), "bucket", "left")
        .na.fill({"_nr": 0, "_nc": 0})
    )
    tot = joined.agg(
        F.sum("_nr").alias("_tr"), F.sum("_nc").alias("_tc")
    )
    p = F.greatest(F.col("_nr") / F.col("_tr"), F.lit(eps))
    q = F.greatest(F.col("_nc") / F.col("_tc"), F.lit(eps))
    contrib = (p - q) * F.log(p / q)
    per = joined.crossJoin(F.broadcast(tot)).select(
        "bucket",
        p.alias("p_ref"),
        q.alias("p_cur"),
        contrib.alias("contrib"),
    )
    total = per.agg(F.sum("contrib").alias("psi"))
    return per.crossJoin(F.broadcast(total))


# The mergeable-metric column set maintained per key: each is an
# ALGEBRAIC aggregate (two states merge by a fixed formula), which is
# what makes incremental maintenance exact — averages/ratios derive
# from (sum, count) at read time, never stored.
_ROLLUP_STATE = ("n", "total", "lo", "hi")


def rollup_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Aggregate a batch into mergeable per-key metric state
    (n, total, lo, hi)."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("total"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
    )


def merge_rollup(
    state: DataFrame, batch_state: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental aggregate maintenance: fold a new batch's rollup
    state into the persisted per-key state — counts/sums add, extrema
    combine — so a continuously-maintained metrics table never rescans
    history (the exact-metric sibling of the HLL-union distinct path,
    and the aggregation-table pattern under every streaming dashboard).

    Full-outer on the keys: keys only in the batch insert, keys only in
    the state carry over.  One shuffle on the key set; both inputs are
    key-bounded aggregate tables, never raw events.  Only ALGEBRAIC
    metrics belong in the state (sum/count/min/max, and sketches like
    HLL via incremental_distinct_estimate); holistic metrics (exact
    median/distinct) cannot merge and must recompute — that split is
    the design line this operator makes explicit.
    """
    s = state.alias("s")
    b = batch_state.alias("b")
    cond = None
    for k in keys:
        c = F.col(f"s.{k}").eqNullSafe(F.col(f"b.{k}"))
        cond = c if cond is None else cond & c
    out_keys = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"b.{k}")).alias(k) for k in keys
    ]
    z = F.lit(0)
    return s.join(b, cond, "full_outer").select(
        *out_keys,
        (F.coalesce(F.col("s.n"), z) + F.coalesce(F.col("b.n"), z)).alias("n"),
        (
            F.coalesce(F.col("s.total"), F.lit(0.0))
            + F.coalesce(F.col("b.total"), F.lit(0.0))
        ).alias("total"),
        F.least(
            F.coalesce(F.col("s.lo"), F.col("b.lo")),
            F.coalesce(F.col("b.lo"), F.col("s.lo")),
        ).alias("lo"),
        F.greatest(
            F.coalesce(F.col("s.hi"), F.col("b.hi")),
            F.coalesce(F.col("b.hi"), F.col("s.hi")),
        ).alias("hi"),
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """Misra–Gries heavy-hitter summary → (item, est): at most ``k-1``
    candidate items whose estimated counts undercount true frequency by
    at most n/k in total.

    The mergeable frequent-items sketch: every item with true frequency
    above n/k is GUARANTEED present (its estimate stays positive), and
    estimates never overcount — so ``est > n/k`` certifies a heavy
    hitter with no second pass.  The streaming/distributed answer to
    "top domains / hottest keys" when the domain is unbounded and an
    exact groupBy would shuffle every distinct key.

    Plan: one mapInPandas pass keeps k-1 Misra–Gries counters PER
    PARTITION (state across Arrow batches, emitted once at partition
    end — ≤ k-1 rows per task, regardless of data volume), then a tiny
    groupBy sums the summaries.  Summing alone can leave up to
    P*(k-1) rows, so a final MG compression (Agarwal et al.,
    "Mergeable Summaries": subtract the k-th largest merged estimate
    from every counter, drop the non-positive) restores the global
    ≤ k-1 size contract; the subtraction only ever DEEPENS the
    undercount and by at most the decrement-all accounting, so both
    MG guarantees (never overcount; total undercount ≤ n/k) survive
    the merge.  The threshold is a one-row broadcast — the summary
    never leaves the executors at more than sketch size.
    """
    if k < 2:
        raise ValueError("k must be >= 2")

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for item in pdf[col]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k - 1:
                    counters[item] = 1
                else:
                    # decrement-all: drop every counter by 1 (each
                    # decrement "spends" k occurrences, bounding total
                    # undercount by n/k)
                    dead = []
                    for it in counters:
                        counters[it] -= 1
                        if counters[it] == 0:
                            dead.append(it)
                    for it in dead:
                        del counters[it]
        yield pd.DataFrame(
            {"item": list(counters), "est": list(counters.values())}
        )

    per_partition = df.select(
        F.col(col).cast("string").alias(col)
    ).mapInPandas(summarize, "item string, est long")
    merged = per_partition.groupBy("item").agg(
        F.sum("est").cast("long").alias("est")
    )
    # final compression: the k-th largest merged estimate (0 when the
    # merged summary already holds < k items) is subtracted from every
    # counter and non-positive counters drop — at most k-1 survive
    # F.get (not element_at): NULL on out-of-bounds even under ANSI
    kth = merged.agg(
        F.coalesce(
            F.get(F.reverse(F.array_sort(F.collect_list("est"))), k - 1),
            F.lit(0),
        ).alias("_kth")
    )
    return (
        merged.crossJoin(F.broadcast(kth))
        .select("item", (F.col("est") - F.col("_kth")).alias("est"))
        .where(F.col("est") > 0)
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    z: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier profile via the median absolute
    deviation: ``outlier ⇔ |x − median| > z · 1.4826 · MAD`` — the
    standard robust alternative to mean±3σ (a single wild value drags
    the mean AND inflates σ enough to hide itself; the median and MAD
    are 50%-breakdown estimators, so planted garbage cannot mask
    itself).  1.4826 scales MAD to σ under normality.

    Returns one row per group: median, MAD, outlier count and
    fraction.  Three passes, each one shuffle: grouped median, grouped
    median of |x − med| (median joined back on the group key —
    broadcast, group cardinality is bounded), outlier count.  The
    exact medians share the lerp-at-p·(n−1) definition with DuckDB
    (hash-checkable, the agg_percentiles precedent); at 100 TB swap
    ``F.percentile`` for ``approx_percentile`` — same plan shape, the
    documented exact→sketch trade.
    """
    med = df.groupBy(*group_cols).agg(
        F.percentile(value_col, 0.5).alias("_med")
    )
    dev = df.join(F.broadcast(med), group_cols).select(
        *group_cols,
        F.col(value_col).alias("_x"),
        "_med",
        F.abs(F.col(value_col) - F.col("_med")).alias("_adev"),
    )
    mad = dev.groupBy(*group_cols, "_med").agg(
        F.percentile("_adev", 0.5).alias("_mad")
    )
    flagged = dev.drop("_med").join(F.broadcast(mad), group_cols)
    thresh = F.lit(z) * F.lit(1.4826) * F.col("_mad")
    return (
        flagged.groupBy(*group_cols, "_med", "_mad")
        .agg(
            F.count("*").alias("_n"),
            F.sum(
                F.when(F.col("_adev") > thresh, 1).otherwise(0)
            ).alias("_k"),
        )
        .select(
            *group_cols,
            F.round("_med", 4).alias("median"),
            F.round("_mad", 4).alias("mad"),
            F.col("_k").cast("long").alias("n_outliers"),
            F.round(F.col("_k") / F.col("_n"), 6).alias("outlier_frac"),
        )
    )


def quantile_state(
    df: DataFrame,
    value_col: str,
    part_col: str,
    grid: int = 64,
) -> DataFrame:
    """Mergeable per-partition quantile summary: one row per partition
    (day, shard, source) carrying an equi-depth grid of ``grid + 1``
    exact quantiles plus the row count — the quantile analogue of the
    per-day HLL sketches (``incremental_distinct_estimate``).  Each
    partition is summarized ONCE; any later cross-partition quantile
    question is answered from the summaries via
    ``merged_quantile_estimate`` without re-reading the data — the
    incremental-maintenance pattern for percentile dashboards.

    Within a partition the grid's rank error is ≤ 1/(2·grid) by
    construction (equi-depth cut points).  At 100 TB swap
    ``F.percentile`` for ``approx_percentile`` per partition — same
    state schema, the documented exact→sketch trade.
    """
    fracs = F.lit([i / grid for i in range(grid + 1)]).cast(
        "array<double>"
    )
    return df.groupBy(part_col).agg(
        F.percentile(value_col, fracs).alias("qs"),
        F.count("*").cast("long").alias("n"),
    )


def merged_quantile_estimate(
    state: DataFrame,
    probs: list[float],
) -> DataFrame:
    """Estimate global quantiles from mergeable per-partition summaries
    (``quantile_state`` output): each grid point stands for
    ``n/grid`` rows of its partition (half-weight at the two ends), so
    the merged p-quantile is the smallest grid value whose cumulative
    weight reaches ``p × total`` — a weighted quantile over the UNION
    of grids.  Merged rank error is bounded by the per-partition grid
    error (measured ≤ 1/grid on the fixtures; pinned as an invariant).

    The cumulative window runs over summary rows (partitions ×
    (grid+1) points), never data rows — a single-task sort of the
    summary table is the intended shape at any corpus size; the data
    itself was touched once, when each partition's state was built.
    """
    from pyspark.sql.window import Window as W

    spark = state.sparkSession
    grid = F.size("qs") - 1
    pts = state.select(
        "n", grid.alias("_g"), F.posexplode("qs").alias("i", "q")
    ).select(
        "q",
        F.when(
            (F.col("i") == 0) | (F.col("i") == F.col("_g")),
            F.col("n") / (2 * F.col("_g")),
        )
        .otherwise(F.col("n") / F.col("_g"))
        .alias("w"),
    )
    tot = pts.agg(F.sum("w").alias("_tw"))
    cum = (
        pts.withColumn(
            "cum",
            F.sum("w").over(
                W.orderBy("q").rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        .crossJoin(F.broadcast(tot))
    )
    probs_df = spark.createDataFrame([(float(p),) for p in probs], "p double")
    return (
        cum.crossJoin(F.broadcast(probs_df))
        .where(F.col("cum") >= F.col("p") * F.col("_tw"))
        .groupBy("p")
        .agg(F.min("q").alias("est"))
    )


def _cms_pos(d: Column, value: Column, width: int) -> Column:
    """Row d's bucket for a value: md5-derived, deterministic, and
    restatable verbatim in SQL (the split_by_hash convention — 15 hex
    chars < 2^60 so the bigint conversion never overflows ANSI mode)."""
    h = F.md5(F.concat(d.cast("string"), F.lit(":"), value))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long")) % F.lit(
        width
    )


def count_min_sketch(
    df: DataFrame, col: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Count–min sketch of a column → (d, pos, cnt): ``depth``
    independent hash rows of ``width`` buckets; every occurrence
    increments one bucket per row.

    The mergeable frequency sketch that completes the sketch family
    (HLL = distinct counts, Misra–Gries = top items, equi-depth grids =
    quantiles, CMS = POINT FREQUENCY queries on an unbounded domain):
    a point estimate min_d cnt[d][h_d(x)] never undercounts, and
    overcounts by more than 2N/width with probability ≤ 2^-depth.
    Unlike an exact groupBy on the item — whose shuffle keyspace grows
    with the domain — the CMS groupBy keyspace is ≤ depth·width rows
    REGARDLESS of data volume, and two sketches merge by elementwise
    bucket addition (it is just a sum-groupBy over a fixed keyspace),
    so per-partition/per-day sketches union into a global one without
    touching the raw data again.

    Hashing is md5-derived (not xxhash64) so the whole sketch table is
    hash-checkable against the SQL oracle bucket for bucket.
    """
    depths = F.array(*[F.lit(d) for d in range(depth)])
    return (
        df.select(F.col(col).cast("string").alias("_v"))
        .where(F.col("_v").isNotNull())
        .select(F.explode(depths).alias("d"), "_v")
        .select(
            F.col("d").cast("int").alias("d"),
            _cms_pos(F.col("d"), F.col("_v"), width).alias("pos"),
        )
        .groupBy("d", "pos")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_point_estimates(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``items`` against a prebuilt
    sketch → (item, est): est = min over the depth rows of the item's
    bucket count — ≥ the true frequency always (every occurrence lands
    in all of the item's buckets), within 2N/width of it w.h.p.

    Plan: items explode to depth (d, pos) probes and equi-join the
    sketch — the sketch side is ≤ depth·width rows, so Catalyst
    broadcasts it and the probe never shuffles the item table.  A
    probed bucket always exists when the item occurred at least once;
    a missing bucket left-joins to 0 (the item was never seen).
    """
    depths = F.array(*[F.lit(d) for d in range(depth)])
    probes = items.select(
        F.col(col).cast("string").alias("item")
    ).select("item", F.explode(depths).alias("d")).select(
        "item",
        F.col("d").cast("int").alias("d"),
        _cms_pos(F.col("d"), F.col("item"), width).alias("pos"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "pos"], "left")
        .groupBy("item")
        .agg(
            F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est")
        )
    )


def bloom_filter_build(
    df: DataFrame, col: str, m_bits: int = 4096, k: int = 4
) -> DataFrame:
    """Bloom filter of a column → (pos): the distinct set bit
    positions of a ``m_bits``-bit filter with ``k`` md5-derived hash
    functions per value.

    Completes the mergeable-sketch family (HLL = distinct counts,
    Misra–Gries = top items, CMS = point frequency, equi-depth grids =
    quantiles; Bloom = MEMBERSHIP): a probe answers "definitely absent
    or maybe present" with zero false negatives and FPR ≈
    (1 - e^(-k·n/m))^k.  Two filters over the same (m, k) merge by
    plain UNION DISTINCT of their positions — per-day/per-partition
    filters union into a corpus filter without rescanning data, which
    is what makes it the standard 100 TB pre-join: persist the ≤ m-row
    position set once, then any later batch drops definite non-members
    BEFORE the expensive semi-join against the full corpus
    (`dedup_incremental` probe discipline).

    Plan: one projection to k positions per value (fixed fan-out), one
    distinct over a keyspace ≤ ``m_bits`` REGARDLESS of data volume —
    the output never grows with the corpus.  Hashing reuses the CMS
    md5 convention (`_cms_pos`) so the position set is hash-checkable
    against a verbatim SQL oracle.
    """
    hashes = F.array(*[F.lit(i) for i in range(k)])
    return (
        df.select(F.col(col).cast("string").alias("_v"))
        .where(F.col("_v").isNotNull())
        .select(F.explode(hashes).alias("_h"), "_v")
        .select(
            _cms_pos(F.col("_h"), F.col("_v"), m_bits)
            .cast("long")
            .alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    items: DataFrame,
    col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Membership probe against a prebuilt Bloom position set →
    (item, maybe_member): true iff ALL k of the item's bit positions
    are set.  False ⇒ the item was definitely never inserted (the
    no-false-negative guarantee the pre-join prune relies on).

    Plan: items project to k (pos) probes (fixed fan-out, no
    shuffle of the probe table beyond its own groupBy), and the
    filter side — ≤ ``m_bits`` rows by construction — broadcasts, so
    probing N items is one broadcast-hash left join + one combining
    aggregate keyed on the probe items.
    """
    hashes = F.array(*[F.lit(i) for i in range(k)])
    probes = (
        items.select(F.col(col).cast("string").alias("item"))
        .select("item", F.explode(hashes).alias("_h"))
        .select(
            "item",
            _cms_pos(F.col("_h"), F.col("item"), m_bits)
            .cast("long")
            .alias("pos"),
        )
    )
    hit = F.when(F.col("_set").isNotNull(), 1).otherwise(0)
    return (
        probes.join(
            F.broadcast(bloom.select(F.col("pos"), F.lit(1).alias("_set"))),
            "pos",
            "left",
        )
        .groupBy("item")
        .agg((F.sum(hit) == F.lit(k)).alias("maybe_member"))
    )


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic → one row
    (n_a, n_b, d_scaled, ks, at_v): the largest ECDF gap between the
    two samples, where it occurs, with the gap carried as the exact
    integer d_scaled = max |cumA·n_b − cumB·n_a| and ks = d_scaled /
    (n_a·n_b).

    The distribution-drift detector that completes the drift family:
    `population_stability` (PSI) needs binning and misses shifts inside
    a bin; KS is binning-free and sensitive to ANY CDF displacement —
    the standard guard before mixing a new data source into a training
    corpus.

    Distributed shape: per-side value counts (two groupBys over the
    distinct-value keyspace), one full-outer merge, then ONE
    distributed prefix-sum pass over both counts
    (`windows.distributed_cumsum` multi-column form — range-partitioned,
    no single-task global window), and a 1-row aggregate.  All counts
    and the scaled gap are exact integers (ties at equal values handled
    exactly — both ECDFs step together); the only float is the final
    single division.  at_v ties break to the SMALLEST value attaining
    the max, via an exact integer max over (d_scaled, −v_scaled).

    Overflow: cum·n products stay under 2⁶³ for samples up to ~3·10⁹
    rows each; past that, widen the products to DECIMAL(38,0) at this
    call site.
    """
    from .windows import distributed_cumsum

    a = (
        df_a.select(F.col(value_col).alias("v"))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("_ca"))
    )
    b = (
        df_b.select(F.col(value_col).alias("v"))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("_cb"))
    )
    m = (
        a.join(b, "v", "full_outer")
        .select(
            "v",
            F.coalesce("_ca", F.lit(0)).alias("_ca"),
            F.coalesce("_cb", F.lit(0)).alias("_cb"),
        )
    )
    cum = distributed_cumsum(
        m, ["v"], ["_ca", "_cb"], ["_cum_a", "_cum_b"]
    )
    totals = m.agg(
        F.sum("_ca").cast("long").alias("_na"),
        F.sum("_cb").cast("long").alias("_nb"),
    )
    d = cum.crossJoin(F.broadcast(totals)).select(
        "v",
        "_na",
        "_nb",
        F.abs(
            F.col("_cum_a") * F.col("_nb") - F.col("_cum_b") * F.col("_na")
        ).alias("_d"),
    )
    # argmax with smallest-v tie-break: one struct max — the gap is an
    # exact integer, and negated-v ordering is deterministic for any
    # non-NaN numeric domain (both engines order doubles identically)
    v_neg = -F.col("v").cast("double")
    best = d.agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max(F.struct(F.col("_d").alias("_d"), v_neg.alias("_nv"))).alias(
            "_m"
        ),
    )
    return best.select(
        "n_a",
        "n_b",
        F.col("_m._d").alias("d_scaled"),
        (
            F.col("_m._d").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("ks"),
        (-F.col("_m._nv")).alias("at_v"),
    )


def chi_square_cells(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Chi-square independence audit between two categorical columns →
    one row per observed cell (a, b, observed, n_a, n_b, n, contrib)
    where contrib = (observed·n − n_a·n_b)² / (n·n_a·n_b); the
    chi-square statistic is the sum over cells (plus the expected
    counts of UNOBSERVED cells, which callers add as Σe over the
    missing cross — zero when the observed cross is complete).

    Completes the drift/audit family by modality: KS (`ks_statistic`)
    for numeric CDFs, PSI (`population_stability`) for binned scores,
    chi-square for CATEGORICAL co-distribution — "is source mix
    independent of language" is the canonical training-corpus audit.

    Distributed shape: ONE groupBy over (a, b) builds the contingency
    cells; margins come from the CELLS table, never a second data
    scan, and join back as broadcasts (bounded by category
    cardinality).  All counts and the deviation D = o·n − n_a·n_b are
    exact integers (D fits 2⁶³ for n up to ~3·10⁹; widen to
    DECIMAL(38,0) past that); contrib is one deterministic IEEE
    multiply-divide of exactly-representable values — hash-identical
    cross-engine.
    """
    cells = (
        df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("observed"))
    )
    ma = cells.groupBy("a").agg(F.sum("observed").cast("long").alias("n_a"))
    mb = cells.groupBy("b").agg(F.sum("observed").cast("long").alias("n_b"))
    nt = cells.agg(F.sum("observed").cast("long").alias("n"))
    dev = (
        F.col("observed") * F.col("n") - F.col("n_a") * F.col("n_b")
    ).cast("double")
    return (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(nt))
        .select(
            "a",
            "b",
            "observed",
            "n_a",
            "n_b",
            "n",
            (
                dev
                * dev
                / (F.col("n_a") * F.col("n_b") * F.col("n")).cast("double")
            ).alias("contrib"),
        )
    )


#: log10(1 + 1/d) for d = 1..9 — materialized once in Python so the
#: engine and any SQL oracle compare against the SAME double literals
#: (a runtime libm log10 could differ in the last ulp across engines).
BENFORD_P = [0.0] + [__import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)]


def benford_profile(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Benford first-digit audit → one row per leading digit
    (digit, n, n_total, p, expected, dev): the observed share of each
    leading significant digit against Benford's log10(1 + 1/d) law.

    The classic forensic screen for FABRICATED numeric columns:
    organically-grown magnitudes (transaction totals, populations,
    file sizes) follow Benford; synthetic, uniform, or hand-typed data
    do not — large |dev| over a large n flags a column worth
    investigating before it poisons downstream stats.

    Exactness discipline: values are integer-scaled (``scale``=100 for
    cent-precision money) and the leading digit comes from the
    INTEGER's decimal string — integer→string is deterministic and
    identical cross-engine, unlike double formatting or a libm
    log10-and-floor.  Expected shares are Python-literal constants
    (``BENFORD_P``) injected into both engines, p and dev single IEEE
    arithmetic on exact integers.  Plan: one projection + one groupBy
    over ≤ 9 keys (map-side combined) + a 1-row broadcast total.
    """
    cents = F.abs(
        F.round(F.col(value_col) * F.lit(scale), 0).cast("long")
    )
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (
        df.where(F.col(value_col).isNotNull() & (cents > 0))
        .groupBy(digit.alias("digit"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    total = counts.agg(F.sum("n").cast("long").alias("n_total"))
    expected = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_P[1:]]), F.col("digit")
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        "n_total",
        (F.col("n").cast("double") / F.col("n_total").cast("double")).alias(
            "p"
        ),
        expected.alias("expected"),
        (
            F.col("n").cast("double") / F.col("n_total").cast("double")
            - expected
        ).alias("dev"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Cross-group quantile normalization → every input row plus
    (src_rank, pooled_target, norm_value): each group's value
    distribution mapped onto the POOLED distribution, so scores from
    heterogeneous sources become comparable before a single global
    threshold cuts them.

    The corpus-calibration step before mixing: a quality classifier
    reads 0.9 on news and 0.4 on forum text for the same true quality;
    per-source quantile mapping (the microarray quantile-normalization
    method, Bolstad et al. 2003) removes the per-source shift without
    assuming any parametric shape.  Row with within-group rank r of
    n_g maps to the pooled order statistic at index
    ceil(r·N/n_g) — rank r/n_g becomes pooled quantile r/n_g.

    Exactness: EVERYTHING is integer rank arithmetic on total orders
    ((value, id) — the unique-tie-break row_number contract); the
    normalized value is an order statistic COPIED from the pool, never
    interpolated, so no float op exists anywhere.

    Distributed shape: within-group ranks ride the distributed
    grouped_row_number and pooled ranks the surrogate-key pattern —
    both range-partitioned with per-partition offsets, NO single-task
    global window (the 100 TB killer a plain ORDER BY window would
    be); group sizes and the 1-row total broadcast; the final
    order-statistic lookup is one integer equi-join.  EAGER: both
    ranking passes localCheckpoint-pin partition ids at construction
    (the _pin_partition_ids contract) — compose once and reuse.
    """
    from .windows import grouped_row_number
    from ..operators.etl import with_surrogate_key

    ranked = grouped_row_number(
        df.select(group_col, id_col, value_col),
        [group_col],
        [value_col, id_col],
        out_col="src_rank",
    )
    sizes = df.groupBy(group_col).agg(F.count("*").alias("_ng"))
    total = df.agg(F.count("*").cast("long").alias("_n"))
    pooled = with_surrogate_key(
        df.select(value_col, id_col), "_pooled_idx", [value_col, id_col]
    ).select(
        F.col("_pooled_idx"), F.col(value_col).alias("norm_value")
    )
    target = (
        ranked.join(F.broadcast(sizes), group_col)
        .crossJoin(F.broadcast(total))
        .select(
            group_col,
            id_col,
            value_col,
            F.col("src_rank").cast("long").alias("src_rank"),
            # ceil(r·N/n_g) in TRUE integer division (div, never a
            # double /: r·N can pass 2^53 at corpus scale)
            F.expr(
                "(cast(src_rank as bigint) * _n + _ng - 1) div _ng"
            ).alias("pooled_target"),
        )
    )
    return target.join(
        pooled, target["pooled_target"] == pooled["_pooled_idx"]
    ).drop("_pooled_idx")


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Key-distribution skew audit → ONE row (n_rows, n_keys,
    max_count, top1_ppm, p50_count, p90_count, p99_count, gini):
    how concentrated a prospective shuffle key is BEFORE you pay the
    shuffle.

    The operational pre-flight for every 100 TB join/groupBy in this
    package: gini ≈ 0 + flat percentiles → hash-partition freely;
    top1_ppm in the percents → the salted join; a heavy p99/p50 ratio
    → AQE skew handling or bucketing.  Profiles the KEY COUNTS table
    (bounded by distinct keys, not rows), so the audit costs one
    combining groupBy plus rank-table arithmetic.

    Exactness: Gini over ascending-ranked counts is
    ``(2·Σi·cᵢ − (K+1)·N) / (K·N)`` — numerator and denominator exact
    DECIMAL(38,0) sums/products of bigints (Σi·cᵢ ≤ K·N overflows
    bigint at extreme cardinality×volume; decimal holds 38 digits),
    ONE final IEEE division; percentile counts are order statistics
    PICKED at exact integer indexes (ceil(q·K) via integer div), never
    interpolated; top1_ppm is integer parts-per-million.

    Distributed shape: one combining groupBy (map-side partial), the
    surrogate-key ranking over the counts table (range-partitioned,
    no single-task global window), a 1-row broadcast of totals, one
    final aggregate.  EAGER: the ranking pins partition ids (the
    _pin_partition_ids contract).
    """
    from ..operators.etl import with_surrogate_key

    counts = df.groupBy(key_col).agg(F.count("*").alias("_c"))
    ranked = with_surrogate_key(counts, "_rk", ["_c", key_col])
    tot = ranked.agg(
        F.max("_rk").cast("long").alias("_k"),
        F.sum("_c").cast("long").alias("_n"),
    )
    j = ranked.crossJoin(F.broadcast(tot))

    def pick(idx_expr: str, name: str):
        return F.max(
            F.when(F.expr(f"_rk = {idx_expr}"), F.col("_c"))
        ).alias(name)

    return j.agg(
        F.max("_n").alias("n_rows"),
        F.max("_k").alias("n_keys"),
        F.max("_c").alias("max_count"),
        F.expr("max(_c) * 1000000 div max(_n)").alias("top1_ppm"),
        pick("(_k + 1) div 2", "p50_count"),
        pick("(9 * _k + 9) div 10", "p90_count"),
        pick("(99 * _k + 99) div 100", "p99_count"),
        (
            (
                F.lit(2) * F.sum(
                    (F.col("_rk") * F.col("_c")).cast("decimal(38,0)")
                )
                - (
                    (F.max("_k") + 1).cast("decimal(38,0)")
                    * F.max("_n").cast("decimal(38,0)")
                )
            ).cast("double")
            / (
                F.max("_k").cast("decimal(38,0)")
                * F.max("_n").cast("decimal(38,0)")
            ).cast("double")
        ).alias("gini"),
    )


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    quantiles: list[tuple[int, int]] = ((1, 2), (9, 10), (99, 100)),
) -> DataFrame:
    """Exact weighted quantiles per group → one row per group with
    (w_total, wq_<num>_<den>...): the smallest value whose cumulative
    weight reaches the quantile of the total weight.

    percentile() answers "the median line item"; THIS answers "the
    median unit" — the price below which half the QUANTITY sits, the
    latency under which 99% of request-seconds sit.  Values are PICKED
    order statistics, never interpolated.

    Exactness: weights must be integer-valued (rounded once to bigint);
    per-value weight sums, grouped cumulative sums, and the threshold
    compare ``cumw·den ≥ num·W`` are all bigint — no proportion is ever
    a float.  Ties collapse at the value level first (one row per
    (group, value)), so duplicated values cannot straddle a threshold.

    Distributed shape: one combining (group, value) aggregate, the
    distributed grouped_cumsum over the value-level table (range-
    partitioned with per-partition offsets — a giant group never
    becomes one giant task), a broadcast totals join, one final
    conditional-min aggregate.  EAGER: the cumsum pins partition ids
    (the _pin_partition_ids contract).
    """
    from .windows import grouped_cumsum

    w = F.round(F.col(weight_col)).cast("long")
    wv = (
        df.select(group_col, F.col(value_col).alias("_v"), w.alias("_w"))
        .groupBy(group_col, "_v")
        .agg(F.sum("_w").alias("_wsum"))
    )
    cum = grouped_cumsum(wv, [group_col], ["_v"], "_wsum", out_col="_cumw")
    tot = wv.groupBy(group_col).agg(F.sum("_wsum").alias("_wtot"))
    j = cum.join(F.broadcast(tot), group_col)
    picks = [
        F.min(
            F.when(
                F.col("_cumw") * num_den[1]
                >= F.lit(num_den[0]) * F.col("_wtot"),
                F.col("_v"),
            )
        ).alias(f"wq_{num_den[0]}_{num_den[1]}")
        for num_den in quantiles
    ]
    return j.groupBy(group_col).agg(
        F.max("_wtot").alias("w_total"), *picks
    )


def rolling_active_users(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    window_days: int = 7,
    rsd: float = 0.02,
) -> DataFrame:
    """Rolling active users → one row per observed day with
    (epoch_day, dau, wau, wau_within_bound): exact daily actives,
    exact trailing-``window_days`` actives, and a boolean pinning that
    the MERGEABLE-SKETCH path (per-day HLL sketches unioned over the
    window) lands within its 3·rsd guarantee of the exact count.

    THE production dashboard pattern at 100 TB: DAU/WAU/MAU wants a
    distinct count per (day, window) pair, and recomputing each window
    from raw events is O(days·window) scans — per-day sketches are
    built ONCE and any window is a cheap union of ``window_days``
    sketches (the incremental_distinct_estimate pattern, windowed).
    The sketch estimate itself is engine-specific, so it FOLDS to the
    invariant the guarantee states (the agg_approx_distinct
    discipline); the exact counts come from the contribution-explode:
    each distinct (day, user) pair contributes to the ``window_days``
    target days it is visible in — one bounded explode instead of a
    per-window rescan.

    Distributed shape: one distinct over (day, user) pairs feeds BOTH
    paths; the explode multiplies pairs by window_days (bounded);
    counts are combining aggregates.  The sketch union window is
    partition-less BY CONSTRUCTION on one row per day — bounded by
    calendar span, never by event volume (the seasonal_decompose
    argument).  Only observed days emit (the inner join drops
    contributions to dayless dates).
    """
    from pyspark.sql.window import Window as W

    day = F.datediff(
        F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
    ).cast("long")
    pairs = (
        df.select(day.alias("epoch_day"), F.col(user_col).alias("_u"))
        .distinct()
    )
    dau = pairs.groupBy("epoch_day").agg(F.count("*").alias("dau"))
    wau_exact = (
        pairs.select(
            F.explode(
                F.sequence(
                    F.col("epoch_day"),
                    F.col("epoch_day") + (window_days - 1),
                )
            ).alias("epoch_day"),
            "_u",
        )
        .groupBy("epoch_day")
        .agg(F.countDistinct("_u").alias("wau"))
    )
    sketches = pairs.groupBy("epoch_day").agg(
        F.hll_sketch_agg("_u").alias("_sk")
    )
    # RANGE on epoch_day, not ROWS over observed days: a calendar gap
    # must SHRINK the union to the days actually inside the trailing
    # window — a rows frame would reach back past the gap and union
    # sketches the exact contribution-explode path never counts
    # (the seasonal_decompose gap discipline)
    w = W.orderBy("epoch_day").rangeBetween(-(window_days - 1), 0)
    est = sketches.select(
        "epoch_day",
        F.hll_sketch_estimate(F.hll_union_agg("_sk").over(w)).alias("_est"),
    )
    return (
        dau.join(wau_exact, "epoch_day")
        .join(est, "epoch_day")
        .select(
            "epoch_day",
            "dau",
            "wau",
            (
                F.abs(F.col("_est").cast("double") - F.col("wau"))
                <= 3 * rsd * F.col("wau")
            ).alias("wau_within_bound"),
        )
    )


def audience_overlap(
    df: DataFrame,
    group_col: str,
    user_col: str,
    rsd: float = 0.02,
) -> DataFrame:
    """Pairwise audience overlap → one row per unordered group pair
    with (n_a, n_b, n_inter, n_union, inter_within_bound): exact
    distinct-user intersection/union for every pair of groups, plus a
    boolean pinning that the MERGEABLE-SKETCH path — per-group HLL
    sketches combined by inclusion–exclusion,
    ``est(A∩B) = est(A) + est(B) − est(A∪B)`` — lands within its
    error budget.

    The sketch-algebra completion next to incremental_distinct_estimate
    (union) and rolling_active_users (windowed union): intersection is
    NOT directly mergeable, and inclusion–exclusion is the standard
    production answer for "how many users do these two sources share"
    without re-scanning either source — each group's sketch builds
    once, every pairing is sketch arithmetic.  The estimate's error is
    bounded by the three constituent estimates' errors, so the pinned
    invariant is ``|est∩ − exact∩| ≤ 3·rsd·(|A| + |B| + |A∪B|)`` —
    relative to the UNION scale, the honest guarantee for small
    intersections of large sets.

    Distributed shape: one distinct over (group, user) pairs feeds the
    exact path (a user-keyed self-join — one shuffle on the user, pair
    counts combine map-side) AND the sketch path (one bounded
    per-group aggregate; pairing is a crossJoin of the GROUP-count-
    bounded sketch table, broadcast).  Group cardinality is assumed
    small (sources, event types); user cardinality is unbounded.
    """
    pairs = (
        df.select(F.col(group_col).alias("_g"), F.col(user_col).alias("_u"))
        .distinct()
    )
    sizes = pairs.groupBy("_g").agg(F.count("*").alias("_n"))
    inter = (
        pairs.alias("a")
        .join(
            pairs.alias("b"),
            (F.col("a._u") == F.col("b._u"))
            & (F.col("a._g") < F.col("b._g")),
        )
        .groupBy(
            F.col("a._g").alias("g1"), F.col("b._g").alias("g2")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sk = pairs.groupBy("_g").agg(F.hll_sketch_agg("_u").alias("_sk"))
    ests = (
        sk.alias("sa")
        .crossJoin(F.broadcast(sk.alias("sb")))
        .where(F.col("sa._g") < F.col("sb._g"))
        .select(
            F.col("sa._g").alias("g1"),
            F.col("sb._g").alias("g2"),
            F.hll_sketch_estimate(F.col("sa._sk")).alias("_ea"),
            F.hll_sketch_estimate(F.col("sb._sk")).alias("_eb"),
            F.hll_sketch_estimate(
                F.hll_union(F.col("sa._sk"), F.col("sb._sk"))
            ).alias("_eu"),
        )
    )
    sa = sizes.select(F.col("_g").alias("g1"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("_g").alias("g2"), F.col("_n").alias("n_b"))
    # drive from the all-pairs frame: DISJOINT pairs must emit with
    # n_inter = 0 (the intersection join has no row for them)
    j = (
        sa.crossJoin(sb)
        .where(F.col("g1") < F.col("g2"))
        .join(inter, ["g1", "g2"], "left")
        .na.fill({"n_inter": 0})
        .join(F.broadcast(ests), ["g1", "g2"])
    )
    n_union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    est_inter = F.col("_ea") + F.col("_eb") - F.col("_eu")
    return j.select(
        "g1",
        "g2",
        "n_a",
        "n_b",
        "n_inter",
        n_union.alias("n_union"),
        (
            F.abs(est_inter - F.col("n_inter"))
            <= 3 * rsd * (F.col("n_a") + F.col("n_b") + n_union)
        ).alias("inter_within_bound"),
    )


def watermark_lateness_audit(
    df: DataFrame,
    arrival_col: str,
    ts_col: str,
) -> DataFrame:
    """Event-time lateness audit → ONE row (n_events, n_late, p50_us,
    p95_us, p99_us, max_us): for every event, how far its event time
    falls behind the maximum event time of the rows that ARRIVED
    before it — the distribution that TUNES every watermark.

    "withWatermark('1 hour')" is a guess until this runs: the p99
    lateness IS the delay that keeps 99% of out-of-order events inside
    their windows, and n_late/n_events says whether the feed is
    ordered enough to bother.  The streaming operators in this package
    (tumbling/session windows, stream-stream joins, dedup TTL) all
    take that delay as their correctness/state-size dial.

    Exactness: lateness = max(prev_max(event_time_µs) − event_time_µs,
    0) over ``arrival_col`` order — the STRICTLY-EARLIER frame via
    distributed_prev_max (a row's own timestamp must not vaccinate
    it; the globally first row is on time by definition); percentiles
    are order statistics PICKED at exact integer indexes over the
    surrogate-key-ranked lateness table — all bigint µs, no float
    anywhere.

    Distributed shape: the prev-max and the ranking both ride the
    range-repartition + per-partition-offset construction (NO
    single-task global window over event volume); the totals row
    broadcasts; one final conditional-max aggregate.  EAGER: both
    passes pin partition ids (the _pin_partition_ids contract).
    """
    from ..operators.etl import with_surrogate_key
    from .windows import distributed_prev_max

    ev = df.select(
        F.col(arrival_col).alias("_arr"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
    )
    pm = distributed_prev_max(ev, ["_arr"], "_us", out_col="_pm")
    lat = pm.select(
        "_arr",
        F.greatest(
            F.coalesce(F.col("_pm") - F.col("_us"), F.lit(0)), F.lit(0)
        ).alias("_lat"),
    )
    ranked = with_surrogate_key(lat, "_rk", ["_lat", "_arr"])
    tot = ranked.agg(F.count("*").cast("long").alias("_n"))

    def pick(idx_expr: str, name: str):
        return F.max(
            F.when(F.expr(f"_rk = {idx_expr}"), F.col("_lat"))
        ).alias(name)

    return ranked.crossJoin(F.broadcast(tot)).agg(
        F.max("_n").alias("n_events"),
        F.sum(F.when(F.col("_lat") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        pick("(_n + 1) div 2", "p50_us"),
        pick("(19 * _n + 19) div 20", "p95_us"),
        pick("(99 * _n + 99) div 100", "p99_us"),
        F.max("_lat").alias("max_us"),
    )


def join_fanout_preflight(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join-cardinality pre-flight → ONE row (n_left, n_right,
    n_keys_left, n_keys_right, n_keys_both, predicted_rows,
    max_key_product, hot_ppm): the EXACT output size of
    ``left ⋈ right`` on the key — ``Σₖ c_left(k)·c_right(k)`` — and
    how much of it one key contributes, computed from the two
    key-counts tables WITHOUT running the join.

    The companion to key_skew_profile: skew says how a side is
    distributed, THIS says what the join will do — a many-to-many key
    multiplies, and a 10⁹-row "join" that is really a disguised
    cross-product announces itself here as predicted_rows ≫
    n_left + n_right with hot_ppm concentrated on one key.  Cost is
    two combining groupBys plus a counts⋈counts join bounded by
    distinct keys, not rows.

    Exactness: the per-key product sum IS the join's row count
    (bigint products summed in DECIMAL(38,0) — a hot key's c_a·c_b
    alone can pass 2^63; the emitted total caps back to bigint and is
    exact below 9.2e18 rows, past which the answer 'do not run this
    join' is already clear); hot_ppm is integer parts-per-million.
    """
    ca = left.groupBy(F.col(left_key).alias("_k")).agg(
        F.count("*").alias("_ca")
    )
    cb = right.groupBy(F.col(right_key).alias("_k")).agg(
        F.count("*").alias("_cb")
    )
    la = ca.agg(
        F.sum("_ca").alias("n_left"), F.count("*").alias("n_keys_left")
    )
    lb = cb.agg(
        F.sum("_cb").alias("n_right"), F.count("*").alias("n_keys_right")
    )
    prod = (F.col("_ca").cast("decimal(38,0)") * F.col("_cb")).alias("_p")
    both = (
        ca.join(cb, "_k")
        .select(prod)
        .agg(
            F.count("*").alias("n_keys_both"),
            # disjoint key sets: SUM/MAX over zero rows is NULL, and
            # "this join produces nothing" should read as 0
            F.coalesce(F.sum("_p").cast("long"), F.lit(0)).alias(
                "predicted_rows"
            ),
            F.coalesce(F.max("_p").cast("long"), F.lit(0)).alias(
                "max_key_product"
            ),
        )
    )
    return (
        la.crossJoin(F.broadcast(lb))
        .crossJoin(F.broadcast(both))
        .select(
            "n_left",
            "n_right",
            "n_keys_left",
            "n_keys_right",
            "n_keys_both",
            "predicted_rows",
            "max_key_product",
            F.expr(
                "CASE WHEN predicted_rows > 0 THEN "
                "max_key_product * 1000000 div predicted_rows "
                "ELSE 0 END"
            ).alias("hot_ppm"),
        )
    )
