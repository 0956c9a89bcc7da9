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


def ewma(
    df: DataFrame,
    key: str,
    order_cols: list,
    value_col: str,
    alpha: float,
    horizon: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average over each key's series —
    the smoothing pass under anomaly detection and trend features.

    Finite-horizon form: weights (1-α)^k over the last ``horizon``
    observations, normalized by the weights actually present (pandas
    ``adjust=True`` semantics truncated at the horizon — rows near the
    series head normalize over their shorter history instead of being
    biased toward 0).  The truncation error is bounded by
    (1-α)^horizon — pick horizon ≥ ln(tol)/ln(1-α) for tolerance tol
    (8 terms at α=0.3 ≈ 5.8e-2 tail weight; 60 terms ≈ 5e-10).

    Deliberately NOT the recursive infinite form: that is inherently
    sequential per key (an applyInPandas pass holding a whole key's
    series — the grouped-UDAF memory bound), while this is ``horizon``
    lag() expressions over ONE window — one shuffle on the key, fully
    codegen, and exactly reproducible cross-engine, which is what makes
    the timeseries_battery oracle hash-checkable: identical weight
    literals, identical left-to-right fp fold, identical single IEEE
    division.  The expression tree is built in lockstep with the DuckDB
    twin (plans/timeseries_queries.py::_ewma_sql) — change one, change
    both.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    w = W.partitionBy(key).orderBy(*order_cols)
    num = None
    den = None
    for k in range(horizon):
        wk = (1.0 - alpha) ** k
        xk = F.col(value_col) if k == 0 else F.lag(value_col, k).over(w)
        tn = F.when(xk.isNotNull(), F.lit(wk) * xk).otherwise(F.lit(0.0))
        td = F.when(xk.isNotNull(), F.lit(wk)).otherwise(F.lit(0.0))
        num = tn if num is None else num + tn
        den = td if den is None else den + td
    return df.withColumn(out_col, F.when(den > 0, num / den))


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step_us: int,
) -> DataFrame:
    """Downsample each key's series onto a regular ``step_us`` grid and
    linearly interpolate the empty buckets — the gap-filling resample
    under rate conversion and feature alignment (forward_fill's
    two-sided sibling).

    Three stages, all distributed: (1) bucket observations with pure
    integer arithmetic (e - e % step, no fp boundary risk) and average
    per bucket in exact DECIMAL before ONE cast-and-divide to double —
    a raw double SUM would be order-dependent fp; (2) build each key's
    grid with sequence(min, max, step) — row-local explode, span/step
    rows per key, no shuffle; (3) carry (prev, next) non-empty buckets
    with last/first IGNORE NULLS over the two running frames — the
    same one-shuffle construction as forward_fill — and interpolate
    prev + (next-prev)·(t-pt)/(nt-pt).  Head/tail buckets with only
    one neighbor extend it flat (bfill head / ffill tail).

    Grid volume is keys × (span/step): step must be sized to the
    series' span (a year at 1s grid = 31M rows/key).  Every expression
    is UDF-free and bit-reproducible (integer bucketing, exact-decimal
    averages, single IEEE ops) — the timeseries_battery hash-checks it
    against DuckDB verbatim.

    Output: (key, t, n_obs, v) — bucket epoch-µs, observation count,
    interpolated value.
    """
    if step_us < 1:
        raise ValueError("step_us must be >= 1")
    e = F.unix_micros(F.col(ts_col))
    obs = (
        df.select(
            F.col(key),
            (e - F.pmod(e, F.lit(step_us))).alias("t"),
            F.col(value_col).alias("_v"),
        )
        .groupBy(key, "t")
        .agg(
            F.count("_v").alias("n_obs"),
            F.when(
                F.count("_v") > 0,
                F.sum(F.col("_v").cast("decimal(18,6)")).cast("double")
                / F.count("_v"),
            ).alias("_obs"),
        )
    )
    grid = (
        obs.groupBy(key)
        .agg(F.min("t").alias("_mn"), F.max("t").alias("_mx"))
        .select(
            key,
            F.explode(
                F.sequence(F.col("_mn"), F.col("_mx"), F.lit(step_us))
            ).alias("t"),
        )
    )
    g = grid.join(obs, [key, "t"], "left").withColumn(
        "n_obs", F.coalesce("n_obs", F.lit(0))
    )
    wp = (
        W.partitionBy(key)
        .orderBy("t")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy(key)
        .orderBy("t")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    t_if_obs = F.when(F.col("_obs").isNotNull(), F.col("t"))
    g = (
        g.withColumn("_pv", F.last("_obs", ignorenulls=True).over(wp))
        .withColumn("_pt", F.last(t_if_obs, ignorenulls=True).over(wp))
        .withColumn("_nv", F.first("_obs", ignorenulls=True).over(wn))
        .withColumn("_nt", F.first(t_if_obs, ignorenulls=True).over(wn))
    )
    v = (
        F.when(F.col("_obs").isNotNull(), F.col("_obs"))
        .when(
            F.col("_pv").isNotNull() & F.col("_nv").isNotNull(),
            F.col("_pv")
            + (F.col("_nv") - F.col("_pv"))
            * (
                (F.col("t") - F.col("_pt")).cast("double")
                / (F.col("_nt") - F.col("_pt")).cast("double")
            ),
        )
        .when(F.col("_pv").isNotNull(), F.col("_pv"))
        .otherwise(F.col("_nv"))
    )
    return g.select(key, "t", "n_obs", v.alias("v"))


def rolling_robust_anomalies(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    value_col: str,
    window: int = 7,
    k: float = 3.0,
) -> DataFrame:
    """Rolling robust anomaly detector → every input row plus
    (n_obs, roll_med, roll_mad, is_anomaly): the trailing-``window``
    median and median-absolute-deviation per key timeline, flagging
    rows where |value − median| > k·1.4826·MAD.

    The robust twin of EWMA thresholding: a genuine spike cannot drag
    the baseline toward itself (50 % breakdown — the mad_outliers
    argument, applied to a MOVING window), so sensor glitches and
    metric spikes flag even inside a drifting series.  Warm-up rows
    (fewer than ``window`` observations yet) evaluate over what exists,
    so the output covers every row from the first.

    Exactness: the frame's ≤ ``window`` values ride a sorted array;
    median and MAD use the explicit lerp (a+b)/2 form REPEATED
    VERBATIM by the SQL oracle (the percentiles-battery reconciliation
    — never an engine's own median(), whose interpolation form can
    differ by an ulp); the flag compares doubles both engines derive
    through identical IEEE ops.  MAD = 0 frames (constant window) flag
    any deviation — the conventional degenerate-case reading.

    Distributed shape: ONE window shuffle on the key; per-row state is
    the ≤ ``window``-element array (collect_list over a rows frame),
    so memory is O(window) per row regardless of timeline length —
    unlike a per-key applyInPandas, no key's whole history ever
    co-locates.
    """
    w = (
        W.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.sort_array(F.collect_list(F.col(value_col)).over(w))

    def lerp_mid(a):
        n = F.size(a)
        lo = F.element_at(a, F.floor((n + 1) / 2).cast("int"))
        hi = F.element_at(a, (F.floor(n / 2) + 1).cast("int"))
        return (lo + hi) / 2

    base = df.select(
        key_col, *order_cols, value_col, arr.alias("_arr")
    ).withColumn("_med", lerp_mid(F.col("_arr")))
    darr = F.sort_array(
        F.transform(F.col("_arr"), lambda x: F.abs(x - F.col("_med")))
    )
    out = base.withColumn("_mad", lerp_mid(darr))
    return out.select(
        key_col,
        *order_cols,
        value_col,
        F.size("_arr").alias("n_obs"),
        F.col("_med").alias("roll_med"),
        F.col("_mad").alias("roll_mad"),
        (
            F.abs(F.col(value_col) - F.col("_med"))
            > F.lit(k) * F.lit(1.4826) * F.col("_mad")
        ).alias("is_anomaly"),
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    value_col: str,
    target: float,
    slack: float,
    threshold: float,
    scale: int = 1000,
) -> DataFrame:
    """Two-sided CUSUM drift detector → every input row plus
    (cusum_pos, cusum_neg, alarm_pos, alarm_neg): Page's cumulative-sum
    statistic per key timeline, in units of ``1/scale``.

    ``S⁺_i = max(0, S⁺_{i-1} + (x_i − target − slack))`` accumulates
    evidence that the mean has drifted ABOVE target+slack (and the
    mirrored S⁻ below target−slack); an alarm fires when the statistic
    crosses ``threshold``.  The textbook sequential changepoint test —
    small persistent drifts flag long before any single point would
    look anomalous to the rolling-MAD detector (its complement here).

    NO iteration: the max(0, ·) recurrence has the closed reflection
    form ``S_i = P_i − min(0, min_{j≤i} P_j)`` over the plain prefix
    sums P, so the whole statistic is two stacked running-window
    aggregates (sum, then min of the sum) — ONE shuffle on the key,
    same cost as a running total, where a naive per-key fold would be
    an applyInPandas that co-locates each key's entire history.

    Exactness: values quantize to integers once (``round(v·scale)``,
    HALF_UP in both engines) and everything downstream — prefix sums,
    running mins, the reflection, the threshold compare — is bigint
    arithmetic, bit-identical cross-engine regardless of window
    aggregation order (the EWMA/RRF integer-scaling discipline; a
    double prefix sum would be segment-tree-order-dependent in the
    oracle).
    """
    w = (
        W.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(W.unboundedPreceding, 0)
    )
    q = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    t_q = int(round(target * scale))
    k_q = int(round(slack * scale))
    h_q = int(round(threshold * scale))

    base = df.select(
        key_col,
        *order_cols,
        value_col,
        (q - F.lit(t_q) - F.lit(k_q)).alias("_xp"),
        (F.lit(t_q) - q - F.lit(k_q)).alias("_xn"),
    ).select(
        key_col,
        *order_cols,
        value_col,
        F.sum("_xp").over(w).alias("_pp"),
        F.sum("_xn").over(w).alias("_pn"),
    )
    s_pos = F.col("_pp") - F.least(F.min("_pp").over(w), F.lit(0))
    s_neg = F.col("_pn") - F.least(F.min("_pn").over(w), F.lit(0))
    return (
        base.withColumn("cusum_pos", s_pos)
        .withColumn("cusum_neg", s_neg)
        .select(
            key_col,
            *order_cols,
            value_col,
            "cusum_pos",
            "cusum_neg",
            (F.col("cusum_pos") > F.lit(h_q)).alias("alarm_pos"),
            (F.col("cusum_neg") > F.lit(h_q)).alias("alarm_neg"),
        )
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    period: int = 7,
    scale: int = 100,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method behind R's decompose()) → one row per (key, day) with
    (phase, n_obs, y, trend, seasonal, remainder): daily totals split
    into a centered-MA trend, per-phase seasonal means of the
    detrended series, and what's left.

    The triage layer for corpus telemetry: "is Monday's ingest dip
    seasonal or a real regression?" — rollmad/CUSUM flag THAT a series
    moved; decomposition says which component moved.  ``period`` must
    be odd (the symmetric centered window); trend and remainder are
    NULL on the ``period//2`` edge days of each key's series, the
    classical convention.  The centered window is a RANGE window on
    epoch_day — CALENDAR days, not observed rows — so a gap in a key's
    series never shifts the trend out of phase: days whose ±h calendar
    neighborhood is incomplete (edges AND gap-adjacent days) fall below
    ``n_obs == period`` and get NULL trend/remainder, exactly like the
    series edges.  Pre-fill via resample_interpolate when a trend
    through gaps is wanted instead.  Seasonal components are the raw phase means
    of the detrended series (uncentered: the centering shift is a
    constant both engines would have to float-sum; thresholds on the
    remainder don't see it).

    Exactness: daily totals quantize event values once
    (``round(v·scale)``) and sum as bigints; the trend rides the
    window SUM (never avg — count and sum stay integers until ONE
    final IEEE division each); the seasonal numerator
    ``period·y − trend_sum`` and its ``period·n_phase·scale``
    denominator are exact bigints with ONE division; the remainder is
    the same two IEEE subtractions in both engines.  Phase is
    days-since-epoch mod period — never a locale/engine-dependent
    dayofweek().

    Distributed shape: one groupBy to day grain (the only data-volume
    shuffle — everything after runs on one row per key-day, bounded
    by calendar span × key count, not event volume), one key window
    for the centered MA, one bounded (key, phase) aggregate joined
    back broadcast.
    """
    if period % 2 != 1:
        raise ValueError("period must be odd (symmetric centered MA)")
    h = period // 2
    day = F.to_date(F.col(ts_col))
    q = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    daily = (
        df.select(key_col, day.alias("day"), q.alias("_q"))
        .groupBy(key_col, "day")
        .agg(F.sum("_q").alias("y_scaled"))
        .withColumn(
            "epoch_day",
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            .cast("long"),
        )
    )
    # RANGE on epoch_day, not ROWS over observed days: calendar gaps
    # must starve the window (n_obs < period -> NULL trend), never
    # misalign it with the period phase
    w = W.partitionBy(key_col).orderBy("epoch_day").rangeBetween(-h, h)
    base = daily.select(
        key_col,
        "day",
        "epoch_day",
        "y_scaled",
        F.sum("y_scaled").over(w).alias("_tsum"),
        F.count("*").over(w).cast("long").alias("n_obs"),
    ).withColumn(
        "phase",
        F.pmod(
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")),
            F.lit(period),
        ).cast("long"),
    )
    # per-(key, phase) seasonal numerator over FULL-window days only:
    # period·y − trend_sum, an exact bigint
    seas = (
        base.where(F.col("n_obs") == period)
        .groupBy(key_col, "phase")
        .agg(
            F.sum(
                F.lit(period) * F.col("y_scaled") - F.col("_tsum")
            ).alias("_snum"),
            F.count("*").alias("_np"),
        )
    )
    full = F.col("n_obs") == period
    out = base.join(F.broadcast(seas), [key_col, "phase"], "left")
    y = F.col("y_scaled") / F.lit(float(scale))
    trend = F.when(
        full, F.col("_tsum") / F.lit(float(period * scale))
    )
    seasonal = (
        F.col("_snum")
        / (F.lit(period) * F.col("_np") * F.lit(scale)).cast("double")
    )
    return out.select(
        key_col,
        "day",
        "epoch_day",
        "phase",
        "n_obs",
        "y_scaled",
        y.alias("y"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        F.when(full, y - trend - seasonal).alias("remainder"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    ts_col: str,
    value_col: str,
    bucket_us: int = 86_400_000_000,
    scale: int = 100,
) -> DataFrame:
    """Time-weighted average over irregular samples → one row per
    (key, bucket) with (covered_us, n_pieces, twap): each observation's
    value holds until the key's next observation (the step-function /
    LOCF convention), intervals split exactly at bucket boundaries,
    and the bucket average weights each piece by its microsecond
    duration.

    THE aggregate for irregular telemetry — a plain avg() over-counts
    chatty periods (a sensor that reports 100× during an incident
    dominates the mean); TWAP weights by how long each value was
    *true*.  Each key's final observation opens an unbounded interval
    and is dropped — TWAP is defined over [first_obs, last_obs) —
    and zero-length intervals (duplicate timestamps) carry zero weight
    and are dropped before the explode — so among tied timestamps the
    LAST row by ``order_cols`` is the one whose value holds.
    ``order_cols`` must therefore be a total order (include a unique
    tie-break key) — the standard lead()/row_number contract
    everywhere in this package.

    Exactness: timestamps become integer epoch-µs once, values
    quantize once (round(v·scale)); every duration, boundary
    intersection (min/max of integer µs), and weighted sum is bigint;
    the bucket TWAP is ONE final IEEE division of exact integers.

    Distributed shape: one key-window shuffle for lead(), one explode
    over the buckets an interval spans (bounded by interval span ÷
    bucket, ~1–2 for any sane grid), one combining (key, bucket)
    aggregate — per-row state O(1), no key history co-location beyond
    the lead() frame.
    """
    b_lit = F.lit(bucket_us)
    w_next = W.partitionBy(key_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    s = F.unix_micros(F.col(ts_col))
    iv = (
        df.select(
            key_col,
            s.alias("_s"),
            F.lead(s).over(w_next).alias("_e"),
            F.round(F.col(value_col) * F.lit(scale))
            .cast("long")
            .alias("_q"),
        )
        .where(F.col("_e").isNotNull() & (F.col("_e") > F.col("_s")))
    )
    # buckets spanned: floor(s/B) .. floor((e-1)/B) — e > s keeps the
    # sequence ascending (the winnowing CSE lesson: expressions must be
    # total for every surviving row)
    pieces = iv.select(
        key_col,
        "_s",
        "_e",
        "_q",
        F.explode(
            F.sequence(
                F.expr("_s div " + str(bucket_us)),
                F.expr("(_e - 1) div " + str(bucket_us)),
            )
        ).alias("bucket"),
    ).select(
        key_col,
        "bucket",
        "_q",
        (
            F.least(F.col("_e"), (F.col("bucket") + 1) * b_lit)
            - F.greatest(F.col("_s"), F.col("bucket") * b_lit)
        ).alias("_w"),
    )
    return pieces.groupBy(key_col, "bucket").agg(
        F.sum("_w").alias("covered_us"),
        F.count("*").alias("n_pieces"),
        (
            F.sum(F.col("_q") * F.col("_w"))
            / (F.lit(float(scale)) * F.sum("_w"))
        ).alias("twap"),
    )


def linear_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-key OLS linear trend → one row per key with
    (n_obs, slope, intercept, r2): the closed-form least-squares fit
    of quantized ``value_col`` against integer ``x_col``.

    The trend summarizer after seasonal_decompose's per-day trend
    CURVE: one slope per key answers "is this source's daily volume
    growing, and how fast" for every source in one aggregate — the
    input to corpus rebalancing and capacity planning.

    Exactness: x must already be an integer grid (epoch days, bucket
    ids); y quantizes once (round(v·scale)).  All five sufficient
    statistics (n, Σx, Σy, Σxy, Σx²,— plus Σy² for r²) are exact
    DECIMAL(38,0) sums of bigint products, so the slope numerator
    n·Σxy − Σx·Σy and denominator n·Σx² − (Σx)² are EXACT; slope and
    r² are single IEEE divisions of exact quantities, intercept the
    same two ops in both engines.  Zero-variance keys (one obs, or a
    constant x) return NULL slope/intercept/r2 rather than dividing
    by zero; a perfectly flat y (Σ(y−ȳ)²=0) returns NULL r2.

    Distributed shape: ONE map-side-combining groupBy — no window, no
    join, no second pass; the classic sufficient-statistics pattern
    that scales to any key cardinality.
    """
    x = F.col(x_col).cast("long")
    y = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    g = df.groupBy(key_col).agg(
        F.count("*").cast("decimal(38,0)").alias("_n"),
        F.sum(x.cast("decimal(38,0)")).alias("_sx"),
        F.sum(y.cast("decimal(38,0)")).alias("_sy"),
        F.sum((x * y).cast("decimal(38,0)")).alias("_sxy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("_sxx"),
        F.sum((y * y).cast("decimal(38,0)")).alias("_syy"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    )
    den_x = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
        "double"
    )
    den_y = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast(
        "double"
    )
    slope = F.when(den_x != 0, num / den_x)
    scale_d = F.lit(float(scale))
    return g.select(
        key_col,
        F.col("_n").cast("long").alias("n_obs"),
        (slope / scale_d).alias("slope"),
        (
            (F.col("_sy").cast("double") / F.col("_n").cast("double")
             - slope * (F.col("_sx").cast("double")
                        / F.col("_n").cast("double")))
            / scale_d
        ).alias("intercept"),
        F.when((den_x != 0) & (den_y != 0), num * num / (den_x * den_y))
        .alias("r2"),
    )
