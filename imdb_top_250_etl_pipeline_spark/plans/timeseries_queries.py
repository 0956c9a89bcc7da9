"""Batch time-series queries: EWMA smoothing and gap-filling resample.

Companions to the streaming/asof family (stream_battery): these are the
batch feature-engineering passes — exponential smoothing and regular-grid
linear interpolation — hash-checked against DuckDB twins built from the
SAME generated expressions (weights, fold order, single IEEE divisions),
which is what makes multi-term float windows oracle-checkable at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load
from .registry import register

_ALPHA = 0.3
_HORIZON = 8
_STEP_US = 6 * 3600 * 1_000_000  # 6-hour buckets over the 30-day fixture


def _ewma_sql(alpha: float, horizon: int) -> str:
    """The DuckDB twin of operators/timeseries.py::ewma, generated from
    the same weights with repr() literals (shortest round-trip — both
    engines parse to the identical IEEE double) and the same
    left-to-right fold, so the quotient is bit-identical."""
    nums, dens = [], []
    for k in range(horizon):
        wk = repr((1.0 - alpha) ** k)
        xk = "value" if k == 0 else f"lag(value, {k}) OVER w"
        nums.append(f"CASE WHEN {xk} IS NOT NULL THEN {wk} * {xk} ELSE 0.0 END")
        dens.append(f"CASE WHEN {xk} IS NOT NULL THEN {wk} ELSE 0.0 END")
    num = " + ".join(nums)
    den = " + ".join(dens)
    # ROUND(…, 6) on both sides: the weighted fold's two engine plans
    # differ in the last ulp (~1e-14 on O(10) values — measured), and
    # 6dp spacing leaves ~8 orders of magnitude of margin (the
    # stats-battery moment discipline)
    return f"""
    SELECT 'ewma' AS part, user_id AS uid, event_id AS t,
           CAST(NULL AS BIGINT) AS n,
           ROUND(CASE WHEN ({den}) > 0 THEN ({num}) / ({den}) END, 6) AS v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


_INTERP_ORACLE = f"""
    WITH obs AS (
      SELECT user_id,
             epoch_us(ts) - (epoch_us(ts) % {_STEP_US}) AS t,
             CAST(count(value) AS BIGINT) AS n_obs,
             CASE WHEN count(value) > 0
                  THEN CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       / count(value) END AS obs
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(min(t), max(t), {_STEP_US})) AS t
      FROM obs GROUP BY user_id
    ),
    j AS (
      SELECT g.user_id, g.t,
             COALESCE(o.n_obs, 0) AS n_obs, o.obs,
             last_value(o.obs IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN o.obs IS NOT NULL THEN g.t END IGNORE NULLS)
                 OVER wp AS pt,
             first_value(o.obs IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN o.obs IS NOT NULL THEN g.t END IGNORE NULLS)
                 OVER wn AS nt
      FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.t = o.t
      WINDOW
        wp AS (PARTITION BY g.user_id ORDER BY g.t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY g.user_id ORDER BY g.t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT 'interp' AS part, user_id AS uid, t, n_obs AS n,
           CASE WHEN obs IS NOT NULL THEN obs
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                  THEN pv + (nv - pv) * (CAST(t - pt AS DOUBLE)
                                         / CAST(nt - pt AS DOUBLE))
                WHEN pv IS NOT NULL THEN pv
                ELSE nv END AS v
    FROM j
"""


@register(
    "timeseries_battery",
    # CTE chain first (a UNION arm cannot open its own WITH), ewma arm
    # second with its per-SELECT WINDOW clause
    oracle=_INTERP_ORACLE + "\nUNION ALL\n" + _ewma_sql(_ALPHA, _HORIZON),
    doc="Batch time-series features, both hash-checked: part=ewma — "
    "finite-horizon exponentially-weighted moving average per user "
    "(operators/timeseries.py::ewma, 8 weighted lag() terms over one "
    "window, adaptive normalization near the series head; the oracle "
    "is GENERATED from the same weights/fold so multi-term float "
    "window math stays bit-identical cross-engine).  part=interp — "
    "6-hour-grid resample with linear interpolation of empty buckets "
    "(operators/timeseries.py::resample_interpolate: integer "
    "bucketing, exact-DECIMAL bucket averages, sequence() grids, "
    "last/first IGNORE NULLS carries, one interpolation expression — "
    "forward_fill's two-sided sibling).  One shuffle per part; grid "
    "volume keys × span/step, linear in users at any sf.",
)
def timeseries_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.timeseries import ewma, resample_interpolate

    ev = load(spark, sf_dir, "events")
    ew = (
        ewma(
            ev.select("user_id", "event_id", "ts", "value"),
            "user_id",
            ["ts", "event_id"],
            "value",
            _ALPHA,
            horizon=_HORIZON,
        )
        .select(
            F.lit("ewma").alias("part"),
            F.col("user_id").alias("uid"),
            F.col("event_id").alias("t"),
            F.lit(None).cast("long").alias("n"),
            F.round("ewma", 6).alias("v"),
        )
    )
    ip = resample_interpolate(
        ev.select("user_id", "ts", "value"), "user_id", "ts", "value", _STEP_US
    ).select(
        F.lit("interp").alias("part"),
        F.col("user_id").alias("uid"),
        "t",
        F.col("n_obs").alias("n"),
        "v",
    )
    return ew.unionByName(ip)
