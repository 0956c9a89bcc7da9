"""EWMA smoothing and gap-filling linear interpolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
    ewma,
    resample_interpolate,
)

US = 1_000_000


def test_ewma_matches_pandas_adjusted_within_horizon(spark):
    import pandas as pd

    vals = [10.0, 12.0, 8.0, 14.0, 11.0, 9.0]
    rows = [(1, i, float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, i long, ts double, v double")
    got = {
        r.i: r.ewma
        for r in ewma(df, "k", ["ts", "i"], "v", alpha=0.3, horizon=8).collect()
    }
    # horizon(8) > series length(6): identical to pandas adjust=True
    exp = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
    for i in range(len(vals)):
        assert got[i] == pytest.approx(exp[i], abs=1e-12), i


def test_ewma_truncates_at_horizon(spark):
    vals = [100.0, 1.0, 1.0, 1.0, 1.0]
    rows = [(1, i, float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, i long, ts double, v double")
    got = {
        r.i: r.ewma
        for r in ewma(df, "k", ["ts", "i"], "v", alpha=0.5, horizon=2).collect()
    }
    # horizon=2: row 4 sees only rows 3,4 — the spike at row 0 is gone
    assert got[4] == pytest.approx(1.0)
    # row 1 normalizes over both available terms: (1 + .5*100)/1.5
    assert got[1] == pytest.approx((1.0 + 0.5 * 100.0) / 1.5)


def test_ewma_keys_are_independent(spark):
    rows = [(1, 0, 0.0, 10.0), (1, 1, 1.0, 20.0), (2, 0, 0.0, 99.0)]
    df = spark.createDataFrame(rows, "k long, i long, ts double, v double")
    got = {
        (r.k, r.i): r.ewma
        for r in ewma(df, "k", ["ts", "i"], "v", alpha=0.5, horizon=4).collect()
    }
    assert got[(2, 0)] == pytest.approx(99.0)  # no bleed from key 1
    assert got[(1, 1)] == pytest.approx((20.0 + 0.5 * 10.0) / 1.5)


def test_ewma_rejects_bad_params(spark):
    df = spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    with pytest.raises(ValueError):
        ewma(df, "k", ["ts"], "v", alpha=1.5)
    with pytest.raises(ValueError):
        ewma(df, "k", ["ts"], "v", alpha=0.3, horizon=0)


def _ts(sec: float):
    from datetime import datetime, timedelta, timezone

    return datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=sec)


def test_interpolate_fills_gap_linearly(spark):
    # observations at buckets 0 and 30 (10s grid): buckets 10,20 must
    # interpolate 1/3 and 2/3 of the way
    rows = [(1, _ts(0), 3.0), (1, _ts(30), 9.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {
        r.t: (r.v, r.n_obs)
        for r in resample_interpolate(df, "k", "ts", "v", 10 * US).collect()
    }
    t0 = min(out)
    step = 10 * US
    assert [out[t0 + i * step][0] for i in range(4)] == [3.0, 5.0, 7.0, 9.0]
    assert [out[t0 + i * step][1] for i in range(4)] == [1, 0, 0, 1]


def test_interpolate_averages_within_bucket_and_extends_edges(spark):
    # two obs land in the middle bucket (avg 4.0); the bucketed series is
    # [gap, 4.0, gap? ...] — head extends flat backward, tail forward
    rows = [
        (1, _ts(10), 2.0),
        (1, _ts(12), 6.0),
        (1, _ts(35), 8.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = sorted(
        (r.t, r.v, r.n_obs)
        for r in resample_interpolate(df, "k", "ts", "v", 10 * US).collect()
    )
    vs = [v for _, v, _ in got]
    ns = [n for _, _, n in got]
    # buckets: 10s (avg of 2,6 = 4.0), 20s (interp), 30s (8.0)
    assert vs[0] == pytest.approx(4.0)
    assert vs[1] == pytest.approx(6.0)  # halfway between 4 and 8
    assert vs[2] == pytest.approx(8.0)
    assert ns == [2, 0, 1]


def test_interpolate_single_observation_key(spark):
    rows = [(7, _ts(5), 42.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = resample_interpolate(df, "k", "ts", "v", 10 * US).collect()
    assert len(got) == 1 and got[0].v == 42.0 and got[0].n_obs == 1


def test_interpolate_rejects_bad_step(spark):
    df = spark.createDataFrame([(1, _ts(0), 1.0)], "k long, ts timestamp, v double")
    with pytest.raises(ValueError):
        resample_interpolate(df, "k", "ts", "v", 0)


def test_rolling_robust_anomalies_python_dual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        rolling_robust_anomalies,
    )

    # steady series with one planted spike; second key constant
    vals = [10.0, 11.0, 10.5, 10.2, 99.0, 10.8, 10.1, 10.9, 10.4]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    rows += [(2, i, 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, ["uid", "seq", "value"])
    out = {
        (r.uid, r.seq): r
        for r in rolling_robust_anomalies(
            df, "uid", ["seq"], "value", window=3, k=3.0
        ).collect()
    }

    def lerp_mid(a):
        a = sorted(a)
        n = len(a)
        return (a[(n + 1) // 2 - 1] + a[n // 2]) / 2

    for uid, series in ((1, vals), (2, [5.0] * 4)):
        for i in range(len(series)):
            frame = series[max(0, i - 2) : i + 1]
            med = lerp_mid(frame)
            mad = lerp_mid([abs(x - med) for x in frame])
            r = out[(uid, i)]
            assert r.n_obs == len(frame)
            assert r.roll_med == med, (uid, i, r.roll_med, med)
            assert r.roll_mad == mad
            assert r.is_anomaly == (
                abs(series[i] - med) > 3.0 * 1.4826 * mad
            )
    # the spike flags; its neighbors in a clean window do not
    assert out[(1, 4)].is_anomaly is True
    assert out[(1, 3)].is_anomaly is False
    # constant series: MAD 0, zero deviation never flags
    assert all(out[(2, i)].is_anomaly is False for i in range(4))


def test_cusum_changepoints_python_dual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        cusum_changepoints,
    )

    # key 1: steady around the 10.0 target, then a persistent +4 drift
    # no single point of which is anomalous; key 2: downward drift
    vals1 = [10.2, 9.8, 10.1, 9.9, 14.1, 13.9, 14.2, 14.0, 13.8]
    vals2 = [10.0, 9.9, 6.2, 6.0, 5.9, 6.1]
    rows = [(1, i, v) for i, v in enumerate(vals1)]
    rows += [(2, i, v) for i, v in enumerate(vals2)]
    df = spark.createDataFrame(rows, ["uid", "seq", "value"])
    out = {
        (r.uid, r.seq): r
        for r in cusum_changepoints(
            df, "uid", ["seq"], "value",
            target=10.0, slack=1.0, threshold=8.0, scale=1000,
        ).collect()
    }

    for uid, series in ((1, vals1), (2, vals2)):
        sp = sn = 0  # the textbook recurrence, scaled-integer
        for i, v in enumerate(series):
            q = round(v * 1000)
            sp = max(0, sp + q - 10000 - 1000)
            sn = max(0, sn + 10000 - q - 1000)
            r = out[(uid, i)]
            assert r.cusum_pos == sp, (uid, i, r.cusum_pos, sp)
            assert r.cusum_neg == sn, (uid, i, r.cusum_neg, sn)
            assert r.alarm_pos == (sp > 8000)
            assert r.alarm_neg == (sn > 8000)
    # the upward drift alarms eventually, never on the noise prefix
    assert out[(1, 8)].alarm_pos is True
    assert out[(1, 4)].alarm_pos is False
    assert not any(out[(1, i)].alarm_neg for i in range(9))
    # the downward drift alarms on the negative side only
    assert out[(2, 5)].alarm_neg is True
    assert not any(out[(2, i)].alarm_pos for i in range(6))


def test_seasonal_decompose_python_dual(spark):
    import collections
    import datetime as dt

    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    # 21 days, weekly pattern + linear trend, two events per day
    rows = []
    for d in range(21):
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(days=d, hours=3)
        base = 10.0 + d * 0.5 + [5, 0, 0, 0, 0, 0, -5][d % 7]
        rows.append(("k", ts, base))
        rows.append(("k", ts + dt.timedelta(hours=2), 1.0))
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = seasonal_decompose(df, "k", "ts", "v", period=7, scale=100).collect()

    daily = collections.defaultdict(int)
    for k, ts, v in rows:
        daily[ts.date()] += round(v * 100)
    days = sorted(daily)
    ys = [daily[d] for d in days]
    tsum = {}
    for i in range(len(days)):
        lo, hi = max(0, i - 3), min(len(days), i + 4)
        tsum[i] = (sum(ys[lo:hi]), hi - lo)
    snum = collections.defaultdict(lambda: [0, 0])
    epoch = dt.date(1970, 1, 1)
    for i, d in enumerate(days):
        if tsum[i][1] == 7:
            ph = (d - epoch).days % 7
            snum[ph][0] += 7 * ys[i] - tsum[i][0]
            snum[ph][1] += 1
    assert len(out) == 21
    for r in out:
        i = days.index(r.day)
        ph = (r.day - epoch).days % 7
        assert (r.phase, r.y_scaled, r.n_obs) == (ph, ys[i], tsum[i][1])
        y = ys[i] / 100.0
        se = snum[ph][0] / (7 * snum[ph][1] * 100.0)
        assert r.seasonal == se
        if tsum[i][1] == 7:
            tr = tsum[i][0] / 700.0
            assert r.trend == tr
            assert r.remainder == y - tr - se
        else:  # edge days: the classical NULL convention
            assert r.trend is None and r.remainder is None
    # the planted +5 phase carries the max seasonal component
    seas = {r.phase: r.seasonal for r in out}
    assert max(seas, key=lambda p: seas[p]) == (
        dt.date(2024, 1, 1) - epoch
    ).days % 7


def test_seasonal_decompose_calendar_gap(spark):
    """The centered MA is a RANGE window on epoch_day: a missing
    calendar day STARVES every window that spans it (n_obs < 7 ->
    NULL trend), it never slides later observations in out of phase."""
    import datetime as dt

    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    # 15 consecutive days with day 7 missing
    rows = [
        ("k", dt.datetime(2024, 1, 1) + dt.timedelta(days=d), 10.0 + d)
        for d in range(15)
        if d != 7
    ]
    out = {
        r.epoch_day: r
        for r in seasonal_decompose(
            spark.createDataFrame(rows, ["k", "ts", "v"]), "k", "ts", "v"
        ).collect()
    }
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert len(out) == 14 and d0 + 7 not in out
    # every observed day within ±3 CALENDAR days of the gap is starved
    for d in range(15):
        if d == 7:
            continue
        r = out[d0 + d]
        if 4 <= d <= 10:  # window spans the missing day
            assert r.n_obs == 6 and r.trend is None and r.remainder is None
        elif 3 <= d <= 11:
            assert r.n_obs == 7 and r.trend is not None
    # full windows away from the gap keep the exact integer-MA trend
    assert out[d0 + 3].trend == sum((10.0 + i) * 100 for i in range(7)) / 700.0


def test_seasonal_decompose_rejects_even_period(spark):
    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        seasonal_decompose,
    )

    df = spark.createDataFrame(
        [(1, _ts(0), 1.0)], "k long, ts timestamp, v double"
    )
    with pytest.raises(ValueError):
        seasonal_decompose(df, "k", "ts", "v", period=6)


def test_time_weighted_avg_python_dual(spark):
    import datetime as dt

    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        time_weighted_avg,
    )

    B = 3_600_000_000  # 1h buckets
    rows = [
        # key 1: 10 for 30min, then a tied pair at 01:00 (the later
        # seq's value 20 holds), crossing hour boundaries, then tail
        (1, 0, dt.datetime(2024, 1, 1, 0, 30), 10.0),
        (1, 1, dt.datetime(2024, 1, 1, 1, 0), 99.0),  # zero weight
        (1, 2, dt.datetime(2024, 1, 1, 1, 0), 20.0),  # holds 90min
        (1, 3, dt.datetime(2024, 1, 1, 2, 30), 5.0),  # final: dropped
        (2, 4, dt.datetime(2024, 1, 1, 0, 0), 7.0),   # single: dropped
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "ts", "v"])
    got = {
        (r.k, r.bucket): (r.covered_us, r.n_pieces, r.twap)
        for r in time_weighted_avg(
            df, "k", ["ts", "seq"], "ts", "v", bucket_us=B
        ).collect()
    }

    # python dual: step function split at boundaries
    import collections

    agg = collections.defaultdict(lambda: [0, 0, 0])  # wsum_q, w, n
    by_k = collections.defaultdict(list)
    for k, seq, ts, v in rows:
        by_k[k].append((int(ts.timestamp() * 1_000_000), seq, round(v * 100)))
    for k, obs in by_k.items():
        obs.sort(key=lambda t: (t[0], t[1]))
        for (s, _, q), (e, _, _) in zip(obs, obs[1:]):
            if e <= s:
                continue
            for b in range(s // B, (e - 1) // B + 1):
                w = min(e, (b + 1) * B) - max(s, b * B)
                cell = agg[(k, b)]
                cell[0] += q * w
                cell[1] += w
                cell[2] += 1
    exp = {
        kk: (w, n, qw / (100.0 * w)) for kk, (qw, w, n) in agg.items()
    }
    assert got == exp
    h0 = 473352  # 2024-01-01T00 in hours since epoch
    assert got[(1, h0)] == (1_800_000_000, 1, 10.0)
    assert got[(1, h0 + 1)] == (3_600_000_000, 1, 20.0)
    assert got[(1, h0 + 2)] == (1_800_000_000, 1, 20.0)
    assert not any(k == 2 for k, _ in got)


def test_linear_trend_exact_fit_and_degenerates(spark):
    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        linear_trend,
    )

    rows = []
    for i in range(10):
        rows.append(("A", i, 3.0 + 2.0 * i))  # exact line: r2 = 1
        rows.append(("B", i, 7.5))            # constant y
    rows.append(("C", 5, 1.0))                # single obs
    # noisy key: verify against numpy's lstsq-free closed form
    noisy = [4.1, 3.9, 5.2, 6.0, 5.8, 7.1]
    rows += [("D", i, v) for i, v in enumerate(noisy)]
    df = spark.createDataFrame(rows, ["k", "x", "v"])
    out = {r.k: r for r in linear_trend(df, "k", "x", "v", scale=100).collect()}

    assert abs(out["A"].slope - 2.0) < 1e-12
    assert abs(out["A"].intercept - 3.0) < 1e-12
    assert out["A"].r2 == 1.0
    assert out["B"].slope == 0.0 and out["B"].r2 is None
    assert out["B"].intercept == 7.5
    assert out["C"].slope is None and out["C"].intercept is None

    # python dual over the quantized values (the operator's contract)
    ys = [round(v * 100) for v in noisy]
    xs = list(range(6))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    num, dx, dy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert out["D"].slope == (num / dx) / 100.0
    assert out["D"].r2 == num * num / (dx * dy)
