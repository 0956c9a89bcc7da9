"""Numpy pins for the rows-only statistical aggregates (fp accumulation
order differs across engines, so these skip the DuckDB oracle)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from imdb_top_250_etl_pipeline_spark.plans import QUERIES, lookup
from imdb_top_250_etl_pipeline_spark.sources import load


def _group_values(spark, table, key, val):
    out: dict[str, np.ndarray] = {}
    for r in load(spark, SF_SMOKE, table).select(key, val).collect():
        out.setdefault(r[0], []).append(r[1])
    return {k: np.array(v) for k, v in out.items()}


def test_stats_moments_match_numpy(spark):
    got = {
        r.l_returnflag: r
        for r in lookup("agg_stats_moments").fn(spark, SF_SMOKE).collect()
    }
    qty = _group_values(spark, "lineitem", "l_returnflag", "l_quantity")
    for flag, x in qty.items():
        r = got[flag]
        assert abs(r.qty_stddev - np.std(x, ddof=1)) < 1e-4
        assert abs(r.qty_var - np.var(x, ddof=1)) < 1e-3
        n = len(x)
        m, s = x.mean(), x.std(ddof=0)
        skew = ((x - m) ** 3).mean() / s**3
        kurt = ((x - m) ** 4).mean() / s**4 - 3
        assert abs(r.qty_skew - skew) < 1e-4, (flag, r.qty_skew, skew)
        assert abs(r.qty_kurt - kurt) < 1e-3, (flag, r.qty_kurt, kurt)


def test_percentiles_match_numpy_linear(spark):
    got = {
        r.o_orderpriority: r
        for r in lookup("agg_percentiles").fn(spark, SF_SMOKE).collect()
    }
    totals = _group_values(spark, "orders", "o_orderpriority", "o_totalprice")
    for prio, x in totals.items():
        r = got[prio]
        assert abs(r.p50 - np.percentile(x, 50, method="linear")) < 1e-3
        assert abs(r.p90 - np.percentile(x, 90, method="linear")) < 1e-3
        assert abs(r.p99 - np.percentile(x, 99, method="linear")) < 1e-3
        # the sketch-vs-exact invariant is folded to a boolean in the
        # query itself (oracle pins it true); assert it held here too
        assert r.approx_ok


def test_incremental_distinct_sketch_union(spark):
    """Mergeable HLL distinct: per-day sketches unioned must (a) estimate
    the month's exact distinct within the sketch rsd and (b) equal the
    single-pass whole-table sketch estimate (merge-consistency — the
    property that makes incremental maintenance sound)."""
    from pyspark.sql import functions as F

    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        incremental_distinct_estimate,
    )
    from imdb_top_250_etl_pipeline_spark.sources import load

    from .conftest import SF_CORRECT

    ev = load(spark, SF_CORRECT, "events")
    row = incremental_distinct_estimate(ev, "user_id", F.to_date("ts")).collect()[0]
    exact = ev.select("user_id").distinct().count()
    n_days = ev.select(F.to_date("ts")).distinct().count()
    assert row.n_buckets == n_days
    assert abs(row.estimate - exact) <= 0.05 * exact
    whole = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0].e
    # merge-consistency within a small relative tolerance, not exact float
    # equality: DataSketches estimates streamed sketches with HIP but
    # union results with the composite estimator, so bit-equality only
    # holds while fixture cardinality keeps sketches in exact/coupon mode.
    assert abs(row.estimate - whole) <= max(0.02 * whole, 1.0)


def test_profile_columns_nulls_and_extrema(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        profile_columns,
    )

    rows = [
        (1, "b", 2.5),
        (2, None, -1.0),
        (3, "a", None),
        (4, "a", None),
        (None, None, 0.25),
    ]
    df = spark.createDataFrame(rows, "k long, s string, v double")
    got = {r.col_name: r for r in profile_columns(df, ["k", "s", "v"]).collect()}
    assert all(r.n_rows == 5 for r in got.values())
    k, s, v = got["k"], got["s"], got["v"]
    assert (k.n_nulls, k.n_distinct, k.min_s, k.max_s) == (1, 4, "1", "4")
    assert (s.n_nulls, s.n_distinct, s.min_s, s.max_s) == (2, 2, "a", "b")
    # extrema on the native type THEN cast: "-1.0" sorts after "0.25"
    # lexicographically, so a cast-first implementation would fail here
    assert (v.n_nulls, v.n_distinct, v.min_s, v.max_s) == (2, 3, "-1.0", "2.5")


def test_population_stability_hand_computed(spark):
    import math

    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        population_stability,
    )

    # identical distributions -> psi == 0 exactly (p == q every bucket)
    ref = spark.range(100).select((F.col("id") % 10).cast("double").alias("x"))
    out = population_stability(ref, ref, "x", n_buckets=10).collect()
    assert all(r.contrib == 0.0 for r in out)
    assert out[0].psi == 0.0

    # mass moved entirely out of the top half -> hand-computed psi
    cur = spark.range(100).select((F.col("id") % 5).cast("double").alias("x"))
    got = {r.bucket: r for r in population_stability(ref, cur, "x", n_buckets=10).collect()}
    # ref buckets each hold 10% of mass; cur: values 0..4 over ref's
    # [0,9] edges -> width .9 buckets; empty buckets floor at eps
    eps = 1e-4
    p, q_hit, q_miss = 0.1, 0.2, eps
    expect_hit = (p - q_hit) * math.log(p / q_hit)
    expect_miss = (p - q_miss) * math.log(p / q_miss)
    hit = [b for b, r in got.items() if r.p_cur > eps]
    miss = [b for b, r in got.items() if r.p_cur == eps]
    assert len(hit) == 5 and len(miss) == 5
    for b in hit:
        assert got[b].contrib == pytest.approx(expect_hit, rel=1e-12)
    for b in miss:
        assert got[b].contrib == pytest.approx(expect_miss, rel=1e-12)
    assert got[0].psi == pytest.approx(5 * expect_hit + 5 * expect_miss, rel=1e-12)


def test_merge_rollup_incremental_equals_full_recompute(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        merge_rollup,
        rollup_state,
    )
    from imdb_top_250_etl_pipeline_spark.sources import load

    ev = load(spark, SF_SMOKE, "events").select("user_id", "value")
    # three "daily" batches arriving incrementally
    batches = [ev.where(F.col("user_id") % 3 == i) for i in range(3)]
    state = rollup_state(batches[0], ["user_id"], "value")
    for b in batches[1:]:
        state = merge_rollup(
            state, rollup_state(b, ["user_id"], "value"), ["user_id"]
        )
    whole = rollup_state(ev, ["user_id"], "value")
    inc = {r.user_id: r for r in state.collect()}
    full = {r.user_id: r for r in whole.collect()}
    assert set(inc) == set(full)
    for uid, w in full.items():
        g = inc[uid]
        assert g.n == w.n and g.lo == w.lo and g.hi == w.hi, uid
        # sums: incremental adds batch partials in a fixed order; allow
        # fp reassociation at the 1e-9 level
        assert abs(g.total - w.total) <= 1e-9 * max(1.0, abs(w.total)), uid
    # disjoint-key merge: batch-only keys insert, state-only carry over
    extra = spark.createDataFrame(
        [(10**9, 1, 5.0, 5.0, 5.0)], "user_id long, n long, total double, lo double, hi double"
    )
    merged = merge_rollup(state, extra, ["user_id"])
    assert merged.count() == whole.count() + 1


def test_mad_outliers_hand_computed_and_breakdown(spark):
    """Known group: median/MAD closed-form, the planted wild value is
    flagged, and — the breakdown property — the same data through a
    mean±3σ rule would NOT flag it (σ inflated by the outlier itself)."""
    import numpy as np

    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        mad_outliers,
    )

    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, x double"
    )
    out = mad_outliers(df, "x", ["grp"]).collect()[0]
    med = float(np.percentile(vals, 50))  # 12.5
    adev = sorted(abs(v - med) for v in vals)
    mad = float(np.percentile(adev, 50))  # 1.5
    assert out["median"] == round(med, 4)
    assert out["mad"] == round(mad, 4)
    # only 1000.0 is beyond 3 * 1.4826 * MAD of the median
    assert out["n_outliers"] == 1
    assert out["outlier_frac"] == round(1 / 6, 6)
    # breakdown contrast: mean±3σ misses the very outlier that
    # inflated σ
    mean, sd = float(np.mean(vals)), float(np.std(vals, ddof=1))
    assert abs(1000.0 - mean) < 3 * sd


def test_quantile_state_merge_rank_error_bounded(spark):
    """Per-day grids merged into global quantiles: the merged estimate's
    RANK in the full data must sit within 2/grid of the target p for
    every probe — the mergeable-summary contract."""
    from pyspark.sql import functions as F

    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        merged_quantile_estimate,
        quantile_state,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        F.to_date("ts").alias("day"), "value"
    )
    grid = 32
    st = quantile_state(ev, "value", "day", grid=grid)
    probes = [0.1, 0.5, 0.9, 0.99]
    est = {
        r["p"]: r["est"]
        for r in merged_quantile_estimate(st, probes).collect()
    }
    n = ev.count()
    for p in probes:
        rank = ev.where(F.col("value") <= est[p]).count() / n
        assert abs(rank - p) <= 2.0 / grid, (p, rank, est[p])


def test_quantile_state_single_partition_is_exact_grid(spark):
    """One partition's state is the exact lerp quantile grid — merging
    a single summary reproduces its own grid points."""
    from pyspark.sql import functions as F

    import numpy as np

    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        merged_quantile_estimate,
        quantile_state,
    )

    vals = [float(v) for v in range(101)]  # 0..100: percentile p = 100p
    df = spark.createDataFrame([("d", v) for v in vals], "day string, x double")
    st = quantile_state(df, "x", "day", grid=10)
    row = st.collect()[0]
    assert row["n"] == 101
    assert row["qs"] == [float(v) for v in range(0, 101, 10)]
    est = {
        r["p"]: r["est"]
        for r in merged_quantile_estimate(st, [0.5, 0.9]).collect()
    }
    # grid points carry their own rank: p=0.5 -> 50 exactly
    assert est[0.5] == 50.0
    assert est[0.9] == 90.0


# ---------------------------------------------------------------------------
# count–min sketch — exact Python dual, mergeability, estimate guarantee
# (the sf0.01 run is oracle-checked in test_oracle_parity[agg_count_min])
# ---------------------------------------------------------------------------


def _cms_dual(values, width, depth):
    """Pure-Python CMS over the same md5 bucket derivation."""
    import hashlib
    from collections import Counter

    sk = Counter()
    for v in values:
        for d in range(depth):
            h = hashlib.md5(f"{d}:{v}".encode()).hexdigest()
            sk[(d, int(h[:15], 16) % width)] += 1
    return sk


def test_cms_sketch_matches_python_dual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        count_min_sketch,
    )

    vals = [f"k{i % 37}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x string").repartition(4)
    got = {
        (r.d, r.pos): r.cnt
        for r in count_min_sketch(df, "x", width=32, depth=3).collect()
    }
    assert got == dict(_cms_dual(vals, 32, 3))


def test_cms_estimates_never_undercount_and_bound(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        cms_point_estimates,
        count_min_sketch,
    )
    from collections import Counter

    # zipf-ish: item i appears 200//(i+1) times over a 32-bucket width
    vals = [f"w{i}" for i in range(60) for _ in range(200 // (i + 1))]
    exact = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "x string").repartition(4)
    sk = count_min_sketch(df, "x", width=32, depth=4)
    items = df.distinct()
    got = {
        r.item: r.est
        for r in cms_point_estimates(sk, items, "x", width=32, depth=4).collect()
    }
    n = len(vals)
    assert set(got) == set(exact)
    for item, est in got.items():
        assert est >= exact[item], (item, est, exact[item])
        # classical bound with depth 4 on a FIXED fixture: comfortably met
        assert est <= exact[item] + 2 * n / 32 + 1


def test_cms_merges_by_bucket_addition(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        count_min_sketch,
    )
    from pyspark.sql import functions as F

    vals = [f"m{i % 11}" for i in range(300)]
    half_a, half_b = vals[:150], vals[150:]
    mk = lambda vs: count_min_sketch(
        spark.createDataFrame([(v,) for v in vs], "x string"),
        "x", width=16, depth=3,
    )
    whole = {(r.d, r.pos): r.cnt for r in mk(vals).collect()}
    merged = {
        (r.d, r.pos): r.cnt
        for r in mk(half_a)
        .unionByName(mk(half_b))
        .groupBy("d", "pos")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .collect()
    }
    assert whole == merged


def _bloom_dual(values, m, k):
    import hashlib

    bits = set()
    for v in values:
        for h in range(k):
            d = hashlib.md5(f"{h}:{v}".encode()).hexdigest()
            bits.add(int(d[:15], 16) % m)
    return bits


def test_bloom_build_matches_python_dual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        bloom_filter_build,
    )

    vals = [f"k{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "x string").repartition(4)
    got = {
        r.pos for r in bloom_filter_build(df, "x", m_bits=512, k=3).collect()
    }
    assert got == _bloom_dual(vals, 512, 3)


def test_bloom_probe_no_false_negatives_and_fpr(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        bloom_filter_build,
        bloom_probe,
    )

    members = [f"in{i}" for i in range(300)]
    outsiders = [f"out{i}" for i in range(700)]
    mdf = spark.createDataFrame([(v,) for v in members], "x string")
    pdf = spark.createDataFrame(
        [(v,) for v in members + outsiders], "x string"
    )
    bloom = bloom_filter_build(mdf, "x", m_bits=4096, k=3)
    got = {
        r.item: r.maybe_member
        for r in bloom_probe(bloom, pdf, "x", m_bits=4096, k=3).collect()
    }
    # zero false negatives: every inserted value probes true
    assert all(got[v] is True for v in members)
    # false positives exist in principle but are rare at n/m=300/4096:
    # expected FPR (1-e^(-3*300/4096))^3 ~ 0.8%; assert a loose 5% cap
    # on this FIXED fixture (deterministic hashing: no flakes)
    fps = sum(1 for v in outsiders if got[v])
    assert fps / len(outsiders) < 0.05, fps
    # the python dual agrees probe by probe
    bits = _bloom_dual(members, 4096, 3)
    import hashlib

    for v in members + outsiders:
        expect = all(
            int(hashlib.md5(f"{h}:{v}".encode()).hexdigest()[:15], 16) % 4096
            in bits
            for h in range(3)
        )
        assert got[v] is expect, v


def test_bloom_merges_by_union_distinct(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        bloom_filter_build,
    )

    vals = [f"m{i}" for i in range(240)]
    half_a, half_b = vals[:120], vals[120:]
    mk = lambda vs: bloom_filter_build(
        spark.createDataFrame([(v,) for v in vs], "x string"),
        "x", m_bits=1024, k=4,
    )
    whole = {r.pos for r in mk(vals).collect()}
    merged = {
        r.pos for r in mk(half_a).unionByName(mk(half_b)).distinct().collect()
    }
    assert whole == merged


def test_distributed_cumsum_multi_column_matches_singles(spark):
    from imdb_top_250_etl_pipeline_spark.operators.windows import (
        distributed_cumsum,
    )

    rows = [(i, i % 7, (i * 3) % 5) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "x", "y"]).repartition(8)
    multi = {
        r.id: (r.cx, r.cy)
        for r in distributed_cumsum(
            df, ["id"], ["x", "y"], ["cx", "cy"]
        ).collect()
    }
    sx = {
        r.id: r.cx
        for r in distributed_cumsum(df, ["id"], "x", "cx").collect()
    }
    sy = {
        r.id: r.cy
        for r in distributed_cumsum(df, ["id"], "y", "cy").collect()
    }
    assert len(multi) == 500
    for i in multi:
        assert multi[i] == (sx[i], sy[i])
    # exact python dual
    run_x = run_y = 0
    for i, x, y in sorted(rows):
        run_x += x
        run_y += y
        assert multi[i] == (run_x, run_y)


def _ks_dual(a_vals, b_vals):
    na, nb = len(a_vals), len(b_vals)
    vs = sorted(set(a_vals) | set(b_vals))
    best = max(
        (
            abs(
                sum(1 for x in a_vals if x <= v) * nb
                - sum(1 for x in b_vals if x <= v) * na
            ),
            -v,
        )
        for v in vs
    )
    return best[0], best[0] / (na * nb), -best[1]


def test_ks_statistic_exact_python_dual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        ks_statistic,
    )

    a_vals = [1.0, 2.0, 2.0, 3.0, 5.0]
    b_vals = [2.0, 3.0, 4.0, 4.0]
    A = spark.createDataFrame([(v,) for v in a_vals], "x double")
    B = spark.createDataFrame([(v,) for v in b_vals], "x double")
    r = ks_statistic(A, B, "x").collect()[0]
    ds, ks, at = _ks_dual(a_vals, b_vals)
    assert (r.n_a, r.n_b, r.d_scaled, r.at_v) == (5, 4, ds, at)
    assert abs(r.ks - ks) < 1e-15

    # identical samples: zero gap, tie-break picks the smallest value
    r0 = ks_statistic(A, A, "x").collect()[0]
    assert r0.d_scaled == 0 and r0.ks == 0.0 and r0.at_v == 1.0

    # disjoint supports: the gap reaches n_a*n_b (ks = 1)
    C = spark.createDataFrame([(v + 100.0,) for v in b_vals], "x double")
    r1 = ks_statistic(A, C, "x").collect()[0]
    assert r1.ks == 1.0 and r1.at_v == 5.0

    # a shifted heavy sample against the python dual (ties included)
    import random

    rng = random.Random(7)
    big_a = [float(rng.randint(0, 40)) for _ in range(300)]
    big_b = [float(rng.randint(5, 45)) for _ in range(200)]
    A2 = spark.createDataFrame([(v,) for v in big_a], "x double")
    B2 = spark.createDataFrame([(v,) for v in big_b], "x double")
    r2 = ks_statistic(A2, B2, "x").collect()[0]
    ds2, ks2, at2 = _ks_dual(big_a, big_b)
    assert (r2.d_scaled, r2.at_v) == (ds2, at2)
    assert abs(r2.ks - ks2) < 1e-15


def test_chi_square_cells_exact_python_dual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        chi_square_cells,
    )

    rows = (
        [("en", "web")] * 30
        + [("en", "book")] * 10
        + [("fr", "web")] * 5
        + [("fr", "book")] * 15
        + [("de", "web")] * 8
        + [(None, "web")] * 3  # nulls excluded
        + [("de", None)] * 2
    )
    df = spark.createDataFrame(rows, ["lang", "src"])
    got = {
        (r.a, r.b): r for r in chi_square_cells(df, "lang", "src").collect()
    }

    from collections import Counter

    clean = [(a, b) for a, b in rows if a is not None and b is not None]
    o = Counter(clean)
    na = Counter(a for a, _ in clean)
    nb = Counter(b for _, b in clean)
    n = len(clean)
    assert set(got) == set(o)
    chi2 = 0.0
    for (a, b), cnt in o.items():
        r = got[(a, b)]
        assert (r.observed, r.n_a, r.n_b, r.n) == (cnt, na[a], nb[b], n)
        d = cnt * n - na[a] * nb[b]
        expect = (float(d) * float(d)) / float(na[a] * nb[b] * n)
        assert abs(r.contrib - expect) < 1e-12, ((a, b), r.contrib, expect)
        e = na[a] * nb[b] / n
        chi2 += (cnt - e) ** 2 / e
    # the classical form agrees with the integer-scaled per-cell sum
    assert abs(sum(r.contrib for r in got.values()) - chi2) < 1e-9

    # independence: contribs vanish when the columns are independent
    ind = [(a, b) for a in ("x", "y") for b in ("p", "q") for _ in range(10)]
    out = chi_square_cells(
        spark.createDataFrame(ind, ["lang", "src"]), "lang", "src"
    ).collect()
    assert all(r.contrib == 0.0 for r in out)


def test_benford_profile_exact_python_dual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        BENFORD_P,
        benford_profile,
    )

    vals = [
        1.23, 19.99, 123.45, 0.019,  # digit 1
        2.5, 250.0,                  # digit 2
        0.031,                       # digit 3
        9.99,                        # digit 9 (999 cents)
        -3.5,                        # abs -> digit 3
        0.0, None, 0.004,            # zero cents after scaling: dropped
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r.digit: r for r in benford_profile(df, "x", scale=100).collect()}

    expect = {}
    for v in vals:
        if v is None:
            continue
        cents = abs(round(v * 100))
        if cents == 0:
            continue
        d = int(str(cents)[0])
        expect[d] = expect.get(d, 0) + 1
    total = sum(expect.values())
    assert {d: r.n for d, r in out.items()} == expect
    for d, r in out.items():
        assert r.n_total == total
        assert abs(r.p - expect[d] / total) < 1e-15
        assert r.expected == BENFORD_P[d]
        assert abs(r.dev - (expect[d] / total - BENFORD_P[d])) < 1e-15
    # a benford-conforming sample scores near zero total |dev|
    import math

    conforming = [
        10 ** (i / 997.0) for i in range(2991)
    ]  # log-uniform over 3 decades
    dfc = spark.createDataFrame([(v,) for v in conforming], "x double")
    rows = benford_profile(dfc, "x", scale=100).collect()
    assert sum(abs(r.dev) for r in rows) < 0.02


def test_key_skew_profile_exact(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        key_skew_profile,
    )

    # counts 1,1,2,6: S = 1+2+6+24 = 33, gini = (66-50)/40 = 0.4
    rows = [("a",), ("b",)] + [("c",)] * 2 + [("d",)] * 6
    r = key_skew_profile(
        spark.createDataFrame(rows, ["k"]), "k"
    ).collect()[0]
    assert (r.n_rows, r.n_keys, r.max_count, r.top1_ppm) == (
        10, 4, 6, 600000,
    )
    assert (r.p50_count, r.p90_count, r.p99_count) == (1, 6, 6)
    assert r.gini == 0.4
    # perfectly uniform counts: gini exactly 0, flat percentiles
    r2 = key_skew_profile(
        spark.createDataFrame([(c,) for c in "xxyyzz"], ["k"]), "k"
    ).collect()[0]
    assert r2.gini == 0.0
    assert (r2.p50_count, r2.p90_count, r2.p99_count) == (2, 2, 2)
    # one dominant key: top1_ppm reflects the hot share
    r3 = key_skew_profile(
        spark.createDataFrame([("h",)] * 9 + [("t",)], ["k"]), "k"
    ).collect()[0]
    assert r3.top1_ppm == 900000 and r3.max_count == 9


def test_weighted_quantiles_exact(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        weighted_quantiles,
    )

    rows = [
        ("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 8.0),  # W=10
        ("h", 5.0, 3.0), ("h", 6.0, 1.0),                   # W=4
        # duplicated values must collapse before the threshold
        ("i", 1.0, 2.0), ("i", 1.0, 2.0), ("i", 9.0, 1.0),  # W=5
    ]
    out = {
        r[0]: r
        for r in weighted_quantiles(
            spark.createDataFrame(rows, ["grp", "v", "w"]), "grp", "v", "w"
        ).collect()
    }
    g = out["g"]
    assert (g.w_total, g.wq_1_2, g.wq_9_10, g.wq_99_100) == (
        10, 3.0, 3.0, 3.0,
    )
    h = out["h"]
    assert (h.w_total, h.wq_1_2, h.wq_9_10, h.wq_99_100) == (
        4, 5.0, 6.0, 6.0,
    )
    i = out["i"]  # cum(1.0)=4 of 5: 4*2>=5 -> median 1.0; 4*10<45 -> q90 9.0
    assert (i.w_total, i.wq_1_2, i.wq_9_10) == (5, 1.0, 9.0)


def test_rolling_active_users_exact(spark):
    import collections
    import datetime as dt

    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        rolling_active_users,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 10 days with a fully-skipped day 5; varied per-user cadences
    for d in range(10):
        if d == 5:
            continue
        for u in range(1, 8):
            if d % (u % 3 + 1) == 0:
                rows.append((t0 + dt.timedelta(days=d, hours=u), u))
    # users active ONLY just before the gap: a ROWS-frame sketch window
    # would reach back past the missing day 5 and union them into day
    # 6/7's estimate, inflating it beyond the exact calendar-window WAU
    # (est is exact HLL at this cardinality, so the bound flags it);
    # the RANGE frame must exclude them
    rows += [(t0 + dt.timedelta(days=3, hours=12), u) for u in range(90, 130)]
    rows += [(t0 + dt.timedelta(days=4, hours=12), u) for u in range(200, 240)]
    df = spark.createDataFrame(rows, ["ts", "uid"])
    out = {
        r.epoch_day: r
        for r in rolling_active_users(df, "ts", "uid", window_days=3)
        .collect()
    }

    by_day = collections.defaultdict(set)
    for ts, u in rows:
        by_day[(ts.date() - dt.date(1970, 1, 1)).days].add(u)
    assert set(out) == set(by_day)  # only observed days emit
    for d, r in out.items():
        exact = set().union(
            *[by_day.get(x, set()) for x in range(d - 2, d + 1)]
        )
        assert r.dau == len(by_day[d])
        assert r.wau == len(exact)
        # at these cardinalities the HLL union is exact -> bound holds
        assert r.wau_within_bound is True


def test_audience_overlap_exact(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        audience_overlap,
    )

    rows = (
        [("A", u) for u in range(100)]
        + [("B", u) for u in range(50, 150)]
        + [("C", u) for u in range(10)]   # subset of A, disjoint from B
        + [("A", 5), ("A", 5)]            # duplicates collapse
    )
    out = {
        (r.g1, r.g2): r
        for r in audience_overlap(
            spark.createDataFrame(rows, ["g", "u"]), "g", "u"
        ).collect()
    }
    assert len(out) == 3
    ab = out[("A", "B")]
    assert (ab.n_a, ab.n_b, ab.n_inter, ab.n_union) == (100, 100, 50, 150)
    ac = out[("A", "C")]
    assert (ac.n_inter, ac.n_union) == (10, 100)  # full containment
    bc = out[("B", "C")]
    assert (bc.n_inter, bc.n_union) == (0, 110)  # disjoint still emits
    assert all(v.inter_within_bound for v in out.values())


def test_watermark_lateness_audit_exact(spark):
    import datetime as dt

    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        watermark_lateness_audit,
    )

    t0 = dt.datetime(2024, 1, 1)
    # arrival order 0..9; two out-of-order arrivals (90s and 100s late)
    offs = [0, 60, 120, 30, 180, 240, 300, 200, 360, 420]
    rows = [
        (i, t0 + dt.timedelta(seconds=s)) for i, s in enumerate(offs)
    ]
    r = watermark_lateness_audit(
        spark.createDataFrame(rows, ["arr", "ts"]), "arr", "ts"
    ).collect()[0]
    lats = sorted([0] * 8 + [90_000_000, 100_000_000])
    assert (r.n_events, r.n_late) == (10, 2)
    assert r.p50_us == lats[(10 + 1) // 2 - 1] == 0
    assert r.p95_us == lats[(19 * 10 + 19) // 20 - 1] == 100_000_000
    assert r.p99_us == 100_000_000 and r.max_us == 100_000_000
    # fully ordered feed: everything on time
    r2 = watermark_lateness_audit(
        spark.createDataFrame(
            [(i, t0 + dt.timedelta(seconds=60 * i)) for i in range(5)],
            ["arr", "ts"],
        ),
        "arr",
        "ts",
    ).collect()[0]
    assert (r2.n_late, r2.max_us) == (0, 0)


def test_join_fanout_preflight_predicts_actual(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        join_fanout_preflight,
    )

    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (9,)], ["k"]
    )
    r = join_fanout_preflight(left, right, "k", "k").collect()[0]
    actual = left.join(right, "k").count()
    assert r.predicted_rows == actual == 7  # 2*3 + 1*1
    assert (
        r.n_left, r.n_right, r.n_keys_left, r.n_keys_right, r.n_keys_both,
    ) == (4, 5, 3, 3, 2)
    assert r.max_key_product == 6
    assert r.hot_ppm == 6 * 1000000 // 7
    # disjoint keys: predicted 0, hot share 0 (no division)
    r2 = join_fanout_preflight(
        left, spark.createDataFrame([(7,), (8,)], ["k"]), "k", "k"
    ).collect()[0]
    assert (r2.predicted_rows, r2.n_keys_both, r2.hot_ppm) == (0, 0, 0)
