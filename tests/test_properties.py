"""Property-based tests (hypothesis) for the MERGE-semantics operators.

The oracle checks pin one fixture-derived instance; these drive the same
operators over arbitrary small key/value tables against a straight-line
Python reference model, covering shapes the fixtures never produce
(empty sides, all-overlap, duplicate incoming keys, NULL update values).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from imdb_top_250_etl_pipeline_spark.operators.etl import insert_ignore, upsert

# small tables keep each Spark round-trip fast; keys overlap on purpose
_key = st.integers(min_value=0, max_value=9)
_val = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
_rows = st.lists(st.tuples(_key, _val, _val), max_size=8)

_SCHEMA = "k int, upd int, stable int"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _dedup_first(rows):
    seen, out = set(), []
    for r in rows:
        if r[0] not in seen:
            seen.add(r[0])
            out.append(r)
    return out


@given(existing=_rows, incoming=_rows)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_upsert_matches_reference_model(spark, existing, incoming):
    existing = _dedup_first(existing)
    incoming = _dedup_first(incoming)
    got = {
        r.k: (r.upd, r.stable)
        for r in upsert(
            _df(spark, existing),
            _df(spark, incoming),
            key="k",
            update_cols=["upd"],
            stable_cols=["stable"],
        ).collect()
    }
    e = {k: (u, s) for k, u, s in existing}
    i = {k: (u, s) for k, u, s in incoming}
    expected = {}
    for k in set(e) | set(i):
        if k in e and k in i:
            expected[k] = (i[k][0], e[k][1])  # update-wins, stable kept
        elif k in e:
            expected[k] = e[k]
        else:
            expected[k] = i[k]
    assert got == expected


@given(existing=_rows, incoming=_rows)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_insert_ignore_is_first_writer_wins(spark, existing, incoming):
    existing = _dedup_first(existing)
    got = {
        r.k: (r.upd, r.stable)
        for r in insert_ignore(
            _df(spark, existing), _df(spark, incoming), key="k"
        ).collect()
    }
    e = {k: (u, s) for k, u, s in existing}
    # existing rows never change; one arbitrary row per brand-new key
    for k, v in e.items():
        assert got[k] == v
    new_keys = {k for k, _, _ in incoming} - set(e)
    assert set(got) == set(e) | new_keys
    incoming_by_key = {}
    for k, u, s in incoming:
        incoming_by_key.setdefault(k, set()).add((u, s))
    for k in new_keys:
        assert got[k] in incoming_by_key[k]


_words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=3), min_size=0, max_size=20
)


@given(words=_words, window=st.integers(2, 6), stride=st.integers(1, 4))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunk_documents_property(spark, words, window, stride):
    from imdb_top_250_etl_pipeline_spark.operators.text import chunk_documents

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        (r.chunk_idx, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(df, "text", "doc_id", window, stride).collect()
    )
    toks = text.split(" ")  # split(" ") semantics: "" -> [""], 1 token
    n = len(toks)
    last = ((max(n - window, 0) + stride - 1) // stride) * stride
    expected = [
        (i, " ".join(toks[p : p + window]), min(n - p, window))
        for i, p in enumerate(range(0, last + 1, stride))
    ]
    assert got == expected


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dedup_groups_matches_union_find(spark, edges):
    from imdb_top_250_etl_pipeline_spark.operators.dedup import dedup_groups

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected = {}
    for v in parent:
        root = find(v)
        expected.setdefault(root, []).append(v)
    want = {}
    for members in expected.values():
        g = min(members)
        for m in members:
            want[m] = g

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.doc_id: r.group_id for r in dedup_groups(pairs).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Corpus-composition operators (operators/sampling.py) vs reference models.
# ---------------------------------------------------------------------------

_dom = st.sampled_from(["a", "b", "c"])
_doc_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=500), _dom),
    max_size=12,
    unique_by=lambda t: t[0],
)


def _hash_u(key: int) -> float:
    return ((key * 2654435761) % 1000) / 1000.0


@given(rows=_doc_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mixture_matches_reference_model(spark, rows):
    from imdb_top_250_etl_pipeline_spark.operators.sampling import sample_mixture

    weights = {"a": 0.5, "b": 0.5}
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r.doc_id for r in sample_mixture(df, "lang", "doc_id", weights).collect()}
    counts: dict[str, int] = {}
    for _k, d in rows:
        counts[d] = counts.get(d, 0) + 1
    present = {d: n for d, n in counts.items() if d in weights and n > 0}
    if not present:
        assert got == set()
        return
    s = min(n / weights[d] for d, n in present.items())
    want = {
        k
        for k, d in rows
        if d in present and _hash_u(k) < (s * weights[d]) / present[d]
    }
    assert got == want


@given(rows=_doc_rows, budget=st.integers(min_value=0, max_value=40))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_budget_select_matches_reference_model(spark, rows, budget):
    from imdb_top_250_etl_pipeline_spark.operators.sampling import (
        select_until_budget,
    )

    # token length derived from the key so the model is deterministic
    with_len = [(k, d, (k % 7) + 1) for k, d in rows]
    df = spark.createDataFrame(with_len, "doc_id long, lang string, n_tok long")
    got = {
        r.doc_id: r.cum_tokens
        for r in select_until_budget(df, ["doc_id"], "n_tok", budget).collect()
    }
    want, run = {}, 0
    for k, _d, n in sorted(with_len):
        run += n
        if run > budget:
            break
        want[k] = run
    assert got == want


@given(rows=_doc_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_upsample_matches_reference_model(spark, rows):
    from imdb_top_250_etl_pipeline_spark.operators.sampling import upsample_epochs

    epochs = {"a": 2.5, "b": 0.5}
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got: dict[int, int] = {}
    for r in upsample_epochs(df, "lang", "doc_id", epochs, 1.0).collect():
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
    want: dict[int, int] = {}
    for k, d in rows:
        e = epochs.get(d, 1.0)
        n = int(e) + (1 if _hash_u(k) < e - int(e) else 0)
        if n >= 1:
            want[k] = n
    assert got == want


# ---------------------------------------------------------------------------
# drop_frequent_segments — threshold-extremes properties (round 7)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # extremes stress; the normal path is oracle-checked
def test_segment_dedup_threshold_extremes(spark, docs):
    from imdb_top_250_etl_pipeline_spark.operators.text import (
        drop_frequent_segments,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # max_doc_frac >= 1: nothing can exceed the whole corpus — identity
    keep_all = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for r in drop_frequent_segments(
            df, "doc_id", "text", delim=" ", max_doc_frac=1.0
        ).collect()
    }
    for i, toks in enumerate(docs):
        assert keep_all[i] == (" ".join(toks), len(toks))
    # max_doc_frac = 0: every segment trips the filter — empty corpus
    drop_all = drop_frequent_segments(
        df, "doc_id", "text", delim=" ", max_doc_frac=0.0
    )
    assert all(
        r["clean_text"] == "" and r["n_kept"] == 0 for r in drop_all.collect()
    )


_series = st.lists(
    st.integers(min_value=-500, max_value=500), min_size=1, max_size=20
)


@given(vals=_series, target=st.integers(-50, 50), slack=st.integers(0, 20))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cusum_reflection_matches_sequential_fold(spark, vals, target, slack):
    # the closed reflection form must equal the textbook sequential
    # recurrence on ARBITRARY series — including all-negative drifts,
    # zero slack, and constant runs the fixture never produces
    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        cusum_changepoints,
    )

    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    out = {
        r.seq: (r.cusum_pos, r.cusum_neg)
        for r in cusum_changepoints(
            spark.createDataFrame(rows, ["k", "seq", "value"]),
            "k", ["seq"], "value",
            target=float(target), slack=float(slack), threshold=1e9,
            scale=1000,
        ).collect()
    }
    sp = sn = 0
    for i, v in enumerate(vals):
        q = round(v * 1000)
        sp = max(0, sp + q - target * 1000 - slack * 1000)
        sn = max(0, sn + target * 1000 - q - slack * 1000)
        assert out[i] == (sp, sn), (i, vals, target, slack)


@given(
    words=st.lists(
        st.sampled_from("aa bb cc dd ee".split()), min_size=1, max_size=24
    ),
    w=st.integers(2, 5),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_winnow_matches_reference_on_arbitrary_docs(spark, words, w):
    # tiny 5-word alphabet forces dense hash ties — the rightmost-min
    # rule and the truncated-window path get exercised far harder than
    # by natural text
    import hashlib

    from imdb_top_250_etl_pipeline_spark.operators.text import (
        winnow_fingerprints,
    )

    k = 3
    text = " ".join(words)
    got = {
        (r.fp_pos, r.fp_hash)
        for r in winnow_fingerprints(
            spark.createDataFrame([(1, text)], ["doc_id", "text"]),
            "text", "doc_id", k=k, w=w,
        ).collect()
    }
    tk = text.split(" ")
    exp = set()
    if len(tk) >= k:
        hs = [
            int(
                hashlib.md5(" ".join(tk[i : i + k]).encode()).hexdigest()[:8],
                16,
            )
            for i in range(len(tk) - k + 1)
        ]
        for p in range(max(len(hs) - w + 1, 1)):
            win = hs[p : p + w]
            m = min(win)
            j = max(i for i, v in enumerate(win) if v == m)
            exp.add((p + j + 1, m))
    assert got == exp, (words, w)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g", "h"]),
            st.integers(min_value=-20, max_value=20),  # value
            st.integers(min_value=0, max_value=9),     # weight
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_weighted_quantiles_match_reference_model(spark, rows):
    # arbitrary duplicate values, zero weights, and single-value groups
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        weighted_quantiles,
    )

    df = spark.createDataFrame(
        [(g, float(v), float(w)) for g, v, w in rows], ["grp", "v", "w"]
    )
    got = {
        r.grp: (r.w_total, r.wq_1_2, r.wq_9_10)
        for r in weighted_quantiles(df, "grp", "v", "w").collect()
    }

    import collections

    per = collections.defaultdict(lambda: collections.Counter())
    for g, v, w in rows:
        per[g][float(v)] += w
    for g, counter in per.items():
        tot = sum(counter.values())
        exp = {}
        for num, den, name in ((1, 2, "q50"), (9, 10, "q90")):
            cum, pick = 0, None
            for v in sorted(counter):
                cum += counter[v]
                if cum * den >= num * tot:
                    pick = v
                    break
            exp[name] = pick
        assert got[g] == (tot, exp["q50"], exp["q90"]), (g, rows)


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),   # offset units
            st.integers(min_value=-9, max_value=9),   # value
        ),
        min_size=1,
        max_size=12,
    ),
    bucket=st.sampled_from([7, 10, 16]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_time_weighted_avg_matches_reference_model(spark, obs, bucket):
    # arbitrary duplicate timestamps, bucket-boundary crossings, and
    # single-observation keys against the straight-line step-function
    # reference
    import datetime as dt

    from imdb_top_250_etl_pipeline_spark.operators.timeseries import (
        time_weighted_avg,
    )

    t0 = dt.datetime(2024, 1, 1)
    B = bucket * 1_000_000
    rows = [
        (1, i, t0 + dt.timedelta(seconds=o), float(v))
        for i, (o, v) in enumerate(obs)
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "ts", "v"])
    got = {
        r.bucket: (r.covered_us, r.n_pieces, r.twap)
        for r in time_weighted_avg(
            df, "k", ["ts", "seq"], "ts", "v", bucket_us=B
        ).collect()
    }

    import collections

    pts = sorted(
        (int((t0 + dt.timedelta(seconds=o)).timestamp() * 1_000_000),
         i, round(v * 100))
        for i, (o, v) in enumerate(obs)
    )
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for (s, _, q), (e, _, _) in zip(pts, pts[1:]):
        if e <= s:
            continue
        for b in range(s // B, (e - 1) // B + 1):
            w = min(e, (b + 1) * B) - max(s, b * B)
            cell = agg[b]
            cell[0] += q * w
            cell[1] += w
            cell[2] += 1
    exp = {b: (w, n, qw / (100.0 * w)) for b, (qw, w, n) in agg.items()}
    assert got == exp, (obs, bucket)
