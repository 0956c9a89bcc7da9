"""Bench regression smoke: the most expensive headline queries must stay
within a generous factor of the best-observed timings in
bench_baseline.json at sf0.01.

The factor is 3x with a +1s absolute allowance (not the aspirational 2x)
because this container shares hardware — load spikes of 2-3x were
observed between otherwise identical runs; the gate is meant to catch
plan regressions (a lost broadcast, an extra shuffle cycle, an
interpreted fallback: typically 4-10x), not scheduler noise.
"""

from __future__ import annotations

import json
import pathlib
import time

import pytest

from imdb_top_250_etl_pipeline_spark.plans import lookup

# stress/perf tier: excluded from the default run (see conftest)
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.01"
_BASELINE = json.loads(
    (pathlib.Path(__file__).resolve().parent.parent / "bench_baseline.json").read_text()
)["queries"]

# The plan-regression-prone subset: LSH/similarity (shuffle-shape
# sensitive), the flagship join-agg, and the two Python-path queries.
WATCHED = [
    "flagship_top_customers",
    "dedup_minhash_candidates",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "sim_ann_ivf",
    "etl_movies_surrogate_keys",
    "udf_parse_markup",
    # round-8: heavy round-7 operators now gated too — iterative BPE
    # (checkpoint cadence regressions), triangle counting (degree-order
    # join shape), segment dedup + perplexity (shuffle-hash vocab joins)
    "graph_triangle_counts",
    "text_bpe_merges",
    "text_segment_dedup",
    "text_lm_perplexity",
    # round-10: PQ (iterative codebook training + ADC shape) and the
    # CCNet tercile composition (LM join + distributed grouped rank)
    "sim_ann_pq",
    "text_ccnet_buckets",
    # round-11: UNIMAX (grouped cumsum + explode) and aHash near-dup
    # (Arrow hash + banded self-join)
    "corpus_unimax",
    "multimodal_ahash_dedup",
]


@pytest.fixture(scope="module")
def warmed(spark):
    lookup("flagship_top_customers").fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    lookup("udf_parse_markup").fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    return spark


@pytest.mark.parametrize("name", WATCHED)
def test_no_large_regression(warmed, name):
    base = _BASELINE[name]
    limit = 3.0 * base + 1.0
    # Steady-state gate: a cold first run on this shared container can
    # spike 3-4x from co-tenant load alone; a genuine plan regression
    # (lost broadcast, extra shuffle, interpreted fallback) is slow on
    # EVERY run, so time up to three runs and take the min (the
    # iterative queries — BPE, triangle counting — need a third run to
    # reach steady state when their first hits JIT + checkpoint I/O
    # warm-up simultaneously; observed 7.6 → 2.4 → 1.3 s for
    # graph_triangle_counts on a loaded container vs its 1.22 s
    # baseline).  Early-exit keeps the usual cost at one run.
    # time the SAME callable the bench ledger timed: bench.py swaps
    # oracle-promoted queries for their _raw operator form
    # (bench._raw_overrides), so the smoke must too or it compares an
    # invariant-check build against a raw-form baseline
    import bench as _bench

    fn = _bench._raw_overrides().get(name) or lookup(name).fn
    took = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(warmed, SF_DIR).write.format("noop").mode("overwrite").save()
        took = min(took, time.perf_counter() - t0)
        if took <= limit:
            break
    assert took <= limit, (
        f"{name}: {took:.2f}s vs baseline {base:.2f}s (limit {limit:.2f}s) — "
        "likely a plan regression; compare .explain() against the recorded plan"
    )
