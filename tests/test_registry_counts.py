"""Pin the registry shape that COVERAGE.md and the sweep artifacts
quote (round-10 verdict item 4: a stale header count is how a future
round miscounts its registry budget).

Update COVERAGE.md's header ("Registry: N named queries, M
oracle-hash-checked") and the rows-only list together with these
numbers — this test is the single source of truth.
"""

from __future__ import annotations

from imdb_top_250_etl_pipeline_spark.plans import QUERIES, SUBSUMED


def test_driver_facing_registry_is_exactly_50():
    # the driver checks only the first 50 entries in registration order
    assert len(QUERIES) == 50


def test_total_and_rows_only_counts():
    all_q = {**QUERIES, **SUBSUMED}
    rows_only = sorted(n for n, q in all_q.items() if q.oracle is None)
    assert len(all_q) == 221, f"update COVERAGE.md: total now {len(all_q)}"
    # round 12: the last three rows-only constituents were promoted to
    # invariant oracles — the registry is now 100% oracle-backed
    assert rows_only == [], f"update COVERAGE.md: rows-only now {rows_only}"
