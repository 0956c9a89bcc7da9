"""Every registered query with an oracle must hash-match DuckDB at sf0.01 —
the same gate the driver applies (BASELINE.md t2)."""

from __future__ import annotations

import pytest

from imdb_top_250_etl_pipeline_spark.plans import QUERIES, SUBSUMED

# Batteries AND their subsumed constituents: a battery hash failure is
# localized by the constituent's own parity test.
ALL = {**QUERIES, **SUBSUMED}

from .conftest import SF_CORRECT
from .oracle_harness import compare, first_diff

ORACLE_QUERIES = sorted(n for n, q in ALL.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in ALL.items() if q.oracle is None)


def _tiered(names):
    """Driver-facing queries run in the DEFAULT tier (they are the
    correctness gate); SUBSUMED constituents run in the --slow tier —
    each battery's order-insensitive hash already verifies every
    constituent's full row multiset, so the per-constituent re-check
    only LOCALIZES a battery failure to one branch."""
    return [
        n if n in QUERIES else pytest.param(n, marks=pytest.mark.slow)
        for n in names
    ]


@pytest.mark.parametrize("name", _tiered(ORACLE_QUERIES))
def test_oracle_parity(spark, duck, name):
    q = ALL[name]
    df = q.fn(spark, SF_CORRECT)
    res = compare(df, duck, q.oracle)
    if not res["hash_match"]:
        only_s, only_d = first_diff(df, duck, q.oracle)
        pytest.fail(
            f"{name}: {res}\nspark-only rows: {only_s}\nduck-only rows: {only_d}"
        )


@pytest.mark.parametrize("name", _tiered(ROWS_ONLY_QUERIES))
def test_rows_only_runs(spark, name):
    q = ALL[name]
    df = q.fn(spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
