"""Shared fixtures + the two-tier suite split.

Two invocations (round-8 verdict item 8 — the full suite had grown past
20 minutes, dominated by checks that are redundant or stress-grade for
everyday iteration):

* ``pytest tests/``            — the DEFAULT tier (~16 min on this
  shared container): every operator's primary correctness gate — all
  50 driver-facing oracle parities, unit and property pins, plan
  shapes, streaming runtime parity.  The remaining wall time is a wide
  tail of per-test Spark job latency, not a few heavy tests.
* ``pytest tests/ --slow``     — the FULL tier (~24 min): adds the
  ``slow``-marked tests (subsumed-constituent oracle parity — each
  battery's hash already verifies every constituent's rows, so these
  re-checks only LOCALIZE a battery failure; concurrency/chaos stress;
  perf-regression smoke; threshold-extremes properties) and deepens
  the hypothesis fuzz profiles from 5 to 15 examples per property.

Both tiers are kept green; the per-round close-out runs ``--slow``.
"""
from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="run the slow tier too (subsumed oracle parity, chaos/"
        "stress, full-depth hypothesis fuzzing)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: redundant-at-default or stress-grade checks; excluded "
        "unless --slow is passed",
    )
    from hypothesis import settings as hsettings

    # example counts for the differential fuzz suite; properties keep
    # their own explicit max_examples when they set one
    hsettings.register_profile("fuzz_quick", max_examples=5)
    hsettings.register_profile("fuzz_full", max_examples=15)
    hsettings.load_profile(
        "fuzz_full" if config.getoption("--slow") else "fuzz_quick"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --slow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    from imdb_top_250_etl_pipeline_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECT}/{t}.parquet'"
        )
    yield con
    con.close()
