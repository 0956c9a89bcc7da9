"""Task-retry chaos for the pin/release machinery.

The iterative operators (dedup_groups pointer jumping, pagerank power
iteration) pin each round via eager localCheckpoint and release the
superseded round.  This suite injects a FIRST-ATTEMPT task failure into
the scan feeding those iterations and asserts the job still converges to
the exact same answer with every pin released — i.e. the lifecycle
machinery survives Spark's task-retry path, not just the happy path.

Runs in a subprocess with its own ``local[4,2]`` session because task
retry needs ``maxFailures`` > 1, which the suite's shared ``local[32]``
context (maxFailures=1) cannot express after the JVM is up.

What this deliberately does NOT cover: EXECUTOR loss.  localCheckpoint
is non-replicated by design — losing an executor loses its blocks and
fails the job (Spark cannot recompute truncated lineage).  That caveat
and the cluster swap-in (reliable ``checkpoint()`` to a DFS dir, or
``persist(MEMORY_AND_DISK_2)``) are documented in SCALING.md; the
operators take the checkpoint through one seam (operators/pinning.py)
precisely so the swap is one line.
"""
from __future__ import annotations

import os
import subprocess
import sys

import pytest

# stress tier: excluded from the default run (see conftest)
pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark import TaskContext

spark = (
    SparkSession.builder.master("local[4,2]").appName("chaos")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def flaky(batches):
    # every stage that scans this source loses partition 0's first
    # attempt; maxFailures=2 lets the retry land
    ctx = TaskContext.get()
    if ctx.attemptNumber() == 0 and ctx.partitionId() == 0:
        raise RuntimeError("chaos: injected first-attempt failure")
    yield from batches


from imdb_top_250_etl_pipeline_spark.operators.dedup import dedup_groups
from imdb_top_250_etl_pipeline_spark.operators.graph import pagerank
from imdb_top_250_etl_pipeline_spark.operators.pinning import (
    _persistent_ids,
    pin_scope,
)

# --- dedup_groups: 40-link chain, several pointer-jumping rounds ---
pairs = spark.createDataFrame(
    [(i, i + 1) for i in range(40)], "id_a long, id_b long"
).repartition(4).mapInPandas(flaky, "id_a long, id_b long")
base = set(_persistent_ids(spark.sparkContext))
with pin_scope():
    rows = dedup_groups(pairs).collect()
    assert {r["group_id"] for r in rows} == {0}, sorted(
        {r["group_id"] for r in rows}
    )[:5]
    assert len(rows) == 41, len(rows)
assert set(_persistent_ids(spark.sparkContext)) - base == set()

# --- pagerank: ring graph, mass conserved through the retries ---
edges = spark.createDataFrame(
    [(i, (i + 1) % 30) for i in range(30)], "src long, dst long"
).repartition(4).mapInPandas(flaky, "src long, dst long")
base = set(_persistent_ids(spark.sparkContext))
with pin_scope():
    total = (
        pagerank(edges, n_iter=5, checkpoint_every=2, n_partitions=4)
        .agg(F.sum("rank"))
        .collect()[0][0]
    )
    assert abs(total - 1.0) < 1e-6, total
assert set(_persistent_ids(spark.sparkContext)) - base == set()
print("CHAOS OK")
"""


def test_task_retry_chaos_converges_and_frees_blocks():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=_REPO,
    )
    assert "CHAOS OK" in r.stdout, (r.stdout[-1500:], r.stderr[-1500:])
