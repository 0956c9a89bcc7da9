"""Recall-driven parameter recommendation: measured curves → machinery.

The approximate operators (MinHash LSH banding, IVF probing, PQ
shortlist re-rank) each trade recall against cost along a small
parameter grid, and the repo measures those grids against exact
brute-force ground truth at sf1 (tools/recall_curves.py →
RECALL_CURVES_r*.json).  This operator closes the loop: given the
measured curve table and a target recall, pick the CHEAPEST measured
configuration that meets the target — the deterministic argmin a
pipeline owner would otherwise eyeball out of the JSON.

Semantics (exactly mirrored by the SQL oracle dual):
  * a configuration "meets" its target when recall_scaled (recall
    ×10000, exact integer — no float threshold compares) >= target;
  * among meeting configs: minimal cost, ties by param_id;
  * when NO config meets the target, the recommendation falls back to
    the maximum-recall config (ties by cost then param_id) with
    ``meets = false`` — a pipeline gets the best available operating
    point plus an explicit signal that the target is unreachable on
    the measured grid.

Scale: curves and targets are bounded metadata tables (dozens of
rows); the join broadcasts and the window partitions by
(family, target) — never a data-sized single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# an unreachable cost ceiling: 100_000_000 minus a recall_scaled in
# [0, 10000] always exceeds any real measured cost, so non-meeting rows
# order strictly after meeting rows even within the same sort key
_FALLBACK_BASE = 100_000_000


def recommend_parameters(curves: DataFrame, targets: DataFrame) -> DataFrame:
    """Per (family, target): the recommended configuration row.

    ``curves``: (family, param_id, p1, p2, recall_scaled, cost) — one
    row per measured configuration, param_id unique within family.
    ``targets``: (family, target_scaled).  Returns (family,
    target_scaled, param_id, p1, p2, recall_scaled, cost, meets).
    """
    j = (
        curves.join(F.broadcast(targets), "family")
        .withColumn(
            "meets", F.col("recall_scaled") >= F.col("target_scaled")
        )
        .withColumn(
            "pick",
            F.when(F.col("meets"), F.col("cost")).otherwise(
                F.lit(_FALLBACK_BASE) - F.col("recall_scaled")
            ),
        )
    )
    w = Window.partitionBy("family", "target_scaled").orderBy(
        F.col("meets").desc(), "pick", "cost", "param_id"
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "family",
            "target_scaled",
            "param_id",
            "p1",
            "p2",
            "recall_scaled",
            "cost",
            "meets",
        )
    )
