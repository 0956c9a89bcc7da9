"""Round-8 regression pins for the driver ADVICE findings:

1. ``normalize_embeddings_arrow`` must survive a batch whose TRAILING
   row(s) are empty arrays (reduceat start == len(values)).
2. ``table_diff`` / ``snapshot_cdc`` must degrade to added/removed
   (I/D) diffs when the compare-column list resolves empty, not crash.
3. ``heavy_hitters`` must honor the GLOBAL ``<= k-1`` size contract
   after merging per-partition summaries (mergeable-summaries final
   compression), not just per partition.
"""
from __future__ import annotations

import pyspark.sql.functions as F


# ---------------------------------------------------------------------------
# 1. mapInArrow normalizer vs empty embedding rows
# ---------------------------------------------------------------------------


def test_normalize_arrow_trailing_empty_row(spark):
    from imdb_top_250_etl_pipeline_spark.operators.udfs import (
        normalize_embeddings_arrow,
    )

    # the reproducer from ADVICE: non-empty row followed by an empty
    # one in the SAME arrow batch -> reduceat start offset == len(flat)
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [])],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    out = {
        r["vec_id"]: r["unit_vec"]
        for r in normalize_embeddings_arrow(
            df, "embedding", "vec_id"
        ).collect()
    }
    assert abs(out[1][0] - 0.6) < 1e-12 and abs(out[1][1] - 0.8) < 1e-12
    assert out[2] == []


def test_normalize_arrow_interior_and_multiple_trailing_empties(spark):
    from imdb_top_250_etl_pipeline_spark.operators.udfs import (
        normalize_embeddings_arrow,
    )

    df = spark.createDataFrame(
        [
            (1, []),
            (2, [0.0, 5.0]),
            (3, []),
            (4, [8.0, 6.0]),
            (5, []),
            (6, []),
        ],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    out = {
        r["vec_id"]: r["unit_vec"]
        for r in normalize_embeddings_arrow(
            df, "embedding", "vec_id"
        ).collect()
    }
    assert out[1] == [] and out[3] == [] and out[5] == [] and out[6] == []
    assert abs(out[2][0] - 0.0) < 1e-12 and abs(out[2][1] - 1.0) < 1e-12
    # the non-empty row BEFORE the trailing empties keeps its full
    # segment (the clamping bug this test pins against would have
    # stolen its last element)
    assert abs(out[4][0] - 0.8) < 1e-12 and abs(out[4][1] - 0.6) < 1e-12


def test_normalize_arrow_all_rows_empty(spark):
    from imdb_top_250_etl_pipeline_spark.operators.udfs import (
        normalize_embeddings_arrow,
    )

    df = spark.createDataFrame(
        [(1, []), (2, [])], "vec_id long, embedding array<double>"
    ).coalesce(1)
    out = {
        r["vec_id"]: r["unit_vec"]
        for r in normalize_embeddings_arrow(
            df, "embedding", "vec_id"
        ).collect()
    }
    assert out == {1: [], 2: []}


# ---------------------------------------------------------------------------
# 2. key-only table_diff / snapshot_cdc
# ---------------------------------------------------------------------------


def test_table_diff_key_only_tables(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import table_diff

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    out = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
    # no compare columns -> nothing can be 'changed'; key 2 is silent
    assert out == {1: "removed", 3: "added"}


def test_table_diff_explicit_empty_compare_cols(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import table_diff

    old = spark.createDataFrame([(1, "a")], "k long, s string")
    new = spark.createDataFrame([(1, "CHANGED")], "k long, s string")
    # compare_cols=[] is treated like the falsy default: compare all
    # non-key columns, so the divergence IS reported
    assert (
        table_diff(old, new, ["k"], compare_cols=[]).collect()[0]["status"]
        == "changed"
    )


def test_snapshot_cdc_key_only_tables(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_snapshot_cdc,
        snapshot_cdc,
    )

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    changes = snapshot_cdc(old, new, ["k"])
    ops = {r["k"]: r["op"] for r in changes.collect()}
    assert ops == {1: "D", 3: "I"}
    # the roundtrip property must keep holding in the degenerate case
    rebuilt = {r["k"] for r in apply_snapshot_cdc(old, changes, ["k"]).collect()}
    assert rebuilt == {2, 3}


# ---------------------------------------------------------------------------
# 3. heavy_hitters global size contract
# ---------------------------------------------------------------------------


def test_heavy_hitters_global_size_bound(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        heavy_hitters,
    )

    k = 8
    # 16 partitions of mostly-disjoint tails: pre-fix the merged
    # summary held up to 16*(k-1) rows; the contract is <= k-1 TOTAL
    rows = [("A",)] * 600 + [("B",)] * 300 + [
        (f"t{i}",) for i in range(1100)
    ]
    df = spark.createDataFrame(rows, "item string").repartition(16)
    out = {r["item"]: r["est"] for r in heavy_hitters(df, "item", k=k).collect()}
    assert len(out) <= k - 1
    n = 2000
    # frequency > n/k items survive the final compression with the
    # standard MG bounds intact
    for item, exact in (("A", 600), ("B", 300)):
        assert item in out
        assert exact - n / k <= out[item] <= exact


def test_heavy_hitters_compression_noop_when_small(spark):
    from imdb_top_250_etl_pipeline_spark.operators.profiling import (
        heavy_hitters,
    )

    rows = [("x",)] * 5 + [("y",)] * 3
    df = spark.createDataFrame(rows, "item string").repartition(4)
    out = {r["item"]: r["est"] for r in heavy_hitters(df, "item", k=8).collect()}
    # merged summary smaller than k -> threshold 0 -> exact counts kept
    assert out == {"x": 5, "y": 3}
