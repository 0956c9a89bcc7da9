"""Unit tests for the sink surface, F9 last_updated, and the
approx_count_distinct error bound (oracle parity covers the rest)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_SMOKE

from imdb_top_250_etl_pipeline_spark.plans import QUERIES, lookup
from imdb_top_250_etl_pipeline_spark.plans.etl import _movies_table
from imdb_top_250_etl_pipeline_spark.sources import load
from imdb_top_250_etl_pipeline_spark.sources.sink import roundtrip_materialized


def test_movies_last_updated_present_and_nonnull(spark):
    m = _movies_table(spark, SF_SMOKE)
    field = dict(zip(m.schema.names, m.schema.fields))["last_updated"]
    assert isinstance(field.dataType, T.TimestampType)
    assert m.where(F.col("last_updated").isNull()).count() == 0


def test_parquet_roundtrip_preserves_values(spark, tmp_path):
    src = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate", "l_returnflag"
    )
    back = roundtrip_materialized(
        src, str(tmp_path / "li"), partition_by=["l_returnflag"]
    ).select(*src.columns)
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_surrogate_key_invariant_to_input_partitioning(spark):
    # the distributed id assignment must be a pure function of the data:
    # identical ids whether the input arrives in 1 partition or 13
    from imdb_top_250_etl_pipeline_spark.operators.etl import with_surrogate_key

    c = load(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    one = {
        r.c_custkey: r.sk
        for r in with_surrogate_key(
            c.repartition(1), "sk", ["c_name"]
        ).collect()
    }
    many = {
        r.c_custkey: r.sk
        for r in with_surrogate_key(
            c.repartition(13), "sk", ["c_name"]
        ).collect()
    }
    assert one == many
    assert sorted(one.values()) == list(range(1, len(one) + 1))


def test_catalog_rejects_schema_drift(spark, tmp_path):
    from imdb_top_250_etl_pipeline_spark.sources import load as cat_load
    import pytest as _pytest

    # customer with c_acctbal as string: declared double -> must fail loudly
    spark.createDataFrame(
        [(1, "x", 1, "bad", "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal string, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    with _pytest.raises(ValueError, match="schema drift"):
        cat_load(spark, str(tmp_path), "customer")


def test_approx_count_distinct_error_bound(spark):
    # docstring contract of agg_approx_distinct: relative error vs exact
    # stays within a few rsd (rsd=0.02).  The query itself now folds the
    # sketch value into the within_bound invariant (oracle-hash shape),
    # so the raw-error assertion recomputes the sketch here.
    folded = {
        r.l_returnflag: (r.exact_parts, r.within_bound)
        for r in lookup("agg_approx_distinct").fn(spark, SF_SMOKE).collect()
    }
    raw = {
        r.l_returnflag: (r.exact_parts, r.approx_parts)
        for r in load(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias(
                "approx_parts"
            ),
        )
        .collect()
    }
    assert set(folded) == set(raw)
    for flag, (ex, ap) in raw.items():
        assert folded[flag][0] == ex
        assert folded[flag][1] is True, (flag, folded[flag])
        rel_err = abs(ap - ex) / ex
        assert rel_err <= 3 * 0.02, (flag, ap, ex, rel_err)


def test_grouped_row_number_matches_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from imdb_top_250_etl_pipeline_spark.operators.windows import (
        grouped_row_number,
    )
    from imdb_top_250_etl_pipeline_spark.sources import load
    from tests.conftest import SF_CORRECT

    c = load(spark, SF_CORRECT, "customer")
    order = [F.desc("c_acctbal"), F.asc("c_custkey")]
    got = grouped_row_number(c, ["c_mktsegment"], order, "rn").select(
        "c_custkey", "rn"
    )
    w = W.partitionBy("c_mktsegment").orderBy(*order)
    expected = c.select("c_custkey", F.row_number().over(w).cast("long").alias("rn"))
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_distributed_cumsum_matches_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from imdb_top_250_etl_pipeline_spark.operators.windows import (
        distributed_cumsum,
    )
    from imdb_top_250_etl_pipeline_spark.sources import load
    from tests.conftest import SF_CORRECT

    o = load(spark, SF_CORRECT, "orders").select("o_orderkey", "o_custkey")
    got = distributed_cumsum(o, ["o_orderkey"], "o_custkey", "cs").select(
        "o_orderkey", "cs"
    )
    w = W.orderBy("o_orderkey").rowsBetween(W.unboundedPreceding, W.currentRow)
    expected = o.select("o_orderkey", F.sum("o_custkey").over(w).alias("cs"))
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_pack_chunks_fills_bins_in_order(spark):
    from imdb_top_250_etl_pipeline_spark.operators.text import pack_chunks

    rows = [(i, 0, 300) for i in range(10)]  # 10 chunks x 300 tokens
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_tok int")
    got = {
        r.doc_id: (r.bin_id, r.offset_in_bin)
        for r in pack_chunks(df, ["doc_id", "chunk_idx"], "n_tok", seq_len=1000).collect()
    }
    # cumulative starts: 0,300,...,2700 -> bins 0,0,0,0(straddles at 900),1,...
    assert got[0] == (0, 0) and got[1] == (0, 300) and got[2] == (0, 600)
    assert got[3] == (0, 900)   # straddling chunk: starts at offset 900
    assert got[4] == (1, 200) and got[9] == (2, 700)


def test_cli_run_etl_writes_five_tables(spark, tmp_path):
    from imdb_top_250_etl_pipeline_spark.__main__ import run_etl
    from imdb_top_250_etl_pipeline_spark.plans import QUERIES, lookup
    from tests.conftest import SF_CORRECT

    counts = run_etl(spark, SF_CORRECT, str(tmp_path / "etl_out"))
    assert set(counts) == {
        "movies", "people", "movie_director", "movie_writer", "movie_star"
    }
    # the written tables must match the registered queries' row counts
    assert counts["movies"] == QUERIES["etl_movies_surrogate_keys"].fn(
        spark, SF_CORRECT
    ).count()
    assert counts["people"] == QUERIES["etl_normalize_people"].fn(
        spark, SF_CORRECT
    ).count()
    assert counts["movie_star"] == lookup("etl_bridge_star").fn(
        spark, SF_CORRECT
    ).count()


def test_quantile_bins_balanced_and_monotone(spark):
    from pyspark.sql import functions as F

    from imdb_top_250_etl_pipeline_spark.operators.windows import quantile_bins
    from imdb_top_250_etl_pipeline_spark.sources import load
    from tests.conftest import SF_CORRECT

    o = load(spark, SF_CORRECT, "orders")
    binned = quantile_bins(o, "o_totalprice", n_bins=10)
    counts = {r.bin: r.n for r in binned.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    n = o.count()
    assert set(counts) == set(range(10))
    for b, cnt in counts.items():
        assert abs(cnt - n / 10) <= 0.05 * n, (b, cnt)  # sketch accuracy slack
    # monotone: the max value of bin b never exceeds the min of bin b+1
    stats = {
        r.bin: (r.lo, r.hi)
        for r in binned.groupBy("bin")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .collect()
    }
    for b in range(9):
        assert stats[b][1] <= stats[b + 1][0], (b, stats[b], stats[b + 1])


def test_zorder_key_structure(spark):
    """Morton key properties: bijective on the bit-bounded domain, and
    interleaving actually balances locality (key deltas bounded for
    unit steps in EITHER dimension, unlike a lexicographic sort key)."""
    import itertools

    from pyspark.sql import functions as F

    from imdb_top_250_etl_pipeline_spark.functions.layout import zorder_key

    pts = [(x, y) for x, y in itertools.product(range(16), range(16))]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select(
        "x", "y", zorder_key("x", "y", bits_per_col=4).alias("z")
    ).collect()
    zmap = {(r.x, r.y): r.z for r in rows}
    # bijection onto [0, 256)
    assert sorted(zmap.values()) == list(range(256))
    # reference morton check
    def morton(x, y):
        z = 0
        for j in range(4):
            z |= ((x >> j) & 1) << (2 * j) | ((y >> j) & 1) << (2 * j + 1)
        return z
    assert all(zmap[(x, y)] == morton(x, y) for x, y in pts)


def test_zorder_key_rejects_overflow(spark):
    import pytest as _pytest

    from imdb_top_250_etl_pipeline_spark.functions.layout import zorder_key

    with _pytest.raises(ValueError):
        zorder_key("a", "b", "c", "d", bits_per_col=21)
    with _pytest.raises(ValueError):
        zorder_key()


def test_apply_changes_and_scd2_hand_built(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_changes,
        scd2_history,
    )

    # key 1: I then U; key 2: I then D; key 3: I only; key 4: I, U, U
    rows = [
        (1, "a", 1, "I"), (1, "b", 2, "U"),
        (2, "x", 1, "I"), (2, "x", 2, "D"),
        (3, "c", 1, "I"),
        (4, "p", 1, "I"), (4, "q", 2, "U"), (4, "r", 3, "U"),
    ]
    ch = spark.createDataFrame(rows, "k long, v string, seq int, op string")
    final = {r.k: r.v for r in apply_changes(ch, "k", "seq", "op", ["v"]).collect()}
    assert final == {1: "b", 3: "c", 4: "r"}  # 2 deleted

    hist = {
        (r.k, r.valid_from_v): (r.v, r.valid_to_v)
        for r in scd2_history(ch, "k", "seq", "op", ["v"]).collect()
    }
    assert hist == {
        (1, 1): ("a", 2), (1, 2): ("b", None),
        (2, 1): ("x", 2),            # delete closed the interval, no D row
        (3, 1): ("c", None),
        (4, 1): ("p", 2), (4, 2): ("q", 3), (4, 3): ("r", None),
    }
    # live rows of the history == apply_changes final state
    live = {k for (k, _), (_, to) in hist.items() if to is None}
    assert live == set(final)


# ---------------------------------------------------------------------------
# apply_expectations — quarantine gate semantics
# ---------------------------------------------------------------------------


def test_apply_expectations_split_and_null_fails(spark):
    import pyspark.sql.functions as F
    import pytest

    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_expectations,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "a"), (3, None, "a"), (4, 3.0, None)],
        "k long, bal double, name string",
    )
    valid, quar = apply_expectations(
        df,
        {
            "nonneg": F.col("bal") >= 0,
            "named": F.col("name").isNotNull(),
        },
    )
    assert {r["k"] for r in valid.collect()} == {1}
    got = {r["k"]: list(r["_failed"]) for r in quar.collect()}
    # a NULL predicate result counts as FAILED (three-valued logic pin)
    assert got == {2: ["nonneg"], 3: ["nonneg"], 4: ["named"]}
    # quarantine keeps the original payload columns
    assert set(quar.columns) == {"k", "bal", "name", "_failed"}

    with pytest.raises(ValueError):
        apply_expectations(df, {})


def test_fk_expectation_flags_dangling_and_null_keys(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        apply_expectations,
        fk_expectation,
    )

    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)],
        "id long, fk long",
    )
    dim = spark.createDataFrame([(10,), (20,), (30,)], "key long")

    flagged = fk_expectation(facts, "fk", dim, "key")
    ok = {r["id"]: r["_fk_ok"] for r in flagged.collect()}
    # dangling (99) and NULL keys both fail by default
    assert ok == {1: True, 2: True, 3: False, 4: False}

    # SQL FK semantics: NULL vacuously satisfies the constraint
    lax = fk_expectation(facts, "fk", dim, "key", allow_null=True)
    ok2 = {r["id"]: r["_fk_ok"] for r in lax.collect()}
    assert ok2 == {1: True, 2: True, 3: False, 4: True}

    # the flag rides the gate like any row expectation
    valid, quar = apply_expectations(
        flagged, {"fk_dim": F.col("_fk_ok")}
    )
    assert sorted(r["id"] for r in valid.collect()) == [1, 2]
    assert sorted(r["id"] for r in quar.collect()) == [3, 4]


def test_fk_expectation_no_row_multiplication_on_dup_dim_keys(spark):
    from imdb_top_250_etl_pipeline_spark.operators.etl import (
        fk_expectation,
    )

    facts = spark.createDataFrame([(1, 10)], "id long, fk long")
    dim = spark.createDataFrame(
        [(10,), (10,), (10,)], "key long"
    )  # dup keys must not fan out the fact
    out = fk_expectation(facts, "fk", dim, "key").collect()
    assert len(out) == 1 and out[0]["_fk_ok"] is True


def test_running_distinct_hand_fixture(spark):
    """First occurrences bump the count; repeats don't; partitions are
    independent; ties resolve by the id tie-break."""
    import datetime as dt

    from imdb_top_250_etl_pipeline_spark.operators.windows import (
        running_distinct,
    )

    U = dt.datetime
    rows = [
        (1, 1, U(2024, 1, 1, 0), "a"),
        (1, 2, U(2024, 1, 1, 1), "b"),
        (1, 3, U(2024, 1, 1, 2), "a"),   # repeat -> stays 2
        (1, 4, U(2024, 1, 1, 3), "c"),
        (2, 5, U(2024, 1, 1, 0), "a"),   # other user independent
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, v string"
    )
    out = {
        r["event_id"]: r["n_distinct_so_far"]
        for r in running_distinct(
            df, "user_id", "v", ["ts", "event_id"]
        ).collect()
    }
    assert out == {1: 1, 2: 2, 3: 2, 4: 3, 5: 1}
