#!/usr/bin/env python
"""sf1 skew probe for operators/joins.py::salted_join.

Plants a 30%-hot key in the sf1 lineitem fact (~6M rows) joined against
the sf1 part dim (~200k rows, broadcast disabled — the mid-size-dim
regime the operator exists for), then measures three variants:

  plain        sort-merge on the key, AQE skew-join ON (Spark's own
               runtime answer)
  plain_noaqe  the same join with AQE skew splitting OFF (the regimes
               AQE cannot rescue: pre-3.0 clusters, shuffled-hash
               paths, or a downstream op pinning the partitioning)
  salted       salted_join(n_salts=8): deterministic xxhash64 salt on
               the fact, dim replicated once per salt

Recorded per variant: wall seconds (min of 2 noop-sink runs), the
post-join row distribution across output partitions (max partition's
share — the direct skew signal: the hot key's output all lands in ONE
partition for the plain variants), and for the salted run the number
of distinct salts the hot key actually spread over.  Row-count
equality across variants re-checks the semantics at probe scale.

Writes ONE JSON object to SKEW_PROBE_salted_r8.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/repo/.scratch/sf1"
OUT = "SKEW_PROBE_salted_r8.json"
N_SALTS = 8


def timed(df) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def partition_spread(df) -> dict:
    rows = (
        df.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = sorted((r["count"] for r in rows), reverse=True)
    total = sum(counts)
    return {
        "partitions_with_rows": len(counts),
        "max_partition_rows": counts[0],
        "max_partition_share": round(counts[0] / total, 4),
        "total_rows": total,
    }


def main() -> None:
    from imdb_top_250_etl_pipeline_spark.operators.joins import salted_join
    from imdb_top_250_etl_pipeline_spark.session import get_spark

    spark = get_spark("salted-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # the dim is the "too big to broadcast" case by assumption
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    # 30% of fact rows deterministically remapped to hot key 1; an
    # incompressible md5 pad so shuffle sizes reflect real payloads
    # (constant pads compress below AQE's skew threshold — round-6
    # verify gotcha)
    fact = li.select(
        F.when(
            F.pmod(F.col("l_orderkey") + F.col("l_linenumber"), 10) < 3,
            F.lit(1),
        )
        .otherwise(F.col("l_partkey"))
        .cast("long")
        .alias("key"),
        "l_orderkey",
        "l_linenumber",
        # ~256B of incompressible payload per row: makes the hot
        # partition's sort/shuffle the bottleneck, as it is in the real
        # wide-fact regime this operator exists for
        F.concat(
            *[
                F.md5((F.col("l_orderkey") + F.lit(i)).cast("string"))
                for i in range(8)
            ]
        ).alias("pad"),
    )
    dim = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        F.col("p_partkey").cast("long").alias("p_partkey"), "p_brand"
    )

    n_fact = fact.count()
    hot_rows = fact.where(F.col("key") == 1).count()

    report: dict = {
        "sf_dir": SF_DIR,
        "n_fact": n_fact,
        "n_dim": dim.count(),
        "hot_rows": hot_rows,
        "hot_share": round(hot_rows / n_fact, 4),
        "n_salts": N_SALTS,
    }

    plain = fact.join(dim, fact.key == dim.p_partkey)
    report["plain"] = {
        "wall_s": timed(plain),
        **partition_spread(plain),
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        plain2 = fact.join(dim, fact.key == dim.p_partkey)
        report["plain_noaqe"] = {
            "wall_s": timed(plain2),
            **partition_spread(plain2),
        }
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    salted = salted_join(
        fact,
        dim,
        "key",
        "p_partkey",
        n_salts=N_SALTS,
        salt_on=["l_orderkey", "l_linenumber"],
    )
    report["salted"] = {
        "wall_s": timed(salted),
        **partition_spread(salted),
    }
    # the hot key must actually occupy >= N_SALTS distinct salt values
    # on the fact side (what spreads its sort/build across tasks)
    b = fact.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber")),
            F.lit(N_SALTS),
        ),
    )
    report["hot_key_distinct_salts"] = (
        b.where(F.col("key") == 1).select("_salt").distinct().count()
    )
    report["row_counts_equal"] = (
        report["plain"]["total_rows"] == report["salted"]["total_rows"]
    )

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
