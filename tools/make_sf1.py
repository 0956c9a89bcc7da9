#!/usr/bin/env python
"""Materialize an sf1-scale dataset (10x sf0.1) for the scale-validation sweep.

The driver ships sf0.001/0.01/0.1 only; the 100x-design claims deserve at
least one order-of-magnitude stress beyond the bench scale.  This script
replicates every non-dimension sf0.1 table 10x with key-offset striding so
referential integrity survives (replica r adds r*stride to each surrogate
key, where stride = max(key)+1 of the source — keys are 0-based, so a
max-only stride would collide each replica's first key with its
neighbor's last; the first sweep caught exactly that as 9 duplicate ids
per keyed table breaking upsert/dedup/window oracles).  `region`/`nation`
are dimensions shared by all replicas and are copied as-is, so foreign
keys into them (c_nationkey, s_nationkey) need no remap.

Deliberate consequences, all realistic at corpus scale:
  * documents/embeddings replicas keep identical text/vectors under new
    ids — every doc gains 9 exact clones, which is a *stress* shape for
    the dedup/LSH family (dense duplicate clusters, hot buckets) rather
    than a free pass.
  * events replicas get fresh user_ids, so per-user activity distribution
    (sessionization, funnels, retention) is preserved while the user
    population grows 10x — the same way real traffic grows.

Output: $OUT (default /root/repo/.scratch/sf1), one parquet per table.
DuckDB writes timestamps as int64 microseconds, matching the source's
logical type; the engine's catalog sniffs the unit either way.
Deterministic — no random source anywhere.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SF1_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("SF1_OUT", "/root/repo/.scratch/sf1")
REPLICAS = int(os.environ.get("SF1_REPLICAS", "10"))

# table -> {column: stride_source_table.column} for key columns that must
# be offset per replica.  Columns not listed are copied verbatim.
KEYED = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
DIMS = ["region", "nation"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    strides: dict[tuple[str, str], int] = {}
    for tbl, cols in KEYED.items():
        for _, (st, sc) in cols.items():
            if (st, sc) not in strides:
                strides[(st, sc)] = (
                    con.sql(
                        f"SELECT max({sc}) FROM '{SRC}/{st}.parquet'"
                    ).fetchone()[0]
                    + 1
                )

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        sys.stderr.write(f"{t}: copied\n")

    for t, cols in KEYED.items():
        src_cols = [
            r[0]
            for r in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        ]
        proj = []
        for c in src_cols:
            if c in cols:
                stride = strides[cols[c]]
                proj.append(f"{c} + r.replica * {stride} AS {c}")
            else:
                proj.append(c)
        sql = (
            f"COPY (SELECT {', '.join(proj)} "
            f"FROM '{SRC}/{t}.parquet', "
            f"(SELECT unnest(range({REPLICAS})) AS replica) r) "
            # round-13: small row groups so Spark byte-range splits are
            # non-empty — a 100 TB corpus arrives as MANY splittable
            # files, and a single-row-group fixture serializes every
            # scan-side CPU pass onto one task, which is the opposite of
            # the scale shape this dataset exists to rehearse (the
            # session sets files.minPartitionNum so the splits realize)
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 1024)"
        )
        con.execute(sql)
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        sys.stderr.write(f"{t}: {n} rows\n")


if __name__ == "__main__":
    main()
