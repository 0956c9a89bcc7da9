#!/usr/bin/env python
"""Spill-pressure probe: the heaviest shuffle plans under constricted
execution memory (round 12, judge item 7).

A 1000-executor cluster WILL run these plans with partitions that do
not fit in execution memory; correctness then depends on the
sort/aggregate spill path, which a comfortable 48g local session never
exercises.  This probe runs the two heaviest shuffle plans —

  * minhash_pairs: the MinHash LSH candidate pipeline at sf1 (shingle
    explode → signature agg → band equi-join → jaccard verify, the
    widest pair shuffle in the repo), and
  * tpch_shapes:  sql_tpch_shapes at sf1 (the 22-shape union —
    extension_battery's widest branch: joins + wide aggregates over
    the ~6M-row lineitem fact)

— twice each, in SEPARATE JVMs (driver memory is fixed at JVM start):

  normal       the tuned session shape (8g heap, default memory
               fraction)
  constricted  1500m heap with spark.memory.fraction=0.15 and
               shuffle.partitions=8 — partitions sized to overflow
               execution memory so the spill path MUST engage

Each run computes an order-insensitive value hash (sum of xxhash64
over the stringified row — every column in these plans is
deterministic across memory configs: integer/DECIMAL-derived values
and single-division doubles) and parses its own event log for task
spill metrics.  The probe FAILS unless (a) both modes finish without
OOM, (b) the hashes match exactly, and (c) the constricted mode
actually spilled (otherwise it proved nothing).

Writes ONE JSON object to $SPILL_OUT (default SPILL_PROBE_r12.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/repo/.scratch/sf1")
OUT = os.environ.get("SPILL_OUT", "SPILL_PROBE_r12.json")

MODES = {
    "normal": {
        "driver_memory": "8g",
        "memory_fraction": "0.6",
        "shuffle_partitions": "16",
    },
    "constricted": {
        "driver_memory": "1500m",
        "memory_fraction": "0.15",
        "shuffle_partitions": "8",
    },
}


def _run_mode(mode: str) -> dict:
    """One probe mode in THIS process (invoked as a subprocess)."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cfg = MODES[mode]
    event_dir = tempfile.mkdtemp(prefix=f"spill-events-{mode}-")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"spill-probe-{mode}")
        .config("spark.driver.memory", cfg["driver_memory"])
        .config("spark.memory.fraction", cfg["memory_fraction"])
        .config("spark.sql.shuffle.partitions", cfg["shuffle_partitions"])
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", event_dir)
        # plain-text JSONL: the probe parses TaskEnd metrics itself
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from imdb_top_250_etl_pipeline_spark.plans import lookup
    from imdb_top_250_etl_pipeline_spark.plans.llm_data import (
        _minhash_pairs_raw,
    )

    plans = {
        "minhash_pairs": lambda: _minhash_pairs_raw(spark, SF_DIR),
        "tpch_shapes": lambda: lookup("sql_tpch_shapes").fn(spark, SF_DIR),
    }
    queries: dict[str, dict] = {}
    for name, mk in plans.items():
        t0 = time.perf_counter()
        df = mk()
        hashed = df.select(
            F.xxhash64(F.concat_ws("\x1f", *[
                F.col(c).cast("string") for c in df.columns
            ])).alias("h")
        ).agg(
            F.sum("h").alias("hsum"), F.count("*").alias("n")
        ).collect()[0]
        queries[name] = {
            "hash": int(hashed.hsum),
            "rows": int(hashed.n),
            "sec": round(time.perf_counter() - t0, 2),
        }
    spark.stop()  # flush the event log before parsing it

    mem = disk = tasks_spilled = n_tasks = 0
    peak_exec = 0
    paths = []
    for root, _dirs, files in os.walk(event_dir):
        paths += [os.path.join(root, f) for f in files]
    for path in paths:
        with open(path, errors="ignore") as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                tm = ev.get("Task Metrics") or {}
                m = tm.get("Memory Bytes Spilled", 0)
                d = tm.get("Disk Bytes Spilled", 0)
                n_tasks += 1
                if m or d:
                    tasks_spilled += 1
                mem += m
                disk += d
                peak_exec = max(
                    peak_exec, tm.get("Peak Execution Memory", 0)
                )
    return {
        "mode": mode,
        "config": cfg,
        "queries": queries,
        "spill": {
            "memory_bytes": mem,
            "disk_bytes": disk,
            "tasks_spilled": tasks_spilled,
            "tasks_total": n_tasks,
            "peak_execution_memory": peak_exec,
        },
    }


def main() -> None:
    if len(sys.argv) > 1:  # child: one mode, JSON on stdout's last line
        print("\n" + json.dumps(_run_mode(sys.argv[1])))
        return
    results = {}
    for mode in MODES:
        env = dict(os.environ)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        if p.returncode != 0:
            raise SystemExit(
                f"{mode} mode FAILED (rc={p.returncode}) — the spill "
                f"path did not survive:\n{p.stderr[-3000:]}"
            )
        results[mode] = json.loads(p.stdout.strip().splitlines()[-1])
    verdict = {"sf_dir": SF_DIR, "modes": results, "hash_match": {}, "ok": True}
    for q in results["normal"]["queries"]:
        a = results["normal"]["queries"][q]
        b = results["constricted"]["queries"][q]
        same = a["hash"] == b["hash"] and a["rows"] == b["rows"]
        verdict["hash_match"][q] = same
        verdict["ok"] &= same
    spilled = results["constricted"]["spill"]["tasks_spilled"] > 0
    verdict["constricted_spilled"] = spilled
    verdict["ok"] &= spilled
    with open(OUT, "w") as fh:
        json.dump(verdict, fh, indent=1)
    print(json.dumps(verdict)[:400])
    if not verdict["ok"]:
        raise SystemExit("spill probe verdict NOT ok")


if __name__ == "__main__":
    main()
