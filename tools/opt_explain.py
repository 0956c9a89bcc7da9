#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/<round>/.

Usage:
  python tools/opt_explain.py --suffix before [--only substr,...]
      [--sf-dir /root/testdata/sf0.1]

Writes plans/r13/<query>_<suffix>.txt for every bench HEADLINE query
(with the bench's raw overrides applied, so the captured plan is the
one the bench times), plus a one-line summary of Exchange / join /
Python-eval node counts per plan on stdout.
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(txt: str) -> str:
    c = lambda pat: len(re.findall(pat, txt))
    return (
        f"Exchange={c('Exchange')} SMJ={c('SortMergeJoin')} "
        f"BHJ={c('BroadcastHashJoin')} SHJ={c('ShuffledHashJoin')} "
        f"PyEval={c('BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas')} "
        f"WSCG={c(r'WholeStageCodegen')} Window={c('Window')} "
        f"Sort={c(r'[+*-] Sort ')}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--only", default="")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--round", default="r14")
    args = ap.parse_args()

    import bench
    from imdb_top_250_etl_pipeline_spark.plans import QUERIES, SUBSUMED, lookup
    from imdb_top_250_etl_pipeline_spark.session import get_spark

    spark = get_spark("opt-explain")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.round)
    os.makedirs(outdir, exist_ok=True)
    only = [s for s in args.only.split(",") if s]
    names = [n for n in bench.HEADLINE if n in QUERIES or n in SUBSUMED]
    raw = bench._raw_overrides()
    for name in names:
        if only and not any(s in name for s in only):
            continue
        fn = raw.get(name) or lookup(name).fn
        try:
            txt = plan_text(fn(spark, args.sf_dir))
        except Exception as ex:  # noqa: BLE001
            txt = f"ERROR: {ex}"
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"{name}: {summarize(txt)}")


if __name__ == "__main__":
    main()
