"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its DuckDB oracle twin on the same
parquet tables and compares row count, column names, and an
order-insensitive value hash — the same contract BASELINE.md describes.
Used by tests/test_oracle_parity.py so correctness regressions surface
in pytest before the driver's per-round verify.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import hashlib
import math


def _norm_cell(v):
    """Normalize one value to a hash-stable string.

    Floats use the full 17-significant-digit round-trip repr: the engines
    must agree bit-for-bit on our derived doubles (exact-decimal → double
    casts, per-row arithmetic), and a lenient rounding here would hide
    fp drift the driver's hash would catch; Decimals keep their exact
    string at the declared scale; timestamps normalize to microsecond ISO.
    """
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.17g}"
    if isinstance(v, _dec.Decimal):
        return f"dec:{v}"
    if isinstance(v, _dt.datetime):
        return "ts:" + v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return "b:" + str(int(v))
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    row_hashes = sorted(
        hashlib.md5(
            "|".join(_norm_cell(r[i]) for i in order).encode()
        ).hexdigest()
        for r in rows
    )
    return hashlib.md5("\n".join(row_hashes).encode()).hexdigest()


def compare(spark_df, duck_con, oracle: str) -> dict:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    rel = duck_con.sql(oracle)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    out = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(c.lower() for c in s_cols),
        "duck_cols": sorted(c.lower() for c in d_cols),
    }
    out["count_match"] = out["spark_rows"] == out["duck_rows"]
    out["cols_match"] = out["spark_cols"] == out["duck_cols"]
    s_tuples = [tuple(r) for r in s_rows]
    out["hash_match"] = (
        out["count_match"]
        and out["cols_match"]
        and _hash_rows([c.lower() for c in s_cols], s_tuples)
        == _hash_rows([c.lower() for c in d_cols], d_rows)
    )
    return out


def first_diff(spark_df, duck_con, oracle: str, limit: int = 5):
    """Debug helper: show rows present on one side only (normalized)."""
    s_cols = [c.lower() for c in spark_df.columns]
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_set = {}
    for r in spark_df.collect():
        t = tuple(r)
        key = "|".join(_norm_cell(t[i]) for i in order)
        s_set[key] = t
    rel = duck_con.sql(oracle)
    d_cols = [c.lower() for c in rel.columns]
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    d_set = {}
    for t in rel.fetchall():
        key = "|".join(_norm_cell(t[i]) for i in d_order)
        d_set[key] = t
    only_s = [s_set[k] for k in list(set(s_set) - set(d_set))[:limit]]
    only_d = [d_set[k] for k in list(set(d_set) - set(s_set))[:limit]]
    return only_s, only_d
