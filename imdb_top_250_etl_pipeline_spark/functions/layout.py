"""Multi-dimensional layout keys for data-skipping writes.

``write_sorted_parquet`` (sources/sink.py) makes parquet row-group
min/max stats selective on ONE sort column; scans filtering on a
different column skip nothing.  Z-ordering (bit-interleaving the
dimensions into one Morton key) spreads locality across ALL interleaved
columns: sorting by the key clusters rows so that row-group ranges stay
narrow on every dimension, the same technique behind Delta OPTIMIZE
ZORDER BY / Iceberg sort orders.  Pure codegen integer arithmetic —
usable in any write path today, no table format required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(*cols: Column | str, bits_per_col: int = 21) -> Column:
    """Morton (Z-order) key: interleave the low ``bits_per_col`` bits of
    each column, first column in the lowest interleaved position.

    Inputs must be non-negative integers below ``2**bits_per_col``
    (values above contribute only their low bits — callers rank-encode
    or bucket wider domains first).  The default 21 bits × up to 3
    columns fits a 63-bit signed long.  The expression is a flat sum of
    shift/mask terms — whole-stage codegen, no UDF, and expressible
    identically in any SQL engine, which keeps layouts portable and
    oracle-checkable.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    n = len(cols)
    if n * bits_per_col > 63:
        raise ValueError(
            f"{n} cols x {bits_per_col} bits = {n * bits_per_col} bits "
            "exceeds a signed 64-bit key; lower bits_per_col"
        )
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for i, c in enumerate(cs):
        cl = c.cast("long")
        for j in range(bits_per_col):
            key = key + F.shiftleft(
                F.shiftright(cl, j).bitwiseAND(F.lit(1)), j * n + i
            )
    return key


def zorder_key_sql(col_names: list[str], bits_per_col: int = 21) -> str:
    """The same Morton key as ANSI-ish SQL text (DuckDB-compatible) —
    the oracle twin of :func:`zorder_key`, kept adjacent so the two
    stay in lockstep."""
    n = len(col_names)
    terms = [
        f"((({c} >> {j}) & 1) << {j * n + i})"
        for i, c in enumerate(col_names)
        for j in range(bits_per_col)
    ]
    return "(" + " + ".join(terms) + ")"
