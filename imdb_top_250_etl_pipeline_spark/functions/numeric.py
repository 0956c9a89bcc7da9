"""Exact-arithmetic helpers for oracle-stable aggregates.

Summing doubles is order-dependent floating point; Spark's shuffle order
differs run-to-run and from DuckDB's, so money aggregates are computed in
DECIMAL (exact, associative) and only the final projection casts to DOUBLE
(both engines round the same exact decimal to the same IEEE bits).  The
same discipline appears verbatim in the oracle SQL strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# input casts sized so 3-way products stay under DECIMAL(38,*) in both
# Spark (p1+p2+1) and DuckDB (p1+p2) multiplication typing rules
MONEY = "decimal(12,2)"  # prices (< 10^10, 2dp)
RATE = "decimal(8,4)"  # discounts/taxes (0..1, ≤4dp in fixtures)
QTY = "decimal(12,2)"  # quantities


def money(c: Column | str) -> Column:
    return (F.col(c) if isinstance(c, str) else c).cast(MONEY)


def rate(c: Column | str) -> Column:
    return (F.col(c) if isinstance(c, str) else c).cast(RATE)


def round_money(sum_c: Column) -> Column:
    """The registry's money-output discipline in one place: round the
    exact decimal aggregate to cents, then cast to double (both engines
    convert the small-unscaled decimal to the same IEEE bits; see
    plans/registry.py)."""
    return F.round(sum_c, 2).cast("double")
