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


def money2(c: Column) -> Column:
    """Final display cast for money aggregates: DECIMAL(18,2)."""
    return c.cast("decimal(18,2)")


def dec_sum(c: Column, out: str = "decimal(18,2)") -> Column:
    """Exact decimal sum with a fixed output type."""
    return F.sum(c).cast(out)


def dec_avg(sum_c: Column, count_c: Column) -> Column:
    """avg as exact-decimal sum → double → / count.

    Both engines cast the same exact decimal to the same IEEE double and
    divide by the same integer — bit-identical, unlike avg() over doubles.
    """
    return F.sum(sum_c).cast("double") / count_c
