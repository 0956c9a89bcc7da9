"""Field-cleaning expression library — SURVEY §2.8 (F1–F9).

These are the Spark-native equivalents of the reference's densest logic:
per-field try/except extraction (webscraper-postgres.py:38-57) and the
``safe_int``/``safe_decimal``/``safe_list`` sanitizers (:174-188, :230-237).
Each is a pure Column → Column expression — JVM-side, codegen'd, constant-
folded by Catalyst — instead of row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def split_index(c: Column | str, sep: str, idx: int) -> Column:
    """F1/F2: ``text.split(sep)[idx]`` with NULL on missing index.

    Mirrors webscraper-postgres.py:38-40 (rank/title from "<n>. <title>")
    and :50-52 (imdb_score/views blob split on NBSP).  ``element_at``
    would raise on out-of-range; ``get`` (via getItem on a safe index) and
    NULL-on-missing matches the reference's except→nan fallback.
    """
    return F.get(F.split(_c(c), sep), idx)


def strip_parens(c: Column | str) -> Column:
    """F3: extract "3.2M" from "(3.2M)" — webscraper-postgres.py:52."""
    return F.regexp_extract(_c(c), r"\(([^)]*)\)", 1)


def concat_url(base: str, href: Column | str) -> Column:
    """F4: base-URL concat — webscraper-postgres.py:56.

    ``concat`` propagates NULL href → NULL url, matching the except→nan
    fallback on a missing <a href>.
    """
    return F.concat(F.lit(base), _c(href))


def safe_int(c: Column | str) -> Column:
    """F5: None/NaN/garbage → NULL else int — webscraper-postgres.py:174-180.

    ``try_cast`` via double first so "74.0"-style floats truncate like
    Python ``int(float)``; plain ints pass through exactly.
    """
    d = _c(c).try_cast("double")
    return F.when(F.isnan(d), F.lit(None)).otherwise(d).try_cast("int")


def safe_decimal(c: Column | str, precision: int = 3, scale: int = 1) -> Column:
    """F6: null-safe DECIMAL(3,1) cast — webscraper-postgres.py:182-188."""
    d = _c(c).try_cast("double")
    return F.when(F.isnan(d), F.lit(None)).otherwise(d).try_cast(
        f"decimal({precision},{scale})"
    )


def safe_list(c: Column | str) -> Column:
    """F7: NULL array → [] — webscraper-postgres.py:230-237."""
    return F.coalesce(_c(c), F.array().cast("array<string>"))


def nan_to_null(c: Column | str) -> Column:
    """F8: NaN sentinel → SQL NULL (double columns only)."""
    col = _c(c)
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)
