"""Nested-schema normalization: flatten struct columns for relational
consumers.

Schema-on-read ingestion (from_json / parquet written by document
stores) yields deeply nested StructType columns; downstream relational
operators, oracle hashing, and most BI sinks want flat columns.  Pure
projection — resolved at plan time from the schema, zero data movement,
no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = "_", max_depth: int = 10) -> DataFrame:
    """Recursively lift every StructType column's fields to top level as
    ``<parent><sep><field>`` columns (depth-first, stable field order).

    Arrays and maps are left as-is (flattening them multiplies rows —
    that is ``explode``'s job, an explicit cardinality decision, not a
    projection).  Name collisions raise instead of silently
    overwriting.  ``max_depth`` guards recursive/self-referential
    schemas.  The projection is resolved entirely from the schema on
    the driver — Catalyst collapses it into any adjacent select, so
    flattening is free at execution time.
    """
    cols: list[Column] = []
    names: set[str] = set()

    def add(col: Column, name: str, dtype: T.DataType, depth: int) -> None:
        if isinstance(dtype, T.StructType) and depth < max_depth:
            for f in dtype.fields:
                add(col.getField(f.name), f"{name}{sep}{f.name}", f.dataType, depth + 1)
        else:
            if name in names:
                raise ValueError(f"flatten collision on column {name!r}")
            names.add(name)
            cols.append(col.alias(name))

    for f in df.schema.fields:
        add(F.col(f.name), f.name, f.dataType, 0)
    return df.select(*cols)
