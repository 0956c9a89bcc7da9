"""Python-UDF surface: mapInPandas / applyInPandas operators.

The reference's entire extraction layer is row-at-a-time Python over a
live browser: get_element_data parses listing markup
(webscraper-postgres.py:36-70), data_details fans out one HTTP fetch per
row (:77-95).  Spark keeps that Python but Arrow-batches it and moves it
to the executors:

- ``parse_markup``: the F10 shape — CSS/regex extraction over a markup
  column, mapInPandas so one Python invocation handles thousands of rows.
- ``fetch_details``: the S2 shape — a scan parameterized by another
  table's URL column.  The HTTP call is STUBBED (no network in this
  container) with a deterministic body derived from the URL; the
  partition-parallel fan-out plumbing is exactly what a real fetcher
  needs (swap `_fake_fetch` for requests/httpx).
- ``grouped_zscore``: applyInPandas — the grouped-UDAF shape (per-group
  standardization), where the whole group must sit in one pandas frame.

Everything else in the engine avoids Python; these exist because the
semantics (imperative parse / external I/O / whole-group numpts) genuinely
do not map to built-in expressions.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MARKUP_RE = re.compile(
    r"<li><h3>(?P<rank>\d+)\. (?P<title>[^<]*)</h3>"
    r'<span class="meta">(?P<meta>[^<]*)</span>'
    r'<a href="(?P<href>[^"]*)">'
)

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("meta", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)


def parse_markup(df: DataFrame, markup_col: str, base_url: str) -> DataFrame:
    """F10: regex field extraction over markup, Arrow-batched.

    Mirrors get_element_data (webscraper-postgres.py:36-70): each field
    falls back to NULL on parse failure instead of raising — the
    reference's try/except→nan contract.
    """

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"rank": [], "title": [], "meta": [], "url": []}
            for markup in pdf[markup_col]:
                m = MARKUP_RE.search(markup) if markup is not None else None
                out["rank"].append(int(m.group("rank")) if m else None)
                out["title"].append(m.group("title") if m else None)
                out["meta"].append(m.group("meta") if m else None)
                out["url"].append(base_url + m.group("href") if m else None)
            yield pd.DataFrame(out)

    return df.mapInPandas(parse, schema=PARSED_SCHEMA)


FETCHED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("body_len", T.IntegerType()),
        T.StructField("page_id", T.LongType()),
    ]
)


def _fake_fetch(url: str) -> tuple[int, str]:
    """Deterministic stand-in for an HTTP GET (no network here).

    Body derives from the trailing numeric id; real deployments replace
    this one function with a session-pooled HTTP client — the
    mapInPandas fan-out around it is unchanged.
    """
    m = re.search(r"(\d+)$", url)
    if not m:
        return 404, ""
    page_id = int(m.group(1))
    return 200, "x" * (page_id % 97 + 10)


def fetch_details(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """S2: dependent scan — per-row page fetch, partition-parallel.

    The reference loops 250 serial Selenium loads
    (webscraper-postgres.py:97); here each partition fetches its batch
    independently, so throughput scales with executors. Repartition the
    URL column upstream to bound per-task fan-out.
    """

    def fetch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"url": [], "status": [], "body_len": [], "page_id": []}
            for url in pdf[url_col]:
                status, body = _fake_fetch(url)
                m = re.search(r"(\d+)$", url)
                rows["url"].append(url)
                rows["status"].append(status)
                rows["body_len"].append(len(body))
                rows["page_id"].append(int(m.group(1)) if m else None)
            yield pd.DataFrame(rows)

    return urls.mapInPandas(fetch, schema=FETCHED_SCHEMA)


def grouped_zscore(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """applyInPandas grouped standardization: z = (x - mean) / std per group.

    The grouped-UDAF shape: every group materializes as one pandas frame
    on one executor — correct only while the largest group fits in
    memory; at 100 TB skewed groups need salting or a two-pass
    mean/std join (which is also the pure-SQL alternative when the
    surrounding logic doesn't need pandas).
    """
    schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def z(pdf):
        import pandas as pd

        mean = pdf[value_col].mean()
        std = pdf[value_col].std(ddof=0)
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                id_col: pdf[id_col],
                "zscore": (pdf[value_col] - mean) / std if std > 0 else 0.0,
            }
        )

    return df.select(group_col, id_col, value_col).groupBy(group_col).applyInPandas(
        z, schema=schema
    )
