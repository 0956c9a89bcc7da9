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
            # vectorized C-level regex over the whole Arrow batch —
            # pandas .str.extract, not a per-row Python loop (measured
            # meaningfully faster at bench scale); non-matches yield NaN
            # which maps to NULL per the reference's contract
            ext = pdf[markup_col].str.extract(MARKUP_RE)
            yield pd.DataFrame(
                {
                    "rank": pd.to_numeric(ext["rank"], errors="coerce").astype(
                        "Int32"
                    ),
                    "title": ext["title"],
                    "meta": ext["meta"],
                    "url": (base_url + ext["href"]).where(ext["href"].notna()),
                }
            )

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


def make_http_fetch(timeout: float = 10.0):
    """A real HTTP GET for ``fetch_details`` (stdlib urllib — no extra
    deps), returned as a picklable callable for executor shipping.

    The 10 s default mirrors the reference's explicit wait bound
    (webscraper-postgres.py:32,79 — WebDriverWait(driver, 10)).  Unused
    in this container (no network); exists so a real deployment swaps
    fetchers with ``fetch_details(urls, fetch_fn=make_http_fetch())``
    and changes nothing else.
    """

    def http_fetch(url: str) -> tuple[int, str]:
        import urllib.error
        import urllib.request

        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                return resp.status, resp.read().decode("utf-8", errors="replace")
        except urllib.error.HTTPError as e:
            return e.code, ""
        except Exception:
            return 0, ""  # network failure → status 0, like a timed-out driver

    return http_fetch


def fetch_details(
    urls: DataFrame, url_col: str = "url", fetch_fn=None
) -> DataFrame:
    """S2: dependent scan — per-row page fetch, partition-parallel.

    The reference loops 250 serial Selenium loads
    (webscraper-postgres.py:97); here each partition fetches its batch
    independently, so throughput scales with executors. Repartition the
    URL column upstream to bound per-task fan-out.

    ``fetch_fn(url) -> (status, body)`` is the pluggable I/O seam: the
    default is the deterministic no-network stub (so tests and oracles
    are reproducible); pass ``make_http_fetch()`` — or any
    session-pooled client wrapper — for live fetching.  The callable is
    shipped to executors inside the mapInPandas closure, so it must be
    picklable (top-level function or functools.partial).
    """
    fetch_fn = fetch_fn or _fake_fetch

    def fetch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"url": [], "status": [], "body_len": [], "page_id": []}
            for url in pdf[url_col]:
                status, body = fetch_fn(url)
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


def token_spans_udtf():
    """Python UDTF (Spark 4): tokenize with CHARACTER OFFSETS — each
    input row expands to (pos, span, char_start) rows.

    The user-defined TABLE function is the row-expanding UDF surface
    (posexplode can split, but per-span derived state like running
    character offsets needs generator logic).  Registered for SQL use
    with ``LATERAL`` — ``FROM docs d, LATERAL token_spans(d.text, ' ')``
    — the span-annotation shape NER/chunk-offset pipelines need.

    UDTFs evaluate row-at-a-time Python (the slow path, acceptable for
    row-expanding logic that built-ins can't express); the class is
    stateless per row, so Spark parallelizes it like any projection.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, span string, char_start int")
    class TokenSpans:
        def eval(self, text: str, delim: str):
            if text is None or delim is None:
                return
            off = 0
            for i, tok in enumerate(text.split(delim)):
                yield i, tok, off
                off += len(tok) + len(delim)

    return TokenSpans


def register_token_spans(spark) -> None:
    spark.udtf.register("token_spans", token_spans_udtf())


def normalize_embeddings_arrow(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    out_col: str = "unit_vec",
) -> DataFrame:
    """L2-normalize an embedding column via ``mapInArrow`` — the
    arrow-NATIVE batch UDF surface: RecordBatches cross the boundary
    and the kernel runs numpy over the list-array's FLAT value buffer
    (offsets reused as-is), so no per-row Python objects and no
    pandas conversion exist anywhere on the path.

    mapInArrow sits below mapInPandas in the stack (pandas wraps these
    same batches); it is the right tool when the kernel is pure
    array math over nested types — pandas would box each list row into
    a Python object just to unbox it again.  Cosine-similarity
    pipelines normalize once up front precisely so the inner loop can
    use plain dot products; this is that preprocessing pass, tested
    equivalent to the JVM expression form within float tolerance.
    """

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            emb = batch.column(1)
            flat = np.asarray(emb.values, dtype=np.float64)
            offsets = np.asarray(emb.offsets)
            # per-row L2 norms over the flat buffer via reduceat on the
            # squared values (guard empty rows); zero vectors stay zero
            sq = flat * flat
            # reduceat demands every index < len(values), but a
            # TRAILING empty row's start offset equals len(values).
            # Pad one sentinel 0 so index len(flat) is legal; every
            # real slot boundary is below the pad, so non-empty rows
            # sum exactly as before and empty slots reduce to the
            # sentinel (0) or get masked by lens>0 below.  (Clamping
            # the starts instead would be WRONG: each start is also
            # the END boundary of the previous slot, so clamping
            # steals the last element from the preceding row.)
            starts = offsets[:-1]
            if len(starts):
                sums = np.add.reduceat(np.append(sq, 0.0), starts)
            else:
                sums = np.array([])
            lens = np.diff(offsets)
            sums = np.where(lens > 0, sums, 0.0)
            norms = np.sqrt(sums)
            scale = np.where(norms > 0, 1.0 / np.where(norms > 0, norms, 1.0), 0.0)
            out_flat = flat * np.repeat(scale, lens)
            out = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(out_flat, type=pa.float64()),
            )
            yield pa.RecordBatch.from_arrays(
                [ids, out], names=[id_col, out_col]
            )

    src = df.select(id_col, emb_col)
    return src.mapInArrow(
        kernel, f"{id_col} long, {out_col} array<double>"
    )


def lang_id_pandas_udf():
    """Vectorized SCALAR ``pandas_udf`` — the one Python-UDF variant the
    other seams don't cover: a column-in/column-out function usable
    inside ANY expression or SQL projection (mapInPandas rewrites whole
    partitions; applyInPandas needs a grouping; a scalar UDF slots into
    a select).  This is the model-scoring seam in its most composable
    form: production swaps the marker heuristic for a fasttext/onnx
    ``model.predict(batch)`` — the Arrow batching contract is
    identical.

    The body reimplements ``text.language_id``'s marker-argmax exactly
    (same lexicons, same first-language tie-break), which the test pins
    against the expression version — so the UDF seam is verified
    without inventing new semantics.
    """
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    from .text import LANG_MARKERS

    def _lang_id(texts):
        def one(t):
            if not t:
                return next(iter(LANG_MARKERS))
            words = t.split(" ")
            best_lang, best = None, None
            for i, (lang, markers) in enumerate(LANG_MARKERS.items()):
                score = sum(1 for w in words if w in markers)
                key = (score, -i)
                if best is None or key > best:
                    best, best_lang = key, lang
            return best_lang

        return texts.map(one)

    # real-object annotations: this module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf's
    # signature inspection cannot resolve
    _lang_id.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_lang_id, "string")
