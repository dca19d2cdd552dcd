"""Arrow-batched pandas UDFs wrapping the semantic kernel.

Only the pieces that genuinely need imperative string logic live here:
- html -> (text, links[]) single-pass extraction (the html bytes cross the
  Python boundary ONCE per page; both outputs come from that one transfer)
- the exact normalize_url (used as cross-check; the hot path uses the
  Catalyst Column version in urlsql.py)

All are Series->Series pandas UDFs (Arrow batches), never per-row Python
UDFs (BASELINE.json input_hint).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from ..kernel.html import extract_links, extract_title, html_to_text
from ..kernel.urls import normalize_url

EXTRACT_SCHEMA = StructType([
    StructField("text", StringType()),
    StructField("links", ArrayType(StringType())),
])


@F.pandas_udf(StringType())
def normalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(normalize_url, na_action=None)


@F.pandas_udf(StringType())
def extract_title_udf(html: pd.Series) -> pd.Series:
    """F9 (crawler.c:749-797) over binary html; empty string when absent."""
    return html.map(
        lambda h: extract_title(bytes(h) if h is not None else b"")
        .decode("utf-8", errors="replace"), na_action=None)


@F.pandas_udf(StringType())
def medium_filename_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    """S4 medium variant (crawler.c:800-845): title slug / profile user /
    url-hash filename."""
    from ..kernel.html import derive_medium_filename

    return pd.Series([
        derive_medium_filename(u or "", bytes(h) if h is not None else b"")
        for u, h in zip(url, html)])


def _extract_one(html, base_url: str, max_depth_reached: bool):
    text = html_to_text(bytes(html) if html is not None else b"")
    links = [] if max_depth_reached else extract_links(
        bytes(html) if html is not None else b"", base_url)
    return text.decode("utf-8", errors="replace"), links


@F.pandas_udf(EXTRACT_SCHEMA)
def extract_struct_udf(html: pd.Series, base_url: pd.Series,
                       skip_links: pd.Series) -> pd.DataFrame:
    texts = []
    links = []
    for h, b, s in zip(html, base_url, skip_links):
        t, l = _extract_one(h, b, bool(s))
        texts.append(t)
        links.append(l)
    return pd.DataFrame({"text": texts, "links": links})


def html_text_and_links(df, html_col: str = "html", url_col: str = "url",
                        skip_links_col=None):
    """Attach `text` and `links` columns via ONE pass over the html bytes.
    `skip_links_col` (bool column name) suppresses link extraction for pages
    at max depth - the reference skips extract_links there (crawler.c:1289)
    and at 100 TB the skipped parse is real money."""
    skip = F.col(skip_links_col) if skip_links_col else F.lit(False)
    ex = extract_struct_udf(F.col(html_col), F.col(url_col), skip)
    return (df.withColumn("_ex", ex)
              .withColumn("text", F.col("_ex.text"))
              .withColumn("links", F.col("_ex.links"))
              .drop("_ex"))
