"""Arrow-vectorized standalone UDFs (SURVEY §2.7).

The extraction pipeline itself never calls these (it computes hashes
and cleaned URLs inside the one mapInArrow stage); they exist for ad-
hoc SQL use — `SELECT content_hash(title, summary, content, date)` —
and register via :func:`register_all`.

Both are pandas UDFs (Arrow batch transfer), never row-at-a-time
Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType

from ..kernel.scala_hash import content_hash as _content_hash
from ..kernel.urlclean import canonicalize_url as _canon
from ..kernel.urlclean import clean_url as _clean_url
from ..kernel.urlclean import merge_host_and_url as _merge


@pandas_udf(IntegerType())
def content_hash_udf(
    title: pd.Series, summary: pd.Series, content: pd.Series, date: pd.Series
) -> pd.Series:
    """Scala Tuple4 hashCode of (title, summary, content, date); None -> ''."""
    return pd.Series(
        [
            _content_hash(t or "", s, c, d)
            for t, s, c, d in zip(title, summary, content, date)
        ],
        dtype="int32",
    )


@pandas_udf(StringType())
def clean_url_udf(url: pd.Series) -> pd.Series:
    """UrlCleaner.cleanUrl (strip tracking params/fragment/jsessionid)."""
    def one(u):
        if u is None:
            return None
        try:
            return _clean_url(u)
        except Exception:
            return u

    return url.map(one)


@pandas_udf(StringType())
def merge_host_url_udf(url: pd.Series, host: pd.Series) -> pd.Series:
    """UrlCleaner.mergeHostAndUrl (absolutize + clean)."""
    def one(u, h):
        if u is None or h is None:
            return None
        try:
            return _merge(u, h)
        except Exception:
            return u

    return pd.Series([one(u, h) for u, h in zip(url, host)])


@pandas_udf(StringType())
def canonicalize_url_udf(url: pd.Series) -> pd.Series:
    """RFC 3986 syntax-based normalization for crawl-frontier url
    identity (kernel.urlclean.canonicalize_url): lowercase scheme/
    host, default ports + fragments stripped, dot-segments resolved,
    percent-normalization, tracking params dropped."""
    return pd.Series([_canon(u) for u in url])


def register_all(spark) -> None:
    spark.udf.register("content_hash", content_hash_udf)
    spark.udf.register("clean_url", clean_url_udf)
    spark.udf.register("merge_host_url", merge_host_url_udf)
    spark.udf.register("canonicalize_url", canonicalize_url_udf)
