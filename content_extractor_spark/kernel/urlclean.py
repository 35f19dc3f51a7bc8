"""URL cleaning — semantics of the reference's UrlCleaner.

(``/root/reference/src/main/scala/info/coverified/extractor/util/UrlCleaner.scala:13-59``):
  * drop query params {nn, gtp, imgdownload, download, shoppingCart,
    cms_handOverParams},
  * drop the fragment,
  * strip ``;jsessionid=...`` from every path segment,
  * punycode-normalize the host,
  * ``mergeHostAndUrl``: absolutize ``//x`` -> ``https://x`` and
    relative paths -> ``host + url`` (Analyzer image extraction,
    Analyzer.scala:345-362).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

UNWANTED_QUERY_PARAMS = frozenset(
    ["nn", "gtp", "imgdownload", "download", "shoppingCart", "cms_handOverParams"]
)

_JSESSIONID_RE = re.compile(r";jsessionid=.*?(?=\?)|;jsessionid=.*")


def clean_url(url: str) -> str:
    parts = urlsplit(url.strip())
    scheme = parts.scheme or "https"
    host = parts.hostname or ""
    try:
        host_ascii = host.encode("idna").decode("ascii") if host else ""
    except Exception:
        host_ascii = host
    netloc = host_ascii
    if parts.port is not None:
        netloc = f"{netloc}:{parts.port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    # strip ;jsessionid from each path segment
    path = "/".join(
        _JSESSIONID_RE.sub("", seg) for seg in parts.path.split("/")
    )
    # drop unwanted query params, keep the rest verbatim (order preserved)
    query = "&".join(
        pair
        for pair in parts.query.split("&")
        if pair and pair.split("=", 1)[0] not in UNWANTED_QUERY_PARAMS
    )
    return urlunsplit((scheme, netloc, path, query, ""))


def merge_host_and_url(url: str, host: str) -> str:
    """UrlCleaner.mergeHostAndUrl: absolutize then clean."""
    if host in url:
        merged = url
    elif url.startswith("//"):
        merged = "https:" + url
    else:
        merged = host + url
    return clean_url(merged)
