"""JSON-LD extraction — semantics of the reference's JsonLD object.

(``/root/reference/src/main/scala/info/coverified/extractor/analyzer/JsonLD.scala:20-114``):
only the FIRST ``script[type="application/ld+json"]`` element is read;
the JSON decodes into a fixed struct (width/height are numeric but may
arrive as strings — circe coerces, we do too). ``publish_date`` returns
``datePublished`` or raises KeyError (the Analyzer then falls back to
the element-based date, Analyzer.scala:405-417).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

from .css import select_first
from .dom import DataNode, Element, TextNode

LD_SELECTOR = 'script[type="application/ld+json"]'


def _to_float(v: Any) -> Optional[float]:
    if v is None:
        return None
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def _to_str(v: Any) -> Optional[str]:
    if v is None:
        return None
    if isinstance(v, str):
        return v
    return json.dumps(v, ensure_ascii=False)


def _logo(d: Any) -> Optional[Dict[str, Any]]:
    if not isinstance(d, dict):
        return None
    return {
        "@type": _to_str(d.get("@type")),
        "url": _to_str(d.get("url")),
        "width": _to_float(d.get("width")),
        "height": _to_float(d.get("height")),
    }


def decode(json_str: str) -> Dict[str, Any]:
    """Decode a JSON-LD string into the reference's JsonLD struct shape."""
    data = json.loads(json_str)
    if isinstance(data, list):  # some sites wrap in an array; take first
        data = data[0] if data else {}
    if not isinstance(data, dict):
        raise ValueError("JSON-LD payload is not an object")
    publisher = None
    p = data.get("publisher")
    if isinstance(p, dict):
        publisher = {
            "@type": _to_str(p.get("@type")),
            "name": _to_str(p.get("name")),
            "logo": _logo(p.get("logo")),
        }
    return {
        "@context": _to_str(data.get("@context")),
        "@type": _to_str(data.get("@type")),
        "author": _to_str(data.get("author")),
        "headline": _to_str(data.get("headline")),
        "datePublished": _to_str(data.get("datePublished")),
        "dateCreated": _to_str(data.get("dateCreated")),
        "dateModified": _to_str(data.get("dateModified")),
        "mainEntityOfPage": _to_str(data.get("mainEntityOfPage")),
        "description": _to_str(data.get("description")),
        "keywords": _to_str(data.get("keywords")),
        "publisher": publisher,
        "image": _logo(data.get("image")),
    }


def from_document(root: Element) -> Dict[str, Any]:
    """Decode JSON-LD from the first ld+json script of a document."""
    el = select_first(root, LD_SELECTOR)
    if el is None:
        raise LookupError("Cannot find JSON-LD in provided document!")
    raw = "".join(
        c.text for c in el.children if isinstance(c, (DataNode, TextNode))
    )
    return decode(raw)


def publish_date(root: Element) -> str:
    ld = from_document(root)
    v = ld.get("datePublished")
    if not v:
        raise LookupError("Published date is not set in provided documents JSON-LD.")
    return v
