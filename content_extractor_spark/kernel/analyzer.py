"""Extraction kernel: the reference Analyzer's semantics, pure Python.

Reimplements (Spark-free, runs inside Arrow batch UDFs):
  * page-type dispatch (first pageType whose path & selector conditions
    match — ``Analyzer.scala:154-207``),
  * ``extractInformation`` E1-E14 (``Analyzer.scala:222-282``): title
    (mandatory), summary, content with exclude-selectors (including the
    literal prefix-strip quirk at ``Analyzer.scala:600-604`` where the
    content selector is NOT regex-escaped), date pipeline (JSON-LD
    first / element attr / element text -> optional regex narrowing ->
    Java-pattern reformat to UTC ISO), tags (all matches, doc order),
    image URL (srcset: last candidate's first token) + URL cleaning,
  * the content hash (Scala Tuple4 hashCode).

Row-level failures return an ``AnalysisResult`` with a non-"ok" status;
they must never raise out of a Spark task.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple
from urllib.parse import urlsplit

from . import jsonld
from .css import SelectorParseError, select, select_first
from .dates import reformat_datetime
from .dom import PRESERVE_WS_TAGS, Document, Element, parse
from .profiles import DateSelector, ImageSelector, PageType, ProfileConfig, Selectors
from .scala_hash import content_hash

ISO_DATE_TIME_PATTERN = "yyyy-MM-dd'T'HH:mm:ssXXX"

STATUS_OK = "ok"
STATUS_PROFILE_MISS = "profile_miss"
STATUS_NO_TITLE = "no_title"
STATUS_ERROR = "error"


@dataclass
class RawEntryInformation:
    """Mirror of EntryInformation.RawEntryInformation (EntryInformation.scala:70-78)."""

    title: str
    summary: Optional[str] = None
    content: Optional[str] = None
    date: Optional[str] = None
    tags: Optional[List[str]] = None
    etag: Optional[str] = None
    image_url: Optional[str] = None

    def content_hash(self) -> int:
        return content_hash(self.title, self.summary, self.content, self.date)


@dataclass
class AnalysisResult:
    status: str
    entry: Optional[RawEntryInformation] = None
    page_type: Optional[str] = None
    error: Optional[str] = None


# -- page-type dispatch (P2-P4) ------------------------------------------------


def selector_matches(doc: Element, page_type: PageType) -> bool:
    """P3: doc has >=1 element matching condition.selector (none set -> True).

    Unparseable selectors match nothing (observable jsoup behavior)."""
    sel = page_type.condition_selector
    if not sel:
        return True
    try:
        return select_first(doc, sel) is not None
    except SelectorParseError:
        return False


def path_matches(url: str, page_type: PageType) -> bool:
    """P2: url contains condition.path (none set -> True)."""
    path = page_type.condition_path
    return path is None or path in (url or "")


def get_selectors(
    url: str, doc: Element, profile: ProfileConfig
) -> Tuple[Optional[Selectors], Optional[str]]:
    """P4: FIRST pageType (list order) with both conditions true."""
    for pt in profile.page_types:
        if selector_matches(doc, pt) and path_matches(url, pt):
            return pt.selectors, pt.name
    return None, None


# -- field extraction (E2-E14) --------------------------------------------------


def _first_text(doc: Element, selector: str) -> Optional[str]:
    try:
        el = select_first(doc, selector)
    except SelectorParseError:
        return None
    return el.text() if el is not None else None


def _all_texts(doc: Element, selector: str) -> Optional[List[str]]:
    try:
        els = select(doc, selector)
    except SelectorParseError:
        return None
    return [e.text() for e in els]


def extract_content(
    doc: Element,
    content_selector: str,
    exclude_selectors: Optional[List[str]],
) -> Optional[str]:
    """E4 (Analyzer.scala:590-610), including the re-parse of outerHtml
    and the literal, non-regex-escaped prefix-strip of exclude selectors."""
    try:
        selected = select_first(doc, content_selector)
    except SelectorParseError:
        return None
    if selected is None:
        return None
    if not exclude_selectors and (
        not selected.preserve or selected.tag in PRESERVE_WS_TAGS
    ):
        # nothing to remove and the node's text rendering doesn't depend
        # on an ancestor OUTSIDE itself: re-parse makes `selected` the
        # subtree root, which drops whitespace-preservation inherited
        # from an enclosing <pre> (but keeps it when selected itself is
        # <pre>-ish). The inherited `preserve` flag — not a capped
        # ancestor walk — is the exact condition (pinned by
        # test_clone_equals_reparse + deep-nesting cases)
        return selected.text()
    # The reference re-parses the selected element's outerHtml as a
    # fresh document (Analyzer.scala:597). A deep clone into the same
    # #root>html>head+body wrapper produces the identical tree for any
    # tree our builder built (pinned by the golden cases and the
    # differential fuzz suite) without paying the serialize+tokenize
    # cost a second time per document.
    sub = Document()
    html_el = Element("html")
    sub.append(html_el)
    html_el.append(Element("head"))
    body = Element("body")
    html_el.append(body)
    body.append(selected.clone())
    if exclude_selectors:
        # faithful quirk: contentSelector used as a raw regex prefix
        prefix_re = re.compile("^" + content_selector + " ?")
        for ex in exclude_selectors:
            stripped = prefix_re.sub("", ex)
            try:
                # index=False: each removal invalidates the subtree
                # index, so building one per exclude round is pure waste
                for el in select(sub, stripped, index=False):
                    el.remove()
            except SelectorParseError:
                continue
    return sub.text()


def get_date_time_string_from_content(doc: Element, selector: str) -> str:
    t = _first_text(doc, selector)
    if t is None:
        raise LookupError(f"Cannot extract date time from content with '{selector}'")
    return t


def get_date_time_string_from_element(doc: Element, cfg: DateSelector) -> str:
    """E7 (Analyzer.scala:436-472)."""
    if cfg.attribute_val is not None:
        try:
            el = select_first(doc, cfg.selector)
        except SelectorParseError:
            el = None
        if el is None:
            raise LookupError(
                f"Cannot extract date time element with selector '{cfg.selector}'"
            )
        if el.has_attr(cfg.attribute_val):
            return el.attr(cfg.attribute_val)
        return get_date_time_string_from_content(doc, cfg.selector)
    return get_date_time_string_from_content(doc, cfg.selector)


def get_date_time_string(doc: Element, cfg: DateSelector) -> Tuple[str, str]:
    """E6 (Analyzer.scala:400-422): JSON-LD first if configured, else element."""
    if cfg.try_json_ld_first:
        try:
            return jsonld.publish_date(doc), ISO_DATE_TIME_PATTERN
        except Exception:
            pass
    return get_date_time_string_from_element(doc, cfg), cfg.format


def apply_date_time_regex(raw: str, pattern: Optional[str]) -> str:
    """E9 (Analyzer.scala:513-530): first regex match, no pattern -> identity."""
    if pattern is None:
        return raw
    m = re.search(pattern, raw)
    if m is None:
        raise ValueError(f"Application of regex pattern '{pattern}' onto '{raw}' failed")
    return m.group(0)


def extract_date(
    doc: Element,
    cfg: DateSelector,
    target_pattern: str = ISO_DATE_TIME_PATTERN,
    target_zone: str = "UTC",
) -> Optional[str]:
    """E5 (Analyzer.scala:298-343): any failure -> None (non-fatal)."""
    try:
        raw, fmt = get_date_time_string(doc, cfg)
        narrowed = apply_date_time_regex(raw, cfg.pattern)
        return reformat_datetime(
            narrowed, fmt, cfg.default_zone_id, target_pattern, target_zone
        )
    except Exception:
        return None


def _img_url_by_attribute(el: Element, attribute_val: str) -> Optional[str]:
    """E12 srcset handling (Analyzer.scala:364-387)."""
    if not el.has_attr(attribute_val):
        return None
    value = el.attr(attribute_val)
    if attribute_val == "srcset":
        candidates = [c.strip() for c in value.split(",")]
        if not candidates:
            return None
        tokens = candidates[-1].split(" ")
        return tokens[0] if tokens else None
    return value


def extract_image_url(
    doc: Element, cfg: ImageSelector, entry_url: str
) -> Optional[str]:
    """E12+E13 (Analyzer.scala:345-362): host of entry URL + cleaned src."""
    try:
        parts = urlsplit(entry_url)
        if not parts.scheme or not parts.hostname:
            return None
        host = f"{parts.scheme}://{parts.hostname}"
    except Exception:
        return None
    try:
        el = select_first(doc, cfg.selector)
    except SelectorParseError:
        return None
    if el is None:
        return None
    src = _img_url_by_attribute(el, cfg.attribute_val)
    if src is None:
        return None
    from .urlclean import merge_host_and_url

    return merge_host_and_url(src, host)


def extract_information(
    doc: Element,
    selectors: Selectors,
    url: str,
    etag: Optional[str] = None,
    target_pattern: str = ISO_DATE_TIME_PATTERN,
    target_zone: str = "UTC",
) -> RawEntryInformation:
    """E1 (Analyzer.scala:222-282). Raises LookupError when title missing."""
    title = _first_text(doc, selectors.title)
    if title is None:
        raise LookupError(f"Unable to extract mandatory title from web page @ url '{url}'!")
    summary = _first_text(doc, selectors.summary) if selectors.summary else None
    content = extract_content(
        doc, selectors.content.selector, selectors.content.exclude_selectors
    )
    date = (
        extract_date(doc, selectors.date, target_pattern, target_zone)
        if selectors.date
        else None
    )
    tags: Optional[List[str]] = None
    if selectors.tags:
        ts = _all_texts(doc, selectors.tags)
        tags = list(ts) if ts else None
    image_url = (
        extract_image_url(doc, selectors.image, url) if selectors.image else None
    )
    return RawEntryInformation(
        title=title,
        summary=summary,
        content=content,
        date=date,
        tags=tags,
        etag=etag,
        image_url=image_url,
    )


def analyze(
    url: str,
    html: str,
    profile: ProfileConfig,
    etag: Optional[str] = None,
    target_pattern: str = ISO_DATE_TIME_PATTERN,
    target_zone: str = "UTC",
) -> AnalysisResult:
    """Full per-document analysis; never raises (row-level status instead).

    `target_pattern`/`target_zone` mirror the reference's configurable
    TARGET_DATE_TIME_PATTERN / TARGET_TIME_ZONE (Config.scala:61-62,
    defaults at :74-75)."""
    try:
        doc = parse(html)
        selectors, pt_name = get_selectors(url, doc, profile)
        if selectors is None:
            return AnalysisResult(
                status=STATUS_PROFILE_MISS,
                error=(
                    f"Unable to determine profile config for url '{url}' from "
                    f"config with hostname '{profile.hostname}'."
                ),
            )
        try:
            entry = extract_information(
                doc, selectors, url, etag, target_pattern, target_zone
            )
        except LookupError as exc:
            return AnalysisResult(
                status=STATUS_NO_TITLE, page_type=pt_name, error=str(exc)
            )
        return AnalysisResult(status=STATUS_OK, entry=entry, page_type=pt_name)
    except Exception as exc:  # defensive: row error, not task failure
        return AnalysisResult(status=STATUS_ERROR, error=f"{type(exc).__name__}: {exc}")
