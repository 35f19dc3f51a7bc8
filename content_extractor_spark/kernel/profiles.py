"""Page-profile model + loaders.

Mirrors the reference's ProfileConfig schema
(``/root/reference/src/main/scala/info/coverified/extractor/profile/ProfileConfig.scala``;
HOCON template ``src/main/resources/domains.template.conf:1-52``):
a profile per hostname, with an ordered list of page types, each with
an optional (path, selector) condition and the selector set for
title/summary/content/date/image/tags/...

Profiles are loaded once on the Spark driver and broadcast to
executors (the reference likewise loads all profile files once,
``ExtractionSupervisor.scala:447-461``). Profiles are plain dicts so
they pickle cheaply into broadcasts; dataclass wrappers provide typed
access inside the kernel.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

DEFAULT_DATE_FORMAT = "yyyy-MM-dd'T'HH:mm:ssXXX"
DEFAULT_ZONE = "Europe/Berlin"


@dataclass(frozen=True)
class DateSelector:
    selector: str
    format: str = DEFAULT_DATE_FORMAT
    pattern: Optional[str] = None
    attribute_val: Optional[str] = None
    try_json_ld_first: bool = False
    default_zone_id: str = DEFAULT_ZONE


@dataclass(frozen=True)
class ImageSelector:
    selector: str
    attribute_val: str


@dataclass(frozen=True)
class ContentSelector:
    selector: str
    exclude_selectors: Optional[List[str]] = None


@dataclass(frozen=True)
class Selectors:
    title: str
    summary: Optional[str] = None
    subtitle: Optional[str] = None
    breadcrumb: Optional[str] = None
    audio: Optional[str] = None
    video: Optional[str] = None
    tags: Optional[str] = None
    content: ContentSelector = field(default_factory=lambda: ContentSelector("body"))
    date: Optional[DateSelector] = None
    image: Optional[ImageSelector] = None


@dataclass(frozen=True)
class PageType:
    name: str
    selectors: Selectors
    condition_path: Optional[str] = None
    condition_selector: Optional[str] = None
    examples: tuple = ()


@dataclass(frozen=True)
class ProfileConfig:
    hostname: str
    page_types: tuple  # tuple[PageType, ...] — ordered, first match wins


def profile_from_dict(d: dict) -> ProfileConfig:
    prof = d.get("profile", d)
    page_types = []
    for pt in prof.get("pageTypes", []):
        sel = pt.get("selectors", {})
        content = sel.get("content", {})
        if isinstance(content, str):
            content = {"selector": content}
        date = sel.get("date")
        date_sel = None
        if date:
            date_sel = DateSelector(
                selector=date.get("selector", ""),
                format=date.get("format", DEFAULT_DATE_FORMAT),
                pattern=date.get("pattern"),
                attribute_val=date.get("attributeVal"),
                try_json_ld_first=bool(date.get("tryJsonLdFirst", False)),
                default_zone_id=date.get("defaultZoneId", DEFAULT_ZONE),
            )
        image = sel.get("image")
        image_sel = None
        if image:
            image_sel = ImageSelector(
                selector=image.get("selector", ""),
                attribute_val=image.get("attributeVal", "src"),
            )
        excl = content.get("excludeSelectors")
        cond = pt.get("condition", {})
        page_types.append(
            PageType(
                name=pt.get("name", "url"),
                condition_path=cond.get("path"),
                condition_selector=cond.get("selector"),
                examples=tuple(pt.get("examples", [])),
                selectors=Selectors(
                    title=sel["title"],
                    summary=sel.get("summary"),
                    subtitle=sel.get("subtitle"),
                    breadcrumb=sel.get("breadcrumb"),
                    audio=sel.get("audio"),
                    video=sel.get("video"),
                    tags=sel.get("tags"),
                    content=ContentSelector(
                        selector=content.get("selector", "body"),
                        exclude_selectors=list(excl) if excl is not None else None,
                    ),
                    date=date_sel,
                    image=image_sel,
                ),
            )
        )
    return ProfileConfig(
        hostname=prof.get("hostname", ""), page_types=tuple(page_types)
    )


def load_profile_json(path: str) -> ProfileConfig:
    return profile_from_dict(json.loads(Path(path).read_text(encoding="utf-8")))


# -- minimal HOCON reader (enough for domains.template.conf-shaped files) ----

_HOCON_KV = re.compile(r"^\s*([A-Za-z0-9_.\-]+)\s*[:=]?\s*(.*)$")


def _hocon_to_json_text(text: str) -> str:
    """Convert the profile-config HOCON subset to JSON.

    Handles: unquoted keys, `=` separators, comments (# //), trailing
    commas, implicit commas via newlines, nested objects/arrays.
    Not a general HOCON parser — just the shapes used by page profiles.
    """
    out: List[str] = []
    i, n = 0, len(text)
    in_str = False
    prev_significant = ""
    while i < n:
        c = text[i]
        if in_str:
            out.append(c)
            if c == '"' and text[i - 1] != "\\":
                in_str = False
                prev_significant = '"'
            i += 1
            continue
        if c == '"':
            in_str = True
            if prev_significant not in ("", "{", "[", ",", ":"):
                out.append(",")
            out.append(c)
            prev_significant = '"'
            i += 1
            continue
        if c == "#" or text[i : i + 2] == "//":
            while i < n and text[i] != "\n":
                i += 1
            continue
        if c == "\n":
            out.append("\n")
            i += 1
            continue
        if c == "=":
            out.append(":")
            prev_significant = ":"
            i += 1
            continue
        if c in "{[":
            if prev_significant in ('"', "}", "]") or _is_word(prev_significant):
                # `key {` object syntax, or implicit comma between items
                if prev_significant in ("}", "]", '"') and _last_key_sep(out) != ":":
                    out.append(",")
                elif _is_word(prev_significant) or prev_significant == '"':
                    if _last_key_sep(out) != ":":
                        out.append(":")
            out.append(c)
            prev_significant = c
            i += 1
            continue
        if c in "}],:":
            out.append(c)
            prev_significant = c
            i += 1
            continue
        if c.isspace():
            out.append(c)
            i += 1
            continue
        # bare word (key or unquoted scalar)
        j = i
        while j < n and not text[j].isspace() and text[j] not in '{}[]=:,"#':
            j += 1
        word = text[i:j]
        if prev_significant in ('"', "}", "]") or _is_word(prev_significant):
            out.append(",")
        if word in ("true", "false", "null") or _is_number(word):
            out.append(word)
        else:
            out.append(json.dumps(word))
        prev_significant = word[-1]
        i = j
    return "".join(out)


def _is_word(ch: str) -> bool:
    return bool(ch) and (ch.isalnum() or ch in "_.-")


def _is_number(w: str) -> bool:
    try:
        float(w)
        return True
    except ValueError:
        return False


def _last_key_sep(out: List[str]) -> str:
    for ch in reversed(out):
        if not ch.isspace():
            return ch
    return ""


class UnsupportedHoconError(ValueError):
    """The profile uses HOCON features beyond the supported subset."""


_HOCON_UNSUPPORTED = re.compile(
    r"""(?mx)
      ^\s*include[\s("]        # file inclusion
    | \$\{[^}]*\}              # ${substitution} (incl. ?optional)
    """
)


def load_profile_hocon(path: str) -> ProfileConfig:
    text = Path(path).read_text(encoding="utf-8")
    # typesafe-config `include` and ${substitution} are legal in files
    # the reference loads (ProfileConfig.scala:342-355) but outside this
    # parser's subset — fail LOUDLY instead of regex-mangling silently
    m = _HOCON_UNSUPPORTED.search(text)
    if m:
        raise UnsupportedHoconError(
            f"{path}: HOCON feature {m.group(0).strip()!r} is not "
            "supported by the subset parser (no `include`, no "
            "${substitution}); inline the values or convert the "
            "profile to JSON"
        )
    # normalize newline-separated members to JSON commas
    jsonish = _hocon_to_json_text(text)
    jsonish = re.sub(r'"\s*\n\s*"', '",\n"', jsonish)
    jsonish = re.sub(r'([}\]"]|true|false|\d)\s*\n\s*(")', r"\1,\n\2", jsonish)
    jsonish = re.sub(r",\s*([}\]])", r"\1", jsonish)  # trailing commas
    data = json.loads("{" + jsonish + "}") if not jsonish.lstrip().startswith("{") else json.loads(jsonish)
    return profile_from_dict(data)


def load_profiles(directory: str) -> Dict[str, ProfileConfig]:
    """Load all *.json / *.conf profiles → {hostname: ProfileConfig}.

    Host matching follows ExtractionSupervisor.scala:362-369: a source
    matches a profile when the profile's hostname is contained in the
    source URL (protocol defaulted to https).
    """
    profiles: Dict[str, ProfileConfig] = {}
    for p in sorted(Path(directory).glob("*")):
        if p.suffix == ".json":
            cfg = load_profile_json(str(p))
        elif p.suffix == ".conf":
            cfg = load_profile_hocon(str(p))
        else:
            continue
        profiles[normalize_host(cfg.hostname)] = cfg
    return profiles


def normalize_host(hostname: str) -> str:
    """Strip protocol/trailing slash so hosts join consistently."""
    h = hostname.strip().lower()
    h = re.sub(r"^[a-z][a-z0-9+.-]*://", "", h)
    return h.strip("/").split("/")[0]
