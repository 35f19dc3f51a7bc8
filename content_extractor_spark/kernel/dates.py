"""Java ``DateTimeFormatter`` pattern subset interpreter.

The reference parses scraped date strings with Java patterns from the
page profiles and reformats them to
``yyyy-MM-dd'T'HH:mm:ssXXX`` @ UTC
(``/root/reference/src/main/scala/info/coverified/extractor/analyzer/Analyzer.scala:545-576``):

  * if the pattern contains a time field (HOUR_OF_DAY & friends), the
    embedded zone/offset is used when present, else the profile's
    ``defaultZoneId`` fallback;
  * date-only strings are taken at start-of-day in the fallback zone;
  * the result is converted ``withZoneSameInstant`` to UTC and formatted
    with the target pattern (XXX renders +00:00 as ``Z``).

Supports the pattern letters seen in profiles and tests:
y/u, M, L, d, H, h, K, k, m, s, S, a, X, x, Z, quoted literals and
plain literal chars. Unsupported letters raise ``ValueError`` (the
analyzer surfaces that as a row-level date failure, never a crash).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from functools import lru_cache
from typing import List, Optional, Tuple
from zoneinfo import ZoneInfo

__all__ = ["reformat_datetime", "parse_java_pattern", "format_java_pattern"]

_TIME_LETTERS = set("HhKk")


@lru_cache(maxsize=512)
def _tokenize(pattern: str) -> Tuple[Tuple[str, str], ...]:
    """-> ((kind, value), ...) where kind is 'field' (letter run) or 'lit'.

    Cached: a job uses a handful of distinct patterns but parses/
    formats per document — tokenizing each pattern once removes the
    per-row pattern walk from the extraction hot path (guide §4.5:
    heavyweight init once, amortised over rows)."""
    tokens: List[Tuple[str, str]] = []
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "'":
            # quoted literal; '' inside quotes is a single quote
            j = i + 1
            buf = []
            while j < n:
                if pattern[j] == "'":
                    if j + 1 < n and pattern[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(pattern[j])
                j += 1
            if j >= n:
                raise ValueError(f"unterminated quote in pattern '{pattern}'")
            if not buf and j == i + 1:
                tokens.append(("lit", "'"))
            else:
                tokens.append(("lit", "".join(buf)))
            i = j + 1
        elif c.isalpha():
            j = i
            while j < n and pattern[j] == c:
                j += 1
            tokens.append(("field", pattern[i:j]))
            i = j
        else:
            tokens.append(("lit", c))
            i += 1
    return tuple(tokens)


_FIELD_REGEX = {
    "y": r"(?P<year>\d{1,9})",
    "u": r"(?P<year>-?\d{1,9})",
    "M": None,  # depends on count
    "L": None,
    "d": r"(?P<day>\d{1,2})",
    "H": r"(?P<hour>\d{1,2})",
    "k": r"(?P<hour>\d{1,2})",
    "h": r"(?P<hour12>\d{1,2})",
    "K": r"(?P<hour12>\d{1,2})",
    "m": r"(?P<minute>\d{1,2})",
    "s": r"(?P<second>\d{1,2})",
    "S": r"(?P<fraction>\d{1,9})",
    "a": r"(?P<ampm>[AaPp]\.?[Mm]\.?)",
}

_MONTH_NAMES = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
    # German month abbreviations/names (profiles target German sites)
    "januar": 1, "februar": 2, "märz": 3, "mär": 3, "april": 4, "mai": 5,
    "juni": 6, "juli": 7, "august": 8, "september": 9, "oktober": 10,
    "november": 11, "dezember": 12, "okt": 10, "dez": 12,
}


def _field_to_regex(run: str) -> str:
    letter = run[0]
    count = len(run)
    if letter in ("y", "u"):
        if count == 2:
            return r"(?P<year2>\d{2})"
        return _FIELD_REGEX[letter]
    if letter in ("M", "L"):
        if count <= 2:
            return r"(?P<month>\d{1,2})"
        return r"(?P<monthname>[A-Za-zÄäÖöÜüß]+\.?)"
    if letter == "E":  # day-of-week name: parsed but ignored
        return r"(?:[A-Za-zÄäÖöÜüß]+\.?,?)"
    if letter in ("X", "x"):
        z = r"Z|" if letter == "X" else ""
        return rf"(?P<offset>{z}[+-]\d{{2}}(?::?\d{{2}})?(?::?\d{{2}})?)"
    if letter == "Z":
        # Java Z parses +HHMM; accept 'Z' and colon forms leniently
        return r"(?P<offset>Z|[+-]\d{2}:?\d{2})"
    if letter == "z":
        return r"(?P<zonename>[A-Za-z_/]+)"
    if letter in _FIELD_REGEX and _FIELD_REGEX[letter] is not None:
        return _FIELD_REGEX[letter]
    raise ValueError(f"unsupported pattern letter '{letter}'")


@lru_cache(maxsize=512)
def _compile_java_pattern(pattern: str):
    """Java date pattern -> (compiled regex, has_time). Cached: the
    regex build is pure in the pattern and runs per document otherwise."""
    regex_parts: List[str] = []
    has_time = False
    for kind, val in _tokenize(pattern):
        if kind == "lit":
            regex_parts.append(re.escape(val))
        else:
            if val[0] in _TIME_LETTERS:
                has_time = True
            regex_parts.append(_field_to_regex(val))
    return re.compile("".join(regex_parts) + r"\s*$"), has_time


def parse_java_pattern(value: str, pattern: str):
    """Parse `value` with a Java date pattern.

    Returns (datetime_fields_dict, has_time, offset_or_zone) where
    offset_or_zone is a tzinfo or None.
    """
    rx, has_time = _compile_java_pattern(pattern)
    m = rx.match(value.strip())
    if m is None:
        raise ValueError(
            f"Text '{value}' could not be parsed with pattern '{pattern}'"
        )
    g = m.groupdict()
    year = None
    if g.get("year") is not None:
        year = int(g["year"])
    elif g.get("year2") is not None:
        year = 2000 + int(g["year2"])
    month = None
    if g.get("month") is not None:
        month = int(g["month"])
    elif g.get("monthname"):
        key = g["monthname"].rstrip(".").lower()
        month = _MONTH_NAMES.get(key) or _MONTH_NAMES.get(key[:3])
        if month is None:
            raise ValueError(f"unknown month name '{g['monthname']}'")
    day = int(g["day"]) if g.get("day") is not None else None
    hour = int(g["hour"]) if g.get("hour") is not None else 0
    if g.get("hour12") is not None:
        h12 = int(g["hour12"]) % 12
        ampm = (g.get("ampm") or "am").lower().replace(".", "")
        hour = h12 + (12 if ampm.startswith("p") else 0)
    minute = int(g["minute"]) if g.get("minute") is not None else 0
    second = int(g["second"]) if g.get("second") is not None else 0
    micro = 0
    if g.get("fraction"):
        frac = g["fraction"][:6].ljust(6, "0")
        micro = int(frac)
    tz = None
    off = g.get("offset")
    if off:
        tz = _parse_offset(off)
    elif g.get("zonename"):
        name = g["zonename"]
        if name in ("Z", "UTC", "GMT"):
            tz = timezone.utc
        else:
            try:
                tz = ZoneInfo(name)
            except Exception:
                raise ValueError(f"unknown zone '{name}'")
    fields = dict(
        year=year, month=month, day=day,
        hour=hour, minute=minute, second=second, microsecond=micro,
    )
    return fields, has_time, tz


def _parse_offset(off: str) -> timezone:
    if off == "Z":
        return timezone.utc
    sign = 1 if off[0] == "+" else -1
    rest = off[1:].replace(":", "")
    hh = int(rest[0:2])
    mm = int(rest[2:4]) if len(rest) >= 4 else 0
    ss = int(rest[4:6]) if len(rest) >= 6 else 0
    return timezone(sign * timedelta(hours=hh, minutes=mm, seconds=ss))


def format_java_pattern(dt: datetime, pattern: str) -> str:
    """Format an aware datetime with a Java pattern subset."""
    out: List[str] = []
    for kind, val in _tokenize(pattern):
        if kind == "lit":
            out.append(val)
            continue
        letter, count = val[0], len(val)
        if letter in ("y", "u"):
            out.append(str(dt.year).zfill(4 if count >= 4 else count)
                       if count != 2 else f"{dt.year % 100:02d}")
        elif letter in ("M", "L"):
            out.append(f"{dt.month:0{min(count,2)}d}")
        elif letter == "d":
            out.append(f"{dt.day:0{min(count,2)}d}")
        elif letter == "H":
            out.append(f"{dt.hour:0{min(count,2)}d}")
        elif letter == "m":
            out.append(f"{dt.minute:0{min(count,2)}d}")
        elif letter == "s":
            out.append(f"{dt.second:0{min(count,2)}d}")
        elif letter in ("X", "x", "Z"):
            out.append(_format_offset(dt, letter, count))
        else:
            raise ValueError(f"unsupported output pattern letter '{letter}'")
    return "".join(out)


def _format_offset(dt: datetime, letter: str, count: int) -> str:
    off = dt.utcoffset()
    if off is None:
        raise ValueError("naive datetime has no offset")
    total = int(off.total_seconds())
    if total == 0 and letter == "X":
        return "Z"
    sign = "+" if total >= 0 else "-"
    total = abs(total)
    hh, rem = divmod(total, 3600)
    mm = rem // 60
    if letter == "Z":
        return f"{sign}{hh:02d}{mm:02d}"
    if count == 1:  # X / x: hour, plus minutes only when non-zero
        return f"{sign}{hh:02d}" if mm == 0 else f"{sign}{hh:02d}{mm:02d}"
    if count == 2:
        return f"{sign}{hh:02d}{mm:02d}"
    return f"{sign}{hh:02d}:{mm:02d}"


def reformat_datetime(
    date_time_string: str,
    date_time_format: str,
    fallback_zone: str = "Europe/Berlin",
    target_pattern: str = "yyyy-MM-dd'T'HH:mm:ssXXX",
    target_zone: str = "UTC",
) -> str:
    """Analyzer.reformatDateTimePattern: parse, zone-resolve, convert, format.

    Raises ValueError on any parse failure (callers turn this into a
    row-level "leave date out" decision, Analyzer.scala:333-343).
    """
    fields, has_time, tz = parse_java_pattern(date_time_string, date_time_format)
    if fields["year"] is None or fields["month"] is None or fields["day"] is None:
        raise ValueError(
            f"incomplete date in '{date_time_string}' ({date_time_format})"
        )
    fb = ZoneInfo(fallback_zone)
    if has_time:
        zone = tz if tz is not None else fb
        dt = datetime(
            fields["year"], fields["month"], fields["day"],
            fields["hour"], fields["minute"], fields["second"],
            fields["microsecond"], tzinfo=zone,
        )
    else:
        dt = datetime(fields["year"], fields["month"], fields["day"], tzinfo=fb)
    tgt = timezone.utc if target_zone in ("UTC", "Z") else ZoneInfo(target_zone)
    return format_java_pattern(dt.astimezone(tgt), target_pattern)
