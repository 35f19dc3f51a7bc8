"""Port the reference's golden test fixtures into plain data files.

Reads the Scala test helpers of the reference repo (read-only at
/root/reference) and extracts the embedded HTML fixture strings into
``tests/fixtures/content/`` as data files, plus a ``cases.json``
manifest (content selector + exclude selectors per case).

Provenance (data fixtures, not code):
  - /root/reference/src/test/scala/info/coverified/extractor/analyzer/ContentExtractorHelper.scala:14-675
    (six ExtractorTestCase golden cases for content extraction)

Run once: python tools/extract_fixtures.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REF = Path("/root/reference/src/test/scala/info/coverified/extractor/analyzer")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "content"


def strip_margin(s: str) -> str:
    """Scala's stripMargin: drop everything up to and including a leading '|'."""
    lines = []
    for line in s.split("\n"):
        m = re.match(r"^\s*\|(.*)$", line, re.S)
        lines.append(m.group(1) if m else line)
    return "\n".join(lines)


def parse_cases(text: str):
    cases = {}
    # Split on each testCase val definition.
    starts = [
        (m.start(), m.group(1))
        for m in re.finditer(r"val (testCase\d+): ExtractorTestCase", text)
    ]
    starts.append((len(text), "_end"))
    for (pos, name), (nxt, _) in zip(starts, starts[1:]):
        chunk = text[pos:nxt]
        triples = re.findall(r'"""(.*?)"""', chunk, re.S)
        assert 1 <= len(triples) <= 2, (name, len(triples))
        raw = strip_margin(triples[0])
        expected = strip_margin(triples[1]) if len(triples) == 2 else None
        # tail after the last triple-quoted string: selector + excludes
        tail = chunk[chunk.rindex('"""') + 3 :]
        strs = re.findall(r'"((?:[^"\\]|\\.)*)"', tail)
        content_selector = strs[0]
        if re.search(r"\bNone\b", tail):
            excludes = None
        elif "List.empty" in tail:
            excludes = []
        else:
            excludes = strs[1:]
        cases[name] = {
            "content_selector": content_selector,
            "exclude_selectors": excludes,
            "raw_file": f"{name}_raw.html",
            "expected_file": f"{name}_expected.html" if expected else None,
        }
        (OUT / f"{name}_raw.html").write_text(raw, encoding="utf-8")
        if expected is not None:
            (OUT / f"{name}_expected.html").write_text(expected, encoding="utf-8")
    return cases


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    text = (REF / "ContentExtractorHelper.scala").read_text(encoding="utf-8")
    cases = parse_cases(text)
    (OUT / "cases.json").write_text(
        json.dumps(cases, indent=2, ensure_ascii=False), encoding="utf-8"
    )
    print(f"wrote {len(cases)} cases to {OUT}")
    for k, v in cases.items():
        print(" ", k, v["content_selector"], "excludes:", v["exclude_selectors"])


if __name__ == "__main__":
    main()
