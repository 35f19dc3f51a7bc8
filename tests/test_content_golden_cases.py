"""The six boilerplate-strip golden cases from the reference.

Ported from ContentExtractorHelper.scala:14-714 via
tools/extract_fixtures.py. Expected content is constructed exactly the
way the reference's test helper constructs it
(ContentExtractorHelper.scala:685-712): the normalized text of a
hand-pruned expected document (testCase0-3) or of the raw document
itself (testCase4/5, where no excludes apply), under the same
text-normalization function the extractor uses. This pins the CSS
selection + exclude-removal + prefix-strip-quirk logic end to end.
"""

import json
from pathlib import Path

import pytest

from content_extractor_spark.kernel.analyzer import extract_content
from content_extractor_spark.kernel.css import select_first
from content_extractor_spark.kernel.dom import parse

FIXDIR = Path(__file__).parent / "fixtures" / "content"
CASES = json.loads((FIXDIR / "cases.json").read_text(encoding="utf-8"))


def expected_for(case: dict) -> str:
    src = case["expected_file"] or case["raw_file"]
    html = (FIXDIR / src).read_text(encoding="utf-8")
    el = select_first(parse(html), case["content_selector"])
    assert el is not None, f"content selector missed in expected doc for {src}"
    return el.text()


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_case(name):
    case = CASES[name]
    raw = (FIXDIR / case["raw_file"]).read_text(encoding="utf-8")
    got = extract_content(parse(raw), case["content_selector"], case["exclude_selectors"])
    assert got is not None, "content extraction was meant to succeed"
    want = expected_for(case)
    assert got == want


def test_testcase2_prefix_strip_equivalent_to_testcase1():
    """testCase2's excludes carry the full content-selector prefix; after the
    prefix-strip quirk (Analyzer.scala:600-604) they behave like testCase1's."""
    c1, c2 = CASES["testCase1"], CASES["testCase2"]
    raw1 = (FIXDIR / c1["raw_file"]).read_text(encoding="utf-8")
    raw2 = (FIXDIR / c2["raw_file"]).read_text(encoding="utf-8")
    out1 = extract_content(parse(raw1), c1["content_selector"], c1["exclude_selectors"])
    out2 = extract_content(parse(raw2), c2["content_selector"], c2["exclude_selectors"])
    assert out1 == out2


def test_no_excludes_and_empty_excludes_identical():
    c4, c5 = CASES["testCase4"], CASES["testCase5"]
    raw4 = (FIXDIR / c4["raw_file"]).read_text(encoding="utf-8")
    raw5 = (FIXDIR / c5["raw_file"]).read_text(encoding="utf-8")
    out4 = extract_content(parse(raw4), c4["content_selector"], None)
    out5 = extract_content(parse(raw5), c5["content_selector"], [])
    assert out4 == out5
    assert out4  # non-empty
