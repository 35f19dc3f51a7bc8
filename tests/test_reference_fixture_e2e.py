"""End-to-end on the REFERENCE's own fixtures through the Spark pipeline.

The reference's test pages (BrowserHelper mini-page, the six
ContentExtractorHelper articles) are encoded as interleaved spans
documents, pushed through the full Spark extraction operator, and the
output spans are compared against the reference-pinned expectations
(AnalyzerSpec.scala:631-661) / the hand-pruned expected documents
(ContentExtractorHelper golden construction).
"""

import json
from pathlib import Path

import pytest

from content_extractor_spark.kernel.css import select_first
from content_extractor_spark.kernel.dom import parse
from content_extractor_spark.kernel.profiles import profile_from_dict
from content_extractor_spark.kernel.spans import html_to_spans
from content_extractor_spark.operators.extract import extract_entries

FIXDIR = Path(__file__).parent / "fixtures" / "content"
CASES = json.loads((FIXDIR / "cases.json").read_text(encoding="utf-8"))

BROWSER_PAGE = """
<!DOCTYPE html>
<head>
    <title id="title">Url page with all information available</title>
</head>
<body>
    <h1>This is an url page with all information available</h1>
    <h2 id="subtitle">... with a subtitle</h2>
    <span id="breadcrumb">Some bread crumbs</span>
    <span id="publishedAt">2021-06-03T13:37:00Z</span>
    <p id="summary">This is a summary</p>
    <p id="content">
      And with all the content.
      <img src="find/me/here" id="pic"/>
    </p>
    <p>
      Tags:
      <div class="tag">aTag</div>
      <div class="tag">bTag</div>
      <div class="tag">cTag</div>
      <div class="tag">dTag</div>
    </p>
</body>
"""


def _profiles():
    profs = {
        "www.coverified.info": profile_from_dict(
            {
                "profile": {
                    "hostname": "https://www.coverified.info",
                    "pageTypes": [
                        {
                            "name": "url",
                            "condition": {"path": "https://www.coverified.info/impressum"},
                            "selectors": {
                                "title": "#title",
                                "summary": "#summary",
                                "content": {"selector": "#content"},
                                "date": {
                                    "selector": "#publishedAt",
                                    "format": "yyyy-MM-dd'T'HH:mm:ssX",
                                },
                                "tags": ".tag",
                                "image": {"selector": "pic", "attributeVal": "src"},
                            },
                        }
                    ],
                }
            }
        )
    }
    for name, case in CASES.items():
        sel = {
            "title": "h1, h2, h3, b, p",  # the accordion cases have no h1
            "content": {
                "selector": case["content_selector"],
                "excludeSelectors": case["exclude_selectors"],
            },
        }
        profs[f"{name}.example"] = profile_from_dict(
            {
                "profile": {
                    "hostname": f"https://{name}.example",
                    "pageTypes": [{"name": "article", "selectors": sel}],
                }
            }
        )
    return profs


def _corpus_rows():
    rows = [
        {
            "doc_id": "browser-valid",
            "spans": html_to_spans(BROWSER_PAGE, chunks=3, media_refs=["s3://a/1"]),
            "host": "www.coverified.info",
            "url": "https://www.coverified.info/impressum/x",
            "url_id": "u-browser",
            "last_crawl": "1970-01-01T00:00:00Z",
            "etag": None,
        }
    ]
    for name, case in CASES.items():
        raw = (FIXDIR / case["raw_file"]).read_text(encoding="utf-8")
        rows.append(
            {
                "doc_id": name,
                "spans": html_to_spans(raw, chunks=4),
                "host": f"{name}.example",
                "url": f"https://{name}.example/article",
                "url_id": f"u-{name}",
                "last_crawl": "1970-01-01T00:00:00Z",
                "etag": None,
            }
        )
    return rows


def expected_content(case):
    src = case["expected_file"] or case["raw_file"]
    html = (FIXDIR / src).read_text(encoding="utf-8")
    return select_first(parse(html), case["content_selector"]).text()


def test_reference_fixtures_through_spark(spark):
    from content_extractor_spark.synth import DOCUMENTS_DDL

    df = spark.createDataFrame(_corpus_rows(), DOCUMENTS_DDL)
    out = {r["doc_id"]: r for r in extract_entries(df, _profiles()).collect()}

    # BrowserHelper golden (AnalyzerSpec.scala:631-661)
    b = out["browser-valid"]
    assert b["status"] == "ok"
    spans = [s.asDict() for s in b["spans"]]
    assert spans[0] == {
        "kind": "title", "text": "Url page with all information available",
        "media_ref": None, "offset": 0,
    }
    assert spans[1]["kind"] == "summary" and spans[1]["text"] == "This is a summary"
    assert spans[2]["kind"] == "content" and spans[2]["text"] == "And with all the content."
    assert spans[3]["kind"] == "date" and spans[3]["text"] == "2021-06-03T13:37:00Z"
    assert [s["text"] for s in spans if s["kind"] == "tag"] == [
        "aTag", "bTag", "cTag", "dTag",
    ]
    assert all(s["kind"] != "image" for s in spans)  # 'pic' tag matches nothing
    assert b["content_hash"] is not None
    assert b["n_media_spans"] == 1

    # the six boilerplate-strip cases: content span == reference golden
    for name, case in CASES.items():
        row = out[name]
        assert row["status"] == "ok", (name, row["error"])
        content_spans = [s for s in row["spans"] if s["kind"] == "content"]
        assert len(content_spans) == 1, name
        assert content_spans[0]["text"] == expected_content(case), name
