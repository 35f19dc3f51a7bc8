"""Analyzer-level goldens ported from the reference's AnalyzerSpec.

Fixtures: BrowserHelper.scala:15-118 mini-pages; profile = the
`validPageType` of AnalyzerSpec.scala:48-77; date-source ladder
AnalyzerSpec.scala:275-500; JSON-LD goldens JsonLDSpec.scala:19-137.
"""

import pytest

from content_extractor_spark.kernel import jsonld
from content_extractor_spark.kernel.analyzer import (
    STATUS_NO_TITLE,
    STATUS_OK,
    STATUS_PROFILE_MISS,
    analyze,
    extract_image_url,
    extract_information,
    get_date_time_string,
    get_date_time_string_from_element,
    get_selectors,
    path_matches,
    selector_matches,
)
from content_extractor_spark.kernel.dom import parse
from content_extractor_spark.kernel.profiles import (
    DateSelector,
    ImageSelector,
    ProfileConfig,
    profile_from_dict,
)

COVERIFIED_URL = "https://www.coverified.info"

VALID_URL_PAGE = """
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

PAGE_TITLE_ONLY = """
<!DOCTYPE html>

<head>
    <title id="title">Url page with all information available</title>
</head>

<body>
    <h1>This is an url page with all information available</h1>
</body>
"""

PAGE_NO_TITLE = """
<!DOCTYPE html>

<body>
    <h1>This is an url page with all information available</h1>
    <span id="publishedAt">2021-06-03T13:37:00Z</span>
    <p id="summary">This is a summary</p>
    <p id="content">And with all the content.</p>
</body>
"""


def valid_profile() -> ProfileConfig:
    # AnalyzerSpec.scala:48-77 validPageType
    return profile_from_dict(
        {
            "profile": {
                "hostname": COVERIFIED_URL,
                "pageTypes": [
                    {
                        "name": "url",
                        "condition": {"path": COVERIFIED_URL + "/impressum"},
                        "examples": ["a", "b"],
                        "selectors": {
                            "title": "#title",
                            "summary": "#summary",
                            "subtitle": "#subtitle",
                            "breadcrumb": "#breadcrumb",
                            "content": {"selector": "#content"},
                            "date": {
                                "tryJsonLdFirst": False,
                                "selector": "#publishedAt",
                                "format": "yyyy-MM-dd'T'HH:mm:ssX",
                                "defaultZoneId": "Europe/Berlin",
                            },
                            "image": {"selector": "pic", "attributeVal": "src"},
                            "tags": ".tag",
                            "video": "#vid",
                        },
                    }
                ],
            }
        }
    )


class TestConditions:
    def test_selector_no_match(self):
        prof = valid_profile()
        pt = prof.page_types[0]
        doc = parse(VALID_URL_PAGE)
        bad = type(pt)(
            name=pt.name, selectors=pt.selectors,
            condition_path=pt.condition_path, condition_selector="this won't work",
        )
        assert selector_matches(doc, bad) is False

    def test_selector_match(self):
        prof = valid_profile()
        pt = prof.page_types[0]
        doc = parse(VALID_URL_PAGE)
        good = type(pt)(
            name=pt.name, selectors=pt.selectors,
            condition_path=pt.condition_path, condition_selector="title",
        )
        assert selector_matches(doc, good) is True

    def test_selector_none_set(self):
        prof = valid_profile()
        pt = prof.page_types[0]
        doc = parse(VALID_URL_PAGE)
        none = type(pt)(
            name=pt.name, selectors=pt.selectors,
            condition_path=pt.condition_path, condition_selector=None,
        )
        assert selector_matches(doc, none) is True

    def test_path_mismatch(self):
        pt = valid_profile().page_types[0]
        bad = type(pt)(
            name=pt.name, selectors=pt.selectors,
            condition_path="https://wwww.ard.de", condition_selector=None,
        )
        assert path_matches(COVERIFIED_URL + "/impressum/subpage", bad) is False

    def test_path_match_and_unset(self):
        pt = valid_profile().page_types[0]
        assert path_matches(COVERIFIED_URL + "/impressum/subpage", pt) is True
        unset = type(pt)(
            name=pt.name, selectors=pt.selectors,
            condition_path=None, condition_selector=None,
        )
        assert path_matches(COVERIFIED_URL + "/impressum/subpage", unset) is True

    def test_get_selectors_first_match_wins(self):
        prof = valid_profile()
        doc = parse(VALID_URL_PAGE)
        sel, name = get_selectors(COVERIFIED_URL + "/impressum/subpage", doc, prof)
        assert sel is not None and name == "url"
        sel2, name2 = get_selectors("https://other.site/x", doc, prof)
        assert sel2 is None and name2 is None


class TestExtractInformation:
    def test_full_page_golden(self):
        # AnalyzerSpec.scala:631-661
        doc = parse(VALID_URL_PAGE)
        rei = extract_information(doc, valid_profile().page_types[0].selectors, "test.url")
        assert rei.title == "Url page with all information available"
        assert rei.summary == "This is a summary"
        assert rei.content == "And with all the content."
        assert rei.date == "2021-06-03T13:37:00Z"
        assert rei.tags == ["aTag", "bTag", "cTag", "dTag"]
        assert rei.etag is None
        assert rei.image_url is None  # 'pic' tag selector matches nothing; bad url host

    def test_optionals_absent(self):
        # AnalyzerSpec.scala:663-691
        doc = parse(PAGE_TITLE_ONLY)
        rei = extract_information(doc, valid_profile().page_types[0].selectors, "test.url")
        assert rei.title == "Url page with all information available"
        assert rei.summary is None
        assert rei.content is None
        assert rei.date is None
        assert rei.tags is None
        assert rei.image_url is None

    def test_missing_title_raises(self):
        # AnalyzerSpec.scala:606-629
        doc = parse(PAGE_NO_TITLE)
        with pytest.raises(LookupError):
            extract_information(doc, valid_profile().page_types[0].selectors, "test.url")


class TestAnalyze:
    def test_profile_miss(self):
        prof = valid_profile()
        res = analyze("https://other.site/x", VALID_URL_PAGE, prof)
        assert res.status == STATUS_PROFILE_MISS

    def test_ok(self):
        prof = valid_profile()
        res = analyze(COVERIFIED_URL + "/impressum/x", VALID_URL_PAGE, prof)
        assert res.status == STATUS_OK
        assert res.entry.title == "Url page with all information available"
        assert res.entry.content_hash() is not None

    def test_no_title(self):
        prof = valid_profile()
        res = analyze(COVERIFIED_URL + "/impressum/x", PAGE_NO_TITLE, prof)
        assert res.status == STATUS_NO_TITLE


FULL_DOC_WITH_LD = """
<html>
 <head>
   <script type="application/ld+json">
{
\t"@context":\t\t\t"http://schema.org",
\t"@type":\t\t\t"Article",
\t"datePublished":\t  "2021-07-20T23:20:00+01:00",
 "dateCreated":\t    "2021-07-20T23:15:00+01:00",
\t"dateModified":\t    "2021-07-20T23:10:00+01:00"
}
</script>
 </head>
 <body>
   Nothing interesting here.
   <time id="date" datetime="2021-07-20T23:05:00Z">2021-07-20T23:00:00Z</div>
 </body>
</html>
"""


class TestDateSourceLadder:
    # AnalyzerSpec.scala:275-500
    def _cfg(self, **kw):
        base = dict(
            selector="#date", format="yyyy-MM-dd'T'HH:mm:ssZ",
            pattern=None, attribute_val=None, try_json_ld_first=False,
            default_zone_id="Europe/Berlin",
        )
        base.update(kw)
        return DateSelector(**base)

    def test_content_when_no_attr_config(self):
        doc = parse(FULL_DOC_WITH_LD)
        assert (
            get_date_time_string_from_element(doc, self._cfg())
            == "2021-07-20T23:00:00Z"
        )

    def test_attr_preferred(self):
        doc = parse(FULL_DOC_WITH_LD)
        assert (
            get_date_time_string_from_element(doc, self._cfg(attribute_val="datetime"))
            == "2021-07-20T23:05:00Z"
        )

    def test_attr_missing_falls_back_to_content(self):
        doc = parse(FULL_DOC_WITH_LD)
        assert (
            get_date_time_string_from_element(doc, self._cfg(attribute_val="datetimer"))
            == "2021-07-20T23:00:00Z"
        )

    def test_jsonld_first_success(self):
        doc = parse(FULL_DOC_WITH_LD)
        s, fmt = get_date_time_string(
            doc, self._cfg(try_json_ld_first=True, attribute_val="datetime")
        )
        assert s == "2021-07-20T23:20:00+01:00"
        assert fmt == "yyyy-MM-dd'T'HH:mm:ssXXX"

    def test_jsonld_first_fallback_to_element(self):
        doc = parse("<html><body><time id='date' datetime='2021-07-20T23:05:00Z'>x</time></body></html>")
        s, fmt = get_date_time_string(
            doc, self._cfg(try_json_ld_first=True, attribute_val="datetime")
        )
        assert s == "2021-07-20T23:05:00Z"
        assert fmt == "yyyy-MM-dd'T'HH:mm:ssZ"

    def test_all_fallbacks_fail(self):
        doc = parse(FULL_DOC_WITH_LD)
        with pytest.raises(LookupError):
            get_date_time_string(doc, self._cfg(selector="some_wrong_selector"))


class TestImageSrcset:
    def test_srcset_last_candidate_first_token(self):
        # ContentExtractorHelper testCase0 <picture> block (FIXTURES.md §4.5)
        html = """
        <picture class="c-picture--heading is-full-width">
          <source srcset="/image/a.jpg 345w, /image/b.jpg 465w, /image/c.jpg 728w, /image/2423030/123x55/1230/550/18c6e022aea5c4d0b2478c0f7b8824a3/VB/fluechtlingslager-kutupalong-bild.jpg 1230w " sizes="x">
        </picture>
        """
        doc = parse(html)
        cfg = ImageSelector(selector=".c-picture--heading source", attribute_val="srcset")
        got = extract_image_url(doc, cfg, "https://www.auswaertiges-amt.de/de/x")
        assert got == (
            "https://www.auswaertiges-amt.de/image/2423030/123x55/1230/550/"
            "18c6e022aea5c4d0b2478c0f7b8824a3/VB/fluechtlingslager-kutupalong-bild.jpg"
        )

    def test_plain_src(self):
        doc = parse('<img class="hero" src="/a/b.jpg">')
        cfg = ImageSelector(selector="img.hero", attribute_val="src")
        assert extract_image_url(doc, cfg, "https://x.de/page") == "https://x.de/a/b.jpg"

    def test_bad_entry_url(self):
        doc = parse('<img class="hero" src="/a/b.jpg">')
        cfg = ImageSelector(selector="img.hero", attribute_val="src")
        assert extract_image_url(doc, cfg, "test.url") is None


VALID_JSONLD = """
   {
            "@context":\t\t\t"http://schema.org",
            "@type":\t\t\t"Article",
            "author":\t\t\t"Christian Kuhlicke, Volker Meyer",
            "headline":\t\t\t"Nachhaltige Hochwasservorsorge | bpb",
            "datePublished":\t"2013-08-05T00:00:00+01:00",
            "dateCreated":\t    "2013-08-05T12:13:20+01:00",
            "dateModified":\t    "2013-08-05T00:00:00+01:00",
            "mainEntityOfPage":\t"https:\\/\\/www.bpb.de\\/gesellschaft\\/umwelt\\/hochwasserschutz\\/166131\\/nachhaltige-hochwasservorsorge",
            "description":      "desc",
            "keywords":         "Hochwasserschutz, \\u00dcberschwemmungen, Umweltkatastrophe, Hochwasservorsorge",
            "publisher": {
                "@type":\t"Organization",
                "name":\t\t"Bundeszentrale f\\u00fcr politische Bildung",
                "logo": {
                    "@type":\t"ImageObject",
                    "url":\t\t"https:\\/\\/www.bpb.de\\/sites\\/all\\/themes\\/bpb\\/images\\/bpb_logo_ldjson.jpg",
                    "width":\t"144",
                    "height":\t"60"
                }
            }
        ,"image" : {
            "@type":\t"ImageObject",
            "url":\t\t"https:\\/\\/www.bpb.de\\/cache\\/images\\/6\\/166136-3x2-facebook.jpg?B0E01",
            "width":\t"900",
            "height":\t"600"    }
        }
"""


class TestJsonLD:
    # JsonLDSpec.scala:79-137 — decode + accessors
    def test_decode_golden(self):
        ld = jsonld.decode(VALID_JSONLD)
        assert ld["@context"] == "http://schema.org"
        assert ld["@type"] == "Article"
        assert ld["author"] == "Christian Kuhlicke, Volker Meyer"
        assert ld["datePublished"] == "2013-08-05T00:00:00+01:00"
        assert ld["dateCreated"] == "2013-08-05T12:13:20+01:00"
        assert ld["dateModified"] == "2013-08-05T00:00:00+01:00"
        assert ld["publisher"]["name"] == "Bundeszentrale für politische Bildung"
        # numeric strings coerce to floats (circe behavior)
        assert ld["publisher"]["logo"]["width"] == 144.0
        assert ld["image"]["height"] == 600.0
        assert ld["keywords"].startswith("Hochwasserschutz, Überschwemmungen")

    def test_first_script_only(self):
        # JsonLD.scala:42-50 — only the FIRST ld+json script is read
        html = f"""
        <html><head>
        <script type="application/ld+json">{VALID_JSONLD}</script>
        <script type="application/ld+json">{{"datePublished": "1999-01-01T00:00:00Z"}}</script>
        </head><body>x</body></html>
        """
        assert jsonld.publish_date(parse(html)) == "2013-08-05T00:00:00+01:00"

    def test_missing_jsonld_raises(self):
        with pytest.raises(LookupError):
            jsonld.from_document(parse("<html><body>x</body></html>"))

    def test_missing_publish_date_raises(self):
        html = '<script type="application/ld+json">{"@type":"Article"}</script>'
        with pytest.raises(LookupError):
            jsonld.publish_date(parse(html))
