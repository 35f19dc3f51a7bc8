"""DOM parsing, CSS selection, and jsoup-style text() unit tests."""

from content_extractor_spark.kernel.css import SelectorParseError, select, select_first
from content_extractor_spark.kernel.dom import parse

import pytest


def test_implicit_structure_and_ids():
    doc = parse("<head><title id='t'>Hi</title></head><body><p id='x'>y</p></body>")
    assert select_first(doc, "#t").text() == "Hi"
    assert select_first(doc, "#x").text() == "y"
    assert select_first(doc, "title").text() == "Hi"


def test_p_closed_by_div():
    # HTML5 tree construction: <div> closes an open <p> (jsoup does this too)
    doc = parse("<body><p>Tags: <div class='tag'>aTag</div><div class='tag'>bTag</div></p></body>")
    p = select_first(doc, "p")
    assert p.text() == "Tags:"
    tags = select(doc, ".tag")
    assert [t.text() for t in tags] == ["aTag", "bTag"]
    # the divs are siblings of p, not children
    assert all(t.parent.tag == "body" for t in tags)


def test_text_normalization_blocks_and_br():
    doc = parse("<div>One</div>Two<br>Three <b>bo</b>ld")
    assert select_first(doc, "body").text() == "One Two Three bold"


def test_text_collapses_whitespace_and_keeps_nbsp():
    doc = parse("<p>a\n\t  b&nbsp; c</p>")
    assert select_first(doc, "p").text() == "a b  c"


def test_text_drops_soft_hyphen_and_zwsp():
    doc = parse("<p>Vertriebenen­zahlen and a​b</p>")
    assert select_first(doc, "p").text() == "Vertriebenenzahlen and ab"


def test_script_and_style_excluded_from_text():
    doc = parse("<body><script>var x = '<p>no</p>';</script><style>p{}</style>ok</body>")
    assert select_first(doc, "body").text() == "ok"
    # but raw content is preserved for serialization / JSON-LD decode
    script = select_first(doc, "script")
    assert "var x" in script.inner_html()


def test_entity_decoding():
    doc = parse("<p title='a &amp; b'>x &lt; y &amp; z</p>")
    p = select_first(doc, "p")
    assert p.text() == "x < y & z"
    assert p.attr("title") == "a & b"


def test_outer_html_roundtrip():
    html = '<div class="a"><p>x <b>y</b></p><img src="u"></div>'
    doc = parse(html)
    div = select_first(doc, "div.a")
    reparsed = parse(div.outer_html())
    assert select_first(reparsed, "div.a").text() == div.text()
    assert select_first(reparsed, "img").attr("src") == "u"


def test_selector_compound_and_descendant():
    html = """
    <main id="main"><header class="c-heading">
      <div class="heading__breadcrumb"><span>crumb</span></div>
      <h1 class="is-aural">aural</h1>
    </header><section class="u-section"><p>sec</p></section></main>
    """
    doc = parse(html)
    assert select_first(doc, "main#main") is not None
    assert select_first(doc, "header .heading__breadcrumb").text() == "crumb"
    assert select_first(doc, "h1.is-aural").text() == "aural"
    assert select_first(doc, "section.u-section").text() == "sec"
    assert select_first(doc, "main > header") is not None
    assert select_first(doc, "header > span") is None


def test_selector_attribute():
    doc = parse('<script type="application/ld+json">{}</script><script>x</script>')
    els = select(doc, 'script[type="application/ld+json"]')
    assert len(els) == 1
    # case-insensitive attr value match (jsoup semantics)
    assert select_first(doc, 'script[TYPE="Application/LD+JSON"]') is not None


def test_attr_tilde_is_jsoup_regex_not_css_word_match():
    # jsoup [attr~=regex]: Evaluator.AttributeWithValueMatching runs
    # pattern.find() against the RAW attribute value (QueryParser "~=").
    # CSS's whitespace-word semantics would reject all three asserts.
    doc = parse(
        '<div id="art-123">a</div><div id="art-xyz">b</div>'
        '<div class="foobar baz">c</div>'
    )
    # anchored regex matches the whole id — a word-split would look for
    # the literal token '^art-\\d+$' and never match
    assert [e.attr("id") for e in select(doc, r"[id~=^art-\d+$]")] == ["art-123"]
    # unanchored find(): 'foo' matches inside the word 'foobar'
    # (CSS word match would require a standalone 'foo' token)
    assert select_first(doc, "[class~=foo]").text() == "c"
    # case-sensitive, unlike the [attr=value] comparisons
    assert select_first(doc, "[id~=ART]") is None
    # bad pattern fails loudly at parse time (jsoup compiles eagerly)
    with pytest.raises(SelectorParseError):
        select(doc, "[id~=(]")


def test_selector_multi_class_compound():
    doc = parse('<div class="mt-0 mt-md-5 pt-3 text-center container">x</div>')
    assert select_first(doc, "div.mt-0.mt-md-5.pt-3.text-center.container").text() == "x"


def test_selector_comma_group_and_order():
    doc = parse("<i>1</i><em>2</em><i>3</i>")
    assert [e.text() for e in select(doc, "i, em")] == ["1", "2", "3"]


def test_invalid_selector_raises():
    doc = parse("<p>x</p>")
    with pytest.raises(SelectorParseError):
        select(doc, "this won't work")


def test_stray_end_tag_creates_empty_p():
    doc = parse("<body><div>a</div></p></body>")
    assert len(select(doc, "p")) == 1


def test_custom_elements_are_inline():
    doc = parse("<p>a<pp-inline-teaser>T</pp-inline-teaser>b</p>")
    assert select_first(doc, "p").text() == "aTb"
    assert select_first(doc, "pp-inline-teaser").text() == "T"


def test_time_with_stray_div_close():
    # AnalyzerSpec fixture shape: <time ...>text</div> — the </div> is ignored
    doc = parse(
        "<html><body>Nothing here.<time id='date' datetime='X'>2021</div></body></html>"
    )
    el = select_first(doc, "#date")
    assert el.attr("datetime") == "X"
    assert el.text().startswith("2021")


def test_clone_equals_reparse():
    """Element.clone() must produce the same text()/outer_html() as the
    reference's serialize→re-parse step (Analyzer.scala:597)."""
    html = ("<div id='c' class='x'><p>a &amp; b</p><pre> keep  ws </pre>"
            "<script>raw < data</script><img src='u'><ul><li>1<li>2</ul></div>")
    doc = parse(html)
    el = select_first(doc, "#c")
    cloned = el.clone()
    reparsed = parse(el.outer_html())
    assert cloned.outer_html() == el.outer_html()
    assert cloned.text() == reparsed.text()
    # preserve recomputed: a clone out of a <pre> ancestor stops preserving
    pre_doc = parse("<pre><span>a  b</span></pre>")
    span = select_first(pre_doc, "span")
    assert span.text() == "a  b"          # inside pre: ws preserved
    assert span.clone().text() == "a b"   # cloned out: normalized


def test_clone_preserve_cascades_to_all_depths():
    """Regression: clone used to build grandchildren before appending
    the child, so preserve inheritance stopped at depth 1 and code-block
    markup (pre>span>b) lost its whitespace vs the re-parse reference."""
    doc = parse("<pre><span><b>a  b</b></span></pre>")
    pre = select_first(doc, "pre")
    assert pre.clone().text() == parse(pre.outer_html()).text() == "a  b"
    # cloned OUT of the pre: root is span -> collapse, like re-parse
    span = select_first(doc, "span")
    assert span.clone().text() == parse(span.outer_html()).text() == "a b"


def test_extract_content_deep_pre_descendant_matches_reparse():
    """Regression: the no-exclude fast path guarded on a 6-level
    ancestor walk, so elements >6 below a <pre> kept preserved
    whitespace where the reference outerHtml re-parse collapses it."""
    from content_extractor_spark.kernel.analyzer import extract_content

    html = ("<pre>" + "<span>" * 7 + "<em id='t'>a  b</em>"
            + "</span>" * 7 + "</pre>")
    doc = parse(html)
    want = parse(select_first(doc, "#t").outer_html()).text()
    assert extract_content(doc, "#t", None) == want == "a b"
    # and a pre-ish element selected directly keeps its whitespace
    assert extract_content(doc, "pre", None) == "a  b"


def test_select_after_append_sees_new_element():
    from content_extractor_spark.kernel.dom import Element

    doc = parse("<div><p>x</p></div>")
    assert len(select(doc, "p")) == 1  # builds + caches the index
    select_first(doc, "div").append(Element("p"))
    assert len(select(doc, "p")) == 2  # append invalidated the cache


def test_select_after_removal_uses_fresh_index():
    doc = parse("<div><p class='ad'>x</p><p class='ad'>y</p><p>z</p></div>")
    ads = select(doc, "p.ad")
    assert len(ads) == 2
    for el in ads:
        el.remove()
    assert select(doc, "p.ad") == []
    assert [e.text() for e in select(doc, "p")] == ["z"]
    assert select_first(doc, "p:first-child").text() == "z"


class TestPseudoSelectors:
    def test_has_and_not(self):
        doc = parse(
            "<div class='a'><p>x</p></div><div class='b'><span>y</span></div>"
        )
        assert [e.attr("class") for e in select(doc, "div:has(p)")] == ["a"]
        assert [e.attr("class") for e in select(doc, "div:not(.a)")] == ["b"]
        assert select_first(doc, "div:has(section)") is None

    def test_contains(self):
        doc = parse("<p>Hello World</p><p>other text</p>")
        els = select(doc, "p:contains(hello)")  # jsoup: case-insensitive
        assert len(els) == 1 and els[0].text() == "Hello World"

    def test_child_position(self):
        doc = parse("<ul><li>a</li><li>b</li><li>c</li></ul>")
        assert select_first(doc, "li:first-child").text() == "a"
        assert select_first(doc, "li:last-child").text() == "c"
        assert select_first(doc, "li:nth-child(2)").text() == "b"
        assert [e.text() for e in select(doc, "li:nth-child(odd)")] == ["a", "c"]

    def test_empty(self):
        doc = parse("<div class='e'></div><div class='f'>x</div>")
        assert [e.attr("class") for e in select(doc, "div:empty")] == ["e"]

    def test_empty_jsoup_semantics(self):
        # jsoup Evaluator.IsEmpty ignores ONLY comments — a
        # whitespace-only text node makes an element non-empty
        doc = parse(
            "<span><div class='w'> </div><div class='c'><!-- x --></div>"
            "<div class='e'></div></span>"
        )
        assert [e.attr("class") for e in select(doc, "div:empty")] == ["c", "e"]

    def test_contains_data_pseudo(self):
        # jsoup :containsData — case-insensitive over Element.data()
        # (script/style raw content + comments, never visible text)
        doc = parse(
            "<div class='a'><script>{\"@type\": \"NewsArticle\"}</script></div>"
            "<div class='b'><!-- newsarticle marker --></div>"
            "<div class='c'>NewsArticle as visible text</div>"
        )
        got = [e.attr("class") for e in select(doc, "div:containsData(newsarticle)")]
        assert got == ["a", "b"]

    def test_comment_roundtrip_and_no_text(self):
        doc = parse("<div>a<!-- hidden -->b</div>")
        el = select_first(doc, "div")
        assert el.text() == "ab"
        assert "<!-- hidden -->" in el.outer_html()
        assert el.data() == " hidden "

    def test_contains_own(self):
        # :containsOwn matches ownText() only — the parent <div> has
        # "hello" in text() but not in its own text
        doc = parse("<div><p>Hello there</p>tail</div>")
        assert [e.tag for e in select(doc, ":containsOwn(hello)")] == ["p"]
        assert [e.tag for e in select(doc, ":containsOwn(tail)")] == ["div"]

    def test_matches_regex(self):
        doc = parse("<p>Order #1234</p><p>no number here</p><p>x9</p>")
        els = select(doc, "p:matches(\\d{4})")
        assert len(els) == 1 and els[0].text() == "Order #1234"
        # case-sensitive (Java Pattern.find semantics)
        assert select_first(doc, "p:matches(ORDER)") is None
        assert select_first(doc, "p:matches(Order)") is not None

    def test_matches_own(self):
        doc = parse("<div><span>42</span>abc</div>")
        # div.text() contains 42, but ownText() doesn't
        assert [e.tag for e in select(doc, ":matchesOwn(\\d+)")] == ["span"]

    def test_matches_nested_group_regex(self):
        """Regression: the tokenizer's fixed-depth arg pattern rejected
        regexes with nested groups, silently turning profile conditions
        into profile_miss (jsoup chompBalanced allows any depth)."""
        doc = parse("<p>year 2021 here</p><p>none</p>")
        els = select(doc, "p:matches((?:(20)\\d\\d))")
        assert len(els) == 1 and "2021" in els[0].text()
        assert select_first(doc, "div:has(p:matches((?:x|(y))z))") is None

    def test_unbalanced_paren_fails_loud(self):
        doc = parse("<p>x</p>")
        with pytest.raises(SelectorParseError):
            select(doc, "p:matches((abc)")

    def test_contains_keeps_literal_quotes(self):
        """jsoup semantics: escaped quotes are literal text; only ONE
        balanced surrounding pair unwraps; an UNbalanced quote leaves
        the paren group open (chompBalanced quote state) and fails."""
        doc = parse("<p>rock 'til dawn</p><p>til dawn</p>")
        els = select(doc, "p:contains(\\'til dawn)")
        assert len(els) == 1 and "'til" in els[0].text()
        # one balanced pair still unwraps
        assert len(select(doc, "p:contains('til dawn')")) == 2
        # unbalanced quote = unbalanced marker (jsoup raises here too)
        with pytest.raises(SelectorParseError):
            select(doc, "p:contains('til dawn)")

    def test_contains_quoted_paren(self):
        """jsoup chompBalanced ignores parens inside quoted strings, so
        :contains(')') is parseable (ADVICE r2)."""
        doc = parse("<p>a ) b</p><p>plain</p>")
        els = select(doc, "p:contains(')')")
        assert len(els) == 1 and ")" in els[0].text()
        els = select(doc, 'p:contains("(x")')
        assert els == []

    def test_index_pseudos(self):
        """jsoup :eq/:gt/:lt — 0-based index among element siblings."""
        doc = parse("<ul><li>a</li><li>b</li><li>c</li><li>d</li></ul>")
        assert [e.text() for e in select(doc, "li:eq(1)")] == ["b"]
        assert [e.text() for e in select(doc, "li:gt(1)")] == ["c", "d"]
        assert [e.text() for e in select(doc, "li:lt(2)")] == ["a", "b"]
        # sibling index, NOT result-set index: filtering doesn't renumber
        doc2 = parse("<div><p>skip</p><span>x</span><span>y</span></div>")
        assert [e.text() for e in select(doc2, "span:eq(1)")] == ["x"]
        with pytest.raises(SelectorParseError):
            select(doc, "li:eq(x)")

    def test_of_type_pseudos(self):
        doc = parse(
            "<div><p>p1</p><span>s1</span><p>p2</p><span>s2</span>"
            "<em>only</em></div>"
        )
        assert [e.text() for e in select(doc, "p:first-of-type")] == ["p1"]
        assert [e.text() for e in select(doc, "p:last-of-type")] == ["p2"]
        assert [e.text() for e in select(doc, "div :only-of-type")] == ["only"]
        assert [e.text() for e in select(doc, "span:nth-of-type(2)")] == ["s2"]
        assert [e.text() for e in select(doc, "p:nth-last-of-type(1)")] == ["p2"]

    def test_nth_child_an_plus_b(self):
        doc = parse("<ul>" + "".join(f"<li>{i}</li>" for i in range(1, 9)) + "</ul>")
        assert [e.text() for e in select(doc, "li:nth-child(3n+1)")] == ["1", "4", "7"]
        assert [e.text() for e in select(doc, "li:nth-child(-n+3)")] == ["1", "2", "3"]
        assert [e.text() for e in select(doc, "li:nth-last-child(2)")] == ["7"]
        assert [e.text() for e in select(doc, "li:only-child")] == []
        with pytest.raises(SelectorParseError):
            select(doc, "li:nth-child(frog)")

    def test_root_pseudo(self):
        doc = parse("<html><body><p>x</p></body></html>")
        assert [e.tag for e in select(doc, ":root")] == ["html"]
        # selecting from a sub-element: that element is the root (jsoup
        # Evaluator.IsRoot on a non-Document root)
        body = select_first(doc, "body")
        assert [e.tag for e in select(body, ":root")] == ["body"]

    def test_matches_bad_regex_fails_loud(self):
        doc = parse("<p>x</p>")
        with pytest.raises(SelectorParseError):
            select(doc, "p:matches([unclosed)")

    def test_unsupported_pseudo_raises(self):
        doc = parse("<p>x</p>")
        with pytest.raises(SelectorParseError):
            select(doc, "p:hover")


def test_is_pseudo():
    """jsoup :is(a, b) — matches elements matching ANY listed selector."""
    doc = parse("<h1>t</h1><h2>s</h2><p class='x'>p</p><span>z</span>")
    got = [e.tag for e in select(doc, ":is(h1, h2, .x)")]
    assert got == ["h1", "h2", "p"]
    # composes with other pseudos and combinators
    assert [e.tag for e in select(doc, ":is(h1, h2):contains(s)")] == ["h2"]
    with pytest.raises(SelectorParseError):
        select(doc, ":is(")


import os


@pytest.mark.skipif(
    not os.path.exists(
        "/root/reference/src/test/resources/jsonLD/test.html"
    ),
    reason="reference tree not mounted",
)
def test_jsonld_reference_page_parity():
    """The REAL reference fixture page (JsonLDSpec.scala:22-75, a full
    bpb.de article) through our DOM + JSON-LD kernel must reproduce
    the Scala spec's expected JsonLD record field-for-field."""
    from content_extractor_spark.kernel.jsonld import from_document
    from content_extractor_spark.kernel.dom import parse

    html = open(
        "/root/reference/src/test/resources/jsonLD/test.html",
        encoding="utf-8",
    ).read()
    ld = from_document(parse(html))
    assert ld["@context"] == "http://schema.org"
    assert ld["@type"] == "Article"
    assert ld["author"] == "Christian Kuhlicke, Volker Meyer"
    assert ld["headline"] == "Nachhaltige Hochwasservorsorge | bpb"
    assert ld["datePublished"] == "2013-08-05T00:00:00+01:00"
    assert ld["dateCreated"] == "2013-08-05T12:13:20+01:00"
    assert ld["dateModified"] == "2013-08-05T00:00:00+01:00"
    assert ld["mainEntityOfPage"] == (
        "https://www.bpb.de/gesellschaft/umwelt/hochwasserschutz/166131/"
        "nachhaltige-hochwasservorsorge"
    )
    assert ld["keywords"] == (
        "Hochwasserschutz, Überschwemmungen, Umweltkatastrophe, "
        "Hochwasservorsorge"
    )
    pub = ld["publisher"]
    assert pub["name"] == "Bundeszentrale für politische Bildung"
    assert pub["logo"]["url"] == (
        "https://www.bpb.de/sites/all/themes/bpb/images/"
        "bpb_logo_ldjson.jpg"
    )
    assert (pub["logo"]["width"], pub["logo"]["height"]) == (144.0, 60.0)
    img = ld["image"]
    assert img["url"] == (
        "https://www.bpb.de/cache/images/6/166136-3x2-facebook.jpg?B0E01"
    )
    assert (img["width"], img["height"]) == (900.0, 600.0)
    assert ld["description"].startswith(
        "Hochwasserereignisse scheinen an Zahl"
    )


class TestXPathSubset:
    """XPath-subset selectors translate into the pinned CSS dialect
    (profiles are "CSS/XPath selector configs" — one matching engine,
    two syntaxes)."""

    def test_translations(self):
        from content_extractor_spark.kernel.xpath import xpath_to_css

        cases = [
            ("//div", "div"),
            ("/html/body/div", "html:root > body > div"),
            ("//div/p", "div > p"),
            ("//div//p", "div p"),
            ("//*[@id='x']", '*[id="x"]'),
            ("//a[@href]", "a[href]"),
            ("//li[3]", "li:nth-of-type(3)"),
            ("//li[last()]", "li:last-of-type"),
            ("//div[contains(@class,'x')]", 'div[class*="x"]'),
            (".//span", "span"),
            ("//a | //b", "a, b"),
        ]
        for xp, want in cases:
            assert xpath_to_css(xp) == want, xp

    def test_positional_after_filter_rejected(self):
        """XPath [n] counts among filtered nodes; CSS :nth-of-type
        counts among all same-tag siblings — //a[@href][2] would
        silently pick a different element when some siblings lack
        href, so the translator must refuse it loudly."""
        from content_extractor_spark.kernel.xpath import xpath_to_css

        for xp in ("//a[@href][2]", "//p[contains(@class,'x')][last()]",
                   "//div[@id='m'][1]"):
            with pytest.raises(SelectorParseError):
                xpath_to_css(xp)
        # positional FIRST (pure [n] step) stays supported — there the
        # two counting rules agree
        assert xpath_to_css("//li[3]") == "li:nth-of-type(3)"

    def test_select_with_xpath(self):
        doc = parse(
            "<html><body><div id='m'><ul><li>1</li><li>2</li><li>3</li>"
            "</ul><a href='u'>link</a><p class='xy'>t</p></div>"
            "</body></html>"
        )
        assert select_first(doc, "//li[3]").text() == "3"
        assert select_first(doc, "/html/body/div").attr("id") == "m"
        assert select_first(doc, "//a[@href]").text() == "link"
        assert select_first(doc, "//p[contains(@class,'x')]").text() == "t"
        assert [e.text() for e in select(doc, "//li[last()] | //a")] \
            == ["3", "link"]

    def test_out_of_subset_fails_loud(self):
        doc = parse("<div><p>x</p></div>")
        for bad in ("//div/text()", "//div/../p", "//descendant::p",
                    "//div[position()>1]"):
            with pytest.raises(SelectorParseError):
                select(doc, bad)

    def test_profile_with_xpath_selectors_extracts(self):
        from content_extractor_spark.kernel.analyzer import (
            STATUS_OK,
            analyze,
        )
        from content_extractor_spark.kernel.profiles import profile_from_dict

        profile = profile_from_dict({"profile": {
            "hostname": "x.example",
            "pageTypes": [{
                "name": "article",
                "condition": {"selector": "//div[@id='content-main']"},
                "selectors": {
                    "title": "//h1[contains(@class,'title')]",
                    "content": "//div[@id='content-main']",
                },
            }],
        }})
        html = ("<html><body><div id='content-main'>"
                "<h1 class='page-title'>T</h1><p>body text</p></div>"
                "</body></html>")
        out = analyze("https://x.example/p", html, profile)
        assert out.status == STATUS_OK
        assert out.entry.title == "T"
        assert "body text" in out.entry.content
