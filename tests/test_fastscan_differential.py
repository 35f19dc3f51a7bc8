"""Differential test: fast regex scanner vs html.parser tree building.

Both engines drive the same tree builder; on the reference fixtures
and on fuzzed markup they must produce identical serialized trees and
identical normalized text.
"""

import json
import string
from pathlib import Path

from hypothesis import given, settings, strategies as st

from content_extractor_spark.kernel.dom import parse

FIXDIR = Path(__file__).parent / "fixtures" / "content"
CASES = json.loads((FIXDIR / "cases.json").read_text(encoding="utf-8"))


def _both(html):
    return parse(html, engine="fast"), parse(html, engine="stdlib")


def test_reference_fixtures_identical():
    for name, case in CASES.items():
        raw = (FIXDIR / case["raw_file"]).read_text(encoding="utf-8")
        fast, std = _both(raw)
        assert fast.outer_html() == std.outer_html(), name
        assert fast.text() == std.text(), name


def test_basic_constructs_identical():
    samples = [
        "<p>a<br>b</p>",
        "<div class='x' id=y data-z>t</div>",
        '<img src="u"/><hr/>',
        "<script>if (a<b) { x(); }</script>after",
        "<style>p>span{}</style>t",
        "<!-- c --><p>x</p><!---->",
        "<!DOCTYPE html><html><body>z</body></html>",
        "<p>Tags: <div>d</div></p>",
        "<ul><li>a<li>b</ul>",
        "<table><tr><td>1<td>2<tr><td>3</table>",
        "<p title='a &amp; b'>x &lt; y</p>",
        "<a href='u?a=1&amp;b=2'>l</a>",
        "<span>über &uuml;</span>",
        "< notatag >",
        "<p>unclosed",
        "</p>stray",
        "<P CLASS='UP'>case</P>",
        "<div foo=bar baz='q' foo=dup>first-wins</div>",
    ]
    for html in samples:
        fast, std = _both(html)
        assert fast.outer_html() == std.outer_html(), html
        assert fast.text() == std.text(), html


soup = st.lists(
    st.one_of(
        st.text(alphabet=string.printable + "äöü&<>", max_size=80),
        st.builds(
            lambda t, a, inner: f"<{t} {a}>{inner}</{t}>",
            st.sampled_from(["div", "p", "span", "li", "script", "b"]),
            st.sampled_from(["", "class='c'", "id=x", "data-a=\"1\"", "k='&amp;'"]),
            st.text(alphabet=string.ascii_letters + " &;<>'\"", max_size=40),
        ),
    ),
    max_size=8,
).map("".join)


@settings(derandomize=True, max_examples=300, deadline=None)
@given(soup)
def test_fuzz_engines_agree(html):
    fast, std = _both(html)
    assert fast.outer_html() == std.outer_html()
