"""Date pipeline, content hash, URL cleaning — pinned to reference spec values.

Pins from /root/reference/src/test/scala/info/coverified/extractor/analyzer/
AnalyzerSpec.scala:225-599 and EntryInformationSpec.scala:14-63.
"""

import pytest

from content_extractor_spark.kernel.analyzer import apply_date_time_regex
from content_extractor_spark.kernel.dates import reformat_datetime
from content_extractor_spark.kernel.scala_hash import content_hash
from content_extractor_spark.kernel.urlclean import clean_url, merge_host_and_url

TARGET = "yyyy-MM-dd'T'HH:mm:ssXXX"


class TestReformat:
    def test_fallback_zone_summer(self):
        # AnalyzerSpec:536-555 — "20.07.2021 11:15" @ Europe/Berlin (+02) -> UTC
        assert (
            reformat_datetime("20.07.2021 11:15", "dd.MM.yyyy HH:mm", "Europe/Berlin", TARGET)
            == "2021-07-20T09:15:00Z"
        )

    def test_z_zone_identity(self):
        # AnalyzerSpec:557-565
        assert (
            reformat_datetime("2019-06-27T22:00:00Z", TARGET, "Europe/Berlin", TARGET)
            == "2019-06-27T22:00:00Z"
        )

    def test_offset_conversion(self):
        # AnalyzerSpec:567-576
        assert (
            reformat_datetime("2019-06-27T22:00:00+01:00", TARGET, "Europe/Berlin", TARGET)
            == "2019-06-27T21:00:00Z"
        )

    def test_date_only_start_of_day_winter(self):
        # AnalyzerSpec:578-598 — 01.03.2021 @ Berlin (+01 winter) midnight -> UTC
        assert (
            reformat_datetime("01.03.2021", "dd.MM.yyyy", "Europe/Berlin", TARGET)
            == "2021-02-28T23:00:00Z"
        )

    def test_browserhelper_x_pattern(self):
        # BrowserHelper date: "2021-06-03T13:37:00Z" fmt yyyy-MM-dd'T'HH:mm:ssX
        assert (
            reformat_datetime(
                "2021-06-03T13:37:00Z", "yyyy-MM-dd'T'HH:mm:ssX", "Europe/Berlin", TARGET
            )
            == "2021-06-03T13:37:00Z"
        )

    def test_parse_failure_raises(self):
        with pytest.raises(ValueError):
            reformat_datetime("not a date", "dd.MM.yyyy", "Europe/Berlin", TARGET)


class TestRegexNarrowing:
    def test_identity_without_pattern(self):
        # AnalyzerSpec:502-508
        assert apply_date_time_regex("20.07.2021 | Von", None) == "20.07.2021 | Von"

    def test_first_match(self):
        # AnalyzerSpec:510-520
        assert (
            apply_date_time_regex("20.07.2021 | Von", r"\d{2}\.\d{2}\.\d{4}")
            == "20.07.2021"
        )

    def test_no_match_raises(self):
        # AnalyzerSpec:522-534
        with pytest.raises(ValueError):
            apply_date_time_regex("20.07.2021 | Von", r"^BlaFoo\d+")


class TestContentHash:
    # EntryInformationSpec.scala:14-63 — exact Scala Tuple4 hashCode pins
    def test_pin_full(self):
        assert (
            content_hash(
                "The title",
                "This summarizes everything",
                "This contains a lot.",
                "2021-07-21T22:00:00Z",
            )
            == 328104163
        )

    def test_pin_variant(self):
        assert (
            content_hash(
                "The title",
                "This summarizes everything",
                "This contains less.",
                "2021-07-21T22:00:00Z",
            )
            == 781685212
        )

    def test_pin_nones_as_empty(self):
        assert content_hash("The title", None, None, None) == 318208789
        assert content_hash("The title", "", "", "") == 318208789


class TestUrlClean:
    def test_unwanted_params_removed(self):
        assert (
            clean_url("https://x.de/p?a=1&nn=2&download=3&b=4#frag")
            == "https://x.de/p?a=1&b=4"
        )

    def test_jsessionid_stripped(self):
        assert (
            clean_url("https://x.de/a;jsessionid=ABC123/b?q=1")
            == "https://x.de/a/b?q=1"
        )

    def test_merge_relative(self):
        assert (
            merge_host_and_url("/img/a.jpg", "https://www.auswaertiges-amt.de")
            == "https://www.auswaertiges-amt.de/img/a.jpg"
        )

    def test_merge_protocol_relative(self):
        assert merge_host_and_url("//cdn.x.de/a.jpg", "https://x.de") == "https://cdn.x.de/a.jpg"

    def test_merge_already_absolute(self):
        assert (
            merge_host_and_url("https://x.de/a.jpg", "https://x.de")
            == "https://x.de/a.jpg"
        )

    def test_punycode(self):
        assert clean_url("https://bücher.de/x").startswith("https://xn--bcher-kva.de/")


class TestGermanDates:
    def test_month_name_pattern(self):
        # "d. MMMM yyyy" with German month names (profile-targeted sites)
        assert (
            reformat_datetime("5. März 2021", "d. MMMM yyyy", "Europe/Berlin", TARGET)
            == "2021-03-04T23:00:00Z"  # start of day Berlin (+01) -> UTC
        )

    def test_abbreviated_month(self):
        assert (
            reformat_datetime("05. Okt. 2021 14:30", "dd. MMM yyyy HH:mm", "Europe/Berlin", TARGET)
            == "2021-10-05T12:30:00Z"  # +02 summer time
        )

    def test_unsupported_pattern_letter_raises(self):
        with pytest.raises(ValueError):
            reformat_datetime("x", "qq", "Europe/Berlin", TARGET)


class TestCanonicalizeUrl:
    """RFC 3986 §6.2.2 syntax-based normalization (frontier identity)."""

    def test_full_normalization(self):
        from content_extractor_spark.kernel.urlclean import canonicalize_url

        assert canonicalize_url(
            "HTTP://WWW.Example.COM:80/a/../b/./c%7ed?x=1&utm_source=nl&y=%41#f"
        ) == "http://www.example.com/b/c~d?x=1&y=A"
        # default port + empty path; non-default port kept
        assert canonicalize_url("https://h.example:443") == "https://h.example/"
        assert canonicalize_url("https://h.example:8443/p") == \
            "https://h.example:8443/p"
        # dot-segments never climb above root
        assert canonicalize_url("https://h.example/a/b/../../../x") == \
            "https://h.example/x"
        # encoded slash is NOT decoded (it is not unreserved — decoding
        # would change the path structure); hex uppercased
        assert canonicalize_url("https://h.example/p%2fq") == \
            "https://h.example/p%2Fq"
        # tracking params dropped, remaining ORDER preserved
        assert canonicalize_url(
            "https://h.example/p?b=2&fbclid=x&a=1"
        ) == "https://h.example/p?b=2&a=1"
        # non-http(s) and unparseable inputs pass through unchanged
        assert canonicalize_url("mailto:x@y.example") == "mailto:x@y.example"
        assert canonicalize_url(None) is None

    def test_malformed_port_passes_through(self):
        """urlsplit defers port validation to the .port accessor — a
        raw-crawl url with a junk port must return unchanged, never
        raise (one bad url would otherwise fail the whole Spark task).
        """
        from content_extractor_spark.kernel.urlclean import canonicalize_url

        for bad in (
            "http://example.com:abc/x",
            "http://h.example:99999999999/",
            "https://h.example:-1/p",
        ):
            assert canonicalize_url(bad) == bad

    def test_sql_udf_registration(self, spark):
        from content_extractor_spark.functions.udfs import register_all

        register_all(spark)
        row = spark.sql(
            "SELECT canonicalize_url('HTTPS://A.Example/x/../y#z') AS u"
        ).first()
        assert row["u"] == "https://a.example/y"
