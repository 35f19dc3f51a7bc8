"""WARC source connector: kernel parsing + Spark reader + extraction."""

from content_extractor_spark.kernel.warc import build_warc, iter_warc_records


def _pages(n, host="www.docs.example"):
    return [
        (f"id-{i}", f"https://{host}/p{i}",
         (f"<html><body><div id='content-main'><h1 class='title'>T{i}</h1>"
          f"<p>body {i}</p></div></body></html>").encode())
        for i in range(n)
    ]


class TestWarcKernel:
    def test_roundtrip_gzip_members_and_plain(self):
        pages = _pages(5)
        for gz in (True, False):
            recs = list(iter_warc_records(build_warc(pages, gzip_members=gz)))
            assert len(recs) == 5
            r = recs[2]
            assert r.warc_type == "response"
            assert r.http_status == 200
            assert r.target_uri == "https://www.docs.example/p2"
            # payload is the HTTP BODY, not the HTTP message
            assert b"<h1 class='title'>T2</h1>" in r.payload
            assert not r.payload.startswith(b"HTTP/")
            assert r.http_content_type.startswith("text/html")

    def test_chunked_transfer_encoding_dechunked(self):
        chunked = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
                   b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
        block = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                 b"Content-Type: application/http; msgtype=response\r\n"
                 + f"Content-Length: {len(chunked)}\r\n\r\n".encode()
                 + chunked + b"\r\n\r\n")
        (rec,) = iter_warc_records(block)
        assert rec.payload == b"hello world"

    def test_truncated_tail_tolerated(self):
        data = build_warc(_pages(5), gzip_members=False)
        recs = list(iter_warc_records(data[: len(data) // 2]))
        # complete records parse; a cut record flags error; no raise
        assert recs
        assert all(r.error or r.http_status == 200 for r in recs)

    def test_non_warc_bytes_yield_nothing(self):
        assert list(iter_warc_records(b"PK\x03\x04 not a warc")) == []


class TestWarcSpark:
    def test_read_warc_mixed_dir_to_extraction(self, spark, tmp_path):
        """a.warc.gz (per-member gzip) + b.warc (plain) in one dir ->
        records -> documents shape -> profile extraction end to end."""
        from content_extractor_spark.kernel.profiles import profile_from_dict
        from content_extractor_spark.operators.extract import extract_entries
        from content_extractor_spark.sources.warc import (
            read_warc,
            warc_documents,
        )

        pages = _pages(20)
        (tmp_path / "a.warc.gz").write_bytes(build_warc(pages[:10]))
        (tmp_path / "b.warc").write_bytes(
            build_warc(pages[10:], gzip_members=False)
        )
        recs = read_warc(spark, str(tmp_path))
        assert recs.count() == 20
        docs = warc_documents(recs)
        row = docs.first()
        assert row["host"] == "www.docs.example"
        assert row["spans"][0]["kind"] == "text"
        prof = profile_from_dict({"profile": {
            "hostname": "www.docs.example",
            "pageTypes": [{
                "name": "article",
                "condition": {"selector": "div#content-main"},
                "selectors": {"title": "h1.title",
                              "content": "div#content-main"},
            }],
        }})
        out = extract_entries(docs, {"www.docs.example": prof})
        ok = [r for r in out.select("status", "title").collect()
              if r["status"] == "ok"]
        assert len(ok) == 20
        assert all(r["title"].startswith("T") for r in ok)

    def test_non_html_and_error_records_filtered(self, spark, tmp_path):
        from content_extractor_spark.sources.warc import (
            read_warc,
            warc_documents,
        )

        good = build_warc(_pages(3))
        (tmp_path / "c.warc.gz").write_bytes(good)
        # a plain file whose tail is cut mid-record
        plain = build_warc(_pages(3), gzip_members=False)
        (tmp_path / "d.warc").write_bytes(plain[: len(plain) - 40])
        recs = read_warc(spark, str(tmp_path))
        docs = warc_documents(recs)
        # every surviving document row is intact html
        assert docs.count() >= 4
        assert docs.where("host != 'www.docs.example'").count() == 0


class TestWet:
    def test_wet_documents_roundtrip(self, spark, tmp_path):
        from content_extractor_spark.kernel.warc import build_wet
        from content_extractor_spark.sources.warc import (
            read_warc,
            wet_documents,
        )

        docs = [(f"id-{i}", f"https://h{i % 2}.example/p{i}",
                 f"extracted text of page {i}") for i in range(8)]
        (tmp_path / "x.warc.wet.gz").write_bytes(build_wet(docs))
        recs = read_warc(spark, str(tmp_path), warc_types=("conversion",))
        out = {r["doc_id"]: (r["host"], r["text"])
               for r in wet_documents(recs).collect()}
        assert len(out) == 8
        assert out["urn:uuid:id-3"] == (
            "h1.example", "extracted text of page 3"
        )


class TestWatAndRequests:
    """Round 5: the remaining ISO 28500 record types — ``request``
    records (full-archive layout) and ``metadata``/WAT parsing into
    the link-graph family without HTML re-parse."""

    def test_request_records_roundtrip(self):
        data = build_warc(_pages(3), with_requests=True)
        recs = list(iter_warc_records(data))
        assert [r.warc_type for r in recs] == [
            "request", "response"] * 3
        req = recs[0]
        assert req.target_uri == "https://www.docs.example/p0"
        assert req.payload.startswith(b"GET /p0 HTTP/1.1\r\n")
        assert b"Host: www.docs.example" in req.payload

    def test_read_warc_filters_request_records(self, spark, tmp_path):
        from content_extractor_spark.sources.warc import read_warc

        (tmp_path / "a.warc.gz").write_bytes(
            build_warc(_pages(4), with_requests=True)
        )
        reqs = read_warc(spark, str(tmp_path), warc_types=("request",))
        assert reqs.count() == 4
        # default read stays response-only: requests don't leak in
        resp = read_warc(spark, str(tmp_path))
        assert resp.count() == 4
        assert {r["warc_type"] for r in resp.collect()} == {"response"}

    def test_wat_roundtrip_links(self, spark, tmp_path):
        from content_extractor_spark.kernel.warc import build_wat
        from content_extractor_spark.sources.warc import (
            read_warc,
            wat_host_edges,
            wat_links,
        )

        wat = build_wat([
            ("w1", "https://a.example/p1", "Title One",
             [("https://b.example/x", "to b"), ("/rel/y", "rel")]),
            ("w2", "https://b.example/p2", "Title Two",
             [("https://a.example/z", "back"),
              ("https://b.example/self", "self")]),
            ("w3", "https://c.example/p3", "No Links", []),
        ])
        (tmp_path / "a.warc.wat.gz").write_bytes(wat)
        recs = read_warc(spark, str(tmp_path), warc_types=("metadata",))
        assert recs.count() == 3
        links = {
            (r["src_url"], r["link_url"], r["link_text"], r["title"])
            for r in wat_links(recs).collect()
        }
        assert links == {
            ("https://a.example/p1", "https://b.example/x", "to b",
             "Title One"),
            ("https://a.example/p1", "/rel/y", "rel", "Title One"),
            ("https://b.example/p2", "https://a.example/z", "back",
             "Title Two"),
            ("https://b.example/p2", "https://b.example/self", "self",
             "Title Two"),
        }
        # host edges: absolute cross-host links only, no self-loops
        edges = {(r["src"], r["dst"])
                 for r in wat_host_edges(recs).collect()}
        assert edges == {("a.example", "b.example"),
                         ("b.example", "a.example")}

    def test_wat_head_metas(self, spark, tmp_path):
        from content_extractor_spark.kernel.warc import build_wat
        from content_extractor_spark.sources.warc import (
            read_warc,
            wat_head_meta,
        )

        wat = build_wat([
            ("w1", "https://a.example/p1", "T1",
             [("https://b.example/x", "t")],
             [("description", "a page"), ("robots", "noindex")],
             ["https://cdn.example/app.js"]),
            ("w2", "https://b.example/p2", "T2", [], [], []),
        ])
        (tmp_path / "m.warc.wat.gz").write_bytes(wat)
        recs = read_warc(spark, str(tmp_path), warc_types=("metadata",))
        metas = {
            (r["src_url"], r["meta_name"], r["meta_content"])
            for r in wat_head_meta(recs).collect()
        }
        assert metas == {
            ("https://a.example/p1", "description", "a page"),
            ("https://a.example/p1", "robots", "noindex"),
        }

    def test_attachment_documents_routing(self, spark, tmp_path):
        """Mixed archive: html stays on the profile path; pdf/docx
        payloads route by magic to the right parser; junk becomes an
        error ROW (never a task failure)."""
        from content_extractor_spark.kernel.docx import build_docx
        from content_extractor_spark.kernel.pdftext import (
            build_simple_pdf,
        )
        from content_extractor_spark.sources.warc import (
            attachment_documents,
            read_warc,
            warc_documents,
        )

        pages = [
            ("h1", "https://a.example/page", b"<html><body>x</body></html>"),
            ("p1", "https://a.example/doc.pdf",
             build_simple_pdf(["line one", "line two"]),
             "application/pdf"),
            ("d1", "https://b.example/doc.docx",
             build_docx(["para one", "para two"], title="D1"),
             "application/vnd.openxmlformats-officedocument"
             ".wordprocessingml.document"),
            ("x1", "https://b.example/blob.bin", b"\x00\x01garbage",
             "application/octet-stream"),
        ]
        (tmp_path / "mix.warc.gz").write_bytes(build_warc(pages))
        recs = read_warc(spark, str(tmp_path))
        assert warc_documents(recs).count() == 1  # html only
        got = {
            r["doc_id"]: (r["format"], r["title"], r["text"], r["error"])
            for r in attachment_documents(recs).collect()
        }
        assert set(got) == {"urn:uuid:p1", "urn:uuid:d1", "urn:uuid:x1"}
        assert got["urn:uuid:p1"][0] == "pdf"
        assert got["urn:uuid:p1"][2] == "line one\nline two"
        assert got["urn:uuid:d1"][:3] == (
            "docx", "D1", "para one\npara two"
        )
        assert got["urn:uuid:x1"][0] == "unknown"
        assert got["urn:uuid:x1"][3] == "unsupported format"

    def test_wat_malformed_json_yields_no_rows(self, spark, tmp_path):
        """A WAT record with garbage JSON must contribute zero link
        rows, never a task failure (from_json -> NULL envelope)."""
        from content_extractor_spark.kernel.warc import build_wat
        from content_extractor_spark.sources.warc import (
            read_warc,
            wat_links,
        )

        good = build_wat(
            [("w1", "https://a.example/p", "T",
              [("https://b.example/q", "t")])],
            gzip_members=False,
        )
        # corrupt the JSON body but keep Content-Length consistent
        bad = good.replace(b'{"Envelope"', b'{"EnvelXXX"')
        (tmp_path / "a.warc").write_bytes(bad)
        recs = read_warc(spark, str(tmp_path), warc_types=("metadata",))
        assert recs.count() == 1
        assert wat_links(recs).count() == 0


class TestWarcFuzz:
    def test_roundtrip_property(self):
        """Any (id, url, body) corpus round-trips exactly, gz or plain;
        any truncation point parses a prefix without raising."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        page = st.tuples(
            st.text(alphabet="abcdef0123456789-", min_size=1, max_size=12),
            st.from_regex(r"https://h[0-9]\.example/[a-z0-9/]{0,20}",
                          fullmatch=True),
            st.binary(max_size=400),
        )

        @settings(max_examples=60, deadline=None)
        @given(st.lists(page, min_size=0, max_size=6), st.booleans(),
               st.floats(min_value=0.0, max_value=1.0))
        def check(pages, gz, cut_frac):
            data = build_warc(pages, gzip_members=gz)
            recs = list(iter_warc_records(data))
            assert len(recs) == len(pages)
            for (rid, url, body), rec in zip(pages, recs):
                assert rec.target_uri == url
                assert rec.payload == body
                assert rec.record_id == f"<urn:uuid:{rid}>"
            # truncation never raises, yields a prefix of the corpus
            cut = int(len(data) * cut_frac)
            prefix = list(iter_warc_records(data[:cut]))
            assert len(prefix) <= len(pages)
            for (rid, url, body), rec in zip(pages, prefix):
                if rec.error is None:
                    assert rec.payload == body

        check()


class TestCharsetSniff:
    def test_decode_html_bytes_resolution_order(self):
        from content_extractor_spark.kernel.warc import decode_html_bytes

        # 1) HTTP header charset wins
        s = decode_html_bytes("höhe".encode("windows-1252"),
                              "text/html; charset=windows-1252")
        assert s == "höhe"
        # 2) meta charset sniff when the header has no charset
        body = b'<html><meta charset="iso-8859-1"><body>caf\xe9</body>'
        assert "café" in decode_html_bytes(body, "text/html")
        # http-equiv content= form
        body2 = (b'<meta http-equiv="Content-Type" '
                 b'content="text/html; charset=ISO-8859-1">caf\xe9')
        assert "café" in decode_html_bytes(body2, None)
        # 3) fallback utf-8 with replacement, never a raise
        assert "�" in decode_html_bytes(b"\xff\xfe\xfa", "text/html")
        # unknown codec label falls back instead of raising
        assert decode_html_bytes(b"ok", "text/html; charset=bogus-enc") == "ok"

    def test_warc_documents_decodes_legacy_charset(self, spark, tmp_path):
        import zlib as _z

        from content_extractor_spark.sources.warc import (
            read_warc,
            warc_documents,
        )

        body = "<html><body><p>höhe café</p></body></html>".encode(
            "windows-1252"
        )
        http = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=windows-1252\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Record-ID: <urn:uuid:cs-1>\r\n"
               b"WARC-Target-URI: https://a.example/p\r\n"
               b"WARC-Date: 2021-07-01T00:00:00Z\r\n"
               b"Content-Type: application/http; msgtype=response\r\n"
               + f"Content-Length: {len(http)}\r\n\r\n".encode()
               + http + b"\r\n\r\n")
        co = _z.compressobj(9, _z.DEFLATED, 16 + _z.MAX_WBITS)
        (tmp_path / "cs.warc.gz").write_bytes(co.compress(rec) + co.flush())
        docs = warc_documents(read_warc(spark, str(tmp_path)))
        text = docs.first()["spans"][0]["text"]
        assert "höhe café" in text


class TestIncrementalIngest:
    def test_file_ledger_resume(self, spark, tmp_path):
        from content_extractor_spark.sources.warc import (
            incremental_warc_ingest,
        )

        in_dir = tmp_path / "in"
        out = tmp_path / "out"
        in_dir.mkdir()
        (in_dir / "a.warc.gz").write_bytes(build_warc(_pages(4)))
        (in_dir / "b.warc").write_bytes(
            build_warc(_pages(3), gzip_members=False)
        )
        s1 = incremental_warc_ingest(spark, str(in_dir), str(out))
        assert (s1["files_processed"], s1["records"]) == (2, 7)
        # second run: nothing new -> no work, output unchanged
        s2 = incremental_warc_ingest(spark, str(in_dir), str(out))
        assert (s2["files_new"], s2["files_processed"]) == (0, 0)
        assert spark.read.parquet(str(out / "records")).count() == 7
        # a file arrives -> ONLY it is processed; records append
        (in_dir / "c.warc.gz").write_bytes(build_warc(_pages(2)))
        s3 = incremental_warc_ingest(spark, str(in_dir), str(out))
        assert (s3["files_total"], s3["files_processed"]) == (3, 1)
        assert s3["records"] == 2
        assert spark.read.parquet(str(out / "records")).count() == 9

    def test_crash_between_data_and_ledger_is_exactly_once(
        self, spark, tmp_path
    ):
        """A run that died after the records write but before the
        ledger commit leaves an orphan ingest_batch dir; the next run
        must drop it and re-process, landing each record ONCE."""
        from content_extractor_spark.sources.warc import (
            batch_id,
            incremental_warc_ingest,
        )

        in_dir = tmp_path / "in"
        out = tmp_path / "out"
        in_dir.mkdir()
        (in_dir / "a.warc.gz").write_bytes(build_warc(_pages(4)))
        # simulate the crashed half-run: records batch dir exists with
        # the records parquet, but the ledger was never written
        files = [str(in_dir / "a.warc.gz")]
        from content_extractor_spark.sources.warc import read_warc

        bid = batch_id([f"file:{f}" for f in files])
        read_warc(spark, files).write.parquet(
            str(out / "records" / f"ingest_batch={bid}")
        )
        assert spark.read.parquet(str(out / "records")).count() == 4
        s = incremental_warc_ingest(spark, str(in_dir), str(out))
        assert s["files_processed"] == 1 and s["records"] == 4
        # no duplicate rows: orphan dropped, batch landed exactly once
        recs = spark.read.parquet(str(out / "records"))
        assert recs.count() == 4
        assert recs.select("record_id").distinct().count() == 4

    def test_legacy_flat_store_migrates_once(self, spark, tmp_path):
        """r6 (advice): a store written by the pre-batch-layout version
        has flat parquet appends in records/ — one new-style run folds
        them into ingest_batch=legacy so the mixed layout never reaches
        spark.read, old rows survive, and the legacy batch is never
        orphan-dropped."""
        import os

        from content_extractor_spark.sources.warc import (
            commit_file_ledger,
            incremental_warc_ingest,
            read_warc,
        )

        in_dir = tmp_path / "in"
        out = tmp_path / "out"
        in_dir.mkdir()
        (in_dir / "a.warc.gz").write_bytes(build_warc(_pages(4)))
        # simulate the OLD layout: flat append under records/ plus a
        # pre-batch-column... ledger entry for the already-done file
        old_file = str(in_dir / "a.warc.gz")
        read_warc(spark, [old_file]).write.parquet(str(out / "records"))
        commit_file_ledger(
            spark, str(out / "warc_ledger"), [f"file:{old_file}"], ""
        )
        assert any(
            f.startswith("part-") for f in os.listdir(out / "records")
        )
        # new file arrives; the new-style run must migrate THEN append
        (in_dir / "b.warc.gz").write_bytes(build_warc(_pages(2)))
        s = incremental_warc_ingest(spark, str(in_dir), str(out))
        assert s["files_processed"] == 1 and s["records"] == 2
        children = sorted(
            f for f in os.listdir(out / "records") if not f.startswith(".")
        )
        assert "ingest_batch=legacy" in children
        assert not any(c.startswith("part-") for c in children)
        recs = spark.read.parquet(str(out / "records"))
        assert recs.count() == 6  # 4 legacy + 2 new, none lost
        # a THIRD run leaves everything alone (legacy never orphaned)
        s2 = incremental_warc_ingest(spark, str(in_dir), str(out))
        assert s2["files_processed"] == 0
        assert spark.read.parquet(str(out / "records")).count() == 6

    def test_max_files_bounds_a_run(self, spark, tmp_path):
        from content_extractor_spark.sources.warc import (
            incremental_warc_ingest,
        )

        in_dir = tmp_path / "in"
        out = tmp_path / "out"
        in_dir.mkdir()
        for i in range(3):
            (in_dir / f"f{i}.warc.gz").write_bytes(build_warc(_pages(1)))
        s1 = incremental_warc_ingest(
            spark, str(in_dir), str(out), max_files=2
        )
        assert s1["files_processed"] == 2
        s2 = incremental_warc_ingest(
            spark, str(in_dir), str(out), max_files=2
        )
        assert s2["files_processed"] == 1

    def test_bom_outranks_header_and_meta(self):
        from content_extractor_spark.kernel.warc import decode_html_bytes

        # WHATWG: BOM wins even against a contradicting HTTP header
        assert decode_html_bytes(
            b"\xef\xbb\xbf" + "höhe".encode("utf-8"),
            "text/html; charset=windows-1252",
        ) == "höhe"
        assert decode_html_bytes(
            b"\xff\xfe" + "ab".encode("utf-16-le"), None) == "ab"
        assert decode_html_bytes(
            b"\xfe\xff" + "ab".encode("utf-16-be"), None) == "ab"


class TestCdxIndex:
    """CDXJ crawl-index connector: parse -> select -> fetch plan."""

    @staticmethod
    def _lines():
        import json

        def line(key, ts, **kw):
            return f"{key} {ts} {json.dumps(kw)}"

        return [
            line("org,example)/a", "20240101000000",
                 url="https://example.org/a", mime="text/html",
                 status="200", digest="sha1:AAA", length="100",
                 offset="0", filename="f1.warc.gz"),
            # same digest, LATER capture of the same content -> deduped
            line("org,example)/a-copy", "20240102000000",
                 url="https://example.org/a-copy", mime="text/html",
                 status="200", digest="sha1:AAA", length="110",
                 offset="500", filename="f2.warc.gz"),
            line("org,example)/b", "20240101000000",
                 url="https://example.org/b", mime="text/html",
                 status="200", digest="sha1:BBB", length="200",
                 offset="100", filename="f1.warc.gz"),
            # 404 and a PDF: filtered by the standard selection
            line("org,example)/miss", "20240101000000",
                 url="https://example.org/miss", mime="text/html",
                 status="404", digest="sha1:CCC", length="50",
                 offset="300", filename="f1.warc.gz"),
            line("org,example)/doc", "20240101000000",
                 url="https://example.org/doc", mime="application/pdf",
                 status="200", digest="sha1:DDD", length="999",
                 offset="400", filename="f1.warc.gz"),
            # mime only in mime-detected (coalesce path)
            line("org,example)/c", "20240103000000",
                 url="https://example.org/c", status="200",
                 digest="sha1:EEE", length="10", offset="50",
                 filename="f2.warc.gz", **{"mime-detected": "text/html"}),
            "garbage line-without-json",
        ]

    def test_parse_select_and_plan(self, spark, tmp_path):
        from content_extractor_spark.sources.cdx import (
            cdx_fetch_plan,
            cdx_select,
            read_cdx,
        )

        p = tmp_path / "idx"
        p.mkdir()
        (p / "part1.cdx").write_text("\n".join(self._lines()) + "\n")
        caps = read_cdx(spark, str(p))
        rows = {r["urlkey"]: r for r in caps.collect()}
        assert len(rows) == 7
        assert rows["org,example)/a"]["offset"] == 0
        assert rows["org,example)/a"]["length"] == 100
        assert rows["org,example)/a"]["status"] == 200
        assert rows["org,example)/c"]["mime"] == "text/html"
        assert rows["garbage"]["error"] == "malformed cdx line"

        sel = cdx_select(caps)
        keys = sorted(r["urlkey"] for r in sel.collect())
        # digest AAA keeps the EARLIEST capture; 404/pdf/garbage drop
        assert keys == ["org,example)/a", "org,example)/b",
                        "org,example)/c"]

        plan = {r["filename"]: r for r in cdx_fetch_plan(sel).collect()}
        f1 = plan["f1.warc.gz"]
        assert f1["n_records"] == 2 and f1["total_bytes"] == 300
        # ranges sorted by offset for a sequential walk
        assert [(x["offset"], x["length"]) for x in f1["ranges"]] == [
            (0, 100), (100, 200)
        ]
        assert plan["f2.warc.gz"]["n_records"] == 1

    def test_select_without_digest_dedup_keeps_all(self, spark, tmp_path):
        from content_extractor_spark.sources.cdx import cdx_select, read_cdx

        p = tmp_path / "idx2"
        p.mkdir()
        (p / "x.cdx").write_text("\n".join(self._lines()) + "\n")
        sel = cdx_select(read_cdx(spark, str(p)), dedup_digest=False)
        assert sel.count() == 4  # both AAA captures survive

    def test_index_to_ranged_read_end_to_end(self, spark, tmp_path):
        """The full selective-consumption loop with no network:
        build_warc_indexed writes a per-member archive + its CDXJ
        lines; read_cdx -> cdx_select -> cdx_fetch_plan chooses byte
        ranges; read_warc_ranges fetches ONLY those members and the
        parsed records match the full-file reader's output for the
        selected subset."""
        from content_extractor_spark.kernel.warc import build_warc_indexed
        from content_extractor_spark.sources.cdx import (
            cdx_fetch_plan,
            cdx_select,
            read_cdx,
        )
        from content_extractor_spark.sources.warc import (
            read_warc,
            read_warc_ranges,
        )

        pages = [
            (f"r{i}", f"https://h{i % 3}.example/p{i}",
             f"<html><body><p>doc {i} body</p></body></html>".encode())
            for i in range(8)
        ]
        # page 7 duplicates page 0's content -> digest dedup drops it
        pages[7] = ("r7", "https://h0.example/copy", pages[0][2])
        warc_path = str(tmp_path / "a.warc.gz")
        data, lines = build_warc_indexed(pages, filename=warc_path)
        with open(warc_path, "wb") as f:
            f.write(data)
        idx = tmp_path / "idx"
        idx.mkdir()
        (idx / "a.cdx").write_text("\n".join(lines) + "\n")

        plan = cdx_fetch_plan(cdx_select(read_cdx(spark, str(idx))))
        rows = plan.collect()
        assert len(rows) == 1 and rows[0]["n_records"] == 7  # dup dropped

        got = read_warc_ranges(spark, plan)
        parsed = {r["record_id"]: r for r in got.collect()}
        assert all(r["error"] is None for r in parsed.values())
        # the digest tie between r0 and its copy r7 breaks on the
        # urlkey ('.../copy' < '.../p0'), so r7 represents the content
        assert sorted(parsed) == [f"<urn:uuid:r{i}>" for i in range(1, 8)]
        # parity with the whole-file reader on the selected subset
        full = {r["record_id"]: r
                for r in read_warc(spark, warc_path).collect()}
        for rid, r in parsed.items():
            f = full[rid]
            assert bytes(r["payload"]) == bytes(f["payload"])
            assert r["url"] == f["url"]
            assert r["http_status"] == f["http_status"] == 200

    def test_ranged_read_error_rows(self, spark, tmp_path):
        """A missing archive file or a range that decodes nothing
        becomes an error ROW, never a task failure."""
        from content_extractor_spark.sources.warc import read_warc_ranges

        plan = spark.createDataFrame(
            [(str(tmp_path / "missing.warc.gz"),
              [{"offset": 0, "length": 10, "url": "u"}])],
            "filename string, "
            "ranges array<struct<offset: long, length: long, url: string>>",
        )
        rows = read_warc_ranges(spark, plan).collect()
        assert len(rows) == 1 and "open failed" in rows[0]["error"]


class TestBlocklistDifferential:
    def test_blocklist_vs_python_mirror_fuzz(self, spark):
        """Deterministic fuzz: the Spark suffix-join blocklist agrees
        with an obvious pure-Python suffix check on 300 random hosts x
        random blocklists (seeded)."""
        import random

        from content_extractor_spark.operators.scans import (
            domain_blocklist_filter,
        )

        rng = random.Random(1234)
        labels = ["a", "bb", "ccc", "bad", "ok", "x9", "notbad"]
        tlds = ["example", "test", "org"]

        def host():
            n = rng.randint(1, 4)
            return ".".join(
                [rng.choice(labels) for _ in range(n - 1)]
                + [rng.choice(tlds)]
            )

        hosts = [host() for _ in range(300)]
        blocked = sorted({host() for _ in range(25)})

        def py_blocked(h):
            parts = h.split(".")
            sufs = (
                {".".join(parts[i:]) for i in range(len(parts) - 1)}
                if len(parts) >= 2 else {h}
            )
            return any(b in sufs for b in blocked)

        urls = spark.createDataFrame(
            [(h, f"https://{h}/{i}") for i, h in enumerate(hosts)],
            "host string, url string",
        )
        bdf = spark.createDataFrame([(b,) for b in blocked], "domain string")
        kept = {r["url"] for r in domain_blocklist_filter(urls, bdf).collect()}
        expect = {
            f"https://{h}/{i}" for i, h in enumerate(hosts)
            if not py_blocked(h)
        }
        assert kept == expect

    def test_window_spans_vs_python_mirror_fuzz(self, spark):
        """Deterministic fuzz: repeated_window_spans agrees with a
        brute-force Python mirror on 60 random small documents built
        from a tiny vocabulary (lots of genuine repeats)."""
        import hashlib
        import random
        import re
        from collections import Counter

        from content_extractor_spark.operators.dedup_families import (
            repeated_window_spans,
        )

        rng = random.Random(77)
        vocab = [f"w{i}" for i in range(9)]
        docs = [
            (i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 12))))
            for i in range(60)
        ]
        window, stride = 3, 2

        def py_spans():
            spans = []
            for did, text in docs:
                toks = [t for t in re.split(r"\s+", text.lower())]
                if text.strip() == "":
                    toks = [""]  # split('') semantics: one empty token
                if len(toks) < window:
                    continue
                for s in range(1, len(toks) - window + 2, stride):
                    gram = " ".join(toks[s - 1 : s - 1 + window])
                    spans.append(
                        (did, s, hashlib.md5(gram.encode()).hexdigest())
                    )
            counts = Counter(d for _, _, d in spans)
            return sorted(
                (did, s, d, counts[d]) for did, s, d in spans
                if counts[d] >= 2
            )

        df = spark.createDataFrame(docs, "doc_id int, text string")
        got = sorted(
            (r["doc_id"], r["start"], r["digest"], r["occurrences"])
            for r in repeated_window_spans(
                df, window=window, stride=stride
            ).collect()
        )
        assert got == py_spans()
