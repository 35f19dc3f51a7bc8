"""WARC source connector: crawl archives -> the pipeline's documents.

Web-scale corpora arrive as directories of ~1 GB ``.warc.gz`` files
(the Common Crawl convention). This connector turns them into the
interleaved ``documents(doc_id, spans, host, url, ...)`` shape the
extraction pipeline consumes.

Scale design (100 TB = ~100k WARC files):
  * the FILE is the parallelism unit — ``binaryFile`` gives one row
    per file and Spark schedules one task per file, the standard
    shape for WARC processing on Spark. A 1 GB compressed member
    stream inflates record-by-record inside the task (the per-member
    gzip framing exists exactly for this), so peak memory is one
    compressed file + one inflated record, not the inflated file.
  * record parsing is a single mapInPandas stage (Arrow-batched);
    everything downstream (host parsing, span wrapping) is Catalyst.
  * malformed/truncated records become rows with ``error`` set —
    counted, never task failures (same status-column policy as the
    extraction stage, reference O4).
  * ``binaryFile`` never splits a file: the hard ceiling is the JVM
    byte-array limit (~2 GB per file — larger archives must be
    repacked; Common Crawl caps at ~1.2 GB so the standard layout is
    always safe). ``spark.sql.files.maxPartitionBytes`` only controls
    how many SMALL files pack into one task.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_RECORDS_DDL = (
    "warc_file string, record_id string, warc_type string, "
    "url string, warc_date string, http_status int, "
    "content_type string, payload binary, error string"
)


def read_warc(
    spark: SparkSession,
    path: str,
    warc_types: tuple = ("response",),
) -> DataFrame:
    """(warc_file, record_id, warc_type, url, warc_date, http_status,
    content_type, payload, error) rows from .warc / .warc.gz files."""
    from ..kernel.warc import iter_warc_records

    types = set(warc_types) if warc_types else None

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {k.split(" ")[0]: [] for k in WARC_RECORDS_DDL.split(", ")}
            for fname, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(content)):
                    if types and rec.warc_type not in types and not rec.error:
                        continue
                    out["warc_file"].append(fname)
                    out["record_id"].append(rec.record_id)
                    out["warc_type"].append(rec.warc_type)
                    out["url"].append(rec.target_uri)
                    out["warc_date"].append(rec.warc_date)
                    out["http_status"].append(rec.http_status)
                    out["content_type"].append(
                        rec.http_content_type or rec.content_type
                    )
                    out["payload"].append(rec.payload)
                    out["error"].append(rec.error)
            yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return files.mapInPandas(run, schema=WARC_RECORDS_DDL)


def read_warc_ranges(spark: SparkSession, plan: DataFrame) -> DataFrame:
    """Ranged WARC reading driven by a CDX fetch plan
    (``sources.cdx.cdx_fetch_plan`` rows: filename + offset-sorted
    (offset, length, url) ranges): read ONLY the selected gzip
    members of each archive instead of whole files — the selective-
    consumption path of a 100 TB crawl (the index decides the bytes;
    this reader fetches just those).

    Parallelism unit = the archive FILE (one plan row each, same as
    :func:`read_warc`); within a row the ranges walk in offset order
    (sequential-friendly on any store). Local/posix paths here; on an
    object store the seek+read pair maps to a ranged GET with the
    same plan shape. Output schema matches :func:`read_warc`.
    """
    from ..kernel.warc import iter_warc_records

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {k.split(" ")[0]: [] for k in WARC_RECORDS_DDL.split(", ")}
            for fname, ranges in zip(pdf["filename"], pdf["ranges"]):
                try:
                    fh = open(fname, "rb")
                except OSError as exc:
                    out["warc_file"].append(fname)
                    for k in ("record_id", "warc_type", "url",
                              "warc_date", "content_type"):
                        out[k].append(None)
                    out["http_status"].append(None)
                    out["payload"].append(None)
                    out["error"].append(f"open failed: {exc}")
                    continue
                with fh:
                    for rng in ranges:
                        fh.seek(int(rng["offset"]))
                        member = fh.read(int(rng["length"]))
                        got = False
                        for rec in iter_warc_records(member):
                            got = True
                            out["warc_file"].append(fname)
                            out["record_id"].append(rec.record_id)
                            out["warc_type"].append(rec.warc_type)
                            out["url"].append(rec.target_uri)
                            out["warc_date"].append(rec.warc_date)
                            out["http_status"].append(rec.http_status)
                            out["content_type"].append(
                                rec.http_content_type or rec.content_type
                            )
                            out["payload"].append(rec.payload)
                            out["error"].append(rec.error)
                        if not got:
                            out["warc_file"].append(fname)
                            for k in ("record_id", "warc_type", "url",
                                      "warc_date", "content_type"):
                                out[k].append(None)
                            out["http_status"].append(None)
                            out["payload"].append(None)
                            out["error"].append(
                                "range decoded no record "
                                f"(offset={rng['offset']})"
                            )
            yield pd.DataFrame(out)

    return plan.select("filename", "ranges").mapInPandas(
        run, schema=WARC_RECORDS_DDL
    )


def warc_documents(
    records: DataFrame, sniff_charset: bool = True
) -> DataFrame:
    """OK html response records -> the pipeline's interleaved documents
    shape (single text span holding the page text; media spans come
    later from extraction); host from the url, WARC ids/dates carried
    through.

    With ``sniff_charset`` (default) the page bytes decode per-row via
    the HTTP charset param / WHATWG meta prescan / windows-1252
    aliasing (real crawls are far from all-UTF-8) — an Arrow-batched
    pandas UDF that fuses into this select, no extra stage boundary.
    ``sniff_charset=False`` keeps the zero-Python utf-8 decode.
    """
    ok = records.where(
        F.col("error").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
    )
    if sniff_charset:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _decode(payload, ctype):
            import pandas as pd

            from ..kernel.warc import decode_html_bytes

            return pd.Series(
                [
                    None if p is None else decode_html_bytes(bytes(p), c)
                    for p, c in zip(payload, ctype)
                ]
            )

        html = _decode(F.col("payload"), F.col("content_type"))
    else:
        html = F.decode(F.col("payload"), "utf-8")
    span = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            html.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )
    return ok.select(
        F.regexp_replace(F.col("record_id"), r"[<>]", "").alias("doc_id"),
        span.alias("spans"),
        F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1).alias("host"),
        F.col("url"),
        F.col("record_id").alias("url_id"),
        F.col("warc_date").alias("last_crawl"),
        F.lit(None).cast("string").alias("etag"),
    )


def attachment_documents(records: DataFrame) -> DataFrame:
    """Non-HTML response payloads -> extracted text documents, routed
    by magic bytes: ``%PDF`` -> the pure-Python PDF parser, ``PK`` ->
    the OOXML .docx extractor. One Arrow-batched mapInPandas stage
    (the decoders are per-payload Python by nature — same justified
    boundary as the image/WARC decode UDFs); per-row failures become
    ``error`` rows, never task failures.

    Output: (doc_id, url, host, format, title, text, error). HTML
    stays on the :func:`warc_documents` profile-extraction path —
    this is the sidecar lane for document attachments in the archive.
    """
    import pandas as pd

    ok = records.where(
        F.col("error").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & ~F.coalesce(F.col("content_type"), F.lit("")).startswith(
            "text/html"
        )
    ).select("record_id", "url", "payload")

    def run(batches):
        from ..kernel.docx import extract_docx_text
        from ..kernel.pdftext import extract_text

        for pdf in batches:
            out = {
                "doc_id": [], "url": [], "host": [], "format": [],
                "title": [], "text": [], "error": [],
            }
            for rid, url, payload in zip(
                pdf["record_id"], pdf["url"], pdf["payload"]
            ):
                b = b"" if payload is None else bytes(payload)
                fmt, title, text, err = "unknown", "", "", None
                try:
                    if b.startswith(b"%PDF"):
                        fmt = "pdf"
                        text = extract_text(b)
                    elif b.startswith(b"PK"):
                        got = extract_docx_text(b)
                        fmt = "docx" if got["error"] is None else "zip"
                        title = got["title"]
                        text = got["text"]
                        err = got["error"]
                    else:
                        err = "unsupported format"
                except Exception as exc:  # decoder bug: row, not task
                    err = f"decode error: {exc}"
                m = re.match(r"^https?://([^/]+)", url or "")
                out["doc_id"].append((rid or "").strip("<>"))
                out["url"].append(url)
                out["host"].append(m.group(1) if m else "")
                out["format"].append(fmt)
                out["title"].append(title)
                out["text"].append(text)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return ok.mapInPandas(
        run,
        schema=(
            "doc_id string, url string, host string, format string, "
            "title string, text string, error string"
        ),
    )


def wet_documents(records: DataFrame) -> DataFrame:
    """``conversion`` (WET) records -> flat text documents
    (doc_id, text, host, url, last_crawl) — Common Crawl's
    pre-extracted-text layout, the direct input shape of the curation
    operators (dedup/quality/language families)."""
    ok = records.where(
        F.col("error").isNull() & (F.col("warc_type") == "conversion")
    )
    return ok.select(
        F.regexp_replace(F.col("record_id"), r"[<>]", "").alias("doc_id"),
        F.decode(F.col("payload"), "utf-8").alias("text"),
        F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1).alias("host"),
        F.col("url"),
        F.col("warc_date").alias("last_crawl"),
    )


# Common Crawl WAT envelope subset: head title + outgoing anchors.
# Dashed field names are quoted; everything else in the envelope is
# ignored by from_json (permissive-by-schema, the Spark JSON contract).
WAT_ENVELOPE_DDL = (
    "STRUCT<`Envelope`: STRUCT<"
    "`WARC-Header-Metadata`: STRUCT<`WARC-Target-URI`: STRING>, "
    "`Payload-Metadata`: STRUCT<`HTTP-Response-Metadata`: STRUCT<"
    "`HTML-Metadata`: STRUCT<"
    "`Head`: STRUCT<`Title`: STRING, "
    "`Metas`: ARRAY<STRUCT<`name`: STRING, `content`: STRING>>, "
    "`Scripts`: ARRAY<STRUCT<`url`: STRING>>>, "
    "`Links`: ARRAY<STRUCT<`path`: STRING, `url`: STRING, "
    "`text`: STRING>>>>>>>"
)


def wat_links(records: DataFrame) -> DataFrame:
    """WAT ``metadata`` records -> one row per outgoing link:
    (src_url, title, link_path, link_url, link_text).

    Pure Catalyst — ``from_json`` over the JSON envelope + explode; no
    Python stage, so the link graph of a 100 TB crawl comes out of its
    WAT sidecars at scan speed without ever re-parsing HTML. The
    page url prefers the envelope's WARC-Header-Metadata and falls
    back to the record's own WARC-Target-URI header."""
    env = F.from_json(F.col("payload").cast("string"), WAT_ENVELOPE_DDL)
    html_meta = env["Envelope"]["Payload-Metadata"][
        "HTTP-Response-Metadata"
    ]["HTML-Metadata"]
    return (
        records.where(
            F.col("error").isNull() & (F.col("warc_type") == "metadata")
        )
        .select(
            F.coalesce(
                env["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"],
                F.col("url"),
            ).alias("src_url"),
            F.coalesce(html_meta["Head"]["Title"], F.lit("")).alias("title"),
            F.explode(html_meta["Links"]).alias("link"),
        )
        .where(F.col("link.url").isNotNull())
        .select(
            "src_url",
            "title",
            F.coalesce(F.col("link.path"), F.lit("")).alias("link_path"),
            F.col("link.url").alias("link_url"),
            F.coalesce(F.col("link.text"), F.lit("")).alias("link_text"),
        )
    )


def wat_head_meta(records: DataFrame) -> DataFrame:
    """WAT ``metadata`` records -> one row per <head> meta tag:
    (src_url, meta_name, meta_content) — description/robots/og:* etc.
    without HTML re-parse. Same pure-Catalyst from_json shape as
    :func:`wat_links`."""
    env = F.from_json(F.col("payload").cast("string"), WAT_ENVELOPE_DDL)
    head = env["Envelope"]["Payload-Metadata"][
        "HTTP-Response-Metadata"
    ]["HTML-Metadata"]["Head"]
    return (
        records.where(
            F.col("error").isNull() & (F.col("warc_type") == "metadata")
        )
        .select(
            F.coalesce(
                env["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"],
                F.col("url"),
            ).alias("src_url"),
            F.explode(head["Metas"]).alias("meta"),
        )
        .where(F.col("meta.name").isNotNull())
        .select(
            "src_url",
            F.col("meta.name").alias("meta_name"),
            F.coalesce(F.col("meta.content"), F.lit("")).alias(
                "meta_content"
            ),
        )
    )


def wat_host_edges(records: DataFrame) -> DataFrame:
    """WAT records -> distinct (src, dst) host edges, the direct input
    of ``pagerank_hosts`` — same edge semantics as
    ``linkgraph.extract_host_links`` (absolute http(s) links only,
    self-loops dropped) but sourced from WAT sidecars instead of HTML.
    """
    from content_extractor_spark.operators.linkgraph import HOST_RE

    links = wat_links(records)
    return (
        links.select(
            F.regexp_extract("src_url", HOST_RE, 1).alias("src"),
            F.regexp_extract("link_url", HOST_RE, 1).alias("dst"),
        )
        .where((F.col("src") != "") & (F.col("dst") != "")
               & (F.col("dst") != F.col("src")))
        .distinct()
    )


def _list_warc_files(spark: SparkSession, in_dir: str) -> list:
    """Deterministic WARC file listing via the Hadoop FileSystem API —
    works for local, HDFS and object-store paths alike."""
    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(in_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return []
    out = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if status.isFile() and (
            name.endswith(".warc") or name.endswith(".warc.gz")
            or name.endswith(".warc.wet.gz") or name.endswith(".wet.gz")
            or name.endswith(".warc.wat.gz") or name.endswith(".wat.gz")
        ):
            out.append(status.getPath().toString())
    return sorted(out)


def read_file_ledger(spark: SparkSession, ledger_path: str):
    """(done_files, committed_batches) from a file ledger, tolerating
    pre-batch-column ledgers and a not-yet-existing path."""
    try:
        rows = spark.read.parquet(ledger_path).collect()
    except Exception:
        return set(), set()
    done = {r["file"] for r in rows}
    batches = {
        b for b in (r.asDict().get("batch") for r in rows) if b
    }
    return done, batches


def commit_file_ledger(spark, ledger_path: str, files, batch: str) -> None:
    """Append (file, done, batch) rows — the atomicity point of a run."""
    spark.createDataFrame(
        [(f, "done", batch) for f in files],
        "file string, status string, batch string",
    ).write.mode("append").parquet(ledger_path)


def batch_id(files) -> str:
    """Deterministic id for a batch of input files."""
    import hashlib

    return hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()[:16]


def migrate_flat_store(spark, data_path: str) -> int:
    """One-time migration of a pre-batch-layout store: any child of
    ``data_path`` that is not an ``ingest_batch=*`` directory (flat
    ``part-*.parquet`` appends, ``_SUCCESS`` markers, or ``split=*``
    partition dirs from the old curation layout) moves into
    ``ingest_batch=legacy/``. Without this, one new-style run on an
    old store leaves a mixed flat+partitioned layout that
    ``spark.read.parquet`` rejects with conflicting-directory-structure
    errors. Driver-side renames on the same filesystem — O(children),
    never a data copy. Returns the number of entries moved."""
    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(data_path)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return 0
    stray = [
        s.getPath()
        for s in fs.listStatus(path)
        if not s.getPath().getName().startswith("ingest_batch=")
    ]
    if not stray:
        return 0
    legacy = jvm.org.apache.hadoop.fs.Path(data_path, "ingest_batch=legacy")
    fs.mkdirs(legacy)
    moved = 0
    for p in stray:
        dest = jvm.org.apache.hadoop.fs.Path(legacy, p.getName())
        # Hadoop rename returns False (no exception) when the target
        # already exists — e.g. a retried migration or two flat
        # generations. Retry under a unique suffix so the mixed layout
        # this function exists to fix is never silently left behind.
        if not fs.rename(p, dest):
            alt = jvm.org.apache.hadoop.fs.Path(
                legacy, f"{p.getName()}.migrated-{moved}"
            )
            if not fs.rename(p, alt):
                raise IOError(
                    f"migrate_flat_store: could not move {p} into {legacy}"
                )
        moved += 1
    return moved


def drop_orphan_batches(spark, data_path: str, committed) -> list:
    """Delete ``ingest_batch=*`` subdirectories whose batch id is not
    in the ledger — leftovers of a run that crashed between the data
    write and the ledger commit. This is what makes ingestion
    exactly-once rather than at-least-once: the re-run regenerates the
    batch instead of appending a second copy. Driver-side O(batches)
    directory listing, never a data scan."""
    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(data_path)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return []
    dropped = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if name.startswith("ingest_batch="):
            bid = name.split("=", 1)[1]
            if bid not in committed:
                fs.delete(status.getPath(), True)
                dropped.append(bid)
    return dropped


def incremental_warc_ingest(
    spark: SparkSession,
    in_dir: str,
    out_root: str,
    warc_types: tuple = ("response",),
    max_files: int = None,
) -> dict:
    """Incremental crawl-archive ingestion with file-granular resume:
    each run parses ONLY archive files not yet committed to the file
    ledger, appends their records as parquet, then commits the files —
    the batch analog of a Structured Streaming file source for a
    format it cannot stream (binaryFile). Exactly-once: each batch
    writes to its own ``ingest_batch=<id>`` partition directory and
    the ledger commit registers the batch id; a run that crashed
    between the data write and the ledger commit leaves an orphan
    batch directory, which the next run deletes before re-processing
    — so a batch lands at most once. ``max_files`` bounds a run for
    steady backlog drain.

    Returns {"files_total", "files_new", "files_processed",
    "records"} — at 100k-file corpora the listing and ledger stay
    driver-tiny (one row per FILE, never per record).
    """
    ledger_path = f"{out_root}/warc_ledger"
    records_path = f"{out_root}/records"
    files = _list_warc_files(spark, in_dir)
    done, committed = read_file_ledger(spark, ledger_path)
    # a store written by the pre-batch-layout version has flat appends
    # in the base dir; fold them into ingest_batch=legacy once (and
    # never orphan-drop that synthetic batch)
    migrate_flat_store(spark, records_path)
    drop_orphan_batches(spark, records_path, committed | {"legacy"})
    todo = [f for f in files if f not in done]
    if max_files is not None:
        todo = todo[:max_files]
    summary = {
        "files_total": len(files),
        "files_new": len(todo),
        "files_processed": 0,
        "records": 0,
    }
    if not todo:
        return summary
    from pyspark.sql import Observation

    recs = read_warc(spark, todo, warc_types=warc_types)
    # record count rides the write as an observation metric — counting
    # separately would parse every archive TWICE
    obs = Observation("warc_ingest")
    bid = batch_id(todo)
    recs.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(f"{records_path}/ingest_batch={bid}")
    n = obs.get["n"]
    commit_file_ledger(spark, ledger_path, todo, bid)
    summary["files_processed"] = len(todo)
    summary["records"] = n
    return summary
