"""CDXJ crawl-index connector: Common Crawl's index -> fetch plans.

A 100 TB crawl is consumed selectively: the CDXJ index (one line per
capture: ``<urlkey> <timestamp> <json>``) is how a pipeline decides
WHICH WARC byte ranges to read before touching any archive bytes.
This connector parses the index, applies the standard capture
selection (status/mime filters, one capture per content digest), and
groups the survivors into per-file ranged-fetch plans.

Scale notes:
  * ``spark.read.text`` splits ``.cdx.gz`` shards per file and large
    plain shards by range — the index of a full monthly crawl (~300 GB
    compressed) parallelizes naturally.
  * parsing is pure Catalyst (``split`` + ``from_json``) — no Python.
  * selection dedup shuffles once on the content digest (uniform,
    SHA-1-derived); everything else is map-only.
  * the fetch plan groups by archive filename — one group per WARC
    file (~100k captures max per Common Crawl file, a bounded
    collect_list), the unit a range-fetching reader consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# CDXJ JSON envelope: every field is a STRING in the spec (numbers
# included); extra fields are ignored by from_json
CDX_JSON_DDL = (
    "url string, mime string, `mime-detected` string, status string, "
    "digest string, length string, offset string, filename string, "
    "languages string, charset string, redirect string"
)


def parse_cdx_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse CDXJ lines (``<urlkey> <ts> <json>``) from a string
    column into typed capture rows: (urlkey, ts, url, mime, status,
    digest, length, offset, filename, languages, error). Malformed
    lines become ``error`` rows, never task failures (the same
    status-column policy as the WARC parser). Pure Catalyst."""
    parts = F.split(F.col(col), " ", 3)
    # F.get tolerates short splits (a malformed line must become an
    # error ROW, not an ArrayIndexOutOfBounds task failure)
    env = F.from_json(F.get(parts, 2), CDX_JSON_DDL)
    ok = F.get(parts, 2).isNotNull() & env["url"].isNotNull()
    return lines.select(
        parts[0].alias("urlkey"),
        F.get(parts, 1).alias("ts"),
        env["url"].alias("url"),
        F.coalesce(env["mime"], env["mime-detected"]).alias("mime"),
        env["status"].cast("int").alias("status"),
        env["digest"].alias("digest"),
        env["length"].cast("long").alias("length"),
        env["offset"].cast("long").alias("offset"),
        env["filename"].alias("filename"),
        env["languages"].alias("languages"),
        F.when(ok, F.lit(None).cast("string")).otherwise(
            F.lit("malformed cdx line")
        ).alias("error"),
    )


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ index files -> typed capture rows (see
    :func:`parse_cdx_lines`); ``spark.read.text`` gives per-shard
    parallelism over the index directory."""
    return parse_cdx_lines(
        spark.read.text(path).where(F.trim(F.col("value")) != "")
    )


def cdx_select(
    captures: DataFrame,
    statuses=(200,),
    mime_prefixes=("text/html",),
    dedup_digest: bool = True,
) -> DataFrame:
    """The standard capture selection: keep the wanted status codes
    and mime types, and (by default) ONE capture per content digest —
    the earliest timestamp, ties to urlkey — so identical content
    crawled from many urls is fetched once. One uniform shuffle on the
    digest; the filters push into the index scan."""
    mime_ok = None
    for p in mime_prefixes:
        c = F.col("mime").startswith(p)
        mime_ok = c if mime_ok is None else (mime_ok | c)
    out = captures.where(
        F.col("error").isNull()
        & F.col("status").isin(list(statuses))
        & F.coalesce(mime_ok, F.lit(True))
    )
    if dedup_digest:
        # r7 de-skew (guide §2.5): was a row_number window over digest
        # — every capture of a hot digest (a boilerplate page crawled
        # from millions of urls) landed on one task with no map-side
        # reduction. min_by partial-aggregates: each map partition
        # forwards ONE earliest-(ts, urlkey) candidate per digest, so
        # the shuffle carries at most #map_tasks rows per digest. Same
        # earliest-capture-wins result.
        cols = out.columns
        out = (
            out.groupBy("digest")
            .agg(
                F.min_by(
                    F.struct(*cols), F.struct(F.col("ts"), F.col("urlkey"))
                ).alias("_row")
            )
            .select("_row.*")
        )
    return out


def cdx_fetch_plan(selected: DataFrame) -> DataFrame:
    """Group selected captures into per-archive-file ranged-fetch
    plans: (filename, n_records, total_bytes, ranges) with ranges
    sorted by offset — the input a range-fetching WARC reader walks
    sequentially. Bounded: a Common Crawl WARC file holds ~100k
    captures, so the per-group list is file-sized, never corpus-sized.
    """
    return (
        selected.where(F.col("filename").isNotNull())
        .groupBy("filename")
        .agg(
            F.count("*").cast("int").alias("n_records"),
            F.sum("length").alias("total_bytes"),
            F.sort_array(
                F.collect_list(F.struct("offset", "length", "url"))
            ).alias("ranges"),
        )
    )
