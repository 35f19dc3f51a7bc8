"""Host-level link graph over interleaved HTML documents.

Training-data pipelines weight and filter sources by link-graph
signals (in-degree, PageRank-style centrality); the reference itself
is host-centric (per-host profiles, per-host rate limits —
SourceHandler/ExtractionSupervisor), so the host graph is the natural
unit here too.

Scale notes:
  * `extract_host_links` is PURE Catalyst — regexp_extract_all over
    the assembled HTML, explode, host parsing via regex. Map-only up
    to the final (src, dst) distinct; no Python, no DOM build. (Anchor
    extraction doesn't need jsoup parity — href attributes are regular
    enough for a scan-speed regex, and the full DOM kernel stays
    available for cases that do.)
  * `pagerank_hosts` runs a FIXED number of iterations with one join +
    one aggregate per iteration, keyed on host — the graph after
    host-level aggregation is tiny relative to the corpus (10^6-10^8
    hosts for 10^12 docs), so iterations are cheap; out-degrees are
    computed once and reused. Deterministic: no sampling, stable
    rounding at the end only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HREF_RE = r'href="([^"]*)"'
HOST_RE = r"^https?://([^/]+)"


def extract_host_links(
    docs: DataFrame,
    html_col: str = "html",
    src_host_col: str = "host",
) -> DataFrame:
    """Distinct (src, dst) host edges from anchor hrefs in the HTML.

    Only absolute http(s) hrefs contribute (relative links stay within
    src and carry no cross-host signal); self-loops are dropped.
    """
    hrefs = F.explode(
        F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), F.lit(1))
    ).alias("href")
    dst = F.regexp_extract(F.col("href"), HOST_RE, 1)
    return (
        docs.select(F.col(src_host_col).alias("src"), hrefs)
        .withColumn("dst", dst)
        .where((F.col("dst") != "") & (F.col("dst") != F.col("src")))
        .select("src", "dst")
        .distinct()
    )


def pagerank_hosts(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    round_to: int = 6,
    graph_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """PageRank over host edges, fixed iteration count, deterministic.

    rank_0 = 1/N; rank_{t+1}(v) = (1-d)/N + d * (sum of rank_t(u)/out(u)
    over in-edges u->v + dangling_mass_t/N). Dangling hosts (no
    out-edges) redistribute their rank uniformly — the standard
    normalization, so ranks sum to 1 at every step.

    `graph_partitions`: when the post-aggregation host graph is known
    to be small relative to the corpus (the usual case — 10^6-10^8
    hosts from 10^12 docs), coalesce the cached edge/node sets down so
    the per-iteration joins don't pay corpus-sized task scheduling.
    Leave None to keep the upstream partitioning.

    When `graph_partitions` is set (the caller asserts a small graph)
    and `materialize` is on, adaptive execution is suspended for the
    iteration jobs: AQE materializes every Exchange as its own
    scheduling round to re-plan at runtime, which a bounded-size
    iteration cannot benefit from — measured 40 → 16 driver jobs per
    call on the gate graph, values identical. With graph_partitions
    None the graph may be corpus-sized and AQE's skew-join handling
    stays on. The flag is restored in a finally block (session-global
    conf — don't build unrelated frames concurrently from other
    threads while a small-graph pagerank runs).
    """
    edges = edges.select("src", "dst").distinct()
    if graph_partitions is not None:
        edges = edges.coalesce(graph_partitions)
    edges = edges.cache()
    spark = edges.sparkSession
    suspend_aqe = graph_partitions is not None and materialize
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    if suspend_aqe:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _pagerank_iterations(
            edges, iterations, damping, round_to, graph_partitions,
            materialize,
        )
    finally:
        if suspend_aqe:
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def _pagerank_iterations(
    edges: DataFrame,
    iterations: int,
    damping: float,
    round_to: int,
    graph_partitions,
    materialize: bool,
) -> DataFrame:
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    if graph_partitions is not None:
        nodes = nodes.coalesce(graph_partitions)
    nodes = nodes.cache()
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iterations):
        if materialize and it > 0:
            # r7: each iteration references the previous ranks TWICE
            # (dangling-mass branch + contribution branch), so the lazy
            # plan doubles per iteration — planning cost grows 2^t and
            # the broadcast subqueries re-derive the whole prefix.
            # Truncating per iteration keeps plans linear; the frame is
            # host-cardinality tiny by construction.
            ranks = ranks.localCheckpoint(eager=True)
        with_deg = ranks.join(
            out_deg, ranks["host"] == out_deg["src"], "left"
        ).select("host", "rank", "out")
        dangling = (
            with_deg.where(F.col("out").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            with_deg.where(F.col("out").isNotNull())
            .join(edges, with_deg["host"] == edges["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out")).alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes["host"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0))
                       + F.col("dm") / n)
                ).alias("rank"),
            )
        )
    out = ranks.select("host", F.round("rank", round_to).alias("rank"))
    # materialize the (tiny) final ranks and truncate the iteration
    # lineage, THEN drop the edge/node caches — otherwise every call
    # leaves cached blocks pinned for the session, and unpersisting
    # without the checkpoint would re-derive edges once per iteration
    # on the caller's action. `materialize=False` keeps the raw
    # iterative plan visible (plan audits/tests) and leaves cache
    # lifecycle to the caller — note tools/plan_audit.py therefore
    # shows only the post-checkpoint scan for the default path; the
    # pre-checkpoint plan shape is pinned by test_plan_shape.py.
    if not materialize:
        return out
    out = out.localCheckpoint(eager=True)
    edges.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    return out


ANCHOR_RE = r'<a href="[^"]*"[^>]*>[^<]*</a>'


def extract_anchor_texts(
    docs: DataFrame,
    html_col: str = "html",
    src_host_col: str = "host",
) -> DataFrame:
    """(src, dst, anchor_text) triples from absolute-href anchors —
    the raw material for anchor-text/caption training pairs and
    link-context quality signals. Pure Catalyst: regexp_extract_all of
    whole anchors, per-element href/text extraction, map-only until the
    caller aggregates.
    """
    anchors = F.explode(
        F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), F.lit(0))
    ).alias("a")
    href = F.regexp_extract(F.col("a"), r'href="([^"]*)"', 1)
    text = F.trim(F.regexp_extract(F.col("a"), r">([^<]*)<", 1))
    dst = F.regexp_extract(href, HOST_RE, 1)
    return (
        docs.select(F.col(src_host_col).alias("src"), anchors)
        .select("src", dst.alias("dst"), text.alias("anchor_text"))
        .where((F.col("dst") != "") & (F.col("anchor_text") != ""))
    )


def _meta_content(html: Column, prop: str) -> Column:
    """content= of a <meta property=...> / <meta name=...> tag, both
    attribute orders, quotes optional on BOTH attributes ('' when
    absent) — an unquoted ``content=value`` (valid HTML) yields the
    value via the fallback branches, not ''."""
    fwd = F.regexp_extract(
        html,
        r'(?is)<meta\b(?=[^>]*\b(?:property|name)\s*=\s*["\']?'
        + prop
        + r'["\'\s])[^>]*\bcontent\s*=\s*["\']([^"\']*)["\']',
        1,
    )
    rev = F.regexp_extract(
        html,
        r'(?is)<meta\b[^>]*\bcontent\s*=\s*["\']([^"\']*)["\']'
        r'[^>]*\b(?:property|name)\s*=\s*["\']?' + prop + r'["\'\s]',
        1,
    )
    fwd_uq = F.regexp_extract(
        html,
        r'(?is)<meta\b(?=[^>]*\b(?:property|name)\s*=\s*["\']?'
        + prop
        + r'["\'\s])[^>]*\bcontent\s*=\s*([^"\'\s>]+)',
        1,
    )
    rev_uq = F.regexp_extract(
        html,
        r'(?is)<meta\b[^>]*\bcontent\s*=\s*([^"\'\s>]+)'
        r'[^>]*\b(?:property|name)\s*=\s*["\']?' + prop + r'["\'\s]',
        1,
    )
    return (
        F.when(fwd != "", fwd)
        .when(rev != "", rev)
        .when(fwd_uq != "", fwd_uq)
        .otherwise(rev_uq)
    )


def og_extract(
    docs: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Open Graph / meta fallback extraction: og:title, og:description
    (falling back to <meta name=description>), og:image, og:site_name,
    og:type, plus the <title> element — the salvage path for pages no
    extraction profile covers (virtually every modern page ships OG
    tags for link previews). Columns append to the input; '' means
    absent. Map-only regex scans, no DOM build — this is the CHEAP
    tier below profile extraction, not a replacement for it (profiles
    give span-exact main content; OG gives preview metadata).
    """
    h = F.col(html_col)
    title_el = F.regexp_extract(
        h, r"(?is)<title[^>]*>\s*(.*?)\s*</title>", 1
    )
    og_title = _meta_content(h, "og:title")
    desc = F.when(
        _meta_content(h, "og:description") != "",
        _meta_content(h, "og:description"),
    ).otherwise(_meta_content(h, "description"))
    return docs.select(
        "*",
        F.when(og_title != "", og_title).otherwise(title_el).alias(
            "og_title"
        ),
        desc.alias("og_description"),
        _meta_content(h, "og:image").alias("og_image"),
        _meta_content(h, "og:site_name").alias("og_site_name"),
        _meta_content(h, "og:type").alias("og_type"),
    )


def hreflang_alternates(
    docs: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """(url, hreflang, alt_url) rows from ``<link rel=alternate
    hreflang=...>`` tags — the publisher's own multilingual clustering:
    translations of one page reference each other, giving training
    pipelines aligned-document candidates and letting corpus balancing
    count a translated story once per language, not once per copy.
    Pairs with ``detect_language`` (declared vs detected language is a
    cheap quality check). Pure Catalyst: one extract-all over the link
    tags, per-tag attribute extraction after the explode; x-default
    rows carry hreflang='x-default'.
    """
    tags = F.regexp_extract_all(
        F.col(html_col),
        F.lit(r"(?is)(<link\b[^>]*\bhreflang\s*=[^>]*>)"),
        F.lit(1),
    )
    exploded = docs.select(
        F.col(url_col).alias("url"), F.explode(tags).alias("_tag")
    )
    lang = F.regexp_extract(
        F.col("_tag"), r'(?i)\bhreflang\s*=\s*["\']?([A-Za-z0-9-]+)', 1
    )
    href = F.regexp_extract(
        F.col("_tag"), r'(?i)\bhref\s*=\s*["\']?([^"\'\s>]+)', 1
    )
    return (
        exploded.select(
            "url",
            F.lower(lang).alias("hreflang"),
            href.alias("alt_url"),
        )
        .where((F.col("hreflang") != "") & (F.col("alt_url") != ""))
    )
