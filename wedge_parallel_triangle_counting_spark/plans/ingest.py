"""Ingest pipeline: pages → text extraction → link extraction →
url→vertex-id dictionary → edges(src, dst).

North-rule contract:
- extracted text is BYTE-IDENTICAL per url across runs and
  parallelism levels — extraction is a pure Spark column expression
  (JVM regexp, no Python, no partition-dependent state);
- the url→id dictionary assigns dense 0-based ids with the scalable
  two-pass pattern (operators/ids.py), ordered by url — deterministic
  and reproducible;
- everything is column-pruned: building edges never deserializes the
  `html` bytes of pages it doesn't need, and the dictionary join
  reads only (url, id).

Analogue in the reference: read_graph's parse loop (tc.cu:561-685) —
there the "dictionary" is the implicit 0..max_vertex id domain; here
urls are the raw vertex names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ids import assign_contiguous_ids

_LINK_RE = r'<a href="([^"]+)">'
_MAIN_RE = r"(?s)<main>(.*?)</main>"


def extract_text(pages: DataFrame) -> DataFrame:
    """(url, text) with text extracted from the raw html bytes.
    Deterministic: one JVM regexp over the decoded bytes."""
    return pages.select(
        "url",
        F.regexp_extract(F.decode(F.col("html"), "UTF-8"), _MAIN_RE, 1).alias("text"),
    )


def extract_links(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) — one row per anchor in the html."""
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(
                F.regexp_extract_all(F.decode(F.col("html"), "UTF-8"), F.lit(_LINK_RE), F.lit(1))
            ).alias("dst_url"),
        )
    )


def url_dictionary(pages: DataFrame, links: DataFrame | None = None) -> DataFrame:
    """(url, id) dense dictionary over page urls ∪ link targets,
    ordered by url. The Spark analogue of the reference's inferred
    0..max_vertex id domain (tc.cu:609,625)."""
    urls = pages.select("url")
    if links is not None:
        urls = urls.unionByName(links.select(F.col("dst_url").alias("url")))
    urls = urls.distinct()
    return assign_contiguous_ids(urls, ["url"], id_col="id")


def links_to_edges(links: DataFrame, dictionary: DataFrame) -> DataFrame:
    """(src, dst) long ids via two dictionary joins."""
    d_src = dictionary.select(F.col("url").alias("src_url"), F.col("id").alias("src"))
    d_dst = dictionary.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    return links.join(d_src, "src_url").join(d_dst, "dst_url").select("src", "dst")


def pages_to_edges(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full ingest: returns (edges, dictionary)."""
    links = extract_links(pages)
    dictionary = url_dictionary(pages, links).persist()
    return links_to_edges(links, dictionary), dictionary


_HOST_RE = r"^https?://([^/]+)"


def host_of(url_col):
    """Host component of a url — one JVM regexp, no Python."""
    return F.regexp_extract(url_col, _HOST_RE, 1)


def host_graph(links: DataFrame) -> DataFrame:
    """Host-level rollup of the page link graph:
    (src_host, dst_host, n_links) — the classic web-graph contraction
    (page graph → host graph). Keeps intra-host rows (src_host ==
    dst_host): their count is the site's internal-link mass.

    Scale shape: host extraction is a codegen'd regexp; the rollup is
    ONE hash aggregation whose key cardinality is #host-pairs — orders
    of magnitude below #page-links, so partial (map-side) aggregation
    absorbs almost all input before the shuffle."""
    return (
        links.select(
            host_of(F.col("src_url")).alias("src_host"),
            host_of(F.col("dst_url")).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


# -- url canonicalization ------------------------------------------------

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/#?]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/#?]*(.*)$"


def canonical_url(url_col):
    """Canonical form of a crawl url, as ONE pure JVM column
    expression (regexp extracts + concat — codegen'd, pushdown-safe,
    no Python):

      1. scheme and host lowercased
      2. explicit default port stripped (http:80 / https:443);
         non-default ports kept
      3. fragment (#...) stripped
      4. trailing slash of the path stripped ('/d/5/' == '/d/5';
         a bare root '/' collapses to the empty path)
      5. query string kept verbatim
      6. urls WITHOUT a scheme pass through unchanged (the crawl
         frontier dedup must not invent structure)

    The dedup key for frontier/url-seen joins at 10^12-document
    scale: canonicalize-then-hash makes the seen-set join an
    equi-join on a deterministic key."""
    scheme = F.lower(F.regexp_extract(url_col, _SCHEME_RE, 1))
    hostport = F.regexp_extract(url_col, _HOSTPORT_RE, 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (port != F.lit("")) & ~(
        ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    rest = F.regexp_extract(url_col, _REST_RE, 1)
    rest = F.regexp_replace(rest, r"#.*$", "")
    rest = F.regexp_replace(rest, r"/$", "")
    return F.when(scheme == F.lit(""), url_col).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            rest,
        )
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds `url_canonical` next to the raw url column."""
    return df.withColumn("url_canonical", canonical_url(F.col(url_col)))


_ANCHOR_RE = r'<a href="([^"]+)">([^<]+)</a>'


def extract_anchors(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url, anchor) — one row per anchor WITH its link
    text. Two-stage pure-JVM regexp: regexp_extract_all pulls whole
    anchor elements (stays in whole-stage codegen), then per-row
    regexp_extract splits href/text — the same formulation the DuckDB
    oracle uses, so the rows are byte-identical cross-engine."""
    whole = F.regexp_extract_all(
        F.decode(F.col("html"), "UTF-8"), F.lit(_ANCHOR_RE), F.lit(0)
    )
    return (
        pages.select(F.col("url").alias("src_url"), F.explode(whole).alias("a"))
        .select(
            "src_url",
            F.regexp_extract(F.col("a"), _ANCHOR_RE, 1).alias("dst_url"),
            F.regexp_extract(F.col("a"), _ANCHOR_RE, 2).alias("anchor"),
        )
    )


def anchor_text_profile(pages: DataFrame) -> DataFrame:
    """Per-TARGET anchor-text rollup — the classic "anchors describe
    the target" web/search feature (and a training-data label source):
    for every linked-to url, the incoming-anchor term counts reduced to
    (url, n_anchors, n_terms, top_term, top_term_count), tie-broken
    deterministically (count DESC, term ASC).

    Scale shape: anchors explode to (dst_url, term) — edge-sized ×
    tokens-per-anchor — then ONE hash aggregation on (url, term) with
    map-side combine absorbing the per-page duplication, a per-url
    count rollup riding the same clustering, and a row_number window
    over the url partition. Hub pages (many in-links) are exactly the
    keys map-side combine compresses best; no driver collect."""
    terms = extract_anchors(pages).select(
        F.col("dst_url").alias("url"),
        F.explode(F.split(F.col("anchor"), " ")).alias("term"),
    )
    per_term = terms.groupBy("url", "term").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("url").orderBy(F.desc("c"), F.asc("term"))
    totals = per_term.groupBy("url").agg(
        F.sum("c").alias("n_terms"),
        F.count(F.lit(1)).alias("n_unique_terms"),
    )
    top = (
        per_term.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("url", F.col("term").alias("top_term"), F.col("c").alias("top_term_count"))
    )
    return totals.join(top, "url").select(
        "url", "n_terms", "n_unique_terms", "top_term", "top_term_count"
    )


def crawl_frontier(pages: DataFrame, k: int = 50) -> DataFrame:
    """The crawl frontier, prioritized: link targets NOT present in
    the crawled page set, ranked by inbound evidence —
    (url, n_inlinks, n_src_hosts), ordered by (n_inlinks DESC,
    n_src_hosts DESC, url ASC), top k.

    This is the scheduling core of a recurring crawl: what to fetch
    next, ordered by how much of the already-crawled web points at it
    (in-link count) and how broadly (distinct referring hosts — the
    anti-spam guard: a million links from ONE host rank below ten
    links from ten hosts when counts tie).

    Plan: extract_links (codegen regexp) -> LEFT ANTI join against the
    crawled url set on the target url (edge-sized shuffle, the join
    every frontier computation must pay) -> one hash aggregation
    keyed on the uncrawled target. count(distinct host) inside the
    agg is Spark's expand-based distinct — bounded here because the
    agg key space is the frontier, already orders of magnitude
    smaller than the link table. Global top-k via TakeOrdered (k rows
    per partition to the driver, never a full sort).
    """
    links = extract_links(pages)
    uncrawled = links.join(
        pages.select(F.col("url").alias("dst_url")), "dst_url", "left_anti"
    )
    return (
        uncrawled.select(
            F.col("dst_url").alias("url"),
            host_of(F.col("src_url")).alias("src_host"),
        )
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_inlinks"),
            F.countDistinct("src_host").alias("n_src_hosts"),
        )
        .orderBy(F.desc("n_inlinks"), F.desc("n_src_hosts"), F.asc("url"))
        .limit(k)
    )


def url_templates(urls: DataFrame, url_col: str = "url", k: int = 100) -> DataFrame:
    """URL-template mining: collapse digit runs in the PATH (host kept
    verbatim — traps are per-host) and count urls per (host, template)
    — (host, template, n_urls), top k by (n_urls DESC, host, template).

    A template with a runaway count is the crawl-trap / infinite-
    pagination signal (calendar pages, session ids, faceted search):
    the standard frontier-hygiene report a recurring crawl runs before
    scheduling. Pure codegen'd regexps (`[0-9]+` is RE2 ∩ Java-regex)
    + ONE hash aggregation whose key space is #templates — map-side
    combine absorbs the very repetition that defines a trap — then a
    TakeOrdered top-k."""
    host = host_of(F.col(url_col))
    rest = F.regexp_extract(F.col(url_col), _REST_RE, 1)
    template = F.regexp_replace(rest, "[0-9]+", "{d}")
    return (
        urls.select(host.alias("host"), template.alias("template"))
        .filter(F.col("host") != "")
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy(F.desc("n_urls"), F.asc("host"), F.asc("template"))
        .limit(k)
    )


def backlink_report(links: DataFrame, k_per_host: int = 3) -> DataFrame:
    """Per target host, the top referring hosts —
    (dst_host, src_host, n_links, rank), rank 1..k per dst_host by
    (n_links DESC, src_host ASC), intra-host rows excluded.

    The backlink-profile report (who points at this site): feeds spam
    forensics (one dominant referrer = link farm) and seed selection.
    Plan: the host_graph rollup (page-link-sized agg with map-side
    combine) then ONE window rank over dst_host — Spark plans a
    WindowGroupLimit below the exchange, so the shuffle carries at
    most k rows per (dst_host, map partition)."""
    from pyspark.sql.window import Window

    hg = host_graph(links).filter(F.col("src_host") != F.col("dst_host"))
    w = Window.partitionBy("dst_host").orderBy(F.desc("n_links"), F.asc("src_host"))
    return (
        hg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_per_host)
        .select("dst_host", "src_host", "n_links", "rank")
        .orderBy("dst_host", "rank")
    )


def orphan_pages(pages: DataFrame, k: int = 100) -> DataFrame:
    """Crawled pages NO crawled page links to — (url), ordered, top k.

    The crawl-hygiene complement of the frontier: orphans are
    candidates for de-indexing (unreachable content) or evidence the
    link extractor is missing a link shape. One left-anti join of the
    page set against the link-target set — both sides hashed on the
    url, the same join every set-difference at crawl scale pays."""
    targets = extract_links(pages).select(F.col("dst_url").alias("url"))
    return (
        pages.select("url")
        .join(targets, "url", "left_anti")
        .orderBy("url")
        .limit(k)
    )
