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
