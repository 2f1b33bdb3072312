"""A pages-like table derived from the driver's `documents` parquet so
the ingest pipeline (html → text extraction → link extraction → url
dictionary → edges) has an exact DuckDB oracle.

Each document becomes a page at url `https://doc/<doc_id>` whose html
contains three deterministic outlinks (targets (doc_id*k) % modulus
for k = 3,5,7) and the document text in a `<main>` block. The SQL
builder mirrors the construction character for character.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_MODULUS = 211
_KS = (3, 5, 7)


def doc_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(F.lit("https://doc/"), F.col("doc_id").cast("string"))
    anchors = [
        F.concat(
            F.lit('<a href="https://doc/'),
            ((F.col("doc_id") * k) % DOC_MODULUS).cast("string"),
            F.lit('">link</a>'),
        )
        for k in _KS
    ]
    html = F.concat(
        F.lit("<html><body><nav>"),
        *anchors,
        F.lit("</nav><main>"),
        F.col("text"),
        F.lit("</main></body></html>"),
    )
    return docs.select(
        url.alias("url"),
        F.encode(html, "UTF-8").alias("html"),
        F.col("text").alias("want_text"),
        "lang",
    )


N_HOSTS = 13


def doc_pages_hosted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Like doc_pages but urls are spread over N_HOSTS synthetic hosts
    (host = doc_id % 13) so host-level rollups are non-trivial."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def _url(id_col):
        return F.concat(
            F.lit("https://h"),
            (id_col % N_HOSTS).cast("string"),
            F.lit(".example/d/"),
            id_col.cast("string"),
        )

    anchors = [
        F.concat(F.lit('<a href="'), _url((F.col("doc_id") * k) % DOC_MODULUS), F.lit('">link</a>'))
        for k in _KS
    ]
    html = F.concat(
        F.lit("<html><body><nav>"),
        *anchors,
        F.lit("</nav><main>"),
        F.col("text"),
        F.lit("</main></body></html>"),
    )
    return docs.select(
        _url(F.col("doc_id")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )


def doc_pages_hosted_sql() -> str:
    def _url(expr: str) -> str:
        return (
            f"'https://h' || CAST(({expr}) % {N_HOSTS} AS VARCHAR) || "
            f"'.example/d/' || CAST({expr} AS VARCHAR)"
        )

    anchors = " || ".join(
        f"'<a href=\"' || {_url(f'(doc_id * {k}) % {DOC_MODULUS}')} || '\">link</a>'"
        for k in _KS
    )
    return f"""
SELECT {_url('doc_id')} AS url,
       '<html><body><nav>' || {anchors} || '</nav><main>' || text || '</main></body></html>' AS html
FROM documents
""".strip()


def doc_pages_sql() -> str:
    """The same table as a DuckDB CTE body (url, html as VARCHAR,
    want_text, lang)."""
    anchors = " || ".join(
        f"'<a href=\"https://doc/' || CAST((doc_id * {k}) % {DOC_MODULUS} AS VARCHAR) || '\">link</a>'"
        for k in _KS
    )
    return f"""
SELECT 'https://doc/' || CAST(doc_id AS VARCHAR) AS url,
       '<html><body><nav>' || {anchors} || '</nav><main>' || text || '</main></body></html>' AS html,
       text AS want_text,
       lang
FROM documents
""".strip()


def doc_urls_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, url) with deterministically DIRTY urls — the five
    mess classes a crawl frontier actually contains, cycled by
    doc_id % 5:

      0: upper-cased scheme+host plus a fragment
      1: explicit default https port :443
      2: http with explicit default port :80 and a trailing slash
      3: non-default port :8443 (must be KEPT by canonicalization)
      4: already clean

    The SQL twin mirrors this character for character."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = (F.col("doc_id") % N_HOSTS).cast("string")
    i = F.col("doc_id").cast("string")
    c = F.col("doc_id") % 5
    url = (
        F.when(c == 0, F.concat(F.lit("HTTPS://H"), k, F.lit(".Example/d/"), i, F.lit("#sec2")))
        .when(c == 1, F.concat(F.lit("https://h"), k, F.lit(".example:443/d/"), i))
        .when(c == 2, F.concat(F.lit("http://h"), k, F.lit(".example:80/d/"), i, F.lit("/")))
        .when(c == 3, F.concat(F.lit("https://h"), k, F.lit(".example:8443/d/"), i))
        .otherwise(F.concat(F.lit("https://h"), k, F.lit(".example/d/"), i))
    )
    return docs.select("doc_id", url.alias("url"))


def doc_urls_dirty_sql() -> str:
    k = f"CAST(doc_id % {N_HOSTS} AS VARCHAR)"
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
       CASE doc_id % 5
         WHEN 0 THEN 'HTTPS://H' || {k} || '.Example/d/' || {i} || '#sec2'
         WHEN 1 THEN 'https://h' || {k} || '.example:443/d/' || {i}
         WHEN 2 THEN 'http://h' || {k} || '.example:80/d/' || {i} || '/'
         WHEN 3 THEN 'https://h' || {k} || '.example:8443/d/' || {i}
         ELSE 'https://h' || {k} || '.example/d/' || {i}
       END AS url
FROM documents
""".strip()


def doc_texts_boilerplated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, text) where text = per-host boilerplate header,
    nav and footer lines wrapped around the document body — the shape
    line-level boilerplate removal exists for (every doc of a host
    shares the same 3 chrome lines; the body is the unique payload).
    The SQL twin mirrors this character for character."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = F.col("source")
    text = F.concat_ws(
        "\n",
        F.concat(F.lit("Copyright "), s, F.lit(" all rights reserved")),
        F.concat(F.lit("home | about | contact - "), s),
        F.col("text"),
        F.concat(F.lit("subscribe to the "), s, F.lit(" newsletter")),
    )
    return docs.select("doc_id", "source", text.alias("text"))


def doc_texts_boilerplated_sql() -> str:
    return """
SELECT doc_id, source,
       'Copyright ' || source || ' all rights reserved' || chr(10) ||
       'home | about | contact - ' || source || chr(10) ||
       text || chr(10) ||
       'subscribe to the ' || source || ' newsletter' AS text
FROM documents
""".strip()


# anchor-text vocabulary moduli: anchors pointing at the same target
# share a small two-token vocabulary, so per-target profiles have a
# meaningful dominant term (the classic "anchors describe the target"
# web-corpus signal)
_ANCHOR_W_MOD = 23
_ANCHOR_Q_MOD = 7


def doc_pages_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_pages variant whose anchors carry target-derived TEXT
    ("w<t%23> q<t%7>" for target t) instead of the constant "link" —
    the input for anchor-text aggregation. (url, html)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(F.lit("https://doc/"), F.col("doc_id").cast("string"))

    def _anchor(k: int):
        t = (F.col("doc_id") * k) % DOC_MODULUS
        return F.concat(
            F.lit('<a href="https://doc/'),
            t.cast("string"),
            F.lit('">w'),
            (t % _ANCHOR_W_MOD).cast("string"),
            F.lit(" q"),
            (t % _ANCHOR_Q_MOD).cast("string"),
            F.lit("</a>"),
        )

    html = F.concat(
        F.lit("<html><body><nav>"),
        *[_anchor(k) for k in _KS],
        F.lit("</nav><main>"),
        F.col("text"),
        F.lit("</main></body></html>"),
    )
    return docs.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))


def doc_pages_anchored_sql() -> str:
    """doc_pages_anchored as a DuckDB CTE body, character-identical."""

    def _anchor(k: int) -> str:
        t = f"(doc_id * {k}) % {DOC_MODULUS}"
        return (
            f"'<a href=\"https://doc/' || CAST({t} AS VARCHAR) || '\">w' || "
            f"CAST(({t}) % {_ANCHOR_W_MOD} AS VARCHAR) || ' q' || "
            f"CAST(({t}) % {_ANCHOR_Q_MOD} AS VARCHAR) || '</a>'"
        )

    anchors = " || ".join(_anchor(k) for k in _KS)
    return f"""
SELECT 'https://doc/' || CAST(doc_id AS VARCHAR) AS url,
       '<html><body><nav>' || {anchors} || '</nav><main>' || text || '</main></body></html>' AS html
FROM documents
""".strip()


# uncrawled-target universe for the frontier query: external targets
# live on a host the crawl never visits, spread over a prime modulus
# so inbound-link mass varies across targets
_EXT_K = 11
_EXT_MOD = 97


def doc_pages_with_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_pages_hosted plus ONE external anchor per page, pointing at
    https://ext.example/p/<(doc_id*11) % 97> — targets that are never
    crawled, i.e. the crawl frontier. (url, html)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def _url(id_col):
        return F.concat(
            F.lit("https://h"),
            (id_col % N_HOSTS).cast("string"),
            F.lit(".example/d/"),
            id_col.cast("string"),
        )

    anchors = [
        F.concat(F.lit('<a href="'), _url((F.col("doc_id") * k) % DOC_MODULUS), F.lit('">link</a>'))
        for k in _KS
    ]
    ext = F.concat(
        F.lit('<a href="https://ext.example/p/'),
        ((F.col("doc_id") * _EXT_K) % _EXT_MOD).cast("string"),
        F.lit('">out</a>'),
    )
    html = F.concat(
        F.lit("<html><body><nav>"),
        *anchors,
        ext,
        F.lit("</nav><main>"),
        F.col("text"),
        F.lit("</main></body></html>"),
    )
    return docs.select(
        _url(F.col("doc_id")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )


def frontier_links_sql() -> str:
    """The (src_url, dst_url) EXTERNAL link rows of
    doc_pages_with_frontier as a DuckDB CTE body — the oracle skips
    the html round-trip (regexp extraction is certified by the
    ingest_extract/ingest_edges cells) and builds the link rows the
    html embeds, character-identical."""
    src = (
        f"'https://h' || CAST(doc_id % {N_HOSTS} AS VARCHAR) || "
        f"'.example/d/' || CAST(doc_id AS VARCHAR)"
    )
    return f"""
SELECT {src} AS src_url,
       'https://ext.example/p/' || CAST((doc_id * {_EXT_K}) % {_EXT_MOD} AS VARCHAR) AS dst_url
FROM documents
""".strip()


# mirrored-host universe for mirror detection: every doc lives on host
# h<doc_id % 13>; docs with doc_id % 4 == 0 are ALSO served (same
# body) on mirror host m<doc_id % 13> — so each (h<k>, m<k>) pair
# shares ~a quarter of h<k>'s fingerprints and all other pairs share
# none
def doc_host_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, fp) — md5 body fingerprints per host, with the mirror
    copies above."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = (F.col("doc_id") % N_HOSTS).cast("string")
    orig = docs.select(
        F.concat(F.lit("h"), k).alias("host"), F.md5("text").alias("fp")
    )
    mirrored = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("m"), k).alias("host"), F.md5("text").alias("fp")
    )
    return orig.unionByName(mirrored)


def doc_host_fingerprints_sql() -> str:
    return f"""
SELECT 'h' || CAST(doc_id % {N_HOSTS} AS VARCHAR) AS host, md5(text) AS fp
FROM documents
UNION ALL
SELECT 'm' || CAST(doc_id % {N_HOSTS} AS VARCHAR) AS host, md5(text) AS fp
FROM documents WHERE doc_id % 4 = 0
""".strip()


# two-crawl edge universes for the snapshot diff: crawl A links with
# multipliers (3,5,7), crawl B with (3,5,11) — the site template
# changed one nav slot between crawls
_KS_B = (3, 5, 11)


def doc_edges_snapshot(spark: SparkSession, sf_dir: str, ks) -> DataFrame:
    """(src, dst) doc-id edges of one synthetic crawl snapshot."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = [
        docs.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * k) % DOC_MODULUS).alias("dst"),
        )
        for k in ks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def doc_edges_snapshot_sql(ks) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT doc_id AS src, (doc_id * {k}) % {DOC_MODULUS} AS dst FROM documents"
        for k in ks
    )
