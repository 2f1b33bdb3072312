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
