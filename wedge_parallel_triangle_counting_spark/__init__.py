"""PySpark-native link-graph analytics engine.

A brand-new engine (not a port) with the query capabilities of the
WeTriC wedge-parallel triangle-counting reference
(jeffreyspaan/wedge-parallel-triangle-counting): exact triangle
counting over an `edges(src, dst)` table with degree-ordered
orientation and wedge-balanced parallelism, plus PageRank, connected
components and label propagation, fed from a Common-Crawl-style pages
table (url, warc_ts, html, text, lang).

Everything relational is DataFrame algebra optimized by Catalyst/AQE;
the inner loops (wedge enumeration, closure probing) are vectorized
numpy inside `mapInPandas` — no per-row Python anywhere.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
