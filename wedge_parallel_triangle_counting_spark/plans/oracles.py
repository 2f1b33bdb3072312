"""DuckDB oracle SQL builders.

Every Spark query exposed in `__spark_entry__.queries()` has a
semantically equivalent ANSI-SQL formulation here, executed by the
driver (and by our own tests) over the same parquet tables. Column
names/aliases match the Spark side exactly — the comparison hashes
values after sorting columns by name.
"""

from __future__ import annotations

from .testdata import TRI_MODULUS, derived_edges_sql


def _graph_cte(raw_sql: str) -> str:
    """Shared preprocessing CTE: dirty raw edges → clean symmetric
    graph, degrees, degree-rank permutation, oriented edges."""
    return f"""
WITH raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
deg AS (SELECT src AS v, count(*) AS degree FROM sym GROUP BY src),
rk AS (
    SELECT v, CAST(row_number() OVER (ORDER BY degree, v) - 1 AS BIGINT) AS rank
    FROM deg
),
oriented AS (
    SELECT rs.rank AS src, rd.rank AS dst
    FROM sym
    JOIN rk rs ON sym.src = rs.v
    JOIN rk rd ON sym.dst = rd.v
    WHERE rs.rank < rd.rank
)
""".strip()


def degrees_sql(raw_sql: str | None = None) -> str:
    raw_sql = raw_sql or derived_edges_sql()
    return _graph_cte(raw_sql) + "\nSELECT v, degree FROM deg"


def orient_sql(raw_sql: str | None = None) -> str:
    raw_sql = raw_sql or derived_edges_sql()
    return _graph_cte(raw_sql) + "\nSELECT src, dst FROM oriented"


def triangles_sql(raw_sql: str | None = None) -> str:
    """Independent formulation (no rank involved): canonicalize each
    undirected edge as (least, greatest) and count ordered 3-paths —
    the textbook SQL triangle count, deliberately NOT our pipeline."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH raw AS ({raw_sql}),
und AS (
    SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
    FROM raw WHERE src <> dst
)
SELECT count(*) AS triangles
FROM und e1
JOIN und e2 ON e1.dst = e2.src
JOIN und e3 ON e1.src = e3.src AND e2.dst = e3.dst
""".strip()


def wedge_stats_sql(raw_sql: str | None = None) -> str:
    raw_sql = raw_sql or derived_edges_sql()
    return (
        _graph_cte(raw_sql)
        + """,
odeg AS (SELECT src AS v, count(*) AS od FROM oriented GROUP BY src)
SELECT
    (SELECT count(*) FROM deg) AS n,
    (SELECT count(*) FROM oriented) AS m_oriented,
    (SELECT coalesce(CAST(sum(od * (od - 1) / 2) AS BIGINT), 0) FROM odeg) AS total_wedges,
    (SELECT max(degree) FROM deg) AS max_degree
"""
    )


def hub_topk_sql(raw_sql: str | None = None, k: int = 10) -> str:
    raw_sql = raw_sql or derived_edges_sql()
    return (
        _graph_cte(raw_sql)
        + f"\nSELECT v, degree FROM deg ORDER BY degree DESC, v LIMIT {k}"
    )
