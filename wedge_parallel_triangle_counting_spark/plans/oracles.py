"""DuckDB oracle SQL builders.

Every Spark query exposed in `__spark_entry__.queries()` has a
semantically equivalent ANSI-SQL formulation here, executed by the
driver (and by our own tests) over the same parquet tables. Column
names/aliases match the Spark side exactly — the comparison hashes
values after sorting columns by name.
"""

from __future__ import annotations

from .docpages import doc_pages_sql
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


def doulion_sql(
    raw_sql: str | None = None, keep_num: int = 3, keep_den: int = 10
) -> str:
    """Mirrors operators/approx.py::triangle_count_doulion — identical
    md5 coin, join-formulation count on the kept subgraph, exact
    1/p^3 scale-up."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH raw AS ({raw_sql}),
und AS (
    SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
    FROM raw WHERE src <> dst
),
kept AS (
    SELECT src, dst FROM und
    WHERE ('0x' || substr(md5('doulion:' || CAST(src AS VARCHAR) || ':'
          || CAST(dst AS VARCHAR)), 1, 8))::BIGINT % {keep_den} < {keep_num}
),
tri AS (
    SELECT CAST(count(*) AS BIGINT) AS t FROM kept e1
    JOIN kept e2 ON e1.dst = e2.src
    JOIN kept e3 ON e1.src = e3.src AND e2.dst = e3.dst
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM kept) AS kept_edges,
       t AS sampled_triangles,
       t * {keep_den**3} // {keep_num**3} AS est_triangles
FROM tri
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


def degree_histogram_sql(raw_sql: str | None = None) -> str:
    raw_sql = raw_sql or derived_edges_sql()
    return (
        _graph_cte(raw_sql)
        + """
SELECT CAST(floor(log2(degree)) AS BIGINT) AS bucket,
       count(*) AS n_vertices,
       min(degree) AS min_degree,
       max(degree) AS max_degree
FROM deg GROUP BY 1
"""
    )


def hub_topk_sql(raw_sql: str | None = None, k: int = 10) -> str:
    raw_sql = raw_sql or derived_edges_sql()
    return (
        _graph_cte(raw_sql)
        + f"\nSELECT v, degree FROM deg ORDER BY degree DESC, v LIMIT {k}"
    )


def common_neighbor_pairs_sql(k: int = 50, raw_sql: str | None = None) -> str:
    """Top-k common-neighbor scores among non-adjacent pairs, ties
    broken by ids — mirrors operators/linkpred.common_neighbor_pairs."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
wp AS (
    SELECT a.dst AS id_a, b.dst AS id_b, count(*) AS cn
    FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst
    GROUP BY 1, 2
)
SELECT wp.id_a, wp.id_b, wp.cn
FROM wp LEFT JOIN sym e ON wp.id_a = e.src AND wp.id_b = e.dst
WHERE e.src IS NULL
ORDER BY wp.cn DESC, wp.id_a, wp.id_b
LIMIT {k}
""".strip()


def link_scores_sql(
    k: int = 50, method: str = "adamic_adar", raw_sql: str | None = None
) -> str:
    """Mirrors operators/linkpred.link_prediction_scores: top-k
    non-adjacent pairs by the chosen index, ordered by the ROUNDED
    score (then ids) so the k-cut is engine-stable."""
    raw_sql = raw_sql or derived_edges_sql()
    if method == "adamic_adar":
        wsum = "sum(1.0 / ln(d.d))"
    elif method == "resource_allocation":
        wsum = "sum(1.0 / d.d)"
    elif method == "jaccard":
        # |N∩N| / |N∪N| attaches per-endpoint degrees AFTER the pair
        # aggregation (one division, no transcendental — identical
        # IEEE result both engines), mirroring the engine's two
        # degree joins on the bounded candidate list
        return f"""
WITH raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
deg AS (SELECT src AS v, count(*) AS d FROM sym GROUP BY src),
wp AS (
    SELECT a.dst AS id_a, b.dst AS id_b, count(*) AS cn
    FROM sym a
    JOIN sym b ON a.src = b.src AND a.dst < b.dst
    GROUP BY 1, 2
),
wj AS (
    SELECT wp.id_a, wp.id_b, wp.cn,
           CAST(wp.cn AS DOUBLE) / (da.d + db.d - wp.cn) AS wsum
    FROM wp JOIN deg da ON da.v = wp.id_a JOIN deg db ON db.v = wp.id_b
)
SELECT wj.id_a, wj.id_b, wj.cn, round(wj.wsum, 6) AS score
FROM wj LEFT JOIN sym e ON wj.id_a = e.src AND wj.id_b = e.dst
WHERE e.src IS NULL
ORDER BY score DESC, wj.id_a, wj.id_b
LIMIT {k}
""".strip()
    else:
        raise ValueError(f"unsupported oracle method {method!r}")
    return f"""
WITH raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
deg AS (SELECT src AS v, count(*) AS d FROM sym GROUP BY src),
wp AS (
    SELECT a.dst AS id_a, b.dst AS id_b, count(*) AS cn, {wsum} AS wsum
    FROM sym a
    JOIN sym b ON a.src = b.src AND a.dst < b.dst
    JOIN deg d ON d.v = a.src
    GROUP BY 1, 2
)
SELECT wp.id_a, wp.id_b, wp.cn, round(wp.wsum, 6) AS score
FROM wp LEFT JOIN sym e ON wp.id_a = e.src AND wp.id_b = e.dst
WHERE e.src IS NULL
ORDER BY score DESC, wp.id_a, wp.id_b
LIMIT {k}
""".strip()


def triangles_sampled_sql(k: int = 256, raw_sql: str | None = None) -> str:
    """Mirrors operators/approx.triangle_count_sampled exactly: the
    sampled wedge ids are floor(t·W/k), the wedge order is (v, x, y)
    over the degree-oriented adjacency, closure against the canonical
    undirected edge set, floor-integer estimate arithmetic."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
dg AS (SELECT src AS v, count(*) AS d FROM sym GROUP BY src),
oriented AS MATERIALIZED (
    SELECT s.src, s.dst
    FROM sym s JOIN dg a ON s.src = a.v JOIN dg b ON s.dst = b.v
    WHERE (a.d < b.d) OR (a.d = b.d AND s.src < s.dst)
),
pairs AS MATERIALIZED (
    SELECT e1.src AS v, e1.dst AS x, e2.dst AS y
    FROM oriented e1 JOIN oriented e2 ON e1.src = e2.src AND e1.dst < e2.dst
),
wtot AS (SELECT count(*) AS w FROM pairs),
idx AS (SELECT DISTINCT (t.t * wtot.w) // {k} AS widx FROM range({k}) t(t), wtot),
ranked AS (SELECT v, x, y, row_number() OVER (ORDER BY v, x, y) - 1 AS widx FROM pairs),
samp AS MATERIALIZED (SELECT r.v, r.x, r.y FROM ranked r JOIN idx USING (widx)),
und AS (SELECT least(src, dst) AS x, greatest(src, dst) AS y FROM oriented),
closedc AS (
    SELECT count(*) AS closed FROM samp
    JOIN und ON samp.x = und.x AND samp.y = und.y
),
sampc AS (SELECT count(*) AS sampled FROM samp)
SELECT CASE WHEN sampled > 0 THEN (closed * w) // sampled ELSE 0 END AS estimate,
       closed, sampled, w AS total_wedges
FROM closedc, sampc, wtot
""".strip()


def local_clustering_sql(raw_sql: str | None = None) -> str:
    """Independent formulation (canonical-edge 3-path join, no
    orientation pipeline): each triangle (a<b<c) contributes one corner
    row per vertex; lcc = 2t / (deg (deg-1))."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH raw AS ({raw_sql}),
und AS (
    SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
    FROM raw WHERE src <> dst
),
deg AS (
    SELECT v, count(*) AS degree FROM (
        SELECT src AS v FROM und UNION ALL SELECT dst AS v FROM und
    ) GROUP BY v
),
tri AS (
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM und e1
    JOIN und e2 ON e1.dst = e2.src
    JOIN und e3 ON e1.src = e3.src AND e2.dst = e3.dst
),
corners AS (
    SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
tcnt AS (SELECT v, count(*) AS t FROM corners GROUP BY v)
SELECT d.v,
       CAST(coalesce(t, 0) AS BIGINT) AS tri_count,
       CASE WHEN d.degree >= 2
            THEN round(CAST(coalesce(t, 0) AS DOUBLE) * 2 / (d.degree * (d.degree - 1)), 6)
            ELSE CAST(0 AS DOUBLE) END AS lcc
FROM deg d LEFT JOIN tcnt ON d.v = tcnt.v
""".strip()


def kcore_sql(k: int = 3, rounds: int = 20, raw_sql: str | None = None) -> str:
    """Unrolled peel: each round recomputes degrees and keeps vertices
    with degree >= k. `rounds` must be >= the peel's convergence depth
    (extra rounds are no-ops, so overshooting is safe)."""
    raw_sql = raw_sql or derived_edges_sql()
    # AS MATERIALIZED is load-bearing: each round references the
    # previous round 3 times, so default CTE inlining would expand
    # 3^rounds copies of the base scan
    ctes = [
        f"raw AS ({raw_sql})",
        "e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM raw WHERE src <> dst "
        "UNION ALL SELECT dst AS src, src AS dst FROM raw WHERE src <> dst))",
    ]
    prev = "e0"
    for i in range(1, rounds + 1):
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT src AS v FROM {prev} GROUP BY src HAVING count(*) >= {k})"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM {prev} e "
            f"JOIN k{i} a ON e.src = a.v JOIN k{i} b ON e.dst = b.v)"
        )
        prev = f"e{i}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT src AS v, count(*) AS core_degree FROM {prev} GROUP BY src"
    )


def _und_cte(raw_sql: str) -> str:
    """Canonical undirected edges (src < dst), cleaned."""
    return (
        f"raw AS ({raw_sql}),\n"
        "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src, "
        "greatest(src, dst) AS dst FROM raw WHERE src <> dst)"
    )


_SUPPORT_TMPL = """{sup} AS MATERIALIZED (
    SELECT u AS src, v AS dst, count(*) AS s FROM (
        SELECT t.a AS u, t.b AS v FROM {tri} t
        UNION ALL SELECT t.a, t.c FROM {tri} t
        UNION ALL SELECT t.b, t.c FROM {tri} t
    ) GROUP BY u, v
)"""


def _tri_cte(name: str, edges: str) -> str:
    """All triangles (a < b < c) of a canonical edge relation, each
    exactly once (the textbook 3-way join on canonical edges)."""
    return f"""{name} AS MATERIALIZED (
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM {edges} e1
    JOIN {edges} e2 ON e1.dst = e2.src
    JOIN {edges} e3 ON e3.src = e1.src AND e3.dst = e2.dst
)"""


def edge_support_sql(raw_sql: str | None = None) -> str:
    """Per-edge triangle support over the canonical undirected graph."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH {_und_cte(raw_sql)},
{_tri_cte('tri', 'und')},
{_SUPPORT_TMPL.format(sup='sup', tri='tri')}
SELECT e.src, e.dst, CAST(coalesce(s.s, 0) AS BIGINT) AS support
FROM und e LEFT JOIN sup s ON e.src = s.src AND e.dst = s.dst
""".strip()


def triangle_list_sql(limit: int = 100, raw_sql: str | None = None) -> str:
    """First `limit` triangles in (a, b, c) lexicographic order."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH {_und_cte(raw_sql)},
{_tri_cte('tri', 'und')}
SELECT a, b, c FROM tri ORDER BY a, b, c LIMIT {limit}
""".strip()


def ktruss_sql(k: int = 5, rounds: int = 6, raw_sql: str | None = None) -> str:
    """Unrolled k-truss peel: each round recomputes per-edge triangle
    support and keeps edges with support >= k-2. `rounds` must be >=
    the peel's convergence depth (extra rounds are no-ops). Final
    support is recomputed against the surviving subgraph, matching
    operators/truss.py::k_truss."""
    raw_sql = raw_sql or derived_edges_sql()
    ctes = [_und_cte(raw_sql)]
    prev = "und"
    for i in range(1, rounds + 1):
        ctes.append(_tri_cte(f"tri{i}", prev))
        ctes.append(_SUPPORT_TMPL.format(sup=f"sup{i}", tri=f"tri{i}"))
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM {prev} e "
            f"LEFT JOIN sup{i} s ON e.src = s.src AND e.dst = s.dst "
            f"WHERE coalesce(s.s, 0) >= {k} - 2)"
        )
        prev = f"e{i}"
    ctes.append(_tri_cte("trif", prev))
    ctes.append(_SUPPORT_TMPL.format(sup="supf", tri="trif"))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT e.src, e.dst, CAST(coalesce(s.s, 0) AS BIGINT) AS support
FROM {prev} e LEFT JOIN supf s ON e.src = s.src AND e.dst = s.dst"""
    )


def random_walks_sql(length: int = 8, raw_sql: str | None = None) -> str:
    """Unrolled deterministic random walks, mirroring
    operators/walks.py::random_walks (same md5-derived step hash,
    same sorted-adjacency indexing)."""
    raw_sql = raw_sql or derived_edges_sql()
    ctes = [
        f"raw AS ({raw_sql})",
        "clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        "sym AS MATERIALIZED (SELECT src, dst FROM clean UNION "
        "SELECT dst, src FROM clean)",
        "adj AS MATERIALIZED (SELECT src AS v, list_sort(list(dst)) AS adj, "
        "count(*) AS deg FROM sym GROUP BY src)",
        "w0 AS (SELECT v AS walk_id, 0 AS step, v FROM adj)",
    ]
    for t in range(1, length + 1):
        h = (
            "('0x' || substr(md5('walk:' || CAST(w.walk_id AS VARCHAR) "
            f"|| ':{t}'), 1, 15))::BIGINT"
        )
        ctes.append(
            f"w{t} AS MATERIALIZED (SELECT w.walk_id, {t} AS step, "
            f"a.adj[CAST({h} % a.deg AS INT) + 1] AS v "
            f"FROM w{t-1} w JOIN adj a ON w.v = a.v)"
        )
    union = "\nUNION ALL ".join(
        f"SELECT walk_id, CAST(step AS BIGINT) AS step, v FROM w{t}"
        for t in range(0, length + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


def sample_neighbors_sql(k: int = 5, raw_sql: str | None = None) -> str:
    """Mirrors operators/walks.py::sample_neighbors (same md5 rank)."""
    raw_sql = raw_sql or derived_edges_sql()
    h = (
        "('0x' || substr(md5('nbr:' || CAST(src AS VARCHAR) || ':' || "
        "CAST(dst AS VARCHAR)), 1, 15))::BIGINT"
    )
    return f"""
WITH raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst, src FROM clean
),
ranked AS (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY {h}, dst) AS rn,
           count(*) OVER (PARTITION BY src) AS deg
    FROM sym
)
SELECT src AS v, CAST(deg AS BIGINT) AS deg, dst AS nbr
FROM ranked WHERE rn <= {k}
""".strip()


def node2vec_walks_sql(
    length: int = 5,
    return_w: int = 1,
    common_w: int = 2,
    other_w: int = 4,
    raw_sql: str | None = None,
) -> str:
    """Unrolled second-order biased walks, mirroring
    operators/walks.py::node2vec_walks (integer weight ladder, md5
    step hash, prev-adjacency flag via left join)."""
    raw_sql = raw_sql or derived_edges_sql()
    ctes = [
        f"raw AS ({raw_sql})",
        "clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        "sym AS MATERIALIZED (SELECT src, dst FROM clean UNION "
        "SELECT dst, src FROM clean)",
        "s0 AS (SELECT DISTINCT src AS walk_id, src AS prev, src AS cur FROM sym)",
    ]
    for t in range(1, length + 1):
        h = (
            "('0x' || substr(md5('n2v:' || CAST(walk_id AS VARCHAR) "
            f"|| ':{t}'), 1, 15))::BIGINT"
        )
        ctes.append(
            f"""cand{t} AS MATERIALIZED (
    SELECT s.walk_id, s.cur, e.dst AS nbr,
           CASE WHEN e.dst = s.prev THEN {return_w}
                WHEN c.src IS NOT NULL THEN {common_w}
                ELSE {other_w} END AS w
    FROM s{t-1} s
    JOIN sym e ON e.src = s.cur
    LEFT JOIN sym c ON c.src = s.prev AND c.dst = e.dst
)"""
        )
        ctes.append(
            f"""s{t} AS MATERIALIZED (
    SELECT walk_id, cur AS prev, nbr AS cur FROM (
        SELECT walk_id, cur, nbr, w,
               sum(w) OVER (PARTITION BY walk_id ORDER BY nbr
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               sum(w) OVER (PARTITION BY walk_id) AS tot
        FROM cand{t}
    )
    WHERE {h} % tot >= cum - w AND {h} % tot < cum
)"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT walk_id, CAST({t} AS BIGINT) AS step, cur AS v FROM s{t}"
        for t in range(0, length + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


def butterfly_sql(raw_sql: str | None = None) -> str:
    """4-cycle (butterfly) count via the diagonal codegree formula,
    mirroring operators/motifs.py::butterfly_count."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH {_und_cte(raw_sql)},
inc AS (
    SELECT src AS c, dst AS e FROM und
    UNION ALL
    SELECT dst AS c, src AS e FROM und
),
codeg AS (
    SELECT l.e AS u, r.e AS v, count(*) AS w
    FROM inc l JOIN inc r ON l.c = r.c AND l.e < r.e
    GROUP BY l.e, r.e
)
SELECT CAST(coalesce(sum(w), 0) AS BIGINT) AS wedge_pairs,
       CAST(count(*) AS BIGINT) AS coneighbor_pairs,
       CAST(coalesce(sum(w * (w - 1) // 2), 0) // 2 AS BIGINT) AS four_cycles
FROM codeg
""".strip()


def tetrahedron_sql(raw_sql: str | None = None) -> str:
    """Mirrors operators/motifs.py::tetrahedron_count — ordered K4
    extension of the canonical triangle join."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH {_und_cte(raw_sql)},
{_tri_cte('tri', 'und')},
k4 AS (
    SELECT count(*) AS tetrahedra
    FROM tri
    JOIN und ecd ON ecd.src = tri.c
    JOIN und ead ON ead.src = tri.a AND ead.dst = ecd.dst
    JOIN und ebd ON ebd.src = tri.b AND ebd.dst = ecd.dst
),
t AS (SELECT count(*) AS triangles FROM tri)
SELECT CAST(triangles AS BIGINT) AS triangles,
       CAST(tetrahedra AS BIGINT) AS tetrahedra
FROM t CROSS JOIN k4
""".strip()


def bipartite_projection_sql(
    k: int = 50, min_weight: int = 2, raw_sql: str | None = None
) -> str:
    """Mirrors operators/motifs.py::bipartite_projection over the
    lineitem (orderkey, partkey) bipartite relation."""
    raw_sql = raw_sql or (
        "SELECT l_orderkey AS left, l_partkey AS right FROM lineitem"
    )
    return f"""
WITH raw AS ({raw_sql}),
inc AS MATERIALIZED (SELECT DISTINCT "left" AS l, "right" AS r FROM raw),
proj AS (
    SELECT a.r AS u, b.r AS v, count(*) AS weight
    FROM inc a JOIN inc b ON a.l = b.l AND a.r < b.r
    GROUP BY a.r, b.r
    HAVING count(*) >= {min_weight}
)
SELECT u, v, CAST(weight AS BIGINT) AS weight
FROM proj ORDER BY weight DESC, u, v LIMIT {k}
""".strip()


def reciprocity_sql(raw_sql: str | None = None) -> str:
    """Directed reciprocity in integer ppm, mirroring
    operators/motifs.py::reciprocity."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH raw AS ({raw_sql}),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
r AS (SELECT count(*) AS n_reciprocal FROM e
      WHERE EXISTS (SELECT 1 FROM e f WHERE f.src = e.dst AND f.dst = e.src)),
n AS (SELECT count(*) AS n_edges FROM e)
SELECT CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_reciprocal AS BIGINT) AS n_reciprocal,
       CAST((n_reciprocal * 1000000) // n_edges AS BIGINT) AS reciprocity_ppm
FROM n CROSS JOIN r
""".strip()


def assortativity_sql(raw_sql: str | None = None) -> str:
    """Degree assortativity from exact integer sufficient statistics,
    mirroring operators/graph.py::degree_assortativity (identical
    double expression over identical bigint moments)."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
deg AS (SELECT src AS v, count(*) AS degree FROM sym GROUP BY src),
ends AS (
    SELECT dx.degree AS x, dy.degree AS y
    FROM sym JOIN deg dx ON sym.src = dx.v JOIN deg dy ON sym.dst = dy.v
),
stats AS (
    SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS pxy, sum(x * x) AS pxx, sum(y * y) AS pyy
    FROM ends
)
SELECT CAST(n AS BIGINT) AS n_edge_ends,
       CAST(n * pxy - sx * sy AS DOUBLE) AS sxy,
       CAST(n * pxx - sx * sx AS DOUBLE) AS sxx,
       round(CAST(n * pxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * pxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * pyy - sy * sy AS DOUBLE))), 6) AS assortativity
FROM stats
""".strip()


def neighbor_degree_curve_sql(raw_sql: str | None = None) -> str:
    """Mirrors operators/graph.py::neighbor_degree_curve."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
deg AS (SELECT src AS v, count(*) AS degree FROM sym GROUP BY src),
ends AS (
    SELECT dx.degree AS x, dy.degree AS y
    FROM sym JOIN deg dx ON sym.src = dx.v JOIN deg dy ON sym.dst = dy.v
),
per_degree AS (
    SELECT x AS degree, sum(y) AS sum_nbr_deg, count(*) AS n_ends
    FROM ends GROUP BY x
),
nv AS (SELECT degree, count(*) AS n_vertices FROM deg GROUP BY degree)
SELECT per_degree.degree,
       CAST(n_vertices AS BIGINT) AS n_vertices,
       CAST((sum_nbr_deg * 1000000) // n_ends AS BIGINT) AS avg_nbr_degree_micro
FROM per_degree JOIN nv ON per_degree.degree = nv.degree
""".strip()


def simhash_near_pairs_sql(
    bits: int = 32, max_hamming: int = 3, bands: int = 4
) -> str:
    """Mirrors simhash_near_pairs: banded candidates over the simhash
    signature, exact Hamming filter via xor + bit_count."""
    rows = bits // bands
    mask = (1 << rows) - 1
    base = simhash_sql(bits)  # "WITH tok AS (...) ... SELECT doc_id, (...) AS simhash FROM bits"
    return f"""
WITH sig AS ({base}),
banded AS (
    SELECT doc_id, simhash, b, (simhash >> (b * {rows})) & {mask} AS band
    FROM sig, range({bands}) t(b)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
                    a.simhash AS sa, c.simhash AS sb
    FROM banded a JOIN banded c ON a.b = c.b AND a.band = c.band
                              AND a.doc_id < c.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
""".strip()


def hits_sql(raw_sql: str, num_iters: int, ndigits: int = 6) -> str:
    """HITS with `num_iters` iterations unrolled as chained CTEs
    (same generation style as pagerank_sql). Semantics identical to
    operators/hits.py: distinct self-loop-free directed edges,
    a0 = h0 = 1, authorities update first, each half-step
    L2-normalized, output rounded to `ndigits`."""
    ctes = [
        f"raw AS ({raw_sql})",
        "e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        "vs AS (SELECT src AS v FROM e UNION SELECT dst AS v FROM e)",
        "h0 AS (SELECT v, CAST(1 AS DOUBLE) AS hub FROM vs)",
    ]
    prev_h = "h0"
    final_a = None
    for k in range(1, num_iters + 1):
        ctes.append(
            f"ar{k} AS (SELECT vs.v, coalesce(s.x, 0.0) AS x FROM vs "
            f"LEFT JOIN (SELECT e.dst AS v, sum(h.hub) AS x FROM e "
            f"JOIN {prev_h} h ON h.v = e.src GROUP BY e.dst) s USING (v))"
        )
        ctes.append(f"an{k} AS (SELECT sqrt(sum(x * x)) AS nrm FROM ar{k})")
        ctes.append(
            f"a{k} AS (SELECT v, CASE WHEN nrm > 0 THEN x / nrm ELSE 0.0 END "
            f"AS authority FROM ar{k} CROSS JOIN an{k})"
        )
        ctes.append(
            f"hr{k} AS (SELECT vs.v, coalesce(s.x, 0.0) AS x FROM vs "
            f"LEFT JOIN (SELECT e.src AS v, sum(a.authority) AS x FROM e "
            f"JOIN a{k} a ON a.v = e.dst GROUP BY e.src) s USING (v))"
        )
        ctes.append(f"hn{k} AS (SELECT sqrt(sum(x * x)) AS nrm FROM hr{k})")
        ctes.append(
            f"h{k} AS (SELECT v, CASE WHEN nrm > 0 THEN x / nrm ELSE 0.0 END "
            f"AS hub FROM hr{k} CROSS JOIN hn{k})"
        )
        prev_h = f"h{k}"
        final_a = f"a{k}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT h.v,
       round(h.hub, {ndigits}) AS hub,
       round(a.authority, {ndigits}) AS authority
FROM {prev_h} h JOIN {final_a} a USING (v)
""".rstrip()
    )


def salsa_sql(raw_sql: str, num_iters: int, ndigits: int = 6) -> str:
    """Mirrors operators/salsa.py — the stochastic hub/authority
    chains unrolled as chained CTEs. Degrees are loop constants;
    a_0 = 1/|A| on in-degree>0 vertices, h_0 = 1/|H| on out-degree>0
    vertices; per iteration the authority chain runs backward-then-
    forward and the hub chain forward-then-backward, every step
    dividing by the degree the mass leaves through."""
    ctes = [
        f"raw AS ({raw_sql})",
        "e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        "vs AS (SELECT src AS v FROM e UNION SELECT dst AS v FROM e)",
        "outd AS (SELECT src AS v, count(*) AS outd FROM e GROUP BY src)",
        "ind AS (SELECT dst AS v, count(*) AS ind FROM e GROUP BY dst)",
        "a0 AS (SELECT v, 1.0 / (SELECT count(*) FROM ind) AS a FROM ind)",
        "h0 AS (SELECT v, 1.0 / (SELECT count(*) FROM outd) AS h FROM outd)",
    ]
    for k in range(1, num_iters + 1):
        ctes.append(
            f"x{k} AS (SELECT e.src AS v, sum(a.a / i.ind) AS x FROM e"
            f" JOIN a{k - 1} a ON a.v = e.dst"
            f" JOIN ind i ON i.v = e.dst GROUP BY e.src)"
        )
        ctes.append(
            f"a{k} AS (SELECT e.dst AS v, sum(x.x / o.outd) AS a FROM e"
            f" JOIN x{k} x ON x.v = e.src"
            f" JOIN outd o ON o.v = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"y{k} AS (SELECT e.dst AS v, sum(h.h / o.outd) AS y FROM e"
            f" JOIN h{k - 1} h ON h.v = e.src"
            f" JOIN outd o ON o.v = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"h{k} AS (SELECT e.src AS v, sum(y.y / i.ind) AS h FROM e"
            f" JOIN y{k} y ON y.v = e.dst"
            f" JOIN ind i ON i.v = e.dst GROUP BY e.src)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT vs.v,
       round(coalesce(h.h, 0.0), {ndigits}) AS hub,
       round(coalesce(a.a, 0.0), {ndigits}) AS authority
FROM vs LEFT JOIN h{num_iters} h ON h.v = vs.v
LEFT JOIN a{num_iters} a ON a.v = vs.v
""".rstrip()
    )


def mis_sql(raw_sql: str, num_rounds: int, coloring: bool = False) -> str:
    """Mirrors operators/mis.py: deterministic Luby with the
    md5-prefix * 2^31 + id total-order priority, unrolled as
    MATERIALIZED CTE rounds. `coloring=False` removes selected
    vertices AND their neighbors each round (MIS); `coloring=True`
    removes only the selected vertices (Jones-Plassmann greedy
    coloring). Overshooting rounds select nothing from an empty
    active set, so the engine's early exit is safe."""
    ctes = [
        f"raw AS ({raw_sql})",
        "clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        "e AS (SELECT src, dst FROM clean "
        "UNION SELECT dst AS src, src AS dst FROM clean)",
        "a0 AS (SELECT DISTINCT src AS v, "
        "('0x' || substr(md5(CAST(src AS VARCHAR)), 1, 8))::BIGINT "
        "* 2147483648 + src AS p FROM e)",
    ]
    sels = []
    for k in range(1, num_rounds + 1):
        prev = f"a{k - 1}"
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT a.v, {k} AS round FROM {prev} a "
            f"LEFT JOIN (SELECT e.src AS v, min(d.p) AS mn FROM e "
            f"JOIN {prev} s ON s.v = e.src JOIN {prev} d ON d.v = e.dst "
            f"GROUP BY e.src) nb USING (v) "
            f"WHERE nb.mn IS NULL OR a.p < nb.mn)"
        )
        drop = f"SELECT v FROM s{k}"
        if not coloring:
            drop += (
                f" UNION SELECT e.dst AS v FROM e "
                f"JOIN s{k} s ON s.v = e.src"
            )
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT a.v, a.p FROM {prev} a "
            f"WHERE a.v NOT IN ({drop}))"
        )
        sels.append(f"SELECT v, round FROM s{k}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(sels)


def eigencentrality_sql(raw_sql: str, num_iters: int, ndigits: int = 6) -> str:
    """Eigenvector centrality (power iteration on the symmetric simple
    graph) with `num_iters` iterations unrolled as chained CTEs, same
    generation style as hits_sql. Semantics identical to
    operators/eigencentrality.py: sym = distinct both-direction
    self-loop-free edges, x0 = 1 for every incident vertex, each step
    x'(v) = sum of neighbor scores then L2 normalization. Because sym
    is symmetric every vertex has a neighbor, so the per-step aggregate
    already covers the whole vertex set (no left-join backfill)."""
    ctes = [
        f"raw AS ({raw_sql})",
        "e AS (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM raw WHERE src <> dst "
        "UNION ALL SELECT dst AS src, src AS dst FROM raw WHERE src <> dst))",
        "x0 AS (SELECT DISTINCT src AS v, CAST(1 AS DOUBLE) AS score FROM e)",
    ]
    prev = "x0"
    for k in range(1, num_iters + 1):
        ctes.append(
            f"xr{k} AS (SELECT e.dst AS v, sum(p.score) AS x FROM e "
            f"JOIN {prev} p ON p.v = e.src GROUP BY e.dst)"
        )
        ctes.append(f"xn{k} AS (SELECT sqrt(sum(x * x)) AS nrm FROM xr{k})")
        ctes.append(
            f"x{k} AS (SELECT v, CASE WHEN nrm > 0 THEN x / nrm ELSE 0.0 END "
            f"AS score FROM xr{k} CROSS JOIN xn{k})"
        )
        prev = f"x{k}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v, round(score, {ndigits}) AS score FROM {prev}"
    )


def _pagerank_ctes(
    raw_sql: str,
    num_iters: int,
    damping: float = 0.85,
    sources: list[int] | None = None,
    weighted: bool = False,
) -> list[str]:
    """Shared CTE chain of pagerank_sql / pagerank_residuals_sql:
    raw → e → vs/nn/od → r0 … r{num_iters} unrolled power iteration."""
    d = damping
    if weighted:
        e_cte = "e AS (SELECT src, dst, SUM(w) AS w FROM raw GROUP BY src, dst)"
        od_sub = "SELECT src AS v, SUM(w) AS outdeg FROM e GROUP BY src"
        share = "sum(p.pr * e.w / od.outdeg)"
    else:
        e_cte = "e AS (SELECT DISTINCT src, dst FROM raw)"
        od_sub = "SELECT src AS v, count(*) AS outdeg FROM e GROUP BY src"
        share = "sum(p.pr / od.outdeg)"
    if sources is not None:
        srcs = ", ".join(str(int(x)) for x in sources)
        w = repr(1.0 / len(sources))
        s_of = lambda v: (  # noqa: E731
            f"(CASE WHEN {v} IN ({srcs}) THEN CAST({w} AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)"
        )
        r0 = f"r0 AS (SELECT v, {s_of('v')} AS pr FROM vs)"
        step = (
            f"(1.0 - {d}) * {s_of('od.v')}"
            f" + {d} * (coalesce(c.contrib, 0.0) + dang.dangling * {s_of('od.v')}) AS pr"
        )
    else:
        r0 = "r0 AS (SELECT v, 1.0 / nn.n AS pr FROM vs CROSS JOIN nn)"
        step = (
            f"(1.0 - {d}) / nn.n"
            f" + {d} * (coalesce(c.contrib, 0.0) + dang.dangling / nn.n) AS pr"
        )
    ctes = [
        f"raw AS ({raw_sql})",
        e_cte,
        "vs AS (SELECT src AS v FROM e UNION SELECT dst AS v FROM e)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vs)",
        f"""od AS (
            SELECT vs.v, coalesce(o.outdeg, 0) AS outdeg
            FROM vs LEFT JOIN (
                {od_sub}
            ) o ON o.v = vs.v
        )""",
        r0,
    ]
    for i in range(1, num_iters + 1):
        prev = f"r{i - 1}"
        ctes.append(
            f"""r{i} AS (
            SELECT od.v AS v,
                   {step}
            FROM od
            CROSS JOIN nn
            CROSS JOIN (
                SELECT coalesce(sum(p.pr), 0.0) AS dangling
                FROM {prev} p JOIN od ON od.v = p.v WHERE od.outdeg = 0
            ) dang
            LEFT JOIN (
                SELECT e.dst AS v, {share} AS contrib
                FROM e
                JOIN {prev} p ON p.v = e.src
                JOIN od ON od.v = e.src
                GROUP BY e.dst
            ) c ON c.v = od.v
        )"""
        )
    return ctes


def pagerank_sql(
    raw_sql: str,
    num_iters: int,
    damping: float = 0.85,
    ndigits: int = 6,
    sources: list[int] | None = None,
    weighted: bool = False,
) -> str:
    """PageRank with `num_iters` iterations UNROLLED as chained CTEs —
    DuckDB's recursive CTEs can't aggregate over the recursive
    relation, so the power iteration is generated iteration by
    iteration. Semantics identical to operators/pagerank.py,
    including the personalized variant when `sources` is given
    (teleport + dangling mass to the source set) and the weighted
    variant when `weighted` (raw must carry `w`; duplicate (src, dst)
    rows sum their weights, link share = w / Σ outgoing w).
    Output rounded to `ndigits` so Spark/DuckDB float noise doesn't
    break the driver's exact value-hash."""
    ctes = _pagerank_ctes(raw_sql, num_iters, damping, sources, weighted)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v, round(pr, {ndigits}) AS pr FROM r{num_iters}"
    )


def pagerank_residuals_sql(
    raw_sql: str,
    num_iters: int,
    damping: float = 0.85,
    ndigits: int = 6,
) -> str:
    """Mirrors operators/pagerank.py::pagerank_convergence: the same
    unrolled power-iteration chain, emitting per-iteration L1 deltas
    (iter, l1_residual = round(Σ_v |r_i − r_{i−1}|, ndigits))."""
    ctes = _pagerank_ctes(raw_sql, num_iters, damping)
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS iter,"
        f" round((SELECT sum(abs(a.pr - b.pr))"
        f" FROM r{i} a JOIN r{i - 1} b ON a.v = b.v), {ndigits})"
        f" AS l1_residual"
        for i in range(1, num_iters + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rows


def pagerank_topics_sql(
    raw_sql: str,
    topics: dict[str, list[int]],
    num_iters: int,
    damping: float = 0.85,
    ndigits: int = 6,
) -> str:
    """Mirrors operators/pagerank.py::pagerank_topics — per-topic
    semantics are exactly the personalized pagerank unrolling, so the
    oracle is one materialized personalized-PR CTE per topic, unioned
    with the topic literal. (The ENGINE batches all topics into one
    loop — one edge shuffle per iteration total — but the fixed point
    per topic is identical to T independent runs, which is what this
    SQL certifies.)"""
    ctes = []
    rows = []
    for i, (t, seeds) in enumerate(topics.items()):
        prq = pagerank_sql(raw_sql, num_iters, damping, ndigits, sources=seeds)
        ctes.append(f"topic_{i} AS MATERIALIZED ({prq})")
        lit = t.replace("'", "''")
        rows.append(f"SELECT v, '{lit}' AS topic, pr FROM topic_{i}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rows)


def spam_mass_sql(
    raw_sql: str,
    num_iters: int,
    trusted: list[int],
    damping: float = 0.85,
    ndigits: int = 6,
) -> str:
    """Mirrors operators/pagerank.py::spam_mass — the two pagerank
    unrollings as nested CTEs, ratio computed from the already-rounded
    (cross-engine bit-identical) doubles."""
    prq = pagerank_sql(raw_sql, num_iters, damping, ndigits)
    trq = pagerank_sql(raw_sql, num_iters, damping, ndigits, sources=trusted)
    return f"""
WITH prq AS MATERIALIZED ({prq}),
trq AS MATERIALIZED ({trq})
SELECT prq.v,
       prq.pr AS pr,
       trq.pr AS trust,
       CASE WHEN prq.pr > 0
            THEN round((prq.pr - trq.pr) / prq.pr, {ndigits}) END AS spam_mass
FROM prq JOIN trq ON trq.v = prq.v
""".strip()


def components_sql(raw_sql: str) -> str:
    """Component = min reachable vertex id, via recursive reachability
    closure — independent of our HashMin formulation."""
    return f"""
WITH RECURSIVE raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
vs AS (SELECT DISTINCT src AS v FROM sym),
walk(v, root) AS (
    SELECT v, v FROM vs
    UNION
    SELECT e.dst AS v, walk.root
    FROM walk JOIN sym e ON e.src = walk.v
)
SELECT v, min(root) AS component FROM walk GROUP BY v
""".strip()


def _directed_closure_cte(raw_sql: str) -> str:
    """Shared CTE prefix: cleaned directed edges, induced vertex set,
    transitive closure `reach(v,u)` (v reaches u by a path of length
    ≥ 1), and its reflexive extension `reach_refl`. UNION (not UNION
    ALL) dedups states so the recursion is finite and exact."""
    return f"""
WITH RECURSIVE raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
vs AS (
    SELECT DISTINCT v FROM (
        SELECT src AS v FROM clean UNION SELECT dst FROM clean
    ) t
),
reach(v, u) AS (
    SELECT src, dst FROM clean
    UNION
    SELECT reach.v, e.dst FROM reach JOIN clean e ON e.src = reach.u
),
reach_refl AS (
    SELECT v, u FROM reach UNION SELECT v, v AS u FROM vs
)
""".strip()


def scc_sql(raw_sql: str) -> str:
    """SCC label = min id of the mutually-reachable set — computed from
    the recursive transitive closure, fully independent of the engine's
    coloring/peeling formulation (operators/scc.py)."""
    return f"""
{_directed_closure_cte(raw_sql)},
mutual AS (
    SELECT a.v, a.u FROM reach a JOIN reach b ON a.v = b.u AND a.u = b.v
)
SELECT vs.v, LEAST(vs.v, COALESCE(MIN(m.u), vs.v)) AS scc
FROM vs LEFT JOIN mutual m ON m.v = vs.v
GROUP BY vs.v
""".strip()


def bowtie_sql(raw_sql: str) -> str:
    """Bow-tie class sizes from the same closure: core = largest SCC
    (ties to the smaller scc id), IN/OUT by reachability to/from core,
    TUBE = from-IN ∩ to-OUT among the rest, TENDRIL = exactly one of
    the two, DISCONNECTED otherwise — the class definitions documented
    in operators/bowtie.py, expressed via joins on the closure instead
    of the engine's frontier BFS loops."""
    return f"""
{_directed_closure_cte(raw_sql)},
mutual AS (
    SELECT a.v, a.u FROM reach a JOIN reach b ON a.v = b.u AND a.u = b.v
),
labels AS (
    SELECT vs.v, LEAST(vs.v, COALESCE(MIN(m.u), vs.v)) AS scc
    FROM vs LEFT JOIN mutual m ON m.v = vs.v
    GROUP BY vs.v
),
core AS (
    SELECT v FROM labels
    WHERE scc = (
        SELECT scc FROM (
            SELECT scc, COUNT(*) AS n FROM labels GROUP BY scc
        ) t ORDER BY n DESC, scc ASC LIMIT 1
    )
),
to_core AS (
    SELECT DISTINCT r.v FROM reach_refl r JOIN core c ON r.u = c.v
),
from_core AS (
    SELECT DISTINCT r.u AS v FROM reach_refl r JOIN core c ON r.v = c.v
),
in_set AS (
    -- EXCEPT is rejected inside a RECURSIVE with-list by DuckDB's
    -- parser, so both set differences are anti-joins
    SELECT t.v FROM to_core t LEFT JOIN core c ON c.v = t.v WHERE c.v IS NULL
),
out_set AS (
    SELECT f.v FROM from_core f LEFT JOIN core c ON c.v = f.v WHERE c.v IS NULL
),
from_in AS (
    SELECT DISTINCT r.u AS v FROM reach_refl r JOIN in_set i ON r.v = i.v
),
to_out AS (
    SELECT DISTINCT r.v FROM reach_refl r JOIN out_set o ON r.u = o.v
),
classified AS (
    SELECT vs.v,
        CASE
            WHEN c.v IS NOT NULL THEN 'core'
            WHEN i.v IS NOT NULL THEN 'in'
            WHEN o.v IS NOT NULL THEN 'out'
            WHEN fi.v IS NOT NULL AND t2.v IS NOT NULL THEN 'tube'
            WHEN fi.v IS NOT NULL OR t2.v IS NOT NULL THEN 'tendril'
            ELSE 'disconnected'
        END AS cls
    FROM vs
    LEFT JOIN core c ON c.v = vs.v
    LEFT JOIN in_set i ON i.v = vs.v
    LEFT JOIN out_set o ON o.v = vs.v
    LEFT JOIN from_in fi ON fi.v = vs.v
    LEFT JOIN to_out t2 ON t2.v = vs.v
)
SELECT cls, COUNT(*) AS n_vertices FROM classified GROUP BY cls
""".strip()


def betweenness_sql(
    raw_sql: str,
    num_sources: int = 8,
    max_hops: int = 8,
    ndigits: int = 6,
) -> str:
    """Mirrors operators/betweenness.py::betweenness_sampled — Brandes
    from the `num_sources` smallest vertex ids, hop-truncated at
    `max_hops`, fully UNROLLED: forward BFS levels l0..lH carry
    (s, v, sigma) with a seen-set NOT EXISTS (levels past the
    eccentricity are empty and contribute nothing, matching the
    engine's early break), then the dependency accumulation runs
    deepest-level-first as one chained CTE per level."""
    ctes = [
        f"raw AS ({raw_sql})",
        "clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        "sym AS MATERIALIZED (SELECT src, dst FROM clean"
        " UNION SELECT dst AS src, src AS dst FROM clean)",
        f"srcs AS (SELECT DISTINCT src AS v FROM sym ORDER BY v"
        f" LIMIT {num_sources})",
        "l0 AS (SELECT v AS s, v, CAST(1 AS BIGINT) AS sigma FROM srcs)",
        "seen0 AS (SELECT s, v FROM l0)",
    ]
    for d in range(1, max_hops + 1):
        ctes.append(
            f"l{d} AS MATERIALIZED ("
            f"SELECT l.s, e.dst AS v, SUM(l.sigma) AS sigma"
            f" FROM l{d - 1} l JOIN sym e ON e.src = l.v"
            f" WHERE NOT EXISTS (SELECT 1 FROM seen{d - 1} p"
            f" WHERE p.s = l.s AND p.v = e.dst)"
            f" GROUP BY l.s, e.dst)"
        )
        ctes.append(
            f"seen{d} AS (SELECT s, v FROM seen{d - 1}"
            f" UNION ALL SELECT s, v FROM l{d})"
        )
    H = max_hops
    ctes.append(f"d{H} AS (SELECT s, v, CAST(0 AS DOUBLE) AS delta FROM l{H})")
    for d in range(H - 1, -1, -1):
        ctes.append(
            f"c{d} AS ("
            f"SELECT l.s, l.v,"
            f" SUM(CAST(l.sigma AS DOUBLE) / n.sigma * (1 + n.delta)) AS delta"
            f" FROM l{d} l JOIN sym e ON e.src = l.v"
            f" JOIN (SELECT a.s, a.v, a.sigma, b.delta FROM l{d + 1} a"
            f" JOIN d{d + 1} b ON a.s = b.s AND a.v = b.v) n"
            f" ON n.s = l.s AND n.v = e.dst"
            f" GROUP BY l.s, l.v)"
        )
        ctes.append(
            f"d{d} AS MATERIALIZED ("
            f"SELECT l.s, l.v, COALESCE(c.delta, 0.0) AS delta"
            f" FROM l{d} l LEFT JOIN c{d} c ON c.s = l.s AND c.v = l.v)"
        )
    union = "\nUNION ALL\n".join(
        f"SELECT v, delta FROM d{d}" for d in range(1, H + 1)
    )
    ctes.append("allv AS (SELECT DISTINCT src AS v FROM sym)")
    ctes.append(f"acc AS (SELECT v, SUM(delta) AS b FROM ({union}) GROUP BY v)")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT allv.v, round(COALESCE(acc.b, 0.0), {ndigits})"
        " AS betweenness FROM allv LEFT JOIN acc ON acc.v = allv.v"
    )


def bfs_hops_sql(raw_sql: str, max_hops: int = 10) -> str:
    """BFS shortest hop counts from the minimum vertex id, depth-capped
    recursive reachability: UNION dedups (v, d) states so the recursion
    is finite, MIN(d) per vertex is the BFS distance. Independent of
    the engine's frontier formulation."""
    return f"""
WITH RECURSIVE raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
s AS (SELECT MIN(src) AS sv FROM sym),
reach(v, d) AS (
    -- guard the seed: on a degenerate graph (all self-loops) sym is
    -- empty and MIN(src) is NULL — the engine returns an empty frame,
    -- so the oracle must not emit a (NULL, 0) row
    SELECT sv, 0 FROM s WHERE sv IS NOT NULL
    UNION
    SELECT e.dst AS v, reach.d + 1
    FROM reach JOIN sym e ON e.src = reach.v
    WHERE reach.d < {max_hops}
)
SELECT v, CAST(MIN(d) AS BIGINT) AS hops FROM reach GROUP BY v
""".strip()


def harmonic_sql(
    raw_sql: str, seed_pct: int = 5, max_hops: int = 6
) -> str:
    """Multi-source depth-capped reachability, mirroring
    operators/centrality.py::harmonic_centrality (same md5-threshold
    seed sample, integer micro harmonic sum)."""
    return f"""
WITH RECURSIVE raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
seeds AS (
    SELECT DISTINCT src AS s FROM sym
    WHERE ('0x' || substr(md5('hc:' || CAST(src AS VARCHAR)), 1, 8))::BIGINT
          % 100 < {seed_pct}
),
reach(s, v, d) AS (
    SELECT s, s, 0 FROM seeds
    UNION
    SELECT reach.s, e.dst, reach.d + 1
    FROM reach JOIN sym e ON e.src = reach.v
    WHERE reach.d < {max_hops}
),
dist AS (SELECT s, v, MIN(d) AS hops FROM reach GROUP BY s, v),
agg AS (
    SELECT s AS seed, count(*) AS n_reached,
           sum(1000000 // hops) AS harmonic_micro
    FROM dist WHERE hops > 0 GROUP BY s
)
SELECT seeds.s AS seed,
       CAST(coalesce(n_reached, 0) AS BIGINT) AS n_reached,
       CAST(coalesce(harmonic_micro, 0) AS BIGINT) AS harmonic_micro
FROM seeds LEFT JOIN agg ON seeds.s = agg.seed
""".strip()


def hop_histogram_sql(
    raw_sql: str, seed_pct: int = 5, max_hops: int = 6
) -> str:
    """Mirrors operators/centrality.py::hop_histogram (same sampled
    multi-source reachability as harmonic_sql, grouped by distance)."""
    return f"""
WITH RECURSIVE raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
seeds AS (
    SELECT DISTINCT src AS s FROM sym
    WHERE ('0x' || substr(md5('hc:' || CAST(src AS VARCHAR)), 1, 8))::BIGINT
          % 100 < {seed_pct}
),
reach(s, v, d) AS (
    SELECT s, s, 0 FROM seeds
    UNION
    SELECT reach.s, e.dst, reach.d + 1
    FROM reach JOIN sym e ON e.src = reach.v
    WHERE reach.d < {max_hops}
),
dist AS (SELECT s, v, MIN(d) AS hops FROM reach GROUP BY s, v)
SELECT CAST(hops AS BIGINT) AS hops, CAST(count(*) AS BIGINT) AS n_pairs
FROM dist WHERE hops > 0 GROUP BY hops
""".strip()


def sssp_sql(raw_sql: str, max_rounds: int = 8) -> str:
    """Unrolled Bellman-Ford, mirroring operators/sssp.py::
    weighted_sssp: d_t[v] = min total weight over paths of <= t edges
    (the engine's frontier-only relaxation provably produces the same
    per-round table, see the operator docstring), source = min src."""
    ctes = [
        f"raw AS ({raw_sql})",
        "e AS MATERIALIZED (SELECT src, dst, min(CAST(w AS BIGINT)) AS w "
        "FROM raw WHERE src <> dst GROUP BY src, dst)",
        "s AS (SELECT min(src) AS sv FROM e)",
        "d0 AS (SELECT sv AS v, CAST(0 AS BIGINT) AS dist FROM s "
        "WHERE sv IS NOT NULL)",
    ]
    for t in range(1, max_rounds + 1):
        ctes.append(
            f"r{t} AS MATERIALIZED (SELECT e.dst AS v, "
            f"min(d.dist + e.w) AS cand "
            f"FROM d{t-1} d JOIN e ON e.src = d.v GROUP BY e.dst)"
        )
        ctes.append(
            f"d{t} AS MATERIALIZED (SELECT coalesce(d.v, r.v) AS v, "
            f"CASE WHEN d.dist IS NULL THEN r.cand "
            f"WHEN r.cand IS NULL THEN d.dist "
            f"ELSE least(d.dist, r.cand) END AS dist "
            f"FROM d{t-1} d FULL JOIN r{t} r ON d.v = r.v)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v, CAST(dist AS BIGINT) AS dist FROM d{max_rounds}"
    )


def labelprop_sql(raw_sql: str, num_iters: int) -> str:
    """Synchronous LPA with min-label tie-break, iterations unrolled."""
    ctes = [
        f"raw AS ({raw_sql})",
        "clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        """sym AS (
            SELECT src, dst FROM clean
            UNION
            SELECT dst AS src, src AS dst FROM clean
        )""",
        "l0 AS (SELECT DISTINCT src AS v, src AS label FROM sym)",
    ]
    for i in range(1, num_iters + 1):
        prev = f"l{i - 1}"
        ctes.append(
            f"""l{i} AS (
            SELECT v, label FROM (
                SELECT s.src AS v, p.label AS label,
                       row_number() OVER (
                           PARTITION BY s.src
                           ORDER BY count(*) DESC, p.label ASC
                       ) AS rn
                FROM sym s JOIN {prev} p ON p.v = s.dst
                GROUP BY s.src, p.label
            ) t WHERE rn = 1
        )"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT v, label FROM l{num_iters}"


def louvain_move_sql(raw_sql: str, num_rounds: int = 2) -> str:
    """Mirrors operators/community.py::louvain_move_rounds: singleton
    init, synchronous exact-integer modularity-gain argmax per round
    (score = 2m*k_vc - k_v*sigma_adj in HUGEINT == Spark decimal(38,0)),
    (score DESC, c ASC) tie-break, singleton fallback on score <= 0."""
    ctes = [
        f"raw AS ({raw_sql})",
        "clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        """sym AS (
            SELECT src, dst FROM clean
            UNION
            SELECT dst AS src, src AS dst FROM clean
        )""",
        "deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS kv "
        "FROM sym GROUP BY src)",
        "mm AS (SELECT CAST(count(*) AS HUGEINT) AS m2 FROM sym)",
        "c0 AS (SELECT v, v AS community FROM deg)",
    ]
    for t in range(1, num_rounds + 1):
        prev = f"c{t - 1}"
        ctes.append(
            f"cs{t} AS (SELECT p.community AS c, "
            f"CAST(sum(d.kv) AS HUGEINT) AS sigma "
            f"FROM {prev} p JOIN deg d USING (v) GROUP BY p.community)"
        )
        ctes.append(
            f"sc{t} AS (SELECT s.src AS v, p.community AS c, "
            f"CAST(count(*) AS HUGEINT) AS kvc "
            f"FROM sym s JOIN {prev} p ON p.v = s.dst "
            f"GROUP BY s.src, p.community)"
        )
        ctes.append(
            f"""c{t} AS MATERIALIZED (
            SELECT v, CASE WHEN score > 0 THEN c ELSE v END AS community
            FROM (
                SELECT v, c, score,
                       row_number() OVER (
                           PARTITION BY v ORDER BY score DESC, c ASC
                       ) AS rn
                FROM (
                    SELECT k.v, k.c,
                           mm.m2 * k.kvc
                             - CAST(d.kv AS HUGEINT)
                               * (cs.sigma - CASE WHEN k.c = p.community
                                             THEN d.kv ELSE 0 END) AS score
                    FROM sc{t} k
                    JOIN deg d ON d.v = k.v
                    JOIN {prev} p ON p.v = k.v
                    JOIN cs{t} cs ON cs.c = k.c
                    CROSS JOIN mm
                )
            ) WHERE rn = 1
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v, CAST(community AS BIGINT) AS community "
        f"FROM c{num_rounds}"
    )


def louvain_level2_sql(
    raw_sql: str, num_rounds: int = 2, num_rounds2: int = 2
) -> str:
    """Mirrors louvain_move_rounds -> contract_communities ->
    louvain_move_rounds_weighted (multilevel level 2): strength
    s(v) = non-loop incident weight + 2*loop weight, loops excluded
    from k_vc, keep-current fallback for loop-only vertices."""
    sup = community_contract_sql(raw_sql, num_rounds)
    ctes = [
        f"sup AS ({sup})",
        "lp AS (SELECT ca AS v, CAST(2 * weight AS BIGINT) AS w2 "
        "FROM sup WHERE ca = cb)",
        "nl AS (SELECT ca, cb, weight FROM sup WHERE ca <> cb)",
        "wsym AS (SELECT ca AS src, cb AS dst, weight FROM nl "
        "UNION ALL SELECT cb AS src, ca AS dst, weight FROM nl)",
        "wstr AS (SELECT v, CAST(sum(w2) AS BIGINT) AS sv FROM ("
        "SELECT src AS v, weight AS w2 FROM wsym "
        "UNION ALL SELECT v, w2 FROM lp) GROUP BY v)",
        "wm AS (SELECT CAST(coalesce(sum(sv), 0) AS HUGEINT) AS m2 FROM wstr)",
        "w0 AS (SELECT v, v AS community FROM wstr)",
    ]
    for t in range(1, num_rounds2 + 1):
        prev = f"w{t - 1}"
        ctes.append(
            f"wcs{t} AS (SELECT p.community AS c, "
            f"CAST(sum(s.sv) AS HUGEINT) AS sigma "
            f"FROM {prev} p JOIN wstr s USING (v) GROUP BY p.community)"
        )
        ctes.append(
            f"wsc{t} AS (SELECT e.src AS v, p.community AS c, "
            f"CAST(sum(e.weight) AS HUGEINT) AS kvc "
            f"FROM wsym e JOIN {prev} p ON p.v = e.dst "
            f"GROUP BY e.src, p.community)"
        )
        ctes.append(
            f"""wbest{t} AS (
            SELECT v, CASE WHEN score > 0 THEN c ELSE v END AS cnew
            FROM (
                SELECT v, c, score,
                       row_number() OVER (
                           PARTITION BY v ORDER BY score DESC, c ASC
                       ) AS rn
                FROM (
                    SELECT k.v, k.c,
                           wm.m2 * k.kvc
                             - CAST(s.sv AS HUGEINT)
                               * (cs.sigma - CASE WHEN k.c = p.community
                                             THEN s.sv ELSE 0 END) AS score
                    FROM wsc{t} k
                    JOIN wstr s ON s.v = k.v
                    JOIN {prev} p ON p.v = k.v
                    JOIN wcs{t} cs ON cs.c = k.c
                    CROSS JOIN wm
                )
            ) WHERE rn = 1
        )"""
        )
        ctes.append(
            f"w{t} AS MATERIALIZED (SELECT p.v, "
            f"coalesce(b.cnew, p.community) AS community "
            f"FROM {prev} p LEFT JOIN wbest{t} b ON b.v = p.v)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(v AS BIGINT) AS v, "
        f"CAST(community AS BIGINT) AS community FROM w{num_rounds2}"
    )


def _ppr_push_ctes(
    raw_sql: str,
    alpha_num: int,
    alpha_den: int,
    eps_deg_factor: int,
    num_rounds: int,
) -> list[str]:
    """Shared CTE chain replaying operators/localcluster.py::ppr_push:
    sparse integer-UNIT state, seed-degree-relative threshold
    (EPSU = max(1, UNIT // (f * deg(seed)))), synchronous pushes,
    exact floor-division share/leftover split. Final state CTE is
    s{num_rounds}."""
    unit = 10**12
    ctes = [
        f"raw AS ({raw_sql})",
        "clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        """sym AS (
            SELECT src, dst FROM clean
            UNION
            SELECT dst AS src, src AS dst FROM clean
        )""",
        "deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS kv "
        "FROM sym GROUP BY src)",
        "seedv AS (SELECT v, kv FROM deg ORDER BY kv DESC, v ASC LIMIT 1)",
        f"epsv AS (SELECT greatest(1, {unit} // "
        f"({eps_deg_factor} * kv)) AS e FROM seedv)",
        f"s0 AS (SELECT v, CAST(0 AS BIGINT) AS p, "
        f"CAST({unit} AS BIGINT) AS r FROM seedv)",
    ]
    for t in range(1, num_rounds + 1):
        prev = f"s{t - 1}"
        ctes.append(
            f"frc{t} AS (SELECT v, kv, p_add, "
            f"(r_push - p_add) // kv AS share, "
            f"(r_push - p_add) - ((r_push - p_add) // kv) * kv AS leftover "
            f"FROM (SELECT s.v, d.kv, "
            f"s.r * {alpha_num} // {alpha_den} AS p_add, s.r AS r_push "
            f"FROM {prev} s JOIN deg d USING (v) "
            f"WHERE s.r >= d.kv * (SELECT e FROM epsv)))"
        )
        ctes.append(
            f"""s{t} AS MATERIALIZED (
            SELECT v, CAST(sum(p) AS BIGINT) AS p,
                   CAST(sum(r) AS BIGINT) AS r
            FROM (
                SELECT s.v, s.p + coalesce(f.p_add, 0) AS p,
                       CASE WHEN f.v IS NOT NULL THEN f.leftover
                            ELSE s.r END AS r
                FROM {prev} s LEFT JOIN frc{t} f USING (v)
                UNION ALL
                SELECT e.dst AS v, 0 AS p, f.share AS r
                FROM sym e JOIN frc{t} f ON f.v = e.src
                WHERE f.share > 0
            ) GROUP BY v
        )"""
        )
    return ctes


def ppr_push_sql(
    raw_sql: str,
    alpha_num: int = 15,
    alpha_den: int = 100,
    eps_deg_factor: int = 10_000,
    num_rounds: int = 6,
) -> str:
    ctes = _ppr_push_ctes(
        raw_sql, alpha_num, alpha_den, eps_deg_factor, num_rounds
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v, p, r FROM s{num_rounds}"
    )


def sweep_cut_sql(
    raw_sql: str,
    alpha_num: int = 15,
    alpha_den: int = 100,
    eps_deg_factor: int = 10_000,
    num_rounds: int = 6,
) -> str:
    """Mirrors operators/localcluster.py::sweep_cut composed over
    ppr_push: (q DESC, v ASC) sweep order over the p > 0 support,
    running-sum volume and cut (edge enters at its lower endpoint
    rank, leaves at its higher; out-of-sweep endpoint = +inf), exact
    floor-ppm conductance, zero-denominator prefixes dropped."""
    R = num_rounds
    ctes = _ppr_push_ctes(
        raw_sql, alpha_num, alpha_den, eps_deg_factor, num_rounds
    )
    ctes += [
        f"swept AS (SELECT s.v, s.p, d.kv, s.p * 1000000 // d.kv AS q "
        f"FROM s{R} s JOIN deg d USING (v) WHERE s.p > 0)",
        "rkd AS MATERIALIZED (SELECT v, p, kv, q, "
        "CAST(row_number() OVER (ORDER BY q DESC, v ASC) AS BIGINT) AS rank "
        "FROM swept)",
        "cedges AS (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM clean)",
        "ev AS (SELECT CASE WHEN ra.rank IS NULL THEN rb.rank "
        "WHEN rb.rank IS NULL THEN ra.rank "
        "ELSE least(ra.rank, rb.rank) END AS lo, "
        "CASE WHEN ra.rank IS NOT NULL AND rb.rank IS NOT NULL "
        "THEN greatest(ra.rank, rb.rank) END AS hi "
        "FROM cedges c "
        "LEFT JOIN rkd ra ON ra.v = c.a LEFT JOIN rkd rb ON rb.v = c.b)",
        "delta AS (SELECT rank, CAST(sum(d) AS BIGINT) AS d FROM ("
        "SELECT lo AS rank, 1 AS d FROM ev WHERE lo IS NOT NULL "
        "UNION ALL SELECT hi AS rank, -1 AS d FROM ev WHERE hi IS NOT NULL"
        ") GROUP BY rank)",
        "m2v AS (SELECT CAST(count(*) * 2 AS BIGINT) AS m2 FROM cedges)",
        "sout AS (SELECT r.rank, r.v, r.q, "
        "CAST(sum(r.kv) OVER w AS BIGINT) AS vol, "
        "CAST(sum(coalesce(dl.d, 0)) OVER w AS BIGINT) AS cut "
        "FROM rkd r LEFT JOIN delta dl USING (rank) "
        "WINDOW w AS (ORDER BY r.rank ROWS UNBOUNDED PRECEDING))",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT rank, v, q, vol, cut, "
        "cut * 1000000 // least(vol, m2 - vol) AS cond_ppm "
        "FROM sout CROSS JOIN m2v WHERE least(vol, m2 - vol) > 0"
    )


def community_contract_sql(raw_sql: str, num_rounds: int = 2) -> str:
    """Mirrors operators/community.py::contract_communities composed
    over louvain_move_rounds: canonical clean edges relabeled to
    (community(a), community(b)) ordered pairs, counted — loop rows
    (ca == cb) kept for the next level's modularity."""
    asg = louvain_move_sql(raw_sql, num_rounds)
    return f"""
WITH asg AS ({asg}),
cedges AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM ({raw_sql}) WHERE src <> dst
),
mapped AS (
    SELECT least(coalesce(ma.community, c.a),
                 coalesce(mb.community, c.b)) AS ca,
           greatest(coalesce(ma.community, c.a),
                    coalesce(mb.community, c.b)) AS cb
    FROM cedges c
    LEFT JOIN asg ma ON ma.v = c.a
    LEFT JOIN asg mb ON mb.v = c.b
)
SELECT CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
       CAST(count(*) AS BIGINT) AS weight
FROM mapped GROUP BY ca, cb
""".strip()


# -- ingest pipeline oracles (over the documents-derived pages table) --

_INGEST_CTE = """
WITH pages AS ({pages}),
links AS (
    SELECT url AS src_url,
           unnest(regexp_extract_all(html, '<a href="([^"]+)">', 1)) AS dst_url
    FROM pages
),
urls AS (SELECT url FROM pages UNION SELECT dst_url AS url FROM links),
dict AS (
    SELECT url, CAST(row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS id
    FROM urls
)
""".strip()


def ingest_extract_sql() -> str:
    return f"""
WITH pages AS ({doc_pages_sql()})
SELECT url, regexp_extract(html, '(?s)<main>(.*?)</main>', 1) AS text
FROM pages
""".strip()


def ingest_dictionary_sql() -> str:
    return (
        _INGEST_CTE.format(pages=doc_pages_sql()) + "\nSELECT url, id FROM dict"
    )


def ingest_edges_sql() -> str:
    return (
        _INGEST_CTE.format(pages=doc_pages_sql())
        + """
SELECT ds.id AS src, dd.id AS dst
FROM links
JOIN dict ds ON ds.url = links.src_url
JOIN dict dd ON dd.url = links.dst_url
"""
    )


def host_pagerank_sql(num_iters: int, ndigits: int = 6) -> str:
    """End-to-end composition oracle: pages → link extraction →
    host-graph rollup → host→id dictionary → WEIGHTED PageRank
    (weight = n_links) → join ranks back to host names. The host id
    assignment mirrors assign_contiguous_ids (row_number ordered by
    host, 0-based), the same contract the ingest_dictionary oracle
    checks."""
    hg = host_graph_sql()
    raw = f"""WITH hg AS ({hg}),
hosts AS (SELECT src_host AS host FROM hg UNION SELECT dst_host AS host FROM hg),
ids AS (SELECT host, CAST(row_number() OVER (ORDER BY host) - 1 AS BIGINT) AS id FROM hosts)
SELECT s.id AS src, d.id AS dst, CAST(hg.n_links AS DOUBLE) AS w
FROM hg JOIN ids s ON hg.src_host = s.host JOIN ids d ON hg.dst_host = d.host"""
    pr = pagerank_sql(raw, num_iters, weighted=True, ndigits=ndigits)
    return f"""WITH hgx AS ({hg}),
hostsx AS (SELECT src_host AS host FROM hgx UNION SELECT dst_host AS host FROM hgx),
idsx AS (SELECT host, CAST(row_number() OVER (ORDER BY host) - 1 AS BIGINT) AS id FROM hostsx),
prx AS ({pr})
SELECT idsx.host AS host, prx.pr AS pr FROM prx JOIN idsx ON idsx.id = prx.v"""


# -- training-data pipeline oracles (documents table) --------------------

_NUM_HASHES = 16
_BANDS = 4
_ROWS = _NUM_HASHES // _BANDS

_SHINGLE_CTE = r"""
toks AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
    FROM toks, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
    WHERE len(t) >= 3
)
""".strip()


def _h64(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def kmv_shingles_sql(k: int = 256) -> str:
    """Mirrors operators/sketches.py::kmv_distinct over the corpus's
    distinct 3-gram shingles (same hash, same double expression)."""
    return f"""
WITH {_SHINGLE_CTE},
d AS (SELECT DISTINCT shingle AS val FROM sh WHERE shingle IS NOT NULL),
hs AS (
    SELECT {_h64("'kmv:' || val")} AS h
    FROM d ORDER BY h LIMIT {k}
),
bottom AS (SELECT count(*) AS n_in_sketch, max(h) AS kth FROM hs),
exact AS (SELECT count(*) AS n_exact FROM d),
est AS (
    SELECT n_exact,
           CAST({k} AS BIGINT) AS k,
           kth AS kth_hash,
           CASE WHEN n_in_sketch < {k} THEN CAST(n_in_sketch AS BIGINT)
                ELSE CAST(floor(CAST({k - 1} AS DOUBLE)
                                * 1152921504606846976.0
                                / CAST(kth AS DOUBLE)) AS BIGINT)
           END AS est_distinct
    FROM exact CROSS JOIN bottom
)
SELECT n_exact, k, kth_hash, est_distinct,
       CAST(abs(est_distinct - n_exact) * 1000000
            // greatest(n_exact, 1) AS BIGINT) AS err_ppm
FROM est
""".strip()


def top_ngrams_sql(k: int = 100) -> str:
    """Mirrors operators/textstats.py::top_ngrams (3-grams, document
    frequency, total-order top-k)."""
    return f"""
WITH {_SHINGLE_CTE}
SELECT shingle, CAST(count(*) AS BIGINT) AS n_docs
FROM sh GROUP BY shingle
ORDER BY n_docs DESC, shingle ASC LIMIT {k}
""".strip()


def token_percentiles_sql() -> str:
    """Mirrors operators/textstats.py::token_percentiles — the exact
    discrete (inverse-CDF) rank statistic, no interpolation."""
    return r"""
WITH toks AS (
    SELECT lang,
           CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS t
    FROM documents
),
ranked AS (
    SELECT lang, t,
           row_number() OVER (PARTITION BY lang ORDER BY t) AS rn,
           count(*) OVER (PARTITION BY lang) AS n
    FROM toks
)
SELECT lang,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(min(CASE WHEN rn >= ceil(n * 0.5) THEN t END) AS BIGINT) AS p50_tokens,
       CAST(min(CASE WHEN rn >= ceil(n * 0.9) THEN t END) AS BIGINT) AS p90_tokens,
       CAST(min(CASE WHEN rn >= ceil(n * 0.99) THEN t END) AS BIGINT) AS p99_tokens
FROM ranked GROUP BY lang
""".strip()


def host_graph_sql() -> str:
    """Host-level rollup of the hosted doc-pages link graph — mirrors
    plans/ingest.host_graph over plans/docpages.doc_pages_hosted."""
    from .docpages import doc_pages_hosted_sql

    return f"""
WITH pages AS ({doc_pages_hosted_sql()}),
links AS (
    SELECT url AS src_url,
           unnest(regexp_extract_all(html, '<a href="([^"]+)">', 1)) AS dst_url
    FROM pages
)
SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
       regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host,
       count(*) AS n_links
FROM links GROUP BY 1, 2
""".strip()


def dedup_exact_sql() -> str:
    return """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keeper
FROM documents GROUP BY 1 HAVING count(*) > 1
""".strip()


def prefix_dedup_sql(prefix_tokens: int = 3) -> str:
    """Boilerplate-prefix dedup groups — mirrors
    streaming/dedup.py::dedup_groups(prefix_tokens=n)."""
    return rf"""
SELECT md5(array_to_string(
           list_slice(regexp_split_to_array(trim(lower(text)), '\s+'),
                      1, {prefix_tokens}), ' ')) AS text_hash,
       count(*) AS n_docs, min(doc_id) AS keeper
FROM documents GROUP BY 1 HAVING count(*) > 1
""".strip()


def ngram_jaccard_sql(threshold: float = 0.5, max_shingle_freq: int = 1000) -> str:
    # mirrors ngram_jaccard_pairs' stop-shingle cutoff (default ON):
    # shingles in more than max_shingle_freq docs are dropped before
    # the candidate self-join AND before the per-doc set sizes
    return f"""
WITH {_SHINGLE_CTE},
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_shingle_freq}),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS sz FROM shf GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
    FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE inter / (sa.sz + sb.sz - inter) >= {threshold}
""".strip()


def novelty_sql() -> str:
    """Mirrors operators/dedup.py::novelty_scores (n=3 shingles, the
    shared shingle CTE)."""
    return f"""
WITH {_SHINGLE_CTE},
firstd AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
       CAST(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           * 1000000 // CAST(count(*) AS BIGINT) AS novelty_ppm
FROM sh JOIN firstd USING (shingle)
GROUP BY sh.doc_id
""".strip()


def containment_sql(min_pct: int = 60, max_shingle_freq: int = 1000) -> str:
    """Mirrors operators/dedup.py::containment_pairs — directed
    shingle-containment verdicts, exact integer percent."""
    return f"""
WITH {_SHINGLE_CTE},
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_shingle_freq}),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM shf GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS inter
    FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
joined AS (
    SELECT doc_a, doc_b, inter, sa.sz AS sza, sb.sz AS szb
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
),
directed AS (
    SELECT doc_a AS doc_inner, doc_b AS doc_outer, inter, sza AS sz_inner
    FROM joined
    UNION ALL
    SELECT doc_b AS doc_inner, doc_a AS doc_outer, inter, szb AS sz_inner
    FROM joined
)
SELECT doc_inner, doc_outer, inter, sz_inner,
       inter * 100 // sz_inner AS cont_pct
FROM directed WHERE inter * 100 // sz_inner >= {min_pct}
""".strip()


def minhash_lsh_sql() -> str:
    mins = ",\n           ".join(
        "min(" + _h64(f"'{i}:' || shingle") + f") AS h{i}"
        for i in range(_NUM_HASHES)
    )
    band_rows = []
    for b in range(_BANDS):
        cols = " || ',' || ".join(
            f"CAST(h{b * _ROWS + r} AS VARCHAR)" for r in range(_ROWS)
        )
        band_rows.append(f"SELECT doc_id, md5({cols}) AS band_sig FROM mh")
    bands_union = "\n    UNION ALL\n    ".join(band_rows)
    return f"""
WITH {_SHINGLE_CTE},
mh AS (
    SELECT doc_id,
           {mins}
    FROM sh GROUP BY doc_id
),
bands AS (
    {bands_union}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band_sig = b.band_sig AND a.doc_id < b.doc_id
""".strip()


def simhash_sql(bits: int = 32) -> str:
    bit_sums = ",\n           ".join(
        f"sum(CASE WHEN (th >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits)
    )
    combine = " + ".join(
        f"(CASE WHEN b{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
    FROM documents
),
th AS (SELECT doc_id, {_h64('token')} AS th FROM tok),
bits AS (
    SELECT doc_id,
           {bit_sums}
    FROM th GROUP BY doc_id
)
SELECT doc_id, ({combine}) AS simhash FROM bits
""".strip()


def token_count_sql() -> str:
    return r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens
FROM documents
""".strip()


def lm_score_sql() -> str:
    """Mirrors operators/textstats.py::lm_score — add-one-smoothed
    self-trained bigram model, integer ppm quantized per bigram then
    floor-averaged per document (exact integer arithmetic end to
    end; DuckDB lists are 1-indexed, Spark's transform lambda is
    0-indexed — both enumerate the same n-1 bigrams)."""
    return r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
    FROM documents
),
b AS (
    SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(a) - 1)) AS i)
),
c12 AS (SELECT w1, w2, count(*) AS n12 FROM b GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS n1 FROM b GROUP BY w1),
v AS (
    SELECT count(DISTINCT tok) AS vocab
    FROM (SELECT unnest(a) AS tok FROM toks)
),
scored AS (
    SELECT b.doc_id, ((c12.n12 + 1) * 1000000) // (c1.n1 + v.vocab) AS p_ppm
    FROM b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
),
per_doc AS (
    SELECT doc_id, count(*) AS n_bigrams, sum(p_ppm) AS s
    FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(p.s // p.n_bigrams AS BIGINT) AS avg_p_ppm
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
""".strip()


def lm_buckets_sql(n_buckets: int = 3) -> str:
    """Mirrors operators/textstats.py::lm_buckets — per-lang ntile
    over (score DESC, doc_id ASC); the -1 sentinel for bigram-less
    docs keeps the order null-free (DuckDB and Spark disagree on
    default null placement for ASC)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    lm = lm_score_sql()
    return f"""
WITH scored AS (
    SELECT d.lang, t.doc_id, COALESCE(t.avg_p_ppm, -1) AS score_ppm
    FROM ({lm}) t JOIN documents d ON d.doc_id = t.doc_id
),
ranked AS (
    SELECT lang, score_ppm,
           ntile({n_buckets}) OVER (
               PARTITION BY lang ORDER BY score_ppm DESC, doc_id ASC
           ) AS bucket
    FROM scored
)
SELECT lang,
       CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(score_ppm) AS BIGINT) AS min_ppm,
       CAST(max(score_ppm) AS BIGINT) AS max_ppm
FROM ranked GROUP BY lang, bucket
""".strip()


def repetition_stats_sql() -> str:
    """Mirrors operators/textstats.py::repetition_stats — integer ppm
    arithmetic, identical tokenization regex."""
    return r"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
    FROM documents
),
tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
agg AS (
    SELECT doc_id, sum(c) AS n, count(*) AS d, max(c) AS topc
    FROM tc GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(d AS BIGINT) AS distinct_tokens,
       CAST(((n - d) * 1000000) // n AS BIGINT) AS dup_token_ppm,
       CAST((topc * 1000000) // n AS BIGINT) AS top_token_ppm
FROM agg
""".strip()


def tfidf_top_terms_sql(k: int = 3) -> str:
    """Mirrors operators/textstats.py::tfidf_top_terms — integer idf
    surrogate floor(1e6·N/df), (score desc, term asc) rank."""
    return rf"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_corpus FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           tf.tf * ((n.n_corpus * 1000000) // df.df) AS score
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term ASC
    ) AS rn
    FROM scored
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(score AS BIGINT) AS score
FROM ranked WHERE rn <= {k}
""".strip()


def stratified_sample_sql(pct: int = 20) -> str:
    """Deterministic hash-threshold sample per language stratum —
    md5-derived, the same integer parse both engines agree on."""
    return f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE ('0x' || substr(md5(coalesce(lang, '<null>') || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < {pct}
""".strip()


def corpus_stats_sql() -> str:
    # avg_utokens: exact integer micro-tokens via split div/mod — the
    # same representation-stable arithmetic as the Spark side (a raw
    # rounded double does not survive cross-engine hash
    # canonicalization; see round-3 VERDICT "What's wrong" #1)
    return r"""
WITH agg AS (
    SELECT lang,
           count(*) AS n_docs,
           sum(CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)) AS total_tokens,
           sum(CAST(length(text) AS BIGINT)) AS total_chars
    FROM documents
    GROUP BY lang
)
SELECT lang,
       n_docs,
       total_tokens,
       (total_tokens // n_docs) * 1000000
         + ((total_tokens % n_docs) * 1000000) // n_docs AS avg_utokens,
       total_chars
FROM agg
""".strip()


def rich_club_sql(raw_sql: str, max_k_log2: int = 12) -> str:
    """Mirrors operators/motifs.py::rich_club."""
    return f"""
WITH raw AS ({raw_sql}),
clean AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst),
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS kv FROM (
            SELECT a AS v FROM clean UNION ALL SELECT b AS v FROM clean
        ) GROUP BY v),
ks AS (SELECT CAST(power(2, i) AS BIGINT) AS k
       FROM range({max_k_log2 + 1}) t(i)),
nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_rich
       FROM deg, ks WHERE kv > k GROUP BY k),
ek AS (SELECT k, CAST(count(*) AS BIGINT) AS e_rich
       FROM (SELECT least(da.kv, db.kv) AS kmin FROM clean
             JOIN deg da ON da.v = clean.a JOIN deg db ON db.v = clean.b),
            ks
       WHERE kmin > k GROUP BY k)
SELECT CAST(nk.k AS BIGINT) AS k, n_rich,
       coalesce(e_rich, 0) AS e_rich,
       coalesce(e_rich, 0) * 2000000 // (n_rich * (n_rich - 1)) AS phi_ppm
FROM nk LEFT JOIN ek ON ek.k = nk.k
WHERE n_rich >= 2
""".strip()


def hub_ego_sql(raw_sql: str, top_h: int = 10) -> str:
    """Mirrors operators/motifs.py::hub_ego_stats."""
    return f"""
WITH raw AS ({raw_sql}),
und AS (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
        FROM raw WHERE src <> dst),
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS kv FROM (
            SELECT src AS v FROM und UNION ALL SELECT dst AS v FROM und
        ) GROUP BY v),
hubs AS (SELECT v AS hub, kv AS hub_deg FROM deg
         ORDER BY kv DESC, v ASC LIMIT {top_h}),
inc AS (SELECT src AS v, dst AS nbr FROM und
        UNION ALL SELECT dst AS v, src AS nbr FROM und),
members AS (
    SELECT h.hub, i.nbr AS member FROM inc i JOIN hubs h ON h.hub = i.v
    UNION ALL SELECT hub, hub AS member FROM hubs
),
within AS (
    SELECT m1.hub, CAST(count(*) AS BIGINT) AS ego_edges
    FROM und e
    JOIN members m1 ON m1.member = e.src
    JOIN members m2 ON m2.hub = m1.hub AND m2.member = e.dst
    GROUP BY m1.hub
)
SELECT h.hub,
       CAST(h.hub_deg + 1 AS BIGINT) AS ego_n,
       coalesce(w.ego_edges, 0) AS ego_edges,
       coalesce(w.ego_edges, 0) * 2000000
           // ((h.hub_deg + 1) * h.hub_deg) AS density_ppm
FROM hubs h LEFT JOIN within w ON w.hub = h.hub
""".strip()


def quadrilaterals_sql(raw_sql: str) -> str:
    """Mirrors operators/motifs.py::quadrilateral_count — the diagonal
    identity quads = Σ C(cn,2) / 2 over endpoint pairs."""
    return f"""
WITH raw AS ({raw_sql}),
und AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
    FROM raw WHERE src <> dst
),
inc AS (
    SELECT src AS v, dst AS nbr FROM und
    UNION ALL SELECT dst AS v, src AS nbr FROM und
),
pairs AS MATERIALIZED (
    SELECT a.nbr AS u, b.nbr AS w, CAST(count(*) AS BIGINT) AS c
    FROM inc a JOIN inc b ON a.v = b.v AND a.nbr < b.nbr
    GROUP BY a.nbr, b.nbr
)
SELECT CAST(count(*) AS BIGINT) AS endpoint_pairs,
       CAST(coalesce(sum(c * (c - 1) // 2), 0) // 2 AS BIGINT) AS quads
FROM pairs
""".strip()


def katz_sql(raw_sql: str, num_iters: int = 4, beta_den: int = 8) -> str:
    """Mirrors operators/katz.py::katz_centrality_scaled — walk counts
    unrolled step by step, all arithmetic in HUGEINT (== Spark
    decimal(38,0) widening)."""
    ctes = [
        f"raw AS ({raw_sql})",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw)",
        "vs AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst AS v FROM e)",
        "w0 AS (SELECT v, CAST(1 AS HUGEINT) AS w FROM vs)",
    ]
    for k in range(1, num_iters + 1):
        ctes.append(
            f"""w{k} AS MATERIALIZED (
    SELECT e.dst AS v, CAST(sum(p.w) AS HUGEINT) AS w
    FROM e JOIN w{k - 1} p ON p.v = e.src
    GROUP BY e.dst
)"""
        )
    terms = " + ".join(
        f"coalesce(w{k}.w, 0) * CAST({beta_den ** (num_iters - k)} AS HUGEINT)"
        for k in range(1, num_iters + 1)
    )
    joins = "\n".join(
        f"LEFT JOIN w{k} ON w{k}.v = vs.v" for k in range(1, num_iters + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT vs.v, CAST({terms} AS BIGINT) AS katz_scaled
FROM vs
{joins}
""".rstrip()
    )


def redirects_sql(raw_sql: str, rounds: int = 6) -> str:
    """Mirrors operators/redirects.py::resolve_redirects — identical
    pointer-doubling rounds unrolled as materialized CTEs (each round
    references the previous state twice). Overshooting rounds are
    no-ops: a done row jumps to itself."""
    ctes = [
        f"raw AS ({raw_sql})",
        """red AS MATERIALIZED (
    SELECT src, min(dst) AS dst FROM raw WHERE src <> dst GROUP BY src
)""",
        """univ AS MATERIALIZED (
    SELECT DISTINCT v FROM (
        SELECT src AS v FROM red UNION ALL SELECT dst AS v FROM red
    )
)""",
        """s0 AS MATERIALIZED (
    SELECT u.v,
           coalesce(r.dst, u.v) AS nxt,
           CAST(CASE WHEN r.dst IS NULL THEN 0 ELSE 1 END AS BIGINT) AS hops,
           coalesce(r.dst, u.v) NOT IN (SELECT src FROM red) AS done
    FROM univ u LEFT JOIN red r ON r.src = u.v
)""",
    ]
    for i in range(1, rounds + 1):
        p = f"s{i - 1}"
        ctes.append(
            f"""s{i} AS MATERIALIZED (
    SELECT a.v,
           CASE WHEN a.done THEN a.nxt ELSE b.nxt END AS nxt,
           CASE WHEN a.done THEN a.hops ELSE a.hops + b.hops END AS hops,
           CASE WHEN a.done THEN TRUE ELSE b.done END AS done
    FROM {p} a JOIN {p} b ON b.v = a.nxt
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v AS url,
       CASE WHEN done THEN nxt END AS final_url,
       CASE WHEN done THEN hops END AS hops,
       done AS resolved
FROM s{rounds}
""".rstrip()
    )


def funnel_sql(stages: tuple[str, ...] = ("view", "click", "purchase")) -> str:
    """Mirrors streaming/events.py::funnel — per-user min-ts stage
    reach with ties allowed, exact integer-microsecond lag sums."""
    ctes = [
        f"r1 AS (SELECT user_id, min(ts) AS t1, min(ts) AS tk "
        f"FROM events WHERE event_type = '{stages[0]}' GROUP BY user_id)"
    ]
    selects = [
        "SELECT 1 AS stage, '" + stages[0] + "' AS stage_name, "
        "CAST(count(*) AS BIGINT) AS users, "
        "CAST(coalesce(sum(date_diff('microsecond', t1, tk)), 0) AS BIGINT) "
        "AS total_lag_us FROM r1"
    ]
    for k, st in enumerate(stages[1:], start=2):
        ctes.append(
            f"r{k} AS (SELECT e.user_id, r.t1, min(e.ts) AS tk "
            f"FROM events e JOIN r{k - 1} r ON r.user_id = e.user_id "
            f"WHERE e.event_type = '{st}' AND e.ts >= r.tk "
            f"GROUP BY e.user_id, r.t1)"
        )
        selects.append(
            f"SELECT {k} AS stage, '{st}' AS stage_name, "
            f"CAST(count(*) AS BIGINT) AS users, "
            f"CAST(coalesce(sum(date_diff('microsecond', t1, tk)), 0) AS BIGINT) "
            f"AS total_lag_us FROM r{k}"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT CAST(stage AS BIGINT) AS stage, stage_name, users, "
        "total_lag_us FROM ("
        + " UNION ALL ".join(selects)
        + ")"
    )


def funnel_users_sql() -> str:
    """Mirrors streaming/funnelstate.py::funnel_users_batch (and the
    streaming state machine, which equals it): per-user min-ts reach
    chain in absolute microseconds, -1 sentinels. Spark's session TZ
    is UTC, so unix_micros(cast NTZ) == DuckDB epoch_us(naive)."""
    return """
WITH base AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_type
    FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
r1 AS (SELECT user_id, min(ts_us) AS s1 FROM base
       WHERE event_type = 'view' GROUP BY user_id),
r2 AS (SELECT b.user_id, min(b.ts_us) AS s2
       FROM base b JOIN r1 r USING (user_id)
       WHERE b.event_type = 'click' AND b.ts_us >= r.s1
       GROUP BY b.user_id),
r3 AS (SELECT b.user_id, min(b.ts_us) AS s3
       FROM base b JOIN r2 r USING (user_id)
       WHERE b.event_type = 'purchase' AND b.ts_us >= r.s2
       GROUP BY b.user_id),
u AS (SELECT DISTINCT user_id FROM base)
SELECT u.user_id,
       CAST(coalesce(r1.s1, -1) AS BIGINT) AS s1_us,
       CAST(coalesce(r2.s2, -1) AS BIGINT) AS s2_us,
       CAST(coalesce(r3.s3, -1) AS BIGINT) AS s3_us
FROM u LEFT JOIN r1 USING (user_id) LEFT JOIN r2 USING (user_id)
       LEFT JOIN r3 USING (user_id)
""".strip()


def retention_sql(week_seconds: int = 604_800) -> str:
    """Mirrors streaming/events.py::retention_cohorts — exact integer
    epoch-week arithmetic."""
    return f"""
WITH ev AS (
    SELECT DISTINCT user_id,
           CAST(epoch(ts) AS BIGINT) // {week_seconds} AS week
    FROM events
),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(e.week - c.cohort_week AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS active_users
FROM ev e JOIN cohort c USING (user_id)
GROUP BY 1, 2
""".strip()


def vocab_growth_sql(bucket_size: int = 50) -> str:
    """Mirrors operators/textstats.py::vocab_growth."""
    return rf"""
WITH tok AS (
    SELECT d, term FROM (
        SELECT doc_id AS d,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        FROM documents
    ) WHERE term <> ''
),
firstd AS (SELECT term, min(d) AS first_doc FROM tok GROUP BY term),
pb AS (SELECT first_doc // {bucket_size} AS bucket,
              CAST(count(*) AS BIGINT) AS new_terms
       FROM firstd GROUP BY 1),
db AS (SELECT doc_id // {bucket_size} AS bucket,
              CAST(count(*) AS BIGINT) AS n_docs
       FROM documents GROUP BY 1)
SELECT CAST(db.bucket AS BIGINT) AS bucket,
       CAST(sum(n_docs) OVER w AS BIGINT) AS docs_cum,
       coalesce(new_terms, 0) AS new_terms,
       CAST(sum(coalesce(new_terms, 0)) OVER w AS BIGINT) AS vocab_cum
FROM db LEFT JOIN pb USING (bucket)
WINDOW w AS (ORDER BY db.bucket ROWS UNBOUNDED PRECEDING)
""".strip()


def lang_id_sql() -> str:
    from ..operators.textstats import LANG_ORDER, STOPWORDS

    score_exprs = {
        lang: (
            "len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')), "
            + "["
            + ", ".join(f"'{w}'" for w in STOPWORDS[lang])
            + "]))"
        )
        for lang in LANG_ORDER
    }
    # fold argmax with the same tie-break as the Spark side
    lang_expr = f"'{LANG_ORDER[0]}'"
    score_expr = f"s_{LANG_ORDER[0]}"
    for lang in LANG_ORDER[1:]:
        lang_expr = f"CASE WHEN s_{lang} > {score_expr} THEN '{lang}' ELSE {lang_expr} END"
        score_expr = f"CASE WHEN s_{lang} > {score_expr} THEN s_{lang} ELSE {score_expr} END"
    scores_select = ",\n           ".join(
        f"{score_exprs[lang]} AS s_{lang}" for lang in LANG_ORDER
    )
    return f"""
WITH scored AS (
    SELECT doc_id,
           {scores_select}
    FROM documents
)
SELECT doc_id, {lang_expr} AS lang_pred, CAST({score_expr} AS BIGINT) AS lang_score
FROM scored
""".strip()


def lang_confusion_sql() -> str:
    """Mirrors operators/textstats.py::lang_confusion — lang_id_sql's
    prediction joined to the coalesced truth label, counted."""
    return f"""
WITH pred AS ({lang_id_sql()})
SELECT coalesce(CAST(d.lang AS VARCHAR), '<null>') AS lang_true,
       p.lang_pred,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2
""".strip()


def quality_score_sql() -> str:
    return r"""
WITH base AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
           length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS alnum_len,
           length(regexp_replace(text, ' +', '', 'g')) AS nospace_len
    FROM documents
),
ratios AS (
    SELECT doc_id, n_chars, n_tokens,
           round(nospace_len / greatest(n_tokens, 1), 6) AS mean_token_len,
           round((n_chars - alnum_len) / greatest(n_chars, 1), 6) AS punct_ratio
    FROM base
)
SELECT doc_id, n_chars, n_tokens, mean_token_len, punct_ratio,
       round(least(n_tokens / 100.0, 1.0) * (1.0 - punct_ratio), 6) AS score
FROM ratios
""".strip()


def corpus_mix_report_sql(min_score: float = 0.5) -> str:
    """Mirrors operators/textstats.py::corpus_mix_report — the same
    fingerprint keepers, rounded-score threshold, and integer ppm."""
    return rf"""
WITH base AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
           length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS alnum_len
    FROM documents
),
q AS (
    SELECT doc_id, n_tokens,
           round(least(n_tokens / 100.0, 1.0)
                 * (1.0 - round((n_chars - alnum_len) / greatest(n_chars, 1), 6)),
                 6) AS score
    FROM base
),
fp AS (
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g'))) AS fp
    FROM documents
),
keepers AS (SELECT fp, min(doc_id) AS doc_id FROM fp GROUP BY fp),
flagged AS (
    SELECT d.lang, d.source, q.n_tokens,
           (k.doc_id IS NOT NULL AND q.score >= {min_score}) AS kept
    FROM documents d
    JOIN q ON d.doc_id = q.doc_id
    LEFT JOIN keepers k ON d.doc_id = k.doc_id
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(CASE WHEN kept THEN n_tokens END), 0) AS BIGINT) AS kept_tokens,
       CAST((sum(CASE WHEN kept THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS kept_ppm
FROM flagged GROUP BY lang, source
""".strip()


def fingerprint_sql() -> str:
    return r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
FROM documents
""".strip()


def filtered_corpus_sql(min_score: float = 0.5, langs: list[str] | None = None) -> str:
    """Mirrors textstats.filtered_corpus: exact-dedup keepers ∩
    quality threshold ∩ optional language allowlist, one statement."""
    lang_pred = ""
    if langs is not None:
        quoted = ", ".join(f"'{x}'" for x in langs)
        lang_pred = f" AND d.lang IN ({quoted})"
    return rf"""
WITH fp AS (
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
    FROM documents
),
keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
base AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
           length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS alnum_len
    FROM documents
),
q AS (
    SELECT doc_id, n_tokens,
           round(least(n_tokens / 100.0, 1.0)
                 * (1.0 - round((n_chars - alnum_len) / greatest(n_chars, 1), 6)), 6) AS score
    FROM base
)
SELECT d.doc_id, d.lang, q.n_tokens, q.score
FROM documents d
JOIN keep USING (doc_id)
JOIN q USING (doc_id)
WHERE q.score >= {min_score}{lang_pred}
""".strip()


# -- similarity-search oracles (embeddings table) -------------------------


def cosine_topk_sql(k: int = 5, query_limit: int = 10) -> str:
    return f"""
WITH base AS (
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
nrm AS (
    SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
    FROM base
),
qs AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM nrm WHERE vec_id < {query_limit}),
scored AS (
    SELECT q.query_id, n.vec_id,
           list_dot_product(n.v, q.qv) / (n.nrm * q.qn) AS cos
    FROM nrm n CROSS JOIN qs q
    WHERE n.vec_id <> q.query_id
),
ranked AS (
    SELECT query_id, vec_id, cos,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS rank
    FROM scored
)
SELECT query_id, vec_id, round(cos, 6) AS cos, rank
FROM ranked WHERE rank <= {k}
""".strip()


def planted_embeddings_cte(every: int = 7, phase: int = 3) -> str:
    """Mirrors dedup.plant_near_dup_embeddings bit for bit: vectors
    with vec_id ≡ phase (mod every) replaced in place by the
    predecessor's vector with coordinate 1 scaled ×1.25, everything
    widened to DOUBLE (exact float→double widening + one IEEE double
    multiply on both engines). Use as an inline relation via the
    emb_rel parameter of the embedding oracles."""
    return f"""(
    SELECT b.vec_id,
           CASE WHEN b.vec_id % {every} = {phase} AND p.vec_id IS NOT NULL
                THEN list_concat([CAST(p.embedding[1] AS DOUBLE) * 1.25],
                                 list_transform(p.embedding[2:],
                                                x -> CAST(x AS DOUBLE)))
                ELSE list_transform(b.embedding, x -> CAST(x AS DOUBLE))
           END AS embedding,
           b.label
    FROM embeddings b LEFT JOIN embeddings p ON p.vec_id = b.vec_id - 1
)""".strip()


def lsh_bucket_pairs_sql(
    threshold: float = 0.2,
    nbits: int | None = None,
    stride: int = 8,
    emb_rel: str = "embeddings",
) -> str:
    """nbits=None mirrors similarity.derive_axis_nbits exactly:
    min(24, (dim-1)//stride + 1, max(8, bit_length(N-1))) — DuckDB's
    length(bin(N-1)) IS bit_length for N>1, and the <=8 disagreement
    at N<=1 is absorbed by the greatest(8, ...) clamp. Bucket bits are
    summed over a generated series so the SQL needs no static unroll."""
    if nbits is not None:
        params = f"SELECT {nbits} AS nbits"
    else:
        params = f"""
    SELECT least(24,
                 (max(length(embedding)) - 1) // {stride} + 1,
                 greatest(8, length(bin(greatest(count(*), 1) - 1)))) AS nbits
    FROM {emb_rel}
""".strip()
    return f"""
WITH params AS (
    {params}
),
bits AS (
    SELECT unnest(generate_series(0, nbits - 1)) AS p FROM params
),
base AS (
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM {emb_rel}
),
bucketed AS (
    SELECT base.vec_id,
           CAST(sum(CASE WHEN base.v[1 + {stride} * bits.p] >= 0
                         THEN (CAST(1 AS BIGINT) << bits.p) ELSE 0 END)
                AS BIGINT) AS bucket
    FROM base CROSS JOIN bits
    GROUP BY base.vec_id
),
nb AS (
    SELECT base.vec_id, base.v,
           sqrt(list_sum(list_transform(base.v, x -> x * x))) AS nrm,
           bucketed.bucket
    FROM base JOIN bucketed USING (vec_id)
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {threshold}
""".strip()


def embedding_near_dup_sql(
    threshold: float = 0.9,
    nbits: int | None = None,
    stride: int = 8,
    emb_rel: str = "embeddings",
) -> str:
    """Mirrors dedup.embedding_near_dup: the axis-sign LSH pair list
    (lsh_bucket_pairs_sql, bit-identical buckets and cosines), min-id
    keeper per duplicate, lang joined from documents."""
    pairs = lsh_bucket_pairs_sql(threshold, nbits, stride, emb_rel=emb_rel)
    return f"""
WITH pairs AS (
{pairs}
),
v AS (
    SELECT id_b AS doc_id,
           min(id_a) AS dup_of,
           arg_min(cos, id_a) AS cos
    FROM pairs GROUP BY id_b
)
SELECT v.doc_id, v.dup_of, v.cos, d.lang
FROM v JOIN documents d USING (doc_id)
""".strip()


def random_plane_lsh_sql(
    nbits: int = 32,
    bands: int = 4,
    dim: int = 64,
    seed: str = "wetric",
) -> str:
    """Mirrors random_plane_lsh_candidates bit for bit: the ±1 plane
    matrix is md5-derived (plane[p][j] = +1 iff md5('{seed}:p:j')
    byte 0 is odd — similarity._planes), so DuckDB can rebuild it;
    signatures are sign bits of the plane dot products, band b is bits
    [b*rows, (b+1)*rows), candidates agree on ≥1 band."""
    rows = nbits // bands
    mask = (1 << rows) - 1
    return f"""
WITH planes AS (
    SELECT p, j,
           (CASE WHEN (('0x' || substr(md5('{seed}:' || p || ':' || j), 1, 2))::INTEGER % 2) = 1
                 THEN 1.0 ELSE -1.0 END) AS w
    FROM range({nbits}) t1(p), range({dim}) t2(j)
),
vals AS (
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           generate_subscripts(embedding, 1) - 1 AS j,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
),
bits AS (
    SELECT v.vec_id, pl.p,
           (CASE WHEN sum(v.val * pl.w) >= 0 THEN 1 ELSE 0 END) AS bit
    FROM vals v JOIN planes pl ON v.j = pl.j
    GROUP BY 1, 2
),
sigs AS (
    SELECT vec_id, CAST(sum(bit * (1::BIGINT << p)) AS BIGINT) AS sig
    FROM bits GROUP BY vec_id
),
bands AS (
    SELECT vec_id, b, (sig >> (b * {rows})) & {mask} AS band
    FROM sigs, range({bands}) t(b)
)
SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
FROM bands a JOIN bands c ON a.b = c.b AND a.band = c.band AND a.vec_id < c.vec_id
""".strip()


# -- multimodal plumbing oracles (documents-derived media table) -----------

_MEDIA_CTE = """
media AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           (CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END) AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
),
stats AS (
    SELECT doc_id, kind, n_bytes,
           16 + n_bytes % 624 AS width,
           16 + (n_bytes * 7) % 464 AS height,
           (CASE WHEN kind = 'image' THEN 1 ELSE 1 + n_bytes % 120 END) AS n_frames
    FROM media
)
""".strip()


def media_stats_sql() -> str:
    return (
        "WITH "
        + _MEDIA_CTE
        + "\nSELECT doc_id, kind, n_bytes, CAST(width AS BIGINT) AS width, "
        "CAST(height AS BIGINT) AS height, CAST(n_frames AS BIGINT) AS n_frames FROM stats"
    )


def media_resize_sql(max_dim: int = 256) -> str:
    """Mirrors multimodal.resize_media (metadata path): fit-in-box
    integer scaling w*max_dim // max(w,h), aspect preserved."""
    return (
        "WITH "
        + _MEDIA_CTE
        + f"""
SELECT doc_id, kind, n_bytes,
       CAST(CASE WHEN greatest(width, height) <= {max_dim} THEN width
                 ELSE width * {max_dim} // greatest(width, height) END AS BIGINT) AS width,
       CAST(CASE WHEN greatest(width, height) <= {max_dim} THEN height
                 ELSE height * {max_dim} // greatest(width, height) END AS BIGINT) AS height
FROM stats
"""
    )


def media_features_sql(dim: int = 16) -> str:
    """Mirrors multimodal.media_features (counts mode): the byte-value
    histogram of encode(text) folded mod `dim`, recovered in SQL via
    the hex expansion of the blob (every byte = one hex pair)."""
    return f"""
WITH b AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, hex(encode(text)) AS h
    FROM documents
),
bytes AS (
    SELECT doc_id,
           list_transform(range(length(h) // 2),
                          i -> ('0x' || substr(h, 2 * i + 1, 2))::BIGINT % {dim}) AS vals
    FROM b
)
SELECT doc_id,
       list_transform(range({dim}),
                      k -> CAST(len(list_filter(vals, v -> v = k)) AS BIGINT)) AS features
FROM bytes
""".strip()


def frame_sample_sql(every_n: int = 10) -> str:
    return (
        "WITH "
        + _MEDIA_CTE
        + f"""
SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, {every_n})) AS BIGINT) AS frame_idx
FROM stats WHERE kind = 'video'
"""
    )


# -- events (batch windowed aggregation; streaming twin in streaming/) ----


def user_stats_sql() -> str:
    """Batch oracle for the applyInPandasWithState per-user profile
    (streaming/userstats.py) — exact integer micro arithmetic."""
    return """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_micro,
       CAST(max(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS max_value_micro
FROM events GROUP BY user_id
""".strip()


def events_sessionized_sql(gap_minutes: int = 30) -> str:
    """Mirrors streaming.events.sessionized (Spark F.session_window)
    as gaps-and-islands: a break starts whenever the gap to the
    previous event is >= `gap_minutes` (session windows are half-open
    [start, last_ts + gap)); session_end = last_ts + gap."""
    return f"""
WITH x AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN ts >= lag(ts) OVER w + INTERVAL '{gap_minutes} minutes'
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
    SELECT user_id, ts, value,
           sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS grp
    FROM x
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '{gap_minutes} minutes' AS session_end,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM g
GROUP BY user_id, grp
""".strip()


def events_windowed_sql() -> str:
    return """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM events
GROUP BY 1, 2
""".strip()


_PII_AUG_CTE = """
aug AS (
    SELECT doc_id,
        text ||
        CASE WHEN doc_id % 2 = 0
             THEN ' contact user' || doc_id || '@example.com now'
             ELSE '' END ||
        CASE WHEN doc_id % 3 = 0
             THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             ELSE '' END AS text
    FROM documents
)
""".strip()


def pii_redact_sql() -> str:
    """Mirrors operators/textstats.py::pii_redact over the same
    deterministic PII augmentation the Spark query applies (the
    synthetic corpus has no organic emails/phones, so both sides
    inject them identically first). Patterns live in the RE2 ∩
    Java-regex common subset; DuckDB needs the 'g' flag to replace
    every match like Spark does."""
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone = "\\d{3}-\\d{3}-\\d{4}"
    return f"""
WITH {_PII_AUG_CTE}
SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
    CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phones,
    md5(regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                       '{phone}', '<PHONE>', 'g')) AS clean_hash
FROM aug
""".strip()


def host_cap_sql(cap: int = 20) -> str:
    """Mirrors operators/textstats.py::host_cap (top-`cap` docs per
    source by n_chars, ties to the smaller doc id)."""
    return f"""
WITH ranked AS (
    SELECT doc_id, source AS host,
           row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
           ) AS rk
    FROM documents
)
SELECT doc_id, host, CAST(rk AS BIGINT) AS rk FROM ranked WHERE rk <= {cap}
""".strip()


def decontaminate_sql(bench_mod: int = 29, min_overlap: int = 5) -> str:
    """Mirrors operators/dedup.py::decontaminate: distinct 3-gram
    overlap between each non-benchmark doc and the benchmark shingle
    set (docs with doc_id % bench_mod == 0)."""
    return f"""
WITH {_SHINGLE_CTE},
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {bench_mod} = 0)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM sh s JOIN bench USING (shingle)
WHERE s.doc_id % {bench_mod} <> 0
GROUP BY s.doc_id
HAVING count(*) >= {min_overlap}
""".strip()


def densest_sql(rounds: int = 16, raw_sql: str | None = None) -> str:
    """Mirrors operators/densest.py::densest_subgraph — the unrolled
    greedy peel (eps=1: keep v iff deg(v)*n > 4*m), integer-only
    comparisons, best round by the HUGEINT surrogate m*10^12 // n with
    ties to the earlier round. `rounds` must be >= the peel depth
    (~2*log2 n); rounds past the empty graph contribute n=0 stats rows
    that the WHERE n > 0 filter drops, so overshooting is safe."""
    raw_sql = raw_sql or derived_edges_sql()
    ctes = [
        f"raw AS ({raw_sql})",
        "e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM raw WHERE src <> dst "
        "UNION ALL SELECT dst AS src, src AS dst FROM raw WHERE src <> dst))",
        "s0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS round, "
        "count(DISTINCT src) AS n, count(*) // 2 AS m FROM e0)",
    ]
    prev_e, prev_s = "e0", "s0"
    for i in range(1, rounds + 1):
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT src AS v FROM {prev_e} GROUP BY src "
            f"HAVING count(*) * (SELECT n FROM {prev_s}) > 4 * (SELECT m FROM {prev_s}))"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM {prev_e} e "
            f"JOIN k{i} a ON e.src = a.v JOIN k{i} b ON e.dst = b.v)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT CAST({i} AS BIGINT) AS round, "
            f"count(DISTINCT src) AS n, count(*) // 2 AS m FROM e{i})"
        )
        prev_e, prev_s = f"e{i}", f"s{i}"
    stats_union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(rounds + 1))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
stats AS ({stats_union})
SELECT round AS best_round, n AS n_vertices, m AS n_edges,
       m * 1000000 // n AS density_ppm
FROM stats WHERE n > 0
ORDER BY CAST(m AS HUGEINT) * 1000000000000 // n DESC, round ASC
LIMIT 1"""
    )


def modularity_host_sql() -> str:
    """Mirrors operators/quality.modularity over the hosted page link
    graph under the host partition (community = url host). All
    quadratic terms widened to HUGEINT == Spark DECIMAL(38,0); the
    ppm division uses the +q_den shift so floor semantics match
    Spark's truncating `div` on the nonnegative numerator."""
    from .docpages import doc_pages_hosted_sql

    return f"""
WITH pages AS ({doc_pages_hosted_sql()}),
links AS (
    SELECT url AS src_url,
           unnest(regexp_extract_all(html, '<a href="([^"]+)">', 1)) AS dst_url
    FROM pages
),
e AS (
    SELECT DISTINCT least(src_url, dst_url) AS a, greatest(src_url, dst_url) AS b
    FROM links WHERE src_url <> dst_url
),
mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM e),
sym AS (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e),
deg AS (SELECT v, count(*) AS d FROM sym GROUP BY v),
vc AS (SELECT v, d, regexp_extract(v, '^https?://([^/]+)', 1) AS c FROM deg),
per_d AS (SELECT c, CAST(sum(d) AS HUGEINT) AS dsum FROM vc GROUP BY c),
intra AS (
    SELECT ca.c AS c, count(*) AS m_in
    FROM e JOIN vc ca ON e.a = ca.v JOIN vc cb ON e.b = cb.v
    WHERE ca.c = cb.c GROUP BY ca.c
),
per_c AS (
    SELECT p.c, p.dsum, COALESCE(i.m_in, 0) AS m_in
    FROM per_d p LEFT JOIN intra i ON p.c = i.c
),
tot AS (
    SELECT count(*) AS n_communities,
           CAST(sum(m_in) AS BIGINT) AS intra_edges,
           CAST(sum(m_in) AS HUGEINT) AS s_in,
           sum(dsum * dsum) AS s_d2
    FROM per_c
)
SELECT CAST(n_communities AS BIGINT) AS n_communities,
       CAST((SELECT m FROM mm) AS BIGINT) AS m_edges,
       intra_edges,
       CAST(
         ((4 * (SELECT m FROM mm) * s_in - s_d2
           + 4 * (SELECT m FROM mm) * (SELECT m FROM mm)) * 1000000)
         // (4 * (SELECT m FROM mm) * (SELECT m FROM mm)) - 1000000
       AS BIGINT) AS q_ppm
FROM tot WHERE (SELECT m FROM mm) > 0
""".strip()


def transitivity_sql(raw_sql: str | None = None) -> str:
    """Mirrors operators/quality.transitivity: textbook 3-join triangle
    count + symmetric-degree wedge closed form, exact ppm ratio."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH raw AS ({raw_sql}),
und AS (
    SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
    FROM raw WHERE src <> dst
),
tri AS (
    SELECT CAST(count(*) AS HUGEINT) AS t
    FROM und e1
    JOIN und e2 ON e1.dst = e2.src
    JOIN und e3 ON e1.src = e3.src AND e2.dst = e3.dst
),
sym AS (SELECT src AS v FROM und UNION ALL SELECT dst AS v FROM und),
deg AS (SELECT v, count(*) AS d FROM sym GROUP BY v),
wed AS (
    SELECT COALESCE(sum((CAST(d AS HUGEINT) * (d - 1)) // 2),
                    CAST(0 AS HUGEINT)) AS w
    FROM deg
)
SELECT CAST((SELECT t FROM tri) AS BIGINT) AS triangles,
       CAST(w AS BIGINT) AS wedges,
       CAST(((SELECT t FROM tri) * 3000000) // w AS BIGINT) AS transitivity_ppm
FROM wed WHERE w > 0
""".strip()


def canonical_urls_sql() -> str:
    """Mirrors plans/ingest.canonical_url over the dirty-url
    derivation: lowercase scheme+host, strip default port / fragment /
    trailing slash, keep non-default ports and query strings,
    pass schemeless urls through."""
    from .docpages import doc_urls_dirty_sql

    return f"""
WITH raw AS ({doc_urls_dirty_sql()}),
parts AS (
    SELECT doc_id, url,
           lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
           regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/#?]*)', 1) AS hostport,
           regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/#?]*(.*)$', 1) AS rest0
    FROM raw
),
p2 AS (
    SELECT doc_id, url, scheme,
           lower(regexp_extract(hostport, '^([^:]*)', 1)) AS host,
           regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
           regexp_replace(regexp_replace(rest0, '#.*$', ''), '/$', '') AS rest
    FROM parts
)
SELECT doc_id, url,
       CASE WHEN scheme = '' THEN url
            ELSE scheme || '://' || host ||
                 CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                                               OR (scheme = 'https' AND port = '443'))
                      THEN ':' || port ELSE '' END || rest
       END AS url_canonical
FROM p2
""".strip()


def boilerplate_removal_sql(min_docs: int = 3) -> str:
    """Mirrors operators/textstats.remove_boilerplate_lines over the
    boilerplated-text derivation."""
    from .docpages import doc_texts_boilerplated_sql

    return f"""
WITH docsrc AS ({doc_texts_boilerplated_sql()}),
toks AS (
    SELECT doc_id, source AS host, string_split(text, chr(10)) AS ls
    FROM docsrc
),
lines AS (
    SELECT doc_id, host, i - 1 AS pos, ls[i] AS line
    FROM toks, unnest(generate_series(1, len(ls))) AS u(i)
),
boiler AS (
    SELECT host, line FROM lines
    GROUP BY host, line
    HAVING count(DISTINCT doc_id) >= {min_docs}
),
totals AS (SELECT doc_id, count(*) AS n_total FROM lines GROUP BY doc_id),
kept AS (
    SELECT l.* FROM lines l
    ANTI JOIN boiler b ON l.host = b.host AND l.line = b.line
),
reassembled AS (
    SELECT doc_id,
           string_agg(line, chr(10) ORDER BY pos) AS text_clean,
           count(*) AS n_lines_kept
    FROM kept GROUP BY doc_id
)
SELECT r.doc_id, r.text_clean, r.n_lines_kept,
       t.n_total - r.n_lines_kept AS n_lines_removed
FROM reassembled r JOIN totals t ON r.doc_id = t.doc_id
""".strip()


def anf_sql(raw_sql: str, k: int = 32, max_hops: int = 4) -> str:
    """Mirrors operators/anf.py: KMV-sketch neighborhood function with
    max_hops rounds unrolled as MATERIALIZED CTEs. Same 60-bit md5
    hash, same flatten+distinct+sort+slice merge, same exact-integer
    estimate ((k-1)*SPACE // kth at HUGEINT width == Spark
    DECIMAL(38,0) div, clamped to the vertex count)."""
    space = 16**15
    ctes = [
        f"raw AS ({raw_sql})",
        "clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        "e AS (SELECT src, dst FROM clean "
        "UNION SELECT dst AS src, src AS dst FROM clean)",
        "verts AS (SELECT DISTINCT dst AS v FROM e)",
        "nn AS (SELECT count(*)::HUGEINT AS n FROM verts)",
        "s0 AS (SELECT v, [('0x' || substr(md5('anf:' || CAST(v AS VARCHAR)),"
        " 1, 15))::BIGINT] AS sk FROM verts)",
    ]
    est = (
        f"SUM(CASE WHEN len(sk) < {k} THEN len(sk)::HUGEINT "
        f"ELSE LEAST(({k - 1}::HUGEINT * {space}) // GREATEST(sk[{k}], 1), "
        f"(SELECT n FROM nn)) END)::BIGINT"
    )
    sels = [f"SELECT 0 AS hop, {est} AS nf_est FROM s0"]
    for t in range(1, max_hops + 1):
        prev = f"s{t - 1}"
        ctes.append(
            f"s{t} AS MATERIALIZED (SELECT v, "
            f"list_sort(list_distinct(flatten(list(sk))))[1:{k}] AS sk "
            f"FROM (SELECT v, sk FROM {prev} UNION ALL "
            f"SELECT e.src AS v, s.sk FROM e JOIN {prev} s ON e.dst = s.v) "
            f"GROUP BY v)"
        )
        sels.append(f"SELECT {t} AS hop, {est} AS nf_est FROM s{t}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(sels)


def effective_diameter_sql(
    raw_sql: str, k: int = 32, max_hops: int = 4, q: int = 90
) -> str:
    """Mirrors operators/anf.py::effective_diameter: smallest hop whose
    ANF clears q% of the final ANF, decided by the same integer
    cross-multiplication as the engine."""
    return f"""
WITH nf AS ({anf_sql(raw_sql, k, max_hops)}),
fin AS (SELECT nf_est AS nf_final FROM nf WHERE hop = {max_hops})
SELECT MIN(nf.hop)::BIGINT AS eff_diameter_hops,
       MIN(fin.nf_final) AS nf_final
FROM nf, fin
WHERE nf.nf_est * 100 >= {q} * fin.nf_final
""".strip()


def closeness_sql(raw_sql: str, seed_pct: int = 5, max_hops: int = 6) -> str:
    """Mirrors operators/centrality.py::closeness_centrality: the
    harmonic oracle's reachability with the Lin closeness aggregate
    (n_reached * 1e6 // sum of hops, exact integers)."""
    return f"""
WITH RECURSIVE raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
seeds AS (
    SELECT DISTINCT src AS s FROM sym
    WHERE ('0x' || substr(md5('hc:' || CAST(src AS VARCHAR)), 1, 8))::BIGINT
          % 100 < {seed_pct}
),
reach(s, v, d) AS (
    SELECT s, s, 0 FROM seeds
    UNION
    SELECT reach.s, e.dst, reach.d + 1
    FROM reach JOIN sym e ON e.src = reach.v
    WHERE reach.d < {max_hops}
),
dist AS (SELECT s, v, MIN(d) AS hops FROM reach GROUP BY s, v),
agg AS (
    SELECT s AS seed, count(*) AS n_reached, sum(hops) AS sum_hops
    FROM dist WHERE hops > 0 GROUP BY s
)
SELECT seeds.s AS seed,
       CAST(coalesce(n_reached, 0) AS BIGINT) AS n_reached,
       CAST(coalesce(n_reached * 1000000 // sum_hops, 0) AS BIGINT)
           AS closeness_micro
FROM seeds LEFT JOIN agg ON seeds.s = agg.seed
""".strip()


def anchor_profile_sql() -> str:
    """Mirrors plans/ingest.py::anchor_text_profile over the anchored
    pages derivation: same two-stage regexp (whole anchor elements,
    then per-row href/text extraction), same space tokenization, same
    (count DESC, term ASC) deterministic top-term tie-break."""
    from .docpages import doc_pages_anchored_sql

    pat = '<a href="([^"]+)">([^<]+)</a>'
    return f"""
WITH pages AS ({doc_pages_anchored_sql()}),
whole AS (
    SELECT url AS src_url,
           unnest(regexp_extract_all(html, '{pat}', 0)) AS a
    FROM pages
),
pa AS (
    SELECT regexp_extract(a, '{pat}', 1) AS url,
           regexp_extract(a, '{pat}', 2) AS anchor
    FROM whole
),
terms AS (SELECT url, unnest(string_split(anchor, ' ')) AS term FROM pa),
per_term AS (SELECT url, term, count(*) AS c FROM terms GROUP BY url, term),
totals AS (
    SELECT url, sum(c) AS n_terms, count(*) AS n_unique_terms
    FROM per_term GROUP BY url
),
top AS (
    SELECT url, term AS top_term, c AS top_term_count,
           row_number() OVER (PARTITION BY url ORDER BY c DESC, term ASC) AS rn
    FROM per_term
)
SELECT t.url,
       CAST(t.n_terms AS BIGINT) AS n_terms,
       CAST(t.n_unique_terms AS BIGINT) AS n_unique_terms,
       top.top_term,
       CAST(top.top_term_count AS BIGINT) AS top_term_count
FROM totals t JOIN top ON top.url = t.url AND top.rn = 1
""".strip()


def coreness_sql(raw_sql: str, num_rounds: int) -> str:
    """Mirrors operators/coreness.py: h-index iteration from the
    degree vector, num_rounds unrolled as MATERIALIZED CTEs. The
    h-index here is the window formulation (row_number over DESC
    values; h = max rank with value >= rank) — a different computation
    of the same integer as the engine's array fold, which makes the
    parity check a genuine cross-formulation test."""
    ctes = [
        f"raw AS ({raw_sql})",
        "clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        "e AS (SELECT src, dst FROM clean "
        "UNION SELECT dst AS src, src AS dst FROM clean)",
        "c0 AS (SELECT dst AS v, CAST(count(*) AS INT) AS c "
        "FROM e GROUP BY dst)",
    ]
    for t in range(1, num_rounds + 1):
        prev = f"c{t - 1}"
        ctes.append(
            f"r{t} AS (SELECT e.src AS v, s.c, row_number() OVER "
            f"(PARTITION BY e.src ORDER BY s.c DESC) AS rn "
            f"FROM e JOIN {prev} s ON s.v = e.dst)"
        )
        ctes.append(
            f"c{t} AS MATERIALIZED (SELECT v, CAST(coalesce(max(CASE "
            f"WHEN c >= rn THEN rn END), 0) AS INT) AS c "
            f"FROM r{t} GROUP BY v)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v, c AS core FROM c{num_rounds}"
    )


def stress_centrality_sql(
    raw_sql: str, seed_pct: int = 5, max_hops: int = 4
) -> str:
    """Mirrors operators/centrality.py::stress_centrality: unrolled
    level-synchronous BFS carrying exact shortest-path counts (sigma),
    then the integer pair sum sigma_s(v)*sigma_t(v) over aligned seed
    pairs. All arithmetic integral."""
    ctes = [
        f"raw AS ({raw_sql})",
        "clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        "e AS (SELECT src, dst FROM clean "
        "UNION SELECT dst AS src, src AS dst FROM clean)",
        "seeds AS (SELECT DISTINCT src AS s FROM e WHERE "
        "('0x' || substr(md5('hc:' || CAST(src AS VARCHAR)), 1, 8))::BIGINT "
        f"% 100 < {seed_pct})",
        "f0 AS (SELECT s, s AS v, 0 AS hops, CAST(1 AS BIGINT) AS sigma "
        "FROM seeds)",
        "d0 AS (SELECT * FROM f0)",
    ]
    for t in range(1, max_hops + 1):
        ctes.append(
            f"c{t} AS (SELECT f.s, e.dst AS v, sum(f.sigma) AS sigma "
            f"FROM f{t - 1} f JOIN e ON e.src = f.v GROUP BY f.s, e.dst)"
        )
        ctes.append(
            f"f{t} AS MATERIALIZED (SELECT c.s, c.v, {t} AS hops, "
            f"CAST(c.sigma AS BIGINT) AS sigma FROM c{t} c "
            f"ANTI JOIN d{t - 1} d ON d.s = c.s AND d.v = c.v)"
        )
        ctes.append(
            f"d{t} AS MATERIALIZED (SELECT * FROM d{t - 1} "
            f"UNION ALL SELECT * FROM f{t})"
        )
    ctes.append(f"dist AS (SELECT * FROM d{max_hops})")
    ctes.append(
        "st AS (SELECT s, v AS t, hops AS d_st FROM dist "
        "WHERE v IN (SELECT s FROM seeds) AND s < v)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT a.v,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(a.sigma * b.sigma) AS BIGINT) AS through_paths
FROM dist a
JOIN dist b ON a.v = b.v AND a.s < b.s
JOIN st ON st.s = a.s AND st.t = b.s
WHERE a.v <> a.s AND a.v <> b.s AND a.hops + b.hops = st.d_st
GROUP BY a.v"""
    )


def matching_sql(raw_sql: str, num_rounds: int) -> str:
    """Mirrors operators/matching.py: locally-minimal-edge rounds with
    the lpad(h64(a:b))||lpad(a)||lpad(b) total priority, unrolled as
    MATERIALIZED CTEs. Overshoot rounds are no-ops on an empty active
    set, so the engine's early exit is safe."""
    prio = (
        "lpad(CAST(('0x' || substr(md5(CAST(a AS VARCHAR) || ':' || "
        "CAST(b AS VARCHAR)), 1, 15))::BIGINT AS VARCHAR), 19, '0') || "
        "lpad(CAST(a AS VARCHAR), 10, '0') || "
        "lpad(CAST(b AS VARCHAR), 10, '0')"
    )
    ctes = [
        f"raw AS ({raw_sql})",
        "canon AS (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM raw WHERE src <> dst)",
        f"a0 AS (SELECT a, b, {prio} AS p FROM canon)",
    ]
    sels = []
    for k in range(1, num_rounds + 1):
        prev = f"a{k - 1}"
        ctes.append(
            f"vmin{k} AS (SELECT v, min(p) AS mn FROM "
            f"(SELECT a AS v, p FROM {prev} "
            f"UNION ALL SELECT b AS v, p FROM {prev}) GROUP BY v)"
        )
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT e.a, e.b, {k} AS round "
            f"FROM {prev} e "
            f"JOIN vmin{k} x ON x.v = e.a AND e.p = x.mn "
            f"JOIN vmin{k} y ON y.v = e.b AND e.p = y.mn)"
        )
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT e.a, e.b, e.p FROM {prev} e "
            f"WHERE e.a NOT IN (SELECT a FROM s{k} UNION SELECT b FROM s{k}) "
            f"AND e.b NOT IN (SELECT a FROM s{k} UNION SELECT b FROM s{k}))"
        )
        sels.append(f"SELECT a, b, round FROM s{k}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(sels)


def substring_dup_sql(window: int = 16, max_window_freq: int = 20) -> str:
    """Mirrors operators/dedup.py::substring_dup_pairs: distinct
    window-token spans per doc, 60-bit md5 window hashes, document-
    frequency cap, inverted-index pair count."""
    return rf"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
),
win AS (
    SELECT DISTINCT doc_id,
           {_h64(f"'sw:' || array_to_string(list_slice(t, i, i + {window - 1}), ' ')")} AS h
    FROM toks, unnest(generate_series(1, greatest(len(t) - {window - 1}, 0))) AS u(i)
    WHERE len(t) >= {window}
),
keep AS (
    SELECT h FROM win GROUP BY h
    HAVING count(*) >= 2 AND count(*) <= {max_window_freq}
),
w AS (SELECT doc_id, h FROM win SEMI JOIN keep USING (h))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared_windows
FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
""".strip()


def _kmeans_ctes(
    k: int, num_iters: int, init: str = "hash", emb_rel: str = "embeddings"
) -> list[str]:
    """Shared CTE chain for kmeans_sql / ivf_topk_sql: quantize to
    offset integers, seed (smallest-md5 "hash" init or deterministic
    farthest-first "farthest" init, mirroring kmeans.py), Lloyd
    assignments with integer-mean centroid updates. Final assignment
    CTE is asg{num_iters}."""
    offset = 1 << 24
    ctes = [
        "dims AS (SELECT vec_id, i, "
        f"CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) "
        f"+ {offset} AS val "
        f"FROM {emb_rel}, unnest(generate_series(1, len(embedding))) AS u(i))",
        "seedh AS (SELECT vec_id, "
        "('0x' || substr(md5('km:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h "
        f"FROM {emb_rel})",
    ]
    if init == "farthest":
        ctes.append(
            "fch0 AS (SELECT 0 AS cid, vec_id FROM seedh "
            "ORDER BY h, vec_id LIMIT 1)"
        )
        for i in range(1, k):
            ctes.append(
                f"fd{i} AS (SELECT vec_id, min(dd) AS dmin FROM ("
                f"SELECT d.vec_id, c.cid, "
                f"sum((d.val - cd.val) * (d.val - cd.val)) AS dd "
                f"FROM dims d CROSS JOIN fch{i - 1} c "
                f"JOIN dims cd ON cd.vec_id = c.vec_id AND cd.i = d.i "
                f"GROUP BY d.vec_id, c.cid) GROUP BY vec_id)"
            )
            ctes.append(
                f"fch{i} AS MATERIALIZED (SELECT * FROM fch{i - 1} UNION ALL "
                f"SELECT {i} AS cid, vec_id FROM "
                f"(SELECT vec_id FROM fd{i} ORDER BY dmin DESC, vec_id ASC "
                f"LIMIT 1))"
            )
        ctes.append(
            f"c0 AS (SELECT f.cid, d.i, d.val FROM fch{k - 1} f "
            f"JOIN dims d USING (vec_id))"
        )
    else:
        ctes += [
            "init AS (SELECT vec_id, row_number() OVER (ORDER BY h, vec_id) - 1 "
            f"AS cid FROM seedh ORDER BY h, vec_id LIMIT {k})",
            "c0 AS (SELECT init.cid, d.i, d.val FROM init "
            "JOIN dims d USING (vec_id))",
        ]
    for t in range(1, num_iters + 1):
        ctes.append(
            f"dist{t} AS (SELECT v.vec_id, c.cid, "
            f"sum((v.val - c.val) * (v.val - c.val)) AS d "
            f"FROM dims v JOIN c{t - 1} c ON c.i = v.i "
            f"GROUP BY v.vec_id, c.cid)"
        )
        ctes.append(
            f"asg{t} AS MATERIALIZED (SELECT vec_id, cid AS cluster FROM "
            f"(SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id "
            f"ORDER BY d, cid) AS rn FROM dist{t}) WHERE rn = 1)"
        )
        if t < num_iters:
            ctes.append(
                f"c{t} AS MATERIALIZED (SELECT a.cluster AS cid, v.i, "
                f"sum(v.val) // count(*) AS val FROM asg{t} a "
                f"JOIN dims v USING (vec_id) GROUP BY a.cluster, v.i)"
            )
    return ctes


def kmeans_sql(k: int = 8, num_iters: int = 3, init: str = "hash") -> str:
    """Mirrors operators/kmeans.py::kmeans_assign: quantize to offset
    integers, seed per `init`, num_iters Lloyd assignments with
    num_iters-1 integer-mean centroid updates between them. The
    nonnegative offset makes DuckDB's // equal Spark's div in the
    update; everything else is sums of int64."""
    ctes = _kmeans_ctes(k, num_iters, init=init)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT vec_id, CAST(cluster AS INT) AS cluster FROM asg{num_iters}"
    )


def ivf_topk_sql(
    k: int = 5,
    query_limit: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    num_iters: int = 3,
) -> str:
    """Mirrors operators/similarity.py::ivf_topk: the kmeans chain,
    centroids recomputed from the final assignment, integer-distance
    probe of nprobe lists per query, exact cosine inside the probed
    lists, round-6 doubles with (cos DESC, vec_id ASC) ranking."""
    T = num_iters
    ctes = _kmeans_ctes(n_clusters, num_iters)
    ctes += [
        f"cfin AS MATERIALIZED (SELECT a.cluster AS cid, v.i, "
        f"sum(v.val) // count(*) AS val FROM asg{T} a "
        f"JOIN dims v USING (vec_id) GROUP BY a.cluster, v.i)",
        f"qdist AS (SELECT d.vec_id AS query_id, c.cid, "
        f"sum((d.val - c.val) * (d.val - c.val)) AS pd "
        f"FROM dims d JOIN cfin c ON c.i = d.i "
        f"WHERE d.vec_id < {query_limit} GROUP BY d.vec_id, c.cid)",
        f"probe AS (SELECT query_id, cid AS cluster FROM "
        f"(SELECT query_id, cid, row_number() OVER (PARTITION BY query_id "
        f"ORDER BY pd, cid) AS rn FROM qdist) WHERE rn <= {nprobe})",
        "base AS (SELECT CAST(e.vec_id AS BIGINT) AS vec_id, "
        "list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v, "
        f"a.cluster FROM embeddings e JOIN asg{T} a ON a.vec_id = e.vec_id)",
        "nrmb AS (SELECT vec_id, v, cluster, "
        "sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM base)",
        f"qsb AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn "
        f"FROM nrmb WHERE vec_id < {query_limit})",
        "scored AS (SELECT p.query_id, n.vec_id, "
        "list_dot_product(n.v, q.qv) / (n.nrm * q.qn) AS cos "
        "FROM probe p JOIN nrmb n ON n.cluster = p.cluster "
        "JOIN qsb q ON q.query_id = p.query_id "
        "WHERE n.vec_id <> p.query_id)",
        "ranked AS (SELECT query_id, vec_id, cos, "
        "CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS rank FROM scored)",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, round(cos, 6) AS cos, rank "
        f"FROM ranked WHERE rank <= {k}"
    )


def ivf_pq_topk_sql(
    k: int = 5,
    query_limit: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    num_iters: int = 3,
    m_sub: int = 4,
    ks: int = 16,
    pq_iters: int = 2,
    dim: int = 64,
) -> str:
    """Mirrors operators/pq.py::ivf_pq_topk: the coarse kmeans chain +
    nprobe probe (as ivf_topk_sql), then the multi-subspace PQ Lloyd
    recursion (md5 seeding per subspace, (d, code) argmin, integer-mean
    codebook updates, final codebook recomputed from the last
    assignment) and exact-int64 asymmetric-distance ranking with
    (adc, vec_id) tie-break. All-BIGINT output."""
    T = num_iters
    P = pq_iters
    ds = dim // m_sub
    ctes = _kmeans_ctes(n_clusters, num_iters)
    ctes += [
        f"cfin AS MATERIALIZED (SELECT a.cluster AS cid, v.i, "
        f"sum(v.val) // count(*) AS val FROM asg{T} a "
        f"JOIN dims v USING (vec_id) GROUP BY a.cluster, v.i)",
        f"qdist AS (SELECT d.vec_id AS query_id, c.cid, "
        f"sum((d.val - c.val) * (d.val - c.val)) AS pd "
        f"FROM dims d JOIN cfin c ON c.i = d.i "
        f"WHERE d.vec_id < {query_limit} GROUP BY d.vec_id, c.cid)",
        f"probe AS (SELECT query_id, cid AS cluster FROM "
        f"(SELECT query_id, cid, row_number() OVER (PARTITION BY query_id "
        f"ORDER BY pd, cid) AS rn FROM qdist) WHERE rn <= {nprobe})",
        # PQ training: subspace index m = (i-1) // ds over the shared
        # quantized `dims`, one Lloyd recursion per subspace replayed
        # jointly (cluster key (m, code)), exactly as pq.py::pq_fit.
        f"sdims AS MATERIALIZED (SELECT vec_id, CAST((i - 1) // {ds} AS INT) "
        f"AS m, i, val FROM dims)",
        f"pseed AS (SELECT e.vec_id, CAST(t.m AS INT) AS m, "
        f"('0x' || substr(md5('pq:' || CAST(t.m AS VARCHAR) || ':' || "
        f"CAST(e.vec_id AS VARCHAR)), 1, 15))::BIGINT AS h "
        f"FROM embeddings e, range({m_sub}) t(m))",
        f"pinit AS (SELECT vec_id, m, code FROM "
        f"(SELECT vec_id, m, row_number() OVER (PARTITION BY m "
        f"ORDER BY h, vec_id) - 1 AS code FROM pseed) WHERE code < {ks})",
        f"pc0 AS (SELECT p.m, p.code, s.i, s.val FROM pinit p "
        f"JOIN sdims s ON s.vec_id = p.vec_id AND s.m = p.m)",
    ]
    for t in range(1, P + 1):
        ctes.append(
            f"pdist{t} AS (SELECT v.vec_id, v.m, c.code, "
            f"sum((v.val - c.val) * (v.val - c.val)) AS d "
            f"FROM sdims v JOIN pc{t - 1} c ON c.m = v.m AND c.i = v.i "
            f"GROUP BY v.vec_id, v.m, c.code)"
        )
        ctes.append(
            f"pasg{t} AS MATERIALIZED (SELECT vec_id, m, code FROM "
            f"(SELECT vec_id, m, code, row_number() OVER "
            f"(PARTITION BY vec_id, m ORDER BY d, code) AS rn "
            f"FROM pdist{t}) WHERE rn = 1)"
        )
        if t < P:
            ctes.append(
                f"pc{t} AS MATERIALIZED (SELECT a.m, a.code, v.i, "
                f"sum(v.val) // count(*) AS val FROM pasg{t} a "
                f"JOIN sdims v ON v.vec_id = a.vec_id AND v.m = a.m "
                f"GROUP BY a.m, a.code, v.i)"
            )
    ctes += [
        f"pcfin AS MATERIALIZED (SELECT a.m, a.code, v.i, "
        f"sum(v.val) // count(*) AS val FROM pasg{P} a "
        f"JOIN sdims v ON v.vec_id = a.vec_id AND v.m = a.m "
        f"GROUP BY a.m, a.code, v.i)",
        f"cand AS (SELECT p.query_id, a.vec_id FROM probe p "
        f"JOIN asg{T} a ON a.cluster = p.cluster "
        f"WHERE a.vec_id <> p.query_id)",
        f"adc AS (SELECT c.query_id, c.vec_id, "
        f"sum((q.val - cb.val) * (q.val - cb.val)) AS adc "
        f"FROM cand c JOIN pasg{P} pa ON pa.vec_id = c.vec_id "
        f"JOIN pcfin cb ON cb.m = pa.m AND cb.code = pa.code "
        f"JOIN sdims q ON q.vec_id = c.query_id AND q.i = cb.i "
        f"GROUP BY c.query_id, c.vec_id)",
        f"pranked AS (SELECT query_id, vec_id, adc, "
        f"CAST(row_number() OVER (PARTITION BY query_id "
        f"ORDER BY adc ASC, vec_id ASC) AS BIGINT) AS rank FROM adc)",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, vec_id, CAST(adc AS BIGINT) AS adc, rank "
        f"FROM pranked WHERE rank <= {k}"
    )


def semantic_dedup_sql(
    k: int = 8,
    num_iters: int = 3,
    threshold: float = 0.4,
    emb_rel: str = "embeddings",
) -> str:
    """Mirrors operators/dedup.py::semantic_dedup_pairs: the kmeans
    chain, then within-cluster cosine pairs (id_a < id_b) at the
    threshold, cos rounded to 1e-6."""
    T = num_iters
    ctes = _kmeans_ctes(k, num_iters, emb_rel=emb_rel)
    ctes += [
        f"sbase AS (SELECT CAST(e.vec_id AS BIGINT) AS vid, "
        f"list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v, "
        f"a.cluster FROM {emb_rel} e JOIN asg{T} a ON a.vec_id = e.vec_id)",
        "snrm AS (SELECT vid, v, cluster, "
        "sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM sbase)",
        f"spairs AS (SELECT a.vid AS id_a, b.vid AS id_b, "
        f"CAST(a.cluster AS INT) AS cluster, "
        f"list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos "
        f"FROM snrm a JOIN snrm b ON a.cluster = b.cluster "
        f"AND a.vid < b.vid)",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id_a, id_b, cluster, round(cos, 6) AS cos "
        f"FROM spairs WHERE cos >= {threshold}"
    )


def attribution_sql(window_minutes: int = 30) -> str:
    """Mirrors streaming/joins.py::attribution_batch — the batch twin
    of the stream-stream attribution join; exact integer microsecond
    lag on both engines."""
    return f"""
WITH v AS (
    SELECT event_id AS view_id, user_id, ts AS view_ts
    FROM events WHERE event_type = 'view'
),
c AS (
    SELECT event_id AS click_id, user_id, ts AS click_ts
    FROM events WHERE event_type = 'click'
)
SELECT v.view_id, c.click_id, v.user_id,
       date_diff('microsecond', v.view_ts, c.click_ts) AS lag_us
FROM v JOIN c ON c.user_id = v.user_id
  AND c.click_ts >= v.view_ts
  AND c.click_ts <= v.view_ts + INTERVAL {window_minutes} MINUTE
""".strip()


def double_sweep_sql(raw_sql: str, max_hops: int = 16) -> str:
    """Mirrors operators/bfs.py::double_sweep_diameter: two chained
    depth-capped recursive reachabilities with the identical
    (hops DESC, v ASC) pivot selection."""
    return f"""
WITH RECURSIVE raw AS ({raw_sql}),
clean AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
sym AS (
    SELECT src, dst FROM clean
    UNION
    SELECT dst AS src, src AS dst FROM clean
),
s AS (SELECT MIN(src) AS sv FROM sym),
reach1(v, d) AS (
    SELECT sv, 0 FROM s WHERE sv IS NOT NULL
    UNION
    SELECT e.dst AS v, reach1.d + 1
    FROM reach1 JOIN sym e ON e.src = reach1.v
    WHERE reach1.d < {max_hops}
),
d1 AS (SELECT v, MIN(d) AS hops FROM reach1 GROUP BY v),
u AS (SELECT v AS far_v, hops AS ecc1 FROM d1
      ORDER BY hops DESC, v ASC LIMIT 1),
reach2(v, d) AS (
    SELECT far_v, 0 FROM u
    UNION
    SELECT e.dst AS v, reach2.d + 1
    FROM reach2 JOIN sym e ON e.src = reach2.v
    WHERE reach2.d < {max_hops}
),
d2 AS (SELECT v, MIN(d) AS hops FROM reach2 GROUP BY v)
SELECT CAST(u.ecc1 AS BIGINT) AS sweep1_ecc,
       CAST(u.far_v AS BIGINT) AS far_vertex,
       CAST((SELECT MAX(hops) FROM d2) AS BIGINT) AS diameter_lb
FROM u
""".strip()


def rmat_sql(scale: int, edge_factor: int = 16, seed: int = 7) -> str:
    """Replays sources/rmat.py::synth_rmat edge for edge: the same
    md5 quadrant draws folded over levels as a horizontal sum (the
    level loop unrolls into one expression per endpoint)."""
    src_terms, dst_terms = [], []
    for level in range(scale):
        h = (
            f"(('0x' || substr(md5('rmat:{seed}:{level}:' || "
            f"CAST(eid AS VARCHAR)), 1, 8))::BIGINT % 100)"
        )
        w = 1 << (scale - 1 - level)
        src_terms.append(f"(CASE WHEN {h} < 76 THEN 0 ELSE {w} END)")
        dst_terms.append(
            f"(CASE WHEN {h} < 57 OR ({h} >= 76 AND {h} < 95) "
            f"THEN 0 ELSE {w} END)"
        )
    n_edges = edge_factor * (1 << scale)
    return (
        f"SELECT CAST({' + '.join(src_terms)} AS BIGINT) AS src, "
        f"CAST({' + '.join(dst_terms)} AS BIGINT) AS dst "
        f"FROM (SELECT unnest(generate_series(0, {n_edges - 1})) AS eid)"
    )


# -- round-4 additions: sketches, retrieval, web-pipeline ops -------------


def hll_shingles_sql() -> str:
    """Mirrors operators/sketches.py::hll_distinct over the corpus's
    distinct 3-gram shingles — identical 60-bit hash, identical
    integer register math (index = top 8 bits, rho via length(bin()),
    harmonic sum in exact integer 2^-52 units), identical single
    double divide."""
    from ..operators.sketches import _HLL_M, _HLL_NUM, _HLL_REST_BITS

    rest_mod = 1 << _HLL_REST_BITS
    full = _HLL_REST_BITS + 1
    return f"""
WITH {_SHINGLE_CTE},
d AS (SELECT DISTINCT shingle AS val FROM sh WHERE shingle IS NOT NULL),
hs AS (SELECT {_h64("'hll:' || val")} AS h FROM d),
split AS (SELECT h >> {_HLL_REST_BITS} AS reg, h % {rest_mod} AS rest FROM hs),
regs AS (
    SELECT reg,
           max(CASE WHEN rest = 0 THEN {full}
                    ELSE {full} - length(bin(rest)) END) AS m_j
    FROM split GROUP BY reg
),
folded AS (
    SELECT count(*) AS n_regs,
           CAST(sum(CAST(1 AS BIGINT) << ({_HLL_REST_BITS} - m_j)) AS BIGINT)
               AS s_present
    FROM regs
),
exact AS (SELECT count(*) AS n_exact FROM d),
fold2 AS (
    SELECT n_exact,
           CAST({_HLL_M} AS BIGINT) AS m,
           CAST({_HLL_M} - n_regs AS BIGINT) AS v_zero,
           s_present + ({_HLL_M} - n_regs) * CAST({rest_mod} AS BIGINT)
               AS harmonic_sum
    FROM exact CROSS JOIN folded
)
SELECT n_exact, m, v_zero, harmonic_sum,
       CAST(floor({_HLL_NUM!r} / CAST(harmonic_sum AS DOUBLE)) AS BIGINT)
           AS est_distinct,
       CAST(abs(CAST(floor({_HLL_NUM!r} / CAST(harmonic_sum AS DOUBLE)) AS BIGINT)
                - n_exact) * 1000000 // greatest(n_exact, 1) AS BIGINT) AS err_ppm
FROM fold2
""".strip()


_TOKEN_STREAM_CTE = r"""
tokstream AS (
    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS val
    FROM documents
)
""".strip()


def countmin_tokens_sql(probe_k: int = 20, depth: int = 4, width: int = 1024) -> str:
    """Mirrors operators/sketches.py::countmin_estimates over the
    corpus token stream (every occurrence): identical per-row bucket
    hashes, identical min-over-rows estimates at the top-`probe_k`
    exact tokens."""
    h = _h64("'cm' || CAST(r AS VARCHAR) || ':' || val")
    bucket = f"{h} % {width}"
    return f"""
WITH {_TOKEN_STREAM_CTE},
v AS (SELECT val FROM tokstream WHERE val IS NOT NULL),
rws AS (SELECT unnest(generate_series(0, {depth - 1})) AS r),
buckets AS (SELECT r, {bucket} AS b FROM v CROSS JOIN rws),
sketch AS (SELECT r, b, count(*) AS cnt FROM buckets GROUP BY r, b),
probes AS (
    SELECT val, count(*) AS n_exact FROM v GROUP BY val
    ORDER BY n_exact DESC, val ASC LIMIT {probe_k}
),
pb AS (SELECT val, n_exact, r, {bucket} AS b FROM probes CROSS JOIN rws),
est AS (
    SELECT val, n_exact, CAST(min(cnt) AS BIGINT) AS est_n
    FROM pb JOIN sketch USING (r, b) GROUP BY val, n_exact
)
SELECT val, n_exact, est_n,
       CAST((est_n - n_exact) * 1000000 // greatest(n_exact, 1) AS BIGINT)
           AS over_ppm
FROM est ORDER BY n_exact DESC, val ASC
""".strip()


def mirror_hosts_sql(
    host_fp_sql: str, min_shared: int = 2, max_hosts_per_fp: int = 1000
) -> str:
    """Mirrors operators/mirrors.py::mirror_host_pairs over any
    (host, fp) relation SQL."""
    return f"""
WITH hf AS ({host_fp_sql}),
sets AS (
    SELECT DISTINCT host, fp FROM hf
    WHERE host IS NOT NULL AND fp IS NOT NULL
),
sizes AS (SELECT host, count(*) AS n FROM sets GROUP BY host),
freq AS (SELECT fp, count(*) AS n_hosts FROM sets GROUP BY fp),
idx AS (
    SELECT s.host, s.fp FROM sets s JOIN freq f USING (fp)
    WHERE f.n_hosts <= {max_hosts_per_fp}
),
pairs AS (
    SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
    FROM idx a JOIN idx b USING (fp)
    WHERE a.host < b.host
    GROUP BY 1, 2
    HAVING count(*) >= {min_shared}
)
SELECT host_a, host_b, shared, n_a, n_b,
       CAST(shared * 1000000 // (n_a + n_b - shared) AS BIGINT) AS jaccard_ppm
FROM pairs
JOIN (SELECT host AS host_a, n AS n_a FROM sizes) USING (host_a)
JOIN (SELECT host AS host_b, n AS n_b FROM sizes) USING (host_b)
ORDER BY jaccard_ppm DESC, host_a, host_b
""".strip()


def bm25_topk_sql(terms, k: int = 10) -> str:
    """Mirrors operators/retrieval.py::bm25_topk — identical rational
    idf_micro, identical exact k1=1.2 / b=0.75 tf factor, HUGEINT
    intermediates standing in for Spark's DECIMAL(38,0)."""
    tlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
    FROM documents
),
base AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl FROM toks),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dl) // count(*) AS BIGINT) AS avgdl
    FROM base
),
hits AS (
    SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, dl, unnest(t) AS tok FROM base) u
    WHERE tok IN ({tlist})
    GROUP BY doc_id, dl, tok
),
dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY tok),
scored AS (
    SELECT h.doc_id,
           CAST(
             CAST(((2 * (n_docs - df) + 1) * 1000000) // (2 * df + 1) AS HUGEINT)
             * 22 * tf * avgdl
             // (10 * tf * avgdl + 3 * avgdl + 9 * dl)
           AS BIGINT) AS term_score
    FROM hits h JOIN dfreq USING (tok) CROSS JOIN stats
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
       CAST(sum(term_score) AS BIGINT) AS score_micro
FROM scored GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {k}
""".strip()


def lang_propagate_sql(edges_sql: str, rounds: int = 2) -> str:
    """Mirrors operators/langprop.py::propagate_labels over the
    documents table with the doc_id % 7 == 0 label masking, `rounds`
    unrolled majority-vote rounds, deterministic (count DESC, label
    ASC) tie-break."""
    parts = [
        f"""
WITH nodes AS (
    SELECT doc_id AS v,
           CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS label
    FROM documents
),
raw AS ({edges_sql}),
sym AS (
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM raw
        UNION ALL
        SELECT dst AS src, src AS dst FROM raw
    ) t WHERE src <> dst
),
state_0 AS (
    SELECT v, label,
           CASE WHEN label IS NOT NULL THEN 'kept' ELSE 'unlabeled' END AS origin
    FROM nodes
)""".strip()
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
votes_{r} AS (
    SELECT e.src AS v, s.label AS nbr_label, count(*) AS n
    FROM sym e JOIN state_{r - 1} s ON s.v = e.dst
    WHERE s.label IS NOT NULL
    GROUP BY 1, 2
),
win_{r} AS (
    SELECT v, nbr_label AS vote FROM (
        SELECT v, nbr_label,
               row_number() OVER (PARTITION BY v ORDER BY n DESC, nbr_label ASC)
                   AS rk
        FROM votes_{r}
    ) q WHERE rk = 1
),
state_{r} AS (
    SELECT s.v,
           COALESCE(s.label, w.vote) AS label,
           CASE WHEN s.label IS NULL AND w.vote IS NOT NULL
                THEN 'propagated' ELSE s.origin END AS origin
    FROM state_{r - 1} s LEFT JOIN win_{r} w USING (v)
)""".strip()
        )
    body = ",\n".join(parts)
    return f"{body}\nSELECT v, label, origin FROM state_{rounds}"


def crawl_frontier_sql(frontier_ext_sql: str, k: int = 50) -> str:
    """Mirrors plans/ingest.py::crawl_frontier over
    doc_pages_with_frontier: internal link rows are rebuilt from the
    same (doc_id*k) % 211 construction the html embeds (targets may be
    uncrawled when the corpus is smaller than the modulus), external
    rows come from `frontier_ext_sql`; the crawled set is the page
    url universe."""
    internal = "\nUNION ALL\n".join(
        f"SELECT 'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example/d/' || "
        f"CAST(doc_id AS VARCHAR) AS src_url, "
        f"'https://h' || CAST(((doc_id * {kk}) % 211) % 13 AS VARCHAR) || "
        f"'.example/d/' || CAST((doc_id * {kk}) % 211 AS VARCHAR) AS dst_url "
        f"FROM documents"
        for kk in (3, 5, 7)
    )
    return f"""
WITH links AS (
{internal}
UNION ALL
{frontier_ext_sql}
),
crawled AS (
    SELECT DISTINCT 'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
           '.example/d/' || CAST(doc_id AS VARCHAR) AS url
    FROM documents
),
uncrawled AS (
    SELECT l.dst_url AS url,
           regexp_extract(l.src_url, '^https?://([^/]+)', 1) AS src_host
    FROM links l LEFT JOIN crawled c ON l.dst_url = c.url
    WHERE c.url IS NULL
)
SELECT url, CAST(count(*) AS BIGINT) AS n_inlinks,
       CAST(count(DISTINCT src_host) AS BIGINT) AS n_src_hosts
FROM uncrawled GROUP BY url
ORDER BY n_inlinks DESC, n_src_hosts DESC, url ASC LIMIT {k}
""".strip()


def edge_churn_sql(old_sql: str, new_sql: str, group_mod: int = 13) -> str:
    """Mirrors operators/temporal.py::edge_snapshot_diff +
    edge_churn_by_group with group = src % group_mod."""
    return f"""
WITH a AS (SELECT DISTINCT src, dst FROM ({old_sql}) t),
b AS (SELECT DISTINCT src, dst FROM ({new_sql}) t),
d AS (
    SELECT COALESCE(a.src, b.src) AS src,
           CASE WHEN a.src IS NOT NULL AND b.src IS NOT NULL THEN 'kept'
                WHEN b.src IS NOT NULL THEN 'added'
                ELSE 'removed' END AS status
    FROM a FULL OUTER JOIN b ON a.src = b.src AND a.dst = b.dst
)
SELECT src % {group_mod} AS grp,
       CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST((sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)
             + sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)) * 1000000
            // greatest(count(*), 1) AS BIGINT) AS churn_ppm
FROM d GROUP BY grp ORDER BY grp
""".strip()


def component_sizes_sql(raw_sql: str) -> str:
    """Component-size histogram over components_sql's labeling."""
    return f"""
SELECT size, CAST(count(*) AS BIGINT) AS n_components
FROM (
    SELECT component, CAST(count(*) AS BIGINT) AS size
    FROM ({components_sql(raw_sql)}) labels
    GROUP BY component
) s
GROUP BY size ORDER BY size
""".strip()


def pagerank_warm_sql(
    old_sql: str,
    new_sql: str,
    iters_old: int,
    iters_new: int,
    damping: float = 0.85,
    ndigits: int = 6,
) -> str:
    """Mirrors pagerank(..., init_ranks=<previous crawl's published
    ranks>): phase A = the full `iters_old`-iteration unrolling on the
    OLD graph (nested CTE, already rounded — the hand-off is the
    rounded published artifact on both engines, so it is bit-identical
    before phase B starts); phase B = `iters_new` iterations on the
    NEW graph warm-started from it, new vertices cold at 1/n."""
    d = damping
    warm = pagerank_sql(old_sql, iters_old, damping, ndigits)
    ctes = [
        f"warm AS ({warm})",
        f"raw AS ({new_sql})",
        "e AS (SELECT DISTINCT src, dst FROM raw)",
        "vs AS (SELECT src AS v FROM e UNION SELECT dst AS v FROM e)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vs)",
        """od AS (
            SELECT vs.v, coalesce(o.outdeg, 0) AS outdeg
            FROM vs LEFT JOIN (
                SELECT src AS v, count(*) AS outdeg FROM e GROUP BY src
            ) o ON o.v = vs.v
        )""",
        """r0 AS (
            SELECT vs.v, coalesce(w.pr, 1.0 / nn.n) AS pr
            FROM vs CROSS JOIN nn LEFT JOIN warm w ON w.v = vs.v
        )""",
    ]
    step = (
        f"(1.0 - {d}) / nn.n"
        f" + {d} * (coalesce(c.contrib, 0.0) + dang.dangling / nn.n) AS pr"
    )
    for i in range(1, iters_new + 1):
        prev = f"r{i - 1}"
        ctes.append(
            f"""r{i} AS (
            SELECT od.v AS v,
                   {step}
            FROM od
            CROSS JOIN nn
            CROSS JOIN (
                SELECT coalesce(sum(p.pr), 0.0) AS dangling
                FROM {prev} p JOIN od ON od.v = p.v WHERE od.outdeg = 0
            ) dang
            LEFT JOIN (
                SELECT e.dst AS v, sum(p.pr / od.outdeg) AS contrib
                FROM e
                JOIN {prev} p ON p.v = e.src
                JOIN od ON od.v = e.src
                GROUP BY e.dst
            ) c ON c.v = od.v
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v, round(pr, {ndigits}) AS pr FROM r{iters_new}"
    )


def incremental_components_sql(full_union_sql: str) -> str:
    """Oracle for operators/components.py::incremental_components —
    exactness means EQUALITY WITH THE FULL RECOMPUTE, so the oracle is
    simply components_sql over the whole (old ∪ added) edge set; the
    engine side never reads the old edges."""
    return components_sql(full_union_sql)


def url_templates_sql(k: int = 100) -> str:
    """Mirrors plans/ingest.py::url_templates over the canonicalized
    dirty-url derivation (host kept, digit runs in the path collapsed
    to {d})."""
    return f"""
WITH canon AS ({canonical_urls_sql()}),
t AS (
    SELECT regexp_extract(url_canonical, '^https?://([^/]+)', 1) AS host,
           regexp_replace(
               regexp_extract(url_canonical,
                              '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/#?]*(.*)$', 1),
               '[0-9]+', '{{d}}', 'g') AS template
    FROM canon
)
SELECT host, template, CAST(count(*) AS BIGINT) AS n_urls
FROM t WHERE host <> ''
GROUP BY host, template
ORDER BY n_urls DESC, host ASC, template ASC LIMIT {k}
""".strip()


def backlink_report_sql(k_per_host: int = 3) -> str:
    """Mirrors plans/ingest.py::backlink_report over the
    doc_pages_hosted link structure (hosts h<doc_id%13>.example,
    targets (doc_id*k) % 211 for k in 3,5,7)."""
    link_rows = "\nUNION ALL\n".join(
        f"SELECT 'h' || CAST(doc_id % 13 AS VARCHAR) || '.example' AS src_host, "
        f"'h' || CAST(((doc_id * {kk}) % 211) % 13 AS VARCHAR) || '.example' AS dst_host "
        f"FROM documents"
        for kk in (3, 5, 7)
    )
    return f"""
WITH links AS ({link_rows}),
hg AS (
    SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
    FROM links WHERE src_host <> dst_host
    GROUP BY src_host, dst_host
),
ranked AS (
    SELECT dst_host, src_host, n_links,
           CAST(row_number() OVER (
               PARTITION BY dst_host ORDER BY n_links DESC, src_host ASC
           ) AS INTEGER) AS rank
    FROM hg
)
SELECT dst_host, src_host, n_links, rank
FROM ranked WHERE rank <= {k_per_host}
ORDER BY dst_host, rank
""".strip()


def orphan_pages_sql(k: int = 100) -> str:
    """Mirrors plans/ingest.py::orphan_pages over doc_pages_hosted:
    crawled urls never appearing as a link target."""
    target_rows = "\nUNION ALL\n".join(
        f"SELECT 'https://h' || CAST(((doc_id * {kk}) % 211) % 13 AS VARCHAR) || "
        f"'.example/d/' || CAST((doc_id * {kk}) % 211 AS VARCHAR) AS url FROM documents"
        for kk in (3, 5, 7)
    )
    return f"""
WITH crawled AS (
    SELECT 'https://h' || CAST(doc_id % 13 AS VARCHAR) ||
           '.example/d/' || CAST(doc_id AS VARCHAR) AS url
    FROM documents
),
targets AS ({target_rows})
SELECT c.url FROM crawled c LEFT JOIN (SELECT DISTINCT url FROM targets) t
ON c.url = t.url WHERE t.url IS NULL
ORDER BY c.url LIMIT {k}
""".strip()


def bpe_pair_counts_sql(k: int = 100) -> str:
    """Mirrors operators/textstats.py::bpe_pair_counts — adjacent
    token pairs via positional zip of the token array with its tail."""
    return rf"""
WITH toks AS (
    SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
),
pairs AS (
    SELECT t[i] AS lft, t[i + 1] AS rgt
    FROM toks, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)
    WHERE len(t) >= 2
)
SELECT lft AS "left", rgt AS "right", CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY lft, rgt
ORDER BY n_pairs DESC, lft ASC, rgt ASC LIMIT {k}
""".strip()


def pack_sequences_sql(context_len: int = 512) -> str:
    """Mirrors operators/textstats.py::pack_sequences — doc_id-ordered
    token cumsum, bin = start DIV context_len."""
    return rf"""
WITH toks AS (
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n
    FROM documents
),
laid AS (
    SELECT n,
           coalesce(sum(n) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS start
    FROM toks
)
SELECT start // {context_len} AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens
FROM laid GROUP BY bin ORDER BY bin
""".strip()


def mixture_weights_sql() -> str:
    """Mirrors operators/textstats.py::mixture_weights — IEEE sqrt is
    correctly rounded (deterministic cross-engine, unlike ln/exp), the
    rest is integer arithmetic."""
    return r"""
WITH per AS (
    SELECT lang,
           CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\s+'))) AS BIGINT)
               AS total_tokens
    FROM documents GROUP BY lang
),
rooted AS (
    SELECT lang, total_tokens,
           CAST(floor(sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT) AS sqrt_tokens
    FROM per
),
total AS (SELECT CAST(sum(sqrt_tokens) AS BIGINT) AS denom FROM rooted)
SELECT lang, total_tokens, sqrt_tokens,
       CAST(sqrt_tokens * 1000000 // denom AS BIGINT) AS weight_ppm
FROM rooted CROSS JOIN total ORDER BY lang
""".strip()


def bloom_url_seen_sql(m_bits: int = 1 << 16, k_hashes: int = 5) -> str:
    """Mirrors the bloom url-seen composition: filter built over the
    crawled urls (doc_pages_hosted), probed with every link target of
    doc_pages_with_frontier (internal + external); false positives are
    the sketch contract, false negatives impossible."""
    h = _h64("'bloom' || CAST(i AS VARCHAR) || ':' || url")
    crawled_url = (
        "'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.example/d/' || "
        "CAST(doc_id AS VARCHAR)"
    )
    internal_targets = "\nUNION ALL\n".join(
        f"SELECT 'https://h' || CAST(((doc_id * {kk}) % 211) % 13 AS VARCHAR) || "
        f"'.example/d/' || CAST((doc_id * {kk}) % 211 AS VARCHAR) AS url FROM documents"
        for kk in (3, 5, 7)
    )
    return f"""
WITH crawled AS (SELECT DISTINCT {crawled_url} AS url FROM documents),
hs AS (SELECT unnest(generate_series(0, {k_hashes - 1})) AS i),
positions AS (
    SELECT DISTINCT {h} % {m_bits} AS pos FROM crawled CROSS JOIN hs
),
targets AS (
    SELECT DISTINCT url FROM (
{internal_targets}
UNION ALL
SELECT 'https://ext.example/p/' || CAST((doc_id * 11) % 97 AS VARCHAR) AS url
FROM documents
    ) t
),
hits AS (
    SELECT t.url, count(*) AS n_hit
    FROM targets t CROSS JOIN hs
    JOIN positions p ON {_h64("'bloom' || CAST(i AS VARCHAR) || ':' || t.url")} % {m_bits} = p.pos
    GROUP BY t.url
)
SELECT t.url,
       coalesce(h.n_hit, 0) = {k_hashes} AS maybe_seen,
       c.url IS NOT NULL AS truly_seen,
       (coalesce(h.n_hit, 0) = {k_hashes}) AND c.url IS NULL AS false_positive
FROM targets t
LEFT JOIN hits h ON h.url = t.url
LEFT JOIN crawled c ON c.url = t.url
ORDER BY t.url
""".strip()


def rank_churn_sql(
    old_sql: str,
    new_sql: str,
    iters_old: int,
    iters_new: int,
    k: int = 20,
) -> str:
    """Mirrors the rank-churn composition: previous ranks (full
    schedule on the old graph) joined to the warm-started re-rank on
    the new graph, top-k absolute movers in integer micro-rank.
    floor() of identical doubles is cross-engine identical; CAST of a
    near-integer double is not (truncate vs round)."""
    o = pagerank_sql(old_sql, iters_old)
    n = pagerank_warm_sql(old_sql, new_sql, iters_old, iters_new)
    return f"""
WITH o AS ({o}),
n AS ({n})
SELECT o.v, o.pr AS pr_old, n.pr AS pr_new,
       CAST(floor(n.pr * 1000000) - floor(o.pr * 1000000) AS BIGINT)
           AS delta_micro
FROM o JOIN n ON n.v = o.v
ORDER BY abs(CAST(floor(n.pr * 1000000) - floor(o.pr * 1000000) AS BIGINT)) DESC,
         o.v ASC
LIMIT {k}
""".strip()


def clustering_by_degree_sql(raw_sql: str | None = None) -> str:
    """Mirrors operators/clustering.py::clustering_by_degree — the
    c(k) curve with the per-class closed-wedge ratio in exact integer
    ppm (independent canonical-edge 3-path formulation, as
    local_clustering_sql)."""
    raw_sql = raw_sql or derived_edges_sql()
    return f"""
WITH raw AS ({raw_sql}),
und AS (
    SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
    FROM raw WHERE src <> dst
),
deg AS (
    SELECT v, count(*) AS degree FROM (
        SELECT src AS v FROM und UNION ALL SELECT dst AS v FROM und
    ) GROUP BY v
),
tri AS (
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM und e1
    JOIN und e2 ON e1.dst = e2.src
    JOIN und e3 ON e1.src = e3.src AND e2.dst = e3.dst
),
corners AS (
    SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
tcnt AS (SELECT v, count(*) AS t FROM corners GROUP BY v),
pv AS (
    SELECT d.degree, CAST(coalesce(t, 0) AS BIGINT) AS t
    FROM deg d LEFT JOIN tcnt ON d.v = tcnt.v
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_vertices,
       CAST(sum(t) AS BIGINT) AS total_triangles,
       CAST(CASE WHEN degree >= 2
            THEN sum(t) * 2 * 1000000 // (count(*) * degree * (degree - 1))
            ELSE 0 END AS BIGINT) AS closed_ppm
FROM pv GROUP BY degree
""".strip()


def lsh_dedup_eval_sql(
    threshold: float = 0.5, max_shingle_freq: int = 1000
) -> str:
    """Mirrors operators/evaluation.py::lsh_dedup_eval — recall and
    precision (exact integer ppm) of the banded-MinHash-LSH candidate
    pairs against the exact n-gram-Jaccard ground truth, composing the
    two production oracles as CTEs."""
    truth = ngram_jaccard_sql(threshold=threshold, max_shingle_freq=max_shingle_freq)
    cand = minhash_lsh_sql()
    return f"""
WITH truth AS ({truth}),
cand AS ({cand}),
m AS (
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
        (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
        (SELECT CAST(count(*) AS BIGINT)
         FROM truth t JOIN cand c
         ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_hits
)
SELECT n_truth, n_candidates, n_hits,
       CAST(CASE WHEN n_truth > 0 THEN n_hits * 1000000 // n_truth
            ELSE 0 END AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN n_candidates > 0 THEN n_hits * 1000000 // n_candidates
            ELSE 0 END AS BIGINT) AS precision_ppm
FROM m
""".strip()


def ivf_recall_sql(
    k: int = 5,
    query_limit: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    num_iters: int = 3,
) -> str:
    """Mirrors operators/evaluation.py::ivf_recall_eval — per-query
    recall@k (exact integer ppm) of the IVF candidates against the
    exact brute-force cosine top-k, composing the two production
    oracles as CTEs."""
    truth = cosine_topk_sql(k=k, query_limit=query_limit)
    cand = ivf_topk_sql(
        k=k,
        query_limit=query_limit,
        n_clusters=n_clusters,
        nprobe=nprobe,
        num_iters=num_iters,
    )
    return f"""
WITH truth AS ({truth}),
cand AS ({cand})
SELECT t.query_id,
       CAST(count(*) AS BIGINT) AS n_truth,
       CAST(count(c.vec_id) AS BIGINT) AS n_hits,
       CAST(CASE WHEN count(*) > 0
            THEN count(c.vec_id) * 1000000 // count(*)
            ELSE 0 END AS BIGINT) AS recall_ppm
FROM truth t
LEFT JOIN cand c ON c.query_id = t.query_id AND c.vec_id = t.vec_id
GROUP BY t.query_id
""".strip()


def minhash_estimate_eval_sql() -> str:
    """Mirrors operators/evaluation.py::minhash_estimate_eval — the
    MinHash-estimate-vs-exact-Jaccard calibration on the LSH candidate
    pairs (same mh/bands chain as minhash_lsh_sql; pair-restricted
    exact intersection)."""
    mins = ",\n           ".join(
        "min(" + _h64(f"'{i}:' || shingle") + f") AS h{i}"
        for i in range(_NUM_HASHES)
    )
    band_rows = []
    for b in range(_BANDS):
        cols = " || ',' || ".join(
            f"CAST(h{b * _ROWS + r} AS VARCHAR)" for r in range(_ROWS)
        )
        band_rows.append(f"SELECT doc_id, md5({cols}) AS band_sig FROM mh")
    bands_union = "\n    UNION ALL\n    ".join(band_rows)
    matches = " + ".join(
        f"(CASE WHEN ma.h{i} = mb.h{i} THEN 1 ELSE 0 END)"
        for i in range(_NUM_HASHES)
    )
    return f"""
WITH {_SHINGLE_CTE},
mh AS (
    SELECT doc_id,
           {mins}
    FROM sh GROUP BY doc_id
),
bands AS (
    {bands_union}
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
est AS (
    SELECT c.doc_a, c.doc_b, CAST({matches} AS BIGINT) AS m
    FROM cand c
    JOIN mh ma ON ma.doc_id = c.doc_a
    JOIN mh mb ON mb.doc_id = c.doc_b
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS i
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
)
SELECT e.doc_a, e.doc_b,
       e.m * 1000000 // {_NUM_HASHES} AS est_ppm,
       coalesce(i.i, 0) * 1000000 // (sa.sz + sb.sz - coalesce(i.i, 0)) AS true_ppm,
       abs(e.m * 1000000 // {_NUM_HASHES}
           - coalesce(i.i, 0) * 1000000 // (sa.sz + sb.sz - coalesce(i.i, 0)))
           AS abs_err_ppm
FROM est e
LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN sizes sa ON sa.doc_id = e.doc_a
JOIN sizes sb ON sb.doc_id = e.doc_b
""".strip()
