"""Derived graphs over the driver's TPC-H-ish parquet testdata.

The correctness harness compares every Spark query against DuckDB SQL
over the same parquet files, so graph inputs are DERIVED
deterministically from those tables: foreign-key pairs folded into one
vertex id space with a modulus. Both sides (Spark here, SQL in
`oracles.py`) use the identical derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Default derivation: lineitem (orderkey, partkey) folded mod a prime.
# At sf0.01 (~60k lineitem rows) this gives a dense-ish multigraph on
# ≤601 vertices with plenty of triangles, duplicate edges, and skew.
TRI_MODULUS = 601
# Sparser graph for iterative algorithms (PageRank / CC / LP): fewer
# edges per vertex keeps unrolled SQL oracles tractable.
ITER_MODULUS = 499


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def derived_edges(
    spark: SparkSession,
    sf_dir: str,
    modulus: int = TRI_MODULUS,
    table: str = "lineitem",
    a: str = "l_orderkey",
    b: str = "l_partkey",
) -> DataFrame:
    """Deterministic dirty edge table (self loops + duplicates included
    — the preprocessing pipeline must clean them, as the reference
    parser does at tc.cu:599-670)."""
    df = load(spark, sf_dir, table)
    return df.select(
        (F.col(a) % modulus).alias("src"), (F.col(b) % modulus).alias("dst")
    )


def derived_edges_sql(
    modulus: int = TRI_MODULUS,
    table: str = "lineitem",
    a: str = "l_orderkey",
    b: str = "l_partkey",
) -> str:
    """The same derivation as ANSI SQL (DuckDB oracle side)."""
    return f"SELECT {a} % {modulus} AS src, {b} % {modulus} AS dst FROM {table}"


def derived_pagerank_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed graph for PageRank: orders (custkey → orderkey) folded."""
    df = load(spark, sf_dir, "orders")
    return df.select(
        (F.col("o_custkey") % ITER_MODULUS).alias("src"),
        (F.col("o_orderkey") % ITER_MODULUS).alias("dst"),
    )


def derived_pagerank_edges_sql() -> str:
    return (
        f"SELECT o_custkey % {ITER_MODULUS} AS src, "
        f"o_orderkey % {ITER_MODULUS} AS dst FROM orders"
    )


def derived_weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted directed graph: the pagerank derivation plus a
    deterministic positive weight (the host-graph n_links analogue)."""
    df = load(spark, sf_dir, "orders")
    return df.select(
        (F.col("o_custkey") % ITER_MODULUS).alias("src"),
        (F.col("o_orderkey") % ITER_MODULUS).alias("dst"),
        ((F.col("o_orderkey") % 7) + 1).cast("double").alias("w"),
    )


def derived_weighted_edges_sql() -> str:
    return (
        f"SELECT o_custkey % {ITER_MODULUS} AS src, "
        f"o_orderkey % {ITER_MODULUS} AS dst, "
        "CAST(o_orderkey % 7 + 1 AS DOUBLE) AS w FROM orders"
    )


# Sparser directed graph for SCC / bow-tie: a filtered orders slice on
# a wider vertex space gives avg degree ~3 — real cycles AND real
# periphery (IN/OUT/tendrils), unlike the dense pagerank derivation
# whose giant SCC swallows nearly every vertex.
SCC_MODULUS = 1499


def derived_directed_sparse_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed graph for SCC / bow-tie: filtered orders folded mod
    SCC_MODULUS."""
    df = load(spark, sf_dir, "orders")
    return df.filter((F.col("o_orderkey") % 7) < 2).select(
        (F.col("o_custkey") % SCC_MODULUS).alias("src"),
        (F.col("o_orderkey") % SCC_MODULUS).alias("dst"),
    )


def derived_directed_sparse_edges_sql() -> str:
    return (
        f"SELECT o_custkey % {SCC_MODULUS} AS src, "
        f"o_orderkey % {SCC_MODULUS} AS dst "
        "FROM orders WHERE o_orderkey % 7 < 2"
    )


# Functional redirect graph: URLs 0..996; a URL v redirects to the
# pseudo-random (31v+7) mod 997 UNLESS v ≡ 0 (mod 3) — those are the
# terminal pages (~1/3 of the universe). Chains are geometric (mean ~3
# hops, tail well under 2^6), and the affine successor makes the
# derivation a pure function of v so both engines build the identical
# graph from the orders table regardless of row multiplicity.
REDIR_MODULUS = 997


def derived_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "orders")
    v = F.col("o_orderkey") % REDIR_MODULUS
    return df.filter(v % 3 != 0).select(
        v.alias("src"),
        ((v * 31 + 7) % REDIR_MODULUS).alias("dst"),
    )


def derived_redirects_sql() -> str:
    m = REDIR_MODULUS
    return (
        f"SELECT o_orderkey % {m} AS src, "
        f"((o_orderkey % {m}) * 31 + 7) % {m} AS dst "
        f"FROM orders WHERE (o_orderkey % {m}) % 3 <> 0"
    )


def derived_planted_core_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse background graph + a planted dense core on vertices
    0..36 (a lineitem slice folded mod 37 — near-clique): the graph
    shape densest-subgraph mining exists for. Background density
    ~2.9, core density ~17 — the greedy peel must strip the
    background to find the core, exercising best_round > 0."""
    bg = derived_directed_sparse_edges(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    core = li.filter((F.col("l_orderkey") % 20) == 0).select(
        (F.col("l_orderkey") % 37).alias("src"),
        (F.col("l_partkey") % 37).alias("dst"),
    )
    return bg.unionByName(core)


def derived_planted_core_edges_sql() -> str:
    return (
        f"{derived_directed_sparse_edges_sql()} "
        "UNION ALL "
        "SELECT l_orderkey % 37 AS src, l_partkey % 37 AS dst "
        "FROM lineitem WHERE l_orderkey % 20 = 0"
    )
