"""KMV (k-minimum-values) distinct-cardinality sketch — the
bottom-k estimator, built deterministic so the DuckDB oracle
reproduces it bit-for-bit.

The classic sketch trade: estimate |distinct| from only the k
smallest hash values. With the repo's md5-derived 60-bit hash the
sketch is a pure column expression — no RNG, no sketch state object,
no approx_count_distinct blackbox — so (a) two engines agree exactly,
(b) sketches of PARTITIONS of a dataset merge by taking the k
smallest of the union (the property that makes bottom-k the standard
distributed-cardinality primitive), and (c) the estimate is
reproducible across runs and cluster sizes.

    est = floor((k-1) · 2^60 / h_(k))   (h_(k) = k-th smallest hash)

computed as the IDENTICAL IEEE-double expression on both engines:
(k−1)·2^60 is exact in a double (small mantissa × power of two), the
hash converts with the same nearest-even rounding on both sides, and
the same division + floor of the same doubles is bit-deterministic —
whereas decimal division rounds at engine-specific scales.

Plan: distinct → hash → global bottom-k (TakeOrdered, k rows to the
driver-side sort — never the full value set) → one-row fold. The
exact count rides along for the calibration column; a production
call at 100 TB would drop it (the sketch exists to avoid it) — it is
here because the oracle cell then also certifies the ERROR, not just
the estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .walks import _h64


def kmv_distinct(
    values: DataFrame, column: str, k: int = 256, salt: str = "kmv"
) -> DataFrame:
    """One row: (n_exact, k, kth_hash, est_distinct, err_ppm) for the
    distinct values of `column`. If fewer than k distinct values
    exist, the estimate IS the exact count (the sketch is exact below
    its capacity)."""
    # NULLs are excluded from the cardinality on BOTH sides (the
    # oracle's `||` would null the hash while concat_ws would not —
    # filtering first removes the divergence)
    distinct = (
        values.select(F.col(column).cast("string").alias("val"))
        .filter(F.col("val").isNotNull())
        .distinct()
    )
    h = _h64(F.concat_ws(":", F.lit(salt), F.col("val")))
    hashes = distinct.select(h.alias("h")).orderBy("h").limit(k)
    bottom = hashes.agg(
        F.count(F.lit(1)).alias("n_in_sketch"),
        F.max("h").alias("kth_hash"),
    )
    exact = distinct.agg(F.count(F.lit(1)).alias("n_exact"))
    est = F.when(
        F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("long")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1))
            * F.lit(float(2**60))
            / F.col("kth_hash").cast("double")
        ).cast("long")
    )
    return (
        exact.crossJoin(F.broadcast(bottom))
        .select(
            "n_exact",
            F.lit(k).cast("long").alias("k"),
            F.col("kth_hash"),
            est.alias("est_distinct"),
        )
        .select(
            "n_exact",
            "k",
            "kth_hash",
            "est_distinct",
            F.expr(
                "abs(est_distinct - n_exact) * 1000000 DIV greatest(n_exact, 1)"
            ).alias("err_ppm"),
        )
    )


# -- HyperLogLog ---------------------------------------------------------

HLL_P = 8  # 2^8 = 256 registers
_HLL_M = 1 << HLL_P
# alpha_m for m = 256 (Flajolet et al. 2007); the Python-computed
# double is embedded as its exact repr in BOTH engines' expressions so
# each parses the identical IEEE value
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# 60-bit hash = 8 register-index bits (top) + 52 rank bits (bottom)
_HLL_REST_BITS = 60 - HLL_P
# alpha * m^2 * 2^52: m^2 * 2^52 = 2^68 is a power of two, so the
# product is ONE correctly-rounded multiply — identical both engines
_HLL_NUM = _HLL_ALPHA * float(_HLL_M * _HLL_M) * float(1 << _HLL_REST_BITS)


def hll_distinct(
    values: DataFrame, column: str, salt: str = "hll", caches: list | None = None
) -> DataFrame:
    """HyperLogLog distinct-cardinality sketch over `column`, built
    from pure integer column expressions so the DuckDB oracle
    replays it bit-for-bit (no approx_count_distinct blackbox, no RNG).

    Register layout: h = 60-bit md5 hash; register index = top 8 bits
    (h DIV 2^52); rank rho = 1 + leading zeros of the remaining 52
    bits, computed EXACTLY as 53 - length(bin(rest)) (rest = 0 => 53)
    — no transcendental log anywhere. The harmonic denominator
    sum(2^-M_j) is kept in INTEGER units of 2^-52:

        S = sum_j 2^(52 - M_j)    (M_j = 0 for empty registers)

    max S = 256 * 2^52 = 2^60, exact in int64 and order-independent
    (double-sum ordering varies with partitioning; integer sum does
    not). The raw estimate floor(alpha * m^2 * 2^52 / S) is then one
    double divide of exact integers — bit-deterministic cross-engine,
    the same discipline as kmv_distinct. Small/large-range bias
    corrections (linear counting / 32-bit wraparound) are a driver-side
    post-step at deployment; the certified columns expose v_zero and
    the exact count so the error is part of the contract.

    Why alongside KMV: HLL registers merge by ELEMENTWISE MAX — the
    merge a 1000-executor tree aggregation needs (KMV merges by global
    bottom-k, which needs a second ranking pass). One hash agg of
    #distinct rows -> 256-row state -> 1-row fold.
    """
    # the distinct set feeds the register build AND the certification
    # count — persist it or both branches re-scan and re-shuffle the
    # corpus (production drops the exact branch entirely; the persist
    # holds #distinct rows, the operator's inherent state)
    distinct = (
        values.select(F.col(column).cast("string").alias("val"))
        .filter(F.col("val").isNotNull())
        .distinct()
        .persist()
    )
    exact = distinct.agg(F.count(F.lit(1)).alias("n_exact"))
    out = hll_from_registers(hll_register_table(distinct, "val", salt), exact)
    from .checkpointing import finish_with_caches

    return finish_with_caches(out, [distinct], caches)


def hll_register_table(
    values: DataFrame, column: str, salt: str = "hll"
) -> DataFrame:
    """The (reg, m_j) register table — the MERGEABLE sketch state.
    Duplicate values map to identical (reg, rho) pairs and are
    absorbed by the max, so the input does NOT need to be distinct:
    this is the form a streaming aggregation maintains incrementally
    (streaming/sketches.py) and a tree aggregation merges by
    elementwise max."""
    vals = values.select(F.col(column).cast("string").alias("val")).filter(
        F.col("val").isNotNull()
    )
    h = _h64(F.concat_ws(":", F.lit(salt), F.col("val")))
    # integer bit split — NOT `/` (double division drops bits of a
    # 60-bit value above the 2^53 mantissa)
    rest_mod = 1 << _HLL_REST_BITS
    hashed = vals.select(
        F.shiftright(h, _HLL_REST_BITS).alias("reg"),
        (h % rest_mod).alias("rest"),
    )
    # rho = leading zeros of the 52-bit field + 1; bin() drops leading
    # zeros so length(bin(rest)) = floor(log2(rest)) + 1 exactly
    rho = F.when(F.col("rest") == 0, F.lit(_HLL_REST_BITS + 1)).otherwise(
        F.lit(_HLL_REST_BITS + 1) - F.length(F.bin(F.col("rest")))
    )
    return hashed.groupBy("reg").agg(F.max(rho).alias("m_j"))


def hll_from_registers(regs: DataFrame, exact: DataFrame) -> DataFrame:
    """Fold a register table into the 1-row sketch report; `exact` is
    a 1-row (n_exact) frame for the certified-error columns."""
    folded = regs.agg(
        F.count(F.lit(1)).alias("n_regs"),
        # SQL shiftleft: the DataFrame helper only takes a literal bit
        # count, the SQL form takes the m_j column
        F.expr(
            f"sum(shiftleft(CAST(1 AS BIGINT), {_HLL_REST_BITS} - m_j))"
        ).alias("s_present"),
    )
    est = F.floor(
        F.lit(_HLL_NUM) / F.col("harmonic_sum").cast("double")
    ).cast("long")
    return (
        exact.crossJoin(F.broadcast(folded))
        .select(
            "n_exact",
            F.lit(_HLL_M).cast("long").alias("m"),
            (F.lit(_HLL_M) - F.col("n_regs")).cast("long").alias("v_zero"),
            (
                F.col("s_present")
                + (F.lit(_HLL_M) - F.col("n_regs"))
                * F.lit(1 << _HLL_REST_BITS).cast("long")
            ).alias("harmonic_sum"),
        )
        .select(
            "n_exact",
            "m",
            "v_zero",
            "harmonic_sum",
            est.alias("est_distinct"),
        )
        .select(
            "*",
            F.expr(
                "abs(est_distinct - n_exact) * 1000000 DIV greatest(n_exact, 1)"
            ).alias("err_ppm"),
        )
    )


# -- Count-min sketch ----------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 1024


def countmin_estimates(
    values: DataFrame,
    column: str,
    probe_k: int = 20,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Count-min sketch over the (multiset) value stream of `column`,
    probed at the `probe_k` most frequent values so the oracle cell
    certifies the ESTIMATES AND THEIR ERROR, not just sketch plumbing.

    Returns (val, n_exact, est_n, over_ppm) — est_n >= n_exact always
    (count-min never undercounts), over_ppm = relative overcount.

    Sketch build: each occurrence increments one bucket per hash row
    (bucket = md5-derived 60-bit hash of "cm<r>:<val>" mod width) —
    expressed as explode(rows) + ONE hash aggregation with map-side
    combine, so the shuffle carries at most depth*width = 4096
    counter rows per partition regardless of input size. Estimate =
    min over rows of the probed bucket. Everything is integer
    arithmetic on the same md5-derived hashes both engines compute —
    the estimate is deterministic, partition-independent, and
    mergeable (counters add), which is what makes count-min the
    standard distributed heavy-hitter primitive.
    """
    vals = values.select(F.col(column).cast("string").alias("val")).filter(
        F.col("val").isNotNull()
    )
    sketch = countmin_sketch_table(vals, "val", depth, width)
    probes = (
        vals.groupBy("val")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("val"))
        .limit(probe_k)
    )
    return countmin_probe(sketch, probes, depth, width)


def countmin_sketch_table(
    values: DataFrame, column: str, depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> DataFrame:
    """The (r, b, cnt) counter table — the MERGEABLE sketch state
    (counters of partitions/micro-batches ADD), maintained
    incrementally by a streaming aggregation (streaming/sketches.py)."""
    vals = values.select(F.col(column).cast("string").alias("val")).filter(
        F.col("val").isNotNull()
    )
    rows = F.array(*[F.lit(r) for r in range(depth)])
    buckets = vals.select(
        F.explode(rows).alias("r"),
        (
            _h64(F.concat_ws(":", F.concat(F.lit("cm"), F.col("r")), F.col("val")))
            % width
        ).alias("b"),
    )
    return buckets.groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt"))


def countmin_probe(
    sketch: DataFrame,
    probes: DataFrame,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Estimate the probe values' frequencies from a counter table:
    probes = (val, n_exact); returns the certified estimate report."""
    rows = F.array(*[F.lit(r) for r in range(depth)])
    probe_buckets = probes.select(
        "val",
        "n_exact",
        F.explode(rows).alias("r"),
    ).select(
        "val",
        "n_exact",
        "r",
        (
            _h64(F.concat_ws(":", F.concat(F.lit("cm"), F.col("r")), F.col("val")))
            % width
        ).alias("b"),
    )
    return (
        probe_buckets.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("val", "n_exact")
        .agg(F.min("cnt").alias("est_n"))
        .select(
            "val",
            "n_exact",
            "est_n",
            F.expr("(est_n - n_exact) * 1000000 DIV greatest(n_exact, 1)").alias(
                "over_ppm"
            ),
        )
        .orderBy(F.desc("n_exact"), F.asc("val"))
    )


# -- Bloom filter ----------------------------------------------------------

BLOOM_BITS = 1 << 16
BLOOM_HASHES = 5


def bloom_positions(
    values: DataFrame,
    column: str,
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_HASHES,
    salt: str = "bloom",
) -> DataFrame:
    """The filter's SET BIT POSITIONS as a 1-column table (pos) — the
    relational form of the bit array (dense packing into longs is a
    storage detail; the positions relation is what joins). Bit i of
    value v is md5("bloom<i>:<v>") % m — the same expression both
    engines compute, so the filter is deterministic, and two filters
    union by... union (bit OR == set union of positions). At most
    m_bits rows regardless of input size: the crawl's url-seen state
    in 2^16 rows."""
    vals = values.select(F.col(column).cast("string").alias("val")).filter(
        F.col("val").isNotNull()
    )
    hashes = F.array(*[F.lit(i) for i in range(k_hashes)])
    return (
        vals.select(F.explode(hashes).alias("i"), "val")
        .select(
            (
                _h64(
                    F.concat_ws(
                        ":", F.concat(F.lit(salt), F.col("i")), F.col("val")
                    )
                )
                % m_bits
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    positions: DataFrame,
    probes: DataFrame,
    column: str,
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_HASHES,
    salt: str = "bloom",
) -> DataFrame:
    """Membership test: a probe value is maybe_seen iff ALL k of its
    bit positions are set. Returns (val, maybe_seen). The positions
    table is m_bits rows max — broadcast it; the probe side is never
    shuffled. False positives are the sketch contract (rate ≈
    (1 - e^{-kn/m})^k); false negatives are impossible, which is the
    property a url-seen filter actually relies on (never re-crawl
    what was crawled; occasionally skip a new url)."""
    vals = probes.select(F.col(column).cast("string").alias("val")).filter(
        F.col("val").isNotNull()
    )
    hashes = F.array(*[F.lit(i) for i in range(k_hashes)])
    pb = vals.select(
        "val",
        F.explode(hashes).alias("i"),
    ).select(
        "val",
        (
            _h64(F.concat_ws(":", F.concat(F.lit(salt), F.col("i")), F.col("val")))
            % m_bits
        ).alias("pos"),
    )
    hit = pb.join(F.broadcast(positions), "pos").groupBy("val").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        vals.distinct()
        .join(hit, "val", "left")
        .select(
            "val",
            (F.coalesce(F.col("n_hit"), F.lit(0)) == k_hashes).alias("maybe_seen"),
        )
    )


# -- sketch merges ---------------------------------------------------------

def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union HLL register tables by elementwise max — the merge a
    tree aggregation / multi-datacenter rollup performs. The merged
    table estimates the cardinality of the UNION of the inputs'
    underlying sets (registers are max-stable, so merging sketches of
    overlapping sets never double-counts)."""
    it = iter(register_tables)
    out = next(it)
    for regs in it:
        out = out.unionByName(regs)
    return out.groupBy("reg").agg(F.max("m_j").alias("m_j"))


def countmin_merge(*counter_tables: DataFrame) -> DataFrame:
    """Add count-min counter tables — the merge of shard-local
    sketches; estimates over the merged table cover the concatenated
    streams (counters are linear)."""
    it = iter(counter_tables)
    out = next(it)
    for cnts in it:
        out = out.unionByName(cnts)
    return out.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))


def bloom_merge(*position_tables: DataFrame) -> DataFrame:
    """OR bloom filters = union their set-bit positions."""
    it = iter(position_tables)
    out = next(it)
    for pos in it:
        out = out.unionByName(pos)
    return out.distinct()
