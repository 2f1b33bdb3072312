"""Dump formatted physical plans for the round-6 optimization targets.

Iterative operators return materialized (checkpointed) frames, so the
meaningful plan is ONE steady-state round. This tool rebuilds each
operator's round frame exactly as the operator constructs it (the
"before" builders replicate the round-5 code; after the refactor the
builders call the operators' round helpers directly) and writes
`.explain("formatted")` to plans/r06/<query>_<tag>.txt.

Usage: python tools/dump_plans_r06.py <before|after> [names...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import bench_edges, pr_edges  # noqa: E402
from wedge_parallel_triangle_counting_spark.operators.checkpointing import (  # noqa: E402
    loop_partitions,
)
from wedge_parallel_triangle_counting_spark.operators.graph import (  # noqa: E402
    build_sym_clustered,
    normalize_edges,
)
from wedge_parallel_triangle_counting_spark.session import get_spark  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2:])
OUT_DIR = os.path.join(REPO, "plans", "r06")
os.makedirs(OUT_DIR, exist_ok=True)

spark = get_spark(app_name=f"plans-r06-{TAG}")
spark.sparkContext.setLogLevel("ERROR")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NPART = loop_partitions(spark)


def dump(name: str, df, note: str = "") -> None:
    if ONLY and name not in ONLY:
        return
    path = os.path.join(OUT_DIR, f"{name}_{TAG}.txt")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(path, "w") as f:
        if note:
            f.write(f"# {note}\n\n")
        f.write(plan)
    print(f"wrote {path} ({len(plan.splitlines())} plan lines)")


def hits_round():
    """One steady-state HITS iteration (authority + hub half-steps +
    next state), as hits() builds it."""
    from wedge_parallel_triangle_counting_spark.operators import hits as H

    pe = pr_edges(spark, SF)
    if hasattr(H, "_round_frames"):  # post-refactor hook
        return H._round_frames(pe, NPART)
    e = (
        normalize_edges(pe)
        .filter(F.col("src") != F.col("dst"))
        .repartition(NPART, "dst")
        .dropDuplicates(["src", "dst"])
    )
    e_src = e.repartition(NPART, "src")
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .repartition(NPART, "v")
    )
    state = verts.select("v", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority"))
    a_un = (
        e_src.join(state.select(F.col("v").alias("src"), "hub"), "src")
        .filter(F.col("hub") != 0.0)
        .groupBy(F.col("dst").alias("v"))
        .agg(F.sum("hub").alias("a_raw"))
    )
    a_norm = a_un.agg(F.sqrt(F.coalesce(F.sum(F.col("a_raw") * F.col("a_raw")), F.lit(0.0))).alias("nrm"))
    a = a_un.crossJoin(F.broadcast(a_norm)).select(
        "v",
        F.when(F.col("nrm") > 0, F.col("a_raw") / F.col("nrm")).otherwise(F.lit(0.0)).alias("authority"),
    )
    h_un = (
        e.join(a.select(F.col("v").alias("dst"), "authority"), "dst")
        .groupBy(F.col("src").alias("v"))
        .agg(F.sum("authority").alias("h_raw"))
    )
    h_norm = h_un.agg(F.sqrt(F.coalesce(F.sum(F.col("h_raw") * F.col("h_raw")), F.lit(0.0))).alias("nrm"))
    h = h_un.crossJoin(F.broadcast(h_norm)).select(
        "v",
        F.when(F.col("nrm") > 0, F.col("h_raw") / F.col("nrm")).otherwise(F.lit(0.0)).alias("hub"),
    )
    return h.join(a, "v", "full").select(
        "v",
        F.coalesce("hub", F.lit(0.0)).alias("hub"),
        F.coalesce("authority", F.lit(0.0)).alias("authority"),
    )


def eigen_round():
    from wedge_parallel_triangle_counting_spark.operators import eigencentrality as E

    pe = pr_edges(spark, SF)
    if hasattr(E, "_round_frame"):
        return E._round_frame(pe, NPART)
    sym = build_sym_clustered(pe, NPART, key="src")
    state = (
        sym.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.lit(1.0).alias("score"))
    )
    raw = (
        sym.join(state.withColumnRenamed("v", "src"), "src")
        .groupBy(F.col("dst").alias("v"))
        .agg(F.sum("score").alias("x"))
    )
    nrm = raw.agg(F.sqrt(F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0.0))).alias("nrm"))
    return raw.crossJoin(F.broadcast(nrm)).select(
        "v",
        F.when(F.col("nrm") > 0, F.col("x") / F.col("nrm")).otherwise(F.lit(0.0)).alias("score"),
    )


def components_round():
    from wedge_parallel_triangle_counting_spark.operators import components as C

    pe = pr_edges(spark, SF)
    e = C._canonical_edges(pe)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).repartition(NPART, "src")
    labels = sym.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("component")
    )
    if hasattr(C, "_hashmin_round"):
        return C._hashmin_round(sym, labels, True)
    rhs = F.broadcast(labels)
    nbr_min = (
        sym.join(rhs, sym.dst == rhs.v)
        .select(F.col("src").alias("v"), F.col("component").alias("c"))
        .groupBy("v")
        .agg(F.min("c").alias("nbr_min"))
    )
    return labels.join(nbr_min, "v", "left").select(
        "v",
        F.least(
            F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
        ).alias("component"),
    )


def components_star_round():
    from wedge_parallel_triangle_counting_spark.operators import components as C

    pe = pr_edges(spark, SF)
    cur = C._canonical_edges(pe)
    if hasattr(C, "_star_round"):
        return C._star_round(cur)
    wsrc = Window.partitionBy("src")

    def _with_min(rel):
        return rel.withColumn("mn", F.min("dst").over(wsrc))

    nbrs = cur.select("src", "dst").unionByName(
        cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    large = (
        _with_min(nbrs)
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.least("mn", F.col("src")).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    nbrs2 = large.select("src", "dst").unionByName(
        large.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    self_rows = nbrs2.select(F.col("src"), F.col("src").alias("dst"))
    small_nbrs = nbrs2.filter(F.col("dst") < F.col("src")).unionByName(self_rows)
    small = (
        _with_min(small_nbrs)
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    return small.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()


def coreness_round():
    from wedge_parallel_triangle_counting_spark.operators import coreness as K

    pe = pr_edges(spark, SF)
    sym = build_sym_clustered(pe, NPART, key="dst")
    state = sym.groupBy(F.col("dst").alias("v")).agg(
        F.count(F.lit(1)).cast("int").alias("c")
    )
    if hasattr(K, "_hindex_round"):
        return K._hindex_round(sym, state)
    nbr_vals = sym.join(state, sym.dst == state.v).select(sym.src.alias("v"), "c")
    return (
        nbr_vals.groupBy("v")
        .agg(F.sort_array(F.collect_list("c"), asc=False).alias("vals"))
        .select("v", F.expr(f"CAST({K._HINDEX} AS INT)").alias("c"))
    )


def scc_color_round():
    from wedge_parallel_triangle_counting_spark.operators import scc as S
    from wedge_parallel_triangle_counting_spark.plans import testdata

    de = testdata.derived_directed_sparse_edges(spark, SF)
    ea = S._clean_directed(de, NPART)
    active = (
        ea.select(F.col("src").alias("v"))
        .unionByName(ea.select(F.col("dst").alias("v")))
        .distinct()
        .repartition(NPART, "v")
    )
    color = active.select("v", F.col("v").alias("c"))
    if hasattr(S, "_color_round"):
        return S._color_round(ea, color)
    upd = (
        ea.join(color.select(F.col("v").alias("src"), F.col("c").alias("cs")), "src")
        .groupBy("dst")
        .agg(F.min("cs").alias("nbr_min"))
    )
    return color.join(upd.withColumnRenamed("dst", "v"), "v", "left").select(
        "v",
        F.least(F.col("c"), F.coalesce(F.col("nbr_min"), F.col("c"))).alias("c"),
    )


def scc_trim_level():
    from wedge_parallel_triangle_counting_spark.operators import scc as S
    from wedge_parallel_triangle_counting_spark.plans import testdata

    de = testdata.derived_directed_sparse_edges(spark, SF)
    fwd = S._clean_directed(de, NPART)
    active = (
        fwd.select(F.col("src").alias("v"))
        .unionByName(fwd.select(F.col("dst").alias("v")))
        .distinct()
        .repartition(NPART, "v")
    )
    ef = fwd.join(active.withColumnRenamed("v", "src"), "src", "left_semi").join(
        active.withColumnRenamed("v", "dst"), "dst", "left_semi"
    )
    srcs = ef.select(F.col("src").alias("v")).distinct()
    dsts = ef.select(F.col("dst").alias("v")).distinct()
    if TAG == "before":
        nontrivial = srcs.join(dsts, "v", "left_semi")
        return active.join(nontrivial, "v", "left_anti")
    # r6 shape: one level only shrinks the active set (the peeled
    # singletons are assigned in one batch after the fixpoint)
    return srcs.join(dsts, "v", "left_semi")


def louvain_round():
    from wedge_parallel_triangle_counting_spark.operators import community as L

    pe = pr_edges(spark, SF)
    sym = build_sym_clustered(pe, NPART, key="src")
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count("*").cast("long").alias("kv")
    )
    m2 = 300000  # plan shape only; the real operator uses sym.count()
    if hasattr(L, "_louvain_round"):
        comm0 = deg.select("v", F.col("v").alias("community"), "kv")
        return L._louvain_round(sym, comm0, m2, True)
    comm = deg.select("v", F.col("v").alias("community"))
    w = Window.partitionBy("v").orderBy(F.desc("score"), F.asc("c"))
    cs = (
        comm.join(deg, "v")
        .groupBy(F.col("community").alias("c"))
        .agg(F.sum("kv").alias("sigma"))
    )
    rhs = comm.select(F.col("v").alias("u"), F.col("community").alias("c"))
    kvc = (
        sym.join(F.broadcast(rhs), sym.dst == F.col("u"))
        .groupBy(F.col("src").alias("v"), "c")
        .agg(F.count("*").cast("long").alias("kvc"))
    )
    cur = comm.select("v", F.col("community").alias("cv"))
    scored = (
        kvc.join(F.broadcast(deg), "v")
        .join(F.broadcast(cur), "v")
        .join(F.broadcast(cs), "c")
        .withColumn(
            "sig_adj",
            F.col("sigma")
            - F.when(F.col("c") == F.col("cv"), F.col("kv")).otherwise(F.lit(0)),
        )
        .withColumn(
            "score",
            F.lit(m2).cast(L._DEC) * F.col("kvc").cast(L._DEC)
            - F.col("kv").cast(L._DEC) * F.col("sig_adj").cast(L._DEC),
        )
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "v",
            F.when(F.col("score") > 0, F.col("c")).otherwise(F.col("v")).alias("community"),
        )
    )


def ppr_round():
    from wedge_parallel_triangle_counting_spark.operators import localcluster as P

    pe = pr_edges(spark, SF)
    sym = build_sym_clustered(pe, NPART, key="src")
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count("*").cast("long").alias("kv")
    )
    state = spark.createDataFrame([(1, 0, P.UNIT)], "v long, p long, r long")
    if hasattr(P, "_push_round"):
        return P._push_round(sym, deg, state, 15, 100, 1000)
    epsu = 1000
    fr = (
        state.join(deg, "v")
        .filter(F.col("r") >= F.col("kv") * F.lit(epsu))
        .select("v", "kv", F.expr("r * 15 div 100").alias("p_add"), F.col("r").alias("r_push"))
        .withColumn("spread", F.col("r_push") - F.col("p_add"))
        .withColumn("share", F.expr("spread div kv"))
        .withColumn("leftover", F.col("spread") - F.col("share") * F.col("kv"))
    )
    held = (
        state.join(fr.select("v", "p_add", "leftover"), "v", "left")
        .select(
            "v",
            (F.col("p") + F.coalesce("p_add", F.lit(0))).alias("p"),
            F.when(F.col("p_add").isNotNull(), F.col("leftover")).otherwise(F.col("r")).alias("r"),
        )
    )
    inc = (
        sym.join(
            F.broadcast(fr.filter(F.col("share") > 0).select(F.col("v").alias("u"), "share")),
            sym.src == F.col("u"),
        ).select(F.col("dst").alias("v"), F.lit(0).cast("long").alias("p"), F.col("share").alias("r"))
    )
    return (
        held.unionByName(inc)
        .groupBy("v")
        .agg(F.sum("p").cast("long").alias("p"), F.sum("r").cast("long").alias("r"))
    )


def triangles_wedge_count():
    """The fused wedge count's exec frame (flat lane over the cached
    symmetric table + broadcast probe) — built via the operator's own
    internals so the dump follows refactors."""
    from wedge_parallel_triangle_counting_spark.operators import triangles as T

    e = bench_edges(spark, SF)
    sym = build_sym_clustered(e, NPART)
    a, b = T._collect_long_cols(sym.filter(F.col("src") < F.col("dst")), "src", "dst")
    key_base = int(max(a.max(), b.max())) + 1
    ids, cnt, src_o, dst_o, pos_o, outdeg = T._orientation_arrays(a, b)
    sc = spark.sparkContext
    from wedge_parallel_triangle_counting_spark.functions import wedge as wk

    probe = T._Probe(sc.broadcast(wk.build_edge_keys(a, b, key_base)), key_base, None, None)
    hub_flag = outdeg >= int((2 * (1 << 18)) ** 0.5) + 2
    lookup_bc = sc.broadcast({"ids": ids, "deg": cnt, "is_hub": hub_flag})
    flat = sym.sortWithinPartitions("src", "dst")
    counts = flat.mapInPandas(T._flat_count_sym_udf(probe, lookup_bc), schema=T.COUNT_SCHEMA)
    return T._sum_counts(counts)


def triangles_edge_frame():
    from wedge_parallel_triangle_counting_spark.operators import triangles as T
    from wedge_parallel_triangle_counting_spark.operators.graph import adjacency

    e = bench_edges(spark, SF)
    caches: list = []
    oriented, _deg, _kb, _cl, _st = T._prep(e, "auto", "scalable", None, caches)
    adj = adjacency(oriented)
    a_src = adj.select(F.col("v").alias("src"), F.col("adj").alias("adj_src"))
    a_dst = adj.select(F.col("v").alias("dst"), F.col("adj").alias("adj_dst"))
    per_edge = (
        oriented.join(a_src, "src")
        .join(a_dst, "dst")
        .select(F.size(F.array_intersect("adj_src", "adj_dst")).alias("c"))
    )
    return per_edge.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("triangles"))


def sweep_cut_frame():
    from wedge_parallel_triangle_counting_spark.operators import localcluster as P

    pe = pr_edges(spark, SF)
    push = P.ppr_push(pe, num_rounds=2)
    # replicate sweep_cut's lazy output (before its localCheckpoint)
    from wedge_parallel_triangle_counting_spark.operators.truss import canonical_edges

    clean = canonical_edges(pe, NPART).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    deg = (
        clean.select(F.col("a").alias("v"))
        .unionByName(clean.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("kv"))
    )
    m2 = 290000
    ranked = (
        push.filter(F.col("p") > 0)
        .join(deg, "v")
        .withColumn("q", F.expr("p * 1000000 div kv"))
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("q"), F.asc("v"))))
    )
    rk = ranked.select("v", "rank")
    ev = (
        clean.join(rk.withColumnRenamed("v", "a").withColumnRenamed("rank", "ra"), "a", "left")
        .join(rk.withColumnRenamed("v", "b").withColumnRenamed("rank", "rb"), "b", "left")
        .select(
            F.least("ra", "rb").alias("lo"),
            F.when(F.col("ra").isNotNull() & F.col("rb").isNotNull(), F.greatest("ra", "rb")).alias("hi"),
        )
        .filter(F.col("lo").isNotNull())
    )
    starts = ev.groupBy(F.col("lo").alias("rank")).agg(F.count("*").cast("long").alias("d"))
    ends = ev.filter(F.col("hi").isNotNull()).groupBy(F.col("hi").alias("rank")).agg(
        (-F.count("*")).cast("long").alias("d")
    )
    wcum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    delta = starts.unionByName(ends).groupBy("rank").agg(F.sum("d").alias("d"))
    return (
        ranked.join(delta, "rank", "left")
        .withColumn("cut", F.sum(F.coalesce("d", F.lit(0))).over(wcum).cast("long"))
        .withColumn("vol", F.sum("kv").over(wcum).cast("long"))
        .withColumn("den", F.least(F.col("vol"), F.lit(m2) - F.col("vol")))
        .filter(F.col("den") > 0)
        .select(
            F.col("rank").cast("long").alias("rank"),
            "v", "q", "vol", "cut",
            F.expr("cut * 1000000 div den").alias("cond_ppm"),
        )
    )


def anf_hop_round():
    from wedge_parallel_triangle_counting_spark.operators import anf as A

    pe = pr_edges(spark, SF)
    sym = build_sym_clustered(pe, NPART, key="dst")
    state = (
        sym.select(F.col("dst").alias("v"))
        .distinct()
        .select("v", F.array(A._sketch_hash(F.col("v"))).alias("sk"))
    )
    if hasattr(A, "_hop_round"):
        return A._hop_round(sym, state, 32)
    contrib = sym.join(state, sym.dst == state.v).select(sym.src.alias("v"), "sk")
    return (
        state.unionByName(contrib)
        .groupBy("v")
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("sk")))), 1, 32
            ).alias("sk")
        )
    )


BUILDERS = {
    "hits": hits_round,
    "eigen": eigen_round,
    "components": components_round,
    "components_star": components_star_round,
    "coreness": coreness_round,
    "scc_color": scc_color_round,
    "scc_trim": scc_trim_level,
    "louvain": louvain_round,
    "ppr_push": ppr_round,
    "triangles_wedge": triangles_wedge_count,
    "triangles_edge": triangles_edge_frame,
    "sweep_cut": sweep_cut_frame,
    "anf": anf_hop_round,
}


def main() -> None:
    for name, builder in BUILDERS.items():
        if ONLY and name not in ONLY:
            continue
        try:
            dump(name, builder(), note=f"{name} — one steady-state round/frame, tag={TAG}")
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
