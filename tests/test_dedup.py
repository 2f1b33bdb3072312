

def test_substring_dup_pairs_hand_check(spark):
    from wedge_parallel_triangle_counting_spark.operators.dedup import (
        substring_dup_pairs,
    )

    base = " ".join(f"tok{i}" for i in range(20))
    rows = [
        (1, base + " tail one"),
        (2, base + " other ending"),   # shares the 20-token prefix with 1
        (3, "completely different words " * 6),
        (4, base + " tail one"),       # exact dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.n_shared_windows
        for r in substring_dup_pairs(docs, window=16).collect()
    }
    # windows of 16 tokens: doc1 has 22 tokens -> 7 windows; docs 1&4
    # share all 7; docs 1&2 and 2&4 share the 5 windows fully inside
    # the common 20-token prefix
    assert got == {(1, 2): 5, (1, 4): 7, (2, 4): 5}


def test_substring_dup_freq_cap_drops_boilerplate(spark):
    from wedge_parallel_triangle_counting_spark.operators.dedup import (
        substring_dup_pairs,
    )

    boiler = " ".join(f"b{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(1, 6)], "doc_id long, text string"
    )
    # the one shared window appears in 5 docs: cap 4 drops everything
    assert substring_dup_pairs(docs, window=16, max_window_freq=4).count() == 0
    assert substring_dup_pairs(docs, window=16, max_window_freq=5).count() == 10


def test_kmeans_matches_numpy_reference(spark):
    import numpy as np

    import hashlib

    from wedge_parallel_triangle_counting_spark.operators.kmeans import (
        OFFSET,
        SCALE,
        kmeans_assign,
    )

    rng = np.random.RandomState(7)
    n, dim, k, iters = 60, 8, 4, 3
    vecs = rng.randn(n, dim).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cluster for r in kmeans_assign(df, k=k, num_iters=iters).collect()}

    # reference: same quantization, same init, same integer Lloyd
    q = np.floor(vecs.astype(np.float64) * SCALE).astype(np.int64) + OFFSET
    h = {
        i: int(hashlib.md5(f"km:{i}".encode()).hexdigest()[:15], 16)
        for i in range(n)
    }
    seeds = sorted(range(n), key=lambda i: (h[i], i))[:k]
    cents = {c: q[i].copy() for c, i in enumerate(seeds)}
    asg = {}
    for it in range(iters):
        for i in range(n):
            best = min(
                (int(((q[i] - cents[c]) ** 2).sum()), c) for c in range(k)
            )
            asg[i] = best[1]
        if it == iters - 1:
            break
        for c in range(k):
            members = [q[i] for i in range(n) if asg[i] == c]
            if members:
                s = np.sum(members, axis=0)
                cents[c] = s // len(members)
    assert got == asg


def test_ivf_topk_recall_vs_exact(spark):
    import numpy as np

    from wedge_parallel_triangle_counting_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    rng = np.random.RandomState(11)
    n, dim = 120, 16
    vecs = rng.randn(n, dim).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(df, k=5, query_limit=8).collect()
    }
    approx_rows = ivf_topk(
        df, k=5, query_limit=8, n_clusters=4, nprobe=2
    ).collect()
    approx = {(r.query_id, r.vec_id) for r in approx_rows}
    # contract checks: k results per query, ranks 1..5, candidates only
    # from probed lists; recall vs exact must be substantial (nprobe=2
    # of 4 lists on random gaussians)
    per_q = {}
    for r in approx_rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall


def test_ivf_probe_all_lists_equals_exact(spark):
    import numpy as np

    from wedge_parallel_triangle_counting_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    rng = np.random.RandomState(23)
    n, dim = 80, 12
    vecs = rng.randn(n, dim).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = sorted(
        map(tuple, cosine_topk(df, k=5, query_limit=6).collect())
    )
    full_probe = sorted(
        map(
            tuple,
            ivf_topk(df, k=5, query_limit=6, n_clusters=4, nprobe=4).collect(),
        )
    )
    assert full_probe == exact


def test_ivf_pq_identity_codebook_equals_exact_l2(spark):
    """With m_sub=1, ks=n, one training iteration, and all lists
    probed, every vector is its own codeword (own distance 0, unique
    on gaussians) so the recomputed codebook IS the corpus and ADC
    degenerates to the exact quantized squared-L2 distance - a full
    differential against a numpy replay of the ranking."""
    import numpy as np

    from wedge_parallel_triangle_counting_spark.operators.kmeans import OFFSET
    from wedge_parallel_triangle_counting_spark.operators.pq import ivf_pq_topk

    rng = np.random.RandomState(7)
    n, dim = 60, 8
    vecs = rng.randn(n, dim).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(
        map(
            tuple,
            ivf_pq_topk(
                df,
                k=5,
                query_limit=6,
                n_clusters=4,
                nprobe=4,
                m_sub=1,
                ks=n,
                pq_iters=1,
            ).collect(),
        )
    )

    q = np.floor(vecs.astype(np.float64) * 1_000_000).astype(np.int64) + OFFSET
    want = []
    for qi in range(6):
        d = ((q - q[qi]) ** 2).sum(axis=1)
        order = sorted((int(d[j]), j) for j in range(n) if j != qi)[:5]
        want += [
            (qi, j, dj, r + 1) for r, (dj, j) in enumerate(order)
        ]
    assert got == sorted(want)


def test_ivf_pq_recall_and_rank_contract(spark):
    import numpy as np

    from wedge_parallel_triangle_counting_spark.operators.pq import ivf_pq_topk
    from wedge_parallel_triangle_counting_spark.operators.similarity import (
        cosine_topk,
    )

    rng = np.random.RandomState(11)
    n, dim = 120, 16
    vecs = rng.randn(n, dim).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(df, k=5, query_limit=8).collect()
    }
    approx_rows = ivf_pq_topk(
        df, k=5, query_limit=8, n_clusters=4, nprobe=2, m_sub=4, ks=16
    ).collect()
    per_q = {}
    for r in approx_rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
        assert r.adc >= 0
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    # PQ is doubly lossy (coarse probe + 4x16-code quantization) and
    # ADC ranks by L2 while the baseline ranks by cosine; on random
    # gaussians recall stays well above chance (5/119 ~ 0.04)
    approx = {(r.query_id, r.vec_id) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, recall


def test_semantic_dedup_within_cluster_only_and_exact_recall(spark):
    """Pairs come only from shared clusters; an exact duplicate vector
    is ALWAYS caught (identical vectors land in the same cluster)."""
    import numpy as np

    from wedge_parallel_triangle_counting_spark.operators.dedup import (
        semantic_dedup_pairs,
    )
    from wedge_parallel_triangle_counting_spark.operators.kmeans import (
        kmeans_assign,
    )

    rng = np.random.RandomState(17)
    n, dim = 50, 8
    vecs = rng.randn(n, dim).astype(np.float32)
    vecs[41] = vecs[3]  # plant an exact duplicate
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = semantic_dedup_pairs(df, k=4, threshold=0.3).collect()
    asg = {r.vec_id: r.cluster for r in kmeans_assign(df, k=4).collect()}
    assert all(asg[r.id_a] == asg[r.id_b] == r.cluster for r in pairs)
    assert all(r.id_a < r.id_b for r in pairs)
    planted = [r for r in pairs if (r.id_a, r.id_b) == (3, 41)]
    assert len(planted) == 1 and planted[0].cos == 1.0


def test_containment_catches_subset_doc(spark):
    """A document fully contained in a larger one: containment 100%
    inner-side even though Jaccard is low."""
    from wedge_parallel_triangle_counting_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    big = " ".join(f"w{i}" for i in range(60))
    small = " ".join(f"w{i}" for i in range(20, 28))  # 8 tokens inside big
    other = " ".join(f"x{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, big), (1, small), (2, other)], "doc_id long, text string"
    )
    rows = containment_pairs(docs, n=3, min_pct=90).collect()
    assert {(r.doc_inner, r.doc_outer, r.cont_pct) for r in rows} == {(1, 0, 100)}
    # Jaccard at the same strictness misses it (6 shared / 58 union)
    assert ngram_jaccard_pairs(docs, n=3, threshold=0.9).count() == 0


def test_novelty_scores_exact_on_tiny_corpus(spark):
    from wedge_parallel_triangle_counting_spark.operators.dedup import (
        novelty_scores,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c d"),       # shingles: abc, bcd -> both novel
            (1, "a b c d e"),     # abc, bcd seen; cde novel -> 1/3
            (2, "x y"),           # too short: no row
            (3, "a b c"),         # abc seen -> 0 novel
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_shingles, r.n_novel, r.novelty_ppm)
           for r in novelty_scores(docs).collect()}
    assert out == {
        0: (2, 2, 1_000_000),
        1: (3, 1, 333_333),
        3: (1, 0, 0),
    }


def test_kmeans_farthest_init_replay_and_quality(spark):
    """Farthest-first seeding: numpy replay of the seed selection, and
    on a planted 4-blob dataset the farthest init must land one seed
    per blob (hash init generally doesn't — that's its point)."""
    import numpy as np

    from wedge_parallel_triangle_counting_spark.operators.kmeans import (
        OFFSET,
        kmeans_assign,
    )

    rng = np.random.RandomState(31)
    blobs = []
    for c in range(4):
        center = np.zeros(6)
        center[c] = 50.0  # far-apart blob centers
        blobs.append(center + 0.1 * rng.randn(12, 6))
    vecs = np.vstack(blobs).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    asg = {
        r.vec_id: r.cluster
        for r in kmeans_assign(df, k=4, num_iters=3, init="farthest").collect()
    }
    # every blob is one pure cluster
    for c in range(4):
        members = {asg[i] for i in range(c * 12, (c + 1) * 12)}
        assert len(members) == 1, (c, members)
    assert len({asg[c * 12] for c in range(4)}) == 4

    # replay the seed selection in numpy (chain: smallest md5 first,
    # then argmax of min distance, ties smaller id)
    import hashlib

    q = np.floor(vecs.astype(np.float64) * 1_000_000).astype(np.int64) + OFFSET
    h = {
        i: int(hashlib.md5(f"km:{i}".encode()).hexdigest()[:15], 16)
        for i in range(len(vecs))
    }
    chosen = [min(range(len(vecs)), key=lambda i: (h[i], i))]
    for _ in range(3):
        dmin = [
            min(int(((q[i] - q[c]) ** 2).sum()) for c in chosen)
            for i in range(len(vecs))
        ]
        chosen.append(max(range(len(vecs)), key=lambda i: (dmin[i], -i)))
    # the four chosen seeds span the four blobs
    assert {c // 12 for c in chosen} == {0, 1, 2, 3}
