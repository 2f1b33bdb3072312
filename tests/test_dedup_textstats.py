"""Dedup + text-analysis operators: hand-computed fixtures and
internal consistency (LSH candidates ⊇ high-jaccard pairs etc.)."""

from __future__ import annotations

import hashlib

from wedge_parallel_triangle_counting_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from wedge_parallel_triangle_counting_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat", "en"),  # near dup
    (3, "der hund und die katze ist ein tier mit fell", "de"),
    (4, "completely different words entirely unrelated content here now", "en"),
    (5, "le chat est un animal et la maison est grande", "fr"),
    (6, "ab", "en"),  # fewer than 3 tokens -> no shingles
]


def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )


def test_shingles_tiny_doc_empty(spark):
    sh = shingles(docs_df(spark))
    assert sh.filter("doc_id = 6").count() == 0
    # doc 0: 9 tokens -> 7 trigrams, all distinct
    assert sh.filter("doc_id = 0").count() == 7


def test_dedup_exact(spark):
    rows = dedup_exact(docs_df(spark)).collect()
    assert len(rows) == 1
    assert rows[0].n_docs == 2
    assert rows[0].keeper == 0
    assert rows[0].text_hash == hashlib.md5(DOCS[0][1].encode()).hexdigest()


def test_ngram_jaccard(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs_df(spark), threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical docs
    # docs 0 and 2: 7 trigrams each, 6 shared -> jaccard = 6/8
    assert abs(pairs[(0, 2)] - 0.75) < 1e-6
    assert (0, 4) not in pairs


def test_ngram_stop_shingle_cutoff_bounds_candidates(spark):
    # pathological Zipf head: one shingle shared by EVERY doc would
    # generate O(N²) candidate pairs; the default cutoff must drop it
    n = 40
    rows = [(i, f"common stop shingle unique{i} tail{i} words{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cutoff below n: the 'common stop shingle' trigram (in all 40
    # docs) is dropped, so NO pair survives (remaining shingles are
    # unique per doc)
    got = ngram_jaccard_pairs(df, threshold=0.01, max_shingle_freq=10).collect()
    assert got == []
    # with the cutoff disabled the head shingle joins every doc pair
    got_all = ngram_jaccard_pairs(df, threshold=0.01, max_shingle_freq=None).collect()
    assert len(got_all) == n * (n - 1) // 2


def test_minhash_lsh_finds_exact_and_near_dups(spark):
    cands = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs_df(spark)).collect()}
    assert (0, 1) in cands  # identical signature -> all bands agree
    # no candidate between unrelated docs 3,4,5 and 0
    assert (0, 4) not in cands


def test_simhash_identical_docs_same_hash(spark):
    s = {r.doc_id: r.simhash for r in simhash(docs_df(spark)).collect()}
    assert s[0] == s[1]
    # near-dup within small hamming distance of original
    ham = bin(s[0] ^ s[2]).count("1")
    assert ham <= 8
    ham_far = bin(s[0] ^ s[4]).count("1")
    assert ham_far > ham


def test_token_count(spark):
    c = {r.doc_id: r.n_tokens for r in token_count(docs_df(spark)).collect()}
    assert c[0] == 9
    assert c[6] == 1


def test_lang_id(spark):
    langs = {r.doc_id: r.lang_pred for r in lang_id(docs_df(spark)).collect()}
    assert langs[0] == "en"
    assert langs[3] == "de"
    assert langs[5] == "fr"


def test_quality_score_bounds(spark):
    for r in quality_score(docs_df(spark)).collect():
        assert 0.0 <= r.score <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert r.n_tokens > 0


def test_fingerprint_ignores_formatting(spark):
    df = spark.createDataFrame(
        [(0, "Hello,  World!"), (1, "hello world"), (2, "other text")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fp for r in fingerprint(df).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_ngram_jaccard_no_cached_blocks_leak(spark):
    # ADVICE round 2: the shingle frame must not leave a persisted
    # block behind; persistence is opt-in via a caches list the caller
    # releases. Assert no NEW blocks (<=, not ==): other fixtures'
    # stale persists can be dropped asynchronously by the
    # ContextCleaner mid-test, shrinking the baseline count
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    ngram_jaccard_pairs(docs_df(spark), threshold=0.3).collect()
    assert jsc.getPersistentRDDs().size() <= before
    # the opt-in path persists, hands the frame to the caller, and the
    # caller's unpersist restores the baseline
    caches = []
    got = ngram_jaccard_pairs(docs_df(spark), threshold=0.3, caches=caches).collect()
    assert caches and got  # persisted path produced the same non-empty result
    for c in caches:
        c.unpersist()
    # <= for the same ContextCleaner race as above: another fixture's
    # stale persist may be dropped asynchronously mid-test, shrinking
    # the baseline; the assertion is "no NEW blocks remain"
    assert jsc.getPersistentRDDs().size() <= before


def test_stratified_sample_deterministic_and_partitioning_independent(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        stratified_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(r.doc_id for r in stratified_sample(docs, 30).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in stratified_sample(docs.repartition(17), 30).select("doc_id").collect()
    )
    assert a == b and len(a) > 0  # identical sample under any partitioning
    # monotone in the percentage: a 30% sample contains the 10% sample
    c = set(r.doc_id for r in stratified_sample(docs, 10).select("doc_id").collect())
    assert c <= set(a)


def test_corpus_stats_totals_match_per_doc_sums(spark):
    from pyspark.sql import functions as F

    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        corpus_stats,
        token_count,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.lang: r for r in corpus_stats(docs).collect()}
    per_doc = (
        token_count(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
    )
    for r in per_doc.collect():
        assert got[r.lang].total_tokens == r.t
        assert got[r.lang].n_docs == r.n
        # avg_utokens is exact floor(total*1e6/n) as a bigint — no
        # double anywhere in the column (hash-stable across engines)
        assert got[r.lang].avg_utokens == (r.t * 1_000_000) // r.n
        assert isinstance(got[r.lang].avg_utokens, int)


def test_filtered_corpus_composition(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        filtered_corpus,
        fingerprint,
        quality_score,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: r for r in filtered_corpus(docs, 0.5, ["en", "de"]).collect()}
    fps = {r.doc_id: r.fp for r in fingerprint(docs).collect()}
    keepers = {}
    for d, f in fps.items():
        keepers[f] = min(keepers.get(f, d), d)
    keep_ids = set(keepers.values())
    scores = {r.doc_id: r for r in quality_score(docs).collect()}
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    want = {
        d
        for d in langs
        if d in keep_ids and scores[d].score >= 0.5 and langs[d] in ("en", "de")
    }
    assert set(got) == want and len(want) > 0
    for d, r in got.items():
        assert r.lang == langs[d] and r.score == scores[d].score
        assert r.n_tokens == scores[d].n_tokens


def test_repetition_stats_hand_check(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        [
            (0, "a a a a"),          # 4 tokens, 1 distinct, top 'a'=4
            (1, "w x y z"),          # no repetition
            (2, "spam spam ham"),    # 3 tokens, 2 distinct, top=2
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert (got[0].n_tokens, got[0].distinct_tokens) == (4, 1)
    assert got[0].dup_token_ppm == (3 * 1000000) // 4
    assert got[0].top_token_ppm == 1000000
    assert got[1].dup_token_ppm == 0
    assert got[1].top_token_ppm == 250000
    assert got[2].dup_token_ppm == 333333
    assert got[2].top_token_ppm == 666666


def test_lm_score_hand_check(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import lm_score

    df = spark.createDataFrame(
        [
            (0, "a b a b"),   # bigrams: (a,b)x2, (b,a)x1
            (1, "a b c"),     # bigrams: (a,b), (b,c)
            (2, "solo"),      # 1 token -> no bigrams
        ],
        "doc_id long, text string",
    )
    # corpus counts: c12 (a,b)=3, (b,a)=1, (b,c)=1; c1 a=3, b=2; V=4
    got = {r.doc_id: r for r in lm_score(df).collect()}
    p_ab = ((3 + 1) * 1000000) // (3 + 4)
    p_ba = ((1 + 1) * 1000000) // (2 + 4)
    p_bc = ((1 + 1) * 1000000) // (2 + 4)
    assert got[0].n_bigrams == 3
    assert got[0].avg_p_ppm == (2 * p_ab + p_ba) // 3
    assert got[1].n_bigrams == 2
    assert got[1].avg_p_ppm == (p_ab + p_bc) // 2
    assert got[2].n_bigrams == 0 and got[2].avg_p_ppm is None


def test_lm_score_brute_force_corpus(spark):
    from collections import Counter

    from wedge_parallel_triangle_counting_spark.operators.textstats import lm_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {
        r.doc_id: r.text.strip().lower().split()
        for r in docs.select("doc_id", "text").collect()
    }
    c12: Counter = Counter()
    c1: Counter = Counter()
    vocab = set()
    for toks in texts.values():
        vocab.update(toks)
        for w1, w2 in zip(toks, toks[1:]):
            c12[(w1, w2)] += 1
            c1[w1] += 1
    got = {r.doc_id: r for r in lm_score(docs).collect()}
    assert set(got) == set(texts)
    for doc_id, toks in texts.items():
        ppms = [
            ((c12[(w1, w2)] + 1) * 1000000) // (c1[w1] + len(vocab))
            for w1, w2 in zip(toks, toks[1:])
        ]
        r = got[doc_id]
        assert r.n_bigrams == len(ppms)
        if ppms:
            assert r.avg_p_ppm == sum(ppms) // len(ppms)
        else:
            assert r.avg_p_ppm is None


def test_lm_buckets_hand_check(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        lm_buckets,
        lm_score,
    )

    # 6 'en' docs + 1 'de' doc; 'a b'-heavy docs score highest because
    # (a,b) dominates the corpus bigram counts
    rows = [
        (0, "a b a b a b", "en"),
        (1, "a b a b", "en"),
        (2, "a b c", "en"),
        (3, "c d e", "en"),
        (4, "e f g", "en"),
        (5, "solo", "en"),  # no bigrams -> -1 sentinel, ranks last
        (6, "x y", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        (r.lang, r.bucket): r for r in lm_buckets(df, n_buckets=3).collect()
    }
    # en: 6 docs -> 3 buckets of 2; de: 1 doc -> bucket 1 only
    assert out[("en", 1)].n_docs == 2
    assert out[("en", 2)].n_docs == 2
    assert out[("en", 3)].n_docs == 2
    assert out[("de", 1)].n_docs == 1
    assert ("de", 2) not in out and ("de", 3) not in out
    # bucket boundaries are monotone in score and the sentinel lands
    # in the tail bucket
    assert out[("en", 1)].min_ppm >= out[("en", 2)].max_ppm
    assert out[("en", 2)].min_ppm >= out[("en", 3)].max_ppm
    assert out[("en", 3)].min_ppm == -1
    # head bucket holds the two highest lm_score docs (0 and 1)
    scores = {r.doc_id: r.avg_p_ppm for r in lm_score(df).collect()}
    top2 = sorted(
        (d for d in range(6)),
        key=lambda d: (-(scores[d] if scores[d] is not None else -1), d),
    )[:2]
    assert out[("en", 1)].max_ppm == scores[top2[0]]
    assert out[("en", 1)].min_ppm == scores[top2[1]]


def test_repetition_stats_brute_force_corpus(spark):
    from collections import Counter

    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        repetition_stats,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        toks = row.text.strip().lower().split()
        c = Counter(toks)
        r = got[row.doc_id]
        assert r.n_tokens == len(toks)
        assert r.distinct_tokens == len(c)
        assert r.top_token_ppm == (max(c.values()) * 1000000) // len(toks)


def test_tfidf_top_terms_brute_force(spark):
    from collections import Counter

    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        tfidf_top_terms,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = tfidf_top_terms(docs, k=3).collect()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    n = len(texts)
    tf = {d: Counter(t.strip().lower().split()) for d, t in texts.items()}
    df = Counter(term for c in tf.values() for term in c)
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(r)
        assert r.tf == tf[r.doc_id][r.term]
        assert r.df == df[r.term]
        assert r.score == r.tf * ((n * 1000000) // r.df)
    for d, rs in got.items():
        assert len(rs) == 3
        want = sorted(
            ((t, c * ((n * 1000000) // df[t])) for t, c in tf[d].items()),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        assert sorted((r.term, r.score) for r in rs) == sorted(want)


def test_top_ngrams_hand_check(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import top_ngrams

    df = spark.createDataFrame(
        [
            (0, "a b c d"),       # shingles: "a b c", "b c d"
            (1, "a b c"),         # "a b c"
            (2, "x y"),           # too short, none
        ],
        "doc_id long, text string",
    )
    got = [(r.shingle, r.n_docs) for r in top_ngrams(df, k=10).collect()]
    assert got == [("a b c", 2), ("b c d", 1)]


def test_token_percentiles_brute_force(spark):
    import math

    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        token_percentiles,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.lang: r for r in token_percentiles(docs).collect()}
    by_lang = {}
    for r in docs.select("lang", "text").collect():
        by_lang.setdefault(r.lang, []).append(len(r.text.strip().lower().split()))
    assert set(got) == set(by_lang)
    for lang, ts in by_lang.items():
        ts.sort()
        n = len(ts)
        r = got[lang]
        assert r.n_docs == n
        for p, col in ((0.5, r.p50_tokens), (0.9, r.p90_tokens), (0.99, r.p99_tokens)):
            assert col == ts[math.ceil(n * p) - 1]


def test_corpus_mix_report_consistent_with_filtered_corpus(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        corpus_mix_report,
        filtered_corpus,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    report = corpus_mix_report(docs, min_score=0.5).collect()
    kept = filtered_corpus(docs, min_score=0.5).collect()
    # stratum totals must reconcile with the corpus and the filter
    assert sum(r.n_docs for r in report) == docs.count()
    assert sum(r.n_kept for r in report) == len(kept)
    assert sum(r.kept_tokens for r in report) == sum(r.n_tokens for r in kept)
    for r in report:
        assert 0 <= r.n_kept <= r.n_docs
        assert r.kept_ppm == (r.n_kept * 1000000) // r.n_docs


def test_kmv_distinct_exact_below_capacity_and_estimates_above(spark):
    from wedge_parallel_triangle_counting_spark.operators.sketches import (
        kmv_distinct,
    )

    vals = spark.createDataFrame(
        [(f"v{i % 40}",) for i in range(500)], "x string"
    )
    r = kmv_distinct(vals, "x", k=256).collect()[0]
    # below sketch capacity: exact
    assert (r.n_exact, r.est_distinct, r.err_ppm) == (40, 40, 0)

    big = spark.createDataFrame([(f"u{i}",) for i in range(5000)], "x string")
    r = kmv_distinct(big, "x", k=128).collect()[0]
    assert r.n_exact == 5000
    # bottom-k estimator: within ~3/sqrt(k) relative error w.h.p.
    assert abs(r.est_distinct - 5000) / 5000 < 0.30
    # determinism
    r2 = kmv_distinct(big, "x", k=128).collect()[0]
    assert (r.est_distinct, r.kth_hash) == (r2.est_distinct, r2.kth_hash)


def test_pii_redact(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import pii_redact

    docs = spark.createDataFrame(
        [
            (0, "mail me at a.b-c%d@ex-ample.co.uk or x@y.io thanks"),
            (1, "call 123-456-7890 and 999-888-7777 now"),
            (2, "clean text no pii"),
            (3, "mixed a@b.com and 555-123-4567"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert (rows[0].n_emails, rows[0].n_phones) == (2, 0)
    assert (rows[1].n_emails, rows[1].n_phones) == (0, 2)
    assert (rows[2].n_emails, rows[2].n_phones) == (0, 0)
    assert (rows[3].n_emails, rows[3].n_phones) == (1, 1)
    import hashlib as _h

    want = _h.md5(b"mixed <EMAIL> and <PHONE>").hexdigest()
    assert rows[3].clean_hash == want


def test_host_cap(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import host_cap

    docs = spark.createDataFrame(
        [
            (0, "a.com", 100),
            (1, "a.com", 300),
            (2, "a.com", 300),  # tie with 1 -> doc 1 ranks first
            (3, "a.com", 50),
            (4, "b.com", 10),
        ],
        "doc_id long, source string, n_chars long",
    )
    kept = {r.doc_id: r.rk for r in host_cap(docs, cap=2).collect()}
    assert kept == {1: 1, 2: 2, 4: 1}


def test_decontaminate(spark):
    from wedge_parallel_triangle_counting_spark.operators.dedup import decontaminate

    # benchmark doc 0 (0 % 2 == 0); doc 1 copies a long span of it
    # (many shared 3-grams), doc 3 shares nothing
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, "XX alpha beta gamma delta epsilon zeta eta theta YY"),
            (3, "totally unrelated words in this training document here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_overlap for r in decontaminate(docs, bench_mod=2, min_overlap=3).collect()}
    # doc 1 shares the 6 interior 3-grams of the copied span
    assert out == {1: 6}


def test_remove_boilerplate_lines(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        remove_boilerplate_lines,
    )

    rows = [
        # host A: 3 docs share "NAV"; bodies unique; doc 3 is pure chrome
        (1, "A", "NAV\nbody one\nend one"),
        (2, "A", "NAV\nbody two"),
        (3, "A", "NAV"),
        # host B: only 1 doc has "NAV" -> NOT boilerplate there
        (4, "B", "NAV\nbody four"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.doc_id: (r.text_clean, r.n_lines_kept, r.n_lines_removed)
        for r in remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert got[1] == ("body one\nend one", 2, 1)  # order preserved
    assert got[2] == ("body two", 1, 1)
    assert 3 not in got  # all-chrome doc dropped
    assert got[4] == ("NAV\nbody four", 2, 0)  # per-host scoping


def test_vocab_growth_exact_on_tiny_corpus(spark):
    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        vocab_growth,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "a b"),
            (2, "c d"),
            (3, "e e e"),
        ],
        "doc_id long, text string",
    )
    rows = {r.bucket: r for r in vocab_growth(docs, bucket_size=2).collect()}
    # bucket 0 = docs {0,1}: vocab {a,b,c}; bucket 1 adds {d,e}
    assert rows[0].docs_cum == 2 and rows[0].vocab_cum == 3
    assert rows[1].docs_cum == 4 and rows[1].new_terms == 2
    assert rows[1].vocab_cum == 5


def test_funnel_monotone_and_exact_on_tiny_events(spark):
    from datetime import datetime

    from wedge_parallel_triangle_counting_spark.streaming.events import funnel

    t = lambda s: datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # user 1 completes view->click->purchase in order
        (1, t(0), "view"), (1, t(5), "click"), (1, t(9), "purchase"),
        # user 2 clicks BEFORE viewing: click must not count
        (2, t(3), "click"), (2, t(4), "view"),
        # user 3 views only
        (3, t(1), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    df = df.withColumn("value", df.user_id.cast("double"))
    out = {r.stage: r for r in funnel(df).collect()}
    assert [out[k].users for k in (1, 2, 3)] == [3, 1, 1]
    assert out[2].total_lag_us == 5_000_000
    assert out[3].total_lag_us == 9_000_000


def test_retention_cohorts_exact_on_tiny_events(spark):
    from datetime import datetime, timedelta

    from wedge_parallel_triangle_counting_spark.streaming.events import (
        retention_cohorts,
    )

    w0 = datetime(2026, 1, 8)  # epoch week boundary-agnostic fixture
    rows = []
    # user 1: active weeks 0, 1, 3 ; user 2: weeks 0, 1 ; user 3: week 1
    for u, weeks in ((1, (0, 1, 3)), (2, (0, 1)), (3, (1,))):
        for k in weeks:
            rows.append((u, w0 + timedelta(weeks=k), "view"))
            rows.append((u, w0 + timedelta(weeks=k, hours=2), "click"))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    rows_out = retention_cohorts(df).collect()
    min0 = min(r.cohort_week for r in rows_out)
    out = {
        (r.cohort_week - min0, r.week_offset): r.active_users for r in rows_out
    }
    assert out == {(0, 0): 2, (0, 1): 2, (0, 3): 1, (1, 0): 1}


def test_lm_buckets_matches_window_ntile_uneven(spark):
    """The distributed closed-form bucket assignment must reproduce SQL
    NTILE exactly, including the uneven-remainder split (first `rem`
    buckets get the extra row) and langs smaller than n_buckets."""
    import pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wedge_parallel_triangle_counting_spark.operators.textstats import (
        lm_buckets,
        lm_score,
    )

    # 10 'en' docs (10 % 3 == 1 -> bucket sizes 4/3/3), 5 'fr'
    # (5 % 3 == 2 -> 2/2/1), 2 'de' (fewer docs than buckets -> 1/1)
    rows = []
    did = 0
    for lang, n in [("en", 10), ("fr", 5), ("de", 2)]:
        for i in range(n):
            rows.append((did, ("a b " * (i + 1)).strip() + " c d", lang))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    for nb in (1, 2, 3, 4, 7):
        got = {
            (r.lang, r.bucket): (r.n_docs, r.min_ppm, r.max_ppm)
            for r in lm_buckets(df, n_buckets=nb).collect()
        }
        ref = (
            df.select("doc_id", "lang")
            .join(lm_score(df).select("doc_id", "avg_p_ppm"), "doc_id", "left")
            .select(
                "lang",
                "doc_id",
                F.coalesce("avg_p_ppm", F.lit(-1)).alias("score_ppm"),
            )
            .withColumn(
                "bucket",
                F.ntile(nb).over(
                    Window.partitionBy("lang").orderBy(
                        F.col("score_ppm").desc(), F.col("doc_id").asc()
                    )
                ),
            )
            .groupBy("lang", "bucket")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min("score_ppm").alias("min_ppm"),
                F.max("score_ppm").alias("max_ppm"),
            )
        )
        want = {
            (r.lang, r.bucket): (r.n_docs, r.min_ppm, r.max_ppm)
            for r in ref.collect()
        }
        assert got == want, f"n_buckets={nb}"

    with pytest.raises(ValueError):
        lm_buckets(df, n_buckets=0)
