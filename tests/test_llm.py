"""Property tests for the approximate LLM-pipeline operators
(SURVEY.md §5.2.5): MinHash concentration, exact-dup guarantees,
SimHash discrimination, ANN pair-level correctness."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from meepo_spark.catalog import table
from meepo_spark.operators.dedup import (
    exact_jaccard,
    lsh_candidate_pairs,
    minhash_near_dup_pairs,
    minhash_signatures,
    shingle_set,
    shingles,
    simhash,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_minhash_estimates_concentrate(spark, docs):
    """Signature agreement ratio ≈ exact Jaccard (±0.15 w/ 192 perms)
    on the fixture's engineered near-dup pairs."""
    sig = minhash_signatures(shingles(docs, "text", "doc_id", 3), 128)
    true_pairs = minhash_near_dup_pairs(docs, "text", "doc_id", threshold=0.6)
    rows = true_pairs.collect()
    assert rows, "fixture should contain near-dup pairs"
    sig_map = {r["id"]: [r[f"h{i}"] for i in range(128)] for r in sig.collect()}
    for r in rows:
        a, b = sig_map[r["id_a"]], sig_map[r["id_b"]]
        est = sum(x == y for x, y in zip(a, b)) / 128
        assert abs(est - r["jaccard"]) < 0.15, (r["id_a"], r["id_b"], est, r["jaccard"])


def test_exact_dup_always_caught(spark, docs):
    """A verbatim copy of any doc must appear as a jaccard-1.0 pair."""
    base = docs.limit(5).select("doc_id", "text")
    copies = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    aug = base.unionByName(copies)
    pairs = minhash_near_dup_pairs(aug, "text", "doc_id", threshold=0.99)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for r in base.collect():
        assert (r["doc_id"], r["doc_id"] + 1_000_000) in got


def test_lsh_no_false_negatives_at_threshold(spark, docs):
    """Every exact-Jaccard>=0.6 pair (brute force on a sample) is in
    the LSH candidate set — recall check without the verify stage."""
    sample = docs.filter(F.col("doc_id") < 300)
    a = sample.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = sample.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    allpairs = a.join(b, F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    truth = exact_jaccard(
        allpairs, sample, "text", "doc_id", set_builder=lambda c: shingle_set(c, 3)
    ).filter(F.col("jaccard") >= 0.6)
    sig = minhash_signatures(shingles(sample, "text", "doc_id", 3), 192)
    cand = lsh_candidate_pairs(sig, 192, 64)
    missing = truth.join(cand, ["id_a", "id_b"], "left_anti").collect()
    assert not missing, f"LSH missed true pairs: {missing}"


def test_simhash_discriminates(spark, docs):
    """Near-dup pairs sit at smaller Hamming distance than random
    pairs (medians strictly ordered)."""
    import statistics

    sig = {r["id"]: r["simhash"] for r in simhash(docs, "text", "doc_id").collect()}
    dup_pairs = [
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(docs, "text", "doc_id", threshold=0.6).collect()
    ]
    assert dup_pairs
    ids = sorted(sig)[:80]
    rand_pairs = [(ids[i], ids[i + 1]) for i in range(0, 78, 2)]
    ham = lambda a, b: bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")
    med_dup = statistics.median(ham(a, b) for a, b in dup_pairs)
    med_rand = statistics.median(ham(a, b) for a, b in rand_pairs)
    assert med_dup < med_rand, (med_dup, med_rand)


def test_ann_results_are_exact_cosines(spark, sf_dir):
    """Every ANN hit reports the same cosine the brute-force operator
    computes for that (q,c) pair, and ranks are 1..n contiguous."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    ann = qs["l3b_ann_lsh_topk"](spark, sf_dir).collect()
    exact = {
        (r["q_id"], r["c_id"]): r["cos_r"]
        for r in qs["l3_cosine_topk"](spark, sf_dir).collect()
    }
    # brute-force full map for pair-level check
    from meepo_spark.functions.vectors import cosine

    emb = table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    b = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"))
    full = {
        (r["q_id"], r["c_id"]): r["cos"]
        for r in a.join(b)
        .select("q_id", "c_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"))
        .collect()
    }
    by_q: dict[int, list[int]] = {}
    for r in ann:
        assert full[(r["q_id"], r["c_id"])] == r["cos_r"]
        by_q.setdefault(r["q_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)


def test_multimodal_feature_plumbing(spark, docs):
    """mapInPandas path: schema, determinism, and byte stats that
    match a driver-side recomputation."""
    from meepo_spark.multimodal.columns import attach_fake_payload, extract_features

    sample = docs.filter(F.col("doc_id") < 20)
    feats = extract_features(attach_fake_payload(sample)).collect()
    texts = {r["doc_id"]: r["text"] for r in sample.collect()}
    assert len(feats) == len(texts)
    import numpy as np

    for r in feats:
        raw = texts[r["doc_id"]].encode("utf-8")
        assert r["n_bytes"] == len(raw)
        assert r["head_hex"] == raw[:8].hex()
        assert abs(r["byte_mean"] - float(np.frombuffer(raw, np.uint8).mean())) < 1e-6


def test_decode_media_is_stubbed():
    from meepo_spark.multimodal.columns import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image")


@pytest.mark.parametrize("threshold", [2_000_000, 0])
def test_connected_components_chain_and_islands(spark, threshold):
    """CC: a 4-chain, a triangle, and a 2-island — every node labeled
    with its component's min id. Both physical paths must agree:
    threshold high → single-task union-find contraction; threshold 0 →
    iterative min-label propagation (diameter rounds; 3 here)."""
    from meepo_spark.operators.graph import component_sizes, connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        "id_a: long, id_b: long",
    )
    cc = connected_components(edges, local_threshold=threshold)
    comps = {r["id"]: r["component"] for r in cc.collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    sizes = {r["component"]: r["n_members"] for r in component_sizes(cc).collect()}
    assert sizes == {1: 4, 10: 3, 20: 2}


def test_ivf_recall_at_5(spark, sf_dir):
    """IVF top-5 must recover most of the exact top-5 (probing 8/16
    cells — this fixture's neighbors spread near-uniformly across
    cells, so recall tracks probed fraction; measured 0.84). Floor
    0.75: a quantizer/assignment bug craters it far below."""
    from meepo_spark.registry import QUERIES, load_all

    load_all()
    from meepo_spark.catalog import table
    from meepo_spark.operators.similarity import ivf_cosine_topk
    from meepo_spark.queries.llm_sim import DIM

    exact = {
        (r["q_id"], r["c_id"])
        for r in QUERIES["l3_cosine_topk"](spark, sf_dir).collect()
    }
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    approx = {
        (r["q_id"], r["c_id"])
        for r in ivf_cosine_topk(
            q, c, dim=DIM, k=5, n_centroids=16, n_probe=8,
            pair_filter=F.col("q_id") != F.col("c_id"),
        ).collect()
    }
    assert exact, "exact top-k must not be empty"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.75, f"IVF recall@5 too low: {recall}"
    # and the graded query's per-query statistical gate holds
    flags = QUERIES["l3d_ivf_topk"](spark, sf_dir).select(
        "ivf_recall_ge_2"
    ).collect()
    assert flags and all(r[0] for r in flags)


def test_misra_gries_candidate_guarantee(spark, docs):
    """Pigeonhole guarantee: the union of per-partition MG(k)
    summaries contains EVERY term with global frequency > N/k, and
    emits at most k candidates per partition. Run at a small k so
    pruning is aggressive and several exact heavies exist."""
    from meepo_spark.operators.sketches import bigrams, misra_gries_candidates

    terms = docs.repartition(8).select(
        F.explode(bigrams(F.col("text"))).alias("term")
    )
    k = 50
    cands = misra_gries_candidates(terms, "term", k)
    cand_set = {r["term"] for r in cands.collect()}
    assert len(cand_set) <= k * 8

    exact = terms.groupBy("term").count().collect()
    n = sum(r["count"] for r in exact)
    heavies = {r["term"] for r in exact if r["count"] * k > n}
    missed = heavies - cand_set
    assert not missed, f"MG dropped guaranteed heavy hitters: {missed}"


def test_heavy_hitters_exact_matches_naive(spark, docs):
    """The sketch+verify pipeline returns exactly the naive answer —
    same terms, same exact counts."""
    from meepo_spark.operators.sketches import bigrams, heavy_hitters_exact

    terms = docs.repartition(8).select(
        F.explode(bigrams(F.col("text"))).alias("term")
    )
    got = {
        (r["term"], r["n_occurrences"])
        for r in heavy_hitters_exact(terms, "term", 600).collect()
    }
    exact = terms.groupBy("term").count().collect()
    n = sum(r["count"] for r in exact)
    want = {(r["term"], r["count"]) for r in exact if r["count"] * 600 > n}
    assert got == want and want


def test_kmeans_inertia_monotone_and_deterministic(spark, sf_dir):
    """Distributed Lloyd k-means: inertia is non-increasing across
    iterations (the Lloyd invariant), assignments partition the whole
    input, and a re-run reproduces identical assignments (no RNG, no
    partition-order sensitivity)."""
    from meepo_spark.operators.clustering import kmeans_fit

    emb = table(spark, sf_dir, "embeddings")
    assigned, cent, inertia = kmeans_fit(
        emb, "vec_id", "embedding", k=8, iters=4
    )
    assert len(inertia) == 4
    assert all(
        b <= a * (1 + 1e-9) for a, b in zip(inertia, inertia[1:])
    ), f"inertia increased: {inertia}"
    n = emb.count()
    got = assigned.collect()
    assert len(got) == n
    assert {r["cluster"] for r in got} <= set(range(8))
    # decent spread: no single cluster swallows everything
    from collections import Counter

    counts = Counter(r["cluster"] for r in got)
    assert len(counts) >= 2 and max(counts.values()) < n

    again, _, inertia2 = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=4)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, got))
    assert inertia2 == inertia


def test_pq_rerank_recall_at_5(spark, sf_dir):
    """PQ/ADC shortlist (top-50) + exact re-rank must recover most of
    the exact MIPS top-5 (measured 0.92 at sf0.01, higher at sf0.001
    where the shortlist covers 10% of the corpus). Floor 0.7: a
    codebook/encode/LUT indexing bug craters it far below. Ground
    truth is brute-force numpy dot on the same fixture."""
    import numpy as np

    from meepo_spark.registry import QUERIES, load_all

    load_all()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in emb])
    X = np.stack([np.array(r.embedding, dtype="float64") for r in emb])
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    exact = set()
    for q in range(10):
        dots = X @ X[q]
        cand = sorted(zip(dots, ids), key=lambda t: (-t[0], t[1]))
        exact |= {(q, i) for _, i in [c for c in cand if c[1] != q][:5]}
    from meepo_spark.catalog import table
    from meepo_spark.operators.similarity import pq_topk
    from meepo_spark.queries.llm_sim import DIM

    emb_t = table(spark, sf_dir, "embeddings")
    q = emb_t.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = emb_t.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    approx = {
        (r.q_id, r.c_id)
        for r in pq_topk(
            q, c, dim=DIM, k=5, m=16, ksub=16, rerank=50,
            pair_filter=F.col("q_id") != F.col("c_id"),
        ).collect()
    }
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"PQ+rerank recall@5 too low: {recall}"
    # and the graded query's per-query statistical gate holds
    flags = QUERIES["l3i_pq_topk"](spark, sf_dir).select("pq_recall_ge_3").collect()
    assert flags and all(r[0] for r in flags)


def test_kmeans_assignment_margins_exceed_cross_engine_drift(spark, sf_dir):
    """ADVICE r2: the l3g/l3j argmin stability claim, asserted on the
    fixture instead of assumed — for every vector, the gap between its
    best and second-best centroid distance must exceed the worst-case
    cross-engine float drift (sequential fold vs Arrow matmul
    expansion vs DuckDB list functions, all ~1e-12 relative), so no
    assignment can flip between engines. Ties at EXACTLY zero gap
    (duplicate embeddings equidistant by construction) are excluded:
    both engines break them identically by the (dist, cid) order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from meepo_spark.catalog import table
    from meepo_spark.functions.vectors import sq_dist

    emb = table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = pts.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    w = Window.partitionBy("vec_id").orderBy("sqd", "cid")
    top2 = (
        pts.crossJoin(F.broadcast(cent))
        .select("vec_id", "cid", sq_dist(F.col("v"), F.col("cv")).alias("sqd"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )
    gaps = (
        top2.groupBy("vec_id")
        .agg((F.max("sqd") - F.min("sqd")).alias("gap"))
        .filter(F.col("gap") > 0.0)  # exact ties break on cid, both engines
        .agg(F.min("gap").alias("min_gap"))
        .collect()[0]
    )
    # distances are O(10) here; 1e-9 absolute is ~1e-10 relative —
    # >> the ~1e-12 summation-order drift, << the observed margins
    assert gaps["min_gap"] > 1e-9, f"assignment margin {gaps['min_gap']} too small"


def test_verified_pairs_cache_reuses_materialized_frame(spark, sf_dir):
    """The session-scoped near-dup pair cache must hand back the SAME
    persisted frame on repeat calls (the l2/l2b/l2e/l9 sharing that
    cut the dedup family 16.9s -> 9.4s), serve downstream plans from
    the materialized cache (InMemoryTableScan), and key by sf_dir so
    different fixtures never cross."""
    from pyspark.sql import functions as F

    from meepo_spark.queries.llm_dedup import _PAIRS_CACHE, _verified_pairs

    def _drain():
        # unpersist on clear: bare .clear() would leak persisted
        # blocks with no reachable handle (code-review r3b); the cache
        # is a SessionFrameCache since the r4 unification
        for key in list(_PAIRS_CACHE._frames):
            _PAIRS_CACHE._evict(key)

    _drain()
    try:
        a = _verified_pairs(spark, sf_dir)
        n = a.count()  # materialize the persisted frame
        b = _verified_pairs(spark, sf_dir)
        assert a is b, "repeat call must return the cached frame"
        # the DOWNSTREAM plan must read the cache (inspect the derived
        # frame, not b's own plan — code-review r3b)
        derived = b.filter(F.col("jaccard") >= 0.6)
        plan = derived._sc._jvm.PythonSQLUtils.explainString(
            derived._jdf.queryExecution(), "formatted"
        )
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
        assert n == b.count()
        # a different sf_dir is a different cache entry, not a collision
        other = _verified_pairs(spark, sf_dir + "/")
        assert other is not b
    finally:
        _drain()


def test_snm_bucketed_rank_equals_global_rank(spark):
    """l60's contract on bucketed_row_number: a first-character bucket
    over a string sort key must reproduce the naive global
    row_number ordering exactly — including empty keys, shared
    prefixes, and doc_id tie-breaks on duplicate keys."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from meepo_spark.operators.enumeration import bucketed_row_number

    rng = random.Random(7)
    words = ["", "a", "ab", "abc", "b", "ba", "zz", "m quick", "m slow"]
    rows = [(i, rng.choice(words)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    got = {
        r["doc_id"]: r["rn"]
        for r in bucketed_row_number(
            df,
            bucket=F.substring("k", 1, 1),
            order_cols=[F.col("k"), F.col("doc_id")],
            out="rn",
        ).collect()
    }
    w = Window.orderBy(F.col("k"), F.col("doc_id"))
    want = {
        r["doc_id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_l3l_kernel_shortlist_bitmatches_pure_python_replay(spark, sf_dir):
    """Optimization r10 wave 3: l3l's encode→LUT→ADC moved from one
    giant Catalyst HOF projection into a numpy mapInPandas kernel.
    The kernel's CONTRACT is bit-exact float64 arithmetic in the same
    association order (sequential k-loops, argmin lowest-index ties),
    so the shortlist must equal — to the bit, not a tolerance — an
    independent pure-Python replay (plain floats, no numpy) of the
    PQ definition over the same fixture."""
    from meepo_spark.queries.llm_sim import _pq_seeded_shortlist

    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in rows}
    M, KSUB, SUB = 8, 4, 8
    seeds = [vecs[i] for i in sorted(v for v in vecs if v < KSUB)]
    q_ids = sorted(v for v in vecs if 40 <= v <= 49)

    def sdot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def sqd(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def sub(v, j):
        return v[j * SUB : (j + 1) * SUB]

    codes = {}
    for vid, v in vecs.items():
        cs = []
        for j in range(M):
            best = min(
                (sqd(sub(v, j), sub(seeds[c], j)), c) for c in range(KSUB)
            )
            cs.append(best[1])
        codes[vid] = cs
    expected = {}
    for qid in q_ids:
        lut = [
            sdot(sub(vecs[qid], j), sub(seeds[c], j))
            for j in range(M)
            for c in range(KSUB)
        ]
        scored = []
        for cid, cs in codes.items():
            if cid == qid:
                continue
            acc = 0.0
            for j in range(M):
                acc = acc + lut[j * KSUB + cs[j]]
            scored.append((cid, acc))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for cid, adc in scored[:20]:
            expected[(qid, cid)] = adc

    _, _, shortlist = _pq_seeded_shortlist(spark, sf_dir)
    got = {(int(r.q_id), int(r.c_id)): r.adc for r in shortlist.collect()}
    assert got == expected  # dict equality: same pairs, bit-equal adc
