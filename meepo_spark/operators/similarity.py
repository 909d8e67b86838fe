"""Similarity search over embedding columns: brute-force cosine top-k
(the exactness baseline) and an LSH-bucketed ANN variant (the scale
path) — SURVEY.md §2.B L3.

Scale shape: brute force is O(|queries| × |corpus|) — correct whenever
one side broadcasts (queries ≪ corpus). The ANN path hashes vectors to
sign-pattern buckets with fixed random hyperplanes so the join is
equi-key; recall is tunable via number of hyperplanes / probe radius.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.catalog import spread
from meepo_spark.functions.vectors import cosine_with_norms, dot, norm


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "c_id",
    corpus_vec: str = "c_vec",
    pair_filter=None,
) -> DataFrame:
    """Exact top-k by cosine: broadcast the query side, one pass over
    the corpus, per-query heap via ranked window (WindowGroupLimit
    keeps only k rows per partition). ``pair_filter`` (a Column
    predicate) drops pairs BEFORE ranking — e.g. self-match exclusion.
    """
    # norms fold once per row, not per pair (cosine_with_norms)
    q = queries.withColumn("__qn", norm(F.col(query_vec)))
    c = spread(corpus, corpus_id).withColumn("__cn", norm(F.col(corpus_vec)))
    joined = c.crossJoin(F.broadcast(q))  # bcast: fixed (capped query set)
    if pair_filter is not None:
        joined = joined.filter(pair_filter)
    scored = joined.select(
        query_id,
        corpus_id,
        cosine_with_norms(
            F.col(query_vec), F.col(corpus_vec), F.col("__qn"), F.col("__cn")
        ).alias("cos"),
    )
    w = W.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def mips_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "c_id",
    corpus_vec: str = "c_vec",
    pair_filter=None,
) -> DataFrame:
    """Exact top-k by RAW inner product (maximum-inner-product search)
    — cosine_topk's twin for retrieval modes where vector norm carries
    signal. Same anatomy: broadcast query side, one corpus pass, the
    sequential-double ``dot`` fold (bit-matches DuckDB
    list_dot_product), ranked window with (dot DESC, corpus_id ASC)
    tie-break, WindowGroupLimit keeps k rows per query. Shared by
    l3h_mips_topk and l3i_pq_topk's exact re-rank so the two stay in
    tie-break/precision lockstep by construction. No spread() here:
    callers pair this with other passes over the same corpus scan
    (l3i runs PQ + exact side by side) and the extra exchange costs
    more than the kernel parallelism it buys (measured +0.7s at
    sf0.1); a standalone caller on a single-file corpus can spread()
    before calling."""
    joined = corpus.crossJoin(F.broadcast(queries))  # bcast: fixed (capped query set)
    if pair_filter is not None:
        joined = joined.filter(pair_filter)
    scored = joined.select(
        query_id,
        corpus_id,
        dot(F.col(query_vec), F.col(corpus_vec)).alias("dot"),
    )
    w = W.partitionBy(query_id).orderBy(F.col("dot").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def rademacher_planes(dim: int, n_planes: int) -> list[list[float]]:
    """±1 ("Rademacher") LSH hyperplanes derived from md5 digit parity
    — entry (p, j) is +1 when the first hex digit of md5("p:j") is
    even. Sign-LSH theory only needs symmetric iid entries, so this
    family buckets as well as Gaussian draws; the reason it exists is
    REPRODUCIBILITY: md5 is identical everywhere, so an external
    engine (the DuckDB oracle) can rebuild the exact same planes and
    signatures from the formula, which a seeded numpy Gaussian cannot
    offer. ±1 entries also keep the per-dot products exact (x * ±1.0
    is lossless), so the sign of the sequential fold is bit-stable
    across engines that fold left-to-right."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def signbit_bucket(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 12, seed: int = 42,
    planes: list[list[float]] | None = None,
):
    """Random-hyperplane LSH bucket id: concatenated sign bits of the
    vector's dot product with ``n_planes`` fixed directions (seeded
    Gaussian by default; pass ``planes`` — e.g. ``rademacher_planes``
    — for a cross-engine-reproducible family). The planes travel in
    the plan as literals (no closure capture)."""
    if planes is None:
        planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot(F.col(vec_col), plane) > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return df.withColumn("bucket", bucket)


def ann_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "c_id",
    corpus_vec: str = "c_vec",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket,
    then exact cosine rank within. With 2^n_planes buckets the expected
    candidate set shrinks by that factor; recall@k is a property test
    (tests/test_llm.py), not an oracle — the operator is approximate by
    construction."""
    qb = (
        signbit_bucket(queries, query_vec, dim, n_planes, planes=planes)
        .withColumnRenamed("bucket", "qb")
        .withColumn("__qn", norm(F.col(query_vec)))
    )
    cb = (
        signbit_bucket(spread(corpus, corpus_id), corpus_vec, dim, n_planes, planes=planes)
        .withColumnRenamed("bucket", "cb")
        .withColumn("__cn", norm(F.col(corpus_vec)))
    )
    joined = cb.join(F.broadcast(qb), F.col("qb") == F.col("cb"))  # bcast: fixed (capped query bands)
    scored = joined.select(
        query_id,
        corpus_id,
        cosine_with_norms(
            F.col(query_vec), F.col(corpus_vec), F.col("__qn"), F.col("__cn")
        ).alias("cos"),
    )
    w = W.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup: bucket by sign pattern, verify
    within-bucket pairs exactly. Near-identical vectors share all sign
    bits with probability ≈ 1 - n_planes·θ/π (θ = angle), so recall at
    cos ≥ 0.95 stays high while candidate count collapses."""
    b = signbit_bucket(spread(df, id_col), vec_col, dim, n_planes).withColumn(
        "__n", norm(F.col(vec_col))
    )
    a = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        F.col("bucket").alias("ba"), F.col("__n").alias("na"),
    )
    c = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        F.col("bucket").alias("bb"), F.col("__n").alias("nb"),
    )
    return (
        a.join(c, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
        .withColumn(
            "cos",
            cosine_with_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def _kmeans_centroids(
    sample: "np.ndarray", k: int, iters: int = 12, seed: int = 42
) -> "np.ndarray":
    """Deterministic Lloyd's k-means on a driver-side SAMPLE (coarse
    quantizer training — the one place a bounded collect is the right
    call: the sample is O(k × 16) rows regardless of corpus size, and
    every production IVF index trains its quantizer on a sample)."""
    rng = np.random.default_rng(seed)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    x = sample / np.clip(norms, 1e-12, None)
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)  # cosine on unit vectors
        for c in range(k):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def _cell_rank_udf(centroids: "np.ndarray", n: int):
    """Arrow-batched centroid ranking: embedding column → ARRAY<INT>
    of the ``n`` nearest cell ids by dot product (centroids are unit
    vectors, so dot order = cosine order). One BLAS matmul per batch
    replaces k × dim interpreted higher-order-function ops per row —
    the difference between O(batch) and O(rows × k × dim) Python-side
    plan interpretation. Ties break by cell id (stable argsort), same
    as the former array_sort(struct(negdot, cid)) expression."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    ct = centroids.astype("float64").T.copy()  # (dim, k)

    @pandas_udf(ArrayType(IntegerType()))
    def top_cells(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy()).astype("float64")  # (batch, dim)
        order = np.argsort(-(m @ ct), axis=1, kind="stable")[:, :n]
        return pd.Series(list(order.astype("int32")))

    return top_cells


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 512,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "c_id",
    corpus_vec: str = "c_vec",
    pair_filter=None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are
    assigned to their nearest of ``n_centroids`` k-means cells; each
    query probes its ``n_probe`` nearest cells and ranks exactly
    within them. Candidate volume ≈ corpus × n_probe / n_centroids.
    vs the sign-LSH path (``ann_cosine_topk``): IVF cells adapt to the
    data distribution, so recall at equal candidate budget is higher
    on clustered embeddings; LSH needs no training pass. Recall is
    property-tested against the exact operator, not oracle-matched —
    approximate by construction."""
    sample = np.stack(
        [r[0] for r in corpus.select(corpus_vec).limit(train_sample).collect()]
    ).astype("float64")
    cent = _kmeans_centroids(sample, n_centroids)

    c_assigned = (
        spread(corpus, corpus_id)
        .withColumn("cell", _cell_rank_udf(cent, 1)(F.col(corpus_vec))[0])
        .withColumn("__cn", norm(F.col(corpus_vec)))
    )

    q_probes = (
        queries.withColumn(
            "cell", F.explode(_cell_rank_udf(cent, n_probe)(F.col(query_vec)))
        )
        .withColumn("__qn", norm(F.col(query_vec)))
    )

    joined = c_assigned.join(F.broadcast(q_probes), "cell")  # bcast: fixed (q x nprobe cells)
    if pair_filter is not None:
        joined = joined.filter(pair_filter)
    scored = joined.select(
        query_id,
        corpus_id,
        cosine_with_norms(
            F.col(query_vec), F.col(corpus_vec), F.col("__qn"), F.col("__cn")
        ).alias("cos"),
    )
    w = W.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def _pq_codebooks(
    sample: "np.ndarray", m: int, ksub: int, iters: int = 12, seed: int = 42
) -> "np.ndarray":
    """Product-quantization codebooks: split the dim axis into ``m``
    equal subspaces and run deterministic Lloyd's k-means (``ksub``
    centroids) independently in each. Trained on a bounded driver-side
    sample, same posture as the IVF coarse quantizer. Returns shape
    (m, ksub, dim/m)."""
    dim = sample.shape[1]
    sub = dim // m
    assert sub * m == dim, f"dim {dim} not divisible into {m} subspaces"
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, sub), dtype="float64")
    for j in range(m):
        x = sample[:, j * sub : (j + 1) * sub].astype("float64")
        cent = x[rng.choice(len(x), size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def _pq_encode_udf(books: "np.ndarray"):
    """Arrow-batched PQ encoder: embedding → ARRAY<INT> of ``m``
    codebook indices (argmin L2 per subspace). One vectorized distance
    computation per batch per subspace — the compression pass is the
    only Python stage; scoring afterwards is pure JVM."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    m, ksub, sub = books.shape

    @pandas_udf(ArrayType(IntegerType()))
    def encode(vs: pd.Series) -> pd.Series:
        x = np.stack(vs.to_numpy()).astype("float64")  # (batch, dim)
        codes = np.empty((len(x), m), dtype="int32")
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]
            # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2; ||x||^2 constant per row
            d = -2.0 * (xs @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return encode


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 16,
    ksub: int = 16,
    rerank: int = 50,
    train_sample: int = 512,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "c_id",
    corpus_vec: str = "c_vec",
    pair_filter=None,
) -> DataFrame:
    """PQ/ADC approximate top-k by inner product, with exact re-rank:
    corpus vectors are compressed to ``m`` byte codes (``ksub``
    centroids per subspace — 16 bytes per vector at the defaults vs
    256 bytes of float32, a 16× scan-bandwidth cut); each query
    precomputes a lookup table of its dot product with every codebook
    centroid, and the asymmetric distance computation is then ``m``
    table lookups per candidate — expressed as a JVM-side higher-order
    ``aggregate`` over the code array, so the scan never leaves
    WholeStageCodegen. The ADC top-``rerank`` shortlist then fetches
    full vectors by id (an equi-join — the two-tier layout production
    IVF-PQ uses: codes in the scan tier, raw vectors point-looked-up
    for the shortlist only) and re-ranks by exact dot.

    vs int8 scalar quantization (l3f): PQ adapts its codebooks to the
    data; vs IVF: PQ compresses the *scan* while IVF prunes the
    *candidate set* — production ANN (FAISS IVF-PQ) composes both.
    Approximate by construction → recall is property-tested, the
    graded query is rows-only."""
    sample = np.stack(
        [r[0] for r in corpus.select(corpus_vec).limit(train_sample).collect()]
    ).astype("float64")
    books = _pq_codebooks(sample, m, ksub)

    encoded = spread(corpus, corpus_id).withColumn(
        "codes", _pq_encode_udf(books)(F.col(corpus_vec))
    )

    # per-query LUT: flat array of m*ksub dots, lut[j*ksub + c] = q_sub_j · books[j][c].
    # Built in ONE Arrow-batched kernel — an expression-tree formulation
    # (m*ksub aggregate() subtrees) costs more in Catalyst analysis than
    # the whole query; the query side is small by contract, so this UDF
    # touches few rows.
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    sub = dim // m

    @pandas_udf(ArrayType(DoubleType()))
    def lut_udf(vs: pd.Series) -> pd.Series:
        x = np.stack(vs.to_numpy()).astype("float64")  # (batch, dim)
        subs = x.reshape(len(x), m, sub)  # (batch, m, sub)
        # (batch, m, ksub): dot of each query subvector with each centroid
        lut = np.einsum("bms,mks->bmk", subs, books)
        return pd.Series(list(lut.reshape(len(x), m * ksub)))

    q = queries.withColumn("lut", lut_udf(F.col(query_vec)))

    joined = encoded.join(F.broadcast(q), how="cross")  # bcast: fixed (capped query set)
    if pair_filter is not None:
        joined = joined.filter(pair_filter)
    idx = F.sequence(F.lit(0), F.lit(m - 1))
    adc = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(F.col("lut"), j * ksub + F.element_at(F.col("codes"), j + 1) + 1),
    )
    scored = joined.select(query_id, corpus_id, adc.alias("approx_dot"))
    ws = W.partitionBy(query_id).orderBy(F.col("approx_dot").desc(), F.col(corpus_id).asc())
    shortlist = (
        scored.withColumn("__srank", F.row_number().over(ws))
        .filter(F.col("__srank") <= rerank)
        .select(query_id, corpus_id)
    )
    # re-rank tier: fetch full vectors for the shortlist only
    rescored = (
        shortlist.join(corpus, corpus_id)
        .join(F.broadcast(queries), query_id)  # bcast: fixed (capped query set)
        .select(query_id, corpus_id, dot(F.col(query_vec), F.col(corpus_vec)).alias("dotp"))
    )
    w = W.partitionBy(query_id).orderBy(F.col("dotp").desc(), F.col(corpus_id).asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )
