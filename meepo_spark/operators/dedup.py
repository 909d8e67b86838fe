"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard (SURVEY.md §2.B L1/L2).

All stages are built-in DataFrame ops — shingle/minhash/band hashing
runs inside whole-stage codegen via F.hash (murmur3); no Python UDFs.
Scale shape: explode-shuffle is bounded by (docs × shingles); LSH
bucketing turns the quadratic all-pairs problem into per-bucket
self-joins; exact verification touches candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meepo_spark.functions.text import ws_tokens


def shingle_set(text_col, k: int = 3):
    """Column: distinct k-token shingles of a text column."""
    toks = ws_tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    )


def shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Distinct k-token shingles per document, exploded: (id, shingle)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_set(F.col(text_col), k)).alias("shingle"),
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 128) -> DataFrame:
    """(id, h0..h{n-1}): per-doc min of murmur3(shingle, seed_i) for
    each of ``num_hashes`` seeded permutations. One hash-agg — the
    shuffle carries |docs| rows of n ints."""
    aggs = [
        F.min(F.hash(F.col("shingle"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, num_hashes: int = 128, bands: int = 64
) -> DataFrame:
    """Band the signature (r = num_hashes/bands rows per band), bucket
    by (band_idx, band_hash), emit candidate pairs (id_a < id_b).

    b=64/r=2 ⇒ P(candidate | J=0.6) ≈ 1 - (1-0.36)^64 ≈ 1-4e-13:
    effectively total recall above the 0.6 threshold, with false
    positives removed by exact verification downstream.
    """
    r = num_hashes // bands
    assert bands * r == num_hashes, "bands must divide num_hashes"
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(*[F.col(f"h{b * r + j}") for j in range(r)]).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("id", F.explode(band_cols).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def exact_jaccard(
    pairs: DataFrame, docs: DataFrame, text_col: str, id_col: str, set_builder=None
) -> DataFrame:
    """Attach exact set-Jaccard to candidate pairs — the verification
    stage that makes LSH output exact above-threshold. ``set_builder``
    maps the text column to the comparison set (default: distinct
    whitespace tokens; pass ``shingle_set`` for n-gram Jaccard)."""
    sb = set_builder or (lambda c: F.array_distinct(ws_tokens(c)))
    toksets = docs.select(F.col(id_col).alias("id"), sb(F.col(text_col)).alias("toks"))
    ta = toksets.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a")
    tb = toksets.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size(F.array_union("toks_a", "toks_b")).cast("double")
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("jaccard", inter / union)
        .drop("toks_a", "toks_b")
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    shingle_k: int = 3,
    num_hashes: int = 128,
    bands: int = 64,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: pairs with exact
    token-set Jaccard >= threshold (LSH recall ≈ 1 above 0.6 with the
    default band plan)."""
    sh = shingles(docs, text_col, id_col, shingle_k)
    sig = minhash_signatures(sh, num_hashes)
    cand = lsh_candidate_pairs(sig, num_hashes, bands)
    # verify on the SAME set family the signatures approximate
    return exact_jaccard(
        cand, docs, text_col, id_col, set_builder=lambda c: shingle_set(c, shingle_k)
    ).filter(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 64) -> DataFrame:
    """Per-doc SimHash: for each bit, sum ±1 over shingle hashes, take
    the sign. Near-dups land at small Hamming distance. Pure agg —
    one shuffle of |docs| rows × ``bits`` small sums. Uses 3-token
    shingles (not unigrams): with a small vocabulary unigram sets
    barely differ across docs, collapsing all signatures together."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_set(F.col(text_col), 3)).alias("tok"),
    )
    h = F.xxhash64("tok")
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    summed = toks.groupBy("id").agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for i in range(bits):
        # shiftleft stays in JVM long arithmetic (bit 63 would overflow
        # a Python int literal's signed-long range)
        sim = sim.bitwiseOR(
            F.when(
                F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        )
    return summed.select("id", sim.alias("simhash"))


def hamming64(a, b):
    """Popcount of XOR — Hamming distance between two hash columns."""
    return F.bit_count(a.bitwiseXOR(b))
