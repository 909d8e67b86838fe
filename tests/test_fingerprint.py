"""operators/fingerprint.py — Karp-Rabin gram hashing + winnowing
(SURVEY.md §2.B L4 "document fingerprinting"). The l53/l54 oracles
cross-engine-check the fixture corpus; these tests pin the OPERATOR
semantics: the pure-Python reference replay, the winnowing guarantee
(shared runs >= k+w-1 tokens intersect), short-document conventions,
and the staged-column plan shape that keeps evaluation linear.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from meepo_spark.operators.fingerprint import (
    B,
    M,
    explode_fps,
    with_fingerprints,
)

K, W = 5, 4


def _code(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % M


def ref_fps(tokens: list[str]) -> set[int]:
    """Pure-Python reference: same spec, independent implementation."""
    codes = [_code(t) for t in tokens]
    gh = []
    for j in range(len(codes) - K + 1):
        h = 0
        for c in codes[j : j + K]:
            h = (h * B + c) % M
        gh.append(h)
    if not gh:
        return set()
    if len(gh) < W:
        return {min(gh)}
    return {min(gh[j : j + W]) for j in range(len(gh) - W + 1)}


def _spark_fps(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).withColumn("toks", F.split(F.lower("text"), " "))
    rows = (
        with_fingerprints(df, "toks", K, W)
        .select("doc_id", "fps")
        .collect()
    )
    return {r.doc_id: set(r.fps) for r in rows}


def test_matches_pure_python_reference_on_random_corpora(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for _ in range(60)
    ]
    got = _spark_fps(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == ref_fps(t.lower().split(" ")), f"doc {i}: {t!r}"


def test_winnowing_guarantee_shared_run(spark):
    """Any shared token run of length >= k + w - 1 must contribute at
    least one common fingerprint (the SIGMOD'03 guarantee l54's
    candidate generation relies on)."""
    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(50)]
    shared = " ".join(rng.choice(vocab) for _ in range(K + W - 1))
    for trial in range(10):
        pre_a = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15)))
        pre_b = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15)))
        a = f"{pre_a} {shared}".strip()
        b = f"{shared} {pre_b}".strip()
        got = _spark_fps(spark, [a, b])
        assert got[0] & got[1], f"trial {trial}: no shared fingerprint"


def test_short_document_conventions(spark):
    got = _spark_fps(
        spark,
        [
            "a b c",                  # < k tokens: no grams, no fps
            "a b c d e",              # exactly k: 1 gram -> 1 fp
            "a b c d e f",            # 2 grams (< w): global min only
            "",                       # empty: split('') -> [''] -> 0 fps
        ],
    )
    assert got[0] == set()
    assert len(got[1]) == 1
    assert len(got[2]) == 1
    assert got[3] == set()


def test_identical_docs_share_all_fingerprints(spark):
    t = "the quick brown fox jumps over the lazy dog again and again"
    got = _spark_fps(spark, [t, t])
    assert got[0] and got[0] == got[1]


def test_explode_fps_keeps_staging(spark):
    """The explode path must not re-inline the staged winnow tree into
    an inferred filter: explode_outer infers no size()>0 filter, so no
    optimized-plan Filter may contain a gram-hash lambda (aggregate
    over a slice). A plain explode regresses to O(n^3) per row —
    the measured sf0.1 hang."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    ).withColumn("toks", F.split(F.lower("text"), " "))
    e = explode_fps(with_fingerprints(df, "toks", K, W).select("doc_id", "fps"))
    plan = e._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if line.strip().startswith(("Filter", "+- Filter")):
            assert "aggregate(" not in line, f"inlined gram tree in filter: {line[:200]}"
    # 10 tokens -> 6 grams -> 3 windows -> between 1 and 3 distinct fps
    assert 1 <= e.count() <= 3
