"""Sparse-retrieval scaling probe (VERDICT r8 #1, SCALE.md §22).

Measures how the l68 posting-join pair space grows under two corpus
growth regimes, at each probed multiple of the base documents fixture:

* **disjoint replication** (every token suffixed with its replica id,
  the dedup_scaling discipline): vocabulary grows with the corpus and
  per-term df stays constant — the Heaps-law shape of a real corpus.
  The EXACT df-capped index (l68 mode) must scale linearly here: pair
  volume SUM(df^2) grows ~1x per doc, and the end-to-end all-docs
  top-3 wall is probed to confirm.
* **hot-term replication** (no suffix): every replica shares the base
  vocabulary, so df grows with the multiple while vocab stays FIXED —
  the adversarial stopword-heavy regime. The exact index's pair
  volume grows ~mult^2 (reported as a census, not run — that
  quadratic IS the finding), while the PRUNED index (posting_cap = R,
  l68c mode) bounds pairs at |vocab| * R^2 — flat in the multiple —
  and its end-to-end wall is probed to confirm the join cost follows
  the pair census, not the corpus square.

Pair censuses come from the df frame alone (SUM(df^2) for exact,
SUM(LEAST(df, R)^2) for pruned) — no join is materialized to measure
one.

Usage: python tools/sparse_scaling.py [sf_dir] [mults-csv] [R]
Defaults: /root/testdata/sf0.01, 1,8,32, R=20. Prints one JSON line
per (mult, regime) plus a summary with least-squares log-log wall
exponents for the two linear modes.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from meepo_spark.operators.sparse import (
    df_capped_tfidf,
    doc_terms,
    sparse_cosine_topk,
)
from meepo_spark.session import get_spark


def _fit_exponent(points: list[tuple[int, float]]) -> float | None:
    """Least-squares slope of log(wall) over log(mult) — all probed
    multiples, not just the endpoints (ADVICE r8 discipline)."""
    if len({m for m, _ in points}) < 2:
        return None
    xs = [math.log(m) for m, _ in points]
    ys = [math.log(max(w, 1e-9)) for _, w in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    return sxy / sxx


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    mults = [
        int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,8,32").split(",")
    ]
    cap_r = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    spark = get_spark("sparse-scaling")
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_base = base.count()

    def rep(i: int, disjoint: bool) -> DataFrame:
        if not disjoint:
            return base.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"), "text"
            )
        # stage the token array before the suffixing transform — an
        # inline split inside the HOF lambda re-splits the whole text
        # per token (the doc_terms / fingerprint.py:100 trap)
        return base.withColumn("__ts", F.split("text", " ")).select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.array_join(
                F.transform(F.col("__ts"), lambda t: F.concat(t, F.lit(f"_{i}"))),
                " ",
            ).alias("text"),
        )

    def corpus(mult: int, disjoint: bool) -> DataFrame:
        d = rep(0, disjoint)
        for i in range(1, mult):
            d = d.unionAll(rep(i, disjoint))
        return d

    def census(df_frame: DataFrame, r: int) -> dict:
        row = (
            df_frame.filter("kept")
            .agg(
                F.sum(F.col("df") * F.col("df")).alias("exact_pairs"),
                F.sum(
                    F.least(F.col("df"), F.lit(r))
                    * F.least(F.col("df"), F.lit(r))
                ).alias("pruned_pairs"),
                F.count(F.lit(1)).alias("vocab"),
            )
            .collect()[0]  # bounded: 1-row census
        )
        return {
            "vocab_kept": row["vocab"],
            "exact_pair_volume": row["exact_pairs"],
            "pruned_pair_volume": row["pruned_pairs"],
        }

    def run_topk(d: DataFrame, posting_cap: int | None) -> float:
        idx = df_capped_tfidf(doc_terms(d), posting_cap=posting_cap)
        w = idx["postings"].localCheckpoint()  # one index build, reused 3x
        norms = w.groupBy("doc_id").agg(
            F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nr")
        )
        t0 = time.time()
        sparse_cosine_topk(w, norms, k=3).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    run_topk(corpus(1, True), None)  # warm codegen once
    exact_walls: list[tuple[int, float]] = []
    pruned_walls: list[tuple[int, float]] = []
    for mult in mults:
        for regime, disjoint in (("disjoint", True), ("hot", False)):
            d = corpus(mult, disjoint)
            idx = df_capped_tfidf(doc_terms(d))
            rec = {"mult": mult, "docs": n_base * mult, "regime": regime}
            rec.update(census(idx["df"], cap_r))
            if regime == "disjoint":
                rec["wall_exact_topk_s"] = round(run_topk(d, None), 2)
                exact_walls.append((mult, rec["wall_exact_topk_s"]))
            else:
                # exact-hot join is ~mult^2 BY CENSUS — not run; the
                # pruned index is the mode that survives this regime
                rec["wall_pruned_topk_s"] = round(run_topk(d, cap_r), 2)
                pruned_walls.append((mult, rec["wall_pruned_topk_s"]))
            print(json.dumps(rec), flush=True)

    summary = {
        "exponent_exact_disjoint": (
            None
            if (e := _fit_exponent(exact_walls)) is None
            else round(e, 3)
        ),
        "exponent_pruned_hot": (
            None
            if (p := _fit_exponent(pruned_walls)) is None
            else round(p, 3)
        ),
        "posting_cap": cap_r,
    }
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
