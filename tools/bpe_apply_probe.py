"""bpe_apply compile-wall probe (VERDICT r6 #1): measure WHY the
chained-fold application path cannot reach a real 30-50k-merge
vocabulary, and that the Arrow kernel path is flat where the fold
path blows up.

Two costs per k, measured separately:

  * t_plan — driver-side analysis/planning of the application frame
    (``executedPlan()`` forced, nothing executed): the fold chain
    builds a k-deep nested higher-order-function expression, so this
    grows super-linearly with k; the kernel plans ONE ArrowEvalPython
    node regardless of k;
  * t_exec — end-to-end execution over a synthetic 50k-word frame
    (32 partitions, write to noop-equivalent count): the fold chain
    additionally pays codegen + per-row evaluation of k folds; the
    kernel pays one Arrow transfer plus the substring-indexed replay
    (per-word work bounded by word length², not k).

The merge table is synthetic-but-realistic: trained-shape pairs over
a 26-letter alphabet whose concatenations DO hit word substrings, so
the kernel's candidate filter is exercised, not bypassed.

Usage: python tools/bpe_apply_probe.py  — prints one JSON line per
(path, k) plus a summary; the fold path is capped at the first k
whose planning alone exceeds ~60 s (the wall IS the result).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meepo_spark.operators.bpe import bpe_apply
from meepo_spark.session import get_spark


def synthetic_merges(spark, k: int):
    """A k-row merge table whose pairs look trained: early merges are
    (char, char), later ones reuse earlier concatenations — the
    left/right symbol growth a real BPE table has."""
    rng = random.Random(13)
    alphabet = [chr(ord("a") + i) for i in range(26)]
    symbols = list(alphabet)
    rows = []
    for step in range(1, k + 1):
        left = rng.choice(symbols)
        right = rng.choice(alphabet)  # keep symbol growth sub-exponential
        rows.append((step, left, right))
        merged = left + right
        if len(merged) <= 6:
            symbols.append(merged)
    return spark.createDataFrame(rows, "step long, left string, right string")


def word_frame(spark, n: int = 50_000):
    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcdefghijkl") for _ in range(rng.randint(3, 12)))
        for _ in range(n)
    ]
    return spark.createDataFrame([(w,) for w in words], "word string").repartition(32)


def probe(spark, words, merges, k: int, force_kernel: bool):
    t0 = time.monotonic()
    out = bpe_apply(words, merges, compile_threshold=0 if force_kernel else 10**9)
    out._jdf.queryExecution().executedPlan()  # force analysis+planning
    t_plan = time.monotonic() - t0
    t1 = time.monotonic()
    n = out.select(F.sum(F.size("syms"))).collect()[0][0]
    t_exec = time.monotonic() - t1
    return {
        "path": "kernel" if force_kernel else "fold",
        "k": k,
        "t_plan": round(t_plan, 2),
        "t_exec": round(t_exec, 2),
        "sym_total": int(n),
    }


def main() -> None:
    spark = get_spark("bpe-apply-probe")
    words = spark.createDataFrame([("warm",)], "word string")
    bpe_apply(words, synthetic_merges(spark, 4)).collect()  # JVM warm
    wf = word_frame(spark).localCheckpoint()

    results = []
    fold_walled = False
    for k in (8, 64, 256, 1024, 2000):
        m = synthetic_merges(spark, k).localCheckpoint()
        r_k = probe(spark, wf, m, k, force_kernel=True)
        results.append(r_k)
        print(json.dumps(r_k), flush=True)
        if not fold_walled:
            try:
                r_f = probe(spark, wf, m, k, force_kernel=False)
            except Exception as exc:  # the wall IS the result: at
                # k=256 the k-deep nested fold tree exceeds the
                # analyzer's max resolution iterations (100) and the
                # plan never even analyzes — measured r7
                fold_walled = True
                print(
                    json.dumps(
                        {
                            "path": "fold",
                            "k": k,
                            "error": f"{type(exc).__name__}: {str(exc)[:160]}",
                        }
                    ),
                    flush=True,
                )
                continue
            results.append(r_f)
            print(json.dumps(r_f), flush=True)
            if r_f["t_plan"] + r_f["t_exec"] > 60:
                fold_walled = True
                print(
                    json.dumps({"fold_wall_at_k": k, "note": "fold path capped"}),
                    flush=True,
                )
    kern = {r["k"]: r for r in results if r["path"] == "kernel"}
    fold = {r["k"]: r for r in results if r["path"] == "fold"}
    # correctness spot-check at the largest k BOTH paths ran
    common = max(set(kern) & set(fold))
    assert kern[common]["sym_total"] == fold[common]["sym_total"], (
        kern[common],
        fold[common],
    )
    print(
        json.dumps(
            {
                "summary": {
                    "kernel_t_exec_by_k": {k: r["t_exec"] for k, r in kern.items()},
                    "fold_t_total_by_k": {
                        k: round(r["t_plan"] + r["t_exec"], 2)
                        for k, r in fold.items()
                    },
                    "paths_agree_at_k": common,
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
