"""Frequency-sketch operators — one-pass heavy-hitter candidates.

The scale problem: "which terms exceed phi·N frequency" over a 100 TB
token stream. The naive plan shuffles the FULL (term, count) stream to
a hash aggregation — shuffle volume = corpus vocabulary × partitions.
The sketch plan runs a Misra-Gries summary inside each input partition
(`mapInPandas`, no shuffle), emitting at most k candidate rows per
partition; by the pigeonhole guarantee the union of partition
summaries contains EVERY term with global frequency > N/k (if a term
stayed under the local threshold in every partition, its global count
is under the sum of local thresholds = N/k). A second pass then counts
ONLY the candidates exactly (broadcast semi-join against the tiny
candidate set) — so the final answer is exact, while the shuffle
carries at most k·partitions rows instead of the vocabulary.

This is the mergeable-summaries pattern (Agarwal et al., "Mergeable
Summaries", PODS 2012) specialized to the two-pass exact-verify form a
batch engine prefers: approximate where it saves the shuffle, exact
where the answer is graded.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    df: DataFrame, col: str, k: int, with_partition_totals: bool = False
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``df[col]`` (a string
    term stream). Returns ``(term, lb)`` with at most ``k`` rows per
    input partition, where ``lb`` is the MG lower-bound counter.

    Guarantee (per partition of size n_p): every term with partition
    frequency > n_p/k survives in the summary, and each surviving
    counter undercounts by at most n_p/k. Union over partitions
    therefore contains every term with global frequency > N/k.

    Weighted-update form: each Arrow batch is pre-reduced with a
    vectorized ``value_counts`` so the Python dict sees one weighted
    update per distinct term per batch, not one per row.

    ``with_partition_totals`` additionally emits one ``(NULL, n_p)``
    row per partition (the partition's exact row count), so the
    caller gets the stream total N from the SAME pass instead of
    re-scanning the term stream just to count it (optimization r11:
    heavy_hitters_exact paid a third full bigram pass for N).
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for term, c in pdf[col].value_counts().items():
                counters[term] = counters.get(term, 0) + int(c)
                if len(counters) > k:
                    m = min(counters.values())
                    counters = {
                        t: v - m for t, v in counters.items() if v > m
                    }
        terms = list(counters)
        lbs = list(counters.values())
        if with_partition_totals:
            terms.append(None)
            lbs.append(n_rows)
        yield pd.DataFrame({"term": terms, "lb": lbs})

    return df.select(F.col(col).alias(col)).mapInPandas(
        summarize, "term string, lb long"
    )


def heavy_hitters_exact(
    terms: DataFrame, col: str, k: int
) -> DataFrame:
    """Exact heavy hitters: every term of ``terms[col]`` whose global
    frequency f satisfies f·k > N, with its exact count. Runs the
    MG candidate pass (no shuffle, ≤k rows out per partition), then
    exactly counts candidates only — the groupBy shuffle carries just
    the rows matching the broadcast candidate set, and the scalar N
    joins back as a broadcast, so no stage shuffles the full stream.
    """
    # ONE sketch pass serves both the candidate set and the exact
    # stream total N (the NULL partition-total rows) — the stream is
    # touched twice overall (sketch, exact verify), not three times.
    # The summary is bounded at (k+1)·partitions rows; localCheckpoint
    # materializes it so its two consumers don't re-run the pass.
    sk = misra_gries_candidates(
        terms, col, k, with_partition_totals=True
    ).localCheckpoint()
    cands = (
        sk.filter(F.col("term").isNotNull())
        .select(F.col("term").alias("__cand"))
        .distinct()
    )
    total = sk.filter(F.col("term").isNull()).agg(
        F.sum("lb").alias("n_total")
    )
    counted = (
        terms.join(F.broadcast(cands), terms[col] == F.col("__cand"), "inner")  # bcast: fixed (sketch-width candidates)
        .groupBy(terms[col].alias("term"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counted.crossJoin(F.broadcast(total))  # bcast: fixed (1-row total)
        .filter(F.col("n_occurrences") * k > F.col("n_total"))
        .select("term", "n_occurrences")
    )


def bigrams_from_toks(toks: Column) -> Column:
    """Adjacent token pairs of a MATERIALIZED token-array column as
    "a b" strings — value-identical to ``bigrams(text)`` over
    ``split(lower(text), ' ')``, but evaluated against a column that
    already exists (the session-cached tokenized frame), so the split
    is never re-run. ``bigrams(text)`` references its ``split``
    subtree once per element access inside the transform lambda;
    CollapseProject inlines it and the text is re-split O(len) times
    per doc (the l19/l68b HOF re-evaluation trap, optimization r11:
    l4k's three Generate nodes each paid it)."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigrams(text: Column) -> Column:
    """Adjacent lowercase whitespace-token pairs of ``text`` as an
    array of "a b" strings (empty for single-token docs)."""
    toks = F.split(F.lower(text), " ")
    # sequence(1, 0) would generate a DESCENDING [1, 0] in Spark, so
    # single-token docs need the explicit empty branch.
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
