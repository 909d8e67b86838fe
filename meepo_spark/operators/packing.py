"""Sequence packing — the last stage of every LLM pretraining data
pipeline (VERDICT r6 #4): pack variable-length tokenized documents
into fixed-capacity training sequences, deterministically, with a
fill-rate / truncation-loss census.

Packing is inherently a sequential recurrence (where doc i goes
depends on every earlier placement), so the scale discipline is the
same one t19/t20/t26 use for ordered folds: make the sequential unit
BOUNDED and parallelize across units. Documents are processed in a
deterministic order key and grouped into fixed-width BLOCKS of at
most ``block_width`` consecutive keys (``key // block_width`` — no
enumeration, no window, monotone by construction); within each block
one JVM-side ``F.aggregate`` fold runs GREEDY FIRST-FIT: each doc
goes into the first already-open sequence with room, else opens a new
one. Sequences never cross blocks, so

- the fold state (open-sequence fill levels + per-doc assignments) is
  bounded by ``block_width`` — constant memory per group at ANY
  corpus size;
- blocks pack independently — the operator is one ``groupBy(block)``
  shuffle of (key, n) pairs, embarrassingly parallel across a
  1000-executor cluster;
- the result is bit-deterministic: same inputs, same assignments, on
  any partitioning (the oracle replays the identical fold in DuckDB
  via ``list_reduce`` with the state prepended — the t20 recipe).

The block boundary costs a little fill efficiency versus a global
first-fit (a block's last sequences can't see the next block's small
docs), which is exactly the trade every distributed packer makes;
the census quantifies it (l50's fill_rate distribution) instead of
hiding it.

First-fit inside the fold, without index surgery: the candidate
sequence is ``array_position(transform(fills, f -> f + n <= cap),
true)`` — 0 when nothing fits (open a new sequence), else the 1-based
index of the FIRST sequence with room; the fill update is an
index-aware ``transform`` (DuckDB twin: 1-based ``(x, i)`` lambda +
``list_position``, which also returns 0-when-absent, probed on 1.0.0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_first_fit(
    items: DataFrame,
    *,
    key_col: str = "doc_id",
    n_col: str = "n",
    capacity: int,
    block_width: int = 128,
) -> DataFrame:
    """Assign each item to a training sequence by bounded-block greedy
    first-fit. Returns one row per item:

    ``(key_col, n_col, block, seq)`` — ``block`` = ``key //
    block_width``; ``seq`` = 1-based sequence ordinal within the
    block. Globally a sequence is identified by ``(block, seq)``.

    Items must satisfy ``0 < n <= capacity`` (truncate/clip upstream —
    the census queries cap at a max-doc length first and account the
    loss); violators raise via the fold's fail-loud guard rather than
    silently opening oversized sequences.
    """
    if capacity <= 0 or block_width <= 0:
        raise ValueError(f"capacity/block_width must be positive")
    cap = F.lit(capacity)

    def step(acc: Column, it: Column) -> Column:
        n = it["n"]
        fit = F.array_position(
            F.transform(acc["fills"], lambda f: f + n <= cap), F.lit(True)
        )
        opened = fit == 0
        new_fills = F.when(
            opened, F.concat(acc["fills"], F.array(n))
        ).otherwise(
            F.transform(
                acc["fills"],
                lambda f, i: F.when(i == fit - 1, f + n).otherwise(f),
            )
        )
        seq = F.when(opened, F.size(acc["fills"]) + 1).otherwise(fit)
        return F.struct(
            new_fills.alias("fills"),
            F.concat(acc["asg"], F.array(seq)).alias("asg"),
        )

    guard = F.lit(capacity)  # items over capacity can never fit and
    # would open an infinite... no: they open a fresh over-full
    # sequence silently. Fail loudly instead (ANSI raise_error).
    blocks = (
        items.select(
            F.col(key_col).alias("k"),
            F.when(
                (F.col(n_col) > 0) & (F.col(n_col) <= guard), F.col(n_col)
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"pack_first_fit: item size out of (0, {capacity}]: "
                        ),
                        F.col(n_col).cast("string"),
                    )
                )
            )
            .cast("long")
            .alias("n"),
            # floor-div, integer-exact for non-negative keys (the
            # dq6 trap: double->BIGINT CAST rounds in DuckDB but
            # truncates in Spark — floor on both sides sidesteps it)
            F.floor(F.col(key_col).cast("long") / F.lit(block_width))
            .cast("long")
            .alias("block"),
        )
        .groupBy("block")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("k"), F.col("n")))
            ).alias("its")
        )
    )
    zero = F.struct(
        F.array().cast("array<long>").alias("fills"),
        F.array().cast("array<long>").alias("asg"),
    )
    folded = blocks.select(
        "block",
        "its",
        F.aggregate(F.col("its"), zero, step)["asg"].alias("asg"),
    )
    pair = folded.select(
        "block", F.explode(F.arrays_zip("its", "asg")).alias("z")
    )
    return pair.select(
        F.col("z.its.k").alias(key_col),
        F.col("z.its.n").alias(n_col),
        "block",
        F.col("z.asg").cast("long").alias("seq"),
    )


def pack_first_fit_sql(
    src: str,
    *,
    key: str = "doc_id",
    n: str = "n",
    capacity: int,
    block_width: int = 128,
) -> str:
    """The DuckDB twin of :func:`pack_first_fit` as a CTE body
    (SELECT ``key, n, block, seq`` FROM ``src``): the SAME fold via
    ``list_reduce`` with the zero state prepended, ``list_position``'s
    0-when-absent mirroring ``array_position``, and parallel
    ``unnest`` zipping assignments back to items by position.
    Generated next to the operator so engine and oracle cannot drift
    independently (the l49 generated-oracle discipline).

    State encoding — one FLAT ``BIGINT[]``, ``[m, f1..fm, a1..ak]``
    (m = open-sequence count, f = fills, a = per-item assignments):
    DuckDB 1.0's ``list_reduce`` CORRUPTS struct-of-list accumulator
    state on the very first fold step (probed r7: a plain
    ``{{'a': list_concat(acc.a, x.a)}}`` fold over 3 elements returns
    ``a = [3]`` — the sibling of the r6 CASE-passthrough trap), while
    flat-list states are the long-proven t19/t20/Holt recipe and were
    re-probed correct here on multi-row, multi-block inputs. The
    Spark fold keeps the readable two-field struct state — the two
    encodings implement the same recurrence and the cross-engine gate
    compares their OUTPUTS."""
    fit = (
        f"coalesce(list_position(list_transform(acc[2:acc[1]+1], "
        f"f -> f + x[1] <= {capacity}), true), 0)"
    )
    return f"""
    SELECT block, it.k AS {key}, it.n AS {n}, sq AS seq
    FROM (
      SELECT block,
             unnest(its) AS it,
             unnest(st[st[1]+2:]) AS sq  -- parallel unnest zips by position
      FROM (
        SELECT block,
               its,
               list_reduce(
                   list_concat([CAST([0] AS BIGINT[])],
                               list_transform(its, it -> [it.n])),
                   (acc, x) -> CASE WHEN {fit} = 0
                     THEN [acc[1]+1] || acc[2:acc[1]+1] || [x[1]]
                          || acc[acc[1]+2:] || [acc[1]+1]
                     ELSE [acc[1]]
                          || list_transform(acc[2:acc[1]+1], (f, i) ->
                               CASE WHEN i = {fit} THEN f + x[1]
                                    ELSE f END)
                          || acc[acc[1]+2:] || [CAST({fit} AS BIGINT)]
                   END
               ) AS st
        FROM (
            SELECT CAST({key} AS BIGINT) // {block_width} AS block,
                   list({{'k': CAST({key} AS BIGINT),
                          'n': CAST({n} AS BIGINT)}}
                        ORDER BY {key}) AS its
            FROM {src}
            GROUP BY 1
        )
      )
    )
    """
