"""Bloom runtime filter from first principles.

Spark injects bloom runtime filters for shuffle joins internally
(``spark.sql.optimizer.runtime.bloomFilter``) but does not expose
``bloom_filter_agg`` / ``might_contain`` to the public API, so the
map-side semi-join prune has no user-accessible building block. This
module builds one openly:

- ``bloom_build(keys, key_col, n_bits, k)`` hashes every key to ``k``
  positions (disjoint 4-hex-digit slices of one md5 — deterministic
  and engine-reproducible, the registry's hashing discipline) and
  OR-folds them into a DENSE bitmap of ``n_bits/64`` longs carried by
  ONE row — 8 KB at the 65536-bit default, broadcastable to every
  task at any cluster size.
- ``bloom_prune(df, key_col, bloom, n_bits, k)`` drops every row that
  cannot match: ``k`` O(1) ``element_at`` word lookups + bit tests
  per row, pure codegen, before any shuffle toward the join.

No false negatives by construction (every built key's positions are
set — property-tested in tests/test_properties.py); false positives
at rate ~fill_ratio^k are removed by the exact join that follows.
Used by j12_bloom_prune_join; the same pair prunes any fact scan
before an expensive shuffle toward a selective dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_prune", "bloom_positions", "BLOOM_COL"]

BLOOM_COL = "__bloom"


def _hex_digits(n_bits: int) -> int:
    """Hex digits per hash so positions cover [0, n_bits): 4 digits =
    16 bits address 65536; undersizing the slice silently caps the
    usable bitmap (code-review r3b: n_bits > 65536 with 4-digit
    slices never set the upper bits — FP rate stays at the 65536
    level while the broadcast grows)."""
    d = 1
    while (1 << (4 * d)) < n_bits:
        d += 1
    return d


def bloom_positions(key: Column, n_bits: int, k: int) -> list[Column]:
    """``k`` positions in [0, n_bits) from disjoint md5 hex slices."""
    d = _hex_digits(n_bits)
    assert k * d <= 32, f"md5 budget exceeded: {k} hashes x {d} hex digits"
    h = F.md5(key.cast("string"))
    return [
        F.conv(F.substring(h, 1 + d * i, d), 16, 10).cast("long") % n_bits
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, n_bits: int = 65536, k: int = 3
) -> DataFrame:
    """1-row DataFrame holding the dense ``n_bits``-bit bitmap
    (``BLOOM_COL``: array of ``n_bits/64`` longs) over ``keys``."""
    assert n_bits % 64 == 0, "bitmap must be whole 64-bit words"
    pos = keys.select(
        F.explode(
            F.array(*bloom_positions(F.col(key_col), n_bits, k))
        ).alias("p")
    )
    words = (
        pos.select(
            F.expr("cast(shiftright(p, 6) as int)").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("w", "bits")))
        ).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bits // 64 - 1)),
            lambda i: F.coalesce(
                F.try_element_at(F.col("m"), i), F.lit(0).cast("long")
            ),
        ).alias(BLOOM_COL)
    )


def bloom_prune(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = 65536,
    k: int = 3,
) -> DataFrame:
    """Keep only rows whose ``key_col`` MIGHT be in the bloom: the
    1-row bitmap broadcasts, each row tests its ``k`` bits via O(1)
    word lookups (SQL-level shifts — the Python builders only accept
    literal shift amounts), temp columns dropped on the way out."""
    probe = df.crossJoin(F.broadcast(bloom))  # bcast: fixed (1-row bloom sketch)
    tmp = []
    for i, p in enumerate(bloom_positions(F.col(key_col), n_bits, k)):
        probe = probe.withColumn(f"__bp{i}", p)
        tmp.append(f"__bp{i}")
    hit = " AND ".join(
        f"(shiftright(element_at({BLOOM_COL},"
        f" cast(shiftright(__bp{i}, 6) as int) + 1),"
        f" cast(__bp{i} % 64 as int)) & 1) = 1"
        for i in range(k)
    )
    return probe.filter(F.expr(hit)).drop(BLOOM_COL, *tmp)
