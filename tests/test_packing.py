"""operators/packing.py — bounded-block greedy first-fit sequence
packing (VERDICT r6 #4). The l50/l51/l52 oracles cross-engine-check
the fixture corpus; these tests pin the OPERATOR semantics on
adversarial inputs: first-fit (not next-fit) bin choice, capacity
saturation, partitioning invariance, block independence, and the
fail-loud oversize guard.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from meepo_spark.operators.packing import pack_first_fit


def ref_pack(items, capacity, block_width):
    """Pure-Python reference: same deterministic spec."""
    out = {}
    blocks: dict[int, list[tuple[int, int]]] = {}
    for k, n in items:
        blocks.setdefault(k // block_width, []).append((k, n))
    for b, its in blocks.items():
        fills: list[int] = []
        for k, n in sorted(its):
            for i, f in enumerate(fills):
                if f + n <= capacity:
                    fills[i] += n
                    out[k] = (b, i + 1)
                    break
            else:
                fills.append(n)
                out[k] = (b, len(fills))
    return out


def _run(spark, items, capacity=100, block_width=8, parts=None):
    df = spark.createDataFrame(items, "doc_id long, n long")
    if parts:
        df = df.repartition(parts)
    got = pack_first_fit(
        df, capacity=capacity, block_width=block_width
    ).collect()
    return {r["doc_id"]: (r["block"], r["seq"]) for r in got}


def test_first_fit_reuses_earlier_open_sequence(spark):
    # 60,60,30: next-fit would close seq1 at 60 and put 30 into seq2
    # (fill 90); FIRST-fit returns to seq1 (60+30=90) — that return is
    # the semantics under test.
    items = [(0, 60), (1, 60), (2, 30)]
    got = _run(spark, items)
    assert got == {0: (0, 1), 1: (0, 2), 2: (0, 1)}


def test_matches_reference_on_random_inputs(spark):
    rng = random.Random(31)
    # sparse, shuffled keys across several blocks, sizes spanning
    # tiny to capacity-exact
    keys = rng.sample(range(200), 60)
    items = [(k, rng.randint(1, 100)) for k in keys]
    got = _run(spark, items, capacity=100, block_width=8)
    assert got == ref_pack(items, 100, 8)


def test_partitioning_invariance(spark):
    rng = random.Random(47)
    items = [(k, rng.randint(1, 50)) for k in range(100)]
    a = _run(spark, items, parts=1)
    b = _run(spark, items, parts=13)
    assert a == b == ref_pack(items, 100, 8)


def test_no_sequence_exceeds_capacity_and_all_items_assigned(spark):
    rng = random.Random(53)
    items = [(k, rng.randint(1, 100)) for k in range(300)]
    df = spark.createDataFrame(items, "doc_id long, n long")
    out = pack_first_fit(df, capacity=100, block_width=16)
    assert out.count() == len(items)
    fills = out.groupBy("block", "seq").agg(F.sum("n").alias("f"))
    assert fills.filter(F.col("f") > 100).count() == 0
    # first-fit tightness: no TWO sequences in a block could merge
    # (else the later one's docs would have first-fit into the earlier)
    # — weak form: at most one sequence per block under half-full
    under = fills.filter(F.col("f") <= 50).groupBy("block").count()
    assert under.filter(F.col("count") > 1).count() == 0


def test_blocks_pack_independently(spark):
    rng = random.Random(61)
    items = [(k, rng.randint(1, 90)) for k in range(64)]
    full = _run(spark, items, capacity=100, block_width=8)
    one_block = [(k, n) for k, n in items if 16 <= k < 24]
    alone = _run(spark, one_block, capacity=100, block_width=8)
    assert {k: v for k, v in full.items() if 16 <= k < 24} == alone


def test_oversize_item_raises(spark):
    df = spark.createDataFrame([(0, 101)], "doc_id long, n long")
    with pytest.raises(Exception, match="out of \\(0, 100\\]"):
        pack_first_fit(df, capacity=100, block_width=8).collect()


def test_zero_size_item_raises(spark):
    df = spark.createDataFrame([(0, 0)], "doc_id long, n long")
    with pytest.raises(Exception, match="out of"):
        pack_first_fit(df, capacity=100, block_width=8).collect()
