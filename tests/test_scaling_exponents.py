"""Scaling-exponent regression gate (VERDICT r5 #5).

The scaling probes (tools/*_scaling.py) measured their exponents once;
this gate re-measures the three cheapest shapes at TWO sizes on every
test run and asserts the growth ratio stays inside a recorded band
(SCALE.md §8), so a plan change that re-introduces a super-linear
shape — a global single-task sort, a pair blow-up, an O(n) commit —
fails a test instead of a judge's read.

Band discipline: the input grows ×4, so a linear operator lands near
4 (usually below — fixed overheads amortize) and the band tops out at
8×; the quadratic/single-task failure modes these operators replaced
measure 16×+ on the same step. Bands are deliberately generous: this
gate exists to catch EXPONENT regressions, not percent-level drift
(the bench guard owns that), and a tight wall-clock band on a shared
box would flake (the r5 host-drift lesson)."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

# ×4 input step; linear ops must stay under this wall-clock growth.
GROWTH_STEP = 4
LINEAR_BAND_MAX = 8.0
SMALL_N = 250_000
# CommitLog: per-commit cost at version ~220 vs version ~20 (O(1)
# modulo the full-state JSON reread, which is KB-sized here).
COMMIT_BAND_MAX = 6.0


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _enumeration_wall(spark, n: int) -> float:
    from meepo_spark.operators.enumeration import bucketed_row_number

    big = (
        spark.range(n)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("ln"))
        .persist()
    )
    big.count()
    try:
        width = max(n // 256, 1)  # bucket count stays ~256 at any n
        return _timed(
            lambda: _force(
                bucketed_row_number(
                    big,
                    F.floor(F.col("k") / width),
                    [F.col("k").asc(), F.col("ln").asc()],
                    out="rn",
                )
            )
        )
    finally:
        big.unpersist()


def _prefix_wall(spark, n: int) -> float:
    from meepo_spark.operators.enumeration import bucketed_prefix_sum

    big = (
        spark.range(n)
        .select(
            (F.col("id") % 3).alias("g"),
            F.col("id").alias("cents"),
            (F.col("id") % 11 + 1).alias("w"),
        )
        .persist()
    )
    big.count()
    try:
        width = max(n // 256, 1)
        return _timed(
            lambda: _force(
                bucketed_prefix_sum(
                    big,
                    bucket=F.floor(F.col("cents") / width),
                    order_cols=[F.col("cents").asc()],
                    vals={"cumw": "w"},
                    part_cols=["g"],
                )
            )
        )
    finally:
        big.unpersist()


def _growth(spark, wall_fn) -> float:
    # small measured twice, min taken: the first run absorbs codegen
    # for this plan shape so the ratio isn't inflated by warmup
    small = min(wall_fn(spark, SMALL_N) for _ in range(2))
    big = wall_fn(spark, SMALL_N * GROWTH_STEP)
    return big / small


def test_bucketed_enumeration_growth_stays_linear(spark):
    ratio = _growth(spark, _enumeration_wall)
    assert ratio < LINEAR_BAND_MAX, (
        f"bucketed_row_number grew {ratio:.1f}x on a {GROWTH_STEP}x input — "
        "super-linear shape reintroduced? (SCALE.md §8 band)"
    )


def test_bucketed_prefix_sum_growth_stays_linear(spark):
    ratio = _growth(spark, _prefix_wall)
    assert ratio < LINEAR_BAND_MAX, (
        f"bucketed_prefix_sum grew {ratio:.1f}x on a {GROWTH_STEP}x input — "
        "super-linear shape reintroduced? (SCALE.md §8 band)"
    )


def test_commit_log_commit_cost_stays_flat(tmp_path):
    """The eventstore_scaling claim (manifest commit O(1)): mean
    per-commit wall over a 20-commit window must not grow past
    COMMIT_BAND_MAX between version ~20 and version ~220 — an O(n)
    commit (e.g. re-listing every data dir, rewriting per-epoch files)
    shows up as ~10x here."""
    from meepo_spark.cdc.commit_log import CommitLog

    log = CommitLog(str(tmp_path / "s"))

    def window(start: int) -> float:
        t0 = time.perf_counter()
        for e in range(start, start + 20):
            log.commit(e, [f"data/epoch={e}"])
        return (time.perf_counter() - t0) / 20

    early = window(0)
    for e in range(20, 200):
        log.commit(e, [f"data/epoch={e}"])
    late = window(200)
    assert late / early < COMMIT_BAND_MAX, (
        f"per-commit cost grew {late / early:.1f}x between version ~20 and "
        f"~220 ({early * 1e3:.2f}ms -> {late * 1e3:.2f}ms) — commit is no "
        "longer O(1) in committed-epoch count"
    )
