"""Runtime bounds for the BroadcastNestedLoopJoin waivers — the same
treatment tests/test_window_waivers.py gives the window waivers: a
prose claim like "1-row scalar broadcast" is cheap to write and easy
to falsify silently (the r4 window audit's FIRST run falsified 3 of
its own waivers), so every NESTED_LOOP_WAIVED query is EXECUTED at
sf0.1 and the rows actually flowing through each BNLJ's DIRECT build-
side BroadcastExchange are asserted against a per-query bound.

Bounds are measured values (tools/measure_broadcasts.py) with ~2x
headroom — all are constants by construction (scalar aggregates,
fixed probe sets, config grids, calendar spines, bounded samples),
far below any fact-sized frame; a refactor that silently grows a
build side to data scale fails here long before it OOMs a driver.

Fail-closed design (code-review r5c): all 54 queries are measured
ONCE in a module fixture; a positive-control test asserts that a
healthy majority actually produced non-empty BNLJ measurements — a
Spark rename of the node (or a walker bug like the ReusedExchange
skip the review caught) cannot turn the whole audit vacuous-green.
The walk stops at any nested join so a downstream BroadcastHashJoin's
(possibly size-gated, Catalyst-chosen) broadcast is never charged to
the BNLJ under audit.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from meepo_spark.registry import QUERIES, load_all
from tools.measure_broadcasts import bnlj_broadcast_rows
from tools.plancheck import NESTED_LOOP_WAIVED

load_all()

WAIVER_SF_DIR = os.environ.get(
    "SPARK_GRAFT_WAIVER_SF_DIR", "/root/testdata/sf0.1"
)

# default bound: a scalar/handful broadcast (measured 1-16 rows)
DEFAULT_BOUND = 32
BNLJ_BOUNDS: dict[str, int] = {
    # fixed probe / seed sets
    "l3_cosine_topk": 32,
    "l3d_ivf_topk": 32,
    "l55_matryoshka_recall": 32,
    "l3h_mips_topk": 32,
    "l3i_pq_topk": 32,
    "l34_hard_negatives": 32,
    "l3l_pq_seeded_topk": 32,
    "l3k_ivf_seeded_topk": 48,
    # blocked pair-generator probe frames (200-doc samples). Bound is
    # several reuses wide: when the build side sits on a session-cached
    # frame, the SAME exchange object (and its SQLMetric) can serve
    # several queries measured earlier in this module, so the metric
    # ACCUMULATES across them — observed l3c at >512 once after g26
    # joined the rotation. Still orders of magnitude under fact size.
    "l18_dedup_signal_agreement": 4096,
    "l3c_embedding_near_dup": 4096,
    "l2c_ngram_jaccard_block": 8192,  # 2000-doc block frame if planned as BNLJ
    "l63_jl_projection": 2048,  # 100-vector probe block (cache-reuse headroom)
    "l13_dedup_threshold_curve": 64,
    # 1%-sample signature frame (l24-style sample-bounded truth join)
    "l49_minhash_calibration": 128,
    # calendar spine (|days| of the fixture month)
    "t8_gap_fill": 128,
    "e14_active_user_ratios": 128,
    # config / state grids
    "m6_markov_stationary": 64,  # |S|x|S| = 25 state grid
    "l41_lsh_band_tuning": 32,
    "l17_epoch_shuffle": 32,
    "l4f_tfidf_terms": 128,  # 31-row df table
}

# measured at sf0.1: 49 of 54 waived queries materialize >=1 BNLJ
# (AQE plans the shape away for the handful of others at this SF)
MIN_MEASURED = 40


@pytest.fixture(scope="module")
def measurements(spark):
    # The 54 measured executions are independent; run them through a
    # small thread pool so the next query's tasks back-fill executors
    # freed by the current one's tail (guide §2.6) — sequential, this
    # fixture alone cost 188 s of the suite's 25 min (optimization
    # r11). Queries sharing a session-cached frame may accumulate a
    # shared exchange's SQLMetric in any order; the bounds above carry
    # that headroom already (see the l3c note).
    from concurrent.futures import ThreadPoolExecutor

    names = [n for n in sorted(NESTED_LOOP_WAIVED) if n in QUERIES]

    def measure(name: str) -> tuple[str, list[int]]:
        return name, bnlj_broadcast_rows(QUERIES[name](spark, WAIVER_SF_DIR))

    with ThreadPoolExecutor(max_workers=6) as pool:
        return dict(pool.map(measure, names))


def test_audit_measures_a_majority_of_waived_plans(measurements):
    """Positive control: the walker must actually FIND the BNLJs.
    An empty measurement is legal per query (AQE variance) but a
    collapse across the board means the node name or the walk broke —
    the vacuous-green failure mode this guard closes."""
    non_empty = sum(1 for rows in measurements.values() if rows)
    assert non_empty >= MIN_MEASURED, (
        f"only {non_empty}/{len(measurements)} waived queries produced a "
        "BNLJ measurement — the audit walker is measuring nothing"
    )


@pytest.mark.parametrize("name", sorted(NESTED_LOOP_WAIVED))
def test_waived_bnlj_build_side_is_runtime_bounded(measurements, name):
    if name not in measurements:
        pytest.skip(f"{name} not registered")
    rows = measurements[name]
    bound = BNLJ_BOUNDS.get(name, DEFAULT_BOUND)
    assert all(r <= bound for r in rows), (
        f"{name}: BNLJ build side carried {rows} rows at sf0.1 "
        f"(bound {bound}) — the waiver's bounded-broadcast claim is "
        "falsified; fix the plan or re-justify the waiver"
    )
