"""Runtime audit of plancheck's WINDOW_WAIVED bounds (VERDICT r3 #3).

Each waiver in ``tools/plancheck.py`` documents in prose why its
flagged (unpartitioned / tiny-key) window runs over a BOUNDED input.
Prose can rot: an edit that unbounds one (or a bound that was never
true — this audit's first run caught g11 windowing over 594k
"distinct cents" rows at sf0.1, ~the whole fact) must fail a test,
not resurrect the single-task sort silently.

Mechanism: execute every waived query at sf0.1 through its own
QueryExecution (``toRdd().count()`` — no driver collect of rows),
walk the final adaptive plan, classify each Window node with the same
``window_partition_flags`` parser plancheck uses, and for each
FLAGGED window measure its input cardinality from executed-plan SQL
metrics — stopping at an explicit TakeOrderedAndProject / Limit,
whose ``limit=k`` is the structural bound (those nodes carry no row
metric; descending past them reads the pre-limit scan). The measured
input must stay within the documented bound below.

WAIVER_BOUNDS must cover WINDOW_WAIVED exactly: adding a waiver
without a documented numeric bound fails the completeness test.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tools"))

from plancheck import WINDOW_WAIVED, window_partition_flags  # noqa: E402

from meepo_spark.registry import QUERIES, load_all  # noqa: E402

load_all()

WAIVER_SF_DIR = os.environ.get(
    "SPARK_GRAFT_WAIVER_SF_DIR", "/root/testdata/sf0.1"
)

# Documented max input rows for each waived query's flagged windows at
# sf0.1 (generous headroom over measured values; far below fact sizes
# of 600k lineitem / 600k events / 5k docs so a collapse back to a
# fact-sized window always trips). Explicit-limit windows record the
# limit constant.
WAIVER_BOUNDS: dict[str, int] = {
    # running offsets over per-bucket aggregates (o7 discipline):
    "o7_global_enumeration": 100,     # 32 equal-width key buckets
    "m3_rfm_segments": 300,           # 3 x 32 quartile-rank buckets
    "l17_epoch_shuffle": 2000,        # 3 epochs x 256 md5 prefixes
    "e3_max_concurrency": 20_000,     # |types| x |hours| sweep buckets
    "g11_weighted_median": 4000,      # <=321 32768-cent bands x 3 flags
    "v11_equidepth_histogram": 500,   # 3 flags x 32 value buckets
    "o6_null_ordering": 2000,         # per-(flag, bucket) offsets
    "a8_replay_range": 2000,          # hour buckets in the replay range
    "l8_sequence_packing": 2000,      # 1000x-reduced doc-id buckets
    "l52_shuffled_packing": 400,      # 256 md5-prefix buckets
    "l60_sorted_neighborhood": 128,   # first-char-of-key buckets
                                      # (ASCII alphabet-bounded)
    "v24_mann_whitney_u": 4096,       # 32768-cent revenue bands
                                      # (per-user revenue range / 32768)
    "l21_classifier_auc": 4000,       # 1024-wide score bands x sources
    "l23_quality_decile_budget": 300, # 32 quality buckets
    "t19_cusum_changepoint": 400,     # ceil(days/8) bands x |types|
    # windows over distinct-value / calendar / fixed-grid frames:
    "o8_pareto_frontier": 25_000,     # DISTINCT retail prices (formula
                                      # domain <=~120k values; 1000 @ sf0.1)
    "v8_histogram": 100,              # 20 fixed-width bins
    "v13_ks_test": 4000,              # 1024-cent bands x 5 types
    "dq2_volume_anomaly": 400,        # one row per calendar day
    # windows AFTER an explicit LIMIT-k / tiny-graph reduction:
    "o1_global_sort_top100": 100,     # TakeOrdered(100)
    "g14_triangle_count": 100,        # TakeOrdered(20)
    "l14_hybrid_retrieval": 100,      # two TakeOrdered(50) shortlists
    "l14b_hybrid_fused_retrieval": 100,  # two TakeOrdered(50) shortlists
    # round-5:
    "a25_out_of_order_depth": 2000,   # 3 topics x (offset-range + day) buckets
    "l38_temperature_mixture": 10,    # 5-language share frame
    "l43_dup_quality_interaction": 100,  # 32-bucket ntile aggregate
    # round-6:
    "e18_pareto_concentration": 4000,  # distinct per-user volumes x 5 types
    # round-8:
    "v26_bh_fdr": 200,                 # <= |event types| x 12 month cells
}

_LIMIT_RE = re.compile(r"limit=(\d+)")


# shared executed-plan walkers (code-review r5: one walker to rule the
# window audit, the Z-order pruning test, and the probes)
from meepo_spark.plan_metrics import children as _children
from meepo_spark.plan_metrics import metrics as _metrics
from meepo_spark.plan_metrics import unwrap as _unwrap


def _windows(node, acc):
    node = _unwrap(node)
    if node.nodeName() == "Window":
        acc.append(node)
    for c in _children(node):
        _windows(c, acc)
    return acc


def _input_rows(node):
    """Rows flowing into a window: nearest descendant row metric, but
    an explicit limit node IS the bound (no metric of its own)."""
    node = _unwrap(node)
    name = node.nodeName()
    if "TakeOrderedAndProject" in name or "Limit" in name:
        m = _LIMIT_RE.search(node.simpleString(50))
        if m:
            return int(m.group(1))
    mets = _metrics(node)
    for k in ("numOutputRows", "recordsRead", "shuffleRecordsWritten"):
        if k in mets:
            return mets[k]
    for c in _children(node):
        r = _input_rows(c)
        if r is not None:
            return r
    return None


def test_waiver_bounds_cover_waiver_list():
    assert WAIVER_BOUNDS.keys() == WINDOW_WAIVED, (
        "every WINDOW_WAIVED entry needs a documented numeric bound "
        f"here; diff: {WAIVER_BOUNDS.keys() ^ WINDOW_WAIVED}"
    )


@pytest.mark.parametrize("name", sorted(WAIVER_BOUNDS))
def test_waived_window_input_is_bounded(spark, name):
    df = QUERIES[name](spark, WAIVER_SF_DIR)
    qe = df._jdf.queryExecution()
    qe.toRdd().count()
    flagged_inputs = []
    for w in _windows(qe.executedPlan(), []):
        if window_partition_flags(w.simpleString(500)):
            flagged_inputs.append(_input_rows(_children(w)[0]))
    bound = WAIVER_BOUNDS[name]
    blown = [r for r in flagged_inputs if r is None or r > bound]
    assert not blown, (
        f"{name}: flagged window input(s) {flagged_inputs} exceed the "
        f"documented bound {bound} at {WAIVER_SF_DIR} — the waiver's "
        "'bounded input' premise no longer holds"
    )
