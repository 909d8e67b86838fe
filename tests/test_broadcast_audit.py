"""Broadcast-hint audit (VERDICT r5 #1).

Two contracts:

1. :func:`meepo_spark.operators.broadcast_gate.maybe_broadcast`
   actually gates — an under-bound side broadcasts even with the auto
   threshold disabled (the hint is real), an over-bound side falls
   back to a shuffled join (the hint is absent), and the probe verdict
   is memoized so plan-equal re-executions never re-run it.

2. Every raw ``F.broadcast(`` site in the source carries a
   ``# bcast: <class>`` classification marker (same line or the line
   above), where <class> is one of the bounded-by-construction
   classes. Data-growing sides are NOT annotatable — they must route
   through maybe_broadcast instead, so a new data-growing static hint
   cannot slip in unaudited. tools/plancheck.py tallies the markers
   into PLANS.md.
"""

from __future__ import annotations

import pathlib
import pytest
from pyspark.sql import functions as F

from meepo_spark.operators.broadcast_gate import maybe_broadcast

SRC_ROOT = pathlib.Path(__file__).parent.parent / "meepo_spark"

# The permitted classification markers for a STATIC F.broadcast hint:
#   fixed  — constant cardinality by construction: nation/region, 1-row
#            global aggregates, literal grids/configs, k seeds or
#            centroids, limit-capped top-k frames, bounded enumerations
#            (langs, event types, calendar spines)
#   bucket — <= MAX_BUCKETS rows by the operators/enumeration contract
#            (executor-guarded)
# The 'dim' class (TPC-H customer/supplier/part scans: SF-linear) was
# RETIRED in round 7 — all its sites route through maybe_broadcast
# now, and removing it from ALLOWED means a new SF-linear static hint
# cannot re-enter under the old annotation.
# Anything not bounded by construction (per-doc, per-user,
# per-token/bigram frames, SF-linear dims) MUST use maybe_broadcast.
ALLOWED = {"fixed", "bucket"}


def _explained(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def no_auto_broadcast(spark):
    """Disable Catalyst's size-based auto broadcast so the ONLY way a
    build side broadcasts is an explicit hint — isolates what the gate
    decided from what the planner would have done anyway."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    if old_aqe is not None:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
    else:
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_under_bound_side_broadcasts(no_auto_broadcast):
    spark = no_auto_broadcast
    fact = spark.range(10_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    side = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("tag"))
    gated = maybe_broadcast(side, row_bound=1_000)
    plan = _explained(fact.join(gated, "k"))
    assert "BroadcastHashJoin" in plan, plan


def test_over_bound_side_falls_back_to_shuffle(no_auto_broadcast):
    spark = no_auto_broadcast
    fact = spark.range(10_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    side = spark.range(5_000).select(F.col("id").alias("k"), F.lit(1).alias("tag"))
    gated = maybe_broadcast(side, row_bound=1_000)
    plan = _explained(fact.join(gated, "k"))
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_probe_verdict_is_memoized_per_plan(spark, monkeypatch):
    """Second gate call on a plan-equal frame must not re-run the
    probe job (the bench/selfcheck re-execution path: steady-state
    cost is a memo lookup, the emitted plan is identical to a static
    hint's)."""
    from pyspark.sql import DataFrame

    side = spark.range(77).select(F.col("id").alias("kmemo"))
    gated = maybe_broadcast(side, row_bound=100)
    assert "ResolvedHint" in gated._jdf.queryExecution().analyzed().toString()

    def boom(self):  # pragma: no cover - failing is the assertion
        raise AssertionError("probe re-ran on a memoized plan")

    monkeypatch.setattr(DataFrame, "count", boom)
    rebuilt = spark.range(77).select(F.col("id").alias("kmemo"))
    gated2 = maybe_broadcast(rebuilt, row_bound=100)
    assert "ResolvedHint" in gated2._jdf.queryExecution().analyzed().toString()


def test_row_bound_must_be_positive(spark):
    with pytest.raises(ValueError):
        maybe_broadcast(spark.range(1), row_bound=0)


def test_generation_token_forces_reprobe(spark, monkeypatch):
    """A changed ``generation`` is a new memo key → immediate re-probe
    (ADVICE r6 #2: a commit HISTORY growing within one application
    under an unchanged semanticHash must not ride a day-one verdict).
    Same generation still memo-hits."""
    side = spark.range(33).select(F.col("id").alias("kgen"))
    cls = type(side)  # the CONCRETE class — pyspark4's classic
    # DataFrame overrides base-class methods, so patching the abstract
    # pyspark.sql.DataFrame would never intercept the probe's count()
    maybe_broadcast(side, row_bound=100, generation=1)

    probes = []
    real_count = cls.count

    def counting(self):
        probes.append(1)
        return real_count(self)

    monkeypatch.setattr(cls, "count", counting)
    maybe_broadcast(side, row_bound=100, generation=1)  # memo hit
    assert probes == []
    maybe_broadcast(side, row_bound=100, generation=2)  # new epoch
    assert len(probes) == 1


def test_under_bound_verdict_expires_after_hit_budget(spark, monkeypatch):
    """Under-bound (broadcast) verdicts self-expire after
    _REPROBE_AFTER_HITS memo hits, so a generation-less caller with a
    growing frame re-validates the OOM direction on a bounded cadence.
    Over-bound verdicts never expire (stale 'too big' is free — AQE
    re-decides from real sizes)."""
    from meepo_spark.operators import broadcast_gate as bg

    monkeypatch.setattr(bg, "_REPROBE_AFTER_HITS", 3)
    cls = type(spark.range(1))  # concrete class (see test above)
    probes = []
    real_count = cls.count

    def counting(self):
        probes.append(1)
        return real_count(self)

    monkeypatch.setattr(cls, "count", counting)

    small = spark.range(7).select(F.col("id").alias("kexp"))
    maybe_broadcast(small, row_bound=100)  # probe #1 → under bound
    for _ in range(3):
        maybe_broadcast(small, row_bound=100)  # memo hits 1..3
    assert len(probes) == 1
    maybe_broadcast(small, row_bound=100)  # hit budget exhausted
    assert len(probes) == 2, "under-bound verdict did not re-probe"

    big = spark.range(500).select(F.col("id").alias("kexp2"))
    maybe_broadcast(big, row_bound=10)  # probe → over bound
    for _ in range(6):
        maybe_broadcast(big, row_bound=10)
    assert len(probes) == 3, "over-bound verdict must not expire"


def test_every_static_broadcast_site_is_classified():
    """Grep-level enforcement of the audit convention: a raw
    F.broadcast( call without a recognized classification marker fails
    here, so the audit cannot rot as queries are added. Uses the SAME
    scanner plancheck's PLANS.md tally uses (tools/plancheck.
    broadcast_sites) so test and report cannot diverge on marker
    placement rules (code-review r6 #5)."""
    import sys

    sys.path.insert(0, str(SRC_ROOT.parent))
    from tools.plancheck import broadcast_sites

    static, _gated = broadcast_sites(SRC_ROOT)
    bad = [
        f"{p.relative_to(SRC_ROOT.parent)}:{i}: {line.strip()}"
        for p, i, cls, line in static
        if cls not in ALLOWED
    ]
    assert not bad, (
        "unclassified static F.broadcast sites (annotate '# bcast: "
        "fixed|bucket' or route SF-linear/data-growing sides through "
        "maybe_broadcast):\n" + "\n".join(bad)
    )
