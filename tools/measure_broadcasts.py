"""One-off: execute every NESTED_LOOP_WAIVED query at sf0.1 and print
the max broadcast-exchange output rows feeding each of its
BroadcastNestedLoopJoins — the measured numbers the runtime audit
(tests/test_broadcast_waivers.py) pins as bounds.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meepo_spark.plan_metrics import iter_nodes, metrics
from meepo_spark.registry import QUERIES, load_all
from meepo_spark.session import get_spark
from tools.plancheck import NESTED_LOOP_WAIVED


def bnlj_broadcast_rows(df) -> list[int]:
    """Per BroadcastNestedLoopJoin: the DIRECT build side's exchange
    rows (the subtree below a BNLJ can contain other joins' broadcast
    exchanges — walking the whole subtree over-collects)."""
    from meepo_spark.plan_metrics import children, unwrap

    def build_rows(node):
        """Descend through wrapper/codegen nodes to the first exchange;
        stop at any OTHER join so a downstream hash join's broadcast is
        never charged to this BNLJ. A ReusedExchange delegates to the
        exchange it reuses — audit THAT node (skipping it would let a
        fact-sized reused broadcast pass unmeasured, the exact
        fail-open the audit exists to prevent)."""
        node = unwrap(node)
        name = node.nodeName()
        if name == "ReusedExchange":
            return build_rows(node.child())
        if "BroadcastExchange" in name:
            return [metrics(node).get("numOutputRows", 0)]
        if "Exchange" in name or "Join" in name:
            return []
        out = []
        for c in children(node):
            out += build_rows(c)
        return out

    # execute without collecting rows to the driver (same choice as
    # the window audit: metrics want execution, not materialization)
    df._jdf.queryExecution().toRdd().count()
    plan = df._jdf.queryExecution().executedPlan()
    out = []
    for node in iter_nodes(plan):
        if node.nodeName() == "BroadcastNestedLoopJoin":
            for ch in children(node):
                out += build_rows(ch)
    return out


def main(sf_dir: str) -> int:
    load_all()
    spark = get_spark()
    for name in sorted(NESTED_LOOP_WAIVED):
        if name not in QUERIES:
            continue
        try:
            r = bnlj_broadcast_rows(QUERIES[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            r = [f"ERR {e}"]
        print(json.dumps({name: r}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"))
