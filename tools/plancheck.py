"""Physical-plan auditor for every graded query.

Explains each registry query and greps the plan for the red flags the
100 TB design bans (SURVEY.md §4.4), then writes PLANS.md — a
reviewable inventory of join strategies, Python usage, and scan
pushdown per query.

Red flags (fail the audit):
  * CartesianProduct / BroadcastNestedLoopJoin without a declared
    waiver — unbounded pair blow-up;
  * BatchEvalPython — row-at-a-time Python in the plan (Arrow paths
    show ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas and are
    allowed);
  * a parquet scan with no ReadSchema pruning at all;
  * (VERDICT r2 #2) a windowspecdefinition with NO partition columns,
    or partitioned ONLY by known tiny-cardinality keys (epoch ~3,
    event_type ~5, …) — the single-task-sort-in-disguise class that
    let l17/m3/e3 sail through round 2 — unless the query holds a
    waiver documenting why the window's input is bounded (running
    offsets over a <=few-hundred-row bucket aggregate, distinct-value
    frames, calendar days).

Usage: python tools/plancheck.py [sf_dir]   (default sf0.001; writes
PLANS.md at the repo root, exits 1 on any red flag)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meepo_spark.registry import QUERIES, load_all
from meepo_spark.session import get_spark

# Pair-generating queries whose non-equi joins are bounded by
# construction (documented in their docstrings): small probe side or
# blocked input — a BroadcastNestedLoopJoin there is a choice, not an
# accident.
NESTED_LOOP_WAIVED = {
    "j5_theta_pairs",
    "l2c_ngram_jaccard_block",
    "l3_cosine_topk",
    "l3c_embedding_near_dup",
    "l3h_mips_topk",  # 10-query broadcast probe side, same shape as l3
    # scalar broadcasts: the build side is a 1-row (l4i corpus-total)
    # or 5-row (l3f query-vector) aggregate — the nested loop IS the
    # broadcast-scalar join, bounded by construction
    "l3f_quantized_topk",
    "l4i_sample_plan",
    "l4k_heavy_hitters",  # 1-row corpus-total crossJoin(broadcast)
    "m1_basket_pairs",  # 1-row order-count crossJoin(broadcast)
    "m5_association_rules",  # 1-row basket-count crossJoin(broadcast)
    "l4m_bigram_lm",  # 1-row vocab-size crossJoin(broadcast)
    # calendar-spine cross join: |days| rows exploded from a 1-row
    # bounds aggregate, broadcast against the user dimension
    "t8_gap_fill",
    # VERDICT r1 "what's wrong" #1 fix: the global scalar folded back
    # via crossJoin(broadcast(1-row agg)) IS a BroadcastNestedLoopJoin
    # node — bounded by construction (build side is exactly one row)
    "q11_important_stock",
    "q22_dormant_customers",
    # round-2 scalar/probe broadcasts, bounded by construction:
    "l4n_bm25_search",  # 1-row corpus-stats crossJoin inside the cached index build
    "l68d_bm25_multiquery_topk",  # same 1-row stats crossJoin (shared bm25 index build)
    "l51_packing_census",  # 1-row truncation-census crossJoin(broadcast)
    "o5_keyset_pagination",  # 1-row page-anchor crossJoin(broadcast)
    "v12_poisson_bootstrap",  # 1-row point-estimate crossJoin(broadcast)
    "l3i_pq_topk",  # 10-query broadcast probe side, same shape as l3
    "l13_dedup_threshold_curve",  # 5-row threshold-grid crossJoin(broadcast)
    "l14_hybrid_retrieval",  # 1-row corpus-stats + 1-row query-vector broadcasts
    "l14b_hybrid_fused_retrieval",  # 1-row query-norm + nprobe-row probe broadcasts
    "l16_perplexity_filter",  # 1-row LM-total crossJoin(broadcast)
    "l17_epoch_shuffle",  # 3-row epoch-grid crossJoin(broadcast)
    "l18_dedup_signal_agreement",  # 200-id blocked pair generator, same shape as l2c
    "o7_global_enumeration",  # 1-row key-range (min/max) crossJoin(broadcast)
    "l3j_kmeans_assign",  # 8-row seed-centroid crossJoin(broadcast), k bounded
    "l3k_ivf_seeded_topk",  # 16-row centroid crossJoin(broadcast), k bounded
    # round-3 bucketed-enumeration rewrites: 1-row (lo, hi, N) range
    # aggregates crossJoin(broadcast) into the bucket assignment
    "m3_rfm_segments",
    # round-7 continuation scalar broadcasts, bounded by construction:
    "m7_frequent_triples",  # 1-row user-count crossJoin(broadcast), twice
    "e20_quantile_treatment_effect",  # 1-row arm-quantile crossJoin(broadcast)
    "v25_cuped_adjustment",  # 1-row global-moments crossJoin(broadcast)
    "q15_top_supplier",  # 1-row max-revenue crossJoin(broadcast)
    # round-8 scalar broadcasts, bounded by construction:
    "v26_bh_fdr",  # 1-row m-count + 1-row k* rank crossJoin(broadcast)
    "l63_jl_projection",  # 100-vector probe-block pair generator (l3c shape)
    "g30_kcore",  # 1-row max-edge-weight crossJoin(broadcast)
    "l65_kneser_ney_lm",  # 1-row distinct-bigram-total crossJoin(broadcast)
    "l67_sparse_cosine_topk",  # 1-row corpus-size crossJoin(broadcast)
    "l68_sparse_retrieval_topk",  # 1-row corpus-size crossJoin(broadcast)
    "l68b_df_cut_census",  # 1-row corpus-size crossJoin(broadcast)
    "l68c_pruned_postings_topk",  # 1-row corpus-size crossJoin(broadcast)
    "v27_welch_ttest",  # 1-row-x-1-row arm-moment crossJoin(broadcast)
    "v28_cuped_adjustment",  # 1-row pooled-theta crossJoin(broadcast)
    "l69_source_kl_drift",  # |sources|-row totals x vocab dense grid +
    # 1-row vocab-size broadcast (bounded: sources are a fixed handful)
    "dq7_benford_conformance_contrast",  # 2-row series-total broadcast join
    "v11_equidepth_histogram",  # per-flag (lo, hi, N) broadcast (5 rows)
    # round-3 additions, bounded-by-construction broadcasts:
    "l22_mixture_sampling",  # 5-row rate table + 1-row totals
    "j12_bloom_prune_join",  # ONE 8 KB bitmap row crossJoin(broadcast)
    "l3l_pq_seeded_topk",  # 1-row seed-codebook + 10-row LUT broadcasts
    "dq6_benford_deviation",  # 1-row digit-total crossJoin(broadcast)
    # r3 .count() driver-sync removals -> 1-row count crossJoin(broadcast):
    "l3g_kmeans_clusters",
    "l4f_tfidf_terms",
    "l23_quality_decile_budget",  # 1-row (lo,hi,N) + 1-row total broadcasts
    # round-4 additions, bounded-by-construction broadcasts:
    "v17_chi_square_independence",  # 1-row grand-total crossJoin(broadcast)
    "l27_mmr_diversified_topk",  # 1-row query-vector + 1-row cand-array broadcasts
    "l29_semantic_dedup",  # 1-row seed-centroid crossJoin(broadcast)
    "l33_dsir_importance",  # 1-row feature-total crossJoin(broadcast)
    "e14_active_user_ratios",  # 1-row calendar-span crossJoin(broadcast)
    "e13_windowed_funnel",  # two 1-row step-census crossJoin(broadcast)s
    "e15_growth_accounting",  # 1-row max-week crossJoin(broadcast)
    "l34_hard_negatives",  # 10-row query-vector broadcast, theta join
    "dq10_iqr_outlier_census",  # 1-row quartile-fence crossJoin(broadcast)
    "t21_forecast_backtest",  # 1-row cutoff-date crossJoin(broadcast)
    # round-5 additions, bounded-by-construction broadcasts:
    "l3d_ivf_topk",  # 10-query broadcast probe side for the in-query
    # exact top-5 (the statistical-oracle twin of the IVF run), same
    # shape as l3/l3h/l3i
    "l55_matryoshka_recall",  # 10-query broadcast probe side x2 (full
    # + truncated rankings), the l3/l3d shape
    "l38_temperature_mixture",  # 1-row (n, z, b) totals crossJoin(broadcast)
    "l41_lsh_band_tuning",  # 4-row (r, b) config-grid crossJoin(broadcast)
    "l43_dup_quality_interaction",  # 1-row (lo, hi, N) ntile-range broadcast
    "m6_markov_stationary",  # |S|x|S| (25-row) state grid + 1-row |S| scalar
    "dq12_freshness_census",  # 1-row global-watermark (max ts) broadcast
    "v22_chi_square_independence",  # 1-row grand-total crossJoin(broadcast)
    "l49_minhash_calibration",  # 1%-sample signature pair probe (bounded)
    "o9_zorder_locality",  # 1-row (min,max)x2 grid-bounds broadcast
    "g26_hll_intersection",  # |event_types| (5-row) type-grid broadcast
    # pairing memberships with the other types for the union sketch
    "t27_mase_forecast_eval",  # 1-row train-cutoff-date broadcast (t21 twin)
}

# Known bounded-tiny-cardinality partition keys: a window partitioned
# ONLY by these spreads over a handful of tasks no matter the input
# size — flagged unless waived (strip the #exprId suffix to compare).
TINY_PARTITION_KEYS = {"epoch", "event_type", "lang", "source", "l_returnflag", "l_linestatus"}

# Queries whose flagged windows run over PROVABLY BOUNDED inputs —
# each waiver names the bound. The o7 bucketed-enumeration family's
# running-offset windows (<= a few hundred bucket-aggregate rows) are
# the canonical members; full-input windows never belong here.
WINDOW_WAIVED = {
    # running offsets over per-bucket aggregates (o7 discipline):
    "o7_global_enumeration",   # 32 equal-width key buckets
    "m3_rfm_segments",         # 3 x 32 quartile-rank buckets
    "l17_epoch_shuffle",       # 3 epochs x 256 md5-prefix buckets
    "e3_max_concurrency",      # |types| x |hours| sweep-line buckets
    "g11_weighted_median",     # per-flag offsets over 32768-cent bands
                               # (r4: distinct cents measured fact-sized)
    "v11_equidepth_histogram", # per-flag offsets over 32 value buckets
    "v26_bh_fdr",              # BH rank over the metric grid (<= |types| x 12 rows)
    "o6_null_ordering",        # per-(flag, bucket) offsets, dual order
    "a8_replay_range",         # per-hour-bucket replay offsets
    "l8_sequence_packing",     # per-lang offsets over the 1000x-reduced
                               # doc-id bucket aggregate
    "v24_mann_whitney_u",      # offsets over 32768-cent revenue bands
                               # (range-bounded bucket aggregate)
    "l60_sorted_neighborhood", # offsets over first-char-of-key buckets
                               # (ASCII alphabet-bounded, ~30 rows)
    "l52_shuffled_packing",    # offsets over the 256-row md5-prefix
                               # bucket aggregate (bucketed_row_number
                               # feeding the bounded-block packer)
    "l21_classifier_auc",      # per-source offsets over 1024-wide
                               # score bands (bucketed_prefix_sum)
    "l23_quality_decile_budget",  # 32-row quality-bucket offsets
    "t19_cusum_changepoint",   # per-type offsets over 8-day bands
    "e18_pareto_concentration",  # per-type offsets over the distinct-
                               # volume bucket aggregate (runtime-
                               # audited: volumes are a bounded grid)
    # windows over distinct-value / calendar / fixed-grid frames:
    "o8_pareto_frontier",      # prefix-min over DISTINCT prices
    "v8_histogram",            # 20-row fixed-width bin aggregate
    "v13_ks_test",             # per-type offsets over 1024-cent bands
    "dq2_volume_anomaly",      # one row per calendar day
    # windows AFTER a LIMIT-k / tiny-graph reduction:
    "o1_global_sort_top100",   # rank over the TakeOrdered 100-row frame
    "g14_triangle_count",      # rank over the TakeOrdered 20-row frame
    "l14_hybrid_retrieval",    # ranks over the two 50-row shortlists
    "l14b_hybrid_fused_retrieval",  # ranks over the two 50-row shortlists
    # round-5:
    "a25_out_of_order_depth",  # per-topic offsets over offset-range /
                               # calendar-date bucket aggregates
                               # (bucketed_row_number x2)
    "l38_temperature_mixture", # remainder rank over the |langs|-row
                               # (5) share frame
    "l43_dup_quality_interaction",  # per-bucket offsets over the
                               # 32-bucket ntile aggregate
}

JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
PY_KINDS = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandasWithState",
    "PythonUDTF",
)


_ORDER_RE = re.compile(r" (ASC|DESC) NULLS (FIRST|LAST)$")


def _split_args(s: str) -> list[str]:
    """Split a windowspecdefinition argument list on top-level commas."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(" or ch == "[":
            depth += 1
        elif ch == ")" or ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _strip_ids(cols: list[str]) -> frozenset[str]:
    return frozenset(re.sub(r"#\d+L?", "", c).strip().lower() for c in cols)


def window_flags_with_parts(plan: str) -> list[tuple[str, frozenset]]:
    """Classify every windowspecdefinition in a plan: one entry per
    offending spec — ('UNPART-WINDOW', frozenset()) for no partition
    columns, ('TINY-KEY-WINDOW', names) when partitioned only by known
    bounded-cardinality keys. Partition columns are the leading args
    before the first ordering spec ('col ASC NULLS FIRST ...'); the
    trailing arg is the specifiedwindowframe. The partition-name set
    rides along so WindowGroupLimit exemptions can be matched to the
    window that earned them (ADVICE r3 #3)."""
    flags: list[tuple[str, frozenset]] = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        start = m.end()
        depth, i = 1, start
        while depth and i < len(plan):
            if plan[i] == "(":
                depth += 1
            elif plan[i] == ")":
                depth -= 1
            i += 1
        args = _split_args(plan[start : i - 1])
        part = []
        for a in args:
            if _ORDER_RE.search(a) or a.startswith("specifiedwindowframe("):
                break
            part.append(a)
        if not part:
            flags.append(("UNPART-WINDOW", frozenset()))
            continue
        names = _strip_ids(part)
        if names <= TINY_PARTITION_KEYS:
            flags.append(("TINY-KEY-WINDOW", names))
    return flags


def window_partition_flags(plan: str) -> list[str]:
    """Flag strings only — the single-node entry point the runtime
    waiver audit (tests/test_window_waivers.py) classifies Window
    operators with."""
    return [f for f, _ in window_flags_with_parts(plan)]


def wgl_final_partition_sets(plan: str) -> list[frozenset]:
    """Partition-name set of each Final WindowGroupLimit block in a
    formatted plan — one entry per Partial/Final pair. Format:
    ``Arguments: [partCols], [orderSpec], rankFn, k, Final``."""
    out = []
    for block in plan.split("\n\n"):
        lines = block.splitlines()
        if not lines or "WindowGroupLimit" not in lines[0]:
            continue
        for ln in lines:
            if ln.startswith("Arguments:") and ln.rstrip().endswith("Final"):
                m = re.match(r"Arguments: \[(.*?)\],", ln)
                if m is not None:
                    cols = [c for c in _split_args(m.group(1)) if c.strip()]
                    out.append(_strip_ids(cols))
    return out


BCAST_MARKER = re.compile(r"#\s*bcast:\s*(\w+)")


def _code_only_lines(path) -> dict[int, str]:
    """Per-line CODE text with comments and string literals stripped
    via the real tokenizer (ADVICE r6 #4: the previous
    ``line.split('#')[0]`` truncated at a '#' inside a string literal,
    and ``F.broadcast(`` occurrences inside strings/docstrings still
    matched — the scanner is the single source of truth for both the
    enforcement test and the PLANS.md tally, so it must not miscount).
    Tokens are concatenated per starting line; COMMENT/STRING are
    dropped. On Py3.11 an f-string is one STRING token, so a call
    interpolated into an f-string is invisible to the scan (none
    exist in-tree; on Py3.12+ the brace code tokenizes as ordinary
    tokens and would be kept). Falls back to raw lines only if the
    file fails to tokenize (syntax error)."""
    import io
    import tokenize

    skip = {
        tokenize.COMMENT,
        tokenize.STRING,
        tokenize.NL,
        tokenize.NEWLINE,
        tokenize.INDENT,
        tokenize.DEDENT,
        tokenize.ENCODING,
        tokenize.ENDMARKER,
    }
    for name in ("FSTRING_START", "FSTRING_MIDDLE", "FSTRING_END"):
        tok = getattr(tokenize, name, None)
        if tok is not None:
            skip.add(tok)
    out: dict[int, str] = {}
    raw = path.read_text()
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(raw).readline))
    except (tokenize.TokenError, SyntaxError, IndentationError):
        return {i + 1: ln for i, ln in enumerate(raw.splitlines())}
    for t in toks:
        if t.type in skip:
            continue
        ln = t.start[0]
        out[ln] = out.get(ln, "") + t.string
    return out


def broadcast_sites(src_root=None):
    """THE one scanner for static ``F.broadcast(`` sites and
    ``maybe_broadcast(`` call sites (code-review r6 #5: plancheck and
    tests/test_broadcast_audit.py previously each re-implemented this
    with divergent marker placement rules — a marker on the preceding
    line passed the test but tallied UNCLASSIFIED here). Markers count
    on the same line OR the line above; broadcast_gate.py (the gate
    itself) is skipped. Returns (static_sites, gated_sites) where
    static_sites = [(path, lineno, cls_or_None, line)] and
    gated_sites = [(path, lineno)]."""
    import pathlib

    root = pathlib.Path(src_root or (
        pathlib.Path(__file__).resolve().parent.parent / "meepo_spark"
    ))
    static, gated = [], []
    for p in sorted(root.rglob("*.py")):
        if p.name == "broadcast_gate.py":
            continue
        lines = p.read_text().splitlines()
        code_lines = _code_only_lines(p)
        for i, line in enumerate(lines):
            code = code_lines.get(i + 1, "")
            if "F.broadcast(" in code:
                m = BCAST_MARKER.search(line) or (
                    BCAST_MARKER.search(lines[i - 1]) if i else None
                )
                static.append((p, i + 1, m.group(1) if m else None, line))
            if "maybe_broadcast(" in code and "import" not in code:
                gated.append((p, i + 1))
    return static, gated


def broadcast_audit_section() -> list[str]:
    """Tally the source-level broadcast-hint audit (VERDICT r5 #1) into
    PLANS.md: every static ``F.broadcast(`` site carries a ``# bcast:``
    classification marker (fixed | bucket | dim — enforced by
    tests/test_broadcast_audit.py), and every DATA-GROWING build side
    routes through ``operators/broadcast_gate.maybe_broadcast`` (probe-
    gated: broadcasts under the row bound, falls back to a shuffled
    join past it). This section is regenerated from source on every
    plancheck run via the SAME scanner the enforcement test uses
    (broadcast_sites), so the two can't diverge on marker placement."""
    import pathlib

    src = pathlib.Path(__file__).resolve().parent.parent / "meepo_spark"
    static, gated_sites = broadcast_sites(src)
    counts: dict[str, int] = {}
    for _p, _i, cls, _line in static:
        counts[cls or "UNCLASSIFIED"] = counts.get(cls or "UNCLASSIFIED", 0) + 1
    gated = [
        f"`{p.relative_to(src.parent)}:{i}`" for p, i in gated_sites
    ]
    out = [
        "",
        "## Broadcast-hint audit (VERDICT r5 #1)",
        "",
        "Static `F.broadcast` hints by build-side class (markers",
        "enforced by tests/test_broadcast_audit.py): "
        + ", ".join(f"{k}={v}" for k, v in sorted(counts.items())),
        "",
        "- **fixed** — constant cardinality by construction (nation/",
        "  region, 1-row stats, literal grids, k seeds/centroids,",
        "  limit-capped frames, bounded enumerations).",
        "- **bucket** — ≤ MAX_BUCKETS by the operators/enumeration",
        "  contract, executor-guarded.",
        "",
        "The former **dim** class (TPC-H customer/supplier/part",
        "scans — SF-linear) was RETIRED in round 7: all 35 sites now",
        "route through maybe_broadcast, so a 100 TB deployment gets",
        "the shuffle fallback measured, not promised (the gate's memo",
        "hit is plan-bit-identical to the old static hint, so test-SF",
        "plans and steady-state cost are unchanged).",
        "",
        f"SF-linear and data-growing build sides (size-gated via "
        f"maybe_broadcast, {len(gated)}",
        "call sites — TPC-H dims, LM count tables, per-doc/per-user",
        "lookups, FK parent key sets, commit histories):",
        "",
    ]
    out.extend(f"- {g}" for g in gated)
    return out


def audit(sf_dir: str) -> int:
    load_all()
    spark = get_spark("plancheck", shuffle_partitions=8)
    rows, failures = [], []
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        joins = sorted({k for k in JOIN_KINDS if k in plan})
        pys = sorted({k for k in PY_KINDS if k in plan})
        pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_WAIVED:
            flags.append("NESTED-LOOP")
        if "BatchEvalPython" in plan:
            flags.append("ROW-PYTHON")
        # Catalyst two-levels each rank-limited window with a
        # Partial+Final WindowGroupLimit pair (map-side top-k per key
        # — that sort never sees the full input). ADVICE r3 #3: each
        # pair exempts AT MOST one flagged window whose partition
        # columns MATCH the WGL's own partition spec — an unrelated
        # tiny-key window in the same plan can no longer ride on a
        # high-cardinality window's WGL, and rank-limited
        # unpartitioned windows (which also get WGL) are exempted via
        # the empty-set match.
        wflagged = window_flags_with_parts(plan)
        for part_set in wgl_final_partition_sets(plan):
            for i, (_fl, names) in enumerate(wflagged):
                if names == part_set:
                    del wflagged[i]
                    break
        wflags = [f for f, _ in wflagged]
        if wflags and name not in WINDOW_WAIVED:
            flags.extend(sorted(set(wflags)))
        if flags:
            failures.append((name, flags))
        rows.append(
            (name, ", ".join(joins) or "—", ", ".join(pys) or "—", pushed,
             " ".join(flags) or "ok")
        )

    out = [
        "# PLANS — physical-plan audit of every graded query",
        "",
        f"Generated by `tools/plancheck.py` at `{sf_dir}`. 'pushed' counts",
        "scans with non-empty PushedFilters; Python column shows only",
        "Arrow-vectorized entry points (row-at-a-time BatchEvalPython is",
        "a failure). Waived nested-loop queries are bounded-by-construction",
        "pair generators (see NESTED_LOOP_WAIVED in the tool). Since r3",
        "the audit also fails UNPART-WINDOW / TINY-KEY-WINDOW — a",
        "windowspecdefinition with no partition columns, or partitioned",
        "only by known tiny-cardinality keys — unless Catalyst inserted a",
        "WindowGroupLimit (map-side partial top-k) or the query holds a",
        "WINDOW_WAIVED entry documenting the bounded input (running",
        "offsets over bucket aggregates, distinct-value grids, calendar",
        "days, post-LIMIT frames).",
        "",
        "| query | join strategies | python (Arrow) | pushed | audit |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]} |")
    out.extend(broadcast_audit_section())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"PLANS.md written: {len(rows)} queries, {len(failures)} failures")
    for name, flags in failures:
        print(f"FAIL {name}: {' '.join(flags)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
