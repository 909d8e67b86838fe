"""Hypothesis property tests (SURVEY.md §5.2.5) — randomized checks of
the algebraic claims individual example-based tests can't sweep:
EWMA's exponent-cancelling closed form, MinHash's unbiased Jaccard
estimate, and salted-join result transparency under arbitrary skew.

Each example spins Spark jobs, so example counts are deliberately
small; the deterministic fixture tests remain the regression net and
these sweep the input space around them."""

from __future__ import annotations

import math

import pandas as pd
import pytest
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import SF_DIR

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    xs=st.lists(
        st.floats(min_value=0.01, max_value=1000.0, allow_nan=False),
        min_size=1,
        max_size=30,
    )
)
def test_ewma_closed_form_matches_pandas_recursion(spark, xs):
    """t10_ewma's algebra: Σ x·q^(-rn) / Σ q^(-rn) over a trailing
    frame equals the textbook adjust=True EWMA recursion (pandas
    ewm). Series capped at 30 so the frame never truncates — the
    regime where the closed form claims exactness."""
    alpha = 0.3
    rows = [(i + 1, float(round(x, 2))) for i, x in enumerate(xs)]
    df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), "rn int, x double")
    from pyspark.sql import Window as W

    w = W.orderBy("rn").rowsBetween(-29, W.currentRow)
    p = F.pow(F.lit(1 - alpha), -F.col("rn"))
    got = (
        df.select("rn", (F.sum(F.col("x") * p).over(w) / F.sum(p).over(w)).alias("e"))
        .orderBy("rn")
        .toPandas()["e"]
    )
    want = pd.Series([r[1] for r in rows]).ewm(alpha=alpha, adjust=True).mean()
    assert all(
        math.isclose(g, e, rel_tol=1e-9) for g, e in zip(got, want)
    ), f"closed form diverged: {list(got)[:3]} vs {list(want)[:3]}"


@settings(**SETTINGS)
@given(
    base=st.sets(st.integers(min_value=0, max_value=5000), min_size=20, max_size=60),
    drop=st.floats(min_value=0.0, max_value=0.8),
)
def test_minhash_estimate_tracks_true_jaccard(spark, base, drop):
    """MinHash unbiasedness on generated set pairs: build B from A by
    dropping a random fraction, compare the signature-collision rate
    against the true Jaccard. With 128 hashes, σ = √(J(1−J)/128) ≤
    0.045 — assert within 4σ (false-failure odds ~1e-4 per example)."""
    from meepo_spark.operators.dedup import minhash_signatures

    a = sorted(base)
    keep = max(1, int(len(a) * (1 - drop)))
    b = a[:keep]
    true_j = len(set(a) & set(b)) / len(set(a) | set(b))
    sh = spark.createDataFrame(
        [(0, h) for h in a] + [(1, h) for h in b], "id long, shingle long"
    )
    rows = {r["id"]: r for r in minhash_signatures(sh, num_hashes=128).collect()}
    est = (
        sum(rows[0][f"h{i}"] == rows[1][f"h{i}"] for i in range(128)) / 128
    )
    assert abs(est - true_j) <= 4 * math.sqrt(true_j * (1 - true_j) / 128) + 1e-9


@settings(**SETTINGS)
@given(
    mult=st.lists(st.integers(min_value=0, max_value=40), min_size=3, max_size=6),
    salt=st.integers(min_value=2, max_value=8),
)
def test_salted_join_transparent_under_any_skew(spark, mult, salt):
    """salted_join == plain join for arbitrary key multiplicity
    vectors (including absent keys and one-key-takes-all skew) and
    any salt factor — result transparency is what makes salting a
    deployable mitigation rather than a rewrite."""
    from meepo_spark.operators.joins import salted_join

    left_rows = [(k, i) for k, m in enumerate(mult) for i in range(m)]
    right_rows = [(k, k * 10.0) for k in range(len(mult)) if k % 2 == 0]
    if not left_rows:
        left_rows = [(0, 0)]
    left = spark.createDataFrame(left_rows, "k int, lid int")
    right = spark.createDataFrame(right_rows, "k int, val double")
    got = sorted(
        map(tuple, salted_join(left, right, on="k", salt=salt).select("k", "lid", "val").collect())
    )
    want = sorted(map(tuple, left.join(right, "k").select("k", "lid", "val").collect()))
    assert got == want


def test_results_invariant_to_shuffle_partition_count(spark):
    """Distributed determinism: canonical results must not depend on
    the shuffle partition count — the knob that changes most between
    a laptop and a 1000-executor cluster. Exercised on queries with
    float aggregates, windows, weighted sampling, and broadcast-LM
    scoring (the shapes where partition-dependent accumulation order
    could leak into output if the conventions slipped)."""
    from meepo_spark.registry import QUERIES, load_all

    load_all()
    names = ["q1_pricing_summary", "t10_ewma", "v9_weighted_sample", "l4m_bigram_lm"]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results[n] = {
                q: sorted(map(tuple, QUERIES[q](spark, SF_DIR).collect()))
                for q in names
            }
        for q in names:
            assert results["3"][q] == results["17"][q], q
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_count_min_sketch_overestimates_every_token():
    """g9's structural guarantee, checked for EVERY token (the graded
    query probes only the top 5): a count-min estimate can never
    undercount, and the overcount of any token is bounded by the
    occupancy of its buckets. Pure-Python replica of the same
    md5-slice hashing — no Spark needed to verify the invariant."""
    import hashlib
    import os
    from collections import Counter

    import duckdb

    from conftest import SF_DIR_MID

    docs = os.path.join(SF_DIR_MID, "documents.parquet")
    tokens = [
        t
        for (row,) in duckdb.sql(
            f"SELECT lower(text) FROM read_parquet('{docs}')"
        ).fetchall()
        for t in row.split(" ")
    ]
    true_n = Counter(tokens)
    depth, width = 3, 16
    sketch = [[0] * width for _ in range(depth)]

    def buckets(tok):
        h = hashlib.md5(tok.encode()).hexdigest()
        return [int(h[3 * i : 3 * i + 3], 16) % width for i in range(depth)]

    for tok, n in true_n.items():
        for i, b in enumerate(buckets(tok)):
            sketch[i][b] += n
    for tok, n in true_n.items():
        est = min(sketch[i][b] for i, b in enumerate(buckets(tok)))
        assert est >= n, (tok, est, n)
        # overcount bounded by colliding mass (trivially ≤ total - n)
        assert est - n <= sum(true_n.values()) - n


def test_pagerank_is_a_probability_distribution(spark):
    """g10 invariants: ranks form a probability distribution (sum ≈ 1
    — damped PageRank with dangling-mass redistribution conserves
    mass up to per-iteration rounding), every node holds at least the
    teleport floor (1-d)/N, and pr_pos is a permutation of 1..N."""
    from meepo_spark.registry import QUERIES, load_all

    load_all()
    from conftest import SF_DIR

    rows = QUERIES["g10_pagerank_trade"](spark, SF_DIR).collect()
    assert len(rows) == 25
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-4, total
    floor = (1 - 0.85) / 25
    assert all(r["pagerank"] >= floor - 1e-9 for r in rows)
    assert sorted(r["pr_pos"] for r in rows) == list(range(1, 26))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=1, max_value=300),
    n_tiles=st.sampled_from([2, 4, 10]),
    dup_every=st.integers(min_value=1, max_value=7),
)
def test_bucketed_enumeration_equals_window_functions(spark, n, n_tiles, dup_every):
    """operators/enumeration must be RESULT-IDENTICAL to the window
    functions it replaces (bucketed_row_number == ROW_NUMBER,
    bucketed_ntile == NTILE) for any size, tile count, and tie
    density — the property every r3 rewrite (o6/m3/v11/a8) rests on."""
    from pyspark.sql import Window as W

    from meepo_spark.operators.enumeration import (
        bucketed_ntile,
        bucketed_row_number,
    )

    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % dup_every).alias("k"),  # deliberate key ties
        (F.col("id") % 3).alias("g"),
    )
    order = [F.col("k").asc(), F.col("id").asc()]

    # global + grouped row_number
    got = {
        r["id"]: r["rn"]
        for r in bucketed_row_number(
            df, F.col("k"), order, out="rn"
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(W.orderBy(*order))).collect()
    }
    assert got == want

    gotg = {
        r["id"]: r["rn"]
        for r in bucketed_row_number(
            df, F.col("k"), order, ("g",), out="rn"
        ).collect()
    }
    wantg = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(W.partitionBy("g").orderBy(*order))
        ).collect()
    }
    assert gotg == wantg

    # global + grouped NTILE
    gott = {
        r["id"]: r["t"]
        for r in bucketed_ntile(df, F.col("k"), order, n_tiles, out="t").collect()
    }
    wantt = {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(n_tiles).over(W.orderBy(*order))
        ).collect()
    }
    assert gott == wantt

    gottg = {
        r["id"]: r["t"]
        for r in bucketed_ntile(
            df, F.col("k"), order, n_tiles, ("g",), out="t"
        ).collect()
    }
    wanttg = {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(n_tiles).over(W.partitionBy("g").orderBy(*order))
        ).collect()
    }
    assert gottg == wanttg


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_hot=st.integers(min_value=1, max_value=400),
    n_probe=st.integers(min_value=1, max_value=600),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_bloom_filter_never_false_negative(spark, n_hot, n_probe, seed):
    """operators/bloom: the safety contract of a runtime filter — a
    key that was built into the bloom must ALWAYS pass the probe (a
    false negative silently drops join rows; false positives are
    merely wasted work for the exact join that follows). Checked for
    arbitrary hot sets and an FP-rate sanity bound at the default
    (65536 bits, k=3) sizing."""
    from meepo_spark.operators.bloom import bloom_build, bloom_prune

    hot = spark.range(seed, seed + n_hot).select(F.col("id").alias("k"))
    bloom = bloom_build(hot, "k")
    # every hot key must survive its own filter
    survivors = bloom_prune(hot, "k", bloom).count()
    assert survivors == n_hot, "false negative: built key failed the probe"
    # disjoint probe keys: FP rate must stay far under 50% at default
    # sizing (expected ~ (3*n_hot/65536)^3, i.e. << 1%)
    cold = spark.range(seed + 500_000, seed + 500_000 + n_probe).select(
        F.col("id").alias("k")
    )
    fp = bloom_prune(cold, "k", bloom).count()
    assert fp <= max(1, n_probe // 2), f"implausible FP count {fp}/{n_probe}"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=1, max_value=300),
    dup_every=st.integers(min_value=1, max_value=7),
    bucket_width=st.sampled_from([1, 3, 16]),
    frame_end=st.sampled_from([0, -1]),
)
def test_bucketed_prefix_sum_equals_window_sum(
    spark, n, dup_every, bucket_width, frame_end
):
    """operators/enumeration.bucketed_prefix_sum must be RESULT-
    IDENTICAL to SUM() OVER (PARTITION BY g ORDER BY ... ROWS
    UNBOUNDED PRECEDING .. frame_end) for any size, tie density,
    bucket width, and both frame ends (CURRENT ROW and 1 PRECEDING) —
    the property the r4 g11/v13/l21/t19 rewrites rest on. Also checks
    the totals join against SUM() OVER (PARTITION BY g)."""
    from pyspark.sql import Window as W

    from meepo_spark.operators.enumeration import bucketed_prefix_sum

    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % dup_every).alias("k"),  # deliberate key ties
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 5 + 1).alias("v"),
    )
    order = [F.col("k").asc(), F.col("id").asc()]
    got = {
        r["id"]: (r["cum"], r["cum_tot"])
        for r in bucketed_prefix_sum(
            df,
            F.floor(F.col("k") / bucket_width),
            order,
            {"cum": "v"},
            ("g",),
            frame_end=frame_end,
            totals=True,
        ).collect()
    }
    w = (
        W.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, frame_end)
    )
    want = {
        r["id"]: (r["cum"], r["cum_tot"])
        for r in df.select(
            "id",
            F.coalesce(F.sum("v").over(w), F.lit(0)).alias("cum"),
            F.sum("v").over(W.partitionBy("g")).alias("cum_tot"),
        ).collect()
    }
    assert got == want


def test_bucketed_enumeration_guard_raises_on_bucket_blowup(spark, monkeypatch):
    """ADVICE r4: the MAX_BUCKETS contract must fail DIAGNOSABLY, not
    as a driver OOM at the broadcast — an adversarial bucket expression
    (the raw key, distinct-per-row) must raise the woven-in
    executor-side assert in both bucketed helpers, while a conforming
    width still passes untouched."""
    import meepo_spark.operators.enumeration as en

    monkeypatch.setattr(en, "MAX_BUCKETS", 16)
    df = spark.range(100).select(F.col("id"), F.lit(1).alias("v"))
    order = [F.col("id").asc()]
    with pytest.raises(Exception, match="buckets"):
        en.bucketed_prefix_sum(df, F.col("id"), order, {"cum": "v"}).collect()
    with pytest.raises(Exception, match="buckets"):
        en.bucketed_row_number(df, F.col("id"), order).collect()
    ok = en.bucketed_prefix_sum(
        df, F.floor(F.col("id") / 10), order, {"cum": "v"}
    )
    assert ok.count() == 100
    ok2 = en.bucketed_row_number(df, F.floor(F.col("id") / 10), order)
    assert ok2.count() == 100


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_morton_interleave_matches_reference(spark, vals):
    """operators/zorder.interleave_bits is the published Morton
    formula: the unrolled JVM shift/mask expression must equal the
    pure-Python bit-interleave on arbitrary 16-bit pairs (and be
    monotone-per-quadrant by construction of that identity)."""
    from meepo_spark.operators.zorder import interleave_bits, morton_reference

    df = spark.createDataFrame(vals, "x int, y int")
    got = [
        r["z"]
        for r in df.select(
            interleave_bits([F.col("x"), F.col("y")], bits=16).alias("z")
        ).collect()
    ]
    want = [morton_reference([x, y], bits=16) for x, y in vals]
    assert got == want


def test_morton_interleave_rejects_sign_bit_overflow(spark):
    """4 cols x 16 bits = 64 positions would shiftleft into the JVM
    long's sign bit, silently producing negative keys that break the
    curve order — the operator must refuse instead."""
    from meepo_spark.operators.zorder import interleave_bits

    with pytest.raises(ValueError, match="63 bits"):
        interleave_bits([F.lit(1)] * 4, bits=16)
    # 3 x 16 = 48 and 2 x 16 = 32 stay in range
    assert interleave_bits([F.lit(1)] * 3, bits=16) is not None


@settings(**SETTINGS)
@given(
    vals=st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=2, max_size=60),
    dup=st.integers(min_value=1, max_value=4),
)
def test_histogram_cdf_quantile_matches_percentile(spark, vals, dup):
    """operators/quantiles.py (the r10 generalization of dq10's
    histogram + bucketed_prefix_sum CDF + rank interpolation, VERDICT
    r9 #1). Property: on ANY integer multiset (duplicates included —
    `dup` replicates the list so CDF intervals wider than 1 are
    exercised), `exact_quantiles_cdf` reproduces F.percentile's q1/q3
    exactly, per key group and with nulls skipped (both implement
    quantile_cont: pos = (n-1)p, linear interpolation between the
    straddling order statistics)."""
    from meepo_spark.operators.quantiles import exact_quantiles_cdf

    data = vals * dup
    # two key groups + a NULL row per group: the per-group CDFs must
    # not bleed into each other, and nulls must be skipped like
    # F.percentile does
    rows = [("a", int(v)) for v in data] + [("b", int(v) * 3 - 7) for v in data]
    rows += [("a", None), ("b", None)]
    df = spark.createDataFrame(rows, "k string, v long")
    ref = {
        r["k"]: r["q"]
        for r in df.groupBy("k")
        .agg(F.percentile("v", F.array(F.lit(0.25), F.lit(0.75))).alias("q"))
        .collect()
    }
    got = {
        r["k"]: (r["q1"], r["q3"], r["n"])
        for r in exact_quantiles_cdf(
            df, ["k"], "v", {"q1": 0.25, "q3": 0.75}
        ).collect()
    }
    # the weighted path: the SAME call over the value-grain histogram
    # (groupBy(v).count() as repeat weights) must be indistinguishable
    # from the expanded multiset — the contract that lets a caller
    # scan the fact once and run several passes over the histogram
    hist = df.filter(F.col("v").isNotNull()).groupBy("k", "v").count()
    got_w = {
        r["k"]: (r["q1"], r["q3"], r["n"])
        for r in exact_quantiles_cdf(
            hist, ["k"], "v", {"q1": 0.25, "q3": 0.75}, weight="count"
        ).collect()
    }
    for k in ("a", "b"):
        assert got[k][2] == len(data), (k, got[k])
        assert got[k][0] == pytest.approx(ref[k][0], abs=1e-9), (k, data, ref)
        assert got[k][1] == pytest.approx(ref[k][1], abs=1e-9), (k, data, ref)
        assert got_w[k] == got[k], (k, got_w[k], got[k])


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(st.integers(min_value=-2_000, max_value=2_000), min_size=3, max_size=50),
    width=st.sampled_from([8.0, 1024.0]),
)
def test_multi_measure_quantiles_match_single_calls(spark, vals, width):
    """`exact_quantiles_cdf_multi` (optimization r11 — v4's one-pass
    two-measure form) must equal per-measure `exact_quantiles_cdf`
    calls on the weight-filtered multisets, including measures that
    are EMPTY in a group (no output row) and 0-weight values
    interleaved with hot buckets."""
    from meepo_spark.operators.quantiles import (
        exact_quantiles_cdf,
        exact_quantiles_cdf_multi,
    )

    rows = [("a", int(v)) for v in vals] + [("b", int(v) * 2 + 1) for v in vals]
    df = spark.createDataFrame(rows, "k string, v long")
    measures = {
        "all": F.lit(1),
        "pos": (F.col("v") > 0).cast("int"),
    }
    got = {
        (r["k"], r["m"]): (r["n"], r["q25"], r["q75"])
        for r in exact_quantiles_cdf_multi(
            df, ["k"], "v", measures, {"q25": 0.25, "q75": 0.75}, bucket_width=width
        ).collect()
    }
    for m, pred in (("all", None), ("pos", F.col("v") > 0)):
        sub = df if pred is None else df.filter(pred)
        want = {
            (r["k"], m): (r["n"], r["q25"], r["q75"])
            for r in exact_quantiles_cdf(
                sub, ["k"], "v", {"q25": 0.25, "q75": 0.75}, bucket_width=width
            ).collect()
        }
        for key, val in want.items():
            assert got.get(key) == val, (key, val, got.get(key))
        # and no phantom rows for empty measures
        for key in [k for k in got if k[1] == m]:
            assert key in want, key


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=2, max_size=60),
    dup=st.integers(min_value=1, max_value=5),
    width=st.sampled_from([8.0, 1024.0]),
)
def test_histogram_disc_quantile_matches_percentile_disc(spark, vals, dup, width):
    """operators/quantiles.py `exact_quantiles_disc` (optimization
    r11, VERDICT r10 #3): the census+refine shape must reproduce
    Spark's `percentile_disc` (the DuckDB quantile_disc lower-bound
    convention) exactly on ANY integer multiset — including sizes
    where q·n is an exact integer (dup sweeps n across multiples of
    2 and 5, the 0.5/0.9 boundary cases) and mixed NULLs (skipped by
    both paths)."""
    from meepo_spark.operators.quantiles import exact_quantiles_disc

    data = vals * dup
    rows = [("a", int(v)) for v in data] + [("b", int(v) * 3 - 7) for v in data]
    rows += [("a", None), ("b", None)]
    df = spark.createDataFrame(rows, "k string, v long")
    ref = {
        r["k"]: (float(r["p5"]), float(r["p9"]))
        for r in df.groupBy("k")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").alias("p5"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)").alias("p9"),
        )
        .collect()
    }
    got = {
        r["k"]: (r["p5"], r["p9"], r["n"])
        for r in exact_quantiles_disc(
            df, ["k"], "v", {"p5": 0.5, "p9": 0.9}, bucket_width=width
        ).collect()
    }
    for k in ("a", "b"):
        assert got[k][2] == len(data), (k, got[k])
        assert (got[k][0], got[k][1]) == ref[k], (k, data, ref[k], got[k])


def _quantile_cont(sorted_vals, q):
    """Pure-python quantile_cont (the F.percentile / DuckDB law):
    pos = (n-1)q, linear interpolation between the straddling order
    statistics — the independent reference for the operator tests."""
    import math as _math

    n = len(sorted_vals)
    pos = (n - 1) * q
    lo, hi = _math.floor(pos), _math.ceil(pos)
    frac = pos - lo
    return sorted_vals[lo] + frac * (sorted_vals[hi] - sorted_vals[lo])


@settings(**SETTINGS)
@given(
    vals=st.lists(st.integers(min_value=-500, max_value=500), min_size=1, max_size=80),
    dup=st.integers(min_value=1, max_value=3),
    width=st.sampled_from([4.0, 16.0, 1024.0]),
)
def test_exact_median_mad_matches_reference(spark, vals, dup, width):
    """operators/quantiles.py `exact_median_mad` — the 2-round
    median+MAD whose deviation rank-crossing band is located from the
    FIRST census by interval arithmetic (the median is only known to
    within one bucket at that point). Property: on ANY integer
    multiset, any duplication factor, and widths small enough that
    the band spans many buckets (4/16) as well as the production
    width, m and mad match the pure-python quantile_cont reference
    exactly, per group, nulls skipped. Exercises the candidate-set
    superset proof and the wholesale/value-grain split."""
    from meepo_spark.operators.quantiles import exact_median_mad

    data = vals * dup
    rows = [("a", int(v)) for v in data] + [("b", int(v) * 3 - 7) for v in data]
    rows += [("a", None), ("b", None)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        r["k"]: (r["n"], r["m"], r["mad"])
        for r in exact_median_mad(df, ["k"], "v", bucket_width=width).collect()
    }
    for k, mult, off in (("a", 1, 0), ("b", 3, -7)):
        grp = sorted(v * mult + off for v in data)
        m = _quantile_cont(grp, 0.5)
        mad = _quantile_cont(sorted(abs(v - m) for v in grp), 0.5)
        assert got[k][0] == len(data), (k, got[k])
        assert got[k][1] == pytest.approx(m, abs=1e-9), (k, data, m, got[k])
        assert got[k][2] == pytest.approx(mad, abs=1e-9), (k, data, mad, got[k])
    # the weighted path (r11: g12 reads the shared value-grain
    # histogram through it) must be indistinguishable from the
    # expanded multiset
    hist = df.filter(F.col("v").isNotNull()).groupBy("k", "v").count()
    got_w = {
        r["k"]: (r["n"], r["m"], r["mad"])
        for r in exact_median_mad(
            hist, ["k"], "v", bucket_width=width, weight="count"
        ).collect()
    }
    assert got_w == got, (got_w, got)
