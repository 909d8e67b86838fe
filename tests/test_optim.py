"""operators/optim.py — full-batch GD logistic regression.

The graded l58/l59 queries pin the fixture run against the unrolled
DuckDB oracle; these tests pin the OPERATOR against an independent
NumPy replica on random data (any feature count / lr / iteration
budget, not just the graded 8-dim/5-round configuration) plus the
descent invariants SQL can't see.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def _numpy_gd(X: np.ndarray, y: np.ndarray, lr: float, iters: int):
    """Independent replica: same math, different engine (vectorized
    numpy instead of Spark aggregates)."""
    n, d = X.shape
    w = np.zeros(d + 1)
    hist = []
    for _ in range(iters):
        z = w[0] + X @ w[1:]
        p = 1.0 / (1.0 + np.exp(-z))
        hist.append(float(np.mean(np.log1p(np.exp(z)) - y * z)))
        g = np.concatenate([[np.mean(p - y)], ((p - y) @ X) / n])
        w = w - lr * g
    z = w[0] + X @ w[1:]
    loss = float(np.mean(np.log1p(np.exp(z)) - y * z))
    acc = float(np.mean((z >= 0) == (y == 1.0)))
    return w, hist, loss, acc


def _fit_random(spark, seed: int, n: int, d: int, lr: float, iters: int):
    from meepo_spark.operators.optim import logreg_fit

    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    true_w = rng.normal(size=d)
    y = (X @ true_w + rng.normal(scale=0.5, size=n) > 0).astype("float64")
    rows = [
        (float(y[i]), *[float(X[i, j]) for j in range(d)]) for i in range(n)
    ]
    cols = ["y"] + [f"c{j}" for j in range(d)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols))
    got = logreg_fit(df, [f"c{j}" for j in range(d)], "y", lr=lr, iters=iters)
    want = _numpy_gd(X, y, lr, iters)
    return got, want


@pytest.mark.parametrize(
    "seed,n,d,lr,iters",
    [(7, 400, 3, 1.0, 4), (11, 257, 6, 0.5, 6), (13, 64, 1, 2.0, 3)],
)
def test_logreg_matches_numpy_replica(spark, seed, n, d, lr, iters):
    (w, hist, metrics), (nw, nhist, nloss, nacc) = _fit_random(
        spark, seed, n, d, lr, iters
    )
    # float64 end to end on both engines; only summation order differs
    assert np.allclose(w, nw, rtol=0, atol=1e-10)
    assert np.allclose(hist, nhist, rtol=0, atol=1e-10)
    assert abs(metrics["loss"] - nloss) < 1e-10
    assert metrics["accuracy"] == pytest.approx(nacc, abs=1e-12)


def test_logreg_descends_and_learns(spark):
    """On linearly-separable-ish data the loss trajectory must fall
    strictly from the ln(2) zero-weight floor and the trained model
    must beat majority-class accuracy."""
    (w, hist, metrics), _ = _fit_random(spark, 3, 500, 4, 1.0, 6)
    assert hist[0] == pytest.approx(np.log(2.0), abs=1e-12)
    assert all(b < a for a, b in zip(hist, hist[1:]))
    assert metrics["loss"] < hist[-1]
    assert metrics["accuracy"] > 0.6


def test_logreg_deterministic(spark):
    (w1, h1, m1), _ = _fit_random(spark, 5, 300, 4, 1.0, 5)
    (w2, h2, m2), _ = _fit_random(spark, 5, 300, 4, 1.0, 5)
    assert w1 == w2 and h1 == h2 and m1 == m2


def test_logreg_rejects_no_features(spark):
    from meepo_spark.operators.optim import logreg_fit

    df = spark.createDataFrame([(1.0,)], "y double")
    with pytest.raises(ValueError, match="feature column"):
        logreg_fit(df, [], "y")


def test_graded_fit_is_cached_per_app(spark, sf_dir):
    """l58/l59 share one training run — the second call must be a
    cache hit (same tuple object), like l46/l47's merge table."""
    from meepo_spark.queries.ml_train import _fitted

    a = _fitted(spark, sf_dir)
    b = _fitted(spark, sf_dir)
    assert a is b
    w, hist, metrics = a
    assert len(w) == 9 and len(hist) == 5
    assert 0.0 <= metrics["accuracy"] <= 1.0


def test_logreg_casts_integer_labels(spark):
    """0/1 labels arriving as ints (the l58 binarized cast) train
    identically to doubles."""
    from meepo_spark.operators.optim import logreg_fit

    rows = [(i % 2, float(i) / 10.0) for i in range(20)]
    df_i = spark.createDataFrame(rows, "y int, x double")
    df_d = df_i.select(F.col("y").cast("double").alias("y"), "x")
    wi, hi, mi = logreg_fit(df_i, ["x"], "y", iters=3)
    wd, hd, md = logreg_fit(df_d, ["x"], "y", iters=3)
    assert wi == wd and hi == hd and mi == md


def test_exp_frames_engine_matches_sql_fragment(spark, duck, sf_dir):
    """exp_frames single-sourcing contract: the engine helper and the
    REV_ARMS_SQL oracle fragment must produce the identical (arm,
    cents) multiset — the desync this module exists to prevent."""
    from meepo_spark.queries.exp_frames import REV_ARMS_SQL, user_revenue_arms

    got = sorted(
        (r["arm"], r["cents"])
        for r in user_revenue_arms(spark, sf_dir).collect()
    )
    want = sorted(tuple(r) for r in duck.execute(REV_ARMS_SQL).fetchall())
    assert got == want
