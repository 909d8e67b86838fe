"""Full-batch gradient-descent logistic regression on DataFrames —
the learned-classifier member of the iterative-algorithm family
(k-means in ``clustering.py``, PageRank in ``graph.py``, BPE in
``bpe.py``). Trains the quality-classifier weights a curation
pipeline ships (l20 consumes a HASHED pre-trained classifier; this
operator is where such weights come from).

Design for 100 TB:
  * each iteration is ONE distributed aggregate computing the d+1
    mean-gradient components and the running log-loss together —
    map-side partial aggregation makes it the declarative twin of
    MLlib's ``treeAggregate`` gradient pass; no shuffle wider than
    the (d+2)-column partial-agg rows;
  * driver state is O(d) — the weight vector only, never rows;
  * the sigmoid / log-loss fold stays JVM-side as whole-stage-codegen
    expressions: weights enter each round as literals, so the linear
    predictor compiles to constant-folded multiply-adds (zero Python
    in the per-row path);
  * the feature frame is column-pruned then ``localCheckpoint``-ed
    once, so every round re-reads a materialized (rows × d+1) double
    block instead of re-scanning parquet — and lineage stays O(1)
    across rounds (the ``operators/graph.py`` discipline).

Numerics (the cross-engine contract the graded oracle relies on):
  * all arithmetic is float64; the linear predictor folds
    left-to-right in declaration order on BOTH engines, so the only
    divergence source is AVG summation order + libm exp/log ulps —
    measured drift ~1e-13 after 5 rounds, absorbed by the graded
    queries' 6dp rounding (+1e-9 nudge);
  * log-loss uses the softplus identity
    ``-[y·ln p + (1-y)·ln(1-p)] = softplus(z) - y·z`` computed in the
    overflow-safe form ``max(z,0) + log1p(e^-|z|)`` — ``e^-|z|`` never
    exceeds 1, so the loss stays finite for any |z| (the naive
    ``ln(1+e^z)`` overflows to inf past z≈709 under large lr·iters);
    the DuckDB oracle in queries/ml_train.py writes the identical
    form, keeping the cross-engine contract in lockstep.

Determinism: zero-initialized weights, fixed iteration count, fixed
learning rate — repeated runs produce identical weights, which both
the property tests and the unrolled DuckDB oracle rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _softplus(z: Column) -> Column:
    """Overflow-safe ln(1+e^z) = max(z,0) + log1p(e^-|z|): the exp
    argument is ≤0, so no |z| can push it to inf (naive form dies at
    z≈709)."""
    return F.greatest(z, F.lit(0.0)) + F.log1p(F.exp(-F.abs(z)))


def _linear_z(weights: list[float], d: int) -> Column:
    """b + Σ w_i·x_i folded left-to-right — the SAME association order
    the unrolled oracle writes, so per-row z is bit-comparable up to
    libm ulps."""
    z = F.lit(float(weights[0]))
    for i in range(d):
        z = z + F.lit(float(weights[i + 1])) * F.col(f"__x{i}")
    return z


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 5,
) -> tuple[list[float], list[float], dict[str, float]]:
    """Train binary logistic regression by full-batch gradient descent.

    ``label_col`` must already be 0/1-valued (cast to double here).
    Returns ``(weights, loss_history, final_metrics)`` where
    ``weights = [intercept, w_1..w_d]``, ``loss_history[t]`` is the
    mean log-loss at the START of round t (i.e. under ``w_t``), and
    ``final_metrics`` holds ``loss`` and ``accuracy`` under the
    trained weights (accuracy = share of rows where sign(z) matches
    the label; z≥0 predicts 1)."""
    d = len(feature_cols)
    if d == 0:
        raise ValueError("logreg_fit: need at least one feature column")
    base = df.select(
        F.col(label_col).cast("double").alias("__y"),
        *[
            F.col(c).cast("double").alias(f"__x{i}")
            for i, c in enumerate(feature_cols)
        ],
    ).localCheckpoint()

    y = F.col("__y")
    w = [0.0] * (d + 1)
    history: list[float] = []
    for _ in range(iters):
        z = _linear_z(w, d)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        aggs = [F.avg(p - y).alias("g0")]
        aggs += [
            F.avg((p - y) * F.col(f"__x{i}")).alias(f"g{i + 1}")
            for i in range(d)
        ]
        aggs.append(F.avg(_softplus(z) - y * z).alias("loss"))
        row = base.agg(*aggs).first()
        history.append(float(row["loss"]))
        w = [w[j] - lr * float(row[f"g{j}"]) for j in range(d + 1)]

    z = _linear_z(w, d)
    final = base.agg(
        F.avg(_softplus(z) - y * z).alias("loss"),
        F.avg(((z >= 0) == (y >= 0.5)).cast("double")).alias("accuracy"),
    ).first()
    return (
        w,
        history,
        {"loss": float(final["loss"]), "accuracy": float(final["accuracy"])},
    )
