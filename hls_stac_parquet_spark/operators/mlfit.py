"""Distributed model FITTING via sufficient-statistic aggregation —
full-batch logistic regression trained with gradient descent where
each iteration is ONE codegen'd aggregate.

The engine already scores with a broadcast linear model
(q_logistic_scorer); this closes the loop and trains that quality
classifier on-cluster. The shape is the textbook one for models whose
gradient decomposes row-wise: per iteration, every executor computes
partial Σ (sigmoid(w·x) − y)·x over its rows inside whole-stage
codegen (no Python, no UDF — w enters as literals), the driver sums
the d+1 partials, takes a step, and re-broadcasts. d+1 doubles cross
the wire per iteration; the fact table never moves. This is exactly
how MLlib's LogisticRegression aggregates (treeAggregate of gradient
partials) re-expressed in the DataFrame API.

Deterministic: zero init, fixed step, float64 aggregation — equality
with a pure-numpy replay is property-tested (tests/test_mlfit.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logreg_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iters: int = 20,
    lr: float = 0.5,
    reg: float = 0.0,
) -> list[float]:
    """Train logistic weights [w_1..w_d, intercept] by full-batch GD.

    Each iteration is one aggregate job over the (cached-by-caller if
    reused) input; the returned list is plain Python floats. ``reg``
    is L2 on the non-intercept weights.
    """
    feats = list(feature_cols)
    d = len(feats)
    n_row = df.count()
    if n_row == 0:
        raise ValueError("logreg_fit: empty input")
    w = [0.0] * (d + 1)

    for _ in range(iters):
        # margin = w·x + b as a literal-coefficient expression —
        # codegen'd, recompiled per iteration (cheap: d is small)
        margin = F.lit(w[d])
        for j, c in enumerate(feats):
            margin = margin + F.lit(w[j]) * F.col(c)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        resid = p - F.col(label_col).cast("double")
        agg = df.agg(
            *[F.sum(resid * F.col(c)).alias(f"g{j}") for j, c in enumerate(feats)],
            F.sum(resid).alias("gb"),
        ).collect()[0]
        grad = [agg[f"g{j}"] / n_row + reg * w[j] for j in range(d)]
        grad.append(agg["gb"] / n_row)
        w = [wi - lr * gi for wi, gi in zip(w, grad)]
    return w


def logreg_score(
    df: DataFrame,
    weights: Sequence[float],
    feature_cols: Sequence[str],
) -> DataFrame:
    """Attach p = sigmoid(w·x + b) as ``score`` — broadcast-free
    (weights are literals), fully codegen'd, zero shuffle."""
    feats = list(feature_cols)
    margin = F.lit(float(weights[len(feats)]))
    for j, c in enumerate(feats):
        margin = margin + F.lit(float(weights[j])) * F.col(c)
    return df.withColumn(
        "score", F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    )
