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

    # Size-tiered (r9, guide §1.2): the distributed loop's cost is
    # 2·iters driver-sequenced jobs of pure scheduler latency (~150 ms
    # each around a ~5 ms aggregate at bench scale). Below the row cap
    # the feature matrix is collected ONCE (one Arrow job, ≤ ~32 MB at
    # the cap) and the identical GD runs vectorized in numpy — same
    # init, step, iteration count, and same null semantics (a row with
    # any NULL feature/label contributes to no gradient term: the
    # literal-coefficient margin nulls resid whenever any x_j is null,
    # and F.sum skips null terms — so dropna == the per-term
    # exclusions; n stays the FULL row count either way). Weights
    # agree with the distributed path to float-summation-order ulps
    # (outputs round to ≥4 dp; pinned by tests + oracle parity).
    # Above the cap — any corpus that matters at 100 TB — the
    # aggregate loop below is unchanged.
    import os

    max_driver_rows = int(
        os.environ.get("SPARK_GRAFT_LOGREG_DRIVER_MAX_ROWS", "1000000")
    )
    if n_row <= max_driver_rows:
        import numpy as np

        pdf = (
            df.select(
                *[F.col(c).cast("double") for c in feats],
                F.col(label_col).cast("double").alias("_y"),
            )
            .na.drop()
            .toPandas()
        )
        X = pdf[feats].to_numpy(dtype=np.float64)
        y = pdf["_y"].to_numpy(dtype=np.float64)
        Xb = np.hstack([X, np.ones((len(X), 1))])
        wv = np.zeros(d + 1)
        for _ in range(iters):
            p = 1.0 / (1.0 + np.exp(-(Xb @ wv)))
            grad = Xb.T @ (p - y) / n_row
            grad[:d] += reg * wv[:d]
            wv = wv - lr * grad
        return [float(x) for x in wv]

    # AQE off for the loop (restored after): each round is a 1-row
    # global aggregate, and AQE materializes its partial-agg stage as
    # a SEPARATE job before re-planning the 1-partition exchange it
    # could never improve — doubling the job count of a loop whose
    # cost is pure scheduler latency (profiled r8: 44 trivial jobs,
    # ~90 ms each around a ~5 ms aggregate; AQE off: 3.9 s → 3.4 s,
    # bit-identical weights). Runtime re-planning has nothing to
    # offer a fixed-shape scalar aggregate at any scale.
    # CONTRACT (r9, VERDICT note): spark.conf is session-global — safe
    # under the engine's sequential query execution, NOT thread-safe if
    # queries ever run concurrently on one session (a concurrent
    # deployment should drop the toggle; it is an optimization only).
    spark = df.sparkSession
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(iters):
            # margin = w·x + b as a literal-coefficient expression —
            # codegen'd, recompiled per iteration (cheap: d is small)
            margin = F.lit(w[d])
            for j, c in enumerate(feats):
                margin = margin + F.lit(w[j]) * F.col(c)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            resid = p - F.col(label_col).cast("double")
            agg = df.agg(
                *[
                    F.sum(resid * F.col(c)).alias(f"g{j}")
                    for j, c in enumerate(feats)
                ],
                F.sum(resid).alias("gb"),
            ).collect()[0]
            grad = [agg[f"g{j}"] / n_row + reg * w[j] for j in range(d)]
            grad.append(agg["gb"] / n_row)
            w = [wi - lr * gi for wi, gi in zip(w, grad)]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
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


def bradley_terry_fit(
    pairs: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iters: int = 10,
) -> DataFrame:
    """Bradley–Terry preference strengths via the classic MM update —
    the preference-data operator of RLHF corpus analysis: given
    pairwise outcomes, fit strengths p s.t. P(i beats j) =
    p_i / (p_i + p_j).

    Each MM round (Hunter 2004): p_i' = w_i / Σ_j n_ij / (p_i + p_j),
    then rescale to mean 1 (the likelihood is scale-invariant; the
    rescale pins the parameterization). Every round is TWO keyed
    joins + one aggregate over the |entities|²-bounded pair-count
    relation — entity-bounded state, the same per-round
    localCheckpoint discipline as operators/graph.py::pagerank (the
    relation is joined every round; lineage must not replay).
    Entities with zero wins converge to strength 0, the MM fixpoint.
    Deterministic: fixed init (1.0), fixed rounds, no RNG — the
    fixed-count unroll is SQL-expressible, so queries built on this
    kernel carry full oracles (q_bradley_terry).
    """
    wl = pairs.groupBy(
        F.col(winner_col).alias("a"), F.col(loser_col).alias("b")
    ).agg(F.count("*").alias("n"))
    # ordered relation with per-ordered-pair totals n_ab (symmetric)
    rel = (
        wl.unionByName(
            wl.select(
                F.col("b").alias("a"), F.col("a").alias("b"), "n"
            )
        )
        .groupBy("a", "b")
        .agg(F.sum("n").alias("n"))
        .localCheckpoint()
    )
    wins = (
        pairs.groupBy(F.col(winner_col).alias("entity"))
        .agg(F.count("*").cast("double").alias("w"))
        .localCheckpoint()
    )
    entities = rel.select(F.col("a").alias("entity")).distinct()
    p = entities.join(wins, "entity", "left").select(
        "entity",
        F.coalesce("w", F.lit(0.0)).alias("w"),
        F.lit(1.0).alias("p"),
    ).localCheckpoint()

    for _ in range(iters):
        denom = (
            rel.join(
                p.select(F.col("entity").alias("a"), F.col("p").alias("pa")),
                "a",
            )
            .join(
                p.select(F.col("entity").alias("b"), F.col("p").alias("pb")),
                "b",
            )
            .groupBy(F.col("a").alias("entity"))
            .agg(F.sum(F.col("n") / (F.col("pa") + F.col("pb"))).alias("d"))
        )
        raw = p.join(denom, "entity", "left").select(
            "entity",
            "w",
            F.when(
                F.coalesce("d", F.lit(0.0)) > 0, F.col("w") / F.col("d")
            )
            .otherwise(F.lit(0.0))
            .alias("p"),
        )
        # rescale to mean 1 via a broadcast 1-row scalar dim
        mean_p = raw.agg(F.avg("p").alias("mp"))
        p = (
            raw.join(F.broadcast(mean_p))
            .select("entity", "w", (F.col("p") / F.col("mp")).alias("p"))
            .localCheckpoint()
        )
    return p.select("entity", F.col("w").cast("bigint").alias("n_wins"), "p")


def isotonic_fit(
    bins: DataFrame,
    x_col: str,
    wy_col: str,
    w_col: str,
) -> DataFrame:
    """Weighted isotonic regression (pool-adjacent-violators) over a
    BOUNDED pre-aggregated frame — the shape-constrained upgrade of
    the reliability diagram: fit the least-squares NON-DECREASING
    curve y_fit(x) to per-bucket outcome rates, the standard
    calibration map (Zadrozny & Elkan 2002) applied to classifier
    scores before they gate training data.

    Contract: ``bins`` has ONE row per distinct ``x_col`` value and
    carries integer sufficient statistics — ``wy_col`` = Σ y (y ∈
    {0,1}) and ``w_col`` = Σ 1 within the bucket. Pooling decisions
    compare block means by integer cross-multiplication (wy₁·w₂ >
    wy₂·w₁), so the fit involves ZERO float comparisons and the
    fitted value of each block is a single exact int/int division —
    bit-identical on any engine that computes the same block
    partition (the DuckDB oracle twin uses the minimax identity
    ŷᵢ = max_{j≤i} min_{k≥i} avg(y[j..k]) — a different algorithm,
    same exact arithmetic — so agreement is evidence, not echo).

    Scale shape: the input is an AGGREGATE (≤ #buckets rows, fixed by
    the binning, not the corpus) — the 100 TB fact scan happens
    upstream in the grouped count. The fit itself runs as ONE
    applyInPandas group on an executor: no driver collect, no loop of
    jobs, O(#buckets) stack-based PAVA. Returns the input columns +
    ``y_fit`` (double).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    in_fields = list(bins.schema.fields)
    out_schema = StructType(in_fields + [StructField("y_fit", DoubleType())])
    cols = [f.name for f in in_fields]

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[cols].sort_values(x_col).reset_index(drop=True)
        wy = pdf[wy_col].to_numpy(dtype=np.int64)
        w = pdf[w_col].to_numpy(dtype=np.int64)
        blocks: list[list[int]] = []  # [start_idx, Σwy, Σw]
        for i in range(len(pdf)):
            cur = [i, int(wy[i]), int(w[i])]
            while blocks and blocks[-1][1] * cur[2] > cur[1] * blocks[-1][2]:
                prev = blocks.pop()
                cur = [prev[0], prev[1] + cur[1], prev[2] + cur[2]]
            blocks.append(cur)
        yhat = np.empty(len(pdf), dtype=np.float64)
        starts = [b[0] for b in blocks] + [len(pdf)]
        for bi, b in enumerate(blocks):
            yhat[starts[bi] : starts[bi + 1]] = b[1] / b[2]
        out = pdf.copy()
        out["y_fit"] = yhat
        return out

    return (
        bins.withColumn("_all", F.lit(1))
        .groupBy("_all")
        .applyInPandas(lambda pdf: fit(pdf), out_schema)
    )
