"""Per-key time-series forecasting: Holt-Winters additive triple
exponential smoothing (level + trend + seasonal), the classical
forecaster behind capacity planning and ingest-volume anomaly alerts
(is tomorrow's document count inside the expected band?).

Shape: the 100 TB fact table collapses FIRST to one bounded series per
key (days × keys rows — a grouped count); the sequential smoothing
recursion then runs inside ONE applyInPandas group per key, O(series
length), no driver loop, no per-step job. This is the canonical split
for inherently-sequential per-key state: aggregate on-cluster, recurse
within the group.

Determinism / oracle parity: the recursion is pure IEEE double
arithmetic seeded from integer counts, expressed in the SAME operation
tree here and in the DuckDB oracle twin (a recursive CTE carrying
(level, trend, seasonal-list) state, one step per observation) — so
the forecasts hash-match bit-for-bit with NO rounding rescue, the same
discipline as the MMR score (operators/similarity.py::mmr_diversify).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)


def holt_winters(
    series: DataFrame,
    group_col: str,
    order_col: str,
    x_col: str,
    season: int = 7,
    alpha: float = 0.5,
    beta: float = 0.2,
    gamma: float = 0.3,
    horizon: int = 7,
) -> DataFrame:
    """Fit HW-additive per group and emit ``horizon`` forecasts.

    Initialization (pinned, shared with the oracle): level = first
    observation, trend = 0, seasonal = zeros; update for step t ≥ 1
    with seasonal slot ``t mod season``:

        level'    = α·(x_t − seas[slot]) + (1−α)·(level + trend)
        trend'    = β·(level' − level) + (1−β)·trend
        seas[slot] = γ·(x_t − level') + (1−γ)·seas[slot]

    Forecast h steps past the last observation (step index T):
    ``ŷ_h = level + h·trend + seas[(T + h) mod season]``.

    Returns ``(group_col, h, forecast)`` — ``horizon`` rows per group.
    Groups are independent series; a group with a single observation
    forecasts its own value (trend 0, seasonals 0).
    """
    a, b, g = float(alpha), float(beta), float(gamma)
    m, hz = int(season), int(horizon)

    # the group key keeps its INPUT type (int cohort ids, dates, …) —
    # pinning StringType here broke any non-string caller with an Arrow
    # schema mismatch at runtime (round-5 ADVICE)
    out_schema = StructType(
        [
            StructField(group_col, series.schema[group_col].dataType),
            StructField("h", IntegerType()),
            StructField("forecast", DoubleType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        key = pdf[group_col].iloc[0]
        x = pdf[x_col].to_numpy(dtype=np.float64)
        lvl = float(x[0])
        trd = 0.0
        seas = [0.0] * m
        for t in range(1, len(x)):
            si = t % m
            xt = float(x[t])
            nl = a * (xt - seas[si]) + (1.0 - a) * (lvl + trd)
            ntrd = b * (nl - lvl) + (1.0 - b) * trd
            seas[si] = g * (xt - nl) + (1.0 - g) * seas[si]
            lvl, trd = nl, ntrd
        last = len(x) - 1
        rows = [
            (key, h, lvl + float(h) * trd + seas[(last + h) % m])
            for h in range(1, hz + 1)
        ]
        return pd.DataFrame(rows, columns=[group_col, "h", "forecast"])

    return series.groupBy(group_col).applyInPandas(fit, out_schema)
