"""Holt-Winters operator: exact replay + behavioral properties."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _replay(xs, m=7, a=0.5, b=0.2, g=0.3, horizon=7):
    """Independent pure-python replay of the pinned recursion."""
    lvl, trd, seas = float(xs[0]), 0.0, [0.0] * m
    for t in range(1, len(xs)):
        si = t % m
        nl = a * (xs[t] - seas[si]) + (1.0 - a) * (lvl + trd)
        trd = b * (nl - lvl) + (1.0 - b) * trd
        seas[si] = g * (xs[t] - nl) + (1.0 - g) * seas[si]
        lvl = nl
    last = len(xs) - 1
    return [lvl + float(h) * trd + seas[(last + h) % m] for h in range(1, horizon + 1)]


def _fit(spark, series_by_key, **kw):
    from hls_stac_parquet_spark.operators.forecast import holt_winters

    rows = [
        (k, i, float(v))
        for k, xs in series_by_key.items()
        for i, v in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "k string, step long, x double")
    out = holt_winters(df, "k", "step", "x", **kw).collect()
    got = {}
    for r in out:
        got.setdefault(r.k, {})[r.h] = r.forecast
    return {k: [v[h] for h in sorted(v)] for k, v in got.items()}


def test_holt_winters_matches_pure_python_replay(spark):
    rng = np.random.default_rng(31)
    series = {
        "a": list(map(float, rng.integers(50, 150, size=60))),
        "b": list(map(float, rng.integers(5, 30, size=23))),
    }
    got = _fit(spark, series)
    for k, xs in series.items():
        assert got[k] == pytest.approx(_replay(xs), abs=0.0), k


def test_holt_winters_single_observation_forecasts_itself(spark):
    got = _fit(spark, {"solo": [42.0]})
    assert got["solo"] == [42.0] * 7


def test_holt_winters_tracks_trend_and_season(spark):
    # linear trend + exact weekly pattern: forecasts must extrapolate
    # the slope and reproduce the seasonal offsets approximately
    season = [0.0, 10.0, -5.0, 3.0, 0.0, -8.0, 4.0]
    xs = [100.0 + 2.0 * t + season[t % 7] for t in range(70)]
    got = _fit(spark, {"s": xs})
    truth = [100.0 + 2.0 * (69 + h) + season[(69 + h) % 7] for h in range(1, 8)]
    assert got["s"] == pytest.approx(truth, abs=6.0)
