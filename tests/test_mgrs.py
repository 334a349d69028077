"""MGRS decoder tests — band/zone correctness + the broadcast dim
plan (the unit coverage the reference lacks for write.py:41-88)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hls_stac_parquet_spark.functions.mgrs import mgrs_dim_table, mgrs_tile_center

# tile → containing-region ground truth (city the 100km square covers)
KNOWN = {
    "15TWN": (46.4, 48.0, -94.0, -91.5),   # Duluth MN area
    "31UDQ": (48.5, 49.7, 1.5, 3.2),        # Paris
    "04QFJ": (20.8, 21.8, -158.5, -157.0),  # Honolulu
    "56JKT": (-25.6, -24.2, 150.0, 151.3),  # Queensland (S hemisphere)
}


def test_known_tiles_land_in_region():
    out = mgrs_tile_center(pd.Series(list(KNOWN)))
    for (tile, (lat_lo, lat_hi, lon_lo, lon_hi)), lat, lon in zip(
        KNOWN.items(), out["lat"], out["lon"]
    ):
        assert lat_lo <= lat <= lat_hi, (tile, lat)
        assert lon_lo <= lon <= lon_hi, (tile, lon)


def test_invalid_tiles_nan():
    out = mgrs_tile_center(pd.Series(["bogus", "", None, "99ZZZ"]))
    assert out["lat"].isna().all() and out["lon"].isna().all()


def test_band_sign():
    out = mgrs_tile_center(pd.Series(["33KXQ", "15TWN"]))
    assert out["lat"][0] < 0 < out["lat"][1]  # K band south, T band north


def test_dim_table_broadcast_plan(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"mgrs_tile": ["15TWN", "15TWN", "31UDQ", None]})
    )
    dim = mgrs_dim_table(spark, df)
    rows = {r.mgrs_tile: (r.tile_lat, r.tile_lon) for r in dim.collect()}
    # distinct() collapsed duplicates; null tile decodes to NaN
    assert set(rows) == {"15TWN", "31UDQ", None}
    assert rows["15TWN"][0] == pytest.approx(47.4, abs=1.0)
    joined = df.join(F.broadcast(dim), "mgrs_tile", "left")
    assert "BroadcastHashJoin" in joined._jdf.queryExecution().executedPlan().toString()
