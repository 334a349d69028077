from __future__ import annotations

import numpy as np
import pytest

from hls_stac_parquet_spark.operators.spatialjoin import point_in_polygon_join


def _regular_ccw(cx, cy, r, n, phase):
    ang = phase + 2 * np.pi * np.arange(n) / n
    return (cx + r * np.cos(ang)).tolist(), (cy + r * np.sin(ang)).tolist()


def _brute_inside(vx, vy, px, py):
    vx, vy = np.asarray(vx), np.asarray(vy)
    nvx, nvy = np.roll(vx, -1), np.roll(vy, -1)
    cross = (nvx - vx) * (py - vy) - (nvy - vy) * (px - vx)
    return cross.min() >= 0


@pytest.fixture(scope="module")
def spatial(spark):
    rng = np.random.default_rng(42)
    polys = []
    for pid in range(12):
        vx, vy = _regular_ccw(
            rng.uniform(0, 80),
            rng.uniform(0, 80),
            rng.uniform(2, 15),
            int(rng.integers(3, 8)),
            rng.uniform(0, 2 * np.pi),
        )
        polys.append((pid, vx, vy))
    pts = [
        (i, float(x), float(y))
        for i, (x, y) in enumerate(rng.uniform(-5, 90, size=(400, 2)))
    ]
    pdf = spark.createDataFrame(polys, "poly_id long, vx array<double>, vy array<double>")
    tdf = spark.createDataFrame(pts, "pt_id long, x double, y double")
    return polys, pts, pdf, tdf


def _expected_pairs(polys, pts):
    return {
        (pid, i)
        for pid, vx, vy in polys
        for i, x, y in pts
        if _brute_inside(vx, vy, x, y)
    }


def test_blocked_join_equals_brute_force(spatial):
    polys, pts, pdf, tdf = spatial
    got = {
        (r.poly_id, r.pt_id)
        for r in point_in_polygon_join(tdf, pdf, cell_size=10.0).collect()
    }
    assert got == _expected_pairs(polys, pts)


def test_result_invariant_to_cell_size(spatial):
    polys, pts, pdf, tdf = spatial
    want = _expected_pairs(polys, pts)
    for cs in (3.0, 25.0, 1000.0):
        got = {
            (r.poly_id, r.pt_id)
            for r in point_in_polygon_join(tdf, pdf, cell_size=cs).collect()
        }
        assert got == want, cs


def test_boundary_points_count_inside(spark):
    # unit square, CCW; corners and edge midpoints are all inside
    pdf = spark.createDataFrame(
        [(0, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0])],
        "poly_id long, vx array<double>, vy array<double>",
    )
    pts = [(0, 0.0, 0.0), (1, 1.0, 1.0), (2, 0.5, 0.0), (3, 0.5, 0.5),
           (4, 1.0000001, 0.5), (5, -0.0000001, 0.5)]
    tdf = spark.createDataFrame(pts, "pt_id long, x double, y double")
    got = {
        r.pt_id
        for r in point_in_polygon_join(tdf, pdf, cell_size=1.0).collect()
    }
    assert got == {0, 1, 2, 3}


def test_negative_coordinates_block_correctly(spark):
    # floor-based cell keys must work across the origin
    pdf = spark.createDataFrame(
        [(0, [-3.0, -1.0, -1.0, -3.0], [-3.0, -3.0, -1.0, -1.0])],
        "poly_id long, vx array<double>, vy array<double>",
    )
    tdf = spark.createDataFrame(
        [(0, -2.0, -2.0), (1, 2.0, 2.0)], "pt_id long, x double, y double"
    )
    got = {
        r.pt_id
        for r in point_in_polygon_join(tdf, pdf, cell_size=2.5).collect()
    }
    assert got == {0}


def test_geo_radius_pairs_matches_brute_force(spark):
    """Grid blocking is result-invisible: pairs within R from
    geo_radius_pairs == the quadratic haversine filter, on random
    coordinates including poles and antimeridian neighborhoods."""
    import math
    import random

    from hls_stac_parquet_spark.operators.spatialjoin import geo_radius_pairs

    rng = random.Random(42)

    def hav_km(a, b):
        la1, lo1, la2, lo2 = map(math.radians, (a[1], a[2], b[1], b[2]))
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(h))

    pts = [(i, rng.uniform(-90, 90), rng.uniform(-180, 180)) for i in range(40)]
    # adversarial: polar cluster + antimeridian straddle
    pts += [
        (100, 89.9, 10.0), (101, 89.8, -170.0),
        (102, 0.0, 179.9), (103, 0.0, -179.9),
        (104, -89.95, 55.0), (105, -89.9, -120.0),
    ]
    left = spark.createDataFrame(
        [(i, la, lo) for i, la, lo in pts], ["lid", "llat", "llon"]
    )
    right = spark.createDataFrame(
        [(i, la, lo) for i, la, lo in pts], ["rid", "rlat", "rlon"]
    )
    for r_km in (300.0, 1500.0):
        got = {
            (r["lid"], r["rid"])
            for r in geo_radius_pairs(
                left, right, r_km,
                lat_l="llat", lon_l="llon", lat_r="rlat", lon_r="rlon",
            ).collect()
        }
        want = {
            (a[0], b[0]) for a in pts for b in pts if hav_km(a, b) <= r_km
        }
        assert got == want, f"radius {r_km}"
