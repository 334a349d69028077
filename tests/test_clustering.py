"""Grid-blocked exact DBSCAN (operators/clustering.py) vs a
brute-force numpy replay of the same deterministic semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hls_stac_parquet_spark.operators.clustering import dbscan


def _numpy_dbscan(ids, xy, eps, min_pts):
    """Reference implementation: all-pairs distances, textbook
    core/noise sets, min-core-id cluster labels, min-cluster border
    rule — the exact contract dbscan() documents."""
    n = len(ids)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    nbr = d2 <= eps * eps  # includes self
    is_core = nbr.sum(1) >= min_pts
    # union-find over core-core <=eps edges
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if not is_core[i]:
            continue
        for j in range(i + 1, n):
            if is_core[j] and nbr[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    cluster = {}
    for i in range(n):
        if is_core[i]:
            root = find(i)
            members = [ids[j] for j in range(n) if is_core[j] and find(j) == root]
            cluster[ids[i]] = min(members)
    out = {}
    for i in range(n):
        if is_core[i]:
            out[ids[i]] = ("core", cluster[ids[i]])
        else:
            core_nbrs = [
                cluster[ids[j]] for j in range(n) if is_core[j] and nbr[i, j]
            ]
            if core_nbrs:
                out[ids[i]] = ("border", min(core_nbrs))
            else:
                out[ids[i]] = ("noise", None)
    return out


def _spark_dbscan(spark, ids, xy, eps, min_pts):
    df = spark.createDataFrame(
        pd.DataFrame({"id": ids, "x": xy[:, 0], "y": xy[:, 1]})
    )
    rows = dbscan(df, eps=eps, min_pts=min_pts).collect()
    return {r.id: (r.role, r.cluster) for r in rows}


def test_dbscan_two_blobs_and_noise(spark):
    rng = np.random.default_rng(3)
    blob_a = rng.normal([0.0, 0.0], 0.05, size=(20, 2))
    blob_b = rng.normal([2.0, 2.0], 0.05, size=(20, 2))
    noise = np.array([[1.0, 1.0], [5.0, -3.0], [-4.0, 4.0]])
    xy = np.vstack([blob_a, blob_b, noise])
    ids = list(range(len(xy)))
    got = _spark_dbscan(spark, ids, xy, eps=0.2, min_pts=4)
    want = _numpy_dbscan(ids, xy, eps=0.2, min_pts=4)
    assert got == want
    # shape sanity: two clusters, the three isolated points are noise
    clusters = {c for r, c in got.values() if c is not None}
    assert len(clusters) == 2
    assert all(got[i][0] == "noise" for i in (40, 41, 42))


@pytest.mark.parametrize("trial", [0, 1, 2])
def test_dbscan_matches_numpy_on_random_points(spark, trial):
    rng = np.random.default_rng(100 + trial)
    xy = rng.uniform(-1.5, 1.5, size=(60, 2))
    ids = list(range(60))
    eps, min_pts = 0.3, 3 + trial
    got = _spark_dbscan(spark, ids, xy, eps, min_pts)
    want = _numpy_dbscan(ids, xy, eps, min_pts)
    assert got == want


def test_dbscan_cell_size_is_result_invisible(spark):
    """Blocking must not change the result: shifting all coordinates
    (so points land in different grid cells relative to the origin)
    shifts the geometry rigidly and must relabel nothing."""
    rng = np.random.default_rng(9)
    xy = rng.uniform(0, 2, size=(50, 2))
    ids = list(range(50))
    base = _spark_dbscan(spark, ids, xy, eps=0.25, min_pts=4)
    shifted = _spark_dbscan(spark, ids, xy + 7.123, eps=0.25, min_pts=4)
    assert base == shifted


def test_dbscan_isolated_core_is_singleton_cluster(spark):
    # 5 coincident points: all core (min_pts=5), one cluster; plus a
    # far lone point: noise
    xy = np.array([[0.0, 0.0]] * 5 + [[9.0, 9.0]])
    ids = list(range(6))
    got = _spark_dbscan(spark, ids, xy, eps=0.1, min_pts=5)
    assert {got[i] for i in range(5)} == {("core", 0)}
    assert got[5] == ("noise", None)
