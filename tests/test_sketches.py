"""Accuracy/merge-semantics tests for the mergeable-sketch queries
(rows-only for the driver — these tests are their correctness story)."""

import pytest
from pyspark.sql import functions as F

from hls_stac_parquet_spark.queries.registry import REGISTRY, t

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def reach(spark):
    return REGISTRY["q_hll_user_reach"].fn(spark, SF_DIR).collect()


def test_hll_reach_schema_and_rows(spark, reach):
    n_types = t(spark, SF_DIR, "events").select("event_type").distinct().count()
    assert len(reach) == n_types
    assert {r["event_type"] for r in reach} == {
        r["event_type"]
        for r in t(spark, SF_DIR, "events").select("event_type").distinct().collect()
    }


def test_hll_estimate_within_error_band(spark, reach):
    """HLL at the default lgConfigK=12 has ~1.6% standard error; assert
    the merged estimate lands within 5% of the exact distinct count."""
    exact = {
        r["event_type"]: r["n"]
        for r in t(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in reach:
        rel_err = abs(r["est_users"] - exact[r["event_type"]]) / exact[r["event_type"]]
        assert rel_err < 0.05, (r["event_type"], r["est_users"], exact[r["event_type"]])


def test_hll_union_equals_single_pass(spark):
    """Merging daily sketches must estimate the same cardinality as one
    sketch over the whole partition — the mergeability contract that
    makes the two-level rollup valid at any re-aggregation granularity."""
    ev = t(spark, SF_DIR, "events")
    merged = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    single = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    m = {r["event_type"]: r["est"] for r in merged.collect()}
    s = {r["event_type"]: r["est"] for r in single.collect()}
    assert m == s


def test_hll_overlap_inclusion_exclusion_accuracy(spark):
    """Sketch-estimated pairwise overlap must land within 5% of the
    exact |A∩B| for every segment pair (HLL lgConfigK=12 error ~1.6%
    per term; inclusion-exclusion compounds three terms)."""
    from pyspark.sql import functions as F

    from hls_stac_parquet_spark.queries import REGISTRY
    from hls_stac_parquet_spark.queries.registry import t
    from tests.conftest import SF0001

    est = {
        (r.seg_a, r.seg_b): r.est_overlap
        for r in REGISTRY["q_hll_overlap"].fn(spark, SF0001).collect()
    }
    ev = t(spark, SF0001, "events")
    users = {
        r.event_type: set(
            x.user_id
            for x in ev.filter(F.col("event_type") == r.event_type)
            .select("user_id")
            .distinct()
            .collect()
        )
        for r in ev.select("event_type").distinct().collect()
    }
    assert len(est) == len(users) * (len(users) - 1) // 2
    for (sa, sb), e in est.items():
        exact = len(users[sa] & users[sb])
        assert abs(e - exact) <= max(0.05 * exact, 5), (sa, sb, e, exact)
