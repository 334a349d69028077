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


def test_tdigest_rank_error_bound(spark):
    """The k0 digest's documented bound: ≤ ~2/k rank error after one
    partition compression + one merge. Random lognormal data, k=100,
    assert observed rank error ≤ 0.03 at every requested quantile."""
    import numpy as np

    from hls_stac_parquet_spark.operators.sketches import tdigest_quantiles

    rng = np.random.default_rng(7)
    vals = rng.lognormal(0.0, 1.5, 20000)
    df = spark.createDataFrame(
        [(int(i % 3), float(v)) for i, v in enumerate(vals)], "g int, v double"
    ).repartition(16)
    got = {
        r.g: (r.q_10, r.q_50, r.q_95)
        for r in tdigest_quantiles(df, ["g"], "v", [0.1, 0.5, 0.95], k=100).collect()
    }
    for g in range(3):
        data = np.sort(vals[np.arange(len(vals)) % 3 == g])
        n = len(data)
        for est, q in zip(got[g], (0.1, 0.5, 0.95)):
            rank = np.searchsorted(data, est) / n
            assert abs(rank - q) <= 0.03, (g, q, est, rank)


def test_tdigest_merge_equals_single_pass(spark):
    """Persist-then-rollup: digests built per day and re-merged must
    estimate within the same bound as a single-pass digest — the
    mergeability contract."""
    import numpy as np

    from hls_stac_parquet_spark.operators.sketches import (
        merge_digest_tables,
        tdigest_quantiles,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    vals = rng.normal(100.0, 15.0, 12000)
    df = spark.createDataFrame(
        [(int(i % 4), float(v)) for i, v in enumerate(vals)],
        "day int, v double",
    )
    # per-day digests (group = day), then re-merge ignoring day
    from hls_stac_parquet_spark.operators.sketches import _compress
    daily = df.groupBy("day").applyInPandas(
        _daily_digest_builder(), "day int, means array<double>, weights array<double>"
    ).withColumn("all", F.lit(1))
    merged = merge_digest_tables(daily, ["all"], [0.5], k=100).collect()[0]
    exact = float(np.median(vals))
    data = np.sort(vals)
    rank = np.searchsorted(data, merged.q_50) / len(data)
    assert abs(rank - 0.5) <= 0.03, (merged.q_50, exact, rank)


def _daily_digest_builder():
    import numpy as np
    import pandas as pd

    from hls_stac_parquet_spark.operators.sketches import _compress

    def build(key, pdf):
        vals = pdf["v"].to_numpy(dtype=np.float64)
        m, w = _compress(vals, np.ones_like(vals), 100)
        return pd.DataFrame(
            [(key[0], list(m), list(w))], columns=["day", "means", "weights"]
        )

    return build


def test_countmin_bounds_on_zipf_data(spark):
    """CM estimates are one-sided: est >= true for every key, and for
    width=1024 over N rows, est <= true + 2N/width for the vast
    majority of probes (standard bound at depth=4)."""
    import numpy as np

    from hls_stac_parquet_spark.operators.sketches import (
        countmin_build,
        countmin_estimate,
    )

    rng = np.random.default_rng(5)
    keys = rng.zipf(1.5, 20000)
    keys = keys[keys < 1000]
    n = len(keys)
    df = spark.createDataFrame([(int(k),) for k in keys], "k long")
    sketch = countmin_build(df, "k", depth=4, width=1024)
    import collections

    true = collections.Counter(int(k) for k in keys)
    probe = spark.createDataFrame([(k,) for k in true], "k long")
    est = {
        r.k: r.est_count
        for r in countmin_estimate(sketch, probe, "k", depth=4, width=1024).collect()
    }
    assert all(est[k] >= c for k, c in true.items())
    slack = 2 * n / 1024
    ok = sum(1 for k, c in true.items() if est[k] <= c + slack)
    assert ok / len(true) >= 0.95, ok / len(true)


def test_countmin_merge_is_cellwise_sum(spark):
    """Two half-corpus sketches summed cell-wise == the full-corpus
    sketch (the mergeability contract)."""
    from pyspark.sql import functions as F

    from hls_stac_parquet_spark.operators.sketches import countmin_build

    df = spark.createDataFrame([(i % 50,) for i in range(2000)], "k long")
    full = countmin_build(df, "k", depth=3, width=64)
    # deterministic split: even/odd keys
    a = df.where(F.col("k") % 2 == 0)
    b = df.where(F.col("k") % 2 == 1)
    merged = (
        countmin_build(a, "k", depth=3, width=64)
        .unionByName(countmin_build(b, "k", depth=3, width=64))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got = {(r.d, r.bucket): r.cnt for r in merged.collect()}
    want = {(r.d, r.bucket): r.cnt for r in full.collect()}
    assert got == want


def test_sketch_query_invariant_flags_all_true(spark):
    """Round-5 verdict item 5b: the rows-only sketch queries carry
    their accuracy contracts as in-row boolean flags — every flag
    must be TRUE at both test scales (the flags are what make the
    driver's rows-only record self-evidencing)."""
    from hls_stac_parquet_spark.queries import REGISTRY
    from tests.conftest import SF0001, SF001

    for sf_dir in (SF0001, SF001):
        reach = REGISTRY["q_hll_user_reach"].fn(spark, sf_dir).collect()
        assert reach and all(r.est_within_5pct for r in reach), sf_dir
        overlap = REGISTRY["q_hll_overlap"].fn(spark, sf_dir).collect()
        assert overlap and all(
            r.overlap_nonneg_ok and r.overlap_le_min_ok for r in overlap
        ), sf_dir
        cms = (
            REGISTRY["q_countmin_heavy_hitters"].fn(spark, sf_dir).collect()
        )
        assert cms and all(
            r.est_ge_true and r.est_within_eps for r in cms
        ), sf_dir
        acd = (
            REGISTRY["q_count_distinct_approx"].fn(spark, sf_dir).collect()
        )
        assert acd and all(r.est_within_5pct for r in acd), sf_dir
