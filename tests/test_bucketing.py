"""Bucketed co-located joins: the write-once-shuffle-never pattern.

Asserts the property that matters at 100 TB: a join between two
tables bucketed identically on the join key plans WITHOUT any
Exchange — the shuffle was paid at write time.
"""

from __future__ import annotations

import pytest

from hls_stac_parquet_spark.sinks.bucketed import read_bucketed, write_bucketed
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    # warehouse.dir is a static conf on the shared session; tables land
    # in the default ./spark-warehouse (gitignored) and are dropped
    orders = spark.read.parquet(f"{SF0001}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(bucketed_pair):
    spark = bucketed_pair
    # disable AQE-side broadcast demotion noise for a deterministic plan
    joined = read_bucketed(spark, "b_orders").hint("merge").join(
        read_bucketed(spark, "b_lineitem"), "o_orderkey"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(bucketed_pair):
    spark = bucketed_pair
    bucketed_n = (
        read_bucketed(spark, "b_orders")
        .join(read_bucketed(spark, "b_lineitem"), "o_orderkey")
        .count()
    )
    orders = spark.read.parquet(f"{SF0001}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    plain_n = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert bucketed_n == plain_n
