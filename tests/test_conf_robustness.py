"""Physical-strategy robustness: results must be invariant to the
join strategy Catalyst/AQE picks. On a 1000-executor cluster a dim
that broadcasts at sf0.01 may NOT fit (autoBroadcastJoinThreshold
effectively -1), so every AQE-chosen broadcast must have a correct
sort-merge/shuffled-hash fallback. This module re-runs the oracle
parity check for the join-heavy queries with auto-broadcast disabled —
explicit ``F.broadcast()`` hints (the deliberate 1-row scalar dims)
still broadcast, which is exactly the production split: hints for
provably-tiny dims, AQE for everything else.

The shuffle.partitions=7 sweep (tests/test_oracle_parity.py) pins
partition-count invariance; this pins strategy invariance.
"""

from __future__ import annotations

import pytest

from hls_stac_parquet_spark.testing import check_query
from tests.conftest import SF0001

# join-heavy representatives whose joins are AQE-chosen (not hinted)
NO_BROADCAST_QUERIES = [
    "q_join_inner_hash",
    "q_join_outer",
    "q_join_range",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tfidf",
    "q_perplexity_filter",
    "q_market_basket",
    "q_golden_record",
    "q_interval_overlap_join",
    # round-4 join-bearing queries: the broadcast-scalar dims must
    # stay correct when the planner falls back to non-broadcast
    "q_sql_text_interface",
    "q_cuped",
    "q_k_anonymity",
]


@pytest.mark.parametrize("name", NO_BROADCAST_QUERIES)
def test_parity_with_autobroadcast_disabled(spark, name):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        r = check_query(spark, SF0001, name)
        assert r.match, f"{name} diverged without auto-broadcast: {r.detail}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )
