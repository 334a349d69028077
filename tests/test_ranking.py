"""Property + plan tests for the shared distributed global-order
kernel (operators/ranking.py): range-partition + local window +
broadcast prefix offsets must equal the plain unpartitioned window
row for row, and the queries that use it must carry no
single-partition fact-table window in their physical plans.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings, strategies as st

from hls_stac_parquet_spark.operators.ranking import (
    with_global_cumsum,
    with_global_ntile,
    with_global_rank,
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-5, 5), st.integers(0, 3)),
        min_size=1,
        max_size=60,
    )
)
def test_with_global_rank_equals_plain_row_number(spark, rows):
    """Dup-heavy keys: the composed rank must assign the same multiset
    of ranks per key group as a plain row_number (ranks within an
    equal-key group are interchangeable)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "score int, tie int")
    got = with_global_rank(
        df, [F.col("score"), F.col("tie")], "rn"
    ).collect()
    want = df.select(
        "score",
        "tie",
        F.row_number().over(Window.orderBy("score", "tie")).alias("rn"),
    ).collect()

    def bykey(recs):
        d = defaultdict(list)
        for r in recs:
            d[(r["score"], r["tie"])].append(r["rn"])
        return {k: sorted(v) for k, v in d.items()}

    assert bykey(got) == bykey(want)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-100, 100), st.integers(-9, 9)),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],
    )
)
def test_with_global_cumsum_equals_plain_running_sum(spark, rows):
    """Unique order keys (the kernel's contract for ROWS-frame
    cumsums): running totals must match the plain window exactly,
    including several value columns sharing one shuffle."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "k int, v int").withColumn(
        "v2", F.col("v") * 3 - 1
    )
    got = with_global_cumsum(
        df, [F.col("k")], {"cs": "v", "cs2": "v2"}
    ).select("k", "cs", "cs2")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "k", F.sum("v").over(w).alias("cs"), F.sum("v2").over(w).alias("cs2")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-20, 20), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 7),
)
def test_with_global_ntile_equals_plain_ntile(spark, rows, k):
    """The closed-form distributed ntile must reproduce SQL ntile
    bucket-for-bucket, including n < k and dup-heavy keys (ties get a
    unique row-id tiebreak so both sides assign deterministically)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, s, t_) for i, (s, t_) in enumerate(rows)], "rid int, s int, t int"
    )
    order = [F.col("s"), F.col("t"), F.col("rid")]
    got = with_global_ntile(df, order, k, "b").select("rid", "b")
    want = df.select(
        "rid", F.ntile(k).over(Window.orderBy("s", "t", "rid")).alias("b")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-100, 100), st.integers(-9, 9)),
        min_size=1,
        max_size=50,
        unique_by=lambda r: r[0],
    ),
    st.booleans(),
)
def test_with_global_cummax_equals_plain_running_max(spark, rows, inclusive):
    """Running max (inclusive and strictly-previous frames) must match
    the plain window exactly, including the NULL leading edge of the
    exclusive frame."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hls_stac_parquet_spark.operators.ranking import with_global_cummax

    df = spark.createDataFrame(rows, "k int, v int")
    got = with_global_cummax(
        df, [F.col("k")], {"cm": "v"}, inclusive=inclusive
    ).select("k", "cm")
    hi = 0 if inclusive else -1
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, hi)
    want = df.select("k", F.max("v").over(w).alias("cm"))
    assert sorted(
        map(tuple, got.collect()), key=lambda r: (r[0],)
    ) == sorted(map(tuple, want.collect()), key=lambda r: (r[0],))


def test_kernel_empty_input(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([], "k int, v int")
    assert with_global_rank(df, [F.col("k")], "rn").count() == 0
    assert with_global_cumsum(df, [F.col("k")], {"cs": "v"}).count() == 0


def test_rewritten_queries_have_no_fact_scale_global_window(spark):
    """q_pack_sequences / q_ks_drift / q_vocab_growth / q_sort_global /
    q_shuffle_order / q_zipf_slope / q_auc all route their global
    rank/cumsum through the kernel: the plan must range-partition the
    fact relation and the only window partitioned by nothing is the
    #partitions-sized offsets dim (partitioned by _gr_pid upstream)."""
    from hls_stac_parquet_spark.queries import REGISTRY
    from tests.conftest import SF0001

    for name, fact_order_col in [
        ("q_pack_sequences", "doc_id"),
        ("q_ks_drift", "v#"),
        ("q_vocab_growth", "doc_id"),
        ("q_sort_global", "z_key"),
        ("q_shuffle_order", "_h"),
        ("q_zipf_slope", "freq"),
        ("q_auc", "score"),
        ("q_rfm_segments", "recency"),
    ]:
        df = REGISTRY[name].fn(spark, SF0001)
        plan = df._jdf.queryExecution().executedPlan().toString().lower()
        assert "rangepartitioning" in plan, name
        assert "windowspecdefinition(_gr_pid" in plan, name
        # no window spec starts with the fact order column — that
        # would be the unpartitioned single-task window the kernel
        # exists to avoid
        assert (
            f"windowspecdefinition({fact_order_col.rstrip('#')}" not in plan
        ), name
