"""Additional operator-class queries beyond the core §2.B table:
exact percentiles, statistical aggregates, skew-salted join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hls_stac_parquet_spark.operators.skew import salted_inner_join
from hls_stac_parquet_spark.queries.registry import query, t


@query(
    "q_percentile",
    oracle=(
        "SELECT l_returnflag, "
        "round(quantile_cont(l_extendedprice, 0.5), 6) AS p50, "
        "round(quantile_cont(l_extendedprice, 0.95), 6) AS p95 "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_percentile(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont`). The approx path at scale is
    percentile_approx / t-digest; this is the exact oracle-checked
    form."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95"),
    )


@query(
    "q_stats_agg",
    oracle=(
        "SELECT l_linestatus, "
        "round(stddev_samp(l_quantity), 6) AS qty_stddev, "
        "round(var_samp(l_quantity), 6) AS qty_var, "
        "round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr "
        "FROM lineitem GROUP BY l_linestatus"
    ),
)
def q_stats_agg(spark, sf_dir):
    """Statistical aggregates (stddev/variance/correlation) — single-
    pass partial-aggregable moments, the right shape at any scale."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
    )


@query(
    "q_join_skew_salted",
    oracle=(
        "SELECT n_name, count(*) AS n_customers "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
    ),
)
def q_join_skew_salted(spark, sf_dir):
    """Skew-salted join — result-identical to the plain equi-join the
    oracle runs (that identity IS the correctness property of
    salting). Left keys spread over 8 deterministic sub-keys, right
    dim replicated 8×."""
    c = t(spark, sf_dir, "customer").withColumnRenamed("c_nationkey", "nationkey")
    n = t(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "nationkey")
    joined = salted_inner_join(c, n, "nationkey", salt=8, salt_source="c_custkey")
    return joined.groupBy("n_name").agg(F.count("*").alias("n_customers"))
