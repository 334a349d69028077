"""Additional operator-class queries beyond the core §2.B table:
exact percentiles, statistical aggregates, skew-salted join, as-of
join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hls_stac_parquet_spark.operators.asof import asof_join
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


@query(
    "q_asof_join",
    oracle=(
        "WITH l AS (SELECT event_id, user_id, ts, value FROM events "
        "           WHERE event_type = 'purchase'), "
        "     r AS (SELECT user_id, ts, max(event_id) AS prior_click_id "
        "           FROM events WHERE event_type = 'click' "
        "           GROUP BY user_id, ts) "
        "SELECT l.user_id, l.ts, l.event_id, l.value, "
        "       r.ts AS prior_click_ts, r.prior_click_id "
        "FROM l ASOF LEFT JOIN r "
        "ON l.user_id = r.user_id AND l.ts >= r.ts"
    ),
)
def q_asof_join(spark, sf_dir):
    """Point-in-time attribution: each purchase joined to the latest
    preceding click of the same user (DuckDB `ASOF LEFT JOIN` is the
    oracle). Spark side is operators/asof.py's union-sort-carry-forward
    merge formulation: ONE shuffle on user_id, no range cross-product.
    Right side pre-aggregated to one row per (user_id, ts) so the
    tie-winner is deterministic on both engines."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("prior_click_id"))
    )
    return asof_join(
        purchases, clicks, by=["user_id"], ts_col="ts",
        matched_ts_alias="prior_click_ts",
    )
