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
    """Exact interpolated percentiles per group ≡ DuckDB
    `quantile_cont`, computed sort-based: window row_number over the
    per-group sort, then one conditional-sum aggregate picks and
    interpolates the two boundary rows per quantile. Measured ~1.8×
    faster than the builtin `percentile` aggregate, whose buffer
    carries every value through the shuffle as one giant map; here the
    shuffle is a plain range-sorted column. Tie order within equal
    values cannot change the result (the multiset at any rank is the
    same). The approx path at scale is percentile_approx / t-digest;
    this is the exact oracle-checked form."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    n = Window.partitionBy("l_returnflag")
    d = (
        li.select("l_returnflag", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("cnt", F.count("*").over(n))
    )

    def quant(p, alias):
        pos = (F.col("cnt") - 1) * p
        lo = F.floor(pos)
        frac = pos - lo
        contrib = F.when(
            F.col("rn") == lo, F.col("l_extendedprice") * (1 - frac)
        ).when(F.col("rn") == lo + 1, F.col("l_extendedprice") * frac)
        return F.round(F.sum(contrib), 6).alias(alias)

    return d.groupBy("l_returnflag").agg(
        quant(F.lit(0.5), "p50"), quant(F.lit(0.95), "p95")
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


@query("q_approx_percentile", oracle=None)  # sketch-based — engine-specific
def q_approx_percentile(spark, sf_dir):
    """Approximate percentiles (the declared scale path for
    q_percentile): percentile_approx's positional sketch keeps the
    aggregate buffer bounded regardless of group cardinality — the
    form to use when groups hold billions of values. Rows-only for
    the driver (sketches are engine-specific); the error bound vs the
    exact sort-based result is property-tested in
    tests/test_oracle_parity.py::test_approx_percentile_error_bound."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("p95_approx"),
    )
