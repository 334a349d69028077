"""The rest of the TPC-H suite over the driver's TPC-H-ish tables.

Q3/Q5/Q7/Q18 live in relational.py (round 1); this module completes
the suite — every remaining query shape re-expressed over the columns
the testdata actually has. Where the official schema has columns the
testdata lacks (partsupp, l_shipmode, l_commitdate/l_receiptdate,
p_container, c_phone) the query is *adapted*: the join/subquery/agg
SHAPE is preserved (that's what exercises the planner) and the
predicate is rewritten onto existing columns, noted per query.

Scale posture (same rules as relational.py): dimension tables
(region/nation/supplier/part at their natural sizes) broadcast; fact-
fact joins shuffle on their keys with AQE deciding the physical
strategy; every date/brand/size predicate is a plain column
comparison so it reaches the parquet scan as a PushedFilter; all
money aggregates round once, at the end, never mid-plan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hls_stac_parquet_spark.queries.registry import query, t


@query(
    "q_tpch_q1",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
        "round(avg(l_quantity), 2) AS avg_qty, "
        "round(avg(l_extendedprice), 2) AS avg_price, "
        "round(avg(l_discount), 4) AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
)
def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 (pricing summary): the canonical scan→partial-agg→
    final-agg pipeline. Six aggregates over two grouping columns with
    6 distinct groups — partial aggregation collapses virtually all
    rows map-side, so the shuffle carries ~6 rows per task no matter
    the input size. The shape every 100 TB rollup wants."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-09-01")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "q_tpch_q2",
    oracle=(
        "WITH offers AS ("
        "  SELECT l_partkey, l_suppkey, "
        "         min(l_extendedprice / l_quantity) AS unit_price "
        "  FROM lineitem GROUP BY l_partkey, l_suppkey), "
        "best AS ("
        "  SELECT l_partkey AS b_partkey, min(unit_price) AS best_price "
        "  FROM offers GROUP BY l_partkey) "
        "SELECT s_acctbal, s_name, n_name, p_partkey, p_type, "
        "       round(best_price, 2) AS best_unit_price "
        "FROM offers JOIN best ON l_partkey = b_partkey "
        "                      AND unit_price = best_price "
        "JOIN part ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_size = 15 AND p_type = 'LARGE' "
    ),
)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 (min-cost supplier), adapted: the testdata has no
    partsupp, so supplier offers are derived from lineitem unit
    prices (min l_extendedprice/l_quantity per part+supplier). The
    Q2 SHAPE is intact: per-group min, join back on the min to keep
    the argmin rows, then decorate through supplier→nation dims.
    The min-equality join uses raw doubles (IEEE division is
    deterministic, min is order-independent) — rounding happens only
    on the displayed column. The selective part filter is pushed
    below the aggregation as a broadcast semi-join, so lineitem is
    pruned to the qualifying parts BEFORE the first shuffle — per-part
    minima are unaffected by dropping other parts, and at scale this
    cuts the aggregated volume by the part-filter selectivity."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")),
        F.col("p_partkey") == F.col("l_partkey"),
        "left_semi",
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    best = offers.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_price").alias("best_price")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_price") == F.col("best_price")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("best_price", 2).alias("best_unit_price"),
        )
    )


@query(
    "q_tpch_q4",
    oracle=(
        "SELECT o_orderpriority, count(*) AS order_count "
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-04-01' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        "            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) "
        "GROUP BY o_orderpriority"
    ),
)
def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 (order priority checking), adapted: the official
    EXISTS predicate is l_commitdate < l_receiptdate (columns the
    testdata lacks); here it's l_shipdate > o_orderdate — same
    correlated-EXISTS shape, expressed as a LEFT SEMI join so the
    probe side never duplicates orders. The date filter prunes the
    orders scan before the join."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q_tpch_q6",
    oracle=(
        "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure scan+filter+
    single global agg — every predicate is a PushedFilter, zero
    shuffle beyond the final single-row reduce. The query that
    measures raw scan throughput."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q_tpch_q8",
    oracle=(
        "SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, "
        "round(sum(CASE WHEN sn.n_name = 'NATION_3' "
        "              THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "      / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share "
        "FROM lineitem "
        "JOIN part ON p_partkey = l_partkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation cn ON cn.n_nationkey = c_nationkey "
        "JOIN region ON r_regionkey = cn.n_regionkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation sn ON sn.n_nationkey = s_nationkey "
        "WHERE r_name = 'ASIA' AND p_type = 'PROMO' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "GROUP BY o_year"
    ),
)
def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share): the suite's widest join —
    eight tables, with nation joined TWICE under different roles
    (customer's nation filters by region; supplier's nation feeds the
    CASE numerator). Both nation sides and region/part/supplier
    broadcast; only orders⋈lineitem shuffles. The conditional-
    aggregate ratio is one pass — no self-join of the two sums."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("cn_region"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("sn_name") == "NATION_3", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q_tpch_q9",
    oracle=(
        "SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, "
        "round(sum(l_extendedprice * (1 - l_discount)), 4) AS profit "
        "FROM lineitem "
        "JOIN part ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON n_nationkey = s_nationkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "WHERE p_name LIKE '%widget%' "
        "GROUP BY n_name, year(o_orderdate)"
    ),
)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 (product-type profit), adapted: no partsupp means no
    ps_supplycost, so profit is gross revenue rather than revenue
    minus supply cost — the LIKE-driven part filter, the supplier→
    nation rollup, and the (nation, year) grouping are the Q9 shape.
    part/supplier/nation broadcast; lineitem⋈orders is the only
    shuffle. Profit rounds to 4 decimals, not 2: the true sums are
    exact multiples of 0.0001, which sit ON the .xx5 half-boundary
    of a 2-decimal round — engines summing in different orders then
    disagree by a cent (observed at sf0.01); at 4 decimals every
    boundary is 5e-5 away from any true value."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("profit")
        )
    )


@query(
    "q_tpch_q10",
    oracle=(
        "SELECT c_custkey, c_name, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "c_acctbal, n_name "
        "FROM customer "
        "JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN nation ON n_nationkey = c_nationkey "
        "WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-04-01' "
        "AND l_returnflag = 'R' "
        "GROUP BY c_custkey, c_name, c_acctbal, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned items): selective fact join + top-20 by
    aggregate. Both the quarter filter and the returnflag filter are
    PushedFilters; nation broadcasts; the final ORDER BY ... LIMIT is
    a TakeOrdered, never a global sort. c_custkey tiebreak makes the
    top-20 deterministic for the oracle."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q11",
    oracle=(
        "WITH v AS ("
        "  SELECT l_partkey, sum(l_extendedprice * l_quantity) AS val "
        "  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
        "  JOIN nation ON n_nationkey = s_nationkey "
        "  WHERE n_name = 'NATION_7' GROUP BY l_partkey) "
        "SELECT l_partkey, round(val, 2) AS val "
        "FROM v WHERE val > (SELECT avg(val) * 1.5 FROM v)"
    ),
)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock), adapted: partsupp value
    (ps_supplycost*ps_availqty) becomes lineitem traffic value
    (price*qty) for one nation's suppliers — preserving Q11's
    distinctive shape: aggregate, then filter groups against a
    scalar subquery over the SAME aggregate. The per-part aggregate
    is computed once and reused for both the threshold and the
    output (no second scan); the one-row threshold cross-joins in as
    a broadcast."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    v = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("val"))
    )
    thr = v.agg((F.avg("val") * F.lit(1.5)).alias("thr"))
    return (
        v.join(F.broadcast(thr))
        .filter(F.col("val") > F.col("thr"))
        .select("l_partkey", F.round("val", 2).alias("val"))
    )


@query(
    "q_tpch_q12",
    oracle=(
        "SELECT l_linestatus, "
        "count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) "
        "  AS high_line_count, "
        "count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) "
        "  AS low_line_count "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY "
        "AND l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "GROUP BY l_linestatus"
    ),
)
def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping modes / priority), adapted: no
    l_shipmode or commit/receipt dates, so "late" is shipdate ≥ 60
    days after order date and the grouping key is l_linestatus —
    keeping Q12's signature conditional-count split by priority
    class. The year filter is a PushedFilter; the late predicate is
    a join-side comparison (can't push — it spans both tables), kept
    in the join condition so rows drop before the aggregate."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") >= F.expr("o_orderdate + INTERVAL 60 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q13",
    oracle=(
        "WITH c_orders AS ("
        "  SELECT c_custkey, count(o_orderkey) AS c_count "
        "  FROM customer LEFT JOIN orders "
        "    ON o_custkey = c_custkey AND o_orderpriority <> '5-LOW' "
        "  GROUP BY c_custkey) "
        "SELECT c_count, count(*) AS custdist "
        "FROM c_orders GROUP BY c_count"
    ),
)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer distribution): LEFT OUTER join with an
    extra join-side predicate (official: comment NOT LIKE; adapted:
    priority <> '5-LOW'), then a two-level aggregate — count orders
    per customer INCLUDING zero-order customers, then histogram the
    counts. count(o_orderkey) (not count(*)) is what makes unmatched
    customers count as 0."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q_tpch_q14",
    oracle=(
        "SELECT round(100.0 * "
        "sum(CASE WHEN p_type = 'PROMO' "
        "    THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "/ sum(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-09-01' "
        "AND l_shipdate < TIMESTAMP '1997-10-01'"
    ),
)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional-aggregate ratio in
    one pass over a month of lineitem joined to broadcast part. The
    month filter reaches the scan; no second pass for the
    denominator."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                2,
            ).alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q15",
    oracle=(
        "WITH revenue AS ("
        "  SELECT l_suppkey AS supplier_no, "
        "         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue "
        "  FROM lineitem "
        "  WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "  AND l_shipdate < TIMESTAMP '1997-04-01' "
        "  GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_revenue "
        "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
        "WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)"
    ),
)
def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): aggregate-then-argmax. The revenue
    aggregate is computed once; the max arrives as a broadcast
    one-row join rather than a window over the whole aggregate (same
    result, no sort). Revenue is rounded BEFORE the max comparison on
    both sides so the equality is on identical 2-decimal doubles."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q_tpch_q16",
    oracle=(
        "SELECT p_brand, p_type, p_size, "
        "count(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand <> 'Brand#4' "
        "AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29) "
        "AND l_suppkey NOT IN "
        "  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size"
    ),
)
def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 (supplier-part relationships), adapted: partsupp →
    distinct (part, supplier) pairs observed in lineitem, and the
    complaint-supplier exclusion becomes a negative-balance
    exclusion. Shape preserved: NOT IN subquery (anti-join against a
    broadcast dim), IN-list + <> filters pushed to the part scan,
    COUNT(DISTINCT) over the surviving pairs."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q17",
    oracle=(
        "SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand = 'Brand#4' "
        "AND l_quantity < ("
        "  SELECT 0.2 * avg(l_quantity) FROM lineitem l2 "
        "  WHERE l2.l_partkey = lineitem.l_partkey)"
    ),
)
def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): correlated scalar
    subquery (per-part average) de-correlated into an aggregate +
    equi-join — the standard Catalyst rewrite, done explicitly. The
    per-part threshold is computed only over the brand's parts
    (semantically identical: the correlation key is the part, and
    brand is a part attribute), keeping the threshold build tiny and
    broadcastable."""
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")),
        F.col("p_partkey") == F.col("l_partkey"),
        "left_semi",
    )
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(thr), F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q_tpch_q19",
    oracle=(
        "SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5 "
        "       AND l_quantity BETWEEN 1 AND 11) "
        "OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 10 "
        "    AND l_quantity BETWEEN 10 AND 20) "
        "OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 15 "
        "    AND l_quantity BETWEEN 20 AND 30)"
    ),
)
def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): disjunctive multi-table
    predicate, adapted from container/shipmode to brand/size/qty.
    Catalyst extracts the common-conjunct part filter
    (brand ∈ {...}) below the join while the cross-table OR stays in
    the join condition — the query that tests predicate
    decomposition."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q_tpch_q20",
    oracle=(
        "SELECT s_suppkey, s_name "
        "FROM supplier JOIN nation ON n_nationkey = s_nationkey "
        "WHERE n_name = 'NATION_12' "
        "AND s_suppkey IN ("
        "  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey "
        "  WHERE p_name LIKE 'red%' "
        "  AND l_shipdate >= TIMESTAMP '1997-01-01' "
        "  AND l_shipdate < TIMESTAMP '1998-01-01' "
        "  GROUP BY l_suppkey HAVING sum(l_quantity) > 100)"
    ),
)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 (part promotion), adapted: availability (partsupp)
    becomes shipped volume — suppliers in one nation who moved >100
    units of 'red%' parts in a year. Shape preserved: IN-subquery
    with its own join+HAVING, executed as semi-join against the
    aggregated inner side; part broadcast into lineitem; the
    supplier⋈nation outer side is dim-sized."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_12")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    movers = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
    )
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(movers, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q_tpch_q21",
    oracle=(
        "WITH late AS ("
        "  SELECT l_orderkey, l_suppkey "
        "  FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
        "  WHERE o_orderstatus = 'F' "
        "  AND l_shipdate > o_orderdate + INTERVAL 60 DAY), "
        "per_order AS ("
        "  SELECT l_orderkey AS po_orderkey, "
        "         count(DISTINCT l_suppkey) AS n_supp "
        "  FROM lineitem GROUP BY l_orderkey), "
        "late_per_order AS ("
        "  SELECT l_orderkey AS lo_orderkey, "
        "         count(DISTINCT l_suppkey) AS n_late_supp "
        "  FROM late GROUP BY l_orderkey) "
        "SELECT s_name, count(*) AS numwait "
        "FROM late "
        "JOIN per_order ON po_orderkey = l_orderkey "
        "JOIN late_per_order ON lo_orderkey = l_orderkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON n_nationkey = s_nationkey "
        "WHERE n_name = 'NATION_5' AND n_supp > 1 AND n_late_supp = 1 "
        "GROUP BY s_name"
    ),
)
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting), adapted:
    "late" is shipdate > orderdate+60d (no receipt/commit dates).
    The official EXISTS (another supplier on the order) + NOT EXISTS
    (no OTHER supplier late) pair is de-correlated into per-order
    distinct-supplier counts — n_supp > 1 gives the EXISTS,
    n_late_supp = 1 (the late supplier itself) gives the NOT EXISTS.
    Both counts come from ONE window pass over the order-keyed join
    output (orders of a key fit a window trivially — ≤7 lines/order),
    so the whole query is a single l_orderkey shuffle-join + an
    in-partition sort, replacing the two aggregate shuffles + two
    join-backs of the naive de-correlation."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    j = li.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    j = j.withColumn(
        "is_late", F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")
    )
    w = Window.partitionBy("l_orderkey")
    j = j.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        # collect_set skips NULLs → distinct suppliers among late lines
        "n_late_supp",
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
        ),
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        j.filter(
            F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q_tpch_q22",
    oracle=(
        "SELECT c_nationkey AS cntrycode, count(*) AS numcust, "
        "round(sum(c_acctbal), 2) AS totacctbal "
        "FROM customer "
        "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer "
        "                   WHERE c_acctbal > 0.0) "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "                AND o_orderdate >= TIMESTAMP '2000-01-01') "
        "GROUP BY c_nationkey"
    ),
)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity), adapted: the phone-
    prefix country code becomes c_nationkey (no c_phone column).
    Shape preserved: uncorrelated scalar subquery (average positive
    balance, broadcast as a one-row join) + NOT EXISTS anti-join
    against orders + final per-country rollup. "Never ordered"
    becomes "no order since 2000" — every customer in this data has
    SOME lifetime order, so the official predicate would select
    nothing."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
