"""Data-governance / web-curation operators (round 4).

URL canonicalization dedup (the A7 ``urlparse`` capability,
cmr_api.py:101 / write.py:223, generalized into the crawl-dedup
operator every web corpus needs), k-anonymity auditing, CUPED
experiment variance reduction, graph degree distributions, OHLC
time-series bars, and tokenizer fertility — each a full-oracle
``queries()`` entry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hls_stac_parquet_spark.queries.registry import query, t

# --- URL canonicalization ----------------------------------------------------
#
# The messy-URL construction is part of the query (documents carry no
# URL column): deterministic per-doc variants of case, default port,
# utm params, param order, trailing slash, and fragment that all
# canonicalize to the same URL — built with IDENTICAL arithmetic on
# both engines, so the oracle checks the canonicalizer, not the
# synthesizer.

_URL_SQL = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END, '://', "
    "CASE WHEN doc_id % 3 = 0 THEN concat('WWW.', upper(source), '.COM') "
    "ELSE concat('www.', source, '.com') END, "
    "CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END, "
    "'/docs/', CAST(doc_id % 50 AS VARCHAR), "
    "CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END, "
    "CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=feed&a=1' "
    "ELSE '?a=1&b=2' END, "
    "CASE WHEN doc_id % 11 = 0 THEN '#sec' ELSE '' END)"
)

_URL_SPARK = _URL_SQL.replace("AS VARCHAR", "AS STRING")


@query(
    "q_url_canonical_dedup",
    oracle=(
        "WITH u AS (SELECT doc_id, source, " + _URL_SQL + " AS url "
        "  FROM documents WHERE source IS NOT NULL), "
        "parts AS (SELECT doc_id, url, "
        "  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme, "
        "  regexp_replace(lower(regexp_extract(url, "
        "    '^[A-Za-z]+://([^/?#]+)', 1)), ':443$', '') AS host, "
        "  regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path, "
        "  regexp_extract(url, '\\?([^#]*)', 1) AS qs FROM u), "
        "canon AS (SELECT doc_id, url, concat(scheme, '://', host, "
        "  CASE WHEN path IN ('', '/') THEN '/' "
        "       ELSE regexp_replace(path, '/+$', '') END, "
        "  CASE WHEN array_to_string(list_sort(list_filter("
        "    string_split(qs, '&'), "
        "    x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') = '' "
        "  THEN '' ELSE concat('?', array_to_string(list_sort(list_filter("
        "    string_split(qs, '&'), "
        "    x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&')) END"
        "  ) AS canonical_url FROM parts) "
        "SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_docs, "
        "  CAST(count(DISTINCT url) AS BIGINT) AS n_raw_variants, "
        "  CAST(min(doc_id) AS BIGINT) AS survivor_doc "
        "FROM canon GROUP BY canonical_url"
    ),
)
def q_url_canonical_dedup(spark, sf_dir):
    """URL canonicalization + dedup — the crawl-frontier/WARC-dedup
    operator (generalizing the reference's A7 urlparse, cmr_api.py:101,
    write.py:223): lowercase scheme+host, strip the default :443 port,
    drop the fragment, drop utm_* tracking params, sort the remaining
    params, strip trailing slashes — then group by the canonical form
    and keep the min-doc_id survivor.

    Scale shape: the canonicalizer is a pure regexp/HOF projection
    (codegen, zero shuffle); the only shuffle is the final group-by on
    the canonical key — exactly the digest-keyed dedup shuffle of
    q_dedup_exact, so the same plan holds at crawl scale. Portable
    regexes (no lookaround) run identically on Java regex and RE2.
    A NULL-source doc derives no URL and is excluded on BOTH engines
    (Spark's concat propagates the NULL where DuckDB's maps it to ''
    — round-6 key-fuzz sweep 2)."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
    ).selectExpr("doc_id", f"{_URL_SPARK} AS url")
    parts = docs.select(
        "doc_id",
        "url",
        F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1)).alias(
            "scheme"
        ),
        F.regexp_replace(
            F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1)),
            r":443$",
            "",
        ).alias("host"),
        F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1).alias(
            "path"
        ),
        F.regexp_extract("url", r"\?([^#]*)", 1).alias("qs"),
    )
    params = (
        "array_join(array_sort(filter(split(qs, '&'), "
        "x -> x != '' AND NOT startswith(x, 'utm_'))), '&')"
    )
    canon = parts.selectExpr(
        "doc_id",
        "url",
        "concat(scheme, '://', host, "
        "CASE WHEN path IN ('', '/') THEN '/' "
        "     ELSE regexp_replace(path, '/+$', '') END, "
        f"CASE WHEN {params} = '' THEN '' "
        f"     ELSE concat('?', {params}) END) AS canonical_url",
    )
    return canon.groupBy("canonical_url").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("url").alias("n_raw_variants"),
        F.min("doc_id").alias("survivor_doc"),
    )


@query(
    "q_k_anonymity",
    oracle=(
        "WITH qi AS (SELECT c_nationkey, c_mktsegment, "
        "  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band, "
        "  count(*) AS k FROM customer GROUP BY 1, 2, 3), "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer) "
        "SELECT CASE WHEN k = 1 THEN '1 (unique)' "
        "  WHEN k < 5 THEN '2-4' ELSE '5+' END AS k_bucket, "
        "  CAST(count(*) AS BIGINT) AS n_groups, "
        "  CAST(sum(k) AS BIGINT) AS n_rows, "
        "  round(sum(k) / (SELECT n FROM tot), 6) AS row_share "
        "FROM qi GROUP BY 1"
    ),
)
def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit over a quasi-identifier tuple (nation,
    market segment, account-balance band): how many rows sit in
    equivalence classes of size 1 (re-identifiable), 2-4, and 5+ —
    the pre-release privacy gate for sharing training data derived
    from user records.

    Scale shape: one group-by on the QI tuple (the only fact-sized
    shuffle), then the histogram folds the class-size dim (|classes|
    rows) and the total joins as a broadcast 1-row aggregate — the
    fact table is scanned exactly once."""
    cust = t(spark, sf_dir, "customer")
    qi = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(F.count("*").alias("k"))
    total = cust.agg(F.count("*").alias("n"))
    bucket = (
        F.when(F.col("k") == 1, "1 (unique)")
        .when(F.col("k") < 5, "2-4")
        .otherwise("5+")
        .alias("k_bucket")
    )
    return (
        qi.groupBy(bucket)
        .agg(
            F.count("*").alias("n_groups"),
            F.sum("k").alias("n_rows"),
        )
        .join(F.broadcast(total))
        .select(
            "k_bucket",
            "n_groups",
            "n_rows",
            F.round(F.col("n_rows") / F.col("n"), 6).alias("row_share"),
        )
    )


@query(
    "q_cuped",
    oracle=(
        "WITH per_user AS (SELECT user_id, "
        "  coalesce(sum(value) FILTER (ts < TIMESTAMP '2024-01-16'), 0) "
        "    AS x, "
        "  coalesce(sum(value) FILTER (ts >= TIMESTAMP '2024-01-16'), 0) "
        "    AS y FROM events GROUP BY user_id), "
        "arms AS (SELECT user_id % 2 AS arm, x, y FROM per_user), "
        "theta AS (SELECT covar_samp(x, y) / var_samp(x) AS th, "
        "  avg(x) AS mx FROM arms) "
        "SELECT arm, CAST(count(*) AS BIGINT) AS n_users, "
        "  round(avg(y), 6) AS mean_y, "
        "  round(avg(y - (SELECT th FROM theta) * "
        "    (x - (SELECT mx FROM theta))), 6) AS mean_y_cuped, "
        "  round(var_samp(y - (SELECT th FROM theta) * x) "
        "    / var_samp(y), 6) AS var_ratio "
        "FROM arms GROUP BY arm"
    ),
)
def q_cuped(spark, sf_dir):
    """CUPED variance reduction for A/B readouts (Deng et al. 2013):
    per-user pre-period covariate X and post-period metric Y, a
    global theta = cov(X,Y)/var(X), and per-arm means of the adjusted
    metric Y - theta·(X - mean X) plus the achieved variance ratio —
    the standard way to cut experiment runtime on heavy-tailed
    engagement metrics.

    Scale shape: one user-keyed aggregate reduces the fact table;
    theta comes from ONE scan-agg over the per-user table (sufficient
    statistics, 1 row) and joins back as a broadcast scalar — users
    never re-shuffle and the fact table is read once."""
    ev = t(spark, sf_dir, "events")
    split = "TIMESTAMP_NTZ '2024-01-16 00:00:00'"
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.expr(f"CASE WHEN ts < {split} THEN value END")), F.lit(0.0)
        ).alias("x"),
        F.coalesce(
            F.sum(F.expr(f"CASE WHEN ts >= {split} THEN value END")),
            F.lit(0.0),
        ).alias("y"),
    )
    arms = per_user.select(
        (F.col("user_id") % 2).alias("arm"), "x", "y"
    )
    theta = arms.agg(
        (F.covar_samp("x", "y") / F.var_samp("x")).alias("th"),
        F.avg("x").alias("mx"),
    )
    return (
        arms.join(F.broadcast(theta))
        .groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.avg("y"), 6).alias("mean_y"),
            F.round(
                F.avg(
                    F.col("y")
                    - F.col("th") * (F.col("x") - F.col("mx"))
                ),
                6,
            ).alias("mean_y_cuped"),
            F.round(
                F.var_samp(F.col("y") - F.col("th") * F.col("x"))
                / F.var_samp("y"),
                6,
            ).alias("var_ratio"),
        )
    )


@query(
    "q_degree_distribution",
    oracle=(
        "WITH deg AS (SELECT l_partkey, count(DISTINCT l_orderkey) AS d "
        "  FROM lineitem GROUP BY l_partkey), "
        "dist AS (SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_nodes "
        "  FROM deg GROUP BY d) "
        "SELECT CAST(degree AS BIGINT) AS degree, n_nodes, "
        "  round(regr_slope(log10(n_nodes), log10(degree)) OVER (), 6) "
        "    AS loglog_slope "
        "FROM dist"
    ),
)
def q_degree_distribution(spark, sf_dir):
    """Degree distribution of the part↔order bipartite graph plus the
    log-log power-law slope — the first diagnostic run on any graph
    before choosing skew strategy (a slope near -2 to -3 says
    hub-heavy: orient edges / salt hot keys; flat says uniform).

    Scale shape: degree is one distinct-pair aggregate; the
    distribution is a second aggregate over the |V|-row degree dim;
    the regression is a WINDOW over the |distinct degrees|-row
    distribution (an unpartitioned window over a tiny aggregate — the
    registry's documented benign pattern) so the fact table is
    scanned exactly ONCE. A separate fit-aggregate branch would
    recompute the whole dist subtree = a second fact scan
    (tests/test_plan_shapes.py pins the single scan). degree ≥ 1 by
    construction (it is a count), so log10 is always defined."""
    deg = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_orderkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count("*").alias("d"))
    )
    dist = deg.groupBy(F.col("d").alias("degree")).agg(
        F.count("*").alias("n_nodes")
    )
    return dist.select(
        F.col("degree").cast("bigint").alias("degree"),
        "n_nodes",
        F.round(
            F.expr(
                "regr_slope(log10(n_nodes), log10(degree)) "
                "OVER ()"
            ),
            6,
        ).alias("loglog_slope"),
    )


@query(
    "q_ohlc_bars",
    oracle=(
        "WITH ranked AS (SELECT date_trunc('day', ts) AS day, event_type, "
        "  value, "
        "  row_number() OVER (PARTITION BY date_trunc('day', ts), "
        "    event_type ORDER BY ts, event_id) AS rn_a, "
        "  row_number() OVER (PARTITION BY date_trunc('day', ts), "
        "    event_type ORDER BY ts DESC, event_id DESC) AS rn_d "
        "  FROM events WHERE ts IS NOT NULL) "
        "SELECT CAST(day AS TIMESTAMP) AS day, event_type, "
        "  round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open, "
        "  round(max(value), 6) AS high, "
        "  round(min(value), 6) AS low, "
        "  round(max(CASE WHEN rn_d = 1 THEN value END), 6) AS close, "
        "  CAST(count(*) AS BIGINT) AS n_events "
        "FROM ranked GROUP BY day, event_type"
    ),
)
def q_ohlc_bars(spark, sf_dir):
    """Daily OHLC (open/high/low/close) bars per event type — the
    canonical time-series downsampling shape (metrics rollups, price
    candles), with deterministic open/close via (ts, event_id) tie
    order.

    Scale shape: both row_number windows share one (day, type)
    partitioning, so Spark plans a single exchange + sort and reuses
    it (ascending and descending rank come from the same sorted run);
    the group-by then collapses to |days × types| rows. No
    single-partition window anywhere.

    NULL-ts events belong to no daily bar — excluded on BOTH engines
    (round-6 key-fuzz; also sidesteps a DuckDB 1.0.0 optimizer quirk
    where date_trunc('day', ts) is treated as never-NULL, making the
    NULL-day window partition unstable on the oracle side)."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    from pyspark.sql.window import Window

    day = F.date_trunc("day", F.col("ts")).alias("day")
    base = ev.select(day, "event_type", "value", "ts", "event_id")
    w = Window.partitionBy("day", "event_type")
    ranked = base.select(
        "day",
        "event_type",
        "value",
        F.row_number()
        .over(w.orderBy(F.col("ts").asc(), F.col("event_id").asc()))
        .alias("rn_a"),
        F.row_number()
        .over(w.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
    )
    return ranked.groupBy("day", "event_type").agg(
        F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6).alias(
            "open"
        ),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 6).alias(
            "close"
        ),
        F.count("*").alias("n_events"),
    )


@query(
    "q_token_fertility",
    oracle=(
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "  CAST(sum(octet_length(encode(coalesce(text, '')))) AS BIGINT) "
        "    AS n_bytes, "
        "  CAST(sum(len(regexp_extract_all(coalesce(text, ''), "
        "    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS n_tokens, "
        "  round(sum(octet_length(encode(coalesce(text, '')))) "
        "    / greatest(sum(len(regexp_extract_all(coalesce(text, ''), "
        "    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))), 1), 6) "
        "    AS bytes_per_token "
        "FROM documents GROUP BY lang"
    ),
)
def q_token_fertility(spark, sf_dir):
    """Tokenizer fertility by language — bytes per token, the metric
    that decides how a fixed token budget converts into corpus bytes
    per language when planning a pretraining mixture (high fertility
    = the tokenizer fragments that language; budget accordingly).

    Scale shape: per-row byte/token counts run in codegen; one
    |languages|-keyed aggregate is the only shuffle. Uses the same
    portable token regex as q_token_count so the two reports agree."""
    from hls_stac_parquet_spark.functions.text import token_count

    docs = t(spark, sf_dir, "documents").select(
        "lang", F.coalesce("text", F.lit("")).alias("text")
    )
    per = docs.select(
        "lang",
        F.octet_length("text").alias("b"),
        token_count("text").alias("tk"),
    )
    return per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("b").alias("n_bytes"),
        F.sum("tk").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("b") / F.greatest(F.sum("tk"), F.lit(1)), 6
        ).alias("bytes_per_token"),
    )


_SQL_REPORT = """
WITH revenue AS (
  SELECT o_custkey, sum(o_totalprice) AS rev, count(*) AS n_orders
  FROM {orders} GROUP BY o_custkey
)
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(r.rev), 4) AS revenue,
       CAST(sum(r.n_orders) AS BIGINT) AS n_orders,
       round(sum(r.rev) / sum(sum(r.rev)) OVER (), 6) AS revenue_share,
       CAST(rank() OVER (ORDER BY sum(r.rev) DESC) AS INT) AS seg_rank
FROM revenue r JOIN {customer} c ON c.c_custkey = r.o_custkey
GROUP BY c.c_mktsegment
"""


@query(
    "q_sql_text_interface",
    oracle=_SQL_REPORT.format(orders="orders", customer="customer"),
)
def q_sql_text_interface(spark, sf_dir):
    """The textual-SQL entry point: the SAME SQL string runs through
    ``spark.sql`` over registered temp views and through the DuckDB
    oracle — evidencing that the engine's surface is not just the
    DataFrame DSL (every other registry entry) but ANSI SQL text, with
    Catalyst doing the identical plan work (CTE inlining, join
    reordering, window-over-aggregate).

    Scale shape: one custkey-keyed aggregate reduces orders before the
    customer join (AQE broadcasts the |segments|-sized post-agg side
    when small); the share/rank windows run over the 5-row segment
    aggregate, not the fact table."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_sql_orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("_sql_customer")
    return spark.sql(
        _SQL_REPORT.format(orders="_sql_orders", customer="_sql_customer")
    )


@query(
    "q_dp_counts",
    oracle=(
        "WITH agg AS (SELECT source, lang, count(*) AS n "
        "  FROM documents GROUP BY source, lang), "
        "noised AS (SELECT source, lang, n, "
        "  (CAST(concat('0x', substr(md5(concat(coalesce(source, ''), '|', "
        "    coalesce(lang, ''))), 1, 13)) "
        "    AS BIGINT) / 4503599627370496.0) - 0.5 AS u FROM agg) "
        "SELECT source, lang, "
        "  CAST(n + round(-2.0 * sign(u) * ln(1 - 2 * abs(u))) AS BIGINT) "
        "    AS dp_count, "
        "  CAST(round(greatest(CAST(n + round(-2.0 * sign(u) * "
        "    ln(1 - 2 * abs(u))) AS BIGINT), 0) * 1.0, 1) AS DOUBLE) "
        "    AS dp_released "
        "FROM noised"
    ),
)
def q_dp_counts(spark, sf_dir):
    """Differentially-private count release (epsilon = 0.5 per cell,
    sensitivity 1): per-(source, lang) document counts with Laplace
    noise, scale b = 1/epsilon = 2 — the privacy-preserving
    aggregate-release step for sharing corpus composition stats.

    The noise is DETERMINISTIC-by-construction for the oracle: the
    uniform draw is the md5 of the cell key mapped into (-0.5, 0.5)
    (the registry's standard portable-hash trick — 13 hex chars =
    52 bits, exact in a double on both engines), pushed through the
    Laplace inverse CDF  -b·sign(u)·ln(1-2|u|). A production release
    swaps the seeded uniform for a real RNG; the PLUMBING (noise at
    the aggregate, post-processing clamp to ≥0, never noise on raw
    rows) is what the oracle checks.

    Scale shape: noise is applied to the |cells|-row AGGREGATE, never
    the fact table — one group-by shuffle, then pure per-row
    arithmetic in codegen."""
    docs = t(spark, sf_dir, "documents")
    agg = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    # NULL cell keys hash as '' EXPLICITLY on both engines — Spark's
    # concat_ws silently DROPS a NULL arg (and its separator) where
    # DuckDB's concat maps it to '', desynchronizing the seed for
    # NULL-lang cells (round-6 key-fuzz sweep)
    key = F.concat(
        F.coalesce(F.col("source"), F.lit("")),
        F.lit("|"),
        F.coalesce(F.col("lang"), F.lit("")),
    )
    u = (
        F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double")
        / F.lit(4503599627370496.0)
        - 0.5
    ).alias("u")
    noised = agg.select("source", "lang", "n", u)
    lap = F.round(
        F.lit(-2.0) * F.signum("u")
        * F.log(F.lit(1.0) - 2 * F.abs(F.col("u")))
    )
    dp = (F.col("n") + lap).cast("bigint")
    return noised.select(
        "source",
        "lang",
        dp.alias("dp_count"),
        F.round(F.greatest(dp, F.lit(0)) * 1.0, 1).alias("dp_released"),
    )


@query(
    "q_rolling_median",
    oracle=(
        "WITH daily AS (SELECT date_trunc('day', ts) AS day, "
        "  round(sum(value), 4) AS rev FROM events "
        "  WHERE isfinite(value) AND ts IS NOT NULL GROUP BY 1) "
        "SELECT CAST(day AS TIMESTAMP) AS day, rev, "
        "  round(quantile_cont(rev, 0.5) OVER ("
        "    ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) "
        "    AS med7, "
        "  round(abs(rev - quantile_cont(rev, 0.5) OVER ("
        "    ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)), 4) "
        "    AS abs_dev "
        "FROM daily"
    ),
)
def q_rolling_median(spark, sf_dir):
    """Trailing-7-day rolling EXACT median of daily revenue plus the
    absolute deviation from it — the robust-baseline anomaly monitor
    (a rolling mean is dragged by the outlier it is supposed to
    flag; the median is not; non-finite values are excluded on both
    sides — the registry's finite-measurement semantic). Exercises an
    aggregate-as-window with a
    bounded ROWS frame — a window shape nothing else in the registry
    covers (ntile/rank/lag are offset windows; q_moving_avg is a
    mean).

    Scale shape: the window runs over the |days|-sized daily
    AGGREGATE, not the fact table (the single fact shuffle is the
    day group-by); the frame is 7 rows, so per-row state is O(7)
    regardless of corpus size. The unpartitioned ORDER BY over the
    days-sized series is the registry's documented benign pattern.
    NULL-ts events belong to no day — excluded on BOTH engines
    (round-6 key-fuzz discipline: the window ORDER BY day must never
    see a NULL key)."""
    from hls_stac_parquet_spark.queries.registry import finite

    ev = t(spark, sf_dir, "events").filter(
        finite(F.col("value")) & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.round(F.sum("value"), 4).alias("rev")
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("day").rowsBetween(-6, 0)
    med = F.percentile("rev", F.lit(0.5)).over(w)
    return daily.select(
        "day",
        "rev",
        F.round(med, 4).alias("med7"),
        F.round(F.abs(F.col("rev") - med), 4).alias("abs_dev"),
    )
