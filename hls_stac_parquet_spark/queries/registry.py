"""Registry plumbing for named correctness/bench queries."""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, or None → rows-only check
    bench: bool = True  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, bench: bool = True):
    """Decorator: register a named query with its DuckDB oracle SQL."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table (lazy parquet scan — pruning/pushdown
    happen at the scan, so per-query loads cost nothing extra).

    events.ts is parquet timestamp[us] (isAdjustedToUTC=false) and
    scans as TIMESTAMP_NTZ — naive wall-clock time, the same semantics
    as DuckDB's TIMESTAMP, so oracle parity needs no tz juggling.
    Older generations of the testdata stored TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; ``nanosAsLong`` makes those
    scan as int64, and the branch below rebuilds the same NTZ column
    (ns→µs truncation, matching DuckDB).
    """
    from pyspark.sql import functions as F

    # The caller may hand us a session that was NOT built by our
    # session.get_spark() (the driver builds its own); the conf is
    # runtime-settable, so set it here where the read happens rather
    # than relying on session construction.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
            ),
        )
    return df


def finite(col) -> "Column":  # noqa: F821
    """True iff the double column is finite (not NaN/±Inf).

    The declared dirty-data semantic for float MEASUREMENTS: a
    non-finite value is sensor garbage and is excluded from
    statistics, grids, and similarity math on BOTH engine sides
    (oracle twin: DuckDB ``isfinite(x)``). Spark total ordering puts
    NaN above +Inf, so one comparison covers all three cases — and
    stays inside whole-stage codegen."""
    from pyspark.sql import functions as F

    return F.abs(col) < F.lit(float("inf"))


def pagerank_rounds_sql(iterations: int = 8) -> str:
    """CTE chain ``r0 .. r{iterations}`` computing the fixed-count
    power iteration in DuckDB — the oracle twin of
    operators/graph.py::pagerank, unrolled because DuckDB disallows
    aggregates in recursive terms (legal: the round count is a query
    constant). Expects prior CTEs ``edges(src, dst)``, ``deg(src,
    deg)``, ``nodes(node)``; damping constants written as
    ``1.0 - 0.85`` double arithmetic to mirror the kernel's floats
    bit-for-bit. Returns a string starting with ", r0 AS …"."""
    sql = ", r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes)"
    for k in range(1, iterations + 1):
        sql += (
            f", r{k} AS (SELECT n.node, "
            "(1.0::DOUBLE - 0.85::DOUBLE) + 0.85::DOUBLE * "
            "coalesce(s.s, 0.0::DOUBLE) AS rank "
            "FROM nodes n LEFT JOIN ("
            "  SELECT e.dst AS node, sum(r.rank / d.deg) AS s "
            f"  FROM edges e JOIN deg d USING (src) JOIN r{k - 1} r "
            "  ON r.node = e.src GROUP BY e.dst) s USING (node))"
        )
    return sql


def hits_rounds_sql(iterations: int = 8) -> str:
    """CTE chain ``h0 .. h{iterations}`` / ``a1 .. a{iterations}``
    computing fixed-count HITS with L1 normalization — the oracle
    twin of operators/graph.py::hits, unrolled like
    :func:`pagerank_rounds_sql`. Expects a prior CTE
    ``edges(src, dst)``; raw half-step CTEs are MATERIALIZED because
    each is referenced twice (the value rows and the normalizing
    1-row sum) — without it DuckDB inlines both references and the
    plan doubles per round. Returns a string starting with
    ", h0 AS …"."""
    sql = (
        ", h0 AS (SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS hub "
        "FROM edges)"
    )
    for k in range(1, iterations + 1):
        sql += (
            f", a{k}_raw AS MATERIALIZED ("
            "  SELECT e.dst AS node, sum(h.hub) AS v "
            f"  FROM edges e JOIN h{k - 1} h ON h.node = e.src "
            "  GROUP BY e.dst)"
            f", a{k} AS (SELECT node, "
            f"  v / (SELECT sum(v) FROM a{k}_raw) AS auth FROM a{k}_raw)"
            f", h{k}_raw AS MATERIALIZED ("
            "  SELECT e.src AS node, sum(a.auth) AS v "
            f"  FROM edges e JOIN a{k} a ON a.node = e.dst "
            "  GROUP BY e.src)"
            f", h{k} AS (SELECT node, "
            f"  v / (SELECT sum(v) FROM h{k}_raw) AS hub FROM h{k}_raw)"
        )
    return sql


def cosine_edges_sql(threshold: float) -> str:
    """CTE pair ``pairs(va, vb)`` / ``sym(s, d)``: the exact cosine
    similarity graph over ``embeddings`` — the oracle twin of
    operators/similarity.py::cosine_pairs_above (same double
    arithmetic, same round-to-6 comparison as q_cosine_pairs, which
    is driver-hash-verified) plus the symmetrized edge view the graph
    operators consume.  Returns a fragment starting with "pairs AS …"
    for embedding in a WITH/WITH RECURSIVE header."""
    return (
        "pairs AS ("
        "  SELECT a.vec_id AS va, b.vec_id AS vb"
        "  FROM embeddings a, embeddings b"
        "  WHERE a.vec_id < b.vec_id"
        "    AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
        f"              CAST(b.embedding AS DOUBLE[])), 6) >= {threshold}), "
        "sym AS ("
        "  SELECT va AS s, vb AS d FROM pairs"
        "  UNION SELECT vb AS s, va AS d FROM pairs)"
    )
