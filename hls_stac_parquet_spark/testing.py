"""Oracle-parity harness mirroring the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, sorted column names, and
an order-insensitive canonicalized value multiset — deliberately
stricter than necessary so a pass here predicts a pass in
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from dataclasses import dataclass

import duckdb

from hls_stac_parquet_spark.session import TABLES


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr: the driver hashes raw values, so any engine
        # divergence must be eliminated by in-query rounding, not
        # papered over here. Only -0.0 is canonicalized.
        return repr(v + 0.0 if v != 0 else 0.0)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return repr(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    """Order-insensitive canonical form: per row, values ordered by
    column name, rendered, then the whole multiset sorted."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_canon_value(r[i]) for i in order) for r in rows)


@dataclass
class ParityResult:
    name: str
    spark_rows: int
    oracle_rows: int | None
    match: bool
    detail: str = ""


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def check_query(spark, sf_dir: str, name: str) -> ParityResult:
    from hls_stac_parquet_spark.queries import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = list(sdf.columns)

    if spec.oracle is not None:
        # The driver canonicalizes via pandas sort_values, which throws
        # "unhashable type: 'list'" on array/map columns (observed round
        # 1 on q_collect_list_group). Flag those here so a local pass
        # predicts a driver pass.
        from pyspark.sql.types import ArrayType, MapType

        bad = [
            f.name
            for f in sdf.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType))
        ]
        if bad:
            return ParityResult(
                name, -1, None, False,
                f"array/map output columns break the driver canonicalizer: {bad}",
            )

    s_rows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        return ParityResult(name, len(s_rows), None, True, "rows-only")

    con = duckdb_conn(sf_dir)
    res = con.execute(spec.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()

    if sorted(s_cols) != sorted(o_cols):
        return ParityResult(
            name, len(s_rows), len(o_rows), False,
            f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
        )
    if len(s_rows) != len(o_rows):
        return ParityResult(
            name, len(s_rows), len(o_rows), False,
            f"row count mismatch: {len(s_rows)} vs {len(o_rows)}",
        )
    s_canon = canonical_rows(s_cols, s_rows)
    o_canon = canonical_rows(o_cols, o_rows)
    if s_canon != o_canon:
        diff = next(
            (i for i, (a, b) in enumerate(zip(s_canon, o_canon)) if a != b), -1
        )
        return ParityResult(
            name, len(s_rows), len(o_rows), False,
            f"value mismatch at sorted row {diff}: "
            f"spark={s_canon[diff][:200]!r} oracle={o_canon[diff][:200]!r}",
        )
    return ParityResult(name, len(s_rows), len(o_rows), True)
