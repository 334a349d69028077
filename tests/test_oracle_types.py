"""Registry-wide portable-output-type guard.

Root cause of the round-5/6 driver reds (q_cumulative_distinct,
q_kaplan_meier): DuckDB types an uncast windowed `sum()` over an
integer column as HUGEINT (int128). HUGEINT has no lossless pandas or
Arrow mapping the driver's hasher agrees with Spark on — pandas
canonicalizes it as float64 (`15` -> `15.0`), Arrow as decimal128 —
so a value hash mismatches Spark's long while row counts and
name-based schema checks pass.

This test closes the class for good: every full oracle's result
schema, resolved by DuckDB's binder (``DESCRIBE <sql>`` — type
resolution only, no execution), must emit exclusively types that are
proven driver-portable. New oracle sneaks in a HUGEINT (or DECIMAL,
or any other DuckDB-only type) -> this fails locally long before the
driver window reaches it. Fix is always the same: CAST the offending
expression in the oracle AND keep the Spark side the matching type.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from hls_stac_parquet_spark.queries import REGISTRY
from hls_stac_parquet_spark.testing import duckdb_conn

SF0001 = "/root/testdata/sf0.001"

# Types the driver's pandas-based canonicalizer round-trips exactly
# against Spark's (223 ever-green driver rows emit only these).
PORTABLE = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "DATE",
    "TIMESTAMP",
    "VARCHAR",
    "BOOLEAN",
}

FULL_ORACLES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(SF0001):
        pytest.skip("sf0.001 testdata missing")
    c = duckdb_conn(SF0001)
    yield c
    c.close()


@pytest.mark.parametrize("name", FULL_ORACLES)
def test_oracle_output_types_are_portable(con, name):
    sql = REGISTRY[name].oracle
    # DESCRIBE binds and resolves the plan without executing it, so
    # this sweep stays cheap even for the recursive-CTE oracles.
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if typ.split("(")[0].upper() not in PORTABLE
    ]
    assert not bad, (
        f"{name}: oracle emits non-portable DuckDB type(s) {bad}; "
        "CAST them in the oracle SQL (HUGEINT/DECIMAL canonicalize "
        "as float64/decimal128 in the driver hasher and red the query "
        "even when values are identical)"
    )
