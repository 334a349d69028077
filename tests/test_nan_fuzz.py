"""Non-finite-float parity: the oracle sweep re-run on a NaN/±Inf-
injected copy of the float columns (events.value, embedding
components) — the dirty-data axis after NULL/unicode/row-order/EMPTY/
skew. 100 TB telemetry contains non-finite floats, and the engines
disagree about them in two ways the first sweep surfaced (12/256):

- DuckDB RAISES where Spark propagates: variance/stddev on ±Inf
  ("out of range"), CAST(nan AS BIGINT) ("conversion error"),
  timestamp + Inf seconds ("datetime overflow").
- Silent value divergence: NaN ranking in top-k (q_cosine_topk),
  NaN binning (q_psi_drift, q_calibration_bins), NaN slopes
  (q_theil_sen).

The DECLARED semantic (queries/registry.py::finite): a non-finite
float MEASUREMENT is sensor garbage and is excluded from statistics,
grids, ranking, and similarity math on BOTH engine sides
(``isfinite(x)`` in the oracle, ``abs(x) < Inf`` in Spark — Spark's
total order puts NaN above +Inf, so one codegen'd comparison covers
all three cases). Clean-data results are unchanged (every value is
finite there), which the main parity sweep pins.
"""

from __future__ import annotations

import duckdb
import pytest

from hls_stac_parquet_spark.testing import check_query
from tests.conftest import SF0001

# every query that failed the first NaN/Inf sweep, now declaring the
# finite-measurement semantic on both sides (plus q_cosine_pairs as
# the agreeing-by-construction control)
NAN_QUERIES = [
    "q_hilbert_key",
    "q_not_in_nulls",
    "q_interval_overlap_join",
    "q_zscore_outliers",
    "q_autocorr_lag1",
    "q_welch_ttest",
    "q_linreg_by_group",
    "q_calibration_bins",
    "q_psi_drift",
    "q_theil_sen",
    "q_auc",
    "q_cosine_topk",
    "q_embedding_dim_stats",
    "q_cosine_pairs",
    "q_int8_quantize",
    "q_rolling_median",
]


@pytest.fixture(scope="module")
def nan_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nanfuzz"))
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT event_id, ts, user_id, event_type,
          CASE WHEN event_id % 29 = 3 THEN 'nan'::DOUBLE
               WHEN event_id % 31 = 5 THEN 'inf'::DOUBLE
               WHEN event_id % 37 = 7 THEN '-inf'::DOUBLE
               ELSE value END AS value, props
         FROM read_parquet('{SF0001}/events.parquet'))
        TO '{out}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT vec_id,
          CASE WHEN vec_id % 23 = 4 THEN
            list_transform(embedding,
                           x -> CASE WHEN x < 0 THEN 'nan'::FLOAT ELSE x END)
          ELSE embedding END AS embedding, label
         FROM read_parquet('{SF0001}/embeddings.parquet'))
        TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "documents"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF0001}/{tbl}.parquet')) "
            f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    return out


@pytest.mark.parametrize("name", NAN_QUERIES)
def test_parity_on_nonfinite_floats(spark, nan_dir, name):
    r = check_query(spark, nan_dir, name)
    assert r.match, f"{name} diverged on NaN/Inf data: {r.detail}"


def test_nan_dir_actually_has_nonfinite(nan_dir):
    con = duckdb.connect()
    n_nan, n_inf = con.execute(
        "SELECT count(*) FILTER (isnan(value)), "
        "count(*) FILTER (isinf(value)) "
        f"FROM read_parquet('{nan_dir}/events.parquet')"
    ).fetchone()
    assert n_nan > 0 and n_inf > 0
    n_vec = con.execute(
        "SELECT count(*) FROM "
        f"read_parquet('{nan_dir}/embeddings.parquet') "
        "WHERE len(list_filter(embedding, x -> isnan(x))) > 0"
    ).fetchone()[0]
    assert n_vec > 0
