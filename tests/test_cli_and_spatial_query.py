"""CLI command tests (reference cli.py parity) + the spatial query
read path over clustered output."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from hls_stac_parquet_spark.cli import main as cli_main
from hls_stac_parquet_spark.plans.spatial_query import bbox_query, read_geoparquet
from tests.fixtures import make_fixtures

DAYS = [dt.date(2025, 10, d) for d in (1, 2, 3)]


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    cmr_dir, _ = make_fixtures(str(base), days=DAYS, granules_per_day=6)
    links = str(base / "links")
    gpq = str(base / "gpq")
    rc = cli_main([
        "cache-daily-stac-json-links", "HLSL30", "2025-10-01", links,
        "--end-date", "2025-10-03", "--protocol", "file",
        "--fixture-dir", cmr_dir,
    ])
    assert rc == 0
    rc = cli_main([
        "write-monthly-stac-geoparquet", "HLSL30", "2025-10", links, gpq,
        "--no-require-complete",
    ])
    assert rc == 0
    return {"links": links, "gpq": gpq, "cmr": cmr_dir, "base": str(base)}


def test_cli_wrote_manifests_and_parquet(pipeline_out):
    assert os.path.exists(
        os.path.join(pipeline_out["links"], "links", "HLSL30_2.0", "2025", "10",
                     "2025-10-01.json")
    )
    assert os.path.isdir(
        os.path.join(pipeline_out["gpq"], "v1", "HLSL30_2.0", "year=2025",
                     "month=10")
    )


def test_cli_backfill_skips_cached_days(pipeline_out, capsys):
    rc = cli_main([
        "backfill", "HLSL30", pipeline_out["links"],
        "--start-date", "2025-10-01", "--end-date", "2025-10-03",
        "--protocol", "file", "--fixture-dir", pipeline_out["cmr"],
    ])
    assert rc == 0
    assert "backfilled 0 manifests" in capsys.readouterr().out


def test_bbox_query_prunes_and_filters(spark, pipeline_out):
    # the 15TWN/15TWM fixtures sit near (-92.3, 46.5..47.4); a bbox
    # around Minnesota must return exactly those tiles
    df = bbox_query(
        spark, pipeline_out["gpq"], "HLSL30_2.0", (-95.0, 45.0, -90.0, 48.0),
        year=2025, month=10,
    )
    tiles = {r.mgrs_tile for r in df.select("mgrs_tile").distinct().collect()}
    assert tiles == {"15TWN", "15TWM"}
    # partition pruning reaches the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # bbox conjuncts reach the parquet scan as pushed filters
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters:")[1]
    assert "bbox_xmin" in pushed


def test_bbox_query_empty_region(spark, pipeline_out):
    df = bbox_query(
        spark, pipeline_out["gpq"], "HLSL30_2.0", (0.0, -10.0, 10.0, 0.0)
    )
    assert df.count() == 0


def test_read_back_clustered_order_within_files(spark, pipeline_out):
    df = read_geoparquet(spark, pipeline_out["gpq"], "HLSL30_2.0")
    assert df.count() > 0
    assert "hilbert_idx" in df.columns


def test_cli_sql_adhoc(capsys):
    from hls_stac_parquet_spark.cli import main as cli_main

    rc = cli_main([
        "sql",
        "SELECT count(*) AS n FROM region",
        "--sf-dir", "/root/testdata/sf0.001",
    ])
    assert rc == 0
    assert "5" in capsys.readouterr().out


def test_cli_run_query_by_name(capsys, tmp_path):
    from hls_stac_parquet_spark.cli import main as cli_main

    out = str(tmp_path / "res")
    rc = cli_main([
        "run-query", "q_distinct",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", out,
    ])
    assert rc == 0
    assert "wrote" in capsys.readouterr().out
    # unknown name is a clean error, not a traceback
    assert cli_main(["run-query", "q_nope"]) == 2
