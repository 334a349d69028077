"""E2 — monthly GeoParquet compaction (SURVEY.md §3 E2).

Reference flow (write.py:99-245): list month's manifests →
sequential fan-in → completeness gate → driver-side Hilbert sort of
the whole month → semaphore(50) fetch → rustac GeoParquet write.

Spark shape — one DAG, no driver materialization:

    read_manifests (parallel multi-file scan)
      → completeness gate (sequence + anti-join)
      → explode urls → repartition(fan-out) → fetch (mapInPandas
        thread pools) → failure split (dead-letter DF)
      → from_json(explicit STAC schema) → hoist columns → stamp
        collection → MGRS regex → broadcast tile-center dim join
      → Hilbert key → repartitionByRange + sortWithinPartitions
      → GeoParquet sink (executor-side pyarrow, geo footer, zstd-6)

The reference's month-in-memory sort (write.py:219) is the exact
anti-pattern this replaces: its 64 GiB Batch instance ceiling
(hls-batch-stack.ts:262) becomes "add executors".
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hls_stac_parquet_spark.functions.mgrs import mgrs_dim_table
from hls_stac_parquet_spark.functions.spatial import hilbert_index_udf
from hls_stac_parquet_spark.functions.urls import extract_mgrs
from hls_stac_parquet_spark.model import STAC_ITEM_SCHEMA
from hls_stac_parquet_spark.operators.completeness import (
    expected_days,
    require_complete,
)
from hls_stac_parquet_spark.operators.manifests import fan_in_manifests, split_failures
from hls_stac_parquet_spark.sinks.geoparquet import (
    geoparquet_month_dir,
    write_geoparquet,
)
from hls_stac_parquet_spark.sinks.manifest import read_manifests
from hls_stac_parquet_spark.sources.stac_fetch import fetch_stac_items
from hls_stac_parquet_spark.store import get_store


def _month_end(year: int, month: int) -> dt.date:
    nxt = dt.date(year + (month == 12), month % 12 + 1, 1)
    return nxt - dt.timedelta(days=1)


def write_monthly_stac_geoparquet(
    spark: SparkSession,
    collection_id: str,
    year: int,
    month: int,
    links_src: str,
    dest: str,
    origin_date: dt.date | None = None,
    require_complete_links: bool = True,
    fetch_partitions: int | None = None,
    skip_existing: bool = True,
    version: str = "1",
    reference_layout: bool = False,
    target_partitions: int | None = None,
) -> dict:
    """Compact one collection-month of cached links into clustered
    GeoParquet. Returns {written, failed, skipped} counts plus the
    file manifest rows. ``reference_layout=True`` emits the exact
    one-object-per-month reference path (constants.py:8)."""
    store = get_store(dest)
    month_dir = geoparquet_month_dir(
        collection_id, year, month, version, reference_layout
    )
    if skip_existing and any(
        k.endswith(".parquet") for k in store.list(month_dir)
    ):
        return {"skipped": True, "written": 0, "failed": 0, "files": []}

    manifests = read_manifests(spark, links_src, collection_id, year, month)

    if require_complete_links:
        exp = expected_days(
            spark, dt.date(year, month, 1), _month_end(year, month), origin_date
        ).select(F.dayofmonth("day").alias("day"))
        actual = manifests.select("day")
        require_complete(exp, actual, key="day")

    urls = fan_in_manifests(manifests).select("url")
    if fetch_partitions:
        urls = urls.repartition(fetch_partitions)

    fetched = fetch_stac_items(urls)
    ok, dead = split_failures(fetched)
    n_failed = dead.count()  # reference logs failures (write.py:227-228)

    items = ok.withColumn(
        "item", F.from_json("body", STAC_ITEM_SCHEMA)
    ).select("url", "item.*")

    hoisted = (
        items.withColumn("collection", F.lit(collection_id))  # A20 stamp
        .withColumn("mgrs_tile", extract_mgrs("url"))
        .withColumn("datetime", F.to_timestamp(F.col("properties.datetime")))
        .withColumn("eo_cloud_cover", F.col("properties.`eo:cloud_cover`"))
        .withColumn("bbox_xmin", F.element_at("bbox", 1))
        .withColumn("bbox_ymin", F.element_at("bbox", 2))
        .withColumn("bbox_xmax", F.element_at("bbox", 3))
        .withColumn("bbox_ymax", F.element_at("bbox", 4))
        # raw GeoJSON coordinates ride to the sink as-is; the Arrow
        # writer stage encodes WKB batch-wise (geoparquet.py::
        # polygon_coords_to_wkb_array) — no per-row Python in the plan
        .withColumn("geometry", F.col("geometry.coordinates"))
    )

    # tile → center via broadcast dim (A15): UDF runs once per distinct
    # tile, the join is JVM-side
    dim = mgrs_dim_table(spark, hoisted, "mgrs_tile")
    located = hoisted.join(F.broadcast(dim), "mgrs_tile", "left")

    keyed = located.withColumn(
        "hilbert_idx", hilbert_index_udf(F.col("tile_lon"), F.col("tile_lat"))
    ).select(
        "id", "collection", "datetime", "eo_cloud_cover", "mgrs_tile",
        F.col("tile_lon").alias("lon"), F.col("tile_lat").alias("lat"),
        "hilbert_idx", "bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax",
        "geometry", "assets", "url",
    )

    files = write_geoparquet(
        keyed, dest, collection_id, year, month, version=version,
        reference_layout=reference_layout,
        target_partitions=target_partitions,
    ).collect()
    return {
        "skipped": False,
        "written": sum(r.n_rows for r in files),
        "failed": n_failed,
        "files": [r.path for r in files],
    }
