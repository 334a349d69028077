"""E1 — daily STAC-link cache (SURVEY.md §3 E1).

Reference flow (links.py:62-119): idempotency HEAD → CMR query with
pushed predicates → paginated scan → per-granule first stac.json link
→ one JSON manifest per (collection, day).

Spark shape: parameter → ``format("cmr")`` scan (predicates pushed
into the source request) → higher-order-function link extraction
(array filter + element_at: **zero shuffle** — the reference's A6
loop becomes a single projected expression) → manifest sink.

The reference runs one Lambda per day (A22/A24); here a date *range*
is one job whose source partitions are days — the control plane
collapses into the plan.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hls_stac_parquet_spark.sinks.manifest import manifest_key, write_manifests
from hls_stac_parquet_spark.sources.cmr import register_cmr_source
from hls_stac_parquet_spark.store import get_store


def extract_stac_json_links(
    granules: DataFrame, protocol: str = "https", url_col: str = "url"
) -> DataFrame:
    """Per granule, the first link href ending ``stac.json`` with the
    requested protocol (cmr_api.py:74-105). Malformed/linkless rows
    drop out via NULL, mirroring the reference's silent skip — but as
    an explicit filter, not an exception swallow.

    Pure higher-order functions: no explode, no groupBy, no shuffle.
    """
    first_match = F.element_at(
        F.filter(
            F.col("links"),
            lambda l: l["href"].isNotNull()
            & l["href"].endswith("stac.json")
            & l["href"].startswith(protocol),
        ),
        1,
    )["href"]
    return (
        granules.withColumn(url_col, first_match)
        .filter(F.col(url_col).isNotNull())
    )


def cache_daily_stac_json_links(
    spark: SparkSession,
    collection_concept_id: str,
    collection_id: str,
    start_date: dt.date,
    dest: str,
    end_date: dt.date | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    protocol: str = "https",
    fixture_dir: str | None = None,
    endpoint: str | None = None,
    skip_existing: bool = True,
) -> list[str]:
    """Cache stac.json link manifests for [start_date, end_date].

    Returns the list of written manifest paths. Idempotent:
    skip_existing drops already-cached days *before* any catalog I/O
    (A9 as a work-unit filter, not a per-key HEAD)."""
    end_date = end_date or start_date
    days = [
        start_date + dt.timedelta(days=i)
        for i in range((end_date - start_date).days + 1)
    ]
    if skip_existing:
        store = get_store(dest)
        days = [
            d for d in days
            if not store.exists(manifest_key(collection_id, d))
        ]
    if not days:
        return []

    register_cmr_source(spark)
    reader = (
        spark.read.format("cmr")
        .option("collection_concept_id", collection_concept_id)
        .option("temporal_start", days[0].isoformat())
        .option("temporal_end", days[-1].isoformat())
    )
    if bbox:
        reader = reader.option("bbox", ",".join(str(v) for v in bbox))
    if fixture_dir:
        reader = reader.option("fixture_dir", fixture_dir)
    if endpoint:
        reader = reader.option("endpoint", endpoint)

    granules = reader.load().filter(
        F.col("collection_concept_id") == collection_concept_id
    )
    links = extract_stac_json_links(granules, protocol=protocol)
    day_rows = links.select(
        F.lit(collection_id).alias("collection_id"),
        F.to_date(F.substring("time_start", 1, 10)).alias("date"),
        "url",
    ).filter(F.col("date").isin(days))
    return write_manifests(day_rows, dest, skip_existing=skip_existing)
