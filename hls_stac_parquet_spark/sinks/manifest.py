"""Daily STAC-link manifest sink/source (D2).

The reference writes one JSON array of URLs per (collection, day) at
``links/{collection_id}/{year}/{month:02d}/{date}.json``
(links.py:53-59, constants.py:6-7) and reads a month of them back
with a prefix listing (write.py:152-168). Same layout here — the
path keys become real columns on read, order-insensitive semantics
preserved (the reference's own round-trip test compares as sets,
tests/test_workflow.py:49-51).
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hls_stac_parquet_spark.model import MANIFEST_SCHEMA

#: path template (constants.py:6-7)
MANIFEST_PATH_TEMPLATE = "links/{collection_id}/{year}/{month:02d}/{date}.json"


def manifest_path(dest: str, collection_id: str, date: dt.date) -> str:
    return os.path.join(
        dest,
        MANIFEST_PATH_TEMPLATE.format(
            collection_id=collection_id,
            year=date.year,
            month=date.month,
            date=date.isoformat(),
        ),
    )


def write_manifests(
    df: DataFrame,
    dest: str,
    skip_existing: bool = True,
) -> list[str]:
    """Write one JSON-array manifest per (collection_id, date) group,
    ON THE EXECUTORS.

    Input: (collection_id, date, url) rows. One shuffle groups each
    day's URLs onto a single task (``applyInPandas`` per group — the
    same shuffle a collect_list aggregate would pay); that task writes
    its one small JSON object and returns only ``(path, written)``.
    The driver never sees URL payloads — at reference fan-out
    (collections × years of days) a driver-side write loop is a
    serial bottleneck and a driver-memory cap.

    Writes are idempotent (full overwrite per path), so Spark task
    retries are safe (at-least-once write per group).
    skip_existing mirrors links.py:100-103; the existence probe runs
    executor-side against the same store the write targets.
    """
    import pandas as pd

    def _write_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        collection_id = pdf["collection_id"].iloc[0]
        date = pdf["date"].iloc[0]
        path = manifest_path(dest, collection_id, date)
        if skip_existing and os.path.exists(path):
            return pd.DataFrame({"path": [path], "written": [False]})
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(sorted(pdf["url"].tolist()), f)
        return pd.DataFrame({"path": [path], "written": [True]})

    results = (
        df.select("collection_id", "date", "url")
        .groupBy("collection_id", "date")
        .applyInPandas(_write_group, "path string, written boolean")
        .collect()  # one tiny row per (collection, day) — paths only
    )
    return sorted(r.path for r in results if r.written)


def read_manifests(
    spark: SparkSession, dest: str, collection_id: str, year: int, month: int
) -> DataFrame:
    """Read a month of manifests → (collection_id, year, month, day,
    urls) rows. Spark's file listing over the prefix glob is the
    distributed version of the reference's obstore.list + sequential
    GET loop (write.py:152-168)."""
    pattern = os.path.join(dest, "links", collection_id, str(year), f"{month:02d}", "*.json")
    raw = spark.read.text(pattern, wholetext=True).withColumn(
        "path", F.input_file_name()
    )
    day = F.regexp_extract("path", r"(\d{4})-(\d{2})-(\d{2})\.json$", 3).cast("int")
    return raw.select(
        F.lit(collection_id).alias("collection_id"),
        F.lit(year).alias("year"),
        F.lit(month).alias("month"),
        day.alias("day"),
        F.from_json("value", "array<string>").alias("urls"),
    )
