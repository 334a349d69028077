"""Daily STAC-link manifest sink/source (D2).

The reference writes one JSON array of URLs per (collection, day) at
``links/{collection_id}/{year}/{month:02d}/{date}.json``
(links.py:53-59, constants.py:6-7) and reads a month of them back
with a prefix listing (write.py:152-168). Same layout here — the
path keys become real columns on read, order-insensitive semantics
preserved (the reference's own round-trip test compares as sets,
tests/test_workflow.py:49-51).

``dest`` is a store URL, like the reference's ``from_url(dest)``
(links.py:92-96): a POSIX path, ``file://…``, ``memory://bucket``
(test double), or any scheme registered via
``hls_stac_parquet_spark.store.register_store_scheme``.
"""

from __future__ import annotations

import datetime as dt
import json
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hls_stac_parquet_spark.store import get_store

#: path template (constants.py:6-7)
MANIFEST_PATH_TEMPLATE = "links/{collection_id}/{year}/{month:02d}/{date}.json"


def manifest_key(collection_id: str, date: dt.date) -> str:
    """Store-relative manifest path for one (collection, day)."""
    return MANIFEST_PATH_TEMPLATE.format(
        collection_id=collection_id,
        year=date.year,
        month=date.month,
        date=date.isoformat(),
    )


def manifest_path(dest: str, collection_id: str, date: dt.date) -> str:
    return get_store(dest).full_url(manifest_key(collection_id, date))


def write_manifests(
    df: DataFrame,
    dest: str,
    skip_existing: bool = True,
) -> list[str]:
    """Write one JSON-array manifest per (collection_id, date) group.

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

    Store dispatch: distributed stores (POSIX, real object stores)
    write ON THE EXECUTORS as above. A non-distributed store
    (``memory://`` — the in-process test double) is invisible to
    Spark's worker processes, so the same grouped aggregate is
    collected and written by the driver; the collected rows are one
    (day, urls) pair per group, not fact data.
    """
    import pandas as pd

    store = get_store(dest)

    if not store.distributed:
        rows = (
            df.select("collection_id", "date", "url")
            .groupBy("collection_id", "date")
            .agg(F.sort_array(F.collect_list("url")).alias("urls"))
            .collect()  # one row per (collection, day)
        )
        written = []
        for r in rows:
            key = manifest_key(r.collection_id, r.date)
            if skip_existing and store.exists(key):
                continue
            store.put_bytes(key, json.dumps(list(r.urls)).encode())
            written.append(store.full_url(key))
        return sorted(written)

    # the resolved Store pickles into the tasks (stores carry only
    # config — URL/region/credential callable); resolving by URL
    # inside the task would miss driver-side register_store_scheme
    # registrations (worker processes have a fresh registry)
    task_store = store

    def _write_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        collection_id = pdf["collection_id"].iloc[0]
        date = pdf["date"].iloc[0]
        key = manifest_key(collection_id, date)
        if skip_existing and task_store.exists(key):
            return pd.DataFrame(
                {"path": [task_store.full_url(key)], "written": [False]}
            )
        task_store.put_bytes(
            key, json.dumps(sorted(pdf["url"].tolist())).encode()
        )
        return pd.DataFrame(
            {"path": [task_store.full_url(key)], "written": [True]}
        )

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
    GET loop (write.py:152-168). For a store without a Hadoop
    filesystem (memory://), the prefix listing + GETs run driver-side
    — a month is ≤31 small JSON objects by construction."""
    store = get_store(dest)
    prefix = posixpath.join("links", collection_id, str(year), f"{month:02d}")
    day_re = r"(\d{4})-(\d{2})-(\d{2})\.json$"

    spark_base = store.spark_url(prefix)
    if spark_base is not None:
        raw = spark.read.text(
            posixpath.join(spark_base, "*.json"), wholetext=True
        ).withColumn("path", F.input_file_name())
        day = F.regexp_extract("path", day_re, 3).cast("int")
        return raw.select(
            F.lit(collection_id).alias("collection_id"),
            F.lit(year).alias("year"),
            F.lit(month).alias("month"),
            day.alias("day"),
            F.from_json("value", "array<string>").alias("urls"),
        )

    import re

    rows = []
    for key in store.list(prefix):
        m = re.search(day_re, key)
        if not m:
            continue
        urls = json.loads(store.get_bytes(key).decode())
        rows.append((collection_id, year, month, int(m.group(3)), urls))
    return spark.createDataFrame(
        rows,
        "collection_id string, year int, month int, day int, "
        "urls array<string>",
    )
