"""Bucketed-table sink: pre-shuffled storage for co-located joins.

The 100 TB pattern the ad-hoc queries can't show: when two fact
tables join on the same key repeatedly (every daily run), paying the
shuffle once at WRITE time — hash-bucketing both tables into the same
bucket count — makes every subsequent join shuffle-free (SortMergeJoin
over co-located buckets, no Exchange).

The reference stores plain per-month objects (``write.py:233-245``);
its monthly job re-reads and re-groups manifests every run — exactly
the repeated-join cost bucketing amortizes.

Spark only honors bucketing through the table catalog
(``saveAsTable``), not path-based ``parquet()`` writes, so these
helpers go through the session's warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) by
    ``bucket_col``. Joins between tables bucketed identically on the
    join key skip both the shuffle and (when sorted) the sort."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    ``spark.read.parquet`` of the files would lose it)."""
    return spark.table(table)
