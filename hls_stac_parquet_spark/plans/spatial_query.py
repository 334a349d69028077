"""Spatial query path over the clustered GeoParquet output.

This is WHY the reference Hilbert-sorts before writing
(write.py:204-219): items near each other on the globe land in the
same files/row groups, so a bbox query prunes most of the dataset via
parquet column statistics instead of scanning it.

Two pruning layers, both free at query time:
1. file/row-group skip on the hoisted bbox_* columns (parquet min/max
   stats — effective precisely BECAUSE rows are Hilbert-clustered)
2. the same bbox predicate re-applied row-wise by codegen

``bbox_query`` expresses the standard rectangle-intersection test;
``bbox_query_stats`` reports how much of the dataset the scan
actually touched, so tests (and capacity planning) can assert the
clustering is doing its job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_geoparquet(spark: SparkSession, dest: str, collection_id: str,
                    version: str = "1") -> DataFrame:
    """Read the whole clustered dataset (hive year=/month= partitions
    discovered and pruned by Spark's file index)."""
    import os

    return spark.read.option("basePath", os.path.join(dest, f"v{version}",
                                                      collection_id)).parquet(
        os.path.join(dest, f"v{version}", collection_id)
    )


def bbox_filter(w: float, s: float, e: float, n: float):
    """Rectangle-intersection predicate over the hoisted bbox columns
    (A3's pushed-down spatial filter, now on OUR sink's output).

    Intersection (not containment): item_xmin <= e AND item_xmax >= w
    AND item_ymin <= n AND item_ymax >= s. Each conjunct is a single-
    column range predicate — exactly what parquet stats can prune.
    """
    return (
        (F.col("bbox_xmin") <= e)
        & (F.col("bbox_xmax") >= w)
        & (F.col("bbox_ymin") <= n)
        & (F.col("bbox_ymax") >= s)
    )


def bbox_query(
    spark: SparkSession,
    dest: str,
    collection_id: str,
    bbox: tuple[float, float, float, float],
    year: int | None = None,
    month: int | None = None,
    version: str = "1",
) -> DataFrame:
    """Items intersecting bbox, with optional partition pruning on
    year/month (hive-style directories → PruneFileSourcePartitions)."""
    df = read_geoparquet(spark, dest, collection_id, version)
    if year is not None:
        df = df.filter(F.col("year") == year)
    if month is not None:
        df = df.filter(F.col("month") == month)
    return df.filter(bbox_filter(*bbox))


def scan_stats(df: DataFrame) -> dict:
    """Executed-plan scan metrics: files/rows the query actually read.
    Call AFTER an action on df."""
    plan = df._jdf.queryExecution().executedPlan()
    metrics = {}
    # walk to the FileSourceScanExec and read its metrics
    nodes = [plan]
    while nodes:
        node = nodes.pop()
        name = node.nodeName()
        if "Scan" in name:
            m = node.metrics()
            for key in ("numFiles", "numOutputRows", "filesSize"):
                if m.contains(key):
                    metrics[key] = m.apply(key).value()
        for i in range(node.children().size()):
            nodes.append(node.children().apply(i))
        if hasattr(node, "child") and not node.children().size():
            pass
    return metrics
