"""GeoParquet sink: WKB geometry + `geo` footer metadata, hive layout.

The reference hands a list of dicts to rustac, which builds Arrow and
writes one zstd-6 GeoParquet object per collection-month
(write.py:233-245, path template constants.py:8). Spark writes plain
parquet and cannot inject custom footer key-values, so the sink here
is a two-stage Spark-first design:

1. cluster + partition with Spark (range partition on the Hilbert
   key → sortWithinPartitions — the distributed replacement for the
   reference's in-memory month sort), then
2. write each output file *on the executors* with pyarrow via
   ``mapInArrow``, stamping the GeoParquet 1.0 ``geo`` metadata into
   the footer in the same single pass (no post-hoc footer rewrite,
   which would re-copy every byte at 100 TB).

``dest`` is a store URL (``hls_stac_parquet_spark.store.get_store``
— the ``obstore.from_url`` analog, links.py:92-96): POSIX path,
``s3://…`` via a registered factory, or ``memory://`` (test double;
writes route through the driver since Spark worker processes can't
see an in-process store).

Layout: the default keeps Spark's strictly-better-at-scale N
range-partitioned files per month. ``reference_layout=True`` emits
the EXACT reference path contract instead —
``v{version}/{collection_id}/year={year}/month={month}/
{collection_id}-{year}-{month}.parquet`` (constants.py:8, month
unpadded, one object per collection-month) — so a consumer globbing
the reference's names finds ours.

The sink returns a write-manifest DataFrame (path, rows, bbox) — the
observability the reference lacks.
"""

from __future__ import annotations

import json
import posixpath
import struct
import uuid
from typing import Iterator

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from hls_stac_parquet_spark.store import get_store

#: default output path template (N files; constants.py:8 is the
#: 1-file reference form emitted by reference_layout=True)
GEOPARQUET_PATH_TEMPLATE = (
    "v{version}/{collection_id}/year={year}/month={month}/"
    "{collection_id}-{year}-{month}-{part}.parquet"
)

#: the reference's exact path contract (constants.py:8)
REFERENCE_PARQUET_PATH_FORMAT = (
    "v{version}/{collection_id}/year={year}/month={month}/"
    "{collection_id}-{year}-{month}.parquet"
)


def geojson_polygon_to_wkb(coordinates: list) -> bytes:
    """GeoJSON Polygon coordinates → WKB (little-endian, type=3).

    Pure-stdlib encoder — the geometry payload GeoParquet expects.
    """
    rings = coordinates or []
    out = [struct.pack("<BI", 1, 3), struct.pack("<I", len(rings))]
    for ring in rings:
        out.append(struct.pack("<I", len(ring)))
        for pt in ring:
            out.append(struct.pack("<dd", float(pt[0]), float(pt[1])))
    return b"".join(out)


@F.udf(BinaryType())
def wkb_udf(coordinates) -> bytes | None:
    """Column form of the WKB encoder (arrow-optimized Python UDF)."""
    if coordinates is None:
        return None
    return geojson_polygon_to_wkb(coordinates)


def _geo_metadata(geometry_col: str, bbox: list[float] | None) -> bytes:
    meta = {
        "version": "1.0.0",
        "primary_column": geometry_col,
        "columns": {
            geometry_col: {
                "encoding": "WKB",
                "geometry_types": ["Polygon"],
                "crs": None,  # OGC:CRS84 per GeoParquet default
                **({"bbox": bbox} if bbox else {}),
            }
        },
    }
    return json.dumps(meta).encode()


def geoparquet_month_dir(
    collection_id: str,
    year: int,
    month: int,
    version: str = "1",
    reference_layout: bool = False,
) -> str:
    """Store-relative hive directory for one collection-month."""
    month_part = f"{month}" if reference_layout else f"{month:02d}"
    return posixpath.join(
        f"v{version}", collection_id, f"year={year}", f"month={month_part}"
    )


def _stamp_geo_footer(
    table: pa.Table, geometry_col: str
) -> tuple[pa.Table, list[float] | None]:
    """Add the GeoParquet ``geo`` footer metadata; per-file bbox from
    the hoisted bbox columns when present."""
    bbox = None
    if {"bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"} <= set(
        table.column_names
    ):
        import pyarrow.compute as pc

        bbox = [
            pc.min(table["bbox_xmin"]).as_py(),
            pc.min(table["bbox_ymin"]).as_py(),
            pc.max(table["bbox_xmax"]).as_py(),
            pc.max(table["bbox_ymax"]).as_py(),
        ]
    schema = table.schema.with_metadata(
        {**(table.schema.metadata or {}), b"geo": _geo_metadata(geometry_col, bbox)}
    )
    return table.cast(schema), bbox


def write_geoparquet(
    df: DataFrame,
    dest: str,
    collection_id: str,
    year: int,
    month: int,
    version: str = "1",
    geometry_col: str = "geometry",
    sort_col: str = "hilbert_idx",
    compression: str = "zstd",
    compression_level: int = 6,
    target_partitions: int | None = None,
    reference_layout: bool = False,
) -> DataFrame:
    """Write a spatially clustered GeoParquet dataset.

    Range-partitions on ``sort_col`` (total order across files —
    file k's keys all precede file k+1's), sorts within partitions,
    then each executor partition writes its own footer-stamped file.
    zstd level 6 matches the reference (write.py:243).

    ``reference_layout=True`` forces one output object named exactly
    like the reference (constants.py:8). The single file still gets
    the distributed range-partitioned SORT (the expensive part); only
    the final write funnels to one task — choose it for
    reference-consumer compatibility, not throughput.

    Returns the write manifest (one row per file).
    """
    store = get_store(dest)
    if reference_layout:
        target_partitions = 1
    clustered = df.repartitionByRange(
        *([target_partitions] if target_partitions else []), F.col(sort_col)
    ).sortWithinPartitions(sort_col)

    rel_dir = geoparquet_month_dir(
        collection_id, year, month, version, reference_layout
    )
    prefix = (
        f"{collection_id}-{year}-{month}"
        if reference_layout
        else f"{collection_id}-{year}-{month:02d}"
    )

    manifest_schema = (
        "path string, n_rows bigint, xmin double, ymin double, "
        "xmax double, ymax double"
    )

    def _file_key(pid: int) -> str:
        if reference_layout:
            return posixpath.join(rel_dir, f"{prefix}.parquet")
        return posixpath.join(
            rel_dir, f"{prefix}-{pid:05d}-{uuid.uuid4().hex[:8]}.parquet"
        )

    def _manifest_row(path: str, table: pa.Table, bbox) -> dict:
        return {
            "path": [path],
            "n_rows": [table.num_rows],
            "xmin": [bbox[0] if bbox else None],
            "ymin": [bbox[1] if bbox else None],
            "xmax": [bbox[2] if bbox else None],
            "ymax": [bbox[3] if bbox else None],
        }

    if not store.distributed:
        # in-process test store: materialize the (already clustered
        # and sorted) result on the driver and write one object —
        # toArrow preserves partition order, so the total order holds
        table = clustered.toArrow()
        spark = df.sparkSession
        if table.num_rows == 0:
            return spark.createDataFrame([], manifest_schema)
        table, bbox = _stamp_geo_footer(table, geometry_col)
        key = _file_key(0)
        with store.open_output(key) as f:
            pq.write_table(
                table, f,
                compression=compression,
                compression_level=compression_level,
            )
        row = _manifest_row(store.full_url(key), table, bbox)
        return spark.createDataFrame(
            [tuple(v[0] for v in row.values())], manifest_schema
        )

    def write_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        batch_list = list(batches)
        if not batch_list:
            return
        table = pa.Table.from_batches(batch_list)
        if table.num_rows == 0:
            return
        table, bbox = _stamp_geo_footer(table, geometry_col)
        # `store` pickles into the task (config only); resolving the
        # URL here would miss driver-side scheme registrations
        task_store = store
        key = _file_key(pid)
        with task_store.open_output(key) as f:
            pq.write_table(
                table, f,
                compression=compression,
                compression_level=compression_level,
            )
        yield pa.RecordBatch.from_pydict(
            _manifest_row(task_store.full_url(key), table, bbox)
        )

    return clustered.mapInArrow(write_partition, manifest_schema)


def optimize_geoparquet_month(
    spark,
    dest: str,
    collection_id: str,
    year: int,
    month: int,
    version: str = "1",
    target_partitions: int | None = None,
    geometry_col: str = "geometry",
    sort_col: str = "hilbert_idx",
    compression: str = "zstd",
    compression_level: int = 6,
    reference_layout: bool = False,
) -> dict:
    """Compact/re-cluster an already-written collection-month in
    place — the lakehouse ``OPTIMIZE``/small-file-compaction analog
    for the GeoParquet sink: N incremental writes (late-arriving
    days, retries, small appends) accumulate small files; this reads
    the month back, re-runs the range-partitioned Hilbert sort, and
    replaces the files with ``target_partitions`` clustered ones
    (``reference_layout=True`` → exactly one object under the
    reference's path name).

    Write-then-delete ordering makes a crash safe-but-duplicating
    (new files land before old ones are removed; re-running converges
    because the rewrite reads whatever is present) — the same
    at-least-once-then-idempotent discipline as the manifest sink.
    Requires a Spark-readable store (POSIX, or s3 with Hadoop s3a);
    in-process test stores can't feed a distributed re-sort.

    Returns {files_before, files_after, n_rows, manifest}.
    """
    store = get_store(dest)
    rel_dir = geoparquet_month_dir(
        collection_id, year, month, version, reference_layout
    )
    spark_base = store.spark_url(rel_dir)
    if spark_base is None:
        raise ValueError(
            "optimize_geoparquet_month needs a Spark-readable store "
            "(POSIX path or s3a-capable cluster)"
        )
    old_keys = [k for k in store.list(rel_dir) if k.endswith(".parquet")]
    if not old_keys:
        return {"files_before": 0, "files_after": 0, "n_rows": 0,
                "manifest": []}
    df = spark.read.parquet(spark_base)
    manifest = write_geoparquet(
        df,
        dest,
        collection_id,
        year,
        month,
        version=version,
        geometry_col=geometry_col,
        sort_col=sort_col,
        compression=compression,
        compression_level=compression_level,
        target_partitions=target_partitions,
        reference_layout=reference_layout,
    ).collect()
    new_urls = {r.path for r in manifest}
    # remove only the superseded objects (never a freshly written one
    # — reference_layout reuses the deterministic name, so exclude)
    for key in old_keys:
        if store.full_url(key) not in new_urls:
            store.delete(key)
    return {
        "files_before": len(old_keys),
        "files_after": len(new_urls),
        "n_rows": sum(r.n_rows for r in manifest),
        "manifest": manifest,
    }
