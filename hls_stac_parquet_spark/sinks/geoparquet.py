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
    """Column form of the WKB encoder (arrow-optimized Python UDF).

    Kept for ad-hoc column use; the E2 write path no longer calls it —
    :func:`write_geoparquet` encodes coordinates batch-wise inside its
    Arrow writer stage (:func:`polygon_coords_to_wkb_array`), so the
    plan carries no per-row Python stage."""
    if coordinates is None:
        return None
    return geojson_polygon_to_wkb(coordinates)


def polygon_coords_to_wkb_array(coords) -> pa.Array:
    """Vectorized GeoJSON-Polygon-coordinates → WKB over an Arrow
    column (``list<list<list<double>>>``) — numpy scatter over the
    list offsets, no per-row Python. Output is byte-identical to
    :func:`geojson_polygon_to_wkb` per row (property-tested); nulls
    stay null. Ragged positions (altitude etc.) fall back to the
    per-row encoder."""
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(coords, pa.ChunkedArray):
        coords = coords.combine_chunks()
    n = len(coords)
    if n == 0:
        return pa.array([], type=pa.binary())
    valid = (
        np.ones(n, dtype=bool)
        if coords.null_count == 0
        else np.asarray(coords.is_valid())
    )
    ring_counts = np.asarray(
        pc.fill_null(pc.list_value_length(coords), 0), dtype=np.int64
    )
    rings = pc.list_flatten(coords)
    pt_counts = np.asarray(
        pc.fill_null(pc.list_value_length(rings), 0), dtype=np.int64
    )
    pts = pc.list_flatten(rings)
    pos_sizes = np.asarray(
        pc.fill_null(pc.list_value_length(pts), 0), dtype=np.int64
    )
    if len(pos_sizes) and not (pos_sizes == 2).all():
        return pa.array(
            [
                None if c is None else geojson_polygon_to_wkb(c)
                for c in coords.to_pylist()
            ],
            type=pa.binary(),
        )
    flat = np.asarray(pc.list_flatten(pts), dtype=np.float64)

    total_rings = len(pt_counts)
    ring_off = np.concatenate(([0], np.cumsum(ring_counts)))
    cum_pts = np.concatenate(([0], np.cumsum(pt_counts)))
    pts_per_poly = cum_pts[ring_off[1:]] - cum_pts[ring_off[:-1]]

    sizes = np.where(valid, 9 + 4 * ring_counts + 16 * pts_per_poly, 0)
    poly_start = np.concatenate(([0], np.cumsum(sizes)))
    out = np.zeros(int(poly_start[-1]), dtype=np.uint8)

    # polygon headers: byte order 1, uint32 type 3, uint32 nrings
    starts = poly_start[:-1][valid]
    out[starts] = 1
    out[starts + 1] = 3
    rc_bytes = ring_counts[valid].astype("<u4").view(np.uint8).reshape(-1, 4)
    for k in range(4):
        out[starts + 5 + k] = rc_bytes[:, k]

    if total_rings:
        # ring headers: uint32 point count, positioned after the
        # polygon header + preceding rings' headers and point data
        poly_of_ring = np.repeat(np.arange(n), ring_counts)
        ring_idx_within = np.arange(total_rings) - ring_off[poly_of_ring]
        pts_before = cum_pts[:-1] - cum_pts[ring_off[poly_of_ring]]
        ring_pos = (
            poly_start[poly_of_ring]
            + 9
            + 4 * ring_idx_within
            + 16 * pts_before
        )
        pc_bytes = pt_counts.astype("<u4").view(np.uint8).reshape(-1, 4)
        for k in range(4):
            out[ring_pos + k] = pc_bytes[:, k]

        total_pts = int(cum_pts[-1])
        if total_pts:
            # point data: 16 bytes (x,y little-endian f8) per point,
            # contiguous per ring — one byte-level scatter
            dst_pt = np.repeat(ring_pos + 4, pt_counts) + 16 * (
                np.arange(total_pts) - np.repeat(cum_pts[:-1], pt_counts)
            )
            dst_idx = np.repeat(dst_pt, 16) + np.tile(
                np.arange(16), total_pts
            )
            out[dst_idx] = flat.astype("<f8").view(np.uint8)

    if poly_start[-1] < 2**31:
        offsets = poly_start.astype(np.int32)
        out_type = pa.binary()
    else:
        offsets = poly_start.astype(np.int64)
        out_type = pa.large_binary()
    validity = None if valid.all() else pa.array(valid).buffers()[1]
    return pa.Array.from_buffers(
        out_type,
        n,
        [validity, pa.py_buffer(offsets), pa.py_buffer(out)],
        null_count=int(n - valid.sum()),
    )


def _encode_geometry_column(table: pa.Table, geometry_col: str) -> pa.Table:
    """If the geometry column still carries raw GeoJSON coordinates
    (a list type), encode it to WKB here in the Arrow writer stage —
    keeping the Spark plan free of per-row Python. Binary columns
    (already WKB, e.g. the optimize/compact read-back path) pass
    through untouched."""
    if geometry_col not in table.column_names:
        return table
    idx = table.schema.get_field_index(geometry_col)
    typ = table.schema.field(idx).type
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        wkb = polygon_coords_to_wkb_array(table.column(idx))
        return table.set_column(
            idx, pa.field(geometry_col, wkb.type), wkb
        )
    return table


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
        table = _encode_geometry_column(table, geometry_col)
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
        table = _encode_geometry_column(table, geometry_col)
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
