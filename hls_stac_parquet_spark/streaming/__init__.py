"""Structured Streaming variants of the batch operators."""

from hls_stac_parquet_spark.streaming.incremental import (  # noqa: F401
    dedup_urls_within_watermark,
    stream_manifest_links,
    stream_sessionize,
    stream_tumbling_counts,
)
