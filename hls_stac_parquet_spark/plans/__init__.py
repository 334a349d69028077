"""End-to-end pipelines: E1 daily ingest, E2 monthly compaction."""

from hls_stac_parquet_spark.plans.daily_ingest import (  # noqa: F401
    cache_daily_stac_json_links,
    extract_stac_json_links,
)
from hls_stac_parquet_spark.plans.monthly_compact import (  # noqa: F401
    write_monthly_stac_geoparquet,
)
