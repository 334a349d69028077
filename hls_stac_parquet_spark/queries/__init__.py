"""Named query registry — the engine's declared operator surface.

Every operator from SURVEY.md §2.B registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-
expressible) an equivalent DuckDB oracle SQL string. The driver's
correctness gate runs both sides at sf0.01 and hash-compares.

Import order matters only in that importing this package populates
the registry.
"""

from hls_stac_parquet_spark.queries.registry import REGISTRY, QuerySpec, query  # noqa: F401

# populate the registry
from hls_stac_parquet_spark.queries import relational  # noqa: F401,E402
from hls_stac_parquet_spark.queries import reference_ops  # noqa: F401,E402
from hls_stac_parquet_spark.queries import llmdata  # noqa: F401,E402
from hls_stac_parquet_spark.queries import extras  # noqa: F401,E402
