"""SparkSession factory with scale-oriented defaults.

The reference pipeline hand-tunes concurrency (semaphore=50,
``fetch.py:15,50``) and compression (zstd-6, ``write.py:243``); here the
equivalent knobs are Spark conf, set once so every pipeline and test
gets the same posture:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- Arrow on (pandas-UDF edges are vectorized, never row-at-a-time)
- zstd parquet output (matches the reference's sink codec)
- UTC session timezone (naive-UTC discipline keeps parquet timestamps
  bit-stable across engines — see SURVEY.md §7 oracle-parity traps)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "hls_stac_parquet_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[*]``. All settings are safe to apply on an
    existing session via ``getOrCreate`` semantics.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")

    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(n_shuffle),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.compression.codec": "zstd",
        # TIMESTAMP(NANOS) parquet (events.ts) is illegal for Spark's
        # reader; read as long and convert at the scan (registry.t)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # let Catalyst push filters into Python data sources (cmr)
        "spark.sql.python.filterPushdown.enabled": "true",
        # runtime bloom-filter join pruning: big-join probe sides get
        # a semi-join filter built from the build side at runtime —
        # the 100 TB join-pruning path (no-op on tiny inputs)
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # Pyspark-only niceties
        "spark.sql.execution.pythonUDF.arrow.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        # local[...] mode runs driver AND all executor threads in ONE
        # JVM: an 8g heap on a 128 GiB box forced full-GC storms (6-9 s
        # pauses randomly landing on bench queries) once the query set
        # grew past ~180 plans of broadcasts/caches/codegen classes.
        # 32g + G1 with a 200 ms pause target keeps collections
        # incremental; on a real cluster these are per-role settings.
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        # -Xss8m: the streaming error path (ForeachBatchUserFuncException
        # wrapping a py4j callback failure) intermittently dies with
        # java.lang.StackOverflowError in the stream execution thread on
        # the default ~1m stack, leaving the query ACTIVE forever — the
        # r7/r8 kill-and-resume suite hang (reproduced in isolation,
        # r9). A larger thread stack lets the failure propagate so
        # awaitTermination() raises instead of hanging.
        "spark.driver.extraJavaOptions": (
            "-XX:+UseG1GC -XX:MaxGCPauseMillis=200 -Xss8m"
        ),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Load the driver's parquet tables and register them as temp views.

    Returns {name: DataFrame}. Registration makes every query writable
    as either DataFrame calls or ``spark.sql`` over the same names the
    DuckDB oracle uses.
    """
    dfs = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            dfs[name] = df
    return dfs
