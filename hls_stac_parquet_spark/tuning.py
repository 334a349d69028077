"""Cluster-scale tuning arithmetic — the partition-sizing rules of
thumb applied by code instead of folklore.

The reference hand-sizes its workers (8 vCPU / 64 GiB Batch jobs,
``infrastructure/src/hls-batch-stack.ts:261-262``); a Spark job's
equivalent decision is how many shuffle partitions and how large a
scan split to use.  These helpers make the arithmetic explicit and
testable so a 100 TB deployment starts from defensible numbers
instead of the 200-partition default:

- scan splits: ``maxPartitionBytes`` bounds mapper memory; the
  default 128 MiB is right for zstd parquet (decompressed batches
  stay inside executor memory headroom).
- shuffle partitions: target ~128-200 MiB of *shuffle* data per
  partition, rounded up to a multiple of total cores so every wave
  is full; too few → spill + GC, too many → scheduler overhead and
  tiny files.
- AQE then coalesces/splits at runtime from these static ceilings
  (it can only merge what exists — the static number is the upper
  bound on parallelism, so it must err high, never low).
"""

from __future__ import annotations

MIB = 1024 * 1024
DEFAULT_TARGET_PARTITION_BYTES = 128 * MIB


def recommended_shuffle_partitions(
    shuffle_bytes: int,
    total_cores: int,
    target_partition_bytes: int = DEFAULT_TARGET_PARTITION_BYTES,
) -> int:
    """Shuffle partition count for an expected shuffle volume.

    max(bytes / target, cores), rounded UP to a whole multiple of
    ``total_cores`` so the final stage wave is full — a 100 TB
    shuffle at 128 MiB/partition on a 1000-executor × 8-core cluster
    lands at ~800k partitions (and AQE coalesces the skewed tail).
    """
    if shuffle_bytes < 0 or total_cores <= 0:
        raise ValueError("shuffle_bytes must be ≥ 0 and total_cores > 0")
    need = max(1, -(-shuffle_bytes // target_partition_bytes))
    waves = max(1, -(-need // total_cores))
    return waves * total_cores


def recommended_conf(
    input_bytes: int,
    total_cores: int,
    shuffle_fraction: float = 0.5,
) -> dict[str, str]:
    """Static conf for a job scanning ``input_bytes``: scan split
    size, shuffle partitions (assuming ``shuffle_fraction`` of the
    input crosses the wire — override per workload), and AQE advisory
    size aligned with the target partition size."""
    shuffle_bytes = int(input_bytes * shuffle_fraction)
    return {
        "spark.sql.files.maxPartitionBytes": str(DEFAULT_TARGET_PARTITION_BYTES),
        "spark.sql.shuffle.partitions": str(
            recommended_shuffle_partitions(shuffle_bytes, total_cores)
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            DEFAULT_TARGET_PARTITION_BYTES
        ),
    }


def parallelize_for_udf(df, min_factor: int = 1):
    """Ensure a DataFrame has at least ``defaultParallelism ×
    min_factor`` partitions before an expensive per-row stage — an
    Arrow-UDF pass *or* a heavy JVM expression chain (shingle
    explodes, per-window md5, codec work).

    Scan partitioning follows FILE layout (one small parquet file =
    ONE partition — and a single row group cannot be split, so a
    ``files.minPartitionNum`` floor yields empty splits, not
    parallelism), so a CPU-heavy pass over a compact table runs on
    one core no matter how many sit idle — the sketch pipelines and
    the shingle/fingerprint family hit exactly this (measured r8:
    q_source_overlap's fingerprint pass 2.0 s → 0.53 s at sf0.1 once
    spread). A round-robin repartition of narrow rows costs one cheap
    shuffle and unlocks full parallelism; when the input already has
    enough partitions (any real multi-file table, every cluster-scale
    scan) this is a no-op (no shuffle added).
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def driver_rows_to_df(spark, rows, schema):
    """``spark.createDataFrame`` for driver-computed result lists
    (union-find labels, peeled core numbers, greedy covers) that skips
    the Python-worker round-trip.

    The plain list path embeds pickled rows in every task and spins a
    Python worker per task to re-emit them (measured r8: a 32-slice
    parallelize of 2 k rows cost ~19 s of task time / ~0.7 s wall per
    materialization under bench load). The pandas path hands the rows
    to the JVM as Arrow batches (arrow.pyspark.enabled is on in
    session.py), so the scan stage is JVM-only: measured 0.25 s vs
    0.7-1.0 s per noop of the same 2 k rows. Falls back to the list
    path for empty input (pandas would lose the dtypes) and for
    schemas Arrow can't carry."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    try:
        pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
        return spark.createDataFrame(pdf, schema)
    except Exception:  # Arrow-unfriendly payload — correctness first
        return spark.createDataFrame(rows, schema)


def guarded_broadcast(df, max_rows: int, alternative: str):
    """``F.broadcast(df)`` with a row-count guard compiled INTO the
    plan.

    A broadcast dim that silently outgrows executor memory is the
    classic small-dim-that-wasn't failure at 100 TB; this refuses with
    a routed error naming the large×large alternative instead of
    OOM-ing mid-stage. The guard is a broadcast 1-row count aggregate
    cross-joined onto the dim with ``raise_error`` on violation — no
    separate driver-side count action, so the query stays one job and
    the check costs one tiny extra stage inside it.
    """
    from pyspark.sql import functions as F

    # the guard lives in a FILTER (a raising projection would be
    # column-pruned away when downstream never reads it); assert_true
    # returns NULL when the predicate holds and raises otherwise, so
    # the 1-row aggregate survives iff the dim is under the cap
    msg = F.concat(
        F.lit("broadcast refused: dimension side has "),
        F.col("_guard_n").cast("string"),
        F.lit(
            f" rows > max_rows={max_rows}; use {alternative} "
            "(the large-scale path) or raise the cap explicitly"
        ),
    )
    chk = (
        df.groupBy()
        .agg(F.count("*").alias("_guard_n"))
        .filter(F.assert_true(F.col("_guard_n") <= max_rows, msg).isNull())
    )
    return F.broadcast(df.join(F.broadcast(chk)))


def compact_checkpoint(df):
    """``localCheckpoint`` with SERIALIZED block storage
    (``StorageLevel.MEMORY_AND_DISK``; the DataFrame default is the
    ``_DESER`` variant).

    Deserialized checkpoint blocks of a ~10 MB canonical-pair table
    measured 124 MB of storage memory (r9, q_triangle_count) and are
    re-read by every consumer — in the shared 32 g local[32] JVM that
    footprint is a §5 GC-pressure source (the documented in-suite
    variance on the graph/sketch cluster). Serialized blocks are ~10×
    smaller; the per-read deserialization of narrow rows is noise by
    comparison. Use for multi-consumer checkpoints of non-trivial
    size; leave 1-row/dim checkpoints on the default level.
    """
    from pyspark.storagelevel import StorageLevel

    return df.localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
