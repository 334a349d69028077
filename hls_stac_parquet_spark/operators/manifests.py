"""Manifest-flow operators: skip-existing, fan-in, failure split.

Three small reference behaviors as set/flow algebra:

- skip-existing (A9, links.py:100-103): left anti-join of work units
  against already-materialized outputs (replaces per-key HEAD probes
  with one distributed join)
- fan-in (A12, write.py:161-168): multi-file read + explode — Spark's
  file listing does the driver loop's job in parallel
- failure split (A19, fetch.py:78-88): tag rows with an error column,
  fork into ok/dead-letter streams
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anti_join_existing(
    work_units: DataFrame, existing: DataFrame, keys: list[str]
) -> DataFrame:
    """Work units not yet materialized (idempotent re-run guard)."""
    return work_units.join(existing, keys, "left_anti")


def fan_in_manifests(manifest_df: DataFrame, urls_col: str = "urls") -> DataFrame:
    """Explode per-manifest URL arrays into one flat url column,
    keeping the manifest's partition keys on every row."""
    others = [c for c in manifest_df.columns if c != urls_col]
    return manifest_df.select(*others, F.explode(urls_col).alias("url"))


def split_failures(
    df: DataFrame, error_col: str = "fetch_error"
) -> tuple[DataFrame, DataFrame]:
    """(ok, dead_letter) — the success/failure stream split. The
    dead-letter side persists as a table instead of a log line so
    retries are a join away."""
    ok = df.filter(F.col(error_col).isNull()).drop(error_col)
    dead = df.filter(F.col(error_col).isNotNull())
    return ok, dead
