"""Completeness gate — expected-vs-actual set check.

The reference builds the expected list of daily manifest paths for a
month (origin-date-aware: the collection's first month starts at the
origin day, not day 1 — write.py:180-196) and raises if the listing
differs (write.py:172-202). Here: generate the expected keys with
``sequence`` + ``explode``, anti-join both directions, and let the
caller assert emptiness — set algebra instead of driver loops, so the
same gate works for a month or a decade of partitions.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncompleteInputError(ValueError):
    """Raised when the completeness gate finds missing/unexpected keys
    (mirrors the reference's ValueError, write.py:199-202)."""


def expected_days(
    spark: SparkSession,
    start: dt.date,
    end: dt.date,
    origin_date: dt.date | None = None,
) -> DataFrame:
    """One row per expected day in [start, end], clipped to the
    collection origin (the reference's origin-month override,
    write.py:180-186)."""
    lo = max(start, origin_date) if origin_date else start
    return spark.sql(
        "SELECT explode(sequence(to_date(:lo), to_date(:hi), interval 1 day)) AS day",
        args={"lo": lo.isoformat(), "hi": end.isoformat()},
    )


def completeness_check(
    expected: DataFrame, actual: DataFrame, key: str = "day"
) -> tuple[DataFrame, DataFrame]:
    """(missing, unexpected) — both-direction anti-joins. Callers
    assert both are empty; the DataFrames double as the error report.
    """
    missing = expected.join(actual, key, "left_anti")
    unexpected = actual.join(expected, key, "left_anti")
    return missing, unexpected


def require_complete(expected: DataFrame, actual: DataFrame, key: str = "day") -> None:
    """Raise IncompleteInputError unless expected == actual as sets."""
    missing, unexpected = completeness_check(expected, actual, key)
    miss = [r[key] for r in missing.limit(20).collect()]
    extra = [r[key] for r in unexpected.limit(20).collect()]
    if miss or extra:
        raise IncompleteInputError(
            f"expected these links: missing={miss} unexpected={extra}"
        )
