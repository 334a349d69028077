"""Exact grouped quantiles, sort-based.

Spark's builtin exact ``percentile`` aggregate carries EVERY value of
a group through the shuffle inside one aggregation buffer (an
OpenHashMap per group) — at 100 TB a hot group's buffer is a
single-task memory cliff, and even at bench scale the map-encoded
buffer loses to a plain sorted shuffle by ~1.8× (measured in
q_percentile, extras.py). This kernel computes the same interpolated
quantiles (type-7, ≡ DuckDB ``quantile_cont``) from a per-group sort:

    rank every row (row_number over the group-partitioned value
    sort), then ONE conditional-sum aggregate picks and interpolates
    the two boundary rows per requested quantile.

The shuffle carries plain columns, per-group state during
aggregation is O(#probs), and ties are safe (the multiset at any
rank is identical however equal values permute). Window-over-sort
does materialize each group's partition for ranking — for truly
monstrous single groups the range-partitioned global-rank recipe
(q_auc, stats.py) composes with the same conditional-sum tail.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def grouped_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float],
    aliases: Sequence[str],
) -> DataFrame:
    """One row per group with columns ``aliases`` holding the exact
    interpolated ``probs`` quantiles of ``value_col``."""
    if len(probs) != len(aliases):
        raise ValueError("probs and aliases must align")
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy(value_col)
    n = Window.partitionBy(*gcols)
    d = (
        df.select(*gcols, value_col)
        .withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn("_cnt", F.count("*").over(n))
    )
    aggs = []
    for p, alias in zip(probs, aliases):
        pos = (F.col("_cnt") - 1) * float(p)
        lo = F.floor(pos)
        frac = pos - lo
        contrib = F.when(
            F.col("_rn") == lo, F.col(value_col) * (1 - frac)
        ).when(F.col("_rn") == lo + 1, F.col(value_col) * frac)
        aggs.append(F.sum(contrib).alias(alias))
    return d.groupBy(*gcols).agg(*aggs)
