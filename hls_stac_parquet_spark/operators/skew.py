"""Skew-mitigation join: explicit key salting.

AQE's skew-join split handles most cases (enabled in session.py);
explicit salting is the deterministic fallback for pathological keys
(e.g. the null-island tile, the empty-document fingerprint) and for
engines/stages where AQE can't help (streaming joins).

Semantics are identical to a plain inner equi-join — which is exactly
what makes it oracle-checkable (q_join_skew_salted verifies the
salted plan against DuckDB's plain join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_inner_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Inner equi-join with the left side's hot keys spread over
    ``salt`` sub-keys and the right side replicated ``salt``×.

    - left rows get a deterministic salt from a non-key column
      (``salt_source``; hash-derived so the same row always lands on
      the same sub-key — no rand(), reruns are stable)
    - right rows are exploded into all ``salt`` sub-keys

    The join key becomes (key, salt_id): a hot key's rows now hash to
    ``salt`` different reducers instead of one. Cost: right side
    replicated ``salt``× — use for dim-sized or pre-filtered right
    sides, and keep ``salt`` ≈ the observed skew factor.
    """
    if salt_source is None:
        salt_source = left.columns[0]
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt)).cast("int")
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, [key, "_salt"], "inner").drop("_salt")
    return out
