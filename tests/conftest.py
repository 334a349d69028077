from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hls_stac_parquet_spark.session import get_spark  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hls-spark-tests", shuffle_partitions=8)
    yield s
    # explicit stop at session finish: without it the JVM teardown
    # races the interpreter exit and full-suite runs can die before
    # pytest prints its final summary line (round-4 verdict note)
    try:
        s.stop()
    except Exception:
        pass
