#!/usr/bin/env python
"""Run the full oracle-parity sweep (what the driver's correctness
gate does) at a chosen scale factor.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hls_stac_parquet_spark.session import get_spark  # noqa: E402
from hls_stac_parquet_spark.testing import check_query  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from hls_stac_parquet_spark.queries import REGISTRY

    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("parity-check")
    failed = []
    for name in names:
        try:
            r = check_query(spark, sf_dir, name)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: EXCEPTION {e}")
            failed.append(name)
            continue
        status = "ok   " if r.match else "FAIL "
        extra = r.detail or f"{r.spark_rows} rows"
        print(f"{status}{name}: {extra}")
        if not r.match:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
