#!/usr/bin/env python
"""Synthesize an N× copy of a testdata SF directory for scaling runs.

    python scripts/make_scale_data.py SRC_DIR OUT_DIR N

Each table is replicated N times with keys offset into disjoint ranges
so the copies join only within themselves (graph/join cardinalities
scale linearly, as a bigger corpus would). Content columns are
per-copy salted — document terms get a copy prefix and embeddings a
small per-copy offset — so DEDUP work scales like a real bigger
corpus (N× the clusters) instead of collapsing every copy into one
giant cross-copy duplicate cluster (which would scale pair counts
quadratically in N and measure the data generator, not the engine).

Used by scripts/scale_check.py to produce SCALING.md; writes only
under the caller-chosen OUT_DIR (keep it in /tmp).
"""

from __future__ import annotations

import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# key columns to offset per copy, per table (disjoint id ranges)
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    con.execute(f"SET threads TO 8")
    import os

    os.makedirs(out, exist_ok=True)
    # offsets chosen far beyond any real id in the source tables
    off = 10_000_000
    for tbl in TABLES:
        srcp = f"{src}/{tbl}.parquet"
        if tbl in ("region", "nation"):  # true dims: keep as-is
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{srcp}')) "
                f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
            )
            continue
        keys = KEYS[tbl]
        sel_parts = []
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{srcp}')"
            ).fetchall()
        ]
        exprs = []
        for c in cols:
            if c in keys:
                exprs.append(f"{c} + copies.i * {off} AS {c}")
            elif tbl == "documents" and c == "text":
                # per-copy term salt: near-dup structure is preserved
                # WITHIN a copy, destroyed ACROSS copies
                exprs.append(
                    "regexp_replace(text, '(^| )', "
                    "'\\1c' || copies.i || '_', 'g') AS text"
                )
            elif tbl == "embeddings" and c == "embedding":
                exprs.append(
                    "list_transform(embedding, "
                    "x -> CAST(x + copies.i * 0.003 AS FLOAT)) AS embedding"
                )
            else:
                exprs.append(c)
        q = (
            f"COPY (SELECT {', '.join(exprs)} "
            f"FROM read_parquet('{srcp}'), "
            f"(SELECT unnest(range({n})) AS i) copies) "
            f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        con.execute(q)
        cnt = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {cnt} rows")


if __name__ == "__main__":
    main()
