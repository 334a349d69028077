#!/usr/bin/env python
"""Measure how representative queries scale from 1× to N× data.

    python scripts/make_scale_data.py /root/testdata/sf0.1 /tmp/scale10 10
    python scripts/scale_check.py /root/testdata/sf0.1 /tmp/scale10 10

Times each query at both scales (same harness as bench.py: full-plan
noop-sink materialization, warmup pass, min of 2, cache cleared) and
writes SCALING.md with the time ratios. The point of the artifact: a
query whose time ratio tracks the data ratio (or better) has no
super-linear term hiding in its plan — the property that decides
whether the plan survives 100 TB, measured instead of asserted.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPRESENTATIVE = [
    # spanning the operator classes: scan-agg, star join, window,
    # global sort, digest dedup, sketch+bucket dedup, text inverted
    # index, keyed sessionization, the end-to-end corpus pipeline,
    # and a graph op (degree-oriented triangles)
    "q_hash_agg",
    "q_tpch_q5",
    "q_window_rank",
    "q_sort_global",
    "q_dedup_exact",
    "q_minhash_dedup",
    "q_tfidf",
    "q_sessionize",
    "q_corpus_pipeline",
    "q_triangle_count",
    "q_attribution",
    # fourth-session additions with distinct scale shapes: basket-
    # blocked CF pairs, unit-sphere grid-blocked spatial join, and
    # the range-partitioned global-quantile + broadcast-bin PSI
    "q_item_item_cf",
    "q_geo_radius_join",
    "q_psi_drift",
    # fifth-session: global-order kernel users (range-partitioned
    # rank / cumsum / ntile — the distributed replacements for
    # single-partition windows; q_sort_global above also routes
    # through the kernel now)
    "q_rfm_segments",
    "q_pack_sequences",
    # round-4 verdict item 5: the remaining global-order/ntile kernel
    # adopters (distributed rank/cumsum replacing single-partition
    # windows — prove the trade pays at scale where it claims to)
    "q_ks_drift",
    "q_shuffle_order",
    "q_sample_hash",
    # sixth-session: bigram-LM scoring (vocab-keyed model joins +
    # per-doc ordered folds + ntile kernel) and the Arrow-batched
    # JPEG/GIF codec pipelines (per-row CPU, no shuffle — the axis
    # where scaling should be embarrassingly parallel)
    "q_perplexity_filter",
    "q_jpeg_decode_stats",
    "q_gif_frame_pipeline",
    # round-5: MMR diverse retrieval (broadcast probe map + pool-
    # bounded greedy — corpus cost is the zero-shuffle Arrow map) and
    # isotonic calibration (fact scan collapsing to a ≤50-row fit —
    # should scale with the scan, nothing else)
    "q_mmr_diversify",
    "q_isotonic_calibration",
]


def main() -> None:
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    dir1, dirn, n = sys.argv[1], sys.argv[2], int(sys.argv[3])

    from hls_stac_parquet_spark.queries import REGISTRY
    from hls_stac_parquet_spark.session import get_spark

    spark = get_spark("hls-spark-scale-check")
    spark.sparkContext.setLogLevel("ERROR")

    def probe() -> float:
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("id % 97 AS k").groupBy(
            "k"
        ).count().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def run(name: str, sf_dir: str) -> float:
        best = None
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warmup: codegen/AQE compile at this scale
        spark.catalog.clearCache()
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            spark.catalog.clearCache()
        return round(best, 3)

    p0 = probe()
    rows = []
    for name in REPRESENTATIVE:
        t1 = run(name, dir1)
        tn = run(name, dirn)
        rows.append((name, t1, tn, round(tn / max(t1, 1e-9), 2)))
        print(rows[-1])
    p1 = probe()

    lines = [
        "# SCALING — measured 1× → %d× data-scale behavior" % n,
        "",
        "Data: `%s` (1×) vs `%s` (%d× rows per fact table, keys offset "
        "into disjoint per-copy ranges, content salted per copy — see "
        "scripts/make_scale_data.py). Harness identical to bench.py "
        "(noop-sink full-plan materialization, per-scale warmup, min of "
        "2, cache cleared). local[32], single host; probe before/after: "
        "%.2fs / %.2fs." % (dir1, dirn, n, p0, p1),
        "",
        "A ratio at or below the %d× data ratio means no super-linear "
        "term is hiding in the plan at this scale step; fixed per-job "
        "overhead (JVM scheduling, Python worker spin-up) makes small "
        "queries come in well under it." % n,
        "",
        "| query | 1× s | %d× s | ratio |" % n,
        "|---|---|---|---|",
    ]
    for name, t1, tn, r in rows:
        lines.append(f"| {name} | {t1} | {tn} | {r}× |")

    # the IVF dial: per-cell GEMM cost is Σ|corpus_c|×|probe_c|, so a
    # FIXED cluster count scales quadratically with data while a
    # cluster count ∝ data holds per-cell sizes (and cost/row)
    # constant — measure both to show the dial working
    from pyspark.sql import functions as SF

    from hls_stac_parquet_spark.operators.similarity import (
        ivf_cosine_pairs_above,
    )
    from hls_stac_parquet_spark.queries.registry import t as load

    def run_ivf(sf_dir: str, k: int) -> float:
        emb = load(spark, sf_dir, "embeddings")
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            ivf_cosine_pairs_above(
                emb, threshold=0.35, n_clusters=k, n_probe=3
            ).agg(SF.count("*")).collect()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        return round(best, 3)

    i1 = run_ivf(dir1, 8)
    in_fixed = run_ivf(dirn, 8)
    in_scaled = run_ivf(dirn, 8 * n)
    lines += [
        "",
        "## The IVF dial",
        "",
        "IVF-blocked embedding search costs Σ_cell |corpus_c|×|probe_c| "
        "— with a FIXED cluster count, 10× data makes every cell 10× "
        "bigger and the GEMM work ~100×; scaling the cluster count with "
        "the data holds per-cell sizes (cost per row) steady. Measured "
        "(ivf_cosine_pairs_above, threshold 0.35, n_probe 3):",
        "",
        "| config | s |",
        "|---|---|",
        f"| 1× data, 8 cells | {i1} |",
        f"| {n}× data, 8 cells (fixed — the anti-pattern) | {in_fixed} |",
        f"| {n}× data, {8 * n} cells (dial ∝ data) | {in_scaled} |",
    ]
    # preserve hand-curated sections (convergence footnotes, the
    # three-point 30× curve) below the marker across regenerations
    marker = "<!-- MANUAL-SECTIONS -->"
    manual = ""
    if os.path.exists("SCALING.md"):
        with open("SCALING.md") as f:
            prev = f.read()
        if marker in prev:
            manual = prev[prev.index(marker):]
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
        if manual:
            f.write("\n" + manual)
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
