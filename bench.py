#!/usr/bin/env python
"""Benchmark harness: run the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized with a noop-format write — the whole
plan executes on the executors (all columns, all rows) without paying
driver-side collect/serialization, which is what a sink-bound pipeline
looks like in production.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hls_stac_parquet_spark.session import get_spark  # noqa: E402


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    # The driver parses stdout as exactly one JSON line; round 1 came
    # back "parsed": null because JVM/py4j startup noise shares fd 1.
    # Redirect fd 1 → stderr for the whole run (catches Python AND the
    # forked JVM, which inherits our file descriptors), then restore it
    # for the single JSON print at the end.
    real_stdout_fd = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = os.fdopen(os.dup(1), "w")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None

    spark = get_spark("hls-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # host-health probe: a fixed synthetic workload timed before the
    # query sweep. The shared host's throughput swings >2x over tens
    # of minutes (measured within round 3); recording a calibration
    # constant alongside the timings lets per-round bench comparisons
    # separate code changes from host weather.
    def host_probe() -> dict:
        # median of 3: a single-shot probe swung 0.44–0.84 s across
        # same-day quiet runs (round 5) and mis-normalized the gate in
        # BOTH directions; the median tracks the host, not one GC/JIT
        # hiccup. The probe's first spark run doubles as its warmup.
        def once() -> tuple:
            t0 = time.perf_counter()
            x = 0
            for i in range(10**7):
                x += i
            py_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            spark.range(50_000_000).selectExpr("id % 97 AS k").groupBy(
                "k"
            ).count().write.format("noop").mode("overwrite").save()
            return py_s, time.perf_counter() - t0
        runs = [once() for _ in range(3)]
        return {
            "py_loop_s": round(sorted(r[0] for r in runs)[1], 3),
            "spark_range_agg_s": round(sorted(r[1] for r in runs)[1], 3),
        }

    probe_before = host_probe()

    from hls_stac_parquet_spark.queries import REGISTRY

    names = [n for n, s in sorted(REGISTRY.items()) if s.bench]
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:  # dev-loop filter; the driver never sets this
        keep = set(only.split(","))
        names = [n for n in names if n in keep]

    # warmup (not timed): run the FULL query set once at the TARGET sf.
    # This pays whole-stage-codegen/Janino compilation, JIT, AQE
    # replanning, and Arrow Python-worker spin-up outside the timed
    # section, so the timings below measure steady-state throughput at
    # the target sf — the quantity that extrapolates to a long-running
    # cluster — not one-time JVM compile latency (amortized over a
    # job's lifetime in production). Measured: warming at a smaller sf
    # does NOT warm the target-sf plans (AQE produces scale-specific
    # physical plans whose generated code recompiles).
    for name in names:
        try:
            run_query(REGISTRY[name].fn(spark, sf_dir))
        except Exception:
            pass  # a warmup failure just means a colder first timed run

    # drop every cached/persisted intermediate the warmup left behind:
    # timed runs must recompute all data from the parquet scans —
    # steady-state compute, not cache-hit replay.
    spark.catalog.clearCache()

    # two timed passes, report the per-query MINIMUM: single-JVM GC /
    # broadcast-cleanup pauses land on random queries and inflate a
    # single pass by up to 2x on the pandas-UDF sketches; min-of-N is
    # the standard way to report the steady-state number the run
    # actually achieves.
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in names:
            start = time.perf_counter()
            run_query(REGISTRY[name].fn(spark, sf_dir))
            elapsed = round(time.perf_counter() - start, 4)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)

    # Full per-query detail goes to a FILE; the stdout line must stay
    # SHORT. Round 1 evidence (BENCH_r01.json): the driver stores only a
    # 2000-char tail of stdout and the 91-query JSON line was truncated
    # mid-dict ("parsed": null despite rc=0). With 153 bench queries the
    # full dict is ~3.7 KB — guaranteed to truncate. So: print the
    # total + a curated headline subset (< ~1.5 KB), and write the whole
    # timing map to BENCH_DETAIL.json next to this script.
    # dev-loop subset runs must not clobber the committed full-sweep
    # artifact with a partial timing map
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_DETAIL.json" if not only else "BENCH_DETAIL.partial.json",
    )
    probe_after = host_probe()
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_query_set_total",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "host_probe_before": probe_before,
                "host_probe_after": probe_after,
                "queries": timings,
            },
            f,
            indent=1,
            sort_keys=True,
        )

    headline = [
        "q_tpch_q3",
        "q_tpch_q5",
        "q_hash_agg",
        "q_join_inner_hash",
        "q_window_rank",
        "q_sort_global",
        "q_sessionize",
        "q_funnel",
        "q_dedup_exact",
        "q_minhash_dedup",
        "q_cosine_topk",
        "q_tfidf",
        "q_text_stats",
        "q_hilbert_key",
        "q_tumbling_window_agg",
        "q_ann_ivf",
    ]
    line = json.dumps(
        {
            "metric": "headline_query_set_total",
            "value": total,
            "unit": "sec",
            "queries": {n: timings[n] for n in headline if n in timings},
            "sf": sf_val,
            "n_queries": len(timings),
            "probe": [
                probe_before["spark_range_agg_s"],
                probe_after["spark_range_agg_s"],
            ],
            "detail": os.path.basename(detail_path),
        }
    )
    # restore the real stdout and emit the one JSON line
    sys.stdout.flush()
    os.dup2(real_stdout_fd, 1)
    os.write(real_stdout_fd, (line + "\n").encode())


if __name__ == "__main__":
    main()
