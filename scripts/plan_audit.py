#!/usr/bin/env python
"""Plan-shape audit: run `.explain`-level analysis over registry
queries and emit a markdown report (PLAN_AUDIT.md) of the physical
plan properties that matter at 100 TB — exchanges, join strategies,
pushed filters, codegen coverage, and red flags (cartesian products,
unpartitioned windows over fact tables).

    python scripts/plan_audit.py                 # top-N by bench cost + flagships
    python scripts/plan_audit.py q_tpch_q5 ...   # explicit queries
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIPS = [
    "q_corpus_pipeline", "q_minhash_dedup", "q_dedup_exact", "q_tfidf",
    "q_bm25", "q_cosine_topk", "q_triangle_count", "q_market_basket",
    "q_auc", "q_tpch_q5", "q_tpch_q9", "q_sessionize", "q_asof_join",
]


def audit(plan: str) -> dict:
    # AQE plan dumps append "== Initial Plan ==" (pre-adaptive) after
    # each "== Final Plan ==" — audit only the final plans
    plan = re.sub(
        r"== Initial Plan ==.*?(?=== Final Plan ==|\Z)", "", plan, flags=re.S
    )
    reused = plan.count("ReusedExchange")
    # a window is unpartitioned iff windowspecdefinition's FIRST arg is
    # already a sort order (col ASC/DESC ...) — partition columns would
    # precede it as bare attribute refs
    unpart = bool(
        re.search(r"windowspecdefinition\([^,()]+ (ASC|DESC)", plan)
    )
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        - reused,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": "PushedFilters: [" in plan
        and not re.search(r"PushedFilters: \[\],?\s", plan),
        "python_eval": plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas")
        + plan.count("FlatMapCoGroupsInPandas"),
        "unpartitioned_window": unpart,
    }


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from hls_stac_parquet_spark.queries import REGISTRY
    from hls_stac_parquet_spark.session import get_spark

    names = sys.argv[1:]
    bench = {}
    try:
        with open(os.path.join(root, "BENCH_DETAIL.json")) as f:
            bench = json.load(f)["queries"]
    except Exception:
        pass
    if not names:
        slowest = sorted(bench, key=lambda n: -bench[n])[:15]
        names = list(dict.fromkeys(slowest + FLAGSHIPS))
        names = [n for n in names if n in REGISTRY]

    # UI on for THIS standalone session only: its REST API is how we
    # measure real shuffle bytes per query (bench/test sessions keep
    # it off for overhead)
    spark = get_spark(
        "plan-audit",
        extra_conf={
            "spark.ui.enabled": "true",
            # stage-metric snapshots diff the completed-stage set; the
            # default retention (1000) can evict stages between the
            # before/after snapshots and silently undercount
            "spark.ui.retainedStages": "100000",
        },
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = None
    if ui:
        try:
            apps = json.load(
                urllib.request.urlopen(f"{ui}/api/v1/applications")
            )
            app_id = apps[0]["id"]
        except Exception:  # noqa: BLE001
            ui = None

    def completed_stages() -> dict:
        """(stageId, attempt) -> shuffle write bytes, via the UI REST
        API — the same numbers the Spark UI's stage table shows."""
        if not app_id:
            return {}
        try:
            stages = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
                )
            )
            return {
                (st["stageId"], st["attemptId"]):
                    st.get("shuffleWriteBytes", 0)
                for st in stages
            }
        except Exception:  # noqa: BLE001
            return {}
    lines = [
        "# PLAN_AUDIT — physical-plan shapes of the cost heads",
        "",
        f"Scale dir: `{sf_dir}`. Plans are the POST-EXECUTION adaptive "
        "plans (AQE's final join selection). Columns: shuffles "
        "(hash+range exchanges net of reuse), BHJ/SMJ join mix, "
        "Arrow/pandas stages, whole-stage-codegen span count, pushed "
        "parquet filters, and flags. `shuffle MB` is MEASURED shuffle "
        "write volume for the query's execution (UI REST stage "
        "metrics, noop sink; includes localCheckpoint/persist "
        "materializations — the data actually crossing executors). "
        "Caveat: the number is a completed-stage-set diff, so it is "
        "approximate under concurrency — a stage completing for "
        "another session in the same JVM would be attributed here, "
        "and stages evicted from the UI store between snapshots "
        "undercount (retention raised to 100k to make eviction "
        "practically impossible for a single-query run). "
        "Flag notes: `bnlj` against a "
        "broadcast 1-ROW scalar dim (grand totals, max-ts stamps, "
        "count guards) is the deliberate scalar-join pattern, not a "
        "blow-up — inspect only if the build side can grow; "
        "`unpart-window` is likewise benign when the window runs over "
        "a groups-sized aggregate (the registry's documented pattern) "
        "and a defect only over fact-scale rows. Counts are textual: "
        "queries that persist() an intermediate (e.g. "
        "q_triangle_count) reprint the cached subtree at every "
        "InMemoryTableScan, inflating their absolute numbers — "
        "compare within a query across rounds, not across queries.",
        "",
        "| query | bench s | shuffles | shuffle MB | BHJ | SMJ | pandas | codegen | pushed | flags |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name in names:
        try:
            before = completed_stages()
            df = REGISTRY[name].fn(spark, sf_dir)
            # execute so AQE's FINAL plan (runtime join selection,
            # coalesced partitions) is what gets audited
            df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
            after = completed_stages()
            sh_bytes = sum(
                v for k, v in after.items() if k not in before
            )
            sh_mb = f"{sh_bytes / 1e6:.2f}" if app_id else ""
        except Exception as e:  # noqa: BLE001
            lines.append(f"| {name} | | ERROR {str(e)[:60]} | | | | | | | |")
            continue
        a = audit(plan)
        flags = []
        if a["cartesian"]:
            flags.append(f"CARTESIAN×{a['cartesian']}")
        if a["bnlj"]:
            flags.append(f"BNLJ×{a['bnlj']}")
        if a["unpartitioned_window"]:
            flags.append("unpart-window")
        t = f"{bench[name]:.2f}" if name in bench else ""
        lines.append(
            f"| {name} | {t} | {a['exchanges']} | {sh_mb} "
            f"| {a['broadcast_joins']} "
            f"| {a['smj']} | {a['python_eval']} | {a['codegen_stages']} "
            f"| {'y' if a['pushed_filters'] else '-'} "
            f"| {', '.join(flags) or '-'} |"
        )
    out = os.path.join(root, "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(names)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
