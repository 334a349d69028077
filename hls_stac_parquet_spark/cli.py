"""CLI mirroring the reference's commands (cli.py:14-26) so a user of
``hls-stac-parquet`` can switch 1:1:

    python -m hls_stac_parquet_spark.cli cache-daily-stac-json-links \\
        HLSL30 2025-10-01 /dest --end-date 2025-10-31
    python -m hls_stac_parquet_spark.cli write-monthly-stac-geoparquet \\
        HLSL30 2025-10 /links /dest

Differences by design: a DATE RANGE is one Spark job (the reference
dispatches one Lambda per day, A22/A24 — here days are source
partitions), and ``backfill`` replaces the batch_publisher's
origin-to-yesterday fan-out (batch_publisher.py:62-88).
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys

from hls_stac_parquet_spark.constants import COLLECTIONS
from hls_stac_parquet_spark.session import get_spark


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("collection", choices=sorted(COLLECTIONS))
    p.add_argument("--fixture-dir", help="offline CMR fixtures (tests)")
    p.add_argument("--endpoint", help="CMR granule search endpoint")
    p.add_argument("--protocol", default="https")
    p.add_argument("--bbox", help="w,s,e,n")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hls-stac-parquet-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("cache-daily-stac-json-links")
    _add_common(p1)
    p1.add_argument("date", type=dt.date.fromisoformat)
    p1.add_argument("dest")
    p1.add_argument("--end-date", type=dt.date.fromisoformat)

    p2 = sub.add_parser("write-monthly-stac-geoparquet")
    p2.add_argument("collection", choices=sorted(COLLECTIONS))
    p2.add_argument("month", help="YYYY-MM")
    p2.add_argument("links_src")
    p2.add_argument("dest")
    p2.add_argument("--no-require-complete", action="store_true")
    p2.add_argument(
        "--reference-layout", action="store_true",
        help="emit exactly one object per month under the upstream "
             "path template (constants.py:8) instead of N "
             "range-partitioned files",
    )

    p3 = sub.add_parser("backfill")
    _add_common(p3)
    p3.add_argument("dest")
    p3.add_argument("--start-date", type=dt.date.fromisoformat,
                    help="default: collection origin")
    p3.add_argument("--end-date", type=dt.date.fromisoformat,
                    help="default: yesterday (UTC)")

    p5 = sub.add_parser(
        "stream-daily-ingest",
        help="incremental catch-up ingest via the streaming CMR source "
             "(checkpoint = skip-existing; re-run to drain new days)",
    )
    p5.add_argument("collection", choices=sorted(COLLECTIONS))
    p5.add_argument("fixture_dir", help="CMR day-file directory")
    p5.add_argument("dest", help="output parquet path")
    p5.add_argument("--checkpoint", help="default: <dest>/_checkpoint")

    p6 = sub.add_parser(
        "sql",
        help="ad-hoc SQL over a testdata/warehouse directory (each "
             "<name>.parquet registers as temp view <name>)",
    )
    p6.add_argument("statement", help="ANSI SQL (Spark dialect)")
    p6.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="directory of <table>.parquet files")
    p6.add_argument("--out", help="write result parquet here instead of stdout")
    p6.add_argument("--limit", type=int, default=20,
                    help="stdout row cap (ignored with --out)")

    p7 = sub.add_parser(
        "run-query",
        help="run a registered engine query (SURVEY §2 surface) by name",
    )
    p7.add_argument("name", help="registry name, e.g. q_tpch_q5")
    p7.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p7.add_argument("--out", help="write result parquet here instead of stdout")
    p7.add_argument("--limit", type=int, default=20)
    p7.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead of rows")

    p4 = sub.add_parser("export-training-shards")
    p4.add_argument("src", help="documents parquet (curated or raw)")
    p4.add_argument("dest")
    p4.add_argument("--num-shards", type=int, default=16)
    p4.add_argument("--curate", action="store_true",
                    help="run the corpus-curation chain on src first")

    args = ap.parse_args(argv)
    if args.cmd == "run-query":
        # validate BEFORE paying JVM/session startup — a typo'd name
        # should fail instantly
        from hls_stac_parquet_spark.queries import REGISTRY

        if args.name not in REGISTRY:
            print(f"unknown query {args.name!r}; {len(REGISTRY)} registered "
                  f"(see SURVEY.md §2)", file=sys.stderr)
            return 2
    coll = COLLECTIONS[args.collection] if hasattr(args, "collection") else None
    spark = get_spark(f"hls-{args.cmd}")

    if args.cmd == "cache-daily-stac-json-links":
        from hls_stac_parquet_spark.plans.daily_ingest import (
            cache_daily_stac_json_links,
        )

        written = cache_daily_stac_json_links(
            spark, coll.concept_id, coll.collection_id, args.date, args.dest,
            end_date=args.end_date,
            bbox=tuple(map(float, args.bbox.split(","))) if args.bbox else None,
            protocol=args.protocol, fixture_dir=args.fixture_dir,
            endpoint=args.endpoint,
        )
        print(f"wrote {len(written)} manifests")
    elif args.cmd == "write-monthly-stac-geoparquet":
        from hls_stac_parquet_spark.plans.monthly_compact import (
            write_monthly_stac_geoparquet,
        )

        year, month = map(int, args.month.split("-"))
        res = write_monthly_stac_geoparquet(
            spark, coll.collection_id, year, month, args.links_src, args.dest,
            origin_date=coll.origin_date,
            require_complete_links=not args.no_require_complete,
            reference_layout=args.reference_layout,
        )
        print(f"wrote {res['written']} items to {len(res['files'])} files "
              f"({res['failed']} dead-lettered, skipped={res['skipped']})")
    elif args.cmd == "backfill":
        from hls_stac_parquet_spark.plans.daily_ingest import (
            cache_daily_stac_json_links,
        )

        start = args.start_date or coll.origin_date
        end = args.end_date or (
            dt.datetime.now(dt.timezone.utc).date() - dt.timedelta(days=1)
        )
        written = cache_daily_stac_json_links(
            spark, coll.concept_id, coll.collection_id, start, args.dest,
            end_date=end,
            bbox=tuple(map(float, args.bbox.split(","))) if args.bbox else None,
            protocol=args.protocol, fixture_dir=args.fixture_dir,
            endpoint=args.endpoint,
        )
        print(f"backfilled {len(written)} manifests ({start}..{end})")
    elif args.cmd == "stream-daily-ingest":
        from hls_stac_parquet_spark.sources.cmr import register_cmr_source

        register_cmr_source(spark)
        q = (
            spark.readStream.format("cmr")
            .option("fixture_dir", args.fixture_dir)
            .option("collection_concept_id", coll.concept_id)
            .load()
            .writeStream.format("parquet")
            .option("path", args.dest)
            .option(
                "checkpointLocation",
                args.checkpoint or f"{args.dest}/_checkpoint",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n = spark.read.parquet(args.dest).count()
        print(f"ingested; {n} granule rows at {args.dest}")
    elif args.cmd == "sql":
        import glob
        import os

        for path in sorted(glob.glob(os.path.join(args.sf_dir, "*.parquet"))):
            name = os.path.splitext(os.path.basename(path))[0]
            spark.read.parquet(path).createOrReplaceTempView(name)
        df = spark.sql(args.statement)
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {spark.read.parquet(args.out).count()} rows to {args.out}")
        else:
            df.show(args.limit, truncate=False)
    elif args.cmd == "run-query":
        from hls_stac_parquet_spark.queries import REGISTRY

        df = REGISTRY[args.name].fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        elif args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {spark.read.parquet(args.out).count()} rows to {args.out}")
        else:
            df.show(args.limit, truncate=False)
    elif args.cmd == "export-training-shards":
        from pyspark.sql import functions as F

        from hls_stac_parquet_spark.sinks.shards import (
            shard_balance_report,
            write_training_shards,
        )

        docs = spark.read.parquet(args.src)
        if args.curate:
            from hls_stac_parquet_spark.plans.llm_corpus import curate_corpus

            docs = curate_corpus(docs)
        elif "n_tokens" not in docs.columns:
            docs = docs.withColumn(
                "n_tokens", F.size(F.split(F.col("text"), " "))
            )
        manifest = write_training_shards(
            docs, args.dest, num_shards=args.num_shards
        )
        rep = shard_balance_report(manifest)
        print(
            f"wrote {rep['n_shards']} shards, "
            f"{rep['mean_tokens']:.0f} tokens/shard mean, "
            f"rel spread {rep['rel_spread']:.3f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
