"""CMR granule-search DataSource (PySpark 4 Python Data Source API).

The reference's catalog scan (A1, cmr_api.py:43-71) is an async
generator that builds a query URL with collection/bbox/temporal
parameters (the predicates are *compiled into the source request* —
textbook pushdown, cmr_api.py:28-40) and pages through results with
the ``cmr-search-after`` cursor.

Here the same capability is a first-class Spark source:

- ``spark.read.format("cmr")`` with options, or plain
  ``.filter(...)`` calls — :meth:`CmrReader.pushFilters` accepts
  EqualTo(collection_concept_id) and time_start/time_end range
  filters and folds them into the request, so Catalyst's pushdown
  reaches the REST catalog exactly like the hand-built query did.
- partitions = one per UTC day in the temporal range: each Spark
  task pages through its own day with its own cursor. The
  reference's SNS/SQS/Lambda fan-out (A22/A24) collapses into source
  partitioning; retries become ``spark.task.maxFailures``.
- offline mode (``fixture_dir``): reads cassette-style JSON fixtures
  (one ``{"feed": {"entry": [...]}}`` file per day) — the unit-test
  path, mirroring the reference's VCR cassettes.

Network access uses stdlib urllib only, and only when ``endpoint``
is explicitly configured — no implicit egress.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from hls_stac_parquet_spark.model import CMR_GRANULE_SCHEMA
from hls_stac_parquet_spark.sources.retry import request_with_retries

DEFAULT_PAGE_SIZE = 2000  # CMR hard cap (cmr_api.py:44,55)


class _DayPartition(InputPartition):
    def __init__(self, day: str):
        self.day = day


class CmrReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.collection = options.get("collection_concept_id")
        self.temporal_start = options.get("temporal_start")
        self.temporal_end = options.get("temporal_end")
        self.bbox = options.get("bbox")  # "w,s,e,n"
        self.page_size = min(
            max(1, int(options.get("page_size", DEFAULT_PAGE_SIZE))),
            DEFAULT_PAGE_SIZE,
        )
        self.fixture_dir = options.get("fixture_dir")
        self.endpoint = options.get("endpoint")

    # --- Catalyst filter pushdown (A2/A4) -------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:  # noqa: F821
        """Fold supported predicates into the catalog request; return
        the rest for Spark to evaluate post-scan."""
        unsupported = []
        for f in filters:
            col = f.attribute[-1] if hasattr(f, "attribute") else None
            if isinstance(f, EqualTo) and col == "collection_concept_id":
                self.collection = f.value
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)) and col == "time_start":
                self.temporal_start = str(f.value)
            elif isinstance(f, (LessThan, LessThanOrEqual)) and col == "time_end":
                self.temporal_end = str(f.value)
            else:
                unsupported.append(f)
        return unsupported

    # --- partition planning: one task per day (A22) ----------------------
    def partitions(self) -> list[InputPartition]:
        if self.temporal_start and self.temporal_end:
            start = dt.date.fromisoformat(self.temporal_start[:10])
            end = dt.date.fromisoformat(self.temporal_end[:10])
            days = [
                (start + dt.timedelta(days=i)).isoformat()
                for i in range((end - start).days + 1)
            ]
            return [_DayPartition(d) for d in days]
        if self.fixture_dir:
            days = sorted(
                f[:-5]
                for f in os.listdir(self.fixture_dir)
                if f.endswith(".json")
            )
            return [_DayPartition(d) for d in days]
        return [_DayPartition("all")]

    # --- scan ----------------------------------------------------------------
    def read(self, partition: _DayPartition) -> Iterator[tuple]:
        if self.fixture_dir:
            yield from self._read_fixture(partition.day)
        elif self.endpoint:
            yield from self._read_http(partition.day)
        else:
            raise ValueError(
                "cmr source needs either fixture_dir (offline) or endpoint"
            )

    def _entry_to_row(self, entry: dict) -> tuple:
        links = entry.get("links") or None
        if links is not None:
            links = [
                (
                    (l or {}).get("rel"),
                    (l or {}).get("title"),
                    (l or {}).get("hreflang"),
                    (l or {}).get("href"),
                )
                for l in links
            ]
        return tuple(
            links
            if f.name == "links"
            else None
            if f.name == "_corrupt_record"
            else entry.get(f.name)
            for f in self.schema.fields
        )

    def _matches(self, entry: dict, day: str) -> bool:
        """Residual source-side filtering for fixtures: mimic what the
        real catalog applies server-side for the pushed predicates."""
        if self.collection and entry.get("collection_concept_id") != self.collection:
            return False
        if day != "all" and entry.get("time_start", "")[:10] not in ("", day):
            return False
        return True

    def _read_fixture(self, day: str) -> Iterator[tuple]:
        if day == "all":
            paths = [
                os.path.join(self.fixture_dir, f)
                for f in sorted(os.listdir(self.fixture_dir))
                if f.endswith(".json")
            ]
        else:
            p = os.path.join(self.fixture_dir, f"{day}.json")
            paths = [p] if os.path.exists(p) else []
        for path in paths:
            with open(path) as fh:
                data = json.load(fh)
            for entry in data.get("feed", {}).get("entry", []):
                if self._matches(entry, day):
                    yield self._entry_to_row(entry)

    def _read_http(self, day: str) -> Iterator[tuple]:
        """Cursor-paginated scan of one day window (cmr_api.py:55-71):
        page_size-capped GETs following the ``cmr-search-after``
        header until exhausted. stdlib urllib; per-task, so total
        concurrency = number of day partitions running."""
        import urllib.parse
        import urllib.request

        params = {
            "page_size": str(self.page_size),
        }
        if self.collection:
            params["collection_concept_id[]"] = self.collection
        if day != "all":
            params["temporal[]"] = f"{day}T00:00:00Z,{day}T23:59:59Z"
        elif self.temporal_start and self.temporal_end:
            params["temporal[]"] = f"{self.temporal_start},{self.temporal_end}"
        if self.bbox:
            params["bounding_box"] = self.bbox

        search_after = None
        while True:
            url = f"{self.endpoint}?{urllib.parse.urlencode(params)}"

            # per-page retry with backoff (sources/retry.py): a
            # transient 429/503 re-fetches THIS page, not the whole
            # day partition via Spark task retry — mirroring the
            # reference control plane's SQS redrive + Batch retries
            # (hls-batch-stack.ts:138-141,294).
            def send(cursor=search_after):
                req = urllib.request.Request(
                    url, headers={"client-id": "hls_stac_parquet_spark"}
                )
                if cursor:
                    req.add_header("cmr-search-after", cursor)
                with urllib.request.urlopen(req, timeout=60) as resp:
                    return resp.status, resp.read(), dict(resp.headers)

            status, body, hdrs = request_with_retries(send)
            if status != 200:
                raise IOError(f"CMR search: HTTP {status} {body[:200]!r}")
            search_after = next(
                (
                    v
                    for k, v in hdrs.items()
                    if k.lower() == "cmr-search-after"
                ),
                None,
            )
            data = json.loads(body.decode())
            entries = data.get("feed", {}).get("entry", [])
            for entry in entries:
                yield self._entry_to_row(entry)
            if not search_after or not entries:
                return


class CmrDataSource(DataSource):
    """``spark.read.format("cmr")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "cmr"

    def schema(self) -> StructType:
        return CMR_GRANULE_SCHEMA

    def reader(self, schema: StructType) -> CmrReader:
        return CmrReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "CmrStreamReader":
        return CmrStreamReader(schema, self.options)


def register_cmr_source(spark) -> None:
    spark.dataSource.register(CmrDataSource)


class CmrStreamReader(SimpleDataSourceStreamReader):
    """Incremental daily-ingest stream over the CMR catalog fixtures —
    the reference's event path E3 (batch_publisher → one SNS message
    per day → per-day Lambda job, infrastructure/lambda/
    batch_publisher.py:121-169) collapsed into a Structured Streaming
    source: the offset IS the day cursor, a checkpoint replaces the
    skip-existing HEAD probe (links.py:100-103), and replay between
    committed offsets is deterministic by construction (day files are
    immutable once written).

    Use with ``spark.readStream.format("cmr")`` +
    ``Trigger.AvailableNow`` for catch-up-then-stop daily ingest.
    Offsets are ``{"next_day": "YYYY-MM-DD"}``.

    Two modes, mirroring the batch reader:

    - ``fixture_dir`` (offline/tests): each microbatch consumes every
      fixture day ≥ the cursor that exists at read time.
    - ``endpoint`` (live): each trigger polls the catalog for the
      COMPLETE UTC days ≥ the cursor (a day is complete once it is
      strictly before today — in-flight days are never consumed, so
      replay between committed offsets stays deterministic as long as
      the catalog is append-only for past days, the same assumption
      the reference's daily batch makes). ``start_day`` is required;
      ``max_days_per_batch`` (default 30) bounds a catch-up batch.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.fixture_dir = options.get("fixture_dir")
        self.endpoint = options.get("endpoint")
        if not self.fixture_dir and not self.endpoint:
            raise ValueError(
                "cmr streaming needs fixture_dir (offline) or endpoint "
                "(live polling)"
            )
        self.start_day = options.get("start_day", "")
        if self.endpoint and not self.fixture_dir and not self.start_day:
            raise ValueError("endpoint-mode cmr streaming needs start_day")
        self.max_days_per_batch = max(
            1, int(options.get("max_days_per_batch", 30))
        )
        # test seam: pin "today" so complete-day cutoff is deterministic
        self._today_override = options.get("clock_today")
        # reuse the batch reader's row conversion + residual filters
        self._batch = CmrReader(schema, options)

    def _today(self) -> str:
        if self._today_override:
            return self._today_override
        return dt.datetime.now(dt.timezone.utc).date().isoformat()

    def _available_days(self, cursor: str) -> list[str]:
        """Days ≥ cursor ready to consume, in order, capped per batch."""
        if self.fixture_dir:
            days = sorted(
                f[:-5]
                for f in os.listdir(self.fixture_dir)
                if f.endswith(".json")
            )
            days = [d for d in days if d >= cursor]
        else:
            if not cursor:
                return []
            today = self._today()
            days, d = [], dt.date.fromisoformat(cursor)
            while d.isoformat() < today:
                days.append(d.isoformat())
                d += dt.timedelta(days=1)
        return days[: self.max_days_per_batch]

    def initialOffset(self) -> dict:
        return {"next_day": self.start_day}

    def read(self, start: dict):
        days = self._available_days(start["next_day"])
        if not days:
            return [], start
        end = {"next_day": (
            dt.date.fromisoformat(days[-1]) + dt.timedelta(days=1)
        ).isoformat()}
        return self._rows(days), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay: re-fetch exactly the committed [start, end) day range
        if self.fixture_dir:
            days = sorted(
                f[:-5]
                for f in os.listdir(self.fixture_dir)
                if f.endswith(".json")
            )
        else:
            days, d = [], dt.date.fromisoformat(start["next_day"])
            last = dt.date.fromisoformat(end["next_day"])
            while d < last:
                days.append(d.isoformat())
                d += dt.timedelta(days=1)
        days = [d for d in days if start["next_day"] <= d < end["next_day"]]
        # MUST be an iterator: unlike read() (driver-side, list is
        # fine for the prefetch cache), readBetweenOffsets executes
        # on the EXECUTOR during crash-recovery replay, where the
        # data-source worker rejects a list return. Returning a list
        # here made every restart-after-failure die with
        # DATA_SOURCE_INVALID_RETURN_TYPE (caught by
        # tests/test_streaming.py::test_cmr_stream_kill_and_resume_…).
        return iter(self._rows(days))

    def _rows(self, days: list[str]) -> list:
        # materialized list, not a generator: the prefetching cache
        # copy.copy()s the iterator on partition planning, and daily
        # manifests are control-plane-sized by construction
        rows: list = []
        for day in days:
            if self.fixture_dir:
                rows.extend(self._batch._read_fixture(day))
            else:
                rows.extend(self._batch._read_http(day))
        return rows


