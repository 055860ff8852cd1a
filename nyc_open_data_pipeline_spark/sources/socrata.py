"""Socrata SODA3 data source (reference S1-S3, nyc_open_data_fetcher.py:36-179).

Spark-native redesign of the reference's driver-side pagination loop:

- ``spark.read.format("socrata").schema(ddl).options(...).load()``
- **partition planning**: the page space is split into page *ranges*, one
  InputPartition each — pages fetch in parallel across executors instead of
  sequentially on the driver. ``total_limit`` bounds the page space; without
  it a single partition paginates until a short page (the reference's
  stop condition, :108-115).
- **predicate pushdown** (S2): equality / IN filters on top-level columns
  translate to a SoQL ``SELECT * WHERE ...`` shipped in the request body,
  with literal quoting by declared column type (:64-77). Supported filters
  are consumed (not re-evaluated by Spark); the rest stay in the plan.
- **retry/429** (S3): each partition reader applies exponential backoff and
  honors Retry-After via sources.http.

Options: url (site base), dataset_id, page_size=1000, total_limit,
partition_pages (pages per partition), max_concurrency (rate-limit guard:
coalesce to at most this many partitions, bounding simultaneous in-flight
requests), filters (JSON object, merged with pushed filters), timeout.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import NumericType, StructType

from nyc_open_data_pipeline_spark.sources.http import coercing_caster as _caster
from nyc_open_data_pipeline_spark.sources.http import request_json


class PageRange(InputPartition):
    def __init__(self, start_page: int, end_page: int | None):
        self.start_page = start_page
        self.end_page = end_page  # None -> paginate until short page


def _soql_literal(value, is_numeric: bool) -> str:
    if is_numeric:
        return str(value)
    escaped = str(value).replace("'", "''")
    return f"'{escaped}'"


def build_soql(filters: dict, schema: StructType, in_lists: dict | None = None) -> str | None:
    """filter dict -> SoQL WHERE clause (reference :64-77 semantics)."""
    numeric = {f.name for f in schema.fields if isinstance(f.dataType, NumericType)}
    clauses = []
    for k in sorted(filters):
        clauses.append(f"{k} = {_soql_literal(filters[k], k in numeric)}")
    for k in sorted(in_lists or {}):
        vals = ", ".join(_soql_literal(v, k in numeric) for v in in_lists[k])
        clauses.append(f"{k} IN ({vals})")
    if not clauses:
        return None
    return "SELECT * WHERE " + " AND ".join(clauses)


class SocrataReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.base_url = options["url"].rstrip("/")
        self.dataset_id = options["dataset_id"]
        self.page_size = int(options.get("page_size", 1000))
        self.total_limit = int(options["total_limit"]) if "total_limit" in options else None
        self.partition_pages = int(options.get("partition_pages", 10))
        self.max_concurrency = (
            int(options["max_concurrency"]) if "max_concurrency" in options else None
        )
        self.timeout = float(options.get("timeout", 30))
        self.filters = json.loads(options.get("filters", "{}"))
        self.pushed_eq: dict = {}
        self.pushed_in: dict = {}

    # -- predicate pushdown (S2) ---------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:  # noqa: F821
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self.pushed_eq[f.attribute[0]] = f.value
            elif isinstance(f, In) and len(f.attribute) == 1:
                self.pushed_in[f.attribute[0]] = list(f.values)
            else:
                yield f  # unsupported -> Spark evaluates it

    # -- partition planning --------------------------------------------
    def partitions(self) -> Sequence[PageRange]:
        """One InputPartition per page range. ``max_concurrency`` is the
        API rate-limit guard (round-11 verdict #7): each partition fetches
        its pages SEQUENTIALLY, so in-flight requests <= live partitions —
        coalescing the page space into at most ``max_concurrency`` ranges
        bounds simultaneous requests structurally, across executor
        processes, with no shared semaphore (the reference serializes by
        being one process; a 1000-executor scan must not hammer the API
        with 1000 concurrent pages)."""
        if self.total_limit is None:
            return [PageRange(1, None)]
        n_pages = max(1, -(-self.total_limit // self.page_size))
        step = self.partition_pages
        if self.max_concurrency is not None:
            n_parts = -(-n_pages // step)
            if n_parts > self.max_concurrency:
                step = -(-n_pages // self.max_concurrency)
        return [
            PageRange(p, min(p + step - 1, n_pages))
            for p in range(1, n_pages + 1, step)
        ]

    # -- per-partition fetch (S1 + S3) ---------------------------------
    def read(self, partition: PageRange):
        url = f"{self.base_url}/api/v3/views/{self.dataset_id}/query.json"
        soql = build_soql(self.filters | self.pushed_eq, self.schema_, self.pushed_in)
        names = [f.name for f in self.schema_.fields]
        casts = [_caster(f.dataType) for f in self.schema_.fields]
        page = partition.start_page
        while partition.end_page is None or page <= partition.end_page:
            body: dict = {"page": {"pageNumber": page, "pageSize": self.page_size}}
            if soql:
                body["query"] = soql
            payload = request_json(url, body=body, timeout=self.timeout)
            # SODA3 responses are either {"data": [...]} or a bare list (:96-106)
            rows = payload.get("data", payload) if isinstance(payload, dict) else payload
            if not rows:
                return
            for rec in rows:
                yield tuple(c(rec.get(n)) for n, c in zip(names, casts))
            if len(rows) < self.page_size:  # short page -> done (:108-115)
                return
            page += 1




class SocrataStreamReader(SimpleDataSourceStreamReader):
    """Streaming SODA3 reads: continuous ingestion from an append-only
    dataset (the reference's cron-driven re-ingest flow, run as a
    Structured Streaming source instead). The offset is the ROW COUNT
    ingested so far — append-only Socrata datasets serve stable pagination
    below that line, which makes ``readBetweenOffsets`` a deterministic
    replay (exactly the recovery contract checkpoints need).

    Simple-reader semantics fit an API poll (driver-side prefetch of at
    most ``pages_per_batch`` pages per micro-batch — the rate limiter is
    the page budget); the batch reader above remains the bulk-backfill
    path with executor-parallel page ranges."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.base_url = options["url"].rstrip("/")
        self.dataset_id = options["dataset_id"]
        self.page_size = int(options.get("page_size", 1000))
        self.pages_per_batch = int(options.get("pages_per_batch", 10))
        self.timeout = float(options.get("timeout", 30))
        self.names = [f.name for f in schema.fields]
        self.casts = [_caster(f.dataType) for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"rows": 0}

    def _fetch_page(self, page_number: int) -> list:
        url = f"{self.base_url}/api/v3/views/{self.dataset_id}/query.json"
        body = {"page": {"pageNumber": page_number, "pageSize": self.page_size}}
        payload = request_json(url, body=body, timeout=self.timeout)
        rows = payload.get("data", payload) if isinstance(payload, dict) else payload
        return rows or []

    def _rows_from(self, start_row: int, max_pages: int, stop_row: int | None = None):
        """Rows starting at absolute row ``start_row``, at most ``max_pages``
        page fetches, optionally clipped to ``stop_row`` (exclusive)."""
        out = []
        page = start_row // self.page_size + 1
        skip = start_row % self.page_size
        for _ in range(max_pages):
            rows = self._fetch_page(page)
            take = rows[skip:]
            if stop_row is not None:
                remaining = stop_row - (start_row + len(out))
                take = take[:remaining]
            out.extend(take)
            short = len(rows) < self.page_size
            if short or (stop_row is not None and start_row + len(out) >= stop_row):
                break
            page += 1
            skip = 0
        return out

    def read(self, start: dict):
        rows = self._rows_from(int(start["rows"]), self.pages_per_batch)
        tuples = [
            tuple(c(rec.get(n)) for n, c in zip(self.names, self.casts))
            for rec in rows
        ]
        return iter(tuples), {"rows": int(start["rows"]) + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = self._rows_from(
            int(start["rows"]),
            max_pages=2 * self.pages_per_batch + 2,
            stop_row=int(end["rows"]),
        )
        return iter(
            tuple(c(rec.get(n)) for n, c in zip(self.names, self.casts))
            for rec in rows
        )

    def commit(self, end: dict) -> None:
        pass  # source-side state lives on the server; nothing to release


class SocrataDataSource(DataSource):
    """``format("socrata")`` — SODA3 paginated reads as partitioned scans."""

    @classmethod
    def name(cls) -> str:
        return "socrata"

    def schema(self):
        raise NotImplementedError(
            "socrata source requires an explicit .schema(...) — raw SODA3 "
            "records are schemaless (reference reads them into an untyped "
            "frame; the engine requires the declared dataset schema instead)"
        )

    def reader(self, schema: StructType) -> SocrataReader:
        return SocrataReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> SocrataStreamReader:
        return SocrataStreamReader(schema, dict(self.options))
