"""Census API data source (reference S6-S7, census_fetcher.py:32-139).

``spark.read.format("census_api").schema(ddl).options(...).load()``

- one InputPartition per geo-id chunk (default 50 ids, the reference's
  URL-length limit, :90) — the reference's sequential chunk loop becomes a
  parallel partitioned scan; the cross-chunk union is implicit across
  partitions (SURVEY S7).
- first response row is the header (:136-139); values map to the declared
  schema by header name, so variable order in the response doesn't matter.

Options: url (api base, e.g. https://api.census.gov/data), year, dataset
(e.g. acs/acs5), variables (comma list), geo_level (e.g.
'zip code tabulation area'), geo_ids (comma list; empty -> '*'),
chunk_size=50, api_key (optional), timeout.
"""

from __future__ import annotations

import urllib.parse
from collections.abc import Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from nyc_open_data_pipeline_spark.sources.http import coercing_caster as _caster
from nyc_open_data_pipeline_spark.sources.http import request_json


class GeoChunk(InputPartition):
    def __init__(self, geo_ids: list[str] | None):
        self.geo_ids = geo_ids  # None -> all ('*')


class CensusReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.base = options.get("url", "https://api.census.gov/data").rstrip("/")
        self.year = options["year"]
        self.dataset = options["dataset"]
        self.variables = [v.strip() for v in options["variables"].split(",")]
        self.geo_level = options.get("geo_level", "zip code tabulation area")
        ids = options.get("geo_ids", "")
        self.geo_ids = [g.strip() for g in ids.split(",") if g.strip()] or None
        self.chunk_size = int(options.get("chunk_size", 50))
        self.api_key = options.get("api_key")
        self.timeout = float(options.get("timeout", 30))
        # schema field that receives the geography column: the live API names
        # that header after geo_level ('zip code tabulation area'), which no
        # sane schema uses as a field name (the reference renames it to
        # zip_code, census_fetcher.py:118-123)
        self.geo_field = options.get("geo_field")

    def partitions(self) -> Sequence[GeoChunk]:
        if not self.geo_ids:
            return [GeoChunk(None)]
        return [
            GeoChunk(self.geo_ids[i : i + self.chunk_size])
            for i in range(0, len(self.geo_ids), self.chunk_size)
        ]

    def read(self, partition: GeoChunk):
        params = {
            "get": ",".join(self.variables),
            "for": f"{self.geo_level}:"
            + ("*" if partition.geo_ids is None else ",".join(partition.geo_ids)),
        }
        if self.api_key:
            params["key"] = self.api_key
        url = (
            f"{self.base}/{self.year}/{self.dataset}?"
            + urllib.parse.urlencode(params, quote_via=urllib.parse.quote)
        )
        payload = request_json(url, timeout=self.timeout)
        if not payload:
            return
        header, *rows = payload  # first row is the header (:136-139)
        idx = {h: i for i, h in enumerate(header)}
        names = [f.name for f in self.schema_.fields]
        # alias the geo_level-named header onto the schema's geography field:
        # explicitly via the geo_field option, else auto-bind when exactly one
        # schema field is absent from the response header
        if self.geo_level in idx:
            if self.geo_field and self.geo_field not in idx:
                idx[self.geo_field] = idx[self.geo_level]
            else:
                unbound = [n for n in names if n not in idx]
                if len(unbound) == 1:
                    idx[unbound[0]] = idx[self.geo_level]
        casts = [_caster(f.dataType) for f in self.schema_.fields]
        for row in rows:
            yield tuple(
                c(row[idx[n]]) if n in idx else None for n, c in zip(names, casts)
            )


class CensusDataSource(DataSource):
    """``format("census_api")`` — chunked-IN-list reads as partitions."""

    @classmethod
    def name(cls) -> str:
        return "census_api"

    def schema(self):
        raise NotImplementedError("census_api source requires an explicit .schema(...)")

    def reader(self, schema: StructType) -> CensusReader:
        return CensusReader(schema, dict(self.options))
