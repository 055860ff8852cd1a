"""URL file connector (reference S4/S5/S9/S10, url_fetcher.py:19-69).

Driver-side download with cache-skip, then hand off to Spark's native
distributed readers (csv/json/parquet dispatch on extension, with the
reference's fallback-to-csv behavior).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from nyc_open_data_pipeline_spark.sources.http import download


def read_url(
    spark: SparkSession,
    url: str,
    cache_dir: str,
    dataset_id: str = "url_dataset",
    schema: StructType | None = None,
    force: bool = False,
) -> DataFrame:
    """Download (cached, streamed) then read with the matching Spark reader.

    The download is a one-time driver-side step (the reference's model);
    everything after — parse, filter, write — is distributed. For sources
    that are *already* on shared storage, point Spark at them directly.
    """
    filename = os.path.basename(url.split("?")[0]) or f"{dataset_id}.dat"
    dest = os.path.join(cache_dir, dataset_id, filename)
    path = download(url, dest, force=force)
    return read_local(spark, path, schema=schema)


def read_local(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    ext = os.path.splitext(path)[1].lower()
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if ext == ".json" or ext == ".jsonl":
        return reader.json(path)
    if ext == ".parquet":
        return reader.parquet(path)
    if ext == ".orc":
        return reader.orc(path)
    # csv default + fallback (reference url_fetcher.py:58-69)
    return reader.option("header", "true").csv(path)
