"""JSONL (newline-delimited JSON) corpus I/O — the interchange format most
LLM-data tooling speaks (one document object per line, usually gzipped).

Spark's native json reader/writer already does the heavy lifting; this
module pins the engine's conventions:

- ALWAYS pass an explicit schema on read. Schema inference scans the whole
  corpus once before the real read — at 100 TB that doubles the job. An
  explicit schema also keeps field types stable when a batch happens to
  contain only nulls for a column.
- gzip per-file compression by default: JSONL.gz files are splittable at
  the FILE level only, so writers should emit many medium files (the
  partition count at write time controls this) rather than one giant one.
- ``partition_by`` (e.g. split) produces the same directory layout the
  parquet cleanroom writer uses, so downstream consumers can switch
  formats without changing path logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    codec: str = "gzip",
) -> None:
    w = df.write.mode("overwrite").option("compression", codec)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-first JSONL scan (no inference pass; see module docstring)."""
    return spark.read.schema(schema).json(path)
