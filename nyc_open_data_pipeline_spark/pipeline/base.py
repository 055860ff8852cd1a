"""Transformer plugin base class.

The reference's extension point is a whole-DataFrame transform plugin
(datasets/base.py:31-56: abstract ``transform(df) -> df`` +
``get_schema() -> dict``), loaded by dotted path from a YAML registry
(SURVEY §2.14). Here a transformer is ``DataFrame -> DataFrame`` over Spark
DataFrames, used as ``df.transform(t.transform)`` so it composes into the
Catalyst plan lazily.
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.pipeline.schema import TableSchema


class BaseTransformer(ABC):
    """Abstract dataset transformer (reference datasets/base.py:31-56)."""

    dataset_id: str = "unknown"

    @abstractmethod
    def transform(self, df: DataFrame) -> DataFrame:
        """Pure DataFrame -> DataFrame; must not trigger actions."""

    @abstractmethod
    def get_schema(self) -> TableSchema:
        """Declared output schema (drives storage DDL + validation)."""

    # ------------------------------------------------------------------
    # Shared helpers every dataset uses (reference datasets/base.py:58-107)
    # ------------------------------------------------------------------

    @staticmethod
    def standardize_column_names(df: DataFrame) -> DataFrame:
        """snake_case normalizer (reference datasets/base.py:73-90):
        lowercase -> strip non-word chars -> whitespace to underscore.
        Pure name-level rewrite; no expression nodes added."""
        return df.toDF(*[_snake(c) for c in df.columns])

    def add_metadata(self, df: DataFrame, ingestion_ts=None) -> DataFrame:
        """dataset_id + ingestion timestamp columns (reference base.py:58-71).
        Pass a fixed ``ingestion_ts`` for reproducible runs; defaults to
        current_timestamp() like the reference's datetime.now()."""
        ts = F.lit(ingestion_ts).cast("timestamp") if ingestion_ts else F.current_timestamp()
        return df.withColumn("dataset_id", F.lit(self.dataset_id)).withColumn(
            "ingestion_timestamp", ts
        )

    @staticmethod
    def validate_required_columns(df: DataFrame, required: list[str]) -> None:
        """Raise ValueError on missing columns (reference base.py:92-107)."""
        missing = set(required) - set(df.columns)
        if missing:
            raise ValueError(f"missing required columns: {sorted(missing)}")

    @staticmethod
    def drop_metadata_columns(df: DataFrame, prefix: str = ":") -> DataFrame:
        """Strip source-metadata columns, e.g. Socrata ':id'/':created_at'
        (reference food_supply_gap/transformer.py:28-30)."""
        return df.select(*[c for c in df.columns if not c.startswith(prefix)])


def _snake(name: str) -> str:
    s = name.strip().lower()
    s = re.sub(r"[^\w\s]", "", s)
    s = re.sub(r"\s+", "_", s)
    return s
