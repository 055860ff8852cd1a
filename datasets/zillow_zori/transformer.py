"""Zillow ZORI rent-index transformer — Spark re-expression of
reference datasets/zillow_zori/transformer.py:

:9-10   semi-join filter RegionName to the ZIP universe
:12-17  melt wide monthly columns (one per 'YYYY-MM-DD' column name) to long
        (zip, date, rent_index) — R1
:20     datetime parse of the melted column names — T3
:23     dropna on rent_index — P9
:26-29  latest-per-key: sort date desc, first() per zip — A2
:32-35  rename + projection

Spark shape: native ``unpivot`` (no shuffle, pipelined fan-out), then the
deterministic latest-per-key window (max_by semantics) instead of
sort+groupby-first, which is partition-order-dependent in a distributed
engine.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.pipeline.base import BaseTransformer
from nyc_open_data_pipeline_spark.pipeline.schema import ColumnSpec, TableSchema

DATE_COL = re.compile(r"^\d{4}-\d{2}-\d{2}$")


class ZillowZoriTransformer(BaseTransformer):
    dataset_id = "zillow_zori"

    def __init__(self, zip_codes: list[str] | None = None):
        self.zip_codes = zip_codes

    def transform(self, df: DataFrame) -> DataFrame:
        self.validate_required_columns(df, ["RegionName"])
        date_cols = [c for c in df.columns if DATE_COL.match(c)]
        if not date_cols:
            raise ValueError("no wide-format YYYY-MM-DD columns to melt")
        df = df.withColumn("RegionName", F.trim(F.col("RegionName").cast("string")))
        if self.zip_codes:
            df = df.filter(F.col("RegionName").isin(self.zip_codes))
        long = df.unpivot(
            ids=["RegionName"],
            values=date_cols,
            variableColumnName="date_str",
            valueColumnName="rent_index_raw",
        )
        long = (
            long.withColumn("date", F.to_date("date_str", "yyyy-MM-dd"))
            .withColumn("rent_index", F.col("rent_index_raw").cast("double"))
            .na.drop(subset=["rent_index"])
        )
        w = Window.partitionBy("RegionName").orderBy(F.desc("date"))
        return (
            long.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                F.col("RegionName").alias("zip_code"),
                "date",
                "rent_index",
            )
        )

    def get_schema(self) -> TableSchema:
        return TableSchema(
            table_name="zillow_rent_index",
            columns=[
                ColumnSpec("zip_code", "VARCHAR(10)", required=True, primary_key=True),
                ColumnSpec("date", "DATE", required=True),
                ColumnSpec("rent_index", "NUMERIC(10,2)"),
            ],
            unique_keys=["zip_code"],
        )
