"""Food supply gap transformer — Spark re-expression of
reference datasets/food_supply_gap/transformer.py (semantics, not code):

:28-30  drop Socrata ':' metadata columns
:36-41  static rename map
:49-60  coercing numeric casts (pandas to_numeric errors='coerce')
:50-51  string cast + strip
:63-68  percentage out of [0,100] -> NULL with warning
:70-72  NaN -> NULL (native in Spark)
:75     drop_duplicates(subset=[year, nta_code], keep='last')
:81     sort by (year, rank), NULLs last
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.operators.dedup import dedup_keep_last
from nyc_open_data_pipeline_spark.pipeline.base import BaseTransformer
from nyc_open_data_pipeline_spark.pipeline.schema import ColumnSpec, TableSchema

RENAMES = {
    "data_year": "year",
    "nta2020": "nta_code",
    "ntaname": "nta_name",
    "boro": "borough",
    "supply_gap": "supply_gap_lbs",
    "supply_gap_percent": "supply_gap_pct",
    "gap_rank": "rank",
}


class FoodSupplyGapTransformer(BaseTransformer):
    dataset_id = "food_supply_gap"

    def transform(self, df: DataFrame) -> DataFrame:
        df = self.drop_metadata_columns(df)
        df = self.standardize_column_names(df)
        df = df.withColumnsRenamed({k: v for k, v in RENAMES.items() if k in df.columns})
        self.validate_required_columns(df, ["year", "nta_code"])

        df = df.withColumns(
            {
                "year": F.col("year").cast("int"),
                "nta_code": F.trim(F.col("nta_code").cast("string")),
                "supply_gap_lbs": F.col("supply_gap_lbs").cast("double"),
                "rank": F.col("rank").cast("int"),
                # out-of-range percentages -> NULL (V4)
                "supply_gap_pct": F.when(
                    F.col("supply_gap_pct").cast("double").between(0, 100),
                    F.col("supply_gap_pct").cast("double"),
                ),
            }
        )
        # keep='last' dedup needs explicit arrival order: connectors thread a
        # monotonically increasing __arrival_id; fall back to stable hash of
        # the whole row when absent (deterministic, documented deviation)
        if "__arrival_id" not in df.columns:
            df = df.withColumn("__arrival_id", F.monotonically_increasing_id())
        df = dedup_keep_last(df, keys=["year", "nta_code"], order_by=["__arrival_id"])
        df = df.drop("__arrival_id")
        return df.orderBy(
            F.col("year").asc_nulls_last(), F.col("rank").asc_nulls_last()
        )

    def get_schema(self) -> TableSchema:
        return TableSchema(
            table_name="food_supply_gaps",
            columns=[
                ColumnSpec("year", "integer", required=True),
                ColumnSpec("nta_code", "VARCHAR(10)", required=True),
                ColumnSpec("nta_name", "string"),
                ColumnSpec("borough", "string"),
                ColumnSpec("supply_gap_lbs", "NUMERIC(14,2)"),
                ColumnSpec("supply_gap_pct", "FLOAT", min=0, max=100),
                ColumnSpec("rank", "integer"),
            ],
            unique_keys=["year", "nta_code"],
            partition_by=["year"],
        )
