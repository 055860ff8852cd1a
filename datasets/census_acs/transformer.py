"""ACS poverty/income transformer — Spark re-expression of
reference datasets/census_acs/transformer.py:

:16,19-20  config-driven variable-code -> friendly-name rename
:24-27     coercing numeric casts
:26-33     negative Census sentinels (-666666666 family) -> NULL
:36-38     poverty_rate = poverty_count / poverty_universe * 100, round(2)
:40-44     NaN -> NULL (native)
:47        year literal column
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.pipeline.base import BaseTransformer
from nyc_open_data_pipeline_spark.pipeline.schema import ColumnSpec, TableSchema

VARIABLES = {
    "B17001_002E": "poverty_count",
    "B17001_001E": "poverty_universe",
    "B19013_001E": "median_household_income",
}
YEAR = 2023


class CensusAcsTransformer(BaseTransformer):
    dataset_id = "census_acs"

    def __init__(self, variables: dict[str, str] | None = None, year: int = YEAR):
        self.variables = variables or VARIABLES
        self.year = year

    def transform(self, df: DataFrame) -> DataFrame:
        df = df.withColumnsRenamed(
            {k: v for k, v in self.variables.items() if k in df.columns}
        )
        if "zcta" in df.columns:
            df = df.withColumnRenamed("zcta", "zip_code")
        self.validate_required_columns(df, ["zip_code"])

        numeric_cols = [c for c in self.variables.values() if c in df.columns]
        # coerce then sentinel-null: Census encodes missing as large negatives
        df = df.withColumns(
            {
                c: F.when(F.col(c).cast("double") < 0, F.lit(None)).otherwise(
                    F.col(c).cast("double")
                )
                for c in numeric_cols
            }
        )
        df = df.withColumn(
            "poverty_rate",
            F.round(F.col("poverty_count") / F.col("poverty_universe") * 100, 2),
        )
        return df.select(
            F.trim(F.col("zip_code").cast("string")).alias("zip_code"),
            F.col("poverty_count").cast("int").alias("poverty_count"),
            F.col("poverty_universe").cast("int").alias("poverty_universe"),
            "poverty_rate",
            F.col("median_household_income").cast("int").alias("median_household_income"),
            F.lit(self.year).alias("year"),
        )

    def get_schema(self) -> TableSchema:
        return TableSchema(
            table_name="census_acs_poverty",
            columns=[
                ColumnSpec("zip_code", "VARCHAR(10)", required=True, primary_key=True),
                ColumnSpec("poverty_count", "integer"),
                ColumnSpec("poverty_universe", "integer"),
                ColumnSpec("poverty_rate", "FLOAT", min=0, max=100),
                ColumnSpec("median_household_income", "integer"),
                ColumnSpec("year", "integer", required=True),
            ],
            unique_keys=["zip_code", "year"],
            partition_by=["year"],
        )
