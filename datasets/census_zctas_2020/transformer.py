"""Census ZCTA 2020 boundaries transformer — Spark re-expression of
reference datasets/census_zctas_2020/transformer.py:

:27-28   rename ZCTA5CE20 -> zip_code; semi-join filter to the configured
         ZIP universe (reference filters to NYC's 183 ZIPs, constants.py)
:33      projection to (zip_code, geometry)
:38-40   CRS reprojection happens in the shapefile connector (driver-side)
:10-16,43  Polygon -> MultiPolygon promotion for schema consistency
:45      WKT serialization

The ZIP universe is configuration, not code: pass ``zip_codes`` (the
reference hardcodes NYC's list; any region works).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.functions.geo import (
    promote_to_multipolygon,
    wkt_to_geojson,
)
from nyc_open_data_pipeline_spark.pipeline.base import BaseTransformer
from nyc_open_data_pipeline_spark.pipeline.schema import ColumnSpec, TableSchema


class ZctaTransformer(BaseTransformer):
    dataset_id = "census_zctas_2020"

    def __init__(self, zip_codes: list[str] | None = None):
        self.zip_codes = zip_codes  # None -> keep all

    def transform(self, df: DataFrame) -> DataFrame:
        df = self.standardize_column_names(df)
        if "zcta5ce20" in df.columns:
            df = df.withColumnRenamed("zcta5ce20", "zip_code")
        self.validate_required_columns(df, ["zip_code", "geometry"])
        df = df.withColumn("zip_code", F.trim(F.col("zip_code").cast("string")))
        if self.zip_codes:
            # small literal list -> in-scan IN predicate; a large universe
            # would become a broadcast semi-join (SURVEY P6)
            df = df.filter(F.col("zip_code").isin(self.zip_codes))
        df = df.withColumn("geometry", promote_to_multipolygon(F.col("geometry")))
        df = df.withColumn("geometry_geojson", wkt_to_geojson(F.col("geometry")))
        return df.select("zip_code", "geometry", "geometry_geojson")

    def get_schema(self) -> TableSchema:
        return TableSchema(
            table_name="census_zctas_2020",
            columns=[
                ColumnSpec("zip_code", "VARCHAR(10)", required=True, primary_key=True),
                ColumnSpec("geometry", "GEOMETRY('MULTIPOLYGON', srid=4326)"),
                ColumnSpec("geometry_geojson", "TEXT"),
            ],
            unique_keys=["zip_code"],
        )
