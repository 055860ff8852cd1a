"""NTA 2020 polygons transformer — Spark re-expression of
reference datasets/ntas_2020/transformer.py:

:49      drop ':' metadata columns (list-comprehension variant)
:31-46   static rename map
:52-55   coercing numeric casts
:58-59 + :94-121  GeoJSON -> WKT with NULL-on-failure
:117     serialize geometry as WKT string

Engine addition: the GeoJSON string is retained alongside WKT
(``geometry_geojson``) because serving re-derives GeoJSON (G4) — keeping it
at ingest is the cheapest round-trip-exact path (SURVEY §2.11 G4 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.functions.geo import geojson_to_wkt
from nyc_open_data_pipeline_spark.pipeline.base import BaseTransformer
from nyc_open_data_pipeline_spark.pipeline.schema import ColumnSpec, TableSchema

RENAMES = {
    "ntaname": "nta_name",
    "boroname": "borough",
    "shape_star": "shape_area",
    "the_geom": "geometry_geojson",
}


class NtaTransformer(BaseTransformer):
    dataset_id = "ntas_2020"

    def transform(self, df: DataFrame) -> DataFrame:
        df = self.drop_metadata_columns(df)
        df = self.standardize_column_names(df)
        df = df.withColumnsRenamed({k: v for k, v in RENAMES.items() if k in df.columns})
        self.validate_required_columns(df, ["nta2020", "geometry_geojson"])
        df = df.withColumns(
            {
                "nta2020": F.trim(F.col("nta2020").cast("string")),
                "shape_area": F.col("shape_area").cast("double"),
                "geometry": geojson_to_wkt(F.col("geometry_geojson")),
            }
        )
        cols = [
            c
            for c in ("nta2020", "nta_name", "borough", "shape_area", "geometry", "geometry_geojson")
            if c in df.columns
        ]
        return df.select(*cols)

    def get_schema(self) -> TableSchema:
        return TableSchema(
            table_name="ntas_2020",
            columns=[
                ColumnSpec("nta2020", "VARCHAR(10)", required=True, primary_key=True),
                ColumnSpec("nta_name", "string"),
                ColumnSpec("borough", "string"),
                ColumnSpec("shape_area", "FLOAT"),
                ColumnSpec("geometry", "GEOMETRY('MULTIPOLYGON', srid=4326)"),
                ColumnSpec("geometry_geojson", "TEXT"),
            ],
            unique_keys=["nta2020"],
        )
