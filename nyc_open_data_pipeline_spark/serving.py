"""Serving-path analytical queries (reference §3.2/§3.3): the three GeoJSON
FeatureCollection documents, as Spark SQL over engine-stored tables.

Faithfully reproduces the reference's observed semantics, including the
J1+J4 quirk: ``ntas LEFT JOIN gaps ... WHERE gaps.year = (SELECT MAX(year))``
filters on the right side of a left join, silently collapsing it to inner
(SURVEY §2.5 J4 note; routes.py:43-46) — reproduced, and documented here.

Each document function returns the JSON string; ``export_static`` writes the
three files the frontend consumes (materialized-view pattern, §3.3).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.functions.json_doc import feature_collection
from nyc_open_data_pipeline_spark.pipeline.storage import ParquetStorage

EMPTY = '{"type":"FeatureCollection","features":[]}'


def _doc(df: DataFrame, geom_col: str, props: list[str], sort_key: str) -> str:
    # single Spark job: the collected row already distinguishes the empty
    # input (aggregating zero rows yields no row / a NULL document)
    rows = feature_collection(df, geom_col, props, sort_key).collect()
    if not rows or rows[0]["document"] is None:
        return EMPTY  # empty fallback (routes.py:95-97)
    return rows[0]["document"]


def food_gaps_document(spark: SparkSession, storage: ParquetStorage) -> str:
    """GET /api/food-gaps (routes.py:10-57): NTA polygons x latest-year food
    gaps. nta dim is broadcast; the scalar subquery plans as a 1-row
    broadcast, not a driver collect."""
    ntas = storage.read(spark, "ntas_2020")
    gaps = storage.read(spark, "food_supply_gaps")
    ntas.createOrReplaceTempView("ntas_2020")
    gaps.createOrReplaceTempView("food_supply_gaps")
    joined = spark.sql(
        """
        SELECT n.nta2020, n.nta_name, n.borough, n.geometry_geojson,
               f.year, f.supply_gap_lbs, f.supply_gap_pct, f.rank
        FROM ntas_2020 n
        LEFT JOIN food_supply_gaps f ON n.nta2020 = f.nta_code
        WHERE f.year = (SELECT MAX(year) FROM food_supply_gaps)
        """
    )
    return _doc(
        joined,
        "geometry_geojson",
        ["nta2020", "nta_name", "borough", "year", "supply_gap_lbs", "supply_gap_pct", "rank"],
        sort_key="nta2020",
    )


def poverty_by_zip_document(spark: SparkSession, storage: ParquetStorage) -> str:
    """GET /api/poverty-by-zip (routes.py:59-104)."""
    zctas = storage.read(spark, "census_zctas_2020")
    acs = storage.read(spark, "census_acs_poverty")
    zctas.createOrReplaceTempView("census_zctas_2020")
    acs.createOrReplaceTempView("census_acs_poverty")
    joined = spark.sql(
        """
        SELECT z.zip_code, z.geometry_geojson,
               c.poverty_rate, c.median_household_income, c.year
        FROM census_zctas_2020 z
        JOIN census_acs_poverty c ON z.zip_code = c.zip_code
        WHERE c.year = (SELECT MAX(year) FROM census_acs_poverty)
          AND c.poverty_rate IS NOT NULL
          AND c.median_household_income IS NOT NULL
        """
    )
    return _doc(
        joined,
        "geometry_geojson",
        ["zip_code", "poverty_rate", "median_household_income", "year"],
        sort_key="zip_code",
    )


def rent_by_zip_document(spark: SparkSession, storage: ParquetStorage) -> str:
    """GET /api/rent-by-zip (routes.py:106-141)."""
    zctas = storage.read(spark, "census_zctas_2020")
    zori = storage.read(spark, "zillow_rent_index")
    zctas.createOrReplaceTempView("census_zctas_2020")
    zori.createOrReplaceTempView("zillow_rent_index")
    joined = spark.sql(
        """
        SELECT z.zip_code, z.geometry_geojson, r.rent_index,
               CAST(year(r.date) AS INT) AS year
        FROM census_zctas_2020 z
        JOIN zillow_rent_index r ON z.zip_code = r.zip_code
        WHERE r.rent_index IS NOT NULL
        """
    )
    return _doc(
        joined,
        "geometry_geojson",
        ["zip_code", "rent_index", "year"],
        sort_key="zip_code",
    )


EXPORTS = {
    "food-gaps.json": food_gaps_document,
    "poverty-by-zip.json": poverty_by_zip_document,
    "rent-by-zip.json": rent_by_zip_document,
}


def export_static(spark: SparkSession, storage: ParquetStorage, out_dir: str) -> dict[str, str]:
    """scripts/export_static_data.py:118-147: query once, serve from CDN."""
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for filename, fn in EXPORTS.items():
        doc = fn(spark, storage)
        path = os.path.join(out_dir, filename)
        with open(path, "w") as f:
            # validate + compact re-serialize, like the reference's json.dump
            json.dump(json.loads(doc), f, separators=(",", ":"))
        written[filename] = path
    return written
