"""Geospatial queries (reference G1-G4, SURVEY §2.11).

The driver's test corpus has no geometry column, so these queries CONSTRUCT
deterministic geometries from `nation` keys (a point / unit-square polygon
per nation), then exercise the engine's real geo operators on them:
GeoJSON->WKT parse (reference ntas_2020/transformer.py:94-121),
Polygon->MultiPolygon promotion (census_zctas_2020/transformer.py:10-16),
WKT->GeoJSON (routes.py:29 ST_AsGeoJSON), and the GeoJSON FeatureCollection
document build (routes.py:23-46 json_agg(json_build_object(...))).

DuckDB oracles rebuild the exact same strings with pure string SQL, so the
UDF round-trips are value-verified, not just row-counted. Geometry columns
belong to dimension tables at reference scale (~200 polygons) — the Python
UDF path is acceptable there; Sedona would replace it wholesale for
fact-side geometry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.functions import geo as GEO
from nyc_open_data_pipeline_spark.plans.common import t
from nyc_open_data_pipeline_spark.plans.registry import register

# x = nationkey, y = regionkey, as doubles (both engines print 1.0 the same)
_SQL_X = "CAST(CAST(n_nationkey AS DOUBLE) AS VARCHAR)"
_SQL_Y = "CAST(CAST(n_regionkey AS DOUBLE) AS VARCHAR)"
_SQL_X1 = "CAST(CAST(n_nationkey + 1 AS DOUBLE) AS VARCHAR)"
_SQL_Y1 = "CAST(CAST(n_regionkey + 1 AS DOUBLE) AS VARCHAR)"


def _point_geojson() -> F.Column:
    """'{"type":"Point","coordinates":[x,y]}' per nation row."""
    return F.concat(
        F.lit('{"type":"Point","coordinates":['),
        F.col("n_nationkey").cast("double").cast("string"),
        F.lit(","),
        F.col("n_regionkey").cast("double").cast("string"),
        F.lit("]}"),
    )


def _square_geojson() -> F.Column:
    """Unit-square Polygon GeoJSON anchored at (x, y)."""
    x = F.col("n_nationkey").cast("double").cast("string")
    y = F.col("n_regionkey").cast("double").cast("string")
    x1 = (F.col("n_nationkey") + 1).cast("double").cast("string")
    y1 = (F.col("n_regionkey") + 1).cast("double").cast("string")

    def pt(a: F.Column, b: F.Column) -> F.Column:
        return F.concat(F.lit("["), a, F.lit(","), b, F.lit("]"))

    ring = F.concat_ws(
        ",", pt(x, y), pt(x1, y), pt(x1, y1), pt(x, y1), pt(x, y)
    )
    return F.concat(
        F.lit('{"type":"Polygon","coordinates":[['), ring, F.lit("]]}")
    )


@register(
    "g1_geojson_to_wkt",
    oracle=f"""
    SELECT n_nationkey,
           'POINT (' || {_SQL_X} || ' ' || {_SQL_Y} || ')' AS wkt
    FROM nation
    """,
    survey_ref="§2.11 G1 (reference ntas_2020/transformer.py:94-121 GeoJSON->WKT)",
)
def g1_geojson_to_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoJSON geometry parse -> WKT via the engine's dependency-free
    converter UDF; the oracle string-builds the expected WKT."""
    n = t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey", GEO.geojson_to_wkt(_point_geojson()).alias("wkt")
    )


@register(
    "g3_promote_multipolygon",
    oracle=f"""
    SELECT n_nationkey,
           'MULTIPOLYGON ((('
             || {_SQL_X} || ' ' || {_SQL_Y} || ', '
             || {_SQL_X1} || ' ' || {_SQL_Y} || ', '
             || {_SQL_X1} || ' ' || {_SQL_Y1} || ', '
             || {_SQL_X} || ' ' || {_SQL_Y1} || ', '
             || {_SQL_X} || ' ' || {_SQL_Y} || ')))' AS wkt
    FROM nation
    """,
    survey_ref="§2.11 G1+G3 (reference census_zctas_2020/transformer.py:10-16 "
    "Polygon->MultiPolygon promotion)",
)
def g3_promote_multipolygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon GeoJSON -> WKT -> MULTIPOLYGON promotion (schema-consistency
    idiom for mixed polygon feeds)."""
    n = t(spark, sf_dir, "nation")
    wkt = GEO.geojson_to_wkt(_square_geojson())
    return n.select(
        "n_nationkey", GEO.promote_to_multipolygon(wkt).alias("wkt")
    )


@register(
    "g4_wkt_to_geojson",
    oracle=f"""
    SELECT n_nationkey,
           '{{"type":"Point","coordinates":[' || {_SQL_X} || ',' || {_SQL_Y} || ']}}'
             AS geojson
    FROM nation
    """,
    survey_ref="§2.11 G4 (reference routes.py:29 ST_AsGeoJSON(geom))",
)
def g4_wkt_to_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKT -> GeoJSON round-trip (parse the WKT the engine itself produced,
    re-serialize as compact GeoJSON — coordinate formatting must be stable
    across the round-trip, SURVEY §7.4 hard-part #5)."""
    n = t(spark, sf_dir, "nation")
    wkt = GEO.geojson_to_wkt(_point_geojson())
    return n.select("n_nationkey", GEO.wkt_to_geojson(wkt).alias("geojson"))


@register(
    "g5_feature_collection",
    oracle=f"""
    WITH f AS (
      SELECT n_regionkey, n_name,
             '{{"type":"Feature","geometry":{{"type":"Point","coordinates":['
               || {_SQL_X} || ',' || {_SQL_Y}
               || ']}},"properties":{{"name":"' || n_name || '"}}}}' AS feature
      FROM nation
    )
    SELECT n_regionkey,
           '{{"type":"FeatureCollection","features":['
             || string_agg(feature, ',' ORDER BY n_name) || ']}}' AS feature_collection,
           COUNT(*) AS n_features
    FROM f GROUP BY n_regionkey
    """,
    survey_ref="§2.6 A3 + §2.11 G4 + §2.2 K6 (reference routes.py:23-46 "
    "json_build_object FeatureCollection; scripts/export_static_data.py:118-147)",
)
def g5_feature_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's serving document: one GeoJSON FeatureCollection per
    group, features deterministically ordered (collect_list alone is
    partition-order-dependent — sort inside the aggregate)."""
    n = t(spark, sf_dir, "nation")
    feature = F.concat(
        F.lit('{"type":"Feature","geometry":'),
        GEO.wkt_to_geojson(GEO.geojson_to_wkt(_point_geojson())),
        F.lit(',"properties":{"name":"'),
        F.col("n_name"),
        F.lit('"}}'),
    )
    per_region = (
        n.select("n_regionkey", "n_name", feature.alias("feature"))
        .groupBy("n_regionkey")
        .agg(
            F.array_sort(F.collect_list(F.struct("n_name", "feature"))).alias("fs"),
            F.count("*").alias("n_features"),
        )
    )
    return per_region.select(
        "n_regionkey",
        F.concat(
            F.lit('{"type":"FeatureCollection","features":['),
            F.array_join(F.transform("fs", lambda s: s.feature), ","),
            F.lit("]}"),
        ).alias("feature_collection"),
        "n_features",
    )
