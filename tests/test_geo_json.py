"""Geo converters (G1-G4) and FeatureCollection construction (A3)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.functions.geo import (
    geojson_to_wkt,
    geojson_to_wkt_py,
    promote_to_multipolygon_py,
    wkt_to_geojson_py,
)
from nyc_open_data_pipeline_spark.functions.json_doc import feature_collection

POLY = {
    "type": "Polygon",
    "coordinates": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
}
MPOLY = {
    "type": "MultiPolygon",
    "coordinates": [[[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 0.0]]]],
}


def test_geojson_wkt_roundtrip():
    for g in (POLY, MPOLY, {"type": "Point", "coordinates": [-73.9, 40.7]}):
        wkt = geojson_to_wkt_py(json.dumps(g))
        back = json.loads(wkt_to_geojson_py(wkt))
        assert back == g, (g, wkt, back)


def test_geojson_parse_failure_nulls():
    # reference ntas_2020/transformer.py:94-121: NULL + warn on bad geometry
    assert geojson_to_wkt_py("not json") is None
    assert geojson_to_wkt_py('{"type": "Weird", "coordinates": []}') is None
    assert geojson_to_wkt_py(None) is None


def test_polygon_promotion():
    wkt = geojson_to_wkt_py(json.dumps(POLY))
    promoted = promote_to_multipolygon_py(wkt)
    assert promoted.startswith("MULTIPOLYGON ((")
    parsed = json.loads(wkt_to_geojson_py(promoted))
    assert parsed["type"] == "MultiPolygon"
    assert parsed["coordinates"] == [POLY["coordinates"]]


def test_geo_udfs_on_spark(spark):
    df = spark.createDataFrame(
        [(1, json.dumps(POLY)), (2, "garbage")], ["id", "geojson"]
    )
    out = df.select("id", geojson_to_wkt("geojson").alias("wkt")).collect()
    by_id = {r["id"]: r["wkt"] for r in out}
    assert by_id[1].startswith("POLYGON ((")
    assert by_id[2] is None


def test_feature_collection_document(spark):
    # the /poverty-by-zip document shape (reference routes.py:59-104)
    df = spark.createDataFrame(
        [
            ("10001", 12.5, '{"type":"Point","coordinates":[0,0]}'),
            ("10002", 30.1, '{"type":"Point","coordinates":[1,1]}'),
        ],
        ["zip_code", "poverty_rate", "geom_json"],
    )
    doc = feature_collection(
        df, "geom_json", ["zip_code", "poverty_rate"], sort_key="zip_code"
    ).collect()[0]["document"]
    parsed = json.loads(doc)
    assert parsed["type"] == "FeatureCollection"
    assert [f["properties"]["zip_code"] for f in parsed["features"]] == ["10001", "10002"]
    assert parsed["features"][0]["geometry"] == {"type": "Point", "coordinates": [0, 0]}
    assert parsed["features"][1]["properties"]["poverty_rate"] == 30.1
