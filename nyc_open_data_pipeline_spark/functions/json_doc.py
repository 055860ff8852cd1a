"""Nested-document aggregation: GeoJSON FeatureCollection construction.

Re-expresses the reference's serving-side SQL (routes.py:23-46:
``json_agg(json_build_object('type','Feature','geometry',
ST_AsGeoJSON(geom)::json,'properties', json_build_object(...)))``) as a
Spark aggregation. Geometry arrives as a GeoJSON *string* column, so the
feature document is assembled with string concat (embedding it via
``to_json`` would re-quote it); properties go through ``to_json(struct)``.

Determinism: features are collected then sorted by a key column before
joining — ``collect_list`` order is partition-dependent in a distributed
engine, the reference's ORDER BY-free json_agg only looks stable because
Postgres is single-node.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def feature(geometry_json: Column, properties: Column) -> Column:
    """One GeoJSON Feature as a JSON string."""
    return F.concat(
        F.lit('{"type":"Feature","geometry":'),
        F.coalesce(geometry_json, F.lit("null")),
        F.lit(',"properties":'),
        # keep null properties explicit, matching json_build_object semantics
        F.to_json(properties, {"ignoreNullFields": "false"}),
        F.lit("}"),
    )


def feature_collection(
    df: DataFrame,
    geometry_json_col: str,
    property_cols: list[str],
    sort_key: str,
) -> DataFrame:
    """Aggregate a table into a single-row (document: string) DataFrame
    holding the FeatureCollection; deterministic feature order by sort_key."""
    feat = feature(
        F.col(geometry_json_col), F.struct(*[F.col(c) for c in property_cols])
    )
    keyed = F.struct(F.col(sort_key).alias("k"), feat.alias("f"))
    return df.agg(
        F.concat(
            F.lit('{"type":"FeatureCollection","features":['),
            F.array_join(F.transform(F.array_sort(F.collect_list(keyed)), lambda s: s["f"]), ","),
            F.lit("]}"),
        ).alias("document")
    )
