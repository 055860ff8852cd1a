"""Shapefile connector (reference S8, shapefile_fetcher.py:30-89).

Driver-side geopandas read -> WKT-geometry Spark DataFrame. geopandas is not
available in every environment (not in this container); the import is gated
and the conversion path (GeoDataFrame -> WKT rows -> createDataFrame) is
factored so it is testable with a fake "gdf" built from plain shapely-free
fixtures.
"""

from __future__ import annotations

import glob
import os
import zipfile

from pyspark.sql import DataFrame, SparkSession

from nyc_open_data_pipeline_spark.sources.http import download

try:  # pragma: no cover - environment-dependent
    import geopandas as _gpd
except ImportError:  # pragma: no cover
    _gpd = None


def fetch_shapefile(
    spark: SparkSession,
    url: str,
    cache_dir: str,
    dataset_id: str = "shapes",
    crs: str = "EPSG:4326",
    force: bool = False,
) -> DataFrame:
    """Download zip -> extract -> read .shp -> reproject -> WKT DataFrame.

    Mirrors the reference's glob-fallback to any ``*.shp`` (:70-80) and
    to_crs reprojection (census_zctas_2020/transformer.py:38-40).
    """
    if _gpd is None:
        raise NotImplementedError(
            "shapefile connector requires geopandas (not installed in this "
            "environment); ingest pre-converted WKT/GeoJSON instead"
        )
    zpath = download(url, os.path.join(cache_dir, dataset_id, "shapes.zip"), force=force)
    extract_dir = os.path.join(cache_dir, dataset_id, "extracted")
    with zipfile.ZipFile(zpath) as zf:
        zf.extractall(extract_dir)
    shps = glob.glob(os.path.join(extract_dir, "**", "*.shp"), recursive=True)
    if not shps:
        raise FileNotFoundError(f"no .shp found under {extract_dir}")
    gdf = _gpd.read_file(shps[0])
    if gdf.crs is not None and str(gdf.crs) != crs:
        gdf = gdf.to_crs(crs)
    return geodataframe_to_spark(spark, gdf)


def geodataframe_to_spark(
    spark: SparkSession, gdf, geometry_col: str = "geometry"
) -> DataFrame:
    """GeoDataFrame -> Spark DataFrame with the geometry column as WKT text
    (the engine's at-rest geometry representation, SURVEY §7.1)."""
    pdf = gdf.copy()
    pdf[geometry_col] = pdf[geometry_col].apply(
        lambda g: g.wkt if g is not None else None
    )
    return spark.createDataFrame(pdf)
