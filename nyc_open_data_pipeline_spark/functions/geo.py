"""Geospatial functions (reference G1-G4, SURVEY §2.11).

Geometry lives as WKT strings at rest (the reference itself stringifies to
WKT for parquet, storage.py:363-370) with GeoJSON derived for serving. The
converters are dependency-free (no shapely in this environment): a small
parser/formatter pair for the geometry types the reference handles
(Point, LineString, Polygon, MultiPolygon).

These run as Arrow-batched pandas UDFs (round 9; previously row-at-a-time
Python UDFs — the engine's last BatchEvalPython). Geometry columns belong
to *dimension* tables (hundreds of polygons, reference scale: 197 NTAs /
177 ZCTAs), never the 100 TB fact side, so either eval mode is cheap here —
but Arrow batching removes the per-row pickle round-trip and keeps the
whole engine on the two sanctioned UDF lanes (JVM expressions, Arrow
batches). A Sedona GeometryType would replace this wholesale where
available.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


# ---------------------------------------------------------------------------
# pure-python converters (unit-testable without Spark)
# ---------------------------------------------------------------------------


def _fmt_coord(c) -> str:
    # shortest-round-trip float formatting, stable across engines
    return f"{c[0]!r} {c[1]!r}"


def _ring_wkt(ring) -> str:
    return "(" + ", ".join(_fmt_coord(c) for c in ring) + ")"


def geojson_to_wkt_py(s: str | None) -> str | None:
    """GeoJSON geometry (dict or JSON string) -> WKT; None on parse failure
    (reference ntas_2020/transformer.py:94-121: NULL + warn)."""
    if s is None:
        return None
    try:
        g = json.loads(s) if isinstance(s, str) else s
        t = g["type"]
        c = g["coordinates"]
        if t == "Point":
            return f"POINT ({_fmt_coord(c)})"
        if t == "LineString":
            return f"LINESTRING {_ring_wkt(c)}"
        if t == "Polygon":
            return "POLYGON (" + ", ".join(_ring_wkt(r) for r in c) + ")"
        if t == "MultiPolygon":
            polys = ", ".join(
                "(" + ", ".join(_ring_wkt(r) for r in poly) + ")" for poly in c
            )
            return f"MULTIPOLYGON ({polys})"
        return None
    except (KeyError, TypeError, ValueError, json.JSONDecodeError):
        return None


def _parse_wkt_coords(body: str):
    """Parse nested WKT parens into nested coordinate lists (recursive)."""
    body = body.strip()
    if not (body.startswith("(") and body.endswith(")")):
        raise ValueError(f"malformed WKT body: {body[:40]}")
    inner = body[1:-1].strip()
    if "(" in inner:
        parts, depth, start = [], 0, 0
        for i, ch in enumerate(inner):
            if ch == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    parts.append(inner[start : i + 1])
        return [_parse_wkt_coords(p) for p in parts]
    if "," in inner:
        return [[float(x) for x in pair.split()] for pair in inner.split(",")]
    return [float(x) for x in inner.split()]


def wkt_to_geojson_py(s: str | None) -> str | None:
    """WKT -> GeoJSON string (reference G4 ST_AsGeoJSON)."""
    if s is None:
        return None
    try:
        st = s.strip()
        kind, _, rest = st.partition("(")
        kind = kind.strip().upper()
        body = "(" + rest
        coords = _parse_wkt_coords(body)
        if kind == "POINT":
            flat = coords[0] if isinstance(coords[0], list) else coords
            return json.dumps({"type": "Point", "coordinates": flat}, separators=(",", ":"))
        if kind == "LINESTRING":
            return json.dumps(
                {"type": "LineString", "coordinates": coords}, separators=(",", ":")
            )
        if kind == "POLYGON":
            return json.dumps(
                {"type": "Polygon", "coordinates": coords}, separators=(",", ":")
            )
        if kind == "MULTIPOLYGON":
            return json.dumps(
                {"type": "MultiPolygon", "coordinates": coords}, separators=(",", ":")
            )
        return None
    except (ValueError, IndexError):
        return None


def promote_to_multipolygon_py(wkt: str | None) -> str | None:
    """POLYGON -> MULTIPOLYGON wrapper for schema consistency
    (reference census_zctas_2020/transformer.py:10-16)."""
    if wkt is None:
        return None
    st = wkt.strip()
    if st.upper().startswith("POLYGON"):
        body = st[st.index("(") :]
        return f"MULTIPOLYGON ({body})"
    return st


# ---------------------------------------------------------------------------
# Spark UDF wrappers — Arrow-batched (ArrowEvalPython in plans; the
# hygiene gate in tests/test_plans.py rejects BatchEvalPython everywhere)
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def geojson_to_wkt(s: pd.Series) -> pd.Series:
    return s.map(geojson_to_wkt_py)


@pandas_udf(StringType())
def wkt_to_geojson(s: pd.Series) -> pd.Series:
    return s.map(wkt_to_geojson_py)


@pandas_udf(StringType())
def promote_to_multipolygon(s: pd.Series) -> pd.Series:
    return s.map(promote_to_multipolygon_py)
