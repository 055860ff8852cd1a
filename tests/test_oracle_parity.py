"""Differential correctness: every declared query vs its DuckDB oracle.

Mirrors the driver's t2 gate, but STRICTER locally: after sorting columns by
name and rows by all values, cells must match exactly (no tolerance) — if a
query needs tolerance, its output must be redesigned (decimal sums, rounding)
until it is hash-stable.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from nyc_open_data_pipeline_spark.catalog import TESTDATA_TABLES, table_path
from nyc_open_data_pipeline_spark.plans import all_queries

QUERIES = all_queries()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return (a is None or (isinstance(a, float) and math.isnan(a))) and (
                b is None or (isinstance(b, float) and math.isnan(b))
            )
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    got = sdf.toPandas()
    if spec.oracle is None:
        assert got is not None  # rows-only check: query must execute
        return
    con = _duck(sf_dir)
    want = con.sql(spec.oracle).df()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"

    # dtype families must agree (int vs int, float vs float, ...) — the
    # driver's gate also compares schemas; catch width/kind drift here.
    for c in got.columns:
        gk = got[c].dtype.kind if got[c].dtype.kind != "O" else "O"
        wk = want[c].dtype.kind if want[c].dtype.kind != "O" else "O"
        assert gk == wk or {gk, wk} <= {"M", "O"}, (
            f"{name}.{c}: dtype kind {got[c].dtype} vs {want[c].dtype}"
        )

    g = _normalize(got)
    w = _normalize(want)
    # normalize temporal / decimal representations to python scalars
    for frame in (g, w):
        for c in frame.columns:
            if str(frame[c].dtype).startswith("datetime64"):
                frame[c] = frame[c].astype("datetime64[us]")
    mism = []
    for c in g.columns:
        gv, wv = g[c].tolist(), w[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if pd.isna(a) and pd.isna(b):
                continue
            if (pd.isna(a)) != (pd.isna(b)) or not _cell_eq(a, b):
                mism.append((c, i, a, b))
                if len(mism) > 5:
                    break
        if len(mism) > 5:
            break
    assert not mism, f"{name}: value mismatches (col, row, spark, duckdb): {mism[:6]}"
