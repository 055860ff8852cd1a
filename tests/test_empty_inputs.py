"""Empty-input robustness: every declared query must execute (0 rows is fine,
exceptions are not) against schema-identical EMPTY tables.

This is the edge class where array/HOF expressions, driver-side collects of
seeds/centroids/bounds, and replay chunking break first (three such bugs were
found by this probe: descending F.sequence in _run_counts, empty k-means
centroid set, empty GEMM query matrix, None bounds in replay chunking).
"""

from __future__ import annotations

import os

import pytest

from nyc_open_data_pipeline_spark.catalog import TESTDATA_TABLES, load_table
from nyc_open_data_pipeline_spark.plans import all_queries

QUERIES = all_queries()


@pytest.fixture(scope="session")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).limit(0).write.mode("overwrite").parquet(
            os.path.join(d, f"{name}.parquet")
        )
    return d


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    rows = QUERIES[name].fn(spark, empty_sf_dir).collect()
    assert isinstance(rows, list)
