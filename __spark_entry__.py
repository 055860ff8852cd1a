"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual surface lives in ``nyc_open_data_pipeline_spark.plans`` — one
QuerySpec per SURVEY.md §2 inventory row (plus the LLM-data extensions),
each carrying its own DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the end-to-end training-data cleanroom
    (quality gate -> exact dedup -> MinHash-LSH near-dup drop -> hash split,
    one Catalyst plan — ``c1_cleanroom_pipeline``)."""
    from nyc_open_data_pipeline_spark.plans import all_queries

    return all_queries()["c1_cleanroom_pipeline"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nyc_open_data_pipeline_spark.plans import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    from nyc_open_data_pipeline_spark.plans import all_queries

    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
