"""Shared helpers for plan modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_open_data_pipeline_spark.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec(col: str | Column, prec: int = 28, scale: int = 4) -> Column:
    """Cast a double column to exact decimal for associative aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.DecimalType(prec, scale))


def dsum(col: str | Column, alias: str, prec: int = 28, scale: int = 4) -> Column:
    """Order-independent SUM over doubles: decimal-sum, then back to double."""
    return F.sum(dec(col, prec, scale)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, prec: int = 28, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, prec, scale)).cast("double") / F.count(c)).alias(alias)


# DuckDB-side equivalents (keep in sync with dec/dsum/davg above)
def sql_dsum(expr: str, alias: str, prec: int = 28, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, prec: int = 28, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def sql_floordiv(expr: str, w: int) -> str:
    """Integer FLOORING division as a Spark SQL fragment. Spark's ``div``
    truncates toward zero while DuckDB's ``//`` floors, so bare ``div``
    diverges cross-engine for negative operands (ADVICE r7: pre-1970
    epoch-microsecond bins). ``x - pmod(x, w)`` is an exact multiple of w
    (pmod is non-negative), so ``div`` on it is exact flooring division
    with no double rounding — for every BIGINT except the bottom sliver
    x in [LONG_MIN, LONG_MIN + w), where the subtraction itself would
    wrap (round-8 review); no timestamp or bucketed metric here is
    within w of LONG_MIN."""
    return f"((({expr}) - pmod(({expr}), {w})) div {w})"
