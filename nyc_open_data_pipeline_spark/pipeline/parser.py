"""Dataset parsing driver: dynamic transformer loading + validation.

Mirrors reference src/ingestion/parser.py: load transformer by dotted path
(:29-46), apply (:48-75), then validate — required columns raise, range and
uniqueness violations WARN and continue (:77-115, the reference's
warnings-not-failures philosophy).
"""

from __future__ import annotations

import importlib
import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.pipeline.base import BaseTransformer
from nyc_open_data_pipeline_spark.pipeline.schema import TableSchema

log = logging.getLogger(__name__)


def load_transformer(dotted_path: str) -> BaseTransformer:
    """'pkg.module.ClassName' -> instance (reference parser.py:29-46)."""
    module_path, _, cls_name = dotted_path.rpartition(".")
    module = importlib.import_module(module_path)
    cls = getattr(module, cls_name)
    # duck-typed (not issubclass): plugin modules may be re-imported under a
    # different module identity, which breaks class-object comparison
    if not (callable(getattr(cls, "transform", None)) and callable(getattr(cls, "get_schema", None))):
        raise TypeError(f"{dotted_path} is not a transformer (needs transform/get_schema)")
    return cls()


@dataclass
class ValidationReport:
    missing_columns: list[str] = field(default_factory=list)
    range_violations: dict[str, int] = field(default_factory=dict)
    duplicate_keys: int = 0
    record_count: int = 0

    @property
    def ok(self) -> bool:
        return not self.missing_columns


def validate(df: DataFrame, schema: TableSchema) -> ValidationReport:
    """One small Spark job computes every validation count at once
    (single pass — at 100 TB you do NOT want one job per rule)."""
    report = ValidationReport()

    required = [c.name for c in schema.columns if c.required]
    report.missing_columns = sorted(set(required) - set(df.columns))
    if report.missing_columns:
        # hard failure, mirrors reference parser.py:86-89 raise
        return report

    aggs = [F.count(F.lit(1)).alias("__n")]
    range_cols = []
    for c in schema.columns:
        if c.name not in df.columns or (c.min is None and c.max is None):
            continue
        cond = F.lit(False)
        if c.min is not None:
            cond = cond | (F.col(c.name) < c.min)
        if c.max is not None:
            cond = cond | (F.col(c.name) > c.max)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"__rng_{c.name}"))
        range_cols.append(c.name)

    row = df.agg(*aggs).collect()[0]
    report.record_count = row["__n"]
    for name in range_cols:
        n = int(row[f"__rng_{name}"] or 0)
        if n:
            log.warning("range violation: %s has %d out-of-range values", name, n)
            report.range_violations[name] = n

    if schema.unique_keys and all(k in df.columns for k in schema.unique_keys):
        dups = (
            df.groupBy(*schema.unique_keys)
            .count()
            .filter(F.col("count") > 1)
            .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("d"))
            .collect()[0]["d"]
        )
        if dups:
            log.warning("uniqueness: %d duplicate rows on %s", dups, schema.unique_keys)
        report.duplicate_keys = int(dups)

    return report


def parse(df: DataFrame, transformer: BaseTransformer) -> tuple[DataFrame, ValidationReport]:
    """Apply a transformer and validate its output (reference parser.py:48-115)."""
    out = df.transform(transformer.transform)
    schema = transformer.get_schema()
    report = validate(out, schema)
    if report.missing_columns:
        raise ValueError(f"missing required columns: {report.missing_columns}")
    return out, report
