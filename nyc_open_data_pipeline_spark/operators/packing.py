"""Sequence packing for training-batch prep: assign each document a span of
fixed-length token sequences via a grouped running sum.

The natural formulation — ``SUM(n_tokens) OVER (PARTITION BY stratum ORDER
BY doc_id)`` — puts each stratum in ONE task (a 100 TB stratum = one
executor sorting it). Like ``operators/ranks.py`` does for global ranking,
the scale-safe form is two passes:

1. range-partition on (group_cols..., order_cols...) — co-locates each
   group's rows in contiguous range slices without a global sort;
2. per-(slice, group) token subtotals go to the driver (P x |strata|
   bookkeeping scalars), prefix-summed into per-slice offsets; each slice
   then computes a LOCAL running sum and adds its group's offset.

Byte-equal to the serial window for a total ordering (unique tiebreaker in
``order_cols``), with no single-partition Exchange in the plan. The serial
window remains the differential oracle (seq1 query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_group_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "__cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` within each group, in
    ``order_cols`` order (inclusive of the current row), computed without a
    per-group single-task sort."""
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # localCheckpoint PINS the range boundaries: repartitionByRange samples
    # per physical instantiation, so the subtotals action and the caller's
    # output action would otherwise each draw their own boundaries and the
    # offsets would describe partitions that no longer exist (same failure
    # mode fixed in ranks.with_global_row_number; caught by sk5 parity).
    parted = (
        df.repartitionByRange(p, *group_cols, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    subtotals = (
        parted.groupBy("__pid", *group_cols)
        .agg(F.sum(value_col).alias("__sub"))
        .collect()
    )
    # per-(pid, group) offsets: prefix-sum of earlier slices' subtotals for
    # the same group — driver-side bookkeeping over P x |strata| scalars
    acc: dict[tuple, int] = {}
    offsets: dict[tuple, int] = {}
    for r in sorted(subtotals, key=lambda r: r["__pid"]):
        g = tuple(r[c] for c in group_cols)
        offsets[(r["__pid"], *g)] = acc.get(g, 0)
        acc[g] = acc.get(g, 0) + (r["__sub"] or 0)
    SEP = "\x1f"  # unit separator keeps (pid, group...) map keys collision-free
    off_expr: Column = F.lit(0).cast("long")
    if offsets:
        key = F.concat_ws(
            SEP, F.col("__pid").cast("string"),
            *[F.col(c).cast("string") for c in group_cols],
        )
        mapping = F.create_map(
            *[
                F.lit(x)
                for k, off in offsets.items()
                for x in (SEP.join(str(v) for v in k), off)
            ]
        )
        off_expr = F.coalesce(mapping[key].cast("long"), F.lit(0).cast("long"))
    w = (
        Window.partitionBy("__pid", *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return parted.withColumn(
        out_col, (off_expr + F.sum(value_col).over(w)).cast("long")
    ).drop("__pid")
