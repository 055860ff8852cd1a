"""Distributed global ranking — the scale-safe form of ORDER-BY-everything
window analytics (ntile / percent_rank / cume_dist / global row_number).

A bare ``Window.orderBy(...)`` (no partitionBy) collapses the whole dataset
into ONE task (Exchange SinglePartition + a single sort) — the one window
shape that cannot scale. The classic fix is two passes:

1. ``repartitionByRange`` on the order key (Spark samples range bounds — no
   global sort), sort within each partition;
2. count rows per partition (a tiny per-partition agg), prefix-sum the
   counts on the driver (P scalars), and add each partition's offset to its
   local row_number.

The result equals the serial window's output exactly for a total (tie-free)
ordering — which a deterministic pipeline needs anyway; pass a unique
tiebreaker as the last order column. The serial window form remains the
differential oracle (``w6_distributed_ranks`` query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None = None,
    rn_col: str = "__grn",
) -> tuple[DataFrame, int]:
    """(df + global row_number column, total row count) without a global
    single-partition sort. The ordering over ``order_cols`` must be total
    (include a unique tiebreaker); rows with equal keys would otherwise get
    an arbitrary-but-consistent order within their range partition.
    """
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # localCheckpoint PINS the range partitioning: repartitionByRange picks
    # its boundaries by sampling with a seed derived from the physical RDD
    # instantiation, so the counts action below and the caller's eventual
    # output action would otherwise each draw their OWN boundaries — the
    # per-partition offsets then describe partitions that no longer exist
    # and the global numbering silently interleaves (caught by sk5's
    # order-statistic parity at sf0.01; w6's fixture was small enough that
    # every partition was fully sampled and the boundaries stayed stable).
    parted = (
        df.repartitionByRange(p, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # per-partition counts: P rows to the driver — bookkeeping scalars, not data
    counts = {
        r["__pid"]: r["cnt"]
        for r in parted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr: Column = F.lit(0).cast("long")
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        )
        off_expr = F.coalesce(mapping[F.col("__pid")].cast("long"), F.lit(0).cast("long"))
    # local row_number: Window partitioned by __pid sorts each range slice
    # independently — parallel across P tasks, never a single global sort
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = parted.withColumn(rn_col, (off_expr + F.row_number().over(w)).cast("long")).drop(
        "__pid"
    )
    return out, total


def ntile_expr(rn: Column, total: int, k: int) -> Column:
    """SQL NTILE(k) from a global row_number: the first ``total % k`` buckets
    take ``total//k + 1`` rows, the rest ``total//k`` (the standard spec,
    matching Spark and DuckDB)."""
    q, r = divmod(total, k)
    big = r * (q + 1)
    return (
        F.when(rn <= big, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - big - 1) / q) + 1 if q else F.lit(k))
        .cast("long")
    )


def distribution_ranks(
    df: DataFrame,
    order_cols: list[str],
    k: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """ntile(k) / percent_rank / cume_dist over a total global ordering,
    two-pass range-partitioned — byte-equal to the serial window for tie-free
    orderings, with no single-partition stage in the plan."""
    ranked, total = with_global_row_number(df, order_cols, num_partitions)
    rn = F.col("__grn")
    pct = (
        (rn - 1).cast("double") / F.lit(total - 1) if total > 1 else F.lit(0.0)
    )
    cume = rn.cast("double") / F.lit(total)
    return (
        ranked.withColumn("quartile", ntile_expr(rn, total, k))
        .withColumn("pct_rank", F.round(pct, 6))
        .withColumn("cume", F.round(cume, 6))
        .drop("__grn")
    )
