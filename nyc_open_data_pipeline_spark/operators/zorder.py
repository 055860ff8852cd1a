"""Z-order (Morton) clustering: the multi-dimensional data-skipping layout.

A linear sort bounds parquet min/max statistics for the LEADING column only —
every file still spans the whole domain of the second column, so predicates
on it skip nothing. Interleaving the bits of both columns (the Morton curve)
bounds EVERY interleaved dimension per file: a file holding one z-range holds
a small hyper-rectangle of the key space, and footer min/max stats prune
files for range predicates on any of the dimensions. This is the layout
Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is plain Spark —
compute z, range-partition on it, sort within partitions, write parquet.

Pay it once at write time (one range-exchange), save it on every selective
scan thereafter — the same economics as ``operators/bucketing`` for joins,
applied to multi-column filtering. The bit math is pure integer ops
(JVM-side, whole-stage codegen) and is mirrored exactly by the DuckDB
oracle of the z1 query (plans/analytics.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the classic 16-bit Morton spread: insert a zero between adjacent bits in
# four masked doubling steps (5 ops/dim, vs 16 shift-and-test terms)
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions 0,2,..,30."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for sh, mask in _SPREAD_STEPS:
        x = (F.shiftleft(x, sh).bitwiseOR(x)).bitwiseAND(F.lit(mask))
    return x


def zvalue2(a: Column, b: Column) -> Column:
    """32-bit Morton interleave of two 16-bit-quantized columns: bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1."""
    return spread16(a).bitwiseOR(F.shiftleft(spread16(b), 1))


def sql_spread16(expr: str) -> str:
    """DuckDB SQL mirror of :func:`spread16` (identical constants/ops)."""
    s = f"(({expr}) & 65535)"
    for sh, mask in _SPREAD_STEPS:
        s = f"((({s}) | (({s}) << {sh})) & {mask})"
    return s


def sql_zvalue2(a: str, b: str) -> str:
    """DuckDB SQL mirror of :func:`zvalue2`."""
    return f"({sql_spread16(a)} | ({sql_spread16(b)} << 1))"


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, num_files: int = 16
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    (``col_a``, ``col_b``): range-partition into ``num_files`` z-runs,
    sort within each, drop the helper column. Footer min/max stats then
    bound BOTH columns per file. At production scale pick num_files so
    each file is ~128 MB-1 GB, same sizing rule as bucketing."""
    z = zvalue2(F.col(col_a), F.col(col_b))
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
