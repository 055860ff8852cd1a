"""Deterministic micro-batch replay fixtures for streaming queries.

``FileStreamSource`` with ``maxFilesPerTrigger=1`` consumes one file per
micro-batch, oldest modification time first. Writing each chunk as exactly
one parquet file with strictly ascending mtimes therefore replays an
arbitrary batch sequence deterministically — which is what makes the
streaming queries (st1-st5) oracle-able: the oracle SQL can reconstruct the
batch boundaries from the chunk predicate.

Production streams arrive from Kafka in arrival order; this module is the
test/fixture stand-in with the same ordering contract.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MTIME_BASE = 1_700_000_000


def write_stream_chunks(chunks: list[DataFrame], stream_dir: str) -> None:
    """Materialize each DataFrame as one single-file parquet chunk in
    ``stream_dir`` with strictly ascending mtimes (chunk i is micro-batch i)."""
    os.makedirs(stream_dir, exist_ok=True)
    for i, chunk in enumerate(chunks):
        tmp = tempfile.mkdtemp(prefix="chunk_")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dest = os.path.join(stream_dir, f"chunk-{i:03d}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (_MTIME_BASE + i * 10, _MTIME_BASE + i * 10))
        shutil.rmtree(tmp, ignore_errors=True)


def ordered_range_chunks(
    df: DataFrame, order_col: str, stream_dir: str, n_chunks: int = 4
) -> None:
    """Split ``df`` into ``n_chunks`` disjoint ascending ``order_col`` ranges
    and replay them in range order (batch k's ids all precede batch k+1's)."""
    lo, hi = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).collect()[0]
    if hi is None:  # empty input: keep the replay shape (n empty batches)
        write_stream_chunks([df.limit(0) for _ in range(n_chunks)], stream_dir)
        return
    span = hi - lo + 1
    bounds = [lo + (span * i) // n_chunks for i in range(n_chunks + 1)]
    write_stream_chunks(
        [
            df.filter((F.col(order_col) >= bounds[i]) & (F.col(order_col) < bounds[i + 1]))
            for i in range(n_chunks)
        ],
        stream_dir,
    )
