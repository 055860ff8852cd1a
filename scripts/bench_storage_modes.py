#!/usr/bin/env python
"""Measure the pointer-commit mode's overhead vs swap mode (round 13).

The pointer protocol buys object-store portability (no directory renames,
one-conditional-PUT publish) — this probe prices it: load a partitioned
table from the lineitem corpus, run single-partition upserts, appends, a
segment compaction, and full reads in BOTH modes, and print one JSON line
with per-op wall seconds. The interesting properties:

- pruned upsert cost must be bounded by the touched partition in both
  modes (pointer adds only a manifest read + one tmp-file flip);
- read cost after k appends in pointer mode grows with the SEGMENT count
  (k scan branches) until compact_segments folds them — the measured
  before/after pair is the cell that justifies the maintenance op.

Usage:
    PYTHONPATH=. python scripts/bench_storage_modes.py [sf_dir] [n_appends]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    from pyspark.sql import functions as F

    from nyc_open_data_pipeline_spark.catalog import load_table
    from nyc_open_data_pipeline_spark.pipeline.schema import ColumnSpec, TableSchema
    from nyc_open_data_pipeline_spark.pipeline.storage import ParquetStorage
    from nyc_open_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    spark = get_spark("storage_modes_probe")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.monotonically_increasing_id().alias("k"),
            F.col("l_returnflag").alias("mode"),
            F.col("l_extendedprice").alias("price"),
        )
        .localCheckpoint(eager=True)  # same input rows for both modes
    )
    n_rows = li.count()
    schema = TableSchema(
        table_name="t",
        columns=[
            ColumnSpec("k", "bigint", primary_key=True),
            ColumnSpec("mode", "string"),
            ColumnSpec("price", "double"),
        ],
        unique_keys=["k"],
        partition_by=["mode"],
    )
    one_mode = li.limit(1).collect()[0]["mode"]
    upd = li.filter(F.col("mode") == one_mode).limit(500).withColumn(
        "price", F.col("price") * 2
    ).localCheckpoint(eager=True)
    app = li.limit(200).withColumn("k", F.col("k") + 10_000_000).localCheckpoint(
        eager=True
    )

    out: dict = {"metric": "storage_mode_overhead", "sf_dir": sf_dir, "rows": n_rows}
    for mode in ("swap", "pointer"):
        root = tempfile.mkdtemp(prefix=f"stmode_{mode}_")
        storage = ParquetStorage(root, commit=mode)
        cell: dict[str, float] = {}

        t0 = time.perf_counter()
        storage.upsert(spark, li, schema)
        cell["initial_load_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        storage.upsert(spark, upd, schema)
        cell["pruned_upsert_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        for _ in range(n_appends):
            storage.create_or_append(app, schema)
        cell[f"append_x{n_appends}_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        n_after = storage.read(spark, "t").count()
        cell["read_after_appends_sec"] = round(time.perf_counter() - t0, 2)

        if mode == "pointer":
            t0 = time.perf_counter()
            folded = storage.compact_segments(spark, schema, max_segments=2)
            cell["compact_segments_sec"] = round(time.perf_counter() - t0, 2)
            cell["partitions_folded"] = len(folded)
            t0 = time.perf_counter()
            n_compacted = storage.read(spark, "t").count()
            cell["read_after_compact_sec"] = round(time.perf_counter() - t0, 2)
            assert n_compacted == n_after, (n_compacted, n_after)

        cell["final_rows"] = n_after
        out[mode] = cell
        shutil.rmtree(root, ignore_errors=True)

    assert out["swap"]["final_rows"] == out["pointer"]["final_rows"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
