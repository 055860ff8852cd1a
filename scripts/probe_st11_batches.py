"""Measure st11's micro-batch fixed overhead vs batch count (VERDICT r6 #5).

Replays the SAME documents corpus through the incremental near-dup sink
(streaming/dedup.incremental_neardup_sink) chunked into n = 2/4/8/12
doc_id-ordered micro-batches. Total data work is constant, so the drain
time fits  t(n) ~= floor*n + data  and the slope IS the per-batch fixed
cost (foreachBatch plan setup + checkpoint commit + state-dir listing).

Usage: python scripts/probe_st11_batches.py [sf_dir] [chunk_counts...]
Prints one JSON line per chunk count plus a fitted-slope summary line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_open_data_pipeline_spark.catalog import load_table  # noqa: E402
from nyc_open_data_pipeline_spark.session import get_spark  # noqa: E402
from nyc_open_data_pipeline_spark.streaming.dedup import (  # noqa: E402
    run_incremental_neardup,
)
from nyc_open_data_pipeline_spark.streaming.replay import (  # noqa: E402
    ordered_range_chunks,
)
from nyc_open_data_pipeline_spark.streaming.windows import (  # noqa: E402
    drain_batch_metrics,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    counts = [int(a) for a in sys.argv[2:]] or [2, 4, 8, 12]
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    points: list[tuple[int, float]] = []
    for n in counts:
        root = tempfile.mkdtemp(prefix=f"st11probe_{n}_")
        try:
            stream_dir = os.path.join(root, "chunks")
            ordered_range_chunks(docs, "doc_id", stream_dir, n_chunks=n)
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(stream_dir)
            )
            drain_batch_metrics()  # clear any prior records
            t0 = time.monotonic()
            run_incremental_neardup(
                spark, stream, os.path.join(root, "out"), os.path.join(root, "state")
            )
            wall = round(time.monotonic() - t0, 2)
            recs = [r for r in drain_batch_metrics()
                    if r.get("sink") == "incremental_neardup"]
            survivors = sum(r.get("n_out", 0) for r in recs)
            points.append((n, wall))
            print(json.dumps({
                "metric": "st11_batch_floor", "sf_dir": sf_dir, "n_chunks": n,
                "drain_sec": wall, "survivors": survivors,
                "batch_secs": [r.get("sec") for r in recs],
            }), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    if len(points) >= 2:
        # least-squares slope of drain_sec on n_chunks = per-batch fixed cost
        xs = [p[0] for p in points]
        ys = [p[1] for p in points]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        slope = sum((x - mx) * (y - my) for x, y in points) / sum(
            (x - mx) ** 2 for x in xs
        )
        print(json.dumps({
            "metric": "st11_batch_floor_fit", "sf_dir": sf_dir,
            "per_batch_fixed_sec": round(slope, 2),
            "data_intercept_sec": round(my - slope * mx, 2),
            "points": points,
        }), flush=True)


if __name__ == "__main__":
    main()
