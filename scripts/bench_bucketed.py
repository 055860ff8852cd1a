#!/usr/bin/env python
"""Measure the bucketed-layout escape hatch at scale (SCALE.md).

Round-5 verdict item: q18's sf100 residual and q3/q10's broadcast-regime
exits are sort-merge-join exchange costs; the documented fix — bucket
lineitem+orders by orderkey once, then join exchange-free — had only been
plan-asserted at toy scale. This script proves (or refutes) the economics
end-to-end:

  1. writes sg_bucketed_<scale-slug>_{lineitem,orders} (bucketBy orderkey,
     sortBy orderkey, bucket-count = the autosizer's target for the scale
     dir) into a /tmp warehouse, timing the one-time write;
  2. times the target queries min-of-N against the plain parquet layout and
     again with SPARK_GRAFT_USE_BUCKETED=1 (catalog.load_table serves the
     bucketed tables);
  3. prints one JSON line with write cost, per-query off/on timings, and
     the exchange count observed in each plan.

Usage: PYTHONPATH=. python scripts/bench_bucketed.py [SF_DIR] [PASSES]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3
QUERIES = ["q18_large_orders", "q3_shipping_priority", "q10_returned_items"]


def main() -> None:
    os.environ.pop("SPARK_GRAFT_USE_BUCKETED", None)
    from nyc_open_data_pipeline_spark.catalog import (
        autosize_shuffle_partitions,
        load_table,
    )
    from nyc_open_data_pipeline_spark.catalog import _dir_slug
    from nyc_open_data_pipeline_spark.operators.bucketing import write_bucketed
    from nyc_open_data_pipeline_spark.plans import all_queries
    from nyc_open_data_pipeline_spark.session import get_spark

    spark = get_spark(
        "bench_bucketed",
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/sg_warehouse",
            # saveAsTable needs a metastore; default embedded derby works
            # but must not land in the repo cwd
            "spark.driver.extraJavaOptions": "-Dderby.system.home=/tmp/sg_derby",
        },
    )
    specs = all_queries()
    buckets = autosize_shuffle_partitions(spark, SF_DIR) or 384

    t0 = time.perf_counter()
    bt_li = f"sg_bucketed_{_dir_slug(SF_DIR)}_lineitem"
    bt_o = f"sg_bucketed_{_dir_slug(SF_DIR)}_orders"
    if not spark.catalog.tableExists(bt_li):
        li = load_table(spark, SF_DIR, "lineitem").repartition(
            buckets, "l_orderkey"
        )
        write_bucketed(li, bt_li, "l_orderkey", buckets=buckets, normalized=True)
        o = load_table(spark, SF_DIR, "orders").repartition(
            buckets, "o_orderkey"
        )
        write_bucketed(o, bt_o, "o_orderkey", buckets=buckets, normalized=True)
        write_sec = round(time.perf_counter() - t0, 1)
    else:
        write_sec = None  # pre-existing tables (re-run)

    def run_mode(bucketed: bool) -> dict:
        if bucketed:
            os.environ["SPARK_GRAFT_USE_BUCKETED"] = "1"
        else:
            os.environ.pop("SPARK_GRAFT_USE_BUCKETED", None)
        out: dict[str, dict] = {}
        for name in QUERIES:
            plan = (
                specs[name]
                .fn(spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            out[name] = {"exchanges": plan.count("Exchange"), "times": []}
        for _ in range(PASSES):
            for name in QUERIES:
                t1 = time.perf_counter()
                specs[name].fn(spark, SF_DIR).count()
                out[name]["times"].append(round(time.perf_counter() - t1, 1))
        for name in QUERIES:
            out[name]["min_sec"] = min(out[name]["times"])
        return out

    plain = run_mode(False)
    buck = run_mode(True)
    os.environ.pop("SPARK_GRAFT_USE_BUCKETED", None)
    print(
        json.dumps(
            {
                "metric": "bucketed_layout_probe",
                "sf_dir": SF_DIR,
                "buckets": buckets,
                "write_sec": write_sec,
                "plain": plain,
                "bucketed": buck,
            }
        )
    )


if __name__ == "__main__":
    main()
