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
# Which join axis to bucket (round-7 VERDICT #7: the orderkey axis is
# proven; q10/q13's residual is the custkey-side shuffle — measure whether
# the second axis pays, and whether MIXING axes (lineitem by orderkey,
# orders+customer by custkey) composes or one axis dominates):
#   orderkey: lineitem+orders bucketed by orderkey (the round-6 experiment)
#   custkey:  orders+customer bucketed by custkey
#   mixed:    lineitem by orderkey, orders+customer by custkey
AXIS = sys.argv[3] if len(sys.argv) > 3 else "orderkey"
AXES = {
    "orderkey": [("lineitem", "l_orderkey"), ("orders", "o_orderkey")],
    "custkey": [("orders", "o_custkey"), ("customer", "c_custkey")],
    "mixed": [
        ("lineitem", "l_orderkey"),
        ("orders", "o_custkey"),
        ("customer", "c_custkey"),
    ],
}
QUERIES = [
    "q18_large_orders",
    "q3_shipping_priority",
    "q10_returned_items",
    "q13_custdist",
]


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

    # each run is one self-contained axis: drop every bucketed copy for
    # this scale dir first so a stale table from another axis can never be
    # served mid-measurement, then write the axis's tables (timed)
    slug = _dir_slug(SF_DIR)
    for tname in ("lineitem", "orders", "customer"):
        spark.sql(f"DROP TABLE IF EXISTS sg_bucketed_{slug}_{tname}")
    t0 = time.perf_counter()
    write_secs = {}
    for tname, key in AXES[AXIS]:
        tw = time.perf_counter()
        df = load_table(spark, SF_DIR, tname).repartition(buckets, key)
        write_bucketed(
            df, f"sg_bucketed_{slug}_{tname}", key, buckets=buckets,
            normalized=True,
        )
        write_secs[tname] = round(time.perf_counter() - tw, 1)
    write_sec = round(time.perf_counter() - t0, 1)

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
                "axis": AXIS,
                "buckets": buckets,
                "write_sec": write_sec,
                "write_secs": write_secs,
                "plain": plain,
                "bucketed": buck,
            }
        )
    )


if __name__ == "__main__":
    main()
