#!/usr/bin/env python
"""Replicate a testdata scale-factor directory N-fold with key offsets.

Usage: python scripts/make_scaled_sf.py SRC_SF_DIR OUT_DIR N

Facts and entity tables are unioned N times with every key column offset by
replica * stride (stride = max key in the base table + 1), so foreign-key
relationships stay valid WITHIN each replica and key spaces never collide
across replicas. Dimension tables (region, nation) pass through unchanged.
Non-key attributes (timestamps, text, vectors) repeat verbatim — document
text repeating 10x is realistic for dedup workloads (that's what crawl dumps
look like).

Used for the SCALE.md headroom measurement: generate /tmp/sf1 from sf0.1 and
run bench.py against it to observe which query families leave the broadcast
regime at 10x bench scale.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

# key columns to offset, per table; each maps to a shared key domain so the
# stride is consistent across tables (l_orderkey and o_orderkey must shift
# by the same amount)
KEY_DOMAINS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
PASSTHROUGH = ["region", "nation"]


def main() -> int:
    src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from nyc_open_data_pipeline_spark.catalog import load_table
    from nyc_open_data_pipeline_spark.session import get_spark

    spark = get_spark("make_scaled_sf")

    # shared strides: max over every column mapped to the domain, across tables
    strides: dict[str, int] = {}
    frames = {}
    for tbl, keys in KEY_DOMAINS.items():
        df = load_table(spark, src, tbl)
        frames[tbl] = df
        aggs = df.agg(*[F.max(c).alias(c) for c in keys])
        row = aggs.collect()[0]
        for c, dom in keys.items():
            strides[dom] = max(strides.get(dom, 0), int(row[c]) + 1)

    for tbl in PASSTHROUGH:
        load_table(spark, src, tbl).write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )
        print(f"{tbl}: passthrough")

    for tbl, keys in KEY_DOMAINS.items():
        df = frames[tbl]
        rep = df.select(
            "*", F.explode(F.array(*[F.lit(i) for i in range(n)])).alias("__rep")
        )
        for c, dom in keys.items():
            rep = rep.withColumn(
                c, (F.col(c) + F.col("__rep").cast("long") * strides[dom]).cast("long")
            )
        rep.drop("__rep").write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
        print(f"{tbl}: x{n}")

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
