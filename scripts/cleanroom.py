#!/usr/bin/env python
"""Training-corpus cleanroom CLI: quality gate -> exact dedup -> verified
near-dup drop -> deterministic split, written partitioned by split.

    python scripts/cleanroom.py --sf-dir /root/testdata/sf0.01 --out data/cleanroom
    python scripts/cleanroom.py --sf-dir /root/testdata/sf0.01 --stats-only

No counterpart in the reference (its pipeline stops at serving documents);
this is the engine's LLM-data flagship flow (plans/llmdata.py::c1).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="data/cleanroom")
    ap.add_argument(
        "--stats-only", action="store_true",
        help="print per-(split, lang) doc/token counts without writing",
    )
    args = ap.parse_args()

    from nyc_open_data_pipeline_spark.plans.llmdata import write_cleanroom
    from nyc_open_data_pipeline_spark.plans.registry import all_queries
    from nyc_open_data_pipeline_spark.session import get_spark

    spark = get_spark("cleanroom")
    stats = (
        all_queries()["c1_cleanroom_pipeline"]
        .fn(spark, args.sf_dir)
        .orderBy("split", "lang")
        .collect()
    )
    for r in stats:
        print(f"{r['split']:>5}  {r['lang']:>3}  docs={r['n_docs']:>8}  tokens={r['total_tokens']:>12}")
    if not args.stats_only:
        write_cleanroom(spark, args.sf_dir, args.out)
        print(f"wrote {args.out} (partitioned by split)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
