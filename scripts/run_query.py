#!/usr/bin/env python
"""Named-query runner: execute any registered engine query by name.

    python scripts/run_query.py --list
    python scripts/run_query.py f1_funnel --sf-dir /root/testdata/sf0.01
    python scripts/run_query.py tx10_token_surprisal --format table --limit 20
    python scripts/run_query.py d4_lsh_jaccard_pairs --explain

Complements scripts/query.py (raw SQL front door): this is the catalog of
first-class operators from COVERAGE.md, each runnable directly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="Run a registered query by name")
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--format", choices=["jsonl", "table"], default="jsonl")
    ap.add_argument("--limit", type=int, default=1000, help="max rows printed")
    ap.add_argument("--explain", action="store_true", help="print the physical plan too")
    ap.add_argument("--list", action="store_true", help="list query names and exit")
    args = ap.parse_args()

    from nyc_open_data_pipeline_spark.plans import all_queries

    specs = all_queries()
    if args.list or not args.name:
        for name, spec in sorted(specs.items()):
            print(f"{name}: {spec.survey_ref}")
        return 0
    if args.name not in specs:
        print(f"unknown query {args.name!r}; try --list", file=sys.stderr)
        return 2

    from nyc_open_data_pipeline_spark.session import get_spark

    spark = get_spark("run-query-cli")
    df = specs[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    rows = df.limit(args.limit).collect()
    if args.format == "table":
        df.limit(args.limit).show(args.limit, truncate=40)
    else:
        for r in rows:
            print(json.dumps(r.asDict(recursive=True), default=str))
    print(f"-- {len(rows)} row(s) ({args.name})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
