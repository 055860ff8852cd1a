#!/usr/bin/env python
"""Materialized-document export CLI (reference scripts/export_static_data.py).

    python scripts/export_static.py --storage-root data/tables --out viz/public/data
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--storage-root", default="data/tables")
    ap.add_argument("--out", default="viz/public/data")
    args = ap.parse_args()

    from nyc_open_data_pipeline_spark.pipeline.storage import ParquetStorage
    from nyc_open_data_pipeline_spark.serving import export_static
    from nyc_open_data_pipeline_spark.session import get_spark

    spark = get_spark("export_static")
    written = export_static(spark, ParquetStorage(args.storage_root), args.out)
    for name, path in written.items():
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
