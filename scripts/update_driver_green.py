#!/usr/bin/env python
"""Regenerate driver_green.json from the CORRECTNESS_r*.json artifacts.

driver_green.json maps query name -> {"round": N, "impl_md5": h} where N is
the LAST round in which the driver's differential check produced a fully-green
row (rows+schema+hash all true) and h fingerprints the query implementation
(oracle SQL text + Spark fn source) AT THE TIME THIS SCRIPT RAN.
``plans.registry.all_queries()`` sorts the registry by this history — queries
with no green row ever (or whose implementation changed since their last
green, detected by hash mismatch) come first, then greens stalest-first — so
neither a late-round addition nor a behavior change can silently fall past
the driver's ~50-row CORRECTNESS cap (round-3 failure mode: 5 late queries
stranded at slots 51-55; round-4 failure mode: t11/a12 changed semantics but
kept their stale-green rank and got no re-check).

Run at round start, BEFORE editing any query, right after the round's
CORRECTNESS_rNN.json lands:
    python scripts/update_driver_green.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    sys.path.insert(0, str(REPO))
    from nyc_open_data_pipeline_spark.plans.registry import all_queries, impl_hash

    green: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                green[name] = max(green.get(name, 0), rnd)

    specs = all_queries()
    out_rows = {
        name: {"round": rnd, "impl_md5": impl_hash(specs[name])}
        for name, rnd in sorted(green.items())
        if name in specs
    }
    dropped = sorted(set(green) - set(specs))
    if dropped:
        print(f"note: {len(dropped)} green names no longer registered: {dropped}")
    out = REPO / "driver_green.json"
    out.write_text(json.dumps(out_rows, indent=1) + "\n")
    print(f"wrote {out}: {len(out_rows)} queries with a green driver row")
    return 0


if __name__ == "__main__":
    sys.exit(main())
