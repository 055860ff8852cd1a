#!/usr/bin/env python
"""Regenerate driver_green.json from the CORRECTNESS_r*.json artifacts.

driver_green.json maps query name -> the LAST round in which the driver's
differential check produced a fully-green row (rows+schema+hash all true).
``plans.registry.all_queries()`` sorts the registry by this history —
queries with no green row ever come first (registration order), then greens
stalest-first — so a late-round addition can never silently fall past the
driver's ~50-row CORRECTNESS cap (the round-3 failure mode: 5 queries added
late landed at priority slots 51-55 and got no driver row).

Run after each round's CORRECTNESS_rNN.json lands:
    python scripts/update_driver_green.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
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
    out = REPO / "driver_green.json"
    out.write_text(json.dumps(dict(sorted(green.items())), indent=1) + "\n")
    print(f"wrote {out}: {len(green)} queries with a green driver row")
    return 0


if __name__ == "__main__":
    sys.exit(main())
