#!/usr/bin/env python
"""At-scale witness for star_components' JOIN-attach path (round-10 verdict #3).

The sf100 gr3 fixture (bounded 66-node chains) never leaves the window
attach, so the adaptive routing's entire point — the AQE-skew-splittable
join attach for giant stars — had only a 300-spoke unit test behind it.
This script measures the join path end-to-end at sf10 graph scale:

1. CHAIN: one 10 M-node chain (the sf10 node count concentrated in a
   single component — the giant-component variant of the gr3 fixture).
   Star contraction roughly doubles node 0's star per alternation, so
   with the PRODUCTION threshold (4 M) the run must START on the window
   path, cross the threshold mid-contraction (the lag-one overshoot
   round completes in a single window task), and FLIP to the join path
   for the final rounds. Reported: per-pass wall sec, the attach-mode
   sequence, label correctness (every node labeled 0, exactly N rows).

2. HUB: a stationary 6 M-spoke star (sym u-group 6 M >= threshold from
   the seed measure), so EVERY round routes to the join attach.

3. SKEW-SPLIT PROBE: the hub's large-star join attach replayed
   standalone with AQE skew-join thresholds lowered to the ratio a real
   1000-executor cluster would see (a 6 M-row local hot key is ~100 MB,
   under AQE's 256 MB default; at 100 TB the same key is tens of GB).
   Asserts the executed plan actually carries a skew=true split.

Usage: python scripts/gr3_join_witness.py [--passes 2] [--chain 10000000]
       [--spokes 6000000]
Prints one JSON line per measurement; run solo (no concurrent JVMs) per
SCALE.md's measurement discipline.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def _chain_graph(spark, n):
    nodes = spark.range(n).select(F.col("id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    return nodes, edges


_MIX_K = -7046029254386353131  # odd (2^64 - 0x9E3779B97F4A7C15): bijective mod 2^63
_MIX_MASK = (1 << 63) - 1


def _mixed(col):
    """Bijective id mixing: i -> (i * K) mod 2^63, K odd. Java long
    multiplication wraps mod 2^64 and (x mod 2^64) mod 2^63 == x mod 2^63,
    so the masked product is injective and never 0 for i != 0. Purpose:
    sequential spoke ids LZ4-compress ~10x, holding the hot key's
    COMPRESSED shuffle bytes under AQE's 256 MB skew floor at any node
    count this box can hold (round-11 honest boundary); mixed ids are
    incompressible, so the floor is reachable at ~35 M spokes."""
    return (col * F.lit(_MIX_K)).bitwiseAND(F.lit(_MIX_MASK))


def _hub_graph(spark, s, mix: bool = False):
    spoke = _mixed(F.col("id")) if mix else F.col("id")
    nodes = spark.range(1, s + 1).select(spoke.alias("id")).union(
        spark.range(1).select(F.col("id"))
    )
    edges = spark.range(1, s + 1).select(
        spoke.alias("id_a"), F.lit(0).alias("id_b")
    )
    return nodes, edges


def _run(spark, DD, nodes, edges, n_expected):
    t0 = time.perf_counter()
    labels = DD.star_components(nodes, edges)
    bad = labels.filter(F.col("cluster_id") != 0).count()
    total = labels.count()
    sec = round(time.perf_counter() - t0, 1)
    modes = list(DD._LAST_ATTACH_MODES)
    assert bad == 0 and total == n_expected, (bad, total, n_expected)
    return {
        "sec": sec,
        "rounds": len(modes),
        "window_rounds": sum(modes),
        "join_rounds": sum(1 for m in modes if not m),
        "modes": "".join("W" if m else "J" for m in modes),
        # at PRODUCTION confs a local 6 M-row hot key compresses under
        # AQE's 256 MB skew threshold, so 0 here is expected; the
        # mechanism is pinned by the ratio-scaled probe below and by
        # tests/test_ops.py::test_star_components_join_attach_is_aqe_skew_splittable
        "skew_split_rounds": sum(
            1 for p in DD._LAST_ATTACH_PLANS if "skew=true" in p
        ),
    }


def _spill_bytes(spark) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over completed stages
    via the UI REST API — the only place task-level spill totals surface
    in local mode."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return (0, 0)  # UI disabled (engine default): spill not observable
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=30
    ) as r:
        stages = _json.load(r)
    return (
        sum(s.get("memoryBytesSpilled", 0) for s in stages),
        sum(s.get("diskBytesSpilled", 0) for s in stages),
    )


def main() -> int:
    # argparse, not positional pair-zipping: the old zip dropped the value
    # after any bare flag (`--probe-only --passes 2` parsed as
    # {'probe-only': '--passes'} and lost the 2 — ADVICE r11)
    import argparse

    ap = argparse.ArgumentParser(description="gr3 star_components scale witness")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--chain", type=int, default=10_000_000)
    ap.add_argument("--spokes", type=int, default=6_000_000)
    ap.add_argument("--driver-mem", dest="driver_mem", default=None)
    ap.add_argument("--mem-fraction", dest="mem_fraction", default=None)
    ap.add_argument("--probe-only", action="store_true")
    ap.add_argument(
        "--hub-only",
        action="store_true",
        help="skip the chain witness (hub + probe only)",
    )
    ap.add_argument(
        "--mix-ids",
        action="store_true",
        help="incompressible spoke ids: the production-conf skew-split "
        "cell (round-11 verdict #4) — at ~35 M mixed spokes the hot key's "
        "compressed bytes clear AQE's default 256 MB floor INSIDE "
        "star_components, no threshold scaling",
    )
    ns = ap.parse_args()
    args = {
        "driver-mem": ns.driver_mem,
        "mem-fraction": ns.mem_fraction,
        "probe-only": ns.probe_only,
    }
    passes = ns.passes
    n_chain = ns.chain
    n_spokes = ns.spokes

    from nyc_open_data_pipeline_spark.operators import dedup as DD
    from nyc_open_data_pipeline_spark.session import get_spark

    # --driver-mem 4g: the spill witness — a heap small enough that the
    # lag-one OVERSHOOT window round (a >threshold star sorted in ONE
    # task) cannot hold its run in memory, proving the documented
    # "spills, not fails" bound with actual spilled bytes instead of an
    # argument (round-10 verdict: 'argued, not measured').
    extra = {}
    if args.get("driver-mem"):
        extra["spark.driver.memory"] = args["driver-mem"]
        extra["spark.ui.enabled"] = "true"  # spill metrics live on the UI REST API
    if args.get("mem-fraction"):
        # the surgical spill lever: shrink the unified execution/storage
        # pool (not the heap) so the one >threshold window-sort task is
        # forced through UnsafeExternalSorter spill while the per-task
        # fair share still covers every normal-sized task and the JVM
        # keeps ample non-pool headroom (a small HEAP instead OOMs in
        # task bookkeeping long before the overshoot round)
        extra["spark.memory.fraction"] = args["mem-fraction"]
        extra["spark.ui.enabled"] = "true"
    spark = get_spark("gr3_join_witness", extra_conf=extra or None)

    graph_runs = [] if args.get("probe-only") else [
        ("chain_giant_component", lambda: _chain_graph(spark, n_chain), n_chain),
        (
            "hub_star_mixed" if ns.mix_ids else "hub_star",
            lambda: _hub_graph(spark, n_spokes, mix=ns.mix_ids),
            n_spokes + 1,
        ),
    ]
    if ns.hub_only:
        graph_runs = graph_runs[1:]
    for name, build, n_nodes in graph_runs:
        results = []
        for _ in range(passes):
            spill0 = _spill_bytes(spark)
            nodes, edges = build()
            r = _run(spark, DD, nodes, edges, n_nodes)
            spill1 = _spill_bytes(spark)
            r["spill_mem_mb"] = round((spill1[0] - spill0[0]) / 1e6, 1)
            r["spill_disk_mb"] = round((spill1[1] - spill0[1]) / 1e6, 1)
            results.append(r)
        best = min(results, key=lambda r: r["sec"])
        print(json.dumps({"witness": name, "n_nodes": n_nodes,
                          "passes": [r["sec"] for r in results], **best}))

    # Skew-split probe: the join attach's exact shape (sym groupBy-min +
    # join-back), with skew thresholds scaled down so the local 6 M-row hot
    # key is past them the way a fact-scale key passes the defaults.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # thresholds are on COMPRESSED shuffle bytes; the synthetic hot key
    # (constant u, sequential v) LZ4-compresses ~10x, so scale the floors
    # down accordingly — the point is the mechanism at the cluster's
    # size RATIO, not absolute bytes
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    _, edges = _hub_graph(spark, n_spokes)
    e = edges.select(
        F.greatest("id_a", "id_b").alias("hi"), F.least("id_a", "id_b").alias("lo")
    )
    sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
        e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    # incompressible payload + an aggregate that READS it: a constant-u /
    # sequential-v hot partition LZ4-compresses below any realistic
    # threshold once column pruning drops v (the skew stats are on
    # compressed shuffle bytes) — at fact scale the attach carries real
    # edge payloads, which is the regime the ratio-scaled confs emulate
    sym = sym.withColumn("pay", F.xxhash64("u", "v"))
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"), F.count("*").alias("gc"))
        .select("u", F.least("mn", F.col("u")).alias("m"), "gc")
        # the round-11 operator shape: checkpointed, so the join's both
        # inputs are bare shuffle stages and OptimizeSkewedJoin can match
        # (inline, the rule NEVER fires — the round-9/10 rationale's hole)
        .localCheckpoint(eager=False)
    )
    att = sym.join(m, "u")
    # the plan must be read from the QueryExecution that actually RAN:
    # att.count() builds a new QE, leaving att's own adaptive plan
    # unfinalized (isFinalPlan=false, no skew info)
    res = att.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("pay").alias("s"), F.sum("v").alias("sv")
    )
    t0 = time.perf_counter()
    out_rows = res.collect()[0]["n"]
    sec = round(time.perf_counter() - t0, 1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    skew_split = "skew=true" in plan
    if not skew_split:
        print(plan[:4000], file=sys.stderr)
    print(json.dumps({
        "witness": "join_attach_skew_probe",
        "rows": out_rows,
        "sec": sec,
        "aqe_skew_split": skew_split,
    }))
    assert skew_split, "AQE did not split the skewed join exchange"
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
