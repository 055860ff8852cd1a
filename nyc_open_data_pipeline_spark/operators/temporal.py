"""Temporal join operators Spark lacks natively: AS-OF and range joins.

Both avoid the inequality-join trap (Catalyst plans a non-equi join as
BroadcastNestedLoopJoin / CartesianProduct — the 100 TB failure mode) by
rewriting to shuffle-friendly shapes:

- ``asof_join``: union both sides tagged, one shuffle on the key,
  per-partition sort, and a running last-non-null window carries each
  reference row forward to the probe rows after it. One sort-merge-shaped
  pass, zero join operators (the kdb/QuestDB shape).
- ``range_join_binned``: bin both sides into epochs of the window length,
  explode each probe row to its two candidate bins, hash equi-join on
  (key, bin), exact range post-filter. Each match surfaces under exactly
  one bin (the matching row's own), so no dedup pass is needed.

No counterpart in the reference (single-node pandas merges); plan shapes
are asserted in tests/test_plans.py and semantics property-tested against
pandas merge_asof / a brute-force model in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time: str,
    tiebreak: str,
    matched_col: str = "__asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``(time, tiebreak)`` strictly below the left row's ``(time, tiebreak)``
    for the same ``key`` (NULL struct when none exists).

    Requires ``(time, tiebreak)`` to totally order the union of both sides
    per key (a globally unique tiebreak id satisfies this). Output columns:
    all of ``left``'s plus ``matched_col`` — a nullable struct of all of
    ``right``'s columns.
    """
    rtype = T.StructType([right.schema[c] for c in right.columns])
    ltype = T.StructType([left.schema[c] for c in left.columns])
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(time).alias("__t"),
        F.col(tiebreak).alias("__tb"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(rtype).alias("__r"),
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(time).alias("__t"),
        F.col(tiebreak).alias("__tb"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(ltype).alias("__l"),
        F.struct(*right.columns).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = (
        lt.unionByName(rt)
        .withColumn(matched_col, F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return carried.select(*[F.col(f"__l.{c}").alias(c) for c in left.columns], matched_col)


def range_join_binned(
    probes: DataFrame,
    events: DataFrame,
    key: str,
    probe_time: str,
    event_time: str,
    window_seconds: int,
) -> DataFrame:
    """Inner-join each probe row to the ``events`` rows of the same ``key``
    with ``event_time`` in ``[probe_time, probe_time + window_seconds)``.

    Probe and event column names must be disjoint apart from ``key``.
    The bin width equals the window length, so every probe spans at most
    two bins and every matching event appears under exactly one of them.
    """
    pbin = F.floor(F.unix_timestamp(probe_time) / window_seconds).cast("long")
    probes_b = probes.withColumn("__bin", F.explode(F.array(pbin, pbin + 1)))
    events_b = events.withColumn(
        "__bin", F.floor(F.unix_timestamp(event_time) / window_seconds).cast("long")
    )
    in_window: Column = (F.col(event_time) >= F.col(probe_time)) & (
        F.col(event_time)
        < F.col(probe_time) + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
    )
    return probes_b.join(events_b, [key, "__bin"]).filter(in_window).drop("__bin")


def forward_fill(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    col: Column | str,
    out: str,
) -> DataFrame:
    """Last-observation-carried-forward along each key's timeline.

    ``last(..., ignorenulls=True)`` over a running frame: one exchange on
    the series key; per-task state is a single scalar per open partition
    (the frame evaluates streamingly), so memory is flat in series length.
    Used by the ts2 query (plans/timeseries.py)."""
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = F.col(col) if isinstance(col, str) else col
    return df.withColumn(out, F.last(c, ignorenulls=True).over(w))
