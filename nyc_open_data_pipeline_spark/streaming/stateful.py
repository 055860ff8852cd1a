"""Custom stateful streaming operator via applyInPandasWithState.

Example operator: per-user running profile (event count, value total, last
seen) maintained across micro-batches — the pattern for any custom state
machine Spark's built-in windows can't express (SURVEY steering: custom
stateful ops -> applyInPandasWithState).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_ts timestamp"


def _update_user_profile(key, pdf_iter, state: GroupState):
    (user_id,) = key
    n, total, last_ts = (state.get if state.exists else (0, 0.0, None))
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = pdf["ts"].max()
        last_ts = mx if last_ts is None else max(last_ts, mx)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "last_ts": [last_ts]}
    )


def user_profile_stream(stream: DataFrame) -> DataFrame:
    """(user_id, n_events, total_value, last_ts) updated each micro-batch."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming ordered funnel (st6) — custom state machine per user
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_OUTPUT_SCHEMA = "user_id long, reached int, n_seen long"
FUNNEL_STATE_SCHEMA = (
    "views array<bigint>, clicks array<bigint>, purchases array<bigint>, n_seen long"
)


def _funnel_reached(views: list, clicks: list, purchases: list) -> int:
    """Furthest ordered-funnel step from the retained step-event timestamps —
    the same strictly-after semantics as the batch funnel (plans/analytics.py
    f1_funnel): each step's earliest occurrence strictly after the previous
    step's chosen time."""
    if not views:
        return 0
    t1 = min(views)
    t2 = min((c for c in clicks if c > t1), default=None)
    if t2 is None:
        return 1
    t3 = min((p for p in purchases if p > t2), default=None)
    return 2 if t3 is None else 3


def _update_funnel(key, pdf_iter, state: GroupState):
    (user_id,) = key
    views, clicks, purchases, n_seen = (
        (list(state.get[0]), list(state.get[1]), list(state.get[2]), state.get[3])
        if state.exists
        else ([], [], [], 0)
    )
    buckets = {"view": views, "click": clicks, "purchase": purchases}
    for pdf in pdf_iter:
        n_seen += len(pdf)
        ts_us = pdf["ts"].astype("int64")
        for et, t in zip(pdf["event_type"], ts_us):
            b = buckets.get(et)
            if b is not None:
                b.append(int(t))
    state.update((views, clicks, purchases, n_seen))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "reached": [_funnel_reached(views, clicks, purchases)],
            "n_seen": [n_seen],
        }
    )


def funnel_stream(stream: DataFrame) -> DataFrame:
    """Per-user ordered-funnel progress maintained across micro-batches.

    Late/out-of-order step events are handled CORRECTLY (an earlier 'view'
    arriving late can only unlock more of the funnel, never invalidate a
    valid chain — `reached` is monotone under inserts), because the state
    retains the step-event timestamps themselves, not just the chosen chain.
    State is bounded by the user's STEP-event count (funnel-relevant types
    only, not the full event log); a production deployment adds an event-time
    TTL via GroupStateTimeout once the funnel's observation window closes."""
    return (
        stream.select("user_id", "ts", "event_type")
        .filter(F.col("event_type").isin(list(FUNNEL_STEPS)))
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Event-time TTL'd state (bounded-state pattern)
# ---------------------------------------------------------------------------

TTL_OUTPUT_SCHEMA = "user_id long, n_events long, last_ts timestamp"
TTL_STATE_SCHEMA = "n long, last_ts timestamp"


def profile_stream_with_ttl(stream: DataFrame, ttl_ms: int = 60 * 60 * 1000) -> DataFrame:
    """Per-user running event count whose state EXPIRES ``ttl_ms`` of event
    time after the user's last activity — the bounded-state discipline every
    100 TB/day stateful deployment needs (state size is live users, not
    all-time users). On expiry the operator emits a tombstone row
    (n_events = -1) and removes the state; a returning user restarts from
    zero. Uses GroupStateTimeout.EventTimeTimeout driven by the stream
    watermark (semantics pinned in tests/test_streaming.py)."""

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [-1], "last_ts": [None]}
            )
            return
        n, last_ts = (state.get if state.exists else (0, None))
        for pdf in pdf_iter:
            n += len(pdf)
            mx = pdf["ts"].max()
            last_ts = mx if last_ts is None else max(last_ts, mx)
        state.update((n, last_ts))
        state.setTimeoutTimestamp(int(last_ts.timestamp() * 1000) + ttl_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "last_ts": [last_ts]}
        )

    return (
        stream.select("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=TTL_OUTPUT_SCHEMA,
            stateStructType=TTL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4.x arbitrary-state API) — environment-gated
# ---------------------------------------------------------------------------

TWS_OUTPUT_SCHEMA = "user_id long, n_events long, n_event_types long"


def user_type_diversity_stream(stream: DataFrame) -> DataFrame:
    """Per-user event count + distinct-event-type count via
    ``transformWithStateInPandas`` (StatefulProcessor): a ValueState holds
    the running count and a MapState the distinct-type set — the typed
    composite state (maps/lists, per-state TTL, timers) that
    applyInPandasWithState's single-tuple GroupState cannot express.

    ENVIRONMENT GATE: the transformWithState Python worker speaks protobuf
    to Spark's state server; ``google-protobuf`` is not installed in this
    container, so construction raises NotImplementedError with the real
    cause (verified live: the stream crashes with 'cannot import
    google.protobuf.descriptor' otherwise). ``user_profile_stream``
    (applyInPandasWithState) is the supported custom-stateful path here;
    this operator is the forward API for environments that carry protobuf.
    The caller must also pin the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass``) — transformWithState
    does not run on the default HDFS-backed provider.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas requires the google-protobuf package "
            "(its Python worker talks to the state server over protobuf), "
            "which is absent in this environment; use user_profile_stream "
            "(applyInPandasWithState) instead"
        ) from exc

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TypeDiversityProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n_events", "n long")
            self._types = handle.getMapState("types", "t string", "seen int")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
                for t in pdf["event_type"].dropna().unique():
                    self._types.updateValue((str(t),), (1,))
            self._n.update((n,))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_event_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TypeDiversityProcessor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
