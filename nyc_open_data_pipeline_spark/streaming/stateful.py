"""Custom stateful streaming operator via applyInPandasWithState.

Example operator: per-user running profile (event count, value total, last
seen) maintained across micro-batches — the pattern for any custom state
machine Spark's built-in windows can't express (SURVEY steering: custom
stateful ops -> applyInPandasWithState).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
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
