"""Streaming: batch/stream parity for windows + custom stateful operator."""

from __future__ import annotations

import shutil

import pytest

from nyc_open_data_pipeline_spark.plans import all_queries
from nyc_open_data_pipeline_spark.streaming.stateful import user_profile_stream
from nyc_open_data_pipeline_spark.streaming.windows import (
    events_stream,
    run_to_memory,
    session_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory, sf_dir):
    """Re-materialize events as micros-timestamp parquet (the raw testdata
    uses TIMESTAMP(NANOS), which streaming readers can't consume directly)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(d)
    from nyc_open_data_pipeline_spark.catalog import load_table

    load_table(spark, sf_dir, "events").write.parquet(d)
    return d


def test_tumbling_stream_matches_batch(spark, sf_dir, stream_dir):
    stream = events_stream(spark, path=stream_dir)
    assert stream.isStreaming
    run_to_memory(tumbling_counts(stream), "tumbling_t", mode="complete")
    got = {
        r["window_start"]: (r["n_events"], r["total_value"])
        for r in spark.table("tumbling_t").collect()
    }
    want = {
        r["window_start"]: (r["n_events"], r["total_value"])
        for r in all_queries()["e1_tumbling_window"].fn(spark, sf_dir).collect()
    }
    assert got == want  # stream == batch for on-time data


def test_session_stream_matches_batch(spark, sf_dir, stream_dir):
    stream = events_stream(spark, path=stream_dir)
    run_to_memory(session_counts(stream), "session_t", mode="complete")
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.table("session_t").collect()
    }
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in all_queries()["e3_session_window"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_stateful_user_profile(spark, sf_dir, stream_dir):
    from nyc_open_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    stream = events_stream(spark, path=stream_dir)
    run_to_memory(user_profile_stream(stream), "profiles_t", mode="update")
    got = {r["user_id"]: r for r in spark.table("profiles_t").collect()}

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("ts").alias("last_ts"))
        .collect()
    )
    for row in batch:
        g = got[row["user_id"]]
        assert g["n_events"] == row["n"]
        assert g["last_ts"] == row["last_ts"]
