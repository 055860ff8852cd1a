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


def test_replay_chunks_are_ordered_micro_batches(spark, tmp_path):
    """write_stream_chunks + maxFilesPerTrigger=1 must replay chunks as
    micro-batches in chunk order — every streaming oracle depends on it."""
    from nyc_open_data_pipeline_spark.streaming.replay import write_stream_chunks

    d = str(tmp_path / "chunks")
    dfs = [spark.range(i * 10, i * 10 + 5).selectExpr("id AS v") for i in range(3)]
    write_stream_chunks(dfs, d)
    stream = (
        spark.readStream.schema("v long").option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("replay_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) == 3  # one micro-batch per chunk
    # chunk order == mtime order: re-running with the dedup sink in
    # test_incremental_dedup_stream_state asserts content-order effects


def test_incremental_dedup_stream_state(spark, tmp_path):
    """A hash seen in batch 0 must be anti-joined away in batch 1, and
    within-batch duplicates must collapse to the min doc_id."""
    import os

    from nyc_open_data_pipeline_spark.streaming.dedup import run_incremental_dedup
    from nyc_open_data_pipeline_spark.streaming.replay import write_stream_chunks

    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha"), (3, "beta")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, "gamma")], "doc_id long, text string"
    )
    d = str(tmp_path / "in")
    write_stream_chunks([b0, b1], d)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    run_incremental_dedup(spark, stream, out, state)
    got = {
        r["doc_id"] for r in spark.read.parquet(out).collect()
    }
    # alpha -> 1 (2 collapsed within batch), beta -> 3 (10 dropped by state),
    # gamma -> 11 (12 collapsed within batch)
    assert got == {1, 3, 11}
    assert os.path.isdir(state)


def test_watermark_drops_late_rows(spark, sf_dir):
    """st5's premise: the three-batch replay must actually drop late rows
    (not vacuously equal the no-watermark batch answer)."""
    from nyc_open_data_pipeline_spark.plans import all_queries

    qs = all_queries()
    emitted = qs["st5_stream_late_data"].fn(spark, sf_dir).collect()
    full = {
        r["window_start"]: r["n_events"]
        for r in qs["e1_tumbling_window"].fn(spark, sf_dir).collect()
    }
    dropped = sum(
        full[r["window_start"]] - r["n_events"]
        for r in emitted
        if r["window_start"] in full
    )
    assert dropped > 0  # late rows were really filtered
    assert len(emitted) < len(full)  # open windows not emitted in append mode


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


def test_funnel_state_machine_handles_late_view(spark, tmp_path):
    """A 'view' that arrives in a LATER micro-batch than the click/purchase
    it unlocks must still complete the funnel — the state machine retains
    step timestamps, so reached is recomputed, not greedily latched."""
    from datetime import datetime

    from pyspark.sql import functions as F
    from nyc_open_data_pipeline_spark.streaming.replay import write_stream_chunks
    from nyc_open_data_pipeline_spark.streaming.stateful import funnel_stream
    from nyc_open_data_pipeline_spark.streaming.windows import events_stream, run_to_memory

    rows = [
        # user 1: click+purchase arrive in batch 0, the UNLOCKING view in batch 1
        (10, "2024-01-01 01:00:00", 1, "click", 0.0, "{}", 0),
        (11, "2024-01-01 02:00:00", 1, "purchase", 0.0, "{}", 0),
        (12, "2024-01-01 00:30:00", 1, "view", 0.0, "{}", 1),
        # user 2: view only -> reached 1
        (20, "2024-01-01 00:00:00", 2, "view", 0.0, "{}", 0),
        # user 3: purchase BEFORE click (never valid) -> reached 2
        (30, "2024-01-01 00:00:00", 3, "view", 0.0, "{}", 0),
        (31, "2024-01-01 02:00:00", 3, "click", 0.0, "{}", 1),
        (32, "2024-01-01 01:00:00", 3, "purchase", 0.0, "{}", 1),
    ]
    df = spark.createDataFrame(
        [(e, datetime.fromisoformat(ts), u, t, v, p, b) for e, ts, u, t, v, p, b in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string, batch int",
    )
    d = str(tmp_path / "funnel_stream")
    write_stream_chunks(
        [df.filter(F.col("batch") == k).drop("batch") for k in range(2)], d
    )
    name = "funnel_oor_test"
    run_to_memory(
        funnel_stream(events_stream(spark, path=d, maxFilesPerTrigger=1)),
        name,
        mode="update",
    )
    final = {
        r["user_id"]: r["reached"]
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(F.max_by("reached", "n_seen").alias("reached"))
        .collect()
    }
    assert final == {1: 3, 2: 1, 3: 2}


def test_event_time_ttl_evicts_idle_state(spark, tmp_path):
    """Bounded state: a user idle past the TTL (event time, watermark-driven)
    gets their state evicted (tombstone n_events=-1) and restarts from zero
    on return — state size tracks LIVE users, the 100 TB/day requirement."""
    from datetime import datetime

    from pyspark.sql import functions as F
    from nyc_open_data_pipeline_spark.streaming.replay import write_stream_chunks
    from nyc_open_data_pipeline_spark.streaming.stateful import profile_stream_with_ttl
    from nyc_open_data_pipeline_spark.streaming.windows import events_stream, run_to_memory

    sch = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    batches = [
        [(1, datetime(2024, 1, 1, 0, 0), 1, "view", 0.0, "{}")],
        [(2, datetime(2024, 1, 1, 5, 0), 2, "view", 0.0, "{}")],  # watermark +5h
        [(3, datetime(2024, 1, 1, 6, 0), 2, "view", 0.0, "{}")],
        [(4, datetime(2024, 1, 1, 6, 30), 1, "view", 0.0, "{}")],  # user1 returns
    ]
    d = str(tmp_path / "ttl_stream")
    write_stream_chunks([spark.createDataFrame(b, sch) for b in batches], d)
    run_to_memory(
        profile_stream_with_ttl(
            events_stream(spark, path=d, maxFilesPerTrigger=1), ttl_ms=3_600_000
        ),
        "ttl_evict_test",
        mode="update",
    )
    rows = [
        (r["user_id"], r["n_events"])
        for r in spark.table("ttl_evict_test").orderBy("user_id", "n_events").collect()
    ]
    # user1: initial profile, tombstone after idle > 1h, fresh restart at 1
    assert rows.count((1, -1)) == 1
    assert rows.count((1, 1)) == 2  # original n=1 and restarted n=1
    # user2 stayed live: 1 then 2, never evicted
    assert (2, 1) in rows and (2, 2) in rows and (2, -1) not in rows


def test_incremental_dedup_sink_batch_replay_is_noop(spark, tmp_path):
    """Checkpoint recovery re-delivers the last uncommitted batch; the sink's
    batch-id marker must make an already-applied replay a no-op (parquet
    append is not transactional — without the marker the replay would
    double-append survivors)."""
    from nyc_open_data_pipeline_spark.streaming.dedup import incremental_dedup_sink

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_dedup_sink(spark, out, state)
    b0 = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id long, text string")
    sink(b0, 0)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 2}
    # crash-after-commit replay: same batch id delivered again
    sink(b0, 0)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2  # no double-append
    # a NEW batch id with overlapping content still dedups via state
    b1 = spark.createDataFrame([(5, "alpha"), (6, "delta")], "doc_id long, text string")
    sink(b1, 1)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 2, 6}


def test_cached_fixture_builds_once_per_session(spark, sf_dir):
    """The stream-input 'topic' is scaffolding: the same (sf_dir, tag) must
    reuse one directory, and distinct tags must not collide."""
    from nyc_open_data_pipeline_spark.streaming.windows import cached_fixture

    calls = []

    def build(p):
        calls.append(p)

    d1 = cached_fixture(spark, sf_dir, "ut_fixture", build)
    d2 = cached_fixture(spark, sf_dir, "ut_fixture", build)
    d3 = cached_fixture(spark, sf_dir, "ut_fixture_other", build)
    assert d1 == d2 and len(calls) == 2  # one build per tag
    assert d3 != d1


def test_run_to_memory_restores_shuffle_partitions(spark, sf_dir):
    """The streaming state-partition override must never leak into the
    session's batch conf after the query finishes."""
    from nyc_open_data_pipeline_spark.streaming.windows import (
        cached_fixture,
        events_stream,
        run_to_memory,
        tumbling_counts,
    )
    from nyc_open_data_pipeline_spark.plans.common import t

    before = spark.conf.get("spark.sql.shuffle.partitions")
    d = cached_fixture(
        spark, sf_dir, "evfull",
        lambda p: t(spark, sf_dir, "events").write.mode("overwrite").parquet(p),
    )
    run_to_memory(
        tumbling_counts(events_stream(spark, path=d)),
        "ut_conf_restore",
        mode="complete",
        shuffle_partitions=4,
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_interval_join_state_evicts_after_watermark(spark, tmp_path):
    """st9's premise made measurable: the stream-stream interval join must
    DROP buffered rows once the watermark passes the interval end — state
    tracks the active window, not history. Feed three day-apart batches and
    assert the state store reports removals and ends below total input."""
    from datetime import datetime

    from pyspark.sql import functions as F
    from nyc_open_data_pipeline_spark.streaming.replay import write_stream_chunks
    from nyc_open_data_pipeline_spark.streaming.windows import (
        events_stream,
        run_to_memory,
    )

    sch = "event_id long, ts timestamp, user_id long, event_type string"
    def mk(rows):
        return spark.createDataFrame(
            [(e, datetime.fromisoformat(ts), u, k) for e, ts, u, k in rows], sch
        )

    batches = [
        mk([(1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 00:30:00", 1, "purchase")]),
        mk([(3, "2024-01-02 00:00:00", 1, "view"),
            (4, "2024-01-02 00:20:00", 1, "purchase")]),
        mk([(5, "2024-01-03 00:00:00", 1, "view"),
            (6, "2024-01-03 00:10:00", 1, "purchase")]),
    ]
    d = str(tmp_path / "ssj_in")
    write_stream_chunks(batches, d)

    def side(kind: str, prefix: str):
        return (
            events_stream(spark, schema=sch, path=d, maxFilesPerTrigger=1)
            .filter(F.col("event_type") == kind)
            .withWatermark("ts", "10 minutes")
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
        )

    joined = side("view", "v").join(
        side("purchase", "p"),
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("interval 1 hour")),
    )
    q = run_to_memory(joined, "ssj_state_test", mode="append")
    progs = [p for p in q.recentProgress if p["stateOperators"]]
    assert progs, "no state-operator progress recorded"
    removed = sum(
        op.get("numRowsRemoved", 0) for p in progs for op in p["stateOperators"]
    )
    final_total = sum(op["numRowsTotal"] for op in progs[-1]["stateOperators"])
    assert removed > 0  # watermark passage really evicted buffered rows
    assert final_total < 6  # 6 events fed; closed-interval rows are gone
    # and the join still answered: one pair per day
    assert spark.table("ssj_state_test").count() == 3


def test_session_state_drops_closed_sessions(spark, tmp_path):
    """st10's premise made measurable: in append mode, a session whose gap
    has passed the watermark is emitted once and its merge state dropped —
    state is bounded by OPEN sessions. (st10 itself runs complete mode as
    an oracle fixture; production session rollups run append/update, which
    is what this pins.)"""
    from datetime import datetime

    from nyc_open_data_pipeline_spark.streaming.replay import write_stream_chunks
    from nyc_open_data_pipeline_spark.streaming.windows import (
        events_stream,
        run_to_memory,
        session_counts,
    )

    sch = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    def day(n, eid):
        return [
            (eid, datetime(2024, 1, n, 0, 0), 1, "view", 1.0, "{}"),
            (eid + 1, datetime(2024, 1, n, 0, 10), 1, "view", 1.0, "{}"),
        ]

    batches = [
        spark.createDataFrame(day(1, 10), sch),
        spark.createDataFrame(day(2, 20), sch),
        spark.createDataFrame(day(3, 30), sch),
    ]
    d = str(tmp_path / "sess_in")
    write_stream_chunks(batches, d)
    q = run_to_memory(
        session_counts(
            events_stream(spark, path=d, maxFilesPerTrigger=1),
            gap="30 minutes",
            watermark="1 hour",
        ),
        "sess_state_test",
        mode="append",
    )
    progs = [p for p in q.recentProgress if p["stateOperators"]]
    assert progs, "no state-operator progress recorded"
    removed = sum(
        op.get("numRowsRemoved", 0) for p in progs for op in p["stateOperators"]
    )
    final_total = sum(op["numRowsTotal"] for op in progs[-1]["stateOperators"])
    assert removed > 0  # closed sessions were dropped from the state store
    assert final_total <= 1  # at most the still-open day-3 session remains
    # append emitted exactly the two closed sessions (day 3 still open)
    rows = spark.table("sess_state_test").collect()
    assert len(rows) == 2
    assert all(r["n_events"] == 2 for r in rows)


def test_transform_with_state_gate_or_parity(spark, sf_dir, stream_dir):
    """transformWithStateInPandas needs google-protobuf (its Python worker
    talks to the state server over protobuf). Without it the operator must
    refuse loudly at CONSTRUCTION time — never crash mid-stream; with it,
    the final state must equal the batch GROUP BY."""
    from pyspark.sql import functions as F
    from nyc_open_data_pipeline_spark.streaming.stateful import (
        user_type_diversity_stream,
    )

    try:
        import google.protobuf  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False

    stream = events_stream(spark, path=stream_dir)
    if not has_protobuf:
        with pytest.raises(NotImplementedError, match="protobuf"):
            user_type_diversity_stream(stream)
        return

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        run_to_memory(user_type_diversity_stream(stream), "tws_parity", mode="update")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    got = {
        r["user_id"]: (r["n_events"], r["n_event_types"])
        for r in spark.table("tws_parity")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_event_types").alias("n_event_types"),
        )
        .collect()
    }
    from nyc_open_data_pipeline_spark.catalog import load_table

    exp = {
        r["user_id"]: (r["n"], r["nt"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.countDistinct("event_type").alias("nt"))
        .collect()
    }
    assert got == exp


def test_incremental_neardup_stream_state(spark, tmp_path):
    """Band keys seen in batch 0 must drop colliding docs in batch 1,
    within-batch collisions must keep the min doc_id, and shingle-less
    (short) docs must be out of scope entirely."""
    from nyc_open_data_pipeline_spark.streaming.dedup import run_incremental_neardup
    from nyc_open_data_pipeline_spark.streaming.replay import write_stream_chunks

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different words appear in this other document body text"
    c = "a third unrelated passage about spark shuffles and parquet footers"
    b0 = spark.createDataFrame(
        [(1, a), (2, a), (3, b), (4, "hi")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(10, a), (11, c), (12, c)], "doc_id long, text string"
    )
    d = str(tmp_path / "in")
    write_stream_chunks([b0, b1], d)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    run_incremental_neardup(spark, stream, out, state)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # a -> 1 (2 within-batch, 10 by state), b -> 3, c -> 11 (12 within-batch);
    # 4 is too short to shingle -> no band keys -> out of scope
    assert got == {1, 3, 11}


def test_incremental_neardup_sink_batch_replay_is_noop(spark, tmp_path):
    """Marker protocol parity with the exact-hash sink: an already-applied
    batch id replays as a no-op; a new batch id still filters via state."""
    from nyc_open_data_pipeline_spark.streaming.dedup import incremental_neardup_sink

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different words appear in this other document body text"
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_neardup_sink(spark, out, state)
    b0 = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    sink(b0, 0)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 2}
    sink(b0, 0)  # crash-after-commit replay
    assert len(spark.read.parquet(out).collect()) == 2
    b1 = spark.createDataFrame(
        [(5, a), (6, "a third unrelated passage about spark shuffles here")],
        "doc_id long, text string",
    )
    sink(b1, 1)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 2, 6}


def test_stream_incremental_neardup_equals_batch_greedy(spark, sf_dir):
    """st11's replayed answer must equal the batch greedy-first-seen answer
    computed directly over the full table (the stream==batch contract the
    oracle encodes): accept a doc iff every band key's corpus-wide MIN
    doc_id is itself."""
    from pyspark.sql import functions as F

    from nyc_open_data_pipeline_spark.catalog import load_table
    from nyc_open_data_pipeline_spark.operators.dedup import band_keys
    from nyc_open_data_pipeline_spark.plans import all_queries

    got = {
        r["doc_id"]
        for r in all_queries()["st11_stream_incremental_neardup"]
        .fn(spark, sf_dir)
        .collect()
    }
    bk = (
        band_keys(load_table(spark, sf_dir, "documents"))
        .filter(F.length("band_key") > 0)
        .withColumnRenamed("id", "doc_id")
    )
    firsts = bk.groupBy("band", "band_key").agg(F.min("doc_id").alias("first_id"))
    exp = {
        r["doc_id"]
        for r in bk.join(firsts, ["band", "band_key"])
        .groupBy("doc_id")
        .agg(F.max((F.col("first_id") < F.col("doc_id")).cast("int")).alias("d"))
        .filter(F.col("d") == 0)
        .collect()
    }
    assert got == exp and len(got) > 0


def test_incremental_dedup_sink_crash_before_marker_replay(spark, tmp_path):
    """The round-7 idempotence upgrade: a crash AFTER the output/state
    writes but BEFORE the marker commit replays the batch with the marker
    un-advanced — per-batch overwrite partitions must replace, not
    double-append, and the pre-batch state filter must not let the batch's
    own landed state keys anti-join away its own survivors."""
    import os

    from nyc_open_data_pipeline_spark.streaming.dedup import incremental_dedup_sink

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_dedup_sink(spark, out, state)
    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    sink(b0, 0)
    b1 = spark.createDataFrame(
        [(5, "alpha"), (6, "delta")], "doc_id long, text string"
    )
    sink(b1, 1)
    # simulate crash-before-marker on batch 1: writes landed, marker did not
    with open(os.path.join(state, "_last_batch"), "w") as f:
        f.write("0")  # marker un-advanced (a real crash never DELETES it)
    sink(b1, 1)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 2, 6}
    assert len(spark.read.parquet(out).collect()) == 3  # no double-append


def test_incremental_neardup_sink_crash_before_marker_replay(spark, tmp_path):
    """Same crash-before-marker replay for the band-key sink."""
    import os

    from nyc_open_data_pipeline_spark.streaming.dedup import incremental_neardup_sink

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different words appear in this other document body text"
    c = "a third unrelated passage about spark shuffles and parquet footers"
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_neardup_sink(spark, out, state)
    sink(spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string"), 0)
    b1 = spark.createDataFrame([(5, a), (6, c)], "doc_id long, text string")
    sink(b1, 1)
    with open(os.path.join(state, "_last_batch"), "w") as f:
        f.write("0")  # marker un-advanced (a real crash never DELETES it)
    sink(b1, 1)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 2, 6}
    assert len(spark.read.parquet(out).collect()) == 3


def test_incremental_substring_sink_crash_before_marker_replay(spark, tmp_path):
    """Crash-before-marker replay for the gram-state substring sink: the
    replayed batch must overwrite its own span/state partitions (no
    double-append) and the pre-batch state filter must keep the batch's
    own landed gram keys out of its replayed seen-set (which would
    otherwise mark EVERY window of the batch as duplicated)."""
    import os

    from nyc_open_data_pipeline_spark.streaming.dedup import (
        incremental_substring_sink,
    )

    # 12-token texts: one 10-token window per doc at offset 1..3
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    other = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_substring_sink(spark, out, state)
    sink(spark.createDataFrame([(1, base)], "doc_id long, text string"), 0)
    b1 = spark.createDataFrame(
        [(5, base), (6, other)], "doc_id long, text string"
    )
    sink(b1, 1)
    with open(os.path.join(state, "_last_batch"), "w") as f:
        f.write("0")  # marker un-advanced (a real crash never DELETES it)
    sink(b1, 1)  # replay after crash-before-marker
    rows = spark.read.parquet(out).collect()
    # doc 5 repeats doc 1's text -> one maximal span covering tokens 1..12;
    # docs 1 and 6 are first occurrences -> no spans
    assert [(r["doc_id"], r["start_pos"], r["end_pos"], r["span_len"]) for r in rows] == [
        (5, 1, 12, 12)
    ]


def test_incremental_substring_within_batch_keep_first(spark, tmp_path):
    """Within one micro-batch, only the LOWER doc_id is the keeper: the
    higher id's windows are duplicated spans even with empty prior state."""
    from nyc_open_data_pipeline_spark.streaming.dedup import (
        incremental_substring_sink,
    )

    text = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_substring_sink(spark, out, state)
    sink(
        spark.createDataFrame(
            [(3, text), (9, text)], "doc_id long, text string"
        ),
        0,
    )
    rows = spark.read.parquet(out).collect()
    assert [(r["doc_id"], r["start_pos"], r["end_pos"], r["span_len"]) for r in rows] == [
        (9, 1, 10, 10)
    ]


def test_incremental_substring_keep_first_join_is_shuffled(spark, tmp_path):
    """The within-batch keep-first join must execute as a SHUFFLED hash
    join with the aggregated mins as build side (round 10): a broadcast
    here would be Catalyst's expansion-blind static estimate shipping the
    posexploded grams side (the d26 sf100 killer), and the round-9
    window-min alternative serializes a batch-wide hot gram into one
    task. The shuffle_hash hint is the pin; this test keeps it pinned."""
    from nyc_open_data_pipeline_spark.streaming.dedup import (
        incremental_substring_sink,
    )
    from nyc_open_data_pipeline_spark.streaming.windows import (
        drain_stream_plans,
    )

    drain_stream_plans()
    text = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_substring_sink(spark, out, state)
    sink(
        spark.createDataFrame(
            [(1, text), (2, text)], "doc_id long, text string"
        ),
        0,
    )
    recorded = drain_stream_plans()
    assert recorded, "batch plan was not recorded"
    plans = [p for name, p in recorded if "incremental_substring" in name]
    assert plans, f"no substring batch plan among {[n for n, _ in recorded]}"
    assert any("ShuffledHashJoin" in p for p in plans), (
        "keep-first join is not a shuffled hash join"
    )


def _state_parquet_files(state_dir):
    """All visible parquet files under batch=* partitions of a state dir."""
    import os

    out = []
    for e in sorted(os.listdir(state_dir)):
        d = os.path.join(state_dir, e)
        if e.startswith("batch=") and os.path.isdir(d):
            out += [
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            ]
    return out


def test_compact_state_preserves_survivors_and_bounds_files(spark, tmp_path):
    """Round-10 verdict #1: the state-store maintenance the module docstring
    promised. Drive 10 micro-batches through the exact-hash sink twice —
    once untouched, once with compact_state interleaved mid-stream — and
    prove (a) identical survivors, (b) the compacted store's batch-dir and
    file counts are bounded by (uncompacted batches + 1), not by total
    batches processed."""
    import os

    from nyc_open_data_pipeline_spark.streaming.dedup import (
        compact_state,
        incremental_dedup_sink,
    )

    # 10 batches; text j of batch i duplicates batch i-2's text j for even j
    def batch(i):
        rows = []
        for j in range(4):
            txt = f"doc {i - 2 if (j % 2 == 0 and i >= 2) else i} payload {j}"
            rows.append((i * 100 + j, txt))
        return spark.createDataFrame(rows, "doc_id long, text string")

    out_a, state_a = str(tmp_path / "out_a"), str(tmp_path / "state_a")
    sink_a = incremental_dedup_sink(spark, out_a, state_a)
    for i in range(10):
        sink_a(batch(i), i)

    out_b, state_b = str(tmp_path / "out_b"), str(tmp_path / "state_b")
    sink_b = incremental_dedup_sink(spark, out_b, state_b)
    for i in range(10):
        sink_b(batch(i), i)
        if i in (4, 7):  # compact mid-stream, between batches
            stats = compact_state(spark, state_b, min_batches=2)
            assert stats.batches_merged == {4: 5, 7: 4}[i]
            assert stats.files_after <= stats.files_before

    surv = lambda p: {r["doc_id"] for r in spark.read.parquet(p).collect()}  # noqa: E731
    assert surv(out_b) == surv(out_a) and len(surv(out_a)) > 0
    state_keys = lambda p: {  # noqa: E731
        r["content_hash"] for r in spark.read.parquet(p).collect()
    }
    assert state_keys(state_b) == state_keys(state_a)
    # bounded: batches 0..7 merged into one partition, 8..9 still their own
    dirs_b = [e for e in os.listdir(state_b) if e.startswith("batch=")]
    assert len(dirs_b) == 3
    assert len(_state_parquet_files(state_b)) < len(_state_parquet_files(state_a))


def test_compact_state_then_crash_replay_overwrites_own_partition(spark, tmp_path):
    """A checkpoint replay AFTER compaction must behave exactly as before:
    the replayed batch overwrites only its OWN partition (id > marker at
    write time > every compacted id) and anti-joins against exactly the
    pre-batch state, so survivors match the never-crashed run and nothing
    double-appends into the compaction destination."""
    import os

    from nyc_open_data_pipeline_spark.streaming.dedup import (
        compact_state,
        incremental_dedup_sink,
    )

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_dedup_sink(spark, out, state)
    texts = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    for i in range(8):
        sink(
            spark.createDataFrame(
                [(i * 10, texts[i]), (i * 10 + 1, texts[max(0, i - 1)])],
                "doc_id long, text string",
            ),
            i,
        )
    stats = compact_state(spark, state, min_batches=2)
    assert stats.batches_merged == 8
    dest = os.path.join(state, "batch=7")
    dest_files_before = sorted(os.listdir(dest))

    # batch 8: one dup of batch 7's text, one new text
    b8 = spark.createDataFrame(
        [(80, texts[7]), (81, "iota")], "doc_id long, text string"
    )
    sink(b8, 8)
    with open(os.path.join(state, "_last_batch"), "w") as f:
        f.write("7")  # crash-before-marker: marker un-advanced, not deleted
    sink(b8, 8)  # replay

    assert sorted(os.listdir(dest)) == dest_files_before  # destination untouched
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # per batch i: doc i*10 survives (new text), i*10+1 is a dup of batch
    # i-1's text except batch 0 where both rows are 'alpha' (within-batch
    # collapse keeps doc 0); batch 8: 80 dups theta, 81 survives
    assert got == {i * 10 for i in range(8)} | {81}
    assert len(spark.read.parquet(out).collect()) == len(got)  # no double rows


def test_compact_state_crash_mid_swap_is_harmless_and_self_heals(spark, tmp_path):
    """Duplicate-window tolerance: simulate a compaction that crashed after
    moving SOME merged files but before deleting the originals (duplicate
    keys visible) plus a stale _compact_* temp dir. The sinks must still
    produce correct survivors, and the next compact_state run must clean
    the store back to distinct keys and drop the stale temp dir."""
    import os
    import shutil

    from nyc_open_data_pipeline_spark.streaming.dedup import (
        compact_state,
        incremental_dedup_sink,
    )

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_dedup_sink(spark, out, state)
    for i, t in enumerate(["one", "two", "three", "four"]):
        sink(
            spark.createDataFrame([(i, t)], "doc_id long, text string"), i
        )
    # fake a crashed swap: batch=3 gets a DUPLICATE copy of batch=0's file,
    # and a stale temp dir is left behind
    src = next(
        f
        for f in os.listdir(os.path.join(state, "batch=0"))
        if f.endswith(".parquet")
    )
    shutil.copy(
        os.path.join(state, "batch=0", src),
        os.path.join(state, "batch=3", "compact-dead-00000.parquet"),
    )
    os.makedirs(os.path.join(state, "_compact_dead"), exist_ok=True)
    with open(os.path.join(state, "_compact_dead", "garbage.txt"), "w") as f:
        f.write("leftover")

    # a batch against the duplicated store still dedups correctly
    sink(
        spark.createDataFrame(
            [(40, "one"), (41, "five")], "doc_id long, text string"
        ),
        4,
    )
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {
        0, 1, 2, 3, 41,
    }

    stats = compact_state(spark, state, min_batches=2)
    assert stats.batches_merged == 5
    assert not os.path.isdir(os.path.join(state, "_compact_dead"))
    rows = spark.read.parquet(state).select("content_hash").collect()
    hashes = [r["content_hash"] for r in rows]
    assert len(hashes) == len(set(hashes)) == 5  # distinct again


def test_compact_state_below_min_batches_is_noop(spark, tmp_path):
    import os

    from nyc_open_data_pipeline_spark.streaming.dedup import (
        compact_state,
        incremental_dedup_sink,
    )

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_dedup_sink(spark, out, state)
    sink(spark.createDataFrame([(1, "a")], "doc_id long, text string"), 0)
    sink(spark.createDataFrame([(2, "b")], "doc_id long, text string"), 1)
    listing = sorted(os.listdir(state))
    stats = compact_state(spark, state, min_batches=4)
    assert stats.batches_merged == 0
    assert sorted(os.listdir(state)) == listing  # untouched
    # and on a dir with no marker at all
    empty = str(tmp_path / "nostate")
    os.makedirs(empty)
    assert compact_state(spark, empty).batches_merged == 0


def test_compact_state_band_key_store(spark, tmp_path):
    """compact_state is schema-generic: the two-column band-key store of
    the near-dup sink compacts with identical semantics (state keys equal
    before/after, later batches still anti-join against them)."""
    from nyc_open_data_pipeline_spark.streaming.dedup import (
        compact_state,
        incremental_neardup_sink,
    )

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different words appear in this other document body text"
    c = "a third unrelated passage about spark shuffles and parquet footers"
    d = "yet another corpus line mentioning watermarks checkpoints and state"
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_neardup_sink(spark, out, state)
    for i, t in enumerate([a, b, c, d]):
        sink(
            spark.createDataFrame([(i, t)], "doc_id long, text string"), i
        )
    before = {
        (r["band"], r["band_key"])
        for r in spark.read.parquet(state).select("band", "band_key").collect()
    }
    stats = compact_state(spark, state, min_batches=2)
    assert stats.batches_merged == 4
    after = {
        (r["band"], r["band_key"])
        for r in spark.read.parquet(state).select("band", "band_key").collect()
    }
    assert after == before
    # a near-copy of doc 0 arriving after compaction is still dropped
    sink(
        spark.createDataFrame(
            [(100, a + " extra"), (101, "entirely novel text about nothing shared with priors at all")],
            "doc_id long, text string",
        ),
        4,
    )
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 100 not in got and 101 in got


def test_run_incremental_dedup_compact_after(spark, tmp_path):
    """compact_after=True on the drain wrapper compacts the state store at
    the safe point (drain complete) without changing survivors."""
    import os

    from nyc_open_data_pipeline_spark.streaming.dedup import run_incremental_dedup
    from nyc_open_data_pipeline_spark.streaming.replay import write_stream_chunks

    chunks = [
        spark.createDataFrame(
            [(i * 10, f"text {i}"), (i * 10 + 1, f"text {max(0, i - 1)}")],
            "doc_id long, text string",
        )
        for i in range(5)
    ]
    d = str(tmp_path / "in")
    write_stream_chunks(chunks, d)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    run_incremental_dedup(spark, stream, out, state, compact_after=True)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {0, 10, 20, 30, 40}  # i*10 new, i*10+1 dups batch i-1 (0,1 collapse)
    dirs = [e for e in os.listdir(state) if e.startswith("batch=")]
    assert dirs == ["batch=4"]  # all five partitions merged into the marker id


def test_compact_state_all_empty_batches_is_noop(spark, tmp_path):
    """An all-duplicate feed commits batches whose state partitions hold
    zero rows (no part files under AQE empty-relation writes); compaction
    must no-op instead of failing schema inference over empty dirs."""
    import os

    from nyc_open_data_pipeline_spark.streaming.dedup import compact_state

    state = str(tmp_path / "state")
    for i in range(5):
        d = os.path.join(state, f"batch={i}")
        os.makedirs(d)
        open(os.path.join(d, "_SUCCESS"), "w").close()
    with open(os.path.join(state, "_last_batch"), "w") as f:
        f.write("4")
    stats = compact_state(spark, state, min_batches=2)
    assert stats.batches_merged == 0 and stats.files_before == 0


def test_replay_guard_refuses_lost_marker_and_stale_marker(spark, tmp_path):
    """ADVICE r12: once compact_state has folded history into one
    partition, the _last_batch marker is correctness-bearing. A sink
    must fail LOUDLY (not silently re-admit every seen document) when
    (a) the marker is lost while state partitions exist, or (b) a stale
    marker would let a replay overwrite a compaction destination."""
    import os

    import pytest

    from nyc_open_data_pipeline_spark.streaming.dedup import (
        compact_state,
        incremental_dedup_sink,
    )

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_dedup_sink(spark, out, state)
    for i in range(4):
        sink(
            spark.createDataFrame([(i, f"text {i}")], "doc_id long, text string"),
            i,
        )
    stats = compact_state(spark, state, min_batches=2)
    assert stats.batches_merged == 4

    # (a) lost marker: processing any new batch must refuse
    os.rename(os.path.join(state, "_last_batch"), os.path.join(state, "_mv"))
    b4 = spark.createDataFrame([(40, "text 40")], "doc_id long, text string")
    with pytest.raises(RuntimeError, match="marker is missing"):
        sink(b4, 4)
    os.rename(os.path.join(state, "_mv"), os.path.join(state, "_last_batch"))

    # (b) stale marker (pre-compaction backup): batch=3 is the compaction
    # destination; a marker of 2 would admit a "replay" of batch 3 that
    # overwrites the whole merged seen-set
    with open(os.path.join(state, "_last_batch"), "w") as f:
        f.write("2")
    b3 = spark.createDataFrame([(30, "text 3")], "doc_id long, text string")
    with pytest.raises(RuntimeError, match="compaction destination"):
        sink(b3, 3)

    # (c) stale marker, INTERMEDIATE replay (ADVICE r13): marker=1 with
    # destination batch=3 means replayed batches 2..2 sit strictly between
    # marker and destination — each would read state with batch < batch_id
    # (excluding the merged seen-set at batch=3) and overwrite its output
    # with duplicate-admitting results long before batch 3 trips the
    # narrow ==destination check. EVERY batch must refuse while any
    # destination exceeds the marker.
    with open(os.path.join(state, "_last_batch"), "w") as f:
        f.write("1")
    b2 = spark.createDataFrame([(20, "text 2")], "doc_id long, text string")
    with pytest.raises(RuntimeError, match="exceeds the\n?.*marker|marker"):
        sink(b2, 2)

    # restored marker: the sink resumes normally
    with open(os.path.join(state, "_last_batch"), "w") as f:
        f.write("3")
    sink(b4, 4)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 2, 3, 40}


def test_first_batch_crash_with_no_marker_still_replays(spark, tmp_path):
    """Round-12 review: a crash during the very FIRST batch leaves state
    partitions but no _last_batch marker at all — the replay guard must
    not trip on this self-healing pre-compaction case (the tripwires arm
    only once compact-* files exist)."""
    import os

    from nyc_open_data_pipeline_spark.streaming.dedup import incremental_dedup_sink

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    sink = incremental_dedup_sink(spark, out, state)
    b0 = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id long, text string")
    sink(b0, 0)
    os.remove(os.path.join(state, "_last_batch"))  # crash before FIRST commit
    sink(b0, 0)  # replay must overwrite its own partitions, not raise
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 2}
    assert len(spark.read.parquet(out).collect()) == 2  # no double rows


def test_sink_metrics_counts_match_written_rows(spark, tmp_path):
    """Round-13 sink internals change: per-batch metrics counts now come
    from the written parquet FOOTERS (no count job, no output checkpoint)
    — pin that the reported n_out/n_new_keys equal the rows actually
    written per batch partition, for both the exact-hash and the
    near-dup sinks."""
    from nyc_open_data_pipeline_spark.streaming.dedup import (
        run_incremental_dedup,
        run_incremental_neardup,
    )
    from nyc_open_data_pipeline_spark.streaming.replay import write_stream_chunks
    from nyc_open_data_pipeline_spark.streaming.windows import drain_batch_metrics

    b0 = spark.createDataFrame(
        [(1, "alpha one two three four"), (2, "alpha one two three four"),
         (3, "beta five six seven eight")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(10, "beta five six seven eight"), (11, "gamma nine ten eleven twelve")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "in")
    write_stream_chunks([b0, b1], d)
    drain_batch_metrics()
    for runner, out_tag in (
        (run_incremental_dedup, "dedup"),
        (run_incremental_neardup, "neardup"),
    ):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = str(tmp_path / f"out_{out_tag}")
        state = str(tmp_path / f"state_{out_tag}")
        runner(spark, stream, out, state)
        by_batch = {}
        for m in drain_batch_metrics():
            by_batch[m["batch_id"]] = m
        assert set(by_batch) == {0, 1}
        for bid, m in by_batch.items():
            written = spark.read.parquet(f"{out}/batch={bid}").count()
            assert m["n_out"] == written, (out_tag, bid, m, written)
            if "n_new_keys" in m:
                keys = spark.read.parquet(f"{state}/batch={bid}").count()
                assert m["n_new_keys"] == keys, (out_tag, bid, m, keys)
