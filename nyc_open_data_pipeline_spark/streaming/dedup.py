"""Streaming incremental deduplication (foreachBatch + hash-state store).

The batch flow is ``plans/llmdata.d8_incremental_dedup`` (new batch
left_anti-joined against the corpus's content-hash set); this module runs
the same anti-join per micro-batch inside ``foreachBatch``, appending
survivors to the output table and their hashes to the state table. That is
the production shape for continuous corpus ingestion at 100 TB:

- the state table holds ONE narrow column (content_hash) — parquet-append
  per batch, compacted/bucketed by hash out-of-band so the anti-join never
  reshuffles the corpus side;
- within-batch duplicates collapse first (groupBy hash, keep min id) so the
  anti-join's left side is already distinct;
- ``foreachBatch`` gives exactly-once-per-batch semantics with the stream's
  checkpoint (batch_id-keyed idempotence is the documented upgrade for
  rerun safety; parquet append is at-least-once here and sufficient for a
  demonstration sink).

No counterpart in the reference (batch CLI only — SURVEY §2.13); this
extends d8 the way st1/st2 extend e1/a-family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.operators.dedup import normalized_text

_DRAIN_TIMEOUT_S = 1800  # hard ceiling; measured drains stop well short (st11 sf1: 161 s)


def _await_drained(q, label: str) -> None:
    """Wait for an availableNow query to DRAIN, and refuse to let a timeout
    masquerade as success: awaitTermination(t) returns False while the
    query is still running, in which case the caller would read a
    partially-written output dir as the answer (and the live query would
    keep appending to a dir already consumed). Stop and fail loudly."""
    if q.awaitTermination(_DRAIN_TIMEOUT_S):
        return
    q.stop()
    raise TimeoutError(
        f"{label}: stream not drained after {_DRAIN_TIMEOUT_S}s - "
        "output would be truncated; raise _DRAIN_TIMEOUT_S or shrink the feed"
    )


HASH_SCHEMA = "content_hash string"


def hashed_docs(df: DataFrame) -> DataFrame:
    """(doc_id, content_hash) with the engine-wide normalization (d1/d8)."""
    return df.select(
        "doc_id", F.md5(normalized_text(F.col("text"))).alias("content_hash")
    )


def incremental_dedup_sink(spark: SparkSession, out_dir: str, state_dir: str):
    """foreachBatch function: per micro-batch, collapse within-batch dupes
    (keep the smallest doc_id per hash), drop hashes already in the corpus
    state, then append survivors + their hashes.

    Exactly-once under replay: the stream's checkpoint re-delivers the last
    uncommitted batch after a crash, and parquet append is not transactional
    — so the sink records the last batch id it fully applied (`_last_batch`
    marker, written via tmp+rename AFTER both appends) and skips any batch
    id at or below it. Re-running a partially-applied batch is safe in one
    direction by construction (the anti-join drops hashes whose state
    append landed); the marker closes the other direction (both appends
    landed, commit didn't)."""
    os.makedirs(state_dir, exist_ok=True)
    marker = os.path.join(state_dir, "_last_batch")

    def last_committed() -> int:
        try:
            with open(marker) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -1

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed():
            return  # replay of an already-applied batch
        sess = batch_df.sparkSession
        batch = (
            hashed_docs(batch_df)
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        state_files = [f for f in os.listdir(state_dir) if f.endswith(".parquet")]
        if state_files:
            seen = sess.read.schema(HASH_SCHEMA).parquet(state_dir)
            batch = batch.join(seen, "content_hash", "left_anti")
        from nyc_open_data_pipeline_spark.streaming.windows import record_stream_plan

        try:
            record_stream_plan(
                f"incremental_dedup#batch{batch_id}",
                batch._jdf.queryExecution().executedPlan().toString(),
            )
        except Exception:
            pass
        survivors = batch.select("doc_id", "content_hash").localCheckpoint(eager=True)
        survivors.write.mode("append").parquet(out_dir)
        survivors.select("content_hash").write.mode("append").parquet(state_dir)
        tmp = f"{marker}.tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, marker)

    return process


def run_incremental_dedup(
    spark: SparkSession, stream: DataFrame, out_dir: str, state_dir: str
) -> None:
    """Drain all currently-available input through the dedup sink."""
    q = (
        stream.writeStream.foreachBatch(incremental_dedup_sink(spark, out_dir, state_dir))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, "incremental_dedup")




BAND_SCHEMA = "band int, band_key string"


def incremental_neardup_sink(spark: SparkSession, out_dir: str, state_dir: str):
    """foreachBatch function for continuous NEAR-dup filtering: the
    MinHash-LSH analogue of ``incremental_dedup_sink``. State is the
    distinct (band, band_key) set of EVERY document processed so far —
    narrow (two small columns), mergeable, bucketable by band_key.

    Semantics (deterministic, set-at-once computable, stream==batch): a
    document is accepted iff every one of its band keys is FIRST seen by
    itself — i.e. no document with a smaller doc_id (ingested earlier;
    the replay is doc_id-ordered) shares any LSH band with it. This is
    the conservative crawl-scale near-dup gate (drop on band collision,
    no exact verify — the verified variant is the batch d4 path), and
    "seen" deliberately includes keys of REJECTED documents: acceptance
    then has no sequential chain dependence inside a batch, so a
    micro-batch is one join, not an iteration. Within a batch the rule
    is doc_id == MIN(doc_id) per key; across batches it is an anti-join
    against the state table. Documents too short to shingle have no band
    keys and are excluded (they are not near-dup candidates of anything;
    the line-level d15 path owns short text).

    Idempotence under checkpoint replay: same marker protocol as the
    exact-hash sink."""
    os.makedirs(state_dir, exist_ok=True)
    marker = os.path.join(state_dir, "_last_batch")

    def last_committed() -> int:
        try:
            with open(marker) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -1

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed():
            return
        sess = batch_df.sparkSession
        from nyc_open_data_pipeline_spark.operators.dedup import band_keys

        bk = (
            band_keys(batch_df)
            .filter(F.length("band_key") > 0)
            .withColumnRenamed("id", "doc_id")
        )
        firsts = bk.groupBy("band", "band_key").agg(
            F.min("doc_id").alias("first_id")
        )
        hit_within = (
            bk.join(firsts, ["band", "band_key"])
            .filter(F.col("first_id") < F.col("doc_id"))
            .select("doc_id")
        )
        state_files = [
            f for f in os.listdir(state_dir) if f.endswith(".parquet")
        ]
        if state_files:
            seen = sess.read.schema(BAND_SCHEMA).parquet(state_dir)
            hit_state = bk.join(seen, ["band", "band_key"], "left_semi").select(
                "doc_id"
            )
            dropped = hit_within.unionByName(hit_state)
        else:
            dropped = hit_within
        survivors = (
            bk.select("doc_id")
            .distinct()
            .join(dropped, "doc_id", "left_anti")
        )
        from nyc_open_data_pipeline_spark.streaming.windows import record_stream_plan

        try:
            record_stream_plan(
                f"incremental_neardup#batch{batch_id}",
                survivors._jdf.queryExecution().executedPlan().toString(),
            )
        except Exception:
            pass
        new_keys = bk.select("band", "band_key").distinct()
        out = survivors.localCheckpoint(eager=True)
        keys = new_keys.localCheckpoint(eager=True)
        out.write.mode("append").parquet(out_dir)
        keys.write.mode("append").parquet(state_dir)
        tmp = f"{marker}.tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, marker)

    return process


def run_incremental_neardup(
    spark: SparkSession, stream: DataFrame, out_dir: str, state_dir: str
) -> None:
    """Drain all currently-available input through the near-dup sink."""
    q = (
        stream.writeStream.foreachBatch(
            incremental_neardup_sink(spark, out_dir, state_dir)
        )
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, "incremental_neardup")


def deduped_events(stream: DataFrame, delay: str = "3650 days") -> DataFrame:
    """Native streaming dedup: ``dropDuplicatesWithinWatermark`` on the
    event id — the built-in operator for collapsing at-least-once delivery
    (retries, replays) to exactly-once rows, complementing the foreachBatch
    corpus-hash flow above. State holds one entry per id seen inside the
    watermark delay and is evicted as event time advances past it — the
    delay is the REPLAY BOUND, sized to the source's max redelivery lag
    (generous here so the whole test corpus stays in one dedup horizon;
    at scale: minutes-to-hours, keeping state at |ids per horizon|, not
    |corpus|)."""
    return stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark(["event_id"])
