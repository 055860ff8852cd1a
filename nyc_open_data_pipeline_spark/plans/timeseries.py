"""Time-series operators over the ``events`` table: resample with gap
filling, forward fill, rolling-frame statistics.

The reference stores period-stamped observations (reference
``src/storage/schemas.py`` year-indexed tables) but has no resampling or
imputation surface; these queries add the standard time-series toolkit a
warehouse engine ships — dense calendar grids for sparse data, last-
observation-carried-forward, and bounded rolling frames — expressed so the
expensive pass over the facts happens exactly once and everything derived
(grids, spans) is computed from the already-aggregated output.

Scale notes (100 TB): the gap-fill grid is |series| x |buckets| rows —
derived from the AGGREGATED frame, never the raw facts — and the rolling /
fill windows partition on the series key, so state per task is one
partition's frame buffer (bounded by ``rowsBetween``), not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.plans.common import dec, dsum, sql_dsum, t
from nyc_open_data_pipeline_spark.plans.registry import register


@register(
    "ts1_resample_gapfill",
    oracle=f"""
    WITH agg AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n_events,
             {sql_dsum("value", "total_value")}
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
      FROM agg GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM spans
    )
    SELECT g.event_type, g.bucket,
           COALESCE(a.n_events, 0) AS n_events,
           COALESCE(a.total_value, 0.0) AS total_value
    FROM grid g LEFT JOIN agg a USING (event_type, bucket)
    """,
    survey_ref="extension: resample to a dense hourly grid with zero-filled "
    "gaps (pandas .resample().sum() equivalent) — the dense-calendar input "
    "every downstream charting/forecasting step assumes.",
)
def ts1_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample: one hash-aggregate pass over the facts, then
    the calendar grid is generated per series FROM THE AGGREGATE (min/max
    bucket -> ``sequence`` -> ``explode``) and left-joined back. The raw
    facts are read once; grid and spans are |series| x |hours| rows, so at
    100 TB the only full-data cost is the initial map-side-combined
    aggregation, and the gap-fill join is broadcast-sized."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("bucket"), "value"
    )
    agg = ev.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n_events"), dsum("value", "total_value")
    )
    # Truncate the lineage so BOTH consumers (spans and the gap-fill join)
    # read the materialized aggregate instead of re-deriving from the scan:
    # without this, Catalyst collapses the spans aggregate straight onto the
    # parquet scan — a second full pass over the facts. The checkpoint holds
    # |series| x |active hours| rows, negligible at any scale.
    agg = agg.localCheckpoint(eager=False)
    spans = agg.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket"),
    )
    return grid.join(agg, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )


@register(
    "ts2_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
    survey_ref="extension: forward fill (last observation carried forward) — "
    "pandas .ffill() equivalent, the standard sparse-metric imputation.",
)
def ts2_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF: the sparse metric (value only on purchase events) carried
    forward along each user's timeline via ``last(..., ignorenulls=True)``
    over a running frame. One exchange on user_id; per-task state is a
    single scalar per open partition (the frame is computed streamingly),
    so the operator is memory-flat regardless of series length. Values
    pass through untouched — bit-identical, no float tolerance needed."""
    from nyc_open_data_pipeline_spark.operators.temporal import forward_fill

    ev = t(spark, sf_dir, "events")
    metric = F.when(F.col("event_type") == "purchase", F.col("value"))
    return forward_fill(
        ev, "user_id", ["ts", "event_id"], metric, "last_purchase_value"
    ).select("event_id", "user_id", "last_purchase_value")


@register(
    "w7_rolling_stats",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,4)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS roll_sum7,
           max(value)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS roll_max7
    FROM events
    """,
    survey_ref="§2.7 window surface: bounded rolling frame (7-row sum/max "
    "per series) — the moving-average family w2's unbounded running sum "
    "does not cover.",
)
def w7_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded rolling frame: 7-row trailing sum and max per user. The sum
    goes through DECIMAL so both engines accumulate exactly (order- and
    engine-independent), then back to double. Bounded ``rowsBetween``
    frames evaluate with an O(frame) ring buffer per task — no whole-
    partition materialization, safe for arbitrarily long series."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("roll_sum7"),
        F.max("value").over(w).alias("roll_max7"),
    )


@register(
    "ts3_rollup_cascade",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(28,4))) AS v
      FROM events GROUP BY 1
    )
    SELECT date_trunc('day', h) AS day,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS total_value,
           CAST(COUNT(*) AS BIGINT) AS n_hours
    FROM hourly GROUP BY 1
    """,
    survey_ref="extension: hierarchical rollup cascade (the hypertable "
    "continuous-aggregate pattern, cf. TimescaleDB): the daily level is "
    "re-aggregated from the HOURLY partials, never from the facts — COUNT "
    "sums exactly and the value sum stays in DECIMAL through both levels, "
    "so the cascade is bit-equal to a direct daily aggregation.",
)
def ts3_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour -> day rollup where the day level consumes hourly partials.
    At 100 TB the fact scan happens once (the hourly materialization);
    every coarser resolution is O(|finer buckets|) — the reason warehouse
    rollup chains exist. Both aggregation levels are decimal-exact, so
    cascade == direct-aggregation exactly, which the oracle (same cascade
    in SQL) and the e1-family direct hourly queries jointly pin."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count("*").alias("n"), F.sum(dec("value")).alias("v")
    )
    return hourly.groupBy(F.date_trunc("day", F.col("h")).alias("day")).agg(
        F.sum("n").cast("long").alias("n_events"),
        F.sum("v").cast("double").alias("total_value"),
        F.count("*").cast("long").alias("n_hours"),
    )
