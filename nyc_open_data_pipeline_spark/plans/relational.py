"""Relational operator surface (SURVEY.md §2.3-§2.10) as declared queries.

Every query here re-expresses a reference operator over the driver's
synthetic corpus, Spark-first, with a DuckDB oracle. The survey_ref column
cites the §2 inventory row; docstrings cite the reference file:line the
semantics come from.

Scale notes are attached per query: all aggregations are partial-agg
(map-side combine) friendly, joins annotate broadcast choices, and no query
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.plans.common import (
    davg,
    dec,
    dsum,
    sql_davg,
    sql_dsum,
    t,
)
from nyc_open_data_pipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — the widest agg fan the corpus
# supports. Exercises filter pushdown, partial aggregation, decimal-exact
# sums. At 100 TB: single shuffle on 2 low-cardinality keys; map-side combine
# collapses 600 M rows/executor to <10 partials.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum("CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))", "sum_disc_price", 38, 8)},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="§2.6 A1/A4 + §2.3 P10 (agg spine; reference routes.py:23-46 agg shape)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice", 18, 4) * (F.lit(1) - dec("l_discount", 18, 4))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 Projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "p1_drop_columns",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    """,
    survey_ref="§2.3 P1/P2 (reference food_supply_gap/transformer.py:28-30 metadata strip)",
)
def p1_drop_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning: Catalyst pushes the 5-column projection into the scan
    (ReadSchema shows only these columns — the 100 TB win over SELECT *)."""
    li = t(spark, sf_dir, "lineitem")
    drop = [c for c in li.columns if c not in
            ("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")]
    return li.drop(*drop)


@register(
    "p3_rename_columns",
    oracle="""
    SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
           s_nationkey AS nation_id, s_acctbal AS account_balance
    FROM supplier
    """,
    survey_ref="§2.3 P3/P4/P5 (reference ntas_2020/transformer.py:31-46 static rename map)",
)
def p3_rename_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    mapping = {
        "s_suppkey": "supplier_id",
        "s_name": "supplier_name",
        "s_nationkey": "nation_id",
        "s_acctbal": "account_balance",
    }
    return t(spark, sf_dir, "supplier").withColumnsRenamed(mapping)


@register(
    "p6_isin_filter",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    """,
    survey_ref="§2.3 P6 (reference zillow_zori/transformer.py:9-10 NYC-ZIP isin)",
)
def p6_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-list semi-filter. Small literal list stays an in-scan IN predicate
    (pushed to parquet); a large list would become a broadcast semi-join."""
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "p7_range_invalid_to_null",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity BETWEEN 5 AND 45 THEN l_quantity END AS quantity_clean
    FROM lineitem
    """,
    survey_ref="§2.3 P7 + §2.15 V4 (reference food_supply_gap/transformer.py:63-68 range nulling)",
)
def p7_range_invalid_to_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity").between(5, 45), F.col("l_quantity")).alias("quantity_clean"),
    )


@register(
    "p8_sentinel_to_null",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN value > 300 THEN NULL ELSE value END AS value_clean
    FROM events
    """,
    survey_ref="§2.3 P8 (reference census_acs/transformer.py:26-33 sentinel nulling)",
)
def p8_sentinel_to_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.col("value") > 300, F.lit(None)).otherwise(F.col("value")).alias("value_clean"),
    )


@register(
    "p9_drop_null_rows",
    oracle="""
    SELECT event_id, user_id, value AS value_clean FROM events
    WHERE value <= 300
    """,
    survey_ref="§2.3 P9/P10 (reference zillow_zori/transformer.py:23 dropna)",
)
def p9_drop_null_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel-null then dropna — the reference's clean-then-filter idiom."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.when(F.col("value") > 300, F.lit(None)).otherwise(F.col("value")).alias("value_clean"),
    )
    return ev.na.drop(subset=["value_clean"])


@register(
    "p11_equality_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    survey_ref="§2.3 P11 + §2.1 S2 (reference nyc_open_data_fetcher.py:64-77 SoQL equality pushdown)",
)
def p11_equality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# §2.4 Type conversion / scalar expressions
# ---------------------------------------------------------------------------


@register(
    "t1_coercing_cast",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(substr(p_brand, 7, 10) AS INTEGER) AS brand_num,
           TRY_CAST(p_type AS DOUBLE) AS type_as_num
    FROM part
    """,
    survey_ref="§2.4 T1 (reference food_supply_gap/transformer.py:49 pd.to_numeric errors='coerce')",
)
def t1_coercing_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-off cast: invalid -> NULL, exactly pandas to_numeric(coerce)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_brand", 7, 10).cast("int").alias("brand_num"),
        F.col("p_type").cast("double").alias("type_as_num"),
    )


@register(
    "t2_string_cast_trim",
    oracle="""
    SELECT c_custkey, trim(CAST(c_custkey AS VARCHAR)) AS custkey_str,
           trim(c_name) AS name_trimmed
    FROM customer
    """,
    survey_ref="§2.4 T2 / §2.12 F2 (reference food_supply_gap/transformer.py:50 astype(str).str.strip)",
)
def t2_string_cast_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.trim(F.col("c_custkey").cast("string")).alias("custkey_str"),
        F.trim(F.col("c_name")).alias("name_trimmed"),
    )


@register(
    "t3_datetime_parse",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS TIMESTAMP) AS order_day
    FROM orders
    """,
    survey_ref="§2.4 T3 (reference zillow_zori/transformer.py:20 pd.to_datetime on YYYY-MM-DD)",
)
def t3_datetime_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: format to 'YYYY-MM-DD' string (the Zillow column-name shape)
    then parse back — exercising to_date on string input."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd"), "yyyy-MM-dd")
        .cast("timestamp")
        .alias("order_day"),
    )


@register(
    "t5_derived_ratio",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_discount / (1 + l_tax) * 100 AS effective_discount_pct
    FROM lineitem
    """,
    survey_ref="§2.4 T5/T9 (reference census_acs/transformer.py:36-38 poverty_rate ratio)",
)
def t5_derived_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_discount") / (F.lit(1) + F.col("l_tax")) * 100).alias("effective_discount_pct"),
    )


@register(
    "t6_literal_metadata",
    oracle="""
    SELECT n_nationkey, n_name, 'nation' AS dataset_id,
           TIMESTAMP '2026-01-01 00:00:00' AS ingestion_ts
    FROM nation
    """,
    survey_ref="§2.4 T6 (reference datasets/base.py:58-71 add_metadata; fixed ts for determinism)",
)
def t6_literal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        "n_name",
        F.lit("nation").alias("dataset_id"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ingestion_ts"),
    )


@register(
    "t7_year_extract",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
    survey_ref="§2.4 T7 (reference routes.py:121 EXTRACT(YEAR FROM r.date))",
)
def t7_year_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.select(F.year("o_orderdate").cast("long").alias("order_year"))
        .groupBy("order_year")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "t8_format_number",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS rev,
             SUM(CAST(l_quantity AS DECIMAL(28,4))) AS qty
      FROM lineitem GROUP BY l_returnflag
    ), r AS (
      -- DuckDB truncates on decimal downscale; Spark rounds HALF_UP.
      -- +half-ulp before the truncating cast = HALF_UP for positive values.
      SELECT l_returnflag,
             CAST(rev + CAST(0.005 AS DECIMAL(28,4)) AS DECIMAL(38,2)) AS rev2,
             CAST(qty + CAST(0.05 AS DECIMAL(28,4)) AS DECIMAL(38,1)) AS qty1
      FROM s
    )
    SELECT l_returnflag,
           format('{:,}', CAST(trunc(rev2) AS BIGINT)) || '.' ||
             lpad(CAST(CAST((rev2 - trunc(rev2)) * 100 AS BIGINT) AS VARCHAR), 2, '0')
             AS revenue_fmt,
           format('{:,}', CAST(trunc(qty1) AS BIGINT)) || '.' ||
             CAST(CAST((qty1 - trunc(qty1)) * 10 AS BIGINT) AS VARCHAR)
             AS quantity_fmt
    FROM r
    """,
    survey_ref="§2.4 T8 (reference viz/src/components/Dashboard.jsx:37-43 "
    "Intl.NumberFormat thousands-separator + toFixed(1), moved engine-side "
    "as a formatted derived view)",
)
def t8_format_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presentation formatting as a derived view: thousands-separated revenue
    (2 dp) and quantity (1 dp), the engine-side analog of the reference
    dashboard's Intl.NumberFormat / toFixed(1). Values are carried as exact
    DECIMAL through the aggregation so formatting never rounds — both engines
    format the identical exact number (tie-rounding modes can't diverge).
    Pure post-aggregation row expressions; adds nothing to the shuffle."""
    li = t(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("rev"),
        F.sum(dec("l_quantity")).alias("qty"),
    )
    return s.select(
        "l_returnflag",
        F.format_number(F.col("rev").cast("decimal(38,2)"), 2).alias("revenue_fmt"),
        F.format_number(F.col("qty").cast("decimal(38,1)"), 1).alias("quantity_fmt"),
    )


@register(
    "t9_derived_burden",
    oracle="""
    SELECT c_custkey,
           round(c_acctbal * 12, 2) AS annual_amount,
           CASE WHEN c_acctbal > 0
                THEN round(c_acctbal * 12 / (c_acctbal * 52) * 100, 2)
           END AS burden_pct
    FROM customer
    """,
    survey_ref="§2.4 T9 (reference Dashboard.jsx:32-35 rent-burden derived metric, "
    "moved engine-side as a derived view)",
)
def t9_derived_burden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference computes annual_rent = rent*12 and burden =
    annual/income*100 client-side; the engine exposes the same arithmetic as
    a derived view (pure row-level exprs — codegen'd, no shuffle). acctbal
    stands in for the rent/income columns of the reference's tables."""
    c = t(spark, sf_dir, "customer")
    annual = F.round(F.col("c_acctbal") * 12, 2)
    burden = F.when(
        F.col("c_acctbal") > 0,
        F.round(F.col("c_acctbal") * 12 / (F.col("c_acctbal") * 52) * 100, 2),
    )
    return c.select(
        "c_custkey", annual.alias("annual_amount"), burden.alias("burden_pct")
    )


# ---------------------------------------------------------------------------
# §2.5 Joins
# ---------------------------------------------------------------------------


@register(
    "j1_left_join_dim",
    oracle=f"""
    SELECT n.n_nationkey, n.n_name,
           COUNT(c.c_custkey) AS n_customers,
           {sql_dsum("c.c_acctbal", "total_acctbal")}
    FROM nation n LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_nationkey, n.n_name
    """,
    survey_ref="§2.5 J1 (reference routes.py:43-45 NTA left-join food gaps)",
)
def j1_left_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT join dim->fact. nation (25 rows) is broadcast — at 100 TB the
    fact side never shuffles for this join."""
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    return (
        F.broadcast(n)
        .join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
        )
    )


@register(
    "j2_inner_join_broadcast",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum("o.o_totalprice", "segment_revenue")}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    survey_ref="§2.5 J2/J3 (reference routes.py:82-84 ZCTA inner-join ACS)",
)
def j2_inner_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "segment_revenue"))
    )


@register(
    "j4_scalar_subquery_latest",
    oracle=f"""
    SELECT CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS ship_month,
           COUNT(*) AS n_items,
           {sql_dsum("l_quantity", "month_qty")}
    FROM lineitem
    WHERE EXTRACT(YEAR FROM l_shipdate) =
          (SELECT MAX(EXTRACT(YEAR FROM l_shipdate)) FROM lineitem)
    GROUP BY 1
    """,
    survey_ref="§2.5 J4 + §2.6 A1 (reference routes.py:45 year = (SELECT MAX(year)...))",
)
def j4_scalar_subquery_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-snapshot selection via scalar subquery, as Spark SQL so Catalyst
    plans the subquery (broadcast of a 1-row relation, not a driver collect)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS month_qty
        FROM lineitem
        WHERE year(l_shipdate) = (SELECT MAX(year(l_shipdate)) FROM lineitem)
        GROUP BY 1
        """
    )


@register(
    "j5_point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey = 42
    """,
    survey_ref="§2.5 J5 (reference App.jsx:116-117 client point lookup)",
)
def j5_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").filter(F.col("c_custkey") == 42)


@register(
    "j6_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    survey_ref="§2.5 (engine surface: left_semi; reference has only implicit semi via isin P6)",
)
def j6_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "j7_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    survey_ref="§2.5 (engine surface: left_anti — also the K3 upsert building block)",
)
def j7_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "j8_salted_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_quantity', 'total_qty')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    survey_ref="§2.5 + 100TB scale path: hybrid hot-key-salted equi-join "
    "(operators/skew.py; result identical to the plain join — the oracle IS the plain join)",
)
def j8_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe fact-to-dim join, hybrid form: keys owning >1% of the
    fact side are salted (sharded 8 ways, dim replicated per shard), the
    cold majority takes the plain join, results union. TPC-H orderkeys are
    uniform, so here the hot set is empty and the plan IS the plain join —
    the salting machinery only engages (and only pays) when skew exists
    (adversarial-skew test: tests/test_ops.py). The oracle runs the PLAIN
    join — salting changes placement, never results."""
    from nyc_open_data_pipeline_spark.operators.skew import hybrid_salted_join

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = hybrid_salted_join(
        li.withColumnRenamed("l_orderkey", "okey"),
        o.withColumnRenamed("o_orderkey", "okey"),
        on=["okey"],
        how="inner",
        salt=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"), dsum("l_quantity", "total_qty")
    )


# ---------------------------------------------------------------------------
# §2.6 Aggregations
# ---------------------------------------------------------------------------


@register(
    "a1_max_scalar",
    oracle="SELECT MAX(o_orderdate) AS max_orderdate, MIN(o_orderdate) AS min_orderdate FROM orders",
    survey_ref="§2.6 A1 (reference routes.py:45 SELECT MAX(year))",
)
def a1_max_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.max("o_orderdate").alias("max_orderdate"),
        F.min("o_orderdate").alias("min_orderdate"),
    )


@register(
    "a2_latest_per_key",
    oracle="""
    SELECT user_id, event_id AS latest_event_id, value AS latest_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    survey_ref="§2.6 A2 + §2.7 + §2.8 O2 (reference zillow_zori/transformer.py:26-29 latest rent per ZIP)",
)
def a2_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key: single shuffle on the key; at scale prefer this
    window form (or max_by) over sort-then-dropDuplicates, which is
    nondeterministic in a distributed engine."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("value").alias("latest_value"),
        )
    )


@register(
    "a3_collect_sorted_list",
    oracle="""
    SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS customer_names,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
    survey_ref="§2.6 A3 (reference routes.py:24-42 json_agg nested-doc aggregation, determinized)",
)
def a3_collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is unordered in a distributed engine; sort_array makes the
    nested-doc aggregation deterministic (the GeoJSON builder in
    functions/json_doc.py uses the same pattern)."""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("customer_names"),
        F.count("*").alias("n_customers"),
    )


@register(
    "a4_conditional_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_discount,
           CAST(SUM(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_qty,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="§2.6 A4 + §2.15 V2 (reference parser.py:92-105 range-violation counting)",
)
def a4_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_high_discount"),
        F.sum(F.when(F.col("l_quantity") < 10, 1).otherwise(0)).alias("n_small_qty"),
        F.count("*").alias("n_rows"),
    )


@register(
    "a5_summary_stats",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(c_acctbal) AS n,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           {sql_davg("c_acctbal", "mean_bal")},
           sqrt(greatest(
             (CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(28,8))) AS DOUBLE)
              - CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
                * CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) / COUNT(c_acctbal))
             / (COUNT(c_acctbal) - 1), 0)) AS std_bal
    FROM customer GROUP BY c_mktsegment
    """,
    survey_ref="§2.6 A5 (reference ingest_data.py:114 df.describe dry-run stats)",
)
def a5_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-style stats with order-independent variance: exact decimal
    sums of x and x^2, combined in double — deterministic under any
    partitioning (naive stddev_samp over doubles is not)."""
    c = t(spark, sf_dir, "customer")
    n = F.count("c_acctbal")
    s = F.sum(dec("c_acctbal", 28, 4)).cast("double")
    sq = F.sum(dec(F.col("c_acctbal") * F.col("c_acctbal"), 28, 8)).cast("double")
    var = (sq - s * s / n) / (n - F.lit(1))
    return c.groupBy("c_mktsegment").agg(
        n.alias("n"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        (s / n).alias("mean_bal"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("std_bal"),
    )


@register(
    "a6_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="§2.6 (engine surface: distinct aggregates; SURVEY notes reference lacks them)",
)
def a6_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "a7_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey_ref="§2.6 (engine surface: grouping sets/rollup; free in Spark per SURVEY §2.6)",
)
def a7_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count("*").alias("n_rows")
    )


@register(
    "a9_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="§2.6 A5 (exact percentiles; a5 covers summary quartiles — at 100 TB "
    "use approx_percentile, bounded memory)",
)
def a9_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (linear interpolation, identical
    definition in both engines). Exact percentile buffers per group — fine
    for bounded groups; the scale path is approx_percentile (t-digest)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95"),
    )


@register(
    "t10_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
    survey_ref="§2.4 T3/T7 (date arithmetic surface: add/diff/trunc/last_day)",
)
def t10_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dates returned as midnight timestamps: pandas (the comparison medium)
    # widens DATE to Timestamp anyway — emit the same type on both sides
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 90).cast("timestamp").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_95"),
        F.trunc(d, "month").cast("timestamp").alias("order_month"),
        F.last_day(d).cast("timestamp").alias("month_end"),
    )


@register(
    "a8_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    survey_ref="§2.6 (engine surface: cube — all grouping-set combinations)",
)
def a8_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE = one pass, Expand emits 2^k grouping rows map-side, then a
    single hash aggregate — no per-grouping rescans at 100 TB."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count("*").alias("n_rows")
    )


# ---------------------------------------------------------------------------
# §2.7 Window functions
# ---------------------------------------------------------------------------


@register(
    "w1_ranking",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
           CAST(rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS drnk
    FROM customer
    """,
    survey_ref="§2.7 (window surface; reference's only window idiom is A2, rank is a source column)",
)
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "w2_running_sum",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(28,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events
    """,
    survey_ref="§2.7 (running aggregate; decimal-exact so partition order can't flip the hash)",
)
def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value", 28, 4)).over(w).cast("double").alias("running_value"),
    )


@register(
    "w3_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
    survey_ref="§2.7 (analytic functions surface)",
)
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "w5_ntile_percent_rank",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    survey_ref="§2.7 (distribution-rank analytics: ntile / percent_rank / cume_dist)",
)
def w5_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks over a global ordering, serial window form — kept
    as the readable reference implementation and w6's cross-check; the
    production path is w6_distributed_ranks (two-pass range-partitioned,
    no single-partition stage)."""
    c = t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "w6_distributed_ranks",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    survey_ref="§2.7 production path for w5 (two-pass range-partitioned "
    "distribution ranks — no single-partition global sort; the serial window "
    "IS the oracle, proving the distributed plan byte-equal)",
)
def w6_distributed_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe ntile/percent_rank/cume_dist: range-partition on the order
    key, per-partition sort + local row_number, driver-side prefix-sum of
    partition counts as offsets (operators/ranks.py). Output is identical to
    w5's serial window (the oracle) for this total ordering, but the plan
    contains no Exchange SinglePartition — each of the P range slices sorts
    in its own task, which is what survives 100 TB."""
    from nyc_open_data_pipeline_spark.operators.ranks import distribution_ranks

    c = t(spark, sf_dir, "customer")
    return distribution_ranks(c, ["c_acctbal", "c_custkey"], k=4).select(
        "c_custkey", "quartile", "pct_rank", "cume"
    )


@register(
    "w4_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(28,4)))
                  OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS value_30m
    FROM events
    """,
    survey_ref="§2.7 (range-frame analytic window — trailing 30-minute per-user sum)",
)
def w4_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time: trailing 30-minute sum per user. Ordered
    on epoch MICROS in both engines so the frame boundary is bit-identical;
    decimal-sum keeps the trailing sum order-independent."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-1_800_000_000, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value", 28, 4)).over(w).cast("double").alias("value_30m"),
    )


# ---------------------------------------------------------------------------
# §2.8 Sorts / limits / distinct / dedup
# ---------------------------------------------------------------------------


@register(
    "o3_dedup_keep_last",
    oracle="""
    SELECT user_id, event_type, event_id, value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
    survey_ref="§2.8 O3 (reference food_supply_gap/transformer.py:75 drop_duplicates keep='last')",
)
def o3_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keep='last' dedup. Spark's dropDuplicates keeps an ARBITRARY row, so
    the arrival order (here ts, event_id) must be threaded explicitly —
    SURVEY §7.4 hard-part #1."""
    from nyc_open_data_pipeline_spark.operators.dedup import dedup_keep_last

    ev = t(spark, sf_dir, "events")
    return dedup_keep_last(ev, keys=["user_id", "event_type"], order_by=["ts", "event_id"]).select(
        "user_id", "event_type", "event_id", "value"
    )


@register(
    "o1_multi_key_sort",
    oracle="""
    WITH s AS (
      SELECT event_id, event_type,
             CASE WHEN value < 10 THEN NULL ELSE value END AS big_value
      FROM events
    )
    SELECT event_id, event_type, big_value
    FROM s
    ORDER BY event_type ASC, big_value ASC NULLS LAST, event_id ASC
    LIMIT 100
    """,
    survey_ref="§2.8 O1 (reference food_supply_gap/transformer.py:81 "
    "sort_values(['year','rank'], na_position='last'))",
)
def o1_multi_key_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with pandas na_position='last' semantics
    (asc_nulls_last — Spark's plain asc already sorts NULLs first, so the
    modifier is load-bearing). A derived nullable column exercises the NULL
    placement; LIMIT makes the cutoff value-verifiable."""
    ev = t(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("value") < 10, F.lit(None)).otherwise(F.col("value")).alias("big_value"),
    )
    return s.orderBy(
        F.col("event_type").asc(),
        F.col("big_value").asc_nulls_last(),
        F.col("event_id").asc(),
    ).limit(100)


@register(
    "o4_limit_preview",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10
    """,
    survey_ref="§2.8 O4 (reference ingest_data.py:112 head(10) dry-run preview)",
)
def o4_limit_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(10)
    )


@register(
    "o5_top_k",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    survey_ref="§2.8 O5 (reference README.md:331-339 ORDER BY supply_gap DESC LIMIT 10)",
)
def o5_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heaps, no full
    sort, no full shuffle. Tie-broken on the unique key for determinism."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "o6_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    survey_ref="§2.8 (distinct surface)",
)
def o6_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# §2.9 Set operations
# ---------------------------------------------------------------------------


@register(
    "u1_union_chunks",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'FURNITURE'
    """,
    survey_ref="§2.9 U1 (reference census_fetcher.py:114 pd.concat of IN-list chunks)",
)
def u1_union_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    a = c.filter(F.col("c_mktsegment") == "BUILDING")
    b = c.filter(F.col("c_mktsegment") == "FURNITURE")
    return a.unionByName(b)


@register(
    "u3_intersect_except",
    oracle="""
    SELECT n_nationkey, 'both' AS side FROM (
      SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT n_nationkey, 'customer_only' AS side FROM (
      SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey FROM supplier
    )
    """,
    survey_ref="§2.9 (intersect/except surface; SURVEY notes Spark provides natively)",
)
def u3_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey")).distinct()
    supp = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey")).distinct()
    both = cust.intersect(supp).withColumn("side", F.lit("both"))
    only = cust.exceptAll(supp).withColumn("side", F.lit("customer_only"))
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# §2.10 Reshaping
# ---------------------------------------------------------------------------


@register(
    "r1_melt_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS metric_value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    """,
    survey_ref="§2.10 R1 (reference zillow_zori/transformer.py:12-17 wide->long melt)",
)
def r1_melt_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native unpivot — one narrow scan, no shuffle; row count fans out 3x
    but stays pipelined inside the stage."""
    li = t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )


@register(
    "r2_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS qty_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="§2.10 (pivot surface; SURVEY notes groupBy().pivot() available)",
)
def r2_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity", 28, 4)).cast("double"))
    )
    return pivoted.withColumnsRenamed({"O": "qty_open", "F": "qty_filled"})


@register(
    "a10_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    survey_ref="§2.6 (engine surface: explicit GROUPING SETS — the general "
    "form a7's rollup and a8's cube specialize; one pass, no self-union)",
)
def a10_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets ((flag), (status), ()): Spark's SQL front door
    plans one Expand + single aggregate — the same shape as rollup/cube, vs
    the naive 3-scan UNION ALL a user would hand-write. At 100 TB that is
    one shuffle of |groups| x 3 partial rows instead of three full scans."""
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__a10_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_rows
        FROM __a10_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# §2.5 deep join pipelines (TPC-H Q3/Q5 shapes) — the multi-join plans the
# reference composes client-side (App.jsx chains fetches; routes.py joins two
# tables at a time). Here the whole pipeline is ONE Catalyst plan so join
# reordering, broadcast selection and filter pushdown act across all tables.
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum("CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))", "revenue", 38, 8)},
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    survey_ref="§2.5 J1-J3 + §2.8 O5 composed (TPC-H Q3 shape; the reference "
    "chains this as two client fetches + a js sort, App.jsx:96-120)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority top-10: filtered customer segment joined through
    orders into lineitem, revenue per order, top 10. Scale shape: the
    segment-filtered customer projection (2 cols, ~1/5 of customers) is
    broadcast; orders carries its date filter INTO the scan (PushedFilters);
    the only shuffle is the final groupBy on l_orderkey, and the top-10 is a
    TakeOrderedAndProject (per-partition heap, k rows to the driver), never a
    global sort. Ties broken by l_orderkey for a deterministic hash."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    )
    revenue = dec("l_extendedprice", 18, 4) * (F.lit(1) - dec("l_discount", 18, 4))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum("CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))", "revenue", 38, 8)}
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    survey_ref="§2.5 J1-J3 six-way join (TPC-H Q5 shape; widest join pipeline "
    "the corpus supports — region>nation>customer>orders>lineitem>supplier "
    "with the local-supplier correlation s_nationkey = c_nationkey)",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier revenue by nation: a six-table join with a correlated
    equality (supplier and customer in the SAME nation). Scale shape: region,
    nation and supplier are broadcast (region/nation are tiny; supplier is
    the smallest fact-side dim); customer x orders and orders x lineitem are
    the two shuffle joins, both on their natural keys, so AQE can reuse the
    o_orderkey exchange. The s_nationkey = c_nationkey correlation rides the
    broadcast join for free instead of forcing an extra shuffle."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    revenue = dec("l_extendedprice", 18, 4) * (F.lit(1) - dec("l_discount", 18, 4))
    asian_nations = F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(asian_nations, c.c_nationkey == asian_nations.n_nationkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT (100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE))
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
           AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
    """,
    survey_ref="§2.5 J2 + §2.6 A4 composed (TPC-H Q14 shape: fact x product "
    "dim with a conditional-revenue ratio — the promo-share rollup; brings "
    "the part table into the join surface)",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share for one ship month. Scale shape: the date
    window prunes the lineitem scan (PushedFilters), part joins broadcast
    (2-column projection; at TPC-H SF100k part is ~20 GB raw so past the
    broadcast ceiling it becomes a bucketed-by-partkey sort-merge join —
    see SCALE.md storage layout); the conditional sum folds into the same
    partial aggregate as the total, so the ratio costs one scan + one
    1-row exchange. Decimal-exact sums, double division at the end."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = dec("l_extendedprice", 18, 4) * (F.lit(1) - dec("l_discount", 18, 4))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "a11_histogram",
    oracle="""
    SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin,
           COUNT(*) AS n_rows,
           MIN(l_extendedprice) AS bin_min,
           MAX(l_extendedprice) AS bin_max
    FROM lineitem
    GROUP BY 1
    """,
    survey_ref="§2.6 A5 (profiling surface: fixed-width histogram — the "
    "distribution scan run before choosing partition/skew strategies; "
    "one pass, |bins| output rows)",
)
def a11_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of lineitem prices: floor-divide to a bin key,
    count + extent per bin. Scale shape: scan-speed map-side combine into
    ~|bins| partials; the exchange carries bins, not rows. The profiling
    primitive behind SCALE.md's 'measure skew before salting' rule."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.floor(F.col("l_extendedprice") / F.lit(5000.0)).cast("long").alias("bin"),
            "l_extendedprice",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_extendedprice").alias("bin_min"),
            F.max("l_extendedprice").alias("bin_max"),
        )
    )


@register(
    "a12_iqr_outliers",
    oracle="""
    WITH q AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders GROUP BY 1
    ), f AS (
      SELECT o_orderpriority,
             floor((q3 + 1.5 * (q3 - q1)) * 1e6 + 0.5) / 1e6 AS hi,
             floor((q1 - 1.5 * (q3 - q1)) * 1e6 + 0.5) / 1e6 AS lo
      FROM q
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (
             WHERE o.o_totalprice > f.hi OR o.o_totalprice < f.lo
           ) AS BIGINT) AS n_outliers,
           f.hi AS hi_fence
    FROM orders o JOIN f USING (o_orderpriority)
    GROUP BY 1, f.hi, f.lo
    """,
    survey_ref="§2.6 A5 / §2.15 V2 (profiling surface: Tukey IQR outlier "
    "detection per group — the data-quality fence behind V2's range checks, "
    "derived from the data instead of hand-set bounds)",
)
def a12_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey fences per priority class: exact continuous quartiles (same
    interpolation in both engines) computed in one grouped pass, broadcast
    back onto the facts, outliers counted per group. Two passes over the
    facts but the join side is |groups| rows — broadcast, no fact shuffle
    beyond the two group-by exchanges on the same key (reused). At 100 TB
    swap ``percentile`` for ``approx_percentile`` (t-digest, bounded
    memory); the fence logic is unchanged.

    Both fences go through the portable floor(x*1e6+0.5)/1e6 rounding (not
    native round, which diverges from DuckDB at half-boundaries) BEFORE the
    outlier comparison, so a last-ulp interpolation difference between the
    engines' quantile implementations can't flip a count."""
    o = t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    q = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    hi = F.floor((F.col("q3") + 1.5 * iqr) * 1e6 + F.lit(0.5)) / 1e6
    lo = F.floor((F.col("q1") - 1.5 * iqr) * 1e6 + F.lit(0.5)) / 1e6
    out = (F.col("o_totalprice") > hi) | (F.col("o_totalprice") < lo)
    return (
        o.join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority", "q1", "q3")
        .agg(
            F.count("*").alias("n_orders"),
            F.count_if(out).alias("n_outliers"),
            F.first(hi).alias("hi_fence"),
        )
        .drop("q1", "q3")
    )


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY 1 HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3, 4
    """,
    survey_ref="§2.5 J-family / §2.6 (TPC-H Q18 shape: HAVING-filtered "
    "aggregate subquery semi-joined back to the facts — the 'large volume "
    "customer' report)",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold. The
    HAVING aggregate and the final per-order rollup both hash on
    l_orderkey/o_orderkey — Catalyst reuses the exchange — and the
    qualifying-key set (rare by construction) joins back as a broadcast
    semi-join, so the second lineitem pass streams map-side. Customer
    attaches by broadcast. No sort anywhere; output is |big orders| rows."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.big_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
    )


@register(
    "a13_column_profile",
    oracle="""
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(event_type) AS BIGINT) AS null_event_type,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nd_event_type,
             CAST(COUNT(*) - COUNT(user_id) AS BIGINT) AS null_user_id,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_user_id,
             CAST(COUNT(*) - COUNT(value) AS BIGINT) AS null_value,
             CAST(COUNT(DISTINCT value) AS BIGINT) AS nd_value
      FROM events
    )
    SELECT 'event_type' AS column_name, n_rows, null_event_type AS n_nulls,
           nd_event_type AS n_distinct FROM base
    UNION ALL
    SELECT 'user_id', n_rows, null_user_id, nd_user_id FROM base
    UNION ALL
    SELECT 'value', n_rows, null_value, nd_value FROM base
    """,
    survey_ref="§2.6 A5 / §2.15 (ANALYZE-style column profile: null count + "
    "exact distinct per column in ONE pass — the stats scan that feeds "
    "validation thresholds and join-strategy choices)",
)
def a13_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass multi-column profile, pivoted to one row per column. The
    three exact COUNT(DISTINCT)s in a single agg plan as one Expand +
    aggregate (Spark's multi-distinct rewrite) — one scan, not three. At
    100 TB exact distinct is the oracle form; production swaps in
    approx_count_distinct (HLL, one pass, no Expand) with the same output
    shape. The pivot is a literal 3-row stack on a 1-row input — free."""
    ev = t(spark, sf_dir, "events")
    base = ev.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("event_type")).alias("null_event_type"),
        F.countDistinct("event_type").alias("nd_event_type"),
        (F.count("*") - F.count("user_id")).alias("null_user_id"),
        F.countDistinct("user_id").alias("nd_user_id"),
        (F.count("*") - F.count("value")).alias("null_value"),
        F.countDistinct("value").alias("nd_value"),
    )
    return base.select(
        F.expr(
            "stack(3, "
            "'event_type', n_rows, null_event_type, nd_event_type, "
            "'user_id',    n_rows, null_user_id,    nd_user_id, "
            "'value',      n_rows, null_value,      nd_value) "
            "AS (column_name, n_rows, n_nulls, n_distinct)"
        )
    )


@register(
    "j9_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 11 <> 0
    ),
    d AS (
      SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.o_totalprice <> n.o_totalprice THEN 'changed'
                  ELSE 'unchanged' END AS change
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT change, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM d GROUP BY change
    """,
    survey_ref="§2.5 join family (FULL OUTER — the one join type j1-j8 "
    "leave uncovered) as the snapshot-reconciliation operator: two table "
    "versions diffed into added/removed/changed/unchanged counts, the "
    "data-diff every ingest audit runs.",
)
def j9_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation via full outer join on the key. Both
    'versions' derive deterministically from orders (drop-by-modulus +
    perturb-by-modulus), so the oracle is exact. Scale shape: a single
    sort-merge full outer join on the key — both sides shuffle once; with
    bucketed storage on the key (operators/bucketing.py) the exchange
    disappears entirely. The CASE classification and count are map-side."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v_old")
    )
    new = o.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("k2"),
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("v_new"),
    )
    change = (
        F.when(F.col("k").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .when(F.col("v_old") != F.col("v_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        old.join(new, old.k == new.k2, "full_outer")
        .select(change.alias("change"))
        .groupBy("change")
        .agg(F.count("*").alias("n_rows"))
    )


@register(
    "t11_zscore",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS s,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))
                      * CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS ss
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           CASE WHEN m.n > 1 THEN
             floor(((l.l_extendedprice - m.s / m.n)
                    / NULLIF(sqrt((m.ss - m.s * m.s / m.n) / (m.n - 1)), 0))
                   * 1e6 + 0.5) / 1e6
           END AS price_z
    FROM lineitem l JOIN m USING (l_returnflag)
    """,
    survey_ref="§2.4 scalar expressions / ML feature prep: per-group z-score "
    "normalization — grouped moments broadcast back onto the facts, the "
    "standard feature-scaling pass before any embedding/clustering step.",
)
def t11_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group standardization: one grouped-moments pass (count, decimal
    sum, decimal sum-of-squares — all order-independent), broadcast of
    |groups| rows back onto the facts, then a purely row-local normalize.
    The z value passes through the portable 6-dp rounding because sqrt of
    the sample variance is the one step where engines could differ at the
    last ulp. At 100 TB: one map-side-combined exchange on the group key +
    a broadcast join — the facts never shuffle."""
    li = t(spark, sf_dir, "lineitem")
    p = dec("l_extendedprice", 28, 4)
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(p).cast("double").alias("s"),
        F.sum(p * p).cast("double").alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    std = F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
    # Degenerate groups (n=1 or zero variance) must be NULL in BOTH engines:
    # Spark's non-ANSI x/0.0 yields NULL but DuckDB's IEEE division yields
    # inf/nan, so guard n>1 and NULLIF the divisor (mirrored in the oracle).
    z = (F.col("l_extendedprice") - mean) / F.nullif(std, F.lit(0.0))
    return li.join(F.broadcast(m), "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.when(F.col("n") > 1, F.floor(z * 1e6 + F.lit(0.5)) / 1e6).alias("price_z"),
    )


@register(
    "q10_returned_items",
    oracle="""
    WITH rev AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY 1, 2, 3
    )
    SELECT c_custkey, c_name, n_name, revenue
    FROM rev ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    survey_ref="§2.5/§2.6/§2.8 (TPC-H Q10 shape: returned-item revenue "
    "report — two fact joins, dimension broadcast, decimal-exact revenue, "
    "top-20 without a global sort)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: who returned the most revenue last half-year. The date
    filter pushes to the orders scan and the returnflag filter to the
    lineitem scan; nation broadcasts onto customer; the two fact joins hash
    on their natural keys; revenue sums through DECIMAL; the final top-20
    plans as TakeOrderedAndProject (heap per partition, never a full sort).
    Deterministic tie-break on c_custkey so both engines cut the same 20."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 28, 6)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    survey_ref="§2.5 (TPC-H Q7 shape: bilateral trade volume — six-way join "
    "with a disjunctive cross-nation predicate riding the broadcasts, "
    "per-year rollup)",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year. Supplier and
    customer each pick up their nation by broadcast; the disjunctive
    nation-pair predicate evaluates after both broadcasts (no join
    explosion — it's a filter, not a cross join); the two fact joins hash
    on suppkey/orderkey. The ship-date range pushes to the lineitem scan.
    Revenue through DECIMAL; year extraction is engine-identical."""
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 28, 6)
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Correlated-subquery join shapes (TPC-H Q13/Q16/Q21) — the Catalyst rewrite
# family the rest of the surface doesn't exercise: outer-join count
# distribution, NOT IN -> null-aware anti join, correlated EXISTS/NOT EXISTS
# -> semi/anti joins with non-equi residual conditions. q16/q21 are written
# as SQL over temp views on purpose: the subquery forms are what trigger the
# RewritePredicateSubquery/ExistenceJoin planning paths.
# ---------------------------------------------------------------------------


@register(
    "q13_custdist",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY 1
    """,
    survey_ref="§2.5 J1 / §2.6 (TPC-H Q13 shape: outer-join count "
    "distribution — customers with zero matching orders must survive into "
    "the c_count=0 bucket, the one aggregate shape an inner join cannot "
    "express)",
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed N orders. LEFT join with the
    priority predicate INSIDE the join condition (pushing it to a WHERE
    would turn the outer join inner and drop the zero-order bucket);
    COUNT(o_orderkey) counts non-null matches so unmatched customers land
    in c_count=0. At 100 TB both sides shuffle-hash on custkey once; the
    second aggregate runs on |distinct counts| rows — negligible. No
    broadcast: customer is a fact here, not a dim."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_size IN (1, 4, 7)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    survey_ref="§2.5 / §2.6 A4 (TPC-H Q16 shape: NOT IN subquery — Catalyst "
    "rewrites it to a null-aware anti join against the broadcast complaint "
    "set; distinct-supplier count per part class)",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: supplier diversity per part class, excluding flagged
    suppliers via NOT IN. Written as SQL so Catalyst's
    RewritePredicateSubquery plans the null-aware anti join (BroadcastHash
    LeftAnti, NAAJ) — the DataFrame ``left_anti`` shortcut has different
    NULL semantics and skips that code path. The flagged-supplier set is
    tiny and broadcasts; part filters push to the scan; the distinct count
    shuffles once on the (brand, type, size) group key. At 100 TB the only
    large exchange is the partkey join; NAAJ stays map-side."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("q16_lineitem")
    t(spark, sf_dir, "part").createOrReplaceTempView("q16_part")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("q16_supplier")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM q16_lineitem l JOIN q16_part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#45'
          AND p.p_size IN (1, 4, 7)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM q16_supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        """
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY 1
    """,
    survey_ref="§2.5 (TPC-H Q21 shape: correlated EXISTS + NOT EXISTS self "
    "-joins on the fact table — 'the only supplier at fault on a "
    "multi-supplier order', Catalyst's semi/anti-join-with-residual "
    "rewrite; return flag stands in for the reference corpus's missing "
    "commit/receipt dates)",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers solely at fault on finished multi-supplier
    orders. The correlated EXISTS becomes a LeftSemi and the NOT EXISTS a
    LeftAnti self-join on l_orderkey, each carrying the l2.suppkey <>
    l1.suppkey residual — equi-keyed, so both plan as hash/sort-merge
    joins, never nested loops. Stays spark.sql deliberately: the operator
    under test is RewritePredicateSubquery composing a correlated EXISTS
    and NOT EXISTS with non-equi residuals in ONE query — a code path the
    DataFrame ``left_semi``/``left_anti`` shortcuts bypass (contrast q4,
    ported to the DataFrame API, where plain EXISTS loses nothing). All three lineitem passes hash on the same
    orderkey and Catalyst reuses the exchange. Supplier attaches by
    broadcast. At 100 TB: two fact-sized semi/anti exchanges on orderkey,
    no blow-up (semi/anti emit at most one row per probe row)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("q21_lineitem")
    t(spark, sf_dir, "orders").createOrReplaceTempView("q21_orders")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("q21_supplier")
    return spark.sql(
        """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM q21_supplier s
        JOIN q21_lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN q21_orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM q21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM q21_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY 1
        """
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(MIN(l_extendedprice / l_quantity) AS DOUBLE) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT p.p_partkey, ps.suppkey, s.s_name,
           floor(ps.unit_cost * 1e6 + 0.5) / 1e6 AS unit_cost
    FROM part p
    JOIN ps ON ps.partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.suppkey
    WHERE p.p_size = 7
      AND ps.unit_cost = (SELECT MIN(ps2.unit_cost) FROM ps ps2
                          WHERE ps2.partkey = p.p_partkey)
    """,
    survey_ref="§2.5 J4 / §2.6 (TPC-H Q2 shape: correlated scalar AGGREGATE "
    "subquery — 'the supplier achieving the minimum cost per part' — "
    "Catalyst's RewriteCorrelatedScalarSubquery turns the per-row MIN into "
    "a grouped aggregate joined back on the correlation key; the per-group "
    "companion to j4's uncorrelated scalar subquery)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: cheapest supplier per part. The correlated
    ``(SELECT MIN(..) WHERE partkey = outer.partkey)`` cannot execute
    per-row at scale; Catalyst rewrites it to MIN-per-partkey aggregated
    once and joined back on the key — asserted in the plan test (no
    nested loop, no cartesian). The part-size filter pushes to the scan,
    supplier attaches by broadcast, and the derived supplier-cost table
    aggregates l_partkey/l_suppkey once and is reused for both the
    candidate rows and the minimum — at 100 TB that's two exchanges over
    the derived table (|parts x suppliers| rows, far below the facts) and
    one over lineitem. Unit costs are row-local divisions (deterministic);
    only the output passes through the portable 6-dp rounding."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("q2_lineitem")
    t(spark, sf_dir, "part").createOrReplaceTempView("q2_part")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("q2_supplier")
    return spark.sql(
        """
        WITH ps AS (
          SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                 CAST(MIN(l_extendedprice / l_quantity) AS DOUBLE) AS unit_cost
          FROM q2_lineitem GROUP BY 1, 2
        )
        SELECT p.p_partkey, ps.suppkey, s.s_name,
               FLOOR(ps.unit_cost * 1e6 + 0.5) / 1e6 AS unit_cost
        FROM q2_part p
        JOIN ps ON ps.partkey = p.p_partkey
        JOIN q2_supplier s ON s.s_suppkey = ps.suppkey
        WHERE p.p_size = 7
          AND ps.unit_cost = (SELECT MIN(ps2.unit_cost) FROM ps ps2
                              WHERE ps2.partkey = p.p_partkey)
        """
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
                   / COUNT(*)
            FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
    survey_ref="§2.5 / §2.6 (TPC-H Q22 shape: uncorrelated scalar AVG "
    "subquery as a filter threshold + correlated NOT EXISTS anti join in "
    "one query — the two subquery rewrites composed; urgent-order "
    "existence stands in for the reference corpus's universal customer-"
    "order coverage)",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: wealthy customers with no urgent orders. Composes both
    subquery rewrites in one plan: the scalar AVG computes once (tiny
    aggregate reused as a literal, j4's shape) and the NOT EXISTS becomes
    a LeftAnti hash join on custkey with the priority filter pushed to the
    orders scan. Stays spark.sql deliberately: the scalar-subquery-as-
    pushed-scan-filter path (``GreaterThan(c_acctbal, ScalarSubquery)``
    reaching the FileScan, asserted in the plan test) only exists via the
    SQL subquery planner — a DataFrame crossJoin-on-aggregate would
    compute the same rows without exercising it (contrast q4, ported). The average routes through DECIMAL (exact sum, one
    division) so the threshold comparison is order- and engine-
    independent. At 100 TB: one broadcast scalar, one anti-join exchange
    on custkey, one rollup on nationkey."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("q22_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("q22_orders")
    return spark.sql(
        """
        SELECT c.c_nationkey AS nationkey,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
                 AS totacctbal
        FROM q22_customer c
        WHERE c.c_acctbal > (
                SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
                       / COUNT(*)
                FROM q22_customer c2 WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM q22_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY 1
        """
    )


@register(
    "q4_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY 1
    """,
    survey_ref="§2.5 / §2.6 (TPC-H Q4 shape: plain correlated EXISTS over "
    "the fact table → LeftSemi join, date window pushed to the orders "
    "scan; return flag stands in for the corpus's missing commit/receipt "
    "dates)",
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders in a quarter with at least one flagged line. The
    EXISTS rewrites to a LeftSemi hash join on orderkey — one probe row
    out per order regardless of line count, so the semi join cannot
    expand. DataFrame API deliberately (round-5 port from spark.sql):
    EXISTS ≡ ``left_semi`` exactly — unlike NOT IN, plain EXISTS has no
    NULL-semantics gap, so nothing is lost by skipping the subquery
    rewriter, and the Spark program stops mirroring the oracle's SQL text
    (two-independent-programs property; q16/q20/q21/q22 stay SQL because
    their REWRITE path is the point). Plan verified identical to the SQL
    form: same LeftSemi BroadcastHashJoin, same pushed date/flag scan
    filters, same two-phase count. Date window pushes to the orders scan,
    the flag filter to the lineitem scan; the rollup groups on
    |priorities| keys. At 100 TB: one semi-join exchange on orderkey (or
    a broadcast of the quarter's orders if small), one tiny aggregate."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    flagged = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(flagged, orders.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
            SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,4)))
                               AS DOUBLE) / COUNT(*))
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    survey_ref="§2.5 / §2.6 (TPC-H Q17 shape: correlated scalar AVG over "
    "the FACT table itself — the per-part mean aggregates once and joins "
    "back on partkey; small-order revenue for one brand)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-average-quantity orders of one brand.
    Unlike q2 (dim-sized derived table) the correlated aggregate here runs
    over LINEITEM itself — Catalyst still decorrelates to one grouped mean
    per partkey joined back on the key, so the fact table is scanned
    twice, never once per outer row. The brand filter prunes the outer
    side before the join; the mean routes through DECIMAL so the 0.2
    threshold is engine-identical. At 100 TB both passes exchange on
    partkey and Catalyst reuses the shuffle."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("q17_lineitem")
    t(spark, sf_dir, "part").createOrReplaceTempView("q17_part")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
                 / 7.0 AS avg_yearly
        FROM q17_lineitem l JOIN q17_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (
                SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,4)))
                                   AS DOUBLE) / COUNT(*))
                FROM q17_lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        """
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 40
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    survey_ref="§2.5 (TPC-H Q19 shape: disjunctive multi-column join "
    "predicate — OR of brand/size/quantity conjunctions; Catalyst must "
    "extract the common equi-key and derive per-side residual filters "
    "from the OR, the classic CNF-pushdown test)",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under an OR of brand/size/quantity conjunctions.
    The optimizer's job: keep the partkey equi-join hashed (never a
    nested loop over the OR), push the derived quantity-range union
    (1..40) to the lineitem scan and the brand/size union to the part
    scan, and evaluate the full disjunction as a post-join filter. Part
    projects 3 columns and broadcasts. Single-row decimal-exact output."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 40)
        & F.col("l_quantity").between(20, 40)
    )
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 28, 6)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l_partkey AS partkey,
             CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6)))
                  AS DOUBLE) AS part_value
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6)))
                  AS DOUBLE) AS total
      FROM lineitem
    )
    SELECT val.partkey, val.part_value
    FROM val, tot
    WHERE val.part_value > tot.total * 0.0006
    """,
    survey_ref="§2.6 (TPC-H Q11 shape: per-group value filtered against a "
    "FRACTION OF THE GLOBAL total — the group-vs-grand-total HAVING, "
    "both aggregates decimal-exact from the same base scan so the "
    "threshold comparison is engine-identical)",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value exceeds a fraction of the global
    total. Both the per-part values and the grand total aggregate the SAME
    decimal expression from the base table (never re-summing the double
    group values, which would be order-dependent); the 1-row total
    broadcasts back as the threshold. At 100 TB: two map-side-combined
    passes over lineitem — Catalyst reuses the scan — plus a 1-row
    broadcast; output is the surviving groups only."""
    li = t(spark, sf_dir, "lineitem")
    v = dec(F.col("l_extendedprice") * F.col("l_quantity"), 28, 6)
    val = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(v).cast("double").alias("part_value")
    )
    tot = li.agg(F.sum(v).cast("double").alias("total"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > F.col("total") * 0.0006)
        .select("partkey", "part_value")
    )


@register(
    "q20_part_promotion_suppliers",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
                           THEN CAST(l_quantity AS DECIMAL(28,4))
                           ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
               AS availqty
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3',
                       'NATION_4')
      AND s.s_suppkey IN (
        SELECT ps.suppkey FROM ps
        WHERE ps.partkey IN (SELECT p_partkey FROM part WHERE p_size = 7)
          AND ps.availqty > (
            SELECT 0.5 * CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,4)))
                              AS DOUBLE)
            FROM lineitem l
            WHERE l.l_partkey = ps.partkey AND l.l_suppkey = ps.suppkey)
      )
    """,
    survey_ref="§2.5 / §2.6 (TPC-H Q20 shape: IN-subquery whose body nests "
    "BOTH remaining rewrites — an inner uncorrelated IN on partkey AND a "
    "correlated scalar-aggregate threshold on (partkey, suppkey) — q2's "
    "decorrelation composed inside q4's semi-join rewrite in one plan; "
    "early-period shipment volume stands in for the missing partsupp "
    "availqty)",
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding excess stock of promoted parts, in a
    nation subset. The deepest subquery composition on the surface: the
    outer ``s_suppkey IN`` becomes a LeftSemi join; its body filters a
    derived supply table by an inner ``partkey IN`` (second semi join) AND
    a correlated scalar SUM over lineitem, which Catalyst decorrelates to
    a grouped aggregate joined back on (partkey, suppkey) — asserted in
    the plan test (no Subquery node, no nested loop, no cartesian).
    Written as SQL deliberately: the nested-subquery REWRITE PATH is the
    operator under test (same rationale as q16's NAAJ); the DataFrame-API
    siblings (q15, q13, q19, q11) keep the two-independent-programs
    property for this family. ``availqty`` (early-period shipped volume)
    stands in for partsupp availability, keeping the canonical
    half-of-total-demand comparison. At 100 TB: two exchanges over the
    derived (partkey, suppkey) table — far below the facts — one lineitem
    aggregation feeding both, the part semi join prunes before the scalar
    threshold applies, and supplier/nation attach by broadcast."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("q20_lineitem")
    t(spark, sf_dir, "part").createOrReplaceTempView("q20_part")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("q20_supplier")
    t(spark, sf_dir, "nation").createOrReplaceTempView("q20_nation")
    return spark.sql(
        """
        WITH ps AS (
          SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                 CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1999-01-01'
                               THEN CAST(l_quantity AS DECIMAL(28,4))
                               ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
                   AS availqty
          FROM q20_lineitem GROUP BY 1, 2
        )
        SELECT s.s_suppkey, s.s_name
        FROM q20_supplier s JOIN q20_nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3',
                           'NATION_4')
          AND s.s_suppkey IN (
            SELECT ps.suppkey FROM ps
            WHERE ps.partkey IN (SELECT p_partkey FROM q20_part
                                 WHERE p_size = 7)
              AND ps.availqty > (
                SELECT 0.5 * CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,4)))
                                  AS DOUBLE)
                FROM q20_lineitem l
                WHERE l.l_partkey = ps.partkey AND l.l_suppkey = ps.suppkey)
          )
        """
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    survey_ref="§2.6 / §2.9 (TPC-H Q15 shape: the revenue VIEW consumed "
    "twice — once for the supplier rows, once for its own MAX — the "
    "max-of-group-vs-group companion to q11's group-vs-grand-total; "
    "Q2's cheap sibling per the round-4 plan)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with the maximum windowed revenue. The
    classic VIEW-reuse query: the per-supplier revenue aggregate feeds
    both the candidate rows and the global MAX. Reuse is made EXPLICIT
    with a lazy localCheckpoint (the d6/_shared_scored_pairs discipline)
    — Catalyst's ReuseExchange does not fire across the broadcast-
    subquery boundary here (observed: two full lineitem scans without
    it), and at 100 TB a duplicated fact scan is the expensive half of
    the query; the checkpoint pins the |suppliers|-row aggregate,
    asserted single-scan in the plan test. DataFrame API deliberately
    (the two-independent-programs side of this family; contrast q20/q16
    where the SQL rewrite path is the point). Revenue routes through
    DECIMAL, so the MAX-equality comparison is exact and engine-
    identical — safe on doubles ONLY because both sides reduce the same
    exact decimal. At 100 TB: one map-side-combined exchange on suppkey
    over the date-pruned scan, a 1-row MAX broadcast back, supplier
    attaches by broadcast."""
    li = t(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 28, 6))
            .cast("double")
            .alias("total_revenue")
        )
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        t(spark, sf_dir, "supplier")
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Round 12: the four remaining TPC-H shapes (q6/q8/q9/q12), closing the
# 22/22 q-family (COVERAGE.md §2.5). The corpus has no partsupp /
# l_shipmode / l_commitdate / l_receiptdate columns, so q9 and q12 keep
# the classic JOIN+CASE composition on the columns the corpus does have
# (adaptations documented per query).
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    survey_ref="§2.3 P11 + §2.6 A1 (TPC-H Q6 shape: the forecasting "
    "what-if — pure scan-filter-reduce, zero joins; the query every "
    "pushdown audit starts from)",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue increase if discounts in a band were eliminated.
    The simplest plan in the family and deliberately so: all four
    predicates (date range, discount band, quantity cap) push into the
    parquet scan (PushedFilters shows all of them), the projection is
    two columns, and the aggregate is a map-side-combined 1-row reduce
    — at 100 TB this runs at scan speed with a single 1-row exchange.
    Discount-band literals compare stored doubles to literal doubles,
    identical in both engines (no float-equality hazard). Revenue goes
    through DECIMAL for order-independent summation."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice", 18, 4) * dec("l_discount", 18, 4))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_6'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS mkt_share,
           COUNT(*) AS n_items
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    WHERE p.p_type = 'ECONOMY'
      AND r.r_name = 'AMERICA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <= TIMESTAMP '1996-12-31 00:00:00'
    GROUP BY 1
    """,
    survey_ref="§2.5 J1/J2 + §2.6 A4 composed (TPC-H Q8 shape: national "
    "market share — the widest join in the family, 7 tables, with a "
    "conditional numerator over the same aggregate pass as the "
    "denominator)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_6's share of ECONOMY-part revenue sold into the
    AMERICA region, by order year. The widest join surface in the
    q-family (lineitem x orders facts + 5 dims). Plan shape at 100 TB:
    p_type prunes part ~6x and the filtered part broadcasts into the
    lineitem scan (semi-filtering it before any shuffle); supplier,
    both nation aliases, and region broadcast; the one unavoidable
    fact-fact exchange is lineitem><orders on orderkey, with the order-
    date range pushed into the orders scan first. Share and total fold
    into ONE partial aggregate on the |years|-row key, so the ratio
    costs no second pass. Numerator/denominator run through DECIMAL
    and divide as doubles at the end (engine-identical)."""
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("n2_name")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA").select("r_regionkey")
    vol = dec("l_extendedprice", 18, 4) * (F.lit(1) - dec("l_discount", 18, 4))
    nation_vol = F.when(F.col("n2_name") == "NATION_6", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(nation_vol).cast("double") / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * 0.6 * l.l_quantity
                         AS DECIMAL(28,6))) AS DOUBLE) AS sum_profit,
           COUNT(*) AS n_items
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """,
    survey_ref="§2.5 J2 + §2.6 A4 + §2.4 T5 composed (TPC-H Q9 shape: "
    "product-line profit by supplier nation and year — LIKE-filtered "
    "multiway join with two-fact-column arithmetic inside the SUM; the "
    "corpus has no partsupp, so unit cost is proxied as 60% of the part "
    "dim's p_retailprice — same join/agg composition, documented "
    "adaptation)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on 'bolt' product lines by nation and order year.
    profit = disc_price - unit_cost * quantity, where unit_cost proxies
    the missing ps_supplycost as 0.6 * p_retailprice (the corpus has no
    partsupp table; the arithmetic-in-aggregate composition is what Q9
    exercises and is preserved exactly). Plan shape at 100 TB: the LIKE
    prunes part BEFORE the join (substring predicates cannot push to
    parquet stats but evaluate in the scan stage); filtered part
    broadcasts into lineitem carrying p_retailprice; supplier + nation
    broadcast; lineitem><orders on orderkey is the one fact-fact
    exchange, date column only projected. The whole profit expression
    folds into one partial aggregate on (nation, year) — 25 x |years|
    output rows. Numeric determinism: the per-row profit is computed in
    DOUBLE with the identical left-associated expression in both
    engines (IEEE ops on equal inputs are bit-identical), then summed
    through DECIMAL(28,6) — a fully-decimal 3-factor product overflows
    precision 38 and Spark/DuckDB reduce the result scale differently
    (observed at sf0.01: last-ulp sum divergence)."""
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.6) * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(dec(profit, 28, 6)).cast("double").alias("sum_profit"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate >  o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
    survey_ref="§2.5 J2 + §2.6 A4 (TPC-H Q12 shape: late-shipment audit "
    "— fact-fact join with a cross-table lateness predicate and the "
    "priority CASE pivot; the corpus has no l_shipmode/l_commitdate/"
    "l_receiptdate, so the mode key is l_linestatus and 'late' is "
    "ship-lag > 60 days after order date — documented adaptation, same "
    "composition)",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: how many critical-priority orders shipped late, per
    ship class. The classic CASE-pivot aggregation: one grouped pass
    emits both the high- and low-priority counts. The lateness
    predicate (l_shipdate > o_orderdate + 60 days) references BOTH
    sides, so it evaluates as a post-join filter — but the one-year
    l_shipdate window pushes into the lineitem scan and an implied
    o_orderdate bound could be derived at 100 TB (orderdate >= window
    start - max plausible lag) to prune orders too. Fact-fact exchange
    on orderkey, partial-agg to 2 x |statuses| rows."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )
